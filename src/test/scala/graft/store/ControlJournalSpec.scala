package graft.store

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec

/** Durable control plane: crash recovery and the single-writer rule.
  *
  * Mirrors the reference's transactional ACK semantics
  * (schema.sql:436-446 — an ACK survives because it IS a committed
  * transaction) and the two-session contention test
  * (tests/integration/concurrent-access/test_lock_contention.sql:41-48
  * — two clients on one view must never double-deliver). Here the two
  * "sessions" are two ViewStreams instances on SEPARATE SparkSessions
  * sharing one journal directory: the second is cleanly rejected while
  * the first's lease is live, takes over after expiry, and the union
  * of deliveries across both instances covers each offset exactly once.
  */
class ControlJournalSpec extends SparkSpec with graft.testkit.TestKitReported {

  private val T0 = 1700000000000L
  private def ts(ms: Long) = new Timestamp(T0 + ms)

  /** Shared mutable clock → deterministic lease expiry across stores. */
  private final class Clock { @volatile var t: Timestamp = ts(0) }

  private def mkStore(session: org.apache.spark.sql.SparkSession,
                      clock: Clock): (EventStore, ViewStreams) = {
    val st = new EventStore(session)
    st.now = () => clock.t
    st.registerDeciderEvent("Order", "E")
    (st, new ViewStreams(st))
  }

  private def appendLog(st: EventStore): Unit = {
    // 4 events over 2 partitions: p1 = offsets 1,3; p2 = offsets 2,4
    assert(st.append(Seq(
      EventInput("E", "e1", "Order", "p1", "{}"),
      EventInput("E", "e2", "Order", "p2", "{}"),
      EventInput("E", "e3", "Order", "p1", "{}", previous_id = Some("e1")),
      EventInput("E", "e4", "Order", "p2", "{}", previous_id = Some("e2"))
    )).rejected.isEmpty)
  }

  test("ACKs survive a crash: journal replay restores lock state without save()") {
    val dir = Files.createTempDirectory("graft-journal").toString
    val logDir = Files.createTempDirectory("graft-journal-log").toString
    val clock = new Clock

    // --- writer A: registers, streams, ACKs p1, then "crashes" (no close)
    val (stA, vsA) = mkStore(spark, clock)
    vsA.openJournal(dir, ownerId = "A", leaseMs = 60000L)
    appendLog(stA)
    stA.save(logDir)
    vsA.registerView("v", startAt = Some(ts(-1000)))
    val gotA = vsA.streamEvents("v", limit = 10, seconds = 300)
    assert(gotA.map(_.event_id) === Seq("e1", "e2"))
    vsA.ack("v", "p1", 1L)
    // crash: vsA is abandoned — no save(), no closeJournal()

    // --- writer B (separate SparkSession, same journal): rejected while
    //     A's lease is live
    val (stB, vsB) = mkStore(spark.newSession(), clock)
    stB.load(logDir)
    val rejection = intercept[ControlJournal.OwnershipHeldException] {
      vsB.openJournal(dir, ownerId = "B", leaseMs = 60000L)
    }
    assert(rejection.getMessage.contains("held by writer 'A'"))

    // --- leases expire (journal writer lease 60 s AND A's 300 s
    //     delivery lease on p2) → takeover; replay restores A's state
    clock.t = ts(301000)
    vsB.openJournal(dir, ownerId = "B", leaseMs = 60000L)
    val locks = vsB.allLocks.collect().map(l => l.decider_id -> l).toMap
    assert(locks("p1").last_offset === 1L, "A's ACK must survive the crash")
    assert(locks("p1").offset === 3L)
    // p2's backfill seek left last_offset = first-offset-after-start − 1
    assert(locks("p2").last_offset === 1L, "unACKed p2 must not advance")

    // --- no double delivery: p1 resumes at e3 (not e1); p2's lease from
    //     A expired with the clock, so e2 is redelivered (at-least-once,
    //     never-lost) — then B drains and the union of ACKed offsets is
    //     exactly 1..4 with no offset ACKed twice
    val gotB = vsB.streamEvents("v", limit = 10, seconds = 300)
    assert(gotB.map(_.event_id) === Seq("e2", "e3"))
    assert(!gotB.exists(_.offset == 1L), "ACKed offset 1 must never be redelivered")
    gotB.foreach(e => vsB.ack("v", e.decider_id, e.offset))
    val gotB2 = vsB.streamEvents("v", limit = 10, seconds = 300)
    assert(gotB2.map(_.event_id) === Seq("e4"))
    gotB2.foreach(e => vsB.ack("v", e.decider_id, e.offset))
    assert(vsB.streamEvents("v", limit = 10).isEmpty, "log fully drained")
    val delivered = (gotA ++ gotB ++ gotB2).map(_.offset)
    assert(delivered.toSet === Set(1L, 2L, 3L, 4L))
    // offset 2 appears twice by at-least-once design (A leased it and
    // crashed un-ACKed); every offset A actually ACKed appears once
    assert(delivered.count(_ == 1L) === 1)
    assert(delivered.count(_ == 3L) === 1)
    assert(delivered.count(_ == 4L) === 1)
    vsB.closeJournal()
  }

  test("ackBatch commits a delivered batch as one journal record") {
    val dir = Files.createTempDirectory("graft-journal-batch").toString
    val clock = new Clock
    val (st, vs) = mkStore(spark, clock)
    vs.openJournal(dir, ownerId = "A", leaseMs = 60000L)
    appendLog(st)
    vs.registerView("v", startAt = Some(ts(-1000)))
    val entriesBefore = new java.io.File(dir).listFiles()
      .count(_.getName.matches("""\d{20}\.json"""))
    val got = vs.streamEvents("v", limit = 10, seconds = 300)
    val acked = vs.ackBatch("v", got.map(e => (e.decider_id, e.offset)))
    assert(acked.size === got.size)
    val entriesAfter = new java.io.File(dir).listFiles()
      .count(_.getName.matches("""\d{20}\.json"""))
    // one entry for the lease acquisition, ONE for the whole ack batch
    assert(entriesAfter - entriesBefore === 2,
      s"expected 2 new entries (lease + batch ack), got ${entriesAfter - entriesBefore}")
    // unknown locks are skipped, like ack's None
    assert(vs.ackBatch("v", Seq(("nope", 9L))).isEmpty)
    // and the batch ack is durable: crash + takeover sees the offsets
    clock.t = ts(301000)
    val (_, vs2) = mkStore(spark.newSession(), clock)
    vs2.openJournal(dir, ownerId = "B", leaseMs = 60000L)
    val locks = vs2.allLocks.collect().map(l => l.decider_id -> l.last_offset).toMap
    got.foreach(e => assert(locks(e.decider_id) >= e.offset))
    vs2.closeJournal()
  }

  test("checkpoint truncates entries; state survives close/reopen") {
    val dir = Files.createTempDirectory("graft-journal-ckpt").toString
    val clock = new Clock
    val (st, vs) = mkStore(spark, clock)
    vs.openJournal(dir, ownerId = "A", leaseMs = 60000L)
    appendLog(st)
    vs.registerView("v", startAt = Some(ts(-1000)))
    vs.streamEvents("v", limit = 1, seconds = 300)
    vs.ack("v", "p1", 1L)
    vs.closeJournal()

    // after checkpoint: one snapshot, zero entry files
    val names = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(names.exists(_.startsWith("snapshot-")))
    assert(!names.exists(_.matches("""\d{20}\.json""")), s"entries not truncated: $names")

    val (_, vs2) = mkStore(spark, clock)
    vs2.openJournal(dir, ownerId = "B", leaseMs = 60000L)
    val locks = vs2.allLocks.collect().map(l => l.decider_id -> l).toMap
    assert(locks("p1").last_offset === 1L)
    assert(vs2.allViews.collect().map(_.view).toSeq === Seq("v"))
    vs2.closeJournal()
  }

  test("property: replay of a random mutation schedule equals live state") {
    val dir = Files.createTempDirectory("graft-journal-prop").toString
    val clock = new Clock
    val (st, vs) = mkStore(spark, clock)
    vs.openJournal(dir, ownerId = "A", leaseMs = 600000L)
    appendLog(st)
    val rnd = new scala.util.Random(42)
    val views = Seq("v0", "v1", "v2")
    views.foreach(v => vs.registerView(v, startAt = Some(ts(-1000))))
    (0 until 120).foreach { i =>
      clock.t = ts(1000L * i)
      rnd.nextInt(6) match {
        case 0 => vs.streamEvents(views(rnd.nextInt(3)), limit = rnd.nextInt(3) + 1,
          seconds = rnd.nextInt(10) + 1)
        case 1 =>
          val v = views(rnd.nextInt(3))
          vs.ack(v, s"p${rnd.nextInt(2) + 1}", rnd.nextInt(4) + 1)
        case 2 => vs.nack(views(rnd.nextInt(3)), s"p${rnd.nextInt(2) + 1}")
        case 3 => vs.scheduleNack(views(rnd.nextInt(3)), s"p${rnd.nextInt(2) + 1}",
          rnd.nextInt(5000))
        case 4 => vs.ackBatch(views(rnd.nextInt(3)),
          Seq((s"p${rnd.nextInt(2) + 1}", rnd.nextInt(4) + 1)))
        case 5 if rnd.nextBoolean() =>
          val v = views(rnd.nextInt(3))
          vs.deleteView(v); vs.registerView(v, startAt = Some(ts(-1000)))
        case _ => ()
      }
    }
    val liveViews = vs.allViews.collect().map(v => v.view -> v).toMap
    val liveLocks = vs.allLocks.collect().map(l => (l.view, l.decider_id) -> l).toMap
    // a SECOND journal handle replays the same directory cold (same
    // owner id — the lease is still live)
    val j = new ControlJournal(dir, spark.sparkContext.hadoopConfiguration,
      "A", () => clock.t, 600000L)
    j.acquire()
    val (rv, rl) = j.replay()
    assert(rv.map(v => v.view -> v).toMap === liveViews)
    assert(rl.map(l => (l.view, l.decider_id) -> l).toMap === liveLocks)
    vs.closeJournal()
  }

  test("load() checkpoints the open journal: crash-replay cannot resurrect pre-load state") {
    val dir = Files.createTempDirectory("graft-journal-load").toString
    val snapDir = Files.createTempDirectory("graft-journal-load-snap").toString
    val clock = new Clock
    val (_, vs) = mkStore(spark, clock)
    vs.openJournal(dir, ownerId = "A", leaseMs = 60000L)
    vs.registerView("keep")
    vs.save(snapDir)
    // mutations AFTER the parquet snapshot, then load() rolls back to it
    vs.registerView("ghost")
    vs.load(snapDir)
    assert(vs.allViews.collect().map(_.view).toSeq === Seq("keep"))
    // crash without close; a takeover's replay must agree with what the
    // live writer observed after load — 'ghost' stays dead
    clock.t = ts(61000)
    val (_, vs2) = mkStore(spark.newSession(), clock)
    vs2.openJournal(dir, ownerId = "B", leaseMs = 60000L)
    assert(vs2.allViews.collect().map(_.view).toSeq === Seq("keep"),
      "journal replay resurrected a view the live writer had rolled back")
    vs2.closeJournal()
  }

  test("takeover race: of N candidates past the expired-lease check, exactly one wins") {
    // The advisor scenario: writer A crashes, its lease expires, and
    // SEVERAL takeover candidates race acquire() simultaneously. The
    // epoch-file create-exclusive claim admits exactly one — with the
    // old write-then-read-back claim, an A-write/A-read/B-write/B-read
    // interleave let two candidates both believe they owned the journal
    // and silently clobber each other's ACK records.
    val dir = Files.createTempDirectory("graft-journal-race").toString
    val clock = new Clock
    val conf = spark.sparkContext.hadoopConfiguration
    val crashed = new ControlJournal(dir, conf, "crashed", () => clock.t, 1000L)
    crashed.acquire()
    clock.t = ts(2000) // crashed's lease is now expired
    (0 until 5).foreach { round =>
      val n = 8
      val start = new java.util.concurrent.CountDownLatch(1)
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, String]]()
      val journals = (0 until n).map(i =>
        new ControlJournal(dir, conf, s"cand-$round-$i", () => clock.t, 1000L))
      val threads = journals.zipWithIndex.map { case (j, i) =>
        new Thread(() => {
          start.await()
          try { j.acquire(); results.add(Right(s"cand-$round-$i")) }
          catch { case e: ControlJournal.OwnershipHeldException => results.add(Left(e)) }
        })
      }
      threads.foreach(_.start())
      start.countDown()
      threads.foreach(_.join(30000))
      import scala.jdk.CollectionConverters._
      val winners = results.asScala.collect { case Right(id) => id }.toSeq
      assert(winners.size === 1,
        s"round $round: expected exactly one takeover winner, got $winners")
      assert(results.size === n)
      clock.t = new Timestamp(clock.t.getTime + 2000) // expire winner for next round
    }
  }

  test("deleteView cascades through replay; fanout heads are journaled") {
    val dir = Files.createTempDirectory("graft-journal-del").toString
    val clock = new Clock
    val (st, vs) = mkStore(spark, clock)
    vs.openJournal(dir, ownerId = "A", leaseMs = 60000L)
    vs.registerView("keep")
    vs.registerView("drop")
    appendLog(st) // fanout lands heads for both views, journaled
    vs.deleteView("drop")
    // crash without close; reopen after lease expiry
    clock.t = ts(61000)
    val (_, vs2) = mkStore(spark, clock)
    vs2.openJournal(dir, ownerId = "B", leaseMs = 60000L)
    assert(vs2.allViews.collect().map(_.view).toSeq === Seq("keep"))
    val locks = vs2.allLocks.collect()
    assert(locks.forall(_.view == "keep"))
    assert(locks.map(l => l.decider_id -> l.offset).toMap === Map("p1" -> 3L, "p2" -> 4L))
    vs2.closeJournal()
  }
}
