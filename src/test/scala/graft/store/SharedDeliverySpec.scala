package graft.store

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.CountDownLatch
import graft.SparkSpec

/** Per-partition lease SHARING between live consumers — the reference's
  * `FOR UPDATE SKIP LOCKED` semantics (schema.sql:405-417): N concurrent
  * sessions polling one view each grab unlocked partitions and proceed,
  * never double-delivering and never blocking on each other
  * (tests/integration/concurrent-access/test_lock_contention.sql:41-48).
  * The two "sessions" here are two ViewStreams on SEPARATE SparkSessions
  * joined to one SharedJournal directory; contrast ControlJournalSpec,
  * where the single-writer journal REJECTS the second live process.
  */
class SharedDeliverySpec extends SparkSpec with graft.testkit.TestKitReported {

  private val T0 = 1700000000000L
  private def ts(ms: Long) = new Timestamp(T0 + ms)

  private final class Clock { @volatile var t: Timestamp = ts(0) }

  private def mkConsumer(session: org.apache.spark.sql.SparkSession,
                         clock: Clock): (EventStore, ViewStreams) = {
    val st = new EventStore(session)
    st.now = () => clock.t
    st.registerDeciderEvent("Order", "E")
    (st, new ViewStreams(st))
  }

  /** nParts partitions × perPart events each, chained per partition. */
  private def appendLog(st: EventStore, nParts: Int, perPart: Int): Unit = {
    for (k <- 0 until perPart) {
      val batch = (0 until nParts).map { p =>
        val prev = if (k == 0) None else Some(s"e$p-${k - 1}")
        EventInput("E", s"e$p-$k", "Order", s"p$p", "{}", previous_id = prev)
      }
      assert(st.append(batch).rejected.isEmpty)
    }
  }

  /** Run the two thunks truly concurrently (shared start latch). */
  private def concurrently[A](fa: => A, fb: => A): (A, A) = {
    val start = new CountDownLatch(1)
    var ra: Either[Throwable, A] = null
    var rb: Either[Throwable, A] = null
    val tA = new Thread(() => { start.await(); ra = try Right(fa) catch { case t: Throwable => Left(t) } })
    val tB = new Thread(() => { start.await(); rb = try Right(fb) catch { case t: Throwable => Left(t) } })
    tA.start(); tB.start(); start.countDown()
    tA.join(120000); tB.join(120000)
    (ra.fold(throw _, identity), rb.fold(throw _, identity))
  }

  test("two live consumers split one view's partitions; deliveries disjoint, union complete") {
    val dir = Files.createTempDirectory("graft-shared").toString
    val logDir = Files.createTempDirectory("graft-shared-log").toString
    val clock = new Clock

    val (stA, vsA) = mkConsumer(spark, clock)
    appendLog(stA, nParts = 8, perPart = 2)
    stA.save(logDir)
    vsA.openSharedJournal(dir, ownerId = "A")
    vsA.registerView("v", startAt = Some(ts(-1000)))

    // second LIVE consumer joins — not rejected (vs ControlJournalSpec)
    val (stB, vsB) = mkConsumer(spark.newSession(), clock)
    stB.load(logDir)
    vsB.openSharedJournal(dir, ownerId = "B")

    def partsOf(es: Seq[EventRow]) = es.map(_.decider_id).toSet

    // round 1: both poll AT THE SAME TIME, limit 4 each over 8 partitions
    val (gotA1, gotB1) = concurrently(
      vsA.streamEvents("v", limit = 4, seconds = 300),
      vsB.streamEvents("v", limit = 4, seconds = 300))
    assert(gotA1.size === 4 && gotB1.size === 4)
    assert((partsOf(gotA1) & partsOf(gotB1)).isEmpty,
      s"double delivery: ${partsOf(gotA1) & partsOf(gotB1)}")
    assert(partsOf(gotA1) ++ partsOf(gotB1) === (0 until 8).map(p => s"p$p").toSet,
      "union of the two consumers' partitions must cover the view")

    // each consumer ACKs ITS OWN deliveries, independently
    assert(vsA.ackBatch("v", gotA1.map(e => (e.decider_id, e.offset))).size === 4)
    assert(vsB.ackBatch("v", gotB1.map(e => (e.decider_id, e.offset))).size === 4)

    // round 2: the second event of each partition, again split 4/4
    val (gotA2, gotB2) = concurrently(
      vsA.streamEvents("v", limit = 4, seconds = 300),
      vsB.streamEvents("v", limit = 4, seconds = 300))
    assert(gotA2.size === 4 && gotB2.size === 4)
    assert((partsOf(gotA2) & partsOf(gotB2)).isEmpty)
    gotA2.foreach(e => vsA.ack("v", e.decider_id, e.offset))
    gotB2.foreach(e => vsB.ack("v", e.decider_id, e.offset))

    // drained: every offset delivered exactly once across both consumers
    assert(vsA.streamEvents("v", limit = 8).isEmpty)
    assert(vsB.streamEvents("v", limit = 8).isEmpty)
    val all = (gotA1 ++ gotB1 ++ gotA2 ++ gotB2).map(_.offset)
    assert(all.sorted === (1L to 16L).toSeq,
      "each of the 16 offsets must be delivered exactly once — no loss, no double delivery")

    vsA.closeSharedJournal()
    vsB.closeSharedJournal()
  }

  test("single contended partition: one poller wins, the other skips (not blocks, not errors)") {
    val dir = Files.createTempDirectory("graft-shared-one").toString
    val logDir = Files.createTempDirectory("graft-shared-one-log").toString
    val clock = new Clock
    val (stA, vsA) = mkConsumer(spark, clock)
    appendLog(stA, nParts = 1, perPart = 1)
    stA.save(logDir)
    vsA.openSharedJournal(dir, ownerId = "A")
    vsA.registerView("v", startAt = Some(ts(-1000)))
    val (stB, vsB) = mkConsumer(spark.newSession(), clock)
    stB.load(logDir)
    vsB.openSharedJournal(dir, ownerId = "B")

    val (gotA, gotB) = concurrently(
      vsA.streamEvents("v", limit = 1, seconds = 300),
      vsB.streamEvents("v", limit = 1, seconds = 300))
    // the lock_contention.sql shape: exactly one session holds p0
    assert(Seq(gotA, gotB).count(_.nonEmpty) === 1,
      s"exactly one consumer must win the partition; got A=$gotA B=$gotB")
    vsA.closeSharedJournal()
    vsB.closeSharedJournal()
  }

  test("consumer crash mid-lease: survivor takes over its partitions at lease expiry; ACKs survive") {
    val dir = Files.createTempDirectory("graft-shared-crash").toString
    val logDir = Files.createTempDirectory("graft-shared-crash-log").toString
    val clock = new Clock
    val (stA, vsA) = mkConsumer(spark, clock)
    appendLog(stA, nParts = 4, perPart = 1)
    stA.save(logDir)
    vsA.openSharedJournal(dir, ownerId = "A")
    vsA.registerView("v", startAt = Some(ts(-1000)))
    val (stB, vsB) = mkConsumer(spark.newSession(), clock)
    stB.load(logDir)
    vsB.openSharedJournal(dir, ownerId = "B")

    // A leases ALL partitions, acks only p0, then crashes (no close)
    val gotA = vsA.streamEvents("v", limit = 4, seconds = 300)
    assert(gotA.size === 4)
    val p0 = gotA.find(_.decider_id == "p0").get
    vsA.ack("v", "p0", p0.offset)
    // vsA abandoned — its lane files (incl. the ACK) remain on disk

    // B sees nothing while A's delivery leases are live — SKIP, not steal
    assert(vsB.streamEvents("v", limit = 4, seconds = 300).isEmpty)

    // after lease expiry B inherits the three un-ACKed partitions
    clock.t = ts(301000)
    val gotB = vsB.streamEvents("v", limit = 4, seconds = 300)
    assert(gotB.map(_.decider_id).toSet === Set("p1", "p2", "p3"),
      s"A's ACKed p0 must NOT be redelivered; got ${gotB.map(_.decider_id)}")
    gotB.foreach(e => vsB.ack("v", e.decider_id, e.offset))
    assert(vsB.streamEvents("v", limit = 4).isEmpty, "drained")
    vsB.closeSharedJournal()
  }

  test("property: a random two-writer schedule replays to the live merged state") {
    // The shared journal's core claim: ANY interleaving of two live
    // writers' mutations folds — on a cold third reader — to exactly
    // the state the writers observe. Randomized over polls, acks,
    // nacks, scheduled nacks, batch acks, and re-registrations, with
    // the clock advancing so leases expire and partitions change hands.
    val dir = Files.createTempDirectory("graft-shared-prop").toString
    val logDir = Files.createTempDirectory("graft-shared-prop-log").toString
    val clock = new Clock
    val (stA, vsA) = mkConsumer(spark, clock)
    appendLog(stA, nParts = 3, perPart = 4)
    stA.save(logDir)
    vsA.openSharedJournal(dir, ownerId = "A")
    vsA.registerView("v", startAt = Some(ts(-1000)))
    val (stB, vsB) = mkConsumer(spark.newSession(), clock)
    stB.load(logDir)
    vsB.openSharedJournal(dir, ownerId = "B")

    val rnd = new scala.util.Random(7)
    val writers = Array(vsA, vsB)
    (0 until 60).foreach { i =>
      clock.t = ts(1000L * i)
      val vs = writers(rnd.nextInt(2))
      rnd.nextInt(5) match {
        case 0 => vs.streamEvents("v", limit = rnd.nextInt(3) + 1,
          seconds = rnd.nextInt(8) + 1)
        case 1 => vs.ack("v", s"p${rnd.nextInt(3)}", rnd.nextInt(12) + 1)
        case 2 => vs.nack("v", s"p${rnd.nextInt(3)}")
        case 3 => vs.scheduleNack("v", s"p${rnd.nextInt(3)}", rnd.nextInt(4000))
        case 4 => vs.ackBatch("v", Seq((s"p${rnd.nextInt(3)}", rnd.nextInt(12) + 1)))
      }
    }
    // both live caches and a COLD replay must agree key-for-key
    val fromA = vsA.allLocks.collect().map(l => (l.view, l.decider_id) -> l).toMap
    val fromB = vsB.allLocks.collect().map(l => (l.view, l.decider_id) -> l).toMap
    assert(fromA === fromB, "live writers disagree after resync")
    val cold = new SharedJournal(dir, spark.sparkContext.hadoopConfiguration,
      "observer", () => clock.t)
    cold.open()
    val (coldViews, coldLocks) = cold.replay()
    assert(coldLocks.map(l => (l.view, l.decider_id) -> l).toMap === fromA,
      "cold replay diverged from the live merged state")
    assert(coldViews.map(_.view) === Seq("v"))
    // ... and checkpointing must be state-preserving
    vsA.closeSharedJournal() // folds a checkpoint
    val cold2 = new SharedJournal(dir, spark.sparkContext.hadoopConfiguration,
      "observer2", () => clock.t)
    cold2.open()
    val (_, afterCkpt) = cold2.replay()
    assert(afterCkpt.map(l => (l.view, l.decider_id) -> l).toMap === fromA,
      "checkpoint changed the folded state")
    vsB.closeSharedJournal()
  }

  test("append fanout propagates across writers: B discovers A's new events via merged replay") {
    val dir = Files.createTempDirectory("graft-shared-fanout").toString
    val logDir = Files.createTempDirectory("graft-shared-fanout-log").toString
    val clock = new Clock
    val (stA, vsA) = mkConsumer(spark, clock)
    appendLog(stA, nParts = 1, perPart = 1)
    stA.save(logDir)
    vsA.openSharedJournal(dir, ownerId = "A")
    vsA.registerView("v", startAt = Some(ts(-1000)))
    val (stB, vsB) = mkConsumer(spark.newSession(), clock)
    stB.load(logDir)
    vsB.openSharedJournal(dir, ownerId = "B")

    val got1 = vsB.streamEvents("v", limit = 1, seconds = 300)
    assert(got1.map(_.event_id) === Seq("e0-0"))
    vsB.ack("v", "p0", got1.head.offset)

    // A appends a NEW event AFTER registration: its fanout head lands in
    // A's lane; B must see it through resync without any coordination
    assert(stA.append(Seq(EventInput("E", "e0-1", "Order", "p0", "{}",
      previous_id = Some("e0-0")))).rejected.isEmpty)
    stA.save(logDir)
    stB.load(logDir) // refresh B's data plane to the new log version

    val got2 = vsB.streamEvents("v", limit = 1, seconds = 300)
    assert(got2.map(_.event_id) === Seq("e0-1"),
      "B never learned about A's appended event (fanout lost in the merge)")
    vsA.closeSharedJournal()
    vsB.closeSharedJournal()
  }
}
