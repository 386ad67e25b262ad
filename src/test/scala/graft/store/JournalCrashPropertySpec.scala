package graft.store

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec

/** Randomized crash-reopen property for the journaled control plane:
  * every mutation appends one journal record INSIDE its critical
  * section, so abandoning the ViewStreams at ANY point (no close, no
  * checkpoint — a hard crash) and replaying the journal from a
  * successor must reproduce the pre-crash views/locks state EXACTLY.
  * Random schedules interleave view registration/deletion, delivery
  * leasing, acks, nacks, scheduled nacks, append fanout, and crash
  * points; the frozen clock makes row timestamps comparable field for
  * field.
  */
class JournalCrashPropertySpec extends SparkSpec with graft.testkit.TestKitReported {

  test("property: crash at any random point loses nothing the journal recorded") {
    for (seed <- Seq(13, 59, 307)) {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft-jcrash$seed").toString
      var nowMs = 1700000000000L

      val store = new EventStore(spark)
      store.now = () => new Timestamp(nowMs)
      store.registerDeciderEvent("C", "E")
      var nextId = 0
      def appendOne(): Unit = {
        val s0 = s"p${rnd.nextInt(4)}"
        val prev = store.getLastEvent(s0).map(_.event_id)
        val id = s"e$nextId"; nextId += 1
        assert(store.append(Seq(
          EventInput("E", id, "C", s0, "{}", previous_id = prev))).rejected.isEmpty)
      }

      var gen = 0
      var vs = new ViewStreams(store)
      vs.openJournal(dir, ownerId = s"W$gen", leaseMs = 60000L)
      var nViews = 0

      def snapshot(v: ViewStreams): (Seq[ViewRegistration], Seq[LockRow]) =
        (v.allViews.collect().toSeq.sortBy(_.view),
         v.allLocks.collect().toSeq.sortBy(l => (l.view, l.decider_id)))

      for (step <- 0 until 30) {
        nowMs += 1000
        rnd.nextInt(12) match {
          case 0 | 1 =>
            vs.registerView(s"v$nViews", startAt = Some(new Timestamp(0L)))
            nViews += 1
          case 2 if nViews > 0 =>
            vs.deleteView(s"v${rnd.nextInt(nViews)}")
          case 3 | 4 | 5 => appendOne()
          case 6 | 7 if nViews > 0 =>
            // lease some partitions (journal records the lease rows);
            // acks/nacks against leased rows happen in the case-8 arm
            vs.streamEvents(s"v${rnd.nextInt(nViews)}",
              limit = 1 + rnd.nextInt(3), seconds = 30)
            ()
          case 8 if nViews > 0 =>
            // ack/nack/schedule-nack a random EXISTING lock row
            val locks = vs.allLocks.collect()
            if (locks.nonEmpty) {
              val l = locks(rnd.nextInt(locks.length))
              rnd.nextInt(3) match {
                case 0 => vs.ack(l.view, l.decider_id, l.offset)
                case 1 => vs.nack(l.view, l.decider_id)
                case 2 => vs.scheduleNack(l.view, l.decider_id, 5000L)
              }
            }
          case _ => ()
        }

        if (rnd.nextInt(6) == 0) {
          // CRASH: no close, no checkpoint. The successor replays the
          // journal after lease expiry and must land on the same state.
          val want = snapshot(vs)
          nowMs += 61000L
          gen += 1
          vs = new ViewStreams(store)
          vs.openJournal(dir, ownerId = s"W$gen", leaseMs = 60000L)
          val got = snapshot(vs)
          assert(got._1 === want._1, s"seed $seed step $step: views diverged after crash")
          assert(got._2 === want._2, s"seed $seed step $step: locks diverged after crash")
        }
      }
      // a clean close checkpoints (snapshot + truncate): a fresh
      // reopen must still reproduce the final state exactly
      val want = snapshot(vs)
      vs.closeJournal()
      val vs2 = new ViewStreams(store)
      vs2.openJournal(dir, ownerId = "final", leaseMs = 60000L)
      val got = snapshot(vs2)
      assert(got._1 === want._1, s"seed $seed: views diverged after clean close")
      assert(got._2 === want._2, s"seed $seed: locks diverged after clean close")
      vs2.closeJournal()
    }
  }
}
