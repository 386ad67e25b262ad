package graft.store

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec

/** Randomized lifecycle property for the at-rest log's MVCC publication
  * (save / saveIncrement / compact / load / crash takeover): after any
  * interleaving, a FRESH reader of the published state must see exactly
  * the events flushed so far — no losses, no duplicates, no broken
  * chains — and a fenced zombie writer must never move the pointer.
  * The durability unit under test is the FLUSH (the documented
  * batch-commit analogue of the reference's per-statement durability):
  * a takeover rolls the ground truth back to the last flushed state,
  * exactly what a crash loses.
  */
class LogLifecyclePropertySpec extends SparkSpec with graft.testkit.TestKitReported {

  test("property: random flush/compact/takeover schedules never corrupt the published log") {
    for (seed <- Seq(5, 71)) {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft-loglife$seed").toString
      var nowMs = 1700000000000L
      val clock = () => new Timestamp(nowMs)

      def freshWriter(owner: String, loadFirst: Boolean): EventStore = {
        val st = new EventStore(
          if (owner == "A0") spark else spark.newSession())
        st.now = clock
        if (loadFirst) st.load(dir, buckets = 4)
        else st.registerDeciderEvent("C", "E")
        st.acquireLogWriter(dir, ownerId = owner, leaseMs = 60000L)
        st
      }

      // ground truth: per-stream id chains, live (writer view) vs
      // flushed (what a crash preserves)
      var live = Map.empty[String, List[String]].withDefaultValue(Nil)
      var flushed = live
      var nextId = 0
      var writerGen = 0
      var w = freshWriter("A0", loadFirst = false)
      val zombies = scala.collection.mutable.Buffer.empty[EventStore]
      w.save(dir, buckets = 4) // establish the layout

      def appendSome(): Unit = {
        val s0 = s"p${rnd.nextInt(3)}"
        val n = 1 + rnd.nextInt(3)
        var prev = live(s0).headOption
        val batch = (0 until n).map { _ =>
          val id = s"e$nextId"; nextId += 1
          val b = EventInput("E", id, "C", s0, "{}", previous_id = prev)
          prev = Some(id)
          b
        }
        val r = w.append(batch)
        assert(r.rejected.isEmpty, s"seed $seed: unexpected rejection ${r.rejected}")
        live = live.updated(s0, batch.reverseIterator.map(_.event_id).toList ::: live(s0))
      }

      def readerCheck(): Unit = {
        val reader = new EventStore(spark.newSession())
        reader.now = clock
        reader.load(dir, buckets = 4)
        val got = reader.allEvents.collect()
        val want = flushed.values.map(_.size).sum
        assert(got.length === want,
          s"seed $seed: published log has ${got.length} events, flushed state has $want")
        assert(got.map(_.event_id).distinct.length === got.length,
          s"seed $seed: duplicate events in the published log")
        assert(got.map(_.offset).distinct.length === got.length,
          s"seed $seed: duplicate offsets in the published log")
        // one random stream's chain must be exactly the flushed chain
        val s0 = s"p${rnd.nextInt(3)}"
        val chain = reader.getEvents(s0, "C").collect().map(_.event_id).toSeq
        assert(chain === flushed(s0).reverse, s"seed $seed $s0: chain mismatch")
      }

      for (step <- 0 until 18) {
        rnd.nextInt(10) match {
          case n if n < 4 => appendSome()
          case 4 | 5 => w.saveIncrement(dir); flushed = live
          case 6 => w.save(dir, buckets = 4); flushed = live
          case 7 => w.compact(dir) // rewrites the FLUSHED state; tail stays in memory
          case 8 => readerCheck()
          case 9 =>
            // crash takeover: the lease expires, a successor loads the
            // published state and claims; the old writer becomes a
            // zombie whose later mutations must be fenced
            nowMs += 61000L
            zombies += w
            writerGen += 1
            w = freshWriter(s"A$writerGen", loadFirst = true)
            live = flushed // unflushed tail lost — crash semantics
        }
        // zombie harassment: a dead writer occasionally tries to
        // publish; it must throw and must not move the pointer
        if (zombies.nonEmpty && rnd.nextInt(4) == 0) {
          val z = zombies(rnd.nextInt(zombies.size))
          val before = EventStore.resolveEventsPath(dir,
            spark.sparkContext.hadoopConfiguration)
          intercept[ControlJournal.OwnershipHeldException] {
            rnd.nextInt(2) match {
              case 0 => z.save(dir, buckets = 4)
              case _ => z.compact(dir)
            }
          }
          assert(EventStore.resolveEventsPath(dir,
            spark.sparkContext.hadoopConfiguration) === before,
            s"seed $seed: a fenced zombie moved the version pointer")
        }
      }
      w.saveIncrement(dir); flushed = live
      readerCheck()
      w.releaseLogWriter()
    }
  }
}
