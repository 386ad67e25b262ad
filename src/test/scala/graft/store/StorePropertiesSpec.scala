package graft.store

import java.sql.Timestamp
import graft.SparkSpec
import scala.util.Random

/** Property-style invariants over seeded random schedules (SURVEY §5
  * mapping — strictly stronger than the reference's example-based
  * tests; deterministic seeds, no extra test deps):
  *
  *  - offsets are globally unique, dense per commit, monotone with
  *    commit order, for ANY batch mix of valid/invalid rows;
  *  - per-stream chain validity always holds post-append;
  *  - at-least-once delivery: under ANY ack/nack/expire schedule,
  *    every event is delivered ≥ once and every partition drains.
  */
class StorePropertiesSpec extends SparkSpec with graft.testkit.TestKitReported {

  private val T0 = 1700000000000L

  test("offsets stay unique/dense/monotone and chains stay valid under arbitrary batches") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val s = new EventStore(spark)
      s.now = () => new Timestamp(T0)
      s.registerDeciderEvent("P", "E")

      var heads = Map.empty[Int, String]
      val inputs = (1 to (5 + rnd.nextInt(15))).map { n =>
        val part = rnd.nextInt(4)
        val id = s"e$n"
        val prev = heads.get(part)
        if (rnd.nextInt(5) != 0) { // valid, chained
          heads += part -> id
          EventInput("E", id, "P", s"p$part", "{}", previous_id = prev)
        } else rnd.nextInt(3) match {
          case 0 => // ghost previous_id
            EventInput("E", id, "P", s"p$part", "{}", previous_id = Some("ghost"))
          case 1 => // duplicate event_id (an already-used id if any)
            EventInput("E", heads.get(part).getOrElse(id), "P", s"p$part", "{}",
              previous_id = prev)
          case _ => // null previous on non-first (or ghost on first)
            EventInput("E", id, "P", s"p$part", "{}",
              previous_id = if (prev.isEmpty) Some("ghost") else None)
        }
      }
      val res = s.append(inputs)
      val all = s.allEvents.collect().sortBy(_.offset)
      assert(all.map(_.offset).toSeq === (1L to all.length.toLong),
        s"seed=$seed offsets not dense")
      assert(res.accepted.size + res.rejected.size === inputs.size, s"seed=$seed")
      all.groupBy(e => (e.decider, e.decider_id)).foreach { case (k, es) =>
        assert(es.count(_.previous_id.isEmpty) === 1, s"seed=$seed stream=$k")
        val ids = es.map(_.event_id).toSet
        assert(es.flatMap(_.previous_id).forall(ids.contains), s"seed=$seed stream=$k")
        val prevs = es.flatMap(_.previous_id)
        assert(prevs.distinct.length === prevs.length, s"seed=$seed stream=$k")
      }
    }
  }

  test("at-least-once delivery holds under arbitrary ack/nack/expire schedules") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val s = new EventStore(spark)
      var clock = T0
      s.now = () => new Timestamp(clock)
      s.registerDeciderEvent("P", "E")
      val vs = new ViewStreams(s)
      var heads = Map.empty[String, String]
      for (i <- 1 to 6) {
        val part = s"p${i % 2}"
        s.appendEvent(EventInput("E", s"e$i", "P", part, "{}",
          previous_id = heads.get(part)))
        heads += part -> s"e$i"
      }
      vs.registerView("v", startAt = Some(new Timestamp(0L)), lockTimeoutS = 10)

      var delivered = Vector.empty[EventRow]
      var spins = 0
      var remaining = true
      while (remaining && spins < 60) {
        val got = vs.streamEvents("v", limit = 10, seconds = 10)
        delivered ++= got
        got.foreach { e =>
          rnd.nextInt(3) match {
            case 0 => vs.ack("v", e.decider_id, e.offset)
            case 1 => vs.nack("v", e.decider_id)
            case _ => () // ignore: lease expires
          }
        }
        clock += 11000 // move past every lease
        remaining = vs.allLocks.collect().exists(l => l.last_offset < l.offset)
        spins += 1
      }
      assert(!remaining, s"seed=$seed: view failed to drain in 60 rounds")
      val deliveredIds = delivered.map(_.event_id).toSet
      assert((1 to 6).map(i => s"e$i").toSet.subsetOf(deliveredIds),
        s"seed=$seed: lost events ${(1 to 6).map(i => s"e$i").toSet -- deliveredIds}")
      // the acked floor never exceeds the head, and ends at the head
      val locks = vs.allLocks.collect()
      assert(locks.forall(l => l.last_offset == l.offset), s"seed=$seed")
    }
  }
}
