package graft.store

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bulk-ingest suite: distributed validation gates, GlobalIndex offset
  * assignment, lock fanout on import, and the post-hoc chain audit.
  */
class BulkIngestSpec extends SparkSpec with graft.testkit.TestKitReported {

  private val T0 = 1700000000000L

  private def chainedSource(n: Int, streams: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      val part = i % streams
      val prevInStream = i - streams
      (s"E", s"e$i", 1L, "P", s"p$part", s"""{"i":$i}""",
        None: Option[String],
        if (prevInStream >= 1) Some(s"e$prevInStream") else None,
        false, new Timestamp(T0 + i * 1000L))
    }.toDF("event", "event_id", "event_version", "decider", "decider_id",
      "data", "command_id", "previous_id", "is_final", "created_at")
  }

  test("chained import: all rows land, offsets dense, chains audit clean") {
    val s = new EventStore(spark)
    s.now = () => new Timestamp(T0)
    s.registerDeciderEvent("P", "E")
    val vs = new ViewStreams(s)
    vs.registerView("v", startAt = Some(new Timestamp(0L)))

    val r = BulkIngest.ingest(s, chainedSource(500, 10))
    assert(r.accepted === 500L)
    assert(r.rejected === 0L)
    val offs = s.allEvents.select("offset").orderBy("offset")
      .collect().map(_.getLong(0))
    assert(offs.toSeq === (1L to 500L))
    assert(s.maxOffset() === 500L)
    assert(BulkIngest.chainViolations(s).count() === 0L)
    // lock fanout saw the imported heads
    val locks = vs.allLocks.collect()
    assert(locks.length === 10)
    assert(locks.map(_.offset).max === 500L)
  }

  test("set-level gates reject unregistered types and duplicate ids") {
    val s = new EventStore(spark)
    s.now = () => new Timestamp(T0)
    s.registerDeciderEvent("P", "E")
    BulkIngest.ingest(s, chainedSource(100, 10))
    // second import: same ids again + an unregistered event type
    import spark.implicits._
    val bad = chainedSource(100, 10) // all duplicate event_ids
      .union(Seq(("Ghost", "g1", 1L, "P", "p0", "{}", None: Option[String],
        None: Option[String], false, new Timestamp(T0)))
        .toDF("event", "event_id", "event_version", "decider", "decider_id",
          "data", "command_id", "previous_id", "is_final", "created_at"))
    val r2 = BulkIngest.ingest(s, bad)
    assert(r2.accepted === 0L)
    assert(r2.rejected === 101L)
    assert(s.allEvents.count() === 100L)
  }

  test("chain audit flags dangling previous_ids and misplaced finals") {
    val s = new EventStore(spark)
    s.now = () => new Timestamp(T0)
    s.registerDeciderEvent("P", "E")
    import spark.implicits._
    val broken = Seq(
      ("E", "a1", 1L, "P", "pA", "{}", None: Option[String], None: Option[String],
        true, new Timestamp(T0)),           // final, but NOT last (a2 follows)
      ("E", "a2", 1L, "P", "pA", "{}", None: Option[String], Some("a1"),
        false, new Timestamp(T0 + 1000)),
      ("E", "b1", 1L, "P", "pB", "{}", None: Option[String], Some("nope"),
        false, new Timestamp(T0 + 2000))    // dangling prev + zero null-prev
    ).toDF("event", "event_id", "event_version", "decider", "decider_id",
      "data", "command_id", "previous_id", "is_final", "created_at")
    BulkIngest.ingest(s, broken)
    val v = BulkIngest.chainViolations(s).collect()
    val kinds = v.map(_.getString(2)).toSet
    assert(kinds === Set("stream_shape", "dangling_previous_id"))
    assert(v.exists(r => r.getString(1) == "pA" && r.getString(2) == "stream_shape"))
    assert(v.exists(r => r.getString(1) == "pB" && r.getString(2) == "dangling_previous_id"))
  }
}
