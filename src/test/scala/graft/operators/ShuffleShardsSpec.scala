package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** doc_shuffle_shards: the deterministic epoch shuffle must equal the
  * plain-Scala rank computation, reproduce bit-for-bit across runs,
  * and keep the single-task window OUT of the plan (position rides
  * GlobalIndex's parallel range sort).
  */
class ShuffleShardsSpec extends SparkSpec {

  private def run() = Registry.byName("doc_shuffle_shards")
    .run(spark, "/root/testdata/sf0.001")
    .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("equals the plain-Scala seeded rank, and is reproducible") {
    val got = run()
    assert(got == run(), "same seed must reproduce the epoch bit-for-bit")
    val md = java.security.MessageDigest.getInstance("MD5")
    val ids = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val prio = ids.map { id =>
      md.reset()
      val d = md.digest(s"shuffle42#$id".getBytes("UTF-8"))
      val v = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      (id, v)
    }
    val expected = prio.groupBy(_._2 % 16).toSeq.flatMap { case (shard, ds) =>
      ds.sortBy { case (id, v) => (v, id) }.zipWithIndex.map {
        case ((id, _), i) => (id, shard.toInt, (i + 1).toLong)
      }
    }.sortBy(t => (t._2, t._3))
    assert(got == expected)
    // every shard non-empty and positions dense from 1
    val byShard = got.groupBy(_._2)
    assert(byShard.size == 16)
    for ((_, rows) <- byShard)
      assert(rows.map(_._3).sorted == (1L to rows.size).toSeq)
  }

  test("plan has no Window operator (GlobalIndex carries the rank)") {
    val df = Registry.byName("doc_shuffle_shards")
      .run(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"single-task window leaked in:\n$plan")
  }
}
