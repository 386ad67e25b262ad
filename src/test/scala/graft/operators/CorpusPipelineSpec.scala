package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end pipeline behavior on the sf0.001 corpus with planted
  * rows: an exact duplicate, a near duplicate, a PII-bearing doc, and
  * a benchmark-contaminated doc. Each must be handled by its stage.
  */
class CorpusPipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("each pipeline stage removes exactly its planted offender") {
    import spark.implicits._
    val base = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val rows = base.collect()
    val d0text = rows.head.getString(1)
    val near = d0text.split(" ").toSeq.updated(1, "zzzz").mkString(" ")
    val benchText = "held out benchmark passage that must never leak " +
      "into the training corpus at all"
    val planted = Seq(
      (90001L, d0text),                                   // exact dup of doc 0
      (90002L, near),                                     // near dup of doc 0
      (90003L, ("call 555-123-4567 now " * 5).trim),      // PII, survives scrubbed
      (90004L, s"prefix words $benchText suffix words"),  // contaminated
      (90005L, "too short")                               // fails quality gate
    ).toDF("doc_id", "text")
    val docs = base.union(planted)
    val bench = Seq((1L, benchText)).toDF("doc_id", "text")

    val out = CorpusPipeline.prepareDocs(docs, Some(bench))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet

    assert(!ids.contains(90001L), "exact duplicate survived")
    assert(!ids.contains(90002L), "near duplicate survived")
    assert(ids.contains(0L), "canonical doc 0 must survive its duplicates")
    assert(!ids.contains(90004L), "benchmark-contaminated doc survived")
    assert(!ids.contains(90005L), "sub-minWords doc survived")
    assert(ids.contains(90003L), "scrubbable doc should survive")
    val scrubbed = out.filter(col("doc_id") === 90003L)
      .select("text").head().getString(0)
    assert(!scrubbed.contains("555-123-4567") && scrubbed.contains("<PHONE>"))
    // no survivor shares a digest with another
    assert(out.groupBy(md5(col("text"))).count().filter(col("count") > 1).count() == 0)
  }

  test("packed output covers every surviving chunk with contiguous offsets") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val packed = CorpusPipeline.prepare(docs, None).collect()
    assert(packed.nonEmpty)
    val sorted = packed.sortBy(r => (r.getLong(0), r.getInt(1)))
    var expect = 0L
    for (r <- sorted) {
      val nWords = r.getLong(3); val start = r.getLong(4)
      assert(start == expect, s"offset gap at doc ${r.getLong(0)} chunk ${r.getInt(1)}")
      assert(r.getLong(5) == start / 256 && r.getLong(6) == (start + nWords - 1) / 256)
      expect += nWords
    }
  }
}
