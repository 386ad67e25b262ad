package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental-dedup contract: a new shard is deduped against the
  * PERSISTED signature index at shard-proportional cost — the job
  * must read the index files, never the corpus text — and the
  * file-backed path must agree row-for-row with the in-query twin the
  * oracle verifies.
  */
class IncrementalDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("file-backed dedupIncrement equals the in-query twin; appended shards become visible") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val shard = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-sig-index").toString

    IncrementalDedup.build(spark, corpus, dir)
    val viaIndex = IncrementalDedup.dedupIncrement(spark, shard, dir).collect()
    val inQuery = IncrementalDedup.dedupAgainst(
      IncrementalDedup.signatures(corpus),
      IncrementalDedup.shingleSets(corpus), shard).collect()
    assert(viaIndex.toSeq === inQuery.toSeq)
    assert(viaIndex.nonEmpty)

    // append the shard, then an exact copy of one shard doc arriving
    // in a LATER shard must be flagged against the now-indexed one
    IncrementalDedup.appendIncrement(spark, shard, dir)
    val probeId = viaIndex.head.getLong(0)
    val probeText = docs.filter(col("doc_id") === probeId)
      .select("text").as[String].head()
    val shard2 = Seq((1000000L, probeText, "en", "probe", probeText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out2 = IncrementalDedup.dedupIncrement(spark, shard2, dir).collect()
    assert(out2.length === 1)
    assert(out2.head.getBoolean(1), "exact copy of an indexed doc must flag")
    assert(out2.head.getLong(2) === probeId)
    assert(out2.head.getDouble(3) === 1.0)
  }

  test("dedupIncrement scans the index, not the corpus parquet") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-sig-index2").toString
    IncrementalDedup.build(spark, corpus, dir)
    // shard arrives as in-memory rows (the streaming-ingest shape):
    // every FILE the job reads must then live under the index dir —
    // in particular, documents.parquet (the corpus text) is never
    // opened, which is the whole point of a persisted index
    val shard = Seq((77777L, "one two three four five six", "en", "s", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = IncrementalDedup.dedupIncrement(spark, shard, dir)
    val files = out.inputFiles.toSeq
    assert(files.nonEmpty, "expected file scans over the index")
    assert(files.forall(_.contains(dir)),
      s"non-index file scanned: ${files.filterNot(_.contains(dir)).take(3).mkString(",")}")
    assert(!files.exists(_.contains("documents.parquet")),
      "corpus text parquet must not be scanned by the incremental path")
    out.collect() // and it runs
  }
}
