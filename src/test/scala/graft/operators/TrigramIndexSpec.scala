package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted trigram substring index: file-backed search must equal a
  * plain contains() scan (the construction is an index, never a
  * semantics change), appends must extend coverage, the scan must
  * prune to the pattern trigrams' buckets, and short patterns must be
  * rejected rather than silently wrong.
  */
class TrigramIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("file-backed search equals the direct contains() scan; append extends it") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val shard = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-tri-idx").toString
    TrigramIndex.build(spark, corpus, dir)

    val pattern = TrigramIndex.SearchPattern
    def truth(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("text").contains(pattern))
        .select("doc_id").as[Long].collect().sorted.toSeq
    val got = TrigramIndex.search(spark, dir, corpus, pattern)
      .as[Long].collect().toSeq
    assert(got == truth(corpus))
    assert(got.nonEmpty, "fixture must contain the pattern")

    // append the shard: the index now answers over the union
    TrigramIndex.appendIncrement(spark, shard, dir)
    val got2 = TrigramIndex.search(spark, dir, docs, pattern)
      .as[Long].collect().toSeq
    assert(got2 == truth(docs))
    assert(got2.size > got.size, "the shard must contribute matches")

    // compaction preserves answers and bounds files
    TrigramIndex.compact(spark, dir)
    val got3 = TrigramIndex.search(spark, dir, docs, pattern)
      .as[Long].collect().toSeq
    assert(got3 == got2)
    assert(graft.store.IndexMaintenance.liveFileCount(
      dir, "postings", spark.sparkContext.hadoopConfiguration)
      <= TrigramIndex.NBuckets)

    // a token-boundary-crossing pattern (no BM25 term could answer
    // this): the first 7 raw chars of some doc, spaces included
    val cross = corpus.select("text").as[String].head().take(7)
    val gotCross = TrigramIndex.search(spark, dir, docs, cross)
      .as[Long].collect().toSeq
    def truthOf(p: String) = docs.filter(col("text").contains(p))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(gotCross == truthOf(cross))
    assert(gotCross.nonEmpty)
  }

  test("search prunes the postings scan to the pattern trigrams' buckets") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf).limit(100)
    val dir = java.nio.file.Files.createTempDirectory("graft-tri-idx2").toString
    TrigramIndex.build(spark, docs, dir)
    val tris = TrigramIndex.trigramsOf("dup")
    val bks = tris.map(TrigramIndex.bucketOf).distinct
    val pruned = spark.read.parquet(s"$dir/postings.parquet")
      .filter(col("bucket").isin(bks.map(Integer.valueOf): _*))
    val scans = pruned.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.nonEmpty,
      "bucket filter was not pushed as a partition filter")
    val files = scans.flatMap(f => f.relation.location.listFiles(
      scans.head.partitionFilters, Nil)).flatMap(_.files)
      .map(_.getPath.toString)
    assert(files.nonEmpty)
    assert(files.forall(p => bks.exists(b => p.contains(s"bucket=$b"))),
      s"scan read outside the pattern's buckets: ${files.take(3)}")
  }

  test("patterns shorter than a trigram are rejected") {
    intercept[IllegalArgumentException] {
      TrigramIndex.trigramsOf("ab")
    }
  }
}
