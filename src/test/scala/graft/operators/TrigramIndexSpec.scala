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

  test("streaming pattern search equals the batch grep; short patterns drop") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-tri-stream").toString
    TrigramIndex.build(spark, docs, dir)
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[PatternArrival]
    val out = TrigramIndex.searchStream(spark, source.toDF(), dir, docs,
      watermarkDelay = "1 minute", windowDuration = "1 minute")
    val q = out.writeStream.format("memory").queryName("tri_stream")
      .outputMode("append").start()
    try {
      val T = 1700000000000L
      val pats = Seq((1L, TrigramIndex.SearchPattern),
        (2L, "merge spark"), (3L, "zz"), // too short: dropped, not wrong
        (4L, docs.select("text").as[String].head().take(9)))
      source.addData(pats.map { case (id, p) =>
        PatternArrival(id, p, new java.sql.Timestamp(T)) }.toIndexedSeq: _*)
      q.processAllAvailable()
      // late flush pattern advances the watermark (must be >= 3 chars
      // so the length gate does not drop it before the watermark node)
      source.addData(PatternArrival(99L, "flushpat",
        new java.sql.Timestamp(T + 3600L * 1000)))
      q.processAllAvailable()
      val streamed = spark.table("tri_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).filterNot(_._1 == 99L)
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      for ((qid, pat) <- pats if pat.length >= 3) {
        val want = TrigramIndex.search(spark, dir, docs, pat)
          .as[Long].collect().toSeq
        assert(streamed.getOrElse(qid, Seq.empty) == want,
          s"pattern '$pat' diverged from the batch grep")
      }
      assert(!streamed.contains(3L), "a 2-char pattern must emit nothing")
    } finally q.stop()
  }

  test("char_trigrams kernel equals the transform/substring spelling") {
    import spark.implicits._
    val g = new String(Character.toChars(0x1F600))
    val fixture = Seq(
      "hello world window merge",
      "aaaa", "ab", "", "abc",
      s"a${g}b$g mixed $g$g$g surrogate pairs",
      "tab\there\nnewline there",
      "répéter répéter 日本語テキスト").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    graft.GraftExtensions.register(spark)
    val rows = fixture.select(col("doc_id"),
      expr("char_trigrams(text)").as("kernel"),
      expr("""CASE WHEN length(text) >= 3 THEN
                array_distinct(transform(sequence(1, length(text) - 2),
                  i -> substring(text, i, 3)))
              ELSE array() END""").as("hof")).collect()
    for (r <- rows)
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"kernel/HOF divergence on doc ${r.getLong(0)}")
  }

  test("patterns shorter than a trigram are rejected") {
    intercept[IllegalArgumentException] {
      TrigramIndex.trigramsOf("ab")
    }
  }

  test("pattern trigrams are derived by code point, matching the postings") {
    import spark.implicits._
    // U+1F600 is ONE code point but TWO UTF-16 units: a sliding(3)
    // over UTF-16 would split the surrogate pair and derive trigrams
    // the (code-point-addressed) Spark postings never contain
    val g = new String(Character.toChars(0x1F600))
    val pattern = s"a${g}b$g" // 4 code points -> exactly 2 trigrams
    assert(TrigramIndex.trigramsOf(pattern) == Seq(s"a${g}b", s"${g}b$g"))
    // a 3-code-point pattern passes the length gate even though its
    // UTF-16 length is 6
    assert(TrigramIndex.trigramsOf(s"$g$g$g") == Seq(s"$g$g$g"))

    // end-to-end: a supplementary-plane pattern round-trips the index
    val docs = Seq((1L, s"xx a${g}b$g yy"), (2L, "plain ascii text"),
      (3L, s"$g$g$g$g")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tri-cp").toString
    TrigramIndex.build(spark, docs, dir)
    assert(TrigramIndex.search(spark, dir, docs, pattern)
      .as[Long].collect().toSeq == Seq(1L))
    assert(TrigramIndex.search(spark, dir, docs, s"$g$g$g")
      .as[Long].collect().toSeq == Seq(3L))
  }
}

case class PatternArrival(query_id: Long, pattern: String, ingest_ts: java.sql.Timestamp)
