package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted BM25 index: file-backed search must score exactly like a
  * plain-Scala BM25 recompute over the raw corpus, appends must be
  * equivalent to rebuilding, and the search scan must prune to the
  * query terms' bucket partitions.
  */
class DocSearchIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val terms = Seq("join", "stream", "hash", "sort")

  /** Plain-Scala BM25 with the exact IEEE op order of the Spark
    * contrib column (and the oracle SQL): one drifted parenthesis
    * fails the comparison bit-for-bit.
    */
  private def exactScores(docs: Seq[(Long, String)]): Map[Long, Double] = {
    val toks = docs.map { case (id, t) => id -> t.toLowerCase.split(" ", -1).toSeq }
    val dls = toks.map { case (id, ws) => id -> ws.length.toDouble }.toMap
    val nDocs = docs.size.toDouble
    val avgdl = dls.values.map(_.toLong).sum.toDouble / nDocs
    val tfs = toks.map { case (id, ws) =>
      id -> terms.map(t => ws.count(_ == t).toDouble)
    }.toMap
    val dfs = terms.indices.map(i => tfs.values.count(_(i) > 0).toDouble)
    toks.flatMap { case (id, _) =>
      val score = terms.indices.map { i =>
        val tf = tfs(id)(i); val df = dfs(i)
        if (tf > 0)
          math.log((nDocs - df + 0.5) / (df + 0.5) + 1) * tf * 2.2 /
            (tf + 1.2 * (0.25 + 0.75 * dls(id) / avgdl))
        else 0.0
      }.reduce(_ + _)
      if (score > 0)
        Some(id -> BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
    }.toMap
  }

  private def docs = graft.Tables.documents(spark, sf)
    .select("doc_id", "text").collect()
    .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("file-backed search equals the exact BM25 recompute; append equals rebuild") {
    val all = docs
    val corpus = all.filter(_._1 % 5 != 0)
    val shard = all.filter(_._1 % 5 == 0)
    import spark.implicits._
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

    val dir = java.nio.file.Files.createTempDirectory("graft-doc-idx").toString
    DocSearchIndex.build(spark, df(corpus), dir)
    DocSearchIndex.appendIncrement(spark, df(shard), dir)

    val k = 25
    val got = DocSearchIndex.search(spark, dir, terms, k).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val exact = exactScores(all)
    val expected = exact.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
    assert(got.toSeq == expected,
      s"index search diverged from exact BM25: got=${got.take(3).toSeq} expected=${expected.take(3)}")
  }

  test("an ack-lost full re-append of the same shard leaves scores unchanged") {
    // at-least-once ingest: the appender wrote postings AND the stats
    // row, then the ack was lost and the whole shard is replayed.
    // Postings are absorbed algebraically (MAX tf, COUNT DISTINCT df);
    // the stats side must be too — the replayed row is bit-identical
    // (deterministic aggregates + the shard_id content hash) and the
    // readers' row-level DISTINCT counts it once.
    val all = docs
    val corpus = all.filter(_._1 % 5 != 0)
    val shard = all.filter(_._1 % 5 == 0)
    import spark.implicits._
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

    val dir = java.nio.file.Files.createTempDirectory("graft-doc-idx-dup").toString
    DocSearchIndex.build(spark, df(corpus), dir)
    DocSearchIndex.appendIncrement(spark, df(shard), dir)
    val k = 25
    val before = DocSearchIndex.search(spark, dir, terms, k).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

    DocSearchIndex.appendIncrement(spark, df(shard), dir) // the replay
    val conf = spark.sparkContext.hadoopConfiguration
    val statsRows = spark.read.parquet(
      graft.store.IndexMaintenance.resolve(dir, "stats", conf))
    assert(statsRows.count() === 3L, "the replayed stats row is physically present")
    assert(statsRows.distinct().count() === 2L,
      "the replayed row must be bit-identical to the original (shard_id " +
        "content hash is deterministic)")
    val after = DocSearchIndex.search(spark, dir, terms, k).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before, "a replayed shard must not move BM25 scores")

    // and compaction heals the physical bloat without moving scores
    DocSearchIndex.compact(spark, dir)
    assert(spark.read.parquet(
      graft.store.IndexMaintenance.resolve(dir, "stats", conf)).count() === 1L)
    val compacted = DocSearchIndex.search(spark, dir, terms, k).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(compacted == before)
  }

  test("search prunes the postings scan to the query terms' buckets") {
    val all = docs
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-doc-idx2").toString
    DocSearchIndex.build(spark, all.toDF("doc_id", "text"), dir)
    // the full path runs (and caches its pruned postings — which is
    // why the scan below is asserted on the pre-cache relation: the
    // file scan lives inside the InMemoryRelation after persistOnce)
    assert(DocSearchIndex.search(spark, dir, Seq("join"), 5).collect().nonEmpty)
    // the scan search builds: bucket filter over the partitioned
    // layout — partition pruning must reduce the file list to the
    // term's bucket directory
    val b = DocSearchIndex.bucketOf("join")
    val pruned = spark.read.parquet(s"$dir/postings.parquet")
      .filter(col("bucket").isin(Integer.valueOf(b)))
    val scans = pruned.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a postings file scan")
    assert(scans.head.partitionFilters.nonEmpty,
      "bucket filter was not pushed as a partition filter")
    val files = scans.flatMap(f => f.relation.location.listFiles(
      f.partitionFilters, f.dataFilters))
      .flatMap(_.files).map(_.getPath.toString)
    assert(files.nonEmpty && files.forall(_.contains(s"bucket=$b")),
      s"scan read outside bucket=$b: ${files.filterNot(_.contains(s"bucket=$b")).take(3)}")
  }

  test("streaming queries score against the index; results equal the exact micro recompute") {
    import spark.implicits._
    val all = docs
    val dir = java.nio.file.Files.createTempDirectory("graft-doc-idx3").toString
    DocSearchIndex.build(spark, all.toDF("doc_id", "text"), dir)

    // exact micro-quantized recompute (the streaming contract):
    // floor(contrib * 1e6) per (query term, doc), exact long sums
    val toks = all.map { case (id, t) => id -> t.toLowerCase.split(" ", -1).toSeq }
    val dls = toks.map { case (id, ws) => id -> ws.length.toDouble }.toMap
    val nDocs = all.size.toDouble
    val avgdl = dls.values.map(_.toLong).sum.toDouble / nDocs
    def microScores(qterms: Seq[String]): Map[Long, Long] = {
      val dfByTerm = qterms.map(t =>
        t -> toks.count(_._2.contains(t)).toDouble).toMap
      toks.flatMap { case (id, ws) =>
        val s = qterms.distinct.map { t =>
          val tf = ws.count(_ == t).toDouble
          if (tf > 0) {
            val df = dfByTerm(t)
            math.floor(math.log((nDocs - df + 0.5) / (df + 0.5) + 1) * tf * 2.2 /
              (tf + 1.2 * (0.25 + 0.75 * dls(id) / avgdl)) * 1e6).toLong
          } else 0L
        }.sum
        if (s != 0L) Some(id -> s) else None
      }.toMap
    }
    val k = 7
    val qs = Seq(1L -> Seq("join", "stream"), 2L -> Seq("hash", "sort", "hash"))
    val expected = qs.flatMap { case (qid, ts) =>
      microScores(ts.distinct).toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
        .zipWithIndex.map { case ((docId, s), i) => (qid, i + 1, docId, s) }
    }.toSet

    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[QueryArrival]
    val out = DocSearchIndex.searchStream(spark, source.toDF(), dir, k = k,
      watermarkDelay = "1 minute", windowDuration = "1 minute")
    val q = out.writeStream.format("memory").queryName("doc_stream_search")
      .outputMode("append").start()
    try {
      val T = 1700000000000L
      source.addData(qs.map { case (qid, ts) =>
        QueryArrival(qid, ts, new java.sql.Timestamp(T)) }: _*)
      q.processAllAvailable()
      // flush arrival advances the watermark past the query window
      source.addData(QueryArrival(99L, Seq("join"),
        new java.sql.Timestamp(T + 3600L * 1000)))
      q.processAllAvailable()
      val streamed = spark.table("doc_stream_search").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .filterNot(_._1 == 99L).toSet
      assert(streamed == expected,
        s"stream/exact divergence: only-stream=${(streamed -- expected).take(3)}, " +
          s"only-exact=${(expected -- streamed).take(3)}")
    } finally q.stop()
  }
}

final case class QueryArrival(query_id: Long, terms: Seq[String],
                              ingest_ts: java.sql.Timestamp)
