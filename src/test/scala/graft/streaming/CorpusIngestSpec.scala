package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming pipeline must gate, scrub, dedup, and chunk as
  * documents arrive — all in append mode with bounded state.
  */
class CorpusIngestSpec extends SparkSpec {

  test("arriving docs are gated, deduped and chunked across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[DocArrival]
    val chunks = CorpusIngest.prepare(source.toDF(), "10 minutes")
    val q = chunks.writeStream
      .format("memory").queryName("ingest_chunks")
      .outputMode("append")
      .start()
    try {
      val T = 1700000000000L
      def t(m: Long) = new Timestamp(T + m * 60000)
      val longDoc = (1 to 25).map(i => s"word$i").mkString(" ")
      source.addData(
        DocArrival(1L, longDoc, t(0)),
        DocArrival(2L, "too short", t(1)),            // fails the gate
        DocArrival(3L, "mail bob@site.io " + longDoc, t(2))) // scrub + admit
      q.processAllAvailable()
      source.addData(DocArrival(4L, longDoc, t(3)))   // dup of 1 → dropped
      q.processAllAvailable()
      val rows = spark.table("ingest_chunks").collect()
      val byDoc = rows.groupBy(_.getLong(0))
      assert(byDoc.keySet == Set(1L, 3L), s"got ${byDoc.keySet}")
      // doc 1: 25 words → chunks at 0 and 15 (len 20, stride 15)
      assert(byDoc(1L).map(_.getInt(1)).sorted.toSeq == Seq(0, 1))
      // scrubbed email must not appear in any chunk text
      assert(!byDoc(3L).exists(_.getString(4).contains("bob@site.io")))
      assert(byDoc(3L).exists(_.getString(4).contains("<EMAIL>")))
    } finally q.stop()
  }

  test("streaming Gopher gate matches the batch rule verdicts on a static input") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    // batch truth: the oracle-verified rule columns
    val batchKeep = graft.operators.TextDedupQueries.gopherRuleCols(docs)
      .filter(org.apache.spark.sql.functions.col("keep"))
      .select("doc_id").as[Long].collect().toSet
    // the gate is a stateless projection+filter, so running it on the
    // static frame IS the streaming semantics (same plan per batch)
    val gated = CorpusIngest.gopherGate(docs).select("doc_id").as[Long].collect().toSet
    assert(gated === batchKeep)
    // and it runs as a real stream: quality docs pass, junk is dropped
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[DocArrival]
    val q = CorpusIngest.gopherGate(source.toDF()).writeStream
      .format("memory").queryName("gopher_gated").outputMode("append").start()
    try {
      val good = (1 to 60).map(i => s"the word$i of that have with").mkString(" ")
      source.addData(
        DocArrival(1L, good, new Timestamp(0L)),
        DocArrival(2L, "#### ### ##", new Timestamp(1L)), // symbol junk
        DocArrival(3L, "", new Timestamp(2L)))            // empty doc
      q.processAllAvailable()
      val ids = spark.table("gopher_gated").select("doc_id").as[Long].collect().toSet
      assert(ids === Set(1L))
    } finally q.stop()
  }

  test("watermarked Bloom decontamination matches the batch twin on a static input") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // batch truth (the oracle-verified registry entry)
    val batch = graft.operators.Registry.byName("doc_decontaminate_bloom")
      .run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.nonEmpty, "fixture must contain contaminated docs")
    // stream replay: same benchmark split, corpus docs arrive as events
    val docs = graft.Tables.documents(spark, sf)
    val benchPos = graft.operators.TextDedupQueries.bloomPositions(
      graft.operators.TextDedupQueries.grams8(
        docs.filter(col("doc_id") % 7 === 0).select("doc_id", "text"))
        .select(explode(col("g8")).as("g")).distinct())
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
      .select("doc_id", "text").as[(Long, String)].collect()
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[DocArrival]
    val out = CorpusIngest.bloomContamination(source.toDF(), benchPos,
      watermarkDelay = "1 minute", windowDuration = "1 minute")
    val q = out.writeStream.format("memory").queryName("bloom_contam")
      .outputMode("append").start()
    try {
      val T = 1700000000000L
      source.addData(corpus.map { case (id, tx) =>
        DocArrival(id, tx, new Timestamp(T)) }.toIndexedSeq: _*)
      q.processAllAvailable()
      // a late contaminated flush event advances the watermark past
      // the corpus window so its append-mode rows emit (the flush
      // doc's own window stays open and is excluded below)
      val benchText = docs.filter(col("doc_id") % 7 === 0)
        .orderBy("doc_id").select("text").as[String].head()
      source.addData(DocArrival(999999L, benchText,
        new Timestamp(T + 3600L * 1000)))
      q.processAllAvailable()
      val streamed = spark.table("bloom_contam").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
        .filterNot(_._1 == 999999L)
      assert(streamed === batch,
        s"stream/batch divergence: only-stream=${(streamed.keySet -- batch.keySet).take(5)}, " +
          s"only-batch=${(batch.keySet -- streamed.keySet).take(5)}")
    } finally q.stop()
  }
}
