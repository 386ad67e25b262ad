package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.operators.EmbIncrementalDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming embedding dedup against the persisted index: vectors
  * arriving as events must flag the same (vector, best-match) verdicts
  * a plain-Scala exact recompute of shard×corpus cosine produces — the
  * banding's exhaustive-recall bound makes the exact answer the truth,
  * not just a floor.
  */
class EmbIngestSpec extends SparkSpec {

  test("arriving vectors flag against the index; verdicts equal the exact recompute") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val e = graft.Tables.embeddings(spark, sf)
    val corpus = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val shard = e.filter(pmod(col("vec_id"), lit(5)) === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-stream-idx").toString
    EmbIncrementalDedup.build(spark, corpus, dir)

    // exact truth: best corpus match per shard vector at cosine >= 0.95
    def vecs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val corp = vecs(corpus)
    def nrm(v: Array[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    val corpN = corp.map { case (id, v) => (id, v, nrm(v)) }
    // the synthetic fixture has no cross-split pairs at 0.95 — plant
    // two arrivals that must flag (an exact copy and a small jitter of
    // corpus vectors); the un-planted shard vectors pin the negative
    // side (none may flag)
    val jitter = corp(1)._2.zipWithIndex.map { case (x, i) =>
      x + (if (i == 0) 0.001f else 0f) }
    val arrivals = vecs(shard) ++ Seq(
      (500000L, corp(0)._2), (500001L, jitter))
    val expected = arrivals.flatMap { case (sid, sv) =>
      val sn = nrm(sv)
      val hits = corpN.map { case (cid, cv, cn) =>
        val dot = sv.zip(cv).map { case (a, b) => a.toDouble * b.toDouble }.sum
        (cid, BigDecimal(dot / (sn * cn))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.filter(_._2 >= EmbIncrementalDedup.Threshold)
      if (hits.isEmpty) None
      else Some(sid -> hits.maxBy { case (cid, s) => (s, -cid.toDouble) })
    }.toMap
    assert(expected.contains(500000L) && expected.contains(500001L),
      "planted arrivals must have exact matches")

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[VecArrival]
    val out = EmbIncrementalDedup.dedupStream(spark, source.toDF()
        .select(col("vec_id"), col("embedding").cast("array<float>"),
          col("ingest_ts")),
      dir, watermarkDelay = "1 minute", windowDuration = "1 minute")
    val q = out.writeStream.format("memory").queryName("emb_stream_dedup")
      .outputMode("append").start()
    try {
      val T = 1700000000000L
      source.addData(arrivals.map { case (id, v) =>
        VecArrival(id, v.toSeq, new Timestamp(T)) }.toIndexedSeq: _*)
      q.processAllAvailable()
      // late flush event (an exact copy of a corpus vector, so it
      // itself flags — excluded below) advances the watermark past the
      // shard window so append-mode rows emit
      source.addData(VecArrival(999999L, corp.head._2.toSeq,
        new Timestamp(T + 3600L * 1000)))
      q.processAllAvailable()
      val streamed = spark.table("emb_stream_dedup").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
        .filterNot(_._1 == 999999L)
      assert(streamed === expected,
        s"stream/exact divergence: only-stream=${(streamed.keySet -- expected.keySet).take(5)}, " +
          s"only-exact=${(expected.keySet -- streamed.keySet).take(5)}")
    } finally q.stop()
  }

  test("streaming top-k search equals the batch ranking over the same index") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val e = graft.Tables.embeddings(spark, sf)
    val corpus = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-search-idx").toString
    EmbIncrementalDedup.build(spark, corpus, dir)
    val corp = corpus.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    // queries: a handful of shard vectors + a planted near-copy of a
    // corpus vector whose rank-1 must be that vector
    val plantedOf = corp(2)._1
    val jitter = corp(2)._2.zipWithIndex.map { case (x, i) =>
      x + (if (i == 1) 0.0005f else 0f) }
    val queries = e.filter(pmod(col("vec_id"), lit(5)) === 0)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .take(10) ++ Seq((600000L, jitter))

    val K = 5
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[VecArrival]
    val out = EmbIncrementalDedup.searchStream(spark, source.toDF()
        .select(col("vec_id"), col("embedding").cast("array<float>"),
          col("ingest_ts")),
      dir, k = K, watermarkDelay = "1 minute", windowDuration = "1 minute")
    val q = out.writeStream.format("memory").queryName("emb_stream_search")
      .outputMode("append").start()
    try {
      val T = 1700000000000L
      source.addData(queries.map { case (id, v) =>
        VecArrival(id, v.toSeq, new Timestamp(T)) }.toIndexedSeq: _*)
      q.processAllAvailable()
      source.addData(VecArrival(999999L, corp.head._2.toSeq,
        new Timestamp(T + 3600L * 1000)))
      q.processAllAvailable()
      val streamed = spark.table("emb_stream_search").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .filterNot(_._1 == 999999L).toSet

      // batch twin: the searchIndex API over the SAME persisted index
      val qdf = queries.toSeq.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>"))
      val batch = EmbIncrementalDedup.searchIndex(spark, qdf, dir, k = K)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch,
        s"stream/batch divergence: only-stream=${(streamed -- batch).take(3)}, " +
          s"only-batch=${(batch -- streamed).take(3)}")
      // semantic anchor: the planted near-copy's rank-1 is its source
      assert(streamed.exists(t => t._1 == 600000L && t._2 == 1 && t._3 == plantedOf),
        "planted near-copy must rank its source first")
    } finally q.stop()
  }

  test("streaming hard-negative mining equals the batch miner; positives are skipped") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val e = graft.Tables.embeddings(spark, sf)
    val corpus = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-mine-idx").toString
    EmbIncrementalDedup.build(spark, corpus, dir)
    val idxLabels = corpus.select("vec_id", "label")
    val corp = corpus.select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect()

    // a planted arrival NEAR-IDENTICAL to corpus vector c0 but carrying
    // c0's OWN label: the miner must skip that positive and return a
    // different-label collision (or nothing), never c0 itself
    val (c0id, c0v, c0lab) = corp(0)
    val jitter = c0v.zipWithIndex.map { case (x, i) =>
      x + (if (i == 0) 0.0005f else 0f) }
    val queries = e.filter(pmod(col("vec_id"), lit(5)) === 0)
      .select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect()
      .take(10) ++ Seq((700000L, jitter, c0lab))

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[LabeledVecArrival]
    val out = EmbIncrementalDedup.mineStream(spark, source.toDF()
        .select(col("vec_id"), col("embedding").cast("array<float>"),
          col("label"), col("ingest_ts")),
      dir, idxLabels, watermarkDelay = "1 minute", windowDuration = "1 minute")
    val q = out.writeStream.format("memory").queryName("emb_stream_mine")
      .outputMode("append").start()
    try {
      val T = 1700000000000L
      source.addData(queries.map { case (id, v, lab) =>
        LabeledVecArrival(id, v.toSeq, lab, new Timestamp(T)) }.toIndexedSeq: _*)
      q.processAllAvailable()
      source.addData(LabeledVecArrival(999999L, corp.head._2.toSeq, corp.head._3,
        new Timestamp(T + 3600L * 1000)))
      q.processAllAvailable()
      val streamed = spark.table("emb_stream_mine").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .filterNot(_._1 == 999999L).toSet

      val qdf = queries.toSeq.toDF("vec_id", "embedding", "label")
        .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      val batch = EmbIncrementalDedup.mineHardNegatives(spark, qdf, dir, idxLabels)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(streamed == batch,
        s"stream/batch divergence: only-stream=${(streamed -- batch).take(3)}, " +
          s"only-batch=${(batch -- streamed).take(3)}")
      // the planted positive is never mined; any mined row for the
      // plant is cross-label
      for ((qid, mid, _, clab) <- streamed if qid == 700000L) {
        assert(mid != c0id, "mined the same-label near-dup — positives must be skipped")
        assert(clab != c0lab)
      }
      // and mined labels always differ from the query's own
      val qLab = queries.map(t => t._1 -> t._3).toMap
      for ((qid, _, _, clab) <- streamed) assert(qLab(qid) != clab)
    } finally q.stop()
  }
}

case class VecArrival(vec_id: Long, embedding: Seq[Float], ingest_ts: Timestamp)

case class LabeledVecArrival(vec_id: Long, embedding: Seq[Float], label: Int,
                             ingest_ts: Timestamp)
