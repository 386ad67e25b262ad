package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** End-to-end streaming/batch funnel parity: the full streaming gate
  * chain (quality gate → trained-classifier gate → watermarked exact
  * dedup → benchmark decontamination) run over the REAL corpus fixture
  * as a stream must reproduce the per-stage totals of the
  * oracle-verified batch entry (doc_pipeline_attrition) — one spec
  * over the whole chain, so a definition drift in any individual
  * streaming twin breaks parity here even if that twin's own unit
  * spec still passes. The classifier runs as the production shape:
  * trained OFFLINE on the at-rest corpus, served in the stream as the
  * pure projection QualityClassifier.scored.
  *
  * Keeper identity inside a duplicate group is arrival-order-dependent
  * in the stream (and min-doc_id in batch), so the assertions are on
  * the keeper-INVARIANT facts: the admitted set after the gate (per-doc
  * deterministic), and the stage totals after dedup and decontamination
  * (duplicate copies share the same text, hence the same digest and the
  * same contamination verdict — counts don't depend on which copy won).
  */
class StreamingFunnelParitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The 4-rule streaming quality gate — the SAME composite the batch
    * attrition entry gates on (the full Gopher `keep` is constant-false
    * on this corpus: the stopword rule never passes). Row-local, so
    * streaming-legal verbatim. */
  private def gate4(docs: DataFrame): DataFrame =
    graft.operators.TextDedupQueries.gopherRuleCols(docs)
      .filter(col("r_word_count") && col("r_mean_len") &&
        col("r_symbol") && col("r_alpha"))
      .select("doc_id", "text", "ingest_ts")

  test("streaming gate chain reproduces the batch attrition funnel") {
    import spark.implicits._
    val docsAll = graft.Tables.documents(spark, sf)

    // batch truth: the oracle-verified attrition entry, totalled over
    // sources (keeper-invariant form)
    val attr = graft.operators.Registry.byName("doc_pipeline_attrition")
      .run(spark, sf).collect()
    def stageTotal(ord: Int, col: org.apache.spark.sql.Row => Long): Long =
      attr.filter(_.getInt(0) == ord).map(col).sum
    val n0 = stageTotal(1, _.getLong(3)) // corpus in
    val n1 = stageTotal(1, _.getLong(4)) // after quality gate
    val n1c = stageTotal(2, _.getLong(4)) // after trained classifier
    val n2 = stageTotal(3, _.getLong(4)) // after exact dedup
    val n3 = stageTotal(4, _.getLong(4)) // after decontamination
    assert(n0 > n1 && n1 >= n1c && n1c >= n2 && n2 > n3,
      s"degenerate funnel $n0/$n1/$n1c/$n2/$n3")

    // batch truth for the gate STAGE as a set (per-doc deterministic)
    val batchGateSet = gate4(
      docsAll.filter(col("doc_id") % 7 =!= 0)
        .withColumn("ingest_ts", lit(new Timestamp(0L))))
      .select("doc_id").as[Long].collect().toSet

    val corpus = docsAll.filter(col("doc_id") % 7 =!= 0)
      .select("doc_id", "text").as[(Long, String)].collect()
    val benchGrams = graft.operators.TextDedupQueries.grams8(
        docsAll.filter(col("doc_id") % 7 === 0).select("doc_id", "text"))
      .select(explode(col("g8")).as("g")).distinct()

    // the classifier model, trained OFFLINE on the at-rest corpus —
    // the same fit the batch attrition stage runs
    val model = graft.operators.QualityClassifier.fit(spark,
      docsAll.filter(col("doc_id") % 7 =!= 0))
    def clfGate(docs: DataFrame): DataFrame =
      graft.operators.QualityClassifier.scored(docs, model)
        .filter(col("pred")).drop("pred")

    implicit val sqlCtx = spark.sqlContext
    // one MemoryStream per query — a MemoryStream trims its buffer on
    // commit, so concurrent queries sharing one source race each other
    // out of data
    val srcChain = MemoryStream[DocArrival]
    val srcGate = MemoryStream[DocArrival]
    val srcClf = MemoryStream[DocArrival]
    val srcDedup = MemoryStream[DocArrival]
    val T = 1700000000000L

    // the full chain in ONE streaming query: gate → served classifier
    // → watermarked exact dedup → 8-gram decontamination hits
    // (absence-is-success shape)
    val admitted = IngestDedup.exactDedup(
      clfGate(gate4(srcChain.toDF())), "1 minute")
    val contamHits = graft.operators.TextDedupQueries.grams8(admitted)
      .select(col("doc_id"), col("ingest_ts"), explode(col("g8")).as("g"))
      .join(benchGrams, Seq("g"), "left_semi")
      .groupBy(window(col("ingest_ts"), "1 minute"), col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .select("doc_id", "n_hits")
    val qChain = contamHits.writeStream.format("memory")
      .queryName("funnel_contam").outputMode("append").start()
    // parallel taps for the intermediate stages
    val qGate = gate4(srcGate.toDF()).select("doc_id").writeStream
      .format("memory").queryName("funnel_gate").outputMode("append").start()
    val qClf = clfGate(gate4(srcClf.toDF())).select("doc_id").writeStream
      .format("memory").queryName("funnel_clf").outputMode("append").start()
    val qDedup = IngestDedup.exactDedup(clfGate(gate4(srcDedup.toDF())), "1 minute")
      .select("doc_id").writeStream
      .format("memory").queryName("funnel_dedup").outputMode("append").start()
    val sources = Seq(srcChain, srcGate, srcClf, srcDedup)

    val queries = Seq(qChain, qGate, qClf, qDedup)
    try {
      sources.foreach(_.addData(corpus.map { case (id, tx) =>
        DocArrival(id, tx, new Timestamp(T)) }.toIndexedSeq: _*))
      queries.foreach(_.processAllAvailable())
      // a late gate-passing flush doc advances the watermark so the
      // append-mode contamination rows emit; its own window stays open.
      // Words stay ≤ 5 chars: the gate's mean-word-length rule caps at
      // 10.0, and a dropped flush doc never reaches the watermark node
      // (it must pass the classifier gate too — 60 short words land on
      // the corpus-trained tree's keep side, asserted below)
      val flush = (1 to 60).map(i => s"fw$i").mkString(" ")
      sources.foreach(_.addData(
        DocArrival(999999L, flush, new Timestamp(T + 7200 * 1000L))))
      queries.foreach(_.processAllAvailable())

      val gateSet = spark.table("funnel_gate").as[Long].collect().toSet - 999999L
      assert(gateSet == batchGateSet,
        s"gate divergence: extra=${(gateSet -- batchGateSet).take(5)}, " +
          s"missing=${(batchGateSet -- gateSet).take(5)}")
      assert(gateSet.size.toLong == n1)

      val clfIds = spark.table("funnel_clf").as[Long].collect()
      assert(clfIds.contains(999999L),
        "the flush doc must survive the classifier gate or the " +
          "chain's watermark never advances")
      val clfCount = clfIds.count(_ != 999999L).toLong
      assert(clfCount == n1c,
        s"classifier stage: streamed $clfCount vs batch $n1c")

      val dedupCount = spark.table("funnel_dedup").as[Long].collect()
        .count(_ != 999999L).toLong
      assert(dedupCount == n2, s"dedup stage: streamed $dedupCount vs batch $n2")

      val contamDocs = spark.table("funnel_contam")
        .select("doc_id").as[Long].collect().toSet - 999999L
      val survivors = dedupCount - contamDocs.size
      assert(survivors == n3,
        s"decontamination stage: streamed $survivors survivors vs batch $n3")
    } finally queries.foreach(_.stop())
  }
}
