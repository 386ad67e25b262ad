package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, CorpusQueries, TextDedupQueries}

/** Streaming front half of the corpus pipeline: what runs AS documents
  * arrive, before the at-rest batch sweeps (CorpusPipeline) take over.
  *
  *   scrub + quality gate   — stateless projection/filter
  *   exact dedup            — dropDuplicatesWithinWatermark on the
  *                            digest (bounded state, IngestDedup)
  *   sliding-window chunking — stateless flatMap
  *
  * Everything here is streaming-legal in append mode: the only
  * stateful operator is the watermarked dedup. The stages that need a
  * global view — near-dup components, benchmark decontamination,
  * sequence packing (a corpus-wide prefix sum) — are deliberately NOT
  * here: they are the periodic batch pass over the accumulated corpus,
  * the standard streaming-skims/batch-sweeps split (same trade
  * IngestDedup documents for far-apart re-crawls).
  */
object CorpusIngest {

  /** `docs` must be a STREAMING DataFrame with (doc_id, text,
    * ingest_ts). Emits one row per chunk of each admitted document.
    */
  def prepare(docs: DataFrame, watermarkDelay: String = "1 hour",
              cfg: CorpusPipeline.Config = CorpusPipeline.Config()): DataFrame = {
    val gated = CorpusPipeline.scrubAndGate(docs, cfg)
    val deduped = IngestDedup.exactDedup(gated, watermarkDelay)
    CorpusQueries.chunkSlidingCore(deduped)
  }

  /** Gopher quality gate, streaming form: the SAME rule definition the
    * oracle-verified batch entry runs (TextDedupQueries.gopherRuleCols
    * — per-row map, no aggregation, streaming-legal verbatim in append
    * mode). Keeps admitted docs with their original columns; the rule
    * attribution columns are dropped (a pipeline wanting them
    * materializes gopherRuleCols directly).
    */
  def gopherGate(docs: DataFrame): DataFrame =
    TextDedupQueries.gopherRuleCols(docs)
      .filter(col("keep"))
      .drop("n_words", "r_word_count", "r_mean_len", "r_symbol",
        "r_alpha", "r_stopwords", "keep")

  /** Watermarked Bloom decontamination, streaming form: the batch
    * doc_decontaminate_bloom semantics applied AS documents arrive.
    * `benchPos` is the STATIC benchmark-side Bloom position relation
    * (TextDedupQueries.bloomPositions — benchmark-bounded, broadcast
    * on every probe). Each arriving doc's distinct 8-grams get their
    * k=4 salted positions as four COLUMNS (not a salt explosion — the
    * gram row count stays ∝ the stream), and a gram is contaminated
    * iff all four positions are present: four chained stream-static
    * LEFT SEMI joins, Bloom membership exactly, zero false negatives
    * vs the exact join. The ONE stateful operator is the final
    * watermarked per-doc count — append-legal; rows emit when the
    * doc's window passes the watermark.
    *
    * Emits (doc_id, n_bloom_hits) for contaminated docs only — the
    * standard streaming shape for absence-is-success gates (a doc
    * with no emitted row by watermark close is clean; the batch sweep
    * remains the audit pass). CorpusIngestSpec pins row-level parity
    * with the batch twin on a static input.
    */
  def bloomContamination(docs: DataFrame, benchPos: DataFrame,
                         watermarkDelay: String = "1 hour",
                         windowDuration: String = "10 minutes"): DataFrame = {
    val grams = TextDedupQueries.grams8(docs)
      .select(col("doc_id"), col("ingest_ts"), explode(col("g8")).as("g"))
    val withPos = (0 until 4).foldLeft(grams)((df, j) =>
      df.withColumn(s"pos$j", TextDedupQueries.bloomPos(col("g"), j)))
    val contaminated = (0 until 4).foldLeft(withPos)((df, j) =>
      df.join(benchPos.select(col("pos").as(s"pos$j")), Seq(s"pos$j"), "left_semi"))
    contaminated
      .withWatermark("ingest_ts", watermarkDelay)
      .groupBy(window(col("ingest_ts"), windowDuration), col("doc_id"))
      .agg(count(lit(1)).as("n_bloom_hits"))
      .select(col("doc_id"), col("n_bloom_hits"))
  }
}
