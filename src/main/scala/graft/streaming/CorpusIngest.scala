package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.{CorpusPipeline, CorpusQueries}

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
}
