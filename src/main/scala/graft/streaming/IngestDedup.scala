package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest-time deduplication for document pipelines: the
  * batch dedup operators (TextDedupQueries) answer "clean this
  * corpus"; this answers "don't let the duplicate in at all" as
  * documents arrive.
  *
  * Exact dedup keys on the content digest and uses
  * `dropDuplicatesWithinWatermark`, so the seen-digest STATE IS
  * BOUNDED by the watermark delay — Spark evicts keys once the
  * watermark passes them. That is the production trade at corpus
  * scale: an unbounded `dropDuplicates` key set on a 100 TB firehose
  * grows forever, a watermarked one holds only the delay window, and
  * re-crawled duplicates farther apart than the delay are caught by
  * the periodic BATCH dedup pass over the at-rest corpus
  * (doc_dedup_exact / doc_neardup_clusters) — the standard
  * streaming-skims/batch-sweeps split. State is hash-partitioned by
  * digest (the same shuffle key as the batch form), so the stream
  * scales out with executors.
  *
  * Near-dup (MinHash-band) streaming dedup would key state on band
  * signatures the same way; it is deliberately left to the batch
  * operators — band state is nBands× larger and the verify join needs
  * the candidate's shingle set, which watermarked state cannot hold
  * bounded.
  */
object IngestDedup {

  /** `docs` must be a STREAMING DataFrame with (doc_id, text,
    * ingest_ts) — emits the first arrival of each distinct text within
    * the watermark delay, drops later copies (event-time, either
    * arrival order).
    */
  def exactDedup(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .withWatermark("ingest_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("digest")
      .select(col("doc_id"), col("text"), col("ingest_ts"))
}
