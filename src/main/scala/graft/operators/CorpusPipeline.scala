package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the registry's individual
  * operators (each oracle-checked on its own) composed into the one
  * pipeline a user actually runs — scrub → quality gate → exact dedup
  * → near-dup dedup → benchmark decontamination → chunk → pack.
  *
  * Every stage is the scale-safe form already audited in PLANS_r*.md:
  * digests (not bodies) as shuffle keys, prefix-filtered candidate
  * joins (never all-pairs), label-propagation components with
  * per-round lineage truncation, zero-shuffle chunking, and the
  * GlobalIndex prefix sum for sequence offsets. Nothing in the
  * pipeline collects document data to the driver.
  */
object CorpusPipeline {

  /** @param minWords        quality gate: drop docs shorter than this
    * @param maxAvgWordLen   quality gate: drop docs whose mean word
    *                        length exceeds this (garbled/binary text)
    * @param jaccardThreshold 3-shingle Jaccard at/above which two docs
    *                        are near-duplicates
    * @param contamNGram     n-gram order for benchmark decontamination
    * @param seqLen          words per packed training sequence
    */
  final case class Config(
      minWords: Int = 10,
      maxAvgWordLen: Double = 12.0,
      jaccardThreshold: Double = 0.8,
      contamNGram: Int = 8,
      seqLen: Int = 256)

  /** Stages 1-5: returns the surviving documents with a `text` column
    * holding the scrubbed body. Input needs (doc_id, text); extra
    * columns pass through.
    */
  /** Stages 1-2 (scrub + quality gate): pure projection + filter, so
    * valid on STREAMING DataFrames too — CorpusIngest reuses it as the
    * front of the streaming pipeline.
    */
  def scrubAndGate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val scrubbed = docs.withColumn("text",
      regexp_replace(
        regexp_replace(col("text"), lit(PiiPatterns.email), lit("<EMAIL>")),
        lit(PiiPatterns.phone), lit("<PHONE>")))
    scrubbed
      .withColumn("n_words", size(split(col("text"), " ")))
      .filter(col("n_words") >= cfg.minWords)
      .filter((length(col("text")) - col("n_words") + 1).cast("double") /
        col("n_words") <= cfg.maxAvgWordLen)
      .drop("n_words")
  }

  def prepareDocs(docs: DataFrame, benchmark: Option[DataFrame],
                  cfg: Config = Config()): DataFrame = {
    // 1-2. PII scrub + quality gate
    val quality = scrubAndGate(docs, cfg)
      .transform(graft.Caching.persistOnce(_))

    // 3. Exact dedup — one shuffle of (digest, doc_id); survivor = min id
    val keepExact = quality
      .groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val exact = quality.join(keepExact, Seq("doc_id"), "left_semi")
      .transform(graft.Caching.persistOnce(_))

    // 4. Near-dup dedup — prefix-filtered Jaccard pairs → connected
    // components → drop non-canonical members
    val edges = TextDedupQueries.exactJaccardPairs(exact, cfg.jaccardThreshold)
    val losers = TextDedupQueries
      .nearDupClusters(docs.sparkSession, edges)
      .filter(!col("is_canonical"))
      .select("doc_id")
    val deduped = exact.join(losers, Seq("doc_id"), "left_anti")

    // 5. Benchmark decontamination — drop any doc sharing a contamNGram
    // word n-gram with the held-out set (the n-gram strings, dimension-
    // sized, are what shuffles — never the corpus bodies)
    benchmark match {
      case None => deduped
      case Some(bench) =>
        val k = cfg.contamNGram
        def grams(df: DataFrame) = df
          .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
          .filter(size(col("ws")) >= k)
          .select(col("doc_id"),
            explode(expr(
              s"""array_distinct(transform(sequence(0, size(ws) - $k),
                   i -> array_join(slice(ws, i + 1, $k), ' ')))""")).as("g"))
        val benchGrams = grams(bench).select("g").distinct()
        val contaminated = grams(deduped)
          .join(benchGrams, Seq("g"), "left_semi")
          .select("doc_id").distinct()
        deduped.join(contaminated, Seq("doc_id"), "left_anti")
    }
  }

  /** The full pipeline: surviving docs chunked into sliding windows and
    * packed into fixed-length training sequences. Output: one row per
    * chunk with its global word offset and sequence span.
    */
  def prepare(docs: DataFrame, benchmark: Option[DataFrame],
              cfg: Config = Config()): DataFrame = {
    // sort-free core: the prefix sum below re-range-partitions anyway,
    // so the presentation orderBy of the registry form would be a
    // full extra sort exchange thrown away immediately
    val chunks = CorpusQueries.chunkSlidingCore(prepareDocs(docs, benchmark, cfg))
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"),
        col("n_words").cast("long").as("n_words"))
    graft.store.GlobalIndex
      .withOrderedPrefixSum(chunks,
        Seq(col("doc_id").asc, col("chunk_id").asc), "n_words", "start_offset")
      .withColumn("first_seq", expr(s"start_offset div ${cfg.seqLen}"))
      .withColumn("last_seq",
        expr(s"(start_offset + n_words - 1) div ${cfg.seqLen}"))
  }
}
