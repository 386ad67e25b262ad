package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted character-TRIGRAM postings index — exact substring
  * search ("grep the corpus") at index cost, the Google-Code-Search
  * construction: a literal pattern match must contain every character
  * trigram of the pattern, so candidates = docs whose trigram set
  * covers the pattern's trigrams (bucket-pruned postings, AND of k
  * small posting lists), then ONE exact contains() verification over
  * the candidates only. BM25 ([[DocSearchIndex]]) answers term
  * queries; this answers the literal-substring shape term postings
  * cannot (phrases crossing token boundaries, punctuation, partial
  * words).
  *
  * Index layout mirrors the family ([[DocSearchIndex]]'s discipline):
  * `postings.parquet` = (bucket, tri, doc_id) DISTINCT rows
  * partitioned by bucket = crc32(tri) mod [[NBuckets]] — a query
  * prunes the scan to ITS trigrams' buckets (spec-asserted on the
  * executed scan's input files); `_format.json` marker; append-only
  * increments; MVCC compaction + the [[appendAndMaybeCompact]]
  * trigger.
  *
  * Scale: postings are ≤ (doc length) rows per doc (distinct
  * trigrams), the candidate intersection groups by doc_id over the
  * pattern's posting lists only, and verification joins candidates —
  * never the corpus — back to text. At 100 TB the pattern's
  * selectivity, not the corpus size, prices the query.
  */
object TrigramIndex {

  /** Fixed bucket count — a property of the index layout (readers and
    * writers must agree). */
  val NBuckets = 64

  val FormatKind = "graft-trigram-postings-index"
  val FormatVersion = 1

  private def conf(s: SparkSession) = s.sparkContext.hadoopConfiguration
  private def postPath(s: SparkSession, dir: String): String =
    graft.store.IndexMaintenance.resolve(dir, "postings", conf(s))
  private def checkFormat(s: SparkSession, dir: String): Unit =
    graft.store.IndexMaintenance.checkMarker(dir, FormatKind, FormatVersion,
      Map("n_buckets" -> NBuckets.toString), conf(s))

  /** Driver-side twin of the Spark `crc32` builtin — the bucket list
    * for partition pruning without a Spark job. */
  def bucketOf(tri: String): Int = {
    val c = new java.util.zip.CRC32
    c.update(tri.getBytes("UTF-8"))
    (c.getValue % NBuckets).toInt
  }

  /** (bucket, tri, doc_id) DISTINCT trigram postings of the RAW text
    * (case-preserving — grep semantics). One-pass kernel
    * ([[graft.functions.CharTrigrams]]): the prior
    * `transform(sequence(…), i -> substring(text, i, 3))` spelling
    * seeks code point i from the string start per position — O(len²)
    * per doc. Same derivation, same distinct set. */
  private[operators] def postingsOf(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    docs
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"),
        explode(expr("char_trigrams(text)")).as("tri"))
      .withColumn("bucket", pmod(crc32(col("tri")), lit(NBuckets)).cast("int"))
  }

  def build(s: SparkSession, docs: DataFrame, dir: String): Unit = {
    graft.store.IndexMaintenance.withMaintenanceLock(dir, conf(s)) {
    // retire compacted-version pointers first (IncrementalDedup.build's
    // rationale)
    graft.store.IndexMaintenance.resetComponents(
      dir, Seq("postings"), conf(s))
    postingsOf(docs).write.mode("overwrite")
      .partitionBy("bucket").parquet(s"$dir/postings.parquet")
    graft.store.IndexMaintenance.failPoint("tri-build:data-written")
    graft.store.IndexMaintenance.writeMarker(dir, FormatKind, FormatVersion,
      Map("n_buckets" -> NBuckets.toString), conf(s))
  }
  }

  /** Append a shard's postings (append-only; lands in the live
    * compacted version when one exists). */
  def appendIncrement(s: SparkSession, shard: DataFrame, dir: String): Unit = {
    checkFormat(s, dir)
    graft.store.IndexMaintenance.guardedAppend(dir, Seq("postings"), conf(s)) {
      postingsOf(shard).write.mode("append")
        .partitionBy("bucket").parquet(postPath(s, dir))
    }
  }

  /** [[appendIncrement]] plus the bounded-maintenance loop (the
    * family's [[IncrementalDedup.appendAndMaybeCompact]] shape). */
  def appendAndMaybeCompact(s: SparkSession, shard: DataFrame, dir: String,
                            fileThreshold: Int = 64,
                            retainDepth: Int = 1): Boolean = {
    appendIncrement(s, shard, dir)
    val due = graft.store.IndexMaintenance.compactionDue(
      dir, Seq("postings"), fileThreshold, conf(s))
    if (due) compact(s, dir, retainDepth)
    due
  }

  /** Compact: one file per bucket sorted by (tri, doc_id) — row-group
    * min/max stats prune a query's trigrams WITHIN its bucket
    * partitions too. MVCC-published (in-flight searches finish on the
    * version they resolved). */
  def compact(s: SparkSession, dir: String, retainDepth: Int = 1): Unit = {
    graft.store.IndexMaintenance.withMaintenanceLock(dir, conf(s)) {
    checkFormat(s, dir)
    val c = conf(s)
    val im = graft.store.IndexMaintenance
    val postV = im.nextVersionName(dir, "postings", c)
    s.read.parquet(postPath(s, dir))
      // heal an at-least-once re-appended shard's duplicate rows
      // (search is duplicate-immune via countDistinct coverage, but
      // the bloat should not survive a rewrite)
      .distinct()
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "tri", "doc_id")
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$dir/$postV")
    im.failPoint("tri-compact:data-written")
    im.publish(dir, "postings", postV, c, retainDepth)
  }
  }

  /** Reclaim superseded postings versions ([[graft.store.IndexMaintenance.vacuum]]
    * — see its reader-lifetime contract). */
  def vacuum(s: SparkSession, dir: String): Seq[String] = {
    checkFormat(s, dir)
    graft.store.IndexMaintenance.vacuum(dir, Seq("postings"), conf(s))
  }

  /** The pattern's distinct trigrams — the SAME derivation the
    * postings use, in plain Scala. Spark's `substring`/`length`
    * address CODE POINTS (UTF8String walks UTF-8 char boundaries), so
    * this walks by code point too: a UTF-16 `sliding(3)` would split
    * surrogate pairs on supplementary-plane patterns, derive trigrams
    * the postings never contain, and silently shrink the candidate
    * set (verification only removes candidates — lost matches). */
  def trigramsOf(pattern: String): Seq[String] = {
    val n = pattern.codePointCount(0, pattern.length)
    require(n >= 3,
      s"substring search needs a pattern of >= 3 code points, got " +
        s"'$pattern' ($n code point${if (n == 1) "" else "s"})")
    (0 until (n - 2)).map { i =>
      val a = pattern.offsetByCodePoints(0, i)
      pattern.substring(a, pattern.offsetByCodePoints(a, 3))
    }.distinct
  }

  /** Exact substring search against the persisted index: reads only
    * the pattern trigrams' bucket partitions, intersects their
    * posting lists (a doc must carry ALL pattern trigrams), verifies
    * the candidates — and only the candidates — against `corpus` with
    * one contains(). */
  def search(s: SparkSession, dir: String, corpus: DataFrame,
             pattern: String): DataFrame = {
    checkFormat(s, dir)
    val tris = trigramsOf(pattern)
    val bks = tris.map(bucketOf).distinct
    searchRelations(s,
      s.read.parquet(postPath(s, dir))
        .filter(col("bucket").isin(bks.map(Integer.valueOf): _*)),
      corpus, pattern)
  }

  /** The relation-level core shared by the file-backed [[search]] and
    * the oracle-verified registry entry. countDistinct, not count:
    * re-appending a shard that contains an already-indexed doc_id
    * duplicates its postings, and a plain count would then overshoot
    * the required k and silently MISS matches. */
  def searchRelations(s: SparkSession, postings: DataFrame,
                      corpus: DataFrame, pattern: String): DataFrame = {
    val tris = trigramsOf(pattern)
    val candidates = postings
      .filter(col("tri").isin(tris: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("tri")).as("n_tri"))
      .filter(col("n_tri") === tris.size)
      .select("doc_id")
    corpus.join(candidates, "doc_id")
      .filter(col("text").contains(pattern))
      .select(col("doc_id"))
      .orderBy("doc_id")
  }

  /** Streaming twin of [[search]]: PATTERNS arrive as (query_id,
    * pattern, ingest_ts) and grep the indexed corpus as they land —
    * the interactive-search serving shape. The pattern's trigram set
    * is a per-row map (streaming-legal); candidate coverage is a
    * stream-static join against the persisted postings plus ONE
    * stateful windowed count over watermark-deduped (query, doc, tri)
    * matches (dedup for the same reason searchRelations counts
    * distinct); verification joins the static corpus AFTER the
    * aggregate — stateless, append-legal. Emits (query_id, doc_id)
    * when the watermark closes the window; patterns shorter than a
    * trigram are dropped (no index can cover them).
    */
  def searchStream(s: SparkSession, queries: DataFrame, dir: String,
                   corpus: DataFrame,
                   watermarkDelay: String = "1 hour",
                   windowDuration: String = "10 minutes"): DataFrame = {
    checkFormat(s, dir)
    val postings = s.read.parquet(postPath(s, dir))
    val q = queries
      .filter(length(col("pattern")) >= 3)
      .withColumn("tris", expr(
        """array_distinct(transform(sequence(1, length(pattern) - 2),
             i -> substring(pattern, i, 3)))"""))
      .withColumn("k", size(col("tris")))
      .withWatermark("ingest_ts", watermarkDelay)
    val hits = q
      .select(col("query_id"), col("ingest_ts"), col("pattern"), col("k"),
        explode(col("tris")).as("tri"))
      .withColumn("bucket", pmod(crc32(col("tri")), lit(NBuckets)).cast("int"))
      .join(postings, Seq("bucket", "tri"))
      .dropDuplicatesWithinWatermark("query_id", "doc_id", "tri")
    hits
      .groupBy(window(col("ingest_ts"), windowDuration),
        col("query_id"), col("pattern"), col("k"), col("doc_id"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") === col("k"))
      .join(corpus.select(col("doc_id"), col("text")), "doc_id")
      .filter(col("text").contains(col("pattern")))
      .select(col("query_id"), col("doc_id"))
  }

  /** Pattern for the registry entry — crosses a token boundary (the
    * shape BM25 term postings cannot answer) and hits a nontrivial
    * slice of the corpus. */
  val SearchPattern = "window merge"

  val all: Seq[Q] = Seq(
    Q("doc_substr_search",
      (s, d) => {
        val docs = Tables.documents(s, d)
        searchRelations(s, postingsOf(docs), docs, SearchPattern)
      },
      // the oracle is deliberately the DIRECT definition (one
      // contains() scan): the trigram construction is an INDEX, not a
      // semantics change — candidates ⊇ matches by the substring-
      // trigram containment theorem, and verification restores
      // equality exactly
      Some(s"""SELECT doc_id FROM documents
             WHERE contains(text, '$SearchPattern')
             ORDER BY doc_id"""))
  )
}
