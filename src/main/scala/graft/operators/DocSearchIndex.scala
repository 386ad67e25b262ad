package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted full-text (BM25) search index — the DOCUMENT-side member
  * of the persisted-index family ([[EmbIncrementalDedup]] is the
  * vector side, [[IncrementalDedup]] the dedup side): a production
  * corpus is indexed ONCE, shards append, and a query's cost is
  * proportional to the POSTINGS OF ITS TERMS, never a corpus scan
  * (doc_bm25_topk is the scan-the-corpus twin; same scores).
  *
  * Index layout (all append-only):
  *  - `postings.parquet`, partitioned by `bucket` = crc32(term) mod
  *    [[NBuckets]]: (bucket, term, doc_id, tf, dl). Partitioning by
  *    raw term would create a directory per vocabulary word (millions
  *    at corpus scale — a filesystem DoS); 64 hash buckets keep
  *    partition count fixed while a query still prunes to the buckets
  *    of ITS terms — at 100 TB a 3-term query reads ≤ 3/64 of the
  *    postings bytes before the term filter even runs
  *    (DocSearchIndexSpec asserts the executed scan's input files).
  *    `dl` is denormalized into the posting so scoring never touches
  *    a second table.
  *  - `stats.parquet`: one (n_docs, sum_dl, shard_id) row appended
  *    per build/increment; readers SUM the rows after a row-level
  *    DISTINCT — append never rewrites. `shard_id` is an
  *    order-independent content hash of the shard's doc_ids
  *    (bit_xor of xxhash64 — overflow-free under ANSI), so an
  *    at-least-once re-append of the SAME shard lands a bit-identical
  *    row the distinct collapses, while two honest shards that happen
  *    to share (n_docs, sum_dl) keep distinct rows — this is what
  *    makes the stats side duplicate-immune like tf (MAX) and df
  *    (COUNT DISTINCT) already are. n_docs/sum_dl are exact integers
  *    (dl sums below 2^53 add exactly in any order), so
  *    avgdl = sum_dl / n_docs is one correctly-rounded IEEE division
  *    — bit-identical to the oracle's avg(dl).
  *
  * Scoring is the shared BM25 operating point (k1 = 1.2, b = 0.75 —
  * the doc_bm25_topk constants, written as the same literals): per
  * query term a pivoted tf column (conditional aggregation over the
  * pruned postings — terms are a query-time constant, so the per-term
  * contributions fold in ASCENDING TERM-INDEX order, the determinism
  * discipline of bm25TopK's column reduce), document frequency
  * counted from the same pruned postings, top-k as TakeOrdered
  * (score DESC, doc_id ASC) — never a global sort.
  */
object DocSearchIndex {

  /** Fixed bucket count — a property of the index layout; readers and
    * writers must agree, so it is a constant, not a parameter.
    */
  val NBuckets = 64

  /** Persisted-format identity pinned in `_format.json`
    * (graft.store.IndexMaintenance); `n_buckets` is pinned as a prop
    * so a build with a different layout constant fails fast instead
    * of pruning to the wrong partitions. Migration: rebuild. */
  val FormatKind = "graft-bm25-postings-index"
  // v2: stats rows carry shard_id (duplicate-immune under
  // at-least-once re-appends); v1 indexes fail fast → rebuild
  val FormatVersion = 2

  private def conf(s: SparkSession) = s.sparkContext.hadoopConfiguration
  private def postPath(s: SparkSession, dir: String): String =
    graft.store.IndexMaintenance.resolve(dir, "postings", conf(s))
  private def statsPath(s: SparkSession, dir: String): String =
    graft.store.IndexMaintenance.resolve(dir, "stats", conf(s))
  private def checkFormat(s: SparkSession, dir: String): Unit =
    graft.store.IndexMaintenance.checkMarker(dir, FormatKind, FormatVersion,
      Map("n_buckets" -> NBuckets.toString), conf(s))

  /** Driver-side twin of the Spark `crc32` builtin (same polynomial,
    * same UTF-8 bytes) — lets `search` compute the bucket list for
    * partition pruning without a Spark job.
    */
  def bucketOf(term: String): Int = {
    val c = new java.util.zip.CRC32
    c.update(term.getBytes("UTF-8"))
    (c.getValue % NBuckets).toInt
  }

  /** (bucket, term, doc_id, tf, dl) postings for `docs` — one shuffle
    * (the per-(doc, term) count), scan-shaped otherwise.
    */
  private def postingsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("double").as("dl"),
        explode(col("ws")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("bucket", pmod(crc32(col("term")), lit(NBuckets)).cast("int"))

  private def statsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(split(lower(col("text")), " ")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"),
        // order-independent shard content hash (see the layout note):
        // bit_xor, not sum — xor cannot overflow under ANSI and is
        // deterministic under any row order
        expr("bit_xor(xxhash64(doc_id))").as("shard_id"))

  def build(s: SparkSession, docs: DataFrame, dir: String): Unit = {
    graft.store.IndexMaintenance.withMaintenanceLock(dir, conf(s)) {
    // retire compacted-version pointers first (IncrementalDedup.build's
    // rationale)
    graft.store.IndexMaintenance.resetComponents(
      dir, Seq("postings", "stats"), conf(s))
    postingsOf(docs).write.mode("overwrite")
      .partitionBy("bucket").parquet(s"$dir/postings.parquet")
    graft.store.IndexMaintenance.failPoint("bm25-build:postings-written")
    statsOf(docs).write.mode("overwrite").parquet(s"$dir/stats.parquet")
    graft.store.IndexMaintenance.failPoint("bm25-build:stats-written")
    graft.store.IndexMaintenance.writeMarker(dir, FormatKind, FormatVersion,
      Map("n_buckets" -> NBuckets.toString), conf(s))
  }
  }

  /** Append a shard (append-only: new postings files in existing
    * bucket directories + one more stats row; lands in the live
    * compacted version when one exists). Fails fast on a
    * format-mismatched index.
    */
  def appendIncrement(s: SparkSession, shard: DataFrame, dir: String): Unit = {
    checkFormat(s, dir)
    graft.store.IndexMaintenance.guardedAppend(
      dir, Seq("postings", "stats"), conf(s)) {
      postingsOf(shard).write.mode("append")
        .partitionBy("bucket").parquet(postPath(s, dir))
      graft.store.IndexMaintenance.failPoint("bm25-append:postings-written")
      statsOf(shard).write.mode("append").parquet(statsPath(s, dir))
    }
  }

  /** [[appendIncrement]] plus the bounded-maintenance loop (see
    * [[IncrementalDedup.appendAndMaybeCompact]]): compact when either
    * live component exceeds `fileThreshold` parquet files. Returns
    * true when this call compacted. */
  def appendAndMaybeCompact(s: SparkSession, shard: DataFrame, dir: String,
                            fileThreshold: Int = 64,
                            retainDepth: Int = 1): Boolean = {
    appendIncrement(s, shard, dir)
    val due = graft.store.IndexMaintenance.compactionDue(
      dir, Seq("postings", "stats"), fileThreshold, conf(s))
    if (due) compact(s, dir, retainDepth)
    due
  }

  /** Compact the index: live postings rewritten as ONE file per
    * bucket sorted by (term, doc_id) — a query's term filter then
    * prunes row groups WITHIN its bucket partitions via min/max stats
    * on the sorted term column, on top of the directory-level bucket
    * pruning — and the accumulated per-shard stats rows SUMMED into a
    * single row (exact integer sums, so avgdl is unchanged — the
    * layout's own "readers SUM the rows" contract applied once at
    * rest). Published MVCC-style through the component pointers
    * ([[graft.store.IndexMaintenance.publish]]): in-flight searches
    * finish on the version they resolved.
    */
  def compact(s: SparkSession, dir: String, retainDepth: Int = 1): Unit = {
    graft.store.IndexMaintenance.withMaintenanceLock(dir, conf(s)) {
    checkFormat(s, dir)
    val c = conf(s)
    val im = graft.store.IndexMaintenance
    val postV = im.nextVersionName(dir, "postings", c)
    s.read.parquet(postPath(s, dir))
      // heal the exact-duplicate rows an at-least-once re-appended
      // shard leaves (readers are duplicate-immune — MAX tf, distinct
      // df — but the bloat should not survive a rewrite)
      .distinct()
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "term", "doc_id")
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$dir/$postV")
    val statsV = im.nextVersionName(dir, "stats", c)
    // recompute stats FROM the deduped postings instead of summing
    // the shard rows: every doc carries >= 1 posting row (split of
    // even an empty text is [""]) with its dl on each, so this is
    // exact — and it makes compaction SELF-HEALING for any stats
    // anomaly (belt to the readers' shard_id-distinct braces). The
    // folded row carries the whole-corpus content hash as its
    // shard_id, so the next appended shard's row stays distinct.
    s.read.parquet(s"$dir/$postV")
      .groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl").cast("long")).as("sum_dl"),
        expr("bit_xor(xxhash64(doc_id))").as("shard_id"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$statsV")
    im.failPoint("bm25-compact:data-written")
    im.publish(dir, "postings", postV, c, retainDepth)
    im.failPoint("bm25-compact:postings-published")
    im.publish(dir, "stats", statsV, c, retainDepth)
  }
  }

  /** Reclaim superseded index versions ([[graft.store.IndexMaintenance.vacuum]]
    * — see its reader-lifetime contract). */
  def vacuum(s: SparkSession, dir: String): Seq[String] = {
    checkFormat(s, dir)
    graft.store.IndexMaintenance.vacuum(dir, Seq("postings", "stats"), conf(s))
  }

  /** Top-k BM25 against the persisted index — reads only the query
    * terms' bucket partitions.
    */
  def search(s: SparkSession, dir: String, terms: Seq[String], k: Int): DataFrame = {
    checkFormat(s, dir)
    val bks = terms.map(bucketOf).distinct
    searchRelations(s,
      s.read.parquet(postPath(s, dir))
        .filter(col("bucket").isin(bks.map(Integer.valueOf): _*)),
      s.read.parquet(statsPath(s, dir)),
      terms, k)
  }

  /** The relation-level core shared by the file-backed [[search]] and
    * the oracle-verified registry entry: `postings` ⊇ the query
    * terms' rows, `stats` = any number of (n_docs, sum_dl) shard rows.
    */
  def searchRelations(s: SparkSession, postings: DataFrame, stats: DataFrame,
                      terms: Seq[String], k: Int): DataFrame = {
    val p = postings.filter(col("term").isin(terms: _*))
      .transform(graft.Caching.persistOnce(_))
    // global stats: DISTINCT rows first — an at-least-once re-appended
    // shard's stats row is bit-identical (deterministic aggregates +
    // the shard_id content hash) and must count once; two honest
    // shards sharing (n_docs, sum_dl) differ in shard_id and both
    // survive. Then exact-integer sums → one division each.
    val st = stats.dropDuplicates().agg(
      sum(col("n_docs")).cast("double").as("n_docs"),
      (sum(col("sum_dl")).cast("double") / sum(col("n_docs")).cast("double"))
        .as("avgdl"))
    // per-term document frequency from the pruned postings (a (term,
    // doc) posting exists iff tf > 0). count DISTINCT doc_id, not
    // rows: a crash-recovery re-append duplicates a shard's posting
    // rows until the next compaction, and a row count would inflate
    // df (tf is already duplicate-immune via MAX below)
    val dfAggs = terms.zipWithIndex.map { case (t, i) =>
      count_distinct(when(col("term") === t, col("doc_id"))).cast("double").as(s"df$i")
    }
    val dfs = p.agg(dfAggs.head, dfAggs.tail: _*)
    // pivot the query terms back to columns so the score folds in
    // ascending term-index order (bm25TopK's determinism discipline)
    val tfAggs = terms.zipWithIndex.map { case (t, i) =>
      coalesce(max(when(col("term") === t, col("tf"))), lit(0.0)).as(s"tf$i")
    }
    val byDoc = p.groupBy(col("doc_id"), col("dl"))
      .agg(tfAggs.head, tfAggs.tail: _*)
    def contrib(i: Int): Column = {
      val tf = col(s"tf$i"); val df = col(s"df$i")
      when(tf > 0,
        log((col("n_docs") - df + 0.5) / (df + 0.5) + 1) * tf * lit(2.2) /
          (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .otherwise(lit(0.0))
    }
    byDoc.crossJoin(broadcast(dfs)).crossJoin(broadcast(st))
      .withColumn("score_raw", terms.indices.map(contrib).reduce(_ + _))
      .filter(col("score_raw") > 0)
      .select(col("doc_id"), round(col("score_raw"), 6).as("score"))
      // TakeOrderedAndProject, not a global sort
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Streaming search: queries ARRIVE as (query_id, terms
    * array<string>, ingest_ts) and score against the PERSISTED index —
    * [[EmbIncrementalDedup.searchStream]]'s text-side sibling. Two
    * departures from the batch form, both forced by streaming:
    *  - arriving term sets are arbitrary, so the per-term
    *    contributions cannot pivot to statically-known columns; they
    *    flow as ROWS through a per-(query, doc) sum. A float sum over
    *    rows is partition-order-nondeterministic, so each contribution
    *    is floored to integer MICRO-units first (doc_lm_nll's
    *    quantization contract) — exact long addition in any order;
    *    scores are micro-quantized BM25, off the batch form by
    *    < 1e-6 per term.
    *  - per-term document frequencies and the corpus stats are STATIC
    *    aggregations of the index (computed once at stream start and
    *    broadcast into the stream-static join) — exactly how a
    *    serving system holds index statistics; a shard append is
    *    picked up at the next stream restart.
    * Two chained stateful operators (per-(query, doc) sum → per-query
    * top-k), both on the same event-time window — the multi-stateful
    * append-mode shape Structured Streaming supports natively. Emits
    * (query_id, rnk, doc_id, score_micro) when the window passes the
    * watermark.
    */
  def searchStream(s: SparkSession, queries: DataFrame, dir: String, k: Int,
                   watermarkDelay: String = "1 hour",
                   windowDuration: String = "10 minutes"): DataFrame = {
    graft.functions.TopKByScore.tuneForManyGroups(s)
    checkFormat(s, dir)
    // duplicate-immunity for the streaming path: an at-least-once
    // re-appended shard leaves exact-duplicate posting rows until the
    // next compaction. The batch path absorbs them algebraically
    // (MAX tf, COUNT DISTINCT df); this path SUMS per-(query, doc)
    // contributions over posting ROWS, so the rows themselves must be
    // deduped — one static dropDuplicates over the posting key, done
    // once per micro-batch against the static side, feeds both the
    // join and the df counts (count(*) over the deduped relation ==
    // count distinct over the raw one).
    val postings = s.read.parquet(postPath(s, dir))
      .dropDuplicates("term", "doc_id")
    val stats = s.read.parquet(statsPath(s, dir))
      .dropDuplicates()
      .agg(sum(col("n_docs")).cast("double").as("n_docs"),
        (sum(col("sum_dl")).cast("double") / sum(col("n_docs")).cast("double"))
          .as("avgdl"))
    val dfs = postings.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
    val terms = queries
      .withWatermark("ingest_ts", watermarkDelay)
      .select(col("query_id"), col("ingest_ts"),
        explode(array_distinct(col("terms"))).as("term"))
    val contrib =
      log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
        col("tf") * lit(2.2) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    val scored = terms
      .join(postings.select("term", "doc_id", "tf", "dl"), "term")
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("ingest_ts"), col("doc_id"),
        floor(contrib * lit(1e6)).cast("long").as("c_micro"))
    scored
      .groupBy(window(col("ingest_ts"), windowDuration),
        col("query_id"), col("doc_id"))
      .agg(sum(col("c_micro")).as("score_micro"))
      .groupBy(col("window"), col("query_id"))
      .agg(graft.functions.TopKByScore.topK(k)(
        col("score_micro").cast("double"), col("doc_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "sc")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rnk"),
        col("sc.id").as("doc_id"), col("sc.score").cast("long").as("score_micro"))
  }

  /** Registry terms — distinct from doc_bm25_topk's so the two entries
    * exercise different postings.
    */
  private val SearchTerms = Seq("join", "stream", "hash", "sort")
  private val SearchK = 20

  val all: Seq[Q] = Seq(
    // The index dataflow (postings → pruned-term pivot → BM25) over
    // in-query relations, oracle-verified against plain BM25 — the
    // materialization is a plan property, not a semantics change, so
    // the oracle is the same SQL shape as doc_bm25_topk at this
    // entry's terms. The FILE-backed build/append/search (bucket
    // partition pruning, append-only stats) is DocSearchIndexSpec's
    // job — no parquet side effects inside a registry query.
    Q("doc_search_index",
      (s, d) => {
        val docs = Tables.documents(s, d)
        searchRelations(s, postingsOf(docs), statsOf(docs), SearchTerms, SearchK)
      },
      Some {
        val termList = SearchTerms.map(t => s"'$t'").mkString(", ")
        s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
           d AS (SELECT doc_id, ws, CAST(len(ws) AS DOUBLE) AS dl FROM t),
           c AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM d),
           q AS (SELECT unnest([$termList]) AS term),
           tf AS (SELECT doc_id, dl, term,
                         CAST(len(list_filter(ws, x -> x = term)) AS DOUBLE) AS tf
                  FROM d, q),
           df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
                  FROM tf WHERE tf > 0 GROUP BY term),
           sc AS (SELECT tf.doc_id,
                         sum(ln((c.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
                             * tf.tf * 2.2
                             / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / c.avgdl))) AS s
                  FROM tf, c, df
                  WHERE tf.term = df.term AND tf.tf > 0
                  GROUP BY tf.doc_id)
           SELECT doc_id, round(s, 6) AS score FROM sc
           ORDER BY score DESC, doc_id ASC LIMIT $SearchK"""
      })
  )
}
