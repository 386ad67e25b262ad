package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training-data pipeline
  * runs AFTER dedup/quality filtering (TextDedupQueries): sliding-window
  * chunking, deterministic stratified sampling, BM25 relevance ranking,
  * and corpus-level boilerplate detection.
  *
  * Scale design (100 TB):
  *  - chunking is a pure per-row flatMap (sequence + posexplode) — no
  *    shuffle at all; at cluster scale it pipelines straight into the
  *    tokenizer sink;
  *  - stratified sampling is a deterministic hash filter — no
  *    sample()/rand() (non-reproducible across retries of a failed
  *    task), no shuffle, fully pushdown-friendly;
  *  - BM25 keeps the per-term statistics tiny (|query terms| rows) and
  *    broadcasts them; the corpus-side pass is one projection + one
  *    partial-aggregated groupBy on doc_id;
  *  - boilerplate detection shuffles the 5-gram inverted index once,
  *    keyed by the gram string — never doc bodies — and map-side
  *    partial counts collapse the heavy hitters (exactly the rows that
  *    matter) before the shuffle.
  */
object CorpusQueries {

  private val ChunkLen = 20
  private val ChunkStride = 15
  // DSIR constants — must precede `val all` (the oracle-SQL string
  // interpolates them at object init; a later declaration reads as
  // 0/null there, which is exactly the bug this comment prevents)
  private val DsirBuckets = 4096
  private val DsirTargetLang = "en"

  /** Sliding-window word chunking: fixed window of 20 words, stride 15
    * (25% overlap), final partial window kept. The shape every
    * pretraining pipeline needs between cleaning and tokenization.
    */
  /** Sort-free core — safe on STREAMING DataFrames too (pure per-row
    * flatMap); the registry query adds the presentation orderBy.
    */
  private[graft] def chunkSlidingCore(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        posexplode(sequence(lit(0), size(col("ws")) - 1, lit(ChunkStride)))
          .as(Seq("chunk_id", "start_word")))
      .select(
        col("doc_id"),
        col("chunk_id"),
        col("start_word").cast("long").as("start_word"),
        least(lit(ChunkLen), size(col("ws")) - col("start_word")).cast("int").as("n_words"),
        array_join(slice(col("ws"), col("start_word") + 1, lit(ChunkLen)), " ")
          .as("chunk_text"))

  private[graft] def chunkSliding(docs: DataFrame): DataFrame =
    chunkSlidingCore(docs).orderBy("doc_id", "chunk_id")

  /** Deterministic stratified sampling: per-language keep rates applied
    * through an LCG hash of doc_id — reproducible across task retries
    * and across engines (no rand()), and the filter sits directly on
    * the scan so column pruning + predicate evaluation happen before
    * any wide operator.
    */
  private def sampleStratified(docs: DataFrame): DataFrame = {
    // doc_id is reduced mod a prime BEFORE the LCG multiply: the raw
    // product overflows Long past doc_id ≈ 8.4e9 (silent wrap in
    // Spark, an error in DuckDB and under ANSI mode) — at exactly the
    // corpus scale this operator targets
    val bucket = (((col("doc_id") % 1000003L) * lit(1103515245L) + lit(12345L)) % 100)
      .cast("int")
    val rate = when(col("lang") === "en", 20)
      .when(col("lang") === "zh", 60)
      .otherwise(45)
    docs
      .withColumn("bucket", bucket)
      .filter(col("bucket") < rate)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy("doc_id")
  }

  private val Bm25Terms = Seq("spark", "window", "merge")
  private val K1 = 1.2
  private val B = 0.75

  /** BM25 ranking of the corpus against a fixed query-term set, in ONE
    * corpus scan: tokenize once into a narrow (doc_id, dl, tf0..tfk)
    * frame (persisted — every downstream consumer reads the cache, not
    * parquet), derive corpus stats (N, avgdl) and per-term document
    * frequencies as a single 1-row broadcast aggregate, and score as a
    * pure projection — zero groupBy on doc_id, the only wide op is the
    * final global top-k (TakeOrderedAndProject). The naive shape
    * (explode per term + rejoin stats + groupBy doc) scans the corpus
    * three times and shuffles it once; this scans once and shuffles
    * only k-per-partition candidates.
    */
  private def bm25TopK(docs: DataFrame): DataFrame = {
    val tfCols = Bm25Terms.zipWithIndex.map { case (t, i) =>
      size(expr(s"filter(ws, x -> x = '$t')")).cast("double").as(s"tf$i")
    }
    val tfs = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .select(col("doc_id") +: size(col("ws")).cast("double").as("dl") +: tfCols: _*)
      .transform(graft.Caching.persistOnce(_))
    val statAggs =
      count(lit(1)).cast("double").as("n_docs") +:
        avg(col("dl")).as("avgdl") +:
        Bm25Terms.indices.map(i =>
          count(when(col(s"tf$i") > 0, 1)).cast("double").as(s"df$i"))
    val stats = tfs.agg(statAggs.head, statAggs.tail: _*)
    // constants written as literals (2.2, 0.25) so the double bits
    // match the oracle SQL exactly — `K1 + 1` computed in Scala can
    // differ from DuckDB's parse of "2.2" by one ulp
    def contrib(i: Int): Column = {
      val tf = col(s"tf$i"); val df = col(s"df$i")
      when(tf > 0,
        log((col("n_docs") - df + 0.5) / (df + 0.5) + 1) * tf * lit(2.2) /
          (tf + lit(K1) * (lit(0.25) + lit(B) * col("dl") / col("avgdl"))))
        .otherwise(lit(0.0))
    }
    tfs.crossJoin(broadcast(stats))
      .withColumn("score_raw", Bm25Terms.indices.map(contrib).reduce(_ + _))
      // idf > 0 always (the +1 inside ln), so score_raw > 0 iff the doc
      // contains at least one query term — same population the oracle's
      // tf > 0 grouping keeps
      .filter(col("score_raw") > 0)
      .select(col("doc_id"), round(col("score_raw"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(20)
  }

  /** Corpus-level boilerplate detection: for each document, the share
    * of its distinct 3-grams that also occur in >= 3 distinct
    * documents. High ratios flag templated/boilerplate text that
    * per-document repetition scores (doc_repetition) cannot see.
    */
  private def boilerplateOverlap(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    // Distinct 3-gram stream as 16-byte digests off ONE codegen scan
    // ([[graft.functions.WindowMd5s]] — exactness argument there: the
    // HOF gram build + string keys this replaces shuffled ~30-byte
    // grams through the frequency agg and the semi join; digests ship
    // at half the bytes and skip the per-window string allocation).
    // window_md5s returns empty under 3 words, so size(gs) > 0 is the
    // old size(ws) >= 3 guard. n_grams is read off the ARRAY SIZE
    // before the explode — the gram stream is exploded once, not
    // re-aggregated a second time for the denominator.
    val perDoc = docs
      .select(col("doc_id"),
        call_function("window_md5s", lower(col("text")), lit(3)).as("gs"))
      .filter(size(col("gs")) > 0)
      .transform(graft.Caching.persistOnce(_))
    val grams = perDoc.select(col("doc_id"), explode(col("gs")).as("g"))
    val shared = grams.groupBy("g")
      .agg(count(lit(1)).as("docs_with"))
      .filter(col("docs_with") >= 3)
      .select("g")
    perDoc.select(col("doc_id"), size(col("gs")).cast("long").as("n_grams"))
      .join(grams.join(shared, Seq("g"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("share_ratio",
        round(col("n_shared").cast("double") / col("n_grams"), 6))
      .orderBy("doc_id")
  }

  /** Per-document top-3 terms by TF-IDF (smoothed idf, ln-scaled tf) —
    * the keyword-extraction pass behind corpus indexing and topic
    * mixing. Scale: the corpus shuffles ONCE, keyed (doc_id, term), in
    * the tf aggregation (map-side combine collapses repeats); the df
    * table is vocabulary-bounded and the n_docs scalar is a 1-row
    * broadcast, so the idf join never moves corpus-sized data; the
    * top-3 cut is a doc_id-partitioned window over the tf table (one
    * more bounded shuffle), not a global sort.
    */
  private def tfidfTopK(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf"))
      .transform(graft.Caching.persistOnce(_))
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
    tf.join(df, "term").crossJoin(broadcast(nDocs))
      // rank over the ROUNDED score (bm25TopK discipline): a 1-ulp ln()
      // divergence between engines must not flip the cut
      .withColumn("tfidf", round((lit(1.0) + log(col("tf")))
        * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rnk"))
      .orderBy("doc_id", "rnk")
  }

  /** Weighted sampling WITHOUT replacement (k = 100, weight = n_chars)
    * by the Efraimidis–Spirakis priority trick: key = u^(1/w) with u
    * uniform per doc, keep the k largest keys — equivalently the k
    * largest ln(u)/w, which is what both engines compare. u derives
    * from the first 8 md5 hex digits of doc_id ((v + 0.5) / 2^32 —
    * exact in a double), so the sample is DETERMINISTIC: reproducible
    * across task retries, engines, and runs, unlike rand()-based
    * sampling. Scale: one scan, zero shuffle before the global top-k
    * (TakeOrderedAndProject keeps k rows per partition); the classic
    * distributed weighted-reservoir shape.
    */
  private def sampleWeighted(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("u",
        (expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS DOUBLE)")
          + lit(0.5)) / lit(4294967296.0))
      // round-then-order, ties on doc_id: ulp-robust across engines
      .withColumn("priority", round(log(col("u")) / col("n_chars").cast("double"), 6))
      .select(col("doc_id"), col("source"), col("n_chars"), col("priority"))
      .orderBy(col("priority").desc, col("doc_id").asc)
      .limit(100)

  private val SeqLen = 256

  /** Sequence packing: concatenate the corpus in doc_id order and cut
    * it into fixed 256-word training sequences — each document's
    * placement is (start_offset, first_seq, last_seq). The running
    * word offset is the scale problem: `sum() OVER (ORDER BY doc_id)`
    * is a one-task window, so the offset comes from
    * GlobalIndex.withOrderedPrefixSum (parallel range-partitioned
    * sort, one Long per partition to the driver).
    */
  /** Deterministic pre-training corpus shuffle into S training shards
    * — the global-shuffle step every LLM data pipeline runs before
    * epoch sharding: priority = the 32-bit md5 value of a seeded key
    * (md5 so the DuckDB oracle replays it, the doc_sample_weighted
    * discipline), shard = priority mod S, position within shard =
    * rank under the total order (priority, doc_id). Re-running with
    * the same seed reproduces the epoch bit-for-bit (resumable
    * ingest); a new seed is a fresh epoch permutation.
    *
    * Scale: `row_number() OVER (PARTITION BY shard ...)` would sort a
    * 100 TB corpus on S tasks. Position here rides
    * GlobalIndex.withOrderedIndex (parallel range-partitioned sort +
    * one Long per partition to the driver) over the total order
    * (shard, priority, doc_id); each shard's start index is then
    * subtracted via a broadcast S-row join — no single-task stage
    * anywhere, and the shard files themselves could be written
    * straight off the range-sorted partitions.
    */
  val ShuffleShards = 16
  private def shuffleShards(docs: DataFrame): DataFrame = {
    val prio = expr("CAST(conv(substring(md5(concat('shuffle42#', " +
      "CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)")
    val assigned = docs.select(col("doc_id"), prio.as("priority"))
      .withColumn("shard", (col("priority") % ShuffleShards).cast("int"))
    val indexed = graft.store.GlobalIndex.withOrderedIndex(
      assigned, Seq(col("shard"), col("priority"), col("doc_id")), "gidx")
    val starts = indexed.groupBy("shard").agg(min(col("gidx")).as("s0"))
    indexed.join(broadcast(starts), "shard")
      .select(col("doc_id"), col("shard"),
        (col("gidx") - col("s0") + lit(1L)).as("pos"))
      .orderBy("shard", "pos")
  }

  private def packSequences(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_words"))
    graft.store.GlobalIndex
      .withOrderedPrefixSum(words, Seq(col("doc_id").asc), "n_words", "start_offset")
      .select(col("doc_id"), col("n_words"), col("start_offset"),
        expr(s"start_offset div $SeqLen").as("first_seq"),
        expr(s"(start_offset + n_words - 1) div $SeqLen").as("last_seq"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(
    Q("doc_chunk_sliding",
      (s, d) => chunkSliding(Tables.documents(s, d)),
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             s AS (SELECT doc_id, ws, unnest(range(0, len(ws), 15)) AS start_word FROM w)
             SELECT doc_id, CAST(start_word // 15 AS INT) AS chunk_id, start_word,
                    CAST(least(20, len(ws) - start_word) AS INT) AS n_words,
                    array_to_string(ws[start_word + 1 : start_word + 20], ' ') AS chunk_text
             FROM s ORDER BY doc_id, chunk_id""")),

    Q("doc_sample_stratified",
      (s, d) => sampleStratified(Tables.documents(s, d)),
      Some("""SELECT doc_id, lang,
                     CAST(((doc_id % 1000003) * 1103515245 + 12345) % 100 AS INT) AS bucket
             FROM documents
             WHERE ((doc_id % 1000003) * 1103515245 + 12345) % 100 <
                   CASE WHEN lang = 'en' THEN 20 WHEN lang = 'zh' THEN 60 ELSE 45 END
             ORDER BY doc_id""")),

    Q("doc_bm25_topk",
      (s, d) => bm25TopK(Tables.documents(s, d)),
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
             d AS (SELECT doc_id, ws, CAST(len(ws) AS DOUBLE) AS dl FROM t),
             c AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM d),
             q AS (SELECT unnest(['spark', 'window', 'merge']) AS term),
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
             ORDER BY score DESC, doc_id ASC LIMIT 20""")),

    Q("doc_pack_sequences",
      (s, d) => packSequences(Tables.documents(s, d)),
      Some("""WITH w AS (SELECT doc_id,
                                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
                         FROM documents),
             c AS (SELECT doc_id, n_words,
                          CAST(coalesce(sum(n_words) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                               0) AS BIGINT) AS start_offset
                   FROM w)
             SELECT doc_id, n_words, start_offset,
                    start_offset // 256 AS first_seq,
                    (start_offset + n_words - 1) // 256 AS last_seq
             FROM c ORDER BY doc_id""")),

    Q("doc_shuffle_shards",
      (s, d) => shuffleShards(Tables.documents(s, d)),
      Some {
        val hexVal = (1 to 8).map(i =>
          s"(strpos('0123456789abcdef', substr(hx, $i, 1)) - 1) * ${1L << (4 * (8 - i))}")
          .mkString(" + ")
        s"""WITH h AS (SELECT doc_id,
                              substr(md5('shuffle42#' || CAST(doc_id AS VARCHAR)), 1, 8) AS hx
                       FROM documents),
           v AS (SELECT doc_id, CAST($hexVal AS BIGINT) AS priority FROM h)
           SELECT doc_id, CAST(priority % $ShuffleShards AS INT) AS shard,
                  row_number() OVER (PARTITION BY priority % $ShuffleShards
                                     ORDER BY priority, doc_id) AS pos
           FROM v ORDER BY shard, pos"""
      }),

    Q("doc_tfidf_topk",
      (s, d) => tfidfTopK(Tables.documents(s, d)),
      Some("""WITH toks AS (SELECT doc_id,
                              unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                            FROM documents),
             tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
                    FROM toks GROUP BY doc_id, term),
             df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
             c AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
             sc AS (SELECT tf.doc_id, tf.term,
                           round((1.0 + ln(tf.tf))
                                 * ln((c.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
                    FROM tf, df, c WHERE tf.term = df.term),
             r AS (SELECT doc_id, term, tfidf,
                          CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, term ASC) AS INT) AS rnk
                   FROM sc)
             SELECT doc_id, term, tfidf, rnk FROM r WHERE rnk <= 3
             ORDER BY doc_id, rnk""")),

    Q("doc_sample_weighted",
      (s, d) => sampleWeighted(Tables.documents(s, d)),
      Some("""WITH h AS (SELECT doc_id, source, n_chars,
                                substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS hx
                         FROM documents),
             v AS (SELECT doc_id, source, n_chars,
                     (CAST(strpos('0123456789abcdef', substr(hx, 1, 1)) - 1 AS DOUBLE)) * 268435456.0
                   + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 16777216.0
                   + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 1048576.0
                   + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) * 65536.0
                   + (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) * 4096.0
                   + (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1) * 256.0
                   + (strpos('0123456789abcdef', substr(hx, 7, 1)) - 1) * 16.0
                   + (strpos('0123456789abcdef', substr(hx, 8, 1)) - 1) * 1.0 AS vv
                   FROM h)
             SELECT doc_id, source, n_chars,
                    round(ln((vv + 0.5) / 4294967296.0) / n_chars, 6) AS priority
             FROM v
             ORDER BY priority DESC, doc_id ASC LIMIT 100""")),

    Q("doc_boilerplate_overlap",
      (s, d) => boilerplateOverlap(Tables.documents(s, d)),
      Some("""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
             g AS (SELECT doc_id,
                          unnest(list_distinct([array_to_string(ws[i : i + 2], ' ')
                                                FOR i IN range(1, len(ws) - 1)])) AS g
                   FROM w),
             shared AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 3),
             per_doc AS (SELECT doc_id, count(*) AS n_grams, count(s.g) AS n_shared
                         FROM g LEFT JOIN shared s USING (g) GROUP BY doc_id)
             SELECT doc_id, n_grams, n_shared,
                    round(CAST(n_shared AS DOUBLE) / n_grams, 6) AS share_ratio
             FROM per_doc ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // DSIR importance weights (Xie et al. 2023, arXiv:2302.03169 —
    // Data Selection via Importance Resampling): score every raw
    // document by the log importance ratio log p_target(x)/p_raw(x)
    // under two hashed-n-gram unigram models — the weights a pipeline
    // feeds to Gumbel-top-k resampling to tilt a web crawl toward a
    // target domain. Here: features = word bigrams hashed into
    // B=4096 buckets (3 hex digits of md5 — the doc_simhash
    // discipline: md5 is the one hash both engines compute
    // identically), target = the `lang = 'en'` slice, raw = the whole
    // corpus, add-one smoothing on both.
    //
    // Determinism across engines: each bucket's log-ratio term is
    // ln of ONE IEEE division of two exact-integer products
    // ((ct+1)(R+B) / ((cr+1)(T+B)), all factors < 2^26 here so the
    // double products are exact), floored to integer micro-nats —
    // doc_lm_nll's ln-boundary contract. Per-doc sums are exact longs;
    // avg is one rounded division.
    //
    // Scale: the model is B ≤ 4096 rows — broadcast by construction
    // (vs doc_lm_nll's corpus-dependent vocabulary, which needs the
    // size-guarded fallback); the bigram stream is probe-side only,
    // map-side-combined into ≤B-row partials for the stats pass and
    // one row per doc for the scoring pass. Two narrow shuffles total,
    // both bounded; never the corpus.
    Q("doc_dsir_weights",
      (s, d) => docDsirWeights(Tables.documents(s, d)),
      Some(dsirOracleSql)),

    // ----------------------------------------------------------------
    // Character-distribution entropy + top-character fraction — the
    // compressibility gate (C4/RefinedWeb-style "low-entropy garbage"
    // filter: keyboard mash, base64 blobs, and single-char padding all
    // score far from natural text). The distribution is a fixed
    // 28-symbol partition (a–z, space, other): each count is
    // length(text) − length(replace(text, ch, '')) — 27 codegen'd
    // replace passes per row, NO tokenization, NO explode, zero
    // shuffle; at 100 TB this is a pure scan at whatever partitioning
    // the corpus already has.
    //
    // Determinism across engines: each Shannon term is floored to
    // integer micro-nats from ONE chain of IEEE ops on exact integers
    // (k·ln(n/k)/n·1e6 — doc_lm_nll's ln-boundary contract), and BOTH
    // engines evaluate SQL generated from the SAME Scala fragments, so
    // association order is identical by construction; the per-doc sum
    // is exact long addition.
    Q("doc_char_entropy",
      (s, d) => {
        // one-pass alphabet counts (graft.functions.CharCounts) — the
        // `length(text) - length(replace(text, c, ''))` spelling (which
        // the oracle keeps) scans and materializes the string 27× per
        // doc. Counts are exact integers either way (cast back to INT
        // to keep the published schema); the IEEE-sensitive entropy
        // terms below are the SAME shared fragments over the same ints.
        graft.GraftExtensions.register(s)
        val base = Tables.documents(s, d)
          .filter(length(col("text")) > 0)
          .withColumn("kc", expr("char_counts(text)"))
          .selectExpr("doc_id" +: "CAST(element_at(kc, 29) AS INT) AS n" +:
            (0 until 27).map(i => s"CAST(element_at(kc, ${i + 1}) AS INT) AS k$i"): _*)
          .withColumn("k27", expr(s"n - (${(0 until 27).map(i => s"k$i").mkString(" + ")})"))
        base
          .select(col("doc_id"), col("n").as("n_chars"),
            expr(entropyMicroSql).as("entropy_micro"),
            round(expr(entropyMicroSql).cast("double") / lit(1e6), 6).as("entropy"),
            round(expr(s"CAST($entropyKmaxSql AS DOUBLE)") / col("n"), 6)
              .as("top_char_fraction"))
          .orderBy("doc_id")
      },
      Some(s"""WITH base AS (
             SELECT doc_id, length(text) AS n, ${entropyCountSqls.mkString(", ")}
             FROM documents WHERE length(text) > 0),
           wo AS (
             SELECT *, n - (${(0 until 27).map(i => s"k$i").mkString(" + ")}) AS k27
             FROM base)
           SELECT doc_id, n AS n_chars, $entropyMicroSql AS entropy_micro,
                  round(CAST($entropyMicroSql AS DOUBLE) / 1e6, 6) AS entropy,
                  round(CAST($entropyKmaxSql AS DOUBLE) / n, 6) AS top_char_fraction
           FROM wo ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // End-to-end cleaning-funnel attrition report — the dashboard
    // every production corpus run ships: per SOURCE, how many
    // documents enter and survive each stage of the standard gate
    // chain (Gopher quality rules → trained quality classifier →
    // exact keep-first dedup → benchmark decontamination). Each stage
    // reuses the EXACT machinery of its standalone registry twin
    // (gopherRuleCols / QualityClassifier.verdicts / md5 keep-first /
    // grams8 + the %7 benchmark split of doc_decontaminate), so the
    // funnel is the composition proof for the gates — a drift in any
    // stage fails this oracle too (the classifier stage replays its
    // FULL CART training inside this oracle, prefixed qc_). The
    // quality gate is Gopher's four CONTENT rules (word-count,
    // mean-word-length, symbol-ratio, alpha-ratio): the fifth
    // (stopword) rule rejects 100% of the synthetic word-salad corpus
    // (see doc_gopher_rules, which keeps all five for rule-level
    // attribution), and an all-zero stage 1 would leave every
    // downstream stage vacuously untested at every oracle scale. Funnel
    // discipline: dedup's keep-first min runs over stage-1 SURVIVORS
    // (the kept copy depends on what quality filtering left), and the
    // gram join scans only stage-2 survivors (cost shrinks with the
    // funnel, the production shape); the benchmark gram set comes
    // from the full table — benchmarks are contamination references,
    // not pipeline input. Scale: scan-shaped rule columns, one digest
    // shuffle, one gram join (survivor-side only), then a tiny
    // per-source aggregate unpivoted to stage rows — every shuffle
    // key is high-cardinality (digest / gram / doc_id), the final
    // agg is map-side combined to |sources| rows.
    Q("doc_pipeline_attrition",
      (s, d) => {
        val docsAll = Tables.documents(s, d)
        val corpus = docsAll.filter(col("doc_id") % 7 =!= 0)
        // stage 1b: the TRAINED gate (QualityClassifier CART, fit on
        // this corpus's own rule labels) runs after the hand rules —
        // the FineWeb-shaped funnel; on corpora where the tree cannot
        // fully absorb the rules this stage drops real documents
        val preds = QualityClassifier.verdicts(s, corpus)
        val flag1 = TextDedupQueries.gopherRuleCols(corpus)
          .select(col("doc_id"), col("source"), col("text"),
            (col("r_word_count") && col("r_mean_len") &&
              col("r_symbol") && col("r_alpha")).as("s1"),
            md5(col("text")).as("digest"))
          .join(preds, Seq("doc_id"))
          .withColumn("s1c", col("s1") && col("pred"))
          .transform(graft.Caching.persistOnce(_))
        val firsts = flag1.filter(col("s1c"))
          .groupBy("digest").agg(min(col("doc_id")).as("keep_doc"))
        val withS2 = flag1.join(firsts, Seq("digest"), "left")
          .withColumn("s2", col("s1c") && col("doc_id") === col("keep_doc"))
          .transform(graft.Caching.persistOnce(_))
        val bench = TextDedupQueries.grams8d(
            docsAll.filter(col("doc_id") % 7 === 0).select("doc_id", "text"))
          .select(explode(col("g8")).as("g")).distinct()
        val contam = TextDedupQueries.grams8d(
            withS2.filter(col("s2")).select("doc_id", "text"))
          .select(col("doc_id"), explode(col("g8")).as("g"))
          .join(bench, "g").select("doc_id").distinct()
          .withColumn("hit", lit(true))
        val flags = withS2.join(contam, Seq("doc_id"), "left")
          .withColumn("s3", col("s2") && col("hit").isNull)
        flags.groupBy("source").agg(
            count(lit(1)).as("n0"),
            sum(when(col("s1"), 1L).otherwise(0L)).as("n1"),
            sum(when(col("s1c"), 1L).otherwise(0L)).as("n1c"),
            sum(when(coalesce(col("s2"), lit(false)), 1L).otherwise(0L)).as("n2"),
            sum(when(coalesce(col("s3"), lit(false)), 1L).otherwise(0L)).as("n3"))
          .select(col("source"), explode(array(
            struct(lit(1).as("stage_ord"), lit("gopher_quality").as("stage"),
              col("n0").as("n_in"), col("n1").as("n_out")),
            struct(lit(2).as("stage_ord"), lit("quality_classifier").as("stage"),
              col("n1").as("n_in"), col("n1c").as("n_out")),
            struct(lit(3).as("stage_ord"), lit("exact_dedup").as("stage"),
              col("n1c").as("n_in"), col("n2").as("n_out")),
            struct(lit(4).as("stage_ord"), lit("decontaminate").as("stage"),
              col("n2").as("n_in"), col("n3").as("n_out")))).as("r"))
          .select(col("r.stage_ord"), col("r.stage"), col("source"),
            col("r.n_in"), col("r.n_out"),
            (col("r.n_in") - col("r.n_out")).as("n_dropped"))
          .orderBy("stage_ord", "source")
      },
      Some(s"""WITH corpus AS (
               SELECT doc_id, source, text FROM documents WHERE doc_id % 7 <> 0),
             w AS (
               SELECT doc_id, text,
                      regexp_extract_all(lower(text), '[^ ]+') AS words
               FROM corpus),
             m AS (
               SELECT doc_id,
                      len(words) AS n_words,
                      list_sum(list_transform(words, x -> len(x))) AS sum_len,
                      len(list_filter(words, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
                      (len(text) - len(replace(text, '#', ''))) +
                        (len(text) - len(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3 AS n_sym
               FROM w),
             keepers AS (
               SELECT doc_id FROM m
               WHERE n_words >= 50 AND n_words <= 100000
                 AND CAST(sum_len AS DOUBLE) / n_words >= 3.0
                 AND CAST(sum_len AS DOUBLE) / n_words <= 10.0
                 AND CAST(n_sym AS DOUBLE) / n_words <= 0.1
                 AND CAST(n_alpha AS DOUBLE) / n_words >= 0.8),
             ${QualityClassifier.chainSql(QualityClassifier.Depth,
                "(SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0)", "qc_")},
             k1c AS (
               SELECT keepers.doc_id FROM keepers
               JOIN qc_pred USING (doc_id) WHERE qc_pred.pred),
             k AS (
               SELECT c.doc_id, c.source, md5(c.text) AS digest
               FROM corpus c JOIN k1c USING (doc_id)),
             firsts AS (SELECT digest, min(doc_id) AS keep_doc FROM k GROUP BY digest),
             s2 AS (
               SELECT k.doc_id, k.source FROM k
               JOIN firsts USING (digest) WHERE k.doc_id = firsts.keep_doc),
             sh AS (
               SELECT doc_id,
                      CASE WHEN len(ws) >= 8
                           THEN list_distinct([list_aggregate(ws[i:i+7], 'string_agg', ' ')
                                               FOR i IN range(1, len(ws) - 6)])
                           ELSE [] END AS s
               FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents) t),
             bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 7 = 0),
             contam AS (
               SELECT DISTINCT t.doc_id
               FROM (SELECT sh.doc_id, unnest(sh.s) AS g
                     FROM sh JOIN s2 USING (doc_id)) t
               WHERE t.g IN (SELECT g FROM bench)),
             s3 AS (
               SELECT doc_id, source FROM s2
               WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
             c0 AS (SELECT source, count(*) AS n FROM corpus GROUP BY source),
             c1 AS (SELECT c.source, count(*) AS n FROM corpus c
                    JOIN keepers USING (doc_id) GROUP BY c.source),
             c1c AS (SELECT source, count(*) AS n FROM k GROUP BY source),
             c2 AS (SELECT source, count(*) AS n FROM s2 GROUP BY source),
             c3 AS (SELECT source, count(*) AS n FROM s3 GROUP BY source),
             st AS (
               SELECT 1 AS stage_ord, 'gopher_quality' AS stage, c0.source,
                      c0.n AS n_in, COALESCE(c1.n, 0) AS n_out
               FROM c0 LEFT JOIN c1 USING (source)
               UNION ALL
               SELECT 2, 'quality_classifier', c0.source,
                      COALESCE(c1.n, 0), COALESCE(c1c.n, 0)
               FROM c0 LEFT JOIN c1 USING (source) LEFT JOIN c1c USING (source)
               UNION ALL
               SELECT 3, 'exact_dedup', c0.source,
                      COALESCE(c1c.n, 0), COALESCE(c2.n, 0)
               FROM c0 LEFT JOIN c1c USING (source) LEFT JOIN c2 USING (source)
               UNION ALL
               SELECT 4, 'decontaminate', c0.source,
                      COALESCE(c2.n, 0), COALESCE(c3.n, 0)
               FROM c0 LEFT JOIN c2 USING (source) LEFT JOIN c3 USING (source))
             SELECT CAST(stage_ord AS INT) AS stage_ord, stage, source,
                    CAST(n_in AS BIGINT) AS n_in, CAST(n_out AS BIGINT) AS n_out,
                    CAST(n_in - n_out AS BIGINT) AS n_dropped
             FROM st ORDER BY stage_ord, source""")),
  )

  // 28-symbol alphabet for doc_char_entropy: a–z, space, + an implicit
  // "other" bucket (k27 = n − Σk_i). SQL fragments are shared verbatim
  // between the Spark expr() side and the DuckDB oracle so the IEEE
  // evaluation order cannot drift apart. All defs (not vals): `all`
  // interpolates them at object init — the DSIR comment's init-order
  // trap.
  private def entropyCountSqls: Seq[String] =
    (('a' to 'z') :+ ' ').zipWithIndex.map { case (ch, i) =>
      s"(length(text) - length(replace(text, '$ch', ''))) AS k$i"
    }

  private def entropyTermSql(i: Int): String =
    s"CASE WHEN k$i > 0 THEN CAST(floor(CAST(k$i AS DOUBLE) * ln(CAST(n AS DOUBLE) / k$i) / n * 1e6) AS BIGINT) ELSE CAST(0 AS BIGINT) END"

  private def entropyMicroSql: String =
    (0 to 27).map(entropyTermSql).mkString("(", " + ", ")")

  private def entropyKmaxSql: String =
    s"greatest(${(0 to 27).map(i => s"k$i").mkString(", ")})"

  private[operators] def docDsirWeights(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      split(trim(TextDedupQueries.normSquash(docs)(lower(col("text")))), " ")
        .as("ws"))
    val occ = toks.select(col("doc_id"), col("lang"),
        explode(when(size(col("ws")) >= 2,
          expr("""transform(sequence(1, size(ws) - 1),
                   i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"""))
          .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))).as("g"))
      .select(col("doc_id"), col("lang"),
        expr("int(conv(substring(md5(g), 1, 3), 16, 10))").as("bucket"))
      // consumed TWICE (bucket stats, then per-doc scoring) — without
      // the barrier the whole gram derivation (two regex passes +
      // md5 per gram over the full corpus) re-evaluates per consumer,
      // doubling the dominant cost (the doc_fuzzy_match lesson;
      // measured 50.1 → 24.4 s at the 100× slice). Cached rows are
      // the NARROW (doc_id, lang, bucket) triple — the text never
      // enters the cache.
      .transform(graft.Caching.persistOnce(_))
    val stats = occ.groupBy("bucket").agg(
      count(lit(1)).as("cr"),
      count(when(col("lang") === DsirTargetLang, 1)).as("ct"))
    val totals = stats.agg(sum(col("cr")).as("r"), sum(col("ct")).as("t"))
    val terms = stats.crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor(log(((col("ct") + 1).cast("double") * (col("r") + DsirBuckets).cast("double")) /
          ((col("cr") + 1).cast("double") * (col("t") + DsirBuckets).cast("double"))) * lit(1e6))
          .cast("long").as("lw_micro"))
    occ.join(broadcast(terms), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum(col("lw_micro")).as("logw_micro_sum"))
      // floor-quantized to 1e-6, not round(): the avg landed exactly
      // on a half-tie at sf0.01 and the engines' round() modes split;
      // floor of a double is representation-exact on both
      .withColumn("avg_logw",
        floor(col("logw_micro_sum").cast("double") / lit(1e6) / col("n_grams") * lit(1e6)) / lit(1e6))
      .orderBy("doc_id")
  }

  private def dsirOracleSql: String = {
    // 3-hex-digit md5 prefix → bucket ∈ [0, 4096): the strpos hex
    // parse (doc_simhash's oracle idiom)
    def hexd(i: Int) = s"(strpos('0123456789abcdef', substring(h, $i, 1)) - 1)"
    s"""WITH w AS (
         SELECT doc_id, lang,
                string_split(trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ') AS ws
         FROM documents),
       bix AS (SELECT doc_id, lang, ws, unnest(range(1, len(ws))) AS i FROM w),
       occ AS (
         SELECT doc_id,
                ${hexd(1)} * 256 + ${hexd(2)} * 16 + ${hexd(3)} AS bucket, lang
         FROM (SELECT doc_id, lang, md5(ws[i] || ' ' || ws[i + 1]) AS h FROM bix)),
       stats AS (
         SELECT bucket, CAST(count(*) AS BIGINT) AS cr,
                CAST(count(*) FILTER (WHERE lang = '$DsirTargetLang') AS BIGINT) AS ct
         FROM occ GROUP BY bucket),
       tot AS (SELECT CAST(sum(cr) AS BIGINT) AS r, CAST(sum(ct) AS BIGINT) AS t FROM stats),
       terms AS (
         SELECT bucket,
                CAST(floor(ln((CAST(ct + 1 AS DOUBLE) * CAST(r + $DsirBuckets AS DOUBLE)) /
                  (CAST(cr + 1 AS DOUBLE) * CAST(t + $DsirBuckets AS DOUBLE))) * 1e6) AS BIGINT) AS lw_micro
         FROM stats CROSS JOIN tot),
       agg AS (
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                CAST(sum(lw_micro) AS BIGINT) AS logw_micro_sum
         FROM occ JOIN terms USING (bucket) GROUP BY doc_id)
       SELECT doc_id, n_grams, logw_micro_sum,
              floor(CAST(logw_micro_sum AS DOUBLE) / 1e6 / n_grams * 1e6) / 1e6 AS avg_logw
       FROM agg ORDER BY doc_id"""
  }
}
