package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** LLM-training-data text operators over the `documents` table:
  * exact/normalized dedup, quality scoring, token counting, language
  * ID, document fingerprinting, and n-gram Jaccard near-dup detection
  * (exact inverted-index form + banded MinHash-LSH form).
  *
  * Scale design (100 TB):
  *  - hash-based dedup is a single shuffle on the digest — the digest
  *    (16-32 bytes) is the shuffle key, never the document body;
  *  - near-dup NEVER does all-pairs: the exact form joins docs through
  *    a shingle inverted index (pairs exist only where a shingle is
  *    shared), the LSH form through 16 banded signature buckets —
  *    both shuffle O(docs × shingles/bands), not O(docs²);
  *  - the DuckDB oracles DO use all-pairs — affordable at sf0.01 only,
  *    which is exactly the point: the oracle is the semantic spec, the
  *    Spark plan is the scale path.
  */
object TextDedupQueries {

  /** Ceiling on a fuzzy-match block's row count (doc_fuzzy_match):
    * level-1 prefix blocks over this refine on chars 17-32; blocks
    * still over it after refinement are excluded from pairing, so the
    * in-block Levenshtein loop is ≤ cap²/2 pairs per block no matter
    * how skewed the corpus. Mirrored literally (256) in the DuckDB
    * oracle SQL — keep the two in sync.
    */
  val FuzzyBlockCap = 256

  /** Distinct 3-word shingles per document as 16-byte window_md5s
    * DIGESTS: (doc_id, sh: array<binary>, n). Digest distinctness,
    * intersection, and equality all equal their string-shingle
    * counterparts (the [[graft.functions.WindowMd5s]] exactness
    * argument), so every consumer — exact-Jaccard verification,
    * MinHash banding, the persisted incremental-dedup index — keeps
    * its oracle while the HOF gram build (split + per-window
    * slice/array_join lambdas, ~10 s of scan CPU at the 100× slice)
    * leaves the plan and set payloads ship at half the bytes.
    *
    * The digests are carried as STRINGS holding the raw 16 bytes
    * (binary→string cast = an unvalidated byte wrap; Spark string
    * equality/hashing is byte-based, so semantics are the digest's):
    * StringType has "proper equals", which keeps array_intersect /
    * array set ops on the codegen hash-set fast path — as
    * ARRAY<BINARY> the same plans fall to the interpreted O(n·m)
    * ordering scan (measured: doc_ngram_jaccard 22.6 → 143.7 s at the
    * 100× slice on binary elements).
    */
  private[operators] def shingles(df: DataFrame): DataFrame = {
    graft.GraftExtensions.register(df.sparkSession)
    df.select(col("doc_id"),
        expr("transform(window_md5s(lower(text), 3), x -> string(x))").as("sh"))
      .select(col("doc_id"), col("sh"), size(col("sh")).as("n"))
  }

  private[operators] val shingleSqlCte =
    """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
       sh AS (SELECT doc_id,
                     list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                    FOR i IN range(1, len(ws) - 1)]) AS s
              FROM w)"""

  /** Exact pairwise 3-shingle Jaccard ≥ threshold via PREFIX FILTERING
    * (PPJoin-style, exact — no false negatives): order each doc's
    * shingles rarest-first by global frequency; two docs with
    * Jaccard ≥ t must share at least one shingle in their first
    * `n − ceil(t·n) + 1` shingles, so the candidate join touches only
    * those prefixes (≈(1−t)·n rows per doc instead of n, and prefixes
    * are the RARE shingles, so bucket fan-out is tiny). Candidates are
    * then verified with the full set intersection. The candidate
    * threshold is backed off slightly (t − 0.001) so the final
    * round(·, 6) ≥ t filter can't admit a pair the prefix theory was
    * allowed to drop.
    */
  private[operators] def exactJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val tCand = threshold - 0.001
    val sh = shingles(docs).transform(graft.Caching.persistOnce(_))
    // Candidate generation runs in the 64-BIT HASH UNIVERSE: every
    // pre-verification exchange (frequency count, rarest-first window,
    // prefix self-join) keys on xxhash64(shingle) longs instead of
    // ~30-byte shingle strings — ~4× fewer shuffled bytes and
    // long-keyed hash relations throughout. Exactness is preserved:
    // the prefix-filter theorem needs only A consistent total order
    // over SOME universe the sets live in, and hash-set Jaccard can
    // fall below string-set Jaccard only by cAB/|A∪B| where cAB =
    // xxhash64 collisions WITHIN one pair's common shingles — the
    // existing t − 0.001 candidate backoff absorbs up to one
    // collision per 1000 common shingles (P < 1e-10 corpus-wide;
    // same argument class as doc_minhash_lsh's 0.9998 banding
    // recall, and verification below is exact on the string sets
    // either way). n here = |hash set| (array_distinct of hashes), so
    // both the prefix length and the length filter are the hash
    // universe's own — the theorem applies wholly inside it.
    val shH = sh.select(col("doc_id"),
        expr("array_distinct(transform(sh, x -> xxhash64(x)))").as("hs"))
      .select(col("doc_id"), col("hs"), size(col("hs")).as("n"))
    val ex = shH.select(col("doc_id"), col("n"), explode(col("hs")).as("h"))
    // global document frequency per hashed shingle → rarest-first
    val df_ = ex.groupBy("h").agg(count(lit(1)).as("freq"))
    val wDoc = Window.partitionBy("doc_id")
      .orderBy(col("freq").asc, col("h").asc)
    // persisted: the self-join below would otherwise recompute the
    // whole freq+window pipeline once per side. Prefixes are EXTENDED
    // by one (… + 2 instead of the classic … + 1): with length
    // n − ceil(t·n) + j a qualifying pair must share ≥ min(j, c)
    // prefix tokens (c = the guaranteed overlap ceil(t·n_min); the
    // global-order argument is in the candidate-stage comment below),
    // which is what lets the aggregated filter demand TWO shared rare
    // shingles — the single biggest false-candidate cut.
    val prefixes = ex.join(df_, "h")
      .withColumn("pos", row_number().over(wDoc))
      .filter(col("pos") <= col("n") - ceil(lit(tCand) * col("n")) + 2)
      .select(col("doc_id"), col("n"), col("pos"), col("h"), col("freq"))
      .transform(graft.Caching.persistOnce(_))
    // candidate pairs: shared prefix hash + the LENGTH filter
    // (Jaccard ≥ t ⟹ t·max(n_a,n_b) ≤ min(n_a,n_b)), then an
    // AGGREGATED PPJoin+-style pass over each pair's collision rows
    // (the join emits one row per shared prefix token):
    //
    //  - rank the pair's shared prefix tokens by the GLOBAL
    //    rarest-first order (freq, h) — the same key both docs'
    //    windows sort by, so a common token h' before h_k in that
    //    order sits before h_k in BOTH docs, hence inside BOTH
    //    extended prefixes, hence IS one of the pair's collision
    //    rows. The k-th shared row therefore has exactly k−1 common
    //    tokens before it, giving the exact bound
    //      |A∩B| ≤ k + min(n_a − pos_a(h_k), n_b − pos_b(h_k))
    //    per row, and the pair's tightest bound is the MIN over k —
    //    strictly tighter than the old any-row single-token form.
    //  - require ≥ min(2, ceil(t·n_min)) shared prefix tokens (valid
    //    by the extended prefix above; the min-guard keeps the
    //    degenerate one-shingle-doc pair, whose guaranteed overlap
    //    is only 1).
    //
    // At the 100× slice the old any-row form admitted 1.28 M
    // candidate pairs of which 25.6 k verified — and each false
    // candidate shipped both shingle sets through the verification
    // exchange (2.67 GB, the largest exchange in the committed
    // exponent table). The aggregated filter exists to cut THAT
    // payload; the collision-row aggregation itself is narrow
    // (doc ids + three ints per row).
    val required = lit(tCand) * (col("n_a") + col("n_b"))
    val wPair = Window.partitionBy("doc_a", "doc_b")
      .orderBy(col("freq").asc, col("h").asc)
    val candidates = prefixes.as("a").join(prefixes.as("b"), Seq("h"))
      .filter(col("a.doc_id") < col("b.doc_id") &&
        greatest(col("a.n"), col("b.n")) * tCand <= least(col("a.n"), col("b.n")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"),
        // freq is a function of h — both sides carry the same value
        col("a.freq").as("freq"), col("h"))
      .withColumn("k", row_number().over(wPair))
      .withColumn("bound",
        col("k") + least(col("n_a") - col("pos_a"), col("n_b") - col("pos_b")))
      .groupBy("doc_a", "doc_b", "n_a", "n_b")
      .agg(min(col("bound")).as("ubound"), count(lit(1)).as("shared"))
      .filter(col("shared") >= least(lit(2), ceil(lit(tCand) * least(col("n_a"), col("n_b")))) &&
        col("ubound") * (1 + tCand) >= required)
      .select(col("doc_a"), col("doc_b"))
      // persisted: consumed THREE times (both pairedDocs union
      // branches + the verification join) — uncached, the whole
      // collision join + window + aggregate pipeline re-evaluated per
      // consumer (measured 3× the candidate stage at sf0.1: the
      // round-14 bench regression this line fixes). Cached rows are
      // the narrow (doc_a, doc_b) pair list only.
      .transform(graft.Caching.persistOnce(_))
    // verification: full distinct-shingle sets of candidate pairs
    // only, with the set relation first RESTRICTED to docs that
    // appear in some candidate (left-semi against the narrow pair
    // list) — the sets of never-paired docs don't enter the join
    // exchanges at all. No broadcast hint — the shingle-set table is
    // O(corpus) and would blow the broadcast ceiling at scale; the
    // candidate side is the small one and AQE picks the build side
    // at runtime.
    val pairedDocs = candidates.select(col("doc_a").as("doc_id"))
      .union(candidates.select(col("doc_b").as("doc_id")))
      .distinct()
    val shNeeded = sh.join(pairedDocs, Seq("doc_id"), "left_semi")
    val setsA = shNeeded.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("n_a"))
    val setsB = shNeeded.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("n_b"))
    candidates.join(setsA, "doc_a").join(setsB, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  private def exactJaccardSql(threshold: Double): String =
    s"""$shingleSqlCte
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                    len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
       FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                   len(list_distinct(list_concat(a.s, b.s))), 6) >= $threshold
       ORDER BY doc_a, doc_b"""

  /** Per-doc Gopher rule columns (Rae et al. 2021 §A1.1) appended to
    * `docs` — ONE definition shared by the batch registry entry
    * (oracle-verified) and the streaming quality gate
    * (graft.streaming.CorpusIngest.gopherGate): every signal is a
    * per-row map (integer counts + one IEEE division of exact
    * integers), no aggregation — streaming-legal verbatim in append
    * mode. Appends n_words, the five rule booleans, and `keep`; input
    * columns pass through; intermediates are dropped.
    *
    * Ratio rules are guarded on n_words > 0 in BOTH engines:
    * unguarded, a zero-word doc (empty/whitespace-only text) diverges
    * — Spark's non-ANSI Divide yields NULL booleans while DuckDB's
    * IEEE x/0 yields inf → false. The guard pins one semantics (all
    * ratio rules false on empty docs) and short-circuits before the
    * division in each engine.
    */
  /** The fingerprint-family normalization (`lower` → keep `[a-z0-9 ]`
    * → collapse spaces) with the two regex passes replaced by the
    * single-pass [[graft.functions.SquashAlnum]] codegen kernel —
    * byte-identical output (see that file's exactness argument; the
    * oracles keep the regex spelling, which is the same function).
    * Takes the DataFrame only to register the extension on its
    * session.
    */
  private[operators] def normSquash(df: DataFrame)(c: Column): Column = {
    graft.GraftExtensions.register(df.sparkSession)
    call_function("squash_alnum", c)
  }

  private[graft] def gopherRuleCols(docs: DataFrame): DataFrame =
    gopherRuleColsKeep(docs)
      .drop("words", "sum_len", "n_alpha", "n_sym", "n_stop_distinct",
        "mean_wlen", "sym_ratio", "alpha_ratio")

  /** [[gopherRuleCols]] WITHOUT the final helper-column drop — for
    * callers (QualityClassifier's feature melt) that reuse the word
    * list and length sums instead of paying the regex tokenization a
    * second time per document. */
  private[operators] def gopherRuleColsKeep(docs: DataFrame): DataFrame =
    docs
      .withColumn("words", expr("regexp_extract_all(lower(text), '[^ ]+', 0)"))
      .withColumn("n_words", size(col("words")))
      .withColumn("sum_len", aggregate(col("words"), lit(0),
        (acc, w) => acc + length(w)))
      .withColumn("n_alpha", size(expr("filter(words, w -> w rlike '[a-z]')")))
      .withColumn("n_sym",
        (length(col("text")) - length(regexp_replace(col("text"), "#", ""))) +
          (length(col("text")) -
            length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3)
      .withColumn("n_stop_distinct", size(array_intersect(col("words"),
        array(Seq("the", "be", "to", "of", "and", "that", "have", "with")
          .map(lit): _*))))
      // The zero-word guard must live INSIDE a CaseWhen, not as an
      // `&&` conjunct ahead of the division: ANSI mode (Spark 4
      // default) turns 0/0 into a runtime error, and common-
      // subexpression elimination evaluates the shared division
      // EAGERLY even when the left conjunct would short-circuit it —
      // an empty doc then kills the whole job. `when` branches stay
      // lazy; coalesce pins the rule to false for zero-word docs
      // (the same verdict the oracle's n_words > 0 guard produces).
      .withColumn("mean_wlen",
        when(col("n_words") > 0, col("sum_len").cast("double") / col("n_words")))
      .withColumn("sym_ratio",
        when(col("n_words") > 0, col("n_sym").cast("double") / col("n_words")))
      .withColumn("alpha_ratio",
        when(col("n_words") > 0, col("n_alpha").cast("double") / col("n_words")))
      .withColumn("r_word_count",
        col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("r_mean_len",
        coalesce(col("mean_wlen") >= 3.0 && col("mean_wlen") <= 10.0, lit(false)))
      .withColumn("r_symbol", coalesce(col("sym_ratio") <= 0.1, lit(false)))
      .withColumn("r_alpha", coalesce(col("alpha_ratio") >= 0.8, lit(false)))
      .withColumn("r_stopwords", col("n_stop_distinct") >= 2)
      .withColumn("keep", col("r_word_count") && col("r_mean_len") &&
        col("r_symbol") && col("r_alpha") && col("r_stopwords"))

  /** (input minus text, plus g8) — each doc's DISTINCT 8-word-gram
    * array, the decontamination unit. Shared by the batch bloom/exact
    * registry entries and the streaming watermarked-bloom gate (the
    * gram build is a per-row map — streaming-legal).
    */
  private[graft] def grams8(docs: DataFrame): DataFrame =
    docs
      .withColumn("ws", split(lower(col("text")), " "))
      .withColumn("g8", when(size(col("ws")) >= 8,
        expr("""array_distinct(transform(sequence(0, size(ws) - 8),
                 i -> array_join(slice(ws, i + 1, 8), ' ')))"""))
        .otherwise(expr("CAST(array() AS ARRAY<STRING>)")))
      .drop("ws", "text")

  /** Digest-keyed twin of [[grams8]]: (input minus text, plus g8) with
    * the distinct 8-word-gram set as window_md5s digest STRINGS (see
    * [[shingles]] for the digest-as-string rationale — byte-wrapped
    * StringType keeps joins/set ops on the proper-equals fast path).
    * Gram-equality joins and distincts are digest-exact; the oracles
    * and the streaming gate keep the string-gram spelling.
    */
  private[operators] def grams8d(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    docs
      .withColumn("g8",
        expr("transform(window_md5s(lower(text), 8), x -> string(x))"))
      .drop("text")
  }

  /** Bloom position of gram `g` under `salt` — the first-6-hex-digit
    * value of md5(g || '#' || salt): k=4 salts × m=16^6 addressable
    * bits (≈2 MB as a real bitset). Deterministic on both engines
    * (md5), which is what lets the filter live as RELATIONAL data.
    */
  private[graft] def bloomPos(g: Column, salt: Int): Column =
    conv(substring(md5(concat(g, lit("#"), lit(salt.toString))), 1, 6),
      16, 10).cast("long")

  /** The benchmark-side Bloom filter as a relation: the distinct
    * position set of `grams` (column `g`) across the 4 salts. Bounded
    * by the benchmark size → broadcast-joinable on the probe side.
    */
  private[graft] def bloomPositions(grams: DataFrame): DataFrame =
    grams
      .withColumn("salt", explode(sequence(lit(0), lit(3))))
      .withColumn("pos", expr(
        "CAST(conv(substring(md5(concat(g, '#', CAST(salt AS STRING))), 1, 6), 16, 10) AS BIGINT)"))
      .select("pos").distinct()

  /** DuckDB twin of the doc_simhash pipeline: identical md5-digit bit
    * votes, 16-bit chunk assembly, chunk-bucketed pairing, and hamming
    * filter. The hex digit → int step uses strpos over the hex
    * alphabet (portable; Spark uses conv, same value).
    */
  private def simhashOracleSql: String = {
    val digits = (0 until 16).map(dd =>
      s"strpos('0123456789abcdef', substring(hx, ${dd + 1}, 1)) - 1 AS d$dd")
      .mkString(", ")
    val votes = (0 until 64).map(j =>
      s"SUM(CASE WHEN ((d${j / 4} >> ${j % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(", ")
    val chunkCols = (0 until 4).map { c =>
      val bits = (0 until 16).map(k =>
        s"CASE WHEN s${c * 16 + k} > 0 THEN ${1 << k} ELSE 0 END").mkString(" + ")
      s"($bits) AS c$c"
    }.mkString(", ")
    val hamming = (0 until 4).map(i =>
      s"bit_count(xor(x.c$i, y.c$i))").mkString(" + ")
    s"""WITH toks AS (
         SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
         FROM documents),
       th AS (SELECT doc_id, md5(w) AS hx FROM toks),
       digits AS (SELECT doc_id, $digits FROM th),
       votes AS (SELECT doc_id, $votes FROM digits GROUP BY doc_id),
       chunks AS (SELECT doc_id, $chunkCols FROM votes),
       ex AS (SELECT doc_id, c0, c1, c2, c3, g.c,
                     CASE g.c WHEN 0 THEN c0 WHEN 1 THEN c1
                              WHEN 2 THEN c2 ELSE c3 END AS chunk
              FROM chunks, (SELECT unnest([0, 1, 2, 3]) AS c) g),
       pairs AS (
         SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                CAST($hamming AS INTEGER) AS hamming
         FROM ex x JOIN ex y ON x.c = y.c AND x.chunk = y.chunk
                            AND x.doc_id < y.doc_id)
       SELECT doc_a, doc_b, hamming FROM pairs
       WHERE hamming <= 6 ORDER BY doc_a, doc_b"""
  }

  /** Connected components over a near-dup pair graph by min-label
    * propagation: every doc starts labeled with its own id; each round
    * takes the min of its label and its neighbors' labels; fixpoint =
    * components, label = min doc_id in the component (the canonical
    * survivor). This is the step that turns pairwise near-dup output
    * into an actual dedup decision.
    *
    * Scale (the two round-9 fixes, each one shuffle-shape change):
    *  - DEGREE-1 PRE-CONTRACTION: a leaf's label is decided entirely
    *    by its one neighbor, so leaves are peeled before the loop and
    *    re-attached after (one component-min regroup restores the
    *    "label = min doc_id INCLUDING leaves" contract). Near-dup
    *    graphs are leaf-heavy — most dups are isolated pairs — so this
    *    typically halves the iterated edge set.
    *  - DELTA (frontier) PROPAGATION: labels only ever decrease, so a
    *    node needs to hear a new minimum exactly once — each round
    *    joins edges against only the labels that CHANGED last round
    *    (semi-naïve evaluation), not the full label table. Round 1
    *    touches every edge; the frontier then collapses geometrically,
    *    so rounds 2+ cost o(edges) instead of the full-edge shuffle
    *    that made this the slowest 100×-slice entry (138 s).
    * The fixpoint is unchanged: a smaller label reaches u the round
    * after some neighbor first acquires it, values never increase, so
    * delta ≡ full propagation. O(core diameter) rounds; adversarial
    * diameters hand off to the large-star/small-star contraction
    * (O(log n) rounds) with the identical contract. Every round's
    * state is lineage-TRUNCATED (localCheckpoint) — without it each
    * plan re-embeds (and Catalyst re-analyzes) the entire upstream
    * edge-detection pipeline, which was ~3× the round cost.
    */
  def nearDupClusters(s: SparkSession, edgesIn: DataFrame,
                      maxRounds: Int = 20): DataFrame = {
    // Eager checkpoint BEFORE the symmetrizing union: a lazy persist
    // does not help there — both union branches scan the un-populated
    // cache concurrently inside one job, so the (expensive) upstream
    // pair-detection pipeline ran TWICE. Measured at the 100× slice
    // this was ~32 s of the operator's 97 s wall.
    val edges = edgesIn.select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    val sym = edges
      .union(edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .repartition(col("doc_b"))
      .localCheckpoint(true)
    // ---- degree-1 peel. deg counts edge ROWS (duplicate input edges
    // inflate it), which is safe: inflation only suppresses a peel,
    // never peels a non-leaf. deg==1 ⇒ exactly one row ⇒ min(doc_b) IS
    // the single neighbor. An isolated a—b pair keeps its smaller
    // endpoint in the core (peel iff the neighbor is non-leaf or
    // smaller), so a peeled leaf's neighbor is never itself peeled and
    // the post-loop re-attach join always finds a core label.
    val degs = sym.groupBy(col("doc_a").as("node"))
      .agg(count(lit(1)).as("deg"), min(col("doc_b")).as("nbr"))
      .localCheckpoint(true)
    val leaves = degs.filter(col("deg") === 1)
      .join(degs.select(col("node").as("nbr"), col("deg").as("nbr_deg")), "nbr")
      .filter(col("nbr_deg") > 1 || col("nbr") < col("node"))
      .select(col("node").as("leaf"), col("nbr"))
      .localCheckpoint(true)
    val coreSym = sym
      .join(leaves.select(col("leaf").as("la")), col("doc_a") === col("la"), "left_anti")
      .join(leaves.select(col("leaf").as("lb")), col("doc_b") === col("lb"), "left_anti")
      .repartition(col("doc_b"))
      .localCheckpoint(true)
    // core nodes (incl. ones isolated by the peel) start self-labeled;
    // the initial frontier is everything — round 1 ≡ full propagation.
    var labels = degs.select(col("node").as("doc"))
      .join(leaves.select(col("leaf").as("doc")), Seq("doc"), "left_anti")
      .withColumn("lbl", col("doc"))
      .repartition(col("doc"))
      .localCheckpoint(true)
    var frontier = labels
    var round = 0
    var frontierN = 1L
    while (frontierN > 0 && round < maxRounds) {
      // only frontier labels propagate: coreSym keeps its doc_b hash
      // partitioning across rounds, so this join shuffles just the
      // (small) frontier side
      val nbrMin = coreSym
        .join(frontier.select(col("doc").as("fdoc"), col("lbl")),
          col("doc_b") === col("fdoc"))
        .groupBy(col("doc_a").as("doc")).agg(min(col("lbl")).as("nlbl"))
      // convergence check and next frontier ride the same pass: the
      // eager checkpoint is the round's one real job, the agg and
      // filter below read the materialized result
      val next = labels.withColumnRenamed("lbl", "old_lbl")
        .join(nbrMin, Seq("doc"), "left")
        .select(col("doc"),
          least(col("old_lbl"), coalesce(col("nlbl"), col("old_lbl"))).as("lbl"),
          (coalesce(col("nlbl"), col("old_lbl")) < col("old_lbl")).as("chg"))
        .localCheckpoint(true)
      frontierN = next.agg(coalesce(sum(when(col("chg"), 1L).otherwise(0L)), lit(0L)))
        .head().getLong(0)
      frontier = next.filter(col("chg")).select(col("doc"), col("lbl"))
      labels = next.select(col("doc"), col("lbl"))
      round += 1
    }
    if (frontierN > 0) {
      // adversarial core diameter (> maxRounds): hand off to the
      // O(log n) star contraction instead of failing — same contract,
      // any correct CC algorithm yields identical clusters. Pass the
      // CHECKPOINTED edges so the detection pipeline is not recomputed.
      return nearDupClustersStar(s, edges)
    }
    // ---- re-attach peeled leaves through their neighbor's component,
    // then restore "cluster_id = component min" over ALL members (a
    // peeled leaf may be the true minimum — e.g. the low end of a path)
    val leafLbls = leaves
      .join(labels.select(col("doc").as("nbr"), col("lbl")), Seq("nbr"))
      .select(col("leaf").as("doc"), col("lbl"))
    val members = labels.select(col("doc"), col("lbl")).union(leafLbls)
    val compMin = members.groupBy("lbl").agg(min(col("doc")).as("m"))
    members.join(compMin, "lbl")
      .select(col("doc").as("doc_id"), col("m").as("cluster_id"),
        (col("doc") === col("m")).as("is_canonical"))
      .orderBy("doc_id")
  }

  /** Connected components by ALTERNATING large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond"): converges in O(log n) rounds on ANY graph shape,
    * including the long chains that defeat O(diameter) label
    * propagation. Per round: large-star hangs every neighbor larger
    * than `u` off `u`'s neighborhood minimum; small-star re-points the
    * smaller-or-equal neighbors (and `u` itself) at it. Each operation
    * is one groupBy(u) shuffle plus a co-partitioned join back — the
    * same cost shape as a label-prop round, but the round COUNT is
    * logarithmic. Fixpoint: every surviving edge is (node →
    * component-min).
    *
    * [[nearDupClusters]] uses label propagation first (cheaper on the
    * short-diameter graphs near-dup similarity actually produces) and
    * falls back here when the diameter bound trips.
    */
  def nearDupClustersStar(s: SparkSession, edgesIn: DataFrame,
                          maxRounds: Int = 48): DataFrame = {
    val base = edgesIn.select(col("doc_a"), col("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .transform(graft.Caching.persistOnce(_))
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(hash(col("doc_a"), col("doc_b")).cast("long")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    // undirected edge set as canonical (small, large) pairs
    var edges = base
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      .distinct()
      .localCheckpoint(true)
    var sig = signature(edges)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // ---- large-star: for each u, m = min(N(u) ∪ {u}); emit (m, v)
      //      for every neighbor v > u
      val nbrs = edges.union(
        edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      val mins = nbrs.groupBy(col("doc_a").as("u"))
        .agg(least(min(col("doc_b")), first(col("doc_a"))).as("m"))
      val afterLarge = nbrs.join(mins, nbrs("doc_a") === mins("u"))
        .filter(col("doc_b") > col("doc_a"))
        .select(least(col("m"), col("doc_b")).as("doc_a"),
          greatest(col("m"), col("doc_b")).as("doc_b"))
        .filter(col("doc_a") =!= col("doc_b"))
        .distinct()
      // ---- small-star: for each u, re-point neighbors ≤ u (and u) at m
      val nbrs2 = afterLarge.union(
        afterLarge.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      val mins2 = nbrs2.groupBy(col("doc_a").as("u"))
        .agg(least(min(col("doc_b")), first(col("doc_a"))).as("m"))
      val small = nbrs2.filter(col("doc_b") <= col("doc_a"))
        .join(mins2, nbrs2("doc_a") === mins2("u"))
        .select(col("m"), col("doc_b"))
      val self = nbrs2.select(col("doc_a")).distinct()
        .join(mins2, col("doc_a") === col("u"))
        .select(col("m"), col("doc_a").as("doc_b"))
      val afterSmall = small.union(self)
        .select(least(col("m"), col("doc_b")).as("doc_a"),
          greatest(col("m"), col("doc_b")).as("doc_b"))
        .filter(col("doc_a") =!= col("doc_b"))
        .distinct()
        .localCheckpoint(true)
      val nextSig = signature(afterSmall)
      converged = nextSig == sig
      sig = nextSig
      edges = afterSmall
      round += 1
    }
    require(converged, s"star contraction did not converge in $maxRounds rounds")
    // fixpoint edges are (component-min, node); nodes absent from the
    // final set (isolated after self-filter) are their own minimum
    val nodes = base.select(col("doc_a").as("doc"))
      .union(base.select(col("doc_b").as("doc"))).distinct()
    val parents = edges.groupBy(col("doc_b").as("doc"))
      .agg(min(col("doc_a")).as("parent"))
    nodes.join(parents, Seq("doc"), "left")
      .select(col("doc").as("doc_id"),
        coalesce(col("parent"), col("doc")).as("cluster_id"),
        (coalesce(col("parent"), col("doc")) === col("doc")).as("is_canonical"))
      .orderBy("doc_id")
  }

  /** Top-V vocabulary cap for [[docLmNll]]: standard truncated-LM
    * sizing, far above every observed testdata vocabulary (31 words at
    * sf0.001-0.1, 3 010 at the 100× slice) so the cap is NON-BINDING at
    * oracle scale and the uncapped DuckDB oracle stays valid verbatim
    * — while bounding the model tables at real corpus scale.
    */
  val LmVocabCap = 32768

  /** Folded-OOV token for [[docLmNll]]. Tokenization strips everything
    * outside [a-z0-9 ], so a control character can never collide with
    * a real token.
    */
  val LmOovToken = "\u0001oov"

  /** CCNet-style bigram-LM corpus perplexity score with a TOP-V
    * vocabulary (count-desc, word-asc — deterministic under ties) and
    * a single folded OOV token; add-one smoothing over the MAPPED
    * vocabulary, so when the cap does not bind the model is exactly
    * the uncapped one (identity mapping, identical counts, identical
    * smoothing denominator).
    *
    * Scale design — the model tables, not the corpus, are the join
    * build sides:
    *  - the corpus-sized bigram stream is only ever the PROBE side of
    *    hash joins against vocabulary-bounded tables (keep set ≤ V
    *    rows; per-bigram NLL term table ≤ observed bigram types, which
    *    the cap bounds). The previous form shuffled every bigram
    *    occurrence through sort-merge joins keyed on (w1[, w2]) — with
    *    a natural-language vocabulary those keys have tiny cardinality
    *    (31 distinct at sf0.1!), so 27 M rows at the 100× slice piled
    *    onto a handful of skewed sort tasks: 108 s. Broadcasting the
    *    term table keeps the probe in one whole-stage-codegen pass:
    *    no bigram row is ever shuffled (the final per-doc aggregate
    *    map-side combines to one row per document before its
    *    exchange).
    *  - the broadcast is size-guarded, not assumed: if the term table
    *    exceeds LmBroadcastCeiling rows (pathological corpus — near-V²
    *    observed bigram types), the plan falls back to a plain join
    *    and AQE picks the strategy. The count() that decides is over
    *    the already-aggregated (small) table.
    */
  val LmBroadcastCeiling = 3000000L

  /** Driver-side model cap for [[docLmNll]]: up to this many combined
    * count rows (bigram types + doc-final unigram rows) the model fit
    * runs on ONE collected copy of the one-pass count aggregate (the
    * [[BpeTokenizer.trainMerges]] bounded-driver discipline) instead
    * of ~6 chained Spark jobs; past it the distributed fit runs over
    * the SAME cached aggregate — the probe pass is never wasted.
    * Below [[LmBroadcastCeiling]] so the local branch's term table is
    * always broadcastable.
    */
  val LmLocalModelMaxTypes = 1 << 21

  private[operators] def docLmNll(docs: DataFrame,
                                  vocabCap: Int = LmVocabCap): DataFrame = {
    val session = docs.sparkSession
    // cached: the tokenized corpus feeds the count pass and the
    // scoring pass — measured at the 100× slice, recomputing the
    // regex+split per pass costs ~2× the cache.
    val toks = docs
      .select(col("doc_id"),
        split(trim(normSquash(docs)(lower(col("text")))), " ").as("ws"))
      .transform(graft.Caching.persistOnce(_))
    // sequence(1, 0) is DESCENDING in Spark, so the short-doc case
    // must be an explicit empty array (the doc_substring_dedup
    // guard pattern)
    val bi = toks.select(col("doc_id"),
        explode(when(size(col("ws")) >= 2,
          expr("""transform(sequence(1, size(ws) - 1),
                   i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"""))
          .otherwise(expr("CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>)")))
          .as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    // ONE corpus-wide count pass: every doc emits its bigrams PLUS its
    // last token as (w, NULL) — every token occurrence is either some
    // bigram's w1 or its document's LAST token (single-token docs
    // included), so raw unigram counts are c(w) = Σ over all rows with
    // w1 = w (bigram rows and the NULL-w2 final rows alike) — exact
    // identity, map-side combined against the tiny type space.
    val countsAll = toks.select(
        explode(expr(
          """concat(
               CASE WHEN size(ws) >= 2 THEN transform(sequence(1, size(ws) - 1),
                 i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))
               ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>) END,
               array(struct(element_at(ws, -1) AS w1, CAST(NULL AS STRING) AS w2)))"""))
          .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .transform(graft.Caching.persistOnce(_))
    val localMax = session.conf
      .getOption("spark.graft.lm.localModelMaxTypes")
      .map(_.toInt).getOrElse(LmLocalModelMaxTypes)
    // probe-collect: one job materializes toks + countsAll; when the
    // type table fits under the cap, the collected rows ARE the full
    // aggregate and the model fit is pure driver-side arithmetic.
    val probe = countsAll.limit(localMax + 1).collect()
    if (probe.length <= localMax) {
      val (keepDf, termsDf) =
        lmModelLocal(session, probe.map(r =>
          (r.getString(0), if (r.isNullAt(1)) null else r.getString(1),
            r.getLong(2))), vocabCap)
      lmScore(bi, keepDf, broadcast(termsDf))
    } else {
      lmNllDistributed(countsAll, bi, vocabCap)
    }
  }

  /** Distributed model fit over the cached one-pass count aggregate —
    * the path an open 100 TB vocabulary takes. Joins only ever build
    * on vocabulary-bounded tables; the corpus-sized bigram stream is
    * re-touched exactly once (scoring).
    */
  private def lmNllDistributed(countsAll: DataFrame, bi: DataFrame,
                               vocabCap: Int): DataFrame = {
    val bcRaw = countsAll.filter(col("w2").isNotNull)
      .select(col("w1"), col("w2"), col("c").as("cb"))
    val uniRaw = countsAll.groupBy(col("w1").as("w")).agg(sum(col("c")).as("c"))
      .transform(graft.Caching.persistOnce(_))
    val keep = uniRaw.orderBy(col("c").desc, col("w").asc).limit(vocabCap)
      .select(col("w").as("kw"))
      .transform(graft.Caching.persistOnce(_))
    def fold(w: Column, kw: Column): Column =
      when(kw.isNull, lit(LmOovToken)).otherwise(w)
    // MAPPED unigram table, derived from the raw counts (dropped words
    // fold into one OOV row) — never re-touches the token stream.
    val uni = uniRaw.join(broadcast(keep), col("w") === col("kw"), "left")
      .select(fold(col("w"), col("kw")).as("w1"), col("c"))
      .groupBy("w1").agg(sum(col("c")).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    // mapped bigram-type counts + per-bigram smoothed NLL term — all
    // small-side work (the OOV fold runs on bigram TYPES, not the
    // corpus-sized occurrence stream).
    val cbM = bcRaw
      .join(broadcast(keep.select(col("kw").as("k1"))), col("w1") === col("k1"), "left")
      .join(broadcast(keep.select(col("kw").as("k2"))), col("w2") === col("k2"), "left")
      .select(fold(col("w1"), col("k1")).as("w1"),
        fold(col("w2"), col("k2")).as("w2"), col("cb"))
      .groupBy("w1", "w2").agg(sum(col("cb")).as("cb"))
    val terms = cbM.join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        floor(log((col("c1") + col("v")).cast("double") /
          (col("cb") + lit(1)).cast("double")) * lit(1e6)).cast("long").as("nll_micro"))
      .transform(graft.Caching.persistOnce(_))
    val lookup = if (terms.count() <= LmBroadcastCeiling) broadcast(terms) else terms
    lmScore(bi, keep, lookup)
  }

  /** Driver-side model fit from the collected one-pass counts: the
    * SAME arithmetic as [[lmNllDistributed]] on exact integers — keep
    * selection compares (count DESC, word ASC in UTF-8 BYTE order,
    * Spark's UTF8String binary sort), the NLL term is the identical
    * `Math.log` of the identical double division — so the two branches
    * are bit-identical (LmNllVocabCapSpec pins it). Returns the keep
    * set and the per-bigram term table as driver-local relations (no
    * jobs to build, no jobs to broadcast).
    */
  private def lmModelLocal(session: org.apache.spark.sql.SparkSession,
                           counts: Array[(String, String, Long)],
                           vocabCap: Int): (DataFrame, DataFrame) = {
    import scala.collection.mutable
    val uniRaw = mutable.HashMap.empty[String, Long]
    counts.foreach { case (w1, _, c) =>
      uniRaw.update(w1, uniRaw.getOrElse(w1, 0L) + c)
    }
    def byteLt(a: String, b: String): Boolean = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      x.length < y.length
    }
    val keep = uniRaw.toArray
      .sortWith((p, q) => p._2 > q._2 || (p._2 == q._2 && byteLt(p._1, q._1)))
      .take(vocabCap).map(_._1).toSet
    def fold(w: String): String = if (keep(w)) w else LmOovToken
    val uni = mutable.HashMap.empty[String, Long]
    uniRaw.foreach { case (w, c) =>
      val m = fold(w); uni.update(m, uni.getOrElse(m, 0L) + c)
    }
    val v = uni.size.toLong
    val cbM = mutable.HashMap.empty[(String, String), Long]
    counts.foreach { case (w1, w2, c) =>
      if (w2 != null) {
        val k = (fold(w1), fold(w2)); cbM.update(k, cbM.getOrElse(k, 0L) + c)
      }
    }
    val termRows = cbM.iterator.map { case ((w1, w2), cb) =>
      (w1, w2,
        math.floor(math.log((uni(w1) + v).toDouble / (cb + 1).toDouble) * 1e6).toLong)
    }.toSeq
    import session.implicits._
    (keep.toSeq.toDF("kw"), termRows.toDF("w1", "w2", "nll_micro"))
  }

  /** The scoring pass — the ONLY post-model pass over the bigram
    * stream: fold joins + term lookup stay in one whole-stage-codegen
    * span, and the per-doc aggregate map-side combines before its
    * exchange.
    */
  private def lmScore(bi: DataFrame, keep: DataFrame,
                      lookup: DataFrame): DataFrame = {
    def fold(w: Column, kw: Column): Column =
      when(kw.isNull, lit(LmOovToken)).otherwise(w)
    val biM = bi
      .join(broadcast(keep.select(col("kw").as("k1"))), col("w1") === col("k1"), "left")
      .join(broadcast(keep.select(col("kw").as("k2"))), col("w2") === col("k2"), "left")
      .select(col("doc_id"), fold(col("w1"), col("k1")).as("w1"),
        fold(col("w2"), col("k2")).as("w2"))
    biM.join(lookup, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_micro")).as("nll_micro_sum"))
      .withColumn("avg_nll",
        round(col("nll_micro_sum").cast("double") / lit(1e6) / col("n_bigrams"), 6))
      .orderBy("doc_id")
  }

  /** Shared WITH-chain of the bigram-LM DuckDB oracle, ending at
    * `agg(doc_id, n_bigrams, nll_micro_sum)` — reused verbatim by
    * doc_lm_nll and the CCNet bucket op so the two stay pinned to ONE
    * model definition (the uncapped model; the Spark-side top-V cap is
    * non-binding at oracle scale, LmNllVocabCapSpec).
    */
  private val lmNllOracleCtes: String =
    """WITH w AS (
               SELECT doc_id,
                      string_split(trim(regexp_replace(regexp_replace(lower(text),
                        '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ') AS ws
               FROM documents),
             tok AS (SELECT unnest(ws) AS w1 FROM w),
             uni AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM tok GROUP BY w1),
             v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
             bix AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM w),
             bi AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM bix),
             bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM bi GROUP BY w1, w2),
             agg AS (
               SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                      CAST(sum(CAST(floor(ln(CAST(c1 + v.v AS DOUBLE) /
                        CAST(cb + 1 AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT) AS nll_micro_sum
               FROM bi JOIN bc USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
               GROUP BY doc_id)"""

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------------
    // Exact dedup: group by content digest. Shuffle key = 32-byte
    // digest, map-side partial agg; at 100 TB this is one shuffle of
    // (digest, id) pairs.
    Q("doc_dedup_exact",
      (s, d) => {
        Tables.documents(s, d)
          .groupBy(md5(col("text")).as("digest"))
          .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc"))
          .orderBy("digest")
      },
      Some("""SELECT md5(text) AS digest, count(*) AS n_copies,
             min(doc_id) AS keep_doc
             FROM documents GROUP BY 1 ORDER BY digest""")),

    // ----------------------------------------------------------------
    // Normalized fingerprint (case/punctuation/whitespace-insensitive
    // content identity) — the "document fingerprinting" primitive.
    Q("doc_fingerprint",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs
          .select(col("doc_id"),
            md5(normSquash(docs)(lower(col("text")))).as("fingerprint"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                 ' +', ' ', 'g')) AS fingerprint
             FROM documents ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Corpus-LM quality score (the CCNet-style perplexity filter): a
    // bigram language model with add-one smoothing is fit ON the
    // corpus itself and each document is scored by its average
    // negative log-likelihood under it; high-NLL docs are the
    // gibberish/boilerplate tail a perplexity filter drops.
    // Determinism across engines: each bigram's NLL term is
    // ln((c1+V)/(cb+1)) of EXACT integers — one IEEE division and one
    // ln; the term is floored to integer micro-nats (a 1-ulp ln
    // divergence flips a floor only within ~1e-10 of a boundary), so
    // the aggregated sums compare exactly and avg_nll is a single
    // rounded division of exact integers. The vocabulary is capped at
    // top-V with an OOV fold (LmVocabCap, non-binding at oracle scale
    // — see docLmNll), so the oracle below is the uncapped model and
    // stays valid verbatim.
    Q("doc_lm_nll",
      (s, d) => docLmNll(Tables.documents(s, d)),
      Some(s"""$lmNllOracleCtes
             SELECT doc_id, n_bigrams, nll_micro_sum,
                    round(CAST(nll_micro_sum AS DOUBLE) / 1e6 / n_bigrams, 6) AS avg_nll
             FROM agg ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // CCNet-style quality buckets: per-LANGUAGE perplexity tertiles
    // (head = lowest avg NLL = most fluent; tail = the gibberish the
    // filter drops). Reuses the doc_lm_nll scoring pipeline, joins the
    // language column back, and assigns NTILE(3) per language ordered
    // by (avg_nll, doc_id) — the doc_id tiebreak makes the split
    // deterministic across engines. avg_nll is one IEEE division of
    // exact integers, so the ordering is engine-independent.
    // Scale note: ntile-per-language hashes each language to ONE
    // window partition — at 100 TB the production form replaces the
    // full per-lang sort with tertile CUTOFFS fit on a bounded
    // per-lang sample (the actual CCNet method) and a broadcast
    // cutoff join; the bucket semantics pinned here are identical.
    Q("doc_ccnet_buckets",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val wb = Window.partitionBy("lang").orderBy(col("avg_nll"), col("doc_id"))
        docLmNll(docs)
          .join(docs.select("doc_id", "lang"), "doc_id")
          .withColumn("tertile", ntile(3).over(wb))
          .select(col("doc_id"), col("lang"), col("avg_nll"), col("tertile"),
            when(col("tertile") === 1, "head")
              .when(col("tertile") === 2, "middle")
              .otherwise("tail").as("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""$lmNllOracleCtes,
             scored AS (
               SELECT a.doc_id, d.lang,
                      round(CAST(a.nll_micro_sum AS DOUBLE) / 1e6 / a.n_bigrams, 6) AS avg_nll
               FROM agg a JOIN documents d ON a.doc_id = d.doc_id)
             SELECT doc_id, lang, avg_nll,
                    CAST(ntile(3) OVER (PARTITION BY lang
                      ORDER BY avg_nll, doc_id) AS INT) AS tertile,
                    CASE ntile(3) OVER (PARTITION BY lang
                      ORDER BY avg_nll, doc_id)
                      WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
                    END AS bucket
             FROM scored ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the
    // MOSS local fingerprinting scheme): 5-word k-gram md5 hashes, and
    // from every window of 4 consecutive grams the MINIMUM hash is
    // selected — guaranteeing any shared run of ≥ 8 words contributes
    // at least one COMMON fingerprint while storing only ~2/(w+1) of
    // the grams. Hashes compare as md5 hex STRINGS (identical
    // lexicographic order on both engines, no numeric conversion).
    // The window minimum runs as a FRAME window over exploded grams,
    // not a nested array lambda (CollapseProject would inline the
    // gram transform into the per-window lambda — the shingles()
    // lesson). Together with the outer-generate workaround below,
    // 18.7 s → 1.5 s at sf0.1. One doc_id shuffle, frame min, and an
    // exchange-reusing aggregation.
    Q("doc_winnow_fingerprint",
      (s, d) => {
        val w4 = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
        val docs = Tables.documents(s, d)
        // gram hashes through the window_md5s_all kernel (duplicates
        // and positions preserved — winnowing needs the full gram
        // sequence): each 5-word window digested in place off the
        // normalized text as 16-byte BINARY, halving the exploded
        // window-shuffle payload vs hex strings. Binary min/max/
        // distinct order under Spark's unsigned-lexicographic
        // comparison equals the hex string order (hex is
        // order-preserving), so the winnow selection is unchanged;
        // hex spelling is restored only on the two emitted digests.
        graft.GraftExtensions.register(s)
        docs
          .select(col("doc_id"),
            call_function("window_md5s_all",
              trim(normSquash(docs)(lower(col("text")))), lit(5)).as("grams"))
          // OUTER posexplode, null rows dropped AFTER the Generate: a
          // plain posexplode makes InferFiltersFromGenerate push a
          // `size(grams) > 0` filter below the projection, where the
          // whole gram expression is INLINED multiple times (no CSE
          // across the Generate bound). The outer form infers
          // nothing; the null filter below runs on materialized
          // columns.
          .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
            posexplode_outer(col("grams")).as(Seq("pos", "g")))
          .filter(col("g").isNotNull)
          .withColumn("wmin", min(col("g")).over(w4))
          // one window per start position j = pos ≤ nG-4 (0-based; a
          // short doc keeps its single clamped window at pos 0)
          .filter(col("pos") <= greatest(col("n_grams") - 4, lit(0L)))
          .groupBy("doc_id")
          .agg(first(col("n_grams")).as("n_grams"),
            countDistinct(col("wmin")).as("n_fp"),
            min(col("wmin")).as("fp_min"),
            max(col("wmin")).as("fp_max"))
          .select(col("doc_id"), col("n_grams"), col("n_fp"),
            lower(hex(col("fp_min"))).as("fp_min"),
            lower(hex(col("fp_max"))).as("fp_max"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
               SELECT doc_id,
                      string_split(trim(regexp_replace(regexp_replace(lower(text),
                        '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ') AS ws
               FROM documents),
             g AS (SELECT doc_id,
                          CASE WHEN len(ws) >= 5
                               THEN [md5(list_aggregate(ws[i:i+4], 'string_agg', ' '))
                                     FOR i IN range(1, len(ws) - 3)]
                               ELSE [] END AS grams
                   FROM w),
             win AS (SELECT doc_id, grams,
                            list_distinct([list_min(grams[j:j+3])
                                           FOR j IN range(1, greatest(len(grams) - 2, 2))]) AS fps
                     FROM g WHERE len(grams) >= 1)
             SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
                    CAST(len(fps) AS BIGINT) AS n_fp,
                    list_min(fps) AS fp_min, list_max(fps) AS fp_max
             FROM win ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Duplication-rate dashboard by source: share of each source's
    // docs whose normalized fingerprint occurs more than once
    // CORPUS-WIDE (a crawl-quality triage view — which feeds are
    // copying whom). Two aggregations: fingerprint occurrence counts
    // (shuffle keyed by digest, map-side combined), then per-source
    // rates; the ratio divides two exact longs in double and rounds.
    Q("doc_dup_rate_by_source",
      (s, d) => {
        // One text scan only: the naive fp-join-counts form evaluates
        // the fingerprint (two regex passes + md5 over the FULL text)
        // on BOTH sides of the self-join — the round-11 100× sweep
        // measured it as a double-pay 82 s linear wall. Aggregating to
        // (fingerprint, source) first collapses the data to ≤ one row
        // per distinct pair before any join; the occurrence total then
        // joins two already-tiny aggregates on the 32-byte digest.
        val docs = Tables.documents(s, d)
        val perFs = docs
          .select(col("source"),
            md5(normSquash(docs)(lower(col("text")))).as("fingerprint"))
          .groupBy("fingerprint", "source").agg(count(lit(1)).as("cnt"))
        val occ = perFs.groupBy("fingerprint").agg(sum(col("cnt")).as("occ"))
        perFs.join(occ, "fingerprint")
          .groupBy("source")
          .agg(sum(col("cnt")).as("n_docs"),
            sum(when(col("occ") > 1, col("cnt")).otherwise(lit(0))).as("n_dup"),
            round(sum(when(col("occ") > 1, col("cnt")).otherwise(lit(0))).cast("double") /
              sum(col("cnt")), 6).as("dup_rate"))
          .orderBy("source")
      },
      Some("""WITH fp AS (
               SELECT doc_id, source,
                      md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                          ' +', ' ', 'g')) AS fingerprint
               FROM documents),
             counts AS (SELECT fingerprint, count(*) AS occ FROM fp GROUP BY fingerprint)
             SELECT source, count(*) AS n_docs,
                    count(CASE WHEN occ > 1 THEN 1 END) AS n_dup,
                    round(CAST(count(CASE WHEN occ > 1 THEN 1 END) AS DOUBLE) / count(*), 6) AS dup_rate
             FROM fp JOIN counts USING (fingerprint)
             GROUP BY source ORDER BY source""")),

    // ----------------------------------------------------------------
    // Corpus stats per (lang, source): doc counts, exact char sums,
    // word totals — the partition-level quality dashboard query.
    Q("doc_text_stats",
      (s, d) => {
        Tables.documents(s, d)
          .withColumn("n_words", size(split(col("text"), " ")))
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"),
               sum(col("n_chars")).as("total_chars"),
               sum(col("n_words")).as("total_words"),
               max(col("n_chars")).as("max_chars"))
          .orderBy("lang", "source")
      },
      Some("""SELECT lang, source, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_words,
             max(n_chars) AS max_chars
             FROM documents GROUP BY lang, source ORDER BY lang, source""")),

    // ----------------------------------------------------------------
    // Per-document quality scoring: token count (regex tokenizer),
    // stopword ratio, mean token length — length/punct/stopword
    // heuristics of LLM-corpus filtering, all integer-exact or
    // single-division doubles (engine-identical).
    Q("doc_quality",
      (s, d) => {
        Tables.documents(s, d)
          .withColumn("toks", expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
          .withColumn("n_tok", size(col("toks")))
          .withColumn("n_stop", size(expr(
            "filter(toks, w -> w IN ('the','a','and','of','in'))")))
          .withColumn("alpha_chars", aggregate(col("toks"), lit(0),
            (acc, w) => acc + length(w)))
          .select(col("doc_id"), col("n_tok"), col("n_stop"),
            round(col("n_stop").cast("double") / col("n_tok"), 6).as("stop_ratio"),
            round(col("alpha_chars").cast("double") / col("n_tok"), 6).as("mean_tok_len"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             len(toks) AS n_tok,
             len(list_filter(toks, w -> w IN ('the','a','and','of','in'))) AS n_stop,
             round(CAST(len(list_filter(toks, w -> w IN ('the','a','and','of','in'))) AS DOUBLE)
                   / len(toks), 6) AS stop_ratio,
             round(CAST(list_sum(list_transform(toks, w -> len(w))) AS DOUBLE)
                   / len(toks), 6) AS mean_tok_len
             FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
                   FROM documents)
             ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Gopher-style rule filter (Rae et al. 2021 §A1.1, the repetition
    // rules living separately in doc_repetition): five named
    // quality-gate rules with per-rule booleans plus the combined
    // keep verdict — the form a corpus pipeline actually materializes,
    // so drops are ATTRIBUTABLE to a rule rather than a single opaque
    // score (doc_quality emits the raw ratios; this op emits the
    // decisions). All signals are integer counts or one IEEE division
    // of exact integers — engine-identical. Scan-shaped: per-row map +
    // presentation sort, no shuffle beyond the orderBy.
    Q("doc_gopher_rules",
      (s, d) => {
        gopherRuleCols(Tables.documents(s, d))
          .select("doc_id", "n_words", "r_word_count", "r_mean_len",
            "r_symbol", "r_alpha", "r_stopwords", "keep")
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
               SELECT doc_id, text,
                      regexp_extract_all(lower(text), '[^ ]+') AS words
               FROM documents),
             m AS (
               SELECT doc_id,
                      len(words) AS n_words,
                      list_sum(list_transform(words, x -> len(x))) AS sum_len,
                      len(list_filter(words, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
                      (len(text) - len(replace(text, '#', ''))) +
                        (len(text) - len(regexp_replace(text, '\.\.\.', '', 'g'))) / 3 AS n_sym,
                      len(list_intersect(words,
                        ['the','be','to','of','and','that','have','with'])) AS n_stop_distinct
               FROM w)
             SELECT doc_id, CAST(n_words AS INT) AS n_words,
                    (n_words >= 50 AND n_words <= 100000) AS r_word_count,
                    (n_words > 0 AND
                     CAST(sum_len AS DOUBLE) / n_words >= 3.0 AND
                     CAST(sum_len AS DOUBLE) / n_words <= 10.0) AS r_mean_len,
                    (n_words > 0 AND
                     CAST(n_sym AS DOUBLE) / n_words <= 0.1) AS r_symbol,
                    (n_words > 0 AND
                     CAST(n_alpha AS DOUBLE) / n_words >= 0.8) AS r_alpha,
                    (n_stop_distinct >= 2) AS r_stopwords,
                    (n_words >= 50 AND n_words <= 100000 AND
                     CAST(sum_len AS DOUBLE) / n_words >= 3.0 AND
                     CAST(sum_len AS DOUBLE) / n_words <= 10.0 AND
                     CAST(n_sym AS DOUBLE) / n_words <= 0.1 AND
                     CAST(n_alpha AS DOUBLE) / n_words >= 0.8 AND
                     n_stop_distinct >= 2) AS keep
             FROM m ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Language ID, n-gram/stopword-vote heuristic: score each language
    // family by marker-word hits, argmax with deterministic tie-break.
    // (The heuristic itself is the operator under test — the oracle
    // runs the same spec, not ground truth.)
    Q("doc_langid",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("ws", split(lower(col("text")), " "))
        val score = (marks: Seq[String]) =>
          size(expr(s"filter(ws, w -> w IN (${marks.map(m => s"'$m'").mkString(",")}))"))
        docs
          .withColumn("s_en", score(Seq("the", "a", "and", "of")))
          .withColumn("s_es", score(Seq("el", "la", "de", "y")))
          .withColumn("s_de", score(Seq("der", "die", "und", "das")))
          .select(col("doc_id"),
            when(col("s_es") > col("s_en") && col("s_es") > col("s_de"), "es")
              .when(col("s_de") > col("s_en") && col("s_de") > col("s_es"), "de")
              .otherwise("en").as("lang_guess"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             CASE WHEN s_es > s_en AND s_es > s_de THEN 'es'
                  WHEN s_de > s_en AND s_de > s_es THEN 'de'
                  ELSE 'en' END AS lang_guess
             FROM (SELECT doc_id,
                     len(list_filter(ws, w -> w IN ('the','a','and','of'))) AS s_en,
                     len(list_filter(ws, w -> w IN ('el','la','de','y'))) AS s_es,
                     len(list_filter(ws, w -> w IN ('der','die','und','das'))) AS s_de
                   FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
                         FROM documents))
             ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Near-dup, exact form: 3-shingle Jaccard ≥ 0.8 through the
    // inverted index (no all-pairs on the Spark side).
    Q("doc_ngram_jaccard",
      (s, d) => exactJaccardPairs(Tables.documents(s, d), 0.8),
      Some(exactJaccardSql(0.8))),

    // ----------------------------------------------------------------
    // Near-dup, MinHash-LSH form: 64 minhashes over 3-shingles, 16
    // bands × 4 rows → candidate buckets → exact-Jaccard verification
    // of candidates only. At Jaccard ≥ 0.8 the 16×4 banding has
    // ≥ 0.9998 recall, so the verified output equals the exact form —
    // and shares its oracle. Candidate generation shuffles
    // O(docs × 16 bands), the verify join touches only candidates.
    Q("doc_minhash_lsh",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.GraftExtensions.register(s)
        val sh = shingles(docs).transform(graft.Caching.persistOnce(_))
        // All 64 minhashes + 16 band signatures in ONE fused codegen
        // loop over the shingle array ([[graft.functions
        // .MinHashBandSigs]]): each shingle's bytes are hashed once
        // and the per-seed values derive by splitmix64 mixing. The
        // earlier wide-agg form exploded (doc, shingle) rows and
        // hashed each shingle 64× through fresh concats — correct,
        // but it shuffled every shingle occurrence and did 64× the
        // hash work; nothing per-shingle is shuffled here at all.
        // (Hash family changed by the fusion — harmless: candidates
        // are re-verified with exact Jaccard below, so the OUTPUT is
        // hash-family-independent; recall bound unchanged at 16×4.)
        val banded = sh.select(col("doc_id"),
            posexplode(call_function("minhash_band_sigs",
              col("sh"), lit(16), lit(4))).as(Seq("band", "sig")))
          // persisted: the bucket self-join would recompute the
          // signature pass once per side otherwise.
          .transform(graft.Caching.persistOnce(_))
        val candidates = banded.as("x").join(banded.as("y"), Seq("band", "sig"))
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        // Verify candidates with exact Jaccard on the shingle sets.
        // No broadcast hint: the shingle-set table is O(corpus); the
        // candidate side is the small one and AQE picks the build side.
        val setsA = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("n_a"))
        val setsB = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("n_b"))
        candidates.join(setsA, "doc_a").join(setsB, "doc_b")
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
          .withColumn("jaccard",
            round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 6))
          .filter(col("jaccard") >= 0.8)
          .select("doc_a", "doc_b", "jaccard")
          .orderBy("doc_a", "doc_b")
      },
      Some(exactJaccardSql(0.8))),

    // ----------------------------------------------------------------
    // SimHash near-dup sketch. 64-bit simhash from per-token bit
    // votes; near-dups = hamming distance ≤ 6 among docs sharing a
    // 16-bit chunk (chunk-bucketing avoids all-pairs; pigeonhole over
    // 4 chunks covers distance ≤ 6 incompletely but deterministically
    // — the standard production trade).
    //
    // The token hash is the md5 hex prefix, digit-sliced: bit j of the
    // sketch comes from bit (j mod 4) of hex digit (j div 4). md5 is
    // the one 64-bit-capable hash Spark and DuckDB compute identically
    // (xxhash64 exists only on the Spark side), which is what makes
    // this operator ORACLE-CHECKABLE — the hash choice is a pluggable
    // constant; the verified machinery is the vote aggregation,
    // chunk bucketing, and hamming filter. The sketch lives in four
    // 16-bit chunk ints rather than one signed 64-bit value so the
    // oracle needs no 1<<63 overflow gymnastics on the DuckDB side.
    Q("doc_simhash",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.GraftExtensions.register(s)
        // All 64 ±1 vote sums in ONE codegen pass over the text bytes
        // ([[graft.functions.SimHashVotes]] — bit-identical to the
        // explode→md5→16×conv→64-sum spelling the oracle keeps, see
        // that file's exactness argument). The operator is now a pure
        // per-row map: no token explosion, no hex-string
        // materialization, and NO aggregation at all before chunk
        // bucketing — the groupBy this replaced shuffled (doc_id,
        // 64 longs) per doc; element 65 (token count) reproduces the
        // explode→groupBy behavior of dropping zero-token docs.
        val perDoc = docs
          .select(col("doc_id"),
            call_function("simhash_votes", lower(col("text"))).as("v"))
          .filter(element_at(col("v"), 65) > 0)
          .select(col("doc_id") +:
            (0 until 64).map(j => element_at(col("v"), j + 1).as(s"s$j")): _*)
        def chunkExpr(c: Int): String = (0 until 16).map { k =>
          s"CASE WHEN s${c * 16 + k} > 0 THEN ${1 << k} ELSE 0 END"
        }.mkString(" + ")
        val sims = perDoc.selectExpr(
          "doc_id" +: (0 until 4).map(c => s"(${chunkExpr(c)}) AS c$c"): _*)
        // bucket by 16-bit chunks, pair within bucket, hamming ≤ 6
        val chunks = sims.select(col("doc_id"), col("c0"), col("c1"), col("c2"),
          col("c3"), posexplode(array(col("c0"), col("c1"), col("c2"), col("c3")))
            .as(Seq("c", "chunk")))
        val hamming = (0 until 4).map(i =>
          bit_count(expr(s"x.c$i ^ y.c$i"))).reduce(_ + _).cast("int")
        chunks.as("x").join(chunks.as("y"), Seq("c", "chunk"))
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
            hamming.as("hamming"))
          .distinct()
          .filter(col("hamming") <= 6)
          .orderBy("doc_a", "doc_b")
      },
      Some(simhashOracleSql)),

    // ----------------------------------------------------------------
    // Near-dup CLUSTERS: connected components over the Jaccard ≥ 0.8
    // pair graph, label = min doc_id = the canonical survivor — the
    // "apply the dedup" step after pair detection. The oracle computes
    // the same components via a recursive-CTE transitive closure
    // (affordable at sf0.01 only — again the oracle as semantic spec,
    // the Spark loop as the scale path).
    Q("doc_neardup_clusters",
      (s, d) => nearDupClusters(s,
        exactJaccardPairs(Tables.documents(s, d), 0.8)),
      Some(s"""${shingleSqlCte.replaceFirst("WITH", "WITH RECURSIVE")},
             pairs AS (
               SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM sh a JOIN sh b ON a.doc_id < b.doc_id
               WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                           len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.8),
             sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                     UNION SELECT doc_b, doc_a FROM pairs),
             reach(a, b) AS (
               SELECT a, b FROM sym
               UNION
               SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
               WHERE s.b <> r.a)
             SELECT a AS doc_id,
                    least(a, min(b)) AS cluster_id,
                    (a = least(a, min(b))) AS is_canonical
             FROM reach GROUP BY a ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Intra-document repetition (Gopher-style quality signal): the
    // fraction of word 2-grams that are repeats of an earlier 2-gram
    // in the SAME document. Pure per-row map — no shuffle at all, the
    // 2-gram list never leaves its row.
    Q("doc_repetition",
      (s, d) => {
        graft.GraftExtensions.register(s)
        // Total 2-gram count is just the SPACE count (nWords − 1 =
        // windows, 0 under 2 words — two length builtins, no array);
        // the distinct count comes off the window_md5s digest kernel
        // (digest distinctness == string distinctness, see that
        // file). The HOF gram build + per-row array_distinct over
        // 2-gram strings this replaces was 13 s of pure scan CPU at
        // the 100× slice for an operator that shuffles nothing.
        Tables.documents(s, d)
          .select(col("doc_id"), lower(col("text")).as("t"))
          .select(col("doc_id"),
            (length(col("t")) - length(replace(col("t"), lit(" "), lit(""))))
              .cast("long").as("n_2grams"),
            size(call_function("window_md5s", col("t"), lit(2)))
              .cast("long").as("n_distinct"))
          .select(col("doc_id"), col("n_2grams"), col("n_distinct"),
            when(col("n_2grams") > 0,
              round(lit(1.0) - col("n_distinct").cast("double")
                / col("n_2grams"), 6)).otherwise(lit(0.0)).as("rep_ratio"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             CAST(len(g2) AS BIGINT) AS n_2grams,
             CAST(len(list_distinct(g2)) AS BIGINT) AS n_distinct,
             CASE WHEN len(g2) > 0
                  THEN round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6)
                  ELSE 0.0 END AS rep_ratio
             FROM (SELECT doc_id,
                          [ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))] AS g2
                   FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
                         FROM documents))
             ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Token counting with a BPE-ish tokenizer regex (letter runs,
    // digit runs, single other non-space chars) — the pre-training
    // "how many tokens is this corpus" pass. Per-row map, integer
    // exact; density is the one rounded division.
    Q("doc_token_count",
      (s, d) => {
        // token counting via the count_tokens codegen kernel — the
        // regex spelling materialized a match list whose only
        // consumer was size() (see CountTokens; the oracle keeps the
        // regex spelling)
        graft.GraftExtensions.register(s)
        Tables.documents(s, d)
          .withColumn("n_tokens",
            call_function("count_tokens", lower(col("text"))).cast("long"))
          .select(col("doc_id"), col("n_tokens"),
            round(col("n_tokens").cast("double") * 100 / col("n_chars"), 6)
              .as("tokens_per_100_chars"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
             round(CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS DOUBLE) * 100
                   / n_chars, 6) AS tokens_per_100_chars
             FROM documents ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Corpus vocabulary top-k: global token frequencies, top 20 with
    // deterministic tie-break. The classic wordcount shape — explode →
    // partial-agg (map-side combine) → final agg on the token key →
    // TakeOrderedAndProject; the shuffle carries (token, partial
    // count), never document text.
    Q("doc_vocab_topk",
      (s, d) => {
        Tables.documents(s, d)
          .select(explode(expr(
            "regexp_extract_all(lower(text), '[a-z]+', 0)")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("token").asc)
          .limit(20)
      },
      Some("""SELECT token, CAST(count(*) AS BIGINT) AS cnt
             FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
                   FROM documents)
             GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20""")),

    // ----------------------------------------------------------------
    // Benchmark decontamination: flag corpus documents sharing any
    // 8-word-gram with a held-out benchmark set (here the
    // deterministic doc_id % 7 == 0 slice stands in for the benchmark
    // suite) and count the distinct leaked grams per document — the
    // standard pre-training "did eval data leak into train" pass.
    // Scale: the shuffle key is the 8-gram; in production the
    // benchmark side is a bounded eval suite (a natural broadcast —
    // AQE picks that up on its own, no hint needed), and the corpus
    // side streams through the join; per-doc gram lists never
    // materialize cross-row.
    Q("doc_decontaminate",
      (s, d) => {
        graft.GraftExtensions.register(s)
        // persisted: the benchmark and corpus branches both read the
        // 8-gram projection — one computation, not one per branch.
        // Grams live as window_md5s 16-byte digests (digest equality
        // == gram equality, see that file): the equi-join and the
        // benchmark distinct key on digests instead of ~50-byte
        // 8-gram strings, and the HOF gram build leaves the scan.
        val docs = Tables.documents(s, d)
          .select(col("doc_id"),
            call_function("window_md5s", lower(col("text")), lit(8)).as("g8"))
          .transform(graft.Caching.persistOnce(_))
        val bench = docs.filter(col("doc_id") % 7 === 0)
          .select(explode(col("g8")).as("g")).distinct()
        val corpus = docs.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), explode(col("g8")).as("g"))
        corpus.join(bench, "g")
          .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                         FROM documents),
             sh AS (SELECT doc_id,
                           CASE WHEN len(ws) >= 8
                                THEN list_distinct([list_aggregate(ws[i:i+7], 'string_agg', ' ')
                                                    FOR i IN range(1, len(ws) - 6)])
                                ELSE [] END AS s
                    FROM w),
             bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 7 = 0),
             corpus AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 7 <> 0)
             SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
             FROM corpus WHERE g IN (SELECT g FROM bench)
             GROUP BY doc_id ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Bloom-filter decontamination — the SCALE path for the op above.
    // The exact form joins the corpus gram stream against the benchmark
    // gram SET; at 100 TB the right plan replaces that set with a
    // Bloom filter a few MB wide that every executor holds. This
    // implementation builds the bloom AS RELATIONAL DATA so the whole
    // construction replays in the oracle: k=4 positions per gram, each
    // the first-6-hex-digit value of md5(gram || '#' || salt) (m =
    // 16^6 ≈ 16.8M addressable bits ≈ 2 MB as a real bitset); the
    // filter is the distinct position set of the benchmark grams, and
    // a corpus gram "hits" iff ALL 4 of its positions are present —
    // Bloom semantics exactly: zero false negatives (always ⊇ the
    // exact doc_decontaminate hits), false positives only from 4-way
    // position collisions (≈(fill)^4 ≈ 1e-5 here). Plan shape: the
    // position table is benchmark-bounded → broadcast-hash-join; the
    // ×4-salted corpus gram stream stays in one codegen span through
    // the probe and only SURVIVING rows shuffle (keyed (doc_id, g),
    // then doc_id — both map-side combined). Deterministic: md5 on
    // both engines, no engine-private bloom internals.
    Q("doc_decontaminate_bloom",
      (s, d) => {
        // gram build + position hashing fused into the
        // window_bloom_positions codegen kernel: the declarative
        // spelling paid the HOF gram build plus FOUR
        // md5/concat/conv round-trips per gram row (~106 M at the
        // 100× slice); the kernel digests each distinct window in
        // place off lower(text) and reads the position from the
        // digest's top 3 bytes — bit-identical to bloomPos (which the
        // streaming gate and the oracle keep). Grams never
        // materialize as strings: the per-doc window INDEX (gi =
        // flat-position div 4, a bijection with the distinct gram
        // per doc) replaces `g` as the k-hit group key.
        graft.GraftExtensions.register(s)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"),
            call_function("window_bloom_positions", lower(col("text")), lit(8))
              .as("ps"))
          .transform(graft.Caching.persistOnce(_))
        // The position relation is bounded by the bloom SPACE, not the
        // benchmark: ≤ m = 16^6 ≈ 16.7 M distinct longs no matter how
        // large the benchmark grows — the fixed-m property that makes
        // a Bloom filter a filter. Broadcast unconditionally (worst
        // case ~250 MB HashedRelation) so the corpus gram stream is
        // probe-only at any scale; without the hint the 100× slice
        // fell to a sort-merge join that exchanged all ~106 M
        // high-entropy (doc_id, gi, pos) rows (1.5 GB shuffle).
        val benchPos = broadcast(docs.filter(col("doc_id") % 7 === 0)
          .select(explode(col("ps")).as("pos")).distinct())
        val corpus = docs.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), posexplode(col("ps")).as(Seq("i", "pos")))
          .select(col("doc_id"), (col("i") / 4).cast("int").as("gi"), col("pos"))
        corpus.join(benchPos, "pos")
          .groupBy("doc_id", "gi").agg(count(lit(1)).as("k_hit"))
          .filter(col("k_hit") === 4)
          .groupBy("doc_id").agg(count(lit(1)).as("n_bloom_hits"))
          .orderBy("doc_id")
      },
      Some {
        val hexVal = (1 to 6).map(i =>
          s"(strpos('0123456789abcdef', substring(h, $i, 1)) - 1) * ${math.pow(16, 6 - i).toLong}")
          .mkString(" + ")
        s"""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                         FROM documents),
             sh AS (SELECT doc_id,
                           CASE WHEN len(ws) >= 8
                                THEN list_distinct([list_aggregate(ws[i:i+7], 'string_agg', ' ')
                                                    FOR i IN range(1, len(ws) - 6)])
                                ELSE [] END AS s
                    FROM w),
             salts AS (SELECT unnest([0, 1, 2, 3]) AS j),
             bg AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 7 = 0),
             bh AS (SELECT md5(g || '#' || CAST(j AS VARCHAR)) AS h FROM bg, salts),
             bp AS (SELECT DISTINCT CAST($hexVal AS BIGINT) AS pos FROM bh),
             cg AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 7 <> 0),
             ch AS (SELECT doc_id, g, md5(g || '#' || CAST(j AS VARCHAR)) AS h
                    FROM cg, salts),
             cp AS (SELECT doc_id, g, CAST($hexVal AS BIGINT) AS pos FROM ch),
             hit AS (SELECT doc_id, g FROM cp JOIN bp USING (pos)
                     GROUP BY doc_id, g HAVING count(*) = 4)
             SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bloom_hits
             FROM hit GROUP BY doc_id ORDER BY doc_id"""
      }),

    // ----------------------------------------------------------------
    // Cross-document long-substring dedup (the Lee et al.
    // "Deduplicating Training Data Makes Language Models Better"
    // signal, at word-gram granularity): flag documents sharing any
    // 12-word span with ANOTHER document, with the count of shared
    // spans and the worst span's document frequency. A full
    // distributed suffix array is the exact form; gram-granular
    // detection is the standard practical approximation and uses the
    // same shuffle shape. Scale: the join key is md5(gram) — a fixed
    // 32-byte shuffle key regardless of span length; per-doc gram
    // lists never leave their row before the explode; the df side is
    // map-side-combined. Grams are persisted once — the df branch and
    // the per-doc branch read ONE computation.
    Q("doc_substring_dedup",
      (s, d) => {
        // gram construction runs through the window_md5s codegen
        // kernel: each 12-word window is a contiguous byte range of
        // lower(text) (join(split(x,' '),' ') == x), digested as
        // 16-byte BINARY — no per-window string build, digests ship
        // at half the hex spelling's bytes. See WindowMd5s for the
        // exactness argument; the oracle keeps the string-built md5.
        graft.GraftExtensions.register(s)
        val grams = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(call_function("window_md5s", lower(col("text")), lit(12)))
              .as("g"))
          .transform(graft.Caching.persistOnce(_))
        // grams are distinct per doc, so count(*) per gram = doc freq
        val df = grams.groupBy("g").agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2)
        grams.join(df, "g")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shared_grams"), max(col("df")).as("max_gram_df"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                         FROM documents),
             sh AS (SELECT doc_id,
                           CASE WHEN len(ws) >= 12
                                THEN list_distinct([md5(list_aggregate(ws[i:i+11], 'string_agg', ' '))
                                                    FOR i IN range(1, len(ws) - 10)])
                                ELSE [] END AS s
                    FROM w),
             g AS (SELECT doc_id, unnest(s) AS g FROM sh),
             df AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM g
                    GROUP BY g HAVING count(*) >= 2)
             SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams,
                    max(df.df) AS max_gram_df
             FROM g JOIN df USING (g) GROUP BY doc_id ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Blocked fuzzy matching (record-linkage shape): normalize, block
    // on the 16-char normalized prefix, and compute LEVENSHTEIN edit
    // distance within blocks only — the classic blocking-key pattern
    // that keeps edit distance (quadratic per pair, O(n²) all-pairs)
    // feasible at corpus scale: one shuffle on the block key, in-block
    // pair loops bounded by block size. Complements the shingle-based
    // near-dup family with the character-level similarity measure
    // dedup pipelines use for titles/URLs/short fields. Spark's
    // levenshtein() and DuckDB's are both the textbook unit-cost DP —
    // identical distances.
    //
    // BLOCK-SIZE CEILING (the 100 TB guard): a skewed block — shared
    // boilerplate prefix, or short/empty norms all hashing to one key —
    // would send the in-block pair loop quadratic at exactly the
    // corpora this operator targets. Deterministic two-stage bound:
    // blocks over [[TextDedupQueries.FuzzyBlockCap]] rows REFINE their
    // key with the next 16 normalized chars (17-32); blocks STILL over
    // the cap after refinement are dropped from pairing (the PPJoin-
    // style drop-and-log escape — such rows are better served by the
    // shingle/MinHash family, which handles shared prefixes natively).
    // Both stages are count-aggregate + join, so the whole bound costs
    // two extra map-side-combined aggregations and stays one linear
    // shuffle shape; the per-task pair loop is ≤ cap²/2 regardless of
    // corpus skew. The oracle replays the identical two-stage rule.
    Q("doc_fuzzy_match",
      (s, d) => {
        val cap = TextDedupQueries.FuzzyBlockCap
        // persist: b's lineage (the two-regex normalization over the
        // full text, 17 s of the 97 s wall at the 100× slice) feeds
        // c1 AND keyed, and keyed feeds c2 AND bounded — uncached,
        // the optimizer re-derives the normalization FOUR times
        // (FuzzyProfile: 64 s of the stage walls; the in-block
        // levenshtein is negligible — 74 k pairs)
        val docs = Tables.documents(s, d)
        val b = docs
          .select(col("doc_id"),
            normSquash(docs)(lower(col("text"))).as("norm"))
          .select(col("doc_id"), substring(col("norm"), 1, 80).as("pre"),
            substring(col("norm"), 1, 16).as("k1"),
            substring(col("norm"), 17, 16).as("k2"))
          .transform(graft.Caching.persistOnce(_))
        val c1 = b.groupBy("k1").agg(count(lit(1)).as("c1"))
        val keyed = b.join(c1, "k1")
          .withColumn("blk", when(col("c1") > cap,
            concat(col("k1"), lit("|"), col("k2"))).otherwise(col("k1")))
          .select(col("doc_id"), col("pre"), col("blk"))
        val c2 = keyed.groupBy("blk").agg(count(lit(1)).as("c2"))
        val bounded = keyed.join(c2, "blk").filter(col("c2") <= cap)
          .select(col("doc_id"), col("pre"), col("blk"))
        // Per-block pair loop as a typed flatMap over collected
        // blocks, not a self-join: no pair ever becomes a join row,
        // and the distance is UTF8String.levenshteinDistance with
        // threshold — the builtin's own banded early-abandon
        // implementation, so survivors are value-identical to the
        // oracle's full levenshtein. Blocks are ≤ cap members by
        // construction and fully distributed (no broadcast, no driver
        // collect — one groupBy of (doc_id, 80-byte prefix)).
        // Ascending-id nested loop ⇒ doc_a < doc_b. (The 100× profile
        // put the pair work itself at ~74 k pairs — negligible; the
        // wall was the uncached normalization above.)
        import s.implicits._
        bounded.groupBy("blk")
          .agg(collect_list(struct(col("doc_id"), col("pre"))).as("ms"))
          .select(col("ms")).as[Seq[(Long, String)]]
          .flatMap { ms =>
            val sorted = ms.sortBy(_._1).toArray
            val pres = sorted.map(m =>
              org.apache.spark.unsafe.types.UTF8String.fromString(m._2))
            for {
              i <- sorted.indices.iterator
              j <- (i + 1) until sorted.length
              d = pres(i).levenshteinDistance(pres(j), 10)
              if d >= 0 && d <= 10
            } yield (sorted(i)._1, sorted(j)._1, d.toLong)
          }
          .toDF("doc_a", "doc_b", "edit_dist")
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH n AS (
               SELECT doc_id,
                      regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g') AS norm
               FROM documents),
             b AS (SELECT doc_id, substr(norm, 1, 80) AS pre,
                          substr(norm, 1, 16) AS k1, substr(norm, 17, 16) AS k2 FROM n),
             c1 AS (SELECT k1, count(*) AS c1 FROM b GROUP BY k1),
             k AS (SELECT b.doc_id, b.pre,
                          CASE WHEN c1.c1 > 256 THEN b.k1 || '|' || b.k2 ELSE b.k1 END AS blk
                   FROM b JOIN c1 USING (k1)),
             c2 AS (SELECT blk, count(*) AS c2 FROM k GROUP BY blk),
             kb AS (SELECT k.doc_id, k.pre, k.blk FROM k JOIN c2 USING (blk) WHERE c2.c2 <= 256)
             SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                    CAST(levenshtein(x.pre, y.pre) AS BIGINT) AS edit_dist
             FROM kb x JOIN kb y ON x.blk = y.blk AND x.doc_id < y.doc_id
             WHERE levenshtein(x.pre, y.pre) <= 10
             ORDER BY doc_a, doc_b""")),

    // ----------------------------------------------------------------
    // Source mixing weights: per-source token mass → sampling weight
    // under the standard temperature rule (alpha = 0.5: weight ∝
    // sqrt(tokens), flattening the source distribution the way
    // multilingual/multi-corpus pre-training mixes do). Determinism
    // across engines: per-source token counts are exact integer sums;
    // sqrt is one IEEE op on an integer-valued double; the rounded
    // weights become DECIMAL(18,6) so the normalization constant is an
    // EXACT sum (a raw double sum over sources would be
    // accumulation-order-dependent and break the hash compare).
    // Scale: one map-side-combined aggregation by source + a 20-row
    // broadcast of the totals.
    Q("doc_mixing_weights",
      (s, d) => {
        graft.GraftExtensions.register(s)
        val tok = Tables.documents(s, d)
          .select(col("source"),
            call_function("count_tokens", lower(col("text")))
              .cast("long").as("n"))
        val per = tok.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"),
            round(sqrt(sum(col("n")).cast("double")), 6)
              .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("w"))
        val totals = per.agg(
          sum(col("n_tokens")).cast("double").as("tot_tokens"),
          sum(col("w")).cast("double").as("tot_w"))
        per.crossJoin(broadcast(totals))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            round(col("n_tokens").cast("double") / col("tot_tokens"), 6).as("token_share"),
            round(col("w").cast("double") / col("tot_w"), 6).as("mix_weight"))
          .orderBy("source")
      },
      Some("""WITH tok AS (
               SELECT source,
                      CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n
               FROM documents),
             per AS (
               SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(n) AS BIGINT) AS n_tokens,
                      CAST(round(sqrt(CAST(sum(n) AS DOUBLE)), 6) AS DECIMAL(18,6)) AS w
               FROM tok GROUP BY source)
             SELECT source, n_docs, n_tokens,
                    round(CAST(n_tokens AS DOUBLE) / (SELECT CAST(sum(n_tokens) AS DOUBLE) FROM per), 6) AS token_share,
                    round(CAST(w AS DOUBLE) / (SELECT CAST(sum(w) AS DOUBLE) FROM per), 6) AS mix_weight
             FROM per ORDER BY source""")),

    // ----------------------------------------------------------------
    // PII scrubbing: redact emails and phone numbers (regex forms
    // shared verbatim by Java regex and DuckDB's RE2). Pure per-row
    // map. The driver corpus contains no PII, so the oracle checks
    // exact passthrough; PiiScrubSpec plants PII and asserts the
    // redactions.
    Q("doc_pii_scrub",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"),
            regexp_replace(
              regexp_replace(col("text"),
                lit(PiiPatterns.email), lit("<EMAIL>")),
              lit(PiiPatterns.phone), lit("<PHONE>")).as("scrubbed"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
             regexp_replace(regexp_replace(text,
               '${PiiPatterns.email}', '<EMAIL>', 'g'),
               '${PiiPatterns.phone}', '<PHONE>', 'g') AS scrubbed
             FROM documents ORDER BY doc_id"""))
  )
}

/** Redaction regexes restricted to the Java-regex ∩ RE2 common
  * subset (no lookaround, no backrefs) so the Spark plan and the
  * DuckDB oracle run literally the same pattern.
  */
object PiiPatterns {
  val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val phone = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
}
