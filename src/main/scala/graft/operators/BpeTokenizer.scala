package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned-vocabulary byte-pair-encoding tokenization (Sennrich et
  * al. 2016, arXiv:1508.07909) — the real-token-count upgrade over
  * the regex proxy (doc_token_count): sequence-packing budgets and
  * mixture weights are only as accurate as the token counts, and real
  * pipelines count under a TRAINED vocabulary.
  *
  * Training is fully relational and engine-replayable:
  *  - the corpus collapses to the distinct-word dictionary
  *    (word, freq) — ONE shuffle, vocabulary-sized;
  *  - each word's merge state is a STRING of marker-wrapped symbols
  *    ("\u001f l \u001f  \u001f o \u001f  ..." — every symbol wrapped
  *    in US (0x1f) and joined by spaces), so applying a merge is ONE
  *    literal `replace(state, "<a> <b>", "<ab>")`: left-to-right
  *    non-overlapping replacement in both engines = the classic
  *    greedy BPE merge pass, and the marker makes a false boundary
  *    match impossible (symbols never contain US, so "…x‹a› ‹b›…"
  *    cannot match "‹a› ‹b›" inside "‹xa› ‹b›");
  *  - each of the K iterations counts adjacent symbol pairs weighted
  *    by word freq and takes the argmax by (count DESC, pair ASC) —
  *    exact long sums, byte-order ties, so both engines learn the
  *    IDENTICAL merge sequence. The driver collects exactly one row
  *    per iteration (the argmax — the KMeansLite bounded-driver
  *    discipline), and the per-iteration job runs over the CACHED
  *    word dictionary, never the corpus.
  *
  * Tokenization applies the learned merges IN ORDER as a chain of K
  * literal replaces over the dictionary (codegen'd string ops), then
  * counts per-doc tokens through a (word → n_tokens) join — at 100 TB
  * the model pass is vocabulary-sized and the corpus pass is one
  * explode + hash join + map-side-combined sum, never a second corpus
  * shuffle beyond the word key.
  *
  * The DuckDB oracle replays the ENTIRE training (the K-level
  * unrolled CTE chain — doc_lm_nll's "training replayed in SQL"
  * discipline, iterated like KMeansLite's Lloyd steps), so
  * doc_bpe_vocab hash-verifies the learned merge table itself and
  * doc_bpe_tokenize hash-verifies counts under that table.
  */
object BpeTokenizer {

  /** Merge-iteration count — enough to learn multi-char subwords on
    * the synthetic corpus while keeping the oracle's unrolled chain
    * readable. Mirrored structurally in the oracle SQL (generated
    * from the same constant). */
  val Merges = 12

  /** Symbol marker: ASCII unit separator — absent from the corpus
    * (asserted nowhere needed: any marker char in a word would only
    * make that word unmergeable, not corrupt others). */
  val M = "\u001f"

  /** (word, freq) dictionary over lower(text) space-split words. */
  def wordDict(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial merge state: every character marker-wrapped, symbols
    * space-joined — "low" → "‹l› ‹o› ‹w›". One regex pass. */
  private def state0(word: Column): Column =
    rtrim(regexp_replace(word, "(.)", s"$M$$1$M "))

  /** The state column after applying `merges` (marked pair strings)
    * in order — a chain of literal replaces, codegen'd. */
  private def stateAfter(merges: Seq[String]): Column =
    merges.foldLeft(state0(col("word"))) { (st, p) =>
      call_function("replace", st, lit(p), lit(p.replace(s"$M $M", "")))
    }

  /** Train `k` greedy BPE merges on `dict` (cached). Returns the
    * marked pair strings in learned order. Stops early if the corpus
    * runs out of repeated pairs (never at the shipped scales).
    *
    * The dictionary is vocabulary-sized, so up to
    * `spark.graft.bpe.localTrainMaxVocab` distinct words (default 2^20
    * ≈ a few tens of MB — the KMeansLite bounded-driver discipline)
    * the K iterations run DRIVER-SIDE over one collected copy instead
    * of K sequential Spark jobs each re-scanning the cached dict
    * through a K-deep replace chain (O(K²·vocab) expression work plus
    * K job/collect round-trips — measured as most of the wall of all
    * four doc_bpe_* bench slots). Past the cap (a 100 TB corpus'
    * open vocabulary) the original distributed loop runs unchanged.
    * [[trainMergesLocal]] is bit-identical by construction: the same
    * Java regex builds state0, String.replace has the same literal
    * leftmost-non-overlapping semantics as both engines' replace, and
    * the argmax tie order compares UTF-8 BYTES (Spark's UTF8String
    * binary order), not UTF-16 chars — BpeTokenizerSpec's independent
    * reference trainer and the DuckDB-replayed training pin it.
    */
  def trainMerges(dict: DataFrame, k: Int = Merges): Seq[String] = {
    val cached = graft.Caching.persistOnce(dict)
    val cap = cached.sparkSession.conf
      .getOption("spark.graft.bpe.localTrainMaxVocab")
      .map(_.toInt).getOrElse(1 << 20)
    val local = cached.select("word", "freq").limit(cap + 1).collect()
    if (local.length <= cap)
      trainMergesLocal(local.map(r => (r.getString(0), r.getLong(1))), k)
    else trainMergesDistributed(cached, k)
  }

  /** The distributed per-iteration trainer (one pair-count job per
    * merge over the cached dict) — the path a vocabulary past the
    * driver cap takes. */
  private[operators] def trainMergesDistributed(cached: DataFrame, k: Int): Seq[String] = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var done = false
    while (merges.size < k && !done) {
      val st = stateAfter(merges.toSeq)
      val top = cached
        .select(col("freq"), split(st, " ").as("l"))
        .filter(size(col("l")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(l) - 1), " +
            "i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))"))
          .as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else merges += top.head.getString(0)
    }
    merges.toSeq
  }

  /** a < b in UTF-8 byte order — Spark's UTF8String binary comparison
    * (= DuckDB's), which differs from Java String order past the BMP. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Driver-side replica of the relational training loop over a
    * collected (word, freq) dictionary. States stay STRINGS and every
    * step reuses the JVM machinery the relational form compiles to
    * (Java regex for state0; literal leftmost-non-overlapping
    * String.replace for the merge — which, exactly like both engines'
    * replace, may even match across a symbol fused by a regex-dot
    * non-match such as a newline), so the learned sequence is
    * bit-identical to [[trainMergesDistributed]]'s. */
  private[operators] def trainMergesLocal(dict: Array[(String, Long)], k: Int): Seq[String] = {
    // state0: same regex, then rtrim (trailing 0x20 only)
    val states = new Array[String](dict.length)
    val freqs = new Array[Long](dict.length)
    var i = 0
    while (i < dict.length) {
      var s = dict(i)._1.replaceAll("(.)", s"$M$$1$M ")
      var e = s.length
      while (e > 0 && s.charAt(e - 1) == ' ') e -= 1
      states(i) = s.substring(0, e)
      freqs(i) = dict(i)._2
      i += 1
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var done = false
    while (merges.size < k && !done) {
      val counts = new java.util.HashMap[String, java.lang.Long]()
      var w = 0
      while (w < states.length) {
        val syms = states(w).split(" ", -1)
        if (syms.length >= 2) {
          val f = freqs(w)
          var j = 0
          while (j < syms.length - 1) {
            val p = syms(j) + " " + syms(j + 1)
            val prev = counts.get(p)
            counts.put(p, if (prev == null) f else prev + f)
            j += 1
          }
        }
        w += 1
      }
      if (counts.isEmpty) done = true
      else {
        // argmax by (freq DESC, pair ASC in UTF-8 byte order)
        var best: String = null
        var bestF = Long.MinValue
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val f = e.getValue.longValue()
          if (f > bestF || (f == bestF && utf8Lt(e.getKey, best)))
            { best = e.getKey; bestF = f }
        }
        merges += best
        val merged = best.replace(s"$M $M", "")
        var w2 = 0
        while (w2 < states.length) {
          states(w2) = states(w2).replace(best, merged)
          w2 += 1
        }
      }
    }
    merges.toSeq
  }

  /** (word, n_tok) under the learned merges: symbols remaining after
    * the ordered replace chain. */
  def tokenCounts(dict: DataFrame, merges: Seq[String]): DataFrame =
    dict.select(col("word"),
      size(split(stateAfter(merges), " ")).as("n_tok"))

  private def unmark(sym: String): String = sym.replace(M, "")

  // ------------------------------------------------------------------
  // Oracle construction: the K-level unrolled training chain. Level i
  // derives p{i} (the argmax pair over s{i-1}) and s{i} (the state
  // after replacing it). Both entries share the chain.

  private def chainSql(k: Int): String = {
    val m = "chr(31)"
    def level(i: Int): String = {
      val prev = s"s${i - 1}"
      s"""p$i AS MATERIALIZED (
           SELECT pair FROM (
             SELECT t.pair, sum(s.freq) AS f
             FROM (SELECT string_split(st, ' ') AS l, freq FROM $prev
                   WHERE len(string_split(st, ' ')) >= 2) s,
                  LATERAL unnest(list_transform(range(1, len(s.l)),
                    i -> s.l[CAST(i AS INTEGER)] || ' ' || s.l[CAST(i AS INTEGER) + 1])) AS t(pair)
             GROUP BY t.pair ORDER BY f DESC, t.pair ASC LIMIT 1)),
         s$i AS MATERIALIZED (
           SELECT word, freq,
                  CASE WHEN (SELECT count(*) FROM p$i) = 0 THEN st
                       ELSE replace(st, (SELECT pair FROM p$i),
                              replace((SELECT pair FROM p$i), $m || ' ' || $m, ''))
                  END AS st
           FROM $prev)"""
    }
    s"""w AS MATERIALIZED (
         SELECT word, count(*) AS freq FROM (
           SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
         WHERE word <> '' GROUP BY word),
       s0 AS MATERIALIZED (
         SELECT word, freq,
                rtrim(regexp_replace(word, '(.)', $m || '\\1' || $m || ' ', 'g')) AS st
         FROM w),
       ${(1 to k).map(level).mkString(",\n       ")}"""
  }

  val all: Seq[Q] = Seq(

    // The learned merge table itself — training parity is THE check:
    // if either engine's pair counts, tie order, or replace semantics
    // drifted, the very first divergent merge changes every later row.
    Q("doc_bpe_vocab",
      (s, d) => {
        import s.implicits._
        val merges = trainMerges(wordDict(Tables.documents(s, d)))
        merges.zipWithIndex.map { case (p, i) =>
          val Array(a, b) = p.split(' ')
          (i + 1, unmark(a), unmark(b), unmark(a) + unmark(b))
        }.toDF("step", "lhs", "rhs", "merged")
      },
      Some {
        // each step row is guarded on its p_i being non-empty: Spark's
        // trainMerges stops early when the corpus runs out of repeated
        // pairs, and the unrolled chain must emit the SAME k' rows
        // (the CASE in s_i already makes exhausted levels no-ops)
        val rows = (1 to Merges).map { i =>
          s"""SELECT $i AS step,
                replace(string_split((SELECT pair FROM p$i), ' ')[1], chr(31), '') AS lhs,
                replace(string_split((SELECT pair FROM p$i), ' ')[2], chr(31), '') AS rhs,
                replace(replace((SELECT pair FROM p$i), chr(31), ''), ' ', '') AS merged
              WHERE EXISTS (SELECT 1 FROM p$i)"""
        }.mkString("\n           UNION ALL\n           ")
        s"""WITH ${chainSql(Merges)}
           SELECT * FROM ($rows) ORDER BY step"""
      }),

    // Per-doc token counts under the learned vocabulary — the number
    // sequence packing and mixture weighting actually need. n_words
    // rides along so the compression ratio (tokens per word) is
    // readable off the row.
    Q("doc_bpe_tokenize",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val dict = graft.Caching.persistOnce(wordDict(docs))
        val merges = trainMerges(dict)
        val counts = tokenCounts(dict, merges)
        docs.select(col("doc_id"),
            explode(split(lower(col("text")), " ")).as("word"))
          .filter(col("word") =!= "")
          .join(counts, "word")
          .groupBy("doc_id")
          .agg(sum(col("n_tok")).as("n_tokens"),
            count(lit(1)).as("n_words"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${chainSql(Merges)},
             tok AS (
               SELECT word, len(string_split(st, ' ')) AS n_tok FROM s$Merges),
             dw AS (
               SELECT doc_id, word FROM (
                 SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
                 FROM documents)
               WHERE word <> '')
             SELECT dw.doc_id, CAST(sum(t.n_tok) AS BIGINT) AS n_tokens,
                    count(*) AS n_words
             FROM dw JOIN tok t USING (word)
             GROUP BY dw.doc_id ORDER BY dw.doc_id""")),

    // Tokenizer fertility (tokens per word) by language — the
    // standard tokenizer-evaluation cut: a vocabulary trained on a
    // mixed corpus over-fragments under-represented languages, and
    // this is the table that shows it (mixture weights and packing
    // budgets then correct with it). One corpus pass after the
    // vocabulary-sized model pass; the per-lang aggregate is
    // map-side-combined to |langs| rows.
    Q("doc_bpe_fertility",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val dict = graft.Caching.persistOnce(wordDict(docs))
        val merges = trainMerges(dict)
        val counts = tokenCounts(dict, merges)
        docs
          .select(col("lang"),
            explode(split(lower(col("text")), " ")).as("word"))
          .filter(col("word") =!= "")
          .join(counts, "word")
          .groupBy("lang")
          .agg(sum(col("n_tok")).cast("long").as("n_tokens"),
            count(lit(1)).as("n_words"))
          .select(col("lang"), col("n_words"), col("n_tokens"),
            round(col("n_tokens").cast("double") / col("n_words"), 6)
              .as("fertility"))
          .orderBy("lang")
      },
      Some(s"""WITH ${chainSql(Merges)},
             tok AS (
               SELECT word, len(string_split(st, ' ')) AS n_tok FROM s$Merges),
             lw AS (
               SELECT lang, word FROM (
                 SELECT lang, unnest(string_split(lower(text), ' ')) AS word
                 FROM documents)
               WHERE word <> '')
             SELECT lang, count(*) AS n_words,
                    CAST(sum(t.n_tok) AS BIGINT) AS n_tokens,
                    round(CAST(sum(t.n_tok) AS DOUBLE) / count(*), 6) AS fertility
             FROM lw JOIN tok t USING (word)
             GROUP BY lang ORDER BY lang""")),

    // Sequence packing under the LEARNED vocabulary — the budgets a
    // training run actually fills are token budgets, not whitespace
    // word counts (doc_pack_sequences is the word-count twin, same
    // 256-unit SeqLen). Offsets ride GlobalIndex's parallel
    // range-sort prefix sum — no single-task window at any scale; the
    // BPE model pass stays vocabulary-sized. greatest(n_tokens, 1)
    // keeps last_seq's division non-negative for a zero-token doc in
    // BOTH engines (floor vs truncate differ below zero).
    Q("doc_pack_sequences_bpe",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val dict = graft.Caching.persistOnce(wordDict(docs))
        val merges = trainMerges(dict)
        val counts = tokenCounts(dict, merges)
        val perDoc = docs
          .select(col("doc_id"),
            explode(split(lower(col("text")), " ")).as("word"))
          .filter(col("word") =!= "")
          .join(counts, "word")
          .groupBy("doc_id").agg(sum(col("n_tok")).cast("long").as("n_tokens"))
        val allDocs = docs.select("doc_id")
          .join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
        graft.store.GlobalIndex
          .withOrderedPrefixSum(allDocs, Seq(col("doc_id").asc),
            "n_tokens", "start_offset")
          .select(col("doc_id"), col("n_tokens"), col("start_offset"),
            expr("start_offset div 256").as("first_seq"),
            expr("(start_offset + greatest(n_tokens, 1) - 1) div 256").as("last_seq"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${chainSql(Merges)},
             tok AS (
               SELECT word, len(string_split(st, ' ')) AS n_tok FROM s$Merges),
             dw AS (
               SELECT doc_id, word FROM (
                 SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
                 FROM documents)
               WHERE word <> ''),
             pd AS (
               SELECT dw.doc_id, CAST(sum(t.n_tok) AS BIGINT) AS n_tokens
               FROM dw JOIN tok t USING (word) GROUP BY dw.doc_id),
             alln AS (
               SELECT d.doc_id, coalesce(pd.n_tokens, 0) AS n_tokens
               FROM documents d LEFT JOIN pd USING (doc_id)),
             c AS (
               SELECT doc_id, n_tokens,
                      CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS BIGINT) AS start_offset
               FROM alln)
             SELECT doc_id, n_tokens, start_offset,
                    start_offset // 256 AS first_seq,
                    (start_offset + greatest(n_tokens, 1) - 1) // 256 AS last_seq
             FROM c ORDER BY doc_id"""))
  )
}
