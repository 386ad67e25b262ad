package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding-similarity operators over the `embeddings` table
  * (vec_id, embedding: array<float>[64], label): brute-force cosine
  * top-k (the correctness baseline) and a random-hyperplane-LSH
  * bucketed variant (the scale path), plus embedding-cosine near-dup.
  *
  * Determinism: dot products and norms are computed as sequential
  * left-folds over the array in index order with every element cast to
  * DOUBLE first — the DuckDB oracle uses the same explicit fold
  * (list_transform + a sequential sum), so both engines produce
  * bit-identical doubles (no reliance on either engine's built-in
  * cosine, whose summation order is unspecified).
  *
  * Scale (100 TB of vectors): the brute-force form is quadratic and
  * exists as the oracle-checkable baseline; the LSH form buckets by
  * 16-bit hyperplane signatures so the pair join is per-bucket. The
  * norm is precomputed once per vector (one narrow column), so the
  * cross join ships (id, norm, vector) only.
  */
object EmbeddingQueries {

  /** Sequential left-fold dot product of two float arrays as DOUBLE. */
  private def dotd(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Native fused cosine kernel (graft.functions.CosineSimilarity) —
    * bit-identical to `dotd(a,b) / (sqrt(dotd(a,a)) * sqrt(dotd(b,b)))`
    * (same ascending-index double accumulation; asserted in
    * CosineSimilaritySpec), ~one allocation-free codegen loop per pair
    * instead of three higher-order folds. Registration is idempotent.
    */
  private def cosineSim(s: SparkSession, a: Column, b: Column): Column = {
    graft.GraftExtensions.register(s)
    call_function("cosine_sim", a, b)
  }

  /** Pair-loop form: native dot over PRECOMPUTED norms — a third of
    * the per-pair work of the fused kernel, same formula as the
    * oracle (`dot / (nrm_a * nrm_b)`), so still bit-identical.
    */
  private[operators] def dotOverNorms(s: SparkSession, a: Column, b: Column,
                           na: Column, nb: Column): Column = {
    graft.GraftExtensions.register(s)
    call_function("dot_product", a, b) / (na * nb)
  }

  /** Persisted: without the materialization barrier, CollapseProject
    * inlines the norm fold into the post-join projection and
    * re-evaluates it once per PAIR instead of once per vector.
    */
  private[operators] def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", sqrt(dotd(col("embedding"), col("embedding"))))
      .transform(graft.Caching.persistOnce(_))

  /** Row ceiling for explicitly broadcasting a corpus-VECTOR side
    * (~264 B/row → ~264 MB at the cap). The round-8 100× slice
    * measured why the hint matters: at 200 k vectors the vector table
    * is 53 MB — past the planner's default autoBroadcast threshold,
    * so the ANN re-rank joins silently degraded to shuffling the
    * candidate PAIR stream with a 264 B vector attached to every row
    * (5.4 GB of exchange, 278 s wall for emb_ann_lsh_auto). With the
    * corpus side broadcast, the pair stream never re-shuffles: the
    * per-pair exchange payload drops to the bare (qid, cid) ids.
    * Past the cap the plan falls back to the shuffle join (AQE picks
    * the strategy) — and past ~25 M vectors the designed form is
    * IVF-PQ's CODED inverted file, whose 12 B/row broadcast survives
    * another 20×.
    */
  private val AnnBroadcastCeilingRows = 1000000L

  /** Size-guarded corpus-side broadcast (see AnnBroadcastCeilingRows);
    * `n` is the corpus row count the caller already holds or counts.
    */
  private[operators] def maybeBroadcastVectors(df: DataFrame, n: Long): DataFrame =
    if (n <= AnnBroadcastCeilingRows) broadcast(df) else df

  /** DuckDB-side: the same sequential fold (list index is 1-based).
    * NOTE (shared by every oracle below): the bit-identity claims
    * assume DuckDB's list_sum evaluates as a sequential left fold —
    * true today and load-bearing for years of passing oracles here,
    * but an implementation detail; if a DuckDB release switched to
    * pairwise summation, near-zero dots could flip low-order bits and
    * the replay oracles would fail spuriously. The fix then is
    * list_reduce (explicitly ordered), at some oracle runtime cost.
    */
  private[operators] val dotSql = (a: String, b: String) =>
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  // ANN tuning constants — ONE definition shared by each query body
  // and its replay oracle, so a retune cannot silently de-sync the
  // operator from its verification.
  private val AnnLshBands = 16
  private val AnnLshBits = 10
  /** Probes per band INCLUDING the home bucket: the lowest-scoring
    * perturbation sets over the ProbeW least-certain bits, query-aware
    * by |plane margin| (band_probes kernel).
    */
  private val AnnLshProbes = 9
  private val ProbeW = graft.functions.BandProbes.ProbeWidth
  private val IvfCells = 16
  private val IvfIters = 5
  private val IvfProbes = 3
  private val IvfSampleN = 4096
  // Product-quantization parameters (emb_ann_ivfpq): 64-dim vectors
  // split into PqM subspaces of PqSub dims; each subspace carries a
  // PqCodes-entry codebook (4 bits/code — the 8 codes of a vector
  // pack into 32 bits at production scale; kept as ARRAY<INT> here
  // for plan readability). PqRerank = exact-re-rank shortlist depth.
  /** Neighbors returned per query by emb_ann_ivf_topk. */
  private val AnnTopK = 5

  /** Pool size emb_hard_negatives mines from — large enough that a
    * 10-label corpus almost never fills a whole pool with the query's
    * own label. Declared BEFORE `val all` (the oracle-SQL string
    * interpolates it at object init — the CorpusQueries init-order
    * trap: a later declaration reads as 0 there). */
  private val HardNegPool = 16

  /** Fail-fast input ceiling for the seven quadratic-by-design /
    * pinned-constant exact twins (emb_cosine_topk, emb_near_dup,
    * emb_near_dup_lsh, emb_ann_lsh/ivf/ivfpq, emb_semdedup). These
    * exist as oracle-replayable baselines; their banding/cell
    * constants are pinned for the DuckDB replay and their pair space
    * grows ~n², so a 100 TB caller reaching one by accident should
    * get an error naming the `_auto` scale path, not a runaway job.
    * Sized far above oracle/bench scale (sf0.1 = 2 k vectors) and at
    * the point where 1 M² candidate pairs stop being a sane plan. */
  val PinnedTwinMaxRows: Long = 1L << 20

  /** Count-and-require gate the pinned registry twins pass their
    * input through (the [[graft.functions.BruteForceCosine]]
    * collectBlock `require` discipline, moved BEFORE any collect or
    * pair join). Returns the input unchanged under the ceiling. */
  def requirePinnedScale(e: DataFrame, op: String,
                         scalePath: String): DataFrame = {
    val n = e.count()
    require(n <= PinnedTwinMaxRows,
      s"$op is an exact/pinned-constant twin — quadratic by design — " +
        s"and its input has $n rows (ceiling $PinnedTwinMaxRows). Use " +
        s"$scalePath: corpus-sized banding keeps candidate volume " +
        "~linear in n.")
    e
  }

  /** Prototypes kept per cluster by emb_cluster_sample. */
  private val ProtoK = 4

  private val PqM = 8
  private val PqSub = 8
  private val PqCodes = 16
  private val PqRerank = 32

  /** Full DuckDB replay of the IVF ANN pipeline, INCLUDING the
    * quantizer fit: KMeansLite's Lloyd iterations are unrolled as CTE
    * pairs (assign → recompute). Replay holds bit-for-bit because the
    * fit is replayable by spec — first-k init on the vec_id-ordered
    * sample, ascending-index double distance folds with lower-index
    * tie-break, fixed-point center updates (floored 2^20 micro-units
    * summed exactly: integer-valued doubles below 2^53 add exactly in
    * ANY order, so DuckDB's unordered sum equals Java's sequential
    * loop), empty cells carrying forward, and a final FLOAT rounding
    * (IEEE round-to-nearest-even on both engines) matching what the
    * nearest_cells kernel consumes.
    */
  /** KMeansLite's Lloyd-fit replay as a CTE block over an (offset,
    * dims) SLICE of the sample vectors — shared by the coarse
    * quantizer (offset 0, 64 dims) and each PQ subspace codebook fit
    * (offset m·PqSub, PqSub dims); `pfx` keeps the per-fit CTE names
    * disjoint inside one WITH chain. Produces `${pfx}cf(cell, c)` —
    * the float-rounded centers as double lists.
    */
  private def fitCteBlock(pfx: String, off: Int, dims: Int, k: Int, iters: Int): String = {
    def idx(v: String) = if (off == 0) v else s"$off+$v"
    def dist(emb: String, c: String) =
      s"list_sum(list_transform(range(1, ${dims + 1}), i -> (CAST($emb[${idx("i")}] AS DOUBLE) - $c[i]) * (CAST($emb[${idx("i")}] AS DOUBLE) - $c[i])))"
    val iterations = (1 to iters).map { t =>
      s"""${pfx}a$t AS (
           SELECT vec_id, embedding, cell FROM (
             SELECT s.vec_id, s.embedding, c.cell,
                    row_number() OVER (PARTITION BY s.vec_id
                      ORDER BY ${dist("s.embedding", "c.c")} ASC, c.cell ASC) AS rn
             FROM samp s, ${pfx}c${t - 1} c) WHERE rn = 1),
         ${pfx}m$t AS (
           SELECT cell, g.i AS dim,
                  CAST(sum(floor(CAST(embedding[${idx("g.i")}] AS DOUBLE) * 1048576.0)) AS DOUBLE)
                    / (count(*) * 1048576.0) AS m
           FROM ${pfx}a$t, (SELECT unnest(range(1, ${dims + 1})) AS i) g
           GROUP BY cell, g.i),
         ${pfx}c$t AS (
           SELECT p.cell, COALESCE(n.c, p.c) AS c
           FROM ${pfx}c${t - 1} p LEFT JOIN (
             SELECT cell, array_agg(m ORDER BY dim) AS c FROM ${pfx}m$t GROUP BY cell) n
             ON p.cell = n.cell)"""
    }.mkString(",\n")
    s"""${pfx}c0 AS (
         SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                list_transform(range(1, ${dims + 1}), i -> CAST(embedding[${idx("i")}] AS DOUBLE)) AS c
         FROM (SELECT vec_id, embedding FROM samp ORDER BY vec_id LIMIT $k)),
       $iterations,
       ${pfx}cf AS (
         SELECT cell, list_transform(c, x -> CAST(CAST(x AS FLOAT) AS DOUBLE)) AS c
         FROM ${pfx}c$iters)"""
  }

  private def annIvfOracleSql(k: Int, iters: Int, nProbe: Int,
                              topK: Int = 1,
                              hardNeg: Boolean = false): String = {
    def dist(emb: String, c: String) =
      s"list_sum(list_transform(range(1, 65), i -> (CAST($emb[i] AS DOUBLE) - $c[i]) * (CAST($emb[i] AS DOUBLE) - $c[i])))"
    // top-1 keeps the historical (qid, cid, sim) shape; top-k > 1 emits
    // the rank so the result order (qid, rnk) is a unique total order;
    // hardNeg picks per query the best DIFFERENT-label row of the
    // topK pool (emb_hard_negatives' documented pool semantics)
    val finalSelect =
      if (hardNeg)
        s"""SELECT qid, cid, sim, c_label FROM (
             SELECT r.qid, r.cid, r.sim, lb.label AS c_label,
                    row_number() OVER (PARTITION BY r.qid ORDER BY r.rnk) AS hrn
             FROM ranked r
             JOIN embeddings la ON r.qid = la.vec_id
             JOIN embeddings lb ON r.cid = lb.vec_id
             WHERE r.rnk <= $topK AND la.label <> lb.label)
           WHERE hrn = 1 ORDER BY qid"""
      else if (topK == 1) "SELECT qid, cid, sim FROM ranked WHERE rnk = 1 ORDER BY qid"
      else s"""SELECT qid, CAST(rnk AS INT) AS rnk, cid, sim
               FROM ranked WHERE rnk <= $topK ORDER BY qid, rnk"""
    s"""WITH samp AS (
         SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $IvfSampleN),
       ${fitCteBlock("", 0, 64, k, iters)},
       assigned AS (
         SELECT vec_id AS cid, cell FROM (
           SELECT e.vec_id, f.cell,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY ${dist("e.embedding", "f.c")} ASC, f.cell ASC) AS rn
           FROM embeddings e, cf f) WHERE rn = 1),
       probes AS (
         SELECT vec_id AS qid, cell FROM (
           SELECT e.vec_id, f.cell,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY ${dist("e.embedding", "f.c")} ASC, f.cell ASC) AS rn
           FROM embeddings e, cf f) WHERE rn <= $nProbe),
       cand AS (
         SELECT DISTINCT p.qid, a.cid
         FROM probes p JOIN assigned a USING (cell) WHERE p.qid <> a.cid),
       n AS (
         SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
         FROM embeddings),
       ranked AS (
         SELECT c.qid, c.cid,
                round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS sim,
                row_number() OVER (PARTITION BY c.qid
                  ORDER BY round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) DESC,
                           c.cid ASC) AS rnk
         FROM cand c JOIN n a ON c.qid = a.vec_id JOIN n b ON c.cid = b.vec_id)
       $finalSelect"""
  }

  /** Full DuckDB replay of the IVF-PQ pipeline: the coarse fit plus
    * all PqM per-subspace codebook fits are unrolled via
    * [[fitCteBlock]] (9 Lloyd replays in one WITH chain), then code
    * assignment, the per-query ADC tables, the ADC-ranked shortlist,
    * and the exact re-rank are mirrored CTE by CTE. Bit-identity
    * rests on the same three pillars as annIvfOracleSql — replayable
    * fits, ascending-index double folds everywhere (the per-pair ADC
    * sum is a range(1,9) list fold in BOTH engines, never a GROUP BY
    * sum whose order is unspecified), and float→double roundings that
    * are IEEE-identical — so the approximate operator is
    * hash-verified end to end.
    */
  private def annIvfPqOracleSql(k: Int, iters: Int, nProbe: Int,
                                sampleN: Int, rerank: Int,
                                topK: Int = 1): String = {
    def dist64(emb: String, c: String) =
      s"list_sum(list_transform(range(1, 65), i -> (CAST($emb[i] AS DOUBLE) - $c[i]) * (CAST($emb[i] AS DOUBLE) - $c[i])))"
    val finalSelect =
      if (topK == 1) "SELECT qid, cid, sim FROM ranked WHERE rnk = 1 ORDER BY qid"
      else s"""SELECT qid, CAST(rnk AS INT) AS rnk, cid, sim
               FROM ranked WHERE rnk <= $topK ORDER BY qid, rnk"""
    val subFits = (0 until PqM)
      .map(m => fitCteBlock(s"s${m}_", m * PqSub, PqSub, PqCodes, iters))
      .mkString(",\n")
    val cbUnion = (0 until PqM)
      .map(m => s"SELECT $m AS m, cell AS code, c FROM s${m}_cf")
      .mkString(" UNION ALL ")
    s"""WITH samp AS (
         SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $sampleN),
       ${fitCteBlock("", 0, 64, k, iters)},
       $subFits,
       cb AS ($cbUnion),
       assigned AS (
         SELECT vec_id AS cid, cell FROM (
           SELECT e.vec_id, f.cell,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY ${dist64("e.embedding", "f.c")} ASC, f.cell ASC) AS rn
           FROM embeddings e, cf f) WHERE rn = 1),
       probes AS (
         SELECT vec_id AS qid, cell FROM (
           SELECT e.vec_id, f.cell,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY ${dist64("e.embedding", "f.c")} ASC, f.cell ASC) AS rn
           FROM embeddings e, cf f) WHERE rn <= $nProbe),
       codes AS (
         SELECT vec_id, m, code FROM (
           SELECT e.vec_id, b.m, b.code,
                  row_number() OVER (PARTITION BY e.vec_id, b.m
                    ORDER BY list_sum(list_transform(range(1, ${PqSub + 1}),
                        i -> (CAST(e.embedding[b.m*$PqSub+i] AS DOUBLE) - b.c[i])
                           * (CAST(e.embedding[b.m*$PqSub+i] AS DOUBLE) - b.c[i]))) ASC,
                      b.code ASC) AS rn
           FROM embeddings e, cb b) WHERE rn = 1),
       codesl AS (
         SELECT vec_id, array_agg(code ORDER BY m) AS codes FROM codes GROUP BY vec_id),
       adc AS (
         SELECT e.vec_id AS qid, b.m, b.code,
                list_sum(list_transform(range(1, ${PqSub + 1}),
                  i -> CAST(e.embedding[b.m*$PqSub+i] AS DOUBLE) * b.c[i])) AS pd
         FROM embeddings e, cb b),
       adc1 AS (SELECT qid, m, array_agg(pd ORDER BY code) AS pl FROM adc GROUP BY qid, m),
       adc2 AS (SELECT qid, array_agg(pl ORDER BY m) AS tbl FROM adc1 GROUP BY qid),
       n AS (
         SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
         FROM embeddings),
       cand AS (
         SELECT p.qid, a.cid
         FROM probes p JOIN assigned a USING (cell) WHERE p.qid <> a.cid),
       scored AS (
         SELECT c.qid, c.cid,
                list_sum(list_transform(range(1, ${PqM + 1}), i -> t.tbl[i][kk.codes[i]+1]))
                  / (qn.nrm * cn.nrm) AS adc_sim
         FROM cand c
         JOIN codesl kk ON c.cid = kk.vec_id
         JOIN adc2 t ON c.qid = t.qid
         JOIN n qn ON c.qid = qn.vec_id
         JOIN n cn ON c.cid = cn.vec_id),
       shortlist AS (
         SELECT qid, cid FROM (
           SELECT qid, cid, row_number() OVER (PARTITION BY qid
                    ORDER BY adc_sim DESC, cid ASC) AS rr
           FROM scored) WHERE rr <= $rerank),
       ranked AS (
         SELECT s.qid, s.cid,
                round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS sim,
                row_number() OVER (PARTITION BY s.qid
                  ORDER BY round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) DESC,
                           s.cid ASC) AS rnk
         FROM shortlist s JOIN n a ON s.qid = a.vec_id JOIN n b ON s.cid = b.vec_id)
       $finalSelect"""
  }

  /** The LSH candidate-generation stage, exposed so AnnRecallSpec can
    * pin its BUDGET (candidate fraction) as well as its recall: 16
    * bands × 10-bit sign signatures via the fused band_sigs kernel on
    * the database side; on the QUERY side the band_probes kernel emits
    * per band the `AnnLshProbes` best PERTURBATION SETS — subsets of
    * the ProbeW lowest-|margin| bits scored by total flipped margin
    * (Lv et al., multi-probe LSH; see BandProbes).
    *
    * Measured frontier at sf0.001 (recall@1 / candidate fraction of
    * the pair space), tuning this round: round 6's all-1-bit-flip
    * 8×8×9 probing: 0.690 / 0.25. Query-aware margin flips at 8×8×4:
    * 0.464 / 0.13; perturbation sets 8×9×8: 0.534 / 0.136; 12×9×6:
    * 0.574 / 0.149; this config 16×10×9: 0.656 / 0.155 — round-6
    * recall within 0.034 at 38% less re-rank work. Dropping one probe
    * (16×10×8) buys fraction 0.140 at recall 0.622 if budget ever
    * outranks recall. Random-pair collision ≈ bands × probes / 2^bits;
    * wider bands are what turned probe budget into recall.
    *
    * Scale shape: the band join ships ONLY (band, sig, vec_id) — never
    * the vectors (the bench's shuffle_mb metric caught the first draft
    * moving 2 × nBands vector copies); vectors re-join once, for the
    * deduped candidate pairs.
    */
  private[operators] def annLshCandidates(s: SparkSession, e: DataFrame,
                                          nBands: Int = AnnLshBands,
                                          bits: Int = AnnLshBits,
                                          nProbes: Int = AnnLshProbes,
                                          queries: Option[DataFrame] = None,
                                          dedup: Boolean = true,
                                          corpusN: Long = -1L): DataFrame = {
    graft.GraftExtensions.register(s)
    // Size-guarded broadcast of the SIGNATURE relation (n·bands rows of
    // (band, sig, cid) — ~30 B/row, no vectors): under the guard the
    // band join is map-side, so the probe stream (bands·probes rows per
    // query — 1024 at the 100× operating point, the 4.1 GB exchange of
    // the round-11 sweep) never shuffles AT ALL. Past the guard both
    // sides exchange by (band, sig) — the plan a 1000-executor corpus
    // wants anyway.
    // (band, sig) packs into ONE long join key — sig < 2^bits, band
    // < nBands — so the broadcast build is a LongHashedRelation
    // (open-addressed long keys) instead of a generic row-keyed one:
    // LshProfile measured the composite-key probe at ~6.7 µs/row over
    // 205 M probe rows (43 s of the 100× wall), the single dominant
    // phase after the round-11 exchange fixes.
    val packKey = expr(s"CAST(band AS BIGINT) * ${1L << bits} + sig").as("bs")
    val signed0 = e.select(col("vec_id").as("cid"),
      posexplode(call_function("band_sigs", col("embedding"),
        typedlit(planes(nBands * bits)), lit(bits))).as(Seq("band", "sig")))
      .select(col("cid"), packKey)
    val signed =
      if (corpusN >= 0 && corpusN * nBands <= AnnBroadcastCeilingRows * 16) broadcast(signed0)
      else signed0
    // The query side defaults to the corpus itself (the registry's
    // self-join ANN); a separate query table is the search-API shape —
    // and because every qid's candidates depend only on ITS probes,
    // restricting queries gives exactly the full run's per-query
    // results (AnnRecallSpec uses this to measure 10× recall cheaply).
    val probes = queries.getOrElse(e).select(col("vec_id").as("qid"),
        posexplode(call_function("band_probes", col("embedding"),
          typedlit(planes(nBands * bits)), lit(bits), lit(nProbes)))
          .as(Seq("idx", "sig")))
      .select((col("idx") / lit(nProbes)).cast("int").as("band"),
        col("sig"), col("qid"))
      .select(col("qid"), packKey)
    val pairs = probes
      .join(signed, Seq("bs"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid")
    // Candidate union across bands and probes. Consumers that only
    // MAX over the candidates (annLshTop1) pass dedup = false: a
    // duplicate (qid, cid) pair cannot change a top-1, and the
    // distinct was the single largest exchange of the round-11 100×
    // sweep (~6.4 GB of the 12.9 GB total) — re-scoring a duplicate
    // costs one codegen'd dot product, deduplicating it costs a
    // full-width shuffle row. Pair-set consumers (near-dup twins,
    // AnnRecallSpec's candidate-fraction pin) keep the distinct.
    if (dedup) pairs.distinct() else pairs
  }

  // ------------------------------------------------------------------
  // Corpus-sized ANN parameters — the 100 TB knob the pinned oracle
  // constants deliberately do NOT turn. The 10× slice measurement
  // (BASELINE.md sf-scaling row, round 8) showed why both are needed:
  // with FIXED bits/cells, per-bucket occupancy grows linearly in n,
  // so the candidate join grows as n²/2^bits (LSH) / n²·nProbe/cells
  // (IVF) — 22×/46× wall at 10× data. The registry keeps the pinned
  // twins (emb_ann_lsh/emb_ann_ivf) because their DuckDB oracles
  // replay the exact constants; the `_auto` twins below derive the
  // parameters from the corpus size with these formulas and are the
  // form a production corpus calls.

  /** Hash width that holds expected bucket occupancy ~2 as n grows:
    * bits = ceil(log2(n/2)), floored at the oracle point (10) and
    * capped at 24 (16 M buckets — beyond that, grow bands instead).
    * Candidate volume then stays ~n·bands·probes·occupancy = O(n).
    */
  def annLshBitsFor(n: Long): Int =
    math.max(AnnLshBits,
      math.min(24, math.ceil(math.log(math.max(2L, n) / 2.0) / math.log(2.0)).toInt))

  /** Cell count ~√n (clamped [16, 4096]): balances the O(n·cells)
    * assignment against the O(n²·nProbe/cells) re-rank — both land at
    * ~n^1.5·const, the standard IVF operating point.
    */
  def ivfCellsFor(n: Long): Int =
    math.max(IvfCells, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** SemDeDup's per-cell membership target for [[semDedupSubBitsFor]].
    * IVF's cells ~√n formula is the wrong knob for SemDeDup past the
    * 4096-cell clamp: IVF's clamp is correct because assignment cost
    * n·cells counterweights the re-rank, but SemDeDup's only
    * per-cell cost is the WITHIN-CELL PAIR JOIN — past n = 4096²
    * ≈ 16.8 M vectors, membership grows as n/4096 and the pair join
    * as n²/4096 (at 1 B vectors, ~10^14 pairs). */
  private[operators] val SemDedupTargetMembership = 128

  /** Extra sign-bit hash width that re-bounds SemDeDup's per-cell
    * membership once the coarse quantizer saturates: each coarse cell
    * is subdivided by `b` deterministic hyperplane sign bits (the
    * shared [[planes]] family — hyperplanes through the origin, so
    * same-direction near-duplicates almost always land on the same
    * side of each plane), giving cells·2^b total buckets and expected
    * membership n/(cells·2^b) ≤ [[SemDedupTargetMembership]]. The
    * pair join is then ~n·membership ≈ LINEAR in n at any scale,
    * instead of n²/4096 past 17 M vectors. A fixed-m subdivision is
    * exactly the paper's own operating point (Abbas et al. 2023 run
    * k = 50 000 on 1.3 B embeddings — membership ~26 000 there only
    * because their GPU pairwise kernel absorbs it; a shuffle-bounded
    * engine wants m ~ 10²). Floored at 0 — at the oracle (500) and
    * bench (2 000) scales membership is already under target, so the
    * sub-split is a no-op and the pinned DuckDB replay verifies the
    * auto path verbatim (AnnAutoSizeSpec pins this coincidence).
    * Capped at 20 bits (10⁶ subcells/cell — membership stays ≤ 4·m
    * out to 10¹² vectors).
    */
  def semDedupSubBitsFor(n: Long, cells: Int): Int = {
    val membership = n.toDouble / math.max(1, cells)
    if (membership <= SemDedupTargetMembership) 0
    else math.min(20, math.ceil(
      math.log(membership / SemDedupTargetMembership) / math.log(2.0)).toInt)
  }

  /** Sub-probe budget for the two-level ANN cell key
    * ([[annIvfSubBitsFor]]): within each probed COARSE cell, the
    * query probes this many sign-bit sub-buckets, margin-aware (the
    * [[graft.functions.BandProbes]] perturbation-set kernel — the
    * identical multi-probe machinery the LSH auto uses, applied to
    * the sub-key's plane family). 8 of the 2^ProbeW = 16 subset
    * space: the measured saturation-sim point (AnnRecallSpec's
    * cells=48 slice) shows the margin ordering concentrates the
    * neighbor mass in the low-rank subsets, so the second half of the
    * subset space buys little recall for 2× the candidates. */
  val AnnIvfSubProbes = 8

  /** Target membership per probed SUB-BUCKET for the ANN search
    * paths once the coarse quantizer saturates — the ANN analogue of
    * [[SemDedupTargetMembership]], sized larger because ANN
    * candidates buy RECALL (SemDeDup's threshold makes its sub-split
    * semantics-free; ANN's costs probe coverage, so the budget stays
    * at the clamp boundary's operating point rather than dropping to
    * the dedup target). */
  private[operators] val AnnIvfTargetMembership = 512

  /** Extra sign-bit width for the ANN search paths' cell key past
    * the coarse quantizer's 4096-cell clamp — [[semDedupSubBitsFor]]
    * ported to the candidate-generation regime. The quadratic tail
    * it removes: with cells AND probes both clamped (4096 / 64 past
    * n = 2^24), the probed fraction freezes at 1/64, so per-query
    * candidates grow as n/64 and the candidate stream as n²/64 —
    * the verdict-r13 regime. With the two-level key
    * (coarse·2^b | b sign bits of the shared [[planes]] family), a
    * query probes [[AnnIvfSubProbes]] margin-ranked sub-buckets per
    * coarse cell, each of expected membership
    * n/(cells·2^b) ≤ [[AnnIvfTargetMembership]], so per-query
    * candidates FREEZE at nProbes · subProbes · target = 64·8·512 =
    * 2^18 — exactly the clamp boundary's per-query budget
    * (64 · 4096) — and the total candidate stream is LINEAR in n.
    *
    * Activation is exactly the clamp point: membership exceeds
    * subProbes·target = 4096 only once n > 2^24 ≈ 16.8 M at the
    * 4096-cell clamp (below the clamp membership ≈ √n ≤ 4096 by
    * construction), so the sub-split is a pinned NO-OP at the
    * oracle, bench, and committed-sweep scales — the SemDeDup
    * discipline: every DuckDB replay verifies the auto path
    * verbatim (AnnAutoSizeSpec pins the coincidence).
    *
    * The coverage trade SemDeDup does not pay: probing s of 2^b
    * sub-buckets sees s·target members of a coarse cell instead of
    * all n/cells, and the neighbor is recovered only when its
    * sub-signature ranks within the s lowest-margin perturbations.
    * band_probes flips among the ProbeW = 4 lowest-margin bits, so
    * past b = 4 + log2(s) the uncovered high-margin bits must match
    * outright — sign agreement per plane is 1 − θ/π, high for true
    * near neighbors, and the measured floor is pinned
    * (AnnRecallSpec saturation-sim + the ≥20 M slice row in
    * BASELINE.md). Recall past ~10^9 vectors decays along the same
    * curve as multi-probe LSH — which remains the documented
    * family handoff when a caller wants recall held at any n. */
  def annIvfSubBitsFor(n: Long, cells: Int): Int = {
    val membership = n.toDouble / math.max(1, cells)
    if (membership <= AnnIvfSubProbes.toDouble * AnnIvfTargetMembership) 0
    else math.min(20, math.ceil(
      math.log(membership / AnnIvfTargetMembership) / math.log(2.0)).toInt)
  }

  /** The auto twins' RECALL budget, not just their hash width (the
    * round-8 lesson, BASELINE.md sf-scaling rows: auto bits alone kept
    * the wall sub-quadratic but recall@1 eroded 0.656 → 0.271 at 10×
    * because the probe budget stayed at the oracle constants). All
    * three formulas floor at the oracle point — n ≤ 2048 covers
    * sf0.01 (500 vectors, the driver's correctness gate) and sf0.1
    * (2 000, the bench) — so the pinned-constant DuckDB replay
    * oracles verify the auto entries verbatim there
    * (AnnAutoSizeSpec asserts the coincidence).
    *
    * Bands double per decade past the floor (capped at 64): with bits
    * holding bucket occupancy ~2, recall is bought by bands × probes.
    * The measured 10× point (32 bands × 16 probes at bits 14)
    * restores recall 0.630 @ candidate fraction 0.046.
    */
  def annLshBandsFor(n: Long): Int =
    if (n <= 2048) AnnLshBands
    else math.min(64,
      AnnLshBands * (1 << math.ceil(math.log10(n / 2048.0)).toInt))

  /** Probes step to the kernel's perturbation-set ceiling (2^ProbeW =
    * 16) past the oracle floor — the cheapest recall knob: no extra
    * signature columns, only more bucket lookups per band.
    */
  def annLshProbesFor(n: Long): Int =
    if (n <= 2048) AnnLshProbes else 1 << ProbeW

  /** IVF probe budget ~1.5·√cells past the oracle floor: total
    * re-rank work is n·(nProbe/cells)·n ≈ n^1.75 — sub-quadratic —
    * while the probed cell fraction decays only as n^-0.25, so recall
    * degrades gracefully instead of collapsing with the
    * fixed-constant fraction nProbe/cells ~ 1/√n. The 1.5 coefficient
    * is the measured 10× operating point: nProbe 18 of 142 cells →
    * recall@1 0.590 @ candidate fraction 0.128 (√cells alone = 12 →
    * 0.468; the corpus is ANN-adversarial near-uniform vectors, so
    * these are floor-case numbers — clustered corpora do better at
    * the same budget, and the LSH auto is the cheaper scale path
    * here: 0.594 recall @ 0.046 fraction).
    */
  def ivfProbesFor(n: Long): Int =
    if (n <= 2048) IvfProbes
    else math.min(64, math.ceil(1.5 * math.sqrt(ivfCellsFor(n).toDouble)).toInt)

  /** Quantizer sample sized to the cell count (≥32 points per cell,
    * within [IvfSampleN, 8192]) — shared by the auto entry and
    * AnnAutoSizeSpec so the oracle's LIMIT matches by construction.
    */
  def ivfSampleFor(cells: Int): Int =
    math.min(8192, math.max(IvfSampleN, 32 * cells))

  /** Scaled ADC re-rank budget for the IVF-PQ auto twin. At 4 bits ×
    * 8 subspaces on this corpus (uncorrelated random vectors — PQ's
    * adversarial case), the true neighbor's ADC rank scatters across a
    * roughly constant FRACTION of the probe candidates, so a fixed
    * re-rank COUNT collapses recall as the candidate set grows with n
    * (measured on the 10× slice: rerank 32 → recall 0.242 vs the
    * plain-IVF 0.590 ceiling; 128 → 0.402; 256 → 0.476; 512 → 0.554 ≈
    * 94% of ceiling, the knee). Budget = ¼ of the expected candidate
    * count n·nProbes/cells, floored at the oracle constant (so the
    * formula COINCIDES with PqRerank at oracle scale: 500·3/23 ≈ 65
    * candidates → floor binds) and capped at 2048 — the measured knee
    * of the 100× slice's recall curve (RerankTune at 200 k vectors:
    * 256 → 0.470, 512 → 0.505, 1024 → 0.553, 2048 → 0.598,
    * 3572 → 0.613 — the last 75% of budget buys 0.015 recall). Past
    * the cap the exact re-rank would dominate the pipeline and plain
    * IVF is the better operator anyway (the documented operating-point
    * handoff). On real clustered embeddings the ADC distortion is far
    * smaller and the floor usually binds; this formula is sized for
    * the adversarial bound, not the typical case.
    */
  def pqRerankFor(n: Long, cells: Int, nProbes: Int): Int =
    math.min(2048,
      math.max(PqRerank, math.ceil(0.25 * n.toDouble * nProbes / cells).toInt))

  /** The driver's correctness gate runs Verify at sf0.01 — 500
    * embedding rows (TESTDATA.md). The auto twins' oracle SQL below
    * replays the construction at exactly the constants the formulas
    * return for that n; AnnAutoSizeSpec pins both the count and the
    * formula values so a testdata regeneration can't silently
    * invalidate the replay.
    */
  private[operators] val OracleScaleN = 500L

  /** Full DuckDB replay of the multi-probe banded-LSH ANN pipeline.
    * The plane matrix goes in as string→FLOAT literals (Java
    * Float.toString round-trips, and strtof parsing is correctly
    * rounded, so both engines hold bit-identical float planes); the
    * sign test reproduces band_sigs' ascending-index double fold and
    * `>= 0` convention, so bucket assignments — and the margin
    * RANKING that picks the query-aware probe bits (same fold → same
    * doubles → same abs ordering, ties to the lower bit) — and
    * therefore the candidate set and the re-ranked winner all match
    * exactly.
    */
  private def annLshOracleSql(nBands: Int, bits: Int, nProbes: Int): String = {
    val planeRows = planes(nBands * bits).zipWithIndex.map { case (row, p) =>
      s"($p, [${row.map(f => s"CAST('$f' AS FLOAT)").mkString(",")}])"
    }.mkString(",")
    s"""WITH pl(p, plane) AS (VALUES $planeRows),
       bits AS (
         SELECT e.vec_id, pl.p,
                ${dotSql("e.embedding", "pl.plane")} AS d
         FROM embeddings e, pl),
       sigs AS (
         SELECT vec_id, p // $bits AS band,
                CAST(sum(CASE WHEN d >= 0 THEN 1 ELSE 0 END * (1 << (p % $bits))) AS BIGINT) AS sig
         FROM bits GROUP BY vec_id, p // $bits),
       margins AS (
         SELECT vec_id, p // $bits AS band, p % $bits AS bit, abs(d) AS m,
                row_number() OVER (PARTITION BY vec_id, p // $bits
                                   ORDER BY abs(d) ASC, p % $bits ASC) AS rk
         FROM bits),
       lb AS (
         SELECT vec_id, band,
                ${(1 to ProbeW).map(r =>
                  s"max(CASE WHEN rk = $r THEN bit END) AS b$r, " +
                  s"max(CASE WHEN rk = $r THEN m END) AS m$r").mkString(",\n                ")}
         FROM margins WHERE rk <= $ProbeW GROUP BY vec_id, band),
       scored AS (
         SELECT s.vec_id, s.band, k.mask,
                (${(1 to ProbeW).map(r =>
                  s"CASE WHEN (k.mask & ${1 << (r - 1)}) != 0 THEN lb.m$r ELSE 0 END")
                  .mkString(" +\n                 ")}) AS score,
                CAST(xor(s.sig,
                  (${(1 to ProbeW).map(r =>
                    s"CASE WHEN (k.mask & ${1 << (r - 1)}) != 0 THEN 1 << lb.b$r ELSE 0 END")
                    .mkString(" |\n                   ")})) AS BIGINT) AS psig
         FROM sigs s
         JOIN lb ON s.vec_id = lb.vec_id AND s.band = lb.band
         CROSS JOIN (SELECT unnest(range(0, ${1 << ProbeW})) AS mask) k),
       probes AS (
         SELECT vec_id AS qid, band, psig AS sig FROM (
           SELECT vec_id, band, psig,
                  row_number() OVER (PARTITION BY vec_id, band
                                     ORDER BY score ASC, mask ASC) AS pk
           FROM scored) WHERE pk <= $nProbes),
       cand AS (
         SELECT DISTINCT p.qid, s.vec_id AS cid
         FROM probes p JOIN sigs s ON p.band = s.band AND p.sig = s.sig
                                  AND p.qid <> s.vec_id),
       n AS (
         SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
         FROM embeddings),
       ranked AS (
         SELECT c.qid, c.cid,
                round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS sim,
                row_number() OVER (PARTITION BY c.qid
                  ORDER BY round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) DESC,
                           c.cid ASC) AS rnk
         FROM cand c JOIN n a ON c.qid = a.vec_id JOIN n b ON c.cid = b.vec_id)
       SELECT qid, cid, sim FROM ranked WHERE rnk = 1 ORDER BY qid"""
  }

  /** All-pairs exact near-dup: executed by the blocked broadcast
    * kernel ([[graft.functions.BruteForceCosine.nearDupPairs]] — see
    * its scaladoc for why the pair space never becomes rows), and
    * row-for-row equal to the declarative twin below, which
    * EmbeddingNearDupSpec asserts on a planted-pair corpus.
    */
  def nearDupExact(s: SparkSession, emb: DataFrame, threshold: Double): DataFrame =
    graft.functions.BruteForceCosine.nearDupPairs(s, emb, threshold)

  /** The declarative all-pairs plan (crossJoin + codegen dot over
    * precomputed norms) — the semantic spec of [[nearDupExact]], kept
    * as its equivalence twin. Quadratic by declared design: the
    * oracle-checkable baseline the LSH form is verified against.
    * The driver testdata's random vectors never exceed cos ≈ 0.51, so
    * the registry query is vacuous there and EmbeddingNearDupSpec
    * supplies data where pairs actually exist.
    */
  def nearDupExactPlan(s: SparkSession, emb: DataFrame, threshold: Double): DataFrame = {
    val e = withNorm(emb)
    val a = e.select(col("vec_id").as("vid_a"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vid_b"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.crossJoin(b).filter(col("vid_a") < col("vid_b"))
      .withColumn("sim", round(
        dotOverNorms(s, col("ea"), col("eb"), col("na"), col("nb")), 6))
      .filter(col("sim") >= threshold)
      .select(col("vid_a"), col("vid_b"), col("sim"))
      .orderBy("vid_a", "vid_b")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    * dedup via clustering: k-means cells (the SAME KMeansLite coarse
    * quantizer as the IVF family — replayable by spec), then cosine
    * similarity is computed only WITHIN each cell, and a vector is a
    * semantic duplicate iff some LOWER-vec_id cell-mate is within
    * `tau` — "keep the earliest-ingested member of every
    * high-similarity group", the deterministic form of the paper's
    * keep-one rule. Emits every vector with its cell, its max
    * similarity to a prior cell-mate, and the drop verdict — the
    * audit-friendly shape (the kept set is `WHERE NOT is_dup`).
    *
    * Scale: this is the paper's own trick — clustering bounds the
    * pair space. With cells ~√n (ivfCellsFor), per-cell membership is
    * ~√n, so the pair join is ~n^1.5 total (vs n² all-pairs), and it
    * shuffles by cell with map-side-combined max aggregation. The
    * quantizer fit stays a bounded driver micro-task (≤8192-row
    * sample), centers enter the plan as a literal — same discipline
    * as annIvfCandidates.
    */
  def semDedup(s: SparkSession, e: DataFrame,
               cells: Int = IvfCells,
               iters: Int = IvfIters,
               sampleN: Int = IvfSampleN,
               tau: Double = SemDedupTau,
               subBits: Int = 0): DataFrame = {
    graft.GraftExtensions.register(s)
    import s.implicits._
    val sample = e.orderBy(col("vec_id")).select(col("embedding")).limit(sampleN)
      .as[Array[Float]].collect()
    val centers = graft.functions.KMeansLite.fit(sample, k = cells, iters = iters)
    val cLit = typedlit(centers.map(_.toSeq).toSeq)
    val coarse = element_at(
      call_function("nearest_cells", col("embedding"), cLit, lit(1)), 1).cast("long")
    // Two-level cell key past the coarse quantizer's clamp (see
    // [[semDedupSubBitsFor]]): coarse·2^b | b sign bits of the shared
    // plane family — one fused band_sigs codegen call, no extra fit,
    // membership re-bounded at any n. subBits = 0 (oracle/bench
    // scale) leaves the key — and the replay SQL — bit-identical to
    // the single-level form.
    val cellKey =
      if (subBits == 0) coarse
      else coarse * lit(1L << subBits) +
        element_at(call_function("band_sigs", col("embedding"),
          typedlit(planes(subBits)), lit(subBits)), 1)
    val assigned = withNorm(e.select(col("vec_id"), col("embedding"),
      cellKey.as("cell")))
    val a = assigned.select(col("cell"), col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = assigned.select(col("cell"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    // per-cell pairs, oriented (lower id → candidate): the b side is
    // the one on trial, its max over prior mates decides the drop
    val agg = a.join(b, Seq("cell")).filter(col("a_id") < col("b_id"))
      .select(col("b_id").as("vec_id"),
        round(dotOverNorms(s, col("a_emb"), col("b_emb"),
          col("a_nrm"), col("b_nrm")), 6).as("sim"))
      .groupBy("vec_id").agg(max(col("sim")).as("max_sim_prior"))
    assigned.select(col("vec_id"), col("cell"))
      .join(agg, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("max_sim_prior"),
        coalesce(col("max_sim_prior") >= tau, lit(false)).as("is_dup"))
      .orderBy("vec_id")
  }

  /** Threshold chosen against the driver corpus statistics: random
    * 64-dim vectors pair at p99 ≈ 0.29 cosine, so 0.3 marks the
    * genuinely-close tail while leaving both verdicts populated at
    * oracle scale (a threshold past the corpus max ≈ 0.51 would make
    * `is_dup` vacuously false and verify nothing).
    */
  private val SemDedupTau = 0.3

  /** Full DuckDB replay of [[semDedup]]: the Lloyd fit via
    * [[fitCteBlock]], assignment, within-cell oriented pairs, the
    * prior-mate max, and the verdict — CTE for CTE.
    */
  private[operators] def semDedupOracleSql(k: Int, iters: Int, sampleN: Int, tau: Double,
                                subBits: Int = 0): String = {
    def dist(emb: String, c: String) =
      s"list_sum(list_transform(range(1, 65), i -> (CAST($emb[i] AS DOUBLE) - $c[i]) * (CAST($emb[i] AS DOUBLE) - $c[i])))"
    // Two-level replay (subBits > 0): the sign-bit sub-split uses the
    // same string→FLOAT plane literals + ascending-index double fold
    // as annLshOracleSql, so the composite cell key matches band_sigs
    // bit-for-bit. At subBits = 0 (every current oracle scale) the
    // emitted SQL is the unchanged single-level form.
    val subCtes =
      if (subBits == 0) ""
      else {
        val planeRows = planes(subBits).zipWithIndex.map { case (row, p) =>
          s"($p, [${row.map(f => s"CAST('$f' AS FLOAT)").mkString(",")}])"
        }.mkString(",")
        s"""pl(p, plane) AS (VALUES $planeRows),
       sb AS (
         SELECT e.vec_id,
                CAST(sum((CASE WHEN ${dotSql("e.embedding", "pl.plane")} >= 0 THEN 1 ELSE 0 END) * (1 << pl.p)) AS BIGINT) AS sub
         FROM embeddings e, pl GROUP BY e.vec_id),
       """
      }
    val cellExpr =
      if (subBits == 0) "asg.cell"
      else s"asg.cell * ${1L << subBits} + sb.sub"
    val subJoin = if (subBits == 0) "" else " JOIN sb ON asg.vec_id = sb.vec_id"
    s"""WITH samp AS (
         SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $sampleN),
       ${fitCteBlock("", 0, 64, k, iters)},
       $subCtes
       asg AS (
         SELECT vec_id, cell, embedding FROM (
           SELECT e.vec_id, f.cell, e.embedding,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY ${dist("e.embedding", "f.c")} ASC, f.cell ASC) AS rn
           FROM embeddings e, cf f) WHERE rn = 1),
       n AS (
         SELECT asg.vec_id, $cellExpr AS cell, asg.embedding,
                sqrt(${dotSql("asg.embedding", "asg.embedding")}) AS nrm
         FROM asg$subJoin),
       agg AS (
         SELECT b.vec_id,
                max(round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6)) AS max_sim_prior
         FROM n a JOIN n b ON a.cell = b.cell AND a.vec_id < b.vec_id
         GROUP BY b.vec_id)
       SELECT n.vec_id, n.cell, agg.max_sim_prior,
              COALESCE(agg.max_sim_prior >= $tau, FALSE) AS is_dup
       FROM n LEFT JOIN agg ON n.vec_id = agg.vec_id
       ORDER BY n.vec_id"""
  }

  /** Deterministic pseudo-random hyperplane matrix (splitmix64 →
    * uniform [-1, 1] floats): any fixed plane family works — recall is
    * tuned by bands × bits and candidates are re-verified exactly.
    */
  private[operators] def planes(nPlanes: Int, dim: Int = 64): Seq[Seq[Float]] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until nPlanes).map(h => (0 until dim).map(j =>
      (mix((h.toLong << 32) | j).toDouble / Long.MaxValue.toDouble).toFloat))
  }

  /** Banded random-hyperplane-LSH near-dup (the scale path): nBands ×
    * bitsPerBand sign-bit band signatures generate candidate pairs,
    * exact cosine verifies them — so the output EQUALS nearDupExact
    * whenever banding recall holds. Defaults tuned for threshold
    * ≥ 0.95 (per-plane collision p = 1 − arccos(0.95)/π ≈ 0.899):
    * a band matches with p¹² ≈ 0.28, a true pair escapes all 48 bands
    * with (1 − p¹²)⁴⁸ ≈ 1.6e-7 — banding recall is exhaustive for
    * oracle purposes. bitsPerBand sets PRECISION on unrelated vectors
    * (random-sign band collision ≈ 2⁻¹² → ≈ 48/4096 ≈ 1.2% of all
    * pairs become candidates; 6 bits admitted ~40% and was slower
    * than all-pairs at sf0.1). Candidate generation shuffles
    * O(vectors × nBands) narrow (band, sig, vec_id) rows — never the
    * pair matrix and never the vectors; embeddings are re-joined only
    * for the candidate set. At corpus scale raise bitsPerBand further
    * to keep per-bucket occupancy bounded and retune recall by adding
    * bands.
    *
    * All 576 plane dots run as ONE fused codegen loop
    * ([[graft.functions.BandSignatures]]) against the literal plane
    * matrix — as 576 dot_product columns the plan itself blows up,
    * and as higher-order folds it runs interpreted per row × plane ×
    * component (~1000× slower in the first draft); sign tests don't
    * need the oracle-grade fold, only the verification cosine does.
    */
  def nearDupLsh(s: SparkSession, emb: DataFrame, threshold: Double,
                 nBands: Int = 48, bitsPerBand: Int = 12): DataFrame = {
    // persisted: the normed table feeds the signature pass, both
    // verification vector sides, and the broadcast-guard count; the
    // signature relation feeds BOTH sides of the bucket self-join —
    // unpersisted, band_sigs (bands×bits plane dots per vector) ran
    // once per side (the doc_minhash_lsh lesson; NgramProfile showed
    // two full Generate(band_sigs) branches at the 100× slice).
    val e = withNorm(emb).transform(graft.Caching.persistOnce(_))
    graft.GraftExtensions.register(s)
    val bands = e.select(col("vec_id"),
        posexplode(call_function("band_sigs", col("embedding"),
          typedlit(planes(nBands * bitsPerBand)), lit(bitsPerBand)))
          .as(Seq("band", "sig")))
      .transform(graft.Caching.persistOnce(_))
    val candidates = bands.as("x").join(bands.as("y"), Seq("band", "sig"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vid_a"), col("y.vec_id").as("vid_b"))
      .distinct()
    // exact-cosine verification of candidates only; no broadcast
    // hint — AQE picks the build side (candidates are the small
    // side on a real corpus, the vector table is O(corpus)).
    val va = e.select(col("vec_id").as("vid_a"), col("embedding").as("ea"), col("nrm").as("na"))
    val vb = e.select(col("vec_id").as("vid_b"), col("embedding").as("eb"), col("nrm").as("nb"))
    // BOTH vector sides broadcast under the size guard (AnnBroadcast-
    // CeilingRows): with only vb hinted, the first join still
    // exchanged the candidate pair stream by vid_a AND shuffled the
    // vector table against it — measured at the 100× slice:
    // 797 MB / 30.4 s → 632 MB / 22.1 s with both sides map-side
    // (the remaining exchange is the band self-join's sig relation,
    // inherent) — same 100× rationale as annLshTop1
    val nCorpus = e.count()
    candidates.join(maybeBroadcastVectors(va, nCorpus), "vid_a")
      .join(maybeBroadcastVectors(vb, nCorpus), "vid_b")
      .withColumn("sim", round(
        dotOverNorms(s, col("ea"), col("eb"), col("na"), col("nb")), 6))
      .filter(col("sim") >= threshold)
      .select(col("vid_a"), col("vid_b"), col("sim"))
      .orderBy("vid_a", "vid_b")
  }

  /** Corpus-sized near-dup banding (the emb_near_dup_lsh ×10-slice
    * note, BASELINE.md round 8: fixed bits=12 went 6.3× at 10× data —
    * random band collisions scale n²/2^bits). bits = ceil(log2 n)+1
    * bounds total random candidates at ~bands·n; bands then restores
    * exhaustive recall for the threshold: per-plane agreement
    * p = 1 − arccos(t)/π, a true pair escapes all bands with
    * (1−p^bits)^bands ≤ 1e-6. Output still EQUALS the exact all-pairs
    * form (candidates are exact-verified), so the auto twin carries
    * the same DuckDB oracle as the pinned one.
    */
  def nearDupLshAuto(s: SparkSession, emb: DataFrame, threshold: Double): DataFrame = {
    val (bands, bits) = nearDupBandingFor(emb.count(), threshold)
    nearDupLsh(s, emb, threshold, nBands = bands, bitsPerBand = bits)
  }

  /** Corpus-sized exhaustive-recall banding, shared by nearDupLshAuto
    * and the incremental embedding index (EmbIncrementalDedup).
    * Cap at 4096 bands: for low thresholds p^bits underflows toward 0
    * and the uncapped ceil (toInt of +Infinity = Int.MaxValue) would
    * request a plane literal that OOMs the driver. Below the cap the
    * escape bound (1-p^bits)^bands ≤ 1e-6 no longer holds for small
    * p — banding recall is exhaustive only for the high thresholds
    * (≥ ~0.9) near-dup detection actually uses; a sub-0.9 threshold
    * degrades to best-effort candidates, never to a crash.
    */
  private[operators] def nearDupBandingFor(n: Long, threshold: Double): (Int, Int) = {
    val bits = math.max(12,
      math.ceil(math.log(math.max(2L, n).toDouble) / math.log(2.0)).toInt + 1)
    val p = 1.0 - math.acos(threshold) / math.Pi
    val bands = math.min(4096,
      math.max(48, math.ceil(math.log(1e6) / math.pow(p, bits)).toInt))
    (bands, bits)
  }

  /** The declarative top-k plan — the semantic spec of the kernel
    * form, kept as its equivalence twin (CosineTopKSpec) and as the
    * shuffle-shaped variant the block-pair generalization would merge
    * with: crossJoin + codegen dot, then the bounded-heap aggregate
    * (map-side partial agg) instead of a window rank, so the candidate
    * matrix reduces to ≤ k pairs per query BEFORE the shuffle.
    */
  def cosineTopKPlan(s: SparkSession, emb: DataFrame, k: Int): DataFrame = {
    graft.functions.TopKByScore.tuneForManyGroups(s)
    val e = withNorm(emb)
    val a = e.select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val b = e.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    a.crossJoin(b).filter(col("qid") =!= col("cid"))
      .withColumn("sim", round(
        dotOverNorms(s, col("qe"), col("ce"), col("qn"), col("cn")), 6))
      .groupBy("qid")
      .agg(graft.functions.TopKByScore.topK(k)(col("sim"), col("cid")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "sc")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rnk"),
        col("sc.id").as("cid"), col("sc.score").as("sim"))
      .orderBy("qid", "rnk")
  }

  /** JL projection output width (emb_rand_proj). Declared before
    * `all` — the oracle SQL embeds it eagerly at object init.
    */
  private val JlOutDims = 16

  /** Deterministic ±1 sign matrix for emb_rand_proj: one LCG stream
    * (Numerical Recipes constants), bit 16 as the sign — seeded by a
    * fixed constant so the matrix is part of the operator definition,
    * identical in the Spark plan and the DuckDB oracle.
    */
  private def jlSigns(j: Int): IndexedSeq[Int] =
    (0 until 64).map { dim =>
      val x = (j * 64 + dim + 12345) * 1664525L + 1013904223L
      if (((x >>> 16) & 1L) == 1L) 1 else -1
    }

  /** Shared oracle tail for the k-means corpus ops: home-cell
    * assignment (same row_number replay as annIvfOracleSql — dist
    * ASC, cell ASC ties) + d² of each vector to its assigned
    * float-rounded center, both against the fitCteBlock `cf` CTE.
    * Emitted WITHOUT a leading/trailing comma so callers splice it
    * into their WITH chain; produces `d(cell, vec_id, d2)`.
    */
  private def kmeansAssignedD2Sql: String = {
    def dist(emb: String, c: String) =
      s"list_sum(list_transform(range(1, 65), i -> (CAST($emb[i] AS DOUBLE) - $c[i]) * (CAST($emb[i] AS DOUBLE) - $c[i])))"
    s"""assigned AS (
         SELECT vec_id, cell, embedding FROM (
           SELECT e.vec_id, f.cell, e.embedding,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY ${dist("e.embedding", "f.c")} ASC, f.cell ASC) AS rn
           FROM embeddings e, cf f) WHERE rn = 1),
       d AS (
         SELECT a.cell, a.vec_id,
                ${dist("a.embedding", "f.c")} AS d2
         FROM assigned a JOIN cf f USING (cell))"""
  }

  /** Fit + assign + d² shared by emb_kmeans_profile /
    * emb_cluster_sample: deterministic bounded Lloyd fit on the
    * driver (the IVF quantizer discipline — the centroid matrix is a
    * plan literal, never a distributed ML fit), home-cell assignment
    * through the nearest_cells codegen kernel in the scan projection,
    * and d² to the assigned center via a cells-row broadcast join +
    * one ascending-index fold. Returns (cluster, vec_id, d2) — no
    * shuffle yet; callers aggregate.
    */
  private def kmeansAssignedD2(s: SparkSession, e: DataFrame,
                               cells: Int, iters: Int,
                               sampleN: Int): DataFrame = {
    graft.GraftExtensions.register(s)
    import s.implicits._
    val sample = e.orderBy(col("vec_id")).select(col("embedding")).limit(sampleN)
      .as[Array[Float]].collect()
    val centers = graft.functions.KMeansLite.fit(sample, k = cells, iters = iters)
    val cLit = typedlit(centers.map(_.toSeq).toSeq)
    // the SAME float-rounded centers as doubles, for the d² fold (the
    // oracle's cf CTE: float-round then widen)
    val centDf = centers.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.map(_.toDouble).toSeq) }
      .toDF("cluster", "ce")
    e.select(col("vec_id"),
        element_at(call_function("nearest_cells", col("embedding"), cLit, lit(1)), 1)
          .cast("int").as("cluster"),
        col("embedding"))
      .join(broadcast(centDf), "cluster")
      .withColumn("d2", expr(
        "aggregate(sequence(1, 64), 0.0D, (acc, i) -> acc + " +
          "(CAST(element_at(embedding, i) AS DOUBLE) - element_at(ce, i)) * " +
          "(CAST(element_at(embedding, i) AS DOUBLE) - element_at(ce, i)))"))
      .select(col("cluster"), col("vec_id"), col("d2"))
  }

  /** emb_kmeans_profile implementation — see the registry entry's
    * comment for semantics and scale rationale.
    */
  def kmeansProfile(s: SparkSession, e: DataFrame,
                    cells: Int = IvfCells, iters: Int = IvfIters,
                    sampleN: Int = IvfSampleN): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(30, 0)
    kmeansAssignedD2(s, e, cells, iters, sampleN)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"),
        sum(floor(col("d2") * 1e6).cast(dec)).as("smu"),
        max(round(col("d2"), 6)).as("max_d2"))
      .select(col("cluster"), col("n_vecs"),
        round(col("smu").cast("double") / (col("n_vecs").cast("double") * 1e6), 6)
          .as("avg_d2"),
        col("max_d2"))
      .orderBy("cluster")
  }

  /** emb_cluster_sample implementation — bounded-heap per-cluster
    * top-ProtoK by ascending d² micro-units (score = negated micro so
    * TopKByScore's (score DESC, id ASC) contract selects the closest,
    * ties to the lowest vec_id).
    */
  def clusterSample(s: SparkSession, e: DataFrame,
                    m: Int = ProtoK, cells: Int = IvfCells,
                    iters: Int = IvfIters,
                    sampleN: Int = IvfSampleN): DataFrame = {
    kmeansAssignedD2(s, e, cells, iters, sampleN)
      .withColumn("neg_micro", -floor(col("d2") * 1e6))
      .groupBy("cluster")
      .agg(graft.functions.TopKByScore.topK(m)(col("neg_micro"), col("vec_id")).as("top"))
      .select(col("cluster"), posexplode(col("top")).as(Seq("pos", "sc")))
      .select(col("cluster"), (col("pos") + 1).cast("int").as("rnk"),
        col("sc.id").as("vec_id"),
        (-col("sc.score")).cast("long").as("d2_micro"))
      .orderBy("cluster", "rnk")
  }

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------------
    // Per-label centroids (cluster prototypes — the per-class summary
    // a training pipeline feeds to hard-negative mining / dataset
    // cartography). Determinism: component sums use FIXED-POINT
    // micro-unit accumulation — floor(v · 1e6) per component summed as
    // BIGINT is exact and order-independent, where a double sum would
    // drift by partition order (the same discipline as the decimal
    // money sums in RelationalQueries). One shuffle of (label, dim)
    // pairs with map-side combine; 64 · |labels| result rows.
    Q("emb_label_centroids",
      (s, d) => {
        Tables.embeddings(s, d)
          .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
          .groupBy("label", "dim")
          // no rounding: numerator and denominator are exact integers
          // (< 2^53) held in doubles, so ONE IEEE division is correctly
          // rounded and bit-identical on both engines — rounding would
          // only reintroduce a half-way-tie mode mismatch
          .agg((sum(floor(col("v").cast("double") * 1e6)) /
              (count(lit(1)) * lit(1e6))).as("centroid"))
          .orderBy("label", "dim")
      },
      Some("""SELECT label, i - 1 AS dim,
             sum(floor(CAST(embedding[i] AS DOUBLE) * 1e6)) / (count(*) * 1e6) AS centroid
             FROM embeddings, (SELECT unnest(range(1, 65)) AS i) g
             GROUP BY label, i ORDER BY label, dim""")),

    // ----------------------------------------------------------------
    // Per-label centroid-distance outliers (z > 2) — the data-cleaning
    // pass that drops mislabeled / corrupted vectors before training.
    // Cross-engine exactness without trusting float group-sums: d² is
    // a per-row ascending-index double fold (bit-identical, like every
    // dot here); the label statistics aggregate dμ = floor(d²·10³) as
    // integers (Spark DECIMAL sums / DuckDB HUGEINT sums — exact in
    // any order), and the z>2 test is the INTEGER inequality
    //   n·dμ − S1 > 0  ∧  (n·dμ − S1)² > 4·(n·S2 − S1²)
    // (z = (dμ−mean)/σ with mean=S1/n, σ²=(n·S2−S1²)/n² — multiply
    // through by n·σ and square), so no engine ever compares a
    // float-summed mean. DECIMAL(30,0) on the Spark side keeps the
    // squared terms exact far past the ~2^53 double ceiling a
    // billion-row label would cross. Scale: two broadcast-joined
    // label-keyed aggregations (64·|labels| and |labels| result rows),
    // per-row work O(dims) — a pure scan pipeline, no pair joins.
    Q("emb_outliers",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val dec = org.apache.spark.sql.types.DecimalType(30, 0)
        val cents = e
          .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
          .groupBy("label", "dim")
          .agg((sum(floor(col("v").cast("double") * 1e6)) /
            (count(lit(1)) * lit(1e6))).as("c"))
          .groupBy("label")
          .agg(expr("transform(array_sort(collect_list(struct(dim, c))), x -> x.c)")
            .as("ce"))
        val dists = e.join(broadcast(cents), "label")
          .withColumn("d2", expr(
            "aggregate(sequence(1, 64), 0.0D, (acc, i) -> acc + " +
              "(CAST(element_at(embedding, i) AS DOUBLE) - element_at(ce, i)) * " +
              "(CAST(element_at(embedding, i) AS DOUBLE) - element_at(ce, i)))"))
          .select(col("label"), col("vec_id"), col("d2"),
            floor(col("d2") * 1e3).cast(dec).as("dmu"))
          .transform(graft.Caching.persistOnce(_))
        val stats = dists.groupBy("label")
          .agg(count(lit(1)).cast(dec).as("n"),
            sum(col("dmu")).as("s1"),
            sum(col("dmu") * col("dmu")).as("s2"))
        dists.join(broadcast(stats), "label")
          .filter(col("n") * col("dmu") - col("s1") > 0 &&
            (col("n") * col("dmu") - col("s1")) * (col("n") * col("dmu") - col("s1")) >
              (col("n") * col("s2") - col("s1") * col("s1")) * 4)
          .select(col("label"), col("vec_id"), round(col("d2"), 6).as("d2"))
          .orderBy("label", "vec_id")
      },
      Some("""WITH comps AS (
               SELECT label, vec_id, CAST(i AS INTEGER) AS i,
                      CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS v
               FROM embeddings, (SELECT unnest(range(1, 65)) AS i) g),
             cent AS (
               SELECT label, i, sum(floor(v * 1e6)) / (count(*) * 1e6) AS c
               FROM comps GROUP BY label, i),
             centl AS (SELECT label, array_agg(c ORDER BY i) AS ce FROM cent GROUP BY label),
             d AS (
               SELECT e.label, e.vec_id,
                      list_sum(list_transform(range(1, 65),
                        i -> (CAST(e.embedding[i] AS DOUBLE) - ce[i])
                           * (CAST(e.embedding[i] AS DOUBLE) - ce[i]))) AS d2
               FROM embeddings e JOIN centl USING (label)),
             dm AS (SELECT label, vec_id, d2, CAST(floor(d2 * 1e3) AS BIGINT) AS dmu FROM d),
             st AS (SELECT label, count(*) AS n, sum(dmu) AS s1, sum(dmu * dmu) AS s2
                    FROM dm GROUP BY label)
             SELECT dm.label, vec_id, round(d2, 6) AS d2
             FROM dm JOIN st USING (label)
             WHERE n * dmu - s1 > 0
               AND (n * dmu - s1) * (n * dmu - s1) > 4 * (n * s2 - s1 * s1)
             ORDER BY label, vec_id""")),

    // ----------------------------------------------------------------
    // K-means corpus profile — the cluster-then-curate map (cluster
    // sizes + quantization error per cell) that drives cluster-pruning
    // and balanced-mixing decisions over an embedding corpus. The
    // quantizer follows the IVF discipline: a bounded deterministic
    // driver-side Lloyd fit (first-k init on the vec_id-ordered
    // sample, fixed-point center updates) entering the plan as a
    // literal, so the DuckDB oracle replays the fit bit-for-bit via
    // fitCteBlock. Assignment is the nearest_cells codegen kernel in
    // the scan projection (zero shuffle to assign); d² to the home
    // center re-derives through a cells-row broadcast join + one
    // ascending-index per-row fold; per-cluster stats aggregate
    // floor(d²·10⁶) micro-units (DECIMAL/HUGEINT — integer sums are
    // exact in any order), so no float group-sum is ever compared
    // cross-engine. One shuffle total (the cells-key aggregation,
    // map-side combined). Scale: with cells FIXED the whole operator
    // is linear in n (assignment n·cells·dim, agg n rows → cells
    // groups) — there is no pair join anywhere, so unlike SemDeDup no
    // auto-sized twin is needed for safety; a 100 TB run would raise
    // cells for a finer map, still linear.
    Q("emb_kmeans_profile",
      (s, d) => kmeansProfile(s, Tables.embeddings(s, d)),
      Some(s"""WITH samp AS (
               SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $IvfSampleN),
             ${fitCteBlock("", 0, 64, IvfCells, IvfIters)},
             $kmeansAssignedD2Sql
             SELECT CAST(cell AS INT) AS cluster, count(*) AS n_vecs,
                    round(CAST(sum(CAST(floor(d2 * 1e6) AS BIGINT)) AS DOUBLE)
                      / (count(*) * 1e6), 6) AS avg_d2,
                    max(round(d2, 6)) AS max_d2
             FROM d GROUP BY cell ORDER BY cluster""")),

    // ----------------------------------------------------------------
    // Cluster-balanced prototype sampling — per fitted cluster the
    // ProtoK vectors CLOSEST to their centroid (medoid-style
    // prototypes: the representative-subset curation pass, and the
    // diversity-preserving complement of SemDeDup's near-centroid
    // PRUNING). Same fit/assignment/d² derivation as
    // emb_kmeans_profile; ranking is the bounded-heap TopKByScore
    // aggregate on NEGATED floor(d²·10⁶) micro-units (map-side
    // partial top-k per cluster — never a window rank over the full
    // corpus), ties to the lowest vec_id. Distances are emitted in
    // exact integer micro-units (d2_micro) — the selection key
    // itself, so the output carries no engine-float at all.
    Q("emb_cluster_sample",
      (s, d) => clusterSample(s, Tables.embeddings(s, d)),
      Some(s"""WITH samp AS (
               SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $IvfSampleN),
             ${fitCteBlock("", 0, 64, IvfCells, IvfIters)},
             $kmeansAssignedD2Sql,
             r AS (
               SELECT cell, vec_id, CAST(floor(d2 * 1e6) AS BIGINT) AS d2_micro,
                      row_number() OVER (PARTITION BY cell
                        ORDER BY floor(d2 * 1e6) ASC, vec_id ASC) AS rn
               FROM d)
             SELECT CAST(cell AS INT) AS cluster, CAST(rn AS INT) AS rnk,
                    vec_id, d2_micro
             FROM r WHERE rn <= $ProtoK ORDER BY cluster, rnk""")),

    // ----------------------------------------------------------------
    // Int8 scalar quantization with reconstruction-error attestation
    // (the index-compression step before ANN at 100 TB: 4 bytes/dim →
    // 1). Per-dimension min/max (exact, order-independent) define the
    // 255-level grid; codes use floor(x + 0.5) — round-half-up spelled
    // in floor so both engines agree bit-for-bit. The emitted check is
    // the quantizer's CONTRACT: max |v − dequant(code)| ≤ scale/2
    // per vector, plus the fixed-point-accumulated MSE. Stats are 64
    // rows broadcast; one exploded shuffle keyed (vec_id) brings the
    // per-component errors back together.
    Q("emb_scalar_quantize",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val comps = e.select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("dim", "vf")))
          .withColumn("v", col("vf").cast("double"))
        val stats = comps.groupBy("dim")
          .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
          .withColumn("scale",
            when(col("mx") > col("mn"), (col("mx") - col("mn")) / 255.0).otherwise(lit(1.0)))
        val coded = comps.join(broadcast(stats), "dim")
          .withColumn("code", floor((col("v") - col("mn")) / col("scale") + 0.5))
          .withColumn("err", abs(col("v") - (col("mn") + col("code") * col("scale"))))
        coded.groupBy("vec_id")
          .agg(
            // exact-integer numerator / one IEEE division — no rounding
            // (see emb_label_centroids for why round() would hurt)
            (sum(floor(col("err") * col("err") * lit(1e12))) / lit(64e12)).as("mse"),
            (max(col("err")) <= max(col("scale")) * 0.5000001).as("within_half_step"))
          .orderBy("vec_id")
      },
      Some("""WITH comps AS (
               SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
               FROM embeddings, (SELECT unnest(range(1, 65)) AS i) g),
             stats AS (
               SELECT dim, min(v) AS mn, max(v) AS mx,
                      CASE WHEN max(v) > min(v) THEN (max(v) - min(v)) / 255.0 ELSE 1.0 END AS scale
               FROM comps GROUP BY dim),
             coded AS (
               SELECT vec_id, v, scale,
                      floor((v - mn) / scale + 0.5) AS code,
                      abs(v - (mn + floor((v - mn) / scale + 0.5) * scale)) AS err
               FROM comps JOIN stats USING (dim))
             SELECT vec_id,
                    sum(floor(err * err * 1e12)) / 64e12 AS mse,
                    max(err) <= max(scale) * 0.5000001 AS within_half_step
             FROM coded GROUP BY vec_id ORDER BY vec_id""")),

    // ----------------------------------------------------------------
    // Brute-force cosine top-k per query vector (k = 5): the exact
    // baseline every ANN variant is measured against. Executed by the
    // blocked broadcast kernel; CosineTopKSpec asserts row-for-row
    // equality with the declarative twin [[cosineTopKPlan]].
    Q("emb_cosine_topk",
      (s, d) => graft.functions.BruteForceCosine.topK(s,
        requirePinnedScale(Tables.embeddings(s, d), "emb_cosine_topk",
          "emb_ann_ivf_topk / emb_ann_ivfpq_topk"), 5),
      Some(s"""WITH n AS (
               SELECT vec_id, embedding,
                      sqrt(${dotSql("embedding", "embedding")}) AS nrm
               FROM embeddings),
             sims AS (
               SELECT a.vec_id AS qid, b.vec_id AS cid,
                      round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS sim
               FROM n a JOIN n b ON a.vec_id <> b.vec_id),
             ranked AS (
               SELECT qid, cid, sim,
                      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rnk
               FROM sims)
             SELECT qid, rnk, cid, sim FROM ranked WHERE rnk <= 5
             ORDER BY qid, rnk""")),

    // ----------------------------------------------------------------
    // Embedding near-dup: pairs above a high cosine threshold —
    // the "semantic dedup" filter of LLM-corpus pipelines.
    Q("emb_near_dup",
      (s, d) => nearDupExact(s, requirePinnedScale(Tables.embeddings(s, d),
        "emb_near_dup", "emb_near_dup_lsh_auto"), 0.95),
      Some(s"""WITH n AS (
               SELECT vec_id, embedding,
                      sqrt(${dotSql("embedding", "embedding")}) AS nrm
               FROM embeddings)
             SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
                    round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS sim
             FROM n a JOIN n b ON a.vec_id < b.vec_id
             WHERE round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) >= 0.95
             ORDER BY vid_a, vid_b""")),

    // ----------------------------------------------------------------
    // Embedding near-dup, LSH-bucketed form (the scale path) — SAME
    // oracle as emb_near_dup: candidates from banded hyperplane LSH,
    // verified by exact cosine, so the output equals the all-pairs
    // form (mirrors doc_minhash_lsh vs doc_ngram_jaccard; recall
    // analysis and plan shape in [[nearDupLsh]]'s doc). The planted-
    // pair equivalence against nearDupExact is asserted in
    // EmbeddingNearDupSpec — the driver testdata has no cos ≥ 0.95
    // pairs, so this oracle checks schema/emptiness only.
    Q("emb_near_dup_lsh",
      (s, d) => nearDupLsh(s, requirePinnedScale(Tables.embeddings(s, d),
        "emb_near_dup_lsh", "emb_near_dup_lsh_auto"), 0.95),
      Some(s"""WITH n AS (
               SELECT vec_id, embedding,
                      sqrt(${dotSql("embedding", "embedding")}) AS nrm
               FROM embeddings)
             SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
                    round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS sim
             FROM n a JOIN n b ON a.vec_id < b.vec_id
             WHERE round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) >= 0.95
             ORDER BY vid_a, vid_b""")),

    // Corpus-sized banding twin (see nearDupLshAuto): unlike the ANN
    // autos this one keeps the FULL exact oracle — the exact-verify
    // step makes its output equal the all-pairs form at any banding.
    Q("emb_near_dup_lsh_auto",
      (s, d) => nearDupLshAuto(s, Tables.embeddings(s, d), 0.95),
      Some(s"""WITH n AS (
               SELECT vec_id, embedding,
                      sqrt(${dotSql("embedding", "embedding")}) AS nrm
               FROM embeddings)
             SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
                    round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS sim
             FROM n a JOIN n b ON a.vec_id < b.vec_id
             WHERE round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) >= 0.95
             ORDER BY vid_a, vid_b""")),

    // ----------------------------------------------------------------
    // LSH-bucketed ANN (the scale path): banded sign signatures →
    // per-band bucket join (with 1-bit multi-probe) → exact-cosine
    // re-rank. Reports each query's top-1 exact-cosine neighbor among
    // its bucket mates; AnnRecallSpec pins recall/coverage floors, and
    // the DuckDB oracle replays the ENTIRE construction — the
    // deterministic plane matrix is embedded in the SQL as float
    // literals, the sign folds use the same ascending-index double
    // accumulation as the band_sigs kernel, and the probe/bucket/
    // re-rank pipeline is mirrored CTE by CTE — so the approximate
    // operator is hash-verified end to end, not just floor-pinned.
    Q("emb_ann_lsh",
      (s, d) => annLshTop1(s, requirePinnedScale(Tables.embeddings(s, d),
        "emb_ann_lsh", "emb_ann_lsh_auto")),
      Some(annLshOracleSql(AnnLshBands, AnnLshBits, AnnLshProbes))),

    // Corpus-sized twin: hash width AND recall budget derived from the
    // table size (annLshBitsFor / annLshBandsFor / annLshProbesFor) so
    // candidate volume stays ~linear in n while recall holds. The
    // oracle is the pinned twin's replay SQL VERBATIM: at the driver's
    // oracle scale (sf0.01, n = 500) every formula sits on its floor
    // and returns the pinned constant, so the constructions coincide
    // bit-for-bit (AnnAutoSizeSpec asserts the coincidence and the
    // count; AnnRecallSpec pins the scaled budget's recall on the 10×
    // slice).
    Q("emb_ann_lsh_auto",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val n = e.count()
        annLshTop1(s, e, nBands = annLshBandsFor(n),
          bits = annLshBitsFor(n), nProbes = annLshProbesFor(n))
      },
      Some(annLshOracleSql(AnnLshBands, AnnLshBits, AnnLshProbes))),

    // ----------------------------------------------------------------
    // IVF-bucketed ANN (the second scale path; Spark-only): MLlib
    // KMeans (seeded, deterministic) as the coarse quantizer. Database
    // vectors live in their HOME cell (the inverted file); each QUERY
    // probes its nProbe=3 nearest cells — the standard IVF recall
    // knob, recovering neighbors that fell just across a Voronoi
    // boundary. The candidate join stays per-cell (O(n²·nProbe/k)),
    // re-ranked by exact cosine.
    Q("emb_ann_ivf",
      (s, d) => annIvfTop1(s, requirePinnedScale(Tables.embeddings(s, d),
        "emb_ann_ivf", "emb_ann_ivf_auto")),
      Some(annIvfOracleSql(IvfCells, IvfIters, IvfProbes))),

    // Corpus-sized twin (see ivfCellsFor / ivfProbesFor): cells ~√n
    // keeps assign and re-rank balanced; nProbe ~√cells keeps the
    // re-rank sub-quadratic (n^1.75) with gracefully-decaying cell
    // coverage. Unlike the LSH auto, the cells formula is already off
    // its floor at the oracle scale (ivfCellsFor(500) = 23 ≠ 16), so
    // the oracle replays the construction at the AUTO's own constants
    // — same generator, evaluated at the formulas' sf0.01 values
    // (nProbe and sampleN do sit on their floors there;
    // AnnAutoSizeSpec pins all four).
    Q("emb_ann_ivf_auto",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val n = e.count()
        val cells = ivfCellsFor(n)
        // two-level key past the coarse clamp (annIvfSubBitsFor) —
        // 0 at every oracle/bench scale, so the replay is verbatim
        annIvfTop1(s, e, cells = cells, nProbes = ivfProbesFor(n),
          sampleN = ivfSampleFor(cells),
          subBits = annIvfSubBitsFor(n, cells), subProbes = AnnIvfSubProbes)
      },
      Some(annIvfOracleSql(ivfCellsFor(OracleScaleN), IvfIters, IvfProbes))),

    // ----------------------------------------------------------------
    // IVF approximate top-k (k = 5): the retrieval-service shape — per
    // query the k best probed neighbors with their ranks. Candidate
    // stage and sizing identical to emb_ann_ivf_auto (cells ~√n,
    // probes ~1.5√cells, the same oracle-scale constants); ranking via
    // the bounded-heap aggregate instead of MAX — see annIvfTopK for
    // why a window rank would be the wrong plan at 100 TB.
    Q("emb_ann_ivf_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val n = e.count()
        val cells = ivfCellsFor(n)
        annIvfTopK(s, e, k = AnnTopK, cells = cells,
          nProbes = ivfProbesFor(n), sampleN = ivfSampleFor(cells),
          subBits = annIvfSubBitsFor(n, cells), subProbes = AnnIvfSubProbes)
      },
      Some(annIvfOracleSql(ivfCellsFor(OracleScaleN), IvfIters, IvfProbes,
        topK = AnnTopK))),

    // ----------------------------------------------------------------
    // Hard-negative mining (contrastive-training data prep): per
    // query, the most similar DIFFERENT-label vector among its
    // top-16 probed neighbors — the "ANN top-k, drop positives"
    // recipe every embedding-training pipeline runs. Pool semantics,
    // sizing, and the kernel scale path documented at
    // [[hardNegatives]]; the oracle replays the full IVF top-k
    // construction then applies the identical label filter + rank-1.
    Q("emb_hard_negatives",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val n = e.count()
        val cells = ivfCellsFor(n)
        hardNegatives(s, e, pool = HardNegPool, cells = cells,
          nProbes = ivfProbesFor(n), sampleN = ivfSampleFor(cells),
          subBits = annIvfSubBitsFor(n, cells), subProbes = AnnIvfSubProbes)
      },
      Some(annIvfOracleSql(ivfCellsFor(OracleScaleN), IvfIters, IvfProbes,
        topK = HardNegPool, hardNeg = true))),

    // ----------------------------------------------------------------
    // IVF-PQ ANN (the third scale path — the memory/shuffle-compressed
    // form a 100 TB vector corpus actually ships): coarse IVF cells as
    // above, but the CANDIDATE JOIN carries each database vector as
    // PqM=8 four-bit codebook codes (+ its exact norm) instead of the
    // 256-byte raw vector — a ~6× cut of the fat side of the ANN
    // shuffle, and per-pair scoring drops from a 64-term dot to 8
    // table lookups against the query's precomputed ADC tables. The
    // ADC shortlist (top-PqRerank per query) then re-ranks by exact
    // cosine over the raw vectors — a join that ships only
    // n·PqRerank pairs. Every stage replayed in the DuckDB oracle,
    // including all nine quantizer fits.
    Q("emb_ann_ivfpq",
      (s, d) => annIvfPqTop1(s, requirePinnedScale(Tables.embeddings(s, d),
        "emb_ann_ivfpq", "emb_ann_ivfpq_auto")),
      Some(annIvfPqOracleSql(IvfCells, IvfIters, IvfProbes, IvfSampleN, PqRerank))),

    // Corpus-sized twin: coarse cells/probes/sample scale with n via
    // the shared ivfCellsFor/ivfProbesFor/ivfSampleFor formulas (the
    // PQ codebooks themselves do NOT grow with n — 4-bit codes are a
    // fixed-rate compression, which is what makes PQ the at-scale
    // form), and the ADC re-rank budget scales via pqRerankFor (a
    // fixed COUNT collapses recall as the probe set grows — the same
    // parametric trap round 8 caught for the LSH probe budget). The
    // oracle replays at the formulas' sf0.01 values, same contract as
    // emb_ann_ivf_auto (AnnAutoSizeSpec pins the coincidence).
    Q("emb_ann_ivfpq_auto",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val n = e.count()
        val cells = ivfCellsFor(n)
        val nProbes = ivfProbesFor(n)
        annIvfPqTop1(s, e, cells = cells, nProbes = nProbes,
          sampleN = ivfSampleFor(cells),
          rerank = pqRerankFor(n, cells, nProbes),
          subBits = annIvfSubBitsFor(n, cells), subProbes = AnnIvfSubProbes)
      },
      Some(annIvfPqOracleSql(ivfCellsFor(OracleScaleN), IvfIters, IvfProbes,
        IvfSampleN, PqRerank))),

    // ----------------------------------------------------------------
    // IVF-PQ approximate top-k (k = 5): emb_ann_ivf_topk's sibling for
    // the compressed-index regime (past ~25 M vectors only the CODED
    // inverted file still broadcasts). Auto sizing identical to
    // emb_ann_ivfpq_auto; under the ceiling the whole-pipeline kernel
    // emits the final per-query ranking directly (one input row sees
    // all its probed cells — no merge aggregate at all).
    Q("emb_ann_ivfpq_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val n = e.count()
        val cells = ivfCellsFor(n)
        val nProbes = ivfProbesFor(n)
        annIvfPqTopK(s, e, k = AnnTopK, cells = cells, nProbes = nProbes,
          sampleN = ivfSampleFor(cells),
          rerank = pqRerankFor(n, cells, nProbes),
          subBits = annIvfSubBitsFor(n, cells), subProbes = AnnIvfSubProbes)
      },
      Some(annIvfPqOracleSql(ivfCellsFor(OracleScaleN), IvfIters, IvfProbes,
        IvfSampleN, PqRerank, topK = AnnTopK))),

    // ----------------------------------------------------------------
    // SemDeDup (cluster-then-dedup semantic near-dup removal — see
    // [[semDedup]]): the embedding-space analogue of
    // doc_neardup_clusters' "turn pairs into a dedup decision", with
    // the pair space bounded by k-means cells instead of LSH bands.
    Q("emb_semdedup",
      (s, d) => semDedup(s, requirePinnedScale(Tables.embeddings(s, d),
        "emb_semdedup", "emb_semdedup_auto")),
      Some(semDedupOracleSql(IvfCells, IvfIters, IvfSampleN, SemDedupTau))),

    // Corpus-sized twin: cells ~√n via the shared ivfCellsFor (per-cell
    // membership ~√n keeps the within-cell pair join at n^1.5), sample
    // sized to the cells. Like emb_ann_ivf_auto, ivfCellsFor is off
    // its floor at the oracle scale, so the oracle replays at the
    // formulas' sf0.01 values (AnnAutoSizeSpec pins the constants).
    Q("emb_semdedup_auto",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val n = e.count()
        val cells = ivfCellsFor(n)
        semDedup(s, e, cells = cells, sampleN = ivfSampleFor(cells),
          subBits = semDedupSubBitsFor(n, cells))
      },
      Some(semDedupOracleSql(ivfCellsFor(OracleScaleN), IvfIters,
        ivfSampleFor(ivfCellsFor(OracleScaleN)), SemDedupTau,
        semDedupSubBitsFor(OracleScaleN, ivfCellsFor(OracleScaleN))))),

    // ----------------------------------------------------------------
    // Johnson-Lindenstrauss random projection 64 → 16 dims (the
    // embedding-compression step before sketching/ANN at 100 TB: a
    // sign-matrix projection preserves pairwise distances to within
    // 1/√16 distortion, Achlioptas 2001 — ±1 entries suffice). The
    // sign matrix is a DETERMINISTIC literal (seeded LCG, generated
    // once at plan build) embedded in both engines' plans, so the op
    // replays exactly. Determinism of the sums: each term is
    // floor(v·1e6)·(±1) — exact integers — so the per-output sum is
    // order-independent and the single closing division is correctly
    // rounded. Plan shape: a pure per-row map (16 zip_with/aggregate
    // folds inside one codegen span) — NO shuffle, no explode, no
    // join; at 100 TB this is a scan-transform at full parallelism.
    // The long-form unpivot (stack) stays row-local.
    Q("emb_rand_proj",
      (s, d) => {
        // all 16 outputs in ONE fused codegen kernel (jl_project) —
        // the earlier 16-column aggregate(zip_with(...)) form ran the
        // folds INTERPRETED (higher-order functions don't codegen):
        // 2·10⁸ boxed lambda calls = 84 s at the 100× slice for an
        // arithmetic ~10⁸-flop map. Same fixed-point semantics
        // (floor(v·1e6)·±1 exact-integer terms), same oracle.
        graft.GraftExtensions.register(s)
        val signsLit = typedlit((0 until JlOutDims).map(j => jlSigns(j)))
        Tables.embeddings(s, d)
          .select(col("vec_id"),
            posexplode(call_function("jl_project", col("embedding"), signsLit))
              .as(Seq("j", "p")))
          .select(col("vec_id"), col("j").cast("int").as("j"), col("p"))
          .orderBy("vec_id", "j")
      },
      Some {
        // relational mirror: the same literal matrix as a VALUES table,
        // exploded components joined on dim — affordable at oracle scale
        val sgnRows = (for (j <- 0 until JlOutDims; dim <- 0 until 64)
          yield s"($dim, $j, ${jlSigns(j)(dim)})").mkString(", ")
        s"""WITH sgn(dim, j, sg) AS (VALUES $sgnRows),
             comps AS (
               SELECT vec_id, i - 1 AS dim,
                      floor(CAST(embedding[i] AS DOUBLE) * 1e6) AS v
               FROM embeddings, (SELECT unnest(range(1, 65)) AS i) g)
             SELECT vec_id, CAST(j AS INT) AS j, sum(v * sg) / 1e6 AS p
             FROM comps JOIN sgn USING (dim)
             GROUP BY vec_id, j ORDER BY vec_id, j"""
      })
  )

  /** The emb_ann_lsh pipeline body, parameterized (the registry entry
    * pins the oracle constants; emb_ann_lsh_auto sizes `bits` to the
    * corpus).
    */
  def annLshTop1(s: SparkSession, emb: DataFrame,
                 nBands: Int = AnnLshBands,
                 bits: Int = AnnLshBits,
                 nProbes: Int = AnnLshProbes,
                 queries: Option[DataFrame] = None): DataFrame = {
    val e = withNorm(emb)
    val n = e.count() // also warms the persisted e
    if (n <= AnnBroadcastCeilingRows && n * nBands <= AnnBroadcastCeilingRows * 16) {
      // Whole-pipeline kernel (BruteForceCosine.lshTop1Kernel): one
      // row per query carries its full probe array; probed buckets
      // are walked in-cache against the raw vector Block and only the
      // per-query winner becomes a row. The declarative path below
      // materialized ~410 M candidate rows at the 100× operating
      // point — 55.0 s, of which LshProfile attributed 43 s to the
      // broadcast-hash probe + pair-row machinery; the kernel runs
      // the same probes at 38.1 s (exponent 0.84 → 0.79 — the
      // remaining wall is the n·bands signature relation's
      // collect+broadcast build, which the declarative path also
      // pays but distributed). Past either ceiling the declarative
      // join + aggregate form is the design.
      graft.GraftExtensions.register(s)
      val qSide = queries.getOrElse(e).select(col("vec_id").as("qid"),
        col("embedding").as("qe"),
        call_function("band_probes", col("embedding"),
          typedlit(planes(nBands * bits)), lit(bits), lit(nProbes)).as("sigs"))
      return graft.functions.BruteForceCosine.lshTop1Kernel(s,
        e.select(col("vec_id"), col("embedding")), planes(nBands * bits),
        qSide, bits, nProbes)
    }
    // candidate generation (bands, query-aware probes, budget
    // rationale): see annLshCandidates. dedup = false — top-1 is
    // duplicate-insensitive, and under the guarded broadcasts below
    // the whole pipeline (probe gen → band join → both vector joins →
    // map-side top-1 partials) is then ONE stage with no exchange
    // before the final ~row-per-query aggregation shuffle: the
    // round-11 sweep measured the deduping form at 12.9 GB exchange /
    // 444 s (probes 4.1 GB + pair distinct 6.4 GB + qid join 2.5 GB).
    val candidates =
      annLshCandidates(s, e, nBands, bits, nProbes, queries, dedup = false, corpusN = n)
    val va = queries.map(withNorm).getOrElse(e)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val vb = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("nrm").as("cn"))
    // narrow projection BEFORE the top-1 aggregation: the exchange
    // must carry (qid, cid, sim), never the two vectors — belt and
    // braces against a pruning regression (at corpus scale the wide
    // form shuffles ~0.5 kB × candidate pairs); top1BySim then
    // reduces map-side, so the exchange is ~one row per (query, task).
    // Both vector joins are size-guarded broadcasts (the query side is
    // the corpus itself in the registry's self-join form); past the
    // guard the pair stream falls back to exchanging by qid/cid — at
    // that scale the designed operator is IVF-PQ's coded file anyway.
    top1BySim(candidates.join(maybeBroadcastVectors(va, n), "qid")
      .join(maybeBroadcastVectors(vb, n), "cid")
      // dot over PRECOMPUTED norms, not the fused cosine kernel: the
      // fused form re-folds BOTH norms per pair — 3× the arithmetic +
      // two sqrts on the pipeline's hottest path. Same value chain as
      // the oracle (dot / (nrm_a · nrm_b), withNorm's sqrt fold).
      .withColumn("sim", round(dotOverNorms(s, col("qe"), col("ce"),
        col("qn"), col("cn")), 6))
      .select(col("qid"), col("cid"), col("sim")))
  }

  /** The emb_ann_ivf pipeline body, parameterized (the registry entry
    * pins the oracle constants; emb_ann_ivf_auto sizes `cells` to the
    * corpus).
    */
  def annIvfTop1(s: SparkSession, e: DataFrame,
                 cells: Int = IvfCells,
                 iters: Int = IvfIters,
                 nProbes: Int = IvfProbes,
                 sampleN: Int = IvfSampleN,
                 queries: Option[DataFrame] = None,
                 subBits: Int = 0,
                 subProbes: Int = 1): DataFrame = {
    val n = e.count()
    // the blocked kernel keeps its single-level Int cell contract;
    // subBits > 0 only activates past 2^24 rows — far above the
    // broadcast ceiling — so the composite-key path is always the
    // declarative join (a test-scope saturation-sim run below the
    // ceiling takes the declarative path too, same semantics)
    if (n <= AnnBroadcastCeilingRows && subBits == 0) {
      // Blocked per-cell kernel (BruteForceCosine.ivfBestInCell): the
      // declarative join materializes every (query, member) pair as a
      // row — ~3 B rows at the 100× operating point, whose row
      // machinery costs ~15× the dot arithmetic (116 s vs ~25 s
      // measured). Under the corpus broadcast ceiling the inverted
      // file fits per-cell Blocks; each probe row scans its cell
      // in-cache and only cell-winners reach the top-1.
      val (assigned, probes) = annIvfSides(s, e, cells, iters, nProbes, sampleN, queries)
      top1BySim(graft.functions.BruteForceCosine.ivfBestInCell(s,
        assigned.select(col("cell"), col("cid"), col("ce")),
        probes.select(col("qid"), col("qe"), col("cell"))))
    } else
      top1BySim(annIvfCandidates(s, e, cells, iters, nProbes, sampleN, queries,
          subBits, subProbes)
        .withColumn("sim", round(dotOverNorms(s, col("qe"), col("ce"),
          col("qn"), col("cn")), 6))
        // narrow projection before the top-1 aggregation (see annLshTop1)
        .select(col("qid"), col("cid"), col("sim")))
  }

  /** IVF approximate top-k — the search-API shape a retrieval service
    * actually serves (the `_auto`/kernel paths above answer top-1; the
    * exact [[cosineTopKPlan]] answers top-k but scans all pairs). Same
    * probed candidate stage as [[annIvfTop1]]; the ranking is the
    * bounded-heap [[graft.functions.TopKByScore]] aggregate, NOT a
    * window rank — map-side partial aggregation reduces each task's
    * candidate slice to ≤ k pairs per query before the shuffle, so the
    * exchange carries O(queries · k) rows where the window form would
    * shuffle-and-sort the whole probed matrix (the exact SortAggregate
    * pathology the packed-long top-1 fix removed). Tie order (sim
    * DESC, cid ASC) matches the oracle's row_number ORDER BY, so ranks
    * are bit-stable cross-engine.
    */
  def annIvfTopK(s: SparkSession, e: DataFrame, k: Int,
                 cells: Int = IvfCells,
                 iters: Int = IvfIters,
                 nProbes: Int = IvfProbes,
                 sampleN: Int = IvfSampleN,
                 subBits: Int = 0,
                 subProbes: Int = 1): DataFrame = {
    graft.functions.TopKByScore.tuneForManyGroups(s)
    val n = e.count()
    // kernel-vs-declarative gating: see annIvfTop1
    val perCell = if (n <= AnnBroadcastCeilingRows && subBits == 0) {
      // per-cell blocked kernel (see annIvfTop1): the probed pair
      // space never becomes rows — each probe row emits its cell's
      // ≤ k best, and the aggregate below merges the partial top-ks
      // (measured: the declarative pair matrix costs 125.7 s at the
      // 100× slice; the kernel form 20.6 s — exponent 1.13 → 0.73)
      val (assigned, probes) = annIvfSides(s, e, cells, iters, nProbes, sampleN, None)
      graft.functions.BruteForceCosine.ivfTopKInCell(s,
        assigned.select(col("cell"), col("cid"), col("ce")),
        probes.select(col("qid"), col("qe"), col("cell")), k)
    } else
      annIvfCandidates(s, e, cells, iters, nProbes, sampleN,
          subBits = subBits, subProbes = subProbes)
        .withColumn("sim", round(dotOverNorms(s, col("qe"), col("ce"),
          col("qn"), col("cn")), 6))
        // narrow projection before the aggregation (see annLshTop1)
        .select(col("qid"), col("cid"), col("sim"))
    perCell
      .groupBy("qid")
      .agg(graft.functions.TopKByScore.topK(k)(col("sim"), col("cid")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "sc")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rnk"),
        col("sc.id").as("cid"), col("sc.score").as("sim"))
      .orderBy("qid", "rnk")
  }

  /** Hard-negative mining for contrastive training — per query the
    * most similar candidate with a DIFFERENT label among its top-`pool`
    * probed neighbors (the standard "ANN top-k, drop the positives"
    * recipe). Deliberately defined over the top-k POOL, not over all
    * probed pairs: the pool comes from the per-cell blocked kernel
    * (pairs never materialize as rows — the declarative pair matrix
    * measured 116 s vs 20 s at the 100× slice), and the label filter
    * + rank-1 run on O(queries · pool) rows. A query whose entire
    * pool shares its label emits no row (mined negatives are a
    * best-effort sample by construction). The label relation is
    * narrow (12 B/row) — broadcast under a generous row guard.
    */
  def hardNegatives(s: SparkSession, e: DataFrame, pool: Int = HardNegPool,
                    cells: Int = IvfCells, nProbes: Int = IvfProbes,
                    sampleN: Int = IvfSampleN,
                    subBits: Int = 0, subProbes: Int = 1): DataFrame = {
    val topk = annIvfTopK(s, e, k = pool, cells = cells,
      nProbes = nProbes, sampleN = sampleN,
      subBits = subBits, subProbes = subProbes)
    val lab = e.select(col("vec_id"), col("label"))
    def side(df: DataFrame, n: Long) =
      if (n <= 64000000L) broadcast(df) else df
    val n = e.count()
    topk
      .join(side(lab.toDF("qid", "q_label"), n), "qid")
      .join(side(lab.toDF("cid", "c_label"), n), "cid")
      .filter(col("q_label") =!= col("c_label"))
      .groupBy("qid")
      .agg(min(struct(col("rnk"), col("cid"), col("sim"), col("c_label"))).as("b"))
      .select(col("qid"), col("b.cid").as("cid"), col("b.sim").as("sim"),
        col("b.c_label").as("c_label"))
      .orderBy("qid")
  }

  /** The IVF candidate stage (everything before the exact-cosine
    * re-rank), exposed — like [[annLshCandidates]] — so AnnRecallSpec
    * can pin the probe BUDGET (candidate fraction) alongside recall.
    * Emits one (qid, cid) row per probed pair with both vectors
    * attached; (qid, cid) is unique by construction (one home cell
    * per cid, distinct probed cells per qid).
    */
  private[operators] def annIvfCandidates(s: SparkSession, e: DataFrame,
                                          cells: Int = IvfCells,
                                          iters: Int = IvfIters,
                                          nProbes: Int = IvfProbes,
                                          sampleN: Int = IvfSampleN,
                                          queries: Option[DataFrame] = None,
                                          subBits: Int = 0,
                                          subProbes: Int = 1): DataFrame = {
    val (assigned, probes) = annIvfSides(s, e, cells, iters, nProbes, sampleN,
      queries, subBits, subProbes)
    // size-guarded broadcast of the inverted file: below the ceiling
    // the cell join is map-side — the probe stream (nProbes vector
    // copies per query) and the corpus side BOTH skip their by-cell
    // exchanges, and the pair matrix materializes in place (the same
    // broadcast IVF-PQ's coded file gets unconditionally; raw vectors
    // need the row guard)
    probes.join(maybeBroadcastVectors(assigned, e.count()), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
  }

  /** The two IVF relations (inverted file + probe list), shared by the
    * declarative candidate join and the blocked per-cell kernel path.
    */
  private def annIvfSides(s: SparkSession, e: DataFrame,
                          cells: Int, iters: Int, nProbes: Int,
                          sampleN: Int,
                          queries: Option[DataFrame],
                          subBits: Int = 0,
                          subProbes: Int = 1): (DataFrame, DataFrame) = {
    graft.GraftExtensions.register(s)
    // Coarse quantizer: deterministic driver-side Lloyd's on a
    // BOUNDED sample — a k-cell quantizer is cells×64 floats, a
    // driver micro-task, never a distributed ML fit on the full
    // table (at corpus scale that would make the query pay a
    // full-corpus KMeans per invocation). The fitted centroid
    // matrix becomes a plan LITERAL.
    import s.implicits._
    // deterministic sample: the sampleN smallest vec_ids — the fit
    // (first-k init, fixed-point updates) is order-sensitive by
    // SPEC so the oracle can replay it
    val sample = e.orderBy(col("vec_id")).select(col("embedding")).limit(sampleN)
      .as[Array[Float]].collect()
    val centers = graft.functions.KMeansLite.fit(sample, k = cells, iters = iters)
    val cLit = typedlit(centers.map(_.toSeq).toSeq)
    // Cell assignment (database side, home cell) and the probe
    // list (query side, nProbes nearest cells — the standard IVF
    // recall knob, recovering neighbors just across a Voronoi
    // boundary) both run through the nearest_cells codegen kernel
    // against the literal matrix: one fused loop in the scan
    // projection, NO centroid crossJoin, NO per-vector window
    // rank, nothing shuffled for assignment at all.
    // both sides carry PRECOMPUTED norms so the per-pair re-rank is
    // dot/(qn·cn) — the fused cosine kernel re-folds both norms per
    // pair, 3× the arithmetic + two sqrts across the ~3 B pairs of
    // the 100× operating point (measured: 116 → ~45 s)
    val en = withNorm(e)
    // Two-level cell key past the coarse quantizer's clamp (see
    // [[annIvfSubBitsFor]]): coarse·2^b | b sign bits of the shared
    // plane family — one fused band_sigs codegen call alongside the
    // nearest_cells assignment, no extra fit. subBits = 0 (every
    // oracle/bench/committed-sweep scale) leaves the key — and the
    // replay SQL — bit-identical to the single-level form.
    val coarseAssign =
      element_at(call_function("nearest_cells", col("embedding"), cLit, lit(1)), 1)
    val cellAssign =
      if (subBits == 0) coarseAssign
      else coarseAssign.cast("long") * lit(1L << subBits) +
        element_at(call_function("band_sigs", col("embedding"),
          typedlit(planes(subBits)), lit(subBits)), 1)
    val assigned = en.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("nrm").as("cn"), cellAssign.as("cell"))
    // query side defaults to the corpus (self-join ANN); a separate
    // query table is the search-API shape — per-query independence
    // makes a restricted run equal the full run on those queries
    val qBase = queries.map(withNorm).getOrElse(en)
    val probes =
      if (subBits == 0)
        qBase.select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("nrm").as("qn"),
          explode(call_function("nearest_cells", col("embedding"), cLit, lit(nProbes)))
            .as("cell"))
      else
        // margin-aware sub-probing: per query, the subProbes
        // lowest-perturbation sub-signatures (band_probes — home
        // bucket first), crossed with the nProbes coarse probes. The
        // sub-signature list is computed ONCE per query row, before
        // the coarse explode, so the kernel runs n times, not
        // n·nProbes times.
        qBase.select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("nrm").as("qn"),
            call_function("nearest_cells", col("embedding"), cLit, lit(nProbes))
              .as("pcells"),
            call_function("band_probes", col("embedding"),
              typedlit(planes(subBits)), lit(subBits), lit(subProbes))
              .as("subsigs"))
          .select(col("qid"), col("qe"), col("qn"),
            explode(col("pcells")).as("ccell"), col("subsigs"))
          .select(col("qid"), col("qe"), col("qn"), col("ccell"),
            explode(col("subsigs")).as("subsig"))
          .select(col("qid"), col("qe"), col("qn"),
            (col("ccell").cast("long") * lit(1L << subBits) + col("subsig"))
              .as("cell"))
    (assigned, probes)
  }

  /** IVF-PQ top-1 (see the registry entry for the scale rationale).
    *
    * Determinism contract with the oracle: the 9 quantizer fits are
    * KMeansLite (replayable by spec); code assignment is the
    * nearest_cells kernel over each 8-dim slice (ascending-index
    * double folds, lower-index ties); the ADC tables are 8×16 partial
    * dots of query slices against the codebook LITERALS (ascending
    * zip_with folds); the per-pair ADC score folds the 8 table
    * lookups in ascending subspace order via `aggregate(sequence(…))`
    * — the same sequential left-fold DuckDB's
    * `list_sum(list_transform(range(…)))` performs — so the shortlist
    * ranking, and therefore the exact re-rank input, match
    * bit-for-bit.
    *
    * Scale shape: `assigned` (the inverted file) carries (cell, cid,
    * codes[8], nrm) — the raw embedding column is PRUNED before the
    * candidate join, so the fat side of the shuffle is ~40 bytes per
    * vector instead of ~260 (and the codes pack into one INT at 4
    * bits each if the last factor matters). The raw vectors re-enter
    * only for the n·rerank shortlist pairs.
    */
  def annIvfPqTop1(s: SparkSession, e0: DataFrame,
                   cells: Int = IvfCells,
                   iters: Int = IvfIters,
                   nProbes: Int = IvfProbes,
                   sampleN: Int = IvfSampleN,
                   rerank: Int = PqRerank,
                   queries: Option[DataFrame] = None,
                   subBits: Int = 0,
                   subProbes: Int = 1): DataFrame =
    annIvfPqStages(s, e0, cells, iters, nProbes, sampleN, rerank, queries,
      subBits = subBits, subProbes = subProbes).ranked

  /** IVF-PQ approximate top-k — the compressed-index retrieval-service
    * shape (emb_ann_ivf_topk's sibling for the regime where even the
    * raw-vector inverted file no longer broadcasts): same ADC
    * shortlist + exact re-rank, final ranking depth k instead of 1.
    */
  def annIvfPqTopK(s: SparkSession, e0: DataFrame, k: Int,
                   cells: Int = IvfCells,
                   iters: Int = IvfIters,
                   nProbes: Int = IvfProbes,
                   sampleN: Int = IvfSampleN,
                   rerank: Int = PqRerank,
                   subBits: Int = 0,
                   subProbes: Int = 1): DataFrame =
    annIvfPqStages(s, e0, cells, iters, nProbes, sampleN, rerank,
      emitK = k, subBits = subBits, subProbes = subProbes).ranked

  /** The IVF-PQ pipeline with its intermediate stages exposed (test
    * scope uses this to attribute wall time per phase — PqProfile —
    * and to pin plan shapes); annIvfPqTop1 is stages.ranked at
    * emitK = 1 ((qid, cid, sim)); emitK > 1 ranks to depth k
    * ((qid, rnk, cid, sim)).
    */
  private[operators] final case class IvfPqStages(
      assigned: DataFrame, probes: DataFrame, pairs: DataFrame,
      shortlist: DataFrame, ranked: DataFrame)

  private[operators] def annIvfPqStages(s: SparkSession, e0: DataFrame,
                   cells: Int = IvfCells,
                   iters: Int = IvfIters,
                   nProbes: Int = IvfProbes,
                   sampleN: Int = IvfSampleN,
                   rerank: Int = PqRerank,
                   queries: Option[DataFrame] = None,
                   emitK: Int = 1,
                   subBits: Int = 0,
                   subProbes: Int = 1): IvfPqStages = {
    graft.GraftExtensions.register(s)
    graft.functions.TopKByScore.tuneForManyGroups(s)
    import s.implicits._
    val e = withNorm(e0)
    // optional query restriction (recall measurement): per-query
    // independence means the restricted run equals the full run on
    // those queries — the corpus side (quantizers, inverted file) is
    // always the FULL e0
    val q = queries.map(withNorm).getOrElse(e)
    val sample = e0.orderBy(col("vec_id")).select(col("embedding")).limit(sampleN)
      .as[Array[Float]].collect()
    val coarse = graft.functions.KMeansLite.fit(sample, k = cells, iters = iters)
    val coarseLit = typedlit(coarse.map(_.toSeq).toSeq)
    val books = Array.tabulate(PqM) { m =>
      graft.functions.KMeansLite.fit(
        sample.map(_.slice(m * PqSub, (m + 1) * PqSub)), k = PqCodes, iters = iters)
    }
    def bookLit(m: Int) = typedlit(books(m).map(_.toSeq).toSeq)
    // Inverted file: home cell + the 8 PQ codes + exact norm; the raw
    // vector is dropped here — the whole point of the PQ form.
    // Two-level cell key past the coarse clamp (annIvfSubBitsFor —
    // see annIvfSides): subBits = 0 at every oracle/bench scale keeps
    // the key, and the replay SQL, bit-identical.
    val coarseAssign =
      element_at(call_function("nearest_cells", col("embedding"), coarseLit, lit(1)), 1)
    val cellAssign =
      if (subBits == 0) coarseAssign
      else coarseAssign.cast("long") * lit(1L << subBits) +
        element_at(call_function("band_sigs", col("embedding"),
          typedlit(planes(subBits)), lit(subBits)), 1)
    val assigned = e.select(col("vec_id").as("cid"),
      cellAssign.as("cell"),
      array((0 until PqM).map(m =>
        element_at(call_function("nearest_cells",
          slice(col("embedding"), m * PqSub + 1, PqSub), bookLit(m), lit(1)), 1)): _*)
        .as("codes"),
      col("nrm"))
    // Query side: probe list + ADC tables (8 subspaces × 16 codes of
    // partial dots against the codebook literals — computed once per
    // query row, a lookup per candidate pair afterwards).
    val adcCol = array((0 until PqM).map { m =>
      transform(bookLit(m), cb =>
        aggregate(zip_with(slice(col("embedding"), m * PqSub + 1, PqSub), cb,
          (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, v) => a + v))
    }: _*)
    // Materialization barrier: without it CollapseProject inlines the
    // ADC-table construction into the per-pair adc_sum and re-derives
    // all 8×16 partial dots for EVERY candidate pair instead of once
    // per (query, probe) row — the same trap withNorm documents,
    // measured at 2.5× total wall on the 10× slice.
    //
    // The barrier sits at QUERY granularity, with the probe explode
    // AFTER it: the zip_with/aggregate table construction is
    // interpreted (not codegen), and putting the explode in the same
    // projection re-evaluated it once per PROBE row — nProbes× the
    // work and an nProbes×-wider cache. PqProfile measured the
    // round-11 difference at the 100× slice: 153.5 s → 6.6 s for the
    // probe materialization, with the cache shrinking 6.4 M rows ×
    // ~1.3 kB → 200 k rows.
    val qCols = Seq(col("vec_id").as("qid"),
      call_function("nearest_cells", col("embedding"), coarseLit, lit(nProbes))
        .as("pcells")) ++
      (if (subBits == 0) Nil
       else Seq(call_function("band_probes", col("embedding"),
         typedlit(planes(subBits)), lit(subBits), lit(subProbes))
         .as("subsigs"))) ++
      Seq(adcCol.as("adc"), col("nrm").as("qnrm"), col("embedding").as("qe"))
    val qSide = q.select(qCols: _*)
      .transform(graft.Caching.persistOnce(_))
    val probes =
      if (subBits == 0)
        qSide.select(col("qid"), explode(col("pcells")).as("cell"),
          col("adc"), col("qnrm"))
      else
        // coarse probes × margin-ranked sub-signatures (see
        // annIvfSides) — both lists come from the SAME cached qSide
        // row, so the ADC tables are still built once per query
        qSide.select(col("qid"), explode(col("pcells")).as("ccell"),
            col("subsigs"), col("adc"), col("qnrm"))
          .select(col("qid"), col("ccell"),
            explode(col("subsigs")).as("subsig"), col("adc"), col("qnrm"))
          .select(col("qid"),
            (col("ccell").cast("long") * lit(1L << subBits) + col("subsig"))
              .as("cell"),
            col("adc"), col("qnrm"))
    // Per-pair ADC score through the adc_sum codegen kernel (one flat
    // lookup loop — this runs once per candidate pair, the pipeline's
    // hottest expression; the higher-order aggregate(sequence(…))
    // equivalent is interpreted per element).
    val adcSim = call_function("adc_sum", col("adc"), col("codes")) /
      (col("qnrm") * col("nrm"))
    // ADC shortlist as a BOUNDED top-k AGGREGATE, not a window: the
    // TopKByScore Aggregator gets map-side partial aggregation, so
    // each task reduces its candidate slice to ≤ rerank pairs per
    // query BEFORE the exchange — the shuffle carries O(q·rerank·
    // tasks) rows instead of the full candidate matrix, and no global
    // sort happens at all. Same (score desc, id asc) order and
    // truncation as the oracle's row_number shortlist.
    // broadcast(assigned) is the PQ payoff made explicit: the coded
    // inverted file is ~40 B/vector (12 MB at 200 k — just past the
    // default autoBroadcast threshold, which is why the hint matters:
    // without it the planner shuffles the 1 KB-ADC probe side BY CELL
    // — measured 7.6 GB / 1360 s at the 100× slice), where the
    // raw-vector side plain IVF joins never fit. Beyond the coded
    // file's own broadcast ceiling (~25 M vectors × 40 B ≈ 1 GB) the
    // hint comes OFF and the join shuffles both sides by cell — the
    // sub-split regime (annIvfSubBitsFor) lands here, where the
    // composite key's ≤512-member buckets keep the shuffled pair
    // stream linear in n.
    val nCorpusEarly = e.count()
    val codedFile =
      if (nCorpusEarly <= 25000000L) broadcast(assigned) else assigned
    val pairs = probes.join(codedFile, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
    val shortlist = pairs
      .withColumn("adc_sim", adcSim)
      .select(col("qid"), col("cid"), col("adc_sim"))
      .groupBy("qid")
      .agg(graft.functions.TopKByScore.topK(rerank)(col("adc_sim"), col("cid")).as("top"))
      .select(col("qid"), explode(col("top.id")).as("cid"))
    val va = q.select(col("vec_id").as("qid"), col("embedding").as("qe"),
      col("nrm").as("qn"))
    val vb = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("nrm").as("cn"))
    // Size-guarded broadcasts for the exact re-rank: the shortlist is
    // n·rerank rows (≈ 700 M at the 100× operating point) — without
    // the hints the planner sort-merge-joins it TWICE, sorting and
    // spilling the widened pair stream (the round-11 rerun filled
    // 78 GB of spill before dying). Broadcast keeps the re-rank one
    // map-side stage into the top-1 partials.
    val nCorpus = nCorpusEarly
    // kernel-vs-declarative gating: see annIvfTop1 (the kernel keeps
    // its single-level Int cell contract; subBits > 0 implies the
    // declarative join)
    val ranked =
      if (nCorpus <= AnnBroadcastCeilingRows && subBits == 0) {
        // Whole-pipeline kernel (BruteForceCosine.ivfPqTopKKernel):
        // under the ceiling the declarative form's candidate-matrix
        // row machinery and the n·rerank heap exchange dominate the
        // ADC arithmetic (the ivfBestInCell measurement, PQ edition);
        // each step replicates its declarative twin exactly — the ADC
        // tables are read from the SAME cached qSide rows Spark
        // computed. Past the ceiling the declarative join+aggregate
        // below is the design (the coded file broadcasts ~20× further
        // than raw vectors — exactly that regime keeps it).
        val k = graft.functions.BruteForceCosine.ivfPqTopKKernel(s,
          qSide.select(col("qid"), col("pcells"), col("adc"),
            col("qnrm"), col("qe")),
          assigned.select(col("cell"), col("cid"), col("codes"), col("nrm")),
          e.select(col("vec_id"), col("embedding")), rerank, emitK)
        if (emitK == 1) k.select(col("qid"), col("cid"), col("sim"))
        else k
      } else {
        val exact = shortlist
          .join(maybeBroadcastVectors(va, nCorpus), "qid")
          .join(maybeBroadcastVectors(vb, nCorpus), "cid")
          .withColumn("sim", round(dotOverNorms(s, col("qe"), col("ce"),
            col("qn"), col("cn")), 6))
          .select(col("qid"), col("cid"), col("sim"))
        if (emitK == 1) top1BySim(exact)
        else exact.groupBy("qid")
          .agg(graft.functions.TopKByScore.topK(emitK)(col("sim"), col("cid")).as("top"))
          .select(col("qid"), posexplode(col("top")).as(Seq("pos", "sc")))
          .select(col("qid"), (col("pos") + 1).cast("int").as("rnk"),
            col("sc.id").as("cid"), col("sc.score").as("sim"))
          .orderBy("qid", "rnk")
      }
    IvfPqStages(assigned, probes, pairs, shortlist, ranked)
  }

  /** Candidate-id headroom of the top-1 encoding below: cid must fit
    * in [0, 2^43) — ~8.8e12 ids, an order of magnitude past a
    * 100 TB / 256 B-per-vector corpus — so that sim_micro ∈ [-1e6, 1e6]
    * times 2^43 plus the id stays inside a signed long (8.80e18 <
    * Long.Max 9.22e18).
    */
  private val Top1CidSpace = 1L << 43

  /** Aggregation-shaped exact-top-1: row-for-row equal to
    * `row_number().over(partitionBy(qid).orderBy(sim desc, cid asc))
    * = 1` — highest sim, ties to the LOWEST cid.
    *
    * The (sim, cid) order is packed into ONE long —
    * `round(sim·1e6)·2^43 + (2^43−1−cid)` — because that is what makes
    * the aggregate actually hash-based: `max(struct(sim, -cid))`, the
    * previous form, has an immutable struct buffer, so Spark silently
    * planned SortAggregateExec and SORTED (and at the 100× slice,
    * SPILLED) every partition's full candidate slice by qid before
    * combining — the very cost this helper exists to avoid. A long
    * max runs as whole-stage-codegen HashAggregate with map-side
    * partial combine: each task reduces its slice to one row per query
    * before the exchange. Encoding is exact: sim is already rounded to
    * 6 decimals, so round(sim·1e6) recovers the integer k exactly, and
    * k/1e6 at decode is the identical correctly-rounded double;
    * lexicographic (sim_micro, −cid) order is preserved because the id
    * term stays in [0, 2^43). Decode uses shiftright (arithmetic =
    * floor division by 2^43, correct for negative sim).
    */
  private def top1BySim(cands: DataFrame): DataFrame = {
    // The encode re-rounds sim to micros itself (idempotent when the
    // caller already rounded to 6 decimals, as every current caller
    // does), so an unrounded sim cannot corrupt the packed order — it
    // is simply snapped to the micro grid the decode emits. The cid
    // range invariant CAN'T be absorbed that way, so it fails loudly:
    // assert_true is codegen'd, returns NULL on pass (filter keeps the
    // row), and raises on the first violating row instead of silently
    // wrapping into a wrong winner.
    val guard = assert_true(col("cid") >= 0 && col("cid") < Top1CidSpace,
      lit(s"top1BySim: cid outside [0, $Top1CidSpace)"))
    val enc = round(col("sim") * 1e6).cast("long") * Top1CidSpace +
      (lit(Top1CidSpace - 1) - col("cid"))
    val sm = shiftright(col("m"), 43)
    cands
      .filter(guard.isNull)
      .select(col("qid"), enc.as("enc"))
      .groupBy("qid").agg(max(col("enc")).as("m"))
      .select(col("qid"),
        (lit(Top1CidSpace - 1) - (col("m") - sm * Top1CidSpace)).as("cid"),
        (sm.cast("double") / 1e6).as("sim"))
      .orderBy("qid")
  }
}
