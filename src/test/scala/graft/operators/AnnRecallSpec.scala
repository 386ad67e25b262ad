package graft.operators

import graft.SparkSpec

/** Quantified recall of the two ANN scale paths against exact
  * brute-force top-1 (computed on the driver — 500 vectors at
  * sf0.001). ANN is useful only if its recall is KNOWN; this pins a
  * floor so a regression in the hashing/quantizer kernels shows up as
  * a number, not a hunch.
  */
class AnnRecallSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** qid -> (top-1 cid, top-1 sim), exact, with the queries' rounding
    * and (sim desc, cid asc) tie-break.
    */
  private lazy val exactTop1: Map[Long, (Long, Double)] = {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val norms = vecs.map { case (id, v) =>
      id -> math.sqrt(v.map(x => x.toDouble * x).sum)
    }.toMap
    vecs.map { case (qid, q) =>
      val best = vecs.filter(_._1 != qid).map { case (cid, c) =>
        val dot = q.zip(c).map { case (a, b) => a.toDouble * b }.sum
        (BigDecimal(dot / (norms(qid) * norms(cid)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, cid)
      }.maxBy { case (sim, cid) => (sim, -cid) }
      qid -> (best._2, best._1)
    }.toMap
  }

  /** (exact-top-1 recall, coverage, fraction of answered queries whose
    * returned similarity is >= 90% of the exact top-1 similarity).
    * On THIS corpus (uncorrelated random vectors, top-1 sim ~0.5 amid
    * dense near-ties) exact recall@1 is the adversarial metric; the
    * approximation ratio is the standard ANN quality measure.
    */
  private def metricsOf(name: String): (Double, Double, Double) = {
    val got = Registry.byName(name).run(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val hits = got.count { case (qid, (cid, _)) => exactTop1(qid)._1 == cid }
    val close = got.count { case (qid, (_, sim)) => sim >= 0.9 * exactTop1(qid)._2 }
    (hits.toDouble / exactTop1.size,
      got.size.toDouble / exactTop1.size,
      if (got.isEmpty) 0.0 else close.toDouble / got.size)
  }

  // Floors sit a margin under the values measured on this corpus —
  // uncorrelated random vectors are ANN's adversarial case (no cluster
  // structure to exploit; sublinear probing fundamentally caps recall),
  // so these numbers quantify the cost/recall knob, not a defect.
  // Measured at pinning time: IVF 0.564/1.000/0.770 (replayable fit:
  // first-k init + fixed-point updates), LSH (16 bands × 10 bits,
  // query-aware perturbation-set probing, 9 probes/band)
  // 0.656/1.000/0.832 — vs round 6's 0.690/1.000/0.868 at 0.25
  // candidate fraction; this config re-ranks 38% less (0.155). Both
  // pipelines are additionally hash-verified end-to-end by their
  // DuckDB replay oracles; these floors remain the QUALITY gate (the
  // oracle proves the construction, not that the construction is any
  // good).

  test("IVF ANN (nProbe=3) covers every query and approximates top-1 well") {
    val (recall, coverage, close) = metricsOf("emb_ann_ivf")
    info(f"emb_ann_ivf recall@1=$recall%.3f coverage=$coverage%.3f approx90=$close%.3f")
    assert(coverage == 1.0, "IVF must emit a candidate for every query")
    assert(recall >= 0.45, f"IVF recall@1 degraded: $recall%.3f")
    assert(close >= 0.65, f"IVF approximation ratio degraded: $close%.3f")
  }

  test("IVF-PQ ANN: ADC shortlist + exact re-rank holds recall near plain IVF") {
    val (recall, coverage, close) = metricsOf("emb_ann_ivfpq")
    info(f"emb_ann_ivfpq recall@1=$recall%.3f coverage=$coverage%.3f approx90=$close%.3f")
    assert(coverage == 1.0, "IVF-PQ must emit a candidate for every query")
    // PQ re-ranks the top-32 ADC-scored candidates of the SAME coarse
    // candidate set as emb_ann_ivf (recall 0.564 at pinning time), so
    // its recall is bounded above by IVF's; the gap measures ADC
    // ranking distortion at 4 bits/subspace. Floor sits under the
    // measured value with the usual margin.
    val (ivfRecall, _, _) = metricsOf("emb_ann_ivf")
    assert(recall >= ivfRecall - 0.10,
      f"ADC shortlist ranking lost too much vs plain IVF: $recall%.3f vs $ivfRecall%.3f")
    assert(close >= 0.60, f"IVF-PQ approximation ratio degraded: $close%.3f")
  }

  test("IVF top-k: recall@5 against exact brute-force top-5") {
    // exact top-5 per query, same rounding + (sim desc, cid asc) order
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val norms = vecs.map { case (id, v) =>
      id -> math.sqrt(v.map(x => x.toDouble * x).sum)
    }.toMap
    val exact5: Map[Long, Set[Long]] = vecs.map { case (qid, q) =>
      qid -> vecs.filter(_._1 != qid).map { case (cid, c) =>
        val dot = q.zip(c).map { case (a, b) => a.toDouble * b }.sum
        (BigDecimal(dot / (norms(qid) * norms(cid)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, cid)
      }.sortBy { case (sim, cid) => (-sim, cid) }.take(5).map(_._2).toSet
    }.toMap
    val got = Registry.byName("emb_ann_ivf_topk").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val coverage = got.size.toDouble / exact5.size
    val recall5 = exact5.map { case (qid, ex) =>
      got.getOrElse(qid, Set.empty[Long]).count(ex).toDouble / ex.size
    }.sum / exact5.size
    info(f"emb_ann_ivf_topk recall@5=$recall5%.3f coverage=$coverage%.3f")
    assert(coverage == 1.0, "IVF top-k must answer every query")
    // same probe budget as emb_ann_ivf_auto; floor sits a margin under
    // the value measured at pinning time (0.466 on this corpus)
    assert(recall5 >= 0.38, f"IVF top-k recall@5 degraded: $recall5%.3f")
  }

  test("banded LSH ANN covers every query and approximates top-1 well") {
    val (recall, coverage, close) = metricsOf("emb_ann_lsh")
    info(f"emb_ann_lsh recall@1=$recall%.3f coverage=$coverage%.3f approx90=$close%.3f")
    // the first (single 16-bit band) form of the query had coverage
    // 0.000 here — this floor is what caught it
    assert(coverage >= 0.95, f"LSH coverage collapsed: $coverage%.3f")
    assert(recall >= 0.60, f"LSH recall@1 degraded: $recall%.3f")
    assert(close >= 0.78, f"LSH approximation ratio degraded: $close%.3f")
  }

  // ------------------------------------------------------------------
  // 10×-slice recall (the round-8 lesson: auto hash-width alone kept
  // the wall sub-quadratic but recall collapsed 0.656 → 0.271 because
  // the probe budget stayed at the oracle constants). These tests pin
  // the SCALED budget's recall on the 10× slice (n = 20 000; built by
  // tools/make_sf1ish.py — seeded, so the numbers are deterministic)
  // and skip when the slice is absent. Per-query independence lets
  // them run the auto pipelines restricted to a 500-query sample: the
  // restricted results equal the full run's on those queries, at 1/40
  // the re-rank cost.

  private val slice10x = "tmp/sf1ish"

  private def slice10xEmb: Option[org.apache.spark.sql.DataFrame] = {
    if (!new java.io.File(s"$slice10x/embeddings.parquet").exists()) None
    else Some(spark.read.parquet(s"$slice10x/embeddings.parquet")
      .select("vec_id", "embedding"))
  }

  /** Exact top-1 for the sampled queries (distributed crossJoin with
    * the same rounding/tie-break as the ANN pipelines).
    */
  private def exactTop1On(corpus: org.apache.spark.sql.DataFrame,
                          q: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    graft.GraftExtensions.register(spark)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    q.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(corpus.select(col("vec_id").as("cid"), col("embedding").as("ce")))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", round(call_function("cosine_sim", col("qe"), col("ce")), 6))
      .select("qid", "cid", "sim")
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
  }

  test("10× slice: the LSH auto's scaled budget holds recall ≥ 0.55 at fraction ≤ 0.06") {
    import org.apache.spark.sql.functions._
    assume(slice10xEmb.isDefined, "10× slice tmp/sf1ish not present")
    val e = slice10xEmb.get
    val n = e.count()
    val q = e.filter(col("vec_id") % 40 === 0)
    val exact = exactTop1On(e, q)
    val (bands, bits, probes) = (EmbeddingQueries.annLshBandsFor(n),
      EmbeddingQueries.annLshBitsFor(n), EmbeddingQueries.annLshProbesFor(n))
    val got = EmbeddingQueries.annLshTop1(spark, e, bands, bits, probes, Some(q))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = got.count { case (qid, cid) => exact(qid)._1 == cid }.toDouble / exact.size
    val frac = EmbeddingQueries.annLshCandidates(spark, e, bands, bits, probes, Some(q))
      .count().toDouble / (exact.size.toDouble * n)
    info(f"10× LSH auto (bands=$bands bits=$bits probes=$probes): recall=$recall%.3f fraction=$frac%.4f")
    // measured 0.594 @ 0.046 — deterministic on the seeded slice
    assert(recall >= 0.55, f"10× LSH auto recall eroded: $recall%.3f")
    assert(frac <= 0.06, f"10× LSH auto candidate budget blown: $frac%.4f")
  }

  test("10× slice: the IVF auto's scaled probe budget holds recall ≥ 0.55 at fraction ≤ 0.15") {
    import org.apache.spark.sql.functions._
    assume(slice10xEmb.isDefined, "10× slice tmp/sf1ish not present")
    val e = slice10xEmb.get
    val n = e.count()
    val q = e.filter(col("vec_id") % 40 === 0)
    val exact = exactTop1On(e, q)
    val cells = EmbeddingQueries.ivfCellsFor(n)
    val nProbe = EmbeddingQueries.ivfProbesFor(n)
    val sampleN = EmbeddingQueries.ivfSampleFor(cells)
    val got = EmbeddingQueries.annIvfTop1(spark, e, cells = cells, nProbes = nProbe,
        sampleN = sampleN, queries = Some(q))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = got.count { case (qid, cid) => exact(qid)._1 == cid }.toDouble / exact.size
    val frac = EmbeddingQueries.annIvfCandidates(spark, e, cells = cells,
        nProbes = nProbe, sampleN = sampleN, queries = Some(q))
      .count().toDouble / (exact.size.toDouble * n)
    info(f"10× IVF auto (cells=$cells nProbe=$nProbe): recall=$recall%.3f fraction=$frac%.4f")
    // measured 0.590 @ 0.128 — deterministic on the seeded slice
    assert(recall >= 0.55, f"10× IVF auto recall eroded: $recall%.3f")
    assert(frac <= 0.15, f"10× IVF auto candidate budget blown: $frac%.4f")
  }

  test("10× slice: the IVF-PQ auto holds recall near plain-IVF auto at the scaled budget") {
    import org.apache.spark.sql.functions._
    assume(slice10xEmb.isDefined, "10× slice tmp/sf1ish not present")
    val e = slice10xEmb.get
    val n = e.count()
    val q = e.filter(col("vec_id") % 40 === 0)
    val exact = exactTop1On(e, q)
    val cells = EmbeddingQueries.ivfCellsFor(n)
    val nProbes = EmbeddingQueries.ivfProbesFor(n)
    val rerank = EmbeddingQueries.pqRerankFor(n, cells, nProbes)
    val got = EmbeddingQueries.annIvfPqTop1(spark, e, cells = cells,
        nProbes = nProbes, sampleN = EmbeddingQueries.ivfSampleFor(cells),
        rerank = rerank, queries = Some(q))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = got.count { case (qid, cid) => exact(qid)._1 == cid }.toDouble / exact.size
    info(f"10× IVF-PQ auto (cells=$cells rerank=$rerank): recall=$recall%.3f")
    // A FIXED rerank budget is the parametric scale trap this test
    // exists to catch: at rerank=32 the 10× recall collapsed to 0.242
    // (ADC rank of the true neighbor scatters over a constant FRACTION
    // of the ~2500 probe candidates, so a constant count keeps an
    // ever-thinner slice). pqRerankFor's ¼-of-candidates budget
    // measured 0.572 here — 96% of the plain-IVF 0.590 ceiling; floor
    // sits under it with the usual margin.
    assert(recall >= 0.50, f"10× IVF-PQ auto recall eroded: $recall%.3f")
  }

  test("100× slice: IVF-PQ auto recall at 200k vectors (where the re-rank cap nearly binds)") {
    import org.apache.spark.sql.functions._
    val path = "tmp/sf100ish/embeddings.parquet"
    assume(new java.io.File(path).exists(), "100× slice tmp/sf100ish not present")
    val e = spark.read.parquet(path).select("vec_id", "embedding")
    val n = e.count()
    assume(n >= 100000, s"slice too small for the 100× check: $n")
    // 1-in-1000 query sample: per-query independence makes the
    // restricted run equal the full run on these queries
    val q = e.filter(col("vec_id") % 1000 === 0)
    val exact = exactTop1On(e, q)
    val cells = EmbeddingQueries.ivfCellsFor(n)
    val nProbes = EmbeddingQueries.ivfProbesFor(n)
    val rerank = EmbeddingQueries.pqRerankFor(n, cells, nProbes)
    val got = EmbeddingQueries.annIvfPqTop1(spark, e, cells = cells,
        nProbes = nProbes, sampleN = EmbeddingQueries.ivfSampleFor(cells),
        rerank = rerank, queries = Some(q))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = got.count { case (qid, cid) => exact(qid)._1 == cid }.toDouble / exact.size
    info(f"100× IVF-PQ auto (cells=$cells nProbes=$nProbes rerank=$rerank): recall=$recall%.3f over ${exact.size} queries")
    // pqRerankFor at 200 k: the ¼-of-candidates formula (3572) is cut
    // by the measured-knee cap at 2048 (RerankTune: recall 0.598 vs
    // 0.613 — the cap trades 0.015 recall for 43% less exact re-rank);
    // past this scale the documented operating-point handoff is plain
    // IVF (see pqRerankFor's scaladoc). The measured value on the
    // seeded slice is recorded in BASELINE.md's round-11 sweep row;
    // floor sits below it with the usual margin.
    assert(recall >= 0.40, f"100× IVF-PQ auto recall eroded: $recall%.3f")
  }

  test("saturation-sim: the two-level ANN key halves the probed candidates at a pinned recall floor") {
    // The coarse quantizer's saturation regime (membership > 4096,
    // reached past n = 2^24 at the 4096-cell clamp) simulated at
    // 1/100 scale: 200 k vectors at cells = 48 give the SAME probed
    // membership (~4 167) and the same sub-split width (b = 4,
    // AnnAutoSizeSpec pins the coincidence) as ~17 M vectors at the
    // real clamp — what decides the recall-coverage trade is the
    // membership and b, not the absolute n. The full-scale run (the
    // 2^25-vector slice, tools/make_bigemb.py + AnnSubCellProfile) is
    // the linearity demonstration; this test is the per-commit gate.
    import org.apache.spark.sql.functions._
    val path = "tmp/sf100ish/embeddings.parquet"
    assume(new java.io.File(path).exists(), "100× slice tmp/sf100ish not present")
    val e = spark.read.parquet(path).select("vec_id", "embedding")
    val n = e.count()
    assume(n >= 100000, s"slice too small for the saturation sim: $n")
    val cells = 48 // forces membership ≈ 4 167 — the saturated regime
    val nProbes = math.min(64, math.ceil(1.5 * math.sqrt(cells.toDouble)).toInt)
    val sampleN = EmbeddingQueries.ivfSampleFor(cells)
    val subBits = EmbeddingQueries.annIvfSubBitsFor(n, cells)
    val subProbes = EmbeddingQueries.AnnIvfSubProbes
    assert(subBits === 4, s"saturation sim expects b=4, formula gave $subBits")
    val q = e.filter(col("vec_id") % 500 === 0)
    val exact = exactTop1On(e, q)

    val candFlat = EmbeddingQueries.annIvfCandidates(spark, e, cells = cells,
      nProbes = nProbes, sampleN = sampleN, queries = Some(q)).count()
    val candSub = EmbeddingQueries.annIvfCandidates(spark, e, cells = cells,
      nProbes = nProbes, sampleN = sampleN, queries = Some(q),
      subBits = subBits, subProbes = subProbes).count()
    // expected candidate cut = subProbes/2^b = 8/16: probing 8 of 16
    // sub-buckets sees half the probed coarse membership
    assert(candSub.toDouble <= 0.60 * candFlat,
      s"sub-split did not cut the candidate stream: $candSub vs $candFlat")
    assert(candSub.toDouble >= 0.30 * candFlat,
      s"sub-split over-cut (probe coverage broken?): $candSub vs $candFlat")

    def recallOf(subB: Int, subP: Int): Double = {
      val got = EmbeddingQueries.annIvfTop1(spark, e, cells = cells,
          nProbes = nProbes, sampleN = sampleN, queries = Some(q),
          subBits = subB, subProbes = subP)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got.count { case (qid, cid) => exact(qid)._1 == cid }.toDouble / exact.size
    }
    val rFlat = recallOf(0, 1)
    val rSub = recallOf(subBits, subProbes)
    info(f"saturation-sim (cells=$cells nProbes=$nProbes b=$subBits s=$subProbes): " +
      f"recall flat=$rFlat%.3f sub=$rSub%.3f, candidates flat=$candFlat sub=$candSub")
    // margin-aware sub-probing must keep most of the flat recall at
    // half the candidates (floors pinned from the seeded slice's
    // measured values with the usual margin; measured at pinning
    // time: flat 0.765, sub 0.678 — an 89% retention while the
    // candidate stream halves: the 8 lowest-perturbation subsets
    // carry nearly all the neighbor mass, which is what makes the
    // sub-split an acceptable price in the saturated regime)
    assert(rSub >= 0.60, f"sub-split recall eroded: $rSub%.3f")
    assert(rSub >= 0.75 * rFlat, f"sub-split lost too much of flat recall: $rSub%.3f vs $rFlat%.3f")
  }

  test("LSH candidate budget: the probe set stays a small fraction of the pair space") {
    // The recall floors above are HALF the contract: without a budget
    // ceiling, a tuning change could buy them back by probing toward
    // the full pair space (quadratic re-ranking — exactly what LSH
    // exists to avoid). Round 6's all-bit 1-flip probing spent ≈0.25
    // of the pair space; query-aware perturbation-set probing (16
    // bands × 10 bits × 9 probes) measured 0.155 at recall 0.656 —
    // the measured Pareto point at the recall target (the full
    // frontier sweep is in annLshCandidates' scaladoc).
    val emb = graft.Tables.embeddings(spark, sf)
    val nVec = emb.count().toDouble
    val candidates = EmbeddingQueries.annLshCandidates(spark, emb).count().toDouble
    val fraction = candidates / (nVec * nVec)
    info(f"emb_ann_lsh candidate fraction=$fraction%.4f (${candidates.toLong} pairs over ${nVec.toLong}²)")
    assert(fraction <= 0.17, f"LSH candidate budget blown: $fraction%.4f of the pair space")
    assert(fraction > 0.0, "no candidates at all — the bucket join is broken")
  }
}
