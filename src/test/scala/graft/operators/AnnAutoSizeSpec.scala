package graft.operators

import graft.SparkSpec

/** Corpus-sized ANN parameters: at the oracle scale the auto twins
  * must COINCIDE with the pinned-constant entries (so the hash-verified
  * point also verifies the auto path), and the sizing formulas must
  * grow with n the way the 10× slice measurement demands (BASELINE.md
  * sf-scaling row: fixed bits/cells went 22×/46× at 10× data).
  */
class AnnAutoSizeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sizing formulas: pinned at the oracle point, logarithmic/sqrt growth beyond") {
    // sf0.01 (500) and sf0.1 (2 000) both sit on the bits floor
    assert(EmbeddingQueries.annLshBitsFor(2000) === 10)
    // 10× data: +3-4 bits keeps bucket occupancy ~2
    assert(EmbeddingQueries.annLshBitsFor(20000) === 14)
    assert(EmbeddingQueries.annLshBitsFor(200000) === 17)
    // never below the verified floor, capped at 24 bits
    assert(EmbeddingQueries.annLshBitsFor(10) === 10)
    assert(EmbeddingQueries.annLshBitsFor(1000000000L) === 24)

    assert(EmbeddingQueries.ivfCellsFor(200) === 16) // floor = oracle point
    assert(EmbeddingQueries.ivfCellsFor(20000) === 142) // ~sqrt(n)
    assert(EmbeddingQueries.ivfCellsFor(100000000L) === 4096) // cap
  }

  test("SemDeDup sub-split: no-op at oracle/bench scale, membership bounded past the cell clamp") {
    import EmbeddingQueries.{ivfCellsFor, semDedupSubBitsFor}
    // oracle (500) and bench (2 000) scales sit under the membership
    // target → sub-split is a no-op and the pinned single-level
    // DuckDB replay verifies the auto path verbatim
    for (n <- Seq(500L, 2000L, 10000L))
      assert(semDedupSubBitsFor(n, ivfCellsFor(n)) === 0, s"n=$n")
    // membership ~√n crosses the 128 target at n ≈ 16 k — from there
    // the sub-split keeps the pair join LINEAR (n·m) instead of the
    // n^1.5 cells-only shape (10×/100× slices: b = 1 and 2)
    assert(semDedupSubBitsFor(20000L, ivfCellsFor(20000L)) === 1)
    assert(semDedupSubBitsFor(200000L, ivfCellsFor(200000L)) === 2)
    // past the 4096-cell clamp the pair join would grow n²/4096
    // without the sub-split; with it, expected per-bucket membership
    // n/(cells·2^b) stays within 2× of the 128 target at every scale
    // the 20-bit cap does not bind (up to ~10^12 vectors it doesn't)
    for (n <- Seq(17000000L, 100000000L, 1000000000L, 100000000000L)) {
      val cells = ivfCellsFor(n)
      val b = semDedupSubBitsFor(n, cells)
      assert(b > 0, s"n=$n")
      val membership = n.toDouble / (cells.toDouble * (1L << b))
      assert(membership <= 256.0, s"n=$n membership=$membership")
    }
    // at 1 B vectors: 4096 cells × 2^11 subcells → membership ~119
    assert(semDedupSubBitsFor(1000000000L, 4096) === 11)
  }

  test("ANN sub-split: no-op up to the coarse clamp, per-query candidates frozen past it") {
    import EmbeddingQueries.{annIvfSubBitsFor, ivfCellsFor,
      AnnIvfSubProbes, AnnIvfTargetMembership}
    // below AND AT the clamp point the formula is a pinned no-op —
    // every oracle (500), bench (2 000), and committed-sweep scale
    // (20 k / 200 k) replays the single-level construction verbatim,
    // and activation starts strictly past n = 2^24 at the 4096-cell
    // clamp (below the clamp membership ≈ √n ≤ 4096 never triggers)
    for (n <- Seq(500L, 2000L, 20000L, 200000L, 1000000L, 1L << 24))
      assert(annIvfSubBitsFor(n, ivfCellsFor(n)) === 0, s"n=$n")
    // past the clamp: probed-bucket membership ≤ the 512 target
    // (within rounding), so per-query candidates freeze at
    // nProbes·subProbes·target = 64·8·512 = 2^18 — the clamp
    // boundary's own per-query budget (64·4096) — and the total
    // candidate stream is LINEAR in n instead of n²/64
    for (n <- Seq(20000000L, 33554432L, 100000000L, 1000000000L, 100000000000L)) {
      val b = annIvfSubBitsFor(n, 4096)
      assert(b > 0, s"n=$n")
      val membership = n.toDouble / (4096.0 * (1L << b))
      assert(membership <= AnnIvfTargetMembership.toDouble,
        s"n=$n membership=$membership")
      assert(membership > AnnIvfTargetMembership / 2.0 || b === 20,
        s"n=$n oversplit: membership=$membership at b=$b")
    }
    // the exact demo points (AnnRecallSpec saturation-sim + the
    // big-slice profile): 2·2^24 → b=4, membership 512 exactly
    assert(annIvfSubBitsFor(2L << 24, 4096) === 4)
    // saturation-sim at 1/100 scale: same membership regime
    // (200 k / 48 cells = 4 167 > subProbes·target) → b = 4
    assert(annIvfSubBitsFor(200000L, 48) === 4)
    // sub-probes stay within the band_probes kernel's subset space
    assert(AnnIvfSubProbes <= (1 << graft.functions.BandProbes.ProbeWidth))
  }

  test("recall-budget formulas: pinned at the oracle point, bands×2/decade, probes to the kernel ceiling") {
    // floors cover both oracle (500) and bench (2 000) scales
    assert(EmbeddingQueries.annLshBandsFor(500) === 16)
    assert(EmbeddingQueries.annLshBandsFor(2048) === 16)
    assert(EmbeddingQueries.annLshProbesFor(2048) === 9)
    assert(EmbeddingQueries.ivfProbesFor(2048) === 3)
    // the measured 10× point: 32 bands × 16 probes (BASELINE.md r8 row)
    assert(EmbeddingQueries.annLshBandsFor(20000) === 32)
    assert(EmbeddingQueries.annLshProbesFor(20000) === 16)
    // 100×: bands cap at 64, probes stay at the 2^ProbeWidth ceiling
    assert(EmbeddingQueries.annLshBandsFor(200000) === 64)
    assert(EmbeddingQueries.annLshBandsFor(1000000000L) === 64)
    // IVF probes ~1.5√cells (the measured 10× operating point:
    // recall 0.590 at nProbe 18): 1.5√142 → 18, 1.5√448 → 32, cap 64
    assert(EmbeddingQueries.ivfProbesFor(20000) === 18)
    assert(EmbeddingQueries.ivfProbesFor(200000) === 32)
    assert(EmbeddingQueries.ivfProbesFor(1000000000L) === 64)
    // PQ re-rank: ¼ of expected candidates n·nProbes/cells, floored at
    // the oracle constant (binds at oracle scale: 500·3/23 ≈ 65
    // candidates), capped at 4096 (past it plain IVF wins anyway).
    // 10× measured point: 634 → recall 0.572 vs 0.242 at a fixed 32.
    assert(EmbeddingQueries.pqRerankFor(500, 23, 3) === 32)
    assert(EmbeddingQueries.pqRerankFor(20000, 142, 18) === 634)
    // 200k: the ¼-of-candidates formula gives 3572, but the 2048 cap
    // binds — RerankTune's measured knee (recall 0.598 vs 0.613 for
    // 75% more exact re-rank work)
    assert(EmbeddingQueries.pqRerankFor(200000, 448, 32) === 2048)
    assert(EmbeddingQueries.pqRerankFor(1000000000L, 4096, 64) === 2048)
  }

  test("oracle-scale constants: the auto twins' replay SQL is generated at the formulas' sf0.01 values") {
    // the driver's Verify runs at sf0.01 — if testdata regeneration
    // ever changes this count, the hard-coded OracleScaleN (and the
    // IVF auto's oracle constants with it) must be re-derived
    val n = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").count()
    assert(n === EmbeddingQueries.OracleScaleN)
    // LSH auto: every formula on its floor → pinned replay SQL verbatim
    assert(EmbeddingQueries.annLshBitsFor(n) === 10)
    assert(EmbeddingQueries.annLshBandsFor(n) === 16)
    assert(EmbeddingQueries.annLshProbesFor(n) === 9)
    // IVF auto: cells OFF its floor (23) — oracle generated at 23;
    // nProbe and sampleN on their floors (3, 4096 = IvfSampleN, the
    // generator's hard-coded LIMIT)
    assert(EmbeddingQueries.ivfCellsFor(n) === 23)
    assert(EmbeddingQueries.ivfProbesFor(n) === 3)
    assert(EmbeddingQueries.ivfSampleFor(23) === 4096)
  }

  test("near-dup auto banding equals the exact form on a planted corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 3 planted near-dup pairs among 60 random-ish vectors
    val rnd = new scala.util.Random(7)
    def v(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    def tweak(x: Array[Float]): Array[Float] =
      x.zipWithIndex.map { case (a, i) => if (i % 16 == 0) a + 0.01f else a }
    val base = Seq.fill(57)(v())
    val pairs = Seq(v(), v(), v())
    val rows = (base ++ pairs ++ pairs.map(tweak)).zipWithIndex
      .map { case (e, i) => (i.toLong, e) }
    val emb = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val exact = EmbeddingQueries.nearDupExactPlan(spark, emb, 0.95).collect()
    val auto = EmbeddingQueries.nearDupLshAuto(spark, emb, 0.95).collect()
    assert(exact.nonEmpty, "planted pairs must clear the threshold")
    assert(auto.toSeq === exact.toSeq,
      "auto banding must not lose any exact pair (recall is exhaustive by construction)")
  }

  test("auto twins equal the pinned twins where the formulas return the pinned constants") {
    // LSH: bits floor (10) covers every n ≤ 2048, including sf0.001's
    // 500 vectors — the auto twin must be bit-identical to the
    // hash-verified pinned entry there
    val pinnedLsh = graft.SparkEntry.queries("emb_ann_lsh")(spark, sf).collect()
    val autoLsh = graft.SparkEntry.queries("emb_ann_lsh_auto")(spark, sf).collect()
    assert(autoLsh.toSeq === pinnedLsh.toSeq,
      "at small n the bits formula returns the pinned constant — results must be identical")

    // IVF: √500 ≈ 23 already re-sizes past the 16-cell floor, so
    // coincidence is asserted on a 200-vector prefix (ivfCellsFor(200)
    // = 16 = the pinned constant)
    import org.apache.spark.sql.functions.col
    val e = graft.Tables.embeddings(spark, sf).orderBy(col("vec_id")).limit(200)
    val pinnedIvf = EmbeddingQueries.annIvfTop1(spark, e).collect()
    val autoIvf = EmbeddingQueries.annIvfTop1(spark, e,
      cells = EmbeddingQueries.ivfCellsFor(200)).collect()
    assert(autoIvf.toSeq === pinnedIvf.toSeq)

    // the full-table auto twin (23 cells at n=500) still answers every
    // query — a different, finer quantizer, same contract
    assert(graft.SparkEntry.queries("emb_ann_ivf_auto")(spark, sf).count() === 500L)

    // IVF-PQ shares the coarse formulas (the codebooks are fixed-rate
    // by design and do not scale with n): the auto twin's coincidence
    // argument is the same as plain IVF's, asserted on the same
    // 200-vector prefix, and the full-table auto answers every query
    val pinnedPq = EmbeddingQueries.annIvfPqTop1(spark, e).collect()
    val autoPq = EmbeddingQueries.annIvfPqTop1(spark, e,
      cells = EmbeddingQueries.ivfCellsFor(200)).collect()
    assert(autoPq.toSeq === pinnedPq.toSeq)
    assert(graft.SparkEntry.queries("emb_ann_ivfpq_auto")(spark, sf).count() === 500L)
  }

  test("pinned exact twins fail fast above the scale ceiling, naming the _auto path") {
    import org.apache.spark.sql.functions._
    // a frame one row over the ceiling — count() never evaluates the
    // embedding projection, so this is instant
    val big = spark.range(EmbeddingQueries.PinnedTwinMaxRows + 1)
      .select(col("id").as("vec_id"),
        array(lit(1.0f), lit(0.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      EmbeddingQueries.requirePinnedScale(big, "emb_near_dup",
        "emb_near_dup_lsh_auto")
    }
    assert(e.getMessage.contains("emb_near_dup_lsh_auto"))
    assert(e.getMessage.contains("quadratic"))
    // under the ceiling: identity
    val small = spark.range(10).select(col("id").as("vec_id"))
    assert(EmbeddingQueries.requirePinnedScale(small, "x", "y")
      .count() === 10L)
  }
}
