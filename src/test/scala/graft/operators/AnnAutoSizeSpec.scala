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
    // the sf0.1 corpus (2 000 vectors) IS the oracle point
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
  }
}
