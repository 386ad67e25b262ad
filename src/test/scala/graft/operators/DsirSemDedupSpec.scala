package graft.operators

import graft.SparkSpec

/** Planted-signal tests for the two round-10 selection operators:
  * DSIR importance weights must tilt toward the target-domain slice,
  * and SemDeDup must drop planted near-identical vectors while
  * keeping the earliest. (Exact value agreement with DuckDB is the
  * oracle's job; these pin the semantics on data where the signal is
  * constructed, not incidental.)
  */
class DsirSemDedupSpec extends SparkSpec {

  test("DSIR: docs written in the target domain's vocabulary score higher") {
    import spark.implicits._
    // target-domain (en) docs share one vocabulary, off-domain another;
    // two probe docs — one per vocabulary — both labeled off-target so
    // only their CONTENT drives the weight
    val enDoc = "alpha beta gamma delta " * 10
    val deDoc = "zeta eta theta iota " * 10
    val docs = (
      (0 until 20).map(i => (i.toLong, enDoc.trim, "en", "s", 1L)) ++
        (20 until 40).map(i => (i.toLong, deDoc.trim, "de", "s", 1L)) :+
        (98L, enDoc.trim, "de", "s", 1L) :+ (99L, deDoc.trim, "de", "s", 1L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val w = CorpusQueries.docDsirWeights(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // the en-vocabulary probe must out-score the de-vocabulary probe,
    // with the right signs (target-like > 0 > off-target-like)
    assert(w(98L) > 0 && w(99L) < 0, s"weights: ${w(98L)} vs ${w(99L)}")
    // weights are content-determined: the probe equals its vocabulary's
    // cohort score (identical text → identical weight)
    assert(math.abs(w(98L) - w(0L)) < 1e-9 && math.abs(w(99L) - w(20L)) < 1e-9)
  }

  test("SemDeDup: planted near-identicals drop, earliest survives, singles keep") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + (rnd.nextGaussian() * 1e-3).toFloat)
    val base = (0 until 40).map(_ => vec())
    // ids 100..102: three copies of base(0)'s direction (near-identical)
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) } ++
      Seq((100L, jitter(base(0)), 0), (101L, jitter(base(0)), 0), (102L, jitter(base(0)), 0))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = EmbeddingQueries.semDedup(spark, emb, cells = 4, iters = 3,
      sampleN = 4096, tau = 0.95).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.get(2)), r.getBoolean(3))).toMap
    // copies cluster into one cell and all but... id 0 is the earliest
    // member, so 100/101/102 are dups; 0 itself has no PRIOR mate that
    // close, so it survives
    assert(!out(0L)._3, "earliest copy must survive")
    for (id <- Seq(100L, 101L, 102L))
      assert(out(id)._3, s"planted copy $id must be flagged dup")
    // a dup's recorded max_sim_prior is the evidence, >= tau
    assert(out(100L)._2.exists(_.asInstanceOf[Double] >= 0.95))
    // every vector appears exactly once in the audit output
    assert(out.size == rows.size)
  }

  test("SemDeDup two-level sub-split: planted copies still drop, pair space only shrinks") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + (rnd.nextGaussian() * 1e-4).toFloat)
    val base = (0 until 60).map(_ => vec())
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      Seq((100L, jitter(base(0))), (101L, jitter(base(0))),
        (200L, jitter(base(1))))
    val emb = rows.toDF("vec_id", "embedding")
    def run(b: Int) = EmbeddingQueries.semDedup(spark, emb, cells = 4,
      iters = 3, sampleN = 4096, tau = 0.95, subBits = b).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    val flat = run(0)
    val two = run(3)
    // near-identical vectors agree on every origin-hyperplane sign bit
    // (their dot products differ by ~1e-4·|plane|), so the sub-split
    // keeps each planted group in one composite bucket → same drops
    for (id <- Seq(100L, 101L, 200L))
      assert(two.find(_._1 == id).exists(_._3), s"copy $id must stay flagged")
    assert(two.count(_._1 == 0L) == 1 && !two.find(_._1 == 0L).get._3)
    // sub-splitting can only REMOVE pairs: every two-level dup is a
    // flat-level dup (the membership bound must not invent duplicates)
    val flatDups = flat.filter(_._3).map(_._1).toSet
    assert(two.filter(_._3).map(_._1).toSet.subsetOf(flatDups))
    // composite keys actually subdivide: more distinct cells than the
    // 4 coarse ones, and each key decodes to a coarse cell in [0, 4)
    val cells2 = two.map(_._2).toSet
    assert(cells2.size > 4, s"expected subdivision, got ${cells2.size} cells")
    assert(cells2.forall(c => c >= 0 && (c >> 3) < 4))
  }
}
