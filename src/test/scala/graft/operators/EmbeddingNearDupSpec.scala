package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}

/** Planted-pair equivalence for the embedding near-dup twins.
  *
  * The driver testdata's embeddings are effectively random 64-dim
  * vectors (max pairwise cosine ≈ 0.51), so the registry queries at
  * threshold 0.95 are vacuously empty there and the DuckDB oracle only
  * checks schema. This spec supplies a corpus where near-dups DO
  * exist — base vectors plus small perturbations with cosine ≥ 0.95 —
  * and asserts:
  *   1. nearDupExact finds exactly the planted pairs (no false
  *      positives from the random background);
  *   2. nearDupLsh returns the SAME rows (ids and round-6 sims) — the
  *      banding lost no candidate, the verification cosine is
  *      bit-identical to the all-pairs path.
  */
class EmbeddingNearDupSpec extends SparkSpec {

  private val dim = 64

  /** 200 random unit-ish base vectors + 20 perturbed near-copies of
    * the first 20 (cosine ≈ 0.97-0.99 by construction, checked below).
    */
  private def corpus: (DataFrame, Set[(Long, Long)]) = {
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val base = (0 until 200).map(i => i.toLong -> vec())
    val planted = (0 until 20).map { i =>
      val (_, v) = base(i)
      // small additive noise: cos(v, v + 0.15 g) ≈ 0.97 for unit-var
      // Gaussian v, g in 64 dims — comfortably above the threshold.
      val w = v.map(x => x + 0.15f * rnd.nextGaussian().toFloat)
      (1000L + i) -> w
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / math.sqrt(na * nb)
    }
    // the planted pairs really are above threshold, the background is
    // far below it — otherwise the test can't distinguish the engines
    (0 until 20).foreach { i =>
      val c = cos(base(i)._2, planted(i)._2)
      assert(c >= 0.95, s"planted pair $i has cosine $c < 0.95")
    }
    val all = base ++ planted
    val rows = all.map { case (id, v) => Row(id, v.toSeq) }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    (df, (0 until 20).map(i => (i.toLong, 1000L + i)).toSet)
  }

  test("nearDupExact finds exactly the planted pairs") {
    val (df, expected) = corpus
    val got = EmbeddingQueries.nearDupExact(spark, df, 0.95).collect()
    val ids = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids == expected, s"exact: got ${ids.size} pairs, expected ${expected.size}")
    got.foreach(r => assert(r.getDouble(2) >= 0.95))
  }

  test("nearDupLsh output equals nearDupExact (banding recall holds)") {
    val (df, _) = corpus
    val cached = df.cache()
    val exact = EmbeddingQueries.nearDupExact(spark, cached, 0.95).collect().toSeq
    val lsh = EmbeddingQueries.nearDupLsh(spark, cached, 0.95).collect().toSeq
    assert(lsh == exact,
      s"lsh (${lsh.size} rows) != exact (${exact.size} rows)")
    cached.unpersist()
  }
}
