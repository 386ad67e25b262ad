package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior of the fused MinHash banding kernel: shape, determinism,
  * empty-set contract, interpreted-vs-codegen agreement, and the
  * banding property itself (near-identical sets collide, disjoint
  * sets don't) — recall correctness of the REGISTRY query is carried
  * by its exact-Jaccard oracle, this pins the kernel.
  */
class MinHashBandSigsSpec extends SparkSpec {

  private def sigsOf(sets: Seq[Seq[String]], codegen: Boolean): Seq[Seq[Long]] = {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    try {
      sets.toDF("sh")
        .select(call_function("minhash_band_sigs", col("sh"), lit(16), lit(4)).as("sigs"))
        .collect().map(_.getSeq[Long](0).toSeq).toSeq
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  private val words = (0 until 200).map(i => s"w$i token$i x$i")

  test("16 band sigs per set, deterministic, empty set yields empty array") {
    val out = sigsOf(Seq(words, words, Seq.empty[String]), codegen = true)
    assert(out(0).length == 16)
    assert(out(0) == out(1))
    assert(out(2).isEmpty)
  }

  test("interpreted and codegen paths agree") {
    val sets = Seq(words, words.drop(5), Seq("a b c"), Seq.empty[String])
    assert(sigsOf(sets, codegen = true) == sigsOf(sets, codegen = false))
  }

  test("banding: near-identical sets share a band, disjoint sets do not") {
    val near = words.drop(4) // Jaccard 196/200 = 0.98
    val other = (0 until 200).map(i => s"z$i other$i y$i")
    val Seq(a, b, c) = sigsOf(Seq(words, near, other), codegen = true)
    val sharedNear = a.zip(b).count { case (x, y) => x == y }
    val sharedOther = a.zip(c).count { case (x, y) => x == y }
    assert(sharedNear >= 1, "0.98-Jaccard pair escaped all 16 bands")
    assert(sharedOther == 0, "disjoint sets collided in a band")
  }
}
