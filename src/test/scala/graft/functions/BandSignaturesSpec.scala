package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._

/** band_sigs must (1) pack sign bits exactly as the Scala reference
  * (bit i of band b = sign of plane b*bits+i), (2) agree between the
  * generated and interpreted paths, (3) run inside whole-stage
  * codegen.
  */
class BandSignaturesSpec extends SparkSpec {

  private val dim = 4
  private val bits = 3
  // 2 bands × 3 bits, hand-checkable planes
  private val planes: Seq[Seq[Float]] = Seq(
    Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f), Seq(0f, 0f, 1f, 0f),
    Seq(0f, 0f, 0f, 1f), Seq(-1f, 0f, 0f, 0f), Seq(1f, 1f, 1f, 1f))

  private def reference(v: Seq[Float]): Seq[Long] =
    planes.grouped(bits).map { band =>
      band.zipWithIndex.foldLeft(0L) { case (sig, (pl, i)) =>
        val dot = pl.zip(v).map { case (p, x) => p.toDouble * x.toDouble }.sum
        if (dot >= 0.0) sig | (1L << i) else sig
      }
    }.toSeq

  test("packs sign bits per band exactly as the reference") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val vecs = Seq(
      Seq(1f, -2f, 3f, -4f),
      Seq(-1f, -1f, -1f, -1f),
      Seq(0.5f, 0.5f, -0.5f, 0.5f))
    val df = vecs.toDF("v")
      .withColumn("sigs", call_function("band_sigs",
        col("v"), typedlit(planes), lit(bits)))
    val got = df.select("sigs").collect().map(_.getSeq[Long](0))
    vecs.zip(got).foreach { case (v, sigs) =>
      assert(sigs == reference(v), s"vector $v")
    }
  }

  test("generated and interpreted paths agree; runs in whole-stage codegen") {
    GraftExtensions.register(spark)
    // The vector derives from the range id (NOT a literal — an
    // all-literal call is foldable and would be constant-folded
    // through the interpreted path, never exercising doGenCode); with
    // fallback disabled, a generated kernel that fails to compile
    // fails the test instead of silently interpreting.
    // id = 0 → [1, -2, 3, -4].
    val df = spark.range(1)
      .withColumn("v", expr(
        "transform(sequence(0, 3), j -> CAST((j + 1 + id) * (1 - 2 * (j % 2)) AS FLOAT))"))
      .withColumn("sigs", call_function("band_sigs",
        col("v"), typedlit(planes), lit(bits)))
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val generated =
      try df.select("sigs").collect().head.getSeq[Long](0)
      finally spark.conf.set("spark.sql.codegen.fallback", "true")
    assert(generated == reference(Seq(1f, -2f, 3f, -4f)))
    assert(df.queryExecution.executedPlan.toString().contains("*("))

    // interpreted eval on the same input
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType}
    val v = Literal.create(Array(1f, -2f, 3f, -4f), ArrayType(FloatType))
    val ps = Literal.create(
      new GenericArrayData(planes.map(p => new GenericArrayData(p.toArray)).toArray),
      ArrayType(ArrayType(FloatType)))
    val e = BandSignatures(v, ps, Literal(bits, IntegerType))
    val out = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(out.toLongArray().toSeq == reference(Seq(1f, -2f, 3f, -4f)))
  }
}
