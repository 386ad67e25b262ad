package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._

/** The custom expression must (1) agree bit-for-bit with the
  * composable zip_with/aggregate fold it replaces, (2) run inside
  * whole-stage codegen, (3) handle nulls and degenerate vectors.
  */
class CosineSimilaritySpec extends SparkSpec {

  private def foldSim = expr(
    """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)
       / (sqrt(aggregate(transform(a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, v) -> acc + v))
        * sqrt(aggregate(transform(b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, v) -> acc + v)))""")

  private lazy val vectors = {
    GraftExtensions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(col("vec_id").as("vid2"), col("embedding").as("b")))
      .limit(500)
  }

  test("matches the composable fold bit-for-bit on real embeddings") {
    val diff = vectors
      .withColumn("native", expr("cosine_sim(a, b)"))
      .withColumn("fold", foldSim)
      .filter(col("native") =!= col("fold"))
    assert(diff.count() === 0L)
  }

  test("participates in whole-stage codegen") {
    // fail loudly if the generated kernel doesn't compile (no silent
    // interpreted fallback), then check the final (post-AQE) plan.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val df = vectors.withColumn("s", expr("cosine_sim(a, b)"))
    try df.collect()
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("*(")) // "*(n)" prefix = inside a WholeStageCodegen stage
    // and the interpreted path agrees with the generated path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val v = Literal.create(Array(1f, 2f, 3f), ArrayType(FloatType))
    val e = CosineSimilarity(v, v)
    assert(math.abs(e.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("null input yields null; zero vector yields 0.0") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Array(1f, 0f)), Some(Array(1f, 0f))),
      (None, Some(Array(1f, 0f))),
      (Some(Array(0f, 0f)), Some(Array(1f, 0f)))).toDF("a", "b")
    val out = df.selectExpr("cosine_sim(a, b)").collect()
    assert(out(0).getDouble(0) === 1.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) === 0.0)
  }
}
