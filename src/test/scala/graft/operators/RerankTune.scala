package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc rerank-budget tuner for IVF-PQ at a scale slice (test scope):
  * measures recall@1 at several ADC shortlist depths on a restricted
  * query sample, so pqRerankFor's coefficient/cap are chosen from
  * measurement rather than extrapolated from 10×.
  *
  * Run: sbt "Test/runMain graft.operators.RerankTune [sliceDir]"
  */
object RerankTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("tmp/sf100ish")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = e.count()
    val cells = EmbeddingQueries.ivfCellsFor(n)
    val nProbes = EmbeddingQueries.ivfProbesFor(n)
    val sampleN = EmbeddingQueries.ivfSampleFor(cells)
    println(s"n=$n cells=$cells probes=$nProbes")

    val q = e.filter(col("vec_id") % 500 === 0)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    val exact = q.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(e.select(col("vec_id").as("cid"), col("embedding").as("ce")))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", round(call_function("cosine_sim", col("qe"), col("ce")), 6))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select("qid", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(s"queries=${exact.size}")

    for (rerank <- Seq(256, 512, 1024, 2048, EmbeddingQueries.pqRerankFor(n, cells, nProbes))) {
      val t0 = System.nanoTime()
      val got = EmbeddingQueries.annIvfPqTop1(spark, e, cells = cells,
          nProbes = nProbes, sampleN = sampleN, rerank = rerank,
          queries = Some(q))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val recall = got.count { case (k, v) => exact(k) == v }.toDouble / exact.size
      println(f"rerank=$rerank%5d recall=$recall%.3f wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
