package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc tuning harness (test scope, not shipped): measures recall@1
  * and candidate fraction of the ANN auto paths on the 10× slice at
  * several budget points, so the formulas in EmbeddingQueries (and the
  * floors AnnRecallSpec pins) are chosen from measurement.
  *
  * Run: sbt "Test/runMain graft.operators.AnnTune [sliceDir]"
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("tmp/sf1ish")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "24g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = e.count()
    println(s"n=$n")

    // exact top-1 ground truth for the sampled queries (vec_id % 40 == 0)
    val q = e.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    val t0 = System.nanoTime()
    val exact = q.crossJoin(c).filter(col("qid") =!= col("cid"))
      .withColumn("sim", round(call_function("cosine_sim", col("qe"), col("ce")), 6))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select("qid", "cid", "sim").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    println(f"exact ground truth: ${exact.size} queries in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def evalRun(tag: String, df: org.apache.spark.sql.DataFrame, cand: => Long): Unit = {
      val t1 = System.nanoTime()
      val got = df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val wall = (System.nanoTime() - t1) / 1e9
      val sampled = got.view.filterKeys(exact.contains).toMap
      val hits = sampled.count { case (qid, (cid, _)) => exact(qid)._1 == cid }
      val close = sampled.count { case (qid, (_, s)) => s >= 0.9 * exact(qid)._2 }
      val frac = cand.toDouble / (n.toDouble * n)
      println(f"$tag%-40s recall=${hits.toDouble / exact.size}%.3f approx90=${close.toDouble / math.max(1, sampled.size)}%.3f coverage=${sampled.size.toDouble / exact.size}%.3f fraction=$frac%.4f wall=$wall%.1f s")
    }

    val bits = EmbeddingQueries.annLshBitsFor(n)
    for ((bands, probes) <- Seq((32, 16))) {
      evalRun(s"lsh bands=$bands bits=$bits probes=$probes",
        EmbeddingQueries.annLshTop1(spark, e, nBands = bands, bits = bits, nProbes = probes),
        EmbeddingQueries.annLshCandidates(spark, e, bands, bits, probes).count())
    }

    val cells = EmbeddingQueries.ivfCellsFor(n)
    val sampleN = EmbeddingQueries.ivfSampleFor(cells)
    for (np <- Seq(12, 18)) {
      evalRun(s"ivf cells=$cells nProbe=$np",
        EmbeddingQueries.annIvfTop1(spark, e, cells = cells, nProbes = np, sampleN = sampleN),
        EmbeddingQueries.annIvfCandidates(spark, e, cells = cells, nProbes = np, sampleN = sampleN).count())
    }
    spark.stop()
  }
}
