package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for the IVF-PQ auto pipeline (test scope, not
  * shipped): runs the pipeline's phases separately at a scale slice and
  * prints per-phase wall, so a super-linear sweep row can be attributed
  * to a stage instead of guessed at.
  *
  * Run: sbt "Test/runMain graft.operators.PqProfile [sliceDir]"
  */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("tmp/sf100ish")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    graft.functions.TopKByScore.tuneForManyGroups(spark)
    import spark.implicits._

    val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = e0.count()
    val cells = EmbeddingQueries.ivfCellsFor(n)
    val nProbes = EmbeddingQueries.ivfProbesFor(n)
    val rerank = EmbeddingQueries.pqRerankFor(n, cells, nProbes)
    println(s"n=$n cells=$cells probes=$nProbes rerank=$rerank")

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    // phase 1: quantizer fits (driver-side)
    val sampleN = EmbeddingQueries.ivfSampleFor(cells)
    val sample = timed("sample collect") {
      e0.orderBy(col("vec_id")).select(col("embedding"))
        .limit(sampleN).as[Array[Float]].collect()
    }
    timed("coarse+book fits") {
      val _ = graft.functions.KMeansLite.fit(sample, k = cells, iters = 6)
      (0 until 8).foreach { m =>
        graft.functions.KMeansLite.fit(
          sample.map(_.slice(m * 8, (m + 1) * 8)), k = 16, iters = 6)
      }
    }

    // phase 2+: the staged pipeline, via the internal probe API
    val staged = EmbeddingQueries.annIvfPqStages(spark, e0,
      cells = cells, nProbes = nProbes, sampleN = sampleN, rerank = rerank)
    timed("assigned count")(println("  assigned=" + staged.assigned.count()))
    timed("probes count (cached)")(println("  probes=" + staged.probes.count()))
    timed("candidate pair count")(println("  pairs=" + staged.pairs.count()))
    timed("shortlist agg")(println("  shortlist=" + staged.shortlist.count()))
    timed("full ranked")(println("  rows=" + staged.ranked.count()))
    spark.stop()
  }
}
