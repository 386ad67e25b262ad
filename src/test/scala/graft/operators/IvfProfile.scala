package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for the plain-IVF ANN auto pipeline (test
  * scope) — the PqProfile pattern, attributing the 100× wall across
  * assignment, probe generation, the candidate join, and the exact
  * re-rank + top-1.
  *
  * Run: sbt "Test/runMain graft.operators.IvfProfile [sliceDir]"
  */
object IvfProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("tmp/sf100ish")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("IVF_OPENCOST", (4 * 1024 * 1024).toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)

    val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = e0.count()
    val cells = EmbeddingQueries.ivfCellsFor(n)
    val nProbes = EmbeddingQueries.ivfProbesFor(n)
    val sampleN = EmbeddingQueries.ivfSampleFor(cells)
    println(s"n=$n cells=$cells probes=$nProbes")

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    // cold first (fresh JVM, nothing cached): the bench's number
    timed("full top1 COLD")(println("  rows=" +
      EmbeddingQueries.annIvfTop1(spark, e0,
        cells = cells, nProbes = nProbes, sampleN = sampleN).count()))
    // warm second: fixed costs (fit, codegen, caches) amortized
    timed("full top1 WARM")(println("  rows=" +
      EmbeddingQueries.annIvfTop1(spark, e0,
        cells = cells, nProbes = nProbes, sampleN = sampleN).count()))
    val cand = EmbeddingQueries.annIvfCandidates(spark, e0,
      cells = cells, nProbes = nProbes, sampleN = sampleN)
    timed("candidate pair count")(println("  pairs=" + cand.count()))
    spark.stop()
  }
}
