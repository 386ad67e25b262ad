package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for the LSH ANN auto pipeline (test scope) —
  * the PqProfile pattern: run each phase separately at a scale slice
  * and print walls, so the sweep row's cost is attributed, not
  * guessed.
  *
  * Run: sbt "Test/runMain graft.operators.LshProfile [sliceDir]"
  */
object LshProfile {
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

    val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = e0.count()
    val bits = EmbeddingQueries.annLshBitsFor(n)
    val bands = EmbeddingQueries.annLshBandsFor(n)
    val probes = EmbeddingQueries.annLshProbesFor(n)
    println(s"n=$n bits=$bits bands=$bands probes=$probes")

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    val planes = EmbeddingQueries.planes(bands * bits)
    val signed = e0.select(col("vec_id").as("cid"),
      posexplode(call_function("band_sigs", col("embedding"),
        typedlit(planes), lit(bits))).as(Seq("band", "sig")))
    timed("signed count")(println("  signed=" + signed.count()))
    val probeRows = e0.select(col("vec_id").as("qid"),
      posexplode(call_function("band_probes", col("embedding"),
        typedlit(planes), lit(bits), lit(probes))).as(Seq("idx", "sig")))
      .select((col("idx") / lit(probes)).cast("int").as("band"), col("sig"), col("qid"))
    timed("probe rows count")(println("  probes=" + probeRows.count()))
    // packed long key, matching annLshCandidates (the composite
    // (band, sig) key builds a generic HashedRelation — measured
    // 43-53 s for this phase vs ~20 s packed)
    val pack = expr(s"CAST(band AS BIGINT) * ${1L << bits} + sig").as("bs")
    val pairs = probeRows.select(col("qid"), pack)
      .join(broadcast(signed.select(col("cid"), pack)), Seq("bs"))
      .filter(col("qid") =!= col("cid")).select("qid", "cid")
    timed("pair count (no dedup)")(println("  pairs=" + pairs.count()))
    val top1 = EmbeddingQueries.annLshTop1(spark, e0,
      nBands = bands, bits = bits, nProbes = probes)
    timed("full top1")(println("  rows=" + top1.count()))
    spark.stop()
  }
}
