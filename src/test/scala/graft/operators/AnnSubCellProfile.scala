package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The coarse-quantizer saturation demonstration (test scope): runs
  * the IVF candidate stage at n = 2^24 (the exact activation boundary
  * of [[EmbeddingQueries.annIvfSubBitsFor]] — the largest corpus the
  * clamped 4096-cell quantizer handles at its committed operating
  * point) and at n = 2^25 (one doubling past it), on the seeded
  * standard-normal slice tools/make_bigemb.py writes, and measures:
  *
  *  - per-query candidates at 2^24, single-level (the boundary
  *    budget: 64 probes x ~4096 membership ~= 2^18);
  *  - per-query candidates at 2^25, single-level (the quadratic tail
  *    the sub-split removes: ~2x the boundary — per-query candidates
  *    grow linearly in n once cells AND probes are both clamped, so
  *    the total candidate stream grows n^2/64);
  *  - per-query candidates at 2^25 with the two-level key (b = 4,
  *    s = 8): frozen back at ~the boundary budget — the linear-total
  *    regime;
  *  - recall@1 of the sub-split run against exact brute-force top-1
  *    on the query sample (the at-scale floor for BASELINE.md; the
  *    per-commit recall gate is AnnRecallSpec's saturation-sim).
  *
  * Run: sbt "Test/runMain graft.operators.AnnSubCellProfile [sliceDir]"
  * (~20-30 min at 2^25 on local[32] — the committed numbers live in
  * BASELINE.md's round-14 close-out.)
  */
object AnnSubCellProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("tmp/bigemb")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "48g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)

    val all = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n2 = all.count()
    require(n2 >= (1L << 25), s"slice too small: $n2 (make_bigemb.py writes 2^25)")
    val e2 = all.filter(col("vec_id") < (1L << 25))
    val e1 = all.filter(col("vec_id") < (1L << 24))
    // 128 queries drawn from the 2^24 prefix so the SAME queries probe
    // both corpora (per-query independence: restricted runs equal the
    // full run on these queries)
    val q = all.filter(col("vec_id") % 131072 === 7 && col("vec_id") < (1L << 24))
      .transform(graft.Caching.persistOnce(_))
    val nq = q.count()
    println(s"n2=$n2 queries=$nq")

    val cells = EmbeddingQueries.ivfCellsFor(1L << 25)
    val nProbes = EmbeddingQueries.ivfProbesFor(1L << 25)
    require(cells == 4096 && nProbes == 64, s"unexpected sizing: $cells/$nProbes")
    val sampleN = EmbeddingQueries.ivfSampleFor(cells)
    val b1 = EmbeddingQueries.annIvfSubBitsFor(1L << 24, cells)
    val b2 = EmbeddingQueries.annIvfSubBitsFor(1L << 25, cells)
    require(b1 == 0 && b2 == 4, s"formula drift: b(2^24)=$b1 b(2^25)=$b2")
    val s8 = EmbeddingQueries.AnnIvfSubProbes

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def perQuery(e: DataFrame, subBits: Int, subProbes: Int, label: String): Double = {
      val c = timed(label) {
        EmbeddingQueries.annIvfCandidates(spark, e, cells = cells,
          nProbes = nProbes, sampleN = sampleN, queries = Some(q),
          subBits = subBits, subProbes = subProbes).count()
      }
      val pq = c.toDouble / nq
      println(f"$label: candidates=$c perQuery=$pq%.0f")
      pq
    }

    val pqBoundary = perQuery(e1, 0, 1, "2^24 flat (boundary)")
    val pqFlat2 = perQuery(e2, 0, 1, "2^25 flat (quadratic tail)")
    val pqSub2 = perQuery(e2, b2, s8, "2^25 sub-split b=4 s=8")
    println(f"growth flat=${pqFlat2 / pqBoundary}%.2fx  sub=${pqSub2 / pqBoundary}%.2fx (1.0 = frozen budget)")

    // exact ground truth on the 128 queries: top-1 via a map-side MAX
    // aggregate (no window, the 4.3 G-pair stream never shuffles)
    val exact = timed("exact top-1 @ 2^25") {
      broadcast(q.select(col("vec_id").as("qid"), col("embedding").as("qe")))
        .crossJoin(e2.select(col("vec_id").as("cid"), col("embedding").as("ce")))
        .filter(col("qid") =!= col("cid"))
        .select(col("qid"), struct(
          round(call_function("cosine_sim", col("qe"), col("ce")), 6).as("sim"),
          (-col("cid")).as("nc")).as("p"))
        .groupBy("qid").agg(max(col("p")).as("b"))
        .select(col("qid"), (-col("b.nc")).as("cid"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val got = timed("sub-split top-1 @ 2^25") {
      EmbeddingQueries.annIvfTop1(spark, e2, cells = cells, nProbes = nProbes,
        sampleN = sampleN, queries = Some(q), subBits = b2, subProbes = s8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val recall = got.count { case (k, v) => exact.get(k).contains(v) }.toDouble / exact.size
    println(f"recall@1 sub-split @ 2^25: $recall%.3f over ${exact.size} queries")
    spark.stop()
  }
}
