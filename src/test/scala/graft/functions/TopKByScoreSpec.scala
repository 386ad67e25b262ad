package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The bounded-heap top-k aggregate must equal the window-rank form on
  * real data regardless of partitioning, and its merge must be
  * order-insensitive.
  */
class TopKByScoreSpec extends SparkSpec {

  test("agg form equals window rank form on a real table") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_custkey").as("q"), col("o_totalprice").as("score"),
        col("o_orderkey").as("id"))
    val w = Window.partitionBy("q").orderBy(col("score").desc, col("id").asc)
    val viaWindow = orders.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("q", "rnk", "id")
    val viaAgg = orders.groupBy("q")
      .agg(TopKByScore.topK(3)(col("score"), col("id")).as("top"))
      .select(col("q"), posexplode(col("top")).as(Seq("pos", "sc")))
      .select(col("q"), (col("pos") + 1).cast("int").as("rnk"), col("sc.id").as("id"))
    assert(viaWindow.exceptAll(viaAgg).count() === 0L)
    assert(viaAgg.exceptAll(viaWindow).count() === 0L)
  }

  test("results are invariant to repartitioning (merge order)") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_custkey").as("q"), col("o_totalprice").as("score"),
        col("o_orderkey").as("id"))
    def run(parts: Int) = orders.repartition(parts)
      .groupBy("q").agg(TopKByScore.topK(5)(col("score"), col("id")).as("top"))
      .select(col("q"), col("top"))
      .orderBy("q").collect().map(_.toString).toSeq
    assert(run(1) === run(7))
  }

  test("unit: finish yields (score desc, id asc) order and the k bound") {
    // the buffer is a min-heap (internal order unspecified); the
    // contract — (score desc, id asc) top-k — holds at finish()
    val agg = new TopKByScore(3)
    val buf = Seq(Scored(5, 1), Scored(3, 2), Scored(3, 9), Scored(3, 4), Scored(9, 7))
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) === Seq(Scored(9, 7), Scored(5, 1), Scored(3, 2)))
    // merging two partial buffers in either order agrees after finish
    def mk(xs: Seq[Scored]) = xs.foldLeft(agg.zero)(agg.reduce)
    val m1 = agg.finish(agg.merge(mk(Seq(Scored(1, 1), Scored(8, 8))),
      mk(Seq(Scored(9, 9), Scored(2, 2)))))
    val m2 = agg.finish(agg.merge(mk(Seq(Scored(9, 9), Scored(2, 2))),
      mk(Seq(Scored(1, 1), Scored(8, 8)))))
    assert(m1 === m2)
    assert(m1 === Seq(Scored(9, 9), Scored(8, 8), Scored(2, 2)))
  }
}
