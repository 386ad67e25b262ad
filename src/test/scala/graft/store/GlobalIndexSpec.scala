package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** GlobalIndex must agree with the single-partition window row_number
  * on a real table while never holding the dataset in one partition.
  */
class GlobalIndexSpec extends SparkSpec with graft.testkit.TestKitReported {

  test("ordered index equals window row_number over a total order") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val viaWindow = orders
      .withColumn("rn",
        row_number().over(Window.orderBy(col("o_totalprice").asc, col("o_orderkey").asc)) - 1)
    val viaIndex = GlobalIndex.withOrderedIndex(orders,
      Seq(col("o_totalprice").asc, col("o_orderkey").asc), "idx")
    val joined = viaWindow.join(viaIndex, "o_orderkey")
      .filter(col("rn") =!= col("idx"))
    assert(joined.count() === 0L)
  }

  test("base offset shifts the whole index") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey")
    val idx = GlobalIndex.withOrderedIndex(orders, Seq(col("o_orderkey").asc),
      "idx", base = 1000L)
    val bounds = idx.agg(min("idx"), max("idx")).head()
    assert(bounds.getLong(0) === 1000L)
    assert(bounds.getLong(1) === 1000L + orders.count() - 1)
  }

  test("ordered prefix sum equals the window running sum minus current row") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), (col("o_orderkey") % 7).as("w")) // varied weights, some zero
    val viaWindow = orders.withColumn("ps",
      coalesce(sum("w").over(Window.orderBy(col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val viaPrefix = GlobalIndex.withOrderedPrefixSum(orders,
      Seq(col("o_orderkey").asc), "w", "ps")
    val mismatch = viaWindow.select("o_orderkey", "ps")
      .join(viaPrefix.select(col("o_orderkey"), col("ps").as("ps2")), "o_orderkey")
      .filter(col("ps") =!= col("ps2"))
    assert(mismatch.count() === 0L)
  }

  test("keyed running sum equals the partitioned window form, keys never split") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"), (col("o_orderkey") % 7).as("w"))
    val viaWindow = orders.withColumn("rs",
      sum("w").over(Window.partitionBy("o_custkey").orderBy(col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val viaKeyed = GlobalIndex.withKeyedRunningSum(orders, Seq("o_custkey"),
      Seq(col("o_orderkey").asc), "w", "rs2")
    val mismatch = viaWindow.select("o_custkey", "o_orderkey", "rs")
      .join(viaKeyed.select(col("o_custkey"), col("o_orderkey"), col("rs2")),
        Seq("o_custkey", "o_orderkey"))
      .filter(col("rs") =!= col("rs2"))
    assert(mismatch.count() === 0L)
    // the range partitioning must keep every key whole (the streaming
    // reset's correctness precondition) and still use >1 partition
    val spread = viaKeyed
      .select(col("o_custkey"), spark_partition_id().as("pid"))
      .groupBy("o_custkey").agg(countDistinct("pid").as("nparts"))
    assert(spread.filter(col("nparts") > 1).count() === 0L, "a key spans partitions")
    assert(viaKeyed.select(spark_partition_id()).distinct().count() > 1L)
  }

  test("skew-safe keyed running sum equals the window form; a whale key spans partitions") {
    // plant a whale (~half the rows share one key) AND a NULL key
    // (every 11th row): the window form treats NULL as its own
    // partition, so the start-offset join must be null-safe or those
    // rows silently vanish
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(
        when(col("o_orderkey") % 11 === 0, lit(null))
          .when(col("o_orderkey") % 2 === 0, lit(77L))
          .otherwise(col("o_custkey")).as("k"),
        col("o_orderkey"), (col("o_orderkey") % 7).as("w"))
    val viaWindow = orders.withColumn("rs",
      sum("w").over(Window.partitionBy("k").orderBy(col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val viaSkewed = GlobalIndex.withKeyedRunningSumSkewed(orders, Seq("k"),
      Seq(col("o_orderkey").asc), "w", "rs2")
    // no rows lost (the NULL-key partition included), and compare on
    // the UNIQUE order key so NULL-key rows participate in the check
    assert(viaSkewed.count() === orders.count())
    val mismatch = viaWindow.select("o_orderkey", "rs")
      .join(viaSkewed.select(col("o_orderkey"), col("rs2")), Seq("o_orderkey"))
      .filter(col("rs") =!= col("rs2"))
    assert(mismatch.count() === 0L)
    // the whale key's rows must span >1 partition — the parallelism
    // the key-whole form cannot give it
    val whaleParts = viaSkewed.filter(col("k") === 77L)
      .select(spark_partition_id()).distinct().count()
    assert(whaleParts > 1L,
      s"whale key confined to $whaleParts partition(s) — not the skew-safe layout")
  }

  test("a NULL weight fails with a named error, not an opaque NPE") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"),
        when(col("o_orderkey") % 97 === 0, lit(null))
          .otherwise(col("o_orderkey") % 7).as("w"))
    val ex = intercept[org.apache.spark.SparkException] {
      GlobalIndex.withKeyedRunningSum(orders, Seq("o_custkey"),
        Seq(col("o_orderkey").asc), "w", "rs")
        .queryExecution.toRdd.foreach(_ => ())
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t =>
      t.isInstanceOf[IllegalArgumentException] &&
        t.getMessage != null && t.getMessage.contains("COALESCE") &&
        t.getMessage.contains("'w' is NULL")),
      s"expected the named null-weight error in: ${chain(ex).map(_.getClass.getSimpleName)}")
  }

  test("result is spread across multiple partitions (no single-task sort)") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey")
    val idx = GlobalIndex.withOrderedIndex(orders, Seq(col("o_orderkey").asc), "idx")
    val partsUsed = idx
      .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"))
      .distinct().count()
    assert(partsUsed > 1L)
  }
}
