package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bucketed layout must make the fact-fact join shuffle-free and
  * keep results identical to the plain join.
  */
class BucketedTablesSpec extends SparkSpec with graft.testkit.TestKitReported {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed orders ⋈ lineitem plans with zero Exchange and matches plain join") {
    val orders = graft.Tables.orders(spark, sf)
    val lineitem = graft.Tables.lineitem(spark, sf)
    BucketedTables.writeBucketed(
      orders.withColumnRenamed("o_orderkey", "k"), "bt_orders", "k", 8)
    BucketedTables.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "k"), "bt_lineitem", "k", 8)
    // force SMJ so the assertion is about the shuffle, not broadcast
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("bt_orders").join(spark.table("bt_lineitem"), "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
      assert(BucketedTables.isShuffleFree(joined),
        s"expected shuffle-free plan:\n${joined.queryExecution.executedPlan}")
      val expected = orders.join(lineitem,
          orders("o_orderkey") === lineitem("l_orderkey"))
        .groupBy(orders("o_orderkey")).agg(count(lit(1)))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expected)
      // and the plain (non-bucketed) form of the same join DOES shuffle —
      // the layout, not the query shape, is what removed the exchange
      val plain = orders.withColumnRenamed("o_orderkey", "k")
        .join(lineitem.withColumnRenamed("l_orderkey", "k"), "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
      assert(!BucketedTables.isShuffleFree(plain))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS bt_orders")
      spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    }
  }
}
