package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Ad-hoc A/B for w3_running_sum (test scope): the round-12 window
  * form vs the round-13 single-exchange keyed-running-sum form,
  * interleaved in ONE JVM (the only comparison the host-wave
  * discipline trusts). Run:
  *   sbt "Test/runMain graft.operators.W3Plan [dir] [reps]"
  */
object W3Plan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmp/sf100ish")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

    def oldForm(): DataFrame = {
      val w = Window.partitionBy("l_suppkey")
        .orderBy("first_ship", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      graft.Tables.lineitem(spark, dir)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .repartition(col("l_suppkey"))
        .groupBy("l_suppkey", "l_orderkey", "l_linenumber")
        .agg(sum(dec2(col("l_quantity"))).as("qty"),
          min(col("l_shipdate")).as("first_ship"))
        .withColumn("running_qty", sum(col("qty")).over(w).cast("double"))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }
    def newForm(): DataFrame = Registry.byName("w3_running_sum").run(spark, dir)

    def timed(tag: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      // full-pipeline drain, no driver funnel, NO optimizer pruning
      // (count() would delete the old form's window+sorts entirely —
      // the Bench materialization, exactly)
      f.queryExecution.toRdd.foreach(_ => ())
      println(f"$tag%-8s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      spark.catalog.clearCache()
      System.gc()
    }
    (1 to reps).foreach { r =>
      timed(s"old#$r")(oldForm())
      timed(s"new#$r")(newForm())
    }
    spark.stop()
  }
}
