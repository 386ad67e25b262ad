package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

object FuzzyProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("tmp/sf100ish")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.openCostInBytes", (256 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    timed("raw count")(println("  " + docs.count()))
    val norm = docs.select(col("doc_id"),
      regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", ""), " +", " ").as("norm"))
    timed("normalize only")(println("  " + norm.select(sum(length(col("norm")))).collect()(0)))
    val b = norm.select(col("doc_id"), substring(col("norm"), 1, 80).as("pre"),
      substring(col("norm"), 1, 16).as("k1"), substring(col("norm"), 17, 16).as("k2"))
    val c1 = b.groupBy("k1").agg(count(lit(1)).as("c1"))
    val keyed = b.join(c1, "k1").withColumn("blk", when(col("c1") > 256,
      concat(col("k1"), lit("|"), col("k2"))).otherwise(col("k1")))
      .select(col("doc_id"), col("pre"), col("blk"))
    val c2 = keyed.groupBy("blk").agg(count(lit(1)).as("c2"))
    val bounded = keyed.join(c2, "blk").filter(col("c2") <= 256)
    timed("bounded count")(println("  " + bounded.count()))
    val blocks = bounded.groupBy("blk")
      .agg(collect_list(struct(col("doc_id"), col("pre"))).as("ms"))
    timed("block stats")(println("  " + blocks.select(count(lit(1)),
      sum(expr("size(ms) * (size(ms) - 1) / 2"))).collect()(0)))
    spark.stop()
  }
}
