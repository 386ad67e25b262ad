package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution for doc_fingerprint / doc_dup_rate_by_source's
  * shared normalization+md5 pipeline at the 100× slice: separates
  * scan, lower, each regex pass, md5 and the presentation sort so a
  * regression names its phase.
  */
object FingerprintProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("tmp/sf100ish")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.openCostInBytes", (256 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    timed("raw count")(println("  " + docs.count()))
    timed("scan+len")(println("  " +
      docs.select(sum(length(col("text")))).collect()(0)))
    timed("lower")(println("  " +
      docs.select(sum(length(lower(col("text"))))).collect()(0)))
    timed("lower+re1")(println("  " + docs.select(sum(length(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", "")))).collect()(0)))
    timed("lower+re1+re2")(println("  " + docs.select(sum(length(
      regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", ""), " +", " ")))).collect()(0)))
    timed("full md5")(println("  " + docs.select(count(
      md5(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", ""), " +", " ")))).collect()(0)))
    timed("full + orderBy collect")(println("  " + docs.select(col("doc_id"),
      md5(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", ""), " +", " ")).as("fingerprint"))
      .orderBy("doc_id").count()))
    spark.stop()
  }
}
