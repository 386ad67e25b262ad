package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution for doc_substring_dedup at the 100× slice:
  * gram construction (the interpreted HOF chain) vs the df aggregate
  * vs the final join.
  */
object SubstringProfile {
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
    val gramsRaw = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .withColumn("s", when(size(col("ws")) >= 12,
        expr("""array_distinct(transform(sequence(0, size(ws) - 12),
                 i -> md5(array_join(slice(ws, i + 1, 12), ' '))))"""))
        .otherwise(expr("CAST(array() AS ARRAY<STRING>)")))
    timed("split only")(println("  " + docs
      .select(sum(size(split(lower(col("text")), " ")))).collect()(0)))
    timed("gram build (HOF+md5)")(println("  " +
      gramsRaw.select(sum(size(col("s")))).collect()(0)))
    val grams = gramsRaw.select(col("doc_id"), explode(col("s")).as("g"))
    timed("explode count")(println("  " + grams.count()))
    val df = grams.groupBy("g").agg(count(lit(1)).as("df")).filter(col("df") >= 2)
    timed("df aggregate")(println("  " + df.count()))
    timed("full pipeline")(println("  " + grams.join(df, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_grams"), max(col("df")).as("max_gram_df"))
      .count()))
    spark.stop()
  }
}
