package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All queries in this engine read through here so scan handling is
  * uniform; `events` needs special treatment (see below).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** SQL front door: register every table as a temp view (the events
    * nanosecond normalization applied) and the engine's custom
    * functions (cosine_sim, band_sigs, band_probes, …) on the session,
    * so `spark.sql("SELECT …")` drives the engine directly — the
    * surface a user coming from the reference's SQL API expects.
    * Idempotent; re-registering re-points the views at `dir`.
    */
  def registerSqlViews(s: SparkSession, dir: String): Unit = {
    GraftExtensions.register(s)
    names.foreach {
      case "events" => events(s, dir).createOrReplaceTempView("events")
      case n => load(s, dir, n).createOrReplaceTempView(n)
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")

  /** `events.ts` has shipped as two physical parquet types across
    * testdata generations: `timestamp[ns]` (which Spark 4 rejects at
    * schema inference, [PARQUET_TYPE_ILLEGAL], so we read it via
    * nanosAsLong and rescale) and `timestamp[us]` (which Spark infers
    * directly, as TIMESTAMP_NTZ when isAdjustedToUTC=false). Branch on
    * the inferred type so either generation loads:
    *  - LongType → nanos: `ts div 1000` (integer division — NOT
    *    `/ 1000`, epoch nanos ~1.7e18 exceed a double's 2^53 exact
    *    range) then timestamp_micros.
    *  - timestamp already → cast to TimestampType (session-TZ). All
    *    entry points pin spark.sql.session.timeZone=UTC, so NTZ→LTZ
    *    is value-preserving and downstream arithmetic/display is
    *    identical to the nanos path. DuckDB surfaces the column at µs
    *    naive, so both sides see equal values.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => // TimestampNTZType (or future variants): normalize to LTZ
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
