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

  /** `events.ts` is parquet `timestamp[ns]`, which Spark 4 rejects at
    * schema inference ([PARQUET_TYPE_ILLEGAL]). Read it as a raw long
    * (nanosAsLong) and convert to a microsecond TimestampType here.
    * The test data carries no sub-microsecond components and DuckDB
    * also surfaces the column at µs, so both sides see equal values.
    * `ts div 1000` (integer division) — NOT `/ 1000` — because epoch
    * nanos (~1.7e18) exceed a double's 2^53 exact-integer range.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
