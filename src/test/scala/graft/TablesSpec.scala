package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins `Tables.events` against BOTH physical forms `events.ts` has
  * shipped as across testdata generations (round-9 regression: the
  * driver regenerated the parquet as timestamp[us] and the loader's
  * unconditional nanos rescale broke every events query at analysis):
  *  - raw epoch-nanos long (what timestamp[ns] parquet reads as under
  *    spark.sql.legacy.parquet.nanosAsLong=true)
  *  - native timestamp (µs; NTZ or LTZ depending on writer flags)
  * Whatever the driver ships next, the loader must yield the same
  * TimestampType values.
  */
class TablesSpec extends SparkSpec {
  private val micros = 1755000000000000L // 2025-08-12T12:00:00Z, µs

  private def writeAndLoad(dir: String, tsCol: org.apache.spark.sql.Column) = {
    spark.range(1).select(
      lit("e1").as("event_id"), tsCol.as("ts"), lit("d").as("decider_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir)
  }

  test("events loader: epoch-nanos long form rescales to TimestampType") {
    val dir = java.nio.file.Files.createTempDirectory("tables-ns").toString
    val df = writeAndLoad(dir, lit(micros * 1000L))
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("events loader: native timestamp form passes through value-identically") {
    val dir = java.nio.file.Files.createTempDirectory("tables-us").toString
    val df = writeAndLoad(dir, timestamp_micros(lit(micros)))
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("events loader: timestamp_ntz form normalizes to TimestampType, same instant under UTC") {
    val dir = java.nio.file.Files.createTempDirectory("tables-ntz").toString
    val df = writeAndLoad(
      dir, timestamp_micros(lit(micros)).cast(TimestampNTZType))
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("events loader: current driver testdata loads and ts is a timestamp") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.filter(col("ts").isNotNull).limit(1).count() == 1)
  }
}
