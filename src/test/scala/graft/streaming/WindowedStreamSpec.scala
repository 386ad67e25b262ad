package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation over a stream of events with a
  * watermark — the extended-analytics streaming surface (SURVEY §2.10
  * note: the reference needs no watermark for delivery, but windowed
  * aggregates over event time do).
  */
class WindowedStreamSpec extends SparkSpec {

  test("tumbling window counts with watermark drop late data and close windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[Tick]
    val windowed = source.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("user"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("w_start"), col("user"), col("n"), col("total"))
    val q = windowed.writeStream
      .format("memory").queryName("win_sink")
      .outputMode("append") // append mode only emits CLOSED windows
      .start()
    try {
      val T = 1700000000000L
      def t(m: Long) = new Timestamp(T + m * 60000)
      // batch 1: two users in window [T, T+10m)
      source.addData(Tick("a", t(1), 1.0), Tick("a", t(2), 2.0), Tick("b", t(3), 5.0))
      q.processAllAvailable()
      // nothing emitted yet: window not past the watermark
      assert(spark.table("win_sink").count() === 0L)
      // batch 2: event at +25m advances the watermark past the first window
      source.addData(Tick("a", t(25), 9.0))
      q.processAllAvailable()
      // batch 3: a LATE event for the closed window must be dropped
      source.addData(Tick("a", t(1), 100.0))
      q.processAllAvailable()
      // batch 4: push the second window closed too
      source.addData(Tick("a", t(45), 0.0))
      q.processAllAvailable()
      val rows = spark.table("win_sink")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      // first window emitted exactly once, late +100.0 NOT included
      assert(rows.contains(("a", 2L, 3.0)))
      assert(rows.contains(("b", 1L, 5.0)))
      assert(!rows.exists { case (_, _, total) => total == 103.0 })
    } finally q.stop()
  }
}

/** Top-level so Spark can derive an Encoder. */
case class Tick(user: String, ts: Timestamp, value: Double)
