package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join with watermarks — the remaining
  * Structured Streaming join shape (clicks joined to purchases of the
  * same user within a bounded event-time window; state on both sides
  * is bounded by the watermark + interval condition).
  */
class StreamStreamJoinSpec extends SparkSpec {

  test("clicks join purchases within a 10-minute event-time interval") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Tick]
    val purchases = MemoryStream[Tick]
    val c = clicks.toDS()
      .select(col("user").as("c_user"), col("ts").as("c_ts"), col("value").as("c_v"))
      .withWatermark("c_ts", "1 minute")
    val p = purchases.toDS()
      .select(col("user").as("p_user"), col("ts").as("p_ts"), col("value").as("p_v"))
      .withWatermark("p_ts", "1 minute")
    val joined = c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("c_user").as("user"), col("c_v"), col("p_v"))
    val q = joined.writeStream.format("memory").queryName("ssj_sink")
      .outputMode("append").start()
    try {
      val T = 1700000000000L
      def t(m: Long) = new Timestamp(T + m * 60000)
      clicks.addData(Tick("a", t(0), 1.0), Tick("b", t(0), 2.0))
      purchases.addData(
        Tick("a", t(5), 10.0),   // within 10 min of a's click → joins
        Tick("b", t(30), 20.0))  // 30 min after b's click → outside interval
      q.processAllAvailable()
      val rows = spark.table("ssj_sink")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(rows === Set(("a", 1.0, 10.0)))
    } finally q.stop()
  }
}
