package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.store.{EventInput, EventRow, EventStore}
import graft.streaming.DeliveryEngine._
import org.apache.spark.sql.functions._

/** S5 production wiring: the delivery engine fed from a FILE stream —
  * a directory of event parquet (what the at-rest log looks like)
  * consumed via readStream, mapped to DeliveryInput, and drained
  * through the lease state machine.
  */
class FileSourceDeliverySpec extends SparkSpec {

  test("parquet file stream drives the delivery state machine") {
    import spark.implicits._
    val s = new EventStore(spark)
    s.now = () => new Timestamp(1700000000000L)
    s.registerDeciderEvent("P", "E")
    s.append(Seq(
      EventInput("E", "f1", "P", "pX", "{}"),
      EventInput("E", "f2", "P", "pY", "{}"),
      EventInput("E", "f3", "P", "pX", "{}", previous_id = Some("f1"))))
    val dir = java.nio.file.Files.createTempDirectory("filesrc").toString
    s.allEvents.write.mode("overwrite").parquet(dir)

    val schema = s.allEvents.schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .as[EventRow]
      .map(DeliveryEngine.event)
    val delivered = DeliveryEngine.run("file_view", 300, stream)
    val q = delivered.writeStream
      .format("memory").queryName("file_sink").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_sink").as[Delivered].collect()
      // one in-flight event per partition: pX's head f1, pY's f2
      assert(got.map(_.event_id).toSet === Set("f1", "f2"))
    } finally q.stop()
  }
}
