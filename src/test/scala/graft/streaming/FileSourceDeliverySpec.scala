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

  test("out-of-order file arrival: lower-offset events surfacing in a later batch still fold and deliver") {
    // The file source orders by modification time (cross-writer ties
    // break by path, writer-first), so a lower-offset file CAN surface
    // after a higher-offset one crossed a micro-batch boundary. The
    // old max-offset watermark silently dropped those rows — a
    // permanent delivery gap; the membership fold must deliver them.
    import graft.store.ViewStreams
    val t0 = 1700000000000L
    val stP = new EventStore(spark)
    stP.now = () => new Timestamp(t0)
    stP.registerDeciderEvent("Order", "E")
    stP.append((1 to 4).map(p => EventInput("E", s"e$p", "Order", s"p$p", "{}")))
    val logDir = java.nio.file.Files.createTempDirectory("oo-log").toString
    // the HIGH half (offsets 3-4) lands first…
    stP.allEvents.filter(col("offset") > 2).write.mode("append").parquet(logDir)

    val session = spark.newSession()
    import session.implicits._
    val stC = new EventStore(session)
    stC.now = () => new Timestamp(t0)
    stC.registerDeciderEvent("Order", "E")
    val vs = new ViewStreams(stC)
    vs.registerView("v", startAt = Some(new Timestamp(t0 - 1000)))
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[EventRow]()
    val schema = stP.allEvents.schema
    val stream = session.readStream.schema(schema).parquet(logDir).as[EventRow]
    val q = vs.runSharedDelivery("v", stream, limit = 8, seconds = 300)(
      got => { got.foreach(sunk.add); () })
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(sunk.asScala.map(_.event_id).toSet === Set("e3", "e4"))
      // …then the LOW half (offsets 1-2) arrives in a later batch,
      // entirely below the replica's head
      stP.allEvents.filter(col("offset") <= 2).write.mode("append").parquet(logDir)
      q.processAllAvailable()
      assert(sunk.asScala.map(_.event_id).toSet === Set("e1", "e2", "e3", "e4"),
        s"lower-offset events were dropped: ${sunk.asScala.map(_.event_id)}")
      // and the replica holds the full gapless sequence exactly once
      assert(stC.allEvents.collect().map(_.offset).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("two STREAMING consumers split one view's partitions via the shared journal") {
    import graft.store.ViewStreams
    val t0 = 1700000000000L
    val clock = new java.util.concurrent.atomic.AtomicLong(t0)
    def mk(session: org.apache.spark.sql.SparkSession): (EventStore, ViewStreams) = {
      val st = new EventStore(session)
      st.now = () => new Timestamp(clock.get())
      st.registerDeciderEvent("Order", "E")
      (st, new ViewStreams(st))
    }

    // producer: 8 partitions × 1 chained event, at rest as plain parquet
    val (stP, _) = mk(spark)
    stP.append((0 until 8).map(p => EventInput("E", s"e$p-0", "Order", s"p$p", "{}")))
    val logDir = java.nio.file.Files.createTempDirectory("sharedstream-log").toString
    stP.allEvents.write.mode("overwrite").parquet(logDir)
    val jDir = java.nio.file.Files.createTempDirectory("sharedstream-j").toString
    val schema = stP.allEvents.schema

    def consumer(name: String): (ViewStreams,
        java.util.concurrent.ConcurrentLinkedQueue[EventRow],
        org.apache.spark.sql.streaming.StreamingQuery) = {
      val session = spark.newSession()
      import session.implicits._
      val (_, vs) = mk(session)
      vs.openSharedJournal(jDir, ownerId = name)
      if (name == "A") vs.registerView("v", startAt = Some(new Timestamp(t0 - 1000)))
      val sunk = new java.util.concurrent.ConcurrentLinkedQueue[EventRow]()
      val stream = session.readStream.schema(schema).parquet(logDir).as[EventRow]
      val q = vs.runSharedDelivery("v", stream, limit = 4, seconds = 300)(
        got => { got.foreach(sunk.add); () })
      (vs, sunk, q)
    }

    import scala.jdk.CollectionConverters._
    val (vsA, gotA, qA) = consumer("A")
    try {
      qA.processAllAvailable()
      // A's single tick leased at most `limit` partitions
      assert(gotA.size === 4, s"A leased ${gotA.asScala.map(_.decider_id)}")

      val (vsB, gotB, qB) = consumer("B")
      try {
        qB.processAllAvailable()
        // B (same files, same view, same journal) takes the REST:
        // disjoint split, union complete — SKIP LOCKED across queries
        assert(gotB.size === 4, s"B leased ${gotB.asScala.map(_.decider_id)}")
        val partsA = gotA.asScala.map(_.decider_id).toSet
        val partsB = gotB.asScala.map(_.decider_id).toSet
        assert((partsA & partsB).isEmpty, s"double delivery: ${partsA & partsB}")
        assert(partsA ++ partsB === (0 until 8).map(p => s"p$p").toSet)

        // both ACK; the producer appends a second chained round — the
        // new file ticks both queries and the drain continues
        vsA.ackBatch("v", gotA.asScala.map(e => (e.decider_id, e.offset)).toSeq)
        vsB.ackBatch("v", gotB.asScala.map(e => (e.decider_id, e.offset)).toSeq)
        gotA.clear(); gotB.clear()
        stP.append((0 until 8).map(p =>
          EventInput("E", s"e$p-1", "Order", s"p$p", "{}", previous_id = Some(s"e$p-0"))))
        stP.allEvents.filter(col("offset") > 8).write.mode("append").parquet(logDir)
        qA.processAllAvailable(); qB.processAllAvailable()
        val round2 = (gotA.asScala ++ gotB.asScala).map(_.event_id).toSet
        assert((gotA.asScala.map(_.decider_id) ++ gotB.asScala.map(_.decider_id)).toSet.size === 8,
          s"round 2 incomplete: $round2")
        assert(round2 === (0 until 8).map(p => s"e$p-1").toSet, s"round 2: $round2")
      } finally { qB.stop(); vsB.closeSharedJournal() }
    } finally { qA.stop(); vsA.closeSharedJournal() }
  }
}
