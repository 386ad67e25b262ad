package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.store.EventRow
import graft.streaming.DeliveryEngine._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming-delivery suite: the keyed lease state machine (unit,
  * through the factored transition function) and the end-to-end
  * Structured Streaming wiring (MemoryStream → flatMapGroupsWithState
  * → memory sink), mirroring the reference's stream_events +
  * acknowledgment tests at the micro-batch level.
  */
class DeliveryEngineSpec extends SparkSpec {

  private def ev(id: String, part: String, offset: Long, atMs: Long,
                 fin: Boolean = false): EventRow =
    EventRow("E", id, 1L, "Order", part, s"""{"n":$offset}""", None, None,
      fin, new Timestamp(atMs), offset, 1L)

  private val T = 1700000000000L

  // --- transition unit tests ---------------------------------------

  test("delivers the head pending event and takes the lease") {
    val (st, out) = transition("v", 300)(
      "p1", Iterator(event(ev("e1", "p1", 1, T))),
      LockState(0, 0, Nil, offsetFinal = false))
    assert(out.map(_.event_id) === List("e1"))
    assert(st.lockedUntilMs === T + 300000)
    assert(st.pending.map(_.offset) === List(1L))  // kept until ACK
  }

  test("no second delivery while the lease is held (≤1 in flight)") {
    val (st1, _) = transition("v", 300)(
      "p1", Iterator(event(ev("e1", "p1", 1, T)), event(ev("e2", "p1", 2, T))),
      LockState(0, 0, Nil, offsetFinal = false))
    val (_, out2) = transition("v", 300)(
      "p1", Iterator(event(ev("e3", "p1", 3, T + 1000))), st1)
    assert(out2.isEmpty) // e1 in flight, lease until T+300s
  }

  test("ACK advances, drops delivered, and frees the lease for the next event") {
    val (st1, _) = transition("v", 300)(
      "p1", Iterator(event(ev("e1", "p1", 1, T)), event(ev("e2", "p1", 2, T))),
      LockState(0, 0, Nil, offsetFinal = false))
    val (st2, out2) = transition("v", 300)(
      "p1", Iterator(ack("p1", new Timestamp(T + 5000), 1L)), st1)
    assert(out2.map(_.event_id) === List("e2"))
    assert(st2.lastOffset === 1L)
    assert(st2.pending.map(_.offset) === List(2L))
  }

  test("lease expiry redelivers the un-ACKed head (at-least-once)") {
    val (st1, out1) = transition("v", 10)(
      "p1", Iterator(event(ev("e1", "p1", 1, T))),
      LockState(0, 0, Nil, offsetFinal = false))
    assert(out1.size === 1)
    // 11 s later, any traffic (here a later event) re-triggers delivery
    val (_, out2) = transition("v", 10)(
      "p1", Iterator(event(ev("e2", "p1", 2, T + 11000))), st1)
    assert(out2.map(_.event_id) === List("e1"))
    assert(out2.head.redelivery)
  }

  test("NACK redelivers immediately; scheduled NACK delays") {
    val (st1, _) = transition("v", 300)(
      "p1", Iterator(event(ev("e1", "p1", 1, T))),
      LockState(0, 0, Nil, offsetFinal = false))
    val (_, outNack) = transition("v", 300)(
      "p1", Iterator(nack("p1", new Timestamp(T + 1000))), st1)
    assert(outNack.map(_.event_id) === List("e1"))

    val (st2, outSched) = transition("v", 300)(
      "p1", Iterator(scheduleNack("p1", new Timestamp(T + 1000), 60000)), st1)
    assert(outSched.isEmpty)
    val (_, outLater) = transition("v", 300)(
      "p1", Iterator(event(ev("e9", "p9", 9, T + 62000))), st2)
    // message for another partition wouldn't reach this key; simulate
    // the delayed wake-up with a same-key control no-op instead:
    val (_, outWake) = transition("v", 300)(
      "p1", Iterator(nack("p1", new Timestamp(T + 62000))), st2)
    assert(outWake.map(_.event_id) === List("e1"))
    assert(outLater.map(_.event_id) === List("e1")) // any same-key input works
  }

  test("final flag is tracked in state (end-of-partition detection)") {
    val (st, _) = transition("v", 300)(
      "p1", Iterator(event(ev("e1", "p1", 1, T, fin = true))),
      LockState(0, 0, Nil, offsetFinal = false))
    assert(st.offsetFinal)
  }

  test("duplicate and already-acked arrivals are ignored") {
    val st0 = LockState(5, 0, Nil, offsetFinal = false)
    val (st, out) = transition("v", 300)(
      "p1", Iterator(event(ev("e3", "p1", 3, T)), event(ev("e6", "p1", 6, T)),
        event(ev("e6", "p1", 6, T))), st0)
    assert(st.pending.map(_.offset) === List(6L))
    assert(out.map(_.offset) === List(6L))
  }

  // --- end-to-end streaming ----------------------------------------

  test("streaming pipeline delivers per-partition through micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[DeliveryInput]
    val delivered = DeliveryEngine.run("proj", 300, source.toDS())
    val q = delivered.writeStream
      .format("memory").queryName("delivered_sink")
      .outputMode("append").start()
    try {
      // batch 1: two partitions, two events each
      source.addData(
        event(ev("a1", "pA", 1, T)), event(ev("a2", "pA", 2, T)),
        event(ev("b1", "pB", 3, T)))
      q.processAllAvailable()
      val got1 = spark.table("delivered_sink").as[Delivered].collect()
      assert(got1.map(_.event_id).toSet === Set("a1", "b1")) // one per partition

      // batch 2: ACK pA's head → a2 delivered; pB still leased
      source.addData(ack("pA", new Timestamp(T + 5000), 1L))
      q.processAllAvailable()
      val got2 = spark.table("delivered_sink").as[Delivered].collect()
      assert(got2.map(_.event_id).toSet === Set("a1", "b1", "a2"))
    } finally q.stop()
  }

  test("property: random event/ack/nack schedules stay ordered, leased, at-least-once") {
    for (seed <- Seq(3, 91, 445)) {
      val rnd = new scala.util.Random(seed)
      val lockS = 30L
      var st = LockState(0, 0, Nil, offsetFinal = false)
      var t = T
      var appended = 0L
      var acked = 0L
      var lastDelivery: Option[(Long, Long)] = None // (offset, leaseUntilMs)
      var releasedSince = true // ack/nack freed the lease since the last delivery
      val deliveredOffsets = scala.collection.mutable.Set.empty[Long]

      def run(inputs: Seq[DeliveryInput]): Unit = {
        val (st1, out) = transition("v", lockS)("p", inputs.iterator, st)
        st = st1
        assert(out.size <= 1, s"seed $seed: >1 delivery in one batch for one key")
        out.foreach { d =>
          // ordered: always the smallest un-acked offset (acks are
          // contiguous by construction below)
          assert(d.offset === acked + 1,
            s"seed $seed: delivered ${d.offset}, expected head ${acked + 1}")
          // leased: a second delivery needs expiry or an explicit release
          lastDelivery.foreach { case (_, until) =>
            assert(releasedSince || t > until,
              s"seed $seed: delivery at $t inside a live lease (until $until)")
          }
          lastDelivery = Some((d.offset, t + lockS * 1000))
          releasedSince = false
          deliveredOffsets += d.offset
        }
      }

      for (_ <- 0 until 60) {
        t += 1000L + rnd.nextInt(20000)
        val inputs = scala.collection.mutable.Buffer.empty[DeliveryInput]
        if (rnd.nextInt(3) == 0) { // new chained event
          appended += 1
          inputs += event(ev(s"x$appended", "p", appended, t))
        }
        if (lastDelivery.exists(_._1 == acked + 1) && rnd.nextInt(3) == 0) {
          rnd.nextInt(3) match {
            case 0 => inputs += ack("p", new Timestamp(t), acked + 1)
              acked += 1; releasedSince = true
            case 1 => inputs += nack("p", new Timestamp(t)); releasedSince = true
            case _ => inputs += scheduleNack("p", new Timestamp(t), 2000L)
              // delayed redelivery: treat as released once its delay passes;
              // conservatively mark released (the lease check uses OR-expiry)
              releasedSince = true
          }
        }
        if (inputs.isEmpty) inputs += nack("p", new Timestamp(t)) // time carrier
        // control messages apply BEFORE the batch-end delivery decision,
        // so any ack/nack/scheduled-nack in this batch frees the lease
        // for the very delivery this run may emit
        if (inputs.exists(i => i.ack.isDefined || i.nack || i.nackDelayMs.isDefined))
          releasedSince = true
        run(inputs.toSeq)
      }

      // drain: keep acking + advancing until everything is delivered
      var guard = 0
      while (acked < appended && guard < 10000) {
        guard += 1
        t += lockS * 1000 + 1000
        run(Seq(nack("p", new Timestamp(t))))
        lastDelivery.filter(_._1 == acked + 1).foreach { _ =>
          t += 1000
          // the ack applies before the batch-end delivery decision, so
          // this run may deliver the NEXT head — advance the model first
          acked += 1; releasedSince = true
          run(Seq(ack("p", new Timestamp(t), acked)))
        }
      }
      assert(acked === appended, s"seed $seed: drain stalled at $acked/$appended")
      // at-least-once totality: every appended offset was delivered
      assert(deliveredOffsets === (1L to appended).toSet,
        s"seed $seed: missing deliveries ${(1L to appended).toSet -- deliveredOffsets}")
    }
  }

  test("push sink envelope matches the reference payload shape") {
    import spark.implicits._
    val d = Seq(Delivered("v", "p1", 7, "e7", """{"x":1}""", redelivery = false)).toDS()
    val body = PushSink.envelope(d).collect().head.getString(0)
    assert(body === """{"view":"v","decider_id":"p1","offset":7,"data":"{\"x\":1}"}""")
  }

  test("push delivery runs EXECUTOR-side (no driver fan-in); every partition's payload arrives") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sent = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val source = MemoryStream[DeliveryInput]
    val delivered = DeliveryEngine.run("pushexec", 300, source.toDS())
    val q = PushSink.start("push_exec_q", delivered, "http://localhost:0/fn", 1,
      (_, body) => { sent.add((Thread.currentThread().getName, body)); () })
    try {
      source.addData((1 to 6).map(i => event(ev(s"e$i", s"p$i", 1, T))): _*)
      val deadline = System.currentTimeMillis() + 30000
      while (sent.size < 6 && System.currentTimeMillis() < deadline) Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      val got = sent.asScala.toSeq
      assert(got.map(_._2).toSet.size === 6, s"missing payloads: ${got.map(_._2)}")
      // the send ran inside Spark tasks (foreachPartition), not on the
      // streaming micro-batch thread — the driver never collects rows
      assert(got.forall(_._1.contains("Executor task launch worker")),
        s"sends not executor-side: ${got.map(_._1).distinct}")
    } finally q.stop()
  }

  test("scheduler replaces and unschedules named view queries (M10)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sched = new PushSink.Scheduler
    val sent = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val source = MemoryStream[DeliveryInput]
    val delivered = DeliveryEngine.run("pushview", 300, source.toDS())
    sched.schedule("pushview",
      PushSink.start("push_q1", delivered, "http://localhost:0/fn", 1,
        (_, body) => sent.add(body)))
    assert(sched.active === Set("pushview"))
    source.addData(event(ev("e1", "p1", 1, T)))
    // trigger fires on processing time; wait for the batch
    val deadline = System.currentTimeMillis() + 30000
    while (sent.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(200)
    assert(!sent.isEmpty)
    assert(sent.peek().contains("\"decider_id\":\"p1\""))
    assert(sched.unschedule("pushview"))
    assert(sched.active.isEmpty)
    assert(!sched.unschedule("pushview"))
  }
}
