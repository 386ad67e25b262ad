package graft.sqlapi

import java.sql.Timestamp
import graft.SparkSpec

/** README-examples-as-tests for the 1:1 API facade (mirrors the
  * reference's tests/integration/end-to-end/test_readme_examples.sql —
  * doc-as-golden).
  */
class FStoreApiSpec extends SparkSpec {

  test("the reference README flow works verbatim through the facade") {
    val api = new FStoreApi(spark)
    var clock = 1700000000000L
    api.store.now = () => new Timestamp(clock)

    // README example 1: register the schema
    api.registerDeciderEvent("restaurant", "restaurant-created")
    api.registerDeciderEvent("restaurant", "menu-changed")

    // README example 2-3: append a chained stream
    val e1 = api.appendEvent("restaurant-created", "id-1", "restaurant", "r-1",
      """{"name":"by-the-sea"}""")
    assert(e1.isRight)
    val e2 = api.appendEvent("menu-changed", "id-2", "restaurant", "r-1",
      """{"menu":"fish"}""", previousId = Some("id-1"))
    assert(e2.isRight)

    // get_events returns both, ordered
    assert(api.getEvents("r-1", "restaurant").collect().map(_.event_id).toSeq
      === Seq("id-1", "id-2"))
    assert(api.getLastEvent("r-1").map(_.event_id) === Some("id-2"))
    // the reference's two-arg signature: the decider argument is
    // accepted and IGNORED (schema.sql:359-367's documented quirk) —
    // even a wrong decider returns the same row
    assert(api.getLastEvent("r-1", "restaurant").map(_.event_id) === Some("id-2"))
    assert(api.getLastEvent("r-1", "not-the-decider").map(_.event_id) === Some("id-2"))

    // streaming consumption with ack
    api.registerView("read-model", startAt = Some(new Timestamp(0L)))
    clock += 1000
    val batch1 = api.streamEvents("read-model", limit = 10)
    assert(batch1.map(_.event_id) === Seq("id-1"))
    api.ackEvent("read-model", "r-1", batch1.head.offset)
    val batch2 = api.streamEvents("read-model", limit = 10)
    assert(batch2.map(_.event_id) === Seq("id-2"))
    api.ackEvent("read-model", "r-1", batch2.head.offset)
    assert(api.streamEvents("read-model", limit = 10).isEmpty)

    // optimistic concurrency: a second writer claiming the same head loses
    val loser = api.appendEvent("menu-changed", "id-3", "restaurant", "r-1",
      """{"menu":"steak"}""", previousId = Some("id-1"))
    assert(loser.isLeft)
  }

  test("schedule_events pushes undelivered events to the injected sender") {
    val api = new FStoreApi(spark)
    var clock = 1700000000000L
    api.store.now = () => new Timestamp(clock)
    api.registerDeciderEvent("Order", "Placed")
    api.registerView("push-view", startAt = Some(new Timestamp(0L)))
    api.appendEvent("Placed", "p1", "Order", "o-1", """{"n":1}""")
    clock += 1000

    val sent = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    api.scheduleEvents("push-view", poolingDelayS = 1,
      url = "http://localhost:0/fn", send = (_, body) => sent.add(body))
    val deadline = System.currentTimeMillis() + 30000
    while (sent.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(200)
    assert(!sent.isEmpty)
    assert(sent.peek().contains("\"decider_id\":\"o-1\""))
    assert(api.unscheduleEvents("push-view"))
    assert(!api.unscheduleEvents("push-view"))
  }

  test("wedged async endpoint: the tick completes and unsent events redeliver at lease expiry") {
    val api = new FStoreApi(spark)
    var clock = 1700000000000L
    api.store.now = () => new Timestamp(clock)
    api.registerDeciderEvent("Order", "Placed")
    api.registerView("wedge-view", startAt = Some(new Timestamp(0L)))
    (0 until 4).foreach(i =>
      assert(api.appendEvent("Placed", s"w$i", "Order", s"o-$i", "{}").isRight))
    clock += 1000

    // capacity-1 async sender on an endpoint that hangs forever: one
    // payload occupies the worker, every later enqueue finds the
    // queue full — the tick must RETURN (tryApply path), not block
    // behind apply()'s backpressure
    val gate = new java.util.concurrent.CountDownLatch(1)
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val hung: (String, String) => Unit =
      (_, _) => { started.incrementAndGet(); gate.await() }
    val sender = new graft.streaming.PushSink.AsyncSender(
      transport = hung, capacity = 1, closeFlushMs = 50L)
    try {
      // virtual-time interval path: each runner loop calls clock() —
      // continued clock calls prove the tick BODY keeps completing
      val clockCalls = new java.util.concurrent.atomic.AtomicInteger(0)
      val vclock = new java.util.concurrent.atomic.AtomicLong(0L)
      api.scheduleEvents("wedge-view", "1 seconds", "http://x/fn", sender,
        () => { clockCalls.incrementAndGet(); vclock.get() },
        ms => { vclock.addAndGet(ms); Thread.sleep(1) })
      val deadline = System.currentTimeMillis() + 30000
      while (clockCalls.get() < 6 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(clockCalls.get() >= 6,
        "the delivery loop stalled behind the wedged endpoint")
      api.unscheduleEvents("wedge-view")

      // tick 1 leased all partitions and handed ONE payload to the
      // (hung) worker; the other enqueues were declined, not dropped
      assert(started.get() === 1, s"worker started ${started.get()} sends")
      assert(sender.dropped === 0L, "declined enqueues must not count as drops")
      assert(api.streamEvents("wedge-view", limit = 10).isEmpty,
        "events stay leased while the lease is live")

      // nothing was acked: at lease expiry every event redelivers —
      // the same at-least-once path a crashed consumer takes
      clock += 301 * 1000
      val redelivered = api.streamEvents("wedge-view", limit = 10)
      assert(redelivered.map(_.decider_id).toSet ===
        (0 until 4).map(i => s"o-$i").toSet,
        "every un-acked event must redeliver after its lease expires")
    } finally { gate.countDown(); sender.close() }
  }

  test("schedule_events accepts a 5-field cron string and pushes on its ticks") {
    val api = new FStoreApi(spark)
    // virtual clock shared by the store (lease logic) and the cron
    // runner, advanced by the runner's sleeper — a full scheduled-push
    // lifecycle in milliseconds of wall time
    val vclock = new java.util.concurrent.atomic.AtomicLong(1700000000000L)
    api.store.now = () => new Timestamp(vclock.get())
    api.registerDeciderEvent("Order", "Placed")
    api.registerView("cron-view", startAt = Some(new Timestamp(0L)),
      lockTimeoutS = 60L)
    api.appendEvent("Placed", "c1", "Order", "o-1", """{"n":1}""")

    val sent = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    api.scheduleEvents("cron-view", "* * * * *", "http://localhost:0/fn",
      send = (_, body) => sent.add(body),
      clock = () => vclock.get(),
      sleeper = ms => { vclock.addAndGet(ms); Thread.sleep(1) })
    // tick 1 delivers c1 (not acked); the 60 s lease expires after one
    // virtual minute, so a later tick REDELIVERS it — two observed
    // pushes proves the schedule fires repeatedly, not once
    val deadline = System.currentTimeMillis() + 30000
    while (sent.size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(api.unscheduleEvents("cron-view"))
    assert(sent.size >= 2, s"expected >=2 scheduled pushes, saw ${sent.size}")
    assert(sent.peek().contains("\"decider_id\":\"o-1\""))
  }

  test("schedule_events honors injected virtual time for interval schedules too") {
    val api = new FStoreApi(spark)
    val vclock = new java.util.concurrent.atomic.AtomicLong(1700000000000L)
    api.store.now = () => new Timestamp(vclock.get())
    api.registerDeciderEvent("Order", "Placed")
    api.registerView("iv-view", startAt = Some(new Timestamp(0L)), lockTimeoutS = 60L)
    api.appendEvent("Placed", "i1", "Order", "o-9", """{"n":1}""")
    val sent = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // '30 seconds' with an injected clock must tick on VIRTUAL time —
    // the interval branch used to silently fall back to wall-clock
    // ProcessingTime and a test like this one would hang to deadline
    api.scheduleEvents("iv-view", "30 seconds", "http://localhost:0/fn",
      send = (_, body) => sent.add(body),
      clock = () => vclock.get(),
      sleeper = ms => { vclock.addAndGet(ms); Thread.sleep(1) })
    val deadline = System.currentTimeMillis() + 15000
    while (sent.size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(api.unscheduleEvents("iv-view"))
    assert(sent.size >= 2, s"expected >=2 virtual-time interval pushes, saw ${sent.size}")
  }

  test("schedule_events rejects malformed schedule strings") {
    val api = new FStoreApi(spark)
    api.registerView("bad-sched-view")
    intercept[IllegalArgumentException] {
      api.scheduleEvents("bad-sched-view", "every now and then", "http://x/fn")
    }
  }
}
