package graft.store

import java.sql.Timestamp
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import graft.SparkSpec

/** Concurrent-access guarantees, mirroring the reference's
  * tests/integration/concurrent-access suites:
  *
  *  - test_lock_contention.sql:41-48 — two sessions streaming the SAME
  *    view must never lease (and so never deliver) the same partition
  *    concurrently; FOR UPDATE SKIP LOCKED makes candidate selection +
  *    lease acquisition one atomic step. Our analogue is the
  *    stateLock-guarded stage 1+2 of ViewStreams.streamEvents.
  *
  *  - schema.sql:23-26 / README.md:106-108 — two writers extending the
  *    same stream head race on previous_id; the UNIQUE(previous_id)
  *    index makes exactly one win. Our analogue is EventStore's
  *    commitLock: the loser validates after the winner's commit and
  *    sees DuplicatePreviousId.
  */
class ConcurrencySpec extends SparkSpec with graft.testkit.TestKitReported {

  private val T0 = 1700000000000L
  private def ts(ms: Long) = new Timestamp(T0 + ms)

  /** Run `n` thunks simultaneously (shared start latch) and collect
    * results; rethrows the first worker failure.
    */
  private def race[A](thunks: Seq[() => A]): Seq[A] = {
    val pool = Executors.newFixedThreadPool(thunks.size)
    val start = new CountDownLatch(1)
    try {
      val futs = thunks.map(t => pool.submit(new java.util.concurrent.Callable[A] {
        def call(): A = { start.await(); t() }
      }))
      start.countDown()
      futs.map(_.get(120, TimeUnit.SECONDS))
    } finally pool.shutdownNow()
  }

  test("two racing writers on one stream head: exactly one wins") {
    val store = new EventStore(spark)
    store.now = () => ts(0)
    store.registerDeciderEvent("Acct", "E")
    store.appendEvent(EventInput("E", "head", "Acct", "a1", "{}"))

    // Both writers claim previous_id = "head". Repeat the race a few
    // rounds, extending from whichever event won the previous round.
    var head = "head"
    (0 until 5).foreach { round =>
      val ids = Seq(s"w1-$round", s"w2-$round")
      val results = race(ids.map(id => () =>
        store.appendEvent(EventInput("E", id, "Acct", "a1", "{}",
          previous_id = Some(head)))))
      val winners = results.collect { case Right(row) => row }
      val losers = results.collect { case Left(err) => err }
      assert(winners.size == 1, s"round $round: ${winners.size} winners")
      assert(losers.size == 1, s"round $round: ${losers.size} losers")
      assert(losers.head.isInstanceOf[AppendError.DuplicatePreviousId],
        s"round $round: loser got ${losers.head}")
      head = winners.head.event_id
    }

    // The committed chain is linear: one event per previous_id, no
    // duplicate event_ids, 6 events total (head + 5 round winners).
    val rows = store.allEvents.collect()
    assert(rows.length == 6)
    assert(rows.map(_.event_id).distinct.length == 6)
    assert(rows.flatMap(_.previous_id).distinct.length == 5)
  }

  test("two consumers streaming one view never double-deliver (SKIP LOCKED analogue)") {
    val store = new EventStore(spark)
    var clock = ts(0)
    store.now = () => clock
    store.registerDeciderEvent("Order", "E")
    val vs = new ViewStreams(store)

    // 24 events across 8 partitions, chained within each partition.
    val batch = (0 until 24).map { i =>
      val part = s"p${i % 8}"
      val prev = if (i < 8) None else Some(s"e${i - 8}")
      EventInput("E", s"e$i", "Order", part, s"""{"i":$i}""", previous_id = prev)
    }
    val res = store.append(batch)
    assert(res.rejected.isEmpty && res.accepted.size == 24)

    clock = ts(1000)
    vs.registerView("v", startAt = Some(ts(0)))

    // Two pollers drain the view concurrently with a long lease (no
    // expiry mid-test) and per-event ACKs. Every delivered event is
    // recorded; the union must be exactly the 24 events, each ONCE.
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    def drain(): Int = {
      var got = 0
      var idle = 0
      while (idle < 3) {
        val events = vs.streamEvents("v", limit = 2, seconds = 600L)
        if (events.isEmpty) idle += 1
        else {
          idle = 0
          events.foreach { e =>
            delivered.add((e.decider_id, e.offset))
            vs.ack("v", e.decider_id, e.offset)
          }
          got += events.size
        }
      }
      got
    }
    val counts = race(Seq(() => drain(), () => drain()))

    val all = delivered.toArray(Array.empty[(String, Long)]).toSeq
    assert(all.size == counts.sum)
    assert(all.distinct.size == all.size,
      s"double delivery: ${all.groupBy(identity).collect { case (k, v) if v.size > 1 => k }}")
    assert(all.toSet == store.allEvents.collect()
      .map(e => (e.decider_id, e.offset)).toSet,
      "not every event was delivered exactly once")
  }
}
