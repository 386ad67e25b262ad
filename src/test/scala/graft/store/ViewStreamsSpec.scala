package graft.store

import java.sql.Timestamp
import graft.SparkSpec

/** Unit + integration suite for the event-streaming layer, mirroring
  * the reference's tests/unit/event-streaming suites and
  * tests/integration/end-to-end/test_complete_workflow.sql (SURVEY §5):
  * view registration + backfill seek (A3/A4 with the `offset - 1`
  * off-by-one), the 4-stage delivery pipeline, lease exclusivity and
  * expiry, ACK/NACK/scheduled-NACK, and finality propagation.
  */
class ViewStreamsSpec extends SparkSpec with graft.testkit.TestKitReported {

  private val T0 = 1700000000000L
  private def ts(millisAfterT0: Long) = new Timestamp(T0 + millisAfterT0)

  /** Store with a controllable clock and a 3-event × 2-partition log:
    *   offset 1  p1  t=0
    *   offset 2  p2  t=60s
    *   offset 3  p1  t=120s
    */
  private def fixture(): (EventStore, ViewStreams, Timestamp => Unit) = {
    val s = new EventStore(spark)
    var clock = ts(0)
    s.now = () => clock
    def setClock(t: Timestamp): Unit = clock = t
    s.registerDeciderEvent("Order", "E")
    val vs = new ViewStreams(s)
    s.appendEvent(EventInput("E", "e1", "Order", "p1", "{}"))
    setClock(ts(60000))
    s.appendEvent(EventInput("E", "e2", "Order", "p2", "{}"))
    setClock(ts(120000))
    s.appendEvent(EventInput("E", "e3", "Order", "p1", "{}", previous_id = Some("e1")))
    (s, vs, setClock)
  }

  test("register_view backfills last_offset to just before start_at (A4 seek)") {
    val (_, vs, setClock) = fixture()
    setClock(ts(130000))
    // start_at between e1 (t=0) and e3 (t=120s): p1 should replay from
    // e3 → last_offset = first_after(3) - 1 = 2; p2's only event is
    // before start_at → nothing to replay → last_offset = max = 2.
    vs.registerView("v", startAt = Some(ts(90000)))
    val locks = vs.allLocks.collect().map(l => l.decider_id -> l).toMap
    assert(locks("p1").last_offset === 2L)
    assert(locks("p1").offset === 3L)
    assert(locks("p2").last_offset === 2L)
    assert(locks("p2").offset === 2L)
  }

  test("register_view with start_at = beginning replays everything") {
    val (_, vs, setClock) = fixture()
    setClock(ts(130000))
    vs.registerView("v", startAt = Some(ts(-1000)))
    val locks = vs.allLocks.collect().map(l => l.decider_id -> l).toMap
    // first event ≥ start_at per partition minus one
    assert(locks("p1").last_offset === 0L)
    assert(locks("p2").last_offset === 1L)
  }

  test("stream_events delivers the next event per partition, ordered by offset") {
    val (_, vs, setClock) = fixture()
    setClock(ts(130000))
    vs.registerView("v", startAt = Some(ts(-1000)))
    val got = vs.streamEvents("v", limit = 10)
    // one in-flight event per partition: p1's next (e1, offset 1) and
    // p2's next (e2, offset 2) — NOT e3 (same partition as e1).
    assert(got.map(_.event_id) === Seq("e1", "e2"))
  }

  test("a leased partition is skipped until the lease expires (at-least-once)") {
    val (_, vs, setClock) = fixture()
    setClock(ts(130000))
    vs.registerView("v", startAt = Some(ts(-1000)))
    val first = vs.streamEvents("v", limit = 10, seconds = 300)
    assert(first.nonEmpty)
    // immediately re-poll: both partitions are leased → nothing
    assert(vs.streamEvents("v", limit = 10).isEmpty)
    // after the lease window passes, the SAME events are redelivered
    // (no ACK happened — at-least-once)
    setClock(ts(130000 + 301 * 1000))
    val redelivered = vs.streamEvents("v", limit = 10)
    assert(redelivered.map(_.event_id) === first.map(_.event_id))
  }

  test("ack advances the offset and releases the lease; next poll moves on") {
    val (_, vs, setClock) = fixture()
    setClock(ts(130000))
    vs.registerView("v", startAt = Some(ts(-1000)))
    val first = vs.streamEvents("v", limit = 10)
    assert(first.map(_.event_id) === Seq("e1", "e2"))
    val acked = vs.ack("v", "p1", 1L)
    assert(acked.map(_.last_offset) === Some(1L))
    // p1 now serves e3; p2 is still leased
    assert(vs.streamEvents("v", limit = 10).map(_.event_id) === Seq("e3"))
  }

  test("nack releases the lease without advancing → immediate redelivery") {
    val (_, vs, setClock) = fixture()
    setClock(ts(130000))
    vs.registerView("v", startAt = Some(ts(-1000)))
    vs.streamEvents("v", limit = 1)          // leases p1 (lowest head offset? candidates ordered by offset)
    val nacked = vs.nack("v", "p2").orElse(vs.nack("v", "p1"))
    assert(nacked.nonEmpty)
    val again = vs.streamEvents("v", limit = 10)
    assert(again.nonEmpty)
  }

  test("scheduled nack delays redelivery by the given milliseconds") {
    val (_, vs, setClock) = fixture()
    setClock(ts(130000))
    vs.registerView("v", startAt = Some(ts(-1000)))
    val first = vs.streamEvents("v", limit = 10, seconds = 1)
    assert(first.map(_.event_id) === Seq("e1", "e2"))
    setClock(ts(140000)) // leases (1 s) have expired by now
    vs.scheduleNack("v", "p1", 60000)
    vs.scheduleNack("v", "p2", 60000)
    assert(vs.streamEvents("v", limit = 10).isEmpty)  // still delayed
    setClock(ts(140000 + 61000))
    assert(vs.streamEvents("v", limit = 10).map(_.event_id) === Seq("e1", "e2"))
  }

  test("new appends fan out to every registered view's locks (M1)") {
    val (s, vs, setClock) = fixture()
    setClock(ts(130000))
    vs.registerView("v1", startAt = Some(ts(-1000)))
    vs.registerView("v2", startAt = Some(ts(-1000)))
    s.appendEvent(EventInput("E", "e4", "Order", "p3", "{}"))
    val locks = vs.allLocks.collect()
    val p3 = locks.filter(_.decider_id == "p3")
    assert(p3.map(_.view).toSet === Set("v1", "v2"))
    assert(p3.forall(_.offset === 4L))
    assert(p3.forall(_.last_offset === 0L)) // born at stream start
  }

  test("finality propagates to locks (offset_final) for end-of-partition detection") {
    val (s, vs, setClock) = fixture()
    setClock(ts(130000))
    vs.registerView("v", startAt = Some(ts(-1000)))
    s.appendEvent(EventInput("E", "e4", "Order", "p2", "{}",
      previous_id = Some("e2"), is_final = true))
    val p2 = vs.allLocks.filter(_.decider_id == "p2").collect().head
    assert(p2.offset_final)
    assert(p2.offset === 4L)
  }

  test("two views stream the same partition independently") {
    // ≙ reference tests/integration/concurrent-access/test_lock_contention.sql
    val (_, vs, setClock) = fixture()
    setClock(ts(130000))
    vs.registerView("v1", startAt = Some(ts(-1000)))
    vs.registerView("v2", startAt = Some(ts(-1000)))
    val a = vs.streamEvents("v1", limit = 10)
    val b = vs.streamEvents("v2", limit = 10)
    assert(a.map(_.event_id) === b.map(_.event_id))
    // v1 acking does not affect v2's position
    vs.ack("v1", "p1", 1L)
    setClock(ts(130000 + 301 * 1000))
    assert(vs.streamEvents("v1", limit = 10).map(_.event_id) === Seq("e2", "e3"))
    assert(vs.streamEvents("v2", limit = 10).map(_.event_id) === Seq("e1", "e2"))
  }

  test("delete_view cascades to its locks") {
    val (_, vs, setClock) = fixture()
    setClock(ts(130000))
    vs.registerView("v", startAt = Some(ts(-1000)))
    assert(vs.allLocks.count() > 0)
    vs.deleteView("v")
    assert(vs.allLocks.count() === 0L)
    assert(vs.allViews.count() === 0L)
  }

  test("end-to-end workflow: register → append → get → stream → ack → drain") {
    // ≙ reference tests/integration/end-to-end/test_complete_workflow.sql:32-66
    val s = new EventStore(spark)
    var clock = ts(0)
    s.now = () => clock
    s.registerDeciderEvent("Cart", "ItemAdded")
    s.registerDeciderEvent("Cart", "CheckedOut")
    val vs = new ViewStreams(s)
    vs.registerView("projector", startAt = Some(ts(-1000)), lockTimeoutS = 300)

    s.appendEvent(EventInput("ItemAdded", "c1", "Cart", "cart-1", """{"sku":"a"}"""))
    clock = ts(1000)
    s.appendEvent(EventInput("CheckedOut", "c2", "Cart", "cart-1", "{}",
      previous_id = Some("c1"), is_final = true))

    assert(s.getEvents("cart-1", "Cart").collect().map(_.event_id).toSeq === Seq("c1", "c2"))

    clock = ts(2000)
    var delivered = List.empty[String]
    var got = vs.streamEvents("projector", limit = 10)
    while (got.nonEmpty) {
      got.foreach { e =>
        delivered ::= e.event_id
        vs.ack("projector", e.decider_id, e.offset)
      }
      got = vs.streamEvents("projector", limit = 10)
    }
    assert(delivered.reverse === List("c1", "c2"))
    // partition is drained AND final
    val lock = vs.allLocks.collect().head
    assert(lock.last_offset === lock.offset)
    assert(lock.offset_final)
  }
}
