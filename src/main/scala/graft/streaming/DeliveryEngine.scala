package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.store.EventRow

/** Structured-Streaming delivery engine (SURVEY §2.10 slice 2): the
  * reference's locks table + `stream_events` polling loop re-expressed
  * as a keyed state machine inside `flatMapGroupsWithState`.
  *
  * One engine instance ≙ one registered view (consumer group). Inputs
  * are a single stream of [[DeliveryInput]] — new events unioned with
  * ACK/NACK control messages, keyed by `decider_id` — mirroring how
  * the reference funnels appends (trigger fanout) and acknowledgments
  * (UPDATE locks) into the same per-partition row.
  *
  * State per partition ([[LockState]]): the pending-event buffer, the
  * last ACKed offset, and the lease expiry. Per micro-batch, per key:
  *
  *  1. apply ACK/NACK/scheduled-NACK control messages (M4-M6);
  *  2. enqueue new events past `lastOffset`;
  *  3. if the lease is free (expired or released) and something is
  *     pending, deliver the head event and take the lease
  *     (`now + lockTimeout`) — ≤ 1 in-flight event per partition,
  *     at-least-once: an un-ACKed delivery is re-delivered after the
  *     lease expires (reference README.md:168-189).
  *
  * Time is *message time* (`at` on every input): deterministic under
  * test, and in production the source stamps arrival time — same
  * contract as the reference's transaction-time NOW(). Parallelism:
  * Spark shuffles keys across tasks, so partitions progress
  * independently — exactly the reference's "parallel across
  * partitions, ordered within" guarantee; `SKIP LOCKED` degenerates
  * to single-owner keyed state (SURVEY §7.4.3).
  */
object DeliveryEngine {

  /** Event arrival or consumer control message, keyed by decider_id. */
  final case class DeliveryInput(
      decider_id: String,
      at: Timestamp,
      event: Option[EventRow],          // Some = append fanout
      ack: Option[Long],                // Some(offset) = ACK up to offset
      nack: Boolean = false,            // release lease, no advance
      nackDelayMs: Option[Long] = None) // scheduled NACK

  final case class PendingEvent(offset: Long, row: EventRow)

  final case class LockState(
      lastOffset: Long,
      lockedUntilMs: Long,
      pending: List[PendingEvent],
      offsetFinal: Boolean)

  final case class Delivered(
      view: String,
      decider_id: String,
      offset: Long,
      event_id: String,
      data: String,
      redelivery: Boolean)

  def event(e: EventRow): DeliveryInput =
    DeliveryInput(e.decider_id, e.created_at, Some(e), None)
  def ack(deciderId: String, at: Timestamp, offset: Long): DeliveryInput =
    DeliveryInput(deciderId, at, None, Some(offset))
  def nack(deciderId: String, at: Timestamp): DeliveryInput =
    DeliveryInput(deciderId, at, None, None, nack = true)
  def scheduleNack(deciderId: String, at: Timestamp, delayMs: Long): DeliveryInput =
    DeliveryInput(deciderId, at, None, None, nackDelayMs = Some(delayMs))

  /** The per-key transition function, factored out of the streaming
    * operator so batch tests can drive it directly and the streaming
    * path stays a thin wrapper (same state, same outputs).
    */
  def transition(view: String, lockTimeoutS: Long)(
      key: String, inputs: Iterator[DeliveryInput], state: LockState)
      : (LockState, List[Delivered]) = {
    var st = state
    var out = List.empty[Delivered]
    val sorted = inputs.toList.sortBy(i => (i.at.getTime, i.event.map(_.offset).getOrElse(0L)))
    var nowMs = 0L
    sorted.foreach { in =>
      nowMs = math.max(nowMs, in.at.getTime)
      in match {
        case DeliveryInput(_, at, _, Some(ackOffset), _, _) =>
          // M4: commit + release. Drop pending ≤ ackOffset (delivered).
          st = st.copy(
            lastOffset = math.max(st.lastOffset, ackOffset),
            lockedUntilMs = at.getTime - 1,
            pending = st.pending.filter(_.offset > ackOffset))
        case DeliveryInput(_, at, _, _, true, _) =>
          // M5: release without advancing → head redelivers.
          st = st.copy(lockedUntilMs = at.getTime - 1)
        case DeliveryInput(_, at, _, _, _, Some(delay)) =>
          // M6: delayed redelivery.
          st = st.copy(lockedUntilMs = at.getTime + delay)
        case DeliveryInput(_, _, Some(e), _, _, _) =>
          if (e.offset > st.lastOffset && !st.pending.exists(_.offset == e.offset)) {
            st = st.copy(
              pending = (st.pending :+ PendingEvent(e.offset, e)).sortBy(_.offset),
              offsetFinal = st.offsetFinal || e.is_final)
          }
        case _ => ()
      }
    }
    // Delivery decision at batch end: lease free + something pending.
    if (nowMs > st.lockedUntilMs) {
      st.pending.headOption.foreach { p =>
        val redelivery = st.lockedUntilMs > 0 // had been leased before
        out = Delivered(view, key, p.offset, p.row.event_id, p.row.data, redelivery) :: out
        st = st.copy(lockedUntilMs = nowMs + lockTimeoutS * 1000L)
      }
    }
    (st, out.reverse)
  }

  /** Streaming form: wire a DeliveryInput stream through the keyed
    * state machine.
    *
    * `wallClockTimeout = true` additionally registers a processing-time
    * timeout equal to the lease, so a silent partition (no inbound
    * traffic at all) still re-delivers after lease expiry — the
    * production setting. It is off by default because the timeout makes
    * the StreamExecution self-trigger batches, which never quiesces
    * under `processAllAvailable`-style deterministic tests; with
    * message-time inputs (every event/ack carries `at`), lease expiry
    * is already handled by [[transition]] on any same-key traffic.
    */
  def run(view: String, lockTimeoutS: Long,
          inputs: Dataset[DeliveryInput],
          wallClockTimeout: Boolean = false): Dataset[Delivered] = {
    val spark = inputs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (wallClockTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    inputs
      .groupByKey(_.decider_id)
      .flatMapGroupsWithState[LockState, Delivered](
        OutputMode.Append(), timeoutConf) {
        (key: String, it: Iterator[DeliveryInput], gs: GroupState[LockState]) =>
          val st0 = gs.getOption.getOrElse(LockState(0L, 0L, Nil, offsetFinal = false))
          val (st1, out) =
            if (wallClockTimeout && gs.hasTimedOut) {
              // Lease expired with no traffic: emit the head as a
              // redelivery using wall time.
              val nowMs = System.currentTimeMillis()
              if (nowMs > st0.lockedUntilMs && st0.pending.nonEmpty) {
                val p = st0.pending.head
                (st0.copy(lockedUntilMs = nowMs + lockTimeoutS * 1000L),
                  List(Delivered(view, key, p.offset, p.row.event_id, p.row.data,
                    redelivery = true)))
              } else (st0, Nil)
            } else transition(view, lockTimeoutS)(key, it, st0)
          gs.update(st1)
          if (wallClockTimeout) gs.setTimeoutDuration(lockTimeoutS * 1000L)
          out.iterator
      }
  }
}
