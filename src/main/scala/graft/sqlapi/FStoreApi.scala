package graft.sqlapi

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.store._
import graft.streaming.PushSink

/** 1:1 facade over the reference's 10-function SQL API
  * (reference README.md:46-59) so a user of fstore-sql can switch by
  * name. Thin delegation — all semantics live in graft.store /
  * graft.streaming; reference signatures' defaults are preserved
  * (limit = 1, seconds = 300, lock_timeout_s = 300).
  *
  * | reference SQL function            | here                       |
  * |-----------------------------------|----------------------------|
  * | register_decider_event(...)       | registerDeciderEvent       |
  * | append_event(...)                 | appendEvent                |
  * | get_events(decider_id, decider)   | getEvents                  |
  * | get_last_event(decider_id, decider) | getLastEvent            |
  * | register_view(...)                | registerView               |
  * | stream_events(view, limit, secs)  | streamEvents               |
  * | ack_event(view, decider_id, off)  | ackEvent                   |
  * | nack_event(view, decider_id)      | nackEvent                  |
  * | schedule_nack_event(view, id, ms) | scheduleNackEvent          |
  * | schedule_events(view, cron, url)  | scheduleEvents             |
  */
final class FStoreApi(spark: SparkSession) {
  val store = new EventStore(spark)
  val streams = new ViewStreams(store)
  private val scheduler = new PushSink.Scheduler

  def registerDeciderEvent(decider: String, event: String,
                           eventVersion: Long = 1L,
                           description: Option[String] = None): DeciderRegistration =
    store.registerDeciderEvent(decider, event, eventVersion, description)

  def appendEvent(event: String, eventId: String, decider: String,
                  deciderId: String, data: String,
                  commandId: Option[String] = None,
                  previousId: Option[String] = None,
                  eventVersion: Long = 1L,
                  isFinal: Boolean = false): Either[AppendError, EventRow] =
    store.appendEvent(EventInput(event, eventId, decider, deciderId, data,
      commandId, previousId, eventVersion, isFinal))

  def getEvents(deciderId: String, decider: String): Dataset[EventRow] =
    store.getEvents(deciderId, decider)

  def getLastEvent(deciderId: String): Option[EventRow] =
    store.getLastEvent(deciderId)

  /** The reference signature verbatim: `get_last_event(v_decider_id,
    * v_decider)` takes a decider argument it never reads
    * (schema.sql:359-367 — the WHERE clause filters on decider_id
    * only, a documented quirk). Accepted and ignored here so a caller
    * porting reference call sites compiles 1:1. */
  def getLastEvent(deciderId: String, decider: String): Option[EventRow] =
    store.getLastEvent(deciderId)

  def registerView(view: String, startAt: Option[Timestamp] = None,
                   lockTimeoutS: Long = 300L,
                   poolingDelayS: Option[Long] = None,
                   edgeFunctionUrl: Option[String] = None): ViewRegistration =
    streams.registerView(view, startAt, lockTimeoutS, poolingDelayS, edgeFunctionUrl)

  def streamEvents(view: String, limit: Int = 1, seconds: Long = 300L): Seq[EventRow] =
    streams.streamEvents(view, limit, seconds)

  def ackEvent(view: String, deciderId: String, offset: Long): Option[LockRow] =
    streams.ack(view, deciderId, offset)

  def nackEvent(view: String, deciderId: String): Option[LockRow] =
    streams.nack(view, deciderId)

  def scheduleNackEvent(view: String, deciderId: String,
                        milliseconds: Long): Option[LockRow] =
    streams.scheduleNack(view, deciderId, milliseconds)

  /** Reference schedule_events(view, schedule, url): start/replace the
    * view's push loop (extensions.sql:29-57 — pg_cron fires a
    * stream_events call every N seconds and POSTs each event).
    * Spark-natively the cron tick is a rate-source streaming query
    * with `Trigger.ProcessingTime(poolingDelayS)`: each trigger drains
    * one `stream_events` batch and posts its envelopes through the
    * injectable sender. Like the reference, push does NOT auto-ack —
    * un-acked events redeliver after the lease expires.
    */
  def scheduleEvents(view: String, poolingDelayS: Long, url: String,
                     send: (String, String) => Unit = PushSink.HttpSender): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val reg = registeredView(view)
    scheduler.schedule(view, {
      spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .writeStream
        .queryName(s"push_$view")
        .trigger(Trigger.ProcessingTime(poolingDelayS * 1000L))
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          pullAndPost(view, reg.lock_timeout_s, url, send)
        }
        .start()
    })
  }

  /** Reference signature parity: schedule_events(view, schedule, url)
    * where `schedule` is any pg_cron string (extensions.sql:29-57,
    * default '1 seconds'). Interval grammar maps to the
    * ProcessingTime streaming path above; a 5-field cron expression
    * drives a [[graft.streaming.CronRunner]] firing one pull+post per
    * tick — exactly the statement pg_cron executes for the reference.
    * `clock`/`sleeper` are injectable for virtual-time tests.
    */
  def scheduleEvents(view: String, schedule: String, url: String,
                     send: (String, String) => Unit,
                     clock: () => Long,
                     sleeper: Long => Unit): Unit = {
    def runnerJob(runner: graft.streaming.CronRunner): Unit =
      scheduler.scheduleJob(view) { runner.start(); () => runner.stop() }
    val reg = registeredView(view)
    val tick = () => pullAndPost(view, reg.lock_timeout_s, url, send)
    graft.streaming.Schedule.parse(schedule) match {
      case graft.streaming.Schedule.Every(ms)
          if (clock eq FStoreApi.WallClock) && (sleeper eq FStoreApi.WallSleeper) =>
        // real time → the streaming ProcessingTime path (plan-native)
        scheduleEvents(view, math.max(1L, ms / 1000L), url, send)
      case graft.streaming.Schedule.Every(ms) =>
        // injected clock/sleeper: honor virtual time for intervals too
        // (ProcessingTime cannot take a clock — silently dropping the
        // injection here would hang virtual-time tests on wall time)
        runnerJob(graft.streaming.CronRunner.every(ms, tick, clock, sleeper))
      case c: graft.streaming.Schedule.Cron =>
        runnerJob(graft.streaming.CronRunner(c, tick, clock, sleeper))
    }
  }

  def scheduleEvents(view: String, schedule: String, url: String): Unit =
    scheduleEvents(view, schedule, url, PushSink.HttpSender,
      FStoreApi.WallClock, FStoreApi.WallSleeper)

  /** `asyncPush = true` routes POSTs through [[PushSink.AsyncSender]]
    * (pg_net's queued async delivery, extensions.sql:44-48): the tick
    * never blocks on the endpoint, failures retry with backoff, and
    * exhausted payloads fall back to lease-expiry redelivery.
    */
  def scheduleEvents(view: String, schedule: String, url: String,
                     asyncPush: Boolean): Unit =
    scheduleEvents(view, schedule, url,
      if (asyncPush) new PushSink.AsyncSender() else PushSink.HttpSender,
      FStoreApi.WallClock, FStoreApi.WallSleeper)

  private def registeredView(view: String): ViewRegistration =
    streams.allViews.filter(_.view == view).collect().headOption
      .getOrElse(throw new IllegalArgumentException(s"view $view not registered"))

  /** One push tick: drain a stream_events batch and POST each envelope
    * (the reference's scheduled statement body; no auto-ack — un-acked
    * events redeliver after the lease expires).
    */
  private def pullAndPost(view: String, lockTimeoutS: Long, url: String,
                          send: (String, String) => Unit): Unit = {
    import graft.streaming.DeliveryEngine.Delivered
    val got = streamEvents(view, limit = 100, seconds = lockTimeoutS)
    if (got.nonEmpty) {
      import spark.implicits._
      PushSink.envelope(got.map(e =>
        Delivered(view, e.decider_id, e.offset, e.event_id, e.data,
          redelivery = false)).toDS())
        .collect().foreach { r =>
          send match {
            // async path: a full queue (wedged endpoint) must not
            // stall the tick behind apply()'s backpressure — skip the
            // payload; its event was never acked, so it redelivers at
            // lease expiry like any crashed-consumer delivery
            case a: PushSink.AsyncSender =>
              a.tryApply(url, r.getString(0), timeoutMs = 100L); ()
            case s => s(url, r.getString(0))
          }
        }
    }
  }

  def unscheduleEvents(view: String): Boolean = scheduler.unschedule(view)
}

object FStoreApi {
  /** Canonical wall-clock instances: the schedule-string API compares
    * against these by REFERENCE to decide whether the caller injected
    * virtual time (→ timer-loop path) or wants real time (→ the
    * plan-native ProcessingTime streaming path for intervals).
    */
  val WallClock: () => Long = () => System.currentTimeMillis()
  val WallSleeper: Long => Unit = Thread.sleep
}
