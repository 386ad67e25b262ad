package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** HTTP push delivery + per-view query lifecycle (reference
  * extensions.sql:29-126; SURVEY S6/S7/M10).
  *
  * The reference schedules `pg_cron` jobs that POST each streamed
  * event's JSON envelope to an edge-function URL. Spark-natively,
  * scheduling is the streaming trigger: one `StreamingQuery` per view
  * with `Trigger.ProcessingTime(pooling_delay_s)`, and the POST
  * happens in `foreachBatch` — per micro-batch, via an injectable
  * sender defaulting to the real `java.net.http.HttpClient`-backed
  * [[PushSink.HttpSender]] (tests inject a recorder; network I/O
  * happens only when a push sink is actually started).
  */
object PushSink {

  /** The reference's push payload envelope (extensions.sql:46):
    * {"view":…,"decider_id":…,"offset":…,"data":…}.
    */
  def envelope(delivered: Dataset[DeliveryEngine.Delivered]): DataFrame =
    delivered.select(to_json(struct(
      col("view"), col("decider_id"), col("offset"), col("data"))).as("body"))

  /** Default sender: POST the JSON envelope over a real
    * `java.net.http.HttpClient` (the reference's `net.http_post`,
    * extensions.sql:44-48). A non-2xx/3xx response throws, failing the
    * micro-batch — the events stay un-acked and redeliver after the
    * lease expires, the reference's at-least-once contract. The client
    * is lazy and transient so the sender stays serializable.
    */
  object HttpSender extends ((String, String) => Unit) with Serializable {
    @transient private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    def apply(url: String, body: String): Unit = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(30))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        throw new java.io.IOException(
          s"push delivery failed: HTTP ${resp.statusCode()} from $url")
    }
  }

  /** Asynchronous push queue with retry/backoff — the `pg_net`
    * analogue (extensions.sql:44-48): `net.http_post` ENQUEUES and
    * returns, and a background worker delivers, so a slow or flapping
    * endpoint cannot stall the delivery tick the way the synchronous
    * [[HttpSender]] does. Drop-in: same `(url, body) => Unit` shape,
    * wrap any transport (`new AsyncSender()` wraps the real HTTP one).
    *
    *  - **Bounded**: at most `capacity` payloads in flight; `apply`
    *    blocks when full — backpressure into the tick, the analogue of
    *    pg_net's queue table rather than an unbounded heap.
    *  - **Retry/backoff**: failures re-schedule with exponential
    *    backoff (`base << attempt`) up to `maxAttempts`.
    *  - **Exhaustion drops the payload** (counted in [[dropped]]) —
    *    safe under the push path's no-auto-ack contract: the events
    *    were never acked, so they redeliver after their lease expires,
    *    exactly the at-least-once path a crashed consumer takes. The
    *    sender itself never acks anything, so a retried POST can never
    *    become a double-ack.
    */
  final class AsyncSender(transport: (String, String) => Unit = HttpSender,
                          capacity: Int = 1024,
                          maxAttempts: Int = 5,
                          baseBackoffMs: Long = 500L,
                          closeFlushMs: Long = 5000L)
      extends ((String, String) => Unit) with AutoCloseable with Serializable {
    require(capacity > 0 && maxAttempts >= 1)
    @transient private lazy val slots = new java.util.concurrent.Semaphore(capacity)
    @transient private lazy val exec = {
      val e = new java.util.concurrent.ScheduledThreadPoolExecutor(1,
        (r: Runnable) => {
          val t = new Thread(r, "graft-async-push"); t.setDaemon(true); t
        })
      e.setRemoveOnCancelPolicy(true)
      e
    }
    @transient private lazy val droppedCount =
      new java.util.concurrent.atomic.AtomicLong(0L)

    def apply(url: String, body: String): Unit = {
      if (exec.isShutdown)
        throw new java.util.concurrent.RejectedExecutionException(
          "AsyncSender is closed")
      slots.acquire()
      // close() can land between the check above and here: the
      // executor rejects, so release the permit before rethrowing —
      // a leaked permit would wedge flush() forever
      try schedule(url, body, attempt = 1, delayMs = 0L)
      catch {
        case e: java.util.concurrent.RejectedExecutionException =>
          slots.release(); throw e
      }
    }

    /** Non-stalling enqueue: give up after `timeoutMs` when the queue
      * is full (or the sender is closed) and return false. The caller's
      * correct reaction is to NOT ack the batch — the events redeliver
      * at lease expiry, the same path a crashed consumer takes — so a
      * wedged endpoint degrades to redelivery latency instead of
      * freezing the delivery tick behind [[apply]]'s backpressure.
      */
    def tryApply(url: String, body: String, timeoutMs: Long = 0L): Boolean = {
      if (exec.isShutdown) return false
      if (!slots.tryAcquire(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
        return false
      try { schedule(url, body, attempt = 1, delayMs = 0L); true }
      catch {
        case _: java.util.concurrent.RejectedExecutionException =>
          slots.release(); false
      }
    }

    private def schedule(url: String, body: String, attempt: Int, delayMs: Long): Unit = {
      exec.schedule(new Runnable {
        def run(): Unit =
          try { transport(url, body); slots.release() }
          catch {
            // close() interrupts the in-flight delivery; NonFatal does
            // NOT match InterruptedException, so without this arm the
            // payload escapes uncounted and its permit leaks (flush()
            // would then wedge forever). Abandoned like a timed-out
            // queue entry: count, free the permit, keep the flag set.
            case _: InterruptedException =>
              droppedCount.incrementAndGet()
              slots.release()
              Thread.currentThread().interrupt()
            case scala.util.control.NonFatal(_) if attempt < maxAttempts =>
              // re-schedule can itself be rejected by a concurrent
              // close(): the payload is abandoned like an exhausted
              // retry — count it and free its permit
              try schedule(url, body, attempt + 1, baseBackoffMs << (attempt - 1))
              catch {
                case _: java.util.concurrent.RejectedExecutionException =>
                  droppedCount.incrementAndGet(); slots.release()
              }
            case scala.util.control.NonFatal(_) =>
              droppedCount.incrementAndGet()
              slots.release()
          }
      }, delayMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      ()
    }

    /** Payloads abandoned after `maxAttempts` (their events stay
      * un-acked and redeliver).
      */
    def dropped: Long = droppedCount.get()

    /** Await an empty queue (clean shutdown / tests); false on
      * timeout with work still in flight.
      */
    def flush(timeoutMs: Long): Boolean = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (slots.availablePermits() < capacity) {
        if (System.nanoTime() > deadline) return false
        Thread.sleep(2)
      }
      true
    }

    /** Drain, then stop. Payloads still queued past the flush timeout
      * are ABANDONED — each is counted in [[dropped]] (the redelivery
      * contract leans on that metric) and its permit released, so a
      * post-close flush()/metric read stays truthful.
      */
    override def close(): Unit = {
      flush(closeFlushMs)
      val cancelled = exec.shutdownNow()
      val n = cancelled.size()
      if (n > 0) { droppedCount.addAndGet(n.toLong); slots.release(n) }
      ()
    }
  }

  /** Per-JVM live senders, keyed by query name with a start-time
    * version (newest wins). Executor-side tasks route through this
    * registry so all partitions of all micro-batches in one JVM share
    * ONE sender — the connection-pool idiom: an [[AsyncSender]] keeps
    * one queue + worker per executor (pg_net's model distributed),
    * instead of a throwaway copy per task whose in-flight payloads
    * would vanish with the task. On the driver JVM (and therefore in
    * local mode) the registered instance IS the caller's, so
    * `flush`/`dropped`/`close` — and test-injected recorder closures —
    * observe the real delivery state.
    */
  private val jvmSenders =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, (String, String) => Unit)]()

  /** Attach a push sink to a delivered-events stream. `send` defaults
    * to [[HttpSender]] (tests inject a recorder); batches are
    * converted to payload strings first so the sender sees only
    * (url, body).
    *
    * Delivery is EXECUTOR-side (`foreachPartition`): rows never fan in
    * through the driver — the send happens where the partition lives,
    * matching pg_net's async model at scale. A task failure fails the
    * micro-batch; its events stay un-acked and redeliver (the same
    * at-least-once contract the synchronous form had).
    */
  def start(name: String,
            delivered: Dataset[DeliveryEngine.Delivered],
            url: String,
            poolingDelayS: Long,
            send: (String, String) => Unit = HttpSender): StreamingQuery = {
    val version = System.nanoTime()
    jvmSenders.put(name, (version, send))
    val sendCopy = send // serialized into the task closure for remote executors
    envelope(delivered).writeStream
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(poolingDelayS * 1000L))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select("body").foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          // newest-version registry hit; a remote executor seeds its
          // JVM's slot from the serialized copy on first touch
          val s = jvmSenders.compute(name, (_, cur) =>
            if (cur != null && cur._1 >= version) cur else (version, sendCopy))._2
          rows.foreach(r => s(url, r.getString(0)))
        }
      }
      .start()
  }

  /** M10 lifecycle: named query registry — register/replace stops any
    * previous query for the view (reference cron.schedule upsert,
    * extensions.sql:61-110); unschedule stops it (113-126).
    */
  final class Scheduler {
    // one stop-thunk per view — a slot can hold a StreamingQuery OR any
    // other cancellable job (the cron runner)
    private val running = scala.collection.mutable.Map.empty[String, () => Unit]

    def schedule(view: String, q: => StreamingQuery): StreamingQuery =
      synchronized {
        running.remove(view).foreach(_.apply())
        val started = q
        running(view) = () => started.stop()
        started
      }

    /** Generalized slot: `start` launches the job and returns its stop
      * thunk (used by the cron-schedule push path).
      */
    def scheduleJob(view: String)(start: => (() => Unit)): Unit = synchronized {
      running.remove(view).foreach(_.apply())
      running(view) = start
    }

    def unschedule(view: String): Boolean = synchronized {
      running.remove(view) match {
        case Some(stop) => stop(); true
        case None => false
      }
    }

    def active: Set[String] = synchronized(running.keySet.toSet)
  }
}
