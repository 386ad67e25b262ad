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
  * happens in `foreachBatch` — per micro-batch, per partition, via an
  * injectable sender (real impl `java.net.http.HttpClient`; tests
  * inject a recorder; nothing in this repo performs network I/O by
  * default).
  */
object PushSink {

  /** The reference's push payload envelope (extensions.sql:46):
    * {"view":…,"decider_id":…,"offset":…,"data":…}.
    */
  def envelope(delivered: Dataset[DeliveryEngine.Delivered]): DataFrame =
    delivered.select(to_json(struct(
      col("view"), col("decider_id"), col("offset"), col("data"))).as("body"))

  /** Attach a push sink to a delivered-events stream. `send` runs on
    * executors (must be serializable); batches are converted to
    * payload strings first so the sender sees only (url, body).
    */
  def start(name: String,
            delivered: Dataset[DeliveryEngine.Delivered],
            url: String,
            poolingDelayS: Long,
            send: (String, String) => Unit): StreamingQuery = {
    envelope(delivered).writeStream
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(poolingDelayS * 1000L))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select("body").collect().foreach(r => send(url, r.getString(0)))
      }
      .start()
  }

  /** M10 lifecycle: named query registry — register/replace stops any
    * previous query for the view (reference cron.schedule upsert,
    * extensions.sql:61-110); unschedule stops it (113-126).
    */
  final class Scheduler {
    private val running = scala.collection.mutable.Map.empty[String, StreamingQuery]

    def schedule(view: String, q: => StreamingQuery): StreamingQuery =
      synchronized {
        running.remove(view).foreach(_.stop())
        val started = q
        running(view) = started
        started
      }

    def unschedule(view: String): Boolean = synchronized {
      running.remove(view) match {
        case Some(q) => q.stop(); true
        case None => false
      }
    }

    def active: Set[String] = synchronized(running.keySet.toSet)
  }
}
