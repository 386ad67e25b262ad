package graft.store

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Event-streaming layer: consumer-group registry (`views`), per
  * (view, partition) offsets+leases (`locks`), the 4-stage
  * `stream_events` delivery pipeline, and ACK/NACK (reference
  * schema.sql:157-200, 240-309, 376-468; SURVEY §2.10, §2.9 M1-M6).
  *
  * Design: `locks` is keyed state — one row per (view, decider_id).
  * In this deterministic batch form (the DuckDB-oracle-testable shape,
  * SURVEY slice 1) it is a small Dataset mutated by MERGE-shaped
  * unions; the Structured-Streaming form keeps the same rows in
  * `flatMapGroupsWithState` (see streaming/DeliveryEngine). Lock
  * cardinality is |views| × |active partitions| — control-plane-sized
  * relative to the event log, so lock-side joins broadcast.
  */
final class ViewStreams(val store: EventStore) {
  private val spark: SparkSession = store.spark
  import spark.implicits._

  private var views: Dataset[ViewRegistration] = spark.emptyDataset[ViewRegistration]
  private var locks: Dataset[LockRow] = spark.emptyDataset[LockRow]

  def allViews: Dataset[ViewRegistration] = views
  def allLocks: Dataset[LockRow] = locks

  private def now: Timestamp = store.now()

  // Wire the append fanout (reference AFTER INSERT trigger,
  // schema.sql:240-263 / M1): every committed event upserts the
  // (view, decider_id) head for EVERY registered view.
  store.onCommit = onEventsCommitted

  /** M1: cross join new events × views (J3 — views side is the tiny
    * side; broadcast), then MERGE into locks: update head offset /
    * offset_final on match, insert (last_offset = 0, born-unlocked)
    * otherwise. Reference keeps only the LATEST event's offset per
    * (view, decider_id) — max_by(offset) collapses the batch first.
    */
  private def onEventsCommitted(accepted: Seq[EventRow]): Unit = {
    if (views.isEmpty || accepted.isEmpty) return
    val t = now
    val heads = accepted.groupBy(_.decider_id).map { case (_, rows) =>
      rows.maxBy(_.offset)
    }.toSeq
    val fanout = views.collect().flatMap { v =>
      heads.map(e => (v.view, e.decider_id, e.offset, e.is_final))
    }.toSeq.toDF("f_view", "f_decider_id", "f_offset", "f_final")

    val merged = locks.toDF().as("l")
      .join(fanout.as("f"),
        $"l.view" === $"f_view" && $"l.decider_id" === $"f_decider_id", "full_outer")
      .select(
        coalesce($"l.view", $"f_view").as("view"),
        coalesce($"l.decider_id", $"f_decider_id").as("decider_id"),
        coalesce($"f_offset", $"l.offset").as("offset"),
        coalesce($"l.last_offset", lit(0L)).as("last_offset"),
        coalesce($"l.locked_until", lit(new Timestamp(t.getTime - 1))).as("locked_until"),
        coalesce($"f_final", $"l.offset_final").as("offset_final"),
        coalesce($"l.created_at", lit(t)).as("created_at"),
        when($"f_view".isNotNull, lit(t)).otherwise($"l.updated_at").as("updated_at"))
    locks = merged.as[LockRow].localCheckpoint()
  }

  // ------------------------------------------------------------------
  // register_view (reference schema.sql:376-393 + backfill 268-309)

  /** Upsert the view, then rebuild its lock matrix (M2): for every
    * existing partition, position `last_offset` to just before the
    * first event with `created_at >= start_at` (event-time seek, A4,
    * including the reference's `offset - 1` off-by-one) or to the
    * partition head if no such event (nothing replayed), and record
    * the head offset/finality (A3 DISTINCT ON ≙ max_by).
    */
  def registerView(view: String,
                   startAt: Option[Timestamp] = None,
                   lockTimeoutS: Long = 300L,
                   poolingDelayS: Option[Long] = None,
                   edgeFunctionUrl: Option[String] = None): ViewRegistration = {
    val t = now
    val start = startAt.getOrElse(t)
    val existing = views.filter($"view" === view).collect().headOption
    val row = existing match {
      case Some(old) => old.copy(start_at = start, lock_timeout_s = lockTimeoutS,
        pooling_delay_s = poolingDelayS, edge_function_url = edgeFunctionUrl,
        updated_at = t)
      case None => ViewRegistration(view, start, lockTimeoutS, poolingDelayS,
        edgeFunctionUrl, t, t)
    }
    views = views.filter($"view" =!= view).union(Seq(row).toDS()).localCheckpoint()

    // Backfill (M2). One aggregation pass over the log computes, per
    // decider_id: head offset + head finality (A3) and the A4 seek:
    //   last_offset = COALESCE(min(offset | created_at >= start) - 1,
    //                          max(offset))
    val matrix = store.allEvents
      .groupBy($"decider_id")
      .agg(
        max_by(struct($"offset", $"is_final"), $"offset").as("head"),
        min(when($"created_at" >= lit(start), $"offset")).as("first_after"),
        max($"offset").as("max_off"))
      .select(
        lit(view).as("view"),
        $"decider_id",
        $"head.offset".as("offset"),
        (coalesce($"first_after" - 1, $"max_off")).as("last_offset"),
        lit(new Timestamp(t.getTime - 1)).as("locked_until"),
        $"head.is_final".as("offset_final"),
        lit(t).as("created_at"),
        lit(t).as("updated_at"))
      .as[LockRow]
    locks = locks.filter($"view" =!= view).union(matrix).localCheckpoint()
    row
  }

  /** Delete a view: cascades to its locks (reference FK ON DELETE
    * CASCADE, schema.sql:199).
    */
  def deleteView(view: String): Unit = {
    views = views.filter($"view" =!= view).localCheckpoint()
    locks = locks.filter($"view" =!= view).localCheckpoint()
  }

  // ------------------------------------------------------------------
  // stream_events (reference schema.sql:402-430; SURVEY §2.10)

  /** The 4-stage delivery pipeline, deterministic batch form.
    *
    *  1. Candidate scan: this view's locks with an expired lease and
    *     lag (`last_offset < offset`), ordered by head offset, LIMIT k.
    *  2. Lease acquisition: bump `locked_until = now + seconds` on the
    *     selected partitions (update-join J4, realized as a MERGE).
    *  3. Next-offset resolution: per leased partition, MIN(offset)
    *     among events past `last_offset` (J1 equi-join + band residual
    *     + A1 grouped MIN). The leased side is ≤ limit rows →
    *     broadcast; the events side is pruned to touched partitions.
    *  4. Fetch: semi-join events on the winning offsets (J2), global
    *     ORDER BY offset.
    *
    * `FOR UPDATE SKIP LOCKED` has no Spark analogue and needs none in
    * this model: within one engine the lock state is single-owner per
    * key (SURVEY §7.4.3) — concurrent *calls* are serialized on the
    * state value, and cross-partition parallelism comes from Spark
    * tasks, not competing pollers.
    */
  def streamEvents(view: String, limit: Int = 1, seconds: Long = 300L): Seq[EventRow] = {
    val t = now
    // Stage 1: candidates.
    val candidates = locks
      .filter($"view" === view && $"locked_until" < lit(t) && $"last_offset" < $"offset")
      .orderBy($"offset").limit(limit)
      .select($"decider_id", $"last_offset").collect()
    if (candidates.isEmpty) return Nil
    val leased = candidates.map(r => (r.getString(0), r.getLong(1))).toSeq
    val leasedDf = leased.toDF("c_decider_id", "c_last_offset")

    // Stage 2: lease acquisition (MERGE-shaped update-join).
    val until = new Timestamp(t.getTime + seconds * 1000L)
    val leasedSet = leased.map(_._1).toSet
    locks = locks.map { l =>
      if (l.view == view && leasedSet.contains(l.decider_id))
        l.copy(locked_until = until, updated_at = t)
      else l
    }.localCheckpoint()

    // Stage 3+4: next offset per leased partition, then fetch. The
    // broadcast side is ≤ `limit` rows; the events scan is pruned by
    // the semi-join on decider_id before the band filter.
    val nextOffsets = store.allEvents
      .join(broadcast(leasedDf), $"decider_id" === $"c_decider_id" &&
        $"offset" > $"c_last_offset")
      .groupBy($"decider_id").agg(min($"offset").as("next_off"))
      .select($"next_off")
    store.allEvents
      .join(broadcast(nextOffsets), $"offset" === $"next_off", "left_semi")
      .orderBy($"offset")
      .as[EventRow]
      .collect().toSeq
  }

  // ------------------------------------------------------------------
  // ACK / NACK (reference schema.sql:436-468; M4-M6)

  /** ACK: commit the offset and release the lease. Returns the updated
    * lock row (reference RETURNING *), None if no such lock.
    *
    * Release = `now - 1ms` (the reference's born-unlocked idiom,
    * schema.sql:191): the candidate scan tests `locked_until < NOW()`
    * strictly, and unlike PostgreSQL our clock is injectable/frozen in
    * tests, so releasing exactly AT `now` would stay leased.
    */
  def ack(view: String, deciderId: String, offset: Long): Option[LockRow] =
    touchLock(view, deciderId)(l =>
      l.copy(last_offset = offset,
        locked_until = new Timestamp(now.getTime - 1), updated_at = now))

  /** NACK: release the lease WITHOUT advancing the offset → immediate
    * redelivery eligibility.
    */
  def nack(view: String, deciderId: String): Option[LockRow] =
    touchLock(view, deciderId)(l =>
      l.copy(locked_until = new Timestamp(now.getTime - 1), updated_at = now))

  /** Scheduled NACK: redeliver after `milliseconds` (delayed retry). */
  def scheduleNack(view: String, deciderId: String, milliseconds: Long): Option[LockRow] =
    touchLock(view, deciderId)(l =>
      l.copy(locked_until = new Timestamp(now.getTime + milliseconds), updated_at = now))

  private def touchLock(view: String, deciderId: String)
                       (f: LockRow => LockRow): Option[LockRow] = {
    val hit = locks.filter($"view" === view && $"decider_id" === deciderId)
      .collect().headOption.map(f)
    hit.foreach { updated =>
      locks = locks
        .filter(!($"view" === view && $"decider_id" === deciderId))
        .union(Seq(updated).toDS()).localCheckpoint()
    }
    hit
  }

  // ------------------------------------------------------------------
  // updated_at maintenance (M8) is folded into every mutation above;
  // views/locks persistence mirrors EventStore.save/load.

  def save(dir: String): Unit = {
    views.write.mode("overwrite").parquet(s"$dir/views")
    locks.write.mode("overwrite").parquet(s"$dir/locks")
  }

  def load(dir: String): Unit = {
    views = spark.read.parquet(s"$dir/views").as[ViewRegistration]
    locks = spark.read.parquet(s"$dir/locks").as[LockRow]
  }
}
