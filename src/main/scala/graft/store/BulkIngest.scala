package graft.store

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Bulk log bootstrap: import an unbounded pre-existing event stream
  * (an export, a migration, another store's log) WITHOUT the per-call
  * append path's driver-resident batch assumption. Everything here is
  * distributed — the only driver values are the base offset and
  * summary counts.
  *
  * Validation scope: set-level constraints are enforced exactly
  * (composite FK against the registry; global event_id/previous_id
  * uniqueness — first occurrence in arrival order wins), and the
  * per-stream chain rules are enforced as a POST-HOC distributed
  * assertion ([[chainViolations]]) rather than a row-at-a-time replay:
  * a bulk import of an existing log is re-admitting data that already
  * passed the reference's triggers, so the cheap set-level gates plus
  * one chain audit replace 100 TB of sequential re-validation.
  *
  * Offsets: `GlobalIndex.withOrderedIndex` over (created_at, event_id)
  * — a range-partitioned parallel sort with prefix-summed partition
  * counts (SURVEY §7.4.1), based at the store's committed head.
  */
object BulkIngest {

  final case class IngestResult(accepted: Long, rejected: Long)

  /** Columns required on `src`: event, event_id, event_version,
    * decider, decider_id, data, command_id, previous_id, is_final,
    * created_at.
    */
  def ingest(store: EventStore, src: DataFrame): IngestResult = {
    val spark = store.spark
    import spark.implicits._

    // (1) FK gate: broadcast the (driver-resident, dimension-sized)
    // registry as a DataFrame and left-semi join.
    val reg = store.deciderRegistry.toDF()
      .select($"decider".as("r_decider"), $"event".as("r_event"),
        $"event_version".as("r_version"))
    val fkOk = src.join(broadcast(reg),
      $"decider" === $"r_decider" && $"event" === $"r_event" &&
        $"event_version" === $"r_version", "left_semi")

    // (2) Global uniqueness, first-in-arrival-order wins: rank within
    // each event_id / previous_id and keep rank 1; then anti-join
    // against the already-committed log's ids.
    val wId = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_id").orderBy($"created_at", $"event_id")
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy($"previous_id").orderBy($"created_at", $"event_id")
    val deduped = fkOk
      .withColumn("rid", row_number().over(wId))
      .withColumn("rprev",
        when($"previous_id".isNull, lit(1)).otherwise(row_number().over(wPrev)))
      .filter($"rid" === 1 && $"rprev" === 1)
      .drop("rid", "rprev")
    val committed = store.allEvents.toDF()
    val fresh = deduped
      .join(committed.select($"event_id".as("c_id")), $"event_id" === $"c_id", "left_anti")
      .join(committed.filter($"previous_id".isNotNull).select($"previous_id".as("c_prev")),
        $"previous_id" === $"c_prev", "left_anti")

    // (3) Offset assignment + commit.
    val base = store.maxOffset()
    val txn = lit(-1L) // bulk-imported marker transaction
    val indexed = GlobalIndex.withOrderedIndex(
      fresh.select("event", "event_id", "event_version", "decider", "decider_id",
        "data", "command_id", "previous_id", "is_final", "created_at"),
      Seq(col("created_at").asc, col("event_id").asc), "idx", base)
    val rows = indexed
      .withColumn("offset", $"idx" + 1).drop("idx")
      .withColumn("transaction_id", txn)
      .as[EventRow]
    val total = src.count()
    val accepted = store.commitBulk(rows)
    IngestResult(accepted, total - accepted)
  }

  /** Distributed chain audit (the reference's
    * assert_previous_id_chain_valid, tests/utils/assertions.sql:285-326,
    * as one aggregation + two joins): per (decider, decider_id) stream,
    * flag
    *   - streams with ≠ 1 null-previous events,
    *   - previous_ids that do not resolve to an event_id in-stream,
    *   - streams where a final event is not the last by offset.
    * Empty result = valid log.
    */
  def chainViolations(store: EventStore): DataFrame = {
    val spark = store.spark
    import spark.implicits._
    val ev = store.allEvents.toDF()

    val nullPrevCounts = ev.groupBy($"decider", $"decider_id")
      .agg(sum(when($"previous_id".isNull, 1).otherwise(0)).as("n_null_prev"),
           max(when($"is_final", $"offset")).as("final_off"),
           max($"offset").as("max_off"))
      .filter($"n_null_prev" =!= 1 ||
        ($"final_off".isNotNull && $"final_off" =!= $"max_off"))
      .select($"decider", $"decider_id",
        lit("stream_shape").as("violation"),
        concat(lit("n_null_prev="), $"n_null_prev",
          lit(" final_off="), coalesce($"final_off", lit(-1)),
          lit(" max_off="), $"max_off").as("detail"))

    val ids = ev.select($"decider".as("i_decider"), $"decider_id".as("i_decider_id"),
      $"event_id".as("i_event_id"))
    val danglingPrev = ev.filter($"previous_id".isNotNull)
      .join(ids,
        $"decider" === $"i_decider" && $"decider_id" === $"i_decider_id" &&
          $"previous_id" === $"i_event_id", "left_anti")
      .select($"decider", $"decider_id",
        lit("dangling_previous_id").as("violation"),
        concat(lit("event_id="), $"event_id", lit(" previous_id="), $"previous_id")
          .as("detail"))

    nullPrevCounts.unionByName(danglingPrev)
  }
}
