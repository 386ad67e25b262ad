package graft.store

import java.sql.Timestamp

/** Typed data model for the event-store core, mirroring the reference's
  * four tables (reference schema.sql:10-21, 27-54, 157-175, 180-200) as
  * Spark `Dataset[T]` case classes (SURVEY.md §1.4).
  *
  * UUIDs are carried as canonical strings; JSONB payloads as JSON
  * strings; TIMESTAMPTZ as java.sql.Timestamp (session TZ = UTC);
  * XID8 as the committing batch id (SURVEY §1.4 maps transaction_id to
  * the micro-batch/commit id).
  */
final case class DeciderRegistration(
    decider: String,
    event: String,
    event_version: Long,
    description: Option[String])

final case class EventRow(
    event: String,
    event_id: String,
    event_version: Long,
    decider: String,
    decider_id: String,
    data: String,
    command_id: Option[String],
    previous_id: Option[String],
    is_final: Boolean,
    created_at: Timestamp,
    offset: Long,
    transaction_id: Long)

/** Append-side input: everything the client supplies (reference
  * append_event signature, schema.sql:336-343). `offset`,
  * `created_at` and `transaction_id` are engine-assigned.
  */
final case class EventInput(
    event: String,
    event_id: String,
    decider: String,
    decider_id: String,
    data: String,
    command_id: Option[String] = None,
    previous_id: Option[String] = None,
    event_version: Long = 1L,
    is_final: Boolean = false)

final case class ViewRegistration(
    view: String,
    start_at: Timestamp,
    lock_timeout_s: Long,
    pooling_delay_s: Option[Long],
    edge_function_url: Option[String],
    created_at: Timestamp,
    updated_at: Timestamp)

/** One consumer-offset/lease row per (view, decider_id) — the
  * reference's `locks` table (schema.sql:180-200): `offset` is the
  * partition head, `last_offset` the last ACKed position,
  * `locked_until` the lease expiry (born expired).
  */
final case class LockRow(
    view: String,
    decider_id: String,
    offset: Long,
    last_offset: Long,
    locked_until: Timestamp,
    offset_final: Boolean,
    created_at: Timestamp,
    updated_at: Timestamp)

/** Typed rejection channel replacing the reference's PL/pgSQL
  * EXCEPTIONs. Messages reproduce the reference strings byte-for-byte
  * (SURVEY §7.5) because its tests assert on them.
  */
sealed abstract class AppendError(val message: String) extends Serializable {
  def eventId: String
}
object AppendError {
  /** reference schema.sql:84 */
  final case class StreamFinalized(eventId: String) extends AppendError(
    "last event for this decider stream is already final. the stream is closed, you can not append events to it.")
  /** reference schema.sql:108 */
  final case class NullPreviousOnNonFirst(eventId: String) extends AppendError(
    "previous_id can only be null for the first decider event")
  /** reference schema.sql:134 */
  final case class PreviousNotInStream(eventId: String) extends AppendError(
    "previous_id must be in the same decider")
  /** reference schema.sql:53 (composite FK → deciders) */
  final case class UnregisteredEvent(eventId: String) extends AppendError(
    "violates foreign key constraint: (decider, event, event_version) is not registered")
  /** reference schema.sql:32 UNIQUE(event_id) */
  final case class DuplicateEventId(eventId: String) extends AppendError(
    "duplicate key value violates unique constraint: event_id")
  /** reference schema.sql:44 UNIQUE(previous_id) */
  final case class DuplicatePreviousId(eventId: String) extends AppendError(
    "duplicate key value violates unique constraint: previous_id")
}

/** Result of a batch append: committed rows (with assigned offsets)
  * plus the per-row rejection channel. Mirrors the reference's
  * row-at-a-time EXCEPTION semantics at batch granularity
  * (SURVEY §7.4 item 2).
  */
final case class AppendResult(accepted: Seq[EventRow], rejected: Seq[AppendError])
