package graft.testkit

import graft.store.{EventStore, ViewStreams}
import org.apache.spark.sql.functions._

/** The reference's 13 domain assertions (tests/utils/assertions.sql)
  * over the engine's store: each runs the same probe query shape the
  * PL/pgSQL body runs (bounded — existence probes are
  * `filter().limit(2).count()`-style, never a full materialization)
  * and routes the verdict through [[TestKit.testAssert]] /
  * [[TestKit.testAssertEquals]] with the reference's message format,
  * so a failed domain assertion records a FAIL row and throws exactly
  * like the SQL original.
  *
  * `nowMs` is the lease-clock seam for the lock_active/inactive pair
  * (assertions.sql:185-230 compare `locked_until > NOW()`).
  */
final class StoreAssertions(kit: TestKit,
                            nowMs: () => Long = () => System.currentTimeMillis()) {

  /** assertions.sql:8-31 */
  def assertEventExists(store: EventStore, eventId: String, deciderId: String,
                        decider: String, message: String): Boolean = {
    val n = store.allEvents
      .filter(col("event_id") === eventId && col("decider_id") === deciderId &&
        col("decider") === decider)
      .limit(2).count()
    kit.testAssert(n == 1,
      s"$message - Event should exist: event_id=$eventId, decider_id=$deciderId, decider=$decider")
  }

  /** assertions.sql:34-52 */
  def assertEventNotExists(store: EventStore, eventId: String, message: String): Boolean = {
    val n = store.allEvents.filter(col("event_id") === eventId).limit(1).count()
    kit.testAssert(n == 0, s"$message - Event should not exist: event_id=$eventId")
  }

  /** assertions.sql:55-78 — equality routed through testAssertEquals
    * like the original (so the FAIL message carries both counts).
    */
  def assertEventCount(store: EventStore, deciderId: String, decider: String,
                       expectedCount: Long, message: String): Boolean = {
    val n = store.allEvents
      .filter(col("decider_id") === deciderId && col("decider") === decider).count()
    kit.testAssertEquals(expectedCount, n,
      s"$message - Event count for decider_id=$deciderId, decider=$decider")
  }

  /** assertions.sql:81-111 — the LAG monotonicity probe (SURVEY §2.5
    * W1): zero rows where offset fails to strictly increase.
    */
  def assertEventOrdering(store: EventStore, deciderId: String, decider: String,
                          message: String): Boolean = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("offset")
    val violations = store.allEvents
      .filter(col("decider_id") === deciderId && col("decider") === decider)
      .select(col("offset"), lag("offset", 1).over(w).as("prev_offset"))
      .filter(col("prev_offset").isNotNull && col("offset") <= col("prev_offset"))
      .count()
    kit.testAssert(violations == 0,
      s"$message - Events should be properly ordered for decider_id=$deciderId, decider=$decider")
  }

  /** assertions.sql:114-136 */
  def assertDeciderEventRegistered(store: EventStore, decider: String, event: String,
                                   eventVersion: Long, message: String): Boolean = {
    val n = store.deciderRegistry
      .filter(col("decider") === decider && col("event") === event &&
        col("event_version") === eventVersion)
      .limit(2).count()
    kit.testAssert(n == 1,
      s"$message - Decider event should be registered: decider=$decider, event=$event, version=$eventVersion")
  }

  /** assertions.sql:140-158 */
  def assertViewRegistered(vs: ViewStreams, view: String, message: String): Boolean = {
    val n = vs.allViews.filter(col("view") === view).limit(2).count()
    kit.testAssert(n == 1, s"$message - View should be registered: view=$view")
  }

  /** assertions.sql:161-182 */
  def assertLockExists(vs: ViewStreams, view: String, deciderId: String,
                       message: String): Boolean = {
    val n = vs.allLocks
      .filter(col("view") === view && col("decider_id") === deciderId)
      .limit(2).count()
    kit.testAssert(n == 1,
      s"$message - Lock should exist: view=$view, decider_id=$deciderId")
  }

  private def lockActive(vs: ViewStreams, view: String, deciderId: String): Boolean =
    vs.allLocks
      .filter(col("view") === view && col("decider_id") === deciderId)
      .limit(1).collect()
      // COALESCE(is_locked, FALSE): a missing lock row reads inactive
      .headOption.exists(_.locked_until.getTime > nowMs())

  /** assertions.sql:185-206 */
  def assertLockActive(vs: ViewStreams, view: String, deciderId: String,
                       message: String): Boolean =
    kit.testAssert(lockActive(vs, view, deciderId),
      s"$message - Lock should be active: view=$view, decider_id=$deciderId")

  /** assertions.sql:209-230 */
  def assertLockInactive(vs: ViewStreams, view: String, deciderId: String,
                         message: String): Boolean =
    kit.testAssert(!lockActive(vs, view, deciderId),
      s"$message - Lock should be inactive: view=$view, decider_id=$deciderId")

  private def streamFinal(store: EventStore, deciderId: String, decider: String): Boolean =
    store.allEvents
      .filter(col("decider_id") === deciderId && col("decider") === decider &&
        col("is_final"))
      .limit(1).count() > 0

  /** assertions.sql:233-256 */
  def assertStreamFinal(store: EventStore, deciderId: String, decider: String,
                        message: String): Boolean =
    kit.testAssert(streamFinal(store, deciderId, decider),
      s"$message - Stream should be final: decider_id=$deciderId, decider=$decider")

  /** assertions.sql:259-282 */
  def assertStreamNotFinal(store: EventStore, deciderId: String, decider: String,
                           message: String): Boolean =
    kit.testAssert(!streamFinal(store, deciderId, decider),
      s"$message - Stream should not be final: decider_id=$deciderId, decider=$decider")

  /** assertions.sql:285-326 — chain validity: every non-null
    * previous_id resolves to an event_id in the SAME stream (left-anti
    * join = the NOT EXISTS), and exactly one event carries a null
    * previous_id.
    */
  def assertPreviousIdChainValid(store: EventStore, deciderId: String,
                                 decider: String, message: String): Boolean = {
    val stream = store.allEvents
      .filter(col("decider_id") === deciderId && col("decider") === decider)
      .select("event_id", "previous_id")
    val ids = stream.select(col("event_id").as("target_id"))
    val chainViolations = stream
      .filter(col("previous_id").isNotNull)
      .join(ids, col("previous_id") === col("target_id"), "left_anti")
      .count()
    val nullPreviousCount = stream.filter(col("previous_id").isNull).count()
    val firstEventViolations = if (nullPreviousCount != 1) 1 else 0
    kit.testAssert(chainViolations == 0 && firstEventViolations == 0,
      s"$message - Previous ID chain should be valid: decider_id=$deciderId, decider=$decider " +
        s"(chain_violations=$chainViolations, first_event_violations=$firstEventViolations)")
  }

  /** assertions.sql:329-349 — `actual_json ->> key` equals expected;
    * extraction via get_json_object (SURVEY §2.8 F5), same top-level
    * text semantics.
    */
  def assertJsonContains(spark: org.apache.spark.sql.SparkSession, actualJson: String,
                         expectedKey: String, expectedValue: String,
                         message: String): Boolean = {
    val actual = spark.range(1)
      .select(get_json_object(lit(actualJson), s"$$.$expectedKey").as("v"))
      .head().getString(0)
    kit.testAssertEquals(expectedValue, actual,
      s"$message - JSON should contain key=$expectedKey with value=$expectedValue")
  }
}
