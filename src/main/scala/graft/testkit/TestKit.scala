package graft.testkit

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One row of the framework's result log — the reference's
  * `test_results` table (reference tests/utils/test-helpers.sql:8-17):
  * SERIAL test_id, name, category, status ∈ {PASS, FAIL, SKIP}
  * (CHECK constraint), execution time, error message, created_at.
  */
final case class TestResultRow(
    test_id: Int,
    test_name: String,
    test_category: String,
    status: String,
    execution_time_ms: Long,
    error_message: Option[String],
    created_at: Timestamp)

/** One row of `test_metrics` (test-helpers.sql:19-25): a performance
  * measurement attached to a result row by FK.
  */
final case class TestMetricRow(
    metric_id: Int,
    test_id: Int,
    metric_name: String,
    metric_value: Double,
    metric_unit: String)

/** Raised by a failed assertion — the analogue of the reference's
  * `RAISE EXCEPTION 'Assertion failed: %'` (test-helpers.sql:105).
  * The FAIL result row is recorded BEFORE the throw, exactly as
  * test_assert PERFORMs test_cleanup before raising.
  */
final class TestAssertionException(msg: String) extends RuntimeException(msg)

/** The reference's SQL test framework (tests/utils/test-helpers.sql,
  * 272 LoC: results/metrics/state tables + 10 helper functions, plus
  * the reporting views of tests/setup/test-database.sql:39-63 and the
  * JSON report of run-tests.sh:579-636) re-expressed as a Scala
  * component whose REPORTING queries are Spark DataFrames — the
  * framework state is driver-local (the reference's tables are
  * per-database session state too), but summaries/failed-test views
  * run as the same grouped aggregations (A6 filtered counts, A7
  * avg/min/max/round, A9 group-by-category) the reference defines.
  *
  * Faithfulness notes (quirks reproduced on purpose):
  *  - `testCleanup` RE-DERIVES the category from the test NAME
  *    (LIKE '%unit%' / '%integration%' / '%performance%', else
  *    'unit') — it ignores the category passed to `testSetup`, just
  *    like test-helpers.sql:76-82.
  *  - `testExpectError` records NO result row on success — only
  *    failures write (via the embedded cleanup call), mirroring
  *    test-helpers.sql:171-205 where the happy path just RETURNs.
  *  - `testRecordMetric` attaches to the MOST RECENT result row of
  *    the current test, inserting a placeholder
  *    ('performance', PASS, 0 ms) when none exists
  *    (test-helpers.sql:218-231).
  *  - status is CHECK-constrained to PASS/FAIL/SKIP (:13).
  *
  * `nowMs` is injectable so specs can drive virtual time (the same
  * seam CronRunner uses); production default is the wall clock.
  */
final class TestKit(nowMs: () => Long = () => System.currentTimeMillis()) {

  private val results = scala.collection.mutable.ArrayBuffer.empty[TestResultRow]
  private val metrics = scala.collection.mutable.ArrayBuffer.empty[TestMetricRow]
  // test_state (test-helpers.sql:28-42): current test + start time.
  private var currentTest: String = ""
  private var testStartMs: Option[Long] = None

  private def now(): Timestamp = new Timestamp(nowMs())

  /** test_setup (test-helpers.sql:49-61). The category parameter is
    * accepted for signature parity; like the reference, nothing
    * downstream reads it (see class doc).
    */
  def testSetup(testName: String, testCategory: String = "unit"): Unit = synchronized {
    currentTest = testName
    testStartMs = Some(nowMs())
  }

  /** test_cleanup (test-helpers.sql:64-97): records a result row with
    * elapsed ms since testSetup and the name-derived category, then
    * resets the state.
    */
  def testCleanup(testName: String, status: String = "PASS",
                  errorMsg: Option[String] = None): Unit = synchronized {
    require(Set("PASS", "FAIL", "SKIP")(status),
      s"status must be PASS/FAIL/SKIP, got: $status") // CHECK, :13
    val elapsed = testStartMs.map(nowMs() - _).getOrElse(0L)
    val category =
      if (testName.contains("unit")) "unit"
      else if (testName.contains("integration")) "integration"
      else if (testName.contains("performance")) "performance"
      else "unit" // test-helpers.sql:77-82
    results += TestResultRow(results.size + 1, testName, category, status,
      elapsed, errorMsg, now())
    currentTest = ""
    testStartMs = None
  }

  /** test_assert (test-helpers.sql:100-114): false → FAIL row for the
    * CURRENT test (state, not an argument) + throw.
    */
  def testAssert(condition: Boolean, message: String): Boolean = synchronized {
    if (!condition) {
      val t = currentTest
      testCleanup(t, "FAIL", Some(message))
      throw new TestAssertionException(s"Assertion failed: $message")
    }
    true
  }

  /** test_assert_equals (test-helpers.sql:117-132): IS DISTINCT FROM
    * semantics — null equals null, null differs from any value.
    */
  def testAssertEquals(expected: Any, actual: Any, message: String): Boolean = synchronized {
    val distinct = (expected, actual) match {
      case (null, null) => false
      case (null, _) | (_, null) => true
      case (e, a) => e != a
    }
    if (distinct) {
      val msg = s"$message - Expected: $expected, Actual: $actual"
      val t = currentTest
      testCleanup(t, "FAIL", Some(msg))
      throw new TestAssertionException(msg)
    }
    true
  }

  /** test_assert_not_null (test-helpers.sql:135-150). */
  def testAssertNotNull(value: Any, message: String): Boolean =
    testAssert(value != null, s"$message - Value should not be null") || true

  /** test_assert_null (test-helpers.sql:153-168). */
  def testAssertNull(value: Any, message: String): Boolean = synchronized {
    if (value != null) {
      val msg = s"$message - Value should be null but was: $value"
      val t = currentTest
      testCleanup(t, "FAIL", Some(msg))
      throw new TestAssertionException(msg)
    }
    true
  }

  /** test_expect_error (test-helpers.sql:171-205): runs the block,
    * requires it to throw, and requires the message to match the
    * pattern (Postgres `!~` = unanchored regex search on SQLERRM; we
    * search the exception message the same way). Success records no
    * row; both failure modes record FAIL and throw.
    */
  def testExpectError(block: => Any, expectedErrorPattern: String,
                      message: String): Boolean = {
    val thrown: Option[String] =
      try { block; None }
      catch {
        case e: TestAssertionException => throw e // don't swallow our own
        case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    synchronized {
      thrown match {
        case None =>
          val msg = s"$message - Expected an error but none occurred"
          val t = currentTest
          testCleanup(t, "FAIL", Some(msg))
          throw new TestAssertionException(msg)
        case Some(actual) if expectedErrorPattern.r.findFirstIn(actual).isEmpty =>
          val msg = s"$message - Expected error pattern: $expectedErrorPattern, Actual error: $actual"
          val t = currentTest
          testCleanup(t, "FAIL", Some(msg))
          throw new TestAssertionException(msg)
        case _ => true
      }
    }
  }

  /** test_record_metric (test-helpers.sql:208-235). */
  def testRecordMetric(metricName: String, metricValue: Double,
                       metricUnit: String = "ms"): Unit = synchronized {
    val testId = results.reverseIterator
      .find(_.test_name == currentTest).map(_.test_id)
      .getOrElse {
        // placeholder row, exactly :226-229
        results += TestResultRow(results.size + 1, currentTest, "performance",
          "PASS", 0L, None, now())
        results.last.test_id
      }
    metrics += TestMetricRow(metrics.size + 1, testId, metricName, metricValue, metricUnit)
  }

  /** test_clear_results (test-helpers.sql:264-272). */
  def testClearResults(): Unit = synchronized {
    results.clear(); metrics.clear()
  }

  def resultRows: Seq[TestResultRow] = synchronized { results.toSeq }
  def metricRows: Seq[TestMetricRow] = synchronized { metrics.toSeq }

  def resultsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    synchronized { results.toSeq }.toDF()
  }

  def metricsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    synchronized { metrics.toSeq }.toDF()
  }

  /** test_get_results_summary (test-helpers.sql:238-261): per-category
    * totals, filtered PASS/FAIL/SKIP counts (A6), avg time (A7),
    * ordered by category (A9).
    */
  def getResultsSummary(spark: SparkSession): DataFrame =
    resultsDf(spark)
      .groupBy(col("test_category").as("category"))
      .agg(
        count(lit(1)).as("total_tests"),
        count(when(col("status") === "PASS", 1)).as("passed"),
        count(when(col("status") === "FAIL", 1)).as("failed"),
        count(when(col("status") === "SKIP", 1)).as("skipped"),
        avg(col("execution_time_ms")).as("avg_execution_time_ms"))
      .orderBy("category")

  /** The test_summary VIEW (tests/setup/test-database.sql:39-51):
    * summary plus rounded avg/min/max.
    */
  def testSummary(spark: SparkSession): DataFrame =
    resultsDf(spark)
      .groupBy("test_category")
      .agg(
        count(lit(1)).as("total_tests"),
        count(when(col("status") === "PASS", 1)).as("passed"),
        count(when(col("status") === "FAIL", 1)).as("failed"),
        count(when(col("status") === "SKIP", 1)).as("skipped"),
        round(avg(col("execution_time_ms")), 2).as("avg_execution_time_ms"),
        round(min(col("execution_time_ms")).cast("double"), 2).as("min_execution_time_ms"),
        round(max(col("execution_time_ms")).cast("double"), 2).as("max_execution_time_ms"))
      .orderBy("test_category")

  /** The failed_tests VIEW (test-database.sql:53-63). */
  def failedTests(spark: SparkSession): DataFrame =
    resultsDf(spark)
      .filter(col("status") === "FAIL")
      .select(col("test_name"), col("test_category"), col("error_message"),
        col("execution_time_ms"), col("created_at"))
      .orderBy(col("created_at").desc)

  /** The runner's JSON report (run-tests.sh:579-636 generate_json_report):
    * summary block (success_rate as integer percent, bash arithmetic),
    * one entry per result, environment block. `environment` carries
    * engine coordinates instead of container coordinates.
    */
  def jsonReport(totalExecutionTimeS: Double,
                 environment: Map[String, String] = Map.empty): String = synchronized {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => " " // the runner tr's newlines to spaces
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val total = results.size
    val passed = results.count(_.status == "PASS")
    val failed = results.count(_.status == "FAIL")
    val skipped = results.count(_.status == "SKIP")
    val successRate = if (total > 0) passed * 100 / total else 0
    val avg = if (total > 0) totalExecutionTimeS / total else 0.0
    val rows = results.map { r =>
      s"""    {
         |      "name": "${esc(r.test_name)}",
         |      "status": "${if (r.status == "PASS") "passed" else if (r.status == "FAIL") "failed" else "skipped"}",
         |      "execution_time": ${r.execution_time_ms / 1000.0},
         |      "exit_code": ${if (r.status == "FAIL") 1 else 0},
         |      "error_message": "${esc(r.error_message.getOrElse(""))}"
         |    }""".stripMargin
    }.mkString(",\n")
    val env = environment.map { case (k, v) => s"""    "${esc(k)}": "${esc(v)}"""" }
      .mkString(",\n")
    s"""{
       |  "summary": {
       |    "timestamp": "${java.time.Instant.ofEpochMilli(nowMs()).toString}",
       |    "total_tests": $total,
       |    "passed": $passed,
       |    "failed": $failed,
       |    "skipped": $skipped,
       |    "success_rate": $successRate,
       |    "total_execution_time": $totalExecutionTimeS,
       |    "average_test_time": $avg
       |  },
       |  "test_results": [
       |$rows
       |  ],
       |  "environment": {
       |$env
       |  }
       |}""".stripMargin
  }
}
