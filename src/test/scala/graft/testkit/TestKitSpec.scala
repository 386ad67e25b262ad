package graft.testkit

import graft.SparkSpec
import graft.store.{EventStore, EventInput, ViewStreams}

/** The reference test framework analogue (tests/utils/test-helpers.sql
  * + tests/setup/test-database.sql reporting views +
  * run-tests.sh:579-636 JSON report), driven with virtual time so
  * timings are deterministic. Domain assertions
  * (tests/utils/assertions.sql) are exercised against a real
  * EventStore/ViewStreams below.
  */
class TestKitSpec extends SparkSpec {

  private def virtualKit(): (TestKit, () => Unit) = {
    var t = 1_000_000L
    val kit = new TestKit(() => t)
    (kit, () => t += 250L) // each tick = 250 ms
  }

  test("setup/cleanup records timed result rows; category derives from the NAME (reference quirk)") {
    val (kit, tick) = virtualKit()
    kit.testSetup("my_integration_flow", "performance") // category arg ignored by cleanup
    tick()
    kit.testCleanup("my_integration_flow")
    kit.testSetup("plain_test")
    tick(); tick()
    kit.testCleanup("plain_test", "SKIP")
    val rows = kit.resultRows
    assert(rows.map(r => (r.test_name, r.test_category, r.status, r.execution_time_ms)) ==
      Seq(("my_integration_flow", "integration", "PASS", 250L),
        ("plain_test", "unit", "SKIP", 500L)))
    assert(rows.map(_.test_id) == Seq(1, 2))
    intercept[IllegalArgumentException](kit.testCleanup("x", "BOGUS"))
  }

  test("testAssert/testAssertEquals: failure records a FAIL row for the CURRENT test, then throws") {
    val (kit, _) = virtualKit()
    kit.testSetup("t_unit_a")
    assert(kit.testAssert(condition = true, "fine"))
    val e = intercept[TestAssertionException](kit.testAssert(condition = false, "boom"))
    assert(e.getMessage == "Assertion failed: boom")
    assert(kit.resultRows.last.status == "FAIL" &&
      kit.resultRows.last.error_message.contains("boom") &&
      kit.resultRows.last.test_name == "t_unit_a")

    kit.testSetup("t_unit_b")
    // IS DISTINCT FROM semantics: null == null passes, null vs value fails
    assert(kit.testAssertEquals(null, null, "nulls equal"))
    val e2 = intercept[TestAssertionException](kit.testAssertEquals(3, 4, "count"))
    assert(e2.getMessage == "count - Expected: 3, Actual: 4")
    intercept[TestAssertionException] {
      kit.testSetup("t_unit_c"); kit.testAssertEquals(null, "x", "null vs value")
    }
    intercept[TestAssertionException] {
      kit.testSetup("t_unit_d"); kit.testAssertNull("nonnull", "should be null")
    }
    assert { kit.testSetup("t_unit_e"); kit.testAssertNotNull("v", "ok") }
  }

  test("testExpectError: unanchored regex on the message; success records NO row") {
    val (kit, _) = virtualKit()
    kit.testSetup("t_err")
    assert(kit.testExpectError(
      throw new RuntimeException("duplicate key value violates unique constraint: event_id"),
      "unique constraint", "dup check"))
    assert(kit.resultRows.isEmpty) // happy path writes nothing (test-helpers.sql:171-205)
    // no error at all → FAIL + throw
    intercept[TestAssertionException](kit.testExpectError(42, "whatever", "no error"))
    assert(kit.resultRows.last.error_message.get.contains("Expected an error but none occurred"))
    // wrong pattern → FAIL + throw with both pattern and actual in the message
    kit.testSetup("t_err2")
    val e = intercept[TestAssertionException](
      kit.testExpectError(throw new RuntimeException("other failure"), "unique constraint", "dup"))
    assert(e.getMessage.contains("Expected error pattern: unique constraint") &&
      e.getMessage.contains("Actual error: other failure"))
  }

  test("testRecordMetric attaches to the latest row of the current test, placeholder when absent") {
    val (kit, tick) = virtualKit()
    kit.testSetup("perf_run")
    tick()
    kit.testCleanup("perf_run")
    kit.testSetup("perf_run") // metric recorded mid-test attaches to the PRIOR row by name
    kit.testRecordMetric("events_per_second", 355.0, "ops")
    assert(kit.metricRows == Seq(TestMetricRow(1, 1, "events_per_second", 355.0, "ops")))
    // no result row for this name yet → placeholder ('performance', PASS, 0)
    val kit2 = new TestKit(() => 5L)
    kit2.testSetup("orphan")
    kit2.testRecordMetric("latency_ms", 12.5)
    assert(kit2.resultRows.map(r => (r.test_name, r.test_category, r.status, r.execution_time_ms)) ==
      Seq(("orphan", "performance", "PASS", 0L)))
    assert(kit2.metricRows.head.test_id == 1)
  }

  test("getResultsSummary / testSummary / failedTests reproduce the reporting-view shapes") {
    val (kit, tick) = virtualKit()
    for ((name, st) <- Seq(("a_unit", "PASS"), ("b_unit", "FAIL"), ("c_unit", "SKIP"),
      ("d_integration", "PASS"), ("e_integration", "PASS"))) {
      kit.testSetup(name); tick(); if (name == "b_unit") tick()
      kit.testCleanup(name, st, if (st == "FAIL") Some("exploded") else None)
    }
    val summary = kit.getResultsSummary(spark).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(summary.toSeq == Seq(
      ("integration", 2L, 2L, 0L, 0L, 250.0),
      ("unit", 3L, 1L, 1L, 1L, (250.0 + 500.0 + 250.0) / 3)))
    val ts = kit.testSummary(spark).collect()
      .map(r => (r.getString(0), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(ts.toSeq == Seq(("integration", 250.0, 250.0, 250.0),
      ("unit", 333.33, 250.0, 500.0)))
    val failed = kit.failedTests(spark).collect()
    assert(failed.length == 1 && failed.head.getString(0) == "b_unit" &&
      failed.head.getString(2) == "exploded")
    kit.testClearResults()
    assert(kit.resultRows.isEmpty && kit.metricRows.isEmpty &&
      kit.getResultsSummary(spark).count() == 0)
  }

  test("jsonReport mirrors the runner's shape (summary/test_results/environment)") {
    val (kit, tick) = virtualKit()
    kit.testSetup("one_unit"); tick(); kit.testCleanup("one_unit")
    kit.testSetup("two_unit"); tick()
    kit.testCleanup("two_unit", "FAIL", Some("line1\nline2 \"quoted\""))
    val js = kit.jsonReport(1.5, Map("engine" -> "graft", "test_category" -> "all"))
    // shape-check with a real JSON parse (scala-side, zero deps): the
    // driver's python json.load must accept it, so parse strictly.
    val parsed = ujsonLite(js)
    assert(parsed.contains("\"total_tests\": 2") && parsed.contains("\"passed\": 1") &&
      parsed.contains("\"failed\": 1") && parsed.contains("\"success_rate\": 50"))
    assert(parsed.contains("\"status\": \"failed\"") && parsed.contains("line1 line2"))
    assert(parsed.contains("\"engine\": \"graft\""))
  }

  /** Minimal well-formedness gate: balanced braces/brackets outside
    * strings, no raw control chars inside strings. Returns the input
    * for content asserts.
    */
  private def ujsonLite(s: String): String = {
    var depth = 0; var inStr = false; var esc = false
    s.foreach { c =>
      if (inStr) {
        assert(c >= ' ', s"raw control char in JSON string: ${c.toInt}")
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1; assert(depth >= 0)
        case '"' => inStr = true
        case _ =>
      }
    }
    assert(depth == 0 && !inStr, "unbalanced JSON")
    s
  }

  test("domain assertions run the reference probes against a live store") {
    val kit = new TestKit()
    val sa = new StoreAssertions(kit) // real clock: lease expiry compares against NOW()
    val store = new EventStore(spark)
    store.registerDeciderEvent("Order", "Created")
    store.registerDeciderEvent("Order", "Paid")
    val e1 = store.appendEvent(EventInput("Created", "ev-1", "Order", "o-1", "{\"k\":\"v\"}"))
      .toOption.get
    store.appendEvent(EventInput("Paid", "ev-2", "Order", "o-1", "{}",
      previous_id = Some(e1.event_id))).toOption.get

    kit.testSetup("domain_unit")
    assert(sa.assertEventExists(store, "ev-1", "o-1", "Order", "m"))
    assert(sa.assertEventNotExists(store, "ev-404", "m"))
    assert(sa.assertEventCount(store, "o-1", "Order", 2, "m"))
    assert(sa.assertEventOrdering(store, "o-1", "Order", "m"))
    assert(sa.assertDeciderEventRegistered(store, "Order", "Paid", 1, "m"))
    assert(sa.assertStreamNotFinal(store, "o-1", "Order", "m"))
    assert(sa.assertPreviousIdChainValid(store, "o-1", "Order", "m"))
    assert(sa.assertJsonContains(spark, "{\"k\":\"v\"}", "k", "v", "m"))

    val vs = new ViewStreams(store)
    vs.registerView("v1")
    assert(sa.assertViewRegistered(vs, "v1", "m"))
    assert(sa.assertLockExists(vs, "v1", "o-1", "m"))
    // locks are born expired (schema.sql:191) → inactive under any clock
    assert(sa.assertLockInactive(vs, "v1", "o-1", "m"))

    // failure path records FAIL + throws with the reference message format
    val e = intercept[TestAssertionException](sa.assertEventCount(store, "o-1", "Order", 5, "m"))
    assert(e.getMessage.contains("Event count for decider_id=o-1") &&
      e.getMessage.contains("Expected: 5, Actual: 2"))
    assert(kit.resultRows.last.status == "FAIL")

    // chain violation detected: dangling previous_id in a fresh stream
    val store2 = new EventStore(spark)
    store2.registerDeciderEvent("Order", "Created")
    store2.appendEvent(EventInput("Created", "ev-a", "Order", "o-9", "{}"))
    kit.testSetup("domain_unit2")
    assert(sa.assertPreviousIdChainValid(store2, "o-9", "Order", "m"))
  }
}
