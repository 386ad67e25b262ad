package graft.testkit

import org.scalatest.{Outcome, TestSuite, TestSuiteMixin}

/** Routes a ScalaTest suite's per-test lifecycle through [[TestKit]]
  * — the reference test-framework analogue (tests/utils/
  * test-helpers.sql setup/cleanup + run-tests.sh:579-636
  * generate_json_report) — so a real `sbt test` run PRODUCES the
  * runner's report artifact instead of the kit existing only as
  * spec-tested capability. Stackable mixin: wraps withFixture with
  * testSetup/testCleanup (PASS/FAIL/SKIP mapped from the ScalaTest
  * outcome), and on suite completion writes
  * `target/testkit/report-<Suite>.json` in the runner's schema.
  */
trait TestKitReported extends TestSuiteMixin { this: TestSuite =>

  /** Reference category taxonomy (test-database.sql:39-63). */
  protected def testKitCategory: String = "integration"

  protected val testKit: TestKit = new TestKit()
  private val suiteStartNs = System.nanoTime()
  @volatile private var reported = 0

  abstract override def withFixture(test: NoArgTest): Outcome = {
    testKit.testSetup(test.name, testKitCategory)
    val outcome = super.withFixture(test)
    val (status, err) = outcome match {
      case org.scalatest.Succeeded => ("PASS", None)
      case f: org.scalatest.Failed => ("FAIL", Some(f.exception.toString.take(500)))
      case _ => ("SKIP", None) // canceled / pending
    }
    testKit.testCleanup(test.name, status, err)
    reported += 1
    writeReport() // rewrite after every test: a crashed JVM still
    // leaves the report rows recorded so far (the runner's trap
    // EXIT behavior, run-tests.sh:640)
    outcome
  }

  private def writeReport(): Unit = {
    val secs = (System.nanoTime() - suiteStartNs) / 1e9
    val dir = java.nio.file.Paths.get("target", "testkit")
    try {
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(
        dir.resolve(s"report-${getClass.getSimpleName}.json"),
        testKit.jsonReport(secs, Map(
          "suite" -> getClass.getName,
          "engine" -> "graft-spark",
          "tests_reported" -> reported.toString)))
    } catch { case _: Throwable => () } // reporting must never fail a test
  }
}
