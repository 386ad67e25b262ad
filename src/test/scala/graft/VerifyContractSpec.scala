package graft

import java.nio.file.Files

/** The round-9 lesson, pinned: a registered query that THROWS must
  * still surface in the driver's correctness artifact as a FAILING
  * row, never as a silently-missing one (32 rows vanished behind one
  * loader regression and the artifact read as "73/73 green"). The
  * contract, enforced by [[Verify.runAll]]:
  *  - every attempted query leaves an artifact at `<name>.parquet` —
  *    the real result when it runs, a one-row `(err: string)` parquet
  *    when it throws (oracle-incomparable by construction, so the
  *    driver compare goes red instead of blank);
  *  - the error map names exactly the throwing queries.
  */
class VerifyContractSpec extends SparkSpec {

  test("a throwing query still emits an err-schema artifact; a healthy one is untouched") {
    val out = Files.createTempDirectory("graft-verify-contract").toString
    val queries = scala.collection.immutable.ListMap[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "ok_regions" -> ((s, d) => Tables.region(s, d).select("r_regionkey", "r_name")),
      "boom" -> ((_, _) => throw new IllegalStateException("synthetic analysis failure")),
      "ok_nations" -> ((s, d) => Tables.nation(s, d).select("n_nationkey"))
    )
    val errors = Verify.runAll(spark, "/root/testdata/sf0.001", out, queries)

    assert(errors.keySet == Set("boom"), s"error map must name exactly the throwing query: $errors")
    assert(errors("boom").contains("synthetic analysis failure"))

    // every attempted name has an artifact — absence is impossible
    for (name <- queries.keys)
      assert(new java.io.File(s"$out/$name.parquet").exists(),
        s"$name left no artifact slot")

    // the failed slot reads back as the sentinel err schema (which can
    // never match a real oracle's schema), the healthy ones as data
    val boom = spark.read.parquet(s"$out/boom.parquet")
    assert(boom.columns.toSeq == Seq("err"))
    assert(boom.collect().map(_.getString(0)).exists(_.contains("synthetic analysis failure")))
    assert(spark.read.parquet(s"$out/ok_regions.parquet").columns.toSeq ==
      Seq("r_regionkey", "r_name"))
    assert(spark.read.parquet(s"$out/ok_nations.parquet").count() > 0)
  }
}
