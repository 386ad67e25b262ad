package graft

/** The driver contract itself: the flagship entry must return rows
  * (the driver smoke-check — guarded here so a regression fails in
  * `sbt test`, not at round end), every oracle key must name a
  * registered query, and registry names must stay unique.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are registered queries; names unique") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    assert(graft.operators.Registry.all.map(_.name).distinct.size ==
      graft.operators.Registry.all.size)
  }
}
