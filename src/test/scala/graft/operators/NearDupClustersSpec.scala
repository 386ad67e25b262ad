package graft.operators

import graft.SparkSpec

/** Multi-hop correctness of the min-label-propagation connected
  * components (nearDupClusters): the registry oracle covers the real
  * sf-data graph, this spec plants a path graph whose diameter forces
  * several propagation rounds, plus disjoint components and an
  * id-ordering trap (the min label entering from the HIGH end of the
  * path).
  */
class NearDupClustersSpec extends SparkSpec {

  test("path graph with min id at the far end converges to one component") {
    import spark.implicits._
    // path 50-40-30-20-10: min label 10 must walk 4 hops
    val edges = Seq((50L, 40L), (40L, 30L), (30L, 20L), (20L, 10L))
      .toDF("doc_a", "doc_b")
    val got = TextDedupQueries.nearDupClusters(spark, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq(
      (10L, 10L, true), (20L, 10L, false), (30L, 10L, false),
      (40L, 10L, false), (50L, 10L, false)))
  }

  test("disjoint components keep separate canonical labels") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val got = TextDedupQueries.nearDupClusters(spark, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (7L, 7L, true), (9L, 7L, false)))
  }
}
