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

  test("star contraction equals label propagation on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // sparse random graph: 120 nodes, 90 edges → a mix of chains,
    // trees, small cycles, and isolated-pair components
    val edges = Seq.fill(90)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .toDF("doc_a", "doc_b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val viaProp = asMap(TextDedupQueries.nearDupClusters(spark, edges))
    val viaStar = asMap(TextDedupQueries.nearDupClustersStar(spark, edges))
    assert(viaStar === viaProp,
      "any correct CC algorithm must produce identical (node -> min-label) maps")
  }

  test("pure matching (every node a leaf): peel keeps the smaller endpoint, labels stay per-pair") {
    import spark.implicits._
    // the degree-1 pre-contraction's boundary case: EVERY node has
    // degree 1, so the core is only the smaller endpoints (isolated
    // after the peel) — each pair must still label to its minimum,
    // including the (20, 4) row where the min enters reversed
    val edges = Seq((1L, 2L), (3L, 5L), (20L, 4L), (6L, 7L)).toDF("doc_a", "doc_b")
    val got = TextDedupQueries.nearDupClusters(spark, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 3L, true), (4L, 4L, true),
      (5L, 3L, false), (6L, 6L, true), (7L, 6L, false), (20L, 4L, false)))
  }

  test("star graph with the min at a spoke: all spokes peel, component min survives the re-attach") {
    import spark.implicits._
    // hub 50 with spokes {10, 60, 70, 80}: every spoke is a leaf and
    // peels; the core is the isolated hub (label 50) — the re-attach
    // regroup must still find 10 (a PEELED node) as the component min
    val edges = Seq((50L, 10L), (50L, 60L), (50L, 70L), (50L, 80L)).toDF("doc_a", "doc_b")
    val got = TextDedupQueries.nearDupClusters(spark, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq(
      (10L, 10L, true), (50L, 10L, false), (60L, 10L, false),
      (70L, 10L, false), (80L, 10L, false)))
  }

  test("adversarial diameter: a 60-node chain exceeds the label-prop round bound and falls back") {
    import spark.implicits._
    // chain 60-59-…-1 with the min at the far end: label prop needs 59
    // rounds (> maxRounds=20) — the star fallback must kick in and
    // still produce the right single component in O(log n) rounds
    val edges = (1L until 60L).map(i => (i + 1, i)).toDF("doc_a", "doc_b")
    val got = TextDedupQueries.nearDupClusters(spark, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got.length === 60)
    assert(got.forall(_._2 == 1L), s"all chain nodes must label to 1: $got")
    assert(got.count(_._3) === 1)
  }
}
