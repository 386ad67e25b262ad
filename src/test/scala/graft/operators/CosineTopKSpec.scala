package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}

/** Row-for-row equivalence of the blocked brute-force kernel
  * (BruteForceCosine.topK — what the registry's emb_cosine_topk runs)
  * with the declarative crossJoin + TopKByScore plan (its semantic
  * spec). The corpus deliberately contains EXACT duplicate vectors so
  * the round-6 sims tie and the (sim desc, cid asc) tie-break is
  * actually exercised, plus a duplicate-of-query so self-exclusion
  * (cid ≠ qid, not sim < 1) is covered.
  */
class CosineTopKSpec extends SparkSpec {

  private def corpus: DataFrame = {
    val rnd = new scala.util.Random(11)
    val dim = 64
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val base = (0 until 120).map(i => i.toLong -> vec())
    // ids 500-509 duplicate vectors 0-9 exactly: versus any query they
    // score identically to the original, forcing ties at every k.
    val dups = (0 until 10).map(i => (500L + i) -> base(i)._2.clone())
    val rows = (base ++ dups).map { case (id, v) => Row(id, v.toSeq) }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }

  test("kernel topK equals the declarative plan, ties included") {
    val df = corpus.cache()
    try {
      val kernel = graft.functions.BruteForceCosine.topK(spark, df, 5).collect().toSeq
      val plan = EmbeddingQueries.cosineTopKPlan(spark, df, 5).collect().toSeq
      assert(kernel.size == plan.size, s"${kernel.size} vs ${plan.size} rows")
      kernel.zip(plan).foreach { case (a, b) => assert(a == b, s"$a != $b") }
      // the duplicated vectors really did produce tied sims: for query
      // 0, its exact duplicate 500 must rank first with sim 1.0
      val q0 = kernel.filter(_.getLong(0) == 0L)
      assert(q0.head.getLong(2) == 500L && q0.head.getDouble(3) == 1.0)
    } finally df.unpersist()
  }

  test("block-nested-loop topK equals the single-broadcast kernel") {
    val df = corpus.cache()
    try {
      val whole = graft.functions.BruteForceCosine.topK(spark, df, 5).collect().toSeq
      val blocked = graft.functions.BruteForceCosine.topKBlocked(spark, df, 5, nBlocks = 3)
        .collect().toSeq
      assert(blocked == whole,
        s"blocked ${blocked.size} rows != whole ${whole.size} rows")
    } finally df.unpersist()
  }

  test("kernel nearDup equals the declarative all-pairs plan") {
    val df = corpus.cache()
    try {
      val kernel = EmbeddingQueries.nearDupExact(spark, df, 0.95).collect().toSeq
      val plan = EmbeddingQueries.nearDupExactPlan(spark, df, 0.95).collect().toSeq
      assert(kernel == plan, s"kernel ${kernel.size} rows != plan ${plan.size} rows")
      // the 10 planted duplicates are the expected pairs (cos = 1.0)
      assert(kernel.size == 10 && kernel.forall(_.getDouble(2) == 1.0))
    } finally df.unpersist()
  }
}
