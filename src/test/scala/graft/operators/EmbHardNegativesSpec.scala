package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** emb_hard_negatives: the mined pair must actually be a NEGATIVE
  * (different label), must skip a nearer same-label neighbor (the
  * "drop the positives" step is the whole point), and must respect
  * the pool's similarity order.
  */
class EmbHardNegativesSpec extends SparkSpec {

  test("planted same-label near-dup is skipped for the different-label runner-up") {
    import spark.implicits._
    val dims = 64
    def vec(seed: Int, jitter: Float): Array[Float] = {
      val r = new scala.util.Random(7)
      val base = Array.fill(dims)(r.nextFloat())
      val j = new scala.util.Random(seed)
      base.map(v => v + jitter * j.nextFloat())
    }
    // q(label 0); a near-identical POSITIVE (label 0); a slightly
    // farther NEGATIVE (label 1); junk (label 2) far away
    val rows = Seq(
      (0L, vec(1, 0.0f).toSeq, 0),
      (1L, vec(2, 0.01f).toSeq, 0),
      (2L, vec(3, 0.05f).toSeq, 1),
      (3L, { val r = new scala.util.Random(99)
             Array.fill(dims)(r.nextFloat()).toSeq }, 2))
    val dir = java.nio.file.Files.createTempDirectory("hardneg").toString
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Registry.byName("emb_hard_negatives").run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(3))).toMap
    // q0's nearest is the positive v1 — the mined negative must be v2
    assert(got(0L) == (2L, 1), s"q0 mined ${got.get(0L)}, want (2, label 1)")
    // and symmetric: v1's mined negative is also v2
    assert(got(1L) == (2L, 1))
  }

  test("every mined pair at sf0.001 is cross-label and pool-consistent") {
    val sf = "/root/testdata/sf0.001"
    val mined = Registry.byName("emb_hard_negatives").run(spark, sf).collect()
    assert(mined.nonEmpty)
    val labels = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (r <- mined) {
      val (qid, cid, cLab) = (r.getLong(0), r.getLong(1), r.getInt(3))
      assert(labels(cid) == cLab)
      assert(labels(qid) != cLab, s"q$qid mined a SAME-label pair")
      assert(qid != cid)
    }
  }
}
