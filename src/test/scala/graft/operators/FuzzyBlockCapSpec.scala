package graft.operators

import graft.SparkSpec
import java.nio.file.Files

/** Block-size ceiling of doc_fuzzy_match: a degenerate corpus (shared
  * boilerplate prefix) must NOT send the in-block pair loop quadratic.
  * Level-1 blocks over FuzzyBlockCap refine on chars 17-32; blocks
  * still oversized after refinement are excluded from pairing.
  */
class FuzzyBlockCapSpec extends SparkSpec {

  private val fuzzy = graft.SparkEntry.queries("doc_fuzzy_match")

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fuzzycap").toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("oversized block refines on chars 17-32; pairs stay within sub-blocks") {
    val cap = TextDedupQueries.FuzzyBlockCap
    // one shared 16-char prefix ("aaaaaaaaaaaaaaaa"), 2·(cap-6) rows —
    // far over the level-1 cap — split by chars 17-32 into two
    // sub-blocks of cap-6 rows each (under the cap), with one
    // readily-matchable pair per sub-block
    val prefix = "a" * 16
    val subA = (1L to (cap - 6).toLong).map(i =>
      (i, prefix + "bbbbbbbbbbbbbbbb" + s" left document number $i with plenty of tail"))
    val subB = (1001L to (1000 + cap - 6).toLong).map(i =>
      (i, prefix + "cccccccccccccccc" + s" right document number $i with plenty of tail"))
    val dir = writeDocs(subA ++ subB)
    val got = fuzzy(spark, dir).collect()
    // no cross-sub-block pairs: doc_a/doc_b always on the same side
    assert(got.nonEmpty, "refined sub-blocks must still pair within themselves")
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert((a <= 1000) == (b <= 1000),
        s"pair ($a,$b) crosses refined sub-blocks — refinement key ignored")
    }
    // candidate bound holds structurally: two sub-blocks of (cap-6)
    // rows generate at most 2·C(cap-6,2) candidates — never the
    // unrefined C(2(cap-6),2); the cross-block check above is what
    // proves the refinement key took effect
    assert(got.length <= 2 * ((cap - 6) * (cap - 7)) / 2)
  }

  test("block still oversized after refinement is dropped from pairing (degenerate 32-char prefix)") {
    val cap = TextDedupQueries.FuzzyBlockCap
    // identical 32-char prefix on 2·cap rows: level-1 refines to ONE
    // sub-block of 2·cap rows — still over the cap → excluded. The
    // uncapped form would emit ~2cap²/2 ≈ 131k Levenshtein pairs here.
    val prefix = "z" * 32
    val docs = (1L to (2 * cap).toLong).map(i => (i, prefix + s" doc $i"))
    // plus a healthy small block that must be unaffected by the drop
    val healthy = Seq(
      (90001L, "unique little discussion about sparks and rivers"),
      (90002L, "unique little discussion about sparks and rafts"))
    val dir = writeDocs(docs ++ healthy)
    val got = fuzzy(spark, dir).collect()
    val degeneratePairs = got.filter(r => r.getLong(0) <= 2L * cap)
    assert(degeneratePairs.isEmpty,
      s"degenerate block must be dropped, found ${degeneratePairs.length} pairs")
    // the healthy block still matches (edit distance 2 on the 80-prefix)
    assert(got.exists(r => r.getLong(0) == 90001L && r.getLong(1) == 90002L),
      "healthy blocks must be unaffected by the degenerate-block drop")
  }
}
