package graft.operators

import graft.SparkSpec

/** The top-V vocabulary cap of docLmNll (TextDedupQueries): when the
  * cap binds, dropped words fold into the single OOV token — unigram
  * mass conserved, smoothing denominator = kept words + 1 — and when
  * it does not bind the model must be EXACTLY the uncapped one (that
  * identity is what keeps the uncapped DuckDB oracle valid verbatim
  * at oracle scale, where the observed vocabulary is 31 words ≪ V).
  */
class LmNllVocabCapSpec extends SparkSpec {

  import scala.math.{floor, log}

  // corpus with a skewed vocabulary: "a" dominates, then "b", then
  // singletons c/d/e — a cap of 2 keeps {a, b} and folds the rest
  private def corpus() = {
    import spark.implicits._
    Seq(
      (1L, "a b a b a"),
      (2L, "a c a d"),
      (3L, "b a e"),
      (4L, "a")
    ).toDF("doc_id", "text")
  }

  /** Brute-force reference model: token streams, optional top-V fold,
    * add-one smoothing over the mapped vocabulary, micro-nat floors —
    * the same arithmetic spec as the oracle SQL, computed in plain
    * Scala.
    */
  private def reference(docs: Seq[(Long, Seq[String])], cap: Int)
      : Map[Long, (Long, Long, Double)] = {
    val uniRaw = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val keep = uniRaw.toSeq.sortBy { case (w, c) => (-c, w) }.take(cap).map(_._1).toSet
    def m(w: String) = if (keep(w)) w else TextDedupQueries.LmOovToken
    val toksM = docs.map { case (id, ws) => (id, ws.map(m)) }
    val uni = toksM.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = uni.size.toLong
    val bc = toksM.flatMap { case (_, ws) => ws.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    toksM.filter(_._2.size >= 2).map { case (id, ws) =>
      val terms = ws.sliding(2).filter(_.size == 2).map { p =>
        val (w1, w2) = (p(0), p(1))
        floor(log((uni(w1) + v).toDouble / (bc((w1, w2)) + 1).toDouble) * 1e6).toLong
      }.toSeq
      val sum = terms.sum
      val n = terms.size.toLong
      (id, (n, sum, BigDecimal(sum.toDouble / 1e6 / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
  }

  private def tokenize(text: String): Seq[String] =
    text.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
      .split(" ", -1).toSeq

  private def run(cap: Int): Map[Long, (Long, Long, Double)] =
    TextDedupQueries.docLmNll(corpus(), cap).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("binding cap folds the tail into OOV with conserved counts") {
    val docs = corpus().collect().map(r => (r.getLong(0), tokenize(r.getString(1)))).toSeq
    val got = run(2)
    val want = reference(docs, 2)
    assert(got === want)
    // the fold genuinely binds: capped and uncapped disagree
    assert(got !== reference(docs, Int.MaxValue))
  }

  test("non-binding cap is the identity model") {
    val docs = corpus().collect().map(r => (r.getLong(0), tokenize(r.getString(1)))).toSeq
    assert(run(100) === reference(docs, Int.MaxValue))
  }

  test("distributed fallback is bit-identical to the driver-side model fit") {
    // force the fallback by shrinking the local-model cap to 0, with a
    // BINDING vocab cap so the OOV fold and the keep-order tie-break
    // (count DESC, word ASC in byte order) are both exercised
    val key = "spark.graft.lm.localModelMaxTypes"
    val local = run(2)
    spark.conf.set(key, "0")
    try assert(run(2) === local)
    finally spark.conf.unset(key)
    assert(local === reference(
      corpus().collect().map(r => (r.getLong(0), tokenize(r.getString(1)))).toSeq, 2))
  }

  test("default cap is far above every testdata vocabulary") {
    assert(TextDedupQueries.LmVocabCap === 32768)
    // 100× slice vocabulary measured at 3 010 (BASELINE.md) — an
    // order of magnitude of headroom before the fold binds
    assert(TextDedupQueries.LmVocabCap > 10 * 3010)
  }
}
