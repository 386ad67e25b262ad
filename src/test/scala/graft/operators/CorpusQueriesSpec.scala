package graft.operators

import graft.SparkSpec

/** Invariant tests for CorpusQueries on the sf0.001 fixture. Exact
  * value agreement with DuckDB is the oracle's job (Verify); these
  * assert the structural properties a chunker/sampler/ranker must
  * hold regardless of data.
  */
class CorpusQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("chunking covers every word exactly once per stride window") {
    val docs = graft.Tables.documents(spark, sf)
    val chunks = Registry.byName("doc_chunk_sliding").run(spark, sf)
      .collect()
      .groupBy(_.getLong(0))
    val wordCounts = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length)
      .toMap
    assert(chunks.keySet == wordCounts.keySet)
    for ((docId, rows) <- chunks) {
      val sorted = rows.sortBy(_.getInt(1))
      val n = wordCounts(docId)
      // chunk starts are exactly 0, 15, 30, ... while start < n
      assert(sorted.map(_.getLong(2)).toSeq ==
        (0L until n.toLong by 15L).toSeq)
      for (r <- sorted) {
        val start = r.getLong(2)
        val nWords = r.getInt(3)
        assert(nWords == math.min(20L, n - start))
        // chunk_text really contains n_words words
        assert(r.getString(4).split(" ", -1).length == nWords)
      }
      // consecutive chunks overlap by 5 words (len 20, stride 15)
      // except when the earlier chunk was already truncated
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray)) {
        if (a.getInt(3) == 20) {
          val aWords = a.getString(4).split(" ", -1)
          val bWords = b.getString(4).split(" ", -1)
          assert(aWords.takeRight(5).sameElements(bWords.take(5)))
        }
      }
    }
  }

  test("stratified sample is deterministic and respects per-lang rates") {
    val q = Registry.byName("doc_sample_stratified")
    val a = q.run(spark, sf).collect()
    val b = q.run(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "not deterministic")
    for (r <- a) {
      val rate = r.getString(1) match {
        case "en" => 20; case "zh" => 60; case _ => 45
      }
      assert(r.getInt(2) >= 0 && r.getInt(2) < rate)
    }
    // sampling actually drops rows
    val total = graft.Tables.documents(spark, sf).count()
    assert(a.length > 0 && a.length < total)
  }

  test("bm25 scores are positive, descending, capped at k") {
    val rows = Registry.byName("doc_bm25_topk").run(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    // a doc that never mentions any query term must not appear
    import org.apache.spark.sql.functions._
    val scored = rows.map(_.getLong(0)).toSet
    val noTerm = graft.Tables.documents(spark, sf)
      .filter(!lower(col("text")).rlike("\\b(spark|window|merge)\\b"))
      .collect().map(_.getLong(0)).toSet
    assert(scored.intersect(noTerm).isEmpty)
  }

  test("sequence packing offsets are contiguous and partition the corpus") {
    val rows = Registry.byName("doc_pack_sequences").run(spark, sf).collect()
    assert(rows.nonEmpty)
    var expect = 0L
    for (r <- rows.sortBy(_.getLong(0))) {
      assert(r.getLong(2) == expect, s"doc ${r.getLong(0)} offset gap")
      assert(r.getLong(3) == r.getLong(2) / 256)
      assert(r.getLong(4) == (r.getLong(2) + r.getLong(1) - 1) / 256)
      assert(r.getLong(3) <= r.getLong(4))
      expect += r.getLong(1)
    }
  }

  test("boilerplate overlap is a valid ratio and counts every doc") {
    val rows = Registry.byName("doc_boilerplate_overlap").run(spark, sf).collect()
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.length == total)
    for (r <- rows) {
      val nGrams = r.getLong(1); val nShared = r.getLong(2); val ratio = r.getDouble(3)
      assert(nGrams > 0 && nShared >= 0 && nShared <= nGrams)
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(math.abs(ratio - nShared.toDouble / nGrams) < 1e-6)
    }
  }

  test("char entropy equals a plain-Scala recompute of the 28-symbol micro-nat sum") {
    val texts = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Registry.byName("doc_char_entropy").run(spark, sf).collect()
    assert(rows.length == texts.count(_._2.nonEmpty))
    val maxH = math.log(28.0)
    for (r <- rows) {
      val text = texts(r.getLong(0))
      val n = text.length
      assert(r.getInt(1) == n)
      val alpha = ('a' to 'z') :+ ' '
      val ks = alpha.map(ch => text.count(_ == ch).toLong)
      val kAll = ks :+ (n - ks.sum)
      val micro = kAll.map { k =>
        if (k > 0) math.floor(k.toDouble * math.log(n.toDouble / k) / n * 1e6).toLong
        else 0L
      }.sum
      assert(r.getLong(2) == micro, s"entropy_micro mismatch for doc ${r.getLong(0)}")
      val h = r.getDouble(3)
      assert(h >= 0.0 && h <= maxH)
      val top = r.getDouble(4)
      assert(top >= 1.0 / 28 - 1e-6 && top <= 1.0)
      assert(math.abs(top - kAll.max.toDouble / n) < 1e-6)
    }
  }
}
