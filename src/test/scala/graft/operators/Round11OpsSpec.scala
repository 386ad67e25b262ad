package graft.operators

import graft.SparkSpec

/** Invariant tests for the round-11 second-wave operators
  * (mm_scene_cuts, emb_outliers, emb_ann_ivf_topk) on the sf0.001
  * fixture. Exact cross-engine agreement is the DuckDB oracle's job
  * (Verify); these recompute the results independently in plain Scala
  * (or against a sibling operator's output) so a drift in the
  * relational derivation fails even if both engines drift together.
  */
class Round11OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("mm_scene_cuts: cuts equal a plain-Scala recompute of the histogram detector") {
    val texts = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = (for {
      (id, text) <- texts.toSeq
      if id % 3 == 2 && text.length >= 128
      nFrames = text.length / 64
      hists = (0 until nFrames).map { j =>
        val frame = text.substring(j * 64, j * 64 + 64)
        (0 until 4).map(b => frame.count(_.toInt % 4 == b))
      }
      j <- 1 until nFrames
      l1 = (0 until 4).map(b => math.abs(hists(j)(b) - hists(j - 1)(b))).sum
      if l1 >= 18
    } yield (id, j, l1)).sortBy(t => (t._1, t._2))
    val got = Registry.byName("mm_scene_cuts").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got == expected)
    // nonempty by construction at fixture scale — a threshold drift
    // that silences the operator fails loudly here
    assert(got.nonEmpty)
  }

  test("emb_outliers: flagged set equals an exact BigInt recompute of the integer z-test") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("label", "vec_id", "embedding").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
    val byLabel = vecs.groupBy(_._1)
    val expected = (for {
      (label, members) <- byLabel.toSeq
      n = members.length
      cent = (0 until 64).map { i =>
        members.map(m => math.floor(m._3(i).toDouble * 1e6)).sum / (n * 1e6)
      }
      dms = members.map { case (_, vid, emb) =>
        var d2 = 0.0
        for (i <- 0 until 64) {
          val diff = emb(i).toDouble - cent(i)
          d2 += diff * diff
        }
        (vid, d2, BigInt(math.floor(d2 * 1e3).toLong))
      }
      s1 = dms.map(_._3).sum
      s2 = dms.map(m => m._3 * m._3).sum
      (vid, d2, dmu) <- dms
      lhs = BigInt(n) * dmu - s1
      if lhs > 0 && lhs * lhs > (BigInt(n) * s2 - s1 * s1) * 4
    } yield (label, vid,
      BigDecimal(d2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(t => (t._1, t._2))
    val got = Registry.byName("emb_outliers").run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
  }

  test("emb_ann_ivf_topk: rank-1 equals emb_ann_ivf_auto's winner; ranks dense, sims ordered") {
    val topk = Registry.byName("emb_ann_ivf_topk").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // same candidate stage + same tie order => the k=1 slice must be
    // bit-identical to the top-1 operator's output
    val top1 = Registry.byName("emb_ann_ivf_auto").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(topk.filter(_._2 == 1).map(t => (t._1, t._3, t._4)).toSet == top1)
    for ((qid, rows) <- topk.groupBy(_._1)) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rows.length), s"ranks not dense for $qid")
      // keep-order: sim DESC, cid ASC
      val pairs = sorted.map(t => (-t._4, t._3)).toSeq
      assert(pairs == pairs.sorted, s"rank order violates (sim DESC, cid ASC) for $qid")
      assert(rows.length <= 5)
    }
  }

  test("emb_ann_ivfpq_topk: rank-1 equals emb_ann_ivfpq_auto's winner; ranks dense, sims ordered") {
    val topk = Registry.byName("emb_ann_ivfpq_topk").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val top1 = Registry.byName("emb_ann_ivfpq_auto").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(topk.filter(_._2 == 1).map(t => (t._1, t._3, t._4)).toSet == top1)
    for ((qid, rows) <- topk.groupBy(_._1)) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rows.length), s"ranks not dense for $qid")
      val pairs = sorted.map(t => (-t._4, t._3)).toSeq
      assert(pairs == pairs.sorted, s"rank order violates (sim DESC, cid ASC) for $qid")
      assert(rows.length <= 5)
    }
  }

  test("emb_ann_ivf_topk: aggregation-shaped plan (bounded-heap agg, no window rank)") {
    val df = Registry.byName("emb_ann_ivf_topk").run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      "top-k ranking must be the bounded-heap aggregate")
    assert(!plan.contains("Window"),
      "a window rank would shuffle-and-sort the full candidate matrix")
  }

  test("doc_pipeline_attrition: each stage drops exactly its planted victims") {
    import spark.implicits._
    // fixture corpus: ids %7!=0 are pipeline input, id 7 is the
    // benchmark reference. Vocabularies are disjoint across texts so
    // the ONLY 8-gram collision is the planted run in doc 5.
    val passA = Seq.fill(15)("alpha beta gamma delta").mkString(" ")
    val passB = Seq.fill(15)("omega kappa sigma tau").mkString(" ")
    val run8 = "one two three four five six seven eight"
    val passC = Seq.fill(13)("lima mike november oscar").mkString(" ") + " " + run8
    val docs = Seq(
      (1L, passA, "en", "srcA"), // survives everything
      (2L, "tiny bad doc", "en", "srcA"), // fails the quality gate (word count)
      (3L, passB, "en", "srcB"), // duplicate pair: 3 kept (min id) ...
      (4L, passB, "en", "srcB"), // ... 4 dropped at exact_dedup
      (5L, passC, "en", "srcB"), // shares run8 with the benchmark -> decontaminated
      (7L, "pad pad pad " + run8, "en", "bench") // doc_id%7=0: reference only
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.expr("CAST(length(text) AS BIGINT)"))
    val dir = java.nio.file.Files.createTempDirectory("attr_fixture").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Registry.byName("doc_pipeline_attrition").run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // the classifier stage (2) drops nothing here BY CONSTRUCTION: on
    // this fixture the labels are exactly absorbable (doc 2's 3-word
    // count splits at n_words ≤ 3 with zero error), so the CART tree
    // reproduces the rule verdicts and every rule survivor passes —
    // the stage's plumbing is what's pinned; QualityClassifierSpec
    // covers trees that disagree with their labels
    val expected = Seq(
      (1, "gopher_quality", "srcA", 2L, 1L, 1L),
      (1, "gopher_quality", "srcB", 3L, 3L, 0L),
      (2, "quality_classifier", "srcA", 1L, 1L, 0L),
      (2, "quality_classifier", "srcB", 3L, 3L, 0L),
      (3, "exact_dedup", "srcA", 1L, 1L, 0L),
      (3, "exact_dedup", "srcB", 3L, 2L, 1L),
      (4, "decontaminate", "srcA", 1L, 1L, 0L),
      (4, "decontaminate", "srcB", 2L, 1L, 1L))
    assert(got == expected)
  }

  test("emb_kmeans_profile / emb_cluster_sample: plain-Scala recompute of assignment, stats, prototypes") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val centers = graft.functions.KMeansLite.fit(
      vecs.take(4096).map(_._2), k = 16, iters = 5)
    // nearest_cells semantics: ascending-index double fold against the
    // FLOAT centers widened to double, strict < keeps the lowest cell
    // on ties
    def assign(emb: Array[Float]): (Int, Double) = {
      var best = -1; var bd = Double.MaxValue
      for (c <- centers.indices) {
        var d2 = 0.0; var i = 0
        while (i < 64) {
          val diff = emb(i).toDouble - centers(c)(i).toDouble
          d2 += diff * diff; i += 1
        }
        if (d2 < bd) { bd = d2; best = c }
      }
      (best, bd)
    }
    val assigned = vecs.map { case (vid, e) =>
      val (c, d2) = assign(e); (c, vid, d2)
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expProfile = assigned.groupBy(_._1).toSeq.map { case (c, ms) =>
      val smu = ms.map(m => BigInt(math.floor(m._3 * 1e6).toLong)).sum
      (c, ms.length.toLong,
        r6(smu.toDouble / (ms.length.toDouble * 1e6)),
        ms.map(m => r6(m._3)).max)
    }.sortBy(_._1)
    val gotProfile = Registry.byName("emb_kmeans_profile").run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(gotProfile == expProfile)
    assert(gotProfile.map(_._2).sum == vecs.length) // every vector assigned once
    val expProto = assigned.groupBy(_._1).toSeq.flatMap { case (c, ms) =>
      ms.map(m => (math.floor(m._3 * 1e6).toLong, m._2))
        .sorted.take(4).zipWithIndex
        .map { case ((micro, vid), i) => (c, i + 1, vid, micro) }
    }.sortBy(t => (t._1, t._2))
    val gotProto = Registry.byName("emb_cluster_sample").run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotProto == expProto)
  }
}
