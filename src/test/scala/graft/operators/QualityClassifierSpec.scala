package graft.operators

import graft.SparkSpec

/** doc_quality_classifier: the relational CART trainer must learn the
  * SAME tree as an independent in-memory CART (misclassification
  * impurity, (err, f, v) tie order, strict-improvement stop), and the
  * trained gate must actually absorb the weak rule labels it was
  * trained on — the whole point of the learned stage.
  */
class QualityClassifierSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def collectMelt() = {
    val melt = QualityClassifier.melted(graft.Tables.documents(spark, sf))
    melt.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
  }

  /** In-memory CART over (doc → features, label). */
  private def refTrain(rows: Array[(Long, Int, Int, Long)], depth: Int)
      : Map[Int, (Int, Long, Long)] = {
    val feats = rows.groupBy(_._1).view
      .mapValues(rs => rs.map(t => t._3 -> t._4).toMap).toMap
    val labs = rows.groupBy(_._1).view.mapValues(_.head._2).toMap
    var node = feats.keys.map(_ -> 1).toMap
    var splits = Map.empty[Int, (Int, Long, Long)]
    for (_ <- 1 to depth) {
      val perNode = node.groupBy(_._2)
      val lvl = perNode.flatMap { case (n, docsHere) =>
        val ds = docsHere.keys.toSeq
        val tp = ds.count(labs(_) == 1).toLong
        val tc = ds.size.toLong
        val baseErr = math.min(tp, tc - tp)
        val cands = for {
          f <- 0 until QualityClassifier.FeatureNames.size
          v <- ds.map(feats(_)(f)).distinct
          left = ds.filter(feats(_)(f) <= v)
          if left.size < ds.size
          lp = left.count(labs(_) == 1).toLong
          lc = left.size.toLong
          err = math.min(lp, lc - lp) + math.min(tp - lp, (tc - lc) - (tp - lp))
          if err < baseErr
        } yield (err, f, v)
        cands.sorted.headOption.map { case (err, f, v) => n -> (f, v, err) }
      }
      if (lvl.isEmpty) return splits
      splits ++= lvl
      node = node.map { case (d, n) =>
        d -> (lvl.get(n) match {
          case Some((f, v, _)) => if (feats(d)(f) <= v) 2 * n else 2 * n + 1
          case None => n
        })
      }
    }
    splits
  }

  test("relational CART training equals the in-memory reference") {
    val rows = collectMelt()
    val wide = QualityClassifier.wideFeatures(graft.Tables.documents(spark, sf))
    val got = QualityClassifier.train(spark, wide)
      .map { case (n, s) => n -> (s.f, s.t, s.err) }
    val want = refTrain(rows, QualityClassifier.Depth)
    assert(got == want, s"trees differ:\n got=$got\n want=$want")
    assert(got.nonEmpty, "the corpus must yield at least one split")
  }

  test("fuzz: random synthetic corpora train the reference tree (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(5, 23, 71)) {
      val rnd = new scala.util.Random(seed)
      // word-salad docs spanning the gate boundaries: lengths straddle
      // 50 words, a few symbol-heavy and short-word docs mix in
      val docs = (0 until 60).map { i =>
        val n = 10 + rnd.nextInt(120)
        val words = Seq.fill(n) {
          rnd.nextInt(10) match {
            case 0 => "##"
            case 1 => "a"
            case _ => ('a' + rnd.nextInt(26)).toChar.toString * (2 + rnd.nextInt(8))
          }
        }
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      val got = QualityClassifier.train(spark, QualityClassifier.wideFeatures(docs))
        .map { case (n, s) => n -> (s.f, s.t, s.err) }
      val rows = QualityClassifier.melted(docs).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      val want = refTrain(rows, QualityClassifier.Depth)
      assert(got == want, s"seed $seed: got=$got want=$want")
    }
  }

  test("trained gate absorbs its weak labels at sf0.001") {
    val out = Registry.byName("doc_quality_classifier").run(spark, sf).collect()
    assert(out.nonEmpty)
    val agree = out.count(r => r.getBoolean(2) == r.getBoolean(3))
    // axis-threshold labels are exactly representable at depth 3; the
    // tree should be near-perfect on its own training corpus
    assert(agree.toDouble / out.length > 0.95,
      s"only $agree/${out.length} verdicts agree with the rule labels")
    // both classes must be present in the predictions (a constant
    // model can score high agreement on a skewed corpus)
    assert(out.exists(_.getBoolean(2)) && out.exists(!_.getBoolean(2)))
  }
}
