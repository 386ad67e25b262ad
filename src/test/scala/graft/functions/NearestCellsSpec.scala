package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The IVF quantizer pair: deterministic Lloyd's fit (KMeansLite) and
  * the nearest_cells assignment kernel — planted well-separated
  * clusters must be recovered, assignment must agree between
  * interpreted and codegen paths, and the probe list must rank by
  * distance with index tie-break.
  */
class NearestCellsSpec extends SparkSpec {

  private val dim = 8
  // four well-separated cluster anchors on coordinate axes
  private def anchor(c: Int): Array[Float] =
    Array.tabulate(dim)(j => if (j == c * 2) 10f else 0f)

  private def corpus: Seq[Array[Float]] = {
    val rnd = new scala.util.Random(3)
    (0 until 400).map { i =>
      val a = anchor(i % 4)
      a.map(x => x + 0.3f * rnd.nextGaussian().toFloat)
    }
  }

  test("KMeansLite recovers planted clusters deterministically") {
    val pts = corpus.toArray
    val c1 = KMeansLite.fit(pts, k = 4, iters = 10)
    val c2 = KMeansLite.fit(pts, k = 4, iters = 10)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq, "fit not deterministic")
    // every fitted center sits near exactly one anchor
    val matched = (0 until 4).map { a =>
      c1.count { c =>
        val d = c.zip(anchor(a)).map { case (x, y) => (x - y) * (x - y) }.sum
        d < 4.0
      }
    }
    assert(matched.forall(_ == 1), s"center-anchor matching: $matched")
  }

  test("nearest_cells assigns to the planted cluster; probes rank by distance") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val pts = corpus.toArray
    val centers = KMeansLite.fit(pts, k = 4, iters = 10)
    val cLit = typedlit(centers.map(_.toSeq).toSeq)
    val df = pts.toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
      .select(col("id"),
        call_function("nearest_cells", col("vec"), cLit, lit(2)).as("cells"))
      .collect()
    // all members of one planted cluster share a home cell
    val home = df.map(r => (r.getLong(0) % 4, r.getSeq[Int](1).head))
    home.groupBy(_._1).foreach { case (a, rows) =>
      assert(rows.map(_._2).toSet.size == 1, s"cluster $a split across cells")
    }
    // probe list: 2 distinct cells, nearest first
    df.foreach { r =>
      val cells = r.getSeq[Int](1)
      assert(cells.length == 2 && cells(0) != cells(1))
    }
  }

  test("interpreted and codegen paths agree") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val pts = corpus.take(50)
    val centers = KMeansLite.fit(corpus.toArray, k = 4, iters = 10)
    val cLit = typedlit(centers.map(_.toSeq).toSeq)
    def run(codegen: Boolean) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      try pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "vec")
        .select(col("id"), call_function("nearest_cells", col("vec"), cLit, lit(3)).as("c"))
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(run(codegen = true) == run(codegen = false))
  }
}
