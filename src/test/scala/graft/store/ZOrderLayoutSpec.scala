package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order clustered writes: the morton key must match a plain-Scala
  * bit interleave, and — the actual point of the layout — the written
  * files' footer [min, max] must prune a 2-dimensional range box far
  * better than a 1-dimensional layout, while reading back the exact
  * same rows.
  */
class ZOrderLayoutSpec extends SparkSpec {

  private def footerBoxCount(dir: String, uLo: Long, uHi: Long,
                             vLo: Double, vHi: Double): (Int, Int) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val files = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath)
    var total = 0; var hit = 0
    for (p <- files) {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        val blocks = r.getFooter.getBlocks
        blocks.forEach { b =>
          total += 1
          var uMin = Long.MaxValue; var uMax = Long.MinValue
          var vMin = Double.MaxValue; var vMax = Double.MinValue
          b.getColumns.forEach { c =>
            val st = c.getStatistics
            c.getPath.toDotString match {
              case "user_id" =>
                uMin = st.genericGetMin.asInstanceOf[java.lang.Long]
                uMax = st.genericGetMax.asInstanceOf[java.lang.Long]
              case "value" =>
                vMin = st.genericGetMin.asInstanceOf[java.lang.Double]
                vMax = st.genericGetMax.asInstanceOf[java.lang.Double]
              case _ => ()
            }
          }
          if (uMax >= uLo && uMin <= uHi && vMax >= vLo && vMin <= vHi) hit += 1
        }
      } finally r.close()
    }
    (hit, total)
  }

  test("morton key equals the plain-Scala bit interleave") {
    val rows = graft.operators.Registry.byName("es_zorder_morton")
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (xq, yq, m) = (r.getLong(1), r.getLong(2), r.getLong(3))
      var want = 0L
      for (i <- 0 until ZOrderLayout.Bits) {
        want |= ((xq >> i) & 1L) << (2 * i)
        want |= ((yq >> i) & 1L) << (2 * i + 1)
      }
      assert(m == want, s"morton mismatch at event ${r.getLong(0)}")
    }
    // the curve must actually spread: more distinct keys than either
    // single quantized dimension alone
    val ms = rows.map(_.getLong(3)).distinct.length
    assert(ms > rows.map(_.getLong(1)).distinct.length)
  }

  test("z-order layout prunes a 2-d box where a 1-d layout cannot") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")

    // 1-d baseline: the arrival layout (sorted by event_id) — tight
    // event_id bounds, full-range user/value bounds per file
    events.repartitionByRange(16, col("event_id"))
      .sortWithinPartitions("event_id")
      .write.mode("overwrite").parquet(s"$dir/naive")
    ZOrderLayout.writeClustered(events, "user_id", "value", s"$dir/zorder", 16)

    val (uLo, uHi, vLo, vHi) = (3L, 5L, 50.0, 100.0)
    val (naiveHit, naiveTotal) = footerBoxCount(s"$dir/naive", uLo, uHi, vLo, vHi)
    val (zHit, zTotal) = footerBoxCount(s"$dir/zorder", uLo, uHi, vLo, vHi)
    assert(naiveTotal >= 16 && zTotal >= 8, s"layouts too coarse: $naiveTotal/$zTotal")
    assert(naiveHit == naiveTotal,
      s"baseline unexpectedly prunes ($naiveHit/$naiveTotal) — box too small to discriminate")
    assert(zHit * 2 <= naiveHit,
      s"z-order footer pruning too weak: $zHit/$zTotal intersect vs $naiveHit/$naiveTotal")

    // and the layout is invisible to query results
    def box(path: String) = spark.read.parquet(path)
      .filter(col("user_id").between(uLo, uHi) && col("value").between(vLo, vHi))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(box(s"$dir/zorder") == box(s"$dir/naive"))
    assert(box(s"$dir/zorder").nonEmpty)
  }

  test("N-dimensional form: 3-d keys stay in range and round-robin the bits") {
    // bit widths shrink with arity so the key stays a non-negative long
    assert(ZOrderLayout.bitsFor(2) == 16 && ZOrderLayout.bitsFor(3) == 16 &&
      ZOrderLayout.bitsFor(4) == 15)
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")
    val rows = ZOrderLayout.withMortonN(events, Seq("user_id", "value", "event_id"))
      .select("q0", "q1", "q2", "morton").collect()
    assert(rows.nonEmpty)
    val bits = ZOrderLayout.bitsFor(3)
    for (r <- rows) {
      val (q0, q1, q2, m) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      var want = 0L
      for (j <- 0 until bits; (q, d) <- Seq(q0, q1, q2).zipWithIndex)
        want |= ((q >> j) & 1L) << (j * 3 + d)
      assert(m == want && m >= 0L)
    }
    // the 2-d path must be bit-identical to the pre-generalization
    // layout: x on even positions, y on odd
    val two = ZOrderLayout.withMorton(events, "user_id", "value")
      .select("xq", "yq", "morton").collect()
    for (r <- two) {
      var want = 0L
      for (i <- 0 until ZOrderLayout.Bits) {
        want |= ((r.getLong(0) >> i) & 1L) << (2 * i)
        want |= ((r.getLong(1) >> i) & 1L) << (2 * i + 1)
      }
      assert(r.getLong(2) == want)
    }
  }
}
