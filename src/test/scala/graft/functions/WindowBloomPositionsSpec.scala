package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** window_bloom_positions must equal the declarative spelling —
  * distinct n-word windows (grams8 semantics) × 4 salted bloomPos
  * values `conv(substring(md5(g || '#' || salt), 1, 6), 16, 10)` —
  * position-for-position in first-occurrence window order.
  */
class WindowBloomPositionsSpec extends SparkSpec {

  private def reference(txt: String, n: Int): Seq[Long] = {
    val ws = txt.split(" ", -1).toSeq
    if (ws.length < n) Seq.empty
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      ws.sliding(n).map(_.mkString(" ")).toSeq.distinct.flatMap { g =>
        (0 to 3).map { s =>
          md.reset()
          val d = md.digest((g + "#" + s).getBytes("UTF-8"))
          ((d(0) & 0xFFL) << 16) | ((d(1) & 0xFFL) << 8) | (d(2) & 0xFFL)
        }
      }
    }
  }

  private val cases = Seq(
    ("", 2), ("a b", 2), ("a b c d e f g h i j", 8),
    ("x " * 20 + "y", 8), (("dup gram " * 15).trim, 2),
    ("a  b  c d e f g h", 8), ("é 語 a b c d e f g", 8))

  test("helper equals the plain-Scala reference") {
    for ((txt, n) <- cases) {
      val got = WindowBloomPositions.compute(UTF8String.fromString(txt), n)
      val longs = (0 until got.numElements()).map(got.getLong)
      assert(longs == reference(txt, n), s"mismatch for '$txt' n=$n")
    }
  }

  test("plan path equals the declarative md5/conv spelling") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = cases.map(_._1).toDF("txt")
    val rows = df.select(
      call_function("window_bloom_positions", col("txt"), lit(3)).as("kernel"),
      expr("""flatten(transform(
                array_distinct(CASE WHEN size(split(txt, ' ')) >= 3
                  THEN transform(sequence(0, size(split(txt, ' ')) - 3),
                         i -> array_join(slice(split(txt, ' '), i + 1, 3), ' '))
                  ELSE CAST(array() AS ARRAY<STRING>) END),
                g -> transform(sequence(0, 3),
                  s -> CAST(conv(substring(md5(concat(g, '#', CAST(s AS STRING))), 1, 6), 16, 10) AS BIGINT))))""")
        .as("decl")).collect()
    for (r <- rows)
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("random fuzz vs the reference") {
    val rnd = new scala.util.Random(13)
    val pieces = Seq("a", "bb", "c", " ", " ", "0", "é")
    for (_ <- 1 to 300) {
      val txt = Seq.fill(rnd.nextInt(60))(pieces(rnd.nextInt(pieces.length))).mkString
      val n = 1 + rnd.nextInt(5)
      val got = WindowBloomPositions.compute(UTF8String.fromString(txt), n)
      val longs = (0 until got.numElements()).map(got.getLong)
      assert(longs == reference(txt, n), s"mismatch for '$txt' n=$n")
    }
  }
}
