package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._

/** window_md5s must equal the HOF spelling it replaces —
  * `array_distinct(transform(sequence(0, size(ws) - n),
  *   i -> md5(array_join(slice(ws, i + 1, n), ' '))))` over
  * `split(txt, ' ')` with the `size(ws) >= n` guard — digest-for-
  * digest (hex-decoded) and in the same first-occurrence order, on
  * short docs, repeated windows, double-space runs, empty strings
  * and multi-byte UTF-8.
  */
class WindowMd5sSpec extends SparkSpec {

  private def reference(txt: String, n: Int): Seq[String] = {
    val ws = txt.split(" ", -1).toSeq
    if (ws.length < n) Seq.empty
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      ws.sliding(n).map { win =>
        md.reset()
        md.digest(win.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }.toSeq.distinct
    }
  }

  private val cases = Seq(
    ("", 2), (" ", 2), ("a", 1), ("a b", 2), ("a b c d", 2),
    ("a  b  c", 2), ("x " * 30 + "y", 12),
    (Seq.fill(5)("ab cd ef gh").mkString(" "), 12),
    (("dup word " * 20).trim, 3), // repeated windows -> distinct collapses
    ("héllo wörld 日本 語 a b c d e f g h i j", 4),
    (("w" + " w" * 99), 12))

  test("helper equals the HOF reference on edge cases") {
    for ((txt, n) <- cases) {
      val got = WindowMd5s.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(txt), n, dedup = true)
      val hex = (0 until got.numElements())
        .map(i => got.getBinary(i).map("%02x".format(_)).mkString)
      assert(hex == reference(txt, n), s"mismatch for '$txt' n=$n")
      // the _all form keeps duplicates and positions: its distinct
      // (first occurrence order) must equal the dedup form
      val all = WindowMd5s.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(txt), n, dedup = false)
      val allHex = (0 until all.numElements())
        .map(i => all.getBinary(i).map("%02x".format(_)).mkString)
      assert(allHex.distinct == hex, s"_all/distinct mismatch for '$txt' n=$n")
      val ws = txt.split(" ", -1)
      assert(all.numElements() == math.max(0, ws.length - n + 1) ||
        (ws.length < n && all.numElements() == 0))
    }
  }

  test("plan path equals the HOF spelling run by Spark itself") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = cases.map(_._1).toDF("txt")
    val rows = df.select(
      transform(call_function("window_md5s", col("txt"), lit(3)),
        b => lower(hex(b))).as("kernel"),
      coalesce(when(size(split(col("txt"), " ")) >= 3, expr(
        """array_distinct(transform(sequence(0, size(split(txt, ' ')) - 3),
             i -> md5(array_join(slice(split(txt, ' '), i + 1, 3), ' '))))""")),
        expr("CAST(array() AS ARRAY<STRING>)")).as("hof")).collect()
    for (r <- rows)
      assert(r.getSeq[String](0) == r.getSeq[String](1))
  }

  test("random fuzz: kernel == reference") {
    val rnd = new scala.util.Random(7)
    val pieces = Seq("a", "bb", "ccc", " ", " ", "é", "語", "0")
    for (_ <- 1 to 300) {
      val txt = Seq.fill(rnd.nextInt(80))(
        pieces(rnd.nextInt(pieces.length))).mkString
      val n = 1 + rnd.nextInt(6)
      val got = WindowMd5s.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(txt), n, dedup = true)
      val hex = (0 until got.numElements())
        .map(i => got.getBinary(i).map("%02x".format(_)).mkString)
      assert(hex == reference(txt, n), s"mismatch for '$txt' n=$n")
    }
  }
}
