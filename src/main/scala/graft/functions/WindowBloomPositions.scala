package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused gram → Bloom-position pipeline:
  * `window_bloom_positions(txt, n)` builds the DISTINCT n-word
  * windows of `txt` (exactly `grams8`'s semantics — string-content
  * distinct, first-occurrence order, empty under n words) and emits,
  * flat, the 4 salted Bloom positions of each kept window:
  * positions `[4·i .. 4·i+3]` belong to window i, and position j of
  * window g is the first-6-hex-digit value of
  * `md5(g || '#' || j)` — bit-identical to
  * [[graft.operators.TextDedupQueries.bloomPos]] and the DuckDB
  * replay (the first 6 hex digits are the digest's top 3 bytes).
  *
  * Why it exists (scale): the declarative spelling pays the HOF gram
  * build (slice/array_join/lambda per window) plus FOUR
  * Md5/concat/conv expression evaluations per gram row — ~106 M
  * digest+hex-parse round-trips at the 100× slice, each converting
  * UTF8String → hex string → substring → base-16 parse. Here each
  * window is digested in place off the text bytes (the
  * `array_join(split(x,' '),' ') == x` contiguous-range identity,
  * see [[WindowMd5s]]), the salt suffix is two appended bytes, and
  * the position is read straight from the digest's first 3 bytes.
  *
  * Distinctness is on the WINDOW BYTES (a ByteBuffer set over the
  * text's byte ranges — no per-window string materializes), so it
  * equals the oracle's string list_distinct exactly, not merely
  * md5-collision-equally.
  */
case class WindowBloomPositions(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, INT), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_bloom_positions"

  override def nullSafeEval(t: Any, n: Any): Any =
    WindowBloomPositions.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.WindowBloomPositions.compute($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowBloomPositions =
    copy(left = newLeft, right = newRight)
}

object WindowBloomPositions {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(t: UTF8String, n: Int): GenericArrayData = {
    val b = t.getBytes
    var nWords = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') nWords += 1; i += 1 }
    val nWin = nWords - n + 1
    if (nWin <= 0) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nWords + 1)
    var w = 1
    i = 0
    while (i < b.length) {
      if (b(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(nWords) = b.length + 1
    // distinct on the window BYTE CONTENT (== the oracle's string
    // list_distinct), first-occurrence order; ByteBuffer slices view
    // the original array — nothing copies until a window is kept
    val seen = new java.util.LinkedHashSet[java.nio.ByteBuffer](nWin * 2)
    w = 0
    while (w < nWin) {
      val from = starts(w)
      val until = starts(w + n) - 1
      seen.add(java.nio.ByteBuffer.wrap(b, from, until - from).slice())
      w += 1
    }
    val md = digest.get()
    val out = new Array[Any](seen.size * 4)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      val win = it.next()
      var s = 0
      while (s < 4) {
        md.reset()
        // win is a slice over b: absolute offset = arrayOffset+position
        md.update(b, win.arrayOffset() + win.position(), win.remaining())
        md.update('#'.toByte)
        md.update(('0' + s).toByte)
        val d = md.digest()
        out(k) = (((d(0) & 0xFFL) << 16) | ((d(1) & 0xFFL) << 8) | (d(2) & 0xFFL))
        k += 1
        s += 1
      }
    }
    new GenericArrayData(out)
  }
}
