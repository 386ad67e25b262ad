package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling n-word-window md5: `window_md5s(txt, n)` ==
  * `array_distinct(transform(sequence(0, size(ws) - n),
  *    i -> md5(array_join(slice(ws, i + 1, n), ' '))))`
  * over `ws = split(txt, ' ')`, except each digest is returned as
  * 16-byte BINARY instead of the 32-char hex string (the callers
  * group/join on the digest and never emit it, and
  * `hex(digest)` = the old string when one ever is emitted). Returns
  * an empty array when the text has fewer than n words — the
  * `size(ws) >= n` guard folded in.
  *
  * Why it exists (scale): the HOF spelling dominates
  * doc_substring_dedup's wall — SubstringProfile attributed ~24 of
  * 33 s at the 100× slice to the split + interpreted-lambda chain
  * (slice/array_join allocate every window as a fresh string, the
  * lambda runs interpreted per window) while the md5 arithmetic
  * itself is ~1 s. The identity `array_join(split(x,' '),' ') == x`
  * means every n-word window IS a contiguous byte range of the input
  * (split boundaries are single spaces, and empty words re-join to
  * the original double-space runs), so this kernel finds the word
  * start offsets in one scan and feeds each window's byte range
  * straight to the digest — zero string construction, and the
  * digests ship at half the bytes (16 vs 32).
  *
  * Exactness: md5 over the UTF-8 bytes of the window substring is
  * byte-identical to md5 over the constructed join string (same
  * bytes); distinctness over 16-byte digests equals distinctness
  * over their hex spellings (bijective); first-occurrence order is
  * preserved like array_distinct. The DuckDB oracles keep the
  * string-built spelling — same digests, same groups.
  */
case class WindowMd5s(left: Expression, right: Expression,
                      dedup: Boolean = true)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, INT), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String =
    if (dedup) "window_md5s" else "window_md5s_all"

  override def nullSafeEval(t: Any, n: Any): Any =
    WindowMd5s.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int], dedup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.WindowMd5s.compute($t, $n, $dedup)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowMd5s =
    copy(left = newLeft, right = newRight)
}

object WindowMd5s {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(t: UTF8String, n: Int, dedup: Boolean): GenericArrayData = {
    val b = t.getBytes
    // word k of split(txt, ' ') starts at starts(k); a window of n
    // words [w, w+n) is the byte range [starts(w), starts(w+n) - 1)
    // (the -1 drops the separating space), or [starts(w), b.length)
    // for the last window
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
    val md = digest.get()
    if (dedup) {
      val seen = new java.util.LinkedHashSet[java.nio.ByteBuffer](nWin * 2)
      w = 0
      while (w < nWin) {
        val from = starts(w)
        val until = starts(w + n) - 1
        md.reset()
        md.update(b, from, until - from)
        seen.add(java.nio.ByteBuffer.wrap(md.digest()))
        w += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next().array(); k += 1 }
      new GenericArrayData(out)
    } else {
      // window_md5s_all: one digest per window, duplicates and
      // positions preserved (the winnowing input shape)
      val out = new Array[Any](nWin)
      w = 0
      while (w < nWin) {
        val from = starts(w)
        val until = starts(w + n) - 1
        md.reset()
        md.update(b, from, until - from)
        out(w) = md.digest()
        w += 1
      }
      new GenericArrayData(out)
    }
  }
}
