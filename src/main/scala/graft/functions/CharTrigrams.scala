package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_trigrams(txt)` → array<string> of the DISTINCT character
  * trigrams of `txt` (3-code-point sliding windows), first-occurrence
  * order — exactly
  * `array_distinct(transform(sequence(1, length(txt) - 2),
  *    i -> substring(txt, i, 3)))`
  * (Spark's substring/length address code points, so the window slides
  * by code point; a UTF-16 slider would split surrogate pairs).
  * Empty for texts shorter than 3 code points.
  *
  * Why it exists (scale): each `substring(txt, i, 3)` seeks code
  * point i FROM THE STRING START — the transform chain is O(len²)
  * per document, plus an interpreted lambda eval per position and an
  * O(len²)-comparison array_distinct. Here one pass records the
  * code-point byte offsets and each trigram is an O(1) slice into a
  * hash set. The trigram-containment index construction
  * ([[graft.operators.TrigramIndex]]) is unchanged — this is the same
  * derivation, not a semantics change (the doc_substr_search oracle
  * stays the direct contains() scan).
  */
case class CharTrigrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_trigrams"

  override def nullSafeEval(s: Any): Any =
    CharTrigrams.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharTrigrams.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharTrigrams =
    copy(child = newChild)
}

object CharTrigrams {
  def compute(t: UTF8String): GenericArrayData = {
    val b = t.getBytes
    val nb = b.length
    // byte offsets of each code point start (UTF-8 lead-byte walk —
    // the same boundaries UTF8String.substring seeks)
    var n = 0
    var p = 0
    while (p < nb) {
      n += 1
      p += UTF8String.numBytesForFirstByte(b(p))
    }
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val idx = new Array[Int](n + 1)
    var k = 0
    p = 0
    while (p < nb) {
      idx(k) = p
      k += 1
      p += UTF8String.numBytesForFirstByte(b(p))
    }
    idx(n) = nb
    val seen = new java.util.LinkedHashSet[UTF8String]((n - 2) * 2)
    var i = 0
    while (i + 3 <= n) {
      seen.add(UTF8String.fromBytes(b, idx(i), idx(i + 3) - idx(i)))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}
