package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_counts(txt)` → array<long> of 29 elements: counts of
  * 'a'..'z' (0..25), ' ' (26), a zero placeholder the caller derives
  * k27 = n − Σk from (27), and the total CODE POINT count n (28) —
  * the doc_char_entropy alphabet in ONE pass.
  *
  * Why it exists (scale): the declarative spelling computed each
  * count as `length(text) - length(replace(text, c, ''))` — 27 full
  * scans AND 27 temporary string materializations per document. Here
  * one pass over the UTF-8 bytes counts the ASCII alphabet directly
  * (an ASCII byte can never occur inside a multi-byte sequence —
  * continuation bytes have the high bit set) and counts code points
  * off the lead bytes. The entropy TERMS (the IEEE-sensitive part)
  * stay in the shared SQL fragment, evaluated over these exact
  * integers identically in both engines.
  */
case class CharCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_counts"

  override def nullSafeEval(s: Any): Any =
    CharCounts.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharCounts =
    copy(child = newChild)
}

object CharCounts {
  def compute(t: UTF8String): GenericArrayData = {
    val b = t.getBytes
    val counts = new Array[Long](29)
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c >= 'a' && c <= 'z') counts(c - 'a') += 1
      else if (c == ' ') counts(26) += 1
      // code points: every byte except UTF-8 continuations starts one
      if ((c & 0xC0) != 0x80) counts(28) += 1
      i += 1
    }
    val out = new Array[Any](29)
    i = 0
    while (i < 29) { out(i) = counts(i); i += 1 }
    new GenericArrayData(out)
  }
}
