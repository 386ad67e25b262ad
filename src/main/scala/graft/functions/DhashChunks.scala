package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `dhash_chunks(txt)` → array<int> [c0, c1, c2, c3]: the 4 × 16-bit
  * dHash sketch chunks of the 9×8 pseudo-raster pixel (r, c) =
  * codePoint(text[(r·9 + c) mod len]) — bit k of chunk c set when
  * p[j/8·9 + j%8] > p[j/8·9 + j%8 + 1] for j = c·16 + k — in ONE pass.
  *
  * Why it exists (scale): the declarative spelling projected 72
  * separate `ascii(substring(text, (i % length(text)) + 1, 1))`
  * columns (72 independent code-point seeks per row, each O(i) from
  * the string start) and then 64 CASE comparisons — measured as most
  * of the mm_phash_dedup / mm_text_image_pairs walls (the collision
  * join sees only 14.6 k pairs at sf0.1). Here the code points decode
  * once (Pcm.codePoints — the same toString/codePointAt composition
  * Spark's Ascii + code-point Substring evaluate, so values are
  * bit-identical; the MultimodalOpsSpec non-BMP fixtures pin it) and
  * all 64 gradient bits come from one integer loop. The DuckDB oracle
  * keeps the declarative spelling, so cross-engine equivalence is
  * re-proven per run.
  *
  * Empty input returns [0, 0, 0, 0]; both call sites filter
  * length(text) > 0 first (the declarative `i % length` is undefined
  * there).
  */
case class DhashChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "dhash_chunks"

  override def nullSafeEval(s: Any): Any =
    DhashChunks.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DhashChunks.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DhashChunks =
    copy(child = newChild)
}

object DhashChunks {
  def compute(t: UTF8String): GenericArrayData = {
    val cps = Pcm.codePoints(t)
    val n = cps.length
    if (n == 0)
      return new GenericArrayData(Array[Any](0, 0, 0, 0))
    // p(0..71): raster pixels; indices wrap at the code-point count
    // exactly like the declarative `i % length(text)`
    val p = new Array[Int](72)
    var i = 0
    while (i < 72) { p(i) = cps(i % n); i += 1 }
    val out = new Array[Any](4)
    var c = 0
    while (c < 4) {
      var chunk = 0
      var k = 0
      while (k < 16) {
        val j = c * 16 + k
        val base = (j / 8) * 9 + (j % 8)
        if (p(base) > p(base + 1)) chunk |= 1 << k
        k += 1
      }
      out(c) = chunk
      c += 1
    }
    new GenericArrayData(out)
  }
}
