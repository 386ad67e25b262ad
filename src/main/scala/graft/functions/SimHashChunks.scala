package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash_chunks(txt)` → array<int> [c0, c1, c2, c3, has_tokens]:
  * the doc_simhash 16-bit sketch chunks — bit k of chunk c set when
  * vote c·16+k of [[SimHashVotes]] is > 0 — plus a 0/1 flag
  * reproducing the declarative spelling's drop of zero-token docs.
  *
  * Why it exists (scale): the pipeline already computed votes in one
  * pass (SimHashVotes) but then projected them into 64 separate
  * `s0..s63` columns feeding 64 CASE expressions — a 65-column
  * projection per row whose expression count, not the data, dominated
  * the row's cost (the mm_phash_dedup raster lesson, vote edition).
  * The packing here reads the SAME vote array ([[SimHashVotes.compute]]
  * verbatim, so the exactness argument carries over unchanged) and
  * emits the 4 chunk ints directly; the bucket join, Hamming filter
  * and the DuckDB oracle's declarative spelling are untouched.
  */
case class SimHashChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "simhash_chunks"

  override def nullSafeEval(s: Any): Any =
    SimHashChunks.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashChunks.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashChunks =
    copy(child = newChild)
}

object SimHashChunks {
  def compute(t: UTF8String): GenericArrayData = {
    val votes = SimHashVotes.compute(t)
    val out = new Array[Any](5)
    var c = 0
    while (c < 4) {
      var chunk = 0
      var k = 0
      while (k < 16) {
        if (votes.getLong(c * 16 + k) > 0L) chunk |= 1 << k
        k += 1
      }
      out(c) = chunk
      c += 1
    }
    out(4) = if (votes.getLong(64) > 0L) 1 else 0
    new GenericArrayData(out)
  }
}
