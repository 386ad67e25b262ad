package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: Johnson-Lindenstrauss sign-matrix
  * projection — `jl_project(vec, signs)` maps a FLOAT vector through a
  * literal ±1 matrix (ARRAY<ARRAY<INT>>, one row per output dim) to
  * ARRAY<DOUBLE>, with emb_rand_proj's EXACT fixed-point semantics:
  * out[j] = Σ_i floor(vec[i]·1e6)·signs[j][i], then /1e6 — each term
  * an exact integer, so the sum is order-independent and the single
  * closing division correctly rounded, bit-identical to the DuckDB
  * replay.
  *
  * Rationale: the first form of emb_rand_proj spelled this as 16
  * `aggregate(zip_with(...))` columns — higher-order functions, which
  * Spark evaluates INTERPRETED, one boxed lambda call per (row ×
  * outDim × component). At the 100× slice (200 k × 16 × 64 ≈ 2·10⁸
  * lambda invocations) that costed 84 s for what is arithmetically a
  * ~10⁸-flop map. This fused loop runs inside whole-stage codegen:
  * the 100× wall drops to scan speed, and the "zero-shuffle codegen
  * map" the operator always claimed becomes true.
  */
case class JlProject(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(IntegerType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, ARRAY<ARRAY<INT>>), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "jl_project"

  override def nullSafeEval(v: Any, s: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val signs = s.asInstanceOf[ArrayData]
    val outDims = signs.numElements()
    val out = new Array[Double](outDims)
    var j = 0
    while (j < outDims) {
      val row = signs.getArray(j)
      val n = math.min(vec.numElements(), row.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += math.floor(vec.getFloat(i).toDouble * 1e6) * row.getInt(i)
        i += 1
      }
      out(j) = acc / 1e6
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, signs) => {
      val outDims = ctx.freshName("outDims")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val row = ctx.freshName("row")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val arrayData = classOf[ArrayData].getName
      val genericArrayData = classOf[GenericArrayData].getName
      s"""
         |int $outDims = $signs.numElements();
         |double[] $out = new double[$outDims];
         |for (int $j = 0; $j < $outDims; $j++) {
         |  $arrayData $row = $signs.getArray($j);
         |  int $n = java.lang.Math.min($vec.numElements(), $row.numElements());
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += java.lang.Math.floor((double) $vec.getFloat($i) * 1e6) * $row.getInt($i);
         |  }
         |  $out[$j] = $acc / 1e6;
         |}
         |${ev.value} = new $genericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JlProject =
    copy(left = newLeft, right = newRight)
}
