package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: `adc_sum(tbl, codes)` — the
  * asymmetric-distance-computation lookup sum of product quantization:
  * `Σ_m tbl[m][codes[m]]`, folded in ascending subspace order as
  * DOUBLE (the same sequential left fold as
  * `aggregate(sequence(…))` / DuckDB's
  * `list_sum(list_transform(range(…)))`, so the IVF-PQ replay oracle
  * stays bit-identical).
  *
  * Why native: this runs once per CANDIDATE PAIR of the ANN join —
  * the hottest loop of the IVF-PQ pipeline. Spark's higher-order
  * `aggregate`/`transform` are interpreted per element (lambda
  * dispatch + boxing); this kernel is one codegen'd flat loop of
  * array reads.
  */
object AdcSum {
  /** Shared interpreted/codegen kernel. */
  def eval(tbl: ArrayData, codes: ArrayData): Double = {
    val m = math.min(tbl.numElements(), codes.numElements())
    var acc = 0.0
    var i = 0
    while (i < m) {
      acc += tbl.getArray(i).getDouble(codes.getInt(i))
      i += 1
    }
    acc
  }
}

case class AdcSum(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<ARRAY<DOUBLE>>, ARRAY<INT>), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_sum"

  override def nullSafeEval(tbl: Any, codes: Any): Any =
    AdcSum.eval(tbl.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tbl, codes) => {
      val helper = AdcSum.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = $helper.eval($tbl, $codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)
}
