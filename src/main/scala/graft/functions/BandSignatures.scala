package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: banded hyperplane-LSH signatures of a
  * FLOAT vector — `band_sigs(vec, planes, bits)` dots `vec` against
  * every plane in the literal `planes` matrix and packs the sign bits
  * into `planes.length / bits` band signatures (bit i of band b is the
  * sign of plane `b*bits + i`). Returns ARRAY<BIGINT>.
  *
  * Rationale: a banded-LSH bucketing stage needs hundreds of plane
  * dots per row (e.g. 48 bands × 12 bits = 576). As separate
  * `dot_product` columns that is 576 expression trees (analysis and
  * codegen blow-up); as higher-order `aggregate(zip_with(...))` folds
  * it runs interpreted per row × plane × component (the shape that
  * made the first draft of emb_near_dup_lsh ~1000× too slow). One
  * fused loop keeps the whole signature computation inside
  * whole-stage codegen with zero per-plane allocation.
  *
  * Sign tests need no particular summation semantics (candidates are
  * re-verified with the exact cosine), so unlike CosineSimilarity /
  * DotProduct this expression makes no bit-identity promise — only
  * determinism for a fixed plane matrix.
  */
case class BandSignatures(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, ARRAY<ARRAY<FLOAT>>, INT), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_sigs"

  override def nullSafeEval(v: Any, ps: Any, b: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val planes = ps.asInstanceOf[ArrayData]
    val bits = b.asInstanceOf[Int]
    val nPlanes = planes.numElements()
    val sigs = new Array[Long](nPlanes / bits)
    var p = 0
    while (p < nPlanes) {
      val plane = planes.getArray(p)
      val n = math.min(vec.numElements(), plane.numElements())
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += vec.getFloat(j).toDouble * plane.getFloat(j).toDouble
        j += 1
      }
      if (dot >= 0.0) sigs(p / bits) |= (1L << (p % bits))
      p += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, planes, bits) => {
      val nPlanes = ctx.freshName("nPlanes")
      val sigs = ctx.freshName("sigs")
      val p = ctx.freshName("p")
      val plane = ctx.freshName("plane")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val j = ctx.freshName("j")
      val arrayData = classOf[ArrayData].getName
      val genericArrayData = classOf[GenericArrayData].getName
      s"""
         |int $nPlanes = $planes.numElements();
         |long[] $sigs = new long[$nPlanes / $bits];
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  $arrayData $plane = $planes.getArray($p);
         |  int $n = java.lang.Math.min($vec.numElements(), $plane.numElements());
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += (double) $vec.getFloat($j) * (double) $plane.getFloat($j);
         |  }
         |  if ($dot >= 0.0) $sigs[$p / $bits] |= (1L << ($p % $bits));
         |}
         |${ev.value} = new $genericArrayData($sigs);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BandSignatures =
    copy(first = newFirst, second = newSecond, third = newThird)
}
