package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: `nearest_cells(vec, centers, nProbe)` —
  * the `nProbe` nearest centroid indices of a FLOAT vector by squared
  * euclidean distance (ties broken by lower index). Returns
  * ARRAY<INT>, nearest first.
  *
  * This is the IVF cell-assignment / probe-list kernel: the centroid
  * matrix is a LITERAL (a coarse quantizer is k×dim floats — data a
  * plan can carry), so assignment is one codegen loop inside the scan
  * projection. The alternative — crossJoin against a centroid table +
  * a per-vector window rank — shuffles k rows per vector to rank them;
  * this shuffles nothing.
  */
object NearestCells {
  /** Shared interpreted/codegen kernel. */
  def eval(vec: ArrayData, centers: ArrayData, nProbe: Int): Array[Int] = {
    val k = centers.numElements()
    val p = math.min(nProbe, k)
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      val ctr = centers.getArray(c)
      val n = math.min(vec.numElements(), ctr.numElements())
      var d = 0.0
      var j = 0
      while (j < n) {
        val diff = vec.getFloat(j).toDouble - ctr.getFloat(j).toDouble
        d += diff * diff
        j += 1
      }
      dists(c) = d
      c += 1
    }
    val out = new Array[Int](p)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < p) {
      var best = -1
      var bestD = Double.MaxValue
      var i = 0
      while (i < k) {
        if (!taken(i) && dists(i) < bestD) { best = i; bestD = dists(i) }
        i += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    out
  }
}

case class NearestCells(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, ARRAY<ARRAY<FLOAT>>, INT), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def nullSafeEval(v: Any, cs: Any, np: Any): Any =
    new GenericArrayData(NearestCells.eval(
      v.asInstanceOf[ArrayData], cs.asInstanceOf[ArrayData], np.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, centers, np) => {
      val helper = NearestCells.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val genericArrayData = classOf[GenericArrayData].getName
      s"""
         |${ev.value} = new $genericArrayData($helper.eval($vec, $centers, $np));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCells =
    copy(first = newFirst, second = newSecond, third = newThird)
}
