package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: QUERY-AWARE multi-probe LSH probe
  * signatures — `band_probes(vec, planes, bits, nProbes)` computes the
  * same banded sign signatures as [[BandSignatures]] and, per band,
  * emits the `nProbes` best PERTURBATION SETS (Lv et al., multi-probe
  * LSH): among the [[BandProbes.ProbeWidth]] = 4 sign bits with the
  * smallest |plane·vec| margin — the bits the query most plausibly has
  * on the wrong side — every subset is scored by the sum of flipped
  * margins and the lowest-scoring subsets (empty set = home bucket
  * first; ties broken by ascending subset mask) become probe
  * signatures. Multi-bit sets matter: at moderate similarity the
  * EXPECTED number of wrong bits per band exceeds one, so single-bit
  * flips cannot reach the neighbor no matter how many probes are
  * spent, while low-margin pairs/triples carry real collision mass at
  * the same budget. The result is a flat ARRAY<BIGINT> of length
  * `nBands × nProbes` in band-major order (`idx / nProbes` recovers
  * the band after posexplode).
  *
  * The dot accumulation is the identical ascending-index double fold
  * as BandSignatures/dotSql, so a DuckDB replay ranks the same margins
  * and scores the same subsets, bit for bit.
  */
case class BandProbes(first: Expression, second: Expression,
                      third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _),
            IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, ARRAY<ARRAY<FLOAT>>, INT, INT), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString}, ${d.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_probes"

  override def nullSafeEval(v: Any, ps: Any, b: Any, np: Any): Any =
    BandProbes.compute(v.asInstanceOf[ArrayData], ps.asInstanceOf[ArrayData],
      b.asInstanceOf[Int], np.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, planes, bits, nProbes) => {
      // One static call per row into the same compiled kernel eval
      // uses: the subset scoring/sorting is real control flow, and a
      // hand-maintained Java-string copy of it is a divergence bug
      // waiting to happen. The call sits inside the codegen'd
      // projection (no interpreted expression tree), which is what
      // keeps the stage in whole-stage codegen.
      val kernel = "graft.functions.BandProbes" + "$.MODULE$"
      s"${ev.value} = $kernel.compute($vec, $planes, $bits, $nProbes);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): BandProbes =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object BandProbes {
  /** Number of lowest-margin candidate bits whose subsets form the
    * perturbation-set space (2^ProbeWidth sets scored per band).
    */
  val ProbeWidth = 4

  /** The kernel: see the class doc. Shared verbatim by interpreted
    * eval and codegen.
    *
    * Argument clamping: this expression is registered on the session
    * and reachable from raw user SQL (Tables.registerSqlViews), so
    * degenerate arguments must fail soft, not crash the task —
    * `bits <= 0` would divide by zero, `bits < ProbeWidth` would leave
    * a -1 selection index, `nProbes > 2^width` would overrun the
    * subset order. Non-positive bits/nProbes yield an empty array; the
    * probe width clamps to `min(ProbeWidth, bits)` and nProbes to the
    * subset count. The engine's own ANN path (EmbeddingQueries) passes
    * bits=10 (the corpus-sized auto scales it up to 24) and
    * nProbes≤16 = 2^ProbeWidth — untouched by the clamp, so the DuckDB
    * oracle replay is unaffected.
    */
  def compute(vec: ArrayData, planes: ArrayData, bits: Int, nProbes: Int): ArrayData = {
    if (bits <= 0 || nProbes <= 0) return new GenericArrayData(new Array[Long](0))
    val w = math.min(ProbeWidth, bits)
    val np = math.min(nProbes, 1 << w)
    val nBands = planes.numElements() / bits
    val out = new Array[Long](nBands * np)
    val margins = new Array[Double](bits)
    val lowBits = new Array[Int](w)
    val used = new Array[Boolean](bits)
    val scores = new Array[Double](1 << w)
    val order = new Array[Int](1 << w)
    var band = 0
    while (band < nBands) {
      var sig = 0L
      var i = 0
      while (i < bits) {
        val plane = planes.getArray(band * bits + i)
        val n = math.min(vec.numElements(), plane.numElements())
        var dot = 0.0
        var j = 0
        while (j < n) {
          dot += vec.getFloat(j).toDouble * plane.getFloat(j).toDouble
          j += 1
        }
        if (dot >= 0.0) sig |= (1L << i)
        margins(i) = math.abs(dot)
        i += 1
      }
      // the w lowest-margin bits, ascending margin (ties: lower index)
      java.util.Arrays.fill(used, false)
      var k = 0
      while (k < w) {
        var best = -1
        var bestv = Double.MaxValue
        var m = 0
        while (m < bits) {
          if (!used(m) && margins(m) < bestv) { bestv = margins(m); best = m }
          m += 1
        }
        used(best) = true
        lowBits(k) = best
        k += 1
      }
      // score every subset mask; insertion-sort masks by (score, mask)
      var mask = 0
      while (mask < (1 << w)) {
        var sc = 0.0
        var t = 0
        while (t < w) {
          if ((mask & (1 << t)) != 0) sc += margins(lowBits(t))
          t += 1
        }
        scores(mask) = sc
        order(mask) = mask
        mask += 1
      }
      var a = 1
      while (a < (1 << w)) {
        val cur = order(a)
        var bpos = a - 1
        while (bpos >= 0 && (scores(order(bpos)) > scores(cur) ||
          (scores(order(bpos)) == scores(cur) && order(bpos) > cur))) {
          order(bpos + 1) = order(bpos)
          bpos -= 1
        }
        order(bpos + 1) = cur
        a += 1
      }
      k = 0
      while (k < np) {
        var flip = 0L
        var t = 0
        while (t < w) {
          if ((order(k) & (1 << t)) != 0) flip |= (1L << lowBits(t))
          t += 1
        }
        out(band * np + k) = sig ^ flip
        k += 1
      }
      band += 1
    }
    new GenericArrayData(out)
  }
}
