package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Argument-clamping contract of the multi-probe kernel: band_probes
  * is registered on the session and reachable from RAW user SQL
  * (Tables.registerSqlViews), so degenerate bits/nProbes arguments
  * must fail soft (empty/clamped result), never crash the task with a
  * divide-by-zero or array overrun.
  */
class BandProbesSpec extends AnyFunSuite {

  private def vec(xs: Double*): GenericArrayData =
    new GenericArrayData(xs.map(_.toFloat).toArray)

  private def planes(dim: Int, n: Int): GenericArrayData =
    new GenericArrayData(Array.tabulate(n) { i =>
      vec(Seq.tabulate(dim)(j => if (j == i % dim) 1.0 else 0.25): _*): Any
    })

  test("well-formed arguments: nBands × nProbes signatures, home bucket first") {
    val out = BandProbes.compute(vec(1, -2, 3, -4), planes(4, 8), 8, 4)
    assert(out.numElements() == 4) // 1 band × 4 probes
    // probe 0 is the empty perturbation set = the home signature.
    // plane i = e_{i%4} + 0.25·(1-e): dot_i = 0.75·v[i%4] + 0.25·Σv
    // with Σv = -2 → signs + - + - + - + - → bits {0,2,4,6} = 85
    assert(out.getLong(0) == 85L)
    // probes are distinct signatures
    assert((0 until 4).map(out.getLong).distinct.size == 4)
  }

  test("bits <= 0 or nProbes <= 0 yields an empty array, not a crash") {
    assert(BandProbes.compute(vec(1, 2), planes(2, 4), 0, 4).numElements() == 0)
    assert(BandProbes.compute(vec(1, 2), planes(2, 4), -3, 4).numElements() == 0)
    assert(BandProbes.compute(vec(1, 2), planes(2, 4), 2, 0).numElements() == 0)
  }

  test("bits below the probe width clamps the width (no -1 selection index)") {
    // bits=2 < ProbeWidth=4: width clamps to 2, so at most 2^2 subsets
    val out = BandProbes.compute(vec(1, 2), planes(2, 4), 2, 16)
    assert(out.numElements() == 2 * 4) // 2 bands × min(16, 2^2) probes
  }

  test("nProbes beyond the subset space clamps to 2^width (no order() overrun)") {
    val out = BandProbes.compute(vec(1, -2, 3, -4), planes(4, 8), 8, 1000)
    assert(out.numElements() == 1 * 16) // 1 band × min(1000, 2^4)
  }
}
