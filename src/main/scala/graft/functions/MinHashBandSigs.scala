package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: banded MinHash signatures of a string
  * set — `minhash_band_sigs(shingles, nBands, rowsPerBand)` computes
  * `nBands × rowsPerBand` min-hashes and folds each band's rows into
  * one 64-bit band signature. Returns ARRAY<BIGINT> of length nBands
  * (EMPTY for an empty/missing shingle set, so `posexplode` emits no
  * bucket rows for contentless documents instead of colliding them
  * all in one bucket).
  *
  * Why fused: the declarative form explodes the shingle set and
  * aggregates 64 `min(xxhash64(concat(seed, shingle)))` columns —
  * correct, but it shuffles every (doc, shingle) row and hashes each
  * shingle 64× through a fresh string concat (93M string hashes +
  * allocations at sf0.1). Here each shingle's bytes are hashed ONCE
  * (the same XXH64 the builtin uses, straight off the UTF8String
  * bytes, no concat) and the 64 per-seed values derive from that one
  * hash by splitmix64 finalization — the standard one-hash-many-mixes
  * MinHash construction. The whole signature computation is one
  * codegen loop in the scan projection; nothing per-shingle is
  * shuffled at all.
  *
  * Like [[BandSignatures]], this makes no cross-engine bit-identity
  * promise: LSH candidates are re-verified with the exact Jaccard, so
  * the OUTPUT is independent of the hash family (any universal family
  * with the same banding has the same recall bound).
  */
object MinHashBandSigs {
  /** splitmix64 finalizer: mixes the base shingle hash with a per-seed
    * offset; also used driver-side in tests.
    */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Shared interpreted/codegen kernel (codegen emits one call here —
    * a single fused loop either way, no per-shingle expression
    * machinery). `binary` selects the element accessor: the set may be
    * raw shingle STRINGS or their 16-byte window_md5s DIGESTS — a
    * different byte stream, hence a different (equally universal)
    * hash family, which the no-bit-identity contract above already
    * covers.
    */
  def eval(sh: ArrayData, nBands: Int, rows: Int): Array[Long] =
    eval(sh, nBands, rows, binary = false)

  def eval(sh: ArrayData, nBands: Int, rows: Int, binary: Boolean): Array[Long] = {
    val n = sh.numElements()
    if (n == 0) return Array.emptyLongArray
    val k = nBands * rows
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = if (binary) {
        val bs = sh.getBinary(i)
        org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bs, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bs.length, 42L)
      } else {
        val s = sh.getUTF8String(i)
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      }
      var j = 0
      while (j < k) {
        val v = mix(h ^ (j.toLong * 0xbf58476d1ce4e5b9L))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val sigs = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var acc = 0x9e3779b97f4a7c15L
      var r = 0
      while (r < rows) { acc = mix(acc ^ mins(b * rows + r)); r += 1 }
      sigs(b) = acc
      b += 1
    }
    sigs
  }
}

case class MinHashBandSigs(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(BinaryType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<STRING|BINARY>, INT, INT), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  private lazy val binaryElems: Boolean = first.dataType match {
    case ArrayType(BinaryType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_sigs"

  override def nullSafeEval(shv: Any, nbv: Any, rbv: Any): Any = {
    val sh = shv.asInstanceOf[ArrayData]
    val nBands = nbv.asInstanceOf[Int]
    val rows = rbv.asInstanceOf[Int]
    new GenericArrayData(
      MinHashBandSigs.eval(sh, nBands, rows, binaryElems))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, nBands, rows) => {
      val helper = MinHashBandSigs.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val genericArrayData = classOf[GenericArrayData].getName
      s"""
         |${ev.value} = new $genericArrayData($helper.eval($sh, $nBands, $rows, $binaryElems));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinHashBandSigs =
    copy(first = newFirst, second = newSecond, third = newThird)
}
