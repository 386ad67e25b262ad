package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass normalizer: `squash_alnum(s)` ==
  * `regexp_replace(regexp_replace(s, '[^a-z0-9 ]', ''), ' +', ' ')`
  * — drop every character outside `[a-z0-9 ]`, then collapse space
  * runs to one space (no trimming, exactly like the regex pair).
  *
  * Why it exists (scale): this normalization prefixes the whole
  * fingerprint/fuzzy-dedup family (doc_fingerprint,
  * doc_dup_rate_by_source, doc_fuzzy_match, the n-gram/winnow gram
  * builders). As two java.util.regex passes it costs more than the
  * md5 it feeds — FingerprintProfile measured 13.0 s of
  * doc_fingerprint's 15.3 s scan-side wall at the 100× slice in the
  * two regex passes alone (each pays per-row Matcher state, a
  * StringBuffer rebuild and a UTF-16 round-trip). One byte-level pass
  * over the UTF8String does the same work allocation-free.
  *
  * Byte-level exactness: the kept alphabet is pure ASCII, and every
  * byte of a multi-byte UTF-8 code point is ≥ 0x80, so skipping
  * non-matching BYTES removes exactly the non-matching CODE POINTS —
  * the output equals the regex composition for any valid UTF-8 input
  * (callers lowercase first, as before; `lower` stays the builtin so
  * Unicode case folding is unchanged). The space-collapse flag only
  * resets on an emitted non-space, so removed characters between
  * spaces still merge their run — matching the outer regex, which
  * runs AFTER removal.
  */
case class SquashAlnum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "squash_alnum"

  override def nullSafeEval(s: Any): Any =
    SquashAlnum.squash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SquashAlnum.squash($c)")

  override protected def withNewChildInternal(newChild: Expression): SquashAlnum =
    copy(child = newChild)
}

object SquashAlnum {
  /** Shared by interpreted eval and codegen (the generated code calls
    * this static method directly, staying inside whole-stage codegen
    * like the trim/pad builtins do with their UTF8String helpers).
    */
  def squash(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var m = 0
    var lastSpace = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        out(m) = b; m += 1; lastSpace = false
      } else if (b == ' ') {
        if (!lastSpace) { out(m) = ' '; m += 1 }
        lastSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, m)
  }
}
