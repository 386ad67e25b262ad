package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused simhash vote accumulator: `simhash_votes(txt)` emits
  * the 64 per-bit ±1 vote sums of a document — plus, as element 65,
  * the token count, so callers can reproduce the declarative
  * spelling's explode→groupBy behavior of DROPPING zero-token docs
  * (an all-zero vote vector cannot distinguish "no tokens" from an
  * even tie) — in one pass: for every
  * token (maximal `[a-z]+` run of `txt`) and every bit j in 0..63,
  * vote +1 if bit (j mod 4) of hex digit (j div 4) of `md5(token)` is
  * set, else −1, summed over token OCCURRENCES (not distinct tokens).
  * Bit-identical to the declarative spelling it replaces
  * (`explode(regexp_extract_all(lower(text),'[a-z]+',0))` → `md5` →
  * 16 × `conv(substring(hx,…),16,10)` → 64 conditional sums →
  * `groupBy(doc_id)`), which the DuckDB oracle keeps: hex digit d of
  * the md5 string is the high (d even) or low (d odd) nibble of
  * digest byte d/2.
  *
  * Why it exists (scale): the declarative form paid, per token
  * OCCURRENCE, a regex Matcher step, a row through an explode, one
  * md5 plus a 32-char hex-string materialization, 16 substring+conv
  * hex parses, and 64 branch evaluations — then shuffled the votes
  * through a 64-column aggregate. Here each token is digested in
  * place off the text bytes (every `[a-z]` byte is a full code point,
  * so byte runs equal regex char runs) and the 16 nibbles drive a
  * table-free ±1 update of a local 64-long array; the operator
  * becomes a pure per-row map — the doc_simhash pipeline keeps NO
  * aggregation before chunk bucketing.
  */
case class SimHashVotes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_votes"

  override def nullSafeEval(s: Any): Any =
    SimHashVotes.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashVotes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashVotes =
    copy(child = newChild)
}

object SimHashVotes {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(t: UTF8String): GenericArrayData = {
    val b = t.getBytes
    val n = b.length
    val votes = new Array[Long](64)
    var nTokens = 0L
    val md = digest.get()
    var i = 0
    while (i < n) {
      if (b(i) >= 'a' && b(i) <= 'z') {
        val from = i
        while (i < n && b(i) >= 'a' && b(i) <= 'z') i += 1
        md.reset()
        md.update(b, from, i - from)
        val d = md.digest()
        nTokens += 1
        // bit j votes on bit (j & 3) of hex digit (j >> 2); digit dd
        // is the high nibble of byte dd/2 when dd is even, low when
        // odd — digits 0..15 live in digest bytes 0..7
        var j = 0
        while (j < 64) {
          val dd = j >> 2
          val byte = d(dd >> 1)
          val digit = if ((dd & 1) == 0) (byte >> 4) & 0xF else byte & 0xF
          if (((digit >> (j & 3)) & 1) == 1) votes(j) += 2
          j += 1
        }
      } else i += 1
    }
    // +2 per set-bit vote above, then subtract nTokens once per bit:
    // sum(if set +1 else -1) == 2*set_count - n_tokens
    val out = new Array[Any](65)
    var j = 0
    while (j < 64) { out(j) = votes(j) - nTokens; j += 1 }
    out(64) = nTokens
    new GenericArrayData(out)
  }
}
