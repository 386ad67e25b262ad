package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared PCM derivation for the audio operators: sample[i] =
  * codePoint(text[i mod len]) − 96 over n = min(2·len, 2048) samples,
  * where len counts CODE POINTS — exactly the relational spelling
  * `ascii(element_at(split(text,''), (i % length(text)) + 1)) - 96`
  * both engines evaluate (split keeps surrogate pairs whole, length()
  * is UTF8String.numChars, ascii() returns the full first code point;
  * the MultimodalOpsSpec non-BMP fixture pins the agreement). All
  * accumulation is 64-bit integer, so the kernels are bit-identical
  * to the higher-order-function spelling they replace — the DuckDB
  * oracle keeps the declarative form.
  */
private[functions] object Pcm {
  /** Decode to code points once; every sample read is then O(1). */
  def codePoints(t: UTF8String): Array[Int] = {
    val s = t.toString
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var j = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** n_samples = least(length(text) * 2, 2048), overflow-safe. */
  def nSamples(len: Int): Int = if (len >= 1024) 2048 else len * 2
}

/** `audio_features(txt)` → array<long> [sum_sq, peak, zero_crossings]
  * of the derived PCM clip, in ONE pass.
  *
  * Why it exists (scale): the declarative spelling materialized a
  * per-row char array plus a ≤2048-element sample array, then ran
  * THREE interpreted higher-order functions over it (aggregate for
  * the RMS sum, transform+array_max for the peak, filter+size for the
  * zero crossings) — ~5 interpreted Expression evals per sample per
  * doc, measured as the whole cost of the mm_audio_features bench
  * slot (4.0 s at sf0.1, zero shuffle). Here the samples never
  * materialize: one fused integer loop accumulates all three
  * features. The final rms = round(sqrt(sum_sq/n), 6) stays in the
  * query so the double arithmetic is char-identical to the oracle's.
  */
case class AudioFeatures(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "audio_features"

  override def nullSafeEval(s: Any): Any =
    AudioFeatures.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AudioFeatures.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): AudioFeatures =
    copy(child = newChild)
}

object AudioFeatures {
  def compute(t: UTF8String): GenericArrayData = {
    val cps = Pcm.codePoints(t)
    val len = cps.length
    if (len == 0) return new GenericArrayData(Array[Any](0L, 0L, 0L))
    val n = Pcm.nSamples(len)
    var sumSq = 0L
    var peak = 0L
    var zc = 0L
    var prev = 0L
    var i = 0
    while (i < n) {
      val x = (cps(i % len) - 96).toLong
      sumSq += x * x
      val ax = if (x < 0) -x else x
      if (ax > peak) peak = ax
      // sign product < 0 ⟺ strict sign change; zero samples break a
      // run exactly like the declarative product test
      if (i > 0 && prev * x < 0L) zc += 1
      prev = x
      i += 1
    }
    new GenericArrayData(Array[Any](sumSq, peak, zc))
  }
}

/** `window_energies(txt)` → array<long> of per-64-sample-window
  * integer energies Σ x² of the derived PCM clip (n_samples/64
  * windows), in ONE pass — the framing half of mm_voice_segments.
  *
  * Why it exists (scale): the declarative spelling exploded one row
  * per window and ran an interpreted `aggregate(sequence(...))` whose
  * lambda evaluated element_at + ascii TWICE per sample. Here the
  * windows posexplode from one per-clip array computed in a single
  * integer loop; the gaps-and-islands segmentation (the part that
  * genuinely needs the per-clip window shuffle) is unchanged.
  */
case class WindowEnergies(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_energies"

  override def nullSafeEval(s: Any): Any =
    WindowEnergies.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowEnergies.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WindowEnergies =
    copy(child = newChild)
}

/** `frame_hists(txt)` → array<long> of per-frame PACKED 4-bin
  * histograms of the clip's ⌊len/64⌋ full 64-code-point frames:
  * element j = h0 | h1<<8 | h2<<16 | h3<<24 where hb = |{i in frame j
  * : codePoint % 4 = b}| (each count ≤ 64 fits a byte) — the
  * mm_scene_cuts frame/histogram derivation in ONE pass.
  *
  * Why it exists (scale): the declarative spelling exploded one row
  * per frame, re-substringed the frame text (an O(frame_idx)
  * code-point seek per frame — O(len²/64) per clip), then ran FOUR
  * interpreted `size(filter(sequence(1,64), …))` lambdas each doing
  * its own per-position substring+ascii — 4×64 interpreted evals and
  * 256 O(64)-seeks per frame. Here one integer loop over the decoded
  * code points bins everything; the lag-window cut detection (the
  * part that genuinely needs the per-clip shuffle) is unchanged.
  */
case class FrameHists(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "frame_hists"

  override def nullSafeEval(s: Any): Any =
    FrameHists.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FrameHists.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): FrameHists =
    copy(child = newChild)
}

object FrameHists {
  def compute(t: UTF8String): GenericArrayData = {
    val cps = Pcm.codePoints(t)
    val nf = cps.length / 64
    val out = new Array[Any](nf)
    var j = 0
    var i = 0
    while (j < nf) {
      var h0 = 0L; var h1 = 0L; var h2 = 0L; var h3 = 0L
      val lim = i + 64
      while (i < lim) {
        (cps(i) & 3) match {
          case 0 => h0 += 1
          case 1 => h1 += 1
          case 2 => h2 += 1
          case _ => h3 += 1
        }
        i += 1
      }
      out(j) = h0 | (h1 << 8) | (h2 << 16) | (h3 << 24)
      j += 1
    }
    new GenericArrayData(out)
  }
}

object WindowEnergies {
  def compute(t: UTF8String): GenericArrayData = {
    val cps = Pcm.codePoints(t)
    val len = cps.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val n = Pcm.nSamples(len)
    val nw = n / 64
    val out = new Array[Any](nw)
    var w = 0
    var i = 0
    while (w < nw) {
      var acc = 0L
      val lim = i + 64
      while (i < lim) {
        val x = (cps(i % len) - 96).toLong
        acc += x * x
        i += 1
      }
      out(w) = acc
      w += 1
    }
    new GenericArrayData(out)
  }
}
