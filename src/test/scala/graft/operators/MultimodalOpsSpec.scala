package graft.operators

import graft.SparkSpec
import java.security.MessageDigest

/** Invariant tests for the relational multimodal feature operators
  * (mm_audio_features, mm_frame_sample) on the sf0.001 fixture. Exact
  * cross-engine agreement is the DuckDB oracle's job (Verify); these
  * recompute the features independently in plain Scala from the same
  * source text, so a silent drift in the relational derivation (sample
  * formula, frame stride, digest window) fails here even if both
  * engines drift together.
  */
class MultimodalOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docs: Map[Long, String] =
    graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("mm_audio_features: features equal a plain-Scala recompute of the PCM derivation") {
    val texts = docs
    val rows = Registry.byName("mm_audio_features").run(spark, sf).collect()
    assert(rows.length == texts.count(_._2.nonEmpty))
    for (r <- rows) {
      val text = texts(r.getLong(0))
      val n = math.min(text.length * 2, 2048)
      val samples = Array.tabulate(n)(i => text.charAt(i % text.length).toInt - 96)
      assert(r.getInt(1) == n)
      val rms = BigDecimal(math.sqrt(samples.map(x => x.toLong * x).sum.toDouble / n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) == rms, s"rms mismatch for doc ${r.getLong(0)}")
      assert(r.getInt(3) == samples.map(math.abs).max)
      val zc = (1 until n).count(i => samples(i - 1) * samples(i) < 0)
      assert(r.getInt(4) == zc, s"zero-crossing mismatch for doc ${r.getLong(0)}")
    }
  }

  test("mm_frame_sample: stride selection and digests equal a plain-Scala recompute") {
    val texts = docs
    val md = MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byClip = Registry.byName("mm_frame_sample").run(spark, sf).collect()
      .groupBy(_.getLong(0))
    val expectedClips = texts.filter { case (id, t) => id % 3 == 2 && t.nonEmpty }
    assert(byClip.keySet == expectedClips.keySet)
    for ((id, frames) <- byClip) {
      val text = texts(id)
      val nFrames = text.length / 64 + 1
      val k = math.min(nFrames, 4)
      val expectedIdx = (0 until k).map(jj => jj * nFrames / k)
      assert(frames.forall(_.getInt(1) == nFrames))
      val got = frames.map(_.getInt(2)).toSeq
      assert(got == expectedIdx, s"frame stride mismatch for clip $id")
      // strictly increasing — the k <= n_frames guarantee of no dup frames
      assert(got == got.distinct.sorted)
      for (f <- frames) {
        val from = f.getInt(2) * 64
        val window = text.substring(from, math.min(from + 64, text.length))
        assert(f.getString(3) == md5hex(window), s"digest mismatch clip $id frame ${f.getInt(2)}")
      }
    }
  }

  test("mm_voice_segments: segments equal a plain-Scala recompute of the VAD islands") {
    val texts = docs
    val expected = (for {
      (id, text) <- texts.toSeq
      if id % 3 == 1 && text.nonEmpty
      n = math.min(text.length * 2, 2048)
      if n >= 64
      energies = (0 until n / 64).map { w =>
        (64 * w until 64 * w + 64).map { i =>
          val x = (text.charAt(i % text.length).toInt - 96).toLong
          x * x
        }.sum
      }
      voiced = energies.zipWithIndex.filter(_._1 >= 58000L).map(_._2)
      // islands: consecutive voiced window indices
      (grp, ws) <- voiced.zipWithIndex.groupBy { case (w, rn) => w - rn }
      sorted = ws.map(_._1).sorted
    } yield (id, sorted.head, sorted.last, sorted.length,
      sorted.map(energies(_)).sum)).sortBy(t => (t._1, t._2))
    val got = Registry.byName("mm_voice_segments").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("mm_scene_cuts: cuts equal a plain-Scala recompute of the frame histograms") {
    val texts = docs
    def cps(t: String): Array[Int] = t.codePoints.toArray
    def cutsOf(entries: Seq[(Long, String)]): Seq[(Long, Int, Int)] =
      (for {
        (id, text) <- entries
        c = cps(text)
        if c.length >= 128
        nf = c.length / 64
        hists = (0 until nf).map { j =>
          val h = new Array[Int](4)
          (j * 64 until j * 64 + 64).foreach(i => h(c(i) % 4) += 1)
          h
        }
        j <- 1 until nf
        l1 = (0 until 4).map(b => math.abs(hists(j)(b) - hists(j - 1)(b))).sum
        if l1 >= 18
      } yield (id, j, l1)).sortBy(t => (t._1, t._2))

    val expected = cutsOf(texts.toSeq.filter(_._1 % 3 == 2))
    val got = Registry.byName("mm_scene_cuts").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)

    // non-BMP fixture: the frame histogram must bin by CODE POINT
    // (cp % 4), with frames as fixed 64-code-point blocks — a
    // UTF-16-unit framing would split the surrogate pairs and shift
    // every later frame boundary
    import spark.implicits._
    val g = new String(Character.toChars(0x1F600))
    val bmp = s"héllo wörld $g " * 12 + "plain ascii tail to vary the bins"
    val fixture = Seq(
      (2L, bmp, "xx", "video"),
      (5L, ("abcd" * 40) + "    ZZZZ    " * 8, "en", "video"))
      .map { case (id, t, l, src) => (id, t, l, src, t.codePointCount(0, t.length).toLong) }
    val dir = java.nio.file.Files.createTempDirectory("graft-scenecuts").toString
    fixture.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val gotNb = Registry.byName("mm_scene_cuts").run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(gotNb == cutsOf(fixture.map(f => (f._1, f._2))))
  }

  test("mm_audio_features / mm_voice_segments: non-BMP corpus samples by code point") {
    import spark.implicits._
    // multi-byte fixture: Latin-1 accents (2-byte UTF-8), CJK (3-byte),
    // and a supplementary-plane emoji (4-byte, a UTF-16 surrogate
    // PAIR). Both engines' substr/length/ascii/split are code-point
    // functions, so the PCM derivation must agree with a plain
    // code-point recompute — a UTF-16-unit sampler would split the
    // surrogate pair and diverge on docs 1 and 4.
    val g = new String(Character.toChars(0x1F600))
    val rows = Seq(
      (1L, s"héllo wörld $g test padding to reach enough points $g", "xx", "audio"),
      (2L, "日本語のテキストです、これはもっと長いテキストです日本語", "ja", "audio"),
      // ADJACENT supplementary-plane chars: their sign product squares
      // past Int.MaxValue — pins the widened zero-crossing arithmetic
      (4L, s"a$g$g$g${g}c mixed voice clip with plenty of code points here", "xx", "audio"),
      (6L, "plain ascii control document for the same pipeline run", "en", "audio"))
      .map { case (id, t, l, src) => (id, t, l, src, t.codePointCount(0, t.length).toLong) }
    val dir = java.nio.file.Files.createTempDirectory("graft-nonbmp").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def cps(t: String): Array[Int] = t.codePoints.toArray
    def samplesOf(t: String): Array[Int] = {
      val c = cps(t)
      Array.tabulate(math.min(c.length * 2, 2048))(i => c(i % c.length) - 96)
    }

    val audio = Registry.byName("mm_audio_features").run(spark, dir).collect()
    assert(audio.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 6L))
    for (r <- audio) {
      val t = rows.find(_._1 == r.getLong(0)).get._2
      val s = samplesOf(t)
      assert(r.getInt(1) == s.length)
      val rms = BigDecimal(math.sqrt(s.map(x => x.toLong * x).sum.toDouble / s.length))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) == rms, s"rms mismatch for non-BMP doc ${r.getLong(0)}")
      assert(r.getInt(3) == s.map(math.abs).max)
      assert(r.getInt(4) ==
        (1 until s.length).count(i => s(i - 1).toLong * s(i) < 0))
    }

    val voice = Registry.byName("mm_voice_segments").run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    val expected = (for {
      (id, t, _, _, _) <- rows if id % 3 == 1
      s = samplesOf(t) if s.length >= 64
      energies = (0 until s.length / 64).map { w =>
        (64 * w until 64 * w + 64).map(i => s(i).toLong * s(i)).sum
      }
      voiced = energies.zipWithIndex.filter(_._1 >= 58000L).map(_._2)
      (_, ws) <- voiced.zipWithIndex.groupBy { case (w, rn) => w - rn }
      sorted = ws.map(_._1).sorted
    } yield (id, sorted.head, sorted.last, sorted.length,
      sorted.map(energies(_)).sum)).sortBy(t => (t._1, t._2))
    assert(voice.toSeq == expected)
    assert(voice.nonEmpty, "fixture must produce at least one voiced segment")
  }

  test("mm_text_image_pairs: a planted image-caption pair is found; an unpaired image stays absent") {
    import spark.implicits._
    // planted corpus: doc 3 is an IMAGE (doc_id % 3 = 0) whose raster
    // derives from the same text as caption doc 4 (% 3 = 1) → sketch
    // distance 0; doc 6 is an image whose text shares nothing with any
    // caption; docs 5, 7 are unrelated captions
    val fox = "the quick brown fox jumps over the lazy dog and keeps running"
    val rows = Seq(
      (3L, fox, "en", "img", fox.length.toLong),
      (4L, fox, "en", "txt", fox.length.toLong),
      (5L, "completely unrelated caption about database engines", "en", "txt", 52L),
      (6L, "zzzz qqqq xxxx wwww kkkk jjjj vvvv bbbb nnnn mmmm", "en", "img", 49L),
      (7L, "another caption mentioning vector search and lsh", "en", "txt", 48L))
    val dir = java.nio.file.Files.createTempDirectory("graft-pairs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Registry.byName("mm_text_image_pairs").run(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out.contains(3L), "planted image must pair")
    assert(out(3L) === (4L, 0), "image 3 pairs its identical caption at hamming 0")
    assert(!out.contains(6L),
      "an image with no matching caption must be absent from the pairing")
  }

  test("dhash_chunks kernel equals the declarative 72-pixel spelling, non-BMP included") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col, element_at, expr, length}
    graft.GraftExtensions.register(spark)
    // fixtures exercise the wrap (len < 72), the no-wrap case, and
    // code-point indexing: the 🚀/😀 texts would diverge if the kernel
    // indexed UTF-16 units or raw bytes instead of code points
    val texts = Seq(
      "a", "ab", "the quick brown fox jumps over the lazy dog",
      "x" * 72, "x" * 100,
      "short 🚀 text with a rocket",
      "😀😀 adjacent surrogate pairs 😀 and accents éàü mixed in",
      docs.values.maxBy(_.length))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").filter(length(col("text")) > 0)
    val declarative = df
      .select(col("doc_id") +: (0 until 72).map(i =>
        expr(s"ascii(substring(text, ($i % length(text)) + 1, 1))").as(s"p$i")): _*)
      .selectExpr("doc_id" +: (0 until 4).map { c =>
        val bits = (0 until 16).map { k =>
          val j = c * 16 + k; val r = j / 8; val cc = j % 8
          s"CASE WHEN p${r * 9 + cc} > p${r * 9 + cc + 1} THEN ${1 << k} ELSE 0 END"
        }.mkString(" + ")
        s"($bits) AS c$c"
      }: _*)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val kernel = df
      .select(col("doc_id"), call_function("dhash_chunks", col("text")).as("ch"))
      .select(col("doc_id"), element_at(col("ch"), 1), element_at(col("ch"), 2),
        element_at(col("ch"), 3), element_at(col("ch"), 4))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(kernel === declarative)
  }
}
