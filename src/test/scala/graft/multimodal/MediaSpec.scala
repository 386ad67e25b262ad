package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing suite: synthetic blob construction, the batched
  * decode pass (stub codec), and the column-pruning guarantee for
  * metadata-only queries.
  */
class MediaSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("synthesized media rows carry blob + typed metadata") {
    val media = Media.synthesize(docs)
    val first = media.orderBy("media_id").head()
    assert(Set("image", "audio", "video").contains(first.kind))
    assert(first.content.length > 10)
    assert(first.meta_width >= 1 && first.meta_width <= 640)
  }

  test("stub decode extracts dimensions and frame samples per row") {
    val media = Media.synthesize(docs)
    val feats = Media.extractFeatures(media, maxFrames = 4)
      .orderBy("media_id").collect()
    assert(feats.length === docs.count())
    val f0 = feats.head
    // stub header W:<w>;H:<h>; must round-trip through the codec
    val m0 = media.orderBy("media_id").head()
    assert(f0.width === m0.meta_width)
    assert(f0.height === m0.meta_height)
    assert(f0.n_frames_sampled >= 1 && f0.n_frames_sampled <= 4)
    assert(f0.n_bytes === m0.content.length)
    assert(f0.digest.matches("[0-9a-f]{32}"))
  }

  test("feature extraction is deterministic across runs") {
    val media = Media.synthesize(docs)
    val a = Media.extractFeatures(media).orderBy("media_id").collect().toSeq
    val b = Media.extractFeatures(media).orderBy("media_id").collect().toSeq
    assert(a === b)
  }

  test("resize pass emits one row per sampled frame at the target dims") {
    val media = Media.synthesize(docs)
    val frames = Media.resizeFrames(media, outW = 32, outH = 24, maxFrames = 4)
      .orderBy("media_id", "frame_idx").collect()
    val nFrames = Media.extractFeatures(media, maxFrames = 4)
      .collect().map(_.n_frames_sampled.toLong).sum
    assert(frames.length.toLong === nFrames)
    frames.foreach { f =>
      assert(f.out_w === 32 && f.out_h === 24)
      assert(f.frame_idx >= 0 && f.frame_idx < 4)
      assert(f.n_bytes >= 1)
    }
    // the stub scaler really scales: a frame from a larger-than-target
    // source must shrink its byte payload by the pixel-count ratio
    val big = frames.filter(f => f.src_w * f.src_h > 4 * 32 * 24)
    assert(big.nonEmpty)
    big.foreach(f => assert(f.n_bytes < f.src_w * f.src_h))
    // determinism
    val again = Media.resizeFrames(media, 32, 24, 4)
      .orderBy("media_id", "frame_idx").collect()
    assert(frames.toSeq === again.toSeq)
  }

  test("REAL image decode: a PNG round-trips through the pipeline with true dims and pixels") {
    // build a genuine PNG in-memory (javax.imageio writer — pure JDK)
    val w = 40; val h = 30
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 6) << 16) | ((y * 8) << 8) | 0x40)
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf))
    val png = buf.toByteArray

    val d = Media.MediaCodec.decode("image", png, maxFrames = 4)
    assert(d.width === w && d.height === h, "decoded dims must come from the PNG header")
    assert(d.frames.size === 1)
    val rgb = d.frames.head
    assert(rgb.length === w * h * 3)
    // spot-check true pixel values survive the decode
    def px(x: Int, y: Int) = {
      val i = (y * w + x) * 3
      (rgb(i) & 0xff, rgb(i + 1) & 0xff, rgb(i + 2) & 0xff)
    }
    assert(px(0, 0) === ((0, 0, 0x40)))
    assert(px(5, 3) === ((30, 24, 0x40)))

    // the raster path of resize: nearest-neighbor to 10×6, verified
    // against the spec formula on a couple of pixels
    val small = Media.MediaCodec.resize(rgb, w, h, 10, 6)
    assert(small.length === 10 * 6 * 3)
    def spx(bytes: Array[Byte], ow: Int, x: Int, y: Int) = {
      val i = (y * ow + x) * 3
      (bytes(i) & 0xff, bytes(i + 1) & 0xff, bytes(i + 2) & 0xff)
    }
    // out (3,2) ← src (3*40/10, 2*30/6) = (12, 10)
    assert(spx(small, 10, 3, 2) === px(12, 10))
    // end-to-end through the Dataset pipeline
    import spark.implicits._
    val media = Seq(Media.MediaRow(1L, "image", png, w, h, 0L)).toDS()
    val feat = Media.extractFeatures(media).collect().head
    assert(feat.width === w && feat.height === h && feat.n_frames_sampled === 1)
    val resized = Media.resizeFrames(media, 10, 6).collect()
    assert(resized.length === 1 && resized.head.n_bytes === 10 * 6 * 3)
  }

  test("REAL audio decode: a PCM WAV yields sample rate, channels, windows; resample is exact") {
    // 0.5 s of 8 kHz 16-bit mono: a 440-ish square wave, via the JDK
    // sampled-audio writer
    val rate = 8000
    val n = rate / 2
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v: Short = if ((i / 9) % 2 == 0) 12000 else -12000
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    val wav = buf.toByteArray

    val d = Media.MediaCodec.decode("audio", wav, maxFrames = 4)
    assert(d.width === rate, "width carries the sample rate for audio")
    assert(d.height === 1, "height carries the channel count")
    assert(d.frames.size === 1, "0.5 s fits one 1-second window")
    assert(d.frames.head.length === n * 2)
    assert(d.frames.head.toSeq === pcm.toSeq, "PCM payload must survive decode exactly")

    // nearest-sample resample 8 kHz → 4 kHz: every second frame, exactly
    val down = Media.MediaCodec.resamplePcm(pcm, channels = 1, srcRate = rate, dstRate = rate / 2)
    assert(down.length === n) // half the frames, 2 bytes each
    for (i <- 0 until n / 2) {
      assert(down(2 * i) === pcm(4 * i) && down(2 * i + 1) === pcm(4 * i + 1),
        s"resampled frame $i must be source frame ${2 * i}")
    }
  }

  test("REAL video decode: an MJPEG AVI yields per-frame rasters with true dims") {
    // build a genuine MJPEG AVI in memory: RIFF container, movi LIST,
    // one 00dc chunk per JPEG frame (each frame a solid color)
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
    }
    val w = 16; val h = 12
    val colors = Seq(0xc00000, 0x00c000, 0x0000c0)
    val jpegs = colors.map { c =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c)
      val buf = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", buf))
      buf.toByteArray
    }
    val movi = chunk("LIST",
      "movi".getBytes("US-ASCII") ++ jpegs.flatMap(j => chunk("00dc", j)).toArray)
    // a junk chunk the walker must skip by size
    val junk = chunk("JUNK", Array.fill(7)(0x55.toByte))
    val payload = "AVI ".getBytes("US-ASCII") ++ junk ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(payload.length) ++ payload

    val d = Media.MediaCodec.decode("video", avi, maxFrames = 2)
    assert(d.width === w && d.height === h, "dims must come from the first frame")
    assert(d.frames.size === 2, "maxFrames must cap the sampled frames")
    // JPEG is lossy: solid-color frames decode within a small tolerance
    for ((frame, c) <- d.frames.zip(colors)) {
      assert(frame.length === w * h * 3)
      val i = ((h / 2) * w + w / 2) * 3
      val (r, g, b) = (frame(i) & 0xff, frame(i + 1) & 0xff, frame(i + 2) & 0xff)
      val (er, eg, eb) = ((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff)
      assert(math.abs(r - er) < 16 && math.abs(g - eg) < 16 && math.abs(b - eb) < 16,
        s"frame color ($r,$g,$b) far from expected ($er,$eg,$eb)")
    }
    // all three frames when the cap allows
    assert(Media.MediaCodec.decode("video", avi, maxFrames = 10).frames.size === 3)

    // end-to-end: the Dataset pipeline samples and resizes AVI frames
    import spark.implicits._
    val media = Seq(Media.MediaRow(7L, "video", avi, w, h, 0L)).toDS()
    val feat = Media.extractFeatures(media).collect().head
    assert(feat.width === w && feat.height === h && feat.n_frames_sampled >= 2)
    val resized = Media.resizeFrames(media, 8, 6, maxFrames = 3).collect()
    assert(resized.length === 3 && resized.forall(_.n_bytes === 8 * 6 * 3))
  }

  test("pHash dedup: planted near-identical images pair, distinct images don't") {
    import spark.implicits._
    def pngOf(paint: (Int, Int) => Int, w: Int = 64, h: Int = 48): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, paint(x, y))
      val buf = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", buf))
      buf.toByteArray
    }
    // a monotone gradient scene (dHash bits ~all one direction), its
    // lightly-noised copy (the re-encode/recompress analogue: ±3
    // brightness jitter preserves nearly every 9×8 gradient sign), the
    // REVERSED gradient (every gradient sign flips → distance ~64),
    // and a fine checker (mixed signs → far from both)
    def gr(v: Int): Int = { val g = math.max(0, math.min(255, v)); (g << 16) | (g << 8) | g }
    def scene(x: Int, y: Int): Int = gr(x * 4)
    val rnd = new scala.util.Random(5)
    def noisy(x: Int, y: Int): Int = gr(x * 4 + rnd.nextInt(7) - 3)
    def reversed(x: Int, y: Int): Int = gr(255 - x * 4)
    def checker(x: Int, y: Int): Int = if (((x / 4) + (y / 4)) % 2 == 0) 0xffffff else 0
    val media = Seq(
      Media.MediaRow(1L, "image", pngOf(scene), 64, 48, 0L),
      Media.MediaRow(2L, "image", pngOf(noisy), 64, 48, 0L),
      Media.MediaRow(3L, "image", pngOf(reversed), 64, 48, 0L),
      Media.MediaRow(4L, "image", pngOf(checker), 64, 48, 0L)).toDS()
    val pairs = Media.phashDedup(media, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // the planted near-identical pair is found, with a small distance
    assert(pairs.exists { case (a, b, _) => a == 1L && b == 2L },
      s"planted near-dup not paired: ${pairs.mkString(",")}")
    // distinct scenes never pair with each other or with the gradient
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L || b == 4L || a == 4L },
      s"distinct images paired: ${pairs.mkString(",")}")
    // dHash itself: identical rasters → distance 0; the noised copy → ≤ 6
    val d1 = Media.MediaCodec.decode("image", pngOf(scene), 1)
    val d2 = Media.MediaCodec.decode("image", pngOf(noisy), 1)
    val h1 = Media.MediaCodec.dHash(d1.frames.head, d1.width, d1.height)
    val h2 = Media.MediaCodec.dHash(d2.frames.head, d2.width, d2.height)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 6)
    assert(Media.MediaCodec.dHash(d1.frames.head, d1.width, d1.height) === h1) // deterministic
  }

  test("metadata-only aggregation prunes the blob column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    Media.synthesize(docs).write.mode("overwrite").parquet(dir)
    import spark.implicits._
    val media = spark.read.parquet(dir).as[Media.MediaRow]
    val stats = Media.metaStats(media)
    // correctness
    val row = stats.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(row.values.sum === docs.count())
    // plan: the parquet ReadSchema must not include `content`
    val plan = stats.queryExecution.executedPlan.toString()
    assert(plan.contains("ReadSchema"))
    assert(!plan.split("ReadSchema")(1).split("\n")(0).contains("content"),
      s"blob column not pruned:\n$plan")
  }
}
