package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: images /
  * audio / video travel as opaque `binary` columns with typed metadata
  * alongside (the Spark-native equivalent of a media lakehouse table).
  *
  * The actual codecs (JPEG decode, audio resample, video frame
  * extraction) are NOT available in this environment, so the decode
  * kernel is STUBBED behind [[MediaCodec]] — a deterministic fake that
  * parses our synthetic header. Everything around it — the schema, the
  * batched `mapPartitions` execution shape, partition sizing, and the
  * metadata projection — is real and tested; swapping in a JNI/FFI
  * codec changes one function.
  *
  * Scale notes (100 TB of media): blobs stay columnar-compressed in
  * Parquet; the decode pass is `mapPartitions` (one codec init per
  * partition, amortized over the batch — the same batching rationale
  * as Arrow-batched Python UDFs); metadata-only queries never touch
  * the blob column (Parquet column pruning), which is why meta lives
  * in ordinary columns, not inside the blob.
  */
object Media {

  final case class MediaRow(
      media_id: Long,
      kind: String,           // image | audio | video
      content: Array[Byte],   // opaque blob
      meta_width: Int,        // typed metadata columns (pruned scans)
      meta_height: Int,
      meta_duration_ms: Long)

  final case class Feature(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      digest: String,
      // decoded-side outputs (stub codec):
      width: Int,
      height: Int,
      n_frames_sampled: Int)

  /** STUB codec. A real build replaces `decode` with the native
    * library call; the signature (bytes in, dimensions + frames out)
    * and the per-partition init/close lifecycle are the contract.
    */
  object MediaCodec {
    final case class Decoded(width: Int, height: Int, frames: Seq[Array[Byte]])

    /** Deterministic fake: header = "W:<w>;H:<h>;" prefix, frames are
      * fixed-stride slices of the payload — stands in for JPEG/PNG/
      * H.264 decode so tests can assert real plumbing end-to-end.
      */
    def decode(kind: String, bytes: Array[Byte], maxFrames: Int): Decoded = {
      val s = new String(bytes.takeWhile(_ != ';'.toByte), "UTF-8")
      val w = s.stripPrefix("W:").toIntOption.getOrElse(0)
      val rest = new String(bytes, "UTF-8").split(";", 3)
      val h = rest.lift(1).map(_.stripPrefix("H:")).flatMap(_.toIntOption).getOrElse(0)
      val payload = rest.lift(2).map(_.getBytes("UTF-8")).getOrElse(Array.emptyByteArray)
      val stride = math.max(1, payload.length / math.max(1, maxFrames))
      val frames = payload.grouped(stride).take(maxFrames).toSeq
      Decoded(w, h, frames)
    }

    /** Stub scaler: nearest-index byte sampling to the target
      * pixel-count ratio — stands in for the SIMD image scaler; the
      * signature (frame + src/dst dims in, scaled frame out) is the
      * contract a real build fills.
      */
    def resize(frame: Array[Byte], srcW: Int, srcH: Int,
               outW: Int, outH: Int): Array[Byte] = {
      if (frame.isEmpty || srcW.toLong * srcH == 0L) return Array.emptyByteArray
      val ratio = (outW.toLong * outH).toDouble / (srcW.toLong * srcH)
      val n = math.max(1, math.ceil(frame.length * ratio).toInt)
      Array.tabulate(n)(i => frame(((i.toLong * frame.length) / n).toInt))
    }
  }

  /** Wrap a text corpus as synthetic media rows (the test harness path
    * — there is no binary testdata table; deterministic by
    * construction).
    */
  def synthesize(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(concat(lit("W:"), (pmod(col("doc_id"), lit(640)) + 1).cast("string"),
          lit(";H:"), (pmod(col("doc_id"), lit(480)) + 1).cast("string"),
          lit(";"), col("text")), "UTF-8").as("content"),
        (pmod(col("doc_id"), lit(640)) + 1).cast("int").as("meta_width"),
        (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("meta_height"),
        (col("n_chars") * 10).as("meta_duration_ms"))
      .as[MediaRow]
  }

  /** The decode/feature-extract pass: batched per partition, one codec
    * "session" per partition (the stub has none, a real codec would
    * init here), emitting narrow feature rows.
    */
  def extractFeatures(media: Dataset[MediaRow], maxFrames: Int = 4): Dataset[Feature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // real codec: val session = Codec.open(); try { ... } finally close
      rows.map { m =>
        val d = MediaCodec.decode(m.kind, m.content, maxFrames)
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(m.content).map("%02x".format(_)).mkString
        Feature(m.media_id, m.kind, m.content.length.toLong, digest,
          d.width, d.height, d.frames.size)
      }
    }
  }

  final case class ResizedFrame(
      media_id: Long,
      frame_idx: Int,
      src_w: Int, src_h: Int,
      out_w: Int, out_h: Int,
      n_bytes: Int)

  /** The resize / frame-sample pass: decode (frame-sampling at
    * maxFrames), then scale every sampled frame to the target dims —
    * one row per output frame, blobs never leave the partition (only
    * the narrow per-frame stats are emitted; a training pipeline
    * writing resized frames would emit the scaled bytes in the same
    * row shape). Same per-partition codec lifecycle as
    * [[extractFeatures]].
    */
  def resizeFrames(media: Dataset[MediaRow], outW: Int, outH: Int,
                   maxFrames: Int = 4): Dataset[ResizedFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val d = MediaCodec.decode(m.kind, m.content, maxFrames)
        d.frames.zipWithIndex.map { case (f, i) =>
          val scaled = MediaCodec.resize(f, d.width, d.height, outW, outH)
          ResizedFrame(m.media_id, i, d.width, d.height, outW, outH, scaled.length)
        }
      }
    }
  }

  /** Metadata-only projection — must not read the blob column (column
    * pruning keeps the scan narrow at 100 TB; asserted in tests via
    * the optimized plan).
    */
  def metaStats(media: Dataset[MediaRow]): DataFrame =
    media.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        max("meta_width").as("max_w"),
        max("meta_height").as("max_h"),
        sum("meta_duration_ms").as("total_ms"))
      .orderBy("kind")
}
