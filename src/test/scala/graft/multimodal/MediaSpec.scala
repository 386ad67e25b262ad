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
