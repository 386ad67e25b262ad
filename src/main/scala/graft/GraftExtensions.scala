package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{AdcSum, AudioFeatures, BandProbes, BandSignatures, CharCounts, CharTrigrams, CosineSimilarity, CountTokens, DhashChunks, DotProduct, FrameHists, JlProject, MinHashBandSigs, NearestCells, SimHashVotes, SquashAlnum, WindowBloomPositions, WindowEnergies, WindowMd5s}

/** Engine extension entry point: register the custom expressions with
  * a session, either at build time
  * (`spark.sql.extensions=graft.GraftExtensions`) or post-hoc on an
  * existing session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
        (children: Seq[Expression]) => CosineSimilarity(children.head, children(1))),
      (FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
        (children: Seq[Expression]) => DotProduct(children.head, children(1))),
      (FunctionIdentifier("band_sigs"),
        new ExpressionInfo(classOf[BandSignatures].getName, "band_sigs"),
        (children: Seq[Expression]) =>
          BandSignatures(children.head, children(1), children(2))),
      (FunctionIdentifier("band_probes"),
        new ExpressionInfo(classOf[BandProbes].getName, "band_probes"),
        (children: Seq[Expression]) =>
          BandProbes(children.head, children(1), children(2), children(3))),
      (FunctionIdentifier("minhash_band_sigs"),
        new ExpressionInfo(classOf[MinHashBandSigs].getName, "minhash_band_sigs"),
        (children: Seq[Expression]) =>
          MinHashBandSigs(children.head, children(1), children(2))),
      (FunctionIdentifier("nearest_cells"),
        new ExpressionInfo(classOf[NearestCells].getName, "nearest_cells"),
        (children: Seq[Expression]) =>
          NearestCells(children.head, children(1), children(2))),
      (FunctionIdentifier("adc_sum"),
        new ExpressionInfo(classOf[AdcSum].getName, "adc_sum"),
        (children: Seq[Expression]) => AdcSum(children.head, children(1))),
      (FunctionIdentifier("jl_project"),
        new ExpressionInfo(classOf[JlProject].getName, "jl_project"),
        (children: Seq[Expression]) => JlProject(children.head, children(1))),
      (FunctionIdentifier("squash_alnum"),
        new ExpressionInfo(classOf[SquashAlnum].getName, "squash_alnum"),
        (children: Seq[Expression]) => SquashAlnum(children.head)),
      (FunctionIdentifier("window_md5s"),
        new ExpressionInfo(classOf[WindowMd5s].getName, "window_md5s"),
        (children: Seq[Expression]) => WindowMd5s(children.head, children(1))),
      (FunctionIdentifier("window_md5s_all"),
        new ExpressionInfo(classOf[WindowMd5s].getName, "window_md5s_all"),
        (children: Seq[Expression]) =>
          WindowMd5s(children.head, children(1), dedup = false)),
      (FunctionIdentifier("count_tokens"),
        new ExpressionInfo(classOf[CountTokens].getName, "count_tokens"),
        (children: Seq[Expression]) => CountTokens(children.head)),
      (FunctionIdentifier("window_bloom_positions"),
        new ExpressionInfo(classOf[WindowBloomPositions].getName,
          "window_bloom_positions"),
        (children: Seq[Expression]) =>
          WindowBloomPositions(children.head, children(1))),
      (FunctionIdentifier("simhash_votes"),
        new ExpressionInfo(classOf[SimHashVotes].getName, "simhash_votes"),
        (children: Seq[Expression]) => SimHashVotes(children.head)),
      (FunctionIdentifier("audio_features"),
        new ExpressionInfo(classOf[AudioFeatures].getName, "audio_features"),
        (children: Seq[Expression]) => AudioFeatures(children.head)),
      (FunctionIdentifier("window_energies"),
        new ExpressionInfo(classOf[WindowEnergies].getName, "window_energies"),
        (children: Seq[Expression]) => WindowEnergies(children.head)),
      (FunctionIdentifier("frame_hists"),
        new ExpressionInfo(classOf[FrameHists].getName, "frame_hists"),
        (children: Seq[Expression]) => FrameHists(children.head)),
      (FunctionIdentifier("char_trigrams"),
        new ExpressionInfo(classOf[CharTrigrams].getName, "char_trigrams"),
        (children: Seq[Expression]) => CharTrigrams(children.head)),
      (FunctionIdentifier("char_counts"),
        new ExpressionInfo(classOf[CharCounts].getName, "char_counts"),
        (children: Seq[Expression]) => CharCounts(children.head)),
      (FunctionIdentifier("dhash_chunks"),
        new ExpressionInfo(classOf[DhashChunks].getName, "dhash_chunks"),
        (children: Seq[Expression]) => DhashChunks(children.head)))

  /** Idempotent post-hoc registration on a live session. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    // ObjectHashAggregate (the exec behind TopKByScore and every other
    // typed Aggregator here) falls back to SORT-based aggregation
    // after 128 distinct keys per task — sized for unbounded object
    // buffers, not ours: a TopKByScore buffer is ≤ k small structs
    // (~0.5 kB at k=32), so a million-group hash map is a few hundred
    // MB per task, while the fallback re-introduces the full
    // candidate-matrix sort the aggregate exists to avoid (measured:
    // the IVF-PQ ADC shortlist over ~200 k query groups). Raise it to
    // keep bounded-buffer aggregations hash-based; users with
    // unbounded custom Aggregators can lower it per session.
    if (spark.conf.getOption(ObjHashFallbackKey).forall(_ == "128"))
      spark.conf.set(ObjHashFallbackKey, (1 << 22).toString)
  }

  private val ObjHashFallbackKey =
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
}
