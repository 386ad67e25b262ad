package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental (delta) EMBEDDING near-dup — the vector-side twin of
  * [[IncrementalDedup]]: a production pipeline does not re-run
  * semantic dedup over 100 TB of embeddings per ingest; it keeps a
  * PERSISTED index and checks each NEW vector shard against it (plus
  * within itself), at cost proportional to the SHARD.
  *
  * Index = per-vector banded hyperplane signatures (the
  * emb_near_dup_lsh banding — at the 0.95 near-dup threshold a true
  * pair escapes all 48 bands × 12 bits with probability ≤ 1.4e-7, so
  * the LSH output equals the exact all-pairs output for oracle
  * purposes) PLUS the raw vectors + norms, so exact-cosine candidate
  * verification reads the INDEX, never the corpus table. Because the
  * hyperplane family is a DETERMINISTIC constant (the shared
  * [[EmbeddingQueries.planes]] seed), a shard's signatures are
  * computable without any fitted/stored quantizer — the index never
  * goes stale the way a learned IVF coarse quantizer can.
  *
  * Scale: a shard of s vectors against a corpus of n costs O(s·bands)
  * signature rows hash-joined against the index's band-partitioned
  * (band, sig) layout, then exact verification only on colliding
  * pairs — never O(n·s), never corpus×corpus. Appending the processed
  * shard is an append-only O(s) write — no index rewrite.
  */
object EmbIncrementalDedup {

  /** Default banding for the file-backed API (a persisted index is
    * necessarily FIXED-banding: every later shard must sign with the
    * banding the index was built at, so callers choose it from the
    * anticipated corpus size via
    * [[EmbeddingQueries.nearDupBandingFor]] and persist the choice
    * with the index). The defaults are the emb_near_dup_lsh oracle
    * constants; the registry twin auto-sizes per corpus instead —
    * with 48×12 fixed, random collisions grow n²/2^12.
    */
  val Bands = 48
  val Bits = 12
  val Threshold = 0.95

  /** Persisted-format identity pinned in `_format.json`
    * (graft.store.IndexMaintenance): besides the representation
    * version, the marker pins the BANDING the index was built at —
    * the scaladoc above says callers "persist the choice with the
    * index", and the marker makes that a fail-fast contract instead
    * of a convention (signing a shard with different banding than the
    * index silently zero-matches). Migration: rebuild with [[build]].
    */
  val FormatKind = "graft-emb-lsh-index"
  val FormatVersion = 1

  private def conf(s: SparkSession) = s.sparkContext.hadoopConfiguration
  private def sigPath(s: SparkSession, dir: String): String =
    graft.store.IndexMaintenance.resolve(dir, "signatures", conf(s))
  private def vecPath(s: SparkSession, dir: String): String =
    graft.store.IndexMaintenance.resolve(dir, "vectors", conf(s))
  private def checkFormat(s: SparkSession, dir: String,
                          nBands: Int, bits: Int): Unit =
    graft.store.IndexMaintenance.checkMarker(dir, FormatKind, FormatVersion,
      Map("bands" -> nBands.toString, "bits" -> bits.toString), conf(s))

  private def signatures(e: DataFrame, nBands: Int, bits: Int): DataFrame =
    e.select(col("vec_id"),
      posexplode(call_function("band_sigs", col("embedding"),
        typedlit(EmbeddingQueries.planes(nBands * bits)), lit(bits)))
        .as(Seq("band", "sig")))

  /** Write the full index for `emb` at `dir`: band-partitioned
    * signatures + the vector table with precomputed norms. One corpus
    * scan, once — every later shard pays only its own size.
    */
  def build(s: SparkSession, emb: DataFrame, dir: String,
            nBands: Int = Bands, bits: Int = Bits): Unit = {
    graft.store.IndexMaintenance.withMaintenanceLock(dir, conf(s)) {
    graft.GraftExtensions.register(s)
    // retire compacted-version pointers first (IncrementalDedup.build's
    // rationale: a surviving _current keeps readers on the pre-rebuild
    // version)
    graft.store.IndexMaintenance.resetComponents(
      dir, Seq("signatures", "vectors"), conf(s))
    signatures(emb, nBands, bits).write.mode("overwrite")
      .partitionBy("band").parquet(s"$dir/signatures.parquet")
    graft.store.IndexMaintenance.failPoint("emb-build:sigs-written")
    EmbeddingQueries.withNorm(emb)
      .select("vec_id", "embedding", "nrm")
      .write.mode("overwrite").parquet(s"$dir/vectors.parquet")
    graft.store.IndexMaintenance.failPoint("emb-build:vectors-written")
    graft.store.IndexMaintenance.writeMarker(dir, FormatKind, FormatVersion,
      Map("bands" -> nBands.toString, "bits" -> bits.toString), conf(s))
  }
  }

  /** Append a processed shard to the index (append-only; lands in the
    * live compacted version when one exists). Fails fast unless the
    * index marker matches this code's format AND the caller's banding. */
  def appendIncrement(s: SparkSession, shard: DataFrame, dir: String,
                      nBands: Int = Bands, bits: Int = Bits): Unit = {
    graft.GraftExtensions.register(s)
    checkFormat(s, dir, nBands, bits)
    graft.store.IndexMaintenance.guardedAppend(
      dir, Seq("signatures", "vectors"), conf(s)) {
      signatures(shard, nBands, bits).write.mode("append")
        .partitionBy("band").parquet(sigPath(s, dir))
      graft.store.IndexMaintenance.failPoint("emb-append:sigs-written")
      EmbeddingQueries.withNorm(shard)
        .select("vec_id", "embedding", "nrm")
        .write.mode("append").parquet(vecPath(s, dir))
    }
  }

  /** [[appendIncrement]] plus the bounded-maintenance loop (see
    * [[IncrementalDedup.appendAndMaybeCompact]]): compact when either
    * live component exceeds `fileThreshold` parquet files. Returns
    * true when this call compacted. */
  def appendAndMaybeCompact(s: SparkSession, shard: DataFrame, dir: String,
                            nBands: Int = Bands, bits: Int = Bits,
                            fileThreshold: Int = 64,
                            retainDepth: Int = 1): Boolean = {
    appendIncrement(s, shard, dir, nBands, bits)
    val due = graft.store.IndexMaintenance.compactionDue(
      dir, Seq("signatures", "vectors"), fileThreshold, conf(s))
    if (due) compact(s, dir, retainDepth)
    due
  }

  /** Dedup `shard` against the PERSISTED index at `dir` — touches the
    * index parquet and the shard only (EmbIncrementalDedupSpec asserts
    * the executed plan's input files all live under `dir`). */
  def dedupIncrement(s: SparkSession, shard: DataFrame, dir: String,
                     nBands: Int = Bands, bits: Int = Bits): DataFrame = {
    graft.GraftExtensions.register(s)
    checkFormat(s, dir, nBands, bits)
    dedupAgainst(s,
      s.read.parquet(sigPath(s, dir)),
      s.read.parquet(vecPath(s, dir)),
      shard, nBands, bits)
  }

  /** Compact the index ([[IncrementalDedup.compact]]'s vector-side
    * twin): live signatures rewritten as ONE file per band sorted by
    * (sig, vec_id), vectors range-partitioned and sorted by vec_id —
    * file counts bounded regardless of increment count — published
    * MVCC-style through the component pointers (in-flight readers
    * finish on the version they resolved; `retainDepth` widens the
    * window).
    */
  def compact(s: SparkSession, dir: String, retainDepth: Int = 1,
              vecPartitions: Int = 0): Unit = {
    graft.store.IndexMaintenance.withMaintenanceLock(dir, conf(s)) {
    graft.store.IndexMaintenance.checkMarker(
      dir, FormatKind, FormatVersion, Map.empty, conf(s))
    val c = conf(s)
    val im = graft.store.IndexMaintenance
    val nVec = if (vecPartitions > 0) vecPartitions
      else s.conf.get("spark.sql.shuffle.partitions").toInt
    val sigV = im.nextVersionName(dir, "signatures", c)
    s.read.parquet(sigPath(s, dir))
      // heal an at-least-once re-appended shard's duplicate rows
      // (readers are duplicate-immune — distinct candidates,
      // topKDistinct — but the bloat should not survive a rewrite)
      .distinct()
      .repartition(col("band"))
      .sortWithinPartitions("band", "sig", "vec_id")
      .write.partitionBy("band").mode("overwrite").parquet(s"$dir/$sigV")
    val vecV = im.nextVersionName(dir, "vectors", c)
    s.read.parquet(vecPath(s, dir))
      .dropDuplicates("vec_id")
      .repartitionByRange(nVec, col("vec_id"))
      .sortWithinPartitions("vec_id")
      .write.mode("overwrite").parquet(s"$dir/$vecV")
    im.failPoint("emb-compact:data-written")
    im.publish(dir, "signatures", sigV, c, retainDepth)
    im.failPoint("emb-compact:sigs-published")
    im.publish(dir, "vectors", vecV, c, retainDepth)
  }
  }

  /** Reclaim superseded index versions ([[graft.store.IndexMaintenance.vacuum]]
    * — see its reader-lifetime contract). */
  def vacuum(s: SparkSession, dir: String): Seq[String] = {
    graft.store.IndexMaintenance.checkMarker(
      dir, FormatKind, FormatVersion, Map.empty, conf(s))
    graft.store.IndexMaintenance.vacuum(dir, Seq("signatures", "vectors"), conf(s))
  }

  /** The shared core: flag each shard vector whose best exact-verified
    * match — in the index, or among EARLIER shard vectors (keep-first,
    * the production ingest rule) — reaches cosine ≥ [[Threshold]].
    * Emits the per-vector verdict (vec_id, is_dup, match_id, sim);
    * match = highest-sim partner, ties to the lowest id.
    */
  def dedupAgainst(s: SparkSession, indexSigs: DataFrame, indexVecs: DataFrame,
                   shard: DataFrame,
                   nBands: Int = Bands, bits: Int = Bits,
                   knownTotal: Option[Long] = None): DataFrame = {
    val shardN = EmbeddingQueries.withNorm(shard)
      .select("vec_id", "embedding", "nrm")
      .transform(graft.Caching.persistOnce(_))
    val shardSigs = signatures(shardN, nBands, bits)
      .transform(graft.Caching.persistOnce(_))
    // candidates vs the index: hash join on (band, sig) — the shard
    // side is small; id spaces are disjoint by construction
    val candIdx = shardSigs.as("s")
      .join(indexSigs.as("i"), Seq("band", "sig"))
      .select(col("s.vec_id").as("vec_id"), col("i.vec_id").as("cand_id"))
    // candidates within the shard: earlier vector wins (keep-first)
    val candSelf = shardSigs.as("x").join(shardSigs.as("y"), Seq("band", "sig"))
      .filter(col("y.vec_id") < col("x.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("cand_id"))
    val candidates = candIdx.unionByName(candSelf).distinct()
    // exact-cosine verification reads stored vectors (index side) and
    // the cached shard — shard side first so the widened pair stream
    // joins the bigger candidate table once (see annLshTop1's order
    // note); no broadcast hint — AQE picks the build side
    val candVecs = indexVecs
      .select(col("vec_id").as("cand_id"), col("embedding").as("ec"),
        col("nrm").as("nc"))
      .unionByName(shardN.select(col("vec_id").as("cand_id"),
        col("embedding").as("ec"), col("nrm").as("nc")))
    // both vector sides under the size guard (the nearDupLsh rationale
    // — without it the pair stream re-exchanged on cand_id with the
    // shard vectors ATTACHED: 374 MB of the query's shuffle at the
    // 100× slice was that one exchange, NgramProfile attribution)
    // the guards need an UPPER BOUND, not an exact size: callers that
    // already counted the base table (the registry twins size their
    // banding from it) pass it and save two count jobs; a bound can
    // only flip a borderline broadcast to the conservative shuffle
    // plan, never change results
    val nShard = knownTotal.getOrElse(shardN.count())
    val nAll = knownTotal.getOrElse(nShard + indexVecs.count())
    val verified = candidates
      .join(EmbeddingQueries.maybeBroadcastVectors(
        shardN.select(col("vec_id"), col("embedding").as("es"),
          col("nrm").as("ns")), nShard), "vec_id")
      .join(EmbeddingQueries.maybeBroadcastVectors(candVecs, nAll), "cand_id")
      .withColumn("sim", round(EmbeddingQueries.dotOverNorms(s,
        col("es"), col("ec"), col("ns"), col("nc")), 6))
      .filter(col("sim") >= Threshold)
    // best match as a packed-(sim desc, cand_id asc) MAX — a codegen
    // hash aggregate with map-side combine over the verified pairs,
    // not a row_number window (which exchanges AND sorts the full
    // pair stream; the annLshTop1 plan-shape lesson). Same winner:
    // highest sim, ties to the lowest id. sim ≥ Threshold > 0 here,
    // so the packed long is monotone.
    val encB = (round(col("sim") * 1e6).cast("long") * lit(1L << 43) +
      (lit((1L << 43) - 1) - col("cand_id"))).as("enc")
    val best = verified.select(col("vec_id"), encB)
      .groupBy("vec_id").agg(max(col("enc")).as("m"))
      .select(col("vec_id"),
        (lit((1L << 43) - 1) -
          (col("m") - shiftright(col("m"), 43) * lit(1L << 43))).as("match_id"),
        (shiftright(col("m"), 43).cast("double") / 1e6).as("sim"))
    shard.select(col("vec_id"))
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("match_id").isNotNull.as("is_dup"),
        col("match_id"), col("sim"))
      .orderBy("vec_id")
  }

  /** Streaming form: dedup vectors AS they arrive against the
    * PERSISTED index — the embedding-side member of the streaming
    * ingest gate family (CorpusIngest.gopherGate /
    * bloomContamination). `vecs` must be a STREAMING DataFrame with
    * (vec_id, embedding, ingest_ts).
    *
    * Everything before the final aggregation is stateless and
    * append-legal: signature explode (a projection), two
    * STREAM-STATIC joins (candidates against the index signatures,
    * vectors against the index vector table), the exact-cosine
    * filter. The ONE stateful operator is the watermarked per-vector
    * best-match aggregation — max over the [[top1]]-style packed
    * (sim, cand) long, emitting when the window passes the watermark.
    *
    * Emits (vec_id, match_id, sim) for FLAGGED vectors only — the
    * absence-is-success shape bloomContamination documents (a vector
    * with no row by watermark close is novel). Within-batch pairs are
    * deliberately NOT checked here (that would be a stream-stream
    * self-join): they are caught when the accumulated shard goes
    * through the batch dedupIncrement + appendIncrement pass — the
    * standard streaming-skims/batch-sweeps split.
    */
  def dedupStream(s: SparkSession, vecs: DataFrame, dir: String,
                  nBands: Int = Bands, bits: Int = Bits,
                  watermarkDelay: String = "1 hour",
                  windowDuration: String = "10 minutes"): DataFrame = {
    graft.GraftExtensions.register(s)
    checkFormat(s, dir, nBands, bits)
    val idxSigs = s.read.parquet(sigPath(s, dir))
    val idxVecs = s.read.parquet(vecPath(s, dir))
      .select(col("vec_id").as("cand_id"), col("embedding").as("ec"),
        col("nrm").as("nc"))
    val vn = vecs.withColumn("ns", sqrt(aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)))
    val sigs = vn.select(col("vec_id"), col("ingest_ts"), col("embedding"),
      col("ns"),
      posexplode(call_function("band_sigs", col("embedding"),
        typedlit(EmbeddingQueries.planes(nBands * bits)), lit(bits)))
        .as(Seq("band", "sig")))
    // no candidate dedup: duplicate (vec_id, cand_id) collisions from
    // multiple bands cannot change the MAX below, and dropDuplicates
    // on a stream would hold unbounded state (the annLshTop1
    // dedup=false lesson, streaming edition) — duplicates only cost a
    // re-evaluated cosine
    val cands = sigs.as("s")
      .join(idxSigs.as("i"), Seq("band", "sig"))
      .select(col("s.vec_id").as("vec_id"), col("s.ingest_ts").as("ingest_ts"),
        col("s.embedding").as("embedding"), col("s.ns").as("ns"),
        col("i.vec_id").as("cand_id"))
    val verified = cands.join(idxVecs, "cand_id")
      .withColumn("sim", round(EmbeddingQueries.dotOverNorms(s,
        col("embedding"), col("ec"), col("ns"), col("nc")), 6))
      .filter(col("sim") >= Threshold)
    // packed (sim desc, cand_id asc) max — the top1BySim encoding
    val enc = (round(col("sim") * 1e6).cast("long") * lit(1L << 43) +
      (lit((1L << 43) - 1) - col("cand_id"))).as("enc")
    verified.select(col("vec_id"), col("ingest_ts"), enc)
      .withWatermark("ingest_ts", watermarkDelay)
      .groupBy(window(col("ingest_ts"), windowDuration), col("vec_id"))
      .agg(max(col("enc")).as("m"))
      .select(col("vec_id"),
        (lit((1L << 43) - 1) - (col("m") - shiftright(col("m"), 43) * lit(1L << 43)))
          .as("match_id"),
        (shiftright(col("m"), 43).cast("double") / 1e6).as("sim"))
  }

  /** Batch approximate top-k search against the persisted index at
    * `dir` — [[searchStream]]'s batch twin (same signatures, same
    * candidate join, same ranking semantics), and the recompute
    * EmbIngestSpec pins the stream against. The ranking is the
    * bounded-heap aggregate, not a window (the emb_ann_ivf_topk
    * design note).
    */
  def searchIndex(s: SparkSession, queries: DataFrame, dir: String, k: Int,
                  nBands: Int = Bands, bits: Int = Bits): DataFrame = {
    checkFormat(s, dir, nBands, bits)
    searchAgainst(s,
      s.read.parquet(sigPath(s, dir)),
      s.read.parquet(vecPath(s, dir)),
      queries, k, nBands, bits)
  }

  /** Semantic (embedding-space) decontamination — the paraphrase-proof
    * complement of the LEXICAL gates (doc_decontaminate's exact
    * 8-grams, doc_decontaminate_bloom): a benchmark item rewritten
    * enough to share no 8-gram still lands next to its source in
    * embedding space, so the corpus is scored against the BENCHMARK
    * index and every vector whose best match reaches `threshold` is
    * flagged (vec_id, bench_id, sim); absence = clean, the
    * bloomContamination reporting shape.
    *
    * This IS the persisted-index search join ([[searchAgainst]] at
    * k = 1) plus a threshold filter — benchmarks are the small,
    * rarely-changing side, exactly what a persisted index is for:
    * index the benchmark suite once ([[build]]), decontaminate every
    * corpus shard against it at shard cost. The top-1-then-threshold
    * order is sound: top-1 is the max sim, so top-1 < t ⟹ all < t.
    */
  def decontaminateAgainst(s: SparkSession, benchSigs: DataFrame,
                           benchVecs: DataFrame, corpus: DataFrame,
                           threshold: Double = Threshold,
                           nBands: Int = Bands, bits: Int = Bits,
                           knownTotal: Option[Long] = None): DataFrame =
    searchAgainst(s, benchSigs, benchVecs, corpus, k = 1, nBands, bits,
      knownTotal)
      .filter(col("sim") >= threshold)
      .select(col("vec_id"), col("match_id").as("bench_id"), col("sim"))
      .orderBy("vec_id")

  /** File-backed [[decontaminateAgainst]]: flag `corpus` vectors
    * against the PERSISTED benchmark index at `dir` (built with
    * [[build]] over the benchmark embeddings). */
  def decontaminateIndex(s: SparkSession, corpus: DataFrame, dir: String,
                         threshold: Double = Threshold,
                         nBands: Int = Bands, bits: Int = Bits): DataFrame = {
    checkFormat(s, dir, nBands, bits)
    decontaminateAgainst(s,
      s.read.parquet(sigPath(s, dir)),
      s.read.parquet(vecPath(s, dir)),
      corpus, threshold, nBands, bits)
  }

  /** The relation-level search core ([[dedupAgainst]]'s sibling):
    * `idxSigs` = (vec_id, band, sig), `idxVecs` = (vec_id, embedding,
    * nrm). Shared by the file-backed [[searchIndex]] and the
    * oracle-verified registry twin below.
    */
  /** Hard-negative mining against the persisted index (the
    * file-backed sibling of
    * [[EmbeddingQueries.hardNegatives]]): each query keeps its most
    * similar INDEX collision whose label differs from its own — the
    * contrastive-data shape when the candidate corpus is already
    * indexed (mine every new shard at shard cost, never re-scan the
    * corpus). Collisions come from the band join; the label filter
    * runs BEFORE the top-1 aggregate, so the winner is the best
    * different-label collision, not "best overall if it happens to
    * differ". `idxLabels` is the narrow (vec_id, label) side relation
    * — broadcast (12 B/row); queries carry their own `label` column.
    * A query with no different-label collision emits no row.
    */
  def mineAgainst(s: SparkSession, idxSigs: DataFrame, idxVecs: DataFrame,
                  idxLabels: DataFrame, queries: DataFrame,
                  nBands: Int = Bands, bits: Int = Bits): DataFrame = {
    graft.GraftExtensions.register(s)
    val iv = idxVecs.select(col("vec_id").as("cand_id"),
      col("embedding").as("ec"), col("nrm").as("nc"))
    val qn = EmbeddingQueries.withNorm(queries)
      .select(col("vec_id"), col("embedding"), col("label"),
        col("nrm").as("ns"))
    val cands = signatures(qn, nBands, bits).as("s")
      .join(idxSigs.as("i"), Seq("band", "sig"))
      .select(col("s.vec_id").as("vec_id"), col("i.vec_id").as("cand_id"))
      .distinct()
    val nIdx = idxVecs.count()
    // the label relation is narrow (12 B/row) but still index-sized:
    // guard the broadcast like the vector sides (a billion-vector
    // index would otherwise ship a multi-GB broadcast)
    val labSide = if (nIdx <= 64000000L)
      broadcast(idxLabels.toDF("cand_id", "c_label"))
    else idxLabels.toDF("cand_id", "c_label")
    cands
      .join(EmbeddingQueries.maybeBroadcastVectors(qn, qn.count()), "vec_id")
      .join(EmbeddingQueries.maybeBroadcastVectors(iv, nIdx), "cand_id")
      .join(labSide, "cand_id")
      .filter(col("label") =!= col("c_label"))
      .withColumn("sim", round(EmbeddingQueries.dotOverNorms(s,
        col("embedding"), col("ec"), col("ns"), col("nc")), 6))
      .groupBy("vec_id")
      .agg(max(struct(col("sim"), (lit(Long.MaxValue) - col("cand_id")).as("inv"),
        col("cand_id"), col("c_label"))).as("b"))
      .select(col("vec_id"), col("b.cand_id").as("match_id"),
        col("b.sim").as("sim"), col("b.c_label").as("c_label"))
      .orderBy("vec_id")
  }

  /** [[mineAgainst]] on the file-backed index. */
  def mineHardNegatives(s: SparkSession, queries: DataFrame, dir: String,
                        idxLabels: DataFrame,
                        nBands: Int = Bands, bits: Int = Bits): DataFrame = {
    checkFormat(s, dir, nBands, bits)
    mineAgainst(s, s.read.parquet(sigPath(s, dir)),
      s.read.parquet(vecPath(s, dir)), idxLabels, queries, nBands, bits)
  }

  /** Streaming twin of [[mineHardNegatives]]: arriving (vec_id,
    * embedding, label, ingest_ts) mine their best different-label
    * index collision as they land — stream-static band join and
    * vector join, the label filter a per-row map, and ONE stateful
    * operator: the windowed packed-max (multi-band collision
    * duplicates cannot change a max — the dedupStream discipline, no
    * dropDuplicates state needed). Emits (vec_id, match_id, sim,
    * c_label) when the watermark closes the window.
    */
  def mineStream(s: SparkSession, queries: DataFrame, dir: String,
                 idxLabels: DataFrame,
                 nBands: Int = Bands, bits: Int = Bits,
                 watermarkDelay: String = "1 hour",
                 windowDuration: String = "10 minutes"): DataFrame = {
    graft.GraftExtensions.register(s)
    checkFormat(s, dir, nBands, bits)
    val idxSigs = s.read.parquet(sigPath(s, dir))
    val idxVecs = s.read.parquet(vecPath(s, dir))
      .select(col("vec_id").as("cand_id"), col("embedding").as("ec"),
        col("nrm").as("nc"))
    val vn = queries.withColumn("ns", sqrt(aggregate(
        zip_with(col("embedding"), col("embedding"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)))
      .withWatermark("ingest_ts", watermarkDelay)
    val sigs = vn.select(col("vec_id"), col("ingest_ts"), col("embedding"),
      col("label"), col("ns"),
      posexplode(call_function("band_sigs", col("embedding"),
        typedlit(EmbeddingQueries.planes(nBands * bits)), lit(bits)))
        .as(Seq("band", "sig")))
    sigs.as("s")
      .join(idxSigs.as("i"), Seq("band", "sig"))
      .select(col("s.vec_id").as("vec_id"), col("s.ingest_ts").as("ingest_ts"),
        col("s.embedding").as("embedding"), col("s.label").as("label"),
        col("s.ns").as("ns"), col("i.vec_id").as("cand_id"))
      .join(idxVecs, "cand_id")
      .join( // mineAgainst's guarded label side — sized by counting the
        // NARROW relation actually broadcast, not by re-scanning the
        // full vectors component a second time at plan time
        if (idxLabels.count() <= 64000000L)
          broadcast(idxLabels.toDF("cand_id", "c_label"))
        else idxLabels.toDF("cand_id", "c_label"),
        "cand_id")
      .filter(col("label") =!= col("c_label"))
      .withColumn("sim", round(EmbeddingQueries.dotOverNorms(s,
        col("embedding"), col("ec"), col("ns"), col("nc")), 6))
      .groupBy(window(col("ingest_ts"), windowDuration), col("vec_id"))
      .agg(max(struct(col("sim"), (lit(Long.MaxValue) - col("cand_id")).as("inv"),
        col("cand_id"), col("c_label"))).as("b"))
      .select(col("vec_id"), col("b.cand_id").as("match_id"),
        col("b.sim").as("sim"), col("b.c_label").as("c_label"))
  }

  def searchAgainst(s: SparkSession, idxSigs: DataFrame, idxVecs: DataFrame,
                    queries: DataFrame, k: Int,
                    nBands: Int = Bands, bits: Int = Bits,
                    knownTotal: Option[Long] = None): DataFrame = {
    graft.GraftExtensions.register(s)
    graft.functions.TopKByScore.tuneForManyGroups(s)
    val iv = idxVecs.select(col("vec_id").as("cand_id"),
      col("embedding").as("ec"), col("nrm").as("nc"))
    val qn = EmbeddingQueries.withNorm(queries)
      .select(col("vec_id"), col("embedding"), col("nrm").as("ns"))
    val cands = signatures(qn, nBands, bits).as("s")
      .join(idxSigs.as("i"), Seq("band", "sig"))
      .select(col("s.vec_id").as("vec_id"), col("i.vec_id").as("cand_id"))
      .distinct()
    // both vector sides size-guard-broadcast (dedupAgainst's note):
    // un-hinted, the pair stream re-exchanged on cand_id carrying the
    // query vectors — 432 MB at the 100× slice
    cands
      .join(EmbeddingQueries.maybeBroadcastVectors(
        qn.select(col("vec_id"), col("embedding"), col("ns")),
        knownTotal.getOrElse(qn.count())), "vec_id")
      .join(EmbeddingQueries.maybeBroadcastVectors(iv,
        knownTotal.getOrElse(idxVecs.count())), "cand_id")
      .withColumn("sim", round(EmbeddingQueries.dotOverNorms(s,
        col("embedding"), col("ec"), col("ns"), col("nc")), 6))
      .groupBy("vec_id")
      // duplicate-pair-idempotent: an at-least-once re-appended shard
      // duplicates vector rows; the candidate join fans out and a plain
      // top-k would seat the same neighbor twice (healed only at the
      // next compaction) — topKDistinct skips exact-duplicate pairs
      .agg(graft.functions.TopKByScore.topKDistinct(k)(col("sim"), col("cand_id")).as("top"))
      .select(col("vec_id"), posexplode(col("top")).as(Seq("pos", "sc")))
      .select(col("vec_id"), (col("pos") + 1).cast("int").as("rnk"),
        col("sc.id").as("match_id"), col("sc.score").as("sim"))
      .orderBy("vec_id", "rnk")
  }

  /** Streaming approximate top-k SEARCH against the persisted index —
    * the online ANN-serving shape (dedupStream answers "is this new
    * vector a duplicate?"; this answers "what are the k nearest
    * indexed vectors to this query?"). `queries` must be a STREAMING
    * DataFrame with (vec_id, embedding, ingest_ts).
    *
    * Same stateless stream-static front end as [[dedupStream]]
    * (signature explode, band join, exact-cosine over stored
    * vectors), with two deliberate differences:
    *  - duplicate (query, candidate) collisions from multiple bands
    *    were harmless under dedupStream's MAX but would occupy
    *    multiple top-k slots here, so they are removed with
    *    `dropDuplicatesWithinWatermark` — the bounded-state streaming
    *    dedup (plain dropDuplicates would hold every pair ever seen) —
    *    BEFORE the vector join, which also spares the duplicate
    *    cosines;
    *  - no similarity threshold: search returns the best k whatever
    *    their score, ranked by the bounded-heap [[TopKByScore]]
    *    aggregate (the one stateful aggregation, watermarked like
    *    dedupStream's max).
    *
    * Emits (vec_id, rnk 1-based, match_id, sim) per query when its
    * window passes the watermark; a query whose signatures collide
    * with nothing emits nothing (empty candidate set — the caller
    * widens banding or falls back to a batch scan for exhaustive
    * search; EmbIngestSpec pins stream ≡ batch on the same index).
    */
  def searchStream(s: SparkSession, queries: DataFrame, dir: String, k: Int,
                   nBands: Int = Bands, bits: Int = Bits,
                   watermarkDelay: String = "1 hour",
                   windowDuration: String = "10 minutes"): DataFrame = {
    graft.GraftExtensions.register(s)
    graft.functions.TopKByScore.tuneForManyGroups(s)
    checkFormat(s, dir, nBands, bits)
    val idxSigs = s.read.parquet(sigPath(s, dir))
    val idxVecs = s.read.parquet(vecPath(s, dir))
      .select(col("vec_id").as("cand_id"), col("embedding").as("ec"),
        col("nrm").as("nc"))
    val vn = queries.withColumn("ns", sqrt(aggregate(
        zip_with(col("embedding"), col("embedding"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)))
      .withWatermark("ingest_ts", watermarkDelay)
    val sigs = vn.select(col("vec_id"), col("ingest_ts"), col("embedding"),
      col("ns"),
      posexplode(call_function("band_sigs", col("embedding"),
        typedlit(EmbeddingQueries.planes(nBands * bits)), lit(bits)))
        .as(Seq("band", "sig")))
    val cands = sigs.as("s")
      .join(idxSigs.as("i"), Seq("band", "sig"))
      .select(col("s.vec_id").as("vec_id"), col("s.ingest_ts").as("ingest_ts"),
        col("s.embedding").as("embedding"), col("s.ns").as("ns"),
        col("i.vec_id").as("cand_id"))
      .dropDuplicatesWithinWatermark("vec_id", "cand_id")
    val scored = cands.join(idxVecs, "cand_id")
      .withColumn("sim", round(EmbeddingQueries.dotOverNorms(s,
        col("embedding"), col("ec"), col("ns"), col("nc")), 6))
    scored.groupBy(window(col("ingest_ts"), windowDuration), col("vec_id"))
      // duplicate-pair-idempotent: an at-least-once re-appended shard
      // duplicates vector rows; the candidate join fans out and a plain
      // top-k would seat the same neighbor twice (healed only at the
      // next compaction) — topKDistinct skips exact-duplicate pairs
      .agg(graft.functions.TopKByScore.topKDistinct(k)(col("sim"), col("cand_id")).as("top"))
      .select(col("vec_id"), posexplode(col("top")).as(Seq("pos", "sc")))
      .select(col("vec_id"), (col("pos") + 1).cast("int").as("rnk"),
        col("sc.id").as("match_id"), col("sc.score").as("sim"))
  }

  /** Registry entry: simulate the production split on the embeddings
    * table — every 5th vector is the NEW shard, the rest are the
    * already-indexed corpus. Banding is CORPUS-SIZED
    * ([[EmbeddingQueries.nearDupBandingFor]] — with fixed 48×12,
    * random collisions grow n²/2^bits, the emb_near_dup_lsh
    * fixed-twin lesson), and the oracle replays with exact all-pairs
    * cosine: banding recall is exhaustive at threshold 0.95 at every
    * auto operating point, so the entry is hash-verified end to end,
    * banding-independent.
    */
  val all: Seq[Q] = Seq(
    Q("emb_dedup_incremental",
      (s, d) => {
        graft.GraftExtensions.register(s)
        val e = Tables.embeddings(s, d)
        val corpus = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
        val shard = e.filter(pmod(col("vec_id"), lit(5)) === 0)
        val n = e.count()
        val (bands, bits) = EmbeddingQueries.nearDupBandingFor(n, Threshold)
        dedupAgainst(s,
          signatures(corpus, bands, bits),
          EmbeddingQueries.withNorm(corpus).select("vec_id", "embedding", "nrm"),
          shard, bands, bits, knownTotal = Some(n))
      },
      Some(s"""WITH n AS (
               SELECT vec_id, embedding,
                      sqrt(${EmbeddingQueries.dotSql("embedding", "embedding")}) AS nrm
               FROM embeddings),
             shard AS (SELECT * FROM n WHERE vec_id % 5 = 0),
             hits AS (
               SELECT b.vec_id, a.vec_id AS cand_id,
                      round(${EmbeddingQueries.dotSql("a.embedding", "b.embedding")} /
                            (a.nrm * b.nrm), 6) AS sim
               FROM shard b JOIN n a
                 ON a.vec_id <> b.vec_id
                AND (a.vec_id % 5 <> 0 OR a.vec_id < b.vec_id)
               WHERE round(${EmbeddingQueries.dotSql("a.embedding", "b.embedding")} /
                           (a.nrm * b.nrm), 6) >= $Threshold),
             best AS (
               SELECT vec_id, cand_id AS match_id, sim FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY sim DESC, cand_id ASC) AS rn FROM hits)
               WHERE rn = 1)
             SELECT s.vec_id, best.match_id IS NOT NULL AS is_dup,
                    best.match_id, best.sim
             FROM shard s LEFT JOIN best ON s.vec_id = best.vec_id
             ORDER BY s.vec_id""")),

    // ----------------------------------------------------------------
    // Index search, oracle-verified: the searchIndex/searchStream
    // semantics (top-k of banded-signature collisions against an
    // index, NO similarity threshold) on the same production split as
    // emb_dedup_incremental. Unlike the dedup twin — whose 0.95
    // threshold makes exhaustive-recall banding collapse the oracle to
    // exact all-pairs — an unthresholded top-k is banding-DEPENDENT,
    // so the oracle replays the signature construction itself (the
    // annLshOracleSql plane/sig CTEs, minus multi-probe: search
    // collides on home buckets) and ranks collisions exactly. Banding
    // is the emb_ann_lsh_auto family (annLshBandsFor/BitsFor — bucket
    // occupancy ~2 at any n), evaluated at the oracle-scale constants
    // in the replay; AnnAutoSizeSpec-style coincidence holds because
    // both formulas sit on their floors at n = 500.
    Q("emb_search_index",
      (s, d) => {
        graft.GraftExtensions.register(s)
        val e = Tables.embeddings(s, d)
        val corpus = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
        val queries = e.filter(pmod(col("vec_id"), lit(5)) === 0)
        val n = e.count()
        val bands = EmbeddingQueries.annLshBandsFor(n)
        val bits = EmbeddingQueries.annLshBitsFor(n)
        searchAgainst(s,
          signatures(corpus, bands, bits),
          EmbeddingQueries.withNorm(corpus).select("vec_id", "embedding", "nrm"),
          queries, k = 5, bands, bits, knownTotal = Some(n))
      },
      Some(searchOracleSql(
        EmbeddingQueries.annLshBandsFor(500), EmbeddingQueries.annLshBitsFor(500),
        k = 5))),

    // ----------------------------------------------------------------
    // Semantic decontamination, oracle-verified: every 20th vector
    // plays the BENCHMARK suite, the rest are the corpus; corpus
    // vectors whose best benchmark match reaches cosine ≥ 0.95 are
    // flagged with that match. Banding is corpus-sized
    // (nearDupBandingFor — recall exhaustive at ≥ 0.95 at every auto
    // operating point), so although the flags flow through the
    // banded index join, the flagged set equals the exact all-pairs
    // answer and the oracle replays with exact cosine — the
    // emb_dedup_incremental argument, one-directional.
    Q("emb_decontaminate",
      (s, d) => {
        graft.GraftExtensions.register(s)
        val e = Tables.embeddings(s, d)
        val bench = e.filter(pmod(col("vec_id"), lit(20)) === 0)
        val corpus = e.filter(pmod(col("vec_id"), lit(20)) =!= 0)
        val n = e.count()
        val (bands, bits) = EmbeddingQueries.nearDupBandingFor(n, Threshold)
        decontaminateAgainst(s,
          signatures(bench, bands, bits),
          EmbeddingQueries.withNorm(bench).select("vec_id", "embedding", "nrm"),
          corpus, Threshold, bands, bits, knownTotal = Some(n))
      },
      Some(s"""WITH n AS (
               SELECT vec_id, embedding,
                      sqrt(${EmbeddingQueries.dotSql("embedding", "embedding")}) AS nrm
               FROM embeddings),
             hits AS (
               SELECT c.vec_id, b.vec_id AS bench_id,
                      round(${EmbeddingQueries.dotSql("c.embedding", "b.embedding")} /
                            (c.nrm * b.nrm), 6) AS sim
               FROM n c JOIN n b
                 ON c.vec_id % 20 <> 0 AND b.vec_id % 20 = 0
               WHERE round(${EmbeddingQueries.dotSql("c.embedding", "b.embedding")} /
                           (c.nrm * b.nrm), 6) >= $Threshold)
             SELECT vec_id, bench_id, sim FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY sim DESC, bench_id ASC) AS rn FROM hits)
             WHERE rn = 1 ORDER BY vec_id"""))
  )

  /** DuckDB replay of the search pipeline: plane dots → band
    * signatures (the annLshOracleSql sigs construction) → home-bucket
    * collisions across the index/query split → exact-cosine top-k.
    */
  private def searchOracleSql(nBands: Int, bits: Int, k: Int): String = {
    val planeRows = EmbeddingQueries.planes(nBands * bits).zipWithIndex
      .map { case (row, p) =>
        s"($p, [${row.map(f => s"CAST('$f' AS FLOAT)").mkString(",")}])"
      }.mkString(",")
    s"""WITH pl(p, plane) AS (VALUES $planeRows),
       bits AS (
         SELECT e.vec_id, pl.p,
                ${EmbeddingQueries.dotSql("e.embedding", "pl.plane")} AS d
         FROM embeddings e, pl),
       sigs AS (
         SELECT vec_id, p // $bits AS band,
                CAST(sum(CASE WHEN d >= 0 THEN 1 ELSE 0 END * (1 << (p % $bits))) AS BIGINT) AS sig
         FROM bits GROUP BY vec_id, p // $bits),
       n AS (
         SELECT vec_id, embedding,
                sqrt(${EmbeddingQueries.dotSql("embedding", "embedding")}) AS nrm
         FROM embeddings),
       cand AS (
         SELECT DISTINCT q.vec_id AS qid, s.vec_id AS cid
         FROM sigs q JOIN sigs s ON q.band = s.band AND q.sig = s.sig
         WHERE q.vec_id % 5 = 0 AND s.vec_id % 5 <> 0),
       ranked AS (
         SELECT c.qid, c.cid,
                round(${EmbeddingQueries.dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS sim,
                row_number() OVER (PARTITION BY c.qid
                  ORDER BY round(${EmbeddingQueries.dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) DESC,
                           c.cid ASC) AS rnk
         FROM cand c JOIN n a ON c.qid = a.vec_id JOIN n b ON c.cid = b.vec_id)
       SELECT qid AS vec_id, CAST(rnk AS INT) AS rnk, cid AS match_id, sim
       FROM ranked WHERE rnk <= $k ORDER BY vec_id, rnk"""
  }
}
