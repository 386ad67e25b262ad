package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental (delta) near-dup detection — the production
  * LLM-pipeline shape the batch dedup operators don't model: a real
  * corpus pipeline does not re-dedup 100 TB on every ingest; it keeps
  * a PERSISTED signature index and dedups each NEW shard against that
  * index (plus within itself), at cost proportional to the SHARD.
  *
  * Index = per-doc MinHash band signatures (the doc_minhash_lsh
  * banding: 16 bands × 4 rows over distinct 3-shingles — recall
  * ≥ 0.9998 at Jaccard ≥ 0.8, so the LSH output equals exact
  * verification output for oracle purposes) PLUS the distinct-shingle
  * sets, so candidate verification reads the INDEX, never the corpus
  * text. The sets make the index ~shingle-sized (≈ text-sized) — the
  * deliberate trade that keeps the incremental path storage-local; an
  * installation that can't afford it verifies against text fetched by
  * id instead (same join shape, remote fetch).
  *
  * Scale: a shard of s docs against a corpus of n docs costs
  * O(s·bands) signature rows joined hash-partitioned against the
  * index's (band, sig) layout — never O(n·s), never corpus×corpus.
  * The on-disk index is partitioned by band (16 dirs), so the join
  * reads each band's slice co-partitioned; at 100 TB the layout would
  * add sig-range bucketing within band, same join shape. Appending
  * the shard's own signatures afterwards is an append-only write of
  * O(s) rows — no index rewrite.
  */
object IncrementalDedup {

  val Bands = 16
  val RowsPerBand = 4
  val Threshold = 0.8

  /** Persisted-format identity, pinned in the index's `_format.json`
    * (graft.store.IndexMaintenance): readers and appenders fail fast
    * on mismatch instead of silently zero-matching. Version history:
    * v1 (unmarked) carried raw-string 3-word shingles, then
    * md5-digest bytes wrapped in StringType — both unreadable by this
    * code (digest sets never intersect raw-shingle sets; parquet
    * UTF8-annotated strings holding raw digest bytes are rejected by
    * UTF-8-validating readers). v2 = md5 digests persisted as
    * BinaryType (`shingle_repr` below), banding pinned in props.
    * Migration from any other format: rebuild with [[build]].
    */
  val FormatKind = "graft-minhash-dedup-index"
  val FormatVersion = 2
  private def formatProps = Map(
    "shingle_repr" -> "md5-16-binary",
    "bands" -> Bands.toString,
    "rows_per_band" -> RowsPerBand.toString)

  private def conf(s: SparkSession) = s.sparkContext.hadoopConfiguration

  /** Live signatures/sets paths — resolved through the compaction
    * pointer (legacy unversioned layout when never compacted). */
  private def sigPath(s: SparkSession, dir: String): String =
    graft.store.IndexMaintenance.resolve(dir, "signatures", conf(s))
  private def setsPath(s: SparkSession, dir: String): String =
    graft.store.IndexMaintenance.resolve(dir, "sets", conf(s))

  private def checkFormat(s: SparkSession, dir: String): Unit =
    graft.store.IndexMaintenance.checkMarker(
      dir, FormatKind, FormatVersion, formatProps, conf(s))

  /** Write boundary: digest elements leave StringType (the in-plan
    * fast path — see [[TextDedupQueries.shingles]]' codegen-hash-set
    * note) and persist as BinaryType, the honest parquet type for raw
    * md5 bytes: a UTF-8-validating reader (pyarrow, other engines)
    * reads the files instead of rejecting invalid-UTF8 "strings". */
  private def shToBinary(df: DataFrame): DataFrame =
    df.withColumn("sh", expr("transform(sh, x -> binary(x))"))

  /** Read boundary: wrap the stored digest bytes back into StringType
    * so array_intersect and friends stay on the codegen hash-set fast
    * path (binary elements fall to the interpreted ordering scan —
    * the measured 6x regression documented at TextDedupQueries.shingles). */
  private def shToString(df: DataFrame): DataFrame =
    df.withColumn("sh", expr("transform(sh, x -> string(x))"))

  /** (doc_id, band, sig) MinHash band signatures — one fused codegen
    * pass per doc (graft.functions.MinHashBandSigs), nothing
    * per-shingle shuffled.
    */
  def signatures(docs: DataFrame): DataFrame =
    TextDedupQueries.shingles(docs)
      .select(col("doc_id"),
        posexplode(call_function("minhash_band_sigs",
          col("sh"), lit(Bands), lit(RowsPerBand))).as(Seq("band", "sig")))

  /** (doc_id, sh, n) distinct-shingle sets — the verification side of
    * the index. */
  def shingleSets(docs: DataFrame): DataFrame = TextDedupQueries.shingles(docs)

  /** Write the full index for `docs` at `dir`: band-partitioned
    * signatures + shingle sets. One corpus scan, once — every later
    * shard pays only its own size.
    */
  def build(s: SparkSession, docs: DataFrame, dir: String): Unit = {
    graft.store.IndexMaintenance.withMaintenanceLock(dir, conf(s)) {
    graft.GraftExtensions.register(s)
    // retire any compacted-version pointers first: build writes the
    // legacy paths, and a surviving _current would keep readers (and
    // appends) on the PRE-rebuild version — silently stale under a
    // fresh marker (the documented migration path would never migrate)
    graft.store.IndexMaintenance.resetComponents(
      dir, Seq("signatures", "sets"), conf(s))
    signatures(docs).write.mode("overwrite")
      .partitionBy("band").parquet(s"$dir/signatures.parquet")
    graft.store.IndexMaintenance.failPoint("dedup-build:sigs-written")
    shingleSets(docs).transform(shToBinary)
      .write.mode("overwrite").parquet(s"$dir/sets.parquet")
    graft.store.IndexMaintenance.failPoint("dedup-build:sets-written")
    graft.store.IndexMaintenance.writeMarker(
      dir, FormatKind, FormatVersion, formatProps, conf(s))
  }
  }

  /** Append a processed shard's signatures + sets to the index
    * (append-only — no rewrite of existing partitions; lands in the
    * live compacted version when one exists). Fails fast on a
    * format-mismatched index — appending would mix incompatible
    * representations in one directory. */
  def appendIncrement(s: SparkSession, shard: DataFrame, dir: String): Unit = {
    graft.GraftExtensions.register(s)
    checkFormat(s, dir)
    graft.store.IndexMaintenance.guardedAppend(
      dir, Seq("signatures", "sets"), conf(s)) {
      signatures(shard).write.mode("append")
        .partitionBy("band").parquet(sigPath(s, dir))
      graft.store.IndexMaintenance.failPoint("dedup-append:sigs-written")
      shingleSets(shard).transform(shToBinary)
        .write.mode("append").parquet(setsPath(s, dir))
    }
  }

  /** [[appendIncrement]] plus the bounded-maintenance loop: compact
    * when either live component has accumulated more than
    * `fileThreshold` parquet files (one listing, no job — see
    * [[graft.store.IndexMaintenance.compactionDue]]). The shape an
    * ingest pipeline actually runs per shard; steady-state read cost
    * stays O(fileThreshold) files regardless of shard count. Returns
    * true when this call compacted. */
  def appendAndMaybeCompact(s: SparkSession, shard: DataFrame, dir: String,
                            fileThreshold: Int = 64,
                            retainDepth: Int = 1): Boolean = {
    appendIncrement(s, shard, dir)
    val due = graft.store.IndexMaintenance.compactionDue(
      dir, Seq("signatures", "sets"), fileThreshold, conf(s))
    if (due) compact(s, dir, retainDepth)
    due
  }

  /** Dedup `shard` against the PERSISTED index at `dir` — touches the
    * index parquet and the shard only (IncrementalDedupSpec asserts
    * the executed plan's input files all live under `dir`). */
  def dedupIncrement(s: SparkSession, shard: DataFrame, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    checkFormat(s, dir)
    dedupAgainst(
      s.read.parquet(sigPath(s, dir)),
      s.read.parquet(setsPath(s, dir)).transform(shToString),
      shard)
  }

  /** Compact the index: rewrite the live signatures as ONE file per
    * band sorted by (sig, doc_id) — row-group min/max stats then
    * prune probe sigs WITHIN a band partition too — and the live sets
    * range-partitioned and sorted by doc_id, bounding the per-band
    * file count at 1 and the sets file count at `setsPartitions`
    * regardless of how many increments have appended. Published
    * MVCC-style through the `_current.<component>` pointers
    * ([[graft.store.IndexMaintenance.publish]] — the EventStore.compact
    * discipline): an in-flight reader's scan finishes against the
    * version it resolved, retained for `retainDepth` further rewrites.
    */
  def compact(s: SparkSession, dir: String, retainDepth: Int = 1,
              setsPartitions: Int = 0): Unit = {
    graft.store.IndexMaintenance.withMaintenanceLock(dir, conf(s)) {
    checkFormat(s, dir)
    val c = conf(s)
    val im = graft.store.IndexMaintenance
    val nSets = if (setsPartitions > 0) setsPartitions
      else s.conf.get("spark.sql.shuffle.partitions").toInt
    val sigV = im.nextVersionName(dir, "signatures", c)
    s.read.parquet(sigPath(s, dir))
      // heal an at-least-once re-appended shard's duplicate rows
      // (readers are duplicate-immune — distinct candidates, MAX
      // best-match — but the bloat should not survive a rewrite)
      .distinct()
      .repartition(col("band"))
      .sortWithinPartitions("band", "sig", "doc_id")
      .write.partitionBy("band").mode("overwrite").parquet(s"$dir/$sigV")
    val setsV = im.nextVersionName(dir, "sets", c)
    s.read.parquet(setsPath(s, dir))
      .dropDuplicates("doc_id")
      .repartitionByRange(nSets, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(s"$dir/$setsV")
    im.failPoint("dedup-compact:data-written")
    im.publish(dir, "signatures", sigV, c, retainDepth)
    im.failPoint("dedup-compact:sigs-published")
    im.publish(dir, "sets", setsV, c, retainDepth)
  }
  }

  /** Reclaim superseded index versions ([[graft.store.IndexMaintenance.vacuum]]
    * — see its reader-lifetime contract). */
  def vacuum(s: SparkSession, dir: String): Seq[String] = {
    checkFormat(s, dir)
    graft.store.IndexMaintenance.vacuum(dir, Seq("signatures", "sets"), conf(s))
  }

  /** The shared core: flag each shard doc whose best verified match —
    * in the index, or among EARLIER shard docs (keep-first within the
    * batch, the same rule production ingest applies) — reaches
    * Jaccard ≥ 0.8. Emits the audit-friendly per-doc verdict:
    * (doc_id, is_dup, match_id, jaccard), match = highest-Jaccard
    * partner, ties to the lowest id.
    */
  def dedupAgainst(indexSigs: DataFrame, indexSets: DataFrame,
                   shard: DataFrame): DataFrame = {
    val shardSh = shingleSets(shard).transform(graft.Caching.persistOnce(_))
    val shardSigs = shardSh
      .select(col("doc_id"),
        posexplode(call_function("minhash_band_sigs",
          col("sh"), lit(Bands), lit(RowsPerBand))).as(Seq("band", "sig")))
      .transform(graft.Caching.persistOnce(_))
    // candidates vs the index: hash join on (band, sig) — the shard
    // side is the small one; no constraint on ids (disjoint spaces)
    val candIdx = shardSigs.as("s")
      .join(indexSigs.as("i"), Seq("band", "sig"))
      .select(col("s.doc_id").as("doc_id"), col("i.doc_id").as("cand_id"))
    // candidates within the shard: earlier doc wins (keep-first)
    val candSelf = shardSigs.as("x").join(shardSigs.as("y"), Seq("band", "sig"))
      .filter(col("y.doc_id") < col("x.doc_id"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("cand_id"))
    val candidates = candIdx.unionByName(candSelf).distinct()
    // verify with exact Jaccard over the stored / computed sets
    val setsIdx = indexSets
      .select(col("doc_id").as("cand_id"), col("sh").as("sh_c"), col("n").as("n_c"))
    val setsShardAsCand = shardSh
      .select(col("doc_id").as("cand_id"), col("sh").as("sh_c"), col("n").as("n_c"))
    val candSets = setsIdx.unionByName(setsShardAsCand)
    val verified = candidates
      .join(shardSh.select(col("doc_id"), col("sh").as("sh_s"), col("n").as("n_s")), "doc_id")
      .join(candSets, "cand_id")
      .withColumn("inter", size(array_intersect(col("sh_s"), col("sh_c"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n_s") + col("n_c") - col("inter")), 6))
      .filter(col("jaccard") >= Threshold)
    // best match as a packed-(jaccard desc, cand_id asc) MAX — a
    // codegen hash aggregate with map-side combine, not a row_number
    // window over the verified pair stream (the annLshTop1 plan-shape
    // lesson; [[dedupStream]] already uses this encoding). Same
    // winner: highest jaccard, ties to the lowest id.
    val encB = (round(col("jaccard") * 1e6).cast("long") * lit(1L << 43) +
      (lit((1L << 43) - 1) - col("cand_id"))).as("enc")
    val best = verified.select(col("doc_id"), encB)
      .groupBy("doc_id").agg(max(col("enc")).as("m"))
      .select(col("doc_id"),
        (lit((1L << 43) - 1) -
          (col("m") - shiftright(col("m"), 43) * lit(1L << 43))).as("match_id"),
        (shiftright(col("m"), 43).cast("double") / 1e6).as("jaccard"))
    shard.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("match_id").isNotNull.as("is_dup"),
        col("match_id"), col("jaccard"))
      .orderBy("doc_id")
  }

  /** Streaming form of [[dedupIncrement]] — the ingest-time near-dup
    * gate ([[graft.operators.EmbIncrementalDedup.dedupStream]]'s text
    * sibling): documents arriving as (doc_id, text, ingest_ts) flag
    * their best verified match in the PERSISTED index. Within-batch
    * keep-first is deliberately out of scope (a stream-stream
    * self-join; production appends each processed batch to the index,
    * after which later arrivals see it — the same contract as the
    * embedding side). Every pre-state step is a per-row map (shingle
    * digests + band signatures, one codegen pass each) or a
    * stream-static join (candidate band-join, exact-Jaccard
    * verification against the stored sets), so the plan carries ONE
    * stateful operator: the windowed packed-max picking
    * (jaccard desc, cand_id asc) per doc — multi-band (doc, cand)
    * collision duplicates cannot change a MAX, so no streaming
    * dropDuplicates state is held (the annLshTop1 dedup=false lesson,
    * streaming edition).
    */
  def dedupStream(s: SparkSession, docs: DataFrame, dir: String,
                  watermarkDelay: String = "1 hour",
                  windowDuration: String = "10 minutes"): DataFrame = {
    graft.GraftExtensions.register(s)
    checkFormat(s, dir)
    val idxSigs = s.read.parquet(sigPath(s, dir))
    val idxSets = s.read.parquet(setsPath(s, dir)).transform(shToString)
      .select(col("doc_id").as("cand_id"), col("sh").as("sh_c"),
        col("n").as("n_c"))
    val sh = docs.select(col("doc_id"), col("ingest_ts"),
        expr("transform(window_md5s(lower(text), 3), x -> string(x))").as("sh"))
      .withColumn("n", size(col("sh")))
    val sigs = sh.select(col("doc_id"), col("ingest_ts"), col("sh"), col("n"),
      posexplode(call_function("minhash_band_sigs",
        col("sh"), lit(Bands), lit(RowsPerBand))).as(Seq("band", "sig")))
    val cands = sigs.as("s").join(idxSigs.as("i"), Seq("band", "sig"))
      .select(col("s.doc_id").as("doc_id"), col("s.ingest_ts").as("ingest_ts"),
        col("s.sh").as("sh_s"), col("s.n").as("n_s"),
        col("i.doc_id").as("cand_id"))
    val verified = cands.join(idxSets, "cand_id")
      .withColumn("inter", size(array_intersect(col("sh_s"), col("sh_c"))))
      .withColumn("jaccard", round(col("inter").cast("double")
        / (col("n_s") + col("n_c") - col("inter")), 6))
      .filter(col("jaccard") >= Threshold)
    // packed (jaccard desc, cand_id asc) max — the top1BySim encoding
    // (jaccard·10⁶ ≤ 10⁶ < 2^21; cand_id < 2^43 as everywhere)
    val enc = (round(col("jaccard") * 1e6).cast("long") * lit(1L << 43) +
      (lit((1L << 43) - 1) - col("cand_id"))).as("enc")
    verified.select(col("doc_id"), col("ingest_ts"), enc)
      .withWatermark("ingest_ts", watermarkDelay)
      .groupBy(window(col("ingest_ts"), windowDuration), col("doc_id"))
      .agg(max(col("enc")).as("m"))
      .select(col("doc_id"),
        (lit((1L << 43) - 1) -
          (col("m") - shiftright(col("m"), 43) * lit(1L << 43))).as("match_id"),
        (shiftright(col("m"), 43).cast("double") / 1e6).as("jaccard"))
  }

  /** Registry entry: simulate the production split on the documents
    * table — every 5th doc (doc_id % 5 = 0) is the NEW shard, the
    * rest are the already-indexed corpus. The oracle replays with
    * exact all-pairs Jaccard (banding recall exhaustive at ≥ 0.8,
    * the doc_minhash_lsh argument), so the entry is hash-verified
    * end to end.
    */
  val all: Seq[Q] = Seq(
    Q("doc_dedup_incremental",
      (s, d) => {
        graft.GraftExtensions.register(s)
        val docs = Tables.documents(s, d)
        val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
        val shard = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        dedupAgainst(signatures(corpus), shingleSets(corpus), shard)
      },
      Some(s"""${TextDedupQueries.shingleSqlCte},
             sets AS (SELECT doc_id, s, len(s) AS n FROM sh),
             shard AS (SELECT * FROM sets WHERE doc_id % 5 = 0),
             cand AS (
               SELECT b.doc_id, a.doc_id AS cand_id,
                      len(list_intersect(a.s, b.s)) AS inter, a.n AS n_c, b.n AS n_s
               FROM shard b JOIN sets a
                 ON a.doc_id <> b.doc_id
                AND (a.doc_id % 5 <> 0 OR a.doc_id < b.doc_id)),
             hits AS (
               SELECT doc_id, cand_id,
                      round(CAST(inter AS DOUBLE) / (n_s + n_c - inter), 6) AS jaccard
               FROM cand
               WHERE round(CAST(inter AS DOUBLE) / (n_s + n_c - inter), 6) >= $Threshold),
             best AS (
               SELECT doc_id, cand_id AS match_id, jaccard FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY jaccard DESC, cand_id ASC) AS rn FROM hits)
               WHERE rn = 1)
             SELECT s.doc_id, best.match_id IS NOT NULL AS is_dup,
                    best.match_id, best.jaccard
             FROM shard s LEFT JOIN best ON s.doc_id = best.doc_id
             ORDER BY s.doc_id"""))
  )
}
