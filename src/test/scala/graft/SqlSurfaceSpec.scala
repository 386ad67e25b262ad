package graft

/** The raw-SQL front door: registerSqlViews exposes every table as a
  * temp view (events nanosecond handling included) plus the custom
  * Catalyst functions, so plain `spark.sql` — the surface a user of
  * the SQL reference expects — drives the engine.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("plain SQL over the registered views matches the DataFrame registry") {
    Tables.registerSqlViews(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, count(*) AS n FROM lineitem
         GROUP BY l_returnflag ORDER BY l_returnflag""").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val viaDf = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").count().orderBy("l_returnflag").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(viaSql === viaDf)
  }

  test("events view carries the normalized microsecond timestamp") {
    Tables.registerSqlViews(spark, sf)
    val row = spark.sql(
      "SELECT min(ts) AS lo, max(ts) AS hi, count(*) AS n FROM events").head()
    assert(row.getAs[java.sql.Timestamp]("lo").getTime > 0L)
    assert(row.getLong(2) > 0L)
    // joins across views work (events × a TPC-H dim is nonsensical
    // semantically but exercises the catalog)
    assert(spark.sql(
      """SELECT count(*) FROM events e JOIN nation n
         ON pmod(e.user_id, 25) = n.n_nationkey""").head().getLong(0) > 0L)
  }

  /** Registry-wide front-door sweep: every oracle whose SQL Spark can
    * parse AND execute must produce the same result through
    * `spark.sql` as through the DataFrame registry form. Oracles
    * written in DuckDB-only dialect (list comprehensions,
    * string_split, 4-arg regexp_replace, …) are recorded as skips —
    * they are the documented non-Spark-SQL-expressible few; the
    * ANSI-shaped majority (TPC-H, aggregates, windows, set ops) must
    * all agree. Mismatches fail the test: a query that parses but
    * disagrees is a real dialect-semantics hazard a SQL user would
    * hit at the front door.
    */
  test("registry sweep: every Spark-parsable oracle agrees with its DataFrame form") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.col
    Tables.registerSqlViews(spark, sf)

    // normalized, order-insensitive result image (columns sorted by
    // name — the driver's own compare convention; floats rounded so
    // aggregation-order noise can't fail an agreement check)
    def image(df: DataFrame): Seq[Seq[String]] = {
      val cols = df.columns.sorted.toSeq
      val tsFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      df.select(cols.map(col): _*).collect().toSeq.map(_.toSeq.map {
        case null => "<null>"
        case d: Double => f"$d%.6g"
        case f: Float => f"$f%.6g"
        case b: java.math.BigDecimal => f"${b.doubleValue()}%.6g"
        // SQL yields TIMESTAMP (session-tz java.sql.Timestamp), the
        // registry yields TIMESTAMP_NTZ (LocalDateTime) — same instant
        // under the UTC session; render both canonically
        case t: java.sql.Timestamp =>
          t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDateTime.format(tsFmt)
        case l: java.time.LocalDateTime => l.format(tsFmt)
        case x => x.toString
      }).sortBy(_.mkString("|"))
    }

    val skipped = scala.collection.mutable.Buffer.empty[String]
    val mismatched = scala.collection.mutable.Buffer.empty[String]
    var agreed = 0
    for ((name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      val viaSql =
        try Some(image(spark.sql(sql)))
        catch {
          // DuckDB-only dialect: parse/analysis failures, or execution
          // failures from functions whose Spark namesake differs
          case _: org.apache.spark.sql.catalyst.parser.ParseException => None
          case _: org.apache.spark.sql.AnalysisException => None
          case scala.util.control.NonFatal(_) => None
        }
      viaSql match {
        case None => skipped += name
        case Some(s) =>
          val d = image(SparkEntry.queries(name)(spark, sf))
          if (s == d) agreed += 1
          else {
            mismatched += name
            info(s"MISMATCH $name: sql=${s.take(3)} df=${d.take(3)}")
          }
      }
    }
    info(s"front-door sweep: $agreed agreed, ${skipped.size} dialect-skipped")
    info(s"skipped: ${skipped.mkString(", ")}")
    assert(mismatched.isEmpty,
      s"SQL front door disagrees with the DataFrame registry on: $mismatched")
    // the sweep must stay meaningful: the ANSI-shaped majority of the
    // registry (TPC-H + aggregates + windows + set ops) parses on Spark
    assert(agreed >= 55, s"only $agreed oracles ran via spark.sql — sweep degraded")
    // Every dialect skip is a DOCUMENTED decision, not drift: the set
    // below is the pinned inventory of oracles written in DuckDB-only
    // SQL (list_* lambdas and list comprehensions; MATERIALIZED
    // recursive CTE chains replaying BPE/CART training; `//` integer
    // division; 4-arg regexp_replace/extract flags; LATERAL unnest
    // tuples; md5_number_lower). A NEW registry entry whose oracle
    // Spark cannot parse fails here until it is either given an
    // ANSI-shaped oracle or deliberately added.
    val documentedSkips = Set(
      // DuckDB list lambdas / comprehensions over arrays
      "a8_array_agg", "a_grouping_sets", "doc_chunk_sliding",
      "doc_fingerprint", "doc_langid", "doc_repetition",
      "doc_text_stats", "doc_token_count", "doc_winnow_fingerprint",
      "doc_quality", "doc_gopher_rules", "doc_ccnet_buckets",
      "doc_lm_nll", "doc_pii_scrub", "f_scalar_kitchen",
      "es_f10_sequence", "es_f2_interval", "es_f3_strings",
      "es_f4_regex", "es_f6_json_envelope", "es_f7_uuid",
      "es_w1_lag_gaps", "es_percentiles", "es_retention_cohorts",
      "es_session_window", "es_window_hopping", "es_asof_join",
      "mm_audio_features", "mm_blob_meta", "mm_frame_sample",
      "mm_phash_dedup", "mm_scene_cuts", "mm_text_image_pairs",
      "mm_voice_segments",
      // shingle/gram pipelines on md5_number_lower + list ops
      "doc_minhash_lsh", "doc_ngram_jaccard", "doc_simhash",
      "doc_substring_dedup", "doc_neardup_clusters", "doc_fuzzy_match",
      "doc_dedup_incremental", "doc_decontaminate",
      "doc_decontaminate_bloom", "doc_boilerplate_overlap",
      "doc_dup_rate_by_source",
      // corpus statistics/packing with DuckDB-only division or windows
      "doc_bm25_topk", "doc_search_index", "doc_tfidf_topk",
      "doc_vocab_topk", "doc_dsir_weights", "doc_mixing_weights",
      "doc_sample_weighted", "doc_shuffle_shards", "doc_pack_sequences",
      "doc_pack_sequences_bpe", "doc_pipeline_attrition",
      // MATERIALIZED training-replay CTE chains (BPE, CART)
      "doc_bpe_vocab", "doc_bpe_tokenize", "doc_bpe_fertility",
      "doc_quality_classifier", "doc_quality_clf_model",
      // embedding pipelines: list_transform dot products + quantizer
      // replays
      "emb_cosine_topk", "emb_near_dup", "emb_near_dup_lsh",
      "emb_near_dup_lsh_auto", "emb_ann_lsh", "emb_ann_lsh_auto",
      "emb_ann_ivf", "emb_ann_ivf_auto", "emb_ann_ivf_topk",
      "emb_ann_ivfpq", "emb_ann_ivfpq_auto", "emb_ann_ivfpq_topk",
      "emb_semdedup", "emb_semdedup_auto", "emb_hard_negatives",
      "emb_decontaminate", "emb_dedup_incremental", "emb_search_index",
      "emb_cluster_sample", "emb_kmeans_profile", "emb_label_centroids",
      "emb_outliers", "emb_rand_proj", "emb_scalar_quantize")
    val undocumented = skipped.toSet -- documentedSkips
    val stale = documentedSkips -- SparkEntry.oracleSql.keySet
    assert(undocumented.isEmpty,
      s"dialect skips not in the documented inventory: $undocumented")
    assert(stale.isEmpty, s"documented skips no longer in the registry: $stale")
    // a documented skip that now PARSES has been promoted — remove it
    val promoted = documentedSkips -- skipped.toSet
    assert(promoted.isEmpty,
      s"these oracles now run via spark.sql — drop them from the skip list: $promoted")
  }

  test("registry consistency: oracles key real queries; only the documented few lack oracles") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val orphans = o -- q
    assert(orphans.isEmpty, s"oracles without a query (typo guard): $orphans")
    // rows-only entries must stay a deliberate, documented set — a new
    // operator landing without an oracle should fail here first.
    // Round 9 closed the last two (the ANN autos carry the replay SQL
    // generated at the formulas' oracle-scale constants), so the set
    // is empty: EVERY registry entry is hash-verified.
    val rowsOnly = q -- o
    assert(rowsOnly.isEmpty, s"undocumented rows-only queries: $rowsOnly")
  }

  test("custom Catalyst functions are callable from SQL") {
    Tables.registerSqlViews(spark, sf)
    val sims = spark.sql(
      """SELECT a.vec_id, round(cosine_sim(a.embedding, a.embedding), 6) AS self_sim
         FROM embeddings a ORDER BY a.vec_id LIMIT 5""").collect()
    assert(sims.length === 5)
    sims.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"self-cosine must be 1.0: $r"))
    val sigs = spark.sql(
      """SELECT size(band_sigs(embedding,
           array(array(CAST(0.5 AS FLOAT)), array(CAST(-0.5 AS FLOAT))), 1)) AS n
         FROM embeddings LIMIT 1""").head()
    assert(sigs.getInt(0) === 2, "two 1-bit bands from two planes")
  }
}
