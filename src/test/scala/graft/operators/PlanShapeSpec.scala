package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Plan-shape regression guard: the 100 TB claims in PLANS_r*.md are
  * properties of the PHYSICAL plan, so pin the load-bearing ones —
  * a lost broadcast or a new exchange is a silent 100× at scale and
  * invisible to the correctness oracle.
  *
  * Shapes are asserted on the executed/explained string at sf0.001;
  * AQE can only CONVERT shuffles to broadcasts at runtime (never the
  * reverse), so "no SortMergeJoin at tiny SF" pins the static choice
  * and "≤ N Exchange" bounds the shuffle count the plan can demand.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = Registry.byName(name).run(spark, sf)
    df.queryExecution.executedPlan.toString()
  }

  private def countOf(s: String, token: String): Int =
    s.sliding(token.length).count(_ == token)

  test("dimension-join TPC-H shapes broadcast, never sort-merge") {
    for (q <- Seq("q8_market_share", "q14_promo_revenue", "q19_disjunctive_revenue",
      "q22_sales_opportunity", "q4_order_priority")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast join")
      assert(!p.contains("SortMergeJoin"), s"$q regressed to SortMergeJoin:\n$p")
    }
  }

  test("q6 is a pure pushed-down scan + aggregate: no join at all") {
    val p = plan("q6_revenue_forecast")
    assert(!p.contains("Join"), s"q6 grew a join:\n$p")
    assert(p.contains("PushedFilters") || p.contains("PushedDataFilters"),
      s"q6 lost predicate pushdown:\n$p")
  }

  test("zero-shuffle operators stay zero-shuffle (plus presentation sort)") {
    // chunker: flatMap-shaped; the only exchange is the cosmetic
    // orderBy's range partitioning
    for (q <- Seq("doc_chunk_sliding", "doc_sample_stratified")) {
      val p = plan(q)
      assert(countOf(p, "Exchange") <= 2, // rangepartitioning exchange (+AQE read)
        s"$q grew a data shuffle:\n$p")
    }
  }

  test("simhash aggregates once: one wide shuffle, no 64x row explosion") {
    val p = plan("doc_simhash")
    // hashpartitioning exchanges: doc_id aggregate + (c, chunk) pairing
    // side; a bit-position (doc_id, j) explosion shape would add more
    assert(countOf(p, "hashpartitioning") <= 4,
      s"doc_simhash shuffle count regressed:\n$p")
  }

  test("the LSH ANN band join ships signatures, not vectors") {
    val p = plan("emb_ann_lsh")
    // the band self-join must join on (band, sig) — its exchanges key
    // on band/sig or the pair dedup, never on an embedding column
    val joinSection = p.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n")
    assert(!joinSection.contains("embedding"),
      s"emb_ann_lsh shuffles embeddings through the band join:\n$joinSection")
  }

  test("ANN top-1 runs as a hash aggregate, never a sorting aggregate") {
    // max(struct(...)) has an immutable buffer, which silently planned
    // SortAggregateExec — at the 100× slice that sorted AND spilled the
    // full exploded candidate matrix per partition. The packed-long
    // encoding keeps the reduction hash-based; pin it for all three
    // ANN families.
    for (q <- Seq("emb_ann_lsh", "emb_ann_ivf", "emb_ann_ivfpq")) {
      val p = plan(q)
      assert(!p.contains("SortAggregate"),
        s"$q top-1 fell back to SortAggregate:\n$p")
    }
  }

  test("round-11 operators: broadcast-joined scan pipelines, no window ranks, no sort-merge") {
    // emb_outliers: two label-keyed aggregations + broadcast joins —
    // a pair join or SMJ here means the centroid side stopped
    // broadcasting
    val po = plan("emb_outliers")
    assert(po.contains("BroadcastHashJoin") && !po.contains("SortMergeJoin"),
      s"emb_outliers lost its broadcast joins:\n$po")
    // mm_scene_cuts: the per-clip lag window is the ONLY data shuffle
    // (plus the presentation sort)
    val pm = plan("mm_scene_cuts")
    assert(countOf(pm, "hashpartitioning") <= 1,
      s"mm_scene_cuts grew a second data shuffle:\n$pm")
    // top-k search entries: ranking must stay the bounded-heap
    // aggregate — a Window rank would shuffle-and-sort the full
    // candidate matrix
    for (q <- Seq("emb_ann_ivf_topk", "emb_ann_ivfpq_topk", "emb_search_index")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q ranks via a window:\n$p")
      assert(!p.contains("SortAggregate"),
        s"$q top-k fell back to SortAggregate:\n$p")
    }
  }

  test("session-5 kernel rides: digests in the scan, no regex/HOF gram builds") {
    // doc_simhash: the vote kernel makes the pre-bucketing side a pure
    // per-row map — no token explode, no regex, no 64-column aggregate
    val ps = plan("doc_simhash")
    assert(ps.contains("simhash_votes"), s"doc_simhash lost its kernel:\n$ps")
    assert(!ps.contains("regexp_extract_all"),
      s"doc_simhash re-grew the token regex:\n$ps")
    // doc_repetition: kernel + two length builtins — no explode, no
    // lambda transform, and the only exchange is the presentation sort
    val pr = plan("doc_repetition")
    assert(pr.contains("window_md5s") && !pr.contains("Generate"),
      s"doc_repetition re-grew the gram explode:\n$pr")
    assert(countOf(pr, "hashpartitioning") == 0,
      s"doc_repetition grew a data shuffle:\n$pr")
    // the shared shingle/gram builds ride the digest kernel everywhere
    for (q <- Seq("doc_ngram_jaccard", "doc_minhash_lsh",
        "doc_dedup_incremental", "doc_decontaminate",
        "doc_boilerplate_overlap", "doc_pipeline_attrition")) {
      val p = plan(q)
      assert(p.contains("window_md5s"), s"$q lost the digest gram build:\n$p")
    }
  }

  test("ngram jaccard: semi-restricted set relation, aggregated candidate filter") {
    val p = plan("doc_ngram_jaccard")
    // the verification sets relation is restricted to docs appearing
    // in some candidate pair BEFORE the pair×set joins — losing the
    // LeftSemi re-ships every never-paired doc's shingle set through
    // the verification exchanges (the round-13 2.67 GB payload)
    assert(p.contains("LeftSemi"),
      s"doc_ngram_jaccard lost the paired-docs semi restriction:\n$p")
    // the candidate stage collapses collision rows through the
    // aggregated PPJoin+ bound (a HashAggregate over (doc_a, doc_b)
    // of min(bound)/count), not a bare distinct — the filter that
    // keeps false candidates out of the set-payload joins
    assert(p.contains("min(bound"),
      s"doc_ngram_jaccard lost the aggregated positional bound:\n$p")
  }

  test("bloom decontamination: fixed-m position relation broadcasts, kernel in the scan") {
    val p = plan("doc_decontaminate_bloom")
    assert(p.contains("window_bloom_positions"),
      s"doc_decontaminate_bloom lost its fused kernel:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"the ≤16^6-position bloom relation stopped broadcasting:\n$p")
  }

  test("incremental dedups rank via the packed-max aggregate, not a window") {
    for (q <- Seq("doc_dedup_incremental", "emb_dedup_incremental")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q ranks via a window again:\n$p")
      assert(!p.contains("SortAggregate"),
        s"$q best-match fell back to SortAggregate:\n$p")
    }
  }

  test("k-means corpus ops: broadcast center join, aggregate ranking, one data shuffle") {
    // assignment is a codegen map against the literal centroid
    // matrix + a cells-row broadcast join for d² — a SMJ or a second
    // hashpartitioning means the center side stopped broadcasting or
    // the agg lost its map-side combine
    for (q <- Seq("emb_kmeans_profile", "emb_cluster_sample")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
        s"$q lost its broadcast center join:\n$p")
      assert(!p.contains("Window"), s"$q ranks via a window:\n$p")
      assert(countOf(p, "hashpartitioning") <= 1,
        s"$q grew a second data shuffle:\n$p")
    }
  }

  test("round-12 operators: model tables broadcast, serving path is a pure projection") {
    // BPE token counting: the (word → n_tok) model join must broadcast
    // (the model is vocabulary-sized by construction) — an SMJ means
    // the corpus word stream started sorting against the model
    val pTok = plan("doc_bpe_tokenize")
    assert(pTok.contains("BroadcastHashJoin") && !pTok.contains("SortMergeJoin"),
      s"doc_bpe_tokenize lost its vocabulary broadcast:\n$pTok")
    // classifier verdicts: the ≤2^D leaf relation broadcasts
    val pClf = plan("doc_quality_classifier")
    assert(pClf.contains("BroadcastHashJoin") && !pClf.contains("SortMergeJoin"),
      s"doc_quality_classifier lost its leaf broadcast:\n$pClf")
    // the SERVING path (train offline, score online) is a zero-shuffle
    // projection — what the streaming funnel deploys per row
    val docs = graft.Tables.documents(spark, sf)
    val model = QualityClassifier.fit(spark, docs)
    val pServe = QualityClassifier.scored(docs, model)
      .queryExecution.executedPlan.toString()
    assert(!pServe.contains("Exchange"),
      s"scored() must stay a pure projection:\n$pServe")
    assert(!pServe.contains("Join"), s"scored() grew a join:\n$pServe")
  }
}
