package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant tests for the round-10 operators (SCD2 intervals, CCNet
  * perplexity buckets, Bloom decontamination) on the sf0.001 fixture.
  * Exact cross-engine agreement is the DuckDB oracle's job (Verify);
  * these pin the structural properties each op must hold on any data.
  */
class Round10OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("es_scd2_intervals: intervals chain per user, compact consecutive states, one open row") {
    import java.time.{LocalDateTime, ZoneOffset}
    def epochMicros(t: LocalDateTime): Long =
      t.toEpochSecond(ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
    val rows = Registry.byName("es_scd2_intervals").run(spark, sf)
      .collect()
      .groupBy(_.getLong(0))
    assert(rows.nonEmpty)
    for ((_, history) <- rows) {
      val sorted = history.sortBy(r =>
        (epochMicros(r.getAs[LocalDateTime](2)), r.getString(1)))
      // exactly one current (open) interval per user, and it is the last
      assert(sorted.count(_.getBoolean(4)) == 1)
      assert(sorted.last.getBoolean(4) && sorted.last.isNullAt(3))
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray) if sorted.length > 1) {
        // each interval closes exactly where the next opens…
        assert(a.getAs[LocalDateTime](3) == b.getAs[LocalDateTime](2))
        // …and consecutive intervals really are state CHANGES
        assert(a.getString(1) != b.getString(1))
      }
    }
  }

  test("es_scd2_intervals: interval count = 1 + state changes in the raw ts-ordered stream") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) =>
        val states = rs.sortBy(r => (r.getTimestamp(2).getTime / 1000,
          r.getTimestamp(2).getNanos, r.getLong(3))).map(_.getString(1))
        u -> (1 + states.sliding(2).count(p => p.length == 2 && p(0) != p(1)))
      }
    val got = Registry.byName("es_scd2_intervals").run(spark, sf)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got == ev)
  }

  test("doc_ccnet_buckets: tertiles per language are balanced and ordered by avg_nll") {
    val rows = Registry.byName("doc_ccnet_buckets").run(spark, sf).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getString(1))
    for ((_, rs) <- byLang) {
      val counts = rs.groupBy(_.getInt(3)).map { case (t, g) => t -> g.length }
      // NTILE balance: sizes differ by at most 1 across the 3 buckets
      assert(counts.values.max - counts.values.min <= 1)
      // every doc in a lower tertile scores ≤ every doc in a higher one
      val maxByTertile = counts.keys.toSeq.sorted.map(t =>
        rs.filter(_.getInt(3) == t).map(_.getDouble(2)).max)
      val minByTertile = counts.keys.toSeq.sorted.map(t =>
        rs.filter(_.getInt(3) == t).map(_.getDouble(2)).min)
      for (i <- 1 until maxByTertile.length)
        assert(maxByTertile(i - 1) <= minByTertile(i) + 1e-9)
      // label mapping is fixed
      assert(rs.forall(r => r.getString(4) ==
        (r.getInt(3) match { case 1 => "head"; case 2 => "middle"; case _ => "tail" })))
    }
  }

  test("emb_rand_proj: shuffle-free plan and JL norm preservation") {
    val df = Registry.byName("emb_rand_proj").run(spark, sf)
    // the projection itself is a pure per-row map — the ONLY exchange
    // allowed in the plan is the closing presentation orderBy
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      "emb_rand_proj should not hash-shuffle — it is a per-row map")
    val proj = df.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    val orig = graft.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    assert(proj.keySet == orig.keySet)
    assert(proj.values.forall(_.length == 16))
    // E[||Px||^2] = 16 * ||x||^2 for a ±1 sign matrix; averaged over
    // the corpus the ratio concentrates — allow a generous band.
    val ratios = proj.toSeq.map { case (id, p) =>
      val pn = p.map(x => x * x).sum / 16.0
      val on = orig(id).map(x => x * x).sum
      pn / on
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"JL mean norm ratio off: $mean")
  }

  test("doc_decontaminate_bloom: zero false negatives vs the exact join (superset)") {
    val exact = Registry.byName("doc_decontaminate").run(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Registry.byName("doc_decontaminate_bloom").run(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Bloom has no false negatives: every exactly-contaminated doc is
    // flagged, with at least as many gram hits.
    for ((docId, nExact) <- exact) {
      assert(bloom.contains(docId), s"doc $docId lost by the bloom pass")
      assert(bloom(docId) >= nExact, s"doc $docId bloom hits ${bloom(docId)} < exact $nExact")
    }
    // and at m=16^6, k=4 the false-positive budget is tiny: the bloom
    // total should sit within a whisker of the exact total.
    val extra = bloom.values.sum - exact.values.sum
    assert(extra >= 0 && extra <= math.max(2L, exact.values.sum / 100),
      s"unexpected bloom false-positive volume: +$extra over ${exact.values.sum}")
  }
}
