package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregate: keeps the k highest-scoring (score, id)
  * pairs, ties broken by ascending id — the aggregation-shaped
  * replacement for `row_number().over(partitionBy(q).orderBy(score
  * desc)) <= k`.
  *
  * Why it exists (scale): the window form shuffles EVERY candidate row
  * to its query's partition before ranking — for a k-NN join that is
  * the full candidate matrix (|q|·|c| rows). An Aggregator gets
  * map-side partial aggregation: each task reduces its slice to ≤ k
  * pairs per query before the shuffle, so the exchange carries
  * O(|q| · k · tasks) instead of O(|q| · |c|).
  *
  * The buffer is a mutable bounded binary MIN-heap over primitive
  * arrays (root = current worst kept pair): a non-competitive candidate
  * is rejected with ONE comparison against the root, a competitive one
  * costs O(log k). The previous immutable-Vector buffer paid an O(k)
  * indexWhere + rebuild per accepted candidate — at the IVF-PQ auto
  * operating point (rerank ≈ 3 600, ~14 k candidates/query, 200 k
  * queries at the 100× slice) that is ~10^12 element copies, the
  * direct cause of the round-11 sweep's 900 s timeout. Heap order is
  * (score ASC, id DESC) so the root is always the first pair the
  * (score DESC, id ASC) contract would evict.
  *
  * Callers with high group cardinality must raise
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * (default 128): past it ObjectHashAggregate silently re-SORTS every
  * task's input slice by group key — the exact candidate-matrix sort
  * this aggregate exists to avoid. See EmbeddingQueries.annConf.
  *
  * Determinism: merge folds one heap into the other; the kept set
  * ((score DESC, id ASC) top-k with truncation at k) is
  * merge-order-insensitive, so results are stable across
  * partitionings and equal to the window form. finish() sorts the
  * ≤ k survivors once.
  */
final case class Scored(score: Double, id: Long)

/** Mutable heap buffer; `n` is the live size. Encoded (only at
  * partial-aggregate shuffle boundaries) as primitive arrays.
  */
final case class TopKHeap(var n: Int, scores: Array[Double], ids: Array[Long])

/** `distinctPairs = true` makes the aggregate idempotent to EXACT
  * duplicate (score, id) inputs: an incoming pair already present in
  * the heap is skipped (O(n ≤ k) scan — used only by the small-k
  * persisted-index search paths). This is sound, not best-effort: a
  * duplicate whose twin was EVICTED is rejected by the same strict
  * competitiveness test that evicted the twin (worse() is a total
  * order), so a pair can never occupy two slots. Exists for the
  * at-least-once ingest story — a re-appended shard duplicates index
  * vector rows, the candidate join fans out, and without this the
  * same neighbor would fill multiple top-k slots until compaction
  * dedups the component. */
final class TopKByScore(k: Int, distinctPairs: Boolean = false)
  extends Aggregator[Scored, TopKHeap, Seq[Scored]] {

  @inline private def containsPair(h: TopKHeap, score: Double, id: Long): Boolean = {
    var i = 0
    while (i < h.n) {
      if (h.ids(i) == id && h.scores(i) == score) return true
      i += 1
    }
    false
  }

  // a is WORSE than b in the keep-order (score desc, id asc) — i.e. a
  // would be evicted before b.
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  // Capacity grows geometrically up to k so a partially-filled buffer
  // serializes O(n), not O(k), at partial-aggregate shuffle boundaries
  // (at the IVF-PQ operating point k is thousands; most groups a task
  // sees are far from full).
  override def zero: TopKHeap =
    TopKHeap(0, new Array[Double](0), new Array[Long](0))

  private def ensureRoom(h: TopKHeap): TopKHeap =
    if (h.n < h.scores.length) h
    else {
      val cap = math.min(k, math.max(16, h.scores.length * 2))
      TopKHeap(h.n, java.util.Arrays.copyOf(h.scores, cap),
        java.util.Arrays.copyOf(h.ids, cap))
    }

  private def siftUp(h: TopKHeap, i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(h.scores(i), h.ids(i), h.scores(p), h.ids(p))) {
        val s = h.scores(i); val id = h.ids(i)
        h.scores(i) = h.scores(p); h.ids(i) = h.ids(p)
        h.scores(p) = s; h.ids(p) = id
        i = p
      } else return
    }
  }

  private def siftDown(h: TopKHeap): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i
      if (l < h.n && worse(h.scores(l), h.ids(l), h.scores(w), h.ids(w))) w = l
      if (r < h.n && worse(h.scores(r), h.ids(r), h.scores(w), h.ids(w))) w = r
      if (w == i) return
      val s = h.scores(i); val id = h.ids(i)
      h.scores(i) = h.scores(w); h.ids(i) = h.ids(w)
      h.scores(w) = s; h.ids(w) = id
      i = w
    }
  }

  @inline private def offer(h0: TopKHeap, score: Double, id: Long): TopKHeap = {
    if (distinctPairs && containsPair(h0, score, id)) h0
    else if (h0.n < k) {
      val h = ensureRoom(h0)
      h.scores(h.n) = score; h.ids(h.n) = id
      h.n += 1
      siftUp(h, h.n - 1)
      h
    } else if (worse(h0.scores(0), h0.ids(0), score, id)) {
      h0.scores(0) = score; h0.ids(0) = id
      siftDown(h0)
      h0
    } else h0
  }

  override def reduce(buf: TopKHeap, a: Scored): TopKHeap =
    offer(buf, a.score, a.id)

  override def merge(b1: TopKHeap, b2: TopKHeap): TopKHeap = {
    var acc = b1
    var i = 0
    while (i < b2.n) {
      acc = offer(acc, b2.scores(i), b2.ids(i))
      i += 1
    }
    acc
  }

  override def finish(r: TopKHeap): Seq[Scored] = {
    val out = new Array[Scored](r.n)
    var i = 0
    while (i < r.n) { out(i) = Scored(r.scores(i), r.ids(i)); i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(
      out.sortWith((a, b) => a.score > b.score || (a.score == b.score && a.id < b.id)))
  }

  override def bufferEncoder: Encoder[TopKHeap] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[TopKHeap]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object TopKByScore {
  /** Column-level API: `top_k(score, id)` → array<struct<score,id>>
    * sorted by (score desc, id asc), length ≤ k.
    */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKByScore(k), org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Scored]())
      .apply(score, id)

  /** [[topK]] idempotent to exact duplicate (score, id) pairs — the
    * persisted-index search paths' form (see the class note). */
  def topKDistinct(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKByScore(k, distinctPairs = true),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Scored]())
      .apply(score, id)

  private val FallbackKey =
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  /** The session's pre-tune fallbackThreshold, captured by the FIRST
    * [[tuneForManyGroups]] call so [[restoreTuning]] can put it back.
    * None = never tuned; Some(None) = tuned, key was unset before.
    * Weak keys: a dropped session must not be pinned by this map.
    */
  private val saved =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
        Option[String]]())

  /** Callers whose groupBy key is the QUERY id (one group per query
    * vector) must raise ObjectHashAggregate's sort-fallback threshold:
    * its default of 128 distinct keys per task silently degrades the
    * partial aggregate to sort-based — re-sorting every task's full
    * candidate slice, the exact behavior this aggregate exists to
    * avoid (the round-11 100×-sweep IVF-PQ timeout). 2^22 keys ·
    * a geometric-growth heap per key stays well inside executor
    * memory for every operating point in this engine (a task's heaps
    * hold at most the candidates the task actually saw).
    *
    * The raise is session-visible (Spark has no per-plan conf, and
    * these operators return LAZY plans — the threshold must still be
    * up when the caller finally executes), so it is paired with
    * [[restoreTuning]]: the first call here snapshots the session's
    * previous value, and every engine execution surface (Verify,
    * Bench, the test harness) restores it after collecting results,
    * so a long-lived user session does not permanently lose the
    * memory-bounding sort fallback for ITS OWN unrelated
    * ObjectHashAggregates (large collect_list / percentile queries).
    */
  def tuneForManyGroups(s: org.apache.spark.sql.SparkSession): Unit = {
    saved.computeIfAbsent(s, _ => s.conf.getOption(FallbackKey))
    s.conf.set(FallbackKey, (1 << 22).toString)
  }

  /** Undo [[tuneForManyGroups]] on `s`: restore the snapshotted
    * pre-tune value (or unset, if it was unset). Safe to call on a
    * never-tuned session (no-op). Callers embedding these operators
    * in a long-lived session should call this after materializing the
    * returned DataFrames.
    *
    * Deliberately a no-op while STREAMING queries are active: a tuned
    * caller's stream (searchStream's windowed top-k) reads the
    * session conf on every microbatch, so un-tuning under it would
    * silently re-degrade its partial aggregates to sort-based — the
    * exact pathology the tune exists to prevent. The snapshot stays
    * in `saved`; the next restore after the streams stop applies it.
    */
  def restoreTuning(s: org.apache.spark.sql.SparkSession): Unit = {
    if (!s.streams.active.isEmpty) return
    val prior = saved.remove(s)
    if (prior != null) prior match {
      case Some(v) => s.conf.set(FallbackKey, v)
      case None => s.conf.unset(FallbackKey)
    }
  }
}
