package graft.store

import graft.SparkSpec
import graft.operators.{IncrementalDedup, TrigramIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Mechanized crash testing for the persisted-index lifecycle — the
  * round-12 lesson industrialized: that round's MANUAL self-review
  * found two real lifecycle bugs (the rebuild-over-compacted stale
  * pointer and the pointerless-dir adoption) that no spec caught.
  * This property interrupts the lifecycle at EVERY file-op boundary
  * mechanically instead:
  *
  *  - [[IndexMaintenance.failPoint]] fires at each boundary (after
  *    metadata deletes, between component data writes, before/after
  *    pointer flips, after each retention/vacuum delete);
  *  - a recording pass over a seeded random op sequence (build /
  *    append / compact / vacuum / rebuild) enumerates every firing;
  *  - each firing is then replayed with a throwing hook — simulating
  *    a process killed exactly there — and the reader contract is
  *    asserted on the survivor state: a crash inside build/rebuild
  *    must FAIL FAST (the marker is removed first, rewritten last —
  *    a surviving marker over a partial overwrite would read
  *    silently wrong), and a crash inside append/compact/vacuum must
  *    leave reads EXACTLY equal to the committed corpus (MVCC: the
  *    pointer flip is the only visibility event);
  *  - recovery (re-run the interrupted op, or rebuild) must restore
  *    the post-op truth.
  *
  * The randomized pass runs on the trigram index (cheapest exact
  * oracle: search ≡ contains()); the two-component atomicity cases
  * (crash BETWEEN a family's signature and set writes, crash BETWEEN
  * its two publishes) run targeted on the minhash dedup index.
  * Reference contract: the reference's tests pin crash-freedom via
  * txn rollback (test_foreign_key_uniqueness_constraints.sql:255-298,
  * run-tests.sh trap-EXIT); a file-backed index has no txn, so the
  * marker/pointer protocol must earn the same guarantee.
  */
class IndexCrashPropertySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private final class SimulatedCrash(val label: String)
    extends RuntimeException(s"simulated crash at $label")

  // ------------------------------------------------------------------
  // model corpus: 120 docs, 6 shards keyed pmod(doc_id, 6)

  private lazy val docsDf: DataFrame =
    graft.Tables.documents(spark, sf).limit(120).cache()
  private lazy val texts: Map[Long, String] =
    docsDf.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
  private def shard(k: Int): DataFrame =
    docsDf.filter(pmod(col("doc_id"), lit(6)) === k)
  private def shardIds(k: Int): Set[Long] = texts.keySet.filter(_ % 6 == k)

  private val pattern = TrigramIndex.SearchPattern
  private def truth(committed: Set[Long]): Seq[Long] =
    committed.filter(id => texts(id).contains(pattern)).toSeq.sorted

  private def searchIds(dir: String): Seq[Long] = {
    import spark.implicits._
    TrigramIndex.search(spark, dir, docsDf, pattern).as[Long].collect().toSeq
  }

  // ------------------------------------------------------------------
  // op model

  private sealed trait Op { def tag: String }
  private case class Build(ks: Seq[Int]) extends Op { def tag = s"build(${ks.mkString(",")})" }
  private case class Append(k: Int) extends Op { def tag = s"append($k)" }
  private case object Compact extends Op { def tag = "compact" }
  private case object Vacuum extends Op { def tag = "vacuum" }

  private def union(ks: Seq[Int]): DataFrame =
    ks.map(shard).reduce(_ unionByName _)

  private def runOp(op: Op, dir: String): Unit = op match {
    case Build(ks) => TrigramIndex.build(spark, union(ks), dir)
    case Append(k) => TrigramIndex.appendIncrement(spark, shard(k), dir)
    case Compact   => TrigramIndex.compact(spark, dir)
    case Vacuum    => TrigramIndex.vacuum(spark, dir)
  }

  private def committedAfter(ops: Seq[Op]): Set[Long] =
    ops.foldLeft(Set.empty[Long]) {
      case (_, Build(ks))  => ks.flatMap(shardIds).toSet
      case (acc, Append(k)) => acc ++ shardIds(k)
      case (acc, _)         => acc
    }

  private def opsFor(seed: Long): Seq[Op] = {
    val rnd = new scala.util.Random(seed)
    Build(Seq(0, 1)) +: (1 to 5).map { _ =>
      rnd.nextInt(6) match {
        case 0 | 1 => Append(rnd.nextInt(6))
        case 2 | 3 => Compact
        case 4     => Vacuum
        case 5     => Build(Seq(rnd.nextInt(6), rnd.nextInt(6)).distinct)
      }
    }
  }

  private def withHook[A](hook: String => Unit)(body: => A): A = {
    IndexMaintenance.failPointHook = hook
    try body finally IndexMaintenance.failPointHook = _ => ()
  }

  // CI runs two seeds (runtime-bounded); GRAFT_CRASH_SEEDS=a,b,c widens
  // the hunt for a one-off exploration session
  private val seeds: Seq[Long] =
    sys.env.get("GRAFT_CRASH_SEEDS")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toLong))
      .getOrElse(Seq(11L, 47L))

  for (seed <- seeds) {
    test(s"trigram lifecycle survives a kill at every file-op boundary (seed $seed)") {
      val ops = opsFor(seed)

      // -------- recording pass: enumerate every boundary firing
      val firings = mutable.ArrayBuffer[(Int, String, Int)]() // (global, label, opIdx)
      var opIdx = 0
      val recDir = tmp("tri-crash-rec")
      withHook(l => firings += ((firings.size, l, opIdx))) {
        ops.foreach { op => runOp(op, recDir); opIdx += 1 }
      }
      assert(searchIds(recDir) == truth(committedAfter(ops)))
      // the property must actually exercise the protocol's families —
      // a refactor that stops firing them turns this test vacuous
      val fam = firings.map(_._2).toSet
      for (f <- Seq("reset:marker-removed", "tri-build:data-written",
        "publish:before-flip", "publish:after-flip"))
        assert(fam.exists(_.startsWith(f)), s"no firing for family $f in $fam")
      assert(firings.size >= 8, s"suspiciously few boundaries: $firings")

      // -------- kill-point replays: one per recorded firing
      for ((g, label, atOp) <- firings) {
        val dir = tmp("tri-crash")
        var n = 0
        val crashed =
          try {
            withHook { l =>
              val i = n; n += 1
              if (i == g) throw new SimulatedCrash(l)
            } { ops.foreach(runOp(_, dir)) }
            fail(s"replay of firing #$g ($label) did not crash")
          } catch { case c: SimulatedCrash => c }
        assert(crashed.label == label,
          s"replay #$g hit ${crashed.label}, recorded $label — nondeterministic boundary order")

        val before = committedAfter(ops.take(atOp))
        val after = committedAfter(ops.take(atOp + 1))
        ops(atOp) match {
          case b: Build =>
            // any kill inside build/rebuild leaves an UNMARKED dir:
            // readers fail fast with the rebuild migration path, never
            // silently read the partial overwrite
            val e = intercept[IllegalStateException] { searchIds(dir) }
            assert(e.getMessage.contains("rebuild"),
              s"$label in ${b.tag}: wrong failure ${e.getMessage}")
            runOp(b, dir) // recovery = rerun the build
            assert(searchIds(dir) == truth(after), s"$label: rebuild recovery")
          case op =>
            // append/compact/vacuum kills: MVCC keeps reads exactly on
            // the committed corpus (no partial visibility)
            assert(searchIds(dir) == truth(before),
              s"$label in ${op.tag}: committed read after kill")
            runOp(op, dir) // recovery = rerun the interrupted op
            assert(searchIds(dir) == truth(after), s"$label: rerun recovery")
        }
        // the recovered index stays maintainable: one more compact
        // must not change answers
        TrigramIndex.compact(spark, dir)
        assert(searchIds(dir) == truth(committedAfter(ops.take(atOp + 1))))
      }
    }
  }

  // ------------------------------------------------------------------
  // two-component atomicity (minhash dedup index): the boundaries a
  // single-component index cannot exercise

  private def dedupProbe(dir: String, id: Long): (Boolean, Long) = {
    val row = IncrementalDedup.dedupIncrement(spark,
      spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(
          9999999L, texts(id), "en", "probe", texts(id).length.toLong)),
        graft.Tables.documents(spark, sf).schema),
      dir).collect().head
    (row.getBoolean(1), if (row.isNullAt(2)) -1L else row.getLong(2))
  }

  test("minhash kill between sig and set writes: shard invisible, re-append recovers") {
    val dir = tmp("dedup-crash-append")
    IncrementalDedup.build(spark, union(Seq(0, 1)), dir)
    val baseId = shardIds(0).head
    val shardId = shardIds(2).head
    val e = intercept[SimulatedCrash] {
      withHook(l => if (l == "dedup-append:sigs-written") throw new SimulatedCrash(l)) {
        IncrementalDedup.appendIncrement(spark, shard(2), dir)
      }
    }
    assert(e.label == "dedup-append:sigs-written")
    // committed reads: the base still matches, the half-appended shard
    // does NOT (sigs without sets can never verify — no partial match)
    assert(dedupProbe(dir, baseId) == ((true, baseId)))
    assert(dedupProbe(dir, shardId)._1 == false,
      "half-appended shard leaked into dedup verdicts")
    // recovery = re-append the SAME shard: duplicate signature rows are
    // tolerated by construction (distinct candidates), the verdict heals
    IncrementalDedup.appendIncrement(spark, shard(2), dir)
    assert(dedupProbe(dir, shardId) == ((true, shardId)))
    assert(dedupProbe(dir, baseId) == ((true, baseId)))
    // and the doubled rows compact away into a healthy index
    IncrementalDedup.compact(spark, dir, setsPartitions = 2)
    assert(dedupProbe(dir, shardId) == ((true, shardId)))
  }

  test("minhash kill between the two compaction publishes: mixed versions still answer") {
    val dir = tmp("dedup-crash-compact")
    IncrementalDedup.build(spark, union(Seq(0, 1)), dir)
    IncrementalDedup.appendIncrement(spark, shard(3), dir)
    val baseId = shardIds(0).head
    val apId = shardIds(3).head
    val e = intercept[SimulatedCrash] {
      withHook(l => if (l == "dedup-compact:sigs-published") throw new SimulatedCrash(l)) {
        IncrementalDedup.compact(spark, dir, setsPartitions = 2)
      }
    }
    assert(e.label == "dedup-compact:sigs-published")
    // signatures read from the new version, sets still from legacy —
    // content-identical by compaction's contract, so verdicts hold
    assert(IndexMaintenance.resolve(dir, "signatures", conf).contains("_v"))
    assert(IndexMaintenance.resolve(dir, "sets", conf).endsWith("sets.parquet"))
    assert(dedupProbe(dir, baseId) == ((true, baseId)))
    assert(dedupProbe(dir, apId) == ((true, apId)))
    // recovery = rerun compact; both pointers land on fresh versions
    IncrementalDedup.compact(spark, dir, setsPartitions = 2)
    assert(IndexMaintenance.resolve(dir, "sets", conf).contains("_v"))
    assert(dedupProbe(dir, baseId) == ((true, baseId)))
    assert(dedupProbe(dir, apId) == ((true, apId)))
  }

  test("bm25 kill between postings and stats writes: re-append recovers exactly") {
    import graft.operators.DocSearchIndex
    val dir = tmp("bm25-crash-append")
    val twin = tmp("bm25-twin")
    DocSearchIndex.build(spark, union(Seq(0, 1)), dir)
    DocSearchIndex.build(spark, union(Seq(0, 1)), twin)
    // query terms drawn from the corpus itself so matches exist at
    // this fixture size
    val terms = texts(shardIds(0).head).toLowerCase.split(" ")
      .filter(_.length > 2).distinct.take(4).toSeq
    val e = intercept[SimulatedCrash] {
      withHook(l => if (l == "bm25-append:postings-written") throw new SimulatedCrash(l)) {
        DocSearchIndex.appendIncrement(spark, shard(2), dir)
      }
    }
    assert(e.label == "bm25-append:postings-written")
    // the half-appended state is DOCUMENTED as partially visible (BM25
    // scores are global functions of corpus stats — no write order can
    // make a two-component append invisible; a common term's df can
    // even exceed the stale n_docs, driving idf negative). The
    // contract is that the index still EXECUTES and recovery is exact.
    DocSearchIndex.search(spark, dir, terms, 20).collect()
    // recovery = re-append the SAME shard: the duplicate posting rows
    // are read-immune (MAX tf; count DISTINCT doc_id for df) and the
    // stats row lands once, so scores equal a never-crashed twin
    DocSearchIndex.appendIncrement(spark, shard(2), dir)
    DocSearchIndex.appendIncrement(spark, shard(2), twin)
    val got = DocSearchIndex.search(spark, dir, terms, 20).collect().toSeq
    val want = DocSearchIndex.search(spark, twin, terms, 20).collect().toSeq
    assert(want.nonEmpty, "twin must match something or the equality is vacuous")
    assert(got == want, "re-append recovery must equal the never-crashed twin")
    // compaction heals the duplicate rows physically (distinct postings,
    // stats recomputed FROM postings) — scores unchanged
    DocSearchIndex.compact(spark, dir)
    assert(DocSearchIndex.search(spark, dir, terms, 20).collect().toSeq == want)
    val postings = spark.read.parquet(
      IndexMaintenance.resolve(dir, "postings", conf))
    assert(postings.count() == postings.distinct().count(),
      "compaction must remove the duplicated shard rows")
  }

  test("embedding index: an at-least-once duplicated shard never duplicates top-k slots") {
    import graft.operators.EmbIncrementalDedup
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val corpus = emb.filter(pmod(col("vec_id"), lit(5)).isin(0, 1))
    val shard2 = emb.filter(pmod(col("vec_id"), lit(5)) === 2)
    val queries = emb.filter(pmod(col("vec_id"), lit(5)) === 3).limit(20)
    val dir = tmp("emb-crash-dup")
    val twin = tmp("emb-twin")
    EmbIncrementalDedup.build(spark, corpus, dir)
    EmbIncrementalDedup.build(spark, corpus, twin)
    EmbIncrementalDedup.appendIncrement(spark, shard2, twin)
    // the at-least-once ingest case: the append SUCCEEDED but the
    // caller's ledger lost the ack, so the whole shard lands twice
    EmbIncrementalDedup.appendIncrement(spark, shard2, dir)
    EmbIncrementalDedup.appendIncrement(spark, shard2, dir)
    val want = EmbIncrementalDedup.searchIndex(spark, queries, twin, k = 3)
      .collect().toSeq
    val got = EmbIncrementalDedup.searchIndex(spark, queries, dir, k = 3)
      .collect().toSeq
    assert(got == want,
      "duplicate vector rows must not occupy multiple top-k slots (topKDistinct)")
    // per-query ranks must be distinct neighbors
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.values.forall(rs => rs.map(_.getLong(2)).distinct.size == rs.size))
    // compaction heals the duplicate rows physically — results unchanged
    EmbIncrementalDedup.compact(spark, dir, vecPartitions = 2)
    assert(EmbIncrementalDedup.searchIndex(spark, queries, dir, k = 3)
      .collect().toSeq == want)
    val vecs = spark.read.parquet(IndexMaintenance.resolve(dir, "vectors", conf))
    assert(vecs.count() == vecs.select("vec_id").distinct().count(),
      "compaction must dedup the duplicated vector rows")
  }

  test("minhash kill inside a REBUILD fails fast instead of reading a stale marker") {
    val dir = tmp("dedup-crash-rebuild")
    IncrementalDedup.build(spark, union(Seq(0, 1)), dir)
    IncrementalDedup.compact(spark, dir, setsPartitions = 2)
    val e = intercept[SimulatedCrash] {
      withHook(l => if (l == "dedup-build:sigs-written") throw new SimulatedCrash(l)) {
        IncrementalDedup.build(spark, union(Seq(2, 3)), dir)
      }
    }
    assert(e.label == "dedup-build:sigs-written")
    // pre-fix behavior: the round-12 marker survived the rebuild and
    // readers silently served the half-overwritten index — now the
    // marker is removed first / rewritten last, so this fails fast
    val ex = intercept[IllegalStateException] {
      dedupProbe(dir, shardIds(0).head)
    }
    assert(ex.getMessage.contains("rebuild"))
    // recovery = rerun the build; the new corpus answers, and the old
    // corpus is physically gone from the live index (a probe-based
    // check would be flaky here: the testdata plants genuine near-dup
    // pairs ACROSS shards, so an old-corpus probe may legitimately
    // match a new-corpus twin)
    IncrementalDedup.build(spark, union(Seq(2, 3)), dir)
    assert(dedupProbe(dir, shardIds(2).head)._1 == true)
    val liveIds = spark.read
      .parquet(IndexMaintenance.resolve(dir, "signatures", conf))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(liveIds == (shardIds(2) ++ shardIds(3)),
      "rebuild must fully replace the live corpus")
  }
}
