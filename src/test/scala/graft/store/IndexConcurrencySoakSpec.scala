package graft.store

import graft.SparkSpec
import graft.operators.{DocSearchIndex, IncrementalDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** Concurrency × crash PRODUCT soak for the persisted indexes — the
  * round-13 verdict's missing test: [[IndexCrashPropertySpec]] kills
  * ONE process at every file-op boundary, and the maintenance mutex
  * (IndexMaintenance.withMaintenanceLock) serializes mutations, but
  * nothing drove TWO live writers through randomized
  * append/compact/vacuum/search schedules WITH kill injection and
  * at-least-once replay. This property does, for both write-heavy
  * index families (minhash dedup + BM25 search):
  *
  *  - two "processes" (the SharedProducersSpec convention: separate
  *    SparkSessions on real threads, all state through the
  *    filesystem) run seeded random schedules against ONE index dir;
  *  - each mutating op may be armed to crash at a random file-op
  *    boundary (a throwing failPoint hook scoped to the op's thread);
  *    a crashed APPEND is replayed — the at-least-once contract — a
  *    crashed compact/vacuum is simply abandoned (MVCC: the pointer
  *    flip is the only visibility event);
  *  - searches interleave with the mutations and must never observe
  *    a torn state: they may only fail by the vacuum/retention
  *    reader-lifetime contract (a superseded version reclaimed under
  *    an in-flight scan), whose documented recovery — re-resolve and
  *    re-run — the search helper applies;
  *  - at the end, reads of the survivor must EQUAL a never-crashed,
  *    serialized twin built from the same shards exactly once: BM25
  *    top-k (scores included — the shard-tagged stats dedup is load-
  *    bearing here) and the minhash dedup verdict of a held-out
  *    probe shard.
  *
  * Reference contract: two sessions on one store must never corrupt
  * or double-apply state (test_lock_contention.sql:41-48) and a
  * killed client must leave the store recoverable (run-tests.sh
  * trap-EXIT cleanup); a file-backed index earns the same guarantee
  * from the maintenance mutex + MVCC pointers + duplicate-immune
  * readers, and this soak exercises all three at once.
  */
class IndexConcurrencySoakSpec extends SparkSpec with graft.testkit.TestKitReported {

  private val sf = "/root/testdata/sf0.001"

  private final class SimulatedCrash(label: String)
    extends RuntimeException(s"simulated crash at $label")

  /** thread name -> countdown; the shared hook fires when the OWNING
    * thread's counter reaches zero (other threads sail past).
    */
  private val armed = new ConcurrentHashMap[String, AtomicInteger]()

  private def installHook(): Unit =
    IndexMaintenance.failPointHook = label => {
      val ctr = armed.get(Thread.currentThread().getName)
      if (ctr != null && ctr.decrementAndGet() == 0)
        throw new SimulatedCrash(label)
    }
  private def clearHook(): Unit = {
    IndexMaintenance.failPointHook = _ => ()
    armed.clear()
  }

  // 8 shards; 0-1 seed the index, A appends 2-4, B appends 5-7, and
  // shard-keyed slice 8..9 of the id space stays OUT of the index as
  // the dedup probe (held-out docs still probe real postings: the
  // corpus shares shingles across docs).
  private val NShards = 10
  private lazy val docsDf: DataFrame =
    graft.Tables.documents(spark, sf).limit(160).cache()
  private def shard(k: Int): DataFrame =
    docsDf.filter(pmod(col("doc_id"), lit(NShards)) === k)
  private lazy val probe: DataFrame =
    docsDf.filter(pmod(col("doc_id"), lit(NShards)) >= 8)

  private val terms = Seq("join", "stream", "hash", "sort")

  /** Read with the vacuum/retention recovery contract: a scan that
    * resolved a version reclaimed mid-flight re-resolves and re-runs.
    */
  private def readWithRetry[T](what: String)(f: => T): T = {
    var out: Option[T] = None
    var last: Throwable = null
    var attempts = 0
    while (out.isEmpty && attempts < 4) {
      attempts += 1
      // no `return` in here: a non-local return from inside the
      // by-name evaluation would surface as NonLocalReturnControl
      // and be swallowed by the retry's own catch
      try out = Some(f)
      catch { case t: Throwable => last = t; Thread.sleep(100) }
    }
    out.getOrElse(throw new AssertionError(
      s"$what failed after re-resolve retries", last))
  }

  private def bm25Read(s: SparkSession, dir: String): Seq[(Long, Double)] =
    readWithRetry("bm25 search") {
      DocSearchIndex.search(s, dir, terms, 20).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }

  private def dedupRead(s: SparkSession, dir: String): Seq[Seq[Any]] =
    readWithRetry("dedup probe") {
      IncrementalDedup.dedupIncrement(s, probe, dir).collect()
        .map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])
    }

  private sealed trait Kind
  private case object Bm25 extends Kind
  private case object Minhash extends Kind

  private def append(s: SparkSession, kind: Kind, dir: String, k: Int): Unit =
    kind match {
      case Bm25 => DocSearchIndex.appendIncrement(s, shard(k), dir)
      case Minhash => IncrementalDedup.appendIncrement(s, shard(k), dir)
    }
  private def compactOp(s: SparkSession, kind: Kind, dir: String): Unit =
    kind match {
      case Bm25 => DocSearchIndex.compact(s, dir)
      case Minhash => IncrementalDedup.compact(s, dir)
    }
  private def vacuumOp(s: SparkSession, kind: Kind, dir: String): Unit =
    kind match {
      case Bm25 => DocSearchIndex.vacuum(s, dir)
      case Minhash => IncrementalDedup.vacuum(s, dir)
    }

  /** One process's schedule: its appends exactly once each (replayed
    * on a simulated crash — at-least-once), with compact / vacuum /
    * search ops and crash arming drawn from the seeded rng.
    */
  private def runSchedule(s: SparkSession, kind: Kind, dir: String,
                          appendShards: Seq[Int], seed: Long,
                          errors: java.util.Queue[Throwable]): Thread = {
    val t = new Thread(() => {
      val rng = new scala.util.Random(seed)
      val name = Thread.currentThread().getName
      def maybeCrashing(opName: String)(op: => Unit): Boolean = {
        // ~40% of mutating ops are armed to die at a random one of
        // the first 1-6 file-op boundaries they reach
        val arm = rng.nextInt(10) < 4
        if (arm) armed.put(name, new AtomicInteger(rng.nextInt(6) + 1))
        try { op; true }
        catch { case _: SimulatedCrash => false }
        finally armed.remove(name)
      }
      try {
        for (k <- appendShards) {
          if (!maybeCrashing(s"append($k)")(append(s, kind, dir, k))) {
            // at-least-once replay of the whole shard, unarmed (the
            // ack was lost; readers are duplicate-immune)
            append(s, kind, dir, k)
          }
          rng.nextInt(4) match {
            case 0 => maybeCrashing("compact")(compactOp(s, kind, dir))
            case 1 => maybeCrashing("vacuum")(vacuumOp(s, kind, dir))
            case 2 => // interleaved read must not observe torn state
              kind match {
                case Bm25 => bm25Read(s, dir)
                case Minhash => dedupRead(s, dir)
              }
            case _ => ()
          }
        }
      } catch { case t: Throwable => errors.add(t) }
    }, s"soak-${kind}-${seed}")
    t.start()
    t
  }

  private def soakSeeds: Seq[Long] =
    sys.env.get("GRAFT_SOAK_SEEDS")
      .map(_.split(",").toSeq.map(_.trim.toLong))
      .getOrElse(Seq(1402L))

  private def soak(kind: Kind, seed: Long): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-soak-$kind").toString
    val twinDir = java.nio.file.Files.createTempDirectory(s"graft-soak-twin-$kind").toString
    val seedDocs = docsDf.filter(pmod(col("doc_id"), lit(NShards)) < 2)
    kind match {
      case Bm25 => DocSearchIndex.build(spark, seedDocs, dir)
      case Minhash => IncrementalDedup.build(spark, seedDocs, dir)
    }
    installHook()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ta = runSchedule(spark, kind, dir, Seq(2, 3, 4), seed, errors)
    val tb = runSchedule(spark.newSession(), kind, dir, Seq(5, 6, 7), seed + 7919, errors)
    ta.join(600000); tb.join(600000)
    clearHook()
    assert(!ta.isAlive && !tb.isAlive, "soak thread hung")
    if (!errors.isEmpty) throw new AssertionError(
      s"soak schedule failed (${errors.size} errors)", errors.peek())

    // never-crashed serialized twin: same shards exactly once
    kind match {
      case Bm25 =>
        DocSearchIndex.build(spark, seedDocs, twinDir)
        for (k <- 2 to 7) DocSearchIndex.appendIncrement(spark, shard(k), twinDir)
        assert(bm25Read(spark, dir) === bm25Read(spark, twinDir),
          s"BM25 reads diverged from the serialized twin (seed $seed)")
        // and compaction heals the survivor without moving reads
        DocSearchIndex.compact(spark, dir)
        assert(bm25Read(spark, dir) === bm25Read(spark, twinDir),
          s"BM25 reads moved after post-soak compaction (seed $seed)")
      case Minhash =>
        IncrementalDedup.build(spark, seedDocs, twinDir)
        for (k <- 2 to 7) IncrementalDedup.appendIncrement(spark, shard(k), twinDir)
        assert(dedupRead(spark, dir) === dedupRead(spark, twinDir),
          s"dedup verdicts diverged from the serialized twin (seed $seed)")
        IncrementalDedup.compact(spark, dir)
        assert(dedupRead(spark, dir) === dedupRead(spark, twinDir),
          s"dedup verdicts moved after post-soak compaction (seed $seed)")
    }
  }

  test("two-writer crash soak: BM25 index reads equal a never-crashed serialized twin") {
    for (seed <- soakSeeds) soak(Bm25, seed)
  }

  test("two-writer crash soak: minhash index verdicts equal a never-crashed serialized twin") {
    for (seed <- soakSeeds) soak(Minhash, seed)
  }
}
