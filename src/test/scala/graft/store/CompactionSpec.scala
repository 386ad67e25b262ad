package graft.store

import graft.SparkSpec
import java.nio.file.{Files, Path => JPath}
import scala.jdk.CollectionConverters._

/** Incremental flush + compaction: increments must be proportional to
  * new data (append, not rewrite), compaction must collapse each
  * bucket to one sorted file, and neither may lose or reorder events.
  */
class CompactionSpec extends SparkSpec with graft.testkit.TestKitReported {

  private def parquetFiles(root: JPath): Seq[JPath] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq

  private def mkStore(): EventStore = {
    val st = new EventStore(spark)
    st.registerDeciderEvent("C", "E")
    st
  }

  private def append(st: EventStore, from: Int, until: Int): Unit = {
    val batch = (from until until).map { i =>
      val part = s"p${i % 3}"
      val prev = if (i < 3) None else Some(s"e${i - 3}")
      EventInput("E", s"e$i", "C", part, s"""{"i":$i}""", previous_id = prev)
    }
    val res = st.append(batch)
    assert(res.rejected.isEmpty, s"rejected: ${res.rejected}")
  }

  test("saveIncrement appends only the tail; compact collapses buckets to one sorted file") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val st = mkStore()
    append(st, 0, 30)
    st.save(dir, buckets = 4)
    def live: JPath = JPath.of(EventStore.resolveEventsPath(dir,
      spark.sparkContext.hadoopConfiguration))
    val afterSave = parquetFiles(live).size

    // three incremental flushes → small files pile up, full rewrites don't happen
    for (k <- 1 to 3) {
      append(st, 30 * k, 30 * (k + 1))
      val n = st.saveIncrement(dir)
      assert(n == 30, s"increment $k flushed $n")
    }
    assert(st.saveIncrement(dir) == 0, "empty increment must be a no-op")
    val beforeCompact = parquetFiles(live).size
    assert(beforeCompact > afterSave, "increments should add files, not rewrite")

    st.compact(dir)
    val leafDirs = Files.walk(live).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("day="))
      .toSeq
    assert(leafDirs.nonEmpty)
    for (leaf <- leafDirs)
      assert(parquetFiles(leaf).size == 1, s"partition $leaf not collapsed to one file")

    // nothing lost: a fresh store loading the compacted log sees all 120
    // events with intact per-stream chains
    val st2 = new EventStore(spark)
    st2.load(dir, buckets = 4)
    val chains = Seq("p0", "p1", "p2")
      .map(part => part -> st2.getEvents(part, "C").collect().toSeq).toMap
    assert(chains.values.map(_.size).sum == 120)
    for ((part, chain) <- chains) {
      assert(chain.map(_.offset) == chain.map(_.offset).sorted, s"$part out of order")
      assert(chain.head.previous_id.isEmpty)
      for (Seq(a, b) <- chain.sliding(2))
        assert(b.previous_id.contains(a.event_id), s"$part chain broken at ${b.event_id}")
    }
    // and the loaded store keeps appending from the right head; the
    // unflushed tail is visible through getEvents before any flush
    append(st2, 120, 123)
    assert(st2.getEvents("p0", "C").count() == 41)
  }

  test("rewrites rebase the in-memory plan; increments after compact don't duplicate") {
    val dir = Files.createTempDirectory("graft-compact-rebase").toString
    val st = mkStore()
    append(st, 0, 30)
    st.save(dir, buckets = 4)
    // second full save retires the version the in-memory plan would
    // otherwise still reference lazily — scans must keep working
    st.save(dir, buckets = 4)
    assert(st.allEvents.count() === 30L)
    append(st, 30, 60)
    st.compact(dir) // publishes a new version; 30 events unflushed
    assert(st.saveIncrement(dir) === 30L)
    // no double count: the checkpointed tail and the flushed files
    // must not BOTH serve the same offsets
    assert(st.allEvents.count() === 60L)
    assert(st.allEvents.collect().map(_.offset).distinct.length === 60)
    val st2 = new EventStore(spark)
    st2.load(dir, buckets = 4)
    assert(st2.allEvents.count() === 60L)
    assert(st2.getEvents("p0", "C").count() === 20L)
  }

  test("compact publishes through the manifest pointer: no reader vacuum, old version retained") {
    val dir = Files.createTempDirectory("graft-compact-mvcc").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val st = mkStore()
    append(st, 0, 60)
    st.save(dir, buckets = 4)
    def live: String = EventStore.resolveEventsPath(dir, conf)
    val v1 = live
    assert(v1.endsWith("events_v1"))

    // a reader that listed the pre-compact version's files (plan built
    // against v1) — the reference's MVCC keeps such readers working
    val preCompactReader = spark.read.parquet(v1)

    // hammer the pointer from a concurrent reader while compact runs:
    // every resolution must land on a complete, readable directory
    @volatile var done = false
    @volatile var readerFailure: Option[Throwable] = None
    var reads = 0
    val reader = new Thread(() => {
      try while (!done) {
        assert(spark.read.parquet(live).count() == 60L)
        reads += 1
      } catch { case t: Throwable => readerFailure = Some(t) }
    })
    reader.start()
    try st.compact(dir) finally { done = true; reader.join(60000) }
    assert(readerFailure.isEmpty, s"concurrent reader failed: $readerFailure")
    assert(reads > 0, "reader never completed a scan during compact")

    assert(live.endsWith("events_v2"), "pointer must name the compacted version")
    assert(spark.read.parquet(live).count() == 60L)
    // the pre-flip version's files still exist for in-flight scans
    assert(preCompactReader.count() == 60L)

    // the NEXT rewrite retires v1: only v2 (prev) and v3 (new) remain
    st.compact(dir)
    assert(live.endsWith("events_v3"))
    val versions = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("events_v")).sorted.toSeq
    assert(versions === Seq("events_v2", "events_v3"))
  }

  private def versionDirs(dir: String): Seq[String] =
    new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("events_v")).sorted.toSeq

  test("retainDepth=2: a reader's version survives TWO rewrites, dies on the third") {
    val dir = Files.createTempDirectory("graft-compact-depth").toString
    val st = mkStore()
    append(st, 0, 30)
    st.save(dir, buckets = 4)
    val conf = spark.sparkContext.hadoopConfiguration
    val v1 = EventStore.resolveEventsPath(dir, conf)
    assert(v1.endsWith("events_v1"))
    // a long-running scan that resolved v1 before any rewrite
    val reader = spark.read.parquet(v1)
    st.compact(dir, retainDepth = 2) // v2 live; keep {v1}
    st.compact(dir, retainDepth = 2) // v3 live; keep {v2, v1}
    assert(versionDirs(dir) === Seq("events_v1", "events_v2", "events_v3"))
    assert(reader.count() === 30L, "depth-2 reader must survive two rewrites")
    st.compact(dir, retainDepth = 2) // v4 live; keep {v3, v2} — v1 retired
    assert(versionDirs(dir) === Seq("events_v2", "events_v3", "events_v4"))
  }

  test("lost pointer: numbering continues from the on-disk max and the fallback-live version is retained") {
    val dir = Files.createTempDirectory("graft-compact-lostptr").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val st = mkStore()
    append(st, 0, 30)
    st.save(dir, buckets = 4)
    st.save(dir, buckets = 4) // v2 live, v1 retained
    // crash loses the pointer; readers fall back to the on-disk max (v2)
    assert(new java.io.File(dir, "_current").delete())
    val fallback = EventStore.resolveEventsPath(dir, conf)
    assert(fallback.endsWith("events_v2"), "fallback must resolve the on-disk max")
    val inFlight = spark.read.parquet(fallback)
    // next rewrite must number PAST v2 (not restart at v1) and retain
    // v2 — the version in-flight readers are actively resolving
    st.save(dir, buckets = 4)
    assert(EventStore.resolveEventsPath(dir, conf).endsWith("events_v3"))
    assert(versionDirs(dir) === Seq("events_v2", "events_v3"))
    assert(inFlight.count() === 30L, "fallback-live version deleted under an in-flight reader")
  }

  test("two-writer log fencing: second live writer rejected; crashed writer's successor publishes; the zombie is fenced") {
    val dir = Files.createTempDirectory("graft-compact-fence").toString
    val t0 = 1700000000000L
    var nowMs = t0
    val st = mkStore()
    st.now = () => new java.sql.Timestamp(nowMs)
    append(st, 0, 30)
    st.acquireLogWriter(dir, ownerId = "A", leaseMs = 60000L)
    st.save(dir, buckets = 4)

    // a second live process on the same dir is cleanly rejected — the
    // manifest pointer serializes readers vs one writer; the lease
    // serializes writers vs each other
    val stB = new EventStore(spark.newSession())
    stB.now = () => new java.sql.Timestamp(nowMs)
    stB.registerDeciderEvent("C", "E")
    val rejection = intercept[ControlJournal.OwnershipHeldException] {
      stB.acquireLogWriter(dir, ownerId = "B", leaseMs = 60000L)
    }
    assert(rejection.getMessage.contains("held by writer 'A'"))

    // A crashes (no release); after lease expiry B takes over and
    // publishes a new version through the pointer
    nowMs = t0 + 61000L
    stB.acquireLogWriter(dir, ownerId = "B", leaseMs = 60000L)
    stB.load(dir, buckets = 4)
    stB.save(dir, buckets = 4)
    val conf = spark.sparkContext.hadoopConfiguration
    assert(EventStore.resolveEventsPath(dir, conf).endsWith("events_v2"))

    // the zombie comes back from its pause and tries to publish: its
    // refresh sees B's higher epoch and throws BEFORE touching the
    // pointer — B's version stays live
    val fenced = intercept[ControlJournal.OwnershipHeldException] {
      st.save(dir, buckets = 4)
    }
    assert(fenced.getMessage.contains("fenced"))
    assert(EventStore.resolveEventsPath(dir, conf).endsWith("events_v2"),
      "a fenced writer must not have moved the pointer")
    stB.releaseLogWriter()
  }

  test("legacy unversioned events dir is retained one rewrite, then retired") {
    val dir = Files.createTempDirectory("graft-compact-legacy").toString
    val conf = spark.sparkContext.hadoopConfiguration
    // manufacture a pre-versioning layout: data under $dir/events, no pointer
    val st = mkStore()
    append(st, 0, 30)
    st.save(dir, buckets = 4)
    val f = new java.io.File(dir)
    assert(new java.io.File(f, "_current").delete())
    assert(new java.io.File(f, "events_v1").renameTo(new java.io.File(f, "events")))
    assert(EventStore.resolveEventsPath(dir, conf).endsWith("/events"))

    val st2 = new EventStore(spark)
    st2.load(dir, buckets = 4)
    st2.save(dir, buckets = 4) // republishes as v2... actually v1: no versioned dirs remain
    val live1 = EventStore.resolveEventsPath(dir, conf)
    assert(live1.contains("events_v"))
    assert(new java.io.File(f, "events").exists(),
      "legacy dir is the predecessor of the first versioned rewrite — retained for in-flight scans")
    st2.save(dir, buckets = 4) // second rewrite retires it
    assert(!new java.io.File(f, "events").exists(),
      "legacy dir must be garbage-collected once superseded twice")
    val st3 = new EventStore(spark)
    st3.load(dir, buckets = 4)
    assert(st3.allEvents.count() === 30L)
  }

  test("mid-write fencing: a writer expired DURING the write job is fenced at publish, not after") {
    // The top-of-save() refresh is half-life-gated: a lease that
    // expires while the (long) parquet write runs passes the entry
    // check and — without the pre-publish fence — would still flip the
    // pointer over a successor's publish. Simulate the freeze by
    // letting B take over while A's injectable clock says A is still
    // comfortably inside its lease (so A's entry refresh is a no-op),
    // then have A try to publish.
    val dir = Files.createTempDirectory("graft-midwrite-fence").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val t0 = 1700000000000L
    var nowA = t0
    var nowB = t0
    val stA = mkStore()
    stA.now = () => new java.sql.Timestamp(nowA)
    append(stA, 0, 30)
    stA.acquireLogWriter(dir, ownerId = "A", leaseMs = 60000L)
    stA.save(dir, buckets = 4)
    assert(EventStore.resolveEventsPath(dir, conf).endsWith("events_v1"))

    // A freezes; its lease expires on B's clock; B takes over
    nowB = t0 + 61000L
    val stB = new EventStore(spark.newSession())
    stB.now = () => new java.sql.Timestamp(nowB)
    stB.registerDeciderEvent("C", "E")
    stB.acquireLogWriter(dir, ownerId = "B", leaseMs = 60000L)

    // A resumes mid-job: its own clock is still inside the original
    // lease (entry refresh passes without listing), but the publish
    // fence lists epochs unconditionally and must throw BEFORE the flip
    nowA = t0 + 1000L
    append(stA, 30, 33)
    val fenced = intercept[ControlJournal.OwnershipHeldException] {
      stA.save(dir, buckets = 4)
    }
    assert(fenced.getMessage.contains("fenced"))
    assert(EventStore.resolveEventsPath(dir, conf).endsWith("events_v1"),
      "the fenced writer must not have flipped the pointer")

    // ... and the fenced writer cannot silently append into the live
    // dir either (lost-events hazard if a successor compact retires it)
    intercept[ControlJournal.OwnershipHeldException] {
      stA.saveIncrement(dir)
    }
    stB.releaseLogWriter()
  }

  test("crash-orphaned higher version dir cannot evict the pointer-live version") {
    val dir = Files.createTempDirectory("graft-orphan-retain").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val st = mkStore()
    append(st, 0, 30)
    st.save(dir, buckets = 4)   // v1
    append(st, 30, 60)
    st.save(dir, buckets = 4)   // v2 live, keep {v2, v1}
    assert(EventStore.resolveEventsPath(dir, conf).endsWith("events_v2"))

    // manufacture the crash artifact: a save that wrote events_v5 but
    // died before flipping the pointer — it sorts as the youngest
    // on-disk predecessor of any later rewrite
    val orphan = new java.io.File(dir, "events_v5")
    assert(orphan.mkdir())
    Files.writeString(orphan.toPath.resolve("part-orphan.parquet"), "junk")

    append(st, 60, 90)
    st.save(dir, buckets = 4)   // publishes v6
    assert(EventStore.resolveEventsPath(dir, conf).endsWith("events_v6"))
    // retainDepth=1 keeps the orphan as youngest predecessor, but the
    // version readers were ACTIVELY resolving through the pointer (v2)
    // must survive too — in-flight scans depend on its files
    assert(new java.io.File(dir, "events_v2").exists(),
      "pointer-live previous version was deleted out from under readers")
    assert(!new java.io.File(dir, "events_v1").exists(),
      "superseded-twice version should still be garbage-collected")
  }
}
