package graft.store

import java.sql.Timestamp
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Durable control-plane journal for the streaming layer's `views` /
  * `locks` state (reference schema.sql:157-200, 436-468).
  *
  * The reference gets durability for free: every ACK/lease mutation is
  * one PostgreSQL transaction against the `locks` table. Here the
  * control plane is driver-resident keyed state (ViewStreams), so a
  * crash between explicit `save()` snapshots used to rewind consumer
  * offsets. This class closes that gap with the classic WAL shape:
  *
  *  - **One journal entry per mutation**, written as an atomically
  *    created file (`<seq>.json`, zero-padded for lexicographic order;
  *    write-to-temp + rename). No append semantics required, so the
  *    layout works on object stores as well as local/HDFS paths.
  *  - **Replay on open**: fold the latest snapshot plus all later
  *    entries, in sequence order, back into the keyed state. Entries
  *    carry the RESULTING rows (upsert semantics), so replay is a pure
  *    fold — it never re-runs Spark jobs and cannot diverge from the
  *    state the writer observed.
  *  - **Checkpoint**: `snapshot-<seq>.json` supersedes all entries
  *    `<= seq`; older files are deleted. Journal growth is bounded by
  *    mutation rate between checkpoints, and `ViewStreams.save` folds
  *    a checkpoint in.
  *  - **Single-writer fencing**: a `_owner` lease file (owner id +
  *    expiry) enforces the one-writer-per-journal rule the reference
  *    expresses with row locks (`FOR UPDATE SKIP LOCKED`,
  *    schema.sql:411). A second process opening the same journal gets
  *    a clean rejection until the lease expires; after expiry it may
  *    take over (crash recovery). The lease refreshes on append once
  *    past its half-life, and a refresh that discovers a foreign owner
  *    throws — the writer knows it has been fenced.
  *
  * Scale note (100 TB deployment): the journal is control-plane-sized —
  * entries are O(locks touched per mutation), the same rows the
  * reference writes per transaction. One small file per ACK is the
  * file-system analogue of one WAL record per transaction; group
  * commit (batching several ACKs into one entry) is a drop-in
  * extension since `append` already takes a batch of lock rows.
  */
final class ControlJournal(dirStr: String,
                           conf: Configuration,
                           val ownerId: String,
                           clock: () => Timestamp,
                           leaseMs: Long = 60000L) {
  import ControlJournal._

  private val dir = new Path(dirStr)
  private val fs = FileSystem.get(dir.toUri, conf)
  private val ownerPath = new Path(dir, OwnerFile)
  private var seq: Long = 0L
  private var leaseExpiry: Long = 0L

  // ------------------------------------------------------------------
  // Ownership lease

  /** Acquire the writer lease, or throw [[OwnershipHeldException]] if a
    * different live owner holds it. An expired lease is taken over
    * (the crashed-writer path). Claiming is write-then-READ-BACK: when
    * two takeover candidates race past the liveness check, both write
    * the owner file (each write is one atomic replace) but the
    * last-writer-wins content then tells every reader exactly one
    * winner — the loser sees a foreign id on read-back and throws
    * before touching the sequence. Also positions `seq` after the last
    * existing entry so appends continue the sequence.
    */
  def acquire(): Unit = {
    fs.mkdirs(dir)
    val nowMs = clock().getTime
    readOwner() match {
      case Some((id, exp)) if id != ownerId && exp > nowMs =>
        throw new OwnershipHeldException(
          s"control journal at $dirStr is held by writer '$id' until epoch-ms $exp; " +
            "a second live writer on the same journal would double-deliver " +
            "(reference FOR UPDATE SKIP LOCKED, schema.sql:411)")
      case _ => ()
    }
    writeOwner(nowMs + leaseMs)
    verifyOwnership()
    seq = math.max(latestSnapshotSeq(), listEntrySeqs().lastOption.getOrElse(0L))
  }

  /** Read the owner file back and throw if another writer's claim
    * landed after ours — the deterministic single-winner step.
    */
  private def verifyOwnership(): Unit = readOwner() match {
    case Some((id, _)) if id == ownerId => ()
    case other =>
      throw new OwnershipHeldException(
        s"writer '$ownerId' lost the claim race for $dirStr to ${other.map(_._1)}")
  }

  /** Release the lease (clean shutdown). Safe to call when not held. */
  def release(): Unit = {
    readOwner() match {
      case Some((id, _)) if id == ownerId => fs.delete(ownerPath, false)
      case _ => ()
    }
  }

  private def readOwner(): Option[(String, Long)] =
    if (!fs.exists(ownerPath)) None
    else {
      val in = fs.open(ownerPath)
      try {
        val txt = new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        val i = txt.lastIndexOf('@')
        if (i < 0) None else Some((txt.substring(0, i), txt.substring(i + 1).trim.toLong))
      } finally in.close()
    }

  private def writeOwner(expiry: Long): Unit = {
    atomicWrite(ownerPath, s"$ownerId@$expiry".getBytes("UTF-8"))
    leaseExpiry = expiry
  }

  /** Refresh the lease past its half-life; throw if a foreign owner has
    * taken over (we crashed long enough to be fenced, then came back).
    */
  private def refreshLease(): Unit = {
    val nowMs = clock().getTime
    if (nowMs >= leaseExpiry - leaseMs / 2) {
      readOwner() match {
        case Some((id, exp)) if id != ownerId && exp > nowMs =>
          throw new OwnershipHeldException(
            s"writer '$ownerId' was fenced: journal $dirStr now held by '$id'")
        case _ =>
          writeOwner(nowMs + leaseMs)
          verifyOwnership() // a racing takeover may have written after us
      }
    }
  }

  // ------------------------------------------------------------------
  // Append / replay / checkpoint

  /** Durably record one mutation. Called inside the owner's
    * control-plane critical section, so `seq` needs no extra lock.
    */
  def append(rec: Record): Unit = {
    refreshLease()
    seq += 1
    atomicWrite(entryPath(seq), mapper.writeValueAsBytes(rec))
  }

  /** Fold snapshot + later entries into the final (views, locks). */
  def replay(): (Seq[ViewRegistration], Seq[LockRow]) = {
    val views = scala.collection.mutable.LinkedHashMap.empty[String, ViewRegistration]
    val locks = scala.collection.mutable.LinkedHashMap.empty[(String, String), LockRow]
    val snapSeq = latestSnapshotSeq()
    if (snapSeq > 0L) {
      val snap = readJson[Snapshot](new Path(dir, f"$SnapshotPrefix$snapSeq%020d.json"))
      snap.views.foreach(v => views(v.view) = v.toRow)
      snap.locks.foreach(l => locks((l.view, l.decider_id)) = l.toRow)
    }
    listEntrySeqs().filter(_ > snapSeq).foreach { s =>
      val rec = readJson[Record](entryPath(s))
      rec.op match {
        case OpViewUpsert =>
          val v = rec.view.toRow; views(v.view) = v
        case OpViewDelete =>
          views.remove(rec.name)
          locks.filterInPlace { case ((v, _), _) => v != rec.name }
        case OpLocksReplace =>
          locks.filterInPlace { case ((v, _), _) => v != rec.name }
          rec.locks.foreach(l => locks((l.view, l.decider_id)) = l.toRow)
        case OpLocksUpsert =>
          rec.locks.foreach(l => locks((l.view, l.decider_id)) = l.toRow)
        case OpViewReplace =>
          val v = rec.view.toRow
          views(v.view) = v
          locks.filterInPlace { case ((view, _), _) => view != v.view }
          rec.locks.foreach(l => locks((l.view, l.decider_id)) = l.toRow)
        case other => throw new IllegalStateException(s"unknown journal op '$other' at seq $s")
      }
    }
    (views.values.toSeq, locks.values.toSeq)
  }

  /** Write a snapshot at the current sequence position and delete the
    * entries (and older snapshots) it supersedes.
    */
  def checkpoint(views: Seq[ViewRegistration], locks: Seq[LockRow]): Unit = {
    refreshLease()
    val snap = Snapshot(views.map(JView.of).toArray, locks.map(JLock.of).toArray)
    atomicWrite(new Path(dir, f"$SnapshotPrefix$seq%020d.json"),
      mapper.writeValueAsBytes(snap))
    listEntrySeqs().filter(_ <= seq).foreach(s => fs.delete(entryPath(s), false))
    snapshotSeqs().filter(_ < seq).foreach(s =>
      fs.delete(new Path(dir, f"$SnapshotPrefix$s%020d.json"), false))
  }

  // ------------------------------------------------------------------
  // File plumbing

  private def entryPath(s: Long): Path = new Path(dir, f"$s%020d.json")

  private def listEntrySeqs(): Seq[Long] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case EntryName(d) => d.toLong }.sorted

  private def snapshotSeqs(): Seq[Long] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case SnapshotName(d) => d.toLong }.sorted

  private def latestSnapshotSeq(): Long = snapshotSeqs().lastOption.getOrElse(0L)

  /** Write-to-temp + ONE atomic rename-with-overwrite (FileContext) —
    * no delete-then-rename window where a concurrent reader could
    * observe the path absent.
    */
  private def atomicWrite(path: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(path.getParent, s".tmp-${path.getName}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.makeQualified(path).toUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(path),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def readJson[T](path: Path)(implicit ct: scala.reflect.ClassTag[T]): T = {
    val in = fs.open(path)
    try mapper.readValue(org.apache.commons.io.IOUtils.toByteArray(in),
      ct.runtimeClass.asInstanceOf[Class[T]])
    finally in.close()
  }
}

object ControlJournal {
  final class OwnershipHeldException(msg: String) extends IllegalStateException(msg)

  private val OwnerFile = "_owner"
  private val SnapshotPrefix = "snapshot-"
  private val EntryName = """(\d{20})\.json""".r
  private val SnapshotName = """snapshot-(\d{20})\.json""".r

  val OpViewUpsert = "view_upsert"
  val OpViewDelete = "view_delete"
  /** Clear a view's locks, then insert the given rows. */
  val OpLocksReplace = "locks_replace"
  val OpLocksUpsert = "locks_upsert"
  /** registerView as ONE record: upsert the view AND replace its lock
    * matrix — a crash can never replay the registration half-applied
    * (the reference runs it as one transaction, schema.sql:376-393).
    */
  val OpViewReplace = "view_replace"

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m
  }

  /** JSON-stable mirrors of the model rows: timestamps as epoch millis,
    * options as nullable boxes, so the wire format is independent of
    * Jackson's java.sql.Timestamp handling.
    */
  final case class JView(view: String, start_at: Long, lock_timeout_s: Long,
                         pooling_delay_s: java.lang.Long, edge_function_url: String,
                         created_at: Long, updated_at: Long) {
    def toRow: ViewRegistration = ViewRegistration(view, new Timestamp(start_at),
      lock_timeout_s, Option(pooling_delay_s).map(_.longValue()),
      Option(edge_function_url), new Timestamp(created_at), new Timestamp(updated_at))
  }
  object JView {
    def of(v: ViewRegistration): JView = JView(v.view, v.start_at.getTime,
      v.lock_timeout_s, v.pooling_delay_s.map(Long.box).orNull,
      v.edge_function_url.orNull, v.created_at.getTime, v.updated_at.getTime)
  }

  final case class JLock(view: String, decider_id: String, offset: Long,
                         last_offset: Long, locked_until: Long, offset_final: Boolean,
                         created_at: Long, updated_at: Long) {
    def toRow: LockRow = LockRow(view, decider_id, offset, last_offset,
      new Timestamp(locked_until), offset_final,
      new Timestamp(created_at), new Timestamp(updated_at))
  }
  object JLock {
    def of(l: LockRow): JLock = JLock(l.view, l.decider_id, l.offset, l.last_offset,
      l.locked_until.getTime, l.offset_final, l.created_at.getTime, l.updated_at.getTime)
  }

  final case class Record(op: String, name: String = null,
                          view: JView = null, locks: Array[JLock] = Array.empty)
  final case class Snapshot(views: Array[JView], locks: Array[JLock])
}
