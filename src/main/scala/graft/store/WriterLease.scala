package graft.store

import java.sql.Timestamp
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Epoch-file writer lease: the single-writer fencing scheme shared by
  * [[ControlJournal]] (views/locks journal) and [[EventStore]]'s
  * at-rest log. The live owner is the HIGHEST `<prefix><epoch>` file;
  * claiming creates the NEXT epoch with an atomic create-exclusive
  * ([[AtomicFs.createExclusive]]), so of two candidates racing past
  * the expired-lease check exactly one wins — no write-then-read-back
  * window, no delete in the claim path that could nuke a rival's
  * fresh claim. Refresh rewrites only the owned epoch file (a usurper
  * always claims a higher epoch, never writes ours) and throws when a
  * higher epoch exists — the writer knows it has been fenced.
  *
  * Fencing is lease-clock-based: a writer paused past `leaseMs` and
  * resumed detects the takeover at its next refresh — correct to
  * within clock skew, the standard WAL-lease tradeoff (an object-store
  * CAS would be stronger but is not portably available).
  */
final class WriterLease(dir: Path,
                        fs: FileSystem,
                        conf: Configuration,
                        val ownerId: String,
                        clock: () => Timestamp,
                        leaseMs: Long,
                        prefix: String = "_owner-",
                        legacyName: Option[String] = None,
                        what: String = "directory") {
  import ControlJournal.OwnershipHeldException

  private val ownerName = (java.util.regex.Pattern.quote(prefix) + """(\d{20})""").r
  private var epoch: Long = 0L
  private var leaseExpiry: Long = 0L

  /** Acquire the lease, or throw [[OwnershipHeldException]] if a
    * different live owner holds it. An expired lease is taken over
    * (the crashed-writer path) by claiming the next epoch atomically.
    */
  def acquire(): Unit = {
    fs.mkdirs(dir)
    val nowMs = clock().getTime
    val cur = currentOwner()
    cur match {
      case Some((_, id, exp)) if id != ownerId && exp > nowMs =>
        throw new OwnershipHeldException(
          s"$what at $dir is held by writer '$id' until epoch-ms $exp; " +
            "a second live writer would clobber its in-flight publishes " +
            "(reference FOR UPDATE SKIP LOCKED, schema.sql:411)")
      case _ => ()
    }
    val nextEpoch = cur.map(_._1 + 1L).getOrElse(1L)
    val expiry = nowMs + leaseMs
    if (!AtomicFs.createExclusive(fs, epochPath(nextEpoch),
          s"$ownerId@$expiry".getBytes("UTF-8"), ownerId))
      throw new OwnershipHeldException(
        s"writer '$ownerId' lost the claim race for $what at $dir at epoch $nextEpoch")
    epoch = nextEpoch
    leaseExpiry = expiry
    // Superseded epochs (and the pre-epoch legacy file) are dead
    // weight: liveness is decided by the max epoch, so deleting lower
    // ones can never promote a rival.
    epochSeqs().filter(_ < nextEpoch).foreach(e => fs.delete(epochPath(e), false))
    legacyName.foreach(n => fs.delete(new Path(dir, n), false))
  }

  /** Refresh past the half-life; throw if a higher epoch fenced us. */
  def refresh(): Unit = {
    val nowMs = clock().getTime
    if (nowMs >= leaseExpiry - leaseMs / 2) {
      epochSeqs().lastOption match {
        case Some(top) if top > epoch =>
          val holder = readOwnerFile(epochPath(top)).map(_._1).getOrElse("<unknown>")
          throw new OwnershipHeldException(
            s"writer '$ownerId' was fenced: $what at $dir now held by '$holder' at epoch $top")
        case _ =>
          val expiry = nowMs + leaseMs
          AtomicFs.atomicWrite(fs, conf, epochPath(epoch),
            s"$ownerId@$expiry".getBytes("UTF-8"))
          leaseExpiry = expiry
      }
    }
  }

  /** Unconditional fence check — no half-life gate. [[refresh]] only
    * inspects the epochs once the lease passes its half-life, so a
    * writer whose lease expired DURING a long write job (the common
    * case at production scale: job duration > leaseMs) would sail
    * through a top-of-mutation refresh and still flip the version
    * pointer, clobbering a successor's publish. Call this immediately
    * before the pointer flip: it always lists the epochs and throws if
    * a higher epoch (or a missing claim) fenced us. On success the
    * lease is re-armed, so a burst of publishes cannot expire between
    * half-life refreshes. Still lease-clock-bounded (see class doc):
    * a rival that claims in the check→flip window is the irreducible
    * skew case, but the window shrinks from O(job) to O(one listing).
    */
  def assertHeld(): Unit = {
    val top = epochSeqs().lastOption
    top match {
      case Some(t) if t == epoch =>
        val expiry = clock().getTime + leaseMs
        AtomicFs.atomicWrite(fs, conf, epochPath(epoch),
          s"$ownerId@$expiry".getBytes("UTF-8"))
        leaseExpiry = expiry
      case Some(t) if t > epoch =>
        val holder = readOwnerFile(epochPath(t)).map(_._1).getOrElse("<unknown>")
        throw new OwnershipHeldException(
          s"writer '$ownerId' was fenced before publish: $what at $dir now held by " +
            s"'$holder' at epoch $t (ours: $epoch)")
      case _ =>
        throw new OwnershipHeldException(
          s"writer '$ownerId' no longer holds $what at $dir: claim file for epoch " +
            s"$epoch is gone")
    }
  }

  /** Release the lease (clean shutdown). Safe to call when not held. */
  def release(): Unit = currentOwner() match {
    case Some((e, id, _)) if id == ownerId && e == epoch =>
      fs.delete(epochPath(e), false)
    case _ => ()
  }

  /** The live claim: highest epoch file, falling back to the optional
    * legacy un-epoched file as epoch 0. Unparseable content (an
    * HDFS-like store can expose a created-but-unwritten file for a
    * moment) is treated as a live foreign hold expiring `leaseMs` past
    * the file's mtime — conservative: it delays takeover, never
    * permits a double-claim.
    */
  private def currentOwner(): Option[(Long, String, Long)] = {
    val top = epochSeqs().lastOption.map(e => (e, epochPath(e)))
      .orElse(legacyName.flatMap { n =>
        val legacy = new Path(dir, n)
        if (fs.exists(legacy)) Some((0L, legacy)) else None
      })
    top.map { case (e, p) =>
      readOwnerFile(p) match {
        case Some((id, exp)) => (e, id, exp)
        case None =>
          val mtime = try fs.getFileStatus(p).getModificationTime catch {
            case _: java.io.FileNotFoundException => 0L
          }
          (e, s"<unreadable claim $p>", mtime + leaseMs)
      }
    }
  }

  private def readOwnerFile(p: Path): Option[(String, Long)] =
    try {
      val in = fs.open(p)
      try {
        val txt = new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        val i = txt.lastIndexOf('@')
        if (i < 0) None else Some((txt.substring(0, i), txt.substring(i + 1).trim.toLong))
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }

  private def epochPath(e: Long): Path = new Path(dir, f"$prefix$e%020d")

  private def epochSeqs(): Seq[Long] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case ownerName(d) => d.toLong }.sorted
}
