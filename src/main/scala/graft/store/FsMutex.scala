package graft.store

import java.sql.Timestamp
import org.apache.hadoop.fs.{FileSystem, Path}

/** Cross-process TTL mutex over a filesystem directory — the claim
  * scheme [[ControlJournal]]/[[WriterLease]] use for long-lived
  * ownership, narrowed to a short critical section. Claiming creates
  * the NEXT `<prefix><epoch>` file with an atomic create-exclusive
  * ([[AtomicFs.createExclusive]]): of N claimants racing past the
  * expired-claim check exactly one wins; a crashed holder's claim
  * expires by TTL and the next claimant takes over. Extracted from
  * [[SharedJournal]]'s candidate-selection mutex so the event log's
  * commit serialization ([[SharedLog]]) shares one proven primitive.
  *
  * The wall-clock deadline is a deadlock guard only — liveness
  * decisions use the injectable `clock` (frozen-clock tests hold the
  * TTL open deliberately).
  */
final class FsMutex(dir: Path,
                    fs: FileSystem,
                    val ownerId: String,
                    clock: () => Timestamp,
                    ttlMs: Long,
                    prefix: String = "_mutex-",
                    acquireDeadlineMs: Long = 120L * 1000) {

  private val claimName = (java.util.regex.Pattern.quote(prefix) + """(\d{20})""").r
  private var epoch: Long = 0L

  /** Run `f` holding the mutex. */
  def withLock[T](f: => T): T = {
    acquire()
    try f finally release()
  }

  def acquire(): Unit = {
    val deadline = System.nanoTime() + acquireDeadlineMs * 1000 * 1000
    while (true) {
      val nowMs = clock().getTime
      val top = claimSeqs().lastOption
      val topLive = top.exists { e =>
        readClaim(claimPath(e)) match {
          case Some((id, exp)) => id != ownerId && exp > nowMs
          case None => true // unreadable claim: treat live (conservative)
        }
      }
      if (!topLive) {
        val next = top.getOrElse(0L) + 1L
        val expiry = nowMs + ttlMs
        if (AtomicFs.createExclusive(fs, claimPath(next),
              s"$ownerId@$expiry".getBytes("UTF-8"), ownerId)) {
          epoch = next
          claimSeqs().filter(_ < next).foreach(e => fs.delete(claimPath(e), false))
          return
        }
      }
      if (System.nanoTime() > deadline)
        throw new IllegalStateException(
          s"'$ownerId' timed out waiting for the mutex at $dir ($prefix)")
      Thread.sleep(5)
    }
  }

  def release(): Unit = {
    if (epoch > 0L) fs.delete(claimPath(epoch), false)
    epoch = 0L
  }

  /** True while OUR claim is still the live top epoch — a holder whose
    * TTL expired mid-section can check before its commit point (the
    * createExclusive commit files are the hard fence; this is the
    * cheap early-out).
    */
  def stillHeld(): Boolean =
    claimSeqs().lastOption.contains(epoch) && epoch > 0L

  /** Heartbeat: refresh OUR claim's expiry in place (atomic
    * rename-overwrite of the claim file with a fresh TTL), so a
    * holder whose critical section outlives one TTL keeps the lock
    * for as long as it is ALIVE — TTL takeover then only ever fires
    * on a holder that stopped renewing (crashed, or stalled longer
    * than the TTL). Returns false WITHOUT writing when our claim is
    * no longer the live top epoch: a takeover already happened and a
    * dead claim must not resurrect itself under the new holder.
    */
  def renew(): Boolean = {
    if (epoch <= 0L || !stillHeld()) false
    else {
      val expiry = clock().getTime + ttlMs
      AtomicFs.atomicWrite(fs, fs.getConf, claimPath(epoch),
        s"$ownerId@$expiry".getBytes("UTF-8"))
      true
    }
  }

  private def claimPath(e: Long): Path = new Path(dir, f"$prefix$e%020d")

  private def claimSeqs(): Seq[Long] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case claimName(d) => d.toLong }.sorted

  private def readClaim(p: Path): Option[(String, Long)] =
    try {
      val in = fs.open(p)
      try {
        val txt = new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        val i = txt.lastIndexOf('@')
        if (i < 0) None else Some((txt.substring(0, i), txt.substring(i + 1).trim.toLong))
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }
}
