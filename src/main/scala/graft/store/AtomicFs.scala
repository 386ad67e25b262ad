package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Filesystem atomicity primitives shared by the control-plane journals
  * ([[ControlJournal]], [[SharedJournal]]). Two operations cover every
  * need: publish-with-replace (pointer flips, lease refresh) and
  * create-exclusive (claim races — the reference's row-lock analogue).
  */
private[store] object AtomicFs {

  /** Write-to-temp + ONE atomic rename-with-overwrite (FileContext) —
    * no delete-then-rename window where a concurrent reader could
    * observe the path absent.
    */
  def atomicWrite(fs: FileSystem, conf: Configuration,
                  path: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(path.getParent, s".tmp-${path.getName}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.makeQualified(path).toUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(path),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Create `path` with the given content atomically, failing (false)
    * if it already exists. On local paths a hard link publishes the
    * fully-written temp file — link(2) is atomic and EEXIST-safe, where
    * `RawLocalFileSystem.create(overwrite=false)` is check-then-act.
    * On HDFS-like stores `create(overwrite=false)` is atomic at the
    * namenode. `tmpTag` keeps concurrent claimants' temp files apart.
    */
  def createExclusive(fs: FileSystem, path: Path, bytes: Array[Byte],
                      tmpTag: String): Boolean = {
    val qualified = fs.makeQualified(path)
    if (qualified.toUri.getScheme == "file") {
      val tmp = new Path(path.getParent, s".claim-$tmpTag-${path.getName}")
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(qualified.toUri.getPath),
          java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally fs.delete(tmp, false)
    } else {
      try {
        val out = fs.create(path, false)
        try out.write(bytes) finally out.close()
        true
      } catch {
        case e: java.io.IOException => if (fs.exists(path)) false else throw e
      }
    }
  }
}
