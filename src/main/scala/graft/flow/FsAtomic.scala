package graft.flow

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}

/** Atomic filesystem commit primitives shared by every durable-marker
  * writer (backup registry/sets, WAL commit, lifecycle journals). The
  * delete-then-rename idiom these replace has a window where a crash
  * leaves NO file at all — a reader then silently sees an empty state
  * instead of either generation.
  */
object FsAtomic {

  /** Rename `tmp` onto `dst`, atomically replacing any existing file
    * (FileContext rename with OVERWRITE): a reader always sees either
    * the old or the new bytes, never neither. */
  def renameOverwrite(conf: Configuration, tmp: Path, dst: Path,
      what: String): Unit = {
    val fc = FileContext.getFileContext(dst.toUri, conf)
    try fc.rename(tmp, dst, Options.Rename.OVERWRITE)
    catch {
      case e: java.io.IOException =>
        throw new IllegalStateException(s"could not commit $what", e)
    }
  }

  /** Write `bytes` to `dst` atomically (tmp + overwrite-rename): a
    * crash mid-write can never leave a torn file under `dst`. */
  def writeAtomic(conf: Configuration, dst: Path, bytes: Array[Byte],
      what: String): Unit = {
    val fs = dst.getFileSystem(conf)
    val tmp = new Path(dst.getParent, s".${dst.getName}.tmp")
    try {
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      renameOverwrite(conf, tmp, dst, what)
    } catch {
      case t: Throwable =>
        // a stray tmp is not just junk: it defeats emptied-dir checks
        // (e.g. the recovery sweep's drop-empty-family-dir pass)
        try fs.delete(tmp, false) catch { case _: Exception => () }
        throw t
    }
  }
}
