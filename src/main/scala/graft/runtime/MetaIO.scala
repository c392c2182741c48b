package graft.runtime

import java.io.{InputStream, OutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.fs.{FileSystem, Path}

/** Tiny-metadata-file I/O for the engine's commit protocols (pointer
  * files, `_VLOG` entries, markers, `_STATS`/`_BLOOM`/scalar sidecars) —
  * round-15 optimization (guide §7.3 evidence): on a LOCAL filesystem
  * every Hadoop `fs.create` of one of these files pays a `chmod` process
  * FORK (no native Hadoop library in a bare JVM ⇒ permission handling
  * shells out) plus a `.crc` sibling write through ChecksumFileSystem —
  * measured 5-8% of every commit-protocol query's wall time, spread over
  * dozens of sub-millisecond files. This helper routes `file:` scheme
  * I/O through java.nio (no forks, no checksum siblings, atomic
  * `Files.move` for renames) and delegates every other scheme to the
  * Hadoop FileSystem unchanged, so HDFS/object-store deployments keep
  * their semantics.
  *
  * The nio path deletes any stale `.name.crc` sibling a PREVIOUS
  * Hadoop-path write may have left, so a mixed history can never trip a
  * later checksum verification.
  */
private[graft] object MetaIO {

  private def localPath(p: Path): Option[java.nio.file.Path] = {
    val uri = p.toUri
    val scheme = uri.getScheme
    if (scheme == null || scheme == "file") Some(Paths.get(uri.getPath)) else None
  }

  private def isLocal(fs: FileSystem): Boolean = fs.getScheme == "file"

  private def dropCrc(nio: java.nio.file.Path): Unit = {
    val crc = nio.resolveSibling("." + nio.getFileName.toString + ".crc")
    Files.deleteIfExists(crc); ()
  }

  /** Create (overwrite) `p` for writing; parents are created. */
  def create(fs: FileSystem, p: Path): OutputStream =
    localPath(p).filter(_ => isLocal(fs)) match {
      case Some(nio) =>
        Option(nio.getParent).foreach(Files.createDirectories(_))
        dropCrc(nio)
        Files.newOutputStream(nio)
      case None => fs.create(p, true)
    }

  /** Open `p` for reading; java.io.FileNotFoundException when absent
    * (both paths), matching the Hadoop contract callers already handle.
    */
  def open(fs: FileSystem, p: Path): InputStream =
    localPath(p).filter(_ => isLocal(fs)) match {
      case Some(nio) =>
        try Files.newInputStream(nio)
        catch {
          case _: java.nio.file.NoSuchFileException =>
            throw new java.io.FileNotFoundException(p.toString)
        }
      case None => fs.open(p)
    }

  /** Atomically move `src` over `dst` (replacing it). On the nio path
    * this is ONE atomic rename — strictly tighter than Hadoop's
    * delete-then-rename, which the caller otherwise performs. Returns
    * false on failure, like Hadoop's rename.
    */
  def replace(fs: FileSystem, src: Path, dst: Path): Boolean =
    (localPath(src), localPath(dst)) match {
      case (Some(s), Some(d)) if isLocal(fs) =>
        try {
          dropCrc(d)
          Files.move(s, d, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
          true
        } catch {
          // a local filesystem without atomic replacing renames must fall
          // back to the portable delete-then-rename, not hard-fail every
          // pointer commit (round-16 advice); any OTHER IOException still
          // reports failure to the caller
          case _: java.nio.file.AtomicMoveNotSupportedException =>
            if (fs.exists(dst)) fs.delete(dst, false)
            fs.rename(src, dst)
          case _: java.io.IOException => false
        }
      case _ =>
        if (fs.exists(dst)) fs.delete(dst, false)
        fs.rename(src, dst)
    }
}
