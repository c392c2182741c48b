package graft.runtime

import org.apache.hadoop.fs.{FileSystem, Path}

/** THE crash-safe pointer-file protocol, shared by every generation /
  * version pointer in the engine ([[graft.operators.IvfIndex]]'s
  * CURRENT, [[graft.layers.Snapshots]]' LATEST):
  *
  *   - COMMIT is write-tmp → delete → rename: the tmp is fully written
  *     and closed before the old pointer is deleted, so every instant
  *     of the flip has a complete pointer on disk under one of the two
  *     names;
  *   - READ opens the main file FIRST and treats FileNotFound as "the
  *     flip's delete ran between my existence check and my open" —
  *     falling through to the tmp, then retrying once (the rename may
  *     have completed in between, making the tmp vanish too). A bare
  *     exists-then-open is a TOCTOU: the delete can land in the gap and
  *     crash the reader, or leave it resolving the absent-pointer
  *     fallback while a committed pointer exists.
  *
  * Single-writer protocol (streams/maintenance drivers serialize their
  * own commits); readers are concurrent and lock-free.
  */
private[graft] object PointerFile {

  /** Read the pointer's content, racing safely against a concurrent
    * [[commit]]; None only when no commit has ever completed.
    */
  def read(fs: FileSystem, main: Path, tmp: Path): Option[String] = {
    def tryOpen(p: Path): Option[String] =
      try {
        val in = MetaIO.open(fs, p)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
        finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
    def once(): Option[String] = tryOpen(main).orElse(tryOpen(tmp))
    // one retry: between "main absent" and "tmp absent" the rename can
    // complete, moving the content back under main
    once().orElse(once())
  }

  /** Commit `content` as the pointer's new value. On a local filesystem
    * the flip is ONE atomic replace (java.nio, see [[MetaIO.replace]]) —
    * strictly tighter than the delete→rename below, which remains the
    * portable path for filesystems without atomic replacing renames.
    */
  def commit(fs: FileSystem, main: Path, tmp: Path, content: String): Unit = {
    val out = MetaIO.create(fs, tmp)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    require(MetaIO.replace(fs, tmp, main), s"failed to commit pointer at $main")
  }
}
