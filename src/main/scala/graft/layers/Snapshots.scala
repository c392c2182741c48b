package graft.layers

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshots with time-travel reads — the Delta-style
  * `VERSION AS OF` surface for SLOWLY-CHANGING, DIMENSION-SIZED tables:
  * each write lands a complete copy under `path/version=N` and then
  * commits a LATEST pointer, so readers only ever see fully-written
  * versions and any historical version stays readable until vacuumed.
  *
  * Commit protocol is [[graft.operators.IvfIndex.flipCurrent]]'s
  * (write-tmp → delete → rename, with the tmp consulted during the
  * delete→rename window), so a crash at any point leaves the previous
  * version live — a half-written data directory without a pointer flip
  * is invisible and simply overwritten by the next attempt.
  *
  * Scope and scale: full-copy-per-version is the DIMENSION shape (small
  * tables, cheap copies, instant point-in-time reads for auditing and
  * reproducible training runs — pin `version=N` in a manifest and the
  * run re-reads byte-identical inputs). Fact-sized history uses the
  * engine's partitioned appends + HWM incremental reads
  * ([[graft.layers.Hwm]]) instead; and row-level maintenance inside a
  * version is [[Merge]]'s job. Reads open exactly one version directory
  * (no listing of the others' contents); `versions`/`latestVersion` are
  * one directory listing.
  */
object Snapshots {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def pointer(spark: SparkSession, path: String): Option[Long] =
    graft.runtime.PointerFile.read(fs(spark, path),
      new Path(s"$path/LATEST"), new Path(s"$path/LATEST.tmp")).map(_.toLong)

  /** Snapshot `df` as the next version; returns the committed version
    * number. The data write is an overwrite of its own `version=N`
    * directory (idempotent per N); the pointer flip commits it.
    */
  def write(df: DataFrame, path: String): Long = {
    val v = pointer(df.sparkSession, path).map(_ + 1).getOrElse(0L)
    writeVersion(df, path, v)
  }

  /** Snapshot `df` under a CALLER-OWNED version number — the streaming
    * epoch discipline applied to snapshots: a caller with a stable
    * batch id (e.g. [[graft.streaming.DimMaintenanceStream]]) passes it
    * here, so a replayed batch overwrites the SAME version with the
    * same content instead of appending a duplicate — exactly-once
    * version history by construction. The pointer only ever advances
    * (`max(current, v)`): replaying an old batch restores its directory
    * but cannot roll LATEST back.
    */
  def writeVersion(df: DataFrame, path: String, v: Long): Long = {
    writeVersionData(df, path, v)
    commitVersion(df.sparkSession, path, v)
  }

  /** The DATA half of [[writeVersion]]: land `version=N` (idempotent
    * overwrite of its own directory, still invisible — no pointer moves)
    * and seed the schema memo. Pair with [[commitVersion]]. Splitting
    * the two is what lets a maintainer overlap SEVERAL versions' data
    * writes (independent Spark jobs, guide §2.6) and still flip the
    * pointers in the crash-ordering its protocol requires — a crash
    * before the flip leaves only invisible debris the retry overwrites.
    */
  def writeVersionData(df: DataFrame, path: String, v: Long): Unit = {
    require(v >= 0, s"version must be non-negative, got $v")
    df.write.mode("overwrite").parquet(s"$path/version=$v")
    // the writer knows the schema for free — later reads of this version
    // dir skip the footer-inference job (round-15 optimization). Seed the
    // schema AS INFERENCE WOULD PRODUCE IT (round-16 advice): the parquet
    // round-trip forces nullability and erases char/varchar, so a memo
    // hit must not surface a schema a cold read never could.
    val normalized = AtomicAppend.relaxNullability(
      org.apache.spark.sql.catalyst.util.CharVarcharUtils
        .replaceCharVarcharWithString(df.schema))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    graft.runtime.ParquetSchemaMemo.seed(df.sparkSession, s"$path/version=$v", normalized)
  }

  /** The POINTER half of [[writeVersion]] — the visibility commit. The
    * pointer only ever advances (`max(current, v)`), so replaying an old
    * version restores its directory but cannot roll LATEST back.
    */
  def commitVersion(spark: SparkSession, path: String, v: Long): Long = {
    if (pointer(spark, path).forall(_ < v))
      graft.runtime.PointerFile.commit(fs(spark, path),
        new Path(s"$path/LATEST"), new Path(s"$path/LATEST.tmp"), v.toString)
    v
  }

  def latestVersion(spark: SparkSession, path: String): Option[Long] =
    pointer(spark, path)

  /** Committed versions still on disk (vacuum removes old ones). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val base = new Path(path)
    val latest = pointer(spark, path)
    if (!f.exists(base) || latest.isEmpty) return Seq.empty
    f.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("version="))
      // tolerate stray non-numeric dirs (version=2.bak backups, tooling
      // artifacts) — they are not versions, and one must not brick every
      // read/write/vacuum at this path with a NumberFormatException
      .flatMap(st =>
        scala.util.Try(st.getPath.getName.stripPrefix("version=").toLong).toOption)
      .filter(_ <= latest.get) // a crashed in-flight write is not a version
      .sorted
  }

  /** Read a pinned version (`VERSION AS OF`), or the latest when
    * `version < 0`. Throws on a vacuumed or never-committed version.
    */
  def read(spark: SparkSession, path: String, version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version
      else pointer(spark, path).getOrElse(
        throw new IllegalArgumentException(s"no committed snapshot at $path"))
    require(versions(spark, path).contains(v),
      s"version $v is not available at $path (vacuumed or never committed)")
    graft.runtime.ParquetSchemaMemo.read(spark, s"$path/version=$v")
  }

  /** Drop all but the newest `keepLast` committed versions; the latest
    * is always kept. Returns the vacuumed version numbers.
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the latest version")
    val f = fs(spark, path)
    val vs = versions(spark, path)
    val drop = vs.dropRight(keepLast)
    drop.foreach(v => f.delete(new Path(s"$path/version=$v"), true))
    drop
  }
}
