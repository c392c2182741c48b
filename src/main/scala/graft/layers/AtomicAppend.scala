package graft.layers

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic-visibility batch appends — the role Delta's `_delta_log` plays
  * in every reference table write (`docs/ARCHITECTURE.md:167-174`,
  * `streaming_job.py:100-105`): a reader concurrent with a multi-file
  * append must see either none of the batch or all of it, never a torn
  * prefix. A bare `mode("append").parquet` gives no such boundary — the
  * files land one task at a time and a concurrent scan lists whatever
  * exists at that instant.
  *
  * Discipline (the engine-wide epoch convention,
  * [[graft.streaming.IdempotentSink]]'s batch shape generalized to plain
  * BATCH appends): each append overwrites its own `_batch=<id>`
  * subdirectory, then commits a `_COMMITTED` marker file; [[read]] lists
  * marker-bearing directories and scans exactly those. The leading
  * underscore keeps a naive `spark.read.parquet(path)` from seeing
  * half-landed files too (Spark's file index skips underscore paths) —
  * but such a read sees committed batches AS EMPTY as well, so tables
  * written through this API are read through [[read]].
  *
  * Idempotence: with a caller-owned `batchId` (a stream epoch, an
  * orchestrator run id) a replay overwrites the same directory and
  * re-commits — exactly-once content by construction; a replay that
  * finds the marker already present skips entirely. Without one, the
  * next free id is allocated (single-writer — concurrent WRITERS need
  * caller-owned disjoint ids; readers are lock-free and concurrent).
  *
  * Scale: the marker protocol adds two metadata ops per append and a
  * directory listing per read — both O(batches), independent of data
  * size; partition columns (`partitionBy`) live INSIDE each batch
  * directory, so partition pruning still reaches the scan per batch.
  * Batch-dir fragmentation across many appends is [[compact]]'s job:
  * folding k committed batches into one needs an ATOMIC visibility flip
  * (marker listing alone can't express "replaced" — landing the folded
  * copy would double the data for a concurrent lister), so the first
  * compaction upgrades the table to a `_MANIFEST` pointer (the
  * engine-wide [[graft.runtime.PointerFile]] protocol) naming the live
  * batch ids; from then on readers resolve the manifest — one metadata
  * read instead of O(batches) marker probes — and every flip is
  * write-new-state → commit-pointer, crash-safe at any instant.
  * Writers are single-maintainer per table (the engine-wide contract);
  * readers stay concurrent and lock-free on either protocol.
  */
object AtomicAppend {

  private val Marker = "_COMMITTED"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestIds(spark: SparkSession, basePath: String): Option[Seq[Long]] =
    graft.runtime.PointerFile.read(fs(spark, basePath),
      new Path(s"$basePath/_MANIFEST"), new Path(s"$basePath/_MANIFEST.tmp"))
      .map(s => if (s.isEmpty) Seq.empty
        else s.split(",").map(_.trim.toLong).toSeq.sorted)

  private def commitManifest(spark: SparkSession, basePath: String, ids: Seq[Long]): Unit =
    graft.runtime.PointerFile.commit(fs(spark, basePath),
      new Path(s"$basePath/_MANIFEST"), new Path(s"$basePath/_MANIFEST.tmp"),
      ids.sorted.mkString(","))

  private def markerDirs(spark: SparkSession, basePath: String): Seq[Path] = {
    val f = fs(spark, basePath)
    val base = new Path(basePath)
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_batch="))
      .filter(st => f.exists(new Path(st.getPath, Marker)))
      .map(_.getPath)
  }

  private def committedDirs(spark: SparkSession, basePath: String): Seq[Path] =
    manifestIds(spark, basePath) match {
      case Some(ids) => ids.map(id => new Path(s"$basePath/_batch=$id"))
      case None => markerDirs(spark, basePath)
    }

  /** Ids of the committed batches at `basePath` (sorted ascending) — the
    * manifest when the table has one, the marker listing otherwise.
    */
  def committedIds(spark: SparkSession, basePath: String): Seq[Long] =
    manifestIds(spark, basePath).getOrElse(
      markerDirs(spark, basePath)
        .flatMap(p => scala.util.Try(p.getName.stripPrefix("_batch=").toLong).toOption)
        .sorted)

  /** Append `df` as one atomically-visible batch; returns the committed
    * batch id, or None when `batchId` was already committed (replay).
    * On a manifest table the marker commit is followed by the manifest
    * flip; a crash between the two replays to a heal — the marker proves
    * this id's content landed whole, so the replay only finishes the
    * visibility flip (replay presents identical rows by contract).
    */
  def append(df: DataFrame, basePath: String, partitionBy: Seq[String] = Nil,
      batchId: Option[Long] = None): Option[Long] = {
    val spark = df.sparkSession
    val f = fs(spark, basePath)
    val manifest = manifestIds(spark, basePath)
    val live = manifest.getOrElse(committedIds(spark, basePath))
    val id = batchId.getOrElse(live.lastOption.map(_ + 1).getOrElse(0L))
    val dir = new Path(s"$basePath/_batch=$id")
    val marker = new Path(dir, Marker)
    if (f.exists(marker) && live.contains(id)) return None // replay: fully committed
    if (!f.exists(marker)) {
      val writer = df.write.mode("overwrite") // overwrite own dir = replay-safe mid-batch
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
        .parquet(dir.toString)
      f.create(marker, true).close()
    }
    // manifest tables: the flip IS the visibility commit. Also the heal
    // path for a replay that finds its own marker but no manifest entry.
    manifest.foreach(ids => if (!ids.contains(id)) commitManifest(spark, basePath, ids :+ id))
    Some(id)
  }

  /** Fold all committed batches into ONE batch directory, atomically:
    * write the folded copy (unmarked, invisible), flip the `_MANIFEST`
    * pointer to exactly the new id, then marker the new dir. A reader at
    * ANY instant sees either the old batch set or the folded one, never
    * both and never a prefix; a crash at any step leaves the old state
    * live and the retry overwrites the debris (the folded id is derived
    * from the live set, which a failed attempt never changed). The
    * replaced directories stay on disk for in-flight readers until
    * [[vacuum]]. Returns the folded batch id, or None when the table has
    * fewer than `minBatches` live batches (nothing touched). Single
    * maintainer per table, like every commit protocol in the engine.
    */
  def compact(spark: SparkSession, basePath: String, partitionBy: Seq[String] = Nil,
      minBatches: Int = 2): Option[Long] = {
    val live = committedIds(spark, basePath)
    if (live.size < minBatches) return None
    val f = fs(spark, basePath)
    val folded = live.max + 1
    val dir = new Path(s"$basePath/_batch=$folded")
    val writer = spark.read
      .parquet(live.map(id => s"$basePath/_batch=$id"): _*)
      .write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dir.toString)
    commitManifest(spark, basePath, Seq(folded)) // THE atomic visibility flip
    f.create(new Path(dir, Marker), true).close()
    Some(folded)
  }

  /** Delete batch directories no longer in the manifest (replaced by a
    * [[compact]], or debris from a crashed append/compact attempt that
    * never became visible). Manifest tables only — a marker-protocol
    * table has no replaced dirs to clean. As with
    * [[Snapshots.vacuum]], a reader that resolved the manifest BEFORE a
    * flip may still be scanning a replaced dir; run vacuum on a
    * maintenance cadence that outlives query runtimes. Returns the
    * deleted ids.
    */
  def vacuum(spark: SparkSession, basePath: String): Seq[Long] =
    manifestIds(spark, basePath).fold(Seq.empty[Long]) { ids =>
      val f = fs(spark, basePath)
      val base = new Path(basePath)
      if (!f.exists(base)) return Seq.empty
      val dead = f.listStatus(base).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("_batch="))
        .flatMap(st =>
          scala.util.Try(st.getPath.getName.stripPrefix("_batch=").toLong).toOption)
        .filterNot(ids.contains)
      dead.foreach(id => f.delete(new Path(s"$basePath/_batch=$id"), true))
      dead.sorted
    }

  /** Everything committed so far — never a torn batch. None when no batch
    * has ever committed (distinguishes "empty table" from "no table").
    */
  def readIfExists(spark: SparkSession, basePath: String): Option[DataFrame] = {
    val dirs = committedDirs(spark, basePath)
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.map(_.toString): _*))
  }

  /** [[readIfExists]] that fails actionably on a never-written table. */
  def read(spark: SparkSession, basePath: String): DataFrame =
    readIfExists(spark, basePath).getOrElse(
      throw new IllegalArgumentException(s"no committed batches under $basePath"))
}
