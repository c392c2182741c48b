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
  * Batch-dir fragmentation across many appends is the same compaction
  * story as any append table ([[Merge.compactPartitions]]).
  */
object AtomicAppend {

  private val Marker = "_COMMITTED"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def committedDirs(spark: SparkSession, basePath: String): Seq[Path] = {
    val f = fs(spark, basePath)
    val base = new Path(basePath)
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_batch="))
      .filter(st => f.exists(new Path(st.getPath, Marker)))
      .map(_.getPath)
  }

  /** Ids of the committed batches at `basePath` (sorted ascending). */
  def committedIds(spark: SparkSession, basePath: String): Seq[Long] =
    committedDirs(spark, basePath)
      .flatMap(p => scala.util.Try(p.getName.stripPrefix("_batch=").toLong).toOption)
      .sorted

  /** Append `df` as one atomically-visible batch; returns the committed
    * batch id, or None when `batchId` was already committed (replay).
    */
  def append(df: DataFrame, basePath: String, partitionBy: Seq[String] = Nil,
      batchId: Option[Long] = None): Option[Long] = {
    val spark = df.sparkSession
    val f = fs(spark, basePath)
    val id = batchId.getOrElse(committedIds(spark, basePath).lastOption.map(_ + 1).getOrElse(0L))
    val dir = new Path(s"$basePath/_batch=$id")
    val marker = new Path(dir, Marker)
    if (f.exists(marker)) return None // replayed batch: already committed
    val writer = df.write.mode("overwrite") // overwrite own dir = replay-safe mid-batch
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dir.toString)
    f.create(marker, true).close()
    Some(id)
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
