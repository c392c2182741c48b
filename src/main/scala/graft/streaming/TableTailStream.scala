package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.layers.AtomicAppend

/** Stream FROM a batch table — the role of reading a Delta table as a
  * streaming source: a standing consumer follows an [[AtomicAppend]]
  * table's COMMIT LOG and delivers each new version window exactly as
  * the batch feeds would ([[AtomicAppend.changesBetween]] insert-only by
  * default, [[AtomicAppend.changeFeed]] row-level under `rowLevel`), so
  * folds cross silently, late batches arrive whole (consumption keys on
  * batch identity, never an event-time high-water mark), and a commit
  * kind the chosen feed cannot represent FAILS the query actionably
  * instead of delivering wrong rows.
  *
  * Spark-first plumbing, zero private APIs: the micro-batch CLOCK is the
  * built-in rate source (its rows are discarded — Structured Streaming
  * provides the trigger cadence, checkpointed restart, and lifecycle),
  * while PROGRESS is the consumer's own `LASTv` pointer next to the
  * sink — the same discipline as every sidecar in the engine, and the
  * reason delivery is effectively-once: the pointer advances only AFTER
  * `f` returns, so a crash between the two replays the SAME window
  * (commit-log windows are deterministic), and an idempotent `f` (keyed
  * on `toVersion`, like [[graft.layers.IncrementalView]]'s versioned
  * commits) converges. At 100 TB each poll costs one O(1) pointer read
  * when idle and O(changes) when not — never O(table).
  */
object TableTailStream {

  private def pointerPaths(dir: String) =
    (new Path(s"$dir/LASTv"), new Path(s"$dir/LASTv.tmp"))

  /** The consumer's last fully-processed table version (−1 = nothing
    * yet: the next window replays from the table's creation).
    */
  def lastApplied(spark: SparkSession, pointerDir: String): Long = {
    val (p, tmp) = pointerPaths(pointerDir)
    graft.runtime.PointerFile.read(
      p.getFileSystem(spark.sessionState.newHadoopConf()), p, tmp)
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .getOrElse(-1L)
  }

  private def commitPointer(spark: SparkSession, pointerDir: String, v: Long): Unit = {
    val (p, tmp) = pointerPaths(pointerDir)
    graft.runtime.PointerFile.commit(
      p.getFileSystem(spark.sessionState.newHadoopConf()), p, tmp, v.toString)
  }

  /** One poll step — the testable core `start` ticks: deliver the
    * window `(lastApplied, latest]` to `f` and advance the pointer.
    * Returns the versions applied this step (None when idle). `f`
    * receives (the window's rows, fromVersion, toVersion).
    */
  def pollOnce(spark: SparkSession, tablePath: String, pointerDir: String,
      rowLevel: Boolean = false)(f: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val from = lastApplied(spark, pointerDir)
    val latest = AtomicAppend.versions(spark, tablePath).lastOption.getOrElse(-1L)
    if (latest <= from) return None // idle: one listing, no scan
    val window =
      if (rowLevel) AtomicAppend.changeFeed(spark, tablePath, from, latest)
      else if (from < 0L)
        // insert-only bootstrap: the table AS OF the window's end is the
        // accumulated inserts — pinned to `latest`, not read(), so a
        // concurrent commit between the listing and the scan cannot
        // deliver rows this window AND re-deliver them in the next
        AtomicAppend.readAsOf(spark, tablePath, latest)
      else AtomicAppend.changesBetween(spark, tablePath, from, latest)
    f(window, from, latest)
    commitPointer(spark, pointerDir, latest) // AFTER f: crash replays the window
    Some((from, latest))
  }

  /** The standing stream: poll the table every `trigger` interval and
    * feed each new version window to `f`. Returns the query; stop it
    * like any Structured Streaming query. `checkpointDir` carries both
    * Spark's clock checkpoint and the consumer's version pointer, so a
    * restart with the same directory resumes exactly where the last
    * fully-processed window ended.
    */
  def start(spark: SparkSession, tablePath: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(1000L),
      rowLevel: Boolean = false)(f: (DataFrame, Long, Long) => Unit): StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", 1L).load()
      .writeStream
      .option("checkpointLocation", s"$checkpointDir/clock")
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, _: Long) =>
        pollOnce(spark, tablePath, s"$checkpointDir/tail", rowLevel)(f)
        ()
      }
      .start()
}
