package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Checkpointed, time-scaled source replay — the engine-side analog of the
  * reference's data producer (`services/data-producer/producer.py:39-135`):
  * replay an ordered historical dataset into a streaming landing directory
  * at a scaled pace, recording progress in a checkpoint so a restart
  * resumes exactly where it stopped (the reference keeps the same state in
  * its Postgres `producer_checkpoint` table,
  * `database/init_postgres.sql:108-119`).
  *
  * Each batch lands as new JSON part-files in `outDir`, which is exactly
  * what [[BronzeStream.readEnvelopes]]'s file-stream source tails — so
  * this tool + the bronze/scoring streams reproduce the reference's
  * producer → CDC → stream topology in-process.
  *
  * Scale posture: a replay producer is inherently sequential (it SIMULATES
  * an ordered upstream at a chosen pace), so the global ordering window
  * here is single-partition BY DESIGN and throughput is bounded by the
  * chosen pace, never by this operator. The checkpoint I/O goes through
  * the Hadoop FileSystem of the path's scheme (object-store safe, like
  * [[graft.layers.Hwm.readIfExists]]).
  */
object Replay {

  /** Read the last-replayed row index from the checkpoint (-1 = nothing
    * replayed yet).
    */
  def readCheckpoint(spark: SparkSession, ckptPath: String): Long = {
    val p = new Path(ckptPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  private def writeCheckpoint(spark: SparkSession, ckptPath: String, idx: Long): Unit = {
    val p = new Path(ckptPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(idx.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Replay `source` (ordered by `tsCol`, ties broken by `idCol` for a
    * deterministic order) into `outDir` as JSON batches of `batchRows`.
    *
    * Pacing: after each batch, sleep the batch's own event-time span ×
    * `timeScale` (the reference sleeps Δt × 0.001 between rows,
    * `producer.py:21,129-133`; batching amortizes it). `timeScale = 0`
    * replays as fast as the sink accepts — the test setting.
    *
    * Stops after `maxBatches` (resume later) or when the source is
    * exhausted. Returns the number of rows replayed in THIS run.
    */
  def run(
      source: DataFrame,
      tsCol: String,
      idCol: String,
      outDir: String,
      ckptPath: String,
      batchRows: Int = 1000,
      timeScale: Double = 0.0,
      maxBatches: Int = Int.MaxValue): Long = {
    val spark = source.sparkSession
    // the indexed ordering is STAGED once per checkpoint lineage, not
    // recomputed per batch: the per-batch `__idx` filters below would
    // otherwise re-run the ordering window for EVERY batch (batches ×
    // corpus sorts), and a resume in a fresh JVM would re-derive the
    // order from a source that may have changed under it — the staged
    // copy makes the replay order a durable fact, like the reference's
    // producer reading one fixed CSV. _SUCCESS guards a crash mid-stage
    // (the overwrite rewrites the directory whole). Delete the staging
    // dir with the checkpoint to re-stage a new source.
    val stagedPath = s"$ckptPath.staged"
    val staged = new Path(stagedPath)
    val fs = staged.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(stagedPath, "_SUCCESS")))
      source.withColumn("__idx",
        F.row_number().over(Window.orderBy(F.col(tsCol), F.col(idCol))).cast("long") - 1)
        .write.mode("overwrite").parquet(stagedPath)
    val ordered = spark.read.parquet(stagedPath)

    val total = ordered.count()
    var next = readCheckpoint(spark, ckptPath) + 1
    var batches = 0
    var replayed = 0L
    while (next < total && batches < maxBatches) {
      val hi = math.min(next + batchRows, total)
      val batch = ordered.filter(F.col("__idx") >= next && F.col("__idx") < hi)
      batch.drop("__idx").write.mode("append").json(outDir)
      if (timeScale > 0) {
        val span = batch.agg(
          (F.unix_timestamp(F.max(tsCol)) - F.unix_timestamp(F.min(tsCol))).as("s"))
          .head().getLong(0)
        Thread.sleep(math.max(0L, (span * 1000 * timeScale).toLong))
      }
      // checkpoint AFTER the batch is durably written: a crash between
      // write and checkpoint replays one batch (at-least-once, like the
      // reference's row-level checkpoint), which the scoring stream's
      // anti-join sink already dedups
      writeCheckpoint(spark, ckptPath, hi - 1)
      replayed += hi - next
      next = hi
      batches += 1
    }
    replayed
  }
}
