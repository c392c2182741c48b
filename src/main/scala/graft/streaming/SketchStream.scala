package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{functions => F}

import graft.operators.Sketches

/** Standing distinct-count service: a stream folds per-batch HLL
  * sketches into an additive store; ANY grain is answered at read time
  * by unioning stored binaries — never by rescanning events.
  *
  * The store is `batch=<id>` parquet partitions of
  * (keyCols…, sketch, approx_distinct) rows, written by DYNAMIC
  * partition overwrite: a replayed micro-batch rewrites ITS OWN
  * partition with identical rows, so the store converges under crash
  * replay with no read-modify-write (the same epoch discipline as
  * [[CorpusIngestStream]] / [[graft.operators.NearDupIndex.append]] —
  * per-write `partitionOverwriteMode` is honored here because the store
  * is path-based, not a catalog `insertInto`).
  *
  * Per-trigger cost is sized by the micro-batch (one partial-aggregated
  * pass to ≤ |groups| sketch rows). Read cost is sized by
  * batches × groups sketch ROWS (~2^lgK bytes each), independent of the
  * event count — the whole point of storing re-aggregable summaries.
  * A long-running stream bounds the partition count the same way the
  * indexes do: fold cold batch partitions into one with [[compact]].
  */
object SketchStream {

  /** Fold one micro-batch into the store — exposed for crash-replay
    * specs; [[start]] wires it into foreachBatch. Deterministic per
    * (batch rows, batchId): replaying overwrites `batch=<batchId>` with
    * the same rows.
    */
  def fold(batch: DataFrame, batchId: Long, tableDir: String,
      keyCols: Seq[String], valueCol: String, lgK: Int): Unit =
    Sketches.distinctSketchRollup(batch, keyCols, valueCol, lgK)
      .withColumn("batch", F.lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch")
      .parquet(tableDir)

  def start(
      spark: SparkSession,
      inPath: String,
      schema: org.apache.spark.sql.types.StructType,
      tableDir: String,
      checkpointDir: String,
      keyCols: Seq[String],
      valueCol: String,
      lgK: Int = 12,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(inPath)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        fold(batch, id, tableDir, keyCols, valueCol, lgK)
      }
      .start()

  /** Distinct-count estimates at any grain (`grainKeys` ⊆ the stored
    * keyCols; Nil = global) from the stored binaries alone.
    */
  def read(spark: SparkSession, tableDir: String, grainKeys: Seq[String]): DataFrame =
    Sketches.mergeToGrain(
      spark.read.parquet(tableDir).drop("batch", "approx_distinct"), grainKeys)
}
