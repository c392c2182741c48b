package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exactly-once parquet sink for foreachBatch.
  *
  * A plain `mode("append")` inside foreachBatch is at-least-once: if the
  * job dies after the write but before the checkpoint commit, the batch
  * replays and duplicates. The reference papers over this with Postgres
  * `ON CONFLICT` / existence checks (`main.py:137-143`); the general fix
  * is to make the sink idempotent per epoch: each batch writes under a
  * `_batch=<id>` subdirectory and commits a marker file; a replayed batch
  * sees the marker and skips.
  *
  * The layout and protocol are [[graft.layers.AtomicAppend]]'s (the
  * streaming caller delegates to it): same atomic reader visibility,
  * and — since round 13 — the same Hadoop-FS path resolution, so s3a://
  * and hdfs:// sink paths work, not just local files.
  */
object IdempotentSink {

  /** Returns true if written, false if the batch was already committed. */
  def writeBatch(
      df: DataFrame, basePath: String, batchId: Long,
      partitionBy: Seq[String] = Nil): Boolean =
    graft.layers.AtomicAppend.append(df, basePath, partitionBy, Some(batchId)).nonEmpty

  /** Read everything committed so far (skips half-written batches). */
  def read(spark: org.apache.spark.sql.SparkSession, basePath: String): DataFrame =
    graft.layers.AtomicAppend.read(spark, basePath)
}
