package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Exactly-once parquet sink for foreachBatch.
  *
  * A plain `mode("append")` inside foreachBatch is at-least-once: if the
  * job dies after the write but before the checkpoint commit, the batch
  * replays and duplicates. The reference papers over this with Postgres
  * `ON CONFLICT` / existence checks (`main.py:137-143`); the general fix
  * is to make the sink idempotent per epoch: each batch writes under a
  * `_batch=<id>` subdirectory and commits a marker file; a replayed batch
  * sees the marker and skips. Readers glob the parent, so layout is
  * transparent.
  */
object IdempotentSink {

  /** Returns true if written, false if the batch was already committed. */
  def writeBatch(
      df: DataFrame, basePath: String, batchId: Long,
      partitionBy: Seq[String] = Nil): Boolean = {
    val dir = Paths.get(basePath, s"_batch=$batchId")
    val marker = dir.resolve("_COMMITTED")
    if (Files.exists(marker)) false
    else {
      val writer = df.write.mode("overwrite") // overwrite = replay-safe mid-batch
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
        .parquet(dir.toString)
      Files.createFile(marker)
      true
    }
  }

  /** Read everything committed so far (skips half-written batches). */
  def read(spark: org.apache.spark.sql.SparkSession, basePath: String): DataFrame = {
    val committed = Option(new java.io.File(basePath).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && Files.exists(f.toPath.resolve("_COMMITTED")))
      .map(_.getPath)
    require(committed.nonEmpty, s"no committed batches under $basePath")
    spark.read.parquet(committed: _*)
  }
}
