package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ingest.Debezium

/** CDC stream → bronze (`spark/app/streaming_job.py:63-115`), S1/S7/S8/S9
  * re-expressed on Spark's file streaming source (SURVEY §7.0: no Kafka
  * jars in this environment; the Debezium JSON envelope and every
  * downstream operator are identical — the connector is the only swap).
  *
  * Exactly-once-ish semantics match the reference: checkpointed source
  * offsets + append-mode partitioned parquet sink inside foreachBatch.
  */
object BronzeStream {

  /** One JSON envelope per line, one column named like the Kafka value
    * projection (P1: `CAST(value AS STRING) AS json_string`).
    */
  val rawSchema: StructType = StructType(Seq(StructField("json_string", StringType)))

  def readEnvelopes(spark: SparkSession, inputDir: String, maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger) // S2's offset-pacing analog
      .text(inputDir)
      .withColumnRenamed("value", "json_string")

  /** Streaming-native ingest dedup: drops re-deliveries of the same
    * business key (`trans_num`) with state bounded by the event-time
    * watermark — unlike a bare `dropDuplicates`, whose state grows with
    * every key ever seen, this forgets keys older than the watermark, so
    * state is O(keys per watermark window) at any corpus size. Turns the
    * at-least-once replay producer ([[Replay]]) into exactly-once rows
    * at the sink without the batch-side anti-join.
    */
  def dedupWithinWatermark(parsed: DataFrame, watermark: String = "1 hour"): DataFrame =
    parsed
      .withWatermark("trans_timestamp", watermark)
      .dropDuplicatesWithinWatermark("trans_num")

  /** Start the bronze ingest query: parse → derive → foreachBatch append
    * partitioned by y/m/d with a processing-time trigger.
    */
  def start(
      spark: SparkSession,
      inputDir: String,
      bronzePath: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    val parsed = Debezium.withBronzeColumns(Debezium.parse(readEnvelopes(spark, inputDir)))
    parsed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").partitionBy("year", "month", "day").parquet(bronzePath)
      }
      .start()
  }
}
