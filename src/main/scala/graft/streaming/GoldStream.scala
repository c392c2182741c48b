package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.layers.{Gold, Hwm}

/** Silver → gold as a STREAMING read — the principled replacement for the
  * reference's every-5-minutes full-rescan DAG + manual high-water-mark
  * (`airflow/dags/lakehouse_pipeline_taskflow.py:30-39`,
  * `gold_job.py:51-63`): Spark's file-stream source tracks processed
  * files in the checkpoint, so each micro-batch sees exactly the new
  * silver files — no rescans, no HWM bookkeeping, no late-row misses
  * when timestamps arrive out of order (the HWM pattern silently drops
  * rows older than max(ts); file tracking does not).
  *
  * Inside foreachBatch the star schema is built per batch with
  * cross-run dim dedup (left-anti against the existing dims).
  */
object GoldStream {

  def start(
      spark: SparkSession,
      silverPath: String,
      goldDir: String,
      checkpointDir: String,
      silverSchema: org.apache.spark.sql.types.StructType,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {

    spark.readStream
      .schema(silverSchema)
      .parquet(silverPath)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val existing = (t: String) => Hwm.readIfExists(spark, s"$goldDir/$t")
        Gold.build(batch, existing, dedupAgainstExisting = true).foreach {
          case (name, df) =>
            df.write.mode("append").parquet(s"$goldDir/$name")
        }
      }
      .start()
  }
}
