package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{functions => F}

import org.apache.spark.ml.PipelineModel

import graft.ingest.Debezium
import graft.layers.{Hwm, Silver}
import graft.ml.ModelRegistry
import graft.scoring.{MlModel, RuleModel}

/** Real-time scoring loop (`spark/app/realtime_prediction_job.py`),
  * collapsed from the reference's 4-process round-trip (Spark → HTTP →
  * FastAPI → Postgres) into one in-process pipeline (SURVEY §3.4):
  * parse → silver features → rule score → idempotent predictions sink +
  * alert log, all inside foreachBatch.
  *
  * No `collect()`: the reference iterates rows on the driver
  * (`realtime_prediction_job.py:314`); here scoring is a Column expression
  * and the dedup check is a distributed left-anti join, so the path scales
  * with executors.
  */
object ScoringStream {

  /** Batch-side scoring kernel, also used by the streaming query.
    * Scores with the registered ML model when one is supplied (the
    * reference's Production-model path), otherwise with the rule model
    * (its no-artifact fallback). Returns only predictions for trans_nums
    * not yet present.
    */
  def scoreBatch(
      batch: DataFrame,
      existing: Option[DataFrame],
      model: Option[(PipelineModel, String)] = None): DataFrame = {
    val silver = graft.functions.FraudFeatures.withFeatures(
      Silver.filled(Silver.typed(batch)))
    // crude late-data guard, as the reference does (year 2019-2025 filter,
    // realtime_prediction_job.py:293-295)
    val bounded = silver.filter(F.year(F.col("trans_timestamp")).between(2019, 2030))
    val preds = model match {
      case Some((m, version)) => MlModel.predict(bounded, m, version)
      case None => RuleModel.predict(bounded)
    }
    RuleModel.newPredictionsOnly(preds, existing)
  }

  def start(
      spark: SparkSession,
      inputDir: String,
      predictionsPath: String,
      alertsPath: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      model: Option[(PipelineModel, String)] = None): StreamingQuery = {
    val parsed = Debezium.parse(BronzeStream.readEnvelopes(spark, inputDir))
    parsed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val existing = Hwm.readIfExists(spark, predictionsPath)
        val preds = scoreBatch(batch, existing, model).cache()
        // the Slack-alert leg (`realtime_prediction_job.py:115-209`)
        // becomes an alert-log table of the would-be notifications.
        // Alerts go FIRST: once the predictions land, a replayed batch is
        // emptied by the trans_num anti-join, so an alert that hadn't
        // been written yet would be lost forever. The alert leg dedups
        // with its OWN trans_num anti-join (same pattern as the
        // predictions sink), so a crash between the two writes replays to
        // exactly one alert per transaction — not the at-least-once
        // re-emit a blind append would give. A batch-keyed overwrite
        // would NOT work here: a replay after a partial predictions write
        // recomputes only the remainder, and overwriting the batch
        // partition with remainder-only alerts would drop alerts already
        // earned by the committed prefix.
        val alerts = preds.filter(F.col("is_fraud_predicted") === 1)
          .select("trans_num", "prediction_score", "risk_level", "prediction_time")
        RuleModel.newPredictionsOnly(alerts, Hwm.readIfExists(spark, alertsPath))
          .write.mode("append").parquet(alertsPath)
        preds.write.mode("append").parquet(predictionsPath)
        preds.unpersist()
        ()
      }
      .start()
  }

  /** The reference's realtime topology: load the current Production model
    * from the registry at stream start (`realtime_prediction_job.py:414-436`
    * + the API's MLflow load, `main.py:386-393`) and score with it, falling
    * back to the rule model when nothing has been promoted yet.
    */
  def startWithRegistry(
      spark: SparkSession,
      inputDir: String,
      predictionsPath: String,
      alertsPath: String,
      checkpointDir: String,
      modelRoot: String,
      modelName: String = "fraud_detection_rf",
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    start(spark, inputDir, predictionsPath, alertsPath, checkpointDir, trigger,
      model = ModelRegistry.loadProduction(spark, modelRoot, modelName))
}
