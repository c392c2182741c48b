package graft.scoring

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.Debezium
import graft.ml.ModelRegistry
import graft.streaming.ScoringStream

/** Single-transaction, low-latency scoring — the engine analog of the
  * reference's `POST /predict/raw`
  * (`services/fraud-detection-api/app/main.py:386-414`), which scores ONE
  * raw transaction synchronously. The engine's standing scoring leg is
  * micro-batch ([[graft.streaming.ScoringStream]], 10 s trigger); this
  * entry point serves the "score this transaction NOW" case without a
  * streaming query.
  *
  * Identical semantics by construction: the row runs through the SAME
  * kernel as the streaming path ([[ScoringStream.scoreBatch]] — Debezium
  * parse → silver features → Production model or rule fallback), so a
  * prediction served here equals what the stream would emit for the same
  * envelope (PredictorSpec asserts this field-for-field).
  *
  * Latency: the 1-row plan is narrow operators on one local partition —
  * no shuffle, no per-row HTTP round-trip (the reference pays Spark →
  * HTTP → FastAPI → Postgres per row). The first call pays planning +
  * codegen (~1 s); steady-state calls are interactive (PredictorSpec
  * measures and reports the median). Construct ONE Predictor per process
  * and reuse it — the registry/model load happens once, at construction.
  */
final class Predictor(spark: SparkSession, model: Option[(PipelineModel, String)]) {

  /** Score one Debezium envelope line (the CDC wire format). Returns
    * None for a tombstone (`{"after": null}` — nothing to score).
    */
  def predictEnvelope(json: String): Option[Predictor.Prediction] = {
    import spark.implicits._
    predictParsed(Debezium.parse(Seq(json).toDF("json_string")))
  }

  /** Score an already-parsed (Debezium-shaped) frame and return the first
    * prediction; the collect is the serving boundary, one row by contract.
    */
  def predictParsed(parsed: DataFrame): Option[Predictor.Prediction] =
    ScoringStream.scoreBatch(parsed, existing = None, model)
      .collect().headOption.map { r =>
        Predictor.Prediction(
          r.getAs[String]("trans_num"),
          r.getAs[Double]("prediction_score"),
          r.getAs[Int]("is_fraud_predicted"),
          r.getAs[String]("risk_level"),
          r.getAs[String]("model_version"))
      }
}

object Predictor {

  /** One served prediction — the `fraud_predictions` row minus the
    * write-time timestamp.
    */
  final case class Prediction(
      transNum: String,
      predictionScore: Double,
      isFraudPredicted: Int,
      riskLevel: String,
      modelVersion: String)

  /** The reference topology: current Production model from the registry,
    * rule-model fallback when nothing has been promoted yet
    * (`main.py:386-393` + the rule path at `main.py:603-621`).
    */
  def fromRegistry(spark: SparkSession, modelRoot: String,
      modelName: String = "fraud_detection_rf"): Predictor =
    new Predictor(spark, ModelRegistry.loadProduction(spark, modelRoot, modelName))

  /** Rule-model-only predictor (no artifact needed). */
  def ruleOnly(spark: SparkSession): Predictor = new Predictor(spark, None)
}
