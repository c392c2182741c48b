package graft.scoring

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** ML-model scoring into the same `fraud_predictions` shape as
  * [[RuleModel.predict]] — the in-engine equivalent of the reference's
  * FastAPI inference leg (`services/fraud-detection-api/app/main.py:386-414`):
  * model probability → fraud flag + risk ladder.
  *
  * Scoring is `PipelineModel.transform` (distributed, no driver round-trip)
  * instead of the reference's per-row HTTP POST from a `collect()` loop
  * (`realtime_prediction_job.py:314-345`), so throughput scales with
  * executors.
  */
object MlModel {

  /** Score a silver-shaped frame (must carry [[graft.ml.FraudMl.featureCols]])
    * with a trained pipeline. `prediction_score` is the class-1 probability
    * rounded to 4 decimals (the `NUMERIC(5,4)` contract of
    * `database/init_postgres.sql:73`); the risk ladder runs on the raw
    * probability as the API does (`main.py:409-414`).
    */
  def predict(silver: DataFrame, model: PipelineModel, modelVersion: String): DataFrame = {
    val prob1 = vector_to_array(F.col("probability")).getItem(1)
    model.transform(silver).select(
      F.col("trans_num"),
      F.round(prob1, 4).as("prediction_score"),
      F.col("prediction").cast("int").as("is_fraud_predicted"),
      RuleModel.riskLevel(prob1).as("risk_level"),
      F.lit(modelVersion).as("model_version"),
      F.current_timestamp().as("prediction_time"))
  }
}
