package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** The rule-based fraud scorer — the one scoring path with no ML artifact
  * (`services/fraud-detection-api/app/main.py:603-621`), plus the
  * risk-level ladder (`main.py:409-414`). Pure Column expressions, so the
  * same scorer runs identically in batch, streaming foreachBatch, and
  * interactive SQL.
  */
object RuleModel {

  /** Additive risk score: amt>500→+0.3, dist>100→+0.25, late-night→+0.15,
    * distant→+0.2, weekend→+0.1; fraud iff score > 0.5.
    */
  def score(
      amt: Column,
      distanceKm: Column,
      isLateNight: Column,
      isDistant: Column,
      isWeekend: Column): Column =
    F.round(
      F.when(amt > 500, 0.3).otherwise(0.0) +
        F.when(distanceKm > 100, 0.25).otherwise(0.0) +
        F.when(isLateNight === 1, 0.15).otherwise(0.0) +
        F.when(isDistant === 1, 0.2).otherwise(0.0) +
        F.when(isWeekend === 1, 0.1).otherwise(0.0),
      2)

  def isFraudPredicted(score: Column): Column = (score > 0.5).cast("int")

  /** prob>0.7→HIGH, >0.4→MEDIUM, else LOW. */
  def riskLevel(score: Column): Column =
    F.when(score > 0.7, "HIGH").when(score > 0.4, "MEDIUM").otherwise("LOW")

  /** Score a silver-shaped frame (needs amt, distance_km, is_late_night,
    * is_distant_transaction, is_weekend) into the fraud_predictions shape
    * (`database/init_postgres.sql:69-77`).
    */
  def predict(silver: DataFrame, modelVersion: String = "rule-v1"): DataFrame = {
    val s = score(F.col("amt"), F.col("distance_km"), F.col("is_late_night"),
      F.col("is_distant_transaction"), F.col("is_weekend"))
    silver.select(
      F.col("trans_num"),
      s.as("prediction_score"),
      isFraudPredicted(s).as("is_fraud_predicted"),
      riskLevel(s).as("risk_level"),
      F.lit(modelVersion).as("model_version"),
      F.current_timestamp().as("prediction_time"))
  }

  /** Idempotent sink: drop predictions whose trans_num already exists —
    * the reference's Postgres existence check
    * (`realtime_prediction_job.py:227-236`) as a left-anti join.
    */
  def newPredictionsOnly(preds: DataFrame, existing: Option[DataFrame]): DataFrame =
    existing match {
      case Some(ex) => preds.join(ex.select("trans_num"), Seq("trans_num"), "left_anti")
      case None => preds
    }
}
