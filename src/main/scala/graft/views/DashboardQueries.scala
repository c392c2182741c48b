package graft.views

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ~18 dashboard chart queries (`sql/dashboard_charts.sql:1-177`)
  * re-expressed as Spark SQL over the registered gold tables (plus
  * `fraud_predictions` for the model-performance charts). Same shapes:
  * overview metrics, trend rollups, CASE-bucketed group-bys, top-k,
  * percentage fraud rates, the 2³ multi-factor risk grid, and the
  * severity-laddered alert list.
  */
object DashboardQueries {

  private val frauds = "SUM(CASE WHEN is_fraud = 1 THEN 1 ELSE 0 END)"
  private val rate = s"CAST($frauds AS DOUBLE) / COUNT(*) * 100"

  val all: Map[String, String] = Map(
    "c1_1_overview" ->
      """SELECT COUNT(*) AS total_transactions, SUM(transaction_amount) AS total_amount,
         AVG(transaction_amount) AS avg_amount FROM fact_transactions""",
    "c1_2_overall_fraud_rate" ->
      s"""SELECT COUNT(*) AS total, $frauds AS frauds, $rate AS fraud_rate
          FROM fact_transactions""",
    "c1_3_high_risk" ->
      """SELECT COUNT(*) AS high_risk_count, SUM(transaction_amount) AS high_risk_amount
         FROM fact_transactions
         WHERE is_high_amount = 1 AND is_distant_transaction = 1""",
    "c2_1_fraud_by_hour" ->
      s"""SELECT transaction_hour AS hour, COUNT(*) AS total, $frauds AS frauds,
          $rate AS fraud_rate
          FROM fact_transactions GROUP BY transaction_hour ORDER BY transaction_hour""",
    "c2_2_monthly_trend" ->
      s"""SELECT year(transaction_timestamp) AS year, month(transaction_timestamp) AS month,
          COUNT(*) AS total, $frauds AS frauds, $rate AS fraud_rate
          FROM fact_transactions GROUP BY 1, 2 ORDER BY year, month""",
    "c3_1_fraud_by_state" ->
      s"""SELECT c.customer_state AS state, COUNT(*) AS total, $frauds AS frauds,
          $rate AS fraud_rate
          FROM fact_transactions f JOIN dim_customer c ON f.customer_key = c.customer_key
          GROUP BY c.customer_state ORDER BY frauds DESC LIMIT 20""",
    "c3_2_fraud_by_distance" ->
      s"""SELECT CASE WHEN distance_km < 10 THEN '0-10km'
                     WHEN distance_km < 50 THEN '10-50km'
                     WHEN distance_km < 100 THEN '50-100km'
                     WHEN distance_km < 500 THEN '100-500km'
                     ELSE '500km+' END AS distance_range,
          COUNT(*) AS total, $frauds AS frauds, $rate AS fraud_rate
          FROM fact_transactions WHERE distance_km >= 0
          GROUP BY 1 ORDER BY distance_range""",
    "c4_1_risky_merchants" ->
      s"""SELECT merchant, transaction_category, COUNT(*) AS total, $frauds AS frauds,
          $rate AS fraud_rate
          FROM fact_transactions GROUP BY merchant, transaction_category
          HAVING COUNT(*) > 10 ORDER BY fraud_rate DESC, merchant LIMIT 20""",
    "c4_2_fraud_by_category" ->
      s"""SELECT transaction_category, COUNT(*) AS total, $frauds AS frauds,
          $rate AS fraud_rate
          FROM fact_transactions GROUP BY transaction_category ORDER BY fraud_rate DESC""",
    "c5_1_fraud_by_amount_bin" ->
      s"""SELECT CASE amount_bin WHEN 1 THEN 'bin1' WHEN 2 THEN 'bin2' WHEN 3 THEN 'bin3'
                 WHEN 4 THEN 'bin4' ELSE 'bin5' END AS amount_range,
          COUNT(*) AS total, $frauds AS frauds, $rate AS fraud_rate
          FROM fact_transactions GROUP BY amount_bin ORDER BY amount_bin""",
    "c5_2_high_value" ->
      """SELECT transaction_key, transaction_timestamp, transaction_amount, merchant, is_fraud
         FROM fact_transactions WHERE transaction_amount > 1000
         ORDER BY transaction_amount DESC LIMIT 50""",
    "c6_1_weekend_vs_weekday" ->
      s"""SELECT CASE WHEN is_weekend_transaction = 1 THEN 'Weekend' ELSE 'Weekday' END AS day_type,
          COUNT(*) AS total, $frauds AS frauds, $rate AS fraud_rate
          FROM fact_transactions GROUP BY is_weekend_transaction""",
    "c6_2_late_night" ->
      s"""SELECT transaction_hour, COUNT(*) AS total, $frauds AS frauds, $rate AS fraud_rate
          FROM fact_transactions WHERE is_late_night = 1
          GROUP BY transaction_hour ORDER BY transaction_hour""",
    "c7_1_fraud_by_age_group" ->
      s"""SELECT CASE WHEN customer_age_at_transaction < 25 THEN '18-24'
                     WHEN customer_age_at_transaction < 35 THEN '25-34'
                     WHEN customer_age_at_transaction < 45 THEN '35-44'
                     WHEN customer_age_at_transaction < 55 THEN '45-54'
                     WHEN customer_age_at_transaction < 65 THEN '55-64'
                     ELSE '65+' END AS age_group,
          COUNT(*) AS total, $frauds AS frauds, $rate AS fraud_rate
          FROM fact_transactions WHERE customer_age_at_transaction > 0
          GROUP BY 1 ORDER BY age_group""",
    "c8_1_model_accuracy" ->
      """SELECT COUNT(*) AS total,
         SUM(CASE WHEN f.is_fraud = p.is_fraud_predicted THEN 1 ELSE 0 END) AS correct,
         CAST(SUM(CASE WHEN f.is_fraud = p.is_fraud_predicted THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) * 100 AS accuracy
         FROM fraud_predictions p
         JOIN fact_transactions f ON p.trans_num = f.transaction_key""",
    "c8_2_score_distribution" ->
      """SELECT CASE WHEN prediction_score < 0.2 THEN '0-20%'
                    WHEN prediction_score < 0.4 THEN '20-40%'
                    WHEN prediction_score < 0.6 THEN '40-60%'
                    WHEN prediction_score < 0.8 THEN '60-80%'
                    ELSE '80-100%' END AS score_range,
         COUNT(*) AS count FROM fraud_predictions GROUP BY 1 ORDER BY score_range""",
    "c9_1_top_high_risk_frauds" ->
      """SELECT transaction_key, transaction_timestamp, transaction_amount, merchant, distance_km,
         CASE WHEN transaction_amount > 1000 AND distance_km > 200 THEN 'CRITICAL'
              WHEN transaction_amount > 500 AND is_late_night = 1 THEN 'HIGH'
              ELSE 'MEDIUM' END AS severity
         FROM fact_transactions WHERE is_fraud = 1
         ORDER BY transaction_amount DESC LIMIT 100""",
    "c10_1_multi_factor_risk" ->
      s"""SELECT CASE WHEN is_high_amount = 1 THEN 'High$$' ELSE 'Normal$$' END AS amt,
          CASE WHEN is_distant_transaction = 1 THEN 'Distant' ELSE 'Local' END AS dist,
          CASE WHEN is_late_night = 1 THEN 'Night' ELSE 'Day' END AS time,
          COUNT(*) AS total, $frauds AS frauds, $rate AS fraud_rate
          FROM fact_transactions
          GROUP BY is_high_amount, is_distant_transaction, is_late_night""")

  def run(spark: SparkSession, name: String): DataFrame = spark.sql(all(name))
}
