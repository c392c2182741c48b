package graft.views

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The 9 analytical views of the gold layer
  * (`sql/gold_layer_views_delta.sql:18-236`), re-expressed as Spark SQL
  * temp views over registered gold tables. Computed-on-read, like the
  * reference (CREATE VIEW, not materialized).
  *
  * Scale: every view is a single hash aggregate over the fact table (plus
  * a broadcast dim join for state/time_period); at 100 TB the fact scan is
  * pruned by the y/m/d partitioning when callers add date predicates.
  */
object GoldViews {

  private val fraudCount = "SUM(CASE WHEN is_fraud = 1 THEN 1 ELSE 0 END)"

  // The `CASE WHEN distance_km >= 0` guards below mirror the reference's
  // views (`gold_layer_views_delta.sql:36-41`), which exclude a -1
  // null-coordinate sentinel from distance aggregates. With the canonical
  // null-quirk haversine (`FraudFeatures.distanceKm`) the sentinel never
  // fires — null-coord rows carry ~0.0 km and DO dilute avg_distance,
  // exactly as they do in the reference. The guards are kept verbatim for
  // view parity and for gold tables written by older/API-variant
  // pipelines that emit the sentinel.

  val definitions: Map[String, String] = Map(
    "daily_summary" ->
      s"""SELECT year(transaction_timestamp) AS year,
            month(transaction_timestamp) AS month,
            day(transaction_timestamp) AS day,
            to_date(transaction_timestamp) AS report_date,
            COUNT(*) AS total_transactions,
            $fraudCount AS fraud_transactions,
            SUM(CASE WHEN is_fraud = 0 THEN 1 ELSE 0 END) AS normal_transactions,
            AVG(transaction_amount) AS avg_transaction_amount,
            MAX(transaction_amount) AS max_transaction_amount,
            MIN(transaction_amount) AS min_transaction_amount,
            SUM(transaction_amount) AS total_amount,
            SUM(CASE WHEN is_fraud = 1 THEN transaction_amount ELSE 0 END) AS fraud_amount,
            AVG(CASE WHEN distance_km >= 0 THEN distance_km END) AS avg_distance,
            MAX(CASE WHEN distance_km >= 0 THEN distance_km END) AS max_distance,
            CAST($fraudCount AS DOUBLE) / COUNT(*) AS fraud_rate,
            CASE WHEN $fraudCount > 0
              THEN SUM(CASE WHEN is_fraud = 1 THEN transaction_amount ELSE 0 END) / $fraudCount
              ELSE 0 END AS avg_fraud_amount
          FROM fact_transactions
          GROUP BY 1, 2, 3, 4""",
    "hourly_summary" ->
      s"""SELECT year(transaction_timestamp) AS year,
            month(transaction_timestamp) AS month,
            day(transaction_timestamp) AS day,
            transaction_hour AS hour,
            COUNT(*) AS total_transactions,
            $fraudCount AS fraud_transactions,
            AVG(transaction_amount) AS avg_amount,
            AVG(CASE WHEN distance_km >= 0 THEN distance_km END) AS avg_distance,
            CAST($fraudCount AS DOUBLE) / COUNT(*) AS fraud_rate
          FROM fact_transactions
          GROUP BY 1, 2, 3, 4""",
    "state_summary" ->
      s"""SELECT c.customer_state AS state,
            COUNT(*) AS total_transactions,
            $fraudCount AS fraud_transactions,
            AVG(transaction_amount) AS avg_amount,
            AVG(CASE WHEN distance_km >= 0 THEN distance_km END) AS avg_distance,
            CAST($fraudCount AS DOUBLE) / COUNT(*) AS fraud_rate
          FROM fact_transactions f
          JOIN dim_customer c ON f.customer_key = c.customer_key
          GROUP BY c.customer_state
          ORDER BY fraud_transactions DESC""",
    "category_summary" ->
      s"""SELECT transaction_category AS category,
            COUNT(*) AS total_transactions,
            $fraudCount AS fraud_transactions,
            AVG(transaction_amount) AS avg_amount,
            CAST($fraudCount AS DOUBLE) / COUNT(*) AS fraud_rate
          FROM fact_transactions
          GROUP BY transaction_category
          ORDER BY fraud_rate DESC""",
    "amount_summary" ->
      s"""SELECT amount_bin AS amount_range,
            COUNT(*) AS total_transactions,
            $fraudCount AS fraud_transactions,
            AVG(transaction_amount) AS avg_amount,
            CAST($fraudCount AS DOUBLE) / COUNT(*) AS fraud_rate
          FROM fact_transactions
          GROUP BY amount_bin
          ORDER BY fraud_rate DESC""",
    "latest_metrics" ->
      s"""SELECT COUNT(*) AS total_transactions_today,
            $fraudCount AS fraud_detected_today,
            AVG(transaction_amount) AS avg_amount_today,
            AVG(CASE WHEN distance_km >= 0 THEN distance_km END) AS avg_distance_today,
            MAX(transaction_timestamp) AS last_update,
            CAST($fraudCount AS DOUBLE) / COUNT(*) AS fraud_rate_today,
            CASE WHEN CAST($fraudCount AS DOUBLE) / COUNT(*) > 0.01 THEN 'HIGH'
                 WHEN CAST($fraudCount AS DOUBLE) / COUNT(*) > 0.005 THEN 'MEDIUM'
                 ELSE 'LOW' END AS alert_level
          FROM fact_transactions
          WHERE to_date(transaction_timestamp) = current_date""",
    "fraud_patterns" ->
      """SELECT amount_bin AS amount_range,
            COUNT(*) AS fraud_count,
            AVG(transaction_amount) AS avg_fraud_amount,
            AVG(CASE WHEN distance_km >= 0 THEN distance_km END) AS avg_fraud_distance,
            AVG(transaction_hour) AS avg_hour,
            SUM(CASE WHEN is_weekend_transaction = 1 THEN 1 ELSE 0 END) AS weekend_frauds
          FROM fact_transactions
          WHERE is_fraud = 1
          GROUP BY amount_bin
          ORDER BY fraud_count DESC""",
    "merchant_analysis" ->
      s"""SELECT merchant,
            transaction_category AS merchant_category,
            COUNT(*) AS total_transactions,
            $fraudCount AS fraud_transactions,
            AVG(transaction_amount) AS avg_amount,
            CAST($fraudCount AS DOUBLE) / COUNT(*) AS fraud_rate
          FROM fact_transactions
          GROUP BY merchant, transaction_category
          HAVING COUNT(*) > 10
          ORDER BY fraud_rate DESC
          LIMIT 100""",
    "time_period_analysis" ->
      s"""SELECT t.time_period,
            t.is_weekend,
            COUNT(*) AS total_transactions,
            $fraudCount AS fraud_transactions,
            AVG(transaction_amount) AS avg_amount,
            CAST($fraudCount AS DOUBLE) / COUNT(*) AS fraud_rate
          FROM fact_transactions f
          JOIN dim_time t ON f.time_key = t.time_key
          GROUP BY t.time_period, t.is_weekend
          ORDER BY fraud_rate DESC""")

  /** Register gold tables + all 9 views as temp views (the analog of the
    * reference's Trino/Hive registration,
    * `spark/app/register_tables_to_hive.py:72-76`).
    */
  def registerAll(spark: SparkSession, gold: Map[String, DataFrame]): Unit = {
    gold.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    definitions.foreach { case (name, sql) =>
      spark.sql(s"CREATE OR REPLACE TEMP VIEW $name AS $sql")
    }
  }
}
