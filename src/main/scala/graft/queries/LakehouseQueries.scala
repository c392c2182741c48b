package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** The 9 gold analytical views' query shapes
  * (`sql/gold_layer_views_delta.sql`) exercised on the driver's `events`
  * table, oracle-checked: events.event_type='error' plays the is_fraud
  * flag, `value` plays transaction_amount, user_id plays the merchant.
  *
  * (The same view SQL runs verbatim over the fraud star schema via
  * `GoldViews` — covered by LakehouseSpec; these twins put the view
  * semantics under the DuckDB hash gate.)
  */
object LakehouseQueries extends QueryPack {

  private def ev(s: SparkSession, d: String): DataFrame = CoreQueries.events(s, d)

  private val err = "CASE WHEN event_type = 'error' THEN 1 ELSE 0 END"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // daily_summary shape: full multi-metric day rollup with conditional
    // sums, null-safe CASE aggregates, and the guarded fraud-rate ratio.
    "ql01_daily_summary" -> ((s, d) => {
      val e = ev(s, d).withColumn("is_err", (F.col("event_type") === "error").cast("int"))
      e.groupBy(F.date_trunc("day", F.col("ts")).as("report_date"))
        .agg(
          F.count(F.lit(1)).as("total_events"),
          F.count(F.when(F.col("is_err") === 1, F.lit(1))).as("error_events"),
          F.count(F.when(F.col("is_err") === 0, F.lit(1))).as("normal_events"),
          F.round(F.avg("value"), 4).as("avg_value"),
          F.round(F.max("value"), 2).as("max_value"),
          F.round(F.min("value"), 2).as("min_value"),
          F.round(F.sum("value"), 2).as("total_value"),
          F.round(F.coalesce(F.sum(F.when(F.col("is_err") === 1, F.col("value"))), F.lit(0.0)), 2)
            .as("error_value"),
          F.round(F.coalesce(F.avg(F.when(F.col("value") >= 100, F.col("value"))), F.lit(0.0)), 4)
            .as("avg_high_value"))
        .withColumn("error_rate",
          F.round(F.col("error_events").cast("double") / F.col("total_events"), 6))
        .withColumn("avg_error_value",
          F.when(F.col("error_events") > 0,
            F.round(F.col("error_value") / F.col("error_events"), 4)).otherwise(0.0))
        .orderBy("report_date")
    }),

    // merchant_analysis shape: two-key rollup + HAVING + top-100 by rate.
    "ql02_entity_analysis" -> ((s, d) => {
      val e = ev(s, d)
      e.groupBy("user_id")
        .agg(
          F.count(F.lit(1)).as("total_events"),
          F.count(F.when(F.col("event_type") === "error", F.lit(1))).as("error_events"),
          F.round(F.avg("value"), 4).as("avg_value"))
        .filter(F.col("total_events") > 5)
        .withColumn("error_rate",
          F.round(F.col("error_events").cast("double") / F.col("total_events"), 6))
        .orderBy(F.col("error_rate").desc, F.col("user_id"))
        .limit(100)
    }),

    // time_period_analysis shape: bucketed time-of-day × weekend rollup.
    "ql03_time_period" -> ((s, d) => {
      val e = ev(s, d)
        .withColumn("time_period",
          F.when(F.hour(F.col("ts")).between(6, 11), "Morning")
            .when(F.hour(F.col("ts")).between(12, 17), "Afternoon")
            .when(F.hour(F.col("ts")).between(18, 22), "Evening")
            .otherwise("Night"))
        .withColumn("is_weekend", F.dayofweek(F.col("ts")).isin(1, 7).cast("int"))
      e.groupBy("time_period", "is_weekend")
        .agg(
          F.count(F.lit(1)).as("total_events"),
          F.count(F.when(F.col("event_type") === "error", F.lit(1))).as("error_events"),
          F.round(F.avg("value"), 4).as("avg_value"))
        .withColumn("error_rate",
          F.round(F.col("error_events").cast("double") / F.col("total_events"), 6))
        .orderBy("time_period", "is_weekend")
    }),

    // state_summary shape: stream table ⋈ broadcast dim, rollup by the
    // dim attribute (events.user_id plays the customer FK).
    "ql05_segment_summary" -> ((s, d) => {
      val e = ev(s, d)
      val c = graft.runtime.Tables.load(s, d, "customer")
      e.join(F.broadcast(c), e("user_id") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          F.count(F.lit(1)).as("total_events"),
          F.count(F.when(F.col("event_type") === "error", F.lit(1))).as("error_events"),
          F.round(F.avg("value"), 4).as("avg_value"))
        .withColumn("error_rate",
          F.round(F.col("error_events").cast("double") / F.col("total_events"), 6))
        .orderBy("c_mktsegment")
    }),

    // fraud_patterns shape: filtered-population rollup (errors only).
    "ql06_error_patterns" -> ((s, d) => {
      ev(s, d).filter(F.col("event_type") === "error")
        .withColumn("value_bin",
          F.when(F.col("value") < 50, 1).when(F.col("value") < 150, 2)
            .when(F.col("value") < 300, 3).otherwise(4))
        .groupBy("value_bin")
        .agg(
          F.count(F.lit(1)).as("error_count"),
          F.round(F.avg("value"), 4).as("avg_error_value"),
          F.round(F.avg(F.hour(F.col("ts"))), 4).as("avg_hour"),
          F.count(F.when(F.dayofweek(F.col("ts")).isin(1, 7), F.lit(1))).as("weekend_errors"))
        .orderBy("value_bin")
    }),

    // latest_metrics shape: single-row global metrics + alert ladder.
    "ql04_latest_metrics" -> ((s, d) => {
      ev(s, d).agg(
          F.count(F.lit(1)).as("total_events"),
          F.count(F.when(F.col("event_type") === "error", F.lit(1))).as("errors_detected"),
          F.round(F.avg("value"), 4).as("avg_value"),
          F.max("ts").as("last_update"))
        .withColumn("error_rate",
          F.round(F.col("errors_detected").cast("double") / F.col("total_events"), 6))
        .withColumn("alert_level",
          F.when(F.col("error_rate") > 0.25, "HIGH")
            .when(F.col("error_rate") > 0.15, "MEDIUM")
            .otherwise("LOW"))
    })
  )

  def oracle: Map[String, String] = Map(
    "ql01_daily_summary" ->
      s"""SELECT report_date, total_events, error_events, normal_events, avg_value,
         max_value, min_value, total_value, error_value, avg_high_value,
         round(CAST(error_events AS DOUBLE) / total_events, 6) AS error_rate,
         CASE WHEN error_events > 0 THEN round(error_value / error_events, 4) ELSE 0.0 END AS avg_error_value
         FROM (
           SELECT date_trunc('day', ts) AS report_date,
             count(*) AS total_events,
             count(CASE WHEN event_type = 'error' THEN 1 END) AS error_events,
             count(CASE WHEN event_type <> 'error' THEN 1 END) AS normal_events,
             round(avg(value), 4) AS avg_value,
             round(max(value), 2) AS max_value,
             round(min(value), 2) AS min_value,
             round(sum(value), 2) AS total_value,
             round(coalesce(sum(CASE WHEN event_type = 'error' THEN value END), 0), 2) AS error_value,
             round(coalesce(avg(CASE WHEN value >= 100 THEN value END), 0), 4) AS avg_high_value
           FROM events GROUP BY 1)
         ORDER BY report_date""",
    "ql02_entity_analysis" ->
      """SELECT user_id, total_events, error_events, avg_value,
         round(CAST(error_events AS DOUBLE) / total_events, 6) AS error_rate
         FROM (
           SELECT user_id, count(*) AS total_events,
             count(CASE WHEN event_type = 'error' THEN 1 END) AS error_events,
             round(avg(value), 4) AS avg_value
           FROM events GROUP BY user_id HAVING count(*) > 5)
         ORDER BY error_rate DESC, user_id LIMIT 100""",
    "ql03_time_period" ->
      """SELECT time_period, is_weekend, total_events, error_events, avg_value,
         round(CAST(error_events AS DOUBLE) / total_events, 6) AS error_rate
         FROM (
           SELECT CASE WHEN EXTRACT(hour FROM ts) BETWEEN 6 AND 11 THEN 'Morning'
                       WHEN EXTRACT(hour FROM ts) BETWEEN 12 AND 17 THEN 'Afternoon'
                       WHEN EXTRACT(hour FROM ts) BETWEEN 18 AND 22 THEN 'Evening'
                       ELSE 'Night' END AS time_period,
             CAST(EXTRACT(dow FROM ts) IN (0, 6) AS INTEGER) AS is_weekend,
             count(*) AS total_events,
             count(CASE WHEN event_type = 'error' THEN 1 END) AS error_events,
             round(avg(value), 4) AS avg_value
           FROM events GROUP BY 1, 2)
         ORDER BY time_period, is_weekend""",
    "ql05_segment_summary" ->
      """SELECT c_mktsegment, total_events, error_events, avg_value,
         round(CAST(error_events AS DOUBLE) / total_events, 6) AS error_rate
         FROM (
           SELECT c_mktsegment, count(*) AS total_events,
             count(CASE WHEN event_type = 'error' THEN 1 END) AS error_events,
             round(avg(value), 4) AS avg_value
           FROM events JOIN customer ON user_id = c_custkey
           GROUP BY c_mktsegment)
         ORDER BY c_mktsegment""",
    "ql06_error_patterns" ->
      """SELECT CASE WHEN value < 50 THEN 1 WHEN value < 150 THEN 2
                    WHEN value < 300 THEN 3 ELSE 4 END AS value_bin,
         count(*) AS error_count,
         round(avg(value), 4) AS avg_error_value,
         round(avg(EXTRACT(hour FROM ts)), 4) AS avg_hour,
         count(CASE WHEN EXTRACT(dow FROM ts) IN (0, 6) THEN 1 END) AS weekend_errors
         FROM events WHERE event_type = 'error'
         GROUP BY 1 ORDER BY value_bin""",
    "ql04_latest_metrics" ->
      """SELECT total_events, errors_detected, avg_value, last_update,
         round(CAST(errors_detected AS DOUBLE) / total_events, 6) AS error_rate,
         CASE WHEN round(CAST(errors_detected AS DOUBLE) / total_events, 6) > 0.25 THEN 'HIGH'
              WHEN round(CAST(errors_detected AS DOUBLE) / total_events, 6) > 0.15 THEN 'MEDIUM'
              ELSE 'LOW' END AS alert_level
         FROM (
           SELECT count(*) AS total_events,
             count(CASE WHEN event_type = 'error' THEN 1 END) AS errors_detected,
             round(avg(value), 4) AS avg_value,
             max(ts) AS last_update
           FROM events)"""
  )
}
