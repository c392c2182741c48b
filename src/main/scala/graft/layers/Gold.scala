package graft.layers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Silver → gold star schema: 4 dimensions + 1 fact
  * (`spark/app/gold_job.py:73-223`).
  *
  * Key scheme follows the reference bit-for-bit: natural key for customer
  * (cc_num) and time (yyyyMMddHH string), surrogate
  * `abs(hash(concat(...)))` with NO separator for merchant and location
  * (`gold_job.py:111,170`) — including concat's null-propagation
  * (hash(NULL) = the seed 42), so keys match reference-produced gold
  * tables exactly. The safer separator/null-skipping scheme was
  * deliberately dropped for cross-compatibility.
  *
  * Dedup semantics: the reference deduplicates per batch only and appends,
  * so dims accumulate duplicates across runs (`gold_job.py:93-98` — SURVEY
  * §7.4(1)). `dedupAgainstExisting = true` (default) fixes that with a
  * left-anti join against the existing dim; `false` reproduces reference
  * behavior exactly.
  */
object Gold {

  def dimCustomer(silver: DataFrame): DataFrame =
    silver.select(
        F.col("cc_num").as("customer_key"),
        F.col("first").as("first_name"),
        F.col("last").as("last_name"),
        F.col("gender"),
        F.col("dob").as("date_of_birth"),
        F.col("age"),
        F.col("street"),
        F.col("city").as("customer_city"),
        F.col("state").as("customer_state"),
        F.col("zip").as("customer_zip"),
        F.col("lat").as("customer_lat"),
        F.col("long").as("customer_long"),
        F.col("city_pop").as("customer_city_population"),
        F.col("job"),
        F.current_timestamp().as("last_updated"))
      .dropDuplicates("customer_key")

  def dimMerchant(silver: DataFrame): DataFrame =
    silver.select(
        F.abs(F.hash(F.concat(F.col("merchant"), F.col("merch_lat"), F.col("merch_long"))))
          .as("merchant_key"),
        F.col("merchant"),
        F.col("category").as("merchant_category"),
        F.col("merch_lat").as("merchant_lat"),
        F.col("merch_long").as("merchant_long"),
        F.current_timestamp().as("last_updated"))
      .dropDuplicates("merchant", "merchant_lat", "merchant_long")

  def dimTime(silver: DataFrame): DataFrame = {
    val ts = F.col("trans_timestamp")
    silver.select(
        F.date_format(ts, "yyyyMMddHH").as("time_key"),
        ts.as("full_timestamp"),
        F.year(ts).as("year"),
        F.month(ts).as("month"),
        F.dayofmonth(ts).as("day"),
        F.hour(ts).as("hour"),
        F.minute(ts).as("minute"),
        F.dayofweek(ts).as("day_of_week"),
        F.weekofyear(ts).as("week_of_year"),
        F.quarter(ts).as("quarter"),
        F.date_format(ts, "EEEE").as("day_name"),
        F.date_format(ts, "MMMM").as("month_name"),
        F.dayofweek(ts).isin(1, 7).cast("int").as("is_weekend"),
        F.when(F.hour(ts).between(6, 11), "Morning")
          .when(F.hour(ts).between(12, 17), "Afternoon")
          .when(F.hour(ts).between(18, 22), "Evening")
          .otherwise("Night").as("time_period"))
      .dropDuplicates("time_key")
  }

  def dimLocation(silver: DataFrame): DataFrame =
    silver.select(
        F.abs(F.hash(F.concat(F.col("city"), F.col("state"), F.col("zip"))))
          .as("location_key"),
        F.col("city"),
        F.col("state"),
        F.col("zip"),
        F.col("lat"),
        F.col("long"),
        F.col("city_pop"),
        F.current_timestamp().as("last_updated"))
      .dropDuplicates("city", "state", "zip")

  def factTransactions(silver: DataFrame): DataFrame =
    silver.select(
      F.col("trans_num").as("transaction_key"),
      F.col("cc_num").as("customer_key"),
      F.col("merchant"),
      F.date_format(F.col("trans_timestamp"), "yyyyMMddHH").as("time_key"),
      F.col("amt").as("transaction_amount"),
      F.col("is_fraud"),
      F.col("trans_timestamp").as("transaction_timestamp"),
      F.col("category").as("transaction_category"),
      F.col("unix_time"),
      F.col("distance_km"),
      F.col("age").as("customer_age_at_transaction"),
      F.col("log_amount"),
      F.col("amount_bin"),
      F.col("is_distant_transaction"),
      F.col("is_late_night"),
      F.col("is_zero_amount"),
      F.col("is_high_amount"),
      F.col("hour").as("transaction_hour"),
      F.col("day_of_week").as("transaction_day_of_week"),
      F.col("is_weekend").as("is_weekend_transaction"),
      F.col("hour_sin"),
      F.col("hour_cos"),
      F.col("ingestion_time"),
      F.current_timestamp().as("fact_created_time"))

  /** Incremental gold build over a silver slice, with optional cross-run
    * dim dedup (left-anti against existing keys — the reference's missing
    * guard, implemented as SURVEY §2.3's J-note prescribes).
    */
  def build(
      silverSlice: DataFrame,
      existing: String => Option[DataFrame] = _ => None,
      dedupAgainstExisting: Boolean = true): Map[String, DataFrame] = {

    def maybeAnti(df: DataFrame, table: String, keys: Seq[String]): DataFrame =
      existing(table) match {
        case Some(ex) if dedupAgainstExisting =>
          df.join(ex.select(keys.map(F.col): _*), keys, "left_anti")
        case _ => df
      }

    Map(
      "dim_customer" -> maybeAnti(dimCustomer(silverSlice), "dim_customer", Seq("customer_key")),
      "dim_merchant" -> maybeAnti(dimMerchant(silverSlice), "dim_merchant",
        Seq("merchant", "merchant_lat", "merchant_long")),
      "dim_time" -> maybeAnti(dimTime(silverSlice), "dim_time", Seq("time_key")),
      "dim_location" -> maybeAnti(dimLocation(silverSlice), "dim_location",
        Seq("city", "state", "zip")),
      "fact_transactions" -> factTransactions(silverSlice))
  }

  /** Append a [[build]] result under `basePath/<table>` with atomic batch
    * visibility ([[AtomicAppend]] — the `_delta_log` role the reference's
    * gold writes get from Delta, `gold_job.py:224-243`): a reader
    * concurrent with the five-table append sees each table's batch whole
    * or not at all. Pass the orchestrator's run id for replay
    * idempotence; read back with [[read]] (which also serves as the
    * `existing` hook for [[build]]'s cross-run dim dedup).
    */
  def write(tables: Map[String, DataFrame], basePath: String,
      batchId: Option[Long] = None): Unit =
    tables.foreach { case (name, df) =>
      // the fact table carries a zone map on its natural scan predicates
      // (time range, amount) so selective reads through
      // [[AtomicAppend.read(path, predicate)]] skip whole batch dirs;
      // dims are small and stats-free by design
      val stats = if (name == "fact_transactions")
        Seq("transaction_timestamp", "transaction_amount") else Nil
      AtomicAppend.append(df, s"$basePath/$name", Nil, batchId, statsCols = stats); ()
    }

  /** Committed batches of one gold table; None before its first commit. */
  def read(spark: org.apache.spark.sql.SparkSession, basePath: String,
      table: String): Option[DataFrame] =
    AtomicAppend.readIfExists(spark, s"$basePath/$table")
}
