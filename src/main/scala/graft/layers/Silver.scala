package graft.layers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

import graft.functions.FraudFeatures

/** Bronze → silver: typed re-projection + feature engineering
  * (`spark/app/silver_job.py:50-227`).
  *
  * Scale notes: the whole transform is narrow (no shuffle) — a single
  * projection pipeline per partition; incremental filtering via [[Hwm]]
  * prunes at the scan when bronze is partitioned by y/m/d.
  */
object Silver {

  /** The 27-column typed cast-projection (`silver_job.py:156-184`):
    * bronze's "cast late" strings become their real types here.
    */
  def typed(bronze: DataFrame): DataFrame =
    bronze
      .filter(F.col("trans_num").isNotNull) // :152
      .select(
        F.col("trans_num"),
        F.col("trans_timestamp"),
        F.col("cc_num").cast("long").as("cc_num"),
        F.col("merchant"),
        F.col("category"),
        F.col("amt").cast("double").as("amt"),
        F.col("first"),
        F.col("last"),
        F.col("gender"),
        F.col("street"),
        F.col("city"),
        F.col("state"),
        F.col("zip").cast("int").as("zip"),
        F.col("lat").cast("double").as("lat"),
        F.col("long").cast("double").as("long"),
        F.col("city_pop").cast("long").as("city_pop"),
        F.col("job"),
        F.col("dob").cast("date").as("dob"),
        F.col("unix_time").cast("long").as("unix_time"),
        F.col("merch_lat").cast("double").as("merch_lat"),
        F.col("merch_long").cast("double").as("merch_long"),
        F.col("is_fraud").cast("int").as("is_fraud"))

  /** Null defaulting (`silver_job.py:187-196`). */
  def filled(df: DataFrame): DataFrame =
    df.na.fill(Map(
      "amt" -> 0.0,
      "city_pop" -> 0L,
      "merchant" -> "unknown",
      "category" -> "unknown",
      "gender" -> "U",
      "state" -> "unknown"))

  /** Full silver transform: incremental slice → typed → filled →
    * 15-feature contract + partition columns.
    */
  def transform(bronze: DataFrame, existingSilver: Option[DataFrame]): DataFrame = {
    val incr = Hwm.newerThan(bronze, existingSilver, "trans_timestamp")
    FraudFeatures.withFeatures(filled(typed(incr)))
  }

  /** Append to the silver layer partitioned by y/m/d (`silver_job.py:222-227`),
    * with atomic batch visibility: the reference's writes all go through
    * Delta's `_delta_log`, so a reader never sees a torn multi-file
    * append — [[AtomicAppend]] is this engine's counterpart (batch dir +
    * commit marker). Pass the orchestrator's run/batch id for replay
    * idempotence; read the layer back with [[read]].
    */
  def write(df: DataFrame, path: String, batchId: Option[Long] = None): Unit = {
    // zone map on the incremental-scan timestamp and the hot filter
    // column: HWM slices (`trans_timestamp > hwm`) and selective amount
    // scans skip whole committed batches via AtomicAppend's `_STATS`,
    // under the y/m/d partition pruning the layout already gives
    AtomicAppend.append(df, path, Seq("year", "month", "day"), batchId,
      statsCols = Seq("trans_timestamp", "amt"))
    ()
  }

  /** Committed silver batches only — never a torn append ([[AtomicAppend.read]]). */
  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    AtomicAppend.read(spark, path)
}
