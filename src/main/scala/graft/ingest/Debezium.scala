package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

import graft.model.Schemas

/** Debezium-envelope parsing — the CDC entry point of the reference
  * (`spark/app/streaming_job.py:73-95`), jar-constrained mapping per
  * SURVEY §7.0: Kafka `value` bytes become a `json_string` column from a
  * file/stream source; the operator chain P1-P4 is identical.
  */
object Debezium {

  /** P1-P4: raw json string → typed flat record.
    *   - `get_json_object($.after)` + notNull filter drops tombstones;
    *   - `from_json` with the declared schema (no inference — SURVEY §1.3);
    *   - µs-epoch string → timestamp, days-epoch string → date;
    *   - `is_fraud` canonicalized to int at bronze exit (SURVEY §7.4(4)).
    */
  def parse(raw: DataFrame, jsonCol: String = "json_string"): DataFrame =
    raw
      .withColumn("after_json", F.get_json_object(F.col(jsonCol), "$.after"))
      .filter(F.col("after_json").isNotNull)
      .withColumn("data", F.from_json(F.col("after_json"), Schemas.debeziumAfter))
      .select("data.*")
      .withColumn("trans_timestamp",
        (F.col("trans_date_trans_time").cast("long") / 1e6).cast("timestamp"))
      .withColumn("dob", F.date_add(F.lit("1970-01-01").cast("date"),
        F.col("dob").cast("int")))
      .withColumn("is_fraud", F.col("is_fraud").cast("int"))

  /** Bronze derivations (`streaming_job.py:82-95`): ingestion time +
    * null-guarded y/m/d partition columns.
    */
  def withBronzeColumns(parsed: DataFrame): DataFrame = {
    val ts = F.col("trans_timestamp")
    parsed
      .withColumn("ingestion_time", F.current_timestamp())
      .withColumn("year", F.when(ts.isNotNull, F.year(ts)))
      .withColumn("month", F.when(ts.isNotNull, F.month(ts)))
      .withColumn("day", F.when(ts.isNotNull, F.dayofmonth(ts)))
  }
}
