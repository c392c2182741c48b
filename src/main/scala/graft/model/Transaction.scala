package graft.model

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.types._

/** The single core entity of the reference lakehouse: one credit-card
  * transaction (Sparkov shape — `database/init_postgres.sql:12-51`).
  */
case class Transaction(
    trans_date_trans_time: Timestamp,
    cc_num: Long,
    merchant: String,
    category: String,
    amt: Double,
    first: String,
    last: String,
    gender: String,
    street: String,
    city: String,
    state: String,
    zip: Int,
    lat: Double,
    long: Double,
    city_pop: Long,
    job: String,
    dob: Date,
    trans_num: String,
    unix_time: Long,
    merch_lat: Double,
    merch_long: Double,
    is_fraud: Int)

object Schemas {

  /** Debezium `after` payload schema as declared by the bronze stream job
    * (`spark/app/streaming_job.py:37-60`): numerics Debezium renders as
    * strings stay strings here ("cast late" bronze/silver contract,
    * SURVEY §1.3); `amt` and coordinates are double because of
    * `decimal.handling.mode=double`.
    */
  val debeziumAfter: StructType = StructType(Seq(
    StructField("trans_date_trans_time", StringType), // µs-since-epoch as string
    StructField("cc_num", StringType),
    StructField("merchant", StringType),
    StructField("category", StringType),
    StructField("amt", DoubleType),
    StructField("first", StringType),
    StructField("last", StringType),
    StructField("gender", StringType),
    StructField("street", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("zip", StringType),
    StructField("lat", DoubleType),
    StructField("long", DoubleType),
    StructField("city_pop", StringType),
    StructField("job", StringType),
    StructField("dob", StringType),                   // days-since-epoch as string
    StructField("trans_num", StringType),
    StructField("unix_time", StringType),
    StructField("merch_lat", DoubleType),
    StructField("merch_long", DoubleType),
    StructField("is_fraud", StringType)))

  /** Debezium envelope: we only consume `after` (inserts/updates);
    * tombstones arrive as null `after` and are filtered
    * (`streaming_job.py:76-77`).
    */
  val debeziumEnvelope: StructType =
    StructType(Seq(StructField("after", debeziumAfter)))
}
