package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{functions => F}

/** Alert-delivery analog of the reference's Slack webhook
  * (`spark/app/realtime_prediction_job.py:115-209`): the scoring stream
  * lands would-be notifications in the alert-log table
  * ([[graft.streaming.ScoringStream]], idempotent per trans_num); this
  * tool FOLLOWS that table and renders each alert in the reference's
  * message shape (risk emoji, transaction id, amount, customer,
  * merchant, probability, location, detection time) — the delivery leg,
  * minus the webhook the sandbox can't reach.
  *
  * The render is a pure Column expression over alert-log ⋈ transactions
  * (broadcast — the alert batch is notification-sized by definition);
  * only the final formatted strings reach the driver, exactly the rows a
  * webhook POST loop would carry.
  *
  * Usage: runMain graft.tools.AlertTail <alertsPath> <txPath> [checkpointDir]
  */
object AlertTail {

  /** The reference's risk emoji map (`realtime_prediction_job.py:126-131`). */
  private def emoji(risk: org.apache.spark.sql.Column) =
    F.when(risk === "HIGH", "🔴")
      .when(risk === "MEDIUM", "🟡")
      .when(risk === "LOW", "🟢")
      .otherwise("⚪")

  /** One message per alert row, in the reference's field order: header,
    * transaction id, amount ($%.2f), customer (first last), merchant,
    * fraud probability (%.1f%%), risk level, location (city, state),
    * detection time. `tx` is the parsed transaction table (bronze shape);
    * alerts missing a transaction row keep N/A fields rather than being
    * dropped (left join) — a notification must never vanish because
    * enrichment lagged.
    */
  def render(alerts: DataFrame, tx: DataFrame): DataFrame = {
    val t = tx.select("trans_num", "amt", "first", "last", "merchant", "city", "state")
    // right-outer with the alert batch broadcast: the transaction table
    // streams in place (never shuffled at its own size), every alert row
    // survives even without an enrichment match
    t.join(F.broadcast(alerts), Seq("trans_num"), "right_outer")
      .select(F.col("trans_num"), F.col("prediction_time"),
        F.concat(
          F.lit("🚨 FRAUD DETECTED "), emoji(F.col("risk_level")),
          F.lit(" | "), F.coalesce(F.col("risk_level"), F.lit("?")), F.lit(" Risk"),
          F.lit(" | tx `"), F.col("trans_num"), F.lit("`"),
          F.lit(" | "), F.coalesce(F.format_string("$%.2f", F.col("amt")), F.lit("N/A")),
          F.lit(" | "),
          F.coalesce(F.concat_ws(" ", F.col("first"), F.col("last")), F.lit("N/A")),
          F.lit(" @ "), F.coalesce(F.col("merchant"), F.lit("N/A")),
          F.lit(" | prob "),
          F.format_string("%.1f%%", F.col("prediction_score") * 100),
          F.lit(" | 📍 "),
          F.coalesce(F.concat_ws(", ", F.col("city"), F.col("state")), F.lit("N/A")),
          F.lit(" | ⏰ "), F.col("prediction_time").cast("string")
        ).as("message"))
  }

  /** Follow the alert log: each micro-batch of new alert rows is rendered
    * against the transaction table and handed to `sink` (default:
    * println — the webhook stand-in), ordered by prediction time then id
    * so re-runs print deterministically. The alert log is already
    * idempotent per trans_num (ScoringStream's anti-join), so each alert
    * is delivered at most once per checkpoint lineage.
    */
  def follow(spark: SparkSession, alertsPath: String, txPath: String,
      checkpointDir: String, sink: String => Unit = println): StreamingQuery = {
    val schema = spark.read.parquet(alertsPath).schema
    spark.readStream.schema(schema).parquet(alertsPath)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val tx = spark.read.parquet(txPath)
          render(batch, tx)
            .orderBy("prediction_time", "trans_num")
            .select("message")
            .collect() // notification-sized: exactly the webhook loop's rows
            .foreach(r => sink(r.getString(0)))
        }
      }
      .start()
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AlertTail <alertsPath> <txPath> [checkpointDir]")
    val spark = graft.runtime.GraftSession.get("alert-tail")
    spark.sparkContext.setLogLevel("ERROR")
    val ckpt = args.lift(2).getOrElse(s"/tmp/graft-alerttail-${System.nanoTime()}")
    val q = follow(spark, args(0), args(1), ckpt)
    q.awaitTermination()
  }
}
