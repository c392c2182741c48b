package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Stream-stream event-time joins — the correlation layer the reference's
  * per-row scoring loop cannot express (`main.py` scores each transaction
  * in isolation; correlating two live feeds there would need an external
  * state store). Structured Streaming holds both sides' recent rows in
  * watermark-bounded state, so the join is declarative and the state
  * never grows past the interval the query names.
  *
  * Scale shape: both sides shuffle on the join key ONCE into
  * co-partitioned state stores; per-trigger work is sized by the arriving
  * micro-batches, and the time-range condition against both watermarked
  * columns is what lets Spark EVICT state — without it the stores grow
  * forever (Spark refuses outer joins in that shape, and inner joins
  * silently leak; [[intervalJoin]] therefore always builds the bound).
  */
object StreamJoins {

  /** Event-time interval join: every left row pairs with the right rows
    * of the same key whose event time lies in
    * `[leftTs − lookBack, leftTs + lookAhead]`.
    *
    * The two frames are dataset-aliased `l` / `r`, so same-named columns
    * on both sides are fine; the output carries every column of both
    * (disambiguate downstream with `col("l.x")` / `col("r.x")`).
    *
    * `joinType` may be `inner` or `left_outer`. Outer rows (left rows
    * with no partner) emit only once the RIGHT watermark passes
    * `leftTs + lookAhead` — the moment a partner is provably impossible —
    * which is exactly Spark's outer-join semantics under watermarks;
    * a spec drives the watermark forward and asserts the null row.
    *
    * Watermark delays bound BOTH how late a row may arrive and how long
    * the opposite side's state is retained (state ≈ interval + delay per
    * key); size them to the feed's real disorder, not generously.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      key: String,
      leftTs: String, rightTs: String,
      lookBack: String, lookAhead: String,
      leftDelay: String, rightDelay: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, leftDelay).alias("l")
    val r = right.withWatermark(rightTs, rightDelay).alias("r")
    val lTs = F.col(s"l.$leftTs")
    val rTs = F.col(s"r.$rightTs")
    val cond = F.col(s"l.$key") === F.col(s"r.$key") &&
      rTs >= lTs - F.expr(s"INTERVAL $lookBack") &&
      rTs <= lTs + F.expr(s"INTERVAL $lookAhead")
    l.join(r, cond, joinType)
  }

  /** Velocity pairs — the classic card-testing / rapid-fire fraud signal:
    * two DISTINCT transactions on the same card within `window` of each
    * other, emitted as (first, second) ordered pairs. A stream-stream
    * SELF join: the same silver transaction stream is both sides, keyed
    * by `cc_num`, the second leg constrained to `(ts, ts + window]` —
    * strictly after, so a pair emits exactly once in one orientation and
    * a transaction never pairs with itself (same-timestamp distinct
    * transactions tie-break on `trans_num` ordering for the same
    * exactly-once shape).
    *
    * Emits one row per qualifying pair: card, both transaction ids,
    * both timestamps, both amounts, and the gap in seconds — the
    * feature a velocity rule thresholds on.
    */
  def velocityPairs(silver: DataFrame, window: String = "10 minutes",
      delay: String = "5 minutes"): DataFrame = {
    val a = silver.select(
      F.col("cc_num"),
      F.col("trans_num").as("first_trans"),
      F.col("trans_timestamp").as("first_ts"),
      F.col("amt").as("first_amt"))
    val b = silver.select(
      F.col("cc_num").as("cc_num_b"),
      F.col("trans_num").as("second_trans"),
      F.col("trans_timestamp").as("second_ts"),
      F.col("amt").as("second_amt"))
    val cond = F.col("cc_num") === F.col("cc_num_b") &&
      F.col("second_ts") >= F.col("first_ts") &&
      F.col("second_ts") <= F.col("first_ts") + F.expr(s"INTERVAL $window") &&
      (F.col("second_ts") > F.col("first_ts") ||
        F.col("second_trans") > F.col("first_trans"))
    a.withWatermark("first_ts", delay)
      .join(b.withWatermark("second_ts", delay), cond, "inner")
      .select(
        F.col("cc_num"),
        F.col("first_trans"), F.col("second_trans"),
        F.col("first_ts"), F.col("second_ts"),
        F.col("first_amt"), F.col("second_amt"),
        (F.unix_timestamp(F.col("second_ts")) -
          F.unix_timestamp(F.col("first_ts"))).as("gap_seconds"))
  }
}
