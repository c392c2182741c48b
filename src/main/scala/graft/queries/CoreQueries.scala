package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.runtime.Tables

/** Core relational corpus — one query per operator family of SURVEY.md §2
  * (scans S3; projections/filters P5-P13; joins J1-J6 + anti/semi;
  * aggregations A1-A8; sorts/top-k O1-O3; set ops U1-U2; scalar fns §2.8),
  * re-expressed over the driver's TPC-H-ish tables.
  *
  * Scale notes (100 TB readiness):
  *   - dims (`nation`, `region`, `customer` at small SF) are broadcast
  *     explicitly; fact-fact joins are left to Catalyst/AQE (sort-merge with
  *     skew splitting);
  *   - aggregates are plain `groupBy.agg` → partial (map-side) + final hash
  *     aggregation, no driver round-trips;
  *   - the high-water-mark pattern (q24) uses a broadcast scalar subquery
  *     instead of the reference's `collect()` round-trip
  *     (`silver_job.py:127-137`), so it stays fully distributed;
  *   - top-k goes through `orderBy(...).limit(k)` which Spark plans as
  *     `TakeOrderedAndProject` (no global sort).
  */
object CoreQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** events with ts normalized to µs TimestampType (see Tables.loadEvents). */
  def events(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "events")

  private val isWeekend: Column => Column = ts => dayofweek(ts).isin(1, 7)
  private val isLateNight: Column => Column = ts => hour(ts) >= 23 || hour(ts) <= 5

  /** Haversine distance in km as a pure Column composition (SURVEY §2.10 F1,
    * `silver_job.py:33-48`) — codegen'd built-ins, no UDF.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * 6371.0) * asin(sqrt(a))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A3/A4 + P9 pushdown: TPC-H Q1-shaped pricing summary.
    "q01_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // A2: global multi-aggregate, no GROUP BY (latest_metrics view shape).
    "q02_global_metrics" -> ((s, d) => {
      t(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        round(sum(col("l_extendedprice")), 2).as("total_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"))
    }),

    // O2: top-k via TakeOrderedAndProject (no global sort at scale).
    "q03_topk_orders" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // P8/A6: CASE bucketing then aggregate by bucket (amount_bin shape).
    "q04_bucket_case" -> ((s, d) => {
      t(s, d, "orders")
        .withColumn("price_bin",
          when(col("o_totalprice") < 10000, 1)
            .when(col("o_totalprice") < 50000, 2)
            .when(col("o_totalprice") < 100000, 3)
            .when(col("o_totalprice") < 300000, 4)
            .otherwise(5))
        .groupBy("price_bin")
        .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 2).as("avg_price"))
        .orderBy("price_bin")
    }),

    // A4/A5: conditional aggregates + guarded ratio (fraud_rate shape,
    // gold_layer_views_delta.sql:27-50).
    "q05_conditional_agg" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          count(when(col("o_orderstatus") === "F", lit(1))).as("n_f"),
          round(coalesce(sum(when(col("o_orderstatus") === "F", col("o_totalprice"))), lit(0.0)), 2).as("f_amount"),
          round(coalesce(avg(when(col("o_orderstatus") === "F", col("o_totalprice"))), lit(0.0)), 4).as("avg_f_amount"))
        .withColumn("f_rate", round(col("n_f").cast("double") / col("n_orders"), 6))
        .orderBy("o_orderpriority")
    }),

    // A7: HAVING as post-aggregation filter.
    "q06_having" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .filter(col("n") > 15)
        .orderBy(col("n").desc, col("o_custkey"))
    }),

    // J1: fact ⋈ broadcast dim, revenue rollup by segment.
    "q07_join_broadcast" -> ((s, d) => {
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // J6: multi-way join chain fact ⋈ fact ⋈ dim ⋈ dim (flagship).
    "q08_revenue_by_nation" -> ((s, d) => {
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // J5: left outer join keeping zero-order customers.
    "q09_left_join" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total"))
        .orderBy("c_custkey")
    }),

    // U5/J-note: left-anti join (the dedup-before-insert existence check).
    "q10_anti_join" -> ((s, d) => {
      val p = t(s, d, "orders").filter(col("o_orderstatus") === "P")
      t(s, d, "customer")
        .join(p, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // left-semi join (EXISTS).
    "q11_semi_join" -> ((s, d) => {
      val f = t(s, d, "orders").filter(col("o_orderstatus") === "F")
      t(s, d, "customer")
        .join(f, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // U2: exact dedup via distinct on a projection.
    "q12_distinct_dedup" -> ((s, d) => {
      t(s, d, "customer")
        .select("c_nationkey", "c_mktsegment")
        .distinct()
        .orderBy("c_nationkey", "c_mktsegment")
    }),

    // U1: union + distinct.
    "q13_union_distinct" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey")
    }),

    // §2.5 extension: ranking window — top-3 orders per nation.
    "q14_window_topn" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_nationkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("c_nationkey", "rn")
    }),

    // §2.8 date/time surface: dim_time projection (gold_job.py:126-155 shape).
    "q15_date_dim" -> ((s, d) => {
      t(s, d, "orders")
        .select(
          date_format(col("o_orderdate"), "yyyyMMdd").as("time_key"),
          year(col("o_orderdate")).as("year"),
          month(col("o_orderdate")).as("month"),
          quarter(col("o_orderdate")).as("quarter"),
          dayofmonth(col("o_orderdate")).as("day"),
          weekofyear(col("o_orderdate")).as("week_of_year"),
          dayofweek(col("o_orderdate")).as("day_of_week"),
          date_format(col("o_orderdate"), "EEEE").as("day_name"),
          date_format(col("o_orderdate"), "MMMM").as("month_name"),
          isWeekend(col("o_orderdate")).cast("int").as("is_weekend"))
        .distinct()
        .orderBy("time_key")
    }),

    // §2.8 string surface: concat / upper / substring / length / md5 keys.
    "q16_string_funcs" -> ((s, d) => {
      t(s, d, "part")
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_upper"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type_prefix"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          md5(concat(col("p_name"), lit("#"), col("p_brand"))).as("part_hash"))
        .orderBy("p_partkey")
    }),

    // P2/P3 analog: JSON field extraction from the event props payload.
    "q17_json_extract" -> ((s, d) => {
      events(s, d)
        .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("int"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(avg(col("k")), 4).as("avg_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // A3 on event time: hourly rollup (hourly_pattern view shape).
    "q18_events_hourly" -> ((s, d) => {
      events(s, d)
        .withColumn("hour_ts", date_trunc("hour", col("ts")))
        .groupBy("hour_ts", "event_type")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy("hour_ts", "event_type")
    }),

    // §2.5 extension: lag-based sessionization (30-min gap).
    "q19_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          count(when(col("gap_us") > 1800000000L || col("gap_us").isNull, lit(1))).as("n_sessions"))
        .orderBy("user_id")
    }),

    // A8: the 2³ risk-flag cube (dashboard_charts.sql:177 shape).
    "q20_risk_cube" -> ((s, d) => {
      events(s, d)
        .select(
          (col("value") > 100).cast("int").as("is_high_value"),
          (col("event_type") === "error").cast("int").as("is_error"),
          isLateNight(col("ts")).cast("int").as("is_late_night"))
        .groupBy("is_high_value", "is_error", "is_late_night")
        .agg(count(lit(1)).as("n"))
        .orderBy("is_high_value", "is_error", "is_late_night")
    }),

    // F5/F6: rule-based risk score + tier ladder (main.py:603-621, 409-414).
    "q21_rule_score" -> ((s, d) => {
      val e = events(s, d)
      e.withColumn("score", round(
          when(col("value") > 400, 0.3).otherwise(0.0) +
          when(col("event_type") === "error", 0.25).otherwise(0.0) +
          when(isLateNight(col("ts")), 0.15).otherwise(0.0) +
          when(col("value") > 250, 0.2).otherwise(0.0) +
          when(isWeekend(col("ts")), 0.1).otherwise(0.0), 2))
        .withColumn("tier",
          when(col("score") > 0.7, "HIGH")
            .when(col("score") > 0.4, "MEDIUM")
            .otherwise("LOW"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n"), round(avg(col("score")), 4).as("avg_score"))
        .orderBy("tier")
    }),

    // §2.8 feature engineering: the silver per-row feature contract
    // (silver_job.py:50-104) applied to the event stream table.
    "q22_feature_engineering" -> ((s, d) => {
      events(s, d)
        .select(
          col("event_id"),
          hour(col("ts")).as("hour"),
          dayofweek(col("ts")).as("day_of_week"),
          isWeekend(col("ts")).cast("int").as("is_weekend"),
          round(sin(hour(col("ts")) * lit(2.0 * 3.141592653589793 / 24)), 6).as("hour_sin"),
          round(cos(hour(col("ts")) * lit(2.0 * 3.141592653589793 / 24)), 6).as("hour_cos"),
          round(when(col("value") > 0, log1p(col("value"))).otherwise(0.0), 6).as("log_value"),
          (col("value") === 0).cast("int").as("is_zero"),
          (col("value") > 250).cast("int").as("is_high"),
          when(col("value") < 10, 1).when(col("value") < 50, 2).when(col("value") < 100, 3)
            .when(col("value") < 250, 4).otherwise(5).as("value_bin"))
        .orderBy("event_id")
    }),

    // F1: haversine as pure Column math over synthetic coordinates.
    "q23_haversine" -> ((s, d) => {
      val c = t(s, d, "customer")
        .withColumn("lat1", (col("c_custkey") % 90 - 45).cast("double"))
        .withColumn("lon1", (col("c_custkey") % 360 - 180).cast("double"))
        .withColumn("lat2", ((col("c_custkey") * 7) % 90 - 45).cast("double"))
        .withColumn("lon2", ((col("c_custkey") * 13) % 360 - 180).cast("double"))
      c.select(
          col("c_custkey"),
          round(haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")), 3).as("distance_km"))
        .orderBy("c_custkey")
    }),

    // A8 extension: CUBE over the risk flags (the reference's 2^3 manual
    // grid as a real grouping-sets operator). Keys coalesced to '<all>'
    // so null ordering differences between engines cannot bite.
    "q25_cube" -> ((s, d) => {
      events(s, d)
        .withColumn("is_high", (col("value") > 250).cast("int"))
        .cube("event_type", "is_high")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(
          coalesce(col("event_type"), lit("<all>")).as("event_type"),
          coalesce(col("is_high").cast("string"), lit("<all>")).as("is_high"),
          col("n"), col("total_value"))
        .orderBy("event_type", "is_high")
    }),

    // O1 extension: ROLLUP along the time hierarchy year→month→day.
    "q26_rollup" -> ((s, d) => {
      t(s, d, "orders")
        .rollup(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .select(
          coalesce(col("y").cast("string"), lit("<all>")).as("y"),
          coalesce(col("m").cast("string"), lit("<all>")).as("m"),
          col("n"), col("total"))
        .orderBy("y", "m")
    }),

    // Set ops beyond the reference (SURVEY §2.7 notes their absence):
    // INTERSECT/EXCEPT over nation keys of customers vs suppliers.
    "q27_intersect" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    }),
    "q28_except" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    }),

    // Pivot: event-type counts as columns per day (explicit value list so
    // the output schema is deterministic in both engines).
    "q29_pivot" -> ((s, d) => {
      events(s, d)
        .withColumn("day", dayofmonth(col("ts")))
        .groupBy("day")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("day")
    }),

    // A1: high-water-mark incremental filter — broadcast scalar agg instead
    // of the reference's driver collect() (silver_job.py:127-137).
    "q24_hwm_incremental" -> ((s, d) => {
      val o = t(s, d, "orders")
      val hwm = o.agg(max(col("o_orderdate")).as("hwm"))
      o.crossJoin(broadcast(hwm))
        .filter(col("o_orderdate") >= col("hwm") - expr("INTERVAL 90 DAYS"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("o_orderstatus")
    })
  )

  def oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
         round(avg(l_quantity),4) AS avg_qty, round(avg(l_extendedprice),4) AS avg_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q02_global_metrics" ->
      """SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders,
         round(sum(l_extendedprice),2) AS total_price, round(avg(l_quantity),4) AS avg_qty,
         round(min(l_extendedprice),2) AS min_price, round(max(l_extendedprice),2) AS max_price
         FROM lineitem""",
    "q03_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
    "q04_bucket_case" ->
      """SELECT CASE WHEN o_totalprice < 10000 THEN 1 WHEN o_totalprice < 50000 THEN 2
         WHEN o_totalprice < 100000 THEN 3 WHEN o_totalprice < 300000 THEN 4 ELSE 5 END AS price_bin,
         count(*) AS n, round(avg(o_totalprice),2) AS avg_price
         FROM orders GROUP BY 1 ORDER BY price_bin""",
    "q05_conditional_agg" ->
      """SELECT o_orderpriority, n_orders, n_f, f_amount, avg_f_amount,
         round(CAST(n_f AS DOUBLE)/n_orders, 6) AS f_rate FROM (
           SELECT o_orderpriority, count(*) AS n_orders,
           count(CASE WHEN o_orderstatus='F' THEN 1 END) AS n_f,
           round(coalesce(sum(CASE WHEN o_orderstatus='F' THEN o_totalprice END),0),2) AS f_amount,
           round(coalesce(avg(CASE WHEN o_orderstatus='F' THEN o_totalprice END),0),4) AS avg_f_amount
           FROM orders GROUP BY o_orderpriority)
         ORDER BY o_orderpriority""",
    "q06_having" ->
      """SELECT o_custkey, count(*) AS n, round(sum(o_totalprice),2) AS total
         FROM orders GROUP BY o_custkey HAVING count(*) > 15
         ORDER BY n DESC, o_custkey""",
    "q07_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice),2) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q08_revenue_by_nation" ->
      """SELECT n_name, round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q09_left_join" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
         round(coalesce(sum(o_totalprice),0),2) AS total
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name ORDER BY c_custkey""",
    "q10_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
         ORDER BY c_custkey""",
    "q11_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "q12_distinct_dedup" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
         ORDER BY c_nationkey, c_mktsegment""",
    "q13_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
         ORDER BY nationkey""",
    "q14_window_topn" ->
      """SELECT c_nationkey, rn, o_orderkey, o_totalprice FROM (
           SELECT c_nationkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER (PARTITION BY c_nationkey
             ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
           FROM orders JOIN customer ON o_custkey = c_custkey)
         WHERE rn <= 3 ORDER BY c_nationkey, rn""",
    "q15_date_dim" ->
      """SELECT DISTINCT strftime(o_orderdate, '%Y%m%d') AS time_key,
         CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS year,
         CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS month,
         CAST(quarter(o_orderdate) AS INTEGER) AS quarter,
         CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS day,
         CAST(weekofyear(o_orderdate) AS INTEGER) AS week_of_year,
         CAST(EXTRACT(dow FROM o_orderdate) + 1 AS INTEGER) AS day_of_week,
         dayname(o_orderdate) AS day_name,
         monthname(o_orderdate) AS month_name,
         CAST(CASE WHEN EXTRACT(dow FROM o_orderdate) IN (0,6) THEN 1 ELSE 0 END AS INTEGER) AS is_weekend
         FROM orders ORDER BY time_key""",
    "q16_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_upper,
         CAST(length(p_name) AS INTEGER) AS name_len,
         substring(p_type, 1, 5) AS type_prefix,
         concat_ws('|', p_brand, p_type) AS brand_type,
         md5(p_name || '#' || p_brand) AS part_hash
         FROM part ORDER BY p_partkey""",
    "q17_json_extract" ->
      """SELECT event_type, count(*) AS n,
         round(avg(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER)), 4) AS avg_k,
         max(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q18_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_ts, event_type, count(*) AS n,
         round(sum(value),2) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""",
    "q19_sessionize" ->
      """SELECT user_id, count(*) AS n_events,
         count(CASE WHEN gap_us > 1800000000 OR gap_us IS NULL THEN 1 END) AS n_sessions
         FROM (SELECT user_id,
           datediff('microsecond', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_us
           FROM events)
         GROUP BY user_id ORDER BY user_id""",
    "q20_risk_cube" ->
      """SELECT CAST(value > 100 AS INTEGER) AS is_high_value,
         CAST(event_type = 'error' AS INTEGER) AS is_error,
         CAST(EXTRACT(hour FROM ts) >= 23 OR EXTRACT(hour FROM ts) <= 5 AS INTEGER) AS is_late_night,
         count(*) AS n
         FROM events GROUP BY 1, 2, 3 ORDER BY is_high_value, is_error, is_late_night""",
    "q21_rule_score" ->
      """SELECT tier, count(*) AS n, round(avg(score), 4) AS avg_score FROM (
           SELECT CASE WHEN score > 0.7 THEN 'HIGH' WHEN score > 0.4 THEN 'MEDIUM' ELSE 'LOW' END AS tier, score
           FROM (SELECT round(
             (CASE WHEN value > 400 THEN 0.3 ELSE 0.0 END) +
             (CASE WHEN event_type = 'error' THEN 0.25 ELSE 0.0 END) +
             (CASE WHEN EXTRACT(hour FROM ts) >= 23 OR EXTRACT(hour FROM ts) <= 5 THEN 0.15 ELSE 0.0 END) +
             (CASE WHEN value > 250 THEN 0.2 ELSE 0.0 END) +
             (CASE WHEN EXTRACT(dow FROM ts) IN (0,6) THEN 0.1 ELSE 0.0 END), 2) AS score
             FROM events))
         GROUP BY tier ORDER BY tier""",
    "q22_feature_engineering" ->
      """SELECT event_id,
         CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
         CAST(EXTRACT(dow FROM ts) + 1 AS INTEGER) AS day_of_week,
         CAST(EXTRACT(dow FROM ts) IN (0,6) AS INTEGER) AS is_weekend,
         round(sin(EXTRACT(hour FROM ts) * 2.0 * 3.141592653589793 / 24), 6) + 0.0 AS hour_sin,
         round(cos(EXTRACT(hour FROM ts) * 2.0 * 3.141592653589793 / 24), 6) + 0.0 AS hour_cos,
         round(CASE WHEN value > 0 THEN ln(1 + value) ELSE 0.0 END, 6) + 0.0 AS log_value,
         CAST(value = 0 AS INTEGER) AS is_zero,
         CAST(value > 250 AS INTEGER) AS is_high,
         CASE WHEN value < 10 THEN 1 WHEN value < 50 THEN 2 WHEN value < 100 THEN 3
           WHEN value < 250 THEN 4 ELSE 5 END AS value_bin
         FROM events ORDER BY event_id""",
    "q23_haversine" ->
      """SELECT c_custkey, round(
           2 * 6371.0 * asin(sqrt(
             pow(sin(radians(lat2 - lat1) / 2), 2) +
             cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2))), 3) AS distance_km
         FROM (SELECT c_custkey,
           CAST(c_custkey % 90 - 45 AS DOUBLE) AS lat1,
           CAST(c_custkey % 360 - 180 AS DOUBLE) AS lon1,
           CAST((c_custkey * 7) % 90 - 45 AS DOUBLE) AS lat2,
           CAST((c_custkey * 13) % 360 - 180 AS DOUBLE) AS lon2
           FROM customer)
         ORDER BY c_custkey""",
    "q25_cube" ->
      """SELECT coalesce(event_type, '<all>') AS event_type,
         coalesce(CAST(is_high AS VARCHAR), '<all>') AS is_high, n, total_value
         FROM (
           SELECT event_type, CAST(value > 250 AS INTEGER) AS is_high,
             count(*) AS n, round(sum(value), 2) AS total_value
           FROM events GROUP BY CUBE (event_type, CAST(value > 250 AS INTEGER)))
         ORDER BY event_type, is_high""",
    "q26_rollup" ->
      """SELECT coalesce(CAST(y AS VARCHAR), '<all>') AS y,
         coalesce(CAST(m AS VARCHAR), '<all>') AS m, n, total
         FROM (
           SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
             CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
             count(*) AS n, round(sum(o_totalprice), 2) AS total
           FROM orders GROUP BY ROLLUP (1, 2))
         ORDER BY y, m""",
    "q27_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
         INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""",
    "q28_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
         EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""",
    "q29_pivot" ->
      """SELECT CAST(EXTRACT(day FROM ts) AS INTEGER) AS day,
         count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
         count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
         count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
         count(CASE WHEN event_type = 'view' THEN 1 END) AS view
         FROM events GROUP BY 1 ORDER BY day""",
    "q24_hwm_incremental" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice),2) AS total
         FROM orders
         WHERE o_orderdate >= (SELECT max(o_orderdate) FROM orders) - INTERVAL 90 DAY
         GROUP BY o_orderstatus ORDER BY o_orderstatus"""
  )
}
