package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.operators.{AsOfJoin, SkewJoin}
import graft.runtime.Tables

/** Operators beyond the reference's surface that a native engine would
  * ship: point-in-time (as-of) join and explicit skew salting. Both are
  * oracle-checked — the as-of against DuckDB's native ASOF JOIN, the
  * salted join against the plain join it must be indistinguishable from.
  */
object AdvancedQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // For every error event: the user's most recent purchase at or before
    // the error (the feature-store "latest prior signal" lookup).
    "qa01_asof_join" -> ((s, d) => {
      val e = CoreQueries.events(s, d)
      val errors = e.filter(F.col("event_type") === "error")
        .select("user_id", "event_id", "ts", "value")
      val purchases = e.filter(F.col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      AsOfJoin.leftAsOf(errors, purchases, Seq("user_id"), "ts", "ts", Seq("value"))
        .select(
          F.col("event_id"), F.col("user_id"), F.col("ts"), F.col("value"),
          F.col("asof_ts"), F.col("asof_value"))
        .orderBy("event_id")
    }),

    // Per-key top-k via the custom TypedImperativeAggregate: bounded
    // k-heaps reduced map-side BEFORE the shuffle — must equal the
    // window row_number formulation (q14's oracle).
    "qa03_topk_aggregate" -> ((s, d) => {
      graft.plans.GraftFunctions.register(s)
      Tables.load(s, d, "orders")
        .join(F.broadcast(Tables.load(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(F.call_function("topk_rows",
          F.struct(F.col("o_totalprice"), F.col("o_orderkey")), F.lit(3)).as("top"))
        .select(F.col("c_nationkey"), F.posexplode(F.col("top")))
        .select(
          F.col("c_nationkey"),
          (F.col("pos") + 1).cast("int").as("rn"),
          F.col("col.o_orderkey").as("o_orderkey"),
          F.col("col.o_totalprice").as("o_totalprice"))
        .orderBy("c_nationkey", "rn")
    }),

    // Custom band-join operator (LogicalPlan+Strategy+SparkPlan): error
    // events paired with same-user purchases within ±10 minutes.
    "qa04_band_join" -> ((s, d) => {
      val e = CoreQueries.events(s, d)
      val errors = e.filter(F.col("event_type") === "error")
        .select(F.col("user_id"), F.col("event_id").as("e_id"), F.col("ts").as("e_ts"))
      val purchases = e.filter(F.col("event_type") === "purchase")
        .select(F.col("user_id").as("r_user_id"), F.col("event_id").as("p_id"),
          F.col("ts").as("p_ts"))
      graft.plans.BandJoin.join(errors, purchases,
          "user_id", "r_user_id", "e_ts", "p_ts", bandUs = 10L * 60 * 1000000)
        .select("e_id", "p_id", "user_id", "e_ts", "p_ts")
        .orderBy("e_id", "p_id")
    }),

    // Constraint-check gate: referential integrity, PK uniqueness, and a
    // range expectation, summarized as one row per check in one job.
    "qa05_integrity_checks" -> ((s, d) => {
      import graft.operators.DataQuality
      val customer = Tables.load(s, d, "customer")
      val orders = Tables.load(s, d, "orders")
      val lineitem = Tables.load(s, d, "lineitem")
      DataQuality.violationCounts(Seq(
        "dup_custkey" -> DataQuality.duplicateKeys(customer, Seq("c_custkey")),
        "orphan_lineitems" -> DataQuality.fkViolations(lineitem, "l_orderkey", orders, "o_orderkey"),
        "orphan_orders" -> DataQuality.fkViolations(orders, "o_custkey", customer, "c_custkey"),
        "qty_range_1_45" -> DataQuality.rangeViolations(lineitem, "l_quantity", 1, 45)))
        .orderBy("check_name")
    }),

    // Salted fact⋈dim join — must produce exactly the plain-join rollup.
    "qa02_salted_join" -> ((s, d) => {
      val orders = Tables.load(s, d, "orders")
      val customer = Tables.load(s, d, "customer")
        .withColumnRenamed("c_custkey", "o_custkey")
      SkewJoin.saltedEquiJoin(orders, customer, Seq("o_custkey"), "o_orderkey", 8)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).as("n_orders"),
          F.round(F.sum("o_totalprice"), 2).as("revenue"))
        .orderBy("c_mktsegment")
    })
  )

  def oracle: Map[String, String] = Map(
    "qa01_asof_join" ->
      """SELECT a.event_id, a.user_id, a.ts, a.value, b.ts AS asof_ts, b.value AS asof_value
         FROM (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'error') a
         ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') b
           ON a.user_id = b.user_id AND a.ts >= b.ts
         ORDER BY a.event_id""",
    "qa03_topk_aggregate" ->
      """SELECT c_nationkey, rn, o_orderkey, o_totalprice FROM (
           SELECT c_nationkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER (PARTITION BY c_nationkey
             ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
           FROM orders JOIN customer ON o_custkey = c_custkey)
         WHERE rn <= 3 ORDER BY c_nationkey, rn""",
    "qa04_band_join" ->
      """SELECT a.event_id AS e_id, b.event_id AS p_id, a.user_id,
         a.ts AS e_ts, b.ts AS p_ts
         FROM events a JOIN events b
           ON a.user_id = b.user_id
          AND a.event_type = 'error' AND b.event_type = 'purchase'
          AND b.ts BETWEEN a.ts - INTERVAL 10 MINUTE AND a.ts + INTERVAL 10 MINUTE
         ORDER BY e_id, p_id""",
    "qa02_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "qa05_integrity_checks" ->
      """SELECT 'dup_custkey' AS check_name, count(*) AS n_violations
           FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING count(*) > 1)
         UNION ALL
         SELECT 'orphan_lineitems', count(*) FROM lineitem l
           WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
         UNION ALL
         SELECT 'orphan_orders', count(*) FROM orders o
           WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
         UNION ALL
         SELECT 'qty_range_1_45', count(*) FROM lineitem
           WHERE l_quantity < 1 OR l_quantity > 45
         ORDER BY check_name"""
  )
}
