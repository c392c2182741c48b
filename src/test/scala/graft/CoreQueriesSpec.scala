package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CoreQueries

class CoreQueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("every query has a matching oracle entry or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries are allowed, but must be a deliberate, small set
    assert(missing.forall(n => n.contains("_ro_")), s"un-oracled: $missing")
    // and no oracle may point at a query that doesn't exist (silent no-op)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("data-quality profile: nulls, class distribution, contract check") {
    import graft.operators.DataQuality
    val ev = graft.queries.CoreQueries.events(spark, sf)
    val nulls = DataQuality.nullProfile(ev).collect()
    assert(nulls.length == ev.columns.length)
    assert(nulls.forall(_.getAs[Long]("n_null") == 0L)) // synthetic events are dense
    val dist = DataQuality.classDistribution(ev, "event_type").collect()
    assert(math.abs(dist.map(_.getAs[Double]("fraction")).sum - 1.0) < 1e-6)
    assert(DataQuality.missingColumns(ev, Seq("ts", "value", "nope")) == Seq("nope"))
  }

  test("constraint checks count planted violations exactly") {
    import spark.implicits._
    import graft.operators.DataQuality
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq((10L, 1L), (11L, 2L), (12L, 99L), (13L, 98L)).toDF("id", "fk")
    val dups = Seq(1L, 1L, 2L).toDF("k")
    val vals = Seq(0.5, 1.0, 50.0, 51.0).toDF("v")
    val report = DataQuality.violationCounts(Seq(
      "orphans" -> DataQuality.fkViolations(child, "fk", parent, "pk"),
      "dup_k" -> DataQuality.duplicateKeys(dups, Seq("k")),
      "v_range" -> DataQuality.rangeViolations(vals, "v", 1.0, 50.0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report == Map("orphans" -> 2L, "dup_k" -> 1L, "v_range" -> 2L))
  }

  test("all queries run and return rows on sf0.001") {
    val empties = Seq("q10_anti_join") // legitimately small; may be empty at tiny SF
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      if (!empties.contains(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("haversine matches known NYC->LA distance (DEVELOPER_GUIDE.md:1246)") {
    import spark.implicits._
    val df = Seq((40.7128, -74.0060, 34.0522, -118.2437)).toDF("a", "b", "c", "d")
    val km = df.select(
      CoreQueries.haversineKm(col("a"), col("b"), col("c"), col("d")).as("km"))
      .head().getDouble(0)
    assert(km > 3900 && km < 4000, s"NYC->LA was $km")
  }

  test("haversine is symmetric and zero at identical points") {
    import spark.implicits._
    val df = Seq((48.85, 2.35, 40.71, -74.0)).toDF("a", "b", "c", "d")
    val fwd = df.select(CoreQueries.haversineKm(col("a"), col("b"), col("c"), col("d"))).head().getDouble(0)
    val bwd = df.select(CoreQueries.haversineKm(col("c"), col("d"), col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(fwd - bwd) < 1e-9)
    val zero = df.select(CoreQueries.haversineKm(col("a"), col("b"), col("a"), col("b"))).head().getDouble(0)
    assert(zero == 0.0)
  }

  test("top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = SparkEntry.queries("q03_topk_orders")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("broadcast joins are actually broadcast in q08") {
    val plan = SparkEntry.queries("q08_revenue_by_nation")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
