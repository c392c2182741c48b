package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BandJoin
import graft.queries.CoreQueries

class BandJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  def sides = {
    val e = CoreQueries.events(spark, sf)
    val errors = e.filter(F.col("event_type") === "error")
      .select(F.col("user_id"), F.col("event_id").as("e_id"), F.col("ts").as("e_ts"))
    val purchases = e.filter(F.col("event_type") === "purchase")
      .select(F.col("user_id").as("r_user_id"), F.col("event_id").as("p_id"),
        F.col("ts").as("p_ts"))
    (errors, purchases)
  }

  test("band join matches the Catalyst range-condition join exactly") {
    val (errors, purchases) = sides
    val band = 10L * 60 * 1000000
    val custom = BandJoin.join(errors, purchases, "user_id", "r_user_id", "e_ts", "p_ts", band)
      .select("e_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val builtin = errors.join(purchases,
        F.col("user_id") === F.col("r_user_id") &&
          F.unix_micros(F.col("p_ts")).between(
            F.unix_micros(F.col("e_ts")) - band, F.unix_micros(F.col("e_ts")) + band))
      .select("e_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom.nonEmpty)
    assert(custom == builtin,
      s"missing=${(builtin -- custom).take(5)} extra=${(custom -- builtin).take(5)}")
  }

  test("the plan contains the custom exec node, not a nested-loop join") {
    val (errors, purchases) = sides
    val df = BandJoin.join(errors, purchases, "user_id", "r_user_id", "e_ts", "p_ts", 1000000L)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BandJoin"), plan) // exec node prints without the Exec suffix
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("empty right side yields no rows, not an error") {
    val (errors, purchases) = sides
    val none = purchases.filter(F.lit(false))
    val out = BandJoin.join(errors, none, "user_id", "r_user_id", "e_ts", "p_ts", 1000000L)
    assert(out.count() == 0)
  }
}
