package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, SkewJoin}

class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  lazy val left = Seq(
    (1L, ts("2024-01-01 10:00:00"), "L1"),
    (1L, ts("2024-01-01 12:00:00"), "L2"),
    (2L, ts("2024-01-01 09:00:00"), "L3"), // before any right row
    (3L, ts("2024-01-01 10:30:00"), "L4")  // key with no right rows at all
  ).toDF("k", "ts", "tag")

  lazy val right = Seq(
    (1L, ts("2024-01-01 09:00:00"), 10.0),
    (1L, ts("2024-01-01 10:00:00"), 20.0), // equal ts -> inclusive match
    (1L, ts("2024-01-01 11:00:00"), 30.0),
    (2L, ts("2024-01-01 11:30:00"), 40.0)
  ).toDF("k", "ts", "v")

  test("as-of join picks the latest right row at or before each left ts") {
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getAs[String]("tag") ->
        (Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble))).toMap
    assert(out("L1") == Some(20.0)) // inclusive: right at equal ts wins
    assert(out("L2") == Some(30.0))
    assert(out("L3") == None)       // earliest right row is later
    assert(out("L4") == None)       // key absent on right
  }

  test("all left rows survive (left join semantics)") {
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "ts", "ts", Seq("v"))
    assert(out.count() == left.count())
  }

  test("tolerance bounds the lookback window") {
    val out = AsOfJoin.leftAsOfWithin(left, right, Seq("k"), "ts", "ts", Seq("v"),
        toleranceMs = 30 * 60 * 1000L) // 30 minutes
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble)).toMap
    assert(out("L1") == Some(20.0)) // 0 minutes back
    assert(out("L2") == None)       // nearest is 60 minutes back > tolerance
  }

  test("as-of join runs with one shuffle (single Exchange on the key)") {
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "ts", "ts", Seq("v"))
    out.count() // finalize the adaptive plan
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges in:\n$plan")
  }

  test("salted join equals the plain join bit for bit") {
    val orders = graft.runtime.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val customer = graft.runtime.Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val salted = SkewJoin.saltedEquiJoin(orders, customer, Seq("o_custkey"), "o_orderkey", 8)
      .groupBy("c_mktsegment").agg(F.count(F.lit(1)).as("n"))
      .orderBy("c_mktsegment").collect()
    val plain = orders.join(customer, "o_custkey")
      .groupBy("c_mktsegment").agg(F.count(F.lit(1)).as("n"))
      .orderBy("c_mktsegment").collect()
    assert(salted.toSeq == plain.toSeq)
  }
}
