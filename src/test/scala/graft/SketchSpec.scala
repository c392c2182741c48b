package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Sketch/approximate operators a 100 TB pipeline leans on (exact
  * distinct/quantiles stop being feasible): HLL approx_count_distinct,
  * percentile_approx, and their error bounds on known data.
  */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct tracks exact distinct within rsd") {
    val li = graft.runtime.Tables.load(spark, sf, "lineitem")
    val row = li.agg(
      F.countDistinct(F.col("l_orderkey")).as("exact"),
      F.approx_count_distinct(F.col("l_orderkey"), 0.02).as("approx")).head()
    val exact = row.getAs[Long]("exact").toDouble
    val approx = row.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx brackets the true median") {
    val o = graft.runtime.Tables.load(spark, sf, "orders")
    val approx = o.agg(F.percentile_approx(F.col("o_totalprice"), F.lit(0.5), F.lit(1000)))
      .head().getDouble(0)
    val sorted = o.select("o_totalprice").orderBy("o_totalprice").collect().map(_.getDouble(0))
    val exact = sorted(sorted.length / 2)
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }

  test("approxQuantile relative-error contract holds per column") {
    val li = graft.runtime.Tables.load(spark, sf, "lineitem")
    val Array(q25, q75) = li.stat.approxQuantile("l_extendedprice", Array(0.25, 0.75), 0.01)
    assert(q25 < q75)
    val below = li.filter(F.col("l_extendedprice") <= q25).count().toDouble / li.count()
    assert(below > 0.23 && below < 0.27, s"p25 landed at $below")
  }
}
