package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Remaining source/operator surface from SURVEY §2.1/§2.4: CSV round-trip
  * (S10), JSON source, describe/summary (A10), sampling (U3/U4).
  */
class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  def orders = graft.runtime.Tables.load(spark, sf, "orders")

  test("Tables.load rescues unadjusted-MICROS timestamps under a foreign session") {
    // a session WITHOUT graft's inferTimestampNTZ=false conf (e.g. a
    // driver harness calling SparkEntry on its own SparkSession) would
    // scan the testdata's unadjusted MICROS as TIMESTAMP_NTZ; the
    // loader's fallback must still deliver TimestampType
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    for ((t, c) <- Seq("events" -> "ts", "orders" -> "o_orderdate", "lineitem" -> "l_shipdate")) {
      val df = graft.runtime.Tables.load(s2, sf, t)
      assert(df.schema(c).dataType == org.apache.spark.sql.types.TimestampType,
        s"$t.$c: ${df.schema(c).dataType}")
    }
    // and the NTZ-breaking function family runs
    graft.runtime.Tables.load(s2, sf, "events")
      .select(F.unix_micros(F.col("ts"))).head()
  }

  test("CSV round-trip preserves rows and schema-by-declaration") {
    val work = TestFixtures.tmpDir("csv")
    orders.write.mode("overwrite").option("header", "true")
      .csv(work.resolve("orders_csv").toString)
    val back = spark.read
      .option("header", "true")
      .schema(orders.schema) // declared, not inferred (SURVEY §1.3)
      .csv(work.resolve("orders_csv").toString)
    assert(back.count() == orders.count())
    assert(back.schema == orders.schema)
    val sum = back.agg(F.round(F.sum("o_totalprice"), 2)).head().getDouble(0)
    val expected = orders.agg(F.round(F.sum("o_totalprice"), 2)).head().getDouble(0)
    assert(sum == expected)
  }

  test("JSON source round-trip") {
    val work = TestFixtures.tmpDir("json")
    orders.limit(100).write.mode("overwrite").json(work.resolve("j").toString)
    val back = spark.read.schema(orders.schema).json(work.resolve("j").toString)
    assert(back.count() == 100)
  }

  test("ORC round-trip preserves rows, schema, and values") {
    // the third columnar format Spark ships built-in (beside parquet) —
    // included so a reference user migrating an ORC lake needs no new code
    val work = TestFixtures.tmpDir("orc")
    orders.write.mode("overwrite").orc(work.resolve("o").toString)
    val back = spark.read.orc(work.resolve("o").toString)
    assert(back.count() == orders.count())
    assert(back.schema == orders.schema)
    val sum = back.agg(F.round(F.sum("o_totalprice"), 2)).head().getDouble(0)
    val expected = orders.agg(F.round(F.sum("o_totalprice"), 2)).head().getDouble(0)
    assert(sum == expected)
  }

  test("describe/summary produce per-column statistics (A10)") {
    val d = orders.select("o_totalprice").describe().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d("count").toLong == orders.count())
    assert(d("min").toDouble <= d("max").toDouble)
    val s = orders.select("o_totalprice").summary("50%").head().getString(1).toDouble
    assert(s > d("min").toDouble && s < d("max").toDouble)
  }

  test("seeded sampling is deterministic (U3) and splits partition (U4)") {
    val s1 = orders.sample(withReplacement = false, 0.2, 42L).count()
    val s2 = orders.sample(withReplacement = false, 0.2, 42L).count()
    assert(s1 == s2)
    val Array(a, b) = orders.randomSplit(Array(0.8, 0.2), 42L)
    assert(a.count() + b.count() == orders.count())
  }

  test("schema-conflict probe write: append when compatible, overwrite on drift (S5)") {
    import graft.layers.SchemaEvolution
    val work = TestFixtures.tmpDir("schema-evo")
    val p = work.resolve("layer").toString
    val base = orders.limit(50)
    assert(SchemaEvolution.writeWithSchemaFallback(base, p) == "append")
    assert(SchemaEvolution.writeWithSchemaFallback(base, p) == "append")
    assert(spark.read.parquet(p).count() == 100)
    val drifted = base.withColumn("new_col", F.lit(1))
    assert(SchemaEvolution.writeWithSchemaFallback(drifted, p) == "overwrite")
    val after = spark.read.parquet(p)
    assert(after.count() == 50)
    assert(after.columns.contains("new_col"))
  }

  test("feature-variant contracts differ exactly where documented (§7.4(3))") {
    import graft.functions.FraudFeatures
    import spark.implicits._
    val df = Seq((150.0, "M", 60.0)).toDF("amt", "gender", "dist")
    val row = df.select(
      FraudFeatures.amountBin(F.col("amt")).as("bin_silver"),
      FraudFeatures.ApiVariant.amountBin(F.col("amt")).as("bin_api"),
      FraudFeatures.genderEncoded(F.col("gender")).as("g_silver"),
      FraudFeatures.ApiVariant.genderEncoded(F.col("gender")).as("g_api"),
      FraudFeatures.isDistantTransaction(F.col("dist")).as("d_silver"),
      FraudFeatures.ApiVariant.isDistantTransaction(F.col("dist")).as("d_api")).head()
    assert(row.getAs[Int]("bin_silver") == 4) // 150 < 500
    assert(row.getAs[Int]("bin_api") == 2)    // 150 < 300
    assert(row.getAs[Int]("g_silver") == 1 && row.getAs[Int]("g_api") == 0)
    assert(row.getAs[Int]("d_silver") == 0)   // 60 <= 100
    assert(row.getAs[Int]("d_api") == 1)      // 60 > 50
  }

  test("catalog registration makes tables queryable via spark.sql (S14)") {
    graft.runtime.Tables.registerAll(spark, sf)
    val n = spark.sql(
      """SELECT count(*) FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""")
      .head().getLong(0)
    assert(n == orders.count())
  }
}
