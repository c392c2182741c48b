package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Debezium
import graft.layers.{Gold, Hwm, Silver}
import graft.scoring.RuleModel
import graft.views.GoldViews

/** End-to-end medallion pipeline over generated Debezium fixtures:
  * bronze parse → silver features → gold star schema → 9 views →
  * rule-based scoring, incl. incremental (HWM) reruns.
  */
class LakehouseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  lazy val work = TestFixtures.tmpDir("lakehouse")
  lazy val inputDir = {
    val lines = TestFixtures.randomRows(300) ++ TestFixtures.smokeRows :+ TestFixtures.tombstone
    TestFixtures.writeEnvelopes(work.resolve("cdc"), "batch1.jsonl", lines)
  }

  lazy val bronze: DataFrame = {
    val raw = spark.read.text(inputDir.toString).withColumnRenamed("value", "json_string")
    val df = Debezium.withBronzeColumns(Debezium.parse(raw))
    df.write.mode("overwrite").partitionBy("year", "month", "day")
      .parquet(work.resolve("bronze").toString)
    spark.read.parquet(work.resolve("bronze").toString)
  }

  lazy val silver: DataFrame = {
    val df = Silver.transform(bronze, None)
    Silver.write(df, work.resolve("silver").toString)
    Silver.read(spark, work.resolve("silver").toString)
  }

  lazy val gold: Map[String, DataFrame] = {
    val base = work.resolve("gold").toString
    Gold.write(Gold.build(silver), base, batchId = Some(0L))
    // a replayed run id is a no-op, not five duplicated tables
    Gold.write(Gold.build(silver), base, batchId = Some(0L))
    Gold.build(silver).keys.map { name =>
      name -> Gold.read(spark, base, name).getOrElse(fail(s"no committed $name"))
    }.toMap
  }

  test("bronze: tombstones dropped, envelope decoded, partitions derived") {
    assert(bronze.count() == 304) // 300 random + 4 smoke, tombstone gone
    val r = bronze.filter(F.col("trans_num") === "RT_HIGH_0001").head()
    assert(r.getAs[java.sql.Timestamp]("trans_timestamp").toString.startsWith("2024-03-02 23:30"))
    assert(r.getAs[java.sql.Date]("dob").toString == "1980-05-01")
    assert(r.getAs[Int]("is_fraud") == 1)
    assert(r.getAs[Int]("year") == 2024 && r.getAs[Int]("month") == 3)
  }

  test("silver: feature contract on known rows") {
    val high = silver.filter(F.col("trans_num") === "RT_HIGH_0001").head()
    val d = high.getAs[Double]("distance_km")
    assert(d > 3800 && d < 4600, s"NYC->CA distance was $d") // ~4100 km
    assert(high.getAs[Int]("is_high_amount") == 1)
    assert(high.getAs[Int]("amount_bin") == 5)
    assert(high.getAs[Int]("is_late_night") == 1)
    assert(high.getAs[Int]("is_weekend") == 1) // Saturday
    assert(high.getAs[Int]("is_distant_transaction") == 1)

    val zero = silver.filter(F.col("is_zero_amount") === 1)
    assert(zero.count() == 1)
    assert(zero.head().getAs[Double]("log_amount") == 0.0)

    // null coords → delta terms zeroed (silver_job.py:37-40); never -1
    val nullCoord = silver.filter(F.col("lat").isNull)
    assert(nullCoord.count() == 1)
  }

  test("silver: amount_bin boundaries (canonical cut-points 10/50/100/500)") {
    import spark.implicits._
    val df = Seq(9.99, 10.0, 49.99, 50.0, 99.99, 100.0, 499.99, 500.0)
      .toDF("amt")
      .select(graft.functions.FraudFeatures.amountBin(F.col("amt")).as("bin"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 2, 3, 3, 4, 4, 5))
  }

  test("gold: star schema keys and dedup") {
    assert(gold("fact_transactions").count() == 304)
    val custKeys = gold("dim_customer").select("customer_key").collect().map(_.getLong(0))
    assert(custKeys.distinct.length == custKeys.length, "dim_customer has dup keys")
    val timeKeys = gold("dim_time").select("time_key").collect().map(_.getString(0))
    assert(timeKeys.distinct.length == timeKeys.length)
    assert(gold("dim_merchant").count() ==
      silver.select("merchant", "merch_lat", "merch_long").distinct().count())
    // fact joins back to dims completely (no orphan keys)
    val orphans = gold("fact_transactions")
      .join(gold("dim_customer"), Seq("customer_key"), "left_anti").count()
    assert(orphans == 0)
  }

  test("9 gold views compute with correct fraud accounting") {
    GoldViews.registerAll(spark, gold)
    val total = spark.sql("SELECT SUM(total_transactions) s FROM daily_summary").head().getLong(0)
    assert(total == 304)
    val fraudFromView = spark.sql("SELECT SUM(fraud_transactions) s FROM daily_summary").head().getLong(0)
    val fraudTrue = silver.filter(F.col("is_fraud") === 1).count()
    assert(fraudFromView == fraudTrue)
    // every view is queryable
    GoldViews.definitions.keys.foreach { v =>
      val n = spark.sql(s"SELECT * FROM $v").count()
      assert(n >= 0, s"view $v failed")
    }
    val rate = spark.sql("SELECT fraud_rate FROM category_summary ORDER BY fraud_rate DESC LIMIT 1")
      .head().getDouble(0)
    assert(rate >= 0.0 && rate <= 1.0)
  }

  test("rule model: smoke transactions land on the expected ladder") {
    val preds = RuleModel.predict(silver)
      .filter(F.col("trans_num").startsWith("RT_"))
      .collect().map(r => r.getAs[String]("trans_num") ->
        (r.getAs[Double]("prediction_score"), r.getAs[Int]("is_fraud_predicted"),
          r.getAs[String]("risk_level"))).toMap
    assert(preds("RT_HIGH_0001") == ((1.0, 1, "HIGH")))
    assert(preds("RT_MEDIUM_0001") == ((0.45, 0, "MEDIUM")))
    assert(preds("RT_LOW_0001") == ((0.0, 0, "LOW")))
    assert(preds("RT_NORMAL_0001") == ((0.0, 0, "LOW")))
  }

  test("all 18 dashboard chart queries run over the star schema") {
    GoldViews.registerAll(spark, gold)
    RuleModel.predict(silver).createOrReplaceTempView("fraud_predictions")
    graft.views.DashboardQueries.all.keys.foreach { name =>
      val df = graft.views.DashboardQueries.run(spark, name)
      assert(df.columns.nonEmpty, s"$name produced no columns")
      df.collect() // must execute
    }
    val overview = graft.views.DashboardQueries.run(spark, "c1_1_overview").head()
    assert(overview.getAs[Long]("total_transactions") == 304)
    val acc = graft.views.DashboardQueries.run(spark, "c8_1_model_accuracy").head()
      .getAs[Double]("accuracy")
    assert(acc >= 0 && acc <= 100)
    val grid = graft.views.DashboardQueries.run(spark, "c10_1_multi_factor_risk").collect()
    assert(grid.length <= 8 && grid.map(_.getAs[Long]("total")).sum == 304)
  }

  test("incremental: HWM slices only new rows; dims dedup across runs") {
    // second batch strictly later than batch 1 (days 20-29 of March)
    val batch2 = TestFixtures.randomRows(80, seed = 99L, startDay = 20)
    val dir2 = TestFixtures.writeEnvelopes(work.resolve("cdc2"), "batch2.jsonl", batch2)
    val raw2 = spark.read.text(dir2.toString).withColumnRenamed("value", "json_string")
    val bronze2 = Debezium.withBronzeColumns(Debezium.parse(raw2))
    bronze2.write.mode("append").partitionBy("year", "month", "day")
      .parquet(work.resolve("bronze").toString)

    val allBronze = spark.read.parquet(work.resolve("bronze").toString)
    val existingSilver = Hwm.readIfExists(spark, work.resolve("silver").toString)
    val slice = Silver.transform(allBronze, existingSilver)
    val sliceCount = slice.count()
    assert(sliceCount == 80, s"expected only batch-2 rows, got $sliceCount")

    // gold incremental with anti-join dedup: re-processing the SAME rows
    // yields zero new dim_customer members
    val existing = (t: String) => Some(gold(t)).filter(_ => t.startsWith("dim"))
    val inc = Gold.build(silver, existing, dedupAgainstExisting = true)
    assert(inc("dim_customer").count() == 0)
    assert(inc("dim_time").count() == 0)
    // reference-faithful mode accumulates duplicates instead
    val faithful = Gold.build(silver, existing, dedupAgainstExisting = false)
    assert(faithful("dim_customer").count() > 0)
  }
}
