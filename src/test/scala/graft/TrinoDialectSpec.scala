package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Debezium
import graft.layers.{Gold, Silver}
import graft.scoring.RuleModel
import graft.views.{GoldViews, TrinoDialect}

/** Drop-in compatibility proof: the reference's OWN Trino view DDL and
  * dashboard SQL run against this engine after only catalog-prefix
  * stripping, and agree with our re-expressed views on the same data.
  */
class TrinoDialectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  val refViews = "/root/reference/sql/gold_layer_views_delta.sql"
  val refCharts = "/root/reference/sql/dashboard_charts.sql"

  lazy val ready: Unit = {
    val work = TestFixtures.tmpDir("trino")
    val lines = TestFixtures.randomRows(300) ++ TestFixtures.smokeRows
    val dir = TestFixtures.writeEnvelopes(work.resolve("cdc"), "b.jsonl", lines)
    val raw = spark.read.text(dir.toString).withColumnRenamed("value", "json_string")
    val silver = Silver.transform(Debezium.withBronzeColumns(Debezium.parse(raw)), None)
    silver.cache().count()
    Gold.build(silver).foreach { case (n, df) => df.createOrReplaceTempView(n) }
    silver.createOrReplaceTempView("transactions")
    RuleModel.predict(silver).createOrReplaceTempView("fraud_predictions")
  }

  test("extractViews survives semicolons inside string literals and comments") {
    val ddl =
      """CREATE OR REPLACE VIEW delta.gold.v1 AS
        |SELECT 'a;b' AS s, -- trailing; comment
        |       1 AS n;
        |CREATE OR REPLACE VIEW v2 AS SELECT 'it''s; fine' AS t;""".stripMargin
    val views = TrinoDialect.extractViews(ddl)
    assert(views.keySet == Set("v1", "v2"))
    assert(views("v1").contains("'a;b'") && views("v1").contains("1 AS n"),
      s"v1 truncated: ${views("v1")}")
    assert(views("v2").contains("'it''s; fine'"))
    ready
    assert(spark.sql(s"SELECT s FROM (${TrinoDialect.translate(views("v1"))})")
      .head().getString(0) == "a;b")
  }

  test("the reference's 9-view DDL registers and runs via the dialect shim") {
    assume(Files.exists(Paths.get(refViews)), "reference not mounted")
    ready
    val script = Files.readString(Paths.get(refViews))
    val names = TrinoDialect.registerScript(spark, script)
    assert(names.length == 9, s"expected 9 views, got $names")
    names.foreach { v =>
      val n = spark.sql(s"SELECT * FROM $v").count()
      assert(n >= 0, s"view $v failed")
    }
  }

  test("reference view SQL agrees with our re-expressed views on the same data") {
    assume(Files.exists(Paths.get(refViews)), "reference not mounted")
    ready
    val script = Files.readString(Paths.get(refViews))
    TrinoDialect.registerScript(spark, script) // reference definitions win the names
    // re-register ours under a prefix for comparison
    GoldViews.definitions.foreach { case (name, sql) =>
      spark.sql(s"CREATE OR REPLACE TEMP VIEW graft_$name AS $sql")
    }
    // merchant_analysis is excluded: its ORDER BY fraud_rate LIMIT 100 has
    // heavy ties on small fixtures, so the selected boundary rows are
    // legitimately plan-dependent
    Seq("daily_summary", "category_summary", "amount_summary", "hourly_summary",
      "state_summary", "fraud_patterns", "time_period_analysis")
      .foreach { v =>
        val ref = spark.table(v)
        val ours = spark.table(s"graft_$v")
        assert(ref.count() == ours.count(), s"$v row counts differ")
        val refFraud = ref.agg(F.sum(ref.columns.find(_.contains("fraud_transactions"))
          .orElse(ref.columns.find(_ == "fraud_count")).map(F.col)
          .getOrElse(F.lit(0)))).head().get(0)
        val ourFraud = ours.agg(F.sum(ours.columns.find(_.contains("fraud_transactions"))
          .orElse(ours.columns.find(_ == "fraud_count")).map(F.col)
          .getOrElse(F.lit(0)))).head().get(0)
        assert(refFraud == ourFraud, s"$v fraud accounting differs: $refFraud vs $ourFraud")
      }
  }

  test("reference dashboard chart SQL runs through the shim") {
    assume(Files.exists(Paths.get(refCharts)), "reference not mounted")
    ready
    val script = Files.readString(Paths.get(refCharts))
    // fact_transactions columns drive most charts; model charts need the
    // transactions + fraud_predictions views registered above
    val statements = script.split(";")
      .map(_.linesIterator.filterNot(_.trim.startsWith("--")).mkString("\n").trim)
      .filter(s => s.toUpperCase.startsWith("SELECT"))
    assert(statements.length >= 16, s"found only ${statements.length} chart queries")
    statements.foreach { sql =>
      val n = TrinoDialect.run(spark, sql).count()
      assert(n >= 0)
    }
  }
}
