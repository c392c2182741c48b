package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BronzeStream, ScoringStream}
import graft.tools.AlertTail

/** The alert-delivery leg (§3.4 last hop): AlertTail follows the alert
  * log and renders the reference's Slack message shape
  * (`realtime_prediction_job.py:115-209`) over the 4-transaction smoke
  * golden set.
  */
class AlertTailSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  test("alert tail renders the reference message shape over the smoke set, once per alert") {
    val work = TestFixtures.tmpDir("alert-tail")
    val in = work.resolve("in")
    TestFixtures.writeEnvelopes(in, "smoke.jsonl", TestFixtures.smokeRows)

    // scoring leg writes the alert log; bronze leg is the enrichment side
    val preds = work.resolve("preds").toString
    val alerts = work.resolve("alerts").toString
    val bronze = work.resolve("bronze").toString
    val qb = BronzeStream.start(spark, in.toString, bronze, work.resolve("ckpt-b").toString)
    qb.processAllAvailable(); qb.stop()
    val qs = ScoringStream.start(spark, in.toString, preds, alerts,
      work.resolve("ckpt-s").toString)
    qs.processAllAvailable(); qs.stop()

    // only the HIGH smoke row crosses the fraud bar (score 1.0 > 0.5)
    assert(spark.read.parquet(alerts).count() == 1)

    val messages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val qt = AlertTail.follow(spark, alerts, bronze,
      work.resolve("ckpt-t").toString, sink = m => { messages.add(m); () })
    qt.processAllAvailable()

    assert(messages.size == 1, s"expected one delivery, got ${messages.size}")
    val m = messages.peek()
    // the reference's field set: emoji by risk, id, amount, customer,
    // merchant, probability, risk level, location
    Seq("🚨 FRAUD DETECTED", "🔴", "HIGH Risk", "`RT_HIGH_0001`", "$1850.00",
      "Test User", "fraud_TestMerchantA", "prob 100.0%", "New York, NY")
      .foreach(part => assert(m.contains(part), s"message missing '$part': $m"))

    // tail semantics: a new alert arriving later is delivered exactly
    // once, and the first alert is NOT re-delivered
    TestFixtures.writeEnvelopes(in, "late.jsonl", Seq(TestFixtures.envelope(
      java.time.LocalDateTime.of(2024, 3, 2, 23, 45, 0), 5555L,
      "fraud_TestMerchantE", "misc_net", 900.00, "M", "Boston", "MA", 2101,
      Some(42.36), Some(-71.05), 700000L, java.time.LocalDate.of(1970, 2, 2),
      "RT_HIGH_0002", Some(30.0), Some(-100.0), 1)))
    val qb2 = BronzeStream.start(spark, in.toString, bronze, work.resolve("ckpt-b").toString)
    qb2.processAllAvailable(); qb2.stop()
    val qs2 = ScoringStream.start(spark, in.toString, preds, alerts,
      work.resolve("ckpt-s").toString)
    qs2.processAllAvailable(); qs2.stop()
    qt.processAllAvailable(); qt.stop()

    assert(messages.size == 2, s"expected exactly two deliveries, got ${messages.size}")
    val all = messages.toArray.map(_.toString)
    assert(all.count(_.contains("RT_HIGH_0001")) == 1, "first alert re-delivered")
    assert(all.count(_.contains("RT_HIGH_0002")) == 1, "late alert not delivered once")
    assert(all.find(_.contains("RT_HIGH_0002")).get.contains("Boston, MA"))
  }

  test("render keeps an alert with no enrichment row, with real N/A fields, unshuffled") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    val ts = java.sql.Timestamp.valueOf("2024-03-02 23:59:00")
    val alerts = Seq(
      ("TX_MATCHED", 0.91, "HIGH", ts),
      ("TX_ORPHAN", 0.77, "MEDIUM", ts))
      .toDF("trans_num", "prediction_score", "risk_level", "prediction_time")
    val tx = Seq(("TX_MATCHED", 12.5, "Ada", "Lovelace", "m1", "London", "UK"))
      .toDF("trans_num", "amt", "first", "last", "merchant", "city", "state")
    val out = AlertTail.render(alerts, tx)
    val msgs = out.collect().map(r => r.getAs[String]("trans_num") ->
      r.getAs[String]("message")).toMap
    assert(msgs.keySet == Set("TX_MATCHED", "TX_ORPHAN"),
      "an alert without a transaction row must still be delivered")
    assert(msgs("TX_MATCHED").contains("$12.50"))
    assert(msgs("TX_MATCHED").contains("Ada Lovelace"))
    // the orphan renders genuine N/A — not "$null" (Formatter renders a
    // null arg as the string "null") and not an empty concat_ws
    val orphan = msgs("TX_ORPHAN")
    assert(orphan.contains("| N/A | N/A @ N/A"), s"N/A fallbacks missing: $orphan")
    assert(!orphan.contains("null"), s"null leaked into the render: $orphan")
    // plan shape: the tx side must reach the joins unshuffled — the only
    // allowed exchanges are the two alert-batch broadcasts
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("SortMergeJoin"),
      s"tx side fell back to a shuffled join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
  }
}
