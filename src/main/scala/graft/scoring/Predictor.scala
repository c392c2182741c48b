package graft.scoring

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.Debezium
import graft.ml.ModelRegistry
import graft.streaming.ScoringStream

/** Single-transaction, low-latency scoring — the engine analog of the
  * reference's `POST /predict/raw`
  * (`services/fraud-detection-api/app/main.py:386-414`), which scores ONE
  * raw transaction synchronously. The engine's standing scoring leg is
  * micro-batch ([[graft.streaming.ScoringStream]], 10 s trigger); this
  * entry point serves the "score this transaction NOW" case without a
  * streaming query.
  *
  * Identical semantics by construction: the row runs through the SAME
  * kernel as the streaming path ([[ScoringStream.scoreBatch]] — Debezium
  * parse → silver features → Production model or rule fallback), so a
  * prediction served here equals what the stream would emit for the same
  * envelope (PredictorSpec asserts this field-for-field).
  *
  * Latency: the 1-row plan is narrow operators on one local partition —
  * no shuffle, no per-row HTTP round-trip (the reference pays Spark →
  * HTTP → FastAPI → Postgres per row). Re-running Catalyst
  * analysis/optimization per call costs ~140 ms on this plan (~100
  * nodes), so [[predictEnvelope]] serves through a PREPARED plan — the
  * prepared-statement pattern: the full parse→features→score pipeline is
  * planned ONCE at construction over a placeholder row (in a child
  * session that excludes `ConvertToLocalRelation`, which would otherwise
  * constant-fold the placeholder THROUGH the plan and leave no leaf to
  * swap), and each call substitutes the envelope into the
  * `LocalTableScanExec` leaf and `executeCollect`s the already-compiled
  * physical plan — per-call work is one generated-code pass over one
  * row. Identical semantics: it is the SAME plan `scoreBatch` builds,
  * merely planned once (PredictorSpec asserts stream parity and
  * fast≡slow equality). Falls back to per-call planning if the plan
  * shape is not the expected single-local-leaf narrow pipeline (e.g. a
  * future model stage introducing an exchange). Construct ONE Predictor
  * per process and reuse it — registry/model load AND planning happen
  * once, at construction.
  */
final class Predictor(spark: SparkSession, model: Option[(PipelineModel, String)]) {

  import org.apache.spark.sql.execution.LocalTableScanExec

  // child session: same context/catalog, private conf — the exclusion
  // must not leak into the caller's session-wide optimizer
  private val serving: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    // whole-stage codegen REGENERATES its fused source on every
    // doExecute (the compile is cached, the source emission is not —
    // measured ~40 ms/call on this ~100-expression plan); per-operator
    // mode uses cached UnsafeProjections instead, and an interpreted-
    // pipeline pass over ONE row is microseconds. Same expressions,
    // same results — only the execution mode of this private session
    // changes.
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    s
  }

  // the prepared physical plan + output-field indices, or None when the
  // shape is not swappable (fallback path stays correct, just slower).
  // A construction failure is ~13× per-call latency (10.9 ms → ~140 ms),
  // so it must never be silent: both the unexpected-shape and the thrown
  // cases log loudly once, here, and fastPathActive exposes the state to
  // the serving artifact (StreamBench stamps `predict_fast_path`).
  // `spark.graft.serving.disableFastPath=true` forces the slow path —
  // the test hook PredictorSpec uses to pin the warning + flag.
  private val prepared = {
    import serving.implicits._
    if (spark.conf.getOption(Predictor.DisableFastPathKey).contains("true")) {
      System.err.println(s"[predictor] WARNING fast path disabled by " +
        s"${Predictor.DisableFastPathKey} — serving via per-call planning (~13x slower)")
      None
    } else try {
      val df = ScoringStream.scoreBatch(
        Debezium.parse(Seq("{}").toDF("json_string")), existing = None, model)
      val plan = df.queryExecution.executedPlan
      val leaves = plan.collect { case l: LocalTableScanExec => l }
      if (leaves.size == 1) {
        val s = df.schema
        Some((plan, s.fieldIndex("trans_num"), s.fieldIndex("prediction_score"),
          s.fieldIndex("is_fraud_predicted"), s.fieldIndex("risk_level"),
          s.fieldIndex("model_version")))
      } else {
        System.err.println(s"[predictor] WARNING prepared-plan construction found " +
          s"${leaves.size} local leaves (expected 1) — serving via per-call " +
          "planning (~13x slower). A model stage likely introduced an exchange.")
        None
      }
    } catch { case t: Throwable =>
      System.err.println(s"[predictor] WARNING prepared-plan construction failed " +
        s"(${t.getClass.getSimpleName}: ${t.getMessage}) — serving via per-call " +
        "planning (~13x slower)")
      None
    }
  }

  /** True when serving goes through the prepared plan (diagnostics;
    * stamped into `docs/BENCH_STREAM.json` as `predict_fast_path`).
    */
  private[graft] def fastPathActive: Boolean = prepared.nonEmpty

  // per-call localCollect fallbacks since construction; the first one
  // logs the transition (a repeated per-call warning would flood a
  // serving loop at thousands of calls/s)
  private val localCollectFallbacks = new java.util.concurrent.atomic.AtomicLong
  private[graft] def slowCollects: Long = localCollectFallbacks.get

  /** Score one Debezium envelope line (the CDC wire format). Returns
    * None for a tombstone (`{"after": null}` — nothing to score).
    */
  def predictEnvelope(json: String): Option[Predictor.Prediction] = prepared match {
    case Some((plan, iTrans, iScore, iPred, iRisk, iVer)) =>
      val row = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(json))
      val swapped = plan.transformUp {
        case l: LocalTableScanExec => l.copy(rows = Seq(row))
      }
      // driver-local single-partition execution skips the ~25–40 ms
      // DAGScheduler round-trip; executeCollect is the correctness
      // fallback if the plan stops being narrow
      val collected =
        try org.apache.spark.sql.graft.PlanServe.localCollect(swapped)
        catch { case t: Throwable =>
          if (localCollectFallbacks.getAndIncrement() == 0L)
            System.err.println(s"[predictor] WARNING driver-local collect fell " +
              s"back to executeCollect (${t.getClass.getSimpleName}: " +
              s"${t.getMessage}) — plan no longer narrow? Further fallbacks " +
              "counted silently (slowCollects).")
          swapped.executeCollect()
        }
      collected.headOption.map { r =>
        Predictor.Prediction(
          if (r.isNullAt(iTrans)) null else r.getUTF8String(iTrans).toString,
          r.getDouble(iScore),
          r.getInt(iPred),
          if (r.isNullAt(iRisk)) null else r.getUTF8String(iRisk).toString,
          if (r.isNullAt(iVer)) null else r.getUTF8String(iVer).toString)
      }
    case None =>
      import spark.implicits._
      predictParsed(Debezium.parse(Seq(json).toDF("json_string")))
  }

  /** Score an already-parsed (Debezium-shaped) frame and return the first
    * prediction; the collect is the serving boundary, one row by contract.
    */
  def predictParsed(parsed: DataFrame): Option[Predictor.Prediction] =
    ScoringStream.scoreBatch(parsed, existing = None, model)
      .collect().headOption.map { r =>
        Predictor.Prediction(
          r.getAs[String]("trans_num"),
          r.getAs[Double]("prediction_score"),
          r.getAs[Int]("is_fraud_predicted"),
          r.getAs[String]("risk_level"),
          r.getAs[String]("model_version"))
      }
}

object Predictor {

  /** Session-conf key forcing the per-call-planning slow path — the test
    * hook for pinning the fallback warning and `fastPathActive=false`.
    */
  private[graft] val DisableFastPathKey = "spark.graft.serving.disableFastPath"

  /** One served prediction — the `fraud_predictions` row minus the
    * write-time timestamp.
    */
  final case class Prediction(
      transNum: String,
      predictionScore: Double,
      isFraudPredicted: Int,
      riskLevel: String,
      modelVersion: String)

  /** The reference topology: current Production model from the registry,
    * rule-model fallback when nothing has been promoted yet
    * (`main.py:386-393` + the rule path at `main.py:603-621`).
    */
  def fromRegistry(spark: SparkSession, modelRoot: String,
      modelName: String = "fraud_detection_rf"): Predictor =
    new Predictor(spark, ModelRegistry.loadProduction(spark, modelRoot, modelName))

  /** Rule-model-only predictor (no artifact needed). */
  def ruleOnly(spark: SparkSession): Predictor = new Predictor(spark, None)
}
