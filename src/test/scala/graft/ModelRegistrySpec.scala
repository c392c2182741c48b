package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{FraudMl, ModelRegistry}
import graft.scoring.MlModel

/** Model persistence + promotion registry (`ml_training_job.py:330-393`):
  * versioned artifacts, stage transitions with auto-archive, metric-gated
  * promotion, and load-for-scoring round trips.
  */
class ModelRegistrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  lazy val silver = TestFixtures.plantedSilver(spark).cache()

  lazy val trained: (org.apache.spark.ml.PipelineModel, FraudMl.Metrics) = {
    val (model, metrics, _) = FraudMl.train(silver, algorithm = "lr")
    (model, metrics)
  }

  private def goodMetrics = FraudMl.Metrics(0.95, 0.95, 0.95, 0.95, 0.99, 0.94)
  private def badMetrics = FraudMl.Metrics(0.60, 0.60, 0.60, 0.60, 0.65, 0.55)

  test("register allocates sequential versions; promote archives the prior Production") {
    val root = TestFixtures.tmpDir("registry").toString
    val (model, _) = trained
    val v1 = ModelRegistry.register(spark, root, "m", model, goodMetrics)
    val v2 = ModelRegistry.register(spark, root, "m", model, goodMetrics)
    assert(v1 == 1 && v2 == 2)

    ModelRegistry.promote(spark, root, "m", v1)
    assert(ModelRegistry.productionVersion(spark, root, "m").contains(1))
    ModelRegistry.promote(spark, root, "m", v2)
    assert(ModelRegistry.productionVersion(spark, root, "m").contains(2))
    val stages = ModelRegistry.entries(spark, root)
      .map(e => e.version -> e.stage).toMap
    assert(stages(1) == ModelRegistry.StageArchived, "old Production not archived")
    assert(stages(2) == ModelRegistry.StageProduction)
  }

  test("registerAndMaybePromote gates on the reference's metric thresholds") {
    val root = TestFixtures.tmpDir("registry-gate").toString
    val (model, _) = trained
    val (v1, promoted1) =
      ModelRegistry.registerAndMaybePromote(spark, root, "m", model, badMetrics)
    assert(!promoted1 && ModelRegistry.productionVersion(spark, root, "m").isEmpty)
    val (v2, promoted2) =
      ModelRegistry.registerAndMaybePromote(spark, root, "m", model, goodMetrics)
    assert(promoted2 && ModelRegistry.productionVersion(spark, root, "m").contains(v2))
    assert(v2 == v1 + 1)
    // registry table is queryable with the logged metrics
    val row = ModelRegistry.table(spark, root)
      .filter(F.col("stage") === ModelRegistry.StageProduction).collect()
    assert(row.length == 1 && row(0).getAs[Double]("auc") == 0.99)
  }

  test("loadProduction round-trips the artifact and scores identically") {
    val root = TestFixtures.tmpDir("registry-load").toString
    val (model, metrics) = trained
    val (v, _) = ModelRegistry.registerAndMaybePromote(
      spark, root, "fraud_detection_lr", model, goodMetrics)
    info(s"trained metrics: $metrics")

    val Some((loaded, tag)) =
      ModelRegistry.loadProduction(spark, root, "fraud_detection_lr")
    assert(tag == s"fraud_detection_lr/v$v")

    val direct = MlModel.predict(silver, model, tag)
      .select("trans_num", "prediction_score", "is_fraud_predicted")
    val viaDisk = MlModel.predict(silver, loaded, tag)
      .select("trans_num", "prediction_score", "is_fraud_predicted")
    assert(direct.exceptAll(viaDisk).isEmpty && viaDisk.exceptAll(direct).isEmpty,
      "persisted model scores differently from the in-memory model")
  }

  test("loadProduction is None before any promotion") {
    val root = TestFixtures.tmpDir("registry-empty").toString
    assert(ModelRegistry.loadProduction(spark, root, "nope").isEmpty)
  }

  test("a corrupt registry file throws instead of reading as empty") {
    // Regression for the round-4 exists-vs-error fix: only a MISSING
    // registry means "no versions yet". A present-but-unreadable one must
    // propagate — the old catch-all returned Seq.empty, and the next
    // register() would rewrite registry.parquet from it, silently wiping
    // every version row.
    val root = TestFixtures.tmpDir("registry-corrupt").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "registry.parquet"),
      "this is not a parquet file".getBytes("UTF-8"))
    intercept[Exception] { ModelRegistry.entries(spark, root) }
    // and the corrupt file is still there — nothing rewrote it
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "registry.parquet")), "UTF-8")
      .startsWith("this is not"))
  }
}
