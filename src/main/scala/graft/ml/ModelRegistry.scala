package graft.ml

import java.sql.Timestamp

import scala.util.Try

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-backed model registry with the MLflow-registry semantics the
  * reference relies on (`spark/app/ml_training_job.py:330-393`): versioned
  * model artifacts, stage transitions (None → Production with auto-archive
  * of the previous Production version, mirroring
  * `archive_existing_versions=True` at `ml_training_job.py:380-385`), and a
  * queryable versions table with the logged metrics.
  *
  * Layout under a registry root:
  * {{{
  *   <root>/<model_name>/v<version>/   PipelineModel.save artifact
  *   <root>/registry.parquet           versions table (this object's state)
  * }}}
  *
  * The registry table is metadata — one row per model version — so the
  * read-modify-rewrite here is a driver-side operation on a handful of rows
  * by construction, never a data-scale concern. Artifacts themselves are
  * written/read by Spark ML's own distributed writers.
  */
object ModelRegistry {

  val StageNone = "None"
  val StageProduction = "Production"
  val StageArchived = "Archived"

  /** One registered model version (the analog of an MLflow ModelVersion +
    * its logged metrics, `ml_training_job.py:318-325`).
    */
  case class Entry(
      model_name: String,
      version: Int,
      stage: String,
      accuracy: Double,
      precision: Double,
      recall: Double,
      f1: Double,
      auc: Double,
      specificity: Double,
      registered_at: Timestamp)

  private def registryPath(root: String): String = s"$root/registry.parquet"

  def artifactPath(root: String, name: String, version: Int): String =
    s"$root/$name/v$version"

  /** All registry rows, materialized to the driver (tiny by construction).
    *
    * Only a missing registry path reads as "no versions yet" (first run) —
    * checked via the Hadoop FileSystem resolved from the path's own scheme,
    * like [[graft.layers.Hwm.readIfExists]]. Any other read failure
    * (corrupt file, transient FS error) propagates: swallowing it would
    * make the next register()/promote() rewrite registry.parquet from an
    * empty Seq and silently discard all version history.
    */
  def entries(spark: SparkSession, root: String): Seq[Entry] = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(registryPath(root))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else spark.read.parquet(registryPath(root)).as[Entry].collect().toSeq
  }

  /** The versions table as a DataFrame (for SQL over the registry). */
  def table(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    entries(spark, root).toDF()
  }

  private def writeAll(spark: SparkSession, root: String, rows: Seq[Entry]): Unit = {
    import spark.implicits._
    // rows were already collected; overwriting the source path is safe
    rows.toDF().coalesce(1).write.mode("overwrite").parquet(registryPath(root))
  }

  /** Register a trained model: allocate the next version number, save the
    * artifact, append a stage=None registry row. Returns the version.
    */
  def register(
      spark: SparkSession,
      root: String,
      name: String,
      model: PipelineModel,
      metrics: FraudMl.Metrics): Int = {
    val existing = entries(spark, root)
    val version =
      existing.filter(_.model_name == name).map(_.version).maxOption.getOrElse(0) + 1
    model.write.overwrite().save(artifactPath(root, name, version))
    writeAll(spark, root,
      existing :+ Entry(name, version, StageNone,
        metrics.accuracy, metrics.precision, metrics.recall, metrics.f1, metrics.auc,
        metrics.specificity, new Timestamp(System.currentTimeMillis())))
    version
  }

  /** Transition a version to Production, archiving any prior Production
    * version of the same model (`ml_training_job.py:380-385`).
    */
  def promote(spark: SparkSession, root: String, name: String, version: Int): Unit = {
    val updated = entries(spark, root).map {
      case e if e.model_name == name && e.version == version =>
        e.copy(stage = StageProduction)
      case e if e.model_name == name && e.stage == StageProduction =>
        e.copy(stage = StageArchived)
      case e => e
    }
    writeAll(spark, root, updated)
  }

  /** The auto-promotion flow (`ml_training_job.py:356-385`): always
    * register; promote iff the metric gate passes. Returns
    * (version, promoted).
    */
  def registerAndMaybePromote(
      spark: SparkSession,
      root: String,
      name: String,
      model: PipelineModel,
      metrics: FraudMl.Metrics): (Int, Boolean) = {
    val version = register(spark, root, name, model, metrics)
    val promoted = FraudMl.promotionGate(metrics)
    if (promoted) promote(spark, root, name, version)
    (version, promoted)
  }

  def productionVersion(spark: SparkSession, root: String, name: String): Option[Int] =
    entries(spark, root)
      .filter(e => e.model_name == name && e.stage == StageProduction)
      .map(_.version).maxOption

  /** Load the current Production model, with its version tag for the
    * prediction rows' `model_version` column — what the reference's scoring
    * leg does at service start (`realtime_prediction_job.py` loads the
    * registered Production model via the API process, `main.py:386-393`).
    * None when no version has been promoted yet.
    */
  def loadProduction(
      spark: SparkSession,
      root: String,
      name: String): Option[(PipelineModel, String)] =
    productionVersion(spark, root, name).map { v =>
      (PipelineModel.load(artifactPath(root, name, v)), s"$name/v$v")
    }
}
