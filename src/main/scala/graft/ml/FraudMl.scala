package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.{MinMaxScaler, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Spark ML port of the training job (`spark/app/ml_training_job.py`):
  * undersample to 1:1 → VectorAssembler → MinMaxScaler → RF/LR →
  * evaluators → promotion gate.
  */
object FraudMl {

  /** The 15-feature ML contract (`ml_training_job.py:108-119`). */
  val featureCols: Seq[String] = Seq(
    "amt", "distance_km", "age", "hour", "day_of_week", "is_weekend",
    "hour_sin", "hour_cos", "log_amount", "is_zero_amount", "is_high_amount",
    "amount_bin", "gender_encoded", "is_distant_transaction", "is_late_night")

  /** Median imputation via approxQuantile (`ml_training_job.py:93-104`). */
  def imputeMedians(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (acc, c) =>
      val medians = acc.stat.approxQuantile(c, Array(0.5), 0.01)
      val median = if (medians.nonEmpty) medians(0) else 0.0
      acc.withColumn(c,
        F.when(F.col(c).isNull || F.isnan(F.col(c)), F.lit(median)).otherwise(F.col(c)))
    }

  /** Class balancing by undersampling the majority class to 1:1, seeded
    * (`ml_training_job.py:124-160`).
    */
  def balance(df: DataFrame, labelCol: String = "is_fraud", seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(labelCol).count().collect()
      .map(r => r.get(0).toString.toInt -> r.getLong(1)).toMap
    val nFraud = counts.getOrElse(1, 0L)
    val nNormal = counts.getOrElse(0, 0L)
    if (nFraud == 0 || nNormal <= nFraud) df
    else {
      val fraction = nFraud.toDouble / nNormal
      val fraud = df.filter(F.col(labelCol) === 1)
      val normal = df.filter(F.col(labelCol) === 0).sample(withReplacement = false, fraction, seed)
      fraud.union(normal)
    }
  }

  /** Stratified alternative to [[balance]]: per-class fractions in one
    * pass via `stat.sampleBy` (keeps all fraud, downsamples normal to
    * the target ratio) — the idiomatic Spark form of the reference's
    * two-filter union.
    */
  def balanceStratified(df: DataFrame, labelCol: String = "is_fraud", seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(labelCol).count().collect()
      .map(r => r.get(0).toString.toInt -> r.getLong(1)).toMap
    val nFraud = counts.getOrElse(1, 0L)
    val nNormal = counts.getOrElse(0, 0L)
    if (nFraud == 0 || nNormal <= nFraud) df
    else df.stat.sampleBy(labelCol,
      Map(0 -> nFraud.toDouble / nNormal, 1 -> 1.0), seed)
  }

  def pipeline(algorithm: String = "rf"): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features_raw")
      .setHandleInvalid("skip")
    val scaler = new MinMaxScaler().setInputCol("features_raw").setOutputCol("features")
    val clf = algorithm match {
      case "rf" => new RandomForestClassifier()
        .setLabelCol("is_fraud").setFeaturesCol("features")
        .setNumTrees(200).setMaxDepth(30).setSeed(42L)
      case "lr" => new LogisticRegression()
        .setLabelCol("is_fraud").setFeaturesCol("features").setMaxIter(1000)
      case other => throw new IllegalArgumentException(s"unknown algorithm: $other")
    }
    new Pipeline().setStages(Array(assembler, scaler, clf))
  }

  /** The reference's logged metric set (`ml_training_job.py:300-325`),
    * including specificity = TN/(TN+FP) derived from the confusion matrix.
    */
  case class Metrics(accuracy: Double, precision: Double, recall: Double,
      f1: Double, auc: Double, specificity: Double)

  def evaluate(predictions: DataFrame): Metrics = {
    def multi(metric: String): Double =
      new MulticlassClassificationEvaluator()
        .setLabelCol("is_fraud").setPredictionCol("prediction").setMetricName(metric)
        .evaluate(predictions)
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("is_fraud").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC").evaluate(predictions)
    // one aggregate, not 4 filter+count round-trips (ml_training_job.py:309-313)
    val negs = predictions.filter(F.col("is_fraud") === 0)
      .agg(F.count(F.lit(1)).as("n"),
        F.sum(F.when(F.col("prediction") === 0, 1).otherwise(0)).as("tn"))
      .head()
    val specificity =
      if (negs.getLong(0) > 0) negs.getLong(1).toDouble / negs.getLong(0) else 0.0
    Metrics(multi("accuracy"), multi("weightedPrecision"), multi("weightedRecall"),
      multi("f1"), auc, specificity)
  }

  /** Confusion matrix as one distributed aggregate, not 4 filter+count
    * round-trips (`ml_training_job.py:309-313`).
    */
  def confusionMatrix(predictions: DataFrame): DataFrame =
    predictions.groupBy(F.col("is_fraud"), F.col("prediction"))
      .agg(F.count(F.lit(1)).as("n"))
      .orderBy("is_fraud", "prediction")

  /** Auto-promotion gate: accuracy>=0.90 ∧ F1>=0.85 ∧ AUC>=0.90
    * (`ml_training_job.py:358`).
    */
  def promotionGate(m: Metrics): Boolean =
    m.accuracy >= 0.90 && m.f1 >= 0.85 && m.auc >= 0.90

  /** Drop every fitted stage's MLlib training summary IN PLACE. A
    * freshly-fit classification model keeps a `trainingSummary` whose
    * summary object pins the LIVE SparkSession — and the session's
    * observation manager is not `Serializable`, so any task-serialized
    * scoring closure whose walk reaches the summary (the model rides in
    * the scoring UDF's captured args; a materialized `canonicalized`
    * expression copy is enough to expose it) dies with
    * `NotSerializableException: ObservationManager`. The engine computes
    * its own [[Metrics]] from predictions and never reads MLlib
    * summaries, and `copy(ParamMap.empty)` explicitly CARRIES the
    * summary over, so stripping the private field is the one reliable
    * serving-hygiene fix: a model that crosses the wire must not drag
    * the driver's session behind it. (Persisted models never have one —
    * `ModelRegistry` round-trips are naturally clean.)
    */
  def stripTrainingSummaries(model: PipelineModel): PipelineModel = {
    model.stages.foreach(stripTrainingSummary)
    model
  }

  /** Per-stage half of [[stripTrainingSummaries]] — also the hygiene
    * for directly-fit models (the IVF k-means, whose summary likewise
    * pins a live DataFrame and with it the session).
    */
  // the trait that CARRIES summaries is private[spark] at the Scala
  // level but a public interface in bytecode — key the strip on it via
  // JVM reflection (resolved once; None if this Spark build lacks it)
  private val hasTrainingSummaryCls: Option[Class[_]] =
    scala.util.Try(
      Class.forName("org.apache.spark.ml.util.HasTrainingSummary")).toOption

  def stripTrainingSummary(stage: AnyRef): Unit =
    // keyed on the summary-carrying trait, not a blind Try: a Spark
    // upgrade that renames the field, or a denied setAccessible, must
    // fail HERE (where the cause is obvious) rather than silently skip
    // the strip and resurface as an undiagnosable
    // NotSerializableException at task-serialization time
    if (hasTrainingSummaryCls.exists(_.isInstance(stage))) {
      try {
        val f = stage.getClass.getDeclaredField("trainingSummary")
        f.setAccessible(true)
        f.set(stage, None)
      } catch {
        case e: Exception => throw new IllegalStateException(
          s"cannot strip the training summary from ${stage.getClass.getName}: " +
            "the model would drag the live SparkSession into task " +
            "serialization (NotSerializableException: ObservationManager) — " +
            "a Spark upgrade likely moved/renamed the summary field", e)
      }
      val still = hasTrainingSummaryCls.get.getMethod("hasSummary")
        .invoke(stage).asInstanceOf[Boolean]
      require(!still,
        s"training summary of ${stage.getClass.getName} survived the strip — " +
          "the reflective field no longer backs hasSummary")
    } // stages without summaries (assembler, scaler) pass

  /** End-to-end training run on a silver-shaped frame. */
  def train(silver: DataFrame, algorithm: String = "rf", seed: Long = 42L):
      (PipelineModel, Metrics, DataFrame) = {
    val data = imputeMedians(
      silver.select((featureCols :+ "is_fraud").map(F.col): _*), featureCols)
    val balanced = balance(data, seed = seed).cache()
    val Array(train, test) = balanced.randomSplit(Array(0.8, 0.2), seed)
    val model = stripTrainingSummaries(pipeline(algorithm).fit(train))
    val preds = model.transform(test)
    (model, evaluate(preds), confusionMatrix(preds))
  }
}
