package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Debezium
import graft.layers.Silver
import graft.ml.FraudMl

/** ML pipeline port: undersample → assemble → scale → classify →
  * evaluate → promotion gate.
  */
class FraudMlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  /** Silver frame with a learnable signal: fraud rows get big amounts and
    * long distances (what the rule model also keys on).
    */
  lazy val silver = {
    val work = TestFixtures.tmpDir("ml")
    val rnd = new scala.util.Random(5L)
    val lines = (0 until 600).map { i =>
      val fraud = i % 5 == 0 // 20% fraud, balanced enough to train on
      TestFixtures.envelope(
        java.time.LocalDateTime.of(2024, 3, 1 + rnd.nextInt(20), rnd.nextInt(24), 0, 0),
        9000L + i, "fraud_M1", "misc_net",
        if (fraud) 600 + rnd.nextDouble() * 800 else rnd.nextDouble() * 120,
        "F", "Austin", "TX", 73301,
        Some(30.0), Some(-97.0), 100000L,
        java.time.LocalDate.of(1980, 1, 1), f"ML_$i%05d",
        Some(if (fraud) 34.0 else 30.01), Some(-97.0),
        if (fraud) 1 else 0)
    }
    val dir = TestFixtures.writeEnvelopes(work.resolve("in"), "ml.jsonl", lines)
    val raw = spark.read.text(dir.toString).withColumnRenamed("value", "json_string")
    Silver.transform(Debezium.withBronzeColumns(Debezium.parse(raw)), None).cache()
  }

  test("balance undersamples the majority class to ~1:1") {
    val b = FraudMl.balance(silver)
    val counts = b.groupBy("is_fraud").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(1) == 120)
    assert(math.abs(counts(0) - counts(1)) <= 25, s"imbalanced: $counts")
  }

  test("stratified sampleBy balance approximates 1:1 and keeps all fraud") {
    val b = FraudMl.balanceStratified(silver)
    val counts = b.groupBy("is_fraud").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(1) == 120) // fraction 1.0 keeps every fraud row
    assert(math.abs(counts(0) - counts(1)) <= 35, s"imbalanced: $counts")
  }

  test("median imputation removes nulls/NaNs") {
    val withNull = silver.withColumn("amt",
      F.when(F.col("trans_num") === "ML_00001", F.lit(null)).otherwise(F.col("amt")))
    val imputed = FraudMl.imputeMedians(withNull, Seq("amt"))
    assert(imputed.filter(F.col("amt").isNull).count() == 0)
  }

  test("logistic pipeline trains, separates the planted signal, gates") {
    val (_, metrics, confusion) = FraudMl.train(silver, algorithm = "lr")
    info(s"metrics: $metrics")
    assert(metrics.auc > 0.9, s"planted signal not learned: $metrics")
    assert(metrics.accuracy > 0.8)
    assert(FraudMl.promotionGate(metrics) == (metrics.accuracy >= 0.90 &&
      metrics.f1 >= 0.85 && metrics.auc >= 0.90))
    val cells = confusion.collect()
    assert(cells.map(_.getAs[Long]("n")).sum > 0)
  }

  test("random-forest pipeline smoke (reference hyperparameters scaled down)") {
    val small = FraudMl.pipeline("rf") // construction only: 200 trees/depth 30
    assert(small.getStages.length == 3)
  }
}
