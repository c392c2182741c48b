package graft.tools

import org.apache.spark.sql.{functions => F}

import graft.operators.IvfIndex
import graft.runtime.{GraftSession, Tables}

/** Micro-teardown of the IVF build's vector-write stage (round-15: qe11's
  * single 1.05 s AQE map job over 2,000 rows — where does the time go?).
  * Times each sub-expression of the write plan separately via noop-style
  * counts, twice each (compile + warm), so codegen-compilation cost is
  * visible as the rep0/rep1 gap.
  *
  * Usage: runMain graft.tools.ProfileBuild [sfDir]
  */
object ProfileBuild {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-build")
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val e = Tables.load(spark, d, "embeddings")
    val vecs = e.select(F.col("vec_id").as("id"),
        F.col("embedding").cast("array<double>").as("vec"))
      .withColumn("features", array_to_vector(F.col("vec")))
    val model = new KMeans().setK(72).setSeed(42L).setMaxIter(3)
      .setInitMode("random").setFeaturesCol("features")
      .fit(vecs.sample(withReplacement = false, 0.25, 42L))
    graft.ml.FraudMl.stripTrainingSummary(model)
    val cents: Seq[(Int, Array[Double])] =
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }.toSeq

    def t(label: String)(f: => Unit): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[build] $label rep$i ${(System.nanoTime() - t0) / 1e9}%6.3fs")
      }

    val base = vecs.select("id", "vec")
    t("scan only")(base.write.format("noop").mode("overwrite").save())
    t("mllib transform")(model.transform(vecs).select("id", "prediction")
      .write.format("noop").mode("overwrite").save())
    val kern = IvfIndex.assignCellsMultiExpr(base, "id", "vec", cents, 1)
      .withColumn("cell", F.col("cells").getItem(0)).drop("cells")
    t("kernel assign")(kern.write.format("noop").mode("overwrite").save())
    val quant = kern
      .withColumn("nrm", F.sqrt(F.call_function("vec_dot", F.col("vec"), F.col("vec"))))
      .withColumn("q_scale", F.array_max(F.transform(F.col("vec"), x => F.abs(x))) / 127.0)
      .withColumn("q_codes", F.transform(F.col("vec"), x => F.round(x / F.col("q_scale")).cast("byte")))
    t("assign+quant")(quant.write.format("noop").mode("overwrite").save())
    t("repart(cell)")(quant.repartition(F.col("cell"))
      .write.format("noop").mode("overwrite").save())
    val root = graft.queries.Scratch.dir("profile-build-")
    var n = 0
    t("full write") {
      n += 1
      quant.withColumn("epoch", F.lit(-1L)).repartition(F.col("cell"))
        .write.mode("overwrite").partitionBy("epoch", "cell")
        .parquet(s"$root/v$n/vectors")
    }
    t("flat write") {
      n += 1
      quant.withColumn("epoch", F.lit(-1L)).repartition(F.col("cell"))
        .write.mode("overwrite").parquet(s"$root/v$n/vectors")
    }
    spark.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
    t("full write v2") {
      n += 1
      quant.withColumn("epoch", F.lit(-1L)).repartition(F.col("cell"))
        .write.mode("overwrite").partitionBy("epoch", "cell")
        .parquet(s"$root/v$n/vectors")
    }
    spark.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 1)
    // 8 write tasks instead of 32: fewer task commits, same 72 files
    t("full write 8part") {
      n += 1
      quant.withColumn("epoch", F.lit(-1L)).repartition(8, F.col("cell"))
        .write.mode("overwrite").partitionBy("epoch", "cell")
        .parquet(s"$root/v$n/vectors")
    }
    Seq(32, 31, 33).foreach { p =>
      t(s"full write ${p}part") {
        n += 1
        quant.withColumn("epoch", F.lit(-1L)).repartition(p, F.col("cell"))
          .write.mode("overwrite").partitionBy("epoch", "cell")
          .parquet(s"$root/v$n/vectors")
      }
    }
    spark.stop()
  }
}
