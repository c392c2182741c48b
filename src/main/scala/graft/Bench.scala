package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — prints ONE JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR.
  *
  * A warmup pass runs every query once at sf0.001 first so the timed pass
  * measures steady state (JIT + whole-stage-codegen compilation costs
  * otherwise land arbitrarily on whichever query runs first — at sf0.1
  * that skew is bigger than many queries' own runtime).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (new java.io.File(warmDir).exists()) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    }
    // warm target-SF file listings + page cache so timed queries measure
    // compute, not first-touch I/O metadata
    graft.runtime.Tables.all.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }

    // best-of-2: a single timing at this scale carries 25%+ noise from
    // GC/JIT scheduling; min-of-two is the standard robust estimator.
    // A query that throws yields the -1 sentinel (and min(-1, t) keeps
    // it) so a broken query can never masquerade as a fast one.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case t: Throwable =>
        System.err.println(s"[bench] query failed: ${t.getMessage}"); -1.0
      }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> math.min(timeOnce(fn), timeOnce(fn))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    spark.stop()
    // the bare JSON line is the LAST thing on stdout — the driver's record
    System.out.println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
