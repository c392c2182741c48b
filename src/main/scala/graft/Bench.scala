package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — prints ONE JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR.
  *
  * Measurement protocol (tuned until two consecutive sf0.1 runs agree,
  * round-2 showed ±40% run-over-run drift with best-of-2 and no per-query
  * warm rep):
  *   1. one pass of every query at sf0.001 (JIT + codegen compilation);
  *   2. per query at the target SF: one UNTIMED rep (first-touch file
  *      listing, page cache, per-plan codegen), then 3 timed reps;
  *   3. per-query value = min of the timed reps (robust location
  *      estimator); every rep is reported under "reps" so variance is
  *      visible to the reader, not averaged away.
  *
  * Measured (round 3): consecutive sf0.1 totals 18.71s / 18.47s — 1.3%
  * run-over-run, vs ±42% across rounds 1→2 under the old protocol; after
  * growing the suite to 60 queries, a second pair read 19.85s / 18.30s
  * (8%, first run launched right after a full-test write workload). As
  * the suite grew 64 → 68 queries, a seven-run sequence read 23.9 / 22.4
  * / 22.5 / 23.5 / 23.6 / 23.1 / 24.5s — ±4% around the mean with each
  * run launched right after heavy compile/test activity. A run started
  * minutes after a heavy WRITE workload (page-cache writeback still
  * draining) can still read high across the board; benchmark on a quiet
  * machine.
  *
  * Failure accounting: a rep that throws yields a -1 sentinel. A query
  * whose every rep failed reports -1 and is listed under "failed", and is
  * EXCLUDED from the "total" sum — so a broken build can neither
  * masquerade as fast nor subtract time from the headline number.
  */
object Bench {

  val TimedReps = 3

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

    def timeOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case t: Throwable =>
        System.err.println(s"[bench] $name failed: ${t.getMessage}"); -1.0
      }
    }

    val results: Seq[(String, Seq[Double])] = SparkEntry.queries.toSeq.map {
      case (name, fn) =>
        timeOnce(name, fn) // untimed warm rep at the target SF
        name -> (1 to TimedReps).map(_ => timeOnce(name, fn))
    }

    def fmt(v: Double): String = (math.round(v * 10000) / 10000.0).toString
    val perQuery = results.map { case (name, reps) =>
      name -> reps.filter(_ >= 0).minOption.getOrElse(-1.0)
    }
    val failed = perQuery.collect { case (name, v) if v < 0 => name }
    val total = perQuery.collect { case (_, v) if v >= 0 => v }.sum

    val qs = perQuery.map { case (k, v) => s"\"$k\":${fmt(v)}" }
      .mkString("{", ",", "}")
    val repsJson = results.map { case (k, reps) =>
      s"\"$k\":[${reps.map(fmt).mkString(",")}]"
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")

    spark.stop()
    // the bare JSON line is the LAST thing on stdout — the driver's record
    System.out.println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
      s""""reps":$repsJson,"failed":$failedJson,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
