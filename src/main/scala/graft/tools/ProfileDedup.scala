package graft.tools

import graft.operators.Dedup
import graft.runtime.{GraftSession, Tables}

/** Dev profiler for the MinHash/LSH pipeline stages (not part of the
  * driver contract). Usage: runMain graft.tools.ProfileDedup [sfDir]
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3).cache()
    time("shingles")(println("n_shingles=" + sh.count()))
    val sigs = time("sigs build")(Dedup.minhashSignatures(sh, "doc_id", 64).cache())
    time("sigs count")(println("n_sigs=" + sigs.count()))
    if (sys.env.contains("PROFILE_PLANS")) {
      println("=== sigs executed plan (codegen spans) ===")
      println(sigs.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("WholeStageCodegen") || l.contains("HashAggregate")
          || l.contains("Exchange") || l.contains("InMemory")).mkString("\n"))
    }
    time("sigs recount")(sigs.unpersist(blocking = true).cache().count())
    val buckets = Dedup.lshBuckets(sigs, "doc_id", 32, 2)
    val cands = Dedup.lshCandidates(buckets, "doc_id").cache()
    time("candidates")(println("n_cands=" + cands.count()))
    if (sys.env.contains("PROFILE_PLANS")) {
      println("=== cands executed plan (joins/exchanges) ===")
      println(cands.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("WholeStageCodegen") || l.contains("Join")
          || l.contains("Exchange") || l.contains("HashAggregate")).mkString("\n"))
    }
    // job-level teardown of a COLD full pipeline (caches cleared first:
    // the stage caches above share plan keys with the pipeline's internal
    // ones, which would otherwise turn this into a cache-hit measurement)
    spark.catalog.clearCache()
    val jobs = new scala.collection.mutable.ArrayBuffer[(Int, Long, String)]
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.get(j.jobId)
        if (s != null) jobs.synchronized { jobs += ((j.jobId, System.nanoTime() - s._1, s._2)) }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val full = Dedup.minhashNearDupPairs(docs, "doc_id", "text", 3, 0.6)
    time("full pipeline COLD")(println("n_pairs=" + full.count()))
    Thread.sleep(300)
    jobs.synchronized { jobs.sortBy(_._1).foreach { case (id, ns, d) =>
      println(f"[job] $id%3d ${ns / 1e9}%6.2f s  ${d.take(80)}") } }
    spark.sparkContext.removeSparkListener(listener)
    val sim = Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3)
    time("simhash pipeline")(println("n_sim_pairs=" + sim.count()))
    spark.stop()
  }
}
