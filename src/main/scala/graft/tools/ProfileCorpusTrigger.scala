package graft.tools

import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.util.Random

import graft.operators.NearDupIndex
import graft.runtime.GraftSession
import graft.streaming.CorpusIngestStream

/** Dev profiler for ONE corpus-ingest trigger (not part of the driver
  * contract): same data shape as [[StreamBench]]'s corpus leg — a
  * 500-doc seed index, then one `processBatch` of `nDocs` synthetic docs
  * (~60 words each, 10% planted near-dups) — with the per-stage timer
  * plugged in, so the per-trigger constant is attributable instead of
  * guessed. Prints one JSON line with the stage breakdown.
  *
  * Usage: runMain graft.tools.ProfileCorpusTrigger [nDocs] [lazy]
  *
  * With the `lazy` flag the stage timer stays null (the PRODUCTION plan
  * shape — nothing force-cached early) and a SparkListener records every
  * job's wall time and description instead, so the trigger's job-count
  * constant is attributable without perturbing it.
  */
object ProfileCorpusTrigger {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(5000)
    val lazyMode = args.lift(1).contains("lazy")
    val load0 = graft.Bench.loadavg()
    val spark = GraftSession.get("profile-corpus-trigger")
    spark.sparkContext.setLogLevel("ERROR")
    // experiment knob: pass a third arg to size shuffle partitions to the
    // micro-batch instead of the session default
    args.lift(2).foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    import spark.implicits._

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val jobSecs = mutable.LinkedHashMap.empty[Int, (String, Double)]
    if (lazyMode) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          // the result stage's name carries the action's call site
          val desc = e.stageInfos.lastOption.map(_.name).getOrElse("?")
          jobs.put(e.jobId, (desc, e.time))
        }
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.get(e.jobId)).foreach { case (desc, t0) =>
            jobSecs.synchronized { jobSecs(e.jobId) = (desc, (e.time - t0) / 1e3) }
          }
        }
      })

    val rnd = new Random(42L)
    def docText(r: Random) = Seq.fill(60)(s"w${r.nextInt(20000)}").mkString(" ")
    val seedDocs = (0 until 500).map(i => (i.toLong, docText(rnd)))
    val name = s"pct_corpus_${System.nanoTime()}"
    NearDupIndex.build(seedDocs.toDF("doc_id", "text"), "doc_id", "text", name)

    var prev = seedDocs.head._2
    val docs = (0 until nDocs).map { i =>
      val t = if (i % 10 == 9) s"$prev tail $i" else { prev = docText(rnd); prev }
      (1000L + i, t)
    }
    val work = Paths.get("/tmp", s"graft-pct-${System.nanoTime()}")
    Files.createDirectories(work)

    val stages = mutable.LinkedHashMap.empty[String, Double]
    val t0 = System.nanoTime()
    try {
      CorpusIngestStream.processBatch(spark, docs.toDF("doc_id", "text"), 0L,
        work.resolve("accepted").toString, name, 0.6, NearDupIndex.Config(),
        identity, onStage = if (lazyMode) null else (s, sec) => stages(s) = sec)
    } finally {
      Seq("_shingles", "_counts", "_buckets", "_meta", "_digest").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS $name$s"))
    }
    val total = (System.nanoTime() - t0) / 1e9
    val kept = spark.read.parquet(work.resolve("accepted").toString).count()

    val stageJson = stages.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
    println(
      f"""{"metric":"corpus_trigger_profile","unit":"sec","n_docs":$nDocs,""" +
        f""""kept":$kept,"total_sec":$total%.3f,"docs_per_sec":${(nDocs / total).toLong},""" +
        f""""load_start":$load0,"load_end":${graft.Bench.loadavg()},""" +
        s""""stages":{$stageJson}}""")
    if (lazyMode) jobSecs.synchronized {
      jobSecs.toSeq.sortBy(_._1).foreach { case (id, (desc, sec)) =>
        println(f"job $id%3d  $sec%6.2fs  ${desc.take(110)}")
      }
      println(f"jobs: ${jobSecs.size}, sum ${jobSecs.values.map(_._2).sum}%.2fs")
    }
    spark.stop()
  }
}
