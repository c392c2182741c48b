package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import graft.SparkEntry
import graft.runtime.GraftSession

/** Generic job-level teardown of any declared query (round-15
  * optimization instrumentation): runs the named queries once untimed
  * (JIT/codegen/page cache), then once timed with a SparkListener that
  * records every Spark job's wall time, call site and description — the
  * measurement that tells protocol fan-out (many sub-second jobs) apart
  * from one slow stage, per guide §1 ("measure first").
  *
  * Usage: runMain graft.tools.ProfileQuery <query>[,<query>...] [sfDir]
  */
object ProfileQuery {

  private final case class JobRow(id: Int, desc: String, sec: Double)

  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("ql21_mor_delete")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-query")
    spark.sparkContext.setLogLevel("ERROR")

    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer[JobRow]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(e.stageInfos.lastOption.map(_.name.take(140)))
          .getOrElse("?")
        starts(e.jobId) = (System.nanoTime(), desc)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (t0, desc) =>
          rows += JobRow(e.jobId, desc, (System.nanoTime() - t0) / 1e9)
        }
    }

    // planning-phase teardown of the job-sum/wall GAP: every Dataset
    // action and DataFrameWriter command reports its QueryPlanningTracker
    // phases (parsing/analysis/optimization/planning) through this
    // listener — the measurement that tells "driver is planning N tiny
    // queries" apart from "driver is doing FS/commit work" (guide §7.3)
    val phaseSums = mutable.Map[String, Double]().withDefaultValue(0.0)
    var nExec = 0
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        nExec += 1
        qe.tracker.phases.foreach { case (phase, s) =>
          phaseSums(phase) += (s.endTimeMs - s.startTimeMs) / 1e3 }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name — names: ${SparkEntry.queries.keys.toSeq.sorted.take(5)}..."))
      // untimed warm rep, same discipline as Bench
      spark.catalog.clearCache()
      fn(spark, d).count()
      spark.catalog.clearCache()
      rows.clear(); starts.clear()
      phaseSums.clear(); nExec = 0
      spark.sparkContext.addSparkListener(listener)
      spark.listenerManager.register(qel)
      val t0 = System.nanoTime()
      fn(spark, d).count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // drain listener-bus stragglers before printing
      Thread.sleep(500)
      spark.listenerManager.unregister(qel)
      println(f"%n[profile] $name total ${total}%6.3fs, ${rows.size} jobs, " +
        f"job-sum ${rows.map(_.sec).sum}%6.3fs (gap = driver/plan time)")
      println(f"[profile]   $nExec%3d tracked executions, plan phases: " +
        phaseSums.toSeq.sortBy(-_._2)
          .map { case (p, s) => f"$p=$s%.3fs" }.mkString(" "))
      rows.sortBy(-_.sec).take(40).foreach { r =>
        println(f"[profile]   ${r.sec}%7.3fs  job ${r.id}%3d  ${r.desc.take(110)}")
      }
    }
    spark.stop()
  }
}
