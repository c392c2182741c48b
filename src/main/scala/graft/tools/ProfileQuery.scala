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

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name — names: ${SparkEntry.queries.keys.toSeq.sorted.take(5)}..."))
      // untimed warm rep, same discipline as Bench
      spark.catalog.clearCache()
      fn(spark, d).count()
      spark.catalog.clearCache()
      rows.clear(); starts.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, d).count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // drain listener-bus stragglers before printing
      Thread.sleep(200)
      println(f"%n[profile] $name total ${total}%6.3fs, ${rows.size} jobs, " +
        f"job-sum ${rows.map(_.sec).sum}%6.3fs (gap = driver/plan time)")
      rows.sortBy(-_.sec).take(40).foreach { r =>
        println(f"[profile]   ${r.sec}%7.3fs  job ${r.id}%3d  ${r.desc.take(110)}")
      }
    }
    spark.stop()
  }
}
