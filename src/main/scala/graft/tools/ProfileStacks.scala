package graft.tools

import scala.collection.mutable

import graft.SparkEntry
import graft.runtime.GraftSession

/** Driver-thread stack sampler (guide §7.3 "when nothing seems to be
  * happening"): runs a declared query on the main thread while a daemon
  * samples that thread's stack every few ms, then histograms the deepest
  * "interesting" frame — the measurement that breaks the job-sum/wall gap
  * ProfileQuery exposes into named driver work (commit protocol, footer
  * reads, planning, FS calls) instead of one opaque number.
  *
  * Usage: runMain graft.tools.ProfileStacks <query>[,<query>...] [sfDir]
  */
object ProfileStacks {

  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("ql21_mor_delete")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-stacks")
    spark.sparkContext.setLogLevel("ERROR")

    val target = Thread.currentThread()
    @volatile var sampling = false
    val hist = mutable.Map[String, Int]().withDefaultValue(0)

    def bucket(state: Thread.State, frames: Array[StackTraceElement]): String = {
      // deepest frame that names engine or spark-driver work; skip pure
      // JDK/waiting frames so "blocked on job result" reads as such
      val s = frames.map(f => s"${f.getClassName}.${f.getMethodName}")
      def first(p: String => Boolean): Option[String] = s.find(p)
      val st = state match {
        case Thread.State.RUNNABLE => "CPU "
        case _ => "WAIT"
      }
      if (s.exists(_.contains("DAGScheduler.runJob")) ||
          s.exists(_.contains("ThreadUtils$.awaitResult")) ||
          s.exists(_.contains("awaitReady")))
        s"$st on-job/broadcast-result"
      else {
        // the thread sits "inside AdaptiveSparkPlanExec" for most of an
        // action — name WHICH piece (stage wait vs replanning vs codegen)
        val aqe = s.find(f => f.contains("AdaptiveSparkPlanExec") ||
          f.contains("QueryStageExec") || f.contains("ShuffleExchangeExec") ||
          f.contains("CodeGenerator") || f.contains("WholeStageCodegen") ||
          f.contains("RuleExecutor") || f.contains("QueryExecution") ||
          f.contains("FileFormatWriter") || f.contains("ParquetFileFormat") ||
          f.contains("InMemoryFileIndex") || f.contains("ParquetFooterReader") ||
          f.contains("DataSource"))
        val g = first(_.startsWith("graft.")).map(_.take(58)).getOrElse(
          s.headOption.map(_.take(58)).getOrElse("?"))
        s"$st ${aqe.map(_.take(70)).getOrElse(s.take(3).mkString(";").take(70))} @ $g"
      }
    }

    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val state = target.getState
          val st = target.getStackTrace
          if (st.nonEmpty) hist.synchronized { hist(bucket(state, st)) += 1 }
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      spark.catalog.clearCache()
      fn(spark, d).count() // warm
      spark.catalog.clearCache()
      hist.synchronized(hist.clear())
      val t0 = System.nanoTime()
      sampling = true
      fn(spark, d).count()
      sampling = false
      val total = (System.nanoTime() - t0) / 1e9
      val snap = hist.synchronized(hist.toSeq)
      val n = snap.map(_._2).sum.max(1)
      println(f"%n[stacks] $name total $total%6.3fs, $n samples (~${total / n * 1000}%.0f ms each)")
      snap.sortBy(-_._2).take(25).foreach { case (k, c) =>
        println(f"[stacks]   ${c * 100.0 / n}%5.1f%% ($c%4d) $k")
      }
    }
    spark.stop()
  }
}
