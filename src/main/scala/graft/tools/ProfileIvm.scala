package graft.tools

import org.apache.spark.sql.{functions => F}

import graft.layers.{IncrementalView, Snapshots}
import graft.runtime.{GraftSession, Tables}

/** Per-refresh wall-clock teardown of the fact-scale insert-only IVM
  * lifecycle (ql13's shape): three HWM-fed `refreshFromAppends` rounds
  * over the events table, timed individually after an identical untimed
  * warmup run — where the ledger row's seconds actually go (stats pass,
  * auxiliary commits, view commit), the measurement side of VERDICT r12
  * #2's commit-fan-out question.
  *
  * Usage: runMain graft.tools.ProfileIvm [sfDir]
  */
object ProfileIvm {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-ivm")
    spark.sparkContext.setLogLevel("ERROR")
    def fact = Tables.load(spark, d, "events").select(
      F.col("event_type"), F.col("user_id"),
      F.floor(F.col("value")).cast("long").as("v"), F.col("ts"))
    def cut(l: String) = fact.filter(F.col("ts") < F.to_timestamp(F.lit(l)))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivm] $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    def run(tag: String, timed: Boolean): Unit = {
      val vp = graft.queries.Scratch.dir(s"profile-ivm-$tag-") + "/view"
      def one(st: org.apache.spark.sql.DataFrame, n: Long) =
        IncrementalView.refreshFromAppends(spark, st, vp, "ts",
          Seq("event_type"), Seq("v"), minMaxCol = Some("v"),
          distinctCol = Some("user_id"), version = Some(n))
      val states = Seq(cut("2024-01-11"), cut("2024-01-21"), fact)
      if (timed) t("total") {
        states.zipWithIndex.foreach { case (st, n) => t(s"refresh $n")(one(st, n.toLong)) }
        t("final read")(Snapshots.read(spark, vp).orderBy("event_type").collect())
      }
      else states.zipWithIndex.foreach { case (st, n) => one(st, n.toLong) }
    }
    run("warm", timed = false)
    // per-job breakdown: callSite + wall of every Spark job inside the
    // timed run — separates job count (commit fan-out) from job cost
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(s.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(s.jobId, (site, s.time))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobs.get(e.jobId)).foreach { case (site, t0) =>
          println(f"[ivm-job] ${e.jobId}%3d ${(e.time - t0) / 1e3}%6.2fs $site")
        }
    }
    spark.sparkContext.addSparkListener(listener)
    run("timed", timed = true)
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
