package graft.tools

import graft.SparkEntry
import graft.runtime.GraftSession

/** A/B a declared query under session-conf overrides (round-15): runs the
  * query warm+3 timed reps at the base config, then the same under each
  * `k=v` override set, printing min seconds per config — the measurement
  * for "would conf X help THIS query" without touching the engine.
  *
  * Usage: runMain graft.tools.ProfileConf <query> <k=v[,k=v...]> [sfDir]
  */
object ProfileConf {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("query name required"))
    val overrides = args.lift(1).getOrElse("")
      .split(",").map(_.trim).filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }.toSeq
    val d = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-conf")
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)

    def reps(tag: String): Unit = {
      val times = (0 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); fn(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[conf] $name $tag min ${times.tail.min}%6.3fs reps " +
        times.map(t => f"$t%.3f").mkString(" "))
    }

    reps("base")
    val saved = overrides.map { case (k, _) =>
      (k, scala.util.Try(spark.conf.get(k)).toOption) }
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    reps("override(" + overrides.map { case (k, v) => s"$k=$v" }.mkString(",") + ")")
    saved.foreach { case (k, ov) =>
      ov.fold(spark.conf.unset(k))(v => spark.conf.set(k, v)) }
    reps("base-again")
    spark.stop()
  }
}
