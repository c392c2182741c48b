package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

import graft.layers.AtomicAppend
import graft.runtime.{GraftSession, Tables}

/** Zone-map data-skipping effectiveness evidence (not part of the driver
  * contract): measures how much of the scan a selective predicate avoids
  * through [[AtomicAppend]]'s `_STATS` batch pruning, before and after
  * [[AtomicAppend.compactClustered]] tightens the per-batch ranges —
  * the number the 100 TB story rests on (at that scale the win is not
  * the seconds shaved on a warm local scan, it is the BATCHES NEVER
  * LISTED: `batches_skipped / batches_total` of the table's bytes are
  * neither opened nor footer-read).
  *
  * Legs, each timed as pruned `read(path, pred)` vs unpruned
  * `read(path).filter(pred)` with identical results (count compared):
  *   1. arrival-order appends (every batch spans the full domain) —
  *      zone maps exist but nothing can skip: the honest baseline;
  *   2. after the z-order clustered fold — 2-d, 1-d and timestamp
  *      predicates at decreasing selectivity.
  *
  * Usage: runMain graft.tools.ProfileSkip [sfDir] [outJson] [replicas]
  * (default sf0.1, docs/BENCH_SKIP.json, 8× events ≈ 800k rows).
  */
object ProfileSkip {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  /** Replicate events with disjoint event ids, preserving the user/value
    * distributions (the skipping axes) per replica.
    */
  private def replicate(ev: DataFrame, k: Int): DataFrame =
    (0 until k).map { r =>
      ev.select(
        (F.col("event_id") + F.lit(r * 100000000L)).as("event_id"),
        F.col("ts"), F.col("user_id"), F.col("event_type"), F.col("value"))
    }.reduce(_.union(_))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outJson = args.lift(1).getOrElse("docs/BENCH_SKIP.json")
    val replicas = args.lift(2).map(_.toInt).getOrElse(8)
    val load0 = graft.Bench.loadavg()
    val spark = GraftSession.get("profile-skip")
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.queries.Scratch.dir("graft-skipbench-") + "/events"
    val ev = replicate(
      Tables.load(spark, sfDir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value"),
      replicas).cache()
    val total = ev.count()
    val statsCols = Seq("ts", "user_id", "value")

    // 16 arrival-order batches: time slices, each spanning the full
    // user/value domain (the shape a streaming ingest leaves behind)
    val (loadSec, _) = time {
      val days = (1 to 30).grouped(2).toSeq // 15 two-day slices
      days.zipWithIndex.foreach { case (ds, i) =>
        val slice = ev.filter(F.dayofmonth(F.col("ts")).isin(ds: _*))
        AtomicAppend.append(slice, base, batchId = Some(i.toLong), statsCols = statsCols)
      }
    }
    ev.unpersist()

    val rows = scala.collection.mutable.ArrayBuffer[String]()
    def emit(row: String): Unit = { rows += row; println(row) }

    def leg(name: String, phase: String, pred: Column): Unit = {
      val (kept, skipped) = AtomicAppend.pruneBatches(spark, base, pred)
      // warm times (2nd run): at this toy scale the cold numbers measure
      // plan compilation, not scanning — and the real 100 TB metric is
      // batches_skipped (bytes never listed), not local-SSD seconds
      def warm(f: => Long): (Double, Long) = { f; time(f) }
      val (tPruned, nPruned) = warm(AtomicAppend.read(spark, base, pred).count())
      val (tFull, nFull) = warm(AtomicAppend.read(spark, base).filter(pred).count())
      require(nPruned == nFull, s"$name: pruned $nPruned != full $nFull")
      emit(f"""{"leg":"$name","phase":"$phase","batches_total":${kept.size + skipped.size},""" +
        f""""batches_skipped":${skipped.size},"rows_selected":$nPruned,""" +
        f""""pruned_sec":$tPruned%.3f,"full_sec":$tFull%.3f}""")
    }

    // the user-tail literal derives from the ACTUAL domain (sf-dependent)
    val umax = AtomicAppend.read(spark, base).agg(F.max("user_id")).head().getLong(0)
    val sel2d = F.col("user_id") >= 30L && F.col("user_id") < 60L && F.col("value") >= 150.0
    val sel1d = F.col("user_id") >= umax * 9 / 10
    val selTs = F.col("ts") >= F.to_timestamp(F.lit("2024-01-27 00:00:00"))
    val selVal = F.col("value") >= 400.0

    // phase 1: arrival order — the time predicate skips (slices ARE time
    // ranges), the value/user predicates cannot (honest baseline)
    leg("2d_user_value", "arrival", sel2d)
    leg("ts_range", "arrival", selTs)

    // phase 2: clustered fold on the (user_id, value) plane
    val (clusterSec, ids) = time {
      AtomicAppend.compactClustered(spark, base, Seq("user_id", "value"),
        numBatches = 64, statsCols = statsCols)
    }
    AtomicAppend.vacuum(spark, base)
    leg("2d_user_value", "clustered", sel2d)
    leg("1d_user_tail", "clustered", sel1d)
    leg("1d_value_tail", "clustered", selVal)
    leg("ts_range", "clustered", selTs) // ts is NOT clustered: should keep all

    val nBatches = ids.map(_.size).getOrElse(0)
    val doc = s"""{"metric":"zone_map_skipping","unit":"sec","sf_dir":"$sfDir",""" +
      s""""rows_total":$total,"replicas":$replicas,"load_sec":$loadSec,""" +
      s""""cluster_sec":$clusterSec,"clustered_batches":$nBatches,""" +
      s""""load_start":$load0,"load_end":${graft.Bench.loadavg()},""" +
      s""""rows":[${rows.mkString(",\n ")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), doc.getBytes("UTF-8"))
    spark.stop()
  }
}
