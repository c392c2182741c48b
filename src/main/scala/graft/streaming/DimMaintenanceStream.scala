package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{functions => F}

import graft.layers.{IncrementalView, Merge, Snapshots}

/** A downstream grouped-summary view kept current by
  * [[graft.layers.IncrementalView.refresh]] from the maintenance cadence:
  * after each committed dim version the refresh diffs the base from the
  * view's version to the new latest and applies deltas — change-set-sized
  * work, never a rescan (plus optional exact MIN/MAX through the bounded
  * synopsis). `keys` is the base table's ROW identity for the diff — for
  * an SCD2 dim that is (businessKey, valid_from): a close-out is then an
  * update (valid_to/is_current flip, measures unchanged) and each new
  * attribute version is an insert.
  */
final case class MaintainedView(
    viewPath: String,
    keys: Seq[String],
    groupCols: Seq[String],
    measureCols: Seq[String],
    minMaxCol: Option[String] = None,
    minMaxK: Int = 32,
    distinctCol: Option[String] = None)

/** Streaming CDC dimension maintenance — the engine's three table-
  * maintenance pieces composed into one standing leg:
  *
  *   1. each micro-batch of change events is COMPACTED to its latest
  *      state per key (qa17's latest-row semantics, computed as ONE
  *      ordered-struct max — `(ts, attrs...)` gives a total order, so
  *      the survivor is deterministic even when a key changes twice in
  *      one batch or the batch is replayed with rows in another order);
  *   2. the compacted batch drives [[graft.layers.Merge.scd2]] against
  *      the base snapshot — changed attrs close the current version and
  *      open a new one, redundant re-deliveries are no-ops, new keys
  *      insert (the duplicate-key tripwire is OFF: compaction
  *      guarantees uniqueness by construction). Cross-batch ordering is
  *      event-time last-writer-wins: an event older than its key's
  *      current `valid_from` is dropped as stale rather than regressing
  *      the dimension;
  *   3. the new dimension content lands via
  *      [[graft.layers.Snapshots.writeVersion]] under `version=<batchId>`
  *      — the streaming epoch discipline applied to snapshots.
  *
  * Delivery semantics: effectively exactly-once under replay. scd2 is
  * idempotent on re-application (the replayed batch's attrs equal the
  * already-updated current rows → no churn), the snapshot write
  * overwrites the batch's OWN version directory, and the LATEST pointer
  * only advances — so a crash anywhere between compaction and commit
  * converges on replay, and the version history carries no duplicates.
  * Batch-level `valid_from`/`valid_to` stamps use the batch's max event
  * time (deterministic per batch content); finer-than-batch ordering is
  * already resolved by step 1.
  *
  * Every version of the dimension stays pinnable (`VERSION AS OF`) until
  * vacuumed — the audit trail a plain rewritten dim cannot give ("which
  * batch flipped this customer's segment, and what did the table look
  * like before it").
  *
  * Scale: the dimension shape — the per-trigger cost is one
  * batch-sized compaction, one current-slice full-outer join
  * (history rows stream through scd2 join-free), one dimension-sized
  * snapshot write. Fact-sized tables belong on partitioned appends +
  * [[graft.layers.Merge.mergeInPlace]], not here.
  */
object DimMaintenanceStream {

  /** One micro-batch: compact → scd2 → version-stamped snapshot →
    * (optionally) downstream-view refresh. Exposed for specs to drive
    * crash/replay scenarios directly. `batch` must carry `key`, `tsCol`,
    * and the tracked attrs (every other column).
    */
  private[graft] def processBatch(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      dimPath: String,
      key: String,
      tsCol: String,
      view: Option[MaintainedView] = None): Unit = {
    val feed = commitDim(spark, batch, batchId, dimPath, key, tsCol)
    // AFTER the dim commit, and also on the stale-only/no-op paths: the
    // refresh is keyed on the VIEW's own pointer, so it no-ops when
    // current, catches the view up if a prior crash landed between the
    // dim commit and the refresh, and a replayed batch cannot
    // double-apply a feed — the same exactly-once discipline as the dim.
    // The committing path hands the view the WRITER-SIDE feed the scd2
    // merge already computed (refreshFromFeed) — change-set-sized work
    // instead of a full-outer re-diff of two dim versions; the no-op /
    // stale-only / bootstrap paths take the diff-path refresh, which
    // also catches a view left lagging by a crash between the dim commit
    // and the refresh (the feed would not line up there, and
    // refreshFromFeed falls back to the same diff path by itself).
    try view.foreach { mv =>
      feed match {
        case Some((changes, from, to)) =>
          IncrementalView.refreshFromFeed(spark, dimPath, mv.viewPath, mv.keys,
            mv.groupCols, mv.measureCols, changes, from, to,
            mv.minMaxCol, mv.minMaxK, mv.distinctCol)
        case None =>
          IncrementalView.refresh(spark, dimPath, mv.viewPath, mv.keys,
            mv.groupCols, mv.measureCols, mv.minMaxCol, mv.minMaxK, mv.distinctCol)
      }
    } finally
      // the feed is an eager localCheckpoint — release its blocks NOW
      // (ADVICE r12): waiting for GC + ContextCleaner lets a standing
      // stream accumulate one checkpointed frame of executor memory/disk
      // per trigger in the meantime. Dataset.unpersist would NOT do it:
      // a checkpointed frame is not a CacheManager entry — the blocks
      // hang off the LogicalRDD's RDD, so that is what gets unpersisted.
      feed.foreach { case (changes, _, _) => releaseCheckpoint(changes) }
  }

  /** Unpersist the block-backed RDDs under a localCheckpoint'd frame. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** Commits the batch into the dim; returns the writer-side change feed
    * `(changes, fromVersion, toVersion)` when a new version was committed
    * ON TOP of an existing one — None on the no-op, stale-only, and
    * bootstrap paths (a bootstrap's "feed" is the whole first version;
    * the view bootstraps from the base just as cheaply). The feed frame
    * is eagerly materialized (localCheckpoint, change-set-sized) before
    * the batch caches release, so downstream consumers never re-run the
    * scd2 derivation.
    */
  private def commitDim(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      dimPath: String,
      key: String,
      tsCol: String): Option[(DataFrame, Long, Long)] = {
    val attrs = batch.columns.filterNot(c => c == key || c == tsCol).toSeq
    require(attrs.nonEmpty, s"batch needs at least one tracked attr beside $key/$tsCol")
    // 1. latest state per key: ordered-struct max — (ts, attrs...) is a
    // total order, so the pick is deterministic under replay/reorder
    val compacted = batch
      .groupBy(F.col(key))
      .agg(F.max(F.struct((tsCol +: attrs).map(F.col): _*)).as("__m"))
      .select(F.col(key) +: (tsCol +: attrs).map(c => F.col(s"__m.$c").as(c)): _*)
      .cache()
    try {
      if (compacted.isEmpty) return None
      // 2. current dim = the greatest committed version STRICTLY BELOW
      // this batch — never "latest": a replayed batch's latest IS its
      // own target version, and the lazy read would have its files
      // deleted under it by the overwrite (observed as FILE_NOT_EXIST
      // mid-write). Basing on < batchId gives the replay the SAME base
      // as the original attempt — identical recompute — and the write
      // target is never a source directory. (Corollary: while the
      // stream runs, vacuum must keep at least the last two versions.)
      val committed = Snapshots.versions(spark, dimPath)
      val prevVersion = committed.filter(_ < batchId).lastOption
      val dim = prevVersion match {
        case Some(v) => Snapshots.read(spark, dimPath, v)
        case None =>
          // Bootstrap branch — ONLY valid on a genuinely empty dim. If
          // committed versions >= batchId exist that this lineage has no
          // base for, the path was pre-seeded (Snapshots.writeVersion) or
          // the checkpoint was deleted so batchIds restarted at 0; merging
          // against an empty dim would silently overwrite version=batchId
          // and destroy pinned audit history while LATEST points higher.
          // Fail loudly instead: resume the original checkpoint or point
          // the stream at a fresh dim path.
          require(committed.isEmpty,
            s"dim at $dimPath already holds committed versions " +
              s"[${committed.mkString(", ")}] with none below batch $batchId — " +
              "this checkpoint lineage did not write them (pre-seeded path or " +
              "reset checkpoint). Refusing to overwrite pinned history.")
          val tsType = batch.schema(tsCol).dataType
          val schema = StructType(
            batch.schema.fields.filter(f => f.name == key || attrs.contains(f.name)) ++
              Seq(
                org.apache.spark.sql.types.StructField("valid_from", tsType),
                org.apache.spark.sql.types.StructField("valid_to", tsType),
                org.apache.spark.sql.types.StructField("is_current",
                  org.apache.spark.sql.types.BooleanType)))
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
      // 2.5 event-time last-writer-wins ACROSS batches: a late event
      // whose ts precedes its key's current valid_from is STALE — the
      // dim already holds fresher state — and applying it would regress
      // the attribute and mint an inverted interval (valid_to <
      // valid_from). Compaction only orders within the batch; this
      // left-join compares against the dim. Conservative at batch
      // granularity: valid_from carries the BATCH's max event time, so
      // an event older than any co-batched one can be dropped — the
      // price of batch-level stamping, documented above.
      val fresh = compacted
        .join(dim.filter(F.col("is_current"))
          .select(F.col(key), F.col("valid_from").as("__vf")), Seq(key), "left")
        .filter(F.col("__vf").isNull || F.col(tsCol) >= F.col("__vf"))
        .drop("__vf")
        .cache()
      try {
        if (fresh.isEmpty) return None // nothing but stale re-deliveries
        val changeTs = fresh.agg(F.max(F.col(tsCol))).head().get(0)
        val (next, changes) = Merge.scd2WithFeed(dim, fresh.drop(tsCol), key,
          F.lit(changeTs),
          guardDuplicateKeys = false) // compaction made keys unique
        // 3. exactly-once commit: batch's own version, pointer only advances
        Snapshots.writeVersion(next, dimPath, batchId)
        // materialize the feed NOW, while compacted/fresh are still
        // cached: returned lazy, its lineage (compaction agg, stale
        // filter, scd2 join) would re-execute per view-refresh consumer
        // after the finally-unpersists below — the exact re-derivation
        // the writer-side feed exists to avoid. Change-set-sized.
        prevVersion.map(v => (changes.localCheckpoint(), v, batchId))
      } finally fresh.unpersist()
    } finally compacted.unpersist()
  }

  /** Follow a CDC change-event directory (JSON lines with `key`,
    * `tsCol`, and tracked attr columns per `schema`) into a versioned
    * SCD2 dimension at `dimPath`.
    */
  def start(
      spark: SparkSession,
      inputDir: String,
      dimPath: String,
      checkpointDir: String,
      schema: StructType,
      key: String,
      tsCol: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      maxFilesPerTrigger: Int = 10,
      view: Option[MaintainedView] = None): StreamingQuery = {
    val changes = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inputDir)
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatch(spark, batch, batchId, dimPath, key, tsCol, view)
      }
      .start()
  }
}
