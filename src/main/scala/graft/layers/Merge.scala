package graft.layers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** General MERGE (upsert with update/delete clauses) and SCD Type 2
  * dimension maintenance — the two Delta-style table-maintenance
  * operations the reference gets from its lakehouse format
  * (`MERGE INTO` on Delta tables) and this engine re-expresses as
  * declarative plans over parquet + dynamic partition overwrite. The
  * reference's own upsert surface is insert-only
  * (`realtime_prediction_job.py`'s left-anti prediction sink,
  * [[graft.scoring.RuleModel.newPredictionsOnly]]); these operators add
  * the general forms a warehouse needs for dimension/fact maintenance.
  *
  * Both are CONTENT TRANSFORMS: they return the table's new content as a
  * lazy DataFrame (composable, oracle-checkable — ql07/ql08), and
  * [[mergeInPlace]] adds the partition-scoped copy-on-write commit.
  */
object Merge {

  /** MERGE semantics as one full-outer reconstruction:
    *
    *   - matched (key in both): source's values win for every non-key
    *     column of `source` (SCD1 update); when `deleteWhen` is set and
    *     true on the matched pair, the row is dropped
    *     (`WHEN MATCHED AND cond THEN DELETE`);
    *   - target-only: row kept unchanged;
    *   - source-only: row inserted (columns the source lacks are null).
    *
    * Null keys follow SQL MERGE: they never match (plain equality), so a
    * null-keyed source row inserts and a null-keyed target row survives
    * untouched. `deleteWhen` may reference both sides with `t.`/`s.`
    * qualifiers. Duplicate keys in `source` are the caller's bug
    * (MERGE's standard precondition — the join would fan out); the
    * default guard makes that bug LOUD instead of a silent row
    * multiplication: a count window over the source keys feeds
    * `raise_error`, failing the job at execution with no extra action
    * (one source-sized window pass — the source shuffles on the keys
    * for the join anyway). Disable with `guardDuplicateKeys = false`
    * when the source is unique by construction (a dropDuplicates, the
    * qa17 latest-state compaction).
    *
    * Scale: ONE shuffle of each side on the merge keys. A full-outer
    * join has NO broadcast path in Spark (neither side's unmatched rows
    * can be tracked across executors), so this is the plan for any
    * source size — the lever that keeps the big side small is
    * [[mergeInPlace]]'s partition pruning, which bounds the target side
    * to the touched partitions before this join runs. Columns not in
    * `source` stream through untouched; no driver-side rows.
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
      deleteWhen: Option[Column] = None,
      guardDuplicateKeys: Boolean = true,
      allowSchemaEvolution: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val updateCols = source.columns.filterNot(keys.contains)
    // schema evolution (Delta's mergeSchema analog): columns the source
    // adds are APPENDED to the table — pre-existing target rows carry
    // null there, exactly the backfill semantics a widening ALTER TABLE
    // gives. Off by default: an unexpected new column is usually an
    // upstream contract break worth failing on.
    val newCols = updateCols.filterNot(target.columns.contains)
    require(allowSchemaEvolution || newCols.isEmpty,
      s"source carries columns absent from the target: ${newCols.mkString(",")} " +
        "(pass allowSchemaEvolution = true to append them)")
    val keepCols = target.columns.filterNot(keys.contains)
      .filterNot(updateCols.contains)
    val outColumns = target.columns ++ newCols
    val guarded = if (guardDuplicateKeys) guardUnique(source, keys) else source
    // presence tags: key columns can be null on either side, so
    // side-presence must not be probed through them
    val t = target.withColumn("__in_t", F.lit(1)).as("t")
    val s = guarded.withColumn("__in_s", F.lit(1)).as("s")
    val joined = t.join(s,
      keys.map(k => F.col(s"t.$k") === F.col(s"s.$k")).reduce(_ && _),
      "full_outer")
    val matched = F.col("t.__in_t").isNotNull && F.col("s.__in_s").isNotNull
    val keyCols = keys.map(k => F.coalesce(F.col(s"s.$k"), F.col(s"t.$k")).as(k))
    val updated = updateCols.map(c =>
      F.when(F.col("s.__in_s").isNotNull, F.col(s"s.$c"))
        // an evolved column has no target side — unmatched target rows
        // backfill null there
        .otherwise(if (newCols.contains(c)) F.lit(null) else F.col(s"t.$c"))
        .as(c))
    val kept = keepCols.map(c => F.col(s"t.$c").as(c))
    val deleted = deleteWhen match {
      // coalesce: a NULL condition on a matched pair means NOT deleted
      // (SQL MERGE's WHEN MATCHED AND cond semantics — the ql07 oracle's
      // NOT coalesce(del, FALSE)); without it, filter(!null) would
      // silently DROP the row instead of updating it
      case Some(cond) => F.coalesce(matched && cond, F.lit(false))
      case None => F.lit(false)
    }
    joined.filter(!deleted)
      .select(keyCols ++ updated ++ kept: _*)
      // restore the target's column order (evolved columns appended
      // last) so the result unions/overwrites cleanly against the
      // existing table
      .select(outColumns.map(F.col).toIndexedSeq: _*)
  }

  /** Partition-scoped copy-on-write commit of [[merge]]: only partitions
    * the source TOUCHES are read, merged, and rewritten (dynamic
    * partition overwrite, same idempotent replay discipline as the index
    * folds); untouched partitions are never opened. A metadata-sized
    * collect of the source's distinct partition values drives both the
    * target-side partition pruning (a literal IN that reaches the scan)
    * and the overwrite's footprint.
    *
    * CONTRACT: `partitionCol` must be functionally determined by the
    * merge keys on BOTH sides (the date-partitioned-fact shape, e.g.
    * keyed (order_date, order_id)) — an update that moves a row across
    * partitions would leave the stale copy in the old partition unread
    * and untouched. `assertPartitionLocal` (default on) verifies the
    * SOURCE half of that contract with one batch-sized aggregate (every
    * key maps to exactly one partition value); the target half is the
    * table's write invariant.
    *
    * Idempotent under replay: re-running with the same source overwrites
    * the same partitions with the same content. Returns the touched
    * partition values.
    */
  def mergeInPlace(spark: SparkSession, path: String, source0: DataFrame,
      keys: Seq[String], partitionCol: String,
      deleteWhen: Option[Column] = None,
      assertPartitionLocal: Boolean = true): Seq[Any] = {
    // the source lineage feeds three consumers (contract check, touched
    // collect, the merge write) — cache it so an expensive upstream (a
    // compacted CDC batch) computes once per commit
    val source = source0.cache()
    try {
      if (assertPartitionLocal && !keys.contains(partitionCol)) {
        val bad = source.groupBy(keys.map(F.col): _*)
          .agg(F.countDistinct(F.col(partitionCol)).as("n"))
          .filter(F.col("n") > 1).limit(1).count()
        require(bad == 0,
          s"source maps one merge key to multiple $partitionCol values — a " +
            "cross-partition move is outside mergeInPlace's contract; use merge + full rewrite")
      }
      // Bootstrap: on a not-yet-existing table path the merge degenerates
      // to "insert everything" — write the source as the initial
      // partitioned content instead of failing later with an unrelated
      // PATH_NOT_FOUND from mergePlan's target scan (mergeSnapshot has
      // the same first-call path; the fact-table entry point needs one
      // too). deleteWhen does NOT filter here: WHEN MATCHED AND cond
      // THEN DELETE only fires on matched pairs, and against an empty
      // target every source row is source-only — inserted regardless,
      // exactly [[merge]]'s `matched && cond` semantics.
      val targetPath = new org.apache.hadoop.fs.Path(path)
      val exists = targetPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(targetPath)
      if (!exists) {
        val touched = source.select(partitionCol).distinct()
          .collect().map(_.get(0)).toSeq
        if (touched.isEmpty) return touched
        require(!touched.contains(null),
          s"source carries a null $partitionCol — the null partition cannot be " +
            "copy-on-write merged on later batches; clean the source first")
        // same duplicate-key tripwire the joined path gets from merge()
        guardUnique(source, keys)
          .write.mode("overwrite").partitionBy(partitionCol).parquet(path)
        return touched
      }
      val (touched, merged) = mergePlan(spark, path, source, keys, partitionCol, deleteWhen)
      if (touched.isEmpty) return touched
      // a NULL partition value cannot be pruned (isin(null) matches
      // nothing), so the existing null-partition rows would be excluded
      // from the merge input while the dynamic overwrite REPLACES that
      // partition — silently deleting them. Reject instead.
      require(!touched.contains(null),
        s"source carries a null $partitionCol — the null partition cannot be " +
          "copy-on-write merged (pruning can't select it); clean the source or use merge + full rewrite")
      // path-based writes honor the per-write dynamic option, but route
      // through the session lock anyway so a concurrent catalog writer in
      // the same session can never observe a static window
      graft.operators.NearDupIndex.withDynamicOverwrite(spark) {
        merged.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partitionCol).parquet(path)
      }
      touched
    } finally source.unpersist()
  }

  /** Lazy duplicate-key tripwire: a count window over `keys` feeds
    * `raise_error`, so a duplicated (fully non-null) key fails the job
    * at execution instead of silently fanning the join out. Null keys
    * are exempt — under SQL MERGE they never match, so several
    * null-keyed rows are legitimate independent inserts.
    */
  private def guardUnique(source: DataFrame, keys: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(F.col): _*)
    val allSet = keys.map(k => F.col(k).isNotNull).reduce(_ && _)
    source.withColumn("__nk", F.count(F.lit(1)).over(w))
      .withColumn(keys.head,
        F.when(F.col("__nk") > 1 && allSet, F.raise_error(F.concat(
          F.lit(s"merge source has duplicate keys (${keys.mkString(",")}), e.g. "),
          F.concat_ws(",", keys.map(k => F.col(k).cast("string")): _*)))
          .cast(source.schema(keys.head).dataType))
          .otherwise(F.col(keys.head)))
      .drop("__nk")
  }

  /** [[mergeInPlace]]'s read side, exposed so PlanSpec can pin that the
    * literal touched-partition predicate reaches the scan as a
    * PartitionFilter — the invariant the copy-on-write cost model rests
    * on. */
  private[graft] def mergePlan(spark: SparkSession, path: String,
      source: DataFrame, keys: Seq[String], partitionCol: String,
      deleteWhen: Option[Column]): (Seq[Any], DataFrame) = {
    val touched = source.select(partitionCol).distinct().collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return (touched, source)
    val pruned = spark.read.parquet(path)
      .filter(F.col(partitionCol).isin(touched: _*))
    (touched, merge(pruned, source, keys, deleteWhen))
  }

  /** [[merge]] committed against a [[Snapshots]]-versioned table: read
    * the latest version, merge, snapshot the result as the next version
    * — auditable dimension maintenance where every MERGE batch leaves
    * the pre-merge state pinnable (`VERSION AS OF`). A first call on an
    * empty path bootstraps version 0 from the source. Returns the
    * committed version. Full-copy per version — the dimension shape
    * ([[Snapshots]] scaladoc); fact-sized tables use [[mergeInPlace]].
    */
  def mergeSnapshot(spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String], deleteWhen: Option[Column] = None): Long =
    Snapshots.latestVersion(spark, path) match {
      case None => Snapshots.write(source, path)
      case Some(_) =>
        Snapshots.write(
          merge(Snapshots.read(spark, path), source, keys, deleteWhen), path)
    }

  /** [[scd2]] committed against a [[Snapshots]]-versioned table — the
    * two history axes composed: scd2 keeps ROW-level validity intervals
    * inside the table, the snapshot keeps TABLE-level states across
    * maintenance batches (e.g. "what did the whole dim look like before
    * Tuesday's load" — something intervals alone can't answer once a
    * bad batch is corrected). Returns the committed version.
    */
  def scd2Snapshot(spark: SparkSession, path: String, updates: DataFrame,
      key: String, changeTs: Column): Long =
    Snapshots.write(scd2(Snapshots.read(spark, path), updates, key, changeTs), path)

  /** Change data feed between two table states — Delta CDF's
    * `table_changes` analog as a content transform: every row of the diff
    * carries `change_type` ∈ {insert, delete, update_preimage,
    * update_postimage} (Delta's vocabulary), where
    *
    *   - a key only in `after` emits its row as `insert`;
    *   - a key only in `before` emits its row as `delete`;
    *   - a key in both whose non-key columns differ (null-safe `<=>`)
    *     emits TWO rows — the before image and the after image;
    *   - an unchanged key emits nothing.
    *
    * This is the downstream-sync primitive the lakehouse story needs
    * beside time travel: "what changed between version 3 and 7" feeds
    * incremental consumers (index maintenance, cache invalidation,
    * audit) without re-reading either full state. Both frames must share
    * the key columns and compared columns = `before`'s non-key columns
    * (schema evolution diffs are a MERGE concern, not a CDF one).
    *
    * Scale: ONE shuffle of each side on the keys (same full-outer shape
    * as [[merge]] — no broadcast path exists for full-outer); the
    * update explode is narrow. Null keys never match (SQL join
    * semantics): a null-keyed row on either side surfaces as its side's
    * insert/delete, which is the honest reading of an unmatchable key.
    * Oracle-gated as ql09 (DuckDB full-outer twin).
    */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    val cols = before.columns.toSeq
    require(after.columns.toSeq == cols,
      s"diff requires identical schemas; before=${cols.mkString(",")} " +
        s"after=${after.columns.mkString(",")}")
    val attrs = cols.filterNot(keys.contains)
    // a duplicated key on either side would fan the full-outer join out
    // and emit phantom change rows — CDF over a non-keyed table is
    // ill-defined. Same lazy tripwire as merge(): fail at execution,
    // no extra action.
    val b = guardUnique(before, keys).withColumn("__in_b", F.lit(1)).as("b")
    val a = guardUnique(after, keys).withColumn("__in_a", F.lit(1)).as("a")
    val joined = b.join(a,
      keys.map(k => F.col(s"b.$k") === F.col(s"a.$k")).reduce(_ && _),
      "full_outer")
    val inB = F.col("b.__in_b").isNotNull
    val inA = F.col("a.__in_a").isNotNull
    val changed = attrs
      .map(c => !(F.col(s"b.$c") <=> F.col(s"a.$c")))
      .reduceOption(_ || _).getOrElse(F.lit(false))
    def img(side: String, tpe: String) =
      F.struct(cols.map(c => F.col(s"$side.$c").as(c)) :+ F.lit(tpe).as("change_type"): _*)
    val images = F.when(!inB, F.array(img("a", "insert")))
      .when(!inA, F.array(img("b", "delete")))
      .when(changed, F.array(img("b", "update_preimage"), img("a", "update_postimage")))
      .otherwise(F.array())
    joined.select(F.explode(images).as("__c"))
      .select((cols :+ "change_type").map(c => F.col(s"__c.$c")): _*)
  }

  /** [[diff]] between two pinned [[Snapshots]] versions — time travel's
    * reading side composed with the change feed: `VERSION AS OF v1` →
    * `VERSION AS OF v2` changes without replaying the maintenance
    * batches in between.
    */
  def diffSnapshots(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long, keys: Seq[String]): DataFrame =
    diff(Snapshots.read(spark, path, fromVersion),
      Snapshots.read(spark, path, toVersion), keys)

  /** SCD Type 2 dimension maintenance: `dim` carries
    * (key, attrs..., valid_from, valid_to, is_current) and `updates`
    * carries (key, tracked attrs...) observed at `changeTs`. Emits the
    * dim's new content:
    *
    *   - a current row whose tracked attrs CHANGED is closed
    *     (valid_to = changeTs, is_current = false) and a new current
    *     version inserted (valid_from = changeTs, valid_to = null);
    *   - an update identical on every tracked attr is a no-op (no
    *     version churn from redundant re-deliveries);
    *   - a brand-new key inserts its first current version (untracked
    *     attr columns null);
    *   - already-closed history rows pass through untouched — zero joins
    *     on the history side, so cost is sized by |current| + |updates|,
    *     never the accumulated version count.
    *
    * Tracked attrs = every non-key column of `updates` (each must exist
    * in `dim`); change detection is null-safe (`<=>`). One update row
    * per key per call (MERGE's precondition); feed multi-version
    * histories one changeTs at a time — version chains stay linear by
    * construction.
    */
  def scd2(dim: DataFrame, updates0: DataFrame, key: String,
      changeTs: Column, guardDuplicateKeys: Boolean = true): DataFrame =
    scd2WithFeed(dim, updates0, key, changeTs, guardDuplicateKeys)._1

  /** [[scd2]] plus the WRITER-SIDE change feed: the batch's exact effect
    * on the dim, in [[diff]]'s vocabulary over the dim's row identity
    * (key, valid_from) — computed from the same join that decides the
    * actions, so a maintenance cadence can hand its downstream views the
    * change set it already knows instead of re-deriving it with a
    * full-outer diff of two whole table versions (the Delta CDF role:
    * the feed comes from the commit, not from a post-hoc state diff).
    *
    *   - a close-out emits the old current row as `update_preimage` and
    *     the closed row (valid_to = changeTs, is_current = false) as
    *     `update_postimage`;
    *   - each new attribute version (changed key or brand-new key) emits
    *     its current row as `insert`;
    *   - no-op updates and untouched/history rows emit nothing, and scd2
    *     never deletes, so the feed carries no `delete` rows.
    *
    * Equivalence contract: the feed equals
    * `diff(dim, scd2(dim, ...), Seq(key, "valid_from"))` whenever
    * `changeTs` differs from every surviving row's valid_from — the
    * normal case when event time advances between batches. A close-out
    * at changeTs EQUAL to the closed row's valid_from mints a duplicate
    * (key, valid_from) identity, where diff itself throws (guardUnique)
    * while this feed stays correct for DELTA consumers
    * ([[graft.layers.IncrementalView.applyChanges]] applies signed
    * changes, not identities). Cost: the scd2 join the writer runs
    * anyway — no second shuffle.
    */
  def scd2WithFeed(dim: DataFrame, updates0: DataFrame, key: String,
      changeTs: Column, guardDuplicateKeys: Boolean = true): (DataFrame, DataFrame) = {
    val updates =
      if (guardDuplicateKeys) guardUnique(updates0, Seq(key)) else updates0
    val tracked = updates.columns.filterNot(_ == key)
    require(tracked.nonEmpty, "scd2 needs at least one tracked attribute")
    require(tracked.forall(dim.columns.contains),
      "updates carry columns absent from the dim: " +
        tracked.filterNot(dim.columns.contains).mkString(","))
    val scdCols = Seq("valid_from", "valid_to", "is_current")
    require(scdCols.forall(dim.columns.contains),
      s"dim must carry ${scdCols.mkString(", ")}")
    val history = dim.filter(!F.col("is_current"))
    val current = dim.filter(F.col("is_current"))
    val ju = current.as("d").join(
      updates.withColumn("__upd", F.lit(1)).as("u"), Seq(key), "full_outer")
    val updPresent = F.col("u.__upd").isNotNull
    val isNewKey = F.col("d.is_current").isNull
    val changed = tracked.map(c => !(F.col(s"d.$c") <=> F.col(s"u.$c")))
      .reduce(_ || _)
    val attrCols = dim.columns.filterNot(c => c == key || scdCols.contains(c))
    // d-side row under `cond`, with the validity columns overridable —
    // shared by the close-out (flipped), the untouched rows, and the
    // feed's preimage (both verbatim)
    def dRow(cond: Column, validTo: Column, isCurrent: Column): DataFrame =
      ju.filter(cond).select(Seq(F.col(key)) ++
        attrCols.map(c => F.col(s"d.$c").as(c)) ++
        Seq(F.col("d.valid_from").as("valid_from"),
          validTo.as("valid_to"), isCurrent.as("is_current")): _*)
    val closing = !isNewKey && updPresent && changed
    val closeOut = dRow(closing, changeTs, F.lit(false))
    val newVersion = ju.filter(updPresent && (isNewKey || changed))
      .select(Seq(F.col(key)) ++
        attrCols.map(c =>
          (if (tracked.contains(c)) F.col(s"u.$c")
           else F.col(s"d.$c")).as(c)) ++
        Seq(changeTs.as("valid_from"),
          F.lit(null).cast(dim.schema("valid_to").dataType).as("valid_to"),
          F.lit(true).as("is_current")): _*)
    val untouched = dRow(!isNewKey && (!updPresent || !changed),
      F.col("d.valid_to"), F.col("d.is_current"))
    val order = dim.columns.toIndexedSeq
    val content = Seq(history, closeOut, newVersion, untouched)
      .map(_.select(order.map(F.col): _*))
      .reduce(_ unionByName _)
    // the preimage of a close-out is the OLD current row verbatim
    // (valid_to null, is_current true) — selected from the same join
    val preimage = dRow(closing, F.col("d.valid_to"), F.col("d.is_current"))
    val feed = Seq(
        preimage -> "update_preimage",
        closeOut -> "update_postimage",
        newVersion -> "insert")
      .map { case (df, t) =>
        df.select(order.map(F.col): _*).withColumn("change_type", F.lit(t))
      }
      .reduce(_ unionByName _)
    (content, feed)
  }
}
