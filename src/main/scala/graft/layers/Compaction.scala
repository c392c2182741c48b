package graft.layers

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Small-file compaction for partitioned parquet layers — the engine-side
  * realization of the reference's Delta `optimizeWrite` / `autoCompact`
  * knobs (`docs/DEVELOPER_GUIDE.md:632-635`), which are configuration-only
  * there. Streaming sinks append one file per trigger per partition, so a
  * 10-second trigger writes ~8,640 files/partition/day; at 100 TB the
  * resulting file-listing and task-granularity overheads dominate scan
  * cost long before data volume does.
  *
  * Scale design:
  *   - partition SELECTION is metadata-only (one FileSystem listing —
  *     object-store safe, resolved like [[Hwm.readIfExists]]); no data is
  *     read for partitions that are already compact, and untouched
  *     partitions' files are left byte-identical;
  *   - the REWRITE is one distributed job: a partition-pruned scan of the
  *     affected partitions, `repartition(partitionCols)` so each rewritten
  *     partition is produced by one task run (split only by
  *     `maxRecordsPerFile` derived from the observed bytes/row), written
  *     with dynamic partition overwrite so concurrent readers of other
  *     partitions never see a hole;
  *   - no driver-side loop over data — the driver touches partition
  *     metadata (thousands of entries), never rows.
  */
object Compaction {

  /** One partition's compaction candidacy: spec is the `k=v/k=v` dir. */
  final case class PartitionFiles(spec: String, files: Int, bytes: Long)

  /** List leaf partition dirs (`k=v` components) with file count + bytes.
    * Hive default (null) partitions are skipped — appends here never
    * write them (partition columns are derived, non-null by contract).
    */
  def listPartitions(spark: SparkSession, root: String, depth: Int): Seq[PartitionFiles] = {
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    // listStatus returns scheme-qualified paths; qualify the root the same
    // way so the partition spec strips to a relative `k=v/k=v`
    val rootPath = fs.makeQualified(new Path(root))
    def walk(p: Path, level: Int): Seq[Path] =
      if (level == 0) Seq(p)
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap(s => walk(s.getPath, level - 1))
    walk(rootPath, depth).flatMap { dir =>
      val files = fs.listStatus(dir).toSeq.filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      if (files.isEmpty) None
      else Some(PartitionFiles(
        dir.toString.stripPrefix(rootPath.toString).stripPrefix("/"),
        files.size, files.map(_.getLen).sum))
    }
  }

  /** Compact partitions of the parquet layer at `root` that have more
    * than one file and average under `targetBytes / 2` per file. Returns
    * the report (partition, files_before, bytes) of what was rewritten;
    * empty report = nothing needed, nothing touched.
    *
    * Session-conf caveat: the partition-type-inference and
    * maxRecordsPerFile toggles below mutate SESSION-global conf for the
    * duration of their window (restored after). This tool assumes the
    * single-driver maintenance context it is built for; to run it on a
    * SparkSession shared with concurrent readers/writers, give it a
    * cloned session (`spark.newSession()`) so the toggles stay private.
    */
  def compact(spark: SparkSession, root: String, partitionCols: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    import spark.implicits._
    require(partitionCols.nonEmpty, "compact() is for partitioned layers")
    val parts = listPartitions(spark, root, partitionCols.length)
    val needy = parts.filter(p => p.files > 1 && p.bytes / p.files < targetBytes / 2)
    if (needy.isEmpty) return Seq.empty[(String, Int, Long)]
      .toDF("partition", "files_before", "bytes")

    // partition spec "y=2024/m=3" → value key "2024/3" for the pruning filter
    def valueKey(spec: String): String =
      spec.split('/').map(_.split("=", 2)(1)).mkString("/")
    val keys = needy.map(p => valueKey(p.spec))
    val keyCol = F.concat_ws("/", partitionCols.map(c => F.col(c).cast("string")): _*)

    // The keys are raw dir-name strings; read the partition columns as raw
    // strings too. With type inference on, Spark re-infers e.g. int for a
    // zero-padded "m=03" dir and casts back to "3" — the comparison never
    // matches and compact() silently rewrites nothing while still reporting
    // those partitions. Inference happens when the relation is resolved, so
    // the conf only needs to cover the spark.read call. The rewrite then
    // round-trips the literal dir value ("03" stays "m=03"), and partition
    // column types live only in dir names, so later inference-on readers
    // are unaffected.
    val conf0 = spark.sessionState.conf
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prevInfer = conf0.getConfString(inferKey, "true")
    conf0.setConfString(inferKey, "false")
    val layer =
      try spark.read.parquet(root).filter(keyCol.isin(keys: _*))
      finally conf0.setConfString(inferKey, prevInfer)
    // derive maxRecordsPerFile from observed bytes/row of the needy set
    val rows = layer.count()
    val bytes = needy.map(_.bytes).sum
    val maxRecords = if (rows == 0) Long.MaxValue
      else math.max(1L, targetBytes / math.max(1L, bytes / rows))

    // maxRecordsPerFile must go through the session conf (the writer
    // option is not honored on the dynamic-overwrite path); restore the
    // caller's value afterwards
    val conf = spark.sessionState.conf
    val prev = conf.getConfString("spark.sql.files.maxRecordsPerFile", "0")
    conf.setConfString("spark.sql.files.maxRecordsPerFile", maxRecords.toString)
    try {
      layer
        .repartition(partitionCols.map(F.col): _*)
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic") // only rewritten specs replaced
        .partitionBy(partitionCols: _*)
        .parquet(root)
    } finally conf.setConfString("spark.sql.files.maxRecordsPerFile", prev)

    needy.map(p => (p.spec, p.files, p.bytes)).toDF("partition", "files_before", "bytes")
  }

  /** Fold COLD partitions of a path-based layer into one consolidated
    * partition — the partition-COUNT maintenance [[compact]] (which only
    * merges files WITHIN partitions) cannot do. The ingest streams land
    * survivors under `batch=<trigger id>/`, one directory per trigger:
    * a 10-second cadence mints ~8,640 partitions/day, and at 100 TB the
    * listing cost of a reader grows with trigger COUNT, not data. This
    * folds every `partitionCol=N` with N <= `upTo` into
    * `partitionCol=<consolidatedValue>`, bounding directory counts the
    * way [[graft.operators.IvfIndex.compact]] bounds epoch file-sets.
    *
    * Correctness contract: layer rows must be GLOBALLY UNIQUE as full
    * rows (both accepted layers are — dedup admits each doc/vector
    * once), because the fold's fixpoint is `dropDuplicates` over
    * whatever cold + consolidated content a re-run finds. That makes
    * every crash window converge: staging is recomputed from surviving
    * sources, the consolidated write is a dynamic partition overwrite,
    * and a death mid-delete leaves survivors whose content the
    * consolidated partition already holds. Pass `upTo` = current batch
    * id - 1 from a streaming caller: checkpoint-committed batches can
    * never replay, so folding them cannot race a trigger's own
    * `batch=<id>` overwrite. Provenance trade, stated plainly: folded
    * rows lose their per-batch provenance value (they all become
    * `consolidatedValue`); hot partitions keep theirs.
    *
    * Each fold rewrites the consolidated partition in full — cost grows
    * with the archived corpus, so the CADENCE (not the call) is what
    * keeps amortized per-trigger cost batch-sized; run it from the
    * single maintenance driver like every other fold here.
    *
    * Returns the number of cold partitions folded (0 = nothing to do,
    * nothing touched).
    */
  def foldColdPartitions(spark: SparkSession, root: String, partitionCol: String,
      upTo: Long, consolidatedValue: Long = -1L): Int = {
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val rootPath = fs.makeQualified(new Path(root))
    if (!fs.exists(rootPath)) return 0
    val cold = fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
      .map(_.getPath.getName.stripPrefix(s"$partitionCol=").toLong)
      .filter(n => n <= upTo && n != consolidatedValue)
    if (cold.isEmpty) return 0

    // staging OUTSIDE the layer root — a non-partition directory inside
    // it would break every reader's partition discovery
    val staging = s"${root}__folding"
    val dataCols = spark.read.parquet(root).columns.filter(_ != partitionCol).toSeq
    spark.read.parquet(root)
      .filter(F.col(partitionCol) <= upTo) // partition-pruned: cold + consolidated only
      .select(dataCols.map(F.col): _*)
      .dropDuplicates()
      .write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging)
      .withColumn(partitionCol, F.lit(consolidatedValue))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(root)
    cold.foreach(n =>
      fs.delete(new Path(s"$root/$partitionCol=$n"), true))
    fs.delete(new Path(staging), true)
    cold.size
  }

  /** [[compact]] for partitioned CATALOG tables — including bucketed ones
    * like [[graft.operators.NearDupIndex]]'s relations, which the
    * path-based [[compact]] cannot rewrite (a raw parquet write would
    * lose the bucket metadata the metastore carries). Partition selection
    * is the same metadata-only FS listing against the table's location;
    * the rewrite stages the needy partitions in a temporary table (a
    * table cannot be inserted into while it is being read), then folds
    * the staging copy back via dynamic partition overwrite. `insertInto`
    * on a bucketed table re-clusters on write, so bucket layout — and
    * every bucket-local join plan downstream — is preserved; the write
    * also coalesces each rewritten partition to its natural bucket file
    * count. Rewriting moves rows within their own partitions only, so
    * table contents are unchanged.
    *
    * Same single-maintenance-driver context and partition-value caveat
    * as [[compact]] (dir-name strings must round-trip the cast-to-string
    * of the column value; zero-padded values would not).
    */
  def compactTable(spark: SparkSession, table: String,
      targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    import spark.implicits._
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val partitionCols = meta.partitionColumnNames
    require(partitionCols.nonEmpty, "compactTable() is for partitioned tables")
    val parts = listPartitions(spark, meta.location.toString, partitionCols.length)
    // a bucketed partition can never hold fewer than one file per bucket,
    // so that — not 1 — is the fragmentation floor
    val minFiles = meta.bucketSpec.map(_.numBuckets).getOrElse(1)
    val needy = parts.filter(p => p.files > minFiles && p.bytes / p.files < targetBytes / 2)
    if (needy.isEmpty) return Seq.empty[(String, Int, Long)]
      .toDF("partition", "files_before", "bytes")

    def valueKey(spec: String): String =
      spec.split('/').map(_.split("=", 2)(1)).mkString("/")
    val keys = needy.map(p => valueKey(p.spec))
    val keyCol = F.concat_ws("/", partitionCols.map(c => F.col(c).cast("string")): _*)

    // catalog table schemas list partition columns last — exactly the
    // positional order insertInto expects, preserved through the staging
    // round trip
    val staging = s"${table}__compacting"
    spark.table(table).filter(keyCol.isin(keys: _*))
      .write.mode("overwrite").saveAsTable(staging)

    // a bucketed write emits one file per bucket PER TASK, so the staging
    // read's task count would set the file count. Repartitioning by the
    // bucket columns into numBuckets partitions uses the same murmur3
    // hash as bucket-id assignment, so each task holds exactly one
    // bucket and the rewrite bottoms out at the bucket floor.
    val staged = spark.table(staging)
    val rewrite = meta.bucketSpec match {
      case Some(bs) => staged.repartition(bs.numBuckets, bs.bucketColumnNames.map(F.col): _*)
      case None => staged.repartition(partitionCols.map(F.col): _*)
    }
    // same oversize discipline as [[compact]]: without a record cap, a
    // partition of many small files would merge into ONE unbounded file
    // and lose its scan parallelism
    val rows = staged.count()
    val bytes = needy.map(_.bytes).sum
    val maxRecords = if (rows == 0) Long.MaxValue
      else math.max(1L, targetBytes / math.max(1L, bytes / rows))
    // BOTH session-conf windows go through the SHARED locked helper: a
    // private toggle here would race the index writers on the same
    // SparkSession — a lost overwrite-mode race turns this insert into a
    // STATIC overwrite that truncates every untouched partition, and a
    // record-cap set outside the lock would leak into a concurrent
    // writer's plans while this thread waits for the lock
    try graft.operators.NearDupIndex.withDynamicOverwrite(spark) {
      val conf = spark.sessionState.conf
      val prevMax = conf.getConfString("spark.sql.files.maxRecordsPerFile", "0")
      conf.setConfString("spark.sql.files.maxRecordsPerFile", maxRecords.toString)
      try rewrite.write.mode("overwrite").insertInto(table)
      finally conf.setConfString("spark.sql.files.maxRecordsPerFile", prevMax)
    } finally {
      // also on failure: a half-written insert aborts cleanly (the target
      // keeps its original partitions), and keeping the staging copy
      // around would just strand a full duplicate of the needy partitions
      spark.sql(s"DROP TABLE IF EXISTS $staging")
    }

    needy.map(p => (p.spec, p.files, p.bytes)).toDF("partition", "files_before", "bytes")
  }
}
