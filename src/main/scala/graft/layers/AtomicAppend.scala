package graft.layers

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Atomic-visibility batch appends — the role Delta's `_delta_log` plays
  * in every reference table write (`docs/ARCHITECTURE.md:167-174`,
  * `streaming_job.py:100-105`): a reader concurrent with a multi-file
  * append must see either none of the batch or all of it, never a torn
  * prefix. A bare `mode("append").parquet` gives no such boundary — the
  * files land one task at a time and a concurrent scan lists whatever
  * exists at that instant.
  *
  * Discipline (the engine-wide epoch convention,
  * [[graft.streaming.IdempotentSink]]'s batch shape generalized to plain
  * BATCH appends): each append overwrites its own `_batch=<id>`
  * subdirectory, then commits a `_COMMITTED` marker file; [[read]] lists
  * marker-bearing directories and scans exactly those. The leading
  * underscore keeps a naive `spark.read.parquet(path)` from seeing
  * half-landed files too (Spark's file index skips underscore paths) —
  * but such a read sees committed batches AS EMPTY as well, so tables
  * written through this API are read through [[read]].
  *
  * Idempotence: with a caller-owned `batchId` (a stream epoch, an
  * orchestrator run id) a replay overwrites the same directory and
  * re-commits — exactly-once content by construction; a replay that
  * finds the marker already present skips entirely. Without one, the
  * next free id is allocated (single-writer — concurrent WRITERS need
  * caller-owned disjoint ids; readers are lock-free and concurrent).
  *
  * Scale: the marker protocol adds two metadata ops per append and a
  * directory listing per read — both O(batches), independent of data
  * size; partition columns (`partitionBy`) live INSIDE each batch
  * directory, so partition pruning still reaches the scan per batch.
  * Batch-dir fragmentation across many appends is [[compact]]'s job:
  * folding k committed batches into one needs an ATOMIC visibility flip
  * (marker listing alone can't express "replaced" — landing the folded
  * copy would double the data for a concurrent lister), so the first
  * compaction upgrades the table to a `_MANIFEST` pointer (the
  * engine-wide [[graft.runtime.PointerFile]] protocol) naming the live
  * batch ids; from then on readers resolve the manifest — one metadata
  * read instead of O(batches) marker probes — and every flip is
  * write-new-state → commit-pointer, crash-safe at any instant.
  * Writers are single-maintainer per table (the engine-wide contract);
  * readers stay concurrent and lock-free on either protocol.
  *
  * DATA SKIPPING rides the same layout ([[BatchStats]] — the per-file
  * stats role of Delta's `_delta_log`): `statsCols` on [[append]] writes
  * a `_STATS` zone map (min/max/null counts) into the batch dir,
  * [[compact]] folds zone maps exactly without rescanning, and the
  * predicate reader `read(path, predicate)` drops every batch whose
  * stats PROVE the predicate empty — driver-side, before any footer is
  * opened. [[compactClustered]] (z-order fold, OPTIMIZE ZORDER BY's
  * role) is what makes the ranges tight enough to skip on: after it, a
  * selective predicate on any clustered column scans only the matching
  * z-range batches. At 100 TB that layering is partition pruning →
  * batch-dir zone maps → parquet row-group min/max, each cutting the
  * next's input.
  */
object AtomicAppend {

  private val Marker = "_COMMITTED"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestIds(spark: SparkSession, basePath: String): Option[Seq[Long]] =
    graft.runtime.PointerFile.read(fs(spark, basePath),
      new Path(s"$basePath/_MANIFEST"), new Path(s"$basePath/_MANIFEST.tmp"))
      .map(s => if (s.isEmpty) Seq.empty
        else s.split(",").map(_.trim.toLong).toSeq.sorted)

  private def commitManifest(spark: SparkSession, basePath: String, ids: Seq[Long]): Unit =
    graft.runtime.PointerFile.commit(fs(spark, basePath),
      new Path(s"$basePath/_MANIFEST"), new Path(s"$basePath/_MANIFEST.tmp"),
      ids.sorted.mkString(","))

  private def markerDirs(spark: SparkSession, basePath: String): Seq[Path] = {
    val f = fs(spark, basePath)
    val base = new Path(basePath)
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_batch="))
      .filter(st => f.exists(new Path(st.getPath, Marker)))
      .map(_.getPath)
      // id order, not listing order — readers and [[pruneBatches]] report
      // deterministically on any filesystem
      .sortBy(p => scala.util.Try(p.getName.stripPrefix("_batch=").toLong)
        .getOrElse(Long.MaxValue))
  }

  private def committedDirs(spark: SparkSession, basePath: String): Seq[Path] =
    manifestIds(spark, basePath) match {
      case Some(ids) => ids.map(id => new Path(s"$basePath/_batch=$id"))
      case None => markerDirs(spark, basePath)
    }

  /** One scan over a set of committed batch dirs. `basePath` anchors
    * partition discovery at the TABLE root: without it, a multi-batch
    * read of a PARTITIONED table trips CONFLICTING_DIRECTORY_STRUCTURES
    * (each batch root parses its own partition chain). Anchoring makes
    * Spark infer `_batch` itself as a partition column — protocol
    * metadata, not data — so it is dropped before the frame escapes
    * (critically: [[compact]] feeds this frame straight into the folded
    * WRITE, which must not bake a `_batch` column into the data).
    *
    * The scan binds to the table's LOGGED schema when one exists
    * ([[storedSchema]]): without it, Spark samples ONE footer, so a
    * column added by a later append silently VANISHES whenever the
    * sampled file predates it — with it, every batch reads under the
    * full evolved schema and pre-evolution batches null-fill the new
    * columns. Logged PARTITION columns ([[storedPartSchema]]) bind too,
    * under their WRITTEN types — partition-value inference would re-type
    * them from directory names per read (and can't type them at all on
    * an empty table); only the protocol's own `_batch` is left to
    * discovery.
    */
  private def scanDirs(spark: SparkSession, basePath: String,
      dirs: Seq[Path]): DataFrame = {
    val reader = spark.read.option("basePath", basePath)
    storedSchema(spark, basePath).foreach { s =>
      reader.schema(org.apache.spark.sql.types.StructType(
        s.fields ++ storedPartSchema(spark, basePath).map(_.fields).getOrElse(Array.empty)))
    }
    reader.parquet(dirs.map(_.toString): _*).drop("_batch")
  }

  // ---------------------------------------------------------- table schema

  /** The table's logged FILE schema (data columns as written inside the
    * batch dirs — partition columns live in the directory structure),
    * the schema-in-metadata half of Delta's log: readers bind to it
    * instead of sampling a footer. None on tables created before the
    * log existed (they read footer-sampled, as before).
    */
  def storedSchema(spark: SparkSession, basePath: String): Option[org.apache.spark.sql.types.StructType] =
    graft.runtime.PointerFile.read(fs(spark, basePath),
      new Path(s"$basePath/_SCHEMA"), new Path(s"$basePath/_SCHEMA.tmp"))
      .map(s => org.apache.spark.sql.types.DataType.fromJson(s)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** The table's logged PARTITION-column schema (the columns living in
    * the directory structure, in nesting order, under their types as
    * WRITTEN) — what lets an EMPTY table's frame carry the same shape as
    * a non-empty read, and every read bind partition types instead of
    * re-inferring them from directory names. None on unpartitioned or
    * pre-log tables.
    */
  def storedPartSchema(spark: SparkSession, basePath: String): Option[org.apache.spark.sql.types.StructType] =
    graft.runtime.PointerFile.read(fs(spark, basePath),
      new Path(s"$basePath/_PARTSCHEMA"), new Path(s"$basePath/_PARTSCHEMA.tmp"))
      .map(s => org.apache.spark.sql.types.DataType.fromJson(s)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  private def logPartSchema(spark: SparkSession, basePath: String,
      df: DataFrame, partitionBy: Seq[String]): Unit =
    if (partitionBy.nonEmpty) {
      val parts = org.apache.spark.sql.types.StructType(partitionBy.flatMap(p =>
        df.schema.fields.find(_.name.equalsIgnoreCase(p)).map(_.copy(nullable = true))))
      if (!storedPartSchema(spark, basePath).contains(parts))
        graft.runtime.PointerFile.commit(fs(spark, basePath),
          new Path(s"$basePath/_PARTSCHEMA"), new Path(s"$basePath/_PARTSCHEMA.tmp"),
          parts.json)
    }

  /** `dt` with every NESTED nullability flag forced permissive — the
    * equality domain for append-compatibility checks: an aggregation or
    * join flips a struct field's / array element's nullability without
    * changing the logical type, and two such schemas must not fail an
    * append as a "type change".
    */
  private def relaxNullability(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case StructType(fields) => StructType(fields.map(f =>
        f.copy(dataType = relaxNullability(f.dataType), nullable = true)))
      case ArrayType(et, _) => ArrayType(relaxNullability(et), containsNull = true)
      case MapType(k, v, _) =>
        MapType(relaxNullability(k), relaxNullability(v), valueContainsNull = true)
      case other => other
    }
  }

  /** Merge an incoming batch's file schema into the logged one:
    * ADD-COLUMN evolution only — new columns append (nullable; older
    * batches null-fill them), existing columns must keep their exact
    * type (no silent widening/narrowing — a type change is a rewrite,
    * route it through [[SchemaEvolution]]). Type equality ignores
    * nullability at every nesting level (see [[relaxNullability]]); the
    * stored field wins on a pure-nullability disagreement. Returns the
    * schema to log.
    */
  private def mergeTableSchema(stored: org.apache.spark.sql.types.StructType,
      incoming: org.apache.spark.sql.types.StructType,
      basePath: String): org.apache.spark.sql.types.StructType = {
    incoming.fields.foreach { f =>
      stored.fields.find(_.name.equalsIgnoreCase(f.name)).foreach { s =>
        require(relaxNullability(s.dataType) == relaxNullability(f.dataType),
          s"append to $basePath changes column '${f.name}' from ${s.dataType} " +
            s"to ${f.dataType} — type changes need a rewrite (SchemaEvolution), " +
            "not an append")
      }
    }
    val extra = incoming.fields.filterNot(f =>
      stored.fields.exists(_.name.equalsIgnoreCase(f.name)))
    org.apache.spark.sql.types.StructType((stored.fields ++ extra)
      .map(f => f.copy(dataType = relaxNullability(f.dataType), nullable = true)))
  }

  /** Log (and if needed evolve) the table schema for a batch about to
    * become — or already — visible. Idempotent: no pointer write when
    * nothing changed, so replays and crash-heals converge.
    */
  private def logSchema(spark: SparkSession, basePath: String,
      fileSchema: org.apache.spark.sql.types.StructType): Unit = {
    val stored = storedSchema(spark, basePath)
    val merged = stored
      .map(mergeTableSchema(_, fileSchema, basePath))
      .getOrElse(org.apache.spark.sql.types.StructType(fileSchema.fields
        .map(f => f.copy(dataType = relaxNullability(f.dataType), nullable = true))))
    if (!stored.contains(merged))
      graft.runtime.PointerFile.commit(fs(spark, basePath),
        new Path(s"$basePath/_SCHEMA"), new Path(s"$basePath/_SCHEMA.tmp"),
        merged.json)
  }

  /** Ids of the committed batches at `basePath` (sorted ascending) — the
    * manifest when the table has one, the marker listing otherwise.
    */
  def committedIds(spark: SparkSession, basePath: String): Seq[Long] =
    manifestIds(spark, basePath).getOrElse(
      markerDirs(spark, basePath)
        .flatMap(p => scala.util.Try(p.getName.stripPrefix("_batch=").toLong).toOption)
        .sorted)

  // ------------------------------------------------------------ commit log

  private val VlogDir = "_VLOG"

  private def vlogPath(basePath: String, v: Long) = new Path(s"$basePath/$VlogDir/v=$v")

  /** Committed table versions, oldest first ([[readAsOf]]'s domain). */
  def versions(spark: SparkSession, basePath: String): Seq[Long] = {
    val f = fs(spark, basePath)
    val dir = new Path(s"$basePath/$VlogDir")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filterNot(_.getPath.getName.startsWith("LATEST"))
      .flatMap(st => scala.util.Try(st.getPath.getName.stripPrefix("v=").toLong).toOption)
      .sorted
  }

  /** The newest version, via the `LATEST` pointer — O(1) metadata reads,
    * never a directory listing: a standing stream commits one version
    * per trigger, and [[logCommit]] on the next trigger must not pay
    * O(version-count) to find where it is. Falls back to the listing
    * for pre-pointer tables.
    */
  private def latestVersion(f: org.apache.hadoop.fs.FileSystem,
      spark: SparkSession, basePath: String): Option[Long] =
    graft.runtime.PointerFile.read(f,
      new Path(s"$basePath/$VlogDir/LATEST"), new Path(s"$basePath/$VlogDir/LATEST.tmp"))
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .orElse(versions(spark, basePath).lastOption)

  /** One commit-log entry: the commit KIND and the live batch set after
    * it. `append` commits add rows (the new batch dirs ARE the change
    * feed); `fold` commits ([[compact]]/[[compactClustered]]) replace
    * batches content-preservingly and contribute NOTHING to a change
    * feed — which is why the kind must be logged, not inferred: an
    * id-diff across a fold would re-emit the whole table.
    */
  private final case class VlogEntry(kind: String, ids: Seq[Long])

  private def vlogEntry(f: org.apache.hadoop.fs.FileSystem, basePath: String,
      v: Long): Option[VlogEntry] =
    try {
      val in = f.open(vlogPath(basePath, v))
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      val (kind, csv) = content.split(":", 2) match {
        case Array(k, rest) => (k, rest)
        case _ => ("append", content) // first-format entries were append-only
      }
      Some(VlogEntry(kind,
        if (csv.isEmpty) Seq.empty
        else csv.split(",").map(_.trim.toLong).toSeq.sorted))
    } catch { case _: java.io.FileNotFoundException => None }

  private def vlogIds(f: org.apache.hadoop.fs.FileSystem, basePath: String,
      v: Long): Option[Seq[Long]] = vlogEntry(f, basePath, v).map(_.ids)

  /** Record the just-committed live batch set as the next table version
    * (one immutable `_VLOG/v=<n>` file — the commit-history half of the
    * `_delta_log` role; the manifest/markers are the CURRENT-state
    * half). Idempotent: when the latest entry already equals `liveNow`
    * (a replay, or nothing changed) no entry is written — so a crash
    * between a visibility commit and its log entry self-heals on the
    * next commit or replay, at the cost of the skipped intermediate
    * state never appearing in history (every logged version IS a state
    * the table actually held).
    */
  private def logCommit(spark: SparkSession, basePath: String,
      liveNow: Seq[Long], kind: String = "append"): Unit = {
    val f = fs(spark, basePath)
    // ADOPT any orphan entries a crash left un-pointered (the entry
    // rename landed, the LATEST update didn't): log entries are
    // IMMUTABLE once a lister could have seen them — versions()/
    // readAsOf resolve the directory, so overwriting the orphan would
    // silently re-point an already-observable version at a different
    // batch set. The orphan names a state the table really committed
    // (logCommit runs after the visibility commit), so rolling the
    // pointer forward to it is the truthful heal.
    var latest = latestVersion(f, spark, basePath)
    val pointed = latest
    while (f.exists(vlogPath(basePath, latest.map(_ + 1).getOrElse(0L))))
      latest = Some(latest.map(_ + 1).getOrElse(0L))
    def healPointer(): Unit =
      if (latest != pointed) latest.foreach(v =>
        graft.runtime.PointerFile.commit(f,
          new Path(s"$basePath/$VlogDir/LATEST"), new Path(s"$basePath/$VlogDir/LATEST.tmp"),
          v.toString))
    val sorted = liveNow.sorted
    if (latest.flatMap(vlogIds(f, basePath, _)).contains(sorted)) {
      healPointer(); return // replay / adopted orphan: entry already live
    }
    // entry first, pointer second: a crash between the two leaves an
    // orphan the adoption above heals. The entry itself lands by
    // write-tmp → rename: readers list the directory (not just the
    // pointer), so an in-place create would expose a torn/empty entry
    // to a concurrent versions()/readAsOf — the one reader-visible
    // metadata file here that must be as atomic as the PointerFiles
    val next = latest.map(_ + 1).getOrElse(0L)
    val tmp = new Path(s"$basePath/$VlogDir/v=$next.tmp")
    val out = f.create(tmp, true)
    try out.write(s"$kind:${sorted.mkString(",")}".getBytes("UTF-8"))
    finally out.close()
    val dest = vlogPath(basePath, next)
    require(f.rename(tmp, dest), s"failed to commit log entry $dest")
    graft.runtime.PointerFile.commit(f,
      new Path(s"$basePath/$VlogDir/LATEST"), new Path(s"$basePath/$VlogDir/LATEST.tmp"),
      next.toString)
  }

  /** The table as of commit `version` (TIME TRAVEL — Delta's
    * `VERSION AS OF`): scans exactly the batch set the table held at
    * that commit. Replaced batch dirs stay on disk until [[vacuum]], so
    * every version newer than the vacuum retention window stays
    * readable; older versions fail actionably.
    */
  def readAsOf(spark: SparkSession, basePath: String, version: Long): DataFrame = {
    val f = fs(spark, basePath)
    val ids = vlogIds(f, basePath, version).getOrElse(
      throw new IllegalArgumentException(
        s"no committed version $version under $basePath " +
          s"(versions: ${versions(spark, basePath).mkString(",")})"))
    val dirs = ids.map(id => new Path(s"$basePath/_batch=$id"))
    dirs.filterNot(f.exists) match {
      case Seq() if dirs.isEmpty => emptyFrame(spark, basePath)
      case Seq() => scanDirs(spark, basePath, dirs)
      case gone => throw new IllegalArgumentException(
        s"version $version of $basePath references vacuumed batches " +
          s"${gone.map(_.getName).mkString(",")} — raise vacuum's retainVersions " +
          "to keep older versions readable")
    }
  }

  /** A zero-row frame bound to the table's schema at O(1) cost: one
    * batch dir's footer (never the full listing a `read(...)` would
    * build just to throw its rows away), or the logged schema when the
    * table is currently empty. Partition columns join from their own
    * log ([[storedPartSchema]]) so an empty table's shape matches a
    * non-empty read — a union or schema-keyed cache built against the
    * empty frame must not break when data arrives.
    */
  private def emptyFrame(spark: SparkSession, basePath: String): DataFrame = {
    val dirs = committedDirs(spark, basePath)
    if (dirs.nonEmpty)
      scanDirs(spark, basePath, Seq(dirs.head)).filter(F.lit(false))
    else storedSchema(spark, basePath) match {
      case Some(s) =>
        val full = org.apache.spark.sql.types.StructType(
          s.fields ++ storedPartSchema(spark, basePath).map(_.fields).getOrElse(Array.empty))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
      case None => throw new IllegalArgumentException(
        s"no committed batches and no logged schema under $basePath — " +
          "cannot bind an empty frame")
    }
  }

  /** (version, live batch ids) pairs, oldest first. */
  def history(spark: SparkSession, basePath: String): Seq[(Long, Seq[Long])] = {
    val f = fs(spark, basePath)
    versions(spark, basePath).flatMap(v => vlogIds(f, basePath, v).map(v -> _))
  }

  /** One-line render of the commit log WITH kinds — the observability
    * payload [[ProtocolAudit]] attaches to a divergence report:
    * `v0:append{0} v1:fold{3} …`.
    */
  def describeHistory(spark: SparkSession, basePath: String): String = {
    val f = fs(spark, basePath)
    versions(spark, basePath).map { v =>
      vlogEntry(f, basePath, v)
        .map(e => s"v$v:${e.kind}{${e.ids.mkString(",")}}")
        .getOrElse(s"v$v:?")
    }.mkString(" ")
  }

  /** The rows ADDED between two committed versions — the CHANGE FEED
    * role of Delta's CDF for insert-only batch tables, derived from the
    * commit log alone: an `append` commit's delta is exactly its new
    * batch dirs; a `fold` commit ([[compact]]/[[compactClustered]])
    * replaces batches content-preservingly and contributes nothing.
    * This is the LATE-DATA-SAFE incremental feed: consumption is keyed
    * on batch identity, not an event-time high-water mark, so a batch
    * whose timestamps lag everything already consumed still arrives
    * (the blind spot [[IncrementalView.refreshFromAppends]] documents).
    *
    * Soundness over completeness at the edges: a compound commit — a
    * crashed fold healed by a later append logs one entry that both
    * removes and adds batches — cannot be split into "replaced" vs
    * "new" from ids alone, so it FAILS actionably instead of re-emitting
    * folded rows as inserts; vacuumed ranges and `rewrite` commits
    * ([[deleteWhere]]/[[updateWhere]] — rows removed or changed, which
    * an insert-only delta cannot represent) fail the same way. Returns
    * rows from `(fromVersion, toVersion]`.
    */
  def changesBetween(spark: SparkSession, basePath: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"changesBetween: fromVersion $fromVersion > toVersion $toVersion")
    val f = fs(spark, basePath)
    def entry(v: Long) = vlogEntry(f, basePath, v).getOrElse(
      throw new IllegalArgumentException(
        s"no committed version $v under $basePath (vacuumed? " +
          s"versions: ${versions(spark, basePath).mkString(",")})"))
    val window = versions(spark, basePath)
      .filter(v => v > fromVersion && v <= toVersion)
    var prevIds = entry(fromVersion).ids.toSet
    val added = Seq.newBuilder[Long]
    window.foreach { v =>
      val e = entry(v)
      val newIds = e.ids.toSet
      e.kind match {
        case "append" =>
          val removed = prevIds -- newIds
          require(removed.isEmpty,
            s"version $v of $basePath is a compound commit (an append entry " +
              s"that also retires batches ${removed.toSeq.sorted.mkString(",")} — " +
              "a crash-healed fold): its delta cannot be derived from ids; " +
              "re-bootstrap this consumer from readAsOf")
          added ++= (newIds -- prevIds).toSeq.sorted
        case "fold" => () // content-preserving: no delta
        case "rewrite" => throw new IllegalArgumentException(
          s"version $v of $basePath is a copy-on-write rewrite " +
            "(deleteWhere/updateWhere): rows were removed or changed, which an " +
            "insert-only change feed cannot represent — re-bootstrap this " +
            "consumer from readAsOf")
        case other => throw new IllegalArgumentException(
          s"version $v of $basePath has unknown commit kind '$other'")
      }
      prevIds = newIds
    }
    val dirs = added.result().map(id => new Path(s"$basePath/_batch=$id"))
    dirs.filterNot(f.exists) match {
      case Seq() if dirs.isEmpty => emptyFrame(spark, basePath) // empty delta
      case Seq() => scanDirs(spark, basePath, dirs)
      case gone => throw new IllegalArgumentException(
        s"the change feed $fromVersion→$toVersion of $basePath references " +
          s"vacuumed batches ${gone.map(_.getName).mkString(",")} — raise " +
          "vacuum's retainVersions or re-bootstrap the consumer")
    }
  }

  /** Append `df` as one atomically-visible batch; returns the committed
    * batch id, or None when `batchId` was already committed (replay).
    * On a manifest table the marker commit is followed by the manifest
    * flip; a crash between the two replays to a heal — the marker proves
    * this id's content landed whole, so the replay only finishes the
    * visibility flip (replay presents identical rows by contract).
    */
  def append(df: DataFrame, basePath: String, partitionBy: Seq[String] = Nil,
      batchId: Option[Long] = None, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): Option[Long] = {
    val spark = df.sparkSession
    val f = fs(spark, basePath)
    val manifest = manifestIds(spark, basePath)
    val live = manifest.getOrElse(committedIds(spark, basePath))
    val id = batchId.getOrElse(live.lastOption.map(_ + 1).getOrElse(0L))
    val dir = new Path(s"$basePath/_batch=$id")
    val marker = new Path(dir, Marker)
    val fileSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields.filterNot(fd => partitionBy.exists(_.equalsIgnoreCase(fd.name))))
    if (f.exists(marker) && live.contains(id)) {
      // heal a crash between the visibility commit and its log entries
      logSchema(spark, basePath, fileSchema)
      logPartSchema(spark, basePath, df, partitionBy)
      logCommit(spark, basePath, live)
      return None // replay: fully committed
    }
    if (!f.exists(marker)) {
      // schema BEFORE visibility: once the marker lands, every reader
      // must already bind to a schema covering this batch's columns
      logSchema(spark, basePath, fileSchema)
      logPartSchema(spark, basePath, df, partitionBy)
      val writer = df.write.mode("overwrite") // overwrite own dir = replay-safe mid-batch
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
        .parquet(dir.toString)
      // sidecars BEFORE the marker: a marker implies complete sidecars.
      // Computed from a read-back of the landed batch (column-pruned to
      // the sidecar columns), so they describe what is actually on
      // disk; an empty batch has nothing to describe
      if (statsCols.nonEmpty || bloomCols.nonEmpty)
        scala.util.Try(spark.read.parquet(dir.toString)).foreach { landed =>
          val stats = Option.when(statsCols.nonEmpty)(
            BatchStats.compute(landed, statsCols))
          stats.foreach(BatchStats.write(f, dir, _))
          if (bloomCols.nonEmpty) {
            val expected = stats.map(_.rows).getOrElse(landed.count())
            BatchBloom.write(f, dir, BatchBloom.compute(landed, bloomCols, expected))
          }
        }
      f.create(marker, true).close()
    }
    // manifest tables: the flip IS the visibility commit. Also the heal
    // path for a replay that finds its own marker but no manifest entry.
    manifest.foreach(ids => if (!ids.contains(id)) commitManifest(spark, basePath, ids :+ id))
    logCommit(spark, basePath, (live.toSet + id).toSeq)
    Some(id)
  }

  /** Fold all committed batches into ONE batch directory, atomically:
    * write the folded copy (unmarked, invisible), flip the `_MANIFEST`
    * pointer to exactly the new id, then marker the new dir. A reader at
    * ANY instant sees either the old batch set or the folded one, never
    * both and never a prefix; a crash at any step leaves the old state
    * live and the retry overwrites the debris (the folded id is derived
    * from the live set, which a failed attempt never changed). The
    * replaced directories stay on disk for in-flight readers until
    * [[vacuum]]. Returns the folded batch id, or None when the table has
    * fewer than `minBatches` live batches (nothing touched). Single
    * maintainer per table, like every commit protocol in the engine.
    */
  def compact(spark: SparkSession, basePath: String, partitionBy: Seq[String] = Nil,
      minBatches: Int = 2): Option[Long] = {
    val live = committedIds(spark, basePath)
    if (live.size < minBatches) return None
    Some(foldSubset(spark, basePath, live, live, partitionBy))
  }

  /** Incremental BIN-PACKING compaction (Delta OPTIMIZE's file-size
    * role, the maintenance-cadence sibling of [[compact]]): folds ONLY
    * the live batches whose directory weighs under `maxBytes`, leaving
    * already-right-sized batches untouched — at 100 TB the table never
    * pays an O(table) rewrite to absorb a day of small appends; each
    * cycle costs O(small batches), and the steady state is a bounded
    * batch count however long the append history grows. Zone maps fold
    * exactly; the commit logs kind `fold` (content-preserving — a
    * change feed crossing it emits nothing, same as a full fold).
    * Returns the folded id, or None when fewer than `minBatches` small
    * batches exist (nothing touched).
    */
  def compactSmall(spark: SparkSession, basePath: String, maxBytes: Long,
      partitionBy: Seq[String] = Nil, minBatches: Int = 2): Option[Long] = {
    val f = fs(spark, basePath)
    val live = committedIds(spark, basePath)
    val small = live.filter(id =>
      scala.util.Try(f.getContentSummary(new Path(s"$basePath/_batch=$id")).getLength)
        .toOption.exists(_ < maxBytes))
    if (small.size < minBatches) return None
    Some(foldSubset(spark, basePath, live, small, partitionBy))
  }

  /** The shared fold core: write `subset`'s rows as one new batch dir,
    * carry the sidecars over (zone maps merge exactly — min of mins /
    * max of maxes / summed nulls, no rescans; blooms recompute, bit
    * arrays are sized per batch), pre-mark, and flip the manifest from
    * `live` to `(live − subset) + folded` in ONE commit. Markers land
    * BEFORE the flip: once a manifest exists it is authoritative
    * (committedDirs never consults markers), so pre-marking changes
    * nothing a reader can see — a marker-protocol table is first
    * UPGRADED with a content-preserving manifest naming the current
    * live set (marking first there would double the data for a
    * concurrent marker-lister). A crash at any step leaves the old
    * state live; the retry overwrites its own debris (the folded id
    * derives from the live set, which a failed attempt never changed).
    */
  private def foldSubset(spark: SparkSession, basePath: String, live: Seq[Long],
      subset: Seq[Long], partitionBy: Seq[String]): Long = {
    val f = fs(spark, basePath)
    val folded = live.max + 1
    val dir = new Path(s"$basePath/_batch=$folded")
    val writer = scanDirs(spark, basePath,
        subset.map(id => new Path(s"$basePath/_batch=$id")))
      .write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dir.toString)
    val subsetStats = subset.map(id => BatchStats.read(f, new Path(s"$basePath/_batch=$id")))
    if (subsetStats.forall(_.isDefined))
      BatchStats.write(f, dir, BatchStats.merge(subsetStats.flatten))
    // names-only sidecar reads: deciding WHAT to recompute must not
    // deserialize megabytes of sketches
    val subsetBloomCols = subset.map(id =>
      BatchBloom.readNames(f, new Path(s"$basePath/_batch=$id")))
    if (subsetBloomCols.nonEmpty && subsetBloomCols.forall(_.nonEmpty)) {
      val cols = subsetBloomCols.reduce(_ intersect _).toSeq.sorted
      if (cols.nonEmpty)
        scala.util.Try(spark.read.parquet(dir.toString)).foreach { foldedDf =>
          val expected = if (subsetStats.forall(_.isDefined))
            subsetStats.flatten.map(_.rows).sum.max(1L) else foldedDf.count()
          BatchBloom.write(f, dir, BatchBloom.compute(foldedDf, cols, expected))
        }
    }
    if (manifestIds(spark, basePath).isEmpty)
      commitManifest(spark, basePath, live)
    f.create(new Path(dir, Marker), true).close()
    val after = (live.filterNot(subset.contains) :+ folded).sorted
    commitManifest(spark, basePath, after) // THE atomic visibility flip
    logCommit(spark, basePath, after, kind = "fold")
    folded
  }

  /** [[compact]] that additionally Z-ORDER CLUSTERS the fold
    * ([[ZOrder]], the OPTIMIZE ZORDER BY role): the live batches are
    * folded into up to `numBatches` new batch directories split by
    * z-range of `zorderBy`, each with its own zone map over `statsCols`
    * — which is what makes [[read]]'s batch skipping BITE: after an
    * append history ordered by arrival time, every batch spans the full
    * value domain and nothing skips; after a clustered fold each batch
    * covers a tight hyper-rectangle, so a selective predicate on ANY
    * clustered column drops most batch dirs from the scan driver-side.
    * At 100 TB this is the maintenance-cadence operation between "scan
    * every file behind the partition" and "scan the matching z-ranges".
    *
    * Atomicity is [[compact]]'s discipline, k-way: the fold lands
    * unmarked under `_cluster_tmp` (invisible — readers only resolve
    * `_batch=` dirs), moves into place still unmarked, and ONE manifest
    * flip makes all k new batches visible and all old ones dead; a
    * crash at any step leaves the old state live, and the retry
    * overwrites its own debris (ids derive from the live set, which a
    * failed attempt never changed). Replaced dirs await [[vacuum]].
    * Single maintainer per table; readers stay lock-free.
    */
  def compactClustered(spark: SparkSession, basePath: String, zorderBy: Seq[String],
      numBatches: Int, partitionBy: Seq[String] = Nil, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil, bits: Int = 4,
      minBatches: Int = 2): Option[Seq[Long]] = {
    require(numBatches >= 1, s"numBatches must be >= 1, got $numBatches")
    val live = committedIds(spark, basePath)
    if (live.size < minBatches) return None
    val f = fs(spark, basePath)
    val df = scanDirs(spark, basePath, live.map(id => new Path(s"$basePath/_batch=$id")))
    val tmp = new Path(s"$basePath/_cluster_tmp")
    // a crashed prior attempt strands a partially-renamed tmp; the
    // overwrite below would clear it anyway, but an explicit delete
    // keeps the failure surface one line and covers write modes that
    // don't (vacuum reclaims the abandoned-table case)
    if (f.exists(tmp)) f.delete(tmp, true)
    ZOrder.clusterKeyed(df, zorderBy, numBatches, "__zbatch", bits)
      .write.mode("overwrite")
      .partitionBy("__zbatch" +: partitionBy: _*)
      .parquet(tmp.toString)
    // empty z-ranges write no directory; batch ids are dense over the
    // ranges that materialized
    val present = f.listStatus(tmp).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__zbatch="))
      .map(_.getPath.getName.stripPrefix("__zbatch=").toLong)
      .sorted
    // per-z-range zone maps in ONE grouped aggregate over the fold
    val statsByZ =
      if (statsCols.isEmpty || present.isEmpty) Map.empty[Long, BatchStats.Stats]
      else BatchStats.computeGrouped(
        spark.read.parquet(tmp.toString), "__zbatch", statsCols)
    val ids = present.zipWithIndex.map { case (z, i) =>
      val id = live.max + 1 + i
      val dest = new Path(s"$basePath/_batch=$id")
      if (f.exists(dest)) f.delete(dest, true) // crashed prior attempt's debris
      require(f.rename(new Path(tmp, s"__zbatch=$z"), dest),
        s"compactClustered: rename of z-range $z failed")
      statsByZ.get(z).foreach(BatchStats.write(f, dest, _))
      // per-range bloom recompute (bit arrays size per batch, no merge);
      // a maintenance-cadence cost, one pruned scan per range
      if (bloomCols.nonEmpty)
        scala.util.Try(spark.read.parquet(dest.toString)).foreach { landed =>
          val expected = statsByZ.get(z).map(_.rows).getOrElse(landed.count())
          BatchBloom.write(f, dest, BatchBloom.compute(landed, bloomCols, expected))
        }
      id
    }
    // markers BEFORE the k-way flip — same discipline (and rationale)
    // as [[compact]]: upgrade a marker-protocol table with a
    // content-preserving manifest first, then pre-mark the still-
    // invisible fold dirs, then flip once.
    if (manifestIds(spark, basePath).isEmpty)
      commitManifest(spark, basePath, live)
    ids.foreach(id => f.create(new Path(s"$basePath/_batch=$id/$Marker"), true).close())
    commitManifest(spark, basePath, ids) // THE atomic visibility flip, k-way
    f.delete(tmp, true)
    logCommit(spark, basePath, ids, kind = "fold")
    Some(ids)
  }

  // ------------------------------------------------- copy-on-write rewrite

  /** Copy-on-write `DELETE ... WHERE` (Delta DELETE's role): removes
    * every row where `predicate` is TRUE (false and NULL rows stay —
    * SQL DELETE semantics), rewriting ONLY the batches whose zone maps
    * / blooms cannot prove the predicate empty. At 100 TB a selective
    * delete on a clustered column rewrites the matching z-range batch
    * dirs, never the table — the same [[BatchStats]] pruning that
    * serves reads decides the write set. Returns
    * (rewritten ids, replacement ids); a batch whose every row matched
    * is simply dropped from the manifest (no empty dir).
    *
    * Atomicity is the fold discipline: replacements land unmarked under
    * new ids, are pre-marked, and ONE manifest flip retires every
    * rewritten id — a reader at any instant sees the table before or
    * after the whole delete, never a partial one. The commit logs kind
    * `rewrite`: an insert-only change feed crossing it FAILS actionably
    * ([[changesBetween]]) — rows were removed, which an insert-only
    * delta cannot represent; consumers re-bootstrap from [[readAsOf]].
    * Replaced dirs stay for time travel until [[vacuum]]. Single
    * maintainer per table, like every commit protocol in the engine.
    */
  def deleteWhere(spark: SparkSession, basePath: String,
      predicate: Column): (Seq[Long], Seq[Long]) =
    rewriteWhere(spark, basePath, predicate, identity, keepMatches = false)

  /** Copy-on-write `UPDATE ... SET ... WHERE` (Delta UPDATE's role):
    * rows where `predicate` is TRUE get each `assignments` column
    * replaced; all other rows (false and NULL) pass through unchanged.
    * Touched-batch selection, atomicity, feed semantics, and vacuum
    * interplay are exactly [[deleteWhere]]'s. Returns
    * (rewritten ids, replacement ids).
    */
  def updateWhere(spark: SparkSession, basePath: String, predicate: Column,
      assignments: Map[String, Column]): (Seq[Long], Seq[Long]) = {
    require(assignments.nonEmpty, "updateWhere needs at least one assignment")
    val transform: DataFrame => DataFrame = df => {
      assignments.keys.foreach(c => require(df.columns.exists(_.equalsIgnoreCase(c)),
        s"updateWhere assigns unknown column '$c' (table has ${df.columns.mkString(",")})"))
      df.select(df.columns.toSeq.map { c =>
        assignments.find(_._1.equalsIgnoreCase(c)) match {
          case Some((_, v)) =>
            F.when(F.coalesce(predicate, F.lit(false)), v).otherwise(F.col(c)).as(c)
          case None => F.col(c)
        }
      }: _*)
    }
    rewriteWhere(spark, basePath, predicate, transform, keepMatches = true)
  }

  /** Shared copy-on-write core: prune the batch set under `predicate`
    * (uncertain batches rewrite — conservative), rewrite each touched
    * batch (delete drops matching rows; update transforms them), and
    * flip visibility once.
    */
  private def rewriteWhere(spark: SparkSession, basePath: String, predicate: Column,
      transform: DataFrame => DataFrame, keepMatches: Boolean): (Seq[Long], Seq[Long]) = {
    val f = fs(spark, basePath)
    val live = committedIds(spark, basePath)
    if (live.isEmpty) return (Seq.empty, Seq.empty)
    val (touched, untouched) = pruneBatches(spark, basePath, predicate)
    if (touched.isEmpty) return (Seq.empty, Seq.empty) // provably no matching row
    val partCols: Seq[String] =
      storedPartSchema(spark, basePath).map(_.fieldNames.toSeq).getOrElse {
        // pre-_PARTSCHEMA partitioned tables: the partition columns are
        // whatever a batch read carries beyond the logged file schema —
        // a replacement MUST keep the table's layout or a later anchored
        // multi-dir read trips on conflicting directory structures
        storedSchema(spark, basePath).fold(Seq.empty[String]) { s =>
          scanDirs(spark, basePath, Seq(new Path(s"$basePath/_batch=${touched.head}")))
            .columns.filterNot(c => s.fieldNames.exists(_.equalsIgnoreCase(c))).toSeq
        }
      }
    // sidecar contract of the ORIGINALS carries over to the replacements
    def statsColsOf(id: Long): Seq[String] =
      BatchStats.read(f, new Path(s"$basePath/_batch=$id"))
        .map(_.cols.keys.toSeq.sorted).getOrElse(Nil)
    def bloomColsOf(id: Long): Seq[String] =
      BatchBloom.readNames(f, new Path(s"$basePath/_batch=$id")).toSeq.sorted
    var nextId = live.max + 1
    val replaced = Seq.newBuilder[Long]
    val replacements = Seq.newBuilder[Long]
    touched.foreach { id =>
      val one = scanDirs(spark, basePath, Seq(new Path(s"$basePath/_batch=$id")))
      val rewritten =
        if (keepMatches) transform(one)
        else one.filter(!F.coalesce(predicate, F.lit(false))) // NULL predicate keeps the row
      val newId = nextId
      val dest = new Path(s"$basePath/_batch=$newId")
      if (f.exists(dest)) f.delete(dest, true) // crashed prior attempt's debris
      val writer = rewritten.write.mode("overwrite")
      (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
        .parquet(dest.toString)
      // a delete that emptied the batch: drop the id, keep no empty dir
      val landed = scala.util.Try(spark.read.option("basePath", basePath)
        .parquet(dest.toString).drop("_batch")).toOption
      val survivors = landed.map(_.count()).getOrElse(0L)
      if (survivors == 0L) { f.delete(dest, true); replaced += id }
      else {
        landed.foreach { l =>
          val sc = statsColsOf(id)
          val stats = Option.when(sc.nonEmpty)(BatchStats.compute(l, sc))
          stats.foreach(BatchStats.write(f, dest, _))
          val bc = bloomColsOf(id)
          if (bc.nonEmpty)
            BatchBloom.write(f, dest,
              BatchBloom.compute(l, bc, stats.map(_.rows).getOrElse(survivors)))
        }
        nextId += 1
        replaced += id
        replacements += newId
      }
    }
    val newIds = replacements.result()
    // same flip discipline as the folds: upgrade a marker table first,
    // pre-mark the (invisible) replacements, flip once
    if (manifestIds(spark, basePath).isEmpty)
      commitManifest(spark, basePath, live)
    newIds.foreach(id => f.create(new Path(s"$basePath/_batch=$id/$Marker"), true).close())
    val after = (live.filterNot(replaced.result().contains) ++ newIds).sorted
    commitManifest(spark, basePath, after)
    logCommit(spark, basePath, after, kind = "rewrite")
    (replaced.result(), newIds)
  }

  /** Delete batch directories no longer in the manifest (replaced by a
    * [[compact]], or debris from a crashed append/compact attempt that
    * never became visible). Manifest tables only — a marker-protocol
    * table has no replaced dirs to clean. As with
    * [[Snapshots.vacuum]], a reader that resolved the manifest BEFORE a
    * flip may still be scanning a replaced dir; run vacuum on a
    * maintenance cadence that outlives query runtimes. Returns the
    * deleted ids.
    *
    * `retainVersions` is the TIME-TRAVEL retention dial (Delta's
    * `VACUUM ... RETAIN` role): batches referenced by the newest k
    * commit-log entries are kept even when replaced, so [[readAsOf]]
    * stays serviceable that far back; 0 (the default) keeps only the
    * current state. Retired log entries whose batches were deleted are
    * dropped with them — [[versions]] then lists exactly the readable
    * range.
    */
  def vacuum(spark: SparkSession, basePath: String,
      retainVersions: Int = 0): Seq[Long] =
    manifestIds(spark, basePath).fold(Seq.empty[Long]) { ids =>
      val f = fs(spark, basePath)
      val base = new Path(basePath)
      if (!f.exists(base)) return Seq.empty
      // a [[compactClustered]] crash after its renames strands a
      // partial `_cluster_tmp` that no retry may ever come to clear —
      // it is pure scratch (never reader-visible), reclaim it here
      f.delete(new Path(base, "_cluster_tmp"), true)
      val vs = versions(spark, basePath)
      val retained = vs.takeRight(math.max(0, retainVersions))
      val protected_ = ids.toSet ++
        retained.flatMap(v => vlogIds(f, basePath, v).getOrElse(Seq.empty))
      val dead = f.listStatus(base).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("_batch="))
        .flatMap(st =>
          scala.util.Try(st.getPath.getName.stripPrefix("_batch=").toLong).toOption)
        .filterNot(protected_.contains)
      dead.foreach(id => f.delete(new Path(s"$basePath/_batch=$id"), true))
      // retire log entries that reference a deleted batch — readAsOf's
      // domain stays exactly the readable versions
      if (dead.nonEmpty) {
        val deadSet = dead.toSet
        vs.dropRight(math.max(0, retainVersions))
          .filter(v => vlogIds(f, basePath, v).exists(_.exists(deadSet.contains)))
          .foreach(v => f.delete(vlogPath(basePath, v), false))
      }
      dead.sorted
    }

  /** Everything committed so far — never a torn batch. None when no batch
    * has ever committed (distinguishes "empty table" from "no table").
    */
  def readIfExists(spark: SparkSession, basePath: String): Option[DataFrame] = {
    val dirs = committedDirs(spark, basePath)
    if (dirs.isEmpty) None
    else Some(scanDirs(spark, basePath, dirs))
  }

  /** [[readIfExists]] that fails actionably on a never-written table. */
  def read(spark: SparkSession, basePath: String): DataFrame =
    readIfExists(spark, basePath).getOrElse(
      throw new IllegalArgumentException(s"no committed batches under $basePath"))

  /** `read(...).filter(predicate)`, with the scan list pruned by each
    * batch's zone map FIRST ([[BatchStats]]): a batch whose `_STATS`
    * prove the predicate empty is dropped driver-side — no footer reads,
    * no tasks. Semantically always `filter(predicate)` over the full
    * committed table: skipping is sound-only (a stats-less batch, an
    * unsupported conjunct, a type mix — everything uncertain scans), and
    * the predicate is re-applied to the surviving batches, where it also
    * pushes into the parquet scan as usual (row-group pruning under the
    * batch pruning). Pair with [[compactClustered]] to make the batch
    * ranges tight enough to skip on.
    */
  def read(spark: SparkSession, basePath: String, predicate: Column): DataFrame = {
    val dirs = committedDirs(spark, basePath)
    if (dirs.isEmpty)
      throw new IllegalArgumentException(s"no committed batches under $basePath")
    val (kept, _) = partitionByStats(spark, dirs, predicate)
    if (kept.isEmpty) // every batch provably empty: the schema still binds
      scanDirs(spark, basePath, Seq(dirs.head)).filter(predicate).filter(F.lit(false))
    else scanDirs(spark, basePath, kept).filter(predicate)
  }

  /** The pruning decision alone, for observability and specs:
    * (kept, skipped) committed batch ids under `predicate`.
    */
  def pruneBatches(spark: SparkSession, basePath: String,
      predicate: Column): (Seq[Long], Seq[Long]) = {
    // a malformed `_batch=<non-numeric>` dir is scanned by the read path
    // (markerDirs tolerates it) — observability must not crash on it
    def id(p: Path) =
      scala.util.Try(p.getName.stripPrefix("_batch=").toLong).toOption
    val (kept, skipped) =
      partitionByStats(spark, committedDirs(spark, basePath), predicate)
    (kept.flatMap(id), skipped.flatMap(id))
  }

  private def partitionByStats(spark: SparkSession, dirs: Seq[Path],
      predicate: Column): (Seq[Path], Seq[Path]) = {
    if (dirs.isEmpty) return (dirs, Seq.empty)
    val f = dirs.head.getFileSystem(spark.sessionState.newHadoopConf())
    // compile ONCE from a probe plan over one batch; evaluate per batch.
    // The probe anchors basePath at the table root like every reader, so
    // its resolved schema matches what [[read]] serves
    val node = BatchStats.compile(
      scanDirs(spark, dirs.head.getParent.toString, Seq(dirs.head)).filter(predicate))
    // bloom sidecars only ever decide Eq/IN leaves — skip their read
    // for pure range predicates, and deserialize ONLY the probed
    // columns' sketches otherwise
    val eqCols = BatchStats.equalityColumns(node)
    dirs.partition { dir =>
      val statsEmpty = BatchStats.read(f, dir).exists(BatchStats.mustBeEmpty(_, node))
      def bloomEmpty = eqCols.nonEmpty && {
        val blooms = BatchBloom.read(f, dir, Some(eqCols))
        blooms.nonEmpty && BatchBloom.mustBeEmpty(blooms, node)
      }
      !(statsEmpty || bloomEmpty)
    }
  }
}
