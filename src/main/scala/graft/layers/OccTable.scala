package graft.layers

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** MULTI-WRITER optimistic concurrency for batch tables — the one Delta
  * protocol role [[AtomicAppend]] leaves out by its single-maintainer
  * contract (the reference gets multi-writer ACID from Delta's
  * optimistic commit protocol under every job: `docs/ARCHITECTURE.md:
  * 167-174`, `spark/app/streaming_job.py:100-105`). Independent
  * processes appending/compacting ONE table race safely: every commit
  * is an atomic CREATE-IF-ABSENT of the next `_VLOG/v=<n>` entry — the
  * log entry IS the commit, exactly Delta's discipline — and a loser
  * re-reads the tip and either REBASES (its change composes with what
  * won: an append always does; a fold whose sources all survived does)
  * or ABORTS with [[ConcurrentCommitException]] (its sources were
  * replaced — folding them would resurrect stale content).
  *
  * Shared on-disk format with [[AtomicAppend]]: `_batch=<id>` dirs,
  * `_VLOG/v=<n>` entries (`kind:id,id,…`), `_STATS` zone maps. TIME
  * TRAVEL ([[AtomicAppend.readAsOf]]), `versions`, `history`, and the
  * insert-only change feed ([[AtomicAppend.changesBetween]]) therefore
  * work UNCHANGED on an OCC table. What differs is the visibility root:
  * OCC readers resolve the ADOPTED LOG TIP (scan forward from the
  * advisory `LATEST` pointer), never a mutable manifest — two
  * last-writer-wins manifest flips would lose one writer's batches,
  * which is precisely why the single-maintainer protocol cannot be
  * driven concurrently. The `_OCC` flag marks the table; the
  * single-maintainer mutators refuse it.
  *
  * The create-if-absent primitive needs the commit file to appear
  * ATOMICALLY, WHOLE, and EXCLUSIVELY:
  *   - local/POSIX: write a private tmp, then hard-LINK it into place —
  *     link(2) fails with EEXIST if the destination exists and exposes
  *     the full content in one metadata op (a bare rename OVERWRITES on
  *     POSIX, and create-then-write exposes a torn entry);
  *   - HDFS-like stores: rename, which is atomic and fails on an
  *     existing destination there.
  *
  * At 100 TB / 1000 executors: commit cost is one tiny-file link plus
  * the (already-written) batch dir — contention is on the version
  * counter only, never on data; losers retry metadata-only (the staged
  * batch dir is reused across attempts). Batch-id claims go through the
  * same exclusive-create primitive under `_IDCLAIM/`, so two writers
  * can never stage into one directory.
  *
  * Scope: concurrent `append` + `compact` (the multi-writer reality of
  * parallel ingest pipelines) rebase; copy-on-write `deleteWhere` /
  * `updateWhere` commit under the strict SERIALIZABLE conflict rule
  * (any commit since their snapshot aborts them — a DML's correctness
  * depends on having evaluated every row its predicate could match;
  * WriteSerializable's blind-append relaxation is deliberately not
  * taken). Deletion vectors / CDF change files stay with the
  * single-maintainer protocol — their sidecars are keyed by a version
  * the writer cannot predict under contention.
  */
object OccTable {

  /** A commit lost its optimistic race against a conflicting writer and
    * cannot rebase: retrying would fold/replace content that no longer
    * exists. The staged batch dir has been cleaned up; re-read and
    * re-derive.
    */
  final class ConcurrentCommitException(msg: String)
    extends RuntimeException(msg)

  private val OccFlag = "_OCC"

  private def fs(spark: SparkSession, path: String) =
    AtomicAppend.fs(spark, path)

  def isOcc(spark: SparkSession, basePath: String): Boolean =
    fs(spark, basePath).exists(new Path(s"$basePath/$OccFlag"))

  /** Mark `basePath` as a multi-writer table (idempotent). Must run
    * before the first concurrent writer; an existing single-maintainer
    * table must be quiesced first (no in-flight commits) since its
    * manifest stops being consulted.
    */
  def create(spark: SparkSession, basePath: String): Unit = {
    val f = fs(spark, basePath)
    f.mkdirs(new Path(basePath))
    val flag = new Path(s"$basePath/$OccFlag")
    if (!f.exists(flag)) f.create(flag, true).close()
  }

  // ------------------------------------------------- exclusive create

  /** Atomically publish `content` at `dest` iff nothing is there:
    * full-content-or-nothing, exclusive. Returns false when another
    * writer won the slot.
    */
  private def atomicPut(f: FileSystem, content: String, dest: Path): Boolean = {
    val tmp = new Path(dest.getParent, s".${dest.getName}.${UUID.randomUUID()}.tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val won =
      if (f.getScheme == "file") {
        val t = java.nio.file.Paths.get(tmp.toUri.getPath)
        val d = java.nio.file.Paths.get(dest.toUri.getPath)
        try { java.nio.file.Files.createLink(d, t); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else !f.exists(dest) && f.rename(tmp, dest) // HDFS rename: atomic, no overwrite
    f.delete(tmp, false)
    won
  }

  // ------------------------------------------------------ log tip

  /** The adopted log tip: scan forward from the advisory `LATEST`
    * pointer (which losers of a pointer race may leave stale or even
    * regressed — the forward scan converges regardless) to the highest
    * existing `v=<n>`.
    */
  private def tip(f: FileSystem, basePath: String): Option[Long] = {
    var t = graft.runtime.PointerFile.read(f,
        new Path(s"$basePath/_VLOG/LATEST"),
        new Path(s"$basePath/_VLOG/LATEST.tmp"))
      .flatMap(s => scala.util.Try(s.toLong).toOption)
    // a stale pointer is behind; a regressed one is also behind. Start
    // at -1 when no pointer (covers a pre-pointer or empty log).
    var probe = t.getOrElse(-1L) + 1L
    while (f.exists(AtomicAppend.vlogPath(basePath, probe))) {
      t = Some(probe); probe += 1L
    }
    t
  }

  /** Best-effort pointer advance: unique tmp per writer (two concurrent
    * PointerFile commits through ONE tmp would corrupt), losers may
    * regress it transiently — [[tip]]'s forward scan absorbs that.
    */
  private def advancePointer(f: FileSystem, basePath: String, v: Long): Unit =
    scala.util.Try(graft.runtime.PointerFile.commit(f,
      new Path(s"$basePath/_VLOG/LATEST"),
      new Path(s"$basePath/_VLOG/LATEST.tmp.${UUID.randomUUID()}"), v.toString))

  /** The live batch ids at the adopted tip (empty table = no commits). */
  def currentIds(spark: SparkSession, basePath: String): Seq[Long] = {
    val f = fs(spark, basePath)
    tip(f, basePath)
      .flatMap(v => AtomicAppend.vlogEntry(f, basePath, v))
      .map(_.ids).getOrElse(Seq.empty)
  }

  def versions(spark: SparkSession, basePath: String): Seq[Long] =
    AtomicAppend.versions(spark, basePath)

  def history(spark: SparkSession, basePath: String): Seq[(Long, Seq[Long])] =
    AtomicAppend.history(spark, basePath)

  def describeHistory(spark: SparkSession, basePath: String): String =
    AtomicAppend.describeHistory(spark, basePath)

  /** Everything committed at the adopted tip — the OCC read path (the
    * manifest is never consulted; see the class doc).
    */
  def read(spark: SparkSession, basePath: String): DataFrame = {
    val ids = currentIds(spark, basePath)
    if (ids.isEmpty) AtomicAppend.emptyFrame(spark, basePath)
    else AtomicAppend.scanDirs(spark, basePath,
      ids.map(id => new Path(s"$basePath/_batch=$id")), None)
  }

  def readAsOf(spark: SparkSession, basePath: String, version: Long): DataFrame =
    AtomicAppend.readAsOf(spark, basePath, version)

  /** OCC-safe schema publish. The single-maintainer `logSchema` commits
    * through a SHARED-tmp pointer: two first-ever concurrent appenders
    * can interleave create(overwrite)/rename and expose an EMPTY
    * `_SCHEMA` to a concurrent reader (observed: DataType.fromJson on
    * "" mid-race). Here the FIRST publish goes through the exclusive
    * create-if-absent primitive — one winner, whole content, losers
    * converge by re-reading. A table that already has a schema
    * delegates to `logSchema` (no write when the merged schema equals
    * the stored one — the identical-schema steady state); concurrent
    * EVOLUTION stays out of OCC v1 scope.
    */
  private def logSchemaOcc(spark: SparkSession, f: FileSystem,
      basePath: String, schema: org.apache.spark.sql.types.StructType): Unit =
    AtomicAppend.storedSchema(spark, basePath) match {
      case Some(_) => AtomicAppend.logSchema(spark, basePath, schema)
      case None =>
        val relaxed = org.apache.spark.sql.types.StructType(schema.fields.map(fd =>
          fd.copy(dataType = AtomicAppend.relaxNullability(fd.dataType),
            nullable = true)))
        atomicPut(f, relaxed.json, new Path(s"$basePath/_SCHEMA"))
        // winner or loser, a whole schema is now in place
    }

  // ------------------------------------------------------ id claims

  /** Claim a batch id no other writer can stage into: exclusive create
    * under `_IDCLAIM/`. Starts probing above the tip entry's max and
    * every existing claim.
    */
  private def claimBatchId(f: FileSystem, basePath: String): Long = {
    val claimDir = new Path(s"$basePath/_IDCLAIM")
    f.mkdirs(claimDir)
    val claimed = f.listStatus(claimDir).toSeq
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
    val tipMax = {
      val t = tip(f, basePath)
      t.flatMap(v => AtomicAppend.vlogEntry(f, basePath, v)).map(_.ids)
        .getOrElse(Seq.empty)
    }
    var id = (claimed ++ tipMax).maxOption.map(_ + 1L).getOrElse(0L)
    while (!atomicPut(f, "", new Path(claimDir, id.toString)))
      id += 1L
    id
  }

  // ------------------------------------------------------ commits

  /** The optimistic commit loop: read the adopted tip, derive the new
    * live set via `rebase` (None = true conflict, abort), attempt the
    * exclusive create of `v=tip+1`. The entry format is
    * [[AtomicAppend]]'s, so time travel and feeds interop.
    */
  private def commitLoop(f: FileSystem, basePath: String, kind: String,
      rebase: Seq[Long] => Option[Seq[Long]], maxAttempts: Int = 64): Long = {
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val t = tip(f, basePath)
      val tipIds = t.flatMap(v => AtomicAppend.vlogEntry(f, basePath, v))
        .map(_.ids).getOrElse(Seq.empty)
      rebase(tipIds) match {
        case None => throw new ConcurrentCommitException(
          s"optimistic $kind of $basePath lost to a conflicting commit " +
            s"(tip ids ${tipIds.mkString(",")} no longer contain this " +
            "commit's sources) and cannot rebase — re-read and re-derive")
        case Some(newIds) =>
          val next = t.map(_ + 1L).getOrElse(0L)
          val content = s"$kind:${newIds.sorted.mkString(",")}"
          if (atomicPut(f, content,
              AtomicAppend.vlogPath(basePath, next))) {
            advancePointer(f, basePath, next)
            return next
          } // lost the version slot: loop re-reads the new tip
      }
    }
    throw new ConcurrentCommitException(
      s"optimistic $kind of $basePath lost $maxAttempts consecutive version " +
        "races — contention this hot needs a coordinator in front of the table")
  }

  /** Append `df` as one batch, racing safely against any number of
    * concurrent appenders/compactors. Returns (batchId, version). The
    * batch dir is staged ONCE under an exclusively-claimed id; only the
    * metadata commit retries on a lost race (an append composes with
    * any winner — Delta's blind-append rule — so it never aborts).
    */
  def append(df: DataFrame, basePath: String,
      statsCols: Seq[String] = Nil): (Long, Long) = {
    val spark = df.sparkSession
    val f = fs(spark, basePath)
    create(spark, basePath)
    val id = claimBatchId(f, basePath)
    val dir = new Path(s"$basePath/_batch=$id")
    logSchemaOcc(spark, f, basePath, df.schema)
    val obs = Option.when(statsCols.nonEmpty)(
      (org.apache.spark.sql.Observation(), BatchStats.observationAggs(df, statsCols)))
    val observed = obs.fold(df) { case (o, (_, aggs)) =>
      df.observe(o, aggs.head, aggs.tail: _*) }
    observed.write.mode("overwrite").parquet(dir.toString)
    obs.foreach { case (o, (fields, _)) =>
      BatchStats.write(f, dir, BatchStats.fromObserved(o.get, fields)) }
    val v = commitLoop(f, basePath, "append",
      tipIds => Some((tipIds :+ id).sorted))
    (id, v)
  }

  /** Fold the batches live at the snapshot this call takes into one new
    * batch. On a lost race: REBASES over concurrent appends (their
    * batches survive untouched beside the fold) and ABORTS when any
    * folded source was itself replaced by a concurrent fold — retrying
    * would resurrect content the winner already superseded. Returns
    * (foldedId, version), or None when fewer than `minBatches` live.
    */
  def compact(spark: SparkSession, basePath: String,
      minBatches: Int = 2): Option[(Long, Long)] = {
    val snapshot = currentIds(spark, basePath)
    if (snapshot.size < minBatches) None
    else Some(foldPrepared(spark, basePath, snapshot))
  }

  /** [[compact]]'s fold + commit given an already-taken snapshot —
    * separated so a spec can interleave a conflicting commit between
    * snapshot and attempt deterministically.
    */
  private[graft] def foldPrepared(spark: SparkSession, basePath: String,
      snapshot: Seq[Long]): (Long, Long) = {
    val f = fs(spark, basePath)
    val id = claimBatchId(f, basePath)
    val dir = new Path(s"$basePath/_batch=$id")
    AtomicAppend.scanDirs(spark, basePath,
        snapshot.map(i => new Path(s"$basePath/_batch=$i")), None)
      .write.mode("overwrite").parquet(dir.toString)
    // zone maps fold exactly, as in the single-maintainer protocol
    val srcStats = snapshot.map(i =>
      BatchStats.read(f, new Path(s"$basePath/_batch=$i")))
    if (srcStats.forall(_.isDefined))
      BatchStats.write(f, dir, BatchStats.merge(srcStats.flatten))
    val snapSet = snapshot.toSet
    try {
      val v = commitLoop(f, basePath, "fold", tipIds =>
        if (snapSet.subsetOf(tipIds.toSet))
          Some(tipIds.filterNot(snapSet.contains) :+ id)
        else None)
      (id, v)
    } catch {
      case e: ConcurrentCommitException =>
        f.delete(dir, true) // the staged fold never became visible
        f.delete(new Path(s"$basePath/_IDCLAIM/$id"), false)
        throw e
    }
  }

  /** [[read]] with the scan list pruned by each batch's zone map —
    * the OCC face of [[AtomicAppend.read(spark, basePath, predicate)]]
    * (that one resolves the manifest, which OCC tables don't keep).
    */
  def read(spark: SparkSession, basePath: String, predicate: Column): DataFrame = {
    val ids = currentIds(spark, basePath)
    if (ids.isEmpty)
      throw new IllegalArgumentException(s"no committed versions under $basePath")
    val dirs = ids.map(id => new Path(s"$basePath/_batch=$id"))
    val (kept, _) = AtomicAppend.partitionByStats(spark, dirs, predicate)
    if (kept.isEmpty)
      AtomicAppend.scanDirs(spark, basePath, Seq(dirs.head), None)
        .filter(predicate).filter(F.lit(false))
    else AtomicAppend.scanDirs(spark, basePath, kept, None).filter(predicate)
  }

  /** Copy-on-write `DELETE ... WHERE` under optimistic concurrency: the
    * snapshot's touched batches (zone-map pruned, as in the
    * single-maintainer protocol) rewrite under fresh claimed ids, and
    * the commit races through the same create-if-absent loop.
    *
    * Delta's conflict matrix, honestly applied: a DELETE's correctness
    * depends on having seen every row its predicate could match, so a
    * CONCURRENT APPEND is a true conflict for it (the appended rows were
    * never evaluated — Delta Serializable semantics; its
    * WriteSerializable relaxation admits blind appends, which this v1
    * does not). The rebase rule is therefore strict equality on the
    * batch set: any commit that landed since the snapshot aborts the
    * delete, the staged replacements are cleaned up, and the caller
    * re-runs against the new tip. Returns (replaced ids, replacement
    * ids, version); (Nil, Nil, -1) when nothing matched.
    */
  def deleteWhere(spark: SparkSession, basePath: String,
      predicate: Column): (Seq[Long], Seq[Long], Long) =
    deleteWherePrepared(spark, basePath, predicate, currentIds(spark, basePath))

  /** Copy-on-write `UPDATE ... SET ... WHERE` under the same optimistic
    * discipline and the same strict Serializable conflict rule as
    * [[deleteWhere]] (an UPDATE's correctness equally depends on having
    * evaluated every row its predicate could match). TRUE rows get each
    * assignment applied; FALSE/NULL rows pass through.
    */
  def updateWhere(spark: SparkSession, basePath: String, predicate: Column,
      assignments: Map[String, Column]): (Seq[Long], Seq[Long], Long) = {
    require(assignments.nonEmpty, "updateWhere needs at least one assignment")
    rewritePrepared(spark, basePath, predicate, currentIds(spark, basePath),
      rewriteOne = df => {
        assignments.keys.foreach(c => require(df.columns.exists(_.equalsIgnoreCase(c)),
          s"updateWhere assigns unknown column '$c' (table has ${df.columns.mkString(",")})"))
        df.select(df.columns.toSeq.map { c =>
          assignments.find(_._1.equalsIgnoreCase(c)) match {
            case Some((_, v)) =>
              F.when(F.coalesce(predicate, F.lit(false)), v).otherwise(F.col(c)).as(c)
            case None => F.col(c)
          }
        }: _*)
      })
  }

  /** [[deleteWhere]]'s rewrite + commit given an already-taken snapshot
    * — separated so a spec can interleave a conflicting commit between
    * snapshot and attempt deterministically.
    */
  private[graft] def deleteWherePrepared(spark: SparkSession, basePath: String,
      predicate: Column, snapshot: Seq[Long]): (Seq[Long], Seq[Long], Long) =
    rewritePrepared(spark, basePath, predicate, snapshot,
      rewriteOne = df => df.filter(!F.coalesce(predicate, F.lit(false))))

  private def rewritePrepared(spark: SparkSession, basePath: String,
      predicate: Column, snapshot: Seq[Long],
      rewriteOne: DataFrame => DataFrame): (Seq[Long], Seq[Long], Long) = {
    val f = fs(spark, basePath)
    if (snapshot.isEmpty) return (Seq.empty, Seq.empty, -1L)
    val dirs = snapshot.map(id => new Path(s"$basePath/_batch=$id"))
    val (keptDirs, _) = AtomicAppend.partitionByStats(spark, dirs, predicate)
    val touched = keptDirs.flatMap(p =>
      scala.util.Try(p.getName.stripPrefix("_batch=").toLong).toOption)
    if (touched.isEmpty) return (Seq.empty, Seq.empty, -1L)
    val replaced = Seq.newBuilder[Long]
    val replacements = Seq.newBuilder[Long]
    touched.foreach { id =>
      val one = AtomicAppend.scanDirs(spark, basePath,
        Seq(new Path(s"$basePath/_batch=$id")), None)
      val survivors = rewriteOne(one)
      val newId = claimBatchId(f, basePath)
      val dest = new Path(s"$basePath/_batch=$newId")
      val srcStats = BatchStats.read(f, new Path(s"$basePath/_batch=$id"))
      val statsCols = srcStats.map(_.cols.keys.toSeq.sorted).getOrElse(Nil)
      val obs = org.apache.spark.sql.Observation()
      val (fields, aggs) = BatchStats.observationAggs(survivors, statsCols)
      survivors.observe(obs, aggs.head, aggs.tail: _*)
        .write.mode("overwrite").parquet(dest.toString)
      val stats = BatchStats.fromObserved(obs.get, fields)
      if (stats.rows == 0L) { // emptied: drop the id, keep no dir
        f.delete(dest, true)
        f.delete(new Path(s"$basePath/_IDCLAIM/$newId"), false)
        replaced += id
      } else {
        if (statsCols.nonEmpty) BatchStats.write(f, dest, stats)
        replaced += id; replacements += newId
      }
    }
    val replacedSet = replaced.result().toSet
    val newIds = replacements.result()
    try {
      val v = commitLoop(f, basePath, "rewrite", tipIds =>
        // strict-equality conflict rule (Serializable DELETE/UPDATE):
        // any commit since the snapshot — even a blind append — aborts
        if (tipIds.sorted == snapshot.sorted)
          Some(tipIds.filterNot(replacedSet.contains) ++ newIds)
        else None)
      (replaced.result(), newIds, v)
    } catch {
      case e: ConcurrentCommitException =>
        newIds.foreach { id =>
          f.delete(new Path(s"$basePath/_batch=$id"), true)
          f.delete(new Path(s"$basePath/_IDCLAIM/$id"), false)
        }
        throw e
    }
  }

  /** Claims and replaced batch dirs that no surviving version references
    * — OCC's vacuum sibling ([[AtomicAppend.vacuum]] is manifest-keyed
    * and does not apply). Retains the newest `retainVersions` entries'
    * batches for time travel, like the single-maintainer vacuum.
    */
  def vacuum(spark: SparkSession, basePath: String,
      retainVersions: Int = 0): Seq[Long] = {
    val f = fs(spark, basePath)
    val vs = versions(spark, basePath)
    if (vs.isEmpty) return Seq.empty
    val keepVs = vs.takeRight(math.max(1, retainVersions + 1))
    val protectedIds = keepVs.flatMap(v =>
      AtomicAppend.vlogEntry(f, basePath, v).map(_.ids).getOrElse(Seq.empty)).toSet
    val base = new Path(basePath)
    val dead = f.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_batch="))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix("_batch=").toLong).toOption)
      .filterNot(protectedIds.contains)
    dead.foreach { id =>
      f.delete(new Path(s"$basePath/_batch=$id"), true)
      f.delete(new Path(s"$basePath/_IDCLAIM/$id"), false)
    }
    vs.filterNot(keepVs.contains)
      .filter(v => AtomicAppend.vlogEntry(f, basePath, v)
        .exists(_.ids.exists(dead.toSet.contains)))
      .foreach(v => f.delete(AtomicAppend.vlogPath(basePath, v), false))
    dead.sorted
  }
}
