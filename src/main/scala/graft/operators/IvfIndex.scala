package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.functions.VectorFunctions.asDouble
import graft.plans.GraftFunctions

/** Persisted IVF (inverted-file) ANN index — the scale tier of
  * [[Similarity]]: the expensive work (KMeans fit + cell assignment)
  * happens ONCE, offline, and every query afterwards scans only the
  * `nProbe` probed cells via physical partition pruning. This is the ANN
  * analog of the reference's "train offline, serve the registered
  * artifact" split (`ml_training_job.py` vs `main.py:386-393`), applied
  * to search instead of classification.
  *
  * Layout under an index root:
  * {{{
  *   <root>/centroids.parquet                     (cell, centroid) — C rows
  *   <root>/vectors/epoch=<e>/cell=<i>/...        (id, vec, nrm) partitioned
  * }}}
  * The `epoch` partition level is the unit of incremental ingest and of
  * crash recovery, exactly as in [[NearDupIndex]]: the build writes
  * epoch [[BuildEpoch]]; each [[append]] overwrites its own epoch's
  * partitions, so a replayed batch converges instead of duplicating
  * vectors (a duplicated id would occupy two top-k slots and displace a
  * true neighbor). Probes filter on `cell` only — partition pruning on
  * the inner level skips unprobed cells across every epoch.
  *
  * Query cost: rank C centroids (index metadata, driver-side O(C·d)),
  * then scan ~nProbe/C of the corpus. The probe list becomes a LITERAL
  * `cell IN (...)` predicate, so the parquet scan's `PartitionFilters`
  * prune unprobed cells without listing them (PlanSpec asserts this) —
  * at 100 TB the probe reads nProbe directories, not the table.
  */
object IvfIndex {

  /** Epoch the initial [[build]] writes under; streaming batch ids start
    * at 0 and can never collide with it.
    */
  val BuildEpoch: Long = -1L

  /** Build the index: fit KMeans on (a sample of) the corpus, assign every
    * vector to its nearest centroid, write vectors partitioned by cell.
    * `trainFraction < 1` fits centroids on a sample — at large N the
    * centroid quality is sample-stable and the fit stays cheap; assignment
    * is always over the full corpus (one distributed transform).
    */
  def build(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      root: String,
      numCentroids: Int = 16,
      seed: Long = 42L,
      trainFraction: Double = 1.0,
      kmeansMaxIter: Int = 20,
      kmeansInitMode: String = "k-means||"): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    GraftFunctions.register(df.sparkSession)
    // drop any previous digest BEFORE overwriting the vectors: a crash
    // between the two would otherwise leave a digest describing the OLD
    // corpus next to the NEW vectors, and a later append screening
    // against it could prove a colliding id "clean" — silent corruption.
    // With the digest gone first, the same crash window only degrades
    // the guard to its exact-scan fallback.
    locally {
      val p = new org.apache.hadoop.fs.Path(s"$root/digests")
      val fs = p.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
    val vecs = df.select(F.col(idCol).as("id"), asDouble(F.col(vecCol)).as("vec"))
      .withColumn("features", array_to_vector(F.col("vec")))
    val train =
      if (trainFraction < 1.0) vecs.sample(withReplacement = false, trainFraction, seed)
      else vecs
    // the k-means dials are real build knobs at corpus scale: every
    // iteration (and every k-means|| init round) is a full pass over the
    // training set as 1-2 Spark jobs — probe RECALL depends on cell
    // balance, not centroid optimality, so operators trade iterations
    // against build wall-clock (and exactness gates like qe11, where the
    // answer is centroid-independent, dial both to the floor).
    //
    // FIT ROUTING (round-15 optimization, guide §1.2 "per-task work"):
    // coarse-quantizer training needs only a BOUNDED sample — ~256
    // vectors per centroid is the standard IVF training budget; more
    // moves centroids negligibly while every MLlib fit iteration is a
    // full distributed pass (measured ~1 s of qe11's ledger row at 3
    // iterations). When that bounded sample fits comfortably on the
    // driver (byte-guarded below), collect it ONCE and run [[localKMeans]]
    // there — one Spark job instead of MLlib's init + per-iteration
    // jobs, with empty-cluster re-seeding keeping exactly C centers.
    // Above the byte guard (huge d·C products — the 256× scale legs) the
    // distributed MLlib fit remains, so the path stays 100 TB-safe:
    // probe CORRECTNESS is centroid-independent either way (vectors land
    // in SOME cell; readers probe by the same centroid table).
    val localCap = math.min(131072L, math.max(8192L, 256L * numCentroids))
    // null vectors carry no training signal and would NPE the size probe
    // (round-16, advice item): drop them from the fit — assignment below
    // still sees every row
    val trainNonNull = train.filter(F.col("vec").isNotNull)
    val dim: Int = trainNonNull.select(F.size(F.col("vec"))).head(1).headOption
      .map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        s"IvfIndex.build: empty training set (trainFraction=$trainFraction) — " +
          "build needs at least one non-null vector to fit centroids"))
    val localBytesOk = localCap * dim * 8L <= (128L << 20)
    val cents: Seq[(Int, Array[Double])] =
      if (localBytesOk) {
        // bounded sample by HASH ORDER, not limit() (round-16, advice
        // item): limit takes a prefix of whichever partitions answer
        // first — on a sorted/skewed corpus the coarse quantizer would
        // train on one region and unbalance cell occupancy. orderBy(hash)
        // + limit plans as TakeOrdered (per-partition top-k, no full
        // sort shuffle) and is a deterministic pseudo-random subset.
        val sample: Array[Array[Double]] = trainNonNull
          .orderBy(F.xxhash64(F.col("id")), F.col("id"))
          .limit(localCap.toInt)
          .select(F.col("vec").cast("array<double>"))
          .collect()
          .map(_.getSeq[Double](0).toArray)
        val (centers, _) = localKMeans(sample, numCentroids,
          iters = math.max(kmeansMaxIter, 1), seed = seed)
        centers.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      } else {
        val model = new KMeans().setK(numCentroids).setSeed(seed)
          .setMaxIter(kmeansMaxIter).setInitMode(kmeansInitMode)
          .setFeaturesCol("features").fit(train)
        // the freshly-fit summary pins a live DataFrame (and the session) —
        // never let it ride into the transform closure (FraudMl's hygiene)
        graft.ml.FraudMl.stripTrainingSummary(model)
        model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }.toSeq
      }

    // corpus assignment rides the SAME exact codegen kernel the ingest
    // path uses ([[assignCells]]'s routing: literal argmin below
    // [[LiteralKernelMaxCells]], matrix kernel above) instead of MLlib's
    // row-at-a-time `transform` UDF — the n·C·d term is the build's data
    // pass, and the UDF path pays Vector boxing + non-codegen eval per
    // row (guide §4; measured 1.04 s → kernel speed on qe11's map
    // stage). Tie policy matches MLlib's findClosest (distance asc, then
    // cell asc), and qe10/qe11 probe every cell so the gate answer is
    // assignment-independent by construction either way.
    val assigned =
      if (cents.size > LiteralKernelMaxCells)
        assignCellsMultiExpr(vecs, "id", "vec", cents, 1)
          .withColumn("cell", F.col("cells").getItem(0)).drop("cells")
      else vecs.select(F.col("id"), F.col("vec"))
        .withColumn("cell", F.least(centroidCandidates(cents): _*).getField("cell"))

    // The three build outputs below are INDEPENDENT writes (vectors from
    // `assigned`, the centroid table from the driver-held `cents`, the
    // id digest from `vecs`) — overlap them (round-16, guide §2.6)
    // instead of paying their latencies serially; only the cell-count
    // sidecar waits, because it reads the landed vector files' footers.
    // Crash ordering stays safe: the digests dir was deleted up front
    // (the dangerous state is an OLD digest next to NEW vectors), and a
    // digest describing MORE ids than the landed vectors only routes an
    // append's screen to the exact scan, which is authoritative.
    val spark = df.sparkSession
    import spark.implicits._
    Par.awaitAll(Seq(
      // alongside the float vectors: int8 codes + scale (the IVF+SQ8
      // layout) — parquet column pruning means a quantized scan never
      // reads the float column at all
      () => assigned
        .select(F.col("id"), F.col("vec"),
          F.sqrt(F.call_function("vec_dot", F.col("vec"), F.col("vec"))).as("nrm"),
          (F.array_max(F.transform(F.col("vec"), x => F.abs(x))) / 127.0).as("q_scale"),
          F.col("cell"))
        .withColumn("q_codes",
          F.transform(F.col("vec"), x => F.round(x / F.col("q_scale")).cast("byte")))
        .withColumn("epoch", F.lit(BuildEpoch))
        // cluster by cell before the partitioned write: without it every
        // input task writes one file into every cell dir it touches —
        // tasks × C files per build (measured as the large-C ingest wall).
        // With it each cell lands whole in one task → one file per cell
        // (maxRecordsPerFile still splits a genuinely huge cell).
        .transform(clusterByCell(_, numCentroids))
        .write.mode("overwrite").partitionBy("epoch", "cell").parquet(s"$root/vectors"),
      () => cents.toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/centroids.parquet"),
      // the build corpus's id digest seeds the batch-sized collision guard
      // (see [[IdDigest]]); appends fold one more digest row per epoch
      () => IdDigest.digestFrame(vecs.select("id"), "id", BuildEpoch)
        .coalesce(1).write.mode("overwrite")
        .partitionBy("epoch").parquet(s"$root/digests")))

    // seed the cell-occupancy metadata (see [[cellOccupancy]]): the
    // counts come straight from the just-written files' parquet FOOTERS,
    // read on the driver (round-15 — the previous partition-column scan
    // was already footer-only on the executors, but paid a parallel
    // listing job + a scan job per build; C cell dirs with ~one file
    // each are metadata scale, the same tier as the centroid table).
    // Falls back to the distributed count above ~4096 files.
    locally {
      val conf = spark.sessionState.newHadoopConf()
      val rootP = new org.apache.hadoop.fs.Path(s"$root/vectors/epoch=$BuildEpoch")
      val fsys = rootP.getFileSystem(conf)
      val cellDirs = fsys.listStatus(rootP).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      val files = cellDirs.flatMap(d => fsys.listStatus(d.getPath).toSeq
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith(".")))
      import spark.implicits._
      if (files.size <= 4096) {
        // options built ONCE: ParquetFileReader.open(InputFile) would
        // otherwise construct a fresh Hadoop Configuration PER FILE —
        // profiled as an XML re-parse + jar-resource inflate per footer
        val readOpts = org.apache.parquet.HadoopReadOptions.builder(conf).build()
        val counts: Seq[(Int, Long)] = cellDirs.map { d =>
          val cell = d.getPath.getName.stripPrefix("cell=").toInt
          val n = fsys.listStatus(d.getPath).toSeq
            .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
              !st.getPath.getName.startsWith("."))
            .map { st =>
              val in = org.apache.parquet.hadoop.util.HadoopInputFile
                .fromStatus(st, conf)
              val r = new org.apache.parquet.hadoop.ParquetFileReader(in, readOpts)
              try r.getRecordCount finally r.close()
            }.sum
          (cell, n)
        }
        counts.toDF("cell", "n")
          .withColumn("epoch", F.lit(BuildEpoch))
          .coalesce(1).write.mode("overwrite")
          .partitionBy("epoch").parquet(s"$root/cellcounts")
      } else
        spark.read.parquet(s"$root/vectors").groupBy("cell")
          .agg(F.count(F.lit(1)).as("n"))
          .withColumn("epoch", F.lit(BuildEpoch))
          .coalesce(1).write.mode("overwrite")
          .partitionBy("epoch").parquet(s"$root/cellcounts")
    }
  }

  /** Incremental ingest: assign NEW vectors to the EXISTING centroids and
    * append them to their cell partitions — the ANN analog of
    * [[NearDupIndex.append]]. Assignment is EXACT and kernel-routed by
    * cell count ([[LiteralKernelMaxCells]]): up to the threshold, a pure
    * narrow expression (each centroid a LITERAL array, argmin over C
    * codegen'd `vec_dot` calls — no join, no shuffle); above it, the
    * O(1)-plan broadcast-join kernel. Either way the write is the only
    * wide-ish step and it's cell-clustered.
    *
    * Centroids are NOT refit: sustained appends drift the cell balance,
    * so periodically [[rebuild]] from the full corpus to rebalance —
    * standard IVF practice (probe correctness never degrades, only cell
    * selectivity). File counts are bounded by [[compact]].
    *
    * Idempotent under replay BY CONSTRUCTION, like
    * [[NearDupIndex.append]]: the write is a dynamic partition OVERWRITE
    * of `epoch=<epoch>`'s cell partitions, so replaying the same
    * (batch, epoch) rewrites the same directories and converges to one
    * copy wherever a previous attempt crashed. `epoch` must uniquely and
    * stably identify the batch (a streaming batch id does; [[BuildEpoch]]
    * is reserved), and a replay must present the same rows.
    *
    * Ids must be unique across the index's lifetime — a duplicated id
    * holds two rows, occupies two top-k slots, and makes [[topK]]'s
    * query-vector lookup nondeterministic. With `requireNewIds`
    * (default) append runs a batch-sized guard join against the indexed
    * ids (this epoch excluded, so replays pass) and throws on collision,
    * matching [[NearDupIndex.append]]'s contract.
    */
  def append(df: DataFrame, idCol: String, vecCol: String, root: String,
      epoch: Long, requireNewIds: Boolean = true): Unit = {
    GraftFunctions.register(df.sparkSession)
    appendAssigned(
      assignCells(df, idCol, vecCol, root)
        .withColumn("nrm",
          F.sqrt(F.call_function("vec_dot", F.col("vec"), F.col("vec")))),
      root, epoch, requireNewIds)
  }

  /** [[append]] for rows that ALREADY carry (id, vec, nrm, cell) — the
    * streaming ingest assigns cells once for its dedup gate and must not
    * pay the C-way argmin (and a second centroid read) again at fold
    * time.
    */
  private[graft] def appendAssigned(assigned: DataFrame, root: String,
      epoch: Long, requireNewIds: Boolean = true): Unit = {
    val spark = assigned.sparkSession
    requireEpochLayout(spark, root)
    if (requireNewIds) {
      // batch-INTERNAL uniqueness first: the cross-epoch guard below only
      // sees OTHER epochs, so the same id arriving twice in one batch
      // (e.g. one vec_id in two files of a single trigger) would pass it
      // and land twice in this epoch's partition — the exact two-top-k-
      // slots corruption the guard exists to prevent. Batch-sized groupBy,
      // cheap by construction.
      val dups = assigned.groupBy("id").count().filter(F.col("count") > 1)
        .limit(5).collect().map(_.get(0))
      require(dups.isEmpty,
        s"batch contains internally duplicated ids (sample: ${dups.mkString(",")}); " +
          "ids must be unique within a batch as well as across the index lifetime")
      // cross-epoch check via the per-epoch id digests: range + bloom
      // screening is batch-sized and usually proves the append clean with
      // ZERO index-data I/O; only bloom-hit (or digest-less) epochs get
      // the exact scan, and that scan is epoch-partition-pruned.
      // Deliberately NOT cell-pruned — a re-used id with a different
      // vector lands in a different cell, and the guard must catch
      // exactly that case. Disable via requireNewIds=false when upstream
      // id discipline is already enforced.
      val digests = readDigests(spark, root).filter(F.col("epoch") =!= epoch)
      val scanEpochs = IdDigest.suspectEpochs(assigned.select("id"), "id", digests,
        presentEpochs = listEpochs(spark, root).filter(_ != epoch))
      if (scanEpochs.nonEmpty) {
        // index side LEFT so the batch is the broadcast build side: the
        // id column streams partition-parallel off the scanned epochs,
        // never shuffled
        val collisions = spark.read.parquet(s"$root/vectors")
          .filter(F.col("epoch").isin(scanEpochs: _*)) // literal IN → partition-pruned
          .select("id")
          .join(F.broadcast(assigned.select("id")), Seq("id"), "left_semi")
          .limit(5).collect().map(_.get(0))
        require(collisions.isEmpty,
          s"batch re-uses ids already in the ANN index at '$root' " +
            s"(sample: ${collisions.mkString(",")}); ids must be unique across the index lifetime")
      }
    }
    // The epoch's three writes (vectors, id digest, cell occupancy) all
    // derive from `assigned` alone and land in disjoint roots — overlap
    // them (round-16, guide §2.6; this is the ingest trigger's serial
    // tail). Replay stays the discipline: each is a dynamic overwrite of
    // exactly this epoch's partitions, and a digest/count landing before
    // the vectors only routes a concurrent screen to the exact scan,
    // which reads the authoritative vector files.
    Par.awaitAll(Seq(
      () => assigned
        .select(F.col("id"), F.col("vec"), F.col("nrm"),
          (F.array_max(F.transform(F.col("vec"), x => F.abs(x))) / 127.0).as("q_scale"),
          F.col("cell"))
        .withColumn("q_codes",
          F.transform(F.col("vec"), x => F.round(x / F.col("q_scale")).cast("byte")))
        .select("id", "vec", "nrm", "q_scale", "q_codes", "cell")
        .withColumn("epoch", F.lit(epoch))
        // cell-cluster the fold (see [[build]]): a batch arriving in p tasks
        // would otherwise write up to p × C files per trigger — at C in the
        // hundreds that file churn IS the trigger's wall-clock, and the
        // accumulated small files are what [[compact]] later pays to fold.
        // Parallelism-sized count (NOT the centroid table — appendAssigned
        // must not pay a second centroid read): any explicit count keeps
        // each cell whole in one task; see [[clusterByCell]] for why the
        // count must be explicit at all.
        .transform(clusterByCell(_, spark.sparkContext.defaultParallelism))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic") // replay-safe: replaces only this epoch's dirs
        .partitionBy("epoch", "cell")
        .parquet(s"$root/vectors"),
      // fold this epoch's id digest under the same overwrite discipline —
      // replay rewrites the identical row, the guard above excluded it
      () => IdDigest.digestFrame(assigned.select("id"), "id", epoch)
        .coalesce(1).write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch").parquet(s"$root/digests"),
      // fold this epoch's cell occupancy row-set (batch-sized agg) so the
      // drift monitor ([[maxCellShare]]) stays metadata-only; same replay
      // discipline as the digest
      () => assigned.groupBy("cell").agg(F.count(F.lit(1)).as("n"))
        .withColumn("epoch", F.lit(epoch))
        .coalesce(1).write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch").parquet(s"$root/cellcounts")))
  }

  /** Fold every epoch <= `upToEpoch` into the single consolidated
    * [[BuildEpoch]] partition — the maintenance operator a long-running
    * ingest needs: each [[append]] adds one file-set per touched cell, so
    * after 10k triggers a probe's partition listing is 10k dirs deep per
    * cell. Compaction rewrites cold epochs into one, bounding file counts
    * without touching hot epochs (> `upToEpoch`) or changing any probe
    * answer — the index is a bag of (id, vec) partitioned by cell, and
    * this only moves rows between epoch partitions of the same cell.
    *
    * Replay-idempotent BY CONSTRUCTION, same discipline as [[append]]:
    * the consolidated content is `dropDuplicates("id")` of everything
    * read, and ids are unique index-wide (append's guard), so any crash
    * point re-runs to the same fixpoint:
    *
    *   1. the fold set (epochs <= `upToEpoch`, INCLUDING the current
    *      consolidated partition) is staged under `<root>/compacting` —
    *      a crash here leaves the index untouched;
    *   2. the staging copy is written over [[BuildEpoch]]'s cell
    *      partitions (dynamic overwrite; staging breaks the read-write
    *      cycle Spark forbids) — a crash mid-write leaves some cells
    *      folded, some not, but sources still exist, and the re-run's
    *      dropDuplicates collapses the overlap;
    *   3. source epoch dirs (and their digest rows) are deleted — a
    *      crash mid-delete leaves survivors whose content the
    *      consolidated partition already holds; the re-run folds them
    *      away. The digest is recomputed over the consolidated ids (one
    *      bloom instead of k — past [[IdDigest.CapItems]] its fpp
    *      degrades gracefully, never its correctness).
    *
    * Maintenance context: run from the single maintenance driver, not
    * concurrently with an [[append]] of an epoch <= `upToEpoch`.
    */
  def compact(spark: SparkSession, root: String, upToEpoch: Long): Unit = {
    require(upToEpoch >= BuildEpoch, s"upToEpoch must be >= $BuildEpoch")
    val cold = listEpochs(spark, root).filter(_ <= upToEpoch)
    if (cold.isEmpty || cold == Seq(BuildEpoch)) return

    val staging = s"$root/compacting"
    spark.read.parquet(s"$root/vectors")
      .filter(F.col("epoch") <= upToEpoch) // partition-pruned: cold epochs only
      .select("id", "vec", "nrm", "q_scale", "q_codes", "cell")
      .dropDuplicates("id")
      // the dedup shuffle keys on id, so its output mixes cells — cluster
      // by cell before the partitioned staging write (see [[build]])
      .transform(clusterByCell(_, loadCentroids(spark, root).size))
      .write.mode("overwrite").partitionBy("cell").parquet(staging)

    val consolidated = spark.read.parquet(staging)
    consolidated
      .select(F.col("id"), F.col("vec"), F.col("nrm"),
        F.col("q_scale"), F.col("q_codes"), F.col("cell"))
      .withColumn("epoch", F.lit(BuildEpoch))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch", "cell")
      .parquet(s"$root/vectors")
    IdDigest.digestFrame(consolidated.select("id"), "id", BuildEpoch)
      .coalesce(1).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch").parquet(s"$root/digests")
    consolidated.groupBy("cell").agg(F.count(F.lit(1)).as("n"))
      .withColumn("epoch", F.lit(BuildEpoch))
      .coalesce(1).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch").parquet(s"$root/cellcounts")

    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    cold.filter(_ != BuildEpoch).foreach { e =>
      // metadata relations FIRST: a crash between the deletes then leaves
      // a vectors dir whose epoch the re-run still lists as cold (cleaned
      // up normally). The other order would strand metadata forever —
      // listEpochs consults the vectors side, so an epoch with no
      // vectors dir is never folded again.
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/cellcounts/epoch=$e"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/digests/epoch=$e"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/vectors/epoch=$e"), true)
    }
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
  }

  /** Refit the centroids from the FULL current corpus into a fresh index
    * at `newRoot` — the documented answer to append-driven centroid
    * drift: [[append]] assigns against build-time centroids, so a
    * sustained distribution shift piles new vectors into few cells and
    * probe selectivity (never correctness) degrades. Rebuild is a full
    * [[build]] over `vectors(root)`, so the new index starts balanced,
    * consolidated into one epoch, and with a fresh digest.
    *
    * Writes to a DIFFERENT root by contract: building in place would
    * read and overwrite the same files (and a crash would strand the
    * only copy). The caller flips its root pointer after rebuild
    * returns — crash-safe because `root` is never touched, and
    * replay-safe because [[build]] is a full overwrite of `newRoot`.
    *
    * `numCentroids = 0` (the default) keeps the index's CURRENT cell
    * count (read from its centroid table) — a maintenance rebuild must
    * not silently reshape an index built with a different C.
    *
    * `excludeEpoch` drops one epoch from the fold — an ingest stream
    * rebuilding at the START of trigger E passes `Some(E)`: a CRASHED
    * previous attempt of the same trigger may already have folded
    * epoch E into `root`, and consolidating those rows into `newRoot`'s
    * build epoch would shadow the replayed batch's own vectors in its
    * dedup gate (the gate excludes epoch E, not the build epoch). The
    * replay re-folds epoch E into the new generation itself.
    */
  def rebuild(spark: SparkSession, root: String, newRoot: String,
      numCentroids: Int = 0, seed: Long = 42L, trainFraction: Double = 1.0,
      excludeEpoch: Option[Long] = None): Unit = {
    require(newRoot != root,
      "rebuild writes a fresh index; pass a different root and flip the pointer after")
    val c = if (numCentroids > 0) numCentroids
      else spark.read.parquet(s"$root/centroids.parquet").count().toInt
    build(vectors(spark, root, excludeEpoch).select("id", "vec"), "id", "vec", newRoot,
      c, seed, trainFraction)
  }

  /** Per-cell occupancy of the whole index: (cell, n), aggregated from
    * the `cellcounts` metadata relation that [[build]] / [[appendAssigned]]
    * / [[compact]] maintain — C rows per epoch, so the monitor reads
    * METADATA, never the vector data. The metadata path is used only
    * when cellcounts COVERS every vectors epoch (a two-listing check):
    * an index written before cellcounts existed gains the relation on
    * its first append, but only for the NEW epoch — trusting that
    * partial dir would make the monitor see a 5k-vector append as the
    * whole corpus and misfire (or mask) a rebuild. Until a compact or
    * rebuild backfills full coverage, such an index falls back to
    * counting the vectors relation grouped by its partition column.
    */
  def cellOccupancy(spark: SparkSession, root: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$root/cellcounts")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def epochDirs(dir: String): Set[String] = {
      val d = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(d)) Set.empty
      else fs.listStatus(d).filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("epoch=")).toSet
    }
    val covered = fs.exists(p) &&
      epochDirs(s"$root/vectors").subsetOf(epochDirs(s"$root/cellcounts"))
    val perEpoch =
      if (covered) spark.read.parquet(s"$root/cellcounts").select("cell", "n")
      // the fallback dedups (id, cell): a compact that crashed between
      // deleting cellcounts/epoch=e and vectors/epoch=e leaves that
      // epoch's vectors in BOTH the consolidated build epoch and the
      // cold one — a raw count would double them and could misfire a
      // rebuild until the compact replays
      else spark.read.parquet(s"$root/vectors")
        .select("id", "cell").dropDuplicates("id", "cell")
        .groupBy("cell").agg(F.count(F.lit(1)).as("n")).select("cell", "n")
    perEpoch.groupBy("cell").agg(F.sum("n").as("n"))
  }

  /** The drift monitor: share of the corpus held by the fullest cell
    * (1/C when balanced, → 1.0 as appends pile into one cell), plus the
    * total vector count. Metadata-sized — safe to call every trigger.
    */
  def cellStats(spark: SparkSession, root: String): (Double, Long) = {
    val r = cellOccupancy(spark, root)
      .agg(F.max("n").as("mx"), F.sum("n").as("total")).head()
    if (r.isNullAt(1) || r.getLong(1) == 0L) (0.0, 0L)
    else (r.getLong(0).toDouble / r.getLong(1), r.getLong(1))
  }

  /** Standing drift response: [[rebuild]] into `newRoot` iff the fullest
    * cell holds >= `maxShare` of a corpus of at least `minTotal` vectors
    * (the floor stops a near-empty index from thrashing rebuilds).
    * Returns whether a rebuild ran — the caller flips its root pointer
    * (e.g. [[flipCurrent]]) only on `true`. The monitor read is
    * metadata-sized, so calling this on every maintenance cadence is
    * free when balanced.
    */
  def rebuildIfSkewed(spark: SparkSession, root: String, newRoot: String,
      maxShare: Double = 0.5, minTotal: Long = 1000L, seed: Long = 42L,
      trainFraction: Double = 1.0, excludeEpoch: Option[Long] = None): Boolean = {
    val (share, total) = cellStats(spark, root)
    val skewed = total >= minTotal && share >= maxShare
    if (skewed)
      rebuild(spark, root, newRoot, seed = seed, trainFraction = trainFraction,
        excludeEpoch = excludeEpoch)
    skewed
  }

  /** Resolve an index HANDLE to its live generation: if `handle/CURRENT`
    * exists it names the generation root ([[flipCurrent]] wrote it);
    * otherwise the handle IS the root (an index that never rebuilt).
    * One metadata read — resolve per trigger / per query, so a rebuild
    * committed by the maintenance cadence is picked up without restarting
    * anything.
    */
  def currentRoot(spark: SparkSession, handle: String): String = {
    val fs = new org.apache.hadoop.fs.Path(handle)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // [[graft.runtime.PointerFile]] races safely against a concurrent
    // flip (open-first, tmp fallback, one retry): the mid-flip window
    // resolves the complete tmp — falling back to the handle base there
    // would silently read a generation retireOldGenerations may already
    // have deleted
    graft.runtime.PointerFile.read(fs,
      new org.apache.hadoop.fs.Path(s"$handle/CURRENT"),
      new org.apache.hadoop.fs.Path(s"$handle/CURRENT.tmp"))
      .getOrElse(handle)
  }

  /** Retire every generation under `handle` except the live one: the
    * base index at the handle root (when CURRENT points elsewhere) and
    * any `gen-*` directory that is not the current root. Returns the
    * retired roots. Maintenance context: run from the single maintenance
    * driver once in-flight readers of the old generations have drained,
    * and not concurrent with a rebuild (a crashed pre-flip rebuild's
    * half-written generation is safely retired here — its replay re-runs
    * the full-overwrite build).
    */
  def retireOldGenerations(spark: SparkSession, handle: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val base = new org.apache.hadoop.fs.Path(handle)
    val fs = base.getFileSystem(conf)
    val cur = currentRoot(spark, handle)
    val retired = scala.collection.mutable.ArrayBuffer.empty[String]
    // the handle-root base index is generation zero — retire its data
    // dirs only (never CURRENT or the gen-* children living beside them)
    if (cur != handle &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$handle/vectors"))) {
      Seq("vectors", "digests", "cellcounts", "centroids.parquet", "compacting",
          "serving.parquet")
        .foreach(d => fs.delete(new org.apache.hadoop.fs.Path(s"$handle/$d"), true))
      invalidateServing(handle) // the cached dial died with the file
      retired += handle
    }
    // compare FULLY-QUALIFIED paths: listStatus returns scheme-qualified
    // paths while the CURRENT pointer stores the raw string — a naive
    // string compare would retire the live generation
    val curQ = fs.makeQualified(new org.apache.hadoop.fs.Path(cur))
    if (fs.exists(base)) fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen-"))
      .map(_.getPath)
      .filter(p => fs.makeQualified(p) != curQ)
      .foreach { p =>
        fs.delete(p, true)
        // invalidate under BOTH spellings: listStatus yields the
        // scheme-qualified path, while ingest callers key the cache by
        // the raw handle-relative string (s"$handle/gen-N") — missing
        // the raw entry would leave a stale dial that a batchId-reset
        // rebuild of the same gen name could then serve
        invalidateServing(p.toString)
        invalidateServing(s"$handle/${p.getName}")
        retired += p.toString
      }
    retired.toSeq
  }

  /** Commit a new generation: point `handle/CURRENT` at `genRoot` via
    * write-temp / delete / rename. Readers never see a partial pointer:
    * the tmp is fully written and closed BEFORE the old CURRENT is
    * deleted, and [[currentRoot]] resolves the tmp during the
    * delete→rename window — so every instant of the flip (and a crash at
    * any point of it) resolves to either the complete old or the
    * complete new pointer, never the possibly-retired handle base. The
    * old generation's files are NOT deleted: in-flight readers may still
    * hold its paths; retire old generations via
    * [[retireOldGenerations]] once drained.
    */
  def flipCurrent(spark: SparkSession, handle: String, genRoot: String): Unit = {
    val cur = new org.apache.hadoop.fs.Path(s"$handle/CURRENT")
    graft.runtime.PointerFile.commit(
      cur.getFileSystem(spark.sessionState.newHadoopConf()), cur,
      new org.apache.hadoop.fs.Path(s"$handle/CURRENT.tmp"), genRoot)
  }

  /** The digest relation (n, min_id, max_id, bloom, epoch) as a LAZY
    * frame — [[IdDigest.suspectEpochs]] stages what it collects so bloom
    * binaries only reach the driver for range-overlapping epochs. Empty
    * for an index written before digests existed — the guard then
    * exact-scans every epoch, the old behavior.
    */
  private def readDigests(spark: SparkSession, root: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$root/digests")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("min_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("max_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("bloom", org.apache.spark.sql.types.BinaryType),
          org.apache.spark.sql.types.StructField("epoch", org.apache.spark.sql.types.LongType))))
    else spark.read.parquet(s"$root/digests")
      .withColumn("epoch", F.col("epoch").cast("long")) // partition dirs re-infer as int
  }

  /** Epoch partitions present under the vector root — one FileSystem
    * listing, metadata-only.
    */
  private def listEpochs(spark: SparkSession, root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/vectors")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
      .map(_.getPath.getName.stripPrefix("epoch=").toLong)
  }

  /** An index written before the epoch layout has `vectors/cell=<i>`
    * top-level dirs; mixing an epoch-layout append into it would leave
    * conflicting partition structures that fail EVERY subsequent read.
    * One metadata listing turns that corruption into an upfront error.
    */
  private def requireEpochLayout(spark: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$root/vectors")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) {
      val legacy = fs.listStatus(p)
        .exists(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      require(!legacy,
        s"ANN index at '$root' uses the pre-epoch layout (vectors/cell=...); " +
          "re-run build() before appending")
    }
  }

  /** Assign rows to the index's EXISTING cells: (id, vec, cell), no
    * shuffle — each centroid becomes a LITERAL array and the cell is
    * argmin over C codegen'd `vec_dot` calls (min over (dist, cell)
    * structs). ||v−c||² = v·v − 2·v·c + c·c, and v·v is constant per
    * row, so the argmin only needs (c·c − 2·v·c) per centroid.
    * The assignment kernel of [[append]]; also the batch-side half of
    * cell-local joins against the index (the ingest stream's dedup gate).
    */
  def assignCells(df: DataFrame, idCol: String, vecCol: String, root: String): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val cents = loadCentroids(df.sparkSession, root)
    if (cents.size > LiteralKernelMaxCells)
      // large-C route (see [[LiteralKernelMaxCells]]): the single-nearest
      // case is the nProbe=1 matrix kernel — F.least over C literal
      // structs has the same plan-size wall as the multi-probe sort
      assignCellsMultiExpr(df, idCol, vecCol, cents, 1)
        .withColumn("cell", F.col("cells").getItem(0)).drop("cells")
    else
      df.select(F.col(idCol).as("id"), asDouble(F.col(vecCol)).as("vec"))
        .withColumn("cell",
          F.least(centroidCandidates(cents): _*).getField("cell"))
  }

  /** [[assignCells]] generalized to the `nProbe` NEAREST cells: adds a
    * `cells` array (nearest first; `cells[0]` is [[assignCells]]'s
    * answer). Same literal kernel below [[LiteralKernelMaxCells]] (the
    * only extra cost a C-struct sort per row instead of a C-way min) and
    * the same matrix-kernel route above it. This is the batch side
    * of MULTI-PROBE gates: a near-dup pair straddling a Voronoi face is
    * invisible cell-locally, but joining a vector against its top-2
    * cells' contents catches any pair whose probe lists overlap.
    *
    * `coarseProbes > 0` switches to the TWO-LEVEL kernel: the C centroids
    * are pre-clustered (driver-side, C is metadata) into G ≈ √C coarse
    * groups; each row ranks the G group centers, explores only the
    * `coarseProbes` nearest groups, and runs the fine argmin within them —
    * per-row cost ~(G + coarseProbes·C/G)·d instead of C·d, the n·√C
    * assignment term at corpus scale. Since round 13 this runs as the
    * two-level MATRIX kernel ([[graft.plans.TwoLevelNearestCellsExpression]]
    * — the group structure rides one reference object, zero shuffle,
    * O(1) plan, usable at the corpus-scale C the n·√C tier exists for);
    * the historical CASE-chain literal form survives as
    * [[assignCellsMultiTwoLevelLiteral]], the spec cross-check.
    * Approximate by the standard IVF argument: a vector on a coarse
    * Voronoi face may assign to its second-best cell — probe correctness
    * never depends on assignment optimality, only cell balance and
    * candidate recall do (SimilaritySpec pins agreement, the
    * coarseProbes=G ⇒ exact equivalence, and expr ≡ literal bit-parity).
    */
  def assignCellsMulti(df: DataFrame, idCol: String, vecCol: String, root: String,
      nProbe: Int, coarseProbes: Int = 0): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    GraftFunctions.register(df.sparkSession)
    // one centroid read serves both the route decision and the kernel
    // (ADVICE r12: routing used to count cells with its own collect)
    val cents = loadCentroids(df.sparkSession, root)
    if (coarseProbes > 0) {
      val (centers, grouping, p) = twoLevelStructure(cents, coarseProbes, nProbe)
      return df.select(F.col(idCol).as("id"), asDouble(F.col(vecCol)).as("vec"))
        .withColumn("cells", graft.plans.TwoLevelNearestCellsExpression.column(
          F.col("vec"), cents, centers, grouping, p, nProbe))
    }
    if (cents.size > LiteralKernelMaxCells)
      return assignCellsMultiExpr(df, idCol, vecCol, cents, nProbe)
    val sorted = F.array_sort(F.array(centroidCandidates(cents): _*))
    df.select(F.col(idCol).as("id"), asDouble(F.col(vecCol)).as("vec"))
      .withColumn("cells",
        F.transform(F.slice(sorted, 1, nProbe), c => c.getField("cell")))
  }

  /** The historical CASE-chain literal form of the two-level kernel —
    * kept ONLY as the independent cross-check for
    * [[graft.plans.TwoLevelNearestCellsExpression]] (SimilaritySpec pins
    * them bit-identical over the same driver-side [[twoLevelStructure]]);
    * it is allocation-bound at hundreds of cells and not constructible
    * at corpus-scale C, so nothing routes here.
    */
  private[graft] def assignCellsMultiTwoLevelLiteral(df: DataFrame, idCol: String,
      vecCol: String, root: String, nProbe: Int, coarseProbes: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val sorted = twoLevelSortedCandidates(df.sparkSession, root, coarseProbes, nProbe)
    df.select(F.col(idCol).as("id"), asDouble(F.col(vecCol)).as("vec"))
      .withColumn("cells",
        F.transform(F.slice(sorted, 1, nProbe), c => c.getField("cell")))
  }

  /** Driver-side coarse structure shared by BOTH two-level kernels:
    * local k-means over the sorted-by-cell centroid table (deterministic
    * in table content, independent of parquet row order) → (group
    * centers, per-sorted-position group assignment, raised probe count).
    * The raise mirrors the literal kernel's original rule: enough groups
    * that ANY choice of that many covers ≥ nProbe cells.
    */
  private[graft] def twoLevelStructure(cents: Seq[(Int, Array[Double])],
      coarseProbes: Int, nProbe: Int): (Array[Array[Double]], Array[Int], Int) = {
    val sorted = cents.sortBy(_._1)
    val g = math.max(1, math.round(math.sqrt(sorted.size.toDouble)).toInt)
    val (centers, member) = localKMeans(sorted.map(_._2).toArray, g)
    val sizesAsc = centers.indices.map(gi => member.count(_ == gi)).sorted
    var (cov, pMin) = (0, 0)
    while (cov < nProbe && pMin < sizesAsc.size) { cov += sizesAsc(pMin); pMin += 1 }
    val p = math.min(centers.length, math.max(coarseProbes, pMin))
    (centers, member, p)
  }

  /** Above this cell count the EXACT (coarseProbes = 0) assignment routes
    * through the matrix kernel ([[graft.plans.NearestCellsExpression]]):
    * a C-literal expression embeds C·d doubles in the PLAN as C separate
    * candidate nodes, so analysis, per-plan construction, and the
    * per-row C-struct sort all grow with C — and at the 100 TB shape
    * C ∝ corpus (tens of thousands of cells), where a literal plan is
    * not constructible at all. The matrix kernel carries the same C·d
    * doubles as ONE reference object (a task-binary broadcast, not plan
    * nodes) and keeps the literal kernel's zero-shuffle profile, where
    * the round-12 broadcast-JOIN kernel ([[assignCellsMultiJoin]], kept
    * as a cross-check route) paid an n·(d + nProbe) groupBy exchange.
    * Measured (ProfileAssign, 20k × 64-dim): the routed kernels match
    * the literal kernel at C=16, win ~8× at C=128, ~30× at C=512, and
    * run ~1 s at C=2048 where the two-level LITERAL kernel takes 128 s
    * (its CASE chain still embeds every centroid). The threshold keeps
    * the literal kernel only where it is actually competitive; the
    * explicit two-level literal kernel (coarseProbes > 0) is left to the
    * caller's judgment.
    */
  val LiteralKernelMaxCells: Int = 64

  /** [[assignCellsMulti]]'s large-C route — same EXACT answer, O(1) plan,
    * ZERO shuffle: one [[graft.plans.NearestCellsExpression]] node holds
    * the centroid matrix and evaluates the top-nProbe cells per row.
    * Bit-identical to the literal kernel (same left-to-right summation,
    * same distance-then-cell tie order — SimilaritySpec pins all three
    * kernels against each other) and per-row, so duplicate ids reach
    * [[appendAssigned]]'s loud guard instead of being silently collapsed
    * by a groupBy (ADVICE r12 on the join kernel). The exchange profile
    * is d-independent — at d=1536 the join kernel ships every vector
    * through its aggregation shuffle; this kernel ships nothing.
    */
  private[graft] def assignCellsMultiExpr(df: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Int, Array[Double])], nProbe: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(F.col(idCol).as("id"), asDouble(F.col(vecCol)).as("vec"))
      .withColumn("cells",
        graft.plans.NearestCellsExpression.column(F.col("vec"), cents, nProbe))
  }

  /** The round-12 broadcast-join kernel, kept as an independent
    * cross-check route for the matrix kernel (SimilaritySpec pins the
    * three kernels bit-identical): the batch joins the broadcast
    * centroid TABLE (C rows of metadata), the squared distance (cc −
    * 2·v·c, the same row-constant-dropped form and the same
    * left-to-right `vec_dot` summation as the literal kernel, so values
    * are bit-identical) ranks through the map-side
    * [[graft.plans.TopKAggregate]] — each row's C candidates reduce to
    * nProbe BEFORE the exchange, so the shuffle carries n·nProbe cells,
    * never n·C candidates. Tie policy matches the literal kernel:
    * distance ascending, then cell ascending (negated distance under the
    * aggregate's field0-DESC/field1-ASC rank). The reduction groups on a
    * ROW-unique key, not the id column — two rows sharing an id are a
    * malformed batch, and collapsing them here (first(vec) against
    * pooled candidates) would smuggle them past [[appendAssigned]]'s
    * duplicate-id guard with an arbitrary vector in a possibly-wrong
    * cell (ADVICE r12). The key is generated AFTER `df` is computed and
    * consumed within the same linear plan, so its nondeterminism is
    * harmless. Remaining cost vs the matrix kernel: the groupBy exchange
    * carries each row's vector once (n·d-dominated at modern embedding
    * dims — VERDICT r12 #3), which is why the matrix kernel is the
    * routed default.
    */
  private[graft] def assignCellsMultiJoin(df: DataFrame, idCol: String, vecCol: String,
      root: String, nProbe: Int): DataFrame = {
    val spark = df.sparkSession
    GraftFunctions.register(spark)
    val cents = spark.read.parquet(s"$root/centroids.parquet")
      .select(F.col("cell").cast("long").as("__cell"),
        asDouble(F.col("centroid")).as("__c"))
      .withColumn("__cc",
        F.call_function("vec_dot", F.col("__c"), F.col("__c")))
    df.select(F.col(idCol).as("id"), asDouble(F.col(vecCol)).as("vec"))
      .withColumn("__row", F.monotonically_increasing_id())
      .join(F.broadcast(cents))
      .select(F.col("__row"), F.col("id"), F.col("vec"),
        F.struct(
          (F.lit(2.0) * F.call_function("vec_dot", F.col("vec"), F.col("__c"))
            - F.col("__cc")).as("negd"),
          F.col("__cell").as("cell")).as("cand"))
      .groupBy("__row")
      .agg(F.first(F.col("id")).as("id"), F.first(F.col("vec")).as("vec"),
        F.call_function("topk_rows", F.col("cand"), F.lit(nProbe)).as("__top"))
      .select(F.col("id"), F.col("vec"),
        F.transform(F.col("__top"), s => s.getField("cell").cast("int")).as("cells"))
  }

  /** Driver-side Lloyd's k-means over the C centroid points — C is index
    * METADATA, so this is microseconds; no MLlib job. Returns (centers,
    * assignment). Empty clusters re-seed to the point farthest from its
    * center so every group is nonempty.
    */
  private[operators] def localKMeans(points: Array[Array[Double]], g: Int,
      iters: Int = 15, seed: Long = 7L): (Array[Array[Double]], Array[Int]) = {
    require(points.nonEmpty,
      "two-level assignment needs a non-empty centroid table — the index has no cells " +
        "(empty centroids.parquet); build/rebuild it before assigning with coarseProbes > 0")
    val n = points.length
    val dim = points.head.length
    val k = math.min(g, n)
    val rnd = new scala.util.Random(seed)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val centers = rnd.shuffle(points.indices.toVector).take(k)
      .map(points(_).clone).toArray
    val assign = new Array[Int](n)
    var it = 0
    var moved = true
    while (it < iters && moved) {
      moved = false
      var i = 0
      while (i < n) {
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < k) {
          val d = d2(points(i), centers(c)); if (d < bd) { bd = d; best = c }; c += 1
        }
        if (assign(i) != best || it == 0) { assign(i) = best; moved = true }
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      i = 0
      while (i < n) {
        val a = assign(i); counts(a) += 1
        var d = 0; while (d < dim) { sums(a)(d) += points(i)(d); d += 1 }
        i += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var d = 0; while (d < dim) { centers(c)(d) = sums(c)(d) / counts(c); d += 1 }
        } else {
          // re-seed an empty cluster to the point farthest from its center
          var far = 0; var fd = -1.0; var j = 0
          while (j < n) {
            val d = d2(points(j), centers(assign(j))); if (d > fd) { fd = d; far = j }; j += 1
          }
          centers(c) = points(far).clone; assign(far) = c
        }
        c += 1
      }
      it += 1
    }
    (centers, assign)
  }

  /** The two-level kernel's sorted fine-candidate array (see
    * [[assignCellsMulti]]): rank G coarse group centers, explore the top
    * `coarseProbes` groups (auto-raised so the explored groups always hold
    * at least `nProbe` cells), fine-rank only their member cells.
    */
  private def twoLevelSortedCandidates(spark: SparkSession, root: String,
      coarseProbes: Int, nProbe: Int): org.apache.spark.sql.Column = {
    GraftFunctions.register(spark)
    val sortedCents = loadCentroids(spark, root).sortBy(_._1)
    // the SAME driver-side structure the expression kernel consumes —
    // the two kernels must rank identical groups for the parity pin
    val (centers, member, p) = twoLevelStructure(sortedCents, coarseProbes, nProbe)
    val groups: Seq[(Int, Seq[(Int, Array[Double])])] =
      sortedCents.zipWithIndex.groupBy { case (_, i) => member(i) }
        .map { case (gi, xs) => gi -> xs.map(_._1) }.toSeq.sortBy(_._1)
    val coarse = groups.map { case (gi, _) =>
      val ctr = centers(gi)
      val cArr = F.array(ctr.map(F.lit(_)).toIndexedSeq: _*)
      val cc = ctr.map(x => x * x).sum
      F.struct(
        (F.lit(cc) - F.lit(2.0) * F.call_function("vec_dot", F.col("vec"), cArr)).as("d"),
        F.lit(gi).as("g"))
    }
    val selGroups = F.transform(
      F.slice(F.array_sort(F.array(coarse: _*)), 1, p), s => s.getField("g"))
    val groupArrays = groups.map { case (gi, members) =>
      gi -> F.array(members.map { case (cell, c) => cellCandidate(cell, c) }: _*)
    }
    // CASE chain: generated code evaluates ONLY the matched group's member
    // distances — that conditionality is the whole n·√C win
    def fineFor(gc: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      groupArrays.tail.foldLeft(
        F.when(gc === groupArrays.head._1, groupArrays.head._2)) {
        case (acc, (gi, arr)) => acc.when(gc === gi, arr)
      }
    F.array_sort(F.flatten(F.transform(selGroups, fineFor(_))))
  }

  /** Calibration result of [[calibrateProbes]]: the smallest probe count
    * whose measured recall@k met the target (or C, where the probe is
    * total and equals brute force by construction), the recall measured
    * there, and the full (nProbe, recall, seconds) sweep curve.
    */
  final case class ProbeCalibration(
      nProbe: Int, recall: Double, targetMet: Boolean,
      curve: Seq[(Int, Double, Double)])

  /** The serving-recall contract: sweep nProbe (doubling, 1..C) over a
    * deterministic query sample, measure recall@k of [[knnJoin]] against
    * the exact brute-force answer on the SAME corpus, and return the
    * smallest nProbe meeting `targetRecall`. nProbe=C probes every cell
    * and equals brute force (oracle qe10 pins that equality), so the
    * sweep always terminates with recall 1.0 — a target no probe budget
    * short of C can meet is reported as nProbe=C, targetMet=true, rather
    * than silently serving below-target recall. Cost: one brute kNN over
    * the sample plus one probed kNN per sweep point — run it at (re)build
    * time and persist the outcome with [[calibrateAndStore]], which every
    * serving entry point then resolves by default ([[UseStoredProbes]]).
    */
  def calibrateProbes(spark: SparkSession, root: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, targetRecall: Double,
      sampleQueries: Int = 64): ProbeCalibration = {
    GraftFunctions.register(spark)
    val c = loadCentroids(spark, root).size
    // deterministic sample: hash-ordered head — no seed drift across runs
    val qs = queries.select(F.col(idCol), F.col(vecCol))
      .orderBy(F.xxhash64(F.col(idCol)), F.col(idCol))
      .limit(sampleQueries).localCheckpoint()
    val corpus = vectors(spark, root)
      .select(F.col("id").as(idCol), F.col("vec").as(vecCol))
    val brute = Similarity.knnJoin(corpus, qs, idCol, vecCol, k)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    def recallAt(nProbe: Int): Double = {
      val top = knnJoin(spark, root, qs, idCol, vecCol, k, nProbe)
        .collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
      if (brute.isEmpty) 1.0
      else brute.map { case (q, exact) =>
        if (exact.isEmpty) 1.0
        else (top.getOrElse(q, Set.empty) intersect exact).size.toDouble / exact.size
      }.sum / brute.size
    }
    val curve = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double)]
    var probe = 1
    var done = false
    var chosen = (c, 1.0)
    while (!done) {
      val t0 = System.nanoTime()
      val r = recallAt(probe)
      curve += ((probe, r, (System.nanoTime() - t0) / 1e9))
      if (r >= targetRecall || probe >= c) {
        chosen = (probe, r); done = true
      } else probe = math.min(probe * 2, c)
    }
    ProbeCalibration(chosen._1, chosen._2, chosen._2 >= targetRecall, curve.toSeq)
  }

  /** Sentinel for "resolve nProbe from the index's stored serving config"
    * — the default of every serving entry point. An index that was never
    * calibrated falls back to [[DefaultProbes]], the historical default.
    */
  val UseStoredProbes: Int = 0
  val DefaultProbes: Int = 4

  /** [[calibrateProbes]] + persist the outcome as the index's SERVING
    * CONFIG at `<root>/serving.parquet` (one metadata row: chosen probes,
    * k, target, measured recall) — run at (re)build time; every serving
    * entry point called with [[UseStoredProbes]] then serves at the
    * calibrated budget. A [[rebuild]] writes a fresh root with NO config:
    * cell geometry changed, so the maintenance cadence recalibrates
    * before flipping the pointer (stale dials must not survive a
    * geometry change silently).
    */
  def calibrateAndStore(spark: SparkSession, root: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, targetRecall: Double,
      sampleQueries: Int = 64): ProbeCalibration = {
    val cal = calibrateProbes(spark, root, queries, idCol, vecCol, k,
      targetRecall, sampleQueries)
    import spark.implicits._
    Seq((cal.nProbe, k, targetRecall, cal.recall))
      .toDF("n_probe", "k", "target_recall", "measured_recall")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/serving.parquet")
    servingCache.put(servingKey(root), Some(ServingConfig(cal.nProbe, k, targetRecall)))
    cal
  }

  /** The persisted serving contract of a calibrated index: the probe dial
    * plus the (k, target) it was calibrated FOR — what a maintenance
    * cadence needs to re-run the same calibration against a rebuilt
    * generation ([[graft.streaming.EmbeddingIngestStream]]'s drift
    * response).
    */
  final case class ServingConfig(nProbe: Int, k: Int, targetRecall: Double)

  /** Per-root cache of the resolved serving config: without it every
    * serving call (topKByVector / topKByVectorQuantized / topK / knnJoin
    * with [[UseStoredProbes]]) pays a filesystem existence check plus a
    * parquet read of serving.parquet — driver latency on the
    * single-row-predict path. Invalidation: [[calibrateAndStore]] puts
    * the new dial; a rebuild serves from a NEW root (fresh key), so
    * generation flips self-invalidate. A config written by ANOTHER
    * process under the same root is not seen until
    * [[invalidateServing]] — single-maintainer discipline, same as the
    * index folds.
    */
  private val servingCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[ServingConfig]]()

  /** Cache key: Path-normalized root (kills trailing-slash and `//`
    * variants). NOT scheme-qualified — `/x` and `file:/x` remain distinct
    * keys, which is why [[retireOldGenerations]] invalidates both the
    * qualified listing path AND the raw handle-relative spelling callers
    * actually use.
    */
  private def servingKey(root: String): String =
    new org.apache.hadoop.fs.Path(root).toString

  /** Drop the cached serving config for `root` (cross-process writers). */
  def invalidateServing(root: String): Unit = {
    servingCache.remove(servingKey(root)); ()
  }

  /** The stored serving config, if the index was calibrated (cached per
    * root — see [[servingCache]]).
    */
  def servingConfig(spark: SparkSession, root: String): Option[ServingConfig] =
    servingCache.computeIfAbsent(servingKey(root), _ => {
      val p = new org.apache.hadoop.fs.Path(s"$root/serving.parquet")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) None
      else {
        val r = spark.read.parquet(s"$root/serving.parquet").head()
        Some(ServingConfig(r.getAs[Int]("n_probe"), r.getAs[Int]("k"),
          r.getAs[Double]("target_recall")))
      }
    })

  /** The stored serving config's probe count, if the index was calibrated. */
  def servingProbes(spark: SparkSession, root: String): Option[Int] =
    servingConfig(spark, root).map(_.nProbe)

  private def resolveProbes(spark: SparkSession, root: String, nProbe: Int): Int =
    if (nProbe >= 1) nProbe
    else servingProbes(spark, root).getOrElse(DefaultProbes)

  /** Centroid count of the index — metadata-sized (C rows). */
  def numCells(spark: SparkSession, root: String): Int =
    spark.read.parquet(s"$root/centroids.parquet").count().toInt

  /** Cell-clustered exchange with an EXPLICIT partition count (round-15):
    * `repartition(F.col("cell"))` with the count left implicit is an
    * AQE-coalescible exchange, and on a small build/trigger batch AQE
    * coalesces the write's input to ONE task — which then opens the C
    * per-cell parquet writers strictly in sequence (measured on qe11's
    * 72-cell build write: 1.3–2.1 s implicit vs 0.45 s at any explicit
    * count 8–72; the whole gap is serialized writer setup, not data).
    * An explicit count pins the exchange (AQE respects user-specified
    * numbers), keeping writer setup parallel while each cell still lands
    * whole in exactly one task → one file per (epoch, cell) either way.
    */
  private def clusterByCell(df: DataFrame, numTasks: Int): DataFrame = {
    val n = math.max(1, numTasks)
    // identity-routed (guide §2.5 via [[graft.runtime.HashRouting]]):
    // hashing the dense cell ids directly collides, leaving some write
    // tasks 2-4 cells and others none — routed, cell k lands alone on
    // partition pmod(k, n), so a C-task build write really runs C-wide
    df.repartition(n, graft.runtime.HashRouting.route(F.col("cell"), n))
  }

  /** One (distance, cell) struct Column per centroid — ||v−c||² with the
    * row-constant v·v dropped. The centroid table is metadata (C rows),
    * so each centroid becomes a LITERAL array and the distance is one
    * codegen'd `vec_dot` call.
    */
  private def centroidCandidates(
      cents: Seq[(Int, Array[Double])]): Seq[org.apache.spark.sql.Column] =
    cents.map { case (cell, c) => cellCandidate(cell, c) }

  /** The centroid table localized: C metadata rows. */
  private[graft] def loadCentroids(spark: SparkSession, root: String): Seq[(Int, Array[Double])] =
    spark.read.parquet(s"$root/centroids.parquet").collect().toSeq
      .map(r => (r.getAs[Int]("cell"), r.getAs[Seq[Double]]("centroid").toArray))

  /** One (distance, cell) struct for a single centroid literal. */
  private def cellCandidate(cell: Int, c: Array[Double]): org.apache.spark.sql.Column = {
    val cArr = F.array(c.map(F.lit(_)).toIndexedSeq: _*)
    val cc = c.map(x => x * x).sum
    F.struct(
      (F.lit(cc) - F.lit(2.0) * F.call_function("vec_dot", F.col("vec"), cArr)).as("d"),
      F.lit(cell).as("cell"))
  }

  /** The indexed vectors (id, vec, nrm, cell), optionally without one
    * epoch — an ingest stream replaying batch E reads history with
    * `excludeEpoch = Some(E)` so a partially folded previous attempt of
    * the same batch cannot shadow its own vectors.
    */
  def vectors(spark: SparkSession, root: String,
      excludeEpoch: Option[Long] = None): DataFrame = {
    val t = spark.read.parquet(s"$root/vectors")
    excludeEpoch.fold(t)(e => t.filter(F.col("epoch") =!= e))
      .select("id", "vec", "nrm", "cell")
  }

  /** Cell-local cosine near-dup pairs over the whole persisted index —
    * the pair tier [[Similarity.semanticDedup]] plugs in at scale:
    * candidates are generated WITHIN KMeans cells (candidate volume
    * Σ_cell n_c², never the N² all-pairs), and the verify join carries
    * each survivor's TRUE cosine, so the probe only prunes — precision
    * is exact, recall is what cell granularity buys. `nProbe > 1` joins
    * every vector under its top-nProbe cells ([[assignCellsMulti]]),
    * catching pairs that straddle a Voronoi face for ~nProbe× candidate
    * cost — the same trade the streaming embedding gate makes, here for
    * the batch corpus. Monotone: the nProbe pair set contains every
    * smaller-nProbe pair (probe lists are ordered prefixes).
    *
    * Scale: both join legs shuffle on the C-valued cell key; C is the
    * index's centroid count, sized at build time so cells stay balanced
    * (KMeans) and numerous — the skew story is the index's own.
    * `coarseProbes > 0` runs the multi-probe assignment through the
    * two-level kernel ([[assignCellsMulti]]): with C ∝ n the flat
    * assignment term is n·C·d and becomes the leg's hot spot at 32×+
    * scale; two-level cuts it to ~n·√C·d. Candidate recall is what the
    * coarse granularity buys (verification stays exact either way).
    */
  def cellLocalPairs(spark: SparkSession, root: String, minCos: Double,
      nProbe: Int = 1, coarseProbes: Int = 0): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    GraftFunctions.register(spark)
    val v = vectors(spark, root)
    // multi-probe assignment is the leg's compute hot spot (C vec_dots +
    // a C-struct sort PER VECTOR) and the self-join below consumes it
    // once per side — localCheckpoint materializes the narrow (id, cell)
    // relation once instead (measured at 16× vectors: the triple
    // recompute kept the IVF pair tier BEHIND the exact quadratic kernel;
    // the round-8 scale artifact's crossover wrinkle). Checkpoint blocks
    // are ContextCleaner-reclaimed on GC — no CacheManager entry to leak
    // from a per-trigger caller. nProbe=1 reads the PERSISTED cell
    // column: nothing to recompute, keep it lazy.
    val asg =
      if (nProbe == 1) v.select(F.col("id"), F.col("cell").as("pcell"))
      else assignCellsMulti(v, "id", "vec", root, nProbe, coarseProbes)
        .select(F.col("id"), F.explode(F.col("cells")).as("pcell"))
        .localCheckpoint()
    // candidate generation and verification FUSED: the cosine is computed
    // inside the cell-local join's output iterator and losers are
    // filtered before anything is exchanged — the same shape as
    // [[Similarity.cosinePairsBlocked]]. A candidates→distinct→re-join-
    // vectors staging (the round-≤8 shape) materializes Σ n_c² pair rows
    // through a distinct and then drags both 8·dim-byte vectors through
    // two more joins — measured at 16× vectors that staging put the IVF
    // tier BEHIND the exact quadratic kernel (56 s vs 30 s) while this
    // fused join prunes the same compute without the exchanges. The
    // trailing distinct deduplicates pairs co-probed in more than one
    // cell and is SURVIVOR-sized.
    val side = v.join(asg, "id")
      .select(F.col("id"), F.col("pcell"), F.col("vec"), F.col("nrm"))
    val lhs = side.toDF("a_id", "pcell", "a_vec", "a_norm")
    val rhs = side.toDF("b_id", "pcell", "b_vec", "b_norm")
    lhs.join(rhs, Seq("pcell"))
      .filter(F.col("a_id") < F.col("b_id"))
      .withColumn("cos_sim",
        F.round(F.call_function("vec_dot", F.col("a_vec"), F.col("b_vec")) /
          (F.col("a_norm") * F.col("b_norm")), 4))
      .filter(F.col("cos_sim") >= minCos)
      .select("a_id", "b_id", "cos_sim")
      .distinct()
  }

  /** Rank centroids by cosine to the query and return the nProbe nearest
    * cells. The centroid table is index METADATA (numCentroids rows, set
    * at build time) — ranking it on the driver is O(C·d) and is what lets
    * the probe list become a literal partition filter.
    */
  def probeCells(spark: SparkSession, root: String, query: Array[Double], nProbe: Int): Seq[Int] = {
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    spark.read.parquet(s"$root/centroids.parquet").collect()
      .map { r =>
        val cell = r.getAs[Int]("cell")
        val c = r.getAs[Seq[Double]]("centroid").toArray
        val dot = c.zip(query).map { case (a, b) => a * b }.sum
        val cNorm = math.sqrt(c.map(x => x * x).sum)
        cell -> (if (cNorm == 0 || qNorm == 0) -1.0 else dot / (cNorm * qNorm))
      }
      .sortBy { case (cell, sim) => (-sim, cell) }
      .take(nProbe).map(_._1).toSeq
  }

  /** Approximate top-k by query vector: scan ONLY the probed cells
    * (partition-pruned), exact cosine within them, TakeOrdered k.
    */
  def topKByVector(
      spark: SparkSession,
      root: String,
      query: Array[Double],
      k: Int,
      nProbe: Int = UseStoredProbes,
      excludeId: Option[Long] = None): DataFrame = {
    GraftFunctions.register(spark)
    val cells = probeCells(spark, root, query, resolveProbes(spark, root, nProbe))
    val qArr = F.array(query.map(F.lit(_)).toSeq: _*)
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val scan = spark.read.parquet(s"$root/vectors")
      .filter(F.col("cell").isin(cells: _*)) // literal IN → PartitionFilters
    excludeId.fold(scan)(id => scan.filter(F.col("id") =!= id))
      .select(
        F.col("id").as("neighbor_id"),
        F.round(F.call_function("vec_dot", F.col("vec"), qArr) / (F.col("nrm") * F.lit(qNorm)), 4)
          .as("cos_sim"))
      .orderBy(F.col("cos_sim").desc, F.col("neighbor_id"))
      .limit(k)
  }

  /** IVF+SQ8 probe: the ranking scan reads ONLY (id, q_codes, q_scale,
    * nrm) from the probed cells — 4× less I/O than the float column, and
    * parquet column pruning means the float vectors aren't touched until
    * the exact re-rank of the k·margin survivors (a second probe-pruned
    * scan with a pushed-down id filter). Same answer as [[topKByVector]]
    * over the same cells — [[Similarity.quantizedTopK]]'s margin argument
    * applies: 64-dim int8 cosine error ~1e-3, margin 3 re-covers exactly.
    */
  def topKByVectorQuantized(
      spark: SparkSession,
      root: String,
      query: Array[Double],
      k: Int,
      nProbe: Int = UseStoredProbes,
      margin: Int = 3,
      excludeId: Option[Long] = None): DataFrame = {
    GraftFunctions.register(spark)
    val cells = probeCells(spark, root, query, resolveProbes(spark, root, nProbe))
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val qScale = query.map(math.abs).max / 127.0
    val qCodes = query.map(x => math.round(x / qScale).toDouble)
    val qCodesArr = F.array(qCodes.map(F.lit(_)).toSeq: _*)

    val probed = spark.read.parquet(s"$root/vectors")
      .filter(F.col("cell").isin(cells: _*))
    val ranked = excludeId.fold(probed)(id => probed.filter(F.col("id") =!= id))
      .select(F.col("id"),
        (F.call_function("vec_dot", F.col("q_codes").cast("array<double>"), qCodesArr)
          * F.col("q_scale") * F.lit(qScale) / (F.col("nrm") * F.lit(qNorm))).as("approx_cos"))
      .orderBy(F.col("approx_cos").desc, F.col("id"))
      .limit(k * margin)

    val qArr = F.array(query.map(F.lit(_)).toSeq: _*)
    probed.join(F.broadcast(ranked.select("id")), "id")
      .select(
        F.col("id").as("neighbor_id"),
        F.round(F.call_function("vec_dot", F.col("vec"), qArr) / (F.col("nrm") * F.lit(qNorm)), 4)
          .as("cos_sim"))
      .orderBy(F.col("cos_sim").desc, F.col("neighbor_id"))
      .limit(k)
  }

  /** Approximate top-k by the id of an indexed vector: fetch that vector
    * (pushed-down id filter — at serving scale this is a key-value lookup,
    * not a query-path scan), then [[topKByVector]] excluding the query
    * itself.
    */
  def topK(spark: SparkSession, root: String, queryId: Long, k: Int,
      nProbe: Int = UseStoredProbes): DataFrame = {
    val q = spark.read.parquet(s"$root/vectors")
      .filter(F.col("id") === queryId).select("vec")
      .head().getAs[Seq[Double]]("vec").toArray
    topKByVector(spark, root, q, k, nProbe, excludeId = Some(queryId))
  }

  /** Batch ANN join against the index — the bulk-retrieval twin of
    * [[Similarity.knnJoin]] (which scans every (query, vector) pair).
    * One job for the whole query set: each query is assigned its
    * top-`nProbe` cells by the cell-count-routed exact kernel
    * ([[assignCellsMulti]]), the index scan is pruned to the UNION of
    * probed cells (a literal IN over a collected ≤ C-int cell set — the
    * same partition-pruning pattern as the embedding ingest gate), and
    * candidates meet in a cell-equi broadcast join feeding the map-side
    * `topk_rows` aggregate — shuffle sized by |Q|·k, I/O by the probed
    * cells, never the corpus.
    *
    * Exactness dial: with `nProbe = C` (every cell probed) the candidate
    * set is total and the result EQUALS brute-force
    * [[Similarity.knnJoin]] — oracle qe10 pins that equality through the
    * driver — while `nProbe << C` is the serving-scale configuration
    * whose recall the index's cell granularity buys (SimilaritySpec
    * planted-duplicate contract). Each index vector lives in exactly one
    * cell and a query's probe list is distinct, so no candidate is
    * scored twice. Output schema matches [[Similarity.knnJoin]]:
    * (query_id, rank, neighbor_id, cos_sim), rank by (cos_sim DESC,
    * neighbor_id) — identical tie policy, identical 4-decimal rounding.
    */
  def knnJoin(spark: SparkSession, root: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nProbe: Int = UseStoredProbes): DataFrame = {
    GraftFunctions.register(spark)
    val q = assignCellsMulti(queries, idCol, vecCol, root,
      resolveProbes(spark, root, nProbe))
      .withColumn("q_norm", F.sqrt(F.call_function("vec_dot", F.col("vec"), F.col("vec"))))
      .select(F.col("id").cast("long").as("query_id"), F.col("vec").as("q_vec"),
        F.col("q_norm"), F.explode(F.col("cells")).as("cell"))
    // collect the exploded query relation ONCE — it is broadcast-bounded
    // by construction, so localizing it costs what the broadcast costs
    // anyway, and both consumers (the ≤ C-int literal cell predicate
    // that prunes untouched partitions, and the broadcast join side as a
    // LocalRelation) come from the single kernel evaluation instead of
    // re-running the per-row C-struct assignment twice
    val qRows = q.collect()
    val probedCells = qRows.map(_.getAs[Int]("cell")).distinct.toSeq
    val qLocal = spark.createDataFrame(
      java.util.Arrays.asList(qRows: _*), q.schema)
    vectors(spark, root)
      .filter(F.col("cell").isin(probedCells: _*))
      .join(F.broadcast(qLocal), Seq("cell"))
      .filter(F.col("id") =!= F.col("query_id"))
      .select(F.col("query_id"),
        F.struct(
          F.round(F.call_function("vec_dot", F.col("vec"), F.col("q_vec"))
            / (F.col("nrm") * F.col("q_norm")), 4).as("cos_sim"),
          F.col("id").as("neighbor_id")).as("cand"))
      .groupBy("query_id")
      .agg(F.call_function("topk_rows", F.col("cand"), F.lit(k)).as("top"))
      .select(F.col("query_id"), F.posexplode(F.col("top")))
      .select(F.col("query_id"), (F.col("pos") + 1).cast("int").as("rank"),
        F.col("col.neighbor_id").as("neighbor_id"), F.col("col.cos_sim").as("cos_sim"))
  }
}
