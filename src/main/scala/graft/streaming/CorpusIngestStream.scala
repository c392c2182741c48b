package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{functions => F}

import graft.operators.{Dedup, NearDupIndex}

/** Streaming corpus ingest with incremental dedup against persisted
  * history — the streaming face of [[graft.operators.NearDupIndex]]:
  * every micro-batch is
  *
  *   1. curated by the pluggable `curate` hook (quality / repetition /
  *      redaction gates — identity by default), then intra-batch
  *      deduplicated (near-dup pairs → connected components → min-id
  *      representative, the same policy as the batch pipeline);
  *   2. probed against the `<indexName>_*` tables and stripped of docs
  *      that near-duplicate ANY previously ingested doc;
  *   3. landed in the accepted corpus AND folded into the index, so the
  *      next micro-batch sees this one as history.
  *
  * Delivery semantics: EFFECTIVELY EXACTLY-ONCE under replay, because
  * every per-batch effect is an idempotent overwrite keyed by the batch
  * id and the recomputation is deterministic:
  *
  *   - the probe excludes the batch's own epoch
  *     (`excludeEpoch = Some(batchId)`), so a partially folded previous
  *     attempt of the SAME batch cannot shadow its own docs — the
  *     replayed batch recomputes the identical accepted set (this is why
  *     `curate` must be pure);
  *   - the accepted docs land by OVERWRITE of `batch=<id>/` under
  *     `acceptedPath` — a replay rewrites the same directory, never
  *     duplicates (readers `spark.read.parquet(acceptedPath)` and see a
  *     `batch` provenance partition column);
  *   - the index fold is [[graft.operators.NearDupIndex.append]]'s
  *     dynamic partition overwrite of `epoch=<id>` — idempotent by
  *     construction.
  *
  * A crash between any two of these steps therefore converges on replay
  * instead of duplicating or dropping. Docs shorter than the shingle
  * width n carry no shingles and bypass near-dedup entirely; gate such
  * fragments upstream with a length filter. Doc ids must be unique
  * corpus-wide (the index keys by id — [[graft.operators.NearDupIndex.append]]
  * guards and throws on a collision).
  *
  * Scale: the per-trigger work is sized by the micro-batch and its
  * candidate set, never by the corpus — history participates only through
  * the bucketed index scans ([[graft.operators.NearDupIndex]] invariant,
  * PlanSpec-asserted). The driver never touches rows.
  */
object CorpusIngestStream {

  /** One JSON doc per line: {"doc_id": …, "text": "…"}. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** The per-micro-batch pipeline: curate → intra-batch dedup → probe
    * history (excluding this epoch) → land survivors (overwrite of
    * `batch=<batchId>`) → fold into the index (overwrite of
    * `epoch=<batchId>`). Exposed so specs can drive crash/replay
    * scenarios without a streaming query; every step is deterministic
    * and idempotent per batch id (see object scaladoc).
    *
    * `crashAfterFoldRelations` is CRASH INJECTION for specs only: when
    * `Some(k)`, the fold stops after its k-th relation write (as if the
    * JVM died there) so a test can replay the batch and prove
    * convergence. Production callers never set it.
    */
  private[graft] def processBatch(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      acceptedPath: String,
      indexName: String,
      minJ: Double,
      cfg: NearDupIndex.Config,
      curate: DataFrame => DataFrame,
      compactEvery: Int = 0,
      crashAfterFoldRelations: Option[Int] = None): Unit = {
    // maintenance runs FIRST, before the probe: a crash mid-compaction
    // replays this trigger, and re-running the (replay-idempotent)
    // compaction to its fixpoint BEFORE any probe means the probe never
    // reads a half-compacted index (where a cold doc's shingle rows
    // exist in both the source epoch and the consolidated partition,
    // which would overcount its jaccard and silently over-drop).
    // upToEpoch = batchId - 1: checkpoint-committed epochs can never be
    // replayed, so folding them can't shadow a replayed batch's own docs.
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      NearDupIndex.compact(spark, indexName, upToEpoch = batchId - 1)
    // full-row dedup first: a re-delivered file (same doc in two files of
    // one trigger) must not wedge the stream on append's id guard — the
    // guard throws, the replay re-reads the same files, and the trigger
    // can never commit. Identical rows are absorbed here; the SAME id
    // with DIFFERENT content still reaches the guard and fails loudly —
    // that is upstream corruption worth stopping the stream for, not
    // something to paper over with an arbitrary pick. Batch-sized shuffle.
    val b = curate(batch.dropDuplicates()).cache()
    // 1. intra-batch: one representative per near-dup cluster
    val (pairs, pairsCleanup) = Dedup.minhashNearDupPairsTracked(
      b, "doc_id", "text", cfg.n, minJ, cfg.numHashes, cfg.bands, cfg.rowsPerBand)
    val intraLosers = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .filter(F.col("id") =!= F.col("comp"))
      .select(F.col("id").as("doc_id"))
    val intra = b.join(intraLosers, Seq("doc_id"), "left_anti")
    // 2. cross-history: drop anything the index already covers; a replay
    //    must not be shadowed by its own partial fold, hence excludeEpoch
    val (histProbe, probeCleanup) = NearDupIndex.probeTracked(
      spark, intra, "doc_id", "text", indexName, minJ, cfg,
      excludeEpoch = Some(batchId))
    val histLosers = histProbe.select(F.col("a_id").as("doc_id")).distinct()
    val accepted = intra.join(histLosers, Seq("doc_id"), "left_anti").cache()
    try {
      // 3. land the survivors, then fold them into history — both writes
      //    are idempotent overwrites keyed by batchId
      if (!accepted.isEmpty) {
        accepted.write.mode("overwrite").parquet(s"$acceptedPath/batch=$batchId")
        crashAfterFoldRelations match {
          case Some(k) =>
            NearDupIndex.appendPartial(accepted, "doc_id", "text", indexName, batchId, cfg, k)
          case None =>
            NearDupIndex.append(accepted, "doc_id", "text", indexName, batchId, cfg)
        }
      }
    } finally {
      // this runs once per trigger, forever — and a FAILED trigger gets
      // replayed in the same session, so the release must happen on the
      // error path too or retries accumulate caches without bound
      accepted.unpersist()
      probeCleanup()
      pairsCleanup()
      b.unpersist()
    }
  }

  /** `curate` runs FIRST on every micro-batch (before any dedup) — plug
    * the batch-side curation operators in here, e.g.
    * `b => b.join(Curation.repetitionStats(b, "doc_id", "text")
    *   .filter($"keep" === 1).select("doc_id"), Seq("doc_id"), "left_semi")`.
    * Identity by default. It must be a pure column-level transform — the
    * same rows must fail on replay for the exactly-once story to hold.
    */
  def start(
      spark: SparkSession,
      inputDir: String,
      acceptedPath: String,
      checkpointDir: String,
      indexName: String,
      minJ: Double = 0.6,
      cfg: NearDupIndex.Config = NearDupIndex.Config(),
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      curate: DataFrame => DataFrame = identity,
      compactEvery: Int = 0): StreamingQuery = {
    val docs = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 10)
      .json(inputDir)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatch(spark, batch, batchId, acceptedPath, indexName, minJ, cfg, curate,
            compactEvery)
      }
      .start()
  }
}
