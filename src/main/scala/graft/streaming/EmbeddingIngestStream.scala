package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.sql.{functions => F}

import graft.operators.IvfIndex
import graft.plans.GraftFunctions

/** Streaming embedding ingest with near-duplicate suppression against the
  * persisted IVF index — the vector analog of [[CorpusIngestStream]]:
  * every micro-batch is
  *
  *   1. assigned to the index's existing cells (shuffle-free literal-
  *      centroid argmin, [[graft.operators.IvfIndex.assignCells]]);
  *   2. deduplicated intra-batch and against the indexed history by
  *      cosine >= maxCos, via CELL-LOCAL joins — a batch vector is only
  *      ever compared to vectors of its own cell, so the per-trigger
  *      cost is |batch| x (corpus / C), never |batch| x corpus (the IVF
  *      argument applied to dedup instead of search; near-identical
  *      vectors share a cell by construction since assignment is
  *      deterministic in the vector). The micro-batch side of the
  *      history comparison is BROADCAST: `cell` has only C distinct
  *      values, so a shuffle join would cap parallelism at C tasks —
  *      broadcasting lets history stream partition-parallel, unshuffled;
  *   3. landed by OVERWRITE of `batch=<id>/` under `acceptedPath` and
  *      folded into the index via
  *      [[graft.operators.IvfIndex.append]]'s epoch partition overwrite.
  *
  * Delivery semantics: effectively exactly-once under replay, by the same
  * construction as [[CorpusIngestStream]] — the history side of the dedup
  * gate EXCLUDES the batch's own epoch, every write is an idempotent
  * overwrite keyed by the batch id, and the recomputation is
  * deterministic. Vector ids must be unique corpus-wide.
  *
  * The near-dup gate is approximate exactly where IVF search is: a
  * near-duplicate pair split across a cell boundary is missed (cosine at
  * the maxCos level makes this rare — such vectors are nearly collinear
  * and land in the same Voronoi cell unless they straddle its face).
  * The exact alternative is [[graft.operators.Similarity]]'s blocked
  * all-pairs, at O(N²) — the wrong trade inside a streaming trigger.
  */
object EmbeddingIngestStream {

  /** One JSON doc per line: {"vec_id": ..., "embedding": [d0, d1, ...]}. */
  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType))))

  /** The per-micro-batch pipeline, exposed for crash/replay specs (same
    * contract as [[CorpusIngestStream.processBatch]]). Steps: assign
    * cells → intra-batch dedup (cell-local self-join, keep min id) →
    * history dedup (cell-local join vs the index minus this epoch) →
    * land survivors → fold. `crashBeforeFold` is crash injection for
    * specs: land, then stop as if the JVM died before the fold.
    */
  private[graft] def processBatch(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      acceptedPath: String,
      indexRoot: String,
      maxCos: Double,
      crashBeforeFold: Boolean = false): Unit = {
    GraftFunctions.register(spark)
    val assigned = IvfIndex.assignCells(batch, "vec_id", "embedding", indexRoot)
      .withColumn("nrm", F.sqrt(F.call_function("vec_dot", F.col("vec"), F.col("vec"))))
      .cache()

    def cos(aVec: String, aNrm: String, bVec: String, bNrm: String) =
      F.call_function("vec_dot", F.col(aVec), F.col(bVec)) / (F.col(aNrm) * F.col(bNrm))

    // 1. intra-batch: drop the larger id of any same-cell pair at >= maxCos
    val a = assigned.select(F.col("id").as("a_id"), F.col("vec").as("a_vec"),
      F.col("nrm").as("a_nrm"), F.col("cell"))
    val b = assigned.select(F.col("id").as("b_id"), F.col("vec").as("b_vec"),
      F.col("nrm").as("b_nrm"), F.col("cell"))
    val intraLosers = a.join(F.broadcast(b), Seq("cell"))
      .filter(F.col("a_id") < F.col("b_id"))
      .filter(cos("a_vec", "a_nrm", "b_vec", "b_nrm") >= maxCos)
      .select(F.col("b_id").as("id")).distinct()
    val intra = assigned.join(intraLosers, Seq("id"), "left_anti")

    // 2. cross-history: the join key is `cell` alone (C distinct values),
    //    so a shuffle join would cap parallelism at C tasks and funnel
    //    each cell's ENTIRE history through one of them. The micro-batch
    //    side is broadcast instead: history streams partition-parallel in
    //    place, never shuffled, never bottlenecked by key cardinality (a
    //    micro-batch fits in a broadcast by construction — the trigger
    //    sizes it). The history SCAN is restricted to the cells the batch
    //    actually occupies, as a LITERAL IN over the collected cell set
    //    (<= C ints, metadata-scale) — a join-side restriction alone
    //    would still READ the whole table; the literal predicate prunes
    //    the untouched cell partitions, so per-trigger I/O is the batch's
    //    cells, not the corpus. Batch epoch excluded so replays are not
    //    self-shadowed.
    // collected from the CACHED assignment, not from `intra` — reading
    // intra here would re-run the whole intra-dedup self-join just to
    // learn the cell set, and a superset of intra's cells prunes just as
    // correctly (an extra cell's history rows join to nothing)
    val batchCells = assigned.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val hist = IvfIndex.vectors(spark, indexRoot, excludeEpoch = Some(batchId))
      .filter(F.col("cell").isin(batchCells: _*))
      .select(F.col("id").as("b_id"), F.col("vec").as("b_vec"),
        F.col("nrm").as("b_nrm"), F.col("cell"))
    val batchSide = intra.select(F.col("id"), F.col("vec").as("a_vec"),
      F.col("nrm").as("a_nrm"), F.col("cell"))
    val histLosers = hist.join(F.broadcast(batchSide), Seq("cell"))
      .filter(cos("a_vec", "a_nrm", "b_vec", "b_nrm") >= maxCos)
      .select("id").distinct()
    // keep (vec, nrm, cell) on the survivors: the fold reuses them, so
    // the C-way assignment argmin runs once per trigger, not twice
    val accepted = intra.join(histLosers, Seq("id"), "left_anti").cache()

    try {
      // 3. land then fold — both idempotent overwrites keyed by batchId
      if (!accepted.isEmpty) {
        accepted.select(F.col("id").as("vec_id"), F.col("vec").as("embedding"))
          .write.mode("overwrite").parquet(s"$acceptedPath/batch=$batchId")
        if (!crashBeforeFold)
          IvfIndex.appendAssigned(
            accepted.select("id", "vec", "nrm", "cell"), indexRoot, batchId)
      }
    } finally {
      // release on the error path too — a failed trigger is replayed in
      // the same session, and retries must not accumulate caches
      accepted.unpersist()
      assigned.unpersist()
    }
  }

  def start(
      spark: SparkSession,
      inputDir: String,
      acceptedPath: String,
      checkpointDir: String,
      indexRoot: String,
      maxCos: Double = 0.995,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    val vecs = spark.readStream
      .schema(vecSchema)
      .option("maxFilesPerTrigger", 10)
      .json(inputDir)
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatch(spark, batch, batchId, acceptedPath, indexRoot, maxCos)
      }
      .start()
  }
}
