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
  *   3. appended to the accepted corpus AND folded into the index, so the
  *      next micro-batch sees this one as history.
  *
  * Delivery semantics: at-least-once at the sink, but the index makes a
  * replayed batch self-filtering — its docs match their own indexed
  * shingles at J = 1 and are dropped by the re-probe (docs shorter than
  * the shingle width n carry no shingles and bypass near-dedup entirely;
  * gate such fragments upstream with a length filter).
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

  /** `curate` runs FIRST on every micro-batch (before any dedup) — plug
    * the batch-side curation operators in here, e.g.
    * `b => b.join(Curation.repetitionStats(b, "doc_id", "text")
    *   .filter($"keep" === 1).select("doc_id"), Seq("doc_id"), "left_semi")`.
    * Identity by default. It must be a pure column-level transform — the
    * same rows must fail on replay for the at-least-once story to hold.
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
      curate: DataFrame => DataFrame = identity): StreamingQuery = {
    val docs = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 10)
      .json(inputDir)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val b = curate(batch).cache()
          // 1. intra-batch: one representative per near-dup cluster
          val pairs = Dedup.minhashNearDupPairs(b, "doc_id", "text", cfg.n, minJ,
            cfg.numHashes, cfg.bands, cfg.rowsPerBand)
          val intraLosers = Dedup.connectedComponents(pairs, "a_id", "b_id")
            .filter(F.col("id") =!= F.col("comp"))
            .select(F.col("id").as("doc_id"))
          val intra = b.join(intraLosers, Seq("doc_id"), "left_anti")
          // 2. cross-history: drop anything the index already covers
          val histLosers = NearDupIndex
            .probe(spark, intra, "doc_id", "text", indexName, minJ, cfg)
            .select(F.col("a_id").as("doc_id")).distinct()
          val accepted = intra.join(histLosers, Seq("doc_id"), "left_anti").cache()
          // 3. land the survivors, then fold them into history
          accepted.write.mode("append").parquet(acceptedPath)
          NearDupIndex.append(accepted, "doc_id", "text", indexName, cfg)
          accepted.unpersist()
          b.unpersist()
          ()
        }
      }
      .start()
  }
}
