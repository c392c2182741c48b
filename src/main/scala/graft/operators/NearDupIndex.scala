package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Persisted MinHash-LSH band index over a historical corpus — the text
  * analog of [[IvfIndex]], serving incremental-ingest dedup without
  * recomputing OR reshuffling history.
  *
  * [[Dedup.minhashNearDupAgainst]] re-derives the historical signatures
  * on every call; fine for one-off comparisons, wrong for a standing
  * ingest pipeline where the same 100 TB corpus would be re-shingled and
  * re-hashed per batch. This index does the historical work ONCE:
  *
  *   - `<name>_buckets`  (id, band_idx, band_hash), bucketed by band_hash
  *   - `<name>_shingles` (id, shingle),             bucketed by id
  *   - `<name>_counts`   (id, n_sh),                bucketed by id
  *
  * All three are catalog tables (`bucketBy(...).saveAsTable`, so they
  * compose with `runtime.Catalog`'s persistent-metastore sessions). The
  * per-batch [[probe]] then:
  *
  *   1. codes ONLY the batch, joins its buckets to `<name>_buckets` on
  *      (band_idx, band_hash) — the index side reads its buckets in
  *      place (`HashPartitioning(band_hash)` satisfies the join's
  *      clustering requirement), only the batch side shuffles;
  *   2. verifies candidates with exact Jaccard against
  *      `<name>_shingles` / `<name>_counts`, whose id-bucketing again
  *      satisfies the (b_id, shingle) / (b_id) join clustering — no
  *      Exchange ever sits above a historical scan (PlanSpec asserts
  *      this on the physical plan tree).
  *
  * Per-batch cost is therefore sized by the batch and the candidate set,
  * never by the corpus. After an accepted batch, append its relations to
  * the three tables to fold it into history.
  */
object NearDupIndex {

  final case class Config(
      n: Int = 3, numHashes: Int = 64, bands: Int = 32, rowsPerBand: Int = 2,
      buckets: Int = 16) {
    require(bands * rowsPerBand <= numHashes)
  }

  /** Offline build: shingle + sign the corpus once, persist the bucket /
    * shingle / count relations as bucketed catalog tables under `name`,
    * plus a 1-row `_meta` table recording the band family — [[probe]] and
    * [[append]] refuse to run against an index built with different
    * parameters (a mismatched family would silently produce garbage
    * candidates).
    */
  def build(corpus: DataFrame, idCol: String, textCol: String, name: String,
      cfg: Config = Config()): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sh = Dedup.shingleTable(corpus, idCol, textCol, cfg.n).cache()
    Dedup.lshBuckets(
        Dedup.minhashSignatures(sh, idCol, cfg.numHashes), idCol, cfg.bands, cfg.rowsPerBand)
      .write.mode("overwrite")
      .bucketBy(cfg.buckets, "band_hash").sortBy("band_hash")
      .saveAsTable(s"${name}_buckets")
    sh.write.mode("overwrite")
      .bucketBy(cfg.buckets, idCol).sortBy(idCol)
      .saveAsTable(s"${name}_shingles")
    sh.groupBy(idCol).agg(F.count(F.lit(1)).as("n_sh"))
      .write.mode("overwrite")
      .bucketBy(cfg.buckets, idCol).sortBy(idCol)
      .saveAsTable(s"${name}_counts")
    Seq((cfg.n, cfg.numHashes, cfg.bands, cfg.rowsPerBand, cfg.buckets))
      .toDF("n", "num_hashes", "bands", "rows_per_band", "buckets")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
    sh.unpersist()
  }

  /** Throws unless `cfg` equals the family the index was built with. */
  private def requireSameFamily(spark: SparkSession, name: String, cfg: Config): Unit = {
    val m = spark.table(s"${name}_meta").head()
    val stored = Config(m.getAs[Int]("n"), m.getAs[Int]("num_hashes"),
      m.getAs[Int]("bands"), m.getAs[Int]("rows_per_band"), m.getAs[Int]("buckets"))
    require(stored == cfg,
      s"index '$name' was built with $stored but probed/appended with $cfg")
  }

  /** Fold an accepted batch into the index: append its bucket / shingle /
    * count relations (bucket spec validated against the existing tables).
    * Run AFTER the batch passes [[probe]] — the next batch then dedups
    * against it, which is what makes continuous ingest self-consistent
    * (and makes a replayed batch self-filtering: its docs match their own
    * indexed shingles at J=1 and are dropped by the next probe).
    *
    * The three appends are not one transaction, so the BUCKET table —
    * the only relation that makes a doc DISCOVERABLE as a candidate —
    * goes last: a crash mid-append leaves orphan shingle/count rows that
    * no probe ever joins (candidates come from buckets), and the
    * replayed batch repairs the index by re-appending. For strict
    * exactly-once under replay, gate the whole fold behind an epoch
    * marker as in [[graft.streaming.IdempotentSink]].
    */
  def append(batch: DataFrame, idCol: String, textCol: String, name: String,
      cfg: Config = Config()): Unit = {
    requireSameFamily(batch.sparkSession, name, cfg)
    val sh = Dedup.shingleTable(batch, idCol, textCol, cfg.n).cache()
    sh.write.mode("append")
      .bucketBy(cfg.buckets, idCol).sortBy(idCol)
      .saveAsTable(s"${name}_shingles")
    sh.groupBy(idCol).agg(F.count(F.lit(1)).as("n_sh"))
      .write.mode("append")
      .bucketBy(cfg.buckets, idCol).sortBy(idCol)
      .saveAsTable(s"${name}_counts")
    Dedup.lshBuckets(
        Dedup.minhashSignatures(sh, idCol, cfg.numHashes), idCol, cfg.bands, cfg.rowsPerBand)
      .write.mode("append")
      .bucketBy(cfg.buckets, "band_hash").sortBy("band_hash")
      .saveAsTable(s"${name}_buckets")
    sh.unpersist()
  }

  /** Near-dup pairs between `batch` and the indexed history: emits
    * (a_id = batch doc, b_id = historical doc, shared, jaccard) with
    * exact Jaccard >= minJ. `cfg` is validated against the `_meta`
    * table — probing with a different band family than the build throws
    * instead of silently missing candidates.
    */
  def probe(spark: SparkSession, batch: DataFrame, idCol: String, textCol: String,
      name: String, minJ: Double, cfg: Config = Config()): DataFrame = {
    requireSameFamily(spark, name, cfg)
    val bSh = Dedup.shingleTable(batch, idCol, textCol, cfg.n).cache()
    val bBuckets = Dedup.lshBuckets(
      Dedup.minhashSignatures(bSh, idCol, cfg.numHashes), idCol, cfg.bands, cfg.rowsPerBand)
    val cands = bBuckets.toDF("a_id", "band_idx", "band_hash")
      .join(spark.table(s"${name}_buckets").toDF("b_id", "band_idx", "band_hash"),
        Seq("band_idx", "band_hash"))
      .select("a_id", "b_id").distinct()
    val bCounts = bSh.groupBy(idCol).agg(F.count(F.lit(1)).as("n_sh"))
    Dedup.jaccardVerifyBipartite(
      cands, bSh, spark.table(s"${name}_shingles"),
      bCounts, spark.table(s"${name}_counts"), minJ)
  }
}
