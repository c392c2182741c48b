package graft.tools

import org.apache.spark.sql.{functions => F}

import graft.operators.IvfIndex
import graft.plans.GraftFunctions

/** Measures the embedding dedup gate's cross-cell miss rate — the
  * experiment behind the documented maxCos/miss table in SURVEY §8.13.
  *
  * [[graft.streaming.EmbeddingIngestStream]]'s gate is approximate
  * exactly where IVF search is: a near-dup pair assigned to different
  * cells is invisible to a cell-local join. Multi-probe (each batch
  * vector joined against its top-2 cells) catches a pair whenever the
  * probe lists overlap. This tool plants near-dup pairs with a
  * controlled cosine spread, assigns both sides against a built index,
  * and reports, per maxCos gate threshold:
  *
  *   - `same_home`: both sides share a home cell — the single-probe
  *     catch rate;
  *   - `hist2`: the history-gate catch rate at nProbeGate=2 (batch
  *     side probes top-2, history side sits in its home cell);
  *   - `intra2`: the intra-batch catch rate at nProbeGate=2 (both
  *     sides exploded over their probe lists — catch iff they overlap).
  *
  * Geometry, not tuning, drives the result: vectors at cos >= 0.99 are
  * nearly collinear, so a split pair sits close to the Voronoi face
  * between its two cells and the straddled cell is (near-)always the
  * runner-up probe. The miss that REMAINS at nProbe=2 is a pair near a
  * 3+-cell corner — rarer as maxCos rises.
  *
  * One JSON line per threshold on stdout; deterministic (seeded
  * column-level randn, no Random).
  */
object GateMissRate {
  def main(args: Array[String]): Unit = {
    val spark = graft.runtime.GraftSession
      .builder("graft-gate-missrate", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    GraftFunctions.register(spark)
    val dim = 64
    val nPairs = 20000L
    val root = java.nio.file.Files.createTempDirectory("gate-missrate").toString

    // base vectors b, partners p = b + s*g with per-pair noise scale s
    // spread over [0.002, 0.2] — cosines land across [~0.98, ~0.99999]
    def gauss(seedBase: Int) = F.array(
      (0 until dim).map(i => F.randn(seedBase + i)): _*)
    val pairs = spark.range(nPairs)
      .withColumn("b_vec", gauss(1000))
      .withColumn("g", gauss(2000))
      .withColumn("s", F.lit(0.002) + F.pow(F.rand(42), 2) * 0.198)
      .withColumn("p_vec", F.zip_with(F.col("b_vec"), F.col("g"),
        (b, g) => b + F.col("s") * g))
      .withColumn("cos",
        F.call_function("vec_dot", F.col("b_vec"), F.col("p_vec")) /
          (F.sqrt(F.call_function("vec_dot", F.col("b_vec"), F.col("b_vec"))) *
            F.sqrt(F.call_function("vec_dot", F.col("p_vec"), F.col("p_vec")))))
      .select("id", "b_vec", "p_vec", "cos")
      .cache()

    // the index is fit on the base side only — partners arrive later,
    // as in the ingest topology (history indexed, batch probing)
    IvfIndex.build(pairs.select(F.col("id"), F.col("b_vec")),
      "id", "b_vec", root, numCentroids = 16, seed = 7L)

    val bCells = IvfIndex.assignCellsMulti(
      pairs.select("id", "b_vec"), "id", "b_vec", root, nProbe = 2)
      .select(F.col("id"), F.col("cells").as("b_cells"))
    val pCells = IvfIndex.assignCellsMulti(
      pairs.select("id", "p_vec"), "id", "p_vec", root, nProbe = 2)
      .select(F.col("id"), F.col("cells").as("p_cells"))
    val joined = pairs.select("id", "cos")
      .join(bCells, "id").join(pCells, "id")
      .withColumn("same_home",
        F.col("b_cells").getItem(0) === F.col("p_cells").getItem(0))
      .withColumn("hist2", // batch probes top-2, history in its home cell
        F.array_contains(F.col("p_cells"), F.col("b_cells").getItem(0)))
      .withColumn("intra2", // both sides exploded: catch iff lists overlap
        F.arrays_overlap(F.col("b_cells"), F.col("p_cells")))
      .cache()

    Seq(0.99, 0.995, 0.999).foreach { t =>
      val r = joined.filter(F.col("cos") >= t)
        .agg(F.count(F.lit(1)).as("n"),
          F.avg(F.when(F.col("same_home"), 1.0).otherwise(0.0)).as("single"),
          F.avg(F.when(F.col("hist2"), 1.0).otherwise(0.0)).as("hist2"),
          F.avg(F.when(F.col("intra2"), 1.0).otherwise(0.0)).as("intra2"))
        .head()
      def miss(i: Int) = 1.0 - r.getDouble(i)
      println(f"""{"maxCos":$t,"pairs":${r.getLong(0)},""" +
        f""""miss_single_probe":${miss(1)}%.4f,"miss_multi2_history":${miss(2)}%.4f,""" +
        f""""miss_multi2_intra":${miss(3)}%.4f}""")
    }
    spark.stop()
  }
}
