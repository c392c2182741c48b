package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

import graft.functions.VectorFunctions.{asDouble, cosine}
import graft.plans.GraftFunctions

/** Approximate/exact nearest-neighbor search over an embedding column.
  *
  * Three tiers, by scale:
  *   1. [[cosineTopK]] — brute-force scan against one query vector:
  *      O(N·d), embarrassingly parallel, the correctness baseline.
  *   2. [[cosinePairs]] — all-pairs above a threshold. Quadratic; only
  *      for corpus slices that fit a bucket. At 100 TB, use [[Dedup]]-style
  *      LSH or [[ivfTopK]] buckets first and verify within buckets.
  *   3. [[ivfTopK]] — IVF: KMeans-partition the corpus (the "inverted
  *      file"), probe the nProbe nearest centroids only. The scan cost
  *      drops by ~numCentroids/nProbe; recall is tunable via nProbe.
  *
  * Hot loops use the native [[graft.plans.DotProduct]] expression (the
  * higher-order-function composition is interpreted — see its scaladoc);
  * norms are precomputed once per vector, never per pair.
  */
object Similarity {

  private def dot(a: Column, b: Column): Column = F.call_function("vec_dot", a, b)
  private def norm(v: Column): Column = F.sqrt(F.call_function("vec_dot", v, v))

  /** Exact top-k cosine neighbors of the vector with id == queryId.
    * The query vector travels as a broadcast (one row), so this is a
    * single scan + TakeOrderedAndProject — no shuffle of the corpus.
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String, queryId: Long, k: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val q = df.filter(F.col(idCol) === queryId)
      .select(F.col(vecCol).as("q_vec"), norm(F.col(vecCol)).as("q_norm"))
    df.filter(F.col(idCol) =!= queryId)
      .crossJoin(F.broadcast(q))
      .select(
        F.col(idCol).as("neighbor_id"),
        F.round(dot(F.col(vecCol), F.col("q_vec")) / (norm(F.col(vecCol)) * F.col("q_norm")), 4)
          .as("cos_sim"))
      .orderBy(F.col("cos_sim").desc, F.col("neighbor_id"))
      .limit(k)
  }

  /** All pairs (a < b) with cosine >= minCos. Brute-force kernel — the
    * verification stage of an LSH/IVF pipeline, or a direct answer for
    * bounded slices.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String, minCos: Double): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val n = df.select(F.col(idCol).as("a_id"), F.col(vecCol).as("a_vec"),
      norm(F.col(vecCol)).as("a_norm"))
    val m = df.select(F.col(idCol).as("b_id"), F.col(vecCol).as("b_vec"),
      norm(F.col(vecCol)).as("b_norm"))
    n.join(m, F.col("a_id") < F.col("b_id"))
      .withColumn("cos_sim",
        F.round(dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_norm") * F.col("b_norm")), 4))
      .filter(F.col("cos_sim") >= minCos)
      .select("a_id", "b_id", "cos_sim")
  }

  /** IVF approximate top-k: KMeans the corpus into numCentroids cells,
    * rank cells by centroid distance to the query, brute-force only the
    * nProbe nearest cells. Deterministic given the seed.
    */
  def ivfTopK(
      df: DataFrame, idCol: String, vecCol: String, queryId: Long, k: Int,
      numCentroids: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    GraftFunctions.register(df.sparkSession)
    val vecs = df.withColumn("features", array_to_vector(asDouble(F.col(vecCol))))
    val model = new KMeans().setK(numCentroids).setSeed(seed).setFeaturesCol("features")
      .fit(vecs)
    val assigned = model.transform(vecs).withColumnRenamed("prediction", "cell")

    val spark = df.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("cell", "centroid")

    val q = assigned.filter(F.col(idCol) === queryId)
      .select(F.col(vecCol).as("q_vec"))
    val probeCells = centroids.crossJoin(F.broadcast(q))
      .select(F.col("cell"),
        cosine(F.col("centroid"), F.col("q_vec")).as("c_sim"))
      .orderBy(F.col("c_sim").desc)
      .limit(nProbe)
      .select("cell")

    assigned
      .join(F.broadcast(probeCells), "cell") // partition pruning: only probed cells scanned
      .filter(F.col(idCol) =!= queryId)
      .crossJoin(F.broadcast(q))
      .select(
        F.col(idCol).as("neighbor_id"),
        F.round(dot(F.col(vecCol), F.col("q_vec")) /
          (norm(F.col(vecCol)) * norm(F.col("q_vec"))), 4).as("cos_sim"))
      .orderBy(F.col("cos_sim").desc, F.col("neighbor_id"))
      .limit(k)
  }
}
