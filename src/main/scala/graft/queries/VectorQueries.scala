package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.functions.VectorFunctions._
import graft.operators.Similarity
import graft.runtime.Tables

/** Similarity-search operators over the `embeddings` table
  * (`vec_id`, `embedding: array<float>`, `label`).
  *
  * Oracle notes: DuckDB computes dot products by expanding the 64-dim
  * list over `range(64)` and summing `CAST(embedding[i+1] AS DOUBLE)`
  * products — double math on both sides; results rounded to 4 dp before
  * compare (summation order differs between engines).
  */
object VectorQueries extends QueryPack {

  private def emb(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "embeddings")

  private val oracleDot =
    """pairs AS (
         SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           sum(CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE)) AS dp
         FROM embeddings a, embeddings b, (SELECT unnest(range(64)) AS i)
         GROUP BY a.vec_id, b.vec_id),
       norms AS (
         SELECT vec_id, sqrt(sum(CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))) AS nrm
         FROM embeddings, (SELECT unnest(range(64)) AS i)
         GROUP BY vec_id)"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-k against one query vector (ANN baseline).
    "qe01_knn_cosine" -> ((s, d) => {
      Similarity.cosineTopK(emb(s, d), "vec_id", "embedding", queryId = 0L, k = 10)
    }),

    // Per-label embedding statistics (norms via aggregate/zip_with).
    "qe02_embedding_stats" -> ((s, d) => {
      emb(s, d)
        .select(F.col("label"), norm(F.col("embedding")).as("nrm"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).as("n"), F.round(F.avg("nrm"), 4).as("avg_norm"))
        .orderBy("label")
    }),

    // Embedding-cosine near-duplicate pairs (threshold 0.4).
    "qe03_cosine_neardup" -> ((s, d) => {
      Similarity.cosinePairs(emb(s, d), "vec_id", "embedding", 0.4)
        .orderBy("a_id", "b_id")
    }),

    // IVF (KMeans inverted file, probe 4/16 cells) — approximate by
    // construction, so rows-only; recall vs brute force is asserted in
    // SimilaritySpec.
    "qe04_ro_ivf_ann" -> ((s, d) => {
      Similarity.ivfTopK(emb(s, d), "vec_id", "embedding", queryId = 0L, k = 10)
    })
  )

  def oracle: Map[String, String] = Map(
    "qe01_knn_cosine" ->
      s"""WITH $oracleDot
         SELECT b_id AS neighbor_id, round(dp / (na.nrm * nb.nrm), 4) AS cos_sim
         FROM pairs
         JOIN norms na ON na.vec_id = a_id
         JOIN norms nb ON nb.vec_id = b_id
         WHERE a_id = 0 AND b_id <> 0
         ORDER BY cos_sim DESC, neighbor_id LIMIT 10""",
    "qe02_embedding_stats" ->
      """SELECT label, count(*) AS n, round(avg(nrm), 4) AS avg_norm FROM (
           SELECT vec_id, any_value(label) AS label,
             sqrt(sum(CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))) AS nrm
           FROM embeddings, (SELECT unnest(range(64)) AS i)
           GROUP BY vec_id)
         GROUP BY label ORDER BY label""",
    "qe03_cosine_neardup" ->
      s"""WITH $oracleDot
         SELECT a_id, b_id, round(dp / (na.nrm * nb.nrm), 4) AS cos_sim
         FROM pairs
         JOIN norms na ON na.vec_id = a_id
         JOIN norms nb ON nb.vec_id = b_id
         WHERE a_id < b_id AND round(dp / (na.nrm * nb.nrm), 4) >= 0.4
         ORDER BY a_id, b_id"""
  )
}
