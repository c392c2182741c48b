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

    // Embedding-cosine near-duplicate pairs (threshold 0.4): the exact
    // answer via the blocked all-pairs distribution — same result as the
    // brute-force oracle, but planned as a shuffle-distributed
    // SortMergeJoin over block pairs instead of a corpus-broadcast
    // nested loop (PlanSpec asserts no BroadcastNestedLoopJoin).
    "qe03_cosine_neardup" -> ((s, d) => {
      Similarity.cosinePairsBlocked(emb(s, d), "vec_id", "embedding", 0.4)
        .orderBy("a_id", "b_id")
    }),

    // Multi-probe RP-LSH ANN top-10 — deterministic seeded hyperplanes,
    // integer cell probing (hamming <= 1), so the DuckDB oracle
    // recomputes the identical result from the same literal hyperplanes.
    // The KMeans-IVF tier (offline fit + partitionBy(cell) pruning) is
    // covered by SimilaritySpec/PlanSpec instead — its iterative fit is
    // not SQL-expressible.
    "qe04_lsh_ann" -> ((s, d) => {
      Similarity.lshMultiProbeTopK(emb(s, d), "vec_id", "embedding", queryId = 0L, k = 10)
    }),

    // Quantized-scan ANN: int8 codes (4× narrower scan) rank candidates,
    // exact re-rank of k·margin rows recovers the EXACT top-k — the
    // oracle is the same brute-force knn SQL as qe01 (different query
    // id), proving the compression tier loses nothing end-to-end.
    "qe05_quantized_ann" -> ((s, d) => {
      Similarity.quantizedTopK(emb(s, d), "vec_id", "embedding", queryId = 17L, k = 10)
    }),

    // SemDeDup semantic dedup: exact cosine pairs (qe03's kernel) →
    // connected components → min-id representative per cluster. The
    // oracle recomputes the components with a recursive CTE (qd17's
    // shape, embedding edges instead of shingle edges).
    "qe06_semantic_dedup" -> ((s, d) => {
      Similarity.semanticDedup(emb(s, d), "vec_id", "embedding", minCos = 0.4)
        .orderBy("vec_id")
    }),

    // Cluster-stratified diversity sample: ≤3 vectors per RP-LSH cell,
    // chosen by a seeded portable hash through the map-side top-k
    // aggregate — semantic-coverage-preserving downsampling. The oracle
    // re-derives the cells from the literal hyperplanes (qe04's trick)
    // and the selection with a plain window.
    "qe07_cluster_sample" -> ((s, d) => {
      Similarity.clusterStratifiedSample(emb(s, d), "vec_id", "embedding",
          perCell = 3)
        .orderBy("cell", "rank")
    }),

    // The SCALE tier of qe06, driver-checked end to end: candidate pairs
    // come from the random-hyperplane LSH generator (chunk-bucket
    // candidates → exact cosine verify) — the generator that replaces the
    // quadratic blocked kernel at 100 TB — then flow through the same
    // components → representative assignment. 12 chunks of 2 bits at
    // cos >= 0.8 (bit-collision p ≈ 0.795) give miss probability
    // (1-p²)¹² ≈ 6e-6 per true pair, and the oracle's brute-force
    // derivation confirms recall = 1 on this corpus exactly.
    "qe09_semantic_dedup_lsh" -> ((s, d) => {
      val e = emb(s, d)
      // chunkBits = 2 is the deliberately DENSE dial (recall -> 1 so the
      // LSH tier equals the exact oracle); candidates cover ~every id,
      // so the candidate-bounded prefilter would re-run the self-join
      // for no exchange savings
      val pairs = Similarity.rpLshNearDupPairs(e, "vec_id", "embedding",
          minCos = 0.8, dim = 64, bits = 24, chunkBits = 2,
          candidateBounded = false)
      Similarity.semanticDedup(e, "vec_id", "embedding", minCos = 0.8,
          candidatePairs = Some(pairs))
        .orderBy("vec_id")
    }),

    // Batch kNN join: exact top-5 neighbors for every query-set vector in
    // ONE pass — queries broadcast, per-query top-k via the map-side
    // topk_rows aggregate (shuffle sized by |Q|·k, never the corpus).
    // The oracle re-ranks the brute-force pair relation with a window.
    "qe08_knn_join" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.knnJoin(e, e.filter(F.col("vec_id") % 100 === 0),
          "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    // Batch ANN join THROUGH the persisted IVF index, exactness-dialed:
    // every cell probed (nProbe = C) makes the candidate set total, so
    // the result must EQUAL brute force — the oracle is qe08's window
    // re-rank on a disjoint query set. nProbe << C is the serving-scale
    // configuration (partition-pruned scan, recall bought by cell
    // granularity — SimilaritySpec's planted-duplicate contract). The
    // KMeans build runs into a scratch root; with all cells probed the
    // equality holds for ANY centroid placement, which is what lets an
    // iterative-fit index surface be driver-checked at all.
    "qe10_ivf_knn_join" -> ((s, d) => {
      import graft.operators.IvfIndex
      val e = emb(s, d)
      val root = Scratch.dir("graft-qe10-")
      // nProbe=C probes every cell ⇒ brute-force answers regardless of
      // centroid placement, so the k-means trains at floor cost (the
      // same centroid-independence argument as qe11's dials)
      IvfIndex.build(e, "vec_id", "embedding", root, numCentroids = 8,
        trainFraction = 0.25, kmeansMaxIter = 3, kmeansInitMode = "random")
      IvfIndex.knnJoin(s, root, e.filter(F.col("vec_id") % 100 === 50),
          "vec_id", "embedding", k = 5, nProbe = 8)
        .orderBy("query_id", "rank")
    }),

    // qe10's exactness gate AT THE ROUTED-KERNEL SHAPE: C=72 >
    // LiteralKernelMaxCells, so every vector (index build aside — MLlib
    // assigns its own training predictions) and every query flows
    // through the matrix assignment kernel
    // (graft.plans.NearestCellsExpression), and nProbe=C probes every
    // cell, which equals brute force REGARDLESS of what k-means did —
    // the oracle hash-checks the large-C route end to end, not just the
    // SimilaritySpec parity pins. The gate's answer is centroid-
    // independent, so the k-means trains on a 25% sample at floor
    // iterations and C stays just past the routing threshold; the
    // remaining ledger cost is the IN-QUERY INDEX BUILD by contract
    // (measured: ~1 s MLlib fit overhead + ~1.8 s for the 72-dir
    // partitioned vector write — fixed commit costs a real build
    // amortizes; the probe itself is ~0.6 s), the same
    // expensive-by-contract shape as qe10.
    "qe11_ivf_knn_join_bigc" -> ((s, d) => {
      import graft.operators.IvfIndex
      val e = emb(s, d)
      val root = Scratch.dir("graft-qe11-")
      IvfIndex.build(e, "vec_id", "embedding", root, numCentroids = 72,
        trainFraction = 0.25, kmeansMaxIter = 3, kmeansInitMode = "random")
      IvfIndex.knnJoin(s, root, e.filter(F.col("vec_id") % 200 === 25),
          "vec_id", "embedding", k = 5, nProbe = 72)
        .orderBy("query_id", "rank")
    })
  )

  def oracle: Map[String, String] = Map(
    "qe08_knn_join" ->
      s"""WITH $oracleDot
         SELECT query_id, rank, neighbor_id, cos_sim FROM (
           SELECT a_id AS query_id, b_id AS neighbor_id,
             round(dp / (na.nrm * nb.nrm), 4) AS cos_sim,
             CAST(row_number() OVER (PARTITION BY a_id
               ORDER BY round(dp / (na.nrm * nb.nrm), 4) DESC, b_id) AS INTEGER) AS rank
           FROM pairs
           JOIN norms na ON na.vec_id = a_id
           JOIN norms nb ON nb.vec_id = b_id
           WHERE a_id % 100 = 0 AND b_id <> a_id)
         WHERE rank <= 5 ORDER BY query_id, rank""",
    "qe10_ivf_knn_join" ->
      s"""WITH $oracleDot
         SELECT query_id, rank, neighbor_id, cos_sim FROM (
           SELECT a_id AS query_id, b_id AS neighbor_id,
             round(dp / (na.nrm * nb.nrm), 4) AS cos_sim,
             CAST(row_number() OVER (PARTITION BY a_id
               ORDER BY round(dp / (na.nrm * nb.nrm), 4) DESC, b_id) AS INTEGER) AS rank
           FROM pairs
           JOIN norms na ON na.vec_id = a_id
           JOIN norms nb ON nb.vec_id = b_id
           WHERE a_id % 100 = 50 AND b_id <> a_id)
         WHERE rank <= 5 ORDER BY query_id, rank""",
    "qe11_ivf_knn_join_bigc" ->
      s"""WITH $oracleDot
         SELECT query_id, rank, neighbor_id, cos_sim FROM (
           SELECT a_id AS query_id, b_id AS neighbor_id,
             round(dp / (na.nrm * nb.nrm), 4) AS cos_sim,
             CAST(row_number() OVER (PARTITION BY a_id
               ORDER BY round(dp / (na.nrm * nb.nrm), 4) DESC, b_id) AS INTEGER) AS rank
           FROM pairs
           JOIN norms na ON na.vec_id = a_id
           JOIN norms nb ON nb.vec_id = b_id
           WHERE a_id % 200 = 25 AND b_id <> a_id)
         WHERE rank <= 5 ORDER BY query_id, rank""",
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
         ORDER BY a_id, b_id""",
    "qe04_lsh_ann" -> lshAnnOracle,
    "qe05_quantized_ann" ->
      s"""WITH $oracleDot
         SELECT b_id AS neighbor_id, round(dp / (na.nrm * nb.nrm), 4) AS cos_sim
         FROM pairs
         JOIN norms na ON na.vec_id = a_id
         JOIN norms nb ON nb.vec_id = b_id
         WHERE a_id = 17 AND b_id <> 17
         ORDER BY cos_sim DESC, neighbor_id LIMIT 10""",
    "qe06_semantic_dedup" ->
      s"""WITH RECURSIVE $oracleDot,
         thr AS (
           SELECT a_id, b_id FROM pairs
           JOIN norms na ON na.vec_id = a_id
           JOIN norms nb ON nb.vec_id = b_id
           WHERE a_id < b_id AND round(dp / (na.nrm * nb.nrm), 4) >= 0.4),
         edges AS (SELECT a_id AS a, b_id AS b FROM thr
                   UNION ALL SELECT b_id AS a, a_id AS b FROM thr),
         reach(id, r) AS (
           SELECT a, b FROM edges
           UNION
           SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r),
         comp AS (
           SELECT v.vec_id, least(v.vec_id, coalesce(min(r.r), v.vec_id)) AS component
           FROM embeddings v LEFT JOIN reach r ON r.id = v.vec_id
           GROUP BY v.vec_id),
         sizes AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
         SELECT c.vec_id, c.component, s.cluster_size,
           CAST(c.vec_id = c.component AS INT) AS is_rep
         FROM comp c JOIN sizes s ON s.component = c.component
         ORDER BY c.vec_id""",
    "qe07_cluster_sample" -> clusterSampleOracle,
    "qe09_semantic_dedup_lsh" ->
      s"""WITH RECURSIVE $oracleDot,
         thr AS (
           SELECT a_id, b_id FROM pairs
           JOIN norms na ON na.vec_id = a_id
           JOIN norms nb ON nb.vec_id = b_id
           WHERE a_id < b_id AND round(dp / (na.nrm * nb.nrm), 4) >= 0.8),
         edges AS (SELECT a_id AS a, b_id AS b FROM thr
                   UNION ALL SELECT b_id AS a, a_id AS b FROM thr),
         reach(id, r) AS (
           SELECT a, b FROM edges
           UNION
           SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r),
         comp AS (
           SELECT v.vec_id, least(v.vec_id, coalesce(min(r.r), v.vec_id)) AS component
           FROM embeddings v LEFT JOIN reach r ON r.id = v.vec_id
           GROUP BY v.vec_id),
         sizes AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
         SELECT c.vec_id, c.component, s.cluster_size,
           CAST(c.vec_id = c.component AS INT) AS is_rep
         FROM comp c JOIN sizes s ON s.component = c.component
         ORDER BY c.vec_id"""
  )

  // DuckDB twin of the cluster-stratified sample (qe07): cells re-derived
  // from the same literal hyperplanes as qe04's oracle, the 2^50-bounded
  // portable hash recomputed from md5, and the per-cell quota as a plain
  // window — proving the map-side topk_rows aggregate selects exactly the
  // rows a global rank would.
  private lazy val clusterSampleOracle: String = {
    val hp = Similarity.hyperplanes(planes = 4, dim = 64, seed = 7L)
    val codeExpr = hp.zipWithIndex
      .map { case (p, j) =>
        s"(CASE WHEN list_dot_product(e, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1 << j} ELSE 0 END)"
      }
      .mkString(" + ")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       codes AS (SELECT vec_id, $codeExpr AS cell FROM v),
       h AS (SELECT vec_id, cell,
         CAST('0x' || substr(md5('cs1-' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) % ${1L << 50} AS hv
         FROM codes)
       SELECT cell, CAST(rn AS INTEGER) AS rank, vec_id FROM (
         SELECT cell, vec_id, row_number() OVER (PARTITION BY cell ORDER BY hv, vec_id) AS rn
         FROM h)
       WHERE rn <= 3 ORDER BY cell, rank"""
  }

  // DuckDB twin of the multi-probe RP-LSH ANN (qe04): the exact hyperplane
  // constants are embedded as list literals, so cell codes (sign bits of
  // in-order double dot products — list_dot_product matches vec_dot's
  // left-to-right float→double summation bit-for-bit), the hamming<=1
  // probe set, and the final rounded cosine ranking are all identical.
  private lazy val lshAnnOracle: String = {
    val hp = Similarity.hyperplanes(planes = 4, dim = 64, seed = 7L)
    val codeExpr = hp.zipWithIndex
      .map { case (p, j) =>
        s"(CASE WHEN list_dot_product(e, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1 << j} ELSE 0 END)"
      }
      .mkString(" + ")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       codes AS (SELECT vec_id, $codeExpr AS cell FROM v),
       qc AS (SELECT cell AS q_cell FROM codes WHERE vec_id = 0),
       cand AS (SELECT c.vec_id FROM codes c, qc
         WHERE c.vec_id <> 0
           AND bit_count(xor(CAST(c.cell AS BIGINT), CAST(q_cell AS BIGINT))) <= 1),
       qv AS (SELECT e AS qe FROM v WHERE vec_id = 0)
       SELECT v.vec_id AS neighbor_id,
         round(list_dot_product(v.e, qv.qe) /
           (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(qv.qe, qv.qe))), 4) AS cos_sim
       FROM v JOIN cand ON cand.vec_id = v.vec_id, qv
       ORDER BY cos_sim DESC, neighbor_id LIMIT 10"""
  }
}
