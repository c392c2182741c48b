package graft.tools

import org.apache.spark.sql.{functions => F}

import graft.operators.IvfIndex
import graft.runtime.GraftSession

/** Profiles the cell-assignment kernels across centroid counts — what a
  * streaming trigger actually pays per batch: plan construction + codegen
  * of the C-literal expression AND the per-row arithmetic. Separates the
  * two by timing a first (cold plan) and second (warm plan) run of the
  * same kernel on the same batch, at full width and on one partition.
  *
  * Round-12 findings on this box (20k × 64-dim, local[32]): warm ≈
  * cold at every C (plan/codegen is NOT the cost — the per-row
  * struct-candidate evaluation is); the LITERAL kernels are
  * parallelism-bound AND allocation-bound, while the broadcast-JOIN
  * kernel ([[graft.operators.IvfIndex.assignCellsMultiJoin]]) matches
  * them at C=16 and wins ~8× at C=128, ~30× at C=512, ~1 s at C=2048
  * where the two-level literal kernel needs 128 s — hence the
  * LiteralKernelMaxCells=64 routing. The other large-C trigger cost
  * found here was the fold's unclustered partitioned write (tasks × C
  * files); see the `repartition(cell)` in
  * [[graft.operators.IvfIndex.build]] / appendAssigned / compact.
  *
  * Round-13 findings (same shapes): the MATRIX kernel
  * ([[graft.plans.NearestCellsExpression]], now the large-C routed
  * default) beats the join kernel at every measured point — 20k×64d:
  * 0.23 vs 0.52 s at C=16-equivalent loads, 0.16 vs 0.37 s at C=128,
  * 0.23 vs 0.55 s at C=512 (warm, 32p); single-partition 0.59 vs
  * 2.76 s at C=512 — and at d=1536 (modern embedding width, where the
  * join kernel's groupBy ships every vector: 20k rows × 1536 doubles ≈
  * 245 MB exchange) reads 0.46 vs 0.72 s at C=128 and 0.91 vs 0.98 s
  * at C=512. The local numbers UNDERSTATE the join kernel's d-cost —
  * a local[32] shuffle never leaves the page cache, while on a cluster
  * that exchange crosses the network; the matrix kernel has no exchange
  * at any d or C (the structural claim, read it off the plan).
  * The TWO-LEVEL tier moved to the same matrix form
  * ([[graft.plans.TwoLevelNearestCellsExpression]]): its `two` column
  * collapsed 29.3 → 0.27 s at C=512 and runs 0.35 s at C=2048 where the
  * CASE-chain literal needed 128 s — and on one partition at C=2048/d=64
  * it already edges the flat matrix kernel (1.47 vs 1.73 s), the n·√C-
  * vs-n·C separation that widens as C grows toward corpus-scale 10⁴⁺.
  * Measured crossover honesty: at d=1536 × C=2048 (25 MB matrix — a
  * memory-bandwidth-bound sweep per row) the two-level tier reads EVEN
  * TO SLOWER locally (warm 5.27 vs flat 3.55 s at 32p; 51 vs 45 s at
  * 1p): it touches ~4× fewer doubles but in per-group SCATTERED order,
  * and the flat kernel's sequential sweep wins the prefetcher back. The
  * two-level dial pays off in the compute-bound regime (small-to-mid d)
  * and in flop count at C ≫ 10³; measure at the deployment's (d, C)
  * before flipping the dial.
  *
  * Usage: runMain graft.tools.ProfileAssign [nVecs] [dims] [cells,...]
  */
object ProfileAssign {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(20000)
    val dims = args.lift(1).map(_.toInt).getOrElse(64)
    val cells = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(16, 128, 512))
    val spark = GraftSession.get("profile-assign")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val corpus = (0 until math.max(n, 2000)).map(i =>
      (i.toLong, Array.fill(dims)(rnd.nextGaussian()).toSeq))
      .toDF("vec_id", "embedding").cache()
    corpus.count()
    // limit() collapses to one partition — spread the batch like a real
    // caller would, or the kernel profile measures one core
    val batch = corpus.limit(n).repartition(32).cache(); batch.count()
    val batch1 = corpus.limit(n).coalesce(1).cache(); batch1.count()
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    cells.foreach { c =>
      val root = java.nio.file.Files.createTempDirectory(s"pa-$c-").toString
      IvfIndex.build(corpus, "vec_id", "embedding", root, numCentroids = c)
      def run(df: org.apache.spark.sql.DataFrame, coarse: Int): Unit =
        IvfIndex.assignCellsMulti(df, "vec_id", "embedding", root, 2, coarse)
          .select(F.sum(F.col("cells").getItem(0))).head()
      def runJoin(df: org.apache.spark.sql.DataFrame): Unit =
        IvfIndex.assignCellsMultiJoin(df, "vec_id", "embedding", root, 2)
          .select(F.sum(F.col("cells").getItem(0))).head()
      def runExpr(df: org.apache.spark.sql.DataFrame): Unit =
        IvfIndex.assignCellsMultiExpr(df, "vec_id", "embedding",
          IvfIndex.loadCentroids(spark, root), 2)
          .select(F.sum(F.col("cells").getItem(0))).head()
      val flatCold = t(run(batch, 0)); val flatWarm = t(run(batch, 0))
      val g = math.max(2, math.round(math.sqrt(c.toDouble) / 4.0).toInt)
      val twoCold = t(run(batch, g)); val twoWarm = t(run(batch, g))
      val joinCold = t(runJoin(batch)); val joinWarm = t(runJoin(batch))
      val exprCold = t(runExpr(batch)); val exprWarm = t(runExpr(batch))
      val flat1 = t(run(batch1, 0)); val two1 = t(run(batch1, g))
      val join1 = t(runJoin(batch1)); val expr1 = t(runExpr(batch1))
      println(f"[assign] C=$c%4d d=$dims%4d 32p: flat cold=$flatCold%6.2fs warm=$flatWarm%6.2fs " +
        f"two(p=$g) cold=$twoCold%6.2fs warm=$twoWarm%6.2fs " +
        f"join cold=$joinCold%6.2fs warm=$joinWarm%6.2fs " +
        f"expr cold=$exprCold%6.2fs warm=$exprWarm%6.2fs | " +
        f"1p: flat=$flat1%6.2fs two=$two1%6.2fs join=$join1%6.2fs expr=$expr1%6.2fs")
    }
    spark.stop()
  }
}
