package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Adaptive input spreading for CPU-heavy per-row kernels (tokenization,
  * per-row hyperplane signatures, vector dot products).
  *
  * The problem: Spark parallelizes a parquet scan by file split, and a
  * split never crosses a row-group boundary — so a small table written as
  * one file with one row group scans as ONE partition, and every narrow
  * stage stacked on it (the expensive regex tokenize of a dedup pipeline,
  * the 24 `vec_dot` signature projections of RP-LSH) runs on a single
  * core no matter how many the session has. Measured at sf0.1 (round 9):
  * the single-row-group `documents.parquet` made every shingle-kernel
  * consumer single-threaded, the exact cost the round-8 bench drift
  * (qd06/qd17/qd29 +0.2–0.7 s) tracked back to once the `.distinct()`
  * that had been accidentally re-spreading the relation was removed.
  *
  * The fix is adaptive, not unconditional: repartition ONLY when the
  * input's planned partition count is below the session's parallelism.
  * At 100 TB a table scans into ~10⁵ splits and this is a no-op — no
  * added exchange on the scale path. When it does fire, the input is by
  * construction small (fewer splits than cores ⇒ bounded by
  * cores × `maxPartitionBytes`), so the one extra exchange is trivially
  * sized and buys full-width parallelism for everything above it.
  *
  * Spreading hashes on a caller-chosen key (the doc/vector id) rather
  * than round-robin: unique ids spread uniformly, the exchange needs no
  * deterministic-retry sort, and downstream per-id aggregations
  * (signature/count groupBys) reuse the partitioning instead of adding
  * their own exchange.
  */
private[graft] object Par {

  /** `df` repartitioned to the session's default parallelism by `key`,
    * or `df` unchanged if its plan already yields at least half that many
    * partitions. `df.rdd` here only plans the query (no job).
    */
  def spread(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= p) df else df.repartition(p, key)
  }

  /** Run independent driver actions concurrently (guide §2.6: submit
    * independent jobs from a small pool so one job's task tail back-fills
    * with the next's work). Every task is awaited on every exit path —
    * no action is in flight past this frame even on failure — and the
    * first failure propagates. Callers own idempotence: each task must
    * be an overwrite of its own (still-invisible) output.
    */
  def awaitAll(tasks: Seq[() => Unit]): Unit = tasks match {
    case Seq() => ()
    case Seq(one) => one()
    case many =>
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(many.size)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val futs = many.map(t => Future(t()))
        val settled = futs.map(fut => Await.ready(fut, Duration.Inf).value.get)
        settled.collectFirst { case scala.util.Failure(t) => throw t }
        ()
      } finally pool.shutdown()
  }
}
