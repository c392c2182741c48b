package graft.streaming

import org.apache.spark.sql.SparkSession

/** Per-trigger session tuning for the ingest streams.
  *
  * A micro-batch trigger's cost at small batch sizes is its fixed Spark
  * job/task count, not its data — and every shuffle in the trigger
  * inherits the SESSION's `spark.sql.shuffle.partitions`, which is sized
  * for corpus-scale analytics (32 here, hundreds on a real cluster).
  * Scoping the setting to the trigger cuts the per-shuffle scheduling
  * constant: measured on the corpus-ingest trigger (5k docs, quiet
  * local[32], lazy production shape) 11.6 s at the session's 32 vs
  * 8.4 s at 8 — with AQE still free to coalesce further below the cap.
  *
  * The conf is SESSION-scoped, not thread-scoped: a concurrent query
  * planned inside the window sees the micro-batch value. Both ingest
  * streams run micro-batch-sized work, so sharing a session (the
  * supported two-streams topology) only ever swaps one micro-batch
  * setting for another; analytics sessions should not share a session
  * with a high-rate ingest stream anyway. Pass `None` to leave the
  * session conf untouched (e.g. when batches are corpus-sized).
  *
  * Restore is DEPTH-COUNTED per session: with two streams on one
  * session, overlapping triggers would otherwise interleave their
  * save/restore (T2 saves T1's already-lowered value, T1 restores the
  * original, T2 "restores" the micro-batch value) and leave the session
  * pinned at 8 after both streams stop. The FIRST entrant records the
  * session's value, the LAST exiter restores it — proven by
  * ConcurrentIngestSpec's two-streams race.
  *
  * CAVEAT (accepted): the depth counter saves only the first entrant's
  * value, so two OVERLAPPING streams passing DIFFERENT `n` race on the
  * transient setting — the inner exit restores nothing, and the
  * remaining stream runs under the other's value until its own next
  * trigger re-sets it. The final restore is still correct. Concurrent
  * streams on one session should therefore pass the same value (or
  * `None`); a per-entrant value stack cannot fix it anyway, because the
  * session conf itself is one slot — the streams genuinely contend.
  */
private[graft] object MicroBatchConf {

  private val Key = "spark.sql.shuffle.partitions"

  /** session -> (nesting depth, value to restore when depth hits 0).
    * Guarded by its own monitor; sessions are few (usually one). */
  private val entered =
    scala.collection.mutable.Map.empty[SparkSession, (Int, String)]

  def withShufflePartitions[T](spark: SparkSession, n: Option[Int])(body: => T): T =
    n match {
      case None => body
      case Some(p) =>
        entered.synchronized {
          val (depth, saved) = entered.getOrElse(spark, (0, spark.conf.get(Key)))
          entered.update(spark, (depth + 1, saved))
          spark.conf.set(Key, p)
        }
        try body finally entered.synchronized {
          val (depth, saved) = entered(spark)
          if (depth == 1) { entered.remove(spark); spark.conf.set(Key, saved) }
          else entered.update(spark, (depth - 1, saved))
        }
    }
}
