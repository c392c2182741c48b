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
  */
private[graft] object MicroBatchConf {

  private val Key = "spark.sql.shuffle.partitions"

  def withShufflePartitions[T](spark: SparkSession, n: Option[Int])(body: => T): T =
    n match {
      case None => body
      case Some(p) =>
        val prev = spark.conf.get(Key)
        spark.conf.set(Key, p)
        try body finally spark.conf.set(Key, prev)
    }
}
