package graft.runtime

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Collision-free routing of a dense integer key through Spark's stock
  * hash exchange (round-15 optimization, guide §2.5): `repartition(n,
  * key)` murmur3-hashes the key, and hashing the dense values 0..n-1
  * directly collides — some partitions receive 2-3 keys while others
  * stay empty, serializing any write that wants one task per key (a
  * z-range, an IVF cell). Remapping each key to a pre-searched SALT
  * whose murmur3 lands on its own partition makes the stock exchange an
  * identity router: exactly one key group per partition, no custom
  * partitioner, still whole-stage-codegen (one array lookup per row).
  */
object HashRouting {

  /** For each partition index i < n, the smallest non-negative long whose
    * Murmur3 hash (seed 42 — HashPartitioning's) lands on partition i:
    * `pmod(hash(salt_i), n) == i`. Driver-side, O(n·n) expected tries;
    * memoized per n (the table is n longs).
    */
  private val memo = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  def identitySalts(n: Int): Array[Long] =
    memo.computeIfAbsent(n, { n =>
      val out = new Array[Long](n)
      val found = new Array[Boolean](n)
      var s = 0L
      var remaining = n
      while (remaining > 0) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(s, 42)
        val p = ((h % n) + n) % n
        if (!found(p)) { found(p) = true; out(p) = s; remaining -= 1 }
        s += 1
      }
      out
    })

  /** The routing expression for `repartition(n, route(key, n))`: key
    * group `k` lands on partition `pmod(k, n)`, collision-free. `key`
    * must be a non-negative integral column.
    */
  def route(key: Column, n: Int): Column =
    F.element_at(F.lit(identitySalts(n)), F.pmod(key.cast("int"), F.lit(n)) + 1)
}
