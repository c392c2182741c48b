package graft.layers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Z-order (Morton-curve) clustering for multi-column data skipping —
  * the layout half of "push down and prune": parquet min/max (and any
  * engine's file-level zone maps) can only skip files whose value ranges
  * are tight, and a plain sort makes ranges tight for the LEADING key
  * only. Interleaving the bits of per-column rank buckets gives every
  * clustered column locality, so selective predicates on ANY of them
  * skip most files. The same idea as Delta/Iceberg OPTIMIZE ZORDER BY,
  * expressed as plain Spark: quantile bucketing + a bit-interleave
  * Column + repartitionByRange/sortWithinPartitions.
  *
  * Scale design: breakpoints come from `approxQuantile` (one pass,
  * Greenwald-Khanna sketch — driver holds 2^bits doubles per column,
  * metadata scale); the z-value itself is pure Column arithmetic inside
  * whole-stage codegen; the only shuffle is the range partition that any
  * clustered write needs.
  */
object ZOrder {

  /** Rank bucket of `c` given ascending quantile breakpoints: the count
    * of breakpoints the value exceeds — a when-free sum of comparisons
    * that codegen unrolls. Nulls land in bucket 0.
    */
  def bucketOf(c: Column, breakpoints: Seq[Double]): Column =
    breakpoints
      .map(bp => F.when(c > bp, 1).otherwise(0))
      .reduceOption(_ + _)
      .getOrElse(F.lit(0))

  /** Morton z-value: interleave the low `bits` bits of each column's
    * bucket, column i contributing bit position b·ncols+i for its bit b.
    *
    * The extracted bit is widened to LONG before the left shift:
    * `shiftleft` on an int operand wraps the shift distance mod 32 and
    * hits the int sign bit first, so bit positions >= 31 (e.g. bits=8
    * with 4+ columns) would silently scramble the interleave. Positions
    * above 62 can't be represented even in a long, hence the require.
    */
  def zValue(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    require(n * bits <= 63,
      s"z-value needs $n*$bits bit positions; the long interleave holds 63")
    val terms = for {
      (bkt, i) <- buckets.zipWithIndex
      b <- 0 until bits
    } yield F.shiftleft(F.shiftright(bkt, b).bitwiseAND(1).cast("long"), b * n + i)
    terms.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Returns `df` re-clustered on the z-order of `cols` into `numFiles`
    * range partitions, rows sorted by z within each — write the result
    * with `.write.parquet(...)` (one file per partition) and file-level
    * min/max on every clustered column becomes selective.
    *
    * `bits` = 4 gives 16 buckets/column; more bits sharpen locality but
    * lengthen the breakpoint scan. Columns must be numeric (cast dates /
    * timestamps to their epoch numbers first).
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 4, relErr: Double = 0.01): DataFrame =
    clusterKeyed(df, cols, numFiles, "__zpart", bits, relErr).drop("__zpart")

  /** [[cluster]], keeping the z-range index as LONG column `keyCol`
    * (0 until numFiles) — the handle a clustered WRITE needs to split
    * the result into one unit (file, batch dir) per z-range:
    * [[AtomicAppend.compactClustered]] partitions its fold by it. The
    * index is a plain VALUE — `bucketOf(__zval, zsplits)`, breakpoints
    * from one narrow quantile pass — deterministic by construction, and
    * the rows reach their write tasks through a [[graft.runtime.HashRouting]]
    * identity-routed hash exchange (round-15; this replaced the earlier
    * `spark_partition_id`-after-range-exchange mechanism and its
    * nondeterministic-projection caveat).
    */
  def clusterKeyed(df: DataFrame, cols: Seq[String], numFiles: Int,
      keyCol: String, bits: Int = 4, relErr: Double = 0.01): DataFrame = {
    require(cols.nonEmpty && bits >= 1 && bits <= 8)
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val doubled = df.select(
      F.col("*") +: cols.zipWithIndex.map { case (c, i) =>
        F.col(c).cast("double").as(s"__z$i")
      }: _*)
    val breakpoints = doubled.stat.approxQuantile(
      cols.indices.map(i => s"__z$i").toArray, probs, relErr)
    val z = zValue(
      cols.indices.map(i => bucketOf(F.col(s"__z$i"), breakpoints(i).toSeq.distinct.sorted)),
      bits)
    val withZ = doubled.withColumn("__zval", z)
    // z-range boundaries from ONE more narrow quantile pass over the
    // z-value, instead of `repartitionByRange` — whose RangePartitioner
    // runs its own sampling job over FULL ROWS of the child plan
    // (round-15 profiling: a visible slice of every clustered fold).
    // The range index is then a plain VALUE (bucketOf over the splits),
    // deterministic by construction — no spark_partition_id, no
    // nondeterministic-projection caveat.
    val zsplits: Seq[Double] =
      if (numFiles <= 1) Seq.empty
      else withZ.stat.approxQuantile("__zval",
        (1 until numFiles).map(_.toDouble / numFiles).toArray, relErr)
        .toSeq.distinct.sorted
    // route range i to shuffle partition i exactly: repartition() hashes
    // its key, and hashing 0..n-1 directly collides (guide §2.5 — some
    // partitions get 2-3 ranges, others none, serializing the clustered
    // write). [[graft.runtime.HashRouting]] remaps each range index to a
    // pre-searched salt whose murmur3 lands on its own partition —
    // deterministic identity routing through the stock hash exchange.
    withZ
      .withColumn(keyCol, bucketOf(F.col("__zval"), zsplits).cast("long"))
      .repartition(numFiles,
        graft.runtime.HashRouting.route(F.col(keyCol), numFiles))
      .sortWithinPartitions("__zval")
      .drop(cols.indices.map(i => s"__z$i") :+ "__zval": _*)
  }
}
