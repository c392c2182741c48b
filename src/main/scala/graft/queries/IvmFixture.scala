package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Shared base-version and change-feed builders for the incremental-view
  * maintenance oracle queries (ql10–ql12): three deterministic versions
  * of an orders-derived table exercising deletes, inserts, measure
  * updates, and a group-migrating attribute rewrite.
  *
  *   - v0: keys %7 != 6, price = floor(o_totalprice)
  *   - v1: keys %7 != 0, %11 keys get price +5000
  *   - v2: keys %7 != 3, %13 keys get price +77, %17 keys migrate
  *     o_orderpriority to 'MIGRATED'
  *
  * [[feeds]] builds the v0→v1 and v1→v2 change sets WRITER-SIDE — the
  * deltas are known in closed form from the version definitions, so each
  * feed is four pushed-filter scans of orders, no full-outer join (the
  * role [[graft.layers.Merge.scd2WithFeed]] plays for a real maintenance
  * cadence, and the reason ql11/ql12 carry no state-diff shuffles).
  * Equivalence with the post-hoc diff is pinned by IncrementalFeedSpec:
  * `feeds(o) ≡ Merge.diff(version(n), version(n+1), o_orderkey)` row for
  * row; ql10 keeps the diff-path composition end to end.
  */
private[graft] object IvmFixture {

  private def key = F.col("o_orderkey")

  /** Version `n` of the base table; `withBucket` adds ql12's coarse
    * price_bucket column (floor(price/1000)).
    */
  def version(o: DataFrame, n: Int, withBucket: Boolean): DataFrame = {
    val base = F.floor(F.col("o_totalprice")).cast("long")
    val keep = n match {
      case 0 => key % 7 =!= 6
      case 1 => key % 7 =!= 0
      case _ => key % 7 =!= 3
    }
    val price = base +
      (if (n >= 1) F.when(key % 11 === 0, F.lit(5000L)).otherwise(F.lit(0L))
       else F.lit(0L)) +
      (if (n >= 2) F.when(key % 13 === 0, F.lit(77L)).otherwise(F.lit(0L))
       else F.lit(0L))
    val prio =
      if (n >= 2) F.when(key % 17 === 0, F.lit("MIGRATED"))
        .otherwise(F.col("o_orderpriority"))
      else F.col("o_orderpriority")
    val cols = Seq(key, F.col("o_orderstatus"),
      prio.as("o_orderpriority"), price.as("price")) ++
      (if (withBucket) Seq(F.floor(price / 1000).cast("long").as("price_bucket"))
       else Nil)
    o.filter(keep).select(cols: _*)
  }

  private def mkFeed(prev: DataFrame, next: DataFrame,
      del: Column, ins: Column, upd: Column): DataFrame =
    prev.filter(del).withColumn("change_type", F.lit("delete"))
      .unionByName(next.filter(ins).withColumn("change_type", F.lit("insert")))
      .unionByName(prev.filter(upd).withColumn("change_type", F.lit("update_preimage")))
      .unionByName(next.filter(upd).withColumn("change_type", F.lit("update_postimage")))

  /** The (v0→v1, v1→v2) writer-side change feeds, in [[graft.layers.Merge.diff]]'s
    * vocabulary and row-for-row equal to it (IncrementalFeedSpec).
    */
  def feeds(o: DataFrame, withBucket: Boolean): (DataFrame, DataFrame) = {
    val v0 = version(o, 0, withBucket)
    val v1 = version(o, 1, withBucket)
    val v2 = version(o, 2, withBucket)
    val f01 = mkFeed(v0, v1,
      del = key % 7 === 0,
      ins = key % 7 === 6,
      upd = key % 7 =!= 0 && key % 7 =!= 6 && key % 11 === 0)
    val f12 = mkFeed(v1, v2,
      del = key % 7 === 3,
      ins = key % 7 === 0,
      upd = key % 7 =!= 0 && key % 7 =!= 3 &&
        (key % 13 === 0 || key % 17 === 0))
    (f01, f12)
  }
}
