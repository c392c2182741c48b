package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.ZOrder

class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  /** Mean per-file (max-min) of `col`, normalized by the global range —
    * the fraction of the column's domain a file's zone map covers; 1.0
    * means min/max skipping can never eliminate the file.
    */
  private def avgFileRange(path: String, col: String): Double = {
    val df = spark.read.parquet(path)
      .select(F.input_file_name().as("f"), F.col(col).cast("double").as("v"))
    val global = df.agg((F.max("v") - F.min("v")).as("r")).head().getDouble(0)
    val per = df.groupBy("f").agg(((F.max("v") - F.min("v")) / global).as("nr"))
    per.agg(F.avg("nr")).head().getDouble(0)
  }

  test("morton interleave of two 4-bit buckets hits known values") {
    import spark.implicits._
    // bucket pairs (x, y) → z: x contributes even bit positions, y odd
    val df = Seq((0, 0), (1, 0), (0, 1), (3, 3), (15, 15)).toDF("x", "y")
    val z = df.select(ZOrder.zValue(Seq(F.col("x"), F.col("y")), bits = 4).as("z"))
      .collect().map(_.getLong(0))
    assert(z.sameElements(Array(0L, 1L, 2L, 15L, 255L)))
  }

  test("interleave stays exact at bit positions >= 31 (long widening), and past 63 refuses") {
    import spark.implicits._
    // 4 columns × 8 bits puts column 3's top bit at position 7·4+3 = 31 —
    // the first position an int shiftleft corrupts (sign bit + mod-32
    // wrap). Regression for the round-4 long-widening fix: each column
    // alone must contribute exactly its comb of positions b·4+i.
    val df = Seq((255, 0, 0, 0), (0, 0, 0, 255), (255, 255, 255, 255))
      .toDF("a", "b", "c", "d")
    val z = df.select(ZOrder.zValue(
        Seq(F.col("a"), F.col("b"), F.col("c"), F.col("d")), bits = 8).as("z"))
      .collect().map(_.getLong(0))
    assert(z(0) == 0x11111111L, f"col 0 comb wrong: ${z(0)}%x")
    assert(z(1) == 0x88888888L, f"col 3 comb (incl. bit 31) wrong: ${z(1)}%x")
    assert(z(2) == 0xFFFFFFFFL, f"full 32-bit interleave wrong: ${z(2)}%x")
    // 8 × 8 bits needs position 63 = the long sign bit; must throw, not wrap
    val cols = (0 until 8).map(_ => F.lit(1).as("x"))
    val boom = intercept[IllegalArgumentException] { ZOrder.zValue(cols, bits = 8) }
    assert(boom.getMessage.contains("63"))
  }

  test("z-order layout keeps per-file zone maps tight on BOTH columns; linear sort only on one") {
    val li = graft.runtime.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val work = TestFixtures.tmpDir("zorder")

    val linear = work.resolve("linear").toString
    li.repartitionByRange(8, F.col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.parquet(linear)

    val zpath = work.resolve("z").toString
    ZOrder.cluster(li, Seq("l_orderkey", "l_extendedprice"), numFiles = 8)
      .write.parquet(zpath)

    // same data either way
    assert(spark.read.parquet(zpath).count() == li.count())
    assert(spark.read.parquet(zpath).columns.sorted
      .sameElements(li.columns.sorted), "clustering must not leak helper columns")

    val linOrder = avgFileRange(linear, "l_orderkey")
    val linPrice = avgFileRange(linear, "l_extendedprice")
    val zOrder = avgFileRange(zpath, "l_orderkey")
    val zPrice = avgFileRange(zpath, "l_extendedprice")
    info(f"linear: orderkey $linOrder%.3f price $linPrice%.3f | zorder: orderkey $zOrder%.3f price $zPrice%.3f")

    // the linear sort is tight on its key and useless on the other column
    assert(linOrder < 0.3 && linPrice > 0.8)
    // z-order trades a little leading-key locality for locality on BOTH
    assert(zOrder < 0.7, s"z layout lost orderkey locality: $zOrder")
    assert(zPrice < 0.7 * linPrice, s"z layout did not localize price: $zPrice vs $linPrice")
  }
}
