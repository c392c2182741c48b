package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoins

/** Stream-stream event-time joins: interval join (inner + left_outer
  * with watermark-driven null emission) and the velocity-pair fraud
  * self-join (§2.9 extension — the reference's per-row scoring loop
  * cannot correlate two live feeds at all).
  */
class StreamJoinsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  private val kvSchema = StructType(Seq(
    StructField("k", StringType),
    StructField("ts", TimestampType),
    StructField("v", StringType)))

  private def writeLines(dir: Path, file: String, lines: Seq[String]): Unit = {
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(file), lines.mkString("\n") + "\n")
  }

  private def kvStream(dir: Path): DataFrame =
    spark.readStream.schema(kvSchema)
      .option("maxFilesPerTrigger", 1)
      .json(dir.toString)

  private def row(k: String, ts: String, v: String): String =
    s"""{"k":"$k","ts":"$ts","v":"$v"}"""

  test("interval join pairs rows of the same key within the window only") {
    val work = TestFixtures.tmpDir("sjoin-inner")
    val lDir = work.resolve("l"); val rDir = work.resolve("r")
    writeLines(lDir, "l1.jsonl", Seq(
      row("a", "2026-01-01 10:00:00", "tx1"),
      row("b", "2026-01-01 10:00:00", "tx2")))
    writeLines(rDir, "r1.jsonl", Seq(
      row("a", "2026-01-01 10:03:00", "inside-ahead"),   // +3m: matches
      row("a", "2026-01-01 09:58:00", "inside-back"),    // −2m: matches
      row("a", "2026-01-01 10:20:00", "outside"),        // +20m: dropped
      row("c", "2026-01-01 10:00:00", "wrong-key")))     // no left 'c'
    val out = work.resolve("out").toString
    val q = StreamJoins.intervalJoin(
        kvStream(lDir), kvStream(rDir), key = "k",
        leftTs = "ts", rightTs = "ts",
        lookBack = "5 minutes", lookAhead = "5 minutes",
        leftDelay = "1 minute", rightDelay = "1 minute")
      .select(F.col("l.k").as("k"), F.col("l.v").as("lv"), F.col("r.v").as("rv"))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("a", "tx1", "inside-ahead"), ("a", "tx1", "inside-back")))
  }

  test("left_outer interval join emits the null row once the right watermark passes") {
    val work = TestFixtures.tmpDir("sjoin-outer")
    val lDir = work.resolve("l"); val rDir = work.resolve("r")
    // left: one row that WILL match, one that never will
    writeLines(lDir, "l1.jsonl", Seq(
      row("a", "2026-01-01 10:00:00", "matched"),
      row("b", "2026-01-01 10:00:00", "orphan")))
    writeLines(rDir, "r1.jsonl", Seq(
      row("a", "2026-01-01 10:02:00", "partner")))
    val out = work.resolve("out").toString
    def run(): Unit = {
      val q = StreamJoins.intervalJoin(
          kvStream(lDir), kvStream(rDir), key = "k",
          leftTs = "ts", rightTs = "ts",
          lookBack = "5 minutes", lookAhead = "5 minutes",
          leftDelay = "1 minute", rightDelay = "1 minute",
          joinType = "left_outer")
        .select(F.col("l.v").as("lv"), F.col("r.v").as("rv"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    val early = spark.read.parquet(out).collect().map(r => (r.getString(0), Option(r.getString(1))))
    assert(early.toSet == Set(("matched", Some("partner"))),
      s"orphan must NOT emit before the watermark proves no partner can come: ${early.toSet}")

    // push BOTH watermarks far past orphan's join window, then one more
    // batch so the advanced watermark evicts state and emits the null row
    writeLines(lDir, "l2.jsonl", Seq(row("z", "2026-01-01 12:00:00", "wm-push-l")))
    writeLines(rDir, "r2.jsonl", Seq(row("z", "2026-01-01 12:00:00", "wm-push-r")))
    run()
    writeLines(lDir, "l3.jsonl", Seq(row("z2", "2026-01-01 12:30:00", "tick-l")))
    writeLines(rDir, "r3.jsonl", Seq(row("z2", "2026-01-01 12:30:00", "tick-r")))
    run()
    val late = spark.read.parquet(out).collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(late.contains(("orphan", None)),
      s"orphan row with null partner expected after watermark passed: $late")
  }

  test("velocityPairs emits each same-card rapid pair exactly once, ordered") {
    val work = TestFixtures.tmpDir("sjoin-velocity")
    val txDir = work.resolve("tx")
    val txSchema = StructType(Seq(
      StructField("cc_num", LongType),
      StructField("trans_num", StringType),
      StructField("trans_timestamp", TimestampType),
      StructField("amt", DoubleType)))
    def tx(cc: Long, id: String, ts: String, amt: Double): String =
      s"""{"cc_num":$cc,"trans_num":"$id","trans_timestamp":"$ts","amt":$amt}"""
    writeLines(txDir, "t1.jsonl", Seq(
      tx(111L, "t1", "2026-01-01 10:00:00", 5.0),
      tx(111L, "t2", "2026-01-01 10:03:00", 500.0),  // 3m after t1: pair
      tx(111L, "t3", "2026-01-01 10:30:00", 9.0),    // 27m later: no pair
      tx(222L, "t4", "2026-01-01 10:01:00", 7.0),    // other card: no pair
      tx(333L, "t5", "2026-01-01 11:00:00", 1.0),    // same-ts distinct pair
      tx(333L, "t6", "2026-01-01 11:00:00", 2.0)))
    val silver = spark.readStream.schema(txSchema).json(txDir.toString)
    val out = work.resolve("out").toString
    val q = StreamJoins.velocityPairs(silver, window = "10 minutes")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("cc_num"), r.getAs[String]("first_trans"),
        r.getAs[String]("second_trans"), r.getAs[Long]("gap_seconds")))
    assert(got.toSet == Set(
      (111L, "t1", "t2", 180L),
      (333L, "t5", "t6", 0L)), s"got ${got.toSet}")
    assert(got.length == 2, "each pair exactly once, one orientation")
  }
}
