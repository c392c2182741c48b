package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.{IncrementalView => IV, Snapshots}
import graft.streaming.{FactViewStream, MaintainedView}

/** Fact-side streaming view maintenance ([[graft.streaming.FactViewStream]]
  * / [[graft.layers.IncrementalView.refreshFromBatch]]): micro-batches of
  * an append-only fact advance a grouped summary (sums + min/max +
  * distinct) exactly-once, rebuild-exact at every version — including
  * LATE rows, the case the HWM adapter by contract drops.
  */
class FactViewStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  private def rowSet(d: DataFrame): Set[Seq[Any]] =
    d.collect().map(_.toSeq.map(Option(_).map(_.toString).orNull)).toSet

  private def rebuild(state: DataFrame): DataFrame = IV.withDistinctCount(
    IV.withExtremes(IV.summarize(state, Seq("g"), Seq("m")),
      IV.bootstrapExtremes(state, Seq("g"), "m", 2), Seq("g"), "m"),
    IV.summarize(state, Seq("g", "u"), Nil), Seq("g"), "u")

  private def batchDf(rows: (Long, String, Long, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.map { case (id, g, u, m, ts) =>
      (id, g, u, m, java.sql.Timestamp.valueOf(ts))
    }.toDF("id", "g", "u", "m", "ts")
  }

  test("refreshFromBatch: rebuild-exact per version; LATE rows land; replay + crash converge") {
    val viewPath = TestFixtures.tmpDir("fact-view").resolve("view").toString
    val mv = MaintainedView(viewPath, Nil, Seq("g"), Seq("m"),
      minMaxCol = Some("m"), minMaxK = 2, distinctCol = Some("u"))
    val b0 = batchDf((1L, "a", 10L, 5L, "2024-01-02 10:00:00"),
      (2L, "a", 11L, 9L, "2024-01-02 11:00:00"),
      (3L, "b", 10L, 1L, "2024-01-02 12:00:00"))
    // batch 1 carries a LATE row (Jan 1 — BELOW batch 0's max event time):
    // an HWM refresh would silently drop it; file-tracked batches must not
    val b1 = batchDf((4L, "a", 10L, 2L, "2024-01-01 09:00:00"),
      (5L, "b", 12L, 7L, "2024-01-03 08:00:00"))
    val b2 = batchDf((6L, "c", 13L, 4L, "2024-01-04 10:00:00"))

    FactViewStream.processBatch(spark, b0, 0L, mv)
    assert(rowSet(Snapshots.read(spark, viewPath, 0L)) == rowSet(rebuild(b0)))
    FactViewStream.processBatch(spark, b1, 1L, mv)
    val state01 = b0.unionByName(b1)
    assert(rowSet(Snapshots.read(spark, viewPath, 1L)) == rowSet(rebuild(state01)),
      "the late Jan-1 row must be applied (m_min of group a drops to 2)")
    val aMin = Snapshots.read(spark, viewPath, 1L)
      .filter(F.col("g") === "a").head().getAs[Long]("m_min")
    assert(aMin == 2L, s"late row not applied: m_min = $aMin")

    // crash window: batch 2's auxiliaries commit but the view write dies —
    // simulate by writing the aux sidecars via a full run against a COPY?
    // cheaper: replay semantics — run batch 2 fully, then replay it; the
    // pointer no-ops and the content is unchanged
    FactViewStream.processBatch(spark, b2, 2L, mv)
    val v2 = rowSet(Snapshots.read(spark, viewPath, 2L))
    FactViewStream.processBatch(spark, b2, 2L, mv) // replay
    assert(Snapshots.versions(spark, viewPath) == Seq(0L, 1L, 2L))
    assert(rowSet(Snapshots.read(spark, viewPath, 2L)) == v2)
    assert(v2 == rowSet(rebuild(state01.unionByName(b2))))

    // torn-state crash: version 3's AUX lands but the view doesn't —
    // the replay of epoch 3 must overwrite the torn aux and converge
    val b3 = batchDf((7L, "a", 14L, 100L, "2024-01-05 10:00:00"))
    val tornAux = IV.bootstrapExtremes(b3, Seq("g"), "m", 2) // wrong content on purpose
    Snapshots.writeVersion(tornAux, viewPath + "__aux", 3L)
    FactViewStream.processBatch(spark, b3, 3L, mv)
    val want3 = rowSet(rebuild(state01.unionByName(b2).unionByName(b3)))
    assert(rowSet(Snapshots.read(spark, viewPath, 3L)) == want3,
      "replay over a torn aux must converge to the rebuild")

    // empty batch: no version minted
    assert(IV.refreshFromBatch(spark, b3.limit(0), viewPath, Seq("g"), Seq("m"),
      Some("m"), 2, Some("u"), version = 4L).isEmpty)
    assert(Snapshots.versions(spark, viewPath) == Seq(0L, 1L, 2L, 3L))
  }

  test("FactViewStream follows a fact directory end to end") {
    import spark.implicits._
    val work = TestFixtures.tmpDir("fact-view-stream")
    val factDir = work.resolve("fact")
    java.nio.file.Files.createDirectories(factDir)
    val viewPath = work.resolve("view").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("g", StringType),
      StructField("u", LongType), StructField("m", LongType),
      StructField("ts", TimestampType)))
    val mv = MaintainedView(viewPath, Nil, Seq("g"), Seq("m"),
      minMaxCol = Some("m"), minMaxK = 2, distinctCol = Some("u"))
    def writeFile(rows: Seq[(Long, String, Long, Long, String)]): Unit =
      rows.map { case (id, g, u, m, ts) =>
        (id, g, u, m, java.sql.Timestamp.valueOf(ts))
      }.toDF("id", "g", "u", "m", "ts")
        .coalesce(1).write.mode("append").parquet(factDir.toString)
    writeFile(Seq((1L, "a", 10L, 5L, "2024-01-02 10:00:00"),
      (2L, "b", 11L, 9L, "2024-01-02 11:00:00")))
    writeFile(Seq((3L, "a", 10L, 1L, "2024-01-01 09:00:00"), // late
      (4L, "c", 12L, 7L, "2024-01-03 08:00:00")))
    val q = FactViewStream.start(spark, factDir.toString,
      work.resolve("ckpt").toString, schema, mv,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try q.processAllAvailable() finally q.stop()
    val fact = spark.read.parquet(factDir.toString)
    assert(rowSet(Snapshots.read(spark, viewPath)) == rowSet(rebuild(fact)),
      "streamed view must equal a rebuild over the whole fact")
    assert(fact.count() == 4)
  }
}
