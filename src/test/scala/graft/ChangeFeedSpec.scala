package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.{AtomicAppend, IncrementalView, Snapshots}

/** The insert-only change feed over [[AtomicAppend]]'s commit log
  * (`changesBetween` — Delta CDF's role for batch tables) and its IVM
  * consumer ([[IncrementalView.refreshFromTable]]). The headline
  * property: consumption keys on BATCH IDENTITY, not event time, so a
  * late batch — timestamps below everything already consumed — still
  * arrives, closing the HWM adapter's documented blind spot; and fold
  * commits contribute nothing (re-emitting folded rows as inserts is
  * the failure mode the logged commit KIND exists to prevent).
  */
class ChangeFeedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("the feed is exactly the appended rows; folds contribute nothing") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("cf-basic").toString
    def batch(b: Int) = (0 until 50).map(i => (b * 50L + i, s"b$b")).toDF("id", "tag")
    AtomicAppend.append(batch(0), path, batchId = Some(0L)) // version 0
    AtomicAppend.append(batch(1), path, batchId = Some(1L)) // version 1
    assert(rows(AtomicAppend.changesBetween(spark, path, 0, 1)) == rows(batch(1)))
    AtomicAppend.compact(spark, path) // version 2, content-preserving
    AtomicAppend.append(batch(2), path, batchId = Some(9L)) // version 3
    // across the fold: only batch 2's rows — a naive id-diff would
    // re-emit the folded table
    assert(rows(AtomicAppend.changesBetween(spark, path, 1, 3)) == rows(batch(2)))
    // the fold window alone is an EMPTY delta with the table's schema
    val foldOnly = AtomicAppend.changesBetween(spark, path, 1, 2)
    assert(foldOnly.count() == 0 && foldOnly.columns.toSeq == Seq("id", "tag"))
    // full window from the first commit
    assert(rows(AtomicAppend.changesBetween(spark, path, 0, 3)) ==
      rows(batch(1).unionByName(batch(2))))
  }

  test("a compound commit (crash-healed fold) fails actionably, never duplicates") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("cf-compound").toString
    AtomicAppend.append(Seq((1L, "a")).toDF("id", "s"), path, batchId = Some(0L))
    AtomicAppend.append(Seq((2L, "b")).toDF("id", "s"), path, batchId = Some(1L))
    AtomicAppend.compact(spark, path) // version 2: fold into batch 2
    // simulate the crash: the fold's log entry never landed — drop it
    // and roll the pointer back, then append (the heal merges fold+append
    // into one entry that both retires and adds batches)
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    f.delete(new org.apache.hadoop.fs.Path(s"$path/_VLOG/v=2"), false)
    graft.runtime.PointerFile.commit(f,
      new org.apache.hadoop.fs.Path(s"$path/_VLOG/LATEST"),
      new org.apache.hadoop.fs.Path(s"$path/_VLOG/LATEST.tmp"), "1")
    AtomicAppend.append(Seq((3L, "c")).toDF("id", "s"), path, batchId = Some(7L))
    val e = intercept[IllegalArgumentException](
      AtomicAppend.changesBetween(spark, path, 1, 2))
    assert(e.getMessage.contains("compound commit"))
    // current reads are untouched by the compound entry
    assert(AtomicAppend.read(spark, path).count() == 3)
  }

  test("vacuum retention keeps exactly the promised feed windows") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("cf-vacuum").toString
    def batch(b: Int) = (0 until 30).map(i => (b * 30L + i, s"b$b")).toDF("id", "tag")
    AtomicAppend.append(batch(0), path, batchId = Some(0L)) // v0
    AtomicAppend.append(batch(1), path, batchId = Some(1L)) // v1
    AtomicAppend.append(batch(2), path, batchId = Some(2L)) // v2
    AtomicAppend.compact(spark, path)                       // v3: fold {3}
    AtomicAppend.append(batch(3), path, batchId = Some(9L)) // v4: {3,9}
    // retain the newest 2 versions (v3, v4): batches 0,1,2 retire, and
    // with them every version that referenced them
    AtomicAppend.vacuum(spark, path, retainVersions = 2)
    assert(AtomicAppend.versions(spark, path) == Seq(3L, 4L))
    // (i) below retention: a feed from a vacuumed version fails loudly…
    val e = intercept[IllegalArgumentException](
      AtomicAppend.changesBetween(spark, path, 0L, 4L))
    assert(e.getMessage.contains("no committed version 0") ||
      e.getMessage.contains("vacuumed"))
    // (ii) …and the retention boundary is exactly serviceable: the feed
    // from the oldest retained version still works, fold contributing
    // nothing and the post-fold append arriving whole
    assert(rows(AtomicAppend.changesBetween(spark, path, 3L, 4L)) == rows(batch(3)))
    assert(AtomicAppend.readAsOf(spark, path, 3L).count() == 90)
  }

  test("refreshFromTable: late batches land, folds are free, replay is a no-op") {
    import spark.implicits._
    val work = TestFixtures.tmpDir("cf-ivm").toString
    val factPath = s"$work/fact"
    val viewPath = s"$work/view"
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-$day%02d 12:00:00")
    val iv = IncrementalView
    def refresh(v: Long) = iv.refreshFromTable(spark, factPath, viewPath,
      Seq("g"), Seq("v"), minMaxCol = Some("v"), distinctCol = Some("v"),
      version = Some(v))

    AtomicAppend.append(
      (0 until 200).map(i => (ts(10 + i % 3), s"g${i % 4}", i.toLong)).toDF("ts", "g", "v"),
      factPath, batchId = Some(0L))
    assert(refresh(0L).contains(0L))
    AtomicAppend.append(
      (200 until 400).map(i => (ts(20 + i % 3), s"g${i % 4}", i.toLong)).toDF("ts", "g", "v"),
      factPath, batchId = Some(1L))
    assert(refresh(1L).contains(1L))
    // THE LATE BATCH: event times far below everything applied — the HWM
    // adapter is blind to it by contract; the version feed must land it
    AtomicAppend.append(
      (400 until 500).map(i => (ts(1), s"g${i % 4}", i.toLong)).toDF("ts", "g", "v"),
      factPath, batchId = Some(2L))
    assert(refresh(2L).contains(2L))
    val view = rows(Snapshots.read(spark, viewPath).orderBy("g"))
    iv.refreshFromBatch(spark, AtomicAppend.read(spark, factPath),
      s"$work/rebuilt", Seq("g"), Seq("v"), minMaxCol = Some("v"),
      distinctCol = Some("v"), version = 0L)
    assert(view == rows(Snapshots.read(spark, s"$work/rebuilt").orderBy("g")),
      "version-feed view diverged from rebuild (late batch lost?)")

    // a fold-only window: table advances, the view correctly declines
    AtomicAppend.compact(spark, factPath)
    assert(refresh(3L).isEmpty, "fold-only window must not commit")
    // …and the next data-bearing refresh spans the fold
    AtomicAppend.append(Seq((ts(25), "g0", 9999L)).toDF("ts", "g", "v"),
      factPath, batchId = Some(8L))
    assert(refresh(3L).contains(3L))
    assert(Snapshots.read(spark, viewPath)
      .filter(F.col("g") === "g0").head().toSeq.contains(9999L))
    // replay of the committed version: no-op, content unchanged
    val before = rows(Snapshots.read(spark, viewPath))
    assert(refresh(3L).isEmpty)
    assert(rows(Snapshots.read(spark, viewPath)) == before)
  }
}
