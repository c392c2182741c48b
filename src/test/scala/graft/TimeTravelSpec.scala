package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.AtomicAppend

/** Time travel over [[AtomicAppend]] tables (`_VLOG` commit log +
  * `readAsOf` — Delta's `VERSION AS OF` role): every visibility commit
  * (append, compact, clustered fold) logs the live batch set as an
  * immutable version; replaced dirs stay on disk until [[vacuum]], whose
  * `retainVersions` dial bounds how far back reads stay serviceable.
  */
class TimeTravelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("each append is a readable version; compact adds one without losing the past") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("tt-basic").toString
    val states = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    (0 until 3).foreach { b =>
      AtomicAppend.append((0 until 100).map(i => (b * 100L + i, s"b$b")).toDF("id", "b"),
        path, batchId = Some(b.toLong))
      states += rows(AtomicAppend.read(spark, path))
    }
    assert(AtomicAppend.versions(spark, path) == Seq(0L, 1L, 2L))
    (0 until 3).foreach { v =>
      assert(rows(AtomicAppend.readAsOf(spark, path, v)) == states(v),
        s"version $v diverged from the state the table held at commit $v")
    }
    // compact: version 3, same content as version 2; version 0 still
    // reads the original single batch
    assert(AtomicAppend.compact(spark, path).isDefined)
    assert(AtomicAppend.versions(spark, path) == Seq(0L, 1L, 2L, 3L))
    assert(rows(AtomicAppend.readAsOf(spark, path, 3)) == states(2))
    assert(rows(AtomicAppend.readAsOf(spark, path, 0)) == states(0))
    assert(AtomicAppend.history(spark, path).last._2.size == 1, "fold should be one batch")
    // an unknown version fails actionably
    val e = intercept[IllegalArgumentException](AtomicAppend.readAsOf(spark, path, 99))
    assert(e.getMessage.contains("no committed version"))
  }

  test("vacuum retention: retained versions stay readable, older ones retire") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("tt-vacuum").toString
    (0 until 3).foreach { b =>
      AtomicAppend.append(Seq((b.toLong, s"v$b")).toDF("id", "s"), path,
        batchId = Some(b.toLong))
    }
    val preFold = rows(AtomicAppend.read(spark, path))
    AtomicAppend.compact(spark, path) // version 3 (manifest table now)
    AtomicAppend.append(Seq((99L, "post")).toDF("id", "s"), path, batchId = Some(9L)) // v4
    // retain the last 2 versions: v3 (the fold) and v4
    val dead = AtomicAppend.vacuum(spark, path, retainVersions = 2)
    assert(dead == Seq(0L, 1L, 2L), s"vacuum removed $dead")
    assert(AtomicAppend.versions(spark, path) == Seq(3L, 4L),
      "retired versions must leave the log")
    assert(rows(AtomicAppend.readAsOf(spark, path, 3)) == preFold)
    assert(rows(AtomicAppend.readAsOf(spark, path, 4)) ==
      rows(AtomicAppend.read(spark, path)))
    // default vacuum (retain 0) now removes nothing more — the fold and
    // the live append are both current
    assert(AtomicAppend.vacuum(spark, path).isEmpty)
  }

  test("a crash between the visibility commit and the log entry self-heals") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("tt-heal").toString
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def pin(v: Long): Unit = graft.runtime.PointerFile.commit(f,
      new org.apache.hadoop.fs.Path(s"$path/_VLOG/LATEST"),
      new org.apache.hadoop.fs.Path(s"$path/_VLOG/LATEST.tmp"), v.toString)
    AtomicAppend.append(Seq(1L).toDF("v"), path, batchId = Some(0L))
    AtomicAppend.append(Seq(2L).toDF("v"), path, batchId = Some(1L))
    // window (a): the commit landed but logCommit never ran at all —
    // entry gone, pointer back at the previous version
    f.delete(new org.apache.hadoop.fs.Path(s"$path/_VLOG/v=1"), false)
    pin(0L)
    assert(AtomicAppend.versions(spark, path) == Seq(0L))
    // the replay (idempotent no-op for content) heals the log
    assert(AtomicAppend.append(Seq(2L).toDF("v"), path, batchId = Some(1L)).isEmpty)
    assert(AtomicAppend.versions(spark, path) == Seq(0L, 1L))
    assert(rows(AtomicAppend.readAsOf(spark, path, 1)) ==
      rows(AtomicAppend.read(spark, path)))
    // window (b): the entry landed but the LATEST pointer flip didn't —
    // the replay overwrites the orphan entry and completes the flip
    pin(0L)
    assert(AtomicAppend.append(Seq(2L).toDF("v"), path, batchId = Some(1L)).isEmpty)
    assert(AtomicAppend.versions(spark, path) == Seq(0L, 1L))
    assert(rows(AtomicAppend.readAsOf(spark, path, 1)) ==
      rows(AtomicAppend.read(spark, path)))
    // and a replay with the log already whole writes nothing new
    assert(AtomicAppend.append(Seq(2L).toDF("v"), path, batchId = Some(1L)).isEmpty)
    assert(AtomicAppend.versions(spark, path) == Seq(0L, 1L))
  }

  test("clustered folds version too; as-of reads pass through sidecar pruning") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("tt-zfold").toString
    val rnd = new scala.util.Random(5)
    (0 until 2).foreach { b =>
      val df = (0 until 500).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
        .toDF("x", "y")
      AtomicAppend.append(df, path, batchId = Some(b.toLong), statsCols = Seq("x", "y"))
    }
    val preFold = rows(AtomicAppend.read(spark, path))
    val ids = AtomicAppend.compactClustered(spark, path, Seq("x", "y"), 8,
      statsCols = Seq("x", "y"))
    assert(ids.isDefined)
    assert(AtomicAppend.versions(spark, path) == Seq(0L, 1L, 2L))
    assert(rows(AtomicAppend.readAsOf(spark, path, 1)) == preFold)
    assert(rows(AtomicAppend.readAsOf(spark, path, 2)) == preFold)
    // the current read still prunes through the fold's zone maps
    val (kept, skipped) = AtomicAppend.pruneBatches(spark, path,
      F.col("x") < 100L && F.col("y") < 100L)
    assert(skipped.size > kept.size)
  }
}
