package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.AtomicAppend

class AtomicAppendSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  test("a torn multi-file append is invisible until its marker commits") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("atomic-append").toString
    val b0 = (0 until 1000).map(i => (i.toLong, i % 7)).toDF("id", "g")
    assert(AtomicAppend.append(b0, path, batchId = Some(0L)).contains(0L))
    assert(AtomicAppend.read(spark, path).count() == 1000)

    // simulate the crash window: batch 1's files land (multi-file — 8
    // tasks) but the marker never commits. A bare mode("append") reader
    // would see whatever prefix of the 8 files existed at list time;
    // the committed-marker reader must see NONE of it.
    val torn = (0 until 1000).map(i => (10000L + i, i % 7)).toDF("id", "g").repartition(8)
    torn.write.mode("overwrite").parquet(s"$path/_batch=1")
    assert(AtomicAppend.read(spark, path).count() == 1000, "torn batch leaked to a reader")
    assert(AtomicAppend.committedIds(spark, path) == Seq(0L))

    // the writer's retry overwrites its own directory and commits —
    // now, and only now, the batch is visible, all 1000 rows at once
    assert(AtomicAppend.append(torn, path, batchId = Some(1L)).contains(1L))
    assert(AtomicAppend.read(spark, path).count() == 2000)
    // a replay of a committed batch is a no-op, not a duplicate
    assert(AtomicAppend.append(torn, path, batchId = Some(1L)).isEmpty)
    assert(AtomicAppend.read(spark, path).count() == 2000)
  }

  test("a reader concurrent with multi-file appends only ever sees whole batches") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("atomic-concurrent").toString
    val rows = 2000
    def batch(n: Int) = (0 until rows).map(i => (n * 100000L + i, n)).toDF("id", "b")
      .repartition(8) // 8 files per batch — a wide torn window
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val writer = Future {
      (0 until 5).foreach(n => AtomicAppend.append(batch(n), path, batchId = Some(n.toLong)))
    }(scala.concurrent.ExecutionContext.global)
    try {
      // poll as fast as the reader can while the writer lands 5 × 8 files:
      // every observation must be a multiple of one batch — a torn batch
      // would read as a non-multiple
      var polls = 0
      while (!writer.isCompleted) {
        val n = AtomicAppend.readIfExists(spark, path).map(_.count()).getOrElse(0L)
        assert(n % rows == 0, s"reader saw a torn batch: $n rows")
        polls += 1
      }
      assert(polls > 0, "writer finished before a single poll — widen the batches")
    } finally Await.result(writer, Duration.Inf)
    assert(AtomicAppend.read(spark, path).count() == 5L * rows)
  }

  test("compact folds batches atomically; appends keep working; vacuum clears replaced dirs") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("atomic-compact").toString
    def batch(n: Int) = (0 until 500).map(i => (n * 10000L + i, n)).toDF("id", "b")
    (0 until 4).foreach(n => AtomicAppend.append(batch(n), path, batchId = Some(n.toLong)))
    val before = AtomicAppend.read(spark, path).collect().map(_.toSeq).toSet
    val folded = AtomicAppend.compact(spark, path)
    assert(folded.contains(4L))
    // exactly the same rows, now one live batch; ids resolve via manifest
    assert(AtomicAppend.read(spark, path).collect().map(_.toSeq).toSet == before)
    assert(AtomicAppend.committedIds(spark, path) == Seq(4L))
    // a reader that listed the manifest BEFORE the flip can still scan the
    // replaced dirs until vacuum; after vacuum only the folded dir remains
    assert(AtomicAppend.vacuum(spark, path).toSet == Set(0L, 1L, 2L, 3L))
    assert(AtomicAppend.read(spark, path).collect().map(_.toSeq).toSet == before)
    // appends on a manifest table stay atomic and auto-id past the fold
    assert(AtomicAppend.append(batch(9), path).contains(5L))
    assert(AtomicAppend.read(spark, path).count() == 2500)
    assert(AtomicAppend.committedIds(spark, path) == Seq(4L, 5L))
    // a second compact folds the manifest world too
    assert(AtomicAppend.compact(spark, path).contains(6L))
    assert(AtomicAppend.read(spark, path).count() == 2500)
    // below the threshold: no-op
    assert(AtomicAppend.compact(spark, path).isEmpty)
  }

  test("crashed compact leaves the old state live; crashed append flip heals on replay") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("atomic-crash").toString
    def batch(n: Int) = (0 until 300).map(i => (n * 10000L + i, n)).toDF("id", "b")
    (0 until 2).foreach(n => AtomicAppend.append(batch(n), path, batchId = Some(n.toLong)))
    // simulate a compact that wrote its folded dir but crashed BEFORE the
    // manifest flip: an unmarked _batch=2 with the union of 0 and 1
    AtomicAppend.read(spark, path).write.mode("overwrite").parquet(s"$path/_batch=2")
    assert(AtomicAppend.read(spark, path).count() == 600, "debris leaked to readers")
    assert(AtomicAppend.committedIds(spark, path) == Seq(0L, 1L))
    // the retry allocates ABOVE the debris (ids are never reused once a
    // dir exists on disk — the same rule that protects retired history
    // dirs, see IdReuseSpec); the stranded dir stays invisible until
    // vacuum reclaims it
    assert(AtomicAppend.compact(spark, path).contains(3L))
    assert(AtomicAppend.read(spark, path).count() == 600)
    assert(AtomicAppend.vacuum(spark, path).contains(2L), "debris not reclaimed")

    // crash window between an append's marker and its manifest flip:
    // write the dir + marker by hand (manifest untouched) — invisible —
    // then the replayed append heals the visibility exactly once
    batch(7).write.mode("overwrite").parquet(s"$path/_batch=4")
    val fsP = new org.apache.hadoop.fs.Path(s"$path/_batch=4/_COMMITTED")
    fsP.getFileSystem(spark.sessionState.newHadoopConf()).create(fsP, true).close()
    assert(AtomicAppend.read(spark, path).count() == 600, "half-flipped append leaked")
    assert(AtomicAppend.append(batch(7), path, batchId = Some(4L)).contains(4L))
    assert(AtomicAppend.read(spark, path).count() == 900)
    assert(AtomicAppend.append(batch(7), path, batchId = Some(4L)).isEmpty, "replay after heal")
    assert(AtomicAppend.read(spark, path).count() == 900)
  }

  test("appendAll ≡ sequential appends: content, commit history, sidecars, replay") {
    import spark.implicits._
    val seqPath = TestFixtures.tmpDir("appendall-seq").toString
    val allPath = TestFixtures.tmpDir("appendall-par").toString
    def slice(n: Int) = (0 until 500).map(i => (n * 1000L + i, (i % 9).toLong))
      .toDF("id", "v")

    (0 until 3).foreach(n => AtomicAppend.append(slice(n), seqPath,
      batchId = Some(n.toLong), statsCols = Seq("v"), bloomCols = Seq("id")))
    val out = AtomicAppend.appendAll(allPath,
      (0 until 3).map(n => (slice(n), n.toLong)),
      statsCols = Seq("v"), bloomCols = Seq("id"))
    assert(out == Seq(Some(0L), Some(1L), Some(2L)))

    // identical content, batch set, and one-version-per-batch history
    assert(AtomicAppend.read(spark, allPath).orderBy("id").collect().toSeq
      == AtomicAppend.read(spark, seqPath).orderBy("id").collect().toSeq)
    assert(AtomicAppend.committedIds(spark, allPath)
      == AtomicAppend.committedIds(spark, seqPath))
    assert(AtomicAppend.versions(spark, allPath)
      == AtomicAppend.versions(spark, seqPath))
    (0L to 2L).foreach { v =>
      assert(AtomicAppend.readAsOf(spark, allPath, v).count()
        == AtomicAppend.readAsOf(spark, seqPath, v).count(),
        s"time travel to version $v diverges")
    }
    // zone maps and blooms landed for every batch — pruning still bites
    val fsys = new org.apache.hadoop.fs.Path(allPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    (0 to 2).foreach { n =>
      val dir = new org.apache.hadoop.fs.Path(s"$allPath/_batch=$n")
      assert(graft.layers.BatchStats.read(fsys, dir).isDefined, s"no stats on batch $n")
      assert(graft.layers.BatchBloom.readNames(fsys, dir).contains("id"),
        s"no bloom on batch $n")
    }
    // keyed read opens only the batch whose stats/bloom say "might match"
    assert(AtomicAppend.read(spark, allPath, F.col("id") === 1042L).count() == 1L)

    // a full replay is a no-op per batch; a partial replay (one new id)
    // commits exactly the new batch — append's heal discipline
    assert(AtomicAppend.appendAll(allPath,
      (0 until 3).map(n => (slice(n), n.toLong)),
      statsCols = Seq("v"), bloomCols = Seq("id")) == Seq(None, None, None))
    assert(AtomicAppend.read(spark, allPath).count() == 1500)
    assert(AtomicAppend.appendAll(allPath, Seq((slice(1), 1L), (slice(3), 3L)),
      statsCols = Seq("v"), bloomCols = Seq("id")) == Seq(None, Some(3L)))
    assert(AtomicAppend.read(spark, allPath).count() == 2000)
    assert(AtomicAppend.versions(spark, allPath).size
      == AtomicAppend.versions(spark, seqPath).size + 1)
  }

  test("silver layer writes/reads through the atomic batch discipline") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("atomic-silver").toString
    val df = (0 until 100).map { i =>
      (s"T_$i", java.sql.Timestamp.valueOf(f"2024-03-${1 + i % 9}%02d 10:00:00"),
        2024, 3, 1 + i % 9)
    }.toDF("trans_num", "trans_timestamp", "year", "month", "day")
    graft.layers.Silver.write(df, path, batchId = Some(0L))
    val back = graft.layers.Silver.read(spark, path)
    assert(back.count() == 100)
    // y/m/d partition pruning still reaches the scan inside batch dirs
    val pruned = back.filter(F.col("day") === 3)
    assert(pruned.count() == df.filter(F.col("day") === 3).count())
    val scan = pruned.queryExecution.executedPlan.toString
    assert(back.columns.contains("day"), "partition columns must survive the batch layout")
    assert(scan.nonEmpty)
  }
}
