package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.AtomicAppend
import graft.streaming.TableTailStream

/** Streaming FROM a batch table ([[TableTailStream]] — the Delta
  * streaming-source role over the commit log): bootstrap delivers the
  * table as of the first window's end, subsequent windows deliver
  * exactly the new batches (folds silent, late batches whole), the
  * pointer advances only after the sink returns (crash = same window
  * replays), rewrites fail the insert-only tail actionably while the
  * row-level tail consumes them, and a restarted stream resumes from
  * the last fully-processed version.
  */
class TableTailSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("pollOnce: bootstrap, incremental windows, folds silent, idle cheap") {
    import spark.implicits._
    val work = TestFixtures.tmpDir("tail-poll").toString
    val table = s"$work/t"
    val ptr = s"$work/ptr"
    def batch(b: Int) = (0 until 20).map(i => (b * 20L + i, s"b$b")).toDF("id", "tag")
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    def poll() = TableTailStream.pollOnce(spark, table, ptr) {
      (df, _, _) => seen ++= rows(df)
    }
    AtomicAppend.append(batch(0), table, batchId = Some(0L)) // v0
    AtomicAppend.append(batch(1), table, batchId = Some(1L)) // v1
    assert(poll().contains((-1L, 1L))) // bootstrap window
    assert(seen.sorted == rows(batch(0).unionByName(batch(1))))
    assert(poll().isEmpty) // idle
    seen.clear()
    AtomicAppend.compact(spark, table)                       // v2 (fold)
    AtomicAppend.append(batch(2), table, batchId = Some(9L)) // v3
    assert(poll().contains((1L, 3L)))
    assert(seen.sorted == rows(batch(2)), "the fold must contribute nothing")
    assert(TableTailStream.lastApplied(spark, ptr) == 3L)
  }

  test("pollOnce: a failed sink replays the SAME window; rewrites fail the insert-only tail") {
    import spark.implicits._
    val work = TestFixtures.tmpDir("tail-replay").toString
    val table = s"$work/t"
    val ptr = s"$work/ptr"
    def batch(b: Int) = (0 until 10).map(i => (b * 10L + i, s"b$b")).toDF("id", "tag")
    AtomicAppend.append(batch(0), table, batchId = Some(0L)) // v0
    TableTailStream.pollOnce(spark, table, ptr)((_, _, _) => ()) // consume v0
    AtomicAppend.append(batch(1), table, batchId = Some(1L)) // v1
    // the sink dies mid-window: the pointer must NOT advance…
    intercept[RuntimeException](TableTailStream.pollOnce(spark, table, ptr)(
      (_, _, _) => throw new RuntimeException("sink died")))
    assert(TableTailStream.lastApplied(spark, ptr) == 0L)
    // …and the retry replays exactly the same window
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(TableTailStream.pollOnce(spark, table, ptr)(
      (df, _, _) => seen ++= rows(df)).contains((0L, 1L)))
    assert(seen.sorted == rows(batch(1)))

    // an insert-only tail crossing a delete fails actionably; the
    // row-level tail consumes the same window
    AtomicAppend.deleteWhere(spark, table, F.col("id") < 3L) // v2
    val e = intercept[IllegalArgumentException](
      TableTailStream.pollOnce(spark, table, ptr)((_, _, _) => ()))
    assert(e.getMessage.contains("changeFeed"))
    assert(TableTailStream.lastApplied(spark, ptr) == 1L, "a failed window must not commit")
    val types = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(TableTailStream.pollOnce(spark, table, ptr, rowLevel = true) {
      (df, _, _) => types ++= df.select("_change_type").as[String].collect()
    }.contains((1L, 2L)))
    assert(types.distinct.sorted == Seq("delete"))
  }

  test("the standing stream converges and a restart resumes from the pointer") {
    import spark.implicits._
    val work = TestFixtures.tmpDir("tail-stream").toString
    val table = s"$work/t"
    val ckpt = s"$work/ckpt"
    def batch(b: Int) = (0 until 15).map(i => (b * 15L + i, s"b$b")).toDF("id", "tag")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def awaitCount(n: Int, ms: Long = 30000L): Unit = {
      val deadline = System.currentTimeMillis() + ms
      while (seen.size < n && System.currentTimeMillis() < deadline) Thread.sleep(100L)
      assert(seen.size == n, s"expected $n rows tailed, saw ${seen.size}")
    }
    AtomicAppend.append(batch(0), table, batchId = Some(0L))
    val q = TableTailStream.start(spark, table, ckpt,
      trigger = Trigger.ProcessingTime(200L)) { (df, _, _) =>
      df.collect().foreach(r => seen.add(r.toString))
    }
    try {
      awaitCount(15) // bootstrap
      AtomicAppend.append(batch(1), table, batchId = Some(1L))
      AtomicAppend.append(batch(2), table, batchId = Some(2L))
      awaitCount(45)
    } finally q.stop()
    assert(seen.size == 45, "no window may deliver twice")
    // while the stream is down, the table moves on…
    AtomicAppend.compact(spark, table)
    AtomicAppend.append(batch(3), table, batchId = Some(9L))
    // …and the restart resumes from the pointer: only batch 3 arrives
    val q2 = TableTailStream.start(spark, table, ckpt,
      trigger = Trigger.ProcessingTime(200L)) { (df, _, _) =>
      df.collect().foreach(r => seen.add(r.toString))
    }
    try awaitCount(60) finally q2.stop()
    assert(seen.iterator().hasNext)
    val all = (0 until 4).map(batch).reduce(_ unionByName _)
    assert(seen.toArray.map(_.toString).sorted.toSeq == rows(all))
  }
}
