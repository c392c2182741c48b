package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.AtomicAppend

/** MERGE INTO over batch tables (`AtomicAppend.mergeInto` — Delta
  * MERGE's role): the write set is pruned by the source's own keys, the
  * touched set merges in one full-outer reconstruction, and the change
  * feed carries exact pre/post images plus inserts. The contracts
  * pinned here: key-free batches survive by identity; pure inserts
  * degrade to a plain append (insert-only feeds keep working); deletes
  * under `WHEN MATCHED AND cond`; schema evolution null-backfills; an
  * empty source commits nothing; duplicate source keys fail loudly.
  */
class MergeIntoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def target3(path: String): Unit = {
    import spark.implicits._
    def slice(lo: Int, hi: Int, b: Long) = AtomicAppend.append(
      (lo until hi).map(i => (i.toLong, i * 10L, s"r$i")).toDF("id", "score", "tag"),
      path, batchId = Some(b), statsCols = Seq("id"), bloomCols = Seq("id"))
    slice(0, 50, 0L); slice(50, 100, 1L); slice(100, 150, 2L)
  }

  test("upsert rewrites only the batches the source keys can touch") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("mi-basic").toString
    target3(path) // v0..v2, batches {0,1,2} with id zone maps + blooms
    // updates hit ids 60..69 (batch 1 only); inserts land far away
    val src = ((60 until 70).map(i => (i.toLong, i * 1000L, s"u$i")) ++
      (0 until 5).map(i => (9000L + i, i.toLong, s"new$i")))
      .toDF("id", "score", "tag")
    val (replaced, newId) = AtomicAppend.mergeInto(spark, path, src, Seq("id"))
    assert(replaced == Seq(1L), "only the key-covering batch may rewrite")
    assert(newId.contains(3L))
    assert(AtomicAppend.committedIds(spark, path) == Seq(0L, 2L, 3L))
    val expected = (0 until 150).map { i =>
      if (i >= 60 && i < 70) (i.toLong, i * 1000L, s"u$i")
      else (i.toLong, i * 10L, s"r$i")
    } ++ (0 until 5).map(i => (9000L + i, i.toLong, s"new$i"))
    assert(rows(AtomicAppend.read(spark, path)) == rows(expected.toDF("id", "score", "tag")))
    // the merged batch's sidecars carried over: the pruned read still skips
    val (kept, skipped) = AtomicAppend.pruneBatches(spark, path, F.col("id") === 10L)
    assert(skipped.nonEmpty && kept.size < 3)

    // the feed: exact images per change type
    val latest = AtomicAppend.versions(spark, path).last
    val feed = AtomicAppend.changeFeed(spark, path, -1L, latest)
    assert(rows(feed.filter(F.col("_change_type") === "update_preimage")
      .select("id", "score", "tag")) ==
      rows((60 until 70).map(i => (i.toLong, i * 10L, s"r$i")).toDF("id", "score", "tag")))
    assert(rows(feed.filter(F.col("_change_type") === "update_postimage")
      .select("id", "score", "tag")) ==
      rows((60 until 70).map(i => (i.toLong, i * 1000L, s"u$i")).toDF("id", "score", "tag")))
    assert(rows(feed.filter(F.col("_change_type") === "insert")
      .filter(F.col("id") >= 9000L).select("id", "score", "tag")) ==
      rows((0 until 5).map(i => (9000L + i, i.toLong, s"new$i")).toDF("id", "score", "tag")))
    // insert-only consumers fail actionably across the merge
    val e = intercept[IllegalArgumentException](
      AtomicAppend.changesBetween(spark, path, 2L, latest))
    assert(e.getMessage.contains("merge"))
  }

  test("WHEN MATCHED AND cond THEN DELETE drops exactly the condemned rows") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("mi-del").toString
    target3(path)
    val src = (40 until 60).map(i => (i.toLong, -1L, s"x$i")).toDF("id", "score", "tag")
    AtomicAppend.mergeInto(spark, path, src, Seq("id"),
      deleteWhen = Some(F.col("s.score") < 0L && F.col("t.id") % 2L === 0L))
    val expected = (0 until 150).flatMap { i =>
      if (i >= 40 && i < 60)
        if (i % 2 == 0) None else Some((i.toLong, -1L, s"x$i"))
      else Some((i.toLong, i * 10L, s"r$i"))
    }
    assert(rows(AtomicAppend.read(spark, path)) == rows(expected.toDF("id", "score", "tag")))
    val feed = AtomicAppend.changeFeed(spark, path,
      2L, AtomicAppend.versions(spark, path).last)
    assert(rows(feed.filter(F.col("_change_type") === "delete")
      .select("id", "score", "tag")) ==
      rows((40 until 60).filter(_ % 2 == 0)
        .map(i => (i.toLong, i * 10L, s"r$i")).toDF("id", "score", "tag")))
  }

  test("no possible match degrades to a plain append: insert-only feeds keep working") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("mi-insert").toString
    target3(path)
    val src = (0 until 8).map(i => (5000L + i, i.toLong, s"n$i")).toDF("id", "score", "tag")
    val (replaced, newId) = AtomicAppend.mergeInto(spark, path, src, Seq("id"))
    assert(replaced.isEmpty && newId.nonEmpty)
    assert(AtomicAppend.committedIds(spark, path).size == 4)
    // kind is `append`: the INSERT-ONLY feed serves this window fine
    assert(rows(AtomicAppend.changesBetween(spark, path,
      2L, AtomicAppend.versions(spark, path).last)) == rows(src))
    // empty source: nothing committed at all
    val vs = AtomicAppend.versions(spark, path)
    assert(AtomicAppend.mergeInto(spark, path,
      src.filter(F.lit(false)), Seq("id")) == ((Seq.empty, None)))
    assert(AtomicAppend.versions(spark, path) == vs)
  }

  test("schema evolution appends source-only columns with null backfill") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("mi-evolve").toString
    target3(path)
    val src = (60 until 70).map(i => (i.toLong, i * 1000L, s"u$i", i + 7L))
      .toDF("id", "score", "tag", "bonus")
    intercept[IllegalArgumentException](
      AtomicAppend.mergeInto(spark, path, src, Seq("id"))) // refused by default
    AtomicAppend.mergeInto(spark, path, src, Seq("id"), allowSchemaEvolution = true)
    val out = AtomicAppend.read(spark, path)
    assert(out.columns.contains("bonus"))
    assert(out.filter(F.col("bonus").isNotNull).count() == 10)
    assert(out.filter(F.col("id") === 65L).select("bonus").as[Long].head() == 72L)
  }

  test("duplicate source keys fail loudly, not by silent fan-out") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("mi-dup").toString
    target3(path)
    val src = Seq((60L, 1L, "a"), (60L, 2L, "b")).toDF("id", "score", "tag")
    val e = intercept[Exception](
      AtomicAppend.mergeInto(spark, path, src, Seq("id")))
    assert(e.getMessage != null)
    // the failed merge committed nothing
    assert(AtomicAppend.committedIds(spark, path) == Seq(0L, 1L, 2L))
    assert(AtomicAppend.read(spark, path).count() == 150)
  }
}
