package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.AtomicAppend

/** Merge-on-read deletes (`AtomicAppend.deleteWhereMergeOnRead` — Delta
  * deletion vectors' role): a delete that writes POSITIONS, not data.
  * The contracts pinned here: no batch directory is rewritten; every
  * reader masks tombstones (plain, pruned, as-of, feeds); generations
  * accumulate; time travel applies the mask in force AT each version;
  * folds materialize the mask and reset it; vacuum reclaims retired
  * generations; and the row count of a masked read never lies.
  */
class DeletionVectorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def fsOf(path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def batchFiles(path: String): Map[String, Seq[String]] = {
    val f = fsOf(path)
    f.listStatus(new Path(path)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_batch="))
      .map(st => st.getPath.getName ->
        f.listStatus(st.getPath).toSeq.map(s =>
          s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}").sorted)
      .toMap
  }

  test("a MoR delete masks rows without touching a single batch file") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("dv-basic").toString
    def batch(b: Int) = (0 until 50)
      .map(i => (b * 50L + i, (b * 50L + i) % 7L, s"b$b")).toDF("id", "k", "tag")
    AtomicAppend.append(batch(0), path, batchId = Some(0L),
      statsCols = Seq("id")) // v0
    AtomicAppend.append(batch(1), path, batchId = Some(1L),
      statsCols = Seq("id")) // v1
    val before = batchFiles(path)
    val all = batch(0).unionByName(batch(1))

    val n = AtomicAppend.deleteWhereMergeOnRead(spark, path, F.col("k") === 3L) // v2
    assert(n == all.filter(F.col("k") === 3L).count())
    assert(batchFiles(path) == before, "MoR delete must not rewrite batch dirs")
    assert(AtomicAppend.committedIds(spark, path) == Seq(0L, 1L))
    assert(rows(AtomicAppend.read(spark, path)) ==
      rows(all.filter(F.col("k") =!= 3L)))

    // generations accumulate: a second delete masks on top of the first
    val n2 = AtomicAppend.deleteWhereMergeOnRead(spark, path, F.col("k") === 5L) // v3
    assert(n2 == all.filter(F.col("k") === 5L).count())
    assert(rows(AtomicAppend.read(spark, path)) ==
      rows(all.filter(F.col("k") =!= 3L && F.col("k") =!= 5L)))
    // re-deleting the same slice is a no-op: nothing matches, no commit
    assert(AtomicAppend.deleteWhereMergeOnRead(spark, path, F.col("k") === 3L) == 0L)
    assert(AtomicAppend.versions(spark, path) == Seq(0L, 1L, 2L, 3L))

    // the pruned read composes with the mask
    assert(rows(AtomicAppend.read(spark, path, F.col("id") < 50L)) ==
      rows(batch(0).filter(F.col("k") =!= 3L && F.col("k") =!= 5L)))
  }

  test("time travel reconstructs each version under the mask in force THEN") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("dv-asof").toString
    def batch(b: Int) = (0 until 40).map(i => (b * 40L + i, s"b$b")).toDF("id", "tag")
    AtomicAppend.append(batch(0), path, batchId = Some(0L)) // v0
    AtomicAppend.deleteWhereMergeOnRead(spark, path, F.col("id") < 10L) // v1
    AtomicAppend.append(batch(1), path, batchId = Some(1L)) // v2
    AtomicAppend.deleteWhereMergeOnRead(spark, path, F.col("id") >= 70L) // v3
    assert(AtomicAppend.readAsOf(spark, path, 0L).count() == 40)
    assert(rows(AtomicAppend.readAsOf(spark, path, 1L)) ==
      rows(batch(0).filter(F.col("id") >= 10L)))
    assert(AtomicAppend.readAsOf(spark, path, 2L).count() == 70)
    assert(rows(AtomicAppend.readAsOf(spark, path, 3L)) ==
      rows(batch(0).unionByName(batch(1))
        .filter(F.col("id") >= 10L && F.col("id") < 70L)))
    assert(rows(AtomicAppend.read(spark, path)) ==
      rows(AtomicAppend.readAsOf(spark, path, 3L)))
  }

  test("feeds: changeFeed emits the deleted rows; insert slices stay whole; changesBetween refuses") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("dv-feed").toString
    def batch(b: Int) = (0 until 30).map(i => (b * 30L + i, s"b$b")).toDF("id", "tag")
    AtomicAppend.append(batch(0), path, batchId = Some(0L)) // v0
    AtomicAppend.deleteWhereMergeOnRead(spark, path, F.col("id") < 5L) // v1
    AtomicAppend.append(batch(1), path, batchId = Some(1L)) // v2
    val feed = AtomicAppend.changeFeed(spark, path, -1L, 2L)
    // the v0 insert slice is the batch AS APPENDED — the later MoR
    // delete must not mask it (its rows re-arrive as `delete` changes)
    assert(rows(feed.filter(F.col("_change_type") === "insert")
      .select("id", "tag")) == rows(batch(0).unionByName(batch(1))))
    assert(rows(feed.filter(F.col("_change_type") === "delete")
      .select("id", "tag")) == rows(batch(0).filter(F.col("id") < 5L)))
    val e = intercept[IllegalArgumentException](
      AtomicAppend.changesBetween(spark, path, 0L, 2L))
    assert(e.getMessage.contains("mordelete") && e.getMessage.contains("changeFeed"))
  }

  test("folds materialize the mask; vacuum reclaims retired generations") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("dv-fold").toString
    val f = fsOf(path)
    def batch(b: Int) = (0 until 30).map(i => (b * 30L + i, s"b$b")).toDF("id", "tag")
    AtomicAppend.append(batch(0), path, batchId = Some(0L)) // v0
    AtomicAppend.append(batch(1), path, batchId = Some(1L)) // v1
    AtomicAppend.deleteWhereMergeOnRead(spark, path, F.col("id") % 3L === 0L) // v2
    assert(AtomicAppend.dvCurrent(spark, path).contains(0L))
    val expected = batch(0).unionByName(batch(1)).filter(F.col("id") % 3L =!= 0L)

    AtomicAppend.compact(spark, path) // v3: full fold materializes
    assert(AtomicAppend.dvCurrent(spark, path).isEmpty,
      "a full fold must reset the dv pointer")
    assert(rows(AtomicAppend.read(spark, path)) == rows(expected))
    // the folded batch carries the deletions physically: reading its dir
    // raw (no protocol) shows only surviving rows
    val foldedId = AtomicAppend.committedIds(spark, path).head
    assert(spark.read.parquet(s"$path/_batch=$foldedId").count() == expected.count())
    // time travel to the masked version still serves (gen 0 retained by v2)
    assert(rows(AtomicAppend.readAsOf(spark, path, 2L)) == rows(expected))

    // vacuum to current state only: the generation retires with v0..v2
    AtomicAppend.vacuum(spark, path)
    assert(!f.exists(new Path(s"$path/_DV/gen=0")),
      "unreferenced dv generation must be reclaimed")
    assert(rows(AtomicAppend.read(spark, path)) == rows(expected))
  }

  test("a delete after a clearing fold never reuses a retired generation number") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("dv-genmono").toString
    val batch0 = (0 until 30).map(i => (i.toLong, s"t$i")).toDF("id", "tag")
    AtomicAppend.append(batch0, path, batchId = Some(0L))                // v0
    AtomicAppend.deleteWhereMergeOnRead(spark, path, F.col("id") < 5L)   // v1: gen 0
    AtomicAppend.compact(spark, path)                                    // v2: fold, pointer reset
    AtomicAppend.append(batch0.withColumn("id", F.col("id") + 100L),
      path, batchId = Some(9L))                                          // v3
    AtomicAppend.deleteWhereMergeOnRead(spark, path, F.col("id") >= 120L) // v4: must be gen 1
    assert(AtomicAppend.dvCurrent(spark, path).contains(1L),
      "generation numbers must be monotonic across a pointer reset — " +
        "reusing gen 0 would clobber the mask v1 still references")
    // time travel to the pre-fold masked version still sees ITS mask
    assert(rows(AtomicAppend.readAsOf(spark, path, 1L)) ==
      rows(batch0.filter(F.col("id") >= 5L)))
    // and the current state carries only the new mask
    assert(AtomicAppend.read(spark, path).count() == 25 + 20)
  }

  test("CoW rewrites over a live mask do not resurrect masked rows") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("dv-cow").toString
    def batch(b: Int) = (0 until 30).map(i => (b * 30L + i, s"b$b")).toDF("id", "tag")
    AtomicAppend.append(batch(0), path, batchId = Some(0L)) // v0
    AtomicAppend.deleteWhereMergeOnRead(spark, path, F.col("id") < 5L) // v1
    // the CoW update rewrites the touched batch FROM THE MASKED SCAN:
    // tombstoned rows must not come back, and the update must apply
    AtomicAppend.updateWhere(spark, path, F.col("id") >= 25L,
      Map("tag" -> F.lit("hot"))) // v2
    val expected = batch(0).filter(F.col("id") >= 5L)
      .withColumn("tag", F.when(F.col("id") >= 25L, "hot").otherwise(F.col("tag")))
    assert(rows(AtomicAppend.read(spark, path)) == rows(expected))
    // the feed stays exact across the mixed history
    val feed = AtomicAppend.changeFeed(spark, path, -1L, 2L)
    assert(feed.filter(F.col("_change_type") === "delete").count() == 5)
    assert(rows(feed.filter(F.col("_change_type") === "update_preimage")
      .select("id", "tag")) ==
      rows(batch(0).filter(F.col("id") >= 25L)))
  }
}
