package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.AtomicAppend

/** The ROW-LEVEL change data feed (`AtomicAppend.changeFeed` — Delta
  * CDF's `table_changes` role): inserts derive from the commit log,
  * folds emit nothing, and copy-on-write rewrites publish change files
  * (`_CDF/v=<version>`) carrying delete / update_preimage /
  * update_postimage rows, written change-set-sized at rewrite time.
  * The failure modes pinned here are the silent ones: a missing
  * postimage, a preimage taken after the assignment, a fold re-emitted
  * as inserts, a vacuum that keeps a version but drops its change file.
  */
class CdfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("insert/update/delete rows replay with exact pre/post images") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("cdf-basic").toString
    def batch(b: Int) = (0 until 40)
      .map(i => (b * 40L + i, (b * 40L + i) % 7L, s"b$b")).toDF("id", "k", "tag")
    AtomicAppend.append(batch(0), path, batchId = Some(0L)) // v0
    AtomicAppend.append(batch(1), path, batchId = Some(1L)) // v1
    AtomicAppend.updateWhere(spark, path, F.col("k") === 3L,
      Map("tag" -> F.lit("flagged")))                       // v2
    AtomicAppend.deleteWhere(spark, path, F.col("k") === 5L) // v3

    val all = batch(0).unionByName(batch(1))
    val matchedU = all.filter(F.col("k") === 3L)
    val feed = AtomicAppend.changeFeed(spark, path, -1L, 3L).cache()
    try {
      assert(rows(feed.filter(F.col("_change_type") === "insert")
        .select("id", "k", "tag")) == rows(all))
      assert(rows(feed.filter(F.col("_change_type") === "update_preimage")
        .select("id", "k", "tag")) == rows(matchedU))
      assert(rows(feed.filter(F.col("_change_type") === "update_postimage")
        .select("id", "k", "tag")) ==
        rows(matchedU.withColumn("tag", F.lit("flagged"))))
      // the delete ran AFTER the update: its rows carry the updated image
      assert(rows(feed.filter(F.col("_change_type") === "delete")
        .select("id", "k", "tag")) == rows(all.filter(F.col("k") === 5L)))
      // _commit_version pins each slice to its commit
      assert(feed.filter(F.col("_change_type") === "insert")
        .select("_commit_version").distinct().as[Long].collect().sorted.toSeq == Seq(0L, 1L))
      assert(feed.filter(F.col("_change_type") =!= "insert")
        .select("_commit_version").distinct().as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    } finally feed.unpersist()
    // the final table is the feed's net effect
    assert(rows(AtomicAppend.read(spark, path)) == rows(
      all.withColumn("tag",
          F.when(F.col("k") === 3L, "flagged").otherwise(F.col("tag")))
        .filter(F.col("k") =!= 5L)))
  }

  test("folds emit nothing; a fold between rewrites preserves the feed") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("cdf-fold").toString
    def batch(b: Int) = (0 until 30).map(i => (b * 30L + i, s"b$b")).toDF("id", "tag")
    AtomicAppend.append(batch(0), path, batchId = Some(0L)) // v0
    AtomicAppend.deleteWhere(spark, path, F.col("id") < 5L) // v1
    AtomicAppend.compact(spark, path, minBatches = 1)       // v2 (fold)
    AtomicAppend.append(batch(1), path, batchId = Some(9L)) // v3
    val feed = AtomicAppend.changeFeed(spark, path, -1L, 3L)
    assert(feed.filter(F.col("_commit_version") === 2L).count() == 0)
    assert(rows(feed.filter(F.col("_change_type") === "delete")
      .select("id", "tag")) == rows(batch(0).filter(F.col("id") < 5L)))
    assert(rows(feed.filter(F.col("_change_type") === "insert")
      .select("id", "tag")) == rows(batch(0).unionByName(batch(1))))
  }

  test("a rewrite whose predicate matched nothing publishes a valid empty delta") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("cdf-empty").toString
    // no statsCols: the batch is uncertain under any predicate, so the
    // delete rewrites it even though nothing matches
    AtomicAppend.append((0 until 20).map(i => (i.toLong, "x")).toDF("id", "tag"),
      path, batchId = Some(0L))
    AtomicAppend.deleteWhere(spark, path, F.col("id") > 1000L) // v1, empty change set
    val feed = AtomicAppend.changeFeed(spark, path, 0L, 1L)
    assert(feed.count() == 0)
    assert(AtomicAppend.read(spark, path).count() == 20)
  }

  test("vacuum retires change files with their versions; the boundary stays exact") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("cdf-vacuum").toString
    def batch(b: Int) = (0 until 30).map(i => (b * 30L + i, s"b$b")).toDF("id", "tag")
    AtomicAppend.append(batch(0), path, batchId = Some(0L))    // v0: {0}
    AtomicAppend.deleteWhere(spark, path, F.col("id") < 3L)    // v1: rewrite
    AtomicAppend.append(batch(1), path, batchId = Some(5L))    // v2
    AtomicAppend.deleteWhere(spark, path, F.col("id") === 40L) // v3: rewrite
    AtomicAppend.compact(spark, path)                          // v4: fold
    AtomicAppend.append(batch(2), path, batchId = Some(9L))    // v5
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // a vacuum that keeps the rewrite versions keeps their change files:
    // the retained window stays exactly serviceable, rewrites included
    AtomicAppend.vacuum(spark, path, retainVersions = 4) // keep v2..v5
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$path/_CDF/v=3")),
      "retained version's change file must survive")
    val kept = AtomicAppend.changeFeed(spark, path, 2L, 5L)
    assert(rows(kept.filter(F.col("_change_type") === "delete")
      .select("id", "tag")) == rows(batch(1).filter(F.col("id") === 40L)))
    assert(rows(kept.filter(F.col("_change_type") === "insert")
      .select("id", "tag")) == rows(batch(2)))
    // a deeper vacuum retires the rewrite versions AND their change files
    AtomicAppend.vacuum(spark, path, retainVersions = 2) // keep v4, v5
    assert(AtomicAppend.versions(spark, path) == Seq(4L, 5L))
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$path/_CDF/v=1")) &&
      !f.exists(new org.apache.hadoop.fs.Path(s"$path/_CDF/v=3")),
      "retired versions' change files must be reclaimed")
    // full-history replay is now impossible — and says so
    val e = intercept[IllegalArgumentException](
      AtomicAppend.changeFeed(spark, path, -1L, 5L))
    assert(e.getMessage.contains("vacuum"))
    // the surviving boundary still serves: fold emits nothing, append lands
    assert(rows(AtomicAppend.changeFeed(spark, path, 4L, 5L)
      .select("id", "tag")) == rows(batch(2)))
  }

  test("reserved columns and insert-only consumers fail actionably") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("cdf-guard").toString
    AtomicAppend.append(
      (0 until 5).map(i => (i.toLong, s"t$i")).toDF("id", "_change_type"),
      path, batchId = Some(0L))
    val e = intercept[IllegalArgumentException](
      AtomicAppend.deleteWhere(spark, path, F.col("id") === 1L))
    assert(e.getMessage.contains("_change_type"))

    val path2 = TestFixtures.tmpDir("cdf-guard2").toString
    AtomicAppend.append((0 until 5).map(i => (i.toLong, "x")).toDF("id", "tag"),
      path2, batchId = Some(0L))
    AtomicAppend.deleteWhere(spark, path2, F.col("id") === 1L) // v1
    val e2 = intercept[IllegalArgumentException](
      AtomicAppend.changesBetween(spark, path2, 0L, 1L))
    assert(e2.getMessage.contains("changeFeed"),
      "the insert-only feed should point at the row-level feed")
    // …which serves the same window fine
    assert(AtomicAppend.changeFeed(spark, path2, 0L, 1L).count() == 1)
  }

  test("schema evolution across the window null-backfills older slices") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("cdf-evolve").toString
    AtomicAppend.append((0 until 10).map(i => (i.toLong, s"t$i")).toDF("id", "tag"),
      path, batchId = Some(0L)) // v0: narrow
    AtomicAppend.append(
      (10 until 20).map(i => (i.toLong, s"t$i", i * 100L)).toDF("id", "tag", "score"),
      path, batchId = Some(1L)) // v1: + score
    val feed = AtomicAppend.changeFeed(spark, path, -1L, 1L)
    assert(feed.columns.contains("score"))
    assert(feed.filter(F.col("_commit_version") === 0L)
      .filter(F.col("score").isNotNull).count() == 0)
    assert(feed.filter(F.col("_commit_version") === 1L)
      .filter(F.col("score").isNull).count() == 0)
  }
}
