package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.{AtomicAppend, BatchStats, ProtocolAudit}

/** Copy-on-write DELETE/UPDATE for atomic batch tables
  * ([[AtomicAppend.deleteWhere]] / [[AtomicAppend.updateWhere]] — Delta
  * DELETE/UPDATE's role): the write set is decided by the SAME zone-map
  * pruning that serves reads, so a selective predicate rewrites only
  * the matching batches; visibility flips once; insert-only feeds fail
  * actionably across a rewrite; time travel and vacuum compose.
  */
class RewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  import spark.implicits._

  /** Three stats'd batches with DISJOINT k-ranges so pruning can prove
    * untouched batches empty: k in [0,100), [100,200), [200,300).
    */
  private def build(path: String): DataFrame = {
    def batch(b: Int) = (0 until 100)
      .map(i => (b * 100L + i, (b * 100 + i).toLong, s"t${i % 4}"))
      .toDF("id", "k", "tag")
    (0 to 2).foreach(b => AtomicAppend.append(batch(b), path,
      batchId = Some(b.toLong), statsCols = Seq("k")))
    batch(0).unionByName(batch(1)).unionByName(batch(2))
  }

  test("deleteWhere removes exactly the matching rows and rewrites only provably-touched batches") {
    val path = TestFixtures.tmpDir("rw-delete").toString
    val all = build(path)
    val pred = F.col("k") >= 120L && F.col("k") < 180L // inside batch 1 only
    val (replaced, replacements) = AtomicAppend.deleteWhere(spark, path, pred)
    assert(replaced == Seq(1L), s"only batch 1 intersects the range: $replaced")
    assert(replacements.size == 1)
    // batches 0 and 2 keep their ORIGINAL ids — their dirs were never touched
    assert(AtomicAppend.committedIds(spark, path).toSet == Set(0L, 2L, replacements.head))
    ProtocolAudit.assertTableContent(spark, path,
      all.filter(!(F.col("k") >= 120L && F.col("k") < 180L)), "rw-delete")
    // the replacement's zone map is recomputed: the pruned read still skips soundly
    ProtocolAudit.assertPrunedReadSound(spark, path, F.col("k") >= 150L, "rw-delete")
    val stats = BatchStats.read(
      new Path(path).getFileSystem(spark.sessionState.newHadoopConf()),
      new Path(s"$path/_batch=${replacements.head}"))
    assert(stats.nonEmpty && stats.get.rows == 40, "replacement zone map missing or stale")
  }

  test("a delete that empties a batch drops its id; a no-match delete touches nothing") {
    val path = TestFixtures.tmpDir("rw-empty").toString
    val all = build(path)
    val (replaced, replacements) =
      AtomicAppend.deleteWhere(spark, path, F.col("k") >= 200L) // all of batch 2
    assert(replaced == Seq(2L) && replacements.isEmpty,
      "an emptied batch must drop from the manifest, not persist as an empty dir")
    assert(AtomicAppend.committedIds(spark, path) == Seq(0L, 1L))
    ProtocolAudit.assertTableContent(spark, path, all.filter(F.col("k") < 200L), "rw-empty")
    // provably-no-match: zone maps prove k<0 empty everywhere — zero rewrites
    assert(AtomicAppend.deleteWhere(spark, path, F.col("k") < 0L) == ((Seq(), Seq())))
    assert(AtomicAppend.committedIds(spark, path) == Seq(0L, 1L))
  }

  test("updateWhere transforms matching rows in place; NULL predicate rows pass through") {
    val path = TestFixtures.tmpDir("rw-update").toString
    // k == id except every id%10==3 carries NULL (the SQL-semantics probe)
    def batch(b: Int) = (0 until 50).map(i => (b * 50L + i, 1L)).toDF("id", "v")
      .withColumn("k", F.when(F.col("id") % 10 === 3, F.lit(null).cast("long"))
        .otherwise(F.col("id")))
    (0 to 1).foreach(b => AtomicAppend.append(batch(b), path, batchId = Some(b.toLong)))
    val all = batch(0).unionByName(batch(1))
    AtomicAppend.updateWhere(spark, path, F.col("k") >= 25L && F.col("k") < 75L,
      Map("v" -> (F.col("v") + 100L)))
    // SQL UPDATE semantics: TRUE rows change; FALSE and NULL-k rows don't
    val expected = all.select(F.col("id"), F.col("k"),
      F.when(F.coalesce(F.col("k") >= 25L && F.col("k") < 75L, F.lit(false)),
        F.col("v") + 100L).otherwise(F.col("v")).as("v"))
    ProtocolAudit.assertTableContent(spark, path, expected, "rw-update")
    // ids 25..74 minus the five NULL-k ids (33,43,53,63,73) = 45 updated
    assert(AtomicAppend.read(spark, path).filter(F.col("v") === 101L).count() == 45)
  }

  test("the feed fails actionably across a rewrite; time travel and vacuum compose") {
    val path = TestFixtures.tmpDir("rw-feed").toString
    val all = build(path) // v0, v1, v2
    AtomicAppend.deleteWhere(spark, path, F.col("k") < 50L) // v3: rewrite
    AtomicAppend.append((900 until 950).map(i => (i.toLong, i.toLong, "t9"))
      .toDF("id", "k", "tag"), path, batchId = Some(9L)) // v4
    // a window crossing the rewrite cannot be an insert-only delta
    val e = intercept[IllegalArgumentException](
      AtomicAppend.changesBetween(spark, path, 0L, 4L))
    assert(e.getMessage.contains("rewrite"))
    // …but a post-rewrite window works
    assert(AtomicAppend.changesBetween(spark, path, 3L, 4L).count() == 50)
    // time travel: the pre-delete state is intact until vacuumed
    assert(AtomicAppend.readAsOf(spark, path, 2L).count() == 300)
    assert(AtomicAppend.read(spark, path).count() == 300) // 300 - 50 + 50
    val dead = AtomicAppend.vacuum(spark, path)
    assert(dead.contains(0L), s"the rewritten batch dir must be reclaimed: $dead")
    ProtocolAudit.assertTableContent(spark, path,
      all.filter(F.col("k") >= 50L).unionByName(
        (900 until 950).map(i => (i.toLong, i.toLong, "t9")).toDF("id", "k", "tag")),
      "rw-feed")
  }

  test("rewrites preserve a partitioned table's layout") {
    val path = TestFixtures.tmpDir("rw-part").toString
    def batch(b: Int) = (0 until 60)
      .map(i => (b * 60L + i, s"p${i % 3}", (b * 60 + i).toLong)).toDF("id", "p", "k")
    (0 to 1).foreach(b => AtomicAppend.append(batch(b), path,
      partitionBy = Seq("p"), batchId = Some(b.toLong), statsCols = Seq("k")))
    AtomicAppend.deleteWhere(spark, path, F.col("k") < 30L) // touches batch 0 only
    val back = AtomicAppend.read(spark, path)
    assert(back.count() == 90)
    assert(back.columns.contains("p"), "partition column lost by the rewrite")
    // the replacement dir is physically partitioned like the original
    val f = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val newId = AtomicAppend.committedIds(spark, path).max
    val subdirs = f.listStatus(new Path(s"$path/_batch=$newId"))
      .filter(_.isDirectory).map(_.getPath.getName).filter(_.startsWith("p=")).sorted
    assert(subdirs.sameElements(Array("p=p0", "p=p1", "p=p2")),
      s"replacement lost the partition layout: ${subdirs.mkString(",")}")
    // partition pushdown still reaches the scan after the rewrite
    assert(back.filter(F.col("p") === "p1").count() == 30)
  }
}
