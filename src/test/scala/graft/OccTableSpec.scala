package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.{AtomicAppend, OccTable, ProtocolAudit}

/** Multi-writer optimistic concurrency ([[OccTable]] — Delta's
  * optimistic commit protocol role, the one piece the single-maintainer
  * [[AtomicAppend]] contract excluded): racing appenders all land with
  * a linear history; a fold rebases over concurrent appends; a fold
  * whose sources were replaced ABORTS rather than resurrect stale
  * content; the single-maintainer mutators refuse an OCC table; time
  * travel and the insert-only feed interop unchanged.
  */
class OccTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  import spark.implicits._

  private def batch(w: Int, n: Int = 100) =
    (0 until n).map(i => (w * 10000L + i, w.toLong)).toDF("id", "w")

  test("racing appenders: every batch lands, history is linear and contiguous") {
    val path = TestFixtures.tmpDir("occ-race").toString
    OccTable.create(spark, path)
    val writers = 6
    val pool = Executors.newFixedThreadPool(writers)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val results = Await.result(
        Future.sequence((0 until writers).map(w => Future {
          OccTable.append(batch(w), path, statsCols = Seq("id"))
        })), 120.seconds)
      // every writer committed, with distinct batch ids and distinct versions
      assert(results.map(_._1).distinct.size == writers, s"batch-id collision: $results")
      assert(results.map(_._2).distinct.size == writers, s"version collision: $results")
      // the log is contiguous from v0 and each entry adds exactly one batch
      val vs = OccTable.versions(spark, path)
      assert(vs == (0L until writers.toLong), s"non-contiguous history: $vs")
      val hist = AtomicAppend.history(spark, path)
      hist.zipWithIndex.foreach { case ((_, ids), i) =>
        assert(ids.size == i + 1, s"entry $i has ${ids.size} ids") }
      assert(OccTable.read(spark, path).count() == writers * 100L)
      // every version time-travels (interop with the shared log format)
      assert(AtomicAppend.readAsOf(spark, path, 0L).count() == 100L)
      assert(AtomicAppend.readAsOf(spark, path, vs.last).count() == writers * 100L)
      // the insert-only feed derives the exact delta across the window
      assert(AtomicAppend.changesBetween(spark, path, 0L, vs.last).count() ==
        (writers - 1) * 100L)
    } finally pool.shutdown()
  }

  test("appends racing a compactor: all rows survive, the fold rebases") {
    val path = TestFixtures.tmpDir("occ-race-fold").toString
    OccTable.create(spark, path)
    (0 until 3).foreach(w => OccTable.append(batch(w), path))
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val appends = (3 until 6).map(w => Future(OccTable.append(batch(w), path)))
      val fold = Future(OccTable.compact(spark, path))
      val folded = Await.result(fold, 120.seconds)
      Await.result(Future.sequence(appends), 120.seconds)
      assert(folded.nonEmpty, "fold found >=2 batches")
      assert(OccTable.read(spark, path).count() == 600L,
        "a row was lost to the race")
      // the fold's sources are gone from the tip; racing appends' are in
      val tipIds = OccTable.currentIds(spark, path).toSet
      assert(!tipIds.exists(Set(0L, 1L, 2L).contains),
        s"folded sources survived at the tip: $tipIds")
    } finally pool.shutdown()
  }

  test("a fold whose sources were replaced aborts as a true conflict") {
    val path = TestFixtures.tmpDir("occ-conflict").toString
    OccTable.create(spark, path)
    (0 until 3).foreach(w => OccTable.append(batch(w), path))
    val snapshot = OccTable.currentIds(spark, path)
    // a competing fold of the SAME sources wins first...
    val (winnerId, _) = OccTable.foldPrepared(spark, path, snapshot)
    // ...so the stale fold cannot rebase: its sources no longer exist
    val e = intercept[OccTable.ConcurrentCommitException](
      OccTable.foldPrepared(spark, path, snapshot))
    assert(e.getMessage.contains("cannot rebase"), e.getMessage)
    // the loser left no visible debris and the winner's content is whole
    assert(OccTable.currentIds(spark, path) == Seq(winnerId))
    assert(OccTable.read(spark, path).count() == 300L)
    ProtocolAudit.digest(OccTable.read(spark, path)) // scan shape sanity
  }

  test("single-maintainer mutators refuse an OCC table actionably") {
    val path = TestFixtures.tmpDir("occ-guard").toString
    OccTable.create(spark, path)
    OccTable.append(batch(0), path)
    val e = intercept[IllegalArgumentException](
      AtomicAppend.append(batch(1), path))
    assert(e.getMessage.contains("OccTable"), e.getMessage)
    intercept[IllegalArgumentException](AtomicAppend.compact(spark, path))
    intercept[IllegalArgumentException](
      AtomicAppend.deleteWhere(spark, path, F.col("id") > 0L))
  }

  test("occ vacuum reclaims replaced batches, retention keeps time travel") {
    val path = TestFixtures.tmpDir("occ-vacuum").toString
    OccTable.create(spark, path)
    (0 until 3).foreach(w => OccTable.append(batch(w), path))
    val Some((foldedId, foldV)) = OccTable.compact(spark, path)
    // retain 1 extra version: the pre-fold batches stay readable
    assert(OccTable.vacuum(spark, path, retainVersions = 1).isEmpty)
    assert(AtomicAppend.readAsOf(spark, path, foldV - 1).count() == 300L)
    // no retention: replaced batches go, history shrinks to the tip
    val dead = OccTable.vacuum(spark, path)
    assert(dead == Seq(0L, 1L, 2L), s"unexpected reclaim set: $dead")
    assert(OccTable.read(spark, path).count() == 300L)
    assert(OccTable.currentIds(spark, path) == Seq(foldedId))
    intercept[IllegalArgumentException](
      AtomicAppend.readAsOf(spark, path, foldV - 1).count())
  }

  test("occ deleteWhere removes matching rows, rewrites only touched batches") {
    val path = TestFixtures.tmpDir("occ-delete").toString
    OccTable.create(spark, path)
    // disjoint id ranges with zone maps so pruning can prove batches empty
    (0 until 3).foreach(w => OccTable.append(batch(w), path, statsCols = Seq("id")))
    val before = OccTable.currentIds(spark, path)
    val (replaced, replacements, v) = OccTable.deleteWhere(spark, path,
      F.col("id") >= 10000L && F.col("id") < 10040L) // inside writer 1's range only
    assert(replaced.size == 1 && replacements.size == 1, s"($replaced, $replacements)")
    assert(v == OccTable.versions(spark, path).last)
    // untouched batches keep their ids
    assert((before.toSet -- replaced).subsetOf(OccTable.currentIds(spark, path).toSet))
    assert(OccTable.read(spark, path).count() == 260L)
    assert(OccTable.read(spark, path,
      F.col("id") >= 10000L && F.col("id") < 10040L).count() == 0L)
    // a no-match delete is a no-op (nothing committed)
    val (r2, n2, v2) = OccTable.deleteWhere(spark, path, F.col("id") >= 999999L)
    assert(r2.isEmpty && n2.isEmpty && v2 == -1L)
    assert(OccTable.versions(spark, path).last == v)
  }

  test("occ updateWhere transforms matching rows under the same conflict rule") {
    val path = TestFixtures.tmpDir("occ-update").toString
    OccTable.create(spark, path)
    (0 until 2).foreach(w => OccTable.append(batch(w), path, statsCols = Seq("id")))
    val (replaced, replacements, v) = OccTable.updateWhere(spark, path,
      F.col("id") < 5L, Map("w" -> F.lit(99L)))
    assert(replaced == Seq(0L) && replacements.size == 1, s"($replaced, $replacements)")
    assert(v >= 0L)
    val now = OccTable.read(spark, path)
    assert(now.filter(F.col("w") === 99L).count() == 5L)
    assert(now.count() == 200L)
    // history fails the insert-only feed actionably across the rewrite
    intercept[IllegalArgumentException](
      AtomicAppend.changesBetween(spark, path, 0L, v).collect())
    assert(OccTable.describeHistory(spark, path).contains("rewrite"))
  }

  test("occ deleteWhere aborts when ANY commit landed since its snapshot") {
    val path = TestFixtures.tmpDir("occ-delete-conflict").toString
    OccTable.create(spark, path)
    (0 until 2).foreach(w => OccTable.append(batch(w), path, statsCols = Seq("id")))
    val snapshot = OccTable.currentIds(spark, path)
    // even a BLIND APPEND conflicts with a DELETE (Serializable rule:
    // the appended rows were never evaluated by the predicate)
    OccTable.append(batch(2), path, statsCols = Seq("id"))
    val e = intercept[OccTable.ConcurrentCommitException](
      OccTable.deleteWherePrepared(spark, path, F.col("id") < 5L, snapshot))
    assert(e.getMessage.contains("cannot rebase"), e.getMessage)
    // nothing visible changed; no staged debris at the tip
    assert(OccTable.read(spark, path).count() == 300L)
    // the re-run against the fresh tip succeeds
    val (_, _, v) = OccTable.deleteWhere(spark, path, F.col("id") < 5L)
    assert(v >= 0L && OccTable.read(spark, path).count() == 295L)
  }

  test("a table tail streams FROM an occ table while writers race (no loss, no dupes)") {
    // TableTailStream is vlog-driven (versions/changesBetween/readAsOf),
    // so the Delta streaming-source role composes with OCC with zero new
    // code — this pins it: racing appenders + a polling consumer
    // converge to exactly-once delivery across optimistic commits.
    import graft.streaming.TableTailStream
    val work = TestFixtures.tmpDir("occ-tail").toString
    val table = s"$work/t"
    val ptr = s"$work/ptr"
    OccTable.create(spark, table)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def poll() = TableTailStream.pollOnce(spark, table, ptr) {
      (df, _, _) => seen ++= df.select("id").collect().map(_.getLong(0))
    }
    val writers = 4
    val pool = Executors.newFixedThreadPool(writers)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val commits = (0 until writers).map(w => Future(OccTable.append(batch(w), table)))
      // consume while the race is in flight, then drain after it settles
      poll()
      Await.result(Future.sequence(commits), 120.seconds)
      poll(); poll()
      assert(seen.size == writers * 100, s"lost or duplicated rows: ${seen.size}")
      assert(seen.toSet.size == writers * 100, "duplicate delivery")
      assert(TableTailStream.lastApplied(spark, ptr) ==
        OccTable.versions(spark, table).last)
      // an optimistic fold crosses the tail silently
      seen.clear()
      OccTable.compact(spark, table)
      assert(poll().nonEmpty && seen.isEmpty, "a fold must contribute nothing")
    } finally pool.shutdown()
  }

  test("zone maps ride occ appends and folds (pruned reads stay sound)") {
    val path = TestFixtures.tmpDir("occ-stats").toString
    OccTable.create(spark, path)
    (0 until 3).foreach(w => OccTable.append(batch(w), path, statsCols = Seq("id")))
    OccTable.compact(spark, path)
    val got = OccTable.read(spark, path).filter(F.col("id") >= 20000L).count()
    assert(got == 100L)
  }
}
