package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.{AtomicAppend, ProtocolAudit}
import graft.runtime.PointerFile

/** Crash-window guards added for the advice-r14 findings:
  *
  *   - a merge-on-read delete that crashed BETWEEN its `_DV/CURRENT`
  *     flip and its `mordelete` log entry leaves the delete in force but
  *     unlogged; the next commit adopts the moved generation under its
  *     own kind, and both change feeds would silently omit the deleted
  *     rows — they must instead FAIL actionably on the moved generation;
  *   - a RESTORE that crashed between its two pointer flips must not
  *     persist the half-restored state: the `_RESTORE_INTENT` written
  *     before either flip rolls the restore forward at the next mutating
  *     entry point.
  */
class ProtocolHealSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  import spark.implicits._

  private def fsOf(path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  test("feeds fail actionably when a crashed mordelete moved the dv pointer unlogged") {
    val path = TestFixtures.tmpDir("heal-dvmove").toString
    def batch(b: Int) = (0 until 50)
      .map(i => (b * 50L + i, (b * 50 + i).toLong)).toDF("id", "k")
    AtomicAppend.append(batch(0), path, batchId = Some(0L))               // v0
    val n = AtomicAppend.deleteWhereMergeOnRead(spark, path,
      F.col("k") < 5L)                                                    // v1 mordelete@dv=0
    assert(n == 5L)
    // SIMULATE the crash: a new generation lands and the CURRENT pointer
    // flips, but the process dies before logCommit — no mordelete entry
    val f = fsOf(path)
    Seq(("nonexistent-file", 0L)).toDF("__dv_file", "__dv_pos")
      .coalesce(1).write.parquet(s"$path/_DV/gen=1")
    PointerFile.commit(f, new Path(s"$path/_DV/CURRENT"),
      new Path(s"$path/_DV/CURRENT.tmp"), "1")
    // the next append logs the moved generation under kind `append`
    AtomicAppend.append(batch(1), path, batchId = Some(1L))               // v2 append@dv=1
    val latest = AtomicAppend.versions(spark, path).last
    val e1 = intercept[IllegalArgumentException](
      AtomicAppend.changeFeed(spark, path, 1L, latest).collect())
    assert(e1.getMessage.contains("deletion-vector generation moved"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      AtomicAppend.changesBetween(spark, path, 1L, latest).collect())
    assert(e2.getMessage.contains("deletion-vector generation moved"), e2.getMessage)
  }

  test("a stranded restore intent rolls forward at the next mutating entry point") {
    val path = TestFixtures.tmpDir("heal-restore").toString
    def batch(b: Int) = (0 until 50)
      .map(i => (b * 50L + i, (b * 50 + i).toLong)).toDF("id", "k")
    AtomicAppend.append(batch(0), path, batchId = Some(0L))               // v0
    val preDelete = AtomicAppend.versions(spark, path).last
    assert(AtomicAppend.deleteWhereMergeOnRead(spark, path,
      F.col("k") < 10L) == 10L)                                           // v1 mordelete
    assert(AtomicAppend.read(spark, path).count() == 40L)
    // SIMULATE a restore-to-preDelete that crashed after writing its
    // intent but before its pointer flips (for a mordelete-only rollback
    // the manifest flip is a no-op, so the WHOLE restore rides the dv
    // flip — the advice-r14 window)
    val f = fsOf(path)
    PointerFile.commit(f, new Path(s"$path/_RESTORE_INTENT"),
      new Path(s"$path/_RESTORE_INTENT.tmp"), preDelete.toString)
    // the delete is still in force (the mixed state)...
    assert(AtomicAppend.read(spark, path).count() == 40L)
    // ...until the next mutating entry point heals: the append first
    // completes the restore (dv cleared, `restore` entry logged), then
    // commits itself
    AtomicAppend.append(batch(1), path, batchId = Some(1L))
    assert(!f.exists(new Path(s"$path/_RESTORE_INTENT")), "intent not cleared")
    assert(AtomicAppend.read(spark, path).count() == 100L,
      "heal did not roll the restore forward (deleted rows still masked)")
    val hist = AtomicAppend.describeHistory(spark, path)
    assert(hist.contains("restore"), s"no restore entry logged by the heal: $hist")
    // history before the heal stays intact
    assert(AtomicAppend.readAsOf(spark, path, preDelete).count() == 50L)
  }

  test("a completed restore leaves no intent and reads exactly the target version") {
    val path = TestFixtures.tmpDir("heal-restore-clean").toString
    def batch(b: Int) = (0 until 30)
      .map(i => (b * 30L + i, (b * 30 + i).toLong)).toDF("id", "k")
    AtomicAppend.append(batch(0), path, batchId = Some(0L))
    val v0 = AtomicAppend.versions(spark, path).last
    AtomicAppend.deleteWhereMergeOnRead(spark, path, F.col("k") < 3L)
    AtomicAppend.append(batch(1), path, batchId = Some(1L))
    AtomicAppend.restore(spark, path, v0)
    assert(!fsOf(path).exists(new Path(s"$path/_RESTORE_INTENT")))
    assert(ProtocolAudit.digest(AtomicAppend.read(spark, path)) ==
      ProtocolAudit.digest(batch(0).toDF("id", "k")))
  }
}
