package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.{AtomicAppend, ProtocolAudit}

/** Batch-id allocation must never reuse an id that retained history
  * still references (advice-r14 high): after a DELETE empties the
  * HIGHEST live batch, the retired `_batch=` dir stays on disk for time
  * travel — an allocator computing `live.max + 1` would land ON that
  * retired id, treat the committed dir as its own crashed debris, and
  * destroy/replace historical content, so readAsOf / restore / the
  * change feed would silently serve the new rows for old versions.
  * These tests pin that every allocation site (append auto-id, fold,
  * clustered fold, rewrite, merge) allocates ABOVE retired ids and that
  * history stays byte-identical across the operation.
  */
class IdReuseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  import spark.implicits._

  /** Three stats'd batches with disjoint k-ranges (k in [0,100),
    * [100,200), [200,300)), then DELETE all of batch 2 — the highest
    * id retires with no replacement and its dir stays on disk.
    */
  private def retiredTopTable(name: String): (String, DataFrame, Long) = {
    val path = TestFixtures.tmpDir(name).toString
    def batch(b: Int) = (0 until 100)
      .map(i => (b * 100L + i, (b * 100 + i).toLong, s"t${i % 4}"))
      .toDF("id", "k", "tag")
    (0 to 2).foreach(b => AtomicAppend.append(batch(b), path,
      batchId = Some(b.toLong), statsCols = Seq("k")))
    val preDeleteVersion = AtomicAppend.versions(spark, path).last
    val (replaced, replacements) =
      AtomicAppend.deleteWhere(spark, path, F.col("k") >= 200L)
    assert(replaced == Seq(2L) && replacements.isEmpty,
      "fixture: the delete must retire batch 2 with no replacement")
    assert(AtomicAppend.committedIds(spark, path) == Seq(0L, 1L))
    (path, batch(0).unionByName(batch(1)).unionByName(batch(2)), preDeleteVersion)
  }

  test("append auto-id allocates above a retired top id (no silent resurrection)") {
    val (path, _, _) = retiredTopTable("idreuse-append")
    // live.max+1 == 2 == the retired id; the auto-append must NOT adopt
    // the retired dir's content as its own
    val extra = Seq((900L, 900L, "x")).toDF("id", "k", "tag")
    val id = AtomicAppend.append(extra, path)
    assert(id.exists(_ >= 3L), s"auto id reused a retired id: $id")
    // the append added exactly one row — not batch 2's hundred
    assert(AtomicAppend.read(spark, path).count() == 201L)
  }

  test("fold allocates above a retired top id and history survives byte-identical") {
    val (path, all, preDelete) = retiredTopTable("idreuse-fold")
    val folded = AtomicAppend.compact(spark, path)
    assert(folded.exists(_ >= 3L), s"fold reused a retired id: $folded")
    // the pre-delete version still reads the ORIGINAL 300 rows
    ProtocolAudit.assertTableContent(spark, path,
      AtomicAppend.read(spark, path), "idreuse-fold-now")
    val asOf = AtomicAppend.readAsOf(spark, path, preDelete)
    assert(asOf.count() == 300L, "time travel lost the retired batch's rows")
    ProtocolAudit.digest(asOf) // shape-checks the scan
    assert(ProtocolAudit.digest(asOf) == ProtocolAudit.digest(all),
      "pre-delete version content drifted across the fold")
  }

  test("clustered fold allocates above a retired top id") {
    val (path, all, preDelete) = retiredTopTable("idreuse-zfold")
    val ids = AtomicAppend.compactClustered(spark, path, Seq("k"),
      numBatches = 4, statsCols = Seq("k"))
    assert(ids.exists(_.forall(_ >= 3L)), s"clustered fold reused a retired id: $ids")
    assert(ProtocolAudit.digest(AtomicAppend.readAsOf(spark, path, preDelete)) ==
      ProtocolAudit.digest(all), "pre-delete version content drifted")
  }

  test("mergeInto allocates above a retired top id") {
    val (path, all, preDelete) = retiredTopTable("idreuse-merge")
    val src = Seq((5L, 5000L, "upd"), (901L, 901L, "new")).toDF("id", "k", "tag")
    val (touched, newId) = AtomicAppend.mergeInto(spark, path, src, Seq("id"))
    assert(newId.exists(_ >= 3L), s"merge reused a retired id: $newId")
    assert(touched.nonEmpty)
    assert(ProtocolAudit.digest(AtomicAppend.readAsOf(spark, path, preDelete)) ==
      ProtocolAudit.digest(all), "pre-delete version content drifted")
    val now = AtomicAppend.read(spark, path)
    assert(now.filter(F.col("id") === 5L && F.col("k") === 5000L).count() == 1L)
    assert(now.filter(F.col("id") === 901L).count() == 1L)
  }

  test("a second rewrite allocates above a retired top id") {
    val (path, all, preDelete) = retiredTopTable("idreuse-rewrite")
    val (replaced, replacements) = AtomicAppend.updateWhere(spark, path,
      F.col("k") >= 150L && F.col("k") < 160L, Map("tag" -> F.lit("flagged")))
    assert(replaced == Seq(1L))
    assert(replacements.forall(_ >= 3L), s"rewrite reused a retired id: $replacements")
    assert(ProtocolAudit.digest(AtomicAppend.readAsOf(spark, path, preDelete)) ==
      ProtocolAudit.digest(all), "pre-delete version content drifted")
  }
}
