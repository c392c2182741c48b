package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.AtomicAppend

/** RESTORE (metadata-only rollback to a committed version, Delta
  * `RESTORE TABLE … TO VERSION AS OF`'s role) and CHECK constraints
  * (Delta `ADD CONSTRAINT … CHECK`'s role, enforced at zero extra cost
  * through the write job's observation). The contracts: restore moves
  * no data and commits forward; a restore re-points the deletion-vector
  * mask too; feeds refuse a restore actionably; constraints validate
  * existing data on add, reject violating appends/updates/merges with
  * the batch never visible, and pass NULLs (SQL CHECK semantics).
  */
class RestoreConstraintSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("restore is a metadata-only rollback that commits forward") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("rst-basic").toString
    def batch(b: Int) = (0 until 30).map(i => (b * 30L + i, s"b$b")).toDF("id", "tag")
    AtomicAppend.append(batch(0), path, batchId = Some(0L)) // v0
    AtomicAppend.append(batch(1), path, batchId = Some(1L)) // v1
    AtomicAppend.deleteWhere(spark, path, F.col("id") < 10L) // v2 (rewrite)
    assert(AtomicAppend.read(spark, path).count() == 50)
    val v = AtomicAppend.restore(spark, path, 1L)            // v3
    assert(v == 3L)
    assert(rows(AtomicAppend.read(spark, path)) ==
      rows(batch(0).unionByName(batch(1))))
    // history moved FORWARD: the rolled-back rewrite is still auditable
    assert(AtomicAppend.versions(spark, path) == Seq(0L, 1L, 2L, 3L))
    assert(AtomicAppend.readAsOf(spark, path, 2L).count() == 50)
    // feeds refuse the restore version actionably
    val e = intercept[IllegalArgumentException](
      AtomicAppend.changeFeed(spark, path, 2L, 3L))
    assert(e.getMessage.contains("restore"))
    // a vacuumed target fails actionably
    AtomicAppend.vacuum(spark, path) // retains only current {0,1}
    val e2 = intercept[IllegalArgumentException](
      AtomicAppend.restore(spark, path, 2L))
    assert(e2.getMessage.contains("vacuum") ||
      e2.getMessage.contains("no committed version"))
  }

  test("restore re-points the deletion-vector mask in force at the target") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("rst-dv").toString
    val batch0 = (0 until 40).map(i => (i.toLong, s"t$i")).toDF("id", "tag")
    AtomicAppend.append(batch0, path, batchId = Some(0L))              // v0
    AtomicAppend.deleteWhereMergeOnRead(spark, path, F.col("id") < 10L) // v1 (gen 0)
    AtomicAppend.deleteWhereMergeOnRead(spark, path, F.col("id") >= 35L) // v2 (gen 1)
    assert(AtomicAppend.read(spark, path).count() == 25)
    // back to the one-delete state: gen 0 must be in force again
    AtomicAppend.restore(spark, path, 1L) // v3
    assert(AtomicAppend.dvCurrent(spark, path).contains(0L))
    assert(rows(AtomicAppend.read(spark, path)) ==
      rows(batch0.filter(F.col("id") >= 10L)))
    // and back to the pristine state: the mask clears entirely
    AtomicAppend.restore(spark, path, 0L) // v4
    assert(AtomicAppend.dvCurrent(spark, path).isEmpty)
    assert(AtomicAppend.read(spark, path).count() == 40)
  }

  test("CHECK constraints gate appends/updates/merges; NULL passes; violating batch never lands") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("ck-basic").toString
    AtomicAppend.append(
      Seq((1L, Some(5L)), (2L, None)).toDF("id", "v"), path, batchId = Some(0L))
    AtomicAppend.addCheckConstraint(spark, path, "v_nonneg", "v >= 0")
    // NULL passes (SQL CHECK), negatives are rejected and nothing lands
    AtomicAppend.append(Seq((3L, None: Option[Long])).toDF("id", "v"), path,
      batchId = Some(1L))
    val e = intercept[IllegalArgumentException](
      AtomicAppend.append(Seq((4L, Some(-1L))).toDF("id", "v"), path,
        batchId = Some(2L)))
    assert(e.getMessage.contains("v_nonneg") && e.getMessage.contains("1 rows"))
    assert(AtomicAppend.committedIds(spark, path) == Seq(0L, 1L))
    assert(AtomicAppend.read(spark, path).count() == 3)
    // an update that would break the constraint is rejected whole
    val e2 = intercept[IllegalArgumentException](
      AtomicAppend.updateWhere(spark, path, F.col("id") === 1L,
        Map("v" -> F.lit(-7L))))
    assert(e2.getMessage.contains("v_nonneg"))
    assert(AtomicAppend.read(spark, path).filter(F.col("v") < 0L).count() == 0)
    // a merge with a violating source row is rejected whole
    val e3 = intercept[IllegalArgumentException](
      AtomicAppend.mergeInto(spark, path,
        Seq((1L, Some(-2L))).toDF("id", "v"), Seq("id")))
    assert(e3.getMessage.contains("v_nonneg"))
    assert(AtomicAppend.read(spark, path).count() == 3)
    // dropping the constraint reopens the gate
    AtomicAppend.dropCheckConstraint(spark, path, "v_nonneg")
    AtomicAppend.append(Seq((5L, Some(-1L))).toDF("id", "v"), path,
      batchId = Some(9L))
    assert(AtomicAppend.read(spark, path).count() == 4)
  }

  test("adding a constraint the existing data violates is refused") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("ck-existing").toString
    AtomicAppend.append((0 until 10).map(i => (i.toLong, i - 5L)).toDF("id", "v"),
      path, batchId = Some(0L))
    val e = intercept[IllegalArgumentException](
      AtomicAppend.addCheckConstraint(spark, path, "v_nonneg", "v >= 0"))
    assert(e.getMessage.contains("5 existing rows"))
    assert(AtomicAppend.checkConstraints(spark, path).isEmpty)
    // unknown drop fails actionably
    val e2 = intercept[IllegalArgumentException](
      AtomicAppend.dropCheckConstraint(spark, path, "nope"))
    assert(e2.getMessage.contains("nope"))
  }
}
