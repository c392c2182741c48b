package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IdDigest

/** The digest screen is what makes the persisted indexes' id-collision
  * guard batch-sized: a clean append must be PROVABLE from metadata
  * alone (range, then bloom), with the exact scan reserved for bloom
  * hits and digest-less epochs. False negatives must be impossible —
  * a missed collision silently corrupts an index forever.
  */
class IdDigestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  private def digest(ids: Seq[Long], epoch: Long) = {
    import spark.implicits._
    IdDigest.digestFrame(ids.toDF("id"), "id", epoch)
  }

  test("digestFrame records n/min/max and one row per epoch") {
    val rows = digest(0L until 1000L, 7L).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n") == 1000L)
    assert(r.getAs[Long]("min_id") == 0L)
    assert(r.getAs[Long]("max_id") == 999L)
    assert(r.getAs[Array[Byte]]("bloom").nonEmpty)
    assert(r.getAs[Long]("epoch") == 7L)
  }

  test("range-disjoint epochs drop out with no bloom probe; overlap without membership needs the bloom") {
    import spark.implicits._
    val digests = digest(0L until 1000L, 0L).union(digest(5000L until 6000L, 1L))
    // disjoint from both ranges: provably clean, zero suspects
    assert(IdDigest.suspectEpochs(
      Seq(2000L, 2001L, 2002L).toDF("id"), "id", digests, Nil).isEmpty)
    // inside epoch 1's range and a real member: exactly that epoch
    assert(IdDigest.suspectEpochs(
      Seq(5500L).toDF("id"), "id", digests, Nil) == Seq(1L))
    // a batch spanning both ranges with members of both: both epochs
    assert(IdDigest.suspectEpochs(
      Seq(17L, 5017L).toDF("id"), "id", digests, Nil).toSet == Set(0L, 1L))
  }

  test("no false negatives: every digested id is reported as a suspect") {
    import spark.implicits._
    val ids = (0L until 5000L).map(_ * 31L + 5L)
    val digests = digest(ids, 3L)
    // bloom false negatives are impossible — probe every indexed id
    val suspects = IdDigest.suspectEpochs(ids.toDF("id"), "id", digests, Nil)
    assert(suspects == Seq(3L))
  }

  test("uncovered epochs are always scanned; empty batches and empty digests short-circuit") {
    import spark.implicits._
    val digests = digest(0L until 100L, 0L)
    // epochs with no digest row ride through regardless of screening
    assert(IdDigest.suspectEpochs(
      Seq(9999L).toDF("id"), "id", digests, Seq(5L, 6L)) == Seq(5L, 6L))
    // an empty batch can collide with nothing
    assert(IdDigest.suspectEpochs(
      Seq.empty[Long].toDF("id"), "id", digests, Seq(5L)) == Seq(5L))
    // no digest rows at all degrades to the uncovered (exact-scan) set
    assert(IdDigest.suspectEpochs(
      Seq(1L).toDF("id"), "id", digests.limit(0), Seq(8L)) == Seq(8L))
    // an empty-epoch digest (n = 0) can never be a suspect
    val withEmpty = digests.union(digest(Seq.empty, 2L))
    assert(IdDigest.suspectEpochs(
      Seq(50L).toDF("id"), "id", withEmpty, Nil) == Seq(0L))
  }
}
