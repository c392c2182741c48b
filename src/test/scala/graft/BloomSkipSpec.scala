package graft

import scala.util.Random

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.AtomicAppend

/** Bloom-filter batch skipping ([[graft.layers.BatchBloom]] `_BLOOM`
  * sidecars): point lookups prune batches that zone maps structurally
  * CANNOT — a high-cardinality key scattered across arrival-ordered
  * batches spans the full min/max range in every batch, so only
  * membership proves absence. Same contract as DataSkippingSpec:
  * soundness first (pruned read ≡ filter; every skipped batch re-scanned
  * to prove zero matches — false positives may keep batches, false
  * NEGATIVES would lose rows and must not exist), effectiveness second.
  */
class BloomSkipSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  private def assertSame(path: String, pred: Column): Unit = {
    val pruned = AtomicAppend.read(spark, path, pred).collect().map(_.toString).sorted
    val plain = AtomicAppend.read(spark, path).filter(pred).collect().map(_.toString).sorted
    assert(pruned.toSeq == plain.toSeq, s"pruned read diverged for $pred")
  }

  private def assertSkipsSound(path: String, pred: Column): (Seq[Long], Seq[Long]) = {
    val (kept, skipped) = AtomicAppend.pruneBatches(spark, path, pred)
    skipped.foreach { id =>
      val n = spark.read.parquet(s"$path/_batch=$id").filter(pred).count()
      assert(n == 0, s"batch $id was skipped but holds $n matching rows for $pred")
    }
    (kept, skipped)
  }

  /** 4 batches × 500 rows; `key` is a scrambled long (every batch spans
    * the full range — zone maps can never skip on it) and `skey` its
    * string twin with a non-ASCII prefix (pins the putString/
    * mightContainString encoding agreement).
    */
  private def scrambledTable(stats: Boolean): String = {
    import spark.implicits._
    val path = TestFixtures.tmpDir("bloom-scrambled").toString
    (0 until 4).foreach { b =>
      val df = (0 until 500).map { i =>
        val id = b * 500L + i
        val key = id * 2654435761L % 999999937L
        (id, key, s"ключ-$key", s"g$b")
      }.toDF("id", "key", "skey", "g")
      AtomicAppend.append(df, path, batchId = Some(b.toLong),
        statsCols = if (stats) Seq("id", "key", "skey") else Nil,
        bloomCols = Seq("key", "skey"))
    }
    path
  }

  test("bloom prunes point lookups that zone maps cannot") {
    val path = scrambledTable(stats = true)
    // key of id=777 (batch 1): scrambled, inside every batch's min/max
    val k777 = 777L * 2654435761L % 999999937L
    val (kept, skipped) = assertSkipsSound(path, F.col("key") === k777)
    assert(kept == Seq(1L),
      s"bloom should keep only batch 1 (fpp collisions aside): kept $kept")
    assert(skipped.size == 3)
    assertSame(path, F.col("key") === k777)
    // the zone map alone (same predicate, id column has tight ranges):
    // min/max prunes id lookups, bloom prunes key lookups — layered
    val (keptId, _) = assertSkipsSound(path, F.col("id") === 777L)
    assert(keptId == Seq(1L))
  }

  test("string blooms agree with Spark's value domain (non-ASCII keys)") {
    val path = scrambledTable(stats = false)
    val s42 = s"ключ-${42L * 2654435761L % 999999937L}"
    val (kept, skipped) = assertSkipsSound(path, F.col("skey") === s42)
    assert(kept.contains(0L) && skipped.nonEmpty,
      s"string bloom failed to prune: kept $kept")
    assertSame(path, F.col("skey") === s42)
  }

  test("IN lists: batches holding ANY member stay, all-absent batches go") {
    val path = scrambledTable(stats = true)
    def k(id: Long) = id * 2654435761L % 999999937L
    // members from batches 0 and 3 only
    val pred = F.col("key").isin(k(5), k(1800))
    val (kept, skipped) = assertSkipsSound(path, pred)
    assert(kept.sorted == Seq(0L, 3L), s"IN kept $kept")
    assert(skipped.sorted == Seq(1L, 2L))
    assertSame(path, pred)
    // a value absent EVERYWHERE prunes the whole table
    val (keptNone, _) = assertSkipsSound(path, F.col("key") === 999999936L)
    assert(keptNone.isEmpty)
    assertSame(path, F.col("key") === 999999936L)
  }

  test("family guards: a fractional-double literal never consults the long bloom") {
    val path = scrambledTable(stats = true)
    // x = 0.5: provably empty by TYPE for a long column — but that proof
    // belongs to the zone map / optimizer, never to hashed membership.
    // The sound outcome is simply result equality with no false skip of
    // a matching row (here: no rows match anywhere).
    val pred = F.col("key") === F.lit(0.5)
    assertSkipsSound(path, pred)
    assertSame(path, pred)
    // integral literal of a DIFFERENT width still consults (one putLong
    // domain): int literal vs long column
    val k5 = (5L * 2654435761L % 999999937L).toInt // fits int for this id
    val (kept, skipped) = assertSkipsSound(path, F.col("key") === F.lit(k5))
    assert(skipped.nonEmpty, s"width-crossing integral lookup failed to prune: $kept")
    assertSame(path, F.col("key") === F.lit(k5))
  }

  test("compact recomputes blooms over the fold; lookups keep pruning") {
    val path = scrambledTable(stats = true)
    val before = AtomicAppend.read(spark, path).collect().map(_.toString).sorted.toSeq
    assert(AtomicAppend.compact(spark, path).isDefined)
    assert(AtomicAppend.read(spark, path).collect().map(_.toString).sorted.toSeq == before)
    // single folded batch: an absent key prunes it (table-empty lookup)
    val (kept, skipped) = assertSkipsSound(path, F.col("key") === 999999936L)
    assert(kept.isEmpty && skipped.size == 1, s"folded bloom missing: kept $kept")
    // a present key keeps it
    val k9 = 9L * 2654435761L % 999999937L
    val (kept2, _) = assertSkipsSound(path, F.col("key") === k9)
    assert(kept2.size == 1)
    assertSame(path, F.col("key") === k9)
  }

  test("clustered compaction with bloomCols: membership survives the z-fold") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("bloom-zfold").toString
    val rnd = new Random(3)
    (0 until 3).foreach { b =>
      val df = (0 until 1000).map { i =>
        val id = b * 1000L + i
        (id, id * 2654435761L % 999999937L, rnd.nextInt(100).toLong)
      }.toDF("id", "key", "v")
      AtomicAppend.append(df, path, batchId = Some(b.toLong),
        statsCols = Seq("id", "v"), bloomCols = Seq("key"))
    }
    val before = AtomicAppend.read(spark, path).collect().map(_.toString).sorted.toSeq
    val ids = AtomicAppend.compactClustered(spark, path, Seq("v"), 8,
      statsCols = Seq("id", "v"), bloomCols = Seq("key"))
    assert(ids.isDefined && ids.get.size > 1)
    assert(AtomicAppend.read(spark, path).collect().map(_.toString).sorted.toSeq == before)
    // post-fold: a point lookup on the UNclustered key prunes via bloom
    val k = 1500L * 2654435761L % 999999937L
    val (kept, skipped) = assertSkipsSound(path, F.col("key") === k)
    assert(skipped.nonEmpty, s"post-fold bloom lookup kept everything: $kept")
    assertSame(path, F.col("key") === k)
    // and a range predicate on the CLUSTERED column prunes via zone maps
    val (_, skippedV) = assertSkipsSound(path, F.col("v") < 10L)
    assert(skippedV.nonEmpty)
  }

  test("a truncated _BLOOM sidecar disables pruning conservatively — no crash, no hang") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("bloom-torn").toString
    val df = (0 until 100).map(i => (i.toLong, i * 31L)).toDF("id", "key")
    AtomicAppend.append(df, path, batchId = Some(0L), bloomCols = Seq("id", "key"))
    // truncate the sidecar mid-sketch
    val p = new java.io.File(s"$path/_batch=0/_BLOOM")
    val bytes = java.nio.file.Files.readAllBytes(p.toPath)
    java.nio.file.Files.write(p.toPath, bytes.take(bytes.length / 2))
    // an absent key would have pruned; the torn sidecar must KEEP the
    // batch (and both the deserializing and the skipping read paths must
    // survive the truncation)
    val (kept, skipped) = assertSkipsSound(path, F.col("key") === -1L)
    assert(kept == Seq(0L) && skipped.isEmpty, "torn sidecar must disable pruning")
    assertSame(path, F.col("key") === -1L)
    val (kept2, _) = assertSkipsSound(path, F.col("id") === -1L)
    assert(kept2 == Seq(0L))
  }

  test("replay keeps the sidecar; fpp false positives only ever KEEP batches") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("bloom-replay").toString
    val df = (0 until 200).map(i => (i.toLong, i * 7919L % 104729L)).toDF("id", "key")
    assert(AtomicAppend.append(df, path, batchId = Some(0L),
      bloomCols = Seq("key")).contains(0L))
    assert(AtomicAppend.append(df, path, batchId = Some(0L),
      bloomCols = Seq("key")).isEmpty)
    assert(AtomicAppend.read(spark, path).count() == 200)
    val (kept, skipped) = assertSkipsSound(path, F.col("key") === 999999999L)
    assert(kept.isEmpty && skipped == Seq(0L), "bloom sidecar lost on replay")
    // randomized: NO false negative across 200 present keys (a bloom
    // false negative is impossible by construction; this pins the
    // write/read/value-domain plumbing end to end)
    (0 until 200 by 17).foreach { i =>
      val (keptI, _) = assertSkipsSound(path, F.col("key") === i * 7919L % 104729L)
      assert(keptI == Seq(0L), s"FALSE NEGATIVE at id $i — row lost")
      assertSame(path, F.col("key") === i * 7919L % 104729L)
    }
  }
}
