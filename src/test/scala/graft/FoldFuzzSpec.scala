package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.{AtomicAppend, ProtocolAudit}

/** Round-14 fold-protocol hardening, spec'd after the round-13 driver
  * gate went red on the two fold-exercising queries while every local
  * replication stayed green (VERDICT r13, What's-wrong #1):
  *   - repeated full lifecycles (append → clustered fold → pruned read)
  *     must be bit-deterministic and pass the [[ProtocolAudit]]
  *     tripwires every time;
  *   - `_VLOG` entries are IMMUTABLE: a crash that loses the LATEST
  *     pointer update leaves an orphan entry the next commit ADOPTS
  *     (rolls the pointer forward) instead of overwriting — an observed
  *     version can never be silently re-pointed;
  *   - `_cluster_tmp` debris from a crashed clustered fold is cleared
  *     by the retry and reclaimed by vacuum;
  *   - partition columns bind under their WRITTEN types (no per-read
  *     re-inference from directory names — numeric-looking string
  *     values like "01" must stay strings);
  *   - nested-nullability-only schema drift (an aggregation flipping a
  *     struct field's nullability) appends cleanly.
  */
class FoldFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  import spark.implicits._

  private def fixture: DataFrame =
    (0 until 3000).map { i =>
      (i.toLong, (i * 2654435761L) % 1009L, ((i * 37) % 500).toDouble, s"t${i % 5}")
    }.toDF("id", "k", "v", "tag")

  test("append → clustered fold → pruned read: deterministic and audit-clean across runs") {
    val df = fixture
    val pred = F.col("k") >= 100L && F.col("k") < 400L && F.col("v") >= 50.0
    val digests = (1 to 3).map { run =>
      val base = TestFixtures.tmpDir(s"fuzz-run$run").toString + "/t"
      val cols = Seq("k", "v")
      AtomicAppend.append(df.filter(F.col("id") % 3 === 0), base,
        batchId = Some(0L), statsCols = cols)
      AtomicAppend.append(df.filter(F.col("id") % 3 === 1), base,
        batchId = Some(1L), statsCols = cols)
      AtomicAppend.append(df.filter(F.col("id") % 3 === 2), base,
        batchId = Some(2L), statsCols = cols)
      AtomicAppend.compactClustered(spark, base, Seq("k", "v"),
        numBatches = 6, statsCols = cols)
      // the tripwires ARE the assertions: fold preserved content, skip sound
      ProtocolAudit.assertTableContent(spark, base, df, "fuzz")
      ProtocolAudit.assertPrunedReadSound(spark, base, pred, "fuzz")
      ProtocolAudit.digest(AtomicAppend.read(spark, base, pred))
    }
    assert(digests.distinct.size == 1,
      s"fold lifecycle produced run-dependent content: $digests")
  }

  test("orphan _VLOG entry is adopted, never overwritten") {
    val base = TestFixtures.tmpDir("fuzz-orphan").toString + "/t"
    def batch(b: Int) = (0 until 40).map(i => (b * 40L + i, s"b$b")).toDF("id", "tag")
    AtomicAppend.append(batch(0), base, batchId = Some(0L)) // v0
    AtomicAppend.append(batch(1), base, batchId = Some(1L)) // v1
    val f = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    def entryBytes(v: Long): String = {
      val in = f.open(new Path(s"$base/_VLOG/v=$v"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val v1Before = entryBytes(1L)
    // simulate the crash: v=1 landed, its LATEST update was lost
    graft.runtime.PointerFile.commit(f,
      new Path(s"$base/_VLOG/LATEST"), new Path(s"$base/_VLOG/LATEST.tmp"), "0")
    AtomicAppend.append(batch(2), base, batchId = Some(2L)) // must adopt v1, write v2
    assert(entryBytes(1L) == v1Before, "orphan entry was rewritten — versions are not immutable")
    assert(AtomicAppend.versions(spark, base) == Seq(0L, 1L, 2L))
    assert(AtomicAppend.history(spark, base).map(_._2) ==
      Seq(Seq(0L), Seq(0L, 1L), Seq(0L, 1L, 2L)))
    // every version stays readable with the batch set it always had
    assert(AtomicAppend.readAsOf(spark, base, 1L).count() == 80)
    assert(AtomicAppend.changesBetween(spark, base, 0L, 2L).count() == 80)
  }

  test("replayed commit under a lost pointer heals the pointer without a new entry") {
    val base = TestFixtures.tmpDir("fuzz-heal").toString + "/t"
    def batch(b: Int) = (0 until 10).map(i => (b * 10L + i, s"b$b")).toDF("id", "tag")
    AtomicAppend.append(batch(0), base, batchId = Some(0L)) // v0
    AtomicAppend.append(batch(1), base, batchId = Some(1L)) // v1
    val f = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    graft.runtime.PointerFile.commit(f,
      new Path(s"$base/_VLOG/LATEST"), new Path(s"$base/_VLOG/LATEST.tmp"), "0")
    // a REPLAY of batch 1 (same id, marker present): adopts v1 and rolls
    // the pointer — no duplicate entry, no content change
    assert(AtomicAppend.append(batch(1), base, batchId = Some(1L)).isEmpty)
    assert(AtomicAppend.versions(spark, base) == Seq(0L, 1L))
    assert(graft.runtime.PointerFile.read(f,
      new Path(s"$base/_VLOG/LATEST"), new Path(s"$base/_VLOG/LATEST.tmp")).contains("1"))
    assert(AtomicAppend.read(spark, base).count() == 20)
  }

  test("_cluster_tmp debris: cleared on retry, reclaimed by vacuum") {
    val base = TestFixtures.tmpDir("fuzz-tmp").toString + "/t"
    val df = fixture.limit(500)
    AtomicAppend.append(df.filter(F.col("id") % 2 === 0), base,
      batchId = Some(0L), statsCols = Seq("k"))
    AtomicAppend.append(df.filter(F.col("id") % 2 === 1), base,
      batchId = Some(1L), statsCols = Seq("k"))
    val f = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(s"$base/_cluster_tmp")
    // debris from a "crashed" prior attempt
    f.mkdirs(new Path(tmp, "__zbatch=7"))
    f.create(new Path(tmp, "__zbatch=7/junk"), true).close()
    assert(AtomicAppend.compactClustered(spark, base, Seq("k"),
      numBatches = 3, statsCols = Seq("k")).nonEmpty)
    assert(!f.exists(tmp), "retry left _cluster_tmp behind")
    ProtocolAudit.assertTableContent(spark, base, df, "fuzz-tmp")
    // abandoned-table case: debris with no retry coming — vacuum reclaims
    f.mkdirs(new Path(tmp, "__zbatch=0"))
    AtomicAppend.vacuum(spark, base)
    assert(!f.exists(tmp), "vacuum left _cluster_tmp behind")
  }

  test("compactSmall folds only undersized batches; right-sized batches survive by identity") {
    val base = TestFixtures.tmpDir("fuzz-small").toString + "/t"
    def small(b: Int) = (0 until 50)
      .map(i => (b * 1000L + i, (b * 1000L + i) % 977L, s"s$b")).toDF("id", "k", "tag")
    val big = (100000 until 105000)
      .map(i => (i.toLong, i % 977L, "big")).toDF("id", "k", "tag")
    (0 to 3).foreach(b => AtomicAppend.append(small(b), base,
      batchId = Some(b.toLong), statsCols = Seq("k")))
    AtomicAppend.append(big, base, batchId = Some(8L), statsCols = Seq("k")) // v4
    val all = (0 to 3).map(small).reduce(_ unionByName _).unionByName(big)
    val folded = AtomicAppend.compactSmall(spark, base, maxBytes = 16 * 1024) // v5
    assert(folded.nonEmpty)
    // the big batch keeps its ORIGINAL id — its dir was never touched
    assert(AtomicAppend.committedIds(spark, base) == Seq(8L, folded.get))
    ProtocolAudit.assertTableContent(spark, base, all, "fuzz-small")
    // the folded batch's merged zone map keeps the pruned read sound
    ProtocolAudit.assertPrunedReadSound(spark, base, F.col("k") >= 900L, "fuzz-small")
    // a partial fold is content-preserving: the feed across it is empty
    val feed = AtomicAppend.changesBetween(spark, base, 4L, 5L)
    assert(feed.count() == 0 && feed.columns.toSeq == Seq("id", "k", "tag"))
    // steady state: one small batch left (the fold itself) < minBatches
    assert(AtomicAppend.compactSmall(spark, base, maxBytes = 16 * 1024).isEmpty)
  }

  test("partition columns bind under written types — '01' stays a string") {
    val base = TestFixtures.tmpDir("fuzz-part").toString + "/t"
    val df = Seq(("01", 1L), ("01", 2L), ("2", 3L)).toDF("p", "x")
    AtomicAppend.append(df, base, partitionBy = Seq("p"), batchId = Some(0L))
    val back = AtomicAppend.read(spark, base)
    assert(back.schema("p").dataType == org.apache.spark.sql.types.StringType,
      s"partition column re-typed by inference: ${back.schema("p").dataType}")
    assert(back.select("p").as[String].collect().sorted.toSeq == Seq("01", "01", "2"))
    // a second batch keeps the same binding (multi-dir scan path)
    AtomicAppend.append(Seq(("03", 4L)).toDF("p", "x"), base,
      partitionBy = Seq("p"), batchId = Some(1L))
    assert(AtomicAppend.read(spark, base)
      .select("p").as[String].collect().sorted.toSeq == Seq("01", "01", "03", "2"))
  }

  test("nested-nullability-only drift appends cleanly; real type changes still fail") {
    val base = TestFixtures.tmpDir("fuzz-nullability").toString + "/t"
    // struct<x: long NOT NULL> vs struct<x: long NULL> — same logical type
    val strict = spark.range(5).select(F.struct(F.col("id").as("x")).as("s"))
    val relaxed = spark.range(5, 10).select(
      F.struct(F.when(F.col("id") =!= 7L, F.col("id")).as("x")).as("s"))
    AtomicAppend.append(strict, base, batchId = Some(0L))
    AtomicAppend.append(relaxed, base, batchId = Some(1L)) // pre-fix: "type change" error
    assert(AtomicAppend.read(spark, base).count() == 10)
    // a genuine type change is still a rewrite, not an append
    val changed = spark.range(1).select(
      F.struct(F.col("id").cast("string").as("x")).as("s"))
    val e = intercept[IllegalArgumentException](
      AtomicAppend.append(changed, base, batchId = Some(2L)))
    assert(e.getMessage.contains("type changes need a rewrite"))
  }
}
