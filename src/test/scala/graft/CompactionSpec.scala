package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.Compaction

class CompactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  private def fileNames(root: String, spec: String): Set[String] = {
    val dir = new java.io.File(root, spec)
    dir.listFiles().filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).toSet
  }

  test("compact rewrites only fragmented partitions, preserving rows and bytes of others") {
    val work = TestFixtures.tmpDir("compact").toString
    val events = graft.queries.CoreQueries.events(spark, sf)
      .withColumn("d", F.dayofmonth(F.col("ts")))

    // day 1: fragmented (16 shuffled files); every other day: 1 tidy file
    events.filter(F.col("d") === 1).repartition(16)
      .write.partitionBy("d").mode("append").parquet(work)
    events.filter(F.col("d") =!= 1).repartition(F.col("d"))
      .write.partitionBy("d").mode("append").parquet(work)

    val beforeRows = spark.read.parquet(work).groupBy("d").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val tidyBefore = fileNames(work, "d=2")
    assert(fileNames(work, "d=1").size == 16)

    val report = Compaction.compact(spark, work, Seq("d"))
      .collect().map(r => r.getAs[String]("partition") -> r.getAs[Int]("files_before")).toMap
    assert(report == Map("d=1" -> 16), s"only d=1 should be compacted: $report")

    // fragmented partition now holds one file; data identical everywhere
    assert(fileNames(work, "d=1").size == 1)
    assert(fileNames(work, "d=2") == tidyBefore, "tidy partition files must be untouched")
    val afterRows = spark.read.parquet(work).groupBy("d").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(afterRows == beforeRows)

    // second run is a no-op with an empty report
    assert(Compaction.compact(spark, work, Seq("d")).isEmpty)
  }

  test("zero-padded partition values are compacted, not silently skipped") {
    // Regression for the round-4 partition-inference fix: with inference
    // on, a dir "m=03" reads back as int 3, the pruning key "3" never
    // matches the dir-name key "03", and compact() reported the partition
    // while rewriting nothing. The literal dir value must round-trip.
    val work = TestFixtures.tmpDir("compact-pad").toString
    val events = graft.queries.CoreQueries.events(spark, sf)
      .withColumn("m", F.format_string("%02d", F.dayofmonth(F.col("ts")) % 2 + 2))

    // m=03 fragmented; m=02 tidy
    events.filter(F.col("m") === "03").repartition(8)
      .write.partitionBy("m").mode("append").parquet(work)
    events.filter(F.col("m") === "02").repartition(1)
      .write.partitionBy("m").mode("append").parquet(work)
    val beforeRows = spark.read.parquet(work).count()
    assert(fileNames(work, "m=03").size == 8)

    val report = Compaction.compact(spark, work, Seq("m"))
      .collect().map(r => r.getAs[String]("partition") -> r.getAs[Int]("files_before")).toMap
    assert(report == Map("m=03" -> 8), s"zero-padded partition not selected: $report")
    // the REWRITE actually happened (old bug: reported but left 8 files),
    // under the same zero-padded dir name, with no row lost
    assert(fileNames(work, "m=03").size == 1)
    assert(new java.io.File(work, "m=3").exists() == false,
      "rewrite must preserve the literal dir value, not re-derive m=3")
    assert(spark.read.parquet(work).count() == beforeRows)
  }

  test("compactTable folds a fragmented bucketed catalog partition, preserving buckets") {
    import spark.implicits._
    val t = s"ctbl_${System.nanoTime()}"
    def batch(off: Long, epoch: Long) =
      (0 until 200).map(i => (off + i, s"v${off + i}", epoch)).toDF("id", "v", "epoch")
        .repartition(1) // one writer task -> exactly one file per bucket
    batch(0L, 0L).write.partitionBy("epoch").bucketBy(4, "id").sortBy("id").saveAsTable(t)
    // three more single-task appends fragment epoch=1 to 12 files
    (1 to 3).foreach(k => batch(10000L * k, 1L).write.mode("append").insertInto(t))

    val loc = new java.io.File(spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(t)).location).toString
    assert(fileNames(loc, "epoch=1").size == 12)
    val tidyBefore = fileNames(loc, "epoch=0")
    val rowsBefore = spark.table(t).groupBy("epoch").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val report = Compaction.compactTable(spark, t)
      .collect().map(r => r.getAs[String]("partition") -> r.getAs[Int]("files_before")).toMap
    assert(report == Map("epoch=1" -> 12), s"only epoch=1 should be rewritten: $report")
    assert(fileNames(loc, "epoch=1").size == 4, "rewrite should reach the bucket floor")
    assert(fileNames(loc, "epoch=0") == tidyBefore, "tidy partition files must be untouched")
    assert(spark.table(t).groupBy("epoch").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == rowsBefore)

    // bucket metadata survived the rewrite: a group-by on the bucket key
    // is satisfied by the scan's clustering, no Exchange in the plan
    val plan = spark.table(t).groupBy("id").count()
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketing lost after compactTable:\n$plan")

    // at the bucket floor the partition is no longer needy: no-op report
    assert(Compaction.compactTable(spark, t).isEmpty)
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("maxRecordsPerFile splits an oversized partition into multiple target-sized files") {
    val work = TestFixtures.tmpDir("compact-split").toString
    val events = graft.queries.CoreQueries.events(spark, sf)
      .withColumn("d", F.dayofmonth(F.col("ts")))
    events.filter(F.col("d") === 1).repartition(8)
      .write.partitionBy("d").mode("append").parquet(work)

    // tiny target forces the single rewritten partition into several files
    // (bytes/row is estimated from the fragmented files, so per-file
    // overhead skews it high and files come out under target — the
    // conservative direction)
    val report = Compaction.compact(spark, work, Seq("d"), targetBytes = 8 * 1024)
    assert(report.count() == 1)
    val n = fileNames(work, "d=1").size
    assert(n > 1, s"expected multiple small files, got $n")
  }

  test("foldColdPartitions archives cold batch dirs into one consolidated partition") {
    import spark.implicits._
    val work = TestFixtures.tmpDir("fold-batches").toString
    // the accepted-layer shape the ingest streams write: one batch=<id>
    // dir per trigger, rows globally unique
    (0L to 3L).foreach { b =>
      (0 until 20).map(i => (b * 100 + i, s"doc ${b * 100 + i}"))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$work/batch=$b")
    }
    def dirs() = new java.io.File(work).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    def ids() = spark.read.parquet(work).select("doc_id").as[Long].collect().toSet
    val all = ids()
    assert(dirs() == Set("batch=0", "batch=1", "batch=2", "batch=3"))

    // fold batches <= 2; the in-flight batch 3 keeps its provenance dir
    assert(Compaction.foldColdPartitions(spark, work, "batch", upTo = 2L) == 3)
    assert(dirs() == Set("batch=-1", "batch=3"), s"unexpected dirs: ${dirs()}")
    assert(ids() == all, "folding must not change layer content")
    assert(spark.read.parquet(work).filter($"batch" === 3).count() == 20,
      "hot partition must be untouched")
    assert(spark.read.parquet(work).filter($"batch" === -1).count() == 60)

    // idempotent: nothing cold left below the watermark
    assert(Compaction.foldColdPartitions(spark, work, "batch", upTo = 2L) == 0)
    assert(ids() == all)

    // crash-window fixpoint: a cold dir that survived a died delete holds
    // rows the consolidated partition already has — refolding absorbs
    // them without duplicating (rows are globally unique, dropDuplicates
    // is the fixpoint)
    spark.read.parquet(work).filter($"batch" === -1).limit(20)
      .select("doc_id", "text")
      .write.mode("overwrite").parquet(s"$work/batch=1")
    assert(Compaction.foldColdPartitions(spark, work, "batch", upTo = 2L) == 1)
    assert(ids() == all, "refold must absorb the survivor, not duplicate it")
    assert(spark.read.parquet(work).count() == all.size)

    // a later fold absorbs the now-cold batch 3 too
    assert(Compaction.foldColdPartitions(spark, work, "batch", upTo = 3L) == 1)
    assert(dirs() == Set("batch=-1"))
    assert(ids() == all)
  }
}
