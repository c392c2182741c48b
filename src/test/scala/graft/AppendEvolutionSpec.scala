package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.AtomicAppend

/** ADD-COLUMN schema evolution for [[AtomicAppend]] tables (the `_SCHEMA`
  * pointer — Delta's schema-in-metadata role): without it, a multi-batch
  * read samples ONE parquet footer, so a column added by a later append
  * silently vanishes whenever the sampled file predates it (measured —
  * the exact trap these tests pin shut). With the logged schema, every
  * reader binds to the full evolved shape and pre-evolution batches
  * null-fill the new columns.
  */
class AppendEvolutionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  test("a column added by a later append is visible over every batch") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("evo-add").toString
    AtomicAppend.append(Seq((1L, "a1")).toDF("id", "a"), path, batchId = Some(0L))
    AtomicAppend.append(Seq((2L, "a2", 9.5)).toDF("id", "a", "b"), path,
      batchId = Some(1L))
    val df = AtomicAppend.read(spark, path)
    assert(df.columns.toSeq == Seq("id", "a", "b"),
      s"evolved column lost: ${df.columns.mkString(",")}")
    val rows = df.orderBy("id").collect()
    assert(rows(0).isNullAt(2), "pre-evolution batch must null-fill the new column")
    assert(rows(1).getDouble(2) == 9.5)
    // the filter-pushdown path sees the evolved schema too
    assert(AtomicAppend.read(spark, path, F.col("b") > 5.0).count() == 1)
    // and a batch MISSING a logged column still appends (nulls)
    AtomicAppend.append(Seq((3L, "a3")).toDF("id", "a"), path, batchId = Some(2L))
    val df2 = AtomicAppend.read(spark, path)
    assert(df2.columns.toSeq == Seq("id", "a", "b"))
    assert(df2.filter(F.col("b").isNull).count() == 2)
  }

  test("evolution survives compaction and partitioned layouts") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("evo-compact").toString
    AtomicAppend.append(Seq((1L, 2023, "x")).toDF("id", "year", "s"), path,
      partitionBy = Seq("year"), batchId = Some(0L))
    AtomicAppend.append(Seq((2L, 2024, "y", 7L)).toDF("id", "year", "s", "extra"),
      path, partitionBy = Seq("year"), batchId = Some(1L))
    val before = AtomicAppend.read(spark, path)
      .select("id", "s", "extra", "year").orderBy("id")
      .collect().map(_.toString).toSeq
    assert(AtomicAppend.compact(spark, path, partitionBy = Seq("year")).isDefined)
    val after = AtomicAppend.read(spark, path)
      .select("id", "s", "extra", "year").orderBy("id")
      .collect().map(_.toString).toSeq
    assert(after == before, "compaction changed evolved content")
    // post-fold appends keep evolving
    AtomicAppend.append(
      Seq((3L, 2024, "z", 8L, true)).toDF("id", "year", "s", "extra", "flag"),
      path, partitionBy = Seq("year"), batchId = Some(9L))
    val df = AtomicAppend.read(spark, path)
    assert(df.columns.contains("flag"))
    assert(df.filter(F.col("flag")).count() == 1)
  }

  test("a type change is refused actionably; replay heals a stale schema pointer") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("evo-type").toString
    AtomicAppend.append(Seq((1L, 10)).toDF("id", "v"), path, batchId = Some(0L))
    val e = intercept[IllegalArgumentException] {
      AtomicAppend.append(Seq((2L, "ten")).toDF("id", "v"), path, batchId = Some(1L))
    }
    assert(e.getMessage.contains("changes column 'v'"))
    assert(AtomicAppend.read(spark, path).count() == 1, "refused append leaked")
    // crash window: batch visible, schema pointer never advanced —
    // simulate by appending the evolved batch, then rolling the pointer
    // back to the pre-evolution schema
    val preEvo = AtomicAppend.storedSchema(spark, path).get
    AtomicAppend.append(Seq((2L, 20, 1.5)).toDF("id", "v", "w"), path,
      batchId = Some(1L))
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    graft.runtime.PointerFile.commit(f,
      new org.apache.hadoop.fs.Path(s"$path/_SCHEMA"),
      new org.apache.hadoop.fs.Path(s"$path/_SCHEMA.tmp"), preEvo.json)
    assert(!AtomicAppend.read(spark, path).columns.contains("w"),
      "stale pointer should hide the column (the crash state)")
    // the replay heals the schema log
    assert(AtomicAppend.append(Seq((2L, 20, 1.5)).toDF("id", "v", "w"), path,
      batchId = Some(1L)).isEmpty)
    assert(AtomicAppend.read(spark, path).columns.contains("w"))
  }

  test("zone maps and time travel compose with evolution") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("evo-skip").toString
    AtomicAppend.append((0L until 100L).map(i => (i, i * 2)).toDF("id", "v"), path,
      batchId = Some(0L), statsCols = Seq("id", "v"))
    AtomicAppend.append((100L until 200L).map(i => (i, i * 2, i * 3)).toDF("id", "v", "w"),
      path, batchId = Some(1L), statsCols = Seq("id", "v", "w"))
    // a predicate on the NEW column: batch 0 has no 'w' stats entry →
    // kept (conservative), but its rows are all null-w → result correct
    val pruned = AtomicAppend.read(spark, path, F.col("w") >= 450L)
    val plain = AtomicAppend.read(spark, path).filter(F.col("w") >= 450L)
    assert(pruned.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
    // batch 1's own zone map still prunes on it
    val (kept, skipped) = AtomicAppend.pruneBatches(spark, path, F.col("w") > 600L)
    assert(skipped == Seq(1L) && kept == Seq(0L),
      s"evolved-column zone map: kept $kept skipped $skipped")
    // time travel reads the PRE-evolution version under the CURRENT
    // schema (the documented semantics): old rows null-fill 'w'
    val v0 = AtomicAppend.readAsOf(spark, path, 0)
    assert(v0.columns.contains("w") && v0.filter(F.col("w").isNotNull).count() == 0)
    assert(v0.count() == 100)
  }
}
