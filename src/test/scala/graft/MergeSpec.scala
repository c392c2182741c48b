package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.Merge

/** MERGE / SCD2 table maintenance ([[graft.layers.Merge]]) — clause
  * semantics, null-key behavior, the partition-scoped copy-on-write
  * commit, and linear SCD2 version chains. The full-corpus semantics run
  * under the DuckDB hash gate as ql07/ql08.
  */
class MergeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  test("merge: update, keep, insert, delete clauses; null keys never match") {
    import spark.implicits._
    val target = Seq(
      (Some(1L), "a", 10.0), // updated
      (Some(2L), "b", 20.0), // kept (no source row)
      (Some(3L), "F", 30.0), // deleted (matched + condition)
      (None: Option[Long], "n", 40.0)) // null key: survives untouched
      .toDF("k", "status", "amt")
    val source = Seq(
      (Some(1L), "U", 11.0),
      (Some(3L), "U", 31.0),
      (Some(9L), "I", 90.0), // inserted
      (None: Option[Long], "NI", 99.0)) // null key: inserted, not matched
      .toDF("k", "status", "amt")
    val out = Merge.merge(target, source, Seq("k"),
      deleteWhen = Some(F.col("t.status") === "F"))
    assert(out.columns.toSeq == Seq("k", "status", "amt"), "column order preserved")
    val rows = out.collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        r.getAs[String]("status"), r.getAs[Double]("amt"))).toSet
    assert(rows == Set(
      (Some(1L), "U", 11.0),
      (Some(2L), "b", 20.0),
      (Some(9L), "I", 90.0),
      (None, "n", 40.0),
      (None, "NI", 99.0)), s"got $rows")
  }

  test("merge: schema evolution appends new source columns, backfilling target rows with null") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val source = Seq((1L, "A", 0.9), (3L, "C", 0.5)).toDF("k", "v", "score")
    // off by default: a new column is a loud contract break
    val boom = intercept[IllegalArgumentException] {
      Merge.merge(target, source, Seq("k"))
    }
    assert(boom.getMessage.contains("score"), boom.getMessage)
    val out = Merge.merge(target, source, Seq("k"), allowSchemaEvolution = true)
    assert(out.columns.toSeq == Seq("k", "v", "score"), "evolved column appended last")
    val rows = out.collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
      Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(rows == Set(
      (1L, "A", Some(0.9)),
      (2L, "b", None), // untouched target row backfills null
      (3L, "C", Some(0.5))))
  }

  test("merge: a NULL deleteWhen condition means NOT deleted — the row updates") {
    import spark.implicits._
    val target = Seq((1L, null: String, 10.0), (2L, "F", 20.0)).toDF("k", "flag", "amt")
    val source = Seq((1L, "F", 11.0), (2L, "F", 21.0)).toDF("k", "flag", "amt")
    // t.flag is NULL for key 1: (matched && (t.flag === "F")) is NULL →
    // SQL MERGE applies the update; key 2's TRUE condition deletes
    val rows = Merge.merge(target, source, Seq("k"),
        deleteWhen = Some(F.col("t.flag") === "F")).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Double]("amt")).toMap
    assert(rows == Map(1L -> 11.0), s"got $rows")
  }

  test("mergeInPlace rejects a null partition value instead of silently dropping the null partition") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("merge-nullpart").resolve("t").toString
    Seq((1L, "2024-01-01", 1.0)).toDF("id", "day", "v")
      .write.partitionBy("day").parquet(path)
    val nullSource = Seq((2L, null: String, 2.0)).toDF("id", "day", "v")
    val boom = intercept[IllegalArgumentException] {
      Merge.mergeInPlace(spark, path, nullSource, Seq("id"), "day")
    }
    assert(boom.getMessage.contains("null day"), boom.getMessage)
  }

  test("merge: a duplicated source key fails loudly instead of fanning out") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "v")
    val dupSource = Seq((1L, "x"), (1L, "y")).toDF("k", "v")
    val boom = intercept[Exception] {
      Merge.merge(target, dupSource, Seq("k")).collect()
    }
    assert(boom.getMessage.contains("duplicate keys"), boom.getMessage)
    // the knob: a pre-deduplicated caller can skip the window pass —
    // fan-out then on their head (documented), here just no throw
    assert(Merge.merge(target, dupSource.dropDuplicates("k"), Seq("k"),
      guardDuplicateKeys = false).count() == 1)
    // several null-keyed rows are independent inserts, never duplicates
    val nulls = Seq((None: Option[Long], "n1"), (None: Option[Long], "n2"))
      .toDF("k", "v")
    assert(Merge.merge(target, nulls, Seq("k")).count() == 3)
  }

  test("merge: target-only columns stream through on updates, null on inserts") {
    import spark.implicits._
    val target = Seq((1L, "a", "extra1"), (2L, "b", "extra2")).toDF("k", "v", "note")
    val source = Seq((1L, "A"), (5L, "E")).toDF("k", "v")
    val rows = Merge.merge(target, source, Seq("k")).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"), r.getAs[String]("note"))).toSet
    assert(rows == Set((1L, "A", "extra1"), (2L, "b", "extra2"), (5L, "E", null)))
  }

  test("mergeInPlace rewrites only touched partitions; replay idempotent; contract enforced") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("merge-cow").resolve("t").toString
    val target = Seq(
      (1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0),
      (3L, "2024-01-02", 30.0), (4L, "2024-01-03", 40.0))
      .toDF("id", "day", "v")
    target.write.partitionBy("day").parquet(path)
    def partFiles(day: String): Map[String, Long] = {
      val d = new java.io.File(s"$path/day=$day")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before02 = partFiles("2024-01-02")
    val before03 = partFiles("2024-01-03")

    // touch only day=2024-01-01: one update + one insert
    val source = Seq((1L, "2024-01-01", 11.0), (9L, "2024-01-01", 90.0))
      .toDF("id", "day", "v")
    val touched = Merge.mergeInPlace(spark, path, source, Seq("id"), "day")
    assert(touched == Seq("2024-01-01"))
    val after = spark.read.parquet(path).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("v")).toMap
    assert(after == Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0, 4L -> 40.0, 9L -> 90.0))
    // untouched partitions: identical files, untouched on disk
    assert(partFiles("2024-01-02") == before02, "day=02 was rewritten")
    assert(partFiles("2024-01-03") == before03, "day=03 was rewritten")

    // replay converges to the same content
    Merge.mergeInPlace(spark, path, source, Seq("id"), "day")
    val replayed = spark.read.parquet(path).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("v")).toMap
    assert(replayed == after)

    // a source mapping one key to two partitions violates the contract
    val mover = Seq((1L, "2024-01-01", 1.0), (1L, "2024-01-02", 2.0))
      .toDF("id", "day", "v")
    val boom = intercept[IllegalArgumentException] {
      Merge.mergeInPlace(spark, path, mover, Seq("id"), "day")
    }
    assert(boom.getMessage.contains("cross-partition"))
  }

  test("mergeInPlace bootstraps a not-yet-existing table from the source") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("merge-boot").resolve("t").toString
    val source = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0))
      .toDF("id", "day", "v")
    // deleteWhen present: WHEN MATCHED never fires on an empty target,
    // so every row still inserts (merge()'s matched && cond semantics)
    val touched = Merge.mergeInPlace(spark, path, source, Seq("id"), "day",
      deleteWhen = Some(F.col("s.v") > 15.0))
    assert(touched.toSet == Set("2024-01-01", "2024-01-02"))
    val rows = spark.read.parquet(path).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("v")).toMap
    assert(rows == Map(1L -> 10.0, 2L -> 20.0))
    // and the second call takes the normal joined path against the
    // bootstrapped content
    val touched2 = Merge.mergeInPlace(spark, path,
      Seq((1L, "2024-01-01", 11.0)).toDF("id", "day", "v"), Seq("id"), "day")
    assert(touched2 == Seq("2024-01-01"))
    val rows2 = spark.read.parquet(path).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("v")).toMap
    assert(rows2 == Map(1L -> 11.0, 2L -> 20.0))
    // empty source on a missing path: no write, no dir
    val p2 = TestFixtures.tmpDir("merge-boot").resolve("t2").toString
    val none = Merge.mergeInPlace(spark, p2,
      source.filter(F.lit(false)), Seq("id"), "day")
    assert(none.isEmpty && !new java.io.File(p2).exists())
  }

  test("diff emits the four CDF change types; unchanged rows emit nothing") {
    import spark.implicits._
    val before = Seq(
      (1L, Some("a"), 10.0), // unchanged
      (2L, Some("b"), 20.0), // deleted
      (3L, Some("c"), 30.0), // updated (value change)
      (4L, None: Option[String], 40.0)) // updated (null -> value, null-safe)
      .toDF("k", "seg", "v")
    val after = Seq(
      (1L, Some("a"), 10.0),
      (3L, Some("c"), 31.0),
      (4L, Some("d"), 40.0),
      (9L, Some("n"), 90.0)) // inserted
      .toDF("k", "seg", "v")
    val out = Merge.diff(before, after, Seq("k")).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"),
        Option(r.getAs[String]("seg")), r.getAs[Double]("v"))).toSet
    assert(out == Set(
      (2L, "delete", Some("b"), 20.0),
      (3L, "update_preimage", Some("c"), 30.0),
      (3L, "update_postimage", Some("c"), 31.0),
      (4L, "update_preimage", None, 40.0),
      (4L, "update_postimage", Some("d"), 40.0),
      (9L, "insert", Some("n"), 90.0)))
    // identical states diff to empty
    assert(Merge.diff(before, before, Seq("k")).isEmpty)
    // a duplicated key on either side fails loudly (CDF over a
    // non-keyed table is ill-defined; the join would fan out)
    val dup = before.unionByName(before.limit(1))
    val dupBoom = intercept[Exception] {
      Merge.diff(dup, after, Seq("k")).collect()
    }
    assert(dupBoom.getMessage.contains("duplicate keys"), dupBoom.getMessage)
    // schema mismatch is rejected up front
    val boom = intercept[IllegalArgumentException] {
      Merge.diff(before, after.drop("v"), Seq("k"))
    }
    assert(boom.getMessage.contains("identical schemas"))
  }

  test("diffSnapshots reads the change feed between two pinned versions") {
    import spark.implicits._
    import graft.layers.Snapshots
    val path = TestFixtures.tmpDir("snap-diff").resolve("d").toString
    Snapshots.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    Snapshots.write(Seq((1L, "a2"), (3L, "c")).toDF("k", "v"), path)
    val out = Merge.diffSnapshots(spark, path, 0L, 1L, Seq("k")).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"), r.getAs[String]("v")))
      .toSet
    assert(out == Set(
      (1L, "update_preimage", "a"), (1L, "update_postimage", "a2"),
      (2L, "delete", "b"), (3L, "insert", "c")))
    // the reverse direction is the inverse feed
    val rev = Merge.diffSnapshots(spark, path, 1L, 0L, Seq("k")).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"))).toSet
    assert(rev == Set(
      (1L, "update_preimage"), (1L, "update_postimage"),
      (2L, "insert"), (3L, "delete")))
  }

  test("IncrementalView: feed-driven refresh ≡ full rebuild; replay and skipped versions no-op correctly") {
    import spark.implicits._
    import graft.layers.{IncrementalView, Snapshots}
    val root = TestFixtures.tmpDir("inc-view")
    val basePath = root.resolve("base").toString
    val viewPath = root.resolve("view").toString
    val grp = Seq("g"); val ms = Seq("m")

    def summarySet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("n_rows"), r.getAs[Long]("m_sum")))
      .toSet
    def rebuilt() = summarySet(IncrementalView.summarize(
      Snapshots.read(spark, basePath), grp, ms))

    // v0 → bootstrap
    Snapshots.write(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("k", "g", "m"), basePath)
    assert(IncrementalView.refresh(spark, basePath, viewPath, Seq("k"), grp, ms)
      .contains(0L))
    assert(summarySet(Snapshots.read(spark, viewPath)) == rebuilt())

    // replayed refresh with no new base version: no-op, content unchanged
    assert(IncrementalView.refresh(spark, basePath, viewPath, Seq("k"), grp, ms).isEmpty)

    // v1 (measure update + delete + insert) and v2 (GROUP MIGRATION:
    // key 2 moves a→b, plus a full group "c" appearing) land BEFORE the
    // next refresh — the view must advance 0→2 through ONE diff
    Snapshots.write(Seq((1L, "a", 11L), (3L, "b", 30L), (4L, "b", 40L))
      .toDF("k", "g", "m"), basePath)
    Snapshots.write(Seq((1L, "a", 11L), (2L, "b", 25L), (4L, "b", 40L), (5L, "c", 50L))
      .toDF("k", "g", "m"), basePath)
    assert(IncrementalView.refresh(spark, basePath, viewPath, Seq("k"), grp, ms)
      .contains(2L))
    assert(summarySet(Snapshots.read(spark, viewPath)) == rebuilt())
    assert(summarySet(Snapshots.read(spark, viewPath)) ==
      Set(("a", 1L, 11L), ("b", 2L, 65L), ("c", 1L, 50L)))

    // a group whose rows all disappear drops out, as a rebuild would show
    Snapshots.write(Seq((1L, "a", 11L), (2L, "b", 25L), (4L, "b", 40L))
      .toDF("k", "g", "m"), basePath)
    assert(IncrementalView.refresh(spark, basePath, viewPath, Seq("k"), grp, ms)
      .contains(3L))
    assert(summarySet(Snapshots.read(spark, viewPath)) == rebuilt())
    assert(!Snapshots.read(spark, viewPath).collect().exists(_.getString(0) == "c"))

    // replay convergence: re-running refresh after everything is applied
    // is a pure no-op — same latest version, same content
    val before = summarySet(Snapshots.read(spark, viewPath))
    assert(IncrementalView.refresh(spark, basePath, viewPath, Seq("k"), grp, ms).isEmpty)
    assert(Snapshots.latestVersion(spark, viewPath).contains(3L))
    assert(summarySet(Snapshots.read(spark, viewPath)) == before)
  }

  test("snapshots.versions tolerates stray non-numeric version= dirs") {
    import spark.implicits._
    import graft.layers.Snapshots
    val path = TestFixtures.tmpDir("snap-stray").resolve("d").toString
    Snapshots.write(Seq((1L, "a")).toDF("k", "v"), path)
    Snapshots.write(Seq((1L, "b")).toDF("k", "v"), path)
    // a manual backup / tooling artifact next to real versions
    assert(new java.io.File(s"$path/version=1.bak").mkdirs())
    assert(Snapshots.versions(spark, path) == Seq(0L, 1L))
    assert(Snapshots.read(spark, path).collect().head.getString(1) == "b")
    // vacuum still works with the stray dir present (and leaves it alone)
    Snapshots.write(Seq((1L, "c")).toDF("k", "v"), path)
    Snapshots.vacuum(spark, path, keepLast = 1)
    assert(Snapshots.versions(spark, path) == Seq(2L))
    assert(new java.io.File(s"$path/version=1.bak").exists())
  }

  test("snapshots: time-travel reads, crash-invisible writes, vacuum keeps the tail") {
    import spark.implicits._
    import graft.layers.Snapshots
    val path = TestFixtures.tmpDir("snapshots").resolve("dim").toString
    assert(Snapshots.latestVersion(spark, path).isEmpty)
    assert(Snapshots.write(Seq((1L, "a")).toDF("k", "v"), path) == 0L)
    assert(Snapshots.write(Seq((1L, "a2"), (2L, "b")).toDF("k", "v"), path) == 1L)
    assert(Snapshots.latestVersion(spark, path).contains(1L))
    assert(Snapshots.versions(spark, path) == Seq(0L, 1L))
    // VERSION AS OF: pinned reads are byte-stable history
    assert(Snapshots.read(spark, path, 0L).collect().map(_.getString(1)).toSeq == Seq("a"))
    assert(Snapshots.read(spark, path).count() == 2)

    // a crashed write (data dir landed, pointer never flipped) is
    // INVISIBLE: latest stays 1, the orphan dir is not a version, and
    // the next committed write simply overwrites it
    Seq((9L, "ghost")).toDF("k", "v").write.mode("overwrite")
      .parquet(s"$path/version=2")
    assert(Snapshots.latestVersion(spark, path).contains(1L))
    assert(Snapshots.versions(spark, path) == Seq(0L, 1L))
    intercept[IllegalArgumentException](Snapshots.read(spark, path, 2L))
    assert(Snapshots.write(Seq((3L, "c")).toDF("k", "v"), path) == 2L)
    assert(Snapshots.read(spark, path, 2L).collect().map(_.getString(1)).toSeq == Seq("c"))

    // vacuum: drops the head, keeps the tail, latest always readable
    assert(Snapshots.vacuum(spark, path, keepLast = 2) == Seq(0L))
    assert(Snapshots.versions(spark, path) == Seq(1L, 2L))
    intercept[IllegalArgumentException](Snapshots.read(spark, path, 0L))
    assert(Snapshots.read(spark, path).count() == 1)
  }

  test("mergeSnapshot: every merge batch leaves the pre-merge state pinnable") {
    import spark.implicits._
    val path = TestFixtures.tmpDir("merge-snap").resolve("dim").toString
    // bootstrap, then two merge batches
    assert(Merge.mergeSnapshot(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k")) == 0L)
    assert(Merge.mergeSnapshot(spark, path,
      Seq((1L, "a2"), (3L, "c")).toDF("k", "v"), Seq("k")) == 1L)
    assert(Merge.mergeSnapshot(spark, path,
      Seq((2L, "b3")).toDF("k", "v"), Seq("k")) == 2L)
    def state(v: Long) = graft.layers.Snapshots.read(spark, path, v)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state(0L) == Map(1L -> "a", 2L -> "b"))
    assert(state(1L) == Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    assert(state(2L) == Map(1L -> "a2", 2L -> "b3", 3L -> "c"))
  }

  test("scd2 chains versions linearly across consecutive batches; no-op updates don't churn") {
    import spark.implicits._
    val d0 = F.to_date(F.lit("2020-01-01"))
    val dim0 = Seq((1L, "gold"), (2L, "silver")).toDF("k", "tier")
      .select(F.col("k"), F.col("tier"), d0.as("valid_from"),
        F.lit(null).cast("date").as("valid_to"), F.lit(true).as("is_current"))
    // batch 1: key 1 changes, key 2 redundant re-delivery, key 3 new
    val u1 = Seq((1L, "plat"), (2L, "silver"), (3L, "bronze")).toDF("k", "tier")
    val dim1 = Merge.scd2(dim0, u1, "k", F.to_date(F.lit("2021-01-01")))
    val s1 = dim1.collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("tier"),
      Option(r.getAs[java.sql.Date]("valid_to")).map(_.toString),
      r.getAs[Boolean]("is_current"))).toSet
    assert(s1 == Set(
      (1L, "gold", Some("2021-01-01"), false),
      (1L, "plat", None, true),
      (2L, "silver", None, true), // no churn on the redundant update
      (3L, "bronze", None, true)))

    // batch 2: key 1 changes AGAIN — history stays, chain stays linear
    val dim2 = Merge.scd2(dim1, Seq((1L, "dia")).toDF("k", "tier"), "k",
      F.to_date(F.lit("2022-01-01")))
    val v1 = dim2.filter(F.col("k") === 1L).collect()
      .map(r => (r.getAs[String]("tier"),
        Option(r.getAs[java.sql.Date]("valid_from")).map(_.toString),
        Option(r.getAs[java.sql.Date]("valid_to")).map(_.toString),
        r.getAs[Boolean]("is_current"))).toSet
    assert(v1 == Set(
      ("gold", Some("2020-01-01"), Some("2021-01-01"), false),
      ("plat", Some("2021-01-01"), Some("2022-01-01"), false),
      ("dia", Some("2022-01-01"), None, true)),
      s"version chain broken: $v1")
    // exactly one current row per key, intervals abut
    val perKey = dim2.filter(F.col("is_current")).groupBy("k").count()
      .collect().map(_.getAs[Long]("count"))
    assert(perKey.forall(_ == 1L))
  }
}
