package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.{IncrementalView => IV, Merge, Snapshots}

/** Incremental MIN/MAX maintenance ([[graft.layers.IncrementalView]]
  * extremes path, ql11): feed application ≡ rebuild across deletes,
  * inserts, group migrations, NULL group keys, all-NULL measures; the
  * exhausted-group rescan touching the base ONLY then; the poison-pill
  * fallback; and `refresh(minMaxCol=…)` crash-replay / aux-backfill.
  * The sf-scale semantics run under the DuckDB hash gate as ql11.
  */
class IncrementalViewExtremesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  private val grp = Seq("g")

  /** Rows (id, g, m) — g nullable (a NULL group key is a real group),
    * m nullable BIGINT (SQL MIN/MAX ignore NULLs).
    */
  private def df(rows: Seq[(Long, Option[String], Option[Long])]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "g", "m")
  }

  private val v0 = Seq[(Long, Option[String], Option[Long])](
    (1L, Some("a"), Some(1L)), (2L, Some("a"), Some(2L)), (3L, Some("a"), Some(3L)),
    (4L, Some("a"), Some(4L)), (5L, Some("a"), Some(5L)),
    (6L, Some("b"), Some(10L)), (7L, Some("b"), Some(20L)),
    (8L, None, Some(7L)), (9L, None, Some(8L)), // NULL-keyed group
    (10L, Some("z"), None), (11L, Some("z"), None)) // all-NULL measures

  /** v1: delete a's two smallest (drains a k=2 lo synopsis → rescan),
    * migrate one row b→c (pre leaves b, post enters c), insert into the
    * NULL group, delete from the NULL group, update a measure in place.
    */
  private val v1 = Seq[(Long, Option[String], Option[Long])](
    (3L, Some("a"), Some(3L)), (4L, Some("a"), Some(4L)), (5L, Some("a"), Some(5L)),
    (6L, Some("b"), Some(10L)), (7L, Some("c"), Some(20L)),
    (9L, None, Some(6L)), (12L, None, Some(9L)),
    (10L, Some("z"), None), (11L, Some("z"), None))

  private def rebuild(state: DataFrame, k: Int = 2): DataFrame =
    IV.withExtremes(IV.summarize(state, grp, Seq("m")),
      IV.bootstrapExtremes(state, grp, "m", k), grp, "m")

  private def asSet(d: DataFrame): Set[(Option[String], Long, Option[Long], Option[Long], Option[Long])] =
    d.collect().map { r =>
      (Option(r.getAs[String]("g")), r.getAs[Long]("n_rows"),
        Option(r.get(r.fieldIndex("m_sum"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("m_min"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("m_max"))).map(_.asInstanceOf[Long]))
    }.toSet

  test("feed apply ≡ rebuild: deletes under min, migration, NULL group key, all-NULL group") {
    val (s0, s1) = (df(v0), df(v1))
    val sum0 = IV.summarize(s0, grp, Seq("m"))
    val aux0 = IV.bootstrapExtremes(s0, grp, "m", 2)
    val d01 = Merge.diff(s0, s1, Seq("id")).localCheckpoint()
    val sum1 = IV.applyChanges(sum0, d01, grp, Seq("m"))
    val (aux1, rescans) = IV.applyChangesExtremes(aux0, d01, sum1, s1, grp, "m", 2)
    val got = asSet(IV.withExtremes(sum1, aux1, grp, "m"))
    assert(got == asSet(rebuild(s1)), s"incremental != rebuild: $got")
    assert(rescans >= 1, "group a's k=2 lo synopsis must drain under two tail deletes")
    // the expected final state, spelled out
    assert(got.contains((Some("a"), 3L, Some(12L), Some(3L), Some(5L))))
    assert(got.contains((None, 2L, Some(15L), Some(6L), Some(9L))), "NULL-keyed group maintained")
    assert(got.contains((Some("z"), 2L, None, None, None)), "all-NULL group: NULL min/max")
    assert(got.contains((Some("c"), 1L, Some(20L), Some(20L), Some(20L))), "migrated-in group")
  }

  test("the base is touched ONLY when a group exhausts") {
    val (s0, s1) = (df(v0), df(v1))
    def boom: DataFrame = throw new IllegalStateException("base scanned without exhaustion")
    val d01 = Merge.diff(s0, s1, Seq("id")).localCheckpoint()
    val sum1 = IV.applyChanges(IV.summarize(s0, grp, Seq("m")), d01, grp, Seq("m"))
    // k=64: nothing exhausts, the thunk must never evaluate
    val aux0w = IV.bootstrapExtremes(s0, grp, "m", 64)
    val (aux1w, n) = IV.applyChangesExtremes(aux0w, d01, sum1, boom, grp, "m", 64)
    assert(n == 0 && aux1w.count() == 5, "a, b, c, z and the NULL-keyed group survive")
    // k=2: group a drains — same feed, now the rescan path must fire
    val aux0t = IV.bootstrapExtremes(s0, grp, "m", 2)
    val e = intercept[IllegalStateException] {
      IV.applyChangesExtremes(aux0t, d01, sum1, boom, grp, "m", 2)
    }
    assert(e.getMessage.contains("base scanned"), e.getMessage)
  }

  test("two chained feed applications stay exact (the ql11 shape, tiny)") {
    val v2 = Seq[(Long, Option[String], Option[Long])](
      (4L, Some("a"), Some(4L)), (5L, Some("a"), Some(50L)), // delete 3, update 5
      (6L, Some("b"), Some(10L)), (7L, Some("c"), Some(20L)),
      (9L, None, Some(6L)), (12L, None, Some(9L)),
      (10L, Some("z"), Some(100L)), (11L, Some("z"), None)) // z gains a real value
    val (s0, s1, s2) = (df(v0), df(v1), df(v2))
    val sum0 = IV.summarize(s0, grp, Seq("m"))
    val aux0 = IV.bootstrapExtremes(s0, grp, "m", 2)
    val d01 = Merge.diff(s0, s1, Seq("id")).localCheckpoint()
    val sum1 = IV.applyChanges(sum0, d01, grp, Seq("m"))
    val (aux1, _) = IV.applyChangesExtremes(aux0, d01, sum1, s1, grp, "m", 2)
    val d12 = Merge.diff(s1, s2, Seq("id")).localCheckpoint()
    val sum2 = IV.applyChanges(sum1, d12, grp, Seq("m"))
    val (aux2, _) = IV.applyChangesExtremes(aux1, d12, sum2, s2, grp, "m", 2)
    assert(asSet(IV.withExtremes(sum2, aux2, grp, "m")) == asSet(rebuild(s2)))
  }

  test("inconsistent feed fails loudly in the raw apply (delete neither retained nor beyond tau)") {
    val s0 = df(v0)
    val aux0 = IV.bootstrapExtremes(s0, grp, "m", 2)
    // a delete of a value the group never contained, below the lo tau
    val badFeed = df(Seq((99L, Some("a"), Some(-100L))))
      .withColumn("change_type", F.lit("delete"))
    val sum = IV.summarize(s0, grp, Seq("m")) // group survives
    val e = intercept[Throwable] {
      IV.applyChangesExtremes(aux0, badFeed, sum, s0, grp, "m", 2)._1.collect()
    }
    assert(IV.isSynopsisInconsistency(e), s"expected loud inconsistency, got: ${e.getMessage}")
  }

  test("distinct-count maintenance: last-instance deletes drop the count, NULLs never count") {
    // values: group a holds bucket 1 twice and bucket 2 once; z all-NULL
    val s0 = df(Seq(
      (1L, Some("a"), Some(1L)), (2L, Some("a"), Some(1L)), (3L, Some("a"), Some(2L)),
      (4L, None, Some(5L)), (5L, Some("z"), None)))
    // delete one instance of bucket 1 (count holds), the ONLY instance of
    // bucket 2 (count drops), insert a new value into the NULL group
    val s1 = df(Seq(
      (1L, Some("a"), Some(1L)),
      (4L, None, Some(5L)), (6L, None, Some(6L)), (5L, Some("z"), None)))
    def distinctView(state: org.apache.spark.sql.DataFrame) =
      IV.withDistinctCount(IV.summarize(state, grp, Seq("m")),
        IV.summarize(state, grp :+ "m", Nil), grp, "m")
    val feed = Merge.diff(s0, s1, Seq("id")).localCheckpoint()
    val sum1 = IV.applyChanges(IV.summarize(s0, grp, Seq("m")), feed, grp, Seq("m"))
    val aux1 = IV.applyChanges(IV.summarize(s0, grp :+ "m", Nil), feed, grp :+ "m", Nil)
    val got = IV.withDistinctCount(sum1, aux1, grp, "m").collect()
      .map(r => (Option(r.getAs[String]("g")), r.getAs[Long]("n_rows"),
        r.getAs[Long]("m_distinct"))).toSet
    val rebuilt = distinctView(s1).collect()
      .map(r => (Option(r.getAs[String]("g")), r.getAs[Long]("n_rows"),
        r.getAs[Long]("m_distinct"))).toSet
    assert(got == rebuilt, s"incremental distinct != rebuild: $got vs $rebuilt")
    assert(got == Set(
      (Some("a"), 1L, 1L),  // bucket 2's last instance left; bucket 1 survives
      (None, 2L, 2L),       // NULL-keyed group counts its two real values
      (Some("z"), 1L, 0L))) // all-NULL values: count(distinct) = 0
  }

  test("refresh(minMaxCol): versioned maintenance ≡ rebuild; crash-replay; no-op on replay") {
    val dir = TestFixtures.tmpDir("ivm-minmax").toString
    val (base, view) = (s"$dir/base", s"$dir/view")
    Snapshots.writeVersion(df(v0), base, 0L)
    assert(IV.refresh(spark, base, view, Seq("id"), grp, Seq("m"), Some("m"), 2).contains(0L))
    assert(asSet(Snapshots.read(spark, view, 0L)) == asSet(rebuild(df(v0))))
    Snapshots.writeVersion(df(v1), base, 1L)
    assert(IV.refresh(spark, base, view, Seq("id"), grp, Seq("m"), Some("m"), 2).contains(1L))
    assert(asSet(Snapshots.read(spark, view, 1L)) == asSet(rebuild(df(v1))))
    // replay: already at target → no-op, nothing double-applied
    assert(IV.refresh(spark, base, view, Seq("id"), grp, Seq("m"), Some("m"), 2).isEmpty)
    // crash between the aux write and the view write: aux committed at 2
    // (here: garbage, as a half-written attempt could leave), view behind —
    // the re-run must key on the VIEW pointer and overwrite the aux
    val v2 = v1.map { case (id, g, m) => (id, g, m.map(_ + 1L)) }
    Snapshots.writeVersion(df(v2), base, 2L)
    Snapshots.writeVersion(
      IV.bootstrapExtremes(df(v0), grp, "m", 2), s"${view}__aux", 2L)
    assert(IV.refresh(spark, base, view, Seq("id"), grp, Seq("m"), Some("m"), 2).contains(2L))
    assert(asSet(Snapshots.read(spark, view, 2L)) == asSet(rebuild(df(v2))))
  }

  test("refresh(minMaxCol) on a view previously maintained WITHOUT it backfills the aux") {
    val dir = TestFixtures.tmpDir("ivm-backfill").toString
    val (base, view) = (s"$dir/base", s"$dir/view")
    Snapshots.writeVersion(df(v0), base, 0L)
    // v0 maintained summable-only: no aux exists
    assert(IV.refresh(spark, base, view, Seq("id"), grp, Seq("m")).contains(0L))
    Snapshots.writeVersion(df(v1), base, 1L)
    assert(IV.refresh(spark, base, view, Seq("id"), grp, Seq("m"), Some("m"), 2).contains(1L))
    assert(asSet(Snapshots.read(spark, view, 1L)) == asSet(rebuild(df(v1))))
  }

  test("randomized versions: sums + min/max + distinct all equal a rebuild at every step") {
    // seeded random bases: small group/value domains force heavy
    // duplicate values, NULL keys/measures, full-group deletions, and
    // k=2 exhaustions — the edge combinations fixtures don't enumerate
    for (seed <- Seq(11L, 23L, 47L)) {
      val rnd = new scala.util.Random(seed)
      def randState(): Seq[(Long, Option[String], Option[Long])] =
        (0L until 40L).flatMap { id =>
          if (rnd.nextDouble() < 0.25) None // row absent in this version
          else Some((id,
            if (rnd.nextDouble() < 0.15) None else Some(("abc" (rnd.nextInt(3))).toString),
            if (rnd.nextDouble() < 0.15) None else Some(rnd.nextInt(6).toLong)))
        }
      val versions = Seq.fill(3)(randState())
      var sum = IV.summarize(df(versions.head), grp, Seq("m"))
      var aux = IV.bootstrapExtremes(df(versions.head), grp, "m", 2)
      var vals = IV.summarize(df(versions.head), grp :+ "m", Nil)
      versions.sliding(2).foreach { case Seq(a, b) =>
        val feed = Merge.diff(df(a), df(b), Seq("id")).localCheckpoint()
        val newSum = IV.applyChanges(sum, feed, grp, Seq("m")).localCheckpoint()
        aux = IV.applyChangesExtremes(aux, feed, newSum, df(b), grp, "m", 2)._1
        vals = IV.applyChanges(vals, feed, grp :+ "m", Nil).localCheckpoint()
        sum = newSum
        val got = asSet(IV.withExtremes(sum, aux, grp, "m"))
        assert(got == asSet(rebuild(df(b))), s"seed $seed: extremes diverged from rebuild")
        val gotD = IV.withDistinctCount(sum, vals, grp, "m").collect()
          .map(r => (Option(r.getAs[String]("g")), r.getAs[Long]("m_distinct"))).toSet
        val rebuiltD = IV.withDistinctCount(IV.summarize(df(b), grp, Seq("m")),
          IV.summarize(df(b), grp :+ "m", Nil), grp, "m").collect()
          .map(r => (Option(r.getAs[String]("g")), r.getAs[Long]("m_distinct"))).toSet
        assert(gotD == rebuiltD, s"seed $seed: distinct diverged from rebuild")
      }
    }
  }

  test("refresh with minMaxCol AND distinctCol: both auxiliaries maintained; mid-life upgrade backfills") {
    val dir = TestFixtures.tmpDir("ivm-both").toString
    val (base, view) = (s"$dir/base", s"$dir/view")
    def rebuildBoth(state: DataFrame) =
      IV.withDistinctCount(rebuild(state), IV.summarize(state, grp :+ "m", Nil), grp, "m")
    def asSetD(d: DataFrame) = d.collect().map { r =>
      (Option(r.getAs[String]("g")), r.getAs[Long]("n_rows"),
        Option(r.get(r.fieldIndex("m_min"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("m_max"))).map(_.asInstanceOf[Long]),
        r.getAs[Long]("m_distinct"))
    }.toSet
    Snapshots.writeVersion(df(v0), base, 0L)
    // v0 maintained with min/max only — no value summary exists yet
    assert(IV.refresh(spark, base, view, Seq("id"), grp, Seq("m"), Some("m"), 2).contains(0L))
    Snapshots.writeVersion(df(v1), base, 1L)
    // mid-life upgrade: distinctCol added — the __vals aux backfills from
    // the base AS OF the view's version, then the feed applies
    assert(IV.refresh(spark, base, view, Seq("id"), grp, Seq("m"), Some("m"), 2,
      distinctCol = Some("m")).contains(1L))
    assert(asSetD(Snapshots.read(spark, view, 1L)) == asSetD(rebuildBoth(df(v1))))
    // replay no-ops; a further version advances both auxiliaries
    assert(IV.refresh(spark, base, view, Seq("id"), grp, Seq("m"), Some("m"), 2,
      distinctCol = Some("m")).isEmpty)
    val v2 = v1.filterNot(_._1 == 9L) // delete the NULL group's m=6 row
    Snapshots.writeVersion(df(v2), base, 2L)
    assert(IV.refresh(spark, base, view, Seq("id"), grp, Seq("m"), Some("m"), 2,
      distinctCol = Some("m")).contains(2L))
    assert(asSetD(Snapshots.read(spark, view, 2L)) == asSetD(rebuildBoth(df(v2))))
  }

  test("poison pill: a corrupted synopsis triggers the bootstrap-rebuild fallback, not a wedge") {
    val dir = TestFixtures.tmpDir("ivm-poison").toString
    val (base, view) = (s"$dir/base", s"$dir/view")
    Snapshots.writeVersion(df(v0), base, 0L)
    assert(IV.refresh(spark, base, view, Seq("id"), grp, Seq("m"), Some("m"), 2).contains(0L))
    // corrupt the committed aux at v0: group a's synopsis claims values
    // the feed's deletes (1, 2) are neither retained in nor beyond tau of
    import spark.implicits._
    val corrupt = Seq(
      (Some("a"), Seq(3L, 4L), Some(4L), Seq(4L, 5L), Some(4L)),
      (Some("b"), Seq(10L, 20L), None, Seq(10L, 20L), None),
      (None: Option[String], Seq(7L, 8L), None, Seq(7L, 8L), None),
      (Some("z"), Seq.empty[Long], None, Seq.empty[Long], None))
      .toDF("g", "m_lo", "m_lo_tau", "m_hi", "m_hi_tau")
    Snapshots.writeVersion(corrupt, s"${view}__aux", 0L)
    Snapshots.writeVersion(df(v1), base, 1L)
    // the incremental path throws the inconsistency; refresh must catch it,
    // rebuild the synopsis from the base at the target, and still commit
    assert(IV.refresh(spark, base, view, Seq("id"), grp, Seq("m"), Some("m"), 2).contains(1L))
    assert(asSet(Snapshots.read(spark, view, 1L)) == asSet(rebuild(df(v1))))
  }
}
