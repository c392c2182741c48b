package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StringMatch

/** Segment-blocked edit-distance matching: the equi-join candidate stage
  * must lose NOTHING against brute force (pigeonhole completeness), at
  * maxDist 1 and 2, across substitution/insert/delete edits at every
  * position class (head, interior, tail, length change).
  */
class StringMatchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  import spark.implicits._

  val vocab: Seq[String] = Seq(
    "cat", "cats", "cut", "coat", "bat", "at", "a", "ab",
    "dog", "dig", "dogs", "dodge",
    "plate", "slate", "late", "plates",
    "mirror", "mirrors", "mirro", "xylophone")

  private def brute(maxDist: Int): Set[(String, String, Int)] = {
    val pairs = for {
      a <- vocab; b <- vocab if a < b
      d = levenshtein(a, b) if d >= 1 && d <= maxDist
    } yield (a, b, d)
    pairs.toSet
  }

  // reference implementation for the fixture only
  private def levenshtein(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(
        math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("editDistancePairs equals brute force at maxDist 1 and 2") {
    val df = vocab.toDF("w").repartition(4)
    for (d <- Seq(1, 2)) {
      val got = StringMatch.editDistancePairs(df, d).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(got == brute(d), s"maxDist=$d: missing=${brute(d) -- got} extra=${got -- brute(d)}")
    }
  }

  test("fuzzyJoinPairs fans the string-level pairs back to every id pair") {
    val rows = Seq(
      (1L, "cold plate"), (2L, "cold plate"), (3L, "old plate"),
      (4L, "warm bolt"), (5L, "worm bolt"))
    val got = StringMatch.fuzzyJoinPairs(rows.toDF("id", "name"), "id", "name")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // "cold plate"~"old plate" (2 ids × 1 id) + "warm bolt"~"worm bolt";
    // orientation follows name order (a_str < b_str)
    assert(got == Set((1L, 3L), (2L, 3L), (4L, 5L)))
  }

  test("no candidates survive for strings farther than maxDist") {
    val df = Seq("aaaa", "bbbb", "cccc").toDF("w")
    assert(StringMatch.editDistancePairs(df, 1).isEmpty)
  }

  test("qa11 plans an equi-join candidate stage — no cartesian product") {
    val q = graft.queries.AdvancedQueries.queries("qa11_fuzzy_join")(
      spark, "/root/testdata/sf0.001")
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must not plan an all-pairs comparison:\n$plan")
  }
}
