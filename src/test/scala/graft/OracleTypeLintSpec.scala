package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint over every `oracleSql` string: an integer-typed `sum(...)`
  * escaping an oracle's output unwrapped is a driver-gate hash fail even when
  * all values match — DuckDB widens `sum(INTEGER|BIGINT)` to HUGEINT (INT128)
  * while the Spark side stays BIGINT, and the driver's hash is type-sensitive
  * (the round-14 7-query divergence; taxonomy rule at QueryPack.scala:37).
  *
  * The authoritative gate is `scripts/oracle_check.py`, which asserts the
  * actual DuckDB result types (no HUGEINT/DECIMAL; class-match vs the Spark
  * parquet schema) on every run. This spec is the in-JVM backstop: it flags
  * the syntactic pattern class without needing DuckDB, so a regression fails
  * `sbt test` before anything ships. Queries in `verifiedSafe` have a bare
  * integer sum that is consumed downstream (never an output column) —
  * verified by the full 115-oracle DuckDB type sweep (round 15).
  */
class OracleTypeLintSpec extends AnyFunSuite {

  // Bare integer sums proven (DuckDB type sweep) to never reach the output:
  //   qd08 simhash: sum(CASE..1/-1) per bit, consumed by a sign() comparison
  //   qd15/qd18/qd23: token/trigram counts consumed inside a double division
  //   qd28: running sum(ntok) OVER used only in a (<= budget) predicate
  private val verifiedSafe: Set[String] =
    Set("qd08_simhash", "qd15_pack_sequences", "qd18_repetition",
        "qd23_unigram_logprob", "qd28_token_budget")

  // DOUBLE columns of the fixture tables (TESTDATA.md): sum over these stays
  // DOUBLE in both engines — no widening hazard.
  private val doubleColumns: Set[String] =
    Set("value", "price", "score", "o_totalprice", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "s_acctbal", "c_acctbal",
        "p_retailprice")

  private val sumRe = "(?i)(?<![a-z0-9_])sum\\s*\\(".r

  /** Balanced-paren argument of the sum( at `open` (index of '('). */
  private def argOf(sql: String, open: Int): String = {
    var depth = 0; var i = open
    while (i < sql.length) {
      sql(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return sql.substring(open + 1, i)
        case _ =>
      }
      i += 1
    }
    sql.substring(open + 1)
  }

  /** Integer-typed sum argument: a CAST(... AS BIGINT/INT...) chain, a bare
    * identifier (column type unprovable statically — wrap or allowlist), or a
    * CASE whose THEN/ELSE branches are integer literals.
    */
  private def integerTyped(arg: String): Boolean = {
    val a = arg.trim
    val up = a.toUpperCase
    if (up.contains("AS DOUBLE") || up.contains("AS FLOAT")) false
    else if (up.matches("(?s).*AS\\s+(BIGINT|INTEGER|INT|SMALLINT|TINYINT)\\s*\\).*")) true
    else if (a.matches("(?i)[a-z_][a-z0-9_.]*"))
      !doubleColumns(a.toLowerCase.split('.').last)
    else if (up.startsWith("CASE") &&
             "(?i)(THEN|ELSE)\\s+-?\\d+(\\s|$)".r.findFirstIn(a).isDefined) true
    else false
  }

  /** Is the sum at `start` already wrapped as CAST(sum(...) ...)? */
  private def castWrapped(sql: String, start: Int): Boolean = {
    val pre = sql.substring(math.max(0, start - 16), start).toUpperCase
    pre.replaceAll("\\s+", "").endsWith("CAST(")
  }

  test("no unwrapped integer sum( in any oracle SQL (HUGEINT trap)") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) if !verifiedSafe(name) =>
        sumRe.findAllMatchIn(sql).flatMap { m =>
          val open = sql.indexOf('(', m.start)
          val arg = argOf(sql, open)
          if (integerTyped(arg) && !castWrapped(sql, m.start))
            Some(s"$name: sum(${arg.replaceAll("\\s+", " ").take(60)}...) — " +
                 "wrap in CAST(sum(...) AS BIGINT) or verify via oracle_check.py " +
                 "type gate and add to verifiedSafe")
          else None
        }
      case _ => Seq.empty
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("every verifiedSafe entry still names a live oracle") {
    val live = SparkEntry.oracleSql.keySet
    val stale = verifiedSafe -- live
    assert(stale.isEmpty, s"stale allowlist entries: $stale")
  }
}
