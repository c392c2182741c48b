package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of oracle-checked queries.
  *
  * Contract (driver, see SparkEntry): every key in `queries` SHOULD have a
  * matching ANSI-SQL entry in `oracle` runnable by DuckDB over the same
  * parquet tables; keys without oracle SQL get a weaker rows-only check.
  *
  * Determinism rules for hash-parity with the oracle:
  *   - every query ends in an ORDER BY over a unique key combination;
  *   - a SINGLE-OP double over exact integers (one division: ratios,
  *     jaccard) is engine-portable RAW — one IEEE op over identical
  *     inputs is bit-identical in every engine — and its hashed payload
  *     is the fixed-point image `TextFunctions.scaledLong(x, d)` =
  *     `floor(x·10^d + 0.5)` BIGINT (`CAST(floor(x * 10^d + 0.5) AS
  *     BIGINT)` in DuckDB). Decimal `round(x, d)` is NOT portable:
  *     synthetic corpora land raw values exactly on decimal half-way
  *     boundaries (x·10^d = N.5 exactly), where engines' tie algorithms
  *     diverge (the round-6 qd28 red row);
  *   - a MULTI-OP double (the 3-term quality score) is not portable even
  *     through `scaledLong`: engines associate/fold the pipeline
  *     differently, and a one-ULP input difference at a half-way boundary
  *     the data actually hits flips the floor (the round-7 qd05/qd28 red
  *     rows — floor has no tie mode, but it has a discontinuity). Such
  *     values must be recast as ALL-INTEGER fixed point on BOTH sides
  *     (`TextFunctions.qualityMicro` / DuckDB `//`) — decisions,
  *     ordering, and payload all in longs, no double anywhere;
  *   - doubles that pass through order-dependent summation or
  *     transcendental fns (sum/avg of doubles, ln, corr) keep `round(...)`
  *     in BOTH dialects — parity there relies on the value not sitting
  *     within an ulp of a rounding boundary (measure-zero for such
  *     values, impossible to make exact cheaply). Prefer emitting exact
  *     integer sums (sum of longs) over averaging when the payload allows;
  *   - integer-valued aggregates use `count(CASE ...)` not `sum(CASE ...)`
  *     (DuckDB sums INTEGER into HUGEINT, which breaks schema parity);
  *   - column names are aliased identically in both dialects.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
