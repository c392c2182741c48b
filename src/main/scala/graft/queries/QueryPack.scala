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
  *   - every computed double column is `round(...)`-ed in BOTH dialects
  *     (summation order differs between engines — raw fp sums won't hash-match);
  *   - integer-valued aggregates use `count(CASE ...)` not `sum(CASE ...)`
  *     (DuckDB sums INTEGER into HUGEINT, which breaks schema parity);
  *   - column names are aliased identically in both dialects.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
