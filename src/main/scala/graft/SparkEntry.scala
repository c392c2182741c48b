package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked corpus: one entry per implemented
  * operator family from SURVEY.md §2 plus the large-scale training-data
  * operators (dedup / similarity / text analysis). `oracleSql` carries the
  * DuckDB-equivalent SQL for every hash-checkable query.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] =
    Seq(CoreQueries, TextQueries, VectorQueries, LakehouseQueries, AdvancedQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q08_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
