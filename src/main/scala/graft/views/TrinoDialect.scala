package graft.views

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal Trino→Spark SQL dialect shim for the reference's query surface
  * (`sql/gold_layer_views_delta.sql`, `sql/dashboard_charts.sql`): the
  * constructs those files use (CASE, CAST AS DOUBLE, YEAR/MONTH/DAY,
  * DATE(), CURRENT_DATE, HAVING, LIMIT) are shared syntax — the only
  * mandatory rewrite is stripping Trino's catalog.schema qualifiers to
  * our registered temp-view names. This is what lets a user of the
  * reference run the SQL they run today against this engine unchanged.
  */
object TrinoDialect {

  def translate(sql: String): String = sql
    .replaceAll("(?i)delta\\.gold\\.", "")
    .replaceAll("(?i)postgres\\.public\\.", "")

  /** Extract `CREATE OR REPLACE VIEW <catalog.schema.>name AS <body>;`
    * statements from a Trino DDL script.
    */
  def extractViews(script: String): Map[String, String] = {
    val p = ("""(?is)CREATE\s+OR\s+REPLACE\s+VIEW\s+([\w.]+)\s+AS\s+(.*?);""").r
    p.findAllMatchIn(script).map { m =>
      val name = m.group(1).split('.').last
      name -> translate(m.group(2))
    }.toMap
  }

  /** Register every view of a Trino DDL script as a Spark temp view. */
  def registerScript(spark: SparkSession, script: String): Seq[String] = {
    val views = extractViews(script)
    views.foreach { case (name, body) =>
      spark.sql(s"CREATE OR REPLACE TEMP VIEW $name AS $body")
    }
    views.keys.toSeq
  }

  def run(spark: SparkSession, trinoSql: String): DataFrame =
    spark.sql(translate(trinoSql))
}
