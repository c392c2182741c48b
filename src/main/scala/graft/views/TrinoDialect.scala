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
    * statements from a Trino DDL script. The terminating `;` is found by a
    * scan that skips single-quoted string literals ('' escapes) and `--`
    * line comments, so a semicolon inside either cannot truncate a view
    * body.
    */
  def extractViews(script: String): Map[String, String] = {
    val header = """(?is)CREATE\s+OR\s+REPLACE\s+VIEW\s+([\w.]+)\s+AS\s+""".r
    header.findAllMatchIn(script).map { m =>
      val name = m.group(1).split('.').last
      name -> translate(script.substring(m.end, terminatorIndex(script, m.end)))
    }.toMap
  }

  /** Index of the statement-terminating `;` at or after `from` (or end of
    * script), ignoring semicolons inside SQL string literals and `--`
    * comments.
    */
  private def terminatorIndex(s: String, from: Int): Int = {
    var i = from
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1 // '' escape
          else inStr = false
        }
      } else c match {
        case '\'' => inStr = true
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          while (i < s.length && s.charAt(i) != '\n') i += 1
        case ';' => return i
        case _ =>
      }
      i += 1
    }
    s.length
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
