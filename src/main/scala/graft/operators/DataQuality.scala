package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Data-quality profiling — the reference's notebook EDA checks
  * (`notebooks/01-data-exploration.ipynb` cells 5/9: per-column null
  * counts, class distribution, feature presence) as reusable operators.
  * One pass over the data per profile (a single aggregate row), not a
  * per-column loop of jobs.
  */
object DataQuality {

  /** (column, n_null, null_fraction) — computed in ONE aggregate. */
  def nullProfile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = F.count(F.lit(1)).as("__total") +:
      df.columns.map(c => F.count(F.when(F.col(c).isNull, F.lit(1))).as(s"__null_$c")).toSeq
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getAs[Long]("__total")
    df.columns.toSeq.map { c =>
      val n = row.getAs[Long](s"__null_$c")
      (c, n, if (total == 0) 0.0 else n.toDouble / total)
    }.toDF("column", "n_null", "null_fraction")
  }

  /** Label distribution with fractions (class-imbalance check). */
  def classDistribution(df: DataFrame, labelCol: String): DataFrame = {
    val counts = df.groupBy(labelCol).agg(F.count(F.lit(1)).as("n"))
    val total = F.sum(F.col("n")).over()
    counts.withColumn("fraction", F.round(F.col("n") / total, 6))
      .orderBy(labelCol)
  }

  /** Columns an ML contract expects but the frame lacks (feature-presence
    * verification against the 15-feature contract).
    */
  def missingColumns(df: DataFrame, contract: Seq[String]): Seq[String] =
    contract.filterNot(df.columns.contains)
}
