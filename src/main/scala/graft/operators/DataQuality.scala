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

  // ---- constraint checks (expectations): each builder returns the
  // VIOLATING rows; violationCounts folds any set of them into one
  // summary frame (one job, one row per check) for a quality gate to
  // assert `n_violations == 0` on.

  /** Child rows whose key has no parent — referential-integrity
    * violations, as a left-anti join (never a driver-side key collect).
    */
  def fkViolations(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(F.col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")

  /** Keys appearing more than once — primary-key/uniqueness violations
    * (one row per duplicated key value, with its multiplicity).
    */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n"))
      .filter(F.col("n") > 1)

  /** Rows whose column falls outside [lo, hi] (NULL is not a violation —
    * pair with [[nullProfile]] for null policy).
    */
  def rangeViolations(df: DataFrame, col: String, lo: Double, hi: Double): DataFrame =
    df.filter(F.col(col) < lo || F.col(col) > hi)

  /** One summary row per named check: (check_name, n_violations). The
    * checks union into a single lazy plan — one action scans everything,
    * and each count is a partial-aggregated scan, not a collected
    * result.
    */
  def violationCounts(checks: Seq[(String, DataFrame)]): DataFrame =
    checks.map { case (name, v) =>
      v.agg(F.count(F.lit(1)).as("n_violations"))
        .select(F.lit(name).as("check_name"), F.col("n_violations"))
    }.reduce(_ unionAll _)
}
