package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.Dataset

/** Bridge into the `org.apache.spark.sql` package-private surface:
  * constructing a DataFrame from a custom LogicalPlan. This is the
  * standard technique Spark extension libraries use to attach custom
  * operators (the alternative — a parser extension — is far heavier for
  * a programmatic API).
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
