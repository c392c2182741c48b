package graft.runtime

import org.apache.spark.sql.{functions => F, DataFrame, SparkSession}
import org.apache.spark.sql.types.LongType

/** Loader for the driver-provided star-schema parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's vectorized
  * reader, predicate pushdown, and column pruning apply — callers should
  * `.select`/`.filter` immediately after load and let the optimizer prune
  * the scan (verified via `PushedFilters`/`ReadSchema` in explain output).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at ANY scale factor —
    * region/nation are bounded by geography (25 nations), not by SF.
    */
  val broadcastableAlways: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    * read it as long and truncate to µs with integer division — identical
    * to DuckDB's ns→µs truncation, so oracle timestamps match.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else df
  }

  /** Register every table as a temp view for the spark.sql query layer
    * (the analog of the reference's Hive-catalog registration,
    * `spark/app/register_tables_to_hive.py:72-76`).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
