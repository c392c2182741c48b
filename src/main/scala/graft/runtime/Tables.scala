package graft.runtime

import org.apache.spark.sql.{functions => F, DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-provided star-schema parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's vectorized
  * reader, predicate pushdown, and column pruning apply — callers should
  * `.select`/`.filter` immediately after load and let the optimizer prune
  * the scan (verified via `PushedFilters`/`ReadSchema` in explain output).
  *
  * Timestamp regimes (the driver regenerates the testdata per round and
  * the writer's encoding has changed): TIMESTAMP(NANOS) is decoded via
  * the long fallback in [[loadEvents]]; unadjusted TIMESTAMP(MICROS) is
  * read as TimestampType AT THE SCAN by the
  * `spark.sql.parquet.inferTimestampNTZ.enabled=false` conf every graft
  * session builder sets (pushdown preserved). [[normalizeNtz]] is the
  * belt-and-braces for a FOREIGN session (e.g. a driver harness calling
  * `SparkEntry.entry` on its own SparkSession without that conf): any
  * NTZ column that still reaches us is cast to the session-UTC instant —
  * a no-op under graft sessions.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // schema inference is paid once per distinct directory STATE, not once
  // per query — see [[ParquetSchemaMemo]] (round-15 optimization)
  private def readTable(spark: SparkSession, path: String): DataFrame =
    ParquetSchemaMemo.read(spark, path)

  /** Dimension tables small enough to broadcast at ANY scale factor —
    * region/nation are bounded by geography (25 nations), not by SF.
    */
  val broadcastableAlways: Set[String] = Set("region", "nation")

  private def normalizeNtz(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.collect { case f if f.dataType == TimestampNTZType => f.name }
    if (ntz.isEmpty) df
    else df.select(df.columns.toSeq.map { c =>
      if (ntz.contains(c)) F.col(c).cast(TimestampType).as(c) else F.col(c)
    }: _*)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else normalizeNtz(readTable(spark, s"$dir/$name.parquet"))

  /** In the NANOS regime events.ts is rejected by Spark's reader: read it
    * as long and truncate to µs with integer division — identical to
    * DuckDB's ns→µs truncation, so oracle timestamps match. In the MICROS
    * regime the scan (or the NTZ fallback) yields TimestampType directly.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = readTable(spark, s"$dir/events.parquet")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else normalizeNtz(df)
  }

  /** Register every table as a temp view for the spark.sql query layer
    * (the analog of the reference's Hive-catalog registration,
    * `spark/app/register_tables_to_hive.py:72-76`).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
