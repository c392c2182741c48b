package graft.runtime

import org.apache.spark.sql.SparkSession

/** Persistent catalog registration — the analog of the reference's Hive
  * external-table registration (`spark/app/register_tables_to_hive.py:72-76`,
  * `docs/ARCHITECTURE.md:355-357`): `CREATE TABLE ... USING parquet
  * LOCATION`, so any NEW session — including a fresh JVM against the same
  * metastore — discovers the lakehouse tables without re-registration.
  * `createOrReplaceTempView` (Tables.registerAll) remains the
  * session-scoped fast path; this is the durable one.
  *
  * Pair with [[GraftSession.persistentBuilder]] (embedded-Derby Hive
  * metastore). On a real cluster the identical DDL runs against the shared
  * Hive metastore / Glue — only the metastore connection changes, which is
  * exactly the reference's deployment shape (Hive thrift at
  * `register_tables_to_hive.py:21-27`).
  */
object Catalog {

  /** Idempotent external-table registration. No column list: schema and
    * partition columns are inferred from the parquet layout, as the
    * reference's Delta registration infers from the table log. For
    * partitioned layouts (bronze/silver y/m/d), pass `partitioned = true`
    * so the metastore records every partition (`MSCK REPAIR` =
    * `ALTER TABLE ... RECOVER PARTITIONS`) and date-predicate queries
    * prune partitions from metastore metadata without listing the
    * filesystem.
    */
  def registerExternal(
      spark: SparkSession,
      name: String,
      location: String,
      partitioned: Boolean = false): Unit = {
    spark.sql(s"CREATE TABLE IF NOT EXISTS `$name` USING parquet LOCATION '$location'")
    if (partitioned) spark.sql(s"MSCK REPAIR TABLE `$name`")
  }

  /** The gold star schema (`gold_job.py:36-49` table set). */
  val goldTables: Seq[String] =
    Seq("dim_customer", "dim_merchant", "dim_time", "dim_location", "fact_transactions")

  def registerGold(spark: SparkSession, goldDir: String): Unit =
    goldTables.foreach(t => registerExternal(spark, t, s"$goldDir/$t"))

  /** Register the medallion layers like `register_tables_to_hive.py` does
    * for bronze/silver/gold: partitioned layers get partition recovery.
    */
  def registerLayers(
      spark: SparkSession,
      bronzePath: Option[String] = None,
      silverPath: Option[String] = None,
      goldDir: Option[String] = None): Unit = {
    bronzePath.foreach(p =>
      registerExternal(spark, "bronze_transactions", p, partitioned = true))
    silverPath.foreach(p =>
      registerExternal(spark, "silver_transactions", p, partitioned = true))
    goldDir.foreach(g => registerGold(spark, g))
  }
}
