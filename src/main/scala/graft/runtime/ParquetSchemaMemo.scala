package graft.runtime

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema memo for bare-path parquet directories — the metastore role a
  * catalog table would play (round-15 optimization, guide §1/§6): without
  * it every `spark.read.parquet` re-infers the schema (a footer-read job
  * plus DataSource resolution, ~30-80 ms on this box), and a 116-query
  * bench pays that once per query per table; the engine's own commit
  * protocol pays it once per version-directory read.
  *
  * Soundness: entries are keyed by path and validated against a directory
  * FINGERPRINT (file names, lengths, mtimes) on every use — a directory
  * rewritten in place (test fixtures, replayed version dirs) changes its
  * fingerprint and misses, falling back to normal inference. Only
  * byte-identical directory states hit. The DATA is still scanned from
  * parquet on every query — only the schema, which is derivable metadata,
  * is reused; results never are.
  */
object ParquetSchemaMemo {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, StructType)]()

  /** Fingerprint = fold of the TOP-LEVEL listing (names, lengths,
    * mtimes). CONTRACT (round-16 advice): callers memo only FLAT
    * parquet directories — files directly under `path`, no partition
    * subdirectories — because an in-place rewrite two levels down need
    * not change any top-level entry, so a stale schema would validate.
    * The fingerprint enforces this by refusing to memo a path with
    * subdirectories (returns the never-memo sentinel). Every current
    * call site (Tables' bare tables, Snapshots' `version=N` dirs) is
    * flat; a partitioned layout falls back to normal inference.
    */
  private def fingerprint(spark: SparkSession, path: String): Long =
    try {
      val p = new Path(path)
      val f = p.getFileSystem(spark.sessionState.newHadoopConf())
      val listing = f.listStatus(p)
      if (listing.exists(_.isDirectory)) Long.MinValue // non-flat: never memo
      else listing.foldLeft(0L) { (acc, st) =>
        acc * 1000003L + st.getPath.getName.hashCode.toLong * 31L +
          st.getLen * 7L + st.getModificationTime
      }
    } catch { case _: Exception => Long.MinValue } // unreadable: never memo

  /** Read `path` as parquet, schema-bound when the memo holds a
    * fingerprint-valid entry, inferring (and memoizing) otherwise.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fp = fingerprint(spark, path)
    Option(memo.get(path)).filter(c => fp != Long.MinValue && c._1 == fp) match {
      case Some((_, schema)) => spark.read.schema(schema).parquet(path)
      case None =>
        val df = spark.read.parquet(path)
        if (fp != Long.MinValue) {
          if (memo.size > 512) memo.clear() // bound driver footprint
          memo.put(path, (fp, df.schema))
        }
        df
    }
  }

  /** Seed the memo after a write this JVM just performed — the writer
    * knows the schema for free; the fingerprint taken now re-validates
    * the entry if anything rewrites the directory later.
    */
  def seed(spark: SparkSession, path: String, schema: StructType): Unit = {
    val fp = fingerprint(spark, path)
    if (fp != Long.MinValue) {
      if (memo.size > 512) memo.clear()
      memo.put(path, (fp, schema))
    }
  }
}
