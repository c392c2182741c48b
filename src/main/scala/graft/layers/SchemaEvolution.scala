package graft.layers

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's ad-hoc schema-evolution handling (SURVEY §1.3,
  * `silver_job.py:204-227`): probe whether an append is schema-compatible
  * with the existing layer; on conflict, rewrite the layer with the new
  * schema (`overwriteSchema=true` analog).
  */
object SchemaEvolution {

  /** Returns "append" or "overwrite" — whichever was performed. */
  def writeWithSchemaFallback(df: DataFrame, path: String): String = {
    val spark = df.sparkSession
    val compatible = existingSchema(spark, path) match {
      case None => true
      case Some(old) =>
        // append is safe iff every existing column is present with the
        // same type (new columns would silently diverge partitions)
        old.fields.forall(f =>
          df.schema.fields.exists(g => g.name == f.name && g.dataType == f.dataType)) &&
          df.schema.fields.forall(g => old.fieldNames.contains(g.name))
    }
    if (compatible) {
      df.write.mode("append").parquet(path)
      "append"
    } else {
      df.write.mode("overwrite").parquet(path)
      "overwrite"
    }
  }

  private def existingSchema(spark: SparkSession, path: String) =
    if (new java.io.File(path).exists())
      scala.util.Try(spark.read.parquet(path).schema).toOption
    else None
}
