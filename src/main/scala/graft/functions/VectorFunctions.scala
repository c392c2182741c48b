package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Embedding-vector Column library: dot / norm / cosine over
  * `array<float|double>` columns using higher-order functions
  * (`zip_with` + `aggregate`), which stay in codegen — no UDF, no
  * serialization of the array to the JVM heap per row.
  *
  * All math is done in double: float inputs are cast up front so results
  * are bit-comparable with a double-precision oracle.
  */
object VectorFunctions {

  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    F.aggregate(F.zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      F.lit(0.0), (acc, x) => acc + x)

  def norm2(v: Column): Column = dot(v, v)

  def norm(v: Column): Column = F.sqrt(norm2(v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
