package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Manual skew mitigation: salted equi-join.
  *
  * AQE's skew-join split handles most skew at runtime; salting is the
  * explicit tool for pathological keys (one merchant with 10% of all
  * transactions). The large side gets a deterministic salt derived from a
  * unique column; the small side is exploded across every salt value, so
  * the hot key's rows spread over `saltFactor` reducers. The join result
  * is IDENTICAL to the unsalted join — which is exactly how the oracle
  * checks it (qa02's DuckDB twin is the plain join).
  */
object SkewJoin {

  /** @param large       skewed fact side
    * @param small       replicated side (appears saltFactor times)
    * @param keys        equi-join key column names (shared)
    * @param uniqueCol   any column of `large` whose hash spreads rows
    *                    (a row id / primary key); drives the salt
    * @param saltFactor  number of salt buckets per key
    */
  def saltedEquiJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      uniqueCol: String,
      saltFactor: Int): DataFrame = {

    val salted = large.withColumn("__salt",
      F.pmod(F.xxhash64(F.col(uniqueCol)), F.lit(saltFactor)).cast("int"))

    val saltsExploded = small.withColumn("__salt",
      F.explode(F.sequence(F.lit(0), F.lit(saltFactor - 1))))

    salted.join(saltsExploded, keys :+ "__salt").drop("__salt")
  }
}
