package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available at session build time —
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)            // programmatic
  * // or spark.sql.extensions=graft.plans.GraftExtensions (config)
  * }}}
  *
  * Sessions created elsewhere (e.g. the driver's Verify/Bench mains) get
  * the same functions via the runtime path `GraftFunctions.register`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("haversine_km"),
      new ExpressionInfo(classOf[HaversineExpression].getName, "haversine_km"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4, "haversine_km(lat1, lon1, lat2, lon2)")
        val Seq(a, b, c, d) = exprs.map(x => Cast(x, DoubleType): Expression)
        HaversineExpression(a, b, c, d)
      }))
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "vec_dot(a, b)")
        DotProduct(exprs(0), exprs(1))
      }))
    e.injectPlannerStrategy(_ => BandJoin.BandJoinStrategy)
  }
}
