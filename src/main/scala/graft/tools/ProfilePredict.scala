package graft.tools

import graft.runtime.GraftSession

/** Dev profiler for single-row serving: breaks the per-call cost of
  * [[graft.scoring.Predictor.predictEnvelope]] into plan-swap vs
  * execute, and prints whether the prepared fast path is active.
  * Usage: runMain graft.tools.ProfilePredict
  */
object ProfilePredict {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("profile-predict")
    spark.sparkContext.setLogLevel("ERROR")
    val pred = graft.scoring.Predictor.ruleOnly(spark)
    val env = """{"after": {"trans_date_trans_time": "1709280000000000", "cc_num": "100001",
      "merchant": "fraud_M1", "category": "misc_net", "amt": 42.5, "first": "B", "last": "U",
      "gender": "F", "street": "1 St", "city": "Austin", "state": "TX", "zip": "73301",
      "lat": 30.1, "long": -97.7, "city_pop": "500000", "job": "E", "dob": "3653",
      "trans_num": "PP_1", "unix_time": "1709280000", "merch_lat": 30.6, "merch_long": -97.2,
      "is_fraud": "0"}}""".replaceAll("\n\\s*", " ")
    println("fast-path active: " + pred.fastPathActive)
    (0 until 10).foreach(_ => pred.predictEnvelope(env))
    val times = (0 until 100).map { _ =>
      val t0 = System.nanoTime()
      val r = pred.predictEnvelope(env)
      require(r.nonEmpty)
      (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"p50 ${times(50)}%.1f ms  p95 ${times(95)}%.1f ms  min ${times.head}%.1f ms")
    spark.stop()
  }
}
