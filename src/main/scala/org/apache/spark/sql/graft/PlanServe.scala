package org.apache.spark.sql.graft

import org.apache.spark.{SparkEnv, TaskContext, TaskContextImpl}
import org.apache.spark.executor.TaskMetrics
import org.apache.spark.memory.TaskMemoryManager
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.SparkPlan

/** Driver-local execution of a SINGLE-partition physical plan — the
  * serving fast path for prepared one-row pipelines
  * ([[graft.scoring.Predictor]]): `SparkPlan.executeCollect` always
  * routes through a DAGScheduler job, and the submit/schedule/complete
  * round-trip is ~25–40 ms on an otherwise idle local master — two
  * orders of magnitude more than evaluating the row pipeline itself.
  * Here the one partition's iterator is computed ON the driver thread
  * under a synthetic TaskContext (operators and metrics require one),
  * which needs the `org.apache.spark` package-private constructor —
  * hence this bridge file, the same technique [[DatasetBridge]] uses
  * for `Dataset.ofRows`.
  *
  * Contract: the plan must be narrow (no exchanges — its `execute()`
  * RDD has exactly one partition; anything else throws and the caller
  * falls back to the job path) and driver-resident (LocalTableScan
  * leaves). Output rows are copied out of the iterator (operators
  * reuse row buffers). The synthetic task is marked completed in a
  * finally so operator completion listeners run and task memory is
  * reclaimed even on failure.
  */
object PlanServe {

  def localCollect(plan: SparkPlan): Array[InternalRow] = {
    val rdd = plan.execute()
    val parts = rdd.partitions
    require(parts.length == 1,
      s"localCollect serves single-partition plans; got ${parts.length}")
    val env = SparkEnv.get
    val tmm = new TaskMemoryManager(env.memoryManager, 0L)
    val tc = new TaskContextImpl(
      0, 0, parts(0).index, 0L, 0, 1, tmm,
      new java.util.Properties(), env.metricsSystem, TaskMetrics.empty,
      1, Map.empty)
    try TaskContext.withTaskContext(tc) {
      rdd.iterator(parts(0), tc).map(_.copy()).toArray
    } finally {
      tc.markTaskCompleted(None)
      tmm.cleanUpAllAllocatedMemory()
      ()
    }
  }
}
