package graft.runtime

/** Shared per-stage timing wrapper for the profiling `onStage` hooks
  * ([[graft.streaming.CorpusIngestStream.processBatch]],
  * [[graft.operators.NearDupIndex.appendCoded]]): no-op when the hook is
  * null (production), otherwise reports (stage, seconds). One home so
  * the two call sites cannot drift.
  */
private[graft] object StageTimer {
  def staged[T](onStage: (String, Double) => Unit, name: String)(body: => T): T =
    if (onStage == null) body
    else {
      val t0 = System.nanoTime()
      val r = body
      onStage(name, (System.nanoTime() - t0) / 1e9)
      r
    }
}
