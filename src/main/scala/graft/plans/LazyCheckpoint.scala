package graft.plans

import org.apache.spark.sql.DataFrame

/** Lazy `localCheckpoint` for a plan shared by MULTIPLE concurrent
  * consumers, with bounded retention of the pre-checkpoint physical plan.
  *
  * Why retention is needed: a lazily-checkpointed RDD consumed by several
  * independent AQE query stages is materialized by whichever stage-job
  * runs it first. When that job completes, `RDD.markCheckpointed()`
  * truncates the lineage — the pre-checkpoint plan subtree (and the
  * `SQLMetric` accumulators hanging off its nodes) becomes unreachable
  * the moment the intermediate `Dataset` goes out of scope. Sibling
  * stage-jobs that started BEFORE the truncation still carry the full
  * pre-checkpoint binary in their running tasks; when such a task
  * completes after a GC has cleared the now-weakly-referenced
  * accumulators from `AccumulatorContext`, the driver logs
  * `ERROR DAGScheduler: Failed to update accumulator N (Unknown class)
  * ... attempted to access non-existent accumulator` — harmless for
  * results (the updates were for a dead plan's metrics) but
  * indistinguishable from a real scheduler fault in the logs.
  * (Reproduced deterministically with a 2 GiB driver heap on the
  * MinHash family, whose hashed-shingle checkpoint feeds three
  * concurrent stages; an eager checkpoint also fixes it but costs an
  * extra blocking job and un-fuses the scan — measured +20% warm.)
  *
  * The fix: keep the pre-checkpoint `executedPlan` strongly referenced a
  * little longer. The race window is within one query (seconds), so a
  * small FIFO of recent plans is ample; plan trees are control-plane
  * sized. Eviction hands cleanup back to the GC + ContextCleaner.
  */
object LazyCheckpoint {

  private val MaxRetained = 16
  private val retained = new java.util.ArrayDeque[AnyRef](MaxRetained + 1)

  /** `df.localCheckpoint(eager = false)` + retention of `df`'s physical
    * plan. Use for every lazy checkpoint whose output feeds more than one
    * consumer subtree (concurrent AQE stage-jobs).
    */
  def shared(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(eager = false)
    retain(df.queryExecution.executedPlan)
    out
  }

  private def retain(plan: AnyRef): Unit = synchronized {
    retained.addLast(plan)
    while (retained.size > MaxRetained) retained.removeFirst()
  }
}
