package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.streaming.StreamingQuery

/** Per-query DATA-time side channel for the bench artifact: streaming
  * queries are init-dominated (stream standup, checkpoint dir, file
  * listing are a near-constant ~seconds regardless of data volume), so
  * a wall-clock-only number can mask a regression in the actual
  * per-batch work. Streaming queries report their measured per-batch
  * processing time here (from Spark's own progress metrics); [[Bench]]
  * drains the channel after every pass and emits the split alongside
  * the wall-clock duration — `init ≈ wall − data` is then readable off
  * the artifact, and a data-side regression is visible even under the
  * constant init term.
  *
  * Additive per key within one pass (a query may run several streams);
  * thread-safe because foreachBatch callbacks may land off-thread.
  * Recording is unconditional — the cost is a map write per stream, so
  * the production query code stays identical under Verify and Bench.
  */
object BenchProbe {

  private val segs = new ConcurrentHashMap[String, Double]()

  /** Add `sec` seconds of measured DATA work under `key`. */
  def addData(key: String, sec: Double): Unit =
    segs.merge(key, sec, (a, b) => a + b)

  /** Record a finished streaming query's data time: the sum of its
    * micro-batches' `addBatch` durations (the execute-the-batch phase;
    * offset/WAL/planning overheads count as init). `recentProgress`
    * retains only `spark.sql.streaming.numRecentProgressUpdates`
    * entries — [[GraftSession]] raises it to 10 000 so a long
    * many-micro-batch stream cannot silently under-report.
    */
  def addStreamData(key: String, q: StreamingQuery): Unit =
    addData(key, q.recentProgress.iterator.map { p =>
      Option(p.durationMs.get("addBatch")).map(_.toDouble).getOrElse(0.0)
    }.sum / 1000.0)

  /** Snapshot and clear — one call per bench pass. */
  def drain(): Map[String, Double] = {
    val out = scala.jdk.CollectionConverters
      .MapHasAsScala(segs).asScala.toMap
    segs.clear()
    out
  }
}
