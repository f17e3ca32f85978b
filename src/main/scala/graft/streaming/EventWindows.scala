package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation over the events stream — beyond the
  * reference surface (it has stream positions but no event-time windows,
  * SURVEY §2.2); included because a training-data ingest pipeline needs
  * time-bucketed stats, and it is the idiomatic Structured Streaming shape:
  * watermark bounds state, late rows beyond it are dropped, output is
  * append-only once a window closes.
  *
  * The same plan runs batch (for the DuckDB oracle) and streaming
  * ([[tumblingStream]]); only the watermark differs — batch mode ignores it.
  */
object EventWindows {

  /** Long-nanos event time (TIMESTAMP(NANOS) parquet read under
    * `nanosAsLong`, or synthetic long streams in tests); convert to a
    * proper timestamp column. For reading a table whose `ts` encoding is
    * not known statically, use [[eventTimeOf]].
    */
  def eventTime(tsNanos: Column): Column =
    // decimal division, not `/ 1000L` (double): nanos near 2^60 exceed a
    // double's 2^53 integer range, so fp division can shift an event by
    // up to 1 microsecond across a window/second boundary
    timestamp_micros((tsNanos.cast("decimal(38,0)") / 1000).cast("long"))

  /** Event time normalized to TimestampType regardless of how the source
    * encodes it: long nanos (legacy TIMESTAMP(NANOS) parquet read under
    * `nanosAsLong`), naive TIMESTAMP_NTZ (plain timestamp[us] parquet —
    * the session timezone is UTC, so the cast preserves wall-clock), or
    * an already-zoned timestamp. Branching on the resolved schema keeps
    * every query working when the data's timestamp encoding changes
    * under it — and ONLY these known encodings are accepted: any other
    * type fails loudly here rather than casting to subtly wrong instants
    * (a long of micros would be misread 1000×; a string would null or
    * shift rows), so the NEXT encoding change surfaces as an error, not
    * as wrong windows.
    */
  def eventTimeOf(df: DataFrame, colName: String = "ts"): Column =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.LongType => eventTime(col(colName))
      case org.apache.spark.sql.types.TimestampType => col(colName)
      case org.apache.spark.sql.types.TimestampNTZType =>
        col(colName).cast("timestamp")
      case other => throw new IllegalArgumentException(
        s"unsupported event-time encoding for '$colName': $other — " +
          "expected long nanos, TIMESTAMP, or TIMESTAMP_NTZ; teach " +
          "EventWindows.eventTimeOf the new encoding explicitly")
    }

  /** Tumbling-window stats per event_type: rows and value sum per
    * (window, type). Window start is formatted as a string for
    * cross-engine comparison stability.
    */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .select(eventTimeOf(events).as("et"), col("event_type"), col("value"))
      .groupBy(window(col("et"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"),
        round(col("sum_value"), 6).as("sum_value"))

  /** Hopping (sliding) windows: every event lands in `width / slide`
    * overlapping windows — the smoothed rate/trend view a monitoring or
    * curriculum pipeline reads next to [[tumbling]]'s disjoint buckets.
    * Same shuffle shape as tumbling (the per-event window explosion is a
    * scan-side projection), output keyed by (window start, type).
    */
  def hopping(events: DataFrame, width: String = "1 hour",
              slide: String = "30 minutes"): DataFrame =
    events
      .select(eventTimeOf(events).as("et"), col("event_type"), col("value"))
      .groupBy(window(col("et"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"),
        round(col("sum_value"), 6).as("sum_value"))

  /** Streaming gap-sessionization per user — the streaming half of the
    * `events_sessions` shape: session state for a (user, session) keeps
    * MERGING while rows arrive within `gap` of it (sessions grow across
    * micro-batches); once the watermark passes a session's close
    * (last event + gap) it emits in append mode exactly once and its
    * state is dropped. Rows later than `lateness` are ignored — a closed
    * session is never re-opened or retro-counted.
    */
  def sessionStream(events: DataFrame, gap: String = "30 minutes",
                    lateness: String = "30 minutes"): DataFrame =
    events
      .select(eventTimeOf(events).as("et"), col("user_id"), col("value"))
      .withWatermark("et", lateness)
      .groupBy(session_window(col("et"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 6).as("sum_value"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Stream-stream INTERVAL JOIN — the attribution join of an event
    * pipeline ("which purchases followed a click within the window"),
    * run as a genuine two-stream join with per-side watermarks: each
    * purchase within `(c_et, c_et + window]` of a same-user click joins
    * in append mode, matches may span micro-batches (a click buffered in
    * state joins a purchase arriving later), and state for both sides is
    * dropped once the watermark passes the interval bound — the range
    * condition is what makes the state finite, exactly as
    * [[graft.operators.Temporal]]'s batch as-of join bounds its window.
    * Rows later than `lateness` are dropped, never retro-joined.
    *
    * Works identically on a batch frame (the join is a plain interval
    * join there) — the `events_stream_join` oracle replays it in SQL
    * and the streamed result must hash-equal it.
    *
    * Output: (click_id, purchase_id, user_id, gap_us) — the gap in exact
    * integer microseconds, cross-engine stable.
    */
  def intervalJoinStream(events: DataFrame, window: String = "1 hour",
                         lateness: String = "30 minutes"): DataFrame = {
    val base = events.select(col("event_id"), col("user_id"),
      col("event_type"), eventTimeOf(events).as("et"))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("et").as("c_et"))
      .withWatermark("c_et", lateness)
    val buys = base.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("__p_user"), col("et").as("p_et"))
      .withWatermark("p_et", lateness)
    clicks.join(buys,
      col("user_id") === col("__p_user") &&
        col("p_et") > col("c_et") &&
        col("p_et") <= col("c_et") + expr(s"INTERVAL $window"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (unix_micros(col("p_et")) - unix_micros(col("c_et"))).as("gap_us"))
  }

  /** Streaming event DEDUPLICATION with bounded state
    * (`dropDuplicatesWithinWatermark`): an at-least-once transport
    * (replayed partitions, duplicated feeds) collapses to one row per
    * event id, with the id's dedup state held only until the watermark
    * passes it — the state-bounded form of exactly-once ingestion
    * (plain `dropDuplicates` on a stream grows state forever). Within
    * the watermark a duplicate is dropped wherever it lands (same or
    * later micro-batch); a duplicate arriving LATER than the lateness
    * bound can re-emit — that is the documented trade: state size is
    * bounded by the lateness window, so the transport's redelivery
    * horizon must sit inside it. Emits (event_id, user_id, event_type)
    * in append mode.
    */
  def dedupStream(events: DataFrame,
                  lateness: String = "30 minutes"): DataFrame =
    events.select(col("event_id"), col("user_id"), col("event_type"),
        eventTimeOf(events).as("et"))
      .filter(col("event_id").isNotNull)
      .withWatermark("et", lateness)
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "user_id", "event_type")

  /** Streaming form with a watermark: state for a window is dropped once
    * the watermark passes its end; rows later than `lateness` are ignored.
    */
  def tumblingStream(events: DataFrame, width: String = "1 hour",
                     lateness: String = "30 minutes"): DataFrame =
    events
      .select(eventTimeOf(events).as("et"), col("event_type"), col("value"))
      .withWatermark("et", lateness)
      .groupBy(window(col("et"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"),
        round(col("sum_value"), 6).as("sum_value"))
}
