package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventWindows

/** The streaming half of the events tier (the batch half is oracled by
  * `events_windowed`): watermark semantics of
  * [[EventWindows.tumblingStream]] — append mode emits a window exactly
  * once, only after the watermark passes its end, and rows arriving
  * later than the lateness bound are dropped, never retro-counted. Plus
  * the strict-encoding contract of [[EventWindows.eventTimeOf]].
  */
class EventWindowsSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000000L // one hour in nanos (epoch base 0)

  test("tumblingStream: closed windows emit once; late rows are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Double)]
    val q = EventWindows.tumblingStream(
        src.toDF().selectExpr("_1 as ts", "_2 as event_type", "_3 as value"),
        width = "1 hour", lateness = "30 minutes")
      .writeStream.format("memory").queryName("ew")
      .outputMode("append").start()
    try {
      def rows() = spark.table("ew")
        .select("w_start", "n", "sum_value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sorted
      // batch 1: two rows in [10:00,11:00) plus one at 12:00 that moves
      // the watermark to 11:30 — the trailing no-data micro-batch then
      // closes [10:00,11:00) and emits it, once
      src.addData((10 * H + 5, "a", 1.0), (10 * H + 7, "a", 2.0),
        (12 * H, "a", 4.0))
      q.processAllAvailable()
      assert(rows() == Seq(("1970-01-01 10:00:00", 2L, 3.0)),
        s"the passed window must emit with its two rows, got ${rows()}")
      // batch 2: a LATE row for the 10:00 window — 10:00:09 is far beyond
      // the 11:30 watermark, so it is DROPPED: the closed window neither
      // re-emits nor retro-counts. The other rows move the watermark to
      // 13:30, closing [12:00,13:00) with one row from EACH batch (state
      // crossed micro-batches).
      src.addData((10 * H + 9, "a", 100.0), (12 * H + 600, "a", 8.0),
        (14 * H, "a", 16.0))
      q.processAllAvailable()
      assert(rows() == Seq(
        ("1970-01-01 10:00:00", 2L, 3.0),
        ("1970-01-01 12:00:00", 2L, 12.0)),
        "late row must be dropped and closed windows must emit exactly " +
          s"once: ${rows()}")
      // batch 3: watermark to 15:30 — [14:00,15:00) closes; the earlier
      // windows still appear exactly once in the append sink
      src.addData((16 * H, "a", 32.0))
      q.processAllAvailable()
      assert(rows() == Seq(
        ("1970-01-01 10:00:00", 2L, 3.0),
        ("1970-01-01 12:00:00", 2L, 12.0),
        ("1970-01-01 14:00:00", 1L, 16.0)),
        s"exactly-once emission expected: ${rows()}")
    } finally q.stop()
  }

  test("intervalJoinStream: same-batch and cross-batch matches, " +
      "out-of-window never joins, late rows dropped after state cleanup") {
    implicit val sqlCtx = spark.sqlContext
    val M = 60L * 1000000000L // one minute in nanos
    val src = MemoryStream[(Long, Long, String, Long)]
    val df = src.toDF().selectExpr("_1 as event_id", "_2 as user_id",
      "_3 as event_type", "_4 as ts")
    val q = EventWindows.intervalJoinStream(df,
        window = "1 hour", lateness = "30 minutes")
      .writeStream.format("memory").queryName("ew_join")
      .outputMode("append").start()
    try {
      def rows() = spark.table("ew_join")
        .select("click_id", "purchase_id", "user_id", "gap_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq.sorted
      // batch 1: a same-batch match (u1, 20 min gap) and a click (u2)
      // whose purchase has not arrived yet
      src.addData((1L, 1L, "click", 10 * H),
        (2L, 1L, "purchase", 10 * H + 20 * M),
        (3L, 2L, "click", 10 * H))
      q.processAllAvailable()
      assert(rows() == Seq((1L, 2L, 1L, 20L * 60 * 1000000)),
        s"same-batch interval match expected, got ${rows()}")
      // batch 2: u2's purchase matches the BUFFERED batch-1 click
      // (state crossed micro-batches); u1's 11:30 purchase is outside
      // the hour and must not join
      src.addData((4L, 2L, "purchase", 10 * H + 30 * M),
        (5L, 1L, "purchase", 11 * H + 30 * M))
      q.processAllAvailable()
      assert(rows().map(t => (t._1, t._2)) == Seq((1L, 2L), (3L, 4L)),
        s"cross-batch match (3,4) and no out-of-window (1,5): ${rows()}")
      // push BOTH side watermarks far ahead (each side only sees its own
      // event type), evicting the 10:00 state...
      src.addData((6L, 9L, "click", 20 * H),
        (7L, 9L, "purchase", 20 * H + 1))
      q.processAllAvailable()
      // ...then a purchase inside click 1's window but far beyond the
      // watermark: dropped, never retro-joined
      src.addData((8L, 1L, "purchase", 10 * H + 10 * M))
      q.processAllAvailable()
      val clicks1 = rows().filter(_._1 == 1L)
      assert(clicks1 == Seq((1L, 2L, 1L, 20L * 60 * 1000000)),
        s"late purchase must not retro-join an evicted click: ${rows()}")
      // stream ≡ batch on the same non-late data (8 was late-dropped;
      // intervalJoinStream on a batch frame is a plain interval join)
      val batchRows = EventWindows.intervalJoinStream(
        Seq((1L, 1L, "click", 10 * H), (2L, 1L, "purchase", 10 * H + 20 * M),
          (3L, 2L, "click", 10 * H), (4L, 2L, "purchase", 10 * H + 30 * M),
          (5L, 1L, "purchase", 11 * H + 30 * M),
          (6L, 9L, "click", 20 * H), (7L, 9L, "purchase", 20 * H + 1))
          .toDF("event_id", "user_id", "event_type", "ts"),
        window = "1 hour", lateness = "30 minutes")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq.sorted
      assert(batchRows == rows(), "stream must equal the batch interval join")
    } finally q.stop()
  }

  test("dedupStream: duplicates dropped within the watermark (same and " +
      "later micro-batch); an expired id re-emits — the state bound") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Long, String, Long)]
    val df = src.toDF().selectExpr("_1 as event_id", "_2 as user_id",
      "_3 as event_type", "_4 as ts")
    val q = EventWindows.dedupStream(df, lateness = "30 minutes")
      .writeStream.format("memory").queryName("ew_dedup")
      .outputMode("append").start()
    try {
      def rows() = spark.table("ew_dedup")
        .select("event_id").collect().map(_.getLong(0)).toSeq.sorted
      // batch 1: id 1 delivered twice in one batch, id 2 once
      src.addData((1L, 7L, "click", 10 * H), (1L, 7L, "click", 10 * H),
        (2L, 7L, "view", 10 * H))
      q.processAllAvailable()
      assert(rows() == Seq(1L, 2L), s"same-batch dup must drop: ${rows()}")
      // batch 2: id 1 redelivered within the watermark — dropped
      src.addData((1L, 7L, "click", 10 * H + 60L * 1000000000L))
      q.processAllAvailable()
      assert(rows() == Seq(1L, 2L), s"cross-batch dup must drop: ${rows()}")
      // advance the watermark far past id 1's state, then redeliver:
      // state was dropped, so the duplicate re-emits — the documented
      // bounded-state trade (the transport's redelivery horizon must
      // sit inside the lateness window)
      src.addData((9L, 7L, "view", 20 * H))
      q.processAllAvailable()
      src.addData((1L, 7L, "click", 20 * H))
      q.processAllAvailable()
      assert(rows() == Seq(1L, 1L, 2L, 9L),
        s"expired-state redelivery re-emits by design: ${rows()}")
    } finally q.stop()
  }

  test("batch and stream forms agree on the same (non-late) rows") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq((10 * H + 5, "a", 1.0), (10 * H + 7, "b", 2.0),
      (12 * H, "a", 4.0), (14 * H, "a", 16.0))
    val batch = EventWindows.tumbling(
        data.toDF("ts", "event_type", "value"), width = "1 hour")
      .collect().map(_.toSeq).toSet
    val src = MemoryStream[(Long, String, Double)]
    src.addData(data)
    val q = EventWindows.tumblingStream(
        src.toDF().selectExpr("_1 as ts", "_2 as event_type", "_3 as value"),
        width = "1 hour", lateness = "30 minutes")
      .writeStream.format("memory").queryName("ew_agree")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      src.addData((16 * H, "a", 0.5)) // close everything below 13:00
      q.processAllAvailable()
      val streamed = spark.table("ew_agree").collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"stream $streamed must equal batch $batch for closed windows")
    } finally q.stop()
  }

  test("sessionStream: sessions merge across batches, close once, drop late") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Long, Double)]
    val q = graft.streaming.EventWindows.sessionStream(
        src.toDF().selectExpr("_1 as ts", "_2 as user_id", "_3 as value"),
        gap = "30 minutes", lateness = "30 minutes")
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      def rows() = spark.table("sess")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSeq.sorted
      val M = H / 60 // one minute in nanos
      // batch 1: user 1's two rows 10 minutes apart form ONE session
      // [10:00, 10:40); the 12:00 rows seed later sessions and push the
      // watermark to 11:30, which closes the first session
      src.addData((10 * H, 1L, 1.0), (10 * H + 10 * M, 1L, 2.0),
        (12 * H, 1L, 4.0), (12 * H, 2L, 8.0))
      q.processAllAvailable()
      assert(rows() == Seq((1L, "1970-01-01 10:00:00", 2L, 3.0)),
        s"only the watermark-passed session may emit: ${rows()}")
      // batch 2: a late row inside the CLOSED session (10:20 < 11:30
      // watermark) must be dropped, not re-open it; user 2's 12:20 row
      // MERGES into their open 12:00 session (state crossed batches);
      // 14:00 moves the watermark to 13:30, closing both 12:00 sessions
      src.addData((10 * H + 20 * M, 1L, 100.0), (12 * H + 20 * M, 2L, 16.0),
        (14 * H, 1L, 32.0))
      q.processAllAvailable()
      assert(rows() == Seq(
        (1L, "1970-01-01 10:00:00", 2L, 3.0),
        (1L, "1970-01-01 12:00:00", 1L, 4.0),
        (2L, "1970-01-01 12:00:00", 2L, 24.0)),
        "late row dropped; user 2's session must merge to n=2 across " +
          s"batches: ${rows()}")
      // batch 3: watermark to 15:30 closes [14:00, 14:30); nothing
      // emitted twice
      src.addData((16 * H, 1L, 0.5))
      q.processAllAvailable()
      assert(rows() == Seq(
        (1L, "1970-01-01 10:00:00", 2L, 3.0),
        (1L, "1970-01-01 12:00:00", 1L, 4.0),
        (1L, "1970-01-01 14:00:00", 1L, 32.0),
        (2L, "1970-01-01 12:00:00", 2L, 24.0)),
        s"exactly-once session emission expected: ${rows()}")
    } finally q.stop()
  }

  test("eventTimeOf: known encodings only; unknown types fail loudly") {
    // long nanos and TIMESTAMP_NTZ both normalize; the values agree
    val ntz = Seq(1L).toDF("x")
      .select(timestamp_micros(lit(10 * H / 1000)).cast("timestamp_ntz")
        .as("ts"))
    val lng = Seq(10 * H).toDF("ts")
    val a = ntz.select(EventWindows.eventTimeOf(ntz).cast("long")).head().getLong(0)
    val b = lng.select(EventWindows.eventTimeOf(lng).cast("long")).head().getLong(0)
    assert(a == b && a == 10 * 3600L)
    // an unrecognized encoding is an ERROR, not a silent cast: a string
    // (or a long of micros posing as some other unit) must not produce
    // subtly shifted windows
    val bad = Seq("2020-01-01 00:00:00").toDF("ts")
    val e = intercept[IllegalArgumentException](EventWindows.eventTimeOf(bad))
    assert(e.getMessage.contains("unsupported event-time encoding"))
  }
}
