package graft

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions._
import graft.model._
import graft.operators._
import graft.streaming.StreamingIndex

/** The engine's query surface: one entry per operator (SURVEY §2) plus the
  * training-data-pipeline extensions, each with a DuckDB oracle where the
  * semantics are ANSI-SQL-expressible (driver correctness gate), rows-only
  * otherwise (covered by ScalaTest instead).
  *
  * Oracle-determinism rules used throughout:
  *  - every query ends in a total ORDER BY over non-null columns (or has
  *    explicit NULLS FIRST/LAST matching Spark's asc-nulls-first default);
  *  - doubles are either raw parquet values, exact int/int divisions, or
  *    expressions mirrored op-for-op between Spark and SQL (+ round only on
  *    genuinely accumulated values);
  *  - counts/ranks are cast to BIGINT on both sides.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- helpers

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Recursive file-tree copy (driver-local store surgery for the
    * store-equivalence queries: clone a built version so two apply
    * paths share one frozen model without retraining).
    */
  private def copyTree(from: java.nio.file.Path,
                       to: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(from)
    try walk.iterator().asScala.foreach { p =>
      val dest = to.resolve(from.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(dest)
      else {
        java.nio.file.Files.createDirectories(dest.getParent)
        java.nio.file.Files.copy(p, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } finally walk.close()
  }

  private def emptyIndex(s: SparkSession): DataFrame =
    s.range(0).select(col("id").cast("double").as("key"), col("id").as("docid"))

  private def changeFeed(s: SparkSession, d: String): DataFrame =
    ChangeFeed.fromEvents(Tables.events(s, d))

  private val mergeDef = IndexDef("idx_value", "events", "docid",
    secExprs = Seq("value"), whereExpr = Some("value >= 10.0"))

  /** Fold the change feed through N incremental merges (ordered seqno
    * slices) — the multi-batch MAINT path, not a single-shot window.
    */
  private def foldMerges(s: SparkSession, d: String, defn: IndexDef,
                         cutoff: Option[Long] = None, batches: Int = 4): DataFrame = {
    val feed0 = changeFeed(s, d)
    // one scan of the feed for the whole fold: the high-water-mark probe
    // materializes the lazy checkpoint, and the N batch slices then read
    // the persisted partitions instead of re-planning the parquet scan
    val feed = graft.plans.LazyCheckpoint.shared(
      cutoff.fold(feed0)(c => feed0.filter(col("seqno") <= c)))
    val maxRow = feed.agg(max("seqno")).head()
    if (maxRow.isNullAt(0)) return emptyIndex(s).orderBy("key", "docid")
    val maxSeq = maxRow.getLong(0)
    val step = maxSeq / batches + 1
    var index = emptyIndex(s)
    for (i <- 0L until batches.toLong) {
      val batch = feed.filter(col("seqno") >= i * step && col("seqno") < (i + 1) * step)
      // merge() checkpoints each batch's per-docid aggregate (the state that
      // is scanned repeatedly), so the index chain itself can stay lazy: the
      // N generations compose into ONE pipeline of broadcast anti-joins +
      // unions that executes in a single job. Materializing every
      // generation (a full index write per batch) is the durability shape —
      // that lives in the streaming path (StreamingIndex.maintain), which
      // rewrites only the partitions a batch touches.
      index = IndexMaintainer.merge(index, batch, defn)
    }
    index.orderBy("key", "docid")
  }

  /** SQL body shared by the merge oracles: last writer per docid wins.
    * The event→change mapping comes from [[ChangeFeed.oracleSelect]] (the
    * single source of truth the Spark side also derives from).
    */
  private def mergeOracle(opcodeFilter: String, seqnoFilter: String): String =
    s"""WITH ch AS (
       |  ${ChangeFeed.oracleSelect} $seqnoFilter),
       |latest AS (
       |  SELECT docid, value, opcode,
       |         row_number() OVER (PARTITION BY docid ORDER BY seqno DESC) AS rn
       |  FROM ch)
       |SELECT value AS key, docid FROM latest
       |WHERE rn = 1 $opcodeFilter AND value >= 10.0 AND value IS NOT NULL
       |ORDER BY key, docid""".stripMargin

  // ------------------------------------------------- reference parity (§2.1)

  /** O1/O3/O5/O7/O11/O13 minimum slice (SURVEY §7.2): single-key index. */
  val idxBuildAcctbal: Q = (s, d) =>
    IndexBuilder.build(Tables.customer(s, d),
      IndexDef("idx_acctbal", "customer", "c_custkey", secExprs = Seq("c_acctbal")))

  /** O11: composite key with per-column descending direction. */
  val idxBuildCompositeDesc: Q = (s, d) =>
    IndexBuilder.build(Tables.customer(s, d),
      IndexDef("idx_seg_bal", "customer", "c_custkey",
        secExprs = Seq("c_mktsegment", "c_acctbal"), desc = Seq(false, true)))

  /** O5: partial index (WHERE predicate pushed to the scan). */
  val idxPartialWhere: Q = (s, d) =>
    IndexBuilder.build(Tables.customer(s, d),
      IndexDef("idx_rich", "customer", "c_custkey",
        secExprs = Seq("c_acctbal"), whereExpr = Some("c_acctbal > 1000.0")))

  /** O13: primary index (all docids). */
  val idxPrimary: Q = (s, d) =>
    IndexBuilder.build(Tables.orders(s, d),
      IndexDef("idx_pk", "orders", "o_orderkey", isPrimary = true))

  /** O12: array index — one entry per array element. */
  val idxArrayWords: Q = (s, d) =>
    IndexBuilder.build(Tables.part(s, d),
      IndexDef("idx_words", "part", "p_partkey",
        secExprs = Seq("split(lower(p_name), ' ')"), isArrayIndex = true))

  /** O2/O22: registered lambda map function with multi-emit (2 keys/doc). */
  val idxMapfnMultiemit: Q = (s, d) => {
    val catalog = new FunctionCatalog
    val segIdx = 4; val balIdx = 3 // c_mktsegment, c_acctbal field positions
    catalog.register(LambdaMapFunction(
      "seg_and_bal_bucket",
      StructType(Seq(StructField("key", StringType))),
      (row: Row) => {
        val out = scala.collection.mutable.ListBuffer.empty[Row]
        if (!row.isNullAt(segIdx)) out += Row("seg:" + row.getString(segIdx))
        if (!row.isNullAt(balIdx))
          out += Row("bal:" + math.floor(row.getDouble(balIdx) / 100).toLong)
        out.iterator
      },
      "emit segment key and bucketed balance key per customer"))
    IndexBuilder.build(Tables.customer(s, d),
      IndexDef("idx_multi", "customer", "c_custkey",
        funcName = Some("seg_and_bal_bucket")), catalog)
  }

  /** Index DDL over the SQL wire (EP1, reference open-stream DDL
    * `kv_sender.go:134-151`): `graft_idx_build` builds the same index as
    * `idx_build_acctbal` — but issued from `spark.sql`, persisted as a
    * versioned store artifact ([[IndexStore.buildVersioned]]), and read
    * back from the pinned version's entries. Same oracle as the driver-
    * Scala build: the wire must change WHERE the build is issued from,
    * never what it builds.
    */
  val idxBuildSql: Q = (s, d) => {
    GraftExtensions.register(s)
    val dir = Scratch.dir("graft_idx_store")
    Tables.customer(s, d).createOrReplaceTempView("customer_src")
    val v = s.sql(
      s"""SELECT graft_idx_build('$dir', 'customer_src', 'c_custkey',
         |              array('c_acctbal'), NULL)""".stripMargin)
      .head().getInt(0)
    IndexStore.readVersion(s, dir, v).orderBy("key", "docid")
  }

  /** O6: incremental upsert/retraction merge over 4 ordered change batches. */
  val idxMergeUpserts: Q = (s, d) => foldMerges(s, d, mergeDef)

  /** O14: DELETION/EXPIRATION retained as MUTATION. */
  val idxRetainDeleted: Q = (s, d) =>
    foldMerges(s, d, mergeDef.copy(retainDeletedXattr = true))

  /** O8: broadcast delete — retract docids with unknown old keys. */
  val idxDeleteBroadcast: Q = (s, d) => {
    val index = IndexBuilder.build(Tables.customer(s, d),
      IndexDef("idx_acctbal", "customer", "c_custkey", secExprs = Seq("c_acctbal")))
    val deleted = Tables.events(s, d).filter(col("event_type") === "error")
      .select(col("user_id").as("docid"))
    IndexMaintainer.deleteBroadcast(index, deleted).orderBy("key", "docid")
  }

  /** O10: hash-partitioned index (physical repartition + partition column). */
  val idxPartitionHash: Q = (s, d) =>
    IndexBuilder.build(Tables.orders(s, d),
      IndexDef("idx_price", "orders", "o_orderkey",
        secExprs = Seq("o_totalprice"),
        partition = HashPartition(Seq("docid"), 8)))
      .withColumn("part_id", pmod(col("docid"), lit(8)).cast("long"))
      .orderBy("part_id", "key", "docid")

  /** O10: range-partitioned index by month. */
  val idxPartitionRange: Q = (s, d) =>
    IndexBuilder.build(Tables.orders(s, d),
      IndexDef("idx_date", "orders", "o_orderkey",
        secExprs = Seq("o_orderdate"),
        partition = RangePartition(Seq("key"), 8)))
      .withColumn("part_month", date_format(col("key"), "yyyy-MM"))
      .orderBy("part_month", "key", "docid")

  /** O15: index scan statistics (count/min/max/distinct). */
  val idxStats: Q = (s, d) =>
    IndexScan.statistics(idxBuildAcctbal(s, d))

  /** O15: equi-width histogram bins. */
  val idxStatsBins: Q = (s, d) =>
    IndexScan.bins(idxBuildAcctbal(s, d), 1000.0)

  /** Scan layer: range scan (PushedFilters on a persisted index). */
  val idxScanRange: Q = (s, d) =>
    IndexScan.range(idxBuildAcctbal(s, d), Some(0.0), Some(5000.0))
      .orderBy("key", "docid")

  /** Persisted index: sorted range-partitioned parquet write, then a range
    * scan whose predicate prunes files/row-groups via footer min/max stats.
    */
  val idxPersistScan: Q = (s, d) => {
    val dir = Scratch.dir("graft_idx")
    IndexStore.write(idxBuildAcctbal(s, d), s"$dir/idx", mergeDef)
    IndexScan.range(IndexStore.read(s, s"$dir/idx"), Some(0.0), Some(5000.0))
      .orderBy("key", "docid")
  }

  /** SQL surface: engine expressions registered as SQL functions via the
    * SparkSessionExtensions seam (word_shingles here; vec_dot/simhash64/
    * json_collate_key likewise) — the N1QL-expression analog made ANSI.
    */
  val sqlShingleStats: Q = (s, d) => {
    GraftExtensions.register(s)
    docs(s, d).createOrReplaceTempView("graft_documents")
    s.sql("""SELECT doc_id, CAST(size(word_shingles(text, 3)) AS BIGINT)
              AS n_shingles FROM graft_documents ORDER BY doc_id""")
  }

  /** SQL-facing multi-emit UDTF (SURVEY §2.3): a registered lambda map
    * function driven from SQL via LATERAL VIEW `graft_emit` — the
    * reference's `OnMap`/`emit` made ANSI-usable; same emission semantics
    * and oracle shape as `idx_mapfn_multiemit`.
    */
  val sqlLateralEmit: Q = (s, d) => {
    GraftExtensions.register(s)
    FunctionCatalog.global.register(LambdaMapFunction(
      "seg_and_bal_sql",
      StructType(Seq(StructField("key", StringType))),
      (row: Row) => {
        val out = scala.collection.mutable.ListBuffer.empty[Row]
        if (!row.isNullAt(0)) out += Row("seg:" + row.getString(0))
        if (!row.isNullAt(1))
          out += Row("bal:" + math.floor(row.getDouble(1) / 100).toLong)
        out.iterator
      },
      "emit segment key and bucketed balance key (SQL lateral-view form)"))
    Tables.customer(s, d).createOrReplaceTempView("graft_customer")
    s.sql("""SELECT t.key AS key, c_custkey AS docid FROM graft_customer
             LATERAL VIEW graft_emit('seg_and_bal_sql', c_mktsegment, c_acctbal)
               t AS key
             ORDER BY key, docid""")
  }

  /** O16: Query-consistency scan — state as of a seqno cutoff vector. */
  val idxScanConsistency: Q = (s, d) => {
    val maxRow = Tables.events(s, d).agg(max("event_id")).head()
    if (maxRow.isNullAt(0)) emptyIndex(s).orderBy("key", "docid")
    else foldMerges(s, d, mergeDef, cutoff = Some(maxRow.getLong(0) / 2))
  }

  /** O17/O18: streaming maintenance end-to-end — the events table read as a
    * file stream (AvailableNow), foreachBatch-merged into a versioned index
    * with checkpointing; result must equal the batch merge (same oracle).
    */
  val idxStreamingMaintain: Q = (s, d) => {
    val dir = Scratch.dir("graft_stream")
    val schema = Tables.events(s, d).schema
    // file-stream sources take a directory; glob down to the events table
    val stream = ChangeFeed.fromEvents(
      s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d))
    val sq = StreamingIndex.maintain(stream, mergeDef, s"$dir/index",
      s"$dir/ckpt")
    sq.awaitTermination()
    BenchProbe.addStreamData("idx_streaming_maintain", sq)
    StreamingIndex.currentIndex(s, s"$dir/index", mergeDef)
      .orderBy("key", "docid")
  }

  /** CATCHUP (reference stream separation INIT/MAINT/CATCHUP,
    * `Projector/index.go:343-349`, instance addition to a live topic
    * `projector.go:641-717`): an index registered mid-stream is backfilled
    * from the seqno-watermark snapshot, then catches up on the live stream
    * past the watermark. The oracle is the SAME full-replay SQL as
    * `idx_merge_upserts` — catchup-built must hash-equal a from-scratch
    * rebuild.
    */
  val idxCatchup: Q = (s, d) => {
    val feed = changeFeed(s, d)
    val maxRow = feed.agg(max("seqno")).head()
    if (maxRow.isNullAt(0)) emptyIndex(s).orderBy("key", "docid")
    else {
      val w = maxRow.getLong(0) / 2
      // snapshot at the watermark: last state per docid, MUTATION survivors
      val snapshot = IndexMaintainer.latestPerDocid(feed.filter(col("seqno") <= w))
        .filter(col("opcode") === Opcode.Mutation)
      val dir = Scratch.dir("graft_catchup")
      val schema = Tables.events(s, d).schema
      val stream = ChangeFeed.fromEvents(
        s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(d))
      val sq = StreamingIndex.catchup(snapshot, stream, mergeDef,
        s"$dir/index", s"$dir/ckpt", watermark = w)
      sq.awaitTermination()
      BenchProbe.addStreamData("idx_catchup", sq)
      StreamingIndex.currentIndex(s, s"$dir/index", mergeDef)
        .orderBy("key", "docid")
    }
  }

  /** Couchbase `_stats` reduce over map-emitted (key, value): the reduce
    * side the reference's "MapReduce" name implies but never implements
    * (SURVEY §2.2) — here over an index-style emission (segment → acctbal).
    */
  val viewReduceStats: Q = (s, d) =>
    ViewReduce.stats(
      Tables.customer(s, d).select(
        col("c_mktsegment").as("key"), col("c_acctbal").as("value"))
        .filter(col("key").isNotNull && col("value").isNotNull))
      .withColumn("vsum", round(col("vsum"), 4))
      .withColumn("sumsqr", round(col("sumsqr"), 2))
      .orderBy("key")

  /** Gap-based sessionization of the event stream per user: Spark's
    * session_window (30-minute inactivity gap), the stateful-session
    * primitive a training-data ingest uses for behavioral grouping.
    */
  val eventsSessions: Q = (s, d) => {
    val evTab = Tables.events(s, d)
    val ev = evTab.select(
      graft.streaming.EventWindows.eventTimeOf(evTab).as("et"),
      col("user_id"), col("value"))
    ev.groupBy(session_window(col("et"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")
  }

  /** Temporal as-of join: each event picks up the customer's most recent
    * order at-or-before the event date (right side pre-reduced to one row
    * per (custkey, date) so the match is unambiguous on both engines).
    */
  val eventsAsofOrders: Q = (s, d) => {
    val evTab = Tables.events(s, d)
    val ev = evTab.select(
      col("event_id"), col("user_id"),
      to_date(graft.streaming.EventWindows.eventTimeOf(evTab)).as("event_date"))
    val ord = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
      .agg(max("o_orderkey").as("o_orderkey"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
    Temporal.asofJoin(ev, ord, key = "user_id",
      leftTime = "event_date", rightTime = "o_orderdate",
      payload = Seq("o_orderkey", "o_totalprice"), rightOrder = "o_orderkey")
      .orderBy("event_id")
  }

  /** Bounded-interval range join: for every error event, the same user's
    * events in the preceding hour (the error-context window) — the binned
    * equi-join decomposition ([[Temporal.rangeJoinBinned]]) instead of
    * the broadcast-nested-loop Spark plans for a raw inequality join.
    */
  val eventsRangeContext: Q = (s, d) => {
    val evTab = Tables.events(s, d)
    val ev = evTab.select(col("event_id"), col("user_id"),
      col("event_type"),
      unix_timestamp(graft.streaming.EventWindows.eventTimeOf(evTab))
        .as("sec"))
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"),
        col("sec").as("err_sec"))
    val ctx = ev.select(col("event_id").as("ctx_id"), col("user_id"),
      col("sec").as("ctx_sec"))
    Temporal.rangeJoinBinned(errs, ctx, "user_id", "err_sec", "ctx_sec", 3600L)
      .select("err_id", "user_id", "ctx_id", "err_sec", "ctx_sec")
      .orderBy("err_id", "ctx_id")
  }

  /** Event-time tumbling-window stats (streaming-shaped plan run in batch;
    * the watermarked streaming twin is EventWindows.tumblingStream, tested
    * in StreamingIndexSpec).
    */
  val eventsWindowed: Q = (s, d) =>
    graft.streaming.EventWindows.tumbling(Tables.events(s, d), "1 hour")
      .orderBy("w_start", "event_type")

  /** Hopping-window stats ([[graft.streaming.EventWindows.hopping]]):
    * 1-hour windows sliding every 30 minutes — each event contributes to
    * exactly two windows; the oracle replays the explosion as a 2-offset
    * cross join over half-hour buckets.
    */
  val eventsHopping: Q = (s, d) =>
    graft.streaming.EventWindows.hopping(Tables.events(s, d),
      "1 hour", "30 minutes")
      .orderBy("w_start", "event_type")

  /** Streaming dedup with bounded state
    * ([[graft.streaming.EventWindows.dedupStream]]): the events table
    * replayed as TWO file streams unioned — every event delivered
    * twice, the at-least-once transport shape —
    * `dropDuplicatesWithinWatermark` collapses them to one row per id
    * with watermark-bounded state. The oracle is the plain distinct
    * event set.
    */
  val eventsStreamDedup: Q = (s, d) => {
    val schema = Tables.events(s, d).schema
    def src() = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    s.catalog.dropTempView("graft_events_dedup_stream")
    val q = graft.streaming.EventWindows
      .dedupStream(src().unionByName(src()))
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_events_dedup_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    BenchProbe.addStreamData("events_stream_dedup", q)
    s.table("graft_events_dedup_stream").orderBy("event_id")
  }

  /** Stream-stream interval join
    * ([[graft.streaming.EventWindows.intervalJoinStream]]): the events
    * table replayed as a file stream, clicks joined to same-user
    * purchases within the following hour — a genuine two-stream join
    * with per-side watermarks and append-mode emission. The oracle
    * replays the interval join as plain SQL; the streamed result must
    * hash-equal it (gap in exact integer microseconds).
    */
  val eventsStreamJoin: Q = (s, d) => {
    val schema = Tables.events(s, d).schema
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    s.catalog.dropTempView("graft_events_join_stream")
    val q = graft.streaming.EventWindows.intervalJoinStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_events_join_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    BenchProbe.addStreamData("events_stream_join", q)
    s.table("graft_events_join_stream").orderBy("click_id", "purchase_id")
  }

  /** O7: DYNAMIC-map collation, FULLY oracled (closing the last r5
    * `no_oracle` row): the struct key ends in a map whose ENTRY SET
    * varies per row — the parsed `props` JSON plus row-dependent
    * synthesized entries (a `u<n>` entry on even users, an
    * `event_type`-keyed entry on high values), 1–3 entries, data-driven
    * keys — encoded through the full map codec (key-sorted (k,v) pairs,
    * `Projector/JSEvaluate.go:115-126`). The order IS
    * DuckDB-expressible after canonicalization: map encoding = entries
    * sorted by encoded key, each entry's key/value encodings prefix-free
    * and the terminator below every tag, so byte order over two maps ≡
    * entry-by-entry (key, then value) comparison with
    * shorter-entry-prefix first — exactly DuckDB's native ordering of a
    * key-sorted LIST of {k, v} STRUCTs (`list_sort` + list compare).
    * What stays rows-only-in-principle: a map mixing VALUE TYPES across
    * rows at the same key position (number-vs-string values need the
    * codec's cross-type tag order inside a list element, which SQL
    * struct lists cannot carry) — that residue remains covered by the
    * 2000-sample property suites in JsonCollationSpec.
    */
  val idxCollationMixed: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val empty = map().cast("map<string,double>")
    // each entry source gets its own key NAMESPACE (p:/u:/t:) — without
    // it, a props JSON key colliding with a synthesized key would make
    // map_concat throw under Spark's default DUPLICATED_MAP_KEY policy
    // (and under LAST_WIN would silently diverge from the oracle, whose
    // list concat keeps both entries)
    // coalesce BEFORE concat: a NULL/unparseable props would otherwise
    // null the whole dynMap (TagNull sorts FIRST in the codec) while the
    // oracle's entry list would sort its NULL LAST — both sides agree on
    // "no props = no entries" instead
    val dynMap = map_concat(
      transform_keys(
        coalesce(
          from_json(col("props"), "map<string,double>", Map.empty[String, String]),
          map().cast("map<string,double>")),
        (k, _) => concat(lit("p:"), k)),
      when(col("user_id") % 2 === 0,
        map(concat(lit("u:"), (col("user_id") % 3).cast("string")),
          (col("user_id") % 7).cast("double"))).otherwise(empty),
      when(col("value") > 50,
        map(concat(lit("t:"), col("event_type")), col("value") * 0.5))
        .otherwise(empty))
    val key = JsonCollation.collateKey(
      struct(col("event_type"), col("value"), dynMap))
    globalRank(ev.select(col("event_id").as("docid"), key.as("k")),
        Seq(col("k"), col("docid")), "pos")
      .select("docid", "pos")
      .orderBy("pos")
  }

  /** Scale-safe TOTAL rank (1-based) by `sortCols` — the replacement
    * for an unpartitioned `row_number()` window (which funnels the
    * whole corpus through ONE task): range-partition on the keys so
    * the sort runs in parallel, rank WITHIN partitions, then lift each
    * partition's ranks by the count of rows in the partitions before
    * it — a prefix sum over the TINY per-partition count table
    * (numPartitions rows, driver-held, broadcast back; the
    * [[graft.operators.Packing]] two-phase idiom). Every call site
    * ranks by a UNIQUE key, so ranks are total and deterministic; the
    * one checkpoint keeps the range partitioning identical across the
    * count and rank passes.
    */
  private def globalRank(df: DataFrame, sortCols: Seq[Column],
                         out: String): DataFrame = {
    val parted = graft.plans.LazyCheckpoint.shared(
      df.repartitionByRange(sortCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val counts = parted.groupBy("__pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = counts.map { case (pid, n) =>
      val o = acc; acc += n; (pid, o)
    }
    val s = parted.sparkSession
    import s.implicits._
    val offDf = offs.toSeq.toDF("__pid", "__off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(sortCols: _*)
    parted.join(broadcast(offDf), Seq("__pid"))
      .withColumn(out, (row_number().over(w) + col("__off")).cast("long"))
      .drop("__pid", "__off")
  }

  /** O7 scalar subset, FULLY oracled: a per-row heterogeneous SCALAR key —
    * null, boolean, number or string depending on the row — encoded to
    * collation bytes and ranked. Unsigned byte order of the encodings must
    * equal the reference's scalar collation order (missing < false < true
    * < number < string, `Projector/JSEvaluate.go:56-130`), which DuckDB
    * reproduces with a type-rank CASE + per-type sort columns. The CASE
    * over differently-typed `collateKey` branches is the Spark rendition
    * of a JS evaluator emitting a different JSON type per document.
    */
  val idxCollationScalar: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val kind = col("event_id") % 4
    val key = when(kind === 0, JsonCollation.collateKey(lit(null)))
      .when(kind === 1, JsonCollation.collateKey(col("user_id") % 2 === 0))
      .when(kind === 2, JsonCollation.collateKey(col("value")))
      .otherwise(JsonCollation.collateKey(col("event_type")))
    globalRank(ev.select(col("event_id").as("docid"), key.as("k")),
        Seq(col("k"), col("docid")), "pos")
      .select("docid", "pos")
      .orderBy("pos")
  }

  /** O7 ARRAY subset, FULLY oracled: variable-length array<string> keys
    * (splitting event_type on 'e' yields arrays of differing lengths,
    * empty fragments included) encoded with the collation codec and
    * ranked by byte order. The encoding's prefix-free element forms +
    * below-any-tag terminator make the byte order exactly elementwise
    * collation with shorter-prefix-first — which is DuckDB's native list
    * ordering, so the oracle is a plain ORDER BY on the list. With this
    * and `idx_collation_scalar`, only object/map keys remain rows-only.
    */
  val idxCollationArray: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val key = JsonCollation.collateKey(split(col("event_type"), "e"))
    globalRank(ev.select(col("event_id").as("docid"), key.as("k")),
        Seq(col("k"), col("docid")), "pos")
      .select("docid", "pos")
      .orderBy("pos")
  }

  /** O7 OBJECT subset, FULLY oracled: a fixed TWO-FIELD object key
    * (number, string) encoded through the struct codec (tag 0x07 + field
    * encodings + below-any-tag terminator) and ranked by byte order.
    * Field encodings are prefix-free, so for a FIXED shape the byte
    * order is exactly field-wise collation — which DuckDB expresses as
    * a plain multi-column ORDER BY (NULLS FIRST: the null tag 0x01 sorts
    * below every other tag). This closes the object half of the r4
    * residue; only truly dynamic maps (`idx_collation_mixed`) remain
    * rows-only.
    */
  val idxCollationObject: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val key = JsonCollation.collateKey(
      struct(col("value").cast("double"), col("event_type")))
    globalRank(ev.select(col("event_id").as("docid"), key.as("k")),
        Seq(col("k"), col("docid")), "pos")
      .select("docid", "pos")
      .orderBy("pos")
  }

  /** Desc-aware binary collation, oracled through its ORDER: rank by the
    * encoded key bytes (asc, desc, asc mix) must equal the engine-neutral
    * ORDER BY with the same directions. The encoding itself is
    * engine-internal; its ordering contract is not. Ranking runs
    * through [[globalRank]] (range partition + partition-local rank +
    * offset lift), so even the verification queries carry no
    * single-partition window over a corpus-sized frame.
    */
  val idxCollationDescOrder: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val key = JsonCollation.collateKeys(
      Seq(col("event_type"), col("value"), col("event_id")),
      Seq(false, true, false))
    globalRank(ev.select(col("event_id").as("docid"), key.as("k")),
        Seq(col("k")), "pos")
      .select("docid", "pos")
      .orderBy("pos")
  }

  // ------------------------------------------- training-data extensions (M5)

  val dedupExact: Q = (s, d) =>
    Dedup.exact(docs(s, d)).orderBy("text_hash")

  val dedupJaccardPairs: Q = (s, d) =>
    Dedup.jaccardPairs(docs(s, d), "source", 0.5).orderBy("id_a", "id_b")

  val dedupNgramJaccard: Q = (s, d) =>
    Dedup.ngramJaccardPairs(docs(s, d), "source", 0.3, n = 3)
      .orderBy("id_a", "id_b")

  val dedupClusters: Q = (s, d) =>
    Dedup.clusters(docs(s, d), "source", 0.5).orderBy("doc_id")

  /** MinHash+LSH with the cross-engine md5+affine hash family, so the
    * ENTIRE pipeline — signatures, banding, bucket cap, exact-Jaccard
    * verify — is recomputed and hash-checked by the DuckDB oracle.
    */
  val dedupMinhashLsh: Q = (s, d) =>
    Dedup.minhashLsh(docs(s, d), threshold = 0.5, hashKind = "md5")
      .orderBy("id_a", "id_b")

  /** SimHash near-dup pairs with the md5-based token hash, so DuckDB can
    * recompute the signatures (as two 32-bit halves — its BIGINT shifts
    * cap at bit 62) and the WHOLE pipeline — signature, pigeonhole chunk
    * blocking, Hamming filter — is oracle-checked, not just rows-counted.
    */
  val dedupSimhash: Q = (s, d) =>
    Dedup.simhashPairs(docs(s, d), maxDist = 3, hashKind = "md5")
      .withColumn("hamming", col("hamming").cast("long"))
      .orderBy("id_a", "id_b")

  val dedupEmbeddingExact: Q = (s, d) =>
    Similarity.nearDupPairsExact(Tables.embeddings(s, d), 0.4)
      .orderBy("id_a", "id_b")

  /** Embedding near-dup via hyperplane LSH with a PINNED bit width, so
    * the (seed-42) plane tensor can be inlined into the oracle as double
    * literals and DuckDB recomputes buckets, pair generation and cosine
    * verify from scratch. The adaptive-width path (autoBits) remains the
    * API default and is exercised by `sim_ann_lsh`.
    */
  val dedupEmbeddingLsh: Q = (s, d) =>
    Similarity.lshNearDupPairs(Tables.embeddings(s, d), 0.4, dim = 64, bits = 5)
      .orderBy("id_a", "id_b")

  /** ANN bucket INDEX: hyperplane-LSH buckets as a SQL-function-driven
    * array-index key — the similarity extension flowing through the core
    * index machinery (expression key O3 + array index O12), so bucket
    * tables are buildable and incrementally maintainable like any other
    * index. Entry key = table * 2^bits + bucket.
    */
  val idxLshBuckets: Q = (s, d) => {
    GraftExtensions.register(s)
    IndexBuilder.build(Tables.embeddings(s, d),
      IndexDef("idx_ann_buckets", "embeddings", "vec_id",
        secExprs = Seq(
          "transform(lsh_buckets(embedding, 64, 16, 5), (b, i) -> i * 32 + b)"),
        isArrayIndex = true))
  }

  val simTopkBruteforce: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    Similarity.bruteForceTopK(emb, queries, k = 5)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy("q_id", "rank")
  }

  /** ANN recall gates, oracled: Spark computes recall@5 of the approximate
    * variant against its own exact baseline and asserts it ≥ 0.8; the
    * oracle pins n_queries, k and the assertion constant — a recall
    * regression flips `recall_ok` and breaks the hash match. (The top-k
    * lists themselves are xxhash64/hyperplane-internal, inexpressible in
    * ANSI SQL — this turns the ScalaTest recall contract into a driver-
    * checkable query.)
    */
  private def annRecallQuery(s: SparkSession, d: String,
                             approx: (DataFrame, DataFrame) => DataFrame): DataFrame =
    annRecallQueryOver(s, Tables.embeddings(s, d), approx)

  /** [[annRecallQuery]] over an explicit corpus frame — the upsert
    * variant gates recall against the UPDATED corpus, not the raw table.
    */
  private def annRecallQueryOver(s: SparkSession, emb: DataFrame,
                                 approx: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("q_id", "neighbor_id")
    val marked = approx(emb, queries)
      .select(col("q_id"), col("neighbor_id"), lit(1).as("__hit"))
    // one aggregate job for all three stats (n_queries = distinct queried
    // ids in the exact baseline — every query has >= k exact neighbors)
    val row = exact.join(marked, Seq("q_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("total"), count("__hit").as("hits"),
        countDistinct("q_id").as("nq")).head()
    val (total, hit, nq) = (row.getLong(0), row.getLong(1), row.getLong(2))
    s.range(1).select(
      lit(nq).as("n_queries"), lit(5L).as("k"),
      lit(total > 0 && hit.toDouble / total >= 0.8).as("recall_ok"))
  }

  val simAnnLsh: Q = (s, d) =>
    annRecallQuery(s, d, (emb, q) => Similarity.lshTopK(emb, q, k = 5, dim = 64))

  val simAnnIvf: Q = (s, d) =>
    annRecallQuery(s, d, (emb, q) => Similarity.ivfTopK(emb, q, k = 5))

  /** IVF-PQ: candidates scored over 8-byte PQ codes (ADC lookup table),
    * exact re-rank only on the shortlist — the compressed-index ANN shape.
    */
  val simAnnIvfPq: Q = (s, d) =>
    annRecallQuery(s, d, (emb, q) => Similarity.ivfPqTopK(emb, q, k = 5))

  /** Residual IVF-PQ ([[Similarity.ivfPqResidualTopK]]): PQ codes
    * quantize `v − c(v)` and scoring adds the exact `q·c(v)` bias —
    * the Faiss-IVFPQ layout, same probe cost as `sim_ann_ivf_pq`.
    * Same recall gate; the residual-beats-plain claim is pinned in
    * [[graft.SimilaritySpec]] on planted clustered data where cluster
    * offsets provably exceed the plain codebook budget (the real
    * embeddings table has little cluster structure, so the two tie
    * there — the gate stays the scale-stable ≥ 0.8).
    */
  val simAnnResidual: Q = (s, d) =>
    annRecallQuery(s, d, (emb, q) =>
      Similarity.ivfPqResidualTopK(emb, q, k = 5))

  /** Build-once/probe-many IVF-PQ ([[graft.operators.AnnIndex]]): train
    * the centroids + PQ codebooks ONCE, persist (model JSON + a
    * cluster-partitioned codes-only parquet table), then answer the probe
    * from the FROZEN artifacts — the production ANN service shape, vs
    * `sim_ann_ivf_pq`'s train-per-query form. Same recall gate; the probe
    * plan scans only the probed clusters' codes (static partition filter
    * from driver-side routing) and touches true vectors only for the
    * re-rank shortlist ([[graft.AnnIndexSpec]] asserts both plan facts
    * and bit-equality with the in-memory form).
    */
  val simAnnPersisted: Q = (s, d) => {
    val dir = Scratch.dir("graft_ann_store")
    val (_, version) =
      graft.operators.AnnIndex.build(Tables.embeddings(s, d), dir)
    annRecallQuery(s, d, (emb, q) =>
      graft.operators.AnnIndex.probe(s, dir, q, emb, k = 5,
        version = version))
  }

  /** FILTERED vector search ([[graft.operators.AnnIndex.probe]] with
    * `allowed`): top-k among the ids passing a metadata predicate only
    * (`vec_id % 3 = 1`) — the constrained query every production ANN
    * service answers. The candidate codes PRE-filter through an id
    * semi-join before the shortlist window, so a selective predicate
    * cannot starve the result the way post-filtering the unfiltered
    * top-k does. Runs the parity configuration (every cluster probed,
    * shortlist deeper than the corpus), so the output IS the exact
    * cosine top-5 over the allowed subset and replays row-level in the
    * oracle; the production pruned plan is asserted in AnnIndexSpec.
    */
  val simAnnFiltered: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val dir = Scratch.dir("graft_ann_filt")
    val (_, v) = graft.operators.AnnIndex.build(emb, dir)
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val allowed = emb.filter(col("vec_id") % 3 === 1).select("vec_id")
    graft.operators.AnnIndex.probe(s, dir, queries, emb, k = 5,
        nprobe = 16, rerank = 1 << 20, version = v,
        allowed = Some(allowed))
      .withColumn("sim", round(col("sim"), 6))
      .orderBy("q_id", "rank")
  }

  /** Incremental ANN maintenance ([[graft.operators.AnnIndex.ingest]]):
    * the index is BUILT (model trained + codes written) on half the
    * corpus only; the other half arrives afterwards in two ingest
    * batches encoded with the FROZEN model — no retraining, no rewrite
    * of standing codes, each batch its own idempotent `b=<id>`
    * directory. The probe must then clear the SAME recall gate as the
    * full-build `sim_ann_persisted` over the FULL corpus: ingested
    * vectors are exactly as probe-visible as built ones (the
    * ingest ≡ one-shot invariance is pinned bit-level in AnnIndexSpec;
    * this query gates the semantic outcome on real data).
    *
    * nprobe is 10 here vs the full-build form's 4: a model trained on
    * half the corpus routes the other half's neighborhoods less
    * cleanly, and the measured recall ceiling at nprobe=8 sits below
    * the gate at sf0.01 (0.75; rerank depth is irrelevant — the misses
    * are unprobed clusters, not shortlist ranking). Widening the probe
    * set is exactly how an operating ANN service buys recall back as
    * the frozen model drifts from the grown corpus, until a periodic
    * [[graft.operators.AnnIndex.build]] re-trains on the full corpus
    * and nprobe comes back down.
    */
  val simAnnIngest: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val dir = Scratch.dir("graft_ann_store")
    val (_, version) = graft.operators.AnnIndex.build(
      emb.filter(col("vec_id") % 2 === 0), dir)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    graft.operators.AnnIndex.ingest(rest.filter(col("vec_id") % 4 === 1),
      dir, batchId = 1L, version = version)
    graft.operators.AnnIndex.ingest(rest.filter(col("vec_id") % 4 === 3),
      dir, batchId = 2L, version = version)
    annRecallQuery(s, d, (emb2, q) =>
      graft.operators.AnnIndex.probe(s, dir, q, emb2, k = 5, nprobe = 10,
        version = version))
  }

  /** ANN id UPSERT semantics ([[graft.operators.AnnIndex]] latest-batch-
    * wins): the index is built on the FULL corpus, then a slice is
    * RE-EMBEDDED (same ids, reversed vectors — routing-relevant drift)
    * and ingested as an upsert batch. The MULTI-batch probe (the windowed
    * latest-wins path) must clear the recall gate against the UPDATED
    * corpus: every upserted id answers once, from its newest vector —
    * stale codes must neither double-answer nor pin an id to its old
    * neighborhood. `compact_ok` additionally pins that [[graft.operators
    * .AnnIndex.compact]]'s folded single-batch version probes
    * IDENTICALLY (same rows, bit-level sims) — compaction is a layout
    * fold, never a semantic change.
    */
  val simAnnUpsert: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val dir = Scratch.dir("graft_ann_store")
    val nCentroids = 16 // build() default, named: the equality probes
                        // below must cover every cluster
    val (_, version) = graft.operators.AnnIndex.build(emb, dir,
      nCentroids = nCentroids)
    val reEmb = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    graft.operators.AnnIndex.ingest(reEmb, dir, batchId = 1L,
      version = version)
    val compacted = graft.operators.AnnIndex.compact(s, dir,
      version = version)
    val updated = emb.select("vec_id", "embedding")
      .filter(col("vec_id") % 10 =!= 0).unionByName(reEmb)
    val queries = updated.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    // the recall gate runs on the production path: pruned multi-batch
    // probe, latest-wins window over the probed subset
    val multi = graft.operators.AnnIndex.probe(s, dir, queries, updated,
      k = 5, nprobe = 10, version = version)
    // the fold-equivalence gate probes with nprobe = nCentroids: with
    // EVERY cluster probed, both paths see the full committed candidate
    // set, so multi-batch latest-wins ≡ compacted fold must hold exactly
    // — a partially-probed comparison is data-dependent (a cross-cluster
    // re-embedded id can linger as a stale candidate in the multi-batch
    // path when only its OLD cluster is probed, AnnIndex.ingest docs),
    // and must not read as engine breakage on a different corpus
    val multiFull = graft.operators.AnnIndex.probe(s, dir, queries,
      updated, k = 5, nprobe = nCentroids, version = version)
    val foldedFull = graft.operators.AnnIndex.probe(s, dir, queries,
      updated, k = 5, nprobe = nCentroids, version = compacted)
    // probe results are control-plane-sized (k × |queries| rows):
    // collect ONCE and compare driver-side — an exceptAll pair would
    // re-execute each probe plan twice, and the recall gate a fifth time
    val multiRows = multi.collect()
    val sameBoth = multiFull.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      foldedFull.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val multiDf = s.createDataFrame(
      java.util.Arrays.asList(multiRows: _*), multi.schema)
    annRecallQueryOver(s, updated, (_, _) => multiDf)
      .withColumn("compact_ok", lit(sameBoth))
  }

  /** ANN id DELETION semantics ([[graft.operators.AnnIndex.delete]]
    * tombstones — the other half of the reference's mutation routing,
    * upserts landed with `sim_ann_upsert`): the index is built on the
    * FULL corpus, then a slice of ids is deleted as a tombstone batch.
    * The multi-batch probe must (a) NEVER answer a deleted id — the
    * tombstone shadows the data row wherever its cluster is — and (b)
    * clear the recall gate against the SURVIVOR corpus. `compact_ok`
    * pins that the compacted version (deleted ids and tombstones folded
    * away entirely) probes identically at nprobe = nCentroids, the
    * drift-independent full-candidate comparison.
    */
  val simAnnDelete: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val dir = Scratch.dir("graft_ann_store")
    val nCentroids = 16
    val (_, version) = graft.operators.AnnIndex.build(emb, dir,
      nCentroids = nCentroids)
    val delIds = emb.filter(col("vec_id") % 9 === 4).select("vec_id")
    graft.operators.AnnIndex.delete(delIds, dir, batchId = 1L,
      version = version)
    val compacted = graft.operators.AnnIndex.compact(s, dir,
      version = version)
    val survivors = emb.filter(col("vec_id") % 9 =!= 4)
    val queries = survivors.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    // recall probe on the production path (pruned multi-batch, tombstone
    // partition read alongside probed clusters)
    val multi = graft.operators.AnnIndex.probe(s, dir, queries, survivors,
      k = 5, nprobe = 10, version = version)
    // fold-equivalence at nprobe = nCentroids (see sim_ann_upsert)
    val multiFull = graft.operators.AnnIndex.probe(s, dir, queries,
      survivors, k = 5, nprobe = nCentroids, version = version)
    val foldedFull = graft.operators.AnnIndex.probe(s, dir, queries,
      survivors, k = 5, nprobe = nCentroids, version = compacted)
    val multiRows = multi.collect()
    val multiFullRows = multiFull.collect()
    val sameBoth = multiFullRows.map(_.toSeq).sortBy(_.toString).toSeq ==
      foldedFull.collect().map(_.toSeq).sortBy(_.toString).toSeq
    // a deleted id must never answer — on the pruned AND the full probe
    val nIdx = multi.schema.fieldIndex("neighbor_id")
    val noDeleted = (multiRows.iterator ++ multiFullRows.iterator)
      .forall(r => r.getLong(nIdx) % 9 != 4)
    val multiDf = s.createDataFrame(
      java.util.Arrays.asList(multiRows: _*), multi.schema)
    annRecallQueryOver(s, survivors, (_, _) => multiDf)
      .withColumn("no_deleted_ok", lit(noDeleted))
      .withColumn("compact_ok", lit(sameBoth))
  }

  /** ANN model RETRAIN / version rollover
    * ([[graft.operators.AnnIndex.retrain]]) — the drift-recovery
    * lifecycle op, staged as real drift: the routing + codebooks train
    * on a QUARTER of the corpus (`vec_id % 4 = 0`), the other three
    * quarters arrive as a frozen-model ingest, a slice is deleted, then
    * the model is re-fit from the store's RESOLVED live rows into a new
    * version. Gates: recall against the survivor corpus on the
    * retrained version's production pruned probe; `retrain_ok` pins the
    * retrained version probing EXACTLY like the source version in the
    * parity configuration (every cluster probed, rerank beyond the
    * corpus — both sides are then the exact cosine top-5 over the live
    * set, so equality is MODEL-INDEPENDENT: a retrain must change the
    * layout, never the answers); `fresh_ok` pins the rollover layout —
    * the new version is single-batch (`b=0` only) with
    * n_vectors = survivors and zero deletions carried over.
    */
  val simAnnRetrain: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val dir = Scratch.dir("graft_ann_store")
    val nCentroids = 16
    val (_, v1) = graft.operators.AnnIndex.build(
      emb.filter(col("vec_id") % 4 === 0), dir, nCentroids = nCentroids)
    graft.operators.AnnIndex.ingest(emb.filter(col("vec_id") % 4 =!= 0),
      dir, batchId = 1L, version = v1)
    graft.operators.AnnIndex.delete(
      emb.filter(col("vec_id") % 9 === 4).select("vec_id"), dir,
      batchId = 2L, version = v1)
    // a retrain spends more Lloyd iterations than a cold build's 2 —
    // it runs BECAUSE the distribution moved, so the seeds start
    // farther from the final means
    val (_, v2) = graft.operators.AnnIndex.retrain(s, dir, emb,
      version = v1, nCentroids = nCentroids, kmeansIters = 4)
    val survivors = emb.filter(col("vec_id") % 9 =!= 4)
    val queries = survivors.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    // recall gate on the production path: pruned probe of the RETRAINED
    // version
    val multi = graft.operators.AnnIndex.probe(s, dir, queries, survivors,
      k = 5, nprobe = 10, version = v2)
    // answer-preservation in the parity configuration: both versions'
    // probes are the exact cosine top-5 over the live set, so they must
    // agree row-for-row even though the layouts share nothing
    val parityNew = graft.operators.AnnIndex.probe(s, dir, queries,
      survivors, k = 5, nprobe = nCentroids, rerank = 1 << 20,
      version = v2)
    val parityOld = graft.operators.AnnIndex.probe(s, dir, queries,
      survivors, k = 5, nprobe = nCentroids, rerank = 1 << 20,
      version = v1)
    val sameBoth =
      parityNew.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
        parityOld.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val st = graft.operators.AnnIndex.stats(s, dir, version = v2).head()
    val freshOk =
      graft.operators.AnnIndex.committedBatches(dir, v2) == Seq(0L) &&
        st.getLong(0) == survivors.count() && st.getLong(1) == 0L
    val multiRows = multi.collect()
    val multiDf = s.createDataFrame(
      java.util.Arrays.asList(multiRows: _*), multi.schema)
    annRecallQueryOver(s, survivors, (_, _) => multiDf)
      .withColumn("retrain_ok", lit(sameBoth))
      .withColumn("fresh_ok", lit(freshOk))
  }

  /** Streaming MIXED-mutation ANN maintenance ([[graft.operators
    * .AnnIndex.maintainChangeStream]] → `applyMutations` per
    * micro-batch): the reference's actual loop shape — ONE continuous
    * change feed carrying upserts AND deletions in arrival order
    * (`Projector/indexjs.go:123-189`), not separate channels. The feed
    * (re-embeddings for `vec_id%10=0`, deletions for `vec_id%9=4`;
    * overlap ids carry the deletion at the higher seqno) replays as a
    * file stream in 2+ micro-batches — hash-split by id, so each id's
    * events share a batch and within-batch seqno ordering decides.
    * Gates: recall against the post-feed corpus on the production
    * pruned probe; no deleted id ever answers (pruned and full probes);
    * `stream_ok` pins the streamed store ≡ a one-shot
    * [[graft.operators.AnnIndex.applyMutations]] of the whole feed at
    * nprobe = nCentroids (the drift-independent full-candidate
    * comparison — micro-batch folding is a delivery detail, never a
    * semantic change); `compact_ok` pins the compacted fold the same
    * way.
    */
  val simAnnStreamMaintain: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val dir = Scratch.dir("graft_ann_store")
    val nCentroids = 16
    val (_, version) = graft.operators.AnnIndex.build(emb, dir,
      nCentroids = nCentroids)
    val vecT = emb.schema("embedding").dataType
    val ups = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"),
        lit("MUTATION").as("opcode"),
        (col("vec_id") * 2 + 1).cast("long").as("seqno"))
    val dels = emb.filter(col("vec_id") % 9 === 4)
      .select(col("vec_id"), lit(null).cast(vecT).as("embedding"),
        lit("DELETION").as("opcode"),
        (col("vec_id") * 2 + 2).cast("long").as("seqno"))
    val feed = ups.unionByName(dels)
    // 2 hash-by-id files + maxFilesPerTrigger=1 → ≥2 micro-batches,
    // every id's events inside one batch (file-order-independent)
    val feedDir = Scratch.dir("graft_ann_feed")
    feed.repartition(2, col("vec_id")).write.mode("overwrite")
      .parquet(feedDir)
    // reference store: the SAME built version (filesystem copy of the
    // base batch + model — no second k-means/PQ training) with the
    // whole feed applied as ONE explicit batch; the comparison is then
    // exactly "micro-batch folding vs one-shot apply" under one model
    val dirRef = Scratch.dir("graft_ann_ref")
    copyTree(java.nio.file.Paths.get(dir, s"v$version"),
      java.nio.file.Paths.get(dirRef, s"v$version"))
    val vRef = version
    graft.operators.AnnIndex.applyMutations(feed, dirRef, batchId = 1L,
      version = vRef, seqnoCol = Some("seqno"))
    val stream = s.readStream.schema(feed.schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
    val sq = graft.operators.AnnIndex.maintainChangeStream(stream, dir,
        version)
      .option("checkpointLocation", Scratch.dir("graft_ann_ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    sq.awaitTermination()
    BenchProbe.addStreamData("sim_ann_stream_maintain", sq)
    val compacted = graft.operators.AnnIndex.compact(s, dir,
      version = version)
    // post-feed corpus: %9=4 ids gone (deletion outranks the overlap
    // upsert), surviving %10=0 ids re-embedded
    val survivors = emb.filter(col("vec_id") % 9 =!= 4)
    val updated = survivors.filter(col("vec_id") % 10 =!= 0)
      .select("vec_id", "embedding")
      .unionByName(survivors.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding")))
    val queries = updated.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val multi = graft.operators.AnnIndex.probe(s, dir, queries, updated,
      k = 5, nprobe = 10, version = version)
    val streamFull = graft.operators.AnnIndex.probe(s, dir, queries,
      updated, k = 5, nprobe = nCentroids, version = version)
    val refFull = graft.operators.AnnIndex.probe(s, dirRef, queries,
      updated, k = 5, nprobe = nCentroids, version = vRef)
    val foldedFull = graft.operators.AnnIndex.probe(s, dir, queries,
      updated, k = 5, nprobe = nCentroids, version = compacted)
    val multiRows = multi.collect()
    val streamFullRows = streamFull.collect()
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq).sortBy(_.toString).toSeq
    val streamOk = canon(streamFullRows) == canon(refFull.collect())
    val compactOk = canon(streamFullRows) == canon(foldedFull.collect())
    val nIdx = multi.schema.fieldIndex("neighbor_id")
    val noDeleted = (multiRows.iterator ++ streamFullRows.iterator)
      .forall(r => r.getLong(nIdx) % 9 != 4)
    val multiDf = s.createDataFrame(
      java.util.Arrays.asList(multiRows: _*), multi.schema)
    annRecallQueryOver(s, updated, (_, _) => multiDf)
      .withColumn("no_deleted_ok", lit(noDeleted))
      .withColumn("stream_ok", lit(streamOk))
      .withColumn("compact_ok", lit(compactOk))
  }

  /** The ANN store's FULL lifecycle from SQL alone (`graft_ann_build` →
    * `graft_ann_ingest` → `graft_ann_delete` → `graft_ann_compact`,
    * discovery via `graft_ann_model`/`graft_ann_versions`) — the uniform
    * wire-DDL surface the scalar index (`idx_build_sql`) and BM25 store
    * got in round 10, closed for the ANN tier; the reference analog is
    * one CreateIndex RPC standing up and maintaining any index kind
    * (`kv_sender.go:134-151`, `projector.go:232-308`). Build trains on
    * the even-id half, ingest folds in the odd half under the frozen
    * model (upsert-visible like `sim_ann_ingest`), delete tombstones
    * `vec_id%9=4`, compact folds to a single batch. Gates: the probe of
    * the compacted version clears the recall bar against the survivor
    * corpus (nprobe=10, the half-trained-model setting `sim_ann_ingest`
    * established); no deleted id ever answers; `wire_ok` pins the
    * discovery facts a SQL client schedules by — 3 committed batches
    * before the fold, 1 after, both versions listed.
    */
  val annBuildSql: Q = (s, d) => {
    GraftExtensions.register(s)
    val emb = Tables.embeddings(s, d)
    val dir = Scratch.dir("graft_ann_store_sql")
    emb.filter(col("vec_id") % 2 === 0).createOrReplaceTempView("emb_base")
    emb.filter(col("vec_id") % 2 === 1).createOrReplaceTempView("emb_rest")
    emb.filter(col("vec_id") % 9 === 4).select("vec_id")
      .createOrReplaceTempView("emb_del")
    val v = s.sql(s"SELECT graft_ann_build('$dir', 'emb_base', 16)")
      .head().getInt(0)
    s.sql(s"SELECT graft_ann_ingest('$dir', 'emb_rest', 1, $v)").collect()
    s.sql(s"SELECT graft_ann_delete('$dir', 'emb_del', 2, $v)").collect()
    val preBatches = s.sql(s"SELECT graft_ann_model('$dir', $v).n_batches")
      .head().getInt(0)
    val nv = s.sql(s"SELECT graft_ann_compact('$dir', $v)").head().getInt(0)
    val postBatches = s.sql(s"SELECT graft_ann_model('$dir', $nv).n_batches")
      .head().getInt(0)
    val wireOk = preBatches == 3 && postBatches == 1 &&
      s.sql(s"SELECT graft_ann_versions('$dir')")
        .head().getSeq[Int](0).toSeq == Seq(v, nv)
    val survivors = emb.filter(col("vec_id") % 9 =!= 4)
    val queries = survivors.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val probe = graft.operators.AnnIndex.probe(s, dir, queries, survivors,
      k = 5, nprobe = 10, version = nv)
    val probeRows = probe.collect()
    val nIdx = probe.schema.fieldIndex("neighbor_id")
    val noDeleted = probeRows.forall(r => r.getLong(nIdx) % 9 != 4)
    val probeDf = s.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probe.schema)
    annRecallQueryOver(s, survivors, (_, _) => probeDf)
      .withColumn("no_deleted_ok", lit(noDeleted))
      .withColumn("wire_ok", lit(wireOk))
  }

  /** ANN store statistics ([[graft.operators.AnnIndex.stats]]) over a
    * MAINTAINED store (full build, re-embed upserts for `%10=0`,
    * tombstones for `%9=4`): resolved live/deleted counts must replay
    * the modulo formulas exactly — upserted ids stay live (shadowing is
    * not deletion), a deleted id counts once regardless of its upsert
    * history. Cluster facts are k-means-internal, so they pin as the
    * `clusters_ok` invariant (1 ≤ n_clusters ≤ nCentroids and
    * max_cluster between the mean and the total — the pigeonhole
    * bounds).
    */
  val simAnnStats: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val dir = Scratch.dir("graft_ann_statstore")
    val nCentroids = 16
    val (_, v) = graft.operators.AnnIndex.build(emb, dir,
      nCentroids = nCentroids)
    graft.operators.AnnIndex.ingest(
      emb.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding")),
      dir, batchId = 1L, version = v)
    graft.operators.AnnIndex.delete(
      emb.filter(col("vec_id") % 9 === 4).select("vec_id"), dir,
      batchId = 2L, version = v)
    val st = graft.operators.AnnIndex.stats(s, dir, version = v).head()
    val (nVec, nDel, nCl, maxCl) =
      (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
    val clustersOk = nCl >= 1 && nCl <= nCentroids &&
      maxCl <= nVec && maxCl * nCl >= nVec
    s.range(1).select(lit(nVec).as("n_vectors"), lit(nDel).as("n_deleted"),
      lit(clustersOk).as("clusters_ok"))
  }

  /** Corpus snapshot reconciliation — the crawl-over-crawl diff an
    * ingest pipeline runs before reprocessing: old and new snapshots
    * (deterministically derived here: the old one misses `doc_id%7=0`,
    * the new one misses `doc_id%11=3` and revises `doc_id%5=0`) meet in
    * ONE full-outer join on the key, docs compare by content digest, and
    * only the added/removed/changed rows survive — the work-list for
    * incremental re-embedding/re-indexing, sized by the delta rather
    * than the corpus. At scale this is the canonical one-shuffle
    * reconciliation; unchanged rows (the vast majority) never leave the
    * join.
    */
  val corpusDiff: Q = (s, d) => {
    val base = docs(s, d)
    val oldSnap = base.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("dg_a"))
    val newSnap = base.filter(col("doc_id") % 11 =!= 3)
      .select(col("doc_id"), md5(encode(
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")), "UTF-8")).as("dg_b"))
    oldSnap.join(newSnap, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("dg_a").isNull, "added")
          .when(col("dg_b").isNull, "removed")
          .when(col("dg_a") =!= col("dg_b"), "changed"))
      .filter(col("status").isNotNull)
      .select(col("doc_id"), col("status"), col("dg_b").as("new_digest"))
      .orderBy("doc_id")
  }

  /** Diff-DRIVEN incremental reprocessing — the pipeline `corpus_diff`
    * exists for, composing the maintenance halves end-to-end (the
    * reference's entire delta architecture, `Projector/indexjs.go:123-189`:
    * one mutation stream feeds every standing index): standing state is
    * built from the OLD snapshot; the snapshot diff routes `added`/
    * `changed` ids through re-embed + [[graft.operators.AnnIndex.ingest]]
    * and the scalar index's MUTATION merge, `removed` ids through
    * [[graft.operators.AnnIndex.delete]] tombstones and the scalar
    * DELETION path. Invariants, all pinned in the output row:
    *  - `ann_state_ok`: the maintained ANN version, compacted, equals the
    *    frozen-model re-encode of the NEW snapshot bit-for-bit
    *    ([[graft.operators.AnnIndex.encodeWith]]) — maintained ≡ rebuilt,
    *    the `idx_catchup` contract.
    *  - `idx_state_ok`: the merged scalar index equals a fresh
    *    [[IndexBuilder.build]] over the new snapshot.
    *  - `delta_sized_ok`: the work the pipeline wrote is ∝ the DELTA —
    *    the ingest batch holds exactly |added|+|changed| codes rows and
    *    the tombstone batch exactly |removed| — never a full-corpus
    *    re-encode.
    * Snapshots derive deterministically (old misses `doc_id%7=0`, new
    * misses `doc_id%11=3`, `doc_id%5=0` revised — text gets " [rev2]",
    * the re-embedding reverses the vector), so the oracle can replay the
    * diff counts from the modulo formulas.
    */
  /** Route a snapshot diff (doc_id, status ∈ added/changed/removed) into
    * the reprocess pipeline's work-list frames WITHOUT centralizing it:
    * the diff is lazily checkpointed (the full-outer join runs once for
    * all consumers), the upsert/removed id frames derive by FILTER over
    * that checkpoint — distributed plans, never driver-materialized
    * LocalRelations — and the only rows that reach the driver are the
    * ≤ THREE status counts from one groupBy. The reference's delta loop
    * never centralizes mutations either
    * (`Projector/indexjs.go:123-189`); ScaleSmokeSpec pins the
    * plan-structure claim.
    */
  private[graft] def routeDelta(diff: DataFrame)
      : (DataFrame, DataFrame, Map[String, Long]) = {
    val diffCk = graft.plans.LazyCheckpoint.shared(diff)
    val counts = diffCk.groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (diffCk.filter(col("status") =!= "removed").select("doc_id"),
      diffCk.filter(col("status") === "removed").select("doc_id"),
      counts)
  }

  val pipelineReprocess: Q = (s, d) => {
    import graft.operators.AnnIndex
    val emb = Tables.embeddings(s, d)
    // the pipeline's corpus is the EMBEDDED snapshot (docs ⋉ embeddings):
    // vec_id ≡ doc_id, but the embeddings table covers a prefix of the
    // documents at some scale factors — every routed id must have a
    // vector for the re-embed leg to be total
    val base = docs(s, d)
      .join(emb.select(col("vec_id").as("doc_id")), Seq("doc_id"))
    val revised = col("doc_id") % 5 === 0
    val oldDocs = base.filter(col("doc_id") % 7 =!= 0)
    val newDocs = base.filter(col("doc_id") % 11 =!= 3)
      .withColumn("text",
        when(revised, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
    // the deterministic "embedder": a revised doc re-embeds to the
    // reversed vector (routing-relevant drift), vec_id ≡ doc_id
    def embedOf(docIds: DataFrame): DataFrame =
      emb.join(docIds, emb("vec_id") === docIds("doc_id"))
        .select(col("vec_id"),
          when(col("vec_id") % 5 === 0, reverse(col("embedding")))
            .otherwise(col("embedding")).as("embedding"))
    // 1. standing state, built from the OLD snapshot
    val annDir = Scratch.dir("graft_ann_store")
    val (_, v) = AnnIndex.build(
      emb.join(oldDocs.select("doc_id"), emb("vec_id") === col("doc_id"))
        .select("vec_id", "embedding"), annDir)
    val idxDef = IndexDef("idx_doc_len", "documents", "doc_id",
      secExprs = Seq("length(text)"))
    val standing = IndexBuilder.build(oldDocs, idxDef)
    // 2. the one-shuffle snapshot diff (corpus_diff), the work-list
    val diff = oldDocs
      .select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("dg_a"))
      .join(newDocs.select(col("doc_id"),
        md5(encode(col("text"), "UTF-8")).as("dg_b")), Seq("doc_id"),
        "full_outer")
      .withColumn("status",
        when(col("dg_a").isNull, "added")
          .when(col("dg_b").isNull, "removed")
          .when(col("dg_a") =!= col("dg_b"), "changed"))
      .filter(col("status").isNotNull)
      .select("doc_id", "status")
    val (upsertIds, removedIds, statusCounts) = routeDelta(diff)
    val nAdded = statusCounts.getOrElse("added", 0L)
    val nChanged = statusCounts.getOrElse("changed", 0L)
    val nRemoved = statusCounts.getOrElse("removed", 0L)
    // 3. route the delta: re-embed + ingest upserts, tombstone removals
    AnnIndex.ingest(embedOf(upsertIds), annDir, batchId = 1L, version = v)
    AnnIndex.delete(removedIds.select(col("doc_id").as("vec_id")), annDir,
      batchId = 2L, version = v)
    // scalar side: ONE change batch from the same work-list
    val upsertBatch = newDocs.join(upsertIds, Seq("doc_id"))
      .select(lit(Opcode.Mutation).as("opcode"),
        col("doc_id").as("docid"), lit(1L).as("seqno"), col("text"))
    val deleteBatch = removedIds
      .select(lit(Opcode.Deletion).as("opcode"),
        col("doc_id").as("docid"), lit(1L).as("seqno"),
        lit(null).cast("string").as("text"))
    val merged = IndexMaintainer.merge(standing,
      upsertBatch.unionByName(deleteBatch), idxDef, boundedBatch = false)
    // 4. the invariants (set-level, both directions; exceptAll matches
    // POSITIONALLY, and merge's docid join reorders columns — align by
    // name first)
    def sameSet(a: DataFrame, b: DataFrame): Boolean = {
      val aa = a.select(b.columns.map(col).toIndexedSeq: _*)
      aa.exceptAll(b).isEmpty && b.exceptAll(aa).isEmpty
    }
    val nv = AnnIndex.compact(s, annDir, version = v)
    val folded = s.read.parquet(s"$annDir/v$nv/codes/b=0")
      .select("vec_id", "c_id", "codes", "nrm")
    val reencoded = AnnIndex.encodeWith(embedOf(newDocs.select("doc_id")),
      annDir, version = v)
    val annOk = sameSet(folded, reencoded)
    val idxOk = sameSet(merged, IndexBuilder.build(newDocs, idxDef))
    val ingested = s.read.parquet(s"$annDir/v$v/codes/b=1").count()
    val tombstoned = s.read.parquet(s"$annDir/v$v/codes/b=2").count()
    val deltaSized = ingested == nAdded + nChanged && tombstoned == nRemoved
    s.range(1).select(
      lit(nAdded).as("n_added"), lit(nChanged).as("n_changed"),
      lit(nRemoved).as("n_removed"), lit(annOk).as("ann_state_ok"),
      lit(idxOk).as("idx_state_ok"), lit(deltaSized).as("delta_sized_ok"))
  }

  val textTokens: Q = (s, d) =>
    docs(s, d).select(
      col("doc_id"),
      size(TextOps.normTokens(col("text"))).cast("long").as("n_tokens"),
      TextOps.subwordCount(col("text")).as("n_subwords"))
      .orderBy("doc_id")

  val textQuality: Q = (s, d) => {
    val cols = TextOps.qualityFeatures(col("text")).map { case (n, c) => c.as(n) }
    docs(s, d).select(col("doc_id") +: cols :+
      TextOps.qualityScore(col("text")).as("quality"): _*)
      .orderBy("doc_id")
  }

  val textLangid: Q = (s, d) =>
    docs(s, d).select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  val textBpeTokens: Q = (s, d) =>
    docs(s, d).select(col("doc_id"),
      TextOps.bpeTokenCount(col("text")).as("n_bpe"))
      .orderBy("doc_id")

  /** BPE tokenizer training ([[TextOps.bpeTrainMerges]]): 10 merge rules
    * learned from the corpus word histogram; the oracle replays the exact
    * algorithm as a 10×-unrolled CTE chain (pair counts → arg-max →
    * literal replace per step).
    */
  val textBpeTrain: Q = (s, d) =>
    TextOps.bpeTrainMerges(docs(s, d), steps = 10).orderBy("step")

  /** Learned-BPE tokenization ([[TextOps.bpeEncode]]): train 10 merges on
    * the corpus, then encode every doc map-only (10 chained literal
    * replaces in the scan projection). The oracle re-learns the same rules
    * (CTE chain) and verifies the encoded BYTES per doc via md5, plus the
    * subword count.
    */
  val textBpeEncode: Q = (s, d) => {
    // the hybrid trainer (one scan + driver-local loop) — pinned equal to
    // the distributed loop by the equivalence suite, and the oracle
    // re-learns the rules independently so the hash re-proves it here;
    // explicit histogram cap (a no-op below 2^20 distinct words, so the
    // oracle — which trains uncapped — still matches at any test SF)
    val merges = TextOps.bpeTrainMergesLocal(docs(s, d), steps = 10,
        maxVocab = TextOps.DefaultMaxVocab)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // two-level select: the replace chain is CodegenFallback (HOFs), so
    // it must flow through a named column to be computed once per row —
    // CollapseProject keeps the split because the alias is non-cheap and
    // multiply referenced
    docs(s, d)
      .select(col("doc_id"),
        TextOps.bpeEncode(col("text"), merges).as("enc"))
      .select(col("doc_id"),
        size(TextOps.bpeTokensFromEncoded(col("enc"))).cast("long")
          .as("n_bpe"),
        md5(col("enc")).as("enc_md5"))
      .orderBy("doc_id")
  }

  /** Token IDS per document — the actual trainer input: learn the merges
    * (hybrid trainer), derive the vocabulary ([[TextOps.bpeVocab]]:
    * base code points + merged symbols, deterministic ids), then
    * tokenize every doc straight to ids in the scan projection
    * ([[TextOps.bpeEncodeIds]] — the vocabulary rides in the expression
    * as control-plane data, so the exploded token stream carries ONLY
    * longs; no per-token symbol strings, no broadcast join). The oracle
    * independently replays vocabulary construction AND the
    * encode→explode→id-join formulation and matches every
    * (doc, position, id) row — which also pins the native ids
    * expression ≡ the join form on real data.
    */
  val textBpeIds: Q = (s, d) => {
    val corpus = docs(s, d)
    val merges = TextOps.bpeTrainMergesLocal(corpus, steps = 10,
        maxVocab = TextOps.DefaultMaxVocab)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = TextOps.bpeVocab(corpus, merges)
      .select("symbol", "token_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    corpus
      .select(col("doc_id"),
        TextOps.bpeEncodeIds(col("text"), merges, vocab).as("ids"))
      .select(col("doc_id"),
        posexplode(col("ids")).as(Seq("pos", "token_id")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("token_id"))
      .orderBy("doc_id", "pos")
  }

  /** Encode from a FROZEN, persisted tokenizer artifact
    * ([[graft.functions.TokenizerStore]]) — the production pipeline
    * shape: train ONCE, persist (merges + vocab, versioned, immutable),
    * reload by pinned version, and encode map-only from the artifact.
    * Nothing from training memory reaches the encode: the merge rules
    * and vocabulary both round-trip through the JSON file. The oracle is
    * an independent DuckDB retrain-and-encode, so the hash match proves
    * encode-from-artifact ≡ train-and-encode (bytes via md5, ids via the
    * per-doc id sum — exact integer arithmetic). At 100 TB the train
    * happens once per corpus snapshot; every later encode (batch or
    * streaming — `tokenize_streaming` reads the same store) is a pure
    * scan projection carrying the artifact as control-plane literals.
    */
  val tokenizeFromArtifact: Q = (s, d) => {
    val corpus = docs(s, d)
    val dir = Scratch.dir("graft_tok_store")
    val version = graft.functions.TokenizerStore
      .trainAndSave(dir, corpus, steps = 10)
    val art = graft.functions.TokenizerStore.get(dir, version)
      .getOrElse(sys.error(s"tokenizer v$version vanished from $dir"))
    corpus
      .select(col("doc_id"),
        TextOps.bpeEncode(col("text"), art.mergePairs).as("enc"),
        TextOps.bpeEncodeIds(col("text"), art.mergePairs, art.vocabIds)
          .as("ids"))
      .select(col("doc_id"),
        size(TextOps.bpeTokensFromEncoded(col("enc"))).cast("long")
          .as("n_bpe"),
        md5(col("enc")).as("enc_md5"),
        aggregate(col("ids"), lit(0L), _ + _).as("sum_ids"))
      .orderBy("doc_id")
  }

  val textLangidNgram: Q = (s, d) =>
    docs(s, d).select(col("doc_id"),
      TextOps.langIdNgram(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  /** Per-doc top-3 terms by TF-IDF (rank ties broken by term). The
    * row_number window over (doc, tfidf desc) was A/B-measured against a
    * collect_list+array_sort+slice aggregate: the window wins (1.4 s vs
    * 2.0 s warm at sf0.1) — per-doc term lists are small enough that the
    * partition sort beats building and sorting array structs per doc.
    */
  val textTfidfTop: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term").asc)
    TextOps.tfidf(docs(s, d))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"),
        round(col("tfidf"), 6).as("tfidf"))
      .orderBy("doc_id", "rank")
  }

  /** The BM25 query-term set — one shared constant; the oracle SQL is
    * GENERATED from it (and from the same k1/b constants), so the two
    * sides cannot drift.
    */
  private val bm25Terms: Seq[String] = Seq("scan", "merge", "window")

  /** BM25 top-10 ([[TextOps.bm25TopK]]): lexical retrieval over the
    * corpus for a literal query — one scan, per-term tf as array
    * expressions (no explode), a 1-row stats broadcast, micro-unit
    * integer scores, TakeOrdered selection. The oracle replays the
    * identical formula structure (literals generated from the same
    * Scala doubles) and must reproduce winner set, scores, AND ranks.
    */
  val textBm25Top: Q = (s, d) =>
    TextOps.bm25TopK(docs(s, d), bm25Terms, k = 10)
      .select("doc_id", "n_hit", "score_micro", "rk")
      .orderBy("doc_id")

  /** Index-accelerated BM25 ([[graft.operators.Retrieval]]): the same
    * query answered from the PERSISTED postings index — an array index
    * over the token split, hash-partitioned by key — with the probed
    * partitions resolved driver-side and statically pruned, plus the
    * doc-stats sidecar. Shares `text_bm25_top`'s oracle verbatim: the
    * indexed probe must reproduce the full-scan scorer's exact rows.
    */
  val textBm25Indexed: Q = (s, d) => {
    val dir = Scratch.dir("graft_bm25_idx")
    graft.operators.Retrieval.buildBm25Index(docs(s, d), dir)
    graft.operators.Retrieval.bm25TopKFromIndex(s, dir, bm25Terms, k = 10)
      .select("doc_id", "n_hit", "score_micro", "rk")
      .orderBy("doc_id")
  }

  /** Incrementally MAINTAINED BM25 ([[graft.operators.Retrieval]]
    * ingest/delete/latest-wins): the base version is built from a WRONG
    * corpus — held-out docs missing, `%5 == 0` docs carrying stale
    * text, junk docs present — then one re-crawl ingest batch upserts
    * the missing/stale docs and one tombstone batch deletes the junk.
    * The resolved store now equals the documents table exactly, so the
    * probe shares `text_bm25_top`'s oracle verbatim: upsert shadowing,
    * tombstone resolution, AND cross-batch stats (N, Σdl, df) must all
    * be right for the hash to match — the retrieval-tier form of the
    * maintained ≡ rebuilt contract (`idx_catchup`, `sim_ann_delete`).
    */
  val textBm25Incremental: Q = (s, d) => {
    val corpus = docs(s, d).select("doc_id", "text")
    val dir = Scratch.dir("graft_bm25_inc")
    val stale = corpus.filter(col("doc_id") % 10 =!= 7)
      .withColumn("text", when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" stalemarker"))).otherwise(col("text")))
    val junk = corpus.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" junkword")).as("text"))
    val v = graft.operators.Retrieval.buildBm25Index(
      stale.unionByName(junk), dir)
    graft.operators.Retrieval.ingestBm25(
      corpus.filter(col("doc_id") % 10 === 7 || col("doc_id") % 5 === 0),
      dir, batchId = 1L, version = v)
    graft.operators.Retrieval.deleteBm25(junk.select("doc_id"), dir,
      batchId = 2L, version = v)
    graft.operators.Retrieval
      .bm25TopKFromIndex(s, dir, bm25Terms, k = 10, version = v)
      .select("doc_id", "n_hit", "score_micro", "rk")
      .orderBy("doc_id")
  }

  /** The batched-BM25 query table — one shared constant; the oracle's
    * VALUES rows are generated from it.
    */
  private val bm25Queries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("scan", "merge"),
    2L -> Seq("window", "sort", "table"),
    3L -> Seq("key", "order"))

  /** Batched multi-query BM25
    * ([[graft.operators.Retrieval.bm25TopKBatchFromIndex]]): three
    * queries answered in ONE pass over the pruned postings — term
    * statistics computed once and shared, per-query ranking by window.
    * The oracle replays every query's scores from the corpus and must
    * match scores AND per-query ranks.
    */
  val textBm25Queries: Q = (s, d) => {
    import s.implicits._
    val dir = Scratch.dir("graft_bm25_batchq")
    val v = graft.operators.Retrieval.buildBm25Index(docs(s, d), dir)
    graft.operators.Retrieval.bm25TopKBatchFromIndex(s, dir,
        bm25Queries.toDF("q_id", "terms"), k = 5, version = v)
      .orderBy("q_id", "doc_id")
  }

  /** Retrieval-store statistics
    * ([[graft.operators.Retrieval.bm25Stats]]) over a MAINTAINED store
    * (wrong base + recrawl upserts + junk tombstones, the
    * `text_bm25_incremental` construction): the resolved stats must
    * equal the END corpus exactly — including `n_postings == total_dl`,
    * the store-integrity invariant the operator alerts on. The oracle
    * recomputes all four numbers from the documents table.
    */
  val textBm25Stats: Q = (s, d) => {
    val corpus = docs(s, d).select("doc_id", "text")
    val dir = Scratch.dir("graft_bm25_stats")
    val stale = corpus.filter(col("doc_id") % 10 =!= 7)
      .withColumn("text", when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" stalemarker"))).otherwise(col("text")))
    val junk = corpus.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" junkword")).as("text"))
    val v = graft.operators.Retrieval.buildBm25Index(
      stale.unionByName(junk), dir)
    graft.operators.Retrieval.ingestBm25(
      corpus.filter(col("doc_id") % 10 === 7 || col("doc_id") % 5 === 0),
      dir, batchId = 1L, version = v)
    graft.operators.Retrieval.deleteBm25(junk.select("doc_id"), dir,
      batchId = 2L, version = v)
    graft.operators.Retrieval.bm25Stats(s, dir, version = v)
  }

  /** Exact-phrase search from the positional postings
    * ([[graft.operators.Retrieval.phraseMatches]]): docs where
    * "key order" appears with adjacent tokens, and how many times.
    * The oracle replays adjacency directly on the token array — the
    * n-way (docid, start) join over pruned postings legs must
    * reproduce it exactly.
    */
  val textPhraseSearch: Q = (s, d) => {
    val dir = Scratch.dir("graft_bm25_phrase")
    val v = graft.operators.Retrieval.buildBm25Index(docs(s, d), dir)
    graft.operators.Retrieval
      .phraseMatches(s, dir, Seq("key", "order"), version = v)
      .orderBy("doc_id")
  }

  /** Hybrid retrieval ([[graft.operators.Retrieval.rrfFuse]]): BM25
    * top-20 fused with a quality-prior top-20 via reciprocal-rank
    * fusion (c = 60) — relevance × quality, the standard hybrid
    * combiner. Both input rankings and the nano-rounded fused score are
    * integer-exact, so the oracle reproduces the fusion bit-for-bit.
    */
  val textRrfFusion: Q = (s, d) => {
    val corpus = docs(s, d)
    val bm = TextOps.bm25TopK(corpus, bm25Terms, k = 20)
      .select("doc_id", "rk")
    val ql = corpus.select(col("doc_id"),
        round(TextOps.qualityScore(col("text")) * 1e6).cast("long").as("__qi"))
      .orderBy(col("__qi").desc, col("doc_id").asc).limit(20)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__qi").desc, col("doc_id").asc)))
      .select("doc_id", "rk")
    graft.operators.Retrieval.rrfFuse(bm, ql, k = 10).orderBy("doc_id")
  }

  /** HYBRID retrieval over BOTH index tiers
    * ([[graft.operators.Retrieval.hybridSearch]]) — the query shape the
    * postings index and the ANN index exist to serve together: the BM25
    * probe answers the lexical leg from its pruned postings partitions,
    * the persisted ANN probe answers the semantic leg (query = doc 3's
    * embedding) from its probed cluster directories, and the two
    * shortlists fuse with RRF. Runs the PARITY configuration —
    * nprobe = nCentroids and a shortlist deeper than the corpus — so
    * the ANN leg is PROVABLY the exact cosine top-20 and the whole
    * fused output is row-level oracle-replayable (SQL BM25 replay ×
    * exact cosine top-20 × RRF replay); the production pruned plan
    * facts (postings partition pruning, cluster directory pruning) are
    * asserted in RetrievalSpec on the same composed operator.
    */
  val textHybridSearch: Q = (s, d) => {
    val corpus = docs(s, d)
    val emb = Tables.embeddings(s, d)
    val bmDir = Scratch.dir("graft_bm25_hyb")
    graft.operators.Retrieval.buildBm25Index(corpus, bmDir)
    val annDir = Scratch.dir("graft_ann_hyb")
    val (_, v) = graft.operators.AnnIndex.build(emb, annDir)
    val qv = emb.filter(col("vec_id") === 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    graft.operators.Retrieval.hybridSearch(s, bmDir, annDir, bm25Terms,
        qv, emb, k = 10, kLeg = 20, nprobe = 16, rerank = 1 << 20,
        annVersion = v)
      .orderBy("doc_id")
  }

  /** BATCHED hybrid retrieval
    * ([[graft.operators.Retrieval.hybridSearchBatch]]): the three
    * `bm25Queries` carry their terms AND their embedding (q_vec =
    * embedding of vec_id = q_id), answered with ONE pruned postings
    * pass + ONE probed codes pass and fused per query — N queries cost
    * two index passes, not 2·N. Runs the parity configuration
    * (`text_hybrid_search`'s argument, per query), so the whole fused
    * table replays row-level: batched SQL BM25 replay × per-query exact
    * cosine top-10 × per-query RRF replay.
    */
  val textHybridBatch: Q = (s, d) => {
    import s.implicits._
    val corpus = docs(s, d)
    val emb = Tables.embeddings(s, d)
    val bmDir = Scratch.dir("graft_bm25_hybb")
    val bv = graft.operators.Retrieval.buildBm25Index(corpus, bmDir)
    val annDir = Scratch.dir("graft_ann_hybb")
    val (_, av) = graft.operators.AnnIndex.build(emb, annDir)
    val q = bm25Queries.toDF("q_id", "terms")
      .join(emb.select(col("vec_id").as("q_id"),
        col("embedding").as("q_vec")), Seq("q_id"))
    graft.operators.Retrieval.hybridSearchBatch(s, bmDir, annDir, q, emb,
        k = 5, kLeg = 10, nprobe = 16, rerank = 1 << 20,
        bm25Version = bv, annVersion = av)
      .orderBy("q_id", "doc_id")
  }

  /** STREAMING hybrid retrieval
    * ([[graft.operators.Retrieval.hybridSearchStream]]) — the serving
    * loop: the three `bm25Queries` ARRIVE as two micro-batches (the
    * first query, then the other two — single-file waves with forced
    * mtimes + `maxFilesPerTrigger = 1`) against stores built once and
    * version-pinned at stream construction; each batch is answered with
    * the two pruned index passes and lands as an idempotent per-batch
    * verdict directory. The stream never mutates the stores, so
    * streamed ≡ the one-shot [[textHybridBatch]] structurally — same
    * parity configuration, same rows, same oracle (the batch split is
    * provably a delivery detail, which sharing the oracle pins).
    */
  val textHybridStream: Q = (s, d) => {
    import s.implicits._
    val corpus = docs(s, d)
    val emb = Tables.embeddings(s, d)
    val bmDir = Scratch.dir("graft_bm25_hybs")
    val bv = graft.operators.Retrieval.buildBm25Index(corpus, bmDir)
    val annDir = Scratch.dir("graft_ann_hybs")
    val (_, av) = graft.operators.AnnIndex.build(emb, annDir)
    val q = bm25Queries.toDF("q_id", "terms")
      .join(emb.select(col("vec_id").as("q_id"),
        col("embedding").as("q_vec")), Seq("q_id"))
    val feedDir = Scratch.dir("graft_hybs_feed")
    val firstId = bm25Queries.head._1
    plantWave(feedDir, q.filter(col("q_id") === firstId), "wave_a",
      waveBaseMs)
    plantWave(feedDir, q.filter(col("q_id") =!= firstId), "wave_b",
      waveBaseMs + 60000L)
    val stream = s.readStream.schema(q.schema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.parquet").parquet(feedDir)
    val sinkDir = Scratch.dir("graft_hybs_out")
    val sq = graft.operators.Retrieval.hybridSearchStream(s, bmDir,
        annDir, stream, emb,
        (res, b) => res.write.mode("overwrite").parquet(s"$sinkDir/b=$b"),
        k = 5, kLeg = 10, nprobe = 16, rerank = 1 << 20,
        bm25Version = bv, annVersion = av)
      .option("checkpointLocation", Scratch.dir("graft_hybs_ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    sq.awaitTermination()
    BenchProbe.addStreamData("text_hybrid_stream", sq)
    s.read.parquet(sinkDir).select("q_id", "doc_id", "rrf_nano", "rk")
      .orderBy("q_id", "doc_id")
  }

  /** Tenant-/collection-SCOPED hybrid retrieval
    * ([[graft.operators.Retrieval.hybridSearch]] with `allowed`): both
    * index probes restrict to the predicate's id set (doc_id % 3 != 0)
    * with each leg's pre-filter semantics — BM25 keeps corpus-wide
    * statistics (the filter restricts who may ANSWER, not what terms
    * mean) and gates candidates before the top-k; the ANN leg gates
    * candidates before the shortlist window — so fusion never ranks a
    * disallowed doc and selectivity cannot starve either leg. Parity
    * configuration, so the fused rows replay row-level (BM25 replay
    * ranked among allowed x exact cosine over allowed x RRF).
    */
  val textHybridFiltered: Q = (s, d) => {
    val corpus = docs(s, d)
    val emb = Tables.embeddings(s, d)
    val bmDir = Scratch.dir("graft_bm25_hybf")
    graft.operators.Retrieval.buildBm25Index(corpus, bmDir)
    val annDir = Scratch.dir("graft_ann_hybf")
    val (_, v) = graft.operators.AnnIndex.build(emb, annDir)
    val qv = emb.filter(col("vec_id") === 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val allowed = corpus.filter(col("doc_id") % 3 =!= 0).select("doc_id")
    graft.operators.Retrieval.hybridSearch(s, bmDir, annDir, bm25Terms,
        qv, emb, k = 10, kLeg = 20, nprobe = 16, rerank = 1 << 20,
        annVersion = v, allowed = Some(allowed))
      .orderBy("doc_id")
  }

  /** The flagship query shape from SQL ALONE (`graft_hybrid_search`):
    * both index stores probed and RRF-fused by one SQL expression,
    * results exploded into rows. Parity configuration, so the oracle
    * replays row-level (BM25 replay x exact cosine top-20 x RRF); the
    * wire query is anonymous (q_id = -1), so no corpus id is
    * self-excluded — the one deliberate difference from
    * `text_hybrid_search`'s doc-3 query, and the oracle reflects it.
    */
  val hybridSearchSql: Q = (s, d) => {
    GraftExtensions.register(s)
    val corpus = docs(s, d)
    val emb = Tables.embeddings(s, d)
    val bmDir = Scratch.dir("graft_bm25_hybsql")
    graft.operators.Retrieval.buildBm25Index(corpus, bmDir)
    val annDir = Scratch.dir("graft_ann_hybsql")
    graft.operators.AnnIndex.build(emb, annDir)
    emb.createOrReplaceTempView("graft_hyb_corpus")
    // doc 3's embedding as exact double literals (float -> double is
    // value-exact, Double.toString round-trips)
    val vecSql = emb.filter(col("vec_id") === 3)
      .head().getAs[scala.collection.Seq[Float]]("embedding")
      .map(f => f.toDouble.toString + "D")
      .mkString("array(", ", ", ")")
    s.sql(
      s"""SELECT h.doc_id, h.rrf_nano, h.rk
         |FROM (SELECT explode(graft_hybrid_search('$bmDir', '$annDir',
         |        array('scan', 'merge', 'window'), $vecSql,
         |        'graft_hyb_corpus', 10, 20, 16, ${1 << 20})) AS h)
         |ORDER BY h.doc_id""".stripMargin)
  }

  /** The BATCHED, tenant-scoped hybrid shape from SQL ALONE
    * (`graft_hybrid_batch`): a whole query table (q_id, terms, q_vec)
    * answered with ONE pass over each index tier, both legs restricted
    * to the allowed-id view (vec_id % 3 != 0) with pre-filter
    * semantics, RRF-fused per query — the production retrieval-eval /
    * RAG shape, previously Scala-only, now driven end-to-end by one SQL
    * call. Parity configuration, so the oracle replays row-level:
    * batched BM25 replay ranked among allowed × per-query exact cosine
    * over allowed × per-query RRF.
    */
  val hybridBatchSql: Q = (s, d) => {
    import s.implicits._
    GraftExtensions.register(s)
    val corpus = docs(s, d)
    val emb = Tables.embeddings(s, d)
    val bmDir = Scratch.dir("graft_bm25_hbbsql")
    graft.operators.Retrieval.buildBm25Index(corpus, bmDir)
    val annDir = Scratch.dir("graft_ann_hbbsql")
    graft.operators.AnnIndex.build(emb, annDir)
    emb.createOrReplaceTempView("graft_hbb_corpus")
    bm25Queries.toDF("q_id", "terms")
      .join(emb.select(col("vec_id").as("q_id"),
        col("embedding").as("q_vec")), Seq("q_id"))
      .createOrReplaceTempView("graft_hbb_queries")
    // the allowed set comes from the DOCUMENT id space (its first
    // column feeds both legs; the ANN leg renames it to the vector id
    // column) — at sf0.1 the embeddings table covers only a prefix of
    // the doc ids, so an embeddings-derived set would silently starve
    // the BM25 leg of every doc past that prefix
    corpus.filter(col("doc_id") % 3 =!= 0).select("doc_id")
      .createOrReplaceTempView("graft_hbb_allowed")
    s.sql(
      s"""SELECT h.q_id, h.doc_id, h.rrf_nano, h.rk
         |FROM (SELECT explode(graft_hybrid_batch('$bmDir', '$annDir',
         |        'graft_hbb_queries', 'graft_hbb_corpus', 5, 10, 16,
         |        ${1 << 20}, 'graft_hbb_allowed')) AS h)
         |ORDER BY h.q_id, h.doc_id""".stripMargin)
  }

  val textFingerprint: Q = (s, d) =>
    docs(s, d).select(col("doc_id"),
      TextOps.fingerprintMd5(col("text")).as("fp_md5"))
      .orderBy("doc_id")

  /** Rolling-hash fingerprint, md5-token-hash variant so the Horner chain
    * is reproducible in the oracle (`list_reduce` mirror).
    */
  val textFingerprintRolling: Q = (s, d) =>
    docs(s, d).select(col("doc_id"),
      TextOps.fingerprintRolling(col("text"), md5Tokens = true).as("fp_roll"))
      .orderBy("doc_id")

  /** Repetition screening (C4/Gopher-style): top-token dominance and
    * duplicate-bigram fraction per doc.
    */
  val textRepetition: Q = (s, d) => {
    val cols = TextOps.repetitionSignals(col("text")).map { case (n, c) => c.as(n) }
    docs(s, d).select(col("doc_id") +: cols: _*).orderBy("doc_id")
  }

  /** The documents table restructured so every Gopher rule has both
    * outcomes in-corpus ([[piiAugmentedDocs]] discipline): an
    * all-bullets kind (bullet-dominance ceiling), a short-words kind
    * (mean-word-length floor), a tiny-doc kind (word-count floor), a
    * numeric-flood kind (alphabetic-word floor), a bullet line, a
    * pair of ellipsis-terminated lines, a `#`-symbol line, and a
    * stop-word suffix that two thirds of docs get (the other third
    * fails the stop-word rule). The SAME construction is in the
    * oracle, so each rule's firing set is replayed exactly.
    */
  private def gopherAugmentedDocs(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val numericFlood = (101 to 132).mkString(" ", " ", "")
    val base = when(id % 29 === 0, lit("• one\n• two"))
      .when(id % 19 === 0, lit(Seq.fill(60)("ok").mkString(" ")))
      .when(id % 17 === 0, lit("tiny doc only"))
      .otherwise(col("text"))
    val l1 = concat(base,
      when(id % 3 =!= 0, lit(" with that and of")).otherwise(lit("")),
      when(id % 13 === 0, lit(numericFlood)).otherwise(lit("")))
    val doc = concat(l1,
      when(id % 4 === 0,
        concat(lit("\n• planted bullet "), id.cast("string")))
        .otherwise(lit("")),
      when(id % 5 === 0,
        concat(lit("\ntrailing thought "), id.cast("string"),
          lit("…\nsecond trailing…"))).otherwise(lit("")),
      when(id % 6 === 0,
        concat(lit("\n#### tags ## "), id.cast("string")))
        .otherwise(lit("")))
    docs(s, d).select(id, doc.as("text"))
  }

  /** GOPHER QUALITY RULES (`pipeline_gopher_rules`) — the published
    * rule set of Rae et al. 2021 (Gopher, Appendix A1.1; the same
    * core MassiveText/RefinedWeb/FineWeb inherit) as one declarative
    * decision layer: per doc, every signal, a violation bitmask and
    * the keep verdict. Rules (bit set = VIOLATED):
    *   0  word count outside [50, 100000]
    *   1  mean word length outside [3, 10]
    *   2  symbol-to-word ratio (`#` + `…` chars per word) > 0.1
    *   3  > 90% of lines start with a bullet
    *   4  > 30% of lines end with an ellipsis
    *   5  < 80% of words contain an alphabetic character
    *   6  fewer than 2 distinct Gopher stop words
    *      (the, be, to, of, and, that, have, with)
    * Everything is built-in functions + higher-order lambdas over ONE
    * whitespace split and ONE line split — no UDF, no shuffle, a pure
    * scan projection that composes after extraction and before any
    * fingerprint; at 100 TB this is a map-only gate exactly like the
    * reference's partial-index WHERE (emitted-means-pass,
    * `/root/reference/secondary/Projector/indexjs.go:73-191`).
    */
  val pipelineGopherRules: Q = (s, d) => {
    val words = filter(split(col("text"), "\\s+"),
      w => length(w) > 0)
    val lines = split(col("text"), "\n")
    val nWords = size(words).cast("long")
    val nLines = size(lines).cast("long")
    val sumLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
    val meanLen = round(sumLen.cast("double") / nWords, 6)
    val nSymbols = (length(col("text")) -
      length(translate(col("text"), "#…", ""))).cast("long")
    val symbolRatio = round(nSymbols.cast("double") / nWords, 6)
    val bulletFrac = round(
      size(filter(lines, l => l.startsWith("•"))).cast("double") /
        nLines, 6)
    val ellipsisFrac = round(
      size(filter(lines, l => l.endsWith("…") || l.endsWith("...")))
        .cast("double") / nLines, 6)
    val alphaFrac = round(
      size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double") /
        nWords, 6)
    val gopherStops = Seq("the", "be", "to", "of", "and", "that",
      "have", "with")
    val nStop = size(array_intersect(array_distinct(words),
      array(gopherStops.map(lit): _*))).cast("long")
    gopherAugmentedDocs(s, d)
      .select(col("doc_id"), nWords.as("n_words"), meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
        ellipsisFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
        nStop.as("n_stop"))
      .withColumn("rules",
        (when(col("n_words") < 50 || col("n_words") > 100000, 1)
          .otherwise(0) +
         when(col("mean_word_len") < 3.0 || col("mean_word_len") > 10.0, 2)
          .otherwise(0) +
         when(col("symbol_ratio") > 0.1, 4).otherwise(0) +
         when(col("bullet_frac") > 0.9, 8).otherwise(0) +
         when(col("ellipsis_frac") > 0.3, 16).otherwise(0) +
         when(col("alpha_frac") < 0.8, 32).otherwise(0) +
         when(col("n_stop") < 2, 64).otherwise(0)).cast("int"))
      .withColumn("keep", col("rules") === 0)
      .orderBy("doc_id")
  }

  /** Unicode/whitespace canonicalization ([[TextOps.cleanText]]): the
    * corpus is ASCII, so the query plants deterministic noise first —
    * combining accents (e → e+U+0301), doubled spaces, a trailing control
    * char — and the oracle verifies the cleaned BYTES via md5 (DuckDB
    * `nfc_normalize` produces the same NFC composition as
    * `java.text.Normalizer`). Pure scan projection: the cleanup a 100 TB
    * ingest runs before any fingerprint or tokenizer sees the text.
    */
  val textNormalize: Q = (s, d) => {
    val noisy = concat(
      regexp_replace(regexp_replace(col("text"), "e", "e\u0301"), " ", "  "),
      lit("\u0007"))
    docs(s, d)
      .select(col("doc_id"), TextOps.cleanText(noisy).as("clean"))
      .select(col("doc_id"), md5(col("clean")).as("md5_clean"),
        length(col("clean")).cast("long").as("n_clean"))
      .orderBy("doc_id")
  }

  /** Corpus vocabulary construction: top tokens by frequency with a dense
    * frequency rank — the token→id table a tokenizer-training or
    * LM-head-sizing pass reads. Shape at scale: one map-side-combined
    * count aggregate, then `orderBy().limit(n)` = TakeOrdered (per-partition
    * top-n, no global sort materialization). The rank is assigned
    * driver-side over the collected ≤n rows (control-plane data, already
    * in rank order from TakeOrdered) — an unpartitioned rank window over
    * the same rows would be equally cheap but emits a
    * `WARN WindowExec: No Partition Defined` on every run, and a noisy
    * bench tail masks real warnings.
    */
  val textVocab: Q = (s, d) => {
    import s.implicits._
    val top = docs(s, d)
      .select(explode(TextOps.normTokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc).limit(200)
      .as[(String, Long)].collect()
    top.zipWithIndex
      .map { case ((token, cnt), i) => (token, cnt, (i + 1).toLong) }
      .toSeq.toDF("token", "cnt", "rank")
      .orderBy("rank")
  }

  /** Quality-based selection (the FineWeb/DCLM shape): keep each source's
    * top quality quartile. Scale form: the cutoff is a per-source
    * aggregate (exact percentile; map-side combined, sources are
    * control-plane cardinality) broadcast back as a filter — NOT a
    * per-source rank window, which would shuffle the full corpus into
    * one partition per source. Thresholds compare in integer micro-units:
    * quality is 6-rounded, so ×1e6 is an exact integer, and a 0.75
    * percentile interpolates with dyadic fractions (f ∈ {0,¼,½,¾}) —
    * both engines compute bit-identical cutoffs, no boundary flips.
    */
  val sampleTopQuality: Q = (s, d) => {
    val scored = docs(s, d).select(col("doc_id"), col("source"),
      TextOps.qualityScore(col("text")).as("quality"),
      round(TextOps.qualityScore(col("text")) * 1e6).cast("long").as("__qi"))
    val thr = scored.groupBy("source")
      .agg(expr("percentile(__qi, 0.75)").as("__thr"))
    scored.join(broadcast(thr), "source")
      .filter(col("__qi") >= col("__thr"))
      .select("doc_id", "source", "quality")
      .orderBy("doc_id")
  }

  val sampleFraction: Q = (s, d) =>
    Sampling.byFraction(docs(s, d), "doc_id", 0.25)
      .select("doc_id", "source").orderBy("doc_id")

  val sampleStratified: Q = (s, d) =>
    Sampling.stratified(docs(s, d), "source", 20, "doc_id")
      .select("doc_id", "source").orderBy("source", "doc_id")

  /** Token-budget selection ([[Sampling.tokenBudget]]): each source keeps
    * its deterministic stream's first 800 tokens' worth of docs (the
    * boundary doc included). The oracle replays the cumulative window
    * directly — proving the bucketed two-phase prefix sum equals the
    * naive per-source cumulative sum on real data.
    */
  val sampleTokenBudget: Q = (s, d) =>
    Sampling.tokenBudget(
      docs(s, d).select(col("doc_id"), col("source"),
        size(TextOps.normTokens(col("text"))).cast("long").as("n_tokens")),
      budget = 800)
      .select("doc_id", "source", "n_tokens", "tok_before")
      .orderBy("doc_id")

  /** Temperature mixture ([[Sampling.temperatureMixture]], τ = 1/2,
    * target 15k tokens): per-source keep-fractions derived from corpus
    * token totals with sqrt-only arithmetic, so DuckDB recomputes the
    * exact thresholds; every kept row and its 6-rounded fraction must
    * match.
    */
  val sampleTemperature: Q = (s, d) =>
    Sampling.temperatureMixture(
      docs(s, d).select(col("doc_id"), col("source"),
        size(TextOps.normTokens(col("text"))).cast("long").as("n_tokens")),
      targetTokens = 15000L)
      .select("doc_id", "source", "n_tokens", "mix_frac")
      .orderBy("doc_id")

  /** Token-weighted sampling without replacement
    * ([[Sampling.weighted]], n = 150): documents win ∝ their token
    * count via the Efraimidis–Spirakis exponential race. The oracle
    * replays the full priority — 52-bit md5 uniform, `-ln(u)/w` rounded
    * to 9 decimals, key tie-break — and must reproduce the exact
    * winner set AND selection order (`rk`), proving the TakeOrdered
    * path equals the naive global sort.
    */
  val sampleWeighted: Q = (s, d) =>
    Sampling.weighted(
      docs(s, d).select(col("doc_id"), col("source"),
        size(TextOps.normTokens(col("text"))).cast("long").as("n_toks")),
      n = 150, weightCol = "n_toks", keyCol = "doc_id")
      .select("doc_id", "source", "n_toks", "rk")
      .orderBy("doc_id")

  /** Streaming RESERVOIR sampling
    * ([[graft.streaming.StreamingSample.reservoir]]): the corpus
    * ARRIVES as two micro-batches (even then odd doc ids — single-file
    * waves with forced mtimes + `maxFilesPerTrigger = 1`) and each
    * batch folds the persisted n=150 token-weighted reservoir forward
    * as its own idempotent state directory. The fold priority is a
    * pure function of the key, so the end-of-stream sample must EQUAL
    * the one-shot [[Sampling.weighted]] race over the whole table —
    * this query shares `sample_weighted`'s oracle verbatim to pin
    * exactly that (batching is a delivery detail).
    */
  val sampleStreaming: Q = (s, d) => {
    val t = docs(s, d).select(col("doc_id"), col("source"),
      size(TextOps.normTokens(col("text"))).cast("long").as("n_toks"))
    val feedDir = Scratch.dir("graft_rsv_feed")
    plantWave(feedDir, t.filter(col("doc_id") % 2 === 0), "wave_a",
      waveBaseMs)
    plantWave(feedDir, t.filter(col("doc_id") % 2 === 1), "wave_b",
      waveBaseMs + 60000L)
    val stream = s.readStream.schema(t.schema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.parquet").parquet(feedDir)
    val stateDir = Scratch.dir("graft_rsv_state")
    val q = graft.streaming.StreamingSample.reservoir(s, stream, stateDir,
        n = 150, weightCol = "n_toks", keyCol = "doc_id")
      .option("checkpointLocation", Scratch.dir("graft_rsv_ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    BenchProbe.addStreamData("sample_streaming", q)
    graft.streaming.StreamingSample.currentSample(s, stateDir).get
      .select("doc_id", "source", "n_toks", "rk")
      .orderBy("doc_id")
  }

  /** Per-stratum token-weighted sampling
    * ([[Sampling.weightedStratified]], 10 docs per source): the
    * [[Sampling.weighted]] race inside each source with one stratum-
    * partitioned rank window. The oracle replays the race per stratum
    * and must reproduce every winner AND its within-stratum rank.
    */
  val sampleWeightedStratified: Q = (s, d) =>
    Sampling.weightedStratified(
      docs(s, d).select(col("doc_id"), col("source"),
        size(TextOps.normTokens(col("text"))).cast("long").as("n_toks")),
      strataCol = "source", n = 10, weightCol = "n_toks", keyCol = "doc_id")
      .select("doc_id", "source", "n_toks", "rk")
      .orderBy("doc_id")

  val textChunks: Q = (s, d) =>
    Packing.chunk(docs(s, d), window = 64, overlap = 16)
      .select("doc_id", "chunk_idx", "chunk_tokens")
      .orderBy("doc_id", "chunk_idx")

  val packSequences: Q = (s, d) =>
    Packing.pack(
      docs(s, d).select(col("doc_id"), col("source"),
        size(TextOps.normTokens(col("text"))).cast("long").as("n_tokens")),
      budget = 2048)
      .orderBy("doc_id")

  val packContig: Q = (s, d) =>
    Packing.packContiguous(
      docs(s, d).select(col("doc_id"), col("source"),
        size(TextOps.normTokens(col("text"))).cast("long").as("n_tokens")),
      budget = 512)
      .orderBy("doc_id", "seq_id")

  /** Flagship curation pipeline: the extension operators composed the way a
    * training-data run uses them — exact-dedup to keepers, then ONE
    * feature pass (language id + quality score + token count all derive
    * from a single [[TextOps.tokenStats]] sweep per row), materialized as
    * a narrow feature table the gates filter. Separate filter operators
    * would re-evaluate the feature expressions per gate (predicate
    * pushdown substitutes projection aliases back into each filter); the
    * lazy checkpoint is the barrier that makes "compute features once,
    * then gate" the executed shape — which is also the corpus-scale
    * pipeline shape: the feature table is what a real run persists.
    */
  val pipelineCuration: Q = (s, d) => {
    val corpus = docs(s, d)
    val keepers = Dedup.exact(corpus).select(col("keep_id"))
    val feats = graft.plans.LazyCheckpoint.shared(
      corpus.join(keepers, corpus("doc_id") === keepers("keep_id"))
        .select(col("doc_id"), col("source"),
          TextOps.langId(col("text")).as("lang_pred"),
          TextOps.qualityScore(col("text")).as("quality"),
          TextOps.tokenStats(col("text")).getField("n_tokens").as("n_tokens")))
    feats.filter(col("lang_pred") === "en" && col("quality") >= 0.6)
      .select("doc_id", "source", "n_tokens")
      .orderBy("doc_id")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al.): the WHOLE corpus
    * scores under a reference trigram LM
    * ([[graft.functions.TextOps.backoffLogProb]], trained on the
    * `doc_id % 10 != 7` slice — the same model `text_backoff_lm` pins),
    * and each SOURCE's docs split into head/middle/tail terciles by LM
    * typicality — curation-by-perplexity done per domain, so a verbose
    * domain cannot flood the global head.
    *
    * Scale shape — NO corpus-wide sort: the 4-decimal-rounded score is
    * bounded-cardinality, so per-source tercile THRESHOLDS come from a
    * (source × rounded-score) count histogram (the only window runs
    * over histogram rows, not docs) and bucket assignment is a
    * broadcast threshold join back over the scan. Boundary-score ties
    * share the boundary bucket (threshold semantics, the CCNet rule) —
    * value-based, so the whole assignment replays row-level: the
    * oracle derives the same thresholds as the score at doc-rank
    * ceil(n/3) / ceil(2n/3), which equals the histogram's first
    * cum ≥ h score. Docs with < 3 tokens carry no trigrams and are
    * excluded (the LM's inner semantics, mirrored by the oracle).
    */
  val pipelinePplBuckets: Q = (s, d) => {
    val all = docs(s, d)
    val scored = graft.plans.LazyCheckpoint.shared(
      TextOps.backoffLogProb(all.filter(col("doc_id") % 10 =!= 7), all)
        .join(all.select("doc_id", "source"), "doc_id"))
    val hist = scored.groupBy("source", "avg_logprob")
      .agg(count(lit(1)).as("__c"))
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("avg_logprob").desc)
    // per-source total from an unbounded window over the same histogram
    // partition the cumulative sum already shuffles on — no second
    // aggregate, no join back
    val cum = hist.withColumn("__cum", sum("__c").over(wcum))
      .withColumn("__n", sum("__c").over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")))
    val t1 = cum.filter(col("__cum") >= ceil(col("__n") / 3.0))
      .groupBy("source").agg(max("avg_logprob").as("__t1"))
    val t2 = cum.filter(col("__cum") >= ceil(col("__n") * 2.0 / 3.0))
      .groupBy("source").agg(max("avg_logprob").as("__t2"))
    scored.join(broadcast(t1.join(t2, "source")), "source")
      .withColumn("bucket",
        when(col("avg_logprob") >= col("__t1"), "head")
          .when(col("avg_logprob") >= col("__t2"), "middle")
          .otherwise("tail"))
      .select("doc_id", "source", "n_trigrams", "avg_logprob", "bucket")
      .orderBy("doc_id")
  }

  /** The documents table with a deterministic doc_id-derived contact block
    * appended — the synthetic corpus contains no natural PII, so the PII
    * operator is exercised on text where emails/phones/SSNs/IPs appear at
    * known, doc-dependent rates (the SAME augmentation is built into the
    * oracle SQL, so detection and redaction are verified end-to-end).
    */
  private def piiAugmentedDocs(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val aug = concat(
      col("text"),
      when(id % 5 =!= 0, concat(lit(" contact user"), id.cast("string"),
        lit("@example.com"))).otherwise(lit("")),
      when(id % 3 === 0, concat(lit(" call +1-555-"),
        lpad((id % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((id * 7 % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
      when(id % 7 === 0, concat(lit(" ssn "), (id % 900 + 100).cast("string"),
        lit("-"), (id % 90 + 10).cast("string"), lit("-"),
        (id % 9000 + 1000).cast("string"))).otherwise(lit("")),
      when(id % 2 === 0, concat(lit(" from 10."), (id % 256).cast("string"),
        lit(".0."), (id * 3 % 256).cast("string"))).otherwise(lit("")))
    docs(s, d).select(id, aug.as("text"))
  }

  /** The documents table wrapped in a deterministic HTML page — the
    * synthetic corpus is clean text, so the extraction operator is
    * exercised on markup whose structure is known per doc (the
    * [[piiAugmentedDocs]] discipline): head metadata (title, style,
    * script with `<`/`>`/fake-markup content), a comment carrying
    * markup, an all-anchor nav, an entity-bearing h1 (`&amp;`,
    * `&#33;`), a paragraph with inline tags and `&lt;keep&gt;`, the
    * doc's own text (HTML-escaped, so extraction must decode it back
    * byte-identically) in a div, a two-item list for every third doc
    * (`&#x41;` hex entity), an anchor-only read-more stub and an
    * anchor-only footer. The SAME wrapper is built into the oracle, so
    * tag stripping, raw-text skipping, entity decode, block
    * segmentation AND the link-density boilerplate rule are verified
    * end-to-end through the extracted bytes.
    */
  private def htmlAugmentedDocs(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val esc = regexp_replace(regexp_replace(regexp_replace(col("text"),
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val listBlock = when(col("doc_id") % 3 === 0, concat(
        lit("<ul><li>alpha"), id,
        lit("</li><li>beta &#x41;"), id, lit("</li></ul>\n")))
      .otherwise(lit(""))
    val html = concat(
      lit("<!DOCTYPE html>\n<html><head><title>Doc "), id,
      lit("</title>\n<style>p { color: #fff; }</style>\n" +
        "<script type=\"text/javascript\">if (2 < 3) { " +
        "document.write(\"<p>not text</p>\"); }</script>\n" +
        "<meta charset=\"utf-8\"/>\n</head>\n" +
        "<body data-note=\"a > b\">\n" +
        "<!-- planted <p>comment</p> markup -->\n" +
        "<nav><a href=\"/\">Home</a> <a href=\"/about\">About site</a>" +
        "</nav>\n<h1>Title &amp; doc "), id, lit("&#33;</h1>\n<p>note"),
      id, lit(" says &lt;keep&gt; <b>this</b> text"), id,
      lit(":</p>\n<div>"), esc,
      lit("</div>\n"), listBlock,
      lit("<p><a href=\"/more\">read more</a></p>\n" +
        "<footer><a href=\"/tos\">Terms</a> " +
        "<a href=\"/privacy\">&copy; site</a></footer>\n</body></html>"))
    docs(s, d).select(col("doc_id"), html.as("html"), col("source"))
  }

  /** HTML → text extraction ([[TextOps.extractHtml]] /
    * [[graft.functions.HtmlExtract]]): the crawl-ingest first stage,
    * verified byte-for-byte — md5 of the extracted text plus the
    * kept/dropped block accounting, against the oracle's independent
    * reconstruction of what extraction of the planted wrapper must
    * yield. Pure scan projection (map-only, no shuffle): at 100 TB this
    * runs fused into the raw-crawl read, before any fingerprint,
    * quality gate or tokenizer sees a byte.
    */
  val textExtractHtml: Q = (s, d) => {
    htmlAugmentedDocs(s, d)
      .select(col("doc_id"), TextOps.extractHtml(col("html")).as("__ex"))
      .select(col("doc_id"),
        md5(col("__ex.text")).as("md5_text"),
        length(col("__ex.text")).cast("long").as("n_chars"),
        col("__ex.n_blocks").as("n_blocks"),
        col("__ex.n_dropped").as("n_dropped"))
      .orderBy("doc_id")
  }

  /** Main-content extraction (`text_extract_main`) — boilerplate
    * removal per the [[graft.functions.MainContent]] jusText-style
    * contract, one tag walk + one classification pass in the scan
    * projection. The fixture wraps each document in the furniture a
    * real page carries — a nav row (link density 1), an `h2` section
    * heading, the document text as the main paragraph, a "Read more"
    * link stub, a stopword-rich long paragraph on every third doc,
    * and a `&copy;` footer — so every ladder rule, the heading
    * promotion, and the neighbor revision all fire IN-corpus, with
    * the document text's own length/stopword features deciding the
    * main paragraph's fate (text-dependent, not planted-constant).
    * The oracle replays the whole contract in SQL: integer-threshold
    * ladder, cumulative-sum heading distance, window-function
    * neighbor revision, and the final-good join verified via md5.
    */
  /** The main-content fixture page: the furniture construction shared
    * by `text_extract_main` (block-level pin) and
    * `pipeline_pretrain_main` (the composed chain).
    */
  private def mainContentHtml(id: Column, text: Column): Column = {
    val site = (id % 13).cast("string")
    val filler = ("the data line holds a value for the row " * 6).trim
    concat(
      lit("<html><head><title>Doc</title></head><body>" +
        "<div><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
        "<a href=\"/news\">News</a> <a href=\"/contact\">Contact</a>" +
        "</div><h2>Latest from site "), site,
      lit("</h2><p>"), text,
      lit("</p><p><a href=\"/more\">Read more</a></p>"),
      when(id % 3 === 0, lit(s"<p>$filler</p>")).otherwise(lit("")),
      lit("<footer>&copy; 2026 site"), site,
      lit(".com All rights reserved</footer></body></html>"))
  }

  val textExtractMain: Q = (s, d) => {
    docs(s, d).select(col("doc_id"), col("text"))
      .withColumn("__m", TextOps.htmlMain(
        mainContentHtml(col("doc_id"), col("text"))))
      .select(col("doc_id"), md5(col("__m.main_text")).as("main_md5"),
        explode(col("__m.blocks")).as("b"))
      .select(col("doc_id"),
        col("b.block_idx").cast("long").as("block_idx"),
        col("b.heading").as("heading"),
        col("b.n_chars").cast("long").as("n_chars"),
        col("b.n_words").cast("long").as("n_words"),
        col("b.n_stop").cast("long").as("n_stop"),
        col("b.link_chars").cast("long").as("link_chars"),
        col("b.cf_class").as("cf_class"),
        col("b.final_class").as("final_class"),
        col("main_md5"))
      .orderBy("doc_id", "block_idx")
  }

  /** The per-language stoplists the artifact variant plants: v1
    * carries only English; v2 adds de/es/fr (distinct vocabulary
    * subsets so outcomes differ BY LANGUAGE) and still omits zh —
    * the rollout that never finished, honestly dark.
    */
  private val stoplistsV1: Map[String, Seq[String]] =
    Map("en" -> graft.functions.MainContent.corpusStopwords.toSeq.sorted)
  private val stoplistsV2: Map[String, Seq[String]] = stoplistsV1 ++ Map(
    "de" -> Seq("the", "a", "key", "order", "fast", "slow"),
    "es" -> Seq("data", "line", "value", "row", "join"),
    "fr" -> Seq("the", "data", "merge", "sort", "query", "scan"))

  /** MAIN CONTENT WITH PER-LANGUAGE STOPLISTS from a versioned
    * artifact (`text_extract_main_artifact`,
    * [[graft.functions.StoplistStore]] +
    * [[graft.functions.HtmlMainLangExpr]]) — the production jusText
    * shape: the page's language selects its stoplist, and the lists
    * are versioned DATA (a stoplist edit is an artifact rollout).
    * Two pins over the same rows: under v1 only English pages
    * classify with function words (de/es/fr/zh prose has zero
    * stopword density and falls to `bad` — conservative dark data);
    * v2's rollout un-nulls de/es/fr while zh honestly stays dark.
    * The oracle replays BOTH pins side-by-side as two prefixed block
    * chains whose stopword count is a per-language CASE.
    */
  val textExtractMainArtifact: Q = (s, d) => {
    val dir = Scratch.dir("graft_stoplists")
    val v1 = graft.functions.StoplistStore.save(dir, stoplistsV1)
    val v2 = graft.functions.StoplistStore.save(dir, stoplistsV2)
    def mainFor(version: Int): Column =
      org.apache.spark.sql.GraftBridge.column(
        graft.functions.HtmlMainLangExpr(
          org.apache.spark.sql.GraftBridge.expression(
            mainContentHtml(col("doc_id"), col("text"))),
          org.apache.spark.sql.GraftBridge.expression(col("lang")),
          graft.functions.StoplistStore.listsAt(dir, version)
            .toSeq.sortBy(_._1)
            .map { case (l, ws) => (l, ws.toSeq.sorted) }))
    def goodCount(m: Column): Column =
      size(filter(m.getField("blocks"),
        b => b.getField("final_class") === "good")).cast("long")
    docs(s, d).select(col("doc_id"), col("lang"), col("text"))
      .withColumn("__m1", mainFor(v1))
      .withColumn("__m2", mainFor(v2))
      .select(col("doc_id"), col("lang"),
        size(col("__m2.blocks")).cast("long").as("n_blocks"),
        goodCount(col("__m1")).as("n_good_v1"),
        md5(col("__m1.main_text")).as("main_md5_v1"),
        goodCount(col("__m2")).as("n_good_v2"),
        md5(col("__m2.main_text")).as("main_md5_v2"))
      .orderBy("doc_id")
  }

  /** The space-free-script fixture constants — shared, character for
    * character, by the planted page builder ([[cjkPageHtml]]), the
    * v3 stoplist artifact, and the oracle SQL generator
    * ([[cjkMainBlocksCtes]]), so the Spark side and the DuckDB
    * replay cannot drift. Sentence metrics (exact, by construction):
    * hi = function-char-rich prose (zh 38 chars / 25 stop, ja 36/30);
    * lo = zero-function-char prose (20 chars); med sits exactly in
    * the [0.10, 0.15) density band (zh 36/4, ja 37/4 — the
    * `neargood`-only rule). The stop-CHAR lists are the v3 artifact
    * payload: zh/ja's most frequent function characters (的/了/在/是
    * … and の/に/は/を …), droppable the way "the/of" are.
    */
  private object CjkMainFixture {
    val zhStopChars: Seq[String] =
      "的了在是我他这就不人都一有很到说要以个们".map(_.toString)
    val jaStopChars: Seq[String] =
      "のにはをたがでてとしいなれさるもからこそ".map(_.toString)
    val zhHi =
      "我们的人说他要在这里的地方做一个很大的计划了因为我的朋友都是要到这里来的人了"
    val zhLo = "青山绿水风景秀丽春花秋月冬雪夏雨名胜古迹"
    val zhMed =
      "春天的山谷风景如画孩童们草地玩耍很远处青山绿水环绕着我家村庄美丽动感色彩"
    val jaHi =
      "これはそのひとのためのものであったがそのことをかれはしらなかったのである"
    val jaLo = "春夏秋冬山川草木花鳥風月雪月風花雲海波光"
    val jaMed =
      "春の山里は風景美化桜色の空気清涼鳥声が響谷川水流岩場苔石道散策気分爽快自然"
    val zhNav = Seq("首页", "关于我们", "新闻")
    val jaNav = Seq("ホーム", "ニュース", "会社概要")
    val zhStub = "更多内容"
    val jaStub = "次へ"
    val zhFooter = "版权所有 保留一切权利"
    val jaFooter = "株式会社サンプル 無断転載禁止"
  }

  /** The planted space-free-script page: the [[mainContentHtml]]
    * furniture shape re-cast in zh (even docs) / ja (odd docs) — an
    * anchor-dominated nav row, a `第N章` section heading, an optional
    * ENGLISH paragraph (the doc's own text, every 7th page — the
    * mixed-script block that must take the WORD ladder on a CJK page:
    * branch selection is per-block, not per-page), the prose
    * paragraph `hi×a + lo×b` (a = (doc_id/2)%4, b = (doc_id/2)%3 —
    * decoupled from the lang parity; a=b=0 plants no prose block and
    * the page is all furniture), an optional medium-density paragraph
    * (every 5th page — the 0.10 rule's arm), an anchor stub, and a
    * `&copy;` footer.
    */
  private def cjkPageHtml(id: Column, text: Column,
                          zh: Column): Column = {
    import CjkMainFixture._
    val j = (id / 2).cast("long")
    def byLang(z: String, jp: String): Column =
      when(zh, lit(z)).otherwise(lit(jp))
    val nav = concat(lit("<div><a href=\"/\">"),
      byLang(zhNav(0), jaNav(0)), lit("</a> <a href=\"/about\">"),
      byLang(zhNav(1), jaNav(1)), lit("</a> <a href=\"/news\">"),
      byLang(zhNav(2), jaNav(2)), lit("</a></div>"))
    val heading = concat(lit("<h2>第"), (id % 9).cast("string"),
      lit("章</h2>"))
    val english = when(j % 7 === 0,
      concat(lit("<p>"), text, lit("</p>"))).otherwise(lit(""))
    // repeat(s, 0) = "" and an empty <p> emits no block (the scanner
    // drops empty collapsed blocks), so the prose paragraph plants
    // unconditionally
    val prose = concat(lit("<p>"),
      repeat(byLang(zhHi, jaHi), (j % 4).cast("int")),
      repeat(byLang(zhLo, jaLo), (j % 3).cast("int")), lit("</p>"))
    val med = when(j % 5 === 0,
      concat(lit("<p>"), byLang(zhMed, jaMed), lit("</p>")))
      .otherwise(lit(""))
    val stub = concat(lit("<p><a href=\"/more\">"),
      byLang(zhStub, jaStub), lit("</a></p>"))
    val footer = concat(lit("<footer>&copy; 2026 "),
      byLang(zhFooter, jaFooter), lit("</footer>"))
    concat(lit("<html><head><title>Doc</title></head><body>"),
      nav, heading, english, prose, med, stub,
      footer, lit("</body></html>"))
  }

  /** SPACE-FREE-SCRIPT MAIN CONTENT (`text_extract_main_cjk`) — the
    * round-14 dark-data item closed: the charset tier decodes the
    * legacy CJK web and the WORD-ladder classifier then threw all of
    * it away (no spaces → one giant "word" → zero stopword density →
    * `bad`). The [[graft.functions.MainContent]] char-class branch
    * judges script-majority blocks by per-CHARACTER function-word
    * density instead, with the lists carried as a versioned
    * [[graft.functions.StoplistStore]] artifact (charLists — the v3
    * rollout). Two pins over the same planted zh/ja pages: under the
    * dark pin (en-only, no char lists) every page extracts EMPTY;
    * under the v3 pin the prose paragraphs survive while the
    * nav/stub/footer furniture still dies — block rows from the v3
    * pin plus both pins' main-text md5s, the whole contract (branch
    * selection, char ladder, heading promotion, neighbor revision)
    * replayed in SQL by construction.
    */
  val textExtractMainCjk: Q = (s, d) => {
    import CjkMainFixture._
    val dir = Scratch.dir("graft_stoplists_cjk")
    val store = graft.functions.StoplistStore
    val en = "en" -> graft.functions.MainContent.corpusStopwords
      .toSeq.sorted
    val vDark = store.save(dir, Map(en))
    val v3 = store.save(dir,
      Map(en, "zh" -> Seq.empty[String], "ja" -> Seq.empty[String]),
      charLists = Map("zh" -> zhStopChars, "ja" -> jaStopChars))
    def mainFor(version: Int): Column =
      org.apache.spark.sql.GraftBridge.column(
        graft.functions.HtmlMainLangExpr(
          org.apache.spark.sql.GraftBridge.expression(
            cjkPageHtml(col("doc_id"), col("text"),
              col("doc_id") % 2 === 0)),
          org.apache.spark.sql.GraftBridge.expression(col("plang")),
          store.listsAt(dir, version).toSeq.sortBy(_._1)
            .map { case (l, ws) => (l, ws.toSeq.sorted) },
          store.charListsAt(dir, version).toSeq.sortBy(_._1)))
    docs(s, d).select(col("doc_id"), col("text"))
      .withColumn("plang",
        when(col("doc_id") % 2 === 0, lit("zh")).otherwise(lit("ja")))
      .withColumn("__ma", mainFor(vDark))
      .withColumn("__mb", mainFor(v3))
      .select(col("doc_id"), col("plang"),
        md5(col("__ma.main_text")).as("main_md5_dark"),
        md5(col("__mb.main_text")).as("main_md5_v3"),
        explode(col("__mb.blocks")).as("b"))
      .select(col("doc_id"), col("plang"),
        col("b.block_idx").cast("long").as("block_idx"),
        col("b.heading").as("heading"),
        col("b.n_chars").cast("long").as("n_chars"),
        col("b.n_words").cast("long").as("n_words"),
        col("b.n_stop").cast("long").as("n_stop"),
        col("b.link_chars").cast("long").as("link_chars"),
        col("b.cf_class").as("cf_class"),
        col("b.final_class").as("final_class"),
        col("main_md5_dark"), col("main_md5_v3"))
      .orderBy("doc_id", "block_idx")
  }

  /** UNICODE SCRIPT PROFILE (`text_script_profile`) — the
    * writing-system histogram a multilingual crawl runs before any
    * language model sees a byte (the CCNet-style script gate: a page
    * claiming `lang=en` that is 80% Han characters is misrouted). Six
    * BMP script ranges counted as INTEGER code-unit counts via
    * declarative `regexp_replace` length deltas — pure scan
    * projection, codegen'd, no UDF — plus the argmax verdict with a
    * first-class tie-break chain. Counts are UTF-16 units == code
    * points for every BMP range counted (supplementary planes are
    * out of contract, documented). The fixture prepends rotating
    * script runs to the Latin corpus so every class and the verdict
    * boundaries all fire in-corpus.
    */
  val textScriptProfile: Q = (s, d) => {
    val reps = (col("doc_id") % 4 + 1).cast("int")
    val prefix = element_at(array(lit(""), lit("漢字文書かな"),
      lit("кириллица"), lit("مرحبا بالعالم"), lit("한국어 문서")),
      (col("doc_id") % 5 + 1).cast("int"))
    val t = concat(repeat(prefix, reps), lit(" "), col("text"))
    def inRange(c: Column, lo: Char, hi: Char): Column =
      (length(c) - length(regexp_replace(c, s"[$lo-$hi]", "")))
        .cast("long")
    val latin = inRange(t, 'A', 'Z') + inRange(t, 'a', 'z')
    val cjk = inRange(t, '一', '鿿')
    val kana = inRange(t, '぀', 'ヿ')
    val cyr = inRange(t, 'Ѐ', 'ӿ')
    val ar = inRange(t, '؀', 'ۿ')
    val hang = inRange(t, '가', '힣')
    docs(s, d).select(col("doc_id"), col("text"))
      .select(col("doc_id"),
        length(t).cast("long").as("n_chars"),
        latin.as("n_latin"), cjk.as("n_cjk"), kana.as("n_kana"),
        cyr.as("n_cyrillic"), ar.as("n_arabic"), hang.as("n_hangul"))
      .withColumn("script",
        when(col("n_latin") >= col("n_cjk") &&
          col("n_latin") >= col("n_kana") &&
          col("n_latin") >= col("n_cyrillic") &&
          col("n_latin") >= col("n_arabic") &&
          col("n_latin") >= col("n_hangul"), "latin")
        .when(col("n_cjk") >= col("n_kana") &&
          col("n_cjk") >= col("n_cyrillic") &&
          col("n_cjk") >= col("n_arabic") &&
          col("n_cjk") >= col("n_hangul"), "cjk")
        .when(col("n_kana") >= col("n_cyrillic") &&
          col("n_kana") >= col("n_arabic") &&
          col("n_kana") >= col("n_hangul"), "kana")
        .when(col("n_cyrillic") >= col("n_arabic") &&
          col("n_cyrillic") >= col("n_hangul"), "cyrillic")
        .when(col("n_arabic") >= col("n_hangul"), "arabic")
        .otherwise("hangul"))
      .orderBy("doc_id")
  }

  /** The documents table with a deterministic messy URL per doc — the
    * crawl-metadata fixture for the URL tier ([[piiAugmentedDocs]]
    * discipline): uppercase scheme/host, rotating public suffixes
    * (.com / .co.uk / .org / .github.io / .com.au), default and
    * explicit ports, tracking params (utm_*, fbclid) mixed into
    * unsorted queries, fragments, and a malformed kind (every 11th
    * doc) that must canonicalize to NULL. The same construction is
    * built into the oracle, so canonicalization is verified STRING
    * EQUAL, not just non-null.
    */
  private def urlAugmentedDocs(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val n = (id % 37).cast("string")
    val scheme = when(id % 2 === 0, lit("HTTPS")).otherwise(lit("http"))
    val suffix = element_at(array(lit(".com"), lit(".co.uk"), lit(".org"),
      lit(".github.io"), lit(".com.au")), (id % 5 + 1).cast("int"))
    val port = when(id % 4 === 0,
        when(id % 2 === 0, lit(":443")).otherwise(lit(":80")))
      .when(id % 7 === 0, lit(":8080")).otherwise(lit(""))
    val path = concat(lit("/A/b"), (id % 9).cast("string"))
    val query = when(id % 3 === 0, lit("?z=2&utm_source=x&a=1"))
      .when(id % 3 === 1, lit("?b=1&fbclid=zz&a=2")).otherwise(lit(""))
    val frag = when(id % 5 === 0, lit("#Frag")).otherwise(lit(""))
    val url = when(id % 11 === 0,
        concat(lit("not a url "), id.cast("string")))
      .otherwise(concat(scheme, lit("://WWW.Site"), n, suffix, port,
        path, query, frag))
    docs(s, d).select(id, url.as("url"))
  }

  /** URL canonicalization + registrable-domain extraction
    * ([[graft.functions.UrlOps]]) — the key under which "the same page
    * fetched twice" collapses, and the unit of every per-site policy.
    * Map-only scan projection; the oracle reconstructs the expected
    * canonical STRING (scheme/host lowercased, default port and
    * fragment dropped, tracking params removed, survivors sorted) and
    * the eTLD+1 by construction, with the malformed kind pinned NULL.
    */
  val textUrlCanonicalize: Q = (s, d) =>
    urlAugmentedDocs(s, d).select(col("doc_id"),
      graft.functions.UrlOps.canonicalizeUrl(col("url")).as("url_canon"),
      graft.functions.UrlOps.urlHost(col("url")).as("host"))
      .withColumn("domain",
        graft.functions.UrlOps.registrableDomain(col("host")))
      .orderBy("doc_id")

  /** PER-DOMAIN CAP (`pipeline_domain_cap`) — the RefinedWeb/Gopher
    * "max documents per site" rule, skew-aware: count per registrable
    * domain (map-side combined), and ONLY over-cap domains' docs enter
    * a rank window (deterministic hash order, the [[Sampling]]
    * discipline); the under-cap majority passes with an anti-join and
    * never sorts. Residual at 100 TB: one mega-domain's window still
    * sorts that domain's rows — the mitigation is SkewGuard-style
    * two-stage local top-cap, left until a measured corpus needs it
    * (the cap output itself is bounded at cap rows/domain either way).
    */
  val pipelineDomainCap: Q = (s, d) => {
    val cap = 3
    val withKey = urlAugmentedDocs(s, d)
      .select(col("doc_id"),
        graft.functions.UrlOps.urlHost(col("url")).as("host"))
      .filter(col("host").isNotNull)
      .withColumn("domain",
        graft.functions.UrlOps.registrableDomain(col("host")))
      .withColumn("__k", md5(col("doc_id").cast("string")))
    val over = withKey.groupBy("domain").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cap).select("domain")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("domain").orderBy(col("__k"), col("doc_id"))
    val keptOver = withKey.join(over, Seq("domain"))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= cap).drop("__r")
    withKey.join(over, Seq("domain"), "left_anti")
      .unionByName(keptOver)
      .select("doc_id", "domain")
      .orderBy("doc_id")
  }

  /** EPOCH-FACTOR sampling ([[Sampling.epochs]]): mixture weights
    * ABOVE 1.0 as repetition counts — src_i gets 0.5 + (i mod 5)·0.75
    * epochs (0.5 … 3.5), so the output carries whole copies plus a
    * deterministic hash-threshold fractional copy, each with its epoch
    * index and per-copy shuffle key. The oracle replays copy counts
    * and keys exactly (generate_series over the floor + the same
    * md5-threshold fractional rule).
    */
  val sampleEpochs: Q = (s, d) =>
    Sampling.epochs(docs(s, d).select("doc_id", "source"), "source",
        epochFactors, "doc_id")
      .select("doc_id", "source", "epoch", "shuffle_key")
      .orderBy("doc_id", "epoch")

  private val epochFactors: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (0.5 + (i % 5) * 0.75)).toMap

  /** The documents table wrapped as REAL single-record WARCs
    * ([[graft.sources.WarcCodec]] fixture encoders): doc_id % 4
    * rotates an HTML `response` (full HTTP message, entity-bearing
    * page whose div carries the doc text), a `text/plain` response
    * (every (8k+1)th a 404), a `warcinfo` record (no target URI — the
    * null-facts path for a well-formed non-response), and garbage
    * bytes (the malformed path).
    */
  private def plantedWarcRecords(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("record", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        import graft.sources.WarcCodec
        val id = r.getLong(0)
        val text = r.getString(1)
        val uri = s"http://site${id % 13}.com/page/${id % 7}"
        val rec: Array[Byte] = (id % 4).toInt match {
          case 0 =>
            val html = s"<html><head><title>Doc $id</title></head><body>" +
              s"<h1>Title &amp; doc $id&#33;</h1><div>$text</div>" +
              "</body></html>"
            WarcCodec.encodeResponse(uri, 200, "text/html",
              html.getBytes("UTF-8"))
          case 1 =>
            val st = if (id % 8 == 1) 404 else 200
            WarcCodec.encodeResponse(uri, st, "text/plain",
              text.getBytes("UTF-8"))
          case 2 => WarcCodec.encodeInfo(
            "software: graft-crawler\r\n".getBytes("US-ASCII"))
          case _ => text.getBytes("UTF-8")
        }
        Row(id, rec)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** WARC ingestion (`source_warc`) — the crawl's NATIVE container
    * parsed relationally in the scan projection
    * ([[graft.functions.WarcParseExpr]] over
    * [[graft.sources.WarcCodec]]): record headers → typed columns,
    * the HTTP message inside `response` records → status /
    * content-type / body, and the body composed STRAIGHT into the
    * HTML extractor for html responses — WARC bytes to clean text in
    * one map-only pass, no UDF, no driver loop. The oracle
    * reconstructs every fact and both digests (raw body md5, extracted
    * text md5) by construction; warcinfo rows null their HTTP facts,
    * garbage rows null everything.
    */
  val sourceWarc: Q = (s, d) => {
    val w = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcParseExpr(
        org.apache.spark.sql.GraftBridge.expression(col("record"))))
    plantedWarcRecords(s, d)
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"),
        col("w.warc_type").as("warc_type"),
        col("w.target_uri").as("target_uri"),
        col("w.status").as("status"),
        col("w.content_type").as("content_type"),
        md5(col("w.body")).as("body_md5"),
        when(col("w.content_type") === "text/html",
          md5(TextOps.extractHtml(decode(col("w.body"), "UTF-8"))
            .getField("text"))).as("extracted_md5"))
      .orderBy("doc_id")
  }

  /** The documents table as WARC response records whose HTTP payloads
    * carry the WIRE codings a raw-message crawl writer (wget, early
    * Heritrix) stores — doc_id % 8 rotates the decoding contract:
    * identity Content-Length, `Transfer-Encoding: chunked` (rotating
    * chunk sizes, a chunk extension, and — kind 7 — a trailer
    * section), `Content-Encoding: gzip` (one RFC 1952 member),
    * chunked-THEN-gzip (the real-world double), zlib-wrapped
    * `deflate`, the bare-stream deflate server bug (sniffed the way
    * browsers do), and a `br` payload we decline by name
    * (`coding_err = content-coding:br`, bytes kept as planted).
    */
  private def plantedHttpEncodedRecords(s: SparkSession, d: String)
      : DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("record", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        import graft.sources.{WarcCodec, WarcGz}
        val id = r.getLong(0)
        val text = r.getString(1)
        val uri = s"http://site${id % 13}.com/page/${id % 7}"
        val html = s"<html><head><title>Doc $id</title></head><body>" +
          s"<h1>Title &amp; doc $id&#33;</h1><div>$text</div>" +
          "</body></html>"
        val raw = html.getBytes("UTF-8")
        val rec: Array[Byte] = (id % 8).toInt match {
          case 0 => WarcCodec.encodeResponse(uri, 200, "text/html", raw)
          case 1 => WarcCodec.encodeResponseEncoded(uri, 200, "text/html",
            raw, chunked = true)
          case 2 => WarcCodec.encodeResponseEncoded(uri, 200, "text/html",
            WarcGz.encodeMember(raw), chunked = false,
            contentEncoding = "gzip")
          case 3 => WarcCodec.encodeResponseEncoded(uri, 200, "text/html",
            WarcGz.encodeMember(raw), chunked = true,
            contentEncoding = "gzip")
          case 4 => WarcCodec.encodeResponseEncoded(uri, 200, "text/html",
            WarcCodec.encodeDeflate(raw, wrapped = true), chunked = false,
            contentEncoding = "deflate")
          case 5 => WarcCodec.encodeResponseEncoded(uri, 200, "text/html",
            WarcCodec.encodeDeflate(raw, wrapped = false), chunked = false,
            contentEncoding = "deflate")
          case 6 => WarcCodec.encodeResponseEncoded(uri, 200, "text/html",
            s"BR:$html".getBytes("UTF-8"), chunked = false,
            contentEncoding = "br")
          case _ => WarcCodec.encodeResponseEncoded(uri, 200, "text/html",
            raw, chunked = true, trailer = true)
        }
        Row(id, rec)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** HTTP payload decoding (`source_warc_http`) — the wire codings
    * between a WARC response block and its representation bytes,
    * undone in the scan projection ([[graft.sources.WarcCodec]]):
    * chunked transfer framing de-chunked per RFC 9112 §7.1,
    * gzip/deflate content codings decoded (strict RFC 1952 / sniffed
    * RFC 1950), and the codings we decline surfaced as a NAMED
    * `coding_err` column instead of a null row — so a curation query
    * can count its dark data by kind. The oracle reconstructs the
    * decoded-body md5 and the extracted-text md5 by construction;
    * the `br` kind's md5 proves the bytes passed through UNtouched.
    */
  val sourceWarcHttp: Q = (s, d) => {
    val w = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcParseExpr(
        org.apache.spark.sql.GraftBridge.expression(col("record"))))
    plantedHttpEncodedRecords(s, d)
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"),
        col("w.status").as("status"),
        col("w.content_type").as("content_type"),
        col("w.coding_err").as("coding_err"),
        md5(col("w.body")).as("body_md5"),
        when(col("w.coding_err").isNull &&
            col("w.content_type") === "text/html",
          md5(TextOps.extractHtml(decode(col("w.body"), "UTF-8"))
            .getField("text"))).as("extracted_md5"))
      .orderBy("doc_id")
  }

  /** Plant REAL `.warc.gz` archive files: [[plantedWarcRecords]]'s
    * record stream grouped into `nFiles` concatenated-gzip-member
    * files ([[graft.sources.WarcGz]] framing, one record per member —
    * the Common Crawl layout), each file's members in ascending doc-id
    * order, written from the EXECUTORS (hash-repartition on the file
    * key + within-partition sort, one sequential write per file group
    * — the shape any distributed fixture/export write takes). Member
    * framing rotates the optional gzip fields (FNAME, FHCRC) so the
    * source exercises real header-skip paths, not just the minimal
    * frame. Returns the directory.
    */
  private def plantWarcGzFiles(s: SparkSession, d: String,
                               nFiles: Int): String = {
    val dir = Scratch.dir("graft_warc_gz")
    writeWarcGzFiles(plantedWarcRecords(s, d), dir, nFiles,
      "members", 0L, col("doc_id") % nFiles)
    dir
  }

  /** The executor-side archive writer behind [[plantWarcGzFiles]] and
    * the streaming feed: group `(doc_id, record)` rows into `nFiles`
    * `.warc.gz` files named `$prefix-NNNNN.warc.gz` under `dir`,
    * members in ascending doc-id order. `mtimeMs > 0` forces each
    * file's modification time (the [[plantWave]] discipline — file
    * streams order waves by mtime). `fileNo` is the explicit file key
    * (must land in `0 until nFiles`) — explicit because a caller
    * feeding a PARITY-FILTERED record set would make the default
    * `doc_id % nFiles` constant and silently collapse its wave into
    * one archive.
    */
  private def writeWarcGzFiles(records: DataFrame, dir: String,
                               nFiles: Int, prefix: String,
                               mtimeMs: Long, fileNo: Column): Unit =
    records
      .withColumn("file_no", fileNo.cast("long"))
      .repartition(nFiles, col("file_no"))
      .sortWithinPartitions("file_no", "doc_id")
      .select("file_no", "record")
      .foreachPartition { (rows: Iterator[Row]) =>
        var cur = -1L
        var out: java.io.OutputStream = null
        var file: java.io.File = null
        var idx = 0
        def close(): Unit = if (out != null) {
          out.close(); out = null
          if (mtimeMs > 0) file.setLastModified(mtimeMs)
        }
        try {
          rows.foreach { r =>
            val f = r.getLong(0)
            if (f != cur) {
              close(); cur = f; idx = 0
              file = new java.io.File(dir, f"$prefix-$f%05d.warc.gz")
              out = new java.io.BufferedOutputStream(
                new java.io.FileOutputStream(file))
            }
            out.write(graft.sources.WarcGz.encodeMember(
              r.getAs[Array[Byte]](1),
              fname = if (idx % 3 == 1) s"rec-$idx.warc" else null,
              fhcrc = idx % 3 == 2))
            idx += 1
          }
        } finally close()
      }

  /** `.warc.gz` ARCHIVE ingestion (`source_warc_gz`,
    * [[graft.functions.WarcGzMembersExpr]] over
    * [[graft.sources.WarcGz]]) — the missing first metre of the crawl
    * tier: REAL concatenated-gzip-member archive files on disk (the
    * Common Crawl layout, the source [[graft.sources.WarcCodec]]'s
    * header promised), read through Spark's `binaryFile` source,
    * member-split by the generator (RFC 1952 walk, CRC32/ISIZE
    * verified per member), each member handed to
    * [[graft.functions.WarcParseExpr]] — file bytes to typed records
    * in ONE map-only stage. Parallelism is per FILE, which is the
    * honest unit: a gzip member chain is sequential by construction,
    * and a 100 TB crawl is ~100k × ~1 GB segment files — this exact
    * plan with more files. The oracle reconstructs every fact keyed by
    * (file, member position); member order inside each archive is
    * ascending doc id by construction.
    */
  val sourceWarcGz: Q = (s, d) => {
    val nFiles = 8
    val dir = plantWarcGzFiles(s, d, nFiles)
    val g = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcGzMembersExpr(
        org.apache.spark.sql.GraftBridge.expression(col("content"))))
    val w = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcParseExpr(
        org.apache.spark.sql.GraftBridge.expression(col("member"))))
    s.read.format("binaryFile").option("pathGlobFilter", "*.warc.gz")
      .load(dir)
      .select(regexp_extract(col("path"),
          "members-(\\d+)\\.warc\\.gz$", 1).cast("long").as("file_no"),
        col("content"))
      .select(col("file_no"), g) // -> file_no, member_idx, member
      .select(col("file_no"),
        col("member_idx").cast("long").as("member_idx"), w.as("w"))
      .select(col("file_no"), col("member_idx"),
        col("w.warc_type").as("warc_type"),
        col("w.target_uri").as("target_uri"),
        col("w.status").as("status"),
        col("w.content_type").as("content_type"),
        md5(col("w.body")).as("body_md5"),
        when(col("w.content_type") === "text/html",
          md5(TextOps.extractHtml(decode(col("w.body"), "UTF-8"))
            .getField("text"))).as("extracted_md5"))
      .orderBy("file_no", "member_idx")
  }

  /** The zstd archive fixture's shared dictionary — WARC header
    * boilerplate, which is exactly what a trained Common Crawl
    * dictionary captures (every record repeats these bytes).
    */
  private val warcZstDict: Array[Byte] =
    ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
      "http://site0.com/\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n")
      .getBytes("US-ASCII")

  /** Plant `.warc.zst` archive files ([[graft.sources.WarcZst]]
    * fixture encoders): 8 files keyed by doc_id % 8; EVEN files lead
    * with the dictionary skippable frame (the payload itself
    * zstd-compressed — the Common Crawl variant) and rotate
    * plain / dictionary-compressed / checksummed data frames; ODD
    * files carry no dictionary and rotate plain / DECLARED-dict-id
    * (the named rejection — only well-formed in a dictionary-less
    * archive) / checksummed. One WARC response record per frame,
    * members in ascending doc-id order.
    */
  private def plantWarcZstFiles(s: SparkSession, d: String): String = {
    val dir = Scratch.dir("graft_warc_zst")
    docs(s, d).select(col("doc_id"), col("text"))
      .withColumn("file_no", (col("doc_id") % 8).cast("long"))
      .repartition(8, col("file_no"))
      .sortWithinPartitions("file_no", "doc_id")
      .foreachPartition { (rows: Iterator[Row]) =>
        import graft.sources.{WarcCodec, WarcZst}
        var cur = -1L
        var out: java.io.OutputStream = null
        def close(): Unit = if (out != null) { out.close(); out = null }
        try {
          rows.foreach { r =>
            val id = r.getLong(0); val f = r.getLong(2)
            if (f != cur) {
              close(); cur = f
              out = new java.io.BufferedOutputStream(
                new java.io.FileOutputStream(
                  new java.io.File(dir, f"records-$f%05d.warc.zst")))
              if (f % 2 == 0)
                out.write(WarcZst.encodeSkippable(
                  WarcZst.encodeFrame(warcZstDict)))
            }
            val rec = WarcCodec.encodeResponse(
              s"http://site${id % 13}.com/z$id", 200, "text/html",
              r.getString(1).getBytes("UTF-8"))
            val kind = ((id / 8) % 3).toInt
            out.write(((f % 2).toInt, kind) match {
              case (0, 1) => WarcZst.encodeFrame(rec, dict = warcZstDict)
              case (1, 1) => WarcZst.encodeFrameWithDictId(rec, dictId = 7)
              case (_, 2) => WarcZst.encodeFrame(rec, checksum = true)
              case _ => WarcZst.encodeFrame(rec)
            })
          }
        } finally close()
      }
    dir
  }

  /** `.warc.zst` ARCHIVE ingestion (`source_warc_zst`,
    * [[graft.functions.WarcZstMembersExpr]] over
    * [[graft.sources.WarcZst]]) — Common Crawl's CURRENT framing, the
    * round-14 gap where `zstd` was only a named Content-Encoding
    * rejection: real multi-frame archives on disk read through
    * `binaryFile`, the engine's own frame walk splitting members
    * (skippable-dictionary capture, per-frame header/block framing,
    * platform-codec decompression — the gzip/Inflater division of
    * labor), each member through [[graft.functions.WarcParseExpr]].
    * Dictionary-compressed frames decode through the captured
    * skippable dictionary; frames declaring a dictionary an archive
    * does not carry surface the NAMED `zstd-dictionary:<id>` member
    * error with bytes kept (WARC facts null — labeled dark data, the
    * `br` discipline). Parallelism per file, the honest sequential
    * unit, exactly like `source_warc_gz`.
    */
  val sourceWarcZst: Q = (s, d) => {
    val dir = plantWarcZstFiles(s, d)
    val g = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcZstMembersExpr(
        org.apache.spark.sql.GraftBridge.expression(col("content"))))
    val w = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcParseExpr(
        org.apache.spark.sql.GraftBridge.expression(col("member"))))
    s.read.format("binaryFile").option("pathGlobFilter", "*.warc.zst")
      .load(dir)
      .select(regexp_extract(col("path"),
          "records-(\\d+)\\.warc\\.zst$", 1).cast("long").as("file_no"),
        col("content"))
      .select(col("file_no"), g) // -> file_no, member_idx, member, err
      .select(col("file_no"),
        col("member_idx").cast("long").as("member_idx"),
        col("err"), w.as("w"))
      .select(col("file_no"), col("member_idx"), col("err"),
        col("w.target_uri").as("target_uri"),
        col("w.status").as("status"),
        md5(col("w.body")).as("body_md5"))
      .orderBy("file_no", "member_idx")
  }

  /** WET EXPORT (`pipeline_wet_export`) — the derivative-corpus SINK:
    * crawl archives in, extracted-text archives out, Common Crawl's
    * own `.warc.wet.gz` layout. The chain is the production shape end
    * to end: WARC records parse in the scan projection, html
    * responses extract, each page re-frames as a WARC `conversion`
    * record ([[graft.functions.WarcConversionExpr]] — record BYTES
    * built executor-side in the projection), every output file gets a
    * `warcinfo` leader, and the archive write is the same
    * hash-repartition + within-partition-sort + sequential-write
    * shape as [[writeWarcGzFiles]] (write parallelism = one task per
    * output file, the honest unit for a sequential member chain).
    * Verification READS THE EXPORT BACK through the engine's own
    * container walk — member framing, leader placement, record
    * headers and text bytes all md5-replayed by construction.
    */
  val pipelineWetExport: Q = (s, d) => {
    val nFiles = 5
    val dir = Scratch.dir("graft_wet")
    val w = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcParseExpr(
        org.apache.spark.sql.GraftBridge.expression(col("record"))))
    val conv = plantedWarcRecords(s, d)
      .select(col("doc_id"), w.as("w"))
      .where(col("w.warc_type") === "response" &&
        col("w.content_type") === "text/html")
      .select(col("doc_id"),
        org.apache.spark.sql.GraftBridge.column(
          graft.functions.WarcConversionExpr(
            org.apache.spark.sql.GraftBridge.expression(
              col("w.target_uri")),
            org.apache.spark.sql.GraftBridge.expression(
              TextOps.extractHtml(decode(col("w.body"), "UTF-8"))
                .getField("text")))).as("record"))
    val leader = graft.sources.WarcCodec.encodeInfo(
      "software: graft-wet-writer\r\n".getBytes("US-ASCII"))
    // one warcinfo leader per output file; negative doc_ids sort the
    // leaders to member position 0 inside each file
    val leaders = s.range(nFiles)
      .select((col("id") - nFiles).as("doc_id"), lit(leader).as("record"))
    writeWarcGzFiles(conv.unionByName(leaders), dir, nFiles, "wet", 0L,
      when(col("doc_id") < 0, col("doc_id") + nFiles)
        .otherwise(col("doc_id") % nFiles))
    val g = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcGzMembersExpr(
        org.apache.spark.sql.GraftBridge.expression(col("content"))))
    val rw = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcParseExpr(
        org.apache.spark.sql.GraftBridge.expression(col("member"))))
    s.read.format("binaryFile").option("pathGlobFilter", "*.warc.gz")
      .load(dir)
      .select(regexp_extract(col("path"),
          "wet-(\\d+)\\.warc\\.gz$", 1).cast("long").as("file_no"),
        col("content"))
      .select(col("file_no"), g)
      .select(col("file_no"),
        col("member_idx").cast("long").as("member_idx"), rw.as("w"))
      .select(col("file_no"), col("member_idx"),
        col("w.warc_type").as("warc_type"),
        col("w.target_uri").as("target_uri"),
        md5(col("w.body")).as("body_md5"))
      .orderBy("file_no", "member_idx")
  }

  /** WAT EXPORT (`pipeline_wat_export`) — the METADATA derivative
    * beside [[pipelineWetExport]]'s text one (Common Crawl's
    * `.warc.wat.gz`): every response record's envelope facts (uri,
    * status, content type, outlink count) as a canonical JSON body in
    * a WARC `metadata` record, written through the same executor-side
    * archive shape and read back through the engine's own member
    * walk. The JSON is BUILT as a deterministic string (field order
    * fixed by construction) so the oracle replays the exact bytes.
    */
  val pipelineWatExport: Q = (s, d) => {
    val nFiles = 5
    val dir = Scratch.dir("graft_wat")
    val w = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcParseExpr(
        org.apache.spark.sql.GraftBridge.expression(col("record"))))
    val parsed = plantedWarcRecords(s, d)
      .select(col("doc_id"), w.as("w"))
      .where(col("w.warc_type") === "response")
    val nLinks = when(col("w.content_type") === "text/html",
      size(graft.functions.HtmlLinks.htmlLinks(
        decode(col("w.body"), "UTF-8")).getField("links")))
      .otherwise(0).cast("long")
    val json = concat(lit("{\"uri\":\""), col("w.target_uri"),
      lit("\",\"status\":"), col("w.status").cast("string"),
      lit(",\"content_type\":\""), col("w.content_type"),
      lit("\",\"n_links\":"), nLinks.cast("string"), lit("}"))
    val conv = parsed.select(col("doc_id"),
      org.apache.spark.sql.GraftBridge.column(
        graft.functions.WarcConversionExpr(
          org.apache.spark.sql.GraftBridge.expression(
            col("w.target_uri")),
          org.apache.spark.sql.GraftBridge.expression(json),
          metadata = true)).as("record"))
    val leader = graft.sources.WarcCodec.encodeInfo(
      "software: graft-wat-writer\r\n".getBytes("US-ASCII"))
    val leaders = s.range(nFiles)
      .select((col("id") - nFiles).as("doc_id"), lit(leader).as("record"))
    writeWarcGzFiles(conv.unionByName(leaders), dir, nFiles, "wat", 0L,
      when(col("doc_id") < 0, col("doc_id") + nFiles)
        .otherwise(col("doc_id") % nFiles))
    val g = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcGzMembersExpr(
        org.apache.spark.sql.GraftBridge.expression(col("content"))))
    val rw = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcParseExpr(
        org.apache.spark.sql.GraftBridge.expression(col("member"))))
    s.read.format("binaryFile").option("pathGlobFilter", "*.warc.gz")
      .load(dir)
      .select(regexp_extract(col("path"),
          "wat-(\\d+)\\.warc\\.gz$", 1).cast("long").as("file_no"),
        col("content"))
      .select(col("file_no"), g)
      .select(col("file_no"),
        col("member_idx").cast("long").as("member_idx"), rw.as("w"))
      .select(col("file_no"), col("member_idx"),
        col("w.warc_type").as("warc_type"),
        col("w.target_uri").as("target_uri"),
        md5(col("w.body")).as("body_md5"))
      .orderBy("file_no", "member_idx")
  }

  /** STREAMING WET EXPORT (`pipeline_wet_stream`) — the derivative
    * sink as a CONTINUOUS query: crawl records arrive as a stream,
    * and each micro-batch writes its own `.warc.wet.gz` archive
    * directory (batch-id-named, wholesale overwrite — the idempotent
    * redelivery discipline of the frontier store), one warcinfo
    * leader per file. Verification reads EVERY archive back through
    * the engine's own member walk and emits the conversion records'
    * (uri, text-md5) facts — a SET the micro-batch split cannot
    * change, so the oracle is the batch replay regardless of how the
    * wave split.
    */
  val pipelineWetStream: Q = (s, d) => {
    val outDir = Scratch.dir("graft_wet_stream")
    val feedDir = Scratch.dir("graft_wet_feed")
    plantedWarcRecords(s, d).repartition(4, col("doc_id"))
      .write.mode("overwrite").parquet(feedDir)
    val schema = plantedWarcRecords(s, d).schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
    val leader = graft.sources.WarcCodec.encodeInfo(
      "software: graft-wet-writer\r\n".getBytes("US-ASCII"))
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val w = org.apache.spark.sql.GraftBridge.column(
          graft.functions.WarcParseExpr(
            org.apache.spark.sql.GraftBridge.expression(col("record"))))
        val conv = batch.select(col("doc_id"), w.as("w"))
          .where(col("w.warc_type") === "response" &&
            col("w.content_type") === "text/html")
          .select(col("doc_id"),
            org.apache.spark.sql.GraftBridge.column(
              graft.functions.WarcConversionExpr(
                org.apache.spark.sql.GraftBridge.expression(
                  col("w.target_uri")),
                org.apache.spark.sql.GraftBridge.expression(
                  TextOps.extractHtml(decode(col("w.body"), "UTF-8"))
                    .getField("text")))).as("record"))
        val leaders = batch.sparkSession.range(1)
          .select((col("id") - 1).as("doc_id"),
            lit(leader).as("record"))
        // one archive per micro-batch, wholesale-overwritten on
        // redelivery (the batch-id names the directory)
        val batchDir = s"$outDir/batch-$batchId"
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(batchDir))
        writeWarcGzFiles(conv.unionByName(leaders),
          batchDir, 1, "wet", 0L, lit(0L))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    BenchProbe.addStreamData("pipeline_wet_stream", q)
    val g = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcGzMembersExpr(
        org.apache.spark.sql.GraftBridge.expression(col("content"))))
    val rw = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcParseExpr(
        org.apache.spark.sql.GraftBridge.expression(col("member"))))
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz")
      .option("recursiveFileLookup", "true")
      .load(outDir)
      .select(g)
      .select(rw.as("w"))
      .where(col("w.warc_type") === "conversion")
      .select(col("w.target_uri").as("target_uri"),
        md5(col("w.body")).as("body_md5"))
      .orderBy("target_uri", "body_md5")
  }

  /** The documents table as REAL PDFs ([[graft.operators.PdfCodec]]
    * fixture encoder) — doc_id % 18 rotates the extraction contract's
    * whole surface: a 1-page classic raw-stream doc with WinAnsi
    * specials, a 2-page classic FlateDecode doc (the `\f` page join),
    * the four named rejections (an unreadable /Encrypt, Type0 WITHOUT
    * ToUnicode, DCT filter, structurally broken), the MODERN layouts
    * — a 1-page PDF 1.5 file whose document objects live in an ObjStm
    * behind a predictor-coded cross-reference stream, and a 2-page
    * PDF 1.5 file with a plain cross-reference stream — the legacy
    * filters (an LZWDecode content stream and an ASCII85 →
    * FlateDecode filter CHAIN), the FONT surface (a `/Differences`-
    * remapped simple font with AGL names + `uniXXXX` auto-increment,
    * and a Type0/Identity-H font whose ToUnicode CMap carries both
    * bfchar and bfrange sections), and the ENCRYPTED-majority
    * surface: a V2/R3 RC4 file, a V4/R4 AESV2 file and a V5/R6
    * AES-256 file, each with the empty user password a crawl
    * actually meets (permissions-only encryption), decrypted through
    * the standard security handler — plus a passworded V5 file that
    * must stay an `encrypted` rejection.
    */
  private def plantedPdfDocs(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("pdf", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      import graft.operators.PdfCodec
      rows.map { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        val bytes: Array[Byte] = (id % 18).toInt match {
          case 0 => PdfCodec.encodePdf(Seq(Seq(s"Doc $id heading.",
            text, "café € — ’ tail")))
          case 1 => PdfCodec.encodePdf(Seq(
            Seq(s"Doc $id page one.", text),
            Seq(s"Doc $id page two.")), flate = true)
          case 2 => PdfCodec.encodePdf(Seq(Seq(text)), encrypted = true)
          case 3 => PdfCodec.encodePdf(Seq(Seq(text)), type0 = true)
          case 4 => PdfCodec.encodePdf(Seq(Seq(text)), badFilter = true)
          case 5 => PdfCodec.encodePdf(Seq(Seq(s"Doc $id modern.",
            text)), flate = true, xrefStream = true, objStm = true,
            predictor = 12)
          case 6 => PdfCodec.encodePdf(Seq(
            Seq(s"Doc $id xr one.", text),
            Seq(s"Doc $id xr two.")), xrefStream = true)
          case 7 => PdfCodec.encodePdf(Seq(Seq(s"Doc $id lzw.",
            text)), lzw = true)
          case 8 => PdfCodec.encodePdf(Seq(Seq(s"Doc $id chained.",
            text)), flate = true, a85 = true)
          case 9 => PdfCodec.encodePdf(Seq(Seq(s"Doc $id diff.",
            text)), differences = true)
          case 10 => PdfCodec.encodePdf(Seq(Seq(s"Doc $id cid.",
            text)), cid = true)
          case 12 => PdfCodec.encodePdf(Seq(Seq(s"Doc $id rc4.",
            text)), flate = true, crypt = "rc4")
          case 13 => PdfCodec.encodePdf(Seq(Seq(s"Doc $id aes.",
            text)), crypt = "aes")
          case 14 => PdfCodec.encodePdf(Seq(Seq(s"Doc $id v5.",
            text)), flate = true, crypt = "aes256")
          case 15 => PdfCodec.encodePdf(Seq(Seq(text)),
            crypt = "aes256-pwd")
          case 16 => PdfCodec.encodePdf(Seq(Seq(s"Doc $id inline.",
            text)), flate = true, inlineImage = "raw")
          case 17 => PdfCodec.encodePdf(Seq(Seq(text)),
            inlineImage = "nolen")
          case _ => s"%PDF-1.4 header then garbage $id"
            .getBytes("US-ASCII")
        }
        Row(id, bytes)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** PDF → text (`text_extract_pdf`,
    * [[graft.functions.PdfTextExpr]] over
    * [[graft.operators.PdfCodec]]) — after HTML, the next-largest
    * text payload a crawl carries, extracted byte-for-byte in the
    * scan projection: xref walk, FlateDecode, BT/ET text runs, the
    * WinAnsi byte→char table, pages joined with `\f` — and every
    * unsupported construct a NAMED rejection the query keeps as a
    * relational fact (`err`), never a silent mojibake. The oracle
    * reconstructs the extracted STRING per kind (chr() codepoints for
    * the planted specials) and the rejection name per planted bad
    * document.
    */
  val textExtractPdf: Q = (s, d) => {
    val p = org.apache.spark.sql.GraftBridge.column(
      graft.functions.PdfTextExpr(
        org.apache.spark.sql.GraftBridge.expression(col("pdf"))))
    plantedPdfDocs(s, d)
      .select(col("doc_id"), p.as("p"))
      .select(col("doc_id"),
        col("p.n_pages").as("n_pages"),
        col("p.err").as("err"),
        md5(col("p.text")).as("text_md5"),
        length(col("p.text")).cast("long").as("n_chars"))
      .orderBy("doc_id")
  }

  /** The documents table wrapped as extractable PDFs for the composed
    * pretrain variant — SUCCESS kinds only (doc_id % 2: 1-page raw /
    * 2-page FlateDecode), so the chain sees every doc and the oracle
    * replays extraction as a string reconstruction.
    */
  private def pdfAugmentedDocs(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("pdf", BinaryType),
      StructField("source", StringType)))
    docs(s, d).select(col("doc_id"), col("text"), col("source"))
      .mapPartitions { rows =>
        import graft.operators.PdfCodec
        rows.map { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          // odd docs arrive as MODERN files (xref stream + ObjStm +
          // predictor) — the extracted text is identical, so the
          // oracle reconstruction is layout-blind, as it should be
          val bytes: Array[Byte] =
            if (id % 2 == 0)
              PdfCodec.encodePdf(Seq(Seq(s"Doc $id overview.", text)))
            else
              PdfCodec.encodePdf(Seq(
                Seq(s"Doc $id overview.", text),
                Seq(s"Appendix $id.")), flate = true,
                xrefStream = true, objStm = true, predictor = 12)
          Row(id, bytes, r.getString(2))
        }
      }(Encoders.row(schema)).toDF()
  }

  /** The PDF-ingest pretraining pipeline (`pipeline_pretrain_pdf`):
    * [[pipelinePretrainHtml]]'s chain with [[textExtractPdf]]'s
    * extraction as the ingest stage — PDF bytes → text → exact dedup →
    * decontamination → language/quality gates → mixture → shards, the
    * whole path one declarative plan. `text_extract_pdf` pins the
    * extraction byte-for-byte; this pins the COMPOSITION.
    */
  val pipelinePretrainPdf: Q = (s, d) => {
    val p = org.apache.spark.sql.GraftBridge.column(
      graft.functions.PdfTextExpr(
        org.apache.spark.sql.GraftBridge.expression(col("pdf"))))
    pretrainChain(graft.plans.LazyCheckpoint.shared(
      pdfAugmentedDocs(s, d).select(col("doc_id"),
        p.getField("text").as("text"), col("source"))))
  }

  /** eTLD+1 from a VERSIONED PSL artifact (`text_url_domain_artifact`,
    * [[graft.functions.PslStore]] +
    * [[graft.functions.UrlOps.registrableDomainFrom]]) — the full
    * public-suffix load path the embedded snapshot stands in for
    * ([[graft.functions.UrlOps]]'s header promise): two artifact
    * versions are planted (v2 adds multi-label, wildcard and
    * exception rules the snapshot does NOT carry), each pinned at
    * construction, and the SAME host column resolves differently
    * under each pin — mis-keying a `k12.ma.us`-style suffix is
    * exactly the silent domain-cap distortion the artifact fixes.
    * Rules parse once on the driver and ship inside the expression;
    * per row the match is a label-tail walk, map-only.
    */
  val textUrlDomainArtifact: Q = (s, d) => {
    val dir = Scratch.dir("graft_psl")
    val v1Rules = Seq("com", "net", "org", "uk", "co.uk", "jp", "us",
      "br", "io", "dev")
    val v2Rules = v1Rules ++ Seq("github.io", "k12.ma.us", "*.nom.br",
      "*.kawasaki.jp", "!city.kawasaki.jp")
    val v1 = graft.functions.PslStore.save(dir, v1Rules)
    val v2 = graft.functions.PslStore.save(dir, v2Rules)
    val id = col("doc_id")
    val n = (id % 37).cast("string")
    val host = when(id % 8 === 0, concat(lit("www.site"), n, lit(".com")))
      .when(id % 8 === 1, concat(lit("shop.site"), n, lit(".co.uk")))
      .when(id % 8 === 2, concat(lit("user"), n, lit(".github.io")))
      .when(id % 8 === 3, concat(lit("deep.sub"), n, lit(".k12.ma.us")))
      .when(id % 8 === 4, concat(lit("a"), n, lit(".b.nom.br")))
      .when(id % 8 === 5, lit("sub.city.kawasaki.jp"))
      .when(id % 8 === 6, concat(lit("x.other"), n, lit(".kawasaki.jp")))
      .otherwise(lit("github.io"))
    docs(s, d).select(id, host.as("host"))
      .select(id, col("host"),
        graft.functions.UrlOps.registrableDomainFrom(col("host"), dir,
          version = v1).as("domain_v1"),
        graft.functions.UrlOps.registrableDomainFrom(col("host"), dir,
          version = v2).as("domain_v2"))
      .orderBy("doc_id")
  }

  /** The planted language-profile artifact versions — ONE constant
    * drives both the store the query pins and the oracle's replay of
    * the scoring, so the weights cannot drift between them. v1 is the
    * under-trained 2-language set; v2 adds es/fr with refined weights
    * (the upgrade a curation run rolls out WITHOUT re-keying history,
    * because every consumer pins its version).
    */
  private val plantedLangProfilesV2: Seq[(String, Seq[(String, Long)])] =
    Seq(
      "en" -> Seq("the" -> 4L, "and" -> 3L, "of" -> 3L, "is" -> 2L,
        "to" -> 2L),
      "de" -> Seq("der" -> 4L, "und" -> 3L, "ist" -> 3L, "das" -> 2L,
        "nicht" -> 2L),
      "es" -> Seq("el" -> 4L, "que" -> 3L, "los" -> 3L, "una" -> 2L,
        "por" -> 2L),
      "fr" -> Seq("le" -> 4L, "et" -> 3L, "les" -> 3L, "une" -> 2L,
        "dans" -> 2L))

  private val plantedLangProfilesV1 = plantedLangProfilesV2.take(2)

  /** Language-ID from a VERSIONED profile artifact
    * (`text_langid_artifact`, [[graft.functions.LangProfileStore]] +
    * [[TextOps.langIdFromArtifact]]) — the artifact-loaded model the
    * embedded [[TextOps.langId]] vote stands in for: two profile
    * versions planted, each pinned at construction, scored over a
    * multilingual planted corpus (each doc leads with one language's
    * marker phrase, then the REAL doc text — so scores depend on the
    * whole document and the oracle must replay the weighted sum, not
    * just the plant). v1 knows only en/de, so es/fr docs mis-classify
    * under it and re-classify under v2 — the version-pinned upgrade
    * path in one row.
    */
  val textLangidArtifact: Q = (s, d) => {
    val dir = Scratch.dir("graft_langid")
    val v1 = graft.functions.LangProfileStore.save(dir,
      plantedLangProfilesV1)
    val v2 = graft.functions.LangProfileStore.save(dir,
      plantedLangProfilesV2)
    val id = col("doc_id")
    val txt = concat(
      when(id % 4 === 0, lit("the cat and the dog of the house is to "))
        .when(id % 4 === 1, lit("der hund und die katze ist das nicht "))
        .when(id % 4 === 2, lit("el perro que los gatos una casa por "))
        .otherwise(lit("le chien et les chats une maison dans ")),
      col("text"))
    docs(s, d).select(id, txt.as("text"))
      .select(id,
        TextOps.langIdFromArtifact(col("text"), dir, v1).as("lang_v1"),
        TextOps.langIdFromArtifact(col("text"), dir, v2).as("lang_v2"))
      .orderBy("doc_id")
  }

  /** Fixture byte-encoder for windows-1252 bodies — the mirror-image
    * path of [[graft.functions.CharsetDecode]]'s decoder (the WebP
    * fixture-encoder discipline: the test writes bytes through an
    * INDEPENDENT construction, the operator reads them back). Only
    * ASCII, the latin-1 identity range and the planted 0x80–0x9F
    * specials appear in fixtures.
    */
  private def w1252Bytes(s0: String): Array[Byte] = {
    val out = new Array[Byte](s0.length)
    var i = 0
    while (i < s0.length) {
      val c = s0(i)
      out(i) = c match {
        case '€' => 0x80.toByte // €
        case '‘' => 0x91.toByte // ‘
        case '’' => 0x92.toByte // ’
        case '•' => 0x95.toByte // •
        case '–' => 0x96.toByte // –
        case '—' => 0x97.toByte // —
        case c0 if c0 < 0x100 && (c0 < 0x80 || c0 > 0x9F) => c0.toByte
        case c0 => throw new IllegalArgumentException(
          s"fixture char not in windows-1252 fixture set: U+${c0.toInt}")
      }
      i += 1
    }
    out
  }

  /** The documents table as raw BYTE bodies in a deterministic charset
    * spread ([[plantedWarcRecords]] discipline) — the fixture for the
    * bytes→text tier. doc_id % 7 rotates the detection precedence
    * ladder: a UTF-8 BOM that must beat a contradicting transport
    * label, a UTF-16LE BOM, a transport `ISO-8859-1` label (the WHATWG
    * alias that really means windows-1252 — the body plants 0x80–0x9F
    * punctuation AND a decoy `<meta charset="utf-8">` the header must
    * shadow), an in-content `<meta charset=windows-1252>`, unlabeled
    * strictly-valid UTF-8, unlabeled bytes that are INVALID UTF-8
    * (the windows-1252 fallback), and a `Shift_JIS` label (the honest
    * unsupported-label rejection).
    */
  private def plantedCharsetDocs(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("body", BinaryType),
      StructField("content_type", StringType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      val utf16le = java.nio.charset.StandardCharsets.UTF_16LE
      rows.map { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        val (body, ct): (Array[Byte], String) = (id % 7).toInt match {
          case 0 =>
            (Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
              s"Doc $id é€ $text".getBytes(utf8),
              "text/html; charset=iso-8859-1")
          case 1 =>
            (Array(0xFF, 0xFE).map(_.toByte) ++
              s"Doc $id é€ $text".getBytes(utf16le), null)
          case 2 =>
            (w1252Bytes("<meta charset=\"utf-8\"> quote ’ dash " +
              s"— euro € $text"),
              "text/plain; charset=ISO-8859-1")
          case 3 =>
            (w1252Bytes("<html><head><meta charset=\"windows-1252\">" +
              s"</head><body>bullet • $text</body></html>"),
              "text/html")
          case 4 => (s"café $text".getBytes(utf8), null)
          case 5 =>
            ("mid ".getBytes(utf8) ++ Array(0x97.toByte) ++
              s" dash $text".getBytes(utf8), null)
          case _ =>
            (text.getBytes(utf8),
              "application/octet-stream; charset=Shift_JIS")
        }
        Row(id, body, ct)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** Charset sniff + decode (`text_charset_decode`,
    * [[graft.functions.CharsetDecodeExpr]]) — the bytes→text step a
    * 100 TB crawl runs between the container parse and the HTML
    * extractor, verified byte-for-byte across the full detection
    * ladder: BOM beats a contradicting header, header beats an
    * in-body meta decoy, the ISO-8859-1 alias decodes 0x80–0x9F as
    * windows-1252 punctuation, strict-UTF-8 sniffing, the legacy
    * fallback, and the named unsupported-label rejection (NULL text,
    * never mojibake). Map-only scan projection; the oracle
    * reconstructs every decoded STRING by construction (chr()
    * codepoints, no encoding round-trip through the SQL text itself).
    */
  val textCharsetDecode: Q = (s, d) =>
    plantedCharsetDocs(s, d)
      .select(col("doc_id"),
        TextOps.decodeCharset(col("body"), col("content_type")).as("c"))
      .select(col("doc_id"),
        col("c.charset").as("charset"),
        col("c.method").as("method"),
        md5(col("c.text")).as("md5_text"),
        length(col("c.text")).cast("long").as("n_chars"))
      .orderBy("doc_id")

  /** WARC → charset → clean text (`source_warc_charset`): the full
    * crawl-native byte path composed in ONE scan projection —
    * [[graft.functions.WarcParseExpr]] splits the container and the
    * HTTP message, [[graft.functions.CharsetDecodeExpr]] resolves the
    * body bytes against the Content-Type's charset parameter (which
    * [[graft.sources.WarcCodec]] preserves verbatim), and
    * [[graft.functions.HtmlExtractExpr]] strips the markup — so a
    * windows-1252 page, a UTF-16 page and an EUC-JP page (rejected by
    * name, not mojibake'd) all land in ONE typed frame. No UDF, no
    * shuffle; at 100 TB this is the ingest scan itself.
    */
  val sourceWarcCharset: Q = (s, d) => {
    val w = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcParseExpr(
        org.apache.spark.sql.GraftBridge.expression(col("record"))))
    plantedWarcCharsetRecords(s, d)
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"),
        TextOps.decodeCharset(col("w.body"), col("w.content_type"))
          .as("c"))
      .select(col("doc_id"),
        col("c.charset").as("charset"),
        col("c.method").as("method"),
        TextOps.extractHtml(col("c.text")).as("ex"))
      .select(col("doc_id"), col("charset"), col("method"),
        md5(col("ex.text")).as("extracted_md5"),
        col("ex.n_blocks").as("n_blocks"))
      .orderBy("doc_id")
  }

  /** Single-record WARCs in a charset spread ([[plantedWarcRecords]]
    * discipline): a windows-1252 HTML response labeled in the HTTP
    * Content-Type, a UTF-16LE HTML response detected by BOM, and an
    * EUC-JP-labeled response (the unsupported-label rejection riding
    * the full WARC path).
    */
  private def plantedWarcCharsetRecords(s: SparkSession,
      d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("record", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      import graft.sources.WarcCodec
      val utf16le = java.nio.charset.StandardCharsets.UTF_16LE
      rows.map { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        val uri = s"http://site${id % 13}.com/page/${id % 7}"
        val rec: Array[Byte] = (id % 3).toInt match {
          case 0 =>
            val html = s"<html><head><title>Doc $id</title></head>" +
              s"<body><h1>Café &amp; doc $id</h1>" +
              s"<div>’ $text —</div></body></html>"
            WarcCodec.encodeResponse(uri, 200,
              "text/html; charset=windows-1252", w1252Bytes(html))
          case 1 =>
            val html = s"<html><body><h1>Doc $id</h1>" +
              s"<div>$text</div></body></html>"
            WarcCodec.encodeResponse(uri, 200, "text/html",
              Array(0xFF, 0xFE).map(_.toByte) ++ html.getBytes(utf16le))
          case _ =>
            WarcCodec.encodeResponse(uri, 200,
              "text/html; charset=EUC-JP", text.getBytes("US-ASCII"))
        }
        Row(id, rec)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** The legacy multi-byte charset plants — ONE constant drives the
    * fixture byte bodies, the oracle's chr()-reconstructed expected
    * text AND the spec's three-way cross-check, so the mapping cannot
    * drift between them. Per kind: the transport label (null = the
    * label rides an in-body `<meta`), whether the reduced v1 artifact
    * (Japanese indexes only) already decodes it, the payload BYTES
    * (hex), and the payload's expected CODE POINTS (hand-written from
    * the published mappings; [[graft.CharsetLegacySpec]] re-verifies
    * them against the JDK's own decoders). The payloads deliberately
    * walk the whole WHATWG state-machine surface: both shift_jis
    * label routes, half-width katakana in both Japanese families, the
    * gbk single-byte 0x80 euro, gb18030 two-byte + four-byte BMP +
    * four-byte supplementary, a big5 double-code-point special, a
    * malformed sequence with the spec's ASCII byte-restore, and a
    * label outside the artifact (koi8-r) that stays a NAMED rejection
    * under every pin.
    */
  private val legacyCharsetPlants: Seq[(String, Boolean, String, Seq[Int])] =
    Seq(
      // shift_jis via transport label
      ("text/html; charset=shift_jis", true,
        "82a088a4834a836993fa967b8cea836583588367",
        Seq(0x3042, 0x611B, 0x30AB, 0x30CA, 0x65E5, 0x672C, 0x8A9E,
          0x30C6, 0x30B9, 0x30C8)),
      // shift_jis via meta prescan (plus half-width katakana)
      (null, true, "93fa967b8ceab1b2b3",
        Seq(0x65E5, 0x672C, 0x8A9E, 0xFF71, 0xFF72, 0xFF73)),
      // euc-jp: jis0208 plane + 0x8E half-width plane + 0x8F jis0212
      ("text/html; charset=EUC-JP", true,
        "b0a6c6fccbdcb8eca4cfcec9a4a48eb18eb28fa2af",
        Seq(0x611B, 0x65E5, 0x672C, 0x8A9E, 0x306F, 0x826F, 0x3044,
          0xFF71, 0xFF72, 0x02D8)),
      // gbk via the gb2312 alias + the single-byte 0x80 euro
      ("text/html; charset=gb2312", false,
        "d6d0cec4b1e0c2ebb2e2cad480",
        Seq(0x4E2D, 0x6587, 0x7F16, 0x7801, 0x6D4B, 0x8BD5, 0x20AC)),
      // gb18030: two-byte, four-byte BMP pointer 0, four-byte
      // supplementary pointer 189000
      ("text/html; charset=gb18030", false, "a8a38130813090308130",
        Seq(0x01CE, 0x0080, 0x10000)),
      // big5 + the pointer-1133 double-code-point special
      ("text/html; charset=Big5", false, "a4a4a4e5b4fab8d5bb4fc6578862",
        Seq(0x4E2D, 0x6587, 0x6E2C, 0x8A66, 0x81FA, 0x7063,
          0x00CA, 0x0304)),
      // euc-kr (windows-949 plane)
      ("text/html; charset=euc-kr", false, "c7d1b1b9beee20c0cec4dab5f9",
        Seq(0xD55C, 0xAD6D, 0xC5B4, 0x0020, 0xC778, 0xCF54, 0xB529)),
      // malformed shift_jis: invalid ASCII trail restores per spec
      ("text/html; charset=Shift_JIS", true, "812082a0",
        Seq(0xFFFD, 0x0020, 0x3042)),
      // a label NO pin carries: the honest rejection survives
      ("text/html; charset=koi8-r", false, "c1c2", Seq.empty),
      // iso-2022-jp: the STATEFUL escape-based decoder — double-byte
      // jis0208, a return to ASCII, the ESC ( I katakana mode and the
      // ESC ( J Roman mode (0x5C → ¥, 0x7E → ‾), output between every
      // mode switch (two escapes with no output between are an error
      // by spec). jis0208-backed, so BOTH pins decode it.
      ("text/html; charset=iso-2022-jp", true,
        "1b244224332473244b2441244f467c4b5c386c1b2842" +
          "611b284931321b2842621b284a5c7e1b2842",
        Seq(0x3053, 0x3093, 0x306B, 0x3061, 0x306F, 0x65E5, 0x672C,
          0x8A9E, 0x61, 0xFF71, 0xFF72, 0x62, 0x00A5, 0x203E)))

  /** Single-byte plant rows: (transport label, payload hex, expected
    * code points). Payload bytes are PINNED hex (encoded offline by
    * an independent implementation); the expected code points are the
    * standard maps every implementation of these charsets shares —
    * the spec cross-validates the artifact's tables against the JDK
    * decoders byte-for-byte.
    */
  private val singleByteCharsetPlants: Seq[(String, String, Seq[Int])] =
    Seq(
      ("koi8-r", "f0d2c9d7c5d420cdc9d2",
        Seq(0x41F, 0x440, 0x438, 0x432, 0x435, 0x442, 0x20, 0x43C,
          0x438, 0x440)),
      ("koi8-u", "ebc9a7d720adc1cecfcb", // ї and ґ — the -u deltas
        Seq(0x41A, 0x438, 0x457, 0x432, 0x20, 0x491, 0x430, 0x43D,
          0x43E, 0x43A)),
      ("windows-1251", "d1fae5f8fc20e5f9b820b920e7e4e5f1fc",
        Seq(0x421, 0x44A, 0x435, 0x448, 0x44C, 0x20, 0x435, 0x449,
          0x451, 0x20, 0x2116, 0x20, 0x437, 0x434, 0x435, 0x441,
          0x44C)),
      ("iso-8859-2", "5a61bff3b3e62067eab66cb1206a61bcf1",
        Seq(0x5A, 0x61, 0x17C, 0xF3, 0x142, 0x107, 0x20, 0x67, 0x119,
          0x15B, 0x6C, 0x105, 0x20, 0x6A, 0x61, 0x17A, 0x144)),
      ("iso-8859-5", "b4ded1e0de20dfded6d0dbded2d0e2ec",
        Seq(0x414, 0x43E, 0x431, 0x440, 0x43E, 0x20, 0x43F, 0x43E,
          0x436, 0x430, 0x43B, 0x43E, 0x432, 0x430, 0x442, 0x44C)),
      ("iso-8859-7", "e3e5e9dc20f3eff520eafcf3ece5",
        Seq(0x3B3, 0x3B5, 0x3B9, 0x3AC, 0x20, 0x3C3, 0x3BF, 0x3C5,
          0x20, 0x3BA, 0x3CC, 0x3C3, 0x3BC, 0x3B5)),
      ("windows-874", "cac7d1cab4d52080", // € proves the Windows plane
        Seq(0xE2A, 0xE27, 0xE31, 0xE2A, 0xE14, 0xE35, 0x20, 0x20AC)),
      // a single-byte label NO pin carries: honest rejection survives
      ("x-mac-cyrillic", "c1c2", Seq.empty))

  /** [[singleByteCharsetPlants]] as byte bodies (`Doc <id> ` ASCII
    * prefix — identity in every single-byte charset).
    */
  private def plantedSingleByteDocs(s: SparkSession, d: String)
      : DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("body", BinaryType),
      StructField("content_type", StringType)))
    val plants = singleByteCharsetPlants.map { case (l, h, _) =>
      (s"text/html; charset=$l",
        h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    }
    docs(s, d).select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (ct, payload) = plants((id % 8).toInt)
        Row(id, s"Doc $id ".getBytes("US-ASCII") ++ payload, ct)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** SINGLE-BYTE LEGACY DECODE as a versioned ROLLOUT
    * (`text_charset_singlebyte`): v1 pins the multi-byte-only
    * snapshot — every single-byte label is still a NAMED
    * `unsupported-label` rejection — and v2 pins the snapshot WITH
    * the `single:<name>` 128-entry tables (KOI8-R/U, windows-1251,
    * ISO-8859-2/5/7, windows-874), so the same rows flip from dark
    * data to decoded text under the new pin. This is the
    * versioned-artifact story at its sharpest: the koi8-r page the
    * e2e funnel honestly rejects TODAY becomes one artifact version
    * away from decoded, without changing a line of plan.
    */
  val textCharsetSinglebyte: Q = (s, d) => {
    val dir = Scratch.dir("graft_enc_single")
    val v1 = graft.functions.EncodingStore.save(dir,
      graft.functions.EncodingStore.jdkIndexes)
    val v2 = graft.functions.EncodingStore.save(dir,
      graft.functions.EncodingStore.jdkIndexes ++
        graft.functions.EncodingStore.jdkSingleIndexes)
    plantedSingleByteDocs(s, d)
      .select(col("doc_id"),
        TextOps.decodeCharsetFromArtifact(col("body"),
          col("content_type"), dir, v1).as("c1"),
        TextOps.decodeCharsetFromArtifact(col("body"),
          col("content_type"), dir, v2).as("c2"))
      .select(col("doc_id"),
        col("c1.charset").as("charset_v1"),
        col("c1.method").as("method_v1"),
        md5(col("c1.text")).as("md5_v1"),
        col("c2.charset").as("charset_v2"),
        col("c2.method").as("method_v2"),
        md5(col("c2.text")).as("md5_v2"),
        length(col("c2.text")).cast("long").as("n_chars_v2"))
      .orderBy("doc_id")
  }

  /** The documents table as legacy-encoded byte bodies: doc_id % 10
    * selects a [[legacyCharsetPlants]] row; the body is an ASCII
    * prefix (the meta tag for the meta-label kind, then `Doc <id> `)
    * followed by the planted payload bytes — ASCII is identity in all
    * five families, so the per-doc prefix rides every state machine.
    */
  private def plantedLegacyDocs(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("body", BinaryType),
      StructField("content_type", StringType)))
    val plants = legacyCharsetPlants.map { case (ct, _, h, _) =>
      (ct, h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    }
    docs(s, d).select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (ct, payload) = plants((id % 10).toInt)
        val prefix =
          (if (ct == null) "<meta charset=shift_jis>" else "") +
            s"Doc $id "
        Row(id, prefix.getBytes("US-ASCII") ++ payload, ct)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** LEGACY MULTI-BYTE DECODE from a VERSIONED artifact
    * (`text_charset_legacy`, [[graft.functions.EncodingStore]] +
    * [[graft.functions.CharsetDecodeArtifactExpr]]) — the load path
    * that un-NULLs the largest dark-data population the embedded
    * ladder honestly rejects: Shift_JIS/EUC-JP/GBK/Big5/EUC-KR pages.
    * Two pins over the SAME rows: v1 carries only the Japanese
    * indexes (its gbk/big5/euc-kr labels stay NAMED rejections), v2
    * carries all five plus the gb18030 four-byte ranges — the
    * version-pinned rollout path in one frame, PSL-style. Each pin's
    * decoded text is md5-verified byte-for-byte against the oracle's
    * chr()-codepoint reconstruction from the same plant constant.
    * Map-only scan projection; the index tables ship inside the plan
    * exactly like the tokenizer/PSL/language-profile artifacts.
    */
  val textCharsetLegacy: Q = (s, d) => {
    val dir = Scratch.dir("graft_enc_legacy")
    val v1 = graft.functions.EncodingStore.save(dir,
      graft.functions.EncodingStore.jdkIndexes.filter(e =>
        e._1 == "jis0208" || e._1 == "jis0212"))
    val v2 = graft.functions.EncodingStore.save(dir,
      graft.functions.EncodingStore.jdkIndexes,
      graft.functions.EncodingStore.jdkRanges)
    plantedLegacyDocs(s, d)
      .select(col("doc_id"),
        TextOps.decodeCharsetFromArtifact(col("body"),
          col("content_type"), dir, v1).as("c1"),
        TextOps.decodeCharsetFromArtifact(col("body"),
          col("content_type"), dir, v2).as("c2"))
      .select(col("doc_id"),
        col("c1.charset").as("charset_v1"),
        col("c1.method").as("method_v1"),
        md5(col("c1.text")).as("md5_v1"),
        col("c2.charset").as("charset_v2"),
        col("c2.method").as("method_v2"),
        md5(col("c2.text")).as("md5_v2"),
        length(col("c2.text")).cast("long").as("n_chars_v2"))
      .orderBy("doc_id")
  }

  /** robots.txt POLICY GATE (`pipeline_robots_filter`,
    * [[graft.functions.RobotsOps]]) — the crawl politeness step in its
    * production join shape: thirteen planted per-domain policy files
    * (named-agent groups that shadow `*`, longest-match allow-over-
    * disallow, the empty-Disallow idiom, comments) broadcast-joined
    * onto every page by registrable domain, each path judged by the
    * RFC 9309 semantics. The oracle replays the DECISION per doc from
    * the planted rule structure — group selection, prefix match and
    * tie-breaking verified end-to-end, not just parse success.
    */
  val pipelineRobotsFilter: Q = (s, d) => {
    // the production pair: each domain's file parses ONCE, on the
    // small side of the broadcast — pages only prefix-match
    val robots = plantedCrawlRobots(s)
    val id = col("doc_id")
    docs(s, d).select(id,
        concat(lit("site"), (id % 13).cast("string"), lit(".com"))
          .as("domain"),
        concat(lit("/A/b"), (id % 9).cast("string")).as("path"))
      .join(broadcast(robots), Seq("domain"))
      .select(col("doc_id"), col("domain"), col("path"),
        graft.functions.RobotsOps.rulesAllowed(col("rules"),
          col("path")).as("allowed"))
      .orderBy("doc_id")
  }

  /** RFC 9309 WILDCARD rules end-to-end (`text_robots_wildcards`,
    * [[graft.functions.RobotsOps.patternMatches]]) — the `*`/`$`
    * special characters through the PRODUCTION pair (parse once,
    * match per page): one fixed policy file mixing anchored
    * star-dot-php extension rules, a longer wildcard Allow carving a
    * hole in it, an unanchored star family and a case trap; eight
    * planted path kinds hit every branch — anchor respected past the
    * path end, most-octets precedence between wildcard rules,
    * case-sensitive matching. The oracle replays each kind's verdict
    * by construction.
    */
  val textRobotsWildcards: Q = (s, d) => {
    import s.implicits._
    val policies = Seq(
      ("w0.example", "User-agent: graftbot\n" +
        "Disallow: /*.php$\n" +
        "Allow: /shop/*.php$\n" +
        "Disallow: /fish*\n" +
        "Allow: /fish/ok\n"),
      // block every query-string URL — the classic star-question-star
      ("w1.example", "User-agent: *\nDisallow: /*?*\n"),
      // root-only site: the anchored Allow outranks nothing but /
      ("w2.example", "User-agent: *\nAllow: /$\nDisallow: /\n"))
    val robots = policies.toDF("domain", "robots_txt")
      .select(col("domain"), graft.functions.RobotsOps
        .robotsRules(col("robots_txt"), "GraftBot").as("rules"))
    val id = col("doc_id")
    val path = when(id % 8 === 0, lit("/index.php"))
      .when(id % 8 === 1, lit("/index.php?x=1"))
      .when(id % 8 === 2, lit("/shop/a.php"))
      .when(id % 8 === 3, lit("/fishheads"))
      .when(id % 8 === 4, lit("/fish/ok/page"))
      .when(id % 8 === 5, lit("/Fish"))
      .when(id % 8 === 6, concat(lit("/page"), (id % 7).cast("string")))
      .otherwise(lit("/deep/x.php"))
    docs(s, d).select(id,
        concat(lit("w"), (id % 3).cast("string"), lit(".example"))
          .as("domain"), path.as("path"))
      .join(broadcast(robots), Seq("domain"))
      .select(col("doc_id"), col("domain"), col("path"),
        graft.functions.RobotsOps.rulesAllowed(col("rules"),
          col("path")).as("allowed"))
      .orderBy("doc_id")
  }

  /** URL-keyED dedup (`dedup_url`) — the crawl dedup that runs BEFORE
    * any content fingerprint: refetches of one page under different
    * aliases (scheme/host case, default ports, tracking decoration,
    * fragments) collapse under the canonical key. The plant is
    * deliberately coarse (13 sites × 7 pages) so every canonical URL
    * carries many alias variants; the aggregate keeps the smallest
    * doc id per key with the alias count — one map-side-combined
    * groupBy, the [[Dedup.exact]] shape with the canonical URL as the
    * digest.
    */
  val dedupUrl: Q = (s, d) => {
    val id = col("doc_id")
    val url = concat(
      when(id % 2 === 0, lit("HTTP")).otherwise(lit("http")),
      lit("://Site"), (id % 13).cast("string"), lit(".com"),
      when(id % 4 === 0, lit(":80")).otherwise(lit("")),
      lit("/page/"), (id % 7).cast("string"),
      when(id % 3 === 0, lit("?utm_source=feed")).otherwise(lit("")),
      when(id % 5 === 0, lit("#sec")).otherwise(lit("")))
    docs(s, d).select(id, url.as("url"))
      .select(id,
        graft.functions.UrlOps.canonicalizeUrl(col("url")).as("url_canon"))
      .groupBy("url_canon")
      .agg(min("doc_id").as("keep_id"),
        count(lit(1)).cast("long").as("n_aliases"))
      .orderBy("url_canon")
  }

  /** The documents table wrapped as a linked page — the DISCOVERY
    * fixture ([[htmlAugmentedDocs]] discipline: every construction is
    * replayed in the oracle). Each doc lives at a deterministic clean
    * URL and carries nine links exercising every RFC 3986 reference
    * shape: an absolute link needing canonicalization (case, default
    * port, tracking param, fragment, `&amp;` entities), a relative
    * path, dot segments, a protocol-relative ref, a query-only ref, an
    * entity-bearing absolute path, a `mailto:` (scheme passthrough,
    * canonical NULL), a fragment-only ref (resolves to the page — the
    * seen-set must eat it) and a self link. Every fourth doc carries a
    * `<base href>` that redirects ALL relative resolution; a script
    * plants a fake link the raw-text rule must ignore.
    */
  private def linkPageDocs(s: SparkSession, d: String): DataFrame =
    linkPageColumns(docs(s, d))

  /** The [[linkPageDocs]] construction applied to ANY (doc_id, text)
    * frame — batch or stream (the columns are stateless, so the
    * streaming twin shares them verbatim).
    */
  private def linkPageColumns(docsDf: DataFrame): DataFrame = {
    val id = col("doc_id")
    val a = (id % 13).cast("string")
    val b = (id % 7).cast("string")
    val c = (id % 9).cast("string")
    val e = (id % 5).cast("string")
    val m = (id % 3).cast("string")
    val a1 = ((id + 1) % 13).cast("string")
    val c1 = ((id + 1) % 9).cast("string")
    val pageUrl = concat(lit("http://site"), a, lit(".com/dir"), b,
      lit("/page"), c, lit(".html"))
    val baseTag = when(id % 4 === 0,
      concat(lit("<base href=\"https://base"), m, lit(".org/bx/\">")))
      .otherwise(lit(""))
    val html = concat(
      lit("<html><head><title>Doc links</title>"), baseTag,
      lit("<script>var x = '<a href=\"/script-noise\">';</script>" +
        "</head><body>"),
      lit("<a href=\"HTTPS://Ext"), e,
      lit(".COM:443/x?b=2&amp;utm_source=x&amp;a=1#f\">abs</a>"),
      lit("<a href='sub/p"), c1, lit("'>rel</a>"),
      lit("<a href=\"../up/./q"), m, lit("\">dots</a>"),
      lit("<a href=\"//site"), a1, lit(".com/root\">proto</a>"),
      lit("<a href=\"?q="), (id % 4).cast("string"), lit("\">query</a>"),
      lit("<a href=\"/e?a=1&amp;b="), (id % 6).cast("string"),
      lit("\">esc</a>"),
      lit("<a href=\"mailto:u"), b, lit("@x.com\">mail</a>"),
      lit("<a href=\"#sec"), m, lit("\">frag</a>"),
      lit("<a href=\"page"), c, lit(".html\">self</a>"),
      lit("</body></html>"))
    docsDf.select(id, pageUrl.as("page_url"), html.as("html"))
  }

  /** LINK EXTRACTION + RESOLUTION (`text_html_links`,
    * [[graft.functions.HtmlLinks]] → [[graft.functions.UrlOps
    * .resolveUrl]] → [[graft.functions.UrlOps.canonicalizeUrl]]) —
    * the crawl's discovery step verified STRING EQUAL per link
    * position: raw hrefs out of the markup (entity decode, quoting
    * states, base-tag override, raw-text immunity), resolved per
    * RFC 3986 §5 strict, then keyed canonical. Map-only scan
    * projection until the final order; at 100 TB this is the fused
    * projection that feeds the frontier's seen-set anti-join.
    */
  val textHtmlLinks: Q = (s, d) => {
    linkPageDocs(s, d)
      .select(col("doc_id"),
        graft.functions.HtmlLinks.htmlLinks(col("html")).as("lk"),
        col("page_url"))
      .withColumn("eff_base",
        coalesce(graft.functions.UrlOps.resolveUrl(col("page_url"),
          col("lk.base")), col("page_url")))
      .select(col("doc_id"), col("eff_base"),
        posexplode(col("lk.links")).as(Seq("pos", "href")))
      .withColumn("resolved",
        graft.functions.UrlOps.resolveUrl(col("eff_base"), col("href")))
      .withColumn("url_canon",
        graft.functions.UrlOps.canonicalizeUrl(col("resolved")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("resolved"), col("url_canon"))
      .orderBy("doc_id", "pos")
  }

  /** The shared edge projection behind the anchor-text and link-graph
    * queries: every resolved, canonical http(s) link from the planted
    * pages with its anchor TEXT — one scanner pass per page
    * ([[graft.functions.HtmlExtract.anchors]] rides the block walk),
    * map-only until the consumer aggregates.
    */
  private def anchorEdges(s: SparkSession, d: String): DataFrame =
    linkPageDocs(s, d)
      .select(col("doc_id"), col("page_url"),
        graft.functions.HtmlLinks.htmlAnchors(col("html")).as("ank"))
      .withColumn("eff_base",
        coalesce(graft.functions.UrlOps.resolveUrl(col("page_url"),
          col("ank.base")), col("page_url")))
      .select(col("doc_id"), col("page_url"), col("eff_base"),
        explode(col("ank.anchors")).as("a"))
      .withColumn("url_canon", graft.functions.UrlOps.canonicalizeUrl(
        graft.functions.UrlOps.resolveUrl(col("eff_base"),
          col("a.href"))))
      .where(col("url_canon").isNotNull &&
        (col("url_canon").startsWith("http://") ||
         col("url_canon").startsWith("https://")))
      .select(col("doc_id"), col("page_url"),
        col("url_canon").as("target"), col("a.text").as("atext"))

  /** ANCHOR-TEXT AGGREGATION (`text_anchor_agg`) — how the WEB
    * describes each page, the classic retrieval/curation signal a
    * page's own text cannot provide: every href-carrying anchor's
    * decoded text ([[graft.functions.HtmlExtract.anchors]] — the SAME
    * scanner pass as block extraction), resolved and canonicalized to
    * its target, then aggregated per target across the corpus.
    * Map-only scan projection into ONE hash aggregation on the target
    * URL — at 100 TB this is the exact shape of a production
    * anchor-text corpus build (WAT-file scale), with the text set
    * bounded per target by distinctness.
    */
  val textAnchorAgg: Q = (s, d) =>
    anchorEdges(s, d)
      .groupBy(col("target"))
      .agg(count(lit(1)).as("n_refs"),
        countDistinct(col("doc_id")).as("n_pages"),
        array_join(sort_array(collect_set(col("atext"))), "|")
          .as("texts"))
      .orderBy("target")

  /** LINK-GRAPH CENTRALITY (`pipeline_pagerank`) — 3 power iterations
    * of PageRank over the canonical link graph, the frontier
    * prioritization signal (crawl the pages the web votes for first).
    * INTEGER-EXACT by contract so the oracle can replay it without
    * floating-point summation-order hazards: ranks live in nanos of
    * probability mass, `pr0 = 10^9 / N`, and each iteration computes
    * `pr' = (15·(10^9/N))/100 + (85·(Σ_{u→v} pr(u)/outdeg(u) +
    * dangling/N))/100` with FLOOR division at every step (`dangling` =
    * the rank mass sitting on nodes with no outlinks, redistributed
    * uniformly). Self-loops are dropped (a page voting for itself is
    * not a signal). Scale shape: nodes/edges are DOMAIN-cardinality
    * (bounded by the planted mod cycles, not the corpus), each
    * iteration is one shuffle join on the edge key + one aggregation —
    * the classic distributed PageRank step, no driver-side loops, the
    * dangling mass a 1-row broadcast.
    */
  /** The canonical link graph + its 3-iteration integer rank — shared
    * by [[pipelinePagerank]] (the rank table itself) and
    * [[pipelineCrawlPriority]] (OPIC scoring of the frontier). The
    * graph is a STANDING ARTIFACT, not a per-query rebuild: the edge
    * scan seeds a [[graft.operators.LinkGraph]] store (the
    * EpochStore versioned-batch convention) once per (session, dir)
    * and every consumer probes the stored edges — the honest 100 TB
    * shape (no production crawler re-walks every page's anchors per
    * consumer query; `pipeline_pagerank_incremental` proves the
    * maintained store ranks identically to this build). Memoized in
    * a BOUNDED LRU so a long-lived multi-tenant session cannot leak
    * one handle per corpus dir. Returns (edges(src, dst),
    * pr(node, pr, n)).
    */
  private val linkGraphCache =
    new graft.plans.BoundedCache[(SparkSession, String),
      (DataFrame, DataFrame)](maxEntries = 8)

  private def linkGraphRanks(s: SparkSession, d: String)
      : (DataFrame, DataFrame) =
    linkGraphCache.getOrElseUpdate((s, d))(linkGraphRanksBuild(s, d))

  private def linkGraphRanksBuild(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val ref = graft.operators.LinkGraph.seed(
      anchorEdges(s, d)
        .select(col("page_url").as("src"), col("target").as("dst"))
        .where(col("src") =!= col("dst")),
      Scratch.dir("graft_linkgraph"))
    // the stored parquet IS the materialization — consumers re-read
    // it partition-parallel; only the three-iteration rank needs a
    // shared checkpoint (its plan feeds the rank query, the OPIC
    // scorer, and any later consumer)
    val edges = graft.operators.LinkGraph.edges(s, ref)
    (edges, graft.plans.LazyCheckpoint.shared(
      graft.operators.LinkGraph.ranks(edges)))
  }

  /** The rank TABLE projection shared by the in-session build and
    * the incrementally maintained store: ranks joined with in/out
    * degree.
    */
  private def rankTableOf(edges: DataFrame, pr: DataFrame): DataFrame = {
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
    val indeg = edges.groupBy(col("dst")).agg(count(lit(1)).as("n_in"))
    pr.join(outdeg, pr("node") === outdeg("src"), "left")
      .join(indeg, pr("node") === indeg("dst"), "left")
      .select(col("node"), col("pr").cast("long").as("pr_nano"),
        coalesce(col("n_in"), lit(0L)).cast("long").as("n_in"),
        coalesce(col("outdeg"), lit(0L)).cast("long").as("n_out"))
      .orderBy("node")
  }

  val pipelinePagerank: Q = (s, d) => {
    val (edges, pr) = linkGraphRanks(s, d)
    rankTableOf(edges, pr)
  }

  /** INCREMENTALLY MAINTAINED LINK GRAPH
    * (`pipeline_pagerank_incremental`) — the standing-store lifecycle
    * proven end to end: seed a [[graft.operators.LinkGraph]] store
    * with the edges of two-thirds of the pages, land the remaining
    * pages' edges as discovery-wave batch 1, REDELIVER the same wave
    * (at-least-once → exactly-once: the batch directory overwrites
    * wholesale, and duplicate edge observations fold at read), then
    * rank over the STORED graph. The oracle is the SAME full-graph
    * replay as `pipeline_pagerank` — stored + maintained must rank
    * identically to the in-query rebuild, which is the equivalence
    * that makes the standing artifact trustworthy.
    */
  val pipelinePagerankIncremental: Q = (s, d) => {
    val all = anchorEdges(s, d)
      .select(col("doc_id"), col("page_url").as("src"),
        col("target").as("dst"))
      .where(col("src") =!= col("dst"))
    val ref = graft.operators.LinkGraph.seed(
      all.where(col("doc_id") % 3 =!= 2), Scratch.dir("graft_lg_inc"))
    val wave = all.where(col("doc_id") % 3 === 2)
    graft.operators.LinkGraph.ingest(wave, ref, batchId = 1L)
    // the redelivery: same wave, same batch id — idempotent
    graft.operators.LinkGraph.ingest(wave, ref, batchId = 1L)
    val edges = graft.operators.LinkGraph.edges(s, ref)
    rankTableOf(edges, graft.operators.LinkGraph.ranks(edges))
  }

  /** CRAWL PRIORITIZATION (`pipeline_crawl_priority`) — the discovery
    * tier composed END TO END: frontier candidates (link extraction →
    * canonical dedup → seen-set anti-join) gated by robots, then
    * SCORED by the rank mass their referrers forward (the OPIC rule:
    * priority(url) = Σ over referrers u of pr(u)/outdeg(u), in the
    * same integer nanos as [[pipelinePagerank]]) and capped at the
    * top 3 per domain — rank-ordered politeness, which is how a real
    * crawler actually spends its per-host budget. The per-domain
    * `Window` is partitioned by the politeness unit, so the top-k
    * never sorts more than one domain's candidates in one place.
    */
  val pipelineCrawlPriority: Q = (s, d) => {
    val (edges, pr) = linkGraphRanks(s, d)
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
    val contrib = pr.join(outdeg, pr("node") === outdeg("src"))
      .select(col("node"), col("pr"), col("outdeg"))
      .join(edges.as("e"), col("node") === col("e.src"))
      .select(col("e.dst").as("dst"), expr("pr div outdeg").as("share"))
      .groupBy(col("dst")).agg(sum(col("share")).as("priority"))
    val allowed = frontierCandidates(s, d)
      .join(broadcast(plantedFrontierRobots(s)), Seq("domain"))
      .where(graft.functions.RobotsOps.rulesAllowed(col("rules"),
        col("path")))
      .select(col("domain"), col("url"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(col("priority").desc, col("url").asc)
    allowed.join(contrib, allowed("url") === contrib("dst"), "left")
      .select(col("domain"), col("url"),
        coalesce(col("priority"), lit(0L)).cast("long").as("priority"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .orderBy("domain", "rk")
  }

  /** RECRAWL SCHEDULING (`pipeline_recrawl_schedule`) — the change-
    * rate estimator that decides which pages a crawler re-fetches
    * first: five planted fetch observations per URL (hourly waves,
    * content digests changing at a per-URL rate — every wave / every
    * other wave / once / never), change detection as a lag window
    * PARTITIONED BY URL, the interval estimate `Δ = span div
    * (n_changes + 1)` in integer seconds (never-changed pages take
    * the 86400 s max backoff), `next_due = last_fetch + Δ`, and the
    * due set at the reference time ranked per DOMAIN (staleness
    * desc) under a top-2 politeness budget — the window partitioned
    * by the politeness unit, like the priority query. Every number
    * integer, the whole schedule replayed closed-form by kind.
    */
  val pipelineRecrawlSchedule: Q = (s, d) => {
    val t0 = 1735689600L // 2025-01-01T00:00:00Z, fixed epoch seconds
    val obs = docs(s, d)
      .select(col("doc_id"), (col("doc_id") % 13).cast("string").as("a"),
        (col("doc_id") % 4).as("kind"))
      .withColumn("w", explode(sequence(lit(0), lit(4))))
      .select(col("doc_id"),
        concat(lit("site"), col("a"), lit(".com")).as("domain"),
        concat(lit("http://site"), col("a"), lit(".com/page/"),
          col("doc_id").cast("string")).as("url"),
        (lit(t0) + col("w").cast("long") * 3600L).as("ts"),
        when(col("kind") === 0, col("w"))
          .when(col("kind") === 1, expr("w div 2"))
          .when(col("kind") === 2, when(col("w") === 0, 0).otherwise(1))
          .otherwise(0).cast("long").as("digest"))
    val wUrl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url")).orderBy(col("ts"))
    val changed = obs
      .withColumn("prev", lag(col("digest"), 1).over(wUrl))
      .withColumn("chg",
        (col("prev").isNotNull && col("digest") =!= col("prev"))
          .cast("long"))
    val perUrl = changed.groupBy(col("domain"), col("url"))
      .agg(sum(col("chg")).as("n_changes"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .withColumn("interval_s",
        when(col("n_changes") === 0, lit(86400L))
          .otherwise(expr("(last_ts - first_ts) div (n_changes + 1)")))
      .withColumn("next_due", col("last_ts") + col("interval_s"))
    val ref = t0 + 6 * 3600L
    val wDom = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(col("staleness").desc, col("url").asc)
    perUrl.where(col("next_due") <= ref)
      .withColumn("staleness", (lit(ref) - col("next_due")).cast("long"))
      .withColumn("rk", row_number().over(wDom).cast("long"))
      .where(col("rk") <= 2)
      .select(col("domain"), col("url"),
        col("n_changes").cast("long").as("n_changes"),
        col("interval_s").cast("long").as("interval_s"),
        col("staleness"), col("rk"))
      .orderBy("domain", "rk")
  }

  /** CONDITIONAL-FETCH RECRAWL (`pipeline_recrawl_conditional`) — the
    * validator half of the fetch-budget arithmetic
    * ([[pipelineRecrawlSchedule]]'s missing signal): pages whose
    * server honors `ETag`/`If-None-Match` answer an unchanged recrawl
    * with a bodiless `304 Not Modified` — a ZERO-COST "content
    * unchanged" confirmation. The planted observation streams rotate
    * the same per-URL change rates as the schedule query (every wave
    * / every other / once / never), but EVEN docs' servers support
    * validators (unchanged waves arrive as 304s carrying the
    * confirmed ETag, no body) while ODD docs' do not (every wave is a
    * full 200 refetch). The estimator treats a 304 as an unchanged
    * observation — change detection compares each full body's digest
    * against the LAST FULL digest (`last_value IGNORE NULLS`, the
    * SQL-replayable form) so the interval estimate is IDENTICAL for
    * both server kinds; what differs is the budget: `bytes_fetched`
    * vs `bytes_saved` counts what conditional requests avoided
    * re-downloading. Windows partitioned by URL, one aggregation —
    * the schedule query's scale shape.
    */
  val pipelineRecrawlConditional: Q = (s, d) => {
    val t0 = 1735689600L // 2025-01-01T00:00:00Z
    val obs = docs(s, d)
      .select(col("doc_id"), (col("doc_id") % 13).cast("string").as("a"),
        (col("doc_id") % 4).as("kind"),
        (col("doc_id") % 2 === 0).as("cond"))
      .withColumn("w", explode(sequence(lit(0), lit(4))))
      .withColumn("dig",
        when(col("kind") === 0, col("w"))
          .when(col("kind") === 1, expr("w div 2"))
          .when(col("kind") === 2, when(col("w") === 0, 0).otherwise(1))
          .otherwise(0).cast("long"))
      .withColumn("prev_dig", when(col("w") > 0,
        when(col("kind") === 0, col("w") - 1)
          .when(col("kind") === 1, expr("(w - 1) div 2"))
          .when(col("kind") === 2,
            when(col("w") === 1, 0).otherwise(1))
          .otherwise(0).cast("long")))
      .withColumn("changed",
        col("w") === 0 || col("dig") =!= col("prev_dig"))
      .select(col("doc_id"),
        concat(lit("site"), col("a"), lit(".com")).as("domain"),
        concat(lit("http://site"), col("a"), lit(".com/page/"),
          col("doc_id").cast("string")).as("url"),
        (lit(t0) + col("w").cast("long") * 3600L).as("ts"),
        when(col("changed") || !col("cond"), lit(200))
          .otherwise(lit(304)).cast("int").as("status"),
        // a 304 carries NO body: digest only on full fetches
        when(col("changed") || !col("cond"), col("dig")).as("digest"),
        concat(lit("W/\""), col("dig").cast("string"), lit("\""))
          .as("etag"),
        (lit(100L) + col("doc_id") % 50).as("body_bytes"),
        col("cond"))
    val wUrl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url")).orderBy(col("ts"))
    val wPrev = wUrl.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val est = obs
      .withColumn("prev_full",
        last(col("digest"), ignoreNulls = true).over(wPrev))
      .withColumn("chg",
        (col("status") === 200 && col("prev_full").isNotNull &&
          col("digest") =!= col("prev_full")).cast("long"))
      .groupBy(col("domain"), col("url"), col("cond"))
      .agg(
        sum(when(col("status") === 200, 1L).otherwise(0L)).as("n_full"),
        sum(when(col("status") === 304, 1L).otherwise(0L))
          .as("n_not_modified"),
        sum(when(col("status") === 200, col("body_bytes"))
          .otherwise(0L)).as("bytes_fetched"),
        sum(when(col("status") === 304, col("body_bytes"))
          .otherwise(0L)).as("bytes_saved"),
        sum(col("chg")).as("n_changes"),
        // the validator the NEXT conditional request sends:
        // If-None-Match with the latest observation's ETag
        max_by(col("etag"), col("ts")).as("next_validator"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .withColumn("interval_s",
        when(col("n_changes") === 0, lit(86400L))
          .otherwise(expr("(last_ts - first_ts) div (n_changes + 1)")))
    est.select(col("domain"), col("url"), col("cond"),
        col("n_full").cast("long").as("n_full"),
        col("n_not_modified").cast("long").as("n_not_modified"),
        col("bytes_fetched").cast("long").as("bytes_fetched"),
        col("bytes_saved").cast("long").as("bytes_saved"),
        col("n_changes").cast("long").as("n_changes"),
        col("next_validator"),
        col("interval_s").cast("long").as("interval_s"))
      .orderBy("url")
  }

  /** Capture streams with WARC `revisit` records
    * ([[graft.sources.WarcCodec.encodeRevisit]]): five waves per URL
    * on the [[pipelineRecrawlSchedule]] change-rate rotation
    * (doc_id % 4 — every wave / every other / once / never), but as
    * the records a real crawler WRITES: a full `response` (with
    * WARC-Record-ID) when the content changed, a `revisit` referring
    * to the last full capture (WARC-Refers-To + its target URI + the
    * payload's md5 digest) when it did not — ~10-15% of a real
    * Common Crawl segment is revisits, and a funnel that filters
    * `warc_type = 'response'` silently loses them.
    */
  private def plantedRevisitRecords(s: SparkSession,
      d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("w", IntegerType),
      StructField("record", BinaryType)))
    docs(s, d).select(col("doc_id")).mapPartitions { rows =>
      import graft.sources.WarcCodec
      val md = java.security.MessageDigest.getInstance("MD5")
      def md5hex(s: String): String =
        md.digest(s.getBytes("US-ASCII"))
          .map(b => f"${b & 0xff}%02x").mkString
      rows.flatMap { r =>
        val id = r.getLong(0)
        val kind = (id % 4).toInt
        val url = s"http://site${id % 13}.com/page/$id"
        def digest(w: Int): Int = kind match {
          case 0 => w
          case 1 => w / 2
          case 2 => math.min(w, 1)
          case _ => 0
        }
        def content(w: Int): String = s"doc $id body rev ${digest(w)}"
        def rid(w: Int): String = s"urn:uuid:doc-$id-w$w"
        var lastFull = 0
        (0 to 4).map { w =>
          val date = s"2025-01-01T0$w:00:00Z"
          val changed = w == 0 || digest(w) != digest(w - 1)
          val rec =
            if (changed) {
              lastFull = w
              WarcCodec.encodeResponse(url, 200, "text/html",
                content(w).getBytes("US-ASCII"), date,
                recordId = rid(w))
            } else WarcCodec.encodeRevisit(url,
              refersTo = rid(lastFull), refersToUri = url,
              payloadDigest = "md5:" + md5hex(content(lastFull)),
              date = date)
          Row(id, w, rec)
        }
      }
    }(Encoders.row(schema)).toDF()
  }

  /** REVISIT RESOLUTION + VALIDATOR-AWARE RECRAWL
    * (`pipeline_revisit_resolve`) — the revisit channel consumed, not
    * dropped: parse the capture stream
    * ([[graft.functions.WarcParseExpr]], which now surfaces
    * record_id/warc_date/refers_to/refers_to_uri/payload_digest),
    * COLLAPSE every revisit onto its original capture (equi-join on
    * the referent record id; `n_resolved` counts only revisits whose
    * referent exists, names the same target URI, AND whose payload
    * digest matches the original body's md5 — provenance and
    * consistency, not just a join hit), and feed the change estimator
    * the full observation stream: responses contribute their own body
    * digest, revisits contribute the referent's digest VERBATIM — the
    * zero-cost "content unchanged" confirmation the estimator was
    * blind to (`pipeline_recrawl_schedule` sees only full fetches).
    * Same lag-window + integer interval contract as the schedule
    * query; every shuffle hashes on the URL. `resolved_ids` pins
    * WHICH captures the revisits collapsed onto.
    */
  val pipelineRevisitResolve: Q = (s, d) => {
    val w = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcParseExpr(
        org.apache.spark.sql.GraftBridge.expression(col("record"))))
    val parsed = plantedRevisitRecords(s, d)
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"),
        col("w.warc_type").as("wtype"),
        col("w.target_uri").as("url"),
        col("w.record_id").as("rid"),
        col("w.warc_date").cast("timestamp").cast("long").as("ts"),
        col("w.refers_to").as("ref_id"),
        col("w.refers_to_uri").as("ref_uri"),
        regexp_replace(col("w.payload_digest"), "^md5:", "")
          .as("pdig"),
        md5(col("w.body")).as("body_md5"))
    val resp = parsed.where(col("wtype") === "response")
    val rev = parsed.where(col("wtype") === "revisit")
    val revFacts = rev
      .join(resp.select(col("rid").as("ref_id"),
          col("url").as("orig_url"), col("body_md5").as("orig_md5")),
        Seq("ref_id"), "left")
      .groupBy(col("url"))
      .agg(count(lit(1)).as("n_revisits"),
        sum(when(col("orig_url") === col("ref_uri") &&
          col("orig_md5") === col("pdig"), 1L).otherwise(0L))
          .as("n_resolved"),
        array_join(sort_array(collect_set(
          when(col("orig_url").isNotNull, col("ref_id")))), "|")
          .as("resolved_ids"))
    // the estimator's observations: full fetches carry their body
    // digest, revisits their referent's — both land in one stream
    val obs = resp.select(col("url"), col("ts"),
        col("body_md5").as("dig"))
      .union(rev.select(col("url"), col("ts"), col("pdig").as("dig")))
    val wUrl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url")).orderBy(col("ts"))
    val est = obs
      .withColumn("prev", lag(col("dig"), 1).over(wUrl))
      .withColumn("chg",
        (col("prev").isNotNull && col("dig") =!= col("prev"))
          .cast("long"))
      .groupBy(col("url"))
      .agg(sum(col("chg")).as("n_changes"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .withColumn("interval_s",
        when(col("n_changes") === 0, lit(86400L))
          .otherwise(expr("(last_ts - first_ts) div (n_changes + 1)")))
    val nResp = resp.groupBy(col("url"))
      .agg(count(lit(1)).as("n_resp"))
    nResp.join(revFacts, Seq("url"), "left").join(est, Seq("url"))
      .select(
        regexp_extract(col("url"), "^http://([^/]+)/", 1).as("domain"),
        col("url"),
        col("n_resp").cast("long").as("n_resp"),
        coalesce(col("n_revisits"), lit(0L)).cast("long")
          .as("n_revisits"),
        coalesce(col("n_resolved"), lit(0L)).cast("long")
          .as("n_resolved"),
        coalesce(col("resolved_ids"), lit("")).as("resolved_ids"),
        col("n_changes").cast("long").as("n_changes"),
        col("interval_s").cast("long").as("interval_s"))
      .orderBy("url")
  }

  /** Per-domain policy files for the frontier: rules AND directives
    * parse once on the domain side (the [[plantedCrawlRobots]]
    * production shape, extended with `Crawl-delay`). site domains
    * alternate blocking `/up` (even, fractional delay) and `/root`
    * (odd, integer delay); ext domains have a NAMED graftbot group
    * (shadows `*`, no delay → NULL); base domains block `/e` with a
    * sub-second delay.
    */
  private def plantedFrontierRobots(s: SparkSession): DataFrame = {
    import s.implicits._
    val rows =
      (0 until 13).map { n =>
        val delay = s"${1 + n % 3}" + (if (n % 2 == 0) ".5" else "")
        val block = if (n % 2 == 0) "/up" else "/root"
        (s"site$n.com",
          s"Sitemap: http://site$n.com/sitemap.xml\n" +
            s"User-agent: *\nDisallow: $block\nCrawl-delay: $delay\n")
      } ++
      (0 until 5).map { e =>
        (s"ext$e.com",
          "User-agent: graftbot\nDisallow: /y\n" +
            "User-agent: *\nDisallow: /x\nCrawl-delay: 7\n")
      } ++
      (0 until 3).map { m =>
        (s"base$m.org",
          "User-agent: *\nDisallow: /e\nCrawl-delay: 0.5\n")
      }
    rows.toDF("domain", "robots_txt")
      .select(col("domain"),
        graft.functions.RobotsOps.robotsRules(col("robots_txt"),
          "GraftBot").as("rules"),
        graft.functions.RobotsOps.robotsDirectives(col("robots_txt"),
          "GraftBot").as("dir"))
      .select(col("domain"), col("rules"),
        col("dir.crawl_delay").as("crawl_delay"),
        col("dir.sitemaps").as("sitemaps"))
  }

  /** The frontier candidate set: pages → links → resolve →
    * canonicalize → http(s) only → distinct → anti-join the seen set
    * (the pages' own canonical URLs) → registrable domain + path.
    * Shared by `pipeline_crawl_frontier` and
    * `pipeline_polite_schedule`.
    */
  /** The STATELESS extraction half of the frontier — per page row:
    * links out of the markup, resolved against the effective base,
    * canonical, http(s) only. Shared verbatim by the batch frontier
    * and its streaming twin (no state, so the stream must equal the
    * batch replay under any micro-batch split).
    */
  private def frontierLinksStage(pages: DataFrame): DataFrame =
    pages
      .select(col("page_url"),
        graft.functions.HtmlLinks.htmlLinks(col("html")).as("lk"))
      .withColumn("eff_base",
        coalesce(graft.functions.UrlOps.resolveUrl(col("page_url"),
          col("lk.base")), col("page_url")))
      .select(explode(col("lk.links")).as("href"), col("eff_base"))
      .select(graft.functions.UrlOps.canonicalizeUrl(
        graft.functions.UrlOps.resolveUrl(col("eff_base"), col("href")))
        .as("url"))
      .where(col("url").isNotNull &&
        (col("url").startsWith("http://") ||
          col("url").startsWith("https://")))

  private def withDomainPath(df: DataFrame): DataFrame =
    df.withColumn("domain", graft.functions.UrlOps.registrableDomain(
        graft.functions.UrlOps.urlHost(col("url"))))
      .withColumn("path",
        regexp_extract(col("url"), "^[a-z]+://[^/]+(/[^?#]*)", 1))

  /** One wave's candidate set is COMPUTED ONCE per (session, table)
    * and shared by every consumer query — the frontier gate, the
    * politeness schedule and the discovery union all read the same
    * wave, so the HTML link scan + resolution must not re-run per
    * consumer (a production frontier persists the wave table; the
    * in-session analog is a memoized lazy checkpoint, materialized by
    * whichever consumer runs first and reused as checkpoint blocks by
    * the rest).
    */
  private val frontierWaveCache =
    new graft.plans.BoundedCache[(SparkSession, String),
      DataFrame](maxEntries = 8)

  private def frontierCandidates(s: SparkSession, d: String): DataFrame =
    frontierWaveCache.getOrElseUpdate((s, d))({
      val pages = linkPageDocs(s, d)
      val seen = pages
        .select(graft.functions.UrlOps.canonicalizeUrl(col("page_url"))
          .as("url")).distinct()
      graft.plans.LazyCheckpoint.shared(withDomainPath(
        frontierLinksStage(pages)
          .distinct()
          .join(seen, Seq("url"), "left_anti")))
    })

  /** CRAWL FRONTIER EXPANSION (`pipeline_crawl_frontier`) — the
    * discovery loop's one iteration, composed end-to-end: fetched
    * pages → [[linkPageDocs]] markup → link extraction → RFC 3986
    * resolution → canonical keys → scheme filter → dedup → seen-set
    * anti-join → per-domain robots gate, emitting the next wave's
    * fetch list. Shape at 100 TB: everything up to `distinct` is a
    * map-only scan projection; the dedup + anti-join shuffle hashes on
    * the canonical URL (the natural balanced key); the policy join is
    * a 21-row broadcast. The oracle replays every planted link's fate
    * — resolved form, dedup, seen-set hit, robots verdict — by
    * construction.
    */
  val pipelineCrawlFrontier: Q = (s, d) => {
    frontierCandidates(s, d)
      .join(broadcast(plantedFrontierRobots(s)), Seq("domain"))
      .where(graft.functions.RobotsOps.rulesAllowed(col("rules"),
        col("path")))
      .select(col("domain"), col("url"))
      .orderBy("url")
  }

  /** STREAMING FRONTIER (`pipeline_frontier_stream`) — discovery as a
    * CONTINUOUS query: pages arrive as a stream, the stateless
    * extraction half ([[frontierLinksStage]], shared verbatim with
    * the batch query) runs per micro-batch, the seen set is a
    * stream-STATIC anti-join, the policy gate a broadcast join, and
    * the frontier accumulates in a complete-mode (domain, url)
    * aggregation — dedup IS the aggregation state, keyed on the
    * canonical URL. Shares `pipeline_crawl_frontier`'s oracle
    * VERBATIM: every stage before the aggregate is stateless, so the
    * accumulated table must equal the batch replay under any
    * micro-batch split.
    */
  val pipelineFrontierStream: Q = (s, d) => {
    val schema = docs(s, d).schema
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
    val seen = linkPageDocs(s, d)
      .select(graft.functions.UrlOps.canonicalizeUrl(col("page_url"))
        .as("url")).distinct()
    val gated = withDomainPath(
      frontierLinksStage(linkPageColumns(stream))
        .join(seen, Seq("url"), "left_anti"))
      .join(broadcast(plantedFrontierRobots(s)), Seq("domain"))
      .where(graft.functions.RobotsOps.rulesAllowed(col("rules"),
        col("path")))
    s.catalog.dropTempView("graft_frontier_stream")
    val q = gated.groupBy(col("domain"), col("url"))
      .agg(count(lit(1)).as("n_refs"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("graft_frontier_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    BenchProbe.addStreamData("pipeline_frontier_stream", q)
    s.table("graft_frontier_stream")
      .select(col("domain"), col("url")).orderBy("url")
  }

  /** One micro-batch of [[pipelineFrontierStore]] — factored out so
    * the retry-idempotence contract is directly testable
    * ([[graft.streaming.StreamingDedup.nearDupIngestBatch]]
    * discipline): the batch's candidates gate through robots, then
    * anti-join against the SEEN state — the epoch's frozen base (the
    * wave's fetched pages) plus every frontier batch committed BEFORE
    * this id. Excluding this id's own directory is what makes a
    * foreachBatch RETRY rewrite its output wholesale instead of
    * re-filtering itself to empty; the wholesale overwrite
    * ([[graft.streaming.EpochStore.writeBatch]]) makes the rewrite
    * idempotent.
    */
  private[graft] def frontierStoreIngestBatch(s: SparkSession,
      ref: graft.streaming.EpochStore.Ref, pagesBatch: DataFrame,
      batchId: Long): Unit = {
    import graft.streaming.EpochStore
    val cands = withDomainPath(frontierLinksStage(pagesBatch).distinct())
      .join(broadcast(plantedFrontierRobots(s)), Seq("domain"))
      .where(graft.functions.RobotsOps.rulesAllowed(col("rules"),
        col("path")))
      .select(col("domain"), col("url"))
    val priorBatches = EpochStore.committedBatches(ref, "frontier")
      .filter(b => b > 0 && b < batchId + 1)
    val seen = priorBatches
      .map(b => EpochStore.readBatch(s, ref, "frontier", b)
        .select(col("url")))
      .foldLeft(EpochStore.readBase(s, ref, "seen").select(col("url")))(
        _.unionByName(_))
    EpochStore.writeBatch(cands.join(seen, Seq("url"), "left_anti"),
      ref, "frontier", batchId + 1)
  }

  /** UPDATE-MODE FRONTIER SINK (`pipeline_frontier_store`) — the
    * PRODUCTION shape of [[pipelineFrontierStream]]: the complete-mode
    * memory sink is fine for verification, but a real frontier writes
    * each micro-batch's NEW urls into an idempotent per-batch store
    * (`foreachBatch` → [[graft.streaming.EpochStore]], the streaming
    * dedup stores' lifecycle layer) with the seen set as maintained
    * state — in-memory state ZERO, on-disk state bounded by the WAVE
    * (the emitted frontier + the wave's fetched pages), not the
    * corpus, and every batch directory a provenance ledger entry. The
    * accumulated store must equal the batch replay under ANY
    * micro-batch split (a url two batches both discover is emitted by
    * the first only) — it shares `pipeline_crawl_frontier`'s oracle
    * family verbatim.
    */
  val pipelineFrontierStore: Q = (s, d) => {
    import graft.streaming.EpochStore
    val storeDir = Scratch.dir("graft_frontier_store")
    // seed: epoch 0's frozen base = the wave's own fetched-page urls
    // (the batch query's seen set), plus an empty frontier ledger
    val ref = EpochStore.claimNext(storeDir)
    EpochStore.writeBatch(
      linkPageDocs(s, d).select(graft.functions.UrlOps
        .canonicalizeUrl(col("page_url")).as("url")).distinct(),
      ref, "seen", 0L)
    EpochStore.writeBatch(
      s.createDataFrame(new java.util.ArrayList[Row](), StructType(Seq(
        StructField("domain", StringType), StructField("url", StringType)))),
      ref, "frontier", 0L)
    EpochStore.commit(ref)
    // the wave arrives as files — several micro-batches per run
    val feedDir = Scratch.dir("graft_frontier_feed")
    docs(s, d).repartition(4, col("doc_id"))
      .write.mode("overwrite").parquet(feedDir)
    val schema = docs(s, d).schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
    val q = linkPageColumns(stream).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        frontierStoreIngestBatch(s, ref, batch, batchId)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    BenchProbe.addStreamData("pipeline_frontier_store", q)
    EpochStore.readAll(s, ref, "frontier")
      .select(col("domain"), col("url")).orderBy("url")
  }

  /** POLITENESS SCHEDULING (`pipeline_polite_schedule`) — the frontier
    * turned into a per-host fetch plan: each allowed URL gets its
    * domain's `Crawl-delay` (NULL → the 1 s default a polite crawler
    * assumes) and a slot = rank within its domain, so the scheduled
    * offset is `(slot-1) × delay` seconds. The rank window partitions
    * by DOMAIN — the politeness unit IS the parallel unit, millions of
    * domains at 100 TB, so no global ordering exists anywhere.
    */
  val pipelinePoliteSchedule: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    frontierCandidates(s, d)
      .join(broadcast(plantedFrontierRobots(s)), Seq("domain"))
      .where(graft.functions.RobotsOps.rulesAllowed(col("rules"),
        col("path")))
      .withColumn("delay_s", coalesce(col("crawl_delay"), lit(1.0)))
      .withColumn("slot", row_number().over(
        Window.partitionBy(col("domain")).orderBy(col("url")))
        .cast("long"))
      .withColumn("offset_s", (col("slot") - 1).cast("double") *
        col("delay_s"))
      .select(col("domain"), col("url"), col("slot"), col("delay_s"),
        col("offset_s"))
      .orderBy("domain", "slot")
  }

  /** The planted per-site sitemap files, one per site domain: a
    * two-entry urlset whose first loc (`/root`) OVERLAPS the link
    * channel (and is robots-blocked on odd sites, gating both
    * channels identically) and whose second (`/sm/p{n%4}`) only the
    * sitemap channel can discover.
    */
  private def plantedSitemapBodies(s: SparkSession): DataFrame = {
    import s.implicits._
    def urlset(locs: Seq[String]): String =
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/" +
        "0.9\">\n" +
        locs.map(l => s"<url><loc>$l</loc></url>").mkString("\n") +
        "\n</urlset>"
    // every 3rd site nests: the robots-named sitemap is a
    // SITEMAPINDEX whose children carry the site's URL inventory
    // (one child adds a CHILD-ONLY /deep page — the recursion's
    // observable); the rest are flat urlsets
    (0 until 13).flatMap { n =>
      val root = s"http://site$n.com"
      if (n % 3 == 0) Seq(
        (s"$root/sitemap.xml",
          "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/" +
            "sitemap/0.9\">" +
            s"<sitemap><loc>$root/sm_a.xml</loc></sitemap>" +
            s"<sitemap><loc>$root/sm_b.xml</loc></sitemap>" +
            "</sitemapindex>"),
        (s"$root/sm_a.xml", urlset(Seq(s"$root/root"))),
        (s"$root/sm_b.xml",
          urlset(Seq(s"$root/sm/p${n % 4}", s"$root/deep/d$n"))))
      else Seq(
        (s"$root/sitemap.xml", urlset(Seq(s"$root/root",
          s"$root/sm/p${n % 4}"))))
    }.toDF("sm_url", "xml")
  }

  /** COMPOSED DISCOVERY (`pipeline_discovery_e2e`) — every channel a
    * crawler learns new URLs from, in ONE declarative plan: (a) the
    * LINK channel, [[frontierCandidates]]'s extract → resolve →
    * canonicalize → seen-set path; (b) the SITEMAP channel, robots
    * `Sitemap:` directives → the site's sitemap body → entry
    * inventory. Both funnel through the SAME per-domain robots gate,
    * union, and collapse per canonical URL with channel provenance —
    * a URL both channels surface carries `links|sitemap`. Shape at
    * 100 TB: the sitemap side is domain-cardinality (tiny, broadcast
    * everywhere); the link side is the corpus-sized scan; the only
    * shuffles hash on the canonical URL.
    */
  val pipelineDiscoveryE2e: Q = (s, d) => {
    val robots = plantedFrontierRobots(s)
    val bodies = plantedSitemapBodies(s)
    val parsed0 = robots
      .select(col("domain"), explode(col("sitemaps")).as("sm_url"))
      .join(bodies, Seq("sm_url"))
      .select(graft.functions.SitemapParse.parseSitemap(col("xml"))
        .as("sm"))
    // SITEMAP-INDEX RECURSION, bounded to ONE level (the kind column
    // is exactly for this — [[graft.functions.SitemapParse]]): index
    // entries name further sitemap FILES, so their locs join back to
    // the bodies table and their urlset entries flow in; a nested
    // index at depth 2 contributes nothing (bounded-depth politeness,
    // same discipline as the 3-hop redirect walk). Both joins are
    // domain-cardinality — tiny next to the link channel's scan.
    val childEntries = parsed0.where(col("sm.kind") === "sitemapindex")
      .select(explode(col("sm.entries")).as("pe"))
      .select(col("pe.loc").as("sm_url"))
      .join(bodies, Seq("sm_url"))
      .select(graft.functions.SitemapParse.parseSitemap(col("xml"))
        .as("sm"))
      .where(col("sm.kind") === "urlset")
      .select(explode(col("sm.entries")).as("e"))
    val smEntries = parsed0.where(col("sm.kind") === "urlset")
      .select(explode(col("sm.entries")).as("e"))
      .unionByName(childEntries)
      .select(graft.functions.UrlOps.canonicalizeUrl(col("e.loc"))
        .as("url"))
      .withColumn("domain", graft.functions.UrlOps.registrableDomain(
        graft.functions.UrlOps.urlHost(col("url"))))
      .withColumn("path",
        regexp_extract(col("url"), "^[a-z]+://[^/]+(/[^?#]*)", 1))
      .withColumn("channel", lit("sitemap"))
    val links = frontierCandidates(s, d)
      .withColumn("channel", lit("links"))
    links.unionByName(smEntries)
      .join(broadcast(robots.select("domain", "rules")), Seq("domain"))
      .where(graft.functions.RobotsOps.rulesAllowed(col("rules"),
        col("path")))
      .groupBy(col("domain"), col("url"))
      .agg(array_join(array_sort(collect_set(col("channel"))), "|")
        .as("channels"))
      .orderBy("url")
  }

  /** Per doc one REDIRECT CHAIN of WARC records: `doc_id % 3` hops of
    * 301s with RELATIVE Location values (`h+1`, resolved against each
    * hop's own URI — the RFC 9110 shape real servers emit), then the
    * final 200 HTML page, which for even docs carries a
    * `<link rel=canonical>` ALIAS (site-absolute) and for every 5th
    * doc a `<meta name=robots content=noindex>`.
    */
  private def plantedRedirectRecords(s: SparkSession,
      d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("hop", IntegerType),
      StructField("record", BinaryType)))
    docs(s, d).select(col("doc_id")).mapPartitions { rows =>
      import graft.sources.WarcCodec
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      rows.flatMap { r =>
        val id = r.getLong(0)
        val n = id % 13
        val hops = (id % 3).toInt
        def uri(h: Int) = s"http://site$n.com/c$id/$h"
        // hop 0 of every 4th chain is a META-REFRESH interstitial
        // (the third redirect mechanism): id%4==1 fast (collapses,
        // quoting/case rotating), id%4==3 slow (30 s — an
        // auto-reloading page, NOT a redirect; the chain stalls)
        val redirects = (0 until hops).map { h =>
          val fast = id % 4 == 1 && h == 0
          val slow = id % 4 == 3 && h == 0
          if (fast || slow) {
            val content =
              if (slow) "30; url=1"
              else if ((id / 4) % 2 == 0) "0; url=1"
              else "3;URL='1'"
            val html = "<html><head><meta http-equiv=refresh " +
              s"""content="$content"></head>""" +
              "<body>interstitial</body></html>"
            Row(id, h, WarcCodec.encodeResponse(uri(h), 200,
              "text/html", html.getBytes(utf8)))
          } else
            Row(id, h, WarcCodec.encodeResponse(uri(h), 301, "text/html",
              Array.emptyByteArray, location = (h + 1).toString))
        }
        val canonical = if (id % 2 == 0)
          s"<link rel=canonical href=/canon/$id>" else ""
        val robotsMeta = if (id % 5 == 0)
          "<meta name=robots content='noindex, nofollow'>" else ""
        val html = s"<html><head>$canonical$robotsMeta</head>" +
          s"<body><h1>Doc $id</h1></body></html>"
        redirects :+ Row(id, hops, WarcCodec.encodeResponse(uri(hops),
          200, "text/html", html.getBytes(utf8)))
      }
    }(Encoders.row(schema)).toDF()
  }

  /** REDIRECT + CANONICAL-ALIAS RESOLUTION (`pipeline_redirect_resolve`)
    * — the discovery channel that collapses every fetched URL to the
    * identity the corpus should carry: HTTP 3xx `Location` values
    * (surfaced by [[graft.functions.WarcParseExpr]], RESOLVED against
    * the hop's own URI via [[graft.functions.UrlOps.resolveUrl]] —
    * real servers emit relative Locations) collapse as a BOUNDED-HOP
    * chain walk (three iterated equi-joins on the canonical URL — at
    * 100 TB each iteration is one shuffle on a high-cardinality key,
    * never a driver loop; unresolved-after-3 keeps its last hop, the
    * loop-safety bound), then the landing page's
    * `<link rel=canonical>` ([[graft.functions.HtmlPageMetaExpr]])
    * applies as the final alias, and `<meta name=robots noindex>`
    * drops the page from the funnel (`kept`). Output per chain START:
    * the final URL, hop count, channel provenance
    * (canonical/redirect/fetch) and the noindex verdict — the oracle
    * replays every chain by construction.
    */
  val pipelineRedirectResolve: Q = (s, d) => {
    val w = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcParseExpr(
        org.apache.spark.sql.GraftBridge.expression(col("record"))))
    def pageMeta(html: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftBridge.column(
        graft.functions.HtmlPageMetaExpr(
          org.apache.spark.sql.GraftBridge.expression(html)))
    val parsed = graft.plans.LazyCheckpoint.shared(
      plantedRedirectRecords(s, d)
        .select(col("doc_id"), col("hop"), w.as("w"))
        .select(col("doc_id"), col("hop"),
          graft.functions.UrlOps.canonicalizeUrl(col("w.target_uri"))
            .as("url"),
          col("w.status").as("status"),
          col("w.location").as("location"),
          col("w.body").as("body"),
          col("w.target_uri").as("uri")))
    // landing PAGES: canonical alias + noindex + declarative refresh
    // from one scanner pass; a refresh with a small delay (≤ 5 s, the
    // crawler convention) is a redirect EDGE, a long one is an
    // auto-reloading page and contributes nothing
    val pages = parsed.where(col("status") === 200)
      .select(col("url"),
        pageMeta(TextOps.decodeCharset(col("body"),
          lit("text/html; charset=utf-8")).getField("text")).as("m"),
        col("uri"))
      .select(col("url"),
        when(col("m.canonical").isNotNull,
          graft.functions.UrlOps.canonicalizeUrl(
            graft.functions.UrlOps.resolveUrl(col("uri"),
              col("m.canonical")))).as("canonical"),
        col("m.noindex").as("noindex"),
        when(col("m.refresh_url").isNotNull &&
            col("m.refresh_secs") <= 5,
          graft.functions.UrlOps.canonicalizeUrl(
            graft.functions.UrlOps.resolveUrl(col("uri"),
              col("m.refresh_url")))).as("refresh_dst"))
    // redirect EDGES: 3xx Locations and fast meta-refreshes, both
    // resolved against the hop's own URI (relative values are the
    // common real-world shape); provenance rides each edge
    val edges = parsed
      .where(col("status").between(300, 399) && col("location").isNotNull)
      .select(col("url").as("src"),
        graft.functions.UrlOps.canonicalizeUrl(
          graft.functions.UrlOps.resolveUrl(col("uri"), col("location")))
          .as("dst"),
        lit(0L).as("via_refresh"))
      .union(pages.where(col("refresh_dst").isNotNull)
        .select(col("url").as("src"), col("refresh_dst").as("dst"),
          lit(1L).as("via_refresh")))
    // bounded-hop collapse: 3 iterated left equi-joins on the URL —
    // the politeness bound on redirect loops; a chain longer than the
    // bound keeps its last reached hop (honest partial resolution)
    var cur = parsed.where(col("hop") === 0)
      .select(col("doc_id"), col("url").as("start_url"),
        col("url").as("cur"), lit(0L).as("n_hops"),
        lit(0L).as("n_refresh_hops"))
    (1 to 3).foreach { _ =>
      cur = cur.join(edges, cur("cur") === edges("src"), "left")
        .select(col("doc_id"), col("start_url"),
          coalesce(col("dst"), col("cur")).as("cur"),
          (col("n_hops") + when(col("dst").isNotNull, 1L)
            .otherwise(0L)).as("n_hops"),
          (col("n_refresh_hops") +
            when(col("dst").isNotNull, col("via_refresh"))
              .otherwise(0L)).as("n_refresh_hops"))
    }
    cur.join(pages, cur("cur") === pages("url"), "left")
      .select(col("doc_id"), col("start_url"),
        coalesce(col("canonical"), col("cur")).as("final_url"),
        col("n_hops"), col("n_refresh_hops"),
        when(col("canonical").isNotNull, lit("canonical"))
          .when(col("n_hops") > 0, lit("redirect"))
          .otherwise(lit("fetch")).as("channel"),
        coalesce(col("noindex"), lit(false)).as("noindex"),
        (!coalesce(col("noindex"), lit(false))).as("kept"))
      .orderBy("doc_id")
  }

  /** The documents table as per-site robots files with non-rule
    * directives: a document-leading `Sitemap:`, then one of three
    * group shapes — no named group (`*` carries delay 9, plus a
    * trailing extra sitemap), a named graftbot group WITH a delay
    * (shadows the `*` delay), a named group WITHOUT one (delay must be
    * NULL even though `*` has 9). Even docs add an unparseable delay
    * to the `*` group (lenient-line rule: ignored as if absent).
    */
  private def robotsDirectiveDocs(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val lead = concat(lit("Sitemap: http://site"), (id % 13).cast("string"),
      lit(".com/map"), (id % 3).cast("string"), lit(".xml\n"))
    val body = when(id % 3 === 0, concat(
        lit("User-agent: *\nCrawl-delay: 9\n"),
        when(id % 2 === 0, lit("Crawl-delay: bogus\n")).otherwise(lit("")),
        lit("Disallow: /a\nSitemap: http://site"),
        (id % 13).cast("string"), lit(".com/extra.xml\n")))
      .when(id % 3 === 1, concat(
        lit("User-agent: graftbot\nCrawl-delay: "),
        (id % 5).cast("string"),
        lit(".5\nDisallow: /b\nUser-agent: *\nCrawl-delay: 9\n")))
      .otherwise(lit(
        "User-agent: graftbot\nDisallow: /c\n" +
          "User-agent: *\nCrawl-delay: 9\n"))
    docs(s, d).select(id, concat(lead, body).as("robots_txt"))
  }

  /** ROBOTS DIRECTIVES (`text_robots_directives`,
    * [[graft.functions.RobotsOps.robotsDirectives]]) — `Crawl-delay`
    * group selection (named shadows `*`, absent-in-named is NULL,
    * invalid values lenient-ignored) and document-wide `Sitemap`
    * collection, verified value-equal per doc. Scan projection, one
    * parse per POLICY row — the domains side of the frontier join.
    */
  val textRobotsDirectives: Q = (s, d) => {
    robotsDirectiveDocs(s, d)
      .select(col("doc_id"),
        graft.functions.RobotsOps.robotsDirectives(col("robots_txt"),
          "GraftBot").as("dir"))
      .select(col("doc_id"),
        col("dir.crawl_delay").as("crawl_delay"),
        size(col("dir.sitemaps")).cast("long").as("n_sitemaps"),
        array_join(col("dir.sitemaps"), "|").as("sitemaps"))
      .orderBy("doc_id")
  }

  /** The documents table as sitemap XML — four planted kinds, most
    * specific first: malformed root (every 11th), out-of-range
    * priority (every 7th), a namespaced `sitemapindex` (every 5th),
    * else a two-entry `urlset` with an entity-bearing loc, a lastmod
    * on the first entry and a priority on the second.
    */
  private def sitemapDocs(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val n = (id % 13).cast("string")
    val urlset = concat(
      lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<urlset " +
        "xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
        "<url><loc>http://site"), n, lit(".com/p0?x=1&amp;y="),
      (id % 4).cast("string"),
      lit("</loc><lastmod>2026-01-15</lastmod>" +
        "<changefreq>daily</changefreq></url>\n" +
        "<url><loc>http://site"), n, lit(".com/p1</loc>" +
        "<priority>0."), (id % 9).cast("string"),
      lit("</priority></url>\n</urlset>"))
    val index = concat(
      lit("<sm:sitemapindex xmlns:sm=\"http://www.sitemaps.org/" +
        "schemas/sitemap/0.9\"><sm:sitemap><sm:loc>http://site"), n,
      lit(".com/s0.xml</sm:loc><sm:lastmod>2026-02-01</sm:lastmod>" +
        "</sm:sitemap><sm:sitemap><sm:loc>http://site"), n,
      lit(".com/s1.xml</sm:loc></sm:sitemap></sm:sitemapindex>"))
    val badPrio = concat(
      lit("<urlset><url><loc>http://site"), n,
      lit(".com/bad</loc><priority>1.5</priority></url></urlset>"))
    val xml = when(id % 11 === 0,
        lit("<urlst><url><loc>x</loc></url></urlst>"))
      .when(id % 7 === 0, badPrio)
      .when(id % 5 === 0, index)
      .otherwise(urlset)
    docs(s, d).select(id, xml.as("xml"))
  }

  /** SITEMAP PARSING (`text_sitemap_parse`,
    * [[graft.functions.SitemapParse]]) — the frontier's third
    * discovery channel: per doc either the exploded entry rows (kind,
    * position, loc with entities decoded, lastmod, priority) or one
    * named-rejection row. Scan projection + explode, no shuffle before
    * the verification order.
    */
  val textSitemapParse: Q = (s, d) => {
    val parsed = sitemapDocs(s, d)
      .select(col("doc_id"),
        graft.functions.SitemapParse.parseSitemap(col("xml")).as("sm"))
    val ok = parsed.where(col("sm.err").isNull)
      .select(col("doc_id"), col("sm.kind").as("kind"),
        lit(null).cast("string").as("err"),
        posexplode(col("sm.entries")).as(Seq("pos", "entry")))
      .select(col("doc_id"), col("kind"), col("err"),
        col("pos").cast("long").as("pos"),
        col("entry.loc").as("loc"), col("entry.lastmod").as("lastmod"),
        col("entry.priority").as("priority"))
    val bad = parsed.where(col("sm.err").isNotNull)
      .select(col("doc_id"), lit(null).cast("string").as("kind"),
        col("sm.err").as("err"), lit(0L).as("pos"),
        lit(null).cast("string").as("loc"),
        lit(null).cast("string").as("lastmod"),
        lit(null).cast("double").as("priority"))
    ok.unionByName(bad).orderBy("doc_id", "pos")
  }

  /** ONE WARC response record for the composed ingest fixtures —
    * shared VERBATIM by the batch e2e and both streaming twins so the
    * rotation cannot drift between them. Every kind is a `text/html`
    * response whose TARGET URI needs canonicalization (uppercase
    * scheme/host, default port, tracking param, fragment) and whose
    * path lands in the planted robots-policy space; the body rotates
    * utf-8, windows-1252 (transport-labeled, with a planted `€` the
    * decode must not mangle), BOM'd UTF-16LE, a Shift_JIS-labeled
    * Japanese page (encoded through the JDK's own windows-31j — the
    * independent mirror of the artifact decode path, the fixture-
    * encoder discipline) that the funnel now DECODES via the pinned
    * [[graft.functions.EncodingStore]] snapshot, and a KOI8-R-labeled
    * record that stays the honest unsupported-label rejection.
    */
  private[graft] def crawlE2eRecord(id: Long, text: String): Array[Byte] = {
    import graft.sources.WarcCodec
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val utf16le = java.nio.charset.StandardCharsets.UTF_16LE
    val uri = s"HTTP://WWW.Site${id % 13}.com:80/A/b${id % 9}" +
      "?z=2&utm_source=x&a=1#Frag"
    def html(h1Extra: String): String =
      s"<html><head><title>Doc $id</title></head>" +
        s"<body><h1>Doc $id$h1Extra</h1><div>$text</div>" +
        "<footer><a href=\"/tos\">Terms</a> " +
        "<a href=\"/p\">Privacy</a></footer></body></html>"
    (id % 5).toInt match {
      case 0 => WarcCodec.encodeResponse(uri, 200, "text/html",
        html("").getBytes(utf8))
      case 1 => WarcCodec.encodeResponse(uri, 200,
        "text/html; charset=iso-8859-1", w1252Bytes(html(" €")))
      case 2 => WarcCodec.encodeResponse(uri, 200, "text/html",
        Array(0xFF, 0xFE).map(_.toByte) ++
          html("").getBytes(utf16le))
      case 3 => WarcCodec.encodeResponse(uri, 200,
        "text/html; charset=Shift_JIS",
        html(" \u65E5\u672C\u8A9E").getBytes("windows-31j"))
      case _ => WarcCodec.encodeResponse(uri, 200,
        "text/html; charset=koi8-r", text.getBytes("US-ASCII"))
    }
  }

  /** The [[crawlE2eRecord]] rotation over the documents table. */
  private def plantedCrawlE2eRecords(s: SparkSession,
      d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("record", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), crawlE2eRecord(r.getLong(0),
        r.getString(1))))
    }(Encoders.row(schema)).toDF()
  }

  /** THE COMPOSED INGEST QUERY (`pipeline_crawl_e2e`): REAL `.warc.gz`
    * archive files on disk → gzip member split → WARC/HTTP parse →
    * charset resolution → markup extraction → URL canonicalization →
    * registrable domain → robots policy gate → language + quality
    * gates → corpus funnel, in ONE declarative plan. The input is the
    * actual crawl artifact (eight planted concatenated-gzip-member
    * archives, the Common Crawl layout — [[writeWarcGzFiles]]), not
    * pre-split records, so this is the literal first-metre-to-funnel
    * path. Every per-record stage is a scan-projection expression or
    * a broadcast join (13 one-row policies), so the whole
    * pre-aggregation path is a single map-only stage over the archive
    * scan — the 100 TB shape: parallelism per archive file, no
    * shuffle until the final 5-number funnel aggregate, and that
    * aggregate is map-side combined. Stage counts nest (fetched ⊇
    * decoded ⊇ robots-allowed ⊇ quality-kept), and the oracle replays
    * every stage — decode rejection by kind, the robots decision per
    * planted policy, the exact language/quality arithmetic — down to
    * the kept token sum.
    */
  val pipelineCrawlE2e: Q = (s, d) => {
    val dir = Scratch.dir("graft_crawl_e2e_gz")
    writeWarcGzFiles(plantedCrawlE2eRecords(s, d), dir, 8, "seg", 0L,
      col("doc_id") % 8)
    val g = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcGzMembersExpr(
        org.apache.spark.sql.GraftBridge.expression(col("content"))))
    val records = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(dir)
      .select(g).select(col("member").as("record"))
    crawlFunnelAgg(crawlFunnelStaged(records))
  }

  /** The 13 planted per-domain robots policies parsed ONCE into the
    * production broadcast shape (domain → rules,
    * [[graft.functions.RobotsOps.robotsRules]]) — the fixture shared
    * verbatim by the robots gate, the batch e2e funnel and both
    * streaming twins, so every composed query judges pages against
    * the SAME policy space the oracle replays.
    */
  private def plantedCrawlRobots(s: SparkSession): DataFrame = {
    import s.implicits._
    (0 until 13).map { n =>
      val txt =
        if (n % 2 == 0)
          s"User-agent: graftbot\nDisallow: /A/b${n % 3}\n\n" +
            "User-agent: *\nDisallow: /A\n"
        else if (n % 3 == 0)
          s"User-agent: *\nDisallow: /A\nAllow: /A/b${n % 9}\n"
        else
          s"User-agent: *\nDisallow: /A/b${n % 5}\nDisallow:\n# note\n"
      (s"site$n.com", txt)
    }.toDF("domain", "robots_txt")
      // parse-once production shape (see pipelineRobotsFilter)
      .select(col("domain"), graft.functions.RobotsOps
        .robotsRules(col("robots_txt"), "GraftBot").as("rules"))
  }

  /** `record` column → the staged crawl frame (decoded / allowed /
    * kept verdict columns) — the per-row half of the composed funnel,
    * shared VERBATIM by the batch e2e and both streaming twins: every
    * stage is stateless (scan-projection expressions + one 13-row
    * broadcast join), so the streaming state must equal the batch
    * replay under any micro-batch split, which is exactly what the
    * shared oracle checks.
    */
  private def crawlFunnelStaged(records: DataFrame): DataFrame = {
    val robots = plantedCrawlRobots(records.sparkSession)
    val w = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcParseExpr(
        org.apache.spark.sql.GraftBridge.expression(col("record"))))
    records
      .select(w.as("w"))
      .select(
        // the deployed legacy-index snapshot, pinned at construction:
        // the funnel DECODES Shift_JIS/GBK/... pages instead of
        // rejecting them (the embedded ladder keeps the honest
        // rejection for labels outside the artifact, e.g. koi8-r)
        TextOps.decodeCharsetFromArtifact(col("w.body"),
          col("w.content_type"),
          graft.functions.EncodingStore.jdkSnapshotDir).as("c"),
        col("w.target_uri").as("uri"))
      .withColumn("clean",
        TextOps.extractHtml(col("c.text")).getField("text"))
      .withColumn("url_canon",
        graft.functions.UrlOps.canonicalizeUrl(col("uri")))
      .withColumn("domain", graft.functions.UrlOps.registrableDomain(
        graft.functions.UrlOps.urlHost(col("url_canon"))))
      .withColumn("path",
        regexp_extract(col("url_canon"), "^[a-z]+://[^/]+(/[^?#]*)", 1))
      .join(broadcast(robots), Seq("domain"))
      .withColumn("allowed",
        graft.functions.RobotsOps.rulesAllowed(col("rules"),
          col("path")))
      .withColumn("decoded", col("c.text").isNotNull)
      .withColumn("kept", col("decoded") && col("allowed") &&
        TextOps.langId(col("clean")) === "en" &&
        TextOps.qualityScore(col("clean")) >= 0.6)
  }

  /** The 5-number corpus funnel over [[crawlFunnelStaged]]'s verdict
    * columns — one map-side-combined aggregate, the only shuffle in
    * the composed ingest path.
    */
  private def crawlFunnelAgg(staged: DataFrame): DataFrame =
    staged.agg(
      count(lit(1)).as("n_fetched"),
      sum(when(col("decoded"), 1L).otherwise(0L)).as("n_decoded"),
      sum(when(col("decoded") && col("allowed"), 1L).otherwise(0L))
        .as("n_allowed"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("kept"),
        TextOps.tokenStats(col("clean")).getField("n_tokens"))
        .otherwise(lit(0L))).as("total_tokens"))

  /** The documents table restructured into C4's unit of work — LINES
    * ([[gopherAugmentedDocs]] discipline): a terminal-punctuated lead
    * sentence, the doc text with a terminal period only for even ids
    * (the line-retention rule's both outcomes), a `javascript` line
    * for every 7th doc, a `lorem ipsum` line for every 11th, a
    * curly-brace line for every 13th, and a five-sentence booster for
    * every 3rd (so the 3-sentence page floor has both outcomes).
    */
  private def c4AugmentedDocs(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val doc = concat(
      lit("First planted sentence "), id.cast("string"), lit("."),
      lit("\n"), col("text"),
      when(id % 2 === 0, lit(".")).otherwise(lit("")),
      when(id % 7 === 0, lit("\nThis page uses javascript heavily."))
        .otherwise(lit("")),
      when(id % 11 === 0, lit("\nLorem ipsum dolor sit amet."))
        .otherwise(lit("")),
      when(id % 13 === 0, lit("\nvar code = { sample };"))
        .otherwise(lit("")),
      when(id % 3 === 0,
        lit("\nSecond one. Third one. Fourth one. Fifth one."))
        .otherwise(lit("")))
    docs(s, d).select(id, doc.as("text"))
  }

  /** C4 FILTERS (`pipeline_c4_filters`) — the published line + page
    * rule set of Raffel et al. 2020 §2.2 (the C4 cleaning that
    * produced the most-reused public pretraining corpus), reduced to
    * its deterministic core:
    *   - LINE retention: keep only lines ending in terminal
    *     punctuation (`.` `!` `?` `"`), drop lines containing the
    *     word `javascript` (ASCII-case-insensitive);
    *   - PAGE drops: any page whose RAW text contains `lorem ipsum`
    *     (case-insensitive) or a curly brace, or whose RETAINED text
    *     carries fewer than 3 sentences (terminal-punctuation count —
    *     the deterministic stand-in for C4's splitter).
    * Kept lines are re-joined and verified BYTE-FOR-BYTE via md5 —
    * the rule set is a rewrite, not just a verdict. One line split +
    * higher-order filters in the scan projection; the page verdict is
    * arithmetic over the same pass. Complements the Gopher gate
    * (`pipeline_gopher_rules`): C4 edits lines, Gopher judges pages.
    */
  val pipelineC4Filters: Q = (s, d) => {
    val lines = split(col("text"), "\n")
    val keptLines = filter(lines, l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")) && !lower(l).contains("javascript"))
    val kept = array_join(keptLines, "\n")
    val nSentences = (length(kept) -
      length(translate(kept, ".!?", ""))).cast("long")
    val hasLorem = lower(col("text")).contains("lorem ipsum")
    val hasBrace = col("text").contains("{")
    c4AugmentedDocs(s, d)
      .select(col("doc_id"),
        size(lines).cast("long").as("n_lines"),
        size(keptLines).cast("long").as("n_lines_kept"),
        nSentences.as("n_sentences"),
        hasLorem.as("has_lorem"),
        hasBrace.as("has_brace"),
        md5(kept).as("kept_md5"))
      .withColumn("keep", !col("has_lorem") && !col("has_brace") &&
        col("n_sentences") >= 3)
      .orderBy("doc_id")
  }

  /** STREAMING composed ingest (`pipeline_warc_stream`): the
    * [[pipelineCrawlE2e]] path as ONE continuous query — the
    * documents stream is wrapped into WARC records per micro-batch
    * (stateless, like the planted-fixture discipline everywhere
    * else), then container parse → charset → extraction → URL
    * canonicalization → robots gate (the parse-once broadcast pair)
    * → quality gates → the SAME 5-number funnel, maintained as
    * streaming state in complete mode. Every per-row step is
    * stateless, so the final state must equal the batch replay under
    * ANY micro-batch split — the oracle is pipeline_crawl_e2e's
    * funnel replay verbatim. At 100 TB this is the ingest tier as a
    * continuously-running query over arriving crawl segments.
    */
  val pipelineWarcStream: Q = (s, d) => {
    val schema = docs(s, d).schema
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
    val recSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("record", BinaryType)))
    val records = stream.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.map(r => Row(r.getLong(0), crawlE2eRecord(r.getLong(0),
          r.getString(1))))
      }(Encoders.row(recSchema))
    val funnel = crawlFunnelAgg(crawlFunnelStaged(
      records.select("record")))
    s.catalog.dropTempView("graft_warc_stream")
    val q = funnel.writeStream.outputMode("complete").format("memory")
      .queryName("graft_warc_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    BenchProbe.addStreamData("pipeline_warc_stream", q)
    s.table("graft_warc_stream")
  }

  /** STREAMING ingest from REAL `.warc.gz` archives
    * (`pipeline_warc_gz_stream`): [[sourceWarcGz]]'s container path
    * composed with [[pipelineWarcStream]]'s funnel — archive FILES
    * land in a watched directory (two waves, forced mtimes,
    * `maxFilesPerTrigger = 1`, the [[plantWave]] discipline), the
    * `binaryFile` stream member-splits each arriving archive
    * ([[graft.functions.WarcGzMembersExpr]]), and the members run the
    * SAME stateless funnel, so the complete-mode state must equal the
    * batch replay — the oracle is [[pipelineCrawlE2e]]'s funnel
    * verbatim, under any micro-batch split. This is the actual 100 TB
    * continuous-ingest shape: Common Crawl segments arriving as
    * files, one task per archive, no state beyond the 5-number
    * aggregate.
    */
  val pipelineWarcGzStream: Q = (s, d) => {
    val feedDir = Scratch.dir("graft_warcgz_feed")
    val recs = plantedCrawlE2eRecords(s, d)
    // file key on doc_id/2: the wave split already consumed the
    // parity bit, so doc_id % 2 would be CONSTANT inside each wave
    // and collapse it into one archive (2 micro-batches, not 4)
    val fk = floor(col("doc_id") / 2) % 2
    writeWarcGzFiles(recs.filter(col("doc_id") % 2 === 0), feedDir, 2,
      "wave_a", waveBaseMs, fk)
    writeWarcGzFiles(recs.filter(col("doc_id") % 2 === 1), feedDir, 2,
      "wave_b", waveBaseMs + 60000L, fk)
    // binaryFile's schema is FIXED by the source; streaming just
    // requires it stated up front (batch infers it)
    val binSchema = StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("modificationTime", TimestampType, nullable = false),
      StructField("length", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val stream = s.readStream.format("binaryFile").schema(binSchema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.warc.gz").load(feedDir)
    val g = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcGzMembersExpr(
        org.apache.spark.sql.GraftBridge.expression(col("content"))))
    val records = stream.select(g).select(col("member").as("record"))
    val funnel = crawlFunnelAgg(crawlFunnelStaged(records))
    s.catalog.dropTempView("graft_warcgz_stream")
    val q = funnel.writeStream.outputMode("complete").format("memory")
      .queryName("graft_warcgz_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    BenchProbe.addStreamData("pipeline_warc_gz_stream", q)
    s.table("graft_warcgz_stream")
  }

  /** WARC responses carrying a MIX of media: html in three charset
    * shapes (utf-8, labeled windows-1252, a labeled-EUC-JP decode
    * rejection) and PDFs in both layout generations (classic; PDF 1.5
    * xref-stream + ObjStm + predictor), every 7th classic PDF
    * encrypted (the named-rejection path through the dispatch).
    */
  private def plantedMixedRecords(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("record", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      import graft.operators.PdfCodec
      import graft.sources.WarcCodec
      rows.map { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        val uri = s"http://site${id % 13}.com/page/${id % 7}"
        def html(h1Extra: String): String =
          s"<html><head><title>Doc $id</title></head><body>" +
            s"<h1>Doc $id$h1Extra</h1><div>$text</div></body></html>"
        val rec: Array[Byte] = (id % 5).toInt match {
          case 0 => WarcCodec.encodeResponse(uri, 200, "text/html",
            html("").getBytes("UTF-8"))
          case 1 => WarcCodec.encodeResponse(uri, 200,
            "text/html; charset=iso-8859-1", w1252Bytes(html(" €")))
          case 2 => WarcCodec.encodeResponse(uri, 200,
            "application/pdf",
            PdfCodec.encodePdf(Seq(Seq(s"Doc $id pdf.", text)),
              encrypted = id % 7 == 0))
          case 3 => WarcCodec.encodeResponse(uri, 200,
            "application/pdf",
            PdfCodec.encodePdf(Seq(Seq(s"Doc $id pdfm.", text)),
              flate = true, xrefStream = true, objStm = true,
              predictor = 12))
          case _ =>
            if (id % 3 == 0) WarcCodec.encodeResponse(uri, 200,
              "text/html; charset=koi8-r", text.getBytes("US-ASCII"))
            else WarcCodec.encodeResponse(uri, 200,
              "text/html; charset=EUC-JP",
              html(" \u65E5\u672C\u8A9E").getBytes("EUC-JP"))
        }
        Row(id, rec)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** MIXED-MEDIA crawl funnel (`pipeline_crawl_mixed`): one archive
    * scan where the per-record pipeline DISPATCHES on the HTTP
    * content type — `application/pdf` bodies run
    * [[graft.functions.PdfTextExpr]], html bodies run the
    * charset-sniff → markup-extraction chain — and both media merge
    * into the SAME language/quality funnel. This is the real shape of
    * a crawl corpus (PDF is the second-largest text payload after
    * HTML) and the reason the PDF tier exists: without the dispatch
    * branch every PDF byte is dark data. Catalyst's `If` evaluates
    * only the taken branch per row, so each record pays exactly its
    * own media's decode; the whole pre-aggregation path stays one
    * map-only stage. Html decodes through the pinned EncodingStore
    * snapshot, so the EUC-JP records carry REAL Japanese bytes into
    * the funnel; the oracle replays both extraction shapes, the
    * per-media rejections (koi8-r label, encrypted PDFs) and the full
    * gate arithmetic down to the kept token sum, split by media.
    */
  val pipelineCrawlMixed: Q = (s, d) => {
    val w = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WarcParseExpr(
        org.apache.spark.sql.GraftBridge.expression(col("record"))))
    def pdfText(body: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftBridge.column(
        graft.functions.PdfTextExpr(
          org.apache.spark.sql.GraftBridge.expression(body)))
    val staged = plantedMixedRecords(s, d)
      .select(w.as("w"))
      .withColumn("is_pdf",
        col("w.content_type") === "application/pdf")
      .withColumn("text",
        when(col("is_pdf"), pdfText(col("w.body")).getField("text"))
          .otherwise(TextOps.extractHtml(
            // the deployed legacy-index snapshot (the e2e funnel's
            // pin): EUC-JP pages decode; koi8-r stays the named
            // html-side rejection
            TextOps.decodeCharsetFromArtifact(col("w.body"),
              col("w.content_type"),
              graft.functions.EncodingStore.jdkSnapshotDir)
              .getField("text")).getField("text")))
      .withColumn("decoded", col("text").isNotNull)
      .withColumn("kept", col("decoded") &&
        TextOps.langId(col("text")) === "en" &&
        TextOps.qualityScore(col("text")) >= 0.6)
    staged.agg(
      count(lit(1)).as("n_fetched"),
      sum(when(col("is_pdf"), 1L).otherwise(0L)).as("n_pdf"),
      sum(when(col("decoded"), 1L).otherwise(0L)).as("n_decoded"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("kept") && col("is_pdf"), 1L).otherwise(0L))
        .as("n_pdf_kept"),
      sum(when(col("kept"),
        TextOps.tokenStats(col("text")).getField("n_tokens"))
        .otherwise(lit(0L))).as("total_tokens"))
  }

  /** PII screening: per-kind match counts + md5 of the redacted text (the
    * redaction itself verified byte-for-byte through the hash).
    */
  val textPii: Q = (s, d) => {
    val counts = TextOps.piiCounts(col("text")).map { case (n, c) => c.as(n) }
    piiAugmentedDocs(s, d)
      .select(col("doc_id") +: counts :+
        md5(TextOps.redactPii(col("text"))).as("redacted_md5"): _*)
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: docs ≡ 0 (mod 17) act as the held-out
    * benchmark; every other doc is screened for 5-gram overlap with it.
    */
  val dedupDecontaminate: Q = (s, d) => {
    val all = docs(s, d)
    Dedup.decontaminate(
      all.filter(col("doc_id") % 17 =!= 0),
      all.filter(col("doc_id") % 17 === 0), n = 5)
      .orderBy("doc_id")
  }

  /** Span-level exact dedup (repeated 8-token windows, merged-interval
    * coverage per doc). The engine fingerprints windows with 8-byte
    * xxhash64 (the scale shape — fixed-width longs through the occurrence
    * shuffle); the oracle recomputes the same COVERAGE via md5 window
    * fingerprints, a global occurrence filter and lead()-merged intervals —
    * the outputs are fingerprint-kind-independent.
    */
  val dedupSubstring: Q = (s, d) =>
    Dedup.duplicatedSpans(docs(s, d), k = 8).orderBy("doc_id")

  /** Span REMOVAL: documents rewritten with duplicated 8-token windows cut
    * out; the oracle rebuilds the rewritten text per doc and must match
    * its md5 exactly (the rewritten-text digest is the output contract;
    * the internal window fingerprints are xxhash64 as in dedup_substring).
    */
  val dedupSpanRewrite: Q = (s, d) =>
    Dedup.removeDuplicatedSpans(docs(s, d), k = 8).orderBy("doc_id")

  /** Incremental span dedup: docs ≡ 7 (mod 10) arrive as the new batch
    * and are screened for 8-token windows present ANYWHERE in the
    * standing corpus (the rest); same split as `dedup_incremental`. The
    * oracle recomputes the corpus window-fingerprint set and the batch
    * coverage with md5 windows — outputs are hash-kind-independent.
    */
  val dedupSpanIncremental: Q = (s, d) => {
    val all = docs(s, d)
    Dedup.duplicatedSpansIncremental(
      all.filter(col("doc_id") % 10 =!= 7),
      all.filter(col("doc_id") % 10 === 7), k = 8)
      .orderBy("doc_id")
  }

  /** Sketch-based corpus profiling: mergeable HLL++ cardinality and
    * quantile sketches per source (map-side-combinable, constant memory —
    * the 100 TB twin of `corpus_profile`'s exact percentiles), gated
    * against the exact values computed in the same pass. The oracle
    * recomputes the exact source count and asserts the error-bound
    * constants.
    */
  val corpusSketch: Q = (s, d) => {
    val base = docs(s, d).select(col("source"),
      TextOps.fingerprintMd5(col("text")).as("h"),
      size(TextOps.normTokens(col("text"))).as("n_toks"))
    val per = base.groupBy("source").agg(
      // rsd 0.01 (~11 KB/source, constant): the 5% gate is then 5 sigma,
      // so it holds at ANY scale — the default 0.05 rsd made the max
      // error over 20 sources cross 5% at sf0.1 (1-sigma bound)
      approx_count_distinct(col("h"), 0.01).as("approx_docs"),
      countDistinct(col("h")).as("exact_docs"),
      expr("approx_percentile(n_toks, 0.5, 1000)").as("p50_approx"),
      expr("percentile(n_toks, 0.5)").as("p50_exact"))
    val row = per.agg(
      count(lit(1)).as("n_sources"),
      max(abs(col("approx_docs") - col("exact_docs")) /
        col("exact_docs")).as("card_err"),
      max(abs(col("p50_approx") - col("p50_exact")) /
        col("p50_exact")).as("p50_err")).head()
    s.range(1).select(
      lit(row.getLong(0)).as("n_sources"),
      lit(row.getDouble(1) <= 0.05).as("cardinality_ok"),
      lit(row.getDouble(2) <= 0.05).as("p50_ok"))
  }

  /** Cluster-confined semantic near-dup (the SemDeDup shape), graded as
    * recall against the exact cosine-threshold pair set: the oracle
    * recomputes the exact pair COUNT from scratch and asserts the recall
    * bound constant (same contract as the `sim_ann_*` recall queries —
    * the cluster assignment itself is k-means-state-dependent and so not
    * SQL-reproducible).
    */
  val dedupSemantic: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val exact = Similarity.nearDupPairsExact(emb, 0.4).select("id_a", "id_b")
    // probes=3 measured 0.96/0.92 recall at sf0.001/0.01 (probes=2: 0.68)
    val cand = Similarity
      .semanticNearDupPairs(emb, 0.4, nCentroids = 16, probes = 3)
      .select(col("id_a"), col("id_b"), lit(1).as("__hit"))
    val row = exact.join(cand, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("total"), count("__hit").as("hits")).head()
    val (total, hits) = (row.getLong(0), row.getLong(1))
    s.range(1).select(
      lit(total).as("n_exact_pairs"),
      lit(total > 0 && hits.toDouble / total >= 0.8).as("recall_ok"))
  }

  /** Incremental semantic dedup against the persisted ANN store
    * ([[graft.operators.Dedup.semanticIncrementalStore]]): the standing
    * corpus (vec_id % 4 ≠ 3) is embedded/clustered/encoded into a store
    * ONCE; the arriving batch (vec_id % 4 = 3) probes it in BATCH mode
    * (`broadcastQ = false` — query frame and shortlist shuffle-join on
    * `c_id`/`neighbor_id`; nothing batch-sized broadcasts) and every
    * batch row reports its nearest standing neighbor + the `is_dup`
    * verdict at cosine ≥ 0.4. The steady-state dedup shape at 100 TB:
    * work ∝ batch × probed-cluster codes, never batch × corpus. Runs
    * the parity configuration (every cluster probed, shortlist deeper
    * than the corpus), so (nn_id, sim) IS the exact cosine argmax and
    * the oracle replays row-level; the production pruned batch plan
    * (no query-side broadcast, codes scan still statically pruned) is
    * asserted in [[graft.DedupSpec]].
    */
  val dedupSemanticIncremental: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val standing = emb.filter(col("vec_id") % 4 =!= 3)
    val batch = emb.filter(col("vec_id") % 4 === 3)
    val dir = Scratch.dir("graft_ann_seminc")
    val (_, v) = graft.operators.AnnIndex.build(standing, dir)
    Dedup.semanticIncrementalStore(s, dir, batch, standing,
        threshold = 0.4, nprobe = 16, rerank = 1 << 20, version = v)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy("vec_id")
  }

  /** Plant one arrival wave as a single parquet file with a forced
    * mtime — the file-stream queries replay deterministic micro-batch
    * ORDER by pairing these with `maxFilesPerTrigger = 1` (the file
    * source processes files oldest-mtime-first).
    */
  private val waveBaseMs = 1700000000000L
  private def plantWave(feedDir: String, wave: DataFrame, name: String,
                        mtimeMs: Long): Unit = {
    val tmp = Scratch.dir(s"${new java.io.File(feedDir).getName}_$name")
    wave.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).head
    val dest = java.nio.file.Paths.get(feedDir, s"$name.parquet")
    java.nio.file.Files.copy(part.toPath, dest)
    java.nio.file.Files.setLastModifiedTime(dest,
      java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
  }

  /** Streaming semantic dedup against a GROWING ANN store
    * ([[graft.streaming.StreamingDedup.semanticIngestStore]]): the
    * standing corpus (vec_id % 8 ∉ {3, 7}) is built into a store once;
    * two arrival waves (% 8 = 3, then % 8 = 7) stream in as separate
    * micro-batches (two feed files with forced mtime order +
    * maxFilesPerTrigger=1), each probing the store for its nearest live
    * neighbor and then INGESTING itself — so wave 2's candidates are the
    * standing corpus PLUS wave 1, the sequential first-arrival-wins
    * semantics of a deduplicating ingest front door. Verdicts land as
    * per-batch idempotent parquet directories (the production sink
    * shape: a retried batch overwrites its own verdicts). Parity
    * configuration (every cluster probed, shortlist deeper than the
    * corpus) makes each probe the exact cosine argmax over its wave's
    * candidate set, so the oracle replays both waves row-level.
    */
  val dedupSemanticStream: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val standing = emb.filter(
      col("vec_id") % 8 =!= 3 && col("vec_id") % 8 =!= 7)
    val dir = Scratch.dir("graft_ann_semstream")
    val (_, v) = graft.operators.AnnIndex.build(standing, dir,
      nCentroids = 16)
    // two single-file arrival waves; explicit mtimes fix batch order
    val feedDir = Scratch.dir("graft_semstream_feed")
    plantWave(feedDir, emb.filter(col("vec_id") % 8 === 3), "wave_a",
      waveBaseMs)
    plantWave(feedDir, emb.filter(col("vec_id") % 8 === 7), "wave_b",
      waveBaseMs + 60000L)
    val stream = s.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.parquet").parquet(feedDir)
    val sinkDir = Scratch.dir("graft_semstream_verdicts")
    val q = graft.streaming.StreamingDedup.semanticIngestStore(
        s, dir, stream, emb,
        (verdicts, batchId) => verdicts.write.mode("overwrite")
          .parquet(s"$sinkDir/b=$batchId"),
        threshold = 0.4, nprobe = 16, rerank = 1 << 20, version = v)
      .option("checkpointLocation", Scratch.dir("graft_semstream_ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    BenchProbe.addStreamData("dedup_semantic_stream", q)
    s.read.parquet(sinkDir)
      .select(col("vec_id"), col("nn_id"), round(col("sim"), 6).as("sim"),
        col("is_dup"))
      .orderBy("vec_id")
  }

  /** Mixture weights for the sampling demo: four keep-fractions cycled
    * across the 20 sources. One shared constant — the oracle CASE is
    * generated from the same map.
    */
  private val mixtureWeights: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> ((i % 4) + 1) * 0.2).toMap

  val sampleMixture: Q = (s, d) =>
    Sampling.mixture(docs(s, d), "source", mixtureWeights, "doc_id")
      .select("doc_id", "source").orderBy("doc_id")

  val packShards: Q = (s, d) =>
    Packing.shard(docs(s, d), nShards = 8)
      .select("doc_id", "shard", "pos").orderBy("shard", "pos")

  val textUnigramLm: Q = (s, d) =>
    TextOps.unigramLogProb(docs(s, d)).orderBy("doc_id")

  /** Stupid-backoff trigram scoring of a held-out batch
    * ([[TextOps.backoffLogProb]]): docs ≡ 7 (mod 10) arrive as the new
    * batch (the `dedup_incremental` split) and score under the LM
    * trained on the REST — ~36% of batch trigram occurrences are unseen
    * at small SF, so the backoff chain genuinely executes. The oracle
    * replays counts, both backoff levels, and the add-one floor.
    */
  val textBackoffLm: Q = (s, d) => {
    val all = docs(s, d)
    TextOps.backoffLogProb(all.filter(col("doc_id") % 10 =!= 7),
      all.filter(col("doc_id") % 10 === 7))
      .orderBy("doc_id")
  }

  /** Bigram-LM typicality ([[TextOps.bigramLogProb]]): per-doc average
    * conditional bigram log-prob over the corpus model — the perplexity
    * proxy a curation filter trims tails with.
    */
  val textBigramLm: Q = (s, d) =>
    TextOps.bigramLogProb(docs(s, d)).orderBy("doc_id")

  /** PMI collocation extraction ([[TextOps.pmiBigrams]]): top-20
    * adjacent bigrams by pointwise mutual information with a pair-count
    * floor of 5 — the multiword-expression miner. The oracle replays
    * counts, the fixed-order double arithmetic, the 4-decimal rounding
    * and the (pmi desc, pair) ranking exactly.
    */
  val textPmiBigrams: Q = (s, d) =>
    TextOps.pmiBigrams(docs(s, d), topN = 20, minCount = 5)
      .orderBy("w1", "w2")

  /** Incremental dedup: docs ≡ 7 (mod 10) arrive as the "new batch", the
    * rest are the standing corpus; the batch is probed against the
    * corpus's LSH buckets only. md5 family → the oracle recomputes the
    * whole pipeline (signatures, banding, corpus-side bucket cap, verify).
    */
  val dedupIncremental: Q = (s, d) => {
    val all = docs(s, d)
    Dedup.minhashLshIncremental(
      all.filter(col("doc_id") % 10 =!= 7),
      all.filter(col("doc_id") % 10 === 7),
      threshold = 0.5, hashKind = "md5")
      .orderBy("new_id", "dup_of")
  }

  /** Z-order clustering key over (custkey, order day): the multi-dim
    * data-skipping layout — sorting by this key lets min-max file stats
    * prune predicate boxes on EITHER dimension (ZOrderSpec measures the
    * file-level pruning win vs a single-column sort). The key itself is
    * engine-neutral bit math, verified by the oracle bit-for-bit.
    */
  val idxZorder: Q = (s, d) => {
    val day = datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
    Tables.orders(s, d)
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_orderkey").as("docid"),
        ZOrder.key(21, col("o_custkey"), day).as("zval"))
      .orderBy("zval", "docid")
  }

  /** O17-adjacent streaming form of exact dedup: the documents table read
    * as a file stream, folded through the streaming aggregation state
    * store; final state must equal the batch operator (same oracle as
    * `dedup_exact`).
    */
  /** Streaming near-dup against a GROWING persisted bucket store
    * ([[graft.streaming.StreamingDedup.nearDupIngestStore]]): the store
    * is seeded with the standing corpus (doc_id % 10 ≠ 7, skew-guarded
    * buckets), the remaining docs replay as the arriving stream, and
    * every micro-batch appends-then-probes — so pairs inside ONE batch
    * and across batches are both found, and the final distinct pair set
    * is batch-boundary-invariant (one-shot ≡ split, pinned by the
    * DedupSpec invariance test). md5 hash family, so the oracle replays
    * signatures, banding, the corpus-side bucket guard, the growing
    * store's candidate join, and the exact-Jaccard verify.
    */
  val dedupStreamingNeardup: Q = (s, d) => {
    val all = docs(s, d)
    val dir = Scratch.dir("graft_neardup_store")
    val (sets, buckets) = Dedup.minhashStoreTables(
      all.filter(col("doc_id") % 10 =!= 7), hashKind = "md5")
    graft.streaming.StreamingDedup.seedNearDupStore(
      dir, sets, Dedup.guardBuckets(buckets, 64))
    val stream = s.readStream.schema(all.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
    val q = graft.streaming.StreamingDedup.nearDupIngestStore(
        s, dir, stream.filter(col("doc_id") % 10 === 7), hashKind = "md5")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    BenchProbe.addStreamData("dedup_streaming_neardup", q)
    graft.streaming.EpochStore.readAll(s,
        graft.streaming.EpochStore.current(dir), "pairs")
      .distinct().orderBy("id_a", "id_b")
  }

  /** Streaming span screening against the PERSISTED epoch-frozen
    * fingerprint store ([[graft.streaming.StreamingDedup.spanIngestStore]]):
    * the corpus's distinct window fingerprints are computed once and
    * persisted; the remaining docs replay as the stream and each batch
    * probes the FROZEN store (per-doc coverage depends only on the
    * store → batch-boundary-invariant by construction) while appending
    * its own fingerprints for the next store rotation. Must equal the
    * recompute-per-call batch form — the oracle is byte-for-byte
    * `dedup_span_incremental`'s.
    */
  val dedupStreamingSpans: Q = (s, d) => {
    val all = docs(s, d)
    val dir = Scratch.dir("graft_span_store")
    graft.streaming.StreamingDedup.seedSpanStore(dir,
      Dedup.spanStoreSigs(all.filter(col("doc_id") % 10 =!= 7), k = 8))
    val stream = s.readStream.schema(all.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
    val q = graft.streaming.StreamingDedup.spanIngestStore(
        s, dir, stream.filter(col("doc_id") % 10 === 7), k = 8)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    BenchProbe.addStreamData("dedup_streaming_spans", q)
    graft.streaming.EpochStore.readAll(s,
        graft.streaming.EpochStore.current(dir), "coverage")
      .orderBy("doc_id")
  }

  /** Span-store ROTATION ([[graft.streaming.StreamingDedup.rotateSpanStore]]):
    * epoch 0 is seeded with the standing corpus's window fingerprints
    * and ingests wave 1 (docs ≡ 7 mod 10), whose fingerprints accumulate
    * as that epoch's batch directories; the rotation then folds frozen
    * base + accumulation into epoch 1's frozen base, and wave 2 (docs ≡
    * 8 mod 10) screens against IT. Correctness contract: screening after
    * the rotation ≡ the one-shot incremental operator over the UNION
    * corpus (standing ∪ wave 1) — the oracle replays exactly that with
    * md5 windows, so a rotation that dropped or duplicated accumulated
    * fingerprints breaks the hash match.
    */
  val dedupSpanRotate: Q = (s, d) => {
    val all = docs(s, d)
    val dir = Scratch.dir("graft_span_rotate")
    val sd = graft.streaming.StreamingDedup
    val ref0 = sd.seedSpanStore(dir, Dedup.spanStoreSigs(
      all.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 8), k = 8))
    // epoch-0 ingest of wave 1: screened against the seed base (that
    // output is epoch-0's, not under test here) + sigs accumulated
    sd.spanIngestBatch(s, ref0, all.filter(col("doc_id") % 10 === 7),
      batchId = 0L, k = 8, textCol = "text", idCol = "doc_id",
      hashKind = "xx")
    val ref1 = sd.rotateSpanStore(s, dir)
    Dedup.duplicatedSpansAgainstSigs(
      graft.streaming.EpochStore.readBase(s, ref1, "spansigs"),
      all.filter(col("doc_id") % 10 === 8), k = 8)
      .orderBy("doc_id")
  }

  val dedupStreaming: Q = (s, d) => {
    val schema = docs(s, d).schema
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
    val q = graft.streaming.StreamingDedup.exactStream(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("graft_dedup_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    BenchProbe.addStreamData("dedup_streaming", q)
    s.table("graft_dedup_stream").orderBy("text_hash")
  }

  /** Streaming tokenization accounting
    * ([[graft.streaming.StreamingTokenize]]): the documents table
    * replayed as a file stream through the FROZEN tokenizer — trained
    * ahead on the corpus snapshot, persisted to
    * [[graft.functions.TokenizerStore]], and loaded back by pinned
    * version (the stream never sees the trainer, only the artifact —
    * the same store `tokenize_from_artifact` round-trips). Map-only
    * encode in the stream, per-source token totals as the only state.
    * Final state must equal the batch chain; the oracle independently
    * replays trainer + encode + GROUP BY source.
    */
  /** STREAMING CRAWL FRONT-END (`pipeline_crawl_stream`) — the whole
    * round-12 ingest tier composed as ONE continuous query, the shape
    * a live crawl actually runs: raw HTML pages with messy URLs arrive
    * on a stream; each micro-batch extracts text
    * ([[TextOps.extractHtml]]), canonicalizes the URL and resolves the
    * registrable domain ([[graft.functions.UrlOps]]), drops rows with
    * no usable URL key, drops BLOCKLISTED domains (a static literal
    * list — the broadcast-free filter a policy push ships to every
    * executor), gates on language and quality, and folds per-source
    * (n_kept, total_tokens) through the streaming aggregation state —
    * the running mixture statistics the curation scheduler reads.
    * Every per-row step is stateless (map-only in the batch plan), so
    * the ONLY state is the per-source aggregate and the final state
    * must equal the batch replay under any micro-batch split; the
    * oracle replays extraction-by-reconstruction, the URL policy and
    * both gates end-to-end.
    */
  val pipelineCrawlStream: Q = (s, d) => {
    val schema = docs(s, d).schema
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
    // blocklist: every domain whose site number ≡ 0 (mod 7), across
    // all five planted suffixes — 30 literal entries, policy-as-data
    val blocked = for {
      n <- 0 until 37 if n % 7 == 0
      sfx <- Seq(".com", ".co.uk", ".org", ".github.io", ".com.au")
    } yield s"site$n$sfx"
    val id = col("doc_id")
    val sfx = element_at(array(lit(".com"), lit(".co.uk"), lit(".org"),
      lit(".github.io"), lit(".com.au")), (id % 5 + 1).cast("int"))
    val url = when(id % 11 === 0,
        concat(lit("not a url "), id.cast("string")))
      .otherwise(concat(
        when(id % 2 === 0, lit("HTTPS")).otherwise(lit("http")),
        lit("://WWW.Site"), (id % 37).cast("string"), sfx,
        when(id % 4 === 0,
          when(id % 2 === 0, lit(":443")).otherwise(lit(":80")))
          .when(id % 7 === 0, lit(":8080")).otherwise(lit("")),
        lit("/A/b"), (id % 9).cast("string")))
    val esc = regexp_replace(regexp_replace(regexp_replace(col("text"),
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val html = concat(
      lit("<html><head><title>Doc "), id.cast("string"),
      lit("</title></head><body><h1>Title &amp; doc "), id.cast("string"),
      lit("&#33;</h1><div>"), esc, lit("</div></body></html>"))
    val extracted = stream
      .select(id, col("source"), url.as("url"), html.as("html"))
      .withColumn("clean",
        TextOps.extractHtml(col("html")).getField("text"))
      .withColumn("host", graft.functions.UrlOps.urlHost(col("url")))
      .filter(col("host").isNotNull)
      .withColumn("domain",
        graft.functions.UrlOps.registrableDomain(col("host")))
      .filter(!col("domain").isin(blocked: _*))
      .filter(TextOps.langId(col("clean")) === "en" &&
        TextOps.qualityScore(col("clean")) >= 0.6)
      .select(col("source"),
        TextOps.tokenStats(col("clean")).getField("n_tokens")
          .as("n_tokens"))
    s.catalog.dropTempView("graft_crawl_stream")
    val q = extracted.groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("n_tokens").as("total_tokens"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("graft_crawl_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    BenchProbe.addStreamData("pipeline_crawl_stream", q)
    s.table("graft_crawl_stream").orderBy("source")
  }

  val tokenizeStreaming: Q = (s, d) => {
    val corpus = docs(s, d)
    val dir = Scratch.dir("graft_tok_store")
    val version = graft.functions.TokenizerStore
      .trainAndSave(dir, corpus, steps = 10)
    val merges = graft.functions.TokenizerStore.get(dir, version)
      .getOrElse(sys.error(s"tokenizer v$version vanished from $dir"))
      .mergePairs
    val stream = s.readStream.schema(corpus.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
    s.catalog.dropTempView("graft_tokenize_stream")
    val q = graft.streaming.StreamingTokenize.tokenCountStream(stream, merges)
      .writeStream.outputMode("complete").format("memory")
      .queryName("graft_tokenize_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    BenchProbe.addStreamData("tokenize_streaming", q)
    s.table("graft_tokenize_stream").orderBy("source")
  }

  /** End-to-end pretraining-corpus pipeline — the round's extension
    * operators composed in production order: exact-dedup to keepers,
    * benchmark decontamination, language + quality gates (one
    * [[TextOps.tokenStats]] feature pass, materialized narrow), weighted
    * mixture sampling, then deterministic sharding. Every stage is the
    * scale shape of its standalone query; the whole chain is one oracled
    * result: (doc_id, source, n_tokens, shard, pos).
    */
  val pipelinePretrain: Q = (s, d) => pretrainChain(docs(s, d))

  /** The pretraining pipeline STARTING FROM RAW HTML — the real crawl
    * shape: [[textExtractHtml]]'s extraction feeds the exact
    * [[pipelinePretrain]] chain (dedup → decontaminate → gates →
    * mixture → shard) instead of pre-cleaned text. The extracted
    * corpus is one lazy checkpoint: the chain scans it several times
    * (dedup digest, decontamination shingles, feature pass) and
    * re-running the scanner per scan would triple the extraction cost.
    * The oracle replays extraction by reconstruction (the planted
    * wrapper is deterministic) and then the full chain over it.
    */
  val pipelinePretrainHtml: Q = (s, d) => pretrainChain(
    graft.plans.LazyCheckpoint.shared(
      htmlAugmentedDocs(s, d).select(col("doc_id"),
        TextOps.extractHtml(col("html")).getField("text").as("text"),
        col("source"))))

  /** The BOILERPLATE-AWARE pretrain chain (`pipeline_pretrain_main`):
    * same curation funnel, but the corpus is each page's MAIN content
    * ([[graft.functions.MainContent]]) instead of all its text — the
    * composition a production pipeline actually runs (trafilatura
    * before the C4 gates). Furniture-only pages extract to empty
    * strings, collapse to one exact-dedup keeper, and die at the
    * quality gate — the honest cascade, replayed whole in the oracle.
    */
  val pipelinePretrainMain: Q = (s, d) => pretrainChain(
    graft.plans.LazyCheckpoint.shared(
      docs(s, d).select(col("doc_id"),
        TextOps.htmlMain(mainContentHtml(col("doc_id"), col("text")))
          .getField("main_text").as("text"),
        col("source"))))

  /** SHIFT_JIS → DECODE → EXTRACT → CURATE, end-to-end
    * (`pipeline_pretrain_sjis`) — the acceptance the round-14 charset
    * tier was missing a consumer for: every third doc is planted as
    * the SHIFT_JIS BYTES of a Japanese page ([[cjkPageHtml]]'s ja
    * shape — fixture-side `getBytes`, decode is the engine's), the
    * rest as UTF-8 Latin pages ([[mainContentHtml]]); the funnel then
    * runs the pinned-artifact charset decode
    * ([[graft.functions.CharsetDecodeArtifactExpr]] over the deployed
    * snapshot), per-language main-content extraction with the v3
    * char-list artifact ([[graft.functions.HtmlMainLangExpr]] — the
    * ja furniture dies, the ja prose survives via the char branch),
    * and the curation cascade as a per-doc FUNNEL verdict:
    * `empty` (all-furniture pages), `dup` (exact dedup over non-empty
    * normalized mains, min-doc_id keeper), `gate` (en: the pretrain
    * chain's langId + quality gates; ja: the integer char gate —
    * ≥ 30 CJK chars and function-char density inside [0.08, 0.60],
    * the same translate-delta counts the oracle replays — the upper
    * bound is the low-information cut, the char-mode analog of the
    * word gate's distance-from-0.4 stopword term), else `kept`.
    * EVERY stage fires in-corpus: all-furniture pages → `empty`,
    * shared mains → `dup`, the planted all-stopword spam pages (every
    * 5th en doc — extraction keeps them, 100% stopword density fails
    * the quality score) and the function-char-saturated ja mains
    * (hi-only prose, density > 0.60) → `gate`. Pure scan projection
    * until the one dedup shuffle — at 100 TB the decode+extract fuse
    * into the ingest read and the funnel's only exchange is the
    * digest groupBy.
    */
  val pipelinePretrainSjis: Q = (s, d) => {
    import CjkMainFixture._
    val dir = Scratch.dir("graft_stoplists_sjis")
    val store = graft.functions.StoplistStore
    val en = "en" -> graft.functions.MainContent.corpusStopwords
      .toSeq.sorted
    val v3 = store.save(dir, Map(en, "ja" -> Seq.empty[String]),
      charLists = Map("ja" -> jaStopChars))
    // the spam plant: survives extraction (both words are in the
    // extraction stoplist → 100% density, 239 chars → cf good) and
    // fails the quality gate (stopword ratio 1.0 → distance term
    // 0.4, distinct ratio 0.025 → score 0.475 < 0.6)
    val spam = ("the a " * 40).trim
    val pages = docs(s, d).select(col("doc_id"), col("text"))
      .withColumn("plang",
        when(col("doc_id") % 3 === 0, lit("ja")).otherwise(lit("en")))
      .withColumn("page",
        when(col("plang") === "ja",
          cjkPageHtml(col("doc_id"), col("text"), lit(false)))
        .otherwise(mainContentHtml(col("doc_id"),
          when(col("doc_id") % 5 === 2, lit(spam))
            .otherwise(col("text")))))
      .select("doc_id", "plang", "page")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("plang", StringType),
      StructField("ctype", StringType),
      StructField("body", BinaryType)))
    // fixture-side encode only (the planted-bytes discipline); the
    // DECODE under test is the engine's pinned-artifact expression
    val bytes = pages.mapPartitions { rows =>
      rows.map { r =>
        val ja = r.getString(1) == "ja"
        Row(r.getLong(0), r.getString(1),
          if (ja) "text/html; charset=shift_jis"
          else "text/html; charset=utf-8",
          r.getString(2).getBytes(
            if (ja) "Shift_JIS" else "UTF-8"))
      }
    }(Encoders.row(schema)).toDF()
    val main = bytes
      .select(col("doc_id"), col("plang"),
        TextOps.decodeCharsetFromArtifact(col("body"), col("ctype"),
          graft.functions.EncodingStore.jdkSnapshotDir)
          .getField("text").as("html"))
      .select(col("doc_id"), col("plang"),
        org.apache.spark.sql.GraftBridge.column(
          graft.functions.HtmlMainLangExpr(
            org.apache.spark.sql.GraftBridge.expression(col("html")),
            org.apache.spark.sql.GraftBridge.expression(col("plang")),
            store.listsAt(dir, v3).toSeq.sortBy(_._1)
              .map { case (l, ws) => (l, ws.toSeq.sorted) },
            store.charListsAt(dir, v3).toSeq.sortBy(_._1)))
          .getField("main_text").as("main"))
    val norm = main
      .withColumn("n_main", length(col("main")).cast("long"))
      .withColumn("k",
        md5(regexp_replace(lower(trim(col("main"))), "\\s+", " ")))
    val keepers = norm.filter(col("n_main") > 0)
      .groupBy("k").agg(min(col("doc_id")).as("keep_id"))
    val cjkChars = length(col("main")) -
      length(regexp_replace(col("main"), "[一-鿿぀-ヿ]", ""))
    val stopChars = length(col("main")) -
      length(translate(col("main"), jaStopChars.mkString, ""))
    norm.join(keepers, Seq("k"), "left")
      .withColumn("gate_ok",
        when(col("plang") === "ja",
          cjkChars >= 30 &&
            lit(100) * stopChars >= lit(8) * cjkChars &&
            lit(100) * stopChars <= lit(60) * cjkChars)
        .otherwise(TextOps.langId(col("main")) === "en" &&
          TextOps.qualityScore(col("main")) >= 0.6))
      .select(col("doc_id"), col("plang"), col("n_main"),
        md5(col("main")).as("main_md5"),
        when(col("n_main") === 0, lit("empty"))
          .when(col("doc_id") =!= col("keep_id"), lit("dup"))
          .when(!col("gate_ok"), lit("gate"))
          .otherwise(lit("kept")).as("stage"))
      .orderBy("doc_id")
  }

  private def pretrainChain(corpus: DataFrame): DataFrame = {
    val keepers = Dedup.exact(corpus).select(col("keep_id"))
    val bench = corpus.filter(col("doc_id") % 17 === 0)
    val base = corpus.filter(col("doc_id") % 17 =!= 0)
      .join(keepers, col("doc_id") === col("keep_id"))
    val contaminated = Dedup.decontaminate(base, bench, n = 5)
      .filter(col("contaminated")).select("doc_id")
    val feats = graft.plans.LazyCheckpoint.shared(
      base.join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("source"),
          TextOps.langId(col("text")).as("lang_pred"),
          TextOps.qualityScore(col("text")).as("quality"),
          TextOps.tokenStats(col("text")).getField("n_tokens").as("n_tokens")))
    val gated = feats
      .filter(col("lang_pred") === "en" && col("quality") >= 0.6)
      .select("doc_id", "source", "n_tokens")
    val mixed = Sampling.mixture(gated, "source", mixtureWeights, "doc_id")
    Packing.shard(mixed, nShards = 4).orderBy("shard", "pos")
  }

  /** End-to-end tokenization pipeline — what sits between a curated corpus
    * and a trainer's input: quality-gate the docs ([[TextOps.qualityScore]]
    * cutoff), learn the BPE tokenizer ON the gated corpus
    * ([[TextOps.bpeTrainMerges]]), tokenize every kept doc map-only
    * ([[TextOps.bpeEncode]]), and pack the per-source token streams into
    * exact 512-token sequences ([[Packing.packContiguous]]). One corpus
    * scan for the gate+histogram, one for the tokenize; the only
    * shuffles are the packing prefix sum's (tiny id+count rows).
    * Counting deliberately does NOT go through [[TextOps.bpeEncodeIds]]:
    * a count needs no symbol→id resolution, and building the vocabulary
    * just to discard the ids would add a THIRD corpus scan
    * (`bpeVocab`'s code-point distinct) — the ids path belongs to
    * `pipeline_batches`, which consumes the ids themselves.
    */
  val pipelineTokenize: Q = (s, d) => {
    val kept = graft.plans.LazyCheckpoint.shared(
      docs(s, d).filter(TextOps.qualityScore(col("text")) >= 0.6)
        .select(col("doc_id"), col("source"), col("text")))
    val merges = TextOps.bpeTrainMergesLocal(kept, steps = 10,
        maxVocab = TextOps.DefaultMaxVocab)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val counted = kept
      .select(col("doc_id"), col("source"),
        TextOps.bpeEncode(col("text"), merges).as("enc"))
      .select(col("doc_id"), col("source"),
        size(TextOps.bpeTokensFromEncoded(col("enc"))).cast("long")
          .as("n_tokens"))
    Packing.packContiguous(counted, budget = 512)
      .orderBy("doc_id", "seq_id")
  }

  /** The literal trainer input — (source, sequence, position, token id)
    * batches: quality-gate, learn merges (hybrid trainer) and the
    * vocabulary on the gated corpus, tokenize straight to ID ARRAYS
    * map-only ONCE ([[TextOps.bpeEncodeIds]] — the ids frame is a shared
    * lazy checkpoint feeding both the token-count and the token-stream
    * sides; per-token symbol strings never leave the row, so the
    * exploded stream and everything after it move longs only), lay each
    * source's token stream out contiguously (same bucketed offset
    * prefix sum as [[Packing.packContiguous]]) and address every token
    * as (stream_offset div 512, stream_offset mod 512). Integer
    * `div`/`%` on longs — exact in Spark and DuckDB alike; the oracle
    * replays the entire chain in its encode→explode→id-join form and
    * matches every row.
    */
  val pipelineBatches: Q = (s, d) => {
    val kept = docs(s, d).filter(TextOps.qualityScore(col("text")) >= 0.6)
      .select(col("doc_id"), col("source"), col("text"))
    val merges = TextOps.bpeTrainMergesLocal(kept, steps = 10,
        maxVocab = TextOps.DefaultMaxVocab)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = TextOps.bpeVocab(kept, merges)
      .select("symbol", "token_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val enc = graft.plans.LazyCheckpoint.shared(
      kept.select(col("doc_id"), col("source"),
        TextOps.bpeEncodeIds(col("text"), merges, vocab).as("ids")))
    val counted = enc.select(col("doc_id"), col("source"),
      size(col("ids")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    // per-source stream offsets via the bucketed two-phase prefix sum —
    // same deterministic (hash, id) order as Packing.packContiguous,
    // never a single-task-per-source window
    val off = Packing.streamOffsets(counted, "source", "n_tokens", "doc_id",
        offCol = "off")
      .select(col("doc_id"), col("off"))
    enc.select(col("doc_id"), col("source"),
        posexplode(col("ids")).as(Seq("pos", "token_id")))
      .join(off, "doc_id")
      .select(col("source"),
        expr("(off + pos) div 512").as("seq_id"),
        ((col("off") + col("pos")) % 512).as("seq_pos"),
        col("token_id"))
      .orderBy("source", "seq_id", "seq_pos")
  }

  /** Skew-guarded aggregation: the two-stage salted count+sum must equal
    * the plain GROUP BY (the oracle) — correctness of the salt/combine
    * decomposition, not just its existence. Sum rounded to 4 (salting
    * changes float accumulation order).
    */
  val aggSkewSalted: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
    SkewGuard.saltedCount(ev, Seq("event_type"))
      .join(SkewGuard.saltedSum(ev, Seq("event_type"), "value"), "event_type")
      .select(col("event_type"), col("cnt"), round(col("total"), 4).as("total"))
      .orderBy("event_type")
  }

  /** Storage-quantization quality gate: recall@5 of brute-force top-k over
    * the int8-quantized (8× smaller) embedding column vs the full-precision
    * baseline — the oracle pins the ≥ 0.8 assertion (measured ~1.0; int8
    * barely moves cosine neighborhoods).
    */
  val simQuantizedRecall: Q = (s, d) =>
    annRecallQuery(s, d, (emb, q) => {
      val deq = emb.select(col("vec_id"),
        VectorOps.dequantizeInt8(VectorOps.quantizeInt8(col("embedding")))
          .as("embedding"))
      Similarity.bruteForceTopK(deq, q, k = 5)
    })

  /** Source-layer round-trip: documents written to JSON-lines and ORC,
    * read back through the ingestion paths, joined — byte-identical
    * content proves the non-parquet sources preserve the corpus.
    */
  val sourceRoundtrip: Q = (s, d) => {
    val dir = Scratch.dir("graft_src")
    val base = docs(s, d).select("doc_id", "text", "source")
    base.write.mode("overwrite").json(s"$dir/json")
    graft.sources.DocSources.writeOrc(base, s"$dir/orc")
    val json = graft.sources.DocSources.readJson(s, s"$dir/json", base.schema)
    val orc = graft.sources.DocSources.readOrc(s, s"$dir/orc")
    json.select(col("doc_id"), md5(col("text")).as("md5_json"))
      .join(orc.select(col("doc_id"), md5(col("text")).as("md5_orc"),
        col("source")), "doc_id")
      .orderBy("doc_id")
  }

  /** Corpus profiling: per-source document counts, token totals, EXACT
    * token-count percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`,
    * both linear-interpolated over the sorted values) and char bounds —
    * the data-quality dashboard a curation run reads before choosing
    * mixture weights and length gates.
    */
  val corpusProfile: Q = (s, d) =>
    docs(s, d).select(col("source"), col("n_chars"),
        TextOps.tokenStats(col("text")).getField("n_tokens").as("n_toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_toks").as("total_tokens"),
        round(expr("percentile(n_toks, 0.5)"), 4).as("p50_tokens"),
        round(expr("percentile(n_toks, 0.9)"), 4).as("p90_tokens"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      .orderBy("source")

  /** SNAPSHOT DRIFT detection (`corpus_drift`) — the monitoring signal
    * that schedules [[graft.operators.AnnIndex.retrain]] and a corpus
    * re-curation: two crawl snapshots (old = even doc ids, new = odd —
    * the deterministic stand-in for "last month vs this month") compare
    * per source on
    *  - token-length mean shift (the cheap distribution signal),
    *  - vocabulary Jaccard (token-set overlap — topic/vocab churn;
    *    computed as one (source, token, side) aggregate, bounded by
    *    vocabulary, never an all-pairs comparison), and
    *  - embedding-mean shift (L2 of per-position rounded means over
    *    the even/odd vec_id halves — a 64-row position aggregate; the
    *    per-position means are ROUNDED before the norm so the fixed
    *    position-order sum replays bit-for-bit cross-engine).
    * Scale shape: three map-side-combined aggregates; nothing joins at
    * corpus width (the vocab join is vocabulary-bounded, the embedding
    * shift is a 1-row broadcast onto the per-source frame).
    */
  val corpusDrift: Q = (s, d) => {
    val all = docs(s, d)
    val side = when(col("doc_id") % 2 === 0, lit("old")).otherwise(lit("new"))
    val base = all.select(col("source"), side.as("__side"),
      size(TextOps.normTokens(col("text"))).cast("long").as("n_toks"),
      TextOps.normTokens(col("text")).as("__toks"))
    val lens = base.groupBy("source").agg(
      sum(when(col("__side") === "old", 1L).otherwise(0L)).as("n_old"),
      sum(when(col("__side") === "new", 1L).otherwise(0L)).as("n_new"),
      round(avg(when(col("__side") === "old", col("n_toks"))), 4)
        .as("len_mean_old"),
      round(avg(when(col("__side") === "new", col("n_toks"))), 4)
        .as("len_mean_new"))
    val vocab = base
      .select(col("source"), col("__side"), explode(col("__toks")).as("w"))
      .groupBy("source", "w").agg(
        max(when(col("__side") === "old", 1).otherwise(0)).as("__o"),
        max(when(col("__side") === "new", 1).otherwise(0)).as("__n"))
      .groupBy("source").agg(
        round(sum(col("__o") * col("__n")).cast("double") /
          count(lit(1)), 6).as("vocab_jaccard"))
    val emb = Tables.embeddings(s, d)
    val vside = when(col("vec_id") % 2 === 0, lit("old")).otherwise(lit("new"))
    val means = emb.select(vside.as("__side"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("pos", "x")))
      .groupBy("pos").agg(
        round(avg(when(col("__side") === "old", col("x"))), 6).as("mo"),
        round(avg(when(col("__side") === "new", col("x"))), 6).as("mn"))
    val shift = means
      .agg(round(sqrt(sum((col("mo") - col("mn")) *
        (col("mo") - col("mn")))), 6).as("emb_shift"))
    lens.join(vocab, "source")
      .crossJoin(broadcast(shift))
      .select("source", "n_old", "n_new", "len_mean_old", "len_mean_new",
        "vocab_jaccard", "emb_shift")
      .orderBy("source")
  }

  /** RETRAIN-DECISION query (`pipeline_drift_response`) — the operator
    * runbook as one oracled decision, closing the drift loop
    * ([[corpusDrift]] detect → `graft_ann_stats` skew →
    * [[graft.operators.AnnIndex.retrain]] recover) with the step that
    * actually schedules the recovery. Drift is STAGED as real: the new
    * snapshot's embeddings (odd vec_ids) collapse toward 2·𝟙
    * (x·0.01 + 2.0 per position — a hard distribution break), the ANN
    * store is built on the OLD snapshot and the drifted new rows arrive
    * as a frozen-model ingest, so the layout is arrival-biased by
    * construction. Four threshold legs feed the verdict:
    *  - per source: token-length mean shift > 10 % of the old mean, and
    *    vocabulary Jaccard < 0.5 (both [[corpusDrift]]'s signals,
    *    SQL-replayed exactly);
    *  - corpus-wide: embedding-mean shift > 0.5 (the planted transform
    *    is applied in DOUBLE inside the signal on both engines, so the
    *    value replays bit-for-bit);
    *  - store-side: max_cluster > 25 % of n_vectors from
    *    [[graft.operators.AnnIndex.stats]] — the k-means layout skew an
    *    oracle cannot recompute, but the fixture PINS its truth value:
    *    every drifted vector lies in a 0.01-radius cosine ball around
    *    the 𝟙 direction, so one trained centroid absorbs the entire new
    *    half and max_cluster/n ≥ ~0.5 > 0.25 by construction.
    * decision = retrain iff ANY leg fires anywhere — one global verdict
    * (there is one store), repeated per source row like `emb_shift`.
    * Scale shape: [[corpusDrift]]'s three map-side aggregates + one
    * store-stats aggregate + a 1-row broadcast of the global OR;
    * nothing joins at corpus width.
    */
  val pipelineDriftResponse: Q = (s, d) => {
    val all = docs(s, d)
    val side = when(col("doc_id") % 2 === 0, lit("old")).otherwise(lit("new"))
    val base = all.select(col("source"), side.as("__side"),
      size(TextOps.normTokens(col("text"))).cast("long").as("n_toks"),
      TextOps.normTokens(col("text")).as("__toks"))
    val lens = base.groupBy("source").agg(
      round(avg(when(col("__side") === "old", col("n_toks"))), 4)
        .as("len_mean_old"),
      round(avg(when(col("__side") === "new", col("n_toks"))), 4)
        .as("len_mean_new"))
    val vocab = base
      .select(col("source"), col("__side"), explode(col("__toks")).as("w"))
      .groupBy("source", "w").agg(
        max(when(col("__side") === "old", 1).otherwise(0)).as("__o"),
        max(when(col("__side") === "new", 1).otherwise(0)).as("__n"))
      .groupBy("source").agg(
        round(sum(col("__o") * col("__n")).cast("double") /
          count(lit(1)), 6).as("vocab_jaccard"))
    val emb = Tables.embeddings(s, d)
    val isNew = col("vec_id") % 2 =!= 0
    // the drift transform applied in DOUBLE inside the signal — the
    // same arithmetic the oracle replays on the cast array
    val means = emb.select(isNew.as("__new"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("pos", "x")))
      .select(col("__new"), col("pos"),
        when(col("__new"), col("x") * 0.01d + 2.0d)
          .otherwise(col("x")).as("x"))
      .groupBy("pos").agg(
        round(avg(when(!col("__new"), col("x"))), 6).as("mo"),
        round(avg(when(col("__new"), col("x"))), 6).as("mn"))
    val shift = means
      .agg(round(sqrt(sum((col("mo") - col("mn")) *
        (col("mo") - col("mn")))), 6).as("emb_shift"))
    // the store leg: old-snapshot layout, drifted new rows ingested
    // frozen-model — stats answer from the same resolved view probes use
    val drifted = emb.select(col("vec_id"),
      when(isNew, transform(col("embedding"),
        x => x * lit(0.01f) + lit(2.0f)))
        .otherwise(col("embedding")).as("embedding"))
    val dir = Scratch.dir("graft_drift_store")
    val (_, v) = graft.operators.AnnIndex.build(
      drifted.filter(!isNew), dir, nCentroids = 16)
    graft.operators.AnnIndex.ingest(drifted.filter(isNew), dir,
      batchId = 1L, version = v)
    val st = graft.operators.AnnIndex.stats(s, dir, version = v).head()
    val skewExceeded = st.getLong(3).toDouble > 0.25 * st.getLong(0)
    val perSource = lens.join(vocab, "source")
      .crossJoin(broadcast(shift))
      .withColumn("len_exceeded",
        abs(col("len_mean_new") - col("len_mean_old")) >
          col("len_mean_old") * 0.1d)
      .withColumn("vocab_exceeded", col("vocab_jaccard") < 0.5d)
      .withColumn("emb_exceeded", col("emb_shift") > 0.5d)
      .withColumn("skew_exceeded", lit(skewExceeded))
    // one global verdict: any leg fired for any source
    val anyFired = perSource.agg(greatest(
        coalesce(max(when(col("len_exceeded"), 1)).cast("int"), lit(0)),
        coalesce(max(when(col("vocab_exceeded"), 1)).cast("int"), lit(0)),
        coalesce(max(when(col("emb_exceeded"), 1)).cast("int"), lit(0)),
        coalesce(max(when(col("skew_exceeded"), 1)).cast("int"), lit(0)))
      .as("__any"))
    perSource.crossJoin(broadcast(anyFired))
      .withColumn("decision",
        when(col("__any") === 1, lit("retrain")).otherwise(lit("hold")))
      .select("source", "len_mean_old", "len_mean_new", "vocab_jaccard",
        "emb_shift", "len_exceeded", "vocab_exceeded", "emb_exceeded",
        "skew_exceeded", "decision")
      .orderBy("source")
  }

  // Planted image containers, one hex alphabet shared verbatim by the
  // Spark payload builder and the DuckDB oracle so the BYTES are the
  // cross-engine contract (all constants UPPERCASE — both engines' hex()
  // emit uppercase). PNG: signature + IHDR(w,h) + CRC + IEND. JPEG:
  // SOI + APP0/JFIF + SOF0(h,w) + EOI. GIF: screen descriptor (LE dims)
  // + 1..4 image descriptors (each with a 1-byte LZW stream) + trailer.
  private val PngHead = "89504E470D0A1A0A0000000D49484452"
  private val PngTail = "0802000000" + "00000000" +
    "0000000049454E44AE426082"
  private val JpegHead = "FFD8" + "FFE000104A46494600010100000100010000" +
    "FFC0001108"
  private val JpegTail = "03012200021101031101" + "FFD9"
  private val GifHead = "474946383961"
  private val GifFrameHead = "2C00000000"
  private val GifFrameTail = "00" + "02" + "0100" + "00"

  /** The documents table wrapped as a media corpus with REAL planted
    * container bytes — dimensions and (for GIF) frame counts derived
    * deterministically from `doc_id`, payload format rotating
    * PNG / JPEG / GIF / WebP / garbage by `doc_id % 5` (garbage = raw text
    * bytes, exercising the null-out path on real data). The decoder
    * must recover exactly the planted values by PARSING the bytes; the
    * oracle rebuilds the same bytes independently and computes the
    * dimensions by construction.
    */
  // shared byte-building helpers for the planted-container fixtures:
  // hex constants + big/little-endian encodings of computed columns
  private def hx(const: String) = unhex(lit(const))
  private def be(v: org.apache.spark.sql.Column, bytes: Int) =
    unhex(lpad(hex(v), bytes * 2, "0"))
  private def le16(v: org.apache.spark.sql.Column) =
    unhex(concat(lpad(hex(v % 256), 2, "0"),
      lpad(hex((v / 256).cast("int")), 2, "0")))
  private def le32(v: org.apache.spark.sql.Column) =
    unhex(concat(lpad(hex(v % 256), 2, "0"),
      lpad(hex((v / 256).cast("long") % 256), 2, "0"),
      lpad(hex((v / 65536).cast("long") % 256), 2, "0"),
      lpad(hex((v / 16777216).cast("long") % 256), 2, "0")))

  private def plantedMedia(s: SparkSession, d: String): DataFrame = {
    val w = (col("doc_id") % 1000 + 1).cast("int")
    val h = (col("doc_id") % 700 + 1).cast("int")
    val extraFrames = expr("(doc_id % 16) div 4") // 0..3 (GIF rows only)
    val gifFrame = concat(hx(GifFrameHead), le16(w), le16(h), hx(GifFrameTail))
    def gifFrameIf(k: Int) =
      when(extraFrames >= k, gifFrame).otherwise(hx(""))
    val kind = col("doc_id") % 5
    // WebP kind: RIFF("WEBP") + a VP8L chunk holding just the 5-byte
    // header — signature 0x2F, then LSB-first 14-bit (w-1), 14-bit
    // (h-1), alpha 0, version 0, packed into bytes b1..b4; chunk size 5
    // is odd, so one RIFF pad byte follows (container size 18)
    val webp = concat(
      hx("52494646" + "12000000" + "57454250" + "5650384C" +
        "05000000" + "2F"),
      be(expr("doc_id % 1000 % 256"), 1),
      be(expr("(doc_id % 1000) div 256 % 64 + doc_id % 700 % 4 * 64"), 1),
      be(expr("(doc_id % 700) div 4 % 256"), 1),
      be(expr("(doc_id % 700) div 1024 % 16"), 1),
      hx("00"))
    val payload = when(kind === 0,
        concat(hx(PngHead), be(w, 4), be(h, 4), hx(PngTail)))
      .when(kind === 1,
        concat(hx(JpegHead), be(h, 2), be(w, 2), hx(JpegTail)))
      .when(kind === 2,
        concat(hx(GifHead), le16(w), le16(h), hx("000000"),
          gifFrame, gifFrameIf(1), gifFrameIf(2), gifFrameIf(3), hx("3B")))
      .when(kind === 3, webp)
      .otherwise(encode(col("text"), "UTF-8"))
    val mime = when(kind === 0, "image/png").when(kind === 1, "image/jpeg")
      .when(kind === 2, "image/gif").when(kind === 3, "image/webp")
      .otherwise("application/octet-stream")
    Multimodal.asMultimodal(docs(s, d),
      payload = Some(payload), mime = Some(mime))
  }

  /** Real container decode over planted bytes: width/height/frames come
    * from [[Multimodal.Decoder.Headers]] PARSING the payload; the oracle
    * recomputes them by construction and fingerprints the payload bytes
    * through their hex form (`md5(lower(hex(payload)))` — a verification
    * gadget only: DuckDB has no blob md5, and at scale the engine's own
    * byte-md5 from [[Multimodal.extractFeatures]] is the artifact,
    * property-tested in MultimodalSpec). Garbage rows (kind 3) must
    * null out width/height/frames and still fingerprint.
    */
  val multimodalFeatures: Q = (s, d) => {
    val withFp = plantedMedia(s, d).select(col("media_id"), col("payload"),
      md5(lower(hex(col("payload")))).as("payload_hexmd5"))
    Multimodal.extractFeatures(withFp, passthrough = Seq("payload_hexmd5"))
      .select("media_id", "n_bytes", "width", "height", "n_frames",
        "payload_hexmd5")
      .orderBy("media_id")
  }

  val multimodalResize: Q = (s, d) =>
    Multimodal.resizeMeta(
      Multimodal.extractFeatures(plantedMedia(s, d)),
      targetW = 320, targetH = 240)
      .orderBy("media_id")

  val multimodalFrames: Q = (s, d) =>
    Multimodal.sampleFrames(
      Multimodal.extractFeatures(plantedMedia(s, d)), stride = 2)
      .orderBy("media_id", "frame_idx")

  // planted WAV/MP4 container constants — shared verbatim with the
  // DuckDB oracle so a fingerprint match proves byte identity.
  // WAV: 'RIFF' … le32(riffSize) … 'WAVE' 'fmt ' le32(16) fmt=1(le16)
  private val RiffTag = "52494646"
  private val WavFmtHead = "57415645" + "666D7420" + "10000000" + "0100"
  private val WavDataTag = "64617461"
  // MP4: ftyp(isom) box, then moov{mvhd(timescale=1000), trak{tkhd}}
  private val Mp4Head = "00000010" + "66747970" + "69736F6D" + "00000000"
  private val Mp4MoovHead = "00000088" + "6D6F6F76"
  private val Mp4MvhdHead = "0000001C" + "6D766864" +
    "000000000000000000000000" + "000003E8" // ver/flags,times, timescale
  private val Mp4TrakHead = "00000064" + "7472616B"
  private val Mp4TkhdPre = "0000005C" + "746B6864" +
    "000000000000000000000000" + "00000001" + "00000000" // …,trackId,rsvd
  private val Mp4TkhdMid = "0000000000000000" + "00000000" + "00000000" +
    "000100000000000000000000" + "000000000001000000000000" +
    "000000000000000040000000" // rsvd8, layer/alt, vol/rsvd, unity matrix

  /** The documents table wrapped as an AUDIO/VIDEO corpus with real
    * planted container bytes, rotating WAV / MP4 / truncated-WAV /
    * garbage by `doc_id % 4` — the [[plantedMedia]] discipline applied
    * to [[Multimodal.AvHeaders]]: sample rate, channels, bits, duration
    * and dims all derive deterministically from `doc_id`, the oracle
    * rebuilds the same bytes and facts by construction. Kind 2 is a
    * structurally valid RIFF/WAVE prefix with NO chunks (a true
    * truncation, not garbage) — the malformed path must null typed facts
    * while still fingerprinting the bytes.
    */
  private def plantedAvMedia(s: SparkSession, d: String): DataFrame = {
    val ch = (col("doc_id") % 2 + 1).cast("int")
    val bits = (col("doc_id") % 2 * 8 + 8).cast("int")
    val rate = (col("doc_id") % 8 * 1000 + 8000).cast("int")
    val blockAlign = ((ch * bits) / 8).cast("int")
    val byteRate = (rate * blockAlign).cast("int")
    val durSec = (col("doc_id") % 5 + 1).cast("int")
    val dataSize = (byteRate * durSec).cast("int")
    val durMs = ((col("doc_id") % 30 + 1) * 500).cast("int")
    val w = (col("doc_id") % 1920 + 1).cast("int")
    val h = (col("doc_id") % 1080 + 1).cast("int")
    // header-only WAV: the data chunk declares its size (duration math
    // reads headers, as a fast probe does) without materializing samples
    val wav = concat(hx(RiffTag), le32(dataSize + 36), hx(WavFmtHead),
      le16(ch), le32(rate), le32(byteRate), le16(blockAlign), le16(bits),
      hx(WavDataTag), le32(dataSize))
    val mp4 = concat(hx(Mp4Head), hx(Mp4MoovHead),
      hx(Mp4MvhdHead), be(durMs, 4),
      hx(Mp4TrakHead), hx(Mp4TkhdPre), be(durMs, 4), hx(Mp4TkhdMid),
      be(w, 2), hx("0000"), be(h, 2), hx("0000"))
    val kind = col("doc_id") % 4
    val payload = when(kind === 0, wav)
      .when(kind === 1, mp4)
      .when(kind === 2, concat(hx(RiffTag), le32(lit(36)), hx("57415645")))
      .otherwise(encode(col("text"), "UTF-8"))
    val mime = when(kind === 0, "audio/wav").when(kind === 1, "video/mp4")
      .when(kind === 2, "audio/wav").otherwise("application/octet-stream")
    Multimodal.asMultimodal(docs(s, d),
      payload = Some(payload), mime = Some(mime))
  }

  /** Real audio/video container decode over planted bytes
    * ([[Multimodal.AvHeaders]]): WAV fmt-chunk facts + data-declared
    * duration, MP4 mvhd duration + tkhd 16.16 dims — all recovered by
    * PARSING the payload; the oracle recomputes facts and bytes by
    * construction (same md5-over-hex fingerprint gadget as
    * `multimodal_features`). Truncated-WAV and garbage rows must null
    * every typed fact and still fingerprint.
    */
  val multimodalAv: Q = (s, d) => {
    val withFp = plantedAvMedia(s, d).select(col("media_id"), col("payload"),
      md5(lower(hex(col("payload")))).as("payload_hexmd5"))
    Multimodal.extractAvFeatures(withFp, passthrough = Seq("payload_hexmd5"))
      .select("media_id", "n_bytes", "container", "sample_rate", "channels",
        "bits_per_sample", "width", "height", "duration_ms", "payload_hexmd5")
      .orderBy("media_id")
  }

  /** The documents table wrapped as a PIXEL corpus: every non-garbage row
    * carries a REAL compressed PNG — raster values from the closed form
    * `v(i) = (doc_id·31 + i·7) mod 256` over the flattened index, encoded
    * FIXTURE-side by [[PixelCodec.encodePng]] with the scanline filter
    * rotating `(doc_id + y) mod 5` (every inversion path: None/Sub/Up/
    * Average/Paeth) and `idatChunk = 64` (multi-IDAT reassembly exercised
    * on the larger rasters). Color type rotates by `doc_id mod 6` through
    * the four direct layouts (gray/rgb/gray+alpha/rgba), kind 4 an
    * INDEXED (color type 3) image — `doc_id%7+2` PLTE entries whose flat
    * RGB bytes follow the same closed form, indices `(doc_id·31+p·7) mod
    * nE`, and a tRNS covering all but the last entry (alpha
    * `(doc_id·13+j·11) mod 256`, tail opaque) so the decoded raster is
    * the closed-form EXPANSION at 4 channels — and kind 5 garbage
    * (UTF-8 text) that must null every decode fact. Dims stay small
    * (≤13×9) so the DuckDB oracle can re-enumerate every pixel.
    */
  private def plantedPixelMedia(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val kind = (id % 6).toInt
        val w = (id % 13).toInt + 1
        val h = (id % 9).toInt + 1
        val payload: Array[Byte] = kind match {
          case 5 => r.getString(1).getBytes("UTF-8")
          case 4 =>
            // palette (color type 3) with tRNS: indices, palette RGB and
            // alpha all closed-form, so the oracle re-derives the
            // EXPANDED raster; the tRNS covers all but the last entry
            // (the spec's shorter-table-is-opaque path)
            val nE = (id % 7).toInt + 2
            val idx = Array.tabulate(w * h)(p =>
              ((id * 31 + p * 7) % nE).toByte)
            val pal = Array.tabulate(nE * 3)(m =>
              ((id * 31 + m * 7) % 256).toByte)
            val trns = Array.tabulate(nE - 1)(j =>
              ((id * 13 + j * 11) % 256).toByte)
            PixelCodec.encodePngIndexed(w, h, idx, pal, Some(trns),
              filterFor = y => ((id + y) % 5).toInt, idatChunk = 64,
              interlace = id % 7 == 1)
          case _ =>
            val c = Seq(1, 3, 2, 4)(kind) // gray, rgb, gray+alpha, rgba
            val px = Array.tabulate(w * h * c)(i =>
              ((id * 31 + i * 7) % 256).toByte)
            // id%7=1 rows plant ADAM7-interlaced streams — the decoded
            // raster is identical, so the unchanged oracle proves the
            // pass extraction/unfilter/scatter chain byte-exactly
            PixelCodec.encodePng(PixelCodec.Image(w, h, c, px),
              filterFor = y => ((id + y) % 5).toInt, idatChunk = 64,
              interlace = id % 7 == 1)
        }
        Row(id, payload)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** PIXEL-level decode over planted REAL PNGs
    * ([[Multimodal.extractPixelFeatures]]): the engine inflates the
    * payload's deflate stream, inverts the scanline filters, and folds the
    * raster to exact integer stats — plus the same stats over the
    * [[PixelCodec.resizeNearest]] 8×6 resample (decode + resample in one
    * per-partition task). The oracle re-enumerates every pixel (source AND
    * resampled, via the same ⌊t·src/dst⌋ index math) from the planted
    * closed form — a hash match proves the deflate→unfilter→resample chain
    * reproduces every byte at its exact offset (`px_chk` is
    * position-weighted). The indexed kind additionally proves the
    * PLTE/tRNS expansion (its stats run over the EXPANDED raster).
    * Garbage rows (kind 5) null all decode facts.
    */
  val multimodalPixels: Q = (s, d) =>
    Multimodal.extractPixelFeaturesResized(plantedPixelMedia(s, d),
      tw = 8, th = 6)
      .orderBy("media_id")

  /** The documents table wrapped as an audio corpus with REAL PCM WAVs:
    * sign-centered samples from a closed form (8-bit:
    * `(doc_id·17 + s·29) mod 251 − 125`; 16-bit:
    * `(doc_id·23 + s·97) mod 60001 − 30000`), encoded fixture-side by
    * [[PixelCodec.encodeWavPcm]]. Kind 2 is a valid WAV with its last
    * sample bytes cut off (a data-chunk truncation the SAMPLE decode must
    * reject — the header-only probe of `multimodal_av` accepts declared
    * sizes, this tier reads the samples); kind 3 is garbage.
    */
  private def plantedPcmMedia(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload: Array[Byte] = (id % 4).toInt match {
          case 3 => r.getString(1).getBytes("UTF-8")
          case 2 =>
            PixelCodec.encodeWavPcm(PixelCodec.Pcm(8000, 1, 16,
              Array.tabulate(8)(i => i * 100 - 350))).dropRight(2)
          case _ =>
            val ch = (id % 2).toInt + 1
            val bits = (((id / 2) % 2) * 8 + 8).toInt
            val rate = 8000 + ((id % 7) * 500).toInt
            val n = ((id % 41) + 10).toInt * ch
            val samples = Array.tabulate(n) { i =>
              if (bits == 8) ((id * 17 + i * 29) % 251).toInt - 125
              else ((id * 23 + i * 97) % 60001).toInt - 30000
            }
            PixelCodec.encodeWavPcm(PixelCodec.Pcm(rate, ch, bits, samples))
        }
        Row(id, payload)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** The documents table wrapped as a VIDEO corpus with real ISO-BMFF
    * sample AND chunk tables: each MP4 carries a full
    * `moov/trak/mdia/minf/stbl/{stsz,stsc,stco}` chain plus K =
    * `doc_id%3 + 2` REAL `mdat` runs holding the chunk data, built
    * fixture-side from closed-form frame sizes — kind 0 plants the
    * per-sample size table (`size(i) = (doc_id·13 + i·7) mod 900 +
    * 100`), kind 1 the uniform `sample_size` form, kind 2 garbage (zero
    * frames addressable). The stsc maps `n div K` samples into each of
    * the first K-1 chunks and the remainder into the last (two runs);
    * the stco offsets point at the actual mdat payload bytes, so every
    * chunk boundary inserts an 8-byte mdat header gap — a contiguous
    * prefix-sum of sizes addresses the WRONG bytes everywhere past the
    * first chunk, which is exactly what the oracle distinguishes.
    */
  private def plantedMp4Media(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
      def box(typ: String, payload: Array[Byte]) =
        be32(8 + payload.length) ++ typ.getBytes(ascii) ++ payload
      def hexB(str: String) =
        str.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      rows.map { r =>
        val id = r.getLong(0)
        val payload: Array[Byte] = (id % 3).toInt match {
          case 2 => r.getString(1).getBytes("UTF-8")
          case kind =>
            val n = (id % 24).toInt + 8
            val k = (id % 3).toInt + 2 // chunk count (kind 0 -> 2, 1 -> 3)
            val spc = n / k            // samples per non-final chunk
            val durMs = ((id % 30) + 1).toInt * 500
            val w = (id % 1920).toInt + 1
            val h = (id % 1080).toInt + 1
            val sizes = Array.tabulate(n)(i =>
              if (kind == 1) (id % 500).toInt + 50
              else ((id * 13 + i * 7) % 900).toInt + 100)
            val stsz =
              if (kind == 1) be32(0) ++ be32(sizes(0)) ++ be32(n)
              else be32(0) ++ be32(0) ++ be32(n) ++ sizes.flatMap(be32)
            // two stsc runs: chunks 1..K-1 hold spc samples, chunk K the
            // remainder (n - spc·(K-1) >= spc >= 1 by construction)
            val stsc = be32(0) ++ be32(2) ++
              (be32(1) ++ be32(spc) ++ be32(1)) ++
              (be32(k) ++ be32(n - spc * (k - 1)) ++ be32(1))
            // sync samples every g-th frame (1-based sample numbers) —
            // the stss table a keyframe-aware sampler consumes
            val g = (id % 4).toInt + 2
            val syncNums = (0 until n by g).map(_ + 1)
            val stss = be32(0) ++ be32(syncNums.length) ++
              syncNums.toArray.flatMap(be32)
            val chunkFirst = Array.tabulate(k)(c => c * spc) :+ n
            val chunkBytes = Array.tabulate(k)(c =>
              (chunkFirst(c) until chunkFirst(c + 1)).map(sizes(_)).sum)
            val tkhd = box("tkhd",
              hexB("000000000000000000000000" + "00000001" + "00000000") ++
                be32(durMs) ++
                hexB("0000000000000000" + "00000000" + "00000000" +
                  "000100000000000000000000" + "000000000001000000000000" +
                  "000000000000000040000000") ++
                Array[Byte]((w >>> 8).toByte, w.toByte, 0, 0,
                  (h >>> 8).toByte, h.toByte, 0, 0))
            val mvhd = box("mvhd",
              hexB("000000000000000000000000" + "000003E8") ++ be32(durMs))
            def moov(stcoVals: Array[Int]) = {
              val stco = be32(0) ++ be32(k) ++ stcoVals.flatMap(be32)
              box("moov", mvhd ++ box("trak", tkhd ++
                box("mdia", box("minf", box("stbl",
                  box("stsz", stsz) ++ box("stsc", stsc) ++
                    box("stco", stco) ++ box("stss", stss))))))
            }
            val ftypB = box("ftyp", "isom".getBytes(ascii) ++ be32(0))
            // stco values depend on the moov length but not vice versa
            // (offsets are fixed-width): measure with zeros, then fill
            val moovLen = moov(Array.fill(k)(0)).length
            val offs = new Array[Int](k)
            var pos = ftypB.length + moovLen
            for (c <- 0 until k) { offs(c) = pos + 8; pos += 8 + chunkBytes(c) }
            val mdats = (0 until k).map(c => box("mdat",
              Array.tabulate(chunkBytes(c))(b => ((id + b) % 251).toByte)))
              .reduce(_ ++ _)
            ftypB ++ moov(offs) ++ mdats
        }
        Row(id, payload)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** REAL MP4 frame addressing ([[Multimodal.extractMp4Frames]]): walk
    * each payload's box chain to its stsz sample table, prefix-sum the
    * frame sizes into byte offsets, and emit every 3rd frame's
    * (index, bytes, offset) — the fetch plan a downstream decoder
    * consumes, produced without decoding a single frame. The oracle
    * re-derives sizes from the planted closed form (both stsz forms) and
    * replays the prefix sum as a window; garbage rows address nothing.
    */
  val multimodalMp4Frames: Q = (s, d) =>
    Multimodal.extractMp4Frames(plantedMp4Media(s, d), stride = 3)
      .orderBy("media_id", "frame_idx")

  /** Keyframe-aware MP4 sampling ([[Multimodal.extractMp4Keyframes]]):
    * the sampling universe is the `stss` sync-sample table — the frames
    * a fetch can decode WITHOUT reading back to a previous keyframe —
    * and every 2nd sync sample emits its true (offset, length) address.
    * The fixture plants sync samples every g-th frame (g = id%4+2); the
    * oracle replays the closed form, filters to the sync set, and
    * strides by sync rank. Garbage rows address nothing.
    */
  val multimodalMp4Keyframes: Q = (s, d) =>
    Multimodal.extractMp4Keyframes(plantedMp4Media(s, d), stride = 2)
      .orderBy("media_id", "frame_idx")

  /** The documents table wrapped as a JPEG image corpus: two producers
    * and three profiles — OUR baseline encoder (gray with restart
    * intervals, arbitrary-color 4:4:4), the JDK's ImageIO writer
    * sequential (gray, and color which it always 4:2:0-subsamples —
    * those rows carry gray-content RGB so flat chroma keeps the
    * cross-decoder comparison upsample-filter-independent), and the
    * ImageIO writer PROGRESSIVE (SOF2 gray + flat-chroma color, the
    * full IJG progression script with successive approximation). Kind 4
    * is garbage.
    */
  private def plantedJpegMedia(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      def imageIoJpeg(w: Int, h: Int, c: Int, px: Array[Byte],
                      q: Float, progressive: Boolean = false): Array[Byte] = {
        val t = if (c == 1) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
          else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
        val awt = new java.awt.image.BufferedImage(w, h, t)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < c) {
              awt.getRaster.setSample(x, y, b, px((y * w + x) * c + b) & 0xff)
              b += 1
            }
            x += 1
          }
          y += 1
        }
        val wr = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpeg").next()
        val p = wr.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(q)
        if (progressive)
          p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
        val bos = new java.io.ByteArrayOutputStream()
        wr.setOutput(
          new javax.imageio.stream.MemoryCacheImageOutputStream(bos))
        wr.write(null, new javax.imageio.IIOImage(awt, null, null), p)
        wr.dispose()
        bos.toByteArray
      }
      rows.map { r =>
        val id = r.getLong(0)
        val kind = (id % 7).toInt
        val w = (id % 21).toInt + 1
        val h = (id % 13).toInt + 1
        def grayPx = Array.tabulate(w * h)(i =>
          ((id * 31 + i * 7) % 256).toByte)
        def colorPx = Array.tabulate(w * h * 3)(i =>
          ((id * 31 + i * 7) % 256).toByte)
        // gray-content RGB: Cb = Cr = 128 exactly, upsampler-proof
        def flatChromaPx = Array.tabulate(w * h * 3)(i =>
          ((id * 17 + (i / 3) * 11) % 256).toByte)
        val q = 40 + (id % 56).toInt
        val payload: Array[Byte] = kind match {
          case 0 => graft.operators.JpegCodec.encodeJpeg(
            graft.operators.PixelCodec.Image(w, h, 1, grayPx), quality = q,
            restartInterval = (id % 4).toInt)
          case 1 => graft.operators.JpegCodec.encodeJpeg(
            graft.operators.PixelCodec.Image(w, h, 3, colorPx), quality = q,
            sampling = (1, 1))
          case 2 => imageIoJpeg(w, h, 1, grayPx, q / 100.0f)
          case 3 => imageIoJpeg(w, h, 3, flatChromaPx, q / 100.0f)
          // PROGRESSIVE (SOF2): the JDK writer's IJG-style progression
          // script — DC first+refinement, per-component AC bands with
          // successive approximation
          case 5 => imageIoJpeg(w, h, 1, grayPx, q / 100.0f,
            progressive = true)
          case 6 => imageIoJpeg(w, h, 3, flatChromaPx, q / 100.0f,
            progressive = true)
          case _ => r.getString(1).getBytes("UTF-8")
        }
        Row(id, payload)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** Trainable curation ([[graft.operators.QualityClassifier]]): distill
    * the heuristic quality gate into a logistic model by DISTRIBUTED
    * Newton/IRLS — labels are `qualityScore ≥ 0.6` on the TRAIN split
    * (`doc_id % 5 ≠ 0`), each of the 8 iterations is one
    * map-side-combined gradient+Hessian aggregate over a
    * checkpoint-cached narrow frame (the raw corpus is scanned once),
    * and scoring is a pure literal-weighted scan expression. The
    * distilled threshold is linear in the engineered basis, so the
    * verifiable claim is tight: ≥ 0.95 accuracy on BOTH splits,
    * including the held-out one the trainer never saw. Split sizes and
    * the label prior replay closed-form in the oracle.
    */
  val textQualityClassifier: Q = (s, d) => {
    val corpus = docs(s, d)
    val label = TextOps.qualityScore(col("text")) >= 0.6
    val model = graft.operators.QualityClassifier.train(
      graft.operators.QualityClassifier.featurize(
        corpus.filter(col("doc_id") % 5 =!= 0), col("text"), label))
    val scored = corpus.select(
      (col("doc_id") % 5 === 0).as("is_test"),
      label.as("y"),
      graft.operators.QualityClassifier.predict(model, col("text"))
        .as("pred"))
    val row = scored.agg(
      sum(when(!col("is_test"), 1L)).as("n_train"),
      sum(when(col("is_test"), 1L)).as("n_test"),
      sum(when(col("y"), 1L)).as("n_pos"),
      avg(when(!col("is_test"), (col("pred") === col("y")).cast("int")
        .cast("double"))).as("train_acc"),
      avg(when(col("is_test"), (col("pred") === col("y")).cast("int")
        .cast("double"))).as("test_acc")).head()
    s.range(1).select(
      lit(row.getLong(0)).as("n_train"),
      lit(row.getLong(1)).as("n_test"),
      lit(row.getLong(2)).as("n_pos"),
      lit(row.getDouble(3) >= 0.95).as("train_acc_ok"),
      lit(row.getDouble(4) >= 0.95).as("test_acc_ok"))
  }

  /** The documents table wrapped as a GIF corpus: palette indices and
    * RGB palette entries from closed forms, LZW-compressed fixture-side
    * by [[graft.operators.GifCodec.encodeGif]] — kind 0 plain, kind 1
    * interlaced, kind 2 a 256-entry palette over a larger raster (the
    * dictionary-growth stress), kind 3 garbage.
    */
  private[graft] def plantedGifMedia(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val kind = (id % 4).toInt
        val payload: Array[Byte] = kind match {
          case 3 => r.getString(1).getBytes("UTF-8")
          case k =>
            val nE = if (k == 2) 256 else (id % 51).toInt + 2
            val w = if (k == 2) (id % 20).toInt + 16 else (id % 19).toInt + 1
            val h = if (k == 2) (id % 12).toInt + 10 else (id % 11).toInt + 1
            val idx = Array.tabulate(w * h)(p =>
              ((id * 31 + p * 7) % nE).toByte)
            val pal = Array.tabulate(nE * 3)(m =>
              ((id * 13 + m * 5) % 256).toByte)
            graft.operators.GifCodec.encodeGif(w, h, idx, pal,
              interlace = k == 1)
        }
        Row(id, payload)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** GIF LZW decode over planted REAL GIFs
    * ([[Multimodal.extractGifFeatures]], [[graft.operators.GifCodec]]):
    * variable-width LZW decode (growth to 12 bits on the 256-entry
    * kind), palette expansion and 4-pass deinterlace, folded to exact
    * integer stats. The oracle re-enumerates every expanded RGB byte
    * from the planted closed forms — `px_chk` is position-weighted, so
    * the hash match proves byte-AND-offset fidelity (a deinterlace slip
    * or LZW drift anywhere breaks it). Garbage rows null every fact.
    */
  val multimodalGif: Q = (s, d) =>
    Multimodal.extractGifFeatures(plantedGifMedia(s, d))
      .orderBy("media_id")

  /** The documents table wrapped as a WebP corpus — REAL VP8L
    * bitstreams from [[graft.operators.WebpCodec.encodeWebpLossless]],
    * pixels from closed forms, one kind per decoder feature
    * (doc_id % 6): 0 simple-coded literals (even ids wrapped in a VP8X
    * chunk — the container walk), 1 normal (code-length-coded) prefix
    * codes + an LZ77 backref copying row 0 down the raster (linear
    * distance = w), 2 color cache (cache_bits 4, hits emitted exactly
    * where the decoder-side cache will hold the pixel), 3
    * subtract-green transform (stored red/blue collapse to constants,
    * final values g-dependent), 4 garbage bytes, 5 the HONEST-REJECTION
    * pair — lossy `VP8 ` container (id ≡ 5 mod 12) or a VP8L stream
    * whose backref uses a close-neighborhood plane code (≡ 11 mod 12);
    * both must null, never mis-decode.
    */
  private def plantedWebpMedia(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        import graft.operators.WebpCodec
        val id = r.getLong(0)
        val kind = (id % 6).toInt
        val w = (id % 14).toInt + 2
        val h = (id % 9).toInt + 2
        val g0 = ((id * 11 + 3) % 256).toInt
        val g1 = ((id * 11 + 100) % 256).toInt
        def g(p: Int) = if ((id + p) % 2 == 0) g0 else g1
        val r0 = ((id * 13) % 256).toInt
        val b0 = ((id * 17) % 256).toInt
        val a0 = ((id * 19) % 256).toInt
        def px(a: Int, rr: Int, gg: Int, bb: Int) =
          (a << 24) | (rr << 16) | (gg << 8) | bb
        val payload: Array[Byte] = kind match {
          case 0 =>
            val toks = (0 until w * h)
              .map(p => WebpCodec.Lit(px(a0, r0, g(p), b0)))
            WebpCodec.encodeWebpLossless(w, h, toks, wrapVp8x = id % 2 == 0)
          case 1 =>
            def gk(k: Int) = ((id * 29 + k * 53) % 256).toInt
            val row0 = (0 until w).map(x =>
              WebpCodec.Lit(px(a0, r0, gk(((id + x) % 4).toInt), b0)))
            WebpCodec.encodeWebpLossless(w, h,
              row0 :+ WebpCodec.Ref((h - 1) * w, w + 120))
          case 2 =>
            val cache = new Array[Int](16)
            val toks = (0 until w * h).map { p =>
              val v = px(a0, r0, g(p), b0)
              val slot = WebpCodec.cacheSlot(v, 4)
              if (cache(slot) == v) WebpCodec.Hit(slot)
              else { cache(slot) = v; WebpCodec.Lit(v) }
            }
            WebpCodec.encodeWebpLossless(w, h, toks, cacheBits = 4)
          case 3 =>
            val toks = (0 until w * h).map { p =>
              val gg = g(p)
              WebpCodec.Lit(px(255, ((gg + id * 7) % 256).toInt, gg,
                ((gg + id * 3) % 256).toInt))
            }
            WebpCodec.encodeWebpLossless(w, h, toks, subtractGreen = true)
          case 4 => r.getString(1).getBytes("UTF-8")
          case _ =>
            if (id % 12 == 5) WebpCodec.lossyStub(4, 4)
            else WebpCodec.encodeWebpLossless(2, 2,
              Seq(WebpCodec.Lit(px(255, 1, 2, 3)), WebpCodec.Ref(3, 2)))
        }
        Row(id, payload)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** WebP lossless decode over planted REAL VP8L bitstreams
    * ([[Multimodal.extractWebpFeatures]],
    * [[graft.operators.WebpCodec]]): RIFF/VP8X walk, simple AND
    * code-length-coded canonical prefix codes, LZ77 with the
    * length/distance prefix coding, the color cache and subtract-green
    * — folded to exact integer stats over the RGBA raster. The oracle
    * re-enumerates every byte from the planted closed forms
    * (position-weighted `px_chk`: a bit slip anywhere in the entropy
    * decode breaks it). Garbage, lossy-VP8 and close-neighborhood-
    * distance rows must null every fact — the codec rejects what it
    * cannot decode EXACTLY, never guesses.
    */
  val multimodalWebp: Q = (s, d) =>
    Multimodal.extractWebpFeatures(plantedWebpMedia(s, d))
      .orderBy("media_id")

  /** The documents table as a SCANNED-DOCUMENT corpus of real TIFFs
    * ([[graft.operators.TiffCodec]] fixture encoder) — doc_id % 8
    * rotates the decode contract: gray8 II uncompressed; RGB MM in
    * two strips; RGB II LZW + predictor 2; gray8 WhiteIsZero MM
    * PackBits (the inversion verified, not just the expansion);
    * palette II with a closed-form 16-bit ColorMap; bilevel MM
    * WhiteIsZero packed rows; RGB II Adobe-deflate in 2-row strips;
    * and the named rejections (JPEG-in-TIFF, CCITT fax, tiled,
    * garbage) rotating on (doc_id / 8) % 4 — a selector independent
    * of the % 8 kind arm, so all four rejections are actually
    * planted (doc_id % 8 == 7 pins doc_id % 4 to 3). Every decoded
    * raster is a closed form the oracle re-enumerates pixel by pixel.
    */
  private def plantedTiffMedia(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        import graft.operators.TiffCodec
        val id = r.getLong(0)
        val w = (id % 13).toInt + 1
        val h = (id % 9).toInt + 1
        def gray = Array.tabulate(w * h)(i => ((id * 31 + i * 7) % 256).toByte)
        def rgb = Array.tabulate(w * h * 3)(i => ((id * 31 + i * 7) % 256).toByte)
        val payload: Array[Byte] = (id % 8).toInt match {
          case 0 => TiffCodec.encodeTiff(w, h, 1, 1, gray)
          case 1 => TiffCodec.encodeTiff(w, h, 3, 2, rgb,
            bigEndian = true, rowsPerStrip = (h + 1) / 2)
          case 2 => TiffCodec.encodeTiff(w, h, 3, 2, rgb,
            compression = 5, predictor = 2)
          case 3 => TiffCodec.encodeTiff(w, h, 1, 0, gray,
            bigEndian = true, compression = 32773)
          case 4 =>
            val ne = (id % 7).toInt + 2
            val idx = Array.tabulate(w * h)(p => ((id * 31 + p * 7) % ne).toByte)
            // entries past ne replicate entry 0 — only planted indices
            // are ever read, but the table must be full-length
            val cm = Array.tabulate(3 * 256) { m =>
              val c = m / 256; val e = m % 256
              (((id * 13 + c * 5 + (e % ne) * 11) % 256) * 257).toInt
            }
            TiffCodec.encodeTiff(w, h, 1, 3, idx, colorMap = cm)
          case 5 =>
            val rowBytes = (w + 7) / 8
            val bits = new Array[Byte](rowBytes * h)
            for (y <- 0 until h; x <- 0 until w)
              if ((id + x + y) % 3 == 0)
                bits(y * rowBytes + (x >> 3)) =
                  (bits(y * rowBytes + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
            TiffCodec.encodeTiff(w, h, 1, 0, bits, bigEndian = true,
              bps = 1)
          case 6 => TiffCodec.encodeTiff(w, h, 3, 2, rgb,
            compression = 8, rowsPerStrip = 2)
          case _ => ((id / 8) % 4).toInt match {
            case 0 => TiffCodec.encodeTiff(w, h, 1, 1, gray,
              compressionTagOverride = 7)
            case 1 => TiffCodec.encodeTiff(w, h, 1, 1, gray,
              compressionTagOverride = 4)
            case 2 => TiffCodec.encodeTiff(w, h, 1, 1, gray,
              tileTag = true)
            case _ => r.getString(1).getBytes("UTF-8")
          }
        }
        Row(id, payload)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** TIFF decode (`multimodal_tiff`) — the scanned-document container
    * folded to exact integer stats ([[Multimodal.extractTiffFeatures]]):
    * strip walk, LZW/deflate/PackBits, predictor inversion,
    * WhiteIsZero inversion, palette expansion, bilevel bit expansion —
    * each proven byte-exact against the planted closed form — and the
    * named rejections (`jpeg`, `ccitt`, `tiled`, `malformed`) counted
    * relationally in `err` instead of vanishing into nulls.
    */
  val multimodalTiff: Q = (s, d) =>
    Multimodal.extractTiffFeatures(plantedTiffMedia(s, d))
      .orderBy("media_id")

  /** The documents table as an MP3 corpus ([[graft.operators.Mp3Codec]]
    * fixture encoder) — doc_id % 8 rotates the frame-walk contract:
    * MPEG1 44.1k stereo CBR with ALTERNATING padding bits (a wrong
    * padding term desyncs the walk — the count is the proof), an
    * ID3v2-prefixed mono CBR, an ID3v1-trailed MPEG2 CBR, headerless
    * VBR (bitrate rotates per frame), a Xing-tagged VBR with a
    * declared frame count, MPEG2.5 narrowband mono, the full
    * real-world sandwich (ID3v2 + Info tag + ID3v1), and the named
    * rejections (free-format, Layer II, truncated final frame,
    * garbage) rotating on (doc_id / 8) % 4 — independent of the % 8
    * kind arm so every rejection sub-kind is actually planted.
    */
  private def plantedMp3Media(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        import graft.operators.Mp3Codec
        val id = r.getLong(0)
        val n = (id % 20).toInt + 5
        val payload: Array[Byte] = (id % 8).toInt match {
          case 0 => Mp3Codec.encodeMp3("1", 44100, mono = false,
            Seq.fill(n)(128), paddingFor = _ % 2 == 1)
          case 1 => Mp3Codec.encodeMp3("1", 32000, mono = true,
            Seq.fill(n)(64), id3v2Size = (id % 100).toInt + 10)
          case 2 => Mp3Codec.encodeMp3("2", 22050, mono = false,
            Seq.fill(n)(64), id3v1 = true)
          case 3 => Mp3Codec.encodeMp3("1", 44100, mono = false,
            (0 until n).map(f => Seq(128, 160, 192)(f % 3)))
          case 4 => Mp3Codec.encodeMp3("1", 44100, mono = false,
            Seq.fill(n)(128), xingFrames = n - 1)
          case 5 => Mp3Codec.encodeMp3("2.5", 8000, mono = true,
            Seq.fill(n)(40))
          case 6 => Mp3Codec.encodeMp3("1", 48000, mono = false,
            Seq.fill(n)(160), id3v2Size = (id % 100).toInt + 10,
            id3v1 = true, xingFrames = n, infoTag = true)
          case _ => ((id / 8) % 4).toInt match {
            case 0 => Array[Byte](0xFF.toByte, 0xFB.toByte, 0x00, 0x00)
            case 1 => Array[Byte](0xFF.toByte, 0xFD.toByte, 0x92.toByte,
              0x00)
            case 2 => Mp3Codec.encodeMp3("1", 44100, mono = false,
              Seq.fill(2)(128)).dropRight(10)
            case _ => r.getString(1).getBytes("UTF-8")
          }
        }
        Row(id, payload)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** The documents table as FRAGMENTED MP4s (the DASH/HLS segment
    * shape) — doc_id % 4 rotates the addressing contract: per-sample
    * trun sizes under `default-base-is-moof`, a tfhd default size
    * with an EXPLICIT absolute base-data-offset, a trex default out
    * of `moov/mvex` (the init-segment defaults), and garbage. Sample
    * data bytes follow one closed form in GLOBAL data order, so the
    * read-back stats prove every resolved offset.
    */
  private def plantedFmp4Media(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val kind = (id % 4).toInt
        def be32(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
          (v >>> 8).toByte, v.toByte)
        def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
        def box(typ: String, body: Array[Byte]): Array[Byte] =
          be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
        val payload: Array[Byte] =
          if (kind == 3) r.getString(1).getBytes("UTF-8")
          else {
            val nFrag = (id % 3).toInt + 2
            val perFrag = (id % 5).toInt + 3
            def sizeOf(sGlobal: Int): Int = kind match {
              case 0 => ((id * 13 + sGlobal * 7) % 120).toInt + 8
              case 1 => (id % 50).toInt + 20
              case _ => (id % 40).toInt + 16
            }
            val out = new java.io.ByteArrayOutputStream()
            out.write(box("ftyp",
              "isom".getBytes("US-ASCII") ++ be32(0)))
            if (kind == 2) {
              val trex = box("trex", be32(0) ++ be32(1) ++ be32(1) ++
                be32(0) ++ be32((id % 40) + 16) ++ be32(0))
              out.write(box("moov", box("mvex", trex)))
            }
            var g = 0L
            var sGlobal = 0
            for (f <- 0 until nFrag) {
              val sizes = (0 until perFrag).map(k => sizeOf(sGlobal + k))
              val mfhd = box("mfhd", be32(0) ++ be32(f + 1L))
              val (tfhd, trun) = kind match {
                case 0 =>
                  (box("tfhd", be32(0x020000) ++ be32(1)),
                    box("trun", be32(0x000201) ++ be32(perFrag) ++
                      be32(0 /* patched below */) ++
                      sizes.flatMap(sz => be32(sz)).toArray))
                case 1 =>
                  (null, // needs the absolute base — built below
                    box("trun", be32(0x000001) ++ be32(perFrag) ++
                      be32(0)))
                case _ =>
                  (box("tfhd", be32(0x020000) ++ be32(1)),
                    box("trun", be32(0x000001) ++ be32(perFrag) ++
                      be32(0 /* patched below */)))
              }
              val fragBytes = sizes.sum
              if (kind == 1) {
                // explicit absolute base: compute the moof size with a
                // 28-byte tfhd, then point base at the mdat payload
                val tfhdSz = 28
                val moofSz = 8 + mfhd.length + (8 + tfhdSz + trun.length)
                val base = out.size().toLong + moofSz + 8
                val tfhd1 = box("tfhd", be32(0x000011) ++ be32(1) ++
                  be64(base) ++ be32((id % 50) + 20))
                val traf = box("traf", tfhd1 ++ trun)
                out.write(box("moof", mfhd ++ traf))
              } else {
                // default-base-is-moof: data_offset = moof size + 8
                val traf = box("traf", tfhd ++ trun)
                val moof = box("moof", mfhd ++ traf)
                val dataOff = moof.length + 8
                // patch the trun's data_offset in place (it sits 16
                // bytes into the trun box, whose position is fixed)
                // moof hdr(8) + mfhd + traf hdr(8) + tfhd = trun start
                val trunAt = 8 + mfhd.length + 8 + tfhd.length
                val patched = moof.clone()
                be32(dataOff.toLong).copyToArray(patched, trunAt + 16)
                out.write(patched)
              }
              val data = new Array[Byte](fragBytes)
              var b = 0
              while (b < fragBytes) {
                data(b) = ((id * 7 + g * 3) % 256).toByte
                g += 1; b += 1
              }
              out.write(box("mdat", data))
              sGlobal += perFrag
            }
            out.toByteArray
          }
        Row(id, payload)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** Fragmented-MP4 walk (`multimodal_fmp4`,
    * [[Multimodal.extractFmp4Features]]): the DASH/HLS fragment
    * addressing — trex/tfhd/trun default resolution, base-data-offset
    * vs default-base-is-moof, ascending mfhd sequence — proven by
    * reading the sample bytes back at the resolved offsets against
    * one global closed form.
    */
  val multimodalFmp4: Q = (s, d) =>
    Multimodal.extractFmp4Features(plantedFmp4Media(s, d))
      .orderBy("media_id")

  /** MP3 frame walk (`multimodal_mp3`) — headers-only audio
    * budgeting ([[Multimodal.extractMp3Features]]): frame counts,
    * rates, CBR/VBR mode, Xing/Info declared counts, exact integer
    * duration, and the named rejections counted relationally.
    */
  val multimodalMp3: Q = (s, d) =>
    Multimodal.extractMp3Features(plantedMp3Media(s, d))
      .orderBy("media_id")

  /** A MIXED lossless media corpus for the end-to-end multimodal
    * pipeline: doc_id % 4 rotates PNG (RGB, varied scanline filters) /
    * GIF (palette) / WebP (VP8L simple) / garbage, every pixel from a
    * closed form so the embedding a decode+resize derives is
    * oracle-replayable to the bit. (JPEG stays out by design: it is
    * the one lossy codec in the family, and this chain's contract is
    * exact replay — its cross-decoder tolerance gate lives in
    * `multimodal_jpeg`.)
    */
  private def plantedEmbedMedia(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        import graft.operators.WebpCodec
        val id = r.getLong(0)
        val w = (id % 13).toInt + 4
        val h = (id % 9).toInt + 4
        val payload: Array[Byte] = (id % 4).toInt match {
          case 0 =>
            val px = Array.tabulate(w * h * 3)(i =>
              ((id * 31 + i * 7) % 256).toByte)
            PixelCodec.encodePng(PixelCodec.Image(w, h, 3, px),
              filterFor = y => ((id + y) % 5).toInt, idatChunk = 64)
          case 1 =>
            val nE = (id % 51).toInt + 2
            val idx = Array.tabulate(w * h)(p =>
              ((id * 31 + p * 7) % nE).toByte)
            val pal = Array.tabulate(nE * 3)(m =>
              ((id * 13 + m * 5) % 256).toByte)
            graft.operators.GifCodec.encodeGif(w, h, idx, pal,
              interlace = false)
          case 2 =>
            val g0 = ((id * 11 + 3) % 256).toInt
            val g1 = ((id * 11 + 100) % 256).toInt
            val r0 = ((id * 13) % 256).toInt
            val b0 = ((id * 17) % 256).toInt
            val a0 = ((id * 19) % 256).toInt
            val toks = (0 until w * h).map { p =>
              val gg = if ((id + p) % 2 == 0) g0 else g1
              WebpCodec.Lit((a0 << 24) | (r0 << 16) | (gg << 8) | b0)
            }
            WebpCodec.encodeWebpLossless(w, h, toks)
          case _ => r.getString(1).getBytes("UTF-8")
        }
        Row(id, payload)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** END-TO-END multimodal pipeline (`pipeline_multimodal`) — the
    * training-data shape the codec tier and the ANN store exist to
    * serve TOGETHER, previously never composed in one query: decode
    * the mixed PNG/GIF/WebP corpus ([[Multimodal.extractEmbeddings]] —
    * one task decodes, resizes to 4×4 and featurizes to a 16-dim
    * gray-sum vector), drop undecodable rows (garbage can never enter
    * the index), BUILD the persisted ANN store on the even half,
    * INGEST the odd half frozen-model, then PROBE it for every media
    * id < 6 in the parity configuration — so the answer is provably
    * the exact cosine top-5 over the decoded corpus, and the oracle
    * replays the ENTIRE chain: closed-form pixels → nearest-neighbor
    * resample indices → gray-sums → cosine ranking. Scale shape: one
    * decode pass (map-only), the store lifecycle's bounded aggregates,
    * and a probe that touches only its shortlist.
    */
  val pipelineMultimodal: Q = (s, d) => {
    val emb = Multimodal.extractEmbeddings(plantedEmbedMedia(s, d))
    val vecs = graft.plans.LazyCheckpoint.shared(
      emb.filter(col("embedding").isNotNull)
        .select(col("media_id").as("vec_id"), col("embedding")))
    val dir = Scratch.dir("graft_mm_ann")
    val (_, v) = graft.operators.AnnIndex.build(
      vecs.filter(col("vec_id") % 2 === 0), dir, nCentroids = 8)
    graft.operators.AnnIndex.ingest(vecs.filter(col("vec_id") % 2 =!= 0),
      dir, batchId = 1L, version = v)
    val queries = vecs.filter(col("vec_id") < 6)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    graft.operators.AnnIndex.probe(s, dir, queries, vecs, k = 5,
        nprobe = 8, rerank = 1 << 20, version = v)
      .select(col("q_id"), col("neighbor_id"),
        col("rank").cast("int").as("rank"))
      .orderBy("q_id", "neighbor_id")
  }

  /** Baseline JPEG decode over planted REAL JPEGs
    * ([[Multimodal.extractJpegFeatures]], [[graft.operators.JpegCodec]]):
    * the engine Huffman-decodes every MCU, dequantizes, IDCTs and color
    * converts — and, JPEG being lossy, the oracle pins what IS exactly
    * checkable: dimensions/channels from the planted closed form plus
    * the `agree_ok` gate, which holds only if the engine's raster stays
    * within [[graft.operators.JpegCodec.Tolerance]] counts of the JDK's
    * independent decoder on every sample of every payload (entropy or
    * coefficient bugs blow this up by orders of magnitude). Covers both
    * producers, restart markers, 4:4:4 color and the JDK writer's
    * 4:2:0; garbage rows null every fact.
    */
  val multimodalJpeg: Q = (s, d) =>
    Multimodal.extractJpegFeatures(plantedJpegMedia(s, d))
      .select("media_id", "width", "height", "channels", "agree_ok")
      .orderBy("media_id")

  /** SAMPLE-level audio decode over planted REAL WAVs
    * ([[Multimodal.extractPcmFeatures]]): the engine decodes every PCM
    * sample (8-bit recentered / 16-bit LE signed) and folds energy, peak
    * and per-channel zero-crossings; the oracle re-enumerates the waveform
    * from the planted closed form. Truncated-data (kind 2) and garbage
    * (kind 3) rows must null every fact — sample decode REJECTS what the
    * header probe tolerates.
    */
  val multimodalPcm: Q = (s, d) =>
    Multimodal.extractPcmFeatures(plantedPcmMedia(s, d))
      .select("media_id", "sample_rate", "channels", "bits", "n_samples",
        "s_sum", "s_sumsq", "zero_cross", "peak")
      .orderBy("media_id")

  /** The documents table wrapped as a TELEPHONY audio corpus: real
    * G.711 mu-law WAVs (format 7, 8-bit companded storage) whose raw
    * code bytes come from the closed formula
    * `b(i) = (doc_id·31 + i·7) mod 256`; doc_id ≡ 2 (mod 3) rows carry
    * garbage. The oracle re-runs the CCITT expand — complement,
    * mantissa/segment split, bias — in SQL integer math over every
    * byte, so the stat hash proves the companded decode bit-exactly.
    */
  private def plantedMulawMedia(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload: Array[Byte] = if (id % 3 == 2)
          r.getString(1).getBytes("UTF-8")
        else {
          val ch = (id % 2).toInt + 1
          val rate = 8000 + ((id % 5) * 500).toInt
          val n = ((id % 37) + 10).toInt * ch
          PixelCodec.encodeWavMulaw(rate, ch,
            Array.tabulate(n)(i => ((id * 31 + i * 7) % 256).toByte))
        }
        Row(id, payload)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** G.711 mu-law audio decode ([[PixelCodec.mulawDecode]] through the
    * WAV format-7 path): the same stat contract as `multimodal_pcm`,
    * over companded telephony audio — `bits` reports the 8-bit STORAGE
    * depth, samples are the expanded linear values.
    */
  val multimodalMulaw: Q = (s, d) =>
    Multimodal.extractPcmFeatures(plantedMulawMedia(s, d))
      .select("media_id", "sample_rate", "channels", "bits", "n_samples",
        "s_sum", "s_sumsq", "zero_cross", "peak")
      .orderBy("media_id")

  /** The documents table wrapped as EUROPEAN telephony audio: G.711
    * A-law WAVs (format 6) with code bytes from the closed formula
    * `b(i) = (doc_id·37 + i·11) mod 256`; doc_id ≡ 2 (mod 3) rows carry
    * garbage. The oracle replays the CCITT A-law expand (0x55 toggle,
    * segment/mantissa split, the two flat low segments) in SQL integer
    * math over every byte.
    */
  private def plantedAlawMedia(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    docs(s, d).select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload: Array[Byte] = if (id % 3 == 2)
          r.getString(1).getBytes("UTF-8")
        else {
          val ch = (id % 2).toInt + 1
          val rate = 8000 + ((id % 5) * 500).toInt
          val n = ((id % 41) + 12).toInt * ch
          PixelCodec.encodeWavAlaw(rate, ch,
            Array.tabulate(n)(i => ((id * 37 + i * 11) % 256).toByte))
        }
        Row(id, payload)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** G.711 A-law audio decode ([[PixelCodec.alawDecode]] through the
    * WAV format-6 path) — `multimodal_mulaw`'s European sibling, same
    * stat contract.
    */
  val multimodalAlaw: Q = (s, d) =>
    Multimodal.extractPcmFeatures(plantedAlawMedia(s, d))
      .select("media_id", "sample_rate", "channels", "bits", "n_samples",
        "s_sum", "s_sumsq", "zero_cross", "peak")
      .orderBy("media_id")

  // ----------------------------------------------------------------- wiring

  val all: Map[String, Q] = Map(
    "idx_build_acctbal" -> idxBuildAcctbal,
    "idx_build_sql" -> idxBuildSql,
    "idx_build_composite_desc" -> idxBuildCompositeDesc,
    "idx_partial_where" -> idxPartialWhere,
    "idx_primary" -> idxPrimary,
    "idx_array_words" -> idxArrayWords,
    "idx_mapfn_multiemit" -> idxMapfnMultiemit,
    "idx_merge_upserts" -> idxMergeUpserts,
    "idx_retain_deleted" -> idxRetainDeleted,
    "idx_delete_broadcast" -> idxDeleteBroadcast,
    "idx_partition_hash" -> idxPartitionHash,
    "idx_partition_range" -> idxPartitionRange,
    "idx_stats" -> idxStats,
    "idx_stats_bins" -> idxStatsBins,
    "idx_scan_range" -> idxScanRange,
    "idx_persist_scan" -> idxPersistScan,
    "sql_shingle_stats" -> sqlShingleStats,
    "sql_lateral_emit" -> sqlLateralEmit,
    "idx_scan_consistency" -> idxScanConsistency,
    "idx_streaming_maintain" -> idxStreamingMaintain,
    "idx_catchup" -> idxCatchup,
    "events_windowed" -> eventsWindowed,
    "events_hopping" -> eventsHopping,
    "events_stream_join" -> eventsStreamJoin,
    "events_stream_dedup" -> eventsStreamDedup,
    "events_sessions" -> eventsSessions,
    "events_asof_orders" -> eventsAsofOrders,
    "events_range_context" -> eventsRangeContext,
    "view_reduce_stats" -> viewReduceStats,
    "idx_collation_mixed" -> idxCollationMixed,
    "idx_collation_scalar" -> idxCollationScalar,
    "idx_collation_array" -> idxCollationArray,
    "idx_collation_object" -> idxCollationObject,
    "idx_collation_desc_order" -> idxCollationDescOrder,
    "dedup_exact" -> dedupExact,
    "corpus_diff" -> corpusDiff,
    "dedup_jaccard_pairs" -> dedupJaccardPairs,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_clusters" -> dedupClusters,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_incremental" -> dedupIncremental,
    "dedup_streaming" -> dedupStreaming,
    "dedup_streaming_neardup" -> dedupStreamingNeardup,
    "dedup_streaming_spans" -> dedupStreamingSpans,
    "tokenize_streaming" -> tokenizeStreaming,
    "idx_zorder" -> idxZorder,
    "dedup_simhash" -> dedupSimhash,
    "dedup_embedding_exact" -> dedupEmbeddingExact,
    "dedup_embedding_lsh" -> dedupEmbeddingLsh,
    "idx_lsh_buckets" -> idxLshBuckets,
    "sim_topk_bruteforce" -> simTopkBruteforce,
    "sim_ann_lsh" -> simAnnLsh,
    "sim_ann_ivf" -> simAnnIvf,
    "sim_ann_ivf_pq" -> simAnnIvfPq,
    "sim_ann_residual" -> simAnnResidual,
    "sim_ann_persisted" -> simAnnPersisted,
    "sim_ann_ingest" -> simAnnIngest,
    "sim_ann_upsert" -> simAnnUpsert,
    "sim_ann_delete" -> simAnnDelete,
    "sim_ann_retrain" -> simAnnRetrain,
    "sim_ann_stream_maintain" -> simAnnStreamMaintain,
    "sim_ann_filtered" -> simAnnFiltered,
    "ann_build_sql" -> annBuildSql,
    "sim_ann_stats" -> simAnnStats,
    "text_tokens" -> textTokens,
    "text_bpe_tokens" -> textBpeTokens,
    "text_quality" -> textQuality,
    "text_langid" -> textLangid,
    "text_langid_ngram" -> textLangidNgram,
    "text_tfidf_top" -> textTfidfTop,
    "text_bm25_top" -> textBm25Top,
    "text_bm25_indexed" -> textBm25Indexed,
    "text_bm25_incremental" -> textBm25Incremental,
    "text_phrase_search" -> textPhraseSearch,
    "text_bm25_queries" -> textBm25Queries,
    "text_bm25_stats" -> textBm25Stats,
    "text_rrf_fusion" -> textRrfFusion,
    "text_hybrid_search" -> textHybridSearch,
    "text_hybrid_batch" -> textHybridBatch,
    "text_hybrid_stream" -> textHybridStream,
    "text_hybrid_filtered" -> textHybridFiltered,
    "hybrid_search_sql" -> hybridSearchSql,
    "hybrid_batch_sql" -> hybridBatchSql,
    "text_fingerprint" -> textFingerprint,
    "text_repetition" -> textRepetition,
    "pipeline_gopher_rules" -> pipelineGopherRules,
    "pipeline_c4_filters" -> pipelineC4Filters,
    "text_fingerprint_rolling" -> textFingerprintRolling,
    "text_normalize" -> textNormalize,
    "text_vocab" -> textVocab,
    "text_bpe_train" -> textBpeTrain,
    "text_bpe_encode" -> textBpeEncode,
    "text_bpe_ids" -> textBpeIds,
    "tokenize_from_artifact" -> tokenizeFromArtifact,
    "sample_topquality" -> sampleTopQuality,
    "sample_fraction" -> sampleFraction,
    "sample_stratified" -> sampleStratified,
    "sample_mixture" -> sampleMixture,
    "sample_token_budget" -> sampleTokenBudget,
    "sample_temperature" -> sampleTemperature,
    "sample_weighted" -> sampleWeighted,
    "sample_streaming" -> sampleStreaming,
    "sample_weighted_stratified" -> sampleWeightedStratified,
    "pack_shards" -> packShards,
    "text_pii" -> textPii,
    "text_unigram_lm" -> textUnigramLm,
    "text_bigram_lm" -> textBigramLm,
    "text_pmi_bigrams" -> textPmiBigrams,
    "text_backoff_lm" -> textBackoffLm,
    "dedup_decontaminate" -> dedupDecontaminate,
    "dedup_substring" -> dedupSubstring,
    "dedup_span_rewrite" -> dedupSpanRewrite,
    "dedup_span_incremental" -> dedupSpanIncremental,
    "dedup_span_rotate" -> dedupSpanRotate,
    "dedup_semantic" -> dedupSemantic,
    "dedup_semantic_incremental" -> dedupSemanticIncremental,
    "dedup_semantic_stream" -> dedupSemanticStream,
    "corpus_sketch" -> corpusSketch,
    "text_chunks" -> textChunks,
    "pack_sequences" -> packSequences,
    "pack_contig" -> packContig,
    "pipeline_curation" -> pipelineCuration,
    "pipeline_ppl_buckets" -> pipelinePplBuckets,
    "pipeline_reprocess" -> pipelineReprocess,
    "pipeline_pretrain" -> pipelinePretrain,
    "pipeline_pretrain_html" -> pipelinePretrainHtml,
    "text_extract_html" -> textExtractHtml,
    "text_extract_main" -> textExtractMain,
    "text_extract_main_artifact" -> textExtractMainArtifact,
    "text_extract_main_cjk" -> textExtractMainCjk,
    "pipeline_pretrain_sjis" -> pipelinePretrainSjis,
    "pipeline_pretrain_main" -> pipelinePretrainMain,
    "text_url_canonicalize" -> textUrlCanonicalize,
    "pipeline_domain_cap" -> pipelineDomainCap,
    "sample_epochs" -> sampleEpochs,
    "pipeline_crawl_stream" -> pipelineCrawlStream,
    "dedup_url" -> dedupUrl,
    "source_warc" -> sourceWarc,
    "source_warc_http" -> sourceWarcHttp,
    "source_warc_gz" -> sourceWarcGz,
    "source_warc_zst" -> sourceWarcZst,
    "pipeline_wet_export" -> pipelineWetExport,
    "pipeline_wet_stream" -> pipelineWetStream,
    "pipeline_wat_export" -> pipelineWatExport,
    "text_extract_pdf" -> textExtractPdf,
    "pipeline_pretrain_pdf" -> pipelinePretrainPdf,
    "text_url_domain_artifact" -> textUrlDomainArtifact,
    "text_langid_artifact" -> textLangidArtifact,
    "pipeline_crawl_e2e" -> pipelineCrawlE2e,
    "pipeline_warc_stream" -> pipelineWarcStream,
    "pipeline_warc_gz_stream" -> pipelineWarcGzStream,
    "pipeline_crawl_mixed" -> pipelineCrawlMixed,
    "text_charset_decode" -> textCharsetDecode,
    "text_charset_legacy" -> textCharsetLegacy,
    "text_charset_singlebyte" -> textCharsetSinglebyte,
    "text_robots_wildcards" -> textRobotsWildcards,
    "pipeline_redirect_resolve" -> pipelineRedirectResolve,
    "pipeline_frontier_store" -> pipelineFrontierStore,
    "source_warc_charset" -> sourceWarcCharset,
    "pipeline_robots_filter" -> pipelineRobotsFilter,
    "text_html_links" -> textHtmlLinks,
    "text_anchor_agg" -> textAnchorAgg,
    "text_script_profile" -> textScriptProfile,
    "pipeline_pagerank" -> pipelinePagerank,
    "pipeline_pagerank_incremental" -> pipelinePagerankIncremental,
    "pipeline_revisit_resolve" -> pipelineRevisitResolve,
    "pipeline_recrawl_conditional" -> pipelineRecrawlConditional,
    "pipeline_crawl_priority" -> pipelineCrawlPriority,
    "pipeline_recrawl_schedule" -> pipelineRecrawlSchedule,
    "pipeline_crawl_frontier" -> pipelineCrawlFrontier,
    "pipeline_frontier_stream" -> pipelineFrontierStream,
    "pipeline_discovery_e2e" -> pipelineDiscoveryE2e,
    "pipeline_polite_schedule" -> pipelinePoliteSchedule,
    "text_robots_directives" -> textRobotsDirectives,
    "text_sitemap_parse" -> textSitemapParse,
    "pipeline_tokenize" -> pipelineTokenize,
    "pipeline_batches" -> pipelineBatches,
    "agg_skew_salted" -> aggSkewSalted,
    "corpus_profile" -> corpusProfile,
    "corpus_drift" -> corpusDrift,
    "pipeline_drift_response" -> pipelineDriftResponse,
    "sim_quantized_recall" -> simQuantizedRecall,
    "source_roundtrip" -> sourceRoundtrip,
    "multimodal_features" -> multimodalFeatures,
    "multimodal_av" -> multimodalAv,
    "multimodal_pixels" -> multimodalPixels,
    "multimodal_pcm" -> multimodalPcm,
    "multimodal_mulaw" -> multimodalMulaw,
    "multimodal_alaw" -> multimodalAlaw,
    "multimodal_mp4_frames" -> multimodalMp4Frames,
    "multimodal_mp4_keyframes" -> multimodalMp4Keyframes,
    "multimodal_jpeg" -> multimodalJpeg,
    "multimodal_gif" -> multimodalGif,
    "multimodal_webp" -> multimodalWebp,
    "multimodal_tiff" -> multimodalTiff,
    "multimodal_mp3" -> multimodalMp3,
    "multimodal_fmp4" -> multimodalFmp4,
    "pipeline_multimodal" -> pipelineMultimodal,
    "text_quality_classifier" -> textQualityClassifier,
    "multimodal_resize" -> multimodalResize,
    "multimodal_frames" -> multimodalFrames)

  /** The round-1/2/3 headline set, frozen for cross-round comparability —
    * [[headline]] extends it; Bench reports this subset's subtotal as
    * `legacy_total`.
    */
  val headlineLegacy: Seq[String] = Seq(
    "idx_build_acctbal", "idx_array_words", "idx_merge_upserts",
    "idx_delete_broadcast", "idx_partition_hash", "idx_stats",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_embedding_lsh", "sim_topk_bruteforce", "sim_ann_lsh",
    "text_quality", "text_langid", "text_tfidf_top", "multimodal_features",
    "events_windowed", "events_sessions", "view_reduce_stats",
    "sample_stratified", "pipeline_curation")

  /** Headline queries for the per-round bench at sf0.1 — representative of
    * each operator family, excluding the deliberately-O(n²) exactness
    * anchors (`dedup_embedding_exact`) whose scale path is the LSH variant.
    * Re-frozen in round 4 to cover the round-3 additions (span dedup,
    * semantic dedup, incremental near-dup, PII, decontamination, sharding,
    * the pretraining pipeline) so every operator family has a per-query
    * sf0.1 number.
    */
  val headline: Seq[String] = headlineLegacy ++ Seq(
    "dedup_substring", "dedup_span_rewrite", "dedup_span_incremental",
    "dedup_semantic", "dedup_incremental", "text_pii",
    "dedup_decontaminate", "pack_shards", "pipeline_pretrain",
    // round-4 additions (same-round, so benched from their first round)
    "sim_ann_ivf_pq", "text_normalize", "text_vocab", "sample_topquality",
    "pack_contig", "text_bpe_train", "text_bpe_encode", "text_bpe_ids",
    "pipeline_tokenize", "pipeline_batches",
    // round-5 additions
    "sample_token_budget", "sample_temperature", "text_bigram_lm",
    // round-6 additions
    "tokenize_from_artifact", "sim_ann_persisted",
    // round-7 additions
    "sim_ann_ingest", "dedup_span_rotate", "multimodal_av",
    // round-9 additions
    "multimodal_pixels", "multimodal_pcm", "sim_ann_upsert",
    "events_hopping", "multimodal_mp4_frames", "corpus_diff",
    // round-10 additions
    "sim_ann_delete", "pipeline_reprocess", "idx_build_sql",
    "sim_ann_stream_maintain", "multimodal_mp4_keyframes",
    "multimodal_jpeg", "multimodal_gif", "text_quality_classifier",
    "sample_weighted", "text_bm25_top", "sim_ann_residual",
    "events_stream_join", "text_backoff_lm", "text_bm25_indexed",
    "sample_weighted_stratified", "text_rrf_fusion",
    "text_bm25_incremental", "text_phrase_search", "text_bm25_queries",
    "events_stream_dedup", "multimodal_mulaw",
    // round-11 additions
    "ann_build_sql", "text_hybrid_search", "text_hybrid_batch",
    "sim_ann_filtered", "multimodal_alaw", "text_hybrid_filtered",
    "text_pmi_bigrams", "hybrid_search_sql", "text_bm25_stats",
    "sim_ann_stats", "dedup_semantic_incremental",
    "dedup_semantic_stream", "sim_ann_retrain", "text_hybrid_stream",
    "pipeline_ppl_buckets", "sample_streaming", "corpus_drift",
    // round-12 additions — idx_streaming_maintain / idx_catchup close
    // the instrumented-but-unreported stream_data gap (they call
    // BenchProbe.addStreamData but were never benched). The remaining
    // BenchProbe callers off this list (dedup_streaming,
    // dedup_streaming_neardup, dedup_streaming_spans,
    // tokenize_streaming) stay off by the family-representative rule:
    // their streaming families are already benched through
    // dedup_semantic_stream / events_stream_dedup / sample_streaming,
    // and their probes surface whenever they are benched ad hoc.
    "idx_streaming_maintain", "idx_catchup", "text_extract_html",
    "multimodal_webp", "hybrid_batch_sql", "pipeline_multimodal",
    "pipeline_drift_response", "pipeline_pretrain_html",
    "text_url_canonicalize", "pipeline_domain_cap", "sample_epochs",
    "pipeline_crawl_stream", "dedup_url", "source_warc",
    "pipeline_robots_filter", "text_charset_decode",
    "source_warc_charset", "pipeline_gopher_rules",
    "pipeline_crawl_e2e", "pipeline_c4_filters",
    "pipeline_warc_stream",
    // round-13 additions
    "source_warc_gz", "pipeline_warc_gz_stream", "text_extract_pdf",
    "pipeline_pretrain_pdf", "text_url_domain_artifact",
    "text_langid_artifact", "pipeline_crawl_mixed",
    // round-13 second wave: the discovery tier
    "text_html_links", "pipeline_crawl_frontier",
    "pipeline_polite_schedule", "text_robots_directives",
    "text_sitemap_parse", "pipeline_discovery_e2e",
    "pipeline_frontier_stream",
    // round-14 additions
    "text_charset_legacy", "text_robots_wildcards",
    "pipeline_redirect_resolve", "pipeline_frontier_store",
    // round-14 second wave: HTTP wire codings + main-content +
    // the scanned-doc and audio-budgeting decoders + the link graph
    "source_warc_http", "text_extract_main", "multimodal_tiff",
    "multimodal_mp3", "text_anchor_agg", "pipeline_pagerank",
    "pipeline_wet_export", "pipeline_crawl_priority",
    "pipeline_pretrain_main", "text_script_profile",
    "text_charset_singlebyte", "text_extract_main_artifact",
    "pipeline_recrawl_schedule", "pipeline_wat_export",
    "multimodal_fmp4", "pipeline_wet_stream")

  // ---------------------------------------------------------------- oracles

  private val normToks = "string_split_regex(lower(trim(text)), '\\s+')"

  /** The langid-artifact oracle's scoring SQL, generated from the SAME
    * profile constant the query's store pins: per language a
    * weighted-sum column over `toks`, plus the argmax CASE chain with
    * first-profile tie-break (each branch only needs `>=` against the
    * LATER profiles — if an earlier one lost, the global max sits at
    * or below this one).
    */
  private def langArtifactVerdictSql(
      profiles: Seq[(String, Seq[(String, Long)])],
      tag: String): (String, String) = {
    val scores = profiles.map { case (lang, ws) =>
      val cases = ws.map { case (t, w) => s"WHEN '$t' THEN $w" }
        .mkString(" ")
      s"coalesce(list_sum(list_transform(toks, t -> CASE t $cases " +
        s"ELSE 0 END)), 0) AS s_${tag}_$lang"
    }.mkString(",\n  ")
    val langs = profiles.map(_._1)
    val verdict = langs.init.zipWithIndex.map { case (l, i) =>
      val cond = langs.drop(i + 1)
        .map(o => s"s_${tag}_$l >= s_${tag}_$o").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString(" ")
    (scores, s"CASE $verdict ELSE '${langs.last}' END")
  }

  /** The vocabulary + whole-corpus-encode CTE chain shared by the
    * ids-producing BPE oracles (`text_bpe_ids`,
    * `tokenize_from_artifact`) — appended after [[bpeTrainCtes]]:
    * `base` (distinct corpus code points in binary order), `vocab0`
    * (base + terminal marker + merged symbols in learning order),
    * `vocab` (min-id per surface, mirroring `bpeVocab`'s dedup rule),
    * `d0` (boundary-wrapped whole-doc encoding), `e` (the trained rules
    * applied as the same literal replace chain Spark runs). One builder
    * so a future change to the vocab/encode contract cannot silently fix
    * one oracle and miss the other.
    */
  private def bpeVocabEncodeCtes(steps: Int): String = {
    val applied = (1 to steps).foldLeft("enc") { (acc, i) =>
      s"replace($acc, (SELECT pair FROM b$i),\n" +
        s"      (SELECT replace(pair, chr(2) || chr(1), '') FROM b$i))"
    }
    val mergeRows = (1 to steps).map { i =>
      s"""SELECT CAST((SELECT count(*) FROM base) + $i AS BIGINT) AS token_id,
         |  string_split(substring(pair, 2, length(pair) - 2),
         |    chr(2) || chr(1))[1] ||
         |  string_split(substring(pair, 2, length(pair) - 2),
         |    chr(2) || chr(1))[2] AS symbol FROM b$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    // concatenated, NOT an outer stripMargin: mergeRows contains lines
    // beginning with `||` whose first pipe a second pass would eat
    s"""base AS MATERIALIZED (
       |  SELECT DISTINCT c AS symbol FROM (
       |    SELECT unnest(string_split(word, '')) AS c FROM wrd)),
       |vocab0 AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY symbol) - 1 AS BIGINT)
       |           AS token_id, symbol
       |  FROM base
       |  UNION ALL
       |  SELECT CAST((SELECT count(*) FROM base) AS BIGINT), '</w>'
       |  UNION ALL
       |""".stripMargin + mergeRows + "),\n" +
      s"""vocab AS MATERIALIZED (
         |  SELECT min(token_id) AS token_id, symbol FROM vocab0
         |  GROUP BY symbol),
         |d0 AS MATERIALIZED (
         |  SELECT doc_id, array_to_string(list_transform(
         |    list_filter($normToks, w -> length(w) > 0),
         |    w -> array_to_string(list_transform(string_split(w, ''),
         |           c -> chr(1) || c || chr(2)), '')
         |         || chr(1) || '</w>' || chr(2)), '') AS enc
         |  FROM documents),
         |e AS (SELECT doc_id, $applied AS enc FROM d0)""".stripMargin
  }

  /** Per-doc duplicated-span coverage of the held-out docs against the
    * rest-of-corpus fingerprint set — the oracle BOTH
    * `dedup_span_incremental` (recompute-per-call) and
    * `dedup_streaming_spans` (persisted epoch-frozen store) must match:
    * the two forms differ only in where the corpus sig table lives.
    */
  private lazy val spanIncrementalOracle: String =
    spanScreenOracle("doc_id % 10 <> 7", "doc_id % 10 = 7")

  /** The incremental span-screening oracle, parameterized by which docs
    * form the screening corpus and which are screened — one replay shared
    * by `dedup_span_incremental`, `dedup_streaming_spans` (same split)
    * and `dedup_span_rotate` (rotation shifts the corpus to standing ∪
    * wave 1, screening wave 2).
    */
  private def spanScreenOracle(corpusPred: String, batchPred: String): String =
    s"""WITH t AS (
       |  SELECT doc_id, $normToks AS toks FROM documents),
       |cs AS (
       |  SELECT DISTINCT unnest(list_transform(range(1, len(toks) - 6),
       |           i -> md5(array_to_string(list_slice(toks, i, i + 7), ' ')))) AS sig
       |  FROM t WHERE $corpusPred),
       |b AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
       |         list_transform(range(1, len(toks) - 6),
       |           i -> md5(array_to_string(list_slice(toks, i, i + 7), ' '))) AS sigs
       |  FROM t WHERE $batchPred),
       |w AS (
       |  SELECT doc_id, unnest(range(1, len(sigs) + 1)) AS pos,
       |         unnest(sigs) AS sig FROM b),
       |h AS (
       |  SELECT w.doc_id, w.pos,
       |         lead(w.pos) OVER (PARTITION BY w.doc_id ORDER BY w.pos) AS nxt
       |  FROM w JOIN cs USING (sig)),
       |c AS (
       |  SELECT doc_id, count(*) AS n_dup_windows,
       |         CAST(sum(CASE WHEN nxt IS NULL THEN 8
       |                       ELSE least(8, nxt - pos) END) AS BIGINT) AS dup_tokens
       |  FROM h GROUP BY 1)
       |SELECT b.doc_id, b.n_toks,
       |       coalesce(c.n_dup_windows, 0) AS n_dup_windows,
       |       coalesce(c.dup_tokens, 0) AS dup_tokens,
       |       round(coalesce(c.dup_tokens, 0) / b.n_toks, 4) AS dup_fraction
       |FROM b LEFT JOIN c USING (doc_id) ORDER BY doc_id""".stripMargin

  /** The planted-media dimension CTE `f` — the oracle's independent
    * derivation of what [[plantedMedia]] encodes into the bytes.
    */
  private val mediaDimsCte: String =
    """f AS (
      |  SELECT doc_id AS media_id, doc_id % 5 AS kind,
      |         CAST(doc_id % 1000 + 1 AS INTEGER) AS w,
      |         CAST(doc_id % 700 + 1 AS INTEGER) AS h,
      |         (doc_id % 16) // 4 AS extra, text
      |  FROM documents)""".stripMargin

  /** `f` + `p` (payload HEX per row): rebuilds the exact planted
    * container bytes from the same shared hex constants the Spark
    * builder concatenates, so a fingerprint match proves byte identity.
    */
  private val mediaOracleCtes: String = {
    def le16(v: String) =
      s"lpad(to_hex($v % 256), 2, '0') || lpad(to_hex($v // 256), 2, '0')"
    val gifFrame =
      s"'$GifFrameHead' || ${le16("w")} || ${le16("h")} || '$GifFrameTail'"
    mediaDimsCte + ",\n" +
      s"""p AS (
         |  SELECT media_id, kind, w, h, extra,
         |    CASE kind
         |      WHEN 0 THEN '$PngHead' || lpad(to_hex(w), 8, '0') ||
         |           lpad(to_hex(h), 8, '0') || '$PngTail'
         |      WHEN 1 THEN '$JpegHead' || lpad(to_hex(h), 4, '0') ||
         |           lpad(to_hex(w), 4, '0') || '$JpegTail'
         |      WHEN 2 THEN '$GifHead' || ${le16("w")} || ${le16("h")} ||
         |           '000000' || repeat($gifFrame, 1 + extra) || '3B'
         |      WHEN 3 THEN '52494646' || '12000000' || '57454250' ||
         |           '5650384C' || '05000000' || '2F' ||
         |           lpad(to_hex((w-1) % 256), 2, '0') ||
         |           lpad(to_hex((w-1) // 256 % 64 + (h-1) % 4 * 64), 2, '0') ||
         |           lpad(to_hex((h-1) // 4 % 256), 2, '0') ||
         |           lpad(to_hex((h-1) // 1024 % 16), 2, '0') || '00'
         |      ELSE to_hex(encode(text)) END AS hexstr
         |  FROM f)""".stripMargin
  }

  /** The planted AV fixture replayed as DuckDB CTEs: per-doc facts by
    * construction (`g`) + the exact payload hex (`p`) from the SAME
    * shared constants [[plantedAvMedia]] concatenates.
    */
  private val avOracleCtes: String = {
    def le16(v: String) =
      s"lpad(to_hex($v % 256), 2, '0') || lpad(to_hex($v // 256), 2, '0')"
    def le32(v: String) =
      s"lpad(to_hex($v % 256), 2, '0') || lpad(to_hex($v // 256 % 256), 2, '0') || " +
        s"lpad(to_hex($v // 65536 % 256), 2, '0') || lpad(to_hex($v // 16777216 % 256), 2, '0')"
    s"""g AS (
       |  SELECT doc_id AS media_id, doc_id % 4 AS kind,
       |         CAST(doc_id % 2 + 1 AS INTEGER) AS ch,
       |         CAST(doc_id % 2 * 8 + 8 AS INTEGER) AS bits,
       |         CAST(doc_id % 8 * 1000 + 8000 AS INTEGER) AS rate,
       |         CAST(doc_id % 5 + 1 AS INTEGER) AS dur_sec,
       |         CAST((doc_id % 30 + 1) * 500 AS BIGINT) AS dur_ms,
       |         CAST(doc_id % 1920 + 1 AS INTEGER) AS w,
       |         CAST(doc_id % 1080 + 1 AS INTEGER) AS h, text
       |  FROM documents),
       |gg AS (
       |  SELECT *, rate * (ch * bits // 8) AS byte_rate,
       |         ch * bits // 8 AS block_align FROM g),
       |p AS (
       |  SELECT *, byte_rate * dur_sec AS data_size,
       |    CASE kind
       |      WHEN 0 THEN '$RiffTag' || ${le32("(byte_rate * dur_sec + 36)")} ||
       |           '$WavFmtHead' || ${le16("ch")} || ${le32("rate")} ||
       |           ${le32("byte_rate")} || ${le16("block_align")} ||
       |           ${le16("bits")} || '$WavDataTag' ||
       |           ${le32("(byte_rate * dur_sec)")}
       |      WHEN 1 THEN '$Mp4Head' || '$Mp4MoovHead' || '$Mp4MvhdHead' ||
       |           lpad(to_hex(dur_ms), 8, '0') || '$Mp4TrakHead' ||
       |           '$Mp4TkhdPre' || lpad(to_hex(dur_ms), 8, '0') ||
       |           '$Mp4TkhdMid' || lpad(to_hex(w), 4, '0') || '0000' ||
       |           lpad(to_hex(h), 4, '0') || '0000'
       |      WHEN 2 THEN '$RiffTag' || '24000000' || '57415645'
       |      ELSE to_hex(encode(text)) END AS hexstr
       |  FROM gg)""".stripMargin
  }

  /** DuckDB rendition of TextOps.shingles: distinct word n-gram strings. */
  private def duckShingles(n: Int): String =
    s"""list_distinct(list_transform(
       |  range(1, greatest(len($normToks) - ${n - 1}, 0) + 1),
       |  i -> array_to_string(list_slice($normToks, i, i + ${n - 1}), ' ')))""".stripMargin

  /** The BPE trainer ([[graft.functions.TextOps.bpeTrainMerges]]) replayed
    * as a DuckDB CTE chain, the merge loop unrolled: w0 is the encoded word
    * histogram; per step i, s_i splits symbols, p_i counts adjacent pairs,
    * b_i is the arg-max (count desc, pair asc), w_i applies the merge as
    * the same literal replace Spark runs. MATERIALIZED so DuckDB doesn't
    * inline the chain exponentially.
    */
  private def bpeTrainCtes(steps: Int, src: String = "documents"): String = {
    val head =
      s"""wrd AS MATERIALIZED (
         |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest($normToks) AS word FROM $src)
         |  WHERE length(word) > 0 GROUP BY 1),
         |w0 AS MATERIALIZED (
         |  SELECT array_to_string(list_transform(string_split(word, ''),
         |           c -> chr(1) || c || chr(2)), '')
         |         || chr(1) || '</w>' || chr(2) AS enc, cnt
         |  FROM wrd)""".stripMargin
    val iters = (1 to steps).map { i =>
      s"""s$i AS MATERIALIZED (SELECT cnt, string_split(substring(enc, 2,
         |          length(enc) - 2), chr(2) || chr(1)) AS syms
         |        FROM w${i - 1}),
         |p$i AS MATERIALIZED (SELECT chr(1) || syms[j] || chr(2) ||
         |          chr(1) || syms[j + 1] || chr(2) AS pair,
         |          CAST(sum(cnt) AS BIGINT) AS pc
         |        FROM s$i, unnest(range(1, len(syms))) AS t(j)
         |        GROUP BY 1),
         |b$i AS MATERIALIZED (SELECT pair, pc FROM p$i ORDER BY pc DESC, pair LIMIT 1),
         |w$i AS MATERIALIZED (SELECT replace(enc, (SELECT pair FROM b$i),
         |          replace((SELECT pair FROM b$i), chr(2) || chr(1), ''))
         |          AS enc, cnt
         |        FROM w${i - 1})""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }

  /** The BM25 oracle, shared verbatim by `text_bm25_top` (full-scan
    * scorer) and `text_bm25_indexed` (postings-index probe): literals
    * generated from the SAME Scala doubles the queries use (toString is
    * the shortest round-tripping decimal, so DuckDB parses back the
    * bit-identical double; fl(1.2)+1 need not equal fl("2.2") - never
    * hand-write derived constants).
    */
  private lazy val bm25OracleSql: String = bm25OracleSql(10)

  private def bm25OracleSql(k: Int): String = bm25OracleSql(k, "")

  /** The BATCHED BM25 oracle (per-(q_id, term) replay of
    * [[graft.operators.Retrieval.bm25TopKBatchFromIndex]]) at top-`k`,
    * shared by `text_bm25_queries` and the hybrid batch fusion.
    */
  /** Shared oracle for `sample_weighted` AND `sample_streaming`: the
    * Efraimidis–Spirakis race with deterministic md5 uniforms replayed
    * in SQL — the streaming reservoir's fold priority is a pure
    * function of the key, so the end-of-stream sample equals the
    * one-shot race whatever the batching (sharing the oracle pins it).
    */
  private lazy val weightedSampleOracle: String =
    s"""WITH t AS (SELECT doc_id, source,
       |             CAST(len($normToks) AS BIGINT) AS n_toks
       |           FROM documents),
       |p AS (SELECT doc_id, source, n_toks,
       |        round(-ln((CAST(('0x' ||
       |            substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
       |            AS BIGINT) + 1) / 4503599627370496.0) / n_toks,
       |          9) AS pr
       |      FROM t WHERE n_toks > 0),
       |r AS (SELECT doc_id, source, n_toks,
       |        CAST(row_number() OVER (ORDER BY pr, doc_id) AS INTEGER)
       |          AS rk
       |      FROM p)
       |SELECT doc_id, source, n_toks, rk FROM r WHERE rk <= 150
       |ORDER BY doc_id""".stripMargin

  /** Shared oracle for `text_hybrid_batch` AND `text_hybrid_stream`:
    * batched BM25 replay (top-10 per query) × exact cosine top-10 per
    * query (q_vec = embedding of vec_id = q_id, self excluded) ×
    * per-query RRF replay. The streaming query shares it VERBATIM —
    * the stores are read-only to the stream, so the micro-batch split
    * is a delivery detail and streamed ≡ batched.
    */
  private lazy val hybridBatchOracle: String = hybridBatchOracleSql(None)

  /** The batched-hybrid replay, optionally tenant-scoped: `allowedMod`
    * (e.g. `"% 3 <> 0"`) restricts the BM25 ranking and the cosine
    * candidate set to the allowed ids — each leg's pre-filter semantics
    * (stats corpus-wide, rank among allowed), mirroring
    * [[graft.operators.Retrieval.hybridSearchBatch]]'s `allowed`.
    */
  private def hybridBatchOracleSql(allowedMod: Option[String]): String = {
    val bmSub = bm25BatchOracleSql(10,
      allowedMod.map(m => s"WHERE doc_id $m").getOrElse(""))
    val cWhere = allowedMod.map(m => s"WHERE vec_id $m").getOrElse("")
    val qids = bm25Queries.map(_._1).mkString(", ")
    s"""WITH bm AS (SELECT q_id, doc_id, rk FROM ($bmSub)),
       |qv AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec
       |       FROM embeddings WHERE vec_id IN ($qids)),
       |c AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
       |      $cWhere),
       |scored AS (
       |  SELECT qv.q_id, c.vec_id AS doc_id,
       |         list_dot_product(c.vec, qv.q_vec) /
       |         (sqrt(list_dot_product(c.vec, c.vec)) *
       |          sqrt(list_dot_product(qv.q_vec, qv.q_vec))) AS sim
       |  FROM c CROSS JOIN qv WHERE c.vec_id <> qv.q_id),
       |an AS (SELECT q_id, doc_id, rk FROM (
       |         SELECT q_id, doc_id,
       |           CAST(row_number() OVER (PARTITION BY q_id
       |             ORDER BY sim DESC, doc_id) AS INTEGER) AS rk
       |         FROM scored)
       |       WHERE rk <= 10),
       |fu AS (SELECT COALESCE(bm.q_id, an.q_id) AS q_id,
       |         COALESCE(bm.doc_id, an.doc_id) AS doc_id,
       |         CAST(round((
       |           (CASE WHEN bm.rk IS NOT NULL
       |              THEN 1.0 / (60 + bm.rk) ELSE 0.0 END)
       |           + (CASE WHEN an.rk IS NOT NULL
       |              THEN 1.0 / (60 + an.rk) ELSE 0.0 END))
       |           * 1000000000.0) AS BIGINT) AS rrf_nano
       |       FROM bm FULL JOIN an
       |         ON bm.q_id = an.q_id AND bm.doc_id = an.doc_id),
       |r2 AS (SELECT q_id, doc_id, rrf_nano,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |           ORDER BY rrf_nano DESC, doc_id) AS INTEGER) AS rk
       |       FROM fu)
       |SELECT q_id, doc_id, rrf_nano, rk FROM r2 WHERE rk <= 5
       |ORDER BY q_id, doc_id""".stripMargin
  }

  /** The planted URL suffix rotation, shared by the URL-tier oracles. */
  private val urlSuffixCase: String =
    """CASE doc_id % 5 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
      |       WHEN 2 THEN '.org' WHEN 3 THEN '.github.io'
      |       ELSE '.com.au' END""".stripMargin

  /** The [[linkPageDocs]] plant replayed: `v` (per-doc moduli, page
    * URL, base-tag presence), `l` (each of the nine link positions'
    * RESOLVED string per RFC 3986 — the base-bearing docs resolve
    * every relative shape against the base), `lc` (+ the canonical
    * key: only position 0 needs case/port/tracking/fragment work,
    * 6 is NULL, 7 drops its fragment; the rest are already canonical
    * by construction). Shared by `text_html_links` and the frontier
    * pair.
    */
  /** The main-content block replay (d → raw → feat → cf → cum →
    * promo → rev → fin), shared by the `text_extract_main` oracle
    * and the `pipeline_pretrain_main` corpus reconstruction.
    */
  private lazy val defaultStopSql: String =
    "['the','a','data','line','value','row'," +
      "'key','order','part','small']"

  /** The main-content block replay, parameterized: `p` prefixes every
    * CTE name (so two pins can classify side-by-side in one query)
    * and `stopSql` is the DuckDB list expression the stopword count
    * matches against (it may reference `lang` — the per-language
    * artifact oracle does). `lang` rides the whole chain.
    */
  private def mainBlocksCtes(p: String = "",
                             stopSql: String = defaultStopSql,
                             textSql: String = "text"): String =
    s"""${p}d AS (SELECT doc_id, lang,
        |  trim(regexp_replace($textSql, '\\s+', ' ', 'g')) AS t
        |  FROM documents),
        |${p}raw AS (
        |  SELECT doc_id, lang, 0 AS pos, false AS heading,
        |         'Home About News Contact' AS btext, 20 AS link_chars
        |  FROM ${p}d
        |  UNION ALL SELECT doc_id, lang, 1, true,
        |    'Latest from site ' || (doc_id % 13), 0 FROM ${p}d
        |  UNION ALL SELECT doc_id, lang, 2, false, t, 0 FROM ${p}d
        |  UNION ALL SELECT doc_id, lang, 3, false, 'Read more', 8
        |    FROM ${p}d
        |  UNION ALL SELECT doc_id, lang, 4, false,
        |    trim(repeat('the data line holds a value for the row ', 6)),
        |    0 FROM ${p}d WHERE doc_id % 3 = 0
        |  UNION ALL SELECT doc_id, lang, 5, false,
        |    chr(169) || ' 2026 site' || (doc_id % 13) ||
        |    '.com All rights reserved', 0 FROM ${p}d),
        |${p}feat AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos)
        |      - 1 AS BIGINT) AS block_idx,
        |    heading, btext,
        |    CAST(length(btext) AS BIGINT) AS n_chars,
        |    CAST(len(string_split(btext, ' ')) AS BIGINT) AS n_words,
        |    CAST(len(list_filter(string_split(btext, ' '), w ->
        |      list_contains($stopSql, lower(w))))
        |      AS BIGINT) AS n_stop,
        |    CAST(link_chars AS BIGINT) AS link_chars,
        |    length(replace(btext, ' ', '')) AS nonws
        |  FROM ${p}raw),
        |${p}cf AS (
        |  SELECT *, CASE
        |    WHEN 5 * link_chars > nonws THEN 'bad'
        |    WHEN strpos(btext, chr(169)) > 0 THEN 'bad'
        |    WHEN n_chars < 70 THEN
        |      CASE WHEN link_chars > 0 THEN 'bad' ELSE 'short' END
        |    WHEN 100 * n_stop >= 32 * n_words THEN
        |      CASE WHEN n_chars > 200 THEN 'good' ELSE 'neargood' END
        |    WHEN 10 * n_stop >= 3 * n_words THEN 'neargood'
        |    ELSE 'bad' END AS cf_class
        |  FROM ${p}feat),
        |${mainReviseCtes(p)}""".stripMargin

  /** The script-agnostic tail of the main-content replay — heading
    * promotion (cumulative-sum distance), anchor-neighbor windows and
    * the final revision — shared verbatim by the word-ladder chain
    * ([[mainBlocksCtes]]) and the char-branch chain
    * (`text_extract_main_cjk`): the classifier contract keeps these
    * class-level and branch-blind, so the oracle does too. Expects a
    * `${p}cf` CTE with (doc_id, block_idx, heading, btext, n_chars,
    * cf_class, ...) columns.
    */
  private def mainReviseCtes(p: String): String =
    s"""${p}cum AS (
        |  SELECT *, sum(n_chars) OVER (PARTITION BY doc_id
        |    ORDER BY block_idx) AS csum FROM ${p}cf),
        |${p}promo AS (
        |  SELECT *, CASE WHEN cf_class = 'short' AND heading AND
        |      (min(CASE WHEN cf_class = 'good' THEN csum - n_chars END)
        |         OVER (PARTITION BY doc_id ORDER BY block_idx
        |               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |        - csum < 200
        |    THEN 'neargood' ELSE cf_class END AS cf2
        |  FROM ${p}cum),
        |${p}rev AS (
        |  SELECT *,
        |    coalesce(last_value(CASE WHEN cf2 IN ('good','bad')
        |        THEN cf2 END IGNORE NULLS)
        |      OVER (PARTITION BY doc_id ORDER BY block_idx
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      'bad') AS prev_a,
        |    coalesce(first_value(CASE WHEN cf2 IN ('good','bad')
        |        THEN cf2 END IGNORE NULLS)
        |      OVER (PARTITION BY doc_id ORDER BY block_idx
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
        |      'bad') AS next_a,
        |    coalesce(last_value(CASE WHEN cf2 <> 'short'
        |        THEN cf2 END IGNORE NULLS)
        |      OVER (PARTITION BY doc_id ORDER BY block_idx
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      'bad') AS prev_any,
        |    coalesce(first_value(CASE WHEN cf2 <> 'short'
        |        THEN cf2 END IGNORE NULLS)
        |      OVER (PARTITION BY doc_id ORDER BY block_idx
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
        |      'bad') AS next_any
        |  FROM ${p}promo),
        |${p}fin AS (
        |  SELECT *, CASE cf2
        |    WHEN 'good' THEN 'good'
        |    WHEN 'bad' THEN 'bad'
        |    WHEN 'neargood' THEN CASE WHEN prev_a = 'bad' AND
        |      next_a = 'bad' THEN 'bad' ELSE 'good' END
        |    ELSE CASE
        |      WHEN prev_a = 'good' AND next_a = 'good' THEN 'good'
        |      WHEN prev_a = 'bad' AND next_a = 'bad' THEN 'bad'
        |      WHEN (prev_a = 'bad' AND prev_any = 'neargood') OR
        |           (next_a = 'bad' AND next_any = 'neargood')
        |        THEN 'good'
        |      ELSE 'bad' END END AS final_class
        |  FROM ${p}rev)""".stripMargin

  /** The space-free-script main-content replay ([[CjkMainFixture]]'s
    * planted pages), parameterized on the pin: `charEnabled=false`
    * replays the dark (en-only) pin — every block takes the word
    * ladder with an empty zh/ja list and the page extracts to
    * nothing; `true` replays the v3 char-branch contract. Char counts
    * are length deltas (the regexp class is the same Han+kana range
    * the classifier counts; everything planted is BMP so DuckDB code
    * points == JVM code units), stop-char counts are per-character
    * replace deltas generated from the SAME Scala constants the
    * artifact pins. The revision tail is [[mainReviseCtes]] — shared
    * with the word-ladder oracle because the contract shares it.
    */
  private def cjkMainBlocksCtes(p: String, charEnabled: Boolean,
      plangSql: String = "CASE WHEN doc_id % 2 = 0 THEN 'zh' " +
        "ELSE 'ja' END",
      whereSql: String = ""): String = {
    import CjkMainFixture._
    def stopSum(chars: Seq[String]): String =
      chars.map(c =>
        s"(length(btext) - length(replace(btext, '$c', '')))")
        .mkString("\n        + ")
    def byLang(zh: String, ja: String): String =
      s"CASE plang WHEN 'zh' THEN '$zh' ELSE '$ja' END"
    val chf = if (charEnabled) "2 * cjk >= nonws" else "false"
    s"""${p}d AS (SELECT doc_id,
        |  $plangSql AS plang,
        |  doc_id // 2 AS j,
        |  trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
        |  FROM documents $whereSql),
        |${p}raw AS (
        |  SELECT doc_id, plang, 0 AS pos, false AS heading,
        |    ${byLang(zhNav.mkString(" "), jaNav.mkString(" "))} AS btext,
        |    CASE plang WHEN 'zh' THEN ${zhNav.map(_.length).sum}
        |      ELSE ${jaNav.map(_.length).sum} END AS link_chars
        |  FROM ${p}d
        |  UNION ALL SELECT doc_id, plang, 1, true,
        |    '第' || (doc_id % 9) || '章', 0 FROM ${p}d
        |  UNION ALL SELECT doc_id, plang, 2, false, t, 0
        |    FROM ${p}d WHERE j % 7 = 0
        |  UNION ALL SELECT doc_id, plang, 3, false,
        |    repeat(${byLang(zhHi, jaHi)}, CAST(j % 4 AS INTEGER)) ||
        |    repeat(${byLang(zhLo, jaLo)}, CAST(j % 3 AS INTEGER)), 0
        |    FROM ${p}d WHERE j % 4 <> 0 OR j % 3 <> 0
        |  UNION ALL SELECT doc_id, plang, 4, false,
        |    ${byLang(zhMed, jaMed)}, 0 FROM ${p}d WHERE j % 5 = 0
        |  UNION ALL SELECT doc_id, plang, 5, false,
        |    ${byLang(zhStub, jaStub)},
        |    CASE plang WHEN 'zh' THEN ${zhStub.length}
        |      ELSE ${jaStub.length} END FROM ${p}d
        |  UNION ALL SELECT doc_id, plang, 6, false,
        |    chr(169) || ' 2026 ' || ${byLang(zhFooter, jaFooter)}, 0
        |    FROM ${p}d),
        |${p}feat AS (
        |  SELECT doc_id, plang,
        |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos)
        |      - 1 AS BIGINT) AS block_idx,
        |    heading, btext,
        |    CAST(length(btext) AS BIGINT) AS n_chars,
        |    length(replace(btext, ' ', '')) AS nonws,
        |    CAST(link_chars AS BIGINT) AS link_chars,
        |    CAST(length(btext) - length(regexp_replace(btext,
        |      '[一-鿿぀-ヿ]', '', 'g')) AS BIGINT) AS cjk,
        |    CAST(CASE plang WHEN 'zh' THEN ${stopSum(zhStopChars)}
        |      ELSE ${stopSum(jaStopChars)} END AS BIGINT) AS stopc,
        |    CAST(len(string_split(btext, ' ')) AS BIGINT) AS wsplit
        |  FROM ${p}raw),
        |${p}cf AS (
        |  SELECT doc_id, plang, block_idx, heading, btext, n_chars,
        |    link_chars,
        |    CASE WHEN $chf THEN cjk ELSE wsplit END AS n_words,
        |    CASE WHEN $chf THEN stopc ELSE CAST(0 AS BIGINT) END
        |      AS n_stop,
        |    CASE WHEN $chf THEN
        |      CASE WHEN 5 * link_chars > nonws THEN 'bad'
        |        WHEN strpos(btext, chr(169)) > 0 THEN 'bad'
        |        WHEN 2 * n_chars < 70 THEN
        |          CASE WHEN link_chars > 0 THEN 'bad' ELSE 'short' END
        |        WHEN 100 * stopc >= 15 * cjk THEN
        |          CASE WHEN 2 * n_chars > 200 THEN 'good'
        |            ELSE 'neargood' END
        |        WHEN 10 * stopc >= cjk THEN 'neargood'
        |        ELSE 'bad' END
        |    ELSE
        |      CASE WHEN 5 * link_chars > nonws THEN 'bad'
        |        WHEN strpos(btext, chr(169)) > 0 THEN 'bad'
        |        WHEN n_chars < 70 THEN
        |          CASE WHEN link_chars > 0 THEN 'bad' ELSE 'short' END
        |        ELSE 'bad' END
        |    END AS cf_class
        |  FROM ${p}feat),
        |${mainReviseCtes(p)}""".stripMargin
  }

  private lazy val linksResolvedCtes: String =
    """v AS (
      |  SELECT doc_id,
      |    doc_id % 13 AS a, doc_id % 7 AS b, doc_id % 9 AS c,
      |    doc_id % 5 AS e, doc_id % 3 AS m,
      |    (doc_id + 1) % 13 AS a1, (doc_id + 1) % 9 AS c1,
      |    doc_id % 4 AS q4, doc_id % 6 AS b6,
      |    doc_id % 4 = 0 AS hasbase,
      |    'http://site' || (doc_id % 13) || '.com/dir' ||
      |      (doc_id % 7) || '/page' || (doc_id % 9) || '.html' AS p,
      |    'https://base' || (doc_id % 3) || '.org' AS borg
      |  FROM documents),
      |l AS (
      |  SELECT doc_id, CAST(ps AS BIGINT) AS pos,
      |    CASE ps
      |      WHEN 0 THEN 'HTTPS://Ext' || e ||
      |        '.COM:443/x?b=2&utm_source=x&a=1#f'
      |      WHEN 1 THEN CASE WHEN hasbase
      |        THEN borg || '/bx/sub/p' || c1
      |        ELSE 'http://site' || a || '.com/dir' || b ||
      |          '/sub/p' || c1 END
      |      WHEN 2 THEN (CASE WHEN hasbase THEN borg
      |        ELSE 'http://site' || a || '.com' END) || '/up/q' || m
      |      WHEN 3 THEN (CASE WHEN hasbase THEN 'https' ELSE 'http'
      |        END) || '://site' || a1 || '.com/root'
      |      WHEN 4 THEN CASE WHEN hasbase THEN borg || '/bx/?q=' || q4
      |        ELSE p || '?q=' || q4 END
      |      WHEN 5 THEN (CASE WHEN hasbase THEN borg
      |        ELSE 'http://site' || a || '.com' END) || '/e?a=1&b=' || b6
      |      WHEN 6 THEN 'mailto:u' || b || '@x.com'
      |      WHEN 7 THEN (CASE WHEN hasbase THEN borg || '/bx/' ELSE p
      |        END) || '#sec' || m
      |      ELSE CASE WHEN hasbase THEN borg || '/bx/page' ||
      |        c || '.html' ELSE p END
      |    END AS resolved,
      |    hasbase, e, m, p, borg, ps
      |  FROM v CROSS JOIN (SELECT unnest(generate_series(0, 8)) AS ps)),
      |lc AS (
      |  SELECT doc_id, pos, resolved,
      |    CASE ps
      |      WHEN 0 THEN 'https://ext' || e || '.com/x?a=1&b=2'
      |      WHEN 6 THEN NULL
      |      WHEN 7 THEN CASE WHEN hasbase THEN borg || '/bx/' ELSE p END
      |      ELSE resolved END AS url_canon
      |  FROM l)""".stripMargin

  /** The integer-nano PageRank replay over the `lc` link set (assumes
    * [[linksResolvedCtes]] precedes it): edges `ed` (self-loops out),
    * nodes/degrees, `p0` the uniform start, and three generated
    * iterations `d/c/p 1..3` — floor division at every step, dangling
    * mass uniform. Shared by the rank and the crawl-priority oracles.
    */
  private lazy val pagerankCtes: String = {
    val iters = (1 to 3).map { k =>
      val prev = if (k == 1) "p0" else s"p${k - 1}"
      s"""d$k AS (
         |  SELECT coalesce(sum(pr), 0) AS dangling
         |  FROM $prev LEFT JOIN od ON $prev.node = od.src
         |  WHERE od.outdeg IS NULL),
         |c$k AS (
         |  SELECT ed.dst, sum($prev.pr // od.outdeg) AS contrib
         |  FROM $prev JOIN od ON $prev.node = od.src
         |  JOIN ed ON ed.src = $prev.node GROUP BY 1),
         |p$k AS (
         |  SELECT $prev.node,
         |    CAST((15 * (1000000000 // $prev.n)) // 100 +
         |      (85 * (coalesce(c$k.contrib, 0) +
         |        d$k.dangling // $prev.n)) // 100 AS BIGINT) AS pr,
         |    $prev.n
         |  FROM $prev LEFT JOIN c$k ON $prev.node = c$k.dst
         |  CROSS JOIN d$k)""".stripMargin
    }.mkString(",\n")
    s"""ed AS (
       |  SELECT DISTINCT
       |    'http://site' || (doc_id % 13) || '.com/dir' ||
       |      (doc_id % 7) || '/page' || (doc_id % 9) || '.html' AS src,
       |    url_canon AS dst
       |  FROM lc
       |  WHERE url_canon IS NOT NULL
       |    AND (url_canon LIKE 'http://%' OR
       |         url_canon LIKE 'https://%')
       |    AND url_canon <> 'http://site' || (doc_id % 13) ||
       |      '.com/dir' || (doc_id % 7) || '/page' ||
       |      (doc_id % 9) || '.html'),
       |nd AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nd),
       |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
       |       FROM ed GROUP BY 1),
       |idg AS (SELECT dst, CAST(count(*) AS BIGINT) AS n_in
       |        FROM ed GROUP BY 1),
       |p0 AS (SELECT node, CAST(1000000000 // n AS BIGINT) AS pr, n
       |       FROM nd, nn),
       |$iters""".stripMargin
  }

  /** [[linksResolvedCtes]] + the frontier steps: `pages` (the seen
    * set), `cand` (distinct canonical http(s) links), `fresh`
    * (anti-joined), `fr` (+ domain/path), `allowed` (the planted
    * [[plantedFrontierRobots]] decision replayed by domain kind).
    */
  private lazy val frontierAllowedCtes: String =
    linksResolvedCtes +
      """,
        |pages AS (SELECT DISTINCT p AS url FROM v),
        |cand AS (
        |  SELECT DISTINCT url_canon AS url FROM lc
        |  WHERE url_canon IS NOT NULL
        |    AND (url_canon LIKE 'http://%' OR url_canon LIKE 'https://%')),
        |fresh AS (
        |  SELECT url FROM cand WHERE url NOT IN (SELECT url FROM pages)),
        |fr AS (
        |  SELECT url,
        |    regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS domain,
        |    regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1) AS path
        |  FROM fresh),
        |allowed AS (
        |  SELECT domain, url, path FROM fr
        |  WHERE CASE
        |    WHEN domain LIKE 'site%' THEN
        |      CASE WHEN CAST(regexp_extract(domain, 'site([0-9]+)', 1)
        |          AS BIGINT) % 2 = 0
        |        THEN path NOT LIKE '/up%'
        |        ELSE path NOT LIKE '/root%' END
        |    WHEN domain LIKE 'ext%' THEN path NOT LIKE '/y%'
        |    ELSE path NOT LIKE '/e%' END)""".stripMargin

  /** The oracle's independent reconstruction of what extracting the
    * [[htmlAugmentedDocs]] wrapper must yield — (doc_id, source, text)
    * where text is the kept blocks joined by newline: h1 (entities
    * decoded), the inline-tag paragraph, the doc's own text
    * (escape→decode round-trip = identity, then per-block whitespace
    * collapse), and the two list items for every third doc. The
    * anchor-only nav/read-more/footer blocks are boilerplate-dropped
    * by the link-density rule, the head's raw-text elements never
    * contribute. Shared by `text_extract_html` (byte-level md5 pin)
    * and `pipeline_pretrain_html` (the composed chain).
    */
  /** What extracting [[pdfAugmentedDocs]]'s planted PDFs must yield —
    * the PDF sibling of [[htmlExtractedDocsRel]] (no whitespace
    * collapse: PDF extraction is byte-faithful).
    */
  private lazy val pdfExtractedDocsRel: String =
    """SELECT doc_id, source,
      |  'Doc ' || doc_id || ' overview.' || chr(10) || text ||
      |  CASE WHEN doc_id % 2 = 1
      |    THEN chr(12) || 'Appendix ' || doc_id || '.'
      |    ELSE '' END AS text
      |FROM documents""".stripMargin

  private lazy val htmlExtractedDocsRel: String =
    """SELECT doc_id, source,
      |  'Title & doc ' || doc_id || '!' || chr(10) ||
      |  'note' || doc_id || ' says <keep> this text' || doc_id ||
      |  ':' || chr(10) ||
      |  trim(regexp_replace(text, '\s+', ' ', 'g')) ||
      |  CASE WHEN doc_id % 3 = 0
      |    THEN chr(10) || 'alpha' || doc_id || chr(10) ||
      |         'beta A' || doc_id
      |    ELSE '' END AS text
      |FROM documents""".stripMargin

  /** The pretraining-pipeline replay (dedup keepers → decontaminate →
    * language/quality gates → mixture → shard) over `docsRel` — either
    * the documents table itself or a reconstruction subquery aliased
    * `AS documents` (the HTML-ingest variant).
    */
  private def pipelinePretrainOracle(docsRel: String): String = {
    val stop = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
    val scores = TextOps.langProfiles.map { case (lang, markers) =>
      val set = markers.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, t -> t IN ($set))) AS s_$lang"
    }.mkString(", ")
    val enCond = TextOps.langProfiles.map(_._1).filter(_ != "en")
      .map(l => s"s_en >= s_$l").mkString(" AND ")
    val cases = mixtureWeights.toSeq.sortBy(_._1).map { case (src, f) =>
      s"WHEN source = '$src' THEN '${Sampling.fracThreshold(f)}'"
    }.mkString("\n         ")
    s"""WITH keep AS (
       |  SELECT min(doc_id) AS keep_id FROM $docsRel
       |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
       |base AS (
       |  SELECT doc_id, text, source FROM $docsRel JOIN keep ON doc_id = keep_id
       |  WHERE doc_id % 17 <> 0),
       |bench AS (
       |  SELECT DISTINCT unnest(${duckShingles(5)}) AS sh
       |  FROM $docsRel WHERE doc_id % 17 = 0),
       |cont AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT doc_id, unnest(${duckShingles(5)}) AS sh FROM base) c
       |  JOIN bench USING (sh)),
       |t AS (
       |  SELECT doc_id, source, $normToks AS toks FROM base
       |  WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
       |f AS (
       |  SELECT doc_id, source, len(toks) AS n_tokens,
       |         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
       |           AS distinct_ratio,
       |         CAST(len(list_filter(toks, t -> t IN ($stop))) AS DOUBLE)
       |           / len(toks) AS stopword_ratio,
       |         $scores
       |  FROM t),
       |gated AS (
       |  SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens
       |  FROM f
       |  WHERE $enCond
       |    AND round((least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) + distinct_ratio
       |          + (1.0 - abs(stopword_ratio - 0.4))) / 3.0, 6) >= 0.6),
       |mixed AS (
       |  SELECT doc_id, source, n_tokens, md5(CAST(doc_id AS VARCHAR)) AS h
       |  FROM gated
       |  WHERE md5(CAST(doc_id AS VARCHAR)) <
       |    CASE $cases
       |         ELSE '${Sampling.fracThreshold(0.0)}' END),
       |sharded AS (
       |  SELECT doc_id, source, n_tokens, h,
       |         CAST(('0x' || substring(h, 1, 6)) AS BIGINT) % 4 AS shard
       |  FROM mixed)
       |SELECT doc_id, source, n_tokens, shard,
       |       row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
       |FROM sharded ORDER BY shard, pos""".stripMargin
  }

  /** `allowedWhere` (e.g. `"WHERE doc_id % 3 <> 0"`) gates the ranking
    * stage — candidates restricted, tf/df/dl statistics corpus-wide —
    * mirroring [[graft.operators.Retrieval.bm25TopKBatchFromIndex]]'s
    * `allowed` pre-filter semantics.
    */
  private def bm25BatchOracleSql(k: Int, allowedWhere: String = ""): String = {
    val (k1, b) = (1.2, 0.75)
    val (k1p1, k1s, oneMb, bs) = ((k1 + 1).toString, k1.toString,
      (1 - b).toString, b.toString)
    val qvals = bm25Queries
      .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }
      .mkString(", ")
    s"""WITH t AS (SELECT doc_id, $normToks AS toks FROM documents),
       |d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM t),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(dl) AS BIGINT) AS tot FROM d),
       |q AS (SELECT CAST(q_id AS BIGINT) AS q_id, term
       |      FROM (VALUES $qvals) AS v(q_id, term)),
       |terms AS (SELECT DISTINCT term FROM q),
       |tfp AS (SELECT doc_id, term, dl, tf FROM (
       |          SELECT d.doc_id, terms.term, d.dl,
       |            CAST(len(list_filter(d.toks, x -> x = terms.term))
       |              AS BIGINT) AS tf
       |          FROM d, terms)
       |        WHERE tf > 0),
       |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |          FROM tfp GROUP BY 1),
       |p AS (SELECT q.q_id, tfp.doc_id,
       |        CAST(round(ln(1.0 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
       |              * (CAST(tfp.tf AS DOUBLE) * $k1p1)
       |              / (CAST(tfp.tf AS DOUBLE)
       |                 + $k1s * ($oneMb + $bs
       |                    * (tfp.dl / (CAST(s.tot AS DOUBLE) / s.n))))
       |              * 1000000.0) AS BIGINT) AS sc
       |      FROM tfp JOIN dfreq USING (term) JOIN q USING (term)
       |           CROSS JOIN s),
       |sc AS (SELECT q_id, doc_id, CAST(count(*) AS INTEGER) AS n_hit,
       |         CAST(sum(sc) AS BIGINT) AS score_micro
       |       FROM p GROUP BY 1, 2),
       |r AS (SELECT q_id, doc_id, n_hit, score_micro,
       |        CAST(row_number() OVER (PARTITION BY q_id
       |          ORDER BY score_micro DESC, doc_id) AS INTEGER) AS rk
       |      FROM sc $allowedWhere)
       |SELECT q_id, doc_id, n_hit, score_micro, rk FROM r WHERE rk <= $k
       |ORDER BY q_id, doc_id""".stripMargin
  }

  private def bm25OracleSql(k: Int, allowedWhere: String): String = {
    val (k1, b) = (1.2, 0.75)
    val (k1p1, k1s, oneMb, bs) = ((k1 + 1).toString, k1.toString,
      (1 - b).toString, b.toString)
    val i = bm25Terms.indices
    val tfCols = bm25Terms.zipWithIndex.map { case (t, j) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS BIGINT) AS tf_$j"
    }.mkString(",\n        ")
    val dfCols = i.map(j =>
      s"CAST(sum(CASE WHEN tf_$j > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$j")
      .mkString(",\n        ")
    val hitSum = i.map(j => s"(CASE WHEN tf_$j > 0 THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val partials = i.map(j =>
      s"""CAST(round(ln(1.0 + (n - df_$j + 0.5) / (df_$j + 0.5))
         |          * (CAST(tf_$j AS DOUBLE) * $k1p1)
         |          / (CAST(tf_$j AS DOUBLE)
         |             + $k1s * ($oneMb + $bs * (dl / (CAST(tot AS DOUBLE) / n))))
         |          * 1000000.0) AS BIGINT)""".stripMargin)
      .mkString("\n        + ")
    s"""WITH t AS (SELECT doc_id, $normToks AS toks FROM documents),
       |d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
       |        $tfCols
       |      FROM t),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(dl) AS BIGINT) AS tot,
       |        $dfCols
       |      FROM d),
       |p AS (SELECT doc_id, CAST($hitSum AS INTEGER) AS n_hit,
       |        $partials AS score_micro
       |      FROM d, s),
       |r AS (SELECT doc_id, n_hit, score_micro,
       |        CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
       |          AS INTEGER) AS rk
       |      FROM p $allowedWhere)
       |SELECT doc_id, n_hit, score_micro, rk FROM r WHERE rk <= $k
       |ORDER BY doc_id""".stripMargin
  }

  /** The legacy-charset oracle, generated from the SAME
    * [[legacyCharsetPlants]] constant the query's fixture encodes and
    * the store saves — expected text reconstructed as chr() code
    * points (the charset-oracle discipline: no encoding round-trip
    * through the SQL text itself), md5'd per pin. v1 decodes only the
    * Japanese kinds; its rejected rows carry the RAW lowercased label
    * (the unsupported-label contract), which for alias labels (gb2312)
    * differs from v2's normalized encoding name (gbk).
    */
  private lazy val legacyCharsetOracle: String = {
    def chrs(cps: Seq[Int]): String =
      cps.map(c => s"chr($c)").mkString(" || ")
    val plants = legacyCharsetPlants.zipWithIndex
    val textCases = plants.map { case ((ct, _, _, cps), k) =>
      if (cps.isEmpty) s"WHEN $k THEN NULL"
      else s"WHEN $k THEN prefix || ${chrs(cps)}"
    }.mkString("\n    ")
    def label(ct: String): String =
      if (ct == null) "shift_jis"
      else ct.substring(ct.indexOf("charset=") + 8)
        .toLowerCase(java.util.Locale.ROOT)
    val v2Name = plants.map { case ((ct, _, _, cps), k) =>
      val l = label(ct)
      val enc = graft.functions.EncodingStore.normalizeLegacyLabel(l)
      val name = if (cps.isEmpty) l else enc.getOrElse(l)
      s"WHEN $k THEN '$name'"
    }.mkString(" ")
    val v1Name = plants.map { case ((ct, v1ok, _, _), k) =>
      val l = label(ct)
      val name = if (v1ok)
        graft.functions.EncodingStore.normalizeLegacyLabel(l).get
      else l
      s"WHEN $k THEN '$name'"
    }.mkString(" ")
    val v2Method = plants.map { case ((ct, _, _, cps), k) =>
      val m = if (cps.isEmpty) "unsupported-label"
        else if (ct == null) "meta" else "header"
      s"WHEN $k THEN '$m'"
    }.mkString(" ")
    val v1Method = plants.map { case ((ct, v1ok, _, _), k) =>
      val m = if (!v1ok) "unsupported-label"
        else if (ct == null) "meta" else "header"
      s"WHEN $k THEN '$m'"
    }.mkString(" ")
    val v1Kinds = plants.collect { case ((_, true, _, _), k) => k }
      .mkString(", ")
    s"""WITH d AS (SELECT doc_id, doc_id % 10 AS kind FROM documents),
       |e AS (SELECT doc_id, kind,
       |  CASE WHEN kind = 1
       |    THEN '<meta charset=shift_jis>Doc ' || doc_id || ' '
       |    ELSE 'Doc ' || doc_id || ' ' END AS prefix FROM d),
       |t AS (SELECT doc_id, kind,
       |  CASE kind
       |    $textCases
       |  END AS text_v2 FROM e),
       |u AS (SELECT doc_id, kind, text_v2,
       |  CASE WHEN kind IN ($v1Kinds) THEN text_v2 END AS text_v1
       |  FROM t)
       |SELECT doc_id,
       |  CASE kind $v1Name END AS charset_v1,
       |  CASE kind $v1Method END AS method_v1,
       |  md5(text_v1) AS md5_v1,
       |  CASE kind $v2Name END AS charset_v2,
       |  CASE kind $v2Method END AS method_v2,
       |  md5(text_v2) AS md5_v2,
       |  CAST(length(text_v2) AS BIGINT) AS n_chars_v2
       |FROM u ORDER BY doc_id""".stripMargin
  }

  private lazy val crawlFunnelOracle: String = {
    val stop = TextOps.stopwords.map(w => s"'$w'").mkString(", ")

      val scores = TextOps.langProfiles.map { case (lang, markers) =>
        val set = markers.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, t -> t IN ($set))) AS s_$lang"
      }.mkString(", ")
      val enCond = TextOps.langProfiles.map(_._1).filter(_ != "en")
        .map(l => s"s_en >= s_$l").mkString(" AND ")
      s"""WITH d AS (SELECT doc_id, doc_id % 5 AS kind,
         |  doc_id % 13 AS n, doc_id % 9 AS p,
         |  trim(regexp_replace(text, '\\s+', ' ', 'g')) AS ctext
         |  FROM documents),
         |e AS (SELECT doc_id, kind, n, p,
         |  CASE WHEN kind = 1 THEN 'Doc ' || doc_id || ' ' ||
         |         chr(8364) || chr(10) || ctext
         |       WHEN kind = 3 THEN 'Doc ' || doc_id || ' ' ||
         |         chr(26085) || chr(26412) || chr(35486) ||
         |         chr(10) || ctext
         |       WHEN kind IN (0, 2) THEN 'Doc ' || doc_id ||
         |         chr(10) || ctext END AS text,
         |  (CASE WHEN n % 2 = 0 THEN p <> n % 3
         |        WHEN n % 3 = 0 THEN p = n % 9
         |        ELSE p <> n % 5 END) AS allowed FROM d),
         |t AS (SELECT doc_id, allowed, $normToks AS toks
         |      FROM e WHERE kind <> 4),
         |f AS (SELECT doc_id, allowed,
         |        CAST(len(toks) AS BIGINT) AS n_tokens,
         |        CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
         |          AS distinct_ratio,
         |        CAST(len(list_filter(toks, t -> t IN ($stop)))
         |          AS DOUBLE) / len(toks) AS stopword_ratio,
         |        $scores FROM t),
         |k AS (SELECT doc_id, allowed, n_tokens,
         |        (allowed AND $enCond AND
         |         round((least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
         |           + distinct_ratio
         |           + (1.0 - abs(stopword_ratio - 0.4))) / 3.0, 6)
         |           >= 0.6) AS kept FROM f)
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM documents)
         |    AS n_fetched,
         |  CAST(count(*) AS BIGINT) AS n_decoded,
         |  CAST(count(*) FILTER (WHERE allowed) AS BIGINT)
         |    AS n_allowed,
         |  CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS n_kept,
         |  CAST(COALESCE(sum(n_tokens) FILTER (WHERE kept), 0)
         |    AS BIGINT) AS total_tokens
         |FROM k""".stripMargin
  }

  /** The mixed-media funnel replay: both extraction shapes by
    * construction (html → heading + whitespace-collapsed body, PDF →
    * heading + RAW body text), the per-media rejections (EUC-JP html
    * label, every 7th classic PDF encrypted), then the language +
    * quality arithmetic shared with [[crawlFunnelOracle]].
    */
  private lazy val crawlMixedOracle: String = {
    val stop = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
    val scores = TextOps.langProfiles.map { case (lang, markers) =>
      val set = markers.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, t -> t IN ($set))) AS s_$lang"
    }.mkString(", ")
    val enCond = TextOps.langProfiles.map(_._1).filter(_ != "en")
      .map(l => s"s_en >= s_$l").mkString(" AND ")
    s"""WITH d AS (SELECT doc_id, doc_id % 5 AS kind, text,
       |  trim(regexp_replace(text, '\\s+', ' ', 'g')) AS ctext
       |  FROM documents),
       |e AS (SELECT doc_id, kind,
       |  CASE WHEN kind = 0 THEN 'Doc ' || doc_id || chr(10) || ctext
       |       WHEN kind = 1 THEN 'Doc ' || doc_id || ' ' || chr(8364)
       |         || chr(10) || ctext
       |       WHEN kind = 2 AND doc_id % 7 <> 0 THEN 'Doc ' || doc_id
       |         || ' pdf.' || chr(10) || text
       |       WHEN kind = 3 THEN 'Doc ' || doc_id || ' pdfm.' ||
       |         chr(10) || text
       |       WHEN kind = 4 AND doc_id % 3 <> 0 THEN 'Doc ' || doc_id
       |         || ' ' || chr(26085) || chr(26412) || chr(35486) ||
       |         chr(10) || ctext
       |  END AS t FROM d),
       |x AS (SELECT doc_id, kind,
       |  string_split_regex(lower(trim(t)), '\\s+') AS toks
       |  FROM e WHERE t IS NOT NULL),
       |f AS (SELECT doc_id, kind,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
       |    AS distinct_ratio,
       |  CAST(len(list_filter(toks, t -> t IN ($stop))) AS DOUBLE)
       |    / len(toks) AS stopword_ratio,
       |  $scores FROM x),
       |k AS (SELECT doc_id, kind, n_tokens,
       |  ($enCond AND
       |   round((least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
       |     + distinct_ratio + (1.0 - abs(stopword_ratio - 0.4)))
       |     / 3.0, 6) >= 0.6) AS kept FROM f)
       |SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM documents)
       |    AS n_fetched,
       |  (SELECT CAST(count(*) FILTER (WHERE doc_id % 5 IN (2, 3))
       |     AS BIGINT) FROM documents) AS n_pdf,
       |  CAST(count(*) AS BIGINT) AS n_decoded,
       |  CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS n_kept,
       |  CAST(count(*) FILTER (WHERE kept AND kind IN (2, 3))
       |    AS BIGINT) AS n_pdf_kept,
       |  CAST(COALESCE(sum(n_tokens) FILTER (WHERE kept), 0)
       |    AS BIGINT) AS total_tokens
       |FROM k""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "pipeline_crawl_mixed" -> crawlMixedOracle,
    "idx_build_acctbal" ->
      """SELECT c_acctbal AS key, c_custkey AS docid FROM customer
        |WHERE c_acctbal IS NOT NULL ORDER BY key, docid""".stripMargin,

    // DDL-over-SQL builds the SAME index — same oracle
    "idx_build_sql" ->
      """SELECT c_acctbal AS key, c_custkey AS docid FROM customer
        |WHERE c_acctbal IS NOT NULL ORDER BY key, docid""".stripMargin,

    "idx_build_composite_desc" ->
      """SELECT c_mktsegment AS key1, c_acctbal AS key2, c_custkey AS docid
        |FROM customer WHERE c_mktsegment IS NOT NULL OR c_acctbal IS NOT NULL
        |ORDER BY key1 ASC NULLS FIRST, key2 DESC NULLS LAST, docid""".stripMargin,

    "idx_partial_where" ->
      """SELECT c_acctbal AS key, c_custkey AS docid FROM customer
        |WHERE c_acctbal > 1000.0 AND c_acctbal IS NOT NULL
        |ORDER BY key, docid""".stripMargin,

    "idx_primary" ->
      "SELECT DISTINCT o_orderkey AS docid FROM orders ORDER BY docid",

    "idx_array_words" ->
      """SELECT key, docid FROM (
        |  SELECT unnest(string_split(lower(p_name), ' ')) AS key,
        |         p_partkey AS docid FROM part)
        |WHERE key IS NOT NULL ORDER BY key, docid""".stripMargin,

    "idx_mapfn_multiemit" ->
      """SELECT key, docid FROM (
        |  SELECT 'seg:' || c_mktsegment AS key, c_custkey AS docid FROM customer
        |  WHERE c_mktsegment IS NOT NULL
        |  UNION ALL
        |  SELECT 'bal:' || CAST(CAST(floor(c_acctbal / 100) AS BIGINT) AS VARCHAR),
        |         c_custkey FROM customer WHERE c_acctbal IS NOT NULL)
        |ORDER BY key, docid""".stripMargin,

    "sql_lateral_emit" ->
      """SELECT key, docid FROM (
        |  SELECT 'seg:' || c_mktsegment AS key, c_custkey AS docid FROM customer
        |  WHERE c_mktsegment IS NOT NULL
        |  UNION ALL
        |  SELECT 'bal:' || CAST(CAST(floor(c_acctbal / 100) AS BIGINT) AS VARCHAR),
        |         c_custkey FROM customer WHERE c_acctbal IS NOT NULL)
        |ORDER BY key, docid""".stripMargin,

    "idx_merge_upserts" -> mergeOracle("AND opcode = 'MUTATION'", ""),

    "idx_retain_deleted" -> mergeOracle("", ""),

    "idx_streaming_maintain" -> mergeOracle("AND opcode = 'MUTATION'", ""),

    "idx_catchup" -> mergeOracle("AND opcode = 'MUTATION'", ""),

    "view_reduce_stats" ->
      """SELECT c_mktsegment AS key, round(sum(c_acctbal), 4) AS vsum,
        |       count(*) AS vcount, min(c_acctbal) AS vmin,
        |       max(c_acctbal) AS vmax,
        |       round(sum(c_acctbal * c_acctbal), 2) AS sumsqr
        |FROM customer
        |WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
        |GROUP BY 1 ORDER BY key""".stripMargin,

    "events_asof_orders" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(ts AS DATE) AS event_date
        |  FROM events),
        |ord AS (
        |  SELECT o_custkey AS user_id, o_orderdate,
        |         max(o_orderkey) AS o_orderkey,
        |         max_by(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT ev.event_id, ev.user_id, ev.event_date,
        |       ord.o_orderkey, ord.o_totalprice
        |FROM ev ASOF LEFT JOIN ord
        |  ON ev.user_id = ord.user_id AND ev.event_date >= ord.o_orderdate
        |ORDER BY event_id""".stripMargin,

    "events_range_context" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events),
        |errs AS (
        |  SELECT event_id AS err_id, user_id, sec AS err_sec
        |  FROM ev WHERE event_type = 'error'),
        |ctx AS (
        |  SELECT event_id AS ctx_id, user_id, sec AS ctx_sec FROM ev)
        |SELECT err_id, errs.user_id, ctx_id, err_sec, ctx_sec
        |FROM errs JOIN ctx USING (user_id)
        |WHERE ctx_sec <= err_sec AND ctx_sec >= err_sec - 3600
        |ORDER BY err_id, ctx_id""".stripMargin,

    "events_sessions" ->
      """WITH e AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                   > INTERVAL '30 minutes' OR
        |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM e)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       count(*) AS n_events, round(sum(value), 6) AS sum_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,

    "events_windowed" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
        |         AS w_start,
        |       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    // hopping windows: each event explodes to its 2 containing windows
    // (start = its half-hour bucket, minus 0 or 1 slide) — the same
    // explosion Spark's window(et, '1 hour', '30 minutes') performs
    "events_hopping" ->
      """WITH off AS (SELECT i FROM generate_series(0, 1) t(i)),
        |ev AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', e.ts)
        |           - o.i * INTERVAL '30 minutes' AS w_start,
        |         e.event_type, e.value
        |  FROM events e, off o)
        |SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
        |       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM ev GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "events_stream_dedup" ->
      """SELECT DISTINCT event_id, user_id, event_type FROM events
        |WHERE event_id IS NOT NULL ORDER BY event_id""".stripMargin,

    "multimodal_mulaw" -> {
      // the CCITT expand as SQL integer math, generated once for the
      // sample and once for its same-channel predecessor (index s - ch)
      def dec(sExpr: String): String = {
        val u = s"(255 - ((b.doc_id * 31 + ($sExpr) * 7) % 256))"
        val t0 = s"((($u % 16) * 8 + 132) * (1 << (($u // 16) % 8)))"
        s"(CASE WHEN $u >= 128 THEN 132 - $t0 ELSE $t0 - 132 END)"
      }
      s"""WITH mb AS (
         |  SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS kind,
         |         CAST(doc_id % 2 + 1 AS INTEGER) AS ch,
         |         CAST(8000 + doc_id % 5 * 500 AS INTEGER) AS rate,
         |         CAST((doc_id % 37 + 10) * (doc_id % 2 + 1) AS BIGINT) AS n
         |  FROM documents),
         |ser AS (SELECT s FROM generate_series(0, 99) t(s)),
         |vals AS (
         |  SELECT b.doc_id, t.s,
         |         ${dec("t.s")} AS v,
         |         CASE WHEN t.s >= b.ch THEN ${dec("t.s - b.ch")} END AS pv
         |  FROM mb b JOIN ser t ON t.s < b.n
         |  WHERE b.kind <> 2),
         |agg AS (
         |  SELECT doc_id, CAST(sum(v) AS BIGINT) AS s_sum,
         |         CAST(sum(v*v) AS BIGINT) AS s_sumsq,
         |         CAST(sum(CASE WHEN pv IS NOT NULL AND v*pv < 0
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross,
         |         CAST(max(abs(v)) AS INTEGER) AS peak
         |  FROM vals GROUP BY 1)
         |SELECT b.doc_id AS media_id,
         |  CASE WHEN b.kind <> 2 THEN b.rate END AS sample_rate,
         |  CASE WHEN b.kind <> 2 THEN b.ch END AS channels,
         |  CASE WHEN b.kind <> 2 THEN 8 END AS bits,
         |  CASE WHEN b.kind <> 2 THEN b.n END AS n_samples,
         |  a.s_sum, a.s_sumsq, a.zero_cross, a.peak
         |FROM mb b LEFT JOIN agg a USING (doc_id)
         |ORDER BY media_id""".stripMargin
    },

    "multimodal_alaw" -> {
      // the CCITT A-law expand as SQL integer math: 0x55 toggle, 3-bit
      // segment / 4-bit mantissa split, two flat low segments, MSB set
      // meaning POSITIVE (mu-law's complement convention inverted)
      def dec(sExpr: String): String = {
        val a = s"(xor((b.doc_id * 37 + ($sExpr) * 11) % 256, 85))"
        val t0 = s"(($a % 16) * 16)"
        val t = s"(CASE WHEN ($a // 16) % 8 = 0 THEN $t0 + 8" +
          s" WHEN ($a // 16) % 8 = 1 THEN $t0 + 264" +
          s" ELSE ($t0 + 264) * (1 << (($a // 16) % 8 - 1)) END)"
        s"(CASE WHEN $a >= 128 THEN $t ELSE -$t END)"
      }
      s"""WITH ab AS (
         |  SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS kind,
         |         CAST(doc_id % 2 + 1 AS INTEGER) AS ch,
         |         CAST(8000 + doc_id % 5 * 500 AS INTEGER) AS rate,
         |         CAST((doc_id % 41 + 12) * (doc_id % 2 + 1) AS BIGINT) AS n
         |  FROM documents),
         |aser AS (SELECT s FROM generate_series(0, 119) t(s)),
         |avals AS (
         |  SELECT b.doc_id, t.s,
         |         ${dec("t.s")} AS v,
         |         CASE WHEN t.s >= b.ch THEN ${dec("t.s - b.ch")} END AS pv
         |  FROM ab b JOIN aser t ON t.s < b.n
         |  WHERE b.kind <> 2),
         |aagg AS (
         |  SELECT doc_id, CAST(sum(v) AS BIGINT) AS s_sum,
         |         CAST(sum(v*v) AS BIGINT) AS s_sumsq,
         |         CAST(sum(CASE WHEN pv IS NOT NULL AND v*pv < 0
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross,
         |         CAST(max(abs(v)) AS INTEGER) AS peak
         |  FROM avals GROUP BY 1)
         |SELECT b.doc_id AS media_id,
         |  CASE WHEN b.kind <> 2 THEN b.rate END AS sample_rate,
         |  CASE WHEN b.kind <> 2 THEN b.ch END AS channels,
         |  CASE WHEN b.kind <> 2 THEN 8 END AS bits,
         |  CASE WHEN b.kind <> 2 THEN b.n END AS n_samples,
         |  a.s_sum, a.s_sumsq, a.zero_cross, a.peak
         |FROM ab b LEFT JOIN aagg a USING (doc_id)
         |ORDER BY media_id""".stripMargin
    },

    "events_stream_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts AS c_et
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id, ts AS p_et
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.click_id, p.purchase_id, c.user_id,
        |       date_diff('microsecond', c.c_et, p.p_et) AS gap_us
        |FROM c JOIN p ON c.user_id = p.user_id
        | AND p.p_et > c.c_et
        | AND p.p_et <= c.c_et + INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,

    "idx_scan_consistency" -> mergeOracle("AND opcode = 'MUTATION'",
      "WHERE event_id <= (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) FROM events)"),

    // Scalar collation order (missing < false < true < number < string) as
    // a type-rank CASE; the per-type value columns are non-null only inside
    // their own rank group, so each group sorts by its own value semantics.
    "idx_collation_scalar" ->
      """WITH t AS (
        |  SELECT event_id,
        |         event_id % 4 AS kind,
        |         CASE WHEN event_id % 4 = 1 THEN (user_id % 2 = 0) END AS b,
        |         CASE WHEN event_id % 4 = 2 THEN value END AS n,
        |         CASE WHEN event_id % 4 = 3 THEN event_type END AS s
        |  FROM events)
        |SELECT event_id AS docid,
        |       row_number() OVER (ORDER BY
        |         CASE WHEN kind = 0 THEN 0
        |              WHEN kind = 1 THEN
        |                CASE WHEN b IS NULL THEN 0 WHEN b THEN 2 ELSE 1 END
        |              WHEN kind = 2 THEN CASE WHEN n IS NULL THEN 0 ELSE 3 END
        |              ELSE CASE WHEN s IS NULL THEN 0 ELSE 4 END END,
        |         n NULLS FIRST, s NULLS FIRST, event_id) AS pos
        |FROM t ORDER BY pos""".stripMargin,

    // fixed two-field object key: prefix-free field encodings make the
    // struct codec's byte order exactly field-wise collation, which for
    // (double, varchar) fields is a plain two-column ORDER BY (null tag
    // 0x01 sorts below every value tag -> NULLS FIRST)
    "idx_collation_object" ->
      """SELECT event_id AS docid,
        |       row_number() OVER (ORDER BY
        |         CAST(value AS DOUBLE) ASC NULLS FIRST,
        |         event_type ASC NULLS FIRST,
        |         event_id ASC) AS pos
        |FROM events ORDER BY pos""".stripMargin,

    // dynamic-map collation canonicalized: the codec's map order (entries
    // key-sorted, prefix-free key/value encodings, terminator below every
    // tag) ≡ DuckDB's native ordering of the key-sorted {k, v} STRUCT
    // list — entry-by-entry, shorter-prefix first
    "idx_collation_mixed" ->
      """WITH m AS (
        |  SELECT event_id AS docid, event_type, value,
        |    list_sort(
        |      list_transform(coalesce(json_keys(props), []), k0 ->
        |        {'k': 'p:' || k0,
        |         'v': CAST(json_extract_string(props, k0) AS DOUBLE)})
        |      || CASE WHEN user_id % 2 = 0
        |           THEN [{'k': 'u:' || CAST(user_id % 3 AS VARCHAR),
        |                  'v': CAST(user_id % 7 AS DOUBLE)}]
        |           ELSE [] END
        |      || CASE WHEN value > 50
        |           THEN [{'k': 't:' || event_type, 'v': value * 0.5}]
        |           ELSE [] END) AS entries
        |  FROM events)
        |SELECT docid, row_number() OVER (ORDER BY
        |    event_type ASC NULLS FIRST, value ASC NULLS FIRST,
        |    entries ASC, docid ASC) AS pos
        |FROM m ORDER BY pos""".stripMargin,

    // DuckDB's native list ordering (elementwise memcmp, shorter prefix
    // first) equals the array collation encoding's byte order
    "idx_collation_array" ->
      """SELECT event_id AS docid,
        |       row_number() OVER (ORDER BY string_split(event_type, 'e'),
        |                                   event_id) AS pos
        |FROM events ORDER BY pos""".stripMargin,

    "idx_collation_desc_order" ->
      """SELECT event_id AS docid,
        |       row_number() OVER (ORDER BY event_type ASC NULLS FIRST,
        |                                   value DESC NULLS LAST,
        |                                   event_id ASC) AS pos
        |FROM events ORDER BY pos""".stripMargin,

    "idx_delete_broadcast" ->
      """SELECT c_acctbal AS key, c_custkey AS docid FROM customer c
        |WHERE c_acctbal IS NOT NULL AND NOT EXISTS (
        |  SELECT 1 FROM events e
        |  WHERE e.event_type = 'error' AND e.user_id = c.c_custkey)
        |ORDER BY key, docid""".stripMargin,

    "idx_partition_hash" ->
      """SELECT o_orderkey % 8 AS part_id, o_totalprice AS key,
        |       o_orderkey AS docid
        |FROM orders WHERE o_totalprice IS NOT NULL
        |ORDER BY part_id, key, docid""".stripMargin,

    "idx_partition_range" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS part_month,
        |       o_orderdate AS key, o_orderkey AS docid
        |FROM orders WHERE o_orderdate IS NOT NULL
        |ORDER BY part_month, key, docid""".stripMargin,

    "idx_stats" ->
      """SELECT count(*) AS cnt, min(c_acctbal) AS min_key,
        |       max(c_acctbal) AS max_key,
        |       count(DISTINCT c_acctbal) AS distinct_cnt
        |FROM customer WHERE c_acctbal IS NOT NULL""".stripMargin,

    "idx_stats_bins" ->
      """SELECT CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bin,
        |       count(*) AS cnt
        |FROM customer WHERE c_acctbal IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "idx_scan_range" ->
      """SELECT c_acctbal AS key, c_custkey AS docid FROM customer
        |WHERE c_acctbal >= 0.0 AND c_acctbal < 5000.0
        |ORDER BY key, docid""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash,
        |       min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_jaccard_pairs" ->
      s"""WITH s AS (
         |  SELECT source, doc_id AS id, list_distinct($normToks) AS toks
         |  FROM documents)
         |SELECT id_a, id_b, jaccard FROM (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |         CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
         |         (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
         |           AS jaccard
         |  FROM s a JOIN s b ON a.source = b.source AND a.id < b.id)
         |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    "dedup_clusters" ->
      s"""WITH RECURSIVE s AS (
         |  SELECT source, doc_id AS id, list_distinct($normToks) AS toks
         |  FROM documents),
         |p AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT a.id AS id_a, b.id AS id_b,
         |           CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
         |           (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
         |             AS j
         |    FROM s a JOIN s b ON a.source = b.source AND a.id < b.id)
         |  WHERE j >= 0.5),
         |e AS (SELECT id_a AS src, id_b AS dst FROM p
         |      UNION ALL SELECT id_b, id_a FROM p),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.id)
         |SELECT id AS doc_id, min(r) AS cluster, (min(r) = id) AS keep
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH s AS (
         |  SELECT source, doc_id AS id, ${duckShingles(3)} AS toks
         |  FROM documents)
         |SELECT id_a, id_b, jaccard FROM (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |         CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
         |         (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
         |           AS jaccard
         |  FROM s a JOIN s b ON a.source = b.source AND a.id < b.id)
         |WHERE jaccard >= 0.3 ORDER BY id_a, id_b""".stripMargin,

    "idx_persist_scan" ->
      """SELECT c_acctbal AS key, c_custkey AS docid FROM customer
        |WHERE c_acctbal >= 0.0 AND c_acctbal < 5000.0
        |ORDER BY key, docid""".stripMargin,

    "dedup_minhash_lsh" -> {
      val fam = graft.functions.MinHashFamily
      val sigEntries = (0 until 64).map { k =>
        s"list_min(list_transform(hs, h -> (${fam.A(k)} * h + ${fam.B(k)}) % ${fam.Mod}))"
      }.mkString(",\n         ")
      s"""WITH sh AS (
         |  SELECT doc_id, ${duckShingles(3)} AS shs FROM documents),
         |h AS (
         |  SELECT doc_id, list_distinct(list_transform(shs, s ->
         |    CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) & 1073741823)) AS hs
         |  FROM sh WHERE len(shs) > 0),
         |sig AS (
         |  SELECT doc_id, [$sigEntries] AS sig FROM h),
         |bk AS (
         |  SELECT doc_id, b.range AS band,
         |         array_to_string(list_slice(sig, b.range * 4 + 1, b.range * 4 + 4),
         |                         ',') AS bucket
         |  FROM sig CROSS JOIN range(0, 16) b),
         |sized AS (
         |  SELECT doc_id, band, bucket,
         |         count(*) OVER (PARTITION BY band, bucket) AS n
         |  FROM bk),
         |ok AS (SELECT * FROM sized WHERE n BETWEEN 2 AND 64),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM ok a JOIN ok b USING (band, bucket)
         |  WHERE a.doc_id < b.doc_id),
         |verified AS (
         |  SELECT c.id_a, c.id_b,
         |         CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE) /
         |         (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))
         |           AS jaccard
         |  FROM cand c JOIN h ha ON ha.doc_id = c.id_a
         |              JOIN h hb ON hb.doc_id = c.id_b)
         |SELECT id_a, id_b, jaccard FROM verified
         |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin
    },

    "dedup_incremental" -> {
      val fam = graft.functions.MinHashFamily
      val sigEntries = (0 until 64).map { k =>
        s"list_min(list_transform(hs, h -> (${fam.A(k)} * h + ${fam.B(k)}) % ${fam.Mod}))"
      }.mkString(",\n         ")
      s"""WITH sh AS (
         |  SELECT doc_id, ${duckShingles(3)} AS shs FROM documents),
         |h AS (
         |  SELECT doc_id, list_distinct(list_transform(shs, s ->
         |    CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) & 1073741823)) AS hs
         |  FROM sh WHERE len(shs) > 0),
         |sig AS (
         |  SELECT doc_id, [$sigEntries] AS sig FROM h),
         |bk AS (
         |  SELECT doc_id, b.range AS band,
         |         array_to_string(list_slice(sig, b.range * 4 + 1, b.range * 4 + 4),
         |                         ',') AS bucket
         |  FROM sig CROSS JOIN range(0, 16) b),
         |bkC AS (SELECT * FROM bk WHERE doc_id % 10 <> 7),
         |bkB AS (SELECT * FROM bk WHERE doc_id % 10 = 7),
         |sizedC AS (
         |  SELECT doc_id, band, bucket,
         |         count(*) OVER (PARTITION BY band, bucket) AS n
         |  FROM bkC),
         |okC AS (SELECT * FROM sizedC WHERE n <= 64),
         |cand AS (
         |  SELECT DISTINCT b.doc_id AS new_id, c.doc_id AS dup_of
         |  FROM bkB b JOIN okC c USING (band, bucket)),
         |verified AS (
         |  SELECT cand.new_id, cand.dup_of,
         |         CAST(len(list_intersect(hb.hs, hc.hs)) AS DOUBLE) /
         |         (len(hb.hs) + len(hc.hs) - len(list_intersect(hb.hs, hc.hs)))
         |           AS jaccard
         |  FROM cand JOIN h hb ON hb.doc_id = cand.new_id
         |            JOIN h hc ON hc.doc_id = cand.dup_of)
         |SELECT new_id, dup_of, jaccard FROM verified
         |WHERE jaccard >= 0.5 ORDER BY new_id, dup_of""".stripMargin
    },

    "dedup_streaming" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash,
        |       min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // the growing-store streaming probe, replayed one-shot: store =
    // guarded corpus buckets + ALL ingest buckets (append-before-probe),
    // candidates = ingest buckets × store, pairs canonical (id_a < id_b)
    "dedup_streaming_neardup" -> {
      val fam = graft.functions.MinHashFamily
      val sigEntries = (0 until 64).map { k =>
        s"list_min(list_transform(hs, h -> (${fam.A(k)} * h + ${fam.B(k)}) % ${fam.Mod}))"
      }.mkString(",\n         ")
      s"""WITH sh AS (
         |  SELECT doc_id, ${duckShingles(3)} AS shs FROM documents),
         |h AS (
         |  SELECT doc_id, list_distinct(list_transform(shs, s ->
         |    CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) & 1073741823)) AS hs
         |  FROM sh WHERE len(shs) > 0),
         |sig AS (
         |  SELECT doc_id, [$sigEntries] AS sig FROM h),
         |bk AS (
         |  SELECT doc_id, b.range AS band,
         |         array_to_string(list_slice(sig, b.range * 4 + 1, b.range * 4 + 4),
         |                         ',') AS bucket
         |  FROM sig CROSS JOIN range(0, 16) b),
         |bkC AS (SELECT * FROM bk WHERE doc_id % 10 <> 7),
         |bkB AS (SELECT * FROM bk WHERE doc_id % 10 = 7),
         |sizedC AS (
         |  SELECT doc_id, band, bucket,
         |         count(*) OVER (PARTITION BY band, bucket) AS n
         |  FROM bkC),
         |okC AS (SELECT doc_id, band, bucket FROM sizedC WHERE n <= 64),
         |store0 AS (SELECT * FROM okC UNION ALL SELECT * FROM bkB),
         |sizedS AS (
         |  SELECT doc_id, band, bucket,
         |         count(*) OVER (PARTITION BY band, bucket) AS n
         |  FROM store0),
         |store AS (SELECT doc_id, band, bucket FROM sizedS WHERE n <= 64),
         |cand AS (
         |  SELECT DISTINCT least(b.doc_id, s.doc_id) AS id_a,
         |         greatest(b.doc_id, s.doc_id) AS id_b
         |  FROM bkB b JOIN store s USING (band, bucket)
         |  WHERE b.doc_id <> s.doc_id),
         |verified AS (
         |  SELECT cand.id_a, cand.id_b,
         |         CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE) /
         |         (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))
         |           AS jaccard
         |  FROM cand JOIN h ha ON ha.doc_id = cand.id_a
         |            JOIN h hb ON hb.doc_id = cand.id_b)
         |SELECT id_a, id_b, jaccard FROM verified
         |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin
    },

    "idx_zorder" -> {
      val z = ZOrder.oracleSql(21, Seq("o_custkey",
        "date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))"))
      s"""SELECT o_orderkey AS docid, CAST($z AS BIGINT) AS zval
         |FROM orders
         |WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
         |ORDER BY zval, docid""".stripMargin
    },

    "sql_shingle_stats" ->
      s"""SELECT doc_id, CAST(len(${duckShingles(3)}) AS BIGINT) AS n_shingles
         |FROM documents ORDER BY doc_id""".stripMargin,

    "idx_lsh_buckets" -> {
      val planes = Similarity.hyperplanes(dim = 64, tables = 16, bits = 5)
      val perTable = planes.zipWithIndex.map { case (tablePlanes, t) =>
        val bucket = tablePlanes.zipWithIndex.map { case (p, b) =>
          s"(CASE WHEN list_dot_product(v, [${p.mkString(", ")}]) >= 0 " +
            s"THEN ${1L << b} ELSE 0 END)"
        }.mkString(" + ")
        s"SELECT CAST(${t * 32} + ($bucket) AS BIGINT) AS key, vec_id AS docid FROM e"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT key, docid FROM (
         |  $perTable)
         |ORDER BY key, docid""".stripMargin
    },

    "dedup_embedding_lsh" -> {
      // the same deterministic plane tensor the Spark query uses, inlined
      // as literals (16 tables × 5 bits × 64 dims)
      val planes = Similarity.hyperplanes(dim = 64, tables = 16, bits = 5)
      val perTable = planes.zipWithIndex.map { case (tablePlanes, t) =>
        val bucket = tablePlanes.zipWithIndex.map { case (p, b) =>
          s"(CASE WHEN list_dot_product(v, [${p.mkString(", ")}]) >= 0 " +
            s"THEN ${1L << b} ELSE 0 END)"
        }.mkString(" + ")
        s"SELECT vec_id, v, $t AS t, $bucket AS bkt FROM e"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |bk AS (
         |  $perTable),
         |p AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bk a JOIN bk b ON a.t = b.t AND a.bkt = b.bkt
         |                      AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, sim FROM (
         |  SELECT p.id_a, p.id_b,
         |         list_dot_product(ea.v, eb.v) /
         |         (sqrt(list_dot_product(ea.v, ea.v)) *
         |          sqrt(list_dot_product(eb.v, eb.v))) AS sim
         |  FROM p JOIN e ea ON ea.vec_id = p.id_a
         |         JOIN e eb ON eb.vec_id = p.id_b)
         |WHERE sim >= 0.4 ORDER BY id_a, id_b""".stripMargin
    },

    "dedup_embedding_exact" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings)
        |SELECT id_a, id_b, sim FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         list_dot_product(a.vec, b.vec) /
        |         (sqrt(list_dot_product(a.vec, a.vec)) *
        |          sqrt(list_dot_product(b.vec, b.vec))) AS sim
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |WHERE sim >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    "sim_topk_bruteforce" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec
        |           FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        |scored AS (
        |  SELECT q.q_id, c.vec_id AS neighbor_id,
        |         list_dot_product(c.vec, q.q_vec) /
        |         (sqrt(list_dot_product(c.vec, c.vec)) *
        |          sqrt(list_dot_product(q.q_vec, q.q_vec))) AS sim
        |  FROM c CROSS JOIN q WHERE c.vec_id <> q.q_id),
        |ranked AS (
        |  SELECT q_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY q_id
        |                            ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT q_id, neighbor_id, round(sim, 6) AS sim, rank
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "text_tokens" ->
      s"""SELECT doc_id,
         |       len($normToks) AS n_tokens,
         |       CAST(list_sum(list_transform($normToks,
         |         t -> greatest(1, CAST(ceil(length(t) / 4.0) AS BIGINT))))
         |         AS BIGINT) AS n_subwords
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality" -> {
      val stop = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text, $normToks AS toks FROM documents),
         |f AS (
         |  SELECT doc_id,
         |         len(toks) AS n_tokens,
         |         length(text) AS n_chars,
         |         CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
         |           / len(toks) AS avg_token_len,
         |         CAST(len(list_filter(toks, t -> t IN ($stop))) AS DOUBLE)
         |           / len(toks) AS stopword_ratio,
         |         CAST(len(list_distinct(toks)) AS DOUBLE)
         |           / len(toks) AS distinct_ratio
         |  FROM t)
         |SELECT doc_id, n_tokens, n_chars, avg_token_len, stopword_ratio,
         |       distinct_ratio,
         |       round((least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
         |              + distinct_ratio
         |              + (1.0 - abs(stopword_ratio - 0.4))) / 3.0, 6) AS quality
         |FROM f ORDER BY doc_id""".stripMargin
    },

    "text_langid" -> {
      val conds = TextOps.langProfiles.map { case (lang, markers) =>
        val set = markers.map(w => s"'$w'").mkString(", ")
        (lang, s"len(list_filter(toks, t -> t IN ($set)))")
      }
      val scores = conds.map { case (l, e) => s"$e AS s_$l" }.mkString(", ")
      val langs = conds.map(_._1)
      val cases = langs.init.map { l =>
        val geAll = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $geAll THEN '$l'"
      }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, $normToks AS toks FROM documents),
         |s AS (SELECT doc_id, $scores FROM t)
         |SELECT doc_id, CASE $cases ELSE '${langs.last}' END AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "text_tfidf_top" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($normToks) AS term FROM documents),
         |per_doc AS (
         |  SELECT doc_id, term, count(*) AS n FROM toks GROUP BY 1, 2),
         |doc_len AS (SELECT doc_id, sum(n) AS len FROM per_doc GROUP BY 1),
         |dfreq AS (SELECT term, count(*) AS df FROM per_doc GROUP BY 1),
         |n_docs AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
         |scored AS (
         |  SELECT p.doc_id, p.term,
         |         (CAST(p.n AS DOUBLE) / l.len) * ln(nd.n / d.df) AS tfidf
         |  FROM per_doc p JOIN doc_len l USING (doc_id)
         |       JOIN dfreq d USING (term) CROSS JOIN n_docs nd),
         |ranked AS (
         |  SELECT doc_id, term, tfidf,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY tfidf DESC, term) AS rank
         |  FROM scored)
         |SELECT doc_id, rank, term, round(tfidf, 6) AS tfidf
         |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "text_bm25_top" -> bm25OracleSql,
    // the indexed probe must reproduce the full-scan scorer's rows —
    // one oracle, two execution strategies
    "text_bm25_indexed" -> bm25OracleSql,
    // ...and three: the maintained store's resolved end state IS the
    // documents table (stale docs upserted, junk tombstoned), so the
    // same oracle pins upsert/tombstone/cross-batch-stats resolution
    "text_bm25_incremental" -> bm25OracleSql,

    "text_phrase_search" ->
      s"""WITH t AS (SELECT doc_id, $normToks AS toks FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
         |FROM t, unnest(range(1, len(toks))) AS r(i)
         |WHERE toks[i] = 'key' AND toks[i + 1] = 'order'
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_bm25_queries" -> bm25BatchOracleSql(5),

    "text_rrf_fusion" -> {
      val bmSub = bm25OracleSql(20)
      s"""WITH bm AS (SELECT doc_id, rk FROM ($bmSub)),
         |t AS (SELECT doc_id, $normToks AS toks FROM documents),
         |f AS (SELECT doc_id,
         |        len(toks) AS n_tokens,
         |        CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an',
         |          'and', 'of', 'to', 'in', 'is', 'on', 'for'))) AS DOUBLE)
         |          / len(toks) AS stopword_ratio,
         |        CAST(len(list_distinct(toks)) AS DOUBLE)
         |          / len(toks) AS distinct_ratio
         |      FROM t),
         |q AS (SELECT doc_id,
         |        CAST(round(round((least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
         |              + distinct_ratio
         |              + (1.0 - abs(stopword_ratio - 0.4))) / 3.0, 6) * 1e6)
         |          AS BIGINT) AS qi
         |      FROM f),
         |ql AS (SELECT doc_id, rk FROM (
         |         SELECT doc_id,
         |           CAST(row_number() OVER (ORDER BY qi DESC, doc_id)
         |             AS INTEGER) AS rk
         |         FROM q)
         |       WHERE rk <= 20),
         |fu AS (SELECT COALESCE(bm.doc_id, ql.doc_id) AS doc_id,
         |         CAST(round((
         |           (CASE WHEN bm.rk IS NOT NULL
         |              THEN 1.0 / (60 + bm.rk) ELSE 0.0 END)
         |           + (CASE WHEN ql.rk IS NOT NULL
         |              THEN 1.0 / (60 + ql.rk) ELSE 0.0 END))
         |           * 1000000000.0) AS BIGINT) AS rrf_nano
         |       FROM bm FULL JOIN ql ON bm.doc_id = ql.doc_id),
         |r2 AS (SELECT doc_id, rrf_nano,
         |         CAST(row_number() OVER (ORDER BY rrf_nano DESC, doc_id)
         |           AS INTEGER) AS rk
         |       FROM fu)
         |SELECT doc_id, rrf_nano, rk FROM r2 WHERE rk <= 10
         |ORDER BY doc_id""".stripMargin
    },


    // hybrid = BM25 replay (top-20) x exact cosine top-20 from doc 3's
    // embedding (the parity configuration makes the ANN probe provably
    // exact) x the rrfFuse replay (same integer nano-rounding, bm leg
    // first in the fixed a+b order)
    "text_hybrid_search" -> {
      val bmSub = bm25OracleSql(20)
      s"""WITH bm AS (SELECT doc_id, rk FROM ($bmSub)),
         |q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec
         |      FROM embeddings WHERE vec_id = 3),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
         |scored AS (
         |  SELECT c.vec_id AS doc_id,
         |         list_dot_product(c.vec, q.q_vec) /
         |         (sqrt(list_dot_product(c.vec, c.vec)) *
         |          sqrt(list_dot_product(q.q_vec, q.q_vec))) AS sim
         |  FROM c CROSS JOIN q WHERE c.vec_id <> q.q_id),
         |an AS (SELECT doc_id, rk FROM (
         |         SELECT doc_id,
         |           CAST(row_number() OVER (ORDER BY sim DESC, doc_id)
         |             AS INTEGER) AS rk
         |         FROM scored)
         |       WHERE rk <= 20),
         |fu AS (SELECT COALESCE(bm.doc_id, an.doc_id) AS doc_id,
         |         CAST(round((
         |           (CASE WHEN bm.rk IS NOT NULL
         |              THEN 1.0 / (60 + bm.rk) ELSE 0.0 END)
         |           + (CASE WHEN an.rk IS NOT NULL
         |              THEN 1.0 / (60 + an.rk) ELSE 0.0 END))
         |           * 1000000000.0) AS BIGINT) AS rrf_nano
         |       FROM bm FULL JOIN an ON bm.doc_id = an.doc_id),
         |r2 AS (SELECT doc_id, rrf_nano,
         |         CAST(row_number() OVER (ORDER BY rrf_nano DESC, doc_id)
         |           AS INTEGER) AS rk
         |       FROM fu)
         |SELECT doc_id, rrf_nano, rk FROM r2 WHERE rk <= 10
         |ORDER BY doc_id""".stripMargin
    },

    // filtered hybrid = BM25 replay with corpus-wide stats RANKED among
    // allowed ids x exact cosine over the allowed subset x RRF replay
    "text_hybrid_filtered" -> {
      val bmSub = bm25OracleSql(20, "WHERE doc_id % 3 <> 0")
      s"""WITH bm AS (SELECT doc_id, rk FROM ($bmSub)),
         |q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec
         |      FROM embeddings WHERE vec_id = 3),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
         |      WHERE vec_id % 3 <> 0),
         |scored AS (
         |  SELECT c.vec_id AS doc_id,
         |         list_dot_product(c.vec, q.q_vec) /
         |         (sqrt(list_dot_product(c.vec, c.vec)) *
         |          sqrt(list_dot_product(q.q_vec, q.q_vec))) AS sim
         |  FROM c CROSS JOIN q WHERE c.vec_id <> q.q_id),
         |an AS (SELECT doc_id, rk FROM (
         |         SELECT doc_id,
         |           CAST(row_number() OVER (ORDER BY sim DESC, doc_id)
         |             AS INTEGER) AS rk
         |         FROM scored)
         |       WHERE rk <= 20),
         |fu AS (SELECT COALESCE(bm.doc_id, an.doc_id) AS doc_id,
         |         CAST(round((
         |           (CASE WHEN bm.rk IS NOT NULL
         |              THEN 1.0 / (60 + bm.rk) ELSE 0.0 END)
         |           + (CASE WHEN an.rk IS NOT NULL
         |              THEN 1.0 / (60 + an.rk) ELSE 0.0 END))
         |           * 1000000000.0) AS BIGINT) AS rrf_nano
         |       FROM bm FULL JOIN an ON bm.doc_id = an.doc_id),
         |r2 AS (SELECT doc_id, rrf_nano,
         |         CAST(row_number() OVER (ORDER BY rrf_nano DESC, doc_id)
         |           AS INTEGER) AS rk
         |       FROM fu)
         |SELECT doc_id, rrf_nano, rk FROM r2 WHERE rk <= 10
         |ORDER BY doc_id""".stripMargin
    },

    // SQL-wire hybrid: same replay as text_hybrid_search but the
    // anonymous wire query (q_id = -1) self-excludes nothing
    "hybrid_search_sql" -> {
      val bmSub = bm25OracleSql(20)
      s"""WITH bm AS (SELECT doc_id, rk FROM ($bmSub)),
         |q AS (SELECT embedding::DOUBLE[] AS q_vec
         |      FROM embeddings WHERE vec_id = 3),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
         |scored AS (
         |  SELECT c.vec_id AS doc_id,
         |         list_dot_product(c.vec, q.q_vec) /
         |         (sqrt(list_dot_product(c.vec, c.vec)) *
         |          sqrt(list_dot_product(q.q_vec, q.q_vec))) AS sim
         |  FROM c CROSS JOIN q),
         |an AS (SELECT doc_id, rk FROM (
         |         SELECT doc_id,
         |           CAST(row_number() OVER (ORDER BY sim DESC, doc_id)
         |             AS INTEGER) AS rk
         |         FROM scored)
         |       WHERE rk <= 20),
         |fu AS (SELECT COALESCE(bm.doc_id, an.doc_id) AS doc_id,
         |         CAST(round((
         |           (CASE WHEN bm.rk IS NOT NULL
         |              THEN 1.0 / (60 + bm.rk) ELSE 0.0 END)
         |           + (CASE WHEN an.rk IS NOT NULL
         |              THEN 1.0 / (60 + an.rk) ELSE 0.0 END))
         |           * 1000000000.0) AS BIGINT) AS rrf_nano
         |       FROM bm FULL JOIN an ON bm.doc_id = an.doc_id),
         |r2 AS (SELECT doc_id, rrf_nano,
         |         CAST(row_number() OVER (ORDER BY rrf_nano DESC, doc_id)
         |           AS INTEGER) AS rk
         |       FROM fu)
         |SELECT doc_id, rrf_nano, rk FROM r2 WHERE rk <= 10
         |ORDER BY doc_id""".stripMargin
    },

    // batched hybrid = batched BM25 replay (top-10 per query) x exact
    // cosine top-10 per query (q_vec = embedding of vec_id = q_id, self
    // excluded) x per-query RRF replay. The STREAMING form shares this
    // oracle verbatim: the stores are read-only to the stream, so the
    // micro-batch split is a delivery detail and streamed ≡ batched.
    "text_hybrid_batch" -> hybridBatchOracle,
    "text_hybrid_stream" -> hybridBatchOracle,
    // the SQL-wire batched form, tenant-scoped: the same replay with
    // both legs restricted to the allowed ids (vec_id % 3 != 0) under
    // pre-filter semantics (stats corpus-wide, rank among allowed)
    "hybrid_batch_sql" -> hybridBatchOracleSql(Some("% 3 <> 0")),

    "text_repetition" ->
      s"""WITH f AS (
         |  SELECT doc_id, len($normToks) AS n,
         |         list_max(list_transform(list_distinct($normToks),
         |           t -> len(list_filter($normToks, x -> x = t)))) AS top_cnt,
         |         len(${duckShingles(2)}) AS d2,
         |         greatest(len($normToks) - 1, 0) AS t2
         |  FROM documents)
         |SELECT doc_id,
         |       round(CAST(top_cnt AS DOUBLE) / n, 6) AS top_token_ratio,
         |       round(CASE WHEN t2 = 0 THEN 0.0
         |                  ELSE 1.0 - CAST(d2 AS DOUBLE) / t2 END, 6)
         |         AS dup_bigram_ratio
         |FROM f ORDER BY doc_id""".stripMargin,

    // every Gopher rule replayed over the reconstructed fixture:
    // non-ASCII via chr() (bullet 8226, ellipsis 8230); thresholds
    // applied to the ROUNDED signals exactly as the query does
    "pipeline_gopher_rules" -> {
      val flood = (101 to 132).mkString(" ", " ", "")
      val shortWords = Seq.fill(60)("ok").mkString(" ")
      s"""WITH g AS (SELECT doc_id,
         |  (CASE WHEN doc_id % 29 = 0 THEN chr(8226) || ' one' ||
         |          chr(10) || chr(8226) || ' two'
         |        WHEN doc_id % 19 = 0 THEN '$shortWords'
         |        WHEN doc_id % 17 = 0 THEN 'tiny doc only'
         |        ELSE text END ||
         |   CASE WHEN doc_id % 3 <> 0 THEN ' with that and of'
         |        ELSE '' END ||
         |   CASE WHEN doc_id % 13 = 0 THEN '$flood' ELSE '' END ||
         |   CASE WHEN doc_id % 4 = 0 THEN chr(10) || chr(8226) ||
         |        ' planted bullet ' || doc_id ELSE '' END ||
         |   CASE WHEN doc_id % 5 = 0 THEN chr(10) ||
         |        'trailing thought ' || doc_id || chr(8230) ||
         |        chr(10) || 'second trailing' || chr(8230)
         |        ELSE '' END ||
         |   CASE WHEN doc_id % 6 = 0 THEN chr(10) || '#### tags ## '
         |        || doc_id ELSE '' END) AS t FROM documents),
         |w AS (SELECT doc_id, t,
         |  list_filter(string_split_regex(t, '\\s+'),
         |    x -> len(x) > 0) AS words,
         |  string_split(t, chr(10)) AS lines FROM g),
         |sig AS (SELECT doc_id,
         |  CAST(len(words) AS BIGINT) AS n_words,
         |  round(CAST(list_sum(list_transform(words, x -> len(x)))
         |    AS DOUBLE) / len(words), 6) AS mean_word_len,
         |  round(CAST(length(t) - length(replace(replace(t, '#', ''),
         |    chr(8230), '')) AS DOUBLE) / len(words), 6) AS symbol_ratio,
         |  round(CAST(len(list_filter(lines,
         |    l -> starts_with(l, chr(8226)))) AS DOUBLE) / len(lines), 6)
         |    AS bullet_frac,
         |  round(CAST(len(list_filter(lines,
         |    l -> ends_with(l, chr(8230)) OR ends_with(l, '...')))
         |    AS DOUBLE) / len(lines), 6) AS ellipsis_frac,
         |  round(CAST(len(list_filter(words,
         |    x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
         |    / len(words), 6) AS alpha_frac,
         |  CAST(len(list_intersect(list_distinct(words),
         |    ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']))
         |    AS BIGINT) AS n_stop FROM w),
         |r AS (SELECT *,
         |  CAST((CASE WHEN n_words < 50 OR n_words > 100000
         |          THEN 1 ELSE 0 END +
         |    CASE WHEN mean_word_len < 3.0 OR mean_word_len > 10.0
         |          THEN 2 ELSE 0 END +
         |    CASE WHEN symbol_ratio > 0.1 THEN 4 ELSE 0 END +
         |    CASE WHEN bullet_frac > 0.9 THEN 8 ELSE 0 END +
         |    CASE WHEN ellipsis_frac > 0.3 THEN 16 ELSE 0 END +
         |    CASE WHEN alpha_frac < 0.8 THEN 32 ELSE 0 END +
         |    CASE WHEN n_stop < 2 THEN 64 ELSE 0 END) AS INTEGER)
         |    AS rules FROM sig)
         |SELECT doc_id, n_words, mean_word_len, symbol_ratio,
         |  bullet_frac, ellipsis_frac, alpha_frac, n_stop, rules,
         |  rules = 0 AS keep
         |FROM r ORDER BY doc_id""".stripMargin
    },

    // the C4 line rewrite + page verdict replayed byte-for-byte:
    // same line split, same retention predicate, same terminal-
    // punctuation sentence count over the REJOINED kept text
    "pipeline_c4_filters" ->
      """WITH g AS (SELECT doc_id,
        |  ('First planted sentence ' || doc_id || '.' || chr(10) ||
        |   text ||
        |   CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END ||
        |   CASE WHEN doc_id % 7 = 0 THEN chr(10) ||
        |     'This page uses javascript heavily.' ELSE '' END ||
        |   CASE WHEN doc_id % 11 = 0 THEN chr(10) ||
        |     'Lorem ipsum dolor sit amet.' ELSE '' END ||
        |   CASE WHEN doc_id % 13 = 0 THEN chr(10) ||
        |     'var code = { sample };' ELSE '' END ||
        |   CASE WHEN doc_id % 3 = 0 THEN chr(10) ||
        |     'Second one. Third one. Fourth one. Fifth one.'
        |     ELSE '' END) AS t FROM documents),
        |w AS (SELECT doc_id, t, string_split(t, chr(10)) AS lines
        |      FROM g),
        |k AS (SELECT doc_id, t, lines,
        |  array_to_string(list_filter(lines, l ->
        |    (ends_with(l, '.') OR ends_with(l, '!') OR
        |     ends_with(l, '?') OR ends_with(l, '"')) AND
        |    NOT contains(lower(l), 'javascript')), chr(10)) AS kept,
        |  len(list_filter(lines, l ->
        |    (ends_with(l, '.') OR ends_with(l, '!') OR
        |     ends_with(l, '?') OR ends_with(l, '"')) AND
        |    NOT contains(lower(l), 'javascript'))) AS nk FROM w),
        |x AS (SELECT doc_id,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(nk AS BIGINT) AS n_lines_kept,
        |  CAST(length(kept) - length(replace(replace(replace(kept,
        |    '.', ''), '!', ''), '?', '')) AS BIGINT) AS n_sentences,
        |  contains(lower(t), 'lorem ipsum') AS has_lorem,
        |  contains(t, '{') AS has_brace,
        |  md5(kept) AS kept_md5 FROM k)
        |SELECT doc_id, n_lines, n_lines_kept, n_sentences, has_lorem,
        |  has_brace, kept_md5,
        |  (NOT has_lorem AND NOT has_brace AND n_sentences >= 3)
        |    AS keep
        |FROM x ORDER BY doc_id""".stripMargin,

    "text_bpe_tokens" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(lower(trim(text)),
        |         '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_langid_ngram" -> {
      val norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
      val tris = s"list_distinct(list_transform(" +
        s"range(1, greatest(length(s) - 2, 0) + 1), i -> substring(s, i, 3)))"
      val chars = s"list_distinct(list_transform(" +
        s"range(1, length(s) + 1), i -> substring(s, i, 1)))"
      val scores = TextOps.trigramProfiles.map { case (lang, profile) =>
        val set = profile.map(p => s"'${p}'").mkString(", ")
        val src = if (lang == "zh") "chars" else "tris"
        s"len(list_intersect($src, [$set])) AS s_$lang"
      }.mkString(", ")
      val langs = TextOps.trigramProfiles.map(_._1)
      val cases = langs.init.map { l =>
        val geAll = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $geAll THEN '$l'"
      }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, $norm AS s FROM documents),
         |g AS (SELECT doc_id, $tris AS tris, $chars AS chars FROM t),
         |sc AS (SELECT doc_id, $scores FROM g)
         |SELECT doc_id, CASE $cases ELSE '${langs.last}' END AS lang_pred
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "text_fingerprint" ->
      """SELECT doc_id,
        |       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_fingerprint_rolling" ->
      s"""SELECT doc_id,
         |       list_reduce(
         |         list_prepend(CAST(0 AS BIGINT),
         |           list_transform($normToks, t ->
         |             CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT) & 2147483647)),
         |         (acc, h) -> (acc * 31 + h) % 2147483648) AS fp_roll
         |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_simhash" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_distinct($normToks) AS toks FROM documents),
         |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |h AS (SELECT doc_id,
         |        CAST(('0x' || substring(md5(tok), 1, 16)) AS UBIGINT) AS hv
         |      FROM tok),
         |bits AS (
         |  SELECT doc_id, b.bit,
         |         sum(CASE WHEN (hv >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
         |  FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS bit) b
         |  GROUP BY 1, 2),
         |sig AS (
         |  SELECT doc_id,
         |         sum(CASE WHEN vote > 0 AND bit >= 32
         |                  THEN CAST(1 AS BIGINT) << CAST(bit - 32 AS INTEGER)
         |                  ELSE 0 END) AS hi,
         |         sum(CASE WHEN vote > 0 AND bit < 32
         |                  THEN CAST(1 AS BIGINT) << CAST(bit AS INTEGER)
         |                  ELSE 0 END) AS lo
         |  FROM bits GROUP BY 1)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
         |            AS BIGINT) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    "sim_ann_lsh" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |       true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,

    "sim_ann_ivf" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |       true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,

    "sim_ann_ivf_pq" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |       true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,

    "sim_ann_residual" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |       true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,

    // the persisted-index probe must clear the SAME recall gate as the
    // in-query-trained sim_ann_ivf_pq (the artifacts round-trip exactly)
    "sim_ann_persisted" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |       true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,

    // incremental maintenance: build on half the corpus, ingest the rest
    // with the frozen model — the probe over the FULL corpus must clear
    // the same recall gate as the full-build form
    "sim_ann_ingest" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |       true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,

    "sim_ann_upsert" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |       true AS recall_ok, true AS compact_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,

    // deletion: the oracle pins the survivor query count (deleted ids
    // never answer and never query) plus the three gate booleans
    "sim_ann_delete" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |       true AS recall_ok, true AS no_deleted_ok, true AS compact_ok
        |FROM embeddings WHERE vec_id < 8 AND vec_id % 9 <> 4""".stripMargin,

    // retrain rollover: survivor query count (the %9=4 slice was deleted
    // before the re-fit) plus the three gate booleans — recall on the
    // retrained version, answer preservation vs the source version in
    // the parity configuration, single-batch fresh layout
    "sim_ann_retrain" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |       true AS recall_ok, true AS retrain_ok, true AS fresh_ok
        |FROM embeddings WHERE vec_id < 8 AND vec_id % 9 <> 4""".stripMargin,

    // mixed change stream: survivors' query count (deletion outranks the
    // overlap upsert at the higher seqno) plus the four gate booleans
    "sim_ann_stream_maintain" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |       true AS recall_ok, true AS no_deleted_ok, true AS stream_ok,
        |       true AS compact_ok
        |FROM embeddings WHERE vec_id < 8 AND vec_id % 9 <> 4""".stripMargin,

    // filtered vector search: exact cosine top-5 over the allowed
    // subset only (parity configuration makes the probe provably exact)
    "sim_ann_filtered" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec
        |           FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
        |      WHERE vec_id % 3 = 1),
        |scored AS (
        |  SELECT q.q_id, c.vec_id AS neighbor_id,
        |         list_dot_product(c.vec, q.q_vec) /
        |         (sqrt(list_dot_product(c.vec, c.vec)) *
        |          sqrt(list_dot_product(q.q_vec, q.q_vec))) AS sim
        |  FROM c CROSS JOIN q WHERE c.vec_id <> q.q_id),
        |ranked AS (
        |  SELECT q_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY q_id
        |                            ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT q_id, neighbor_id, round(sim, 6) AS sim, rank
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // maintained-store ANN stats replay the modulo formulas: live =
    // non-deleted ids (upserts stay live), deleted = the %9=4 slice
    "sim_ann_stats" ->
      """SELECT CAST(sum(CASE WHEN vec_id % 9 <> 4 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_vectors,
        |       CAST(sum(CASE WHEN vec_id % 9 = 4 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_deleted,
        |       true AS clusters_ok
        |FROM embeddings""".stripMargin,

    // SQL-DDL ANN lifecycle: same survivor-query count as sim_ann_delete
    // (deleted ids never answer and never query) plus the three gates
    "ann_build_sql" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |       true AS recall_ok, true AS no_deleted_ok, true AS wire_ok
        |FROM embeddings WHERE vec_id < 8 AND vec_id % 9 <> 4""".stripMargin,

    // diff-driven reprocessing: the oracle replays the deterministic
    // snapshot derivation's delta counts; the three invariant booleans
    // (maintained ANN ≡ re-encode, merged index ≡ rebuild, work ∝ delta)
    // are pinned true
    "pipeline_reprocess" ->
      """SELECT
        |  CAST(sum(CASE WHEN doc_id % 7 = 0 AND doc_id % 11 <> 3
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        |  CAST(sum(CASE WHEN doc_id % 7 <> 0 AND doc_id % 11 <> 3
        |                 AND doc_id % 5 = 0
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |  CAST(sum(CASE WHEN doc_id % 7 <> 0 AND doc_id % 11 = 3
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  true AS ann_state_ok, true AS idx_state_ok, true AS delta_sized_ok
        |FROM documents JOIN embeddings ON doc_id = vec_id""".stripMargin,

    "sim_quantized_recall" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |       true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,

    "agg_skew_salted" ->
      """SELECT event_type, count(*) AS cnt, round(sum(value), 4) AS total
        |FROM events
        |WHERE event_type IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "source_roundtrip" ->
      """SELECT doc_id, md5(text) AS md5_json, md5(text) AS md5_orc, source
        |FROM documents ORDER BY doc_id""".stripMargin,

    // snapshot diff by construction: the old snapshot misses doc_id%7=0
    // (-> added), the new one misses doc_id%11=3 (-> removed) and
    // revises doc_id%5=0 (-> changed); unchanged rows don't survive
    "corpus_diff" ->
      """WITH a AS (
        |  SELECT doc_id, md5(text) AS dg FROM documents
        |  WHERE doc_id % 7 <> 0),
        |b AS (
        |  SELECT doc_id, md5(CASE WHEN doc_id % 5 = 0
        |                          THEN text || ' [rev2]'
        |                          ELSE text END) AS dg
        |  FROM documents WHERE doc_id % 11 <> 3)
        |SELECT doc_id,
        |  CASE WHEN a.doc_id IS NULL THEN 'added'
        |       WHEN b.doc_id IS NULL THEN 'removed'
        |       WHEN a.dg <> b.dg THEN 'changed' END AS status,
        |  b.dg AS new_digest
        |FROM a FULL OUTER JOIN b USING (doc_id)
        |WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.dg <> b.dg
        |ORDER BY doc_id""".stripMargin,

    "corpus_profile" ->
      s"""WITH t AS (
         |  SELECT source, n_chars, len($normToks) AS n_toks FROM documents)
         |SELECT source, count(*) AS n_docs,
         |       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
         |       round(quantile_cont(n_toks, 0.5), 4) AS p50_tokens,
         |       round(quantile_cont(n_toks, 0.9), 4) AS p90_tokens,
         |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "multimodal_features" ->
      s"""WITH $mediaOracleCtes
         |SELECT media_id,
         |  CAST(length(hexstr) // 2 AS BIGINT) AS n_bytes,
         |  CAST(CASE WHEN kind <> 4 THEN w END AS INTEGER) AS width,
         |  CAST(CASE WHEN kind <> 4 THEN h END AS INTEGER) AS height,
         |  CAST(CASE WHEN kind = 2 THEN 1 + extra
         |            WHEN kind <> 4 THEN 1 END AS INTEGER) AS n_frames,
         |  md5(lower(hexstr)) AS payload_hexmd5
         |FROM p ORDER BY media_id""".stripMargin,

    // audio/video facts by construction: WAV rows carry fmt-chunk audio
    // facts and a data/byte-rate duration (= dur_sec * 1000 exactly),
    // MP4 rows carry tkhd dims and the mvhd duration; truncated-WAV
    // (kind 2) and garbage (kind 3) rows null every typed fact
    "multimodal_av" ->
      s"""WITH $avOracleCtes
         |SELECT media_id,
         |  CAST(length(hexstr) // 2 AS BIGINT) AS n_bytes,
         |  CASE kind WHEN 0 THEN 'wav' WHEN 1 THEN 'mp4' END AS container,
         |  CAST(CASE WHEN kind = 0 THEN rate END AS INTEGER) AS sample_rate,
         |  CAST(CASE WHEN kind = 0 THEN ch END AS INTEGER) AS channels,
         |  CAST(CASE WHEN kind = 0 THEN bits END AS INTEGER) AS bits_per_sample,
         |  CAST(CASE WHEN kind = 1 THEN w END AS INTEGER) AS width,
         |  CAST(CASE WHEN kind = 1 THEN h END AS INTEGER) AS height,
         |  CAST(CASE WHEN kind = 0 THEN dur_sec * 1000
         |            WHEN kind = 1 THEN dur_ms END AS BIGINT) AS duration_ms,
         |  md5(lower(hexstr)) AS payload_hexmd5
         |FROM p ORDER BY media_id""".stripMargin,

    // pixel stats by construction: the oracle re-enumerates every source
    // pixel (and every 8x6-resampled pixel via the same floor(t*src/dst)
    // nearest-neighbor index math) from the planted closed form
    // v(i) = (doc_id*31 + i*7) % 256 — no decompressor needed; a hash
    // match proves the engine's deflate->unfilter->resample chain
    // reproduced every byte at its exact offset (px_chk/rz_chk are
    // position-weighted). Garbage rows (kind 4) null all decode facts.
    // pv derives the DECODED raster value at flat index i: the direct
    // closed form for kinds 0-3; for kind 4 (indexed) the palette
    // EXPANSION — entry j = (id·31 + p·7) mod nE, RGB from the palette's
    // flat closed form, alpha from tRNS (last entry opaque). The resize
    // CTE reuses pv by joining on the source index, so the expansion
    // logic exists exactly once.
    "multimodal_pixels" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(doc_id % 6 AS INTEGER) AS kind,
        |         CAST(doc_id % 13 + 1 AS INTEGER) AS w,
        |         CAST(doc_id % 9 + 1 AS INTEGER) AS h,
        |         CAST(CASE doc_id % 6 WHEN 0 THEN 1 WHEN 1 THEN 3
        |              WHEN 2 THEN 2 WHEN 3 THEN 4 WHEN 4 THEN 4
        |              ELSE 0 END AS INTEGER) AS c,
        |         CAST(doc_id % 7 + 2 AS INTEGER) AS ne
        |  FROM documents),
        |ser AS (SELECT i FROM generate_series(0, 467) t(i)),
        |pv AS (
        |  SELECT b.doc_id, t.i,
        |    CAST(CASE
        |      WHEN b.kind < 4 THEN (b.doc_id*31 + t.i*7) % 256
        |      WHEN t.i % 4 < 3 THEN
        |        (b.doc_id*31 +
        |         (((b.doc_id*31 + (t.i // 4)*7) % b.ne)*3 + t.i % 4)*7) % 256
        |      WHEN (b.doc_id*31 + (t.i // 4)*7) % b.ne < b.ne - 1 THEN
        |        (b.doc_id*13 + ((b.doc_id*31 + (t.i // 4)*7) % b.ne)*11) % 256
        |      ELSE 255 END AS BIGINT) AS v
        |  FROM base b JOIN ser t ON t.i < b.w*b.h*b.c
        |  WHERE b.kind < 5),
        |fp AS (
        |  SELECT doc_id,
        |    CAST(sum(v) AS BIGINT) AS px_sum,
        |    CAST(sum((v + 1) * (i + 1)) AS BIGINT) AS px_chk
        |  FROM pv GROUP BY 1),
        |rzidx AS (
        |  SELECT b.doc_id, t.i,
        |         ((t.i // (8*b.c)) * b.h // 6 * b.w
        |          + ((t.i % (8*b.c)) // b.c) * b.w // 8) * b.c
        |          + t.i % b.c AS si
        |  FROM base b JOIN ser t ON t.i < 48*b.c
        |  WHERE b.kind < 5),
        |rz AS (
        |  SELECT z.doc_id,
        |    CAST(sum(p.v) AS BIGINT) AS rz_sum,
        |    CAST(sum((p.v + 1) * (z.i + 1)) AS BIGINT) AS rz_chk
        |  FROM rzidx z JOIN pv p ON p.doc_id = z.doc_id AND p.i = z.si
        |  GROUP BY 1)
        |SELECT b.doc_id AS media_id,
        |  CASE WHEN b.kind < 5 THEN b.w END AS src_w,
        |  CASE WHEN b.kind < 5 THEN b.h END AS src_h,
        |  CASE WHEN b.kind < 5 THEN b.c END AS channels,
        |  f.px_sum, f.px_chk,
        |  CAST(CASE WHEN b.kind < 5 THEN 8 END AS INTEGER) AS rz_w,
        |  CAST(CASE WHEN b.kind < 5 THEN 6 END AS INTEGER) AS rz_h,
        |  r.rz_sum, r.rz_chk
        |FROM base b
        |LEFT JOIN fp f USING (doc_id) LEFT JOIN rz r USING (doc_id)
        |ORDER BY media_id""".stripMargin,

    // MP4 frame addressing by construction: sizes from the planted
    // closed form (per-sample table for kind 0, uniform for kind 1),
    // stride-3 sampling; garbage (kind 2) docs address nothing.
    // chunked addressing: sample i of a K-chunk file lives in chunk
    // c = least(i div spc, K-1); its true offset is the file header
    // (ftyp + moov, closed-form length) plus one 8-byte mdat header per
    // chunk up to AND including c, plus the global size prefix sum —
    // because the fixture's chunks are laid down back-to-back in K mdat
    // runs. A contiguous prefix sum alone (the pre-chunk-walk answer)
    // misses the hdr + 8·(c+1) term and fails the hash.
    "multimodal_mp4_frames" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS kind,
        |         CAST(doc_id % 24 + 8 AS INTEGER) AS n,
        |         CAST(doc_id % 3 + 2 AS INTEGER) AS k,
        |         CAST(doc_id % 4 + 2 AS INTEGER) AS g,
        |         CAST(doc_id % 500 + 50 AS INTEGER) AS usize
        |  FROM documents),
        |ser AS (SELECT i FROM generate_series(0, 31) t(i)),
        |fr AS (
        |  SELECT b.doc_id, b.n, b.k, CAST(b.n // b.k AS INTEGER) AS spc,
        |         CAST(16 + 4*((b.n + b.g - 1) // b.g) +
        |              CASE WHEN b.kind = 0 THEN 252 + 4*b.n + 4*b.k
        |                   ELSE 252 + 4*b.k END AS BIGINT) AS hdr,
        |         t.i,
        |         CAST(CASE WHEN b.kind = 0
        |                   THEN (b.doc_id*13 + t.i*7) % 900 + 100
        |                   ELSE b.usize END AS INTEGER) AS fbytes
        |  FROM base b JOIN ser t ON t.i < b.n
        |  WHERE b.kind < 2),
        |wo AS (
        |  SELECT doc_id, n, i, fbytes,
        |         hdr + 8 * (least(i // spc, k - 1) + 1) +
        |         CAST(coalesce(sum(fbytes) OVER (
        |           PARTITION BY doc_id ORDER BY i
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS byte_offset
        |  FROM fr)
        |SELECT doc_id AS media_id, n AS n_frames,
        |       CAST(i AS INTEGER) AS frame_idx, fbytes AS frame_bytes,
        |       CAST(byte_offset AS BIGINT) AS byte_offset
        |FROM wo WHERE i % 3 = 0
        |ORDER BY media_id, frame_idx""".stripMargin,

    // keyframe sampling: same closed-form replay, restricted to the
    // planted stss sync set (every g-th sample), strided by sync rank
    "multimodal_mp4_keyframes" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS kind,
        |         CAST(doc_id % 24 + 8 AS INTEGER) AS n,
        |         CAST(doc_id % 3 + 2 AS INTEGER) AS k,
        |         CAST(doc_id % 4 + 2 AS INTEGER) AS g,
        |         CAST(doc_id % 500 + 50 AS INTEGER) AS usize
        |  FROM documents),
        |ser AS (SELECT i FROM generate_series(0, 31) t(i)),
        |fr AS (
        |  SELECT b.doc_id, b.n, b.k, b.g,
        |         CAST(b.n // b.k AS INTEGER) AS spc,
        |         CAST(16 + 4*((b.n + b.g - 1) // b.g) +
        |              CASE WHEN b.kind = 0 THEN 252 + 4*b.n + 4*b.k
        |                   ELSE 252 + 4*b.k END AS BIGINT) AS hdr,
        |         t.i,
        |         CAST(CASE WHEN b.kind = 0
        |                   THEN (b.doc_id*13 + t.i*7) % 900 + 100
        |                   ELSE b.usize END AS INTEGER) AS fbytes
        |  FROM base b JOIN ser t ON t.i < b.n
        |  WHERE b.kind < 2),
        |wo AS (
        |  SELECT doc_id, n, g, i, fbytes,
        |         hdr + 8 * (least(i // spc, k - 1) + 1) +
        |         CAST(coalesce(sum(fbytes) OVER (
        |           PARTITION BY doc_id ORDER BY i
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS byte_offset
        |  FROM fr)
        |SELECT doc_id AS media_id, n AS n_frames,
        |       CAST((n + g - 1) // g AS INTEGER) AS n_sync,
        |       CAST(i // g AS INTEGER) AS sync_rank,
        |       CAST(i AS INTEGER) AS frame_idx, fbytes AS frame_bytes,
        |       CAST(byte_offset AS BIGINT) AS byte_offset
        |FROM wo WHERE i % g = 0 AND (i // g) % 2 = 0
        |ORDER BY media_id, frame_idx""".stripMargin,

    // distilled quality classifier: split sizes and the label prior
    // replay closed-form (the same quality chain as text_quality); the
    // two accuracy gates are pinned — the engine must actually recover
    // the separator on both splits
    "text_quality_classifier" -> {
      val stop = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text, $normToks AS toks FROM documents),
         |f AS (
         |  SELECT doc_id,
         |         round((least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0)
         |           + CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
         |           + (1.0 - abs(CAST(len(list_filter(toks,
         |               t -> t IN ($stop))) AS DOUBLE) / len(toks) - 0.4)))
         |           / 3.0, 6) AS quality
         |  FROM t)
         |SELECT
         |  CAST(sum(CASE WHEN doc_id % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_train,
         |  CAST(sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_test,
         |  CAST(sum(CASE WHEN quality >= 0.6 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pos,
         |  true AS train_acc_ok, true AS test_acc_ok
         |FROM f""".stripMargin
    },

    // lossless GIF: re-enumerate every expanded RGB byte from the planted
    // closed forms (idx(p) = (id*31+p*7) mod nE, pal(m) = (id*13+m*5)
    // mod 256), position-weighted checksum over the 3-channel buffer
    "multimodal_gif" ->
      """WITH gbase AS (
        |  SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS kind,
        |    CAST(CASE WHEN doc_id % 4 = 2 THEN 256
        |              ELSE doc_id % 51 + 2 END AS BIGINT) AS ne,
        |    CAST(CASE WHEN doc_id % 4 = 2 THEN doc_id % 20 + 16
        |              ELSE doc_id % 19 + 1 END AS INTEGER) AS w,
        |    CAST(CASE WHEN doc_id % 4 = 2 THEN doc_id % 12 + 10
        |              ELSE doc_id % 11 + 1 END AS INTEGER) AS h
        |  FROM documents),
        |gser AS (SELECT i FROM generate_series(0, 2204) t(i)),
        |gpx AS (
        |  SELECT b.doc_id, b.w, b.h, t.i,
        |    (b.doc_id*13 +
        |      (((b.doc_id*31 + (t.i // 3)*7) % b.ne)*3 + t.i % 3)*5) % 256
        |      AS v
        |  FROM gbase b JOIN gser t ON t.i < b.w * b.h * 3
        |  WHERE b.kind < 3)
        |SELECT g.doc_id AS media_id,
        |  CASE WHEN d.doc_id % 4 = 3 THEN NULL ELSE g2.w END AS width,
        |  CASE WHEN d.doc_id % 4 = 3 THEN NULL ELSE g2.h END AS height,
        |  CASE WHEN d.doc_id % 4 = 3 THEN NULL
        |       ELSE CAST(3 AS INTEGER) END AS channels,
        |  px_sum, px_chk
        |FROM (
        |  SELECT doc_id, CAST(sum(v) AS BIGINT) AS px_sum,
        |         CAST(sum((v + 1) * (i + 1)) AS BIGINT) AS px_chk
        |  FROM gpx GROUP BY doc_id
        |  UNION ALL
        |  SELECT doc_id, NULL, NULL FROM gbase WHERE kind = 3) g
        |JOIN documents d ON d.doc_id = g.doc_id
        |JOIN gbase g2 ON g2.doc_id = g.doc_id
        |ORDER BY media_id""".stripMargin,

    // lossless WebP (VP8L) stats by construction: the oracle
    // re-enumerates every RGBA byte from the planted closed forms per
    // kind (doc_id % 6; byte i: pixel i//4, channel i%4 in RGBA
    // order); kinds 4 (garbage), 5 (lossy VP8 / close-neighborhood
    // plane code — the honest-rejection pair) null every fact
    // every decoded TIFF raster replayed from its planted closed form:
    // the inverted WhiteIsZero kinds, the palette expansion through the
    // 16-bit ColorMap's high byte, and the bilevel bit expansion are
    // all re-enumerated pixel-by-pixel; rejection kinds carry their
    // name in err with every fact NULL
    "multimodal_tiff" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS kind,
        |         CAST(doc_id % 13 + 1 AS INTEGER) AS w,
        |         CAST(doc_id % 9 + 1 AS INTEGER) AS h,
        |         CAST(CASE doc_id % 8
        |              WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 3
        |              WHEN 3 THEN 1 WHEN 4 THEN 3 WHEN 5 THEN 1
        |              WHEN 6 THEN 3 END AS INTEGER) AS c,
        |         CAST(doc_id % 7 + 2 AS INTEGER) AS ne
        |  FROM documents),
        |ser AS (SELECT i FROM generate_series(0, 350) t(i)),
        |pv AS (
        |  SELECT b.doc_id, t.i,
        |    CAST(CASE
        |      WHEN b.kind IN (0, 1, 2, 6) THEN
        |        (b.doc_id*31 + t.i*7) % 256
        |      WHEN b.kind = 3 THEN 255 - (b.doc_id*31 + t.i*7) % 256
        |      WHEN b.kind = 4 THEN
        |        (b.doc_id*13 + (t.i % 3)*5 +
        |         ((b.doc_id*31 + (t.i // 3)*7) % b.ne)*11) % 256
        |      WHEN (b.doc_id + t.i % b.w + t.i // b.w) % 3 = 0 THEN 0
        |      ELSE 255 END AS BIGINT) AS v
        |  FROM base b JOIN ser t ON t.i < b.w*b.h*b.c
        |  WHERE b.kind < 7),
        |fp AS (
        |  SELECT doc_id,
        |    CAST(sum(v) AS BIGINT) AS px_sum,
        |    CAST(sum((v + 1) * (i + 1)) AS BIGINT) AS px_chk
        |  FROM pv GROUP BY 1)
        |SELECT b.doc_id AS media_id,
        |  CASE WHEN b.kind < 7 THEN b.w END AS width,
        |  CASE WHEN b.kind < 7 THEN b.h END AS height,
        |  CASE WHEN b.kind < 7 THEN b.c END AS channels,
        |  f.px_sum, f.px_chk,
        |  CASE WHEN b.kind = 7 THEN
        |    CASE (b.doc_id // 8) % 4 WHEN 0 THEN 'jpeg'
        |         WHEN 1 THEN 'ccitt'
        |         WHEN 2 THEN 'tiled' ELSE 'malformed' END END AS err
        |FROM base b LEFT JOIN fp f USING (doc_id)
        |ORDER BY media_id""".stripMargin,

    // fragment addressing proven through the data: sizes and sample
    // counts by construction per kind, and the read-back byte stats
    // over ONE global closed form — a wrong base/default resolution
    // reads the wrong bytes and the sums diverge
    "multimodal_fmp4" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS kind,
        |    CAST(doc_id % 3 + 2 AS INTEGER) AS k,
        |    CAST(doc_id % 5 + 3 AS INTEGER) AS s
        |  FROM documents),
        |szs AS (
        |  SELECT b.doc_id, t.i AS sg,
        |    CAST(CASE b.kind
        |      WHEN 0 THEN (b.doc_id*13 + t.i*7) % 120 + 8
        |      WHEN 1 THEN b.doc_id % 50 + 20
        |      ELSE b.doc_id % 40 + 16 END AS BIGINT) AS sz
        |  FROM base b JOIN generate_series(0, 27) t(i)
        |    ON t.i < b.k * b.s
        |  WHERE b.kind < 3),
        |tot AS (
        |  SELECT doc_id, CAST(sum(sz) AS BIGINT) AS bytes_total,
        |    CAST(count(*) AS INTEGER) AS n_samples
        |  FROM szs GROUP BY 1),
        |dat AS (
        |  SELECT b.doc_id, g.g,
        |    CAST((b.doc_id*7 + g.g*3) % 256 AS BIGINT) AS v
        |  FROM base b JOIN tot USING (doc_id)
        |  JOIN generate_series(0, 3599) g(g) ON g.g < tot.bytes_total
        |  WHERE b.kind < 3),
        |ds AS (
        |  SELECT doc_id, CAST(sum(v) AS BIGINT) AS data_sum,
        |    CAST(sum((v + 1) * (g + 1)) AS BIGINT) AS data_chk
        |  FROM dat GROUP BY 1)
        |SELECT b.doc_id AS media_id,
        |  CASE WHEN b.kind < 3 THEN b.k END AS n_fragments,
        |  tot.n_samples,
        |  tot.bytes_total,
        |  CASE WHEN b.kind < 3 THEN CAST(1 AS BIGINT) END AS seq_first,
        |  CASE WHEN b.kind < 3 THEN CAST(b.k AS BIGINT) END AS seq_last,
        |  ds.data_sum, ds.data_chk,
        |  CASE WHEN b.kind = 3 THEN 'malformed' END AS err
        |FROM base b LEFT JOIN tot USING (doc_id)
        |LEFT JOIN ds USING (doc_id)
        |ORDER BY media_id""".stripMargin,

    // the frame-walk facts by construction: counts, rates, modes and
    // the integer-floor duration; the padding/VBR kinds prove the
    // length math because a wrong term would desync into `malformed`
    "multimodal_mp3" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS kind,
        |         CAST(doc_id % 20 + 5 AS INTEGER) AS n
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CASE WHEN kind < 7 THEN n END AS n_frames,
        |  CAST(CASE kind WHEN 0 THEN 44100 WHEN 1 THEN 32000
        |       WHEN 2 THEN 22050 WHEN 3 THEN 44100 WHEN 4 THEN 44100
        |       WHEN 5 THEN 8000 WHEN 6 THEN 48000 END AS INTEGER)
        |    AS sample_rate,
        |  CAST(CASE WHEN kind IN (1, 5) THEN 1
        |       WHEN kind < 7 THEN 2 END AS INTEGER) AS channels,
        |  CASE WHEN kind IN (3, 4) THEN 'vbr'
        |       WHEN kind < 7 THEN 'cbr' END AS mode,
        |  CAST(CASE kind WHEN 0 THEN 128 WHEN 1 THEN 64 WHEN 2 THEN 64
        |       WHEN 5 THEN 40 WHEN 6 THEN 160 END AS INTEGER) AS kbps,
        |  CASE WHEN kind < 7 THEN
        |    CAST(n AS BIGINT) *
        |      (CASE WHEN kind IN (2, 5) THEN 576 ELSE 1152 END) * 1000
        |      // (CASE kind WHEN 0 THEN 44100 WHEN 1 THEN 32000
        |          WHEN 2 THEN 22050 WHEN 3 THEN 44100 WHEN 4 THEN 44100
        |          WHEN 5 THEN 8000 WHEN 6 THEN 48000 END)
        |  END AS duration_ms,
        |  CAST(CASE kind WHEN 4 THEN n - 1 WHEN 6 THEN n END
        |    AS INTEGER) AS vbr_frames,
        |  CASE WHEN kind < 7 THEN kind IN (1, 6) END AS id3v2,
        |  CASE WHEN kind < 7 THEN kind IN (2, 6) END AS id3v1,
        |  CASE WHEN kind = 7 THEN
        |    CASE (doc_id // 8) % 4 WHEN 0 THEN 'free-format'
        |         WHEN 1 THEN 'layer' ELSE 'malformed' END END AS err
        |FROM base ORDER BY media_id""".stripMargin,

    "multimodal_webp" ->
      """WITH wbase AS (
        |  SELECT doc_id, CAST(doc_id % 6 AS INTEGER) AS kind,
        |    CAST(doc_id % 14 + 2 AS INTEGER) AS w,
        |    CAST(doc_id % 9 + 2 AS INTEGER) AS h
        |  FROM documents),
        |wser AS (SELECT i FROM generate_series(0, 599) t(i)),
        |wpx AS (
        |  SELECT b.doc_id, t.i,
        |    CASE
        |      WHEN t.i % 4 = 3 THEN
        |        CASE WHEN b.kind = 3 THEN 255
        |             ELSE (b.doc_id*19) % 256 END
        |      WHEN t.i % 4 = 1 THEN
        |        CASE WHEN b.kind = 1
        |          THEN (b.doc_id*29
        |                + ((b.doc_id + (t.i // 4) % b.w) % 4)*53) % 256
        |          ELSE (b.doc_id*11 + 3
        |                + ((b.doc_id + t.i // 4) % 2)*97) % 256 END
        |      WHEN t.i % 4 = 0 THEN
        |        CASE WHEN b.kind = 3
        |          THEN ((b.doc_id*11 + 3
        |                 + ((b.doc_id + t.i // 4) % 2)*97) % 256
        |                + b.doc_id*7) % 256
        |          ELSE (b.doc_id*13) % 256 END
        |      ELSE
        |        CASE WHEN b.kind = 3
        |          THEN ((b.doc_id*11 + 3
        |                 + ((b.doc_id + t.i // 4) % 2)*97) % 256
        |                + b.doc_id*3) % 256
        |          ELSE (b.doc_id*17) % 256 END
        |    END AS v
        |  FROM wbase b JOIN wser t ON t.i < b.w * b.h * 4
        |  WHERE b.kind IN (0, 1, 2, 3))
        |SELECT b.doc_id AS media_id,
        |  CASE WHEN b.kind >= 4 THEN NULL ELSE b.w END AS width,
        |  CASE WHEN b.kind >= 4 THEN NULL ELSE b.h END AS height,
        |  CASE WHEN b.kind >= 4 THEN NULL
        |       ELSE CAST(4 AS INTEGER) END AS channels,
        |  g.px_sum, g.px_chk
        |FROM wbase b LEFT JOIN (
        |  SELECT doc_id, CAST(sum(v) AS BIGINT) AS px_sum,
        |         CAST(sum((v + 1) * (i + 1)) AS BIGINT) AS px_chk
        |  FROM wpx GROUP BY doc_id) g ON g.doc_id = b.doc_id
        |ORDER BY media_id""".stripMargin,

    // the end-to-end multimodal chain, replayed in full: closed-form
    // pixels per container kind -> the resize's floor-index sample
    // positions -> per-cell gray-sums (the 16-dim vectors) -> exact
    // cosine top-5 per query (parity probe; garbage never indexed,
    // self excluded)
    "pipeline_multimodal" ->
      """WITH mb AS (
        |  SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS kind,
        |    CAST(doc_id % 13 + 4 AS BIGINT) AS w,
        |    CAST(doc_id % 9 + 4 AS BIGINT) AS h,
        |    CAST(doc_id % 51 + 2 AS BIGINT) AS ne
        |  FROM documents WHERE doc_id % 4 <> 3),
        |cell AS (SELECT i FROM generate_series(0, 15) t(i)),
        |vpos AS (
        |  SELECT m.doc_id, t.i, m.kind, m.ne,
        |    ((t.i // 4) * m.h // 4) * m.w + ((t.i % 4) * m.w // 4) AS p
        |  FROM mb m, cell t),
        |vec0 AS (
        |  SELECT doc_id, i,
        |    CASE kind
        |      WHEN 0 THEN
        |        (doc_id*31 + (p*3 + 0)*7) % 256 +
        |        (doc_id*31 + (p*3 + 1)*7) % 256 +
        |        (doc_id*31 + (p*3 + 2)*7) % 256
        |      WHEN 1 THEN
        |        (doc_id*13 + (((doc_id*31 + p*7) % ne)*3 + 0)*5) % 256 +
        |        (doc_id*13 + (((doc_id*31 + p*7) % ne)*3 + 1)*5) % 256 +
        |        (doc_id*13 + (((doc_id*31 + p*7) % ne)*3 + 2)*5) % 256
        |      ELSE
        |        (doc_id*13) % 256 +
        |        (doc_id*11 + 3 + ((doc_id + p) % 2)*97) % 256 +
        |        (doc_id*17) % 256
        |    END AS v
        |  FROM vpos),
        |emb AS (SELECT doc_id, (list(v ORDER BY i))::DOUBLE[] AS vec
        |        FROM vec0 GROUP BY doc_id),
        |q AS (SELECT doc_id AS q_id, vec AS q_vec FROM emb
        |      WHERE doc_id < 6),
        |scored AS (
        |  SELECT q.q_id, c.doc_id AS neighbor_id,
        |         list_dot_product(c.vec, q.q_vec) /
        |         (sqrt(list_dot_product(c.vec, c.vec)) *
        |          sqrt(list_dot_product(q.q_vec, q.q_vec))) AS sim
        |  FROM emb c CROSS JOIN q WHERE c.doc_id <> q.q_id),
        |r AS (SELECT q_id, neighbor_id,
        |        CAST(row_number() OVER (PARTITION BY q_id
        |          ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
        |      FROM scored)
        |SELECT q_id, neighbor_id, rank FROM r WHERE rank <= 5
        |ORDER BY q_id, neighbor_id""".stripMargin,

    // lossy JPEG: the oracle pins the exactly-checkable facts — planted
    // dimensions/channel counts per kind, and the cross-decoder
    // agreement gate computed in-engine against the JDK's independent
    // decoder (true everywhere; garbage kind 4 nulls all facts)
    // kinds (doc_id % 7): 0 own gray+restarts, 1 own 4:4:4 color,
    // 2 ImageIO gray, 3 ImageIO flat-chroma color, 4 garbage,
    // 5 ImageIO PROGRESSIVE gray, 6 ImageIO PROGRESSIVE flat-chroma
    "multimodal_jpeg" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 7 = 4 THEN NULL
        |       ELSE CAST(doc_id % 21 + 1 AS INTEGER) END AS width,
        |  CASE WHEN doc_id % 7 = 4 THEN NULL
        |       ELSE CAST(doc_id % 13 + 1 AS INTEGER) END AS height,
        |  CASE WHEN doc_id % 7 = 4 THEN NULL
        |       WHEN doc_id % 7 IN (0, 2, 5) THEN CAST(1 AS INTEGER)
        |       ELSE CAST(3 AS INTEGER) END AS channels,
        |  CASE WHEN doc_id % 7 = 4 THEN NULL ELSE true END AS agree_ok
        |FROM documents ORDER BY media_id""".stripMargin,

    // PCM stats by construction: the oracle re-enumerates the waveform
    // from the planted closed form (8-bit: (doc_id*17+s*29)%251-125;
    // 16-bit: (doc_id*23+s*97)%60001-30000) and recomputes energy, peak
    // and per-channel strict-sign-flip zero crossings. Truncated-data
    // (kind 2) and garbage (kind 3) rows null every fact.
    "multimodal_pcm" ->
      """WITH pbase AS (
        |  SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS kind,
        |         CAST(doc_id % 2 + 1 AS INTEGER) AS ch,
        |         CAST((doc_id // 2) % 2 * 8 + 8 AS INTEGER) AS bits,
        |         CAST(8000 + doc_id % 7 * 500 AS INTEGER) AS rate,
        |         CAST((doc_id % 41 + 10) * (doc_id % 2 + 1) AS BIGINT) AS n
        |  FROM documents),
        |pser AS (SELECT s FROM generate_series(0, 99) t(s)),
        |pcmidx AS (
        |  SELECT b.doc_id, t.s,
        |    CASE WHEN b.bits = 8 THEN (b.doc_id*17 + t.s*29) % 251 - 125
        |         ELSE (b.doc_id*23 + t.s*97) % 60001 - 30000 END AS v,
        |    CASE WHEN t.s >= b.ch THEN
        |      CASE WHEN b.bits = 8
        |           THEN (b.doc_id*17 + (t.s - b.ch)*29) % 251 - 125
        |           ELSE (b.doc_id*23 + (t.s - b.ch)*97) % 60001 - 30000 END
        |    END AS pv
        |  FROM pbase b JOIN pser t ON t.s < b.n
        |  WHERE b.kind < 2),
        |pagg AS (
        |  SELECT doc_id, CAST(sum(v) AS BIGINT) AS s_sum,
        |         CAST(sum(v*v) AS BIGINT) AS s_sumsq,
        |         CAST(sum(CASE WHEN pv IS NOT NULL AND v*pv < 0
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross,
        |         CAST(max(abs(v)) AS INTEGER) AS peak
        |  FROM pcmidx GROUP BY 1)
        |SELECT b.doc_id AS media_id,
        |  CASE WHEN b.kind < 2 THEN b.rate END AS sample_rate,
        |  CASE WHEN b.kind < 2 THEN b.ch END AS channels,
        |  CASE WHEN b.kind < 2 THEN b.bits END AS bits,
        |  CASE WHEN b.kind < 2 THEN b.n END AS n_samples,
        |  a.s_sum, a.s_sumsq, a.zero_cross, a.peak
        |FROM pbase b LEFT JOIN pagg a USING (doc_id)
        |ORDER BY media_id""".stripMargin,

    "text_normalize" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         replace(replace(text, 'e', 'e' || chr(769)), ' ', '  ')
        |           || chr(7) AS noisy
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(
        |           nfc_normalize(noisy),
        |           '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |         '\s+', ' ', 'g')) AS clean
        |  FROM t)
        |SELECT doc_id, md5(clean) AS md5_clean,
        |       CAST(length(clean) AS BIGINT) AS n_clean
        |FROM c ORDER BY doc_id""".stripMargin,

    "text_bpe_train" -> {
      val steps = 10
      val unions = (1 to steps).map { i =>
        s"""SELECT CAST($i AS BIGINT) AS step,
           |  string_split(substring(pair, 2, length(pair) - 2),
           |    chr(2) || chr(1))[1] AS lhs,
           |  string_split(substring(pair, 2, length(pair) - 2),
           |    chr(2) || chr(1))[2] AS rhs,
           |  pc AS pair_count FROM b$i""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH ${bpeTrainCtes(steps)}\nSELECT * FROM (\n$unions\n) ORDER BY step"
    },

    "text_bpe_encode" -> {
      val steps = 10
      // the trained rules applied to every doc: d0 encodes each doc as the
      // concatenation of its words' wrapped symbol sequences; each step's
      // winning pair (b_i) is one literal replace, chained 10 deep — the
      // same map-only expression Spark runs
      val applied = (1 to steps).foldLeft("enc") { (acc, i) =>
        s"replace($acc, (SELECT pair FROM b$i),\n" +
          s"      (SELECT replace(pair, chr(2) || chr(1), '') FROM b$i))"
      }
      // concatenated, NOT an outer stripMargin: the interpolated CTEs
      // contain lines beginning with `||` whose first pipe a second
      // stripMargin pass would eat
      val tail =
        s"""d0 AS MATERIALIZED (
           |  SELECT doc_id, array_to_string(list_transform(
           |    list_filter($normToks, w -> length(w) > 0),
           |    w -> array_to_string(list_transform(string_split(w, ''),
           |           c -> chr(1) || c || chr(2)), '')
           |         || chr(1) || '</w>' || chr(2)), '') AS enc
           |  FROM documents),
           |e AS (SELECT doc_id, $applied AS enc FROM d0)
           |SELECT doc_id,
           |  CAST(CASE WHEN length(enc) = 0 THEN 0
           |       ELSE len(string_split(substring(enc, 2, length(enc) - 2),
           |                 chr(2) || chr(1))) END AS BIGINT) AS n_bpe,
           |  md5(enc) AS enc_md5
           |FROM e ORDER BY doc_id""".stripMargin
      s"WITH ${bpeTrainCtes(steps)},\n$tail"
    },

    "text_bpe_ids" -> {
      val steps = 10
      val tail =
        s"""tok AS (
           |  SELECT doc_id,
           |    unnest(string_split(substring(enc, 2, length(enc) - 2),
           |      chr(2) || chr(1))) AS symbol,
           |    unnest(range(0, CAST(length(enc)
           |      - length(replace(enc, chr(1), '')) AS BIGINT))) AS pos
           |  FROM e WHERE length(enc) > 0)
           |SELECT doc_id, pos, token_id
           |FROM tok JOIN vocab USING (symbol)
           |ORDER BY doc_id, pos""".stripMargin
      s"WITH ${bpeTrainCtes(steps)},\n${bpeVocabEncodeCtes(steps)},\n$tail"
    },

    // independent DuckDB retrain-and-encode — a hash match proves the
    // engine's encode-from-persisted-artifact path ≡ train-and-encode
    // (bytes via md5, vocabulary ids via the exact per-doc id sum)
    "tokenize_from_artifact" -> {
      val steps = 10
      val tail =
        s"""tok AS (
           |  SELECT doc_id,
           |    unnest(string_split(substring(enc, 2, length(enc) - 2),
           |      chr(2) || chr(1))) AS symbol
           |  FROM e WHERE length(enc) > 0),
           |sids AS (
           |  SELECT doc_id, CAST(sum(token_id) AS BIGINT) AS sum_ids
           |  FROM tok JOIN vocab USING (symbol) GROUP BY doc_id)
           |SELECT e.doc_id,
           |  CAST(CASE WHEN length(enc) = 0 THEN 0
           |       ELSE len(string_split(substring(enc, 2, length(enc) - 2),
           |                 chr(2) || chr(1))) END AS BIGINT) AS n_bpe,
           |  md5(enc) AS enc_md5,
           |  coalesce(sids.sum_ids, 0) AS sum_ids
           |FROM e LEFT JOIN sids ON e.doc_id = sids.doc_id
           |ORDER BY e.doc_id""".stripMargin
      s"WITH ${bpeTrainCtes(steps)},\n${bpeVocabEncodeCtes(steps)},\n$tail"
    },

    "text_vocab" ->
      s"""WITH tok AS (
         |  SELECT unnest($normToks) AS token FROM documents),
         |c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
         |top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 200)
         |SELECT token, cnt,
         |       CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT)
         |         AS rank
         |FROM top ORDER BY rank""".stripMargin,

    "sample_topquality" -> {
      val stop = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, source, $normToks AS toks FROM documents),
         |f AS (
         |  SELECT doc_id, source,
         |         len(toks) AS n_tokens,
         |         CAST(len(list_filter(toks, t -> t IN ($stop))) AS DOUBLE)
         |           / len(toks) AS stopword_ratio,
         |         CAST(len(list_distinct(toks)) AS DOUBLE)
         |           / len(toks) AS distinct_ratio
         |  FROM t),
         |q AS (
         |  SELECT doc_id, source,
         |         round((least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
         |                + distinct_ratio
         |                + (1.0 - abs(stopword_ratio - 0.4))) / 3.0, 6)
         |           AS quality
         |  FROM f),
         |qq AS (SELECT doc_id, source, quality,
         |              CAST(round(quality * 1e6) AS BIGINT) AS qi FROM q),
         |thr AS (SELECT source, quantile_cont(qi, 0.75) AS thr
         |        FROM qq GROUP BY 1)
         |SELECT qq.doc_id, qq.source, qq.quality
         |FROM qq JOIN thr ON qq.source = thr.source
         |WHERE qq.qi >= thr.thr
         |ORDER BY doc_id""".stripMargin
    },

    "sample_fraction" ->
      s"""SELECT doc_id, source FROM documents
         |WHERE md5(CAST(doc_id AS VARCHAR)) < '${Sampling.fracThreshold(0.25)}'
         |ORDER BY doc_id""".stripMargin,

    "sample_mixture" -> {
      val cases = mixtureWeights.toSeq.sortBy(_._1).map { case (src, f) =>
        s"WHEN source = '$src' THEN '${Sampling.fracThreshold(f)}'"
      }.mkString("\n         ")
      s"""SELECT doc_id, source FROM documents
         |WHERE md5(CAST(doc_id AS VARCHAR)) <
         |  CASE $cases
         |       ELSE '${Sampling.fracThreshold(0.0)}' END
         |ORDER BY doc_id""".stripMargin
    },

    "pack_shards" ->
      """WITH t AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |s AS (
        |  SELECT doc_id, h,
        |         CAST(('0x' || substring(h, 1, 6)) AS BIGINT) % 8 AS shard
        |  FROM t)
        |SELECT doc_id, shard,
        |       row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,

    "text_pii" -> {
      val counts = TextOps.piiPatterns.map { case (kind, pattern, _) =>
        s"CAST(len(regexp_extract_all(t, '$pattern')) AS BIGINT) AS n_${kind}s"
      }.mkString(",\n       ")
      val redacted = TextOps.piiPatterns.foldLeft("t") {
        case (acc, (_, pattern, repl)) =>
          s"regexp_replace($acc, '$pattern', '$repl', 'g')"
      }
      s"""WITH aug AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 5 <> 0 THEN ' contact user' ||
         |      CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' call +1-555-' ||
         |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
         |      lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
         |    CASE WHEN doc_id % 7 = 0 THEN ' ssn ' ||
         |      CAST(doc_id % 900 + 100 AS VARCHAR) || '-' ||
         |      CAST(doc_id % 90 + 10 AS VARCHAR) || '-' ||
         |      CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END ||
         |    CASE WHEN doc_id % 2 = 0 THEN ' from 10.' ||
         |      CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
         |      CAST(doc_id * 3 % 256 AS VARCHAR) ELSE '' END AS t
         |  FROM documents)
         |SELECT doc_id,
         |       $counts,
         |       md5($redacted) AS redacted_md5
         |FROM aug ORDER BY doc_id""".stripMargin
    },

    "text_unigram_lm" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($normToks) AS term FROM documents),
         |freq AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM freq)
         |SELECT doc_id, count(*) AS n_tokens,
         |       round(avg(ln(CAST(cnt AS DOUBLE) / total)), 4) AS avg_logprob
         |FROM toks JOIN freq USING (term) CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_bigram_lm" ->
      s"""WITH t AS (SELECT doc_id, $normToks AS toks FROM documents),
         |b AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
         |      FROM t, unnest(range(1, len(toks))) AS r(i)
         |      WHERE len(toks) >= 2),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |       round(avg(ln(CAST(c12 AS DOUBLE) / c1)), 4) AS avg_logprob
         |FROM b JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // PMI replay: same counts, same fixed-order double arithmetic
    // ((c12*T*T) / (B*c1*c2), products left-to-right), same 4-decimal
    // rounding BEFORE the (pmi desc, w1, w2) rank
    "text_pmi_bigrams" ->
      s"""WITH t AS (SELECT doc_id, $normToks AS toks FROM documents),
         |b AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
         |      FROM t, unnest(range(1, len(toks))) AS r(i)
         |      WHERE len(toks) >= 2),
         |uc AS (SELECT w, CAST(count(*) AS BIGINT) AS cw FROM (
         |         SELECT unnest(toks) AS w FROM t) GROUP BY 1),
         |pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
         |       FROM b GROUP BY 1, 2),
         |tot AS (SELECT (SELECT CAST(sum(n_pair) AS BIGINT) FROM pc) AS bb,
         |               (SELECT CAST(sum(cw) AS BIGINT) FROM uc) AS tt),
         |scored AS (
         |  SELECT pc.w1, pc.w2, pc.n_pair,
         |         round(ln((CAST(pc.n_pair AS DOUBLE) * tot.tt * tot.tt)
         |           / (CAST(tot.bb AS DOUBLE) * u1.cw * u2.cw)), 4) AS pmi
         |  FROM pc
         |  JOIN uc u1 ON u1.w = pc.w1
         |  JOIN uc u2 ON u2.w = pc.w2
         |  CROSS JOIN tot
         |  WHERE pc.n_pair >= 5),
         |r AS (SELECT w1, w2, n_pair, pmi,
         |        CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2)
         |          AS INTEGER) AS rk
         |      FROM scored)
         |SELECT w1, w2, n_pair, pmi, rk FROM r WHERE rk <= 20
         |ORDER BY w1, w2""".stripMargin,

    // maintained-store stats == the END corpus: n_docs, sum of token
    // counts (== n_postings by the one-entry-per-occurrence invariant),
    // distinct tokens
    "text_bm25_stats" ->
      s"""WITH t AS (SELECT doc_id, $normToks AS toks FROM documents)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(len(toks)) AS BIGINT) AS total_dl,
         |       (SELECT CAST(count(DISTINCT w) AS BIGINT) FROM (
         |          SELECT unnest(toks) AS w FROM t)) AS n_terms,
         |       CAST(sum(len(toks)) AS BIGINT) AS n_postings
         |FROM t""".stripMargin,

    "text_backoff_lm" -> {
      // alpha literals generated from the SAME Scala doubles the query
      // uses (0.4*0.4 = 0.16000000000000003, not "0.16")
      val alpha = 0.4
      val (aS, a2S) = (alpha.toString, (alpha * alpha).toString)
      s"""WITH t AS (SELECT doc_id, $normToks AS toks FROM documents),
         |tri AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2,
         |               toks[i + 2] AS w3
         |        FROM t, unnest(range(1, len(toks) - 1)) AS r(i)
         |        WHERE len(toks) >= 3),
         |bi AS (SELECT doc_id, toks[i] AS wa, toks[i + 1] AS wb
         |       FROM t, unnest(range(1, len(toks))) AS r(i)
         |       WHERE len(toks) >= 2),
         |uni AS (SELECT doc_id, unnest(toks) AS w FROM t),
         |tr3 AS (SELECT w1, w2, w3, count(*) AS c123 FROM tri
         |        WHERE doc_id % 10 != 7 GROUP BY 1, 2, 3),
         |tr2 AS (SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12
         |        FROM tr3 GROUP BY 1, 2),
         |b2 AS (SELECT wa, wb, count(*) AS c23 FROM bi
         |       WHERE doc_id % 10 != 7 GROUP BY 1, 2),
         |b1 AS (SELECT wa, CAST(sum(c23) AS BIGINT) AS c2
         |       FROM b2 GROUP BY 1),
         |u1 AS (SELECT w, count(*) AS c3 FROM uni
         |       WHERE doc_id % 10 != 7 GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |               CAST(count(DISTINCT w) AS BIGINT) AS v
         |        FROM uni WHERE doc_id % 10 != 7),
         |s AS (SELECT b.doc_id,
         |        CASE WHEN tr3.c123 IS NOT NULL
         |               THEN ln(CAST(tr3.c123 AS DOUBLE) / tr2.c12)
         |             WHEN b2.c23 IS NOT NULL
         |               THEN ln($aS * (CAST(b2.c23 AS DOUBLE) / b1.c2))
         |             ELSE ln($a2S *
         |               (CAST(COALESCE(u1.c3, 0) + 1 AS DOUBLE)
         |                / (tot.n + tot.v))) END AS lp
         |      FROM (SELECT * FROM tri WHERE doc_id % 10 = 7) b
         |      LEFT JOIN tr3 USING (w1, w2, w3)
         |      LEFT JOIN tr2 USING (w1, w2)
         |      LEFT JOIN b2 ON b.w2 = b2.wa AND b.w3 = b2.wb
         |      LEFT JOIN b1 ON b.w2 = b1.wa
         |      LEFT JOIN u1 ON b.w3 = u1.w
         |      CROSS JOIN tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |       round(avg(lp), 4) AS avg_logprob
         |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // snapshot drift: even vs odd doc ids per source — length means,
    // vocab Jaccard via the (source, token, side) presence table, and
    // the embedding-mean L2 shift over per-position ROUNDED means (the
    // rounding before the fixed-order norm is what makes the double
    // arithmetic replay bit-for-bit)
    "corpus_drift" ->
      s"""WITH b AS (SELECT source,
         |             CASE WHEN doc_id % 2 = 0 THEN 'old' ELSE 'new' END
         |               AS side,
         |             $normToks AS toks FROM documents),
         |lens AS (SELECT source,
         |    CAST(sum(CASE WHEN side = 'old' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_old,
         |    CAST(sum(CASE WHEN side = 'new' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_new,
         |    round(avg(CASE WHEN side = 'old' THEN len(toks) END), 4)
         |      AS len_mean_old,
         |    round(avg(CASE WHEN side = 'new' THEN len(toks) END), 4)
         |      AS len_mean_new
         |  FROM b GROUP BY source),
         |v AS (SELECT source, w,
         |        max(CASE WHEN side = 'old' THEN 1 ELSE 0 END) AS o,
         |        max(CASE WHEN side = 'new' THEN 1 ELSE 0 END) AS n
         |      FROM (SELECT source, side, unnest(toks) AS w FROM b)
         |      GROUP BY source, w),
         |vj AS (SELECT source,
         |         round(CAST(sum(o * n) AS DOUBLE) / count(*), 6)
         |           AS vocab_jaccard
         |       FROM v GROUP BY source),
         |ex AS (SELECT CASE WHEN vec_id % 2 = 0 THEN 'old' ELSE 'new' END
         |         AS side, i - 1 AS pos, (embedding::DOUBLE[])[i] AS x
         |       FROM embeddings,
         |            unnest(range(1, len(embedding) + 1)) AS r(i)),
         |mm AS (SELECT pos,
         |         round(avg(CASE WHEN side = 'old' THEN x END), 6) AS mo,
         |         round(avg(CASE WHEN side = 'new' THEN x END), 6) AS mn
         |       FROM ex GROUP BY pos),
         |sh AS (SELECT round(sqrt(sum((mo - mn) * (mo - mn))), 6)
         |         AS emb_shift FROM mm)
         |SELECT lens.source, n_old, n_new, len_mean_old, len_mean_new,
         |       vocab_jaccard, emb_shift
         |FROM lens JOIN vj USING (source) CROSS JOIN sh
         |ORDER BY source""".stripMargin,

    // the drift-response verdict: corpus_drift's signal replay with the
    // staged embedding drift (x*0.01 + 2.0 on odd vec_ids, applied in
    // DOUBLE inside the signal on both engines) + the threshold policy.
    // skew_exceeded is pinned TRUE: the k-means layout skew is the one
    // leg an oracle cannot recompute, but the fixture guarantees it by
    // construction — every drifted vector lies in a 0.01-radius cosine
    // ball around the 1-direction, so a single trained centroid absorbs
    // the whole new half and max_cluster/n >= ~0.5 > the 0.25 policy
    "pipeline_drift_response" ->
      s"""WITH b AS (SELECT source,
         |             CASE WHEN doc_id % 2 = 0 THEN 'old' ELSE 'new' END
         |               AS side,
         |             $normToks AS toks FROM documents),
         |lens AS (SELECT source,
         |    round(avg(CASE WHEN side = 'old' THEN len(toks) END), 4)
         |      AS len_mean_old,
         |    round(avg(CASE WHEN side = 'new' THEN len(toks) END), 4)
         |      AS len_mean_new
         |  FROM b GROUP BY source),
         |v AS (SELECT source, w,
         |        max(CASE WHEN side = 'old' THEN 1 ELSE 0 END) AS o,
         |        max(CASE WHEN side = 'new' THEN 1 ELSE 0 END) AS n
         |      FROM (SELECT source, side, unnest(toks) AS w FROM b)
         |      GROUP BY source, w),
         |vj AS (SELECT source,
         |         round(CAST(sum(o * n) AS DOUBLE) / count(*), 6)
         |           AS vocab_jaccard
         |       FROM v GROUP BY source),
         |ex AS (SELECT vec_id % 2 = 1 AS isnew, i - 1 AS pos,
         |         CASE WHEN vec_id % 2 = 1
         |           THEN (embedding::DOUBLE[])[i] * 0.01 + 2.0
         |           ELSE (embedding::DOUBLE[])[i] END AS x
         |       FROM embeddings,
         |            unnest(range(1, len(embedding) + 1)) AS r(i)),
         |mm AS (SELECT pos,
         |         round(avg(CASE WHEN NOT isnew THEN x END), 6) AS mo,
         |         round(avg(CASE WHEN isnew THEN x END), 6) AS mn
         |       FROM ex GROUP BY pos),
         |sh AS (SELECT round(sqrt(sum((mo - mn) * (mo - mn))), 6)
         |         AS emb_shift FROM mm),
         |per AS (SELECT lens.source, len_mean_old, len_mean_new,
         |          vocab_jaccard, emb_shift,
         |          abs(len_mean_new - len_mean_old) > len_mean_old * 0.1
         |            AS len_exceeded,
         |          vocab_jaccard < 0.5 AS vocab_exceeded,
         |          emb_shift > 0.5 AS emb_exceeded,
         |          TRUE AS skew_exceeded
         |        FROM lens JOIN vj USING (source) CROSS JOIN sh),
         |anyf AS (SELECT max(CASE WHEN len_exceeded OR vocab_exceeded
         |             OR emb_exceeded OR skew_exceeded THEN 1 ELSE 0 END)
         |           AS anyv FROM per)
         |SELECT source, len_mean_old, len_mean_new, vocab_jaccard,
         |       emb_shift, len_exceeded, vocab_exceeded, emb_exceeded,
         |       skew_exceeded,
         |       CASE WHEN anyv = 1 THEN 'retrain' ELSE 'hold' END
         |         AS decision
         |FROM per CROSS JOIN anyf ORDER BY source""".stripMargin,

    // CCNet perplexity bucketing: the backoff-LM replay scores ALL docs
    // (not just the held-out slice), then per-source tercile thresholds
    // come from the score at doc-rank ceil(n/3) / ceil(2n/3) — the value
    // at a doc rank is well-defined whatever the tie order, and equals
    // the engine's histogram-cumulative threshold; boundary ties share
    // the boundary bucket (threshold semantics)
    "pipeline_ppl_buckets" -> {
      val alpha = 0.4
      val (aS, a2S) = (alpha.toString, (alpha * alpha).toString)
      s"""WITH t AS (SELECT doc_id, $normToks AS toks FROM documents),
         |tri AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2,
         |               toks[i + 2] AS w3
         |        FROM t, unnest(range(1, len(toks) - 1)) AS r(i)
         |        WHERE len(toks) >= 3),
         |bi AS (SELECT doc_id, toks[i] AS wa, toks[i + 1] AS wb
         |       FROM t, unnest(range(1, len(toks))) AS r(i)
         |       WHERE len(toks) >= 2),
         |uni AS (SELECT doc_id, unnest(toks) AS w FROM t),
         |tr3 AS (SELECT w1, w2, w3, count(*) AS c123 FROM tri
         |        WHERE doc_id % 10 != 7 GROUP BY 1, 2, 3),
         |tr2 AS (SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12
         |        FROM tr3 GROUP BY 1, 2),
         |b2 AS (SELECT wa, wb, count(*) AS c23 FROM bi
         |       WHERE doc_id % 10 != 7 GROUP BY 1, 2),
         |b1 AS (SELECT wa, CAST(sum(c23) AS BIGINT) AS c2
         |       FROM b2 GROUP BY 1),
         |u1 AS (SELECT w, count(*) AS c3 FROM uni
         |       WHERE doc_id % 10 != 7 GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |               CAST(count(DISTINCT w) AS BIGINT) AS v
         |        FROM uni WHERE doc_id % 10 != 7),
         |s AS (SELECT b.doc_id,
         |        CASE WHEN tr3.c123 IS NOT NULL
         |               THEN ln(CAST(tr3.c123 AS DOUBLE) / tr2.c12)
         |             WHEN b2.c23 IS NOT NULL
         |               THEN ln($aS * (CAST(b2.c23 AS DOUBLE) / b1.c2))
         |             ELSE ln($a2S *
         |               (CAST(COALESCE(u1.c3, 0) + 1 AS DOUBLE)
         |                / (tot.n + tot.v))) END AS lp
         |      FROM tri b
         |      LEFT JOIN tr3 USING (w1, w2, w3)
         |      LEFT JOIN tr2 USING (w1, w2)
         |      LEFT JOIN b2 ON b.w2 = b2.wa AND b.w3 = b2.wb
         |      LEFT JOIN b1 ON b.w2 = b1.wa
         |      LEFT JOIN u1 ON b.w3 = u1.w
         |      CROSS JOIN tot),
         |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |         round(avg(lp), 4) AS avg_logprob
         |       FROM s GROUP BY doc_id),
         |j AS (SELECT sc.doc_id, d.source, sc.n_trigrams, sc.avg_logprob
         |      FROM sc JOIN documents d USING (doc_id)),
         |r AS (SELECT source, avg_logprob,
         |        row_number() OVER (PARTITION BY source
         |          ORDER BY avg_logprob DESC) AS rn,
         |        count(*) OVER (PARTITION BY source) AS n
         |      FROM j),
         |th AS (SELECT source,
         |         max(CASE WHEN rn = CAST(ceil(n / 3.0) AS BIGINT)
         |               THEN avg_logprob END) AS t1,
         |         max(CASE WHEN rn = CAST(ceil(n * 2.0 / 3.0) AS BIGINT)
         |               THEN avg_logprob END) AS t2
         |       FROM r GROUP BY source)
         |SELECT j.doc_id, j.source, j.n_trigrams, j.avg_logprob,
         |       CASE WHEN j.avg_logprob >= th.t1 THEN 'head'
         |            WHEN j.avg_logprob >= th.t2 THEN 'middle'
         |            ELSE 'tail' END AS bucket
         |FROM j JOIN th USING (source) ORDER BY doc_id""".stripMargin
    },

    "dedup_decontaminate" ->
      s"""WITH bench AS (
         |  SELECT DISTINCT unnest(${duckShingles(5)}) AS sh
         |  FROM documents WHERE doc_id % 17 = 0),
         |c AS (
         |  SELECT doc_id, unnest(${duckShingles(5)}) AS sh
         |  FROM documents WHERE doc_id % 17 <> 0),
         |h AS (
         |  SELECT c.doc_id, count(*) AS n_hits
         |  FROM c JOIN bench USING (sh) GROUP BY 1)
         |SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
         |       coalesce(h.n_hits, 0) >= 1 AS contaminated
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 17 <> 0) d
         |LEFT JOIN h USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // k=8 rolling windows; range stop n-6 = (n - k + 1) + 1; list_slice
    // end i+7 is inclusive. Zipped unnests give (pos, sig) per window.
    "dedup_substring" ->
      s"""WITH t AS (
         |  SELECT doc_id, $normToks AS toks FROM documents),
         |b AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
         |         list_transform(range(1, len(toks) - 6),
         |           i -> md5(array_to_string(list_slice(toks, i, i + 7), ' '))) AS sigs
         |  FROM t),
         |w AS (
         |  SELECT doc_id, unnest(range(1, len(sigs) + 1)) AS pos,
         |         unnest(sigs) AS sig FROM b),
         |dup AS (SELECT sig FROM w GROUP BY sig HAVING count(*) > 1),
         |h AS (
         |  SELECT w.doc_id, w.pos,
         |         lead(w.pos) OVER (PARTITION BY w.doc_id ORDER BY w.pos) AS nxt
         |  FROM w JOIN dup USING (sig)),
         |c AS (
         |  SELECT doc_id, count(*) AS n_dup_windows,
         |         CAST(sum(CASE WHEN nxt IS NULL THEN 8
         |                       ELSE least(8, nxt - pos) END) AS BIGINT) AS dup_tokens
         |  FROM h GROUP BY 1)
         |SELECT b.doc_id, b.n_toks,
         |       coalesce(c.n_dup_windows, 0) AS n_dup_windows,
         |       coalesce(c.dup_tokens, 0) AS dup_tokens,
         |       round(coalesce(c.dup_tokens, 0) / b.n_toks, 4) AS dup_fraction
         |FROM b LEFT JOIN c USING (doc_id) ORDER BY doc_id""".stripMargin,

    // corpus window-fingerprint SET (docs % 10 <> 7) probed by the batch
    // (docs % 10 = 7); coverage CTEs as in dedup_substring
    "dedup_span_incremental" -> spanIncrementalOracle,

    // the streaming epoch-frozen-store probe must reproduce the batch
    // operator's coverage exactly — ONE oracle string for both
    "dedup_streaming_spans" -> spanIncrementalOracle,

    // rotation folds wave 1's accumulated fingerprints into the next
    // epoch's frozen base, so screening wave 2 (≡ 8 mod 10) must equal
    // the one-shot incremental form over the UNION corpus (all but wave 2)
    "dedup_span_rotate" ->
      spanScreenOracle("doc_id % 10 <> 8", "doc_id % 10 = 8"),

    // same window/dup CTEs as dedup_substring; covered token positions =
    // union of [pos, pos+7] per duplicated window, anti-joined out, and
    // the survivors re-joined in order → md5 must match Spark's rewrite
    "dedup_span_rewrite" ->
      s"""WITH t AS (
         |  SELECT doc_id, $normToks AS toks FROM documents),
         |b AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks, toks,
         |         list_transform(range(1, len(toks) - 6),
         |           i -> md5(array_to_string(list_slice(toks, i, i + 7), ' '))) AS sigs
         |  FROM t),
         |w AS (
         |  SELECT doc_id, unnest(range(1, len(sigs) + 1)) AS pos,
         |         unnest(sigs) AS sig FROM b),
         |dup AS (SELECT sig FROM w GROUP BY sig HAVING count(*) > 1),
         |covered AS (
         |  SELECT DISTINCT doc_id, tpos FROM (
         |    SELECT doc_id, unnest(range(pos, pos + 8)) AS tpos
         |    FROM w JOIN dup USING (sig))),
         |toks AS (
         |  SELECT doc_id, unnest(range(1, len(toks) + 1)) AS tpos,
         |         unnest(toks) AS tok FROM b),
         |kept AS (
         |  SELECT tk.doc_id, count(*) AS n_kept,
         |         md5(string_agg(tk.tok, ' ' ORDER BY tk.tpos)) AS clean_md5
         |  FROM toks tk LEFT JOIN covered c
         |    ON tk.doc_id = c.doc_id AND tk.tpos = c.tpos
         |  WHERE c.tpos IS NULL GROUP BY tk.doc_id)
         |SELECT b.doc_id, b.n_toks,
         |       coalesce(k.n_kept, 0) AS n_kept,
         |       coalesce(k.clean_md5, md5('')) AS clean_md5
         |FROM b LEFT JOIN kept k USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "corpus_sketch" ->
      """SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |       true AS cardinality_ok, true AS p50_ok
        |FROM documents""".stripMargin,

    "dedup_semantic" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings)
        |SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs, true AS recall_ok
        |FROM (
        |  SELECT a.vec_id FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.vec, b.vec) /
        |        (sqrt(list_dot_product(a.vec, a.vec)) *
        |         sqrt(list_dot_product(b.vec, b.vec))) >= 0.4)""".stripMargin,

    // incremental semantic dedup: parity configuration makes the batch
    // probe provably the exact cosine argmax over the standing corpus,
    // so nn/sim/is_dup replay row-level (is_dup tests the UNROUNDED sim,
    // like the Spark side)
    "dedup_semantic_incremental" ->
      """WITH nb AS (SELECT vec_id, embedding::DOUBLE[] AS vec
        |            FROM embeddings WHERE vec_id % 4 = 3),
        |st AS (SELECT vec_id, embedding::DOUBLE[] AS vec
        |       FROM embeddings WHERE vec_id % 4 <> 3),
        |scored AS (
        |  SELECT nb.vec_id, st.vec_id AS nn_id,
        |         list_dot_product(st.vec, nb.vec) /
        |         (sqrt(list_dot_product(st.vec, st.vec)) *
        |          sqrt(list_dot_product(nb.vec, nb.vec))) AS sim
        |  FROM nb CROSS JOIN st),
        |ranked AS (
        |  SELECT vec_id, nn_id, sim,
        |         row_number() OVER (PARTITION BY vec_id
        |                            ORDER BY sim DESC, nn_id) AS rk
        |  FROM scored)
        |SELECT vec_id, nn_id, round(sim, 6) AS sim, sim >= 0.4 AS is_dup
        |FROM ranked WHERE rk = 1 ORDER BY vec_id""".stripMargin,

    // streaming semantic dedup: sequential first-arrival-wins — wave 1
    // (%8=3) scores against the standing corpus, wave 2 (%8=7) against
    // standing PLUS wave 1 (it was ingested before wave 2 arrived);
    // parity configuration makes each probe the exact cosine argmax
    "dedup_semantic_stream" ->
      """WITH st AS (SELECT vec_id, embedding::DOUBLE[] AS vec
        |            FROM embeddings WHERE vec_id % 8 NOT IN (3, 7)),
        |w1 AS (SELECT vec_id, embedding::DOUBLE[] AS vec
        |       FROM embeddings WHERE vec_id % 8 = 3),
        |w2 AS (SELECT vec_id, embedding::DOUBLE[] AS vec
        |       FROM embeddings WHERE vec_id % 8 = 7),
        |scored AS (
        |  SELECT q.vec_id, c.vec_id AS nn_id,
        |         list_dot_product(c.vec, q.vec) /
        |         (sqrt(list_dot_product(c.vec, c.vec)) *
        |          sqrt(list_dot_product(q.vec, q.vec))) AS sim
        |  FROM w1 q CROSS JOIN st c
        |  UNION ALL
        |  SELECT q.vec_id, c.vec_id AS nn_id,
        |         list_dot_product(c.vec, q.vec) /
        |         (sqrt(list_dot_product(c.vec, c.vec)) *
        |          sqrt(list_dot_product(q.vec, q.vec))) AS sim
        |  FROM w2 q CROSS JOIN (SELECT * FROM st
        |                        UNION ALL SELECT * FROM w1) c),
        |ranked AS (
        |  SELECT vec_id, nn_id, sim,
        |         row_number() OVER (PARTITION BY vec_id
        |                            ORDER BY sim DESC, nn_id) AS rk
        |  FROM scored)
        |SELECT vec_id, nn_id, round(sim, 6) AS sim, sim >= 0.4 AS is_dup
        |FROM ranked WHERE rk = 1 ORDER BY vec_id""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 20 ORDER BY source, doc_id""".stripMargin,

    // the oracle IS the naive per-source cumulative window — equality
    // proves the engine's bucketed two-phase prefix sum on real data
    "sample_token_budget" ->
      s"""WITH t AS (SELECT doc_id, source,
         |             CAST(len($normToks) AS BIGINT) AS n_tokens
         |           FROM documents),
         |o AS (
         |  SELECT doc_id, source, n_tokens,
         |         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
         |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS tok_before
         |  FROM t)
         |SELECT doc_id, source, n_tokens, tok_before
         |FROM o WHERE tok_before < 800 ORDER BY doc_id""".stripMargin,

    // sqrt-only arithmetic: every step is correctly-rounded IEEE in both
    // engines, so the 6-rounded fractions and integer hash thresholds
    // match bit-exactly
    "sample_temperature" ->
      s"""WITH t AS (SELECT doc_id, source,
         |             CAST(len($normToks) AS BIGINT) AS n_tokens
         |           FROM documents),
         |p AS (SELECT source, sum(n_tokens) AS tot FROM t
         |      WHERE source IS NOT NULL GROUP BY 1
         |      HAVING sum(n_tokens) > 0),
         |z AS (SELECT sum(sqrt(tot)) AS z FROM p),
         |f AS (SELECT source,
         |        round(least(1.0, 15000 / (z * sqrt(tot))), 6) AS mix_frac
         |      FROM p, z)
         |SELECT doc_id, source, n_tokens, mix_frac
         |FROM t JOIN f USING (source)
         |WHERE mix_frac >= 1.0
         |   OR CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |        AS BIGINT)
         |      < CAST(round(mix_frac * 4294967295) AS BIGINT)
         |ORDER BY doc_id""".stripMargin,

    "sample_weighted_stratified" ->
      s"""WITH t AS (SELECT doc_id, source,
         |             CAST(len($normToks) AS BIGINT) AS n_toks
         |           FROM documents),
         |p AS (SELECT doc_id, source, n_toks,
         |        round(-ln((CAST(('0x' ||
         |            substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
         |            AS BIGINT) + 1) / 4503599627370496.0) / n_toks,
         |          9) AS pr
         |      FROM t WHERE n_toks > 0),
         |r AS (SELECT doc_id, source, n_toks,
         |        CAST(row_number() OVER (PARTITION BY source
         |          ORDER BY pr, doc_id) AS INTEGER) AS rk
         |      FROM p)
         |SELECT doc_id, source, n_toks, rk FROM r WHERE rk <= 10
         |ORDER BY doc_id""".stripMargin,

    "sample_weighted" -> weightedSampleOracle,

    // streaming reservoir: the fold's priority is a pure function of the
    // key, so after the whole stream the persisted sample EQUALS the
    // one-shot weighted race — the oracle is sample_weighted's verbatim
    "sample_streaming" -> weightedSampleOracle,

    "text_chunks" ->
      s"""WITH t AS (
         |  SELECT doc_id, $normToks AS toks FROM documents),
         |c AS (
         |  SELECT doc_id, toks,
         |         greatest(CAST(ceil(CAST(len(toks) - 16 AS DOUBLE) / 48)
         |           AS INTEGER), 1) AS n_chunks
         |  FROM t)
         |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
         |       CAST(len(list_slice(toks, i * 48 + 1, i * 48 + 64)) AS BIGINT)
         |         AS chunk_tokens
         |FROM (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS i FROM c)
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    "pack_sequences" ->
      s"""SELECT doc_id, source, n_tokens,
         |       CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY source
         |         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |         / 2048.0) AS BIGINT) AS pack_id
         |FROM (SELECT doc_id, source,
         |        CAST(len($normToks) AS BIGINT) AS n_tokens FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "pack_contig" ->
      s"""WITH t AS (SELECT doc_id, source,
         |             CAST(len($normToks) AS BIGINT) AS n_tokens
         |           FROM documents),
         |o AS (
         |  SELECT doc_id, source, n_tokens,
         |         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
         |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS off
         |  FROM t WHERE n_tokens > 0),
         |e AS (
         |  SELECT doc_id, source, off, n_tokens,
         |         unnest(range(CAST(floor(off / 512.0) AS BIGINT),
         |           CAST(floor((off + n_tokens - 1) / 512.0) AS BIGINT) + 1))
         |           AS seq_id
         |  FROM o)
         |SELECT doc_id, source, seq_id,
         |       greatest(seq_id * 512 - off, 0) AS tok_start,
         |       least((seq_id + 1) * 512 - off, n_tokens) AS tok_end,
         |       least((seq_id + 1) * 512 - off, n_tokens)
         |         - greatest(seq_id * 512 - off, 0) AS seq_tokens
         |FROM e ORDER BY doc_id, seq_id""".stripMargin,

    "pipeline_curation" -> {
      val stop = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
      val scores = TextOps.langProfiles.map { case (lang, markers) =>
        val set = markers.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, t -> t IN ($set))) AS s_$lang"
      }.mkString(", ")
      val enCond = TextOps.langProfiles.map(_._1).filter(_ != "en")
        .map(l => s"s_en >= s_$l").mkString(" AND ")
      s"""WITH keep AS (
         |  SELECT min(doc_id) AS keep_id FROM documents
         |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
         |t AS (
         |  SELECT doc_id, source, $normToks AS toks
         |  FROM documents JOIN keep ON doc_id = keep_id),
         |f AS (
         |  SELECT doc_id, source, toks, len(toks) AS n_tokens,
         |         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
         |           AS distinct_ratio,
         |         CAST(len(list_filter(toks, t -> t IN ($stop))) AS DOUBLE)
         |           / len(toks) AS stopword_ratio,
         |         $scores
         |  FROM t)
         |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens
         |FROM f
         |WHERE $enCond
         |  AND round((least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) + distinct_ratio
         |        + (1.0 - abs(stopword_ratio - 0.4))) / 3.0, 6) >= 0.6
         |ORDER BY doc_id""".stripMargin
    },

    "pipeline_pretrain" -> pipelinePretrainOracle("documents"),
    // the HTML-ingest variant: the same chain replayed over the
    // oracle's RECONSTRUCTION of what extracting the planted wrapper
    // must yield (htmlExtractedDocsRel — text_extract_html pins the
    // reconstruction byte-for-byte via md5, this pins the composition)
    "pipeline_pretrain_html" ->
      pipelinePretrainOracle(s"($htmlExtractedDocsRel) AS documents"),
    // the PDF-ingest variant: same chain over the reconstruction of
    // what extracting the planted PDFs must yield (text_extract_pdf
    // pins the extraction byte-for-byte, this pins the composition)
    "pipeline_pretrain_pdf" ->
      pipelinePretrainOracle(s"($pdfExtractedDocsRel) AS documents"),

    // extraction facts per planted kind: the eleven success shapes
    // (classic raw/Flate, the PDF 1.5 xref-stream/ObjStm layouts,
    // LZW, the ASCII85→Flate chain, the /Differences font, the
    // CID/ToUnicode font, and the RC4 + AESV2 + AES-256/R6
    // empty-password decrypts) reconstructed as strings (specials via
    // chr(): é=233 €=8364 —=8212 ’=8217 •=8226 ł=322; pages join on
    // chr(12)), the five rejections by NAME with null facts (kind 15
    // is a REAL passworded AES-256 file the empty password cannot
    // open)
    "text_extract_pdf" ->
      """WITH e AS (SELECT doc_id, doc_id % 18 AS kind, text
        |  FROM documents),
        |x AS (SELECT doc_id, kind, CASE kind
        |    WHEN 0 THEN 'Doc ' || doc_id || ' heading.' || chr(10) ||
        |      text || chr(10) || 'caf' || chr(233) || ' ' ||
        |      chr(8364) || ' ' || chr(8212) || ' ' || chr(8217) ||
        |      ' tail'
        |    WHEN 1 THEN 'Doc ' || doc_id || ' page one.' || chr(10) ||
        |      text || chr(12) || 'Doc ' || doc_id || ' page two.'
        |    WHEN 5 THEN 'Doc ' || doc_id || ' modern.' || chr(10) ||
        |      text
        |    WHEN 6 THEN 'Doc ' || doc_id || ' xr one.' || chr(10) ||
        |      text || chr(12) || 'Doc ' || doc_id || ' xr two.'
        |    WHEN 7 THEN 'Doc ' || doc_id || ' lzw.' || chr(10) || text
        |    WHEN 8 THEN 'Doc ' || doc_id || ' chained.' || chr(10) ||
        |      text
        |    WHEN 9 THEN 'Doc ' || doc_id || ' diff.' || chr(10) ||
        |      text || chr(10) || chr(8364) || chr(8226) || chr(322)
        |    WHEN 10 THEN 'Doc ' || doc_id || ' cid.' || chr(10) ||
        |      text
        |    WHEN 12 THEN 'Doc ' || doc_id || ' rc4.' || chr(10) ||
        |      text
        |    WHEN 13 THEN 'Doc ' || doc_id || ' aes.' || chr(10) ||
        |      text
        |    WHEN 14 THEN 'Doc ' || doc_id || ' v5.' || chr(10) ||
        |      text
        |    WHEN 16 THEN 'Doc ' || doc_id || ' inline.' || chr(10) ||
        |      text
        |  END AS t FROM e)
        |SELECT doc_id,
        |  CAST(CASE kind WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 5 THEN 1
        |    WHEN 6 THEN 2 WHEN 7 THEN 1 WHEN 8 THEN 1 WHEN 9 THEN 1
        |    WHEN 10 THEN 1 WHEN 12 THEN 1 WHEN 13 THEN 1
        |    WHEN 14 THEN 1 WHEN 16 THEN 1
        |    END AS INTEGER) AS n_pages,
        |  CASE kind WHEN 2 THEN 'encrypted' WHEN 3 THEN 'type0-font'
        |    WHEN 4 THEN 'filter' WHEN 11 THEN 'malformed'
        |    WHEN 15 THEN 'encrypted'
        |    WHEN 17 THEN 'inline-image' END AS err,
        |  md5(t) AS text_md5,
        |  CAST(length(t) AS BIGINT) AS n_chars
        |FROM x ORDER BY doc_id""".stripMargin,

    "text_extract_html" ->
      s"""WITH e AS (SELECT doc_id, text FROM ($htmlExtractedDocsRel))
         |SELECT doc_id, md5(text) AS md5_text,
         |       CAST(length(text) AS BIGINT) AS n_chars,
         |       CAST(CASE WHEN doc_id % 3 = 0 THEN 5 ELSE 3 END
         |         AS INTEGER) AS n_blocks,
         |       CAST(3 AS INTEGER) AS n_dropped
         |FROM e ORDER BY doc_id""".stripMargin,

    // the jusText contract replayed whole: integer-threshold ladder,
    // cumulative-sum heading distance, window-function neighbor
    // revision, final-good join md5'd — over the same six planted
    // blocks (the filler paragraph only on every third doc)
    "text_extract_main" ->
      s"""WITH ${mainBlocksCtes()},
         |agg AS (
         |  SELECT doc_id, md5(coalesce(string_agg(
         |    CASE WHEN final_class = 'good' THEN btext END, chr(10)
         |    ORDER BY block_idx), '')) AS main_md5
         |  FROM fin GROUP BY doc_id)
         |SELECT f.doc_id, f.block_idx, f.heading, f.n_chars, f.n_words,
         |       f.n_stop, f.link_chars, f.cf_class, f.final_class,
         |       a.main_md5
         |FROM fin f JOIN agg a USING (doc_id)
         |ORDER BY f.doc_id, f.block_idx""".stripMargin,

    // both pins side-by-side: two prefixed block chains whose
    // stopword count is a per-language CASE over the SAME planted
    // lists; v1 knows only English, v2 adds de/es/fr, zh stays dark
    "text_extract_main_artifact" -> {
      def listSql(ws: Seq[String]): String =
        ws.map(w => s"'$w'").mkString("[", ",", "]")
      def caseSql(lists: Map[String, Seq[String]]): String =
        "(CASE lang " + lists.toSeq.sortBy(_._1).map { case (l, ws) =>
          s"WHEN '$l' THEN ${listSql(ws.sorted)}"
        }.mkString(" ") + " ELSE [] END)"
      def agg(p: String, tag: String): String =
        s"""${p}v AS (
           |  SELECT doc_id,
           |    CAST(count(CASE WHEN final_class = 'good' THEN 1 END)
           |      AS BIGINT) AS n_good_$tag,
           |    md5(coalesce(string_agg(
           |      CASE WHEN final_class = 'good' THEN btext END, chr(10)
           |      ORDER BY block_idx), '')) AS main_md5_$tag,
           |    CAST(count(*) AS BIGINT) AS n_blocks_$tag
           |  FROM ${p}fin GROUP BY doc_id)""".stripMargin
      s"""WITH ${mainBlocksCtes("a_", caseSql(stoplistsV1))},
         |${mainBlocksCtes("b_", caseSql(stoplistsV2))},
         |${agg("a_", "v1")},
         |${agg("b_", "v2")}
         |SELECT d.doc_id, d.lang, b.n_blocks_v2 AS n_blocks,
         |  a.n_good_v1, a.main_md5_v1, b.n_good_v2, b.main_md5_v2
         |FROM documents d
         |JOIN a_v a ON d.doc_id = a.doc_id
         |JOIN b_v b ON d.doc_id = b.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // the char-branch contract replayed whole over the planted zh/ja
    // pages: per-block branch selection (2·cjk >= nonws, char lists
    // pinned), the char ladder's halved length gates and 0.15/0.10
    // density rules, the shared promotion/revision tail — block rows
    // from the v3 pin, and BOTH pins' main md5s (the dark pin's word
    // ladder extracts every page to empty)
    "text_extract_main_cjk" ->
      s"""WITH ${cjkMainBlocksCtes("a_", charEnabled = false)},
         |${cjkMainBlocksCtes("b_", charEnabled = true)},
         |a_agg AS (
         |  SELECT doc_id, md5(coalesce(string_agg(
         |    CASE WHEN final_class = 'good' THEN btext END, chr(10)
         |    ORDER BY block_idx), '')) AS main_md5_dark
         |  FROM a_fin GROUP BY doc_id),
         |b_agg AS (
         |  SELECT doc_id, md5(coalesce(string_agg(
         |    CASE WHEN final_class = 'good' THEN btext END, chr(10)
         |    ORDER BY block_idx), '')) AS main_md5_v3
         |  FROM b_fin GROUP BY doc_id)
         |SELECT f.doc_id, f.plang, f.block_idx, f.heading, f.n_chars,
         |  f.n_words, f.n_stop, f.link_chars, f.cf_class,
         |  f.final_class, a.main_md5_dark, b.main_md5_v3
         |FROM b_fin f JOIN a_agg a USING (doc_id)
         |JOIN b_agg b USING (doc_id)
         |ORDER BY f.doc_id, f.block_idx""".stripMargin,

    // the whole Shift_JIS acceptance replayed BY CONSTRUCTION: the
    // planted ja pages' decoded text is the same closed form the
    // fixture encoded (the engine's artifact decode must invert the
    // fixture's encode exactly or every md5 diverges), the char-branch
    // extraction and the en word-ladder extraction run side by side,
    // and the funnel verdict (empty → dup → gate → kept) replays the
    // dedup keeper, the en langid+quality gates and the ja
    // translate-delta char gate
    "pipeline_pretrain_sjis" -> {
      val stop = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
      val scores = TextOps.langProfiles.map { case (lang, markers) =>
        val set = markers.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, t -> t IN ($set))) AS s_$lang"
      }.mkString(", ")
      val enCond = TextOps.langProfiles.map(_._1).filter(_ != "en")
        .map(l => s"f.s_en >= f.s_$l").mkString(" AND ")
      val mainToks = normToks.replace("trim(text)", "trim(main)")
      val jaChars = CjkMainFixture.jaStopChars.mkString
      s"""WITH ${cjkMainBlocksCtes("c_", charEnabled = true,
             plangSql = "'ja'", whereSql = "WHERE doc_id % 3 = 0")},
         |${mainBlocksCtes("e_", textSql = "CASE WHEN doc_id % 5 = 2 " +
             "THEN trim(repeat('the a ', 40)) ELSE text END")},
         |m AS (
         |  SELECT doc_id, 'ja' AS plang, coalesce(string_agg(
         |    CASE WHEN final_class = 'good' THEN btext END, chr(10)
         |    ORDER BY block_idx), '') AS main
         |  FROM c_fin GROUP BY doc_id
         |  UNION ALL
         |  SELECT doc_id, 'en', coalesce(string_agg(
         |    CASE WHEN final_class = 'good' THEN btext END, chr(10)
         |    ORDER BY block_idx), '')
         |  FROM e_fin WHERE doc_id % 3 <> 0 GROUP BY doc_id),
         |norm AS (
         |  SELECT doc_id, plang, main,
         |    CAST(length(main) AS BIGINT) AS n_main,
         |    md5(main) AS main_md5,
         |    md5(regexp_replace(lower(trim(main)), '\\s+', ' ', 'g'))
         |      AS k
         |  FROM m),
         |keep AS (
         |  SELECT k, min(doc_id) AS keep_id FROM norm
         |  WHERE n_main > 0 GROUP BY k),
         |f AS (
         |  SELECT doc_id, len(toks) AS n_tokens,
         |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
         |      AS distinct_ratio,
         |    CAST(len(list_filter(toks, t -> t IN ($stop))) AS DOUBLE)
         |      / len(toks) AS stopword_ratio,
         |    $scores
         |  FROM (SELECT doc_id, $mainToks AS toks FROM norm
         |        WHERE plang = 'en' AND n_main > 0)),
         |jg AS (
         |  SELECT doc_id,
         |    length(main) - length(regexp_replace(main,
         |      '[一-鿿぀-ヿ]', '', 'g')) AS cjk,
         |    length(main) - length(translate(main, '$jaChars', ''))
         |      AS stopc
         |  FROM norm WHERE plang = 'ja' AND n_main > 0)
         |SELECT n.doc_id, n.plang, n.n_main, n.main_md5,
         |  CASE WHEN n.n_main = 0 THEN 'empty'
         |    WHEN n.doc_id <> keep.keep_id THEN 'dup'
         |    WHEN n.plang = 'ja' THEN
         |      CASE WHEN jg.cjk >= 30 AND 100 * jg.stopc >= 8 * jg.cjk
         |        AND 100 * jg.stopc <= 60 * jg.cjk
         |        THEN 'kept' ELSE 'gate' END
         |    ELSE CASE WHEN $enCond AND
         |      round((least(CAST(f.n_tokens AS DOUBLE) / 64.0, 1.0)
         |        + f.distinct_ratio
         |        + (1.0 - abs(f.stopword_ratio - 0.4))) / 3.0, 6)
         |        >= 0.6
         |      THEN 'kept' ELSE 'gate' END END AS stage
         |FROM norm n
         |LEFT JOIN keep ON n.k = keep.k
         |LEFT JOIN f ON n.doc_id = f.doc_id
         |LEFT JOIN jg ON n.doc_id = jg.doc_id
         |ORDER BY n.doc_id""".stripMargin
    },

    // the composed chain over the main-content corpus: the SAME block
    // replay feeds the SAME pretrain replay — furniture-only pages
    // yield empty text, exact-dedup to one keeper, and die at the
    // quality gate, all in SQL
    "pipeline_pretrain_main" ->
      pipelinePretrainOracle(
        s"""(WITH ${mainBlocksCtes()},
           |ag AS (
           |  SELECT doc_id, coalesce(string_agg(
           |    CASE WHEN final_class = 'good' THEN btext END, chr(10)
           |    ORDER BY block_idx), '') AS text
           |  FROM fin GROUP BY doc_id)
           |SELECT a.doc_id, a.text, doc.source
           |FROM ag a JOIN documents doc USING (doc_id)) AS documents"""
          .stripMargin),


    // the weighted scoring replayed IN FULL from the shared profile
    // constant (not just the plant): per language, the sum of its
    // token weights over the doc's tokens, then the argmax chain with
    // first-profile tie-break — v1 only knows en/de, v2 all four
    "text_langid_artifact" -> {
      val (sc1, vd1) = langArtifactVerdictSql(plantedLangProfilesV1, "v1")
      val (sc2, vd2) = langArtifactVerdictSql(plantedLangProfilesV2, "v2")
      s"""WITH e AS (SELECT doc_id,
         |  CASE doc_id % 4
         |    WHEN 0 THEN 'the cat and the dog of the house is to '
         |    WHEN 1 THEN 'der hund und die katze ist das nicht '
         |    WHEN 2 THEN 'el perro que los gatos una casa por '
         |    ELSE 'le chien et les chats une maison dans ' END || text
         |    AS text FROM documents),
         |x AS (SELECT doc_id, $normToks AS toks FROM e),
         |sc AS (SELECT doc_id,
         |  $sc1,
         |  $sc2 FROM x)
         |SELECT doc_id, $vd1 AS lang_v1, $vd2 AS lang_v2
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    // both pins replayed by construction: v1 sees only the base TLD
    // rules (github.io keys as 'github.io', k12.ma.us as 'ma.us'); v2
    // carries the multi-label/wildcard/exception rules, so the SAME
    // hosts re-key — and a host that IS a v2 public suffix has no
    // registrable domain (NULL)
    "text_url_domain_artifact" ->
      """WITH u AS (SELECT doc_id, doc_id % 8 AS kind,
        |  CAST(doc_id % 37 AS VARCHAR) AS n FROM documents)
        |SELECT doc_id,
        |  CASE kind WHEN 0 THEN 'www.site' || n || '.com'
        |    WHEN 1 THEN 'shop.site' || n || '.co.uk'
        |    WHEN 2 THEN 'user' || n || '.github.io'
        |    WHEN 3 THEN 'deep.sub' || n || '.k12.ma.us'
        |    WHEN 4 THEN 'a' || n || '.b.nom.br'
        |    WHEN 5 THEN 'sub.city.kawasaki.jp'
        |    WHEN 6 THEN 'x.other' || n || '.kawasaki.jp'
        |    ELSE 'github.io' END AS host,
        |  CASE kind WHEN 0 THEN 'site' || n || '.com'
        |    WHEN 1 THEN 'site' || n || '.co.uk'
        |    WHEN 2 THEN 'github.io'
        |    WHEN 3 THEN 'ma.us'
        |    WHEN 4 THEN 'nom.br'
        |    WHEN 5 THEN 'kawasaki.jp'
        |    WHEN 6 THEN 'kawasaki.jp'
        |    ELSE 'github.io' END AS domain_v1,
        |  CASE kind WHEN 0 THEN 'site' || n || '.com'
        |    WHEN 1 THEN 'site' || n || '.co.uk'
        |    WHEN 2 THEN 'user' || n || '.github.io'
        |    WHEN 3 THEN 'sub' || n || '.k12.ma.us'
        |    WHEN 4 THEN 'a' || n || '.b.nom.br'
        |    WHEN 5 THEN 'city.kawasaki.jp'
        |    WHEN 6 THEN 'x.other' || n || '.kawasaki.jp'
        |    ELSE NULL END AS domain_v2
        |FROM u ORDER BY doc_id""".stripMargin,

    // the canonical string, host and eTLD+1 by construction: scheme and
    // host lowercased, default port and fragment dropped, tracking
    // params removed, survivors sorted; the multi-label suffixes take
    // three labels, so domain = 'site'||n||sfx uniformly; malformed
    // rows (every 11th) pin NULL through all three columns
    "text_url_canonicalize" ->
      s"""WITH u AS (SELECT doc_id, $urlSuffixCase AS sfx FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 11 = 0 THEN NULL ELSE
         |      (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
         |      || '://www.site' || (doc_id % 37) || sfx
         |      || (CASE WHEN doc_id % 4 <> 0 AND doc_id % 7 = 0
         |            THEN ':8080' ELSE '' END)
         |      || '/A/b' || (doc_id % 9)
         |      || (CASE WHEN doc_id % 3 = 0 THEN '?a=1&z=2'
         |               WHEN doc_id % 3 = 1 THEN '?a=2&b=1'
         |               ELSE '' END)
         |    END AS url_canon,
         |    CASE WHEN doc_id % 11 = 0 THEN NULL
         |         ELSE 'www.site' || (doc_id % 37) || sfx END AS host,
         |    CASE WHEN doc_id % 11 = 0 THEN NULL
         |         ELSE 'site' || (doc_id % 37) || sfx END AS domain
         |  FROM u)
         |SELECT doc_id, url_canon, host, domain FROM c
         |ORDER BY doc_id""".stripMargin,

    // the cap replayed as one rank window: under-cap domains pass
    // whole (n <= cap), over-cap domains keep the cap smallest
    // hash-order keys — exactly the engine's two-phase result
    "pipeline_domain_cap" ->
      s"""WITH u AS (SELECT doc_id, $urlSuffixCase AS sfx FROM documents),
         |h AS (SELECT doc_id, 'site' || (doc_id % 37) || sfx AS domain
         |      FROM u WHERE doc_id % 11 <> 0),
         |k AS (SELECT doc_id, domain,
         |        md5(CAST(doc_id AS VARCHAR)) AS kk FROM h),
         |r AS (SELECT doc_id, domain,
         |        row_number() OVER (PARTITION BY domain
         |          ORDER BY kk, doc_id) AS rn,
         |        count(*) OVER (PARTITION BY domain) AS n
         |      FROM k)
         |SELECT doc_id, domain FROM r WHERE n <= 3 OR rn <= 3
         |ORDER BY doc_id""".stripMargin,

    // the robots DECISION replayed from the planted rule structure:
    // even sites' graftbot group shadows *, allow-over-disallow on the
    // n%3=0 odd sites (longest match), plain prefix disallow elsewhere
    "pipeline_robots_filter" ->
      """WITH d AS (SELECT doc_id, doc_id % 13 AS n,
        |  'site' || (doc_id % 13) || '.com' AS domain,
        |  '/A/b' || (doc_id % 9) AS path,
        |  doc_id % 9 AS p FROM documents)
        |SELECT doc_id, domain, path,
        |  CASE WHEN n % 2 = 0 THEN p <> n % 3
        |       WHEN n % 3 = 0 THEN p = n % 9
        |       ELSE p <> n % 5 END AS allowed
        |FROM d ORDER BY doc_id""".stripMargin,

    // every planted link's resolved + canonical form by construction —
    // positions 1/2/3/4/5/8 canonicalize to their resolved string
    // (lowercase already, params pre-sorted), 0 needs the full
    // case/port/tracking/fragment treatment, 6 is the non-hierarchical
    // NULL, 7 only drops its fragment
    "text_html_links" ->
      s"""WITH $linksResolvedCtes
         |SELECT doc_id, pos, resolved, url_canon FROM lc
         |ORDER BY doc_id, pos""".stripMargin,

    // the script histogram replayed over the same planted prefixes:
    // integer code-unit counts via the same range classes (all-BMP by
    // contract, so DuckDB's codepoint length == Spark's UTF-16 length),
    // argmax chain in the same first-wins order
    "text_script_profile" ->
      """WITH b AS (
        |  SELECT doc_id, CAST(doc_id % 4 + 1 AS INTEGER) AS reps,
        |    CASE doc_id % 5 WHEN 0 THEN ''
        |      WHEN 1 THEN '漢字文書かな'
        |      WHEN 2 THEN 'кириллица'
        |      WHEN 3 THEN 'مرحبا بالعالم'
        |      ELSE '한국어 문서' END AS pre,
        |    text FROM documents),
        |t0 AS (SELECT doc_id, repeat(pre, reps) || ' ' || text AS t
        |       FROM b),
        |c AS (SELECT doc_id,
        |  CAST(length(t) AS BIGINT) AS n_chars,
        |  CAST(length(t) - length(regexp_replace(t, '[A-Za-z]', '',
        |    'g')) AS BIGINT) AS n_latin,
        |  CAST(length(t) - length(regexp_replace(t,
        |    '[' || chr(19968) || '-' || chr(40959) || ']', '', 'g'))
        |    AS BIGINT) AS n_cjk,
        |  CAST(length(t) - length(regexp_replace(t,
        |    '[' || chr(12352) || '-' || chr(12543) || ']', '', 'g'))
        |    AS BIGINT) AS n_kana,
        |  CAST(length(t) - length(regexp_replace(t,
        |    '[' || chr(1024) || '-' || chr(1279) || ']', '', 'g'))
        |    AS BIGINT) AS n_cyrillic,
        |  CAST(length(t) - length(regexp_replace(t,
        |    '[' || chr(1536) || '-' || chr(1791) || ']', '', 'g'))
        |    AS BIGINT) AS n_arabic,
        |  CAST(length(t) - length(regexp_replace(t,
        |    '[' || chr(44032) || '-' || chr(55203) || ']', '', 'g'))
        |    AS BIGINT) AS n_hangul
        |  FROM t0)
        |SELECT doc_id, n_chars, n_latin, n_cjk, n_kana, n_cyrillic,
        |  n_arabic, n_hangul,
        |  CASE WHEN n_latin >= n_cjk AND n_latin >= n_kana AND
        |    n_latin >= n_cyrillic AND n_latin >= n_arabic AND
        |    n_latin >= n_hangul THEN 'latin'
        |  WHEN n_cjk >= n_kana AND n_cjk >= n_cyrillic AND
        |    n_cjk >= n_arabic AND n_cjk >= n_hangul THEN 'cjk'
        |  WHEN n_kana >= n_cyrillic AND n_kana >= n_arabic AND
        |    n_kana >= n_hangul THEN 'kana'
        |  WHEN n_cyrillic >= n_arabic AND n_cyrillic >= n_hangul
        |    THEN 'cyrillic'
        |  WHEN n_arabic >= n_hangul THEN 'arabic'
        |  ELSE 'hangul' END AS script
        |FROM c ORDER BY doc_id""".stripMargin,

    // anchor texts are positional constants in the planted pages;
    // targets replay through the SAME resolution/canonicalization CTEs
    // as text_html_links, then aggregate
    "text_anchor_agg" ->
      s"""WITH $linksResolvedCtes,
         |t AS (
         |  SELECT doc_id, url_canon,
         |    CASE pos WHEN 0 THEN 'abs' WHEN 1 THEN 'rel'
         |      WHEN 2 THEN 'dots' WHEN 3 THEN 'proto'
         |      WHEN 4 THEN 'query' WHEN 5 THEN 'esc'
         |      WHEN 6 THEN 'mail' WHEN 7 THEN 'frag'
         |      ELSE 'self' END AS atext
         |  FROM lc
         |  WHERE url_canon IS NOT NULL AND
         |    (url_canon LIKE 'http://%' OR url_canon LIKE 'https://%'))
         |SELECT url_canon AS target,
         |  CAST(count(*) AS BIGINT) AS n_refs,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages,
         |  array_to_string(list_sort(list_distinct(list(atext))), '|')
         |    AS texts
         |FROM t GROUP BY 1 ORDER BY target""".stripMargin,

    // the integer-nano PageRank contract replayed exactly: floor
    // division at every step, dangling mass redistributed uniformly,
    // three unrolled iterations (generated, not copy-pasted)
    "pipeline_pagerank" ->
      s"""WITH $linksResolvedCtes,
         |$pagerankCtes
         |SELECT p3.node, CAST(p3.pr AS BIGINT) AS pr_nano,
         |  CAST(coalesce(idg.n_in, 0) AS BIGINT) AS n_in,
         |  CAST(coalesce(od.outdeg, 0) AS BIGINT) AS n_out
         |FROM p3 LEFT JOIN od ON p3.node = od.src
         |LEFT JOIN idg ON p3.node = idg.dst
         |ORDER BY node""".stripMargin,

    // the equivalence proof: the seeded + wave-maintained +
    // redelivered store must produce EXACTLY the full-graph rank —
    // same replay as pipeline_pagerank, deliberately
    "pipeline_pagerank_incremental" ->
      s"""WITH $linksResolvedCtes,
         |$pagerankCtes
         |SELECT p3.node, CAST(p3.pr AS BIGINT) AS pr_nano,
         |  CAST(coalesce(idg.n_in, 0) AS BIGINT) AS n_in,
         |  CAST(coalesce(od.outdeg, 0) AS BIGINT) AS n_out
         |FROM p3 LEFT JOIN od ON p3.node = od.src
         |LEFT JOIN idg ON p3.node = idg.dst
         |ORDER BY node""".stripMargin,

    // the revisit channel replayed closed-form by change-rate kind:
    // full responses only at content changes, revisits in between
    // referring to the last full capture (the referent ids are pinned
    // verbatim), every revisit resolving with consistent provenance,
    // and the estimator seeing the SAME change counts as a
    // full-fetch-only stream would — revisits are exactly the
    // unchanged observations
    "pipeline_revisit_resolve" ->
      """WITH d AS (SELECT doc_id, doc_id % 13 AS a,
        |  CAST(doc_id % 4 AS INTEGER) AS kind FROM documents)
        |SELECT
        |  'site' || a || '.com' AS domain,
        |  'http://site' || a || '.com/page/' || doc_id AS url,
        |  CAST(CASE kind WHEN 0 THEN 5 WHEN 1 THEN 3 WHEN 2 THEN 2
        |    ELSE 1 END AS BIGINT) AS n_resp,
        |  CAST(CASE kind WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3
        |    ELSE 4 END AS BIGINT) AS n_revisits,
        |  CAST(CASE kind WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3
        |    ELSE 4 END AS BIGINT) AS n_resolved,
        |  CASE kind WHEN 0 THEN ''
        |    WHEN 1 THEN 'urn:uuid:doc-' || doc_id ||
        |      '-w0|urn:uuid:doc-' || doc_id || '-w2'
        |    WHEN 2 THEN 'urn:uuid:doc-' || doc_id || '-w1'
        |    ELSE 'urn:uuid:doc-' || doc_id || '-w0' END
        |    AS resolved_ids,
        |  CAST(CASE kind WHEN 0 THEN 4 WHEN 1 THEN 2 WHEN 2 THEN 1
        |    ELSE 0 END AS BIGINT) AS n_changes,
        |  CAST(CASE kind WHEN 0 THEN 2880 WHEN 1 THEN 4800
        |    WHEN 2 THEN 7200 ELSE 86400 END AS BIGINT) AS interval_s
        |FROM d ORDER BY url""".stripMargin,

    // the validator arithmetic replayed closed-form: even docs'
    // servers answer unchanged recrawls with bodiless 304s (bytes
    // move to the saved column), odd docs refetch everything — and
    // the interval estimate is IDENTICAL either way, which is the
    // point: conditional requests change the budget, not the estimate
    "pipeline_recrawl_conditional" ->
      """WITH d AS (SELECT doc_id, doc_id % 13 AS a,
        |  CAST(doc_id % 4 AS INTEGER) AS kind,
        |  doc_id % 2 = 0 AS cond,
        |  100 + doc_id % 50 AS b FROM documents)
        |SELECT
        |  'site' || a || '.com' AS domain,
        |  'http://site' || a || '.com/page/' || doc_id AS url,
        |  cond,
        |  CAST(CASE WHEN NOT cond THEN 5 ELSE
        |    CASE kind WHEN 0 THEN 5 WHEN 1 THEN 3 WHEN 2 THEN 2
        |      ELSE 1 END END AS BIGINT) AS n_full,
        |  CAST(CASE WHEN NOT cond THEN 0 ELSE
        |    CASE kind WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3
        |      ELSE 4 END END AS BIGINT) AS n_not_modified,
        |  CAST(b * (CASE WHEN NOT cond THEN 5 ELSE
        |    CASE kind WHEN 0 THEN 5 WHEN 1 THEN 3 WHEN 2 THEN 2
        |      ELSE 1 END END) AS BIGINT) AS bytes_fetched,
        |  CAST(b * (CASE WHEN NOT cond THEN 0 ELSE
        |    CASE kind WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3
        |      ELSE 4 END END) AS BIGINT) AS bytes_saved,
        |  CAST(CASE kind WHEN 0 THEN 4 WHEN 1 THEN 2 WHEN 2 THEN 1
        |    ELSE 0 END AS BIGINT) AS n_changes,
        |  'W/"' || (CASE kind WHEN 0 THEN 4 WHEN 1 THEN 2
        |    WHEN 2 THEN 1 ELSE 0 END) || '"' AS next_validator,
        |  CAST(CASE kind WHEN 0 THEN 2880 WHEN 1 THEN 4800
        |    WHEN 2 THEN 7200 ELSE 86400 END AS BIGINT) AS interval_s
        |FROM d ORDER BY url""".stripMargin,

    // the schedule replayed closed-form by change-rate kind: hourly
    // waves, span 14400 s, Δ = span div (n+1), ref = t0 + 21600 s;
    // never-changed pages (kind 3) miss the due set entirely
    "pipeline_recrawl_schedule" ->
      """WITH d AS (SELECT doc_id, doc_id % 13 AS a, doc_id % 4 AS kind
        |  FROM documents WHERE doc_id % 4 <> 3),
        |u AS (SELECT
        |  'site' || a || '.com' AS domain,
        |  'http://site' || a || '.com/page/' || doc_id AS url,
        |  CAST(CASE kind WHEN 0 THEN 4 WHEN 1 THEN 2 ELSE 1 END
        |    AS BIGINT) AS n_changes,
        |  CAST(CASE kind WHEN 0 THEN 2880 WHEN 1 THEN 4800
        |    ELSE 7200 END AS BIGINT) AS interval_s,
        |  CAST(CASE kind WHEN 0 THEN 4320 WHEN 1 THEN 2400
        |    ELSE 0 END AS BIGINT) AS staleness
        |  FROM d),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY domain
        |  ORDER BY staleness DESC, url) AS BIGINT) AS rk FROM u)
        |SELECT domain, url, n_changes, interval_s, staleness, rk
        |FROM r WHERE rk <= 2 ORDER BY domain, rk""".stripMargin,

    // frontier ∩ robots gate, scored by the OPIC forward mass out of
    // the 3-iteration rank table, top 3 per domain
    "pipeline_crawl_priority" ->
      s"""WITH $frontierAllowedCtes,
         |$pagerankCtes,
         |pc AS (
         |  SELECT ed.dst AS url, sum(p3.pr // od.outdeg) AS priority
         |  FROM p3 JOIN od ON p3.node = od.src
         |  JOIN ed ON ed.src = p3.node GROUP BY 1),
         |pri AS (
         |  SELECT a.domain, a.url,
         |    CAST(coalesce(pc.priority, 0) AS BIGINT) AS priority
         |  FROM allowed a LEFT JOIN pc ON a.url = pc.url),
         |rk AS (
         |  SELECT domain, url, priority,
         |    CAST(row_number() OVER (PARTITION BY domain
         |      ORDER BY priority DESC, url) AS BIGINT) AS rk
         |  FROM pri)
         |SELECT domain, url, priority, rk FROM rk WHERE rk <= 3
         |ORDER BY domain, rk""".stripMargin,

    // frontier replay: dedup'd canonical http(s) links minus the
    // pages' own URLs, gated by the planted per-domain rule (even
    // sites block /up, odd block /root; ext's NAMED graftbot group
    // blocks only /y; base blocks /e)
    "pipeline_crawl_frontier" ->
      s"""WITH $frontierAllowedCtes
         |SELECT domain, url FROM allowed ORDER BY url""".stripMargin,

    // both channels replayed: the link frontier (allowed) unioned
    // with the planted sitemap inventory (/root overlaps the link
    // channel and gates identically; /sm/p{n%4} is sitemap-only),
    // provenance = the sorted distinct channel list per URL
    "pipeline_discovery_e2e" ->
      s"""WITH $frontierAllowedCtes,
         |ns AS (SELECT unnest(generate_series(0, 12)) AS sn),
         |smu AS (
         |  SELECT sn, 'site' || sn || '.com' AS domain,
         |    'http://site' || sn || '.com/root' AS url,
         |    '/root' AS path FROM ns
         |  UNION ALL
         |  SELECT sn, 'site' || sn || '.com',
         |    'http://site' || sn || '.com/sm/p' || (sn % 4),
         |    '/sm/p' || (sn % 4) FROM ns
         |  UNION ALL
         |  SELECT sn, 'site' || sn || '.com',
         |    'http://site' || sn || '.com/deep/d' || sn,
         |    '/deep/d' || sn FROM ns WHERE sn % 3 = 0),
         |smallow AS (
         |  SELECT domain, url FROM smu
         |  WHERE CASE WHEN sn % 2 = 0 THEN path NOT LIKE '/up%'
         |        ELSE path NOT LIKE '/root%' END),
         |uni AS (
         |  SELECT domain, url, 'links' AS channel FROM allowed
         |  UNION ALL
         |  SELECT domain, url, 'sitemap' AS channel FROM smallow)
         |SELECT domain, url,
         |  array_to_string(list_sort(list_distinct(list(channel))), '|')
         |    AS channels
         |FROM uni GROUP BY domain, url ORDER BY url""".stripMargin,

    // the streaming twin shares the batch frontier oracle VERBATIM
    // (stateless stages + complete-mode accumulation)
    "pipeline_frontier_stream" ->
      s"""WITH $frontierAllowedCtes
         |SELECT domain, url FROM allowed ORDER BY url""".stripMargin,

    // and so does the update-mode store sink: sequential seen-set
    // semantics are split-invariant SET-wise
    "pipeline_frontier_store" ->
      s"""WITH $frontierAllowedCtes
         |SELECT domain, url FROM allowed ORDER BY url""".stripMargin,

    // the fetch plan: per-domain rank over the allowed frontier ×
    // the planted Crawl-delay (site even n: 1+n%3+0.5, odd: 1+n%3;
    // ext's named group has none -> the 1 s default; base: 0.5)
    "pipeline_polite_schedule" ->
      s"""WITH $frontierAllowedCtes,
         |sched AS (
         |  SELECT domain, url,
         |    CASE WHEN domain LIKE 'site%' THEN
         |        1 + CAST(regexp_extract(domain, 'site([0-9]+)', 1)
         |              AS BIGINT) % 3
         |          + CASE WHEN CAST(regexp_extract(domain, 'site([0-9]+)',
         |              1) AS BIGINT) % 2 = 0 THEN 0.5 ELSE 0 END
         |      WHEN domain LIKE 'ext%' THEN 1.0
         |      ELSE 0.5 END AS delay_s,
         |    CAST(row_number() OVER (PARTITION BY domain ORDER BY url)
         |      AS BIGINT) AS slot
         |  FROM allowed)
         |SELECT domain, url, slot, CAST(delay_s AS DOUBLE) AS delay_s,
         |  CAST((slot - 1) * delay_s AS DOUBLE) AS offset_s
         |FROM sched ORDER BY domain, slot""".stripMargin,

    // the directives replayed from the planted group shapes: %3=0 has
    // no named group (the * delay 9 wins; the even docs' bogus value
    // is lenient-ignored), %3=1's named delay shadows the * 9, %3=2's
    // named group carries no delay at all -> NULL; the leading sitemap
    // is always collected, the trailing extra only on the %3=0 shape
    "text_robots_directives" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 9.0
        |       WHEN doc_id % 3 = 1 THEN (doc_id % 5) + 0.5
        |       ELSE NULL END AS crawl_delay,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS BIGINT)
        |    AS n_sitemaps,
        |  'http://site' || (doc_id % 13) || '.com/map' || (doc_id % 3)
        |    || '.xml' ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN '|http://site' || (doc_id % 13) || '.com/extra.xml'
        |      ELSE '' END AS sitemaps
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the planted sitemap kinds replayed most-specific-first (the
    // fixture's own branch order): bad root, bad priority, namespaced
    // index, two-entry urlset with the &amp; loc decoded
    "text_sitemap_parse" ->
      """WITH k AS (
        |  SELECT doc_id, doc_id % 13 AS n,
        |    CASE WHEN doc_id % 11 = 0 THEN 'badroot'
        |         WHEN doc_id % 7 = 0 THEN 'badprio'
        |         WHEN doc_id % 5 = 0 THEN 'index'
        |         ELSE 'urlset' END AS kindc
        |  FROM documents),
        |ok AS (
        |  SELECT doc_id,
        |    CASE WHEN kindc = 'index' THEN 'sitemapindex'
        |         ELSE 'urlset' END AS kind,
        |    CAST(NULL AS VARCHAR) AS err,
        |    CAST(j AS BIGINT) AS pos,
        |    CASE WHEN kindc = 'index'
        |         THEN 'http://site' || n || '.com/s' || j || '.xml'
        |         WHEN j = 0 THEN 'http://site' || n || '.com/p0?x=1&y='
        |           || (doc_id % 4)
        |         ELSE 'http://site' || n || '.com/p1' END AS loc,
        |    CASE WHEN kindc = 'index' AND j = 0 THEN '2026-02-01'
        |         WHEN kindc = 'urlset' AND j = 0 THEN '2026-01-15'
        |         ELSE NULL END AS lastmod,
        |    CASE WHEN kindc = 'urlset' AND j = 1
        |         THEN CAST('0.' || (doc_id % 9) AS DOUBLE)
        |         ELSE NULL END AS priority
        |  FROM k CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS j)
        |  WHERE kindc IN ('index', 'urlset')),
        |bad AS (
        |  SELECT doc_id, CAST(NULL AS VARCHAR) AS kind,
        |    CASE WHEN kindc = 'badroot' THEN 'sitemap:bad-root'
        |         ELSE 'sitemap:bad-priority' END AS err,
        |    CAST(0 AS BIGINT) AS pos, CAST(NULL AS VARCHAR) AS loc,
        |    CAST(NULL AS VARCHAR) AS lastmod,
        |    CAST(NULL AS DOUBLE) AS priority
        |  FROM k WHERE kindc IN ('badroot', 'badprio'))
        |SELECT * FROM ok UNION ALL SELECT * FROM bad
        |ORDER BY doc_id, pos""".stripMargin,

    // every WARC fact and both digests by construction; the html body
    // string carries the entity text RAW (&amp; / &#33;), extraction
    // decodes it; the doc text contains no &<> so the escape is the
    // identity and the div round-trips byte-exact
    "source_warc" ->
      """WITH b AS (SELECT doc_id, doc_id % 4 AS kind, text,
        |  'http://site' || (doc_id % 13) || '.com/page/' || (doc_id % 7)
        |    AS uri FROM documents),
        |h AS (SELECT doc_id, kind, uri, text,
        |  '<html><head><title>Doc ' || doc_id ||
        |  '</title></head><body><h1>Title &amp; doc ' || doc_id ||
        |  '&#33;</h1><div>' || text || '</div></body></html>' AS html
        |  FROM b)
        |SELECT doc_id,
        |  CASE kind WHEN 0 THEN 'response' WHEN 1 THEN 'response'
        |       WHEN 2 THEN 'warcinfo' END AS warc_type,
        |  CASE WHEN kind IN (0, 1) THEN uri END AS target_uri,
        |  CASE WHEN kind IN (0, 1) THEN
        |    CAST(CASE WHEN kind = 1 AND doc_id % 8 = 1 THEN 404
        |         ELSE 200 END AS INTEGER) END AS status,
        |  CASE kind WHEN 0 THEN 'text/html'
        |       WHEN 1 THEN 'text/plain' END AS content_type,
        |  CASE kind WHEN 0 THEN md5(html) WHEN 1 THEN md5(text)
        |       WHEN 2 THEN md5('software: graft-crawler' ||
        |         chr(13) || chr(10)) END AS body_md5,
        |  CASE WHEN kind = 0 THEN
        |    md5('Title & doc ' || doc_id || '!' || chr(10) ||
        |        trim(regexp_replace(text, '\s+', ' ', 'g')))
        |  END AS extracted_md5
        |FROM h ORDER BY doc_id""".stripMargin,

    // the WET export read BACK through the engine's own container
    // walk: per file a warcinfo leader at member 0, then the html
    // pages' conversion records in doc order; text bytes = the
    // extraction replay, exactly the source_warc extracted_md5 form
    "pipeline_wet_export" ->
      """WITH h AS (
        |  SELECT doc_id, CAST(doc_id % 5 AS BIGINT) AS file_no,
        |    'http://site' || (doc_id % 13) || '.com/page/' ||
        |      (doc_id % 7) AS uri,
        |    md5('Title & doc ' || doc_id || '!' || chr(10) ||
        |        trim(regexp_replace(text, '\s+', ' ', 'g'))) AS tmd5
        |  FROM documents WHERE doc_id % 4 = 0),
        |conv AS (
        |  SELECT file_no,
        |    CAST(row_number() OVER (PARTITION BY file_no
        |      ORDER BY doc_id) AS BIGINT) AS member_idx,
        |    'conversion' AS warc_type, uri AS target_uri,
        |    tmd5 AS body_md5
        |  FROM h),
        |leaders AS (
        |  SELECT CAST(f AS BIGINT) AS file_no, CAST(0 AS BIGINT)
        |      AS member_idx,
        |    'warcinfo' AS warc_type, NULL AS target_uri,
        |    md5('software: graft-wet-writer' || chr(13) || chr(10))
        |      AS body_md5
        |  FROM generate_series(0, 4) t(f))
        |SELECT * FROM conv UNION ALL SELECT * FROM leaders
        |ORDER BY file_no, member_idx""".stripMargin,

    // the streaming WET twin: conversion-record FACTS are a set no
    // micro-batch split can change — the batch replay keyed by
    // (uri, text md5), leaders excluded (their count is the split's)
    "pipeline_wet_stream" ->
      """SELECT
        |  'http://site' || (doc_id % 13) || '.com/page/' ||
        |    (doc_id % 7) AS target_uri,
        |  md5('Title & doc ' || doc_id || '!' || chr(10) ||
        |      trim(regexp_replace(text, '\s+', ' ', 'g'))) AS body_md5
        |FROM documents WHERE doc_id % 4 = 0
        |ORDER BY target_uri, body_md5""".stripMargin,

    // the WAT export read back: per file a warcinfo leader, then a
    // metadata record per RESPONSE (kinds 0 and 1) in doc order, the
    // JSON bytes replayed exactly (fixed field order by construction;
    // the planted html wrapper carries no anchors, so n_links is 0)
    "pipeline_wat_export" ->
      """WITH h AS (
        |  SELECT doc_id, doc_id % 4 AS kind,
        |    CAST(doc_id % 5 AS BIGINT) AS file_no,
        |    'http://site' || (doc_id % 13) || '.com/page/' ||
        |      (doc_id % 7) AS uri,
        |    CASE WHEN doc_id % 4 = 1 AND doc_id % 8 = 1
        |      THEN 404 ELSE 200 END AS status,
        |    CASE doc_id % 4 WHEN 0 THEN 'text/html'
        |      ELSE 'text/plain' END AS ct
        |  FROM documents WHERE doc_id % 4 IN (0, 1)),
        |conv AS (
        |  SELECT file_no,
        |    CAST(row_number() OVER (PARTITION BY file_no
        |      ORDER BY doc_id) AS BIGINT) AS member_idx,
        |    'metadata' AS warc_type, uri AS target_uri,
        |    md5('{"uri":"' || uri || '","status":' || status ||
        |        ',"content_type":"' || ct || '","n_links":0}')
        |      AS body_md5
        |  FROM h),
        |leaders AS (
        |  SELECT CAST(f AS BIGINT) AS file_no, CAST(0 AS BIGINT)
        |      AS member_idx,
        |    'warcinfo' AS warc_type, NULL AS target_uri,
        |    md5('software: graft-wat-writer' || chr(13) || chr(10))
        |      AS body_md5
        |  FROM generate_series(0, 4) t(f))
        |SELECT * FROM conv UNION ALL SELECT * FROM leaders
        |ORDER BY file_no, member_idx""".stripMargin,

    // the wire-coding decode: every kind's DECODED body is the same
    // planted html, so body_md5 = md5(html) whenever decoding ran —
    // except the declined `br` kind, whose bytes pass through as
    // planted ('BR:' || html, distinct by construction, proving the
    // passthrough is untouched rather than accidentally decoded)
    "source_warc_http" ->
      """WITH b AS (SELECT doc_id, doc_id % 8 AS kind, text,
        |  'http://site' || (doc_id % 13) || '.com/page/' || (doc_id % 7)
        |    AS uri FROM documents),
        |h AS (SELECT doc_id, kind,
        |  '<html><head><title>Doc ' || doc_id ||
        |  '</title></head><body><h1>Title &amp; doc ' || doc_id ||
        |  '&#33;</h1><div>' || text || '</div></body></html>' AS html,
        |  text FROM b)
        |SELECT doc_id,
        |  CAST(200 AS INTEGER) AS status,
        |  'text/html' AS content_type,
        |  CASE WHEN kind = 6 THEN 'content-coding:br' END AS coding_err,
        |  CASE WHEN kind = 6 THEN md5('BR:' || html)
        |       ELSE md5(html) END AS body_md5,
        |  CASE WHEN kind <> 6 THEN
        |    md5('Title & doc ' || doc_id || '!' || chr(10) ||
        |        trim(regexp_replace(text, '\s+', ' ', 'g')))
        |  END AS extracted_md5
        |FROM h ORDER BY doc_id""".stripMargin,

    // the .warc.gz archive read: same planted records as source_warc,
    // keyed by (archive file, member position) instead of doc_id —
    // file_no = doc_id % 8, and member order inside a file is
    // ascending doc_id by construction, so member_idx is a per-file
    // dense rank over doc_id
    "source_warc_gz" ->
      """WITH b AS (SELECT doc_id, doc_id % 4 AS kind, text,
        |  CAST(doc_id % 8 AS BIGINT) AS file_no,
        |  CAST(row_number() OVER (PARTITION BY doc_id % 8
        |    ORDER BY doc_id) - 1 AS BIGINT) AS member_idx,
        |  'http://site' || (doc_id % 13) || '.com/page/' || (doc_id % 7)
        |    AS uri FROM documents),
        |h AS (SELECT doc_id, kind, file_no, member_idx, uri, text,
        |  '<html><head><title>Doc ' || doc_id ||
        |  '</title></head><body><h1>Title &amp; doc ' || doc_id ||
        |  '&#33;</h1><div>' || text || '</div></body></html>' AS html
        |  FROM b)
        |SELECT file_no, member_idx,
        |  CASE kind WHEN 0 THEN 'response' WHEN 1 THEN 'response'
        |       WHEN 2 THEN 'warcinfo' END AS warc_type,
        |  CASE WHEN kind IN (0, 1) THEN uri END AS target_uri,
        |  CASE WHEN kind IN (0, 1) THEN
        |    CAST(CASE WHEN kind = 1 AND doc_id % 8 = 1 THEN 404
        |         ELSE 200 END AS INTEGER) END AS status,
        |  CASE kind WHEN 0 THEN 'text/html'
        |       WHEN 1 THEN 'text/plain' END AS content_type,
        |  CASE kind WHEN 0 THEN md5(html) WHEN 1 THEN md5(text)
        |       WHEN 2 THEN md5('software: graft-crawler' ||
        |         chr(13) || chr(10)) END AS body_md5,
        |  CASE WHEN kind = 0 THEN
        |    md5('Title & doc ' || doc_id || '!' || chr(10) ||
        |        trim(regexp_replace(text, '\s+', ' ', 'g')))
        |  END AS extracted_md5
        |FROM h ORDER BY file_no, member_idx""".stripMargin,

    // the zstd archive replay by construction: 8 files keyed by
    // doc_id % 8, member order ascending doc id, frame kind by
    // (doc_id // 8) % 3; odd files' kind-1 frames are the NAMED
    // dictionary rejection (WARC facts null, err carries the id);
    // everything else decodes to the planted response record
    "source_warc_zst" ->
      """WITH b AS (SELECT doc_id, text,
        |  CAST(doc_id % 8 AS BIGINT) AS file_no,
        |  CAST(row_number() OVER (PARTITION BY doc_id % 8
        |    ORDER BY doc_id) - 1 AS BIGINT) AS member_idx,
        |  CAST((doc_id // 8) % 3 AS INTEGER) AS kind
        |  FROM documents)
        |SELECT file_no, member_idx,
        |  CASE WHEN file_no % 2 = 1 AND kind = 1
        |    THEN 'zstd-dictionary:7' END AS err,
        |  CASE WHEN file_no % 2 = 1 AND kind = 1 THEN NULL
        |    ELSE 'http://site' || (doc_id % 13) || '.com/z' || doc_id
        |    END AS target_uri,
        |  CASE WHEN file_no % 2 = 1 AND kind = 1 THEN NULL
        |    ELSE CAST(200 AS INTEGER) END AS status,
        |  CASE WHEN file_no % 2 = 1 AND kind = 1 THEN NULL
        |    ELSE md5(text) END AS body_md5
        |FROM b ORDER BY file_no, member_idx""".stripMargin,

    // every decoded STRING reconstructed by construction — planted
    // non-ASCII via chr() codepoints so the oracle never round-trips
    // bytes through the SQL text itself: é=233 €=8364 ’=8217 —=8212
    // •=8226; kind 6 (shift_jis) is the named rejection → NULL text
    "text_charset_decode" ->
      """WITH e AS (SELECT doc_id, doc_id % 7 AS kind, text
        |  FROM documents),
        |x AS (SELECT doc_id, kind, CASE kind
        |    WHEN 0 THEN 'Doc ' || doc_id || ' ' || chr(233) ||
        |      chr(8364) || ' ' || text
        |    WHEN 1 THEN 'Doc ' || doc_id || ' ' || chr(233) ||
        |      chr(8364) || ' ' || text
        |    WHEN 2 THEN '<meta charset="utf-8"> quote ' || chr(8217)
        |      || ' dash ' || chr(8212) || ' euro ' || chr(8364) ||
        |      ' ' || text
        |    WHEN 3 THEN '<html><head><meta charset="windows-1252">'
        |      || '</head><body>bullet ' || chr(8226) || ' ' || text
        |      || '</body></html>'
        |    WHEN 4 THEN 'caf' || chr(233) || ' ' || text
        |    WHEN 5 THEN 'mid ' || chr(8212) || ' dash ' || text
        |  END AS t FROM e)
        |SELECT doc_id,
        |  CASE kind WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16le'
        |    WHEN 2 THEN 'windows-1252' WHEN 3 THEN 'windows-1252'
        |    WHEN 4 THEN 'utf-8' WHEN 5 THEN 'windows-1252'
        |    ELSE 'shift_jis' END AS charset,
        |  CASE kind WHEN 0 THEN 'bom' WHEN 1 THEN 'bom'
        |    WHEN 2 THEN 'header' WHEN 3 THEN 'meta'
        |    WHEN 4 THEN 'valid-utf8' WHEN 5 THEN 'fallback'
        |    ELSE 'unsupported-label' END AS method,
        |  md5(t) AS md5_text,
        |  CAST(length(t) AS BIGINT) AS n_chars
        |FROM x ORDER BY doc_id""".stripMargin,

    // the versioned legacy-decode rollout replayed from the shared
    // plant constant (generator above)
    "text_charset_legacy" -> legacyCharsetOracle,

    // the rollout replay: v1 rejects every single-byte label by name,
    // v2 decodes them chr()-for-chr() from the same plant constant
    "text_charset_singlebyte" -> {
      def chrs(cps: Seq[Int]): String =
        cps.map(c => s"chr($c)").mkString(" || ")
      val plants = singleByteCharsetPlants.zipWithIndex
      val textCases = plants.map { case ((_, _, cps), k) =>
        if (cps.isEmpty) s"WHEN $k THEN NULL"
        else s"WHEN $k THEN prefix || ${chrs(cps)}"
      }.mkString("\n    ")
      val names = plants.map { case ((l, _, _), k) =>
        s"WHEN $k THEN '$l'" }.mkString(" ")
      val v2Method = plants.map { case ((_, _, cps), k) =>
        val m = if (cps.isEmpty) "unsupported-label" else "header"
        s"WHEN $k THEN '$m'"
      }.mkString(" ")
      s"""WITH d AS (SELECT doc_id, doc_id % 8 AS kind FROM documents),
         |e AS (SELECT doc_id, kind, 'Doc ' || doc_id || ' ' AS prefix
         |      FROM d),
         |t AS (SELECT doc_id, kind,
         |  CASE kind
         |    $textCases
         |  END AS text_v2 FROM e)
         |SELECT doc_id,
         |  CASE kind $names END AS charset_v1,
         |  'unsupported-label' AS method_v1,
         |  md5(CAST(NULL AS VARCHAR)) AS md5_v1,
         |  CASE kind $names END AS charset_v2,
         |  CASE kind $v2Method END AS method_v2,
         |  md5(text_v2) AS md5_v2,
         |  CAST(length(text_v2) AS BIGINT) AS n_chars_v2
         |FROM t ORDER BY doc_id""".stripMargin
    },

    // every chain replayed by construction: L = id%3 hops land on
    // /c{id}/{L}; even ids re-alias via canonical; every 5th id is
    // noindex and drops
    // the three redirect mechanisms replayed: 3xx chains, fast
    // meta-refresh interstitials (count as hops with refresh
    // provenance), SLOW meta-refreshes stall the chain at hop 0
    // (auto-reload, not a redirect — landing canonical/noindex never
    // reached), and rel=canonical as the final alias
    "pipeline_redirect_resolve" ->
      """WITH d AS (SELECT doc_id, doc_id % 13 AS n, doc_id % 3 AS L,
        |  doc_id % 2 = 0 AS canon, doc_id % 5 = 0 AS noindex,
        |  doc_id % 4 = 1 AND doc_id % 3 > 0 AS fastr,
        |  doc_id % 4 = 3 AND doc_id % 3 > 0 AS slowr
        |  FROM documents)
        |SELECT doc_id,
        |  'http://site' || n || '.com/c' || doc_id || '/0' AS start_url,
        |  CASE WHEN slowr THEN
        |         'http://site' || n || '.com/c' || doc_id || '/0'
        |       WHEN canon THEN 'http://site' || n || '.com/canon/'
        |         || doc_id
        |       ELSE 'http://site' || n || '.com/c' || doc_id || '/'
        |         || L END AS final_url,
        |  CAST(CASE WHEN slowr THEN 0 ELSE L END AS BIGINT) AS n_hops,
        |  CAST(CASE WHEN fastr THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_refresh_hops,
        |  CASE WHEN slowr THEN 'fetch'
        |       WHEN canon THEN 'canonical'
        |       WHEN L > 0 THEN 'redirect'
        |       ELSE 'fetch' END AS channel,
        |  noindex AND NOT slowr AS noindex,
        |  NOT (noindex AND NOT slowr) AS kept
        |FROM d ORDER BY doc_id""".stripMargin,

    // the wildcard-policy verdicts replayed by construction per kind
    "text_robots_wildcards" ->
      """WITH d AS (SELECT doc_id, doc_id % 8 AS kind,
        |  doc_id % 3 AS g FROM documents)
        |SELECT doc_id,
        |  'w' || g || '.example' AS domain,
        |  CASE kind WHEN 0 THEN '/index.php'
        |    WHEN 1 THEN '/index.php?x=1'
        |    WHEN 2 THEN '/shop/a.php'
        |    WHEN 3 THEN '/fishheads'
        |    WHEN 4 THEN '/fish/ok/page'
        |    WHEN 5 THEN '/Fish'
        |    WHEN 6 THEN '/page' || (doc_id % 7)
        |    ELSE '/deep/x.php' END AS path,
        |  CASE g WHEN 0 THEN kind IN (1, 2, 4, 5, 6)
        |    WHEN 1 THEN kind <> 1
        |    ELSE FALSE END AS allowed
        |FROM d ORDER BY doc_id""".stripMargin,

    // the composed WARC→charset→extract path: extraction replayed by
    // reconstruction (title raw-text-dropped, h1 entity decoded, div
    // whitespace collapsed) over the DECODED string; the EUC-JP kind
    // nulls everything past the named rejection
    "source_warc_charset" ->
      """WITH b AS (SELECT doc_id, doc_id % 3 AS kind,
        |  trim(regexp_replace(text, '\s+', ' ', 'g')) AS ctext
        |  FROM documents)
        |SELECT doc_id,
        |  CASE kind WHEN 0 THEN 'windows-1252' WHEN 1 THEN 'utf-16le'
        |    ELSE 'euc-jp' END AS charset,
        |  CASE kind WHEN 0 THEN 'header' WHEN 1 THEN 'bom'
        |    ELSE 'unsupported-label' END AS method,
        |  CASE kind
        |    WHEN 0 THEN md5('Caf' || chr(233) || ' & doc ' || doc_id
        |      || chr(10) || chr(8217) || ' ' || ctext || ' ' ||
        |      chr(8212))
        |    WHEN 1 THEN md5('Doc ' || doc_id || chr(10) || ctext)
        |  END AS extracted_md5,
        |  CASE WHEN kind IN (0, 1) THEN CAST(2 AS INTEGER)
        |  END AS n_blocks
        |FROM b ORDER BY doc_id""".stripMargin,

    // the whole composed funnel replayed: decode rejection by kind,
    // the robots decision per planted policy, the language/quality
    // arithmetic and the kept token sum — all by construction. The
    // STREAMING form shares it verbatim: stateless per-row steps ⇒
    // final state ≡ the batch replay under any micro-batch split.
    "pipeline_crawl_e2e" -> crawlFunnelOracle,
    "pipeline_warc_stream" -> crawlFunnelOracle,
    "pipeline_warc_gz_stream" -> crawlFunnelOracle,

    // alias collapse by construction: the canonical key is
    // 'http://site{a}.com/page/{b}' whatever the planted decoration
    "dedup_url" ->
      """WITH u AS (SELECT doc_id,
        |  'http://site' || (doc_id % 13) || '.com/page/' || (doc_id % 7)
        |    AS url_canon FROM documents)
        |SELECT url_canon, CAST(min(doc_id) AS BIGINT) AS keep_id,
        |       CAST(count(*) AS BIGINT) AS n_aliases
        |FROM u GROUP BY url_canon ORDER BY url_canon""".stripMargin,

    // the streaming crawl front-end's final state replayed as one batch
    // chain: extraction by reconstruction (title dropped, h1 entities
    // decoded, the escaped doc text round-tripped), URL policy (every
    // 11th doc malformed -> dropped; site numbers ≡ 0 mod 7 ->
    // blocklisted), then the language and quality gates over the
    // EXTRACTED text, grouped per source
    "pipeline_crawl_stream" -> {
      val stop = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
      val scores = TextOps.langProfiles.map { case (lang, markers) =>
        val set = markers.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, t -> t IN ($set))) AS s_$lang"
      }.mkString(", ")
      val enCond = TextOps.langProfiles.map(_._1).filter(_ != "en")
        .map(l => s"s_en >= s_$l").mkString(" AND ")
      s"""WITH ex AS (
         |  SELECT doc_id, source,
         |    'Title & doc ' || doc_id || '!' || chr(10) ||
         |    trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text
         |  FROM documents
         |  WHERE doc_id % 11 <> 0 AND (doc_id % 37) % 7 <> 0),
         |t AS (SELECT doc_id, source, $normToks AS toks FROM ex),
         |f AS (SELECT doc_id, source, toks,
         |        CAST(len(toks) AS BIGINT) AS n_tokens,
         |        CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
         |          AS distinct_ratio,
         |        CAST(len(list_filter(toks, t -> t IN ($stop)))
         |          AS DOUBLE) / len(toks) AS stopword_ratio,
         |        $scores
         |      FROM t),
         |gated AS (
         |  SELECT source, n_tokens FROM f
         |  WHERE $enCond
         |    AND round((least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
         |          + distinct_ratio
         |          + (1.0 - abs(stopword_ratio - 0.4))) / 3.0, 6) >= 0.6)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM gated GROUP BY source ORDER BY source""".stripMargin
    },

    // copy counts and per-copy keys replayed exactly: floor(factor)
    // whole copies + the md5-threshold fractional copy, epochs
    // enumerated with generate-series
    "sample_epochs" -> {
      val whole = epochFactors.toSeq.sortBy(_._1).map { case (src, f) =>
        s"WHEN source = '$src' THEN ${math.floor(f).toInt}"
      }.mkString("\n           ")
      val thr = epochFactors.toSeq.sortBy(_._1).map { case (src, f) =>
        s"WHEN source = '$src' THEN " +
          s"'${Sampling.fracThreshold(f - math.floor(f))}'"
      }.mkString("\n           ")
      s"""WITH n AS (
         |  SELECT doc_id, source,
         |    (CASE $whole
         |          ELSE 0 END)
         |    + (CASE WHEN md5(CAST(doc_id AS VARCHAR)) <
         |         (CASE $thr
         |               ELSE '${Sampling.fracThreshold(0.0)}' END)
         |       THEN 1 ELSE 0 END) AS nc
         |  FROM documents),
         |e AS (SELECT doc_id, source, CAST(i AS INTEGER) AS epoch
         |      FROM n, unnest(range(0, nc)) AS r(i) WHERE nc > 0)
         |SELECT doc_id, source, epoch,
         |       md5(CAST(doc_id AS VARCHAR) || ':' || epoch)
         |         AS shuffle_key
         |FROM e ORDER BY doc_id, epoch""".stripMargin
    },

    // independent batch replay of the streaming fold's final state:
    // trainer CTE chain + encode chain + per-source count/sum
    "tokenize_streaming" -> {
      val steps = 10
      val applied = (1 to steps).foldLeft("enc") { (acc, i) =>
        s"replace($acc, (SELECT pair FROM b$i),\n" +
          s"      (SELECT replace(pair, chr(2) || chr(1), '') FROM b$i))"
      }
      val tail =
        s"""d0 AS MATERIALIZED (
           |  SELECT doc_id, source, array_to_string(list_transform(
           |    list_filter($normToks, w -> length(w) > 0),
           |    w -> array_to_string(list_transform(string_split(w, ''),
           |           c -> chr(1) || c || chr(2)), '')
           |         || chr(1) || '</w>' || chr(2)), '') AS enc
           |  FROM documents),
           |e AS (SELECT doc_id, source, $applied AS enc FROM d0),
           |t AS (SELECT source,
           |        CAST(CASE WHEN length(enc) = 0 THEN 0
           |             ELSE len(string_split(substring(enc, 2, length(enc) - 2),
           |                      chr(2) || chr(1))) END AS BIGINT) AS n_tokens
           |      FROM e)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
           |FROM t GROUP BY source ORDER BY source""".stripMargin
      s"WITH ${bpeTrainCtes(steps)},\n$tail"
    },

    "pipeline_tokenize" -> {
      val steps = 10
      val stop = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
      val applied = (1 to steps).foldLeft("enc") { (acc, i) =>
        s"replace($acc, (SELECT pair FROM b$i),\n" +
          s"      (SELECT replace(pair, chr(2) || chr(1), '') FROM b$i))"
      }
      // quality gate (the text_quality score formula), then the trainer
      // CTE chain over the GATED corpus, then the encode chain and the
      // pack_contig window — each piece is its own stripMargin block,
      // concatenated (never re-stripped: the CTEs contain `||` line heads)
      val quality =
        s"""q AS MATERIALIZED (
           |  SELECT doc_id, source, text FROM (
           |    SELECT doc_id, source, text, $normToks AS toks FROM documents)
           |  WHERE round((least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0)
           |          + CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
           |          + (1.0 - abs(CAST(len(list_filter(toks, t -> t IN ($stop)))
           |              AS DOUBLE) / len(toks) - 0.4))) / 3.0, 6) >= 0.6)""".stripMargin
      val tail =
        s"""d0 AS MATERIALIZED (
           |  SELECT doc_id, source, array_to_string(list_transform(
           |    list_filter($normToks, w -> length(w) > 0),
           |    w -> array_to_string(list_transform(string_split(w, ''),
           |           c -> chr(1) || c || chr(2)), '')
           |         || chr(1) || '</w>' || chr(2)), '') AS enc
           |  FROM q),
           |enc2 AS (SELECT doc_id, source, $applied AS enc FROM d0),
           |t AS (SELECT doc_id, source,
           |        CAST(CASE WHEN length(enc) = 0 THEN 0
           |             ELSE len(string_split(substring(enc, 2, length(enc) - 2),
           |                      chr(2) || chr(1))) END AS BIGINT) AS n_tokens
           |      FROM enc2),
           |o AS (
           |  SELECT doc_id, source, n_tokens,
           |         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
           |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |           AS BIGINT) AS off
           |  FROM t WHERE n_tokens > 0),
           |e2 AS (
           |  SELECT doc_id, source, off, n_tokens,
           |         unnest(range(CAST(floor(off / 512.0) AS BIGINT),
           |           CAST(floor((off + n_tokens - 1) / 512.0) AS BIGINT) + 1))
           |           AS seq_id
           |  FROM o)
           |SELECT doc_id, source, seq_id,
           |       greatest(seq_id * 512 - off, 0) AS tok_start,
           |       least((seq_id + 1) * 512 - off, n_tokens) AS tok_end,
           |       least((seq_id + 1) * 512 - off, n_tokens)
           |         - greatest(seq_id * 512 - off, 0) AS seq_tokens
           |FROM e2 ORDER BY doc_id, seq_id""".stripMargin
      s"WITH $quality,\n${bpeTrainCtes(steps, "q")},\n$tail"
    },

    "pipeline_batches" -> {
      val steps = 10
      val stop = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
      val applied = (1 to steps).foldLeft("enc") { (acc, i) =>
        s"replace($acc, (SELECT pair FROM b$i),\n" +
          s"      (SELECT replace(pair, chr(2) || chr(1), '') FROM b$i))"
      }
      val quality =
        s"""q AS MATERIALIZED (
           |  SELECT doc_id, source, text FROM (
           |    SELECT doc_id, source, text, $normToks AS toks FROM documents)
           |  WHERE round((least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0)
           |          + CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
           |          + (1.0 - abs(CAST(len(list_filter(toks, t -> t IN ($stop)))
           |              AS DOUBLE) / len(toks) - 0.4))) / 3.0, 6) >= 0.6)""".stripMargin
      val mergeRows = (1 to steps).map { i =>
        s"""SELECT CAST((SELECT count(*) FROM base) + $i AS BIGINT) AS token_id,
           |  string_split(substring(pair, 2, length(pair) - 2),
           |    chr(2) || chr(1))[1] ||
           |  string_split(substring(pair, 2, length(pair) - 2),
           |    chr(2) || chr(1))[2] AS symbol FROM b$i""".stripMargin
      }.mkString("\nUNION ALL\n")
      val tail =
        s"""base AS MATERIALIZED (
           |  SELECT DISTINCT c AS symbol FROM (
           |    SELECT unnest(string_split(word, '')) AS c FROM wrd)),
           |vocab0 AS MATERIALIZED (
           |  SELECT CAST(row_number() OVER (ORDER BY symbol) - 1 AS BIGINT)
           |           AS token_id, symbol
           |  FROM base
           |  UNION ALL
           |  SELECT CAST((SELECT count(*) FROM base) AS BIGINT), '</w>'
           |  UNION ALL
           |$mergeRows),
           |vocab AS MATERIALIZED (
           |  SELECT min(token_id) AS token_id, symbol FROM vocab0
           |  GROUP BY symbol),
           |d0 AS MATERIALIZED (
           |  SELECT doc_id, source, array_to_string(list_transform(
           |    list_filter($normToks, w -> length(w) > 0),
           |    w -> array_to_string(list_transform(string_split(w, ''),
           |           c -> chr(1) || c || chr(2)), '')
           |         || chr(1) || '</w>' || chr(2)), '') AS enc
           |  FROM q),
           |e AS (SELECT doc_id, source, $applied AS enc FROM d0),
           |t AS (SELECT doc_id, source,
           |        CAST(CASE WHEN length(enc) = 0 THEN 0
           |             ELSE len(string_split(substring(enc, 2, length(enc) - 2),
           |                      chr(2) || chr(1))) END AS BIGINT) AS n_tokens
           |      FROM e),
           |o AS (
           |  SELECT doc_id,
           |         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
           |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |           AS BIGINT) AS off
           |  FROM t WHERE n_tokens > 0),
           |tok AS (
           |  SELECT doc_id, source,
           |    unnest(string_split(substring(enc, 2, length(enc) - 2),
           |      chr(2) || chr(1))) AS symbol,
           |    unnest(range(0, CAST(length(enc)
           |      - length(replace(enc, chr(1), '')) AS BIGINT))) AS pos
           |  FROM e WHERE length(enc) > 0)
           |SELECT source, CAST((off + pos) // 512 AS BIGINT) AS seq_id,
           |       CAST((off + pos) % 512 AS BIGINT) AS seq_pos, token_id
           |FROM tok JOIN o USING (doc_id) JOIN vocab USING (symbol)
           |ORDER BY source, seq_id, seq_pos""".stripMargin
      s"WITH $quality,\n${bpeTrainCtes(steps, "q")},\n$tail"
    },

    "multimodal_resize" ->
      s"""WITH $mediaDimsCte,
         |g AS (
         |  SELECT media_id,
         |    CAST(CASE WHEN kind <> 4 THEN w END AS INTEGER) AS w,
         |    CAST(CASE WHEN kind <> 4 THEN h END AS INTEGER) AS h
         |  FROM f)
         |SELECT media_id, w AS src_w, h AS src_h,
         |       CASE WHEN w <= 320 AND h <= 240 THEN w
         |            WHEN w * 240 >= h * 320 THEN 320
         |            ELSE CAST(floor(w * 240 / h) AS INTEGER) END AS out_w,
         |       CASE WHEN w <= 320 AND h <= 240 THEN h
         |            WHEN w * 240 >= h * 320 THEN CAST(floor(h * 320 / w) AS INTEGER)
         |            ELSE 240 END AS out_h
         |FROM g ORDER BY media_id""".stripMargin,

    "multimodal_frames" ->
      s"""WITH $mediaDimsCte,
         |g AS (
         |  SELECT media_id,
         |    CAST(CASE WHEN kind = 2 THEN 1 + extra
         |              WHEN kind <> 4 THEN 1 END AS INTEGER) AS n_frames
         |  FROM f)
         |SELECT media_id, n_frames, CAST(frame_idx AS INTEGER) AS frame_idx FROM (
         |  SELECT media_id, n_frames, unnest(range(0, n_frames, 2)) AS frame_idx
         |  FROM g)
         |ORDER BY media_id, frame_idx""".stripMargin)
}
