package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.functions.{TokenizerStore, VersionedSlots}
import graft.operators.AnnIndex
import graft.streaming.EpochStore

/** Explicit GC of shadowed/uncommitted store versions
  * ([[VersionedSlots.gcShadowed]] — `StreamingIndex.pruneShadowed`
  * generalized): shadowed versions are reclaimed, kept versions stay
  * readable for pinned readers, crashed (uncommitted) claims are
  * collected only once stale, and slot numbers are never reused after a
  * sweep.
  */
class VersionGcSpec extends SparkSpec {
  import spark.implicits._

  private def tmp = Files.createTempDirectory("graft_gc").toString

  test("EpochStore.gc reclaims shadowed epochs; the kept epoch is intact") {
    val root = tmp
    val seed = EpochStore.claimNext(root)
    EpochStore.writeBatch(Seq(1, 2, 3).toDF("x"), seed, "t", 0L)
    EpochStore.commit(seed)
    // folds must be idempotent under union-overlap (rotate reads ALL
    // committed epochs so a pinned stream's post-rotation appends are
    // carried forward) — distinct-style, like every production fold
    val fold = (df: org.apache.spark.sql.DataFrame) => df.distinct()
    EpochStore.rotate(spark, root, Seq("t" -> fold))
    EpochStore.rotate(spark, root, Seq("t" -> fold))
    assert(EpochStore.epochs(root) == Seq(0, 1, 2))
    val deleted = EpochStore.gc(root, keepLast = 1)
    assert(deleted == Seq(0, 1))
    assert(EpochStore.epochs(root) == Seq(2))
    // the pinned survivor reads exactly what it held before the sweep
    val kept = EpochStore.current(root)
    assert(EpochStore.readAll(spark, kept, "t")
      .as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    // slot numbers are never reused: the next rotation claims 3
    assert(EpochStore.rotate(spark, root, Seq("t" -> fold)).epoch == 3)
  }

  test("EpochStore.gc collects stale crashed claims, spares fresh ones") {
    val root = tmp
    val seed = EpochStore.claimNext(root)
    EpochStore.writeBatch(Seq(1).toDF("x"), seed, "t", 0L)
    EpochStore.commit(seed)
    // a crashed rotation: epoch claimed, tables half-written, no marker
    val crashed = EpochStore.claimNext(root)
    EpochStore.writeBatch(Seq(2).toDF("x"), crashed, "t", 0L)
    assert(EpochStore.epochs(root) == Seq(0), "uncommitted is invisible")
    // fresh (within staleness bound): spared — its writer may be alive
    assert(EpochStore.gc(root, keepLast = 1) == Seq.empty)
    assert(Files.isDirectory(Paths.get(root, s"e=${crashed.epoch}")))
    // stale: collected
    assert(EpochStore.gc(root, keepLast = 1, staleUncommittedMs = 0)
      == Seq(crashed.epoch))
    assert(!Files.exists(Paths.get(root, s"e=${crashed.epoch}")))
    // the committed epoch survives both sweeps
    assert(EpochStore.epochs(root) == Seq(0))
  }

  test("AnnIndex.gcShadowed keeps probe-able versions, collects the rest") {
    val dir = tmp
    val emb = Tables.embeddings(spark, sf())
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    AnnIndex.build(emb, dir, nCentroids = 4)
    val (_, v2) = AnnIndex.build(emb, dir, nCentroids = 8)
    val (_, v3) = AnnIndex.build(emb, dir, nCentroids = 8)
    // a crashed build: slot claimed, model never published
    Files.createDirectory(Paths.get(dir, "v9"))
    val pinnedBefore = AnnIndex.probe(spark, dir, queries, emb, k = 3,
      version = v2).orderBy("q_id", "rank").collect()
    val deleted = AnnIndex.gcShadowed(dir, keepLast = 2,
      staleUncommittedMs = 0)
    assert(deleted == Seq(1, 9))
    assert(AnnIndex.versions(dir) == Seq(v2, v3))
    assert(!Files.exists(Paths.get(dir, "v1")))
    // kept versions answer exactly as before the sweep
    val pinnedAfter = AnnIndex.probe(spark, dir, queries, emb, k = 3,
      version = v2).orderBy("q_id", "rank").collect()
    assert(pinnedAfter.sameElements(pinnedBefore))
    // the next build claims past EVERY number the store has ever issued
    // (the _next claim floor, raised by the sweep): swept v9's number is
    // fenced, so a writer of v9 merely slower than the staleness clock
    // can never share its number with a later build
    val (_, v4) = AnnIndex.build(emb, dir, nCentroids = 4)
    assert(v4 == 10)
    assert(graft.functions.VersionedSlots.claimFloor(dir) == 11)
  }

  test("a slot whose mtime walk throws is judged FRESH, never stale") {
    // the stale-claim clock falls back to Long.MaxValue ("fresh as of
    // forever") when the walk races a writer; the comparison must be
    // overflow-safe — `MaxValue + staleMs` wraps negative and would
    // sweep the live slow writer, the exact bug the clock prevents
    val root = tmp
    val seed = EpochStore.claimNext(root)
    EpochStore.writeBatch(Seq(1).toDF("x"), seed, "t", 0L)
    EpochStore.commit(seed)
    val racing = EpochStore.claimNext(root)
    EpochStore.writeBatch(Seq(2).toDF("x"), racing, "t", 0L)
    // a dangling symlink makes getLastModifiedTime throw mid-walk —
    // the same observable as a file deleted between list and stat
    Files.createSymbolicLink(
      Paths.get(root, s"e=${racing.epoch}", "racing"),
      Paths.get(root, "never_exists"))
    // default 24h staleness bound: the walk-exception slot is spared
    assert(EpochStore.gc(root, keepLast = 1) == Seq.empty)
    assert(Files.isDirectory(Paths.get(root, s"e=${racing.epoch}")))
  }

  test("half-deleted decommission (tombstoned slot) is re-collected " +
      "unconditionally, not after a fresh staleness clock") {
    val root = tmp
    // two committed epochs; keepLast=1 dooms e=0
    val seed = EpochStore.claimNext(root)
    EpochStore.writeBatch(Seq(1).toDF("x"), seed, "t", 0L)
    EpochStore.commit(seed)
    EpochStore.rotate(spark, root, Seq("t" -> identity))
    // simulate a sweep of e=0 that crashed mid-walk: tombstone landed,
    // marker gone, tables still on disk, mtime FRESH (the partial delete
    // refreshed it — exactly the state the old staleness clock missed)
    val doomed = Paths.get(root, "e=0")
    Files.writeString(doomed.resolve("_gc"), "")
    Files.delete(doomed.resolve("_COMMITTED"))
    assert(EpochStore.epochs(root) == Seq(1), "half-deleted is invisible")
    // staleUncommittedMs at the default (24h) — the tombstone alone must
    // drive the re-collect
    assert(EpochStore.gc(root, keepLast = 1) == Seq(0))
    assert(!Files.exists(doomed))
    assert(EpochStore.epochs(root) == Seq(1))
  }

  test("TokenizerStore.gcShadowed sweeps shadowed artifact files") {
    val dir = tmp
    val docs = Seq((1L, "aa ab aa"), (2L, "ab aa")).toDF("doc_id", "text")
    val v1 = TokenizerStore.trainAndSave(dir, docs, steps = 2)
    val v2 = TokenizerStore.trainAndSave(dir, docs, steps = 3)
    val v3 = TokenizerStore.trainAndSave(dir, docs, steps = 4)
    assert(TokenizerStore.gcShadowed(dir, keepLast = 2) == Seq(v1))
    assert(TokenizerStore.versions(dir) == Seq(v2, v3))
    // pinned survivors load; the swept one is gone, not corrupted
    assert(TokenizerStore.get(dir, v2).exists(_.steps == 3))
    assert(TokenizerStore.get(dir, v1).isEmpty)
    // next save claims a fresh number past the swept history
    assert(TokenizerStore.trainAndSave(dir, docs, steps = 2) == v3 + 1)
  }

  test("SQL wire: graft_ann_gc / graft_tok_gc sweep from spark.sql") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val dir = tmp
    val emb = Tables.embeddings(spark, sf())
    AnnIndex.build(emb, dir, nCentroids = 4)
    AnnIndex.build(emb, dir, nCentroids = 4)
    AnnIndex.build(emb, dir, nCentroids = 4)
    assert(spark.sql(s"SELECT graft_ann_gc('$dir', 2)")
      .as[Seq[Int]].head() == Seq(1))
    assert(AnnIndex.versions(dir) == Seq(2, 3))
    val tokDir = tmp
    val docs = Seq((1L, "aa ab aa")).toDF("doc_id", "text")
    TokenizerStore.trainAndSave(tokDir, docs, steps = 2)
    TokenizerStore.trainAndSave(tokDir, docs, steps = 2)
    TokenizerStore.trainAndSave(tokDir, docs, steps = 2)
    assert(spark.sql(s"SELECT graft_tok_gc('$tokDir', 1)")
      .as[Seq[Int]].head() == Seq(1, 2))
    assert(TokenizerStore.versions(tokDir) == Seq(3))
    // type errors fail analysis, like the rest of the wire surface
    val e = intercept[Exception](
      spark.sql(s"SELECT graft_ann_gc('$dir', 'two')").collect())
    assert(e.getMessage.contains("graft_ann_gc"))
  }

  test("gcShadowed always keeps at least one visible version") {
    val dir = tmp
    Files.createDirectories(Paths.get(dir))
    VersionedSlots.claimFile(dir, v => s"a_v$v.json", 1, _ => "{}")
    val parse: String => Option[Int] = {
      case s if s.startsWith("a_v") && s.endsWith(".json") =>
        Some(s.stripPrefix("a_v").stripSuffix(".json").toInt)
      case _ => None
    }
    assert(VersionedSlots.gcShadowed(dir, parse, keepLast = 0) == Seq.empty)
    assert(VersionedSlots.versions(dir, parse) == Seq(1))
  }
}
