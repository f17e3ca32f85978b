package graft.functions

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** The ONE implementation of immutable version-slot claiming shared by
  * every versioned artifact store ([[TokenizerStore]],
  * [[graft.operators.AnnIndex]], [[LibraryStore]], the streaming dedup
  * store epochs) — so visibility and race semantics cannot drift between
  * stores. Two slot shapes, one contract each:
  *
  *  - '''File slots''' ([[claimFile]]): one artifact file per version.
  *    The content is written COMPLETELY to a hidden temp sibling first
  *    and then hard-linked into the slot name — `link(2)` is atomic and
  *    fails when the name exists, so (a) two concurrent saves can never
  *    share a version (the loser retries the next number), and (b) a
  *    reader can NEVER observe a truncated artifact: the slot name
  *    appears only with its full bytes behind it. (A direct `CREATE_NEW`
  *    write gives (a) but not (b): a crash mid-write leaves a truncated
  *    file that version listings treat as valid.)
  *  - '''Directory slots''' ([[claimDir]]): one directory per version,
  *    claimed exclusively via `createDirectory`, filled by the caller,
  *    and made VISIBLE only by the caller's final marker publish
  *    ([[publishReplace]] of e.g. `model.json`) — so a half-written
  *    version directory is never listed ([[versions]] takes the
  *    visibility predicate).
  *
  * Slot numbers are never reused and never overwritten — a pinned
  * version can never observe drift; deletion is the separate, explicit
  * lifecycle step [[gcShadowed]] (shadowed versions + stale crashed
  * claims), never implicit.
  */
object VersionedSlots {

  /** Versions visible under `dir`, ascending: entry names accepted by
    * `parse`, kept when `visible` accepts the path (default: presence is
    * visibility — the file-slot contract, where the name only exists
    * complete).
    */
  def versions(dir: String, parse: String => Option[Int],
               visible: Path => Boolean = _ => true): Seq[Int] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    val stream = Files.list(d)
    try stream.iterator.asScala
      .flatMap(p => parse(p.getFileName.toString).filter(_ => visible(p)))
      .toSeq.sorted
    finally stream.close()
  }

  private val BatchDir = "b=([0-9]+)".r

  /** Batch directories committed under `root` — `b=<N>` entries whose
    * parquet `_SUCCESS` marker exists — ascending. The ONE
    * committed-batch visibility rule shared by every batch-directory
    * store ([[graft.operators.AnnIndex]] codes tables,
    * [[graft.streaming.EpochStore]] tables): a batch is visible iff its
    * writer's success marker landed, so a half-written directory (crash
    * mid-write) stays invisible until its idempotent retry rewrites it.
    */
  def committedBatches(root: String): Seq[Long] = {
    val d = Paths.get(root)
    if (!Files.isDirectory(d)) return Seq.empty
    val stream = Files.list(d)
    try stream.iterator.asScala
      .flatMap(p => p.getFileName.toString match {
        case BatchDir(b) if Files.exists(p.resolve("_SUCCESS")) =>
          Some(b.toLong)
        case _ => None
      }).toSeq.sorted
    finally stream.close()
  }

  /** Publish `content` at `target` atomically AND exclusively: full
    * bytes to a temp sibling, then `Files.createLink` into the slot
    * name. Returns false when the slot was already taken (caller
    * retries another slot). The temp file is always removed.
    */
  def publishExclusive(target: Path, content: String): Boolean = {
    val tmp = Files.createTempFile(target.getParent,
      "." + target.getFileName.toString, ".tmp")
    try {
      Files.writeString(tmp, content)
      try { Files.createLink(target, tmp); true }
      catch { case _: FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  /** Publish `content` at `target` atomically with upsert semantics
    * (temp sibling + `ATOMIC_MOVE` + `REPLACE_EXISTING`): readers see
    * either the old complete bytes or the new complete bytes, never a
    * truncation. For non-slot artifacts — library entries, directory-
    * slot visibility markers.
    */
  def publishReplace(target: Path, content: String): Unit = {
    val tmp = Files.createTempFile(target.getParent,
      "." + target.getFileName.toString, ".tmp")
    try {
      Files.writeString(tmp, content)
      Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
  }

  /** Claim the next free FILE slot at or above `from` and publish
    * `content(v)` into it (content takes the version because artifacts
    * usually embed their own number). Returns the claimed version.
    */
  def claimFile(dir: String, name: Int => String, from: Int,
                content: Int => String): Int = {
    Files.createDirectories(Paths.get(dir))
    var v = math.max(from, 1)
    while (!publishExclusive(Paths.get(dir, name(v)), content(v))) v += 1
    v
  }

  /** The claim floor file: `_next` under a directory-slot store records
    * the lowest version number a NEW claim may take (= max ever claimed
    * + 1). It exists so "slot numbers are never reused" survives GC: a
    * stale-claim sweep empties a slot DIRECTORY, and without the floor
    * the next [[claimDir]] (which scans from the visible maximum) would
    * re-issue the swept number — and a writer merely slower than the
    * staleness clock could then publish into a directory owned by a
    * different build, mixing two builds' artifacts under one version.
    * [[claimDir]] starts at the floor and raises it after every claim;
    * [[gcShadowed]] raises it before sweeping any directory slot.
    */
  private val FloorFile = "_next"

  /** The lowest version number a new directory-slot claim may take
    * (0 = no floor recorded yet — numbering conventions differ per
    * store, e.g. epochs start at 0, versions at 1).
    */
  def claimFloor(dir: String): Int = {
    val p = Paths.get(dir, FloorFile)
    if (!Files.exists(p)) 0
    else scala.util.Try(Files.readString(p).trim.toInt).getOrElse(0)
  }

  /** Raise the store's claim floor to at least `v` (idempotent,
    * monotone). Public for callers that claim a slot outside
    * [[claimDir]] (e.g. a store whose numbering starts below
    * claimDir's minimum of 1).
    */
  def raiseFloor(dir: String, v: Int): Unit =
    if (v > claimFloor(dir))
      publishReplace(Paths.get(dir, FloorFile), v.toString)

  /** Claim the next free DIRECTORY slot at or above `from` (exclusive:
    * `createDirectory` fails on an occupied slot and the loser retries).
    * The caller fills the directory and publishes its visibility marker
    * LAST. Claims never go below the store's [[claimFloor]], so a
    * version number emptied by a stale-claim sweep is never re-issued.
    * Returns the claimed version.
    */
  def claimDir(dir: String, name: Int => String, from: Int): Int = {
    Files.createDirectories(Paths.get(dir))
    var v = math.max(math.max(from, 1), claimFloor(dir))
    while (true) {
      try {
        Files.createDirectory(Paths.get(dir, name(v)))
        raiseFloor(dir, v + 1)
        return v
      }
      catch { case _: FileAlreadyExistsException => v += 1 }
    }
    v // unreachable
  }

  /** The GC tombstone: written into a directory slot BEFORE its
    * visibility marker is deleted, so a slot caught mid-decommission (a
    * crash or I/O failure during the tree walk) is distinguishable from
    * a fresh in-flight claim. A tombstoned slot can never become visible
    * again — its marker is gone and markers are only ever published by
    * the slot's original (long-finished) writer — so the next GC run
    * re-collects it UNCONDITIONALLY, not after another full staleness
    * clock (which the partial delete itself would have reset by
    * refreshing the directory mtime).
    */
  private val Tombstone = "_gc"

  /** The ONE explicit-GC step every versioned store here defers to
    * ([[graft.streaming.StreamingIndex.pruneShadowed]] generalized):
    * delete (a) SHADOWED visible versions — all but the newest
    * `keepLast` — and (b) uncommitted slots (claimed but never made
    * visible: a crashed build/rotation) whose last modification is older
    * than `staleUncommittedMs`, so an in-flight claim is never swept
    * from under its writer. A pinned reader of any KEPT version is
    * undisturbed — GC only ever touches slots outside the kept set, and
    * versions/epochs are immutable so there is nothing to compact in
    * place.
    *
    * Directory slots are DECOMMISSIONED in three ordered steps: the
    * [[Tombstone]] lands first, then the visibility `marker` is deleted,
    * then the tree walk — so a listing raced against a partial delete
    * sees an uncommitted slot, never a committed version with missing
    * tables (the `_parts`-first discipline of
    * `StreamingIndex.pruneShadowed`), and a slot whose walk THROWS (a
    * stray open handle) is re-collected unconditionally by the next run
    * via its tombstone instead of waiting out a fresh staleness clock.
    * Each failure is surfaced through `onDeleteFailure` (default: one
    * stderr line), never swallowed silently. Before any directory slot
    * is swept its number is fenced via the [[claimFloor]] file, so the
    * emptied slot number is never re-issued to a later claim.
    *
    * Returns the version numbers actually deleted. Driver-side
    * O(versions) listing + deletes — control-plane work, like every
    * lifecycle step in this engine.
    */
  /** The NEWEST mtime anywhere under a slot's tree — the stale-claim
    * clock. The slot directory's own mtime is set once at claim time
    * and nested writes (a long parquet job laying down
    * `codes/b=0/c_id=*` for hours) never refresh it, so judging
    * staleness by the top-level mtime alone would sweep a live slow
    * writer mid-write; any file the writer touches keeps the whole
    * tree fresh. Cost: one walk over UNCOMMITTED slots only (committed
    * and tombstoned slots never reach this check).
    */
  private def deepestMtimeMs(p: Path): Long =
    // Files.walk itself INSIDE the try: a slot deleted by a concurrent
    // GC run between the listing and this walk must read as "fresh"
    // (skip), not throw out of gcShadowed and abort the whole sweep
    try {
      val walk = Files.walk(p)
      try walk.iterator.asScala
        .map(q => Files.getLastModifiedTime(q).toMillis)
        .foldLeft(0L)(math.max)
      finally walk.close()
    } catch { case _: Exception => Long.MaxValue } // racing writer: fresh

  def gcShadowed(dir: String, parse: String => Option[Int],
                 visible: Path => Boolean = _ => true,
                 keepLast: Int = 2,
                 marker: Option[String] = None,
                 staleUncommittedMs: Long = 24L * 3600 * 1000,
                 nowMs: Long = System.currentTimeMillis,
                 onDeleteFailure: (Int, Exception) => Unit = (v, e) =>
                   System.err.println(
                     s"[graft-gc] failed to delete version $v: $e")): Seq[Int] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    val stream = Files.list(d)
    val entries =
      try stream.iterator.asScala
        .flatMap(p => parse(p.getFileName.toString).map(v => (v, p)))
        .toVector.sortBy(_._1)
      finally stream.close()
    val keep = entries.filter { case (_, p) => visible(p) }
      .map(_._1).takeRight(math.max(1, keepLast)).toSet
    entries.filter { case (v, p) =>
      if (keep.contains(v)) false
      // a tombstoned slot is a half-deleted decommission: collect
      // unconditionally (it can never become visible again)
      else if (Files.exists(p.resolve(Tombstone))) true
      else if (visible(p)) true // shadowed committed version
      // subtraction, not addition: the walk-exception fallback is
      // Long.MaxValue ("fresh"), and `MaxValue + staleMs` would wrap
      // negative and judge the live writer stale — the exact bug this
      // clock exists to prevent. `nowMs - MaxValue` stays negative.
      else nowMs - deepestMtimeMs(p) >= staleUncommittedMs
    }.filter { case (v, p) =>
      try {
        if (Files.isDirectory(p)) {
          // fence the number first: even if every delete below fails,
          // no later claim can take this slot
          raiseFloor(dir, v + 1)
          // tombstone → marker delete → walk (see Scaladoc ordering)
          val tomb = p.resolve(Tombstone)
          if (!Files.exists(tomb)) Files.writeString(tomb, "")
          marker.foreach(m => Files.deleteIfExists(p.resolve(m)))
          val walk = Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .filter(q => q != p && q != tomb)
            .forEach(q => Files.delete(q))
          finally walk.close()
          Files.delete(tomb)
          Files.delete(p)
        } else Files.deleteIfExists(p)
        true
      } catch { case e: Exception => onDeleteFailure(v, e); false }
    }.map(_._1)
  }
}
