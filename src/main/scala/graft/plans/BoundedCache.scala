package graft.plans

/** A small synchronized LRU for session-lifetime memoization of
  * standing artifacts (the link graph, the frontier wave): in the
  * one-session harness it behaves like a plain map; in a long-lived
  * multi-tenant session it EVICTS least-recently-used entries instead
  * of leaking one DataFrame handle per (session, dir) forever.
  * Evicting a handle drops the strong reference to its lazily
  * checkpointed RDD, handing the checkpoint blocks back to Spark's
  * ContextCleaner (localCheckpoint storage is reclaimed when the RDD
  * is GC'd), so the bound caps checkpoint storage too, not just map
  * entries.
  */
final class BoundedCache[K, V <: AnyRef](maxEntries: Int) {

  // per-key memo cell: the compute synchronizes on the CELL (lazy
  // val), never on the map — one tenant's multi-second build (the
  // link-graph seed runs a real Spark job) must not block every other
  // cache user behind the map lock
  private final class Cell(thunk: () => V) { lazy val value: V = thunk() }

  private val map = new java.util.LinkedHashMap[K, Cell](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, Cell]): Boolean =
      size() > maxEntries
  }

  /** Memoize: the value is computed at most once per live key; LRU
    * order refreshes on every hit. The map lock is held only for the
    * map operation; the compute itself runs outside it under the
    * key's own cell lock (two callers of the same key still share one
    * compute; callers of different keys never serialize).
    */
  def getOrElseUpdate(k: K)(v: => V): V = {
    val cell = synchronized {
      val cur = map.get(k)
      if (cur != null) cur
      else { val c = new Cell(() => v); map.put(k, c); c }
    }
    cell.value
  }
}
