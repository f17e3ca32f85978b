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

  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > maxEntries
  }

  /** Memoize: the value is computed at most once per live key; LRU
    * order refreshes on every hit. The compute runs under the lock —
    * fine for plan construction (control-plane sized), which is all
    * this cache holds.
    */
  def getOrElseUpdate(k: K)(v: => V): V = synchronized {
    val cur = map.get(k)
    if (cur != null) cur
    else { val built = v; map.put(k, built); built }
  }
}
