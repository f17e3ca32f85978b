package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BoundedCache

class BoundedCacheSpec extends AnyFunSuite {

  test("memoizes per key and evicts least-recently-used past the bound") {
    val c = new BoundedCache[Int, String](maxEntries = 2)
    var builds = 0
    def build(k: Int): String = { builds += 1; s"v$k" }
    assert(c.getOrElseUpdate(1)(build(1)) == "v1")
    assert(c.getOrElseUpdate(1)(build(1)) == "v1")
    assert(builds == 1) // hit, not a recompute
    assert(c.getOrElseUpdate(2)(build(2)) == "v2")
    c.getOrElseUpdate(1)(build(1)) // refresh 1's LRU order
    c.getOrElseUpdate(3)(build(3)) // evicts 2 (least recently used)
    assert(builds == 3)
    c.getOrElseUpdate(2)(build(2)) // recomputes: 2 was evicted
    assert(builds == 4)
    c.getOrElseUpdate(1)(build(1)) // 1 was evicted by 2's re-entry
    assert(builds == 5)
  }

  test("a slow compute on one key does not block another key's caller") {
    // the round-15 finding: the link-graph seed runs a real Spark job
    // inside getOrElseUpdate, and the compute ran under the MAP lock —
    // one tenant's multi-second build serialized every other cache
    // user. The fix computes under a per-key cell; this would deadlock
    // (or time out) if the map lock were still held across the compute.
    val c = new BoundedCache[Int, String](maxEntries = 4)
    val slowEntered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val slow = new Thread(() =>
      c.getOrElseUpdate(1) { slowEntered.countDown(); release.await(); "slow" })
    slow.start()
    assert(slowEntered.await(5, java.util.concurrent.TimeUnit.SECONDS))
    // while key 1's compute is in flight, key 2 must proceed
    val got = new java.util.concurrent.atomic.AtomicReference[String]
    val fast = new Thread(() => got.set(c.getOrElseUpdate(2)("fast")))
    fast.start()
    fast.join(5000)
    assert(got.get == "fast", "second key's compute blocked behind the first's")
    release.countDown()
    slow.join(5000)
    assert(c.getOrElseUpdate(1)("never") == "slow") // memoized, not recomputed
  }

  test("two callers of the SAME key share one compute") {
    val c = new BoundedCache[Int, String](maxEntries = 4)
    val builds = new java.util.concurrent.atomic.AtomicInteger
    val threads = (1 to 8).map(_ => new Thread(() =>
      c.getOrElseUpdate(7) { builds.incrementAndGet(); "x" }))
    threads.foreach(_.start()); threads.foreach(_.join(5000))
    assert(builds.get == 1)
  }
}
