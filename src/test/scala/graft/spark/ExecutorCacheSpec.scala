package graft.spark

import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** Weight-bounded executor cache (reference SparkExecutorCache
  * semantics): load-once, LRU-by-weight eviction, oversized bypass. */
class ExecutorCacheSpec extends AnyFunSuite with BeforeAndAfterEach {

  override def beforeEach(): Unit = {
    GraftExecutorCache.clear()
    System.clearProperty("graft.executor-cache.max-total-size")
    System.clearProperty("graft.executor-cache.max-entry-size")
  }
  override def afterEach(): Unit = beforeEach()

  private def v(s: String): String = s

  test("loads once per key while resident") {
    var loads = 0
    def load(): String = { loads += 1; "x" }
    (1 to 5).foreach { _ =>
      GraftExecutorCache.get("k1", (_: String) => 100L)(load())
    }
    assert(loads === 1)
  }

  test("evicts least-recently-used entries when over the weight budget") {
    System.setProperty("graft.executor-cache.max-total-size", "1000")
    // three 400-weight entries: inserting the third must evict the
    // least recently USED (k-a was touched after k-b)
    GraftExecutorCache.get("k-a", (_: String) => 400L)(v("a"))
    GraftExecutorCache.get("k-b", (_: String) => 400L)(v("b"))
    GraftExecutorCache.get("k-a", (_: String) => 400L)(v("a2")) // touch a (hit)
    GraftExecutorCache.get("k-c", (_: String) => 400L)(v("c"))
    val (n, w) = GraftExecutorCache.stats
    assert(n === 2 && w === 800L)
    // k-b was evicted (re-load runs and pushes out k-a, now the LRU);
    // k-c stays resident through both evictions
    var reloads = 0
    GraftExecutorCache.get("k-b", (_: String) => 400L) { reloads += 1; v("b") }
    assert(reloads === 1)
    GraftExecutorCache.get("k-c", (_: String) => 400L) { reloads += 1; v("c") }
    assert(reloads === 1)
    GraftExecutorCache.get("k-a", (_: String) => 400L) { reloads += 1; v("a") }
    assert(reloads === 2)
  }

  test("entries above max-entry-size bypass the cache") {
    System.setProperty("graft.executor-cache.max-entry-size", "100")
    var loads = 0
    (1 to 3).foreach { _ =>
      GraftExecutorCache.get("big", (_: String) => 10000L) { loads += 1; v("B") }
    }
    assert(loads === 3) // never cached, never evicted anyone
    assert(GraftExecutorCache.stats._1 === 0)
  }
}
