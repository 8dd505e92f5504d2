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

  test("loads on distinct keys run in parallel; same key loads once") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    // two loads that each block until BOTH have started: deadlocks in
    // under-lock loading, passes with per-key latching
    val started = new CountDownLatch(2)
    val pool = Executors.newFixedThreadPool(2)
    val futs = Seq("pk-a", "pk-b").map { k =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          GraftExecutorCache.get(k, (_: String) => 10L) {
            started.countDown()
            assert(started.await(10, TimeUnit.SECONDS),
              "parallel load never started — loads are serialized")
            k
          }
          ()
        }
      })
    }
    futs.foreach(_.get(15, TimeUnit.SECONDS))
    pool.shutdown()

    // same key from many threads: exactly one load
    val loads = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool2 = Executors.newFixedThreadPool(8)
    val futs2 = (1 to 8).map { _ =>
      pool2.submit(new Runnable {
        override def run(): Unit = {
          val v = GraftExecutorCache.get("pk-same", (_: String) => 10L) {
            loads.incrementAndGet(); Thread.sleep(50); "V"
          }
          assert(v === "V")
        }
      })
    }
    futs2.foreach(_.get(15, TimeUnit.SECONDS))
    pool2.shutdown()
    assert(loads.get() === 1)
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
