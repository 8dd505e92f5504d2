package graft.spark

/** Weight-bounded executor-side cache (reference
  * spark/v4.0/spark/src/main/java/org/apache/iceberg/spark/SparkExecutorCache.java):
  * ONE per JVM, shared by parsed position-delete maps, DV bitmaps and
  * equality-delete key sets. Delete content is immutable and one file is
  * typically applied to many data files read by many tasks on the same
  * executor, so parsing once per JVM is the difference between O(tasks)
  * and O(files) delete-file IO at scale.
  *
  * Entry-count bounds (the previous design) mis-size in both directions:
  * 64 one-row entries waste the budget while 64 hundred-MB bitmaps blow
  * the heap. Entries are instead weighed in approximate retained bytes
  * and evicted LRU until the configured total fits; an entry above
  * `maxEntrySize` bypasses the cache entirely (the reference's
  * max-entry-size contract — a giant delete file must not evict the
  * whole working set to pin itself).
  *
  * Sizing is JVM-system-property driven (`graft.executor-cache.
  * max-total-size` / `max-entry-size`, bytes) because executor-side code
  * has no SparkSession at hand; defaults follow the reference (128 MiB /
  * 64 MiB).
  */
object GraftExecutorCache {
  private def prop(name: String, dflt: Long): Long =
    Option(System.getProperty(name)).flatMap(_.toLongOption).getOrElse(dflt)

  def maxTotalSize: Long =
    prop("graft.executor-cache.max-total-size", 128L * 1024 * 1024)
  def maxEntrySize: Long =
    prop("graft.executor-cache.max-entry-size", 64L * 1024 * 1024)

  private final case class Entry(value: AnyRef, weight: Long)

  private val cache = new java.util.LinkedHashMap[Any, Entry](64, 0.75f, true)
  private var totalWeight = 0L

  private val inflight =
    new java.util.concurrent.ConcurrentHashMap[Any, java.util.concurrent.CompletableFuture[AnyRef]]()

  /** loads-once per key per JVM (while resident); weigher runs once at
    * insert. The map lock covers only bookkeeping — loads run OUTSIDE it
    * behind a per-key latch, so 32 executor threads parsing 32 DIFFERENT
    * delete files proceed in parallel while racing loads of the SAME
    * file still collapse to one IO (the reference gets both properties
    * from Caffeine's per-key loader). */
  def get[V <: AnyRef](key: Any, weigher: V => Long)(load: => V): V = {
    val hit0 = cache.synchronized(cache.get(key))
    if (hit0 != null) return hit0.value.asInstanceOf[V]
    val fut = new java.util.concurrent.CompletableFuture[AnyRef]()
    val prev = inflight.putIfAbsent(key, fut)
    if (prev != null)
      // another thread owns the load; propagate its failure cause as-is
      try return prev.get().asInstanceOf[V]
      catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
    try {
      // lost the fast-path/latch race? someone may have inserted already
      val hit1 = cache.synchronized(cache.get(key))
      if (hit1 != null) { fut.complete(hit1.value); return hit1.value.asInstanceOf[V] }
      val v = load
      val w = math.max(64L, weigher(v))
      if (w <= maxEntrySize) cache.synchronized {
        totalWeight += w
        cache.put(key, Entry(v, w))
        val it = cache.entrySet().iterator()
        while (totalWeight > maxTotalSize && it.hasNext) {
          val e = it.next()
          if (e.getKey != key) { totalWeight -= e.getValue.weight; it.remove() }
        }
      }
      fut.complete(v)
      v
    } catch {
      case e: Throwable => fut.completeExceptionally(e); throw e
    } finally inflight.remove(key)
  }

  /** test hook: resident entry count + total weight */
  private[graft] def stats: (Int, Long) =
    cache.synchronized((cache.size(), totalWeight))
  private[graft] def clear(): Unit = cache.synchronized {
    cache.clear(); totalWeight = 0L
  }

  /** ~retained bytes of a data-path → position-bitmap map: the roaring
    * serialized size tracks heap closely (containers are the payload) */
  def weighPosMap(
      m: Map[String, org.roaringbitmap.longlong.Roaring64Bitmap]): Long =
    m.iterator.map { case (k, v) =>
      k.length * 2L + 64L + v.serializedSizeInBytes()
    }.sum

  /** ~retained bytes of an eq-delete key set: per row a Seq wrapper plus
    * ~32 B per boxed key column value */
  def weighKeySet(s: java.util.HashSet[Seq[Any]], keyWidth: Int): Long =
    64L + s.size.toLong * (48L + 32L * math.max(1, keyWidth))
}
