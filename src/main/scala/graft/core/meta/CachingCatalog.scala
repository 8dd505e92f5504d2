package graft.core.meta

import graft.core.expr.PartitionSpec
import graft.core.types.GSchema

/** Expiration-aware table cache in front of any catalog (reference
  * core/src/main/java/org/apache/iceberg/CachingCatalog.java:46 +
  * spark/.../SparkCachedTableCatalog): repeated `loadTable` calls inside
  * the expiration window reuse the SAME GTable handle, so the per-query
  * catalog round-trip (REST GET, JDBC row read, pointer-directory stat)
  * disappears from the analysis hot path. What is cached is the table's
  * EXISTENCE and its ops handle; every load returns a FRESH GTable over
  * the cached ops, so concurrent queries never share mutable handle
  * state and a foreign commit is visible the moment the new handle
  * refreshes (first metadata access). Only a cross-process DROP can be
  * masked, bounded by `expirationMs` (reference
  * cache.expiration-interval-ms, 30 s). Writes routed through this
  * catalog (create/drop/rename) invalidate eagerly. */
final class CachingCatalog(val underlying: HadoopCatalog,
    expirationMs: Long = 30000L)
  extends HadoopCatalog(underlying.warehouse) {

  // reference semantics: a NEGATIVE interval never expires; zero is
  // rejected catalog-side (GraftCatalog maps it to cache-disabled)
  private def fresh(loadedAtMs: Long, now: Long): Boolean =
    expirationMs < 0 || now - loadedAtMs < expirationMs

  private final case class Entry(table: GTable, loadedAtMs: Long)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()
  private val hitCounter = new java.util.concurrent.atomic.AtomicLong()

  private def key(namespace: Seq[String], name: String): String =
    (namespace :+ name).mkString("\u0000")

  /** cache hits so far (test/diagnostics hook) */
  def hits: Long = hitCounter.get()

  def invalidate(namespace: Seq[String], name: String): Unit =
    cache.remove(key(namespace, name))

  def invalidateAll(): Unit = cache.clear()

  override def tableLocation(namespace: Seq[String], name: String): String =
    underlying.tableLocation(namespace, name)

  override def loadTable(namespace: Seq[String], name: String): Option[GTable] = {
    val k = key(namespace, name)
    val now = System.currentTimeMillis()
    val e = cache.get(k)
    if (e != null && fresh(e.loadedAtMs, now)) {
      hitCounter.incrementAndGet()
      Some(new GTable(e.table.ops))
    } else {
      if (e != null) cache.remove(k, e)
      underlying.loadTable(namespace, name) match {
        case Some(t) => cache.put(k, Entry(t, now)); Some(t)
        case None    => None
      }
    }
  }

  override def createTable(namespace: Seq[String], name: String,
      schema: GSchema, spec: PartitionSpec = PartitionSpec.Unpartitioned,
      properties: Map[String, String] = Map.empty): GTable = {
    val t = underlying.createTable(namespace, name, schema, spec, properties)
    cache.put(key(namespace, name), Entry(t, System.currentTimeMillis()))
    t
  }

  // staged CTAS/RTAS publish through raw ops: never cached, but a
  // successful publish makes any cached handle's next refresh see it
  // (same pointer), so no invalidation is needed for correctness — the
  // conservative remove covers the replace-changes-schema window
  override def tableOps(namespace: Seq[String], name: String): TableOps = {
    invalidate(namespace, name)
    underlying.tableOps(namespace, name)
  }

  override def tableExists(namespace: Seq[String], name: String): Boolean = {
    val e = cache.get(key(namespace, name))
    if (e != null && fresh(e.loadedAtMs, System.currentTimeMillis())) true
    else underlying.tableExists(namespace, name)
  }

  override def dropTable(namespace: Seq[String], name: String): Boolean = {
    invalidate(namespace, name)
    underlying.dropTable(namespace, name)
  }

  // WITHOUT this override the 3-arg drop fell through to the inherited
  // directory implementation: a plain DROP TABLE (purge=false) through
  // Spark deleted the metadata directory but left the UNDERLYING
  // catalog's pointer (HMS entry, JDBC row) dangling — the table kept
  // "existing" with its metadata gone
  override def dropTable(namespace: Seq[String], name: String,
      purge: Boolean): Boolean = {
    invalidate(namespace, name)
    underlying.dropTable(namespace, name, purge)
  }

  override def renameTable(namespace: Seq[String], name: String,
      newNamespace: Seq[String], newName: String): Unit = {
    invalidate(namespace, name)
    invalidate(newNamespace, newName)
    underlying.renameTable(namespace, name, newNamespace, newName)
  }

  override def listTables(namespace: Seq[String]): Seq[String] =
    underlying.listTables(namespace)
}
