package graft.core.meta

/** The ONE read/write surface for a namespace's `_namespace.json` —
  * shared by the Spark catalog's SupportsNamespaces implementation and
  * the REST server's spec namespace routes, so the two can never
  * disagree on the store's path, shape, or lifecycle. The file also
  * serves as the created-namespace MARKER that dropNamespace and
  * listNamespaces use to tell a real namespace (protected, listed)
  * from a dropped table's residual directory (removable, hidden), so
  * creates mark EVERY level and writes always materialize the file,
  * even with no properties.
  *
  * All mutation is serialized on one JVM-wide lock: the REST server's
  * handler pool and the Spark catalog share this store in-process, and
  * an unsynchronized read-modify-write would silently drop one side's
  * concurrent property update.
  */
object NamespaceProps {

  private val lock = new Object

  def path(warehouse: String, namespace: Seq[String]): String =
    (warehouse +: namespace).mkString("/") + "/_namespace.json"

  def read(warehouse: String, namespace: Seq[String]): Map[String, String] =
    lock.synchronized {
      val p = path(warehouse, namespace)
      if (!GraftIO.exists(p)) Map.empty
      else {
        val b = Map.newBuilder[String, String]
        MetaJson.mapper.readTree(GraftIO.readString(p))
          .fields().forEachRemaining(e => b += e.getKey -> e.getValue.asText())
        b.result()
      }
    }

  def write(warehouse: String, namespace: Seq[String],
      props: Map[String, String]): Unit = lock.synchronized {
    val o = MetaJson.mapper.createObjectNode()
    props.foreach { case (k, v) => o.put(k, v) }
    GraftIO.writeString(path(warehouse, namespace),
      MetaJson.mapper.writeValueAsString(o))
  }

  /** Marker exists at EVERY level of `namespace` (creating a nested
    * namespace implicitly creates its ancestors); never clobbers a
    * level's existing properties. */
  def mark(warehouse: String, namespace: Seq[String]): Unit =
    lock.synchronized {
      namespace.indices.foreach { i =>
        val lvl = namespace.take(i + 1)
        if (!GraftIO.exists(path(warehouse, lvl))) write(warehouse, lvl, Map.empty)
      }
    }

  def marked(warehouse: String, namespace: Seq[String]): Boolean =
    GraftIO.exists(path(warehouse, namespace))

  /** Atomic read-modify-write under the store lock — the Spark catalog's
    * alterNamespace goes through here so it cannot lose a concurrent
    * REST-side property update (and vice versa). */
  def mutate(warehouse: String, namespace: Seq[String])(
      f: Map[String, String] => Map[String, String]): Unit =
    lock.synchronized { write(warehouse, namespace, f(read(warehouse, namespace))) }

  /** spec UpdateNamespacePropertiesRequest semantics: apply removals +
    * updates atomically, returning (actually-removed, updated) key
    * lists. Callers must reject a key present in BOTH lists (spec: 422)
    * before calling. */
  def update(warehouse: String, namespace: Seq[String],
      removals: Seq[String], updates: Map[String, String])
      : (Seq[String], Seq[String]) = lock.synchronized {
    val cur = read(warehouse, namespace)
    val removed = removals.filter(cur.contains)
    write(warehouse, namespace, (cur -- removals) ++ updates)
    (removed, updates.keys.toSeq)
  }
}
