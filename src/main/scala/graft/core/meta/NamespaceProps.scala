package graft.core.meta

/** The ONE read/write surface for a namespace's `_namespace.json` —
  * shared by the Spark catalog's SupportsNamespaces implementation and
  * the REST server's spec namespace routes, so the two can never
  * disagree on the store's path, shape, or lifecycle. The file also
  * serves as the created-namespace MARKER that dropNamespace uses to
  * tell a child namespace (protected) from a dropped table's residual
  * directory (removable), so writes always materialize it, even empty.
  */
object NamespaceProps {

  def path(warehouse: String, namespace: Seq[String]): String =
    (warehouse +: namespace).mkString("/") + "/_namespace.json"

  def read(warehouse: String, namespace: Seq[String]): Map[String, String] = {
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
      props: Map[String, String]): Unit = {
    val o = MetaJson.mapper.createObjectNode()
    props.foreach { case (k, v) => o.put(k, v) }
    GraftIO.writeString(path(warehouse, namespace),
      MetaJson.mapper.writeValueAsString(o))
  }

  /** spec UpdateNamespacePropertiesRequest semantics: apply removals +
    * updates, returning (actually-removed, updated) key lists. */
  def update(warehouse: String, namespace: Seq[String],
      removals: Seq[String], updates: Map[String, String])
      : (Seq[String], Seq[String]) = {
    val cur = read(warehouse, namespace)
    val removed = removals.filter(cur.contains)
    write(warehouse, namespace, (cur -- removals) ++ updates)
    (removed, updates.keys.toSeq)
  }
}
