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

  /** Levels that would be creatable but never (or differently)
    * addressable are rejected by every creation path (REST create, Spark
    * create, rename-into): '.' and 0x1F re-split in paths/identifiers,
    * '/' and '\' change the directory identity, '_' collides with
    * internal directories (_views, _namespace.json) and is filtered from
    * every listing. Zero levels would address the warehouse root. */
  /** One anti-traversal predicate for EVERY path-derived name (namespace
    * levels, table names, rename identifiers): nothing may escape or
    * re-root the warehouse or smuggle a separator. */
  def validName(s: String): Boolean =
    s.nonEmpty && s != "." && s != ".." && !s.contains('/') &&
      !s.contains('\\') && s.indexOf(0x1f.toChar) < 0

  def validateLevels(namespace: Seq[String]): Unit = {
    require(namespace.nonEmpty, "namespace must have at least one level")
    require(namespace.forall(l =>
      validName(l) && !l.startsWith("_") && !l.contains('.')),
      s"invalid namespace levels: ${namespace.mkString("[", ", ", "]")}")
  }

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
  /** Table signature: a metadata/ dir actually holding a metadata
    * document (a bare dir NAMED metadata may be a child table or child
    * namespace of a marked namespace). */
  private def looksLikeTable(warehouse: String, namespace: Seq[String]): Boolean = {
    val md = (warehouse +: namespace).mkString("/") + "/metadata"
    java.nio.file.Files.isDirectory(GraftIO.toPath(md)) &&
      GraftIO.list(md).exists(_.endsWith(".metadata.json"))
  }

  def mark(warehouse: String, namespace: Seq[String]): Unit =
    lock.synchronized {
      validateLevels(namespace)
      namespace.indices.foreach { i =>
        val lvl = namespace.take(i + 1)
        if (!GraftIO.exists(path(warehouse, lvl))) {
          // an UNMARKED level that coincides with an existing table must
          // refuse: planting the marker inside a table dir would make
          // the table read as an (empty) namespace whose plain drop
          // deletes the table's data. Marked levels are exempt — a
          // namespace may legitimately hold a child named "metadata".
          def collides = looksLikeTable(warehouse, lvl)
          require(!collides,
            s"namespace ${lvl.mkString(".")} collides with an existing table")
          write(warehouse, lvl, Map.empty) // writeString creates the dirs
          // NARROW the check-then-act window against a concurrent table
          // create on the same path (table commits don't take this lock,
          // so a commit landing after this recheck can still interleave
          // — full closure would need the table-commit path to share the
          // lock): if the table signature appeared meanwhile, withdraw
          // the marker rather than leave a table that reads as a
          // droppable-empty namespace
          if (collides) {
            GraftIO.delete(path(warehouse, lvl))
            throw new IllegalArgumentException(
              s"namespace ${lvl.mkString(".")} collides with an existing table")
          }
        }
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
    * updates atomically, returning (actually-removed, updated, missing)
    * key lists — `missing` is the removals that were not present, which
    * the response must report. Callers must reject a key present in
    * BOTH lists (spec: 422) before calling. */
  def update(warehouse: String, namespace: Seq[String],
      removals: Seq[String], updates: Map[String, String])
      : (Seq[String], Seq[String], Seq[String]) = lock.synchronized {
    val cur = read(warehouse, namespace)
    val removed = removals.filter(cur.contains)
    write(warehouse, namespace, (cur -- removals) ++ updates)
    (removed, updates.keys.toSeq, removals.filterNot(cur.contains))
  }

  /** True when `d` holds, at any depth, a namespace marker, a live table
    * (a metadata dir with a .metadata.json), or a stored view (a file
    * under _views). The scan prunes `data` directories — pure data trees
    * cannot hold any of these — so probing a dropped table's residual
    * costs its structure, not a walk over every data file. */
  def hasLiveContent(d: java.nio.file.Path): Boolean =
    java.nio.file.Files.exists(d.resolve("_namespace.json")) ||
      GraftIO.list(d.toString).map(GraftIO.toPath).exists { c =>
        val n = c.getFileName.toString
        java.nio.file.Files.isDirectory(c) && (n match {
          case "data" =>
            // prune ONLY table-layout data trees (parent is a table dir,
            // live or residual): there a `data` child is pure data and
            // the walk would cost one IO per data file. Under a plain
            // directory, "data" is just a name — a live table or
            // namespace called data must still count, or a non-cascade
            // drop would silently delete it.
            !hasTableMetadataChild(d) && hasLiveContent(c)
          case "metadata" =>
            // a version document directly inside = a live table at `d`;
            // otherwise the child may ITSELF be a table or namespace
            // that merely happens to be named metadata — recurse (cheap
            // for a residual: its metadata dir holds only flat files)
            GraftIO.list(c.toString).exists(_.endsWith(".metadata.json")) ||
              hasLiveContent(c)
          case "_views"   => GraftIO.list(c.toString).nonEmpty
          case _          => hasLiveContent(c)
        })
      }

  /** True when `d`'s "metadata" child is a TABLE's metadata directory —
    * a plain directory holding version documents, never nested
    * metadata/data directories or a namespace marker. Distinguishes a
    * table dir (live or dropped residual) from a plain directory whose
    * child merely happens to be NAMED metadata (itself a table or a
    * namespace) — the latter must not make the parent read as a table. */
  def hasTableMetadataChild(d: java.nio.file.Path): Boolean = {
    val md = d.resolve("metadata")
    java.nio.file.Files.isDirectory(md) &&
      !java.nio.file.Files.exists(md.resolve("_namespace.json")) &&
      !java.nio.file.Files.isDirectory(md.resolve("metadata")) &&
      !java.nio.file.Files.isDirectory(md.resolve("data"))
  }

  /** The ONE namespace-existence predicate (Spark catalog and REST
    * routes agree): a non-table directory carrying the marker or live
    * content. A dropped table's residual directory reads as absent —
    * re-creatable — on BOTH surfaces. The empty namespace is the
    * warehouse root. */
  def isNamespaceDir(warehouse: String, namespace: Seq[String]): Boolean =
    if (namespace.isEmpty)
      java.nio.file.Files.isDirectory(GraftIO.toPath(warehouse))
    else {
      val p = GraftIO.toPath((warehouse +: namespace).mkString("/"))
      // the marker SHORT-CIRCUITS the not-a-table test: a marked
      // namespace stays a namespace even when it holds a child table
      // named "metadata" (which would otherwise make it read as a table
      // directory and vanish from both surfaces); for UNMARKED legacy
      // dirs the same table-shape probe used by the content walk decides
      java.nio.file.Files.isDirectory(p) &&
        (java.nio.file.Files.exists(p.resolve("_namespace.json")) ||
          (!hasTableMetadataChild(p) && hasLiveContent(p)))
    }

  /** Drop guard shared by Spark dropNamespace and the REST route: the
    * first child that makes the namespace non-empty (a marked child
    * namespace, live tables/views at any depth, or a non-empty _views),
    * or None when the namespace is safely removable. */
  def nonEmptyBlocker(warehouse: String, namespace: Seq[String]): Option[String] =
    GraftIO.list((warehouse +: namespace).mkString("/"))
      .map(GraftIO.toPath)
      .filter(java.nio.file.Files.isDirectory(_))
      .find { d =>
        val n = d.getFileName.toString
        // symmetric with hasLiveContent: any live content blocks,
        // including under legacy underscore-named children
        if (n == "_views") GraftIO.list(d.toString).nonEmpty
        else hasLiveContent(d)
      }
      .map(_.getFileName.toString)
}
