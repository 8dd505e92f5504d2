package graft.core.meta

import java.sql.{Connection, DriverManager, SQLException}
import java.util.UUID

import graft.core.expr.PartitionSpec
import graft.core.types.GSchema

/** JDBC-backed catalog (reference core/.../jdbc/JdbcCatalog.java +
  * JdbcTableOperations): the current-metadata POINTER lives in a database
  * row and commits are a conditional UPDATE (compare-and-swap on the
  * version column), while metadata and data files stay under the
  * warehouse directory exactly like the Hadoop catalog. This gives
  * atomic commits on filesystems without atomic create (object stores)
  * and adds what a directory catalog cannot do: table RENAME as a pure
  * pointer update, since the name is decoupled from the location.
  *
  * Works against any JDBC driver on the classpath; tested with embedded
  * Derby (`jdbc:derby:/path/to/db;create=true`).
  */
object Jdbc {
  private val CatalogTableDDL =
    """CREATE TABLE graft_tables (
      |  catalog_name VARCHAR(255) NOT NULL,
      |  table_namespace VARCHAR(255) NOT NULL,
      |  table_name VARCHAR(255) NOT NULL,
      |  metadata_location VARCHAR(4000),
      |  previous_metadata_location VARCHAR(4000),
      |  table_location VARCHAR(4000),
      |  version INT NOT NULL,
      |  PRIMARY KEY (catalog_name, table_namespace, table_name)
      |)""".stripMargin

  private val initialized = scala.collection.mutable.Set.empty[String]

  def withConn[A](uri: String)(f: Connection => A): A = {
    val c = DriverManager.getConnection(uri)
    try f(c) finally c.close()
  }

  /** idempotent catalog-table bootstrap */
  def ensureSchema(uri: String): Unit = synchronized {
    if (initialized.contains(uri)) return
    withConn(uri) { c =>
      try {
        val st = c.createStatement()
        try st.executeUpdate(CatalogTableDDL) finally st.close()
      } catch {
        // X0Y32: Derby "already exists"; other engines raise their own
        // duplicate-object codes — probe instead of parsing states
        case e: SQLException =>
          val probe = c.createStatement()
          try probe.executeQuery("SELECT COUNT(*) FROM graft_tables").close()
          catch { case _: SQLException => throw e }
          finally probe.close()
      }
    }
    initialized += uri
  }
}

/** Metadata pointer in a `graft_tables` row; CAS = UPDATE .. WHERE
  * version = base (exactly-one-row update wins the race). Metadata JSON
  * is written to uniquely-named files so concurrent committers never
  * collide on a path — the row decides the winner. */
final class JdbcTableOps(
    defaultLocation: String,
    uri: String,
    catalogName: String,
    namespace: String,
    name: String) extends TableOps {

  Jdbc.ensureSchema(uri)

  private def selectRow[A](f: java.sql.ResultSet => A): Option[A] =
    Jdbc.withConn(uri) { c =>
      val ps = c.prepareStatement(
        "SELECT metadata_location, version, table_location FROM graft_tables " +
          "WHERE catalog_name=? AND table_namespace=? AND table_name=?")
      try {
        ps.setString(1, catalogName); ps.setString(2, namespace); ps.setString(3, name)
        val rs = ps.executeQuery()
        try { if (rs.next()) Some(f(rs)) else None } finally rs.close()
      } finally ps.close()
    }

  // the STORED table_location wins over the name-derived default: after a
  // rename the data/metadata tree stays at the original path, and commits
  // + dropTable must keep writing/purging there, not under the new name
  override lazy val location: String =
    selectRow(rs => Option(rs.getString(3))).flatten.getOrElse(defaultLocation)

  override def currentVersion(): Int = selectRow(_.getInt(2)).getOrElse(0)

  override def current(): Option[TableMetadata] =
    // documents are UUID-named and immutable → parse once across handles
    selectRow(_.getString(1)).map(p => FileTableOps.metaCache.get(p)(
      MetaJson.readMetadata(GraftIO.readString(p), Some(p))))

  override def currentMetadataPath: Option[String] =
    selectRow(rs => Option(rs.getString(1))).flatten

  override def commit(baseVersion: Int, updated: TableMetadata): Boolean = {
    val metadataPath =
      s"$metadataDir/v${baseVersion + 1}-${UUID.randomUUID}.metadata.json"
    // ONE pointer read serves the metadata-log advance and the UPDATE's
    // previous-location bind below; the base document parse is cached
    // (UUID-named, immutable). If delete-after-commit removed the path a
    // concurrent winner superseded, that is a lost CAS — report false so
    // the committer refreshes and retries (same contract as FileTableOps).
    val prevPath =
      if (baseVersion == 0) None else selectRow(rs => Option(rs.getString(1))).flatten
    val (toWrite, expired) = prevPath match {
      case Some(p) =>
        val base =
          try FileTableOps.metaCache.get(p)(
            MetaJson.readMetadata(GraftIO.readString(p), Some(p)))
          catch { case _: Throwable => return false }
        MetadataLogs.advance(base, p, updated)
      case None => (updated, Nil)
    }
    GraftIO.writeString(metadataPath, MetaJson.writeMetadata(toWrite),
      GraftIO.metadataGzip(toWrite.properties))
    val ok = Jdbc.withConn(uri) { c =>
      if (baseVersion == 0) {
        val ps = c.prepareStatement(
          "INSERT INTO graft_tables (catalog_name, table_namespace, table_name, " +
            "metadata_location, previous_metadata_location, table_location, version) " +
            "VALUES (?,?,?,?,NULL,?,1)")
        try {
          ps.setString(1, catalogName); ps.setString(2, namespace); ps.setString(3, name)
          ps.setString(4, metadataPath); ps.setString(5, location)
          try ps.executeUpdate() == 1
          catch {
            // only a unique/primary-key violation means we lost the create
            // race (SQLState 23xxx, integrity constraint violation); any
            // other SQLException is a real DB failure and must propagate,
            // not masquerade as "table already exists"
            case e: SQLException
              if Option(e.getSQLState).exists(_.startsWith("23")) => false
          }
        } finally ps.close()
      } else {
        // bind the previous location as a parameter instead of
        // `previous_metadata_location=metadata_location`: MySQL evaluates
        // SET clauses left-to-right and would record the NEW location.
        // No race: metadata_location can only change together with
        // version, and version=base guards the UPDATE.
        val prev = prevPath.orNull
        val ps = c.prepareStatement(
          "UPDATE graft_tables SET metadata_location=?, " +
            "previous_metadata_location=?, version=? " +
            "WHERE catalog_name=? AND table_namespace=? AND table_name=? AND version=?")
        try {
          ps.setString(1, metadataPath); ps.setString(2, prev)
          ps.setInt(3, baseVersion + 1)
          ps.setString(4, catalogName); ps.setString(5, namespace); ps.setString(6, name)
          ps.setInt(7, baseVersion)
          ps.executeUpdate() == 1
        } finally ps.close()
      }
    }
    if (!ok) GraftIO.delete(metadataPath) // orphaned loser metadata
    else expired.foreach(p => try GraftIO.delete(p) catch { case _: Throwable => () })
    ok
  }
}

final class JdbcCatalog(warehouse: String, uri: String,
    catalogName: String = "graft") extends HadoopCatalog(warehouse) {

  Jdbc.ensureSchema(uri)

  private def ns(namespace: Seq[String]): String = namespace.mkString(".")

  private def ops(namespace: Seq[String], name: String): JdbcTableOps =
    new JdbcTableOps(tableLocation(namespace, name), uri, catalogName,
      ns(namespace), name)

  override def createTable(namespace: Seq[String], name: String, schema: GSchema,
      spec: PartitionSpec = PartitionSpec.Unpartitioned,
      properties: Map[String, String] = Map.empty): GTable = {
    val o = ops(namespace, name)
    val meta = TableMetadata.newTable(o.location, schema, spec, properties)
    if (!o.commit(0, meta))
      throw new IllegalStateException(s"table already exists: ${ns(namespace)}.$name")
    new GTable(o)
  }

  override def loadTable(namespace: Seq[String], name: String): Option[GTable] = {
    val o = ops(namespace, name)
    if (o.currentVersion() > 0) Some(new GTable(o)) else None
  }

  override def tableOps(namespace: Seq[String], name: String): TableOps =
    ops(namespace, name)

  override def tableExists(namespace: Seq[String], name: String): Boolean =
    ops(namespace, name).currentVersion() > 0

  override def dropTable(namespace: Seq[String], name: String,
      purge: Boolean): Boolean = {
    val existedLoc = Jdbc.withConn(uri) { c =>
      val ps = c.prepareStatement("SELECT table_location FROM graft_tables " +
        "WHERE catalog_name=? AND table_namespace=? AND table_name=?")
      try {
        ps.setString(1, catalogName); ps.setString(2, ns(namespace)); ps.setString(3, name)
        val rs = ps.executeQuery()
        try { if (rs.next()) Option(rs.getString(1)) else None } finally rs.close()
      } finally ps.close()
    }
    existedLoc match {
      case None => false
      case Some(loc) =>
        Jdbc.withConn(uri) { c =>
          val ps = c.prepareStatement("DELETE FROM graft_tables " +
            "WHERE catalog_name=? AND table_namespace=? AND table_name=?")
          try {
            ps.setString(1, catalogName); ps.setString(2, ns(namespace)); ps.setString(3, name)
            ps.executeUpdate()
          } finally ps.close()
        }
        // the database row IS the identity; purge additionally removes
        // the tree, a plain drop leaves the files for external readers
        if (purge) GraftIO.deleteTree(loc)
        true
    }
  }

  override def listTables(namespace: Seq[String]): Seq[String] =
    Jdbc.withConn(uri) { c =>
      val ps = c.prepareStatement("SELECT table_name FROM graft_tables " +
        "WHERE catalog_name=? AND table_namespace=? ORDER BY table_name")
      try {
        ps.setString(1, catalogName); ps.setString(2, ns(namespace))
        val rs = ps.executeQuery()
        val out = Seq.newBuilder[String]
        try { while (rs.next()) out += rs.getString(1) } finally rs.close()
        out.result()
      } finally ps.close()
    }

  /** Rename = pointer-row key update; files never move (the location is
    * already recorded in every manifest, so it must not change). */
  override def renameTable(namespace: Seq[String], name: String,
      newNamespace: Seq[String], newName: String): Unit = {
    if (tableExists(newNamespace, newName))
      throw new IllegalStateException(
        s"table already exists: ${ns(newNamespace)}.$newName")
    val n = Jdbc.withConn(uri) { c =>
      val ps = c.prepareStatement("UPDATE graft_tables " +
        "SET table_namespace=?, table_name=? " +
        "WHERE catalog_name=? AND table_namespace=? AND table_name=?")
      try {
        ps.setString(1, ns(newNamespace)); ps.setString(2, newName)
        ps.setString(3, catalogName); ps.setString(4, ns(namespace)); ps.setString(5, name)
        ps.executeUpdate()
      } finally ps.close()
    }
    if (n != 1)
      // IllegalArgumentException = source missing, IllegalStateException
      // = destination occupied — the same contract as the directory and
      // REST catalogs (whose server maps them to 404 / 409)
      throw new IllegalArgumentException(s"no such table: ${ns(namespace)}.$name")
  }
}
