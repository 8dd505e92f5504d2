package graft.spark

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.expr.{PartitionField, PartitionSpec}
import graft.core.meta.{GTable, HadoopCatalog, StagedOps, TableMetadata}
import graft.core.types._

/** DSv2 TableCatalog over the engine's directory catalog. Register with
  *   spark.sql.catalog.graft = graft.spark.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse
  * (reference spark/.../SparkCatalog.java:127).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
  with FunctionCatalog with ProcedureCatalog with StagingTableCatalog
  with ViewCatalog {

  private var catalogName: String = _
  private var catalog: HadoopCatalog = _
  // catalog-level property policy (reference CatalogProperties
  // TABLE_DEFAULT_PREFIX / TABLE_OVERRIDE_PREFIX via
  // BaseMetastoreCatalog.TableBuilder): `table-default.<k>` seeds new
  // tables (user-supplied values win), `table-override.<k>` is enforced
  // over them — how an operator pins e.g. metadata cleanup or a format
  // across every table created through the catalog. `view-default.` /
  // `view-override.` do the same for view properties. ONE CatalogPolicy
  // serves the direct CREATE path, staged CTAS/RTAS, and the
  // table-creating procedures, so the merge semantics cannot drift.
  private var policy: GraftProcedures.CatalogPolicy =
    GraftProcedures.CatalogPolicy()

  /** defaults under, overrides over the user-supplied properties */
  private def withTablePolicy(user: Map[String, String]): Map[String, String] =
    policy.table(user)

  /** underlying file catalog (procedures + extension DDL) */
  private[spark] def core: HadoopCatalog = catalog

  /** warehouse root (view + UDF stores key off it) */
  private[spark] def warehouse: String = catalog.warehouse

  /** the HMS backing when this catalog fronts one (possibly wrapped in
    * the caching catalog) — namespace ops mirror into HMS databases so
    * external metastore viewers see the same database set */
  private def hiveBacking: Option[graft.core.meta.HiveMsCatalog] =
    catalog match {
      case h: graft.core.meta.HiveMsCatalog => Some(h)
      case c: graft.core.meta.CachingCatalog => c.underlying match {
        case h: graft.core.meta.HiveMsCatalog => Some(h)
        case _ => None
      }
      case _ => None
    }

  /** drop all cached table entries (reference Catalog.invalidateTable /
    * CachingCatalog invalidation): needed when tables are mutated through
    * a DIFFERENT catalog instance (e.g. a test harness wiping a warehouse
    * via its own HadoopCatalog) — without this, the 30 s TTL serves stale
    * existence/metadata and in-JVM retries die on "already exists" */
  def invalidateCache(): Unit = catalog match {
    case c: graft.core.meta.CachingCatalog => c.invalidateAll()
    case _ => ()
  }

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    def prefixed(prefix: String): Map[String, String] = {
      import scala.jdk.CollectionConverters._
      options.asScala.collect {
        case (k, v) if k.startsWith(prefix) => k.stripPrefix(prefix) -> v
      }.toMap
    }
    policy = GraftProcedures.CatalogPolicy(
      prefixed("table-default."), prefixed("table-override."),
      prefixed("view-default."), prefixed("view-override."))
    val wh = Option(options.get("warehouse"))
      .getOrElse(sys.props("java.io.tmpdir") + "/graft_warehouse")
    // table-encryption key material (reference CatalogProperties
    // ENCRYPTION_KMS_*): spark.sql.catalog.<name>.encryption.kms.key-list
    // seeds the local KMS that wraps/unwraps per-table keys. The KMS
    // scope is name + warehouse/uri, NOT the bare name: two sessions may
    // point the same catalog NAME at different warehouses with different
    // key lists, and a name-keyed scope would clobber the first one's
    // master keys on the second initialize (rotation within ONE catalog
    // still replaces its own scope because the scope string is stable).
    GraftParquetCrypto.seedKms(
      s"$name@${Option(options.get("uri")).getOrElse(wh)}",
      Option(options.get("encryption.kms.key-list")))
    // catalog-impl selects where the table pointer lives (reference
    // SparkCatalog catalog-impl / JdbcCatalog): 'jdbc' + uri → pointer
    // rows with SQL CAS; default → directory catalog with file CAS
    val backing = Option(options.get("catalog-impl")).map(_.toLowerCase) match {
      case Some("jdbc") =>
        val uri = Option(options.get("uri")).getOrElse(
          throw new IllegalArgumentException(
            s"catalog $name: catalog-impl=jdbc requires a 'uri' option"))
        new graft.core.meta.JdbcCatalog(wh, uri, name)
      case Some("hive") =>
        // Hive Metastore catalog (reference hive-metastore HiveCatalog):
        // uri = thrift://host:port for a standalone metastore; absent =
        // the metastore runs EMBEDDED over Derby at `metastore-db`
        // (default <warehouse>/_hms_db) — standard HMS local mode
        val client = graft.core.meta.HiveMs.connect(
          Option(options.get("uri")),
          Option(options.get("metastore-db")).getOrElse(s"$wh/_hms_db"), wh)
        new graft.core.meta.HiveMsCatalog(wh, client)
      case Some("rest") =>
        val uri = Option(options.get("uri")).getOrElse(
          throw new IllegalArgumentException(
            s"catalog $name: catalog-impl=rest requires a 'uri' option"))
        // optional OAuth2 client credential, reference RESTCatalog style:
        // spark.sql.catalog.<name>.credential = "client-id:client-secret";
        // header-style access delegation opts into vended storage
        // credentials on every table load (reference
        // X-Iceberg-Access-Delegation)
        // commit-protocol=spec flips commits from graft's full-metadata
        // POST to the spec's requirements+updates CommitTableRequest
        // rest-scan-planning=server routes scan planning through the
        // server's planTableScan endpoints (thin-client mode: the
        // manifests never cross the wire)
        // `scope` rides the OAuth2 token exchange (reference RESTCatalog
        // `scope` property; defaults to "catalog")
        // oauth2-server-uri points the token exchange at an external IdP
        // snapshot-loading-mode=refs loads branch/tag-referenced
        // snapshots eagerly and the rest lazily (reference
        // RESTCatalogProperties)
        graft.core.meta.RestCatalog.connect(uri, Option(options.get("credential")),
          Option(options.get("access-delegation")).contains("vended-credentials"),
          Option(options.get("commit-protocol")).contains("spec"),
          Option(options.get("rest-scan-planning")).contains("server"),
          Option(options.get("scope")), Option(options.get("audience")),
          Option(options.get("oauth2-server-uri")),
          Option(options.get("snapshot-loading-mode")).getOrElse("all"))
      case _ => new HadoopCatalog(wh)
    }
    // expiration-aware table cache (reference CachingCatalog +
    // cache-enabled / cache.expiration-interval-ms): skips the per-query
    // catalog round-trip; disable with cache-enabled=false
    val cacheTtl = Option(options.get("cache.expiration-interval-ms"))
      .flatMap(_.toLongOption).getOrElse(30000L)
    // reference semantics: negative TTL caches forever, zero disables
    catalog =
      if (Option(options.get("cache-enabled")).contains("false") ||
          cacheTtl == 0L) backing
      else new graft.core.meta.CachingCatalog(backing, cacheTtl)
    // Upgrade migration: namespaces created before the _namespace.json
    // marker existed are bare directories, which the shared existence
    // predicate (marker or live content) reads as ABSENT — SHOW
    // NAMESPACES would omit them and USE would fail until re-created.
    // Back-fill the marker once per catalog open for top-level children
    // that are plainly legacy namespaces: no marker, and NOT table-shaped
    // (no metadata dir — a dropped table's residual must stay absent).
    // (REST catalogs skip it: namespace lifecycle is the server's.)
    if (!Option(options.get("catalog-impl")).map(_.toLowerCase).contains("rest"))
      try {
        import graft.core.meta.{GraftIO, NamespaceProps}
        val bwh = backing.warehouse
        if (java.nio.file.Files.isDirectory(GraftIO.toPath(bwh)))
          GraftIO.list(bwh).map(GraftIO.toPath).foreach { c =>
            val n = c.getFileName.toString
            if (java.nio.file.Files.isDirectory(c) && !n.startsWith("_") &&
                NamespaceProps.validName(n) &&
                !java.nio.file.Files.exists(c.resolve("_namespace.json")) &&
                // the SHARED table-shape probe: a table/residual dir must
                // not backfill, but a legacy namespace whose child merely
                // happens to be NAMED metadata must
                !NamespaceProps.hasTableMetadataChild(c))
              // per-child: one unmarkable dir must not abort the rest
              try NamespaceProps.mark(bwh, Seq(n))
              catch { case _: Throwable => () }
          }
      } catch { case _: Throwable => () } // best-effort; never blocks open
  }

  override def name(): String = catalogName

  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  override def listTables(namespace: Array[String]): Array[Identifier] =
    catalog.listTables(namespace.toSeq)
      .map(t => Identifier.of(namespace, t)).toArray

  override def loadTable(ident: Identifier): Table =
    catalog.loadTable(ident.namespace.toSeq, ident.name)
      .map(t => new GraftSparkTable(t, fullName(ident)): Table)
      .orElse(loadMetadataTable(ident))
      .getOrElse(throw new NoSuchTableException(ident))

  /** `cat.db.tbl.snapshots` etc: ident = (namespace=[db, tbl], name=kind) */
  private def loadMetadataTable(ident: Identifier): Option[Table] = {
    val kind = ident.name.toLowerCase
    if (ident.namespace.isEmpty) None
    else if (kind.startsWith("branch_") || kind.startsWith("tag_")) {
      // `t.branch_x` / `t.tag_x` ref-pinned reads (reference
      // SparkCatalog ref-aware identifiers); branch pins also take writes
      val isTag = kind.startsWith("tag_")
      val refName = ident.name.substring(if (isTag) 4 else 7)
      catalog.loadTable(ident.namespace.init.toSeq, ident.namespace.last)
        .filter(_.meta.refs.contains(refName))
        .map(t => new GraftSparkTable(t, fullName(ident),
          refPin = Some((refName, isTag))))
    }
    else if (kind == "changes")
      catalog.loadTable(ident.namespace.init.toSeq, ident.namespace.last)
        .map(t => new GraftChangesTable(t, fullName(ident)))
    else if (GraftMetadataTables.types.contains(kind))
      catalog.loadTable(ident.namespace.init.toSeq, ident.namespace.last)
        .map(t => new GraftMetadataTable(t, fullName(ident), kind))
    else None
  }

  /** `t.files VERSION/TIMESTAMP AS OF …` (reference BaseMetadataTable
    * time travel): the metadata table serves the PINNED snapshot's
    * manifest-derived state. */
  private def loadMetadataTableAsOf(ident: Identifier,
      resolve: GTable => Long): Option[Table] = {
    val kind = ident.name.toLowerCase
    if (ident.namespace.isEmpty || !GraftMetadataTables.types.contains(kind)) None
    else catalog.loadTable(ident.namespace.init.toSeq, ident.namespace.last)
      .map { t =>
        // refresh BEFORE resolving: a snapshot/tag created after the
        // cache fill must resolve, and a branch pin must land on the
        // head the scan will actually serve. The refreshed document is
        // handed to the metadata table so resolve + scan see ONE state.
        val m = t.refresh()
        new GraftMetadataTable(t, fullName(ident), kind,
          asOf = Some(resolve(t)), preloaded = Some(m))
      }
  }

  private def resolveSnapshot(t: GTable, name: String, version: String): Long =
    version.toLongOption match {
      case Some(id) if t.meta.snapshotById(id).isDefined => id
      case _ =>
        t.meta.ref(version).map(_.snapshotId)
          .getOrElse(throw new IllegalArgumentException(
            s"no snapshot or ref '$version' in $name"))
    }

  /** VERSION AS OF: snapshot id, or a branch/tag name. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = catalog.loadTable(ident.namespace.toSeq, ident.name)
      .getOrElse(loadMetadataTableAsOf(ident,
          bt => resolveSnapshot(bt, ident.toString, version)) match {
        case Some(mt) => return mt
        case None => throw new NoSuchTableException(ident)
      })
    val snapshotId = resolveSnapshot(t, ident.name, version)
    // branch refs read with the CURRENT table schema (the branch keeps
    // advancing); tags and raw snapshot ids pin the snapshot's schema
    // (reference SnapshotUtil.schemaFor)
    val isBranch = version.toLongOption.isEmpty &&
      t.meta.refs.get(version).exists(_.refType ==
        graft.core.meta.SnapshotRefType.Branch)
    new GraftSparkTable(if (isBranch) t else schemaPinned(t, snapshotId),
      fullName(ident), snapshotId = Some(snapshotId))
  }

  /** time travel reads with the snapshot's recorded schema */
  private def schemaPinned(t: GTable, snapshotId: Long): GTable =
    t.meta.snapshotById(snapshotId).flatMap(_.schemaId)
      .filter(_ != t.meta.currentSchemaId)
      .map(sid => new GTable(new graft.core.meta.SchemaPinnedOps(t.ops, sid)))
      .getOrElse(t)

  /** TIMESTAMP AS OF (micros since epoch). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    def asOfSnap(bt: GTable): Long =
      bt.meta.snapshotAsOfTime(timestampMicros / 1000L)
        .getOrElse(throw new IllegalArgumentException(
          s"no snapshot as of $timestampMicros in ${ident.name}"))
        .snapshotId
    val t = catalog.loadTable(ident.namespace.toSeq, ident.name)
      .getOrElse(loadMetadataTableAsOf(ident, asOfSnap) match {
        case Some(mt) => return mt
        case None => throw new NoSuchTableException(ident)
      })
    val snap = t.meta.snapshotAsOfTime(timestampMicros / 1000L)
      .getOrElse(throw new IllegalArgumentException(
        s"no snapshot as of $timestampMicros in ${ident.name}"))
    new GraftSparkTable(schemaPinned(t, snap.snapshotId), fullName(ident),
      snapshotId = Some(snap.snapshotId))
  }

  /** columns+transforms → engine schema and spec (shared by CREATE and
    * the staged CTAS/RTAS paths) */
  private def schemaAndSpec(columns: Array[Column], partitions: Array[Transform])
      : (graft.core.types.GSchema, PartitionSpec) = {
    val sparkSchema = StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)))
    val schema0 = SparkTypes.fromSpark(sparkSchema)
    // column defaults declared at CREATE: write-default only (no earlier
    // files exist, so initial-default is never consulted — set both)
    val schema = schema0.copy(struct = graft.core.types.GStruct(
      schema0.fields.map { f =>
        columns.find(_.name == f.name).flatMap(c => Option(c.defaultValue()))
          .map(d => f.copy(initialDefaultSql = Some(d.getSql),
            writeDefaultSql = Some(d.getSql)))
          .getOrElse(f)
      }))
    val specs = partitions.map(SparkBridge.fromSparkTransform)
    val spec =
      if (specs.isEmpty) PartitionSpec.Unpartitioned
      else PartitionSpec.of(schema, specs.toIndexedSeq: _*)
    (schema, spec)
  }

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (catalog.tableExists(ident.namespace.toSeq, ident.name))
      throw new TableAlreadyExistsException(ident)
    // the view twin of the CREATE VIEW table-shadow guard: reads resolve
    // views first, so a same-named table would be unreachable
    if (GraftViewStore.load(viewDocs, ident).isDefined)
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
    val (schema, spec) = schemaAndSpec(columns, partitions)
    val t = catalog.createTable(ident.namespace.toSeq, ident.name, schema, spec,
      withTablePolicy(properties.asScala.toMap))
    new GraftSparkTable(t, fullName(ident))
  }

  @deprecated("use createTable with columns", "")
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    createTable(ident,
      schema.fields.map(f => Column.create(f.name, f.dataType, f.nullable)),
      partitions, properties)

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = catalog.loadTable(ident.namespace.toSeq, ident.name)
      .getOrElse(throw new NoSuchTableException(ident))
    t.commitUpdate { base =>
      var schema = base.schema
      var props = base.properties
      var nextId = base.lastColumnId

      // fresh field ids for an added column's whole type tree (nested
      // struct/list/map adds need ids on every sub-field — spec: ids are
      // assigned once and never recycled)
      def assignIds(dt: org.apache.spark.sql.types.DataType): graft.core.types.GType =
        dt match {
          case s: StructType => graft.core.types.GStruct(s.fields.toSeq.map { f =>
            nextId += 1
            val id = nextId
            graft.core.types.GField(id, f.name, assignIds(f.dataType), !f.nullable)
          })
          case a: org.apache.spark.sql.types.ArrayType =>
            nextId += 1
            val id = nextId
            graft.core.types.GList(id, assignIds(a.elementType), !a.containsNull)
          case mp: org.apache.spark.sql.types.MapType =>
            nextId += 1; val kid = nextId
            nextId += 1; val vid = nextId
            graft.core.types.GMap(kid, assignIds(mp.keyType), vid,
              assignIds(mp.valueType), !mp.valueContainsNull)
          case prim => SparkBridge.gTypeOf(prim)
        }

      // edit the field at a dotted path (nested structs); None = delete
      def editAt(st: graft.core.types.GStruct, path: Seq[String],
          f: GField => Option[GField]): graft.core.types.GStruct = {
        require(path.nonEmpty, "empty field path")
        val found = st.fields.exists(_.name == path.head)
        require(found, s"no such column: ${path.head}")
        GStruct(st.fields.flatMap { fld =>
          if (fld.name != path.head) Some(fld)
          else if (path.length == 1) f(fld)
          else fld.tpe match {
            case inner: graft.core.types.GStruct =>
              Some(fld.copy(tpe = editAt(inner, path.tail, f)))
            case other => throw new UnsupportedOperationException(
              s"cannot descend into $other at ${path.head}")
          }
        })
      }

      // insert/move within the parent struct per ColumnPosition
      def placed(fields: Seq[GField], fld: GField,
          pos: TableChange.ColumnPosition): Seq[GField] = pos match {
        case _: TableChange.First => fld +: fields
        case a: TableChange.After =>
          val i = fields.indexWhere(_.name == a.column())
          require(i >= 0, s"no such column: ${a.column()} (AFTER)")
          (fields.take(i + 1) :+ fld) ++ fields.drop(i + 1)
        case _ => fields :+ fld
      }

      def addAt(st: graft.core.types.GStruct, path: Seq[String], fld: GField,
          pos: TableChange.ColumnPosition): graft.core.types.GStruct =
        if (path.isEmpty) GStruct(placed(st.fields, fld, pos))
        else editAt(st, path, parent => parent.tpe match {
          case inner: graft.core.types.GStruct =>
            Some(parent.copy(tpe = GStruct(placed(inner.fields, fld, pos))))
          case other => throw new UnsupportedOperationException(
            s"cannot add a column under $other")
        })

      changes.foreach {
        case a: TableChange.AddColumn =>
          nextId += 1
          val fid = nextId
          val g = assignIds(a.dataType)
          val dflt = Option(a.defaultValue()).map(_.getSql)
          val fld = GField(fid, a.fieldNames().last, g, !a.isNullable, dflt, dflt)
          schema = schema.copy(struct =
            addAt(schema.struct, a.fieldNames().toSeq.init, fld,
              Option(a.position()).orNull))
        case d: TableChange.UpdateColumnDefaultValue =>
          // SET DEFAULT changes the WRITE default only; initial-default is
          // fixed at column creation (spec: existing rows keep their value)
          val sql = Option(d.newCurrentDefault()).map(_.getSql).filter(_.nonEmpty)
          schema = schema.copy(struct = editAt(schema.struct,
            d.fieldNames().toSeq, f => Some(f.copy(writeDefaultSql = sql))))
        case r: TableChange.RenameColumn =>
          schema = schema.copy(struct = editAt(schema.struct,
            r.fieldNames().toSeq, f => Some(f.copy(name = r.newName))))
        case d: TableChange.DeleteColumn =>
          try schema = schema.copy(struct =
            editAt(schema.struct, d.fieldNames().toSeq, _ => None))
          catch {
            case e: IllegalArgumentException => if (!d.ifExists()) throw e
          }
        case u: TableChange.UpdateColumnType =>
          // type WIDENING only keeps the id (promotion, spec Schema
          // Evolution); reads resolve by id so old files stay readable
          val g = SparkBridge.gTypeOf(u.newDataType)
          schema = schema.copy(struct = editAt(schema.struct,
            u.fieldNames().toSeq, f => Some(f.copy(tpe = g))))
        case n: TableChange.UpdateColumnNullability =>
          // optional → required is only provable on an empty table:
          // existing files may hold nulls (reference UpdateSchema rejects
          // the incompatible direction)
          if (!n.nullable())
            require(base.snapshots.isEmpty,
              s"cannot make ${n.fieldNames().mkString(".")} required: " +
                "existing rows may hold nulls")
          schema = schema.copy(struct = editAt(schema.struct,
            n.fieldNames().toSeq, f => Some(f.copy(required = !n.nullable()))))
        case mv: TableChange.UpdateColumnPosition =>
          // remove then re-insert at the requested position (same parent)
          val path = mv.fieldNames().toSeq
          var moved: GField = null
          val without = editAt(schema.struct, path, f => { moved = f; None })
          schema = schema.copy(struct =
            addAt(without, path.init, moved, mv.position()))
        case p: TableChange.SetProperty    =>
          // metrics-policy properties are validated HERE, at DDL time —
          // a malformed mode or misspelled column that only surfaced
          // inside the commit path would brick every subsequent write
          if (p.property == graft.core.meta.MetricsConfig.DefaultModeKey)
            graft.core.meta.MetricsMode.parse(p.value)
          else if (p.property.startsWith(graft.core.meta.MetricsConfig.ColumnModePrefix)) {
            graft.core.meta.MetricsMode.parse(p.value)
            val colName = p.property
              .stripPrefix(graft.core.meta.MetricsConfig.ColumnModePrefix)
            require(schema.byName.contains(colName),
              s"no such column for metrics override: $colName")
          }
          props = props + (p.property -> p.value)
        case p: TableChange.RemoveProperty => props = props - p.property
        case other => throw new UnsupportedOperationException(s"alter: $other")
      }
      // the reserved format-version property UPGRADES the table's spec
      // version (reference: downgrades are rejected; v3+ flips the delete
      // write default to deletion vectors)
      val newVersion = props.get("format-version").flatMap(_.toIntOption) match {
        case Some(v) =>
          require(v >= base.formatVersion,
            s"cannot downgrade format-version ${base.formatVersion} -> $v")
          require(v <= 4, s"unsupported format-version: $v")
          v
        case None => base.formatVersion
      }
      val newSchema = schema.copy(schemaId = base.schemas.map(_.schemaId).max + 1)
      // v1→v2+ upgrade: v2 REQUIRES manifest-list, so any v1 snapshots
      // still carrying embedded `manifests` arrays materialize real list
      // files now — the upgraded document must never persist the v1 form
      val base2 =
        if (newVersion >= 2 && base.formatVersion < 2)
          graft.core.meta.ManifestIO.materializeInline(base, newVersion)
        else base
      base2.copy(
        formatVersion = newVersion,
        schemas = base2.schemas :+ newSchema,
        currentSchemaId = newSchema.schemaId,
        lastColumnId = nextId,
        properties = props)
    }
    new GraftSparkTable(t, fullName(ident))
  }

  // plain DROP TABLE removes only the table's IDENTITY (reference
  // SparkCatalog.dropTable → dropTable(ident, purge=false)): data files
  // stay on disk for external readers still holding them — the promise
  // gc.enabled=false relies on
  override def dropTable(ident: Identifier): Boolean =
    catalog.dropTable(ident.namespace.toSeq, ident.name, purge = false)

  // DROP TABLE ... PURGE (reference SparkCatalog.purgeTable backed by
  // DeleteReachableFilesSparkAction): deletes data too; refused when the
  // table opted out of physical GC
  override def purgeTable(ident: Identifier): Boolean = {
    catalog.loadTable(ident.namespace.toSeq, ident.name).foreach { t =>
      if (t.meta.properties.get("gc.enabled").contains("false"))
        throw new UnsupportedOperationException(
          s"cannot purge table ${fullName(ident)}: gc.enabled=false")
    }
    catalog.dropTable(ident.namespace.toSeq, ident.name, purge = true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!catalog.tableExists(oldIdent.namespace.toSeq, oldIdent.name))
      throw new NoSuchTableException(oldIdent)
    if (catalog.tableExists(newIdent.namespace.toSeq, newIdent.name))
      throw new TableAlreadyExistsException(newIdent)
    // view-shadow twin of the createTable guard: a table renamed onto a
    // view name would be unreachable (reads resolve views first)
    if (GraftViewStore.load(viewDocs, newIdent).isDefined)
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(newIdent)
    catalog.renameTable(oldIdent.namespace.toSeq, oldIdent.name,
      newIdent.namespace.toSeq, newIdent.name)
  }

  // ----------------------------------------------------------------- views
  // catalog-stored SQL views (reference view-spec.md; SparkView.java).
  // REST-backed catalogs serve view documents over the protocol
  // (reference RESTCatalog implements ViewCatalog); everything else
  // stores them under the warehouse.
  private def viewDocs: GraftViewStore.ViewDocs = GraftViewStore.docsFor(catalog)

  override def listViews(namespace: String*): Array[Identifier] =
    GraftViewStore.list(viewDocs, namespace)
      .map(n => Identifier.of(namespace.toArray, n)).toArray

  override def loadView(ident: Identifier): View =
    GraftViewStore.load(viewDocs, ident)
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident))

  /** cheap existence probe (no document read/parse, no exception control
    * flow) — the parse-time DDL swaps call this on every DESCRIBE/SHOW/
    * RENAME statement, most of which target plain tables */
  override def viewExists(ident: Identifier): Boolean =
    try viewDocs.has(ident.namespace.toSeq, ident.name)
    catch { case scala.util.control.NonFatal(_) => false }

  override def createView(info: ViewInfo): View =
    GraftViewStore.create(viewDocs, info, replace = false,
      defaults = policy.viewDefaults, overrides = policy.viewOverrides)

  override def replaceView(info: ViewInfo, orCreate: Boolean): View =
    GraftViewStore.create(viewDocs, info, replace = true,
      defaults = policy.viewDefaults, overrides = policy.viewOverrides)

  override def alterView(ident: Identifier, changes: ViewChange*): View =
    GraftViewStore.alter(viewDocs, ident, changes)

  override def dropView(ident: Identifier): Boolean =
    GraftViewStore.drop(viewDocs, ident)

  override def renameView(from: Identifier, to: Identifier): Unit =
    GraftViewStore.rename(viewDocs, from, to)

  // -------------------------------------------------------------- staging
  // CTAS/RTAS (reference SparkCatalog stage* + BaseTransaction staged
  // commits): the staged table buffers every metadata commit in memory
  // (StagedOps); data files and manifests are written to their final
  // UUID-named paths — unreachable until the pointer moves — and
  // commitStagedChanges publishes the buffered metadata in ONE CAS of the
  // real pointer. A failed or aborted CTAS/RTAS leaves the catalog
  // exactly as it was: readers mid-RTAS keep seeing the original table.
  private def staged(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String],
      replace: Boolean, orCreate: Boolean): StagedTable = {
    // CTAS/RTAS take this path, not createTable — same view-shadow guard
    if (GraftViewStore.load(viewDocs, ident).isDefined)
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
    val ns = ident.namespace.toSeq
    val ops = catalog.tableOps(ns, ident.name)
    val (schema, spec) = schemaAndSpec(columns, partitions)
    val props = withTablePolicy(properties.asScala.toMap)
    val initial =
      if (replace && ops.currentVersion() > 0)
        TableMetadata.buildReplacement(ops.current().get, schema, spec, props)
      else if (replace && !orCreate) throw new NoSuchTableException(ident)
      else TableMetadata.newTable(
        catalog.tableLocation(ns, ident.name), schema, spec, props)
    val stagedOps = new StagedOps(ops, initial)
    val inner = new GraftSparkTable(new GTable(stagedOps), fullName(ident))
    new GraftStagedTable(inner,
      onCommit = () => publishStaged(ident, ops, stagedOps,
        allowReplace = replace, allowCreate = !replace || orCreate),
      onAbort = () => stagedOps.cleanupStagedFiles())
  }

  /** One-CAS publish of a staged CTAS/RTAS, with rebase-on-conflict: a
    * commit that landed between staging and publish stays in the snapshot
    * history (REPLACE supersedes it as head — reference replace
    * transaction semantics) and the CAS retries from the new version. */
  private[spark] def publishStaged(ident: Identifier, ops: graft.core.meta.TableOps,
      stagedOps: StagedOps, allowReplace: Boolean, allowCreate: Boolean): Unit = {
    var attempts = 0
    val max = 20
    while (attempts < max) {
      val baseVersion = ops.currentVersion()
      val staged = stagedOps.stagedMeta
      if (baseVersion == 0) {
        if (!allowCreate) {
          stagedOps.cleanupStagedFiles()
          throw new NoSuchTableException(ident) // concurrent DROP mid-RTAS
        }
        if (ops.commit(0, staged)) return
      } else {
        if (!allowReplace) {
          stagedOps.cleanupStagedFiles()
          throw new TableAlreadyExistsException(ident) // concurrent CREATE mid-CTAS
        }
        val base = ops.current().get
        val preSchemas = stagedOps.preBase.map(_.schemas).getOrElse(Nil)
        val preSpecs = stagedOps.preBase.map(_.specs).getOrElse(Nil)
        // Concurrent commits may have minted the SAME schema id as the
        // staged replacement (both allocate max+1): keeping staged.schemas
        // verbatim would re-bind the concurrent snapshot's schemaId to the
        // replacement schema. Schema ids live only in metadata (snapshots
        // reference them; manifests don't), so remap the staged-minted
        // colliding ids above everything both sides know.
        val stagedNewSchemas = staged.schemas
          .filterNot(s => preSchemas.exists(_.schemaId == s.schemaId))
        val baseNewSchemas = base.schemas
          .filterNot(s => preSchemas.exists(_.schemaId == s.schemaId))
        var nextSchemaId = ((base.schemas ++ staged.schemas).map(_.schemaId)
          .foldLeft(0)(math.max)) + 1
        val remap: Map[Int, Int] = stagedNewSchemas.flatMap { s =>
          baseNewSchemas.find(_.schemaId == s.schemaId) match {
            case Some(b) if b != s =>
              val nid = nextSchemaId; nextSchemaId += 1; Some(s.schemaId -> nid)
            case _ => None
          }
        }.toMap
        def mapSid(id: Int): Int = remap.getOrElse(id, id)
        val mergedSchemas = base.schemas ++ stagedNewSchemas
          .map(s => s.copy(schemaId = mapSid(s.schemaId)))
          .filterNot(s => base.schemas.exists(_.schemaId == s.schemaId))
        // Partition-spec ids ARE stamped into manifests (file.specId), so a
        // genuine collision between concurrently-minted different specs
        // cannot be remapped — fail the publish instead of corrupting
        // either lineage's partition resolution.
        val stagedNewSpecs = staged.specs
          .filterNot(p => preSpecs.exists(_.specId == p.specId))
        val baseNewSpecs = base.specs
          .filterNot(p => preSpecs.exists(_.specId == p.specId))
        if (stagedNewSpecs.exists(p =>
            baseNewSpecs.exists(b => b.specId == p.specId && b != p))) {
          stagedOps.cleanupStagedFiles()
          throw new graft.core.meta.CommitConflictException(
            s"staged replace conflicts with a concurrent partition-spec change on ${fullName(ident)}")
        }
        val mergedSpecs = base.specs ++ stagedNewSpecs
          .filterNot(p => base.specs.exists(_.specId == p.specId))
        // Concurrent commits while staging advanced the base's sequence
        // numbers past the staged snapshots' (both allocate preLast+1…):
        // publishing verbatim would interleave DUPLICATE sequence numbers
        // between the superseded head and the replacement, leaving strict
        // seq-ordered readers (changelog) ambiguous. Sequence numbers are
        // explicit in snapshots, manifest lists AND manifest entries, so
        // shift every staged-minted seq above the base's last by
        // rewriting the staged manifests at publish (they are unreachable
        // until the CAS, so the rewrite races nothing).
        val preLast = stagedOps.preBase.map(_.lastSequenceNumber).getOrElse(0L)
        val delta = base.lastSequenceNumber - preLast
        // row-id ranges collide the same way sequence numbers do: both
        // sides allocated _row_id from preBase.nextRowId, so staged
        // allocations shift past the base's high-water mark too
        val preNext = stagedOps.preBase.map(_.nextRowId).getOrElse(0L)
        val rowDelta = base.nextRowId - preNext
        def shiftRowId(o: Option[Long]): Option[Long] =
          if (rowDelta <= 0) o
          else o.map(r => if (r >= preNext) r + rowDelta else r)
        val stagedNewSnaps = staged.snapshots
          .filterNot(s => base.snapshots.exists(_.snapshotId == s.snapshotId))
        val stagedCrypto = graft.core.meta.TableCrypto.resolve(staged)
        val attemptFiles = Seq.newBuilder[String] // this attempt's rewrites
        val renumbered =
          if ((delta <= 0 && rowDelta <= 0) || stagedNewSnaps.isEmpty)
            stagedNewSnaps
          else {
            val keep: Set[String] = stagedOps.preBase.toSeq
              .flatMap(_.snapshots).flatMap(s =>
                try graft.core.meta.ManifestIO.readList(s.manifestListPath).map(_.path)
                catch { case _: Throwable => Nil }).toSet
            def shiftSeq(n: Long): Long =
              if (delta > 0 && n > preLast) n + delta else n
            val rewrittenMf = scala.collection.mutable
              .Map.empty[String, graft.core.meta.ManifestFile]
            stagedNewSnaps.map { s =>
              val mfs = graft.core.meta.ManifestIO.readList(s.manifestListPath)
              val newMfs = mfs.map { m =>
                if (keep.contains(m.path)) m
                else rewrittenMf.getOrElseUpdate(m.path, {
                  val entries = graft.core.meta.ManifestIO.readEntries(m).map { e =>
                    val f2 = e.file.copy(firstRowId = shiftRowId(e.file.firstRowId))
                    e.copy(dataSequenceNumber = shiftSeq(e.dataSequenceNumber),
                      file = f2)
                  }
                  val nm = graft.core.meta.ManifestIO.write(
                    ops.newManifestPath(
                      graft.core.meta.ManifestIO.fileExt(staged.properties)),
                    entries, m.specId, m.content, staged.specById(m.specId),
                    staged.schema, m.addedSnapshotId,
                    graft.core.meta.GraftIO.metadataGzip(staged.properties),
                    stagedCrypto,
                    avro = graft.core.meta.ManifestIO.avroEnabled(staged.properties),
                    formatVersion = staged.formatVersion)
                  attemptFiles += nm.path
                  nm
                })
              }
              val listPath = ops.newManifestListPath(s.snapshotId,
                graft.core.meta.ManifestIO.fileExt(staged.properties))
              val listKeyMeta = graft.core.meta.ManifestIO.writeList(listPath,
                newMfs, graft.core.meta.GraftIO.metadataGzip(staged.properties),
                stagedCrypto,
                avro = graft.core.meta.ManifestIO.avroEnabled(staged.properties),
                formatVersion = staged.formatVersion,
                partTypes = graft.core.meta.ManifestIO.partTypesOf(staged))
              attemptFiles += listPath
              s.copy(sequenceNumber = shiftSeq(s.sequenceNumber),
                manifestListPath = listPath,
                firstRowId = shiftRowId(s.firstRowId),
                keyId = stagedCrypto.map(_.tableKeyId),
                keyMetadata = listKeyMeta)
            }
          }
        val merged = staged.copy(
          schemas = mergedSchemas,
          currentSchemaId = mapSid(staged.currentSchemaId),
          specs = mergedSpecs,
          lastColumnId = math.max(base.lastColumnId, staged.lastColumnId),
          lastPartitionId = math.max(base.lastPartitionId, staged.lastPartitionId),
          snapshots = base.snapshots ++
            renumbered.map(s => s.copy(schemaId = s.schemaId.map(mapSid))),
          snapshotLog = (base.snapshotLog ++
            staged.snapshotLog.filterNot(base.snapshotLog.contains)).distinct,
          lastSequenceNumber = math.max(base.lastSequenceNumber,
            if (delta > 0) staged.lastSequenceNumber + delta
            else staged.lastSequenceNumber),
          nextRowId = math.max(base.nextRowId,
            staged.nextRowId + math.max(0L, rowDelta)),
          lastUpdatedMs = System.currentTimeMillis())
        if (ops.commit(baseVersion, merged)) {
          // the pre-shift staged lists/manifests are unreferenced now;
          // best-effort removal (stragglers are metadata orphans)
          if (delta > 0 || rowDelta > 0) stagedNewSnaps.foreach { s =>
            try graft.core.meta.GraftIO.delete(s.manifestListPath)
            catch { case _: Throwable => () }
          }
          return
        }
        // CAS lost: this attempt's rewritten files are garbage
        attemptFiles.result().foreach(p =>
          try graft.core.meta.GraftIO.delete(p) catch { case _: Throwable => () })
      }
      attempts += 1
      val cap = math.min(200L, 4L << math.min(attempts, 6))
      Thread.sleep(java.util.concurrent.ThreadLocalRandom.current().nextLong(cap + 1))
    }
    stagedOps.cleanupStagedFiles()
    throw new graft.core.meta.CommitConflictException(
      s"staged commit failed after $attempts attempts for ${fullName(ident)}")
  }

  override def stageCreate(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable = {
    if (catalog.tableExists(ident.namespace.toSeq, ident.name))
      throw new TableAlreadyExistsException(ident)
    staged(ident, columns, partitions, properties, replace = false, orCreate = false)
  }

  override def stageReplace(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    staged(ident, columns, partitions, properties, replace = true, orCreate = false)

  override def stageCreateOrReplace(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    staged(ident, columns, partitions, properties, replace = true, orCreate = true)

  // ----------------------------------------------------------- procedures
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident.name, catalog, policy).getOrElse(
      throw new RuntimeException(s"no such procedure: ${ident.name}"))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.names.map(n => Identifier.of(namespace, n)).toArray

  // ------------------------------------------------------------ functions
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")) ||
        namespaceExists(namespace))
      (GraftFunctions.names ++
        GraftUdfStore.list(catalog.warehouse, namespace.toSeq))
        .map(n => Identifier.of(namespace, n)).toArray
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    GraftFunctions.load(ident.name)
      .orElse(GraftUdfStore.load(catalog.warehouse, ident.namespace.toSeq, ident.name)
        .map(u => new GraftUdfStore.SqlUdfUnbound(catalog.warehouse,
          ident.namespace.toSeq, ident.name, u)))
      .getOrElse(
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident))

  override def functionExists(ident: Identifier): Boolean =
    GraftFunctions.load(ident.name).isDefined ||
      GraftUdfStore.load(catalog.warehouse, ident.namespace.toSeq, ident.name).isDefined

  // ----------------------------------------------------------- namespaces
  // existence/listing go through the ONE shared predicate
  // (NamespaceProps.isNamespaceDir) the REST routes also use, so the two
  // surfaces agree: a dropped table's residual directory is absent and
  // re-creatable on both, a marked or live directory exists on both
  override def listNamespaces(): Array[Array[String]] = {
    val local = graft.core.meta.GraftIO.list(catalog.warehouse)
      .map(p => graft.core.meta.GraftIO.toPath(p).getFileName.toString)
      .filter(n => !n.startsWith("_") &&
        graft.core.meta.NamespaceProps.isNamespaceDir(catalog.warehouse, Seq(n)))
    // hive backing: FOREIGN databases (created by other engines straight
    // in the metastore) list too — reference HiveCatalog.listNamespaces
    // returns the metastore's database set
    val hms = hiveBacking.toSeq.flatMap(_.listHmsDatabases)
      .filter(graft.core.meta.NamespaceProps.validName)
    (local ++ hms).distinct.sorted.map(Array(_)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean =
    graft.core.meta.NamespaceProps.isNamespaceDir(
      catalog.warehouse, namespace.toSeq) ||
      (namespace.length == 1 &&
        hiveBacking.exists(_.hmsDatabaseExists(namespace.head)))

  // namespace properties persist in the namespace directory's
  // _namespace.json, through the ONE shared store (NamespaceProps) the
  // REST server's spec namespace routes also use, so both surfaces
  // agree on path, shape, and lifecycle (the file doubles as the
  // created-namespace marker dropNamespace relies on — never deleted
  // when props empty out)
  private def readNsProps(namespace: Array[String]): Map[String, String] =
    graft.core.meta.NamespaceProps.read(catalog.warehouse, namespace.toSeq)

  private def writeNsProps(namespace: Array[String], props: Map[String, String]): Unit =
    graft.core.meta.NamespaceProps.write(catalog.warehouse, namespace.toSeq, props)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) {
      val m = new util.HashMap[String, String]()
      readNsProps(namespace).foreach { case (k, v) => m.put(k, v) }
      m
    } else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    import scala.jdk.CollectionConverters._
    // mark() validates the levels and refuses table collisions BEFORE
    // anything exists on disk, then creates the directories itself (the
    // marker writes create parents) — no stray dirs on a refused create.
    // Marker at every level, even with no properties: dropNamespace and
    // listNamespaces tell namespaces from dropped-table residuals by it
    graft.core.meta.NamespaceProps.mark(catalog.warehouse, namespace.toSeq)
    if (!metadata.isEmpty) writeNsProps(namespace, metadata.asScala.toMap)
    // hive backing: mirror into an HMS DATABASE so SHOW DATABASES on the
    // metastore matches SHOW NAMESPACES here
    hiveBacking.foreach(_.ensureDatabase(namespace.toSeq))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    // atomic under the shared store lock — a plain read-modify-write
    // here could silently drop a concurrent REST-side property update
    graft.core.meta.NamespaceProps.mutate(catalog.warehouse, namespace.toSeq) {
      props =>
        changes.foldLeft(props) {
          case (p, sp: NamespaceChange.SetProperty)    => p + (sp.property -> sp.value)
          case (p, rp: NamespaceChange.RemoveProperty) => p - rp.property
          case (p, _)                                  => p
        }
    }
  }

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = graft.core.meta.GraftIO.toPath((catalog.warehouse +: namespace).mkString("/"))
    // the same existence predicate as namespaceExists/REST: a residual
    // dropped-table directory is not a namespace, so it cannot be
    // "dropped" either — the surfaces must agree on the drop verb too
    if (!namespaceExists(namespace)) false
    else {
      import scala.jdk.CollectionConverters._
      // non-cascade drop must refuse a namespace that still holds tables,
      // marked child namespaces, or views — the REST route 409s through
      // the SAME shared guard, and an unconditional recursive delete
      // would silently destroy child namespaces' tables (SQL: DROP
      // NAMESPACE ... CASCADE opts in)
      if (!cascade)
        graft.core.meta.NamespaceProps
          .nonEmptyBlocker(catalog.warehouse, namespace.toSeq).foreach { d =>
            throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
              namespace, s"contains $d; use CASCADE", None)
          }
      graft.core.meta.GraftIO.deleteTree(p.toString)
      // hive backing: drop the mirrored HMS database (cascade drops its
      // table entries; the files are already gone with the tree)
      hiveBacking.foreach(_.dropDatabase(namespace.toSeq, cascade))
      true
    }
  }

  private def fullName(ident: Identifier): String =
    (catalogName +: ident.namespace :+ ident.name).mkString(".")
}

/** CTAS/RTAS staged table: delegates reads/writes to a table handle whose
  * commits buffer in StagedOps; commit publishes the buffer with one CAS,
  * abort discards it (and best-effort deletes staged files). */
final class GraftStagedTable(inner: GraftSparkTable, onCommit: () => Unit,
    onAbort: () => Unit)
  extends Table with StagedTable with SupportsRead with SupportsWrite {
  override def name(): String = inner.name()
  override def schema(): StructType = inner.schema()
  override def partitioning(): Array[Transform] = inner.partitioning()
  override def properties(): util.Map[String, String] = inner.properties()
  override def capabilities(): util.Set[TableCapability] = inner.capabilities()
  override def newScanBuilder(options: CaseInsensitiveStringMap) =
    inner.newScanBuilder(options)
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo) =
    inner.newWriteBuilder(info)
  override def commitStagedChanges(): Unit = onCommit()
  override def abortStagedChanges(): Unit = onAbort()
}
