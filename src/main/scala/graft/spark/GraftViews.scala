package graft.spark

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, ViewAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewChange, ViewInfo}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.core.meta.{GraftIO, MetaJson}
import graft.core.types.SparkTypes

/** Catalog-stored SQL views (reference api/core view/ + view-spec.md):
  * each view is a JSON document under `<warehouse>/<ns>/_views/<name>.json`
  * holding, per the view spec, an immutable VERSION LIST — every
  * CREATE OR REPLACE appends a new version (id, timestamp, SQL
  * representation, schema, resolution context, summary) and moves
  * `current-version-id`; `version-log` records each move, and history
  * is trimmed to `version.history.num-entries` (default 10,
  * view-spec.md "Versions" note [1]). Property-only changes do NOT
  * create versions (view-spec: versions are immutable definitions).
  * Reads re-parse the current version's SQL in its stored context —
  * the Spark analyzer does the rest. */
object GraftViewStore {

  private val HistoryProp = "version.history.num-entries"
  private val DefaultHistory = 10

  /** where view documents live: the warehouse filesystem for directory /
    * JDBC catalogs, the REST protocol for REST catalogs (reference
    * RESTCatalog implements ViewCatalog — views must not depend on a
    * filesystem the client shares with the server) */
  trait ViewDocs {
    def get(namespace: Seq[String], name: String): Option[String]
    /** existence probe without reading/parsing the document — the parse
      * rules call this on every DESCRIBE/SHOW statement */
    def has(namespace: Seq[String], name: String): Boolean =
      get(namespace, name).isDefined
    /** throws ViewAlreadyExistsException when present and !replace */
    def put(namespace: Seq[String], name: String, doc: String, replace: Boolean): Unit
    def delete(namespace: Seq[String], name: String): Boolean
    def names(namespace: Seq[String]): Seq[String]
    /** the view's base location recorded in metadata (view-spec
      * "View Metadata": required `location`) */
    def locationFor(namespace: Seq[String], name: String): String =
      (namespace :+ name).mkString("/")
  }

  final case class FileViewDocs(warehouse: String) extends ViewDocs {
    private def dir(namespace: Seq[String]): String =
      (warehouse +: namespace :+ "_views").mkString("/")
    private def path(namespace: Seq[String], name: String): String =
      s"${dir(namespace)}/$name.json"
    override def get(namespace: Seq[String], name: String): Option[String] = {
      val p = path(namespace, name)
      if (GraftIO.exists(p)) Some(GraftIO.readString(p)) else None
    }
    override def has(namespace: Seq[String], name: String): Boolean =
      GraftIO.exists(path(namespace, name))
    override def put(namespace: Seq[String], name: String, doc: String,
        replace: Boolean): Unit = {
      if (!replace && GraftIO.exists(path(namespace, name)))
        throw new ViewAlreadyExistsException(
          Identifier.of(namespace.toArray, name))
      java.nio.file.Files.createDirectories(GraftIO.toPath(dir(namespace)))
      GraftIO.writeString(path(namespace, name), doc)
    }
    override def delete(namespace: Seq[String], name: String): Boolean = {
      val p = path(namespace, name)
      val existed = GraftIO.exists(p)
      GraftIO.delete(p)
      existed
    }
    override def locationFor(namespace: Seq[String], name: String): String =
      s"${dir(namespace)}/$name"
    override def names(namespace: Seq[String]): Seq[String] = {
      val d = GraftIO.toPath(dir(namespace))
      if (!java.nio.file.Files.isDirectory(d)) Nil
      else java.nio.file.Files.list(d).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".json"))
        .map(_.stripSuffix(".json")).toSeq
    }
  }

  final class RestViewDocs(rc: graft.core.meta.RestCatalog) extends ViewDocs {
    override def get(namespace: Seq[String], name: String): Option[String] =
      rc.loadViewDoc(namespace, name)
    override def put(namespace: Seq[String], name: String, doc: String,
        replace: Boolean): Unit =
      try rc.putViewDoc(namespace, name, doc, replace)
      catch {
        case _: IllegalStateException =>
          throw new ViewAlreadyExistsException(
            Identifier.of(namespace.toArray, name))
      }
    override def delete(namespace: Seq[String], name: String): Boolean =
      rc.dropViewDoc(namespace, name)
    override def names(namespace: Seq[String]): Seq[String] =
      rc.listViewNames(namespace)
  }

  /** HMS-registered view documents (reference hive-metastore
    * HiveViewOperations + HMSTablePropertyHelper.setHmsParameters): the
    * spec view-metadata document lives under the warehouse, but the
    * POINTER is an HMS entry with tableType VIRTUAL_VIEW and parameters
    * `table_type=ICEBERG-VIEW` + `metadata_location` — the convention
    * HMS-fronted Iceberg engines share, so foreign engines list and
    * read graft views, and graft reads theirs (any entry bearing the
    * markers is live, regardless of creator). Each put writes a fresh
    * uuid-named document and swaps the pointer under the HMS table
    * lock, like table commits. */
  final class HiveViewDocs(cat: graft.core.meta.HiveMsCatalog) extends ViewDocs {
    import org.apache.hadoop.hive.metastore.api.{FieldSchema, NoSuchObjectException, SerDeInfo, StorageDescriptor, Table => HmsTable}

    private def db(namespace: Seq[String]): String =
      namespace.mkString(".").toLowerCase
    private def dir(namespace: Seq[String]): String =
      (cat.warehouse +: namespace :+ "_views").mkString("/")

    private def entry(namespace: Seq[String], name: String): Option[HmsTable] =
      try Some(cat.hive.sync(_.getTable(db(namespace), name.toLowerCase)))
      catch { case _: NoSuchObjectException => None }

    private def isIcebergView(t: HmsTable): Boolean =
      graft.core.meta.HiveMs.isIcebergViewEntry(t)

    private def plainPath(p: String): String =
      graft.core.meta.HiveMs.plainPath(p)

    override def get(namespace: Seq[String], name: String): Option[String] =
      entry(namespace, name).filter(isIcebergView).flatMap { t =>
        val p = plainPath(t.getParameters.get("metadata_location"))
        if (GraftIO.exists(p)) Some(GraftIO.readString(p)) else None
      }

    override def put(namespace: Seq[String], name: String, doc: String,
        replace: Boolean): Unit = {
      val docPath =
        s"${dir(namespace)}/$name-${java.util.UUID.randomUUID}.metadata.json"
      java.nio.file.Files.createDirectories(GraftIO.toPath(dir(namespace)))
      GraftIO.writeString(docPath, doc)
      // tableOps ensures the HMS database exists and hands back the ops
      // whose EXCLUSIVE HMS lock guards the read-verify-swap (reference
      // HiveViewOperations commits through MetastoreLock exactly like
      // tables)
      val lockOps = cat.tableOps(namespace, name)
        .asInstanceOf[graft.core.meta.HiveTableOps]
      try lockOps.withTableLock {
        entry(namespace, name) match {
          case Some(t) if !isIcebergView(t) =>
            throw new IllegalStateException(
              s"${db(namespace)}.$name exists and is not an Iceberg view")
          case Some(_) if !replace =>
            throw new ViewAlreadyExistsException(
              Identifier.of(namespace.toArray, name))
          case Some(t) =>
            val prev = t.getParameters.get("metadata_location")
            t.getParameters.put("metadata_location", docPath)
            if (prev != null)
              t.getParameters.put("previous_metadata_location", prev)
            cat.hive.sync(_.alter_table(db(namespace), name.toLowerCase, t))
          case None =>
            cat.hive.sync(_.createTable(newViewEntry(namespace, name, docPath)))
        }
      } catch {
        case e: Throwable => GraftIO.delete(docPath); throw e
      }
    }

    override def delete(namespace: Seq[String], name: String): Boolean = {
      // cheap unlocked existence probe first (a miss takes no lock),
      // then re-read + drop under the SAME exclusive HMS lock put()
      // takes: a delete racing a concurrent replace could otherwise
      // read the old pointer, drop the entry AFTER the replace rotated
      // it, and delete the stale document while orphaning the fresh one
      if (entry(namespace, name).filter(isIcebergView).isEmpty) return false
      val lockOps = cat.tableOps(namespace, name)
        .asInstanceOf[graft.core.meta.HiveTableOps]
      lockOps.withTableLock {
        entry(namespace, name).filter(isIcebergView) match {
          case None => false
          case Some(t) =>
            val p = plainPath(t.getParameters.get("metadata_location"))
            cat.hive.sync(_.dropTable(db(namespace), name.toLowerCase, false, true))
            try GraftIO.delete(p) catch { case scala.util.control.NonFatal(_) => () }
            true
        }
      }
    }

    override def names(namespace: Seq[String]): Seq[String] =
      try {
        val d = db(namespace)
        val all = cat.hive.sync(_.getAllTables(d)).asScala.toSeq
        if (all.isEmpty) Nil
        else cat.hive.sync(_.getTableObjectsByName(d, all.asJava)).asScala
          .filter(isIcebergView).map(_.getTableName).toSeq.sorted
      } catch { case _: NoSuchObjectException => Nil }

    override def locationFor(namespace: Seq[String], name: String): String =
      s"${dir(namespace)}/$name"

    private def newViewEntry(namespace: Seq[String], name: String,
        docPath: String): HmsTable = {
      val sd = new StorageDescriptor()
      sd.setCols(java.util.Collections.singletonList(
        new FieldSchema("dummy", "string", "")))
      val serde = new SerDeInfo()
      serde.setSerializationLib(
        "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe")
      sd.setSerdeInfo(serde)
      val t = new HmsTable()
      t.setDbName(db(namespace))
      t.setTableName(name.toLowerCase)
      t.setTableType("VIRTUAL_VIEW")
      t.setSd(sd)
      val params = new java.util.HashMap[String, String]()
      params.put("table_type", "ICEBERG-VIEW")
      params.put("metadata_location", docPath)
      t.setParameters(params)
      t
    }
  }

  /** pick the doc store for a catalog backing: REST catalogs serve view
    * documents over the protocol, HMS catalogs register pointer entries
    * in the metastore, everything else uses the warehouse */
  def docsFor(cat: graft.core.meta.HadoopCatalog): ViewDocs = cat match {
    case c: graft.core.meta.CachingCatalog => docsFor(c.underlying)
    case r: graft.core.meta.RestCatalog    => new RestViewDocs(r)
    case h: graft.core.meta.HiveMsCatalog  => new HiveViewDocs(h)
    case c                                 => FileViewDocs(c.warehouse)
  }

  /** one immutable view definition (view-spec "Versions") */
  final case class ViewVersion(
      versionId: Int,
      timestampMs: Long,
      sql: String,
      catalogName: String,
      namespaceParts: Seq[String],
      schemaJson: String,
      queryCols: Seq[String],
      aliases: Seq[String],
      comments: Seq[String],
      summary: Map[String, String])

  final case class StoredView(
      viewName: String,
      viewUuid: String,
      currentVersionId: Int,
      versions: Seq[ViewVersion],
      versionLog: Seq[(Long, Int)],
      props: Map[String, String]) extends View {
    def current: ViewVersion = versions.find(_.versionId == currentVersionId).get
    override def name(): String = viewName
    override def query(): String = current.sql
    override def currentCatalog(): String = current.catalogName
    override def schema(): StructType =
      DataType.fromJson(current.schemaJson).asInstanceOf[StructType]
    override def currentNamespace(): Array[String] = current.namespaceParts.toArray
    override def queryColumnNames(): Array[String] = current.queryCols.toArray
    override def columnAliases(): Array[String] = current.aliases.toArray
    override def columnComments(): Array[String] = current.comments.toArray
    override def properties(): util.Map[String, String] = props.asJava
  }

  /** Writes the spec's view-metadata shape (view-spec "View Metadata":
    * view-uuid / format-version / location / schemas / current-version-id
    * / versions-with-representations / version-log; reference
    * ViewMetadataParser.toJson, ViewVersionParser.toJson) so any
    * spec-conformant reader can consume a graft view. Graft rides three
    * extra fields alongside — top-level `name` plus per-version
    * `schema` (lossless Spark DataType JSON) and column name lists —
    * which spec readers ignore. */
  private def toJson(v: StoredView, location: String): String = {
    val o = MetaJson.mapper.createObjectNode()
    o.put("view-uuid", v.viewUuid)
      .put("format-version", 1)
      .put("location", location)
      .put("name", v.viewName)
    if (v.props.nonEmpty) {
      val p = o.putObject("properties")
      v.props.foreach { case (k, x) => p.put(k, x) }
    }
    // distinct per-version Spark schemas become the spec `schemas` list,
    // keyed by position; each version references its entry by schema-id
    val distinctSchemas = v.versions.map(_.schemaJson).distinct
    val schemaIdOf = distinctSchemas.zipWithIndex.toMap
    val schemas = o.putArray("schemas")
    distinctSchemas.zipWithIndex.foreach { case (sj, idx) =>
      val g = SparkTypes.fromSpark(DataType.fromJson(sj).asInstanceOf[StructType])
      schemas.add(graft.core.meta.IcebergJson.schemaJson(g.copy(schemaId = idx)))
    }
    o.put("current-version-id", v.currentVersionId)
    val vs = o.putArray("versions")
    v.versions.foreach { ver =>
      val n = vs.addObject()
      n.put("version-id", ver.versionId)
        .put("timestamp-ms", ver.timestampMs)
        .put("schema-id", schemaIdOf(ver.schemaJson))
      val sm = n.putObject("summary"); ver.summary.foreach { case (k, x) => sm.put(k, x) }
      if (ver.catalogName.nonEmpty) n.put("default-catalog", ver.catalogName)
      val ns = n.putArray("default-namespace"); ver.namespaceParts.foreach(ns.add)
      n.putArray("representations").addObject()
        .put("type", "sql").put("sql", ver.sql).put("dialect", "spark-sql")
      // graft extras (spec readers ignore unknown fields)
      n.put("schema", ver.schemaJson)
      val qc = n.putArray("query-column-names"); ver.queryCols.foreach(qc.add)
      val ca = n.putArray("column-aliases"); ver.aliases.foreach(ca.add)
      val cc = n.putArray("column-comments"); ver.comments.foreach(cc.add)
    }
    val vl = o.putArray("version-log")
    v.versionLog.foreach { case (ts, id) =>
      vl.addObject().put("timestamp-ms", ts).put("version-id", id)
    }
    MetaJson.mapper.writeValueAsString(o)
  }

  private def readArr(n: com.fasterxml.jackson.databind.JsonNode, f: String): Seq[String] = {
    val b = Seq.newBuilder[String]
    if (n.has(f)) n.get(f).elements().forEachRemaining(e => b += e.asText())
    b.result()
  }

  def load(warehouse: String, ident: Identifier): Option[StoredView] =
    load(FileViewDocs(warehouse), ident)

  def load(docs: ViewDocs, ident: Identifier): Option[StoredView] =
    docs.get(ident.namespace.toSeq, ident.name).map(fromJson(_, ident.name))

  /** Parses a stored view document in any of three shapes: the spec's
    * view metadata (view-spec "View Metadata" — representations +
    * Iceberg-typed `schemas`; reference ViewMetadataParser.fromJson,
    * ViewVersionParser.fromJson — this is what graft now writes and what
    * a genuine Apache-Iceberg view file contains), graft's legacy
    * versioned dialect (flat per-version `sql`), and the pre-versioning
    * single-definition document. */
  def fromJson(doc: String, fallbackName: String): StoredView = {
    {
      val n = MetaJson.mapper.readTree(doc)
      val props = scala.collection.mutable.Map.empty[String, String]
      if (n.has("properties"))
        n.get("properties").properties().asScala
          .foreach(e => props += e.getKey -> e.getValue.asText())
      if (n.has("versions")) {
        // spec-typed schemas, converted lazily to Spark schema JSON
        val specSchemas: Map[Int, String] =
          if (!n.has("schemas")) Map.empty
          else {
            val b = Map.newBuilder[Int, String]
            n.get("schemas").elements().forEachRemaining { sn =>
              val g = MetaJson.readSchema(sn)
              b += g.schemaId -> SparkTypes.toSparkSchema(g).json
            }
            b.result()
          }
        val vers = Seq.newBuilder[ViewVersion]
        n.get("versions").elements().forEachRemaining { vn =>
          // SQL text: spec representations (prefer the spark-sql dialect;
          // reject duplicate SQL dialects like the reference builder) or
          // the legacy flat field
          val sql =
            if (vn.has("representations")) {
              val reps = Seq.newBuilder[(String, String)] // dialect -> sql
              vn.get("representations").elements().forEachRemaining { rn =>
                if (rn.get("type").asText() == "sql")
                  reps += Option(rn.get("dialect")).map(_.asText())
                    .getOrElse("") -> rn.get("sql").asText()
              }
              val all = reps.result()
              val dup = all.groupBy(_._1).collectFirst { case (d, rs) if rs.size > 1 => d }
              dup.foreach(d => throw new IllegalArgumentException(
                s"Invalid view version: duplicate SQL representations for dialect $d"))
              all.find(_._1 == "spark-sql").orElse(all.headOption).map(_._2)
                .getOrElse(throw new IllegalArgumentException(
                  "Invalid view version: no SQL representation"))
            } else vn.get("sql").asText()
          // schema: graft's lossless Spark JSON when present, else the
          // spec schema referenced by schema-id
          val schemaJson =
            if (vn.has("schema")) vn.get("schema").asText()
            else specSchemas.getOrElse(vn.get("schema-id").asInt(),
              throw new IllegalArgumentException(
                s"Invalid view version: schema-id ${vn.get("schema-id")} not in schemas"))
          vers += ViewVersion(vn.get("version-id").asInt(),
            vn.get("timestamp-ms").asLong(), sql,
            Option(vn.get("default-catalog")).map(_.asText()).getOrElse(""),
            readArr(vn, "default-namespace"),
            schemaJson, readArr(vn, "query-column-names"),
            readArr(vn, "column-aliases"), readArr(vn, "column-comments"),
            if (vn.has("summary"))
              vn.get("summary").properties().asScala
                .map(e => e.getKey -> e.getValue.asText()).toMap
            else Map.empty)
        }
        val log = Seq.newBuilder[(Long, Int)]
        if (n.has("version-log"))
          n.get("version-log").elements().forEachRemaining(e =>
            log += ((e.get("timestamp-ms").asLong(), e.get("version-id").asInt())))
        if (n.has("schemas") && !n.has("location"))
          throw new IllegalArgumentException(
            "Cannot parse missing field: location")
        val currentId = Option(n.get("current-version-id")).map(_.asInt())
          .getOrElse(throw new IllegalArgumentException(
            "Cannot parse missing field: current-version-id"))
        val allVers = vers.result()
        if (!allVers.exists(_.versionId == currentId))
          throw new IllegalArgumentException(
            s"Cannot find current version $currentId in view versions: " +
              allVers.map(_.versionId).mkString(", "))
        StoredView(
          if (n.has("name")) n.get("name").asText() else fallbackName,
          if (n.has("view-uuid")) n.get("view-uuid").asText()
          else util.UUID.randomUUID.toString,
          currentId, allVers, log.result(),
          props.toMap)
      } else {
        // pre-versioning single-definition document: surface as version 1
        val v1 = ViewVersion(1, 0L, n.get("sql").asText(),
          n.get("current-catalog").asText(), readArr(n, "current-namespace"),
          n.get("schema").asText(), readArr(n, "query-column-names"),
          readArr(n, "column-aliases"), readArr(n, "column-comments"),
          Map("operation" -> "create"))
        StoredView(
          if (n.has("name")) n.get("name").asText() else fallbackName,
          util.UUID.randomUUID.toString,
          1, Seq(v1), Seq((0L, 1)), props.toMap)
      }
    }
  }

  def list(warehouse: String, namespace: Seq[String]): Seq[String] =
    FileViewDocs(warehouse).names(namespace)

  def list(docs: ViewDocs, namespace: Seq[String]): Seq[String] =
    docs.names(namespace)

  def create(warehouse: String, info: ViewInfo, replace: Boolean): StoredView =
    create(FileViewDocs(warehouse), info, replace)

  def create(docs: ViewDocs, info: ViewInfo, replace: Boolean,
      // catalog-level view property policy (reference CatalogProperties
      // VIEW_DEFAULT_PREFIX / VIEW_OVERRIDE_PREFIX): defaults under,
      // overrides over the statement's own properties
      defaults: Map[String, String] = Map.empty,
      overrides: Map[String, String] = Map.empty): StoredView = {
    val ident = info.ident
    val existing = load(docs, ident)
    if (!replace && existing.isDefined)
      throw new ViewAlreadyExistsException(ident)
    val now = System.currentTimeMillis()
    val newProps = defaults ++ info.properties.asScala.toMap ++ overrides
    val nextId = existing.map(_.versions.map(_.versionId).max + 1).getOrElse(1)
    val ver = ViewVersion(nextId, now, info.sql, info.currentCatalog,
      info.currentNamespace.toSeq, info.schema.json,
      info.queryColumnNames.toSeq, info.columnAliases.toSeq,
      info.columnComments.toSeq,
      Map("operation" -> (if (existing.isDefined) "replace" else "create")))
    val keep = newProps.get(HistoryProp).flatMap(_.toIntOption)
      .getOrElse(DefaultHistory).max(1)
    val versions = (existing.map(_.versions).getOrElse(Nil) :+ ver).takeRight(keep)
    val live = versions.map(_.versionId).toSet
    val log = (existing.map(_.versionLog).getOrElse(Nil) :+ ((now, nextId)))
      .filter(e => live.contains(e._2))
    val v = StoredView(ident.name,
      existing.map(_.viewUuid).getOrElse(util.UUID.randomUUID.toString),
      nextId, versions, log, newProps)
    docs.put(ident.namespace.toSeq, ident.name,
      toJson(v, docs.locationFor(ident.namespace.toSeq, ident.name)),
      replace = existing.isDefined)
    v
  }

  def alter(warehouse: String, ident: Identifier, changes: Seq[ViewChange]): StoredView =
    alter(FileViewDocs(warehouse), ident, changes)

  def alter(docs: ViewDocs, ident: Identifier, changes: Seq[ViewChange]): StoredView = {
    val v = load(docs, ident).getOrElse(throw new NoSuchViewException(ident))
    var props = v.props
    changes.foreach {
      case sp: ViewChange.SetProperty    => props += (sp.property -> sp.value)
      case rp: ViewChange.RemoveProperty => props -= rp.property
      case other => throw new UnsupportedOperationException(other.toString)
    }
    // property changes do not create a version (view-spec: versions are
    // immutable view DEFINITIONS)
    val updated = v.copy(props = props)
    docs.put(ident.namespace.toSeq, ident.name,
      toJson(updated, docs.locationFor(ident.namespace.toSeq, ident.name)),
      replace = true)
    updated
  }

  def drop(warehouse: String, ident: Identifier): Boolean =
    drop(FileViewDocs(warehouse), ident)

  def drop(docs: ViewDocs, ident: Identifier): Boolean =
    docs.delete(ident.namespace.toSeq, ident.name)

  def rename(warehouse: String, from: Identifier, to: Identifier): Unit =
    rename(FileViewDocs(warehouse), from, to)

  def rename(docs: ViewDocs, from: Identifier, to: Identifier): Unit = {
    val v = load(docs, from).getOrElse(throw new NoSuchViewException(from))
    if (load(docs, to).isDefined) throw new ViewAlreadyExistsException(to)
    docs.put(to.namespace.toSeq, to.name,
      toJson(v.copy(viewName = to.name),
        docs.locationFor(to.namespace.toSeq, to.name)),
      replace = false)
    docs.delete(from.namespace.toSeq, from.name)
  }
}
