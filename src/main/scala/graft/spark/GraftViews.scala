package graft.spark

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, ViewAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewChange, ViewInfo}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.core.meta.{GraftIO, MetaJson}

/** Catalog-stored SQL views (reference api/core view/ + view-spec.md):
  * each view is a JSON document under `<warehouse>/<ns>/_views/<name>.json`
  * holding the SQL text, the resolution context (catalog + namespace),
  * the declared schema, and properties. Reads re-parse the stored SQL in
  * the stored context — the Spark analyzer does the rest. */
object GraftViewStore {

  private def dir(warehouse: String, namespace: Seq[String]): String =
    (warehouse +: namespace :+ "_views").mkString("/")

  private def path(warehouse: String, ident: Identifier): String =
    s"${dir(warehouse, ident.namespace.toSeq)}/${ident.name}.json"

  final case class StoredView(
      viewName: String,
      sql: String,
      catalogName: String,
      namespaceParts: Seq[String],
      schemaJson: String,
      queryCols: Seq[String],
      aliases: Seq[String],
      comments: Seq[String],
      props: Map[String, String]) extends View {
    override def name(): String = viewName
    override def query(): String = sql
    override def currentCatalog(): String = catalogName
    override def schema(): StructType =
      DataType.fromJson(schemaJson).asInstanceOf[StructType]
    override def currentNamespace(): Array[String] = namespaceParts.toArray
    override def queryColumnNames(): Array[String] = queryCols.toArray
    override def columnAliases(): Array[String] = aliases.toArray
    override def columnComments(): Array[String] = comments.toArray
    override def properties(): util.Map[String, String] = props.asJava
  }

  private def write(warehouse: String, ident: Identifier, v: StoredView): Unit = {
    val o = MetaJson.mapper.createObjectNode()
    o.put("name", v.viewName).put("sql", v.sql)
      .put("current-catalog", v.catalogName)
      .put("schema", v.schemaJson)
    val ns = o.putArray("current-namespace"); v.namespaceParts.foreach(ns.add)
    val qc = o.putArray("query-column-names"); v.queryCols.foreach(qc.add)
    val ca = o.putArray("column-aliases"); v.aliases.foreach(ca.add)
    val cc = o.putArray("column-comments"); v.comments.foreach(cc.add)
    val p = o.putObject("properties"); v.props.foreach { case (k, x) => p.put(k, x) }
    java.nio.file.Files.createDirectories(
      GraftIO.toPath(dir(warehouse, ident.namespace.toSeq)))
    GraftIO.writeString(path(warehouse, ident), MetaJson.mapper.writeValueAsString(o))
  }

  private def readArr(n: com.fasterxml.jackson.databind.JsonNode, f: String): Seq[String] = {
    val b = Seq.newBuilder[String]
    if (n.has(f)) n.get(f).elements().forEachRemaining(e => b += e.asText())
    b.result()
  }

  def load(warehouse: String, ident: Identifier): Option[StoredView] = {
    val p = path(warehouse, ident)
    if (!GraftIO.exists(p)) None
    else {
      val n = MetaJson.mapper.readTree(GraftIO.readString(p))
      val props = scala.collection.mutable.Map.empty[String, String]
      if (n.has("properties"))
        n.get("properties").properties().asScala
          .foreach(e => props += e.getKey -> e.getValue.asText())
      Some(StoredView(n.get("name").asText(), n.get("sql").asText(),
        n.get("current-catalog").asText(), readArr(n, "current-namespace"),
        n.get("schema").asText(), readArr(n, "query-column-names"),
        readArr(n, "column-aliases"), readArr(n, "column-comments"),
        props.toMap))
    }
  }

  def list(warehouse: String, namespace: Seq[String]): Seq[String] = {
    val d = GraftIO.toPath(dir(warehouse, namespace))
    if (!java.nio.file.Files.isDirectory(d)) Nil
    else java.nio.file.Files.list(d).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json")).toSeq
  }

  def create(warehouse: String, info: ViewInfo, replace: Boolean): StoredView = {
    val ident = info.ident
    if (!replace && GraftIO.exists(path(warehouse, ident)))
      throw new ViewAlreadyExistsException(ident)
    val v = StoredView(ident.name, info.sql, info.currentCatalog,
      info.currentNamespace.toSeq, info.schema.json,
      info.queryColumnNames.toSeq, info.columnAliases.toSeq,
      info.columnComments.toSeq, info.properties.asScala.toMap)
    write(warehouse, ident, v)
    v
  }

  def alter(warehouse: String, ident: Identifier, changes: Seq[ViewChange]): StoredView = {
    val v = load(warehouse, ident).getOrElse(throw new NoSuchViewException(ident))
    var props = v.props
    changes.foreach {
      case sp: ViewChange.SetProperty    => props += (sp.property -> sp.value)
      case rp: ViewChange.RemoveProperty => props -= rp.property
      case other => throw new UnsupportedOperationException(other.toString)
    }
    val updated = v.copy(props = props)
    write(warehouse, ident, updated)
    updated
  }

  def drop(warehouse: String, ident: Identifier): Boolean = {
    val p = path(warehouse, ident)
    val existed = GraftIO.exists(p)
    GraftIO.delete(p)
    existed
  }

  def rename(warehouse: String, from: Identifier, to: Identifier): Unit = {
    val v = load(warehouse, from).getOrElse(throw new NoSuchViewException(from))
    if (GraftIO.exists(path(warehouse, to))) throw new ViewAlreadyExistsException(to)
    write(warehouse, to, v.copy(viewName = to.name))
    GraftIO.delete(path(warehouse, from))
  }
}
