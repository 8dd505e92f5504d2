package graft.spark

import java.util

import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Delegating session catalog (reference SparkSessionCatalog): installed
  * as `spark.sql.catalog.spark_catalog`, it serves graft tables for
  * identifiers the graft warehouse knows (or creates with `USING graft`)
  * and falls through to Spark's built-in session catalog for everything
  * else — so one catalog namespace mixes graft and non-graft tables.
  */
class GraftSessionCatalog extends GraftCatalog with CatalogExtension {

  private var delegate: CatalogPlugin = _

  override def setDelegateCatalog(d: CatalogPlugin): Unit = delegate = d

  private def asTables: TableCatalog = delegate.asInstanceOf[TableCatalog]
  private def asNamespaces: SupportsNamespaces = delegate.asInstanceOf[SupportsNamespaces]

  override def loadTable(ident: Identifier): Table =
    try super.loadTable(ident)
    catch { case _: NoSuchTableException => asTables.loadTable(ident) }

  override def loadTable(ident: Identifier, version: String): Table =
    try super.loadTable(ident, version)
    catch { case _: NoSuchTableException => asTables.loadTable(ident, version) }

  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    try super.loadTable(ident, timestampMicros)
    catch { case _: NoSuchTableException => asTables.loadTable(ident, timestampMicros) }

  override def tableExists(ident: Identifier): Boolean =
    super.tableExists(ident) || asTables.tableExists(ident)

  private def isGraftProvider(properties: util.Map[String, String]): Boolean =
    Option(properties.get(TableCatalog.PROP_PROVIDER)).exists(_.equalsIgnoreCase("graft"))

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    if (isGraftProvider(properties)) super.createTable(ident, columns, partitions, properties)
    else asTables.createTable(ident, columns, partitions, properties)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    if (isGraftProvider(properties)) super.createTable(ident, schema, partitions, properties)
    else asTables.createTable(ident, schema, partitions, properties)

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    if (super.tableExists(ident)) super.alterTable(ident, changes: _*)
    else asTables.alterTable(ident, changes: _*)

  override def dropTable(ident: Identifier): Boolean =
    super.dropTable(ident) || asTables.dropTable(ident)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    if (super.tableExists(oldIdent)) super.renameTable(oldIdent, newIdent)
    else asTables.renameTable(oldIdent, newIdent)

  override def listTables(namespace: Array[String]): Array[Identifier] =
    (super.listTables(namespace) ++ asTables.listTables(namespace)).distinct

  override def namespaceExists(namespace: Array[String]): Boolean =
    super.namespaceExists(namespace) || asNamespaces.namespaceExists(namespace)

  override def listNamespaces(): Array[Array[String]] =
    (super.listNamespaces() ++ asNamespaces.listNamespaces()).distinct

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (super.namespaceExists(namespace)) super.loadNamespaceMetadata(namespace)
    else asNamespaces.loadNamespaceMetadata(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    // create in BOTH so `USE ns` and graft table creation each work;
    // succeed if EITHER side does, propagate the failure when both fail
    val a = try { asNamespaces.createNamespace(namespace, metadata); None }
            catch { case e: Throwable => Some(e) }
    val b = try { super.createNamespace(namespace, metadata); None }
            catch { case e: Throwable => Some(e) }
    (a, b) match {
      case (Some(e), Some(_)) => throw e
      case _                  => ()
    }
  }

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val a = try super.dropNamespace(namespace, cascade) catch { case _: Throwable => false }
    val b = try asNamespaces.dropNamespace(namespace, cascade) catch { case _: Throwable => false }
    a || b
  }

  // ------------------------------------------------------------- staging
  // provider-dispatched (reference SparkSessionCatalog.stageCreate):
  // graft tables stage atomically through GraftCatalog's StagedOps; other
  // providers create eagerly through the session catalog with a
  // rollback-on-abort wrapper (reference RollbackStagedTable)
  override def stageCreate(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    if (isGraftProvider(properties)) super.stageCreate(ident, columns, partitions, properties)
    else new GraftSessionCatalog.RollbackStagedTable(asTables, ident,
      asTables.createTable(ident, columns, partitions, properties))

  override def stageReplace(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    if (isGraftProvider(properties)) super.stageReplace(ident, columns, partitions, properties)
    else {
      if (!asTables.dropTable(ident)) throw new NoSuchTableException(ident)
      new GraftSessionCatalog.RollbackStagedTable(asTables, ident,
        asTables.createTable(ident, columns, partitions, properties))
    }

  override def stageCreateOrReplace(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    if (isGraftProvider(properties))
      super.stageCreateOrReplace(ident, columns, partitions, properties)
    else {
      asTables.dropTable(ident)
      new GraftSessionCatalog.RollbackStagedTable(asTables, ident,
        asTables.createTable(ident, columns, partitions, properties))
    }
}

object GraftSessionCatalog {
  /** Eagerly-created staged table for non-graft providers: commit keeps
    * it, abort drops it (reference spark/.../RollbackStagedTable.java). */
  private final class RollbackStagedTable(catalog: TableCatalog,
      ident: Identifier, t: Table)
    extends Table with StagedTable with SupportsRead with SupportsWrite {
    override def name(): String = t.name()
    override def schema(): StructType = t.schema()
    override def partitioning(): Array[Transform] = t.partitioning()
    override def properties(): util.Map[String, String] = t.properties()
    override def capabilities(): util.Set[TableCapability] = t.capabilities()
    override def newScanBuilder(options: CaseInsensitiveStringMap) =
      t.asInstanceOf[SupportsRead].newScanBuilder(options)
    override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo) =
      t.asInstanceOf[SupportsWrite].newWriteBuilder(info)
    override def commitStagedChanges(): Unit = ()
    override def abortStagedChanges(): Unit = catalog.dropTable(ident)
  }
}
