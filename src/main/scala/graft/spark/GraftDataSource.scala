package graft.spark

import java.util

import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.meta.{FileTableOps, GTable}
import graft.core.types.SparkTypes

/** `USING graft` / `format("graft")` registration (reference
  * IcebergSource + META-INF/services): identifier-based creates route
  * through the catalogs; path-based reads open the table rooted at
  * `path` (its metadata dir) directly. */
class GraftDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def open(options: CaseInsensitiveStringMap): GTable = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft source requires a path or a catalog identifier"))
    val ops = new FileTableOps(path)
    require(ops.currentVersion() > 0, s"no graft table at $path")
    new GTable(ops)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SparkTypes.toSparkSchema(open(options).schema)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val t = open(new CaseInsensitiveStringMap(properties))
    new GraftSparkTable(t, t.location)
  }

  override def supportsExternalMetadata(): Boolean = false
}
