package graft.spark

import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.meta.GTable
import graft.core.types.SparkTypes

/** Copy-on-write row-level operations (reference
  * SparkCopyOnWriteOperation.java / SparkCopyOnWriteScan.java).
  *
  * Spark 4's analyzer rewrites DELETE/UPDATE/MERGE against a
  * SupportsRowLevelOperations table into a group-based ReplaceData plan:
  * it scans the affected file groups through this operation's
  * ScanBuilder (narrowed further by runtime group filtering), recomputes
  * the surviving rows, and writes them through this operation's
  * WriteBuilder. The commit atomically swaps exactly the files the scan
  * planned for the rewritten output. Metadata-only deletes still
  * short-circuit via SupportsDeleteV2 (OptimizeMetadataOnlyDeleteFromTable).
  */
final class GraftRowLevelOperationBuilder(table: GTable,
    info: RowLevelOperationInfo,
    branchPin: Option[String] = None) extends RowLevelOperationBuilder {
  // per-command mode dispatch via table properties (reference
  // SparkRowLevelOperationBuilder + RowLevelOperationMode)
  override def build(): RowLevelOperation = {
    import RowLevelOperation.Command
    val propKey = info.command() match {
      case Command.DELETE => "write.delete.mode"
      case Command.UPDATE => "write.update.mode"
      case Command.MERGE  => "write.merge.mode"
      case other          => throw new IllegalArgumentException(other.toString)
    }
    val eqPropKey = info.command() match {
      case Command.DELETE => "write.delete.equality-enabled"
      case Command.UPDATE => "write.update.equality-enabled"
      case _              => "write.merge.equality-enabled"
    }
    table.meta.properties.getOrElse(propKey, "copy-on-write") match {
      // graft extension: DELETE/UPDATE/MERGE on an identifier-keyed MoR
      // table can write equality deletes (delta ∝ distinct touched keys,
      // no per-row position bookkeeping; updates eq-delete the old key +
      // append the replacement at the same sequence, which the delete —
      // applying only to strictly lower sequences — can never mask) —
      // the reference only reaches its EqualityDeleteWriter from Flink
      // CDC, never from Spark SQL. CONTRACT (same as streaming upsert):
      // identifier fields uniquely identify a live row; with duplicate
      // keys present, a key-wise UPDATE masks every copy while
      // replacing only the matched one.
      case "merge-on-read"
          if table.schema.identifierFieldIds.nonEmpty &&
            table.meta.properties.get(eqPropKey).contains("true") =>
        new GraftEqDeleteOperation(table, info.command(), branchPin)
      case "merge-on-read" => new GraftMoROperation(table, info.command(), branchPin)
      case _               => new GraftCoWOperation(table, info.command(), branchPin)
    }
  }
}

final class GraftCoWOperation(table: GTable,
    cmd: RowLevelOperation.Command,
    branchPin: Option[String] = None) extends RowLevelOperation {

  // the scan instance is shared with the write: the files it planned
  // (after pushdown + runtime group filtering) are the replace set
  @volatile private var configuredScan: GraftSparkTable.GraftScan = _

  override def command(): RowLevelOperation.Command = cmd

  // requesting _file makes Spark build data/metadata projections, so the
  // writer receives clean table-schema rows (and _file identifies groups);
  // the lineage columns ride along so rewritten rows keep their _row_id /
  // last-updated sequence (reference SparkCopyOnWriteOperation
  // requiredMetadataAttributes + ExtractRowLineage)
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(GraftSparkTable.MetaFileCol, GraftSparkTable.MetaRowIdCol,
      GraftSparkTable.MetaSeqCol)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)

  // ignoreResiduals: the rewrite must see EVERY row of the planned files;
  // pushed filters prune files only, never rows
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSparkTable.GraftScanBuilder(table, None, branchPin, None,
      onBuild = s => configuredScan = s, ignoreResiduals = true)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        val writeSchema = SparkTypes.toSparkSchema(table.schema)
        require(info.schema().length == writeSchema.length,
          s"CoW write schema mismatch: got ${info.schema()} expected $writeSchema")
        new GraftWrite(table, writeSchema, CopyOnWriteMode(
          () => {
            val scan = configuredScan
            require(scan != null, "copy-on-write scan was never configured")
            scan.plannedFilePaths()
          },
          () => Option(configuredScan).flatMap(_.scannedSnapshotId()),
          // per-command isolation level (shared with the delta paths):
          // serializable also aborts when appended rows might match the
          // operation's pushed filter
          () => {
            if (GraftRowLevelOps.serializableIsolation(table, cmd))
              Some(Option(configuredScan).map(_.pushedExpr)
                .getOrElse(graft.core.expr.TrueE))
            else None
          }),
          branch = branchPin.orElse(WapBranch.resolve()).getOrElse("main"))
      }
    }

  override def description(): String = s"graft-cow($cmd)"
}

/** Merge-on-read row-level operations (reference
  * SparkPositionDeltaOperation / SparkPositionDeltaWrite): instead of
  * rewriting file groups, each task emits position-delete files keyed by
  * (_file, _pos) plus new data rows, committed as one RowDelta. Readers
  * mask deleted positions. At scale this turns an UPDATE touching 1% of
  * rows from a full-group rewrite into a delta proportional to the
  * touched rows.
  */
final class GraftMoROperation(table: GTable,
    cmd: RowLevelOperation.Command,
    branchPin: Option[String] = None) extends RowLevelOperation with SupportsDelta {

  // the operation's scan: its snapshot + pushed filter define the
  // scan-to-commit conflict window (reference SparkPositionDeltaWrite
  // validates through BaseRowDelta with the command's isolation level)
  @volatile private var configuredScan: GraftSparkTable.GraftScan = _

  override def command(): RowLevelOperation.Command = cmd

  override def rowId(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(
      org.apache.spark.sql.connector.expressions.Expressions.column(GraftSparkTable.MetaFileCol),
      org.apache.spark.sql.connector.expressions.Expressions.column(GraftSparkTable.MetaPosCol))

  // partitioned tables: project (_spec_id, _partition) so delete writers
  // fan position-delete files out per partition tuple (reference
  // SparkPositionDeltaOperation.requiredMetadataAttributes) — partition-
  // scoped deletes prune at scan time instead of attaching globally.
  // Lineage columns ride along so UPDATE's replacement rows keep _row_id.
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val part: Array[String] =
      if (table.spec.fields.isEmpty) Array.empty
      else Array(GraftSparkTable.MetaSpecIdCol, GraftSparkTable.MetaPartitionCol)
    (part ++ Array(GraftSparkTable.MetaRowIdCol, GraftSparkTable.MetaSeqCol))
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSparkTable.GraftScanBuilder(table, None, branchPin, None,
      onBuild = s => configuredScan = s)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new GraftDeltaWrite(table, branchPin,
        GraftRowLevelOps.conflictInfo(() => configuredScan),
        GraftRowLevelOps.serializableIsolation(table, cmd),
        SnapshotProps.from(info.options),
        Option(info.options.get("delete-granularity")))
    }

  override def description(): String = s"graft-mor($cmd)"
}

object GraftRowLevelOps {
  /** (scanned snapshot, pushed filter) of the operation's configured
    * scan, evaluated at commit time */
  private[spark] def conflictInfo(scan: () => GraftSparkTable.GraftScan)
      : () => Option[(Option[Long], graft.core.expr.Expr)] =
    () => Option(scan()).map(s => (s.scannedSnapshotId(), s.pushedExpr))

  /** per-command isolation level (reference IsolationLevel; default
    * serializable) */
  private[spark] def serializableIsolation(table: GTable,
      cmd: RowLevelOperation.Command): Boolean = {
    val key = cmd match {
      case RowLevelOperation.Command.DELETE => "write.delete.isolation-level"
      case RowLevelOperation.Command.UPDATE => "write.update.isolation-level"
      case _                                => "write.merge.isolation-level"
    }
    table.meta.properties.getOrElse(key, "serializable") == "serializable"
  }
}

/** DELETE/UPDATE as equality deletes (see GraftEqDeltaWrite): the row ID
  * is the identifier-field tuple, so Spark's delta plan feeds the writer
  * exactly the key values of the matched rows — no (_file, _pos)
  * projection, no clustering by file needed. UPDATE additionally writes
  * the new rows as ordinary data files in the same RowDelta. */
final class GraftEqDeleteOperation(table: GTable,
    cmd: RowLevelOperation.Command,
    branchPin: Option[String] = None) extends RowLevelOperation with SupportsDelta {

  @volatile private var configuredScan: GraftSparkTable.GraftScan = _

  override def command(): RowLevelOperation.Command = cmd

  private def eqFields = table.schema.identifierFieldIds.toSeq.sorted
    .map(id => table.schema.fields.find(_.id == id).getOrElse(
      throw new IllegalArgumentException(
        s"identifier field $id must be a top-level column")))

  override def rowId(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    eqFields.map(f =>
      org.apache.spark.sql.connector.expressions.Expressions.column(f.name)).toArray

  // partitioned tables: project (_spec_id, _partition) so delete files
  // fan out per partition tuple and attach partition-scoped; lineage
  // columns ride along for UPDATE's replacement rows
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val part: Array[String] =
      if (table.spec.fields.isEmpty) Array.empty
      else Array(GraftSparkTable.MetaSpecIdCol, GraftSparkTable.MetaPartitionCol)
    (part ++ Array(GraftSparkTable.MetaRowIdCol, GraftSparkTable.MetaSeqCol))
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSparkTable.GraftScanBuilder(table, None, branchPin, None,
      onBuild = s => configuredScan = s)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new GraftEqDeltaWrite(table, branchPin,
        GraftRowLevelOps.conflictInfo(() => configuredScan),
        GraftRowLevelOps.serializableIsolation(table, cmd))
    }

  override def description(): String = s"graft-eq-delete($cmd)"
}
