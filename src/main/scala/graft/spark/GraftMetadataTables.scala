package graft.spark

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.meta._

/** Metadata tables: `SELECT * FROM cat.db.tbl.snapshots` etc. (reference
  * core/.../MetadataTableType.java:23-39 + {Snapshots,History,…}Table.java).
  *
  * Snapshot/ref/history/manifest tables are O(snapshots) and served as
  * driver-side LocalScans. The entry-level tables (files/entries and
  * their all_ variants) and position_deletes are DISTRIBUTED scans —
  * one input partition per manifest (or delete file), entries read
  * executor-side — because at 100 TB those are millions of rows
  * (reference BaseFilesTable.ManifestReadTask / PositionDeletesTable). */
object GraftMetadataTables {

  val types: Set[String] = Set(
    "snapshots", "history", "refs", "manifests", "files", "entries",
    "partitions", "metadata_log_entries", "position_deletes",
    "data_files", "delete_files",
    "all_files", "all_manifests", "all_entries",
    "all_data_files", "all_delete_files", "scan_reports", "commit_reports")

  private def s(v: String): UTF8String = UTF8String.fromString(v)

  /** Map[String,String] → MapData with keys and values from ONE
    * pairwise traversal. Never build the arrays from `.keys.map(...)` /
    * `.values.map(...)`: mapping the keySet yields a NEW hash-ordered
    * Set (UTF8String hashing ≠ String hashing) while the values keep
    * insertion order — above 4 entries the two silently misalign. */
  private def strMap(m: Map[String, String]): ArrayBasedMapData = {
    val kv = m.toSeq
    ArrayBasedMapData(kv.map(e => s(e._1)).toArray, kv.map(e => s(e._2)).toArray)
  }

  /** readable_metrics (reference MetricsUtil.readableMetricsSchema —
    * MetricsUtil.java:193,354 — joined into the table at
    * BaseFilesTable.java:56): one nested struct per primitive leaf of
    * the data schema, with lower/upper bounds TYPED as the column, so a
    * user debugging why pruning didn't fire reads
    * `readable_metrics.ts.lower_bound` as a timestamp, not a hex blob.
    * column_size is always null — graft's manifests deliberately don't
    * carry per-column byte sizes. */
  final case class MetricCol(id: Int, name: String, dt: DataType)

  def metricCols(schema: graft.core.types.GSchema): Seq[MetricCol] = {
    import graft.core.types._
    def walk(prefix: String, fs: Seq[GField]): Seq[MetricCol] = fs.flatMap { f =>
      val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.tpe match {
        case s: GStruct           => walk(p, s.fields)
        case GVariant | GUnknown  => Nil // stats live in shredStats / absent
        case t if t.isPrimitive   => Seq(MetricCol(f.id, p, SparkTypes.toSpark(t)))
        case _                    => Nil // list/map: no per-column stats
      }
    }
    walk("", schema.fields)
  }

  def readableMetricsType(cols: Seq[MetricCol]): StructType =
    StructType(cols.map(c => StructField(c.name, StructType(Seq(
      StructField("column_size", LongType),
      StructField("value_count", LongType),
      StructField("null_value_count", LongType),
      StructField("nan_value_count", LongType),
      StructField("lower_bound", c.dt),
      StructField("upper_bound", c.dt))))))

  /** stat value (plain Scala, MetaJson.readValue shapes) → Spark
    * internal value of the column's type; null when unconvertible
    * rather than failing the whole metadata query */
  private[spark] def statInternal(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _)                          => null
    case (s: String, StringType)            => UTF8String.fromString(s)
    case (b: Array[Byte], BinaryType)       => b
    case (i: Int, IntegerType | DateType)   => i
    case (i: Int, LongType | TimestampType | TimestampNTZType) => i.toLong
    case (l: Long, LongType | TimestampType | TimestampNTZType) => l
    case (l: Long, IntegerType | DateType)  => l.toInt
    case (f: Float, FloatType)              => f
    case (f: Float, DoubleType)             => f.toDouble
    case (d: Double, DoubleType)            => d
    case (b: Boolean, BooleanType)          => b
    case (d: java.math.BigDecimal, t: DecimalType) =>
      Decimal(d, t.precision, t.scale)
    case (other, StringType)                => UTF8String.fromString(String.valueOf(other))
    case _                                  => null
  }

  private[spark] def readableMetricsRow(
      stats: Map[Int, graft.core.expr.ColStats],
      cols: Seq[MetricCol]): InternalRow =
    new GenericInternalRow(cols.map[Any] { c =>
      stats.get(c.id) match {
        case None => new GenericInternalRow(
          Array[Any](null, null, null, null, null, null))
        case Some(cs) => new GenericInternalRow(Array[Any](
          null, // column_size: not tracked
          cs.valueCount.map(Long.box).orNull,
          cs.nullCount.map(Long.box).orNull,
          cs.nanCount.map(Long.box).orNull,
          statInternal(cs.lower.orNull, c.dt),
          statInternal(cs.upper.orNull, c.dt)))
      }
    }.toArray)

  /** entry-level kinds carry readable_metrics typed from the table's
    * current schema (reference BaseFilesTable/BaseEntriesTable) */
  def schemaOf(kind: String, schema: graft.core.types.GSchema): StructType =
    kind match {
      case "files" | "data_files" | "delete_files" | "all_files" |
           "all_data_files" | "all_delete_files" | "entries" | "all_entries" =>
        StructType(schemaOf(kind).fields :+
          StructField("readable_metrics", readableMetricsType(metricCols(schema))))
      case _ => schemaOf(kind)
    }

  def schemaOf(kind: String): StructType = kind match {
    case "snapshots" => StructType(Seq(
      StructField("committed_at", TimestampType),
      StructField("snapshot_id", LongType),
      StructField("parent_id", LongType),
      StructField("operation", StringType),
      StructField("manifest_list", StringType),
      StructField("sequence_number", LongType),
      StructField("summary", MapType(StringType, StringType))))
    case "history" => StructType(Seq(
      StructField("made_current_at", TimestampType),
      StructField("snapshot_id", LongType),
      StructField("parent_id", LongType),
      StructField("is_current_ancestor", BooleanType)))
    case "refs" => StructType(Seq(
      StructField("name", StringType),
      StructField("type", StringType),
      StructField("snapshot_id", LongType),
      StructField("min_snapshots_to_keep", IntegerType),
      StructField("max_snapshot_age_in_ms", LongType)))
    case "manifests" => StructType(Seq(
      StructField("content", IntegerType),
      StructField("path", StringType),
      StructField("length", LongType),
      StructField("partition_spec_id", IntegerType),
      StructField("added_snapshot_id", LongType),
      StructField("added_data_files_count", IntegerType),
      StructField("existing_data_files_count", IntegerType),
      StructField("deleted_data_files_count", IntegerType)))
    case "files" => StructType(Seq(
      StructField("content", IntegerType),
      StructField("file_path", StringType),
      StructField("file_format", StringType),
      StructField("spec_id", IntegerType),
      StructField("partition", StringType),
      StructField("record_count", LongType),
      StructField("file_size_in_bytes", LongType),
      // per-column metrics keyed by field id (reference BaseFilesTable
      // schema: value_counts/null_value_counts/nan_value_counts/
      // lower_bounds/upper_bounds); bounds render human-readable, which
      // also makes the metrics-mode policy observable (g53)
      StructField("value_counts", MapType(IntegerType, LongType)),
      StructField("null_value_counts", MapType(IntegerType, LongType)),
      StructField("nan_value_counts", MapType(IntegerType, LongType)),
      StructField("lower_bounds", MapType(IntegerType, StringType)),
      StructField("upper_bounds", MapType(IntegerType, StringType)),
      // DV-only (spec fields 144/145): blob position inside the puffin
      StructField("content_offset", LongType),
      StructField("content_size_in_bytes", LongType)))
    case "entries" => StructType(Seq(
      StructField("status", IntegerType),
      StructField("snapshot_id", LongType),
      StructField("sequence_number", LongType),
      StructField("file_path", StringType),
      StructField("record_count", LongType),
      StructField("content", IntegerType),
      StructField("file_size_in_bytes", LongType),
      StructField("spec_id", IntegerType),
      StructField("partition", StringType)))
    case "partitions" => StructType(Seq(
      StructField("partition", StringType),
      StructField("spec_id", IntegerType),
      StructField("record_count", LongType),
      StructField("file_count", IntegerType),
      StructField("total_size_in_bytes", LongType)))
    case "metadata_log_entries" => StructType(Seq(
      StructField("timestamp", TimestampType),
      StructField("file", StringType),
      StructField("latest_snapshot_id", LongType)))
    case "position_deletes" => StructType(Seq(
      StructField("file_path", StringType),
      StructField("pos", LongType),
      StructField("delete_file_path", StringType)))
    case "scan_reports" => StructType(Seq(
      StructField("made_at", TimestampType),
      StructField("snapshot_id", LongType),
      StructField("filter", StringType),
      StructField("total_manifests", IntegerType),
      StructField("scanned_manifests", IntegerType),
      StructField("total_data_files", LongType),
      StructField("result_tasks", IntegerType),
      StructField("result_delete_files", IntegerType),
      StructField("planning_ms", LongType),
      StructField("distributed_planning", BooleanType)))
    case "commit_reports" => StructType(Seq(
      StructField("made_at", TimestampType),
      StructField("snapshot_id", LongType),
      StructField("operation", StringType),
      StructField("branch", StringType),
      StructField("attempts", IntegerType),
      StructField("duration_ms", LongType),
      StructField("summary", MapType(StringType, StringType))))
    case "data_files" | "delete_files" => schemaOf("files")
    case "all_files" | "all_data_files" | "all_delete_files" => schemaOf("files")
    case "all_manifests" => schemaOf("manifests")
    case "all_entries" => schemaOf("entries")
    case other => throw new IllegalArgumentException(s"unknown metadata table: $other")
  }

  def rowsOf(kind: String, table: GTable): Array[InternalRow] = {
    val m = table.refresh() // metadata tables reflect the CURRENT state
    def currentManifests: Seq[ManifestFile] =
      m.currentSnapshot.map(sn => ManifestIO.readList(sn.manifestListPath)).getOrElse(Nil)
    def partString(specId: Int, tuple: Seq[Any]): UTF8String = {
      val spec = m.specById(specId)
      s(spec.fields.zip(tuple).map { case (pf, v) =>
        val shown = v match {
          case b: Array[Byte] => b.map("%02x".format(_)).mkString
          case other          => String.valueOf(other)
        }
        s"${pf.name}=$shown"
      }.mkString("{", ", ", "}"))
    }

    kind match {
      case "snapshots" => m.snapshots.map { sn =>
        new GenericInternalRow(Array[Any](
          sn.timestampMs * 1000L, sn.snapshotId, sn.parentId.map(Long.box).orNull,
          s(sn.operation), s(sn.manifestListPath), sn.sequenceNumber,
          strMap(sn.summary))): InternalRow
      }.toArray
      case "history" =>
        val ancestors = {
          var ids = Set.empty[Long]
          var cur = m.currentSnapshot
          while (cur.isDefined) { ids += cur.get.snapshotId; cur = cur.get.parentId.flatMap(m.snapshotById) }
          ids
        }
        m.snapshotLog.map { case (ts, id) =>
          new GenericInternalRow(Array[Any](
            ts * 1000L, id, m.snapshotById(id).flatMap(_.parentId).map(Long.box).orNull,
            ancestors.contains(id))): InternalRow
        }.toArray
      case "refs" => m.refs.map { case (name, r) =>
        new GenericInternalRow(Array[Any](
          s(name), s(r.refType), r.snapshotId,
          r.minSnapshotsToKeep.map(Int.box).orNull,
          r.maxSnapshotAgeMs.map(Long.box).orNull)): InternalRow
      }.toArray
      case "manifests" => currentManifests.map { mf =>
        new GenericInternalRow(Array[Any](
          mf.content, s(mf.path), mf.length, mf.specId, mf.addedSnapshotId,
          mf.addedFilesCount, mf.existingFilesCount, mf.deletedFilesCount)): InternalRow
      }.toArray
      case "partitions" =>
        // distributed aggregate (reference PartitionsTable is built from
        // the entries scan): each task folds ONE manifest into
        // (spec, partition) → (records, files, bytes) partials,
        // reduceByKey combines map-side, and the driver collects only
        // O(partitions) — at 1.5M files the driver never sees an entry
        val dataMfs = currentManifests.filter(_.content == 0)
        if (dataMfs.isEmpty) Array.empty
        else {
          val sc = org.apache.spark.sql.SparkSession.active.sparkContext
          val partials = sc
            .parallelize(dataMfs, math.max(1, math.min(dataMfs.size, 64)))
            .flatMap { mf =>
              ManifestIO.readEntries(mf).iterator.collect {
                case e if e.isLive && e.file.content == FileContent.Data =>
                  // byte-array partition values normalize for hashable keys
                  ((e.file.specId, e.file.partition.map {
                    case b: Array[Byte] => b.toSeq
                    case x              => x
                  }), (e.file.partition, e.file.recordCount, 1L, e.file.fileSizeBytes))
              }
            }
            .reduceByKey((a, b) => (a._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
            .collect()
          partials
            .map { case ((specId, _), (tuple, records, files, bytes)) =>
              (specId, partString(specId, tuple), records, files, bytes)
            }
            .sortBy { case (specId, ps, _, _, _) => (specId, ps.toString) }
            .map { case (specId, ps, records, files, bytes) =>
              new GenericInternalRow(Array[Any](
                ps, specId, records, files.toInt, bytes)): InternalRow
            }
        }
      case "metadata_log_entries" =>
        // reference MetadataLogEntriesTable: one row per previous metadata
        // file (spec metadata-log) plus the current document; the latest
        // snapshot of each is the newest snapshot-log entry at or before
        // the time the file became current
        val entries = m.metadataLog ++
          table.ops.currentMetadataPath.map(p => (m.lastUpdatedMs, p)).toSeq
        entries.map { case (ts, file) =>
          val latest = m.snapshotLog.filter(_._1 <= ts).lastOption.map(_._2)
          new GenericInternalRow(Array[Any](
            ts * 1000L, s(file),
            latest.map(java.lang.Long.valueOf).orNull)): InternalRow
        }.toArray
      case "scan_reports" =>
        // this session's recent planning reports for THIS table, newest
        // first (driver-side ring; reference ScanReport metrics)
        ScanReports.recent.filter(_.tableLocation == table.location).map { r =>
          new GenericInternalRow(Array[Any](
            r.timestampMs * 1000L, r.snapshotId, s(r.filter),
            r.totalManifests, r.scannedManifests, r.totalDataFiles,
            r.resultTasks, r.resultDeleteFiles, r.planningMs,
            r.distributedPlanning)): InternalRow
        }.toArray
      case "commit_reports" =>
        // this session's recent commit outcomes for THIS table, newest
        // first (driver-side ring; reference CommitReport metrics)
        CommitReports.recent.filter(_.tableLocation == table.location).map { r =>
          new GenericInternalRow(Array[Any](
            r.timestampMs * 1000L, r.snapshotId, s(r.operation), s(r.branch),
            r.attempts, r.durationMs,
            strMap(r.summary))): InternalRow
        }.toArray
      case "all_manifests" =>
        // union across ALL snapshots, deduplicated by path
        m.snapshots
          .flatMap(sn => try ManifestIO.readList(sn.manifestListPath)
            catch { case _: Throwable => Nil })
          .groupBy(_.path).map(_._2.head).toSeq
          .map { mf =>
            new GenericInternalRow(Array[Any](
              mf.content, s(mf.path), mf.length, mf.specId, mf.addedSnapshotId,
              mf.addedFilesCount, mf.existingFilesCount, mf.deletedFilesCount)): InternalRow
          }.toArray
      case other => throw new IllegalArgumentException(
        s"metadata table $other is served by a distributed scan, not a LocalScan")
    }
  }
}

/** One manifest to read executor-side for the entry-level metadata
  * tables; carries the spec-id → partition-field-names map so the
  * partition tuple renders without table metadata on the executor. */
final case class ManifestReadTask(manifest: ManifestFile,
    specNames: Map[Int, Seq[String]], kind: String,
    metricCols: Seq[GraftMetadataTables.MetricCol] = Nil)
  extends org.apache.spark.sql.connector.read.InputPartition

/** Distributed scan for the entry-level metadata tables (files/entries/
  * data_files/delete_files and their all_ variants; reference
  * core/.../BaseFilesTable.java ManifestReadTask): planning lists
  * manifests (manifest-list scale); each manifest's entries — at 100 TB
  * potentially millions of rows across thousands of manifests — are
  * read executor-side, one input partition per manifest. Like the
  * reference, the all_ tables may produce more than one row per file
  * when several retained snapshots reference it. */
final class ManifestEntriesScan(table: GTable, kind: String)
  extends Scan with org.apache.spark.sql.connector.read.Batch {
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}

  override def readSchema(): StructType =
    GraftMetadataTables.schemaOf(kind, table.meta.schema)
  override def toBatch: org.apache.spark.sql.connector.read.Batch = this
  override def description(): String = s"graft-$kind(${table.location})"

  override def planInputPartitions(): Array[InputPartition] = {
    val metricCols = GraftMetadataTables.metricCols(table.meta.schema)
    val m = table.refresh()
    val manifests =
      if (kind.startsWith("all_"))
        m.snapshots
          .flatMap(sn => try ManifestIO.readList(sn.manifestListPath)
            catch { case _: Throwable => Nil })
          .groupBy(_.path).map(_._2.head).toSeq
      else
        m.currentSnapshot.map(sn => ManifestIO.readList(sn.manifestListPath)).getOrElse(Nil)
    val specNames = m.specs.map(sp => sp.specId -> sp.fields.map(_.name)).toMap
    manifests.map(mf =>
      ManifestReadTask(mf, specNames, kind, metricCols): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = ManifestEntriesScan.Factory
}

object ManifestEntriesScan {
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}

  private[spark] object Factory extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val t = p.asInstanceOf[ManifestReadTask]
      def us(v: String): UTF8String = UTF8String.fromString(v)
      def partString(specId: Int, tuple: Seq[Any]): UTF8String = {
        val names = t.specNames.getOrElse(specId, Nil)
        us(names.zip(tuple).map { case (name, v) =>
          val shown = v match {
            case b: Array[Byte] => b.map("%02x".format(_)).mkString
            case other          => String.valueOf(other)
          }
          s"$name=$shown"
        }.mkString("{", ", ", "}"))
      }
      val entries = ManifestIO.readEntries(t.manifest).filter(_.isLive)
      val filtered = t.kind match {
        case "data_files" | "all_data_files" =>
          entries.filter(_.file.content == FileContent.Data)
        case "delete_files" | "all_delete_files" =>
          entries.filter(_.file.content != FileContent.Data)
        case _ => entries
      }
      val it: Iterator[InternalRow] =
        if (t.kind == "entries" || t.kind == "all_entries")
          filtered.iterator.map { e =>
            new GenericInternalRow(Array[Any](
              e.status, e.snapshotId, e.dataSequenceNumber, us(e.file.path),
              e.file.recordCount, e.file.content, e.file.fileSizeBytes,
              e.file.specId,
              partString(e.file.specId, e.file.partition),
              GraftMetadataTables.readableMetricsRow(
                e.file.columnStats, t.metricCols))): InternalRow
          }
        else
          filtered.iterator.map { e =>
            val st = e.file.columnStats.toSeq.sortBy(_._1)
            def counts(sel: graft.core.expr.ColStats => Option[Long]): Any = {
              val kv = st.flatMap { case (id, cs) => sel(cs).map(id -> _) }
              if (kv.isEmpty) null
              else ArrayBasedMapData(kv.map(_._1).toArray, kv.map(_._2).toArray)
            }
            def bounds(sel: graft.core.expr.ColStats => Option[Any]): Any = {
              val kv = st.flatMap { case (id, cs) =>
                sel(cs).map {
                  case b: Array[Byte] => id -> us(b.map("%02x".format(_)).mkString)
                  case other          => id -> us(String.valueOf(other))
                }
              }
              if (kv.isEmpty) null
              else ArrayBasedMapData(kv.map(_._1).toArray, kv.map(_._2: Any).toArray)
            }
            new GenericInternalRow(Array[Any](
              e.file.content, us(e.file.path), us(e.file.format), e.file.specId,
              partString(e.file.specId, e.file.partition),
              e.file.recordCount, e.file.fileSizeBytes,
              counts(_.valueCount), counts(_.nullCount), counts(_.nanCount),
              bounds(_.lower), bounds(_.upper),
              e.file.contentOffset.map(Long.box).orNull,
              e.file.contentSizeInBytes.map(Long.box).orNull,
              GraftMetadataTables.readableMetricsRow(
                e.file.columnStats, t.metricCols))): InternalRow
          }
      new PartitionReader[InternalRow] {
        private var cur: InternalRow = _
        override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
        override def get(): InternalRow = cur
        override def close(): Unit = ()
      }
    }
  }
}

/** One live position-delete file (or deletion vector) to read
  * executor-side. */
final case class PosDeleteFileTask(path: String, format: String)
  extends org.apache.spark.sql.connector.read.InputPartition

/** Distributed `position_deletes` scan (reference
  * core/src/main/java/org/apache/iceberg/PositionDeletesTable.java):
  * planning lists the live delete files (metadata scale); their CONTENTS
  * — at 100 TB potentially millions of (file, pos) rows — are read
  * executor-side, one input partition per delete file. Parquet delete
  * files go through a driver-built (executor-run) reader closure,
  * deletion-vector bitmaps decode on the executor; the driver never
  * materializes delete rows (the previous LocalScan collect()ed every
  * delete file onto the driver). */
final class PositionDeletesScan(table: GTable)
  extends Scan with org.apache.spark.sql.connector.read.Batch {
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}

  override def readSchema(): StructType = GraftMetadataTables.schemaOf("position_deletes")
  override def toBatch: org.apache.spark.sql.connector.read.Batch = this
  override def description(): String = s"graft-position-deletes(${table.location})"

  override def planInputPartitions(): Array[InputPartition] = {
    val m = table.refresh()
    m.currentSnapshot.map(sn => ManifestIO.readList(sn.manifestListPath)).getOrElse(Nil)
      .flatMap(mf => ManifestIO.readEntries(mf).filter(_.isLive))
      .filter(_.file.content == FileContent.PositionDeletes)
      .map(e => PosDeleteFileTask(e.file.path, e.file.format): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    val deleteSchema = StructType(Seq(
      StructField("file_path", StringType), StructField("pos", LongType)))
    val conf = spark.sessionState.newHadoopConfWithOptions(Map.empty)
    // encrypted tables: modular-decryption factory for parquet delete
    // files; the table crypto rides the factory for executor-side DV reads
    GraftParquetCrypto.configure(conf, table.meta)
    val readFunc = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
      .buildReaderWithPartitionValues(spark, deleteSchema, new StructType(),
        deleteSchema, Nil,
        Map(org.apache.spark.sql.execution.datasources.FileFormat.OPTION_RETURNING_BATCH -> "false",
          "enableVectorizedReader" -> "false"),
        conf)
    new PositionDeletesScan.Factory(readFunc,
      graft.core.meta.TableCrypto.resolve(table.meta))
  }
}

object PositionDeletesScan {
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
  import org.apache.spark.sql.execution.datasources.PartitionedFile

  private[spark] final class Factory(
      readFunc: PartitionedFile => Iterator[InternalRow],
      crypto: Option[graft.core.meta.TableCrypto] = None)
    extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val t = p.asInstanceOf[PosDeleteFileTask]
      val it: Iterator[InternalRow] =
        if (t.format == "dv") {
          // stream the bitmap: a 100M-position DV iterates in place
          // instead of allocating one row object per position up front
          val (ref, bm) = DVIO.read(t.path, crypto)
          val refU = UTF8String.fromString(ref)
          val pathU = UTF8String.fromString(t.path)
          val li = bm.getLongIterator
          new Iterator[InternalRow] {
            override def hasNext: Boolean = li.hasNext
            override def next(): InternalRow =
              new GenericInternalRow(Array[Any](refU, li.next(), pathU))
          }
        } else {
          val pf = PartitionedFile(InternalRow.empty,
            org.apache.spark.paths.SparkPath.fromPathString(t.path),
            0L, Long.MaxValue, Array.empty[String], 0L, Long.MaxValue, Map.empty)
          readFunc(pf).map { r =>
            new GenericInternalRow(Array[Any](
              r.getUTF8String(0), r.getLong(1), UTF8String.fromString(t.path))): InternalRow
          }
        }
      new PartitionReader[InternalRow] {
        private var cur: InternalRow = _
        override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
        override def get(): InternalRow = cur
        override def close(): Unit = ()
      }
    }
  }
}

final class GraftMetadataTable(table: GTable, fullName: String, kind: String)
  extends Table with SupportsRead {

  override def name(): String = fullName
  override def schema(): StructType =
    GraftMetadataTables.schemaOf(kind, table.meta.schema)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  private val distributedKinds = Set("files", "entries", "data_files",
    "delete_files", "all_files", "all_entries", "all_data_files",
    "all_delete_files")

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        if (kind == "position_deletes") new PositionDeletesScan(table)
        else if (distributedKinds(kind)) new ManifestEntriesScan(table, kind)
        else new GraftSparkTable.GraftLocalScan(
          GraftMetadataTables.schemaOf(kind), GraftMetadataTables.rowsOf(kind, table))
    }
}
