package graft.core.meta

import graft.core.expr.{ColStats, FileStats}
import graft.core.transform.Transform
import graft.core.types._

/** Metadata tree model (reference format/spec.md:657-1203):
  * table-metadata JSON → per-snapshot manifest list → manifests (entry
  * per data/delete file with partition tuple + column stats) → files.
  *
  * Deliberate idiomatic deviations from the reference serialization:
  * manifests/manifest lists are JSON (lines) instead of Avro — the
  * format is behind `ManifestIO` so a columnar manifest format is a
  * drop-in replacement for 100 TB metadata scale.
  */
object FileContent {
  val Data = 0
  val PositionDeletes = 1
  val EqualityDeletes = 2
}

final case class DataFile(
    path: String,
    format: String,
    specId: Int,
    partition: Seq[Any], // partition tuple, internal representation
    recordCount: Long,
    fileSizeBytes: Long,
    columnStats: Map[Int, ColStats] = Map.empty,
    content: Int = FileContent.Data,
    // delete-file-only fields
    equalityIds: Seq[Int] = Nil,
    // path of the single data file a position-delete file targets, if known
    referencedDataFile: Option[String] = None,
    // DV-only (spec manifest fields 144/145): where the deletion-vector-v1
    // blob lives inside its Puffin container, so readers can seek straight
    // to it without re-parsing the footer
    contentOffset: Option[Long] = None,
    contentSizeInBytes: Option[Long] = None,
    // v3 row lineage: _row_id of this file's first row (data files only)
    firstRowId: Option[Long] = None,
    // shredded-variant sub-path stats, keyed "variantFieldId:$.path"
    // (write.variant.shred.* config; reference variant shredding spec) —
    // lets variant_get predicates prune files without schema fields
    shredStats: Map[String, graft.core.expr.ColStats] = Map.empty,
    // parquet row-group start offsets (spec manifest field 132
    // split_offsets; reference BaseFile.java:73): row-group-aligned
    // boundaries let the planner split large files — including ones
    // carrying deletes or serving _pos, where byte splits can't keep
    // positions exact
    splitOffsets: Seq[Long] = Nil,
    // id of the table sort order this file's rows are clustered by
    // (spec manifest field 140 sort_order_id; reference DataFile.java:98)
    // — None for unsorted writes or orders not registered on the table
    sortOrderId: Option[Int] = None) {
  def fileStats: FileStats = FileStats(recordCount, columnStats, shredStats)
  def isDeleteFile: Boolean = content != FileContent.Data
}

/** GLOBAL delete files: a MoR delete/update hitting rows of a NON-current
  * spec can't know their partition tuple (the _partition metadata column
  * is typed by the current spec), so the writer emits the delete with an
  * empty tuple and this sentinel specId. RowDelta resolves it at commit
  * to a real unpartitioned spec — appended to the table if none exists —
  * keeping every manifest entry's tuple arity consistent with its spec
  * (the reference never produces the mismatch: its _partition column is
  * the UNIFIED struct over all specs, Partitioning.partitionType). */
object GlobalDeletes {
  val SpecSentinel: Int = -1
}

object ManifestEntryStatus {
  val Existing = 0
  val Added = 1
  val Deleted = 2
}

final case class ManifestEntry(
    status: Int,
    snapshotId: Long,
    dataSequenceNumber: Long,
    file: DataFile,
    // schema id current when the FILE was written, persisted in the
    // entry so it survives snapshot expiry (the adding snapshot — the
    // only other source — may no longer exist). Name-resolved formats
    // (ORC, imported parquet) need it to read since-renamed columns
    // under their write-time names. None on entries written before r9;
    // planning then falls back to the snapshot lookup.
    writeSchemaId: Option[Int] = None,
    // sequence when the FILE was first added (spec entry field 4
    // file_sequence_number). graft's own commits never separate it from
    // dataSequenceNumber (adds stamp both to the commit sequence and
    // carries preserve both), so None means "same as data sequence";
    // Avro-read Iceberg manifests keep a genuinely different value.
    fileSequenceNumber: Option[Long] = None) {
  def isLive: Boolean = status != ManifestEntryStatus.Deleted
  def fileSequence: Long = fileSequenceNumber.getOrElse(dataSequenceNumber)
}

/** Per-partition-field summary kept in the manifest list for manifest
  * pruning (format/spec.md field_summary). */
final case class FieldSummary(
    containsNull: Boolean,
    containsNan: Boolean = false,
    lower: Option[Any] = None,
    upper: Option[Any] = None)

/** Spec-scoped, array-normalized partition identity — the ONE way to
  * compare partition tuples (byte arrays compare by reference in a Seq;
  * tuples only mean the same thing under the same spec). */
object PartitionTuples {
  def key(f: DataFile): (Int, Seq[Any]) = (f.specId, normalize(f.partition))
  def normalize(p: Seq[Any]): Seq[Any] = p.map {
    case b: Array[Byte] => b.toSeq
    case x              => x
  }
}

final case class ManifestFile(
    path: String,
    length: Long,
    specId: Int,
    content: Int, // 0=data, 1=deletes
    addedSnapshotId: Long,
    minSequenceNumber: Long,
    addedFilesCount: Int,
    existingFilesCount: Int,
    deletedFilesCount: Int,
    addedRowsCount: Long,
    partitionSummaries: Seq[FieldSummary] = Nil,
    // spec manifest-list existing_rows_count / deleted_rows_count: row
    // counts of Existing / Deleted entries, so live-row totals are a
    // manifest-list sum instead of an entry scan
    existingRowsCount: Long = 0L,
    deletedRowsCount: Long = 0L,
    // encrypted tables: this manifest file's wrapped DEK+AAD (spec
    // manifest_file field 519 key_metadata)
    keyMetadata: Option[String] = None,
    // spec manifest-list field 515 sequence_number: the snapshot sequence
    // when this manifest was added. v2 entry-field inheritance (a null
    // sequence on an ADDED entry inherits this) and the Avro list writer
    // need it; graft's JSON entries always store explicit sequences, so
    // None is fine for pre-existing manifests (inheritance then falls
    // back to minSequenceNumber, which equals it for fresh manifests).
    sequenceNumber: Option[Long] = None) {
  def hasLiveFiles: Boolean = addedFilesCount + existingFilesCount > 0
  def liveRowsCount: Long = addedRowsCount + existingRowsCount
}

final case class Snapshot(
    snapshotId: Long,
    parentId: Option[Long],
    sequenceNumber: Long,
    timestampMs: Long,
    operation: String, // append | replace | overwrite | delete
    manifestListPath: String,
    summary: Map[String, String] = Map.empty,
    // v3 row lineage: first row id allocated to files added by this snapshot
    firstRowId: Option[Long] = None,
    // schema current when this snapshot committed (spec `schema-id`):
    // time travel reads with THIS schema, so a later REPLACE TABLE or
    // column drop never re-shapes historical reads
    schemaId: Option[Int] = None,
    // encrypted tables (spec v3 "the encryption key used for a snapshot
    // is specified by key-id"): the table key that wraps this snapshot's
    // manifest-list DEK, and that wrapped DEK+AAD
    keyId: Option[String] = None,
    keyMetadata: Option[String] = None)

object SnapshotRefType {
  val Branch = "branch"
  val Tag = "tag"
}
final case class SnapshotRef(snapshotId: Long, refType: String,
    minSnapshotsToKeep: Option[Int] = None,
    maxSnapshotAgeMs: Option[Long] = None,
    maxRefAgeMs: Option[Long] = None)

final case class SortField(sourceId: Int, transform: Transform,
    ascending: Boolean = true, nullsFirst: Boolean = true)
final case class SortOrder(orderId: Int, fields: Seq[SortField])
object SortOrder { val Unsorted: SortOrder = SortOrder(0, Nil) }

/** One blob's catalog-level metadata inside a statistics file entry
  * (format/spec.md blob metadata; reference api/.../BlobMetadata) —
  * lets a planner pick blobs without opening the Puffin footer. */
final case class StatBlobMeta(tpe: String, snapshotId: Long,
    sequenceNumber: Long, fields: Seq[Int],
    properties: Map[String, String] = Map.empty)

/** A Puffin statistics file attached to a snapshot
  * (format/spec.md statistics-file; reference core/.../StatisticsFile).
  * Footer size + blob list are spec-required on the JSON entry
  * (reference StatisticsFileParser.fromJson uses getLong/array, not
  * optional) — 0/Nil only on entries written before they were tracked. */
final case class StatisticsFile(snapshotId: Long, path: String,
    fileSizeBytes: Long, fileFooterSizeBytes: Long = 0L,
    blobMetadata: Seq[StatBlobMeta] = Nil)

/** A partition-statistics file attached to a snapshot (format/spec.md
  * "Partition Statistics"; reference core/.../PartitionStatisticsFile). */
final case class PartitionStatisticsFile(snapshotId: Long, path: String,
    fileSizeBytes: Long)

final case class TableMetadata(
    formatVersion: Int,
    tableUuid: String,
    location: String,
    lastSequenceNumber: Long,
    lastUpdatedMs: Long,
    lastColumnId: Int,
    currentSchemaId: Int,
    schemas: Seq[GSchema],
    defaultSpecId: Int,
    specs: Seq[graft.core.expr.PartitionSpec],
    lastPartitionId: Int,
    defaultSortOrderId: Int,
    sortOrders: Seq[SortOrder],
    properties: Map[String, String],
    currentSnapshotId: Option[Long],
    snapshots: Seq[Snapshot],
    snapshotLog: Seq[(Long, Long)], // (timestampMs, snapshotId)
    refs: Map[String, SnapshotRef],
    // v3 row lineage: next unassigned _row_id
    nextRowId: Long = 0L,
    // Puffin statistics files (format/puffin-spec.md; spec.md statistics)
    statistics: Seq[StatisticsFile] = Nil,
    // spec `partition-statistics`: per-snapshot partition stats files
    partitionStatistics: Seq[PartitionStatisticsFile] = Nil,
    // spec `metadata-log`: previous metadata files, oldest first, each
    // (timestamp the file BECAME current, file path); appended by the
    // catalog ops at commit and trimmed to
    // write.metadata.previous-versions-max
    metadataLog: Seq[(Long, String)] = Nil,
    // spec `encryption-keys`: wrapped per-table keys for table
    // encryption (newest last; resolved through the KMS at load)
    encryptionKeys: Seq[EncryptionKey] = Nil) {

  def schema: GSchema = schemas.find(_.schemaId == currentSchemaId).get
  def spec: graft.core.expr.PartitionSpec = specs.find(_.specId == defaultSpecId).get
  def specById(id: Int): graft.core.expr.PartitionSpec = specs.find(_.specId == id).get
  def currentSnapshot: Option[Snapshot] =
    currentSnapshotId.flatMap(snapshotById)
  // id lookups route through LazySnapshots' unique-key fast path so a
  // refs-mode table's hot lookups (current snapshot, ref heads) never
  // force the full snapshot-list load; ids are unique, so subset-first
  // probing is order-safe (unlike generic find)
  def snapshotById(id: Long): Option[Snapshot] = snapshots match {
    case ls: LazySnapshots => ls.findById(id)
    case s                 => s.find(_.snapshotId == id)
  }
  def ref(name: String): Option[SnapshotRef] =
    refs.get(name).orElse(
      if (name == "main") currentSnapshotId.map(SnapshotRef(_, SnapshotRefType.Branch)) else None)

  /** Ancestry chain of a ref's head (oldest first): the snapshots
    * reachable by following parentId from the branch head. Incremental /
    * changelog reads filter with this instead of the global snapshot
    * list, so snapshots staged on other branches (WAP) never leak. */
  def ancestry(refName: String = "main"): Seq[Snapshot] = {
    val out = List.newBuilder[Snapshot]
    var cur = ref(refName).flatMap(r => snapshotById(r.snapshotId))
    val seen = scala.collection.mutable.Set.empty[Long]
    while (cur.isDefined && seen.add(cur.get.snapshotId)) {
      out += cur.get
      cur = cur.get.parentId.flatMap(snapshotById)
    }
    out.result().reverse
  }

  /** snapshot current as of a wall-clock timestamp (time travel) */
  def snapshotAsOfTime(tsMs: Long): Option[Snapshot] =
    snapshotLog.filter(_._1 <= tsMs).lastOption
      .flatMap { case (_, id) => snapshotById(id) }

  def withSnapshot(s: Snapshot, ref: String = "main"): TableMetadata = {
    // advance the branch head PRESERVING its retention policy
    val advanced = refs.get(ref) match {
      case Some(r) => r.copy(snapshotId = s.snapshotId, refType = SnapshotRefType.Branch)
      case None    => SnapshotRef(s.snapshotId, SnapshotRefType.Branch)
    }
    val newRefs = refs.updated(ref, advanced)
    copy(
      lastSequenceNumber = math.max(lastSequenceNumber, s.sequenceNumber),
      lastUpdatedMs = s.timestampMs,
      currentSnapshotId = if (ref == "main") Some(s.snapshotId) else currentSnapshotId,
      snapshots = snapshots :+ s,
      snapshotLog =
        if (ref == "main") snapshotLog :+ (s.timestampMs, s.snapshotId) else snapshotLog,
      refs = newRefs)
  }

  /** Add a snapshot WITHOUT moving any ref (stage-only WAP commit): it is
    * reachable by id for audit/cherry-pick but invisible to branch reads. */
  def withStagedSnapshot(s: Snapshot): TableMetadata = copy(
    lastSequenceNumber = math.max(lastSequenceNumber, s.sequenceNumber),
    lastUpdatedMs = s.timestampMs,
    snapshots = snapshots :+ s)
}

object TableMetadata {
  def newTable(location: String, schema: GSchema,
      spec: graft.core.expr.PartitionSpec,
      properties: Map[String, String] = Map.empty): TableMetadata =
    TableMetadata(
      // the reserved format-version property selects the spec version at
      // creation (reference TableMetadata.newTableMetadata); v3+ changes
      // write-side defaults (deletion vectors instead of position-delete
      // files)
      formatVersion = properties.get("format-version")
        .flatMap(_.toIntOption)
        .map { v =>
          require(v >= 1 && v <= 4, s"unsupported format-version: $v")
          v
        }
        .getOrElse(2),
      tableUuid = java.util.UUID.randomUUID.toString,
      location = location,
      lastSequenceNumber = 0L,
      lastUpdatedMs = System.currentTimeMillis(),
      lastColumnId = schema.highestFieldId,
      currentSchemaId = schema.schemaId,
      schemas = Seq(schema),
      defaultSpecId = spec.specId,
      specs = Seq(spec),
      lastPartitionId = spec.fields.map(_.fieldId).maxOption.getOrElse(999),
      defaultSortOrderId = 0,
      sortOrders = Seq(SortOrder.Unsorted),
      properties = properties,
      currentSnapshotId = None,
      snapshots = Nil,
      snapshotLog = Nil,
      refs = Map.empty,
      nextRowId = 0L,
      // `encryption.key-id` at CREATE turns on table encryption: mint a
      // table key, wrap it with the named KMS master key, and track it
      // in `encryption-keys` (spec v3 table encryption)
      encryptionKeys = properties.get(TableCrypto.KeyIdProp).toSeq
        .map(masterId => TableCrypto.create(masterId)._1))

  /** Metadata for REPLACE TABLE: same table identity (uuid, location,
    * snapshot history, sequence counter) with a brand-new current schema,
    * default spec and properties, and NO current snapshot — the staged
    * replacement write lands as a parentless snapshot and becomes the new
    * head in the same CAS (reference core/.../TableMetadata.java
    * buildReplacement). Old snapshots stay reachable for time travel;
    * the new schema's field ids start past lastColumnId so recycled ids
    * can never alias an old column. */
  def buildReplacement(base: TableMetadata, schema: GSchema,
      spec: graft.core.expr.PartitionSpec,
      properties: Map[String, String]): TableMetadata = {
    val shifted = schema.shiftIds(base.lastColumnId)
      .copy(schemaId = base.schemas.map(_.schemaId).max + 1)
    // the caller built `spec` against the UNSHIFTED schema; re-key its
    // source ids and give the partition fields ids past lastPartitionId
    val srcShift = spec.fields.map(f =>
      f.copy(sourceId = f.sourceId + base.lastColumnId))
    val newSpec = spec.copy(
      specId = base.specs.map(_.specId).max + 1,
      fields = srcShift.zipWithIndex.map { case (f, i) =>
        f.copy(fieldId = math.max(base.lastPartitionId, 999) + 1 + i)
      })
    base.copy(
      lastUpdatedMs = System.currentTimeMillis(),
      lastColumnId = shifted.highestFieldId,
      currentSchemaId = shifted.schemaId,
      schemas = base.schemas :+ shifted,
      defaultSpecId = newSpec.specId,
      specs = base.specs :+ newSpec,
      lastPartitionId = newSpec.fields.map(_.fieldId).maxOption
        .getOrElse(base.lastPartitionId),
      defaultSortOrderId = 0,
      properties = base.properties ++ properties,
      currentSnapshotId = None,
      refs = base.refs - "main")
  }
}
