package graft.core.meta

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.file.{DataFileWriter => ADataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.expr.{ColStats, PartitionField, PartitionSpec}
import graft.core.transform._
import graft.core.types._

/** Round-trip coverage for the spec-Avro manifest codec (reference
  * format/spec.md "Manifests"/"Manifest Lists", Appendix D single-value
  * serialization): write→read must reproduce what the JSON path stores,
  * for every bound type, v2 sequence-number inheritance, and raw-bytes
  * summary passthrough. This codec is live on the sniffing read path
  * (ManifestIO.readEntries/readList), so byte-level bugs here surface
  * as interop corruption. */
class AvroManifestsSpec extends AnyFunSuite {

  private val schema = GSchema(GStruct(Seq(
    GField(1, "b", GBoolean, required = true),
    GField(2, "i", GInt),
    GField(3, "l", GLong),
    GField(4, "f", GFloat),
    GField(5, "d", GDouble),
    GField(6, "s", GString),
    GField(7, "dt", GDate),
    GField(8, "ts", GTimestamp()),
    GField(9, "dec", GDecimal(14, 2)),
    GField(10, "bin", GBinary),
    GField(11, "u", GUuid))), schemaId = 3)

  private def stats(id: Int, lo: Any, hi: Any, nulls: Long = 1L,
      nans: Option[Long] = None): (Int, ColStats) =
    // sizeBytes exercises spec field 117 (column_sizes) round-trips
    id -> ColStats(Some(100L), Some(nulls), nans, Some(lo), Some(hi),
      sizeBytes = Some(1000L + id))

  private val allStats = Map(
    stats(1, false, true),
    stats(2, -42, 41),
    stats(3, -9999999999L, 9999999999L),
    stats(4, -1.5f, 2.5f, nans = Some(3L)),
    stats(5, -2.25, 7.75, nans = Some(0L)),
    stats(6, "aardvark", "zebra"),
    stats(7, 18000, 19000), // days
    stats(8, 1600000000000000L, 1700000000000000L), // micros
    stats(9, new java.math.BigDecimal("-12345678.90"), new java.math.BigDecimal("99999999.99")),
    stats(10, Array[Byte](1, 2, 3), Array[Byte](9, 9)),
    stats(11, Array.fill[Byte](16)(0x11), Array.fill[Byte](16)(0x7f)))

  private def df(path: String, partition: Seq[Any], specId: Int = 0,
      content: Int = FileContent.Data, eqIds: Seq[Int] = Nil): DataFile =
    DataFile(path, "parquet", specId, partition, recordCount = 10L,
      fileSizeBytes = 1234L, columnStats = allStats, content = content,
      equalityIds = eqIds,
      referencedDataFile = if (content == FileContent.PositionDeletes)
        Some("/w/t/data/ref.parquet") else None)

  private def assertStatsEqual(a: Map[Int, ColStats], b: Map[Int, ColStats]): Unit = {
    assert(a.keySet === b.keySet)
    a.keySet.foreach { id =>
      val (x, y) = (a(id), b(id))
      assert(x.valueCount === y.valueCount, s"field $id valueCount")
      assert(x.nullCount === y.nullCount, s"field $id nullCount")
      assert(x.nanCount === y.nanCount, s"field $id nanCount")
      def norm(v: Option[Any]) = v.map {
        case ab: Array[Byte] => ab.toSeq
        case other           => other
      }
      assert(norm(x.lower) === norm(y.lower), s"field $id lower")
      assert(norm(x.upper) === norm(y.upper), s"field $id upper")
      assert(x.sizeBytes === y.sizeBytes, s"field $id sizeBytes")
    }
  }

  test("Appendix D single-value: every type round-trips, decimals keep sign") {
    val cases: Seq[(GType, Any)] = Seq(
      (GBoolean, true), (GBoolean, false),
      (GInt, Int.MinValue), (GInt, 7), (GDate, 19000),
      (GLong, Long.MinValue + 1), (GTime, 86399999999L),
      (GTimestamp(), 1600000000000000L), (GTimestampNs(true), 42L),
      (GFloat, -0.5f), (GDouble, 1e300),
      (GString, "héllo √ world"),
      (GDecimal(9, 2), new java.math.BigDecimal("-1234567.89")),
      (GDecimal(20, 4), new java.math.BigDecimal("9999999999999999.9999")),
      (GDecimal(5, 0), new java.math.BigDecimal("-1")))
    cases.foreach { case (t, v) =>
      val bytes = SingleValue.toBytes(t, v).get
      val back = SingleValue.fromBytes(t, bytes)
      assert(back === v, s"$t: $v")
    }
    // minimal two's-complement: -1 is one byte, sign preserved
    assert(SingleValue.toBytes(GDecimal(5, 0), new java.math.BigDecimal("-1")).get.length === 1)
    // binary family passes raw
    val bin = Array[Byte](0, -1, 127)
    assert(SingleValue.toBytes(GBinary, bin).get.toSeq === bin.toSeq)
    assert(SingleValue.adapt(GInt, SingleValue.toBytes(GInt, 99).get) === 99)
    assert(SingleValue.adapt(GBinary, bin).asInstanceOf[Array[Byte]].toSeq === bin.toSeq)
  }

  test("manifest round-trip: all-type partition tuple + stats bounds") {
    val spec = PartitionSpec(0, Seq(
      PartitionField(2, 1000, "i", IdentityT),
      PartitionField(6, 1001, "s_trunc", TruncateT(3)),
      PartitionField(8, 1002, "ts_day", DayT),
      PartitionField(9, 1003, "dec", IdentityT)))
    val partition = Seq(5, "abc", 18518, new java.math.BigDecimal("-77.25"))
    val entries = Seq(
      ManifestEntry(ManifestEntryStatus.Added, 900L, 4L, df("/w/t/data/a.parquet", partition)),
      ManifestEntry(ManifestEntryStatus.Existing, 800L, 3L,
        df("/w/t/data/b.parquet", Seq(null, null, null, null))),
      ManifestEntry(ManifestEntryStatus.Deleted, 900L, 2L, df("/w/t/data/c.parquet", partition)))
    val bytes = AvroManifests.writeManifest(entries, spec, schema,
      FileContent.Data, formatVersion = 2)
    assert(AvroManifests.isAvro(bytes))
    val mf = ManifestFile("/w/t/metadata/m1.avro", bytes.length, 0, 0,
      addedSnapshotId = 900L, minSequenceNumber = 2L, addedFilesCount = 1,
      existingFilesCount = 1, deletedFilesCount = 1, addedRowsCount = 10L,
      sequenceNumber = Some(4L))
    val back = AvroManifests.readEntries(bytes, mf)
    assert(back.size === 3)
    back.zip(entries).foreach { case (r, e) =>
      assert(r.status === e.status)
      assert(r.snapshotId === e.snapshotId)
      assert(r.dataSequenceNumber === e.dataSequenceNumber)
      assert(r.file.path === e.file.path)
      assert(r.file.format === e.file.format)
      assert(r.file.recordCount === e.file.recordCount)
      assert(r.file.fileSizeBytes === e.file.fileSizeBytes)
      assert(r.file.content === e.file.content)
      assert(PartitionTuples.normalize(r.file.partition) ===
        PartitionTuples.normalize(e.file.partition))
      assertStatsEqual(r.file.columnStats, e.file.columnStats)
    }
    // the ADDED entry recovers writeSchemaId from the header
    assert(back.head.writeSchemaId === Some(3))
    assert(back(1).writeSchemaId === None) // Existing resolves via snapshot
  }

  test("sort_order_id and file_sequence_number round-trip through Avro") {
    val spec = PartitionSpec(0, Seq(PartitionField(2, 1000, "i", IdentityT)))
    val entries = Seq(
      // stamped sorted file; explicit file sequence differing from data
      ManifestEntry(ManifestEntryStatus.Existing, 800L, 3L,
        df("/w/t/data/s.parquet", Seq(1)).copy(sortOrderId = Some(2)),
        fileSequenceNumber = Some(5L)),
      // unsorted file, no explicit file sequence: ADDED inherits
      ManifestEntry(ManifestEntryStatus.Added, 900L, 4L,
        df("/w/t/data/u.parquet", Seq(2))))
    val bytes = AvroManifests.writeManifest(entries, spec, schema,
      FileContent.Data, formatVersion = 2)
    val mf = ManifestFile("/w/t/metadata/m2.avro", bytes.length, 0, 0,
      addedSnapshotId = 900L, minSequenceNumber = 3L, addedFilesCount = 1,
      existingFilesCount = 1, deletedFilesCount = 0, addedRowsCount = 10L,
      sequenceNumber = Some(4L))
    val back = AvroManifests.readEntries(bytes, mf)
    assert(back.head.file.sortOrderId === Some(2))
    assert(back.head.fileSequence === 5L) // preserved, distinct from data seq 3
    assert(back(1).file.sortOrderId === None)
    assert(back(1).fileSequence === 4L) // written as data sequence
  }

  test("manifest round-trip: delete manifest with equality ids and DV fields") {
    val spec = PartitionSpec(0, Nil)
    val eqDel = df("/w/t/data/eq.parquet", Nil,
      content = FileContent.EqualityDeletes, eqIds = Seq(2, 6))
    val dv = df("/w/t/data/dv.puffin", Nil, content = FileContent.PositionDeletes)
      .copy(contentOffset = Some(4L), contentSizeInBytes = Some(96L),
        firstRowId = None)
    val entries = Seq(
      ManifestEntry(ManifestEntryStatus.Added, 1L, 1L, eqDel),
      ManifestEntry(ManifestEntryStatus.Added, 1L, 1L, dv))
    val bytes = AvroManifests.writeManifest(entries, spec, schema,
      FileContent.PositionDeletes, formatVersion = 3)
    val mf = ManifestFile("/w/t/metadata/m2.avro", bytes.length, 0, 1,
      addedSnapshotId = 1L, minSequenceNumber = 1L, addedFilesCount = 2,
      existingFilesCount = 0, deletedFilesCount = 0, addedRowsCount = 20L)
    val back = AvroManifests.readEntries(bytes, mf)
    assert(back.map(_.file.equalityIds) === Seq(Seq(2, 6), Nil))
    assert(back.map(_.file.content) === Seq(2, 1))
    assert(back(1).file.contentOffset === Some(4L))
    assert(back(1).file.contentSizeInBytes === Some(96L))
    assert(back.head.file.referencedDataFile === None)
    assert(back(1).file.referencedDataFile === Some("/w/t/data/ref.parquet"))
  }

  test("v2 inheritance: null snapshot/sequence inherit from the list entry") {
    // hand-build a manifest whose ADDED entry omits snapshot_id and
    // sequence_number — readers must inherit both from the manifest-list
    // entry (spec v2 "Sequence Number Inheritance")
    val avro = AvroManifests.entrySchema(GStruct(Nil), formatVersion = 2)
    val dfSchema = avro.getField("data_file").schema()
    val r = new GenericData.Record(avro)
    r.put("status", ManifestEntryStatus.Added)
    val d = new GenericData.Record(dfSchema)
    d.put("content", 0)
    d.put("file_path", "/w/t/data/x.parquet")
    d.put("file_format", "PARQUET")
    d.put("partition", new GenericData.Record(dfSchema.getField("partition").schema()))
    d.put("record_count", 5L)
    d.put("file_size_in_bytes", 55L)
    r.put("data_file", d)
    val out = new java.io.ByteArrayOutputStream()
    val w = new ADataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avro))
    w.create(avro, out)
    w.append(r)
    w.close()
    val mf = ManifestFile("/w/t/metadata/m3.avro", 1L, 0, 0,
      addedSnapshotId = 777L, minSequenceNumber = 9L, addedFilesCount = 1,
      existingFilesCount = 0, deletedFilesCount = 0, addedRowsCount = 5L,
      sequenceNumber = Some(12L))
    val back = AvroManifests.readEntries(out.toByteArray, mf)
    assert(back.head.snapshotId === 777L)       // inherited added_snapshot_id
    assert(back.head.dataSequenceNumber === 12L) // inherited sequence_number
    // format is normalized to lowercase like the JSON path stores it
    assert(back.head.file.format === "parquet")
  }

  test("manifest list round-trip: counts, summaries, key metadata") {
    val partTypes: Int => Seq[GType] = { case 0 => Seq(GInt, GString); case _ => Nil }
    val summaries = Seq(
      FieldSummary(containsNull = true, containsNan = false,
        lower = Some(3), upper = Some(88)),
      FieldSummary(containsNull = false, containsNan = false,
        lower = Some("alpha"), upper = Some("omega")))
    val mfs = Seq(
      ManifestFile("/w/t/metadata/m1.avro", 2048L, 0, 0,
        addedSnapshotId = 11L, minSequenceNumber = 2L, addedFilesCount = 3,
        existingFilesCount = 1, deletedFilesCount = 2, addedRowsCount = 300L,
        partitionSummaries = summaries, existingRowsCount = 40L,
        deletedRowsCount = 7L, sequenceNumber = Some(5L),
        keyMetadata = Some(java.util.Base64.getEncoder.encodeToString(
          Array[Byte](9, 8, 7)))),
      ManifestFile("/w/t/metadata/m2.avro", 99L, 1, 1,
        addedSnapshotId = 12L, minSequenceNumber = 3L, addedFilesCount = 1,
        existingFilesCount = 0, deletedFilesCount = 0, addedRowsCount = 4L))
    val bytes = AvroManifests.writeList(mfs, formatVersion = 2, partTypes)
    assert(AvroManifests.isAvro(bytes))
    val back = AvroManifests.readList(bytes)
    assert(back.size === 2)
    val m1 = back.head
    assert(m1.path === "/w/t/metadata/m1.avro")
    assert(m1.length === 2048L)
    assert(m1.specId === 0)
    assert(m1.content === 0)
    assert(m1.addedSnapshotId === 11L)
    assert(m1.minSequenceNumber === 2L)
    assert((m1.addedFilesCount, m1.existingFilesCount, m1.deletedFilesCount) === ((3, 1, 2)))
    assert((m1.addedRowsCount, m1.existingRowsCount, m1.deletedRowsCount) === ((300L, 40L, 7L)))
    assert(m1.sequenceNumber === Some(5L))
    assert(m1.keyMetadata === mfs.head.keyMetadata)
    // summaries come back raw (Appendix D bytes); adapt decodes them
    // against the partition types at pruning time
    val s1 = m1.partitionSummaries
    assert(s1.map(_.containsNull) === Seq(true, false))
    assert(SingleValue.adapt(GInt, s1.head.lower.get) === 3)
    assert(SingleValue.adapt(GInt, s1.head.upper.get) === 88)
    assert(SingleValue.adapt(GString, s1(1).lower.get) === "alpha")
    assert(SingleValue.adapt(GString, s1(1).upper.get) === "omega")
    assert(back(1).content === 1)
    assert(back(1).partitionSummaries === Nil)
  }

  test("avro-read summaries re-serialize: raw bytes pass through writeList") {
    val partTypes: Int => Seq[GType] = _ => Seq(GLong)
    val mfs = Seq(ManifestFile("/w/t/metadata/m.avro", 10L, 0, 0,
      addedSnapshotId = 1L, minSequenceNumber = 1L, addedFilesCount = 1,
      existingFilesCount = 0, deletedFilesCount = 0, addedRowsCount = 1L,
      partitionSummaries = Seq(FieldSummary(containsNull = false,
        lower = Some(7L), upper = Some(900L)))))
    val once = AvroManifests.readList(AvroManifests.writeList(mfs, 2, partTypes))
    // bounds are now Array[Byte]; a second write must NOT double-encode
    val twice = AvroManifests.readList(AvroManifests.writeList(once, 2, partTypes))
    val s = twice.head.partitionSummaries.head
    assert(SingleValue.adapt(GLong, s.lower.get) === 7L)
    assert(SingleValue.adapt(GLong, s.upper.get) === 900L)
  }

  test("JSON and Avro paths agree through ManifestIO sniffing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-io").toString
    val spec = PartitionSpec(0, Seq(PartitionField(2, 1000, "i", IdentityT)))
    val entries = Seq(
      ManifestEntry(ManifestEntryStatus.Added, 50L, 6L, df(s"$dir/data/a.parquet", Seq(1))),
      ManifestEntry(ManifestEntryStatus.Added, 50L, 6L, df(s"$dir/data/b.parquet", Seq(2))))
    val mJson = ManifestIO.write(s"$dir/metadata/mj.json", entries, 0,
      FileContent.Data, spec, schema, 50L)
    val mAvro = ManifestIO.write(s"$dir/metadata/ma.avro", entries, 0,
      FileContent.Data, spec, schema, 50L, avro = true)
    // list-entry summaries identical regardless of entry encoding
    assert(mJson.partitionSummaries === mAvro.partitionSummaries)
    assert(mJson.addedFilesCount === mAvro.addedFilesCount)
    assert(mJson.addedRowsCount === mAvro.addedRowsCount)
    assert(mJson.sequenceNumber === mAvro.sequenceNumber)
    val ej = ManifestIO.readEntries(mJson)
    val ea = ManifestIO.readEntries(mAvro)
    ej.zip(ea).foreach { case (j, a) =>
      assert(j.status === a.status)
      assert(j.snapshotId === a.snapshotId)
      assert(j.dataSequenceNumber === a.dataSequenceNumber)
      assert(j.file.path.replace("/mj", "/ma") ===
        a.file.path.replace("/mj", "/ma"))
      assert(j.file.partition === a.file.partition)
      assert(j.writeSchemaId === a.writeSchemaId)
      assertStatsEqual(j.file.columnStats, a.file.columnStats)
    }
    // a JSON and an Avro list round-trip identically through readList
    val listJ = s"$dir/metadata/snap-1.json"
    val listA = s"$dir/metadata/snap-2.avro"
    ManifestIO.writeList(listJ, Seq(mJson, mAvro))
    ManifestIO.writeList(listA, Seq(mJson, mAvro), avro = true,
      partTypes = _ => Seq(GInt))
    val lj = ManifestIO.readList(listJ)
    val la = ManifestIO.readList(listA)
    assert(lj.map(_.path) === la.map(_.path))
    assert(lj.map(_.addedFilesCount) === la.map(_.addedFilesCount))
    assert(lj.map(_.minSequenceNumber) === la.map(_.minSequenceNumber))
  }

  test("mixed-spec or short-tuple entries fall back to JSON encoding") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-fb").toString
    val spec = PartitionSpec(0, Seq(PartitionField(2, 1000, "i", IdentityT)))
    // short (global-delete) tuple under a partitioned spec: avro=true must
    // still produce a readable manifest (JSON-lines fallback)
    val entries = Seq(
      ManifestEntry(ManifestEntryStatus.Added, 1L, 1L, df(s"$dir/data/g.parquet", Nil,
        content = FileContent.PositionDeletes)))
    val m = ManifestIO.write(s"$dir/metadata/fb.avro", entries, 0,
      FileContent.PositionDeletes, spec, schema, 1L, avro = true)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/metadata/fb.avro"))
    assert(!AvroManifests.isAvro(bytes)) // fell back
    val back = ManifestIO.readEntries(m)
    assert(back.head.file.partition === Nil)
  }
}
