package graft.core.meta

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericFixed, GenericRecord}

import graft.core.expr.{ColStats, PartitionField, PartitionSpec}
import graft.core.transform.Transform
import graft.core.types._

/** Binary single-value serialization (reference format/spec.md Appendix D):
  * how manifest stats bounds and partition summaries are encoded in the
  * spec's Avro metadata files. Little-endian fixed-width numerics, UTF-8
  * strings, minimal two's-complement big-endian decimals. */
object SingleValue {
  private def le(n: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(n).array()
  private def le(n: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(n).array()

  /** None when the type/value combination has no spec encoding. */
  def toBytes(t: GType, v: Any): Option[Array[Byte]] = (t, v) match {
    case (_, null)                => None
    case (GBoolean, b: Boolean)   => Some(Array(if (b) 1.toByte else 0.toByte))
    case (GInt | GDate, i)        => Some(le(TypeComparators.anyToInt(i)))
    case (GLong | GTimestamp(_) | GTimestampNs(_) | GTime, l) =>
      Some(le(TypeComparators.anyToLong(l)))
    case (GFloat, f: Float)       => Some(ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putFloat(f).array())
    case (GDouble, d)             => Some(ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putDouble(TypeComparators.anyToDouble(d)).array())
    case (GString, s: String)     => Some(s.getBytes(StandardCharsets.UTF_8))
    case (GDecimal(_, _), d: java.math.BigDecimal) =>
      Some(d.unscaledValue().toByteArray) // minimal two's-complement, big-endian
    case (GBinary | GUuid | GGeometry(_) | GGeography(_, _), b: Array[Byte]) => Some(b)
    case _                        => None
  }

  def fromBytes(t: GType, b: Array[Byte]): Any = t match {
    case GBoolean           => b.nonEmpty && b(0) != 0
    case GInt | GDate       =>
      ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    case GLong | GTimestamp(_) | GTimestampNs(_) | GTime =>
      ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    case GFloat             =>
      ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getFloat
    case GDouble            =>
      ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble
    case GString            => new String(b, StandardCharsets.UTF_8)
    case GDecimal(_, s)     =>
      new java.math.BigDecimal(new java.math.BigInteger(b), s)
    case _                  => b // binary, uuid, fixed, geo: raw bytes
  }

  /** Decode a bound that may still be raw spec bytes (Avro-read manifest
    * lists keep summaries undecoded because the partition types are only
    * known at pruning time). JSON-read bounds are already typed and pass
    * through; binary-typed fields pass through either way. */
  def adapt(t: GType, v: Any): Any = v match {
    case b: Array[Byte] if t != GBinary && t != GUuid &&
      !t.isInstanceOf[GGeometry] && !t.isInstanceOf[GGeography] =>
      fromBytes(t, b)
    case x => x
  }
}

/** Spec-dialect JSON for schemas and partition-spec field lists
  * (reference format/spec.md Appendix C) — the representation genuine
  * Iceberg metadata uses, and what Avro manifest headers must carry so
  * external readers can consume graft-written manifests. (Graft's own
  * metadata documents use MetaJson's explicit-tag dialect; MetaJson's
  * readers accept BOTH dialects.) */
object IcebergJson {
  import MetaJson.mapper

  def typeJson(t: GType): JsonNode = t match {
    case s: GStruct =>
      val o = mapper.createObjectNode()
      o.put("type", "struct")
      val arr = o.putArray("fields")
      s.fields.foreach { f =>
        val fo = arr.addObject()
        fo.put("id", f.id).put("name", f.name).put("required", f.required)
        fo.set[JsonNode]("type", typeJson(f.tpe))
      }
      o
    case l: GList =>
      val o = mapper.createObjectNode()
      o.put("type", "list").put("element-id", l.elementId)
        .put("element-required", l.elementRequired)
      o.set[JsonNode]("element", typeJson(l.elementType))
      o
    case m: GMap =>
      val o = mapper.createObjectNode()
      o.put("type", "map").put("key-id", m.keyId)
        .put("value-id", m.valueId).put("value-required", m.valueRequired)
      o.set[JsonNode]("key", typeJson(m.keyType))
      o.set[JsonNode]("value", typeJson(m.valueType))
      o
    case prim => mapper.getNodeFactory.textNode(SparkTypes.typeName(prim))
  }

  def schemaJson(s: GSchema): ObjectNode = {
    val o = typeJson(s.struct).asInstanceOf[ObjectNode]
    o.put("schema-id", s.schemaId)
    if (s.identifierFieldIds.nonEmpty) {
      val ids = o.putArray("identifier-field-ids")
      s.identifierFieldIds.toSeq.sorted.foreach(ids.add)
    }
    o
  }

  /** only the fields array — the `partition-spec` Avro header form */
  def specFieldsJson(spec: PartitionSpec): ArrayNode = {
    val arr = mapper.createArrayNode()
    spec.fields.foreach { f =>
      arr.addObject()
        .put("name", f.name)
        .put("transform", f.transform.name)
        .put("source-id", f.sourceId)
        .put("field-id", f.fieldId)
    }
    arr
  }
}

/** Spec-Avro manifest and manifest-list I/O (reference format/spec.md
  * "Manifests" / "Manifest Lists"; reference core ManifestReader.java,
  * ManifestLists.java, ManifestWriter.java, avro/). This is the
  * interop layer: it reads metadata trees written by apache/iceberg and
  * writes trees external Iceberg readers can consume. Field names and
  * ids follow the spec tables verbatim (manifest_file 500-520,
  * manifest_entry 0-4, data_file 100-145); maps use the array<k,v>
  * representation with logicalType `map` as the spec prescribes for
  * non-string keys. */
object AvroManifests {
  import MetaJson.mapper

  def isAvro(bytes: Array[Byte]): Boolean =
    bytes.length > 4 && bytes(0) == 'O'.toByte && bytes(1) == 'b'.toByte &&
      bytes(2) == 'j'.toByte && bytes(3) == 1.toByte

  // ------------------------------------------------------------ helpers

  private def bytesOf(bb: ByteBuffer): Array[Byte] = {
    val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
  }

  /** Avro generic value → graft internal value. The expected type only
    * disambiguates fixed/bytes (decimal scale); everything else maps 1:1
    * (date→int days, timestamp→long micros per Appendix A). */
  private def internal(v: Any, expected: Option[GType]): Any = v match {
    case null                           => null
    case u: org.apache.avro.util.Utf8   => u.toString
    case s: String                      => s
    case bb: ByteBuffer                 =>
      expected match {
        case Some(GDecimal(_, s)) =>
          new java.math.BigDecimal(new java.math.BigInteger(bytesOf(bb)), s)
        case _ => bytesOf(bb)
      }
    case f: GenericFixed                =>
      expected match {
        case Some(GDecimal(_, s)) =>
          new java.math.BigDecimal(new java.math.BigInteger(f.bytes()), s)
        case _ => f.bytes()
      }
    case other                          => other
  }

  /** spec maps: either Avro map (string keys) or array of {key, value}
    * records (the required form for int keys) */
  private def pairs(v: Any): Seq[(Any, Any)] = v match {
    case null => Nil
    case m: java.util.Map[_, _] =>
      m.asScala.toSeq.map { case (k, vv) => (k: Any, vv: Any) }
    case c: java.util.Collection[_] =>
      c.asScala.toSeq.map { case r: GenericRecord => (r.get("key"), r.get("value")) }
    case other => throw new IllegalArgumentException(s"not a spec map: $other")
  }

  private def intKey(k: Any): Int = k match {
    case i: java.lang.Integer => i.intValue()
    case l: java.lang.Long    => l.intValue()
    case u: org.apache.avro.util.Utf8 => u.toString.toInt
    case s: String            => s.toInt
  }

  private def longMap(v: Any): Map[Int, Long] =
    pairs(v).map { case (k, vv) => intKey(k) -> vv.asInstanceOf[java.lang.Long].longValue() }.toMap

  private def bytesMap(v: Any): Map[Int, Array[Byte]] =
    pairs(v).map { case (k, vv) =>
      intKey(k) -> (vv match {
        case bb: ByteBuffer => bytesOf(bb)
        case f: GenericFixed => f.bytes()
      })
    }.toMap

  private def optLong(v: Any): Option[Long] =
    Option(v).map(x => x.asInstanceOf[java.lang.Long].longValue())
  private def optInt(v: Any): Option[Int] =
    Option(v).map(x => x.asInstanceOf[java.lang.Integer].intValue())
  private def str(v: Any): String = v match {
    case u: org.apache.avro.util.Utf8 => u.toString
    case s: String => s
  }

  /** first present field among spec spellings (v1 lists use
    * added_data_files_count etc., v2+ added_files_count) */
  private def field(r: GenericRecord, names: String*): Any =
    names.collectFirst {
      case n if r.getSchema.getField(n) != null => r.get(n)
    }.orNull

  private def records(bytes: Array[Byte]): (Seq[GenericRecord], DataFileStream[GenericRecord]) = {
    val reader = new DataFileStream[GenericRecord](
      new ByteArrayInputStream(bytes), new GenericDatumReader[GenericRecord]())
    val buf = Seq.newBuilder[GenericRecord]
    while (reader.hasNext) buf += reader.next()
    (buf.result(), reader)
  }

  // ------------------------------------------------------------ reading

  /** manifest list bytes → ManifestFile entries. Partition-summary
    * bounds stay RAW (Array[Byte]); the manifest evaluator decodes them
    * against the spec's partition types via SingleValue.adapt. */
  def readList(bytes: Array[Byte]): Seq[ManifestFile] = {
    val (rs, reader) = records(bytes)
    try rs.map { r =>
      val summaries = field(r, "partitions") match {
        case null => Nil
        case c: java.util.Collection[_] => c.asScala.toSeq.map {
          case s: GenericRecord =>
            FieldSummary(
              containsNull = s.get("contains_null").asInstanceOf[Boolean],
              containsNan = Option(field(s, "contains_nan"))
                .exists(_.asInstanceOf[Boolean]),
              lower = Option(field(s, "lower_bound")).map(internal(_, None)),
              upper = Option(field(s, "upper_bound")).map(internal(_, None)))
        }
      }
      ManifestFile(
        path = str(r.get("manifest_path")),
        length = r.get("manifest_length").asInstanceOf[Long],
        specId = r.get("partition_spec_id").asInstanceOf[Int],
        content = optInt(field(r, "content")).getOrElse(0),
        addedSnapshotId = r.get("added_snapshot_id").asInstanceOf[Long],
        minSequenceNumber = optLong(field(r, "min_sequence_number")).getOrElse(0L),
        // spec: null counts mean "assumed non-zero" — 1 keeps the
        // manifest live without claiming a precise count
        addedFilesCount = optInt(field(r, "added_files_count",
          "added_data_files_count")).getOrElse(1),
        existingFilesCount = optInt(field(r, "existing_files_count",
          "existing_data_files_count")).getOrElse(1),
        deletedFilesCount = optInt(field(r, "deleted_files_count",
          "deleted_data_files_count")).getOrElse(0),
        addedRowsCount = optLong(field(r, "added_rows_count",
          "added_data_rows_count")).getOrElse(0L),
        partitionSummaries = summaries,
        // -1 = unknown (same convention as pre-field JSON manifests):
        // totals computations skip rather than undercount
        existingRowsCount = optLong(field(r, "existing_rows_count",
          "existing_data_rows_count")).getOrElse(-1L),
        deletedRowsCount = optLong(field(r, "deleted_rows_count",
          "deleted_data_rows_count")).getOrElse(0L),
        keyMetadata = Option(field(r, "key_metadata"))
          .map(b => Base64.getEncoder.encodeToString(internal(b, None).asInstanceOf[Array[Byte]])),
        sequenceNumber = optLong(field(r, "sequence_number")))
    } finally reader.close()
  }

  /** manifest bytes → entries. The header's `schema` gives the
    * write-time types for decoding stats bounds; `schema-id` recovers
    * writeSchemaId for entries ADDED by this manifest (carried Existing
    * entries keep None and resolve through the snapshot-schema
    * fallback, matching what the stamp rule in ManifestIO.write does). */
  def readEntries(bytes: Array[Byte], m: ManifestFile): Seq[ManifestEntry] = {
    val reader = new DataFileStream[GenericRecord](
      new ByteArrayInputStream(bytes), new GenericDatumReader[GenericRecord]())
    try {
      val writeSchema = Option(reader.getMetaString("schema"))
        .map(js => MetaJson.readSchema(mapper.readTree(js)))
      val headerSchemaId = Option(reader.getMetaString("schema-id"))
        .flatMap(_.toIntOption).orElse(writeSchema.map(_.schemaId))
      val specId = Option(reader.getMetaString("partition-spec-id"))
        .flatMap(_.toIntOption).getOrElse(m.specId)
      // partition tuple types: spec-field transforms over write-schema
      // source types, in header `partition-spec` order (= r102 order)
      val partTypes: Seq[Option[GType]] =
        Option(reader.getMetaString("partition-spec")).map { js =>
          val fields = mapper.readTree(js)
          val buf = Seq.newBuilder[Option[GType]]
          fields.elements().forEachRemaining { f =>
            buf += (for {
              ws <- writeSchema
              sid <- Option(f.get("source-id")).map(_.asInt())
              src <- ws.byId.get(sid)
              tr <- scala.util.Try(Transform.fromName(f.get("transform").asText())).toOption
            } yield tr.resultType(src.tpe))
          }
          buf.result()
        }.getOrElse(Nil)

      val out = Seq.newBuilder[ManifestEntry]
      while (reader.hasNext) {
        val r = reader.next()
        val status = r.get("status").asInstanceOf[Int]
        val snapId = optLong(field(r, "snapshot_id")).getOrElse(m.addedSnapshotId)
        // v2 inheritance: null sequence on an ADDED entry inherits the
        // manifest's own sequence number from the list entry
        val seq = optLong(field(r, "sequence_number")).getOrElse(
          if (status == ManifestEntryStatus.Added)
            m.sequenceNumber.getOrElse(m.minSequenceNumber)
          else 0L)
        // spec entry field 4: null on an ADDED entry inherits the
        // manifest's sequence, same rule as the data sequence above
        val fileSeq = optLong(field(r, "file_sequence_number")).orElse(
          if (status == ManifestEntryStatus.Added)
            Some(m.sequenceNumber.getOrElse(m.minSequenceNumber))
          else None)
        val df = r.get("data_file").asInstanceOf[GenericRecord]
        val partition: Seq[Any] = df.get("partition") match {
          case null => Nil
          case p: GenericRecord =>
            p.getSchema.getFields.asScala.toSeq.zipWithIndex.map { case (f, i) =>
              internal(p.get(f.pos()), partTypes.lift(i).flatten)
            }
        }
        val colSizes = longMap(field(df, "column_sizes"))
        val valueCounts = longMap(field(df, "value_counts"))
        val nullCounts = longMap(field(df, "null_value_counts"))
        val nanCounts = longMap(field(df, "nan_value_counts"))
        def decode(id: Int, b: Array[Byte]): Option[Any] =
          writeSchema.flatMap(_.byId.get(id))
            .map(f => SingleValue.fromBytes(f.tpe, b))
        val lowers = bytesMap(field(df, "lower_bounds"))
          .flatMap { case (id, b) => decode(id, b).map(id -> _) }
        val uppers = bytesMap(field(df, "upper_bounds"))
          .flatMap { case (id, b) => decode(id, b).map(id -> _) }
        val statIds = valueCounts.keySet ++ nullCounts.keySet ++
          nanCounts.keySet ++ lowers.keySet ++ uppers.keySet ++
          colSizes.keySet
        val stats = statIds.map(id => id -> ColStats(
          valueCounts.get(id), nullCounts.get(id), nanCounts.get(id),
          lowers.get(id), uppers.get(id), colSizes.get(id))).toMap
        val eqIds = field(df, "equality_ids") match {
          case null => Nil
          case c: java.util.Collection[_] =>
            c.asScala.toSeq.map(_.asInstanceOf[java.lang.Integer].intValue())
        }
        val added = status == ManifestEntryStatus.Added &&
          snapId == m.addedSnapshotId
        out += ManifestEntry(
          status = status, snapshotId = snapId, dataSequenceNumber = seq,
          file = DataFile(
            path = str(df.get("file_path")),
            format = str(df.get("file_format")).toLowerCase,
            specId = specId,
            partition = partition,
            recordCount = df.get("record_count").asInstanceOf[Long],
            fileSizeBytes = df.get("file_size_in_bytes").asInstanceOf[Long],
            columnStats = stats,
            content = optInt(field(df, "content")).getOrElse(FileContent.Data),
            equalityIds = eqIds,
            referencedDataFile = Option(field(df, "referenced_data_file")).map(str),
            contentOffset = optLong(field(df, "content_offset")),
            contentSizeInBytes = optLong(field(df, "content_size_in_bytes")),
            firstRowId = optLong(field(df, "first_row_id")),
            splitOffsets = field(df, "split_offsets") match {
              case null => Nil
              case c: java.util.Collection[_] =>
                c.asScala.toSeq.map(_.asInstanceOf[java.lang.Long].longValue())
            },
            sortOrderId = optInt(field(df, "sort_order_id"))),
          writeSchemaId = if (added) headerSchemaId else None,
          fileSequenceNumber = fileSeq)
      }
      out.result()
    } finally reader.close()
  }

  // ------------------------------------------------------------ writing

  private def minDecimalBytes(precision: Int): Int = {
    // minimum bytes for a two's-complement value of `precision` digits
    java.math.BigInteger.TEN.pow(precision)
      .subtract(java.math.BigInteger.ONE).bitLength() / 8 + 1
  }

  /** Avro schema JSON for a partition value type (Appendix A mappings) */
  private def avroTypeJson(t: GType, fieldId: Int): JsonNode = t match {
    case GBoolean => mapper.getNodeFactory.textNode("boolean")
    case GInt     => mapper.getNodeFactory.textNode("int")
    case GLong    => mapper.getNodeFactory.textNode("long")
    case GFloat   => mapper.getNodeFactory.textNode("float")
    case GDouble  => mapper.getNodeFactory.textNode("double")
    case GString  => mapper.getNodeFactory.textNode("string")
    case GBinary | GGeometry(_) | GGeography(_, _) =>
      mapper.getNodeFactory.textNode("bytes")
    case GDate =>
      mapper.createObjectNode().put("type", "int").put("logicalType", "date")
    case GTime =>
      mapper.createObjectNode().put("type", "long").put("logicalType", "time-micros")
    case GTimestamp(withoutZone) =>
      mapper.createObjectNode().put("type", "long")
        .put("logicalType", "timestamp-micros").put("adjust-to-utc", !withoutZone)
    case GTimestampNs(withoutZone) =>
      mapper.createObjectNode().put("type", "long")
        .put("logicalType", "timestamp-nanos").put("adjust-to-utc", !withoutZone)
    case GDecimal(p, s) =>
      mapper.createObjectNode().put("type", "fixed").put("name", s"decimal_$fieldId")
        .put("size", minDecimalBytes(p)).put("logicalType", "decimal")
        .put("precision", p).put("scale", s)
    case GUuid =>
      mapper.createObjectNode().put("type", "fixed").put("name", s"uuid_$fieldId")
        .put("size", 16).put("logicalType", "uuid")
    case other => throw new IllegalArgumentException(
      s"cannot store $other in an Avro partition tuple")
  }

  private def optField(o: ObjectNode, name: String, tpe: JsonNode, id: Int): Unit = {
    val f = o.withArray("fields").addObject()
    f.put("name", name)
    val u = f.putArray("type"); u.add("null"); u.add(tpe)
    f.putNull("default")
    f.put("field-id", id)
  }
  private def optField(o: ObjectNode, name: String, tpe: String, id: Int): Unit =
    optField(o, name, mapper.getNodeFactory.textNode(tpe), id)
  private def reqField(o: ObjectNode, name: String, tpe: JsonNode, id: Int): Unit = {
    val f = o.withArray("fields").addObject()
    f.put("name", name)
    f.set[JsonNode]("type", tpe)
    f.put("field-id", id)
  }
  private def reqField(o: ObjectNode, name: String, tpe: String, id: Int): Unit =
    reqField(o, name, mapper.getNodeFactory.textNode(tpe), id)

  /** array-of-{key,value}-records map with logicalType `map` — the spec's
    * required representation for int-keyed maps */
  private def kvMapJson(name: String, keyId: Int, valueId: Int,
      valueType: String): JsonNode = {
    val o = mapper.createObjectNode()
    o.put("type", "array").put("logicalType", "map")
    val items = o.putObject("items")
    items.put("type", "record").put("name", name)
    val fs = items.putArray("fields")
    fs.addObject().put("name", "key").put("type", "int").put("field-id", keyId)
    fs.addObject().put("name", "value").put("type", valueType).put("field-id", valueId)
    o
  }

  private def fieldSummarySchemaJson: JsonNode = {
    val o = mapper.createObjectNode()
    o.put("type", "array")
    val items = o.putObject("items")
    items.put("type", "record").put("name", "r508")
    items.putArray("fields")
    reqField(items, "contains_null", "boolean", 509)
    optField(items, "contains_nan", "boolean", 518)
    optField(items, "lower_bound", "bytes", 510)
    optField(items, "upper_bound", "bytes", 511)
    o.put("element-id", 508)
    o
  }

  /** the manifest_file record schema (spec manifest-list table) */
  private[meta] def listSchema(formatVersion: Int): Schema = {
    val o = mapper.createObjectNode()
    o.put("type", "record").put("name", "manifest_file")
    o.putArray("fields")
    reqField(o, "manifest_path", "string", 500)
    reqField(o, "manifest_length", "long", 501)
    reqField(o, "partition_spec_id", "int", 502)
    reqField(o, "content", "int", 517)
    reqField(o, "sequence_number", "long", 515)
    reqField(o, "min_sequence_number", "long", 516)
    reqField(o, "added_snapshot_id", "long", 503)
    reqField(o, "added_files_count", "int", 504)
    reqField(o, "existing_files_count", "int", 505)
    reqField(o, "deleted_files_count", "int", 506)
    reqField(o, "added_rows_count", "long", 512)
    reqField(o, "existing_rows_count", "long", 513)
    reqField(o, "deleted_rows_count", "long", 514)
    optField(o, "partitions", fieldSummarySchemaJson, 507)
    optField(o, "key_metadata", "bytes", 519)
    if (formatVersion >= 3) optField(o, "first_row_id", "long", 520)
    new Schema.Parser().parse(o.toString)
  }

  /** the manifest_entry record schema for a given partition type */
  private[meta] def entrySchema(partType: GStruct, formatVersion: Int): Schema = {
    val df = mapper.createObjectNode()
    df.put("type", "record").put("name", "r2")
    df.putArray("fields")
    reqField(df, "content", "int", 134)
    reqField(df, "file_path", "string", 100)
    reqField(df, "file_format", "string", 101)
    val part = mapper.createObjectNode()
    part.put("type", "record").put("name", "r102")
    part.putArray("fields")
    partType.fields.foreach(f => optField(part, f.name, avroTypeJson(f.tpe, f.id), f.id))
    reqField(df, "partition", part, 102)
    reqField(df, "record_count", "long", 103)
    reqField(df, "file_size_in_bytes", "long", 104)
    optField(df, "column_sizes", kvMapJson("k117_v118", 117, 118, "long"), 108)
    optField(df, "value_counts", kvMapJson("k119_v120", 119, 120, "long"), 109)
    optField(df, "null_value_counts", kvMapJson("k121_v122", 121, 122, "long"), 110)
    optField(df, "nan_value_counts", kvMapJson("k138_v139", 138, 139, "long"), 137)
    optField(df, "lower_bounds", kvMapJson("k126_v127", 126, 127, "bytes"), 125)
    optField(df, "upper_bounds", kvMapJson("k129_v130", 129, 130, "bytes"), 128)
    optField(df, "key_metadata", "bytes", 131)
    optField(df, "split_offsets", {
      val a = mapper.createObjectNode()
      a.put("type", "array").put("items", "long").put("element-id", 133); a
    }, 132)
    optField(df, "equality_ids", {
      val a = mapper.createObjectNode()
      a.put("type", "array").put("items", "int").put("element-id", 136); a
    }, 135)
    optField(df, "sort_order_id", "int", 140)
    if (formatVersion >= 3) optField(df, "first_row_id", "long", 142)
    optField(df, "referenced_data_file", "string", 143)
    if (formatVersion >= 3) {
      optField(df, "content_offset", "long", 144)
      optField(df, "content_size_in_bytes", "long", 145)
    }
    val o = mapper.createObjectNode()
    o.put("type", "record").put("name", "manifest_entry")
    o.putArray("fields")
    reqField(o, "status", "int", 0)
    optField(o, "snapshot_id", "long", 1)
    optField(o, "sequence_number", "long", 3)
    optField(o, "file_sequence_number", "long", 4)
    reqField(o, "data_file", df, 2)
    new Schema.Parser().parse(o.toString)
  }

  private def toAvro(v: Any, schema: Schema): Any = {
    // unwrap optional unions to the non-null branch
    val s = if (schema.getType == Schema.Type.UNION)
      schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else schema
    v match {
      case null            => null
      case b: Array[Byte]  =>
        if (s.getType == Schema.Type.FIXED) new GenericData.Fixed(s, b)
        else ByteBuffer.wrap(b)
      case d: java.math.BigDecimal =>
        val unscaled = d.unscaledValue().toByteArray
        val size = s.getFixedSize
        val out = new Array[Byte](size)
        // sign-extend into the fixed width
        val pad: Byte = if (d.signum() < 0) 0xFF.toByte else 0x00.toByte
        java.util.Arrays.fill(out, pad)
        System.arraycopy(unscaled, 0, out, size - unscaled.length, unscaled.length)
        new GenericData.Fixed(s, out)
      case other => other
    }
  }

  private def kvArray(schema: Schema, m: Map[Int, _]): GenericData.Array[GenericRecord] = {
    val arrSchema = schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    val itemSchema = arrSchema.getElementType
    val arr = new GenericData.Array[GenericRecord](m.size, arrSchema)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val r = new GenericData.Record(itemSchema)
      r.put("key", k)
      r.put("value", toAvro(v, itemSchema.getField("value").schema()))
      arr.add(r)
    }
    arr
  }

  private def serialize(schema: Schema, meta: Map[String, String],
      rows: Seq[GenericRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.deflateCodec(1))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, out)
    rows.foreach(w.append)
    w.close()
    out.toByteArray
  }

  /** manifests → spec-Avro manifest-list bytes. `partTypes` resolves a
    * spec id to its partition field types so the summary bounds can be
    * encoded with Appendix D (their type is "the type of the partition
    * field data"); summaries whose arity doesn't match their spec are
    * dropped (the manifest is then never pruned — conservative). */
  def writeList(manifests: Seq[ManifestFile], formatVersion: Int,
      partTypes: Int => Seq[GType]): Array[Byte] = {
    val schema = listSchema(formatVersion)
    val sumSchema = schema.getField("partitions").schema()
    val sumArr = sumSchema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    val sumItem = sumArr.getElementType
    val rows = manifests.map { m =>
      val r = new GenericData.Record(schema)
      r.put("manifest_path", m.path)
      r.put("manifest_length", m.length)
      r.put("partition_spec_id", m.specId)
      r.put("content", m.content)
      r.put("sequence_number", m.sequenceNumber.getOrElse(m.minSequenceNumber))
      r.put("min_sequence_number", m.minSequenceNumber)
      r.put("added_snapshot_id", m.addedSnapshotId)
      r.put("added_files_count", m.addedFilesCount)
      r.put("existing_files_count", m.existingFilesCount)
      r.put("deleted_files_count", m.deletedFilesCount)
      r.put("added_rows_count", m.addedRowsCount)
      r.put("existing_rows_count", math.max(0L, m.existingRowsCount))
      r.put("deleted_rows_count", m.deletedRowsCount)
      val types = scala.util.Try(partTypes(m.specId)).getOrElse(Nil)
      if (m.partitionSummaries.nonEmpty &&
          m.partitionSummaries.length == types.length) {
        // a bound may be a typed value (JSON-era manifest) or already the
        // raw spec bytes (Avro-read manifest carried over): encode the
        // former, pass the latter through
        def boundBytes(t: GType, v: Any): Option[Array[Byte]] = v match {
          case b: Array[Byte] if t != GBinary && t != GUuid &&
            !t.isInstanceOf[GGeometry] && !t.isInstanceOf[GGeography] => Some(b)
          case x => SingleValue.toBytes(t, x)
        }
        val arr = new GenericData.Array[GenericRecord](m.partitionSummaries.size, sumArr)
        m.partitionSummaries.zip(types).foreach { case (s, t) =>
          val sr = new GenericData.Record(sumItem)
          sr.put("contains_null", s.containsNull)
          sr.put("contains_nan", s.containsNan)
          s.lower.flatMap(boundBytes(t, _)).foreach(b =>
            sr.put("lower_bound", ByteBuffer.wrap(b)))
          s.upper.flatMap(boundBytes(t, _)).foreach(b =>
            sr.put("upper_bound", ByteBuffer.wrap(b)))
          arr.add(sr)
        }
        r.put("partitions", arr)
      }
      m.keyMetadata.foreach(km =>
        r.put("key_metadata", ByteBuffer.wrap(Base64.getDecoder.decode(km))))
      r
    }
    serialize(schema, Map("format-version" -> formatVersion.toString), rows)
  }

  /** entries → spec-Avro manifest bytes. `schema`/`spec` are the
    * write-time (current) table schema and the manifest's spec; they
    * populate the header the spec requires (schema, schema-id,
    * partition-spec, partition-spec-id, content, format-version). */
  def writeManifest(entries: Seq[ManifestEntry], spec: PartitionSpec,
      schema: GSchema, content: Int, formatVersion: Int): Array[Byte] = {
    val partType = spec.partitionType(schema)
    val avro = entrySchema(partType, formatVersion)
    val dfSchema = avro.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    val rows = entries.map { e =>
      val r = new GenericData.Record(avro)
      r.put("status", e.status)
      r.put("snapshot_id", e.snapshotId)
      r.put("sequence_number", e.dataSequenceNumber)
      r.put("file_sequence_number", e.fileSequence)
      val f = e.file
      val df = new GenericData.Record(dfSchema)
      df.put("content", f.content)
      df.put("file_path", f.path)
      df.put("file_format", f.format)
      val p = new GenericData.Record(partSchema)
      partType.fields.zipWithIndex.foreach { case (pf, i) =>
        // a shorter tuple (global deletes under a partitioned spec, or a
        // different-spec entry in a mixed manifest) leaves trailing nulls
        if (i < f.partition.length)
          p.put(pf.name, toAvro(f.partition(i), partSchema.getField(pf.name).schema()))
      }
      df.put("partition", p)
      df.put("record_count", f.recordCount)
      df.put("file_size_in_bytes", f.fileSizeBytes)
      val vc = f.columnStats.collect { case (id, st) if st.valueCount.isDefined => id -> st.valueCount.get }
      val nc = f.columnStats.collect { case (id, st) if st.nullCount.isDefined => id -> st.nullCount.get }
      val nanc = f.columnStats.collect { case (id, st) if st.nanCount.isDefined => id -> st.nanCount.get }
      def bounds(sel: ColStats => Option[Any]): Map[Int, Array[Byte]] =
        f.columnStats.flatMap { case (id, st) =>
          for {
            v <- sel(st)
            fld <- schema.byId.get(id)
            b <- SingleValue.toBytes(fld.tpe, v)
          } yield id -> b
        }
      val cs = f.columnStats.collect { case (id, st) if st.sizeBytes.isDefined => id -> st.sizeBytes.get }
      if (cs.nonEmpty) df.put("column_sizes", kvArray(dfSchema.getField("column_sizes").schema(), cs))
      if (vc.nonEmpty) df.put("value_counts", kvArray(dfSchema.getField("value_counts").schema(), vc))
      if (nc.nonEmpty) df.put("null_value_counts", kvArray(dfSchema.getField("null_value_counts").schema(), nc))
      if (nanc.nonEmpty) df.put("nan_value_counts", kvArray(dfSchema.getField("nan_value_counts").schema(), nanc))
      val lo = bounds(_.lower); val hi = bounds(_.upper)
      if (lo.nonEmpty) df.put("lower_bounds", kvArray(dfSchema.getField("lower_bounds").schema(), lo))
      if (hi.nonEmpty) df.put("upper_bounds", kvArray(dfSchema.getField("upper_bounds").schema(), hi))
      if (f.equalityIds.nonEmpty) {
        val eqSchema = dfSchema.getField("equality_ids").schema()
          .getTypes.asScala.find(_.getType != Schema.Type.NULL).get
        val arr = new GenericData.Array[Integer](f.equalityIds.size, eqSchema)
        f.equalityIds.foreach(id => arr.add(Int.box(id)))
        df.put("equality_ids", arr)
      }
      f.referencedDataFile.foreach(df.put("referenced_data_file", _))
      f.sortOrderId.foreach(id => df.put("sort_order_id", Int.box(id)))
      if (f.splitOffsets.nonEmpty) {
        val soSchema = dfSchema.getField("split_offsets").schema()
          .getTypes.asScala.find(_.getType != Schema.Type.NULL).get
        val arr = new GenericData.Array[java.lang.Long](f.splitOffsets.size, soSchema)
        f.splitOffsets.foreach(v => arr.add(Long.box(v)))
        df.put("split_offsets", arr)
      }
      if (formatVersion >= 3) {
        f.firstRowId.foreach(v => df.put("first_row_id", Long.box(v)))
        f.contentOffset.foreach(v => df.put("content_offset", Long.box(v)))
        f.contentSizeInBytes.foreach(v => df.put("content_size_in_bytes", Long.box(v)))
      }
      r.put("data_file", df)
      r
    }
    serialize(avro, Map(
      "schema" -> IcebergJson.schemaJson(schema).toString,
      "schema-id" -> schema.schemaId.toString,
      "partition-spec" -> IcebergJson.specFieldsJson(spec).toString,
      "partition-spec-id" -> spec.specId.toString,
      "format-version" -> formatVersion.toString,
      "content" -> (if (content == 0) "data" else "deletes")), rows)
  }
}
