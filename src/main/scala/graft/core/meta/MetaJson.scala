package graft.core.meta

import java.util.Base64

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.core.expr.{ColStats, PartitionField, PartitionSpec}
import graft.core.transform.Transform
import graft.core.types._

/** JSON (de)serialization for the metadata tree. Values (partition
  * tuples, stats bounds) are stored with a runtime type tag so entries
  * are self-contained: {"t":"long","v":123}. Jackson ships with Spark.
  */
object MetaJson {
  val mapper = new ObjectMapper()

  // ------------------------------------------------------------- values
  def writeValue(v: Any): JsonNode = {
    val o = mapper.createObjectNode()
    v match {
      case null                => o.put("t", "null")
      case b: Boolean          => o.put("t", "bool").put("v", b)
      case i: Int              => o.put("t", "int").put("v", i)
      case l: Long             => o.put("t", "long").put("v", l)
      case f: Float            => o.put("t", "float").put("v", f.toString)
      case d: Double           => o.put("t", "double").put("v", d.toString)
      case d: java.math.BigDecimal => o.put("t", "dec").put("v", d.toPlainString)
      case s: String           => o.put("t", "str").put("v", s)
      case b: Array[Byte]      => o.put("t", "bin").put("v", Base64.getEncoder.encodeToString(b))
      case other => throw new IllegalArgumentException(s"cannot serialize value: $other")
    }
    o
  }

  def readValue(n: JsonNode): Any = n.get("t").asText() match {
    case "null"   => null
    case "bool"   => n.get("v").asBoolean()
    case "int"    => n.get("v").asInt()
    case "long"   => n.get("v").asLong()
    case "float"  => n.get("v").asText().toFloat
    case "double" => n.get("v").asText().toDouble
    case "dec"    => new java.math.BigDecimal(n.get("v").asText())
    case "str"    => n.get("v").asText()
    case "bin"    => Base64.getDecoder.decode(n.get("v").asText())
    case other    => throw new IllegalArgumentException(s"unknown value tag: $other")
  }

  // ------------------------------------------------------------- schema
  def writeType(t: GType): JsonNode = t match {
    case s: GStruct =>
      val o = mapper.createObjectNode()
      o.put("type", "struct")
      val arr = o.putArray("fields")
      s.fields.foreach { f =>
        val fo = arr.addObject()
        fo.put("id", f.id).put("name", f.name).put("required", f.required)
        f.initialDefaultSql.foreach(fo.put("initial-default", _))
        f.writeDefaultSql.foreach(fo.put("write-default", _))
        fo.set[JsonNode]("ftype", writeType(f.tpe))
      }
      o
    case l: GList =>
      val o = mapper.createObjectNode()
      o.put("type", "list").put("element-id", l.elementId)
        .put("element-required", l.elementRequired)
      o.set[JsonNode]("element", writeType(l.elementType))
      o
    case m: GMap =>
      val o = mapper.createObjectNode()
      o.put("type", "map").put("key-id", m.keyId).put("value-id", m.valueId)
        .put("value-required", m.valueRequired)
      o.set[JsonNode]("key", writeType(m.keyType))
      o.set[JsonNode]("value", writeType(m.valueType))
      o
    case prim => mapper.getNodeFactory.textNode(SparkTypes.typeName(prim))
  }

  def readType(n: JsonNode): GType =
    if (n.isTextual) SparkTypes.typeFromName(n.asText())
    else n.get("type").asText() match {
      case "struct" =>
        val fields = n.get("fields").elements()
        val buf = Seq.newBuilder[GField]
        while (fields.hasNext) {
          val f = fields.next()
          // graft's dialect tags the field type "ftype" and stores
          // defaults as SQL text; the spec dialect (Appendix C — what
          // genuine Iceberg metadata and Avro manifest headers carry)
          // uses "type" and JSON single-values for defaults
          val graftDialect = f.has("ftype")
          def default(key: String): Option[String] =
            Option(f.get(key)).filterNot(_.isNull).flatMap { d =>
              if (graftDialect) Some(d.asText())
              else if (d.isTextual) Some("'" + d.asText().replace("'", "''") + "'")
              else if (d.isNumber || d.isBoolean) Some(d.asText())
              else None // structured spec defaults: no SQL equivalent
            }
          buf += GField(f.get("id").asInt(), f.get("name").asText(),
            readType(if (graftDialect) f.get("ftype") else f.get("type")),
            f.get("required").asBoolean(),
            default("initial-default"), default("write-default"))
        }
        GStruct(buf.result())
      case "list" =>
        GList(n.get("element-id").asInt(), readType(n.get("element")),
          n.get("element-required").asBoolean())
      case "map" =>
        GMap(n.get("key-id").asInt(), readType(n.get("key")),
          n.get("value-id").asInt(), readType(n.get("value")),
          n.get("value-required").asBoolean())
    }

  def writeSchema(s: GSchema): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("schema-id", s.schemaId)
    val ids = o.putArray("identifier-field-ids")
    s.identifierFieldIds.toSeq.sorted.foreach(ids.add)
    o.set[JsonNode]("struct", writeType(s.struct))
    o
  }

  def readSchema(n: JsonNode): GSchema = {
    val ids = Set.newBuilder[Int]
    Option(n.get("identifier-field-ids"))
      .foreach(_.elements().forEachRemaining(e => ids += e.asInt()))
    // graft dialect nests the root under "struct"; the spec dialect IS
    // the struct ({"type":"struct","schema-id":..,"fields":[..]})
    val root = Option(n.get("struct")).getOrElse(n)
    if (root.isObject && !root.has("type"))
      throw new IllegalArgumentException(
        s"Cannot parse type from json: missing type in $root")
    val struct = readType(root).asInstanceOf[GStruct]
    GSchema(struct,
      Option(n.get("schema-id")).map(_.asInt()).getOrElse(0), ids.result())
  }

  // ------------------------------------------------------------- spec
  def writeSpec(s: PartitionSpec): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("spec-id", s.specId)
    val arr = o.putArray("fields")
    s.fields.foreach { f =>
      arr.addObject()
        .put("source-id", f.sourceId)
        .put("field-id", f.fieldId)
        .put("name", f.name)
        .put("transform", f.transform.name)
    }
    o
  }

  def readSpec(n: JsonNode): PartitionSpec =
    PartitionSpec(n.get("spec-id").asInt(), readSpecFields(n.get("fields")))

  /** a bare partition-field array (spec Appendix C; also the Avro
    * manifest header's `partition-spec` and v1's `partition-spec`).
    * v1 fields may omit field-id — assigned 1000+position, matching the
    * reference's v1 assignment. */
  def readSpecFields(fields: JsonNode): Seq[PartitionField] = {
    val buf = Seq.newBuilder[PartitionField]
    var i = 0
    fields.elements().forEachRemaining { f =>
      buf += PartitionField(f.get("source-id").asInt(),
        Option(f.get("field-id")).map(_.asInt()).getOrElse(1000 + i),
        f.get("name").asText(), Transform.fromName(f.get("transform").asText()))
      i += 1
    }
    buf.result()
  }

  // ------------------------------------------------------------- stats
  def writeStats(stats: Map[Int, ColStats]): ObjectNode = {
    val o = mapper.createObjectNode()
    stats.foreach { case (id, st) =>
      val so = o.putObject(id.toString)
      st.valueCount.foreach(so.put("vc", _))
      st.nullCount.foreach(so.put("nc", _))
      st.nanCount.foreach(so.put("nan", _))
      st.lower.foreach(v => so.set[JsonNode]("lo", writeValue(v)))
      st.upper.foreach(v => so.set[JsonNode]("hi", writeValue(v)))
      st.sizeBytes.foreach(so.put("sz", _))
    }
    o
  }

  def readStats(n: JsonNode): Map[Int, ColStats] = {
    val buf = Map.newBuilder[Int, ColStats]
    n.fields().forEachRemaining { e =>
      val so = e.getValue
      buf += e.getKey.toInt -> ColStats(
        Option(so.get("vc")).map(_.asLong()),
        Option(so.get("nc")).map(_.asLong()),
        Option(so.get("nan")).map(_.asLong()),
        Option(so.get("lo")).map(readValue),
        Option(so.get("hi")).map(readValue),
        Option(so.get("sz")).map(_.asLong()))
    }
    buf.result()
  }

  // ------------------------------------------------------------- files
  def writeDataFile(f: DataFile): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("path", f.path).put("format", f.format).put("spec-id", f.specId)
      .put("records", f.recordCount).put("size", f.fileSizeBytes)
      .put("content", f.content)
    val pt = o.putArray("partition")
    f.partition.foreach(v => pt.add(writeValue(v)))
    o.set[JsonNode]("stats", writeStats(f.columnStats))
    if (f.equalityIds.nonEmpty) {
      val eq = o.putArray("equality-ids"); f.equalityIds.foreach(eq.add)
    }
    f.referencedDataFile.foreach(o.put("ref-data-file", _))
    f.contentOffset.foreach(o.put("content-offset", _))
    f.contentSizeInBytes.foreach(o.put("content-size", _))
    f.firstRowId.foreach(o.put("first-row-id", _))
    f.sortOrderId.foreach(o.put("sort-order-id", _))
    if (f.splitOffsets.nonEmpty) {
      val so = o.putArray("split-offsets"); f.splitOffsets.foreach(so.add)
    }
    if (f.shredStats.nonEmpty) {
      val so = o.putObject("shred-stats")
      f.shredStats.foreach { case (key, st) =>
        val eo = so.putObject(key)
        st.valueCount.foreach(eo.put("vc", _))
        st.nullCount.foreach(eo.put("nc", _))
        st.lower.foreach(v => eo.set[JsonNode]("lo", writeValue(v)))
        st.upper.foreach(v => eo.set[JsonNode]("hi", writeValue(v)))
      }
    }
    o
  }

  def readDataFile(n: JsonNode): DataFile = {
    val pt = Seq.newBuilder[Any]
    n.get("partition").elements().forEachRemaining(e => pt += readValue(e))
    val eq = Seq.newBuilder[Int]
    Option(n.get("equality-ids")).foreach(_.elements().forEachRemaining(e => eq += e.asInt()))
    DataFile(
      n.get("path").asText(), n.get("format").asText(), n.get("spec-id").asInt(),
      pt.result(), n.get("records").asLong(), n.get("size").asLong(),
      readStats(n.get("stats")), n.get("content").asInt(), eq.result(),
      Option(n.get("ref-data-file")).map(_.asText()),
      Option(n.get("content-offset")).map(_.asLong()),
      Option(n.get("content-size")).map(_.asLong()),
      Option(n.get("first-row-id")).map(_.asLong()),
      Option(n.get("shred-stats")).map { so =>
        val buf = Map.newBuilder[String, ColStats]
        so.fields().forEachRemaining { e =>
          val eo = e.getValue
          buf += e.getKey -> ColStats(
            Option(eo.get("vc")).map(_.asLong()),
            Option(eo.get("nc")).map(_.asLong()),
            None,
            Option(eo.get("lo")).map(readValue),
            Option(eo.get("hi")).map(readValue))
        }
        buf.result()
      }.getOrElse(Map.empty),
      splitOffsets = Option(n.get("split-offsets")).map { a =>
        val b = Seq.newBuilder[Long]
        a.elements().forEachRemaining(e => b += e.asLong())
        b.result()
      }.getOrElse(Nil),
      sortOrderId = Option(n.get("sort-order-id")).map(_.asInt()))
  }

  def writeEntry(e: ManifestEntry): String = {
    val o = mapper.createObjectNode()
    o.put("status", e.status).put("snapshot-id", e.snapshotId)
      .put("sequence-number", e.dataSequenceNumber)
    e.writeSchemaId.foreach(o.put("write-schema-id", _))
    // only written when it genuinely differs from the data sequence
    // (Avro-imported Iceberg entries); absent means "same"
    e.fileSequenceNumber.filter(_ != e.dataSequenceNumber)
      .foreach(o.put("file-sequence-number", _))
    o.set[JsonNode]("file", writeDataFile(e.file))
    mapper.writeValueAsString(o)
  }

  def readEntry(line: String): ManifestEntry = {
    val n = mapper.readTree(line)
    ManifestEntry(n.get("status").asInt(), n.get("snapshot-id").asLong(),
      n.get("sequence-number").asLong(), readDataFile(n.get("file")),
      writeSchemaId = Option(n.get("write-schema-id")).map(_.asInt()),
      fileSequenceNumber = Option(n.get("file-sequence-number")).map(_.asLong()))
  }

  // ------------------------------------------------------------- manifest list
  def writeManifestFile(m: ManifestFile): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("path", m.path).put("length", m.length).put("spec-id", m.specId)
      .put("content", m.content).put("added-snapshot-id", m.addedSnapshotId)
      .put("min-seq", m.minSequenceNumber)
      .put("added-files", m.addedFilesCount).put("existing-files", m.existingFilesCount)
      .put("deleted-files", m.deletedFilesCount).put("added-rows", m.addedRowsCount)
      .put("existing-rows", m.existingRowsCount).put("deleted-rows", m.deletedRowsCount)
    m.keyMetadata.foreach(o.put("key-metadata", _))
    m.sequenceNumber.foreach(o.put("seq", _))
    val arr = o.putArray("summaries")
    m.partitionSummaries.foreach { s =>
      val so = arr.addObject()
      so.put("has-null", s.containsNull).put("has-nan", s.containsNan)
      s.lower.foreach(v => so.set[JsonNode]("lo", writeValue(v)))
      s.upper.foreach(v => so.set[JsonNode]("hi", writeValue(v)))
    }
    o
  }

  def readManifestFile(n: JsonNode): ManifestFile = {
    val sums = Seq.newBuilder[FieldSummary]
    n.get("summaries").elements().forEachRemaining { so =>
      sums += FieldSummary(so.get("has-null").asBoolean(), so.get("has-nan").asBoolean(),
        Option(so.get("lo")).map(readValue), Option(so.get("hi")).map(readValue))
    }
    ManifestFile(n.get("path").asText(), n.get("length").asLong(), n.get("spec-id").asInt(),
      n.get("content").asInt(), n.get("added-snapshot-id").asLong(),
      n.get("min-seq").asLong(), n.get("added-files").asInt(),
      n.get("existing-files").asInt(), n.get("deleted-files").asInt(),
      n.get("added-rows").asLong(), sums.result(),
      // pre-field lists: when the manifest HAS Existing entries but no
      // recorded row count, mark it unknown (-1) — publishing 0 would
      // make snapshot-summary totals silently undercount forever; the
      // totals computation omits total-records while any manifest is
      // unknown, and exactness resumes once a rewrite re-counts it
      existingRowsCount = Option(n.get("existing-rows")).map(_.asLong())
        .getOrElse(if (n.get("existing-files").asInt() > 0) -1L else 0L),
      deletedRowsCount = Option(n.get("deleted-rows")).map(_.asLong()).getOrElse(0L),
      keyMetadata = Option(n.get("key-metadata")).map(_.asText()),
      sequenceNumber = Option(n.get("seq")).map(_.asLong()))
  }

  // ------------------------------------------------------------- table metadata

  /** `compatibility.format=iceberg` makes every metadata document this
    * table writes spec-conformant: Appendix-C JSON dialect for the
    * metadata.json (plus spec-Avro manifests/manifest lists via
    * ManifestIO.avroEnabled), so an external Iceberg reader can load the
    * tree as a Hadoop-catalog table (v{N}.metadata.json +
    * version-hint.text is exactly that layout). */
  def icebergCompat(props: Map[String, String]): Boolean =
    props.get("compatibility.format").exists(_.equalsIgnoreCase("iceberg"))

  /** Statistics-file entry, identical in both dialects (the spec shape —
    * reference StatisticsFileParser: footer size and blob-metadata are
    * REQUIRED there, so always emit them). `wp` maps the stored path. */
  // defaults: graft stores SQL text; emit the spec's JSON single-value
  // for literal shapes — bool, integer, exact decimal (BigDecimal, never
  // a scale-losing double), quoted string, and typed DATE/TIME/TIMESTAMP
  // literals (spec single-value timestamps are ISO-8601, so the SQL
  // space separator becomes 'T'). A default this cannot represent must
  // FAIL the compat write, not be omitted: an external reader filling
  // NULL where graft applies the default is silent wrong data on exactly
  // the interop path compatibility.format exists to serve.
  private val typedLitRe = "(?i)^(DATE|TIME|TIMESTAMP(?:TZ|_NTZ)?)\\s+'(.*)'$".r

  private[meta] def defaultJson(sql: String): Option[JsonNode] = {
    val t = sql.trim
    val nf = mapper.getNodeFactory
    if (t.equalsIgnoreCase("true")) Some(nf.booleanNode(true))
    else if (t.equalsIgnoreCase("false")) Some(nf.booleanNode(false))
    else if (t.startsWith("'") && t.endsWith("'") && t.length >= 2 &&
        // a SINGLE string literal only: interior quotes must all be the
        // '' escape, else this is an expression ("'a' || 'b'") that must
        // fail the compat write, not be mangled into a wrong string
        !t.substring(1, t.length - 1).replace("''", "").contains('\''))
      Some(nf.textNode(t.substring(1, t.length - 1).replace("''", "'")))
    else t match {
      case typedLitRe(kind, v) =>
        // ISO-8601: date→time separator becomes 'T', and the optional
        // space before a zone offset is removed entirely
        val lit = if (kind.toUpperCase.startsWith("TIMESTAMP"))
          v.replaceFirst(" ", "T").replace(" ", "") else v
        Some(nf.textNode(lit))
      case _ => t.toLongOption.map(nf.numberNode(_): JsonNode)
        // BigDecimal first (exact scale for decimals), then plain double
        // parse, which also accepts SQL's D/F-suffixed float literals
        .orElse(scala.util.Try(new java.math.BigDecimal(t)).toOption
          .map(nf.numberNode(_): JsonNode))
        .orElse(t.toDoubleOption.map(nf.numberNode(_): JsonNode))
    }
  }

  /** Appendix-C schema JSON WITH column defaults: every spec-dialect
    * schema write (metadata documents AND commit-protocol add-schema
    * actions) must carry initial-default/write-default, failing loudly on
    * a default the dialect cannot represent — an external reader filling
    * NULL where graft applies the default is silent wrong data (reference
    * SchemaParser writes both keys). */
  private[meta] def schemaSpecJson(s: GSchema): ObjectNode = {
    val so = IcebergJson.schemaJson(s)
    val fields = so.get("fields")
    val byId = s.struct.fields.map(f => f.id -> f).toMap
    def put(fn: ObjectNode, key: String, name: String, sql: Option[String]): Unit =
      sql.foreach { d =>
        fn.set[JsonNode](key, defaultJson(d).getOrElse(
          throw new IllegalStateException(
            s"column '$name': default $d is not a literal the iceberg " +
              s"compat dialect can represent as $key")))
      }
    fields.elements().forEachRemaining { fn =>
      val f = byId(fn.get("id").asInt())
      put(fn.asInstanceOf[ObjectNode], "initial-default", f.name, f.initialDefaultSql)
      put(fn.asInstanceOf[ObjectNode], "write-default", f.name, f.writeDefaultSql)
    }
    so
  }

  private[meta] def statisticsJson(so: ObjectNode, sf: StatisticsFile,
      wp: String => String): Unit = {
    so.put("snapshot-id", sf.snapshotId)
      .put("statistics-path", wp(sf.path))
      .put("file-size-in-bytes", sf.fileSizeBytes)
      .put("file-footer-size-in-bytes", sf.fileFooterSizeBytes)
    val blobs = so.putArray("blob-metadata")
    sf.blobMetadata.foreach { b =>
      val bo = blobs.addObject()
      bo.put("type", b.tpe).put("snapshot-id", b.snapshotId)
        .put("sequence-number", b.sequenceNumber)
      val fs = bo.putArray("fields")
      b.fields.foreach(fs.add)
      if (b.properties.nonEmpty) {
        val p = bo.putObject("properties")
        b.properties.foreach { case (k, v) => p.put(k, v) }
      }
    }
  }

  /** Document-level dialect sniff: graft schemas tag field types `ftype`,
    * Appendix-C uses `type` — used by register_table to keep a genuine
    * Iceberg tree spec-readable after import (auto-set compat). */
  def isSpecDialect(json: String): Boolean = {
    val n = mapper.readTree(json)
    val schema0 = Option(n.get("schemas")).filter(_.isArray).filter(_.size > 0)
      .map(_.get(0)).orElse(Option(n.get("schema")))
    schema0.flatMap(s => Option(s.get("fields")))
      .filter(_.isArray).filter(_.size > 0)
      .exists(fs => !fs.get(0).has("ftype"))
  }

  def writeMetadata(m: TableMetadata): String =
    if (icebergCompat(m.properties)) writeMetadataSpec(m) else writeMetadataGraft(m)

  /** Spec-dialect writer (reference TableMetadataParser.java toJson):
    * absolute tracked paths, Appendix-C schemas, operation nested in the
    * snapshot summary, string sort directions, and — for v1 — the
    * singular `schema`/`partition-spec` forms alongside the arrays, the
    * way the reference writes modern v1 metadata. */
  private def writeMetadataSpec(m: TableMetadata): String = {
    val o = mapper.createObjectNode()
    o.put("format-version", m.formatVersion).put("table-uuid", m.tableUuid)
      .put("location", m.location)
    if (m.formatVersion >= 2) o.put("last-sequence-number", m.lastSequenceNumber)
    o.put("last-updated-ms", m.lastUpdatedMs).put("last-column-id", m.lastColumnId)
    if (m.formatVersion >= 3) o.put("next-row-id", m.nextRowId)
    o.put("current-schema-id", m.currentSchemaId)
    val schemas = o.putArray("schemas")
    m.schemas.foreach(s => schemas.add(schemaSpecJson(s)))
    if (m.formatVersion == 1) {
      o.set[JsonNode]("schema", schemaSpecJson(m.schema))
      o.set[JsonNode]("partition-spec", IcebergJson.specFieldsJson(m.spec))
    }
    o.put("default-spec-id", m.defaultSpecId)
    val specs = o.putArray("partition-specs")
    m.specs.foreach { s =>
      val sn = specs.addObject()
      sn.put("spec-id", s.specId)
      sn.set[JsonNode]("fields", IcebergJson.specFieldsJson(s))
    }
    o.put("last-partition-id", m.lastPartitionId)
    o.put("default-sort-order-id", m.defaultSortOrderId)
    // sort-order and snapshot shapes come from the SAME builders the
    // REST commit wire uses (SpecUpdates) — one place to diverge from
    val orders = o.putArray("sort-orders")
    m.sortOrders.foreach(so => orders.add(SpecUpdates.sortOrderJson(so)))
    val props = o.putObject("properties")
    m.properties.foreach { case (k, v) => props.put(k, v) }
    m.currentSnapshotId.foreach(o.put("current-snapshot-id", _))
    val snaps = o.putArray("snapshots")
    m.snapshots.foreach(s =>
      snaps.add(SpecUpdates.snapshotJson(s, m.formatVersion)))
    val log = o.putArray("snapshot-log")
    m.snapshotLog.foreach { case (ts, id) =>
      log.addObject().put("timestamp-ms", ts).put("snapshot-id", id)
    }
    val ml = o.putArray("metadata-log")
    m.metadataLog.foreach { case (ts, f) =>
      ml.addObject().put("timestamp-ms", ts).put("metadata-file", f)
    }
    if (m.refs.nonEmpty) {
      val refs = o.putObject("refs")
      m.refs.foreach { case (name, r) =>
        val ro = refs.putObject(name)
        ro.put("snapshot-id", r.snapshotId).put("type", r.refType)
        r.minSnapshotsToKeep.foreach(ro.put("min-snapshots-to-keep", _))
        r.maxSnapshotAgeMs.foreach(ro.put("max-snapshot-age-ms", _))
        r.maxRefAgeMs.foreach(ro.put("max-ref-age-ms", _))
      }
    }
    if (m.statistics.nonEmpty) {
      val st = o.putArray("statistics")
      m.statistics.foreach(sf => statisticsJson(st.addObject(), sf, identity))
    }
    if (m.partitionStatistics.nonEmpty) {
      val st = o.putArray("partition-statistics")
      m.partitionStatistics.foreach { sf =>
        st.addObject().put("snapshot-id", sf.snapshotId)
          .put("statistics-path", sf.path)
          .put("file-size-in-bytes", sf.fileSizeBytes)
      }
    }
    if (m.encryptionKeys.nonEmpty) {
      val ek = o.putArray("encryption-keys")
      m.encryptionKeys.foreach { k =>
        val ko = ek.addObject()
        ko.put("key-id", k.keyId)
          .put("encrypted-key-metadata", k.encryptedKeyMetadata)
        k.encryptedById.foreach(ko.put("encrypted-by-id", _))
        if (k.properties.nonEmpty) {
          val kp = ko.putObject("properties")
          k.properties.foreach { case (pk, pv) => kp.put(pk, pv) }
        }
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }

  private def writeMetadataGraft(m: TableMetadata): String = {
    // v4 relative locations (spec "File Locations in Metadata"): tracked
    // paths under the table location are always stored relative, so a
    // table directory can be moved and re-registered without rewriting
    // any metadata; paths OUTSIDE the location (add_files imports) stay
    // absolute, and readers resolve both forms
    def wp(p: String): String = GraftIO.relativize(p, m.location)
    val o = mapper.createObjectNode()
    o.put("format-version", m.formatVersion).put("table-uuid", m.tableUuid)
      .put("location", m.location).put("last-sequence-number", m.lastSequenceNumber)
      .put("last-updated-ms", m.lastUpdatedMs).put("last-column-id", m.lastColumnId)
      .put("current-schema-id", m.currentSchemaId)
      .put("default-spec-id", m.defaultSpecId).put("last-partition-id", m.lastPartitionId)
      .put("default-sort-order-id", m.defaultSortOrderId)
      .put("next-row-id", m.nextRowId)
    m.currentSnapshotId.foreach(o.put("current-snapshot-id", _))
    val schemas = o.putArray("schemas")
    m.schemas.foreach(s => schemas.add(writeSchema(s)))
    val specs = o.putArray("partition-specs")
    m.specs.foreach(s => specs.add(writeSpec(s)))
    val orders = o.putArray("sort-orders")
    m.sortOrders.foreach { so =>
      val oo = orders.addObject()
      oo.put("order-id", so.orderId)
      val fs = oo.putArray("fields")
      so.fields.foreach { f =>
        fs.addObject().put("source-id", f.sourceId).put("transform", f.transform.name)
          .put("asc", f.ascending).put("nulls-first", f.nullsFirst)
      }
    }
    val props = o.putObject("properties")
    m.properties.foreach { case (k, v) => props.put(k, v) }
    val snaps = o.putArray("snapshots")
    m.snapshots.foreach { s =>
      val so = snaps.addObject()
      so.put("snapshot-id", s.snapshotId).put("sequence-number", s.sequenceNumber)
        .put("timestamp-ms", s.timestampMs).put("operation", s.operation)
      // v1 embedded-manifests snapshots keep their `manifests` array form
      // (the inline: sentinel is in-memory only — persisted, a later read
      // would re-root it under the table location as a relative path)
      ManifestIO.inlinePaths(s.manifestListPath) match {
        case Some(paths) =>
          val arr = so.putArray("manifests"); paths.foreach(p => arr.add(wp(p)))
        case None => so.put("manifest-list", wp(s.manifestListPath))
      }
      s.parentId.foreach(so.put("parent-snapshot-id", _))
      s.firstRowId.foreach(so.put("first-row-id", _))
      s.schemaId.foreach(so.put("schema-id", _))
      s.keyId.foreach(so.put("key-id", _))
      s.keyMetadata.foreach(so.put("manifest-list-key-metadata", _))
      val sum = so.putObject("summary")
      s.summary.foreach { case (k, v) => sum.put(k, v) }
    }
    val log = o.putArray("snapshot-log")
    m.snapshotLog.foreach { case (ts, id) =>
      log.addObject().put("timestamp-ms", ts).put("snapshot-id", id)
    }
    val refs = o.putObject("refs")
    m.refs.foreach { case (name, r) =>
      val ro = refs.putObject(name)
      ro.put("snapshot-id", r.snapshotId).put("type", r.refType)
      r.minSnapshotsToKeep.foreach(ro.put("min-snapshots-to-keep", _))
      r.maxSnapshotAgeMs.foreach(ro.put("max-snapshot-age-ms", _))
      r.maxRefAgeMs.foreach(ro.put("max-ref-age-ms", _))
    }
    if (m.statistics.nonEmpty) {
      val st = o.putArray("statistics")
      m.statistics.foreach(sf => statisticsJson(st.addObject(), sf, wp))
    }
    if (m.partitionStatistics.nonEmpty) {
      val st = o.putArray("partition-statistics")
      m.partitionStatistics.foreach { sf =>
        st.addObject().put("snapshot-id", sf.snapshotId)
          .put("statistics-path", wp(sf.path))
          .put("file-size-in-bytes", sf.fileSizeBytes)
      }
    }
    if (m.metadataLog.nonEmpty) {
      val ml = o.putArray("metadata-log")
      m.metadataLog.foreach { case (ts, f) =>
        ml.addObject().put("timestamp-ms", ts).put("metadata-file", wp(f))
      }
    }
    if (m.encryptionKeys.nonEmpty) {
      val ek = o.putArray("encryption-keys")
      m.encryptionKeys.foreach { k =>
        val ko = ek.addObject()
        ko.put("key-id", k.keyId)
          .put("encrypted-key-metadata", k.encryptedKeyMetadata)
        k.encryptedById.foreach(ko.put("encrypted-by-id", _))
        if (k.properties.nonEmpty) {
          val kp = ko.putObject("properties")
          k.properties.foreach { case (pk, pv) => kp.put(pk, pv) }
        }
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }

  /** `metaPath`: where this JSON was read from. When it lives under
    * `{base}/metadata/`, relative tracked locations (v4 relative
    * locations, spec "File Locations in Metadata") resolve against that
    * base, and a table that was MOVED (base != stored location) is
    * re-rooted so all downstream paths point at the new home.
    *
    * Accepts BOTH graft's dialect and genuine spec metadata (reference
    * TableMetadataParser.java:395-511, SnapshotParser.java:124-205):
    * v1 singular `schema` / bare `partition-spec`, snapshot `operation`
    * nested in `summary`, optional `sequence-number`, v1 embedded
    * `manifests` arrays, absent `properties`/`snapshots`/`snapshot-log`/
    * `refs`/`sort-orders`, `current-snapshot-id: -1` as "none", and
    * `direction`/`null-order` sort-field spellings. */
  /** one snapshot node, graft or spec dialect (spec nests the operation
    * inside summary — SnapshotParser.java:141-155, defaulting a missing
    * operation to overwrite; v1 may embed the manifest list as a
    * `manifests` path array, SnapshotParser.java:179-192, encoded as an
    * inline list that ManifestIO.readList expands) */
  def readSnapshot(so: JsonNode, res: String => String = identity): Snapshot = {
    val sum = Map.newBuilder[String, String]
    Option(so.get("summary")).filterNot(_.isNull).foreach(
      _.fields().forEachRemaining(e => sum += e.getKey -> e.getValue.asText()))
    val sumMap = sum.result()
    val operation = Option(so.get("operation")).map(_.asText())
      .orElse(sumMap.get("operation")).getOrElse("overwrite")
    val listPath = Option(so.get("manifest-list")).map(m => res(m.asText()))
      .getOrElse {
        val paths = Seq.newBuilder[String]
        Option(so.get("manifests")).foreach(_.elements()
          .forEachRemaining(p => paths += res(p.asText())))
        ManifestIO.inlineList(paths.result())
      }
    Snapshot(so.get("snapshot-id").asLong(),
      Option(so.get("parent-snapshot-id")).map(_.asLong()),
      Option(so.get("sequence-number")).map(_.asLong()).getOrElse(0L),
      so.get("timestamp-ms").asLong(),
      operation, listPath,
      sumMap - "operation",
      Option(so.get("first-row-id")).map(_.asLong()),
      Option(so.get("schema-id")).map(_.asInt()),
      Option(so.get("key-id")).map(_.asText()),
      Option(so.get("manifest-list-key-metadata")).map(_.asText()))
  }

  /** one sort-order node; graft spells direction as booleans (`asc`,
    * `nulls-first`), the spec as strings (`direction`: asc|desc,
    * `null-order`: nulls-first|nulls-last) */
  def readSortOrder(oo: JsonNode): SortOrder = {
    val fs = Seq.newBuilder[SortField]
    oo.get("fields").elements().forEachRemaining { f =>
      val asc = Option(f.get("asc")).map(_.asBoolean()).getOrElse(
        f.get("direction").asText().equalsIgnoreCase("asc"))
      val nullsFirst = Option(f.get("nulls-first")).map(_.asBoolean()).getOrElse(
        Option(f.get("null-order")).forall(_.asText().equalsIgnoreCase("nulls-first")))
      fs += SortField(f.get("source-id").asInt(),
        Transform.fromName(f.get("transform").asText()), asc, nullsFirst)
    }
    SortOrder(oo.get("order-id").asInt(), fs.result())
  }

  def readStatisticsFile(e: JsonNode, res: String => String = identity): StatisticsFile = {
    val blobs = Seq.newBuilder[StatBlobMeta]
    Option(e.get("blob-metadata")).foreach(_.elements().forEachRemaining { b =>
      val fields = Seq.newBuilder[Int]
      Option(b.get("fields")).foreach(
        _.elements().forEachRemaining(f => fields += f.asInt()))
      val bprops = Map.newBuilder[String, String]
      Option(b.get("properties")).foreach(_.properties().forEach(en =>
        bprops += en.getKey -> en.getValue.asText()))
      blobs += StatBlobMeta(b.get("type").asText(),
        b.get("snapshot-id").asLong(),
        Option(b.get("sequence-number")).map(_.asLong()).getOrElse(0L),
        fields.result(), bprops.result())
    })
    StatisticsFile(e.get("snapshot-id").asLong(),
      res(e.get("statistics-path").asText()),
      e.get("file-size-in-bytes").asLong(),
      Option(e.get("file-footer-size-in-bytes")).map(_.asLong()).getOrElse(0L),
      blobs.result())
  }

  def readPartitionStatisticsFile(e: JsonNode,
      res: String => String = identity): PartitionStatisticsFile =
    PartitionStatisticsFile(e.get("snapshot-id").asLong(),
      res(e.get("statistics-path").asText()),
      e.get("file-size-in-bytes").asLong())

  def readMetadata(json: String, metaPath: Option[String] = None): TableMetadata = {
    val n = mapper.readTree(json)
    def opt(name: String): Option[JsonNode] =
      Option(n.get(name)).filterNot(_.isNull)
    // reference TableMetadataParser: unsupported versions and v2+ docs
    // missing spec-required sections are rejected, not guessed at
    val fv = Option(n.get("format-version")).map(_.asInt()).getOrElse(
      throw new IllegalArgumentException(
        "Cannot parse missing field: format-version"))
    if (fv < 1 || fv > 4)
      throw new IllegalArgumentException(
        s"Cannot read unsupported version $fv")
    if (fv >= 2)
      Seq("schemas", "partition-specs", "last-partition-id", "sort-orders",
        "current-schema-id").foreach(f =>
        if (opt(f).isEmpty) throw new IllegalArgumentException(
          s"$f must exist in format v$fv"))
    // resolution base: where the file actually lives (re-roots a moved
    // table), else the stored location (path-less reads, e.g. REST)
    val base = metaPath.flatMap(GraftIO.metadataBase)
    val resolveBase = Some(base.getOrElse(n.get("location").asText()))
    def res(p: String): String = GraftIO.resolve(p, resolveBase)
    val schemas = Seq.newBuilder[GSchema]
    opt("schemas") match {
      case Some(arr) => arr.elements().forEachRemaining(s => schemas += readSchema(s))
      case None => // v1 singular `schema` (TableMetadataParser.java:499-511)
        schemas += readSchema(n.get("schema"))
    }
    val allSchemas = schemas.result()
    val specs = Seq.newBuilder[PartitionSpec]
    opt("partition-specs") match {
      case Some(arr) => arr.elements().forEachRemaining(s => specs += readSpec(s))
      case None => // v1 bare `partition-spec` field array
        specs += PartitionSpec(0,
          opt("partition-spec").map(readSpecFields).getOrElse(Nil))
    }
    val allSpecs = specs.result()
    val orders = Seq.newBuilder[SortOrder]
    opt("sort-orders").foreach(_.elements().forEachRemaining(
      oo => orders += readSortOrder(oo)))
    val allOrders = orders.result()
    val props = Map.newBuilder[String, String]
    opt("properties").foreach(_.fields().forEachRemaining(e =>
      props += e.getKey -> e.getValue.asText()))
    val snaps = Seq.newBuilder[Snapshot]
    opt("snapshots").foreach(_.elements().forEachRemaining { so =>
      snaps += readSnapshot(so, res)
    })
    val log = Seq.newBuilder[(Long, Long)]
    opt("snapshot-log").foreach(_.elements().forEachRemaining { e =>
      log += ((e.get("timestamp-ms").asLong(), e.get("snapshot-id").asLong()))
    })
    val refs = Map.newBuilder[String, SnapshotRef]
    opt("refs").foreach(_.fields().forEachRemaining { e =>
      val r = e.getValue
      refs += e.getKey -> SnapshotRef(r.get("snapshot-id").asLong(), r.get("type").asText(),
        Option(r.get("min-snapshots-to-keep")).map(_.asInt()),
        Option(r.get("max-snapshot-age-ms")).map(_.asLong()),
        Option(r.get("max-ref-age-ms")).map(_.asLong()))
    })
    val out = TableMetadata(
      n.get("format-version").asInt(), n.get("table-uuid").asText(),
      base.getOrElse(n.get("location").asText()),
      opt("last-sequence-number").map(_.asLong()).getOrElse(0L),
      n.get("last-updated-ms").asLong(), n.get("last-column-id").asInt(),
      opt("current-schema-id").map(_.asInt()).map { id =>
        if (!allSchemas.exists(_.schemaId == id))
          throw new IllegalArgumentException(
            s"Cannot find schema with current-schema-id=$id from schemas")
        id
      }.getOrElse(allSchemas.head.schemaId), allSchemas,
      opt("default-spec-id").map(_.asInt())
        .getOrElse(allSpecs.head.specId), allSpecs,
      opt("last-partition-id").map(_.asInt()).getOrElse(
        allSpecs.flatMap(_.fields.map(_.fieldId)).maxOption.getOrElse(999)),
      opt("default-sort-order-id").map(_.asInt()).getOrElse(0),
      if (allOrders.isEmpty) Seq(SortOrder.Unsorted) else allOrders,
      props.result(),
      // v1 writers use -1 for "no current snapshot"
      opt("current-snapshot-id").map(_.asLong()).filter(_ != -1L),
      snaps.result(), log.result(), refs.result(),
      Option(n.get("next-row-id")).map(_.asLong()).getOrElse(0L),
      statistics = {
        val st = Seq.newBuilder[StatisticsFile]
        Option(n.get("statistics")).foreach(_.elements().forEachRemaining(
          e => st += readStatisticsFile(e, res)))
        st.result()
      },
      partitionStatistics = {
        val st = Seq.newBuilder[PartitionStatisticsFile]
        Option(n.get("partition-statistics")).foreach(_.elements()
          .forEachRemaining(e => st += readPartitionStatisticsFile(e, res)))
        st.result()
      },
      metadataLog = {
        val ml = Seq.newBuilder[(Long, String)]
        Option(n.get("metadata-log")).foreach(_.elements().forEachRemaining { e =>
          ml += ((e.get("timestamp-ms").asLong(),
            res(e.get("metadata-file").asText())))
        })
        ml.result()
      },
      encryptionKeys = {
        val ek = Seq.newBuilder[EncryptionKey]
        Option(n.get("encryption-keys")).foreach(_.elements().forEachRemaining { e =>
          val kp = Map.newBuilder[String, String]
          Option(e.get("properties")).foreach(_.fields().forEachRemaining(f =>
            kp += f.getKey -> f.getValue.asText()))
          ek += EncryptionKey(e.get("key-id").asText(),
            e.get("encrypted-key-metadata").asText(),
            Option(e.get("encrypted-by-id")).map(_.asText()), kp.result())
        })
        ek.result()
      })
    // every metadata load primes the crypto cache so the manifest-read
    // sites below stay key-threading-free
    CryptoRegistry.register(out)
    out
  }
}
