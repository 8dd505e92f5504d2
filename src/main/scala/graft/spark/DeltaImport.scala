package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

import graft.core.meta.{GraftIO, MetaJson}
import graft.core.types._

/** Delta Lake table import (reference
  * delta-lake/src/main/java/org/apache/iceberg/delta/BaseSnapshotDeltaLakeTableAction.java):
  * reads the PUBLIC `_delta_log` JSON/checkpoint format directly — no
  * Delta jars — and replays each Delta version as one graft commit, so
  * the imported table keeps per-version time travel (`delta-version-N`
  * tags, like the reference's DELTA_VERSION_TAG_PREFIX).
  *
  * Format (delta.io PROTOCOL.md, public): `_delta_log/` holds
  * zero-padded `<version>.json` files of newline-delimited actions
  * ({"metaData":…}, {"add":…}, {"remove":…}, {"protocol":…},
  * {"commitInfo":…}), plus optional parquet checkpoints summarizing
  * state at a version (`_last_checkpoint` names the latest).
  * `metaData.schemaString` is a Spark StructType JSON; `partitionColumns`
  * are identity partitions; add/remove paths are table-root-relative and
  * URL-encoded; partition values are strings. Data files do NOT contain
  * partition columns — plain tables register name-mapped (parquet-nm),
  * COLUMN-MAPPED tables register id-mapped (parquet-im: the files store
  * physical col-<uuid> names but carry parquet field ids, so the
  * field-id read path resolves them); both serve identity-partition
  * constants from task metadata.
  *
  * Memory: the log is scanned twice — a cheap first pass keeps only
  * metaData/protocol (validating the protocol BEFORE any table is
  * created) and the second pass streams ONE VersionChange at a time
  * through an iterator, so driver peak is O(largest single version)
  * plus O(live files) for a checkpoint seed (inherent to building that
  * one commit; the reference holds the same).
  */
object DeltaImport {

  /** one Delta version's file changes */
  final case class VersionChange(version: Long,
      adds: Seq[(String, Map[String, String])], // absolute path -> partitionValues
      removes: Seq[String],                     // absolute paths
      schemaString: Option[String],
      partitionColumns: Option[Seq[String]],
      configuration: Map[String, String] = Map.empty)

  /** log-wide facts, known before any data file is touched */
  final case class DeltaInfo(schema: StructType,
      partitionColumns: Seq[String],
      columnMapping: Option[String], // "name" | "id" when enabled
      latestVersion: Long)

  /** reader features this importer can faithfully serve (PROTOCOL.md
    * reader-version-3 feature names). `deletionVectors` is tolerated at
    * the PROTOCOL level only — any add action actually carrying a DV is
    * rejected in the same pre-pass, so a table with the feature enabled
    * but no DVs present still imports. */
  private val SafeReaderFeatures = Set(
    "columnMapping", "timestampNtz", "deletionVectors",
    "vacuumProtocolCheck", "typeWidening", "typeWidening-preview")

  private def pad20(v: Long): String = f"$v%020d"

  /** resolve an action path against the table root (PROTOCOL.md: paths
    * are relative to the root and URL-encoded, or absolute URIs) */
  private def fullPath(p: String, root: String): String = {
    val decoded = java.net.URLDecoder.decode(p, "UTF-8")
    if (decoded.startsWith("/") || decoded.contains("://")) decoded
    else s"${root.stripSuffix("/")}/$decoded"
  }

  private final case class LogLayout(root: String, logDir: String,
      cpVersion: Option[Long], cpParts: Seq[String], jsonTail: Seq[Long])

  private def layout(tableDir: String): LogLayout = {
    val root = tableDir.stripSuffix("/")
    val logDir = s"$root/_delta_log"
    require(GraftIO.exists(logDir), s"not a Delta table (no _delta_log): $tableDir")
    val names = GraftIO.walkFiles(logDir).map(_.split("/").last)
    val jsonVersions = names.filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong).sorted
    val cpVersion: Option[Long] =
      if (!names.contains("_last_checkpoint")) None
      else Some(MetaJson.mapper
        .readTree(GraftIO.readString(s"$logDir/_last_checkpoint"))
        .get("version").asLong())
    val cpParts = cpVersion.map { v =>
      val parts = names.filter(n =>
        n == s"${pad20(v)}.checkpoint.parquet" ||
          n.matches(s"${pad20(v)}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet"))
        .map(n => s"$logDir/$n")
      require(parts.nonEmpty,
        s"_last_checkpoint names version $v but no checkpoint file exists")
      parts
    }.getOrElse(Nil)
    val replayFrom = cpVersion.map(_ + 1).getOrElse {
      require(jsonVersions.headOption.contains(0L),
        s"Delta log must start at version 0 (or have a checkpoint); found ${jsonVersions.headOption}")
      0L
    }
    val tail = jsonVersions.filter(_ >= replayFrom)
    // versions must be contiguous — a gap means a vacuumed log segment
    // we cannot faithfully replay
    tail.zipWithIndex.foreach { case (v, i) =>
      require(v == replayFrom + i,
        s"Delta log gap: expected version ${replayFrom + i}, found $v")
    }
    require(cpVersion.isDefined || tail.nonEmpty, s"empty Delta log: $logDir")
    LogLayout(root, logDir, cpVersion, cpParts, tail)
  }

  private def checkProtocol(minReader: Int, features: Seq[String]): Unit = {
    // minReaderVersion 1 = base, 2 = column mapping (now served via the
    // field-id read path), 3 = explicit reader-feature list; anything
    // NEWER is an unknown protocol whose semantics (new file-masking
    // mechanisms, say) cannot be honored — refuse loudly
    require(minReader <= 3,
      s"cannot import Delta table: unsupported minReaderVersion $minReader")
    if (minReader == 3) {
      val unsafe = features.filterNot(SafeReaderFeatures)
      require(unsafe.isEmpty,
        s"cannot import Delta table: unsupported readerFeatures ${unsafe.mkString(", ")}")
    }
  }

  /** Pass 1 over a JSON version: metaData + protocol only; rejects any
    * add carrying a deletion vector (a DV-masked file imported whole
    * would silently resurrect deleted rows). */
  private def scanJson(logDir: String, v: Long,
      sawMeta: (String, Option[Seq[String]], Map[String, String]) => Unit): Unit =
    GraftIO.readString(s"$logDir/${pad20(v)}.json").split("\n")
      .filter(_.trim.nonEmpty).foreach { line =>
        // cheap pre-filter; the JSON parse below confirms
        val n = MetaJson.mapper.readTree(line)
        Option(n.get("add")).filterNot(_.isNull).foreach { a =>
          require(Option(a.get("deletionVector")).forall(_.isNull),
            s"cannot import Delta table: version $v adds a file with a " +
              "deletion vector; importing it whole would resurrect deleted rows")
        }
        Option(n.get("protocol")).filterNot(_.isNull).foreach { p =>
          val feats = Option(p.get("readerFeatures")).map { arr =>
            val b = Seq.newBuilder[String]
            arr.elements().forEachRemaining(e => b += e.asText())
            b.result()
          }.getOrElse(Nil)
          checkProtocol(
            Option(p.get("minReaderVersion")).map(_.asInt()).getOrElse(1), feats)
        }
        Option(n.get("metaData")).filterNot(_.isNull).foreach { m =>
          val cfg = Map.newBuilder[String, String]
          Option(m.get("configuration")).foreach(_.fields()
            .forEachRemaining(e =>
              if (!e.getValue.isNull) cfg += e.getKey -> e.getValue.asText()))
          sawMeta(
            Option(m.get("schemaString")).map(_.asText()).orNull,
            Option(m.get("partitionColumns")).map { arr =>
              val b = Seq.newBuilder[String]
              arr.elements().forEachRemaining(e => b += e.asText())
              b.result()
            },
            cfg.result())
        }
      }

  /** Open a `_delta_log` for import: validates the protocol and DV
    * absence, resolves the FINAL schema/partitioning (latest metaData
    * wins — mid-history schema changes register under the final shape,
    * like the reference), and returns a LAZY iterator of per-version
    * changes (checkpoint seed first when present). */
  def open(spark: SparkSession, tableDir: String)
      : (DeltaInfo, Iterator[VersionChange]) = {
    val l = layout(tableDir)
    var schemaString: Option[String] = None
    var partCols: Option[Seq[String]] = None
    var config = Map.empty[String, String]

    // checkpoint pass 1: metaData/protocol columns + a DV presence check
    // as ONE aggregate — the add rows never land on the driver here
    if (l.cpParts.nonEmpty) {
      val df = spark.read.parquet(l.cpParts: _*)
      val cols = df.columns.toSet
      if (cols.contains("metaData")) {
        import org.apache.spark.sql.functions.col
        df.select(col("metaData")).where(col("metaData").isNotNull)
          .collect().foreach { row =>
            val m = row.getStruct(0)
            schemaString = Option(m.getAs[String]("schemaString"))
            partCols = Option(m.getAs[scala.collection.Seq[String]]("partitionColumns"))
              .map(_.toSeq)
            if (m.schema.fieldNames.contains("configuration"))
              config = Option(m.getAs[scala.collection.Map[String, String]](
                "configuration")).map(_.toMap).getOrElse(Map.empty)
                .filter(_._2 != null) // nullable parquet map values
          }
      }
      if (cols.contains("protocol")) {
        import org.apache.spark.sql.functions.col
        df.select(col("protocol")).where(col("protocol").isNotNull)
          .collect().foreach { row =>
            val p = row.getStruct(0)
            val minReader =
              if (p.schema.fieldNames.contains("minReaderVersion") &&
                  !p.isNullAt(p.fieldIndex("minReaderVersion")))
                p.getAs[Number]("minReaderVersion").intValue
              else 1
            val feats =
              if (p.schema.fieldNames.contains("readerFeatures"))
                Option(p.getAs[scala.collection.Seq[String]]("readerFeatures"))
                  .map(_.toSeq).getOrElse(Nil)
              else Nil
            checkProtocol(minReader, feats)
          }
      }
      if (cols.contains("add")) {
        import org.apache.spark.sql.functions.col
        val addSchema = df.schema("add").dataType.asInstanceOf[StructType]
        if (addSchema.fieldNames.contains("deletionVector")) {
          val dvCount = df.where(col("add").isNotNull &&
            col("add.deletionVector").isNotNull).count()
          require(dvCount == 0L,
            s"cannot import Delta table: checkpoint carries $dvCount file(s) " +
              "with deletion vectors; importing them whole would resurrect " +
              "deleted rows")
        }
      }
    }
    // JSON pass 1: protocol + DV guard + latest metaData
    l.jsonTail.foreach(v => scanJson(l.logDir, v, (sch, pc, cfg) => {
      if (sch != null) schemaString = Some(sch)
      pc.foreach(p => partCols = Some(p))
      config = config ++ cfg
    }))

    val mapping = config.get("delta.columnMapping.mode")
      .filterNot(m => m.isEmpty || m == "none")
    val sch = schemaString.getOrElse(throw new IllegalArgumentException(
      s"Delta log has no metaData action: ${l.logDir}"))
    val info = DeltaInfo(
      DataType.fromJson(sch).asInstanceOf[StructType],
      partCols.getOrElse(Nil), mapping,
      l.jsonTail.lastOption.orElse(l.cpVersion).get)

    // pass 2: lazy per-version changes; each VersionChange is released
    // by the caller before the next parses
    val cpIt: Iterator[VersionChange] = l.cpVersion.iterator.map { v =>
      val adds = Seq.newBuilder[(String, Map[String, String])]
      if (l.cpParts.nonEmpty) {
        val df = spark.read.parquet(l.cpParts: _*)
        if (df.columns.contains("add")) {
          import org.apache.spark.sql.functions.col
          // toLocalIterator: one partition of add rows on the driver at
          // a time while the (path, values) pairs accumulate
          df.select(col("add")).where(col("add").isNotNull)
            .toLocalIterator().forEachRemaining { row =>
              val a = row.getStruct(0)
              val path = a.getAs[String]("path")
              val pv = Option(a.getAs[scala.collection.Map[String, String]](
                "partitionValues")).map(_.toMap).getOrElse(Map.empty)
              adds += ((fullPath(path, l.root), pv))
            }
        }
      }
      VersionChange(v, adds.result(), Nil, schemaString, partCols, config)
    }
    val jsonIt: Iterator[VersionChange] = l.jsonTail.iterator.map { v =>
      val adds = Seq.newBuilder[(String, Map[String, String])]
      val removes = Seq.newBuilder[String]
      var vSchema: Option[String] = None
      var vPartCols: Option[Seq[String]] = None
      val vConfig = Map.newBuilder[String, String]
      GraftIO.readString(s"${l.logDir}/${pad20(v)}.json").split("\n")
        .filter(_.trim.nonEmpty).foreach { line =>
          val n = MetaJson.mapper.readTree(line)
          Option(n.get("add")).filterNot(_.isNull).foreach { a =>
            val pv = Map.newBuilder[String, String]
            Option(a.get("partitionValues")).foreach(_.fields().forEachRemaining(e =>
              pv += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())))
            adds += ((fullPath(a.get("path").asText(), l.root), pv.result()))
          }
          Option(n.get("remove")).filterNot(_.isNull).foreach(r =>
            removes += fullPath(r.get("path").asText(), l.root))
          Option(n.get("metaData")).filterNot(_.isNull).foreach { m =>
            vSchema = Option(m.get("schemaString")).map(_.asText())
            vPartCols = Option(m.get("partitionColumns")).map { arr =>
              val b = Seq.newBuilder[String]
              arr.elements().forEachRemaining(e => b += e.asText())
              b.result()
            }
            Option(m.get("configuration")).foreach(_.fields()
              .forEachRemaining(e =>
                if (!e.getValue.isNull) vConfig += e.getKey -> e.getValue.asText()))
          }
        }
      VersionChange(v, adds.result(), removes.result(), vSchema, vPartCols,
        vConfig.result())
    }
    (info, cpIt ++ jsonIt)
  }

  /** Column-mapped schema (PROTOCOL.md column-mapping): every struct
    * field carries `delta.columnMapping.id` (the parquet field id the
    * writers stamp) and `delta.columnMapping.physicalName` (what the
    * file stores). The graft schema takes DELTA'S ids, so the field-id
    * read path resolves physical columns with no name translation;
    * array/map element ids (not delta-mapped) get fresh ids past the
    * mapped range. Returns the schema plus fieldId -> physicalName (for
    * footer stats, which match by file column NAME). */
  def mappedSchema(st: StructType): (GSchema, Map[Int, String]) = {
    val phys = Map.newBuilder[Int, String]
    var maxId = 0
    def fieldId(f: org.apache.spark.sql.types.StructField): Int = {
      require(f.metadata.contains("delta.columnMapping.id"),
        s"column-mapped Delta schema field ${f.name} lacks delta.columnMapping.id")
      val id = f.metadata.getLong("delta.columnMapping.id").toInt
      maxId = math.max(maxId, id)
      id
    }
    // first sweep records the mapped id range so fresh (element) ids
    // never collide with it
    def sweep(dt: org.apache.spark.sql.types.DataType): Unit = dt match {
      case s: StructType => s.fields.foreach { f => fieldId(f); sweep(f.dataType) }
      case a: org.apache.spark.sql.types.ArrayType => sweep(a.elementType)
      case m: org.apache.spark.sql.types.MapType => sweep(m.keyType); sweep(m.valueType)
      case _ => ()
    }
    sweep(st)
    var next = maxId
    def nid(): Int = { next += 1; next }
    def conv(dt: org.apache.spark.sql.types.DataType): GType = {
      import org.apache.spark.sql.types._
      dt match {
        case BooleanType      => GBoolean
        case ByteType | ShortType | IntegerType => GInt
        case LongType         => GLong
        case FloatType        => GFloat
        case DoubleType       => GDouble
        case d: DecimalType   => GDecimal(d.precision, d.scale)
        case DateType         => GDate
        case TimestampType    => GTimestamp(false)
        case TimestampNTZType => GTimestamp(true)
        case StringType       => GString
        case BinaryType       => GBinary
        case s: StructType    => GStruct(s.fields.map { f =>
          val id = f.metadata.getLong("delta.columnMapping.id").toInt
          if (f.metadata.contains("delta.columnMapping.physicalName"))
            phys += id -> f.metadata.getString("delta.columnMapping.physicalName")
          GField(id, f.name, conv(f.dataType), !f.nullable)
        })
        case a: ArrayType     => GList(nid(), conv(a.elementType), !a.containsNull)
        case m: MapType       => GMap(nid(), conv(m.keyType), nid(), conv(m.valueType), !m.valueContainsNull)
        case other => throw new IllegalArgumentException(
          s"unsupported Spark type in column-mapped Delta schema: $other")
      }
    }
    val struct = conv(st).asInstanceOf[GStruct]
    (GSchema(struct), phys.result())
  }

  /** Delta partition-value string → graft internal value. PROTOCOL.md
    * serializes null as JSON null; an empty string is null for
    * non-string types and the empty string for strings. Strings pass
    * through VERBATIM — TypeComparators.parse is the hive-path codec
    * whose literal "null" sentinel would corrupt a legitimate string
    * value "null". */
  def parsePartitionValue(tpe: graft.core.types.GType, s: String): Any =
    if (s == null) null
    else if (tpe == graft.core.types.GString) s
    else if (s.isEmpty) null
    else graft.core.types.TypeComparators.parse(tpe, s)
}
