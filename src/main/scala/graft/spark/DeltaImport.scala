package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

import graft.core.meta.{GraftIO, MetaJson}

/** Delta Lake table import (reference
  * delta-lake/src/main/java/org/apache/iceberg/delta/BaseSnapshotDeltaLakeTableAction.java):
  * reads the PUBLIC `_delta_log` JSON/checkpoint format directly — no
  * Delta jars — and replays each Delta version as one graft commit, so
  * the imported table keeps per-version time travel (`delta-version-N`
  * tags, like the reference's DELTA_VERSION_TAG_PREFIX).
  *
  * Format (delta.io PROTOCOL.md, public): `_delta_log/` holds
  * zero-padded `<version>.json` files of newline-delimited actions
  * ({"metaData":…}, {"add":…}, {"remove":…}, {"commitInfo":…}), plus
  * optional parquet checkpoints summarizing state at a version
  * (`_last_checkpoint` names the latest). `metaData.schemaString` is a
  * Spark StructType JSON; `partitionColumns` are identity partitions;
  * add/remove paths are table-root-relative and URL-encoded; partition
  * values are strings. Data files do NOT contain partition columns —
  * the import registers them name-mapped (parquet-nm) and the reader
  * serves identity-partition constants from task metadata.
  */
object DeltaImport {

  /** one Delta version's file changes */
  final case class VersionChange(version: Long,
      adds: Seq[(String, Map[String, String])], // absolute path -> partitionValues
      removes: Seq[String],                     // absolute paths
      schemaString: Option[String],
      partitionColumns: Option[Seq[String]],
      configuration: Map[String, String] = Map.empty)

  final case class DeltaLog(changes: Seq[VersionChange],
      schema: StructType, partitionColumns: Seq[String]) {
    def latestVersion: Long = changes.last.version
  }

  private def pad20(v: Long): String = f"$v%020d"

  /** resolve an action path against the table root (PROTOCOL.md: paths
    * are relative to the root and URL-encoded, or absolute URIs) */
  private def fullPath(p: String, root: String): String = {
    val decoded = java.net.URLDecoder.decode(p, "UTF-8")
    if (decoded.startsWith("/") || decoded.contains("://")) decoded
    else s"${root.stripSuffix("/")}/$decoded"
  }

  /** Read and replay a `_delta_log` directory. Uses the checkpoint named
    * by `_last_checkpoint` as the start state when the earlier JSON
    * versions were vacuumed away; JSON deltas after it replay
    * incrementally. */
  def readLog(spark: SparkSession, tableDir: String): DeltaLog = {
    val root = tableDir.stripSuffix("/")
    val logDir = s"$root/_delta_log"
    require(GraftIO.exists(logDir), s"not a Delta table (no _delta_log): $tableDir")
    val names = GraftIO.walkFiles(logDir).map(_.split("/").last)
    val jsonVersions = names.filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong).sorted

    // checkpoint start state (optional)
    val cpVersion: Option[Long] =
      if (!names.contains("_last_checkpoint")) None
      else Some(MetaJson.mapper
        .readTree(GraftIO.readString(s"$logDir/_last_checkpoint"))
        .get("version").asLong())
    val cpChange: Option[VersionChange] = cpVersion.map { v =>
      val parts = names.filter(n =>
        n == s"${pad20(v)}.checkpoint.parquet" ||
          n.matches(s"${pad20(v)}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet"))
        .map(n => s"$logDir/$n")
      require(parts.nonEmpty, s"_last_checkpoint names version $v but no checkpoint file exists")
      // a checkpoint is an ordinary parquet table of actions: one row per
      // action with nested add/remove/metaData structs
      val df = spark.read.parquet(parts: _*)
      val cols = df.columns.toSet
      val adds = Seq.newBuilder[(String, Map[String, String])]
      var schemaString: Option[String] = None
      var partCols: Option[Seq[String]] = None
      var cfg = Map.empty[String, String]
      if (cols.contains("add") || cols.contains("metaData")) {
        df.select(df.columns.filter(c => c == "add" || c == "metaData").map(df.col): _*)
          .collect().foreach { row =>
            row.schema.fieldNames.zipWithIndex.foreach {
              case ("add", i) if !row.isNullAt(i) =>
                val a = row.getStruct(i)
                val path = a.getAs[String]("path")
                val pv = Option(a.getAs[scala.collection.Map[String, String]]("partitionValues"))
                  .map(_.toMap).getOrElse(Map.empty)
                adds += ((fullPath(path, root), pv))
              case ("metaData", i) if !row.isNullAt(i) =>
                val m = row.getStruct(i)
                schemaString = Option(m.getAs[String]("schemaString"))
                partCols = Option(m.getAs[scala.collection.Seq[String]]("partitionColumns"))
                  .map(_.toSeq)
                if (m.schema.fieldNames.contains("configuration"))
                  cfg = Option(m.getAs[scala.collection.Map[String, String]](
                    "configuration")).map(_.toMap).getOrElse(Map.empty)
                    .filter(_._2 != null) // nullable parquet map values
              case _ => ()
            }
          }
      }
      VersionChange(v, adds.result(), Nil, schemaString, partCols, cfg)
    }

    val replayFrom = cpVersion.map(_ + 1).getOrElse {
      require(jsonVersions.headOption.contains(0L),
        s"Delta log must start at version 0 (or have a checkpoint); found ${jsonVersions.headOption}")
      0L
    }
    val tail = jsonVersions.filter(_ >= replayFrom)
    // versions must be contiguous — a gap means a vacuumed log segment
    // we cannot faithfully replay
    tail.zipWithIndex.foreach { case (v, i) =>
      require(v == replayFrom + i, s"Delta log gap: expected version ${replayFrom + i}, found $v")
    }
    val jsonChanges = tail.map { v =>
      val adds = Seq.newBuilder[(String, Map[String, String])]
      val removes = Seq.newBuilder[String]
      var schemaString: Option[String] = None
      var partCols: Option[Seq[String]] = None
      val config = Map.newBuilder[String, String]
      GraftIO.readString(s"$logDir/${pad20(v)}.json").split("\n")
        .filter(_.trim.nonEmpty).foreach { line =>
          val n = MetaJson.mapper.readTree(line)
          Option(n.get("add")).filterNot(_.isNull).foreach { a =>
            val pv = Map.newBuilder[String, String]
            Option(a.get("partitionValues")).foreach(_.fields().forEachRemaining(e =>
              pv += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())))
            adds += ((fullPath(a.get("path").asText(), root), pv.result()))
          }
          Option(n.get("remove")).filterNot(_.isNull).foreach(r =>
            removes += fullPath(r.get("path").asText(), root))
          Option(n.get("metaData")).filterNot(_.isNull).foreach { m =>
            schemaString = Option(m.get("schemaString")).map(_.asText())
            partCols = Option(m.get("partitionColumns")).map { arr =>
              val b = Seq.newBuilder[String]
              arr.elements().forEachRemaining(e => b += e.asText())
              b.result()
            }
            Option(m.get("configuration")).foreach(_.fields()
              .forEachRemaining(e =>
                if (!e.getValue.isNull) config += e.getKey -> e.getValue.asText()))
          }
        }
      VersionChange(v, adds.result(), removes.result(), schemaString, partCols,
        config.result())
    }

    val changes = cpChange.toSeq ++ jsonChanges
    require(changes.nonEmpty, s"empty Delta log: $logDir")
    // column mapping stores PHYSICAL column names (col-<uuid>) in the
    // data files: a name-mapped read against the logical schema would
    // silently produce all-NULL columns — refuse loudly instead
    // (reference BaseSnapshotDeltaLakeTableAction predates column
    // mapping and reads logical names the same way)
    changes.flatMap(_.configuration.get("delta.columnMapping.mode"))
      .lastOption.filterNot(m => m.isEmpty || m == "none").foreach(m =>
        throw new IllegalArgumentException(
          s"cannot import a Delta table with delta.columnMapping.mode=$m: " +
            "its files store physical column names, not the logical schema"))
    // latest schema wins (reference: snapshots with the UPDATED schema;
    // mid-history schema changes register under the final shape)
    val schemaString = changes.flatMap(_.schemaString).lastOption.getOrElse(
      throw new IllegalArgumentException(s"Delta log has no metaData action: $logDir"))
    val partCols = changes.flatMap(_.partitionColumns).lastOption.getOrElse(Nil)
    DeltaLog(changes, DataType.fromJson(schemaString).asInstanceOf[StructType],
      partCols)
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
