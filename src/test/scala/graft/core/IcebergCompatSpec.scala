package graft.core.meta

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.expr.{ColStats, PartitionSpec}
import graft.core.transform._
import graft.core.types._

/** `compatibility.format=iceberg` end-to-end: a table created with the
  * property writes spec-Avro manifests/manifest lists and Appendix-C
  * metadata JSON, so an external Iceberg Hadoop-catalog reader can load
  * the tree (v{N}.metadata.json + version-hint.text is exactly that
  * layout). Every graft operation must keep working against such a
  * tree, and flipping the property mid-life must leave a readable
  * mixed JSON/Avro tree. */
class IcebergCompatSpec extends AnyFunSuite {

  private val schema = GSchema(GStruct(Seq(
    GField(1, "id", GLong, required = true),
    GField(2, "data", GString),
    GField(3, "bucket_col", GInt))))

  private def df(path: String, partition: Seq[Any], ids: (Long, Long),
      specId: Int = 0): DataFile =
    DataFile(path, "parquet", specId, partition, recordCount = ids._2 - ids._1 + 1,
      fileSizeBytes = 1000,
      columnStats = Map(1 -> ColStats(Some(ids._2 - ids._1 + 1), Some(0L), None,
        Some(ids._1), Some(ids._2))))

  private def readJson(path: String) =
    MetaJson.mapper.readTree(GraftIO.readString(path))

  test("compat table writes spec-Avro manifests and spec-dialect metadata") {
    val wh = Files.createTempDirectory("graft-compat").toString
    val cat = new HadoopCatalog(wh)
    val spec = PartitionSpec.of(schema, "bucket_col" -> IdentityT)
    val t = cat.createTable(Seq("db"), "c1", schema, spec,
      Map("compatibility.format" -> "iceberg"))
    t.newAppend()
      .appendFile(df("f1.parquet", Seq(7), (1L, 10L)))
      .appendFile(df("f2.parquet", Seq(8), (11L, 20L)))
      .commit()

    // ---- metadata document is the spec dialect
    val metaPath = s"${t.location}/metadata/v2.metadata.json"
    val n = readJson(metaPath)
    val schemaNode = n.get("schemas").get(0)
    assert(schemaNode.get("type").asText() === "struct")
    val f0 = schemaNode.get("fields").get(0)
    assert(f0.has("type") && !f0.has("ftype"))
    assert(f0.get("type").asText() === "long")
    val snapNode = n.get("snapshots").get(0)
    assert(!snapNode.has("operation")) // nested in summary, spec-style
    assert(snapNode.get("summary").get("operation").asText() === "append")
    assert(snapNode.get("manifest-list").asText().startsWith("/")) // absolute

    // ---- manifest list + manifest are genuine Avro
    val sn = t.meta.currentSnapshot.get
    assert(sn.manifestListPath.endsWith(".avro"))
    val listBytes = Files.readAllBytes(GraftIO.toPath(sn.manifestListPath))
    assert(AvroManifests.isAvro(listBytes))
    val mfs = ManifestIO.readList(sn.manifestListPath)
    assert(mfs.size === 1)
    assert(mfs.head.path.endsWith(".avro"))
    val mfBytes = Files.readAllBytes(GraftIO.toPath(mfs.head.path))
    assert(AvroManifests.isAvro(mfBytes))

    // ---- and our reader round-trips the whole tree
    val t2 = cat.loadTable(Seq("db"), "c1").get
    assert(t2.meta.currentSnapshot.get.operation === "append")
    assert(t2.meta.schema.struct.fields.map(_.name) === Seq("id", "data", "bucket_col"))
    val entries = ManifestIO.readEntries(mfs.head)
    assert(entries.map(_.file.partition) === Seq(Seq(7), Seq(8)))
    assert(entries.head.file.columnStats(1).lower === Some(1L))
    // manifest-list partition summaries prune (Appendix-D round trip)
    val tasks = t2.newScan().planFiles()
    assert(tasks.map(_.file.path).toSet.size === 2)

    // ---- overwrite + row delta keep working on the compat tree
    t2.newOverwrite()
      .deleteFile(entries.head.file.path)
      .addFile(df("f3.parquet", Seq(7), (21L, 30L)))
      .commit()
    val afterOw = t2.refresh()
    assert(afterOw.currentSnapshot.get.operation === "overwrite")
    val liveNow = t2.newScan().planFiles().map(_.file.path).toSet
    assert(liveNow.exists(_.endsWith("f3.parquet")) &&
      !liveNow.exists(_.endsWith("f1.parquet")))
    // re-read the new metadata doc: operation still spec-nested
    val n3 = readJson(s"${t.location}/metadata/v3.metadata.json")
    val lastSnap = n3.get("snapshots").get(1)
    assert(lastSnap.get("summary").get("operation").asText() === "overwrite")
  }

  test("flipping write.manifests.format mid-life leaves a readable mixed tree") {
    val wh = Files.createTempDirectory("graft-mixed").toString
    val cat = new HadoopCatalog(wh)
    val t = cat.createTable(Seq("db"), "m1", schema)
    t.newAppend().appendFile(df("j1.parquet", Nil, (1L, 5L))).commit()
    t.updateProperties(Map("write.manifests.format" -> "avro"))
    t.newAppend().appendFile(df("a1.parquet", Nil, (6L, 9L))).commit()
    val sn = t.meta.currentSnapshot.get
    assert(sn.manifestListPath.endsWith(".avro"))
    val mfs = ManifestIO.readList(sn.manifestListPath)
    // one JSON (carried) + one Avro (fresh) manifest, both readable
    assert(mfs.size === 2)
    assert(mfs.map(_.path).exists(_.endsWith(".json")))
    assert(mfs.map(_.path).exists(_.endsWith(".avro")))
    val files = t.newScan().planFiles().map(_.file.path).toSet
    assert(files.map(p => p.substring(p.lastIndexOf('/') + 1)) ===
      Set("j1.parquet", "a1.parquet"))
    // totals stay exact across the mixed list
    assert(sn.summary("total-records") === "9")
    // flip back to JSON: a third append carries the Avro manifest fine
    t.updateProperties(Map("write.manifests.format" -> "json"))
    t.newAppend().appendFile(df("j2.parquet", Nil, (10L, 10L))).commit()
    assert(t.meta.currentSnapshot.get.manifestListPath.endsWith(".json"))
    assert(t.newScan().planFiles().size === 3)
  }

  test("compat column defaults: literals serialize, non-literals fail loudly") {
    val wh = Files.createTempDirectory("graft-compat-def").toString
    val cat = new HadoopCatalog(wh)
    val withDefaults = GSchema(GStruct(Seq(
      GField(1, "id", GLong, required = true),
      GField(2, "d", GDate, required = false,
        initialDefaultSql = Some("DATE '2020-01-01'"),
        writeDefaultSql = Some("DATE '2020-01-01'")),
      GField(3, "n", GInt, required = false,
        initialDefaultSql = Some("42")),
      GField(4, "ts", GTimestamp(), required = false,
        initialDefaultSql = Some("TIMESTAMP '2021-06-01 10:30:00'")),
      GField(5, "amt", GDecimal(10, 2), required = false,
        initialDefaultSql = Some("42.50")))))
    val t = cat.createTable(Seq("db"), "cdef", withDefaults,
      PartitionSpec.Unpartitioned, Map("compatibility.format" -> "iceberg"))
    // typed DATE literal → spec single-value JSON (unquoted text)
    val n = readJson(s"${t.location}/metadata/v1.metadata.json")
    val fields = n.get("schemas").get(0).get("fields")
    assert(fields.get(1).get("initial-default").asText() === "2020-01-01")
    assert(fields.get(1).get("write-default").asText() === "2020-01-01")
    assert(fields.get(2).get("initial-default").asInt() === 42)
    // spec single-value timestamps are ISO-8601: SQL space becomes 'T'
    assert(fields.get(3).get("initial-default").asText() === "2021-06-01T10:30:00")
    // decimals keep exact scale in the DOCUMENT (BigDecimal, not a
    // double) — assert on the raw text; a plain read-back parses floats
    // as doubles and would hide a scale-losing writer
    assert(GraftIO.readString(s"${t.location}/metadata/v1.metadata.json")
      .contains("42.50"))
    // a default the compat dialect cannot represent must FAIL the write —
    // omitting it would make external readers fill NULL where graft
    // applies the default (silent wrong data on the interop path)
    val bad = GSchema(GStruct(Seq(
      GField(1, "id", GLong, required = true),
      GField(2, "ts", GTimestamp(), required = false,
        initialDefaultSql = Some("current_timestamp()")))))
    val e = intercept[IllegalStateException] {
      cat.createTable(Seq("db"), "cbad", bad, PartitionSpec.Unpartitioned,
        Map("compatibility.format" -> "iceberg"))
    }
    assert(e.getMessage.contains("current_timestamp()"))
    // a quoted-string EXPRESSION ('a' || 'b' starts and ends with a
    // quote) must fail too, not be mangled into the string "a' || 'b"
    val expr = GSchema(GStruct(Seq(
      GField(1, "id", GLong, required = true),
      GField(2, "s", GString, required = false,
        initialDefaultSql = Some("'a' || 'b'")))))
    val e2 = intercept[IllegalStateException] {
      cat.createTable(Seq("db"), "cexpr", expr, PartitionSpec.Unpartitioned,
        Map("compatibility.format" -> "iceberg"))
    }
    assert(e2.getMessage.contains("'a' || 'b'"))
    // while a string literal with a doubled-quote ESCAPE still serializes
    val esc = GSchema(GStruct(Seq(
      GField(1, "id", GLong, required = true),
      GField(2, "s", GString, required = false,
        initialDefaultSql = Some("'it''s'")))))
    val t2 = cat.createTable(Seq("db"), "cesc", esc,
      PartitionSpec.Unpartitioned, Map("compatibility.format" -> "iceberg"))
    val n2 = readJson(s"${t2.location}/metadata/v1.metadata.json")
    assert(n2.get("schemas").get(0).get("fields").get(1)
      .get("initial-default").asText() === "it's")
  }

  test("compat metadata round-trips through readMetadata exactly") {
    val wh = Files.createTempDirectory("graft-compat-rt").toString
    val cat = new HadoopCatalog(wh)
    val spec = PartitionSpec.of(schema, "id" -> BucketT(16))
    val t = cat.createTable(Seq("db"), "rt", schema, spec,
      Map("compatibility.format" -> "iceberg", "k" -> "v"))
    t.newAppend().appendFile(df("f.parquet", Seq(3), (1L, 2L))).commit()
    val m = t.meta
    val m2 = MetaJson.readMetadata(MetaJson.writeMetadata(m))
    assert(m2.tableUuid === m.tableUuid)
    assert(m2.schemas === m.schemas)
    assert(m2.specs === m.specs)
    assert(m2.sortOrders === m.sortOrders)
    assert(m2.properties === m.properties)
    assert(m2.snapshots.map(s => (s.snapshotId, s.sequenceNumber, s.operation,
      s.manifestListPath, s.summary)) ===
      m.snapshots.map(s => (s.snapshotId, s.sequenceNumber, s.operation,
        s.manifestListPath, s.summary)))
    assert(m2.refs === m.refs)
    assert(m2.snapshotLog === m.snapshotLog)
  }

  // statistics entries: the reference's StatisticsFileParser REQUIRES
  // file-footer-size-in-bytes and blob-metadata — a compat document
  // missing them fails a genuine reader; and both dialects must
  // round-trip them losslessly
  test("statistics entries carry footer size + blob metadata in both dialects") {
    val wh = Files.createTempDirectory("graft-compat-st").toString
    val cat = new HadoopCatalog(wh)
    val t = cat.createTable(Seq("db"), "st", schema, PartitionSpec.Unpartitioned,
      Map("compatibility.format" -> "iceberg"))
    t.newAppend().appendFile(df("f.parquet", Nil, (1L, 5L))).commit()
    val sid = t.meta.currentSnapshot.get.snapshotId
    val stats = StatisticsFile(sid, s"${t.location}/metadata/x.stats.puffin",
      1234L, 222L, Seq(StatBlobMeta("apache-datasketches-theta-v1", sid, 1L,
        Seq(1, 2), Map("ndv" -> "42"))))
    t.commitUpdate(b => b.copy(statistics = Seq(stats)))

    val n = readJson(t.ops.currentMetadataPath.get)
    val e = n.get("statistics").get(0)
    assert(e.get("file-footer-size-in-bytes").asLong() === 222L)
    val b = e.get("blob-metadata").get(0)
    assert(b.get("type").asText() === "apache-datasketches-theta-v1")
    assert(b.get("snapshot-id").asLong() === sid)
    assert(b.get("sequence-number").asLong() === 1L)
    assert(b.get("fields").get(1).asInt() === 2)
    assert(b.get("properties").get("ndv").asText() === "42")
    // spec-dialect parse-back
    assert(MetaJson.readMetadata(MetaJson.writeMetadata(t.meta)).statistics
      === Seq(stats))
    // graft-dialect parse-back (flip compat off, rewrite, re-read)
    t.commitUpdate(b => b.copy(properties = b.properties - "compatibility.format"))
    val m3 = MetaJson.readMetadata(MetaJson.writeMetadata(t.meta))
    assert(m3.statistics === Seq(stats))
  }
}
