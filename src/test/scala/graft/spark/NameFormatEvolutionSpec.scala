package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Regressions for the name-resolved formats (ORC, imported parquet)
  * across schema evolution corners the fuzz doesn't line up on its own:
  * rename surviving snapshot EXPIRY (write-schema ids persisted in
  * manifest entries), compaction of imported field-id-less files, and
  * equality deletes over ORC data files. */
class NameFormatEvolutionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-nfe-wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-name-format-evolution")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gnf", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.gnf.warehouse", warehouse)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnf.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("ORC rename survives snapshot expiry and compaction") {
    spark.sql("""CREATE TABLE gnf.db.oex (id BIGINT, v STRING)
      TBLPROPERTIES ('write.format.default'='orc')""")
    spark.sql("SELECT id, concat('e-', string(id)) AS v FROM range(0, 6)")
      .coalesce(1).writeTo("gnf.db.oex").append()
    spark.sql("ALTER TABLE gnf.db.oex RENAME COLUMN v TO label")
    // the adding snapshot disappears — the entry-stored write schema id
    // must keep resolving the write-time name
    spark.sql("INSERT INTO gnf.db.oex VALUES (100, 'new')")
    spark.sql("CALL gnf.system.expire_snapshots(table => 'db.oex', retain_last => 1)")
    def labels() = spark.sql("SELECT label FROM gnf.db.oex WHERE id < 6 ORDER BY id")
      .collect().map(_.getString(0)).toSeq
    assert(labels() == (0 until 6).map(i => s"e-$i"),
      s"pre-rename ORC values lost after expire: ${labels()}")
    // compaction must bake the VALUES, not nulls, into the new files
    spark.sql("CALL gnf.system.rewrite_data_files(table => 'db.oex')")
    assert(labels() == (0 until 6).map(i => s"e-$i"),
      s"pre-rename ORC values lost after compaction: ${labels()}")
  }

  test("imported parquet compacts and streams through CDC after a rename") {
    val ext = Files.createTempDirectory("nfe-ext").toString
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    spark.range(0, 8).selectExpr("id", "concat('i-', string(id)) AS v")
      .coalesce(1).write.parquet(s"$ext/b1")
    spark.conf.unset("spark.sql.parquet.fieldId.write.enabled")
    spark.sql("CREATE TABLE gnf.db.imp (id BIGINT, v STRING)")
    spark.sql(s"CALL gnf.system.add_files('db.imp', '$ext/b1')")
    spark.sql("ALTER TABLE gnf.db.imp RENAME COLUMN v TO txt")
    // changelog read over the imported (field-id-less) file
    val ch = spark.read.table("gnf.db.imp.changes")
      .selectExpr("id", "txt").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(ch == (0L until 8L).map(i => (i, s"i-$i")),
      s"changelog over imported file after rename: $ch")
    // compaction of imported files (no field ids) with the renamed schema
    spark.sql("SELECT id, concat('i-', string(id)) AS txt FROM range(8, 10)")
      .coalesce(1).writeTo("gnf.db.imp").append()
    spark.sql(
      "CALL gnf.system.rewrite_data_files(table => 'db.imp', min_input_files => 2)")
    val all = spark.sql("SELECT id, txt FROM gnf.db.imp ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(all == (0L until 10L).map(i => (i, s"i-$i")),
      s"imported values lost in compaction: $all")
  }

  test("equality deletes over an ORC table mask and survive a rename") {
    spark.sql("""CREATE TABLE gnf.db.oeq (id BIGINT, v STRING)
      TBLPROPERTIES ('write.format.default'='orc',
                     'write.delete.mode'='merge-on-read',
                     'write.delete.equality-enabled'='true')""")
    spark.sql("CALL gnf.system.set_identifier_fields('db.oeq', 'id')")
    spark.sql("SELECT id, concat('q-', string(id)) AS v FROM range(0, 8)")
      .coalesce(1).writeTo("gnf.db.oeq").append()
    spark.sql("DELETE FROM gnf.db.oeq WHERE id IN (2, 5)")
    def ids() = spark.sql("SELECT id FROM gnf.db.oeq ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids() == Seq(0L, 1L, 3L, 4L, 6L, 7L),
      s"eq-delete over ORC: ${ids()}")
    // the eq-masked full-schema read must track renames too
    spark.sql("ALTER TABLE gnf.db.oeq RENAME COLUMN v TO w")
    val rows = spark.sql("SELECT id, w FROM gnf.db.oeq ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq(0L, 1L, 3L, 4L, 6L, 7L).map(i => (i, s"q-$i")),
      s"eq-masked ORC read after rename: $rows")
  }

  test("eq-delete keys bind by field id through a key rename in rewrite") {
    spark.sql("""CREATE TABLE gnf.db.eqr (k BIGINT, v STRING)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read',
                     'write.delete.equality-enabled'='true')""")
    spark.sql("CALL gnf.system.set_identifier_fields('db.eqr', 'k')")
    spark.sql("SELECT id AS k, concat('r-', string(id)) AS v FROM range(0, 10)")
      .coalesce(1).writeTo("gnf.db.eqr").append()
    // eq-delete file stores the key under its WRITE-TIME name 'k'
    spark.sql("DELETE FROM gnf.db.eqr WHERE k IN (2, 5)")
    spark.sql("ALTER TABLE gnf.db.eqr RENAME COLUMN k TO key_id")
    // the rewrite reads the delete keys under the NEW name — only field
    // ids can bind them; a name-resolved read would see all-null keys
    // and resurrect rows 2 and 5 in the permanently compacted output
    spark.sql("CALL gnf.system.rewrite_data_files(table => 'db.eqr')")
    val rows = spark.sql("SELECT key_id FROM gnf.db.eqr ORDER BY key_id")
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(0L, 1L, 3L, 4L, 6L, 7L, 8L, 9L),
      s"deleted keys resurrected or rows lost after key rename + rewrite: $rows")
  }

  test("unknown write schema + rename: parquet rewrites via field ids") {
    spark.sql("CREATE TABLE gnf.db.uws (id BIGINT, v STRING)")
    spark.sql("SELECT id, concat('u-', string(id)) AS v FROM range(0, 3)")
      .coalesce(1).writeTo("gnf.db.uws").append()
    spark.sql("SELECT id, concat('u-', string(id)) AS v FROM range(3, 6)")
      .coalesce(1).writeTo("gnf.db.uws").append()
    spark.sql("ALTER TABLE gnf.db.uws RENAME COLUMN v TO name2")
    // simulate a pre-write-schema-id manifest entry whose adding snapshot
    // is EXPIRED (so planning's snapshot→schema fallback can't resolve it
    // either): expire history, then strip the field from every manifest
    spark.sql("CALL gnf.system.expire_snapshots(table => 'db.uws', retain_last => 1)")
    import scala.jdk.CollectionConverters._
    val metaDir = java.nio.file.Paths.get(warehouse, "db", "uws", "metadata")
    Files.list(metaDir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("manifest-"))
      .foreach { p =>
        val s = new String(Files.readAllBytes(p), "UTF-8")
          .replaceAll(""""write-schema-id":-?\d+,?""", "")
          .replaceAll(""",\}""", "}")
        Files.write(p, s.getBytes("UTF-8"))
      }
    spark.sessionState.catalogManager.catalog("gnf")
      .asInstanceOf[GraftCatalog].invalidateCache()
    // the id-resolved fallback must read the values, not nulls
    val res = spark.sql("CALL gnf.system.rewrite_data_files(table => 'db.uws')")
      .collect()(0)
    assert(res.getInt(res.fieldIndex("rewritten_data_files_count")) == 2,
      s"rewrite did not engage: $res")
    val rows = spark.sql("SELECT id, name2 FROM gnf.db.uws ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == (0L until 6L).map(i => (i, s"u-$i")),
      s"unknown-write-schema rewrite nulled renamed column: $rows")
  }

  test("unknown write schema + rename: ORC rewrite fails loudly") {
    spark.sql("""CREATE TABLE gnf.db.uwo (id BIGINT, v STRING)
      TBLPROPERTIES ('write.format.default'='orc')""")
    spark.sql("SELECT id, concat('o-', string(id)) AS v FROM range(0, 3)")
      .coalesce(1).writeTo("gnf.db.uwo").append()
    spark.sql("SELECT id, concat('o-', string(id)) AS v FROM range(3, 6)")
      .coalesce(1).writeTo("gnf.db.uwo").append()
    spark.sql("ALTER TABLE gnf.db.uwo RENAME COLUMN v TO name2")
    spark.sql("CALL gnf.system.expire_snapshots(table => 'db.uwo', retain_last => 1)")
    import scala.jdk.CollectionConverters._
    val metaDir = java.nio.file.Paths.get(warehouse, "db", "uwo", "metadata")
    Files.list(metaDir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("manifest-"))
      .foreach { p =>
        val s = new String(Files.readAllBytes(p), "UTF-8")
          .replaceAll(""""write-schema-id":-?\d+,?""", "")
          .replaceAll(""",\}""", "}")
        Files.write(p, s.getBytes("UTF-8"))
      }
    spark.sessionState.catalogManager.catalog("gnf")
      .asInstanceOf[GraftCatalog].invalidateCache()
    // ORC has no field ids to fall back on — committing a name-resolved
    // rewrite would null the renamed column permanently; fail instead
    val e = intercept[Exception] {
      spark.sql("CALL gnf.system.rewrite_data_files(table => 'db.uwo')").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("cannot be read safely by name")),
      s"expected a loud unknown-write-schema failure, got: $e")
    // nothing committed: the original files are still the table (a
    // name-resolved rewrite would have permanently nulled `name2`; the
    // transient read of an unknown-schema ORC file is a separate,
    // non-destructive limitation)
    val snaps = spark.sql("SELECT COUNT(*) FROM gnf.db.uwo.snapshots")
      .collect()(0).getLong(0)
    assert(snaps == 1L, s"rewrite must not have committed, snapshots: $snaps")
    val ids = spark.sql("SELECT id FROM gnf.db.uwo ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == (0L until 6L), s"data files lost: $ids")
  }

  test("format-version 1 iceberg-compat table reads end-to-end, time travel, embedded manifests") {
    import graft.core.meta.{GraftIO, HadoopCatalog, ManifestIO, MetaJson}
    spark.sql("""CREATE TABLE gnf.db.v1ice (id BIGINT, v STRING)
      TBLPROPERTIES ('format-version'='1', 'compatibility.format'='iceberg')""")
    spark.sql("SELECT id, concat('a-', string(id)) AS v FROM range(0, 5)")
      .coalesce(1).writeTo("gnf.db.v1ice").append()
    spark.sql("SELECT id, concat('b-', string(id)) AS v FROM range(5, 9)")
      .coalesce(1).writeTo("gnf.db.v1ice").append()
    val cat = new HadoopCatalog(warehouse)
    val t = cat.loadTable(Seq("db"), "v1ice").get
    val metaPath = t.ops.currentMetadataPath.get
    val doc = MetaJson.mapper.readTree(GraftIO.readString(metaPath))
    // v1 spec dialect: singular schema/partition-spec alongside the
    // arrays, no last-sequence-number, snapshots without sequence-number
    assert(doc.get("format-version").asInt() === 1)
    assert(!doc.has("last-sequence-number"))
    assert(doc.has("schema") && doc.has("partition-spec"))
    assert(!doc.get("snapshots").get(0).has("sequence-number"))
    assert(t.meta.currentSnapshot.get.manifestListPath.endsWith(".avro"))
    def count(sql: String): Long = spark.sql(sql).collect()(0).getLong(0)
    assert(count("SELECT count(*) FROM gnf.db.v1ice") === 9L)
    val firstId = t.meta.snapshots.head.snapshotId
    assert(count(s"SELECT count(*) FROM gnf.db.v1ice VERSION AS OF $firstId") === 5L)
    // the OLD v1 form — snapshots embedding the expanded `manifests`
    // path array instead of a manifest-list file — written back as the
    // next metadata version, the way an early-Iceberg writer left trees
    val snaps = doc.get("snapshots")
    (0 until snaps.size()).foreach { i =>
      val sn = snaps.get(i)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val mfs = ManifestIO.readList(sn.get("manifest-list").asText())
      sn.remove("manifest-list")
      val arr = sn.putArray("manifests")
      mfs.foreach(mf => arr.add(mf.path))
    }
    val metaDir = java.nio.file.Paths.get(warehouse, "db", "v1ice", "metadata")
    val nextV = metaPath.split("/").last.stripPrefix("v")
      .stripSuffix(".metadata.json").toInt + 1
    Files.write(metaDir.resolve(s"v$nextV.metadata.json"),
      doc.toString.getBytes("UTF-8"))
    Files.write(metaDir.resolve("version-hint.text"),
      nextV.toString.getBytes("UTF-8"))
    spark.sessionState.catalogManager.catalog("gnf")
      .asInstanceOf[GraftCatalog].invalidateCache()
    assert(count("SELECT count(*) FROM gnf.db.v1ice") === 9L)
    assert(count(s"SELECT count(*) FROM gnf.db.v1ice VERSION AS OF $firstId") === 5L)
    val vs = spark.sql("SELECT v FROM gnf.db.v1ice WHERE id >= 5 ORDER BY id")
      .collect().map(_.getString(0)).toSeq
    assert(vs === (5 until 9).map(i => s"b-$i"))
  }
}
