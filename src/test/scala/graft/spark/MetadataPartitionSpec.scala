package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Typed unified partition struct on the metadata tables (reference
  * Partitioning.partitionType — Partitioning.java:240-328 — consumed by
  * PartitionsTable.java:104-121, BaseFilesTable calculateSchema, and
  * PositionDeletesTable.java:114-162): `partition` is a struct unified
  * across ALL specs, typed by the transforms, so operators filter
  * `t.files WHERE partition.day >= DATE '…'` and find MoR-debt-heavy
  * partitions through the partitions table's delete counts. */
class MetadataPartitionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-metapart").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-metapart")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def coreTable(name: String) =
    new graft.core.meta.HadoopCatalog(warehouse).loadTable(Seq("db"), name).get

  test("files/entries expose a typed partition struct filterable in SQL") {
    spark.sql("""CREATE TABLE graft.db.tp (id BIGINT, cat STRING, ts TIMESTAMP)
      PARTITIONED BY (cat, days(ts))""")
    spark.sql("""INSERT INTO graft.db.tp VALUES
      (1, 'a', TIMESTAMP '2024-01-01 05:00:00'),
      (2, 'a', TIMESTAMP '2024-01-02 05:00:00'),
      (3, 'b', TIMESTAMP '2024-01-01 06:00:00')""")
    val pt = spark.table("graft.db.tp.files").schema("partition").dataType
      .asInstanceOf[StructType]
    assert(pt.fieldNames.toSeq === Seq("cat", "ts_day"))
    assert(pt("cat").dataType === org.apache.spark.sql.types.StringType)
    assert(pt("ts_day").dataType === org.apache.spark.sql.types.DateType)
    // typed predicates on both fields
    assert(spark.sql("""SELECT sum(record_count) FROM graft.db.tp.files
      WHERE partition.cat = 'a'""").head().getLong(0) === 2L)
    assert(spark.sql("""SELECT sum(record_count) FROM graft.db.tp.files
      WHERE partition.ts_day >= DATE '2024-01-02'""").head().getLong(0) === 1L)
    // entries nests the file fields as the reference's data_file struct
    // (ManifestEntry.getSchema via BaseEntriesTable.java:53-62)
    assert(spark.sql("""SELECT count(*) FROM graft.db.tp.entries
      WHERE data_file.partition.cat = 'b'""").head().getLong(0) === 1L)
    // file_sequence_number serves the file's commit sequence (graft
    // commits never separate it from the data sequence)
    assert(spark.sql("""SELECT count(*) FROM graft.db.tp.entries
      WHERE file_sequence_number = sequence_number""").head().getLong(0) > 0L)
  }

  test("unified struct spans evolved specs; old-spec files read null") {
    spark.sql("CREATE TABLE graft.db.evo (id BIGINT, cat STRING)")
    spark.sql("INSERT INTO graft.db.evo VALUES (1, 'x')") // unpartitioned spec
    spark.sql("CALL graft.system.add_partition_field('db.evo', 'identity', 'cat')")
    spark.sql("INSERT INTO graft.db.evo VALUES (2, 'y')") // cat-partitioned spec
    val rows = spark.sql("""SELECT spec_id, partition.cat FROM graft.db.evo.files
      ORDER BY spec_id""").collect()
    assert(rows.length === 2)
    assert(rows(0).isNullAt(1), "old-spec file must coerce to null")
    assert(rows(1).getString(1) === "y")
    // the partitions table groups by the UNIFIED key: old-spec file lands
    // in the null partition, new-spec file under its value
    val parts = spark.sql("""SELECT partition.cat, record_count
      FROM graft.db.evo.partitions ORDER BY partition.cat NULLS FIRST""").collect()
    assert(parts.length === 2)
    assert(parts(0).isNullAt(0) && parts(0).getLong(1) === 1L)
    assert(parts(1).getString(0) === "y" && parts(1).getLong(1) === 1L)
  }

  test("fully-unpartitioned tables drop partition (+spec_id on partitions)") {
    spark.sql("CREATE TABLE graft.db.unp (id BIGINT)")
    spark.sql("INSERT INTO graft.db.unp VALUES (1), (2), (3)")
    assert(!spark.table("graft.db.unp.files").schema.fieldNames.contains("partition"))
    val pdf = spark.table("graft.db.unp.partitions")
    assert(!pdf.schema.fieldNames.contains("partition"))
    assert(!pdf.schema.fieldNames.contains("spec_id"))
    val root = pdf.collect()
    assert(root.length === 1)
    assert(root.head.getAs[Long]("record_count") === 3L)
    assert(root.head.getAs[Int]("file_count") >= 1)
  }

  test("partitions table surfaces MoR delete debt and freshness") {
    spark.sql("""CREATE TABLE graft.db.debt (id BIGINT, cat STRING)
      PARTITIONED BY (cat)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    spark.range(0, 20).selectExpr("id", "CASE WHEN id < 10 THEN 'a' ELSE 'b' END AS cat")
      .writeTo("graft.db.debt").append()
    val appendSid = coreTable("debt").meta.currentSnapshot.get.snapshotId
    spark.sql("DELETE FROM graft.db.debt WHERE cat = 'a' AND id % 3 = 0")
    val delSid = coreTable("debt").meta.currentSnapshot.get.snapshotId
    val rows = spark.sql("""SELECT partition.cat, record_count,
        position_delete_record_count, position_delete_file_count,
        equality_delete_record_count, last_updated_snapshot_id,
        last_updated_at
      FROM graft.db.debt.partitions ORDER BY partition.cat""").collect()
    assert(rows.length === 2)
    val a = rows(0); val b = rows(1)
    assert(a.getString(0) === "a")
    assert(a.getLong(1) === 10L)     // MoR: data files untouched
    assert(a.getLong(2) === 4L)      // ids 0,3,6,9 deleted
    assert(a.getInt(3) >= 1)
    assert(a.getLong(4) === 0L)
    assert(a.getLong(5) === delSid)  // debt partition updated by the delete
    assert(!a.isNullAt(6))
    assert(b.getString(0) === "b")
    assert(b.getLong(2) === 0L && b.getInt(3) === 0)
    assert(b.getLong(5) === appendSid) // untouched partition keeps the append
  }

  test("partitions table surfaces equality-delete debt") {
    spark.sql("""CREATE TABLE graft.db.eqd (id BIGINT, cat STRING)
      PARTITIONED BY (cat)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read',
                     'write.delete.equality-enabled'='true')""")
    spark.sql("CALL graft.system.set_identifier_fields('db.eqd', 'id')")
    spark.range(0, 10).selectExpr("id", "CASE WHEN id < 5 THEN 'a' ELSE 'b' END AS cat")
      .writeTo("graft.db.eqd").append()
    spark.sql("DELETE FROM graft.db.eqd WHERE cat = 'b' AND id >= 8")
    val byCat = spark.sql("""SELECT partition.cat,
        equality_delete_record_count, equality_delete_file_count
      FROM graft.db.eqd.partitions ORDER BY partition.cat""").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(byCat("b")._1 === 2L && byCat("b")._2 >= 1)
    assert(byCat("a") === ((0L, 0)))
    // the delete files expose their equality key ids (manifest field 135)
    val eqIds = spark.sql("SELECT equality_ids FROM graft.db.eqd.delete_files")
      .collect()
    assert(eqIds.nonEmpty &&
      eqIds.forall(r => !r.isNullAt(0) && r.getSeq[Int](0).nonEmpty))
  }

  test("files exposes split_offsets/referenced_data_file; manifests split counts") {
    spark.sql("""CREATE TABLE graft.db.fcols (id BIGINT, v STRING)
      TBLPROPERTIES ('write.parquet.row-group-size-bytes'='32768',
                     'format-version'='3',
                     'write.delete.mode'='merge-on-read')""")
    spark.range(0, 30000).selectExpr("id", "repeat('x', 60) AS v").coalesce(1)
      .writeTo("graft.db.fcols").append()
    spark.sql("DELETE FROM graft.db.fcols WHERE id = 5")
    val rows = spark.sql("""SELECT content, split_offsets,
        referenced_data_file, first_row_id FROM graft.db.fcols.files""")
      .collect()
    val data = rows.find(_.getInt(0) === 0).get
    assert(data.getSeq[Long](1).size > 1, "multi-row-group file must list offsets")
    assert(!data.isNullAt(3), "v3 data file carries its first_row_id")
    val dv = rows.find(_.getInt(0) === 1).get
    assert(dv.getString(2).nonEmpty, "a DV names the data file it masks")
    // manifests: counts land in the column set of the manifest's content
    val mf = spark.sql("""SELECT content, added_data_files_count,
        added_delete_files_count FROM graft.db.fcols.manifests""").collect()
    assert(mf.filter(_.getInt(0) === 0)
      .forall(r => r.getInt(1) >= 1 && r.getInt(2) === 0))
    assert(mf.filter(_.getInt(0) === 1)
      .forall(r => r.getInt(1) === 0 && r.getInt(2) >= 1))
    assert(mf.map(_.getInt(0)).toSet === Set(0, 1))
  }

  test("manifests partition_summaries render bounds human-readable") {
    spark.sql("""CREATE TABLE graft.db.msum (id BIGINT, n BIGINT)
      PARTITIONED BY (n)""")
    spark.range(0, 6).selectExpr("id", "id % 3 + 1000 AS n")
      .writeTo("graft.db.msum").append()
    val sums = spark.sql(
      "SELECT partition_summaries FROM graft.db.msum.manifests").collect()
    assert(sums.nonEmpty && sums.forall(!_.isNullAt(0)))
    val s0 = sums.map(_.getSeq[org.apache.spark.sql.Row](0)).find(_.nonEmpty).get
    assert(s0.head.getString(2) === "1000" && s0.head.getString(3) === "1002",
      s"bounds must render as decoded values, not raw bytes: ${s0.head}")

    // Avro manifest lists store bounds as raw Appendix-D bytes — the
    // table must decode them through the spec's partition types, not
    // hex-dump little-endian longs
    spark.sql("""CREATE TABLE graft.db.msuma (id BIGINT, n BIGINT)
      PARTITIONED BY (n)
      TBLPROPERTIES ('write.manifests.format'='avro')""")
    spark.range(0, 6).selectExpr("id", "id % 3 + 1000 AS n")
      .writeTo("graft.db.msuma").append()
    val sa = spark.sql(
      "SELECT partition_summaries FROM graft.db.msuma.manifests").collect()
      .map(_.getSeq[org.apache.spark.sql.Row](0)).find(_.nonEmpty).get
    assert(sa.head.getString(2) === "1000" && sa.head.getString(3) === "1002",
      s"avro-list bounds must decode: ${sa.head}")
  }

  test("position_deletes serves partition/spec_id/delete_file_path and a row column") {
    spark.sql("""CREATE TABLE graft.db.pdp (id BIGINT, cat STRING)
      PARTITIONED BY (cat)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    spark.range(0, 12).selectExpr("id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS cat")
      .writeTo("graft.db.pdp").append()
    spark.sql("DELETE FROM graft.db.pdp WHERE id IN (0, 2, 1)")
    val pd = spark.table("graft.db.pdp.position_deletes")
    val rowT = pd.schema("row").dataType.asInstanceOf[StructType]
    assert(rowT.fieldNames.toSeq === Seq("id", "cat"))
    val byCat = pd.groupBy("partition.cat").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCat === Map("a" -> 2L, "b" -> 1L))
    val served = pd.select("spec_id", "delete_file_path", "row").collect()
    assert(served.forall(r => !r.isNullAt(0) && r.getString(1).nonEmpty))
    // graft's delete writers don't store the deleted row content
    assert(served.forall(_.isNullAt(2)))
  }

  test("v3 DVs ride position_deletes with typed partition and blob offsets") {
    spark.sql("""CREATE TABLE graft.db.pdv (id BIGINT, cat STRING)
      PARTITIONED BY (cat)
      TBLPROPERTIES ('format-version'='3',
                     'write.delete.mode'='merge-on-read')""")
    spark.range(0, 10).selectExpr("id", "CASE WHEN id < 6 THEN 'a' ELSE 'b' END AS cat")
      .coalesce(1).writeTo("graft.db.pdv").append()
    spark.sql("DELETE FROM graft.db.pdv WHERE id IN (1, 7)")
    val pd = spark.table("graft.db.pdv.position_deletes")
    assert(pd.schema.fieldNames.contains("content_offset"))
    val rows = pd.select("partition.cat", "pos", "content_offset",
      "content_size_in_bytes").collect()
    assert(rows.length === 2)
    assert(rows.map(_.getString(0)).toSet === Set("a", "b"))
    assert(rows.forall(r => !r.isNullAt(2) && r.getLong(3) > 0L))
  }

  test("drop + re-add recycles the field id; partition.<name> stays unambiguous") {
    // reference BaseUpdatePartitionSpec.recycleOrCreatePartitionField
    // (v2+): re-adding a dropped field reuses its historical field id, so
    // the unified struct never grows two fields named alike
    spark.sql("CREATE TABLE graft.db.recyc (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO graft.db.recyc VALUES (1, 'a')")
    spark.sql("CALL graft.system.drop_partition_field('db.recyc', 'cat')")
    spark.sql("INSERT INTO graft.db.recyc VALUES (2, 'b')") // unpartitioned spec
    spark.sql("CALL graft.system.add_partition_field('db.recyc', 'identity', 'cat')")
    spark.sql("INSERT INTO graft.db.recyc VALUES (3, 'c')")
    val t = coreTable("recyc")
    assert(t.meta.specs.size === 3)
    assert(t.meta.spec.fields.head.fieldId ===
      t.meta.specs.head.fields.head.fieldId, "field id must be recycled")
    val pt = spark.table("graft.db.recyc.files").schema("partition").dataType
      .asInstanceOf[StructType]
    assert(pt.fieldNames.toSeq === Seq("cat"))
    val vals = spark.sql("""SELECT partition.cat FROM graft.db.recyc.files
      ORDER BY partition.cat NULLS FIRST""").collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(vals === Seq(null, "a", "c"))
    // a NEW field must not grab a historical name of a different shape
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.add_partition_field('db.recyc', 'identity', 'id', 'cat')")
    }
    assert(e.getMessage.contains("cat"))
  }

  test("metadata tables time travel: VERSION/TIMESTAMP AS OF pins the snapshot") {
    spark.sql("""CREATE TABLE graft.db.ttm (id BIGINT, cat STRING)
      PARTITIONED BY (cat)""")
    spark.sql("INSERT INTO graft.db.ttm VALUES (1, 'a')")
    val s1 = coreTable("ttm").meta.currentSnapshot.get
    spark.sql("INSERT INTO graft.db.ttm VALUES (2, 'b'), (3, 'b')")
    // current state: 2 files / 3 rows; pinned: 1 file / 1 row
    assert(spark.sql("SELECT count(*) FROM graft.db.ttm.files")
      .head().getLong(0) >= 2L)
    assert(spark.sql(
      s"SELECT count(*) FROM graft.db.ttm.files VERSION AS OF ${s1.snapshotId}")
      .head().getLong(0) === 1L)
    val pinned = spark.sql(s"""SELECT partition.cat, record_count
      FROM graft.db.ttm.partitions VERSION AS OF ${s1.snapshotId}""").collect()
    assert(pinned.length === 1 &&
      pinned.head.getString(0) === "a" && pinned.head.getLong(1) === 1L)
    assert(spark.sql(
      s"SELECT count(*) FROM graft.db.ttm.manifests VERSION AS OF ${s1.snapshotId}")
      .head().getLong(0) === 1L)
    // refs table serves the reference's max_reference_age_in_ms column
    spark.sql("ALTER TABLE graft.db.ttm CREATE TAG keep7 RETAIN 7 DAYS")
    assert(spark.sql("""SELECT max_reference_age_in_ms FROM graft.db.ttm.refs
      WHERE name = 'keep7'""").head().getLong(0) === 7L * 24 * 3600 * 1000)
    // a branch/tag name pins too; TIMESTAMP AS OF resolves by commit time
    spark.sql(s"ALTER TABLE graft.db.ttm CREATE TAG first AS OF VERSION ${s1.snapshotId}")
    assert(spark.sql("SELECT count(*) FROM graft.db.ttm.files VERSION AS OF 'first'")
      .head().getLong(0) === 1L)
    val tsLit = new java.sql.Timestamp(s1.timestampMs).toString
    assert(spark.sql(
      s"SELECT count(*) FROM graft.db.ttm.files TIMESTAMP AS OF '$tsLit'")
      .head().getLong(0) === 1L)
    // document-level kinds keep the full document under a pin
    assert(spark.sql(
      s"SELECT count(*) FROM graft.db.ttm.snapshots VERSION AS OF ${s1.snapshotId}")
      .head().getLong(0) === 2L)
    // a pin that stops resolving (snapshot expired between resolution
    // and the read) must THROW, never silently serve current state
    spark.sql("ALTER TABLE graft.db.ttm DROP TAG first")
    spark.sql("ALTER TABLE graft.db.ttm DROP TAG keep7")
    spark.sql(
      "CALL graft.system.expire_snapshots(table => 'db.ttm', retain_last => 1)")
    val e = intercept[Exception] {
      spark.sql(
        s"SELECT count(*) FROM graft.db.ttm.files VERSION AS OF ${s1.snapshotId}")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("no longer exists") ||
      m.contains("no snapshot")), msgs(e).mkString(" | "))
    // the SQL path above usually fails at resolution time; pin the
    // scan-time TOCTOU guard directly — a pin that resolved but expired
    // before the scan's refresh must throw, never fall back to current
    val toctou = intercept[IllegalArgumentException] {
      GraftMetadataTables.pinnedManifests(coreTable("ttm").meta, Some(999999999L))
    }
    assert(toctou.getMessage.contains("no longer exists"))
  }

  test("all_* kinds honor the time-travel pin via the pinned ancestry") {
    spark.sql("""CREATE TABLE graft.db.attm (id BIGINT, cat STRING)
      PARTITIONED BY (cat)""")
    spark.sql("INSERT INTO graft.db.attm VALUES (1, 'a')")
    val s1 = coreTable("attm").meta.currentSnapshot.get
    spark.sql("INSERT INTO graft.db.attm VALUES (2, 'b'), (3, 'b')")
    // unpinned: files from BOTH snapshots
    assert(spark.sql(
      "SELECT count(DISTINCT file_path) FROM graft.db.attm.all_files")
      .head().getLong(0) >= 2L)
    // pinned: only the first snapshot's ancestry — the second append
    // must be invisible even though all_ kinds enumerate snapshots
    assert(spark.sql(s"""SELECT count(DISTINCT file_path)
        FROM graft.db.attm.all_files VERSION AS OF ${s1.snapshotId}""")
      .head().getLong(0) === 1L)
    assert(spark.sql(s"""SELECT count(*)
        FROM graft.db.attm.all_manifests VERSION AS OF ${s1.snapshotId}""")
      .head().getLong(0) === 1L)
    assert(spark.sql(s"""SELECT count(*)
        FROM graft.db.attm.all_entries VERSION AS OF ${s1.snapshotId}""")
      .head().getLong(0) === 1L)
    // a pin that doesn't resolve throws at resolution…
    val e = intercept[Exception] {
      spark.sql(
        "SELECT count(*) FROM graft.db.attm.all_files VERSION AS OF 987654321")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("no snapshot") ||
      m.contains("no longer exists")), msgs(e).mkString(" | "))
    // …and the scan-time TOCTOU guard throws too (a pin that resolved
    // but expired before the scan's refresh must never serve current
    // state as history)
    val toctou = intercept[IllegalArgumentException] {
      GraftMetadataTables.allSnapshots(coreTable("attm").meta, Some(999999999L))
    }
    assert(toctou.getMessage.contains("no longer exists"))
  }

  test("WRITE ORDERED BY registers a sort order; files carry sort_order_id") {
    spark.sql("CREATE TABLE graft.db.soid (id BIGINT, cat STRING)")
    spark.sql("INSERT INTO graft.db.soid VALUES (3, 'c'), (1, 'a')") // unsorted
    spark.sql("ALTER TABLE graft.db.soid WRITE ORDERED BY id ASC")
    spark.sql("INSERT INTO graft.db.soid VALUES (2, 'b'), (4, 'd')") // sorted
    val m = coreTable("soid").meta
    assert(m.defaultSortOrderId > 0)
    assert(m.sortOrders.exists(o =>
      o.orderId == m.defaultSortOrderId && o.fields.nonEmpty))
    val ids = spark.sql(
      "SELECT sort_order_id FROM graft.db.soid.files").collect()
    // the pre-DDL file reads null; the post-DDL file carries the id
    assert(ids.exists(_.isNullAt(0)))
    assert(ids.exists(r => !r.isNullAt(0) && r.getInt(0) == m.defaultSortOrderId))
    // key_metadata: declared for schema parity, always null (graft
    // encrypts at manifest granularity)
    assert(spark.sql("SELECT key_metadata FROM graft.db.soid.files")
      .collect().forall(_.isNullAt(0)))
    // entries nests it inside data_file
    assert(spark.sql("""SELECT count(*) FROM graft.db.soid.entries
        WHERE data_file.sort_order_id IS NOT NULL""").head().getLong(0) >= 1L)
    // a sorted compaction by the registered order stamps EVERY output
    spark.sql("""CALL graft.system.rewrite_data_files(table => 'db.soid',
      strategy => 'sort', sort_order => 'id ASC', min_input_files => 1)""")
    val after = spark.sql("SELECT sort_order_id FROM graft.db.soid.files").collect()
    assert(after.nonEmpty && after.forall(r =>
      !r.isNullAt(0) && r.getInt(0) == m.defaultSortOrderId))
    // re-running the same DDL reuses the id; a different order mints a new one
    spark.sql("ALTER TABLE graft.db.soid WRITE ORDERED BY id ASC")
    assert(coreTable("soid").meta.defaultSortOrderId == m.defaultSortOrderId)
    spark.sql("ALTER TABLE graft.db.soid WRITE ORDERED BY cat DESC")
    val m2 = coreTable("soid").meta
    assert(m2.defaultSortOrderId != m.defaultSortOrderId)
    assert(m2.sortOrders.map(_.orderId).distinct.size == m2.sortOrders.size)
    // identifiers resolve case-insensitively and backticked; explicit
    // NULLS FIRST overrides the DESC default (nulls last)
    spark.sql("ALTER TABLE graft.db.soid WRITE ORDERED BY `ID` DESC NULLS FIRST")
    val m3 = coreTable("soid").meta
    val f3 = m3.sortOrders.find(_.orderId == m3.defaultSortOrderId).get.fields.head
    assert(!f3.ascending && f3.nullsFirst)
    // WRITE UNORDERED reverts to the unsorted order
    spark.sql("ALTER TABLE graft.db.soid WRITE UNORDERED")
    assert(coreTable("soid").meta.defaultSortOrderId == 0)
  }

  test("bucket/truncate transforms keep their typed result in the struct") {
    spark.sql("""CREATE TABLE graft.db.tb (id BIGINT, name STRING)
      PARTITIONED BY (bucket(4, id), truncate(2, name))""")
    spark.sql("INSERT INTO graft.db.tb VALUES (7, 'graft'), (9, 'spark')")
    val pt = spark.table("graft.db.tb.files").schema("partition").dataType
      .asInstanceOf[StructType]
    assert(pt("id_bucket").dataType === org.apache.spark.sql.types.IntegerType)
    assert(pt("name_trunc").dataType === org.apache.spark.sql.types.StringType)
    val got = spark.sql("""SELECT partition.id_bucket, partition.name_trunc,
        record_count FROM graft.db.tb.files ORDER BY partition.name_trunc""")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._2).toSeq === Seq("gr", "sp"))
    assert(got.forall(g => g._1 >= 0 && g._1 < 4 && g._3 === 1L))
  }
}
