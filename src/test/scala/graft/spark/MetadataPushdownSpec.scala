package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Filter + column pushdown on the entry-level metadata tables
  * (reference BaseFilesTable.java:69-86 ManifestEvaluator over the
  * transformed spec; core/src/test/.../TestMetadataTableFilters pins the
  * matrix): a partition/spec_id/content predicate on t.files must prune
  * MANIFESTS at planning — observable as fewer input partitions — and a
  * narrow projection must stop the reader from building the expensive
  * columns (readable_metrics, bounds maps, position_deletes' `row`). */
class MetadataPushdownSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-metapush").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-metapush")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    // three commits → three manifests with disjoint partition summaries
    spark.sql("""CREATE TABLE graft.db.pp (id BIGINT, cat STRING)
      PARTITIONED BY (cat)""")
    spark.sql("INSERT INTO graft.db.pp VALUES (1, 'a')")
    spark.sql("INSERT INTO graft.db.pp VALUES (2, 'b')")
    spark.sql("INSERT INTO graft.db.pp VALUES (3, 'c'), (4, 'c')")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def coreTable(name: String) =
    new graft.core.meta.HadoopCatalog(warehouse).loadTable(Seq("db"), name).get

  test("partition predicate on t.files prunes manifests at planning") {
    val files = spark.table("graft.db.pp.files")
    assert(files.rdd.getNumPartitions === 3) // one task per manifest
    val q = files.filter(col("partition.cat") === "a")
    assert(q.rdd.getNumPartitions === 1,
      "partition summary pruning must drop the b/c manifests")
    assert(q.count() === 1L)
    assert(q.select("record_count").head().getLong(0) === 1L)
    // range predicate
    val r = files.filter(col("partition.cat") >= "c")
    assert(r.rdd.getNumPartitions === 1)
    assert(r.select("record_count").head().getLong(0) === 2L)
    // unconvertible predicates cost pruning, never rows
    val u = files.filter(col("file_path").contains("graft.db"))
    assert(u.rdd.getNumPartitions === 3)
    // the planning funnel is observable: the pruned scan reported
    // 3 total manifests, 1 scanned
    val rpt = spark.sql("""SELECT total_manifests, scanned_manifests, filter
        FROM graft.db.pp.scan_reports""").collect()
      .filter(_.getString(2).startsWith("metadata:files"))
    assert(rpt.exists(r => r.getInt(0) === 3 && r.getInt(1) === 1),
      rpt.mkString(" | "))
    // all_ variants prune through the same machinery
    val af = spark.table("graft.db.pp.all_files")
      .filter(col("partition.cat") === "a")
    assert(af.rdd.getNumPartitions === 1)
    assert(af.select("record_count").collect().map(_.getLong(0)).sum === 1L)
  }

  test("date-transformed partition predicates prune (days(ts) + DATE literal)") {
    spark.sql("""CREATE TABLE graft.db.ppt (id BIGINT, ts TIMESTAMP)
      PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO graft.db.ppt VALUES
      (1, TIMESTAMP '2024-01-01 05:00:00')""")
    spark.sql("""INSERT INTO graft.db.ppt VALUES
      (2, TIMESTAMP '2024-02-01 05:00:00'), (3, TIMESTAMP '2024-02-02 06:00:00')""")
    val files = spark.table("graft.db.ppt.files")
    assert(files.rdd.getNumPartitions === 2)
    val q = files.filter(col("partition.ts_day") >= java.sql.Date.valueOf("2024-02-01"))
    assert(q.rdd.getNumPartitions === 1,
      "the January manifest must prune on the typed date bound")
    assert(q.select("record_count").collect().map(_.getLong(0)).sum === 2L)
    val eq = files.filter(col("partition.ts_day") === java.sql.Date.valueOf("2024-01-01"))
    assert(eq.rdd.getNumPartitions === 1)
    assert(eq.count() === 1L)
  }

  test("entries prune via data_file.partition predicates") {
    val q = spark.table("graft.db.pp.entries")
      .filter(col("data_file.partition.cat") === "b")
    assert(q.rdd.getNumPartitions === 1)
    assert(q.count() === 1L)
    assert(q.select("data_file.record_count").head().getLong(0) === 1L)
  }

  test("content predicates and content-restricted kinds prune structurally") {
    spark.sql("""CREATE TABLE graft.db.ppm (id BIGINT, cat STRING)
      PARTITIONED BY (cat)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    // partition 'a' keeps a survivor so the DELETE can't take the
    // metadata-delete short-circuit (a whole-file match just drops the
    // file and leaves no delete manifest)
    spark.sql("INSERT INTO graft.db.ppm VALUES (1, 'a'), (2, 'a'), (3, 'b')")
    spark.sql("DELETE FROM graft.db.ppm WHERE id = 1")
    val files = spark.table("graft.db.ppm.files")
    assert(files.rdd.getNumPartitions === 2) // data + delete manifest
    assert(files.filter(col("content") === 0).rdd.getNumPartitions === 1)
    // delete kinds are content 1 (pos) / 2 (eq): a range predicate prunes
    // the data manifest; NotEq stays conservative like the reference
    assert(files.filter(col("content") >= 1).rdd.getNumPartitions === 1)
    assert(files.filter(col("content") =!= 0).rdd.getNumPartitions === 2)
    assert(spark.table("graft.db.ppm.data_files").rdd.getNumPartitions === 1)
    assert(spark.table("graft.db.ppm.delete_files").rdd.getNumPartitions === 1)
    // combined partition + content predicate
    val q = files.filter(col("content") === 0 && col("partition.cat") === "a")
    assert(q.count() === 1L)
  }

  test("column pruning reaches the reader tasks; count(*) is zero-width") {
    val b = new GraftMetadataTable(coreTable("pp"), "t", "files")
      .newScanBuilder(CaseInsensitiveStringMap.empty())
    val pr = b.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
    pr.pruneColumns(StructType(Seq(StructField("file_path", StringType))))
    val scan = b.build()
    assert(scan.readSchema().fieldNames.toSeq === Seq("file_path"))
    val task = scan.toBatch.planInputPartitions().head
      .asInstanceOf[ManifestReadTask]
    assert(task.columns === Some(Seq("file_path")),
      "the task must carry the pruned projection so unbuilt columns stay unbuilt")
    // SQL level: narrow and zero-width projections serve correctly
    assert(spark.sql("SELECT file_path FROM graft.db.pp.files").count() === 3L)
    assert(spark.sql("SELECT count(*) FROM graft.db.pp.files")
      .head().getLong(0) === 3L)
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.pp.entries").head().getLong(0) === 3L)
  }

  test("nested pruning narrows readable_metrics and data_file structs") {
    import org.apache.spark.sql.types._
    // SQL level: narrow projections still serve correct values
    val v = spark.sql(
      "SELECT readable_metrics.id.null_value_count FROM graft.db.pp.files")
      .collect()
    assert(v.length === 3 && v.forall(_.getLong(0) === 0L))
    assert(spark.sql(
      "SELECT sum(data_file.record_count) FROM graft.db.pp.entries")
      .head().getLong(0) === 4L)
    // direct: the scan declares and builds only the projected sub-structs
    val b = new GraftMetadataTable(coreTable("pp"), "t", "files")
      .newScanBuilder(CaseInsensitiveStringMap.empty())
    b.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
      .pruneColumns(StructType(Seq(StructField("readable_metrics",
        StructType(Seq(StructField("id", StructType(Seq(
          StructField("null_value_count", LongType))))))))))
    val scan = b.build()
    val rm = scan.readSchema()("readable_metrics").dataType
      .asInstanceOf[StructType]
    assert(rm.fieldNames.toSeq === Seq("id"),
      "only the projected metric column survives in the declared schema")
    val task = scan.toBatch.planInputPartitions().head
      .asInstanceOf[ManifestReadTask]
    assert(task.metricCols.map(_.name) === Seq("id"))
    // entries: data_file narrows the same way
    val b2 = new GraftMetadataTable(coreTable("pp"), "t", "entries")
      .newScanBuilder(CaseInsensitiveStringMap.empty())
    b2.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
      .pruneColumns(StructType(Seq(StructField("data_file",
        StructType(Seq(StructField("record_count", LongType)))))))
    val scan2 = b2.build()
    assert(scan2.readSchema()("data_file").dataType
      .asInstanceOf[StructType].fieldNames.toSeq === Seq("record_count"))
    val task2 = scan2.toBatch.planInputPartitions().head
      .asInstanceOf[ManifestReadTask]
    assert(task2.dfColumns === Some(Seq("record_count")))
  }

  test("count(*) answers from manifest-list math; LIMIT plans a prefix") {
    // count(*) pushes completely: the plan carries a LocalScan, zero
    // manifest-read tasks
    val cnt = spark.sql("SELECT count(*) FROM graft.db.pp.files")
    assert(cnt.head().getLong(0) === 3L)
    assert(cnt.queryExecution.executedPlan.toString.contains("LocalTableScan") ||
      cnt.queryExecution.executedPlan.toString.contains("graft-local"),
      cnt.queryExecution.executedPlan.toString.take(500))
    assert(spark.sql("SELECT count(*) FROM graft.db.pp.entries")
      .head().getLong(0) === 3L)
    assert(spark.sql("SELECT count(*) FROM graft.db.pp.data_files")
      .head().getLong(0) === 3L)
    assert(spark.sql("SELECT count(*) FROM graft.db.pp.delete_files")
      .head().getLong(0) === 0L)
    // a filtered count is NOT answered from counts (predicate needs rows)
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.pp.files WHERE partition.cat = 'a'")
      .head().getLong(0) === 1L)
    // LIMIT 1 plans a one-manifest prefix instead of all three
    val lim = spark.sql("SELECT file_path FROM graft.db.pp.files LIMIT 1")
    assert(lim.count() === 1L)
    val b = new GraftMetadataTable(coreTable("pp"), "t", "files")
      .newScanBuilder(CaseInsensitiveStringMap.empty())
    assert(b.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsPushDownLimit].pushLimit(1)
      === false) // Spark re-applies the exact cut
    assert(b.build().toBatch.planInputPartitions().length === 1)
  }

  test("pruning stays inclusive across evolved specs") {
    spark.sql("CREATE TABLE graft.db.ppe (id BIGINT, cat STRING)")
    spark.sql("INSERT INTO graft.db.ppe VALUES (1, 'x')") // spec 0: unpartitioned
    spark.sql("CALL graft.system.add_partition_field('db.ppe', 'identity', 'cat')")
    spark.sql("INSERT INTO graft.db.ppe VALUES (2, 'y')")
    val q = spark.table("graft.db.ppe.files")
      .filter(col("partition.cat") === "y")
    // the old-spec manifest has no summary for cat → kept (inclusive);
    // Spark's post-scan filter still drops its rows
    assert(q.rdd.getNumPartitions === 2)
    assert(q.count() === 1L)
    // spec_id prunes exactly (each manifest is single-spec here)
    val bySpec = spark.table("graft.db.ppe.files").filter(col("spec_id") === 0)
    assert(bySpec.rdd.getNumPartitions === 1)
    assert(bySpec.count() === 1L)
    // IS NULL keeps the old-spec manifest (its files have no cat value);
    // the new-spec manifest has containsNull=false and prunes
    val nulls = spark.table("graft.db.ppe.files")
      .filter(col("partition.cat").isNull)
    assert(nulls.count() === 1L)
    // IN over the three-manifest table prunes to the two named values
    val in2 = spark.table("graft.db.pp.files")
      .filter(col("partition.cat").isin("a", "c"))
    assert(in2.rdd.getNumPartitions === 2)
    assert(in2.count() === 2L)
  }

  test("partitions table prunes manifests by partition predicate, soundly") {
    spark.sql("""CREATE TABLE graft.db.ppp (id BIGINT, cat STRING)
      PARTITIONED BY (cat)""")
    spark.sql("INSERT INTO graft.db.ppp VALUES (1, 'a')")
    // 'a' spans TWO manifests: pruning must keep both or the aggregate
    // under-counts while still passing Spark's post-filter
    spark.sql("INSERT INTO graft.db.ppp VALUES (2, 'a'), (3, 'b')")
    spark.sql("INSERT INTO graft.db.ppp VALUES (4, 'c')")
    val r = spark.table("graft.db.ppp.partitions")
      .filter(col("partition.cat") === "a").collect()
    assert(r.length === 1 && r.head.getAs[Long]("record_count") === 2L)
    // direct: the fold only reads manifests that might hold 'a' — the
    // 'c'-only manifest is pruned, the two 'a'-carrying ones are kept
    val t = coreTable("ppp")
    val m = t.refresh()
    val uparts = GraftMetadataTables.unifiedPartitionFields(m)
    val ctx = GraftMetadataTables.pruneCtx(uparts, "partitions")
    val prune = graft.core.expr.Expr.bind(ctx.schema,
      graft.core.expr.Expr.equalTo("partition.cat", "a"))
    val rows = GraftMetadataTables.rowsOf("partitions", t, m, None,
      prune, Some(ctx))
    assert(rows.length === 2, "a+b partitions from the kept manifests")
    // spec_id is NOT in the partitions pruning schema (unsound there):
    // a pushed spec_id predicate must leave the fold unpruned
    val sidPrune = scala.util.Try(graft.core.expr.Expr.bind(ctx.schema,
      graft.core.expr.Expr.equalTo("spec_id", 0)))
    assert(sidPrune.isFailure)
  }

  test("changes table prunes change tasks by pushed data predicates") {
    spark.sql("""CREATE TABLE graft.db.ppc (id BIGINT, grp BIGINT)
      PARTITIONED BY (grp)""")
    spark.sql("INSERT INTO graft.db.ppc VALUES (1, 10), (2, 20)")
    spark.sql("INSERT INTO graft.db.ppc VALUES (3, 10)")
    spark.sql("DELETE FROM graft.db.ppc WHERE id = 1")
    val all = spark.table("graft.db.ppc.changes")
    val filtered = all.filter(col("grp") === 10L)
    // whole change tasks drop at planning (one task per changed file)
    assert(filtered.rdd.getNumPartitions < all.rdd.getNumPartitions,
      s"${filtered.rdd.getNumPartitions} vs ${all.rdd.getNumPartitions}")
    // and the served rows equal the post-filtered full scan
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id"), r.getAs[Long]("grp"),
        r.getAs[String]("_change_type"), r.getAs[Int]("_change_ordinal"))
    val lhs = filtered.collect().map(key).sorted
    val rhs = all.collect().filter(_.getAs[Long]("grp") == 10L).map(key).sorted
    assert(lhs.toSeq === rhs.toSeq)
    assert(lhs.nonEmpty)
  }

  test("position_deletes prunes whole delete files; row read elided") {
    spark.sql("""CREATE TABLE graft.db.ppd (id BIGINT, cat STRING)
      PARTITIONED BY (cat)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.db.ppd VALUES (1, 'a'), (2, 'a'), (3, 'b')")
    spark.sql("DELETE FROM graft.db.ppd WHERE id IN (1, 3)")
    val pd = spark.table("graft.db.ppd.position_deletes")
    assert(pd.rdd.getNumPartitions === 2) // one delete file per partition
    val q = pd.filter(col("partition.cat") === "a")
    assert(q.rdd.getNumPartitions === 1)
    assert(q.count() === 1L)
    // count(*) sums live delete-entry record counts — no content reads
    assert(spark.sql("SELECT count(*) FROM graft.db.ppd.position_deletes")
      .head().getLong(0) === 2L)
    val byPath = pd.select("delete_file_path").distinct().collect().map(_.getString(0))
    val one = pd.filter(col("delete_file_path") === byPath.head)
    assert(one.rdd.getNumPartitions === 1)
    // spec_id exact predicate keeps everything (single spec)
    assert(pd.filter(col("spec_id") === pd.select("spec_id").head().getInt(0))
      .count() === 2L)
    // an unprojected `row` must not reach the parquet reader: the scan's
    // read schema drops it and values still serve
    val b = new GraftMetadataTable(coreTable("ppd"), "t", "position_deletes")
      .newScanBuilder(CaseInsensitiveStringMap.empty())
    b.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
      .pruneColumns(StructType(Seq(StructField("file_path", StringType),
        StructField("pos", org.apache.spark.sql.types.LongType))))
    val scan = b.build()
    assert(scan.readSchema().fieldNames.toSeq === Seq("file_path", "pos"))
    assert(spark.sql(
      "SELECT file_path, pos FROM graft.db.ppd.position_deletes").count() === 2L)
  }

  test("entries serve Deleted markers; files stay live-only") {
    // reference BaseEntriesTable reads reader.entries(), NOT
    // liveEntries (ManifestGroup.java:353-356): a CoW delete's
    // status=2 markers are part of the served table, and the pushed
    // count(*) must account for them (added+existing+deleted)
    spark.sql("CREATE TABLE graft.db.pe (id BIGINT, cat STRING)")
    spark.sql("INSERT INTO graft.db.pe VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.db.pe VALUES (3, 'c')")
    spark.sql("DELETE FROM graft.db.pe WHERE id = 1") // CoW: rewrites file 1
    val e = spark.table("graft.db.pe.entries").collect()
    val statuses = e.map(_.getAs[Int]("status"))
    assert(statuses.contains(2), "the delete's status=2 marker must serve")
    // live entries == files rows; the deleted marker is extra
    val files = spark.table("graft.db.pe.files").count()
    assert(statuses.count(_ != 2).toLong === files)
    assert(e.length.toLong > files)
    // pushed count(*) includes the deleted marker — and matches rows
    assert(spark.sql("SELECT count(*) FROM graft.db.pe.entries")
      .head().getLong(0) === e.length.toLong)
    // the marker still carries its data_file payload (path of the
    // removed file) so `WHERE status = 2` is a usable tombstone query
    val removed = spark.sql(
      "SELECT data_file.file_path FROM graft.db.pe.entries WHERE status = 2")
      .collect().map(_.getString(0))
    assert(removed.length === 1 &&
      !spark.table("graft.db.pe.files").select("file_path")
        .collect().map(_.getString(0)).contains(removed.head))
    // LIMIT prefix accounting includes deleted markers: LIMIT covering
    // all entries still serves them all
    assert(spark.sql(s"SELECT * FROM graft.db.pe.entries LIMIT ${e.length}")
      .count() === e.length.toLong)
  }

  test("snapshot summary chains total-position-deletes across commits") {
    // reference SnapshotSummary totals: parent total + added - removed,
    // per delete content kind. A DV-merge that supersedes a prior DV
    // must subtract the replaced records or the total drifts upward.
    spark.sql("""CREATE TABLE graft.db.ptot (id BIGINT, cat STRING)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read',
                     'write.delete.format'='dv')""")
    // ONE data file, so a partial DELETE takes the DV path instead of
    // the whole-file metadata short-circuit
    spark.range(1, 5).selectExpr("id", "'a' AS cat").coalesce(1)
      .writeTo("graft.db.ptot").append()
    spark.sql("DELETE FROM graft.db.ptot WHERE id = 1")
    def total(): Long = spark.sql("""SELECT summary['total-position-deletes']
        FROM graft.db.ptot.snapshots ORDER BY sequence_number DESC
        LIMIT 1""").head().getString(0).toLong
    assert(total() === 1L)
    // second DELETE merges into one DV (union of 2 positions),
    // superseding the 1-record DV: total must be 2, not 3
    spark.sql("DELETE FROM graft.db.ptot WHERE id = 2")
    assert(total() === 2L)
    assert(spark.sql("SELECT count(*) FROM graft.db.ptot").head().getLong(0) === 2L)
    // the superseded DV leaves a status=2 marker in entries
    assert(spark.sql("""SELECT count(*) FROM graft.db.ptot.entries
        WHERE status = 2 AND data_file.content = 1""").head().getLong(0) >= 1L)
  }

  test("metadata scans report statistics from manifest-list counts") {
    // SupportsReportStatistics off the list counts alone: joins against
    // t.files get a real broadcast decision instead of unknown-size
    val b = new GraftMetadataTable(coreTable("pp"), "t", "files")
      .newScanBuilder(CaseInsensitiveStringMap.empty())
    val st = b.build().asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(st.numRows().getAsLong === 3L)
    assert(st.sizeInBytes().getAsLong > 0L)
    // size shrinks with column pruning (defaultSize of the served schema)
    val b2 = new GraftMetadataTable(coreTable("pp"), "t", "files")
      .newScanBuilder(CaseInsensitiveStringMap.empty())
    b2.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
      .pruneColumns(StructType(Seq(StructField("file_path", StringType))))
    val st2 = b2.build().asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(st2.numRows().getAsLong === 3L)
    assert(st2.sizeInBytes().getAsLong < st.sizeInBytes().getAsLong)
  }

  test("expire reclaims files a Deleted marker references; marker stays") {
    spark.sql("CREATE TABLE graft.db.pex (id BIGINT)")
    spark.sql("INSERT INTO graft.db.pex VALUES (1), (2)")
    spark.sql("INSERT INTO graft.db.pex VALUES (3)")
    spark.sql("DELETE FROM graft.db.pex WHERE id = 1") // CoW rewrite + marker
    val removedPath = spark.sql(
      "SELECT data_file.file_path FROM graft.db.pex.entries WHERE status = 2")
      .head().getString(0)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(removedPath)))
    val cutoff = System.currentTimeMillis() + 60000
    spark.sql(s"CALL graft.system.expire_snapshots('db.pex', ${cutoff}L, 1)")
    // only the delete snapshot survives; its status=2 marker must NOT
    // protect the removed file from cleanup (reference
    // ManifestFiles.readPaths → liveEntries on both diff sides) — a
    // marker-protected file would leak until its manifest is rewritten
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(removedPath)),
      "expire must reclaim a file only a Deleted marker references")
    // the marker itself still serves (metadata-only; no IO behind it)
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.pex.entries WHERE status = 2")
      .head().getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM graft.db.pex").head().getLong(0) === 2L)
  }
}
