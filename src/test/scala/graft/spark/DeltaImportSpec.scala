package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta.GraftIO

/** snapshot_delta: import a Delta Lake table by replaying its public
  * `_delta_log` (reference delta-lake
  * BaseSnapshotDeltaLakeTableAction) — versions become tagged graft
  * snapshots, partition columns (absent from Delta data files) read as
  * identity-partition constants, checkpoints seed vacuumed logs. */
class DeltaImportSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-delta-wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-delta")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pad20(v: Long): String = f"$v%020d"

  /** write one parquet data file (NO partition columns — the Delta
    * layout) and return its (relativePath, size) */
  private def writeDataFile(root: String, rel: String, rows: Seq[(Long, String)]): Long = {
    val tmp = Files.createTempDirectory("delta-part").toString
    spark.createDataFrame(rows.map { case (i, v) => Row(i, v) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = GraftIO.walkFiles(tmp).filter(_.endsWith(".parquet")).head
    val dst = GraftIO.toPath(s"$root/$rel")
    Files.createDirectories(dst.getParent)
    Files.copy(GraftIO.toPath(part), dst)
    Files.size(dst)
  }

  implicit private class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.size)
      s.foreach(l.add)
      l
    }
  }

  private val schemaString = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("p", LongType))).json

  private def metaAction: String = {
    val sch = graft.core.meta.MetaJson.mapper.writeValueAsString(schemaString)
    s"""{"metaData":{"id":"test-meta-id","format":{"provider":"parquet","options":{}},"schemaString":$sch,"partitionColumns":["p"],"configuration":{},"createdTime":1700000000000}}"""
  }

  private def addAction(rel: String, p: Long, size: Long): String =
    s"""{"add":{"path":"$rel","partitionValues":{"p":"$p"},"size":$size,"modificationTime":1700000000000,"dataChange":true}}"""

  private def removeAction(rel: String): String =
    s"""{"remove":{"path":"$rel","deletionTimestamp":1700000001000,"dataChange":true}}"""

  test("snapshot_delta replays versions, fills partition constants, tags versions") {
    val root = Files.createTempDirectory("delta-src").toString
    val s0 = writeDataFile(root, "p=1/part-000.parquet", Seq((1L, "a"), (2L, "b")))
    val s1 = writeDataFile(root, "p=2/part-001.parquet", Seq((3L, "c")))
    val s2 = writeDataFile(root, "p=1/part-002.parquet", Seq((4L, "d")))
    val s3 = writeDataFile(root, "p=1/part-003.parquet", Seq((5L, "e")))
    val log = s"$root/_delta_log"
    // v0: create + two files; v1: append; v2: compaction-style replace
    GraftIO.writeString(s"$log/${pad20(0)}.json",
      Seq(metaAction,
        addAction("p=1/part-000.parquet", 1L, s0),
        addAction("p=2/part-001.parquet", 2L, s1)).mkString("\n"))
    GraftIO.writeString(s"$log/${pad20(1)}.json",
      addAction("p=1/part-002.parquet", 1L, s2))
    GraftIO.writeString(s"$log/${pad20(2)}.json",
      Seq(removeAction("p=1/part-000.parquet"),
        removeAction("p=1/part-002.parquet"),
        addAction("p=1/part-003.parquet", 1L, s3)).mkString("\n"))

    val res = spark.sql(
      s"CALL graft.system.snapshot_delta('$root', 'db.delta_t')").collect()(0)
    assert(res.getLong(0) === 4L) // files imported across versions
    assert(res.getLong(2) === 3L) // versions committed
    assert(res.getLong(3) === 2L) // latest delta version

    // final state: v2 replaced p=1 with one file holding id=5
    val rows = spark.sql(
      "SELECT id, v, p FROM graft.db.delta_t ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((3L, "c", 2L), (5L, "e", 1L)))

    // the partition column (absent from the files) reads as a constant,
    // and partition pruning works on it
    val p1 = spark.sql(
      "SELECT id FROM graft.db.delta_t WHERE p = 1 ORDER BY id").collect()
    assert(p1.map(_.getLong(0)).toSeq === Seq(5L))

    // per-version tags time-travel to each Delta version's exact state
    assert(spark.sql(
      "SELECT id FROM graft.db.delta_t VERSION AS OF 'delta-version-0' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(spark.sql(
      "SELECT id FROM graft.db.delta_t VERSION AS OF 'delta-version-1' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))

    // provenance properties (reference SNAPSHOT_SOURCE_PROP)
    val props = new graft.core.meta.HadoopCatalog(warehouse)
      .loadTable(Seq("db"), "delta_t").get.meta.properties
    assert(props.get("snapshot_source").contains("delta"))
    assert(props.get("original_location").contains(root))
  }

  test("checkpoint seeds a vacuumed log; json versions after it replay") {
    val root = Files.createTempDirectory("delta-cp-src").toString
    val s0 = writeDataFile(root, "p=1/part-cp0.parquet", Seq((10L, "x")))
    val s1 = writeDataFile(root, "p=2/part-cp1.parquet", Seq((11L, "y")))
    val s2 = writeDataFile(root, "p=3/part-new.parquet", Seq((12L, "z")))
    val log = s"$root/_delta_log"
    // checkpoint at version 3 (versions 0-3 vacuumed): state = two files.
    // A checkpoint is a parquet table of actions: nullable add/metaData
    // structs, one action per row.
    val addT = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType)))
    val metaT = StructType(Seq(
      StructField("id", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType))))
    val cpSchema = StructType(Seq(
      StructField("add", addT), StructField("metaData", metaT)))
    val cpRows = Seq(
      Row(Row("p=1/part-cp0.parquet", Map("p" -> "1"), s0), null),
      Row(Row("p=2/part-cp1.parquet", Map("p" -> "2"), s1), null),
      Row(null, Row("m-id", schemaString, Seq("p"))))
    val tmp = Files.createTempDirectory("delta-cp").toString
    spark.createDataFrame(cpRows.asJava, cpSchema)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val cpFile = GraftIO.walkFiles(tmp).filter(_.endsWith(".parquet")).head
    Files.createDirectories(GraftIO.toPath(log))
    Files.copy(GraftIO.toPath(cpFile),
      GraftIO.toPath(s"$log/${pad20(3)}.checkpoint.parquet"))
    GraftIO.writeString(s"$log/_last_checkpoint",
      s"""{"version":3,"size":3}""")
    // version 4: one more add
    GraftIO.writeString(s"$log/${pad20(4)}.json",
      addAction("p=3/part-new.parquet", 3L, s2))

    spark.sql(s"CALL graft.system.snapshot_delta('$root', 'db.delta_cp')")
    val rows = spark.sql(
      "SELECT id, p FROM graft.db.delta_cp ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((10L, 1L), (11L, 2L), (12L, 3L)))
    // checkpoint state travels as its own tagged version
    assert(spark.sql(
      "SELECT id FROM graft.db.delta_cp VERSION AS OF 'delta-version-3' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(10L, 11L))
  }

  test("field-id-bearing data files still import name-mapped with partition constants") {
    // Delta column mapping (or files converted from Iceberg) leaves
    // parquet field ids in the files; those ids are NOT graft's, so the
    // import must force name-mapped reads — otherwise the log-only
    // partition column silently reads null
    val root = Files.createTempDirectory("delta-ids-src").toString
    // a graft-written file carries parquet field ids
    val gwh = Files.createTempDirectory("delta-ids-wh").toString
    val idCat = new graft.core.meta.HadoopCatalog(gwh)
    spark.conf.set("spark.sql.catalog.gsrc",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsrc.warehouse", gwh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsrc.db")
    spark.sql("CREATE TABLE gsrc.db.src (id BIGINT, v STRING)")
    spark.range(1, 3).selectExpr("id", "char(96 + id) AS v")
      .coalesce(1).writeTo("gsrc.db.src").append()
    val srcFile = graft.core.meta.GraftIO
      .walkFiles(idCat.tableLocation(Seq("db"), "src") + "/data")
      .filter(_.endsWith(".parquet")).head
    val rel = "p=9/part-ids.parquet"
    val dst = graft.core.meta.GraftIO.toPath(s"$root/$rel")
    Files.createDirectories(dst.getParent)
    Files.copy(graft.core.meta.GraftIO.toPath(srcFile), dst)
    val log = s"$root/_delta_log"
    GraftIO.writeString(s"$log/${pad20(0)}.json",
      Seq(metaAction, addAction(rel, 9L, Files.size(dst))).mkString("\n"))
    spark.sql(s"CALL graft.system.snapshot_delta('$root', 'db.delta_ids')")
    // the registered file must be name-mapped despite carrying field ids
    val entries = new graft.core.meta.HadoopCatalog(warehouse)
      .loadTable(Seq("db"), "delta_ids").get.newScan().planFiles()
    assert(entries.map(_.file.format).toSet === Set("parquet-nm"))
    val rows = spark.sql(
      "SELECT id, v, p FROM graft.db.delta_ids ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1L, "a", 9L), (2L, "b", 9L)),
      "partition constant must fill even for field-id-bearing files")
  }

  test("multi-part checkpoints seed like single-part ones") {
    // PROTOCOL.md: a checkpoint may split into N parts named
    // <v>.checkpoint.<part-of-10>.<n-of-10>.parquet — all parts
    // together are the state
    val root = Files.createTempDirectory("delta-mpcp-src").toString
    val s0 = writeDataFile(root, "p=1/part-m0.parquet", Seq((20L, "m")))
    val s1 = writeDataFile(root, "p=2/part-m1.parquet", Seq((21L, "n")))
    val log = s"$root/_delta_log"
    val addT = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType)))
    val metaT = StructType(Seq(
      StructField("id", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType))))
    val cpSchema = StructType(Seq(
      StructField("add", addT), StructField("metaData", metaT)))
    def writePart(rows: Seq[Row], name: String): Unit = {
      val tmp = Files.createTempDirectory("delta-mpcp").toString
      spark.createDataFrame(rows.asJava, cpSchema)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = GraftIO.walkFiles(tmp).filter(_.endsWith(".parquet")).head
      Files.createDirectories(GraftIO.toPath(log))
      Files.copy(GraftIO.toPath(f), GraftIO.toPath(s"$log/$name"))
    }
    // part 1: one add + the metaData row; part 2: the other add
    writePart(Seq(
      Row(Row("p=1/part-m0.parquet", Map("p" -> "1"), s0), null),
      Row(null, Row("m-id", schemaString, Seq("p")))),
      s"${pad20(5)}.checkpoint.0000000001.0000000002.parquet")
    writePart(Seq(
      Row(Row("p=2/part-m1.parquet", Map("p" -> "2"), s1), null)),
      s"${pad20(5)}.checkpoint.0000000002.0000000002.parquet")
    GraftIO.writeString(s"$log/_last_checkpoint",
      """{"version":5,"size":3,"parts":2}""")
    spark.sql(s"CALL graft.system.snapshot_delta('$root', 'db.delta_mpcp')")
    val rows = spark.sql(
      "SELECT id, p FROM graft.db.delta_mpcp ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((20L, 1L), (21L, 2L)),
      "both checkpoint parts must contribute to the seed state")
  }

  test("changelog over imported files serves identity-partition constants") {
    // the CDC read path routes nm/im files through its own readers —
    // without the identity fill, every change row read NULL for the
    // partition column that exists only in the log/metadata
    val root = Files.createTempDirectory("delta-cdc-src").toString
    val s0 = writeDataFile(root, "p=4/part-cdc0.parquet", Seq((1L, "a"), (2L, "b")))
    val s1 = writeDataFile(root, "p=5/part-cdc1.parquet", Seq((3L, "c")))
    val log = s"$root/_delta_log"
    GraftIO.writeString(s"$log/${pad20(0)}.json",
      Seq(metaAction, addAction("p=4/part-cdc0.parquet", 4L, s0)).mkString("\n"))
    GraftIO.writeString(s"$log/${pad20(1)}.json",
      Seq(removeAction("p=4/part-cdc0.parquet"),
        addAction("p=5/part-cdc1.parquet", 5L, s1)).mkString("\n"))
    spark.sql(s"CALL graft.system.snapshot_delta('$root', 'db.delta_cdc')")
    val ch = spark.sql(
      """SELECT _change_type, id, p FROM graft.db.delta_cdc.changes
         ORDER BY _change_ordinal, _change_type, id""").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ch === Seq(
      ("INSERT", 1L, 4L), ("INSERT", 2L, 4L),
      ("DELETE", 1L, 4L), ("DELETE", 2L, 4L), ("INSERT", 3L, 5L)),
      "CDC rows over nm files must carry the partition constants")
    // column-mapped (parquet-im) files too
    val root2 = Files.createTempDirectory("delta-cdc-cm").toString
    val c0 = writeCmDataFile(root2, "part-cmc.parquet", withIds = true,
      Seq((9L, "z")))
    GraftIO.writeString(s"$root2/_delta_log/${pad20(0)}.json",
      Seq(cmMetaAction,
        s"""{"add":{"path":"part-cmc.parquet","partitionValues":{"col-ccc":"6"},"size":$c0,"modificationTime":1700000000000,"dataChange":true}}""")
        .mkString("\n"))
    spark.sql(s"CALL graft.system.snapshot_delta('$root2', 'db.delta_cdc_cm')")
    val ch2 = spark.sql(
      "SELECT _change_type, id, p FROM graft.db.delta_cdc_cm.changes").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ch2 === Seq(("INSERT", 9L, 6L)))
  }

  test("a failed mid-replay import leaves no half-created table") {
    // mapped table whose SECOND version adds an id-less file: the
    // pre-pass cannot see it, so the abort must drop what was created
    val root = Files.createTempDirectory("delta-abort").toString
    val ok0 = writeCmDataFile(root, "part-ok.parquet", withIds = true,
      Seq((1L, "a")))
    val bad = writeCmDataFile(root, "part-bad.parquet", withIds = false,
      Seq((2L, "b")))
    GraftIO.writeString(s"$root/_delta_log/${pad20(0)}.json",
      Seq(cmMetaAction,
        s"""{"add":{"path":"part-ok.parquet","partitionValues":{"col-ccc":"1"},"size":$ok0,"modificationTime":1700000000000,"dataChange":true}}""")
        .mkString("\n"))
    GraftIO.writeString(s"$root/_delta_log/${pad20(1)}.json",
      s"""{"add":{"path":"part-bad.parquet","partitionValues":{"col-ccc":"2"},"size":$bad,"modificationTime":1700000000000,"dataChange":true}}""")
    intercept[Exception](spark.sql(
      s"CALL graft.system.snapshot_delta('$root', 'db.delta_abort')"))
    assert(new graft.core.meta.HadoopCatalog(warehouse)
      .loadTable(Seq("db"), "delta_abort").isEmpty,
      "an aborted import must drop the half-created table")
    // and the name is reusable after remediation
    GraftIO.deleteTree(s"$root/_delta_log/${pad20(1)}.json")
    spark.sql(s"CALL graft.system.snapshot_delta('$root', 'db.delta_abort')")
    assert(spark.sql("SELECT count(*) FROM graft.db.delta_abort")
      .collect()(0).getLong(0) === 1L)
  }

  test("future Delta protocol versions are refused") {
    val root = Files.createTempDirectory("delta-v4").toString
    val s0 = writeDataFile(root, "part-v4.parquet", Seq((1L, "a")))
    GraftIO.writeString(s"$root/_delta_log/${pad20(0)}.json",
      Seq(metaAction,
        s"""{"protocol":{"minReaderVersion":4,"minWriterVersion":9}}""",
        addAction("part-v4.parquet", 1L, s0)).mkString("\n"))
    val e = intercept[Exception](spark.sql(
      s"CALL graft.system.snapshot_delta('$root', 'db.delta_v4')"))
    assert(e.getMessage.contains("minReaderVersion"), e.getMessage)
  }

  test("the literal string partition value 'null' survives import") {
    import graft.core.types._
    assert(DeltaImport.parsePartitionValue(GString, "null") === "null")
    assert(DeltaImport.parsePartitionValue(GString, "") === "")
    assert(DeltaImport.parsePartitionValue(GString, null) === null)
    assert(DeltaImport.parsePartitionValue(GLong, "") === null)
    assert(DeltaImport.parsePartitionValue(GLong, "7") === 7L)
  }

  test("graft DML on top of an imported Delta table (MoR over nm files)") {
    // after the import the table is a normal graft table: row-level DML
    // must work over the name-mapped files, with the identity-partition
    // constants surviving the delete-bearing and eq-masked read paths
    val root = Files.createTempDirectory("delta-dml-src").toString
    val s0 = writeDataFile(root, "p=1/part-a.parquet",
      (1L to 6L).map(i => (i, s"v$i")))
    val s1 = writeDataFile(root, "p=2/part-b.parquet",
      (7L to 9L).map(i => (i, s"v$i")))
    val log = s"$root/_delta_log"
    GraftIO.writeString(s"$log/${pad20(0)}.json",
      Seq(metaAction,
        addAction("p=1/part-a.parquet", 1L, s0),
        addAction("p=2/part-b.parquet", 2L, s1)).mkString("\n"))
    spark.sql(s"CALL graft.system.snapshot_delta('$root', 'db.delta_dml')")
    spark.sql("""ALTER TABLE graft.db.delta_dml SET TBLPROPERTIES (
      'write.delete.mode'='merge-on-read', 'write.update.mode'='merge-on-read')""")
    // MoR position delete against an nm file — the no-filter read path
    // must still fill the partition constant for surviving rows
    spark.sql("DELETE FROM graft.db.delta_dml WHERE id % 2 = 0")
    val afterDel = spark.sql(
      "SELECT id, p FROM graft.db.delta_dml ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(afterDel === Seq((1L, 1L), (3L, 1L), (5L, 1L), (7L, 2L), (9L, 2L)))
    // MoR update rewrites values; partition constants must survive
    spark.sql("UPDATE graft.db.delta_dml SET v = concat(v, '!') WHERE p = 2")
    val afterUpd = spark.sql(
      "SELECT id, v, p FROM graft.db.delta_dml WHERE p = 2 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(afterUpd === Seq((7L, "v7!", 2L), (9L, "v9!", 2L)))
    // fresh graft-written rows coexist with imported nm files
    spark.sql("INSERT INTO graft.db.delta_dml VALUES (100, 'new', 3)")
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.delta_dml WHERE p = 3")
      .collect()(0).getLong(0) === 1L)
    // NDV stats: the partition column exists only in metadata for the
    // imported files — compute_table_stats must sketch its live
    // partition values, not scan nulls
    spark.sql("CALL graft.system.compute_table_stats('db.delta_dml')")
    val props = new graft.core.meta.HadoopCatalog(warehouse)
      .loadTable(Seq("db"), "delta_dml").get.meta.properties
    assert(props.get("stats.ndv.p").exists(_.toLong === 3L),
      s"identity-source NDV must come from partition metadata: $props")
    assert(props.get("stats.ndv.id").exists(_.toLong >= 6L))
    // compaction normalizes the mixed tree and nothing changes —
    // including the partition column the imported files never carried
    // (the rewrite must materialize the constant, not bake a null)
    spark.sql("CALL graft.system.rewrite_data_files('db.delta_dml')")
    val afterCompact = spark.sql(
      "SELECT id, p FROM graft.db.delta_dml ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(afterCompact ===
      Seq((1L, 1L), (3L, 1L), (5L, 1L), (7L, 2L), (9L, 2L), (100L, 3L)))
  }

  // ---- column mapping (PROTOCOL.md): logical names in the schema,
  // physical col-<uuid> names + parquet field ids in the files
  private def cmField(name: String, dt: org.apache.spark.sql.types.DataType,
      id: Long, phys: String): StructField =
    StructField(name, dt, nullable = true, new MetadataBuilder()
      .putLong("delta.columnMapping.id", id)
      .putString("delta.columnMapping.physicalName", phys).build())

  private val cmSchemaString = StructType(Seq(
    cmField("id", LongType, 1, "col-aaa"),
    cmField("v", StringType, 2, "col-bbb"),
    cmField("p", LongType, 3, "col-ccc"))).json

  private def cmMetaAction: String = {
    val sch = graft.core.meta.MetaJson.mapper.writeValueAsString(cmSchemaString)
    s"""{"metaData":{"id":"cm","format":{"provider":"parquet","options":{}},"schemaString":$sch,"partitionColumns":["p"],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":1700000000000}}"""
  }

  /** a Delta column-mapped data file: PHYSICAL column names, parquet
    * field ids, and NO partition column */
  private def writeCmDataFile(root: String, rel: String, withIds: Boolean,
      rows: Seq[(Long, String)]): Long = {
    def fid(id: Long) =
      if (withIds) new MetadataBuilder().putLong("parquet.field.id", id).build()
      else org.apache.spark.sql.types.Metadata.empty
    val tmp = Files.createTempDirectory("delta-cm-part").toString
    val prior = spark.conf.getOption("spark.sql.parquet.fieldId.write.enabled")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    try spark.createDataFrame(rows.map { case (i, v) => Row(i, v) }.asJava,
      StructType(Seq(
        StructField("col-aaa", LongType, nullable = true, fid(1)),
        StructField("col-bbb", StringType, nullable = true, fid(2)))))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    finally prior match {
      case Some(v) => spark.conf.set("spark.sql.parquet.fieldId.write.enabled", v)
      case None => spark.conf.unset("spark.sql.parquet.fieldId.write.enabled")
    }
    val part = GraftIO.walkFiles(tmp).filter(_.endsWith(".parquet")).head
    val dst = GraftIO.toPath(s"$root/$rel")
    Files.createDirectories(dst.getParent)
    Files.copy(GraftIO.toPath(part), dst)
    Files.size(dst)
  }

  test("column-mapped Delta imports via field ids (parquet-im)") {
    val root = Files.createTempDirectory("delta-cm").toString
    val s0 = writeCmDataFile(root, "part-cm0.parquet", withIds = true,
      Seq((1L, "a"), (2L, "b")))
    val s1 = writeCmDataFile(root, "part-cm1.parquet", withIds = true,
      Seq((3L, "c")))
    // partitionValues keys are the PHYSICAL names on mapped tables
    GraftIO.writeString(s"$root/_delta_log/${pad20(0)}.json",
      Seq(cmMetaAction,
        s"""{"add":{"path":"part-cm0.parquet","partitionValues":{"col-ccc":"7"},"size":$s0,"modificationTime":1700000000000,"dataChange":true}}""",
        s"""{"add":{"path":"part-cm1.parquet","partitionValues":{"col-ccc":"8"},"size":$s1,"modificationTime":1700000000000,"dataChange":true}}""")
        .mkString("\n"))
    spark.sql(s"CALL graft.system.snapshot_delta('$root', 'db.delta_cm')")
    // registered id-mapped; reads resolve the physical columns by id
    val entries = new graft.core.meta.HadoopCatalog(warehouse)
      .loadTable(Seq("db"), "delta_cm").get.newScan().planFiles()
    assert(entries.map(_.file.format).toSet === Set("parquet-im"))
    val rows = spark.sql(
      "SELECT id, v, p FROM graft.db.delta_cm ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, "a", 7L), (2L, "b", 7L), (3L, "c", 8L)),
      "logical names must resolve physical columns; partition constants fill")
    // predicate on a data column pushes into the id-resolved read;
    // predicate on the constant-filled partition column prunes
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.delta_cm WHERE p = 7")
      .collect()(0).getLong(0) === 2L)
    // renames stay exact: field-id resolution is rename-proof
    spark.sql("ALTER TABLE graft.db.delta_cm RENAME COLUMN v TO w")
    assert(spark.sql(
      "SELECT w FROM graft.db.delta_cm WHERE id = 3").collect()(0)
      .getString(0) === "c")
    // row-level DML over parquet-im files keeps values + constants
    spark.sql("DELETE FROM graft.db.delta_cm WHERE id = 2")
    val after = spark.sql(
      "SELECT id, w, p FROM graft.db.delta_cm ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(after === Seq((1L, "a", 7L), (3L, "c", 8L)))
  }

  test("column-mapped files WITHOUT parquet field ids are refused loudly") {
    val root = Files.createTempDirectory("delta-cm-noids").toString
    val s0 = writeCmDataFile(root, "part-noids.parquet", withIds = false,
      Seq((1L, "a")))
    GraftIO.writeString(s"$root/_delta_log/${pad20(0)}.json",
      Seq(cmMetaAction,
        s"""{"add":{"path":"part-noids.parquet","partitionValues":{"col-ccc":"7"},"size":$s0,"modificationTime":1700000000000,"dataChange":true}}""")
        .mkString("\n"))
    val e = intercept[Exception](spark.sql(
      s"CALL graft.system.snapshot_delta('$root', 'db.delta_cm_noids')"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("field ids")),
      s"a mapped file without ids cannot be served: ${e.getMessage}")
  }

  test("deletion vectors are rejected before any table is created") {
    val root = Files.createTempDirectory("delta-dv").toString
    val s0 = writeDataFile(root, "part-dv.parquet", Seq((1L, "a")))
    GraftIO.writeString(s"$root/_delta_log/${pad20(0)}.json",
      Seq(metaAction,
        s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
        s"""{"add":{"path":"part-dv.parquet","partitionValues":{"p":"1"},"size":$s0,"modificationTime":1700000000000,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"ab^-aqEH.-t","offset":1,"sizeInBytes":36,"cardinality":2}}}""")
        .mkString("\n"))
    val e = intercept[Exception](spark.sql(
      s"CALL graft.system.snapshot_delta('$root', 'db.delta_dv')"))
    assert(e.getMessage.contains("deletion vector"), e.getMessage)
    // nothing was created: the guard runs in the pre-pass
    assert(new graft.core.meta.HadoopCatalog(warehouse)
      .loadTable(Seq("db"), "delta_dv").isEmpty)
    // the FEATURE alone (no DV actually present) does not block import
    val root2 = Files.createTempDirectory("delta-dv-ok").toString
    val s1 = writeDataFile(root2, "p=1/part-ok.parquet", Seq((1L, "a")))
    GraftIO.writeString(s"$root2/_delta_log/${pad20(0)}.json",
      Seq(metaAction,
        s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","timestampNtz"],"writerFeatures":[]}}""",
        addAction("p=1/part-ok.parquet", 1L, s1)).mkString("\n"))
    spark.sql(s"CALL graft.system.snapshot_delta('$root2', 'db.delta_dv_ok')")
    assert(spark.sql("SELECT count(*) FROM graft.db.delta_dv_ok")
      .collect()(0).getLong(0) === 1L)
  }

  test("unknown reader features are rejected") {
    val root = Files.createTempDirectory("delta-v2cp").toString
    val s0 = writeDataFile(root, "part-x.parquet", Seq((1L, "a")))
    GraftIO.writeString(s"$root/_delta_log/${pad20(0)}.json",
      Seq(metaAction,
        s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":[]}}""",
        addAction("part-x.parquet", 1L, s0)).mkString("\n"))
    val e = intercept[Exception](spark.sql(
      s"CALL graft.system.snapshot_delta('$root', 'db.delta_v2cp')"))
    assert(e.getMessage.contains("readerFeatures"), e.getMessage)
  }

  test("replay streams one version at a time (driver memory stays bounded)") {
    // a 1,000-version log; open() must NOT materialize the per-version
    // adds up front. Proof of laziness: corrupt a later version AFTER
    // open() returns — iteration succeeds up to it and fails only there.
    val root = Files.createTempDirectory("delta-big").toString
    val log = s"$root/_delta_log"
    val lines0 = Seq(metaAction, addAction("f-0.parquet", 0L, 10L))
    GraftIO.writeString(s"$log/${pad20(0)}.json", lines0.mkString("\n"))
    (1L until 1000L).foreach(v => GraftIO.writeString(
      s"$log/${pad20(v)}.json", addAction(s"f-$v.parquet", v % 5, 10L)))
    val (info, it) = DeltaImport.open(spark, root)
    assert(info.latestVersion === 999L)
    assert(info.partitionColumns === Seq("p"))
    // pass 1 never materialized adds; now break version 600's JSON
    GraftIO.writeString(s"$log/${pad20(600)}.json", "{not json")
    var seen = 0L
    val e = intercept[Exception] {
      it.foreach { vc =>
        assert(vc.version === seen, "versions must stream in order")
        assert(vc.adds.length === 1)
        seen += 1
      }
    }
    assert(seen === 600L,
      s"iteration must parse versions lazily, one at a time (got to $seen)")
  }

  test("log gaps and non-delta dirs are rejected") {
    val root = Files.createTempDirectory("delta-bad").toString
    intercept[Exception](spark.sql(
      s"CALL graft.system.snapshot_delta('$root', 'db.delta_bad')"))
    val s0 = writeDataFile(root, "part-0.parquet", Seq((1L, "a")))
    val log = s"$root/_delta_log"
    GraftIO.writeString(s"$log/${pad20(0)}.json",
      Seq(metaAction, addAction("part-0.parquet", 1L, s0)).mkString("\n"))
    GraftIO.writeString(s"$log/${pad20(2)}.json", // gap: no version 1
      addAction("part-0.parquet", 1L, s0))
    val e = intercept[Exception](spark.sql(
      s"CALL graft.system.snapshot_delta('$root', 'db.delta_bad')"))
    assert(e.getMessage.contains("gap"))
  }
}
