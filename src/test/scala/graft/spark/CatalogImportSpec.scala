package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Imports sourced from a SESSION-CATALOG table identifier (reference
  * SnapshotTableProcedure / AddFilesProcedure + SparkTableUtil
  * .getPartitions): the metastore — not `col=value` path inference — is
  * authoritative for the partition list and the values' types. Covers
  * the parquet and ORC layouts (files physically lacking their partition
  * columns), including DML and compaction on the imported table. */
class CatalogImportSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _
  private var srcRoot: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-catimp-wh").toString
    srcRoot = Files.createTempDirectory("graft-catimp-src").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-catimp")
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

  /** a partitioned session-catalog source table; p stays a typed INT in
    * the catalog (path inference would have to re-guess it) */
  private def mkSource(name: String, format: String): Unit = {
    spark.sql(s"""CREATE TABLE spark_catalog.default.$name
      (id BIGINT, v STRING, p INT) USING $format PARTITIONED BY (p)
      LOCATION '$srcRoot/$name'""")
    spark.sql(s"""INSERT INTO spark_catalog.default.$name
      SELECT id, concat('v', id), cast(id % 3 AS INT) FROM range(0, 30)""")
  }

  test("snapshot_table from a catalog identifier: partitions + types from the metastore") {
    mkSource("cat_pq", "parquet")
    spark.sql(
      "CALL graft.system.snapshot_table('default.cat_pq', 'db.imp_cat_pq')")
    // schema (incl. the partition column's TYPE) comes from the catalog
    val pField = spark.table("graft.db.imp_cat_pq").schema("p")
    assert(pField.dataType === org.apache.spark.sql.types.IntegerType)
    val got = spark.sql(
      "SELECT p, count(*), sum(id) FROM graft.db.imp_cat_pq GROUP BY p ORDER BY p")
      .collect().toSeq
    val exp = spark.sql(
      "SELECT p, count(*), sum(id) FROM spark_catalog.default.cat_pq GROUP BY p ORDER BY p")
      .collect().toSeq
    assert(got === exp)
    // identity-partitioned on the metastore's partition column
    assert(spark.sql("SELECT partition FROM graft.db.imp_cat_pq.files")
      .collect().length > 0)
  }

  test("three-part spark_catalog identifiers resolve too") {
    mkSource("cat_pq3", "parquet")
    spark.sql("CALL graft.system.snapshot_table(" +
      "'spark_catalog.default.cat_pq3', 'db.imp_cat_pq3')")
    assert(spark.sql("SELECT count(*) FROM graft.db.imp_cat_pq3")
      .collect()(0).getLong(0) === 30L)
  }

  test("ORC catalog import: missing partition columns read as constants, DML works") {
    mkSource("cat_orc", "orc")
    spark.sql(
      "CALL graft.system.snapshot_table('default.cat_orc', 'db.imp_cat_orc')")
    // the files physically lack `p` -> tagged orc-nm, constant-filled
    assert(spark.sql("SELECT file_format FROM graft.db.imp_cat_orc.files")
      .collect().forall(_.getString(0) == "orc-nm"))
    val got = spark.sql(
      "SELECT p, count(*), sum(id) FROM graft.db.imp_cat_orc GROUP BY p ORDER BY p")
      .collect().toSeq
    val exp = spark.sql(
      "SELECT p, count(*), sum(id) FROM spark_catalog.default.cat_orc GROUP BY p ORDER BY p")
      .collect().toSeq
    assert(got === exp)
    // predicates on the constant-filled column prune AND evaluate right
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.imp_cat_orc WHERE p = 1")
      .collect()(0).getLong(0) === 10L)
    // row-level DELETE over orc-nm files keeps the constants intact
    spark.sql("DELETE FROM graft.db.imp_cat_orc WHERE id % 5 = 0")
    assert(spark.sql(
      "SELECT count(*), sum(id) FROM graft.db.imp_cat_orc WHERE p = 0")
      .collect()(0) === Row(8L, 120L)) // p=0 ids 0,3..27 minus {0,15}
    // changelog rows over orc-nm files carry the constants too (the
    // CDC readers share the batch scan's identity fill); the CoW
    // delete reports whole-file changes, so assert the VALUES: every
    // change row's p equals id % 3 and none is NULL
    val ch = spark.sql(
      "SELECT id, p FROM graft.db.imp_cat_orc.changes").collect()
    assert(ch.nonEmpty)
    ch.foreach { r =>
      assert(!r.isNullAt(1) && r.getInt(1) === (r.getLong(0) % 3).toInt,
        s"CDC over orc-nm must serve partition constants, not NULLs: $r")
    }
    // compaction rewrites to parquet with the constants materialized
    spark.sql("CALL graft.system.rewrite_data_files('db.imp_cat_orc')")
    val after = spark.sql(
      "SELECT p, count(*), sum(id) FROM graft.db.imp_cat_orc GROUP BY p ORDER BY p")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(after === Seq((0, 8L, 120L), (1, 8L, 110L), (2, 8L, 130L)))
  }

  test("add_files from a catalog identifier appends with metastore partition values") {
    mkSource("cat_add", "parquet")
    spark.sql("""CREATE TABLE graft.db.add_target
      (id BIGINT, v STRING, p INT) PARTITIONED BY (p)""")
    val res = spark.sql(
      "CALL graft.system.add_files('db.add_target', 'default.cat_add')")
      .collect()(0)
    assert(res.getLong(1) === 30L, s"added_records: $res")
    assert(spark.sql(
      "SELECT count(*), sum(id) FROM graft.db.add_target WHERE p = 2")
      .collect()(0) === Row(10L, 155L))
  }

  test("add_files imports only partitions matching partition_filter") {
    mkSource("cat_pf", "parquet")
    spark.sql("""CREATE TABLE graft.db.pf_target
      (id BIGINT, v STRING, p INT) PARTITIONED BY (p)""")
    val res = spark.sql("CALL graft.system.add_files('db.pf_target', " +
      "'default.cat_pf', partition_filter => map('p', '1'))").collect()(0)
    assert(res.getLong(1) === 10L, s"only p=1 rows import: $res")
    assert(spark.sql("SELECT DISTINCT p FROM graft.db.pf_target")
      .collect().map(_.getInt(0)).toSeq === Seq(1))
    // a filter matching nothing refuses loudly
    val e = intercept[Exception](spark.sql(
      "CALL graft.system.add_files('db.pf_target', 'default.cat_pf', " +
        "partition_filter => map('p', '99'))"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("matches no partitions")))
  }

  test("directory-source partition_filter: keys fold case, values match exactly") {
    val dir = s"$warehouse/_pf_dir_src"
    // tag=a and tag=A collide on a case-insensitive filesystem (macOS
    // APFS default) — the case-exactness half of this test only means
    // something where they are distinct directories
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/case_probe"))
    assume(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/CASE_PROBE")),
      "case-insensitive filesystem: tag=a / tag=A are one directory")
    spark.range(0, 5).selectExpr("id", "'lo' AS v")
      .write.mode("overwrite").parquet(s"$dir/tag=a")
    spark.range(0, 7).selectExpr("id", "'hi' AS v")
      .write.mode("overwrite").parquet(s"$dir/tag=A")
    spark.sql("""CREATE TABLE graft.db.pf_dir
      (id BIGINT, v STRING, tag STRING) PARTITIONED BY (tag)""")
    // key 'TAG' folds to the column; value 'a' must NOT admit tag=A —
    // a different partition value
    spark.sql(s"CALL graft.system.add_files('db.pf_dir', '$dir', " +
      "partition_filter => map('TAG', 'a'))")
    val got = spark.sql("SELECT tag, count(*) FROM graft.db.pf_dir GROUP BY tag")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 5L)),
      s"value match must be exact (got $got)")
  }

  test("add_files refuses re-importing live files unless forced") {
    mkSource("cat_dup", "parquet")
    spark.sql("""CREATE TABLE graft.db.dup_target
      (id BIGINT, v STRING, p INT) PARTITIONED BY (p)""")
    spark.sql("CALL graft.system.add_files('db.dup_target', 'default.cat_dup')")
    // the same import again duplicates every row — refused by default
    // (reference AddFilesProcedure check_duplicate_files)
    val e = intercept[Exception](spark.sql(
      "CALL graft.system.add_files('db.dup_target', 'default.cat_dup')"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("already live")),
      s"duplicate import must refuse: ${e.getMessage}")
    assert(spark.sql("SELECT count(*) FROM graft.db.dup_target")
      .collect()(0).getLong(0) === 30L, "the refused import must add nothing")
    // explicit opt-out forces the duplicate registration
    spark.sql("CALL graft.system.add_files('db.dup_target', " +
      "'default.cat_dup', check_duplicate_files => false)")
    assert(spark.sql("SELECT count(*) FROM graft.db.dup_target")
      .collect()(0).getLong(0) === 60L)
  }

  test("add_files refuses a target spec that drops metastore partition columns") {
    mkSource("cat_bad", "parquet")
    spark.sql("CREATE TABLE graft.db.add_bad (id BIGINT, v STRING, p INT)")
    val e = intercept[Exception](spark.sql(
      "CALL graft.system.add_files('db.add_bad', 'default.cat_bad')"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("identity partition")),
      s"dropping metastore partition values must refuse: ${e.getMessage}")
  }

  test("null partition values (__HIVE_DEFAULT_PARTITION__) import as nulls") {
    spark.sql(s"""CREATE TABLE spark_catalog.default.cat_null
      (id BIGINT, p STRING) USING parquet PARTITIONED BY (p)
      LOCATION '$srcRoot/cat_null'""")
    spark.sql("""INSERT INTO spark_catalog.default.cat_null
      SELECT id, CASE WHEN id < 5 THEN NULL ELSE 'a' END FROM range(0, 10)""")
    spark.sql(
      "CALL graft.system.snapshot_table('default.cat_null', 'db.imp_cat_null')")
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.imp_cat_null WHERE p IS NULL")
      .collect()(0).getLong(0) === 5L)
    assert(spark.sql("SELECT count(*) FROM graft.db.imp_cat_null")
      .collect()(0).getLong(0) === 10L)
  }

  test("snapshot_table applies user-supplied properties") {
    mkSource("cat_props", "parquet")
    // NB: don't test with 'owner' — Spark treats it as a RESERVED table
    // property and hides it from SHOW TBLPROPERTIES
    spark.sql("CALL graft.system.snapshot_table('default.cat_props', " +
      "'db.imp_cat_props', properties => map('team', 'etl', 'tier', 'gold'))")
    val props = spark.sql("SHOW TBLPROPERTIES graft.db.imp_cat_props")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("team").contains("etl") && props.get("tier").contains("gold"))
  }

  test("migrate from a catalog identifier records provenance") {
    mkSource("cat_mig", "orc")
    spark.sql("CALL graft.system.migrate('default.cat_mig', 'db.imp_cat_mig')")
    assert(spark.sql("SELECT count(*) FROM graft.db.imp_cat_mig")
      .collect()(0).getLong(0) === 30L)
    val props = spark.sql(
      "SHOW TBLPROPERTIES graft.db.imp_cat_mig").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("migrated-from").contains("default.cat_mig"))
  }
}
