package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.expr.Expr
import graft.core.meta.HadoopCatalog

/** Avro data-file format: write path with write-time column metrics, id-
  * based projection across schema evolution, MoR position deletes over
  * avro rows, format-preserving compaction (reference core/.../avro/). */
class AvroFormatSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-avro-wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-avro")
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

  private def coreTable(name: String) =
    new HadoopCatalog(warehouse).loadTable(Seq("db"), name).get

  test("avro write/read roundtrip with partitioning and all scalar types") {
    spark.sql("""CREATE TABLE graft.db.av (
      id BIGINT, name STRING, qty INT, price DOUBLE, ok BOOLEAN,
      ratio FLOAT, d DATE, ts TIMESTAMP, dec DECIMAL(10,2), bin BINARY)
      PARTITIONED BY (bucket(2, id))
      TBLPROPERTIES ('write.format.default'='avro')""")
    spark.sql("""INSERT INTO graft.db.av VALUES
      (1, 'a', 5, 1.5, true,  CAST(0.25 AS FLOAT), DATE '2024-01-01',
       TIMESTAMP '2024-01-01 10:00:00', CAST(12.34 AS DECIMAL(10,2)), X'0102'),
      (2, 'b', 7, 2.5, false, CAST(0.50 AS FLOAT), DATE '2024-02-01',
       TIMESTAMP '2024-02-01 11:00:00', CAST(56.78 AS DECIMAL(10,2)), X'0304'),
      (3, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL)""")

    val t = coreTable("av")
    val files = t.newScan().planFiles().map(_.file)
    assert(files.nonEmpty && files.forall(_.format == "avro"))

    val rows = spark.sql("SELECT * FROM graft.db.av ORDER BY id").collect()
    assert(rows.length === 3)
    assert(rows(0).getString(1) === "a")
    assert(rows(1).getInt(2) === 7)
    assert(rows(0).getBoolean(4) === true)
    assert(rows(1).getDate(6).toString === "2024-02-01")
    assert(rows(0).getDecimal(8).toString === "12.34")
    assert(rows(1).getAs[Array[Byte]](9).toSeq === Seq[Byte](3, 4))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(8))

    // write-time stats: an id=0 filter prunes every file (min id is 1)
    assert(t.newScan().filter(Expr.equalTo("id", 100L)).planFiles().isEmpty)
  }

  test("avro schema evolution: add + rename resolves by field id") {
    spark.sql("""CREATE TABLE graft.db.av_evo (id BIGINT, v STRING)
      TBLPROPERTIES ('write.format.default'='avro')""")
    spark.sql("INSERT INTO graft.db.av_evo VALUES (1, 'one')")
    spark.sql("ALTER TABLE graft.db.av_evo ADD COLUMN extra INT")
    spark.sql("INSERT INTO graft.db.av_evo VALUES (2, 'two', 22)")
    spark.sql("ALTER TABLE graft.db.av_evo RENAME COLUMN v TO label")
    spark.sql("INSERT INTO graft.db.av_evo VALUES (3, 'three', 33)")

    val rows = spark.sql(
      "SELECT id, label, extra FROM graft.db.av_evo ORDER BY id").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("one", "two", "three"))
    // column absent from the first file reads null
    assert(rows(0).isNullAt(2) && rows(1).getInt(2) === 22)
  }

  test("avro MoR delete + update, then format-preserving compaction") {
    spark.sql("""CREATE TABLE graft.db.av_mor (id BIGINT, v STRING, n INT)
      TBLPROPERTIES ('write.format.default'='avro',
                     'write.delete.mode'='merge-on-read',
                     'write.update.mode'='merge-on-read')""")
    spark.range(0, 100).selectExpr("id", "concat('v', id) AS v", "CAST(id % 10 AS INT) AS n")
      .writeTo("graft.db.av_mor").append()
    spark.sql("DELETE FROM graft.db.av_mor WHERE id % 4 = 1")
    spark.sql("UPDATE graft.db.av_mor SET n = n + 100 WHERE id % 4 = 2")

    def check(): Unit = {
      assert(spark.sql("SELECT COUNT(*) FROM graft.db.av_mor").collect()(0).getLong(0) === 75)
      val upd = spark.sql("SELECT n FROM graft.db.av_mor WHERE id = 6").collect()
      assert(upd(0).getInt(0) === 106)
      assert(spark.sql("SELECT COUNT(*) FROM graft.db.av_mor WHERE id % 4 = 1")
        .collect()(0).getLong(0) === 0)
    }
    check()

    spark.sql("CALL graft.system.rewrite_data_files('db.av_mor')")
    val t = coreTable("av_mor")
    val files = t.newScan().planFiles()
    assert(files.forall(_.file.format == "avro"), "compaction must keep avro")
    assert(files.forall(_.deletes.isEmpty), "compaction must absorb deletes")
    check()
  }

  test("avro CoW delete rewrites in-format and preserves row lineage") {
    spark.sql("""CREATE TABLE graft.db.av_cow (id BIGINT, v STRING)
      TBLPROPERTIES ('write.format.default'='avro')""")
    spark.sql("INSERT INTO graft.db.av_cow VALUES (1,'a'),(2,'b'),(3,'c')")
    val before = spark.sql("SELECT id, _row_id FROM graft.db.av_cow")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.sql("DELETE FROM graft.db.av_cow WHERE id = 2")
    val after = spark.sql("SELECT id, _row_id FROM graft.db.av_cow")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after === before - 2L,
      "survivors of a CoW rewrite must keep their _row_id")
    assert(coreTable("av_cow").newScan().planFiles()
      .forall(_.file.format == "avro"), "CoW rewrite must stay avro")
  }

  test("avro import: add_files registers external avro files by name") {
    // write avro files OUTSIDE any table (no field ids), then import
    spark.sql("""CREATE TABLE graft.db.av_src (id BIGINT, v STRING)
      TBLPROPERTIES ('write.format.default'='avro')""")
    spark.range(0, 10).selectExpr("id", "concat('v', id) AS v")
      .writeTo("graft.db.av_src").append()
    val srcData = coreTable("av_src").location + "/data"

    spark.sql("CREATE TABLE graft.db.av_imp (id BIGINT, v STRING)")
    val res = spark.sql(
      s"CALL graft.system.add_files('db.av_imp', '$srcData')").collect()(0)
    assert(res.getLong(1) === 10L)
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.av_imp").collect()(0).getLong(0) === 10)
    assert(spark.sql("SELECT v FROM graft.db.av_imp WHERE id = 7").collect()(0)
      .getString(0) === "v7")
  }

  test("avro nested types roundtrip") {
    spark.sql("""CREATE TABLE graft.db.av_nest (
      id BIGINT, s STRUCT<a: INT, b: STRING>, xs ARRAY<INT>, m MAP<STRING, INT>)
      TBLPROPERTIES ('write.format.default'='avro')""")
    spark.sql("""INSERT INTO graft.db.av_nest VALUES
      (1, named_struct('a', 1, 'b', 'x'), array(1, 2, 3), map('k1', 10, 'k2', 20))""")
    val r = spark.sql(
      "SELECT s.a, s.b, xs[1], m['k2'] FROM graft.db.av_nest").collect()(0)
    assert(r.getInt(0) === 1 && r.getString(1) === "x")
    assert(r.getInt(2) === 2 && r.getInt(3) === 20)
  }
}
