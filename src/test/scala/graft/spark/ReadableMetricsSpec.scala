package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** readable_metrics on the files/entries metadata tables (reference
  * MetricsUtil.readableMetricsSchema — MetricsUtil.java:193,354 — joined
  * at BaseFilesTable.java:56): human-readable per-column metrics, with
  * lower/upper bounds TYPED as the data column (long, string, date,
  * decimal, timestamp — not binary blobs). */
class ReadableMetricsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-rm").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-rm")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("""CREATE TABLE graft.db.rm (
      id BIGINT, name STRING, price DECIMAL(10,2), born DATE,
      at TIMESTAMP, score DOUBLE,
      addr STRUCT<city: STRING, zip: INT>)""")
    spark.sql("""INSERT INTO graft.db.rm VALUES
      (5, 'alice', CAST('12.50' AS DECIMAL(10,2)), DATE'1990-03-04',
       TIMESTAMP'2024-01-02 03:04:05', 1.5, named_struct('city','oslo','zip',150)),
      (9, 'zed', CAST('99.99' AS DECIMAL(10,2)), DATE'2001-12-31',
       TIMESTAMP'2025-06-07 08:09:10', -2.25, named_struct('city','bergen','zip',5003)),
      (2, NULL, CAST('0.01' AS DECIMAL(10,2)), DATE'1985-07-16',
       TIMESTAMP'2023-11-12 13:14:15', 7.0, named_struct('city','trondheim','zip',7010))""")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("typed lower/upper bounds per primitive column, nested fields dotted") {
    val df = spark.sql("""SELECT
        MIN(readable_metrics.id.lower_bound) AS lo_id,
        MAX(readable_metrics.id.upper_bound) AS hi_id,
        MIN(readable_metrics.name.lower_bound) AS lo_name,
        MAX(readable_metrics.name.upper_bound) AS hi_name,
        MIN(readable_metrics.price.lower_bound) AS lo_price,
        MAX(readable_metrics.price.upper_bound) AS hi_price,
        MIN(readable_metrics.born.lower_bound) AS lo_born,
        MAX(readable_metrics.born.upper_bound) AS hi_born,
        MIN(readable_metrics.at.lower_bound) AS lo_at,
        MIN(readable_metrics.score.lower_bound) AS lo_score,
        MIN(readable_metrics.`addr.zip`.lower_bound) AS lo_zip,
        MAX(readable_metrics.`addr.zip`.upper_bound) AS hi_zip
      FROM graft.db.rm.files""")
    // schema is TYPED: bounds carry the column's own types
    val sch = df.schema
    assert(sch("lo_id").dataType.typeName === "long")
    assert(sch("lo_price").dataType.typeName === "decimal(10,2)")
    assert(sch("lo_born").dataType.typeName === "date")
    assert(sch("lo_at").dataType.typeName === "timestamp")
    val r = df.collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 9L)
    assert(r.getString(2) === "alice" && r.getString(3) === "zed")
    assert(r.getDecimal(4).toPlainString === "0.01")
    assert(r.getDecimal(5).toPlainString === "99.99")
    assert(r.getDate(6).toString === "1985-07-16")
    assert(r.getDate(7).toString === "2001-12-31")
    assert(r.getTimestamp(8).toString.startsWith("2023-11-12"))
    assert(r.getDouble(9) === -2.25)
    assert(r.getInt(10) === 150 && r.getInt(11) === 7010)
  }

  test("value/null counts fold to table totals; entries carries the struct too") {
    val r = spark.sql("""SELECT
        CAST(SUM(readable_metrics.id.value_count) AS BIGINT) AS vc,
        CAST(SUM(readable_metrics.name.null_value_count) AS BIGINT) AS nulls,
        CAST(SUM(readable_metrics.id.null_value_count) AS BIGINT) AS id_nulls
      FROM graft.db.rm.files""").collect().head
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 1L) // one NULL name
    assert(r.getLong(2) === 0L)
    // the entries table joins the same struct (reference BaseEntriesTable)
    val e = spark.sql("""SELECT
        MIN(readable_metrics.id.lower_bound) AS lo,
        MAX(readable_metrics.id.upper_bound) AS hi
      FROM graft.db.rm.entries""").collect().head
    assert(e.getLong(0) === 2L && e.getLong(1) === 9L)
    // column_size serves the manifest's column_sizes entry (spec field
    // 117): on-disk bytes from the parquet footer
    val cs = spark.sql(
      "SELECT readable_metrics.id.column_size FROM graft.db.rm.files").collect()
    assert(cs.forall(r => !r.isNullAt(0) && r.getLong(0) > 0L))
    // the column_sizes map itself: every leaf accounted, total bounded
    // by the physical file size
    val tot = spark.sql("""SELECT file_size_in_bytes,
        aggregate(map_values(column_sizes), 0L, (a, v) -> a + v) AS sz
      FROM graft.db.rm.files""").collect()
    assert(tot.forall(r => r.getLong(1) > 0L && r.getLong(1) <= r.getLong(0)))
  }

  test("a column with no collected stats serves an all-null struct") {
    spark.sql("""ALTER TABLE graft.db.rm
      SET TBLPROPERTIES ('write.metadata.metrics.column.score'='none')""")
    spark.sql("""INSERT INTO graft.db.rm VALUES
      (100, 'new', CAST('5.00' AS DECIMAL(10,2)), DATE'2000-01-01',
       TIMESTAMP'2020-01-01 00:00:00', 3.5, named_struct('city','x','zip',1))""")
    val rows = spark.sql("""SELECT readable_metrics.score.lower_bound AS lo,
        readable_metrics.id.lower_bound AS id_lo,
        readable_metrics.score.column_size AS sz
      FROM graft.db.rm.files ORDER BY id_lo""").collect()
    // the new file collected nothing for score; id still has bounds.
    // column_size SURVIVES metrics mode none (reference accumulates
    // sizes before the mode check) — sizes are physical, not metrics
    assert(rows.exists(r => r.isNullAt(0) && r.getLong(1) == 100L &&
      !r.isNullAt(2) && r.getLong(2) > 0L))
  }

  test("ORC files record column_sizes too (getBytesOnDisk)") {
    spark.sql("""CREATE TABLE graft.db.rmorc (id BIGINT, name STRING)
      TBLPROPERTIES ('write.format.default'='orc')""")
    spark.sql("INSERT INTO graft.db.rmorc VALUES (1, 'a'), (2, 'b')")
    val r = spark.sql("""SELECT readable_metrics.id.column_size,
        readable_metrics.name.column_size
      FROM graft.db.rmorc.files""").collect().head
    assert(!r.isNullAt(0) && r.getLong(0) > 0L)
    assert(!r.isNullAt(1) && r.getLong(1) > 0L)
  }
}
