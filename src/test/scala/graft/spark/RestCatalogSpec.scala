package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta.{RestCatalog, RestCatalogServer}
import graft.core.types.{GField, GLong, GSchema, GStruct}

/** REST catalog: server owns the metadata pointer; clients commit over
  * HTTP and see 409 conflicts as CAS failures (reference RESTCatalog +
  * CatalogHandlers). */
class RestCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _
  private var server: com.sun.net.httpserver.HttpServer = _
  private var uri: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-rest-wh").toString
    val started = RestCatalogServer.start(warehouse)
    server = started._1
    uri = started._2
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-rest")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.rcat", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.rcat.catalog-impl", "rest")
      .config("spark.sql.catalog.rcat.uri", uri)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rcat.db")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (server != null) server.stop(0)
  }

  test("create, insert, select, time travel, drop over REST") {
    spark.sql("""CREATE TABLE rcat.db.rt (id BIGINT, v STRING, ts TIMESTAMP)
      PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO rcat.db.rt VALUES
      (1, 'a', TIMESTAMP '2024-01-01 10:00:00'),
      (2, 'b', TIMESTAMP '2024-01-02 10:00:00')""")
    assert(spark.sql("SELECT * FROM rcat.db.rt").count() === 2)
    assert(spark.sql("SHOW TABLES IN rcat.db").collect().map(_.getString(1)).contains("rt"))

    spark.sql("DELETE FROM rcat.db.rt WHERE id = 1")
    assert(spark.sql("SELECT * FROM rcat.db.rt").count() === 1)
    val snaps = spark.sql(
      "SELECT snapshot_id FROM rcat.db.rt.snapshots ORDER BY committed_at")
      .collect().map(_.getLong(0))
    assert(spark.sql(s"SELECT * FROM rcat.db.rt VERSION AS OF ${snaps.head}").count() === 2)

    spark.sql("DROP TABLE rcat.db.rt")
    intercept[Exception](spark.sql("SELECT * FROM rcat.db.rt").collect())
  }

  test("server-side CAS: stale client commit gets 409 and retries cleanly") {
    val cat = RestCatalog.connect(uri)
    val schema = GSchema(GStruct(Seq(GField(1, "id", GLong))))
    cat.createTable(Seq("db"), "cas", schema)

    // two independent handles race property commits; both must land
    val t1 = cat.loadTable(Seq("db"), "cas").get
    val t2 = cat.loadTable(Seq("db"), "cas").get
    t1.updateProperties(Map("a" -> "1"))
    t2.updateProperties(Map("b" -> "2")) // stale base → 409 → retry → lands
    val t3 = cat.loadTable(Seq("db"), "cas").get
    assert(t3.meta.properties.get("a").contains("1"))
    assert(t3.meta.properties.get("b").contains("2"))
    assert(t3.ops.currentVersion() === 3)
  }

  test("duplicate create over REST is rejected") {
    val cat = RestCatalog.connect(uri)
    val schema = GSchema(GStruct(Seq(GField(1, "id", GLong))))
    cat.createTable(Seq("db"), "dup_r", schema)
    intercept[IllegalStateException](cat.createTable(Seq("db"), "dup_r", schema))
  }
}
