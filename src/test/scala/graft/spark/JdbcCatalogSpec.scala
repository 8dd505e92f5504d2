package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta.JdbcCatalog
import graft.core.types.{GField, GLong, GSchema, GString, GStruct}

/** JDBC-backed catalog over embedded Derby (reference
  * core/.../jdbc/JdbcCatalog): pointer rows with SQL compare-and-swap
  * commits, rename as a pointer update, full DSv2 surface on top. */
class JdbcCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _
  private var uri: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-jdbc-wh").toString
    uri = s"jdbc:derby:$warehouse/catalog_db;create=true"
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-jdbc")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.jcat", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.jcat.warehouse", warehouse)
      .config("spark.sql.catalog.jcat.catalog-impl", "jdbc")
      .config("spark.sql.catalog.jcat.uri", uri)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS jcat.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("create, insert, select, drop through the jdbc catalog") {
    spark.sql("""CREATE TABLE jcat.db.jt (id BIGINT, v STRING, ts TIMESTAMP)
      PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO jcat.db.jt VALUES
      (1, 'a', TIMESTAMP '2024-01-01 10:00:00'),
      (2, 'b', TIMESTAMP '2024-01-02 10:00:00')""")
    assert(spark.sql("SELECT * FROM jcat.db.jt").count() === 2)
    assert(spark.sql("SHOW TABLES IN jcat.db").collect().map(_.getString(1)).contains("jt"))

    // DML + time travel work identically to the file catalog
    spark.sql("DELETE FROM jcat.db.jt WHERE id = 1")
    assert(spark.sql("SELECT * FROM jcat.db.jt").count() === 1)
    val snaps = spark.sql("SELECT snapshot_id FROM jcat.db.jt.snapshots ORDER BY committed_at")
      .collect().map(_.getLong(0))
    assert(snaps.length === 2)
    assert(spark.sql(s"SELECT * FROM jcat.db.jt VERSION AS OF ${snaps.head}").count() === 2)
  }

  test("rename is a pointer update; data stays readable") {
    spark.sql("CREATE TABLE jcat.db.rn_src (id BIGINT)")
    spark.sql("INSERT INTO jcat.db.rn_src VALUES (1), (2), (3)")
    spark.sql("ALTER TABLE jcat.db.rn_src RENAME TO db.rn_dst")
    assert(spark.sql("SELECT COUNT(*) FROM jcat.db.rn_dst").collect()(0).getLong(0) === 3)
    intercept[Exception](spark.sql("SELECT * FROM jcat.db.rn_src").collect())
    // further writes land on the renamed pointer
    spark.sql("INSERT INTO jcat.db.rn_dst VALUES (4)")
    assert(spark.sql("SELECT COUNT(*) FROM jcat.db.rn_dst").collect()(0).getLong(0) === 4)
  }

  test("concurrent committers: SQL CAS yields a linear history, no lost commits") {
    val cat = new JdbcCatalog(warehouse, uri, "jcat")
    val schema = GSchema(GStruct(Seq(GField(1, "id", GLong), GField(2, "v", GString))))
    cat.createTable(Seq("db"), "race", schema)

    val threads = 4
    val commitsPer = 5
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until threads).foreach { ti =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            val t = cat.loadTable(Seq("db"), "race").get
            (0 until commitsPer).foreach { i =>
              t.updateProperties(Map(s"k-$ti-$i" -> "1"))
            }
          } catch { case e: Throwable => errs.add(e) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS))
    assert(errs.isEmpty, s"commit errors: ${errs}")
    val t = cat.loadTable(Seq("db"), "race").get
    // every committer's every property landed (no lost updates) and the
    // version advanced once per commit (linear history)
    val props = t.meta.properties
    assert((0 until threads).forall(ti =>
      (0 until commitsPer).forall(i => props.contains(s"k-$ti-$i"))))
    assert(t.ops.currentVersion() === 1 + threads * commitsPer)
  }

  test("duplicate create loses the insert race cleanly") {
    val cat = new JdbcCatalog(warehouse, uri, "jcat")
    val schema = GSchema(GStruct(Seq(GField(1, "id", GLong))))
    cat.createTable(Seq("db"), "dup", schema)
    intercept[IllegalStateException](cat.createTable(Seq("db"), "dup", schema))
  }
}
