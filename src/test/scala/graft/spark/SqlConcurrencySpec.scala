package graft.spark

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Concurrency through the FULL Spark SQL path (not just the core commit
  * protocol): parallel INSERTs from many threads of one session must all
  * land (CAS retry under the hood), and a compaction racing the
  * appenders must never lose or duplicate a row. */
class SqlConcurrencySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-sqlcc-wh").toString
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-sql-concurrency")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gcc", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.gcc.warehouse", warehouse)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcc.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("parallel SQL INSERTs all land exactly once") {
    spark.sql("CREATE TABLE gcc.db.cc1 (id BIGINT, w INT)")
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val writers = (0 until 4).map { w =>
        Future {
          (0 until 5).foreach { i =>
            spark.sql(s"INSERT INTO gcc.db.cc1 VALUES (${w * 100 + i}, $w)")
          }
        }
      }
      Await.result(Future.sequence(writers), Duration.Inf)
    } finally pool.shutdown()
    val ids = spark.sql("SELECT id FROM gcc.db.cc1").collect()
      .map(_.getLong(0)).sorted.toSeq
    val expected = (for (w <- 0 until 4; i <- 0 until 5)
      yield (w * 100 + i).toLong).sorted
    assert(ids == expected, s"lost/duplicated rows: ${ids.size} vs 20")
    // every commit landed as its own snapshot
    val snaps = spark.sql("SELECT count(*) FROM gcc.db.cc1.snapshots")
      .collect()(0).getLong(0)
    assert(snaps == 20L, s"expected 20 snapshots, got $snaps")
  }

  test("compaction racing appenders neither loses nor duplicates rows") {
    spark.sql("CREATE TABLE gcc.db.cc2 (id BIGINT)")
    (0 until 4).foreach(i => spark.sql(s"INSERT INTO gcc.db.cc2 VALUES ($i)"))
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val appender = Future {
        (4 until 14).foreach { i =>
          spark.sql(s"INSERT INTO gcc.db.cc2 VALUES ($i)")
        }
      }
      val compactor = Future {
        (0 until 3).foreach { _ =>
          // conflict-validated replace: may forfeit a batch under races
          // but must never corrupt visible data
          try spark.sql(
            "CALL gcc.system.rewrite_data_files(table => 'db.cc2', min_input_files => 2)")
          catch { case _: Exception => () }
          Thread.sleep(30)
        }
      }
      Await.result(Future.sequence(Seq(appender, compactor)), Duration.Inf)
    } finally pool.shutdown()
    val ids = spark.sql("SELECT id FROM gcc.db.cc2").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 14L), s"rows after race: $ids")
  }
}
