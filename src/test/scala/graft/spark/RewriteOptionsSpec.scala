package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** rewrite_data_files planner knobs (reference
  * BinPackRewriteFilePlanner.java:70-72 delete-file-threshold,
  * SizeBasedFileRewritePlanner.java:90-97 rewrite-all): a well-sized
  * file accumulating delete files qualifies for compaction at the
  * configured threshold, and rewrite-all is the explicit everything
  * escape hatch. */
class RewriteOptionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val warehouse = Files.createTempDirectory("graft-rwopt").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-rwopt")
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

  private def rewriteCount(call: String): Int =
    spark.sql(call).collect().head.getInt(0)

  test("delete_file_threshold: a lone well-sized file qualifies once N delete files apply") {
    // format-version 2 + file granularity: each DELETE adds a position
    // delete FILE (v3 DVs would replace each other and stay at one)
    spark.sql("""CREATE TABLE graft.db.dft (id BIGINT, v STRING)
      TBLPROPERTIES ('format-version'='2',
                     'write.delete.mode'='merge-on-read',
                     'write.delete.granularity'='file')""")
    spark.range(0, 100).selectExpr("id", "CAST(id AS STRING) AS v")
      .coalesce(1).writeTo("graft.db.dft").append()
    (1 to 3).foreach(i => spark.sql(s"DELETE FROM graft.db.dft WHERE id = $i"))
    assert(spark.table("graft.db.dft.delete_files").count() === 3L)
    // single data file: never enough small files for min_input_files=2,
    // so ONLY the delete threshold can select it
    assert(rewriteCount("""CALL graft.system.rewrite_data_files(
      table => 'db.dft', delete_file_threshold => 4)""") === 0)
    assert(rewriteCount("""CALL graft.system.rewrite_data_files(
      table => 'db.dft', delete_file_threshold => 3)""") === 1)
    // the rewrite applied and retired the deletes
    assert(spark.table("graft.db.dft.delete_files").count() === 0L)
    assert(spark.table("graft.db.dft").count() === 97L)
  }

  test("rewrite_all rewrites a single well-formed file with no deletes") {
    spark.sql("CREATE TABLE graft.db.rwa (id BIGINT)")
    spark.range(0, 50).coalesce(1).writeTo("graft.db.rwa").append()
    assert(rewriteCount(
      "CALL graft.system.rewrite_data_files(table => 'db.rwa')") === 0)
    assert(rewriteCount("""CALL graft.system.rewrite_data_files(
      table => 'db.rwa', rewrite_all => true)""") === 1)
    assert(spark.table("graft.db.rwa").count() === 50L)
  }

  test("size band: an oversized file qualifies alone and splits toward the target") {
    spark.sql("CREATE TABLE graft.db.band (id BIGINT, v STRING)")
    // one file far above a tiny target: must qualify without any deletes
    // or small-file count, and rewrite into multiple near-target files
    spark.range(0, 60000)
      .selectExpr("id", "sha2(cast(id AS string), 256) AS v")
      .coalesce(1).writeTo("graft.db.band").append()
    val before = spark.table("graft.db.band.files").count()
    assert(before === 1L)
    val r = spark.sql("""CALL graft.system.rewrite_data_files(
      table => 'db.band', target_file_size_bytes => 1048576)""").collect().head
    assert(r.getInt(0) === 1, "the oversized file must be selected")
    assert(r.getInt(1) > 1, "the rewrite must split it into several files")
    assert(spark.table("graft.db.band").count() === 60000L)
    // a file comfortably INSIDE the band does not re-qualify
    assert(rewriteCount("""CALL graft.system.rewrite_data_files(
      table => 'db.band',
      target_file_size_bytes => 1048576,
      min_file_size_bytes => 1, max_file_size_bytes => 10485760)""") === 0)
  }

  test("default threshold 1 preserves the any-delete-qualifies behavior") {
    spark.sql("""CREATE TABLE graft.db.dft1 (id BIGINT)
      TBLPROPERTIES ('format-version'='2',
                     'write.delete.mode'='merge-on-read')""")
    spark.range(0, 40).coalesce(1).writeTo("graft.db.dft1").append()
    spark.sql("DELETE FROM graft.db.dft1 WHERE id = 7")
    assert(rewriteCount(
      "CALL graft.system.rewrite_data_files(table => 'db.dft1')") === 1)
    assert(spark.table("graft.db.dft1").count() === 39L)
  }
}
