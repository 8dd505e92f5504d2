package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Offsets-aware, delete-tolerant file splits (reference
  * OffsetsAwareSplitScanTaskIterator.java + BaseFile.java:73
  * split_offsets): a large multi-row-group parquet file carrying a DV —
  * or serving _pos — plans as MULTIPLE tasks aligned to row-group
  * boundaries, and every split derives its first-row index so delete
  * masking and _pos stay file-absolute. Before this, one DV serialized
  * the whole file onto a single task. */
class OffsetsSplitSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _
  private val N = 200000L

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-split").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-split")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    // small row groups + a small split target: one file, many groups
    spark.sql("""CREATE TABLE graft.db.spl (id BIGINT, v STRING)
      TBLPROPERTIES ('write.parquet.row-group-size-bytes'='65536',
                     'read.split.target-size'='262144',
                     'write.delete.mode'='merge-on-read')""")
    spark.range(0, N).selectExpr("id", "repeat('x', 50) AS v")
      .coalesce(1).writeTo("graft.db.spl").append()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def table = new graft.core.meta.HadoopCatalog(warehouse)
    .loadTable(Seq("db"), "spl").get

  test("split_offsets are recorded at write and round-trip the manifest") {
    val files = table.newScan().planFiles().map(_.file)
    assert(files.size === 1)
    val offs = files.head.splitOffsets
    assert(offs.size > 3, s"expected many row groups, got ${offs.size}")
    assert(offs === offs.sorted)
    assert(offs.head >= 4L && offs.last < files.head.fileSizeBytes)
  }

  test("a DV-carrying file plans >1 task and reads oracle-exact (columnar)") {
    spark.sql("DELETE FROM graft.db.spl WHERE id % 1000 = 7")
    val df = spark.table("graft.db.spl")
    assert(df.rdd.getNumPartitions > 1,
      "a delete-carrying multi-row-group file must split across tasks")
    assert(df.count() === N - N / 1000)
    val expSum = (0L until N).filterNot(_ % 1000 == 7).sum
    assert(df.agg(org.apache.spark.sql.functions.sum("id")).collect()
      .head.getLong(0) === expSum)
  }

  test("_pos stays file-absolute across splits (columnar and row paths)") {
    // the file was written in id order, so _pos == id for surviving rows
    val vec = spark.sql("SELECT _pos, id FROM graft.db.spl")
    assert(vec.rdd.getNumPartitions > 1)
    assert(vec.where("_pos <> id").count() === 0)
    assert(vec.count() === N - N / 1000)
    // row path: vectorization off exercises the nf row reader with the
    // same split tasks
    val row = spark.read.option("vectorization-enabled", "false")
      .table("graft.db.spl").selectExpr("_pos", "id")
    assert(row.rdd.getNumPartitions > 1)
    assert(row.where("_pos <> id").count() === 0)
    assert(row.count() === N - N / 1000)
  }

  test("ORC: stripe offsets recorded; a pos-delete-carrying file splits and reads exact") {
    spark.sql("""CREATE TABLE graft.db.splo (id BIGINT, v STRING)
      TBLPROPERTIES ('write.format.default'='orc',
                     'write.orc.stripe-size-bytes'='65536',
                     'read.split.target-size'='49152',
                     'format-version'='2',
                     'write.delete.mode'='merge-on-read')""")
    // high-entropy values: orc.stripe.size is an UNCOMPRESSED buffer
    // threshold, and compressible data would leave the whole file under
    // the split target
    spark.range(0, N).selectExpr("id", "sha2(cast(id AS string), 256) AS v")
      .coalesce(1).writeTo("graft.db.splo").append()
    val file = new graft.core.meta.HadoopCatalog(warehouse)
      .loadTable(Seq("db"), "splo").get
      .newScan().planFiles().map(_.file).head
    assert(file.format === "orc")
    assert(file.splitOffsets.size > 3,
      s"expected multiple stripes, got ${file.splitOffsets.size}")
    spark.sql("DELETE FROM graft.db.splo WHERE id % 1000 = 7")
    val df = spark.table("graft.db.splo")
    assert(df.rdd.getNumPartitions > 1,
      "a delete-carrying multi-stripe ORC file must split across tasks")
    assert(df.count() === N - N / 1000)
    val expSum = (0L until N).filterNot(_ % 1000 == 7).sum
    assert(df.agg(org.apache.spark.sql.functions.sum("id")).collect()
      .head.getLong(0) === expSum)
    // _pos == id (single ordered file), across splits, both read paths
    val vec = spark.sql("SELECT _pos, id FROM graft.db.splo")
    assert(vec.where("_pos <> id").count() === 0)
    val row = spark.read.option("vectorization-enabled", "false")
      .table("graft.db.splo").selectExpr("_pos", "id")
    assert(row.rdd.getNumPartitions > 1)
    assert(row.where("_pos <> id").count() === 0)
  }

  test("row-group alignment: no row is lost or duplicated at boundaries") {
    val ids = spark.table("graft.db.spl").selectExpr("id")
    assert(ids.distinct().count() === ids.count())
    // every surviving id present exactly once
    val missing = spark.range(0, N).toDF("id")
      .where("id % 1000 <> 7")
      .except(ids)
    assert(missing.count() === 0)
  }
}
