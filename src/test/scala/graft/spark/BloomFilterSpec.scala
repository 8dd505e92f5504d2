package graft.spark

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta.HadoopCatalog

/** Bloom-filter write properties (reference TableProperties
  * PARQUET_BLOOM_FILTER_* / ORC_BLOOM_FILTER_*, wired through
  * spark/.../SparkFileWriterFactory → parquet-mr '#col' conf keys):
  * the filters must actually land in the written files, not just in the
  * job conf. */
class BloomFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-bloom-wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bloom")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gbl", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.gbl.warehouse", warehouse)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbl.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def dataFiles(name: String): Seq[String] =
    new HadoopCatalog(warehouse).loadTable(Seq("db"), name).get
      .newScan().planFiles().map(_.file.path)

  test("parquet bloom filter properties reach the file footer") {
    spark.sql("""CREATE TABLE gbl.db.bf (id BIGINT, v STRING)
      TBLPROPERTIES ('write.parquet.bloom-filter-enabled.column.id'='true',
                     'write.parquet.bloom-filter-ndv.column.id'='10000',
                     'write.parquet.bloom-filter-fpp.column.id'='0.01')""")
    spark.sql("SELECT id, concat('v-', string(id)) AS v FROM range(0, 10000)")
      .coalesce(1).writeTo("gbl.db.bf").append()
    val files = dataFiles("bf")
    assert(files.nonEmpty)
    for (p <- files) {
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p), new Configuration())
      val r = ParquetFileReader.open(in)
      try {
        val cols = r.getFooter.getBlocks.get(0).getColumns
        val byPath = (0 until cols.size()).map(cols.get)
          .map(c => c.getPath.toDotString -> c).toMap
        assert(byPath("id").getBloomFilterOffset > 0,
          s"no bloom filter for 'id' in $p")
        assert(byPath("v").getBloomFilterOffset <= 0,
          s"unexpected bloom filter for 'v' in $p")
        val bloom = r.getBloomFilterDataReader(r.getFooter.getBlocks.get(0))
          .readBloomFilter(byPath("id"))
        assert(bloom != null)
        // a value that was written must test positive
        assert(bloom.findHash(bloom.hash(1234L)))
      } finally r.close()
    }
  }

  test("orc bloom filter columns grow the written file") {
    spark.sql("""CREATE TABLE gbl.db.bfo (id BIGINT, v STRING)
      TBLPROPERTIES ('write.format.default'='orc',
                     'write.orc.bloom.filter.columns'='id',
                     'write.orc.bloom.filter.fpp'='0.01')""")
    spark.sql("""CREATE TABLE gbl.db.bfo_plain (id BIGINT, v STRING)
      TBLPROPERTIES ('write.format.default'='orc')""")
    val df = spark.sql(
      "SELECT id, concat('v-', string(id)) AS v FROM range(0, 20000)")
    df.coalesce(1).writeTo("gbl.db.bfo").append()
    df.coalesce(1).writeTo("gbl.db.bfo_plain").append()
    assert(spark.sql("SELECT count(*) FROM gbl.db.bfo")
      .collect()(0).getLong(0) == 20000)
    val withBloom = dataFiles("bfo").map(p =>
      java.nio.file.Files.size(java.nio.file.Paths.get(
        p.stripPrefix("file:")))).sum
    val plain = dataFiles("bfo_plain").map(p =>
      java.nio.file.Files.size(java.nio.file.Paths.get(
        p.stripPrefix("file:")))).sum
    // the 20k-value bloom stream is kilobytes on a ~100 KB file: a
    // robust margin that the filter was written without parsing stripes
    assert(withBloom > plain + 2048,
      s"orc bloom not written: with=$withBloom plain=$plain")
  }
}
