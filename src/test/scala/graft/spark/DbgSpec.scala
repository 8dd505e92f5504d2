package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DbgSpec extends AnyFunSuite {
  test("explain mor delete") {
    val warehouse = Files.createTempDirectory("graft-dbg").toString
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("CREATE NAMESPACE graft.db")
    spark.sql("""CREATE TABLE graft.db.mor (id BIGINT, v STRING)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    spark.sql("INSERT INTO graft.db.mor VALUES (1, 'a')")
    println(spark.sql("EXPLAIN EXTENDED DELETE FROM graft.db.mor WHERE id % 10 = 3")
      .collect().map(_.getString(0)).mkString)
    spark.stop()
  }
}
