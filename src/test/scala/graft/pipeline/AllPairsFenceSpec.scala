package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** p05 is the quadratic all-pairs recall baseline for p18's LSH dedup —
  * the fence must refuse corpus-scale input unless explicitly forced, so
  * the baseline can never be invoked on production data by accident. */
class AllPairsFenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-p05-fence")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val p05 = Pipeline.all
    .find(_.name == "p05_dedup_embedding_cosine")
    .getOrElse(fail("p05 not registered"))

  test("the all-pairs baseline refuses input past the row fence") {
    spark.conf.set("spark.graft.all-pairs-max-rows", "1")
    try {
      val e = intercept[IllegalArgumentException](
        p05.run(spark, sfDir).collect())
      assert(e.getMessage.contains("p18") &&
        e.getMessage.contains("allow-all-pairs"),
        s"fence message must route users to the LSH path: ${e.getMessage}")
    } finally spark.conf.unset("spark.graft.all-pairs-max-rows")
  }

  test("allow-all-pairs=true forces the quadratic plan through") {
    spark.conf.set("spark.graft.all-pairs-max-rows", "1")
    spark.conf.set("spark.graft.allow-all-pairs", "true")
    try assert(p05.run(spark, sfDir).collect() != null)
    finally {
      spark.conf.unset("spark.graft.all-pairs-max-rows")
      spark.conf.unset("spark.graft.allow-all-pairs")
    }
  }

  test("verification-sized input passes the default fence") {
    assert(p05.run(spark, sfDir).collect() != null)
  }
}
