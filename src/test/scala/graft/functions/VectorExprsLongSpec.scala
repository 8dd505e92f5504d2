package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** r18: the exact-arithmetic k-means / SemDeDup paths (p22/p28) moved from
  * interpreted aggregate/zip_with/transform lambdas to codegen'd long-array
  * expressions. Each must be value-identical to the HOF chain it replaced —
  * checked against the HOF on the real embeddings corpus (dense fixed-width
  * float arrays) plus the documented edge semantics (NaN/Inf/null). */
class VectorExprsLongSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-vector-long")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def emb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("arrayQuantizeFloor equals the transform/floor/cast HOF on the corpus") {
    val hof = expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT))")
    val bad = emb
      .withColumn("a", VectorFunctions.arrayQuantizeFloor(col("embedding"), 64))
      .withColumn("b", hof)
      .filter(not(col("a") <=> col("b"))).count()
    assert(bad === 0)
  }

  test("arrayQuantizeFloor edge semantics: NaN->0, +-Inf saturate, null stays") {
    val out = spark.sql(
      """SELECT * FROM VALUES
        |(array(CAST('NaN' AS DOUBLE), CAST('Infinity' AS DOUBLE),
        |       CAST('-Infinity' AS DOUBLE), CAST(NULL AS DOUBLE), 0.99))
        |AS t(v)""".stripMargin)
      .select(VectorFunctions.arrayQuantizeFloor(col("v"), 64).as("q"))
      .head().getSeq[Any](0)
    assert(out(0) === 0L)
    assert(out(1) === Long.MaxValue)
    assert(out(2) === Long.MinValue)
    assert(out(3) === null)
    assert(out(4) === 63L)
  }

  test("arrayDotL / arraySqDistL equal the aggregate/zip_with HOFs") {
    val q = emb.select(col("vec_id"),
      VectorFunctions.arrayQuantizeFloor(col("embedding"), 64).as("qv"))
    val c = q.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    val joined = q.crossJoin(broadcast(c))
    val hofDist = expr(
      "aggregate(zip_with(qv, cv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
    val hofDot = expr(
      "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0L, (acc, x) -> acc + x)")
    val bad = joined
      .withColumn("d1", VectorFunctions.arraySqDistL(col("qv"), col("cv")))
      .withColumn("d2", hofDist)
      .withColumn("p1", VectorFunctions.arrayDotL(col("qv"), col("cv")))
      .withColumn("p2", hofDot)
      .filter(not(col("d1") <=> col("d2")) || not(col("p1") <=> col("p2")))
      .count()
    assert(bad === 0)
  }
}
