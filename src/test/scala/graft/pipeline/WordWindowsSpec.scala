package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** r18: the n-gram/chunk/score operators (p09/p10/p25/p27/p29/p30/p32)
  * moved from CodegenFallback HOFs to the codegen'd WordWindows /
  * CountInSet / CountMinLen expressions. Each must be value-identical to
  * the HOF chain it replaced — checked on the real corpus (where tokens
  * are never null) and on degenerate inputs. */
class WordWindowsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-wordwindows")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")
    .select(col("doc_id"), split(col("text"), " ").as("ws"))

  test("p25 shape: overlapping 3-grams '~' equal the transform/slice HOF") {
    val hof = expr("""transform(sequence(0, size(ws) - 3),
      i -> concat_ws('~', slice(ws, i + 1, 3)))""")
    val bad = docs.filter(size(col("ws")) >= 3)
      .withColumn("a", TextHash.wordWindows("ws", 3, 1, "~", partial = false))
      .withColumn("b", hof)
      .filter(not(col("a") <=> col("b"))).count()
    assert(bad === 0)
  }

  test("p30 shape: trigrams equal the transform/element_at/concat HOF") {
    val hof = expr(
      """CASE WHEN size(ws) >= 3
        |THEN transform(sequence(0, size(ws) - 3),
        |  i -> concat(element_at(ws, i + 1), '~', element_at(ws, i + 2),
        |              '~', element_at(ws, i + 3)))
        |ELSE array() END""".stripMargin)
    val bad = docs
      .withColumn("a", TextHash.wordWindows("ws", 3, 1, "~", partial = false))
      .withColumn("b", hof)
      .filter(not(col("a") <=> col("b"))).count()
    assert(bad === 0)
  }

  test("p27 shape: 8-token stride-8 chunks equal the transform/slice HOF") {
    val hof = expr("""transform(sequence(0, (size(ws)+7) div 8 - 1),
      i -> concat_ws(' ', slice(ws, i*8+1, 8)))""")
    val bad = docs.filter(size(col("ws")) >= 1)
      .withColumn("a", TextHash.wordWindows("ws", 8, 8, " ", partial = true))
      .withColumn("b", hof)
      .filter(not(col("a") <=> col("b"))).count()
    assert(bad === 0)
  }

  test("p29 shape: md5 over windows equals the md5-inside-transform HOF") {
    val hof = expr(
      """CASE WHEN size(ws) >= 8
        |THEN transform(sequence(1, size(ws) - 7),
        |               i -> md5(array_join(slice(ws, i, 8), ' ')))
        |ELSE array() END""".stripMargin)
    val bad = docs
      .withColumn("a", transform(
        TextHash.wordWindows("ws", 8, 1, " ", partial = false), c => md5(c)))
      .withColumn("b", hof)
      .filter(not(col("a") <=> col("b"))).count()
    assert(bad === 0)
  }

  test("p14 shape: 32-token stride-24 windows equal the slice formulation") {
    // p14 itself already used codegen slice/concat_ws (left unchanged);
    // this pins WordWindows' partial math against that reference shape
    val hof = expr("""transform(sequence(0, cast(floor((size(ws) - 1) / 24) as int)),
      i -> concat_ws(' ', slice(ws, i*24+1, 32)))""")
    val bad = docs.filter(size(col("ws")) > 0)
      .withColumn("a", TextHash.wordWindows("ws", 32, 24, " ", partial = true))
      .withColumn("b", hof)
      .filter(not(col("a") <=> col("b"))).count()
    assert(bad === 0)
  }

  test("degenerate inputs: empty and below-width arrays") {
    val out = spark.sql(
      """SELECT * FROM VALUES (array('a')), (array('a','b')),
        |(array('a','b','c','d')), (CAST(array() AS ARRAY<STRING>))
        |AS t(ws)""".stripMargin)
      .select(
        TextHash.wordWindows("ws", 3, 1, "~", partial = false).as("ng"),
        TextHash.wordWindows("ws", 8, 8, " ", partial = true).as("ch"))
      .collect()
    assert(out(0).getSeq[String](0) === Seq.empty)       // 1 token, no 3-gram
    assert(out(0).getSeq[String](1) === Seq("a"))        // short chunk kept
    assert(out(1).getSeq[String](0) === Seq.empty)
    assert(out(2).getSeq[String](0) === Seq("a~b~c", "b~c~d"))
    assert(out(2).getSeq[String](1) === Seq("a b c d"))
    assert(out(3).getSeq[String](0) === Seq.empty)       // empty array
    assert(out(3).getSeq[String](1) === Seq.empty)
  }

  test("countInSet / countMinLen equal the size(filter(...)) HOFs") {
    val hofIn = expr("size(filter(ws, w -> w IN ('the', 'a')))")
    val hofLen = expr("size(filter(ws, w -> length(w) >= 6))")
    val bad = docs
      .withColumn("a1", TextHash.countInSet(col("ws"), Seq("the", "a")))
      .withColumn("b1", hofIn)
      .withColumn("a2", TextHash.countMinLen(col("ws"), 6))
      .withColumn("b2", hofLen)
      .filter(not(col("a1") <=> col("b1")) || not(col("a2") <=> col("b2")))
      .count()
    assert(bad === 0)
    // corpus precondition all the joined-window semantics rely on
    val withNull = docs.filter(exists(col("ws"), _.isNull)).count()
    assert(withNull === 0)
  }
}
