package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** r18: `bigrams()` became a codegen'd expression (the HOF
  * transform/lambdafunction it replaced is CodegenFallback and dominated
  * the p03 MinHash signature pass). The expression must produce exactly
  * the strings the interpreted HOF produced — and exactly the oracle's
  * generate_series(1, len-1) shape for degenerate inputs. The packed LSH
  * band keys (p03/p04/p18) must be injective over their domains. */
class TextHashSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-texthash")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("codegen bigrams equals the HOF formulation on real corpus text") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val hof = expr("""transform(sequence(0, size(ws) - 2),
      i -> concat(element_at(ws, i + 1), '~', element_at(ws, i + 2)))""")
    val mismatches = docs
      .withColumn("a", TextHash.bigrams("ws"))
      .withColumn("b", hof)
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(mismatches === 0)
    // corpus precondition the <2-token branch relies on (see bigrams doc)
    val tiny = docs.filter(size(col("ws")) < 2).count()
    assert(tiny === 0)
  }

  test("codegen bigrams: empty/degenerate inputs take the oracle's shape") {
    val df = spark.sql(
      """SELECT * FROM VALUES (array('a')), (array('a','b')),
        |(array('a','b','c')), (array('')) AS t(ws)""".stripMargin)
      .withColumn("bg", TextHash.bigrams("ws"))
      .select(col("bg"))
      .collect()
      .map(_.getSeq[String](0))
    assert(df(0) === Seq.empty)             // 1 token -> no bigrams
    assert(df(1) === Seq("a~b"))
    assert(df(2) === Seq("a~b", "b~c"))
    assert(df(3) === Seq.empty)             // [""] (empty text after split)
  }

  test("packed band keys are injective over their domains") {
    // p03: bidx*2^60 + x*2^30 + y with x, y < P <= 2^30
    assert(TextHash.P < (1L << 30))
    val samples = Seq(0L, 1L, TextHash.P - 1)
    val keys = for {
      b <- 0 until TextHash.NumBands; x <- samples; y <- samples
    } yield (b.toLong << 60) + x * (1L << 30) + y
    assert(keys.distinct.size === keys.size)
    assert(keys.forall(k => k >= 0L && k < (1L << 62)))
    // p04: band*64 + key with key < 32; p18: tbl*256 + bkt with bkt < 256
    val p04 = for (b <- 0 until 5; k <- 0 until 32) yield b * 64L + k
    assert(p04.distinct.size === p04.size)
    val p18 = for (t <- 0 until 3; k <- 0 until 256) yield t * 256L + k
    assert(p18.distinct.size === p18.size)
  }
}
