package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed corpora for p29 substring-level exact dedup (duplicated
  * K-gram digests merged into maximal per-doc spans, K = 8 words). The
  * sf-data gate only checks aggregate agreement with DuckDB; these cases
  * pin the span-merge semantics the aggregates are built from — adjacent
  * vs gapped grams, within-doc repetition, full-doc duplicates, and the
  * under-K boundary where no gram exists at all.
  */
class SubstringDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  // word "w<i>"; doc text is words joined by single spaces
  private def words(is: Seq[Int]): String = is.map(i => s"w$i").mkString(" ")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-p29")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = Files.createTempDirectory("p29docs").toString

    // doc 1: 20 unique words, shares words 1..12 with doc 2 → in both
    //   docs grams at pos 1..5 duplicate, one span, union = 12 tokens.
    // doc 2: words 1..12 then unique tail 113..120.
    // doc 3: the SAME 8-gram repeated twice within ONE doc with a
    //   unique word between (pos 1..8 = pos 10..17) → two spans of 8.
    // doc 4/5: exact full-doc duplicates (10 words) → grams 1..3, one
    //   span, union = 10 tokens = whole doc.
    // doc 6: 7 words (< K) → no grams, absent from output.
    // doc 7: all-unique 30 words → absent from output.
    val rows = Seq(
      (1L, words(1 to 12) ++ " " ++ words(21 to 28)),
      (2L, words(1 to 12) ++ " " ++ words(113 to 120)),
      (3L, words(201 to 208) ++ " w999 " ++ words(201 to 208)),
      (4L, words(301 to 310)),
      (5L, words(301 to 310)),
      (6L, words(401 to 407)),
      (7L, words(501 to 530)))
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(): Map[Long, (Long, Long, Long)] = {
    val q = Pipeline.all.find(_.name == "p29_dedup_substring").get
    q.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("maximal spans, within-doc repeats, full-doc dups, short docs") {
    val r = run()
    // (dup_grams, dup_spans, dup_tokens)
    assert(r(1L) == ((5L, 1L, 12L)), s"doc1: ${r.get(1L)}")
    assert(r(2L) == ((5L, 1L, 12L)), s"doc2: ${r.get(2L)}")
    // doc 3: the single gram w201..w208 occurs at pos 1 and pos 10 —
    // gap 9 > K so two spans, 8 tokens each
    assert(r(3L) == ((2L, 2L, 16L)), s"doc3: ${r.get(3L)}")
    assert(r(4L) == ((3L, 1L, 10L)), s"doc4: ${r.get(4L)}")
    assert(r(5L) == ((3L, 1L, 10L)), s"doc5: ${r.get(5L)}")
    assert(!r.contains(6L) && !r.contains(7L), s"docs 6/7 leaked: $r")
    assert(r.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("overlapping duplicated grams merge into one maximal span") {
    val d2 = Files.createTempDirectory("p29ovl").toString
    // doc 10 and 11 share a 10-word run → grams at pos 1,2,3 overlap
    // (gaps of 1 ≤ K) → ONE span covering 10 tokens; cov per gram is
    // min(next-pos, K) = 1, 1, then K for the last = 10
    val rows = Seq(
      (10L, words(1 to 10) ++ " " ++ words(41 to 48)),
      (11L, words(601 to 608) ++ " " ++ words(1 to 10)))
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val q = Pipeline.all.find(_.name == "p29_dedup_substring").get
    val r = q.run(spark, d2).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r(10L) == ((3L, 1L, 10L)), s"doc10: ${r.get(10L)}")
    assert(r(11L) == ((3L, 1L, 10L)), s"doc11: ${r.get(11L)}")
  }
}
