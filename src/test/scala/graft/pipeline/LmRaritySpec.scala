package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed corpus for p30 LM-rarity scoring: per-doc hapax/rare
  * trigram counts against corpus-wide trigram LM counts, with the cb < 5
  * rarity threshold, the hapax_ratio <= 0.5 keep rule, repeated trigrams
  * WITHIN one doc, cross-doc duplicates, and the no-trigram short docs.
  */
class LmRaritySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-p30")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = Files.createTempDirectory("p30docs").toString
    val rows = Seq(
      // 8 trigrams: a~b~a x4 (+1 from doc 6 = cb 5, common),
      // b~a~b x4 (rare, not hapax)
      (1L, "a b a b a b a b a b"),
      // 3 trigrams, all corpus-hapax -> hapax_ratio 1.0, filtered out
      (2L, "c d e f g"),
      // single word: no trigrams, absent from output
      (3L, "z"),
      // exact duplicates: the one trigram p~q~r has cb=2 (rare, not hapax)
      (4L, "p q r"),
      (5L, "p q r"),
      // exactly the common trigram a~b~a (cb 5 with doc 1's four)
      (6L, "a b a"),
      // 5 trigrams: m~n~m x2 (rare), n~m~n + n~m~x + m~x~y hapax
      // -> hapax_ratio 0.6, filtered out
      (7L, "m n m n m x y"),
      // two words: no trigrams, absent
      (8L, "u v"))
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("hapax/rare counts, threshold keep rule, short-doc absence") {
    val q = Pipeline.all.find(_.name == "p30_quality_lm_rarity").get
    val r = q.run(spark, dir).collect().map { x =>
      x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getInt(6)))
    }.toMap
    // (n_bi, hapax_cnt, rare_cnt, keep)
    assert(r(1L) == ((8L, 0L, 4L, 1)), s"doc1: ${r.get(1L)}")
    assert(r(2L) == ((3L, 3L, 3L, 0)), s"doc2: ${r.get(2L)}")
    assert(r(4L) == ((1L, 0L, 1L, 1)), s"doc4: ${r.get(4L)}")
    assert(r(5L) == ((1L, 0L, 1L, 1)), s"doc5: ${r.get(5L)}")
    assert(r(6L) == ((1L, 0L, 0L, 1)), s"doc6: ${r.get(6L)}")
    assert(r(7L) == ((5L, 3L, 5L, 0)), s"doc7: ${r.get(7L)}")
    assert(r.keySet == Set(1L, 2L, 4L, 5L, 6L, 7L))
    val ratios = q.run(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(4), x.getDouble(5)))).toMap
    assert(ratios(7L) == ((0.6d, 1.0d)))
    assert(ratios(1L) == ((0.0d, 0.5d)))
  }
}
