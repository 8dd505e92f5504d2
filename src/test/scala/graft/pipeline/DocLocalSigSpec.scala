package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import TextHash._

/** r19: p04's SimHash, p11's positional fingerprint and p20's
  * repetition stats became doc-local codegen expressions (their
  * explode → groupBy(doc_id) aggregations computed per-document values).
  * This suite pins value equality of each expression against the exact
  * old aggregation on the REAL corpus, declared-output equality of the
  * rewritten operators, and the expressions' null/degenerate edges. */
class DocLocalSigSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-doclocal-sig")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tokDf(dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))

  test("corpus precondition: every doc fits the MaxLen fingerprint bound") {
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val over = tokDf(dir).filter(size(col("ws")) > MaxLen).count()
      assert(over === 0, s"$dir has docs over $MaxLen tokens")
    }
  }

  test("simHashSig equals the old 24-bit-sum aggregation on real corpus") {
    val dir = "/root/testdata/sf0.01"
    val wx = tokDf(dir).select(col("doc_id"), explode(col("ws")).as("w"))
      .withColumn("h", strHash("w"))
    val bitSums = (0 until 24).map { j =>
      sum(when(expr(s"(shiftright(h, $j) & 1)") === 1, 1L).otherwise(-1L)).as(s"w$j")
    }
    val oldSh = wx.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .withColumn("old_sh",
        (0 until 24).map(j => when(col(s"w$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _))
      .select("doc_id", "old_sh")
    val newSh = tokDf(dir).select(col("doc_id"), simHashSig(col("ws")).as("new_sh"))
    assert(oldSh.count() === newSh.count())
    assert(oldSh.join(newSh, "doc_id")
      .filter(not(col("old_sh") <=> col("new_sh"))).count() === 0)
  }

  test("polyPosFingerprint equals the old posexplode aggregation on real corpus") {
    val dir = "/root/testdata/sf0.01"
    val powArr = pow31.take(MaxLen).map(_.toString + "L").mkString("array(", ",", ")")
    val oldFp = tokDf(dir)
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w")))
      .withColumn("h", strHash("w"))
      .withColumn("term", (col("h") % 1048576) * expr(s"element_at($powArr, pos + 1)"))
      .groupBy("doc_id")
      .agg(pmod(sum(col("term")), lit(P)).as("old_fp"))
    val newFp = tokDf(dir)
      .select(col("doc_id"), polyPosFingerprint(col("ws")).as("new_fp"))
    assert(oldFp.count() === newFp.count())
    assert(oldFp.join(newFp, "doc_id")
      .filter(not(col("old_fp") <=> col("new_fp"))).count() === 0)
  }

  test("p20 stats equal the old two-chain aggregation on real corpus") {
    val dir = "/root/testdata/sf0.01"
    val tk = tokDf(dir)
    val tokStats = tk.select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("o_n_tok"), max(col("c")).as("o_top_tok"))
    val bgDistinct = tk.select(col("doc_id"), explode(bigrams("ws")).as("b"))
      .distinct().groupBy("doc_id").agg(count(lit(1)).as("o_n_bgd"))
    val oldStats = tokStats.join(bgDistinct, "doc_id")
    val newStats = tk.select(col("doc_id"),
      size(col("ws")).cast(LongType).as("n_tok"),
      topTokenCount(col("ws")).as("top_tok"),
      arrayDistinctCount(bigrams("ws")).as("n_bgd"))
    val bad = oldStats.join(newStats, "doc_id").filter(
      not(col("o_n_tok") <=> col("n_tok")) ||
        not(col("o_top_tok") <=> col("top_tok")) ||
        not(col("o_n_bgd") <=> col("n_bgd"))).count()
    assert(bad === 0)
  }

  test("p04/p11/p20 declared output is identical to the old formulations") {
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      // p04 old: sig agg + distinct-before-filter order
      val wx = tokDf(dir).select(col("doc_id"), explode(col("ws")).as("w"))
        .withColumn("h", strHash("w"))
      val bitSums = (0 until 24).map { j =>
        sum(when(expr(s"(shiftright(h, $j) & 1)") === 1, 1L).otherwise(-1L)).as(s"w$j")
      }
      val sh = wx.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        .withColumn("simhash",
          (0 until 24).map(j => when(col(s"w$j") > 0, lit(1L << j)).otherwise(0L))
            .reduce(_ + _))
        .select("doc_id", "simhash")
      val bandDefs = Seq((0, 5), (5, 5), (10, 5), (15, 5), (20, 4))
      val banded = sh.select(col("doc_id"), col("simhash"),
        explode(array(bandDefs.zipWithIndex.map { case ((off, w), i) =>
          expr(s"${i * 64L}L + (shiftright(simhash, $off) & ${(1 << w) - 1})")
        }: _*)).as("bk"))
      val oldP04 = banded.toDF("d1", "s1", "bk1")
        .join(banded.toDF("d2", "s2", "bk2"),
          col("bk1") === col("bk2") && col("d1") < col("d2"))
        .select("d1", "s1", "d2", "s2").distinct()
        .withColumn("hamming", expr("bit_count(s1 ^ s2)"))
        .filter(col("hamming") <= 4)
        .select("d1", "d2", "hamming")
      val newP04 = graft.SparkEntry.queries("p04_dedup_simhash")(spark, dir)
      assert(newP04.exceptAll(oldP04).count() === 0, s"p04 new-only rows on $dir")
      assert(oldP04.exceptAll(newP04).count() === 0, s"p04 old-only rows on $dir")

      // p11 old
      val powArr = pow31.take(MaxLen).map(_.toString + "L").mkString("array(", ",", ")")
      val oldP11 = tokDf(dir)
        .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w")))
        .withColumn("h", strHash("w"))
        .withColumn("term", (col("h") % 1048576) * expr(s"element_at($powArr, pos + 1)"))
        .groupBy("doc_id")
        .agg(pmod(sum(col("term")), lit(P)).as("fp"))
      val newP11 = graft.SparkEntry.queries("p11_text_fingerprint")(spark, dir)
      assert(newP11.exceptAll(oldP11).count() === 0, s"p11 new-only rows on $dir")
      assert(oldP11.exceptAll(newP11).count() === 0, s"p11 old-only rows on $dir")

      // p20 old: two agg chains + inner joins
      val tk = tokDf(dir)
      val tokStats = tk.select(col("doc_id"), explode(col("ws")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_tok"), max(col("c")).as("top_tok"))
      val bgTotal = tk.select(col("doc_id"),
        (size(col("ws")) - 1).cast(LongType).as("n_bg"))
      val bgDistinct = tk.select(col("doc_id"), explode(bigrams("ws")).as("b"))
        .distinct().groupBy("doc_id").agg(count(lit(1)).as("n_bgd"))
      val oldP20 = tokStats.join(bgTotal, "doc_id").join(bgDistinct, "doc_id")
        .withColumn("n_dup_bg", col("n_bg") - col("n_bgd"))
        .filter(col("n_dup_bg") * 4 > col("n_bg") ||
          col("top_tok") * 5 > col("n_tok"))
        .select("doc_id", "n_tok", "top_tok", "n_dup_bg")
      val newP20 = graft.SparkEntry.queries("p20_quality_repetition")(spark, dir)
      assert(newP20.exceptAll(oldP20).count() === 0, s"p20 new-only rows on $dir")
      assert(oldP20.exceptAll(newP20).count() === 0, s"p20 old-only rows on $dir")
    }
  }

  test("doc-local bigramSets keeps the exact row set of the old distinct()") {
    val dir = "/root/testdata/sf0.01"
    val oldBg = tokDf(dir)
      .select(col("doc_id"), explode(bigrams("ws")).as("b")).distinct()
    val newBg = tokDf(dir)
      .select(col("doc_id"), explode(array_distinct(bigrams("ws"))).as("b"))
    assert(newBg.exceptAll(oldBg).count() === 0)
    assert(oldBg.exceptAll(newBg).count() === 0)
  }

  test("p02/p19 declared output is identical to the old formulations") {
    def oldBg(dir: String) = tokDf(dir)
      .select(col("doc_id"), explode(bigrams("ws")).as("b")).distinct()
    // p02 old (sf0.01 — its all-pairs join is quadratic by design)
    val dir = "/root/testdata/sf0.01"
    val bg = oldBg(dir)
    val sz = bg.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val oldP02 = bg.toDF("d1", "bx")
      .join(bg.toDF("d2", "by"), col("bx") === col("by") && col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      .join(sz.toDF("d1k", "n1"), col("d1") === col("d1k"))
      .join(sz.toDF("d2k", "n2"), col("d2") === col("d2k"))
      .withColumn("uni", col("n1") + col("n2") - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select("d1", "d2", "inter", "uni")
    val newP02 = graft.SparkEntry.queries("p02_dedup_ngram_jaccard")(spark, dir)
    assert(newP02.exceptAll(oldP02).count() === 0)
    assert(oldP02.exceptAll(newP02).count() === 0)
    // p19 old, at both SFs
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val bgd = oldBg(d)
      val bench = bgd.filter(col("doc_id") % 37 === 0).toDF("bid", "bb")
      val cand = bgd.filter(col("doc_id") % 37 =!= 0)
      val oldP19 = cand.join(broadcast(bench), col("b") === col("bb"))
        .groupBy("doc_id", "bid").agg(count(lit(1)).as("overlap"))
        .filter(col("overlap") >= 10)
        .groupBy("doc_id")
        .agg(max(col("overlap")).as("max_overlap"),
          countDistinct(col("bid")).as("n_bench"))
      val newP19 = graft.SparkEntry.queries("p19_decontaminate")(spark, d)
      assert(newP19.exceptAll(oldP19).count() === 0, s"p19 new-only on $d")
      assert(oldP19.exceptAll(newP19).count() === 0, s"p19 old-only on $d")
    }
  }

  test("p29 output is identical with the xxhash64-pair gram key") {
    // the old md5-hex-keyed formulation, output-compared to the bank
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val K = 8
      val g = tokDf(dir).select(col("doc_id"),
        posexplode(wordWindows("ws", K, 1, " ", partial = false))
          .as(Seq("p0", "c")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), md5(col("c")).as("h"))
      val dupKeys = g.groupBy("h").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1).select("h")
      val dup = g.join(dupKeys, Seq("h")).select("doc_id", "pos")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val oldP29 = dup
        .withColumn("ns",
          when(lag("pos", 1).over(w).isNull ||
            col("pos") - lag("pos", 1).over(w) > K, 1L).otherwise(0L))
        .withColumn("cov",
          when(lead("pos", 1).over(w).isNull, lit(K.toLong))
            .otherwise(least(lead("pos", 1).over(w) - col("pos"), lit(K.toLong))))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("dup_grams"), sum("ns").as("dup_spans"),
          sum("cov").as("dup_tokens"))
      val newP29 = graft.SparkEntry.queries("p29_dedup_substring")(spark, dir)
      assert(newP29.exceptAll(oldP29).count() === 0, s"p29 new-only on $dir")
      assert(oldP29.exceptAll(newP29).count() === 0, s"p29 old-only on $dir")
    }
  }

  test("p13 output is identical with the argmax list assignment") {
    import graft.functions.VectorFunctions.arrayDot
    import org.apache.spark.sql.expressions.Window
    def embNorm(dir: String): DataFrame =
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(arrayDot(col("v"), col("v"))))
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      // precondition for the -ccos struct-min equivalence: no zero-norm
      // embedding, hence no NaN cosine (NaN orders differently under
      // negation)
      assert(embNorm(dir).filter(col("nrm") === 0 || isnan(col("nrm")))
        .count() === 0)
      val e = embNorm(dir)
      val cents = e.filter(col("vec_id") < 16).toDF("cid", "cv", "cn")
      val ranked = e.join(broadcast(cents), col("vec_id") =!= lit(-1))
        .withColumn("ccos", arrayDot(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .withColumn("crank", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid").asc)))
      val lists = ranked.filter(col("crank") === 1)
        .select(col("vec_id").as("nid"), col("cid").as("list"),
          col("v").as("v2"), col("nrm").as("n2"))
      val probes = ranked.filter(col("vec_id") < 30 && col("crank") <= 2)
        .select(col("vec_id").as("qid"), col("cid").as("plist"),
          col("v").as("v1"), col("nrm").as("n1"))
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
      val cosC = arrayDot(col("v1"), col("v2")) / (col("n1") * col("n2"))
      val oldP13 = probes
        .join(lists, col("plist") === col("list") && col("qid") =!= col("nid"))
        .withColumn("cos", cosC)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("qid", "rank", "nid")
      val newP13 = graft.SparkEntry.queries("p13_ann_ivf")(spark, dir)
      assert(newP13.exceptAll(oldP13).count() === 0, s"p13 new-only on $dir")
      assert(oldP13.exceptAll(newP13).count() === 0, s"p13 old-only on $dir")
    }
  }

  test("expression edge semantics: nulls, empties, duplicates") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: String*) = new GenericArrayData(xs.map {
      case null => null
      case s => UTF8String.fromString(s)
    }.toArray[Any])
    // simHash: a null token adds -1 to every bit sum — same hash as a
    // token whose bits are all zero minus presence, i.e. [w, null] and
    // [w] differ exactly when some cnt crosses zero; pin both values
    val one = TextHash.simHashOf(arr("x"))
    val h = TextHash.polyHash(UTF8String.fromString("x"), 24)
    var expected = 0L
    (0 until 24).foreach { j => if (((h >> j) & 1L) == 1L) expected |= (1L << j) }
    assert(one === expected)
    assert(TextHash.simHashOf(arr("x", null)) === 0L) // +1-1 ties -> bit 0
    assert(TextHash.simHashOf(arr()) === 0L)
    // polyPosFingerprint: positional, null-skipping, null when no term
    assert(TextHash.polyPosFingerprintOf(arr()) === null)
    assert(TextHash.polyPosFingerprintOf(arr(null)) === null)
    val fp = TextHash.polyPosFingerprintOf(arr("a", "b"))
    val ha = TextHash.polyHash(UTF8String.fromString("a"), 24) % 1048576L
    val hb = TextHash.polyHash(UTF8String.fromString("b"), 24) % 1048576L
    assert(fp === (ha * pow31(0) + hb * pow31(1)) % P)
    // null token occupies its position (posexplode did the same)
    assert(TextHash.polyPosFingerprintOf(arr(null, "b")) === (hb * pow31(1)) % P)
    // topTokenCount: duplicates counted, nulls form one key
    assert(TextHash.topTokenCountOf(arr("a", "b", "a", "a")) === 3L)
    assert(TextHash.topTokenCountOf(arr(null, null, "a")) === 2L)
    assert(TextHash.topTokenCountOf(arr()) === 0L)
    // arrayDistinctCount: dedup, null is one distinct value
    assert(TextHash.arrayDistinctCountOf(arr("a", "b", "a")) === 2L)
    assert(TextHash.arrayDistinctCountOf(arr(null, null, "a")) === 2L)
    assert(TextHash.arrayDistinctCountOf(arr()) === 0L)
  }
}
