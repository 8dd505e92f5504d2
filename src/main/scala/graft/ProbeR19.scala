package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.pipeline.TextHash._

/** r19 dev probe (guide §1: measure first): decomposes p03's signature
  * aggregation and verify joins to size the digest-set redesign before
  * touching the operator. Not part of the driver contract.
  * Run: sbt "runMain graft.ProbeR19"
  */
object ProbeR19 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Tables.t

    def tok(dir: String): DataFrame =
      t(spark, dir, "documents").select(col("doc_id"), col("text"),
        split(col("text"), " ").as("ws"))

    def bh(dir: String): DataFrame =
      tok(dir).select(col("doc_id"), explode(bigrams("ws")).as("b"))
        .withColumn("h", strHash("b"))

    val minCols = (0 until NumHashes).map { k =>
      min(pmod(col("h") * minhashA(k) + minhashB(k), lit(P))).as(s"m$k")
    }

    // variants of the signature aggregation
    def sigStr(dir: String): DataFrame = bh(dir).groupBy("doc_id")
      .agg(minCols.head, (minCols.tail :+ collect_set(col("b")).as("bs")): _*)
    def sigMd5(dir: String): DataFrame = bh(dir).groupBy("doc_id")
      .agg(minCols.head,
        (minCols.tail :+ collect_set(unhex(md5(col("b")))).as("bs")): _*)
    def sigXx(dir: String): DataFrame = bh(dir).groupBy("doc_id")
      .agg(minCols.head,
        (minCols.tail :+ collect_set(xxhash64(col("b"))).as("bs")): _*)
    def sigMinsOnly(dir: String): DataFrame = bh(dir).groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)

    // full minhashPairs with a pluggable signature source
    def pairs(sig: DataFrame): DataFrame = {
      val sigSet = sig.persist()
      val bandArr = array((0 until NumBands).map { j =>
        lit(j.toLong << 60) + (col(s"m${2 * j}") * lit(1L << 30)) +
          col(s"m${2 * j + 1}")
      }: _*)
      val bands = sigSet.select(col("doc_id"), explode(bandArr).as("bkey"))
      val cand = bands.toDF("d1", "k1")
        .join(bands.toDF("d2", "k2"),
          col("k1") === col("k2") && col("d1") < col("d2"))
        .select("d1", "d2").distinct()
      val docSets = sigSet.select(col("doc_id").as("dk"), col("bs"))
      val out = cand.join(docSets.toDF("dx", "bx"), col("d1") === col("dx"))
        .join(docSets.toDF("dy", "by"), col("d2") === col("dy"))
        .withColumn("inter", size(array_intersect(col("bx"), col("by"))).cast(LongType))
        .withColumn("uni", (size(col("bx")) + size(col("by"))).cast(LongType) - col("inter"))
        .filter(col("inter") * 2 >= col("uni"))
        .select("d1", "d2", "inter", "uni")
      out
    }

    def time(name: String, mk: () => DataFrame): Unit = {
      spark.sparkContext.setJobDescription(s"probe warmup: $name")
      mk().write.format("noop").mode("overwrite").save()
      val samples = (1 to 5).map { i =>
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(s"probe $name #$i")
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name median=${samples.sorted.apply(2)}%.3f samples=" +
        samples.map(s => f"$s%.3f").mkString("[", ",", "]"))
    }

    // section selector: run `ProbeR19 p27` to skip the p03 sections etc.
    val sections = if (args.isEmpty) Set("all") else args.toSet
    def on(s: String): Boolean = sections("all") || sections(s)

    // 0. correctness cross-checks first (cheap, sf0.01)
    val sfSmall = "/root/testdata/sf0.01"
    lazy val pStr = pairs(sigStr(sfSmall)).orderBy("d1", "d2")
    if (on("p03")) {
    val pMd5 = pairs(sigMd5(sfSmall)).orderBy("d1", "d2")
    val pXx = pairs(sigXx(sfSmall)).orderBy("d1", "d2")
    println(s"CHECK sf0.01 pairs str=${pStr.count()} md5diff=" +
      s"${pMd5.exceptAll(pStr).count() + pStr.exceptAll(pMd5).count()} xxdiff=" +
      s"${pXx.exceptAll(pStr).count() + pStr.exceptAll(pXx).count()}")
    // injectivity of the digests on the real corpora
    for (d <- Seq("/root/testdata/sf0.001", sfSmall, sfDir)) {
      val r = bh(d).agg(
        countDistinct(col("b")).as("nb"),
        countDistinct(unhex(md5(col("b")))).as("nmd5"),
        countDistinct(xxhash64(col("b"))).as("nxx")).head()
      println(s"CHECK injectivity $d: distinct_b=${r.getLong(0)} " +
        s"md5=${r.getLong(1)} xx64=${r.getLong(2)}")
    }
    }

    // more digest variants: 128-bit struct of two xxhash64 channels, and
    // md5 kept as the 32-char hex string (no unhex)
    def sigStruct(dir: String): DataFrame = bh(dir).groupBy("doc_id")
      .agg(minCols.head, (minCols.tail :+ collect_set(
        struct(xxhash64(col("b")).as("x"), xxhash64(lit(1), col("b")).as("y")))
        .as("bs")): _*)
    def sigMd5Hex(dir: String): DataFrame = bh(dir).groupBy("doc_id")
      .agg(minCols.head, (minCols.tail :+ collect_set(md5(col("b"))).as("bs")): _*)

    if (on("p03")) {
    val pStruct = pairs(sigStruct(sfSmall)).orderBy("d1", "d2")
    println(s"CHECK sf0.01 structdiff=" +
      s"${pStruct.exceptAll(pStr).count() + pStr.exceptAll(pStruct).count()}")
    }

    // candidate-generation-only (bs never touched after the agg): isolates
    // the persist/cache cost of each bs element type from the verify cost
    def candOnly(sig: DataFrame): DataFrame = {
      val sigSet = sig.persist()
      val bandArr = array((0 until NumBands).map { j =>
        lit(j.toLong << 60) + (col(s"m${2 * j}") * lit(1L << 30)) +
          col(s"m${2 * j + 1}")
      }: _*)
      val bands = sigSet.select(col("doc_id"), explode(bandArr).as("bkey"))
      bands.toDF("d1", "k1")
        .join(bands.toDF("d2", "k2"),
          col("k1") === col("k2") && col("d1") < col("d2"))
        .select("d1", "d2").distinct()
    }

    // r19 doc-local variants
    if (on("p03")) println("PARTITIONS tok=" + tok(sfDir).rdd.getNumPartitions)
    def sigDocLocal(dir: String): DataFrame =
      tok(dir).select(col("doc_id"), bigrams("ws").as("bg"))
        .select(col("doc_id"), minhashSig(col("bg")).as("sig"),
          digestPairs(col("bg")).as("bs"))
    def pairsDocLocal(dir: String, nparts: Int): DataFrame = {
      val base = tok(dir).select(col("doc_id"), bigrams("ws").as("bg"))
      val rep = if (nparts > 0) base.repartition(nparts) else base
      val sigSet = rep.select(col("doc_id"), minhashSig(col("bg")).as("sig"),
          digestPairs(col("bg")).as("bs")).persist()
      val bandArr = array((0 until NumBands).map { j =>
        lit(j.toLong << 60) + (col("sig").getItem(2 * j) * lit(1L << 30)) +
          col("sig").getItem(2 * j + 1)
      }: _*)
      val bands = sigSet.select(col("doc_id"), explode(bandArr).as("bkey"))
      val cand = bands.toDF("d1", "k1")
        .join(bands.toDF("d2", "k2"),
          col("k1") === col("k2") && col("d1") < col("d2"))
        .select("d1", "d2").distinct()
      val docSets = sigSet.select(col("doc_id").as("dk"), col("bs"))
      cand.join(docSets.toDF("dx", "bx"), col("d1") === col("dx"))
        .join(docSets.toDF("dy", "by"), col("d2") === col("dy"))
        .withColumn("inter", digestIntersectCount(col("bx"), col("by")).cast(LongType))
        .withColumn("uni",
          expr("CAST((size(bx) + size(by)) DIV 2 AS BIGINT)") - col("inter"))
        .filter(col("inter") * 2 >= col("uni"))
        .select("d1", "d2", "inter", "uni")
    }
    if (on("p03")) {
    time("sig_doclocal_noper", () => sigDocLocal(sfDir))
    time("pairs_doclocal_p0", () => pairsDocLocal(sfDir, 0))
    time("pairs_doclocal_p32", () => pairsDocLocal(sfDir, 32))
    }

    // ---- p27 decomposition (verdict item 7) ----
    def chunksDf(dir: String): DataFrame =
      tok(dir).filter(size(col("ws")) >= 1)
        .select(col("doc_id"),
          posexplode(wordWindows("ws", 8, 8, " ", partial = true))
            .as(Seq("idx", "c")))
    def p27boiler(dir: String): DataFrame =
      chunksDf(dir).groupBy("c")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 3).select(col("c").as("bc"))
    def p27boilerDigest(dir: String): DataFrame =
      chunksDf(dir).groupBy(xxhash64(col("c")).as("ch"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 3).select(col("ch").as("bch"))
    def p27kept(dir: String): DataFrame =
      chunksDf(dir).join(broadcast(p27boiler(dir)),
          col("c") === col("bc"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nk"),
          concat_ws(" ", expr("sort_array(collect_list(struct(idx, c))).c"))
            .as("clean"))
    def p27keptDigest(dir: String): DataFrame =
      chunksDf(dir).join(broadcast(p27boilerDigest(dir)),
          xxhash64(col("c")) === col("bch"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nk"),
          concat_ws(" ", expr("sort_array(collect_list(struct(idx, c))).c"))
            .as("clean"))
    def p27boilerMd5(dir: String): DataFrame =
      chunksDf(dir).groupBy(md5(col("c")).as("ch"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 3).select(col("ch").as("bch"))
    def p27keptMd5(dir: String): DataFrame =
      chunksDf(dir).join(broadcast(p27boilerMd5(dir)),
          md5(col("c")) === col("bch"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nk"),
          concat_ws(" ", expr("sort_array(collect_list(struct(idx, c))).c"))
            .as("clean"))
    if (on("p27")) {
    // correctness: digest-keyed variants must keep the kept-set identical
    val kStr = p27kept(sfSmall)
    println("CHECK p27 sf0.01 digestdiff=" +
      (p27keptDigest(sfSmall).exceptAll(kStr).count() +
        kStr.exceptAll(p27keptDigest(sfSmall)).count()) +
      " md5diff=" + (p27keptMd5(sfSmall).exceptAll(kStr).count() +
        kStr.exceptAll(p27keptMd5(sfSmall)).count()))
    time("p27_chunks_only", () => chunksDf(sfDir))
    time("p27_boiler_str", () => p27boiler(sfDir))
    time("p27_boiler_digest", () => p27boilerDigest(sfDir))
    time("p27_boiler_md5", () => p27boilerMd5(sfDir))
    time("p27_kept_str", () => p27kept(sfDir))
    time("p27_kept_digest", () => p27keptDigest(sfDir))
    time("p27_kept_md5", () => p27keptMd5(sfDir))
    }

    if (on("ansi")) {
      println("CHECK ansi.enabled=" + spark.conf.get("spark.sql.ansi.enabled"))
      try println("CHECK element_at OOB -> " +
        spark.sql("select element_at(array(1L), 5)").collect().mkString)
      catch { case e: Throwable =>
        println("CHECK element_at OOB -> throws " + e.getClass.getSimpleName) }
    }

    if (on("p19")) {
    def bgOld(dir: String): DataFrame =
      tok(dir).select(col("doc_id"), explode(bigrams("ws")).as("b")).distinct()
    def bgNew(dir: String): DataFrame =
      tok(dir).select(col("doc_id"),
        explode(array_distinct(bigrams("ws"))).as("b"))
    def p19of(bg: DataFrame): DataFrame = {
      val bench = bg.filter(col("doc_id") % 37 === 0).toDF("bid", "bb")
      val cand = bg.filter(col("doc_id") % 37 =!= 0)
      cand.join(broadcast(bench), col("b") === col("bb"))
        .groupBy("doc_id", "bid").agg(count(lit(1)).as("overlap"))
        .filter(col("overlap") >= 10)
        .groupBy("doc_id")
        .agg(max(col("overlap")).as("max_overlap"),
          countDistinct(col("bid")).as("n_bench"))
    }
    def p02of(bg: DataFrame, sz: DataFrame): DataFrame =
      bg.toDF("d1", "bx")
        .join(bg.toDF("d2", "by"), col("bx") === col("by") && col("d1") < col("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
        .join(sz.toDF("d1k", "n1"), col("d1") === col("d1k"))
        .join(sz.toDF("d2k", "n2"), col("d2") === col("d2k"))
        .withColumn("uni", col("n1") + col("n2") - col("inter"))
        .filter(col("inter") * 2 >= col("uni"))
        .select("d1", "d2", "inter", "uni")
    def szOld(bg: DataFrame): DataFrame =
      bg.groupBy("doc_id").agg(count(lit(1)).as("n"))
    def szNew(dir: String): DataFrame =
      tok(dir).select(col("doc_id"),
        graft.pipeline.TextHash.arrayDistinctCount(bigrams("ws")).as("n"))
    time("p19_old_distinct", () => p19of(bgOld(sfDir)))
    time("p19_new_doclocal", () => p19of(bgNew(sfDir)))
    time("p02_old_distinct", () => p02of(bgOld(sfDir), szOld(bgOld(sfDir))))
    time("p02_new_doclocal", () => p02of(bgNew(sfDir), szNew(sfDir)))
    time("p19_old_distinct2", () => p19of(bgOld(sfDir)))
    time("p19_new_doclocal2", () => p19of(bgNew(sfDir)))
    }

    if (on("p29")) {
    val K = 8
    def p29of(dig: Column => Column): DataFrame = {
      val g = tok(sfDir).select(col("doc_id"),
        posexplode(wordWindows("ws", K, 1, " ", partial = false))
          .as(Seq("p0", "c")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), dig(col("c")).as("h"))
      val dupKeys = g.groupBy("h").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1).select("h")
      val dup = g.join(dupKeys, Seq("h")).select("doc_id", "pos")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      dup
        .withColumn("ns",
          when(lag("pos", 1).over(w).isNull ||
            col("pos") - lag("pos", 1).over(w) > K, 1L).otherwise(0L))
        .withColumn("cov",
          when(lead("pos", 1).over(w).isNull, lit(K.toLong))
            .otherwise(least(lead("pos", 1).over(w) - col("pos"), lit(K.toLong))))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("dup_grams"), sum("ns").as("dup_spans"),
          sum("cov").as("dup_tokens"))
    }
    def xxPair(c: Column): Column =
      struct(xxhash64(c).as("x"), xxhash64(reverse(c)).as("y"))
    val a = p29of(md5)
    val b = p29of(xxPair)
    println("CHECK p29 xxdiff=" +
      (a.exceptAll(b).count() + b.exceptAll(a).count()))
    time("p29_md5", () => p29of(md5))
    time("p29_xxpair", () => p29of(xxPair))
    time("p29_md5_2", () => p29of(md5))
    time("p29_xxpair_2", () => p29of(xxPair))
    }

    if (on("p13")) {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.arrayDot
    def embNorm(dir: String): DataFrame =
      t(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(arrayDot(col("v"), col("v"))))
    def cosCol: Column = arrayDot(col("v1"), col("v2")) / (col("n1") * col("n2"))
    def p13old(dir: String): DataFrame = {
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
      probes.join(lists, col("plist") === col("list") && col("qid") =!= col("nid"))
        .withColumn("cos", cosCol)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("qid", "rank", "nid")
    }
    def p13new(dir: String): DataFrame = {
      val e = embNorm(dir)
      val cents = e.filter(col("vec_id") < 16).toDF("cid", "cv", "cn")
      def scoredOf(base: DataFrame): DataFrame =
        base.join(broadcast(cents), col("vec_id") =!= lit(-1))
          .withColumn("ccos",
            arrayDot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      // lists: argmax via struct-min agg (map-side partials; exchange
      // carries ONE row per vector, not 16 window rows)
      val lists = scoredOf(e).groupBy("vec_id")
        .agg(min(struct((-col("ccos")).as("nc"), col("cid").as("cid"),
          col("v").as("v"), col("nrm").as("nrm"))).as("m"))
        .select(col("vec_id").as("nid"), col("m.cid").as("list"),
          col("m.v").as("v2"), col("m.nrm").as("n2"))
      // probes: only 30 vectors — filter FIRST, tiny window after
      val probes = scoredOf(e.filter(col("vec_id") < 30))
        .withColumn("crank", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid").asc)))
        .filter(col("crank") <= 2)
        .select(col("vec_id").as("qid"), col("cid").as("plist"),
          col("v").as("v1"), col("nrm").as("n1"))
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
      probes.join(lists, col("plist") === col("list") && col("qid") =!= col("nid"))
        .withColumn("cos", cosCol)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("qid", "rank", "nid")
    }
    val zeroNorms = embNorm(sfDir).filter(col("nrm") === 0 || isnan(col("nrm"))).count()
    println(s"CHECK p13 zero/NaN norms=$zeroNorms")
    val a13 = p13old(sfSmall); val b13 = p13new(sfSmall)
    println("CHECK p13 sf0.01 diff=" +
      (a13.exceptAll(b13).count() + b13.exceptAll(a13).count()))
    time("p13_old_window", () => p13old(sfDir))
    time("p13_new_argmax", () => p13new(sfDir))
    time("p13_old_window2", () => p13old(sfDir))
    time("p13_new_argmax2", () => p13new(sfDir))
    }

    if (on("q05")) {
    import org.apache.spark.sql.types.TimestampType
    def q05parts(dir: String, upTo: Int): DataFrame = {
      val r = t(spark, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(spark, dir, "nation")
      val sup = t(spark, dir, "supplier")
      val c = t(spark, dir, "customer")
      val o = t(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val l = t(spark, dir, "lineitem")
      val asiaN = n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val supA = sup.join(broadcast(asiaN), col("s_nationkey") === col("n_nationkey"))
      val cA = c.join(broadcast(asiaN), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_nationkey")
      val co = cA.join(o, col("c_custkey") === col("o_custkey"))
      if (upTo == 1) return co.select("o_orderkey", "c_nationkey")
      val col3 = co.join(l, col("o_orderkey") === col("l_orderkey"))
      if (upTo == 2) return col3.select("l_suppkey", "c_nationkey",
        "l_extendedprice", "l_discount")
      col3.join(supA, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(sum(graft.queries.Tables.cents(col("l_extendedprice")) *
          (lit(100L) - graft.queries.Tables.pct(col("l_discount"))))
          .as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("n_name").asc)
    }
    time("q05_scan_orders", () => t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1998-01-01").cast(TimestampType)))
    time("q05_scan_lineitem", () => t(spark, sfDir, "lineitem"))
    time("q05_c_join_o", () => q05parts(sfDir, 1))
    time("q05_co_join_l", () => q05parts(sfDir, 2))
    time("q05_full", () => q05parts(sfDir, 3))
    }

    if (on("p26")) {
    // job count + wall time of the CC loop with eager vs lazy local
    // checkpoints, same star passes, same graph
    def ccJobs(eager: Boolean): (Long, Int, Double) = {
      import org.apache.spark.sql.DataFrame
      def sym(e: DataFrame): DataFrame =
        e.union(e.select(col("v").as("u"), col("u").as("v")))
          .filter(col("u") =!= col("v")).distinct()
      def star(e: DataFrame, large: Boolean): DataFrame = {
        val m = e.groupBy("u").agg(min(col("v")).as("mv"))
          .select(col("u").as("uu"), least(col("mv"), col("u")).as("m"))
        val nbr = e.join(m, col("u") === col("uu"))
        val out =
          if (large) nbr.filter(col("v") > col("u"))
            .select(col("v").as("u"), col("m").as("v"))
          else nbr.filter(col("v") <= col("u"))
            .select(col("v").as("u"), col("m").as("v"))
            .union(m.select(col("uu").as("u"), col("m").as("v")))
        sym(out)
      }
      val counter = new org.apache.spark.scheduler.SparkListener {
        val jobs = new java.util.concurrent.atomic.AtomicInteger
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(counter)
      val t0 = System.nanoTime()
      val pairsDf = spark.range(0, 2000).selectExpr("id as d1", "id + 1 as d2")
      var edges = sym(pairsDf.select(col("d1").as("u"), col("d2").as("v")))
        .localCheckpoint(eager)
      var n = edges.count()
      var converged = n == 0
      var rounds = 0
      while (!converged && rounds < 30) {
        val next = star(star(edges, large = true), large = false)
          .localCheckpoint(eager)
        val nn = next.count()
        converged = nn == n && next.except(edges).isEmpty
        edges = next; n = nn; rounds += 1
      }
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      spark.sparkContext.removeSparkListener(counter)
      (counter.jobs.get().toLong, rounds, secs)
    }
    for (eager <- Seq(true, false, true, false)) {
      val (j, r, s) = ccJobs(eager)
      println(f"PROBE cc eager=$eager jobs=$j rounds=$r secs=$s%.2f")
    }
    }

    if (on("q13")) {
    // current multi-countDistinct (Expand x4) vs a separate-agg rewrite
    def q13cur(dir: String): DataFrame =
      t(spark, dir, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          countDistinct(col("l_suppkey"), col("l_partkey")).as("n_supp_part"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    def q13multi(dir: String): DataFrame = {
      val li = t(spark, dir, "lineitem")
      val a = li.select("l_returnflag", "l_suppkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_supp"))
      val b = li.select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_part"))
      val c = li.select("l_returnflag", "l_suppkey", "l_partkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_supp_part"))
      val d = li.groupBy("l_returnflag").agg(count(lit(1)).as("n_rows"))
      a.join(b, "l_returnflag").join(c, "l_returnflag").join(d, "l_returnflag")
        .orderBy("l_returnflag")
    }
    println("CHECK q13 rewrite diff=" +
      (q13cur(sfSmall).exceptAll(q13multi(sfSmall)).count() +
        q13multi(sfSmall).exceptAll(q13cur(sfSmall)).count()))
    time("q13_expand", () => q13cur(sfDir))
    time("q13_multiagg", () => q13multi(sfDir))
    }

    if (on("p03")) {
    // 1. aggregation-only timings at sfDir
    time("sig_mins_only", () => sigMinsOnly(sfDir))
    time("sig_collect_str", () => sigStr(sfDir))
    time("sig_collect_md5", () => sigMd5(sfDir))
    time("sig_collect_md5hex", () => sigMd5Hex(sfDir))
    time("sig_collect_xx64", () => sigXx(sfDir))
    time("sig_collect_struct", () => sigStruct(sfDir))
    // 1b. cand-only (persist cost of the bs payload, verify excluded)
    time("cand_str", () => candOnly(sigStr(sfDir)))
    time("cand_md5", () => candOnly(sigMd5(sfDir)))
    time("cand_xx64", () => candOnly(sigXx(sfDir)))
    time("cand_struct", () => candOnly(sigStruct(sfDir)))
    // 2. full pairs pipeline
    time("pairs_str", () => pairs(sigStr(sfDir)))
    time("pairs_md5", () => pairs(sigMd5(sfDir)))
    time("pairs_md5hex", () => pairs(sigMd5Hex(sfDir)))
    time("pairs_xx64", () => pairs(sigXx(sfDir)))
    time("pairs_struct", () => pairs(sigStruct(sfDir)))
    }

    spark.stop()
  }
}
