package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"value":N,"unit":"sec","queries":{...}}.
  * Each query is forced with a count() after a warm-up of the session
  * (JVM/codegen warm-up is excluded by running a tiny priming query first).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Prime the JVM (class loading, codegen) on the smallest sf.
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }

    val headliners = SparkEntry.bank.filter(_.headline)
    // untimed warm-up: one-time table builds + codegen; then one timed run
    headliners.foreach { q =>
      try q.run(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // Median of 5 timed runs per query: single-shot numbers on a shared
    // machine swing 2-7x (GC pauses, page-cache state, co-tenant load);
    // the driver benches once per round, so each reported number must be
    // noise-robust — r8's driver run medianed 3 samples under heavy load
    // and published 3x-inflated numbers for queries that run 4x faster
    // when sampled 5x locally. Before
    // each sample, drop any DataFrame persist() left by the previous run so
    // every sample measures a cold plan (persist reuse within one run is
    // still counted — that reuse is part of the query's design).
    // a throwing query must NOT produce a time-to-exception "sample"
    // (r7's g01 published 0.009 s fast-fails as real numbers); record the
    // failure and exit nonzero after printing whatever is valid.
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    def sampleAll(): Seq[(String, Double, Seq[Double])] = headliners.map { q =>
      val samples = (1 to 5).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { q.run(spark, sfDir).count() } catch { case e: Throwable =>
          failed.getOrElseUpdate(q.name,
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      (q.name, samples.sorted.apply(2), samples)
    }
    val wasCold = graft.queries.Engine.builtCold(sfDir)
    // BASELINE.md's 2x budget is vs native spark.read.parquet: measure the
    // exact native equivalent of g01 (q06's plan) in the SAME run so the
    // gate is evaluated directly, not by cross-run proxy. Median of 5 —
    // the baseline must not be a single noisy sample.
    val natQ = SparkEntry.bank.find(_.name == "q06_forecast_revenue")
    def measureNative(): Double = natQ.map { q =>
      val samples = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).count() catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      samples(2)
    }.getOrElse(0.0)
    // NOISE CONTROL: the native scan is a machine-health canary — the
    // same code and data measured 0.21-0.23 s every round, so a reading
    // far above the committed expectation means CO-TENANT LOAD, not an
    // engine change (r12's committed bench recorded a 0.876 s native
    // scan and 4-24x query inflation from one such burst). The canary
    // BRACKETS the query samples (before and after): a burst inside the
    // sampling window trips at least one side. A tripped side waits out
    // the burst and retries; a recovery resamples the queries and
    // re-brackets. If the machine never calms, control_ok=false marks
    // the run invalid rather than letting it read as a regression.
    val expectedNative: Double = {
      val f = Seq("BENCH_CONTROL.json", "/root/repo/BENCH_CONTROL.json")
        .map(new java.io.File(_)).find(_.exists())
        .getOrElse(new java.io.File("BENCH_CONTROL.json"))
      if (!f.exists()) 0.22
      else {
        val m = """"native_scan_sec"\s*:\s*([0-9.]+)""".r
        m.findFirstMatchIn(
          new String(java.nio.file.Files.readAllBytes(f.toPath)))
          .map(_.group(1).toDouble).getOrElse(0.22)
      }
    }
    def calm(n: Double): Boolean = n <= expectedNative * 2
    var controlRetries = 0
    def settleControl(): Double = {
      var n = measureNative()
      while (!calm(n) && controlRetries < 3) {
        Thread.sleep(15000)
        controlRetries += 1
        n = measureNative()
      }
      n
    }
    var pre = settleControl()
    val retriesBeforeSampling = controlRetries
    var results = sampleAll()
    var post = settleControl()
    val postTripped = controlRetries > retriesBeforeSampling
    var resampled = false
    if (calm(post) && postTripped && controlRetries < 3) {
      // a burst hit DURING sampling (the POST control tripped) but the
      // machine recovered: those samples are contaminated — take them
      // again, re-bracketed. Pre-phase retries alone don't resample:
      // sampling started after the machine had already settled.
      failed.clear()
      pre = post
      results = sampleAll()
      post = measureNative()
      resampled = true
    }
    val native = math.min(pre, post)
    // a post-side trip whose recovery exhausted the retry budget leaves
    // the contaminated samples in place — that run is INVALID even
    // though both bracket readings ended calm
    val controlOk = calm(pre) && calm(post) && (!postTripped || resampled)
    // failed queries are EXCLUDED from queries/total/ratio — their wall
    // times are time-to-exception, not measurements; raw samples stay in
    // "samples" for forensics and the names land in "failed" + exit 2
    val ok = results.filterNot { case (k, _, _) => failed.contains(k) }
    val qs = ok.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // raw samples, in run order: a contaminated driver run (cold
    // warehouse rebuild in the same JVM) shows up as a wild first sample
    // and is distinguishable from a real regression without a re-run
    val sampleJson = results.map { case (k, _, ss) =>
      "\"" + k + "\":[" + ss.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0
    val g01 = ok.find(_._1 == "g01_engine_scan_prune").map(_._2).getOrElse(0.0)
    val ratio = if (native > 0 && g01 > 0) g01 / native else -1.0
    val failedJson = failed.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", " ") + "\""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""samples":$sampleJson,"warehouse_was_cold":$wasCold,""" +
      s""""failed":$failedJson,""" +
      s""""control_ok":$controlOk,"control_retries":$controlRetries,""" +
      s""""native_expected_sec":$expectedNative,""" +
      s""""native_scan_sec":$native,"g01_vs_native":$ratio,"sf":"$sfDir"}""")
    spark.stop()
    // nonzero exit: a setup crash must never masquerade as a fast sample
    if (failed.nonEmpty) sys.exit(2)
  }
}
