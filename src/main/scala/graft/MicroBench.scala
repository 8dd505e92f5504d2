package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r18): noop-sink timings for arbitrary bank queries — the
  * guide §1.4 measurement for operators the headline Bench does not
  * cover (not part of the driver contract; run with
  * `sbt "runMain graft.MicroBench <names...>"`).
  *
  * Protocol: same session confs as Bench, one untimed warm-up run per
  * query (table builds + codegen), then 5 timed noop-sink runs; prints
  * median and all samples. The noop sink computes every column of every
  * row (§1.4) so HOF/codegen differences inside Project nodes are paid,
  * unlike count() which prunes them.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wanted = if (args.nonEmpty) args.toSeq else Seq("p03_dedup_minhash_lsh")
    val bank = SparkEntry.bank.map(q => q.name -> q).toMap
    // r19 (ADVICE): a failed warm-up SKIPS that query only — the previous
    // non-local `return` aborted the whole run and bypassed spark.stop()
    try wanted.foreach { name =>
      val q = bank.getOrElse(name, sys.error(s"unknown query $name"))
      spark.sparkContext.setJobDescription(s"microbench warmup: $name")
      val warmOk =
        try { q.run(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          println(s"FAIL $name: ${e.getMessage}"); false }
      if (warmOk) {
        val samples = (1 to 5).map { i =>
          spark.catalog.clearCache()
          spark.sparkContext.setJobDescription(s"microbench $name #$i")
          val t0 = System.nanoTime()
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val med = samples.sorted.apply(2)
        println(f"MICRO $name median=$med%.3f samples=" +
          samples.map(s => f"$s%.3f").mkString("[", ",", "]"))
      }
    } finally spark.stop()
  }
}
