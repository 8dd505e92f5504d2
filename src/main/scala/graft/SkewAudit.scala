package graft

import org.apache.spark.sql.functions._

/** r19 dev tool (r18 verdict item 4, guide §2.5): demonstrate that the
  * packed-single-long LSH band self-joins (p03/p04/p18 candidate
  * generation) are skew-safe in their AT-SCALE form. At bench scale the
  * band joins plan as broadcast joins, where AQE skew handling never
  * applies; at 100 TB they become shuffle joins, and a boilerplate-heavy
  * corpus makes hot band keys (k docs sharing a band ⇒ one oversized
  * shuffle partition feeding k² candidate pairs). This audit forces the
  * shuffle-join form (broadcast disabled), synthesizes a hot band, and
  * verifies AQE's skew-join split fires on it.
  *
  * The skew thresholds are scaled DOWN to sandbox data sizes for the
  * demo only (the defaults are 256 MB / factor 5, sized for clusters —
  * a ~150 KB local partition can never cross them); production keeps
  * the defaults. Everything else is the shared Sessions confs. Not part
  * of the driver contract. Run:
  *   sbt "runMain graft.SkewAudit" > plans/r19/skew_audit_band_join.txt
  */
object SkewAudit {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(cpus)
      // force the at-scale SHUFFLE join form: no broadcast
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // at 100 TB a hot-band partition far exceeds the 64 MB SHJ-rewrite
      // threshold and stays a sort-merge join; reproduce that form at
      // sandbox bytes by disabling the local SMJ->SHJ rewrite (0 = the
      // Spark default)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
      .config("spark.sql.join.preferSortMergeJoin", "true")
      // demo-only scaling of the skew thresholds to sandbox bytes
      // (defaults: threshold 256m, factor 5, advisory 64m)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
      // keep AQE from coalescing the uniform partitions into one big one
      // before the skew check (local volumes are tiny)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Synthetic band table shaped like p03's `bands`: (doc_id, bkey)
    // plus an incompressible ~128-byte payload standing in for the
    // digest-set column the real verify side carries (16-byte rows of
    // near-identical longs compress below any threshold — shuffle skew
    // statistics are COMPRESSED bytes). 20k docs spread uniformly over
    // 100k band keys (deterministic xxhash64, never rand() — guide
    // §2.5) + ONE hot band shared by 8k docs (a boilerplate cluster).
    // Median shuffle partition ≈ 100 KB; the hot partition ≈ 1.1 MB ≈
    // 11x median and over the 64 KB demo threshold, mirroring a 100 TB
    // hot band against the 256 MB production default.
    def payload = concat(md5(col("id").cast("string")),
      md5((col("id") + 1).cast("string")),
      md5((col("id") + 2).cast("string")),
      md5((col("id") + 3).cast("string")))
    val uniform = spark.range(0, 20000)
      .select(col("id").as("doc_id"),
        pmod(xxhash64(col("id")), lit(100000L)).as("bkey"),
        payload.as("bs"))
    val hot = spark.range(20000, 28000)
      .select(col("id").as("doc_id"), lit(-1L).as("bkey"), payload.as("bs"))
    val bands = uniform.union(hot)

    // exactly minhashPairs' candidate self-join shape; the payloads stay
    // in the output (as the digest sets do in the verify join) so column
    // pruning cannot strip the shuffle back down to 16-byte rows
    val cand = bands.toDF("d1", "k1", "bs1")
      .join(bands.toDF("d2", "k2", "bs2"),
        col("k1") === col("k2") && col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        (length(col("bs1")) + length(col("bs2"))).as("w"))

    spark.sparkContext.setJobDescription("skew audit: hot-band self-join")
    // execute cand's OWN QueryExecution so the adaptive plan we print is
    // the finalized one (a .count() would execute a different plan)
    val qe = cand.queryExecution
    val n = qe.toRdd.count()

    val plan = qe.executedPlan.toString
    println("========== skew audit: packed-band self-join, broadcast disabled ==========")
    println(s"candidate pairs produced: $n (hot band contributes 8000*7999/2 = " +
      s"${8000L * 7999 / 2})")
    println(plan)
    val skewed = plan.toLowerCase.contains("skew")
    println(s"SKEW-SPLIT FIRED: $skewed")
    // the quadratic candidate OUTPUT of a hot band is the algorithm's
    // semantics (bounded by MinHash band quality, not by the engine);
    // what the engine must guarantee — and this audit shows — is that
    // the oversized INPUT partition is split across tasks instead of
    // pinning one straggler.
    spark.stop()
    if (!skewed) sys.exit(3)
  }
}
