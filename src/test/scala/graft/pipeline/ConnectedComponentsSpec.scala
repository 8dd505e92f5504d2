package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial graph shapes for the large-star/small-star connected
  * components behind p26: shapes the LSH pair gate can't force —
  * long chains (worst-case label-propagation diameter), cycles,
  * stars keyed by a non-minimal hub, and multiple components.
  */
class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-cc")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def cc(pairs: (Long, Long)*): Map[Long, (Long, Long)] = {
    val df = spark.createDataFrame(pairs).toDF("d1", "d2")
    Pipeline.connectedComponents(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("chain collapses to one component rooted at the minimum") {
    val r = cc(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L, 6L -> 7L)
    assert(r.keySet == (1L to 7L).toSet)
    assert(r.values.toSet == Set((1L, 7L)))
  }

  test("cycle, hub-star and reversed pairs find the component minimum") {
    // triangle 10-11-12 given in arbitrary pair order, hub 25 with
    // smaller leaves (min is a LEAF, not the hub), isolated pair
    val r = cc(12L -> 11L, 10L -> 12L, 10L -> 11L,
      25L -> 20L, 25L -> 21L, 25L -> 22L,
      40L -> 41L)
    assert(r(10L) == ((10L, 3L)) && r(11L) == ((10L, 3L)) && r(12L) == ((10L, 3L)))
    assert(Set(20L, 21L, 22L, 25L).forall(r(_) == ((20L, 4L))))
    assert(r(40L) == ((40L, 2L)) && r(41L) == ((40L, 2L)))
  }

  test("two chains joined by a bridge merge into one component") {
    val r = cc(1L -> 3L, 3L -> 5L, 2L -> 4L, 4L -> 6L, 5L -> 6L)
    assert(r.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(r.values.toSet == Set((1L, 6L)))
  }

  test("lazy checkpoints: one materializing job per round, not two") {
    // r19: localCheckpoint(eager=false) + count() fold the round's
    // materialization and its convergence count into ONE job (AQE's
    // per-exchange stage jobs dominate the absolute count — measured
    // 149 vs 162 jobs over 12 rounds on a 2000-node chain, i.e. exactly
    // one job per round + one at init saved). This 7-node chain runs
    // 49 jobs under the lazy scheme; the bound has slack for AQE/except
    // variation but trips if the eager per-round job comes back.
    val counter = new org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(counter)
    try {
      val df = spark.createDataFrame(
        Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L, 6L -> 7L))
        .toDF("d1", "d2")
      val out = Pipeline.connectedComponents(df).collect()
      assert(out.length === 7)
      // listener events are async; a short settle keeps the count stable
      Thread.sleep(1000)
      val jobs = counter.jobs.get()
      assert(jobs <= 55, s"connectedComponents ran $jobs jobs on a 7-chain")
    } finally spark.sparkContext.removeSparkListener(counter)
  }

  test("empty pair set yields an empty result") {
    val df = spark.emptyDataFrame
      .select(org.apache.spark.sql.functions.lit(0L).as("d1"),
        org.apache.spark.sql.functions.lit(0L).as("d2"))
      .limit(0)
    assert(Pipeline.connectedComponents(df).count() == 0)
  }
}
