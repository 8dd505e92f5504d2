package graft.spark

import java.nio.file.Files

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming fuzz: random source commits (appends of varying file
  * counts, occasional CoW deletes) interleave with AvailableNow drains
  * under random admission caps and no-op restarts. The sink must hold
  * EXACTLY the rows ever appended to the source — each once (exactly-
  * once across restarts), never dropped by an admission boundary, and
  * never retracted by a skipped delete snapshot. */
class StreamingFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-sfz-wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-fuzz")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gsf", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.gsf.warehouse", warehouse)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsf.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def runSeed(seed: Int, steps: Int,
      mergeMinCount: Option[Int] = None): Unit = {
    val src = s"gsf.db.sfz_src_$seed"
    val dst = s"gsf.db.sfz_dst_$seed"
    // merge arm: the streaming SINK is the canonical frequent-commit
    // workload manifest merging exists for — an aggressive min-count on
    // both ends makes every micro-batch commit land on freshly-merged
    // manifests while the source's incremental offsets keep resolving
    val mp = mergeMinCount
      .map(n => s" TBLPROPERTIES ('commit.manifest.min-count-to-merge'='$n')")
      .getOrElse("")
    spark.sql(s"CREATE TABLE $src (id BIGINT, v STRING)$mp")
    spark.sql(s"CREATE TABLE $dst (id BIGINT, v STRING)$mp")
    val checkpoint = Files.createTempDirectory(s"graft-sfz-ckpt-$seed").toString

    val rng = new Random(seed)
    // every row ever appended to the source — the sink's expected content
    val emitted = mutable.ArrayBuffer.empty[(Long, String)]
    var nextId = 0L

    def appendCommit(): String = {
      val n = 1 + rng.nextInt(8)
      val rows = (0 until n).map { _ =>
        val id = nextId; nextId += 1
        val v = s"s$id-${rng.nextInt(100)}"
        emitted += ((id, v))
        (id, v)
      }
      val df = spark.createDataFrame(rows).toDF("id", "v")
      (if (rng.nextBoolean()) df.repartition(2) else df.coalesce(1))
        .writeTo(src).append()
      s"append($n)"
    }

    def drain(): String = {
      val rdr = spark.readStream
        .option("streaming-skip-delete-snapshots", "true")
        .option("streaming-skip-overwrite-snapshots", "true")
      val capped = rng.nextInt(3) match {
        case 0 => rdr.option("streaming-max-files-per-micro-batch",
          (1 + rng.nextInt(2)).toString)
        case 1 => rdr.option("streaming-max-rows-per-micro-batch",
          (2 + rng.nextInt(6)).toString)
        case _ => rdr
      }
      val q = capped.table(src)
        .writeStream
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .toTable(dst)
      q.awaitTermination(120000)
      val got = spark.sql(s"SELECT id, v FROM $dst")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got == emitted.sortBy(_._1).toSeq,
        s"seed=$seed: sink diverges after drain " +
          s"(${got.size} vs ${emitted.size} rows)")
      "drain"
    }

    def deleteSome(): String = {
      // rows already emitted stay in the sink; the skip option lets the
      // stream pass the delete snapshot
      val m = 3 + rng.nextInt(3); val r = rng.nextInt(m)
      spark.sql(s"DELETE FROM $src WHERE id % $m = $r")
      s"delete(id%$m=$r)"
    }

    appendCommit()
    drain()
    (1 to steps).foreach { _ =>
      rng.nextInt(6) match {
        case 0 | 1 | 2 => appendCommit()
        case 3         => deleteSome()
        case _         => drain()
      }
    }
    drain() // final: everything appended must have arrived exactly once
    drain() // no-op restart: nothing duplicated

    // merge arm: the sink's manifest list must be BOUNDED after the
    // whole history — this is the 1,440-manifests/day streaming cliff
    // the merge path exists to prevent
    mergeMinCount.foreach { n =>
      val t = new graft.core.meta.HadoopCatalog(warehouse)
        .loadTable(Seq("db"), s"sfz_dst_$seed").get
      val ms = graft.core.meta.ManifestIO.readList(
        t.meta.currentSnapshot.get.manifestListPath)
      assert(ms.size <= n + 2,
        s"seed=$seed: sink manifest list unbounded: ${ms.size} > ${n + 2}")
    }
  }

  test("seeded streaming fuzz, seed 7") { runSeed(7, 14) }

  test("seeded streaming fuzz with aggressive manifest merging") {
    runSeed(7007, 16, mergeMinCount = Some(3))
  }
  test("seeded streaming fuzz, seed 70") { runSeed(70, 16) }

  // opt-in soak: GRAFT_FUZZ_SOAK=n runs n fresh random seeds
  sys.env.get("GRAFT_FUZZ_SOAK").map(_.toInt).filter(_ > 0).foreach { n =>
    val base = (System.nanoTime() % 1000000).toInt
    (0 until n).foreach(i =>
      test(s"soak streaming fuzz, seed ${base + i}") { runSeed(base + i, 12) })
  }
}
