package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked aggregation over the graft micro-batch SOURCE (the sink
  * side alone is covered in SparkIntegrationSpec): file-per-batch
  * admission + event-time watermark late-dropping, end to end.
  *
  * Spark applies the PREVIOUS batch's watermark when late-filtering a
  * batch's input rows (the freshly raised one is only used for state
  * eviction), so data that must be dropped has to stream at least two
  * batches after the data that raised the watermark — the same layout
  * the g45 gate uses. This spec pins that semantic: a buffer batch in
  * between → old file fully dropped; without it the old file would be
  * admitted against watermark 0.
  */
class WmkStreamWatermarkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val warehouse = Files.createTempDirectory("graft-wmkstream-wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-wmkstream")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val T0 = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs
  private val H = 3600000000L

  test("late file streamed two batches behind the watermark raise is dropped") {
    spark.sql("CREATE TABLE graft.db.wmk_src (event_type STRING, ts TIMESTAMP)")
    // three single-file snapshots, newest first: hours 62..74, 50..61,
    // and 0..24 (the late one)
    def slab(fromH: Int, toH: Int) = spark.sql(
      s"""SELECT 'a' AS event_type,
        timestamp_micros($T0 + ($fromH*3600 + id*600) * 1000000) AS ts
      FROM range(0, ${(toH - fromH + 1) * 6})""")
    slab(62, 74).coalesce(1).writeTo("graft.db.wmk_src").append()
    slab(50, 61).coalesce(1).writeTo("graft.db.wmk_src").append()
    slab(0, 24).coalesce(1).writeTo("graft.db.wmk_src").append()
    spark.sql("""CREATE TABLE graft.db.wmk_dst (
      win_start_us BIGINT, event_type STRING, n BIGINT)""")
    val q = spark.readStream.option("max-files-per-micro-batch", "1")
      .table("graft.db.wmk_src")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-wmkstream-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .toTable("graft.db.wmk_dst")
    q.awaitTermination(60000)
    // one file per micro-batch: three source batches
    val epochs = spark.sql(
      "SELECT summary['streaming-epoch-id'] FROM graft.db.wmk_dst.snapshots")
      .collect().map(_.getString(0).toLong).sorted
    assert(epochs.length >= 3, s"expected >=3 micro-batches, got $epochs")
    val rows = spark.table("graft.db.wmk_dst").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    // watermark after batch 0 = last event (74h50m) - 1h = 73h50m: the
    // 0..24h file is entirely late and dropped
    assert(!rows.keys.exists(_ < T0 + 50 * H),
      s"late-file windows must be dropped: ${rows.keys.toSeq.sorted}")
    // every closed window of the kept slabs emitted exactly once with
    // full counts (6 events/hour); [73h,74h) and the open tail did not
    val expected = (50 to 72).map(h => T0 + h * H).toSet
    assert(rows.keys.toSet === expected,
      s"emitted window set mismatch: ${rows.keys.toSeq.sorted}")
    assert(rows.values.forall(_ == 6L), s"double-counted or partial: $rows")
  }
}
