package graft.spark

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta.{HadoopCatalog, Puffin, StatBlobMeta, StatisticsFile}

/** A registered genuine-Iceberg table carries theta-sketch NDV blobs, not
  * graft's stats.ndv.* properties — estimateStatistics must still feed
  * NDV into CBO from the statistics files (reference SparkScan reads the
  * blob `ndv` summary / NDVSketchUtil). */
class StatsNdvInteropSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-ndv-wh").toString
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ndv-interop")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gnv", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.gnv.warehouse", warehouse)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnv.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** minimal compact theta sketch (exact mode): retained entries only */
  private def thetaSketch(retained: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + retained * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(2.toByte).put(3.toByte).put(3.toByte) // preLongs=2, serVer, family
    bb.put(0.toByte).put(0.toByte)
    bb.put((0x02 | 0x08 | 0x10).toByte)          // readonly|compact|ordered
    bb.putShort(0x93cc.toShort)
    bb.putInt(retained); bb.putInt(0)
    (0 until retained).foreach(i => bb.putLong(5000L + i))
    bb.array()
  }

  test("theta statistics blobs feed NDV without stats.ndv properties") {
    spark.sql("CREATE TABLE gnv.db.theta_t (id BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO gnv.db.theta_t SELECT id, concat('v', id) FROM range(0, 50)")
    val t = new HadoopCatalog(warehouse).loadTable(Seq("db"), "theta_t").get
    val snap = t.meta.currentSnapshot.get
    // an external engine's stats file: theta sketch for id (field 1),
    // blob-summary ndv for v (field 2) — no graft properties anywhere
    val path = s"${t.location}/metadata/external-theta.stats.puffin"
    val blobs = Seq(
      Puffin.Blob("apache-datasketches-theta-v1", Seq(1), snap.snapshotId,
        snap.sequenceNumber, thetaSketch(50)),
      Puffin.Blob("apache-datasketches-theta-v1", Seq(2), snap.snapshotId,
        snap.sequenceNumber, Array[Byte](0), Map("ndv" -> "47")))
    val (size, footer) = Puffin.write(path, blobs)
    t.commitUpdate { base =>
      base.copy(statistics = base.statistics :+
        StatisticsFile(snap.snapshotId, path, size, footer,
          blobs.map(b => StatBlobMeta(b.blobType, b.snapshotId,
            b.sequenceNumber, b.fields, b.properties))))
    }
    assert(!t.refresh().properties.keys.exists(_.startsWith("stats.ndv.")),
      "precondition: no graft ndv properties")
    val ndv = GraftSparkTable.statisticsNdv(t.meta)
    assert(ndv === Map(1 -> 50L, 2 -> 47L),
      s"theta/summary NDVs must reach the CBO stats map: $ndv")
  }
}
