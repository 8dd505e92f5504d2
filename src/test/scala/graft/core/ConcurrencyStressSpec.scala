package graft.core

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.scalatest.funsuite.AnyFunSuite

import graft.core.expr._
import graft.core.meta._
import graft.core.types._

/** Mixed-workload commit stress: many appenders racing a compacting
  * rewriter on ONE table, with the aggressive metadata settings all on
  * at once — gzip documents, a 3-entry metadata-log, delete-after-commit.
  * The invariant is the one that matters at any scale: no committed row
  * is ever lost or double-counted, no matter how the CAS races resolve.
  * (Mirrors the shape of reference TestCommitConcurrency; also regresses
  * the delete-after-commit race where a loser's base document disappears
  * mid-commit — that must surface as a lost CAS and retry, not an
  * exception.) */
class ConcurrencyStressSpec extends AnyFunSuite {

  private val schema = GSchema(GStruct(Seq(
    GField(1, "id", GLong, required = true),
    GField(2, "data", GString))))

  private def dataFile(path: String, rows: Long): DataFile =
    DataFile(path, "parquet", 0, Nil, recordCount = rows, fileSizeBytes = rows * 100,
      columnStats = Map(1 -> ColStats(Some(rows), Some(0L), None, Some(1L), Some(rows))))

  test("parallel appenders + compacting rewriter never lose rows") {
    val wh = Files.createTempDirectory("graft-stress").toString
    val cat = new HadoopCatalog(wh)
    cat.createTable(Seq("db"), "stress", schema,
      PartitionSpec.Unpartitioned,
      Map(
        "write.metadata.compression-codec" -> "gzip",
        "write.metadata.previous-versions-max" -> "3",
        "write.metadata.delete-after-commit.enabled" -> "true"))

    val Appenders = 6
    val PerThread = 12
    val seq = new AtomicLong(0)
    val expected = new AtomicLong(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

    val appenders = (1 to Appenders).map { tid =>
      new Thread(() => {
        try {
          val t = cat.loadTable(Seq("db"), "stress").get
          (1 to PerThread).foreach { i =>
            val rows = 10L + (tid * PerThread + i) % 7
            var done = false
            while (!done) {
              // SnapshotProducer.commit retries its CAS internally; under
              // heavy contention it can still give up — rebuild and retry
              try {
                t.newAppend()
                  .appendFile(dataFile(s"f-$tid-$i-${seq.incrementAndGet()}.parquet", rows))
                  .commit()
                done = true
              } catch { case _: CommitConflictException => () }
            }
            expected.addAndGet(rows)
          }
        } catch { case e: Throwable => failures.add(e) }
      }, s"appender-$tid")
    }

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val rewriter = new Thread(() => {
      try {
        val t = cat.loadTable(Seq("db"), "stress").get
        while (!stop.get()) {
          val files = t.refresh().currentSnapshot
            .map(_ => t.newScan().planFiles().map(_.file)).getOrElse(Nil)
          if (files.size >= 4) {
            val victims = files.sortBy(_.recordCount).take(2)
            val merged = dataFile(
              s"compact-${seq.incrementAndGet()}.parquet",
              victims.map(_.recordCount).sum)
            try t.newOverwrite()
              .deleteFiles(victims.map(_.path))
              .addFiles(Seq(merged))
              .overrideOperation("replace")
              .commit()
            catch { case _: CommitConflictException => () } // lost the race
          } else Thread.sleep(2)
        }
      } catch { case e: Throwable => failures.add(e) }
    }, "rewriter")

    appenders.foreach(_.start()); rewriter.start()
    appenders.foreach(_.join(120000))
    stop.set(true); rewriter.join(30000)

    assert(failures.isEmpty, s"worker failures: ${failures.toArray.toSeq}")

    val t = cat.loadTable(Seq("db"), "stress").get
    val m = t.refresh()
    // the one invariant: every appended row is live exactly once
    val live = t.newScan().planFiles().map(_.file.recordCount).sum
    assert(live === expected.get(), "rows lost or duplicated under contention")
    // commit-time totals agree with the file scan
    assert(m.currentSnapshot.get.summary("total-records") === expected.get().toString)
    // retention held: at most 3 previous documents tracked, and the
    // metadata dir is bounded instead of one file per commit
    assert(m.metadataLog.size <= 3)
    val onDisk = GraftIO.list(s"${t.location}/metadata")
      .count(_.endsWith(".metadata.json"))
    val commits = Appenders * PerThread + 1
    assert(onDisk < commits / 2,
      s"delete-after-commit left $onDisk of ~$commits version files")
    // every tracked document still exists and parses (gzip round-trip)
    (m.metadataLog.map(_._2) ++ t.ops.currentMetadataPath).foreach { p =>
      assert(GraftIO.exists(p), s"tracked metadata document missing: $p")
      MetaJson.readMetadata(GraftIO.readString(p), Some(p))
    }
  }
}
