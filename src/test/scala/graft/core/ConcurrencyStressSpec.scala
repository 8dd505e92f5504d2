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

  test("two DVs for one data file in a SINGLE commit are unioned") {
    val wh = Files.createTempDirectory("graft-dv-sib").toString
    val cat = new HadoopCatalog(wh)
    val t = cat.createTable(Seq("db"), "dvsib", schema)
    val dataPath = s"${t.location}/data/f1.parquet"
    t.newAppend().appendFile(dataFile(dataPath, 1000)).commit()
    def dv(name: String, positions: Seq[Long]): DataFile = {
      val p = s"${t.location}/data/$name.dv"
      val n = DVIO.write(p, dataPath, positions.iterator)
      DataFile(p, "dv", 0, Nil, n, GraftIO.size(p),
        content = FileContent.PositionDeletes,
        referencedDataFile = Some(dataPath))
    }
    t.newRowDelta()
      .addDeletes(dv("a", Seq(1L, 2L, 3L)))
      .addDeletes(dv("b", Seq(3L, 4L)))
      .commit()
    val live = ManifestIO
      .readList(t.refresh().currentSnapshot.get.manifestListPath)
      .filter(_.content == 1)
      .flatMap(mf => ManifestIO.readEntries(mf).filter(_.isLive).map(_.file))
    assert(live.size === 1, s"sibling DVs not merged: ${live.map(_.path)}")
    val (_, bm) = DVIO.read(live.head.path)
    assert(bm.getLongCardinality === 4) // {1,2,3,4} — overlap collapsed
    assert(live.head.contentOffset.contains(4L))
    assert(live.head.contentSizeInBytes.exists(_ > 0L))
  }

  test("racing DV row-deltas on one data file merge under CAS retry") {
    val wh = Files.createTempDirectory("graft-dv-race").toString
    val cat = new HadoopCatalog(wh)
    val t = cat.createTable(Seq("db"), "dvrace", schema)
    val dataPath = s"${t.location}/data/f1.parquet"
    t.newAppend().appendFile(dataFile(dataPath, 10000)).commit()

    // 8 writers, each deleting a disjoint position range via its own DV;
    // every commit whose base already carries a DV for f1 must re-merge
    // inside the retry (manifests() runs against the fresh base)
    val writers = 8
    val perWriter = 100
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until writers).foreach { w =>
      pool.submit(new Runnable {
        override def run(): Unit = try {
          val positions = (0 until perWriter).map(i => (w * perWriter + i).toLong)
          val dvPath = s"${t.location}/data/dv-race-$w.dv"
          val n = DVIO.write(dvPath, dataPath, positions.iterator)
          val dv = DataFile(dvPath, "dv", 0, Nil, n, GraftIO.size(dvPath),
            content = FileContent.PositionDeletes,
            referencedDataFile = Some(dataPath))
          new GTable(cat.tableOps(Seq("db"), "dvrace"))
            .newRowDelta().addDeletes(dv).commit()
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS))
    assert(errs.isEmpty, s"racing DV commits failed: ${errs.peek()}")

    val live = ManifestIO
      .readList(t.refresh().currentSnapshot.get.manifestListPath)
      .filter(_.content == 1)
      .flatMap(mf => ManifestIO.readEntries(mf).filter(_.isLive).map(_.file))
    assert(live.size === 1,
      s"expected ONE merged DV after $writers racing deletes, got ${live.map(_.path)}")
    val (ref, bm) = DVIO.read(live.head.path)
    assert(ref === dataPath)
    assert(bm.getLongCardinality === writers.toLong * perWriter)
    assert((0 until writers * perWriter).forall(i => bm.contains(i.toLong)))
    assert(live.head.recordCount === writers.toLong * perWriter)
  }

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
