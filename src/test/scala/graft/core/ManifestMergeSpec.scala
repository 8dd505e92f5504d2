package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.expr._
import graft.core.meta._
import graft.core.types._

/** Commit-time manifest merging + rolling manifests (reference
  * MergeAppend.java / MergingSnapshotProducer.java /
  * ManifestMergeManager.java:83-239 / RollingManifestWriter.java):
  * frequent-commit tables must keep a BOUNDED manifest count — manifest
  * count is the planning denominator, so a streaming sink at a 1-minute
  * trigger would otherwise accumulate 1,440 manifests/day and planning
  * degrades linearly. */
class ManifestMergeSpec extends AnyFunSuite {

  private val schema = GSchema(GStruct(Seq(
    GField(1, "id", GLong, required = true),
    GField(2, "data", GString))))

  private def tempCatalog(): HadoopCatalog =
    new HadoopCatalog(Files.createTempDirectory("graft-merge").toString)

  private def dataFile(path: String, ids: (Long, Long)): DataFile =
    DataFile(path, "parquet", 0, Nil, recordCount = ids._2 - ids._1 + 1,
      fileSizeBytes = 1000,
      columnStats = Map(1 -> ColStats(Some(ids._2 - ids._1 + 1), Some(0L), None,
        Some(ids._1), Some(ids._2))))

  private def listLen(t: GTable): Int =
    ManifestIO.readList(t.refresh().currentSnapshot.get.manifestListPath).size

  test("150 commits keep the manifest list bounded; reads stay exact") {
    val cat = tempCatalog()
    val t = cat.createTable(Seq("db"), "mm", schema,
      properties = Map(ManifestMerge.MinCountKey -> "8"))
    var snapAt50 = 0L
    (1 to 150).foreach { i =>
      t.newAppend().appendFile(dataFile(f"f$i%03d.parquet", (i * 10L, i * 10L + 4))).commit()
      if (i == 50) snapAt50 = t.meta.currentSnapshot.get.snapshotId
      // bounded at every point, not just the end: < min-count + the
      // fresh manifest (merging fires whenever the newest bin reaches 8)
      assert(listLen(t) <= 8, s"after commit $i")
    }
    // full read plans every file exactly once
    val tasks = t.newScan().planFiles()
    assert(tasks.size === 150)
    assert(tasks.map(_.file.path).distinct.size === 150)
    // time travel reads the snapshot's own (merged-at-the-time) list
    val tt = t.newScan().useSnapshot(snapAt50).planFiles()
    assert(tt.size === 50)
    assert(tt.map(_.file.path).toSet === tasks.map(_.file.path).toSet.filter { p =>
      p.split("/f").last.stripSuffix(".parquet").toInt <= 50
    })
    // merged manifests carry exact counts: summary totals stay exact
    val sum = t.meta.currentSnapshot.get.summary
    assert(sum("total-data-files") === "150")
    assert(sum("total-records") === "750")
  }

  test("min-count guard: no merge below the threshold; disabled = FastAppend") {
    val cat = tempCatalog()
    // default min-count 100: 50 commits accumulate 50 manifests untouched
    val t = cat.createTable(Seq("db"), "guard", schema)
    (1 to 50).foreach { i =>
      t.newAppend().appendFile(dataFile(s"g$i.parquet", (i * 10L, i * 10L + 4))).commit()
    }
    assert(listLen(t) === 50)
    // merge disabled: unbounded growth is the explicitly-requested shape
    val t2 = cat.createTable(Seq("db"), "nomerge", schema,
      properties = Map(ManifestMerge.MergeEnabledKey -> "false",
        ManifestMerge.MinCountKey -> "2"))
    (1 to 12).foreach { i =>
      t2.newAppend().appendFile(dataFile(s"n$i.parquet", (i * 10L, i * 10L + 4))).commit()
    }
    assert(listLen(t2) === 12)
  }

  test("min-count guard applies per (content, spec) group after spec evolution") {
    val cat = tempCatalog()
    val t = cat.createTable(Seq("db"), "multispec", schema,
      properties = Map(ManifestMerge.MinCountKey -> "8"))
    (1 to 3).foreach { i =>
      t.newAppend().appendFile(dataFile(s"s0-$i.parquet", (i * 10L, i * 10L + 4))).commit()
    }
    // evolve to a bucket spec; later appends write spec-1 manifests
    t.commitUpdate { base =>
      val ns = graft.core.expr.PartitionSpec(1, Seq(
        graft.core.expr.PartitionField(1, 1000, "id_bucket",
          graft.core.transform.BucketT(4))))
      base.copy(specs = base.specs :+ ns, defaultSpecId = 1,
        lastPartitionId = 1000)
    }
    def spec1File(i: Int) = DataFile(s"s1-$i.parquet", "parquet", 1,
      Seq(i % 4), 5L, 1000L)
    (1 to 3).foreach(i => t.newAppend().appendFile(spec1File(i)).commit())
    // both spec groups sit below min-count: NOTHING merges — the guard
    // covers the newest bin of EACH spec group, not just the bin holding
    // the globally-newest manifest
    assert(listLen(t) === 6)
    // pushing spec 1 past min-count merges only spec 1's bin; spec 0's
    // three manifests stay untouched under their own guard
    (4 to 9).foreach(i => t.newAppend().appendFile(spec1File(i)).commit())
    val ms = ManifestIO.readList(t.refresh().currentSnapshot.get.manifestListPath)
    assert(ms.count(_.specId == 0) === 3)
    assert(ms.count(_.specId == 1) < 9)
    assert(t.newScan().planFiles().size === 12)
  }

  test("merged entries: this commit's stay Added, carried become Existing with original ids") {
    val cat = tempCatalog()
    val t = cat.createTable(Seq("db"), "status", schema,
      properties = Map(ManifestMerge.MinCountKey -> "2"))
    val s1 = t.newAppend().appendFile(dataFile("a.parquet", (1L, 5L))).commit()
    val s2 = t.newAppend().appendFile(dataFile("b.parquet", (6L, 9L))).commit()
    // min-count 2: the second commit merges both manifests into one
    val ms = ManifestIO.readList(t.refresh().currentSnapshot.get.manifestListPath)
    assert(ms.size === 1)
    val entries = ManifestIO.readEntries(ms.head)
    assert(entries.size === 2)
    val byPath = entries.map(e => e.file.path.split('/').last -> e).toMap
    assert(byPath("a.parquet").status === ManifestEntryStatus.Existing)
    assert(byPath("a.parquet").snapshotId === s1.snapshotId)
    assert(byPath("a.parquet").dataSequenceNumber === 1L)
    assert(byPath("b.parquet").status === ManifestEntryStatus.Added)
    assert(byPath("b.parquet").snapshotId === s2.snapshotId)
    assert(byPath("b.parquet").dataSequenceNumber === 2L)
    // manifest-list counts reflect the split
    assert(ms.head.addedFilesCount === 1)
    assert(ms.head.existingFilesCount === 1)
    // reference SnapshotSummary manifest-maintenance counts
    val sum2 = t.meta.currentSnapshot.get.summary
    assert(sum2("manifests-created") === "1")
    assert(sum2("manifests-kept") === "0")
    assert(sum2("manifests-replaced") === "1")
    // the pre-merge manifest of THIS commit was deleted eagerly (no orphan)
    val mfDir = GraftIO.list(s"${t.location}/metadata").filter(_.contains("manifest-"))
      .filterNot(_.contains("manifest-list"))
    assert(mfDir.size === 2) // s1's manifest (still referenced by s1's list) + merged
  }

  test("data and delete manifests merge independently (row-delta path)") {
    val cat = tempCatalog()
    val t = cat.createTable(Seq("db"), "rowdelta", schema,
      properties = Map(ManifestMerge.MinCountKey -> "4"))
    (1 to 20).foreach { i =>
      val rd = t.newRowDelta()
      rd.addRows(dataFile(s"d$i.parquet", (i * 10L, i * 10L + 4)))
      rd.addDeletes(DataFile(s"del$i.parquet", "parquet", 0, Nil, 2L, 100L,
        content = FileContent.PositionDeletes,
        columnStats = Map(DeleteFileIndex.FilePathFieldId ->
          ColStats(Some(2L), Some(0L), None, Some(s"d$i.parquet"), Some(s"d$i.parquet")))))
      rd.commit()
    }
    val ms = ManifestIO.readList(t.refresh().currentSnapshot.get.manifestListPath)
    val (dataMs, delMs) = ms.partition(_.content == 0)
    assert(dataMs.size <= 4, s"data manifests: ${dataMs.size}")
    assert(delMs.size <= 4, s"delete manifests: ${delMs.size}")
    // every file still reachable
    assert(dataMs.map(m => m.addedFilesCount + m.existingFilesCount).sum === 20)
    assert(delMs.map(m => m.addedFilesCount + m.existingFilesCount).sum === 20)
  }

  test("rolling: a giant append splits at target-size-bytes; merge respects bins") {
    val cat = tempCatalog()
    // ~300 bytes per estimated entry; 2 KB target → ~6 entries/manifest
    val t = cat.createTable(Seq("db"), "roll", schema,
      properties = Map(ManifestMerge.TargetSizeKey -> "2048"))
    val ap = t.newAppend()
    (1 to 40).foreach(i => ap.appendFile(dataFile(s"r$i.parquet", (i * 10L, i * 10L + 4))))
    ap.commit()
    val ms = ManifestIO.readList(t.refresh().currentSnapshot.get.manifestListPath)
    assert(ms.size > 1, "a 40-file append at a 2KB target must roll")
    assert(ms.map(_.addedFilesCount).sum === 40)
    // every file plans exactly once through the rolled manifests
    val tasks = t.newScan().planFiles()
    assert(tasks.size === 40)
    assert(tasks.map(_.file.path).distinct.size === 40)
  }

  test("concurrent appends with merging: no lost files under CAS retries") {
    // merge rewrites are re-planned per CAS attempt against the fresh
    // base — a bin computed from a stale parent set that survived a
    // retry would lose (or duplicate) files. Three writers hammering one
    // table with min-count 4 makes merges and retries collide constantly.
    val cat = tempCatalog()
    cat.createTable(Seq("db"), "conc", schema,
      properties = Map(ManifestMerge.MinCountKey -> "4"))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 3).map { th =>
      new Thread(() => {
        try {
          val t = cat.loadTable(Seq("db"), "conc").get
          (1 to 20).foreach { i =>
            var done = false
            while (!done) {
              try {
                t.newAppend().appendFile(
                  dataFile(s"t$th-f$i.parquet", (i * 10L, i * 10L + 4))).commit()
                done = true
              } catch { case _: CommitConflictException => () }
            }
          }
        } catch { case e: Throwable => failures.add(e) }
      }, s"merge-appender-$th")
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.isEmpty, s"writer died: ${failures.peek()}")
    val t = cat.loadTable(Seq("db"), "conc").get
    val tasks = t.newScan().planFiles()
    assert(tasks.size === 60)
    assert(tasks.map(_.file.path).distinct.size === 60)
    assert(t.refresh().snapshots.size === 60)
    assert(listLen(t) <= 6, s"list unbounded under concurrency: ${listLen(t)}")
    // summary totals stay exact through merged, contended history
    assert(t.meta.currentSnapshot.get.summary("total-data-files") === "60")
  }

  test("a 40k-file import-sized append rolls at the DEFAULT 8MB target") {
    val cat = tempCatalog()
    val t = cat.createTable(Seq("db"), "bigimp", schema)
    val ap = t.newAppend()
    (1 to 40000).foreach(i =>
      ap.appendFile(dataFile(f"imports/part-$i%05d-of-40000.parquet",
        (i * 10L, i * 10L + 4))))
    ap.commit()
    val ms = ManifestIO.readList(t.refresh().currentSnapshot.get.manifestListPath)
    assert(ms.size > 1,
      s"a 40k-entry commit must roll at the default target, got ${ms.size}")
    // each rolled manifest lands near the target, never a monolith
    assert(ms.forall(_.length < 12L * 1024 * 1024),
      s"rolled manifest exceeds target: ${ms.map(_.length).max}")
    assert(ms.map(_.addedFilesCount).sum === 40000)
    val tasks = t.newScan().planFiles()
    assert(tasks.size === 40000)
  }

  test("overwrite after merging drops files exactly; conflicts still detected") {
    val cat = tempCatalog()
    val t = cat.createTable(Seq("db"), "ow", schema,
      properties = Map(ManifestMerge.MinCountKey -> "3"))
    (1 to 9).foreach { i =>
      t.newAppend().appendFile(dataFile(s"o$i.parquet", (i * 10L, i * 10L + 4))).commit()
    }
    assert(listLen(t) <= 3)
    val victim = t.newScan().planFiles().map(_.file.path).find(_.endsWith("o5.parquet")).get
    t.newOverwrite().deleteFile(victim)
      .addFile(dataFile("o5b.parquet", (50L, 54L))).commit()
    val paths = t.newScan().planFiles().map(_.file.path.split('/').last).toSet
    assert(!paths.contains("o5.parquet"))
    assert(paths.contains("o5b.parquet"))
    assert(paths.size === 9)
  }
}
