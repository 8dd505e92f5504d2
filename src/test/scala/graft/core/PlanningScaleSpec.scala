package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.expr._
import graft.core.meta._
import graft.core.transform.IdentityT
import graft.core.types._

/** Planning at metadata scale (reference
  * spark/.../PlanningBenchmark.java:103-105 shape): a synthetic 100k-file
  * / 50-partition metadata tree — no data rows exist — must plan inside a
  * wall-time budget, and the three-layer funnel (manifest-list partition
  * summaries → manifest entry partition filter → file column stats) must
  * cut the result to exactly the surviving files. A regression that turns
  * planning O(files) per query instead of O(surviving metadata) shows up
  * here long before it melts a 1000-executor cluster. */
class PlanningScaleSpec extends AnyFunSuite {

  private val Partitions = 50
  private val FilesPerPartition = 2000 // 100k total

  test("plan 100k files / 50 partitions inside the time budget, pruned") {
    val wh = Files.createTempDirectory("graft-planscale").toString
    val cat = new HadoopCatalog(wh)
    val schema = GSchema(GStruct(Seq(
      GField(1, "id", GLong, required = true),
      GField(2, "p", GLong, required = true))))
    val spec = PartitionSpec.of(schema, "p" -> IdentityT)
    val t = cat.createTable(Seq("db"), "big", schema, spec)

    val snapshotId = 1L
    // one manifest per partition: the manifest-list partition summaries
    // are what layer 1 prunes on
    val manifests = (0 until Partitions).map { p =>
      val entries = (0 until FilesPerPartition).map { i =>
        ManifestEntry(ManifestEntryStatus.Added, snapshotId, 1L,
          DataFile(s"${t.location}/data/p=$p/f$i.parquet", "parquet",
            spec.specId, Seq(p.toLong),
            recordCount = 1000, fileSizeBytes = 64L * 1024 * 1024,
            columnStats = Map(1 -> ColStats(Some(1000L), Some(0L), None,
              Some(i * 1000L), Some(i * 1000L + 999L)))))
      }
      ManifestIO.write(s"${t.location}/metadata/manifest-scale-$p.json",
        entries, spec.specId, 0, spec, schema, snapshotId)
    }
    val listPath = t.ops.newManifestListPath(snapshotId)
    ManifestIO.writeList(listPath, manifests)
    val base = t.meta
    val snap = Snapshot(snapshotId, None, sequenceNumber = 1L,
      timestampMs = System.currentTimeMillis(), operation = "append",
      manifestListPath = listPath, schemaId = Some(base.currentSchemaId))
    assert(t.ops.commit(t.ops.currentVersion(), base.copy(
      snapshots = Seq(snap), currentSnapshotId = Some(snapshotId),
      refs = Map("main" -> SnapshotRef(snapshotId, SnapshotRefType.Branch)),
      lastSequenceNumber = 1L)))
    t.refresh()

    // full scan: every file planned, still bounded wall time
    val t0 = System.nanoTime()
    val all = t.newScan().planFiles()
    val fullMs = (System.nanoTime() - t0) / 1e6
    assert(all.size === Partitions * FilesPerPartition)
    assert(fullMs < 30000, s"full 100k-file planning took ${fullMs}ms")

    // partition-pruned: one partition's manifest read, 49 skipped
    val t1 = System.nanoTime()
    val oneP = t.newScan().filter(Expr.equalTo("p", 7L)).planFiles()
    val prunedMs = (System.nanoTime() - t1) / 1e6
    assert(oneP.size === FilesPerPartition)
    assert(prunedMs < 5000, s"partition-pruned planning took ${prunedMs}ms")
    // pruned planning must be far cheaper than the full sweep was —
    // catch a regression that reads every manifest regardless of summary
    assert(prunedMs < math.max(1000.0, fullMs),
      s"pruning gave no planning speedup: full=${fullMs}ms pruned=${prunedMs}ms")

    // stats-pruned inside the partition: column bounds cut 2000 → 1
    val narrow = t.newScan()
      .filter(Expr.and(Expr.equalTo("p", 7L), Expr.ltEq("id", 999L)))
      .planFiles()
    assert(narrow.size === 1)
  }

  test("delete-file index at scale: deletes attach by partition and sequence") {
    // reference DeleteFileIndexBenchmark shape: many partition-scoped
    // delete files must attach to exactly their partition's data files,
    // honoring sequence numbers (pos: seq >= data; eq: seq > data), at
    // bounded planning cost
    val parts = 50
    val dataPer = 400
    val posPer = 20
    val wh = Files.createTempDirectory("graft-delscale").toString
    val cat = new HadoopCatalog(wh)
    val schema = GSchema(GStruct(Seq(
      GField(1, "id", GLong, required = true),
      GField(2, "p", GLong, required = true))))
    val spec = PartitionSpec.of(schema, "p" -> IdentityT)
    val t = cat.createTable(Seq("db"), "bigdel", schema, spec)

    val snapshotId = 1L
    val dataManifests = (0 until parts).map { p =>
      val entries = (0 until dataPer).map { i =>
        ManifestEntry(ManifestEntryStatus.Added, snapshotId, 1L,
          DataFile(s"${t.location}/data/p=$p/f$i.parquet", "parquet",
            spec.specId, Seq(p.toLong), recordCount = 1000,
            fileSizeBytes = 64L * 1024 * 1024))
      }
      ManifestIO.write(s"${t.location}/metadata/manifest-dd-$p.json",
        entries, spec.specId, 0, spec, schema, snapshotId)
    }
    val deleteManifests = (0 until parts).map { p =>
      val pos = (0 until posPer).map { i =>
        ManifestEntry(ManifestEntryStatus.Added, snapshotId, 2L,
          DataFile(s"${t.location}/data/p=$p/pd$i.parquet", "parquet",
            spec.specId, Seq(p.toLong), recordCount = 10,
            fileSizeBytes = 1024, content = FileContent.PositionDeletes))
      }
      // applies: committed after the data (seq 3 > 1)
      val eqLive = ManifestEntry(ManifestEntryStatus.Added, snapshotId, 3L,
        DataFile(s"${t.location}/data/p=$p/eq-live.parquet", "parquet",
          spec.specId, Seq(p.toLong), recordCount = 10, fileSizeBytes = 1024,
          content = FileContent.EqualityDeletes, equalityIds = Seq(1)))
      // must NOT apply: same sequence as the data (eq masks only older)
      val eqStale = ManifestEntry(ManifestEntryStatus.Added, snapshotId, 1L,
        DataFile(s"${t.location}/data/p=$p/eq-stale.parquet", "parquet",
          spec.specId, Seq(p.toLong), recordCount = 10, fileSizeBytes = 1024,
          content = FileContent.EqualityDeletes, equalityIds = Seq(1)))
      ManifestIO.write(s"${t.location}/metadata/manifest-dd-del-$p.json",
        pos :+ eqLive :+ eqStale, spec.specId, 1, spec, schema, snapshotId)
    }
    val listPath = t.ops.newManifestListPath(snapshotId)
    ManifestIO.writeList(listPath, dataManifests ++ deleteManifests)
    val base = t.meta
    val snap = Snapshot(snapshotId, None, sequenceNumber = 3L,
      timestampMs = System.currentTimeMillis(), operation = "append",
      manifestListPath = listPath, schemaId = Some(base.currentSchemaId))
    assert(t.ops.commit(t.ops.currentVersion(), base.copy(
      snapshots = Seq(snap), currentSnapshotId = Some(snapshotId),
      refs = Map("main" -> SnapshotRef(snapshotId, SnapshotRefType.Branch)),
      lastSequenceNumber = 3L)))
    t.refresh()

    val t0 = System.nanoTime()
    val tasks = t.newScan().planFiles()
    val ms = (System.nanoTime() - t0) / 1e6
    assert(tasks.size === parts * dataPer)
    assert(ms < 30000, s"delete-indexed planning took ${ms}ms")

    // every data file carries its partition's 20 pos deletes + 1 live eq
    // delete — never the stale eq, never another partition's deletes
    val byPart = tasks.groupBy(_.file.partition.head.asInstanceOf[Long])
    assert(byPart.size === parts)
    byPart.foreach { case (p, ts) =>
      ts.foreach { task =>
        val pos = task.deletes.filter(_.content == FileContent.PositionDeletes)
        val eq = task.deletes.filter(_.content == FileContent.EqualityDeletes)
        assert(pos.size === posPer, s"p=$p pos=${pos.size}")
        assert(eq.size === 1 && eq.head.path.endsWith("eq-live.parquet"),
          s"p=$p eq=${eq.map(_.path)}")
        assert(task.deletes.forall(_.path.contains(s"/p=$p/")))
      }
    }

    // partition pruning still cuts the delete index work proportionally
    val t1 = System.nanoTime()
    val one = t.newScan().filter(Expr.equalTo("p", 11L)).planFiles()
    val prunedMs = (System.nanoTime() - t1) / 1e6
    assert(one.size === dataPer)
    assert(one.forall(_.deletes.size === posPer + 1))
    assert(prunedMs < 5000, s"pruned delete-indexed planning took ${prunedMs}ms")
  }
}
