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
}
