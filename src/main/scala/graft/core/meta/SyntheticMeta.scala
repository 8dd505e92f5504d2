package graft.core.meta

import graft.core.expr.{ColStats, PartitionSpec}
import graft.core.transform.IdentityT
import graft.core.types._

/** Synthetic metadata-only table builder for planning benchmarks
  * (reference spark-extensions jmh PlanningBenchmark setup, 30
  * partitions x 50k files + per-partition deletes): no data rows exist —
  * only manifests — so planning cost is measured in isolation at scales
  * where a real data build would dwarf the benchmark. */
object SyntheticMeta {

  val Schema: GSchema = GSchema(GStruct(Seq(
    GField(1, "id", GLong, required = true),
    GField(2, "p", GLong, required = true))))

  /** Build one snapshot of `partitions` x `filesPerPartition` data files
    * (one manifest per partition, so manifest-list partition summaries
    * are the first pruning layer), plus `posDeletesPerPartition`
    * partition-scoped position-delete files at a later sequence. Column
    * `id` gets disjoint per-file [lo, hi] bounds for stats pruning. */
  def build(cat: HadoopCatalog, name: String, partitions: Int,
      filesPerPartition: Int, posDeletesPerPartition: Int = 0): GTable = {
    val spec = PartitionSpec.of(Schema, "p" -> IdentityT)
    val t = cat.createTable(Seq("db"), name, Schema, spec)
    val snapshotId = 1L
    val dataManifests = (0 until partitions).map { p =>
      val entries = (0 until filesPerPartition).map { i =>
        ManifestEntry(ManifestEntryStatus.Added, snapshotId, 1L,
          DataFile(s"${t.location}/data/p=$p/f$i.parquet", "parquet",
            spec.specId, Seq(p.toLong),
            recordCount = 1000, fileSizeBytes = 64L * 1024 * 1024,
            columnStats = Map(1 -> ColStats(Some(1000L), Some(0L), None,
              Some(i * 1000L), Some(i * 1000L + 999L)))))
      }
      ManifestIO.write(s"${t.location}/metadata/manifest-syn-$p.json",
        entries, spec.specId, 0, spec, Schema, snapshotId)
    }
    val deleteManifests =
      if (posDeletesPerPartition == 0) Nil
      else (0 until partitions).map { p =>
        val entries = (0 until posDeletesPerPartition).map { i =>
          ManifestEntry(ManifestEntryStatus.Added, snapshotId, 2L,
            DataFile(s"${t.location}/data/p=$p/pd$i.parquet", "parquet",
              spec.specId, Seq(p.toLong), recordCount = 100,
              fileSizeBytes = 64L * 1024,
              content = FileContent.PositionDeletes))
        }
        ManifestIO.write(s"${t.location}/metadata/manifest-syn-del-$p.json",
          entries, spec.specId, 1, spec, Schema, snapshotId)
      }
    val listPath = t.ops.newManifestListPath(snapshotId)
    ManifestIO.writeList(listPath, dataManifests ++ deleteManifests)
    val base = t.meta
    val snap = Snapshot(snapshotId, None,
      sequenceNumber = if (posDeletesPerPartition == 0) 1L else 2L,
      timestampMs = System.currentTimeMillis(), operation = "append",
      manifestListPath = listPath, schemaId = Some(base.currentSchemaId))
    require(t.ops.commit(t.ops.currentVersion(), base.copy(
      snapshots = Seq(snap), currentSnapshotId = Some(snapshotId),
      refs = Map("main" -> SnapshotRef(snapshotId, SnapshotRefType.Branch)),
      lastSequenceNumber = snap.sequenceNumber)))
    t.refresh()
    t
  }
}
