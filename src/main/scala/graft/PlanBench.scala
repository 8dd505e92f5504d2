package graft

import java.nio.file.Files

import graft.core.expr.Expr
import graft.core.meta._

/** Planning-at-scale benchmark (reference spark-extensions jmh
  * PlanningBenchmark: 30 partitions x 50k files + per-partition
  * deletes). Metadata-only — no data rows — so it isolates the cost the
  * driver pays before the first task runs, the number that decides
  * whether a 1000-executor job spends its first minutes planning.
  *
  * Measures, and prints as ONE JSON line (also written to
  * PLANBENCH.json):
  *   - full_plan_sec: plan all 1.5M files (every manifest read)
  *   - pruned_plan_sec: one-partition filter — manifest-list partition
  *     summaries must skip 29/30 manifests, so this must be roughly
  *     full/30, i.e. sub-linear in the pruned-away metadata
  *   - stats_plan_sec: partition + id-bounds filter (3-layer funnel
  *     down to ONE file); every plan also attaches the 1500
  *     partition-scoped position deletes through the DeleteFileIndex
  *   - server_plan_sec / server_chunks: the same pruned plan fetched
  *     through REST server-side planning, chunked — a thin client
  *     never holding the full task list as one string
  */
object PlanBench {
  private val Partitions = 30
  private val FilesPerPartition = 50000
  private val DeletesPerPartition = 50

  def main(args: Array[String]): Unit = {
    val wh = Files.createTempDirectory("graft-planbench").toString
    val cat = new HadoopCatalog(wh)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // co-tenant noise hit two committed BENCH artifacts before per-query
    // controls landed; planning gets the same medicine — each metric is
    // the MIN of 3 samples (planning is deterministic CPU+IO, so the min
    // is the machine-capability number, and a burst hitting one sample
    // cannot masquerade as a regression)
    def best[A](f: => A): (A, Double) = {
      val runs = (1 to 3).map(_ => time(f))
      (runs.head._1, runs.map(_._2).min)
    }

    val (t, buildSec) = time(SyntheticMeta.build(cat, "planbench",
      Partitions, FilesPerPartition, DeletesPerPartition))

    // warm-up: JIT + page cache for the JSON manifest parse paths
    t.newScan().filter(Expr.equalTo("p", 1L)).planFiles()

    val (full, fullSec) = best(t.newScan().planFiles())
    require(full.size == Partitions * FilesPerPartition,
      s"full plan found ${full.size} files")

    val (pruned, prunedSec) = best(
      t.newScan().filter(Expr.equalTo("p", 7L)).planFiles())
    require(pruned.size == FilesPerPartition,
      s"pruned plan found ${pruned.size} files")
    require(pruned.forall(_.deletes.size == DeletesPerPartition),
      "pruned tasks must carry their partition's deletes")

    val (narrow, narrowSec) = best(t.newScan()
      .filter(Expr.and(Expr.equalTo("p", 7L), Expr.ltEq("id", 999L)))
      .planFiles())
    require(narrow.size == 1, s"stats pruning kept ${narrow.size} files")

    // sub-linear check: pruning 29/30 of the metadata must cut planning
    // by at least 5x (it reads 1 manifest instead of 30 + the delete
    // index of one partition)
    val subLinear = prunedSec < fullSec / 5.0

    // the partitions metadata table folds ALL 1.5M data entries + 1.5k
    // delete entries into 30 rows with per-kind delete debt — a
    // distributed reduceByKey over per-manifest partials; the driver
    // only ever collects O(partitions)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("graft-planbench")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    val (prows, partitionsSec) = try {
      val r = best(graft.spark.GraftMetadataTables.rowsOf("partitions", t, t.meta))
      require(r._1.length == Partitions,
        s"partitions table produced ${r._1.length} rows")
      r
    } finally spark.stop()

    // metadata-table pushdown at the same scale (r17 top item): a
    // partition-filtered t.files scan must plan ONE manifest task, not
    // one per partition — O(matching manifests), not O(table metadata)
    val uparts = graft.spark.GraftMetadataTables.unifiedPartitionFields(t.meta)
    val pctx = graft.spark.GraftMetadataTables.pruneCtx(uparts, "files")
    val mdPrune = Expr.bind(pctx.schema, Expr.equalTo("partition.p", 7L))
    val (mdFull, mdFullSec) = best(new graft.spark.ManifestEntriesScan(
      t, "files", t.meta).planInputPartitions())
    val (mdPruned, mdPrunedSec) = best(new graft.spark.ManifestEntriesScan(
      t, "files", t.meta, None, mdPrune, Some(pctx)).planInputPartitions())
    // one data + one delete manifest per partition
    require(mdFull.length == 2 * Partitions,
      s"metadata full scan planned ${mdFull.length} tasks")
    require(mdPruned.length == 2,
      s"metadata pruned scan planned ${mdPruned.length} tasks")

    // server-side planning of the pruned query: 50k surviving tasks
    // chunk into plan-tasks (page 5000 -> ~10 chunks); the client
    // fetches them concurrently, never one giant response
    // streaming-commit shape: N tiny single-file commits, with
    // commit-time manifest merging (default min-count 100) vs disabled.
    // Manifest count is the planning denominator — the merged table
    // must plan the SAME rows from ~N/min-count manifests instead of N.
    // This is the 1,440-manifests/day cliff a 1-minute-trigger
    // streaming sink hits within hours.
    val StreamCommits = 400
    def streamTable(name: String, props: Map[String, String]): GTable = {
      val schema2 = graft.core.types.GSchema(graft.core.types.GStruct(Seq(
        graft.core.types.GField(1, "id", graft.core.types.GLong,
          required = true))))
      val st = cat.createTable(Seq("db"), name, schema2, properties = props)
      (1 to StreamCommits).foreach { i =>
        st.newAppend().appendFile(graft.core.meta.DataFile(
          f"s$i%04d.parquet", "parquet", 0, Nil, 10L, 1000L,
          columnStats = Map(1 -> graft.core.expr.ColStats(
            Some(10L), Some(0L), None, Some(i * 10L), Some(i * 10L + 9)))))
          .commit()
      }
      st
    }
    val tMerged = streamTable("stream_merged", Map.empty)
    val tUnmerged = streamTable("stream_unmerged",
      Map(ManifestMerge.MergeEnabledKey -> "false"))
    def listLen(t0: GTable): Int =
      ManifestIO.readList(t0.meta.currentSnapshot.get.manifestListPath).size
    val mergedManifests = listLen(tMerged)
    val unmergedManifests = listLen(tUnmerged)
    require(unmergedManifests == StreamCommits &&
      mergedManifests <= 110, // ~min-count + growth since the last merge
      s"unexpected shapes: $mergedManifests vs $unmergedManifests")
    val (mPlan, mergedPlanSec) = best(tMerged.newScan().planFiles())
    val (uPlan, unmergedPlanSec) = best(tUnmerged.newScan().planFiles())
    require(mPlan.size == StreamCommits && uPlan.size == StreamCommits)

    val (srv, uri) = RestCatalogServer.start(wh, planPageSize = 5000)
    val (serverTasks, serverSec) = try {
      val rc = RestCatalog.connect(uri)
      val ops = rc.tableOps(Seq("db"), "planbench")
        .asInstanceOf[RestTableOps]
      val meta = t.meta
      best(ops.planScan(meta.currentSnapshot.map(_.snapshotId),
        Expr.equalTo("p", 7L), meta))
    } finally srv.stop(0)
    require(serverTasks.size == FilesPerPartition,
      s"server plan found ${serverTasks.size} tasks")
    val serverChunks =
      math.ceil(FilesPerPartition / 5000.0).toInt // page size above

    val json =
      s"""{"metric":"planning","partitions":$Partitions,""" +
      s""""files_per_partition":$FilesPerPartition,""" +
      s""""delete_files_per_partition":$DeletesPerPartition,""" +
      s""""build_sec":${f"$buildSec%.3f"},""" +
      s""""full_plan_sec":${f"$fullSec%.3f"},""" +
      s""""pruned_plan_sec":${f"$prunedSec%.3f"},""" +
      s""""stats_plan_sec":${f"$narrowSec%.3f"},""" +
      s""""pruned_vs_full_ratio":${f"${prunedSec / fullSec}%.4f"},""" +
      s""""sub_linear_ok":$subLinear,""" +
      s""""partitions_table_sec":${f"$partitionsSec%.3f"},""" +
      s""""metadata_files_tasks_full":${mdFull.length},""" +
      s""""metadata_files_tasks_pruned":${mdPruned.length},""" +
      s""""metadata_full_plan_sec":${f"$mdFullSec%.4f"},""" +
      s""""metadata_pruned_plan_sec":${f"$mdPrunedSec%.4f"},""" +
      s""""server_plan_sec":${f"$serverSec%.3f"},""" +
      s""""server_chunks":$serverChunks,""" +
      s""""streaming_commits":$StreamCommits,""" +
      s""""merged_manifests":$mergedManifests,""" +
      s""""unmerged_manifests":$unmergedManifests,""" +
      s""""merged_plan_sec":${f"$mergedPlanSec%.4f"},""" +
      s""""unmerged_plan_sec":${f"$unmergedPlanSec%.4f"},""" +
      s""""reference_shape":"PlanningBenchmark.java 30x50k+50del"}"""
    println(json)
    GraftIO.writeString(
      new java.io.File("PLANBENCH.json").getAbsolutePath, json)
  }
}
