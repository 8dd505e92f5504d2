package graft.spark

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.expr._
import graft.core.meta._
import graft.core.types._

/** rewrite_manifests vs concurrent commits — pins the merge-per-attempt
  * semantics of [[GraftProcedures.rewriteManifestsProducer]]: a manifest
  * added after planning is carried over untouched, and a rewrite whose
  * source manifests were replaced concurrently fails instead of
  * resurrecting their entries. Core-level (no SparkSession): the commit
  * path under test is engine-side. */
class RewriteConcurrencySpec extends AnyFunSuite {

  private val schema = GSchema(GStruct(Seq(
    GField(1, "id", GLong, required = true),
    GField(2, "data", GString))))

  private def dataFile(path: String, ids: (Long, Long)): DataFile =
    DataFile(path, "parquet", 0, Nil, recordCount = ids._2 - ids._1 + 1,
      fileSizeBytes = 1000,
      columnStats = Map(1 -> ColStats(Some(ids._2 - ids._1 + 1), Some(0L), None,
        Some(ids._1), Some(ids._2))))

  private def compact(t: GTable): Seq[ManifestFile] = {
    val sources = ManifestIO
      .readList(t.meta.currentSnapshot.get.manifestListPath)
    val entries = sources.flatMap(mf => ManifestIO.readEntries(mf)
      .filter(_.isLive).map(_.copy(status = ManifestEntryStatus.Existing)))
    val path = s"${t.location}/metadata/manifest-compact-${java.util.UUID.randomUUID}.json"
    Seq(ManifestIO.write(path, entries, 0, 0, t.meta.spec, t.meta.schema,
      snapshotId = 0L))
  }

  test("a concurrent append between planning and commit is carried over") {
    val cat = new HadoopCatalog(Files.createTempDirectory("graft-rwm").toString)
    val t = cat.createTable(Seq("db"), "rwm", schema)
    t.newAppend().appendFile(dataFile("f1.parquet", (1L, 10L))).commit()
    t.newAppend().appendFile(dataFile("f2.parquet", (11L, 20L))).commit()
    val sources = ManifestIO.readList(t.meta.currentSnapshot.get.manifestListPath)
    assert(sources.size === 2)
    val written = compact(t)
    // concurrent append lands AFTER the rewrite planned its output
    cat.loadTable(Seq("db"), "rwm").get
      .newAppend().appendFile(dataFile("f3.parquet", (21L, 30L))).commit()
    GraftProcedures.rewriteManifestsProducer(t, sources, written).commit()
    // all three files survive: the compacted pair plus the concurrent one
    assert(t.newScan().planFiles().map(_.file.path).toSet ===
      Set("f1.parquet", "f2.parquet", "f3.parquet")
        .map(p => s"${t.location}/$p"))
    val finalMs = ManifestIO.readList(t.meta.currentSnapshot.get.manifestListPath)
    assert(finalMs.map(_.path).toSet.intersect(sources.map(_.path).toSet).isEmpty,
      "source manifests must be replaced")
  }

  test("a rewrite whose source manifests were replaced concurrently fails") {
    val cat = new HadoopCatalog(Files.createTempDirectory("graft-rwm2").toString)
    val t = cat.createTable(Seq("db"), "rwm2", schema)
    t.newAppend().appendFile(dataFile("f1.parquet", (1L, 10L))).commit()
    t.newAppend().appendFile(dataFile("f2.parquet", (11L, 20L))).commit()
    val sources = ManifestIO.readList(t.meta.currentSnapshot.get.manifestListPath)
    val written = compact(t)
    // a concurrent rewrite replaces the sources first
    val t2 = cat.loadTable(Seq("db"), "rwm2").get
    GraftProcedures.rewriteManifestsProducer(t2,
      ManifestIO.readList(t2.meta.currentSnapshot.get.manifestListPath),
      compact(t2)).commit()
    // the stale rewrite must fail, not resurrect the replaced entries
    intercept[CommitConflictException] {
      GraftProcedures.rewriteManifestsProducer(t, sources, written).commit()
    }
    assert(t.newScan().planFiles().map(_.file.path).toSet ===
      Set(s"${t.location}/f1.parquet", s"${t.location}/f2.parquet"))
  }
}
