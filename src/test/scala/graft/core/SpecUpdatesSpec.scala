package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.expr.{PartitionField, PartitionSpec}
import graft.core.meta._
import graft.core.transform.{BucketT, IdentityT}
import graft.core.types.{GField, GLong, GSchema, GString, GStruct}

/** The spec REST commit protocol's two halves (reference
  * MetadataUpdateParser / UpdateRequirementParser + CatalogHandlers):
  * deriveCommit turns a base→updated metadata diff into typed
  * requirements + update actions; applyCommit validates and replays
  * them. Round-tripping arbitrary metadata transitions through both
  * must reproduce the updated metadata. */
class SpecUpdatesSpec extends AnyFunSuite {

  private val schema = GSchema(GStruct(Seq(
    GField(1, "id", GLong, required = true),
    GField(2, "v", GString))))

  private def base0: TableMetadata =
    TableMetadata.newTable("/tmp/spec-upd", schema,
      PartitionSpec.Unpartitioned, Map("a" -> "1", "b" -> "2"))

  private def roundTrip(base: Option[TableMetadata], updated: TableMetadata): TableMetadata = {
    val body = SpecUpdates.deriveCommit(base, updated)
    SpecUpdates.applyCommit(base, body, updated.location) match {
      case Right(m)  => m
      case Left(err) => fail(s"requirements failed against own base: $err")
    }
  }

  test("create: derive(None) replays to the full new-table metadata") {
    val m = base0
    val got = roundTrip(None, m)
    assert(got.tableUuid === m.tableUuid)
    assert(got.location === m.location)
    assert(got.schemas === m.schemas)
    assert(got.currentSchemaId === m.currentSchemaId)
    assert(got.specs === m.specs)
    assert(got.defaultSpecId === m.defaultSpecId)
    assert(got.sortOrders === m.sortOrders)
    assert(got.properties === m.properties)
    assert(got.formatVersion === m.formatVersion)
  }

  test("snapshot + ref + property transitions replay exactly") {
    val b = base0
    val s1 = Snapshot(101L, None, 1L, 1000L, "append", "/tmp/spec-upd/ml1.json",
      Map("added-records" -> "5"), schemaId = Some(0))
    val s2 = Snapshot(102L, Some(101L), 2L, 2000L, "overwrite", "/tmp/spec-upd/ml2.json",
      Map.empty, schemaId = Some(0))
    // two commits, like two real DML operations (one set-snapshot-ref
    // per commit — the protocol records one log hop per commit)
    val mid = roundTrip(Some(b), b.withSnapshot(s1))
    assert(mid.currentSnapshotId === Some(101L))
    assert(mid.snapshotLog === Seq((1000L, 101L)))
    val u = mid.withSnapshot(s2)
      .copy(properties = b.properties - "b" + ("c" -> "3"),
        refs = Map(
          "main" -> SnapshotRef(102L, SnapshotRefType.Branch),
          "audit" -> SnapshotRef(101L, SnapshotRefType.Tag,
            maxRefAgeMs = Some(86400000L))))
    val got = roundTrip(Some(mid), u)
    assert(got.snapshots.map(_.snapshotId) === Seq(101L, 102L))
    assert(got.snapshots === u.snapshots)
    assert(got.currentSnapshotId === Some(102L))
    assert(got.refs === u.refs)
    assert(got.snapshotLog === u.snapshotLog)
    assert(got.properties === u.properties)
    assert(got.lastSequenceNumber === 2L)

    // a later expiry-style transition: drop s1, move the tag away
    val u2 = got.copy(
      snapshots = got.snapshots.filterNot(_.snapshotId == 101L),
      snapshotLog = got.snapshotLog.filterNot(_._2 == 101L),
      refs = got.refs - "audit")
    val got2 = roundTrip(Some(got), u2)
    assert(got2.snapshots.map(_.snapshotId) === Seq(102L))
    assert(got2.refs === u2.refs)
    assert(got2.snapshotLog === u2.snapshotLog)
  }

  test("remove-snapshots drops dangling refs and current-snapshot-id") {
    val b = base0
    val s1 = Snapshot(201L, None, 1L, 1000L, "append", "/tmp/spec-upd/mlA.json",
      Map.empty, schemaId = Some(0))
    val m1 = roundTrip(Some(b), b.withSnapshot(s1))
    assert(m1.currentSnapshotId === Some(201L))
    // a raw remove-snapshots update naming the CURRENT snapshot (no
    // client guards it) must not commit a dangling current-snapshot-id
    // — spec-conformant readers reject such a document
    val body = MetaJson.mapper.readTree(
      """{"updates": [{"action": "remove-snapshots", "snapshot-ids": [201]}]}""")
    SpecUpdates.applyCommit(Some(m1), body, m1.location) match {
      case Right(m) =>
        assert(m.snapshots.isEmpty)
        assert(m.currentSnapshotId === None,
          "current-snapshot-id must not dangle after its snapshot is removed")
        assert(m.refs.isEmpty, "refs to removed snapshots must be dropped")
      case Left(err) => fail(err)
    }
  }

  test("schema / spec / sort-order evolution replays with ids preserved") {
    val b = base0
    val schema2 = GSchema(GStruct(schema.struct.fields :+
      GField(3, "w", GLong)), schemaId = 1)
    val spec1 = PartitionSpec(1, Seq(PartitionField(1, 1000, "id_bucket", BucketT(4))))
    val order1 = SortOrder(1, Seq(SortField(1, IdentityT, ascending = false,
      nullsFirst = false)))
    val u = b.copy(
      schemas = b.schemas :+ schema2, currentSchemaId = 1, lastColumnId = 3,
      specs = b.specs :+ spec1, defaultSpecId = 1, lastPartitionId = 1000,
      sortOrders = b.sortOrders :+ order1, defaultSortOrderId = 1)
    val got = roundTrip(Some(b), u)
    assert(got.schemas === u.schemas)
    assert(got.currentSchemaId === 1)
    assert(got.lastColumnId === 3)
    assert(got.specs === u.specs)
    assert(got.defaultSpecId === 1)
    assert(got.lastPartitionId === 1000)
    assert(got.sortOrders === u.sortOrders)
    assert(got.defaultSortOrderId === 1)
  }

  test("statistics transitions replay") {
    val b = base0.withSnapshot(
      Snapshot(7L, None, 1L, 1L, "append", "/tmp/spec-upd/ml.json", Map.empty))
    val sf = StatisticsFile(7L, "/tmp/spec-upd/stats.puffin", 413L, 42L,
      Seq(StatBlobMeta("ndv", 7L, 1L, Seq(1), Map("p" -> "q"))))
    val pf = PartitionStatisticsFile(7L, "/tmp/spec-upd/pstats.parquet", 99L)
    val u = b.copy(statistics = Seq(sf), partitionStatistics = Seq(pf))
    val got = roundTrip(Some(b), u)
    assert(got.statistics === Seq(sf))
    assert(got.partitionStatistics === Seq(pf))
    val u2 = got.copy(statistics = Nil, partitionStatistics = Nil)
    val got2 = roundTrip(Some(got), u2)
    assert(got2.statistics.isEmpty && got2.partitionStatistics.isEmpty)
  }

  test("stale base fails the derived requirements, not silently applies") {
    val b = base0
    val s1 = Snapshot(201L, None, 1L, 1000L, "append", "/x", Map.empty)
    val u = b.withSnapshot(s1)
    val body = SpecUpdates.deriveCommit(Some(b), u)
    // the table moved meanwhile: main now points elsewhere
    val moved = b.withSnapshot(Snapshot(999L, None, 1L, 500L, "append", "/y", Map.empty))
    SpecUpdates.applyCommit(Some(moved), body, b.location) match {
      case Left(err) => assert(err.contains("ref main"))
      case Right(_)  => fail("stale main ref must violate assert-ref-snapshot-id")
    }
  }

  test("duplicate identical add-schema is reused, not duplicated") {
    val b = base0
    val body = MetaJson.mapper.readTree(s"""{
      "updates": [
        {"action": "add-schema", "schema":
          ${MetaJson.mapper.writeValueAsString(IcebergJson.schemaJson(b.schema))}},
        {"action": "set-current-schema", "schema-id": -1}]
    }""")
    val got = SpecUpdates.applyCommit(Some(b), body, b.location)
      .getOrElse(fail("apply failed"))
    assert(got.schemas.size === b.schemas.size, "identical schema must be reused")
    assert(got.currentSchemaId === b.schema.schemaId)
  }

  test("add-schema carries column defaults over the wire") {
    val b = base0
    val evolved = GSchema(GStruct(Seq(
      GField(1, "id", GLong, required = true),
      GField(2, "v", GString),
      GField(3, "region", GString,
        initialDefaultSql = Some("'unknown'"),
        writeDefaultSql = Some("'emea'")))), schemaId = 1)
    val updated = b.copy(schemas = b.schemas :+ evolved,
      currentSchemaId = 1, lastColumnId = 3)
    // the wire JSON itself must carry the defaults (reference
    // SchemaParser writes initial-default/write-default) — a server
    // storing the schema without them makes readers fill NULL where the
    // default was intended
    val body = SpecUpdates.deriveCommit(Some(b), updated)
    val addSchema = {
      val ups = body.get("updates")
      (0 until ups.size()).map(ups.get)
        .find(_.get("action").asText() == "add-schema")
        .getOrElse(fail("no add-schema action derived"))
    }
    val f3 = {
      val fs = addSchema.get("schema").get("fields")
      (0 until fs.size()).map(fs.get).find(_.get("id").asInt() == 3).get
    }
    assert(f3.get("initial-default").asText() === "unknown", f3.toString)
    assert(f3.get("write-default").asText() === "emea", f3.toString)
    // and the replay restores them as graft SQL defaults
    val got = roundTrip(Some(b), updated)
    val gf = got.schemas.find(_.schemaId == 1).get.fields.find(_.id == 3).get
    assert(gf.initialDefaultSql === Some("'unknown'"))
    assert(gf.writeDefaultSql === Some("'emea'"))
  }
}
