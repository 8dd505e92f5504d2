package graft.core.meta

import com.fasterxml.jackson.databind.JsonNode

import graft.core.expr.PartitionSpec

/** Server-side apply of the Iceberg REST commit protocol (reference
  * MetadataUpdateParser.java / UpdateRequirementParser.java, applied the
  * way CatalogHandlers.commit does): a spec commit body carries a list
  * of type-tagged REQUIREMENTS validated against the table's current
  * metadata plus a list of action-tagged UPDATES that transform it into
  * the next metadata. This is what lets a genuine spec REST client
  * (whose engine never ships whole metadata documents) commit against a
  * graft REST server.
  *
  * State the spec threads BETWEEN updates in one request — "-1 means the
  * schema/spec/order added earlier in this same commit" — lives in
  * [[Ctx]].
  */
object SpecUpdates {

  /** per-request apply context: ids assigned by earlier updates that
    * later updates may reference with the -1 sentinel */
  final class Ctx {
    var lastAddedSchemaId: Option[Int] = None
    var lastAddedSpecId: Option[Int] = None
    var lastAddedOrderId: Option[Int] = None
    // snapshot ids ADDED by this same request: a set-snapshot-ref for one
    // of these logs the snapshot's own timestamp; for a pre-existing
    // snapshot (rollback) it logs the time of the change instead
    // (reference TableMetadata.setRef, TableMetadata.java:1341-1344) —
    // logging the original timestamp would make snapshot-log
    // non-monotonic and corrupt TIMESTAMP AS OF
    val addedSnapshots = scala.collection.mutable.Set.empty[Long]
  }

  private def jLong(n: JsonNode, f: String): Option[Long] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asLong())
  private def jInt(n: JsonNode, f: String): Option[Int] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asInt())
  private def jText(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText())
  private def strMap(n: JsonNode): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    n.fields().forEachRemaining(e => b += e.getKey -> e.getValue.asText())
    b.result()
  }

  /** @return None when the requirement holds against `current`, an error
    *         message (→ HTTP 409, CommitFailedException) otherwise.
    *         Unknown requirement types throw (→ HTTP 400). */
  def checkRequirement(current: Option[TableMetadata], n: JsonNode): Option[String] = {
    def m = current.getOrElse(
      throw new IllegalArgumentException("Requirement failed: table does not exist"))
    def expect[A](field: String, want: A, have: A): Option[String] =
      if (want == have) None
      else Some(s"Requirement failed: $field has changed: expected $want, found $have")
    n.get("type").asText() match {
      case "assert-create" =>
        if (current.isDefined) Some("Requirement failed: table already exists")
        else None
      case "assert-table-uuid" =>
        expect("table UUID", n.get("uuid").asText(), m.tableUuid)
      case "assert-ref-snapshot-id" =>
        // null snapshot-id asserts the ref does NOT exist
        val name = n.get("ref").asText()
        expect(s"ref $name", jLong(n, "snapshot-id"), m.ref(name).map(_.snapshotId))
      case "assert-last-assigned-field-id" =>
        expect("last-assigned-field-id",
          n.get("last-assigned-field-id").asInt(), m.lastColumnId)
      case "assert-current-schema-id" =>
        expect("current-schema-id",
          n.get("current-schema-id").asInt(), m.currentSchemaId)
      case "assert-last-assigned-partition-id" =>
        expect("last-assigned-partition-id",
          n.get("last-assigned-partition-id").asInt(), m.lastPartitionId)
      case "assert-default-spec-id" =>
        expect("default-spec-id", n.get("default-spec-id").asInt(), m.defaultSpecId)
      case "assert-default-sort-order-id" =>
        expect("default-sort-order-id",
          n.get("default-sort-order-id").asInt(), m.defaultSortOrderId)
      case other =>
        throw new IllegalArgumentException(s"Invalid requirement type: $other")
    }
  }

  /** Applies one action-tagged update node. Unknown actions throw
    * (→ HTTP 400), matching the reference parser. */
  def applyUpdate(m: TableMetadata, n: JsonNode, ctx: Ctx): TableMetadata = {
    n.get("action").asText() match {
      case "assign-uuid" =>
        m.copy(tableUuid = n.get("uuid").asText())

      case "upgrade-format-version" =>
        val fv = n.get("format-version").asInt()
        if (fv < m.formatVersion) throw new IllegalArgumentException(
          s"Cannot downgrade v${m.formatVersion} table to v$fv")
        if (fv > 4) throw new IllegalArgumentException(
          s"Cannot upgrade table to unsupported format version: v$fv")
        // v2 requires manifest-list: materialize any v1 embedded-manifests
        // snapshots so the upgraded document never persists the v1 form
        val m2 = if (fv >= 2 && m.formatVersion < 2)
          ManifestIO.materializeInline(m, fv) else m
        m2.copy(formatVersion = fv)

      case "add-schema" =>
        val s0 = MetaJson.readSchema(n.get("schema"))
        // an IDENTICAL existing schema is reused (reference builder
        // addSchema dedup); a colliding different one gets the next free
        // id (the client then refers to it with -1)
        m.schemas.find(_.schemaId == s0.schemaId) match {
          case Some(existing) if existing == s0 =>
            ctx.lastAddedSchemaId = Some(s0.schemaId)
            m
          case other =>
            val s = if (other.isDefined)
              s0.copy(schemaId = m.schemas.map(_.schemaId).max + 1)
            else s0
            ctx.lastAddedSchemaId = Some(s.schemaId)
            m.copy(schemas = m.schemas :+ s,
              lastColumnId = math.max(m.lastColumnId,
                math.max(s.highestFieldId, jInt(n, "last-column-id").getOrElse(0))))
        }

      case "set-current-schema" =>
        val id = n.get("schema-id").asInt() match {
          case -1 => ctx.lastAddedSchemaId.getOrElse(throw new IllegalArgumentException(
            "Cannot set last added schema: no schema has been added in this commit"))
          case v => v
        }
        if (!m.schemas.exists(_.schemaId == id))
          throw new IllegalArgumentException(s"Cannot set current schema to unknown schema: $id")
        m.copy(currentSchemaId = id)

      case "add-spec" =>
        val p0 = MetaJson.readSpec(n.get("spec"))
        m.specs.find(_.specId == p0.specId) match {
          case Some(existing) if existing == p0 =>
            ctx.lastAddedSpecId = Some(p0.specId)
            m
          case other =>
            val p = if (other.isDefined)
              p0.copy(specId = m.specs.map(_.specId).max + 1)
            else p0
            ctx.lastAddedSpecId = Some(p.specId)
            m.copy(specs = m.specs :+ p,
              lastPartitionId = math.max(m.lastPartitionId,
                p.fields.map(_.fieldId).maxOption.getOrElse(m.lastPartitionId)))
        }

      case "set-default-spec" =>
        val id = n.get("spec-id").asInt() match {
          case -1 => ctx.lastAddedSpecId.getOrElse(throw new IllegalArgumentException(
            "Cannot set last added spec: no spec has been added in this commit"))
          case v => v
        }
        if (!m.specs.exists(_.specId == id))
          throw new IllegalArgumentException(s"Cannot set default spec to unknown spec: $id")
        m.copy(defaultSpecId = id)

      case "add-sort-order" =>
        val o0 = MetaJson.readSortOrder(n.get("sort-order"))
        m.sortOrders.find(_.orderId == o0.orderId) match {
          case Some(existing) if existing == o0 =>
            ctx.lastAddedOrderId = Some(o0.orderId)
            m
          case other =>
            val o = if (other.isDefined)
              o0.copy(orderId = m.sortOrders.map(_.orderId).max + 1)
            else o0
            ctx.lastAddedOrderId = Some(o.orderId)
            m.copy(sortOrders = m.sortOrders :+ o)
        }

      case "set-default-sort-order" =>
        val id = n.get("sort-order-id").asInt() match {
          case -1 => ctx.lastAddedOrderId.getOrElse(throw new IllegalArgumentException(
            "Cannot set last added sort order: no sort order has been added in this commit"))
          case v => v
        }
        if (!m.sortOrders.exists(_.orderId == id))
          throw new IllegalArgumentException(s"Cannot set default sort order to unknown order: $id")
        m.copy(defaultSortOrderId = id)

      case "add-snapshot" =>
        // staged only: the engine moves a branch with a separate
        // set-snapshot-ref update (reference REST commits always pair
        // them), so add-snapshot itself never publishes
        val s = MetaJson.readSnapshot(n.get("snapshot"))
        if (m.snapshots.exists(_.snapshotId == s.snapshotId))
          throw new IllegalArgumentException(
            s"Cannot add snapshot with existing id: ${s.snapshotId}")
        ctx.addedSnapshots += s.snapshotId
        val staged = m.withStagedSnapshot(s)
        // v3 row lineage: reserve the ids this snapshot assigned
        s.firstRowId match {
          case Some(fr) =>
            val added = s.summary.get("added-records").flatMap(_.toLongOption).getOrElse(0L)
            staged.copy(nextRowId = math.max(staged.nextRowId, fr + added))
          case None => staged
        }

      case "set-snapshot-ref" =>
        val name = n.get("ref-name").asText()
        val sid = n.get("snapshot-id").asLong()
        val sn = m.snapshotById(sid).getOrElse(throw new IllegalArgumentException(
          s"Cannot set $name to unknown snapshot: $sid"))
        val r = SnapshotRef(sid, n.get("type").asText(),
          jInt(n, "min-snapshots-to-keep"), jLong(n, "max-snapshot-age-ms"),
          jLong(n, "max-ref-age-ms"))
        val base = m.copy(refs = m.refs.updated(name, r))
        if (name == "main") {
          // snapshot-log timestamp: the snapshot's own for a snapshot
          // added in THIS request, the change time for a rollback to a
          // pre-existing one (reference TableMetadata.java:1341-1344);
          // max() keeps the log monotonic under clock skew
          val timeOfChange =
            if (ctx.addedSnapshots(sid)) sn.timestampMs
            else math.max(m.lastUpdatedMs, System.currentTimeMillis())
          base.copy(currentSnapshotId = Some(sid),
            lastUpdatedMs = math.max(m.lastUpdatedMs, timeOfChange),
            snapshotLog =
              if (m.currentSnapshotId.contains(sid)) m.snapshotLog
              else m.snapshotLog :+ ((timeOfChange, sid)))
        } else base

      case "remove-snapshots" =>
        val ids = {
          val b = Set.newBuilder[Long]
          n.get("snapshot-ids").elements().forEachRemaining(e => b += e.asLong())
          b.result()
        }
        // refs left pointing at removed snapshots are dropped with them
        // (reference rewriteSnapshotsInternal removes dangling refs, and
        // removing main clears current-snapshot-id) — otherwise the
        // committed document carries a dangling current-snapshot-id that
        // spec-conformant readers reject
        val keptRefs = m.refs.filterNot { case (_, r) => ids(r.snapshotId) }
        m.copy(snapshots = m.snapshots.filterNot(s => ids(s.snapshotId)),
          snapshotLog = m.snapshotLog.filterNot { case (_, id) => ids(id) },
          statistics = m.statistics.filterNot(s => ids(s.snapshotId)),
          partitionStatistics = m.partitionStatistics.filterNot(s => ids(s.snapshotId)),
          refs = keptRefs,
          currentSnapshotId = m.currentSnapshotId.filterNot(ids))

      case "remove-snapshot-ref" =>
        val name = n.get("ref-name").asText()
        val base = m.copy(refs = m.refs - name)
        if (name == "main") base.copy(currentSnapshotId = None) else base

      case "set-location" =>
        m.copy(location = n.get("location").asText())

      case "set-properties" =>
        // spec field is `updates`; `updated` is the legacy spelling the
        // reference still accepts (MetadataUpdateParser.java UPDATED)
        val node = Option(n.get("updates")).getOrElse(n.get("updated"))
        m.copy(properties = m.properties ++ strMap(node))

      case "remove-properties" =>
        val node = Option(n.get("removals")).getOrElse(n.get("removed"))
        val keys = {
          val b = Set.newBuilder[String]
          node.elements().forEachRemaining(e => b += e.asText())
          b.result()
        }
        m.copy(properties = m.properties -- keys)

      case "set-statistics" =>
        val sf = MetaJson.readStatisticsFile(n.get("statistics"))
        m.copy(statistics =
          m.statistics.filterNot(_.snapshotId == sf.snapshotId) :+ sf)

      case "remove-statistics" =>
        val sid = n.get("snapshot-id").asLong()
        m.copy(statistics = m.statistics.filterNot(_.snapshotId == sid))

      case "set-partition-statistics" =>
        val sf = MetaJson.readPartitionStatisticsFile(n.get("partition-statistics"))
        m.copy(partitionStatistics =
          m.partitionStatistics.filterNot(_.snapshotId == sf.snapshotId) :+ sf)

      case "remove-partition-statistics" =>
        val sid = n.get("snapshot-id").asLong()
        m.copy(partitionStatistics =
          m.partitionStatistics.filterNot(_.snapshotId == sid))

      case "remove-schemas" =>
        val ids = {
          val b = Set.newBuilder[Int]
          n.get("schema-ids").elements().forEachRemaining(e => b += e.asInt())
          b.result()
        }
        if (ids(m.currentSchemaId))
          throw new IllegalArgumentException("Cannot remove the current schema")
        m.copy(schemas = m.schemas.filterNot(s => ids(s.schemaId)))

      case "remove-partition-specs" =>
        val ids = {
          val b = Set.newBuilder[Int]
          n.get("spec-ids").elements().forEachRemaining(e => b += e.asInt())
          b.result()
        }
        if (ids(m.defaultSpecId))
          throw new IllegalArgumentException("Cannot remove the default partition spec")
        m.copy(specs = m.specs.filterNot(s => ids(s.specId)))

      case "add-encryption-key" =>
        val e = n.get("encryption-key")
        val kp = Map.newBuilder[String, String]
        Option(e.get("properties")).foreach(_.fields().forEachRemaining(f =>
          kp += f.getKey -> f.getValue.asText()))
        val k = EncryptionKey(e.get("key-id").asText(),
          e.get("encrypted-key-metadata").asText(),
          jText(e, "encrypted-by-id"), kp.result())
        m.copy(encryptionKeys =
          m.encryptionKeys.filterNot(_.keyId == k.keyId) :+ k)

      case "remove-encryption-key" =>
        val kid = n.get("key-id").asText()
        m.copy(encryptionKeys = m.encryptionKeys.filterNot(_.keyId == kid))

      case other =>
        throw new IllegalArgumentException(s"Cannot parse unknown update action: $other")
    }
  }

  /** base metadata for a create-through-commit (assert-create +
    * assign-uuid/add-schema/add-spec/... updates): empty shell the
    * updates fill — specs/orders stay empty so the adds keep their
    * client-assigned ids (manifests reference spec ids by value).
    * Format version starts at 1, the LOWEST: deriveCommit then emits
    * upgrade-format-version for any v2+ create, and a v1 create never
    * derives the downgrade the server must reject. */
  def emptyBase(location: String): TableMetadata =
    TableMetadata(1, java.util.UUID.randomUUID().toString, location,
      0L, System.currentTimeMillis(), 0,
      currentSchemaId = 0, schemas = Nil,
      defaultSpecId = 0, specs = Nil,
      lastPartitionId = 999,
      defaultSortOrderId = 0, sortOrders = Nil,
      properties = Map.empty, currentSnapshotId = None,
      snapshots = Nil, snapshotLog = Nil, refs = Map.empty)

  // ------------------------------------------------------- client side

  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
  import MetaJson.mapper

  /** spec-dialect snapshot JSON (SnapshotParser.toJson: operation nested
    * in summary) — the ONE builder for this shape; the REST commit wire
    * and the metadata-document writer (MetaJson.writeMetadataSpec) both
    * use it, so the two can never diverge. v1 documents omit
    * sequence-number (the spec introduces it in v2); the wire always
    * sends it. */
  def snapshotJson(s: Snapshot, formatVersion: Int = 2): ObjectNode = {
    val so = mapper.createObjectNode()
    so.put("snapshot-id", s.snapshotId)
    s.parentId.foreach(so.put("parent-snapshot-id", _))
    if (formatVersion >= 2) so.put("sequence-number", s.sequenceNumber)
    so.put("timestamp-ms", s.timestampMs)
    // v1 embedded-manifests snapshots re-serialize as `manifests` (the
    // spec's own v1 form); the inline: sentinel must never persist
    ManifestIO.inlinePaths(s.manifestListPath) match {
      case Some(paths) =>
        val arr = so.putArray("manifests"); paths.foreach(arr.add)
      case None => so.put("manifest-list", s.manifestListPath)
    }
    val sum = so.putObject("summary")
    sum.put("operation", s.operation)
    (s.summary - "operation").foreach { case (k, v) => sum.put(k, v) }
    s.schemaId.foreach(so.put("schema-id", _))
    s.firstRowId.foreach(so.put("first-row-id", _))
    s.keyId.foreach(so.put("key-id", _))
    s.keyMetadata.foreach(so.put("manifest-list-key-metadata", _))
    so
  }

  def specJson(p: PartitionSpec): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("spec-id", p.specId)
    o.set[JsonNode]("fields", IcebergJson.specFieldsJson(p))
    o
  }

  def sortOrderJson(so: SortOrder): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("order-id", so.orderId)
    val fs = o.putArray("fields")
    so.fields.foreach { f =>
      fs.addObject().put("transform", f.transform.name)
        .put("source-id", f.sourceId)
        .put("direction", if (f.ascending) "asc" else "desc")
        .put("null-order", if (f.nullsFirst) "nulls-first" else "nulls-last")
    }
    o
  }

  /** one shape with the metadata-document writer (MetaJson) */
  def statisticsJson(sf: StatisticsFile): ObjectNode = {
    val o = mapper.createObjectNode()
    MetaJson.statisticsJson(o, sf, identity)
    o
  }

  /** Derives a spec CommitTableRequest body — typed requirements plus
    * the update actions that turn `base` into `updated` — the way the
    * reference engine accumulates MetadataUpdates + UpdateRequirements.
    * This is what lets graft's REST CLIENT commit against any
    * spec-conformant REST catalog server. */
  def deriveCommit(base: Option[TableMetadata], updated: TableMetadata): ObjectNode = {
    val body = mapper.createObjectNode()
    val reqs = body.putArray("requirements")
    val ups = body.putArray("updates")
    def action(name: String): ObjectNode = ups.addObject().put("action", name)

    val b = base.getOrElse(emptyBase(updated.location))
    base match {
      case None =>
        reqs.addObject().put("type", "assert-create")
        action("assign-uuid").put("uuid", updated.tableUuid)
        action("set-location").put("location", updated.location)
      case Some(bm) =>
        reqs.addObject().put("type", "assert-table-uuid").put("uuid", bm.tableUuid)
        if (updated.tableUuid != bm.tableUuid)
          action("assign-uuid").put("uuid", updated.tableUuid)
        if (updated.location != bm.location)
          action("set-location").put("location", updated.location)
    }
    if (updated.formatVersion != b.formatVersion)
      action("upgrade-format-version").put("format-version", updated.formatVersion)

    // schemas: adds carry their client-assigned ids (base state matches
    // the server's, so the ids are free there too — see the idempotent
    // reuse in applyUpdate); removals batch into remove-schemas
    val baseSchemaIds = b.schemas.map(_.schemaId).toSet
    updated.schemas.filterNot(s => b.schemas.contains(s)).foreach { s =>
      if (base.isDefined) {
        reqs.addObject().put("type", "assert-last-assigned-field-id")
          .put("last-assigned-field-id", b.lastColumnId)
      }
      val a = action("add-schema")
      // schemaSpecJson, not the bare IcebergJson form: the wire schema
      // must carry initial-default/write-default (failing loudly on an
      // unrepresentable default) or the server stores the schema without
      // defaults and readers fill NULL where the default was intended
      a.set[JsonNode]("schema", MetaJson.schemaSpecJson(s))
      a.put("last-column-id", updated.lastColumnId)
    }
    val goneSchemas = baseSchemaIds -- updated.schemas.map(_.schemaId).toSet
    if (goneSchemas.nonEmpty) {
      val a = action("remove-schemas")
      val arr = a.putArray("schema-ids"); goneSchemas.toSeq.sorted.foreach(arr.add)
    }
    if (updated.currentSchemaId != b.currentSchemaId || base.isEmpty) {
      if (base.isDefined)
        reqs.addObject().put("type", "assert-current-schema-id")
          .put("current-schema-id", b.currentSchemaId)
      action("set-current-schema").put("schema-id", updated.currentSchemaId)
    }

    val baseSpecIds = b.specs.map(_.specId).toSet
    updated.specs.filterNot(p => b.specs.contains(p)).foreach { p =>
      if (base.isDefined)
        reqs.addObject().put("type", "assert-last-assigned-partition-id")
          .put("last-assigned-partition-id", b.lastPartitionId)
      action("add-spec").set[JsonNode]("spec", specJson(p))
    }
    val goneSpecs = baseSpecIds -- updated.specs.map(_.specId).toSet
    if (goneSpecs.nonEmpty) {
      val a = action("remove-partition-specs")
      val arr = a.putArray("spec-ids"); goneSpecs.toSeq.sorted.foreach(arr.add)
    }
    if (updated.defaultSpecId != b.defaultSpecId || base.isEmpty) {
      if (base.isDefined)
        reqs.addObject().put("type", "assert-default-spec-id")
          .put("default-spec-id", b.defaultSpecId)
      action("set-default-spec").put("spec-id", updated.defaultSpecId)
    }

    updated.sortOrders.filterNot(o => b.sortOrders.contains(o)).foreach(o =>
      action("add-sort-order").set[JsonNode]("sort-order", sortOrderJson(o)))
    if (updated.defaultSortOrderId != b.defaultSortOrderId || base.isEmpty) {
      if (base.isDefined)
        reqs.addObject().put("type", "assert-default-sort-order-id")
          .put("default-sort-order-id", b.defaultSortOrderId)
      action("set-default-sort-order").put("sort-order-id", updated.defaultSortOrderId)
    }

    // snapshots: adds in sequence order, removals in one batch
    val baseSnapIds = b.snapshots.map(_.snapshotId).toSet
    updated.snapshots.filterNot(s => baseSnapIds(s.snapshotId))
      .sortBy(_.sequenceNumber)
      .foreach(s => action("add-snapshot").set[JsonNode]("snapshot", snapshotJson(s)))
    val goneSnaps = baseSnapIds -- updated.snapshots.map(_.snapshotId).toSet
    if (goneSnaps.nonEmpty) {
      val a = action("remove-snapshots")
      val arr = a.putArray("snapshot-ids"); goneSnaps.toSeq.sorted.foreach(arr.add)
    }

    // refs: every changed ref is asserted at its base value (null = must
    // not exist) — the reference's UpdateRequirements does exactly this
    // per-branch optimistic check. `main` is materialized from
    // currentSnapshotId on both sides via TableMetadata.ref.
    val refNames = (b.refs.keySet ++ updated.refs.keySet + "main").toSeq.sorted
    refNames.foreach { name =>
      val bv = b.ref(name)
      val uv = updated.ref(name)
      if (bv != uv) {
        val r = reqs.addObject().put("type", "assert-ref-snapshot-id").put("ref", name)
        bv.map(_.snapshotId) match {
          case Some(id) => r.put("snapshot-id", id)
          case None     => r.putNull("snapshot-id")
        }
        uv match {
          case Some(ref) =>
            val a = action("set-snapshot-ref")
            a.put("ref-name", name).put("snapshot-id", ref.snapshotId)
              .put("type", ref.refType)
            ref.minSnapshotsToKeep.foreach(a.put("min-snapshots-to-keep", _))
            ref.maxSnapshotAgeMs.foreach(a.put("max-snapshot-age-ms", _))
            ref.maxRefAgeMs.foreach(a.put("max-ref-age-ms", _))
          case None =>
            action("remove-snapshot-ref").put("ref-name", name)
        }
      }
    }

    // properties
    val setProps = updated.properties.filter { case (k, v) =>
      !b.properties.get(k).contains(v) }
    if (setProps.nonEmpty) {
      val o = action("set-properties").putObject("updates")
      setProps.foreach { case (k, v) => o.put(k, v) }
    }
    val goneProps = b.properties.keySet -- updated.properties.keySet
    if (goneProps.nonEmpty) {
      val a = action("remove-properties")
      val arr = a.putArray("removals"); goneProps.toSeq.sorted.foreach(arr.add)
    }

    // statistics (keyed by snapshot-id on both sides)
    def statDiff[A](bs: Seq[A], us: Seq[A], key: A => Long,
        set: A => Unit, remove: Long => Unit): Unit = {
      us.filterNot(bs.contains).foreach(set)
      (bs.map(key).toSet -- us.map(key).toSet).toSeq.sorted.foreach(remove)
    }
    statDiff[StatisticsFile](b.statistics, updated.statistics, _.snapshotId,
      sf => action("set-statistics").set[JsonNode]("statistics", statisticsJson(sf)),
      sid => action("remove-statistics").put("snapshot-id", sid))
    statDiff[PartitionStatisticsFile](
      b.partitionStatistics, updated.partitionStatistics, _.snapshotId,
      sf => {
        val o = action("set-partition-statistics").putObject("partition-statistics")
        o.put("snapshot-id", sf.snapshotId).put("statistics-path", sf.path)
          .put("file-size-in-bytes", sf.fileSizeBytes)
      },
      sid => action("remove-partition-statistics").put("snapshot-id", sid))

    // encryption keys
    updated.encryptionKeys.filterNot(b.encryptionKeys.contains).foreach { k =>
      val e = action("add-encryption-key").putObject("encryption-key")
      e.put("key-id", k.keyId)
        .put("encrypted-key-metadata", k.encryptedKeyMetadata)
      k.encryptedById.foreach(e.put("encrypted-by-id", _))
      if (k.properties.nonEmpty) {
        val p = e.putObject("properties")
        k.properties.foreach { case (kk, vv) => p.put(kk, vv) }
      }
    }
    (b.encryptionKeys.map(_.keyId).toSet --
      updated.encryptionKeys.map(_.keyId).toSet).toSeq.sorted.foreach(kid =>
      action("remove-encryption-key").put("key-id", kid))

    body
  }

  /** Applies a whole spec commit: requirements first (Left(error) on the
    * first violated one), then updates in order. */
  def applyCommit(current: Option[TableMetadata], body: JsonNode,
      location: String): Either[String, TableMetadata] = {
    val reqErr = Option(body.get("requirements")).flatMap { arr =>
      var err: Option[String] = None
      arr.elements().forEachRemaining(r =>
        if (err.isEmpty) err = checkRequirement(current, r))
      err
    }
    reqErr match {
      case Some(e) => Left(e)
      case None =>
        val ctx = new Ctx
        var m = current.getOrElse(emptyBase(location))
        Option(body.get("updates")).foreach(_.elements()
          .forEachRemaining(u => m = applyUpdate(m, u, ctx)))
        Right(m.copy(lastUpdatedMs =
          math.max(m.lastUpdatedMs, System.currentTimeMillis())))
    }
  }
}

/** Spec view commit protocol (reference open-api CommitViewRequest /
  * ViewUpdate; core/.../view/ViewMetadata + CatalogHandlers view
  * handlers): requirements (assert-view-uuid) validated against the
  * stored view-metadata document, then action-tagged updates applied
  * DIRECTLY over the JSON tree — graft's stored view documents ARE
  * spec view metadata, so no model round-trip is needed. */
object SpecViewUpdates {
  import com.fasterxml.jackson.databind.JsonNode
  import com.fasterxml.jackson.databind.node.ObjectNode
  import MetaJson.mapper

  /** full view metadata from the spec's CreateViewRequest (name,
    * location, schema, view-version, properties) */
  def fromCreateRequest(body: JsonNode, location: String): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("view-uuid", java.util.UUID.randomUUID().toString)
      .put("format-version", 1)
      .put("location", location)
    Option(body.get("name")).foreach(n => o.put("name", n.asText()))
    Option(body.get("properties")).filterNot(_.isNull)
      .foreach(p => o.set[JsonNode]("properties", p.deepCopy[JsonNode]()))
    val schema = Option(body.get("schema")).filterNot(_.isNull).getOrElse(
      throw new IllegalArgumentException("createView requires schema"))
    val schemaId =
      Option(schema.get("schema-id")).map(_.asInt()).filter(_ >= 0).getOrElse(0)
    val schemas = o.putArray("schemas")
    val sc = schema.deepCopy[JsonNode]().asInstanceOf[ObjectNode]
    sc.put("schema-id", schemaId)
    schemas.add(sc)
    val ver = Option(body.get("view-version")).filterNot(_.isNull).getOrElse(
      throw new IllegalArgumentException("createView requires view-version"))
    val vv = ver.deepCopy[JsonNode]().asInstanceOf[ObjectNode]
    if (!vv.hasNonNull("version-id")) vv.put("version-id", 1)
    if (!vv.hasNonNull("timestamp-ms"))
      vv.put("timestamp-ms", System.currentTimeMillis())
    vv.put("schema-id", schemaId) // the request's single schema
    o.put("current-version-id", vv.get("version-id").asInt())
    o.putArray("versions").add(vv)
    o.putArray("version-log").addObject()
      .put("timestamp-ms", vv.get("timestamp-ms").asLong())
      .put("version-id", vv.get("version-id").asInt())
    o
  }

  /** @return Left(error) on a violated requirement / malformed update */
  def applyCommit(current: ObjectNode, body: JsonNode): Either[String, ObjectNode] = {
    // requirements: the spec defines assert-view-uuid only
    var reqErr: Option[String] = None
    Option(body.get("requirements")).foreach(_.elements().forEachRemaining { r =>
      if (reqErr.isEmpty) r.get("type").asText() match {
        case "assert-view-uuid" =>
          val want = r.get("uuid").asText()
          val have = Option(current.get("view-uuid")).map(_.asText()).getOrElse("")
          if (want != have)
            reqErr = Some(s"requirement failed: view uuid is $have, not $want")
        case other => reqErr = Some(s"unknown view requirement: $other")
      }
    })
    if (reqErr.isDefined) return Left(reqErr.get)
    val m = current.deepCopy[JsonNode]().asInstanceOf[ObjectNode]
    var lastAdded: Option[Int] = None
    var err: Option[String] = None
    def versionsArr = m.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("versions")
    def maxVersionId: Int = {
      var mx = 0
      versionsArr.elements().forEachRemaining(v =>
        mx = math.max(mx, v.get("version-id").asInt()))
      mx
    }
    Option(body.get("updates")).foreach(_.elements().forEachRemaining { u =>
      if (err.isEmpty) u.get("action").asText() match {
        case "assign-uuid" =>
          val want = u.get("uuid").asText()
          val have = Option(m.get("view-uuid")).map(_.asText())
          if (have.exists(_ != want))
            err = Some(s"cannot reassign view uuid ${have.get} to $want")
          else m.put("view-uuid", want)
        case "upgrade-format-version" =>
          m.put("format-version", u.get("format-version").asInt())
        case "set-location" => m.put("location", u.get("location").asText())
        case "set-properties" =>
          val p = Option(m.get("properties")).filterNot(_.isNull)
            .map(_.asInstanceOf[ObjectNode]).getOrElse(m.putObject("properties"))
          u.get("updates").properties().forEach(e =>
            p.set[JsonNode](e.getKey, e.getValue.deepCopy[JsonNode]()))
        case "remove-properties" =>
          Option(m.get("properties")).filterNot(_.isNull)
            .map(_.asInstanceOf[ObjectNode]).foreach { p =>
              u.get("removals").elements().forEachRemaining(r => p.remove(r.asText()))
            }
        case "add-schema" =>
          val sc = u.get("schema").deepCopy[JsonNode]().asInstanceOf[ObjectNode]
          val schemas = m.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("schemas")
          // -1 or colliding ids get the next fresh id (reference
          // ViewMetadata.Builder reassigns)
          var mx = -1
          schemas.elements().forEachRemaining(s =>
            mx = math.max(mx, s.get("schema-id").asInt()))
          val want = Option(sc.get("schema-id")).map(_.asInt()).getOrElse(-1)
          if (want < 0 || want <= mx) sc.put("schema-id", mx + 1)
          schemas.add(sc)
        case "add-view-version" =>
          val vv = u.get("view-version").deepCopy[JsonNode]().asInstanceOf[ObjectNode]
          val next = maxVersionId + 1
          if (!vv.hasNonNull("version-id") || vv.get("version-id").asInt() <= maxVersionId)
            vv.put("version-id", next)
          if (!vv.hasNonNull("timestamp-ms"))
            vv.put("timestamp-ms", System.currentTimeMillis())
          versionsArr.add(vv)
          lastAdded = Some(vv.get("version-id").asInt())
        case "set-current-view-version" =>
          val raw = u.get("view-version-id").asInt()
          val target =
            if (raw == -1) lastAdded.getOrElse {
              err = Some("set-current-view-version -1 without add-view-version")
              -1
            } else raw
          if (err.isEmpty) {
            var found = false
            versionsArr.elements().forEachRemaining(v =>
              if (v.get("version-id").asInt() == target) found = true)
            if (!found) err = Some(s"unknown view version: $target")
            else {
              m.put("current-version-id", target)
              m.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("version-log")
                .addObject()
                .put("timestamp-ms", System.currentTimeMillis())
                .put("version-id", target)
            }
          }
        case other => err = Some(s"unknown view update action: $other")
      }
    })
    err.toLeft(m)
  }
}
