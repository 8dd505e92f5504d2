package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.expr._
import graft.core.meta._
import graft.core.types._

/** Wire codecs for REST server-side scan planning: spec single-value
  * JSON (offsets honored, not assumed UTC), expression round-trips that
  * BIND after the trip, internal-format mapping into the spec enum, and
  * ContentFile/FileScanTask round-trips. */
class ScanPlanningSpec extends AnyFunSuite {

  private val schema = GSchema(GStruct(Seq(
    GField(1, "id", GLong, required = true),
    GField(2, "ts", GTimestamp()),
    GField(3, "price", GDecimal(18, 2)),
    GField(4, "raw", GBinary),
    GField(5, "day", GDate))))

  private def meta = TableMetadata.newTable("/tmp/sps", schema,
    PartitionSpec.Unpartitioned, Map.empty)

  test("single-value JSON honors explicit zone offsets") {
    // 2024-01-01T00:00:00-05:00 == 05:00 UTC
    val micros = SpecValueJson.fromJson(GTimestamp(),
      MetaJson.mapper.getNodeFactory.textNode("2024-01-01T00:00:00-05:00"))
      .asInstanceOf[Long]
    val utc = SpecValueJson.fromJson(GTimestamp(),
      MetaJson.mapper.getNodeFactory.textNode("2024-01-01T05:00:00+00:00"))
      .asInstanceOf[Long]
    val bare = SpecValueJson.fromJson(GTimestamp(),
      MetaJson.mapper.getNodeFactory.textNode("2024-01-01T05:00:00"))
      .asInstanceOf[Long]
    assert(micros === utc && utc === bare,
      "a -05:00 offset must shift the instant, a bare datetime reads UTC")
    // write → read round-trip is identity
    assert(SpecValueJson.fromJson(GTimestamp(),
      SpecValueJson.toJson(GTimestamp(), micros)) === micros)
  }

  test("spec string literals BIND against typed columns") {
    // what a genuine client sends: ISO timestamp, plain-text decimal,
    // uppercase-hex binary, ISO date — all as JSON strings
    val e = And(
      And(
        UnboundPred(Op.Gt, "ts", Seq("2024-06-01T12:00:00+00:00")),
        UnboundPred(Op.LtEq, "price", Seq("199.99"))),
      And(
        UnboundPred(Op.Eq, "raw", Seq("0AFF")),
        UnboundPred(Op.GtEq, "day", Seq("2024-06-01"))))
    val bound = Expr.bind(schema, e) // must not throw
    def preds(x: Expr): Seq[BoundPred] = x match {
      case And(l, r)    => preds(l) ++ preds(r)
      case p: BoundPred => Seq(p)
      case _            => Nil
    }
    val byName = preds(bound).map(p => p.field.name -> p.values.head).toMap
    assert(byName("ts") === java.time.Instant.parse("2024-06-01T12:00:00Z")
      .toEpochMilli * 1000L)
    assert(byName("price") === new java.math.BigDecimal("199.99"))
    assert(byName("raw").asInstanceOf[Array[Byte]].toSeq ===
      Seq(0x0a.toByte, 0xff.toByte))
    assert(byName("day") ===
      java.time.LocalDate.parse("2024-06-01").toEpochDay.toInt)
  }

  test("expression JSON round-trips through the spec shape") {
    val e = Or(
      And(UnboundPred(Op.GtEq, "id", Seq(5L)),
        UnboundPred(Op.In, "id", Seq(5L, 7L, 9L))),
      Not(UnboundPred(Op.IsNull, "ts", Nil)))
    assert(SpecExpr.read(SpecExpr.write(e)) === e)
    // the newer child/left/right aliases parse too
    val alias = MetaJson.mapper.readTree(
      """{"type":"eq","left":"id","right":5}""")
    assert(SpecExpr.read(alias) === UnboundPred(Op.Eq, "id", Seq(5L)))
  }

  test("internal formats map into the spec file-format enum") {
    def file(fmt: String) = DataFile(s"/d/f.$fmt", fmt, 0, Nil, 10L, 100L)
    val nm = SpecScanTasks.writeFile(file("parquet-nm"), meta)
    assert(nm.get("file-format").asText() === "parquet",
      "parquet-nm is an internal marker, not a spec FileFormat value")
    assert(nm.get("x-graft-format").asText() === "parquet-nm")
    assert(SpecScanTasks.readFile(nm, meta).format === "parquet-nm")
    val dv = SpecScanTasks.writeFile(file("dv"), meta)
    assert(dv.get("file-format").asText() === "puffin")
    assert(SpecScanTasks.readFile(dv, meta).format === "dv")
    val pq = SpecScanTasks.writeFile(file("parquet"), meta)
    assert(pq.get("file-format").asText() === "parquet" &&
      !pq.has("x-graft-format"))
  }

  test("FileScanTasks round-trip with deletes, stats and residuals") {
    val del = DataFile("/d/del.avro", "avro", 0, Nil, 3L, 50L,
      content = FileContent.PositionDeletes,
      referencedDataFile = Some("/d/f1.parquet"))
    val f1 = DataFile("/d/f1.parquet", "parquet", 0, Nil, 100L, 1000L,
      columnStats = Map(
        1 -> ColStats(Some(100L), Some(0L), None, Some(1L), Some(99L)),
        2 -> ColStats(Some(100L), Some(2L), None,
          Some(1700000000000000L), Some(1710000000000000L))))
    val tasks = Seq(
      FileScanTask(f1, 0, 1000L, UnboundPred(Op.Gt, "id", Seq(5L)), Seq(del),
        dataSequenceNumber = 7L, writeSchemaId = 2),
      FileScanTask(f1.copy(path = "/d/f2.parquet"), 0, 1000L, TrueE, Seq(del)))
    val wire = SpecScanTasks.writeTasks(tasks, meta)
    // ONE deduped delete-files entry, referenced by index from both tasks
    assert(wire.get("delete-files").size() === 1)
    val back = SpecScanTasks.readTasks(wire, meta)
    assert(back.size === 2)
    assert(back.head.file.path === "/d/f1.parquet")
    assert(back.head.deletes.map(_.path) === Seq("/d/del.avro"))
    assert(back.head.deletes.head.format === "avro")
    assert(back.head.deletes.head.referencedDataFile === Some("/d/f1.parquet"))
    assert(back.head.residual === UnboundPred(Op.Gt, "id", Seq(5L)))
    assert(back.head.dataSequenceNumber === 7L)
    assert(back.head.writeSchemaId === 2)
    assert(back.head.file.columnStats(1).lower === Some(1L))
    assert(back.head.file.columnStats(2).upper === Some(1710000000000000L))
    assert(back(1).deletes.map(_.path) === Seq("/d/del.avro"))
  }

  test("plan-task tokens parse and reject malformed input") {
    val t = SpecScanTasks.planTask("abc-123", 7)
    assert(SpecScanTasks.parsePlanTask(t) === (("abc-123", 7)))
    intercept[IllegalArgumentException](SpecScanTasks.parsePlanTask("nohash"))
  }

  test("bound transform predicates serialize; shred preds widen, not throw") {
    import graft.core.transform.BucketT
    // a residual can legitimately hold the BOUND transform pred that
    // partition projection returned (Spark system-function pushdown →
    // server binds → Projections.residual hands it back verbatim); the
    // wire shape is the same as the unbound form and re-binds on read
    val tr = BucketT(16)
    val idField = schema.struct.fields.head // id: long
    val bound = BoundTransformPred(Op.Eq, tr, idField, 0, Seq(3))
    val back = SpecExpr.read(SpecExpr.write(bound))
    assert(back === TransformPred(Op.Eq, tr, "id", Seq(3L)))
    assert(Expr.bind(schema, back).isInstanceOf[BoundTransformPred])

    // shredded-variant preds have no spec encoding: writeLossy WIDENS
    // them (TRUE positive, FALSE under NOT) instead of failing the plan
    val shred = ShredPred(Op.GtEq, "9:$.x", GLong, Seq(2L))
    assert(SpecExpr.read(SpecExpr.writeLossy(shred)) === TrueE)
    // under a NOT the leaf must flip to FALSE so Not(...) stays TRUE —
    // widening must never NARROW the residual
    assert(SpecExpr.read(SpecExpr.writeLossy(Not(shred))) === TrueE)
    // conjunction keeps the expressible side
    val mixed = And(shred, UnboundPred(Op.Gt, "id", Seq(5L)))
    assert(SpecExpr.read(SpecExpr.writeLossy(mixed)) ===
      UnboundPred(Op.Gt, "id", Seq(5L)))
    // disjunction with an inexpressible arm collapses to TRUE (superset)
    assert(SpecExpr.read(SpecExpr.writeLossy(
      Or(shred, UnboundPred(Op.Gt, "id", Seq(5L))))) === TrueE)
    // a whole task serializes instead of 400-ing the plan
    val f = DataFile("/d/v.parquet", "parquet", 0, Nil, 10L, 100L)
    val wire = SpecScanTasks.writeTasks(
      Seq(FileScanTask(f, 0, 100L, And(bound, shred), Nil)), meta)
    val res = SpecScanTasks.readTasks(wire, meta).head.residual
    assert(res === TransformPred(Op.Eq, tr, "id", Seq(3L)))
  }
}
