package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.expr._
import graft.core.transform._
import graft.core.types._

/** Spec-vector tests for transforms (format/spec.md:577-621 + Appendix B)
  * and unit tests for expression binding/evaluation/pruning. Any hash or
  * epoch-ordinal deviation silently breaks partition pruning, so these
  * pin the exact published vectors. */
class CoreSpec extends AnyFunSuite {

  // ------------------------------------------------------ murmur3 vectors
  test("murmur3 spec vectors") {
    assert(Murmur3.hashLong(34L) === 2017239379)
    assert(Murmur3.hashInt(34) === 2017239379)
    assert(Murmur3.hashBytes("iceberg".getBytes("UTF-8")) === 1210000089)
    assert(Murmur3.hashBytes(Array[Byte](0, 1, 2, 3)) === -188683207)
    // decimal 14.20 → unscaled 1420 min big-endian
    val d = new java.math.BigDecimal("14.20")
    assert(Murmur3.hashBytes(d.unscaledValue.toByteArray) === -500754589)
    // date 2017-11-16 → 17486 days
    assert(Murmur3.hashInt(java.time.LocalDate.of(2017, 11, 16).toEpochDay.toInt) === -653330422)
    // timestamp 2017-11-16T22:31:08 UTC micros
    val ts = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toInstant(java.time.ZoneOffset.UTC)
    val micros = ts.getEpochSecond * 1000000L
    assert(Murmur3.hashLong(micros) === -2047944441)
    assert(Murmur3.hashLong(micros + 1) === -1207196810)
  }

  test("bucket transform") {
    val b16 = BucketT(16)
    assert(b16.apply(34, GInt) === (2017239379 & Int.MaxValue) % 16)
    assert(b16.apply(34L, GLong) === b16.apply(34, GInt)) // promotion-stable
    assert(b16.apply(null, GLong) === null)
    assert(b16.apply("iceberg", GString) === (1210000089 & Int.MaxValue) % 16)
  }

  test("truncate transform") {
    val t10 = TruncateT(10)
    assert(t10.apply(1, GInt) === 0)
    assert(t10.apply(-1, GInt) === -10)
    assert(t10.apply(1L, GLong) === 0L)
    assert(t10.apply(-1L, GLong) === -10L)
    val t3 = TruncateT(3)
    assert(t3.apply("iceberg", GString) === "ice")
    assert(t3.apply("ab", GString) === "ab")
    assert(t3.apply(Array[Byte](1, 2, 3, 4, 5), GBinary)
      .asInstanceOf[Array[Byte]].toSeq === Seq[Byte](1, 2, 3))
    // decimal W=50, scale 2: 10.65 → 10.50
    val t50 = TruncateT(50)
    assert(t50.apply(new java.math.BigDecimal("10.65"), GDecimal(9, 2)) ===
      new java.math.BigDecimal("10.50"))
  }

  test("time transforms epoch ordinals") {
    val d20171116 = java.time.LocalDate.of(2017, 11, 16).toEpochDay.toInt
    assert(YearT.apply(d20171116, GDate) === 47)
    assert(MonthT.apply(d20171116, GDate) === 47 * 12 + 10)
    assert(DayT.apply(d20171116, GDate) === d20171116)
    val micros = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L
    assert(YearT.apply(micros, GTimestamp()) === 47)
    assert(DayT.apply(micros, GTimestamp()) === d20171116)
    assert(HourT.apply(micros, GTimestamp()) === micros / 3600000000L)
    // pre-epoch: 1969-12-31T23:00 → day -1, hour -1
    assert(DayT.apply(-3600000000L, GTimestamp()) === -1)
    assert(HourT.apply(-3600000000L, GTimestamp()) === -1)
    assert(YearT.apply(-1L, GTimestamp()) === -1)
  }

  // ------------------------------------------------------ schema + binding
  private val schema = GSchema(GStruct(Seq(
    GField(1, "id", GLong, required = true),
    GField(2, "data", GString),
    GField(3, "f", GFloat),
    GField(4, "ts", GTimestamp()),
    GField(5, "qty", GInt))))

  test("bind and evaluate rows") {
    val e = Expr.bind(schema, Expr.and(Expr.gtEq("qty", 10), Expr.startsWith("data", "ab")))
    assert(RowEvaluator.eval(e, ArrayRow(Array(1L, "abc", 1.0f, 0L, 15))))
    assert(!RowEvaluator.eval(e, ArrayRow(Array(1L, "abc", 1.0f, 0L, 5))))
    assert(!RowEvaluator.eval(e, ArrayRow(Array(1L, "xbc", 1.0f, 0L, 15))))
    // null semantics: comparison with null is false
    assert(!RowEvaluator.eval(e, ArrayRow(Array(1L, null, 1.0f, 0L, 15))))
    // required column IsNull binds to FalseE
    assert(Expr.bind(schema, Expr.isNull("id")) === FalseE)
    // case-insensitive binding by default
    assert(RowEvaluator.eval(Expr.bind(schema, Expr.equalTo("ID", 1L)),
      ArrayRow(Array(1L, "a", 0f, 0L, 0))))
    // NaN
    val nan = Expr.bind(schema, Expr.isNan("f"))
    assert(RowEvaluator.eval(nan, ArrayRow(Array(1L, "a", Float.NaN, 0L, 0))))
    assert(!RowEvaluator.eval(nan, ArrayRow(Array(1L, "a", 1.0f, 0L, 0))))
  }

  // ------------------------------------------------------ metrics pruning
  private def stats(id: Int, lower: Any, upper: Any, nulls: Long = 0,
      values: Long = 100, nans: Option[Long] = None) =
    FileStats(100, Map(id -> ColStats(Some(values), Some(nulls),
      nans, Option(lower), Option(upper))))

  test("inclusive metrics evaluator") {
    val fs = stats(5, 10, 50)
    def might(e: Expr) = InclusiveMetricsEvaluator.rowsMightMatch(Expr.bind(schema, e), fs)
    assert(might(Expr.equalTo("qty", 30)))
    assert(!might(Expr.equalTo("qty", 51)))
    assert(!might(Expr.lt("qty", 10)))
    assert(might(Expr.ltEq("qty", 10)))
    assert(!might(Expr.gt("qty", 50)))
    assert(might(Expr.gtEq("qty", 50)))
    assert(might(Expr.in("qty", Seq(1, 25))))
    assert(!might(Expr.in("qty", Seq(1, 60))))
    assert(!might(Expr.isNull("qty")))
    assert(might(Expr.notNull("qty")))
    // all-null column: value preds cannot match
    val allNull = FileStats(100, Map(5 -> ColStats(Some(100L), Some(100L), None, None, None)))
    assert(!InclusiveMetricsEvaluator.rowsMightMatch(
      Expr.bind(schema, Expr.equalTo("qty", 30)), allNull))
    assert(InclusiveMetricsEvaluator.rowsMightMatch(
      Expr.bind(schema, Expr.isNull("qty")), allNull))
    // string prefix bounds
    val sfs = stats(2, "apple", "cherry")
    assert(InclusiveMetricsEvaluator.rowsMightMatch(
      Expr.bind(schema, Expr.startsWith("data", "ba")), sfs))
    assert(!InclusiveMetricsEvaluator.rowsMightMatch(
      Expr.bind(schema, Expr.startsWith("data", "da")), sfs))
    // missing stats → might match
    assert(InclusiveMetricsEvaluator.rowsMightMatch(
      Expr.bind(schema, Expr.equalTo("qty", 1)), FileStats(100, Map.empty)))
  }

  test("strict metrics evaluator") {
    val fs = stats(5, 10, 50)
    def must(e: Expr) = StrictMetricsEvaluator.rowsMustMatch(Expr.bind(schema, e), fs)
    assert(must(Expr.lt("qty", 51)))
    assert(!must(Expr.lt("qty", 50)))
    assert(must(Expr.ltEq("qty", 50)))
    assert(must(Expr.gtEq("qty", 10)))
    assert(!must(Expr.equalTo("qty", 30)))
    assert(must(Expr.notEq("qty", 60)))
    assert(must(Expr.notNull("qty")))
    val single = stats(5, 7, 7)
    assert(StrictMetricsEvaluator.rowsMustMatch(
      Expr.bind(schema, Expr.equalTo("qty", 7)), single))
  }

  // ------------------------------------------------------ hidden partitioning
  test("inclusive projection through day transform") {
    val spec = PartitionSpec.of(schema, "ts" -> DayT)
    val day0 = java.time.LocalDate.of(1996, 3, 15).toEpochDay.toInt
    val micros = day0.toLong * 86400000000L + 123456L
    val rowPred = Expr.bind(schema, Expr.gtEq("ts", micros))
    val partPred = Projections.inclusive(spec, schema, rowPred)
    // partition day >= day(X): day0-1 pruned, day0 and day0+1 kept
    assert(!RowEvaluator.eval(partPred, ArrayRow(Array(day0 - 1))))
    assert(RowEvaluator.eval(partPred, ArrayRow(Array(day0))))
    assert(RowEvaluator.eval(partPred, ArrayRow(Array(day0 + 1))))
  }

  test("inclusive projection through bucket transform") {
    val spec = PartitionSpec.of(schema, "id" -> BucketT(16))
    val pred = Expr.bind(schema, Expr.equalTo("id", 34L))
    val partPred = Projections.inclusive(spec, schema, pred)
    val expected = (2017239379 & Int.MaxValue) % 16
    assert(RowEvaluator.eval(partPred, ArrayRow(Array(expected))))
    assert(!RowEvaluator.eval(partPred, ArrayRow(Array((expected + 1) % 16))))
    // Lt does not project through bucket → TrueE (no pruning)
    assert(Projections.inclusive(spec, schema,
      Expr.bind(schema, Expr.lt("id", 34L))) === TrueE)
  }

  test("strict projection and residual") {
    val spec = PartitionSpec.of(schema, "ts" -> DayT)
    val day0 = java.time.LocalDate.of(1996, 3, 15).toEpochDay.toInt
    val boundary = day0.toLong * 86400000000L
    val pred = Expr.bind(schema, Expr.lt("ts", boundary))
    // strict: partitions strictly before day0 fully match
    val sp = Projections.strict(spec, schema, pred)
    assert(RowEvaluator.eval(sp, ArrayRow(Array(day0 - 1))))
    assert(!RowEvaluator.eval(sp, ArrayRow(Array(day0))))
    // residual: fully-matching partition → TrueE; fully-pruned → FalseE.
    // X is exactly midnight of day0, so the tightened inclusive projection
    // (LtEq(day(X-1))) prunes day0 entirely:
    assert(Projections.residual(spec, schema, pred, ArrayRow(Array(day0 - 1))) === TrueE)
    assert(Projections.residual(spec, schema, pred, ArrayRow(Array(day0 + 1))) === FalseE)
    assert(Projections.residual(spec, schema, pred, ArrayRow(Array(day0))) === FalseE)
    // a mid-day bound keeps the predicate on the boundary partition
    val midday = Expr.bind(schema, Expr.lt("ts", boundary + 7L))
    assert(Projections.residual(spec, schema, midday, ArrayRow(Array(day0))) === midday)
    assert(Projections.residual(spec, schema, midday, ArrayRow(Array(day0 - 1))) === TrueE)
  }

  test("identity projection and partition values") {
    val spec = PartitionSpec.of(schema, "data" -> IdentityT, "id" -> BucketT(4))
    val row = ArrayRow(Array(34L, "hello", 1f, 0L, 9))
    val pv = spec.partitionValues(schema, row)
    assert(pv(0) === "hello")
    assert(pv(1) === (2017239379 & Int.MaxValue) % 4)
    val pred = Expr.bind(schema, Expr.equalTo("data", "hello"))
    val pp = Projections.strict(spec, schema, pred)
    assert(RowEvaluator.eval(pp, ArrayRow(pv)))
  }

  test("spark schema round-trip carries field ids") {
    val st = SparkTypes.toSparkSchema(schema)
    assert(st.fields.length === 5)
    assert(st("id").metadata.getLong(SparkTypes.FieldIdKey) === 1L)
    assert(st("qty").metadata.getLong(SparkTypes.ParquetFieldIdKey) === 5L)
    val gs = SparkTypes.fromSpark(st)
    assert(gs.fields.map(_.name) === schema.fields.map(_.name))
  }

  test("v3 types: variant/time/uuid/unknown name + spark round-trips") {
    import org.apache.spark.sql.types.{NullType, TimeType, VariantType}
    val v3 = Seq[(GType, org.apache.spark.sql.types.DataType)](
      GVariant -> VariantType, GTime -> new TimeType(6), GUnknown -> NullType)
    v3.foreach { case (g, s) => assert(SparkTypes.toSpark(g) === s) }
    Seq(GVariant, GTime, GUuid, GUnknown).foreach { g =>
      assert(SparkTypes.typeFromName(SparkTypes.typeName(g)) === g)
    }
    // json metadata round-trip keeps the type
    val sch = GSchema(GStruct(Seq(
      GField(1, "id", GLong, required = true), GField(2, "payload", GVariant),
      GField(3, "t", GTime), GField(4, "u", GUuid), GField(5, "x", GUnknown))))
    val json = graft.core.meta.MetaJson.writeSchema(sch).toString
    val back = graft.core.meta.MetaJson.readSchema(
      graft.core.meta.MetaJson.mapper.readTree(json))
    assert(back.fields.map(_.tpe) === sch.fields.map(_.tpe))
  }

  test("v3 timestamp_ns: mapping, json round-trip, transforms, comparator") {
    import org.apache.spark.sql.types.LongType
    // Spark surface: LongType nanos (no ns timestamp type in Spark)
    assert(SparkTypes.toSpark(GTimestampNs(true)) === LongType)
    assert(SparkTypes.toSpark(GTimestampNs(false)) === LongType)
    assert(SparkTypes.typeName(GTimestampNs(true)) === "timestamp_ns")
    assert(SparkTypes.typeName(GTimestampNs(false)) === "timestamptz_ns")
    Seq(GTimestampNs(true), GTimestampNs(false)).foreach { g =>
      assert(SparkTypes.typeFromName(SparkTypes.typeName(g)) === g)
    }
    // metadata JSON round-trip
    val sch = GSchema(GStruct(Seq(
      GField(1, "id", GLong, required = true),
      GField(2, "ts9", GTimestampNs(false)), GField(3, "ts9n", GTimestampNs(true)))))
    val json = graft.core.meta.MetaJson.writeSchema(sch).toString
    val back = graft.core.meta.MetaJson.readSchema(
      graft.core.meta.MetaJson.mapper.readTree(json))
    assert(back.fields.map(_.tpe) === sch.fields.map(_.tpe))
    // time transforms divide nanos to micros with floorDiv (pre-epoch safe)
    val ns = 1700000000L * 1000000000L + 123456789L // 2023-11-14T22:13:20.123456789Z
    assert(DayT.apply(ns, GTimestampNs(false)) ===
      DayT.apply(1700000000L * 1000000L + 123456L, GTimestamp(false)))
    assert(MonthT.apply(ns, GTimestampNs(false)) ===
      MonthT.apply(1700000000L * 1000000L, GTimestamp(false)))
    val preEpoch = -1L // 1969-12-31T23:59:59.999999999Z
    assert(DayT.apply(preEpoch, GTimestampNs(false)) ===
      DayT.apply(-1L, GTimestamp(false)))
    // bucket hashes the raw nanos long; comparator orders by the long
    assert(BucketT(8).canTransform(GTimestampNs(false)))
    assert(TypeComparators.compare(GTimestampNs(false), 5L, 7L) < 0)
  }
}
