package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.transform._

/** Catalog functions mirroring the partition transforms (reference
  * spark/.../functions/SparkFunctions.java:32-40 and
  * {Bucket,Truncate,Years,Months,Days,Hours}Function.java).
  *
  * Each bound function exposes a primitive `invoke` so Catalyst plans an
  * `Invoke` (codegen) instead of the row-boxing `produceResult` path, and
  * the semantics are delegated to the same core transforms the write path
  * and the pruning projections use — one source of truth for the hash.
  * These functions also let Spark resolve `days(ts)`-style transform
  * expressions in write distributions and storage-partitioned joins.
  */
object GraftFunctions {

  val names: Seq[String] = Seq(
    "graft_version", "years", "months", "days", "hours", "bucket", "truncate",
    "st_point", "st_x", "st_y", "st_intersects_bbox",
    "variant_get_long", "variant_get_string")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "graft_version" => Some(VersionFn)
    case "years"         => Some(new TimeUnbound("years", YearT))
    case "months"        => Some(new TimeUnbound("months", MonthT))
    case "days"          => Some(new TimeUnbound("days", DayT))
    case "hours"         => Some(new TimeUnbound("hours", HourT))
    case "bucket"        => Some(BucketUnbound)
    case "truncate"      => Some(TruncateUnbound)
    case "st_point"           => Some(StPointFn)
    case "st_x"               => Some(new StCoordFn("st_x", 0))
    case "st_y"               => Some(new StCoordFn("st_y", 8))
    case "st_intersects_bbox" => Some(StIntersectsBboxFn)
    case "variant_get_long"   => Some(new VariantGetFn("variant_get_long", LongType))
    case "variant_get_string" => Some(new VariantGetFn("variant_get_string", StringType))
    case _               => None
  }

  // ------------------------------------------------------------- variant
  /** variant_get_long/string(payload, '$.path') — typed variant path
    * extraction as a CATALOG function, so comparisons against it reach
    * the scan as a UserDefinedScalarFunc predicate and prune files via
    * shredded-path stats (write.variant.shred.*; reference variant
    * shredding spec — Spark's own PushVariantIntoScan only rewrites v1
    * file-source relations, never DSv2). Evaluation delegates to
    * Spark's VariantGet cast machinery, so semantics match
    * variant_get(col, path, type) exactly. */
  final class VariantGetFn(fname: String, out: DataType)
    extends UnboundFunction with ScalarFunction[Any] {
    override def name(): String = fname
    override def description(): String =
      s"$fname(variant, path) - typed variant path extraction (shred-prunable)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 && inputType(0).dataType == VariantType &&
        inputType(1).dataType == StringType,
        s"$fname takes (v: variant, path: string)")
      this
    }
    override def inputTypes(): Array[DataType] = Array(VariantType, StringType)
    override def resultType(): DataType = out
    override def canonicalName(): String = s"graft.$fname"
    private val castArgs =
      org.apache.spark.sql.catalyst.expressions.variant.VariantCastArgs(
        false, None, java.time.ZoneOffset.UTC)
    override def produceResult(input: InternalRow): Any = {
      if (input.isNullAt(0) || input.isNullAt(1)) return null
      val v = input.get(0, VariantType)
        .asInstanceOf[org.apache.spark.unsafe.types.VariantVal]
      org.apache.spark.sql.catalyst.expressions.variant.VariantGet.variantGet(
        v, input.getUTF8String(1), out, castArgs, fname)
    }
  }

  // ------------------------------------------------------------ version
  object VersionFn extends UnboundFunction with ScalarFunction[UTF8String] {
    override def name(): String = "graft_version"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.isEmpty, "graft_version takes no arguments"); this
    }
    override def description(): String = "graft_version() - engine version"
    override def inputTypes(): Array[DataType] = Array.empty
    override def resultType(): DataType = StringType
    override def isResultNullable: Boolean = false
    override def canonicalName(): String = "graft.graft_version"
    def invoke(): UTF8String = UTF8String.fromString("graft-0.1")
    override def produceResult(input: InternalRow): UTF8String = invoke()
  }

  // ----------------------------------------------------------- geospatial
  // v3 geometry/geography values are WKB binaries (spec format/spec.md
  // Appendix G); these functions construct/inspect them and express the
  // bbox-intersection predicate that the scan prunes with (reference
  // api/.../geospatial/GeospatialPredicateEvaluators.java — the reference
  // has no SQL surface for it yet; DSv2 catalog functions are ours).
  object StPointFn extends UnboundFunction with ScalarFunction[Array[Byte]] {
    override def name(): String = "st_point"
    override def description(): String = "st_point(x, y) - WKB point"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 &&
        inputType.forall(_.dataType == DoubleType), "st_point takes (x: double, y: double)")
      this
    }
    override def inputTypes(): Array[DataType] = Array(DoubleType, DoubleType)
    override def resultType(): DataType = BinaryType
    override def canonicalName(): String = "graft.st_point"
    def invoke(x: Double, y: Double): Array[Byte] =
      graft.core.types.WKB.encodePoint(x, y)
    override def produceResult(input: InternalRow): Array[Byte] =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else invoke(input.getDouble(0), input.getDouble(1))
  }

  /** st_x/st_y of a WKB point (null for non-point geometries). */
  final class StCoordFn(fname: String, which: Int)
    extends UnboundFunction with ScalarFunction[java.lang.Double] {
    override def name(): String = fname
    override def description(): String = s"$fname(geom) - point coordinate"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1 && inputType(0).dataType == BinaryType,
        s"$fname takes a geometry (binary WKB)")
      this
    }
    override def inputTypes(): Array[DataType] = Array(BinaryType)
    override def resultType(): DataType = DoubleType
    override def canonicalName(): String = s"graft.$fname"
    def invoke(wkb: Array[Byte]): java.lang.Double =
      graft.core.types.WKB.decodePoint(wkb) match {
        case Some((x, y)) => if (which == 0) x else y
        case None         => null
      }
    override def produceResult(input: InternalRow): java.lang.Double =
      if (input.isNullAt(0)) null else invoke(input.getBinary(0))
  }

  object StIntersectsBboxFn extends UnboundFunction with ScalarFunction[java.lang.Boolean] {
    override def name(): String = "st_intersects_bbox"
    override def description(): String =
      "st_intersects_bbox(geom, xmin, ymin, xmax, ymax) - value bbox intersects box"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 5 && inputType(0).dataType == BinaryType &&
        inputType.drop(1).forall(_.dataType == DoubleType),
        "st_intersects_bbox takes (geom, xmin: double, ymin: double, xmax: double, ymax: double)")
      this
    }
    override def inputTypes(): Array[DataType] =
      Array(BinaryType, DoubleType, DoubleType, DoubleType, DoubleType)
    override def resultType(): DataType = BooleanType
    override def canonicalName(): String = "graft.st_intersects_bbox"
    def invoke(wkb: Array[Byte], xmin: Double, ymin: Double,
        xmax: Double, ymax: Double): Boolean =
      // wrap-aware (matches pruning + row evaluation): xmin > xmax means
      // an antimeridian-crossing box; for ordinary boxes this is planar
      graft.core.types.WKB.bbox(wkb).exists(b => graft.core.types.GeoBox
        .intersects(b, graft.core.types.GeoBox(xmin, ymin, xmax, ymax)))
    override def produceResult(input: InternalRow): java.lang.Boolean =
      if (input.isNullAt(0)) null
      else Boolean.box(invoke(input.getBinary(0), input.getDouble(1),
        input.getDouble(2), input.getDouble(3), input.getDouble(4)))
  }

  // ------------------------------------------------------- time transforms
  final class TimeUnbound(fname: String, t: TimeT) extends UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"$fname(col) - ${t.name} ordinal since epoch (partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1, s"$fname takes one argument")
      inputType(0).dataType match {
        case DateType if t != HourT     => new TimeOnDate(fname, t)
        case TimestampType              => new TimeOnTs(fname, t, TimestampType)
        case TimestampNTZType           => new TimeOnTs(fname, t, TimestampNTZType)
        case other => throw new UnsupportedOperationException(
          s"$fname cannot be applied to $other")
      }
    }
  }

  final class TimeOnDate(fname: String, t: TimeT)
    extends ScalarFunction[Integer] {
    override def name(): String = fname
    override def inputTypes(): Array[DataType] = Array(DateType)
    override def resultType(): DataType = if (t == DayT) DateType else IntegerType
    override def canonicalName(): String = s"graft.$fname(date)"
    def invoke(days: Int): Int =
      t.apply(days, graft.core.types.GDate).asInstanceOf[Int]
    override def produceResult(input: InternalRow): Integer =
      if (input.isNullAt(0)) null else Int.box(invoke(input.getInt(0)))
  }

  final class TimeOnTs(fname: String, t: TimeT, in: DataType)
    extends ScalarFunction[Integer] {
    override def name(): String = fname
    override def inputTypes(): Array[DataType] = Array(in)
    override def resultType(): DataType = if (t == DayT) DateType else IntegerType
    override def canonicalName(): String = s"graft.$fname($in)"
    def invoke(micros: Long): Int =
      t.apply(micros, graft.core.types.GTimestamp(in == TimestampNTZType)).asInstanceOf[Int]
    override def produceResult(input: InternalRow): Integer =
      if (input.isNullAt(0)) null else Int.box(invoke(input.getLong(0)))
  }

  // ---------------------------------------------------------------- bucket
  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col) - murmur3 hash bucket (partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2, "bucket takes (numBuckets, col)")
      require(inputType(0).dataType == IntegerType, "numBuckets must be int")
      inputType(1).dataType match {
        case IntegerType       => new BucketBound(IntegerType)
        case DateType          => new BucketBound(DateType)
        case LongType          => new BucketBound(LongType)
        case TimestampType     => new BucketBound(TimestampType)
        case TimestampNTZType  => new BucketBound(TimestampNTZType)
        case StringType        => new BucketBound(StringType)
        case BinaryType        => new BucketBound(BinaryType)
        case other => throw new UnsupportedOperationException(
          s"bucket cannot be applied to $other")
      }
    }
  }

  final class BucketBound(in: DataType) extends ScalarFunction[Integer] {
    override def name(): String = "bucket"
    override def inputTypes(): Array[DataType] = Array(IntegerType, in)
    override def resultType(): DataType = IntegerType
    override def canonicalName(): String = s"graft.bucket($in)"

    private def toBucket(n: Int, hash: Int): Int = (hash & Integer.MAX_VALUE) % n

    def invoke(n: Int, v: Int): Int = toBucket(n, Murmur3.hashLong(v.toLong))
    def invoke(n: Int, v: Long): Int = toBucket(n, Murmur3.hashLong(v))
    def invoke(n: Int, v: UTF8String): Int = toBucket(n, Murmur3.hashBytes(v.getBytes))
    def invoke(n: Int, v: Array[Byte]): Int = toBucket(n, Murmur3.hashBytes(v))

    override def produceResult(input: InternalRow): Integer =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else Int.box(in match {
        case IntegerType | DateType => invoke(input.getInt(0), input.getInt(1))
        case LongType | TimestampType | TimestampNTZType =>
          invoke(input.getInt(0), input.getLong(1))
        case StringType => invoke(input.getInt(0), input.getUTF8String(1))
        case BinaryType => invoke(input.getInt(0), input.getBinary(1))
        case other => throw new IllegalStateException(other.toString)
      })
  }

  // -------------------------------------------------------------- truncate
  object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(width, col) - width truncation (partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2, "truncate takes (width, col)")
      require(inputType(0).dataType == IntegerType, "width must be int")
      inputType(1).dataType match {
        case IntegerType | LongType | StringType | BinaryType =>
          new TruncateBound(inputType(1).dataType)
        case other => throw new UnsupportedOperationException(
          s"truncate cannot be applied to $other")
      }
    }
  }

  final class TruncateBound(in: DataType) extends ScalarFunction[Any] {
    override def name(): String = "truncate"
    override def inputTypes(): Array[DataType] = Array(IntegerType, in)
    override def resultType(): DataType = in
    override def canonicalName(): String = s"graft.truncate($in)"

    def invoke(w: Int, v: Int): Int = v - (((v % w) + w) % w)
    def invoke(w: Int, v: Long): Long = v - (((v % w) + w) % w)
    def invoke(w: Int, v: UTF8String): UTF8String =
      if (v.numChars <= w) v else v.substring(0, w)
    def invoke(w: Int, v: Array[Byte]): Array[Byte] =
      if (v.length <= w) v else java.util.Arrays.copyOf(v, w)

    override def produceResult(input: InternalRow): Any =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else in match {
        case IntegerType => invoke(input.getInt(0), input.getInt(1))
        case LongType    => invoke(input.getInt(0), input.getLong(1))
        case StringType  => invoke(input.getInt(0), input.getUTF8String(1))
        case BinaryType  => invoke(input.getInt(0), input.getBinary(1))
        case other => throw new IllegalStateException(other.toString)
      }
  }
}
