package graft.core.types

import org.apache.spark.sql.types._

/** Field-ID-based type system (reference: api/.../types/Types.java,
  * format/spec.md:229-323). The load-bearing difference from Spark's
  * name-based StructType: every column has a stable integer field ID;
  * projection, pruning and schema evolution resolve by ID, never name.
  *
  * Internal value representation per type (used by evaluators/transforms):
  * boolean→Boolean, int→Int, long→Long, float→Float, double→Double,
  * decimal→java.math.BigDecimal, date→Int (days since epoch),
  * timestamp→Long (micros since epoch), string→String, binary→Array[Byte].
  */
sealed trait GType {
  def isPrimitive: Boolean = true
}

case object GBoolean extends GType
case object GInt extends GType
case object GLong extends GType
case object GFloat extends GType
case object GDouble extends GType
final case class GDecimal(precision: Int, scale: Int) extends GType
case object GDate extends GType
/** micros since epoch; ntz = no timezone (TimestampNTZType in Spark). */
final case class GTimestamp(ntz: Boolean = false) extends GType
/** v3 nanosecond timestamps (reference api/.../types/Types.java:300,
  * format/spec.md v3 `timestamp_ns`/`timestamptz_ns`): nanos since
  * epoch. Spark has no nanosecond timestamp type, so these surface as
  * LongType nanos (SURVEY §1 mapping); transforms and comparators work
  * on the underlying long with floorDiv conversions. */
final case class GTimestampNs(ntz: Boolean = false) extends GType
case object GString extends GType
case object GBinary extends GType
/** v3 semi-structured values (reference api/.../variants, spec variant
  * type); maps to Spark 4's native VariantType. No stats/transforms —
  * pruning treats variant columns as opaque. */
case object GVariant extends GType
/** time-of-day, micros since midnight (Types.TimeType; Spark 4.1 TIME) */
case object GTime extends GType
/** 16-byte UUID (Types.UUIDType); surfaced to Spark as a fixed binary */
case object GUuid extends GType
/** v3 `unknown`: all-null column of undetermined type → Spark NullType */
case object GUnknown extends GType
/** v3 geospatial types (reference api/.../types/Types.java:574,640;
  * spec format/spec.md:284-335). Values are WKB byte arrays surfaced to
  * Spark as BinaryType; file stats carry bounding-box bound points and
  * pruning goes through GeoBox intersection (see Geo.scala). Defaults
  * must be null; no partition transform applies (spec :335, :572). */
final case class GGeometry(crs: String = GeoDefaults.Crs) extends GType
final case class GGeography(crs: String = GeoDefaults.Crs,
    algorithm: String = GeoDefaults.Algorithm) extends GType

object GeoDefaults {
  val Crs = "OGC:CRS84"
  val Algorithm = "spherical"
  def isGeo(t: GType): Boolean = t match {
    case GGeometry(_) | GGeography(_, _) => true
    case _                               => false
  }
}

/** v3 column defaults (spec stores typed JSON values; we store the SQL
  * literal text, which Spark's readers evaluate natively):
  * `initialDefaultSql` — value for rows written BEFORE the column
  * existed (EXISTS_DEFAULT; immutable after creation);
  * `writeDefaultSql` — value for omitted INSERT columns
  * (CURRENT_DEFAULT; mutable via ALTER COLUMN SET DEFAULT). */
final case class GField(id: Int, name: String, tpe: GType,
    required: Boolean = false, initialDefaultSql: Option[String] = None,
    writeDefaultSql: Option[String] = None) {
  def nested: Seq[GField] = tpe match {
    case s: GStruct => s.fields
    case l: GList   => Seq(l.elementField)
    case m: GMap    => Seq(m.keyField, m.valueField)
    case _          => Nil
  }
}

final case class GStruct(fields: Seq[GField]) extends GType {
  override def isPrimitive = false
  def field(name: String): Option[GField] = fields.find(_.name == name)
}
final case class GList(elementId: Int, elementType: GType,
    elementRequired: Boolean = false) extends GType {
  override def isPrimitive = false
  def elementField: GField = GField(elementId, "element", elementType, elementRequired)
}
final case class GMap(keyId: Int, keyType: GType, valueId: Int,
    valueType: GType, valueRequired: Boolean = false) extends GType {
  override def isPrimitive = false
  def keyField: GField = GField(keyId, "key", keyType, required = true)
  def valueField: GField = GField(valueId, "value", valueType, valueRequired)
}

/** A schema: a struct root + schema id + identifier (row-identity) fields. */
final case class GSchema(struct: GStruct, schemaId: Int = 0,
    identifierFieldIds: Set[Int] = Set.empty) {
  def fields: Seq[GField] = struct.fields

  lazy val byId: Map[Int, GField] = {
    def walk(fs: Seq[GField]): Seq[(Int, GField)] =
      fs.flatMap(f => (f.id -> f) +: walk(f.nested))
    walk(fields).toMap
  }
  /** case-sensitive dotted-path lookup for top-level + nested struct names */
  lazy val byName: Map[String, GField] = {
    def walk(prefix: String, fs: Seq[GField]): Seq[(String, GField)] =
      fs.flatMap { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        (p -> f) +: (f.tpe match {
          case s: GStruct => walk(p, s.fields)
          case _          => Nil
        })
      }
    walk("", fields).toMap
  }
  def findField(name: String): Option[GField] = byName.get(name)
  /** position of a top-level field id */
  def posOf(id: Int): Int = fields.indexWhere(_.id == id)

  def highestFieldId: Int = {
    def walk(fs: Seq[GField]): Int =
      fs.map(f => math.max(f.id, walk(f.nested))).maxOption.getOrElse(0)
    walk(fields)
  }

  /** Re-key every field id by a constant offset. REPLACE TABLE assigns the
    * replacement schema ids past the old table's last-column-id (reference
    * core/.../TableMetadata.java buildReplacement → reassignment via
    * TypeUtil.assignFreshIds) so old data files can never alias a new
    * column through a recycled id. */
  def shiftIds(offset: Int): GSchema = {
    def shiftType(t: GType): GType = t match {
      case s: GStruct => GStruct(s.fields.map(shiftField))
      case l: GList   => GList(l.elementId + offset, shiftType(l.elementType), l.elementRequired)
      case m: GMap    => GMap(m.keyId + offset, shiftType(m.keyType),
        m.valueId + offset, shiftType(m.valueType), m.valueRequired)
      case p          => p
    }
    def shiftField(f: GField): GField = f.copy(id = f.id + offset, tpe = shiftType(f.tpe))
    copy(struct = GStruct(fields.map(shiftField)),
      identifierFieldIds = identifierFieldIds.map(_ + offset))
  }
}

object SparkTypes {
  val FieldIdKey = "graft.field.id"
  /** parquet writers pick this up to stamp field ids into file schemas */
  val ParquetFieldIdKey = "parquet.field.id"

  def toSpark(t: GType): DataType = t match {
    case GBoolean          => BooleanType
    case GInt              => IntegerType
    case GLong             => LongType
    case GFloat            => FloatType
    case GDouble           => DoubleType
    case GDecimal(p, s)    => DecimalType(p, s)
    case GDate             => DateType
    case GTimestamp(true)  => TimestampNTZType
    case GTimestamp(false) => TimestampType
    case GTimestampNs(_)   => LongType // nanos since epoch
    case GString           => StringType
    case GBinary           => BinaryType
    case GVariant          => VariantType
    case GTime             => new TimeType(6) // micros precision
    case GUuid             => BinaryType      // 16-byte canonical encoding
    case GUnknown          => NullType
    case GGeometry(_) | GGeography(_, _) => BinaryType // WKB
    case s: GStruct        => toSparkStruct(s)
    case l: GList          => ArrayType(toSpark(l.elementType), !l.elementRequired)
    case m: GMap           => MapType(toSpark(m.keyType), toSpark(m.valueType), !m.valueRequired)
  }

  def toSparkStruct(s: GStruct): StructType =
    StructType(s.fields.map { f =>
      val mb = new MetadataBuilder()
        .putLong(FieldIdKey, f.id.toLong)
        .putLong(ParquetFieldIdKey, f.id.toLong)
      // Spark's parquet/orc readers fill columns ABSENT from a file with
      // EXISTS_DEFAULT (v3 initial-default); the analyzer fills omitted
      // INSERT columns from CURRENT_DEFAULT
      f.initialDefaultSql.foreach(mb.putString("EXISTS_DEFAULT", _))
      f.writeDefaultSql.orElse(f.initialDefaultSql)
        .foreach(mb.putString("CURRENT_DEFAULT", _))
      StructField(f.name, toSpark(f.tpe), nullable = !f.required, metadata = mb.build())
    })

  def toSparkSchema(s: GSchema): StructType = toSparkStruct(s.struct)

  /** Import a Spark schema, assigning fresh field IDs depth-first (used by
    * CREATE TABLE from a Spark StructType). */
  def fromSpark(st: StructType): GSchema = {
    var next = 0
    def nid(): Int = { next += 1; next }
    def conv(dt: DataType): GType = dt match {
      case BooleanType      => GBoolean
      case ByteType | ShortType | IntegerType => GInt
      case LongType         => GLong
      case FloatType        => GFloat
      case DoubleType       => GDouble
      case d: DecimalType   => GDecimal(d.precision, d.scale)
      case DateType         => GDate
      case TimestampType    => GTimestamp(false)
      case TimestampNTZType => GTimestamp(true)
      case StringType       => GString
      case BinaryType       => GBinary
      case VariantType      => GVariant
      case _: TimeType      => GTime
      case NullType         => GUnknown
      case s: StructType    => GStruct(s.fields.map(f => GField(nid(), f.name, conv(f.dataType), !f.nullable)))
      case a: ArrayType     => GList(nid(), conv(a.elementType), !a.containsNull)
      case m: MapType       => GMap(nid(), conv(m.keyType), nid(), conv(m.valueType), !m.valueContainsNull)
      case other => throw new IllegalArgumentException(s"unsupported Spark type: $other")
    }
    // two-pass: top-level ids first (1..n), then nested — matches the
    // reference's fresh-assignment convention closely enough for our use
    val top = st.fields.map { f => (nid(), f) }
    val gfields = top.map { case (id, f) => GField(id, f.name, conv(f.dataType), !f.nullable) }
    GSchema(GStruct(gfields.toSeq))
  }

  /** JSON (de)serialization of GType name for metadata files. */
  def typeName(t: GType): String = t match {
    case GBoolean          => "boolean"
    case GInt              => "int"
    case GLong             => "long"
    case GFloat            => "float"
    case GDouble           => "double"
    case GDecimal(p, s)    => s"decimal($p,$s)"
    case GDate             => "date"
    case GTimestamp(true)  => "timestamp"
    case GTimestamp(false) => "timestamptz"
    case GTimestampNs(true)  => "timestamp_ns"
    case GTimestampNs(false) => "timestamptz_ns"
    case GString           => "string"
    case GBinary           => "binary"
    case GVariant          => "variant"
    case GTime             => "time"
    case GUuid             => "uuid"
    case GUnknown          => "unknown"
    // spec format/spec.md:1690-1691: bare name when parameters are the
    // defaults, else "geometry(<C>)" / "geography(<C>, <A>)"
    case GGeometry(GeoDefaults.Crs) => "geometry"
    case GGeometry(crs)             => s"geometry($crs)"
    case GGeography(GeoDefaults.Crs, GeoDefaults.Algorithm) => "geography"
    case GGeography(crs, GeoDefaults.Algorithm) => s"geography($crs)"
    case GGeography(crs, alg)       => s"geography($crs, $alg)"
    case _ => throw new IllegalArgumentException(s"not a primitive: $t")
  }

  private val DecimalRe = """decimal\((\d+),(\d+)\)""".r
  private val GeometryRe = """geometry\(([^)]+)\)""".r
  private val GeographyRe = """geography\(([^,)]+)(?:,\s*([^)]+))?\)""".r
  def typeFromName(s: String): GType = s match {
    case "boolean"          => GBoolean
    case "int"              => GInt
    case "long"             => GLong
    case "float"            => GFloat
    case "double"           => GDouble
    case DecimalRe(p, sc)   => GDecimal(p.toInt, sc.toInt)
    case "date"             => GDate
    case "timestamp"        => GTimestamp(true)
    case "timestamptz"      => GTimestamp(false)
    case "timestamp_ns"     => GTimestampNs(true)
    case "timestamptz_ns"   => GTimestampNs(false)
    case "string"           => GString
    case "binary"           => GBinary
    case "variant"          => GVariant
    case "time"             => GTime
    case "uuid"             => GUuid
    case "unknown"          => GUnknown
    case "geometry"         => GGeometry()
    case GeometryRe(crs)    => GGeometry(crs.trim)
    case "geography"        => GGeography()
    case GeographyRe(crs, alg) =>
      GGeography(crs.trim, Option(alg).map(_.trim).getOrElse(GeoDefaults.Algorithm))
    case other => throw new IllegalArgumentException(s"unknown type: $other")
  }
}

/** Total ordering per primitive type, for stats evaluation/comparators. */
object TypeComparators {
  def compare(t: GType, a: Any, b: Any): Int = t match {
    case GBoolean => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case GInt     => Integer.compare(anyToInt(a), anyToInt(b))
    case GLong    => java.lang.Long.compare(anyToLong(a), anyToLong(b))
    case GFloat   => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case GDouble  => java.lang.Double.compare(anyToDouble(a), anyToDouble(b))
    case GDecimal(_, _) =>
      a.asInstanceOf[java.math.BigDecimal].compareTo(b.asInstanceOf[java.math.BigDecimal])
    case GDate         => Integer.compare(anyToInt(a), anyToInt(b))
    case GTimestamp(_) => java.lang.Long.compare(anyToLong(a), anyToLong(b))
    case GTimestampNs(_) => java.lang.Long.compare(anyToLong(a), anyToLong(b))
    case GString       => a.asInstanceOf[String].compareTo(b.asInstanceOf[String])
    case GBinary | GGeometry(_) | GGeography(_, _) =>
      val x = a.asInstanceOf[Array[Byte]]; val y = b.asInstanceOf[Array[Byte]]
      var i = 0
      while (i < x.length && i < y.length) {
        val c = Integer.compare(x(i) & 0xff, y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      Integer.compare(x.length, y.length)
    case other => throw new IllegalArgumentException(s"not comparable: $other")
  }

  def anyToInt(a: Any): Int = a match {
    case i: Int => i; case l: Long => l.toInt; case s: Short => s.toInt; case b: Byte => b.toInt
    case other  => throw new IllegalArgumentException(s"not an int: $other")
  }
  def anyToLong(a: Any): Long = a match {
    case l: Long => l; case i: Int => i.toLong; case s: Short => s.toLong; case b: Byte => b.toLong
    case other   => throw new IllegalArgumentException(s"not a long: $other")
  }
  def anyToDouble(a: Any): Double = a match {
    case d: Double => d; case f: Float => f.toDouble
    case other     => throw new IllegalArgumentException(s"not a double: $other")
  }

  /** Parse a partition-path string ("col=value" segment) into the
    * internal representation of the given type. */
  def parse(t: GType, s: String): Any =
    if (s == "null") null
    else t match {
      case GBoolean      => s.toBoolean
      case GInt          => s.toInt
      case GLong         => s.toLong
      case GFloat        => s.toFloat
      case GDouble       => s.toDouble
      case GDecimal(_, _) => new java.math.BigDecimal(s)
      case GDate         => java.time.LocalDate.parse(s).toEpochDay.toInt
      case GString       => s
      case GTimestamp(_) =>
        // Hive-style path segments: epoch micros, or an ISO (local) date /
        // datetime with the ':'s often URL-encoded
        if (s.matches("-?\\d+")) s.toLong
        else {
          val decoded = java.net.URLDecoder.decode(s, "UTF-8").replace(' ', 'T')
          val ldt =
            try java.time.LocalDateTime.parse(decoded)
            catch { case _: Exception => java.time.LocalDate.parse(decoded).atStartOfDay }
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            ldt.getNano / 1000L
        }
      case other => throw new IllegalArgumentException(s"cannot parse partition value: $other")
    }
}
