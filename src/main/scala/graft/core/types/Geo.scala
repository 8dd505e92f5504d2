package graft.core.types

/** Geospatial support for the v3 `geometry(C)` / `geography(C, A)` types
  * (reference api/.../types/Types.java:574,640, api/.../geospatial/
  * {BoundingBox,GeospatialBound,GeospatialPredicateEvaluators}.java;
  * spec format/spec.md:284-335 types, :770-774 bounds, :1858 bound
  * single-point encoding, Appendix G).
  *
  * Values are WKB byte arrays (spec: Parquet/Avro/ORC all store WKB).
  * File statistics carry a bounding box: lower/upper bounds are single
  * points encoded as the concatenation of 8-byte little-endian IEEE 754
  * x and y (z/m omitted — we only track 2-D boxes, which is all the
  * intersects pruning consults).
  */
final case class GeoBox(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
  /** Geography boxes may wrap the antimeridian: xmin > xmax means the
    * box spans [xmin, 180] ∪ [-180, xmax] (spec format/spec.md:772). */
  def wrapsAntimeridian: Boolean = xmin > xmax
}

object GeoBox {
  /** The one intersection rule every evaluation site uses (function,
    * row evaluator, metrics pruning): planar per the spec's geometry
    * semantics, antimeridian-aware when the column is geography OR the
    * query box itself wraps (xmin > xmax — spec :772 defines that
    * encoding for geography; honoring it for an explicitly wrapped box
    * on geometry keeps every layer giving the same answer instead of
    * pruning disagreeing with the row function). Value/file boxes
    * computed from WKB min/max never wrap. */
  def intersects(a: GeoBox, query: GeoBox, geography: Boolean = false): Boolean =
    if (geography || query.wrapsAntimeridian || a.wrapsAntimeridian)
      intersectsGeography(a, query)
    else intersectsPlanar(a, query)

  /** Planar (geometry) intersection: plain range overlap on both axes
    * (reference GeospatialPredicateEvaluators.GeometryEvaluator). */
  def intersectsPlanar(a: GeoBox, b: GeoBox): Boolean =
    rangeOverlap(a.xmin, a.xmax, b.xmin, b.xmax) &&
      rangeOverlap(a.ymin, a.ymax, b.ymin, b.ymax)

  /** Geography intersection: Y is planar; X ranges may wrap the
    * antimeridian on either side (reference GeographyEvaluator). */
  def intersectsGeography(a: GeoBox, b: GeoBox): Boolean =
    rangeOverlap(a.ymin, a.ymax, b.ymin, b.ymax) && {
      (a.wrapsAntimeridian, b.wrapsAntimeridian) match {
        case (false, false) => rangeOverlap(a.xmin, a.xmax, b.xmin, b.xmax)
        // one wrapped: wrapped range is [min,180] ∪ [-180,max]
        case (true, false) => b.xmax >= a.xmin || b.xmin <= a.xmax
        case (false, true) => a.xmax >= b.xmin || a.xmin <= b.xmax
        // both wrapped ranges contain the antimeridian — always overlap
        case (true, true) => true
      }
    }

  private def rangeOverlap(min1: Double, max1: Double, min2: Double, max2: Double): Boolean =
    min1 <= max2 && min2 <= max1
}

/** Minimal WKB reader/writer: enough to encode points and to compute the
  * bounding box of any standard geometry kind (point, linestring,
  * polygon, multi*, collection; XY/XYZ/XYM/XYZM; either byte order;
  * ISO type offsets and EWKB dimension flags). */
object WKB {
  private val TypePoint = 1
  private val TypeLineString = 2
  private val TypePolygon = 3
  private val TypeMultiPoint = 4
  private val TypeMultiLineString = 5
  private val TypeMultiPolygon = 6
  private val TypeCollection = 7

  /** Encode an XY point as little-endian ISO WKB (21 bytes). */
  def encodePoint(x: Double, y: Double): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(TypePoint).putDouble(x).putDouble(y)
    buf.array()
  }

  /** Decode an XY(Z/M) WKB point to (x, y); None for other kinds. */
  def decodePoint(wkb: Array[Byte]): Option[(Double, Double)] =
    bbox(wkb).collect { case b if b.xmin == b.xmax && b.ymin == b.ymax => (b.xmin, b.ymin) }

  /** 2-D bounding box over every coordinate in the value. NaN coords
    * are skipped (spec :774); None when no finite X or Y exists (empty
    * geometry) or the bytes don't parse as WKB. */
  def bbox(wkb: Array[Byte]): Option[GeoBox] = {
    if (wkb == null || wkb.length < 5) return None
    val acc = Array(Double.PositiveInfinity, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NegativeInfinity)
    try {
      val buf = java.nio.ByteBuffer.wrap(wkb)
      readGeom(buf, acc, depth = 0)
      if (buf.hasRemaining) return None // trailing garbage: not WKB
    } catch { case _: RuntimeException => return None }
    if (acc(0).isInfinite || acc(1).isInfinite) None
    else Some(GeoBox(acc(0), acc(1), acc(2), acc(3)))
  }

  private def readGeom(buf: java.nio.ByteBuffer, acc: Array[Double], depth: Int): Unit = {
    // bound nesting: a crafted byte string of repeated collection
    // headers would otherwise recurse once per level and escape the
    // RuntimeException guard as a StackOverflowError
    if (depth > 32) throw new IllegalArgumentException("wkb nesting too deep")
    val order = buf.get() match {
      case 0 => java.nio.ByteOrder.BIG_ENDIAN
      case 1 => java.nio.ByteOrder.LITTLE_ENDIAN
      case b => throw new IllegalArgumentException(s"bad byte order: $b")
    }
    buf.order(order)
    val rawType = buf.getInt
    // EWKB flags: high bits mark Z/M/SRID; ISO adds 1000 (Z), 2000 (M)
    val hasSrid = (rawType & 0x20000000) != 0
    var dims = 2
    if ((rawType & 0x80000000) != 0) dims += 1 // EWKB Z
    if ((rawType & 0x40000000) != 0) dims += 1 // EWKB M
    val isoType = rawType & 0x0fffffff
    val kind = isoType % 1000
    val isoExtra = (isoType / 1000) match {
      case 0 => 0
      case 1 | 2 => 1 // ISO Z or M
      case 3 => 2     // ISO ZM
      case d => throw new IllegalArgumentException(s"bad wkb dims: $d")
    }
    dims += isoExtra
    if (hasSrid) buf.getInt // skip SRID
    def point(): Unit = {
      val x = buf.getDouble; val y = buf.getDouble
      var extra = dims - 2
      while (extra > 0) { buf.getDouble; extra -= 1 }
      if (!x.isNaN) { acc(0) = math.min(acc(0), x); acc(2) = math.max(acc(2), x) }
      if (!y.isNaN) { acc(1) = math.min(acc(1), y); acc(3) = math.max(acc(3), y) }
    }
    def ring(): Unit = { var n = buf.getInt; while (n > 0) { point(); n -= 1 } }
    kind match {
      case TypePoint      => point()
      case TypeLineString => ring()
      case TypePolygon    => var n = buf.getInt; while (n > 0) { ring(); n -= 1 }
      case TypeMultiPoint | TypeMultiLineString | TypeMultiPolygon | TypeCollection =>
        // each element is a full nested WKB value with its own header
        var n = buf.getInt
        while (n > 0) { readGeom(buf, acc, depth + 1); buf.order(order); n -= 1 }
      case k => throw new IllegalArgumentException(s"bad wkb kind: $k")
    }
  }
}

/** Single-point bound encoding for manifest lower/upper bounds
  * (spec format/spec.md:1858: x:y[:z[:m]] 8-byte little-endian). */
object GeoBounds {
  def encode(x: Double, y: Double): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putDouble(x).putDouble(y)
    buf.array()
  }

  /** (x, y) of a bound point; tolerates x:y:z and x:y:z:m encodings. */
  def decode(bytes: Array[Byte]): Option[(Double, Double)] =
    if (bytes == null || bytes.length < 16 || bytes.length % 8 != 0) None
    else {
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Some((buf.getDouble(0), buf.getDouble(8)))
    }

  /** File bbox from a column's lower/upper bound points. */
  def boxOf(lower: Option[Any], upper: Option[Any]): Option[GeoBox] =
    for {
      lo <- lower.collect { case b: Array[Byte] => b }.flatMap(decode)
      hi <- upper.collect { case b: Array[Byte] => b }.flatMap(decode)
    } yield GeoBox(lo._1, lo._2, hi._1, hi._2)
}
