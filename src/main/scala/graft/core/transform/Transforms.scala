package graft.core.transform

import java.time.temporal.ChronoUnit
import java.time.{Instant, LocalDate, ZoneOffset}

import graft.core.types._

/** 32-bit Murmur3 (x86 variant, seed 0) per format/spec.md Appendix B.
  * Re-implemented from the public algorithm description; test vectors
  * from the spec table (34→2017239379, "iceberg"→1210000089, ...).
  */
object Murmur3 {
  private val C1 = 0xcc9e2d51
  private val C2 = 0x1b873593

  private def mixK1(k1in: Int): Int = {
    var k1 = k1in
    k1 *= C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 *= C2
    k1
  }
  private def mixH1(h1in: Int, k1: Int): Int = {
    var h1 = h1in ^ k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 * 5 + 0xe6546b64
  }
  private def fmix(h1in: Int, len: Int): Int = {
    var h1 = h1in ^ len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  def hashBytes(data: Array[Byte]): Int = {
    val nblocks = data.length / 4
    var h1 = 0
    var i = 0
    while (i < nblocks) {
      val base = i * 4
      val k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      h1 = mixH1(h1, mixK1(k1))
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    (data.length & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ =>
    }
    if ((data.length & 3) != 0) h1 ^= mixK1(k1)
    fmix(h1, data.length)
  }

  /** hash of the 8 little-endian bytes of v (two-block fast path). */
  def hashLong(v: Long): Int = {
    val low = (v & 0xffffffffL).toInt
    val high = ((v >>> 32) & 0xffffffffL).toInt
    var h1 = mixH1(0, mixK1(low))
    h1 = mixH1(h1, mixK1(high))
    fmix(h1, 8)
  }

  def hashInt(v: Int): Int = hashLong(v.toLong)
}

/** Partition transforms (format/spec.md:577-621; reference
  * api/.../transforms/). Exactness matters: a mismatched bucket hash or
  * epoch ordinal silently breaks partition pruning.
  */
sealed trait Transform {
  def name: String
  /** result type of the transform given the source type */
  def resultType(src: GType): GType
  /** apply to an internal-representation value (null → null) */
  def apply(value: Any, src: GType): Any
  /** Can this transform be applied to this source type? */
  def canTransform(src: GType): Boolean
  /** Order-preserving (monotonic non-decreasing) transform? */
  def preservesOrder: Boolean = false
}

case object IdentityT extends Transform {
  val name = "identity"
  def resultType(src: GType): GType = src
  def apply(v: Any, src: GType): Any = v
  def canTransform(src: GType) = src.isPrimitive
  override def preservesOrder = true
}

final case class BucketT(n: Int) extends Transform {
  require(n > 0, "bucket count must be > 0")
  val name = s"bucket[$n]"
  def resultType(src: GType): GType = GInt
  def canTransform(src: GType): Boolean = src match {
    case GInt | GLong | GDate | GString | GBinary | GTimestamp(_) |
         GTimestampNs(_) | GDecimal(_, _) => true
    case _ => false
  }
  def hash(v: Any, src: GType): Int = src match {
    case GInt | GDate     => Murmur3.hashLong(TypeComparators.anyToInt(v).toLong)
    // ns timestamps hash their raw long representation (nanos), matching
    // the long-hash convention of the other epoch-long types
    case GLong | GTimestamp(_) | GTimestampNs(_) =>
      Murmur3.hashLong(TypeComparators.anyToLong(v))
    case GString          => Murmur3.hashBytes(v.asInstanceOf[String].getBytes("UTF-8"))
    case GBinary          => Murmur3.hashBytes(v.asInstanceOf[Array[Byte]])
    case GDecimal(_, _) =>
      Murmur3.hashBytes(v.asInstanceOf[java.math.BigDecimal].unscaledValue.toByteArray)
    case other => throw new IllegalArgumentException(s"cannot bucket: $other")
  }
  def apply(v: Any, src: GType): Any =
    if (v == null) null else (hash(v, src) & Integer.MAX_VALUE) % n
}

final case class TruncateT(w: Int) extends Transform {
  require(w > 0, "truncate width must be > 0")
  val name = s"truncate[$w]"
  def resultType(src: GType): GType = src
  def canTransform(src: GType): Boolean = src match {
    case GInt | GLong | GString | GBinary | GDecimal(_, _) => true
    case _ => false
  }
  override def preservesOrder = true
  def apply(v: Any, src: GType): Any =
    if (v == null) null
    else src match {
      case GInt =>
        val i = v.asInstanceOf[Int]
        i - (((i % w) + w) % w)
      case GLong =>
        val l = v.asInstanceOf[Long]
        l - (((l % w) + w) % w)
      case GString =>
        val s = v.asInstanceOf[String]
        // truncate to w code points, keeping surrogate pairs intact
        if (s.codePointCount(0, s.length) <= w) s
        else s.substring(0, s.offsetByCodePoints(0, w))
      case GBinary =>
        val b = v.asInstanceOf[Array[Byte]]
        if (b.length <= w) b else java.util.Arrays.copyOf(b, w)
      case GDecimal(_, scale) =>
        val d = v.asInstanceOf[java.math.BigDecimal]
        val unscaledW = java.math.BigInteger.valueOf(w.toLong)
        val rem = d.unscaledValue.mod(unscaledW) // BigInteger.mod is non-negative
        new java.math.BigDecimal(d.unscaledValue.subtract(rem), scale)
      case other => throw new IllegalArgumentException(s"cannot truncate: $other")
    }
}

/** Time transforms: epoch ordinals (years/months/days/hours since 1970). */
sealed abstract class TimeT(val name: String, val unit: ChronoUnit) extends Transform {
  def resultType(src: GType): GType = if (this == DayT) GDate else GInt
  def canTransform(src: GType): Boolean = src match {
    case GDate          => this != HourT
    case GTimestamp(_)    => true
    case GTimestampNs(_)  => true
    case _                => false
  }
  override def preservesOrder = true

  private val epochDate = LocalDate.of(1970, 1, 1)

  /** Calendar ordinal since epoch; pre-epoch days land on the ordinal of
    * the calendar unit they fall in (reference DateTimeUtil.convertDays:
    * negative days are shifted +1 then decremented). */
  private def convertDays(days: Int, granularity: ChronoUnit): Int =
    if (days >= 0) granularity.between(epochDate, epochDate.plusDays(days.toLong)).toInt
    else granularity.between(epochDate, epochDate.plusDays(days.toLong + 1)).toInt - 1

  def apply(v: Any, src: GType): Any =
    if (v == null) null
    else src match {
      case GDate =>
        val days = TypeComparators.anyToInt(v)
        unit match {
          case ChronoUnit.YEARS | ChronoUnit.MONTHS => convertDays(days, unit)
          case ChronoUnit.DAYS                      => days
          case other => throw new IllegalArgumentException(s"$other on date")
        }
      case GTimestamp(_) | GTimestampNs(_) =>
        val micros = src match {
          case GTimestampNs(_) => Math.floorDiv(TypeComparators.anyToLong(v), 1000L)
          case _               => TypeComparators.anyToLong(v)
        }
        // floorDiv keeps pre-1970 values on the correct ordinal
        val days = Math.floorDiv(micros, 86400000000L).toInt
        unit match {
          case ChronoUnit.HOURS => Math.floorDiv(micros, 3600000000L).toInt
          case ChronoUnit.DAYS  => days
          case ChronoUnit.YEARS | ChronoUnit.MONTHS => convertDays(days, unit)
          case other => throw new IllegalArgumentException(s"$other on timestamp")
        }
      case other => throw new IllegalArgumentException(s"cannot $name: $other")
    }
}
case object YearT extends TimeT("year", ChronoUnit.YEARS)
case object MonthT extends TimeT("month", ChronoUnit.MONTHS)
case object DayT extends TimeT("day", ChronoUnit.DAYS)
case object HourT extends TimeT("hour", ChronoUnit.HOURS)

case object VoidT extends Transform {
  val name = "void"
  def resultType(src: GType): GType = src
  def apply(v: Any, src: GType): Any = null
  def canTransform(src: GType) = true
}

object Transform {
  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r
  def fromName(s: String): Transform = s match {
    case "identity"    => IdentityT
    case "year"        => YearT
    case "month"       => MonthT
    case "day"         => DayT
    case "hour"        => HourT
    case "void"        => VoidT
    case BucketRe(n)   => BucketT(n.toInt)
    case TruncateRe(w) => TruncateT(w.toInt)
    case other         => throw new IllegalArgumentException(s"unknown transform: $other")
  }
}
