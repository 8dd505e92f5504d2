package graft.core.meta

import java.nio.{ByteBuffer, ByteOrder}

/** Write-side `apache-datasketches-theta-v1` support: a compact ordered
  * Theta sketch encoder whose output a genuine DataSketches reader
  * (`CompactSketch.wrap`/`heapify`) parses — closing the interop
  * asymmetry where graft READ theta blobs (Puffin.thetaEstimate) but
  * wrote only graft-ndv-v1 (reference
  * spark/.../actions/NDVSketchUtil.java, format/puffin-spec.md).
  *
  * The wire format is public (DataSketches compact theta, serVer 3,
  * little-endian): preamble byte 0 = preamble longs, 1 = ser version,
  * 2 = family (3 = COMPACT), 5 = flags, 6-7 = seed hash; preLongs >= 2
  * adds the retained-entry count; preLongs == 3 adds thetaLong; then
  * the retained hash longs in ascending order.
  *
  * Items hash exactly as the reference's ThetaSketchAgg feeds them:
  * Iceberg Appendix-D single-value bytes ([[SingleValue.toBytes]])
  * through MurmurHash3 x64/128 with the DataSketches default update
  * seed 9001, coordinate = hash[0] >>> 1 — so a union of a
  * graft-written sketch with a reference-written sketch over the same
  * data dedups correctly, not just parses.
  *
  * The accumulator is KMV ("K minimum values", the theta sketch
  * framework's simplest member): keep the `nominal + 1` smallest
  * distinct coordinates; at or under `nominal` distinct values the
  * sketch is exact, above it theta becomes the (nominal+1)-th smallest
  * and the estimate scales retained by the sampling fraction. Bounded
  * memory (~32 KB per column at the default 4096), map-side partial
  * aggregation, tiny merge payloads — the shape that lets one pass
  * compute NDV for every column of a 100 TB table.
  */
object Theta {
  /** DataSketches default update seed */
  val DefaultSeed = 9001L
  /** DataSketches default nominal entries (lgK = 12) */
  val DefaultNominal = 4096

  // flags byte bits (DataSketches PreambleUtil)
  private val ReadOnly = 0x02
  private val Empty = 0x04
  private val Compact = 0x08
  private val Ordered = 0x10

  /** low 16 bits of murmur(seed), the preamble's seed-integrity check
    * (DataSketches Util.computeSeedHash; 0x93CC for the default seed) */
  lazy val defaultSeedHash: Short = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(DefaultSeed).array()
    val h = (Murmur128.hash(b, 0L)._1 & 0xffffL).toShort
    require(h != 0, "seed hash must be nonzero")
    h
  }

  /** theta coordinate of an Appendix-D-encoded value: murmur128 with the
    * update seed, first lane, top bit cleared. None for the inputs
    * DataSketches itself rejects (empty byte strings, the 2^-63 zero
    * hash) so graft and reference sketches count identical item sets. */
  def coordinate(valueBytes: Array[Byte]): Option[Long] = {
    if (valueBytes.isEmpty) return None
    val c = Murmur128.hash(valueBytes, DefaultSeed)._1 >>> 1
    if (c == 0L) None else Some(c)
  }

  /** serialize a compact ordered sketch from the KMV state: `coords`
    * ascending distinct, at most nominal+1 entries */
  def compactBytes(coords: Array[Long], nominal: Int): Array[Byte] = {
    val n = coords.length
    if (n == 0) {
      // empty sketch: single preamble long with the EMPTY flag
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte).put(3.toByte).put(3.toByte).put(0.toByte).put(0.toByte)
      bb.put((ReadOnly | Empty | Compact | Ordered).toByte)
      bb.putShort(defaultSeedHash)
      bb.array()
    } else if (n <= nominal) {
      // exact mode: theta implied Long.MaxValue, all coords retained
      val bb = ByteBuffer.allocate(16 + n * 8).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(2.toByte).put(3.toByte).put(3.toByte).put(0.toByte).put(0.toByte)
      bb.put((ReadOnly | Compact | Ordered).toByte)
      bb.putShort(defaultSeedHash)
      // bytes 12-15 carry the sampling probability p as a float;
      // DataSketches serializes 1.0f there (no sampling) and some
      // heapify paths read it back
      bb.putInt(n).putFloat(1.0f)
      coords.foreach(bb.putLong)
      bb.array()
    } else {
      // estimating: theta = (nominal+1)-th smallest, retain those below
      val theta = coords(nominal)
      val bb = ByteBuffer.allocate(24 + nominal * 8).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(3.toByte).put(3.toByte).put(3.toByte).put(0.toByte).put(0.toByte)
      bb.put((ReadOnly | Compact | Ordered).toByte)
      bb.putShort(defaultSeedHash)
      bb.putInt(nominal).putFloat(1.0f) // p = 1.0f, as DataSketches writes
      bb.putLong(theta)
      var i = 0
      while (i < nominal) { bb.putLong(coords(i)); i += 1 }
      bb.array()
    }
  }
}

/** Bounded KMV accumulator over theta coordinates. Not thread-safe (one
  * instance per aggregation buffer). */
final class ThetaKmv(val nominal: Int = Theta.DefaultNominal)
    extends Serializable {
  // ordered distinct set of the smallest coordinates, capped nominal+1
  private val set = new java.util.TreeSet[java.lang.Long]()

  def update(coord: Long): Unit =
    if (set.size <= nominal) { set.add(coord); () }
    else if (coord < set.last()) {
      if (set.add(coord) && set.size > nominal + 1) { set.pollLast(); () }
    }

  def updateValue(valueBytes: Array[Byte]): Unit =
    Theta.coordinate(valueBytes).foreach(update)

  def merge(other: ThetaKmv): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) update(it.next())
  }

  def size: Int = set.size

  def estimate: Long = {
    val n = set.size
    if (n <= nominal) n.toLong
    else math.round(
      nominal.toDouble * (Long.MaxValue.toDouble / set.last().doubleValue()))
  }

  /** DataSketches-readable compact ordered sketch bytes */
  def toCompactBytes: Array[Byte] = {
    val arr = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    Theta.compactBytes(arr, nominal)
  }

  /** internal shuffle codec: nominal + count + raw ascending coords
    * (lossless for the KMV state, unlike the compact form which drops
    * the (nominal+1)-th coordinate into theta) */
  def toInternalBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + set.size * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(nominal).putInt(set.size)
    val it = set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
}

object ThetaKmv {
  def fromInternalBytes(b: Array[Byte]): ThetaKmv = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val kmv = new ThetaKmv(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { kmv.update(bb.getLong()); i += 1 }
    kmv
  }
}

/** MurmurHash3 x64/128 (Austin Appleby's public-domain algorithm; the
  * variant the DataSketches library uses for all item hashing). Returns
  * both 128-bit lanes; theta sketches use lane 1. */
object Murmur128 {
  private val C1 = 0x87c37b91114253d5L
  private val C2 = 0x4cf5ad432745937fL

  private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  private def fmix(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }

  def hash(data: Array[Byte], seed: Long): (Long, Long) = {
    val len = data.length
    var h1 = seed
    var h2 = seed
    val nblocks = len / 16
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nblocks) {
      var k1 = bb.getLong(i * 16)
      var k2 = bb.getLong(i * 16 + 8)
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    val tail = nblocks * 16
    val rem = len - tail
    var k1 = 0L
    var k2 = 0L
    if (rem > 8) {
      var j = rem - 1
      while (j >= 8) { k2 ^= (data(tail + j) & 0xffL) << ((j - 8) * 8); j -= 1 }
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem > 0) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 ^= (data(tail + j) & 0xffL) << (j * 8); j -= 1 }
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
    }
    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }
}
