package graft.core

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta.{Murmur128, Puffin, Theta, ThetaKmv}

/** NDV interop with the reference's `apache-datasketches-theta-v1`
  * statistics blobs (reference NDVSketchUtil; format/puffin-spec.md;
  * DataSketches compact theta wire format). Graft cannot link the
  * datasketches jar, but the estimate needs only the public preamble:
  * retained entries scaled by the sampling fraction theta. Vectors here
  * are hand-built per the published little-endian layout. */
class ThetaNdvSpec extends AnyFunSuite {

  /** compact theta sketch bytes: preLongs/serVer/family/flags preamble,
    * optional retained count and thetaLong, then the hash longs */
  private def sketch(preLongs: Int, flags: Int, retained: Int = 0,
      theta: Long = Long.MaxValue): Array[Byte] = {
    val bb = ByteBuffer.allocate(preLongs * 8 + retained * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(preLongs.toByte).put(3.toByte) // serVer 3
    bb.put(3.toByte)                      // family: compact
    bb.put(0.toByte).put(0.toByte)        // lgNomLongs / lgArrLongs
    bb.put(flags.toByte)
    bb.putShort(0x93cc.toShort)           // seed hash (default seed)
    if (preLongs >= 2) { bb.putInt(retained); bb.putInt(0) }
    if (preLongs >= 3) bb.putLong(theta)
    (0 until retained).foreach(i => bb.putLong(1000L + i)) // hashes
    bb.array()
  }

  private val CompactOrderedReadOnly = 0x02 | 0x08 | 0x10

  test("empty sketch estimates 0") {
    assert(Puffin.thetaEstimate(
      sketch(1, CompactOrderedReadOnly | 0x04)) === Some(0L))
  }

  test("single-item sketch estimates 1") {
    assert(Puffin.thetaEstimate(
      sketch(1, CompactOrderedReadOnly, retained = 1)) === Some(1L))
  }

  test("exact-mode sketch estimates its retained count") {
    assert(Puffin.thetaEstimate(
      sketch(2, CompactOrderedReadOnly, retained = 123)) === Some(123L))
  }

  test("estimating sketch scales retained by the theta fraction") {
    // theta = half of Long.MaxValue → estimate = 2 * retained
    val est = Puffin.thetaEstimate(
      sketch(3, CompactOrderedReadOnly, retained = 500, theta = Long.MaxValue / 2))
    assert(est.exists(e => math.abs(e - 1000L) <= 1), s"got $est")
  }

  test("garbage and short payloads decode to None, never throw") {
    assert(Puffin.thetaEstimate(Array.empty[Byte]).isEmpty)
    assert(Puffin.thetaEstimate(Array[Byte](9, 9, 9, 9, 9, 9, 9, 9)).isEmpty)
    assert(Puffin.thetaEstimate(
      sketch(3, CompactOrderedReadOnly, retained = 5, theta = -1L)).isEmpty)
  }

  test("ndvFromBlob: summary property wins, payload decodes otherwise") {
    // property short-circuit: no payload IO at all
    var read = 0
    val fromProp = Puffin.ndvFromBlob("apache-datasketches-theta-v1",
      Map("ndv" -> "42"), () => { read += 1; None })
    assert(fromProp === Some(42L) && read === 0)
    // theta payload decode
    assert(Puffin.ndvFromBlob("apache-datasketches-theta-v1", Map.empty,
      () => Some(sketch(2, CompactOrderedReadOnly, retained = 7))) === Some(7L))
    // graft payload decode
    assert(Puffin.ndvFromBlob("graft-ndv-v1", Map.empty,
      () => Some(Puffin.ndvPayload(11L))) === Some(11L))
    // unknown blob types skip gracefully (puffin-spec: readers ignore
    // unknown blobs)
    assert(Puffin.ndvFromBlob("someone-elses-sketch", Map.empty,
      () => Some(Array[Byte](1))) === None)
  }

  // ------------------------------------------------- write-side encoder

  test("murmur128 matches the DataSketches seed-hash constant") {
    // Util.computeSeedHash(9001) == 0x93CC is the independently known
    // constant this suite's hand-built read vectors already assumed;
    // deriving it from scratch cross-validates the murmur implementation
    assert(Theta.defaultSeedHash === 0x93cc.toShort)
    // murmur3 x64/128 of empty input with seed 0 is (0, 0)
    assert(Murmur128.hash(Array.empty[Byte], 0L) === ((0L, 0L)))
  }

  test("written sketches round-trip through the reader: empty/exact/estimating") {
    val empty = new ThetaKmv()
    assert(Puffin.thetaEstimate(empty.toCompactBytes) === Some(0L))

    // exact mode: <= nominal distinct values estimate exactly
    val exact = new ThetaKmv()
    (1 to 1000).foreach(i => exact.updateValue(
      graft.core.meta.SingleValue.toBytes(graft.core.types.GLong, i.toLong).get))
    // duplicates must not change the sketch
    (1 to 1000).foreach(i => exact.updateValue(
      graft.core.meta.SingleValue.toBytes(graft.core.types.GLong, i.toLong).get))
    val exactBytes = exact.toCompactBytes
    assert(Puffin.thetaEstimate(exactBytes) === Some(1000L))
    assert(exactBytes(0) === 2.toByte) // preLongs 2: exact compact form
    assert(exactBytes(1) === 3.toByte) // serVer 3
    assert(exactBytes(2) === 3.toByte) // family COMPACT
    assert((exactBytes(5) & 0x10) !== 0, "ordered flag")
    // retained hashes are strictly ascending (ordered-compact contract)
    val bb = java.nio.ByteBuffer.wrap(exactBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val retained = bb.getInt(8)
    assert(retained === 1000)
    val hs = (0 until retained).map(i => bb.getLong(16 + i * 8))
    assert(hs === hs.sorted && hs.distinct.size === hs.size)
    assert(hs.forall(_ > 0L))

    // estimating mode: 100k distinct at nominal 4096 → within 5%
    val est = new ThetaKmv()
    (1 to 100000).foreach(i => est.updateValue(
      graft.core.meta.SingleValue.toBytes(graft.core.types.GLong, i.toLong).get))
    val e = Puffin.thetaEstimate(est.toCompactBytes).get
    assert(math.abs(e - 100000L) < 5000, s"estimate $e too far from 100000")
    assert(est.toCompactBytes.head === 3.toByte) // preLongs 3: has theta
  }

  test("merge order does not change the sketch; internal codec is lossless") {
    def bytes(i: Int) =
      graft.core.meta.SingleValue.toBytes(graft.core.types.GLong, i.toLong).get
    val whole = new ThetaKmv()
    (1 to 20000).foreach(i => whole.updateValue(bytes(i)))
    val a = new ThetaKmv(); val b = new ThetaKmv()
    (1 to 20000).foreach(i => (if (i % 2 == 0) a else b).updateValue(bytes(i)))
    val roundTripped = ThetaKmv.fromInternalBytes(a.toInternalBytes)
    roundTripped.merge(ThetaKmv.fromInternalBytes(b.toInternalBytes))
    assert(roundTripped.toCompactBytes.toSeq === whole.toCompactBytes.toSeq,
      "split + internal-codec round-trip + merge must equal the one-shot sketch")
  }

  test("value hashing matches the reference's item preparation") {
    import graft.core.types._
    // empty strings are rejected exactly like DataSketches update("")
    val k = new ThetaKmv()
    k.updateValue(graft.core.meta.SingleValue.toBytes(GString, "").get)
    assert(k.size === 0)
    // a string and its UTF-8 bytes hash identically (both reach the
    // sketch as the same Appendix-D byte string)
    val s = Theta.coordinate(
      graft.core.meta.SingleValue.toBytes(GString, "abc").get)
    val b = Theta.coordinate(
      graft.core.meta.SingleValue.toBytes(GBinary, "abc".getBytes("UTF-8")).get)
    assert(s === b && s.nonEmpty)
    // int and long of the same value hash DIFFERENTLY (4 vs 8 bytes —
    // Appendix D is width-preserving, like Conversions.toByteBuffer)
    val i4 = Theta.coordinate(graft.core.meta.SingleValue.toBytes(GInt, 7).get)
    val l8 = Theta.coordinate(graft.core.meta.SingleValue.toBytes(GLong, 7L).get)
    assert(i4 !== l8)
  }
}
