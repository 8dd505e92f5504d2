package graft.core

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta.Puffin

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
}
