package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta.DVIO

/** Deletion-vector container: spec-shaped Puffin `deletion-vector-v1`
  * (format/puffin-spec.md) round-trip, integrity and footer shape. */
class DVSpec extends AnyFunSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft-dv").resolve("d.dv").toString

  test("puffin DV round-trips positions and referenced data file") {
    val path = tmp()
    val positions = Seq(0L, 1L, 7L, 1000L, (1L << 33) + 5) // force a 64-bit key
    val n = DVIO.write(path, "/wh/db/t/data/f1.parquet", positions.iterator)
    assert(n === positions.length)
    val (ref, bm) = DVIO.read(path)
    assert(ref === "/wh/db/t/data/f1.parquet")
    assert(positions.forall(bm.contains))
    assert(bm.getLongCardinality === positions.length)
  }

  test("container is a Puffin file: PFA1 magic + footer with cardinality") {
    val path = tmp()
    DVIO.write(path, "/wh/db/t/data/f2.parquet", Iterator(3L, 4L))
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    assert(bytes.slice(0, 4).toSeq === Seq[Byte](0x50, 0x46, 0x41, 0x31))
    assert(bytes.slice(bytes.length - 4, bytes.length).toSeq ===
      Seq[Byte](0x50, 0x46, 0x41, 0x31))
    val text = new String(bytes, "ISO-8859-1")
    assert(text.contains("deletion-vector-v1"))
    assert(text.contains("\"cardinality\":\"2\""))
    assert(text.contains("referenced-data-file"))
    // blob magic D1 D3 39 64 right after the 4-byte puffin magic + 4-byte
    // big-endian length prefix
    assert(bytes.slice(8, 12).toSeq ===
      Seq(0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte))
  }

  test("bit-flip in the vector fails the CRC check") {
    val path = tmp()
    DVIO.write(path, "/wh/db/t/data/f3.parquet", Iterator(1L, 2L, 3L))
    val p = java.nio.file.Paths.get(path)
    val bytes = Files.readAllBytes(p)
    bytes(14) = (bytes(14) ^ 0x40).toByte // inside the serialized bitmap
    Files.write(p, bytes)
    val e = intercept[Exception](DVIO.read(path))
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("mismatch"))
  }

  test("seeded random round-trips across position regimes") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(5000)
      // mixed regimes: dense small, sparse mid, above-2^32 (multi-key
      // portable serialization), run-heavy blocks
      val positions = (Seq.fill(n)(rnd.nextInt(1 << 20).toLong) ++
        Seq.fill(n / 4)((1L << 32) + rnd.nextInt(1 << 16)) ++
        (0L until rnd.nextInt(64).toLong)).distinct
      val path = tmp()
      val card = DVIO.write(path, s"/wh/t/data/f$trial.parquet",
        positions.iterator)
      assert(card === positions.size)
      val (ref, bm) = DVIO.read(path)
      assert(ref === s"/wh/t/data/f$trial.parquet")
      assert(bm.getLongCardinality === positions.size, s"trial $trial")
      assert(positions.forall(bm.contains), s"trial $trial")
    }
  }

  test("legacy GDV1 containers still read") {
    // hand-write the old container: GDV1 | pathLen | path | Roaring64Bitmap
    val path = tmp()
    val bm = new org.roaringbitmap.longlong.Roaring64Bitmap
    Seq(5L, 6L).foreach(bm.addLong)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(0x47445631)
    val pb = "/wh/db/t/data/old.parquet".getBytes("UTF-8")
    out.writeInt(pb.length); out.write(pb)
    bm.serialize(out); out.close()
    Files.write(java.nio.file.Paths.get(path), bos.toByteArray)
    val (ref, got) = DVIO.read(path)
    assert(ref === "/wh/db/t/data/old.parquet")
    assert(got.contains(5L) && got.contains(6L) && got.getLongCardinality === 2)
  }
}
