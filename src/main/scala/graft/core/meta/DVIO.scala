package graft.core.meta

import java.io.{ByteArrayInputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.roaringbitmap.longlong.Roaring64Bitmap

/** Deletion-vector files (reference format/spec.md v3 deletion vectors +
  * RoaringPositionBitmap): one bitmap of deleted row positions per data
  * file, serialized as a Roaring bitmap. Deliberate idiomatic deviation
  * from the reference: a standalone `.dv` container per data file
  * (magic, referenced data-file path, portable Roaring64 bytes) instead
  * of puffin blobs — the container format is behind this object, so a
  * puffin writer is a drop-in replacement. Unlike spec v3's exactly-one-
  * DV-per-file rule, DVs may stack like position-delete files; readers
  * union all masks, and rewrite_position_deletes re-compacts them.
  *
  * Encrypted tables wrap the container in AES GCM Stream (AGS1,
  * gcm-stream-spec.md — the reference encrypts DV/puffin content the
  * same way) under a per-file key DERIVED from the table key
  * (TableCrypto.derivedFileKey).
  */
object DVIO {
  private val Magic = 0x47445631 // "GDV1"

  def write(path: String, dataFilePath: String, positions: Iterator[Long],
      crypto: Option[TableCrypto] = None): Long = {
    val bm = new Roaring64Bitmap
    positions.foreach(bm.addLong)
    bm.runOptimize()
    val bos = new java.io.ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    val pathBytes = dataFilePath.getBytes(StandardCharsets.UTF_8)
    out.writeInt(pathBytes.length)
    out.write(pathBytes)
    bm.serialize(out)
    out.close()
    val plain = bos.toByteArray
    val p = GraftIO.toPath(path)
    Files.createDirectories(p.getParent)
    Files.write(p, crypto match {
      case Some(tc) =>
        val (dek, aad) = tc.derivedFileKey(path)
        AesGcm.encryptStream(plain, dek, aad)
      case None => plain
    })
    bm.getLongCardinality
  }

  /** (referenced data-file path, deleted positions) */
  def read(path: String, crypto: Option[TableCrypto] = None): (String, Roaring64Bitmap) = {
    val raw = Files.readAllBytes(GraftIO.toPath(path))
    val bytes =
      if (AesGcm.isEncrypted(raw)) {
        val tc = crypto.orElse(CryptoRegistry.forContentPath(path)).getOrElse(
          throw new IllegalStateException(
            s"$path is an encrypted DV but no table key is available"))
        val (dek, aad) = tc.derivedFileKey(path)
        AesGcm.decryptStream(raw, dek, aad)
      } else raw
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    try {
      require(in.readInt() == Magic, s"not a graft DV file: $path")
      val len = in.readInt()
      val nameBytes = new Array[Byte](len)
      in.readFully(nameBytes)
      val bm = new Roaring64Bitmap
      bm.deserialize(in)
      (new String(nameBytes, StandardCharsets.UTF_8), bm)
    } finally in.close()
  }

  def isDV(path: String): Boolean = path.endsWith(".dv")

  /** positions as (dataPath -> java HashSet) for the executor cache */
  def readAsSets(path: String,
      crypto: Option[TableCrypto] = None): Map[String, java.util.HashSet[Long]] = {
    val (dataPath, bm) = read(path, crypto)
    val set = new java.util.HashSet[Long](math.min(bm.getLongCardinality, 1 << 20).toInt)
    bm.forEach((l: Long) => { set.add(l); () })
    Map(dataPath -> set)
  }
}
