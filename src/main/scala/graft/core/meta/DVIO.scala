package graft.core.meta

import java.io.{DataInputStream, DataOutputStream}
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
  */
object DVIO {
  private val Magic = 0x47445631 // "GDV1"

  def write(path: String, dataFilePath: String, positions: Iterator[Long]): Long = {
    val bm = new Roaring64Bitmap
    var n = 0L
    positions.foreach { p => bm.addLong(p); n += 1 }
    bm.runOptimize()
    val p = GraftIO.toPath(path)
    Files.createDirectories(p.getParent)
    val out = new DataOutputStream(
      new java.io.BufferedOutputStream(Files.newOutputStream(p)))
    try {
      out.writeInt(Magic)
      val pathBytes = dataFilePath.getBytes(StandardCharsets.UTF_8)
      out.writeInt(pathBytes.length)
      out.write(pathBytes)
      bm.serialize(out)
    } finally out.close()
    bm.getLongCardinality
  }

  /** (referenced data-file path, deleted positions) */
  def read(path: String): (String, Roaring64Bitmap) = {
    val in = new DataInputStream(
      new java.io.BufferedInputStream(Files.newInputStream(GraftIO.toPath(path))))
    try {
      require(in.readInt() == Magic, s"not a graft DV file: $path")
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val bm = new Roaring64Bitmap
      bm.deserialize(in)
      (new String(bytes, StandardCharsets.UTF_8), bm)
    } finally in.close()
  }

  def isDV(path: String): Boolean = path.endsWith(".dv")

  /** positions as (dataPath -> java HashSet) for the executor cache */
  def readAsSets(path: String): Map[String, java.util.HashSet[Long]] = {
    val (dataPath, bm) = read(path)
    val set = new java.util.HashSet[Long](math.min(bm.getLongCardinality, 1 << 20).toInt)
    bm.forEach((l: Long) => { set.add(l); () })
    Map(dataPath -> set)
  }
}
