package graft.core.meta

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Puffin statistics file format (reference format/puffin-spec.md +
  * core/.../puffin/): a binary container of statistics blobs with a
  * JSON footer describing each blob's type, covered field ids, snapshot
  * and byte range. Layout:
  *
  *   Magic  Blob1 ... BlobN  Magic  FooterPayload(JSON)
  *   FooterPayloadSize(i32 LE)  Flags(i32)  Magic
  *
  * Blob payloads here are graft-defined ("graft-ndv-v1" = 8-byte LE long
  * distinct-count, the role the reference fills with
  * apache-datasketches-theta-v1 sketches — no datasketches jar on this
  * classpath, so the sketch itself is replaced by the exact/approximate
  * NDV the engine computed).
  */
object Puffin {
  private val Magic = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"

  final case class Blob(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      payload: Array[Byte],
      properties: Map[String, String] = Map.empty)

  /** Writes the container; returns (file size, footer size) — the footer
    * region spans its leading Magic through the trailing Magic (reference
    * PuffinWriter.footerSize), which statistics-file entries must record. */
  def write(path: String, blobs: Seq[Blob],
      fileProperties: Map[String, String] = Map.empty,
      crypto: Option[TableCrypto] = None): (Long, Long) = {
    val out = new ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    d.write(Magic)
    val located = blobs.map { b =>
      val offset = out.size().toLong
      d.write(b.payload)
      (b, offset)
    }
    // footer: Magic + JSON payload + size + flags + Magic
    d.write(Magic)
    val fo = MetaJson.mapper.createObjectNode()
    val arr = fo.putArray("blobs")
    located.foreach { case (b, off) =>
      val bo = arr.addObject()
      bo.put("type", b.blobType)
      val fs = bo.putArray("fields")
      b.fields.foreach(fs.add)
      bo.put("snapshot-id", b.snapshotId)
        .put("sequence-number", b.sequenceNumber)
        .put("offset", off)
        .put("length", b.payload.length.toLong)
      if (b.properties.nonEmpty) {
        val p = bo.putObject("properties")
        b.properties.foreach { case (k, v) => p.put(k, v) }
      }
    }
    if (fileProperties.nonEmpty) {
      val p = fo.putObject("properties")
      fileProperties.foreach { case (k, v) => p.put(k, v) }
    }
    val footer = MetaJson.mapper.writeValueAsString(fo).getBytes(StandardCharsets.UTF_8)
    d.write(footer)
    val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    tail.putInt(footer.length)
    tail.putInt(0) // flags: footer not compressed
    d.write(tail.array())
    d.write(Magic)
    d.flush()
    val p = GraftIO.toPath(path)
    Files.createDirectories(p.getParent)
    // encrypted tables: the whole container is AES GCM Stream under a
    // derived per-file key (reference encrypts puffin like any metadata
    // content file — min/max sketches are as sensitive as the data)
    val bytes = crypto match {
      case Some(tc) =>
        val (dek, aad) = tc.derivedFileKey(path)
        AesGcm.encryptStream(out.toByteArray, dek, aad)
      case None => out.toByteArray
    }
    Files.write(p, bytes)
    // Magic(4) + footer JSON + payload-size(4) + flags(4) + Magic(4)
    (bytes.length.toLong, footer.length.toLong + 16L)
  }

  def read(path: String, crypto: Option[TableCrypto] = None): Seq[Blob] = {
    // encrypted stats file: decrypt whole (blob offsets address the
    // PLAINTEXT layout); plaintext keeps the ranged channel path so
    // multi-GB unencrypted stats never fully materialize
    val head = {
      val ch0 = Files.newByteChannel(GraftIO.toPath(path))
      try {
        val b = ByteBuffer.allocate(4)
        while (b.hasRemaining && ch0.read(b) >= 0) {}
        b.array()
      } finally ch0.close()
    }
    if (AesGcm.isEncrypted(head)) {
      val tc = crypto.orElse(CryptoRegistry.forPath(path)).getOrElse(
        throw new IllegalStateException(
          s"$path is an encrypted statistics file but no table key is available"))
      val (dek, aad) = tc.derivedFileKey(path)
      val plain = AesGcm.decryptStream(
        Files.readAllBytes(GraftIO.toPath(path)), dek, aad)
      readChannel(path, new InMemoryChannel(plain))
    } else readChannel(path, Files.newByteChannel(GraftIO.toPath(path)))
  }

  /** minimal read-only seekable channel over a byte array */
  private final class InMemoryChannel(bytes: Array[Byte])
    extends java.nio.channels.SeekableByteChannel {
    private var pos = 0L
    private var open = true
    override def read(dst: ByteBuffer): Int = {
      if (pos >= bytes.length) return -1
      val n = math.min(dst.remaining(), (bytes.length - pos).toInt)
      dst.put(bytes, pos.toInt, n); pos += n; n
    }
    override def write(src: ByteBuffer): Int =
      throw new UnsupportedOperationException
    override def position(): Long = pos
    override def position(newPosition: Long): java.nio.channels.SeekableByteChannel = {
      pos = newPosition; this
    }
    override def size(): Long = bytes.length.toLong
    override def truncate(size: Long): java.nio.channels.SeekableByteChannel =
      throw new UnsupportedOperationException
    override def isOpen: Boolean = open
    override def close(): Unit = open = false
  }

  /** file-level footer properties (e.g. created-by) — blob payloads are
    * not touched. */
  def readFileProperties(path: String): Map[String, String] = {
    val bytes = Files.readAllBytes(GraftIO.toPath(path))
    val n = bytes.length
    require(n > 20, s"not a puffin file: $path")
    val tail = ByteBuffer.wrap(bytes, n - 12, 8).order(ByteOrder.LITTLE_ENDIAN)
    val footerLen = tail.getInt()
    val footer = MetaJson.mapper.readTree(
      new String(bytes, n - 12 - footerLen, footerLen, StandardCharsets.UTF_8))
    val out = Map.newBuilder[String, String]
    Option(footer.get("properties")).foreach(_.fields().forEachRemaining(e =>
      out += e.getKey -> e.getValue.asText()))
    out.result()
  }

  private def readChannel(path: String,
      ch0: java.nio.channels.SeekableByteChannel): Seq[Blob] = {
    // ranged channel reads with LONG blob offsets: statistics files can
    // exceed 2 GB (many wide tables / sketch payloads), so neither the
    // whole file nor blob offsets may pass through an Int
    val ch = ch0
    try {
      val fileLen = ch.size()
      def readAt(off: Long, len: Int): Array[Byte] = {
        val buf = ByteBuffer.allocate(len)
        ch.position(off)
        while (buf.hasRemaining && ch.read(buf) >= 0) {}
        require(!buf.hasRemaining, s"truncated puffin file: $path")
        buf.array()
      }
      require(fileLen > 20 && sliceEq(readAt(0, 4), 0, Magic) &&
        sliceEq(readAt(fileLen - 4, 4), 0, Magic), s"not a puffin file: $path")
      val tail = ByteBuffer.wrap(readAt(fileLen - 12, 8)).order(ByteOrder.LITTLE_ENDIAN)
      val footerLen = tail.getInt()
      val flags = tail.getInt()
      require((flags & 1) == 0, "compressed puffin footers not supported")
      val footer = new String(readAt(fileLen - 12L - footerLen, footerLen),
        StandardCharsets.UTF_8)
      val n = MetaJson.mapper.readTree(footer)
      val out = Seq.newBuilder[Blob]
      n.get("blobs").elements().forEachRemaining { bo =>
        val fields = Seq.newBuilder[Int]
        bo.get("fields").elements().forEachRemaining(f => fields += f.asInt())
        val off = bo.get("offset").asLong()
        // a single in-memory payload is Array[Byte]-bound; fail loudly
        // rather than wrap if one blob ever exceeds 2 GB
        val len = Math.toIntExact(bo.get("length").asLong())
        val props = Map.newBuilder[String, String]
        Option(bo.get("properties")).foreach(_.fields().forEachRemaining(e =>
          props += e.getKey -> e.getValue.asText()))
        // puffin-spec compression-codec: absent = uncompressed; the
        // reference writes zstd-compressed sketch blobs, which must be
        // decompressed here — returning the raw frame would silently
        // corrupt NDV stats read from reference-written files
        val raw = readAt(off, len)
        val payload = Option(bo.get("compression-codec")).map(_.asText()) match {
          case None => raw
          case Some("zstd") =>
            val zin = new com.github.luben.zstd.ZstdInputStream(
              new java.io.ByteArrayInputStream(raw))
            try zin.readAllBytes() finally zin.close()
          case Some(other) =>
            throw new IllegalArgumentException(
              s"unsupported puffin blob compression-codec '$other' in $path")
        }
        out += Blob(bo.get("type").asText(), fields.result(),
          bo.get("snapshot-id").asLong(), bo.get("sequence-number").asLong(),
          payload, props.result())
      }
      out.result()
    } finally ch.close()
  }

  /** graft-ndv-v1 payload codec: 8-byte little-endian distinct count */
  def ndvPayload(ndv: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.putLong(ndv); b.array()
  }
  def ndvFromPayload(p: Array[Byte]): Long =
    ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN).getLong()

  /** NDV estimate from an `apache-datasketches-theta-v1` blob payload —
    * the compact Theta sketch wire format the reference writes via the
    * DataSketches library (reference NDVSketchUtil;
    * format/puffin-spec.md). The format is public and little-endian:
    *
    *   byte 0: preamble longs (1 empty/single-item, 2 exact, 3 estimating)
    *   byte 1: serialization version (3)   byte 2: family id
    *   byte 5: flags (bit2 = EMPTY)        bytes 6-7: seed hash
    *   preLongs>=2: bytes 8-11 = retained entry count (i32)
    *   preLongs==3: bytes 16-23 = thetaLong (i64)
    *   then the retained hash longs.
    *
    * estimate = retained / (thetaLong / 2^63-1): exact-mode sketches
    * (theta = Long.MaxValue) estimate their retained count; estimating
    * sketches scale by the sampling fraction. No datasketches jar is on
    * this classpath — the estimate needs only the preamble. */
  def thetaEstimate(p: Array[Byte]): Option[Long] =
    try {
      if (p.length < 8) return None
      val bb = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
      val preLongs = p(0) & 0x3f
      val serVer = p(1) & 0xff
      if (serVer < 1 || serVer > 4) return None
      val empty = (p(5) & 0x04) != 0
      if (empty) Some(0L)
      else if (preLongs == 1) Some(1L) // single-item sketch
      else if (p.length < preLongs * 8) None
      else {
        val retained = bb.getInt(8)
        if (retained < 0) None
        else if (preLongs == 2) Some(retained.toLong) // exact mode
        else if (preLongs == 3) {
          val theta = bb.getLong(16)
          if (theta <= 0L) None
          else Some(math.round(
            retained.toDouble * (Long.MaxValue.toDouble / theta.toDouble)))
        } else None
      }
    } catch { case _: Throwable => None }

  /** NDV from a statistics blob of any supported type: the spec's `ndv`
    * summary property when present (no payload IO), else the decoded
    * payload (graft count or theta sketch preamble). */
  def ndvFromBlob(tpe: String, properties: Map[String, String],
      payload: () => Option[Array[Byte]]): Option[Long] =
    properties.get("ndv").flatMap(_.toLongOption).orElse(tpe match {
      case "graft-ndv-v1" => payload().map(ndvFromPayload)
      case "apache-datasketches-theta-v1" => payload().flatMap(thetaEstimate)
      case _ => None
    })

  private def sliceEq(bytes: Array[Byte], off: Int, m: Array[Byte]): Boolean =
    m.indices.forall(i => bytes(off + i) == m(i))
}
