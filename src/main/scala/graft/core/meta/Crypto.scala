package graft.core.meta

import java.nio.{ByteBuffer, ByteOrder}
import java.security.SecureRandom
import java.util.Base64

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** Table encryption (reference format/spec.md "Encryption Keys" +
  * format/gcm-stream-spec.md; core/.../encryption/ — EncryptionUtil,
  * StandardEncryptionManager, AesGcmOutputStream/AesGcmInputStream,
  * Ciphers, KeyManagementClient).
  *
  * Envelope scheme, spec-shaped:
  *   KMS master key (`encryption.key-id` table property, held by the key
  *   management service — never written to the table tree)
  *     wraps → per-table key (metadata.json `encryption-keys` list:
  *             key-id / encrypted-key-metadata / encrypted-by-id)
  *     wraps → per-file DEKs: one per manifest (manifest-list entry
  *             `key_metadata`, spec field 519), one per manifest list
  *             (snapshot `key-id` + key metadata, spec v3 "the encryption
  *             key used for a snapshot is specified by key-id").
  *   Metadata files (manifests, manifest lists) are AES GCM Stream
  *   (AGS1) per gcm-stream-spec.md. Parquet data/delete files use
  *   Parquet Modular Encryption driven by the same KMS (self-describing
  *   footers — the manifest `key_metadata` for data files is therefore
  *   not needed, matching the reference's native-encryption path).
  */
object AesGcm {
  val Magic: Array[Byte] = Array(0x41, 0x47, 0x53, 0x31).map(_.toByte) // "AGS1"
  val NonceLen = 12
  val TagLen = 16
  val BlockLen: Int = 1 << 20 // 1 MiB plaintext blocks (reference default)

  private val rng = new SecureRandom()

  def randomBytes(n: Int): Array[Byte] = {
    val b = new Array[Byte](n); rng.nextBytes(b); b
  }

  def isEncrypted(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == Magic(0) && bytes(1) == Magic(1) &&
      bytes(2) == Magic(2) && bytes(3) == Magic(3)

  private def cipher(mode: Int, key: Array[Byte], nonce: Array[Byte],
      aad: Array[Byte]): Cipher = {
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(TagLen * 8, nonce))
    if (aad != null && aad.nonEmpty) c.updateAAD(aad)
    c
  }

  /** block AAD = file AAD prefix ++ block index (4-byte little endian)
    * (gcm-stream-spec.md "Additional Authenticated Data") */
  private def blockAad(prefix: Array[Byte], idx: Int): Array[Byte] = {
    val suffix = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(idx).array()
    if (prefix == null || prefix.isEmpty) suffix else prefix ++ suffix
  }

  /** plaintext → AGS1 file bytes:
    * Magic | BlockLength(4, LE) | (nonce | ciphertext | tag)* */
  def encryptStream(plain: Array[Byte], key: Array[Byte],
      aadPrefix: Array[Byte], blockLen: Int = BlockLen): Array[Byte] = {
    val nBlocks = math.max(1, (plain.length + blockLen - 1) / blockLen)
    val bos = new java.io.ByteArrayOutputStream(
      8 + plain.length + nBlocks * (NonceLen + TagLen))
    bos.write(Magic)
    bos.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(blockLen).array())
    var i = 0
    while (i < nBlocks) {
      val from = i * blockLen
      val to = math.min(plain.length, from + blockLen)
      val nonce = randomBytes(NonceLen)
      val ct = cipher(Cipher.ENCRYPT_MODE, key, nonce, blockAad(aadPrefix, i))
        .doFinal(plain, from, to - from)
      bos.write(nonce)
      bos.write(ct)
      i += 1
    }
    bos.toByteArray
  }

  /** AGS1 file bytes → plaintext; throws on tamper (bad tag), block
    * swap (AAD index mismatch) or wrong key. */
  def decryptStream(bytes: Array[Byte], key: Array[Byte],
      aadPrefix: Array[Byte]): Array[Byte] = {
    require(isEncrypted(bytes), "not an AES GCM Stream (AGS1) file")
    val blockLen = ByteBuffer.wrap(bytes, 4, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    require(blockLen > 0, s"corrupt AGS1 header: block length $blockLen")
    val cipherBlockLen = NonceLen + blockLen + TagLen
    val bos = new java.io.ByteArrayOutputStream(math.max(16, bytes.length - 8))
    var off = 8
    var idx = 0
    while (off < bytes.length) {
      val end = math.min(bytes.length, off + cipherBlockLen)
      require(end - off > NonceLen + TagLen, "truncated AGS1 cipher block")
      val nonce = java.util.Arrays.copyOfRange(bytes, off, off + NonceLen)
      val plain = cipher(Cipher.DECRYPT_MODE, key, nonce, blockAad(aadPrefix, idx))
        .doFinal(bytes, off + NonceLen, end - off - NonceLen)
      bos.write(plain)
      off = end
      idx += 1
    }
    bos.toByteArray
  }

  /** single-shot GCM key wrap: base64(nonce | ct | tag) (reference
    * Ciphers.AesGcmEncryptor key-wrapping use). */
  def wrap(plainKey: Array[Byte], kek: Array[Byte]): String = {
    val nonce = randomBytes(NonceLen)
    val ct = cipher(Cipher.ENCRYPT_MODE, kek, nonce, null).doFinal(plainKey)
    Base64.getEncoder.encodeToString(nonce ++ ct)
  }

  def unwrap(wrapped: String, kek: Array[Byte]): Array[Byte] = {
    val bytes = Base64.getDecoder.decode(wrapped)
    val nonce = java.util.Arrays.copyOfRange(bytes, 0, NonceLen)
    cipher(Cipher.DECRYPT_MODE, kek, nonce, null)
      .doFinal(bytes, NonceLen, bytes.length - NonceLen)
  }
}

/** Key management client (reference
  * core/.../encryption/KeyManagementClient.java): wraps/unwraps table
  * keys with master keys it holds. Production deployments plug a real
  * KMS behind this trait; `LocalKms` holds base64 master keys from
  * catalog/session configuration (the shape of parquet-java's
  * conf-driven mock KMS — keys ship to executors with the job conf). */
trait Kms {
  def wrapKey(key: Array[Byte], masterKeyId: String): String
  def unwrapKey(wrappedKey: String, masterKeyId: String): Array[Byte]
}

final class LocalKms(masters: Map[String, Array[Byte]]) extends Kms {
  private def master(id: String): Array[Byte] =
    masters.getOrElse(id,
      throw new IllegalArgumentException(s"unknown KMS master key: $id"))
  override def wrapKey(key: Array[Byte], masterKeyId: String): String =
    AesGcm.wrap(key, master(masterKeyId))
  override def unwrapKey(wrappedKey: String, masterKeyId: String): Array[Byte] =
    AesGcm.unwrap(wrappedKey, master(masterKeyId))
}

object LocalKms {
  /** parse "keyId:base64,keyId2:base64" (the `graft.encryption.kms.key-list`
    * conf; same wire shape parquet's test KMS uses, so one conf entry
    * drives both metadata and parquet-modular encryption). */
  def parseKeyList(s: String): Map[String, Array[Byte]] =
    s.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf(':')
      require(i > 0, s"bad kms key entry: $kv")
      val key = Base64.getDecoder.decode(kv.substring(i + 1))
      // fail at conf-parse time with a clear message, not mid-table-build
      // (reference contract: parquet-java keytools / core Ciphers.java —
      // AES accepts exactly 16/24/32-byte keys)
      require(key.length == 16 || key.length == 24 || key.length == 32,
        s"invalid AES master key '${kv.substring(0, i)}': ${key.length} bytes " +
          "(must be 16, 24 or 32)")
      kv.substring(0, i) -> key
    }.toMap
}

/** Process-wide KMS registry. The Spark layer seeds it from session /
  * catalog conf (`graft.encryption.kms.key-list`); core code resolves
  * through it at table load. */
object KmsRegistry {
  @volatile private var kms: Kms = new LocalKms(Map.empty)
  @volatile private var keyList: String = ""
  // key material scoped PER SOURCE (catalog name): the live KMS is the
  // union across sources (later definition of a key id wins), so two
  // catalogs with different encryption.kms.key-list values coexist —
  // while a catalog re-initialized with a ROTATED list replaces its own
  // scope wholesale, dropping removed/replaced key material instead of
  // keeping every key ever seen resident for the process lifetime (and
  // out of the serialized conf below)
  private val perSource =
    scala.collection.mutable.LinkedHashMap.empty[String, (String, Map[String, Array[Byte]])]

  def set(k: Kms): Unit = kms = k

  /** install `source`'s key list, replacing that source's previous keys */
  def setKeyList(source: String, s: String): Unit = synchronized {
    if (s != null && s.nonEmpty && !perSource.get(source).exists(_._1 == s)) {
      perSource.put(source, (s, LocalKms.parseKeyList(s)))
      val merged =
        perSource.values.foldLeft(Map.empty[String, Array[Byte]])(_ ++ _._2)
      kms = new LocalKms(merged)
      // the canonical MERGED serialization: this string rides into Hadoop
      // job confs (GraftParquetCrypto.configure) and must carry every
      // LIVE catalog's keys — executors resolve parquet modular
      // encryption from it. Rotated-out keys are excluded.
      keyList = merged.map { case (id, k) =>
        s"$id:${Base64.getEncoder.encodeToString(k)}"
      }.mkString(",")
    }
  }
  def current: Kms = kms
  def currentKeyList: String = keyList
}

/** Resolution cache: table base location → resolved table crypto, plus
  * per-file keys for manifest lists (whose DEKs live in their snapshot
  * records, not in any containing file read later). Populated whenever
  * table metadata is parsed, so the 70+ manifest-read sites stay
  * signature-free; executors in distributed planning get the table key
  * passed explicitly through the task closure instead. */
object CryptoRegistry {
  /** access-ordered LRU, synchronized: unlike BoundedCache, these entries
    * CANNOT be re-loaded on miss (manifest-list DEKs come from snapshot
    * records seen only at metadata-parse time), so whole-map clears would
    * hard-fail currently-open tables mid-read. Per-entry eviction keeps
    * hot tables resident in long-running multi-table services. */
  private final class Lru[V](max: Int)
      extends java.util.LinkedHashMap[String, V](64, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, V]): Boolean = size() > max
  }
  /** per-table entry: resolved crypto + that table's manifest-list DEKs.
    * File keys live INSIDE the table entry rather than in a separate LRU
    * so they can never be evicted out from under a still-resident table
    * (they are un-reloadable: the wrapping keyMetadata is only seen at
    * metadata-parse time). A table eviction drops its keys with it; the
    * next metadata parse re-registers both. Per-table key count is
    * bounded by live snapshots — expired snapshots' keys drop on the
    * rebuild below. */
  private final class Entry(val crypto: Option[TableCrypto],
      val stamp: Long = -1L) {
    val fileKeys = new java.util.HashMap[String, (Array[Byte], Array[Byte])]()
  }
  private val tables = new Lru[Entry](10000)

  def register(meta: TableMetadata): Unit =
    if (meta.encryptionKeys.nonEmpty) {
      // lazy: only resolve through the KMS when keys are configured, so
      // pure metadata parses (round-trip tests, path rewrites) without a
      // KMS stay legal; reads that NEED the key fail with a clear error
      try {
        val tc = TableCrypto.resolve(meta)
        synchronized {
          val prev = Option(tables.get(meta.location))
          // parsing OLD metadata (time travel, a concurrent reader mid-
          // commit) must never drop keys a NEWER registration installed:
          // only same-or-newer metadata replaces the entry; older parses
          // merge their snapshots' keys into the existing one
          if (prev.exists(p => meta.lastUpdatedMs < p.stamp)) {
            val e = prev.get
            for {
              crypto <- tc
              s <- meta.snapshots
              km <- s.keyMetadata
            } if (!e.fileKeys.containsKey(s.manifestListPath))
              e.fileKeys.put(s.manifestListPath, crypto.fileKey(km))
          } else {
            val e = new Entry(tc, meta.lastUpdatedMs)
            // carry over EVERY previous key (parked write-time keys for
            // not-yet-visible snapshots included), then refresh from the
            // current snapshots' keyMetadata
            prev.foreach(p => e.fileKeys.putAll(p.fileKeys))
            for {
              crypto <- tc
              s <- meta.snapshots
              km <- s.keyMetadata
            } if (!e.fileKeys.containsKey(s.manifestListPath))
              e.fileKeys.put(s.manifestListPath, crypto.fileKey(km))
            // age out keys for expired snapshots only when the map has
            // clearly outgrown the live set — a bounded prune that cannot
            // race away a just-parked key in the common case
            if (e.fileKeys.size > 2 * meta.snapshots.size + 64) {
              val live = meta.snapshots.map(_.manifestListPath).toSet
              e.fileKeys.keySet.removeIf(k => !live.contains(k))
            }
            tables.put(meta.location, e)
          }
        }
      } catch {
        // AUTHENTICATION failures (GCM tag mismatch, malformed key
        // metadata) mean corrupt or wrong key material and must surface
        // at the parse site, not later as a misleading "no table key is
        // available". Anything else — unknown master key, a pluggable
        // KMS's own not-found/timeout exceptions — is KMS-unavailable
        // and fails LAZILY at the first read that needs the key, so
        // keyless metadata operations (snapshots/history, path rewrites)
        // stay legal. Keyed on exception CLASS, not LocalKms's message
        // strings, so custom Kms implementations get the same contract.
        case e: javax.crypto.BadPaddingException => throw e
        case e: IllegalArgumentException
            if e.getMessage != null &&
              e.getMessage.contains("corrupt file key metadata") => throw e
        case _: Exception => ()
      }
    }

  /** table crypto for a metadata file living under {base}/metadata/ */
  def forPath(path: String): Option[TableCrypto] =
    GraftIO.metadataBase(path).flatMap(b =>
      synchronized(Option(tables.get(b))).flatMap(_.crypto))

  /** table crypto for a CONTENT file under {base}/data/ (DVs, stats) */
  def forContentPath(path: String): Option[TableCrypto] = {
    val i = path.lastIndexOf("/data/")
    val byData =
      if (i > 0)
        synchronized(Option(tables.get(path.substring(0, i)))).flatMap(_.crypto)
      else None
    byData.orElse(forPath(path))
  }

  def fileKey(path: String): Option[(Array[Byte], Array[Byte])] =
    GraftIO.metadataBase(path).flatMap(b => synchronized(
      Option(tables.get(b)).flatMap(e => Option(e.fileKeys.get(path)))))

  def putFileKey(path: String, key: (Array[Byte], Array[Byte])): Unit =
    GraftIO.metadataBase(path).foreach { b =>
      synchronized {
        // a write can precede the table's (re-)registration: park the key
        // on a placeholder entry; register() carries it over
        val e = Option(tables.get(b)).getOrElse {
          val fresh = new Entry(None); tables.put(b, fresh); fresh
        }
        e.fileKeys.put(path, key)
      }
    }
}

/** An encryption key tracked in table metadata (spec "Encryption Keys":
  * key-id / encrypted-key-metadata / encrypted-by-id). */
final case class EncryptionKey(
    keyId: String,
    encryptedKeyMetadata: String,
    encryptedById: Option[String] = None,
    properties: Map[String, String] = Map.empty)

/** Resolved (unwrapped) table-key context used by metadata IO. */
final case class TableCrypto(tableKeyId: String, tableKey: Array[Byte]) {
  /** mint a fresh file DEK + AAD prefix; returns (keyMetadata, dek, aad) */
  def newFileKey(): (String, Array[Byte], Array[Byte]) = {
    val dek = AesGcm.randomBytes(TableCrypto.DekLen)
    val aad = AesGcm.randomBytes(TableCrypto.AadLen)
    (AesGcm.wrap(dek ++ aad, tableKey), dek, aad)
  }
  /** resolve a file's (dek, aad) from its stored key metadata */
  def fileKey(keyMetadata: String): (Array[Byte], Array[Byte]) = {
    val both = AesGcm.unwrap(keyMetadata, tableKey)
    require(both.length == TableCrypto.DekLen + TableCrypto.AadLen,
      "corrupt file key metadata")
    (java.util.Arrays.copyOfRange(both, 0, TableCrypto.DekLen),
      java.util.Arrays.copyOfRange(both, TableCrypto.DekLen, both.length))
  }

  /** HKDF-style derived (dek, aad) for content files whose readers see
    * only a path (deletion vectors, puffin stats): HMAC-SHA256 of the
    * UUID-unique file NAME under the table key — deterministic on both
    * sides, stable across v4 relocation, unique per file. Deliberate
    * deviation from the reference's manifest-stored key metadata: the
    * derivation removes the need to thread per-file key metadata through
    * executor-side path caches, with equivalent security (distinct keys
    * per file; nonces stay random). */
  def derivedFileKey(path: String): (Array[Byte], Array[Byte]) = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(tableKey, "HmacSHA256"))
    val okm = mac.doFinal(("graft-file-key:" + name).getBytes("UTF-8"))
    (java.util.Arrays.copyOfRange(okm, 0, 16),
      java.util.Arrays.copyOfRange(okm, 16, 32))
  }
}

object TableCrypto {
  val DekLen = 16 // encryption.data-key-length default (reference
                  // TableProperties.ENCRYPTION_DEK_LENGTH_DEFAULT)
  val AadLen = 16

  val KeyIdProp = "encryption.key-id"

  /** Resolve the table crypto context from metadata: unwrap the newest
    * `encryption-keys` entry with the KMS. None when the table is not
    * encrypted. */
  def resolve(meta: TableMetadata): Option[TableCrypto] =
    meta.encryptionKeys.lastOption.map { ek =>
      val masterId = ek.encryptedById.getOrElse(
        meta.properties.getOrElse(KeyIdProp,
          throw new IllegalStateException(
            "encrypted table has no encryption.key-id property")))
      TableCrypto(ek.keyId, KmsRegistry.current.unwrapKey(ek.encryptedKeyMetadata, masterId))
    }

  /** Mint the table key for a newly-created encrypted table. */
  def create(masterKeyId: String): (EncryptionKey, TableCrypto) = {
    val tableKey = AesGcm.randomBytes(DekLen)
    val keyId = java.util.UUID.randomUUID.toString
    (EncryptionKey(keyId,
      KmsRegistry.current.wrapKey(tableKey, masterKeyId), Some(masterKeyId)),
      TableCrypto(keyId, tableKey))
  }
}
