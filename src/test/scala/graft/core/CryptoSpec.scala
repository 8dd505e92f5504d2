package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta._

class CryptoSpec extends AnyFunSuite {
  private val key = AesGcm.randomBytes(16)
  private val aad = AesGcm.randomBytes(16)

  test("AGS1 roundtrip, single block") {
    val plain = "hello graft metadata".getBytes("UTF-8")
    val enc = AesGcm.encryptStream(plain, key, aad)
    assert(AesGcm.isEncrypted(enc))
    assert(!new String(enc, "ISO-8859-1").contains("graft metadata"))
    assert(AesGcm.decryptStream(enc, key, aad).sameElements(plain))
  }

  test("AGS1 roundtrip, multi block with short tail") {
    val plain = AesGcm.randomBytes(10000)
    val enc = AesGcm.encryptStream(plain, key, aad, blockLen = 4096)
    // 3 blocks: 4096+4096+1808, each nonce(12)+ct+tag(16)
    assert(enc.length == 8 + 10000 + 3 * 28)
    assert(AesGcm.decryptStream(enc, key, aad).sameElements(plain))
  }

  test("tampered ciphertext byte fails authentication") {
    val enc = AesGcm.encryptStream("payload".getBytes, key, aad)
    enc(enc.length - 5) = (enc(enc.length - 5) ^ 1).toByte
    intercept[Exception](AesGcm.decryptStream(enc, key, aad))
  }

  test("swapped cipher blocks fail the AAD block index") {
    val plain = AesGcm.randomBytes(8192)
    val enc = AesGcm.encryptStream(plain, key, aad, blockLen = 4096)
    val b = 4096 + 28
    val swapped = enc.slice(0, 8) ++ enc.slice(8 + b, 8 + 2 * b) ++ enc.slice(8, 8 + b)
    intercept[Exception](AesGcm.decryptStream(swapped, key, aad))
  }

  test("wrong key / wrong AAD prefix fail") {
    val enc = AesGcm.encryptStream("x".getBytes, key, aad)
    intercept[Exception](AesGcm.decryptStream(enc, AesGcm.randomBytes(16), aad))
    intercept[Exception](AesGcm.decryptStream(enc, key, AesGcm.randomBytes(16)))
  }

  test("key wrap/unwrap roundtrip; kms key list parse") {
    val dek = AesGcm.randomBytes(16)
    val kek = AesGcm.randomBytes(32) // AES-256 master
    assert(AesGcm.unwrap(AesGcm.wrap(dek, kek), kek).sameElements(dek))
    val b64 = java.util.Base64.getEncoder.encodeToString(kek)
    val kms = new LocalKms(LocalKms.parseKeyList(s"mk1:$b64"))
    assert(kms.unwrapKey(kms.wrapKey(dek, "mk1"), "mk1").sameElements(dek))
    intercept[IllegalArgumentException](kms.wrapKey(dek, "other"))
  }

  test("table key chain: create → resolve → per-file keys") {
    val master = AesGcm.randomBytes(16)
    KmsRegistry.setKeyList("spec", "mk:" +
      java.util.Base64.getEncoder.encodeToString(master))
    val (ek, tc) = TableCrypto.create("mk")
    assert(ek.encryptedById.contains("mk"))
    // resolve through metadata as a reader would
    val meta = TableMetadata.newTable("/tmp/ct", GSchemaFixtures.schema,
      graft.core.expr.PartitionSpec.Unpartitioned,
      Map(TableCrypto.KeyIdProp -> "mk")).copy(encryptionKeys = Seq(ek))
    val resolved = TableCrypto.resolve(meta).get
    assert(resolved.tableKey.sameElements(tc.tableKey))
    val (km, dek, fAad) = resolved.newFileKey()
    val (dek2, aad2) = resolved.fileKey(km)
    assert(dek2.sameElements(dek) && aad2.sameElements(fAad))
  }

  test("newTable with encryption.key-id mints an encryption key") {
    val master = AesGcm.randomBytes(16)
    KmsRegistry.setKeyList("spec", "mknew:" +
      java.util.Base64.getEncoder.encodeToString(master))
    val meta = TableMetadata.newTable("/tmp/ct2", GSchemaFixtures.schema,
      graft.core.expr.PartitionSpec.Unpartitioned,
      Map(TableCrypto.KeyIdProp -> "mknew"))
    assert(meta.encryptionKeys.size == 1)
    // metadata JSON round-trips the key list and snapshot fields
    val json = MetaJson.writeMetadata(meta)
    assert(json.contains("encryption-keys"))
    val back = MetaJson.readMetadata(json)
    assert(back.encryptionKeys == meta.encryptionKeys)
  }

  test("GraftIO writeString/readString with a file key (plus gzip)") {
    val dir = java.nio.file.Files.createTempDirectory("crypt").toString
    val dek = AesGcm.randomBytes(16)
    for (gz <- Seq(false, true)) {
      val p = s"$dir/doc-$gz.json"
      GraftIO.writeString(p, "secret-content", gzip = gz, Some((dek, aad)))
      val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
      assert(AesGcm.isEncrypted(raw))
      assert(GraftIO.readString(p, Some((dek, aad))) == "secret-content")
      val e = intercept[IllegalStateException](GraftIO.readString(p))
      assert(e.getMessage.contains("encrypted"))
    }
  }

  test("KMS key list rejects non-AES key lengths at parse time") {
    // 17 bytes compiles to a conf string fine but can never init an AES
    // cipher — must fail at parse with the key id in the message, not
    // mid-table-build (r7 post-mortem)
    val bad = java.util.Base64.getEncoder.encodeToString(AesGcm.randomBytes(17))
    val e = intercept[IllegalArgumentException](
      LocalKms.parseKeyList(s"badkey:$bad"))
    assert(e.getMessage.contains("badkey") && e.getMessage.contains("17"))
    // all three legal AES lengths parse
    Seq(16, 24, 32).foreach { n =>
      val ok = java.util.Base64.getEncoder.encodeToString(AesGcm.randomBytes(n))
      assert(LocalKms.parseKeyList(s"k$n:$ok")(s"k$n").length == n)
    }
  }

  test("KmsRegistry merges key lists across catalogs") {
    val k1 = java.util.Base64.getEncoder.encodeToString(AesGcm.randomBytes(16))
    val k2 = java.util.Base64.getEncoder.encodeToString(AesGcm.randomBytes(16))
    KmsRegistry.setKeyList("cat-a", s"cat-a-mk:$k1")
    KmsRegistry.setKeyList("cat-b", s"cat-b-mk:$k2")
    // the second catalog's init must NOT clobber the first's master key
    val dek = AesGcm.randomBytes(16)
    val wrapped = KmsRegistry.current.wrapKey(dek, "cat-a-mk")
    assert(KmsRegistry.current.unwrapKey(wrapped, "cat-a-mk").sameElements(dek))
    val wrapped2 = KmsRegistry.current.wrapKey(dek, "cat-b-mk")
    assert(KmsRegistry.current.unwrapKey(wrapped2, "cat-b-mk").sameElements(dek))
  }

  test("encrypted read verifies length against a trusted value") {
    val dir = java.nio.file.Files.createTempDirectory("crypt-len").toString
    val dek = AesGcm.randomBytes(16)
    val p = s"$dir/m.json"
    GraftIO.writeString(p, "entry1\nentry2\n", gzip = false, Some((dek, aad)))
    val trueLen = GraftIO.size(p)
    assert(GraftIO.readString(p, Some((dek, aad)), expectedLen = trueLen)
      == "entry1\nentry2\n")
    // gcm-stream 'File length': a truncated/tampered container must fail
    // the trusted-length check before any block is even decrypted
    val e = intercept[IllegalStateException](
      GraftIO.readString(p, Some((dek, aad)), expectedLen = trueLen - 28))
    assert(e.getMessage.contains("truncation") || e.getMessage.contains("length"))
  }
}

object GSchemaFixtures {
  import graft.core.types._
  val schema: GSchema = GSchema(GStruct(Seq(
    GField(1, "id", GLong, required = true),
    GField(2, "v", GString))))
}
