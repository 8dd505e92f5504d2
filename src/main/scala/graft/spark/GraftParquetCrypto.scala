package graft.spark

import org.apache.hadoop.conf.Configuration

import graft.core.meta.{KmsRegistry, LocalKms, TableCrypto, TableMetadata}

/** Parquet Modular Encryption plumbing for encrypted tables (reference
  * format/spec.md table encryption; the reference's parquet data files
  * go through parquet's own envelope encryption — we drive the same
  * parquet-java keytools machinery through the hadoop conf that every
  * read/write path here already builds, so Spark's vectorized parquet
  * reader and writer handle the crypto natively):
  *   - writes: every column + footer encrypted with per-module DEKs
  *     wrapped by the table's KMS master key (`encryption.key-id`);
  *     files carry self-describing encrypted footers (magic `PARE`)
  *   - reads: the decryption factory loads from the same conf keys
  * Key material reaches executors via the job conf
  * (`graft.encryption.kms.key-list`), the same channel parquet's own
  * conf-driven KMS mocks use — no side channel needed on a cluster. */
object GraftParquetCrypto {
  val KeyListConf = "graft.encryption.kms.key-list"

  /** seed the process KMS from a Spark conf / catalog options value;
    * `source` scopes the keys (catalog name) so a re-init with a rotated
    * list replaces that catalog's keys instead of merging forever */
  def seedKms(source: String, keyList: Option[String]): Unit =
    keyList.filter(_.nonEmpty).foreach(KmsRegistry.setKeyList(source, _))

  def isEncrypted(meta: TableMetadata): Boolean = meta.encryptionKeys.nonEmpty

  /** DataFrameReader option map for direct `spark.read.parquet(paths)`
    * over an encrypted table's files (maintenance jobs, delete-row
    * reads): DataFrameReader options merge into the per-relation hadoop
    * conf, so the decryption factory loads exactly like the DSv2 path. */
  def readOptions(meta: TableMetadata): Map[String, String] =
    if (!isEncrypted(meta)) Map.empty
    else {
      val c = new Configuration(false)
      configure(c, meta)
      import scala.jdk.CollectionConverters._
      c.iterator().asScala.map(e => e.getKey -> e.getValue).toMap
    }

  /** write- and read-side parquet crypto settings for one table */
  def configure(conf: Configuration, meta: TableMetadata): Unit =
    if (isEncrypted(meta)) {
      val masterId = meta.properties.getOrElse(TableCrypto.KeyIdProp,
        throw new IllegalStateException(
          "encrypted table is missing encryption.key-id"))
      conf.set("parquet.crypto.factory.class",
        "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory")
      conf.set("parquet.encryption.kms.client.class",
        classOf[GraftParquetKms].getName)
      conf.set("parquet.encryption.uniform.key", masterId)
      if (KmsRegistry.currentKeyList.nonEmpty)
        conf.set(KeyListConf, KmsRegistry.currentKeyList)
    }
}

/** parquet-java keytools KMS client backed by the same key material as
  * the metadata-encryption KMS: the job conf's key list when present
  * (cluster path), else the process registry (same-JVM path). */
final class GraftParquetKms extends org.apache.parquet.crypto.keytools.KmsClient {
  @volatile private var confKeys: Map[String, Array[Byte]] = Map.empty

  override def initialize(configuration: Configuration, kmsInstanceID: String,
      kmsInstanceURL: String, accessToken: String): Unit =
    confKeys = Option(configuration.get(GraftParquetCrypto.KeyListConf))
      .map(LocalKms.parseKeyList).getOrElse(Map.empty)

  /** conf keys win for the ids they define, but an id the conf doesn't
    * know falls back to the process registry — a job conf serialized
    * before another catalog registered its keys must not hide them */
  private def kmsFor(masterKeyId: String): graft.core.meta.Kms =
    if (confKeys.contains(masterKeyId)) new LocalKms(confKeys)
    else KmsRegistry.current

  override def wrapKey(key: Array[Byte], masterKeyId: String): String =
    kmsFor(masterKeyId).wrapKey(key, masterKeyId)

  override def unwrapKey(wrappedKey: String, masterKeyId: String): Array[Byte] =
    kmsFor(masterKeyId).unwrapKey(wrappedKey, masterKeyId)
}
