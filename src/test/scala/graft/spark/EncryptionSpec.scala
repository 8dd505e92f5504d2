package graft.spark

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta._

/** End-to-end table encryption: metadata tree AGS1-encrypted, parquet
  * data/delete files modular-encrypted (PARE footers), plaintext leaks
  * checked at the byte level, reads still correct through SQL
  * (reference format/spec.md encryption keys + gcm-stream-spec.md). */
class EncryptionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _
  private val masterB64 =
    java.util.Base64.getEncoder.encodeToString(AesGcm.randomBytes(16))

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-enc-wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-enc")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.genc", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.genc.warehouse", warehouse)
      .config("spark.sql.catalog.genc.encryption.kms.key-list", s"mk0:$masterB64")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS genc.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def table(name: String) =
    new HadoopCatalog(warehouse).loadTable(Seq("db"), name).get

  private def bytesOf(p: String): Array[Byte] =
    Files.readAllBytes(Paths.get(p.stripPrefix("file:")))

  private def walk(dir: String): Seq[String] =
    GraftIO.walkFiles(dir)

  test("encrypted table: write/read roundtrip, no plaintext on disk") {
    spark.sql("""CREATE TABLE genc.db.sec (
      id BIGINT, secret STRING, amount DOUBLE) PARTITIONED BY (bucket(4, id))
      TBLPROPERTIES ('encryption.key-id'='mk0')""")
    spark.sql("""INSERT INTO genc.db.sec VALUES
      (1, 'topsecret-alpha', 10.5), (2, 'topsecret-beta', 20.25),
      (3, 'topsecret-gamma', 30.0), (4, 'topsecret-delta', 4.75)""")

    // correctness through SQL
    val rows = spark.sql(
      "SELECT id, secret FROM genc.db.sec WHERE amount > 15 ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(rows(0).getString(1) == "topsecret-beta")

    val t = table("sec")
    assert(t.meta.encryptionKeys.size == 1)
    assert(t.meta.encryptionKeys.head.encryptedById.contains("mk0"))
    val snap = t.meta.currentSnapshot.get
    assert(snap.keyId.contains(t.meta.encryptionKeys.head.keyId))
    assert(snap.keyMetadata.isDefined)

    // byte-level: manifest list + manifests are AGS1; parquet data files
    // have encrypted footers (magic PARE, not PAR1); NO file under the
    // table dir leaks the secret plaintext
    val listBytes = bytesOf(snap.manifestListPath)
    assert(AesGcm.isEncrypted(listBytes))
    val mfs = ManifestIO.readList(snap.manifestListPath)
    assert(mfs.nonEmpty && mfs.forall(_.keyMetadata.isDefined))
    mfs.foreach(m => assert(AesGcm.isEncrypted(bytesOf(m.path))))
    val dataFiles = t.newScan().planFiles().map(_.file.path)
    assert(dataFiles.nonEmpty)
    dataFiles.foreach { p =>
      val b = bytesOf(p)
      assert(new String(b, 0, 4, "ISO-8859-1") == "PARE", s"plain footer: $p")
    }
    for (f <- walk(t.location)) {
      val s = new String(bytesOf(f), "ISO-8859-1")
      assert(!s.contains("topsecret"), s"plaintext leak in $f")
    }
  }

  test("row-level DML on an encrypted table stays encrypted and correct") {
    spark.sql("""CREATE TABLE genc.db.sec2 (id BIGINT, v STRING)
      TBLPROPERTIES ('encryption.key-id'='mk0',
                     'write.delete.mode'='merge-on-read',
                     'write.update.mode'='copy-on-write')""")
    spark.sql("INSERT INTO genc.db.sec2 VALUES (1,'hush-a'),(2,'hush-b'),(3,'hush-c')")
    spark.sql("DELETE FROM genc.db.sec2 WHERE id = 2")
    spark.sql("UPDATE genc.db.sec2 SET v = 'hush-z' WHERE id = 3")
    val out = spark.sql("SELECT id, v FROM genc.db.sec2 ORDER BY id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "hush-a"), (3L, "hush-z")))
    val t = table("sec2")
    for (f <- walk(t.location)) {
      val s = new String(bytesOf(f), "ISO-8859-1")
      assert(!s.contains("hush"), s"plaintext leak in $f")
    }
  }

  test("manifest merging reads and rewrites encrypted manifests") {
    // createMerged must unwrap each parent manifest's DEK from its
    // manifest-list key_metadata and wrap a FRESH key for the merged
    // manifest — a merge that dropped or reused keys would either fail
    // to read or write plaintext
    spark.sql("""CREATE TABLE genc.db.mm_enc (id BIGINT, v STRING)
      TBLPROPERTIES ('encryption.key-id'='mk0',
        'commit.manifest.min-count-to-merge'='3')""")
    (1 to 9).foreach(i =>
      spark.sql(s"INSERT INTO genc.db.mm_enc VALUES ($i, 'enc-val-$i')"))
    val t = table("mm_enc")
    val ms = graft.core.meta.ManifestIO.readList(
      t.meta.currentSnapshot.get.manifestListPath)
    assert(ms.size <= 3, s"encrypted manifests must merge, got ${ms.size}")
    // every surviving manifest is encrypted (own key metadata) and not
    // plaintext on disk
    ms.foreach { m =>
      assert(m.keyMetadata.isDefined, s"merged manifest ${m.path} lost its key")
      assert(AesGcm.isEncrypted(bytesOf(m.path)), s"${m.path} is plaintext")
      assert(!new String(bytesOf(m.path), java.nio.charset.StandardCharsets.ISO_8859_1)
        .contains("enc-val"), "manifest leaks plaintext values")
    }
    assert(spark.sql("SELECT count(*), sum(id) FROM genc.db.mm_enc")
      .collect().head.toSeq == Seq(9L, 45L))
    // time travel into the merged history decrypts the older lists too
    val mid = t.meta.snapshots.find(_.sequenceNumber == 5L).get.snapshotId
    assert(spark.sql(
      s"SELECT count(*) FROM genc.db.mm_enc VERSION AS OF $mid")
      .collect().head.getLong(0) == 5L)
  }

  test("compaction preserves encryption") {
    spark.sql("""CREATE TABLE genc.db.sec3 (id BIGINT, v STRING)
      TBLPROPERTIES ('encryption.key-id'='mk0')""")
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO genc.db.sec3 VALUES ($i, 'conf-$i')"))
    spark.sql("CALL genc.system.rewrite_data_files(table => 'db.sec3')")
    assert(spark.sql("SELECT count(*) FROM genc.db.sec3").collect()(0).getLong(0) == 4)
    val t = table("sec3")
    assert(t.newScan().planFiles().size == 1)
    for (f <- walk(t.location)) {
      val s = new String(bytesOf(f), "ISO-8859-1")
      assert(!s.contains("conf-"), s"plaintext leak in $f")
    }
  }

  test("deletion vectors on an encrypted v3 table are AGS1") {
    spark.sql("""CREATE TABLE genc.db.sec4 (id BIGINT, v STRING)
      TBLPROPERTIES ('encryption.key-id'='mk0', 'format-version'='3',
                     'write.delete.mode'='merge-on-read')""")
    // one multi-row file, so the row-level delete cannot short-circuit
    // to a metadata-only file drop
    spark.sql("SELECT id, concat('dv-', string(id)) AS v FROM range(1, 4)")
      .coalesce(1).writeTo("genc.db.sec4").append()
    spark.sql("DELETE FROM genc.db.sec4 WHERE id = 2")
    val t = table("sec4")
    val dvs = walk(t.location).filter(_.endsWith(".dv"))
    assert(dvs.nonEmpty, "v3 MoR delete should write a deletion vector")
    dvs.foreach(p => assert(AesGcm.isEncrypted(bytesOf(p)), s"plain DV: $p"))
    // decrypts through the registry (driver) path
    val (ref, bm) = DVIO.read(dvs.head)
    assert(ref.nonEmpty && bm.getLongCardinality == 1)
    assert(spark.sql("SELECT id FROM genc.db.sec4 ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
    for (f <- walk(t.location)) {
      val s = new String(bytesOf(f), "ISO-8859-1")
      assert(!s.contains("dv-"), s"plaintext leak in $f")
    }
  }

  test("changelog read decodes encrypted deletion vectors") {
    // the changes reader ships the table crypto in its factory (like the
    // batch scan) — this must work even if the executor-side registry
    // never saw the table
    spark.sql("""CREATE TABLE genc.db.sec6 (id BIGINT, v STRING)
      TBLPROPERTIES ('encryption.key-id'='mk0', 'format-version'='3',
                     'write.delete.mode'='merge-on-read')""")
    spark.sql("SELECT id, concat('cdc-', string(id)) AS v FROM range(1, 5)")
      .coalesce(1).writeTo("genc.db.sec6").append()
    spark.sql("DELETE FROM genc.db.sec6 WHERE id IN (2, 3)")
    assert(walk(table("sec6").location).exists(_.endsWith(".dv")),
      "expected a DV delete file")
    val ch = spark.read.table("genc.db.sec6.changes")
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(ch.filter(_._2 == "DELETE").map(_._1) == Seq(2L, 3L))
    assert(ch.filter(_._2 == "INSERT").map(_._1) == Seq(1L, 2L, 3L, 4L))
    // position_deletes metadata table decodes the encrypted DV
    // executor-side through the factory-shipped crypto too
    val pd = spark.read.table("genc.db.sec6.position_deletes")
      .select("pos").collect().map(_.getLong(0)).sorted.toSeq
    assert(pd == Seq(1L, 2L), s"position_deletes over encrypted DV: $pd")
  }

  test("puffin statistics files on an encrypted table are AGS1") {
    spark.sql("""CREATE TABLE genc.db.sec5 (id BIGINT, v STRING)
      TBLPROPERTIES ('encryption.key-id'='mk0')""")
    spark.sql("INSERT INTO genc.db.sec5 VALUES (1,'s-a'),(2,'s-b'),(3,'s-a')")
    spark.sql("CALL genc.system.compute_table_stats(table => 'db.sec5')")
    val t = table("sec5")
    val puffins = walk(t.location).filter(_.endsWith(".puffin"))
    assert(puffins.nonEmpty)
    puffins.foreach(p => assert(AesGcm.isEncrypted(bytesOf(p)), s"plain puffin: $p"))
    val blobs = Puffin.read(puffins.head)
    assert(blobs.nonEmpty &&
      blobs.exists(_.blobType == "apache-datasketches-theta-v1"))
  }

  test("encrypted avro manifests: AGS1 on disk, DML + codec flip correct") {
    spark.sql("""CREATE TABLE genc.db.secav (id BIGINT, v STRING)
      TBLPROPERTIES ('encryption.key-id'='mk0', 'format-version'='3',
        'write.manifests.format'='avro', 'write.delete.mode'='merge-on-read')""")
    spark.sql("INSERT INTO genc.db.secav VALUES (1,'topsecret-a'),(2,'topsecret-b'),(3,'topsecret-c')")
    spark.sql("DELETE FROM genc.db.secav WHERE id = 2")
    assert(spark.sql("SELECT id FROM genc.db.secav ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    val t = table("secav")
    val snap = t.meta.currentSnapshot.get
    // on disk: encrypted (AGS1 magic, NOT avro magic); decrypted payload
    // is genuine Avro via the keyed read path
    assert(AesGcm.isEncrypted(bytesOf(snap.manifestListPath)))
    val mfs = ManifestIO.readList(snap.manifestListPath)
    assert(mfs.nonEmpty && mfs.forall(_.keyMetadata.isDefined))
    mfs.foreach(m => assert(AesGcm.isEncrypted(bytesOf(m.path))))
    assert(mfs.exists(_.path.endsWith(".avro")))
    for (f <- walk(t.location)) {
      val s = new String(bytesOf(f), "ISO-8859-1")
      assert(!s.contains("topsecret"), s"plaintext leak in $f")
    }
    // codec flip back to JSON mid-life: the mixed encrypted tree keeps
    // reading and a CoW-style rewrite carries the avro manifests
    spark.sql("ALTER TABLE genc.db.secav SET TBLPROPERTIES ('write.manifests.format'='json')")
    spark.sql("INSERT INTO genc.db.secav VALUES (4,'topsecret-d')")
    spark.sql("CALL genc.system.rewrite_data_files(table => 'db.secav')")
    assert(spark.sql("SELECT id FROM genc.db.secav ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L))
  }

  test("unencrypted tables are untouched (no crypto conf bleed)") {
    spark.sql("CREATE TABLE genc.db.plain (id BIGINT, v STRING)")
    spark.sql("INSERT INTO genc.db.plain VALUES (1, 'visible')")
    assert(spark.sql("SELECT v FROM genc.db.plain").collect()(0).getString(0) == "visible")
    val t = table("plain")
    val p = t.newScan().planFiles().head.file.path
    assert(new String(bytesOf(p), 0, 4, "ISO-8859-1") == "PAR1")
  }
}
