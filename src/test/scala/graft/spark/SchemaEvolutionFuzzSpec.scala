package graft.spark

import java.nio.file.Files

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Schema-evolution fuzz: a seeded random interleaving of ADD / RENAME /
  * DROP COLUMN, int→bigint and float→double widening, ADD ... DEFAULT,
  * and row appends. The model tracks columns by FIELD IDENTITY (not
  * name), exactly like the format: a rename must keep old files' values
  * readable, a drop must never resurrect values when a later column
  * reuses the name, widening must read old narrow files as the wide
  * type, and an added default must surface for pre-existing rows. */
class SchemaEvolutionFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-sevo-wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-schema-fuzz")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gse", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.gse.warehouse", warehouse)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gse.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** a model column: stable identity + current name + logical type
    * ("int" | "long" | "float" | "double" | "string") */
  private final case class MCol(fid: Int, var name: String, var tpe: String)

  private def runSeed(seed: Int, steps: Int,
      format: String = "parquet", icebergCompat: Boolean = false,
      cat: String = "gse"): Unit = {
    val name = s"sevo_${seed}_$format${if (icebergCompat) "_ice" else ""}"
    val fq = s"$cat.db.$name"
    val compatProp =
      if (icebergCompat) ", 'compatibility.format'='iceberg'" else ""
    spark.sql(s"""CREATE TABLE $fq (id BIGINT)
      TBLPROPERTIES ('write.format.default'='$format'$compatProp)""")

    val rng = new Random(seed)
    var nextFid = 0
    var nextCol = 0
    var nextId = 0L
    val cols = mutable.ArrayBuffer.empty[MCol] // besides id
    // rows: id -> (fid -> value); absent fid = null
    val rows = mutable.LinkedHashMap.empty[Long, mutable.Map[Int, Any]]

    def freshName(): String = { nextCol += 1; s"c$nextCol" }

    def sqlType(t: String): String = t match {
      case "int" => "INT"; case "long" => "BIGINT"; case "float" => "FLOAT"
      case "double" => "DOUBLE"; case _ => "STRING"
    }

    def randType(): String =
      Seq("int", "long", "float", "double", "string")(rng.nextInt(5))

    def randValue(t: String): Any = t match {
      case "int"    => rng.nextInt(1000)
      case "long"   => rng.nextInt(100000).toLong
      case "float"  => (rng.nextInt(100) / 4.0f)
      case "double" => (rng.nextInt(10000) / 8.0d)
      case _        => s"s${rng.nextInt(1000)}"
    }

    def addColumn(): String = {
      val t = randType()
      val c = MCol({ nextFid += 1; nextFid }, freshName(), t)
      val withDefault = t == "long" && rng.nextBoolean()
      if (withDefault) {
        val d = rng.nextInt(100).toLong
        spark.sql(s"ALTER TABLE $fq ADD COLUMN ${c.name} BIGINT DEFAULT $d")
        // initial default: pre-existing rows surface it
        rows.valuesIterator.foreach(_.put(c.fid, d))
      } else {
        spark.sql(s"ALTER TABLE $fq ADD COLUMN ${c.name} ${sqlType(t)}")
      }
      cols += c
      s"add(${c.name}:${c.tpe}${if (withDefault) "+default" else ""})"
    }

    def renameColumn(): String = {
      if (cols.isEmpty) return addColumn()
      val c = cols(rng.nextInt(cols.size))
      val to = freshName()
      spark.sql(s"ALTER TABLE $fq RENAME COLUMN ${c.name} TO $to")
      val from = c.name; c.name = to
      s"rename($from->$to)"
    }

    def dropColumn(): String = {
      if (cols.isEmpty) return addColumn()
      val i = rng.nextInt(cols.size)
      val c = cols.remove(i)
      spark.sql(s"ALTER TABLE $fq DROP COLUMN ${c.name}")
      // values stay in the row map keyed by fid — they must NEVER
      // resurface, even if a later add reuses the name (fresh fid)
      s"drop(${c.name})"
    }

    def widen(): String = {
      val narrow = cols.filter(c => c.tpe == "int" || c.tpe == "float")
      if (narrow.isEmpty) return addColumn()
      val c = narrow(rng.nextInt(narrow.size))
      val to = if (c.tpe == "int") "long" else "double"
      spark.sql(s"ALTER TABLE $fq ALTER COLUMN ${c.name} TYPE ${sqlType(to)}")
      c.tpe = to
      s"widen(${c.name}:$to)"
    }

    def append(): String = {
      val n = 1 + rng.nextInt(12)
      val fields = StructField("id", LongType) +: cols.map(c =>
        StructField(c.name, c.tpe match {
          case "int" => IntegerType; case "long" => LongType
          case "float" => FloatType; case "double" => DoubleType
          case _ => StringType
        })).toSeq
      val data = (0 until n).map { _ =>
        val id = nextId; nextId += 1
        val m = mutable.Map.empty[Int, Any]
        val vals = cols.map { c =>
          val v = randValue(c.tpe)
          m.put(c.fid, v)
          v.asInstanceOf[AnyRef]
        }
        rows.put(id, m)
        org.apache.spark.sql.Row.fromSeq(id +: vals.toSeq)
      }
      val df = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
        StructType(fields.toArray))
      df.coalesce(1).writeTo(fq).append()
      s"append($n x ${cols.size + 1} cols)"
    }

    /** canonical read-side value for comparisons: widen numerics */
    def canon(v: Any): Any = v match {
      case i: Int    => i.toLong
      case f: Float  => f.toDouble
      case other     => other
    }

    def check(step: Int, op: String): Unit = {
      val names = "id" +: cols.map(_.name).toSeq
      val actual = spark.sql(
        s"SELECT ${names.mkString(", ")} FROM $fq ORDER BY id").collect()
        .map(r => names.indices.map(i =>
          if (r.isNullAt(i)) null else canon(r.get(i))).toVector).toVector
      val expected = rows.toVector.sortBy(_._1).map { case (id, m) =>
        (canon(id) +: cols.map(c => m.get(c.fid).map(canon).orNull).toSeq).toVector
      }
      assert(actual == expected,
        s"seed=$seed step=$step after $op cols=${cols.map(c => s"${c.name}:${c.tpe}").mkString(",")}\n" +
          s"  table: ${actual.take(5).mkString("; ")}\n" +
          s"  model: ${expected.take(5).mkString("; ")}")
    }

    check(0, append())
    (1 to steps).foreach { step =>
      val op = rng.nextInt(10) match {
        case 0 | 1 | 2 | 3 => append()
        case 4 | 5         => addColumn()
        case 6             => renameColumn()
        case 7             => dropColumn()
        case 8             => widen()
        case _             =>
          if (rng.nextBoolean()) {
            // compaction rewrites old files under the CURRENT schema —
            // the reads must not change
            spark.sql(s"CALL $cat.system.rewrite_data_files(table => 'db.$name')")
            "rewrite_data_files"
          } else {
            // expiry drops the snapshots that recorded each file's write
            // schema: the entry-persisted write-schema-id must keep
            // renamed columns readable
            spark.sql(
              s"CALL $cat.system.expire_snapshots(table => 'db.$name', retain_last => 1)")
            "expire_snapshots"
          }
      }
      check(step, op)
    }
  }

  test("seeded schema-evolution fuzz, seed 5") { runSeed(5, 30) }
  test("seeded schema-evolution fuzz, seed 71") { runSeed(71, 30) }
  // ORC resolves columns by name: renames must read write-time names
  // through the per-write-schema readers (r9 fix)
  test("seeded schema-evolution fuzz on ORC, seed 13") {
    runSeed(13, 30, format = "orc")
  }
  test("seeded schema-evolution fuzz on Avro, seed 17") {
    runSeed(17, 30, format = "avro")
  }
  // iceberg-compat: every evolution step round-trips the whole schema
  // history through the spec (Appendix-C) metadata dialect — renames,
  // drops, promotions and literal defaults must survive the spec
  // writer/parser pair, not just graft's own JSON
  test("seeded schema-evolution fuzz in iceberg-compat mode, seed 23") {
    runSeed(23, 30, icebergCompat = true)
  }

  /** boot an in-process STANDALONE thrift metastore over its own Derby
    * (HiveCatalogSpec pattern) — the client side then speaks pure
    * thrift, so no second embedded HMSHandler pollutes this JVM */
  private lazy val thriftCatalog: String = {
    val msDir = Files.createTempDirectory("graft-sevo-thrift").toString
    val port = {
      val ss = new java.net.ServerSocket(0)
      try ss.getLocalPort finally ss.close()
    }
    val msConf = new org.apache.hadoop.hive.conf.HiveConf()
    msConf.set("javax.jdo.option.ConnectionURL",
      s"jdbc:derby:;databaseName=$msDir/ms_db;create=true")
    msConf.set("javax.jdo.option.ConnectionDriverName",
      "org.apache.derby.jdbc.EmbeddedDriver")
    msConf.set("hive.metastore.schema.verification", "false")
    msConf.set("datanucleus.schema.autoCreateAll", "true")
    msConf.set("datanucleus.connectionPoolingType", "DBCP")
    msConf.set("hive.metastore.warehouse.dir", s"file://$msDir/wh")
    graft.core.meta.HiveMs.ensureTxnSchema(
      s"jdbc:derby:;databaseName=$msDir/ms_db;create=true")
    @volatile var startupError: Throwable = null
    val server = new Thread(() =>
      try org.apache.hadoop.hive.metastore.HiveMetaStore.startMetaStore(
        port, org.apache.hadoop.hive.shims.ShimLoader.getHadoopThriftAuthBridge,
        msConf)
      catch { case e: Throwable => startupError = e }, "sevo-hms-thrift")
    server.setDaemon(true)
    server.start()
    val deadline = System.currentTimeMillis() + 60000
    var up = false
    while (!up && startupError == null &&
        System.currentTimeMillis() < deadline) {
      try {
        val sck = new java.net.Socket("127.0.0.1", port)
        sck.close(); up = true
      } catch { case _: Throwable => Thread.sleep(200) }
    }
    assert(up, s"thrift metastore did not start: ${Option(startupError)
      .map(_.toString).getOrElse("timeout")}")
    spark.conf.set("spark.sql.catalog.gseh", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gseh.warehouse", s"$msDir/wh")
    spark.conf.set("spark.sql.catalog.gseh.catalog-impl", "hive")
    spark.conf.set("spark.sql.catalog.gseh.uri", s"thrift://127.0.0.1:$port")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gseh.db")
    "gseh"
  }

  // every evolution step's commit (schema DDL, appends, compaction,
  // expiry) CASes the metadata_location pointer over the WIRE through a
  // standalone thrift metastore — the deployment shape the embedded
  // DmlFuzz gfzh arm cannot cover
  test("seeded schema-evolution fuzz over a thrift Hive Metastore, seed 31") {
    runSeed(31, 30, cat = thriftCatalog)
  }

  // opt-in soak: GRAFT_FUZZ_SOAK=n runs n fresh random seeds per config
  sys.env.get("GRAFT_FUZZ_SOAK").map(_.toInt).filter(_ > 0).foreach { n =>
    val base = (System.nanoTime() % 1000000).toInt
    (0 until n).foreach { i =>
      test(s"soak schema-evolution fuzz, seed ${base + i}") {
        runSeed(base + i, 25,
          format = if (i % 3 == 2) "orc" else "parquet",
          icebergCompat = i % 2 == 1,
          cat = if (i % 4 == 3) thriftCatalog else "gse")
      }
    }
  }
}
