package graft.spark

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta.GraftIO

/** Model-checked fuzz over synthesized `_delta_log` histories: random
  * adds/removes/schema-change/checkpoint placement, replayed through
  * snapshot_delta and compared row-for-row against an in-memory model of
  * the live file set — both at the final version and at a random
  * mid-history `delta-version-N` tag. Vacuumed prefixes WITHOUT a
  * checkpoint must refuse (gap), WITH one must seed exactly.
  * GRAFT_FUZZ_SOAK=n runs n extra seeds. */
class DeltaLogFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-dfuzz-wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-delta-fuzz")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pad20(v: Long): String = f"$v%020d"

  implicit private class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.size)
      s.foreach(l.add)
      l
    }
  }

  private val baseSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("p", LongType)))
  private val widenedSchema = StructType(
    baseSchema.fields.toSeq :+ StructField("extra", StringType))

  private def metaAction(schema: StructType): String = {
    val sch = graft.core.meta.MetaJson.mapper.writeValueAsString(schema.json)
    s"""{"metaData":{"id":"fz","format":{"provider":"parquet","options":{}},"schemaString":$sch,"partitionColumns":["p"],"configuration":{},"createdTime":1700000000000}}"""
  }

  /** Delta-layout data file: id + v only (p lives in the log) */
  private def writeFile(root: String, rel: String,
      rows: Seq[(Long, String)]): Long = {
    val tmp = Files.createTempDirectory("dfuzz-part").toString
    spark.createDataFrame(rows.map { case (i, v) => Row(i, v) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = GraftIO.walkFiles(tmp).filter(_.endsWith(".parquet")).head
    val dst = GraftIO.toPath(s"$root/$rel")
    Files.createDirectories(dst.getParent)
    Files.copy(GraftIO.toPath(part), dst)
    Files.size(dst)
  }

  private final case class FileState(rel: String, p: Long,
      rows: Seq[(Long, String)], size: Long)

  /** one random history; returns (root, per-version live model) */
  private def synthesize(rnd: Random): (String, Vector[Map[String, FileState]]) = {
    val root = Files.createTempDirectory("dfuzz-src").toString
    val log = s"$root/_delta_log"
    val versions = 3 + rnd.nextInt(6)
    var live = Map.empty[String, FileState]
    var nextId = 0L
    val perVersion = Vector.newBuilder[Map[String, FileState]]
    var schemaChanged = false
    (0 until versions).foreach { v =>
      val lines = Seq.newBuilder[String]
      if (v == 0) lines += metaAction(baseSchema)
      else if (!schemaChanged && rnd.nextInt(4) == 0) {
        lines += metaAction(widenedSchema) // widen mid-history
        schemaChanged = true
      }
      // removes: occasionally drop 1-2 live files (replace semantics)
      val toRemove =
        if (v == 0 || live.isEmpty || rnd.nextInt(3) != 0) Nil
        else rnd.shuffle(live.keys.toSeq).take(1 + rnd.nextInt(2))
      toRemove.foreach { rel =>
        lines += s"""{"remove":{"path":"$rel","deletionTimestamp":1700000001000,"dataChange":true}}"""
        live -= rel
      }
      // adds: 1-3 files in random partitions
      (0 until (1 + rnd.nextInt(3))).foreach { i =>
        val p = rnd.nextInt(3).toLong
        val rows = (0 until (1 + rnd.nextInt(4))).map { _ =>
          nextId += 1; (nextId, s"v$nextId")
        }
        val rel = s"f-$v-$i.parquet"
        val size = writeFile(root, rel, rows)
        lines += s"""{"add":{"path":"$rel","partitionValues":{"p":"$p"},"size":$size,"modificationTime":1700000000000,"dataChange":true}}"""
        live += rel -> FileState(rel, p, rows, size)
      }
      GraftIO.writeString(s"$log/${pad20(v)}.json", lines.result().mkString("\n"))
      perVersion += live
    }
    (root, perVersion.result())
  }

  /** expected (id, v, p) rows for a live-file model */
  private def expect(model: Map[String, FileState]): Seq[(Long, String, Long)] =
    model.values.toSeq.flatMap(f => f.rows.map { case (i, s) => (i, s, f.p) })
      .sortBy(_._1)

  private def got(tbl: String, asOf: Option[Long]): Seq[(Long, String, Long)] = {
    val from = asOf match {
      case Some(v) => s"graft.db.$tbl VERSION AS OF 'delta-version-$v'"
      case None    => s"graft.db.$tbl"
    }
    spark.sql(s"SELECT id, v, p FROM $from ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
  }

  /** replace the json prefix [0, upto] with a parquet checkpoint at
    * `upto` (the vacuumed-history shape) */
  private def checkpoint(root: String, upto: Long,
      model: Map[String, FileState], schema: StructType): Unit = {
    val log = s"$root/_delta_log"
    val addT = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType)))
    val metaT = StructType(Seq(
      StructField("id", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType))))
    val cpSchema = StructType(Seq(
      StructField("add", addT), StructField("metaData", metaT)))
    val rows = model.values.toSeq.map(f =>
      Row(Row(f.rel, Map("p" -> f.p.toString), f.size), null)) :+
      Row(null, Row("fz", schema.json, Seq("p")))
    val tmp = Files.createTempDirectory("dfuzz-cp").toString
    spark.createDataFrame(rows.asJava, cpSchema)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val cpFile = GraftIO.walkFiles(tmp).filter(_.endsWith(".parquet")).head
    Files.copy(GraftIO.toPath(cpFile),
      GraftIO.toPath(s"$log/${pad20(upto)}.checkpoint.parquet"))
    GraftIO.writeString(s"$log/_last_checkpoint",
      s"""{"version":$upto,"size":${rows.length}}""")
    (0L to upto).foreach(v =>
      GraftIO.deleteTree(s"$log/${pad20(v)}.json"))
  }

  private def seeds: Seq[Long] = {
    val extra = sys.env.get("GRAFT_FUZZ_SOAK").flatMap(_.toIntOption).getOrElse(0)
    val base = Seq(11L, 42L, 77L)
    base ++ (0 until extra).map(i => System.nanoTime() + i)
  }

  test("random histories replay to the model (final + mid-history tag)") {
    seeds.foreach { seed =>
      val rnd = new Random(seed)
      val (root, perVersion) = synthesize(rnd)
      val tbl = s"dfz_${seed}_${math.abs(rnd.nextInt())}"
      spark.sql(s"CALL graft.system.snapshot_delta('$root', 'db.$tbl')")
      assert(got(tbl, None) === expect(perVersion.last),
        s"seed=$seed: final state diverged")
      val mid = rnd.nextInt(perVersion.length)
      assert(got(tbl, Some(mid.toLong)) === expect(perVersion(mid)),
        s"seed=$seed: state at delta-version-$mid diverged")
    }
  }

  test("vacuumed prefix WITH a checkpoint seeds exactly; WITHOUT one refuses") {
    seeds.take(2).foreach { seed =>
      val rnd = new Random(seed ^ 0x5eed)
      val (root, perVersion) = synthesize(rnd)
      val n = perVersion.length
      if (n >= 3) {
        val cpAt = 1 + rnd.nextInt(n - 2)
        val schema = baseSchema // checkpoint stores the then-current schema;
        // the widened one (if any) replays from the later json metaData
        checkpoint(root, cpAt.toLong, perVersion(cpAt), schema)
        val tbl = s"dfzcp_${seed}_$cpAt"
        spark.sql(s"CALL graft.system.snapshot_delta('$root', 'db.$tbl')")
        assert(got(tbl, None) === expect(perVersion.last),
          s"seed=$seed cp@$cpAt: final state diverged")
        assert(got(tbl, Some(cpAt.toLong)) === expect(perVersion(cpAt)),
          s"seed=$seed cp@$cpAt: checkpoint seed diverged")
      }
      // vacuum WITHOUT checkpoint: delete version 0 -> loud gap refusal
      val (root2, _) = synthesize(new Random(seed ^ 0xbad))
      GraftIO.deleteTree(s"$root2/_delta_log/${pad20(0)}.json")
      val e = intercept[Exception](spark.sql(
        s"CALL graft.system.snapshot_delta('$root2', 'db.dfz_bad_$seed')"))
      assert(e.getMessage.contains("version 0") ||
        e.getMessage.contains("checkpoint"), e.getMessage)
    }
  }
}
