package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** r18: the multimodal stubs (p12/p15) moved from a typed mapPartitions
  * to codegen BinaryByteSum over substring slices. The expression
  * formulation must reproduce the byte loops exactly on the corpus. */
class ByteExprsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-byteexprs")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("p12 expression features equal the byte-loop reference") {
    val sp = spark
    import sp.implicits._
    val blobs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text").cast(BinaryType).as("blob"))
    // the exact loop the mapPartitions version ran
    val ref = blobs.as[(Long, Array[Byte])].map { case (id, blob) =>
      var sum = 0L
      var i = 0
      while (i < blob.length) { sum += blob(i) & 0xff; i += 1 }
      (id, blob.length.toLong, (blob(0) & 0xff).toLong,
        (blob(blob.length - 1) & 0xff).toLong, sum % 65536)
    }.toDF("doc_id", "r_n", "r_first", "r_last", "r_ck")
    val got = blobs.select(col("doc_id"),
      length(col("blob")).cast(LongType).as("n_bytes"),
      ByteFunctions.byteSum(expr("substring(blob, 1, 1)")).as("first_byte"),
      ByteFunctions.byteSum(expr("substring(blob, length(blob), 1)")).as("last_byte"),
      (ByteFunctions.byteSum(col("blob")) % 65536).as("checksum"))
    val bad = got.join(ref, "doc_id")
      .filter(col("n_bytes") =!= col("r_n") ||
        col("first_byte") =!= col("r_first") ||
        col("last_byte") =!= col("r_last") ||
        col("checksum") =!= col("r_ck"))
      .count()
    assert(bad === 0)
  }

  test("p15 expression frames equal the frame-loop reference") {
    val sp = spark
    import sp.implicits._
    val blobs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text").cast(BinaryType).as("blob"))
    val ref = blobs.as[(Long, Array[Byte])].flatMap { case (id, blob) =>
      val frames = math.min(8, (blob.length + 63) / 64)
      (0 until frames).iterator.map { f =>
        val start = f * 64
        val end = math.min(start + 64, blob.length)
        var sum = 0L
        var i = start
        while (i < end) { sum += blob(i) & 0xff; i += 1 }
        (id, f, (end - start).toLong, sum % 65536)
      }
    }.toDF("doc_id", "frame_idx", "r_n", "r_ck")
    val got = blobs
      .withColumn("nb", length(col("blob")))
      .filter(col("nb") > 0)
      .select(col("doc_id"), col("blob"),
        explode(expr("sequence(0, least(7, cast((nb + 63) div 64 as int) - 1))"))
          .as("frame_idx"))
      .withColumn("fb", expr("substring(blob, frame_idx * 64 + 1, 64)"))
      .select(col("doc_id"), col("frame_idx"),
        length(col("fb")).cast(LongType).as("n_bytes"),
        (ByteFunctions.byteSum(col("fb")) % 65536).as("checksum"))
    assert(got.count() === ref.count())
    val bad = got.join(ref, Seq("doc_id", "frame_idx"))
      .filter(col("n_bytes") =!= col("r_n") || col("checksum") =!= col("r_ck"))
      .count()
    assert(bad === 0)
  }

  test("byteSum edges: empty binary is 0, high bytes are unsigned") {
    val out = spark.sql(
      """SELECT * FROM VALUES (CAST('' AS BINARY)), (X'00FF7F80')
        |AS t(b)""".stripMargin)
      .select(ByteFunctions.byteSum(col("b")).as("s"))
      .collect().map(_.getLong(0))
    assert(out(0) === 0L)
    assert(out(1) === 0L + 0xff + 0x7f + 0x80)
  }
}
