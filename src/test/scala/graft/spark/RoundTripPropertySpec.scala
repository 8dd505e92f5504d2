package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Arbitrary}
import org.scalacheck.rng.Seed
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Randomized schema/data round-trips through graft tables in all three
  * file formats — the reference's core test strategy (its RandomData /
  * RandomGenericData generators feed parquet/orc/avro round-trip suites);
  * here scalacheck generates the shapes. Seeds are FIXED so a failure
  * reproduces: every case logs its seed, and the generated schema is in
  * the table it created.
  *
  * Each case: generate a nested schema + rows (with nulls), CTAS a graft
  * table with `write.format.default` = parquet|orc|avro, read it back,
  * and compare exact multisets (a unique id column makes except()-based
  * set comparison multiset-exact).
  */
class RoundTripPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val warehouse = Files.createTempDirectory("graft-roundtrip-wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-roundtrip")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---- generators ----------------------------------------------------

  private val leafGen: Gen[DataType] = Gen.oneOf(
    LongType, IntegerType, ShortType, ByteType, StringType, DoubleType,
    FloatType, BooleanType, DateType, TimestampType, BinaryType,
    DecimalType(9, 2))

  private def typeGen(depth: Int): Gen[DataType] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      6 -> leafGen,
      1 -> Gen.listOfN(2, typeGen(depth - 1)).map(ts =>
        StructType(ts.zipWithIndex.map { case (t, i) =>
          StructField(s"s$i", t, nullable = true) })),
      1 -> typeGen(depth - 1).map(ArrayType(_, containsNull = true)))

  private def schemaGen: Gen[StructType] =
    Gen.choose(2, 6).flatMap { n =>
      Gen.listOfN(n, typeGen(2)).map(ts =>
        StructType(StructField("id", LongType, nullable = false) +:
          ts.zipWithIndex.map { case (t, i) =>
            StructField(s"c$i", t, nullable = true) }))
    }

  private def valueGen(dt: DataType): Gen[Any] = dt match {
    case LongType    => Arbitrary.arbitrary[Long]
    case IntegerType => Arbitrary.arbitrary[Int]
    case ShortType   => Arbitrary.arbitrary[Short]
    case ByteType    => Arbitrary.arbitrary[Byte]
    case BooleanType => Arbitrary.arbitrary[Boolean]
    case StringType  => Gen.choose(0, 16).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    // finite, exactly-representable range; NaN would break equality
    case DoubleType  => Gen.choose(-1000000000L, 1000000000L).map(v => v / 1024.0)
    case FloatType   => Gen.choose(-1000000L, 1000000L).map(v => v / 64.0f)
    case DateType    => Gen.choose(-10000, 30000).map(d =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.toLong)))
    // millisecond precision inside [1900, 2100] — exact in all formats
    case TimestampType => Gen.choose(-2208988800000L, 4102444800000L)
      .map(ms => new java.sql.Timestamp(ms))
    case BinaryType  => Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Arbitrary.arbitrary[Byte]).map(_.toArray))
    case _: DecimalType => Gen.choose(-999999999L, 999999999L).map(v =>
      new java.math.BigDecimal(java.math.BigInteger.valueOf(v), 2))
    case ArrayType(et, _) => Gen.choose(0, 4).flatMap(n =>
      Gen.listOfN(n, nullable(valueGen(et))).map(_.toSeq))
    case st: StructType =>
      Gen.sequence[List[Any], Any](st.fields.toList.map(f =>
        nullable(valueGen(f.dataType)))).map(vs => Row.fromSeq(vs))
    case other => sys.error(s"no generator for $other")
  }

  private def nullable(g: Gen[Any]): Gen[Any] =
    Gen.frequency(9 -> g, 1 -> Gen.const(null))

  private def rowGen(schema: StructType, id: Long): Gen[Row] =
    Gen.sequence[List[Any], Any](schema.fields.toList.tail.map(f =>
      nullable(valueGen(f.dataType))))
      .map(vs => Row.fromSeq(id +: vs))

  private def pure[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // ---- the property --------------------------------------------------

  private val formats = Seq("parquet", "orc", "avro")
  private val CasesPerFormat = 4

  for (fmt <- formats; k <- 0 until CasesPerFormat)
    test(s"random round-trip $fmt case $k") {
      val seed = 1000L * (formats.indexOf(fmt) + 1) + k
      val schema = pure(schemaGen, seed)
      val nRows = 40
      val rows = (0 until nRows).map(i =>
        pure(rowGen(schema, i.toLong), seed + 7919L * (i + 1)))
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)
      val tbl = s"graft.db.rt_${fmt}_$k"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      df.writeTo(tbl).tableProperty("write.format.default", fmt).create()
      val back = spark.table(tbl)
      assert(back.count() == nRows, s"seed=$seed: row count")
      val missing = df.exceptAll(back).count()
      val extra = back.exceptAll(df).count()
      assert(missing == 0 && extra == 0,
        s"seed=$seed fmt=$fmt: $missing rows lost, $extra rows changed; schema=$schema")
    }
}
