package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta.{GraftIO, MetaJson}

/** Catalog-stored SQL UDFs (format/udf-spec.md): create/drop/rollback
  * procedures, overload selection, spec-shaped metadata files, and
  * invocation through both the macro-expansion rule and the
  * FunctionCatalog fallback. */
class UdfSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-udf").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-udf")
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

  test("create, call, and drop a scalar SQL UDF") {
    spark.sql("""CALL graft.system.create_udf('db.add_one', 'x int', 'int', 'x + 1')""")
    assert(spark.sql("SELECT graft.db.add_one(41) AS r").collect()(0).getInt(0) === 42)
    // body participates in expressions like any built-in
    assert(spark.sql("SELECT graft.db.add_one(1) + graft.db.add_one(2) AS r")
      .collect()(0).getInt(0) === 5)
    // over a table
    spark.sql("CREATE TABLE graft.db.udft (v BIGINT)")
    spark.range(0, 10).selectExpr("id AS v").writeTo("graft.db.udft").append()
    spark.sql("""CALL graft.system.create_udf('db.double_it', 'x bigint', 'bigint', 'x * 2')""")
    val sum = spark.sql("SELECT SUM(graft.db.double_it(v)) AS s FROM graft.db.udft")
      .collect()(0).getLong(0)
    assert(sum === 90L)
    assert(spark.sql("CALL graft.system.drop_udf('db.double_it')")
      .collect()(0).getBoolean(0))
    intercept[Exception] {
      spark.sql("SELECT graft.db.double_it(1)").collect()
    }
  }

  test("overloads select by signature, widening when needed") {
    spark.sql("""CALL graft.system.create_udf('db.sig', 'x int', 'string', "'int'")""")
    spark.sql("""CALL graft.system.create_udf('db.sig', 'x double', 'string', "'double'")""")
    spark.sql("""CALL graft.system.create_udf('db.sig', 'x int, y int', 'string', "'two'")""")
    assert(spark.sql("SELECT graft.db.sig(1) AS r").collect()(0).getString(0) === "int")
    assert(spark.sql("SELECT graft.db.sig(1.5D) AS r").collect()(0).getString(0) === "double")
    assert(spark.sql("SELECT graft.db.sig(1, 2) AS r").collect()(0).getString(0) === "two")
    // long widens to double (no long overload)
    assert(spark.sql("SELECT graft.db.sig(CAST(7 AS BIGINT)) AS r")
      .collect()(0).getString(0) === "double")
  }

  test("versioning: replace adds a version, rollback restores") {
    spark.sql("""CALL graft.system.create_udf('db.vfn', 'x int', 'int', 'x + 10')""")
    assert(spark.sql("SELECT graft.db.vfn(1) AS r").collect()(0).getInt(0) === 11)
    spark.sql(
      """CALL graft.system.create_udf('db.vfn', 'x int', 'int', 'x + 20', replace => true)""")
    assert(spark.sql("SELECT graft.db.vfn(1) AS r").collect()(0).getInt(0) === 21)
    // without replace, same signature is rejected
    intercept[Exception] {
      spark.sql("""CALL graft.system.create_udf('db.vfn', 'x int', 'int', 'x + 30')""")
    }
    spark.sql("CALL graft.system.rollback_udf('db.vfn', 'int', 1)")
    assert(spark.sql("SELECT graft.db.vfn(1) AS r").collect()(0).getInt(0) === 11)
  }

  test("metadata file follows the udf-spec shape") {
    spark.sql("""CALL graft.system.create_udf('db.spec_fn', 'a decimal(9,2), b string',
      'string', "concat(b, ':', CAST(a AS STRING))")""")
    val dir = GraftIO.toPath(s"$warehouse/db/_udfs/spec_fn")
    assert(java.nio.file.Files.isDirectory(dir))
    val files = java.nio.file.Files.list(dir).iterator()
    assert(files.hasNext)
    val n = MetaJson.mapper.readTree(
      GraftIO.readString(s"$warehouse/db/_udfs/spec_fn/v1.metadata.json"))
    assert(n.get("format-version").asInt() === 1)
    assert(n.has("function-uuid"))
    val d = n.get("definitions").get(0)
    assert(d.get("definition-id").asText() === "decimal(9,2),string")
    assert(d.get("function-type").asText() === "udf")
    assert(d.get("current-version-id").asInt() === 1)
    val rep = d.get("versions").get(0).get("representations").get(0)
    assert(rep.get("type").asText() === "sql")
    assert(rep.get("dialect").asText() === "spark")
    assert(n.has("definition-log"))
    // and it runs
    assert(spark.sql("SELECT graft.db.spec_fn(CAST(1.50 AS DECIMAL(9,2)), 'p') AS r")
      .collect()(0).getString(0) === "p:1.50")
  }

  test("udtf: stored table function expands as an inlined subquery") {
    spark.sql("CREATE TABLE graft.db.tvf_src (id BIGINT, grp STRING)")
    spark.sql("""INSERT INTO graft.db.tvf_src VALUES
      (1, 'a'), (2, 'a'), (3, 'b'), (4, 'b'), (5, 'b')""")
    spark.sql("""CALL graft.system.create_udtf('db.by_group', 'g string',
      'SELECT id FROM graft.db.tvf_src WHERE grp = g')""")
    // Spark's parser only allows bare table-valued-function names, so
    // stored UDTFs resolve against the current catalog + namespace
    spark.sql("USE graft.db")
    try {
      val rows = spark.sql("SELECT * FROM by_group('b') ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(rows === Seq(3L, 4L, 5L))
    } finally spark.sql("USE spark_catalog.default")
    // derived return-type struct recorded per spec
    val n = MetaJson.mapper.readTree(GraftIO.readString(
      s"$warehouse/db/_udfs/by_group/v1.metadata.json"))
    val d = n.get("definitions").get(0)
    assert(d.get("function-type").asText() === "udtf")
    assert(d.get("return-type").asText() === "struct<id:long>")
  }

  test("on_null_input return-null short-circuits; call invokes the body") {
    spark.sql("""CALL graft.system.create_udf('db.nn', 'x int', 'int',
      'coalesce(x, 42)', on_null_input => 'return-null')""")
    spark.sql("""CALL graft.system.create_udf('db.nc', 'x int', 'int',
      'coalesce(x, 42)', on_null_input => 'call')""")
    assert(spark.sql("SELECT graft.db.nn(CAST(NULL AS INT)) AS r").collect()(0).isNullAt(0))
    assert(spark.sql("SELECT graft.db.nc(CAST(NULL AS INT)) AS r").collect()(0).getInt(0) === 42)
    assert(spark.sql("SELECT graft.db.nn(1) AS r").collect()(0).getInt(0) === 1)
  }

  test("non-deterministic arguments evaluate once, not per occurrence") {
    // zero(x) = x - x must be 0 for ANY single evaluation of x; macro
    // expansion splicing rand() twice would make it almost surely nonzero
    spark.sql("CALL graft.system.create_udf('db.zero', 'x double', 'double', 'x - x')")
    val vals = spark.sql(
      "SELECT graft.db.zero(rand()) AS r FROM range(0, 100)").collect().map(_.getDouble(0))
    assert(vals.forall(_ == 0.0))
  }

  test("udtf parameter colliding with a body column is rejected at creation") {
    spark.sql("CREATE TABLE graft.db.tvf_amb (id BIGINT, grp STRING)")
    spark.sql("INSERT INTO graft.db.tvf_amb VALUES (1, 'a')")
    intercept[Exception] {
      spark.sql("""CALL graft.system.create_udtf('db.amb', 'id bigint',
        'SELECT id, grp FROM graft.db.tvf_amb WHERE id > 0')""")
    }
    // renamed parameter is fine
    spark.sql("""CALL graft.system.create_udtf('db.amb', 'min_id bigint',
      'SELECT id, grp FROM graft.db.tvf_amb WHERE id > min_id')""")
    // a parameter the body never references is NOT a collision
    spark.sql("""CALL graft.system.create_udtf('db.amb_unused', 'unused int',
      'SELECT id FROM graft.db.tvf_amb')""")
  }

  test("udf body referencing an unknown name fails instead of capturing columns") {
    spark.sql("CALL graft.system.create_udf('db.leak', 'x bigint', 'bigint', 'x + v')")
    spark.sql("CREATE TABLE graft.db.leakt (v BIGINT)")
    spark.sql("INSERT INTO graft.db.leakt VALUES (100)")
    // 'v' must NOT silently bind to the calling query's column
    intercept[Exception] {
      spark.sql("SELECT graft.db.leak(1) AS r FROM graft.db.leakt").collect()
    }
  }

  test("concurrent overload creation: version CAS loses no definition") {
    // 6 threads each add a DIFFERENT signature to the same function;
    // the version-file CAS must serialize them without losing any
    val types = Seq("int", "long", "double", "string", "boolean", "date")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    try {
      val futures = types.map { t =>
        pool.submit(new Runnable {
          override def run(): Unit =
            GraftUdfStore.createOrReplace(warehouse, Seq("db"), "cc_fn",
              Seq(GraftUdfStore.UdfParam("x", t)), "string", "udf",
              s"'$t'", deterministic = true, onNullInput = "call",
              replace = false)
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    val udf = GraftUdfStore.load(warehouse, Seq("db"), "cc_fn").get
    assert(udf.definitions.map(_.definitionId).toSet === types.toSet)
    // and they all resolve
    assert(spark.sql("SELECT graft.db.cc_fn(1.5D) AS r").collect()(0).getString(0) === "double")
    assert(spark.sql("SELECT graft.db.cc_fn('s') AS r").collect()(0).getString(0) === "string")
  }

  test("udf calling built-in functions and used in WHERE") {
    spark.sql("""CALL graft.system.create_udf('db.norm', 's string', 'string',
      'upper(trim(s))')""")
    assert(spark.sql("SELECT graft.db.norm('  hi ') AS r").collect()(0).getString(0) === "HI")
    spark.sql("CREATE TABLE graft.db.udfw (s STRING)")
    spark.sql("INSERT INTO graft.db.udfw VALUES (' a '), ('b'), (' C')")
    val got = spark.sql(
      "SELECT s FROM graft.db.udfw WHERE graft.db.norm(s) = 'C'").collect()
    assert(got.length === 1 && got(0).getString(0) === " C")
  }
}
