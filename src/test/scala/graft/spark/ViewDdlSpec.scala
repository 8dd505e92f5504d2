package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta.MetaJson

/** SQL view DDL routed to the ViewCatalog (reference spark-extensions
  * analysis/RewriteViewCommands.scala + CheckViews.scala +
  * ShowV2ViewsExec.scala): CREATE [OR REPLACE] VIEW, DROP VIEW,
  * SHOW VIEWS, and ALTER VIEW SET/UNSET TBLPROPERTIES work as plain SQL
  * against graft catalogs, producing the same spec-shaped view-metadata
  * documents the create_view procedure writes. */
class ViewDdlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-viewddl").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-viewddl")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.src (k BIGINT, cat STRING)")
    spark.range(0, 30)
      .selectExpr("id AS k", "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS cat")
      .writeTo("graft.db.src").append()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("CREATE VIEW / query / DROP VIEW lifecycle, purely via SQL") {
    spark.sql("""CREATE VIEW graft.db.v_by_cat AS
      SELECT cat, COUNT(*) AS n, SUM(k) AS total FROM graft.db.src GROUP BY cat""")
    val rows = spark.sql(
      "SELECT cat, n, total FROM graft.db.v_by_cat ORDER BY cat").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("even", 15L, 210L), ("odd", 15L, 225L)))
    // plain CREATE on an existing view fails; IF NOT EXISTS is a no-op
    intercept[Exception] {
      spark.sql("CREATE VIEW graft.db.v_by_cat AS SELECT 1 AS one")
    }
    spark.sql("CREATE VIEW IF NOT EXISTS graft.db.v_by_cat AS SELECT 1 AS one")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.v_by_cat").collect()
      .head.getLong(0) === 2L)
    spark.sql("DROP VIEW graft.db.v_by_cat")
    intercept[Exception] { spark.sql("SELECT * FROM graft.db.v_by_cat").collect() }
    // DROP of a missing view: IF EXISTS swallows, plain throws
    spark.sql("DROP VIEW IF EXISTS graft.db.v_by_cat")
    intercept[Exception] { spark.sql("DROP VIEW graft.db.v_by_cat") }
  }

  test("CREATE OR REPLACE appends a spec view version; document stays spec-shaped") {
    spark.sql("""CREATE VIEW graft.db.v_ver
      TBLPROPERTIES ('owner'='teamA')
      AS SELECT k FROM graft.db.src WHERE k < 10""")
    spark.sql("""CREATE OR REPLACE VIEW graft.db.v_ver
      TBLPROPERTIES ('owner'='teamA')
      AS SELECT k FROM graft.db.src WHERE k < 5""")
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.db.v_ver").collect()
      .head.getLong(0) === 5L)
    // the stored document is the spec's view metadata: version list,
    // current-version-id moved, representations carry the SQL
    val doc = MetaJson.mapper.readTree(
      java.nio.file.Files.readString(java.nio.file.Path.of(
        s"$warehouse/db/_views/v_ver.json")))
    assert(doc.get("format-version").asInt === 1)
    assert(doc.get("current-version-id").asInt === 2)
    assert(doc.get("versions").size === 2)
    val reps = doc.get("versions").get(1).get("representations")
    assert(reps.get(0).get("type").asText === "sql")
    assert(reps.get(0).get("sql").asText.contains("k < 5"))
    assert(doc.get("properties").get("owner").asText === "teamA")
    spark.sql("DROP VIEW graft.db.v_ver")
  }

  test("user column list: aliases and comments are stored and served") {
    spark.sql("""CREATE VIEW graft.db.v_cols (category COMMENT 'the bucket', cnt)
      AS SELECT cat, COUNT(*) FROM graft.db.src GROUP BY cat""")
    val got = spark.sql(
      "SELECT category, cnt FROM graft.db.v_cols ORDER BY category").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("even", 15L), ("odd", 15L)))
    // column-count mismatch rejected at create time
    intercept[Exception] {
      spark.sql("CREATE VIEW graft.db.v_bad (a, b, c) AS SELECT 1 AS x, 2 AS y")
    }
    spark.sql("DROP VIEW graft.db.v_cols")
  }

  test("SHOW VIEWS lists catalog views, honors LIKE, flags temp views") {
    spark.sql("CREATE VIEW graft.db.sv_alpha AS SELECT 1 AS a")
    spark.sql("CREATE VIEW graft.db.sv_beta AS SELECT 2 AS b")
    spark.sql("CREATE TEMPORARY VIEW sv_temp AS SELECT 3 AS c")
    val all = spark.sql("SHOW VIEWS IN graft.db").collect()
      .map(r => (r.getString(1), r.getBoolean(2))).toSet
    assert(all.contains(("sv_alpha", false)) && all.contains(("sv_beta", false)))
    assert(all.contains(("sv_temp", true)))
    val like = spark.sql("SHOW VIEWS IN graft.db LIKE 'sv_a*'").collect()
      .map(_.getString(1)).toSet
    assert(like === Set("sv_alpha"))
    spark.sql("DROP VIEW graft.db.sv_alpha")
    spark.sql("DROP VIEW graft.db.sv_beta")
    spark.catalog.dropTempView("sv_temp")
  }

  test("ALTER VIEW SET/UNSET TBLPROPERTIES mutates props without a new version") {
    spark.sql("CREATE VIEW graft.db.v_props AS SELECT 1 AS one")
    spark.sql("ALTER VIEW graft.db.v_props SET TBLPROPERTIES ('a'='1','b'='2')")
    spark.sql("ALTER VIEW graft.db.v_props UNSET TBLPROPERTIES ('b')")
    val doc = MetaJson.mapper.readTree(
      java.nio.file.Files.readString(java.nio.file.Path.of(
        s"$warehouse/db/_views/v_props.json")))
    assert(doc.get("properties").get("a").asText === "1")
    assert(!doc.get("properties").has("b"))
    assert(doc.get("versions").size === 1) // property-only: no new version
    spark.sql("DROP VIEW graft.db.v_props")
  }

  test("guards: temp-view reference, self-reference, table shadowing") {
    spark.sql("CREATE TEMPORARY VIEW guard_tmp AS SELECT 7 AS g")
    val e1 = intercept[Exception] {
      spark.sql("CREATE VIEW graft.db.v_guard AS SELECT * FROM guard_tmp")
    }
    assert(e1.getMessage.contains("temporary"))
    spark.catalog.dropTempView("guard_tmp")
    val e2 = intercept[Exception] {
      spark.sql("CREATE OR REPLACE VIEW graft.db.v_self AS SELECT * FROM graft.db.v_self")
    }
    assert(e2.getMessage.contains("itself") ||
      e2.getMessage.toLowerCase.contains("not found"))
    // a view must not shadow an existing table
    intercept[Exception] {
      spark.sql("CREATE VIEW graft.db.src AS SELECT 1 AS one")
    }
  }

  test("CTE names in the view body never re-qualify into table references") {
    // the CTE name deliberately shadows a REAL table: a read that
    // re-qualified `src` would silently return 30 rows from the table
    // instead of the CTE's 1
    spark.sql("""CREATE VIEW graft.db.v_cte AS
      WITH src AS (SELECT 42 AS k) SELECT k FROM src""")
    val got = spark.sql("SELECT k FROM graft.db.v_cte").collect()
    assert(got.length === 1 && got.head.getInt(0) === 42)
    spark.sql("DROP VIEW graft.db.v_cte")
  }

  test("duplicate query output names resolve positionally via the column list") {
    spark.sql("""CREATE VIEW graft.db.v_dup (lo, hi) AS
      SELECT MIN(k), MAX(k) FROM (SELECT k, k FROM graft.db.src)""")
    spark.sql("DROP VIEW graft.db.v_dup")
    // the sharp case: the QUERY exposes the same name twice
    spark.sql("CREATE VIEW graft.db.v_dup2 (a, b) AS SELECT k, k FROM graft.db.src")
    val r = spark.sql(
      "SELECT a, b FROM graft.db.v_dup2 WHERE a = 3").collect()
    assert(r.length === 1 && r.head.getLong(0) === 3L && r.head.getLong(1) === 3L)
    spark.sql("DROP VIEW graft.db.v_dup2")
  }

  test("temp function inside a subquery is rejected at create time") {
    spark.udf.register("vddl_tmp_fn", (x: Long) => x + 1)
    val e = intercept[Exception] {
      spark.sql("""CREATE VIEW graft.db.v_subfn AS
        SELECT (SELECT MAX(vddl_tmp_fn(k)) FROM graft.db.src) AS m""")
    }
    assert(e.getMessage.contains("temporary"))
  }

  test("ALTER VIEW AS redefines (new version, props kept); RENAME moves the doc") {
    spark.sql("""CREATE VIEW graft.db.v_alter
      TBLPROPERTIES ('keepme'='1')
      AS SELECT k FROM graft.db.src WHERE k < 10""")
    spark.sql("ALTER VIEW graft.db.v_alter AS SELECT k FROM graft.db.src WHERE k < 4")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.v_alter").collect()
      .head.getLong(0) === 4L)
    val doc = MetaJson.mapper.readTree(
      java.nio.file.Files.readString(java.nio.file.Path.of(
        s"$warehouse/db/_views/v_alter.json")))
    assert(doc.get("versions").size === 2)
    assert(doc.get("properties").get("keepme").asText === "1")
    // ALTER VIEW AS on a missing view fails
    intercept[Exception] {
      spark.sql("ALTER VIEW graft.db.v_ghost AS SELECT 1 AS one")
    }
    spark.sql("ALTER VIEW graft.db.v_alter RENAME TO v_renamed")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.v_renamed").collect()
      .head.getLong(0) === 4L)
    intercept[Exception] { spark.sql("SELECT * FROM graft.db.v_alter").collect() }
    spark.sql("DROP VIEW graft.db.v_renamed")
  }

  test("SHOW CREATE TABLE renders a view; CREATE TABLE can't shadow a view") {
    spark.sql("""CREATE VIEW graft.db.v_show (total COMMENT 'sum')
      TBLPROPERTIES ('team'='data')
      AS SELECT SUM(k) FROM graft.db.src""")
    val stmt = spark.sql("SHOW CREATE TABLE graft.db.v_show")
      .collect().head.getString(0)
    assert(stmt.contains("CREATE VIEW `graft`.`db`.`v_show`"))
    assert(stmt.contains("`total` COMMENT 'sum'"))
    assert(stmt.contains("'team' = 'data'"))
    assert(stmt.contains("AS SELECT SUM(k) FROM graft.db.src"))
    // a table must not shadow the view
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.db.v_show (x BIGINT)")
    }
    spark.sql("DROP VIEW graft.db.v_show")
  }

  test("indirect view cycles are rejected at redefinition time") {
    spark.sql("CREATE VIEW graft.db.cyc_a AS SELECT k FROM graft.db.src")
    spark.sql("CREATE VIEW graft.db.cyc_b AS SELECT k FROM graft.db.cyc_a")
    // a -> b while b -> a: both redefinition spellings must refuse
    val e1 = intercept[Exception] {
      spark.sql("ALTER VIEW graft.db.cyc_a AS SELECT k FROM graft.db.cyc_b")
    }
    assert(e1.getMessage.contains("cyclic"))
    val e2 = intercept[Exception] {
      spark.sql("CREATE OR REPLACE VIEW graft.db.cyc_a AS SELECT k FROM graft.db.cyc_b")
    }
    assert(e2.getMessage.contains("cyclic"))
    // both views still read fine afterwards
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.cyc_b").collect()
      .head.getLong(0) === 30L)
    spark.sql("DROP VIEW graft.db.cyc_b")
    spark.sql("DROP VIEW graft.db.cyc_a")
  }

  test("shadow guards: CTAS, table rename, and view rename all refuse") {
    spark.sql("CREATE VIEW graft.db.sh_v AS SELECT 1 AS one")
    // CTAS onto a view name
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.db.sh_v AS SELECT 2 AS two")
    }
    // table renamed onto a view name
    spark.sql("CREATE TABLE graft.db.sh_t (x BIGINT)")
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.sh_t RENAME TO sh_v")
    }
    // view renamed onto a table name
    intercept[Exception] {
      spark.sql("ALTER VIEW graft.db.sh_v RENAME TO sh_t")
    }
    // cross-catalog view rename is an explicit error, not a ghost dir
    val e = intercept[Exception] {
      spark.sql("ALTER VIEW graft.db.sh_v RENAME TO spark_catalog.default.x")
    }
    assert(e.getMessage.contains("across catalogs"))
    // everything still intact
    assert(spark.sql("SELECT one FROM graft.db.sh_v").collect()
      .head.getInt(0) === 1)
    spark.sql("DROP TABLE graft.db.sh_t")
    spark.sql("DROP VIEW graft.db.sh_v")
  }

  test("SHOW CREATE TABLE escapes quotes in comments and property values") {
    spark.sql("""CREATE VIEW graft.db.v_esc (c COMMENT 'it''s')
      TBLPROPERTIES ('k'='a''b')
      AS SELECT 1""")
    val stmt = spark.sql("SHOW CREATE TABLE graft.db.v_esc")
      .collect().head.getString(0)
    assert(stmt.contains("COMMENT 'it''s'"))
    assert(stmt.contains("'k' = 'a''b'"))
    spark.sql("DROP VIEW graft.db.v_esc")
  }

  test("DESCRIBE and DESCRIBE EXTENDED serve the stored view schema") {
    spark.sql("""CREATE VIEW graft.db.d_v (a COMMENT 'first', b)
      COMMENT 'view doc' TBLPROPERTIES ('team'='core')
      AS SELECT 1, 'x'""")
    val basic = spark.sql("DESCRIBE graft.db.d_v").collect()
    assert(basic.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(basic.head.getString(1) === "int")
    assert(basic.head.getString(2) === "first")
    assert(basic(1).getString(1) === "string")
    val ext = spark.sql("DESCRIBE EXTENDED graft.db.d_v").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ext("Type") === "VIEW")
    assert(ext("Catalog") === "graft")
    assert(ext("Namespace") === "db")
    assert(ext("View") === "d_v")
    assert(ext("Comment") === "view doc")
    assert(ext("View Text").contains("SELECT 1"))
    assert(ext("View Properties").contains("team=core"))
    // tables keep Spark's own DESCRIBE
    assert(spark.sql("DESCRIBE graft.db.src").collect().nonEmpty)
    // single-column form (info_name/info_value rows)
    val colRows = spark.sql("DESCRIBE graft.db.d_v a").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(colRows("col_name") === "a")
    assert(colRows("data_type") === "int")
    assert(colRows("comment") === "first")
    intercept[Exception] { spark.sql("DESCRIBE graft.db.d_v nope").collect() }
    // nested columns resolve through struct fields
    spark.sql("""CREATE VIEW graft.db.d_nv AS
      SELECT named_struct('x', 1, 'y', 'z') AS st""")
    val nested = spark.sql("DESCRIBE graft.db.d_nv st.x").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(nested("col_name") === "x" && nested("data_type") === "int")
    intercept[Exception] { spark.sql("DESCRIBE graft.db.d_nv st.nope").collect() }
    spark.sql("DROP VIEW graft.db.d_nv")
    spark.sql("DROP VIEW graft.db.d_v")
  }

  test("SHOW TBLPROPERTIES on a view: all keys, one key, missing key") {
    spark.sql("""CREATE VIEW graft.db.p_v
      TBLPROPERTIES ('k1'='v1', 'k2'='v2') AS SELECT 1""")
    val all = spark.sql("SHOW TBLPROPERTIES graft.db.p_v").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(all.get("k1").contains("v1") && all.get("k2").contains("v2"))
    val one = spark.sql("SHOW TBLPROPERTIES graft.db.p_v ('k1')").collect()
    assert(one.length === 1 && one.head.getString(1) === "v1")
    val missing = spark.sql("SHOW TBLPROPERTIES graft.db.p_v ('nope')").collect()
    assert(missing.head.getString(1).contains("does not have property"))
    spark.sql("DROP VIEW graft.db.p_v")
  }

  test("stored resolution context: unqualified names resolve as at creation") {
    // create under USE graft.db with a bare table name; read from a
    // DIFFERENT current catalog/namespace later
    spark.sql("USE graft.db")
    spark.sql("CREATE VIEW ctx_v AS SELECT COUNT(*) AS n FROM src")
    spark.sql("USE spark_catalog.default")
    assert(spark.sql("SELECT n FROM graft.db.ctx_v").collect().head.getLong(0) === 30L)
    spark.sql("DROP VIEW graft.db.ctx_v")
  }

  test("stored resolution context: unqualified UDF/UDTF bind as at creation") {
    // reference ResolveViews.qualifyFunctionIdentifiers: a view created
    // under USE graft.db that calls an unqualified catalog-stored
    // function must bind THAT function from any later context — while
    // built-ins in the same body stay built-ins
    spark.sql("CALL graft.system.create_udf('db.v_plus2', 'x bigint', 'bigint', 'x + 2')")
    spark.sql("CALL graft.system.create_udtf('db.v_rows', '', 'SELECT id AS n FROM range(3)')")
    spark.sql("USE graft.db")
    spark.sql("""CREATE VIEW fn_v AS
      SELECT v_plus2(k) AS p, abs(-k) AS a FROM src WHERE k = 1""")
    spark.sql("CREATE VIEW tvf_v AS SELECT SUM(n) AS s FROM v_rows()")
    spark.sql("USE spark_catalog.default")
    val r = spark.sql("SELECT p, a FROM graft.db.fn_v").collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 1L)
    assert(spark.sql("SELECT s FROM graft.db.tvf_v").collect().head.getLong(0) === 3L)
    spark.sql("DROP VIEW graft.db.fn_v")
    spark.sql("DROP VIEW graft.db.tvf_v")
  }
}
