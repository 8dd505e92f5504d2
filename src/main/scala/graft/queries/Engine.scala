package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.meta.HadoopCatalog
import Tables._

/** Gate queries that exercise the graft table format end-to-end through
  * the DSv2 catalog: write testdata into partitioned graft tables once
  * per (session, sf), then run reads whose results a DuckDB oracle can
  * reproduce from the original parquet. Covers: hidden-partitioned
  * scans with pushdown pruning, snapshot isolation/time travel,
  * metadata-only DELETE, dynamic partition overwrite, schema evolution.
  */
object Engine {

  private val built = scala.collection.mutable.Set.empty[String]

  private def warehouse(dir: String): String =
    s"/tmp/graft_wh_${dir.replaceAll("[^A-Za-z0-9]", "_")}"

  /** idempotent per-JVM setup: catalog conf + tables */
  private def setup(s: SparkSession, dir: String): Unit = synchronized {
    val wh = warehouse(dir)
    if (built.contains(wh)) return
    s.conf.set("spark.sql.catalog.graft", classOf[graft.spark.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.warehouse", wh)

    val cat = new HadoopCatalog(wh)
    val complete = cat.loadTable(Seq("db"), "lineitem_g")
      .exists(_.meta.properties.get("build-complete").contains("true"))
    if (!complete) {
      // wipe any partial previous build
      Seq("lineitem_g", "orders_snap", "orders_del", "part_ow", "cust_evo")
        .foreach(t => cat.dropTable(Seq("db"), t))
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")

      // lineitem partitioned by month(l_shipdate) — hidden partitioning
      s.sql("""CREATE TABLE graft.db.lineitem_g (
        l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,
        l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE,
        l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,
        l_linestatus STRING, l_shipdate TIMESTAMP)
        PARTITIONED BY (months(l_shipdate))""")
      t(s, dir, "lineitem").writeTo("graft.db.lineitem_g").append()

      // two appends → snapshot isolation / time travel
      s.sql("""CREATE TABLE graft.db.orders_snap (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING)""")
      val o = t(s, dir, "orders")
      o.filter(col("o_orderkey") % 2 === 0).writeTo("graft.db.orders_snap").append()
      o.filter(col("o_orderkey") % 2 === 1).writeTo("graft.db.orders_snap").append()

      // metadata-only delete on a month boundary
      s.sql("""CREATE TABLE graft.db.orders_del (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP)
        PARTITIONED BY (months(o_orderdate))""")
      o.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .writeTo("graft.db.orders_del").append()
      s.sql("DELETE FROM graft.db.orders_del WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'")

      // dynamic partition overwrite: Brand#1 rows replaced with doubled price
      s.sql("""CREATE TABLE graft.db.part_ow (
        p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE)
        PARTITIONED BY (p_brand)""")
      val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_retailprice")
      p.writeTo("graft.db.part_ow").append()
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      p.filter(col("p_brand") === "Brand#1")
        .withColumn("p_retailprice", col("p_retailprice") * 2)
        .writeTo("graft.db.part_ow").overwritePartitions()

      // schema evolution: insert, add column, insert again
      s.sql("CREATE TABLE graft.db.cust_evo (c_custkey BIGINT, c_name STRING)")
      val c = t(s, dir, "customer")
      c.filter(col("c_custkey") <= 100).select("c_custkey", "c_name")
        .writeTo("graft.db.cust_evo").append()
      s.sql("ALTER TABLE graft.db.cust_evo ADD COLUMN c_mktsegment STRING")
      c.filter(col("c_custkey") > 100)
        .select("c_custkey", "c_name", "c_mktsegment")
        .writeTo("graft.db.cust_evo").append()

      new HadoopCatalog(wh).loadTable(Seq("db"), "lineitem_g").get
        .updateProperties(Map("build-complete" -> "true"))
    }
    built += wh
  }

  // ------------------------------------------------------------------ g01
  private val g01 = Q(
    "g01_engine_scan_prune",
    (s, dir) => {
      setup(s, dir)
      // same computation as q06 but through the graft table: month-partition
      // pruning + parquet row-group pruning serve the filter
      s.table("graft.db.lineitem_g")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
          pct(col("l_discount")).between(5, 7) && col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice")) * pct(col("l_discount")))
          .as("revenue_e4"), count(lit(1)).as("n"))
    },
    Some("""
      SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)
                 * CAST(CAST(l_discount AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS revenue_e4,
             COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND CAST(CAST(l_discount AS DECIMAL(18,2))*100 AS BIGINT) BETWEEN 5 AND 7
        AND l_quantity < 24"""),
    headline = true)

  // ------------------------------------------------------------------ g02
  private val g02 = Q(
    "g02_engine_time_travel",
    (s, dir) => {
      setup(s, dir)
      val table = new HadoopCatalog(warehouse(dir)).loadTable(Seq("db"), "orders_snap").get
      val firstSnap = table.meta.snapshots
        .filter(_.operation == "append").minBy(_.sequenceNumber).snapshotId
      s.read.option("snapshot-id", firstSnap.toString).table("graft.db.orders_snap")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_e2"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM orders WHERE o_orderkey % 2 = 0
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  // ------------------------------------------------------------------ g03
  private val g03 = Q(
    "g03_engine_metadata_delete",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.orders_del")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_e2"))
        .orderBy("yr")
    },
    Some("""
      SELECT YEAR(o_orderdate) AS yr, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY 1 ORDER BY yr"""))

  // ------------------------------------------------------------------ g04
  private val g04 = Q(
    "g04_engine_dynamic_overwrite",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.part_ow")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum(cents(col("p_retailprice"))).as("sum_e2"))
        .orderBy("p_brand")
    },
    Some("""
      SELECT p_brand, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(CASE WHEN p_brand = 'Brand#1' THEN p_retailprice * 2
                           ELSE p_retailprice END AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM part GROUP BY p_brand ORDER BY p_brand"""))

  // ------------------------------------------------------------------ g05
  private val g05 = Q(
    "g05_engine_schema_evolution",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.cust_evo")
        .select(col("c_custkey"), col("c_name"),
          coalesce(col("c_mktsegment"), lit("none")).as("seg"))
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name,
        CASE WHEN c_custkey <= 100 THEN 'none' ELSE c_mktsegment END AS seg
      FROM customer ORDER BY c_custkey"""))

  val all: Vector[Q] = Vector(g01, g02, g03, g04, g05)
}
