package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/** Relational operator coverage (SURVEY.md §2.3–§2.5 delegated operators):
  * joins (broadcast/semi/anti/outer), hash aggregation, rollup/cube,
  * distinct aggregates, windows (row_number/rank/lag/running frames),
  * sorts/top-k, set ops, scalar string/date/math functions, predicates.
  * All verified against DuckDB oracles at sf0.01.
  */
object Relational {

  // ---------------------------------------------------------------- q01
  private val q01 = Q(
    "q01_pricing_summary",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
      l.groupBy("l_returnflag", "l_linestatus")
        .agg(
          // all money/quantity outputs are fixed-point e4 BIGINTs: q01 was
          // the only query emitting decimal columns and the only driver
          // hash mismatch in round 2 (decimal canonicalization differs
          // between the spark-parquet and duckdb sides of the compare)
          sum((col("l_quantity").cast(DecimalType(18, 4)) * 10000).cast(LongType))
            .as("sum_qty_e4"),
          sum((col("l_extendedprice").cast(DecimalType(18, 4)) * 10000).cast(LongType))
            .as("sum_base_price_e4"),
          sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount"))))
            .as("sum_disc_price_e4"),
          sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount"))) *
              (lit(100L) + pct(col("l_tax")))).as("sum_charge_e6"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty_e4", expr("sum_qty_e4 div count_order"))
        .withColumn("avg_price_e4", expr("sum_base_price_e4 div count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,4))*10000 AS BIGINT)) AS BIGINT) AS sum_qty_e4,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))*10000 AS BIGINT)) AS BIGINT) AS sum_base_price_e4,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)
            * (100 - CAST(CAST(l_discount AS DECIMAL(18,2))*100 AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)
            * (100 - CAST(CAST(l_discount AS DECIMAL(18,2))*100 AS BIGINT))
            * (100 + CAST(CAST(l_tax AS DECIMAL(18,2))*100 AS BIGINT))) AS BIGINT) AS sum_charge_e6,
        COUNT(*) AS count_order,
        CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,4))*10000 AS BIGINT)) AS BIGINT)
          // COUNT(*) AS avg_qty_e4,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))*10000 AS BIGINT)) AS BIGINT)
          // COUNT(*) AS avg_price_e4
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    headline = true)

  // ---------------------------------------------------------------- q02
  private val q02 = Q(
    "q02_topk_orders",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate").cast(DateType).as("o_date"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_date
      FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20"""))

  // ---------------------------------------------------------------- q03
  private val q03 = Q(
    "q03_shipping_priority",
    (s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast(DateType).as("o_date"))
        .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount"))))
          .as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("l_orderkey").asc)
        .limit(10)
    },
    Some("""
      SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)
            * (100 - CAST(CAST(l_discount AS DECIMAL(18,2))*100 AS BIGINT))) AS BIGINT) AS revenue_e4
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      ORDER BY revenue_e4 DESC, l_orderkey ASC LIMIT 10"""),
    headline = true)

  // ---------------------------------------------------------------- q04
  private val q04 = Q(
    "q04_order_priority",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-07-01").cast(TimestampType))
      val l = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      // TPC-H Q4's shape: a correlated EXISTS = LEFT SEMI join on
      // (equi key + non-equi correlate). The semi join never widens the
      // probe side — each order contributes once no matter how many
      // lineitems match — and the date filter runs before the exchange,
      // so at 100 TB the shuffle carries one quarter of orders and a
      // two-column projection of lineitem.
      o.join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q05
  private val q05 = Q(
    "q05_region_revenue",
    (s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val sup = t(s, dir, "supplier")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val l = t(s, dir, "lineitem")
      // region⋈nation resolves ASIA's nation keys FIRST; broadcasting
      // that tiny set into customer AND supplier semi-filters both
      // before any fact shuffle — the c⋈o exchange then carries ~1/5 of
      // the customers (regions are selective), which is the difference
      // at 100 TB where that shuffle dominates. Catalyst can't derive
      // this itself: the c_nationkey restriction only appears via the
      // supplier join, after the big shuffles are already planned.
      // The only hard hints are on ≤25-row nation sets; the supplier
      // side is deliberately UNhinted — suppliers scale with the corpus,
      // so whether l⋈sup broadcasts is a size decision the engine's
      // reported stats + AQE make per run (broadcast at test SFs, shuffle
      // hash at 100 TB), never a hard-coded driver OOM.
      val asiaN = n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val supA = sup.join(broadcast(asiaN),
        col("s_nationkey") === col("n_nationkey"))
      // r18: the customer side joins the same asiaN subtree directly (no
      // cn_nationkey rename Project). NOTE the broadcast still prunes to
      // n_nationkey-only on this branch (nothing consumes n_name here), so
      // it canonicalizes differently from the supplier-side broadcast and
      // is NOT deduped; only the inner ASIA r_regionkey broadcast is
      // stage-cache-reused (it was before this change too). Results
      // identical; kept for the simpler plan.
      val cA = c.join(broadcast(asiaN),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_nationkey")
      cA.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(supA,
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount"))))
          .as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("n_name").asc)
    },
    Some("""
      SELECT n_name,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)
            * (100 - CAST(CAST(l_discount AS DECIMAL(18,2))*100 AS BIGINT))) AS BIGINT) AS revenue_e4
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue_e4 DESC, n_name ASC"""),
    headline = true)

  // ---------------------------------------------------------------- q06
  private val q06 = Q(
    "q06_forecast_revenue",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
          pct(col("l_discount")).between(5, 7) && col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice")) * pct(col("l_discount")))
          .as("revenue_e4"),
          count(lit(1)).as("n")),
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

  // ---------------------------------------------------------------- q07
  private val q07 = Q(
    "q07_window_topn_per_group",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rnk", "quartile")
        .orderBy("o_custkey", "rn")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, quartile FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, NTILE(4) OVER w AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
      ) WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  // ---------------------------------------------------------------- q08
  private val q08 = Q(
    "q08_window_running_sum",
    (s, dir) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 20)
        .withColumn("running_qty", sum(col("l_quantity").cast(LongType)).over(w))
        .withColumn("running_rev_e4",
          sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))).over(w))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate").cast(DateType).as("ship_date"),
          col("running_qty"), col("running_rev_e4"))
        .orderBy("l_suppkey", "ship_date", "l_orderkey", "l_linenumber")
    },
    Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
        CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w AS BIGINT) AS running_qty,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)
            * (100 - CAST(CAST(l_discount AS DECIMAL(18,2))*100 AS BIGINT))) OVER w AS BIGINT) AS running_rev_e4
      FROM lineitem WHERE l_suppkey <= 20
      WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY l_suppkey, ship_date, l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- q09
  private val q09 = Q(
    "q09_window_lag_lead",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_custkey") <= 100)
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_date", lead(col("o_orderdate"), 1).over(w).cast(DateType))
        .withColumn("delta_e2", cents(col("o_totalprice")) - cents(col("prev_price")))
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast(DateType).as("o_date"),
          col("prev_price"), col("next_date"), col("delta_e2"))
        .orderBy("o_custkey", "o_date", "o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        LAG(o_totalprice, 1) OVER w AS prev_price,
        CAST(LEAD(o_orderdate, 1) OVER w AS DATE) AS next_date,
        CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)
          - CAST(CAST(LAG(o_totalprice, 1) OVER w AS DECIMAL(18,2))*100 AS BIGINT) AS delta_e2
      FROM orders WHERE o_custkey <= 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_date, o_orderkey"""))

  // ---------------------------------------------------------------- q10
  private val q10 = Q(
    "q10_returned_revenue",
    (s, dir) => {
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount"))))
          .as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("c_custkey").asc)
        .limit(20)
    },
    Some("""
      SELECT c_custkey, c_name, n_name,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)
            * (100 - CAST(CAST(l_discount AS DECIMAL(18,2))*100 AS BIGINT))) AS BIGINT) AS revenue_e4
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND c_nationkey = n_nationkey AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue_e4 DESC, c_custkey ASC LIMIT 20"""))

  // ---------------------------------------------------------------- q11
  private val q11 = Q(
    "q11_rollup",
    (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast(LongType)).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("cnt"), col("sum_qty"))
        .orderBy("rflag", "lstatus"),
    Some("""
      SELECT COALESCE(l_returnflag,'ALL') AS rflag, COALESCE(l_linestatus,'ALL') AS lstatus,
        COUNT(*) AS cnt, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY rflag, lstatus"""))

  // ---------------------------------------------------------------- q12
  private val q12 = Q(
    "q12_cube",
    (s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"), sum(cents(col("o_totalprice"))).as("sum_price_e2"),
          (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
            .cast(LongType).as("gid"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("gid"), col("cnt"), col("sum_price_e2"))
        .orderBy("gid", "status", "prio"),
    Some("""
      SELECT COALESCE(o_orderstatus,'ALL') AS status, COALESCE(o_orderpriority,'ALL') AS prio,
        GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS gid,
        COUNT(*) AS cnt,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_price_e2
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY gid, status, prio"""))

  // ---------------------------------------------------------------- q13
  private val q13 = Q(
    "q13_distinct_aggs",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          countDistinct(col("l_suppkey"), col("l_partkey")).as("n_supp_part"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
        COUNT(DISTINCT l_partkey) AS n_part,
        COUNT(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part,
        COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q14
  private val q14 = Q(
    "q14_set_ops",
    (s, dir) => {
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("k")).distinct()
      val seg = t(s, dir, "customer").filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("k"))
      def tag(df: DataFrame, op: String) =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      tag(big.intersect(seg), "intersect")
        .unionAll(tag(big.except(seg), "except"))
        .unionAll(tag(big.union(seg).distinct(), "union"))
        .orderBy("op")
    },
    Some("""
      WITH big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 150000),
           seg AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
      SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT k FROM big INTERSECT SELECT k FROM seg)
      UNION ALL
      SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT k FROM big EXCEPT SELECT k FROM seg)
      UNION ALL
      SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT k FROM big UNION SELECT k FROM seg)
      ORDER BY op"""))

  // ---------------------------------------------------------------- q15
  private val q15 = Q(
    "q15_semi_anti_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n")).withColumn("kind", lit("with_orders"))
      val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n")).withColumn("kind", lit("no_orders"))
      semi.unionAll(anti).select("seg", "kind", "n").orderBy("seg", "kind")
    },
    Some("""
      SELECT c_mktsegment AS seg, 'with_orders' AS kind, COUNT(*) AS n FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY 1
      UNION ALL
      SELECT c_mktsegment AS seg, 'no_orders' AS kind, COUNT(*) AS n FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY 1
      ORDER BY seg, kind"""))

  // ---------------------------------------------------------------- q16
  private val q16 = Q(
    "q16_scalar_subquery",
    (s, dir) => {
      val sup = t(s, dir, "supplier")
      val avgBal = sup.agg(avg(col("s_acctbal")).as("avg_bal"))
      sup.crossJoin(avgBal)
        .filter(col("s_acctbal") > col("avg_bal"))
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    },
    Some("""
      SELECT s_suppkey, s_name, s_acctbal FROM supplier
      WHERE s_acctbal > (SELECT AVG(s_acctbal) FROM supplier)
      ORDER BY s_suppkey"""))

  // ---------------------------------------------------------------- q17
  private val q17 = Q(
    "q17_case_when_histogram",
    (s, dir) =>
      t(s, dir, "lineitem")
        .withColumn("bucket",
          when(col("l_extendedprice") < 10000, "lo")
            .when(col("l_extendedprice") < 40000, "mid")
            .otherwise("hi"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"), sum(cents(col("l_extendedprice"))).as("sum_e2"))
        .orderBy("bucket"),
    Some("""
      SELECT CASE WHEN l_extendedprice < 10000 THEN 'lo'
                  WHEN l_extendedprice < 40000 THEN 'mid' ELSE 'hi' END AS bucket,
        COUNT(*) AS cnt,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM lineitem GROUP BY 1 ORDER BY bucket"""))

  // ---------------------------------------------------------------- q18
  private val q18 = Q(
    "q18_string_functions",
    (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          lower(col("p_brand")).as("lbrand"),
          length(col("p_name")).as("nlen"),
          substring(col("p_name"), 1, 7).as("prefix"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("bt"),
          regexp_replace(col("p_type"), lit(" "), lit("_")).as("t_us"),
          col("p_name").like("%red%").as("is_red"),
          col("p_name").startsWith("small").as("is_small"),
          trim(col("p_name")).as("trimmed"))
        .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey, UPPER(p_name) AS uname, LOWER(p_brand) AS lbrand,
        LENGTH(p_name) AS nlen, SUBSTR(p_name, 1, 7) AS prefix,
        p_brand || '/' || p_type AS bt, REPLACE(p_type, ' ', '_') AS t_us,
        p_name LIKE '%red%' AS is_red,
        p_name LIKE 'small%' AS is_small, TRIM(p_name) AS trimmed
      FROM part WHERE p_partkey <= 200 ORDER BY p_partkey"""))

  // ---------------------------------------------------------------- q19
  private val q19 = Q(
    "q19_date_functions",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("cnt"),
          min(col("o_orderdate").cast(DateType)).as("first_day"),
          max(dayofmonth(col("o_orderdate"))).as("max_dom"),
          max(quarter(col("o_orderdate"))).as("qtr"),
          max(datediff(col("o_orderdate"), lit("1995-01-01").cast(DateType))).as("max_days_since"))
        .orderBy("yr", "mo"),
    Some("""
      SELECT YEAR(o_orderdate) AS yr, MONTH(o_orderdate) AS mo, COUNT(*) AS cnt,
        MIN(CAST(o_orderdate AS DATE)) AS first_day,
        MAX(DAY(o_orderdate)) AS max_dom,
        MAX(QUARTER(o_orderdate)) AS qtr,
        MAX(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS max_days_since
      FROM orders GROUP BY 1, 2 ORDER BY yr, mo"""))

  // ---------------------------------------------------------------- q20
  private val q20 = Q(
    "q20_math_functions",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(floor(col("l_extendedprice") / 1000).cast(LongType)).as("sum_floor_k"),
          sum(ceil(col("l_extendedprice") / 1000).cast(LongType)).as("sum_ceil_k"),
          sum(abs(col("l_quantity").cast(LongType) - 25)).as("sum_absdev"),
          sum((col("l_partkey") % 7).cast(LongType)).as("sum_mod7"),
          round(sum(sqrt(col("l_quantity"))), 4).as("sum_sqrt_r4"),
          max(greatest(col("l_quantity"), col("l_discount") * 100)).as("max_greatest"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag,
        CAST(SUM(CAST(FLOOR(l_extendedprice/1000) AS BIGINT)) AS BIGINT) AS sum_floor_k,
        CAST(SUM(CAST(CEIL(l_extendedprice/1000) AS BIGINT)) AS BIGINT) AS sum_ceil_k,
        CAST(SUM(ABS(CAST(l_quantity AS BIGINT) - 25)) AS BIGINT) AS sum_absdev,
        CAST(SUM(CAST(l_partkey % 7 AS BIGINT)) AS BIGINT) AS sum_mod7,
        ROUND(SUM(SQRT(l_quantity)), 4) AS sum_sqrt_r4,
        MAX(GREATEST(l_quantity, l_discount*100)) AS max_greatest
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q21
  private val q21 = Q(
    "q21_null_handling",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(nullif(col("l_discount"), lit(0.0))).as("n_nonzero_disc"),
          count(lit(1)).as("n_rows"),
          sum(coalesce(nullif(col("l_quantity"), lit(1.0)), lit(0.0)).cast(LongType))
            .as("sum_qty_no_ones"),
          count(when(col("l_linestatus") === "F", lit(null)).otherwise(lit(1)))
            .as("n_not_f"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag,
        COUNT(NULLIF(l_discount, 0.0)) AS n_nonzero_disc,
        COUNT(*) AS n_rows,
        CAST(SUM(CAST(COALESCE(NULLIF(l_quantity, 1.0), 0.0) AS BIGINT)) AS BIGINT) AS sum_qty_no_ones,
        COUNT(CASE WHEN l_linestatus = 'F' THEN NULL ELSE 1 END) AS n_not_f
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q22
  private val q22 = Q(
    "q22_predicates",
    (s, dir) =>
      t(s, dir, "lineitem").agg(
        sum(when(col("l_shipdate").between(
          lit("1996-01-01").cast(TimestampType), lit("1996-12-31").cast(TimestampType)),
          1L).otherwise(0L)).as("n_1996"),
        sum(when(col("l_returnflag").isin("A", "R"), 1L).otherwise(0L)).as("n_ar"),
        sum(when(col("l_quantity") >= 10 && col("l_quantity") <= 20, 1L).otherwise(0L))
          .as("n_qty_10_20"),
        sum(when(!col("l_linestatus").isin("F"), 1L).otherwise(0L)).as("n_not_f"),
        sum(when(col("l_orderkey") % 2 === 0 || col("l_partkey") % 3 === 0, 1L)
          .otherwise(0L)).as("n_or")),
    Some("""
      SELECT
        CAST(SUM(CASE WHEN l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                 AND TIMESTAMP '1996-12-31 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_1996,
        CAST(SUM(CASE WHEN l_returnflag IN ('A','R') THEN 1 ELSE 0 END) AS BIGINT) AS n_ar,
        CAST(SUM(CASE WHEN l_quantity >= 10 AND l_quantity <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_qty_10_20,
        CAST(SUM(CASE WHEN l_linestatus NOT IN ('F') THEN 1 ELSE 0 END) AS BIGINT) AS n_not_f,
        CAST(SUM(CASE WHEN l_orderkey % 2 = 0 OR l_partkey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_or
      FROM lineitem"""))

  // ---------------------------------------------------------------- q23
  private val q23 = Q(
    "q23_outer_joins",
    (s, dir) => {
      val n = t(s, dir, "nation")
      val sup = t(s, dir, "supplier")
      val c = t(s, dir, "customer")
      n.join(sup, col("s_nationkey") === col("n_nationkey"), "left_outer")
        .join(c, col("c_nationkey") === col("n_nationkey"), "left_outer")
        .groupBy("n_name")
        .agg(countDistinct(col("s_suppkey")).as("n_supp"),
          countDistinct(col("c_custkey")).as("n_cust"),
          count(lit(1)).as("n_pairs"))
        .orderBy("n_name")
    },
    Some("""
      SELECT n_name, COUNT(DISTINCT s_suppkey) AS n_supp,
        COUNT(DISTINCT c_custkey) AS n_cust, COUNT(*) AS n_pairs
      FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
                  LEFT JOIN customer ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""))

  // ---------------------------------------------------------------- q24
  private val q24 = Q(
    "q24_exact_variance",
    (s, dir) =>
      t(s, dir, "lineitem")
        .withColumn("q", col("l_quantity").cast(LongType))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(col("q")).as("s1"),
          sum(col("q") * col("q")).as("s2"))
        // exact integer moments → one IEEE double division (deterministic)
        .select(col("l_returnflag"), col("n"),
          (col("s1").cast(DoubleType) / col("n")).as("mean_qty"),
          ((col("n") * col("s2") - col("s1") * col("s1")).cast(DoubleType) /
            (col("n") * (col("n") - 1)).cast(DoubleType)).as("var_qty"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag, n,
        CAST(s1 AS DOUBLE)/n AS mean_qty,
        CAST(n*s2 - s1*s1 AS DOUBLE)/CAST(n*(n-1) AS DOUBLE) AS var_qty
      FROM (
        SELECT l_returnflag, COUNT(*) AS n,
          SUM(CAST(l_quantity AS BIGINT)) AS s1,
          SUM(CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT)) AS s2
        FROM lineitem GROUP BY l_returnflag
      ) ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q25
  private val q25 = Q(
    "q25_events_sessionize",
    (s, dir) => {
      val e = events(s, dir)
      e.withColumn("hour_bucket", expr("ts_us div 3600000000"))
        .groupBy("event_type", "hour_bucket")
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("user_id")).as("n_users"),
          sum(cents(col("value"))).as("sum_value_e2"))
        .filter(col("hour_bucket") % 24 === 0) // one bucket per day to bound output
        .orderBy("event_type", "hour_bucket")
    },
    Some("""
      SELECT * FROM (
        SELECT event_type, epoch_us(ts)//3600000000 AS hour_bucket, COUNT(*) AS cnt,
          COUNT(DISTINCT user_id) AS n_users,
          CAST(SUM(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_value_e2
        FROM events GROUP BY 1, 2
      ) WHERE hour_bucket % 24 = 0
      ORDER BY event_type, hour_bucket"""))

  val all: Vector[Q] = Vector(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25)
}
