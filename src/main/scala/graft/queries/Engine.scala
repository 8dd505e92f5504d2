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

  // g46's persisted distributed-planning result (replaced per invocation)
  @volatile private var g46Cache: DataFrame = _

  private val built = scala.collection.mutable.Set.empty[String]
  private val coldBuilt = scala.collection.mutable.Set.empty[String]

  private def warehouse(dir: String): String =
    s"/tmp/graft_wh_${dir.replaceAll("[^A-Za-z0-9]", "_")}"

  /** true when THIS JVM rebuilt the gate warehouse for `dir` — bench
    * samples taken right after a rebuild run against freshly written
    * files and a busy page cache, so the flag lets a reader tell a
    * contaminated sample from a regression */
  def builtCold(dir: String): Boolean = coldBuilt.contains(warehouse(dir))

  /** recursive file listing (setup/gate-side convenience; the engine's
    * own maintenance paths list distributed) */
  private def listTree(dir: String): Seq[String] =
    graft.core.meta.GraftIO.walkFiles(dir)

  /** idempotent per-JVM setup: catalog conf + tables */
  private def setup(s: SparkSession, dir: String): Unit = synchronized {
    val wh = warehouse(dir)
    if (built.contains(wh)) return
    s.conf.set("spark.sql.catalog.graft", classOf[graft.spark.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.warehouse", wh)
    // g55 table-encryption gate: a FIXED test master key (not a secret —
    // the warehouse must decrypt across driver JVM restarts)
    // ("graft-gate-mk123" = 16 bytes — AES requires 16/24/32)
    val gateKms = "gate-mk:Z3JhZnQtZ2F0ZS1tazEyMw=="
    s.conf.set("spark.sql.catalog.graft.encryption.kms.key-list", gateKms)
    graft.core.meta.KmsRegistry.setKeyList("gate", gateKms)

    val cat = new HadoopCatalog(wh)
    val complete = cat.loadTable(Seq("db"), "lineitem_g")
      .exists(_.meta.properties.get("build-complete-v38").contains("true"))
    if (!complete) {
      coldBuilt += wh
      // wipe any partial previous build. EVERY table the build block
      // creates MUST be listed: a missing entry makes the rebuild crash
      // on CREATE TABLE against the previous round's leftover (r16
      // post-mortem: mix_src_g wasn't listed, and the v35→v36 marker
      // bump left every setup attempt dying mid-build).
      Seq("mix_src_g", "mix_reg_g",
        "lineitem_g", "orders_snap", "orders_del", "part_ow", "cust_evo",
        "cow_del", "mor_cust", "mrg_part", "compact_g", "cdc_g", "cdc_pd_g", "stream_g",
        "spev_g", "mor_part_g", "wap_g", "wapid_g", "dv_g", "orc_g", "dflt_g",
        "avro_g", "eqdel_g", "geo_g", "geog_g", "rtas_g", "spj_c_g", "spj_o_g", "var_shred_g", "imp_g", "exp_g", "ns_g",
        "lin_g", "orph_g", "txn_g", "relo_g", "relo_copy_g", "wmk_src_g", "wmk_g",
        "adm_g", "dang_g", "rb_g", "rpd_g", "msch_g", "metrics_g", "enc_g", "mev_g", "dvm_g", "bloom_g",
        "ice_src_g", "ice_reg_g")
        .foreach(t => cat.dropTable(Seq("db"), t))
      // the wipe above went through a FRESH HadoopCatalog, bypassing the
      // session GraftCatalog's 30s-TTL cache; invalidate it so an in-JVM
      // retry after a mid-build failure doesn't die on stale
      // "table already exists" entries (r7 post-mortem)
      s.sessionState.catalogManager.catalog("graft") match {
        case g: graft.spark.GraftCatalog => g.invalidateCache()
        case _ => ()
      }
      // stale streaming checkpoints would replay old-table offsets against
      // the rebuilt tables (exactly-once dedup then writes nothing)
      graft.core.meta.GraftIO.list(wh).filter(_.contains("_ckpt_"))
        .foreach(p => org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(p)))
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

      // copy-on-write mid-file DELETE (rewrites affected files atomically)
      s.sql("""CREATE TABLE graft.db.cow_del (
        o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)""")
      o.select("o_orderkey", "o_custkey", "o_totalprice")
        .writeTo("graft.db.cow_del").append()
      s.sql("DELETE FROM graft.db.cow_del WHERE o_orderkey % 7 = 3")

      // merge-on-read DELETE + UPDATE (position-delete files, no rewrites)
      s.sql("""CREATE TABLE graft.db.mor_cust (
        c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE)
        TBLPROPERTIES ('write.delete.mode'='merge-on-read',
                       'write.update.mode'='merge-on-read')""")
      c.select("c_custkey", "c_name", "c_acctbal").writeTo("graft.db.mor_cust").append()
      s.sql("DELETE FROM graft.db.mor_cust WHERE c_custkey % 13 = 5")
      s.sql("UPDATE graft.db.mor_cust SET c_acctbal = c_acctbal + 100 WHERE c_custkey % 10 = 0")

      // MERGE INTO (copy-on-write): odd part keys, upsert every third key
      s.sql("CREATE TABLE graft.db.mrg_part (p_partkey BIGINT, p_retailprice DOUBLE)")
      p.filter(col("p_partkey") % 2 === 1).select("p_partkey", "p_retailprice")
        .writeTo("graft.db.mrg_part").append()
      p.filter(col("p_partkey") % 3 === 0)
        .select(col("p_partkey"), (col("p_retailprice") * 2).as("p_retailprice"))
        .createOrReplaceTempView("mrg_part_src")
      s.sql("""MERGE INTO graft.db.mrg_part t USING mrg_part_src src
        ON t.p_partkey = src.p_partkey
        WHEN MATCHED THEN UPDATE SET p_retailprice = src.p_retailprice
        WHEN NOT MATCHED THEN INSERT (p_partkey, p_retailprice)
          VALUES (src.p_partkey, src.p_retailprice)""")

      // compaction: 3 small appends bin-packed into one file + manifest rewrite
      s.sql("CREATE TABLE graft.db.compact_g (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)")
      val n = t(s, dir, "nation")
      Seq(0, 1, 2).foreach { m =>
        n.filter(col("n_nationkey") % 3 === m).writeTo("graft.db.compact_g").append()
      }
      s.sql("CALL graft.system.rewrite_data_files('db.compact_g')")
      s.sql("CALL graft.system.rewrite_manifests('db.compact_g')")

      // changelog: two appends → all-INSERT change rows
      s.sql("CREATE TABLE graft.db.cdc_g (r_regionkey BIGINT, r_name STRING)")
      val r = t(s, dir, "region")
      r.filter(col("r_regionkey") < 3).writeTo("graft.db.cdc_g").append()
      r.filter(col("r_regionkey") >= 3).writeTo("graft.db.cdc_g").append()

      // streaming: micro-batch read of orders_snap → exactly-once sink
      s.sql("""CREATE TABLE graft.db.stream_g (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING)""")
      val q = s.readStream.table("graft.db.orders_snap")
        .writeStream
        .option("checkpointLocation", s"$wh/_ckpt_stream_g")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("graft.db.stream_g")
      q.awaitTermination(120000)

      // admission control: the same source re-streamed ONE FILE PER
      // micro-batch (`max-files-per-micro-batch`, reference
      // SparkReadOptions.STREAMING_MAX_FILES_PER_MICRO_BATCH). Every
      // admitted batch commits one append snapshot on the sink, so the
      // sink's snapshot history is durable evidence the limiter engaged
      // — re-asserted by g47 on every run, not just at build time.
      s.sql("""CREATE TABLE graft.db.adm_g (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING)""")
      // async planning ON here: g47 then proves the admission limiter
      // behaves identically when batch N+1's metadata is prefetched on
      // the background planner thread (reference AsyncSparkMicroBatchPlanner)
      val qa = s.readStream.option("max-files-per-micro-batch", "1")
        .option("streaming-async-planning", "true")
        .table("graft.db.orders_snap")
        .writeStream
        .option("checkpointLocation", s"$wh/_ckpt_adm_g")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("graft.db.adm_g")
      qa.awaitTermination(120000)

      // partition spec evolution: nation, identity(n_regionkey) added mid-life
      s.sql("CREATE TABLE graft.db.spev_g (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)")
      val nn = t(s, dir, "nation")
      nn.filter(col("n_nationkey") % 2 === 0).writeTo("graft.db.spev_g").append()
      s.sql("CALL graft.system.add_partition_field('db.spev_g', 'identity', 'n_regionkey')")
      nn.filter(col("n_nationkey") % 2 === 1).writeTo("graft.db.spev_g").append()

      // catalog-stored SQL view over the partitioned lineitem
      s.sql("""CALL graft.system.create_view('db.rev_by_flag_v',
        'SELECT l_returnflag, COUNT(*) AS n FROM graft.db.lineitem_g GROUP BY l_returnflag',
        true)""")

      // merge-on-read row-level ops on a PARTITIONED table: position
      // deletes fan out per months(o_orderdate) partition
      s.sql("""CREATE TABLE graft.db.mor_part_g (
        o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE,
        o_orderdate TIMESTAMP)
        PARTITIONED BY (months(o_orderdate))
        TBLPROPERTIES ('write.delete.mode'='merge-on-read',
                       'write.update.mode'='merge-on-read')""")
      o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .writeTo("graft.db.mor_part_g").append()
      s.sql("DELETE FROM graft.db.mor_part_g WHERE o_orderkey % 5 = 2")
      s.sql("""UPDATE graft.db.mor_part_g SET o_totalprice = o_totalprice + 10
        WHERE o_orderkey % 11 = 0""")

      // write-audit-publish: stage a row-level delete on spark.wap.branch,
      // then publish by fast-forwarding main
      s.sql("CREATE TABLE graft.db.wap_g (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)")
      n.writeTo("graft.db.wap_g").append()
      s.conf.set("spark.wap.branch", "audit")
      try s.sql("DELETE FROM graft.db.wap_g WHERE n_nationkey % 4 = 1")
      finally s.conf.unset("spark.wap.branch")
      s.sql("CALL graft.system.fast_forward('db.wap_g', 'main', 'audit')")

      // write-audit-publish by id: stage an append with spark.wap.id
      // (snapshot recorded, main unmoved), then publish_changes
      s.sql("""CREATE TABLE graft.db.wapid_g (
        n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)
        TBLPROPERTIES ('write.wap.enabled'='true')""")
      n.filter(col("n_nationkey") % 2 === 0).writeTo("graft.db.wapid_g").append()
      s.conf.set("spark.wap.id", "stage-odds")
      try n.filter(col("n_nationkey") % 2 === 1).writeTo("graft.db.wapid_g").append()
      finally s.conf.unset("spark.wap.id")
      s.sql("CALL graft.system.publish_changes('db.wapid_g', 'stage-odds')")

      // merge-on-read deletes as deletion vectors (roaring bitmaps)
      s.sql("""CREATE TABLE graft.db.dv_g (
        o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
        PARTITIONED BY (o_orderstatus)
        TBLPROPERTIES ('write.delete.mode'='merge-on-read',
                       'write.update.mode'='merge-on-read',
                       'write.delete.format'='dv')""")
      o.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .writeTo("graft.db.dv_g").append()
      s.sql("DELETE FROM graft.db.dv_g WHERE o_orderkey % 3 = 0")

      // ORC as the data file format (write.format.default)
      s.sql("""CREATE TABLE graft.db.orc_g (
        c_custkey BIGINT, c_name STRING, c_nationkey BIGINT, c_acctbal DOUBLE)
        PARTITIONED BY (bucket(4, c_custkey))
        TBLPROPERTIES ('write.format.default'='orc')""")
      t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
        .writeTo("graft.db.orc_g").append()

      // Avro as the data file format: append (write-time stats), a MoR
      // DELETE masking avro rows by position, then compaction rewriting
      // the survivors into fresh avro files
      s.sql("""CREATE TABLE graft.db.avro_g (
        s_suppkey BIGINT, s_name STRING, s_nationkey BIGINT, s_acctbal DOUBLE)
        PARTITIONED BY (bucket(4, s_suppkey))
        TBLPROPERTIES ('write.format.default'='avro',
                       'write.delete.mode'='merge-on-read')""")
      t(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .writeTo("graft.db.avro_g").append()
      s.sql("DELETE FROM graft.db.avro_g WHERE s_suppkey % 5 = 2")
      s.sql("CALL graft.system.rewrite_data_files('db.avro_g')")

      // column defaults: evens inserted BEFORE the defaulted column exists
      // (read initial-default), odds carry explicit values
      s.sql("""CREATE TABLE graft.db.dflt_g (o_orderkey BIGINT, o_totalprice DOUBLE)""")
      o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_totalprice").writeTo("graft.db.dflt_g").append()
      s.sql("ALTER TABLE graft.db.dflt_g ADD COLUMN prio STRING DEFAULT 'unassigned'")
      o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority").as("prio"))
        .writeTo("graft.db.dflt_g").append()

      // SQL DELETE as equality deletes: identifier-keyed MoR table, the
      // delta is one eq-delete file of deleted keys per touched partition
      s.sql("""CREATE TABLE graft.db.eqdel_g (
        s_suppkey BIGINT, s_nationkey BIGINT, s_acctbal DOUBLE)
        PARTITIONED BY (s_nationkey)
        TBLPROPERTIES ('write.delete.mode'='merge-on-read',
                       'write.delete.equality-enabled'='true',
                       'write.update.mode'='merge-on-read',
                       'write.update.equality-enabled'='true')""")
      s.sql("CALL graft.system.set_identifier_fields('db.eqdel_g', 's_suppkey')")
      t(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .writeTo("graft.db.eqdel_g").append()
      s.sql("DELETE FROM graft.db.eqdel_g WHERE s_acctbal < 0")
      // UPDATE also routes through equality deletes (old key deleted,
      // replacement row appended in the same RowDelta)
      s.sql("""UPDATE graft.db.eqdel_g SET s_acctbal = s_acctbal + 1000
        WHERE s_suppkey % 5 = 0""")

      // v3 geospatial: a WKB point column declared BINARY then promoted
      // via set_geo_type; x/y derive deterministically from c_custkey so
      // the DuckDB oracle can recompute them without spatial functions
      s.sql("CREATE TABLE graft.db.geo_g (c_custkey BIGINT, geo BINARY)")
      s.sql("CALL graft.system.set_geo_type('db.geo_g', 'geo', 'geometry')")
      t(s, dir, "customer").selectExpr("c_custkey",
        """graft.system.st_point(
             CAST(c_custkey * 7 % 360 - 180 AS DOUBLE) + 0.5d,
             CAST(c_custkey * 13 % 180 - 90 AS DOUBLE) + 0.5d) AS geo""")
        .writeTo("graft.db.geo_g").append()

      // geography variant: same deterministic point derivation; the
      // gate filters with an antimeridian-WRAPPED box (xmin > xmax)
      s.sql("CREATE TABLE graft.db.geog_g (c_custkey BIGINT, loc BINARY)")
      s.sql("CALL graft.system.set_geo_type('db.geog_g', 'loc', 'geography')")
      t(s, dir, "customer").selectExpr("c_custkey",
        """graft.system.st_point(
             CAST(c_custkey * 7 % 360 - 180 AS DOUBLE) + 0.5d,
             CAST(c_custkey * 13 % 180 - 90 AS DOUBLE) + 0.5d) AS loc""")
        .writeTo("graft.db.geog_g").append()

      // catalog-stored SQL UDF (udf-spec): replace => true keeps the
      // build idempotent across rebuilds (adds a version, same body)
      s.sql("""CALL graft.system.create_udf('db.disc_price',
        'ep double, d double', 'double', 'ep * (1 - d)', replace => true)""")

      // atomic RTAS: CTAS, then a FAILING replace (must leave the table
      // current — if it destroyed it, the next REPLACE errors and the
      // gate goes red), then the real replacement with a new schema
      t(s, dir, "nation").createOrReplaceTempView("rtas_nation_src")
      s.sql("""CREATE TABLE graft.db.rtas_g AS
        SELECT n_nationkey, n_name FROM rtas_nation_src""")
      s.udf.register("rtas_fail_fn", (x: Long) =>
        if (x >= 0) throw new RuntimeException("intentional RTAS failure") else x)
      try s.sql("""REPLACE TABLE graft.db.rtas_g AS
        SELECT rtas_fail_fn(n_nationkey) AS x FROM rtas_nation_src""")
      catch { case _: Throwable => () }
      s.sql("""REPLACE TABLE graft.db.rtas_g AS
        SELECT n_regionkey, count(*) AS n_nations
        FROM rtas_nation_src GROUP BY n_regionkey""")

      // v3 timestamp_ns (g38): nanosecond longs written through the
      // LongType surface into a GTimestampNs-typed column (Spark has no
      // ns type; SURVEY §1 maps it to LongType nanos)
      cat.createTable(Seq("db"), "ns_g", graft.core.types.GSchema(
        graft.core.types.GStruct(Seq(
          graft.core.types.GField(1, "user_id", graft.core.types.GLong,
            required = true),
          graft.core.types.GField(2, "ts_ns",
            graft.core.types.GTimestampNs(true))))))
      events(s, dir).selectExpr("user_id", "ts_us * 1000 AS ts_ns")
        .writeTo("graft.db.ns_g").append()

      // external import (g36): native Spark parquet files registered by
      // add_files — read through name mapping, no rewrite
      val impDir = s"$wh/_import_src_nation"
      t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").parquet(impDir)
      s.sql("""CREATE TABLE graft.db.imp_g (
        n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)""")
      s.sql(s"CALL graft.system.add_files('db.imp_g', '$impDir')")

      // snapshot expiry (g37): three appends, compaction, then expire
      // everything but the head — the physical file deletion must leave
      // exactly the live data (a reachability bug would destroy rows and
      // go red against the oracle)
      s.sql("CREATE TABLE graft.db.exp_g (r_regionkey BIGINT, r_name STRING)")
      val rExp = t(s, dir, "region")
      rExp.filter(col("r_regionkey") < 2).writeTo("graft.db.exp_g").append()
      rExp.filter(col("r_regionkey") === 2).writeTo("graft.db.exp_g").append()
      rExp.filter(col("r_regionkey") > 2).writeTo("graft.db.exp_g").append()
      s.sql("CALL graft.system.rewrite_data_files('db.exp_g')")
      s.sql("CALL graft.system.expire_snapshots('db.exp_g')")

      // shredded-variant stats (g35): each file records min/max of the
      // configured '$.n_regionkey' sub-path; two region-split appends
      // give files with disjoint bounds, so the gate's filter prunes
      s.sql("""CREATE TABLE graft.db.var_shred_g (n_nationkey BIGINT, payload VARIANT)
        TBLPROPERTIES ('write.variant.shred.payload'='$.n_regionkey:bigint')""")
      val nVar = t(s, dir, "nation").selectExpr("n_nationkey", "n_regionkey",
        "parse_json(to_json(struct(n_name, n_regionkey))) AS payload")
      nVar.filter(col("n_regionkey") < 2).select("n_nationkey", "payload")
        .writeTo("graft.db.var_shred_g").append()
      nVar.filter(col("n_regionkey") >= 2).select("n_nationkey", "payload")
        .writeTo("graft.db.var_shred_g").append()

      // row lineage (g39): one sorted file so the append assigns
      // _row_id == n_nationkey; the CoW UPDATE must then carry lineage
      // through the whole-file rewrite (spec v3 row lineage; reference
      // spark/.../source/ExtractRowLineage.java)
      s.sql("CREATE TABLE graft.db.lin_g (n_nationkey BIGINT, n_name STRING)")
      t(s, dir, "nation").select("n_nationkey", "n_name")
        .repartition(1).sortWithinPartitions("n_nationkey")
        .writeTo("graft.db.lin_g").append()
      s.sql("UPDATE graft.db.lin_g SET n_name = concat(n_name, '!') WHERE n_nationkey % 5 = 2")

      // NDV stats (g41): compute_table_stats stores per-column NDVs as
      // stats.ndv.* properties + a puffin statistics file; at nation
      // cardinality (25/25/5) the HLL++ estimate is exact and
      // deterministic, so the oracle is plain COUNT(DISTINCT)
      s.sql("CALL graft.system.compute_table_stats('db.imp_g')")

      // orphan files (g42): plant a copy of a live data file under
      // data/ (a failed write's leftover), then remove_orphan_files must
      // delete exactly it and nothing live
      s.sql("CREATE TABLE graft.db.orph_g (r_regionkey BIGINT, r_name STRING)")
      t(s, dir, "region").select("r_regionkey", "r_name")
        .writeTo("graft.db.orph_g").append()
      val orphLoc = cat.loadTable(Seq("db"), "orph_g").get.location
      val livePart = listTree(s"$orphLoc/data").filter(_.endsWith(".parquet")).head
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(livePart),
        java.nio.file.Paths.get(s"$orphLoc/data/planted-orphan.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      s.sql(s"""CALL graft.system.remove_orphan_files('db.orph_g',
        dry_run => false, older_than_ms => ${System.currentTimeMillis() + 3600000L})""")

      // multi-op transaction (g43): a property update + a data append of
      // externally staged parquet land as ONE CAS (reference
      // BaseTransaction); the gate sees both halves of supplier or
      // neither
      s.sql("""CREATE TABLE graft.db.txn_g (
        s_suppkey BIGINT, s_name STRING, s_nationkey BIGINT)""")
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
      sup.filter(col("s_suppkey") % 2 === 0).writeTo("graft.db.txn_g").append()
      val txnStage = s"$wh/_txn_stage"
      sup.filter(col("s_suppkey") % 2 === 1)
        .repartition(1).write.mode("overwrite").parquet(txnStage)
      val txnRows = sup.filter(col("s_suppkey") % 2 === 1).count()
      val gt = cat.loadTable(Seq("db"), "txn_g").get
      val hconf = s.sessionState.newHadoopConf()
      gt.transaction { tx =>
        tx.updateProperties(Map("txn-batched" -> "true"))
        val staged = listTree(txnStage).filter(_.endsWith(".parquet"))
        val dataFiles = staged.map { p =>
          val (size, stats, _) = graft.spark.FooterStats.read(p, hconf, tx.schema)
          // Spark-native files carry no graft field ids → name-mapped
          graft.core.meta.DataFile(p, "parquet-nm", tx.spec.specId, Nil,
            txnRows, size, stats)
        }
        tx.newAppend().appendFiles(dataFiles).commit()
      }

      // v4 relative locations (g44): a MoR table with position deletes is
      // relocated by a PLAIN DIRECTORY COPY — no metadata rewrite — and
      // the copy must read identically (tracked paths are stored relative
      // and re-root under the new home)
      s.sql("""CREATE TABLE graft.db.relo_g (
        o_orderkey BIGINT, o_totalprice DOUBLE)
        TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
      o.select("o_orderkey", "o_totalprice").writeTo("graft.db.relo_g").append()
      s.sql("DELETE FROM graft.db.relo_g WHERE o_orderkey % 9 = 4")
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(s"$wh/db/relo_g"), new java.io.File(s"$wh/db/relo_copy_g"))

      // storage-partitioned join pair: same bucket transform on the join
      // key on both sides, so the join can run exchange-free (g34)
      s.sql("""CREATE TABLE graft.db.spj_c_g (c_custkey BIGINT, c_mktsegment STRING)
        PARTITIONED BY (bucket(4, c_custkey))""")
      t(s, dir, "customer").select("c_custkey", "c_mktsegment")
        .writeTo("graft.db.spj_c_g").append()
      s.sql("""CREATE TABLE graft.db.spj_o_g (o_custkey BIGINT, o_totalprice DOUBLE)
        PARTITIONED BY (bucket(4, o_custkey))""")
      t(s, dir, "orders").select("o_custkey", "o_totalprice")
        .writeTo("graft.db.spj_o_g").append()

      // watermarked tumbling-window streaming (g45): three single-file
      // appends streamed NEWEST-FIRST (one file per micro-batch). Batch 0
      // (newest 12h) raises the watermark to max(ts) - 1h; Spark applies
      // the PREVIOUS batch's watermark to late-filter incoming rows, so
      // batch 1 (the 13h before that — still filtered against WM 0, kept)
      // exists to put one committed batch between the raise and the late
      // data; batch 2 (everything 25h+ older) then arrives entirely
      // behind the batch-0 watermark and is DROPPED. The sink therefore
      // holds exactly the hour windows of the last 25h whose end the
      // watermark passed. Every boundary is integer-µs arithmetic on the
      // data, so a DuckDB oracle reproduces the exact surviving set.
      s.sql("CREATE TABLE graft.db.wmk_src_g (event_type STRING, ts TIMESTAMP)")
      val evw = events(s, dir).select(col("event_type"), col("ts_us"))
      val maxUs = evw.agg(max("ts_us")).head().getLong(0)
      val hourUs = 3600L * 1000000L
      val splitA = maxUs - 12L * hourUs
      val splitB = maxUs - 25L * hourUs
      val evwT = evw.withColumn("ts", timestamp_micros(col("ts_us")))
      evwT.filter(col("ts_us") >= splitA).select("event_type", "ts")
        .coalesce(1).writeTo("graft.db.wmk_src_g").append()
      evwT.filter(col("ts_us") >= splitB && col("ts_us") < splitA)
        .select("event_type", "ts")
        .coalesce(1).writeTo("graft.db.wmk_src_g").append()
      evwT.filter(col("ts_us") < splitB).select("event_type", "ts")
        .coalesce(1).writeTo("graft.db.wmk_src_g").append()
      s.sql("""CREATE TABLE graft.db.wmk_g (
        win_start_us BIGINT, event_type STRING, n BIGINT)""")
      val wq = s.readStream.option("max-files-per-micro-batch", "1")
        .table("graft.db.wmk_src_g")
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("win_start_us"),
          col("event_type"), col("n"))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$wh/_ckpt_wmk_g")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("graft.db.wmk_g")
      wq.awaitTermination(120000)

      // dangling-delete removal (g49): CDC-style eq-delete table. The
      // lowest nation's data files are dropped WHOLE by a partition-
      // aligned metadata delete, stranding that partition's earlier
      // eq-delete file; rows appended after carry higher sequence
      // numbers the old eq-delete can never mask (eq deletes apply only
      // to strictly older files). remove_dangling_deletes must collect
      // exactly the stranded file and leave the still-applicable
      // eq-deletes of every other partition alone.
      s.sql("""CREATE TABLE graft.db.dang_g (
        s_suppkey BIGINT, s_nationkey BIGINT, s_acctbal DOUBLE)
        PARTITIONED BY (s_nationkey)
        TBLPROPERTIES ('write.delete.mode'='merge-on-read',
                       'write.delete.equality-enabled'='true')""")
      s.sql("CALL graft.system.set_identifier_fields('db.dang_g', 's_suppkey')")
      val supD = t(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
      val dangNk = supD.agg(min("s_nationkey")).head().getAs[Number](0).longValue
      supD.writeTo("graft.db.dang_g").append()                      // seq 1
      s.sql("DELETE FROM graft.db.dang_g WHERE s_suppkey % 3 = 0")  // seq 2
      s.sql(s"DELETE FROM graft.db.dang_g WHERE s_nationkey = $dangNk") // seq 3: metadata delete
      supD.filter(col("s_nationkey") === dangNk)
        .withColumn("s_acctbal", col("s_acctbal") + 100)
        .writeTo("graft.db.dang_g").append()                        // seq 4
      val dangRemoved = s.sql(
        "CALL graft.system.remove_dangling_deletes('db.dang_g')").head().getInt(0)
      require(dangRemoved >= 1,
        s"expected the stranded eq-delete file to be collected, got $dangRemoved")

      // rollback + cherry-pick (g50): roll main back past an append, then
      // cherry-pick re-applies the orphaned snapshot's files on the new
      // head (reference rollback_to_snapshot + cherrypick_snapshot)
      s.sql("""CREATE TABLE graft.db.rb_g (
        n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)""")
      val natRb = t(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      natRb.filter(col("n_regionkey") < 2).writeTo("graft.db.rb_g").append()
      val rbSnapA = cat.loadTable(Seq("db"), "rb_g").get
        .meta.currentSnapshot.get.snapshotId
      natRb.filter(col("n_regionkey") === 2).writeTo("graft.db.rb_g").append()
      val rbSnapB = cat.loadTable(Seq("db"), "rb_g").get
        .meta.currentSnapshot.get.snapshotId
      s.sql(s"CALL graft.system.rollback_to_snapshot('db.rb_g', ${rbSnapA}L)")
      s.sql(s"CALL graft.system.cherrypick_snapshot('db.rb_g', ${rbSnapB}L)")
      natRb.filter(col("n_regionkey") > 2).writeTo("graft.db.rb_g").append()

      // rewrite_position_deletes (g51): two MoR deletes scatter position
      // deletes over every data file; the rewrite must merge them into
      // one delete file per partition with identical query results
      s.sql("""CREATE TABLE graft.db.rpd_g (
        s_suppkey BIGINT, s_nationkey BIGINT, s_acctbal DOUBLE)
        TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
      val supRpd = t(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
      supRpd.filter(col("s_suppkey") % 2 === 0).writeTo("graft.db.rpd_g").append()
      supRpd.filter(col("s_suppkey") % 2 === 1).writeTo("graft.db.rpd_g").append()
      s.sql("DELETE FROM graft.db.rpd_g WHERE s_suppkey % 5 = 0")
      s.sql("DELETE FROM graft.db.rpd_g WHERE s_suppkey % 7 = 0")
      val rpdBefore = s.sql("SELECT count(*) FROM graft.db.rpd_g.delete_files")
        .head().getLong(0)
      require(rpdBefore >= 2,
        s"expected scattered position deletes before rewrite, got $rpdBefore")
      s.sql("CALL graft.system.rewrite_position_deletes('db.rpd_g')")
      val rpdAfter = s.sql("SELECT count(*) FROM graft.db.rpd_g.delete_files")
        .head().getLong(0)
      require(rpdAfter >= 1 && rpdAfter < rpdBefore,
        s"rewrite_position_deletes did not consolidate: $rpdBefore -> $rpdAfter")

      // merge-schema write (g52): the second append carries a brand-new
      // column; the write itself evolves the table schema (reference
      // SparkWriteBuilder mergeSchema + ACCEPT_ANY_SCHEMA capability)
      s.sql("""CREATE TABLE graft.db.msch_g (
        s_suppkey BIGINT, s_nationkey BIGINT)
        TBLPROPERTIES ('write.spark.accept-any-schema'='true')""")
      val supMs = t(s, dir, "supplier")
      supMs.select("s_suppkey", "s_nationkey")
        .filter(col("s_suppkey") % 2 === 0)
        .writeTo("graft.db.msch_g").append()
      supMs.select("s_suppkey", "s_nationkey", "s_acctbal")
        .filter(col("s_suppkey") % 2 === 1)
        .writeTo("graft.db.msch_g").option("merge-schema", "true").append()
      val msCols = cat.loadTable(Seq("db"), "msch_g").get
        .schema.fields.map(_.name)
      require(msCols == Seq("s_suppkey", "s_nationkey", "s_acctbal"),
        s"g52: merge-schema did not evolve the table: $msCols")

      // MERGE WITH SCHEMA EVOLUTION (g56): the target starts WITHOUT
      // s_acctbal; Spark 4's evolution clause adds it through
      // catalog.alterTable (analyzer ResolveMergeIntoSchemaEvolution,
      // gated on AUTOMATIC_SCHEMA_EVOLUTION capability), then matched
      // rows UPDATE and unmatched INSERT through the evolved schema
      // (reference SparkRowLevelOperationBuilder + schema-evolution tests)
      s.sql("CREATE TABLE graft.db.mev_g (s_suppkey BIGINT, s_name STRING)")
      supMs.select("s_suppkey", "s_name")
        .filter(col("s_suppkey") % 2 === 0)
        .writeTo("graft.db.mev_g").append()
      supMs.select("s_suppkey", "s_name", "s_acctbal")
        .createOrReplaceTempView("mev_src")
      s.sql("""MERGE WITH SCHEMA EVOLUTION INTO graft.db.mev_g t
        USING mev_src v ON t.s_suppkey = v.s_suppkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val mevCols = cat.loadTable(Seq("db"), "mev_g").get
        .schema.fields.map(_.name)
      require(mevCols == Seq("s_suppkey", "s_name", "s_acctbal"),
        s"g56: MERGE schema evolution did not add the column: $mevCols")

      // metrics modes (g53): per-table column-metrics policy (reference
      // MetricsConfig; write.metadata.metrics.*) — counts default, one
      // truncate(4) column, one full column, observable through the
      // files metadata table's bounds maps
      s.sql("""CREATE TABLE graft.db.metrics_g (
        p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING,
        p_size INT, p_retailprice DOUBLE)
        TBLPROPERTIES (
          'write.metadata.metrics.default'='counts',
          'write.metadata.metrics.column.p_name'='truncate(4)',
          'write.metadata.metrics.column.p_partkey'='full')""")
      val pm = t(s, dir, "part")
      Seq(0, 1).foreach { m =>
        pm.filter(col("p_partkey") % 2 === m).writeTo("graft.db.metrics_g").append()
      }
      val mrows = s.sql("""SELECT lower_bounds, upper_bounds, value_counts
        FROM graft.db.metrics_g.files""").collect()
      require(mrows.nonEmpty, "g53: no files rows")
      mrows.foreach { r =>
        val lo = r.getMap[Int, String](0)
        val hi = r.getMap[Int, String](1)
        val vc = r.getMap[Int, Long](2)
        require(lo.contains(1) && hi.contains(1),
          s"g53: full-mode p_partkey lost its bounds: $lo")
        require(lo.get(2).nonEmpty && hi.get(2).nonEmpty,
          "g53: truncate-mode p_name lost its bounds")
        require(lo.get(2).forall(_.length <= 4) && hi.get(2).forall(_.length <= 4),
          s"g53: p_name bounds not truncated to 4: ${lo.get(2)} / ${hi.get(2)}")
        require(!lo.contains(3) && !hi.contains(3) && !lo.contains(5),
          s"g53: counts-mode column kept bounds: $lo")
        require(vc.contains(3) && vc.contains(5),
          s"g53: counts-mode column lost value_counts: $vc")
      }

      // g55: encrypted table — parquet modular encryption + AGS1 metadata,
      // exercised through append, MoR delete and scan
      s.sql("""CREATE TABLE graft.db.enc_g (
        o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE,
        o_orderstatus STRING)
        TBLPROPERTIES ('encryption.key-id'='gate-mk',
                       'write.delete.mode'='merge-on-read')""")
      o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .writeTo("graft.db.enc_g").append()
      s.sql("DELETE FROM graft.db.enc_g WHERE o_orderkey % 5 = 2")

      // DV merge invariant (g57): two MoR DELETE commits on a dv-format
      // table — the second must union into the first file's DV (spec v3
      // at-most-one-DV-per-data-file), asserted in-gate every run
      s.sql("""CREATE TABLE graft.db.dvm_g (
        o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
        TBLPROPERTIES ('write.delete.mode'='merge-on-read',
                       'write.delete.format'='dv')""")
      o.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .writeTo("graft.db.dvm_g").append()
      s.sql("DELETE FROM graft.db.dvm_g WHERE o_orderkey % 4 = 1")
      s.sql("DELETE FROM graft.db.dvm_g WHERE o_orderkey % 6 = 2")

      // parquet bloom filters (g59): high-NDV point-lookup column — the
      // footer-level assertion runs in-gate every time
      s.sql("""CREATE TABLE graft.db.bloom_g (
        o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
        TBLPROPERTIES (
          'write.parquet.bloom-filter-enabled.column.o_orderkey'='true',
          'write.parquet.bloom-filter-ndv.column.o_orderkey'='100000')""")
      o.select("o_orderkey", "o_custkey", "o_totalprice")
        .writeTo("graft.db.bloom_g").append()

      // genuine-Iceberg interop (g60): a spec-shaped v2 MoR tree —
      // Appendix-C metadata JSON, spec-Avro manifests + manifest list,
      // and a position-delete parquet — then register_table from its
      // metadata.json, the migrating user's first-day operation
      // (reference RegisterTableProcedure + HadoopTableOperations)
      s.sql("""CREATE TABLE graft.db.ice_src_g (
        s_suppkey BIGINT, s_name STRING, s_nationkey BIGINT)
        PARTITIONED BY (bucket(4, s_suppkey))
        TBLPROPERTIES ('compatibility.format'='iceberg',
                       'write.delete.mode'='merge-on-read',
                       'write.update.mode'='merge-on-read')""")
      sup.writeTo("graft.db.ice_src_g").append()
      s.sql("DELETE FROM graft.db.ice_src_g WHERE s_suppkey % 7 = 3")
      val iceMeta = new HadoopCatalog(wh).loadTable(Seq("db"), "ice_src_g")
        .get.ops.currentMetadataPath.get
      s.sql(s"CALL graft.system.register_table('db.ice_reg_g', '$iceMeta')")

      // mixed-format MoR interop (g63): a spec-shaped v2 tree whose
      // DELETE FILES are Avro over Parquet data — the shape Flink CDC
      // writes (reference DeleteFilter dispatches per DeleteFile.format())
      // — registered from its metadata.json like a migrating user would
      s.sql("""CREATE TABLE graft.db.mix_src_g (
        c_custkey BIGINT, c_name STRING, c_nationkey BIGINT, c_acctbal DOUBLE)
        TBLPROPERTIES ('compatibility.format'='iceberg',
                       'write.delete.mode'='merge-on-read',
                       'write.delete.format'='avro')""")
      t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
        .writeTo("graft.db.mix_src_g").append()
      s.sql("DELETE FROM graft.db.mix_src_g WHERE c_custkey % 5 = 2")
      val mixMeta = new HadoopCatalog(wh).loadTable(Seq("db"), "mix_src_g")
        .get.ops.currentMetadataPath.get
      s.sql(s"CALL graft.system.register_table('db.mix_reg_g', '$mixMeta')")

      new HadoopCatalog(wh).loadTable(Seq("db"), "lineitem_g").get
        .updateProperties(Map("build-complete-v38" -> "true"))
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

  // ------------------------------------------------------------------ g06
  private val g06 = Q(
    "g06_engine_cow_delete",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.cow_del")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_e2"))
    },
    Some("""
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM orders WHERE NOT (o_orderkey % 7 = 3)"""))

  // ------------------------------------------------------------------ g07
  private val g07 = Q(
    "g07_engine_mor_rowlevel",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.mor_cust")
        .agg(count(lit(1)).as("n"), sum(cents(col("c_acctbal"))).as("sum_e2"))
    },
    Some("""
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(CAST(CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100
                           ELSE c_acctbal END AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM customer WHERE NOT (c_custkey % 13 = 5)"""))

  // ------------------------------------------------------------------ g08
  private val g08 = Q(
    "g08_engine_merge",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.mrg_part")
        .agg(count(lit(1)).as("n"), sum(cents(col("p_retailprice"))).as("sum_e2"))
    },
    Some("""
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(CAST(CASE WHEN p_partkey % 3 = 0 THEN p_retailprice * 2
                           ELSE p_retailprice END AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM part WHERE p_partkey % 2 = 1 OR p_partkey % 3 = 0"""))

  // ------------------------------------------------------------------ g09
  private val g09 = Q(
    "g09_engine_agg_pushdown",
    (s, dir) => {
      setup(s, dir)
      // no filter → answered entirely from manifest stats (LocalScan)
      s.table("graft.db.lineitem_g")
        .agg(count(lit(1)).as("n"), min(col("l_orderkey")).as("min_ok"),
          max(col("l_orderkey")).as("max_ok"))
    },
    Some("""
      SELECT COUNT(*) AS n, MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok
      FROM lineitem"""))

  // ------------------------------------------------------------------ g10
  private val g10 = Q(
    "g10_engine_compaction",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.compact_g")
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), max(col("n_name")).as("max_name"))
        .orderBy("n_regionkey")
    },
    Some("""
      SELECT n_regionkey, COUNT(*) AS n, MAX(n_name) AS max_name
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  // ------------------------------------------------------------------ g11
  private val g11 = Q(
    "g11_engine_changelog",
    (s, dir) => {
      setup(s, dir)
      s.read.table("graft.db.cdc_g.changes")
        .select(col("r_regionkey"), col("r_name"), col("_change_type"))
        .orderBy("r_regionkey")
    },
    Some("""
      SELECT r_regionkey, r_name, 'INSERT' AS _change_type
      FROM region ORDER BY r_regionkey"""))

  // ------------------------------------------------------------------ g12
  private val g12 = Q(
    "g12_engine_transforms",
    (s, dir) => {
      setup(s, dir)
      s.sql("""
        SELECT graft.system.months(l_shipdate) AS m, COUNT(*) AS n,
               CAST(SUM(graft.system.truncate(100, l_orderkey)) AS BIGINT) AS sum_trunc
        FROM graft.db.lineitem_g GROUP BY 1 ORDER BY m""")
    },
    Some("""
      SELECT (EXTRACT(year FROM l_shipdate) - 1970) * 12
             + EXTRACT(month FROM l_shipdate) - 1 AS m,
             COUNT(*) AS n,
             CAST(SUM(l_orderkey - ((l_orderkey % 100 + 100) % 100)) AS BIGINT) AS sum_trunc
      FROM lineitem GROUP BY 1 ORDER BY m"""))

  // ------------------------------------------------------------------ g13
  private val g13 = Q(
    "g13_engine_streaming",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.stream_g")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_e2"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  // ------------------------------------------------------------------ g14
  private val g14 = Q(
    "g14_engine_spec_evolution",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.spev_g")
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), max(col("n_name")).as("max_name"))
        .orderBy("n_regionkey")
    },
    Some("""
      SELECT n_regionkey, COUNT(*) AS n, MAX(n_name) AS max_name
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  // ------------------------------------------------------------------ g15
  private val g15 = Q(
    "g15_engine_views",
    (s, dir) => {
      setup(s, dir)
      s.sql("SELECT l_returnflag, n FROM graft.db.rev_by_flag_v ORDER BY l_returnflag")
    },
    Some("""
      SELECT l_returnflag, COUNT(*) AS n FROM lineitem
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ------------------------------------------------------------------ g16
  private val g16 = Q(
    "g16_engine_mor_partitioned",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.mor_part_g")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_e2"))
        .orderBy("yr")
    },
    Some("""
      SELECT YEAR(o_orderdate) AS yr, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 10
                           ELSE o_totalprice END AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM orders WHERE NOT (o_orderkey % 5 = 2)
      GROUP BY 1 ORDER BY yr"""))

  // ------------------------------------------------------------------ g17
  private val g17 = Q(
    "g17_engine_wap_publish",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.wap_g")
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), max(col("n_name")).as("max_name"))
        .orderBy("n_regionkey")
    },
    Some("""
      SELECT n_regionkey, COUNT(*) AS n, MAX(n_name) AS max_name
      FROM nation WHERE NOT (n_nationkey % 4 = 1)
      GROUP BY n_regionkey ORDER BY n_regionkey"""))

  // ------------------------------------------------------------------ g18
  private val g18 = Q(
    "g18_engine_incremental",
    (s, dir) => {
      setup(s, dir)
      // incremental append scan: only files added AFTER the first append
      // (the odd-orderkey half), planned via main-branch ancestry
      val table = new HadoopCatalog(warehouse(dir)).loadTable(Seq("db"), "orders_snap").get
      val firstSnap = table.meta.ancestry("main")
        .filter(_.operation == "append").minBy(_.sequenceNumber).snapshotId
      s.read.option("start-snapshot-id", firstSnap.toString)
        .table("graft.db.orders_snap")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_e2"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM orders WHERE o_orderkey % 2 = 1
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  // ------------------------------------------------------------------ g19
  private val g19 = Q(
    "g19_engine_wap_id_publish",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.wapid_g")
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), max(col("n_name")).as("max_name"))
        .orderBy("n_regionkey")
    },
    Some("""
      SELECT n_regionkey, COUNT(*) AS n, MAX(n_name) AS max_name
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  // ------------------------------------------------------------------ g20
  private val g20 = Q(
    "g20_engine_deletion_vectors",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.dv_g")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_e2"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM orders WHERE NOT (o_orderkey % 3 = 0)
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  // ------------------------------------------------------------------ g21
  private val g21 = Q(
    "g21_engine_orc_format",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.orc_g")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"), sum(cents(col("c_acctbal"))).as("bal_e2"),
          max(col("c_name")).as("max_name"))
        .orderBy("c_nationkey")
    },
    Some("""
      SELECT c_nationkey, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS bal_e2,
        MAX(c_name) AS max_name
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""))

  // ------------------------------------------------------------------ g22
  private val g22 = Q(
    "g22_engine_column_defaults",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.dflt_g")
        .groupBy("prio")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_e2"))
        .orderBy("prio")
    },
    Some("""
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'unassigned' ELSE o_orderpriority END AS prio,
        COUNT(*) AS n,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM orders GROUP BY 1 ORDER BY prio"""))

  // ------------------------------------------------------------------ g23
  private val g23 = Q(
    "g23_engine_avro_format",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.avro_g")
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), sum(cents(col("s_acctbal"))).as("bal_e2"),
          max(col("s_name")).as("max_name"))
        .orderBy("s_nationkey")
    },
    Some("""
      SELECT s_nationkey, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(s_acctbal AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS bal_e2,
        MAX(s_name) AS max_name
      FROM supplier WHERE s_suppkey % 5 <> 2
      GROUP BY s_nationkey ORDER BY s_nationkey"""))

  // ------------------------------------------------------------------ g24
  // JDBC catalog (pointer rows + SQL CAS on embedded Derby): same engine,
  // different metadata pointer store — results must match the oracle
  private val g24 = Q(
    "g24_engine_jdbc_catalog",
    (s, dir) => {
      val wh = warehouse(dir) + "_jdbc"
      val uri = s"jdbc:derby:$wh/cat;create=true"
      s.conf.set("spark.sql.catalog.gjdbc", classOf[graft.spark.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gjdbc.warehouse", wh)
      s.conf.set("spark.sql.catalog.gjdbc.catalog-impl", "jdbc")
      s.conf.set("spark.sql.catalog.gjdbc.uri", uri)
      val cat = try {
        val c = new graft.core.meta.JdbcCatalog(wh, uri, "gjdbc")
        c.tableExists(Seq("db"), "nation_j") // probe the db boots
        c
      } catch {
        // stale/corrupt embedded-derby db (e.g. a killed JVM left a
        // lock): wipe the fixture warehouse and rebuild from scratch.
        // Scoped to Derby boot/corruption SQLStates — a transient error
        // (NPE, OOM, plain SQL failure) must NOT wipe a warehouse that
        // may be live in another JVM.
        case e: Throwable if {
          val states = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
            .take(10).collect {
              case s: java.sql.SQLException => Option(s.getSQLState)
            }.flatten.toSet
          // XJ040 failed boot; XSDB6 stale db.lck from a killed JVM;
          // XBM0* storage-level boot corruption
          states.exists(st => st == "XJ040" || st == "XSDB6" || st.startsWith("XBM"))
        } =>
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wh))
          new graft.core.meta.JdbcCatalog(wh, uri, "gjdbc")
      }
      if (!cat.tableExists(Seq("db"), "nation_j")) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS gjdbc.db")
        s.sql("""CREATE TABLE gjdbc.db.nation_j (
          n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)""")
        t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
          .writeTo("gjdbc.db.nation_j").append()
        s.sql("DELETE FROM gjdbc.db.nation_j WHERE n_nationkey % 5 = 0")
      }
      s.table("gjdbc.db.nation_j")
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), max(col("n_name")).as("max_name"))
        .orderBy("n_regionkey")
    },
    Some("""
      SELECT n_regionkey, COUNT(*) AS n, MAX(n_name) AS max_name
      FROM nation WHERE n_nationkey % 5 <> 0
      GROUP BY n_regionkey ORDER BY n_regionkey"""))

  // ------------------------------------------------------------------ g25
  // REST catalog: commits round-trip through the in-process HTTP server
  private object RestFixture {
    @volatile var uri: String = _
    def ensure(wh: String): String = synchronized {
      if (uri == null) uri = graft.core.meta.RestCatalogServer.start(wh)._2
      uri
    }
  }
  private val g25 = Q(
    "g25_engine_rest_catalog",
    (s, dir) => {
      val wh = warehouse(dir) + "_rest"
      val uri = RestFixture.ensure(wh)
      s.conf.set("spark.sql.catalog.grest", classOf[graft.spark.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.grest.catalog-impl", "rest")
      s.conf.set("spark.sql.catalog.grest.uri", uri)
      val cat = graft.core.meta.RestCatalog.connect(uri)
      if (!cat.tableExists(Seq("db"), "region_r")) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS grest.db")
        s.sql("CREATE TABLE grest.db.region_r (r_regionkey BIGINT, r_name STRING)")
        t(s, dir, "region").select("r_regionkey", "r_name")
          .writeTo("grest.db.region_r").append()
      }
      s.table("grest.db.region_r").orderBy("r_regionkey")
    },
    Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"))

  // ------------------------------------------------------------------ g26
  // variant type: JSON payloads stored as Spark VariantType, shredded
  // back out with variant_get — oracle computes from the raw columns
  private val g26 = Q(
    "g26_engine_variant",
    (s, dir) => {
      setup(s, dir)
      val wh = warehouse(dir)
      val cat = new HadoopCatalog(wh)
      if (!cat.tableExists(Seq("db"), "var_g")) {
        s.sql("CREATE TABLE graft.db.var_g (n_nationkey BIGINT, payload VARIANT)")
        t(s, dir, "nation")
          .selectExpr("n_nationkey",
            "parse_json(to_json(struct(n_name, n_regionkey))) AS payload")
          .writeTo("graft.db.var_g").append()
      }
      s.table("graft.db.var_g")
        .selectExpr("n_nationkey",
          "variant_get(payload, '$.n_name', 'string') AS name",
          "variant_get(payload, '$.n_regionkey', 'bigint') AS rk")
        .filter(col("rk") >= 2)
        .orderBy("n_nationkey")
    },
    Some("""
      SELECT n_nationkey, n_name AS name, n_regionkey AS rk
      FROM nation WHERE n_regionkey >= 2 ORDER BY n_nationkey"""))

  // ------------------------------------------------------------------ g27
  // position_deletes metadata table, DISTRIBUTED read: the scan plans one
  // input partition per live delete file and decodes DV bitmaps / reads
  // delete parquet executor-side (no driver collect). Row count equals
  // the rows the MoR DELETE removed — which the oracle derives from the
  // base data + predicate (paths/positions themselves are engine-internal
  // and deliberately aggregated away).
  private val g27 = Q(
    "g27_engine_position_deletes",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.dv_g.position_deletes")
        .agg(count(lit(1)).as("n_deleted"))
    },
    Some("""
      SELECT COUNT(*) AS n_deleted FROM orders WHERE o_orderkey % 3 = 0"""))

  // ------------------------------------------------------------------ g28
  // SQL DELETE on an identifier-keyed MoR table writes EQUALITY deletes
  // (graft extension; reference only reaches EqualityDeleteWriter from
  // Flink CDC). The read applies the key mask; the oracle applies the
  // same predicate to the base data.
  private val g28 = Q(
    "g28_engine_equality_delete_sql",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.eqdel_g")
        .agg(count(lit(1)).as("n"), sum(cents(col("s_acctbal"))).as("sum_e2"))
    },
    Some("""
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(CAST(
          CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 1000 ELSE s_acctbal END
          AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM supplier WHERE NOT (s_acctbal < 0)"""))

  // ------------------------------------------------------------------ g32
  // UPDATE via equality deletes (same table as g28): the old keys are
  // eq-deleted and the replacement rows appended in one RowDelta; the
  // per-nation aggregate verifies both the mask and the new values.
  private val g32 = Q(
    "g32_engine_equality_update_sql",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.eqdel_g")
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), sum(cents(col("s_acctbal"))).as("sum_c"))
        .orderBy("s_nationkey")
    },
    Some("""
      SELECT s_nationkey, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(
          CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 1000 ELSE s_acctbal END
          AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_c
      FROM supplier WHERE NOT (s_acctbal < 0)
      GROUP BY s_nationkey ORDER BY s_nationkey"""))

  // ------------------------------------------------------------------ g29
  // v3 geometry: st_intersects_bbox filter pushes down as an StIntersects
  // predicate and prunes files via bounding-box bounds (spec
  // format/spec.md:770-774); st_x/st_y decode the WKB points back so the
  // oracle can verify values from the deterministic c_custkey derivation.
  private val g29 = Q(
    "g29_engine_geospatial",
    (s, dir) => {
      setup(s, dir)
      s.sql("""SELECT c_custkey,
          graft.system.st_x(geo) AS x, graft.system.st_y(geo) AS y
        FROM graft.db.geo_g
        WHERE graft.system.st_intersects_bbox(geo, -90.0D, -45.0D, 0.0D, 45.0D) = true
        ORDER BY c_custkey""")
    },
    Some("""
      SELECT c_custkey,
        CAST(c_custkey * 7 % 360 - 180 AS DOUBLE) + 0.5 AS x,
        CAST(c_custkey * 13 % 180 - 90 AS DOUBLE) + 0.5 AS y
      FROM customer
      WHERE (c_custkey * 7 % 360 - 180 + 0.5) BETWEEN -90 AND 0
        AND (c_custkey * 13 % 180 - 90 + 0.5) BETWEEN -45 AND 45
      ORDER BY c_custkey"""))

  // ------------------------------------------------------------------ g30
  // Catalog-stored SQL UDF (format/udf-spec.md — the reference specifies
  // but does not implement it): disc_price(ep, d) = ep * (1 - d) is
  // macro-expanded / FunctionCatalog-served, so the oracle just inlines
  // the body. Truncating-to-cents keeps the aggregation integer-exact.
  private val g30 = Q(
    "g30_engine_sql_udf",
    (s, dir) => {
      setup(s, dir)
      s.sql("""SELECT l_returnflag,
          CAST(SUM(CAST(FLOOR(graft.db.disc_price(l_extendedprice, l_discount) * 100)
            AS BIGINT)) AS BIGINT) AS rev_c
        FROM graft.db.lineitem_g GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    Some("""
      SELECT l_returnflag,
        CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_c
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ------------------------------------------------------------------ g31
  // v3 geography: an antimeridian-WRAPPED query box (xmin > xmax, spec
  // format/spec.md:772) means [xmin,180] ∪ [-180,xmax]; for points the
  // oracle is the plain disjunction on the derived coordinates.
  private val g31 = Q(
    "g31_engine_geography",
    (s, dir) => {
      setup(s, dir)
      s.sql("""SELECT c_custkey,
          graft.system.st_x(loc) AS x, graft.system.st_y(loc) AS y
        FROM graft.db.geog_g
        WHERE graft.system.st_intersects_bbox(loc, 170.0D, -60.0D, -170.0D, 60.0D) = true
        ORDER BY c_custkey""")
    },
    Some("""
      SELECT c_custkey,
        CAST(c_custkey * 7 % 360 - 180 AS DOUBLE) + 0.5 AS x,
        CAST(c_custkey * 13 % 180 - 90 AS DOUBLE) + 0.5 AS y
      FROM customer
      WHERE ((c_custkey * 7 % 360 - 180 + 0.5) >= 170
          OR (c_custkey * 7 % 360 - 180 + 0.5) <= -170)
        AND (c_custkey * 13 % 180 - 90 + 0.5) BETWEEN -60 AND 60
      ORDER BY c_custkey"""))

  // ------------------------------------------------------------------ g33
  // Atomic RTAS: the build CTAS'd rtas_g, ran a REPLACE whose write
  // throws mid-query (staged commit must abort without touching the
  // table), then REPLACE'd it for real with a different schema. The
  // aggregate below only matches the oracle if the failed replace left
  // the table intact AND the successful one swapped schema+data in one
  // CAS (reference BaseTransaction / SparkCatalog stageReplace).
  private val g33 = Q(
    "g33_engine_atomic_rtas",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.rtas_g").orderBy("n_regionkey")
    },
    Some("""
      SELECT n_regionkey, COUNT(*) AS n_nations
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  // ------------------------------------------------------------------ g34
  // Storage-partitioned join: both sides bucket(4, key) on the join key;
  // with Spark's v2 bucketing conf + the source grouping opt-in the join
  // runs on storage partitioning with NO exchange below it (reference
  // spark/.../sql/TestStoragePartitionedJoins.java). The plan shape is
  // asserted here — a silent fallback to shuffle fails the gate.
  private val g34 = Q(
    "g34_engine_spj",
    (s, dir) => {
      setup(s, dir)
      val confs = Seq(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.graft.preserveDataGrouping" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false")
      val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      try {
        val df = s.table("graft.db.spj_c_g")
          .join(s.table("graft.db.spj_o_g"), col("c_custkey") === col("o_custkey"))
          .groupBy("c_custkey")
          .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_c"))
          .orderBy("c_custkey")
        val plan = df.queryExecution.executedPlan.toString
        val joinIdx = plan.indexOf("SortMergeJoin")
        require(joinIdx >= 0, s"g34: expected a sort-merge join:\n$plan")
        require(!plan.substring(joinIdx).contains("Exchange"),
          s"g34: expected an exchange-free storage-partitioned join:\n$plan")
        df
      } finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None)    => s.conf.unset(k)
      }
    },
    Some("""
      SELECT c_custkey, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_c
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey"""))

  // ------------------------------------------------------------------ g35
  // Variant shredding stats: write.variant.shred.* records per-file
  // min/max of configured variant sub-paths, and a pushable
  // graft.system.variant_get_long predicate prunes whole files with
  // them (reference parquet/.../VariantShreddingAnalyzer + variant
  // shredding spec; Spark's PushVariantIntoScan covers only v1 file
  // relations, so the DSv2 path needs the catalog-function route). The
  // two region-split appends guarantee prunable file bounds; the filter
  // correctness is still end-to-end vs the oracle.
  private val g35 = Q(
    "g35_engine_variant_shredding",
    (s, dir) => {
      setup(s, dir)
      val df = s.sql("""SELECT n_nationkey,
          graft.system.variant_get_long(payload, '$.n_regionkey') AS rk,
          graft.system.variant_get_string(payload, '$.n_name') AS name
        FROM graft.db.var_shred_g
        WHERE graft.system.variant_get_long(payload, '$.n_regionkey') >= 2
        ORDER BY n_nationkey""")
      // read-side shredding: both the filter and the rk projection must
      // be served by the materialized _shred_ column — no variant_get_long
      // call survives in the physical plan (variant_get_string stays: no
      // shred spec covers $.n_name). The values still hash-match the
      // oracle end-to-end.
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("_shred_payload_n_regionkey"),
        "g35: shredded column did not serve the read:\n" + plan)
      require(!plan.contains("variant_get_long"),
        "g35: variant_get_long still evaluated per row:\n" + plan)
      // every file carries the materialized columns, so the scan must
      // stay COLUMNAR (vectorized batches; AQE hides the transition in
      // the plan string pre-execution, so ask the scan node itself)
      val inner = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.inputPlan
        case p => p
      }
      val colScans = inner.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.supportsColumnar
      }
      require(colScans.nonEmpty && colScans.forall(identity),
        s"g35: shredded scan fell off the vectorized path ($colScans):\n" + plan)
      df
    },
    Some("""
      SELECT n_nationkey, n_regionkey AS rk, n_name AS name
      FROM nation WHERE n_regionkey >= 2 ORDER BY n_nationkey"""))

  // ------------------------------------------------------------------ g36
  // External import: add_files registered native parquet (written by
  // Spark's own writer, no graft metadata) into a graft table; reads
  // resolve columns by NAME MAPPING since the files carry no field ids
  // (reference SparkTableUtil importSparkTable + name-mapping spec).
  private val g36 = Q(
    "g36_engine_add_files_import",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.imp_g")
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), max(col("n_name")).as("max_name"))
        .orderBy("n_regionkey")
    },
    Some("""
      SELECT n_regionkey, COUNT(*) AS n, MAX(n_name) AS max_name
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  // ------------------------------------------------------------------ g37
  // Snapshot expiry end-to-end: after compaction + expire-all-but-head
  // PHYSICALLY deleted the superseded files, the table must still hold
  // exactly the original rows (reference ExpireSnapshotsSparkAction;
  // the distributed reachability diff is what this guards).
  private val g37 = Q(
    "g37_engine_snapshot_expiry",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.exp_g").orderBy("r_regionkey")
    },
    Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"))

  // ------------------------------------------------------------------ g38
  // v3 timestamp_ns: nanosecond timestamps survive the round-trip
  // exactly (engine type GTimestampNs over a LongType Spark surface; the
  // oracle reads the parquet TIMESTAMP(NANOS) column natively).
  private val g38 = Q(
    "g38_engine_timestamp_ns",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.ns_g").groupBy("user_id")
        .agg(count(lit(1)).as("n"), min(col("ts_ns")).as("mn"),
          max(col("ts_ns")).as("mx"))
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, COUNT(*) AS n,
        CAST(epoch_ns(MIN(ts)) AS BIGINT) AS mn,
        CAST(epoch_ns(MAX(ts)) AS BIGINT) AS mx
      FROM events GROUP BY user_id ORDER BY user_id"""))

  // ------------------------------------------------------------------ g39
  // v3 row lineage through DML: the setup wrote nation as ONE sorted
  // file (_row_id == n_nationkey), then CoW-updated every 5th row. The
  // rewrite must preserve _row_id on every row and move ONLY the
  // updated rows to the update commit's sequence number (spec
  // format/spec.md row lineage; reference ExtractRowLineage +
  // TestRowLevelOperationsWithLineage).
  private val g39 = Q(
    "g39_engine_row_lineage",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.lin_g")
        .select(col("n_nationkey"), col("n_name"),
          col("_row_id").as("rid"),
          col("_last_updated_sequence_number").as("lseq"))
        .orderBy("n_nationkey")
    },
    Some("""
      SELECT n_nationkey,
        CASE WHEN n_nationkey % 5 = 2 THEN n_name || '!' ELSE n_name END AS n_name,
        n_nationkey AS rid,
        CAST(CASE WHEN n_nationkey % 5 = 2 THEN 2 ELSE 1 END AS BIGINT) AS lseq
      FROM nation ORDER BY n_nationkey"""))

  // ------------------------------------------------------------------ g40
  // Runtime filtering (DPP): a broadcast dim filtered to one month joins
  // the month-partitioned fact on the partition SOURCE column; Spark
  // hands the dim's values to the scan as a runtime predicate
  // (SupportsRuntimeV2Filtering) and the scan re-plans to one month of
  // files. The dynamic-pruning subquery is asserted in the plan — a
  // silent fallback to a full scan fails the gate.
  private val g40 = Q(
    "g40_engine_runtime_filter",
    (s, dir) => {
      setup(s, dir)
      val dim = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1996-04-01").cast(TimestampType))
        .select(col("l_shipdate").as("d")).distinct()
      val df = s.table("graft.db.lineitem_g")
        .join(dim, col("l_shipdate") === col("d"))
        .groupBy("d")
        .agg(count(lit(1)).as("n"), sum(cents(col("l_extendedprice"))).as("sum_e2"))
        .orderBy("d")
      val plan = df.queryExecution.executedPlan.toString
      require(plan.toLowerCase.contains("dynamicpruning"),
        s"g40: expected a dynamic-pruning runtime filter on the graft scan:\n$plan")
      df
    },
    Some("""
      WITH dim AS (SELECT DISTINCT l_shipdate AS d FROM lineitem
                   WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
                     AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00')
      SELECT d, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM lineitem JOIN dim ON l_shipdate = d
      GROUP BY d ORDER BY d"""))

  // ------------------------------------------------------------------ g41
  // compute_table_stats: per-column NDVs land as stats.ndv.* properties
  // (and a puffin statistics file) feeding join-strategy stats; at
  // nation cardinality the HLL++ sketch is exact, so plain
  // COUNT(DISTINCT) is the oracle (reference
  // ComputeTableStatsSparkAction + theta-sketch puffin blobs).
  private val g41 = Q(
    "g41_engine_table_stats",
    (s, dir) => {
      setup(s, dir)
      val props = new HadoopCatalog(warehouse(dir))
        .loadTable(Seq("db"), "imp_g").get.meta.properties
      val rows = Seq("n_nationkey", "n_name", "n_regionkey")
        .map(c => (c, props(s"stats.ndv.$c").toLong))
      import s.implicits._
      rows.toDF("col_name", "ndv").orderBy("col_name")
    },
    Some("""
      SELECT col_name, ndv FROM (
        SELECT 'n_nationkey' AS col_name, CAST(COUNT(DISTINCT n_nationkey) AS BIGINT) AS ndv FROM nation
        UNION ALL
        SELECT 'n_name', CAST(COUNT(DISTINCT n_name) AS BIGINT) FROM nation
        UNION ALL
        SELECT 'n_regionkey', CAST(COUNT(DISTINCT n_regionkey) AS BIGINT) FROM nation
      ) ORDER BY col_name"""))

  // ------------------------------------------------------------------ g42
  // remove_orphan_files: the planted copy under data/ must be gone, the
  // live rows untouched — a reachability bug in the distributed diff
  // either leaves the orphan (orphans_left=1) or deletes live data
  // (missing rows); both go red against the oracle.
  private val g42 = Q(
    "g42_engine_orphan_files",
    (s, dir) => {
      setup(s, dir)
      val loc = new HadoopCatalog(warehouse(dir))
        .loadTable(Seq("db"), "orph_g").get.location
      val left = listTree(s"$loc/data").count(_.contains("planted-orphan"))
      s.table("graft.db.orph_g")
        .select(col("r_regionkey"), col("r_name"))
        .withColumn("orphans_left", lit(left.toLong))
        .orderBy("r_regionkey")
    },
    Some("""
      SELECT r_regionkey, r_name, CAST(0 AS BIGINT) AS orphans_left
      FROM region ORDER BY r_regionkey"""))

  // ------------------------------------------------------------------ g43
  // Multi-op transaction: setup committed a property update + an append
  // of externally staged files as ONE CAS (GTable.transaction, reference
  // BaseTransaction). Both supplier halves present = the batch landed
  // atomically; the property is asserted too so a silently dropped
  // metadata op fails the gate.
  private val g43 = Q(
    "g43_engine_transaction",
    (s, dir) => {
      setup(s, dir)
      val meta = new HadoopCatalog(warehouse(dir))
        .loadTable(Seq("db"), "txn_g").get.meta
      require(meta.properties.get("txn-batched").contains("true"),
        "g43: transaction property update missing")
      s.table("graft.db.txn_g")
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), sum(col("s_suppkey")).as("sum_k"))
        .orderBy("s_nationkey")
    },
    Some("""
      SELECT s_nationkey, COUNT(*) AS n, CAST(SUM(s_suppkey) AS BIGINT) AS sum_k
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"""))

  // ------------------------------------------------------------------ g44
  // v4 relative metadata locations: the gate reads the DIRECTORY COPY of
  // a merge-on-read table (made in setup with zero metadata rewrites).
  // Re-rooted data paths, manifests AND the position-delete index must
  // all resolve under the new home or rows go missing/resurrect against
  // the oracle (SURVEY §1 v4 relative paths; reference discussion in
  // format/spec.md location fields).
  private val g44 = Q(
    "g44_engine_relocated_table",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.relo_copy_g")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_k"),
          sum(cents(col("o_totalprice"))).as("sum_e2"))
    },
    Some("""
      SELECT COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS sum_k,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM orders WHERE o_orderkey % 9 <> 4"""))

  // ------------------------------------------------------------------ g45
  // Watermark semantics as an ORACLE gate (previously unit-only): the
  // sink holds exactly the hour windows of the last 25h whose end the
  // watermark (max ts, ms-floored, minus 1h) passed — the 25h+-old file
  // streamed two batches behind the watermark raise and append mode
  // dropped every row of it; still-open trailing windows never emitted.
  // Setup streams three files newest-first, one per micro-batch (see
  // wmk_src_g / wmk_g in setup for why three).
  private val g45 = Q(
    "g45_engine_stream_watermark",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.wmk_g").orderBy("win_start_us", "event_type")
    },
    Some("""
      WITH mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events)
      SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS win_start_us,
             event_type, COUNT(*) AS n
      FROM events, mx
      WHERE epoch_us(ts) >= m - 25 * 3600000000
        AND epoch_us(ts) - epoch_us(ts) % 3600000000 + 3600000000
            <= (m // 1000 - 3600000) * 1000
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ------------------------------------------------------------------ g46
  // Distributed scan planning as an ORACLE gate (previously unit-only):
  // force the metadata threshold to 1 byte so the multi-manifest
  // orders_snap scan plans as a Spark job (reference
  // SparkDistributedDataScan; manifests fan out, only surviving tasks
  // return to the driver), execute under that conf, and require the
  // scan report to confirm the distributed path actually ran — then
  // compare the result against the oracle like any other gate.
  private val g46 = Q(
    "g46_engine_distributed_planning",
    (s, dir) => {
      setup(s, dir)
      val key = "spark.graft.distributed-planning-min-bytes"
      s.conf.set(key, "1")
      val df = try {
        val d = s.table("graft.db.orders_snap")
          .filter(col("o_orderkey") % 3 === 0)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_k"))
          .orderBy("o_orderstatus")
        // plan + execute NOW, while the threshold override is in force; the
        // persist keeps the distributed-planned result as what Verify
        // writes (an unpersisted re-execution would re-plan without the
        // override). One cached result per JVM — the previous invocation's
        // cache is dropped, not leaked.
        Engine.synchronized {
          if (g46Cache != null) {
            try g46Cache.unpersist(false) catch { case _: Throwable => () }
          }
          g46Cache = d.persist()
        }
        d.count()
        d
      } finally s.conf.unset(key)
      val rpt = graft.core.meta.ScanReports.recent
        .find(_.tableLocation.endsWith("orders_snap"))
      require(rpt.exists(_.distributedPlanning),
        s"g46: scan did not take the distributed-planning path: $rpt")
      df
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS sum_k
      FROM orders WHERE o_orderkey % 3 = 0
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  // ------------------------------------------------------------------ g47
  // Streaming admission control as an ORACLE gate (previously
  // unit-only): the warehouse build streams orders_snap into adm_g
  // under max-files-per-micro-batch=1, so each source data file must
  // arrive in its own micro-batch — and since every admitted batch
  // commits one append snapshot, the sink's snapshot count equals the
  // source's data-file count exactly when the limiter engaged. The
  // gate re-checks that evidence every run, then compares the sink's
  // contents against the oracle.
  private val g47 = Q(
    "g47_engine_admission_control",
    (s, dir) => {
      setup(s, dir)
      val sink = new HadoopCatalog(warehouse(dir)).loadTable(Seq("db"), "adm_g").get
      val batches = sink.meta.snapshots.count(_.operation == "append")
      val files = s.table("graft.db.orders_snap.files").count()
      require(batches == files && batches > 1,
        s"g47: admission control did not split the stream: " +
          s"$batches batches for $files source files")
      s.table("graft.db.adm_g")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_e2"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ------------------------------------------------------------------ g48
  // Stats-for-join-strategy as an ORACLE gate (previously unit-only):
  // two graft tables joined with NO broadcast hint — Spark can only
  // pick the broadcast build side from the sizeInBytes/rowCount our
  // scan reports via SupportsReportStatistics (reference
  // SparkScan.estimateStatistics feeding CBO). A silent fallback to a
  // sort-merge join (e.g. stats missing → sizeInBytes = Long.Max)
  // fails the plan assertion even though the rows would still match.
  private val g48 = Q(
    "g48_engine_join_stats",
    (s, dir) => {
      setup(s, dir)
      val df = s.table("graft.db.lineitem_g")
        .join(s.table("graft.db.orders_snap"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(cents(col("l_extendedprice"))).as("sum_e2"))
        .orderBy("o_orderstatus")
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("BroadcastHashJoin"),
        s"g48: expected reported stats to broadcast the small side:\n$plan")
      df
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  // ------------------------------------------------------------------ g49
  // Dangling-delete removal (reference RemoveDanglingDeletesSparkAction):
  // the setup stranded one eq-delete file (its partition's data files
  // were dropped whole, then fresh higher-sequence rows arrived) and the
  // procedure collected it. The gate asserts the stranded file is GONE
  // from delete_files while the still-applicable eq-deletes of other
  // partitions remain, and that the data — including the re-appended
  // rows whose keys the dead delete once named, which it must never
  // mask — still matches the oracle.
  private val g49 = Q(
    "g49_engine_dangling_deletes",
    (s, dir) => {
      setup(s, dir)
      val nk = t(s, dir, "supplier").agg(min("s_nationkey")).head().getAs[Number](0).longValue
      // the typed unified partition struct makes this check exact: read
      // the delete files' partition values as LONGs, not rendered strings
      val delParts = s.table("graft.db.dang_g.delete_files")
        .select("partition.s_nationkey").collect()
        .filter(!_.isNullAt(0)).map(_.getLong(0)).toSeq
      require(!delParts.contains(nk),
        s"g49: stranded eq-delete of partition $nk survived: $delParts")
      val nNations = t(s, dir, "supplier")
        .select("s_nationkey").distinct().count()
      require(nNations < 2 || delParts.nonEmpty,
        "g49: still-applicable eq-deletes of other partitions were removed")
      s.table("graft.db.dang_g")
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), sum(cents(col("s_acctbal"))).as("sum_c"))
        .orderBy("s_nationkey")
    },
    Some("""
      SELECT s_nationkey, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(s_acctbal AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_c
      FROM (
        SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
        WHERE s_nationkey <> (SELECT MIN(s_nationkey) FROM supplier)
          AND s_suppkey % 3 <> 0
        UNION ALL
        SELECT s_suppkey, s_nationkey, s_acctbal + 100 AS s_acctbal FROM supplier
        WHERE s_nationkey = (SELECT MIN(s_nationkey) FROM supplier)
      ) GROUP BY s_nationkey ORDER BY s_nationkey"""))

  // ------------------------------------------------------------------ g50
  // Rollback + cherry-pick: after main was rolled back past an append and
  // the orphaned snapshot cherry-picked onto the new head, the table must
  // hold exactly the full row set (reference rollback_to_snapshot +
  // cherrypick_snapshot; the history shows the re-applied commit).
  private val g50 = Q(
    "g50_engine_rollback_cherrypick",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.rb_g")
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), max(col("n_name")).as("max_name"))
        .orderBy("n_regionkey")
    },
    Some("""
      SELECT n_regionkey, COUNT(*) AS n, MAX(n_name) AS max_name
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  // ------------------------------------------------------------------ g51
  // rewrite_position_deletes consolidated the scattered MoR deletes
  // (setup asserts the delete-file count strictly dropped); the data
  // must still read exactly as if the deletes applied row-by-row.
  private val g51 = Q(
    "g51_engine_rewrite_position_deletes",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.rpd_g")
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), sum(cents(col("s_acctbal"))).as("sum_c"))
        .orderBy("s_nationkey")
    },
    Some("""
      SELECT s_nationkey, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(s_acctbal AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_c
      FROM supplier WHERE s_suppkey % 5 <> 0 AND s_suppkey % 7 <> 0
      GROUP BY s_nationkey ORDER BY s_nationkey"""))

  // ------------------------------------------------------------------ g52
  // Schema evolution ON WRITE: the table grew a column via the second
  // append's merge-schema option (setup asserts the evolved shape); rows
  // from the first append read null for it, rows from the second carry
  // their values — all through one scan of the evolved table.
  private val g52 = Q(
    "g52_engine_merge_schema_write",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.msch_g")
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"),
          count(col("s_acctbal")).as("with_bal"),
          sum(cents(col("s_acctbal"))).as("sum_c"))
        .orderBy("s_nationkey")
    },
    Some("""
      SELECT s_nationkey, COUNT(*) AS n,
        COUNT(CASE WHEN s_suppkey % 2 = 1 THEN 1 END) AS with_bal,
        CAST(SUM(CASE WHEN s_suppkey % 2 = 1
          THEN CAST(CAST(s_acctbal AS DECIMAL(18,2))*100 AS BIGINT) END) AS BIGINT) AS sum_c
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"""))

  // ------------------------------------------------------------------ g53
  // Metrics modes: setup wrote the table under a counts default with a
  // truncate(4) string column and asserted the trimmed bounds through
  // the files metadata table; this query proves trimmed metrics never
  // change results — pruning with truncated/absent bounds stays sound.
  private val g53 = Q(
    "g53_engine_metrics_modes",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.metrics_g")
        .filter(col("p_name") >= "m" && col("p_size") > 10)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(col("p_size").cast(LongType)).as("sum_size"))
        .orderBy("p_brand")
    },
    Some("""
      SELECT p_brand, COUNT(*) AS n, CAST(SUM(p_size) AS BIGINT) AS sum_size
      FROM part WHERE p_name >= 'm' AND p_size > 10
      GROUP BY p_brand ORDER BY p_brand"""))

  // ------------------------------------------------------------------ g54
  // Commit-time snapshot-summary totals (reference SnapshotSummary):
  // the engine stamped total-records into lineitem_g's append summary
  // from the manifest list alone — the oracle recounts the source rows.
  private val g54 = Q(
    "g54_engine_summary_totals",
    (s, dir) => {
      setup(s, dir)
      s.sql("""SELECT CAST(summary['total-records'] AS BIGINT) AS n,
        CAST(summary['total-delete-files'] AS BIGINT) AS del_files
        FROM graft.db.lineitem_g.snapshots
        ORDER BY committed_at DESC LIMIT 1""")
    },
    Some("""
      SELECT COUNT(*) AS n, CAST(0 AS BIGINT) AS del_files FROM lineitem"""))

  // ------------------------------------------------------------------ g55
  // Table encryption end-to-end (reference format/spec.md encryption
  // keys, gcm-stream-spec.md, parquet modular encryption): the gate
  // asserts — at the BYTE level — that every manifest list/manifest is
  // AGS1, every data and delete file has an encrypted parquet footer
  // (PARE), the snapshot records its key metadata, and the decrypted
  // scan still matches the DuckDB oracle computed from plaintext source.
  private val g55 = Q(
    "g55_engine_encryption",
    (s, dir) => {
      setup(s, dir)
      import graft.core.meta.{AesGcm, GraftIO, ManifestIO}
      val t0 = new HadoopCatalog(warehouse(dir)).loadTable(Seq("db"), "enc_g").get
      require(t0.meta.encryptionKeys.nonEmpty, "g55: no encryption-keys")
      val snap = t0.meta.currentSnapshot.get
      require(snap.keyId.nonEmpty && snap.keyMetadata.nonEmpty,
        "g55: snapshot carries no key metadata")
      def raw(p: String): Array[Byte] =
        java.nio.file.Files.readAllBytes(GraftIO.toPath(p))
      require(AesGcm.isEncrypted(raw(snap.manifestListPath)),
        "g55: manifest list not AGS1")
      val mfs = ManifestIO.readList(snap.manifestListPath)
      require(mfs.nonEmpty && mfs.forall(_.keyMetadata.isDefined),
        "g55: manifest without key metadata")
      mfs.foreach(m => require(AesGcm.isEncrypted(raw(m.path)),
        s"g55: manifest not AGS1: ${m.path}"))
      val tasks = t0.newScan().planFiles()
      val contentFiles =
        tasks.map(_.file.path) ++ tasks.flatMap(_.deletes.map(_.path))
      require(tasks.exists(_.deletes.nonEmpty), "g55: MoR deletes missing")
      contentFiles.distinct.foreach { p =>
        val b = raw(p)
        require(new String(b, 0, 4, "ISO-8859-1") == "PARE",
          s"g55: plaintext parquet footer: $p")
      }
      s.table("graft.db.enc_g")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).as("sum_price_cents"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT)
          AS sum_price_cents
      FROM orders WHERE o_orderkey % 5 <> 2
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  // ------------------------------------------------------------------ g56
  // MERGE … WITH SCHEMA EVOLUTION: setup merged a source carrying a
  // brand-new column into a target without it (asserting the evolved
  // shape); after the merge every supplier row is present and carries
  // the source's s_acctbal — matched rows via UPDATE SET *, new rows
  // via INSERT * — so the table now equals the full supplier relation.
  private val g56 = Q(
    "g56_engine_merge_schema_evolution",
    (s, dir) => {
      setup(s, dir)
      s.table("graft.db.mev_g")
        .groupBy((col("s_suppkey") % 5).as("grp"))
        .agg(count(lit(1)).as("n"),
          count(col("s_acctbal")).as("with_bal"),
          sum(cents(col("s_acctbal"))).as("sum_c"))
        .orderBy("grp")
    },
    Some("""
      SELECT s_suppkey % 5 AS grp, COUNT(*) AS n, COUNT(s_acctbal) AS with_bal,
        CAST(SUM(CAST(CAST(s_acctbal AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT)
          AS sum_c
      FROM supplier GROUP BY 1 ORDER BY grp"""))

  // ------------------------------------------------------------------ g57
  // v3 DV merge invariant: setup committed TWO MoR deletes against a
  // dv-format table; the commit path must have unioned the second
  // delete's vectors into the first's (spec v3: at most one DV per data
  // file) — asserted structurally in-gate, then the masked read is
  // compared against the oracle's two-predicate filter.
  private val g57 = Q(
    "g57_engine_dv_merge",
    (s, dir) => {
      setup(s, dir)
      val t0 = new HadoopCatalog(warehouse(dir)).loadTable(Seq("db"), "dvm_g").get
      val tasks = t0.newScan().planFiles()
      require(tasks.exists(_.deletes.nonEmpty), "g57: no DV deletes planned")
      tasks.filter(_.deletes.nonEmpty).foreach { t =>
        val dvs = t.deletes.map(_.path).distinct
        require(dvs.size == 1,
          s"g57: stacked DVs survived the merge for ${t.file.path}: $dvs")
        require(graft.core.meta.DVIO.isDV(dvs.head),
          s"g57: non-DV delete in a dv-format table: ${dvs.head}")
      }
      s.table("graft.db.dvm_g")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).as("sum_price_cents"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT)
          AS sum_price_cents
      FROM orders WHERE o_orderkey % 4 <> 1 AND o_orderkey % 6 <> 2
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  // ------------------------------------------------------------------ g58
  // REST multi-table transaction (reference RESTCatalog.commitTransaction
  // + open-api /v1/transactions/commit; previously unit-only): ONE atomic
  // transaction moves the n_regionkey>=2 partitions out of nation_r1 and
  // into nation_r2 — a metadata-delete on r1 plus a file-level append to
  // r2, both staged and published through the single transaction
  // endpoint. In-gate requires prove both sides landed; the oracle
  // recomputes the moved set from the source relation.
  private val g58 = Q(
    "g58_engine_rest_transaction",
    (s, dir) => {
      val wh = warehouse(dir) + "_rest"
      val uri = RestFixture.ensure(wh)
      s.conf.set("spark.sql.catalog.grest", classOf[graft.spark.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.grest.catalog-impl", "rest")
      s.conf.set("spark.sql.catalog.grest.uri", uri)
      val cat = graft.core.meta.RestCatalog.connect(uri)
      if (!cat.tableExists(Seq("db"), "nation_r1")) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS grest.db")
        s.sql("""CREATE TABLE grest.db.nation_r1 (
          n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)
          PARTITIONED BY (n_regionkey)""")
        t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
          .writeTo("grest.db.nation_r1").append()
      }
      if (!cat.tableExists(Seq("db"), "nation_r2"))
        s.sql("""CREATE TABLE grest.db.nation_r2 (
          n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)
          PARTITIONED BY (n_regionkey)""")
      if (cat.loadTable(Seq("db"), "nation_r2").get.meta.currentSnapshot.isEmpty) {
        import graft.core.expr.Expr
        cat.transact(Seq(Seq("db") -> "nation_r1", Seq("db") -> "nation_r2")) { ts =>
          val Seq(t1, t2) = ts
          val moving = t1.newScan()
            .filter(Expr.gtEq("n_regionkey", 2L)).planFiles().map(_.file)
          require(moving.nonEmpty, "g58: nothing to move")
          t1.newOverwrite()
            .overwriteByRowFilter(Expr.gtEq("n_regionkey", 2L)).commit()
          t2.newAppend().appendFiles(moving).commit()
        }
      }
      // both legs of the transaction are visible, consistently
      val left = s.table("grest.db.nation_r1")
      require(left.filter(col("n_regionkey") >= 2).isEmpty,
        "g58: moved partitions still visible in nation_r1")
      s.table("grest.db.nation_r2").orderBy("n_nationkey")
    },
    Some("""
      SELECT n_nationkey, n_name, n_regionkey FROM nation
      WHERE n_regionkey >= 2 ORDER BY n_nationkey"""))

  // ------------------------------------------------------------------ g59
  // Parquet bloom filters (reference TableProperties
  // PARQUET_BLOOM_FILTER_* → parquet-mr '#col' conf keys, Parquet.java
  // WriteBuilder): setup wrote orders with a bloom filter on the
  // high-NDV o_orderkey. The gate asserts — at the footer level — that
  // every data file carries the filter for o_orderkey and none for the
  // unconfigured columns, then runs point lookups whose row-group
  // pruning rides that filter (plus stats) and compares to the oracle.
  private val g59 = Q(
    "g59_engine_bloom_filters",
    (s, dir) => {
      setup(s, dir)
      val t0 = new HadoopCatalog(warehouse(dir)).loadTable(Seq("db"), "bloom_g").get
      val files = t0.newScan().planFiles().map(_.file.path)
      require(files.nonEmpty, "g59: no data files")
      files.foreach { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p),
          new org.apache.hadoop.conf.Configuration())
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          // every row group, not just the first: a multi-group file whose
          // later groups lost the filter would silently weaken pruning
          val blocks = r.getFooter.getBlocks
          require(blocks.size() > 0, s"g59: no row groups in $p")
          (0 until blocks.size()).foreach { b =>
            val cols = blocks.get(b).getColumns
            val off = (0 until cols.size()).map(cols.get)
              .map(c => c.getPath.toDotString -> c.getBloomFilterOffset).toMap
            require(off("o_orderkey") > 0,
              s"g59: no bloom filter in $p row group $b")
            require(off("o_custkey") <= 0,
              s"g59: unconfigured column grew a bloom filter in $p row group $b")
          }
        } finally r.close()
      }
      s.table("graft.db.bloom_g")
        .filter(col("o_orderkey").isin(1L, 7L, 32L, 4934L, 999999999L))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).as("sum_c"))
    },
    Some("""
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT)
          AS sum_c
      FROM orders WHERE o_orderkey IN (1, 7, 32, 4934, 999999999)"""))

  // ------------------------------------------------------------------ g60
  // Genuine-Iceberg interop: the setup registered db.ice_reg_g from the
  // metadata.json of a spec-shaped v2 MoR tree. In-gate, every run: the
  // metadata document must BE the spec dialect (operation nested in the
  // snapshot summary, Appendix-C `type` fields, no graft `ftype`), the
  // manifest list and every manifest must be genuine Avro (magic-byte
  // checked), and a live position-delete file must be present — then the
  // registered table must match DuckDB over the raw supplier parquet
  // with the deleted keys subtracted (reference RegisterTableProcedure;
  // TableMetadataParser/ManifestWriter output shapes).
  private val g60 = Q(
    "g60_engine_iceberg_interop",
    (s, dir) => {
      setup(s, dir)
      import graft.core.meta.{AvroManifests, FileContent, GraftIO, ManifestIO, MetaJson}
      val src = new HadoopCatalog(warehouse(dir)).loadTable(Seq("db"), "ice_src_g").get
      val metaDoc = MetaJson.mapper.readTree(
        GraftIO.readString(src.ops.currentMetadataPath.get))
      require(metaDoc.get("format-version").asInt() == 2, "g60: not v2")
      val snaps = metaDoc.get("snapshots")
      require(snaps.size() >= 2, "g60: expected append + delete snapshots")
      (0 until snaps.size()).foreach { i =>
        val sn = snaps.get(i)
        require(!sn.has("operation") && sn.get("summary").has("operation"),
          s"g60: snapshot $i operation not spec-nested: $sn")
        require(sn.has("sequence-number") && sn.has("manifest-list"),
          s"g60: snapshot $i missing v2 fields: $sn")
      }
      val f0 = metaDoc.get("schemas").get(0).get("fields").get(0)
      require(f0.has("type") && !f0.has("ftype"),
        s"g60: schema fields not Appendix-C dialect: $f0")
      val sn = src.meta.currentSnapshot.get
      def avroBytes(p: String) =
        java.nio.file.Files.readAllBytes(GraftIO.toPath(p))
      require(sn.manifestListPath.endsWith(".avro") &&
        AvroManifests.isAvro(avroBytes(sn.manifestListPath)),
        s"g60: manifest list not Avro: ${sn.manifestListPath}")
      val mfs = ManifestIO.readList(sn.manifestListPath)
      mfs.foreach(mf => require(AvroManifests.isAvro(avroBytes(mf.path)),
        s"g60: manifest not Avro: ${mf.path}"))
      val live = mfs.flatMap(mf => ManifestIO.readEntries(mf)).filter(_.isLive)
      require(live.exists(_.file.content == FileContent.PositionDeletes),
        "g60: no live position-delete file in the tree")
      require(live.filter(_.file.content == FileContent.Data)
        .forall(_.file.format == "parquet"), "g60: non-parquet data files")
      s.table("graft.db.ice_reg_g")
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), max(col("s_name")).as("max_name"))
        .orderBy("s_nationkey")
    },
    Some("""
      SELECT s_nationkey, COUNT(*) AS n, MAX(s_name) AS max_name
      FROM supplier WHERE s_suppkey % 7 <> 3
      GROUP BY s_nationkey ORDER BY s_nationkey"""))

  // ------------------------------------------------------------------ g61
  // Partition statistics file: compute_partition_stats writes the spec's
  // Parquet shape (reference api/.../PartitionStatistics.java — one
  // unified partition struct + per-partition counts, parquet field ids
  // 1-13) registered under metadata `partition-statistics`. The gate
  // reads the file back with a plain parquet reader; per-partition
  // data_record_count must equal DuckDB's GROUP BY over the raw source
  // (part_ow's dynamic overwrite replaced Brand#1 rows 1:1, so live
  // per-brand record counts still match the source).
  private val g61 = Q(
    "g61_engine_partition_stats",
    (s, dir) => {
      setup(s, dir)
      s.sql("CALL graft.system.compute_partition_stats('db.part_ow')")
      val psPath = new HadoopCatalog(warehouse(dir))
        .loadTable(Seq("db"), "part_ow").get.meta.partitionStatistics.head.path
      require(psPath.endsWith(".parquet"), s"g61: not a parquet stats file: $psPath")
      s.read.parquet(psPath)
        .selectExpr("partition.p_brand AS p_brand",
          "data_record_count AS brand_rows")
        .orderBy("p_brand")
    },
    Some("""
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS brand_rows
      FROM part GROUP BY p_brand ORDER BY p_brand"""))

  // ------------------------------------------------------------------ g62
  // Spec REST commit protocol: a catalog with commit-protocol=spec sends
  // every commit as the spec's CommitTableRequest — typed requirements
  // plus update actions (reference MetadataUpdateParser /
  // UpdateRequirementParser, open-api updateTable) — which the server
  // validates and replays. Create, append, row-level delete, and schema
  // evolution all cross the wire as updates; the final table must match
  // the oracle computed directly on the raw source.
  private val g62 = Q(
    "g62_engine_rest_spec_protocol",
    (s, dir) => {
      val wh = warehouse(dir) + "_rest"
      val uri = RestFixture.ensure(wh)
      s.conf.set("spark.sql.catalog.grests", classOf[graft.spark.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.grests.catalog-impl", "rest")
      s.conf.set("spark.sql.catalog.grests.uri", uri)
      s.conf.set("spark.sql.catalog.grests.commit-protocol", "spec")
      val cat = graft.core.meta.RestCatalog.connect(uri)
      if (!cat.tableExists(Seq("db"), "nation_sp")) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS grests.db")
        s.sql("""CREATE TABLE grests.db.nation_sp (
          n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)
          PARTITIONED BY (n_regionkey)""")
        t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
          .writeTo("grests.db.nation_sp").append()
        s.sql("DELETE FROM grests.db.nation_sp WHERE n_regionkey = 0")
        s.sql("ALTER TABLE grests.db.nation_sp ADD COLUMN note STRING")
        s.sql("INSERT INTO grests.db.nation_sp VALUES (30, 'GRAFTLAND', 9, 'new')")
      }
      s.table("grests.db.nation_sp")
        .select("n_nationkey", "n_name", "n_regionkey", "note")
        .orderBy("n_nationkey")
    },
    Some("""
      SELECT n_nationkey, n_name, n_regionkey, CAST(NULL AS VARCHAR) AS note
      FROM nation WHERE n_regionkey <> 0
      UNION ALL
      SELECT 30, 'GRAFTLAND', 9, 'new'
      ORDER BY n_nationkey"""))

  // ------------------------------------------------------------------ g63
  // Mixed-format MoR interop: the setup registered db.mix_reg_g from the
  // metadata.json of a spec-shaped v2 tree whose position-delete files
  // are AVRO over PARQUET data — the default shape Flink CDC writes and
  // the first thing a migrating MoR user reads (reference
  // data/.../DeleteFilter.java dispatches readers per DeleteFile.format()).
  // In-gate every run: the live tree must really hold avro delete files
  // next to parquet data files, then the registered table must match
  // DuckDB over the raw customer parquet minus the deleted keys.
  private val g63 = Q(
    "g63_engine_mixed_delete_formats",
    (s, dir) => {
      setup(s, dir)
      import graft.core.meta.{FileContent, ManifestIO}
      val src = new HadoopCatalog(warehouse(dir)).loadTable(Seq("db"), "mix_src_g").get
      val live = ManifestIO.readList(src.meta.currentSnapshot.get.manifestListPath)
        .flatMap(mf => ManifestIO.readEntries(mf)).filter(_.isLive)
      val dels = live.filter(_.file.content == FileContent.PositionDeletes)
      require(dels.nonEmpty && dels.forall(e =>
        e.file.format == "avro" && e.file.path.endsWith(".avro")),
        s"g63: expected avro position-delete files, got ${dels.map(_.file.format)}")
      require(live.filter(_.file.content == FileContent.Data)
        .forall(_.file.format == "parquet"), "g63: non-parquet data files")
      s.table("graft.db.mix_reg_g")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(cents(col("c_acctbal"))).as("bal_e2"))
        .orderBy("c_nationkey")
    },
    Some("""
      SELECT c_nationkey, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS bal_e2
      FROM customer WHERE c_custkey % 5 <> 2
      GROUP BY c_nationkey ORDER BY c_nationkey"""))

  // ------------------------------------------------------------------ g64
  // REST server-side scan planning (reference open-api planTableScan /
  // fetchPlanningResult / fetchScanTasks; CatalogHandlers, RESTTableScan):
  // a catalog with rest-scan-planning=server never reads manifests
  // client-side — the filter crosses as a spec Predicate, the server runs
  // the 3-layer pruning funnel, and only surviving FileScanTasks (plus
  // their MoR delete files) come back, chunked into opaque plan-tasks.
  // The gate writes a partitioned MoR table over the REST catalog, then
  // queries it through a SERVER-PLANNING catalog with a partition filter
  // and matches DuckDB on the raw source.
  private val g64 = Q(
    "g64_engine_rest_server_planning",
    (s, dir) => {
      val wh = warehouse(dir) + "_rest"
      val uri = RestFixture.ensure(wh)
      s.conf.set("spark.sql.catalog.grest.uri", uri) // base catalog (writes)
      s.conf.set("spark.sql.catalog.grest", classOf[graft.spark.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.grest.catalog-impl", "rest")
      // the reading catalog plans through the server
      s.conf.set("spark.sql.catalog.grestp", classOf[graft.spark.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.grestp.catalog-impl", "rest")
      s.conf.set("spark.sql.catalog.grestp.uri", uri)
      s.conf.set("spark.sql.catalog.grestp.rest-scan-planning", "server")
      val cat = graft.core.meta.RestCatalog.connect(uri)
      if (!cat.tableExists(Seq("db"), "orders_sp")) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS grest.db")
        s.sql("""CREATE TABLE grest.db.orders_sp (
          o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
          PARTITIONED BY (o_orderstatus)
          TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
        t(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .writeTo("grest.db.orders_sp").append()
        s.sql("DELETE FROM grest.db.orders_sp WHERE o_orderkey % 3 = 1")
      }
      // in-gate attestation: the server-planned task set equals local
      // planning exactly (files + delete files), so the query below
      // genuinely exercised the wire protocol
      val table = cat.loadTable(Seq("db"), "orders_sp").get
      val localPlan = table.newScan().planFiles()
      val remotePlan = cat.tableOps(Seq("db"), "orders_sp")
        .asInstanceOf[graft.core.meta.RestTableOps]
        .planScan(table.meta.currentSnapshot.map(_.snapshotId),
          graft.core.expr.TrueE, table.meta)
      def k(ts: Seq[graft.core.meta.FileScanTask]) =
        ts.map(t => (t.file.path, t.deletes.map(_.path).sorted)).sortBy(_._1)
      require(remotePlan.nonEmpty && k(remotePlan) == k(localPlan),
        s"g64: server plan diverged from local (${remotePlan.size} vs ${localPlan.size})")
      s.table("grestp.db.orders_sp")
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).as("sum_e2"))
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_e2
      FROM orders WHERE o_orderkey % 3 <> 1 AND o_orderstatus = 'F'
      GROUP BY o_orderstatus"""))

  // ------------------------------------------------------------------ g65
  // Delta Lake import (reference delta-lake
  // BaseSnapshotDeltaLakeTableAction): the gate SYNTHESIZES a Delta
  // table from nation — one parquet file per region written WITHOUT the
  // partition column (the Delta physical layout), a version-0 log of
  // metaData + adds, and a version-1 replace of region 0's file —
  // then snapshot_delta replays it into a graft table. Matching the
  // oracle proves: log replay (the replace must win), name-mapped reads
  // (no field ids in the files), and identity-partition constants (the
  // partition column exists only in the log).
  private val g65 = Q(
    "g65_engine_delta_import",
    (s, dir) => {
      val wh = warehouse(dir)
      val cat = new HadoopCatalog(wh)
      if (!cat.loadTable(Seq("db"), "delta_imp_g").isDefined) {
        val root = s"$wh/_delta_src_nation"
        val logDir = s"$root/_delta_log"
        // idempotent re-entry: a crashed prior attempt leaves a partial
        // source tree (and possibly a half-created table) that would
        // poison every later run — wipe both before synthesizing
        cat.dropTable(Seq("db"), "delta_imp_g")
        graft.core.meta.GraftIO.deleteTree(root)
        val nation = t(s, dir, "nation")
          .select("n_nationkey", "n_name", "n_regionkey")
        val schemaJson = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n_nationkey", LongType),
          org.apache.spark.sql.types.StructField("n_name", StringType),
          org.apache.spark.sql.types.StructField("n_regionkey", LongType))).json
        val regions = nation.select("n_regionkey").distinct()
          .collect().map(_.getAs[Number](0).longValue).sorted
        def writeRegion(r: Long, suffix: String): (String, Long) = {
          val tmp = java.nio.file.Files.createTempDirectory("g65").toString
          nation.filter(col("n_regionkey") === r)
            .select("n_nationkey", "n_name") // Delta layout: no part col
            .coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = graft.core.meta.GraftIO.walkFiles(tmp)
            .filter(_.endsWith(".parquet")).head
          val rel = s"r=$r/part-$suffix.parquet"
          val dst = graft.core.meta.GraftIO.toPath(s"$root/$rel")
          java.nio.file.Files.createDirectories(dst.getParent)
          java.nio.file.Files.copy(graft.core.meta.GraftIO.toPath(part), dst)
          (rel, java.nio.file.Files.size(dst))
        }
        def add(rel: String, r: Long, size: Long) =
          s"""{"add":{"path":"$rel","partitionValues":{"n_regionkey":"$r"},"size":$size,"modificationTime":1700000000000,"dataChange":true}}"""
        val meta0 = {
          val sch = graft.core.meta.MetaJson.mapper.writeValueAsString(schemaJson)
          s"""{"metaData":{"id":"g65","format":{"provider":"parquet","options":{}},"schemaString":$sch,"partitionColumns":["n_regionkey"],"configuration":{},"createdTime":1700000000000}}"""
        }
        val v0 = regions.map(r => writeRegion(r, "v0") match {
          case (rel, size) => (r, rel, size)
        })
        graft.core.meta.GraftIO.writeString(
          s"$logDir/${"%020d".format(0)}.json",
          (meta0 +: v0.map { case (r, rel, size) => add(rel, r, size) }.toSeq)
            .mkString("\n"))
        // v1: replace region 0's file (same rows, fresh file) — replay
        // must drop the removed file or region 0 double-counts
        val (rel1, size1) = writeRegion(regions.head, "v1")
        graft.core.meta.GraftIO.writeString(
          s"$logDir/${"%020d".format(1)}.json",
          Seq(s"""{"remove":{"path":"${v0.head._2}","deletionTimestamp":1700000001000,"dataChange":true}}""",
            add(rel1, regions.head, size1)).mkString("\n"))
        s.conf.set("spark.sql.catalog.graft", classOf[graft.spark.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.graft.warehouse", wh)
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
        s.sql(s"CALL graft.system.snapshot_delta('$root', 'db.delta_imp_g')")
      }
      s.table("graft.db.delta_imp_g")
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), max(col("n_name")).as("max_name"),
          sum(col("n_nationkey")).as("sum_k"))
        .orderBy("n_regionkey")
    },
    Some("""
      SELECT n_regionkey, COUNT(*) AS n, MAX(n_name) AS max_name,
        CAST(SUM(n_nationkey) AS BIGINT) AS sum_k
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  // ------------------------------------------------------------------ g66
  // Hive Metastore catalog (reference hive-metastore HiveCatalog +
  // HiveTableOperations): the metadata pointer lives in the HMS table's
  // metadata_location parameter and every commit CASes through an
  // exclusive HMS table lock. The metastore runs EMBEDDED over Derby
  // (standard HMS local mode, txn schema bootstrapped so the real lock
  // path runs). The gate writes a partitioned table with a MoR delete
  // through catalog-impl=hive and matches DuckDB on the raw source.
  private val g66 = Q(
    "g66_engine_hive_catalog",
    (s, dir) => {
      val wh = warehouse(dir) + "_hms"
      s.conf.set("spark.sql.catalog.ghms", classOf[graft.spark.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.ghms.warehouse", wh)
      s.conf.set("spark.sql.catalog.ghms.catalog-impl", "hive")
      val cat = new graft.core.meta.HiveMsCatalog(wh,
        graft.core.meta.HiveMs.connect(None, s"$wh/_hms_db", wh))
      if (!cat.tableExists(Seq("db"), "supp_hms")) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS ghms.db")
        s.sql("""CREATE TABLE ghms.db.supp_hms (
          s_suppkey BIGINT, s_nationkey BIGINT, s_acctbal DOUBLE)
          PARTITIONED BY (s_nationkey)
          TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
        t(s, dir, "supplier")
          .select("s_suppkey", "s_nationkey", "s_acctbal")
          .writeTo("ghms.db.supp_hms").append()
        s.sql("DELETE FROM ghms.db.supp_hms WHERE s_suppkey % 4 = 2")
      }
      // in-gate attestation: the HMS entry really is the pointer
      val hms = cat.hive.sync(_.getTable("db", "supp_hms"))
      require(hms.getParameters.get("table_type") == "ICEBERG" &&
        hms.getParameters.get("metadata_location") != null,
        "g66: HMS table must carry the metadata_location pointer")
      s.table("ghms.db.supp_hms")
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), sum(cents(col("s_acctbal"))).as("sum_b2"))
        .orderBy("s_nationkey")
    },
    Some("""
      SELECT s_nationkey, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(s_acctbal AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_b2
      FROM supplier WHERE s_suppkey % 4 <> 2
      GROUP BY s_nationkey ORDER BY s_nationkey"""))

  // ------------------------------------------------------------------ g67
  // Import FROM A SESSION-CATALOG TABLE IDENTIFIER (reference
  // SnapshotTableProcedure / AddFilesProcedure + SparkTableUtil
  // .getPartitions): the gate registers supplier as partitioned
  // parquet AND orc tables in spark_catalog, snapshots each BY NAME —
  // partition list and types from the catalog, never path inference —
  // and matches DuckDB over the raw source. The ORC half additionally
  // proves the orc-nm constant fill (the files physically lack
  // s_nationkey; its values exist only in the metastore).
  private val g67 = Q(
    "g67_engine_catalog_import",
    (s, dir) => {
      val wh = warehouse(dir)
      val cat = new HadoopCatalog(wh)
      s.conf.set("spark.sql.catalog.graft", classOf[graft.spark.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      if (!cat.loadTable(Seq("db"), "cat_imp_pq").isDefined ||
          !cat.loadTable(Seq("db"), "cat_imp_orc").isDefined) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
        // idempotent re-entry: wipe partial source trees + half-created
        // tables from a crashed prior attempt
        cat.dropTable(Seq("db"), "cat_imp_pq")
        cat.dropTable(Seq("db"), "cat_imp_orc")
        Seq("pq", "orc").foreach { f =>
          s.sql(s"DROP TABLE IF EXISTS spark_catalog.default.g67_src_$f")
          graft.core.meta.GraftIO.deleteTree(s"$wh/_cat_src_$f")
        }
        t(s, dir, "supplier")
          .select("s_suppkey", "s_acctbal", "s_nationkey")
          .createOrReplaceTempView("g67_supplier_src")
        Seq("pq" -> "parquet", "orc" -> "orc").foreach { case (k, fmt) =>
          s.sql(s"""CREATE TABLE spark_catalog.default.g67_src_$k
            (s_suppkey BIGINT, s_acctbal DOUBLE, s_nationkey BIGINT)
            USING $fmt PARTITIONED BY (s_nationkey)
            LOCATION '$wh/_cat_src_$k'""")
          s.sql(s"""INSERT INTO spark_catalog.default.g67_src_$k
            SELECT s_suppkey, s_acctbal, s_nationkey FROM g67_supplier_src""")
          s.sql(s"CALL graft.system.snapshot_table(" +
            s"'default.g67_src_$k', 'db.cat_imp_$k')")
        }
      }
      def side(tbl: String, tag: String) =
        s.table(tbl).select(lit(tag).as("src"), col("s_nationkey"),
          col("s_suppkey"), cents(col("s_acctbal")).as("b2"))
      side("graft.db.cat_imp_pq", "pq")
        .unionAll(side("graft.db.cat_imp_orc", "orc"))
        .groupBy("src", "s_nationkey")
        .agg(count(lit(1)).as("n"), sum(col("b2")).as("sum_b2"),
          sum(col("s_suppkey")).as("sum_k"))
        .orderBy("src", "s_nationkey")
    },
    Some("""
      WITH s2 AS (SELECT s_nationkey, s_suppkey,
          CAST(CAST(s_acctbal AS DECIMAL(18,2))*100 AS BIGINT) AS b2
        FROM supplier)
      SELECT src, s_nationkey, COUNT(*) AS n,
        CAST(SUM(b2) AS BIGINT) AS sum_b2,
        CAST(SUM(s_suppkey) AS BIGINT) AS sum_k
      FROM (SELECT 'pq' AS src, * FROM s2
            UNION ALL SELECT 'orc' AS src, * FROM s2)
      GROUP BY src, s_nationkey ORDER BY src, s_nationkey"""))

  // ------------------------------------------------------------------ g68
  // REST conditional loads + lazy snapshot history (open-api loadTable
  // If-None-Match/304 + the `snapshots` query param; reference
  // RESTSessionCatalog SnapshotMode.REFS + RESTCatalogProperties
  // SNAPSHOT_LOADING_MODE): three snapshots with a tag on the first are
  // read through a snapshot-loading-mode=refs catalog — current data
  // AND time travel to the MIDDLE snapshot, which no ref names, so the
  // lazy full load must fire. In-gate attestations: the refs wire shape
  // is filtered to ref heads, and a repeat load on one handle is served
  // 304 off the client's ETag.
  private val g68 = Q(
    "g68_engine_rest_lazy_loads",
    (s, dir) => {
      val wh = warehouse(dir) + "_rest"
      val uri = RestFixture.ensure(wh)
      s.conf.set("spark.sql.catalog.grest", classOf[graft.spark.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.grest.catalog-impl", "rest")
      s.conf.set("spark.sql.catalog.grest.uri", uri)
      s.conf.set("spark.sql.catalog.grestr", classOf[graft.spark.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.grestr.catalog-impl", "rest")
      s.conf.set("spark.sql.catalog.grestr.uri", uri)
      s.conf.set("spark.sql.catalog.grestr.snapshot-loading-mode", "refs")
      s.conf.set("spark.sql.catalog.grestr.cache-enabled", "false")
      val cat = graft.core.meta.RestCatalog.connect(uri)
      if (!cat.tableExists(Seq("db"), "cust_lazy")) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS grest.db")
        s.sql("""CREATE TABLE grest.db.cust_lazy (
          c_custkey BIGINT, c_nationkey BIGINT, c_acctbal DOUBLE)""")
        val src = t(s, dir, "customer")
          .select("c_custkey", "c_nationkey", "c_acctbal")
        src.filter(col("c_custkey") % 3 === 0)
          .writeTo("grest.db.cust_lazy").append()
        s.sql("ALTER TABLE grest.db.cust_lazy CREATE TAG first_load")
        src.filter(col("c_custkey") % 3 === 1)
          .writeTo("grest.db.cust_lazy").append()
        src.filter(col("c_custkey") % 3 === 2)
          .writeTo("grest.db.cust_lazy").append()
      }
      val allMeta = cat.loadTable(Seq("db"), "cust_lazy").get.meta
      val snapIds = allMeta.snapshots.map(_.snapshotId)
      require(snapIds.size == 3, s"g68: expected 3 snapshots, got ${snapIds.size}")
      // attestation 1: ?snapshots=refs ships only the tag + main heads
      val (rc, rb, _) = graft.core.meta.RestHttp.getWithEtag(
        s"$uri/v1/namespaces/db/tables/cust_lazy?snapshots=refs")
      require(rc == 200, s"g68: refs load failed: $rc")
      val refsWire = {
        val arr = graft.core.meta.MetaJson.mapper.readTree(rb)
          .get("metadata").get("snapshots")
        val b = Set.newBuilder[Long]
        arr.elements().forEachRemaining(n => b += n.get("snapshot-id").asLong())
        b.result()
      }
      require(refsWire == Set(snapIds.head, snapIds.last),
        s"g68: refs wire shape not filtered to ref heads: $refsWire")
      // attestation 2: a repeat load on one handle is a 304 cache hit
      val ops = cat.tableOps(Seq("db"), "cust_lazy")
      ops.currentVersion()
      val nm0 = graft.core.meta.RestCatalogServer.tableLoad304.get()
      ops.currentVersion()
      require(graft.core.meta.RestCatalogServer.tableLoad304.get() > nm0,
        "g68: repeat load must be served 304 off the ETag")
      // attestation 3: time travel to the UNREFERENCED middle snapshot
      // through the refs-mode catalog forces the lazy full load
      val middle = snapIds(1)
      val ttGot = s.sql(
        s"SELECT count(*) FROM grestr.db.cust_lazy VERSION AS OF $middle")
        .collect().head.getLong(0)
      val ttExp = t(s, dir, "customer")
        .filter(col("c_custkey") % 3 < 2).count()
      require(ttGot == ttExp,
        s"g68: refs-mode time travel returned $ttGot, expected $ttExp")
      s.table("grestr.db.cust_lazy")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"), sum(cents(col("c_acctbal"))).as("sum_b2"))
        .orderBy("c_nationkey")
    },
    Some("""
      SELECT c_nationkey, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_b2
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""))

  // ------------------------------------------------------------------ g69
  // Views over the Hive Metastore catalog (reference hive-metastore
  // HiveViewOperations + HiveCatalog.listViews): create_view registers
  // an HMS VIRTUAL_VIEW entry with table_type=ICEBERG-VIEW and the
  // metadata_location pointer — the convention foreign engines share —
  // and reads resolve the spec view-metadata document it names. The
  // in-gate attestation checks the markers and that the view is NOT
  // visible as a table.
  private val g69 = Q(
    "g69_engine_hive_views",
    (s, dir) => {
      val wh = warehouse(dir) + "_hms"
      s.conf.set("spark.sql.catalog.ghms", classOf[graft.spark.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.ghms.warehouse", wh)
      s.conf.set("spark.sql.catalog.ghms.catalog-impl", "hive")
      val cat = new graft.core.meta.HiveMsCatalog(wh,
        graft.core.meta.HiveMs.connect(None, s"$wh/_hms_db", wh))
      if (!cat.tableExists(Seq("db"), "nation_hv")) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS ghms.db")
        s.sql("CREATE TABLE ghms.db.nation_hv (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)")
        t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
          .writeTo("ghms.db.nation_hv").append()
        s.sql("""CALL ghms.system.create_view('db.nation_by_region_v',
          'SELECT n_regionkey, COUNT(*) AS n, MAX(n_name) AS max_name
           FROM ghms.db.nation_hv GROUP BY n_regionkey', true)""")
      }
      val hms = cat.hive.sync(_.getTable("db", "nation_by_region_v"))
      require("VIRTUAL_VIEW".equalsIgnoreCase(hms.getTableType) &&
        "ICEBERG-VIEW".equalsIgnoreCase(hms.getParameters.get("table_type")) &&
        hms.getParameters.get("metadata_location") != null,
        "g69: the view must be an HMS VIRTUAL_VIEW pointer entry")
      require(!cat.tableExists(Seq("db"), "nation_by_region_v"),
        "g69: a view entry must not read as a table")
      s.sql("""SELECT n_regionkey, n, max_name
        FROM ghms.db.nation_by_region_v ORDER BY n_regionkey""")
    },
    Some("""
      SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n, MAX(n_name) AS max_name
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  // ------------------------------------------------------------------ g70
  // Commit-time manifest merging (reference MergeAppend.java /
  // MergingSnapshotProducer.java, commit.manifest.min-count-to-merge):
  // 150 tiny single-file commits — the streaming-sink shape that
  // otherwise accumulates one manifest per commit forever — must keep
  // the manifest list BOUNDED while full reads, time travel into the
  // middle of the merged history, and the changelog all stay exact.
  private val g70 = Q(
    "g70_engine_manifest_merge",
    (s, dir) => {
      setup(s, dir)
      val cat = new HadoopCatalog(warehouse(dir))
      val ready = cat.loadTable(Seq("db"), "mm150_g")
        .exists(_.meta.snapshots.size == 150)
      if (!ready) {
        cat.dropTable(Seq("db"), "mm150_g")
        s.sessionState.catalogManager.catalog("graft") match {
          case g: graft.spark.GraftCatalog => g.invalidateCache()
          case _ => ()
        }
        s.sql("""CREATE TABLE graft.db.mm150_g (
          n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)
          TBLPROPERTIES ('commit.manifest.min-count-to-merge'='8')""")
        t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
          .coalesce(1).writeTo("graft.db.mm150_g").append()
        val tb = cat.loadTable(Seq("db"), "mm150_g").get
        val baseFiles = tb.newScan().planFiles().map(_.file)
        // 149 more single-manifest commits, each appending a fresh COPY
        // of the base files (metadata-speed, no Spark job per commit)
        (2 to 150).foreach { i =>
          val copies = baseFiles.zipWithIndex.map { case (f, j) =>
            val np = f.path.stripSuffix(".parquet") + s"-c$i-$j.parquet"
            java.nio.file.Files.copy(graft.core.meta.GraftIO.toPath(f.path),
              graft.core.meta.GraftIO.toPath(np))
            f.copy(path = np, firstRowId = None)
          }
          tb.newAppend().appendFiles(copies).commit()
        }
      }
      val meta = cat.loadTable(Seq("db"), "mm150_g").get.refresh()
      val mCount = graft.core.meta.ManifestIO.readList(
        meta.currentSnapshot.get.manifestListPath).size
      // bounded at min-count + a constant — the whole point of the gate
      require(mCount <= 9,
        s"g70: 150 commits must keep the manifest list bounded, got $mCount")
      require(meta.snapshots.size == 150, "g70: expected 150 snapshots")
      val snap40 = meta.snapshots.find(_.sequenceNumber == 40L).get.snapshotId
      val full = s.sql("""SELECT 'full' AS part, COUNT(*) AS n,
        CAST(SUM(n_regionkey) AS BIGINT) AS sumkey FROM graft.db.mm150_g""")
      val tt = s.sql(s"""SELECT 'tt' AS part, COUNT(*) AS n,
        CAST(SUM(n_regionkey) AS BIGINT) AS sumkey
        FROM graft.db.mm150_g VERSION AS OF $snap40""")
      val cdc = s.read.table("graft.db.mm150_g.changes")
        .where(col("_change_type") === "INSERT")
        .agg(count(lit(1)).as("n"), sum(col("n_regionkey")).as("sumkey"))
        .select(lit("cdc").as("part"), col("n"), col("sumkey"))
      val bounded = s.range(1).select(lit("bounded").as("part"),
        lit(if (mCount <= 9) 1L else 0L).as("n"), lit(0L).as("sumkey"))
      full.union(tt).union(cdc).union(bounded).orderBy("part")
    },
    Some("""
      SELECT 'bounded' AS part, CAST(1 AS BIGINT) AS n, CAST(0 AS BIGINT) AS sumkey
      UNION ALL
      SELECT 'cdc', 150*COUNT(*), CAST(150*SUM(n_regionkey) AS BIGINT) FROM nation
      UNION ALL
      SELECT 'full', 150*COUNT(*), CAST(150*SUM(n_regionkey) AS BIGINT) FROM nation
      UNION ALL
      SELECT 'tt', 40*COUNT(*), CAST(40*SUM(n_regionkey) AS BIGINT) FROM nation
      ORDER BY part"""))

  // ------------------------------------------------------------------ g71
  // SQL view DDL (reference spark-extensions RewriteViewCommands.scala:
  // 50-77 + CheckViews.scala + ShowV2ViewsExec.scala): the full view
  // lifecycle — CREATE with a user column list, CREATE OR REPLACE,
  // SHOW VIEWS, ALTER VIEW SET TBLPROPERTIES, DROP VIEW — driven purely
  // as SQL statements against the graft catalog (no procedures), with
  // the stored document staying a spec-shaped versioned view metadata.
  private val g71 = Q(
    "g71_engine_sql_view_ddl",
    (s, dir) => {
      setup(s, dir)
      val wh = warehouse(dir)
      def ident(n: String) =
        org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), n)
      // clean slate: the gate re-drives the lifecycle each run
      s.sql("DROP VIEW IF EXISTS graft.db.flag_stats_v")
      s.sql("DROP VIEW IF EXISTS graft.db.ddl_tmp_v")
      // CREATE with a user column list (aliases re-applied on read)
      s.sql("""CREATE VIEW graft.db.flag_stats_v (flag, n COMMENT 'rows') AS
        SELECT l_returnflag, COUNT(*) FROM graft.db.lineitem_g
        GROUP BY l_returnflag""")
      require(s.sql("SELECT flag, n FROM graft.db.flag_stats_v").collect().nonEmpty,
        "g71: the created view must serve its aliased columns")
      // REPLACE: widen with a quantity sum — reads must serve version 2
      s.sql("""CREATE OR REPLACE VIEW graft.db.flag_stats_v (flag, n, qty_c) AS
        SELECT l_returnflag, COUNT(*), SUM(CAST(l_quantity * 100 AS BIGINT))
        FROM graft.db.lineitem_g GROUP BY l_returnflag""")
      // SHOW VIEWS lists it as a non-temporary catalog view
      val shown = s.sql("SHOW VIEWS IN graft.db").collect()
        .filter(_.getString(1) == "flag_stats_v")
      require(shown.length == 1 && !shown.head.getBoolean(2),
        "g71: SHOW VIEWS must list the view as non-temporary")
      // ALTER ... SET TBLPROPERTIES persists without a new version
      s.sql("ALTER VIEW graft.db.flag_stats_v SET TBLPROPERTIES ('ddl'='sql')")
      val v = graft.spark.GraftViewStore.load(wh, ident("flag_stats_v")).get
      require(v.props.get("ddl").contains("sql"),
        "g71: ALTER VIEW SET TBLPROPERTIES must persist")
      require(v.currentVersionId == 2 && v.versions.size == 2,
        s"g71: REPLACE must append a view version, got ${v.versions.size}")
      require(v.current.sql.contains("l_quantity"),
        "g71: reads must serve the replaced definition")
      // DROP VIEW removes the document; a vanished view stops resolving
      s.sql("CREATE VIEW graft.db.ddl_tmp_v AS SELECT 1 AS one")
      s.sql("DROP VIEW graft.db.ddl_tmp_v")
      require(graft.spark.GraftViewStore.load(wh, ident("ddl_tmp_v")).isEmpty,
        "g71: DROP VIEW must remove the stored document")
      s.sql("""SELECT flag, n, qty_c FROM graft.db.flag_stats_v
        ORDER BY flag""")
    },
    Some("""
      SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(l_quantity * 100 AS BIGINT)) AS BIGINT) AS qty_c
      FROM lineitem GROUP BY l_returnflag ORDER BY flag"""))

  // ------------------------------------------------------------------ g72
  // readable_metrics on the files metadata table (reference
  // MetricsUtil.readableMetricsSchema — MetricsUtil.java:193,354 —
  // joined at BaseFilesTable.java:56): per-column TYPED min/max/null
  // counts, the first tool a user reaches for when debugging why
  // pruning didn't fire. Folding per-file bounds across every data file
  // must reproduce the table-wide min/max/count the oracle computes from
  // the raw rows — typed as long/double/timestamp/string, not hex.
  private val g72 = Q(
    "g72_engine_readable_metrics",
    (s, dir) => {
      setup(s, dir)
      // column_sizes (spec field 117): every data file accounts its
      // columns' on-disk bytes, bounded by the physical file size, and
      // readable_metrics.<col>.column_size serves the same entry
      val szOk = s.sql("""SELECT
          MIN(aggregate(map_values(column_sizes), 0L, (a, v) -> a + v)) AS lo,
          MAX(CASE WHEN aggregate(map_values(column_sizes), 0L, (a, v) -> a + v)
                <= file_size_in_bytes THEN 0 ELSE 1 END) AS oversize,
          MIN(readable_metrics.l_orderkey.column_size) AS rmsz
        FROM graft.db.lineitem_g.files WHERE content = 0""").head()
      require(!szOk.isNullAt(0) && szOk.getLong(0) > 0L,
        "g72: column_sizes must be recorded for written data files")
      require(szOk.getInt(1) == 0,
        "g72: per-column sizes must not exceed the file size")
      require(!szOk.isNullAt(2) && szOk.getLong(2) > 0L,
        "g72: readable_metrics.column_size must serve the manifest entry")
      s.sql("""
        SELECT
          MIN(readable_metrics.l_orderkey.lower_bound) AS lo_ok,
          MAX(readable_metrics.l_orderkey.upper_bound) AS hi_ok,
          MIN(readable_metrics.l_quantity.lower_bound) AS lo_q,
          MAX(readable_metrics.l_quantity.upper_bound) AS hi_q,
          MIN(readable_metrics.l_returnflag.lower_bound) AS lo_f,
          MAX(readable_metrics.l_returnflag.upper_bound) AS hi_f,
          CAST(MIN(unix_micros(readable_metrics.l_shipdate.lower_bound)) AS BIGINT) AS lo_d,
          CAST(MAX(unix_micros(readable_metrics.l_shipdate.upper_bound)) AS BIGINT) AS hi_d,
          CAST(SUM(readable_metrics.l_orderkey.value_count) AS BIGINT) AS vc,
          CAST(SUM(readable_metrics.l_returnflag.null_value_count) AS BIGINT) AS nc
        FROM graft.db.lineitem_g.files WHERE content = 0""")
    },
    Some("""
      SELECT
        MIN(l_orderkey) AS lo_ok, MAX(l_orderkey) AS hi_ok,
        MIN(l_quantity) AS lo_q, MAX(l_quantity) AS hi_q,
        MIN(l_returnflag) AS lo_f, MAX(l_returnflag) AS hi_f,
        CAST(epoch_us(MIN(l_shipdate)) AS BIGINT) AS lo_d,
        CAST(epoch_us(MAX(l_shipdate)) AS BIGINT) AS hi_d,
        CAST(COUNT(*) AS BIGINT) AS vc, CAST(0 AS BIGINT) AS nc
      FROM lineitem"""))

  // ------------------------------------------------------------------ g73
  // Offsets-aware, delete-tolerant splits (reference
  // OffsetsAwareSplitScanTaskIterator.java + BaseFile.java:73
  // split_offsets): a multi-row-group MoR file carrying a DV plans as
  // MULTIPLE row-group-aligned tasks — one DV no longer serializes the
  // whole file onto a single reader — and the split read applies the
  // deletes oracle-exactly (each split derives its first-row index, so
  // masking stays file-absolute).
  private val g73 = Q(
    "g73_engine_split_mor_read",
    (s, dir) => {
      setup(s, dir)
      val cat = new HadoopCatalog(warehouse(dir))
      // self-healing build: a completion marker, not bare existence — a
      // crash mid-build must rebuild, not freeze a half-built table
      val ready = cat.loadTable(Seq("db"), "spl_g")
        .exists(_.meta.properties.get("g73-ready").contains("true"))
      if (!ready) {
        cat.dropTable(Seq("db"), "spl_g")
        s.sessionState.catalogManager.catalog("graft") match {
          case g: graft.spark.GraftCatalog => g.invalidateCache()
          case _ => ()
        }
        s.sql("""CREATE TABLE graft.db.spl_g (l_orderkey BIGINT, l_quantity DOUBLE)
          TBLPROPERTIES ('write.parquet.row-group-size-bytes'='32768',
                         'read.split.target-size'='65536',
                         'write.delete.mode'='merge-on-read')""")
        t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
          .coalesce(1).writeTo("graft.db.spl_g").append()
        s.sql("DELETE FROM graft.db.spl_g WHERE l_orderkey % 7 = 3")
        cat.loadTable(Seq("db"), "spl_g").get
          .updateProperties(Map("g73-ready" -> "true"))
      }
      val gt = cat.loadTable(Seq("db"), "spl_g").get
      val file = gt.newScan().planFiles().map(_.file)
        .filter(_.content == graft.core.meta.FileContent.Data).head
      require(file.splitOffsets.size > 1,
        s"g73: the write must record row-group split_offsets, got ${file.splitOffsets.size}")
      val df = s.table("graft.db.spl_g")
      require(df.rdd.getNumPartitions > 1,
        s"g73: the DV-carrying multi-row-group file must plan >1 task, " +
          s"got ${df.rdd.getNumPartitions}")
      df.agg(count(lit(1)).as("n"),
        sum(cents(col("l_quantity"))).as("qty_c"),
        sum(col("l_orderkey")).as("sum_ok"))
    },
    Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS qty_c,
        CAST(SUM(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem WHERE l_orderkey % 7 <> 3"""))

  // ------------------------------------------------------------------ g74
  // Typed unified partition struct + partitions-table delete debt
  // (reference Partitioning.partitionType — Partitioning.java:240-328 —
  // consumed by PartitionsTable.java:104-121 and BaseFilesTable): the
  // first thing an operator does when chasing a hot or MoR-debt-heavy
  // partition is `WHERE partition.<field> = …` on t.files and read the
  // per-partition position/equality delete counts off t.partitions.
  // One partition gets MoR deletes; the gate (a) filters t.files on the
  // TYPED partition value, (b) reads per-partition delete debt, and
  // (c) asserts last_updated_* tracks the committing snapshot.
  private val g74 = Q(
    "g74_engine_partitions_debt",
    (s, dir) => {
      setup(s, dir)
      val cat = new HadoopCatalog(warehouse(dir))
      // self-healing build: a completion marker, not bare existence
      val ready = cat.loadTable(Seq("db"), "pdebt_g")
        .exists(_.meta.properties.get("g74-ready").contains("true"))
      if (!ready) {
        cat.dropTable(Seq("db"), "pdebt_g")
        s.sessionState.catalogManager.catalog("graft") match {
          case g: graft.spark.GraftCatalog => g.invalidateCache()
          case _ => ()
        }
        s.sql("""CREATE TABLE graft.db.pdebt_g (
          s_suppkey BIGINT, s_nationkey BIGINT, s_acctbal DOUBLE)
          PARTITIONED BY (s_nationkey)
          TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
        t(s, dir, "supplier").select("s_suppkey", "s_nationkey", "s_acctbal")
          .writeTo("graft.db.pdebt_g").append()
        val minNk = t(s, dir, "supplier").agg(min("s_nationkey"))
          .head().getAs[Number](0).longValue
        s.sql(s"""DELETE FROM graft.db.pdebt_g
          WHERE s_suppkey % 3 = 0 AND s_nationkey = $minNk""")
        cat.loadTable(Seq("db"), "pdebt_g").get
          .updateProperties(Map("g74-ready" -> "true"))
      }
      val nk = t(s, dir, "supplier").agg(min("s_nationkey"))
        .head().getAs[Number](0).longValue
      val meta = cat.loadTable(Seq("db"), "pdebt_g").get.meta
      val delSid = meta.currentSnapshot.get.snapshotId
      val appendSid = meta.currentSnapshot.get.parentId.get
      // (a) typed partition predicate on the files table: the debt
      // partition's data-file record_count must equal the raw row count
      val filesRc = s.table("graft.db.pdebt_g.files")
        .filter(col("content") === 0 && col("partition.s_nationkey") === nk)
        .agg(sum("record_count")).head().getLong(0)
      val rawRc = t(s, dir, "supplier")
        .filter(col("s_nationkey") === nk).count()
      require(filesRc == rawRc,
        s"g74: typed partition filter on t.files: $filesRc != $rawRc")
      // (c) freshness columns track the committing snapshot per partition
      val lastBySid = s.table("graft.db.pdebt_g.partitions")
        .select(col("partition.s_nationkey"), col("last_updated_snapshot_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      require(lastBySid(nk) == delSid,
        s"g74: debt partition last_updated ${lastBySid(nk)} != delete commit $delSid")
      require(lastBySid.filter(_._1 != nk).values.forall(_ == appendSid),
        s"g74: untouched partitions must keep the append snapshot $appendSid")
      // (b) per-partition MoR debt, typed keys, against the oracle
      s.table("graft.db.pdebt_g.partitions")
        .select(col("partition.s_nationkey").as("nk"),
          col("record_count").as("rc"),
          col("position_delete_record_count").as("pdc"),
          col("equality_delete_record_count").as("edc"))
        .orderBy("nk")
    },
    Some("""
      SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS rc,
        CAST(SUM(CASE WHEN s_suppkey % 3 = 0
          AND s_nationkey = (SELECT MIN(s_nationkey) FROM supplier)
          THEN 1 ELSE 0 END) AS BIGINT) AS pdc,
        CAST(0 AS BIGINT) AS edc
      FROM supplier GROUP BY s_nationkey ORDER BY nk"""))

  // ------------------------------------------------------------------ g75
  // position_deletes with row/partition/spec_id (reference
  // PositionDeletesTable.java:114-162): rewrite_position_deletes users
  // scope compactions by querying the delete file's own typed partition;
  // the per-partition position counts must match the rows the oracle says
  // were deleted, and the serving columns (spec_id, delete_file_path)
  // must be populated.
  private val g75 = Q(
    "g75_engine_position_deletes_partition",
    (s, dir) => {
      setup(s, dir)
      val cat = new HadoopCatalog(warehouse(dir))
      val ready = cat.loadTable(Seq("db"), "pdrow_g")
        .exists(_.meta.properties.get("g75-ready").contains("true"))
      if (!ready) {
        cat.dropTable(Seq("db"), "pdrow_g")
        s.sessionState.catalogManager.catalog("graft") match {
          case g: graft.spark.GraftCatalog => g.invalidateCache()
          case _ => ()
        }
        s.sql("""CREATE TABLE graft.db.pdrow_g (
          s_suppkey BIGINT, s_nationkey BIGINT)
          PARTITIONED BY (s_nationkey)
          TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
        t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
          .writeTo("graft.db.pdrow_g").append()
        s.sql("DELETE FROM graft.db.pdrow_g WHERE s_suppkey % 4 = 1")
        cat.loadTable(Seq("db"), "pdrow_g").get
          .updateProperties(Map("g75-ready" -> "true"))
      }
      val pd = s.table("graft.db.pdrow_g.position_deletes")
      // `row` (deleted row content) is in the schema; graft's writers
      // don't store it, so it reads back null — the column must exist
      // and be the table's struct
      require(pd.schema.fieldNames.contains("row"), "g75: no row column")
      require(pd.schema("row").dataType.isInstanceOf[
        org.apache.spark.sql.types.StructType], "g75: row not a struct")
      val served = pd.select("spec_id", "delete_file_path").collect()
      require(served.nonEmpty && served.forall(r =>
        !r.isNullAt(0) && r.getString(1).nonEmpty),
        "g75: spec_id/delete_file_path must be populated")
      pd.groupBy(col("partition.s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n"))
        .orderBy("nk")
    },
    Some("""
      SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n
      FROM supplier WHERE s_suppkey % 4 = 1
      GROUP BY s_nationkey ORDER BY nk"""))

  // ------------------------------------------------------------------ g76
  // Time travel on metadata tables (reference BaseMetadataTable):
  // `t.files VERSION AS OF s` serves the PINNED snapshot's manifest
  // state — per-partition record counts at the first append must match
  // the oracle over exactly that append's source subset, with the later
  // append invisible.
  private val g76 = Q(
    "g76_engine_metadata_time_travel",
    (s, dir) => {
      setup(s, dir)
      val cat = new HadoopCatalog(warehouse(dir))
      val ready = cat.loadTable(Seq("db"), "ttm_g")
        .exists(_.meta.properties.get("g76-ready").contains("true"))
      if (!ready) {
        cat.dropTable(Seq("db"), "ttm_g")
        s.sessionState.catalogManager.catalog("graft") match {
          case g: graft.spark.GraftCatalog => g.invalidateCache()
          case _ => ()
        }
        s.sql("""CREATE TABLE graft.db.ttm_g (s_suppkey BIGINT, s_nationkey BIGINT)
          PARTITIONED BY (s_nationkey)""")
        val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        sup.filter(col("s_suppkey") % 2 === 0).writeTo("graft.db.ttm_g").append()
        val sid = cat.loadTable(Seq("db"), "ttm_g").get
          .meta.currentSnapshot.get.snapshotId
        sup.filter(col("s_suppkey") % 2 === 1).writeTo("graft.db.ttm_g").append()
        cat.loadTable(Seq("db"), "ttm_g").get
          .updateProperties(Map("g76-ready" -> "true", "g76-snap" -> sid.toString))
      }
      val sid = cat.loadTable(Seq("db"), "ttm_g").get.meta.properties("g76-snap")
      val now = s.sql("SELECT CAST(sum(record_count) AS BIGINT) FROM graft.db.ttm_g.files WHERE content = 0")
        .head().getLong(0)
      val pinned = s.sql(s"SELECT CAST(sum(record_count) AS BIGINT) FROM graft.db.ttm_g.files VERSION AS OF $sid WHERE content = 0")
        .head().getLong(0)
      require(pinned < now,
        s"g76: the pin must hide the second append ($pinned vs $now)")
      s.sql(s"""SELECT partition.s_nationkey AS nk,
          CAST(sum(record_count) AS BIGINT) AS rc
        FROM graft.db.ttm_g.files VERSION AS OF $sid
        WHERE content = 0 GROUP BY 1 ORDER BY 1""")
    },
    Some("""
      SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS rc
      FROM supplier WHERE s_suppkey % 2 = 0
      GROUP BY s_nationkey ORDER BY nk"""))

  // ------------------------------------------------------------------ g77
  // Entries spec shape + sort_order_id (reference ManifestEntry.getSchema
  // via BaseEntriesTable.java:53-62; DataFile.java:98 sort_order_id):
  // tools written against the reference read `entries.data_file.<field>`
  // and `file_sequence_number`, and check sort_order_id after a sorted
  // compaction. WRITE ORDERED BY registers the order in table metadata
  // (reference SetWriteDistributionAndOrdering replaces the table sort
  // order) so the stamped id is a real foreign key.
  private val g77 = Q(
    "g77_engine_entries_sort_order",
    (s, dir) => {
      setup(s, dir)
      val cat = new HadoopCatalog(warehouse(dir))
      val ready = cat.loadTable(Seq("db"), "soid_g")
        .exists(_.meta.properties.get("g77-ready-v2").contains("true"))
      if (!ready) {
        cat.dropTable(Seq("db"), "soid_g")
        s.sessionState.catalogManager.catalog("graft") match {
          case g: graft.spark.GraftCatalog => g.invalidateCache()
          case _ => ()
        }
        s.sql("""CREATE TABLE graft.db.soid_g (
          s_suppkey BIGINT, s_nationkey BIGINT, s_acctbal DOUBLE)""")
        t(s, dir, "supplier").select("s_suppkey", "s_nationkey", "s_acctbal")
          .writeTo("graft.db.soid_g").append()
        s.sql("ALTER TABLE graft.db.soid_g WRITE ORDERED BY s_suppkey ASC")
        s.sql("""CALL graft.system.rewrite_data_files(table => 'db.soid_g',
          strategy => 'sort', sort_order => 's_suppkey ASC',
          min_input_files => 1)""")
        cat.loadTable(Seq("db"), "soid_g").get
          .updateProperties(Map("g77-ready-v2" -> "true"))
      }
      val meta = cat.loadTable(Seq("db"), "soid_g").get.meta
      val oid = meta.defaultSortOrderId
      require(oid > 0, "g77: WRITE ORDERED BY must register a sort order")
      require(meta.sortOrders.exists(o => o.orderId == oid && o.fields.nonEmpty),
        "g77: the registered order must carry its fields")
      // every live data file came out of the sorted rewrite → stamped
      val stamped = s.table("graft.db.soid_g.files")
        .filter(col("content") === 0).select("sort_order_id").collect()
      require(stamped.nonEmpty && stamped.forall(r =>
        !r.isNullAt(0) && r.getInt(0) == oid),
        "g77: sorted-compaction output must carry the registered sort_order_id")
      // entries serve the reference shape: file fields nested under
      // data_file, file_sequence_number = commit sequence on graft writes
      val e = s.table("graft.db.soid_g.entries")
      require(e.schema.fieldNames.contains("file_sequence_number"),
        "g77: entries must serve file_sequence_number")
      require(e.schema("data_file").dataType
        .isInstanceOf[org.apache.spark.sql.types.StructType],
        "g77: entries must nest the file fields as a data_file struct")
      require(e.filter(col("file_sequence_number") =!= col("sequence_number"))
        .isEmpty, "g77: graft commits never separate file and data sequences")
      // entries serve ALL statuses like the reference (BaseEntriesTable
      // reads entries(), not liveEntries): the sorted rewrite's Deleted
      // markers must be visible, and the aggregate below must exclude
      // them or the replaced files double-count
      require(e.filter(col("status") === 2).count() > 0,
        "g77: the rewrite's status=2 Deleted markers must be served")
      e.filter(col("data_file.content") === 0 && col("status") =!= 2)
        .agg(sum(col("data_file.record_count")).as("rc"),
          min(col("data_file.sort_order_id")).as("soid"))
    },
    Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS rc, 1 AS soid FROM supplier"""))

  // ------------------------------------------------------------------ g78
  // Metadata-scan filter pushdown (reference BaseFilesTable.java:69-86
  // ManifestEvaluator; TestMetadataTableFilters): a partition-filtered
  // t.files query must plan FEWER manifests than the table has — one
  // input partition per surviving manifest — while matching the oracle.
  // Without it, WHERE partition.x = v on a 30k-manifest table reads all
  // 30k manifests executor-side; that's the difference between
  // O(matching) and O(table metadata) at 100 TB.
  private val g78 = Q(
    "g78_engine_metadata_pushdown",
    (s, dir) => {
      setup(s, dir)
      val cat = new HadoopCatalog(warehouse(dir))
      val ready = cat.loadTable(Seq("db"), "pdp_g")
        .exists(_.meta.properties.get("g78-ready").contains("true"))
      if (!ready) {
        cat.dropTable(Seq("db"), "pdp_g")
        s.sessionState.catalogManager.catalog("graft") match {
          case g: graft.spark.GraftCatalog => g.invalidateCache()
          case _ => ()
        }
        s.sql("""CREATE TABLE graft.db.pdp_g (s_suppkey BIGINT, s_nationkey BIGINT)
          PARTITIONED BY (s_nationkey)""")
        val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        // three commits → three manifests with disjoint nation ranges
        (0 until 3).foreach { arm =>
          sup.filter(col("s_nationkey") % 3 === arm)
            .writeTo("graft.db.pdp_g").append()
        }
        cat.loadTable(Seq("db"), "pdp_g").get
          .updateProperties(Map("g78-ready" -> "true"))
      }
      val nk = t(s, dir, "supplier").agg(min("s_nationkey"))
        .head().getAs[Number](0).longValue
      val totalManifests = s.table("graft.db.pdp_g.manifests").count()
      require(totalManifests >= 3, s"g78: expected >=3 manifests, $totalManifests")
      val q = s.table("graft.db.pdp_g.files")
        .filter(col("content") === 0 && col("partition.s_nationkey") === nk)
      val planned = q.rdd.getNumPartitions
      require(planned < totalManifests,
        s"g78: pushdown must prune manifests ($planned planned of $totalManifests)")
      q.agg(sum("record_count").as("rc"))
    },
    Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS rc FROM supplier
      WHERE s_nationkey = (SELECT MIN(s_nationkey) FROM supplier)"""))

  // ------------------------------------------------------------------ g79
  // Changelog-scan filter pushdown (reference BaseIncrementalChangelogScan
  // row filter): a partition-filtered CDC read must plan FEWER change
  // tasks than the unfiltered changelog — a 100 TB table's CDC consumer
  // scoped to one partition must not open every changed file — while the
  // served change rows match the oracle.
  private val g79 = Q(
    "g79_engine_changes_pushdown",
    (s, dir) => {
      setup(s, dir)
      val cat = new HadoopCatalog(warehouse(dir))
      val ready = cat.loadTable(Seq("db"), "cdc_pd_g")
        .exists(_.meta.properties.get("g79-ready").contains("true"))
      if (!ready) {
        cat.dropTable(Seq("db"), "cdc_pd_g")
        s.sessionState.catalogManager.catalog("graft") match {
          case g: graft.spark.GraftCatalog => g.invalidateCache()
          case _ => ()
        }
        s.sql("""CREATE TABLE graft.db.cdc_pd_g (s_suppkey BIGINT, s_nationkey BIGINT)
          PARTITIONED BY (s_nationkey)""")
        t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
          .writeTo("graft.db.cdc_pd_g").append()
        s.sql("""DELETE FROM graft.db.cdc_pd_g
          WHERE s_nationkey = (SELECT MIN(s_nationkey) FROM graft.db.cdc_pd_g)""")
        cat.loadTable(Seq("db"), "cdc_pd_g").get
          .updateProperties(Map("g79-ready" -> "true"))
      }
      val nk = t(s, dir, "supplier").agg(min("s_nationkey"))
        .head().getAs[Number](0).longValue
      val all = s.table("graft.db.cdc_pd_g.changes")
      val q = all.filter(col("s_nationkey") === nk)
      require(q.rdd.getNumPartitions < all.rdd.getNumPartitions,
        s"g79: pushdown must prune change tasks (${q.rdd.getNumPartitions} " +
          s"of ${all.rdd.getNumPartitions})")
      // the min-nation partition was appended then wholly deleted: its
      // filtered changelog is one INSERT + one DELETE per row
      q.groupBy(col("_change_type").as("ct"))
        .agg(count(lit(1)).as("n")).orderBy("ct")
    },
    Some("""
      SELECT ct, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT 'INSERT' AS ct FROM supplier
          WHERE s_nationkey = (SELECT MIN(s_nationkey) FROM supplier)
        UNION ALL
        SELECT 'DELETE' AS ct FROM supplier
          WHERE s_nationkey = (SELECT MIN(s_nationkey) FROM supplier)
      ) GROUP BY ct ORDER BY ct"""))

  val all: Vector[Q] = Vector(g01, g02, g03, g04, g05, g06, g07, g08, g09,
    g10, g11, g12, g13, g14, g15, g16, g17, g18, g19, g20, g21, g22, g23,
    g24, g25, g26, g27, g28, g29, g30, g31, g32, g33, g34, g35, g36, g37,
    g38, g39, g40, g41, g42, g43, g44, g45, g46, g47, g48, g49, g50, g51,
    g52, g53, g54, g55, g56, g57, g58, g59, g60, g61, g62, g63, g64, g65,
    g66, g67, g68, g69, g70, g71, g72, g73, g74, g75, g76, g77, g78, g79)
}
