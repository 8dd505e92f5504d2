package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta.{RestCatalog, RestCatalogServer}
import graft.core.types.{GField, GLong, GSchema, GStruct}

/** REST catalog: server owns the metadata pointer; clients commit over
  * HTTP and see 409 conflicts as CAS failures (reference RESTCatalog +
  * CatalogHandlers). */
class RestCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _
  private var server: com.sun.net.httpserver.HttpServer = _
  private var uri: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-rest-wh").toString
    val started = RestCatalogServer.start(warehouse)
    server = started._1
    uri = started._2
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-rest")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.rcat", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.rcat.catalog-impl", "rest")
      .config("spark.sql.catalog.rcat.uri", uri)
      // same server, but every commit crosses the wire as a SPEC
      // CommitTableRequest (requirements + update actions)
      .config("spark.sql.catalog.rcats", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.rcats.catalog-impl", "rest")
      .config("spark.sql.catalog.rcats.uri", uri)
      .config("spark.sql.catalog.rcats.commit-protocol", "spec")
      // same server in snapshot-loading-mode=refs: branch/tag-referenced
      // snapshots load eagerly, the rest lazily; cache off so reads
      // observe commits made through the other catalogs immediately
      .config("spark.sql.catalog.rcatr", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.rcatr.catalog-impl", "rest")
      .config("spark.sql.catalog.rcatr.uri", uri)
      .config("spark.sql.catalog.rcatr.snapshot-loading-mode", "refs")
      .config("spark.sql.catalog.rcatr.cache-enabled", "false")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rcat.db")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (server != null) server.stop(0)
  }

  test("create, insert, select, time travel, drop over REST") {
    spark.sql("""CREATE TABLE rcat.db.rt (id BIGINT, v STRING, ts TIMESTAMP)
      PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO rcat.db.rt VALUES
      (1, 'a', TIMESTAMP '2024-01-01 10:00:00'),
      (2, 'b', TIMESTAMP '2024-01-02 10:00:00')""")
    assert(spark.sql("SELECT * FROM rcat.db.rt").count() === 2)
    assert(spark.sql("SHOW TABLES IN rcat.db").collect().map(_.getString(1)).contains("rt"))

    spark.sql("DELETE FROM rcat.db.rt WHERE id = 1")
    assert(spark.sql("SELECT * FROM rcat.db.rt").count() === 1)
    val snaps = spark.sql(
      "SELECT snapshot_id FROM rcat.db.rt.snapshots ORDER BY committed_at")
      .collect().map(_.getLong(0))
    assert(spark.sql(s"SELECT * FROM rcat.db.rt VERSION AS OF ${snaps.head}").count() === 2)

    spark.sql("DROP TABLE rcat.db.rt")
    intercept[Exception](spark.sql("SELECT * FROM rcat.db.rt").collect())
  }

  test("views are served over the REST protocol") {
    spark.sql("CREATE TABLE rcat.db.vt2 (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO rcat.db.vt2 VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
    spark.sql("CALL rcat.system.create_view('db.v_rest', " +
      "'SELECT id, v FROM rcat.db.vt2 WHERE id >= 2')")
    assert(spark.sql("SELECT * FROM rcat.db.v_rest").count() === 2)
    // the document landed through the server (server-warehouse layout)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$warehouse/db/_views/v_rest.json")))

    // a second, independent REST client sees the view and its versions
    val rc2 = RestCatalog.connect(uri)
    val docs2 = new GraftViewStore.RestViewDocs(rc2)
    assert(rc2.listViewNames(Seq("db")) === Seq("v_rest"))
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "v_rest")
    assert(GraftViewStore.load(docs2, ident).get.current.sql.contains("id >= 2"))

    // replace appends a version; both clients observe the move
    spark.sql("CALL rcat.system.create_view('db.v_rest', " +
      "'SELECT id FROM rcat.db.vt2 WHERE id >= 3', true)")
    val stored = GraftViewStore.load(docs2, ident).get
    assert(stored.versions.map(_.versionId) === Seq(1, 2))
    assert(stored.currentVersionId === 2)
    assert(spark.sql("SELECT * FROM rcat.db.v_rest").count() === 1)

    // non-replace create of an existing view 409s into the catalog error
    intercept[IllegalStateException] {
      rc2.putViewDoc(Seq("db"), "v_rest", """{"x": 1}""", replace = false)
    }

    spark.sql("CALL rcat.system.drop_view('db.v_rest')")
    assert(rc2.listViewNames(Seq("db")).isEmpty)
    intercept[Exception](spark.sql("SELECT * FROM rcat.db.v_rest").collect())
  }

  test("server-side CAS: stale client commit gets 409 and retries cleanly") {
    val cat = RestCatalog.connect(uri)
    val schema = GSchema(GStruct(Seq(GField(1, "id", GLong))))
    cat.createTable(Seq("db"), "cas", schema)

    // two independent handles race property commits; both must land
    val t1 = cat.loadTable(Seq("db"), "cas").get
    val t2 = cat.loadTable(Seq("db"), "cas").get
    t1.updateProperties(Map("a" -> "1"))
    t2.updateProperties(Map("b" -> "2")) // stale base → 409 → retry → lands
    val t3 = cat.loadTable(Seq("db"), "cas").get
    assert(t3.meta.properties.get("a").contains("1"))
    assert(t3.meta.properties.get("b").contains("2"))
    assert(t3.ops.currentVersion() === 3)
  }

  test("paginated listing follows next-page-token; HEAD probes existence") {
    val cat = RestCatalog.connect(uri)
    val schema = GSchema(GStruct(Seq(GField(1, "id", GLong, required = true))))
    val names = (1 to 7).map(i => f"pg_t$i%02d")
    names.foreach(n => cat.createTable(Seq("pgdb"), n, schema))
    // server pages at the requested size with a stable order
    val (c1, b1) = graft.core.meta.RestHttp.get(
      s"$uri/v1/namespaces/pgdb/tables?pageSize=3")
    assert(c1 === 200)
    val n1 = graft.core.meta.MetaJson.mapper.readTree(b1)
    assert(n1.get("identifiers").size() === 3)
    assert(n1.hasNonNull("next-page-token"))
    // the paginating client reassembles the full sorted listing
    assert(cat.listTables(Seq("pgdb")).sorted === names)
    // HEAD existence: 204 + version header for live, 404 for missing
    val (hc, _) = graft.core.meta.RestHttp.head(
      s"$uri/v1/namespaces/pgdb/tables/pg_t01")
    assert(hc === 204)
    assert(cat.tableExists(Seq("pgdb"), "pg_t01"))
    assert(!cat.tableExists(Seq("pgdb"), "pg_missing"))
  }

  test("two catalog instances share one server: concurrent commits retry on 409") {
    val a = RestCatalog.connect(uri)
    val b = RestCatalog.connect(uri)
    val schema = GSchema(GStruct(Seq(GField(1, "id", GLong, required = true))))
    a.createTable(Seq("condb"), "ct", schema)
    val ta = a.loadTable(Seq("condb"), "ct").get
    val tb = b.loadTable(Seq("condb"), "ct").get
    // interleave property commits from both handles: each CAS that loses
    // gets a 409 from the server and the retry loop rebases — no lost
    // updates, both markers present at the end
    ta.updateProperties(Map("from-a" -> "1"))
    tb.updateProperties(Map("from-b" -> "1"))
    ta.updateProperties(Map("from-a2" -> "1"))
    val m = b.loadTable(Seq("condb"), "ct").get.refresh()
    assert(m.properties.get("from-a").contains("1"))
    assert(m.properties.get("from-b").contains("1"))
    assert(m.properties.get("from-a2").contains("1"))
  }

  test("rename over REST moves the table server-side") {
    val cat = RestCatalog.connect(uri)
    val schema = GSchema(GStruct(Seq(GField(1, "id", GLong))))
    cat.createTable(Seq("db"), "ren_r1", schema)
    cat.renameTable(Seq("db"), "ren_r1", Seq("db"), "ren_r2")
    assert(!cat.tableExists(Seq("db"), "ren_r1"))
    assert(cat.tableExists(Seq("db"), "ren_r2"))
    intercept[IllegalArgumentException](
      cat.renameTable(Seq("db"), "ren_r1", Seq("db"), "ren_r3"))
    cat.createTable(Seq("db"), "ren_r3", schema)
    intercept[IllegalStateException](
      cat.renameTable(Seq("db"), "ren_r2", Seq("db"), "ren_r3"))
  }

  test("duplicate create over REST is rejected") {
    val cat = RestCatalog.connect(uri)
    val schema = GSchema(GStruct(Seq(GField(1, "id", GLong))))
    cat.createTable(Seq("db"), "dup_r", schema)
    intercept[IllegalStateException](cat.createTable(Seq("db"), "dup_r", schema))
  }

  test("scan/commit reports are posted to the server metrics endpoint") {
    // a write + a read through the rcat session catalog produce commit
    // and scan reports; the async forwarder posts them to
    // /v1/namespaces/db/tables/mtr/metrics (reference open-api
    // reportMetrics + RESTMetricsReporter)
    spark.sql("CREATE TABLE rcat.db.mtr (id BIGINT)")
    spark.range(0, 50).writeTo("rcat.db.mtr").append()
    assert(spark.sql("SELECT count(*) FROM rcat.db.mtr")
      .collect()(0).getLong(0) === 50L)
    // posts are fire-and-forget on a daemon thread: poll briefly
    def reportCount(): Int = {
      val (code, body) = graft.core.meta.RestHttp.get(
        s"$uri/v1/namespaces/db/tables/mtr/metrics")
      if (code != 200) 0
      else graft.core.meta.MetaJson.mapper.readTree(body)
        .get("report-count").asInt()
    }
    val deadline = System.currentTimeMillis() + 10000
    while (reportCount() == 0 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(reportCount() > 0, "expected at least one posted report")
    val (_, body) = graft.core.meta.RestHttp.get(
      s"$uri/v1/namespaces/db/tables/mtr/metrics")
    val kinds = graft.core.meta.MetaJson.mapper.readTree(body).get("reports")
      .elements()
    var seen = Set.empty[String]
    kinds.forEachRemaining(r => seen += r.get("report-type").asText())
    assert(seen.nonEmpty)
    // a malformed report is rejected at ingest (not stored to poison GET)
    val before = reportCount()
    assert(graft.core.meta.RestHttp.post(
      s"$uri/v1/namespaces/db/tables/mtr/metrics", "not json")._1 === 400)
    assert(reportCount() === before, "malformed body must not be stored")
  }

  test("reconnect after server restart posts metrics with the fresh token") {
    val wh2 = Files.createTempDirectory("graft-rest-rot-wh").toString
    val loc = s"${wh2.stripSuffix("/")}/db/rot_t"
    def report() = graft.core.meta.ScanReport(loc, 1L, "true",
      1, 1, 1L, 1, 0, 3L, System.currentTimeMillis())
    def tokenFor(u: String, secret: String): String = {
      val (code, resp) = graft.core.meta.RestHttp.post(s"$u/v1/oauth/tokens",
        s"grant_type=client_credentials&client_id=svc&client_secret=$secret")
      assert(code === 200, resp)
      graft.core.meta.MetaJson.mapper.readTree(resp).get("access_token").asText()
    }
    def count(u: String, tok: String): Int = {
      val (code, body) = graft.core.meta.RestHttp.get(
        s"$u/v1/namespaces/db/tables/rot_t/metrics",
        Map("Authorization" -> s"Bearer $tok"))
      if (code != 200) -1
      else graft.core.meta.MetaJson.mapper.readTree(body)
        .get("report-count").asInt()
    }
    def waitFor(f: => Boolean): Boolean = {
      val deadline = System.currentTimeMillis() + 10000
      while (!f && System.currentTimeMillis() < deadline) Thread.sleep(50)
      f
    }
    // first server generation, credential A
    val (srv1, u1) = RestCatalogServer.start(wh2, credential = Some(("svc", "a")))
    val port = srv1.getAddress.getPort
    RestCatalog.connect(u1, Some("svc:a"))
    val tok1 = tokenFor(u1, "a")
    graft.core.meta.ScanReports.add(report())
    assert(waitFor(count(u1, tok1) > 0), "first-generation report must arrive")
    srv1.stop(0)
    // same uri, NEW server generation with a ROTATED credential: the
    // registry entry must be refreshed on reconnect — a forwarder still
    // holding generation-1's bearer token would get 401s forever
    val (srv2, u2) = RestCatalogServer.start(wh2, port = port,
      credential = Some(("svc", "b")))
    try {
      assert(u2 === u1)
      RestCatalog.connect(u2, Some("svc:b"))
      val tok2 = tokenFor(u2, "b")
      graft.core.meta.ScanReports.add(report())
      assert(waitFor(count(u2, tok2) > 0),
        "post-rotation report must arrive with the fresh token")
    } finally srv2.stop(0)
  }

  test("OAuth2 client-credentials auth gates every endpoint") {
    val wh2 = Files.createTempDirectory("graft-rest-auth-wh").toString
    val (srv, authUri) = RestCatalogServer.start(wh2,
      credential = Some(("svc-account", "s3cret")))
    try {
      // no credential: config fetch is rejected, connect fails
      val noAuth = intercept[IllegalArgumentException](RestCatalog.connect(authUri))
      assert(noAuth.getMessage.contains("401"))
      // wrong secret: the token endpoint itself refuses
      val badSecret = intercept[IllegalArgumentException](
        RestCatalog.connect(authUri, Some("svc-account:wrong")))
      assert(badSecret.getMessage.contains("401"))
      // right credential: token exchange once, then normal catalog life
      val cat = RestCatalog.connect(authUri, Some("svc-account:s3cret"))
      val schema = GSchema(GStruct(Seq(GField(1, "id", GLong))))
      val t = cat.createTable(Seq("db"), "auth_t", schema)
      t.updateProperties(Map("authed" -> "true"))
      assert(cat.tableExists(Seq("db"), "auth_t"))
      assert(cat.listTables(Seq("db")) === Seq("auth_t"))
      assert(cat.loadTable(Seq("db"), "auth_t").get
        .meta.properties.get("authed").contains("true"))
      // a raw unauthenticated probe against a protected route is a 401
      assert(graft.core.meta.RestHttp.get(
        s"$authUri/v1/namespaces/db/tables")._1 === 401)
      assert(cat.dropTable(Seq("db"), "auth_t"))
    } finally srv.stop(0)
  }

  test("load response carries server table config; client applies, never persists") {
    val wh2 = Files.createTempDirectory("graft-rest-cfg-wh").toString
    val (srv, cfgUri) = RestCatalogServer.start(wh2, tableConfig = Map(
      "write.parquet.compression-codec" -> "zstd", "client.pool-size" -> "4"))
    try {
      val cat = RestCatalog.connect(cfgUri)
      val schema = GSchema(GStruct(Seq(GField(1, "id", GLong))))
      val t = cat.createTable(Seq("db"), "cfg_t", schema,
        properties = Map("owner" -> "tests"))
      // the client-visible properties are stored ++ server config
      // (server wins — reference LoadTableResponse `config` semantics)
      val seen = cat.loadTable(Seq("db"), "cfg_t").get.meta.properties
      assert(seen.get("owner").contains("tests"))
      assert(seen.get("write.parquet.compression-codec").contains("zstd"))
      assert(seen.get("client.pool-size").contains("4"))
      // a load→modify→commit cycle must NOT launder the overlay into the
      // stored metadata: commit a real property change, then read the
      // stored file directly (bypassing the REST client)
      t.updateProperties(Map("touched" -> "yes"))
      val stored = new graft.core.meta.FileTableOps(
        cat.tableLocation(Seq("db"), "cfg_t")).current().get.properties
      assert(stored.get("touched").contains("yes"))
      assert(stored.get("owner").contains("tests"))
      assert(!stored.contains("write.parquet.compression-codec"),
        s"server config leaked into stored properties: $stored")
      assert(!stored.contains("client.pool-size"))
      // an EXPLICIT committer override of a config key does persist
      // (the value differs from the overlay, so it is the user's own)
      t.refresh()
      t.updateProperties(Map("write.parquet.compression-codec" -> "gzip"))
      val stored2 = new graft.core.meta.FileTableOps(
        cat.tableLocation(Seq("db"), "cfg_t")).current().get.properties
      assert(stored2.get("write.parquet.compression-codec").contains("gzip"))
      // ...but the client view still sees the server override on top
      assert(cat.loadTable(Seq("db"), "cfg_t").get.meta.properties
        .get("write.parquet.compression-codec").contains("zstd"))
      // a later commit that does NOT touch the key must keep the user's
      // stored value — the overlay masks it in the committed view, and
      // the strip must map it back instead of dropping the key
      t.refresh()
      t.updateProperties(Map("unrelated" -> "1"))
      val stored3 = new graft.core.meta.FileTableOps(
        cat.tableLocation(Seq("db"), "cfg_t")).current().get.properties
      assert(stored3.get("write.parquet.compression-codec").contains("gzip"),
        s"stored override erased by an unrelated commit: $stored3")
      assert(stored3.get("unrelated").contains("1"))
      assert(!stored3.contains("client.pool-size"))
    } finally srv.stop(0)
  }

  test("vended storage credentials: scoped, expiring, per-load, opt-in") {
    val wh2 = Files.createTempDirectory("graft-rest-vend-wh").toString
    val (srv, vUri) = RestCatalogServer.start(wh2)
    try {
      val schema = GSchema(GStruct(Seq(GField(1, "id", GLong))))
      // without delegation the response carries no credentials at all
      val plain = RestCatalog.connect(vUri)
      plain.createTable(Seq("db"), "vend_t", schema)
      assert(plain.storageCredentials(Seq("db"), "vend_t").isEmpty)
      // with delegation each load vends one credential scoped to the
      // table's location prefix with a future expiry
      val vend = RestCatalog.connect(vUri, accessDelegation = true)
      val before = System.currentTimeMillis()
      val c1 = vend.storageCredentials(Seq("db"), "vend_t")
      assert(c1.size === 1)
      assert(c1.head.prefix === plain.tableLocation(Seq("db"), "vend_t"))
      val tok1 = c1.head.config("token")
      assert(tok1.nonEmpty)
      assert(c1.head.expiresAtMs.exists(_ > before),
        s"vended credential must expire in the future: ${c1.head}")
      // per-load mint: a second load gets a DIFFERENT token (short-lived
      // by design; the client refreshes on reload, reference vended-
      // credential flow)
      val c2 = vend.storageCredentials(Seq("db"), "vend_t")
      assert(c2.head.config("token") !== tok1)
      // unknown table: scoped vend has nothing to scope to
      intercept[IllegalArgumentException](
        vend.storageCredentials(Seq("db"), "nope"))
    } finally srv.stop(0)
  }

  test("auth session outlives token expiry: proactive refresh, 401 retry, vended-cred reload") {
    val wh2 = Files.createTempDirectory("graft-rest-ttl-wh").toString
    // tokens live 2s and genuinely expire server-side; the client
    // session re-exchanges at 80% of TTL. Vended creds live 300ms.
    val (srv, u) = RestCatalogServer.start(wh2,
      credential = Some(("svc", "pw")), tokenTtlSec = 2, credTtlMs = 300)
    val schema = GSchema(GStruct(Seq(GField(1, "id", GLong))))
    val cat = RestCatalog.connect(u, Some("svc:pw"), accessDelegation = true)
    try {
      cat.createTable(Seq("db"), "ttl_t", schema)
      // a catalog-call sequence spanning SEVERAL token lifetimes must
      // succeed without manual re-auth — the failure mode this guards is
      // a streaming job dying with 401s at minute 61 of a 3600s TTL
      (1 to 5).foreach { i =>
        Thread.sleep(900)
        val t = cat.loadTable(Seq("db"), "ttl_t").get
        t.updateProperties(Map(s"step$i" -> "ok"))
      }
      assert(cat.loadTable(Seq("db"), "ttl_t").get
        .meta.properties.contains("step5"))
      // vended-credential expiry: a HELD ops handle whose cached
      // credential lapsed must re-load instead of serving the dead one
      val held = cat.tableOps(Seq("db"), "ttl_t")
        .asInstanceOf[graft.core.meta.RestTableOps]
      assert(held.currentVersion() > 0) // loads + vends
      val c1 = held.storageCredentials.head.config("token")
      Thread.sleep(400) // past the 300ms credential TTL
      val c2 = held.storageCredentials.head.config("token")
      assert(c2 !== c1, "expired vended credential must force a reload")
      assert(held.storageCredentials.head.expiresAtMs
        .exists(_ > System.currentTimeMillis()))
    } finally srv.stop(0)
    // reactive path: a server restart voids every issued token WITHOUT
    // the client's expiry clock knowing — the next request 401s and must
    // re-exchange the credential once, not fail. A LONG TTL makes this
    // deterministic: the client's token is fresh by its own clock, so
    // the proactive refresh cannot mask the 401 path.
    val wh3 = Files.createTempDirectory("graft-rest-401-wh").toString
    val (srvA, uA) = RestCatalogServer.start(wh3,
      credential = Some(("svc", "pw")), tokenTtlSec = 3600)
    val portA = srvA.getAddress.getPort
    val cat2 = RestCatalog.connect(uA, Some("svc:pw"), accessDelegation = true)
    cat2.createTable(Seq("db"), "restart_t", schema)
    srvA.stop(0)
    val (srvB, uB) = RestCatalogServer.start(wh3, port = portA,
      credential = Some(("svc", "pw")), tokenTtlSec = 3600)
    try {
      assert(uB === uA)
      // srvB never issued cat2's token: the first request 401s and the
      // session must re-exchange once, transparently
      val t = cat2.loadTable(Seq("db"), "restart_t").get
      t.updateProperties(Map("after-restart" -> "ok"))
      assert(cat2.loadTable(Seq("db"), "restart_t").get
        .meta.properties.contains("after-restart"))
      // vended credentials flow again through the refreshed session
      val creds = cat2.storageCredentials(Seq("db"), "restart_t")
      assert(creds.nonEmpty && creds.head.config.contains("token"),
        "vended credentials must survive the 401 re-exchange")
    } finally srvB.stop(0)
  }

  test("multi-table transaction: both commit atomically, conflict rolls back") {
    val cat = RestCatalog.connect(uri)
    val schema = GSchema(GStruct(Seq(GField(1, "id", GLong))))
    cat.createTable(Seq("db"), "tx1", schema)
    cat.createTable(Seq("db"), "tx2", schema)

    // both tables' property updates land in ONE transaction commit
    cat.transact(Seq(Seq("db") -> "tx1", Seq("db") -> "tx2")) { tables =>
      tables(0).updateProperties(Map("k" -> "v1"))
      tables(1).updateProperties(Map("k" -> "v2"))
    }
    assert(cat.loadTable(Seq("db"), "tx1").get.meta.properties.get("k").contains("v1"))
    assert(cat.loadTable(Seq("db"), "tx2").get.meta.properties.get("k").contains("v2"))

    // stale base on ONE table fails the WHOLE transaction: neither moves
    val v1 = cat.tableOps(Seq("db"), "tx1").currentVersion()
    val v2 = cat.tableOps(Seq("db"), "tx2").currentVersion()
    val m1 = cat.tableOps(Seq("db"), "tx1").current().get
    val m2 = cat.tableOps(Seq("db"), "tx2").current().get
    intercept[graft.core.meta.CommitConflictException] {
      cat.commitTransaction(Seq(
        RestCatalog.TableCommit(Seq("db"), "tx1", v1,
          m1.copy(properties = m1.properties + ("x" -> "1"))),
        RestCatalog.TableCommit(Seq("db"), "tx2", v2 + 7, // stale
          m2.copy(properties = m2.properties + ("x" -> "2")))))
    }
    assert(cat.tableOps(Seq("db"), "tx1").currentVersion() === v1)
    assert(cat.tableOps(Seq("db"), "tx2").currentVersion() === v2)
    assert(!cat.loadTable(Seq("db"), "tx1").get.meta.properties.contains("x"))

    // transact retries past a concurrent interloper and still lands both
    val interloper = cat.loadTable(Seq("db"), "tx1").get
    var first = true
    cat.transact(Seq(Seq("db") -> "tx1", Seq("db") -> "tx2")) { tables =>
      if (first) { first = false; interloper.updateProperties(Map("i" -> "1")) }
      tables(0).updateProperties(Map("r" -> "a"))
      tables(1).updateProperties(Map("r" -> "b"))
    }
    val f1 = cat.loadTable(Seq("db"), "tx1").get.meta.properties
    assert(f1.get("i").contains("1") && f1.get("r").contains("a"))
    assert(cat.loadTable(Seq("db"), "tx2").get.meta.properties.get("r").contains("b"))

    // a transaction that CREATES a table rolls the creation back when any
    // member conflicts: all-or-nothing includes creations
    val vA = cat.tableOps(Seq("db"), "tx1").currentVersion()
    val mA = cat.tableOps(Seq("db"), "tx1").current().get
    intercept[graft.core.meta.CommitConflictException] {
      cat.commitTransaction(Seq(
        RestCatalog.TableCommit(Seq("db"), "txnew", 0,
          graft.core.meta.TableMetadata.newTable(
            cat.tableLocation(Seq("db"), "txnew"), schema,
            graft.core.expr.PartitionSpec.Unpartitioned, Map.empty)),
        RestCatalog.TableCommit(Seq("db"), "tx1", vA + 9, // stale
          mA.copy(properties = mA.properties + ("z" -> "1")))))
    }
    assert(!cat.tableExists(Seq("db"), "txnew"),
      "created table survived a rolled-back transaction")

    // mid-APPLY failure (verify passes, second CAS loses): the creation
    // already applied must be dropped by the rollback
    def newMeta = graft.core.meta.TableMetadata.newTable(
      cat.tableLocation(Seq("db"), "txnew2"), schema,
      graft.core.expr.PartitionSpec.Unpartitioned, Map.empty)
    intercept[graft.core.meta.CommitConflictException] {
      cat.commitTransaction(Seq(
        RestCatalog.TableCommit(Seq("db"), "txnew2", 0, newMeta),
        RestCatalog.TableCommit(Seq("db"), "txnew2", 0, newMeta)))
    }
    assert(!cat.tableExists(Seq("db"), "txnew2"),
      "mid-apply rollback left the created table behind")
  }

  // ---------------------------------------------------------------------
  // the SPEC's REST protocol (open-api createTable/updateTable,
  // CommitTableRequest requirements+updates): a genuine Iceberg REST
  // client never ships whole metadata documents — it posts typed
  // requirements and update actions. These tests drive graft's server
  // with raw spec-shaped HTTP, interleaved with Spark DML through
  // graft's own client.
  // ---------------------------------------------------------------------

  import graft.core.meta.{MetaJson, RestHttp}

  private def specPost(path: String, body: String): (Int, com.fasterxml.jackson.databind.JsonNode) = {
    val (code, resp) = RestHttp.post(s"$uri$path", body)
    (code, MetaJson.mapper.readTree(if (resp.nonEmpty) resp else "{}"))
  }
  private def loadMeta(t: String): com.fasterxml.jackson.databind.JsonNode =
    MetaJson.mapper.readTree(
      RestHttp.get(s"$uri/v1/namespaces/db/tables/$t")._2).get("metadata")

  test("spec protocol: createTable, requirements, update actions") {
    // CreateTableRequest with an Iceberg-typed schema and a partition spec
    val (cc, created) = specPost("/v1/namespaces/db/tables", """{
      "name": "spec_t",
      "schema": {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": true, "type": "long"},
        {"id": 2, "name": "v", "required": false, "type": "string"}]},
      "partition-spec": {"spec-id": 0, "fields": []},
      "properties": {"k0": "v0"}
    }""")
    assert(cc === 200, created.toString)
    assert(created.get("metadata-location").asText().endsWith(".metadata.json"))
    val uuid = created.get("metadata").get("table-uuid").asText()
    // spec-created tables default to fully spec-shaped documents
    assert(created.get("metadata").get("properties")
      .get("compatibility.format").asText() === "iceberg")

    // graft's own client + Spark see and write the table
    spark.sql("INSERT INTO rcat.db.spec_t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    assert(spark.sql("SELECT * FROM rcat.db.spec_t").count() === 3)

    // spec commit: assert-table-uuid + set-properties/remove-properties
    val (c1, _) = specPost("/v1/namespaces/db/tables/spec_t", s"""{
      "requirements": [{"type": "assert-table-uuid", "uuid": "$uuid"}],
      "updates": [
        {"action": "set-properties", "updates": {"a": "1", "k0": "v1"}},
        {"action": "remove-properties", "removals": ["missing"]}]
    }""")
    assert(c1 === 200)
    assert(loadMeta("spec_t").get("properties").get("a").asText() === "1")
    assert(loadMeta("spec_t").get("properties").get("k0").asText() === "v1")

    // violated requirement → 409, nothing applied
    val (c2, e2) = specPost("/v1/namespaces/db/tables/spec_t", """{
      "requirements": [{"type": "assert-table-uuid",
        "uuid": "00000000-0000-0000-0000-000000000000"}],
      "updates": [{"action": "set-properties", "updates": {"bad": "1"}}]
    }""")
    assert(c2 === 409 && e2.get("error").asText().contains("UUID"))
    assert(!loadMeta("spec_t").get("properties").has("bad"))

    // unknown action → 400
    val (c3, _) = specPost("/v1/namespaces/db/tables/spec_t",
      """{"updates": [{"action": "no-such-action"}]}""")
    assert(c3 === 400)

    // update of a missing table → 404; create-through-commit with
    // assert-create succeeds instead
    val (c4, _) = specPost("/v1/namespaces/db/tables/ghost_t",
      """{"updates": [{"action": "set-properties", "updates": {"x": "1"}}]}""")
    assert(c4 === 404)

    // schema evolution through the protocol: add-schema + the -1
    // "last added in this commit" sentinel
    val (c5, _) = specPost("/v1/namespaces/db/tables/spec_t", """{
      "updates": [
        {"action": "add-schema", "schema": {"type": "struct", "schema-id": 0,
          "fields": [
            {"id": 1, "name": "id", "required": true, "type": "long"},
            {"id": 2, "name": "v", "required": false, "type": "string"},
            {"id": 3, "name": "w", "required": false, "type": "double"}]},
          "last-column-id": 3},
        {"action": "set-current-schema", "schema-id": -1}]
    }""")
    assert(c5 === 200)
    val evolved = spark.sql("SELECT id, v, w FROM rcat.db.spec_t ORDER BY id").collect()
    assert(evolved.length === 3 && evolved.forall(_.isNullAt(2)),
      "new column from a spec add-schema commit must read as nulls")

    // tag the current snapshot via set-snapshot-ref, guarded by
    // assert-ref-snapshot-id with null (= ref must not exist yet)
    val snapId = loadMeta("spec_t").get("current-snapshot-id").asLong()
    val (c6, _) = specPost("/v1/namespaces/db/tables/spec_t", s"""{
      "requirements": [
        {"type": "assert-ref-snapshot-id", "ref": "audit", "snapshot-id": null}],
      "updates": [{"action": "set-snapshot-ref", "ref-name": "audit",
        "snapshot-id": $snapId, "type": "tag"}]
    }""")
    assert(c6 === 200)
    spark.sql("INSERT INTO rcat.db.spec_t VALUES (4, 'd', 4.5)")
    assert(spark.sql("SELECT * FROM rcat.db.spec_t").count() === 4)
    assert(spark.sql("SELECT * FROM rcat.db.spec_t VERSION AS OF 'audit'").count() === 3,
      "tag created through the spec protocol must time-travel")

    // stale ref assertion → 409
    val (c7, _) = specPost("/v1/namespaces/db/tables/spec_t", s"""{
      "requirements": [
        {"type": "assert-ref-snapshot-id", "ref": "audit", "snapshot-id": 123456}],
      "updates": [{"action": "remove-snapshot-ref", "ref-name": "audit"}]
    }""")
    assert(c7 === 409)

    // correct assertion removes the tag
    val (c8, _) = specPost("/v1/namespaces/db/tables/spec_t", s"""{
      "requirements": [
        {"type": "assert-ref-snapshot-id", "ref": "audit", "snapshot-id": $snapId}],
      "updates": [{"action": "remove-snapshot-ref", "ref-name": "audit"}]
    }""")
    assert(c8 === 200)
    intercept[Exception](
      spark.sql("SELECT * FROM rcat.db.spec_t VERSION AS OF 'audit'").collect())
  }

  test("spec namespace routes: list, create, metadata, properties, drop") {
    // create with properties (open-api createNamespace)
    val (c1, b1) = specPost("/v1/namespaces",
      """{"namespace": ["nsx"], "properties": {"owner": "etl"}}""")
    assert(c1 === 200 && b1.get("properties").get("owner").asText() === "etl")
    // duplicate create → 409
    assert(specPost("/v1/namespaces", """{"namespace": ["nsx"]}""")._1 === 409)
    // list contains it (ListNamespacesResponse shape: array of arrays)
    val (c2, b2) = (RestHttp.get(s"$uri/v1/namespaces")._1,
      MetaJson.mapper.readTree(RestHttp.get(s"$uri/v1/namespaces")._2))
    assert(c2 === 200)
    val listed = {
      val b = Seq.newBuilder[String]
      b2.get("namespaces").elements().forEachRemaining(e => b += e.get(0).asText())
      b.result()
    }
    assert(listed.contains("nsx") && listed.contains("db"))
    // loadNamespaceMetadata + HEAD probe
    val (c3, b3) = (RestHttp.get(s"$uri/v1/namespaces/nsx")._1,
      MetaJson.mapper.readTree(RestHttp.get(s"$uri/v1/namespaces/nsx")._2))
    assert(c3 === 200 && b3.get("properties").get("owner").asText() === "etl")
    assert(RestHttp.head(s"$uri/v1/namespaces/nsx")._1 === 204)
    assert(RestHttp.head(s"$uri/v1/namespaces/ghost")._1 === 404)
    // updateProperties (removals + updates, UpdateNamespacePropertiesResponse)
    val (c4, b4) = specPost("/v1/namespaces/nsx/properties",
      """{"removals": ["owner"], "updates": {"retention": "30d"}}""")
    assert(c4 === 200)
    assert(b4.get("removed").get(0).asText() === "owner")
    assert(b4.get("updated").get(0).asText() === "retention")
    // Spark sees the same properties through DESCRIBE NAMESPACE
    val desc = spark.sql("DESCRIBE NAMESPACE EXTENDED rcat.nsx").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.get("Properties").exists(_.contains("retention")),
      s"DESCRIBE NAMESPACE must surface REST-set properties: $desc")
    // drop: non-empty → 409, empty → 204
    spark.sql("CREATE TABLE rcat.nsx.tmp_t (id BIGINT)")
    assert(RestHttp.delete(s"$uri/v1/namespaces/nsx")._1 === 409)
    spark.sql("DROP TABLE rcat.nsx.tmp_t")
    assert(RestHttp.delete(s"$uri/v1/namespaces/nsx")._1 === 204)
    assert(RestHttp.head(s"$uri/v1/namespaces/nsx")._1 === 404)
  }

  test("spec commit protocol end-to-end: Spark DML as requirements+updates") {
    // the rcats catalog's every commit is a derived CommitTableRequest:
    // create, append, row-level delete, schema evolution, branch DDL and
    // time travel all flow through the spec protocol
    spark.sql("""CREATE TABLE rcats.db.sp_dml (id BIGINT, v STRING, ts TIMESTAMP)
      PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO rcats.db.sp_dml VALUES
      (1, 'a', TIMESTAMP '2024-01-01 10:00:00'),
      (2, 'b', TIMESTAMP '2024-01-02 10:00:00'),
      (3, 'c', TIMESTAMP '2024-01-02 11:00:00')""")
    assert(spark.sql("SELECT * FROM rcats.db.sp_dml").count() === 3)
    spark.sql("DELETE FROM rcats.db.sp_dml WHERE id = 2")
    assert(spark.sql("SELECT id FROM rcats.db.sp_dml ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // schema evolution crosses as add-schema/set-current-schema
    spark.sql("ALTER TABLE rcats.db.sp_dml ADD COLUMN w DOUBLE")
    spark.sql("INSERT INTO rcats.db.sp_dml VALUES " +
      "(4, 'd', TIMESTAMP '2024-01-03 10:00:00', 4.5)")
    assert(spark.sql("SELECT w FROM rcats.db.sp_dml WHERE id = 4")
      .collect()(0).getDouble(0) === 4.5)
    // time travel over spec-committed snapshots
    val snaps = spark.sql(
      "SELECT snapshot_id FROM rcats.db.sp_dml.snapshots ORDER BY committed_at")
      .collect().map(_.getLong(0))
    assert(snaps.length === 3)
    assert(spark.sql(s"SELECT * FROM rcats.db.sp_dml VERSION AS OF ${snaps.head}")
      .count() === 3)
    // branch DDL crosses as set-snapshot-ref / remove-snapshot-ref
    spark.sql("ALTER TABLE rcats.db.sp_dml CREATE BRANCH dev")
    spark.sql("INSERT INTO rcats.db.sp_dml.branch_dev VALUES " +
      "(9, 'z', TIMESTAMP '2024-01-09 10:00:00', 9.9)")
    assert(spark.sql("SELECT * FROM rcats.db.sp_dml VERSION AS OF 'dev'").count() === 4)
    assert(spark.sql("SELECT * FROM rcats.db.sp_dml").count() === 3,
      "main must not see the dev branch write")
    spark.sql("ALTER TABLE rcats.db.sp_dml DROP BRANCH dev")
    // properties cross as set-properties / remove-properties
    spark.sql("ALTER TABLE rcats.db.sp_dml SET TBLPROPERTIES ('pk'='pv')")
    spark.sql("ALTER TABLE rcats.db.sp_dml UNSET TBLPROPERTIES ('pk')")
    // the graft-protocol catalog reads the same table identically
    assert(spark.sql("SELECT id FROM rcat.db.sp_dml ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L))
  }

  test("spec protocol: add-snapshot + set-snapshot-ref publishes a commit") {
    // an engine-style commit: the client adds a SNAPSHOT it planned and
    // moves main in the same request (reference REST commits pair these)
    val m = loadMeta("spec_t")
    val cur = m.get("current-snapshot-id").asLong()
    // reuse the FIRST snapshot's manifest list as the new snapshot's
    // content: a protocol-level rollback
    val snaps = m.get("snapshots")
    val first = snaps.get(0)
    val lastSeq = m.get("last-sequence-number").asLong()
    val newId = 990011L
    val (c1, _) = specPost("/v1/namespaces/db/tables/spec_t", s"""{
      "requirements": [
        {"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": $cur}],
      "updates": [
        {"action": "add-snapshot", "snapshot": {
          "snapshot-id": $newId, "parent-snapshot-id": $cur,
          "sequence-number": ${lastSeq + 1},
          "timestamp-ms": ${System.currentTimeMillis()},
          "summary": {"operation": "overwrite"},
          "manifest-list": ${MetaJson.mapper.writeValueAsString(
            first.get("manifest-list").asText())},
          "schema-id": ${m.get("current-schema-id").asInt()}}},
        {"action": "set-snapshot-ref", "ref-name": "main",
          "snapshot-id": $newId, "type": "branch"}]
    }""")
    assert(c1 === 200)
    // main now reads the first snapshot's content (3 rows, pre-(4,'d'))
    assert(spark.sql("SELECT * FROM rcat.db.spec_t").count() === 3,
      "add-snapshot + set-snapshot-ref main must publish the new snapshot")
    assert(loadMeta("spec_t").get("current-snapshot-id").asLong() === newId)

    // duplicate snapshot id is rejected with 400
    val (c2, _) = specPost("/v1/namespaces/db/tables/spec_t", s"""{
      "updates": [{"action": "add-snapshot", "snapshot": {
        "snapshot-id": $newId, "sequence-number": ${lastSeq + 2},
        "timestamp-ms": 1, "summary": {"operation": "append"},
        "manifest-list": "x"}}]
    }""")
    assert(c2 === 400)
  }

  test("nested namespaces: %1F separator, parent listing, non-empty drop") {
    assert(specPost("/v1/namespaces", """{"namespace": ["na"]}""")._1 === 200)
    assert(specPost("/v1/namespaces", """{"namespace": ["na", "nb"]}""")._1 === 200)
    // the spec joins namespace levels with the 0x1F unit separator in
    // URL paths — a genuine client's create→load round trip must work
    val (cl, blRaw) = RestHttp.get(s"$uri/v1/namespaces/na%1Fnb")
    val bl = MetaJson.mapper.readTree(blRaw)
    assert(cl === 200, s"load of nested namespace via %%1F failed: $blRaw")
    assert(bl.get("namespace").get(0).asText() === "na" &&
      bl.get("namespace").get(1).asText() === "nb")
    assert(RestHttp.head(s"$uri/v1/namespaces/na%1Fnb")._1 === 204)
    // ?parent= listing returns children as full-path arrays
    val kids = MetaJson.mapper.readTree(
      RestHttp.get(s"$uri/v1/namespaces?parent=na")._2).get("namespaces")
    assert(kids.size() === 1 && kids.get(0).get(0).asText() === "na" &&
      kids.get(0).get(1).asText() === "nb")
    // a table under the nested namespace (created via the spec route,
    // addressed by %1F) is NOT listed as a namespace...
    val (ct, _) = specPost("/v1/namespaces/na%1Fnb/tables",
      """{"name": "deep_t", "schema": {"type": "struct", "schema-id": 0,
          "fields": [{"id": 1, "name": "id", "required": false,
                      "type": "long"}]}}""")
    assert(ct === 200)
    assert(MetaJson.mapper.readTree(
      RestHttp.get(s"$uri/v1/namespaces?parent=na%1Fnb")._2)
      .get("namespaces").size() === 0)
    // ...and dropping a namespace with a CHILD NAMESPACE is a 409, not a
    // recursive delete of the child's tables
    assert(RestHttp.delete(s"$uri/v1/namespaces/na")._1 === 409)
    assert(RestHttp.delete(s"$uri/v1/namespaces/na%1Fnb")._1 === 409)
    assert(RestHttp.get(s"$uri/v1/namespaces/na%1Fnb/tables/deep_t")._1 === 200,
      "deep_t must survive the rejected drops")
    assert(RestHttp.delete(s"$uri/v1/namespaces/na%1Fnb/tables/deep_t")._1 === 200)
    assert(RestHttp.delete(s"$uri/v1/namespaces/na%1Fnb")._1 === 204)
    assert(RestHttp.delete(s"$uri/v1/namespaces/na")._1 === 204)

    // a Spark-created PROPERTY-LESS namespace still blocks its parent's
    // drop (creates mark every level, even without properties)
    spark.sql("CREATE NAMESPACE rcat.np")
    spark.sql("CREATE NAMESPACE rcat.np.deep")
    assert(RestHttp.delete(s"$uri/v1/namespaces/np")._1 === 409,
      "empty child namespace without properties must still protect the parent")
    assert(RestHttp.delete(s"$uri/v1/namespaces/np%1Fdeep")._1 === 204)
    assert(RestHttp.delete(s"$uri/v1/namespaces/np")._1 === 204)

    // a key in both removals and updates fails with 422, applying nothing
    assert(specPost("/v1/namespaces", """{"namespace": ["nq"],
      "properties": {"k": "v1"}}""")._1 === 200)
    assert(specPost("/v1/namespaces/nq/properties",
      """{"removals": ["k"], "updates": {"k": "v2"}}""")._1 === 422)
    assert(MetaJson.mapper.readTree(RestHttp.get(s"$uri/v1/namespaces/nq")._2)
      .get("properties").get("k").asText() === "v1")
    assert(RestHttp.delete(s"$uri/v1/namespaces/nq")._1 === 204)

    // removals not present are reported in `missing`, not dropped from
    // all three response lists
    assert(specPost("/v1/namespaces", """{"namespace": ["nmiss"]}""")._1 === 200)
    val (cm, bm) = specPost("/v1/namespaces/nmiss/properties",
      """{"removals": ["ghost"], "updates": {"k": "v"}}""")
    assert(cm === 200 && bm.get("missing").get(0).asText() === "ghost" &&
      bm.get("removed").size() === 0)
    assert(RestHttp.delete(s"$uri/v1/namespaces/nmiss")._1 === 204)

    // a namespace LEVEL containing '.' would be creatable but never
    // addressable (path parsing re-splits it) — rejected up front, as
    // are '/' (directory identity), '_' (internal-dir collision), empty
    // levels, and an empty level LIST (the warehouse root)
    assert(specPost("/v1/namespaces",
      """{"namespace": ["prod.analytics"]}""")._1 === 400)
    assert(specPost("/v1/namespaces", """{"namespace": ["a/b"]}""")._1 === 400)
    assert(specPost("/v1/namespaces", """{"namespace": ["_views"]}""")._1 === 400)
    assert(specPost("/v1/namespaces", """{"namespace": []}""")._1 === 400)

    // a namespace path parsing to ZERO levels must never resolve to the
    // warehouse root — DELETE there would remove the warehouse itself —
    // and '..' levels must never traverse outside it
    assert(RestHttp.head(s"$uri/v1/namespaces/.")._1 === 404)
    assert(RestHttp.delete(s"$uri/v1/namespaces/.")._1 !== 204)
    assert(RestHttp.head(s"$uri/v1/namespaces/..%1Fdb")._1 !== 204)
    assert(RestHttp.head(s"$uri/v1/namespaces/db")._1 === 204,
      "warehouse content must survive the root-delete probe")

    // a child NAMESPACE addressed as a table must not be purge-deletable
    assert(specPost("/v1/namespaces", """{"namespace": ["pp", "sub"]}""")._1 === 200)
    assert(RestHttp.delete(
      s"$uri/v1/namespaces/pp/tables/sub?purgeRequested=true")._1 === 404)
    assert(RestHttp.head(s"$uri/v1/namespaces/pp%1Fsub")._1 === 204,
      "child namespace must survive the table-purge probe")
    assert(RestHttp.delete(s"$uri/v1/namespaces/pp%1Fsub")._1 === 204)
    assert(RestHttp.delete(s"$uri/v1/namespaces/pp")._1 === 204)

    // creating a namespace over an existing LIVE TABLE path must refuse
    // (the marker would make the table read as an empty, droppable
    // namespace)
    spark.sql("CREATE TABLE rcat.db.collide_t (id BIGINT)")
    spark.sql("INSERT INTO rcat.db.collide_t VALUES (5)")
    assert(specPost("/v1/namespaces",
      """{"namespace": ["db", "collide_t"]}""")._1 === 400)
    assert(spark.sql("SELECT * FROM rcat.db.collide_t").count() === 1,
      "table must be untouched by the refused namespace create")
    spark.sql("DROP TABLE rcat.db.collide_t")

    // Spark and REST agree on existence: a namespace created through
    // Spark without properties exists over REST too
    spark.sql("CREATE NAMESPACE rcat.nagree")
    assert(RestHttp.head(s"$uri/v1/namespaces/nagree")._1 === 204)
    assert(RestHttp.delete(s"$uri/v1/namespaces/nagree")._1 === 204)
    assert(!spark.catalog.databaseExists("rcat.nagree"),
      "REST-dropped namespace must be gone for Spark as well")

    // out-of-range format-version on the spec create route is a 400, not
    // a committed-but-unloadable table
    assert(specPost("/v1/namespaces/db/tables",
      """{"name": "fv9_t", "properties": {"format-version": "9"},
          "schema": {"type": "struct", "schema-id": 0,
          "fields": [{"id": 1, "name": "id", "required": false,
                      "type": "long"}]}}""")._1 === 400)
    assert(RestHttp.get(s"$uri/v1/namespaces/db/tables/fv9_t")._1 !== 200)
    // ...and a non-numeric version is a 400, not a silent v2 guess
    assert(specPost("/v1/namespaces/db/tables",
      """{"name": "fvx_t", "properties": {"format-version": "two"},
          "schema": {"type": "struct", "schema-id": 0,
          "fields": [{"id": 1, "name": "id", "required": false,
                      "type": "long"}]}}""")._1 === 400)
  }

  test("rename accepts the spec RenameTableRequest shape") {
    spark.sql("CREATE TABLE rcat.db.rn_src (id BIGINT)")
    spark.sql("INSERT INTO rcat.db.rn_src VALUES (7)")
    val (c, _) = specPost("/v1/tables/rename",
      """{"source": {"namespace": ["db"], "name": "rn_src"},
          "destination": {"namespace": ["db"], "name": "rn_dst"}}""")
    assert(c === 200)
    assert(spark.sql("SELECT * FROM rcat.db.rn_dst").count() === 1)
    assert(RestHttp.get(s"$uri/v1/namespaces/db/tables/rn_src")._1 === 404)
  }

  test("spec register route adopts the tree at its new location") {
    spark.sql("CREATE TABLE rcat.db.reg_src (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rcat.db.reg_src VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val mloc = MetaJson.mapper.readTree(
      RestHttp.get(s"$uri/v1/namespaces/db/tables/reg_src")._2)
      .get("metadata-location").asText()
    val (cr, _) = specPost("/v1/namespaces/db/register",
      s"""{"name": "reg_dst", "metadata-location": ${
        MetaJson.mapper.writeValueAsString(mloc)}}""")
    assert(cr === 200)
    // the adopted table must READ: registration rewrites the metadata
    // location to the new table dir so tracked paths stay pointed at the
    // source tree instead of being re-rooted under the empty new dir
    assert(spark.sql("SELECT * FROM rcat.db.reg_dst").count() === 3)
    assert(spark.sql("SELECT v FROM rcat.db.reg_dst WHERE id = 2")
      .head().getString(0) === "b")
  }

  test("spec commit protocol creates format-version 1 tables") {
    spark.sql("""CREATE TABLE rcats.db.v1_spec_t (id BIGINT)
      TBLPROPERTIES ('format-version'='1')""")
    spark.sql("INSERT INTO rcats.db.v1_spec_t VALUES (1), (2)")
    assert(spark.sql("SELECT * FROM rcats.db.v1_spec_t").count() === 2)
    assert(loadMeta("v1_spec_t").get("format-version").asInt() === 1,
      "create-through-spec-commit must not force format-version 2")
  }

  test("spec rollback keeps the snapshot log monotonic") {
    spark.sql("CREATE TABLE rcats.db.rb_t (id BIGINT)")
    spark.sql("INSERT INTO rcats.db.rb_t VALUES (1)")
    spark.sql("INSERT INTO rcats.db.rb_t VALUES (2)")
    val snaps = spark.sql(
      "SELECT snapshot_id FROM rcats.db.rb_t.snapshots ORDER BY committed_at")
      .collect().map(_.getLong(0))
    spark.sql(s"CALL rcats.system.rollback_to_snapshot('db.rb_t', ${snaps.head})")
    assert(spark.sql("SELECT * FROM rcats.db.rb_t").count() === 1)
    val log = loadMeta("rb_t").get("snapshot-log")
    val ts = (0 until log.size()).map(i => log.get(i).get("timestamp-ms").asLong())
    assert(ts === ts.sorted,
      s"server-side set-snapshot-ref replay must log the CHANGE time for a " +
        s"rollback to a pre-existing snapshot, keeping the log monotonic: $ts")
    assert(log.get(log.size() - 1).get("snapshot-id").asLong() === snaps.head)
  }

  // ------------------------------------------- server-side scan planning

  test("planTableScan: sync plan with filter prunes and returns spec tasks") {
    spark.sql("""CREATE TABLE rcat.db.plan_t (id BIGINT, grp BIGINT, v STRING)
      PARTITIONED BY (grp)""")
    spark.sql(
      "INSERT INTO rcat.db.plan_t SELECT id, id % 4, concat('v', id) FROM range(0, 40)")
    val (c0, full) = specPost("/v1/namespaces/db/tables/plan_t/plan", "{}")
    assert(c0 === 200, full.toString)
    assert(full.get("status").asText() === "completed")
    val planId = full.get("plan-id").asText()
    val allTasks = full.get("file-scan-tasks")
    assert(allTasks.size() === 4, s"expected 4 partitions planned: $full")
    // spec ContentFile shape
    val df0 = allTasks.get(0).get("data-file")
    assert(df0.get("content").asText() === "data")
    assert(df0.get("file-format").asText() === "parquet")
    assert(df0.get("partition").isArray && df0.get("partition").size() === 1)
    assert(df0.has("record-count") && df0.has("file-size-in-bytes"))

    // partition-pruned plan: grp = 2 keeps one task, residual collapses
    val (c1, pruned) = specPost("/v1/namespaces/db/tables/plan_t/plan",
      """{"filter": {"type": "eq", "term": "grp", "value": 2}}""")
    assert(c1 === 200, pruned.toString)
    assert(pruned.get("file-scan-tasks").size() === 1,
      s"partition pruning must run server-side: $pruned")
    assert(pruned.get("file-scan-tasks").get(0).get("residual-filter")
      .asBoolean(), "identity-partition residual must collapse to true")

    // fetchPlanningResult replays the stored result; cancel drops it
    val (c2, fetched) = (RestHttp.get(
      s"$uri/v1/namespaces/db/tables/plan_t/plan/$planId"))
    assert(c2 === 200)
    assert(MetaJson.mapper.readTree(fetched).get("status").asText() === "completed")
    assert(RestHttp.delete(
      s"$uri/v1/namespaces/db/tables/plan_t/plan/$planId")._1 === 204)
    assert(RestHttp.get(
      s"$uri/v1/namespaces/db/tables/plan_t/plan/$planId")._1 === 404)
    // unknown table and traversal names are rejected
    assert(specPost("/v1/namespaces/db/tables/nope_t/plan", "{}")._1 === 404)
    assert(specPost("/v1/namespaces/db/tables/../plan", "{}")._1 === 400)

    // plan-ids are scoped to the table that created them: reading,
    // chunk-fetching or cancelling through ANOTHER table's path is 404 —
    // a leaked plan-id must not bypass per-table addressing
    spark.sql("CREATE TABLE rcat.db.plan_other (id BIGINT)")
    val (c3, fresh) = specPost("/v1/namespaces/db/tables/plan_t/plan", "{}")
    assert(c3 === 200)
    val pid2 = fresh.get("plan-id").asText()
    assert(RestHttp.get(
      s"$uri/v1/namespaces/db/tables/plan_other/plan/$pid2")._1 === 404)
    assert(specPost("/v1/namespaces/db/tables/plan_other/tasks",
      s"""{"plan-task": "$pid2#0"}""")._1 === 404)
    assert(RestHttp.delete(
      s"$uri/v1/namespaces/db/tables/plan_other/plan/$pid2")._1 === 404)
    // ...while the owning table still reads and cancels it fine
    assert(RestHttp.get(
      s"$uri/v1/namespaces/db/tables/plan_t/plan/$pid2")._1 === 200)
    assert(RestHttp.delete(
      s"$uri/v1/namespaces/db/tables/plan_t/plan/$pid2")._1 === 204)
    spark.sql("DROP TABLE rcat.db.plan_other")
  }

  test("planTableScan: async submit + poll, chunked plan-tasks fetch") {
    // a second server over the SAME warehouse with 1-task chunks
    // exercises the plan-tasks path the spec designed for huge scans
    val (srv2, uri2) = RestCatalogServer.start(warehouse, planPageSize = 1)
    try {
      // async: submitted + plan-id, then the poll route serves the result
      val (ca, sub) = {
        val (code, resp) = RestHttp.post(
          s"$uri2/v1/namespaces/db/tables/plan_t/plan", "{}",
          Map("X-Graft-Plan-Async" -> "true"))
        (code, MetaJson.mapper.readTree(resp))
      }
      assert(ca === 200 && sub.get("status").asText() === "submitted", sub.toString)
      val pid = sub.get("plan-id").asText()
      // REAL async: the server responds before planning finishes — poll
      // until the status turns terminal, as a genuine client would
      var pn = MetaJson.mapper.createObjectNode()
        .put("status", "submitted"): com.fasterxml.jackson.databind.JsonNode
      var waited = 0
      while (pn.get("status").asText() == "submitted" && waited < 200) {
        Thread.sleep(50); waited += 1
        val (cp, polled) = RestHttp.get(
          s"$uri2/v1/namespaces/db/tables/plan_t/plan/$pid")
        assert(cp === 200)
        pn = MetaJson.mapper.readTree(polled)
      }
      assert(pn.get("status").asText() === "completed", pn.toString)
      // 4 one-task chunks → plan-tasks, no inline tasks
      val pts = pn.get("plan-tasks")
      assert(pts != null && pts.size() === 4, s"expected 4 plan-tasks: $pn")
      val fetched = (0 until pts.size()).flatMap { i =>
        val (cf, body) = RestHttp.post(
          s"$uri2/v1/namespaces/db/tables/plan_t/tasks",
          s"""{"plan-task": ${MetaJson.mapper.writeValueAsString(
            pts.get(i).asText())}}""")
        assert(cf === 200)
        val tasks = MetaJson.mapper.readTree(body).get("file-scan-tasks")
        (0 until tasks.size()).map(j =>
          tasks.get(j).get("data-file").get("file-path").asText())
      }
      assert(fetched.size === 4 && fetched.distinct.size === 4)
      assert(RestHttp.post(s"$uri2/v1/namespaces/db/tables/plan_t/tasks",
        s"""{"plan-task": "$pid#99"}""")._1 === 404)
    } finally srv2.stop(0)
  }

  test("server planning round-trips MoR deletes and matches local planning") {
    spark.sql("""CREATE TABLE rcat.db.plan_mor (id BIGINT, grp BIGINT, v STRING)
      PARTITIONED BY (grp)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    spark.sql(
      "INSERT INTO rcat.db.plan_mor SELECT id, id % 2, concat('v', id) FROM range(0, 20)")
    spark.sql("DELETE FROM rcat.db.plan_mor WHERE id % 5 = 1")
    val cat = RestCatalog.connect(uri)
    val table = cat.loadTable(Seq("db"), "plan_mor").get
    val local = table.newScan().planFiles()
    val remote = cat.tableOps(Seq("db"), "plan_mor")
      .asInstanceOf[graft.core.meta.RestTableOps]
      .planScan(table.meta.currentSnapshot.map(_.snapshotId),
        graft.core.expr.TrueE, table.meta)
    def key(ts: Seq[graft.core.meta.FileScanTask]) =
      ts.map(t => (t.file.path, t.file.partition, t.file.recordCount,
        t.deletes.map(_.path).sorted, t.dataSequenceNumber)).sortBy(_._1)
    assert(key(remote) === key(local),
      "server-planned tasks must equal local planning (files, partitions, deletes)")
    assert(remote.exists(_.deletes.nonEmpty), "MoR deletes must cross the wire")
    // stats round-trip: bounds survive typed (metadata agg pushdown needs them)
    val lb = remote.flatMap(_.file.columnStats.get(1)).flatMap(_.lower)
    val lbLocal = local.flatMap(_.file.columnStats.get(1)).flatMap(_.lower)
    assert(lb.toSet === lbLocal.toSet, s"id lower bounds diverged: $lb vs $lbLocal")
  }

  test("rest-scan-planning=server: Spark scans plan through the server") {
    spark.conf.set("spark.sql.catalog.rcatp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rcatp.catalog-impl", "rest")
    spark.conf.set("spark.sql.catalog.rcatp.uri", uri)
    spark.conf.set("spark.sql.catalog.rcatp.rest-scan-planning", "server")
    val got = spark.sql(
      "SELECT id FROM rcatp.db.plan_mor WHERE grp = 1 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(got === (0L until 20L).filter(i => i % 2 == 1 && i % 5 != 1),
      s"server-planned Spark scan returned wrong rows: $got")
    // time travel still resolves the snapshot CLIENT-side
    val firstSnap = spark.sql(
      "SELECT snapshot_id FROM rcatp.db.plan_mor.snapshots ORDER BY committed_at")
      .collect().map(_.getLong(0)).head
    assert(spark.sql(
      s"SELECT count(*) FROM rcatp.db.plan_mor VERSION AS OF $firstSnap")
      .collect().head.getLong(0) === 20L)
  }

  test("spec view protocol: createView, commit with requirements, loadView") {
    spark.sql("CREATE TABLE rcat.db.vbase (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rcat.db.vbase VALUES (1,'a'),(2,'b'),(3,'c')")
    // spec CreateViewRequest: schema + view-version with a sql
    // representation (open-api createView)
    val (cc, created) = specPost("/v1/namespaces/db/views", """{
      "name": "specv",
      "schema": {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": true, "type": "long"}]},
      "view-version": {
        "version-id": 1, "schema-id": 0,
        "summary": {"engine-name": "external"},
        "default-catalog": "rcat", "default-namespace": ["db"],
        "representations": [
          {"type": "sql", "dialect": "spark-sql",
           "sql": "SELECT id FROM rcat.db.vbase WHERE id > 1"}]},
      "properties": {"owner": "ext"}
    }""")
    assert(cc === 200, created.toString)
    val uuid = created.get("metadata").get("view-uuid").asText()
    assert(created.get("metadata-location").asText().endsWith("specv.json"))
    // HEAD existence probe
    assert(RestHttp.head(s"$uri/v1/namespaces/db/views/specv")._1 === 204)
    // graft's Spark layer reads the spec-created view end-to-end
    val got = spark.sql("SELECT * FROM rcat.db.specv ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L, 3L), s"spec-created view must be queryable: $got")

    // spec CommitViewRequest: new version + set-current -1, guarded by
    // assert-view-uuid
    val (c1, committed) = specPost("/v1/namespaces/db/views/specv", s"""{
      "requirements": [{"type": "assert-view-uuid", "uuid": "$uuid"}],
      "updates": [
        {"action": "set-properties", "updates": {"rev": "2"}},
        {"action": "add-view-version", "view-version": {
          "version-id": 0, "schema-id": 0,
          "summary": {"engine-name": "external"},
          "default-catalog": "rcat", "default-namespace": ["db"],
          "representations": [
            {"type": "sql", "dialect": "spark-sql",
             "sql": "SELECT id FROM rcat.db.vbase WHERE id > 2"}]}},
        {"action": "set-current-view-version", "view-version-id": -1}]
    }""")
    assert(c1 === 200, committed.toString)
    val meta2 = committed.get("metadata")
    assert(meta2.get("current-version-id").asInt() === 2,
      "colliding version-id must reassign to max+1")
    assert(meta2.get("properties").get("rev").asText() === "2")
    assert(meta2.get("version-log").size() === 2, "commit must append the log")
    val got2 = spark.sql("SELECT * FROM rcat.db.specv").collect().map(_.getLong(0))
    assert(got2.toSeq === Seq(3L), s"view must serve the NEW version: ${got2.toSeq}")

    // wrong uuid → 409, nothing applied
    val (c2, _) = specPost("/v1/namespaces/db/views/specv", """{
      "requirements": [{"type": "assert-view-uuid",
        "uuid": "00000000-0000-0000-0000-000000000000"}],
      "updates": [{"action": "set-properties", "updates": {"rev": "3"}}]
    }""")
    assert(c2 === 409)
    assert(spark.sql("SELECT * FROM rcat.db.specv").count() === 1)
    // unknown target version → 409
    assert(specPost("/v1/namespaces/db/views/specv", """{
      "updates": [{"action": "set-current-view-version", "view-version-id": 99}]
    }""")._1 === 409)
    // commit against a missing view → 404
    assert(specPost("/v1/namespaces/db/views/ghost", """{
      "updates": [{"action": "set-properties", "updates": {"a": "1"}}]
    }""")._1 === 404)
  }

  test("planTableScan: spec string literals (timestamps) filter and prune") {
    spark.sql("""CREATE TABLE rcat.db.plan_ts (id BIGINT, ts TIMESTAMP)
      PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO rcat.db.plan_ts VALUES
      (1, TIMESTAMP '2024-01-01 10:00:00'), (2, TIMESTAMP '2024-01-01 11:00:00'),
      (3, TIMESTAMP '2024-03-05 10:00:00'), (4, TIMESTAMP '2024-03-05 11:00:00')""")
    // the exact wire shape a genuine client sends: ISO-8601 string value
    val (c, n) = specPost("/v1/namespaces/db/tables/plan_ts/plan",
      """{"filter": {"type": "gt", "term": "ts",
          "value": "2024-02-01T00:00:00+00:00"}}""")
    assert(c === 200, s"timestamp literals must bind server-side: $n")
    assert(n.get("file-scan-tasks").size() === 1,
      s"day-partition pruning must run on the ISO literal: $n")
    // a NON-UTC offset shifts the instant instead of being read as UTC:
    // 2024-03-05T05:30:00-05:00 == 10:30Z — between the March file's
    // 10:00/11:00 bounds, so the file survives stat pruning and the
    // residual must carry the SHIFTED bound, not the local time read as
    // UTC. (A 12:00Z bound now correctly prunes the file outright: since
    // the writer emits INT64-micros timestamps, files carry exact ts
    // min/max and pruning is tighter than day-granularity alone.)
    val (c2, n2) = specPost("/v1/namespaces/db/tables/plan_ts/plan",
      """{"filter": {"type": "gt", "term": "ts",
          "value": "2024-03-05T05:30:00-05:00"}}""")
    assert(c2 === 200 && n2.get("file-scan-tasks").size() === 1, n2.toString)
    val residual = n2.get("file-scan-tasks").get(0).get("residual-filter")
    assert(residual.get("value").asLong() ===
      java.time.Instant.parse("2024-03-05T10:30:00Z").toEpochMilli * 1000L,
      s"the -05:00 offset must shift the residual bound to 10:30Z: $residual")
    // exact ts stats: a bound past the file's max prunes it outright
    assert(specPost("/v1/namespaces/db/tables/plan_ts/plan",
      """{"filter": {"type": "gt", "term": "ts",
          "value": "2024-03-05T07:00:00-05:00"}}""")
      ._2.get("file-scan-tasks").size() === 0,
      "a 12:00Z bound must prune the 10:00-11:00Z file via column stats")
  }

  test("planTableScan honors use-snapshot-schema and case-sensitive") {
    spark.sql("CREATE TABLE rcat.db.plan_ren (id BIGINT, oldname STRING)")
    spark.sql("INSERT INTO rcat.db.plan_ren VALUES (1, 'a'), (2, 'b')")
    val snap1 = spark.sql(
      "SELECT snapshot_id FROM rcat.db.plan_ren.snapshots ORDER BY committed_at")
      .collect().map(_.getLong(0)).head
    spark.sql("ALTER TABLE rcat.db.plan_ren RENAME COLUMN oldname TO newname")
    // time travel + snapshot schema: the OLD column name binds
    val (c1, n1) = specPost("/v1/namespaces/db/tables/plan_ren/plan", s"""{
      "snapshot-id": $snap1, "use-snapshot-schema": true,
      "filter": {"type": "not-null", "term": "oldname"}}""")
    assert(c1 === 200 && n1.get("file-scan-tasks").size() > 0, n1.toString)
    // without the flag the CURRENT schema governs and oldname is gone
    assert(specPost("/v1/namespaces/db/tables/plan_ren/plan", s"""{
      "snapshot-id": $snap1,
      "filter": {"type": "not-null", "term": "oldname"}}""")._1 === 400)
    // case-sensitive (the spec default): wrong-case refs refuse...
    assert(specPost("/v1/namespaces/db/tables/plan_ren/plan",
      """{"filter": {"type": "not-null", "term": "NEWNAME"}}""")._1 === 400)
    // ...and case-sensitive=false matches them (graft/Spark semantics)
    assert(specPost("/v1/namespaces/db/tables/plan_ren/plan",
      """{"case-sensitive": false,
          "filter": {"type": "not-null", "term": "NEWNAME"}}""")._1 === 200)
  }

  test("planTableScan: stats-fields trims per-file column stats") {
    val (c, n) = specPost("/v1/namespaces/db/tables/plan_t/plan",
      """{"stats-fields": ["id"]}""")
    assert(c === 200)
    val tasks = n.get("file-scan-tasks")
    (0 until tasks.size()).foreach { i =>
      val df = tasks.get(i).get("data-file")
      val lb = df.get("lower-bounds")
      assert(lb != null && lb.get("keys").size() === 1 &&
        lb.get("keys").get(0).asInt() === 1,
        s"stats must trim to the requested field: $df")
    }
  }
  test("endpoint negotiation: unadvertised families degrade without round-trips") {
    // a server advertising ONLY the core table routes: the optional
    // families (plan/views/metrics) 404 if ever called, so a clean run
    // proves the client gated them on the ConfigResponse endpoints list
    val wh2 = Files.createTempDirectory("graft-rest-neg").toString
    val core = Seq(
      "GET /v1/config",
      "GET /v1/namespaces",
      "POST /v1/namespaces",
      "GET /v1/namespaces/{namespace}/tables",
      "POST /v1/namespaces/{namespace}/tables",
      "GET /v1/namespaces/{namespace}/tables/{table}",
      "POST /v1/namespaces/{namespace}/tables/{table}/commit",
      "DELETE /v1/namespaces/{namespace}/tables/{table}",
      "POST /v1/tables/rename")
    val (srv, negUri) = RestCatalogServer.start(wh2,
      credential = Some(("svc", "hunter2")),
      advertiseEndpoints = Some(core))
    try {
      RestCatalogServer.lastTokenScope.set("")
      // the catalog ASKS for server planning — negotiation must turn it
      // off silently because the plan routes are not advertised
      val cat = graft.core.meta.RestCatalog.connect(negUri,
        credential = Some("svc:hunter2"), serverPlanning = true)
      // OAuth scope rode the exchange (reference default "catalog")
      assert(RestCatalogServer.lastTokenScope.get() === "catalog")
      import graft.core.types.{GField, GLong, GSchema, GStruct}
      val schema = GSchema(GStruct(Seq(GField(1, "id", GLong, required = true))))
      val t = cat.createTable(Seq("negdb"), "neg_t", schema)
      t.updateProperties(Map("k" -> "v"))
      // scans PLAN LOCALLY (no /plan round-trip, which would 404)
      assert(cat.loadTable(Seq("negdb"), "neg_t").get.newScan().planFiles().isEmpty)
      val ops = cat.tableOps(Seq("negdb"), "neg_t")
        .asInstanceOf[graft.core.meta.RestTableOps]
      assert(!ops.serverPlanningOn,
        "plan routes not advertised -> server planning must negotiate off")
      // view surface degrades: empty/None/unsupported, no 404 churn
      assert(cat.listViewNames(Seq("negdb")) === Nil)
      assert(cat.loadViewDoc(Seq("negdb"), "v1").isEmpty)
      intercept[UnsupportedOperationException](
        cat.putViewDoc(Seq("negdb"), "v1", "{}", replace = false))
      assert(!cat.dropViewDoc(Seq("negdb"), "v1"))
      assert(cat.dropTable(Seq("negdb"), "neg_t", purge = true))
      // and an explicit scope/audience override the defaults
      RestCatalogServer.lastTokenScope.set("")
      RestCatalogServer.lastTokenAudience.set("")
      graft.core.meta.RestCatalog.connect(negUri,
        credential = Some("svc:hunter2"), scope = Some("catalog:read"),
        audience = Some("https://example.invalid/warehouse"))
      assert(RestCatalogServer.lastTokenScope.get() === "catalog:read")
      assert(RestCatalogServer.lastTokenAudience.get() ===
        "https://example.invalid/warehouse")
    } finally srv.stop(0)
  }

  test("endpoint negotiation: an advertising server that includes the families serves them") {
    val wh2 = Files.createTempDirectory("graft-rest-negall").toString
    val (srv, aUri) = RestCatalogServer.start(wh2,
      advertiseEndpoints = Some(Seq(
        "GET /v1/config",
        "GET /v1/namespaces",
        "POST /v1/namespaces",
        "GET /v1/namespaces/{namespace}/tables",
        "POST /v1/namespaces/{namespace}/tables",
        "GET /v1/namespaces/{namespace}/tables/{table}",
        "POST /v1/namespaces/{namespace}/tables/{table}/commit",
        "POST /v1/namespaces/{namespace}/tables/{table}/plan",
        "GET /v1/namespaces/{namespace}/tables/{table}/plan/{plan-id}",
        "POST /v1/namespaces/{namespace}/tables/{table}/tasks",
        "POST /v1/namespaces/{namespace}/tables/{table}/metrics",
        "GET /v1/namespaces/{namespace}/views",
        "GET /v1/namespaces/{namespace}/views/{view}",
        "POST /v1/namespaces/{namespace}/views/{view}",
        "DELETE /v1/namespaces/{namespace}/views/{view}",
        "DELETE /v1/namespaces/{namespace}/tables/{table}")))
    try {
      val cat = graft.core.meta.RestCatalog.connect(aUri,
        serverPlanning = true)
      import graft.core.types.{GField, GLong, GSchema, GStruct}
      val schema = GSchema(GStruct(Seq(GField(1, "id", GLong, required = true))))
      cat.createTable(Seq("adb"), "a_t", schema)
      val ops = cat.tableOps(Seq("adb"), "a_t")
        .asInstanceOf[graft.core.meta.RestTableOps]
      assert(ops.serverPlanningOn, "advertised plan routes stay usable")
      cat.putViewDoc(Seq("adb"), "av", """{"view-uuid":"u1"}""", replace = false)
      assert(cat.listViewNames(Seq("adb")) === Seq("av"))
      assert(cat.dropViewDoc(Seq("adb"), "av"))
    } finally srv.stop(0)
  }

  test("ETag conditional load: 304 on unchanged metadata, fresh tag after a commit") {
    import graft.core.meta.RestHttp
    spark.sql("CREATE TABLE rcat.db.etag_t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rcat.db.etag_t VALUES (1, 'a')")

    // raw protocol: 200 carries an ETag; a matching If-None-Match is 304
    // with no body; a commit rotates the tag (open-api loadTable 304)
    val url = s"$uri/v1/namespaces/db/tables/etag_t"
    val (c1, _, e1) = RestHttp.getWithEtag(url)
    assert(c1 === 200 && e1.isDefined)
    val (c2, b2, _) = RestHttp.getWithEtag(url, Map("If-None-Match" -> e1.get))
    assert(c2 === 304 && b2.isEmpty)
    spark.sql("INSERT INTO rcat.db.etag_t VALUES (2, 'b')")
    val (c3, _, e3) = RestHttp.getWithEtag(url, Map("If-None-Match" -> e1.get))
    assert(c3 === 200 && e3.isDefined && e3 != e1)

    // client side: a repeat load on one handle is served as a 304 off
    // the cached parse; a foreign commit is still seen immediately
    val cat = RestCatalog.connect(uri)
    val ops = cat.tableOps(Seq("db"), "etag_t")
    val v1 = ops.currentVersion()
    val nm0 = RestCatalogServer.tableLoad304.get()
    assert(ops.currentVersion() === v1 && v1 > 0)
    assert(RestCatalogServer.tableLoad304.get() > nm0,
      "second load should be a 304 cache hit")
    spark.sql("INSERT INTO rcat.db.etag_t VALUES (3, 'c')")
    assert(ops.currentVersion() === v1 + 1,
      "stale ETag must not mask a foreign commit")
    assert(ops.current().exists(_.currentSnapshotId.isDefined))
  }

  test("snapshots=refs: server filters to ref heads; refs-mode client lazily completes") {
    import graft.core.meta.{MetaJson, RestHttp}
    spark.sql("CREATE TABLE rcat.db.refs_t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rcat.db.refs_t VALUES (1, 'a')")
    spark.sql("ALTER TABLE rcat.db.refs_t CREATE TAG first")
    spark.sql("INSERT INTO rcat.db.refs_t VALUES (2, 'b')")
    spark.sql("INSERT INTO rcat.db.refs_t VALUES (3, 'c')")
    val allSnaps = spark.sql(
      "SELECT snapshot_id FROM rcat.db.refs_t.snapshots ORDER BY committed_at")
      .collect().map(_.getLong(0))
    assert(allSnaps.length === 3)

    // wire shape: ?snapshots=refs serves only the tag head + main head,
    // the default serves the full history (open-api `snapshots` param)
    def wireSnapshots(q: String): Set[Long] = {
      val (c, b, _) = RestHttp.getWithEtag(
        s"$uri/v1/namespaces/db/tables/refs_t$q")
      assert(c === 200)
      val arr = MetaJson.mapper.readTree(b).get("metadata").get("snapshots")
      val ids = Set.newBuilder[Long]
      arr.elements().forEachRemaining(s => ids += s.get("snapshot-id").asLong())
      ids.result()
    }
    assert(wireSnapshots("?snapshots=refs") === Set(allSnaps(0), allSnaps(2)))
    assert(wireSnapshots("") === allSnaps.toSet)

    // refs-mode catalog: the current read never needs the middle
    // snapshot; time travel TO it forces the lazy full load and works
    assert(spark.sql("SELECT count(*) FROM rcatr.db.refs_t")
      .collect().head.getLong(0) === 3)
    assert(spark.sql(
      s"SELECT count(*) FROM rcatr.db.refs_t VERSION AS OF ${allSnaps(1)}")
      .collect().head.getLong(0) === 2)

    // a commit THROUGH the refs-mode catalog must not drop unreferenced
    // snapshots: the lazy list materializes fully before the metadata
    // document crosses the wire
    spark.sql("INSERT INTO rcatr.db.refs_t VALUES (4, 'd')")
    val after = spark.sql("SELECT snapshot_id FROM rcat.db.refs_t.snapshots")
      .collect().map(_.getLong(0)).toSet
    assert(after.size === 4 && allSnaps.forall(after))
    assert(spark.sql("SELECT count(*) FROM rcat.db.refs_t")
      .collect().head.getLong(0) === 4)
  }

  test("refs-mode validator never confirms a full load; loadCredentials requires delegation") {
    import graft.core.meta.RestHttp
    spark.sql("CREATE TABLE rcat.db.etagv_t (id BIGINT)")
    spark.sql("INSERT INTO rcat.db.etagv_t VALUES (1)")
    val url = s"$uri/v1/namespaces/db/tables/etagv_t"
    val (cr, _, er) = RestHttp.getWithEtag(s"$url?snapshots=refs")
    assert(cr === 200 && er.isDefined)
    // the two representations carry DISTINCT validators (HTTP Vary
    // semantics): a refs-mode etag must never 304-confirm a full load —
    // that would hand the client a filtered body it believes is complete
    val (cf, bf, ef) = RestHttp.getWithEtag(url, Map("If-None-Match" -> er.get))
    assert(cf === 200 && bf.nonEmpty && ef.isDefined && ef != er)
    // …while each validator still confirms its OWN representation
    val (cr2, _, _) = RestHttp.getWithEtag(s"$url?snapshots=refs",
      Map("If-None-Match" -> er.get))
    assert(cr2 === 304)
    val (cf2, _, _) = RestHttp.getWithEtag(url, Map("If-None-Match" -> ef.get))
    assert(cf2 === 304)
    // credential vending honors the delegation negotiation on BOTH
    // surfaces: loadCredentials refuses a caller that never negotiated
    val (cc, _, _) = RestHttp.getWithEtag(s"$url/credentials")
    assert(cc === 400)
    val (cc2, cb2, _) = RestHttp.getWithEtag(s"$url/credentials",
      Map("X-Graft-Access-Delegation" -> "vended-credentials"))
    assert(cc2 === 200 && cb2.contains("storage-credentials"))
  }

  test("LazySnapshots: generic find preserves list order; findById never forces") {
    import graft.core.meta.{LazySnapshots, Snapshot}
    def snap(id: Long, wap: Option[String]) = Snapshot(id, None, id, id,
      "append", "inline:[]", summary = wap.map("wap.id" -> _).toMap)
    // s1 (older, staged) and s3 (its published cherry-pick) share a
    // wap.id; only s3 is ref-reachable. Seq.find promises FIRST match in
    // list order — the wap.id lookup must resolve to the OLDER staged
    // snapshot, not the subset's published copy.
    val s1 = snap(1L, Some("w")); val s2 = snap(2L, None); val s3 = snap(3L, Some("w"))
    var forced = 0
    val ls = new LazySnapshots(Seq(s3), () => { forced += 1; Seq(s1, s2, s3) })
    assert(ls.findById(3L).contains(s3) && forced === 0,
      "unique-id lookup served from the subset must not force")
    assert(ls.find(_.summary.get("wap.id").contains("w")) === Some(s1),
      "generic find must honor list order, not subset order")
    assert(forced === 1)
    assert(ls.findById(1L).contains(s1))
  }

  test("spec views/rename moves the document; 404 missing, 409 occupied") {
    import graft.core.meta.RestHttp
    val cat = RestCatalog.connect(uri)
    cat.putViewDoc(Seq("db"), "vr_src", """{"view-uuid":"vr1"}""", replace = false)
    def rename(from: String, to: String): Int =
      RestHttp.post(s"$uri/v1/views/rename",
        s"""{"source": {"namespace": ["db"], "name": "$from"},
             "destination": {"namespace": ["db"], "name": "$to"}}""")._1
    assert(rename("vr_src", "vr_dst") === 200)
    assert(cat.loadViewDoc(Seq("db"), "vr_src").isEmpty)
    assert(cat.loadViewDoc(Seq("db"), "vr_dst").exists(_.contains("vr1")))
    assert(rename("vr_src", "vr_other") === 404)
    cat.putViewDoc(Seq("db"), "vr_src", """{"view-uuid":"vr2"}""", replace = false)
    assert(rename("vr_src", "vr_dst") === 409)
    assert(cat.dropViewDoc(Seq("db"), "vr_src"))
    assert(cat.dropViewDoc(Seq("db"), "vr_dst"))
  }

  test("expired vends refresh via the credentials endpoint, not a table reload") {
    val wh2 = Files.createTempDirectory("graft-rest-credep").toString
    // credTtlMs=1: every vend is expired by the next observation
    val (srv, u) = RestCatalogServer.start(wh2, credTtlMs = 1)
    try {
      val cat = RestCatalog.connect(u, accessDelegation = true)
      val schema = GSchema(GStruct(Seq(GField(1, "id", GLong))))
      cat.createTable(Seq("cdb"), "c_t", schema)
      val ops = cat.tableOps(Seq("cdb"), "c_t")
        .asInstanceOf[graft.core.meta.RestTableOps]
      ops.current() // seeds the (already expired) vend
      Thread.sleep(5)
      val full0 = RestCatalogServer.tableLoadFull.get()
      val creds = ops.storageCredentials
      assert(creds.nonEmpty && creds.forall(_.expiresAtMs.isDefined))
      assert(RestCatalogServer.tableLoadFull.get() === full0,
        "the refresh must hit loadCredentials, not re-ship the metadata")
    } finally srv.stop(0)
  }

  test("a failed lazy snapshot force throws — never memoizes an empty history") {
    spark.sql("CREATE TABLE rcat.db.lazy_fail (id BIGINT)")
    spark.sql("INSERT INTO rcat.db.lazy_fail VALUES (1)")
    spark.sql("INSERT INTO rcat.db.lazy_fail VALUES (2)")
    val cat = RestCatalog.connect(uri, snapshotMode = "refs")
    val ops = cat.tableOps(Seq("db"), "lazy_fail")
    val meta = ops.current().get
    // the refs subset (main head) answers without forcing
    assert(meta.currentSnapshot.isDefined)
    // drop the table behind the handle's back: forcing the full list
    // must THROW (retryable), not memoize an empty history that a later
    // expire-style commit would write back as a zero-snapshot metadata
    spark.sql("DROP TABLE rcat.db.lazy_fail")
    val e = intercept[IllegalStateException](meta.snapshots.length)
    assert(e.getMessage.contains("lazy snapshot load failed"))
  }

  test("oauth2-server-uri routes the token exchange to the configured endpoint") {
    val wh2 = Files.createTempDirectory("graft-rest-idp").toString
    val (srv, u) = RestCatalogServer.start(wh2, credential = Some(("svc", "pw")))
    try {
      RestCatalogServer.lastTokenPath.set("")
      val cat = RestCatalog.connect(u, Some("svc:pw"),
        oauth2ServerUri = Some(s"$u/alt/oauth/tokens"))
      assert(RestCatalogServer.lastTokenPath.get === "/alt/oauth/tokens",
        "exchange must hit the configured IdP endpoint, not the default")
      val schema = GSchema(GStruct(Seq(GField(1, "id", GLong))))
      cat.createTable(Seq("idb"), "i_t", schema)
      assert(cat.loadTable(Seq("idb"), "i_t").isDefined)
    } finally srv.stop(0)
  }
}
