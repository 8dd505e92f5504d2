package graft.core.meta

import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.core.expr.PartitionSpec
import graft.core.types.GSchema

/** REST catalog (reference core/.../rest/RESTCatalog.java + server-side
  * CatalogHandlers.java, spec open-api/): the catalog lives behind an
  * HTTP endpoint; clients load tables and commit metadata through it.
  * The SERVER owns metadata-file writes and the pointer swap, so clients
  * need no direct access to the pointer store — commits POST the full
  * updated metadata and the server answers 409 on a version conflict,
  * which surfaces client-side as an ordinary CAS failure feeding the
  * existing retry loop.
  *
  * Endpoints (graft-simplified but REST-catalog-shaped):
  *   GET    /v1/config                               → {warehouse}
  *   GET    /v1/namespaces/{ns}/tables               → {identifiers:[...]}
  *   POST   /v1/namespaces/{ns}/tables/{t}/create    → {location, version}
  *   GET    /v1/namespaces/{ns}/tables/{t}           → {version, metadata-location, metadata}
  *   POST   /v1/namespaces/{ns}/tables/{t}/commit    → 200 | 409
  *   DELETE /v1/namespaces/{ns}/tables/{t}           → 200 | 404
  *   POST   /v1/tables/rename                        → 200 | 404 | 409
  *   POST   /v1/transactions/commit                  → 200 | 409
  *
  * plus the SPEC's own protocol (open-api createTable / updateTable /
  * registerTable; requirements + update actions applied by
  * [[SpecUpdates]]), so a genuine Iceberg REST client can create,
  * register, and commit against this server:
  *   POST   /v1/namespaces/{ns}/tables               CreateTableRequest → LoadTableResult
  *   POST   /v1/namespaces/{ns}/tables/{t}           CommitTableRequest → CommitTableResponse | 409
  *   POST   /v1/namespaces/{ns}/register             {name, metadata-location} → LoadTableResult
  */
object RestCatalogServer {
  /** the `scope`/`audience` form parameters of the most recent token
    * exchange — observed by tests asserting the client sends them */
  val lastTokenScope = new java.util.concurrent.atomic.AtomicReference[String]("")
  val lastTokenAudience = new java.util.concurrent.atomic.AtomicReference[String]("")
  /** path of the most recent token exchange — observed by tests
    * asserting the client honors `oauth2-server-uri` */
  val lastTokenPath = new java.util.concurrent.atomic.AtomicReference[String]("")
  /** table-load instrumentation: responses that shipped a full metadata
    * body vs 304 Not-Modified hits served off the client's ETag */
  val tableLoadFull = new java.util.concurrent.atomic.AtomicLong
  val tableLoad304 = new java.util.concurrent.atomic.AtomicLong

  /** Start an in-process server over a directory warehouse; returns
    * (server, uri). Backing store: FileTableOps per table, so the server
    * composes with everything the Hadoop catalog supports.
    *
    * When `credential` (client-id, client-secret) is set, the server
    * requires OAuth2 client-credentials auth (reference
    * core/.../rest/auth/OAuth2Util + open-api /v1/oauth/tokens): clients
    * exchange the credential for a bearer token once, then send
    * `Authorization: Bearer` on every call; anything else gets 401. */
  def start(warehouse: String, port: Int = 0,
      credential: Option[(String, String)] = None,
      tableConfig: Map[String, String] = Map.empty,
      // server-side scan planning: file-scan-tasks per plan-task chunk
      // (small in tests to exercise the multi-chunk fetch path; a real
      // deployment sizes this to the response-payload budget)
      planPageSize: Int = 10000,
      // bearer-token lifetime; tokens genuinely EXPIRE (the spec's
      // expires_in is a contract, not advisory) — short in tests to
      // exercise the client's AuthSession refresh path
      tokenTtlSec: Long = 3600,
      // vended storage-credential lifetime (expires-at-ms)
      credTtlMs: Long = 15 * 60 * 1000L,
      // ConfigResponse `endpoints` (reference RESTSessionCatalog
      // Endpoint): when set, the config advertises EXACTLY these routes
      // and the optional families (plan/views/metrics) outside the list
      // answer 404 — tests prove clients degrade without error-path
      // round-trips. None = classic server (everything implied).
      advertiseEndpoints: Option[Seq[String]] = None): (HttpServer, String) = {
    val backing = new HadoopCatalog(warehouse)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    // opaque bearer tokens minted per exchange, token → expiry epoch-ms;
    // expired entries reject with 401 and sweep lazily at mint time
    val issuedTokens =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    // per-table ring of client-reported metrics payloads (reference
    // open-api reportMetrics: engines POST scan/commit reports so the
    // catalog operator sees load without engine-side access)
    val metrics = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.ConcurrentLinkedDeque[String]]()

    def json(x: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      x.getResponseHeaders.set("Content-Type", "application/json")
      x.sendResponseHeaders(code, b.length)
      x.getResponseBody.write(b)
      x.close()
    }
    def readBody(x: HttpExchange): String =
      new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

    // a multi-level namespace arrives percent-decoded from the URL path;
    // the spec joins levels with the 0x1F unit separator
    // (open-api: "Namespace parts should be separated by %1F") — graft's
    // own client uses '.', so accept both
    def nsParts(ns: String): Seq[String] = {
      val parts =
        (if (ns.indexOf(0x1f.toChar) >= 0) ns.split(0x1f.toChar)
         else ns.split("\\.")).toSeq.filter(_.nonEmpty)
      // never let a path level escape or re-root the warehouse: '.'
      // vanishes in the dot-split but '..' and '/' arrive intact via the
      // %1F separator and would traverse OUTSIDE the warehouse
      require(parts.forall(p => p != "." && p != ".." && !p.contains('/')),
        s"invalid namespace path: $ns")
      parts
    }
    def nsDir(ns: String): String = (warehouse +: nsParts(ns)).mkString("/")

    // existence/liveness via the shared predicates (NamespaceProps) the
    // Spark catalog also uses, so the two surfaces can never disagree on
    // whether a namespace exists. A dropped table's residual directory
    // reads as absent — re-creatable — on both. (Legacy property-less
    // namespaces created before markers existed are indistinguishable
    // from residuals and read as absent.)
    // parts.nonEmpty guard: a path string like "." or a bare separator
    // parses to ZERO levels, which the shared predicate would resolve to
    // the warehouse root — and a DELETE there would remove the warehouse
    def nsExists(parts: Seq[String]): Boolean =
      parts.nonEmpty && NamespaceProps.isNamespaceDir(warehouse, parts)

    // spec LoadTableResult / CommitTableResponse shape (open-api):
    // metadata-location + the full metadata document; `version` rides
    // along for graft's own client
    def loadResultJson(ops: FileTableOps): String = {
      val o = MetaJson.mapper.createObjectNode()
      ops.currentMetadataPath.foreach(p => o.put("metadata-location", p))
      o.set[com.fasterxml.jackson.databind.JsonNode]("metadata",
        MetaJson.mapper.readTree(MetaJson.writeMetadata(ops.current().get)))
      o.put("version", ops.currentVersion())
      o.putObject("config")
      MetaJson.mapper.writeValueAsString(o)
    }

    /** true when the request may proceed; otherwise a 401 was sent.
      * A token past its advertised expires_in rejects exactly like a
      * wrong one — clients must refresh, not outlive the TTL. */
    def authed(x: HttpExchange): Boolean = {
      val ok = credential.isEmpty ||
        Option(x.getRequestHeaders.getFirst("Authorization"))
          .collect { case a if a.startsWith("Bearer ") => a.substring(7) }
          .flatMap(t => Option(issuedTokens.get(t)))
          .exists(_ >= System.currentTimeMillis())
      if (!ok) {
        // HEAD responses must not carry a body
        if (x.getRequestMethod == "HEAD") { x.sendResponseHeaders(401, -1); x.close() }
        else json(x, 401, """{"error": "unauthorized"}""")
      }
      ok
    }

    // OAuth2 token endpoint: client-credentials grant only, form-encoded
    // (reference open-api getToken); the only route that never needs
    // auth. Registered at the spec default path AND an alternate one so
    // tests can prove clients honor `oauth2-server-uri` (reference
    // OAuth2Properties.OAUTH2_SERVER_URI — a real deployment points it
    // at an external IdP).
    val tokenHandler: com.sun.net.httpserver.HttpHandler = (x: HttpExchange) =>
      try {
        lastTokenPath.set(x.getRequestURI.getPath)
        val form = readBody(x).split("&").filter(_.contains("="))
          .map { kv =>
            val i = kv.indexOf('=')
            kv.substring(0, i) ->
              java.net.URLDecoder.decode(kv.substring(i + 1), "UTF-8")
          }.toMap
        credential match {
          case Some((id, secret))
            if form.get("grant_type").contains("client_credentials") &&
              form.get("client_id").contains(id) &&
              form.get("client_secret").contains(secret) =>
            val now = System.currentTimeMillis()
            val tok = java.util.UUID.randomUUID().toString
            form.get("scope").foreach(sc => lastTokenScope.set(sc))
            form.get("audience").foreach(a => lastTokenAudience.set(a))
            issuedTokens.put(tok, now + tokenTtlSec * 1000L)
            // sweep expired tokens so re-exchange churn can't grow the
            // registry without bound
            issuedTokens.forEach((t, e) => if (e < now) issuedTokens.remove(t, e))
            json(x, 200, s"""{"access_token": ${MetaJson.mapper.writeValueAsString(tok)},""" +
              s""" "token_type": "bearer", "expires_in": $tokenTtlSec}""")
          case Some(_) => json(x, 401, """{"error": "invalid client credentials"}""")
          case None    => json(x, 400, """{"error": "auth not configured on this server"}""")
        }
      } catch { case e: Throwable => json(x, 400, errJson(e)) }
    server.createContext("/v1/oauth/tokens", tokenHandler)
    server.createContext("/alt/oauth/tokens", tokenHandler)

    // reference rest-catalog-open-api.yaml getConfig: server-controlled
    // defaults/overrides a second engine instance merges into its own
    // settings; warehouse doubles as both for this backend
    server.createContext("/v1/config", (x: HttpExchange) =>
      if (authed(x)) {
        val eps = advertiseEndpoints.map(_.map(e =>
          MetaJson.mapper.writeValueAsString(e)).mkString(
            """, "endpoints": [""", ", ", "]")).getOrElse("")
        json(x, 200,
          s"""{"warehouse": ${MetaJson.mapper.writeValueAsString(warehouse)},""" +
            s""" "defaults": {"warehouse": ${MetaJson.mapper.writeValueAsString(warehouse)}},""" +
            s""" "overrides": {}$eps}""")
      })

    server.createContext("/v1/tables/rename", (x: HttpExchange) =>
      try if (authed(x)) {
        val n = MetaJson.mapper.readTree(readBody(x))
        // accept BOTH body shapes: the spec's RenameTableRequest
        // ({source/destination: {namespace: [...], name}}) from genuine
        // Iceberg clients, and graft's own {from, to} dotted strings
        def ident(node: com.fasterxml.jackson.databind.JsonNode): Seq[String] = {
          require(node.hasNonNull("namespace") && node.hasNonNull("name"),
            "rename identifiers require namespace and name")
          val b = Seq.newBuilder[String]
          node.get("namespace").elements().forEachRemaining(e => b += e.asText())
          b += node.get("name").asText()
          b.result()
        }
        val (from, to) =
          if (n.hasNonNull("source") && n.hasNonNull("destination"))
            (ident(n.get("source")), ident(n.get("destination")))
          else {
            require(n.hasNonNull("from") && n.hasNonNull("to"), "from/to required")
            (n.get("from").asText().split("\\.").toSeq,
              n.get("to").asText().split("\\.").toSeq)
          }
        require(from.length >= 2 && to.length >= 2, "namespace.table required")
        // the destination's namespace levels must be addressable — the
        // spec ident shape could otherwise move a table into a namespace
        // the path parsing can never reach again — and NEITHER side may
        // traverse outside the warehouse
        NamespaceProps.validateLevels(to.init)
        require((from ++ to).forall(NamespaceProps.validName),
          "rename identifiers must not contain path segments")
        // an atomic directory move server-side (relative locations make
        // the moved directory the renamed table)
        try {
          backing.renameTable(from.init, from.last, to.init, to.last)
          json(x, 200, "{}")
        } catch {
          case e: IllegalArgumentException => json(x, 404, errJson(e))
          case e: IllegalStateException    => json(x, 409, errJson(e))
        }
      } catch { case e: Throwable => json(x, 400, errJson(e)) })

    // spec renameView (open-api /v1/views/rename, RenameTableRequest
    // body shape): move the view document between namespace stores —
    // 404 on a missing source, 409 when the destination exists
    server.createContext("/v1/views/rename", (x: HttpExchange) =>
      try if (authed(x)) {
        val n = MetaJson.mapper.readTree(readBody(x))
        def ident(node: com.fasterxml.jackson.databind.JsonNode): Seq[String] = {
          require(node.hasNonNull("namespace") && node.hasNonNull("name"),
            "rename identifiers require namespace and name")
          val b = Seq.newBuilder[String]
          node.get("namespace").elements().forEachRemaining(e => b += e.asText())
          b += node.get("name").asText()
          b.result()
        }
        require(n.hasNonNull("source") && n.hasNonNull("destination"),
          "source/destination required")
        val (from, to) = (ident(n.get("source")), ident(n.get("destination")))
        require(from.length >= 2 && to.length >= 2, "namespace.view required")
        NamespaceProps.validateLevels(to.init)
        require((from ++ to).forall(NamespaceProps.validName),
          "rename identifiers must not contain path segments")
        def docPath(id: Seq[String]): String =
          (warehouse +: id.init :+ "_views").mkString("/") + s"/${id.last}.json"
        val (src, dst) = (docPath(from), docPath(to))
        if (!GraftIO.exists(src)) json(x, 404, s"""{"error": "no such view"}""")
        else if (GraftIO.exists(dst)) json(x, 409, s"""{"error": "view exists"}""")
        else {
          java.nio.file.Files.createDirectories(
            java.nio.file.Paths.get(dst).getParent)
          java.nio.file.Files.move(java.nio.file.Paths.get(src),
            java.nio.file.Paths.get(dst))
          json(x, 200, "{}")
        }
      } catch { case e: Throwable => json(x, 400, errJson(e)) })

    // multi-table transaction commit (reference RESTCatalog
    // .commitTransaction(List<TableCommit>) + open-api commitTransaction):
    // N table CAS'es applied all-or-nothing. The server owns every pointer
    // swap, so a global lock makes verify-then-apply atomic against other
    // REST committers; a mid-apply failure (out-of-band filesystem writer)
    // restores the already-swapped tables' CONTENT before answering 409.
    val txnLock = new Object
    server.createContext("/v1/transactions/commit", (x: HttpExchange) =>
      try if (authed(x)) {
        val n = MetaJson.mapper.readTree(readBody(x))
        val commits = {
          val b = Seq.newBuilder[(FileTableOps, Int, TableMetadata, String, String)]
          n.get("table-commits").elements().forEachRemaining { c =>
            val cns = c.get("namespace").asText()
            val cnm = c.get("name").asText()
            b += ((new FileTableOps(
                backing.tableLocation(nsParts(cns), cnm)),
              c.get("base-version").asInt(),
              MetaJson.readMetadata(
                MetaJson.mapper.writeValueAsString(c.get("metadata"))),
              cns, cnm))
          }
          b.result()
        }
        require(commits.nonEmpty, "table-commits must be non-empty")
        txnLock.synchronized {
          val stale = commits.find { case (ops, base, _, _, _) =>
            ops.currentVersion() != base }
          stale match {
            case Some((_, base, _, cns, cnm)) =>
              json(x, 409, s"""{"error": ${MetaJson.mapper.writeValueAsString(
                s"commit conflict: $cns.$cnm moved past base $base")}}""")
            case None =>
              // verify passed under the lock; every REST commit route also
              // takes this lock, so a mid-apply CAS loss can only come
              // from an out-of-band filesystem writer
              val done = Seq.newBuilder[
                (FileTableOps, Int, Option[TableMetadata], String, String)]
              val failed = commits.find { case (ops, base, meta, cns, cnm) =>
                val prior = ops.current()
                val ok = ops.commit(base, meta)
                if (ok) done += ((ops, base + 1, prior, cns, cnm))
                !ok
              }
              failed match {
                case Some((_, _, _, cns, cnm)) =>
                  done.result().reverse.foreach {
                    case (ops, v, Some(prior), _, _) =>
                      // restore CONTENT only while our swap is still the
                      // head — an out-of-band commit stacked on top wins
                      // (restoring over it would erase that commit)
                      if (ops.currentVersion() == v) ops.commit(v, prior)
                    case (_, _, None, dns, dnm) =>
                      // the transaction CREATED this table: undo = drop
                      try backing.dropTable(nsParts(dns), dnm)
                      catch { case _: Throwable => () }
                  }
                  json(x, 409, s"""{"error": ${MetaJson.mapper.writeValueAsString(
                    s"commit conflict applying $cns.$cnm; transaction rolled back")}}""")
                case None => json(x, 200, "{}")
              }
          }
        }
      } catch { case e: Throwable => json(x, 400, errJson(e)) })

    // server-side scan planning state: plan-id → plan state holding
    // pre-serialized ScanTasks chunk JSONs once planning completes
    // (reference CatalogHandlers plan handling). `chunks`/`error` are
    // written by the planning thread, read by the poll routes. Bounded
    // ring: plans evict oldest-first past the cap.
    final class PlanState(val table: String) {
      @volatile var chunks: IndexedSeq[String] = null // null = still planning
      @volatile var error: String = null
      // last time a client created/polled/fetched this plan — eviction
      // spares recently-touched plans (their client is mid-scan)
      @volatile var lastTouchMs: Long = System.currentTimeMillis()
      def touch(): Unit = lastTouchMs = System.currentTimeMillis()
      def status: String =
        if (error != null) "failed"
        else if (chunks != null) "completed"
        else "submitted"
      def weight: Long = // ×2: String chars are UTF-16 code units on heap
        Option(chunks).map(_.iterator.map(_.length.toLong * 2).sum).getOrElse(0L)
    }
    val plans = new java.util.concurrent.ConcurrentHashMap[String, PlanState]()
    val planOrder = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    /** in-flight async plans (atomic admission counter: incremented at
      * admission, decremented when the planning runnable terminates —
      * a check-then-act scan over the map could admit past the bound
      * under a concurrent burst, and rescanned O(n) per request) */
    val inFlightPlans = new java.util.concurrent.atomic.AtomicInteger(0)
    /** a terminal plan idle less than this survives soft-cap eviction:
      * its client is plausibly still fetching plan-task chunks, and a
      * mid-scan 404 is unrecoverable for an external spec client */
    val planIdleGraceMs = 60000L
    def storePlan(id: String, table: String): PlanState = {
      val st = new PlanState(table)
      plans.put(id, st)
      planOrder.add(id)
      // bounded by COUNT and BYTES: a handful of 100 TB-scale plans can
      // hold GBs of serialized tasks — old plans evict before memory
      // does. Only TERMINAL plans evict (an in-flight plan's id must
      // stay valid for its poller; bursts of in-flight plans are bounded
      // by the async-admission counter instead), the newest 8 TERMINAL
      // plans always survive (their clients are plausibly mid-fetch),
      // totals compute once and decrement per eviction, and the scan is
      // bounded so rotating non-evictable entries can't loop forever.
      // Soft caps (128 plans / 256 MB) only evict plans idle past the
      // grace period; hard caps (2×) evict oldest-first regardless, so
      // memory stays bounded even when every plan was touched recently.
      var total = 0L
      var terminal = 0
      plans.values().forEach { p =>
        total += p.weight
        if (p.status != "submitted") terminal += 1
      }
      val now = System.currentTimeMillis()
      def overSoft = plans.size() > 128 || total > 256L * 1024 * 1024
      def overHard = plans.size() > 256 || total > 512L * 1024 * 1024
      var guard = planOrder.size()
      while (guard > 0 && terminal > 8 && overSoft) {
        guard -= 1
        val old = planOrder.poll()
        if (old == null) return st
        val ps = plans.get(old)
        if (ps == null) () // stale id: drop from the queue
        else if (old != id && ps.status != "submitted" &&
            (overHard || now - ps.lastTouchMs > planIdleGraceMs)) {
          plans.remove(old)
          total -= ps.weight
          terminal -= 1
        } else planOrder.add(old) // in-flight / in-grace / the new plan
      }
      st
    }
    /** completed-result shape shared by planTableScan and
      * fetchPlanningResult: one chunk inlines, many become plan-tasks */
    def completedPlanNode(pid: String, chunks: IndexedSeq[String])
        : com.fasterxml.jackson.databind.node.ObjectNode = {
      val o =
        if (chunks.size <= 1)
          MetaJson.mapper.readTree(chunks.head)
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        else {
          val oo = MetaJson.mapper.createObjectNode()
          val pts = oo.putArray("plan-tasks")
          chunks.indices.foreach(i => pts.add(SpecScanTasks.planTask(pid, i)))
          oo
        }
      o.put("status", "completed")
      o
    }
    // async planning pool: a long plan must not pin an HTTP handler
    // thread — the submitted/poll contract exists exactly for huge
    // metadata (daemon threads; the server never pins the JVM open)
    val planExec = java.util.concurrent.Executors.newFixedThreadPool(2,
      (r: Runnable) => {
        val t = new Thread(r, "graft-rest-plan"); t.setDaemon(true); t
      })

    // /v1/namespaces/{ns}/tables[/{t}[/create|/commit]]
    server.createContext("/v1/namespaces", (x: HttpExchange) =>
      try if (authed(x)) {
        val parts = x.getRequestURI.getPath.stripPrefix("/v1/namespaces")
          .stripPrefix("/").split("/").filter(_.nonEmpty)
        // anti-traversal: EVERY route addressing a table or view name
        // validates it ONCE here — the legacy create/commit routes used
        // to accept '..' or '_x' and let a client commit table metadata
        // into the namespace's parent (warehouse-root poisoning)
        parts match {
          case Array(_, "tables", t, _*) =>
            require(NamespaceProps.validName(t) && !t.startsWith("_"),
              s"invalid table name: $t")
          case Array(_, "views", v, _*) =>
            require(NamespaceProps.validName(v) && !v.startsWith("_"),
              s"invalid view name: $v")
          case _ => ()
        }
        // endpoint negotiation: optional families outside the
        // advertised list refuse with 404 (spec behavior for an
        // unsupported route), proving a negotiating client never
        // called them when its run shows no errors
        val family: Option[String] =
          if (parts.length >= 4 && parts(1) == "tables" &&
              (parts(3) == "plan" || parts(3) == "tasks")) Some("/plan")
          else if (parts.length >= 4 && parts(1) == "tables" &&
              parts(3) == "metrics") Some("/metrics")
          else if (parts.length >= 4 && parts(1) == "tables" &&
              parts(3) == "credentials") Some("/credentials")
          else if (parts.length >= 2 && parts(1) == "views") Some("/views")
          else None
        val gated = family.exists(f =>
          !advertiseEndpoints.forall(_.exists(_.contains(f))))
        if (gated)
          json(x, 404, s"""{"error": "endpoint not advertised"}""")
        else (x.getRequestMethod, parts) match {
          // ---- namespace routes (open-api listNamespaces /
          // createNamespace / loadNamespaceMetadata / dropNamespace /
          // updateProperties); properties persist in the namespace
          // directory's _namespace.json
          case ("GET", Array()) =>
            // listNamespaces: direct children of ?parent= (or the root).
            // Decode from the RAW query exactly once — getQuery already
            // decodes, and a second URLDecoder pass corrupts '+'/'%'/'&'
            // in namespace names. A child is a namespace when it carries
            // the marker or live content; a table dir or a dropped
            // table's residual is neither.
            val parent = Option(x.getRequestURI.getRawQuery).getOrElse("")
              .split("&").filter(_.startsWith("parent="))
              .map(v => java.net.URLDecoder.decode(
                v.stripPrefix("parent="), "UTF-8")).headOption
            val baseParts = parent.map(nsParts).getOrElse(Seq.empty)
            val baseDir = (warehouse +: baseParts).mkString("/")
            val o = MetaJson.mapper.createObjectNode()
            val arr = o.putArray("namespaces")
            if (java.nio.file.Files.isDirectory(GraftIO.toPath(baseDir)))
              GraftIO.list(baseDir)
                .map(p => GraftIO.toPath(p).getFileName.toString)
                .filter(n => !n.startsWith("_") && nsExists(baseParts :+ n))
                .sorted
                .foreach { n =>
                  val e = arr.addArray()
                  (baseParts :+ n).foreach(e.add)
                }
            json(x, 200, MetaJson.mapper.writeValueAsString(o))
          case ("POST", Array()) =>
            val body = MetaJson.mapper.readTree(readBody(x))
            val nsLevels = {
              val b = Seq.newBuilder[String]
              body.get("namespace").elements().forEachRemaining(e => b += e.asText())
              b.result()
            }
            // reject unaddressable levels BEFORE anything exists on disk
            // (shared validator — Spark createNamespace validates the
            // same way through NamespaceProps.mark)
            NamespaceProps.validateLevels(nsLevels)
            if (nsExists(nsLevels))
              json(x, 409, s"""{"error": "namespace already exists"}""")
            else {
              val props = {
                val b = Map.newBuilder[String, String]
                Option(body.get("properties")).foreach(_.fields()
                  .forEachRemaining(e => b += e.getKey -> e.getValue.asText()))
                b.result()
              }
              // marker at EVERY level (a nested create implicitly
              // creates ancestors), then the leaf's store — dropNamespace
              // and listNamespaces tell namespaces from dropped-table
              // residual directories by the marker's presence
              NamespaceProps.mark(warehouse, nsLevels)
              NamespaceProps.write(warehouse, nsLevels, props)
              json(x, 200, s"""{"namespace": ${MetaJson.mapper.writeValueAsString(
                  nsLevels.toArray)}, "properties": ${
                  MetaJson.mapper.writeValueAsString(
                    props.foldLeft(MetaJson.mapper.createObjectNode()) {
                      case (o, (k, v)) => o.put(k, v) })}}""")
            }
          case ("GET", Array(ns)) =>
            if (!nsExists(nsParts(ns)))
              json(x, 404, s"""{"error": "no such namespace"}""")
            else {
              val props = NamespaceProps.read(warehouse, nsParts(ns))
                .foldLeft(MetaJson.mapper.createObjectNode()) {
                  case (o, (k, v)) => o.put(k, v) }
              json(x, 200, s"""{"namespace": ${MetaJson.mapper.writeValueAsString(
                  nsParts(ns).toArray) }, "properties": ${
                  MetaJson.mapper.writeValueAsString(props)}}""")
            }
          case ("HEAD", Array(ns)) =>
            val ok = nsExists(nsParts(ns))
            x.sendResponseHeaders(if (ok) 204 else 404, -1); x.close()
          case ("DELETE", Array(ns)) =>
            val dir = GraftIO.toPath(nsDir(ns))
            if (!nsExists(nsParts(ns)))
              json(x, 404, s"""{"error": "no such namespace"}""")
            // spec: dropping a non-empty namespace is a 409 — non-empty
            // means live tables, child namespaces, or views, at ANY
            // depth (the old tables-only check silently destroyed child
            // namespaces' tables); the SAME shared guard backs Spark's
            // non-cascade DROP NAMESPACE. A dropped table's residual
            // directory (identity removed, data left by the
            // gc.enabled=false contract) never blocks.
            else if (NamespaceProps
                .nonEmptyBlocker(warehouse, nsParts(ns)).nonEmpty)
              json(x, 409, s"""{"error": "namespace is not empty"}""")
            else {
              GraftIO.deleteTree(dir.toString)
              x.sendResponseHeaders(204, -1); x.close()
            }
          case ("POST", Array(ns, "properties")) =>
            if (!nsExists(nsParts(ns)))
              json(x, 404, s"""{"error": "no such namespace"}""")
            else {
              // read-modify-write through the ONE shared store
              // (NamespaceProps) so this route and the Spark catalog's
              // SupportsNamespaces can never disagree on shape/lifecycle
              val body = MetaJson.mapper.readTree(readBody(x))
              val removals = {
                val b = Seq.newBuilder[String]
                Option(body.get("removals")).foreach(
                  _.elements().forEachRemaining(r => b += r.asText()))
                b.result()
              }
              val updates = {
                val b = Map.newBuilder[String, String]
                Option(body.get("updates")).foreach(_.fields()
                  .forEachRemaining(e => b += e.getKey -> e.getValue.asText()))
                b.result()
              }
              // spec: a key in BOTH lists must fail the request (422),
              // not be applied-and-reported-twice
              val both = removals.toSet.intersect(updates.keySet)
              if (both.nonEmpty)
                json(x, 422, s"""{"error": ${MetaJson.mapper.writeValueAsString(
                  s"keys in both removals and updates: ${both.toSeq.sorted.mkString(", ")}")}}""")
              else {
                val (removed, updatedKeys, missing) =
                  NamespaceProps.update(warehouse, nsParts(ns), removals, updates)
                val o = MetaJson.mapper.createObjectNode()
                val ra = o.putArray("removed"); removed.foreach(ra.add)
                val ua = o.putArray("updated"); updatedKeys.foreach(ua.add)
                // spec: removals that were NOT present are reported, not
                // silently dropped from all three lists
                val ma = o.putArray("missing"); missing.foreach(ma.add)
                json(x, 200, MetaJson.mapper.writeValueAsString(o))
              }
            }
          case ("GET", Array(ns, "tables")) =>
            // paginated listing (reference CatalogHandlers.paginate):
            // stable sort order, pageToken = last name already returned,
            // next-page-token present only when more pages remain
            val q = Option(x.getRequestURI.getQuery).getOrElse("")
            val params = q.split("&").filter(_.contains("="))
              .map { kv => val i = kv.indexOf('='); kv.substring(0, i) ->
                java.net.URLDecoder.decode(kv.substring(i + 1), "UTF-8") }.toMap
            val pageSize = params.get("pageSize").flatMap(_.toIntOption)
            val after = params.getOrElse("pageToken", "")
            val all = backing.listTables(nsParts(ns)).sorted
            val fromTok = if (after.isEmpty) all else all.filter(_ > after)
            val page = pageSize.map(fromTok.take).getOrElse(fromTok)
            val o = MetaJson.mapper.createObjectNode()
            val arr = o.putArray("identifiers")
            page.foreach(arr.add)
            if (pageSize.exists(_ < fromTok.size) && page.nonEmpty)
              o.put("next-page-token", page.last)
            json(x, 200, MetaJson.mapper.writeValueAsString(o))
          case ("HEAD", Array(ns, "tables", t)) =>
            // cheap existence probe (reference spec tableExists HEAD):
            // no metadata payload, version in a header
            val ops = new FileTableOps(backing.tableLocation(nsParts(ns), t))
            val v = ops.currentVersion()
            if (v == 0) { x.sendResponseHeaders(404, -1); x.close() }
            else {
              x.getResponseHeaders.set("X-Graft-Version", v.toString)
              x.sendResponseHeaders(204, -1); x.close()
            }
          case ("POST", Array(ns, "tables", t, "create")) =>
            val meta = MetaJson.readMetadata(readBody(x))
            val nsSeq = nsParts(ns)
            val loc = backing.tableLocation(nsSeq, t)
            val ops = new FileTableOps(loc)
            // location is server-assigned: rewrite it into the metadata
            val withLoc = meta.copy(location = loc)
            if (ops.commit(0, withLoc))
              json(x, 200, s"""{"location": ${MetaJson.mapper.writeValueAsString(loc)}, "version": 1}""")
            else json(x, 409, s"""{"error": "table exists"}""")
          case ("GET", Array(ns, "tables", t)) =>
            val ops = new FileTableOps(backing.tableLocation(nsParts(ns), t))
            val v = ops.currentVersion()
            if (v == 0) json(x, 404, s"""{"error": "no such table"}""")
            else {
              // ETag = the metadata document's identity (unique per
              // version): an If-None-Match hit answers 304 with no body
              // instead of re-shipping a potentially multi-MB metadata
              // document (open-api loadTable If-None-Match / 304).
              // The validator varies BY REPRESENTATION (HTTP Vary
              // semantics): a refs-filtered body and the full body get
              // distinct etags, so a conditional full load can never be
              // 304-confirmed by a validator obtained from a
              // ?snapshots=refs response
              val refsMode = Option(x.getRequestURI.getQuery)
                .exists(_.split("&").contains("snapshots=refs"))
              val etag =
                "\"" + ops.currentMetadataPath.getOrElse(s"v$v") +
                  (if (refsMode) "-refs" else "") + "\""
              val notModified = Option(
                x.getRequestHeaders.getFirst("If-None-Match")).contains(etag)
              if (notModified) {
                RestCatalogServer.tableLoad304.incrementAndGet()
                x.getResponseHeaders.set("ETag", etag)
                x.sendResponseHeaders(304, -1); x.close()
              } else {
              // LoadTableResult-shaped response (reference open-api
              // LoadTableResponse): `config` carries server-controlled
              // table configuration the CLIENT must apply on top of the
              // table's own properties without ever committing it back;
              // `storage-credentials` are vended only when the client
              // asks for access delegation (reference
              // X-Iceberg-Access-Delegation), scoped to the table's
              // location prefix and expiring, so a client holding only
              // the catalog credential never needs storage credentials
              // of its own. This backing store is a shared local
              // filesystem, which enforces no ACLs — the vend carries
              // the full contract (scope, expiry, per-load mint), the
              // enforcement would come from a real object store.
              val o = MetaJson.mapper.createObjectNode()
              o.put("version", v)
              ops.currentMetadataPath.foreach(p => o.put("metadata-location", p))
              // `?snapshots=refs` (open-api loadTable `snapshots` query
              // param): serve only the snapshots referenced by branches
              // or tags — clients in snapshot-loading-mode=refs load the
              // rest lazily. Default (`all` or absent) is the full list.
              val full = ops.current().get
              val served = if (refsMode) {
                val keep = full.refs.valuesIterator.map(_.snapshotId).toSet ++
                  full.currentSnapshotId
                full.copy(snapshots =
                  full.snapshots.filter(s => keep(s.snapshotId)))
              } else full
              o.set[com.fasterxml.jackson.databind.JsonNode]("metadata",
                MetaJson.mapper.readTree(MetaJson.writeMetadata(served)))
              val cfg = o.putObject("config")
              tableConfig.foreach { case (k, vv) => cfg.put(k, vv) }
              val wantsCreds = Option(
                x.getRequestHeaders.getFirst("X-Graft-Access-Delegation"))
                .exists(_.split(",").map(_.trim).contains("vended-credentials"))
              if (wantsCreds) {
                val cred = o.putArray("storage-credentials").addObject()
                cred.put("prefix", ops.location)
                val cc = cred.putObject("config")
                cc.put("token", java.util.UUID.randomUUID().toString)
                cc.put("expires-at-ms",
                  (System.currentTimeMillis() + credTtlMs).toString)
              }
              RestCatalogServer.tableLoadFull.incrementAndGet()
              x.getResponseHeaders.set("ETag", etag)
              json(x, 200, MetaJson.mapper.writeValueAsString(o))
              }
            }
          case ("GET", Array(ns, "tables", t, "credentials")) =>
            // open-api loadCredentials: refresh vended credentials
            // WITHOUT re-shipping the metadata document — the client
            // calls this when a vend expires mid-job (reference
            // LoadCredentialsResponse / ResourcePaths.credentials)
            val ops = new FileTableOps(backing.tableLocation(nsParts(ns), t))
            // same gate as the table-load vend: credentials are issued
            // only to clients that negotiated access delegation — the
            // two credential-vending surfaces must honor the same
            // contract, not one of them unconditionally
            val negotiated = Option(
              x.getRequestHeaders.getFirst("X-Graft-Access-Delegation"))
              .exists(_.split(",").map(_.trim).contains("vended-credentials"))
            if (ops.currentVersion() == 0)
              json(x, 404, s"""{"error": "no such table"}""")
            else if (!negotiated)
              json(x, 400, s"""{"error": "credentials require access delegation (X-Graft-Access-Delegation: vended-credentials)"}""")
            else {
              val o = MetaJson.mapper.createObjectNode()
              val cred = o.putArray("storage-credentials").addObject()
              cred.put("prefix", ops.location)
              val cc = cred.putObject("config")
              cc.put("token", java.util.UUID.randomUUID().toString)
              cc.put("expires-at-ms",
                (System.currentTimeMillis() + credTtlMs).toString)
              json(x, 200, MetaJson.mapper.writeValueAsString(o))
            }
          case ("POST", Array(ns, "tables", t, "commit")) =>
            val body = MetaJson.mapper.readTree(readBody(x))
            val base = body.get("base-version").asInt()
            val meta = MetaJson.readMetadata(
              MetaJson.mapper.writeValueAsString(body.get("metadata")))
            val ops = new FileTableOps(backing.tableLocation(nsParts(ns), t))
            // shares the transaction lock: a single-table commit must not
            // interleave with a multi-table verify-then-apply window
            val ok = txnLock.synchronized(ops.commit(base, meta))
            if (ok) json(x, 200, s"""{"version": ${base + 1}}""")
            else json(x, 409, s"""{"error": "commit conflict at base $base"}""")
          case ("POST", Array(ns, "tables", t)) =>
            // the SPEC's updateTable route (open-api updateTable,
            // CommitTableRequest): type-tagged requirements validated
            // against current metadata + action-tagged updates applied to
            // it — how a genuine Iceberg REST client commits. 409 on a
            // violated requirement or CAS loss, 404 on a plain update of
            // a missing table, 400 on unknown actions.
            val body = MetaJson.mapper.readTree(readBody(x))
            val loc = backing.tableLocation(nsParts(ns), t)
            val ops = new FileTableOps(loc)
            txnLock.synchronized {
              val cur = ops.current()
              val hasCreate = Option(body.get("requirements")).exists { arr =>
                var found = false
                arr.elements().forEachRemaining(r =>
                  if (r.get("type").asText() == "assert-create") found = true)
                found
              }
              if (cur.isEmpty && !hasCreate)
                json(x, 404, s"""{"error": "no such table"}""")
              else SpecUpdates.applyCommit(cur, body, loc) match {
                case Left(err) =>
                  json(x, 409, s"""{"error": ${MetaJson.mapper.writeValueAsString(err)}}""")
                case Right(m2) =>
                  if (ops.commit(ops.currentVersion(), m2))
                    json(x, 200, loadResultJson(ops))
                  else json(x, 409, s"""{"error": "commit conflict"}""")
              }
            }
          case ("POST", Array(ns, "tables")) =>
            // the SPEC's createTable route (open-api createTable,
            // CreateTableRequest: name, schema, partition-spec,
            // write-order, properties)
            val body = MetaJson.mapper.readTree(readBody(x))
            val name = body.get("name").asText()
            require(NamespaceProps.validName(name) && !name.startsWith("_"),
              s"invalid table name: $name")
            val nsSeq = nsParts(ns)
            val loc = backing.tableLocation(nsSeq, name)
            val schema = MetaJson.readSchema(body.get("schema"))
            val spec = Option(body.get("partition-spec")).filterNot(_.isNull)
              .map { pn =>
                if (pn.has("fields"))
                  PartitionSpec(
                    Option(pn.get("spec-id")).map(_.asInt()).getOrElse(0),
                    MetaJson.readSpecFields(pn.get("fields")))
                else PartitionSpec(0, MetaJson.readSpecFields(pn))
              }.getOrElse(PartitionSpec.Unpartitioned)
            val order = Option(body.get("write-order")).filterNot(_.isNull)
              .map(MetaJson.readSortOrder).getOrElse(SortOrder.Unsorted)
            val props = {
              val b = Map.newBuilder[String, String]
              Option(body.get("properties")).foreach(_.fields()
                .forEachRemaining(e => b += e.getKey -> e.getValue.asText()))
              b.result()
            }
            val m = SpecUpdates.emptyBase(loc).copy(
              // reserved property selects the spec version, as in
              // TableMetadata.newTable (default v2); bounds-checked HERE
              // — an out-of-range version would commit a document
              // readMetadata then rejects, leaving the table permanently
              // unloadable yet blocking re-creation
              formatVersion = props.get("format-version")
                .map { s =>
                  val v = s.toIntOption.getOrElse(
                    throw new IllegalArgumentException(
                      s"format-version must be an integer, got: $s"))
                  require(v >= 1 && v <= 4, s"unsupported format-version: $v")
                  v
                }.getOrElse(2),
              currentSchemaId = schema.schemaId, schemas = Seq(schema),
              lastColumnId = schema.highestFieldId,
              defaultSpecId = spec.specId, specs = Seq(spec),
              lastPartitionId =
                spec.fields.map(_.fieldId).maxOption.getOrElse(999),
              defaultSortOrderId = order.orderId, sortOrders = Seq(order),
              properties =
                if (props.contains("compatibility.format")) props
                else props + ("compatibility.format" -> "iceberg"))
            val ops = new FileTableOps(loc)
            if (txnLock.synchronized(ops.commit(0, m)))
              json(x, 200, loadResultJson(ops))
            else json(x, 409, s"""{"error": "table exists"}""")
          case ("POST", Array(ns, "register")) =>
            // the SPEC's register route (open-api registerTable): adopt a
            // table by its existing metadata-location, no data rewrite.
            // Same relocation + compat rules as the register_table
            // procedure: the adopted metadata's location becomes the NEW
            // table dir — without this, writeMetadata relativizes tracked
            // paths against the OLD location and the next read re-roots
            // them under the new (empty) dir; and a genuine Iceberg
            // source auto-enables compat so later commits keep the tree
            // externally readable
            val body = MetaJson.mapper.readTree(readBody(x))
            val name = body.get("name").asText()
            require(NamespaceProps.validName(name) && !name.startsWith("_"),
              s"invalid table name: $name")
            val mloc = body.get("metadata-location").asText()
            val srcJson = GraftIO.readString(mloc)
            val meta = MetaJson.readMetadata(srcJson, Some(mloc))
            val loc = backing.tableLocation(nsParts(ns), name)
            val rprops =
              if (MetaJson.isSpecDialect(srcJson) &&
                  !meta.properties.contains("compatibility.format"))
                meta.properties + ("compatibility.format" -> "iceberg")
              else meta.properties
            val ops = new FileTableOps(loc)
            if (txnLock.synchronized(
                ops.commit(0, meta.copy(location = loc, properties = rprops))))
              json(x, 200, loadResultJson(ops))
            else json(x, 409, s"""{"error": "table exists"}""")
          // ---- server-side scan planning (open-api planTableScan /
          // fetchPlanningResult / cancelPlanning / fetchScanTasks;
          // reference CatalogHandlers, RESTTableScan). The server runs
          // the full 3-layer pruning funnel and returns only surviving
          // FileScanTasks — a thin client at 100 TB never ships
          // manifests. Results chunk into opaque plan-tasks past
          // planPageSize; the X-Graft-Plan-Async header exercises the
          // spec's "submitted" + poll path deterministically.
          case ("POST", Array(ns, "tables", t, "plan")) =>
            val body = MetaJson.mapper.readTree(readBody(x))
            val ops = new FileTableOps(backing.tableLocation(nsParts(ns), t))
            if (ops.currentVersion() == 0)
              json(x, 404, s"""{"error": "no such table"}""")
            else if (Option(body.get("start-snapshot-id")).exists(!_.isNull))
              json(x, 400,
                s"""{"error": "incremental scan planning is not supported"}""")
            else {
              val table = new GTable(ops)
              val meta = table.refresh()
              // the full plan (funnel → chunk → serialize), run inline
              // for sync requests, on the planning pool for async ones
              def computeChunks(): IndexedSeq[String] = {
                val scan = table.newScan()
                Option(body.get("snapshot-id")).filterNot(_.isNull)
                  .foreach(sn => scan.useSnapshot(sn.asLong()))
                // time travel binds against the snapshot's write-time
                // schema (a renamed column resolves its OLD name);
                // case-sensitive defaults true per the spec
                if (Option(body.get("use-snapshot-schema"))
                    .exists(_.asBoolean(false))) scan.useSnapshotSchema()
                scan.caseSensitive(Option(body.get("case-sensitive"))
                  .forall(_.asBoolean(true)))
                Option(body.get("filter")).filterNot(_.isNull)
                  .foreach(f => scan.filter(SpecExpr.read(f)))
                val tasks = scan.planFiles()
                // stats-fields trims per-file column stats to the named
                // fields; absent → full stats (graft clients need bounds
                // for metadata-only aggregate pushdown). Names resolve
                // against the SAME schema the filter bound with — under
                // use-snapshot-schema the request spells OLD names
                val nameSchema = scan.snapshot()
                  .map(scan.planningSchema).getOrElse(meta.schema)
                val statsIds: Option[Set[Int]] =
                  Option(body.get("stats-fields")).filterNot(_.isNull).map { arr =>
                    val b = Set.newBuilder[Int]
                    arr.elements().forEachRemaining(fn =>
                      nameSchema.byName.get(fn.asText()).foreach(f => b += f.id))
                    b.result()
                  }
                val trimmed = statsIds match {
                  case None => tasks
                  case Some(keep) => tasks.map(ft => ft.copy(file = ft.file.copy(
                    columnStats = ft.file.columnStats.view
                      .filterKeys(keep).toMap)))
                }
                // chunks serialize INDEPENDENTLY and concurrently — a
                // 50k-task plan spends its time in JSON writes, and a
                // single handler thread would serialize them back-to-back
                val groups = trimmed.grouped(math.max(1, planPageSize))
                  .toIndexedSeq
                def ser(c: Seq[FileScanTask]): String =
                  MetaJson.mapper.writeValueAsString(
                    SpecScanTasks.writeTasks(c, meta))
                if (groups.isEmpty) IndexedSeq(ser(Nil))
                else if (groups.size == 1) IndexedSeq(ser(groups.head))
                else {
                  import scala.concurrent.{Await, Future}
                  import scala.concurrent.duration.Duration
                  // a DEDICATED pool: the client-side chunk FETCHES block
                  // planFetchEc threads on HTTP calls into this very
                  // server — sharing the pool would let an embedded
                  // client+server (tests, local mode) starve each other
                  implicit val ec: scala.concurrent.ExecutionContext =
                    RestCatalog.planSerializeEc
                  Await.result(
                    Future.traverse(groups)(g => Future(ser(g))), Duration.Inf)
                }
              }
              val async = Option(x.getRequestHeaders.getFirst("X-Graft-Plan-Async"))
                .exists(_.equalsIgnoreCase("true"))
              // async admission: in-flight plans are never evicted (their
              // ids must stay pollable), so a burst must be REFUSED, not
              // accumulated — 503 tells the client to retry or plan sync.
              // Atomic increment-then-check admits at most 64 even under
              // a concurrent burst; over-increments roll back.
              val admitted = !async || {
                if (inFlightPlans.incrementAndGet() > 64) {
                  inFlightPlans.decrementAndGet(); false
                } else true
              }
              if (!admitted) {
                json(x, 503, s"""{"error": "too many in-flight plans"}""")
              } else {
              val planId = java.util.UUID.randomUUID().toString
              val st = storePlan(planId, s"$ns/$t")
              if (async) {
                // REAL async: respond immediately, plan on the pool —
                // a huge-metadata plan must not pin an HTTP handler
                // thread (this is the contract the spec's submitted/poll
                // status path exists for)
                planExec.submit(new Runnable {
                  override def run(): Unit =
                    try st.chunks = computeChunks()
                    catch { case e: Throwable =>
                      st.error = Option(e.getMessage).getOrElse(e.toString) }
                    finally inFlightPlans.decrementAndGet()
                })
                json(x, 200, s"""{"status": "submitted", "plan-id": ${
                  MetaJson.mapper.writeValueAsString(planId)}}""")
              } else {
                try st.chunks = computeChunks()
                catch { case e: Throwable => plans.remove(planId); throw e }
                val o = completedPlanNode(planId, st.chunks)
                o.put("plan-id", planId)
                json(x, 200, MetaJson.mapper.writeValueAsString(o))
              }
              }
            }
          case ("GET", Array(ns, "tables", t, "plan", pid)) =>
            val st = plans.get(pid)
            // plan-ids are scoped to the table that created them: a
            // plan-id leaked across tables must not read (or cancel)
            // another table's results
            if (st == null || st.table != s"$ns/$t")
              json(x, 404, s"""{"error": "no such plan-id"}""")
            else { st.touch(); st.status match {
              case "submitted" =>
                json(x, 200, s"""{"status": "submitted"}""")
              case "failed" =>
                json(x, 200, s"""{"status": "failed", "error": ${
                  MetaJson.mapper.writeValueAsString(st.error)}}""")
              case _ =>
                json(x, 200, MetaJson.mapper.writeValueAsString(
                  completedPlanNode(pid, st.chunks)))
            } }
          case ("DELETE", Array(ns, "tables", t, "plan", pid)) =>
            // cancelPlanning: removing the state makes an in-flight
            // planner's result unreachable; its thread finishes into a
            // dropped object (planFiles has no interruption points worth
            // plumbing — metadata IO is bounded)
            val st = plans.get(pid)
            if (st == null || st.table != s"$ns/$t" || !plans.remove(pid, st))
              json(x, 404, s"""{"error": "no such plan-id"}""")
            else { x.sendResponseHeaders(204, -1); x.close() }
          case ("POST", Array(ns, "tables", t, "tasks")) =>
            val body = MetaJson.mapper.readTree(readBody(x))
            val pt = Option(body.get("plan-task")).filterNot(_.isNull)
              .map(_.asText()).getOrElse(
                throw new IllegalArgumentException("plan-task required"))
            val (pid, idx) = SpecScanTasks.parsePlanTask(pt)
            val st = plans.get(pid)
            val chunks =
              if (st == null || st.table != s"$ns/$t") null else st.chunks
            if (chunks == null || idx < 0 || idx >= chunks.size)
              json(x, 404, s"""{"error": "no such plan-task"}""")
            else { st.touch(); json(x, 200, chunks(idx)) }
          case ("POST", Array(ns, "tables", t, "metrics")) =>
            // validate at ingest: a stored non-JSON body would otherwise
            // poison every later GET of this table's ring
            val body = readBody(x)
            MetaJson.mapper.readTree(body)
            val ring = metrics.computeIfAbsent(s"$ns.$t",
              _ => new java.util.concurrent.ConcurrentLinkedDeque[String]())
            ring.addFirst(body)
            while (ring.size > 32) ring.pollLast()
            x.sendResponseHeaders(204, -1); x.close()
          case ("GET", Array(ns, "tables", t, "metrics")) =>
            val ring = metrics.get(s"$ns.$t")
            val n = if (ring == null) 0 else ring.size
            val o = MetaJson.mapper.createObjectNode()
            o.put("report-count", n)
            val arr = o.putArray("reports")
            if (ring != null) {
              val it = ring.iterator()
              var i = 0
              while (it.hasNext && i < 8) {
                arr.add(MetaJson.mapper.readTree(it.next())); i += 1
              }
            }
            json(x, 200, MetaJson.mapper.writeValueAsString(o))
          case ("DELETE", Array(ns, "tables", t)) =>
            // open-api purgeRequested: only an explicit purge deletes
            // data files; a plain drop removes just the table identity.
            // The name must not denote a NAMESPACE — a purge of a child
            // namespace addressed as a table would recursively delete
            // every table under it
            val purge = Option(x.getRequestURI.getQuery)
              .exists(_.contains("purgeRequested=true"))
            // the name must be warehouse-contained (a '..' segment would
            // make the purge walk-delete the warehouse) and must not
            // denote a NAMESPACE — marked OR merely live — whose purge
            // would recursively delete every table under it
            require(NamespaceProps.validName(t), s"invalid table name: $t")
            if (nsExists(nsParts(ns) :+ t))
              json(x, 404, s"""{"error": "$t is a namespace, not a table"}""")
            else if (backing.dropTable(nsParts(ns), t, purge))
              json(x, 200, "{}")
            else json(x, 404, s"""{"error": "no such table"}""")
          // view routes (reference open-api listViews / loadView /
          // createView / replaceView / dropView): documents are opaque
          // to the server and stored under the server's warehouse
          case ("GET", Array(ns, "views")) =>
            val d = java.nio.file.Paths.get(
              (warehouse +: nsParts(ns) :+ "_views").mkString("/"))
            val names =
              if (!java.nio.file.Files.isDirectory(d)) Nil
              else {
                val s = java.nio.file.Files.list(d)
                try {
                  val b = Seq.newBuilder[String]
                  s.iterator().forEachRemaining { p =>
                    val n = p.getFileName.toString
                    if (n.endsWith(".json")) b += n.stripSuffix(".json")
                  }
                  b.result().sorted
                } finally s.close()
              }
            val o = MetaJson.mapper.createObjectNode()
            val arr = o.putArray("identifiers")
            names.foreach(arr.add)
            json(x, 200, MetaJson.mapper.writeValueAsString(o))
          case ("GET", Array(ns, "views", v)) =>
            // LoadViewResult (open-api loadView): metadata-location +
            // the spec view-metadata document itself
            val p = (warehouse +: nsParts(ns) :+ "_views")
              .mkString("/") + s"/$v.json"
            if (!GraftIO.exists(p)) json(x, 404, s"""{"error": "no such view"}""")
            else {
              val o = MetaJson.mapper.createObjectNode()
              o.put("metadata-location", p)
              o.set[com.fasterxml.jackson.databind.JsonNode]("metadata",
                MetaJson.mapper.readTree(GraftIO.readString(p)))
              json(x, 200, MetaJson.mapper.writeValueAsString(o))
            }
          case ("HEAD", Array(ns, "views", v)) =>
            val p = (warehouse +: nsParts(ns) :+ "_views")
              .mkString("/") + s"/$v.json"
            x.sendResponseHeaders(if (GraftIO.exists(p)) 204 else 404, -1)
            x.close()
          case ("POST", Array(ns, "views")) =>
            // the SPEC's createView route (open-api CreateViewRequest:
            // name, schema, view-version, properties) — the server
            // assembles the full view-metadata document
            val body = MetaJson.mapper.readTree(readBody(x))
            val name = body.get("name").asText()
            require(NamespaceProps.validName(name) && !name.startsWith("_"),
              s"invalid view name: $name")
            val dir = (warehouse +: nsParts(ns) :+ "_views").mkString("/")
            val p = s"$dir/$name.json"
            // exists-check + write under the commit lock: concurrent
            // creates must 409, never silently overwrite each other
            txnLock.synchronized {
              if (GraftIO.exists(p)) json(x, 409, s"""{"error": "view exists"}""")
              else {
                val doc = SpecViewUpdates.fromCreateRequest(body,
                  backing.tableLocation(nsParts(ns), name))
                java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
                GraftIO.writeString(p, MetaJson.mapper.writeValueAsString(doc))
                val o = MetaJson.mapper.createObjectNode()
                o.put("metadata-location", p)
                o.set[com.fasterxml.jackson.databind.JsonNode]("metadata", doc)
                json(x, 200, MetaJson.mapper.writeValueAsString(o))
              }
            }
          case ("POST", Array(ns, "views", v)) =>
            val body = MetaJson.mapper.readTree(readBody(x))
            val dir = (warehouse +: nsParts(ns) :+ "_views").mkString("/")
            val p = s"$dir/$v.json"
            if (body.has("updates")) {
              // the SPEC's replaceView route (open-api CommitViewRequest:
              // assert-view-uuid requirements + view update actions) —
              // how a genuine Iceberg client evolves a view
              if (!GraftIO.exists(p)) json(x, 404, s"""{"error": "no such view"}""")
              else txnLock.synchronized {
                val cur = MetaJson.mapper.readTree(GraftIO.readString(p))
                  .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
                SpecViewUpdates.applyCommit(cur, body) match {
                  case Left(err) =>
                    json(x, 409, s"""{"error": ${MetaJson.mapper.writeValueAsString(err)}}""")
                  case Right(doc) =>
                    GraftIO.writeString(p, MetaJson.mapper.writeValueAsString(doc))
                    val o = MetaJson.mapper.createObjectNode()
                    o.put("metadata-location", p)
                    o.set[com.fasterxml.jackson.databind.JsonNode]("metadata", doc)
                    json(x, 200, MetaJson.mapper.writeValueAsString(o))
                }
              }
            } else {
              // graft's legacy whole-document store ({view, replace});
              // the SAME lock as the spec routes — a legacy create racing
              // another create (either shape) must 409, never clobber
              txnLock.synchronized {
                val replace = body.has("replace") && body.get("replace").asBoolean()
                if (!replace && GraftIO.exists(p))
                  json(x, 409, s"""{"error": "view exists"}""")
                else {
                  java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
                  GraftIO.writeString(p,
                    MetaJson.mapper.writeValueAsString(body.get("view")))
                  json(x, 200, "{}")
                }
              }
            }
          case ("DELETE", Array(ns, "views", v)) =>
            val p = (warehouse +: nsParts(ns) :+ "_views")
              .mkString("/") + s"/$v.json"
            if (!GraftIO.exists(p)) json(x, 404, s"""{"error": "no such view"}""")
            else { GraftIO.delete(p); json(x, 200, "{}") }
          case _ => json(x, 404, s"""{"error": "unknown route"}""")
        }
      } catch { case e: Throwable =>
        // HEAD responses must not carry a body (a malformed HEAD path,
        // e.g. a '..' level, lands here via nsParts' require)
        if (x.getRequestMethod == "HEAD") {
          x.sendResponseHeaders(400, -1); x.close()
        } else json(x, 400, errJson(e)) })

    // DAEMON threads only: the server must never pin the JVM open (the
    // dispatcher thread inherits daemon status from its creator, so
    // start() runs on a short-lived daemon thread)
    val tf = new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-rest-${n.incrementAndGet()}")
        t.setDaemon(true); t
      }
    }
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4, tf))
    val starter = new Thread(() => server.start(), "graft-rest-starter")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}")
  }

  private def errJson(e: Throwable): String =
    s"""{"error": ${MetaJson.mapper.writeValueAsString(String.valueOf(e.getMessage))}}"""
}

object RestHttp {
  lazy val client: HttpClient = HttpClient.newHttpClient()

  def get(url: String, headers: Map[String, String] = Map.empty): (Int, String) =
    send(withHeaders(HttpRequest.newBuilder(java.net.URI.create(url)).GET(), headers))

  /** GET that also surfaces the response's ETag header (open-api
    * loadTable If-None-Match / 304 conditional-load protocol) */
  def getWithEtag(url: String, headers: Map[String, String] = Map.empty)
      : (Int, String, Option[String]) = {
    val req = withHeaders(
      HttpRequest.newBuilder(java.net.URI.create(url)).GET(), headers)
    val r = client.send(req, HttpResponse.BodyHandlers.ofString())
    val etag = {
      val v = r.headers().firstValue("ETag")
      if (v.isPresent) Some(v.get) else None
    }
    (r.statusCode(), r.body(), etag)
  }

  def post(url: String, body: String,
      headers: Map[String, String] = Map.empty,
      timeoutMs: Long = 0): (Int, String) = {
    val b = HttpRequest.newBuilder(java.net.URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    if (timeoutMs > 0) b.timeout(java.time.Duration.ofMillis(timeoutMs))
    send(withHeaders(b, headers))
  }

  def head(url: String, headers: Map[String, String] = Map.empty): (Int, String) =
    send(withHeaders(HttpRequest.newBuilder(java.net.URI.create(url))
      .method("HEAD", HttpRequest.BodyPublishers.noBody()), headers))

  def delete(url: String, headers: Map[String, String] = Map.empty): (Int, String) =
    send(withHeaders(HttpRequest.newBuilder(java.net.URI.create(url)).DELETE(), headers))

  private def withHeaders(b: HttpRequest.Builder,
      headers: Map[String, String]): HttpRequest = {
    headers.foreach { case (k, v) => b.header(k, v) }
    b.build()
  }

  private def send(req: HttpRequest): (Int, String) = {
    val r = client.send(req, HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
}

/** OAuth2 auth session shared by every handle of one catalog connection
  * (reference core/.../rest/auth/OAuth2Util `AuthSession` — which
  * schedules a refresh at token expiration — wired through
  * RESTSessionCatalog). Graft refreshes on ACCESS instead of on a
  * daemon: `headers` re-exchanges the client credential once the token
  * has lived 80% of its advertised `expires_in`, so no request is ever
  * sent with a token inside its last 20% of life, and no refresh thread
  * outlives the catalog. Requests that still bounce 401 (revocation,
  * server restart, clock skew) retry once with a forced re-exchange via
  * [[RestCatalog.withAuthRetry]]. Credential-less sessions are inert. */
final class AuthSession(uri: String, credential: Option[(String, String)],
    // OAuth2 `scope`/`audience` on the token exchange (reference
    // OAuth2Util — clients default scope to "catalog"; audience rides
    // only when configured); only sent when a credential is
    scope: Option[String] = None,
    audience: Option[String] = None,
    // `oauth2-server-uri` (reference OAuth2Properties.OAUTH2_SERVER_URI):
    // a full token-endpoint URI when the IdP is NOT the catalog server —
    // absent, the exchange goes to the catalog's own /v1/oauth/tokens
    tokenUri: Option[String] = None) {
  @volatile private var tok: Option[String] = None
  @volatile private var refreshAtMs: Long = 0L

  /** exchange the credential for a fresh bearer token (client-credentials
    * grant); false when there is no credential to exchange */
  def refreshNow(): Boolean = synchronized {
    credential match {
      case None => false
      case Some((id, secret)) =>
        def enc(v: String) = java.net.URLEncoder.encode(v, "UTF-8")
        // bounded: headers (and thus this exchange) are evaluated on
        // the lone async metrics thread too — a hung token endpoint
        // must not wedge it forever
        val scopeParam = scope.map(sc => s"&scope=${enc(sc)}").getOrElse("") +
          audience.map(a => s"&audience=${enc(a)}").getOrElse("")
        val (code, resp) = RestHttp.post(
          tokenUri.getOrElse(s"$uri/v1/oauth/tokens"),
          s"grant_type=client_credentials&client_id=${enc(id)}" +
            s"&client_secret=${enc(secret)}$scopeParam",
          timeoutMs = 30000)
        require(code == 200, s"OAuth token exchange failed: $code $resp")
        val n = MetaJson.mapper.readTree(resp)
        tok = Some(n.get("access_token").asText())
        refreshAtMs = Option(n.get("expires_in")).filterNot(_.isNull)
          .map(_.asLong()) match {
          case Some(ttlSec) => System.currentTimeMillis() + ttlSec * 800L // 80%
          case None         => Long.MaxValue // non-expiring token
        }
        true
    }
  }

  /** current bearer token, proactively re-exchanged when stale */
  def token: Option[String] = {
    if (credential.isDefined &&
        (tok.isEmpty || System.currentTimeMillis() >= refreshAtMs))
      synchronized {
        if (tok.isEmpty || System.currentTimeMillis() >= refreshAtMs)
          refreshNow()
      }
    tok
  }

  def headers: Map[String, String] =
    token.map(t => "Authorization" -> s"Bearer $t").toMap
}

/** A storage credential vended by the catalog for one location prefix
  * (reference open-api StorageCredential): the client applies the
  * innermost matching prefix when opening files under it. */
final case class StorageCredential(prefix: String, config: Map[String, String]) {
  def expiresAtMs: Option[Long] = config.get("expires-at-ms").flatMap(_.toLongOption)
}

/** The `snapshot-loading-mode=refs` snapshot list (reference
  * RESTSessionCatalog SnapshotMode.REFS + TableMetadata's
  * snapshotsSupplier): built from the ref-reachable subset the server
  * returned, it PRESENTS the full list — any traversal (iterator,
  * length, serialization) forces one `snapshots=all` load, memoized.
  * `find` probes the subset first, so the hot lookups (current snapshot
  * / ref heads, by unique snapshot id) never force. Like the reference
  * supplier, a forced load observes the table's snapshots AT FORCE TIME;
  * a table that moved between the refs load and the force serves the
  * newer full list. */
final class LazySnapshots(subset: Seq[Snapshot], loadAll: () => Seq[Snapshot])
  extends scala.collection.immutable.Seq[Snapshot] with Serializable {
  // a throwing loader is NOT memoized (Scala lazy val retries after an
  // exception), so a transient load failure stays retryable
  lazy val all: Seq[Snapshot] = loadAll()
  def apply(i: Int): Snapshot = all(i)
  def length: Int = all.length
  def iterator: Iterator[Snapshot] = all.iterator
  override def isEmpty: Boolean = subset.isEmpty && all.isEmpty
  /** Snapshot ids are unique across the list, so a subset hit IS the
    * answer and never forces the full load — the hot lookups (current
    * snapshot, ref heads) stay lazy. Generic `find` deliberately has NO
    * subset fast path: Seq.find promises FIRST match in list order, and
    * probing the ref-reachable subset first would reorder matches for
    * non-unique predicates (e.g. a wap.id carried by both the staged
    * snapshot and its published cherry-pick) — those force the full
    * list via the default implementation. */
  def findById(id: Long): Option[Snapshot] =
    subset.find(_.snapshotId == id).orElse(all.find(_.snapshotId == id))
  /** Java serialization (a metadata captured in a Spark closure) must
    * not ship the HTTP loader: materialize instead */
  private def writeReplace(): Object = all.toVector
}

/** Client-side ops: the version/metadata pointer is the REST resource. */
final class RestTableOps(
    val location: String,
    uri: String,
    namespace: String,
    name: String,
    session: AuthSession = new AuthSession("", None),
    delegation: Boolean = false,
    specCommits: Boolean = false,
    // catalog-level rest-scan-planning=server: plan scans through the
    // server's planTableScan endpoints instead of reading manifests
    serverPlanning: Boolean = false,
    // endpoint negotiation (reference RESTSessionCatalog Endpoint): the
    // server's ConfigResponse advertised the plan routes — false means
    // the client silently plans locally, no error-path round-trips
    planAdvertised: Boolean = true,
    // snapshot-loading-mode (reference RESTCatalogProperties
    // SNAPSHOT_LOADING_MODE): "refs" loads only branch/tag-referenced
    // snapshots eagerly and the rest through a lazy one-shot supplier
    snapshotMode: String = "all",
    // the server advertises the loadCredentials route: expired vends
    // refresh through it instead of re-shipping the metadata document
    credsAdvertised: Boolean = true) extends TableOps {

  private def tableUrl = s"$uri/v1/namespaces/$namespace/tables/$name"
  /** run an authed request; one retry with a forced token re-exchange
    * when the server answers 401 (token revoked / server restarted) */
  private def req(f: Map[String, String] => (Int, String)): (Int, String) =
    RestCatalog.withAuthRetry(session)(s => f(s ++
      (if (delegation) Map("X-Graft-Access-Delegation" -> "vended-credentials")
       else Map.empty)))

  // captured from the last successful load; the overlay must be
  // distinguishable from the table's own stored properties so commit()
  // never writes it back
  @volatile private var lastConfig: Map[String, String] = Map.empty
  @volatile private var lastRawProps: Map[String, String] = Map.empty
  @volatile private var lastCreds: Seq[StorageCredential] = Nil

  /** server-controlled table config from the last load (empty before) */
  def serverConfig: Map[String, String] = lastConfig
  /** the `storage-credentials` array of a load/credentials response */
  private def parseCreds(
      n: com.fasterxml.jackson.databind.JsonNode): Seq[StorageCredential] =
    Option(n.get("storage-credentials")).map { arr =>
      val b = Seq.newBuilder[StorageCredential]
      arr.elements().forEachRemaining { c =>
        val cfg = Map.newBuilder[String, String]
        Option(c.get("config")).foreach(
          _.fields().forEachRemaining(e => cfg += e.getKey -> e.getValue.asText()))
        b += StorageCredential(c.get("prefix").asText(), cfg.result())
      }
      b.result()
    }.getOrElse(Nil)

  /** vended credentials; when any cached credential is past its
    * `expires-at-ms` it is refreshed — through the spec loadCredentials
    * endpoint when the server advertises it (open-api
    * `tables/{t}/credentials`: fresh vends WITHOUT re-shipping the
    * metadata document), else through a full-body table load (a 304 off
    * the ETag cache would carry no storage-credentials and leave the
    * expired vend in place). Empty unless the catalog connected with
    * access delegation. */
  def storageCredentials: Seq[StorageCredential] = {
    if (lastCreds.exists(_.expiresAtMs.exists(_ <= System.currentTimeMillis()))) {
      val viaEndpoint = credsAdvertised && {
        val (code, body) = req(RestHttp.get(s"$tableUrl/credentials", _))
        code == 200 && {
          val fresh = parseCreds(MetaJson.mapper.readTree(body))
          if (fresh.nonEmpty) lastCreds = fresh
          fresh.nonEmpty
        }
      }
      if (!viaEndpoint)
        load(forceFull = true) // refreshes lastCreds as a side effect
    }
    lastCreds
  }

  /** server-side planning is on when the catalog asked for it OR the
    * server advertises it per-table (open-api `scan-planning-mode`) —
    * and the server ADVERTISES the plan routes at all */
  def serverPlanningOn: Boolean = planAdvertised &&
    (serverPlanning || lastConfig.get("scan-planning-mode").contains("server"))

  /** Plan a snapshot scan through the server (open-api planTableScan +
    * fetchPlanningResult + fetchScanTasks; reference RESTTableScan):
    * POST the filter, poll while "submitted", then fetch every chunk.
    * `meta` types the wire values (partition tuples, stat bounds). */
  def planScan(snapshotId: Option[Long], filter: graft.core.expr.Expr,
      meta: TableMetadata, useSnapshotSchema: Boolean = false): Seq[FileScanTask] = {
    val req = MetaJson.mapper.createObjectNode()
    snapshotId.foreach(req.put("snapshot-id", _))
    // time travel binds under the snapshot's write-time schema (spec
    // use-snapshot-schema); graft resolves names case-insensitively
    // like Spark, so say so rather than inherit the spec's true default
    if (useSnapshotSchema) req.put("use-snapshot-schema", true)
    req.put("case-sensitive", false)
    if (filter != graft.core.expr.TrueE)
      req.set[com.fasterxml.jackson.databind.JsonNode]("filter",
        // lossy: shred preds widen to TRUE rather than failing the
        // request — the server prunes with the remaining conjuncts
        SpecExpr.writeLossy(filter))
    val (code, body) = this.req(h => RestHttp.post(s"$tableUrl/plan",
      MetaJson.mapper.writeValueAsString(req), h))
    require(code == 200, s"planTableScan failed: $code $body")
    var n = MetaJson.mapper.readTree(body)
    val planId = Option(n.get("plan-id")).map(_.asText())
    // poll the async path until the server reports a terminal status;
    // a plan over 100 TB of metadata can legitimately take minutes, so
    // the deadline is a table/catalog property, and the poll backs off
    // exponentially (50ms → 2s) instead of hammering a fixed 50ms
    val timeoutMs = lastConfig.get("rest.plan-poll-timeout-ms")
      .flatMap(_.toLongOption).getOrElse(120000L)
    var waitedMs = 0L
    var sleepMs = 50L
    while (n.get("status").asText() == "submitted") {
      require(waitedMs < timeoutMs,
        s"scan planning timed out after ${timeoutMs}ms " +
          "(raise rest.plan-poll-timeout-ms)")
      Thread.sleep(sleepMs); waitedMs += sleepMs
      sleepMs = Math.min(sleepMs * 2, 2000L)
      val id = planId.getOrElse(
        throw new IllegalStateException("submitted status without plan-id"))
      val (c2, b2) = this.req(RestHttp.get(s"$tableUrl/plan/$id", _))
      require(c2 == 200, s"fetchPlanningResult failed: $c2 $b2")
      n = MetaJson.mapper.readTree(b2)
    }
    val status = n.get("status").asText()
    require(status == "completed", s"scan planning $status: $n")
    val inline = SpecScanTasks.readTasks(n, meta)
    val chunked = Option(n.get("plan-tasks")).map { arr =>
      // a 100 TB plan shards into hundreds of plan-tasks: fetch them
      // CONCURRENTLY (bounded) — sequential round-trips would make
      // planning latency linear in metadata size, defeating the point
      // of server planning. Order is preserved per the returned array.
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pts = (0 until arr.size()).map(arr.get(_).asText())
      def fetch(pt: String): Seq[FileScanTask] = {
        // HARD timeout: the fetch pool is shared JVM-wide, so a hung
        // server must release its threads instead of starving every
        // other server-planned scan forever
        val (c3, b3) = this.req(h => RestHttp.post(s"$tableUrl/tasks",
          MetaJson.mapper.writeValueAsString(MetaJson.mapper.createObjectNode()
            .put("plan-task", pt)), h, timeoutMs = 120000L))
        require(c3 == 200, s"fetchScanTasks failed: $c3 $b3")
        SpecScanTasks.readTasks(MetaJson.mapper.readTree(b3), meta)
      }
      if (pts.size <= 1) pts.flatMap(fetch)
      else {
        implicit val ec: ExecutionContext = RestCatalog.planFetchEc
        Await.result(
          Future.traverse(pts)(pt => Future(fetch(pt))), Duration.Inf).flatten
      }
    }.getOrElse(Seq.empty)
    inline ++ chunked
  }

  /** the last load's (etag, version, parsed metadata): a repeat GET
    * sends If-None-Match and a 304 serves this without re-shipping or
    * re-parsing the metadata document (open-api loadTable ETag / 304) */
  @volatile private var etagCache: Option[(String, Int, TableMetadata)] = None
  /** status of the most recent non-200 load — diagnostic only (the lazy
    * snapshot force reports it so a dropped table (404) reads
    * differently from a transient outage (503)) */
  @volatile private var lastLoadStatus: Int = 0

  /** `forceFull` bypasses both the refs filter and the ETag cache — the
    * lazy-snapshot supplier and the vended-credential refresh need a
    * genuine full-body 200, never a 304 echo of stale state */
  private def load(forceFull: Boolean = false): Option[(Int, TableMetadata)] = {
    val refsMode = snapshotMode == "refs" && !forceFull
    val url = if (refsMode) s"$tableUrl?snapshots=refs" else tableUrl
    val cached = etagCache
    val condHeaders =
      if (forceFull) Map.empty[String, String]
      else cached.map(c => "If-None-Match" -> c._1).toMap
    var etag: Option[String] = None
    val (code, body) = req { h =>
      val (c, b, e) = RestHttp.getWithEtag(url, h ++ condHeaders)
      etag = e
      (c, b)
    }
    if (code == 304) cached.map(c => (c._2, c._3))
    else if (code != 200) { lastLoadStatus = code; etagCache = None; None }
    else {
      val n = MetaJson.mapper.readTree(body)
      lastConfig = Option(n.get("config")).map { c =>
        val b = Map.newBuilder[String, String]
        c.fields().forEachRemaining(e => b += e.getKey -> e.getValue.asText())
        b.result()
      }.getOrElse(Map.empty)
      lastCreds = parseCreds(n)
      val parsed = MetaJson.readMetadata(
        MetaJson.mapper.writeValueAsString(n.get("metadata")))
      // refs mode: the wire carried only branch/tag-referenced
      // snapshots; present the full list through a lazy supplier so
      // time travel to an unreferenced snapshot (and full-history ops
      // like expiry) transparently load it
      val meta =
        if (refsMode)
          parsed.copy(snapshots = new LazySnapshots(parsed.snapshots,
            // a failed full load must THROW, never default: lazy val
            // memoizes, and an empty history memoized off a transient
            // 503 would make a later expire-style commit derive a
            // metadata with zero snapshots — a corrupted table
            () => load(forceFull = true).map(_._2.snapshots.toVector)
              .getOrElse(throw new IllegalStateException(
                s"lazy snapshot load failed for $tableUrl " +
                  s"(HTTP $lastLoadStatus${
                    if (lastLoadStatus == 404) " — table no longer exists"
                    else ""})"))))
        else parsed
      lastRawProps = meta.properties
      val v = n.get("version").asInt()
      etag.foreach(e => etagCache = Some((e, v, meta)))
      Some((v, meta))
    }
  }

  override def currentVersion(): Int = load().map(_._1).getOrElse(0)

  /** one consistent (version, RAW metadata) snapshot — no server-config
    * overlay applied, so a transaction staging from it never needs the
    * commit-side overlay strip */
  def loadVersioned(): Option[(Int, TableMetadata)] = load()

  override def current(): Option[TableMetadata] = load().map { case (_, m) =>
    // the server's config OVERRIDES stored properties client-side
    // (reference LoadTableResponse: "configuration the client should
    // use"); never persisted — see the strip in commit()
    if (lastConfig.isEmpty) m else m.copy(properties = m.properties ++ lastConfig)
  }

  override def commit(baseVersion: Int, updated: TableMetadata): Boolean = {
    // strip the server-config overlay before it crosses the wire: a
    // load→modify→commit cycle must not launder the overlay into stored
    // properties. An entry the committer left at the overlay value maps
    // back to the table's OWN stored value (dropping it instead would
    // erase the stored property on every commit); entries the committer
    // changed, or that the stored properties already carried, pass as-is.
    val props = updated.properties.flatMap { case (k, v) =>
      if (!lastConfig.get(k).contains(v) || lastRawProps.get(k).contains(v))
        Some(k -> v)
      else lastRawProps.get(k).map(k -> _)
    }
    val clean = if (props == updated.properties) updated
      else updated.copy(properties = props)
    if (specCommits) {
      // the SPEC's commit protocol: derive typed requirements + update
      // actions from the base→updated diff and POST them to the spec
      // updateTable route — what lets this client commit against any
      // spec-conformant REST catalog, not just graft's server
      val baseMeta =
        if (baseVersion == 0) None
        // FULL load: the base diffed against must be ONE consistent
        // document. A refs-mode lazy list forced later (inside
        // deriveCommit) could observe a newer state than the version
        // checked here — a foreign STAGED snapshot added between the
        // two GETs would land in the remove-snapshots action while the
        // main-ref assert still passes: a lost update.
        else load(forceFull = true) match {
          case Some((v, m)) if v == baseVersion => Some(m)
          // the table moved past our base: deriving a diff against the
          // newer state would silently mis-target, so fail the CAS and
          // let the caller's retry loop re-plan
          case _ => return false
        }
      val body = SpecUpdates.deriveCommit(baseMeta, clean)
      val (code, _) = req(h => RestHttp.post(tableUrl,
        MetaJson.mapper.writeValueAsString(body), h))
      code == 200
    } else if (baseVersion == 0) {
      val (code, _) = req(h => RestHttp.post(s"$tableUrl/create", MetaJson.writeMetadata(clean), h))
      code == 200
    } else {
      val (code, _) = req(h => RestHttp.post(s"$tableUrl/commit",
        s"""{"base-version": $baseVersion, "metadata": ${MetaJson.writeMetadata(clean)}}""",
        h))
      code == 200
    }
  }
}

/** REST catalog client. The warehouse comes from the server's /v1/config,
  * so data/metadata paths agree between client and server (single shared
  * filesystem in this implementation, as with HadoopCatalog). */
final class RestCatalog private (warehouse: String, uri: String,
    session: AuthSession, delegation: Boolean,
    specCommits: Boolean = false,
    serverPlanning: Boolean = false,
    // ConfigResponse `endpoints`: None = classic server, everything
    // implied; Some = exactly these routes exist — unadvertised
    // families (plan/views/metrics) silently degrade client-side
    endpoints: Option[Set[String]] = None,
    // snapshot-loading-mode: "all" (default) or "refs" (lazy history)
    snapshotMode: String = "all")
  extends HadoopCatalog(warehouse) {

  private def advertised(family: String): Boolean =
    RestCatalog.advertisedIn(endpoints, family)
  private[meta] def viewsAdvertised: Boolean = advertised("/views")
  private[meta] def planAdvertised: Boolean = advertised("/plan")

  private def ns(namespace: Seq[String]): String = namespace.mkString(".")
  /** authed request with a single forced-refresh retry on 401 */
  private def req(f: Map[String, String] => (Int, String)): (Int, String) =
    RestCatalog.withAuthRetry(session)(f)

  private def ops(namespace: Seq[String], name: String): RestTableOps =
    new RestTableOps(tableLocation(namespace, name), uri, ns(namespace), name,
      session, delegation, specCommits, serverPlanning, planAdvertised,
      snapshotMode, advertised("/credentials"))

  /** Load the table's vended storage credentials (requires the catalog
    * to have been connected with access delegation). One fresh set per
    * call — credentials are per-load and expiring by design. */
  def storageCredentials(namespace: Seq[String], name: String): Seq[StorageCredential] = {
    val o = ops(namespace, name)
    if (o.currentVersion() == 0)
      throw new IllegalArgumentException(s"no such table: ${ns(namespace)}.$name")
    o.storageCredentials
  }

  override def createTable(namespace: Seq[String], name: String, schema: GSchema,
      spec: PartitionSpec = PartitionSpec.Unpartitioned,
      properties: Map[String, String] = Map.empty): GTable = {
    val o = ops(namespace, name)
    val meta = TableMetadata.newTable(o.location, schema, spec, properties)
    if (!o.commit(0, meta))
      throw new IllegalStateException(s"table already exists: ${ns(namespace)}.$name")
    new GTable(o)
  }

  override def loadTable(namespace: Seq[String], name: String): Option[GTable] = {
    val o = ops(namespace, name)
    if (o.currentVersion() > 0) Some(new GTable(o)) else None
  }

  override def tableOps(namespace: Seq[String], name: String): TableOps =
    ops(namespace, name)

  override def tableExists(namespace: Seq[String], name: String): Boolean =
    // HEAD probe: no metadata payload crosses the wire (reference spec
    // tableExists)
    req(RestHttp.head(s"$uri/v1/namespaces/${ns(namespace)}/tables/$name", _))._1 == 204

  override def dropTable(namespace: Seq[String], name: String): Boolean =
    dropTable(namespace, name, purge = true)

  // both arities route through the server (open-api purgeRequested
  // flag); never the base directory impl — file lifecycle is the
  // server's decision for a REST table
  override def dropTable(namespace: Seq[String], name: String,
      purge: Boolean): Boolean =
    req(RestHttp.delete(
      s"$uri/v1/namespaces/${ns(namespace)}/tables/$name" +
        (if (purge) "?purgeRequested=true" else ""), _))._1 == 200

  /** routes through the server's rename endpoint so capability (and the
    * atomic move itself) is decided server-side */
  override def renameTable(namespace: Seq[String], name: String,
      newNamespace: Seq[String], newName: String): Unit = {
    val body = MetaJson.mapper.createObjectNode()
    body.put("from", s"${ns(namespace)}.$name")
    body.put("to", s"${ns(newNamespace)}.$newName")
    val (code, resp) = req(h => RestHttp.post(s"$uri/v1/tables/rename",
      MetaJson.mapper.writeValueAsString(body), h))
    code match {
      case 200 => ()
      case 404 => throw new IllegalArgumentException(
        s"no such table: ${ns(namespace)}.$name ($resp)")
      case 409 => throw new IllegalStateException(
        s"table already exists: ${ns(newNamespace)}.$newName ($resp)")
      case _ => throw new UnsupportedOperationException(
        s"rename rejected by server: $resp")
    }
  }

  /** one table's contribution to a multi-table transaction */
  def commitTransaction(commits: Seq[RestCatalog.TableCommit]): Unit = {
    require(commits.nonEmpty, "empty transaction")
    val body = MetaJson.mapper.createObjectNode()
    val arr = body.putArray("table-commits")
    commits.foreach { c =>
      val o = arr.addObject()
      o.put("namespace", ns(c.namespace))
      o.put("name", c.name)
      o.put("base-version", c.baseVersion)
      o.set[com.fasterxml.jackson.databind.JsonNode]("metadata",
        MetaJson.mapper.readTree(MetaJson.writeMetadata(c.metadata)))
    }
    val (code, resp) = req(h => RestHttp.post(s"$uri/v1/transactions/commit",
      MetaJson.mapper.writeValueAsString(body), h))
    code match {
      case 200 => ()
      case 409 => throw new CommitConflictException(
        s"multi-table transaction conflict: $resp")
      case _ => throw new IllegalStateException(
        s"transaction rejected by server: $code $resp")
    }
  }

  /** Multi-table transaction (reference RESTCatalog.commitTransaction):
    * run `body` against staged copies of the named tables — every commit
    * inside lands in per-table buffers — then publish ALL buffers through
    * the server's atomic transaction endpoint. On conflict the body
    * re-runs against refreshed bases, like single-table transactions. */
  def transact[A](idents: Seq[(Seq[String], String)])(
      body: Seq[GTable] => A): A = {
    var attempts = 0
    val max = 20
    while (attempts < max) {
      val staged = idents.map { case (nsp, name) =>
        val o = ops(nsp, name)
        val (ver, meta) = o.loadVersioned().getOrElse(
          throw new IllegalArgumentException(s"no such table: ${ns(nsp)}.$name"))
        (nsp, name, ver, new StagedOps(o, meta))
      }
      val result =
        try body(staged.map { case (_, _, _, so) => new GTable(so) })
        catch {
          case e: Throwable =>
            staged.foreach(_._4.cleanupStagedFiles()); throw e
        }
      val changed = staged.filter { case (_, _, _, so) => so.currentVersion() > 1 }
      if (changed.isEmpty) return result
      try {
        commitTransaction(changed.map { case (nsp, name, ver, so) =>
          RestCatalog.TableCommit(nsp, name, ver, so.stagedMeta) })
        return result
      } catch {
        case _: CommitConflictException =>
          staged.foreach(_._4.cleanupStagedFiles())
          attempts += 1
          val cap = math.min(200L, 4L << math.min(attempts, 6))
          Thread.sleep(
            java.util.concurrent.ThreadLocalRandom.current().nextLong(cap + 1))
        case e: Throwable =>
          // non-conflict server rejection: staged files must not leak
          staged.foreach(_._4.cleanupStagedFiles())
          throw e
      }
    }
    throw new CommitConflictException(
      s"multi-table transaction failed after $attempts attempts")
  }

  override def listTables(namespace: Seq[String]): Seq[String] = {
    // follow next-page-token until exhausted (reference RESTCatalog
    // paginated listing) so a namespace with many tables never needs one
    // giant response
    val out = Seq.newBuilder[String]
    var token = ""
    var more = true
    while (more) {
      val tok = if (token.isEmpty) ""
        else s"&pageToken=${java.net.URLEncoder.encode(token, "UTF-8")}"
      val (code, body) = req(RestHttp.get(
        s"$uri/v1/namespaces/${ns(namespace)}/tables?pageSize=100$tok", _))
      if (code != 200) return out.result()
      val n = MetaJson.mapper.readTree(body)
      n.get("identifiers").elements().forEachRemaining(e => out += e.asText())
      val next = Option(n.get("next-page-token")).map(_.asText()).getOrElse("")
      more = next.nonEmpty
      token = next
    }
    out.result()
  }

  // ------------------------------------------------------------- views
  // view documents over the REST protocol (reference RESTCatalog
  // implements ViewCatalog + open-api view routes): the server stores
  // opaque documents, so views never depend on a filesystem the client
  // shares with the server

  def listViewNames(namespace: Seq[String]): Seq[String] = {
    if (!viewsAdvertised) return Nil // negotiated away: no round-trip
    val (code, body) = req(RestHttp.get(
      s"$uri/v1/namespaces/${ns(namespace)}/views", _))
    if (code != 200) Nil
    else {
      val out = Seq.newBuilder[String]
      MetaJson.mapper.readTree(body).get("identifiers").elements()
        .forEachRemaining(e => out += e.asText())
      out.result()
    }
  }

  def loadViewDoc(namespace: Seq[String], name: String): Option[String] = {
    if (!viewsAdvertised) return None // negotiated away: no round-trip
    val (code, body) = req(RestHttp.get(
      s"$uri/v1/namespaces/${ns(namespace)}/views/$name", _))
    if (code != 200) None
    else {
      // LoadViewResult wraps the document in `metadata` (spec loadView);
      // older graft servers served the raw document — accept both
      val n = MetaJson.mapper.readTree(body)
      Option(n.get("metadata")).filterNot(_.isNull)
        .map(MetaJson.mapper.writeValueAsString)
        .orElse(Some(body))
    }
  }

  /** store a view document; IllegalStateException on 409 (exists) */
  def putViewDoc(namespace: Seq[String], name: String, doc: String,
      replace: Boolean): Unit = {
    if (!viewsAdvertised) throw new UnsupportedOperationException(
      "this REST catalog server does not advertise view endpoints")
    val o = MetaJson.mapper.createObjectNode()
    o.put("replace", replace)
    o.set[com.fasterxml.jackson.databind.JsonNode]("view",
      MetaJson.mapper.readTree(doc))
    val (code, resp) = req(h => RestHttp.post(
      s"$uri/v1/namespaces/${ns(namespace)}/views/$name",
      MetaJson.mapper.writeValueAsString(o), h))
    code match {
      case 200 => ()
      case 409 => throw new IllegalStateException(
        s"view already exists: ${ns(namespace)}.$name")
      case _ => throw new IllegalArgumentException(
        s"view store rejected by server: $resp")
    }
  }

  def dropViewDoc(namespace: Seq[String], name: String): Boolean =
    viewsAdvertised &&
      req(RestHttp.delete(s"$uri/v1/namespaces/${ns(namespace)}/views/$name", _))._1 == 200
}

object RestCatalog {
  /** one table's buffered outcome inside a multi-table transaction
    * (reference core/.../rest/RESTCatalog.java commitTransaction +
    * open-api CommitTransactionRequest) */
  final case class TableCommit(namespace: Seq[String], name: String,
      baseVersion: Int, metadata: TableMetadata)

  /** shared bounded pool for concurrent plan-task fetches (daemon —
    * lives for the JVM instead of 8 threads created/torn down per
    * server-planned scan) */
  private[meta] lazy val planFetchEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(8, (r: Runnable) => {
        val t = new Thread(r, "graft-plan-fetch"); t.setDaemon(true); t
      }))

  /** server-side chunk SERIALIZATION pool — deliberately separate from
    * planFetchEc: fetch futures block on HTTP and must never be able to
    * queue ahead of the serialization work the server needs to answer
    * them (embedded client+server deadlock otherwise) */
  private[meta] lazy val planSerializeEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(8, (r: Runnable) => {
        val t = new Thread(r, "graft-plan-serialize"); t.setDaemon(true); t
      }))

  // fire-and-forget metrics posts: one daemon thread, bounded queue,
  // DROPS on overflow — reporting must never add latency to (or fail) a
  // scan or commit (reference RESTMetricsReporter is async the same way)
  private lazy val metricsExec = {
    val tf = new java.util.concurrent.ThreadFactory {
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, "graft-rest-metrics"); t.setDaemon(true); t
      }
    }
    new java.util.concurrent.ThreadPoolExecutor(1, 1, 30,
      java.util.concurrent.TimeUnit.SECONDS,
      new java.util.concurrent.ArrayBlockingQueue[Runnable](256), tf,
      new java.util.concurrent.ThreadPoolExecutor.DiscardPolicy)
  }
  // live metrics targets, uri -> (warehouse prefix, auth session).
  // connect() UPDATES the entry so a re-connect after server restart
  // posts with the fresh session, the session itself refreshes its
  // token over time (reports fire long after connect), and exactly ONE
  // global sink pair serves every uri (the sink count cannot grow with
  // the number of catalogs a JVM connects to)
  private val metricsTargets = new java.util.concurrent.ConcurrentHashMap[
    String, (String, AuthSession)]()
  private val metricsWired = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def postMetrics(uri: String, prefix: String,
      session: AuthSession, tableLocation: String, kind: String,
      fill: com.fasterxml.jackson.databind.node.ObjectNode => Unit): Unit = {
    val rel = tableLocation.stripPrefix(prefix).split("/").filter(_.nonEmpty)
    if (rel.length < 2) return
    val (ns, t) = (rel.init.mkString("."), rel.last)
    val o = MetaJson.mapper.createObjectNode()
    o.put("report-type", kind)
    fill(o)
    val body = MetaJson.mapper.writeValueAsString(o)
    metricsExec.execute(() =>
      // bounded timeout: a hung server must not wedge the lone metrics
      // thread (and thereby silently drop every later report)
      try RestHttp.post(s"$uri/v1/namespaces/$ns/tables/$t/metrics", body,
        session.headers, timeoutMs = 5000)
      catch { case _: Throwable => () })
  }

  /** register `uri` as a metrics target for tables under `warehouse`;
    * the global forwarders consult the registry at fire time */
  private def wireMetrics(uri: String, warehouse: String,
      session: AuthSession): Unit = {
    metricsTargets.put(uri, (warehouse.stripSuffix("/") + "/", session))
    if (!metricsWired.compareAndSet(false, true)) return
    ScanReports.addSink { r =>
      metricsTargets.forEach { (uri, v) =>
        if (r.tableLocation.startsWith(v._1))
          postMetrics(uri, v._1, v._2, r.tableLocation, "scan-report", { o =>
            o.put("snapshot-id", r.snapshotId)
            o.put("filter", r.filter)
            o.put("total-manifests", r.totalManifests)
            o.put("scanned-manifests", r.scannedManifests)
            o.put("total-data-files", r.totalDataFiles)
            o.put("result-tasks", r.resultTasks)
            o.put("result-delete-files", r.resultDeleteFiles)
            o.put("planning-ms", r.planningMs)
            o.put("distributed-planning", r.distributedPlanning)
          })
      }
    }
    CommitReports.addSink { r =>
      metricsTargets.forEach { (uri, v) =>
        if (r.tableLocation.startsWith(v._1))
          postMetrics(uri, v._1, v._2, r.tableLocation, "commit-report", { o =>
            o.put("snapshot-id", r.snapshotId)
            o.put("operation", r.operation)
            o.put("branch", r.branch)
            o.put("attempts", r.attempts)
            o.put("duration-ms", r.durationMs)
          })
      }
    }
  }

  /** Connect: optionally exchange an OAuth2 client credential
    * ("client-id:client-secret", reference RESTCatalog `credential`
    * property) for a bearer token, then fetch the warehouse from the
    * server config endpoint. */
  def connect(uri: String, credential: Option[String] = None,
      accessDelegation: Boolean = false,
      specCommits: Boolean = false,
      serverPlanning: Boolean = false,
      // OAuth2 scope on the token exchange; reference clients default
      // to "catalog" (OAuth2Util.SCOPE). `audience` rides only when set.
      scope: Option[String] = None,
      audience: Option[String] = None,
      // token-endpoint URI when the IdP is not the catalog server
      // (reference OAuth2Properties.OAUTH2_SERVER_URI)
      oauth2ServerUri: Option[String] = None,
      // "refs" = lazy snapshot history (reference snapshot-loading-mode)
      snapshotMode: String = "all"): RestCatalog = {
    val idSecret = credential.map { cred =>
      cred.split(":", 2) match {
        case Array(i, s) => (i, s)
        case _ => throw new IllegalArgumentException(
          "credential must be 'client-id:client-secret'")
      }
    }
    val session = new AuthSession(uri, idSecret,
      Some(scope.getOrElse("catalog")), audience, oauth2ServerUri)
    session.refreshNow() // fail fast on a bad credential, at connect time
    val (code, body) = withAuthRetry(session)(
      h => RestHttp.get(s"$uri/v1/config", h))
    require(code == 200, s"REST catalog config failed: $code $body")
    val cfg = MetaJson.mapper.readTree(body)
    val warehouse = cfg.get("warehouse").asText()
    // ConfigResponse `endpoints` (reference RESTSessionCatalog:175,229):
    // when present the server supports EXACTLY these routes; gate the
    // optional families on it instead of probing with 404 round-trips
    val endpoints: Option[Set[String]] =
      Option(cfg.get("endpoints")).filterNot(_.isNull).map { arr =>
        val b = Set.newBuilder[String]
        arr.elements().forEachRemaining(e => b += e.asText())
        b.result()
      }
    if (advertisedIn(endpoints, "/metrics"))
      wireMetrics(uri, warehouse, session)
    require(snapshotMode == "all" || snapshotMode == "refs",
      s"snapshot-loading-mode must be 'all' or 'refs', got '$snapshotMode'")
    new RestCatalog(warehouse, uri, session, accessDelegation, specCommits,
      serverPlanning, endpoints, snapshotMode)
  }

  /** ConfigResponse endpoint negotiation: None = classic server
    * (everything implied); Some = a route family is usable only when
    * some advertised route mentions it (reference RESTSessionCatalog
    * Endpoint). ONE predicate for connect-time gating (metrics wiring)
    * and instance-time gating (views/plan) so they can never diverge. */
  private[meta] def advertisedIn(endpoints: Option[Set[String]],
      family: String): Boolean =
    endpoints.forall(_.exists(_.contains(family)))

  /** Run an authed request; when the server still answers 401 (token
    * revoked, server restarted, clock skew past the proactive-refresh
    * margin) force one re-exchange of the client credential and retry
    * exactly once. Reference RESTSessionCatalog + OAuth2Util keep
    * sessions fresh the same way (scheduled refresh + re-auth). */
  def withAuthRetry(session: AuthSession)(
      f: Map[String, String] => (Int, String)): (Int, String) = {
    val first = f(session.headers)
    if (first._1 == 401 && session.refreshNow()) f(session.headers) else first
  }
}
