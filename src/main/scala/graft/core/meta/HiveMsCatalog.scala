package graft.core.meta

import java.util.UUID

import org.apache.hadoop.hive.conf.HiveConf
import org.apache.hadoop.hive.metastore.{HiveMetaStoreClient, IMetaStoreClient}
import org.apache.hadoop.hive.metastore.api._

import graft.core.expr.PartitionSpec
import graft.core.types._

/** Hive Metastore catalog (reference
  * hive-metastore/src/main/java/org/apache/iceberg/hive/HiveCatalog.java +
  * HiveTableOperations.java): the current-metadata POINTER lives in the
  * HMS table's `metadata_location` parameter — the convention every
  * HMS-fronted Iceberg deployment shares — while metadata and data files
  * stay under the table location exactly like the other catalogs.
  * Commit protocol (reference HiveTableOperations.doCommit): write the
  * new metadata document under a unique name, take an EXCLUSIVE HMS
  * table lock, re-read the table, verify `metadata_location` still
  * names the base version, alter_table to the new pointer, unlock.
  *
  * The client speaks thrift to a standalone metastore when `uri`
  * (thrift://host:port) is set; without one it runs the metastore
  * EMBEDDED over a local Derby database (the standard HMS local mode) —
  * how this sandbox tests the protocol without an HMS service. The HMS
  * lock API needs the metastore's transaction tables, which schematool
  * normally creates; [[HiveMs.ensureTxnSchema]] bootstraps them on an
  * embedded Derby so the REAL lock path runs in tests. If the lock API
  * is unavailable (bare metastore without txn schema), commits fall
  * back to a JVM-wide per-table mutex — safe for a single driver,
  * documented as weaker across drivers.
  *
  * HMS normalizes database/table names to lowercase; callers should use
  * lowercase identifiers (Spark already does).
  */
object HiveMs {

  /** one client per catalog, every call serialized (HiveMetaStoreClient
    * is not thread-safe). Every call SAVES AND RESTORES the thread's
    * context classloader: Hive code paths (HiveConf/ObjectStore/
    * UDFClassLoader plumbing) are known to swap — and sometimes close —
    * the context loader, which later breaks anything that resolves
    * classes through it (Spark's ClosureCleaner NPEs with a null
    * capturingClassReader; Spark's own HiveClientImpl does the same
    * save/restore around every Hive call for this reason). */
  final class Client(conf: HiveConf) {
    private def restoring[A](f: => A): A = {
      val t = Thread.currentThread()
      val saved = t.getContextClassLoader
      try f finally t.setContextClassLoader(saved)
    }
    private val c: IMetaStoreClient = restoring(new HiveMetaStoreClient(conf))
    def sync[A](f: IMetaStoreClient => A): A =
      synchronized(restoring(f(c)))
    /** the metastore's lock-expiry horizon — held locks heartbeat at
      * half this (reference MetastoreLock/HiveLockHeartbeat) */
    val txnTimeoutMs: Long = conf.getTimeVar(
      HiveConf.ConfVars.HIVE_TXN_TIMEOUT,
      java.util.concurrent.TimeUnit.MILLISECONDS)
    /** half the expiry horizon, floored; tests shrink it to observe
      * beats without booting a second embedded metastore (HMSHandler
      * keeps static per-JVM state, so one embedded metastore per JVM) */
    @volatile var heartbeatIntervalMs: Long = math.max(txnTimeoutMs / 2, 500L)
  }

  // one embedded client per Derby path, shared across catalog
  // initializations: concurrent first-boots would race the datanucleus
  // schema auto-create, N ObjectStores over one Derby buy nothing, and
  // HMSHandler keeps static per-JVM/per-thread state — one embedded
  // metastore per Derby, full stop. The client bakes
  // hive.metastore.warehouse.dir in, so a second catalog reusing the
  // same Derby path with a DIFFERENT warehouse fails loudly instead of
  // silently inheriting the first one's
  private val embedded =
    new java.util.concurrent.ConcurrentHashMap[String, (Client, String)]()

  /** Build a client. `uri` = thrift metastore; absent = embedded over
    * Derby at `dbPath` (created on first use). */
  def connect(uri: Option[String], dbPath: String,
      warehouseDir: String): Client = {
    def whDir(conf: HiveConf): Unit = conf.set("hive.metastore.warehouse.dir",
      if (warehouseDir.contains("://")) warehouseDir else s"file://$warehouseDir")
    uri match {
      case Some(u) =>
        val conf = new HiveConf()
        conf.set("hive.metastore.uris", u)
        whDir(conf)
        new Client(conf)
      case None =>
        val (client, wh) = embedded.computeIfAbsent(dbPath, _ => {
          // keep Derby's log next to the metastore db, not in the
          // process working directory. Best-effort: the property is
          // JVM-global and Derby reads it once at engine boot, so the
          // first embedded database to boot decides the location
          if (System.getProperty("derby.stream.error.file") == null)
            System.setProperty("derby.stream.error.file", s"$dbPath-derby.log")
          val conf = new HiveConf()
          conf.set("hive.metastore.uris", "")
          conf.set("javax.jdo.option.ConnectionURL",
            s"jdbc:derby:;databaseName=$dbPath;create=true")
          conf.set("javax.jdo.option.ConnectionDriverName",
            "org.apache.derby.jdbc.EmbeddedDriver")
          conf.set("hive.metastore.schema.verification", "false")
          conf.set("datanucleus.schema.autoCreateAll", "true")
          // the txn handler (lock API) needs a JDBC pool; DBCP ships
          // with Spark, BoneCP (the default) does not
          conf.set("datanucleus.connectionPoolingType", "DBCP")
          ensureTxnSchema(s"jdbc:derby:;databaseName=$dbPath;create=true")
          whDir(conf)
          (new Client(conf), warehouseDir)
        })
        // equivalent spellings (file:// scheme, trailing slash) are the
        // same warehouse — only a genuinely different location aborts
        def normWh(w: String): String =
          if (w.contains("://") && !w.startsWith("file:")) w.stripSuffix("/")
          else ("/" + w.stripPrefix("file:").dropWhile(_ == '/')).stripSuffix("/")
        require(normWh(wh) == normWh(warehouseDir),
          s"embedded metastore at $dbPath already serves warehouse $wh; " +
            s"cannot reopen it for $warehouseDir")
        client
    }
  }

  /** Transaction/lock tables for an EMBEDDED metastore (the subset of
    * hive-txn-schema-2.3.0.derby.sql the lock API touches — a real HMS
    * deployment already has them from schematool; datanucleus
    * auto-create only builds the JDO entities, not these raw-SQL
    * tables). Idempotent: Derby X0Y32 (exists) is ignored. */
  def ensureTxnSchema(jdbcUrl: String): Unit = {
    val ddl = Seq(
      """CREATE TABLE TXNS (
        TXN_ID bigint PRIMARY KEY, TXN_STATE char(1) NOT NULL,
        TXN_STARTED bigint NOT NULL, TXN_LAST_HEARTBEAT bigint NOT NULL,
        TXN_USER varchar(128) NOT NULL, TXN_HOST varchar(128) NOT NULL,
        TXN_AGENT_INFO varchar(128), TXN_META_INFO varchar(128),
        TXN_HEARTBEAT_COUNT integer)""",
      """CREATE TABLE TXN_COMPONENTS (
        TC_TXNID bigint NOT NULL, TC_DATABASE varchar(128) NOT NULL,
        TC_TABLE varchar(128), TC_PARTITION varchar(767),
        TC_OPERATION_TYPE char(1) NOT NULL)""",
      """CREATE TABLE COMPLETED_TXN_COMPONENTS (
        CTC_TXNID bigint NOT NULL, CTC_DATABASE varchar(128) NOT NULL,
        CTC_TABLE varchar(128), CTC_PARTITION varchar(767))""",
      "CREATE TABLE NEXT_TXN_ID (NTXN_NEXT bigint NOT NULL)",
      "INSERT INTO NEXT_TXN_ID VALUES(1)",
      """CREATE TABLE HIVE_LOCKS (
        HL_LOCK_EXT_ID bigint NOT NULL, HL_LOCK_INT_ID bigint NOT NULL,
        HL_TXNID bigint, HL_DB varchar(128) NOT NULL,
        HL_TABLE varchar(128), HL_PARTITION varchar(767),
        HL_LOCK_STATE char(1) NOT NULL, HL_LOCK_TYPE char(1) NOT NULL,
        HL_LAST_HEARTBEAT bigint NOT NULL, HL_ACQUIRED_AT bigint,
        HL_USER varchar(128) NOT NULL, HL_HOST varchar(128) NOT NULL,
        HL_HEARTBEAT_COUNT integer, HL_AGENT_INFO varchar(128),
        HL_BLOCKEDBY_EXT_ID bigint, HL_BLOCKEDBY_INT_ID bigint,
        PRIMARY KEY(HL_LOCK_EXT_ID, HL_LOCK_INT_ID))""",
      "CREATE TABLE NEXT_LOCK_ID (NL_NEXT bigint NOT NULL)",
      "INSERT INTO NEXT_LOCK_ID VALUES(1)",
      """CREATE TABLE COMPACTION_QUEUE (
        CQ_ID bigint PRIMARY KEY, CQ_DATABASE varchar(128) NOT NULL,
        CQ_TABLE varchar(128) NOT NULL, CQ_PARTITION varchar(767),
        CQ_STATE char(1) NOT NULL, CQ_TYPE char(1) NOT NULL,
        CQ_TBLPROPERTIES varchar(2048), CQ_WORKER_ID varchar(128),
        CQ_START bigint, CQ_RUN_AS varchar(128),
        CQ_HIGHEST_TXN_ID bigint, CQ_META_INFO varchar(2048) for bit data,
        CQ_HADOOP_JOB_ID varchar(32))""",
      "CREATE TABLE NEXT_COMPACTION_QUEUE_ID (NCQ_NEXT bigint NOT NULL)",
      "INSERT INTO NEXT_COMPACTION_QUEUE_ID VALUES(1)",
      """CREATE TABLE COMPLETED_COMPACTIONS (
        CC_ID bigint PRIMARY KEY, CC_DATABASE varchar(128) NOT NULL,
        CC_TABLE varchar(128) NOT NULL, CC_PARTITION varchar(767),
        CC_STATE char(1) NOT NULL, CC_TYPE char(1) NOT NULL,
        CC_TBLPROPERTIES varchar(2048), CC_WORKER_ID varchar(128),
        CC_START bigint, CC_END bigint, CC_RUN_AS varchar(128),
        CC_HIGHEST_TXN_ID bigint, CC_META_INFO varchar(2048) for bit data,
        CC_HADOOP_JOB_ID varchar(32))""",
      """CREATE TABLE AUX_TABLE (
        MT_KEY1 varchar(128) NOT NULL, MT_KEY2 bigint NOT NULL,
        MT_COMMENT varchar(255), PRIMARY KEY(MT_KEY1, MT_KEY2))""",
      """CREATE TABLE WRITE_SET (
        WS_DATABASE varchar(128) NOT NULL, WS_TABLE varchar(128) NOT NULL,
        WS_PARTITION varchar(767), WS_TXNID bigint NOT NULL,
        WS_COMMIT_ID bigint NOT NULL, WS_OPERATION_TYPE char(1) NOT NULL)""")
    val c = java.sql.DriverManager.getConnection(jdbcUrl)
    try {
      val st = c.createStatement()
      try ddl.foreach { sql =>
        try st.executeUpdate(sql)
        catch {
          case e: java.sql.SQLException
            if Option(e.getSQLState).contains("X0Y32") => () // exists
          // a second connection may be racing the same bootstrap; only
          // swallow the INSERT failure if the seed row actually exists —
          // a genuinely failed NEXT_*_ID seed would otherwise surface
          // later as an inscrutable lock-API failure
          case e: java.sql.SQLException if sql.startsWith("INSERT") =>
            val table = sql.split("\\s+")(2)
            // the probe can hit the same transient lock as the racing
            // INSERT — surface the ORIGINAL failure, never the probe's
            val seeded =
              try {
                val rs = st.executeQuery(s"SELECT COUNT(*) FROM $table")
                try rs.next() && rs.getLong(1) > 0 finally rs.close()
              } catch { case p: java.sql.SQLException =>
                e.addSuppressed(p); throw e
              }
            if (!seeded) throw e
        }
      } finally st.close()
    } finally c.close()
  }

  /** an HMS entry that is VIEW-shaped in ANY respect (reference
    * HiveOperationsBase.isValidIcebergView markers: tableType
    * VIRTUAL_VIEW, table_type=ICEBERG-VIEW). Views carry
    * `metadata_location` too, so the TABLE ops must not adopt them as
    * tables — this EXCLUSION predicate is deliberately the broad OR of
    * the markers, while [[isIcebergViewEntry]] (what the view store
    * serves) is the strict AND: an entry carrying only one marker is
    * neither table nor view rather than risking a view read as a table. */
  def isViewEntry(t: Table): Boolean =
    "VIRTUAL_VIEW".equalsIgnoreCase(t.getTableType) ||
      Option(t.getParameters).exists(p =>
        "ICEBERG-VIEW".equalsIgnoreCase(p.get("table_type")))

  /** a live Iceberg VIEW pointer entry: both reference markers plus the
    * metadata_location pointer (reference
    * HiveOperationsBase.isValidIcebergView) */
  def isIcebergViewEntry(t: Table): Boolean =
    "VIRTUAL_VIEW".equalsIgnoreCase(t.getTableType) &&
      Option(t.getParameters).exists(p =>
        "ICEBERG-VIEW".equalsIgnoreCase(p.get("table_type")) &&
          p.get("metadata_location") != null)

  /** "file:///abs" and "file:/abs" both normalize to "/abs" — a naive
    * stripPrefix("file:") would leave "///abs", splitting path-keyed
    * caches and prefix comparisons into two spellings */
  def plainPath(p: String): String =
    if (p.startsWith("file:")) "/" + p.stripPrefix("file:").dropWhile(_ == '/')
    else p

  /** graft type → HMS column type (informational: HMS shows the schema,
    * the authoritative one lives in the metadata document — reference
    * HiveSchemaUtil) */
  def hiveType(t: GType): String = t match {
    case GBoolean        => "boolean"
    case GInt            => "int"
    case GLong           => "bigint"
    case GFloat          => "float"
    case GDouble         => "double"
    case GDecimal(p, s)  => s"decimal($p,$s)"
    case GDate           => "date"
    case GTimestamp(_)   => "timestamp"
    case GString         => "string"
    case GBinary | GUuid => "binary"
    case _               => "string" // nested/exotic: display-only
  }
}

/** Metadata pointer in the HMS table's parameters; CAS = lock →
  * verify-base → alter_table → unlock. */
final class HiveTableOps(
    defaultLocation: String,
    hive: HiveMs.Client,
    db: String,
    name: String) extends TableOps {

  private val MetadataLocation = "metadata_location"
  private val PrevMetadataLocation = "previous_metadata_location"
  private val VersionKey = "graft.version"

  private def getHmsTable: Option[Table] =
    try Some(hive.sync(_.getTable(db, name)))
    catch { case _: NoSuchObjectException => None }

  private def plainPath(p: String): String = HiveMs.plainPath(p)

  override lazy val location: String =
    getHmsTable.flatMap(t => Option(t.getSd).flatMap(sd =>
      Option(sd.getLocation))).map(plainPath)
      .getOrElse(defaultLocation)

  /** The (version, pointer) pair this thread's latest read observed.
    * `commit(baseVersion, …)` CASes on the POINTER recorded here for
    * `baseVersion` — the version number is bookkeeping for the generic
    * retry loops, but the pointer is the only key a FOREIGN engine
    * (reference Spark, Trino, Flink) honors: they commit by swapping
    * `metadata_location` and never touch `graft.version` (reference
    * HiveTableOperations.java:304-309 compares metadata locations).
    * Thread-local is sound because every commit path reads
    * currentVersion()/current() and commits on the same thread. */
  private val lastRead = new ThreadLocal[(Int, String)]

  /** Derive a version number for an HMS entry that lacks
    * `graft.version` — a genuine Iceberg table created by another
    * engine. Iceberg names documents `%05d-uuid.metadata.json` with the
    * counter from 0; graft names them `v{N}-uuid.metadata.json`.
    * Unparseable names degrade to 1: the CAS is on the pointer, so the
    * version number only needs to be positive and base-stable. */
  private def versionFromPath(p: String): Int = {
    val f = p.substring(p.lastIndexOf('/') + 1)
    val graftRe = """v(\d+)-.*""".r
    val icebergRe = """(\d+)-.*""".r
    f match {
      case graftRe(v)   => v.toIntOption.getOrElse(1)
      case icebergRe(v) => v.toIntOption.map(_ + 1).getOrElse(1)
      case _            => 1
    }
  }

  /** ONE HMS read → (version, pointer), recorded for this thread. Any
    * entry bearing a `metadata_location` is live (foreign-table
    * adoption — reference HiveTableOperations.java:183,206); the
    * version counter is seeded from the document name when the
    * graft-private parameter is absent. */
  private def readState(): Option[(Int, String)] = {
    val st = getHmsTable.filterNot(HiveMs.isViewEntry).flatMap { t =>
      Option(t.getParameters.get(MetadataLocation)).map(plainPath).map { p =>
        val v = Option(t.getParameters.get(VersionKey))
          .flatMap(_.toIntOption).filter(_ > 0)
          .getOrElse(versionFromPath(p))
        (v, p)
      }
    }
    st.foreach(lastRead.set)
    st
  }

  override def currentVersion(): Int = readState().map(_._1).getOrElse(0)

  override def currentMetadataPath: Option[String] = readState().map(_._2)

  override def current(): Option[TableMetadata] =
    readState().map { case (_, p) => FileTableOps.metaCache.get(p)(
      MetaJson.readMetadata(GraftIO.readString(p), Some(p))) }

  /** EXCLUSIVE HMS table lock around `f`, HEARTBEATED at half the
    * metastore's `hive.txn.timeout` while held so a slow commit (big
    * metadata write, stalled thrift round-trip) never loses the lock to
    * the expiry reaper (reference MetastoreLock + HiveLockHeartbeat);
    * falls back to a JVM-wide per-table mutex when the metastore lacks
    * the txn schema (reference HiveTableOperations acquires the same
    * lock through MetastoreLock/HiveLock). Visible to tests. */
  private[graft] def withTableLock[A](f: => A): A = {
    val lockId: Option[Long] =
      try {
        val comp = new LockComponent(LockType.EXCLUSIVE, LockLevel.TABLE, db)
        comp.setTablename(name)
        val req = new LockRequest(
          java.util.Collections.singletonList(comp),
          System.getProperty("user.name", "graft"), "localhost")
        var resp = hive.sync(_.lock(req))
        val deadline = System.currentTimeMillis() + 60000
        while (resp.getState == LockState.WAITING &&
            System.currentTimeMillis() < deadline) {
          Thread.sleep(50)
          resp = hive.sync(_.checkLock(resp.getLockid))
        }
        if (resp.getState == LockState.ACQUIRED) Some(resp.getLockid)
        else {
          try hive.sync(_.unlock(resp.getLockid)) catch { case _: Throwable => () }
          // CONTENTION (another committer holds the lock past our
          // deadline): retryable — commit() maps this to a lost CAS
          throw new HiveTableOps.LockContention(
            s"could not acquire HMS lock on $db.$name: ${resp.getState}")
        }
      } catch {
        case e: HiveTableOps.LockContention => throw e
        // fall back ONLY when the metastore genuinely lacks the lock
        // machinery (no txn schema / no pool classes) — a TRANSIENT
        // thrift or database error must FAIL the commit attempt, not
        // silently downgrade to a single-JVM mutex while another driver
        // holds the real HMS lock (lost-update risk)
        case e: MetaException
          if Option(e.getMessage).exists(m =>
            // case-insensitive: Postgres/MySQL metastore backends fold
            // the missing table name to lowercase in the wrapped error
            m.toUpperCase.contains("NEXT_LOCK_ID") ||
              m.toUpperCase.contains("HIVE_LOCKS")) =>
          // the metastore names a missing LOCK TABLE: no txn schema.
          // (TxnHandler wraps EVERY SQLException in the same generic
          // "Unable to update transaction database" text, so matching
          // that alone would downgrade transient DB errors too.)
          None
        case _: NoClassDefFoundError | _: NoSuchMethodError => None
        case e: Throwable =>
          // hard failure (pre-ACID metastore, thrift error): FAIL FAST
          // with the real cause — commit() lets this propagate rather
          // than burning the caller's 20-attempt retry budget on it
          val ex = new CommitConflictException(
            s"HMS lock on $db.$name failed: $e")
          ex.initCause(e)
          throw ex
      }
    lockId match {
      case Some(id) =>
        // heartbeat(0, lockId) refreshes HL_LAST_HEARTBEAT without a
        // txn; a failed beat is retried at the next interval (the lock
        // survives one missed beat by construction: interval = timeout/2)
        val beating = new java.util.concurrent.atomic.AtomicBoolean(true)
        val interval = hive.heartbeatIntervalMs
        val hb = new Thread({ () =>
          var run = true
          while (run && beating.get()) {
            try Thread.sleep(interval)
            catch { case _: InterruptedException => run = false }
            if (run && beating.get())
              try hive.sync(_.heartbeat(0, id))
              catch { case _: Throwable => () }
          }
        }: Runnable, s"graft-hms-lock-heartbeat-$db.$name")
        hb.setDaemon(true)
        hb.start()
        try f finally {
          beating.set(false)
          hb.interrupt()
          try hive.sync(_.unlock(id)) catch { case _: Throwable => () }
        }
      case None =>
        HiveTableOps.jvmLocks
          .computeIfAbsent(s"$db.$name", _ => new Object)
          .synchronized(f)
    }
  }

  override def commit(baseVersion: Int, updated: TableMetadata): Boolean = {
    // the base POINTER this committer refreshed from — the CAS key. If
    // this thread's last read does not match baseVersion (a concurrent
    // commit moved the table between the caller's currentVersion() and
    // refresh()), the attempt is already stale: fail it for a retry.
    val basePtr: Option[String] =
      if (baseVersion == 0) None
      else Option(lastRead.get()).collect {
        case (v, p) if v == baseVersion => p
      } match {
        case some @ Some(_) => some
        case None           => return false
      }
    val metadataPath =
      s"$metadataDir/v${baseVersion + 1}-${UUID.randomUUID}.metadata.json"
    val prevPath = basePtr
    val (toWrite, expired) = prevPath match {
      case Some(p) =>
        val base =
          try FileTableOps.metaCache.get(p)(
            MetaJson.readMetadata(GraftIO.readString(p), Some(p)))
          catch { case _: Throwable => return false }
        MetadataLogs.advance(base, p, updated)
      case None => (updated, Nil)
    }
    GraftIO.writeString(metadataPath, MetaJson.writeMetadata(toWrite),
      GraftIO.metadataGzip(toWrite.properties))
    // lock CONTENTION (another committer held the lock past the wait
    // deadline) is a RETRYABLE lost attempt: returning false lets the
    // caller's refresh-and-retry loop handle it, and the !ok path below
    // reclaims the already-written metadata document. Hard lock-API
    // failures propagate as CommitConflictException with their cause —
    // retrying a pre-ACID metastore 20 times would stall for minutes
    // and then lose the root error.
    val ok = try withTableLock {
      if (baseVersion == 0) {
        if (getHmsTable.isDefined) false
        else {
          hive.sync(_.createTable(
            newHmsTable(toWrite, metadataPath)))
          true
        }
      } else getHmsTable match {
        case None => false
        case Some(t) =>
          // CAS on the metadata POINTER (reference
          // HiveTableOperations.java:304-309): a foreign engine's
          // commit swaps metadata_location without touching the
          // graft-private version counter, so comparing anything else
          // silently discards the foreign commit — a lost update.
          val ptr = Option(t.getParameters.get(MetadataLocation)).map(plainPath)
          if (ptr != basePtr) false
          else {
            t.getParameters.put(MetadataLocation, metadataPath)
            prevPath.foreach(t.getParameters.put(PrevMetadataLocation, _))
            // informational only (never the CAS key); also SEEDS the
            // counter on a table adopted from another engine
            t.getParameters.put(VersionKey, (baseVersion + 1).toString)
            // keep the HMS-visible schema current (reference refreshes
            // HMS columns on commit so SHOW in other engines is honest)
            val oldCols = new java.util.ArrayList[FieldSchema](t.getSd.getCols)
            t.getSd.setCols(hmsCols(toWrite.schema))
            try hive.sync(_.alter_table(db, name, t))
            catch {
              case e: InvalidOperationException
                if Option(e.getMessage).exists(
                  _.toLowerCase.contains("incompatible")) =>
                // a strict metastore (hive.metastore.disallow.
                // incompatible.col.type.changes=true, the 2.3 default)
                // rejects the COSMETIC column refresh when evolution
                // reuses a position with a new type (drop+add). The
                // pointer swap is the commit; keep the old visible
                // columns rather than failing the table's real state
                t.getSd.setCols(oldCols)
                hive.sync(_.alter_table(db, name, t))
            }
            true
          }
      }
    } catch {
      case _: HiveTableOps.LockContention => false
      case e: Throwable => GraftIO.delete(metadataPath); throw e
    }
    if (!ok) GraftIO.delete(metadataPath)
    else expired.foreach(p => try GraftIO.delete(p) catch { case _: Throwable => () })
    ok
  }

  private def hmsCols(schema: GSchema): java.util.List[FieldSchema] = {
    val l = new java.util.ArrayList[FieldSchema](schema.fields.size)
    schema.fields.foreach(f =>
      l.add(new FieldSchema(f.name.toLowerCase, HiveMs.hiveType(f.tpe), "")))
    l
  }

  private def newHmsTable(meta: TableMetadata, metadataPath: String): Table = {
    val sd = new StorageDescriptor()
    sd.setCols(hmsCols(meta.schema))
    sd.setLocation(
      if (location.contains("://")) location else s"file://$location")
    // the reference registers the Iceberg IO classes here; graft tables
    // are not Hive-readable row-by-row, so plain file formats suffice
    sd.setInputFormat("org.apache.hadoop.mapred.FileInputFormat")
    sd.setOutputFormat("org.apache.hadoop.mapred.FileOutputFormat")
    val serde = new SerDeInfo()
    serde.setSerializationLib(
      "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe")
    sd.setSerdeInfo(serde)
    val t = new Table()
    t.setDbName(db)
    t.setTableName(name)
    t.setTableType("EXTERNAL_TABLE")
    t.setSd(sd)
    val params = new java.util.HashMap[String, String]()
    params.put("EXTERNAL", "TRUE")
    params.put("table_type", "ICEBERG") // the marker every engine checks
    params.put(MetadataLocation, metadataPath)
    params.put(VersionKey, "1")
    t.setParameters(params)
    t
  }
}

object HiveTableOps {
  private[meta] val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  /** lock held by someone else past the wait deadline — retryable */
  private[meta] final class LockContention(msg: String)
    extends RuntimeException(msg)
}

/** Catalog front: databases are HMS databases (created on demand),
  * tables are HMS entries whose `metadata_location` points at graft
  * metadata documents under the warehouse. */
final class HiveMsCatalog(warehouse: String, val hive: HiveMs.Client)
  extends HadoopCatalog(warehouse) {

  private def ns(namespace: Seq[String]): String =
    namespace.mkString(".").toLowerCase

  private def ensureDb(db: String): Unit =
    try hive.sync(_.createDatabase(new Database(db, "",
      s"file://${warehouse.stripSuffix("/")}/$db", new java.util.HashMap())))
    catch { case _: AlreadyExistsException => () }

  /** mirror a created namespace into an HMS database. Best-effort and
    * single-level only: HMS databases are flat (no dots), and the
    * graft-side namespace is already created — a metastore hiccup must
    * not fail the statement that succeeded. */
  def ensureDatabase(namespace: Seq[String]): Unit =
    if (namespace.length == 1)
      try ensureDb(ns(namespace))
      catch { case scala.util.control.NonFatal(_) => () }

  /** every HMS database — foreign engines' included: the catalog's
    * namespace listing must show what SHOW DATABASES on the metastore
    * shows (reference HiveCatalog.listNamespaces) */
  def listHmsDatabases: Seq[String] =
    try {
      import scala.jdk.CollectionConverters._
      hive.sync(_.getAllDatabases).asScala.toSeq
    } catch { case scala.util.control.NonFatal(_) => Nil }

  /** a database exists in the metastore (regardless of any local
    * namespace marker) */
  def hmsDatabaseExists(db: String): Boolean =
    try { hive.sync(_.getDatabase(db.toLowerCase)); true }
    catch {
      case _: NoSuchObjectException => false
      case scala.util.control.NonFatal(_) => false
    }

  /** drop the mirrored HMS database, best-effort. A cascade drop removes
    * only ICEBERG-MARKED table entries and then drops the database
    * NON-cascade — a native Hive table sharing the database (which graft
    * never surfaced) blocks the database drop instead of being silently
    * destroyed. */
  def dropDatabase(namespace: Seq[String], cascade: Boolean): Unit =
    if (namespace.length == 1) try {
      val db = ns(namespace)
      if (cascade)
        listTables(namespace).foreach(t0 =>
          try hive.sync(_.dropTable(db, t0, false, true))
          catch { case scala.util.control.NonFatal(_) => () })
      hive.sync(_.dropDatabase(db, false, true, false))
    } catch {
      case e: InterruptedException =>
        Thread.currentThread().interrupt(); ()
      case scala.util.control.NonFatal(_) => ()
    }

  private def ops(namespace: Seq[String], name: String): HiveTableOps =
    new HiveTableOps(tableLocation(namespace, name), hive,
      ns(namespace), name.toLowerCase)

  override def createTable(namespace: Seq[String], name: String, schema: GSchema,
      spec: PartitionSpec = PartitionSpec.Unpartitioned,
      properties: Map[String, String] = Map.empty): GTable = {
    ensureDb(ns(namespace))
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

  override def tableOps(namespace: Seq[String], name: String): TableOps = {
    // staged CTAS/RTAS publish against version 0: the database must
    // already exist for the publishing commit's create_table
    ensureDb(ns(namespace))
    ops(namespace, name)
  }

  override def tableExists(namespace: Seq[String], name: String): Boolean =
    ops(namespace, name).currentVersion() > 0

  override def dropTable(namespace: Seq[String], name: String,
      purge: Boolean): Boolean = {
    val o = ops(namespace, name)
    if (o.currentVersion() == 0) false
    else {
      val loc = o.location
      // HMS must not touch the files (EXTERNAL): graft owns the purge
      hive.sync(_.dropTable(ns(namespace), name.toLowerCase, false, true))
      if (purge) GraftIO.deleteTree(loc)
      true
    }
  }

  override def listTables(namespace: Seq[String]): Seq[String] =
    try {
      import scala.jdk.CollectionConverters._
      val db = ns(namespace)
      val names = hive.sync(_.getAllTables(db)).asScala.toSeq
      if (names.isEmpty) Nil
      else
        // one batched fetch, then filter to Iceberg-marked entries — an
        // HMS database routinely mixes Hive-native tables in (reference
        // HiveCatalog.listTables does the same isIcebergTable filter)
        hive.sync(_.getTableObjectsByName(db, names.asJava)).asScala
          .filter(t => Option(t.getParameters)
            .exists(p => "ICEBERG".equalsIgnoreCase(p.get("table_type"))))
          .map(_.getTableName).toSeq.sorted
    } catch {
      // a missing database lists as empty; transient metastore errors
      // PROPAGATE — a silently-empty listing reads as data loss
      case _: NoSuchObjectException => Nil
      case e: MetaException
        if Option(e.getMessage).exists(_.contains("No such database")) => Nil
    }

  /** Rename = HMS alter_table with a new identity; the EXTERNAL location
    * (and every file) stays put — the pointer-catalog rename semantics
    * the directory catalog cannot give (reference HiveCatalog.renameTable). */
  override def renameTable(namespace: Seq[String], name: String,
      newNamespace: Seq[String], newName: String): Unit = {
    if (tableExists(newNamespace, newName))
      throw new IllegalStateException(
        s"table already exists: ${ns(newNamespace)}.$newName")
    val t = try hive.sync(_.getTable(ns(namespace), name.toLowerCase))
      catch {
        case _: NoSuchObjectException => throw new IllegalArgumentException(
          s"no such table: ${ns(namespace)}.$name")
      }
    if (HiveMs.isViewEntry(t))
      throw new IllegalArgumentException(
        s"${ns(namespace)}.$name is a view, not a table")
    ensureDb(ns(newNamespace))
    t.setDbName(ns(newNamespace))
    t.setTableName(newName.toLowerCase)
    hive.sync(_.alter_table(ns(namespace), name.toLowerCase, t))
  }
}
