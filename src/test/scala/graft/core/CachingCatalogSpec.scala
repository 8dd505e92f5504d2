package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta.{CachingCatalog, HadoopCatalog}
import graft.core.types.{GField, GLong, GSchema, GString, GStruct}

/** CachingCatalog (reference core/.../CachingCatalog.java): repeated
  * loads hit the cache (no pointer round-trip), writes through the
  * catalog invalidate eagerly, and the expiration window bounds how long
  * a foreign DROP can be masked. Foreign COMMITS are visible immediately
  * because loads hand out fresh handles over the cached ops. */
class CachingCatalogSpec extends AnyFunSuite {

  private val schema = GSchema(GStruct(Seq(
    GField(1, "id", GLong), GField(2, "v", GString))))

  test("repeated loads hit the cache; foreign commits stay visible") {
    val wh = Files.createTempDirectory("graft-cc").toString
    val underlying = new HadoopCatalog(wh)
    val cat = new CachingCatalog(underlying)
    cat.createTable(Seq("db"), "c1", schema)

    val h0 = cat.hits
    assert(cat.loadTable(Seq("db"), "c1").isDefined)
    assert(cat.loadTable(Seq("db"), "c1").isDefined)
    assert(cat.hits === h0 + 2, "createTable must seed the cache")

    // a commit through a FOREIGN handle (different catalog instance) is
    // visible through the cached load: fresh GTable, same pointer
    underlying.loadTable(Seq("db"), "c1").get
      .updateProperties(Map("k" -> "v"))
    assert(cat.loadTable(Seq("db"), "c1").get
      .meta.properties.get("k").contains("v"))
    assert(cat.hits === h0 + 3)
  }

  test("create/drop/rename through the catalog invalidate eagerly") {
    val wh = Files.createTempDirectory("graft-cc2").toString
    val cat = new CachingCatalog(new HadoopCatalog(wh))
    cat.createTable(Seq("db"), "c2", schema)
    assert(cat.tableExists(Seq("db"), "c2"))

    cat.renameTable(Seq("db"), "c2", Seq("db"), "c3")
    assert(!cat.tableExists(Seq("db"), "c2"))
    assert(cat.loadTable(Seq("db"), "c2").isEmpty)
    assert(cat.loadTable(Seq("db"), "c3").isDefined)

    assert(cat.dropTable(Seq("db"), "c3"))
    assert(cat.loadTable(Seq("db"), "c3").isEmpty)
    assert(!cat.tableExists(Seq("db"), "c3"))
  }

  test("the 3-arg drop DELEGATES to the underlying catalog") {
    // regression: without the override the purge-arity drop fell
    // through to the inherited DIRECTORY implementation — a plain DROP
    // TABLE through Spark deleted the metadata dir but left the
    // underlying catalog's pointer (HMS entry, JDBC row) dangling
    val wh = Files.createTempDirectory("graft-cc3").toString
    var sawPurge: Option[Boolean] = None
    val underlying = new HadoopCatalog(wh) {
      override def dropTable(namespace: Seq[String], name: String,
          purge: Boolean): Boolean = {
        sawPurge = Some(purge)
        super.dropTable(namespace, name, purge)
      }
    }
    val cat = new CachingCatalog(underlying)
    cat.createTable(Seq("db"), "c3", schema)
    assert(cat.dropTable(Seq("db"), "c3", purge = false))
    assert(sawPurge.contains(false),
      "the 3-arg drop must reach the UNDERLYING catalog, not the base dir impl")
    assert(!underlying.tableExists(Seq("db"), "c3"))
  }

  test("expiration bounds how long a foreign drop is masked") {
    val wh = Files.createTempDirectory("graft-cc3").toString
    val underlying = new HadoopCatalog(wh)
    val cat = new CachingCatalog(underlying, expirationMs = 150)
    cat.createTable(Seq("db"), "c4", schema)

    underlying.dropTable(Seq("db"), "c4")
    // inside the window the cached existence answers (documented bound)
    assert(cat.tableExists(Seq("db"), "c4"))
    Thread.sleep(200)
    // expired: the probe goes to the underlying catalog again
    assert(!cat.tableExists(Seq("db"), "c4"))
    assert(cat.loadTable(Seq("db"), "c4").isEmpty)
  }
}
