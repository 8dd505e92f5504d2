package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.expr.Expr
import graft.core.meta.HadoopCatalog
import graft.core.types._

/** v3 geometry/geography: WKB codec, bbox evaluators, type round-trips,
  * and end-to-end bbox-pruned scans (reference api/.../geospatial/,
  * format/spec.md:284-335, :770-774, Appendix G). */
class GeoSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-geo").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-geo")
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

  private def coreTable(name: String) =
    new HadoopCatalog(warehouse).loadTable(Seq("db"), name).get

  // ------------------------------------------------------------- WKB codec

  test("wkb point encode/decode round trip") {
    val wkb = WKB.encodePoint(30.5, -10.25)
    assert(WKB.decodePoint(wkb) === Some((30.5, -10.25)))
    assert(WKB.bbox(wkb) === Some(GeoBox(30.5, -10.25, 30.5, -10.25)))
  }

  test("wkb bbox: linestring, polygon, multipolygon, collection") {
    def le(kind: Int, body: java.nio.ByteBuffer => Unit, cap: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(cap).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(1.toByte).putInt(kind)
      body(buf)
      java.util.Arrays.copyOf(buf.array(), buf.position())
    }
    // linestring (1,1)-(4,5)
    val ls = le(2, b => { b.putInt(2); b.putDouble(1).putDouble(1).putDouble(4).putDouble(5) }, 64)
    assert(WKB.bbox(ls) === Some(GeoBox(1, 1, 4, 5)))
    // polygon, one ring (0,0) (10,0) (10,10) (0,0)
    val poly = le(3, b => {
      b.putInt(1); b.putInt(4)
      b.putDouble(0).putDouble(0); b.putDouble(10).putDouble(0)
      b.putDouble(10).putDouble(10); b.putDouble(0).putDouble(0)
    }, 96)
    assert(WKB.bbox(poly) === Some(GeoBox(0, 0, 10, 10)))
    // multipoint of two nested points
    val mp = le(4, b => {
      b.putInt(2)
      b.put(WKB.encodePoint(-3, 2)); b.put(WKB.encodePoint(7, -8))
    }, 64)
    assert(WKB.bbox(mp) === Some(GeoBox(-3, -8, 7, 2)))
    // geometrycollection(point, linestring)
    val gc = le(7, b => { b.putInt(2); b.put(WKB.encodePoint(100, 50)); b.put(ls) }, 96)
    assert(WKB.bbox(gc) === Some(GeoBox(1, 1, 100, 50)))
  }

  test("wkb bbox: big-endian, ISO Z, EWKB Z flag, NaN skip, garbage") {
    // big-endian point
    val be = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.BIG_ENDIAN)
    be.put(0.toByte).putInt(1).putDouble(2.5).putDouble(3.5)
    assert(WKB.bbox(be.array()) === Some(GeoBox(2.5, 3.5, 2.5, 3.5)))
    // ISO XYZ point (type 1001) — z ignored
    val isoZ = java.nio.ByteBuffer.allocate(29).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    isoZ.put(1.toByte).putInt(1001).putDouble(1).putDouble(2).putDouble(99)
    assert(WKB.bbox(isoZ.array()) === Some(GeoBox(1, 2, 1, 2)))
    // EWKB Z-flagged point
    val ewkbZ = java.nio.ByteBuffer.allocate(29).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ewkbZ.put(1.toByte).putInt(1 | 0x80000000).putDouble(4).putDouble(5).putDouble(99)
    assert(WKB.bbox(ewkbZ.array()) === Some(GeoBox(4, 5, 4, 5)))
    // POINT (1 NaN): X contributes, Y missing -> no bbox (spec :774)
    val nan = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    nan.put(1.toByte).putInt(1).putDouble(1).putDouble(Double.NaN)
    assert(WKB.bbox(nan.array()) === None)
    // not WKB
    assert(WKB.bbox(Array[Byte](9, 9, 9, 9, 9, 9)) === None)
    assert(WKB.bbox(Array.empty[Byte]) === None)
  }

  // ------------------------------------------------------- box evaluators

  test("bbox intersection: planar and antimeridian-wrapped geography") {
    val a = GeoBox(0, 0, 10, 10)
    assert(GeoBox.intersectsPlanar(a, GeoBox(5, 5, 15, 15)))
    assert(GeoBox.intersectsPlanar(a, GeoBox(10, 10, 20, 20))) // touching
    assert(!GeoBox.intersectsPlanar(a, GeoBox(11, 0, 20, 10)))
    assert(!GeoBox.intersectsPlanar(a, GeoBox(0, 11, 10, 20)))
    // geography: box [170,180]∪[-180,-170] crossing the antimeridian
    val wrap = GeoBox(170, -10, -170, 10)
    assert(GeoBox.intersectsGeography(wrap, GeoBox(175, -5, 179, 5)))
    assert(GeoBox.intersectsGeography(wrap, GeoBox(-179, -5, -175, 5)))
    assert(!GeoBox.intersectsGeography(wrap, GeoBox(0, -5, 10, 5)))
    assert(!GeoBox.intersectsGeography(wrap, GeoBox(175, 20, 179, 30))) // y misses
    assert(GeoBox.intersectsGeography(GeoBox(175, 0, 179, 1), wrap))
    assert(GeoBox.intersectsGeography(wrap, GeoBox(160, -10, -160, 10))) // both wrap
    // non-wrapped geography boxes behave exactly like planar
    assert(GeoBox.intersectsGeography(a, GeoBox(5, 5, 15, 15)))
    assert(!GeoBox.intersectsGeography(a, GeoBox(11, 0, 20, 10)))
  }

  // ------------------------------------------------------------ type names

  test("geometry/geography type-name round trips") {
    assert(SparkTypes.typeName(GGeometry()) === "geometry")
    assert(SparkTypes.typeName(GGeometry("srid:4326")) === "geometry(srid:4326)")
    assert(SparkTypes.typeName(GGeography()) === "geography")
    assert(SparkTypes.typeName(GGeography("srid:4326")) === "geography(srid:4326)")
    assert(SparkTypes.typeName(GGeography("srid:4326", "vincenty")) ===
      "geography(srid:4326, vincenty)")
    for (n <- Seq("geometry", "geometry(srid:4326)", "geography",
        "geography(srid:4326)", "geography(srid:4326, vincenty)"))
      assert(SparkTypes.typeName(SparkTypes.typeFromName(n)) === n)
    assert(SparkTypes.toSpark(GGeometry()) === org.apache.spark.sql.types.BinaryType)
    assert(SparkTypes.toSpark(GGeography()) === org.apache.spark.sql.types.BinaryType)
  }

  // ------------------------------------------------------------ end-to-end

  test("geo table: set_geo_type, bbox stats, pruned scan, st functions") {
    spark.sql("CREATE TABLE graft.db.geo (id BIGINT, geo BINARY)")
    spark.sql("CALL graft.system.set_geo_type('db.geo', 'geo', 'geometry')")
    assert(coreTable("geo").schema.findField("geo").get.tpe === GGeometry())

    // four appends -> four files, one per quadrant cluster
    for ((cx, cy, base) <- Seq((10, 10, 0), (-10, 10, 100), (-10, -10, 200), (10, -10, 300)))
      spark.sql(s"""INSERT INTO graft.db.geo
        SELECT CAST(id + $base AS BIGINT),
               graft.system.st_point(CAST($cx + id AS DOUBLE), CAST($cy - id AS DOUBLE))
        FROM range(0, 5, 1, 1)""")

    // bbox bounds landed in file stats
    val t = coreTable("geo")
    val geoId = t.schema.findField("geo").get.id
    val files = t.newScan().planFiles()
    assert(files.size === 4)
    val boxes = files.flatMap { ft =>
      val st = ft.file.fileStats.col(geoId)
      GeoBounds.boxOf(st.lower, st.upper)
    }
    assert(boxes.size === 4)
    assert(boxes.exists(b => b.xmin === 10.0 && b.xmax === 14.0 && b.ymin === 6.0 && b.ymax === 10.0))

    // file pruning through the core scan: NE-quadrant box keeps one file
    val pruned = t.newScan()
      .filter(Expr.stIntersects("geo", GeoBox(5, 5, 15, 15))).planFiles()
    assert(pruned.size === 1)

    // and through Spark SQL with pushdown: correct rows back
    val rows = spark.sql("""
      SELECT id, graft.system.st_x(geo) AS x, graft.system.st_y(geo) AS y
      FROM graft.db.geo
      WHERE graft.system.st_intersects_bbox(geo, 5.0D, 5.0D, 15.0D, 15.0D) = true
      ORDER BY id""").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    assert(rows.map(_.getDouble(1)).toSeq === Seq(10.0, 11.0, 12.0, 13.0, 14.0))
    assert(rows.map(_.getDouble(2)).toSeq === Seq(10.0, 9.0, 8.0, 7.0, 6.0))

    // a box intersecting nothing
    assert(spark.sql("""SELECT id FROM graft.db.geo
      WHERE graft.system.st_intersects_bbox(geo, 50.0D, 50.0D, 60.0D, 60.0D) = true""")
      .collect().isEmpty)
  }

  test("geography column: wrap-aware pruning on core scan") {
    spark.sql("CREATE TABLE graft.db.geog (id BIGINT, loc BINARY)")
    spark.sql(
      "CALL graft.system.set_geo_type('db.geog', 'loc', 'geography(OGC:CRS84, vincenty)')")
    assert(coreTable("geog").schema.findField("loc").get.tpe ===
      GGeography("OGC:CRS84", "vincenty"))

    // two files: one near the antimeridian's east side, one near Greenwich
    spark.sql("""INSERT INTO graft.db.geog SELECT CAST(id AS BIGINT),
      graft.system.st_point(CAST(175 + id AS DOUBLE), CAST(id AS DOUBLE)) FROM range(0, 4, 1, 1)""")
    spark.sql("""INSERT INTO graft.db.geog SELECT CAST(id + 10 AS BIGINT),
      graft.system.st_point(CAST(id AS DOUBLE), CAST(id AS DOUBLE)) FROM range(0, 4, 1, 1)""")

    val t = coreTable("geog")
    // wrapped query box [170,180]∪[-180,-170]: only the east file survives
    val pruned = t.newScan()
      .filter(Expr.stIntersects("loc", GeoBox(170, -90, -170, 90))).planFiles()
    assert(pruned.size === 1)
    // full sweep keeps both
    assert(t.newScan()
      .filter(Expr.stIntersects("loc", GeoBox(-180, -90, 180, 90))).planFiles().size === 2)

    // the SQL function agrees with the pruning layers on wrapped boxes:
    // pruning keeps the east file AND the row filter keeps its rows
    val rows = spark.sql("""SELECT id FROM graft.db.geog
      WHERE graft.system.st_intersects_bbox(loc, 170.0D, -90.0D, -170.0D, 90.0D) = true
      ORDER BY id""").collect().map(_.getLong(0)).toSeq
    assert(rows === Seq(0L, 1L, 2L, 3L))
  }

  test("set_geo_type rejects binary promotion on a table with data") {
    spark.sql("CREATE TABLE graft.db.geo_late (id BIGINT, b BINARY)")
    spark.sql("INSERT INTO graft.db.geo_late VALUES (1, X'0101000000')")
    // files written pre-promotion carry byte-order bounds a geo scan
    // would misread as bbox points — promotion must be refused
    intercept[Exception] {
      spark.sql("CALL graft.system.set_geo_type('db.geo_late', 'b', 'geometry')")
    }
  }
}
