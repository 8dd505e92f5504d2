package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.expr.ColStats
import graft.core.meta.{MetricsConfig, MetricsMode, SortField, SortOrder, TableMetadata}
import graft.core.transform.IdentityT
import graft.core.types._

/** Metrics-mode policy (reference MetricsModes/MetricsConfig): parsing,
  * per-column resolution, inferred-default cutoff, and — the part that
  * can silently break pruning — bound-truncation validity: a truncated
  * lower must stay ≤ every value, a truncated upper ≥ every value,
  * under the exact comparators the metrics evaluators use. */
class MetricsModesSpec extends AnyFunSuite {
  import MetricsMode._

  private val schema = GSchema(GStruct(Seq(
    GField(1, "id", GLong, required = true),
    GField(2, "name", GString),
    GField(3, "payload", GBinary),
    GField(4, "qty", GInt))))

  private def cfg(props: Map[String, String], sorted: Set[Int] = Set.empty) =
    MetricsConfig.forSchema(schema, props, sorted)

  test("mode parsing") {
    assert(MetricsMode.parse("none") === NoMetrics)
    assert(MetricsMode.parse("counts") === Counts)
    assert(MetricsMode.parse("full") === Full)
    assert(MetricsMode.parse("truncate(16)") === Truncate(16))
    assert(MetricsMode.parse("TRUNCATE( 8 )") === Truncate(8))
    intercept[IllegalArgumentException](MetricsMode.parse("truncate(0)"))
    intercept[IllegalArgumentException](MetricsMode.parse("bogus"))
  }

  test("resolution: default, per-column override, inferred cutoff, sorted floor") {
    val c1 = cfg(Map.empty)
    assert(c1.mode(2) === Truncate(16)) // reference default
    val c2 = cfg(Map(
      "write.metadata.metrics.default" -> "counts",
      "write.metadata.metrics.column.name" -> "full"))
    assert(c2.mode(2) === Full)
    assert(c2.mode(1) === Counts)
    // only the first N leaves inherit the default; the rest collect nothing
    val c3 = cfg(Map("write.metadata.metrics.max-inferred-column-defaults" -> "2"))
    assert(c3.mode(1) === Truncate(16))
    assert(c3.mode(2) === Truncate(16))
    assert(c3.mode(3) === NoMetrics)
    // ...unless explicitly configured or a sort-order source
    val c4 = cfg(Map(
      "write.metadata.metrics.max-inferred-column-defaults" -> "2",
      "write.metadata.metrics.column.qty" -> "counts"), sorted = Set(3))
    assert(c4.mode(3) === Truncate(16)) // sorted floor past the cutoff
    assert(c4.mode(4) === Counts)
    // sorted columns keep truncate(16) under a weaker table default
    val c5 = cfg(Map("write.metadata.metrics.default" -> "none"), sorted = Set(2))
    assert(c5.mode(2) === Truncate(16))
    assert(c5.mode(1) === NoMetrics)
  }

  test("trim drops and truncates per mode") {
    val long = "abcdefghijklmnopqrstuvwxyz"
    val stats = Map(
      1 -> ColStats(Some(10L), Some(0L), None, Some(1L), Some(9L)),
      2 -> ColStats(Some(10L), Some(1L), None, Some(long), Some(long + "zz")),
      4 -> ColStats(Some(10L), Some(0L), None, Some(3), Some(7)))
    val c = cfg(Map(
      "write.metadata.metrics.default" -> "truncate(4)",
      "write.metadata.metrics.column.id" -> "none",
      "write.metadata.metrics.column.qty" -> "counts"))
    val out = c.trim(stats)
    assert(!out.contains(1))
    assert(out(4) === ColStats(Some(10L), Some(0L), None, None, None))
    assert(out(2).lower === Some("abcd"))
    assert(out(2).upper === Some("abce"))
    assert(out(2).valueCount === Some(10L)) // counts survive truncation
    // fixed-width types are never truncated
    val cInt = cfg(Map("write.metadata.metrics.default" -> "truncate(1)"))
    assert(cInt.trim(stats)(4).upper === Some(7))
  }

  private val c16 = cfg(Map.empty)

  // seeded random strings exercising multi-byte, surrogate-pair, and
  // max-code-point paths (same style as PruningPropertySpec)
  private def randomString(r: scala.util.Random): String = {
    val n = r.nextInt(41)
    val cps = Array.fill(n) {
      r.nextInt(13) match {
        case x if x < 8 => 32 + r.nextInt(95)
        case x if x < 10 =>
          var c = 0x80 + r.nextInt(0xFFFD - 0x80)
          if (c >= 0xD800 && c <= 0xDFFF) c = 0xE000 + (c - 0xD800)
          c
        case 10 => 0x10000 + r.nextInt(Character.MAX_CODE_POINT - 0x10000)
        case 11 => 0xFFFD
        case _  => Character.MAX_CODE_POINT
      }
    }
    new String(cps, 0, cps.length)
  }

  test("string truncation bound validity (property)") {
    val r = new scala.util.Random(42)
    for (_ <- 1 to 20000) {
      val s = randomString(r)
      val n = 1 + r.nextInt(8)
      val lo = c16.truncMinString(s, n)
      assert(lo.compareTo(s) <= 0, s"lo > s for ${s.toList}")
      c16.truncMaxString(s, n).foreach { hi =>
        assert(hi.compareTo(s) >= 0, s"hi < s for ${s.toList}")
        assert(hi.codePointCount(0, hi.length) <= n)
      }
    }
  }

  test("binary truncation bound validity (property)") {
    val r = new scala.util.Random(43)
    def ucmp(a: Array[Byte], b: Array[Byte]): Int =
      TypeComparators.compare(GBinary, a, b)
    for (_ <- 1 to 20000) {
      val b = Array.fill(r.nextInt(31))(
        (if (r.nextInt(5) == 0) 255 else r.nextInt(256)).toByte)
      val n = 1 + r.nextInt(8)
      assert(ucmp(c16.truncMinBinary(b, n), b) <= 0)
      c16.truncMaxBinary(b, n).foreach { hi =>
        assert(ucmp(hi, b) >= 0)
        assert(hi.length <= n)
      }
    }
  }

  test("all-0xFF binary and all-max-codepoint string drop the upper bound") {
    val ff = Array.fill(5)(0xff.toByte)
    assert(c16.truncMaxBinary(ff, 3) === None)
    val maxs = new String(Array.fill(5)(Character.MAX_CODE_POINT), 0, 5)
    assert(c16.truncMaxString(maxs, 3) === None)
  }

  test("forTable reads default sort order for the floor") {
    val meta = TableMetadata.newTable("/tmp/t-metrics", schema,
      graft.core.expr.PartitionSpec.Unpartitioned,
      Map("write.metadata.metrics.default" -> "counts"))
    val sorted = meta.copy(
      defaultSortOrderId = 1,
      sortOrders = Seq(SortOrder(1, Seq(SortField(2, IdentityT)))))
    val c = MetricsConfig.forTable(sorted)
    assert(c.mode(2) === Truncate(16))
    assert(c.mode(1) === Counts)
  }
}
