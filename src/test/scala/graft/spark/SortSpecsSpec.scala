package graft.spark

import org.scalatest.funsuite.AnyFunSuite

import graft.core.meta.SortField
import graft.core.transform.IdentityT
import graft.core.types._

/** The one sort-order grammar (SortSpecs) feeding the WRITE ORDERED BY
  * DDL, the write path's applied ordering, and both sort_order_id stamp
  * sites. */
class SortSpecsSpec extends AnyFunSuite {

  private val schema = GSchema(GStruct(Seq(
    GField(1, "id", GLong),
    GField(2, "event time", GTimestamp(true)),
    GField(3, "CaseCol", GString),
    GField(4, "casecol", GString))))

  test("directions and NULLS tokens parse with spec defaults") {
    assert(SortSpecs.parse("id") ===
      Seq(SortSpecs.Part("id", asc = true, nullsFirst = true)))
    assert(SortSpecs.parse("id DESC") ===
      Seq(SortSpecs.Part("id", asc = false, nullsFirst = false)))
    assert(SortSpecs.parse("id ASC NULLS LAST") ===
      Seq(SortSpecs.Part("id", asc = true, nullsFirst = false)))
    assert(SortSpecs.parse("id DESC NULLS FIRST, id ASC") ===
      Seq(SortSpecs.Part("id", asc = false, nullsFirst = true),
        SortSpecs.Part("id", asc = true, nullsFirst = true)))
  }

  test("backtick-quoted identifiers may contain whitespace") {
    assert(SortSpecs.parse("`event time` DESC") ===
      Seq(SortSpecs.Part("event time", asc = false, nullsFirst = false)))
    assert(SortSpecs.toSortFields(schema, "`event time` DESC NULLS FIRST") ===
      Seq(SortField(2, IdentityT, ascending = false, nullsFirst = true)))
    intercept[IllegalArgumentException] {
      SortSpecs.parse("`unterminated DESC")
    }
  }

  test("exact match wins; case-insensitive fallback rejects ambiguity") {
    // exact: both casings resolve to their own field
    assert(SortSpecs.toSortFields(schema, "CaseCol").head.sourceId === 3)
    assert(SortSpecs.toSortFields(schema, "casecol").head.sourceId === 4)
    // no exact match and two case-insensitive candidates: loud failure,
    // never a hash-order winner
    val e = intercept[IllegalArgumentException] {
      SortSpecs.toSortFields(schema, "CASECOL")
    }
    assert(e.getMessage.contains("ambiguous"))
    // unique case-insensitive fallback resolves
    assert(SortSpecs.toSortFields(schema, "ID").head.sourceId === 1)
    intercept[IllegalArgumentException] {
      SortSpecs.toSortFields(schema, "nope")
    }
  }

  test("registeredOrderId matches field-for-field incl. null placement") {
    val order = graft.core.meta.SortOrder(2,
      Seq(SortField(1, IdentityT, ascending = true, nullsFirst = false)))
    val m0 = graft.core.meta.TableMetadata.newTable("/t", schema,
      graft.core.expr.PartitionSpec.Unpartitioned)
    val m = m0.copy(sortOrders = m0.sortOrders :+ order)
    assert(SortSpecs.registeredOrderId(m, "id ASC NULLS LAST") === Some(2))
    // different null placement is a DIFFERENT order: no stamp
    assert(SortSpecs.registeredOrderId(m, "id ASC") === None)
    assert(SortSpecs.registeredOrderId(m, "id DESC NULLS LAST") === None)
    assert(SortSpecs.registeredOrderId(m, "") === None)
    assert(SortSpecs.registeredOrderId(m, "nope ASC") === None)
  }
}
