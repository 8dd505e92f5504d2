package graft.spark

import graft.core.meta.SortField
import graft.core.transform.IdentityT
import graft.core.types.GSchema

/** THE one parser for `"col [ASC|DESC] [NULLS FIRST|LAST], ..."` sort
  * strings (reference ExtendedParser sort-order grammar). Every consumer
  * — the WRITE ORDERED BY DDL, the write path's applied ordering, the
  * write-time sort_order_id stamp, and the sorted-rewrite stamp — parses
  * through here, so the id stamped on a data file can never describe a
  * different clustering than the one the write actually applied.
  * Column names resolve case-insensitively (Spark identifiers are) and
  * backticks strip; defaults follow the spec: ASC sorts nulls first,
  * DESC nulls last. */
object SortSpecs {

  final case class Part(colName: String, asc: Boolean, nullsFirst: Boolean)

  def parse(order: String): Seq[Part] =
    order.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { part =>
      val bits = part.split("\\s+")
      val name = bits(0).stripPrefix("`").stripSuffix("`")
      val tokens = bits.drop(1).map(_.toLowerCase)
      val asc = !tokens.headOption.contains("desc")
      val nullsFirst = tokens.sliding(2).collectFirst {
        case Array("nulls", "first") => true
        case Array("nulls", "last")  => false
      }.getOrElse(asc)
      Part(name, asc, nullsFirst)
    }

  /** resolve against the table schema → registered-order fields; throws
    * on unknown columns (DDL wants the loud failure) */
  def toSortFields(schema: GSchema, order: String): Seq[SortField] =
    parse(order).map { p =>
      val f = schema.byName.collectFirst {
        case (n, fld) if n.equalsIgnoreCase(p.colName) => fld
      }.getOrElse(throw new IllegalArgumentException(
        s"sort order: no such column: ${p.colName}"))
      SortField(f.id, IdentityT, p.asc, p.nullsFirst)
    }

  /** the registered table order `order` describes, if any — None when
    * the string doesn't parse/resolve or no order matches field-for-field
    * (an unmatched order must NOT stamp: the id is a foreign key) */
  def registeredOrderId(m: graft.core.meta.TableMetadata,
      order: String): Option[Int] =
    scala.util.Try(toSortFields(m.schema, order)).toOption
      .filter(_.nonEmpty)
      .flatMap(fs => m.sortOrders.find(o => o.fields == fs))
      .map(_.orderId)
}
