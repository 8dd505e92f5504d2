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
      // the identifier is either one backtick-quoted run (may contain
      // whitespace) or the first whitespace-delimited token; direction/
      // nulls tokens follow AFTER it, never inside it
      val (name, rest) =
        if (part.startsWith("`")) {
          val end = part.indexOf('`', 1)
          require(end > 0, s"unterminated backtick in sort order: $part")
          (part.substring(1, end), part.substring(end + 1))
        } else {
          val sp = part.indexWhere(_.isWhitespace)
          if (sp < 0) (part, "") else (part.substring(0, sp), part.substring(sp))
        }
      val tokens = rest.trim.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase)
      val asc = !tokens.headOption.contains("desc")
      val nullsFirst = tokens.sliding(2).collectFirst {
        case Array("nulls", "first") => true
        case Array("nulls", "last")  => false
      }.getOrElse(asc)
      Part(name, asc, nullsFirst)
    }

  /** exact match first, then UNIQUE case-insensitive: two columns
    * differing only by case must not resolve nondeterministically off a
    * hash-map walk */
  private def resolve(schema: GSchema, name: String) =
    schema.byName.getOrElse(name, {
      val ms = schema.byName.toSeq
        .filter(_._1.equalsIgnoreCase(name)).map(_._2).distinct
      ms match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"sort order: no such column: $name")
        case _ => throw new IllegalArgumentException(
          s"sort order: ambiguous column (case-insensitive): $name")
      }
    })

  /** resolve against the table schema → registered-order fields; throws
    * on unknown columns (DDL wants the loud failure) */
  def toSortFields(schema: GSchema, order: String): Seq[SortField] =
    parse(order).map { p =>
      val f = resolve(schema, p.colName)
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
