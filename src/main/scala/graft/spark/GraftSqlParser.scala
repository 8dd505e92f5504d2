package graft.spark

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

import graft.core.meta.HadoopCatalog

/** SQL extension statements (reference IcebergSqlExtensions.g4): the
  * format-specific DDL Spark's grammar lacks, recognized ahead of the
  * delegate parser —
  *   ALTER TABLE t ADD PARTITION FIELD <transform> [AS name]
  *   ALTER TABLE t DROP PARTITION FIELD <name|transform>
  *   ALTER TABLE t REPLACE PARTITION FIELD <old> WITH <transform> [AS name]
  *   ALTER TABLE t SET IDENTIFIER FIELDS c1[, c2 ...]
  *   ALTER TABLE t DROP IDENTIFIER FIELDS [c1, ...]
  *   ALTER TABLE t WRITE ORDERED BY c1 [ASC|DESC][, ...]
  *   ALTER TABLE t WRITE LOCALLY ORDERED BY ...
  *   ALTER TABLE t WRITE DISTRIBUTED BY PARTITION [LOCALLY ORDERED BY ...]
  *   ALTER TABLE t WRITE UNORDERED
  *   ALTER TABLE t CREATE [OR REPLACE] BRANCH|TAG [IF NOT EXISTS] name
  *       [AS OF VERSION v] [RETAIN n DAYS|HOURS|MINUTES]
  *       [WITH SNAPSHOT RETENTION k SNAPSHOTS [n DAYS|HOURS|MINUTES]]
  *       (retention clauses are applied: they set ref max-age /
  *       min-snapshots-to-keep / max-snapshot-age on the branch/tag)
  *   ALTER TABLE t DROP BRANCH|TAG [IF EXISTS] name
  * Everything else falls through to Spark's parser. Statements execute as
  * driver-side commands on the same metadata ops the CALL procedures use.
  */
class GraftSqlParser(delegate: ParserInterface,
    session: Option[SparkSession] = None) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan = {
    val plan = GraftDdl.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))
    // catalog-stored SQL UDTFs expand at parse time (Spark 4 has no v2
    // table-function catalog ability; its resolver would reject the call
    // before any extension rule runs)
    val expanded =
      session.map(s => GraftUdfMacro.expandTableFunctions(s, plan)).getOrElse(plan)
    // view DDL on graft catalogs swaps at parse time too:
    // ResolveSessionCatalog rejects v2 view plans for non-session
    // catalogs before any extension rule could run (GraftViewDdl)
    session.map(s => GraftViewDdl.rewrite(s, expanded)).getOrElse(expanded)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}

object GraftDdl {

  // `ALTER TABLE <ident> <rest>` — rest matched per statement below
  private val Alter = """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+(.*?)\s*;?\s*""".r

  private val AddPartField =
    """(?is)ADD\s+PARTITION\s+FIELD\s+(.+?)(?:\s+AS\s+(\w+))?""".r
  private val DropPartField = """(?is)DROP\s+PARTITION\s+FIELD\s+(.+?)""".r
  private val ReplacePartField =
    """(?is)REPLACE\s+PARTITION\s+FIELD\s+(.+?)\s+WITH\s+(.+?)(?:\s+AS\s+(\w+))?""".r
  private val SetIdFields = """(?is)SET\s+IDENTIFIER\s+FIELDS\s+(.+?)""".r
  private val DropIdFields = """(?is)DROP\s+IDENTIFIER\s+FIELDS(\s+[\w`,\s]+)?""".r
  private val WriteOrdered = """(?is)WRITE\s+ORDERED\s+BY\s+(.+?)""".r
  private val WriteLocallyOrdered = """(?is)WRITE\s+LOCALLY\s+ORDERED\s+BY\s+(.+?)""".r
  private val WriteDistributed =
    """(?is)WRITE\s+DISTRIBUTED\s+BY\s+PARTITION(?:\s+LOCALLY\s+ORDERED\s+BY\s+(.+?))?""".r
  private val WriteUnordered = """(?is)WRITE\s+UNORDERED""".r
  private val CreateRef =
    """(?is)CREATE\s+(?:OR\s+REPLACE\s+)?(BRANCH|TAG)\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?((?:\s+RETAIN\b|\s+WITH\s+SNAPSHOT\s+RETENTION\b).*)?""".r
  private val RetainClause = """(?is).*RETAIN\s+(\d+)\s+(DAYS|HOURS|MINUTES).*""".r
  private val KeepSnapshots = """(?is).*SNAPSHOT\s+RETENTION\s+(\d+)\s+SNAPSHOTS.*""".r
  private val KeepSnapshotAge =
    """(?is).*SNAPSHOT\s+RETENTION\s+(?:\d+\s+SNAPSHOTS\s+)?(\d+)\s+(DAYS|HOURS|MINUTES).*""".r

  private def toMs(n: String, unit: String): Long = unit.toUpperCase match {
    case "DAYS"    => n.toLong * 24 * 3600 * 1000
    case "HOURS"   => n.toLong * 3600 * 1000
    case _         => n.toLong * 60 * 1000
  }
  private val DropRef =
    """(?is)DROP\s+(BRANCH|TAG)\s+(?:IF\s+EXISTS\s+)?(\w+)""".r

  /** DDL transform syntax → (core transform name, source column). */
  private[spark] def parseTransform(s: String): (String, String) = {
    val FnRe = """(?i)\s*(\w+)\s*\(\s*([^)]*)\s*\)\s*""".r
    s.trim match {
      case FnRe(fn, args) =>
        val as = args.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
        fn.toLowerCase match {
          case "bucket"                      => (s"bucket[${as(0)}]", as(1))
          case "truncate" if as(0).forall(_.isDigit) => (s"truncate[${as(0)}]", as(1))
          case "truncate"                    => (s"truncate[${as(1)}]", as(0))
          case "year" | "years"              => ("year", as(0))
          case "month" | "months"            => ("month", as(0))
          case "day" | "days" | "date"       => ("day", as(0))
          case "hour" | "hours" | "date_hour" => ("hour", as(0))
          case other => throw new IllegalArgumentException(s"unknown transform $other")
        }
      case col => ("identity", col.stripPrefix("`").stripSuffix("`"))
    }
  }

  def parse(sqlText: String): Option[LogicalPlan] = sqlText match {
    case Alter(ident, rest) =>
      val table = ident.replace("`", "")
      rest match {
        case AddPartField(tr, asName) =>
          val (t, c) = parseTransform(tr)
          Some(GraftDdlCommand(table, "add_partition_field",
            Seq(t, c, Option(asName).getOrElse(""))))
        case ReplacePartField(oldF, newF, asName) =>
          val (t, c) = parseTransform(newF)
          Some(GraftDdlCommand(table, "replace_partition_field",
            Seq(partFieldName(oldF), t, c, Option(asName).getOrElse(""))))
        case DropPartField(f) =>
          Some(GraftDdlCommand(table, "drop_partition_field", Seq(partFieldName(f))))
        case SetIdFields(cols) =>
          Some(GraftDdlCommand(table, "set_identifier_fields",
            Seq(cols.split(",").map(_.trim.replace("`", "")).mkString(","))))
        case DropIdFields(cols) =>
          Some(GraftDdlCommand(table, "drop_identifier_fields",
            Option(cols).map(_.trim.replace("`", "")).filter(_.nonEmpty).toSeq))
        case WriteOrdered(order) =>
          Some(GraftDdlCommand(table, "write_ordered", Seq("range", order.trim)))
        case WriteLocallyOrdered(order) =>
          Some(GraftDdlCommand(table, "write_ordered", Seq("", order.trim)))
        case WriteDistributed(order) =>
          Some(GraftDdlCommand(table, "write_ordered",
            Seq("hash", Option(order).map(_.trim).getOrElse(""))))
        case WriteUnordered() =>
          Some(GraftDdlCommand(table, "write_ordered", Seq("none", "")))
        case CreateRef(kind, name, ver, tail0) =>
          // grammar: [RETAIN n UNIT] [WITH SNAPSHOT RETENTION n SNAPSHOTS [n UNIT]]
          val tail = Option(tail0).getOrElse("")
          val splitAt = tail.toUpperCase.indexOf("WITH SNAPSHOT RETENTION")
          val (refPart, snapPart) =
            if (splitAt < 0) (tail, "") else tail.splitAt(splitAt)
          val maxRefAge = refPart match {
            case RetainClause(n, u) => toMs(n, u).toString
            case _                  => ""
          }
          val minKeep = snapPart match {
            case KeepSnapshots(n) => n
            case _                => ""
          }
          val maxSnapAge = snapPart match {
            case KeepSnapshotAge(n, u) => toMs(n, u).toString
            case _                     => ""
          }
          Some(GraftDdlCommand(table, s"create_${kind.toLowerCase}",
            Seq(name, Option(ver).getOrElse("-1"), maxRefAge, minKeep, maxSnapAge)))
        case DropRef(_, name) =>
          Some(GraftDdlCommand(table, "drop_ref", Seq(name)))
        case _ => None
      }
    case _ => None
  }

  /** DROP/REPLACE refer to a field by name OR by its transform spelling —
    * normalize the transform spelling to the generated field name. */
  private def partFieldName(s: String): String = {
    val t = s.trim
    if (!t.contains("(")) t.replace("`", "")
    else parseTransform(t) match {
      case ("identity", c)                     => c
      case (tr, c) if tr.startsWith("bucket")   => s"${c}_bucket"
      case (tr, c) if tr.startsWith("truncate") => s"${c}_trunc"
      case (tr, c)                              => s"${c}_$tr"
    }
  }
}

/** Driver-side execution of a parsed extension statement against the
  * graft catalog's metadata ops (same code paths as CALL procedures). */
final case class GraftDdlCommand(table: String, action: String, args: Seq[String])
  extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  private def resolve(spark: SparkSession): (HadoopCatalog, String) = {
    val cm = spark.sessionState.catalogManager
    val parts = table.split("\\.").toSeq
    val (cat, rest) = parts match {
      case Seq(c, r @ _*) if r.nonEmpty && cm.isCatalogRegistered(c) =>
        (cm.catalog(c), r)
      case _ => (cm.currentCatalog, parts)
    }
    cat match {
      case g: GraftCatalog => (g.core, rest.mkString("."))
      case other => throw new IllegalArgumentException(
        s"${other.name} is not a graft catalog (statement: $action)")
    }
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val (core, tbl) = resolve(spark)
    import GraftProcedures.s
    def call(proc: String, in: Array[Any]): Unit =
      new GraftProcedure(proc, core).call(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(in))
    def loadCore(name: String): graft.core.meta.GTable = {
      val parts = name.split("\\.").toSeq
      val (ns, t) = if (parts.length >= 2) (parts.init, parts.last)
                    else (Seq("db"), parts.head)
      core.loadTable(ns, t).getOrElse(
        throw new IllegalArgumentException(s"no such table: $name"))
    }
    action match {
      case "add_partition_field" =>
        call("add_partition_field", Array(s(tbl), s(args(0)), s(args(1)), s(args(2))))
      case "drop_partition_field" =>
        call("drop_partition_field", Array(s(tbl), s(args(0))))
      case "replace_partition_field" =>
        // pre-validate the ADD before committing the DROP so a bad
        // replacement can't leave the table missing its original field
        locally {
          val t = loadCore(tbl)
          val src = t.schema.findField(args(2)).getOrElse(
            throw new IllegalArgumentException(s"no such column: ${args(2)}"))
          val tr = graft.core.transform.Transform.fromName(args(1))
          require(tr.canTransform(src.tpe), s"${args(1)} cannot apply to ${src.tpe}")
        }
        call("drop_partition_field", Array(s(tbl), s(args(0))))
        call("add_partition_field", Array(s(tbl), s(args(1)), s(args(2)), s(args(3))))
      case "set_identifier_fields" =>
        call("set_identifier_fields", Array(s(tbl), s(args(0))))
      case "drop_identifier_fields" =>
        if (args.isEmpty) call("drop_identifier_fields", Array(s(tbl)))
        else {
          // drop ONLY the listed fields: recompute the remaining set
          val t = loadCore(tbl)
          val dropNames = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSet
          val remaining = t.schema.identifierFieldIds.toSeq.sorted
            .flatMap(id => t.schema.fields.find(_.id == id)).map(_.name)
            .filterNot(dropNames)
          if (remaining.isEmpty) call("drop_identifier_fields", Array(s(tbl)))
          else call("set_identifier_fields", Array(s(tbl), s(remaining.mkString(","))))
        }
      case "create_branch" | "create_tag" =>
        call(action, Array(s(tbl), s(args(0)), java.lang.Long.valueOf(args(1).toLong)))
        // retention clauses update the ref in place
        val (maxRefAge, minKeep, maxSnapAge) =
          (args.lift(2).filter(_.nonEmpty).map(_.toLong),
            args.lift(3).filter(_.nonEmpty).map(_.toInt),
            args.lift(4).filter(_.nonEmpty).map(_.toLong))
        if (maxRefAge.isDefined || minKeep.isDefined || maxSnapAge.isDefined) {
          val parts = tbl.split("\\.").toSeq
          val (ns, name) = if (parts.length >= 2) (parts.init, parts.last)
                           else (Seq("db"), parts.head)
          val t = core.loadTable(ns, name).get
          t.commitUpdate { base =>
            base.refs.get(args(0)) match {
              case Some(r) => base.copy(refs = base.refs.updated(args(0),
                r.copy(minSnapshotsToKeep = minKeep.orElse(r.minSnapshotsToKeep),
                  maxSnapshotAgeMs = maxSnapAge.orElse(r.maxSnapshotAgeMs),
                  maxRefAgeMs = maxRefAge.orElse(r.maxRefAgeMs))))
              case None => base
            }
          }
        }
      case "drop_ref" =>
        call("drop_ref", Array(s(tbl), s(args(0))))
      case "write_ordered" =>
        // WRITE [LOCALLY] ORDERED BY / DISTRIBUTED BY PARTITION / UNORDERED
        // → write.distribution-mode + write.sort-order table properties
        val parts = tbl.split("\\.").toSeq
        val (ns, name) = if (parts.length >= 2) (parts.init, parts.last)
                         else (Seq("db"), parts.head)
        val t = core.loadTable(ns, name).getOrElse(
          throw new IllegalArgumentException(s"no such table: $tbl"))
        val mode = args(0)
        val order = args(1)
        val props = Seq.newBuilder[(String, String)]
        if (mode.nonEmpty) props += ("write.distribution-mode" -> mode)
        props += ("write.sort-order" -> order)
        // the order is ALSO registered in table metadata (reference
        // SetWriteDistributionAndOrdering replaces the table sort
        // order): data files written under it then carry a truthful
        // sort_order_id. One transaction = one metadata CAS.
        val sortFields = SortSpecs.toSortFields(t.schema, order)
        t.transaction { st =>
          st.updateProperties(props.result().toMap)
          st.replaceSortOrder(sortFields)
        }
      case other => throw new IllegalArgumentException(other)
    }
    Nil
  }
}
