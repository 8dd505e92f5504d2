package graft.spark

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, CurrentNamespace, NoSuchViewException, UnresolvedFunction, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView, ViewAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{Attribute, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, CreateView, DescribeRelation, DropView, LogicalPlan, RenameTable, SetViewProperties, ShowCreateTable, ShowTableProperties, ShowViews, UnsetViewProperties}
import org.apache.spark.sql.catalyst.util.StringUtils
import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** SQL view DDL for graft catalogs (reference spark-extensions
  * analysis/RewriteViewCommands.scala:50-77 + CheckViews.scala +
  * ShowV2ViewsExec.scala): Spark 4 parses `CREATE [OR REPLACE] VIEW`,
  * `DROP VIEW`, `SHOW VIEWS` and `ALTER VIEW ... SET/UNSET TBLPROPERTIES`
  * into v2 logical plans but ResolveSessionCatalog REJECTS them for any
  * non-session catalog ("does not support views") in the same analyzer
  * batch — before an injected extension rule can run. So graft swaps the
  * plans at PARSE time (GraftSqlParser post-processes the delegate's
  * tree), the same reason the reference intercepts while identifiers are
  * still unresolved. The commands analyze the view query in run(), where
  * the full session resolution (graft relations, stored UDFs, other
  * views) is available. Temp-view targets keep Spark's own handling. */
object GraftViewDdl {

  /** root-plan rewrite, called from GraftSqlParser.parsePlan — view DDL
    * is always a root statement, so no tree walk */
  def rewrite(spark: SparkSession, plan: LogicalPlan): LogicalPlan = plan match {
    case cv: CreateView => cv.child match {
      case ui: UnresolvedIdentifier
          if !(ui.allowTemp && isTempView(spark, ui.nameParts)) =>
        graftIdent(spark, ui.nameParts) match {
          case Some((g, ident)) =>
            val sqlText = cv.originalText.getOrElse(
              throw new IllegalArgumentException(
                s"CREATE VIEW $ident requires a SQL query text"))
            CreateGraftViewCommand(g, ident, sqlText, cv.query,
              cv.userSpecifiedColumns, cv.comment, cv.properties,
              cv.allowExisting, cv.replace)
          case None => cv
        }
      case _ => cv
    }

    case dv @ DropView(ui: UnresolvedIdentifier, ifExists) =>
      if (ui.allowTemp && isTempView(spark, ui.nameParts)) dv
      else graftIdent(spark, ui.nameParts)
        .map { case (g, id) => DropGraftViewCommand(g, id, ifExists): LogicalPlan }
        .getOrElse(dv)

    case sv: ShowViews =>
      val target = sv.namespace match {
        case CurrentNamespace =>
          spark.sessionState.catalogManager.currentCatalog match {
            case g: GraftCatalog =>
              Some((g, spark.sessionState.catalogManager.currentNamespace.toSeq))
            case _ => None
          }
        case un: UnresolvedNamespace => graftNamespace(spark, un.multipartIdentifier)
        case _ => None
      }
      target.map { case (g, ns) =>
        ShowGraftViewsCommand(g, ns, sv.pattern, sv.output): LogicalPlan
      }.getOrElse(sv)

    case sp @ SetViewProperties(uv: UnresolvedView, props) =>
      existingGraftView(spark, uv).map { case (g, ident) =>
        AlterGraftViewCommand(g, ident,
          props.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) })
          : LogicalPlan
      }.getOrElse(sp)

    case up @ UnsetViewProperties(uv: UnresolvedView, keys, _) =>
      existingGraftView(spark, uv).map { case (g, ident) =>
        AlterGraftViewCommand(g, ident, keys.map(ViewChange.removeProperty))
          : LogicalPlan
      }.getOrElse(up)

    // ALTER VIEW ... AS query: a redefinition — appends a spec view
    // version, keeps the stored properties, resets the column list to
    // the new query's output (v1 session-catalog semantics)
    case av: AlterViewAs => av.child match {
      case uv: UnresolvedView =>
        existingGraftView(spark, uv).map { case (g, ident) =>
          AlterGraftViewAsCommand(g, ident, av.originalText, av.query)
            : LogicalPlan
        }.getOrElse(av)
      case _ => av
    }

    // SHOW CREATE TABLE on a graft VIEW renders its definition (Spark
    // only serves session-catalog views; tables keep Spark's handling)
    case sct: ShowCreateTable => sct.child match {
      case uv: UnresolvedTableOrView
          if !isTempView(spark, uv.multipartIdentifier) =>
        graftIdent(spark, uv.multipartIdentifier)
          .filter { case (g, ident) => g.viewExists(ident) }.map { case (g, ident) =>
          ShowCreateGraftViewCommand(g, ident, sct.output): LogicalPlan
        }.getOrElse(sct)
      case _ => sct
    }

    // DESCRIBE on a graft VIEW: Spark routes it through
    // UnresolvedTableOrView, which only the session catalog serves —
    // swap to a command that prints the stored schema + view detail
    // (the reference reaches the same surface through its v2-view
    // analyzer path). Tables keep Spark's handling.
    case dr: DescribeRelation => dr.relation match {
      case uv: UnresolvedTableOrView
          if !isTempView(spark, uv.multipartIdentifier) =>
        graftIdent(spark, uv.multipartIdentifier)
          .filter { case (g, ident) => g.viewExists(ident) }.map { case (g, ident) =>
          DescribeGraftViewCommand(g, ident, dr.isExtended, dr.output): LogicalPlan
        }.getOrElse(dr)
      case _ => dr
    }

    // DESCRIBE <view>.<column>: Spark's v1 shape (info_name/info_value
    // rows: col_name, data_type, comment)
    case dc: org.apache.spark.sql.catalyst.plans.logical.DescribeColumn =>
      dc.relation match {
        case uv: UnresolvedTableOrView
            if !isTempView(spark, uv.multipartIdentifier) =>
          val colParts = dc.column match {
            case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
              Some(a.nameParts)
            case _ => None
          }
          graftIdent(spark, uv.multipartIdentifier)
            .filter { case (g, ident) => g.viewExists(ident) }
            .flatMap { case (g, ident) => colParts.map(c =>
              DescribeGraftViewColumnCommand(g, ident, c, dc.output): LogicalPlan)
            }.getOrElse(dc)
        case _ => dc
      }

    // SHOW TBLPROPERTIES on a graft VIEW
    case stp: ShowTableProperties => stp.table match {
      case uv: UnresolvedTableOrView
          if !isTempView(spark, uv.multipartIdentifier) =>
        graftIdent(spark, uv.multipartIdentifier)
          .filter { case (g, ident) => g.viewExists(ident) }.map { case (g, ident) =>
          ShowGraftViewPropsCommand(g, ident, stp.propertyKey, stp.output): LogicalPlan
        }.getOrElse(stp)
      case _ => stp
    }

    // ALTER VIEW ... RENAME TO: moves the document within the catalog
    case rt: RenameTable if rt.isView => rt.child match {
      case uv: UnresolvedTableOrView
          if !isTempView(spark, uv.multipartIdentifier) =>
        graftIdent(spark, uv.multipartIdentifier)
          .filter { case (g, from) => g.viewExists(from) }
          .map { case (g, from) =>
            // the destination must land in the SAME catalog: bare names
            // resolve there, an explicit leading catalog must match —
            // a mismatching one would silently park the document in a
            // ghost namespace
            val cm = spark.sessionState.catalogManager
            val toParts = rt.newName match {
              case Seq(cat, rest @ _*) if rest.nonEmpty && cat == g.name => rest
              case Seq(cat, rest @ _*) if rest.nonEmpty &&
                  cm.isCatalogRegistered(cat) =>
                throw new IllegalArgumentException(
                  s"Cannot rename view ${g.name}.$from across catalogs " +
                    s"(destination names catalog $cat)")
              case parts => parts
            }
            val to = Identifier.of(
              if (toParts.size > 1) toParts.init.toArray else from.namespace,
              toParts.last)
            RenameGraftViewCommand(g, from, to): LogicalPlan
          }.getOrElse(rt)
      case _ => rt
    }

    case other => other
  }

  private[spark] def isTempView(spark: SparkSession, parts: Seq[String]): Boolean =
    spark.sessionState.catalogManager.v1SessionCatalog.isTempView(parts)

  /** nameParts → (graft catalog, identifier): leading part as a
    * registered catalog name, else the session's current catalog +
    * namespace — the resolution CatalogAndIdentifier applies. None when
    * the target is not a graft catalog. */
  private[spark] def graftIdent(spark: SparkSession,
      parts: Seq[String]): Option[(GraftCatalog, Identifier)] = {
    val cm = spark.sessionState.catalogManager
    val (catalogName, ident) = parts match {
      case Seq(cat, rest @ _*) if rest.nonEmpty && cm.isCatalogRegistered(cat) =>
        (cat, Identifier.of(rest.init.toArray, rest.last))
      case Seq(rest @ _*) if rest.nonEmpty =>
        (cm.currentCatalog.name,
          Identifier.of(cm.currentNamespace ++ rest.init, rest.last))
      case _ => return None
    }
    cm.catalog(catalogName) match {
      case g: GraftCatalog => Some((g, ident))
      case _ => None
    }
  }

  private def graftNamespace(spark: SparkSession,
      parts: Seq[String]): Option[(GraftCatalog, Seq[String])] = {
    val cm = spark.sessionState.catalogManager
    val (catalogName, ns) = parts match {
      case Seq(cat, rest @ _*) if cm.isCatalogRegistered(cat) => (cat, rest)
      case rest => (cm.currentCatalog.name, rest)
    }
    cm.catalog(catalogName) match {
      case g: GraftCatalog => Some((g, ns.toSeq))
      case _ => None
    }
  }

  private def existingGraftView(spark: SparkSession,
      uv: UnresolvedView): Option[(GraftCatalog, Identifier)] =
    if (uv.allowTemp && isTempView(spark, uv.multipartIdentifier)) None
    else graftIdent(spark, uv.multipartIdentifier)
      .filter { case (g, ident) => g.viewExists(ident) }

  /** Permanent views must not reference temp objects (reference
    * RewriteViewCommands.verifyTemporaryObjectsDontExist:130-175): the
    * stored SQL is re-parsed in LATER sessions where the temp
    * view/function no longer exists. CTE names are substituted away
    * first so `WITH t AS ... FROM t` never false-positives on a
    * same-named temp view. Also rejects direct self-reference, which
    * would make the read-side substitution loop until the analyzer's
    * fixpoint gives up (deeper create-time cycles can't form: the new
    * view's query must already resolve; reference CheckViews walks the
    * full graph — the direct case is the one a typo actually produces). */
  private[spark] def verifyNoTempObjects(spark: SparkSession,
      catalogName: String, ident: Identifier, query: LogicalPlan): Unit = {
    val q = CTESubstitution.apply(query)
    def collectTempViews(p: LogicalPlan): Seq[Seq[String]] =
      p.flatMap {
        case u: UnresolvedRelation
            if isTempView(spark, u.multipartIdentifier) =>
          Seq(u.multipartIdentifier)
        case other => other.expressions.flatMap(_.flatMap {
          case s: SubqueryExpression => collectTempViews(s.plan)
          case _ => Nil
        })
      }.distinct
    val tempViews = collectTempViews(q)
    if (tempViews.nonEmpty)
      throw new IllegalArgumentException(
        s"Cannot create view $catalogName.$ident that references " +
          s"temporary view(s): ${tempViews.map(_.mkString(".")).mkString(", ")}")
    val sessionCat = spark.sessionState.catalogManager.v1SessionCatalog
    def collectTempFns(p: LogicalPlan): Seq[String] =
      p.flatMap(_.expressions.flatMap(_.flatMap {
        case s: SubqueryExpression => collectTempFns(s.plan)
        case f: UnresolvedFunction if f.nameParts.size == 1 &&
            sessionCat.isTemporaryFunction(FunctionIdentifier(f.nameParts.head)) =>
          Seq(f.nameParts.head)
        case _ => Nil
      })).distinct
    val tempFns = collectTempFns(q)
    if (tempFns.nonEmpty)
      throw new IllegalArgumentException(
        s"Cannot create view $catalogName.$ident that references " +
          s"temporary function(s): ${tempFns.mkString(", ")}")
    val selfRefs = q.collect {
      case u: UnresolvedRelation
          if graftIdent(spark, u.multipartIdentifier).exists(_._2 == ident) => u
    }
    if (selfRefs.nonEmpty)
      throw new IllegalArgumentException(
        s"Cannot create view $catalogName.$ident that references itself")
  }

  /** Reject view reference CYCLES before committing a (re)definition
    * (reference CheckViews.checkCyclicViewReference): a REPLACE/ALTER of
    * `a` to read from `b` when `b` (transitively) reads from `a` would
    * make every later read loop until the analyzer's fixpoint gives up.
    * CREATE of a brand-new view can't cycle (its query must already
    * resolve), but redefinitions resolve against the OLD body — so the
    * graph is walked over the STORED SQL of every referenced view. */
  private[spark] def verifyNoCycles(spark: SparkSession, target: GraftCatalog,
      ident: Identifier, query: LogicalPlan): Unit = {
    val seen = scala.collection.mutable.Set.empty[(String, Identifier)]
    val budget = new java.util.concurrent.atomic.AtomicInteger(1000)
    def walk(q: LogicalPlan, path: Seq[String]): Unit = {
      val refs = CTESubstitution.apply(q).flatMap {
        case u: UnresolvedRelation => Seq(u.multipartIdentifier)
        case other => other.expressions.flatMap(_.flatMap {
          case s: SubqueryExpression =>
            CTESubstitution.apply(s.plan).collect {
              case u: UnresolvedRelation => u.multipartIdentifier
            }
          case _ => Nil
        })
      }.distinct
      refs.foreach { parts =>
        graftIdent(spark, parts).foreach { case (g, id) =>
          val here = s"${g.name}.${id.namespace.mkString(".")}.${id.name}"
          if ((g eq target) && id == ident)
            throw new IllegalArgumentException(
              s"Cannot alter view ${target.name}.$ident: cyclic view " +
                s"reference through ${(path :+ here).mkString(" -> ")}")
          if (seen.add((g.name, id))) {
            // REFUSE (don't silently pass) when the graph outgrows the
            // walk budget: an unverified commit could hide a cycle that
            // breaks every later read
            if (budget.decrementAndGet() < 0)
              throw new IllegalStateException(
                s"Cannot alter view ${target.name}.$ident: the view " +
                  "dependency graph exceeds the 1000-view cycle-check budget")
            val body = try Some(g.loadView(id).query())
              catch { case _: Exception => None } // a table, or missing
            body.foreach(sql =>
              walk(spark.sessionState.sqlParser.parsePlan(sql), path :+ here))
          }
        }
      }
    }
    walk(query, Nil)
  }
}

/** CREATE [OR REPLACE] VIEW against a graft ViewCatalog (reference
  * CreateV2ViewExec semantics): analyzes the query here — full session
  * resolution, including other graft views and stored UDFs — captures the
  * creation context (current catalog + namespace) so unqualified names in
  * the SQL resolve the same way forever, and stores the spec-shaped view
  * document through the ViewCatalog. */
final case class CreateGraftViewCommand(catalog: GraftCatalog,
    ident: Identifier, sqlText: String, query: LogicalPlan,
    userColumns: Seq[(String, Option[String])], comment: Option[String],
    props: Map[String, String], allowExisting: Boolean, replace: Boolean)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    GraftViewDdl.verifyNoTempObjects(spark, catalog.name, ident, query)
    // a REPLACE can close a cycle through other views (their stored
    // bodies still reference THIS view's old definition)
    if (replace) GraftViewDdl.verifyNoCycles(spark, catalog, ident, query)
    // a view must not shadow a table: reads resolve views first, so a
    // same-named pair would silently flip the table's meaning
    if (catalog.tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Seq(catalog.name) ++ ident.namespace :+ ident.name)
    val qSchema = spark.sessionState.executePlan(query).analyzed.schema
    val aliases = userColumns.map(_._1)
    if (aliases.nonEmpty && aliases.size != qSchema.size)
      throw new IllegalArgumentException(
        s"CREATE VIEW column list has ${aliases.size} names but the query " +
          s"produces ${qSchema.size} columns")
    val comments = userColumns.map(_._2.getOrElse(""))
    // the stored schema carries the user's column names; the raw query
    // output names ride alongside so reads can re-alias positionally
    val viewSchema =
      if (aliases.isEmpty) qSchema
      else StructType(qSchema.fields.zip(aliases).map { case (f, a) =>
        f.copy(name = a)
      })
    val cm = spark.sessionState.catalogManager
    val info = new ViewInfo(ident, sqlText, cm.currentCatalog.name,
      cm.currentNamespace, viewSchema, qSchema.fieldNames,
      aliases.toArray, comments.toArray,
      (props ++ comment.map("comment" -> _)).asJava)
    if (replace) catalog.replaceView(info, orCreate = true)
    else try catalog.createView(info)
    catch { case _: ViewAlreadyExistsException if allowExisting => () }
    Nil
  }
}

/** ALTER VIEW ... AS query (reference AlterV2ViewExec semantics): a
  * redefinition appends a spec view version and keeps the stored
  * properties; the column list resets to the new query's output. */
final case class AlterGraftViewAsCommand(catalog: GraftCatalog,
    ident: Identifier, sqlText: String, query: LogicalPlan)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    GraftViewDdl.verifyNoTempObjects(spark, catalog.name, ident, query)
    // redefinitions resolve against the OLD body, so an indirect cycle
    // (a -> b -> a) would commit cleanly and break every later read
    GraftViewDdl.verifyNoCycles(spark, catalog, ident, query)
    val existing = catalog.loadView(ident) // throws NoSuchViewException
    val qSchema = spark.sessionState.executePlan(query).analyzed.schema
    val cm = spark.sessionState.catalogManager
    val info = new ViewInfo(ident, sqlText, cm.currentCatalog.name,
      cm.currentNamespace, qSchema, qSchema.fieldNames,
      Array.empty[String], Array.empty[String], existing.properties())
    catalog.replaceView(info, orCreate = false)
    Nil
  }
}

final case class RenameGraftViewCommand(catalog: GraftCatalog,
    from: Identifier, to: Identifier) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // same shadow guard as CREATE VIEW: the renamed view must not land
    // on a table name (reads resolve views first)
    if (catalog.tableExists(to))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Seq(catalog.name) ++ to.namespace :+ to.name)
    catalog.renameView(from, to)
    Nil
  }
}

/** SHOW CREATE TABLE on a graft view: a re-runnable CREATE VIEW
  * statement — declared columns with comments, properties, the stored
  * SQL (mirrors Spark's session-view rendering). */
final case class ShowCreateGraftViewCommand(catalog: GraftCatalog,
    ident: Identifier, override val output: Seq[Attribute])
  extends LeafRunnableCommand {

  // re-runnable output demands escaping: '…' values double embedded
  // quotes, `…` identifiers double embedded backticks (what Spark's own
  // SHOW CREATE TABLE does via escapeSingleQuotedString/quoteIdentifier)
  private def sq(s: String): String = s.replace("'", "''")
  private def bq(s: String): String = "`" + s.replace("`", "``") + "`"

  override def run(spark: SparkSession): Seq[Row] = {
    val v = catalog.loadView(ident)
    val full = (Seq(catalog.name) ++ ident.namespace :+ ident.name)
      .map(bq).mkString(".")
    val sb = new StringBuilder(s"CREATE VIEW $full")
    val names =
      if (v.columnAliases.nonEmpty) v.columnAliases.toSeq
      else v.schema().fieldNames.toSeq
    val comments = v.columnComments()
    if (names.nonEmpty)
      sb.append(names.zipWithIndex.map { case (n, i) =>
        val c = if (i < comments.length && comments(i).nonEmpty)
          s" COMMENT '${sq(comments(i))}'" else ""
        s"${bq(n)}$c"
      }.mkString(" (\n  ", ",\n  ", ")"))
    import scala.jdk.CollectionConverters._
    val props = v.properties().asScala.toSeq.sortBy(_._1)
      .filterNot(_._1 == "comment")
    Option(v.properties().get("comment"))
      .foreach(c => sb.append(s"\nCOMMENT '${sq(c)}'"))
    if (props.nonEmpty)
      sb.append(props.map { case (k, x) => s"'${sq(k)}' = '${sq(x)}'" }
        .mkString("\nTBLPROPERTIES (\n  ", ",\n  ", ")"))
    sb.append(s"\nAS ${v.query}\n")
    Seq(Row(sb.toString))
  }
}

/** DESCRIBE [EXTENDED] on a graft view: the stored column schema (with
  * declared column comments), plus — EXTENDED — a detail section shaped
  * like Spark's session-view rendering (View Text, creation context,
  * query output columns, properties). */
final case class DescribeGraftViewCommand(catalog: GraftCatalog,
    ident: Identifier, isExtended: Boolean,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val v = catalog.loadView(ident)
    val comments = v.columnComments()
    val cols = v.schema().fields.zipWithIndex.map { case (f, i) =>
      Row(f.name, f.dataType.simpleString,
        if (i < comments.length && comments(i).nonEmpty) comments(i) else null)
    }.toSeq
    if (!isExtended) cols
    else {
      val props = v.properties().asScala.toSeq.sortBy(_._1)
        .filterNot(_._1 == "comment")
        .map { case (k, x) => s"$k=$x" }.mkString("[", ", ", "]")
      cols ++ Seq(
        Row("", "", ""),
        Row("# Detailed View Information", "", ""),
        Row("Catalog", catalog.name, ""),
        Row("Namespace", ident.namespace.mkString("."), ""),
        Row("View", ident.name, ""),
        Row("Type", "VIEW", "")) ++
        Option(v.properties().get("comment")).map(c => Row("Comment", c, "")) ++ Seq(
        Row("View Text", v.query, ""),
        Row("View Catalog and Namespace",
          (v.currentCatalog +: v.currentNamespace.toSeq).mkString("."), ""),
        Row("View Query Output Columns",
          v.queryColumnNames.mkString("[", ", ", "]"), ""),
        Row("View Properties", props, ""))
    }
  }
}

/** DESCRIBE <view>.<column>: Spark's session-view rendering —
  * info_name/info_value rows for col_name, data_type, comment. Dotted
  * paths resolve through nested structs (declared column comments only
  * exist at the top level). */
final case class DescribeGraftViewColumnCommand(catalog: GraftCatalog,
    ident: Identifier, colParts: Seq[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val v = catalog.loadView(ident)
    def missing() = throw new IllegalArgumentException(
      s"Column ${colParts.mkString(".")} does not exist in view " +
        s"${catalog.name}.${(ident.namespace :+ ident.name).mkString(".")}")
    val fields = v.schema().fields
    val topIdx = fields.indexWhere(_.name.equalsIgnoreCase(colParts.head))
    if (topIdx < 0) missing()
    var field = fields(topIdx)
    colParts.tail.foreach { part =>
      field = field.dataType match {
        case st: StructType =>
          st.fields.find(_.name.equalsIgnoreCase(part)).getOrElse(missing())
        case _ => missing()
      }
    }
    val comments = v.columnComments()
    val comment =
      if (colParts.size == 1 && topIdx < comments.length &&
          comments(topIdx).nonEmpty) comments(topIdx)
      else "NULL"
    Seq(
      Row("col_name", field.name),
      Row("data_type", field.dataType.simpleString),
      Row("comment", comment))
  }
}

/** SHOW TBLPROPERTIES on a graft view: all stored properties, or the one
  * asked for (with Spark's does-not-have-property message when absent). */
final case class ShowGraftViewPropsCommand(catalog: GraftCatalog,
    ident: Identifier, propertyKey: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val props = catalog.loadView(ident).properties().asScala.toMap
    propertyKey match {
      case Some(k) => Seq(Row(k, props.getOrElse(k,
        s"View ${(Seq(catalog.name) ++ ident.namespace :+ ident.name).mkString(".")} " +
          s"does not have property: $k")))
      case None => props.toSeq.sortBy(_._1).map { case (k, x) => Row(k, x) }
    }
  }
}

final case class DropGraftViewCommand(catalog: GraftCatalog,
    ident: Identifier, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (!catalog.dropView(ident) && !ifExists)
      throw new NoSuchViewException(ident)
    Nil
  }
}

/** SHOW VIEWS over a graft namespace (reference ShowV2ViewsExec): the
  * catalog's views plus the session's temp views — global-temp when the
  * named namespace IS the global-temp database, local always, matching
  * the session-catalog command's output shape. */
final case class ShowGraftViewsCommand(catalog: GraftCatalog,
    namespace: Seq[String], pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val rows = Seq.newBuilder[Row]
    val globalTemp = spark.sessionState.conf.getConfString(
      "spark.sql.globalTempDatabase", "global_temp")
    if (namespace.headOption.contains(globalTemp)) {
      spark.sessionState.catalog.globalTempViewManager
        .listViewNames(pattern.getOrElse("*"))
        .foreach(n => rows += Row(globalTemp, n, true))
    } else {
      catalog.listViews(namespace: _*).foreach { v =>
        if (pattern.forall(p => StringUtils.filterPattern(Seq(v.name), p).nonEmpty))
          rows += Row(v.namespace.mkString("."), v.name, false)
      }
    }
    spark.sessionState.catalog.listLocalTempViews(pattern.getOrElse("*"))
      .foreach(v => rows += Row(v.database.getOrElse(""), v.table, true))
    rows.result()
  }
}

final case class AlterGraftViewCommand(catalog: GraftCatalog,
    ident: Identifier, changes: Seq[ViewChange]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    catalog.alterView(ident, changes: _*)
    Nil
  }
}
