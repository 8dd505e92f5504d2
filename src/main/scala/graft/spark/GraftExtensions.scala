package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier

/** Session extensions (reference IcebergSparkSessionExtensions +
  * analysis/ResolveViews.scala): Spark 4 ships the ViewCatalog API but no
  * analyzer support for v2 views, so reads of catalog-stored views are
  * substituted here — the stored SQL is re-parsed in its stored
  * resolution context and inlined, and the analyzer resolves the rest.
  * View DDL (CREATE/REPLACE/DROP/SHOW VIEW, ALTER VIEW SET/UNSET) is
  * routed to the ViewCatalog at parse time by GraftViewDdl (via
  * GraftSqlParser — ResolveSessionCatalog would reject the v2 plans for
  * non-session catalogs before any injected rule runs); the create_view /
  * drop_view procedures remain as the scripting surface.
  *
  * Register with: spark.sql.extensions=graft.spark.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(spark => new ResolveGraftViews(spark))
    // catalog-stored SQL UDFs (format/udf-spec.md): macro-expand calls
    // into their bodies so Catalyst optimizes through them; the
    // FunctionCatalog fallback in GraftCatalog serves the same UDFs when
    // Spark's own resolution wins the race
    ext.injectResolutionRule(spark => new ResolveGraftUdfs(spark))
    // format-specific DDL (partition-field/identifier/write-order/branch
    // DDL — reference IcebergSqlExtensions.g4) ahead of Spark's parser
    ext.injectParser((session, delegate) =>
      new GraftSqlParser(delegate, Some(session)))
    // system-function predicates: bucket(16,c)=3 in a filter/join plans as
    // StaticInvoke (magic-method codegen), which DSv2 pushdown can't
    // translate — swap it for ApplyFunctionExpression so the predicate
    // reaches pushPredicates (reference optimizer/ReplaceStaticInvoke)
    ext.injectOptimizerRule(_ => ReplaceGraftStaticInvoke)
    // variant read-side shredding: serve variant_get on a configured
    // write.variant.shred.* path from the table's hidden materialized
    // _shred_* column instead of parsing the variant binary per row
    ext.injectResolutionRule(_ => ResolveShreddedVariantGets)
  }
}

/** Rewrite `graft.system.variant_get_*(col, '$.path')` over a variant
  * column with a configured shred spec to the table's hidden `_shred_*`
  * metadata column (reference variant-shredding spec typed_value +
  * spark/.../vectorized/VariantColumnVector.java — there the vectorized
  * reader assembles the typed column; here the column IS materialized in
  * the data files, so the scan serves it and never touches the binary).
  * Runs in the resolution fixpoint: once an expression is swapped for the
  * metadata attribute, Spark's own AddMetadataColumns propagates the
  * column into the relation output. Filters over the swapped attribute
  * still prune files — the scan maps `_shred_*` predicates back onto the
  * per-file shred stats. */
object ResolveShreddedVariantGets extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{ApplyFunctionExpression, Attribute, AttributeReference, Literal}
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val rels = plan.collect {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSparkTable] => r
    }
    if (rels.isEmpty) return plan
    // the materialized column for (variant attr, path, result type) — the
    // attr must be the relation's own output (exprId match), the type
    // must equal the spec's declared type exactly
    def target(a: AttributeReference, path: String,
        out: org.apache.spark.sql.types.DataType): Option[Attribute] =
      rels.iterator.flatMap { r =>
        if (!r.outputSet.contains(a)) None
        else {
          val g = r.table.asInstanceOf[GraftSparkTable]
          GraftSparkTable.shredSpecsOf(g.table.meta.properties, g.table.schema)
            .find(sp => sp.parent == a.name && sp.path == path &&
              sp.sparkType == out)
            .flatMap(sp => r.metadataOutput.find(_.name == sp.metaName))
        }
      }.nextOption()
    plan.resolveOperatorsUp {
      // row-level commands keep the function form: their rewrite plans
      // project the table schema for the write, and a swapped metadata
      // attribute in the condition would leak into the write projection.
      // The scan still prunes files — the function predicate pushes down
      // as a shred predicate on its own.
      case dml @ (_: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable |
                  _: org.apache.spark.sql.catalyst.plans.logical.UpdateTable |
                  _: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable) =>
        dml
      case p if p.resolved =>
        p.transformExpressions {
          case e @ ApplyFunctionExpression(fn, Seq(a: AttributeReference,
              Literal(pathU: org.apache.spark.unsafe.types.UTF8String,
                org.apache.spark.sql.types.StringType)))
              if fn.canonicalName.startsWith("graft.variant_get") =>
            target(a, pathU.toString, e.dataType).getOrElse(e)
        }
    }
  }
}

object ReplaceGraftStaticInvoke extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{ApplyFunctionExpression, BinaryComparison, Expression, In}
  import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}

  // only OUR catalog functions, and only where the counterpart is
  // foldable — elsewhere the codegen'd StaticInvoke stays (faster)
  private def ours(e: Expression): Boolean = e match {
    case si: StaticInvoke =>
      si.functionName == "invoke" &&
        si.scalarFunction.exists(_.canonicalName.startsWith("graft."))
    case _ => false
  }

  private def swap(e: Expression): Expression = e match {
    case si: StaticInvoke =>
      ApplyFunctionExpression(si.scalarFunction.get, si.arguments)
    case other => other
  }

  private def rewrite(cond: Expression): Expression = cond.transform {
    case c @ BinaryComparison(l, r) if ours(l) && r.foldable =>
      c.withNewChildren(Seq(swap(l), r))
    case c @ BinaryComparison(l, r) if ours(r) && l.foldable =>
      c.withNewChildren(Seq(l, swap(r)))
    case in @ In(v, list) if ours(v) && list.forall(_.foldable) =>
      in.copy(value = swap(v))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val c = rewrite(cond); if (c fastEquals cond) f else f.copy(condition = c)
    case j @ Join(_, _, _, Some(cond), _) =>
      val c = rewrite(cond); if (c fastEquals cond) j else j.copy(condition = Some(c))
  }
}

class ResolveGraftViews(spark: org.apache.spark.sql.SparkSession)
  extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, GetColumnByOrdinal, UnresolvedRelation => UR}
  import org.apache.spark.sql.catalyst.expressions.{Alias, SubqueryExpression}
  import org.apache.spark.sql.catalyst.plans.logical.Project

  private def catalogManager = spark.sessionState.catalogManager

  private def lookupView(parts: Seq[String]): Option[(GraftViewStore.StoredView, String)] = {
    val (catalogName, ident) = parts match {
      case Seq(cat, ns @ _*) if ns.nonEmpty &&
          catalogManager.isCatalogRegistered(cat) =>
        (cat, Identifier.of(ns.init.toArray, ns.last))
      case Seq(ns @ _*) if ns.nonEmpty =>
        (catalogManager.currentCatalog.name,
          Identifier.of(catalogManager.currentNamespace ++ ns.init, ns.last))
      case _ => return None
    }
    catalogManager.catalog(catalogName) match {
      case g: GraftCatalog =>
        try Some((g.loadView(ident).asInstanceOf[GraftViewStore.StoredView], catalogName))
        catch { case _: Throwable => None }
      case _ => None
    }
  }

  /** Re-qualify unqualified names in the view body with the view's STORED
    * resolution context (reference ResolveViews.qualifyTableIdentifiers:
    * 162-174 + qualifyFunctionIdentifiers): a view created under
    * `USE graft.db` must read the same tables — and bind the same
    * catalog-stored UDFs/UDTFs — from any later session, whatever its
    * current catalog is. 1-part names get catalog+namespace, multi-part
    * names that don't start with a registered catalog get the catalog.
    * Function names that are built-ins or session temp functions keep
    * their 1-part form (temp functions are already rejected at view
    * creation; the check here is defense for Spark's own built-ins). */
  private def qualify(plan: LogicalPlan, ctx: Seq[String]): LogicalPlan =
    if (ctx.isEmpty) plan
    else {
      val sessionCat = spark.sessionState.catalog
      def qualifyFns(e: org.apache.spark.sql.catalyst.expressions.Expression)
          : org.apache.spark.sql.catalyst.expressions.Expression =
        e.transformUp {
          case sq: SubqueryExpression => sq.withNewPlan(qualify(sq.plan, ctx))
          case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
              if f.nameParts.size == 1 &&
                sessionCat.lookupBuiltinOrTempFunction(f.nameParts.head).isEmpty &&
                sessionCat.lookupBuiltinOrTempTableFunction(f.nameParts.head).isEmpty =>
            f.copy(nameParts = ctx :+ f.nameParts.head)
          case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
              if f.nameParts.size > 1 &&
                !catalogManager.isCatalogRegistered(f.nameParts.head) =>
            f.copy(nameParts = ctx.head +: f.nameParts)
        }
      plan transform {
        case u @ UR(Seq(table), _, _) =>
          u.copy(multipartIdentifier = ctx :+ table)
        case u @ UR(parts, _, _)
            if !catalogManager.isCatalogRegistered(parts.head) =>
          u.copy(multipartIdentifier = ctx.head +: parts)
        // stored table functions that did NOT expand at parse time (their
        // name only resolves under the stored context) re-qualify here and
        // expand in ResolveGraftUdfs' analyzer pass
        case tvf: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
            if tvf.name.size == 1 &&
              sessionCat.lookupBuiltinOrTempTableFunction(tvf.name.head).isEmpty =>
          tvf.copy(name = ctx :+ tvf.name.head,
            functionArgs = tvf.functionArgs.map(qualifyFns))
        case tvf: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
            if tvf.name.size > 1 &&
              !catalogManager.isCatalogRegistered(tvf.name.head) =>
          tvf.copy(name = ctx.head +: tvf.name,
            functionArgs = tvf.functionArgs.map(qualifyFns))
        case other => other.mapExpressions(qualifyFns)
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation =>
      lookupView(u.multipartIdentifier) match {
        case Some((view, catName)) =>
          val cur = view.current
          val parsed = spark.sessionState.sqlParser.parsePlan(cur.sql)
          // substitute CTEs FIRST (reference ResolveViews:141-143): a
          // WITH-clause name must never be re-qualified into a table
          // reference — `WITH src AS (...) ... FROM src` would otherwise
          // silently read a real catalog table named src
          val ctx = (if (cur.catalogName.nonEmpty) Seq(cur.catalogName)
                     else Seq(catName)) ++ cur.namespaceParts
          val qualified = qualify(CTESubstitution.apply(parsed), ctx)
          // user column list (CREATE VIEW v(a, b) AS ...): re-alias the
          // query's output to the view's declared names POSITIONALLY
          // (reference ResolveViews.aliasColumns uses GetColumnByOrdinal
          // — by-name resolution breaks on duplicate query output names)
          val aliased =
            if (cur.aliases.isEmpty || cur.aliases.size != cur.queryCols.size)
              qualified
            else {
              val types = view.schema().fields.map(_.dataType)
              Project(cur.aliases.zipWithIndex.map { case (a, i) =>
                Alias(GetColumnByOrdinal(i, types(i)), a)()
              }, qualified)
            }
          SubqueryAlias(u.multipartIdentifier.last, aliased)
        case None => u
      }
  }
}
