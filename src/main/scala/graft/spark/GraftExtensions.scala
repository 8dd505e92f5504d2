package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier

/** Session extensions (reference IcebergSparkSessionExtensions +
  * analysis/ResolveViews.scala): Spark 4 ships the ViewCatalog API but no
  * analyzer support for v2 views, so reads of catalog-stored views are
  * substituted here — the stored SQL is re-parsed and inlined, and the
  * analyzer resolves the rest. View DDL goes through the create_view /
  * drop_view procedures.
  *
  * Register with: spark.sql.extensions=graft.spark.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(spark => new ResolveGraftViews(spark))
    // format-specific DDL (partition-field/identifier/write-order/branch
    // DDL — reference IcebergSqlExtensions.g4) ahead of Spark's parser
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}

class ResolveGraftViews(spark: org.apache.spark.sql.SparkSession)
  extends Rule[LogicalPlan] {

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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation =>
      lookupView(u.multipartIdentifier) match {
        case Some((view, _)) =>
          val parsed = spark.sessionState.sqlParser.parsePlan(view.sql)
          SubqueryAlias(u.multipartIdentifier.last, parsed)
        case None => u
      }
  }
}
