package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Metadata-answered `COUNT(*)` over the graft V2 reader — the
  * optimizer half of [[graft.ext.Layout.countWhere]]: a bare,
  * unfiltered `SELECT count(*)` against a `USING graft` relation
  * rewrites to a [[LocalRelation]] holding the generation's live row
  * count summed from its MANIFEST (physical rows minus any deletion
  * vector), so the query never opens a data file — one
  * manifest-sized read where a 100 TB table would otherwise pay a
  * full scan (or, with parquet aggregate pushdown, a footer read per
  * file). Exact by construction: the relation's file list IS the
  * generation manifest's, and per-file `n_rows` is the scan count of
  * that file.
  *
  * The match is deliberately NARROW — any shape this rule cannot
  * prove row-count-preserving falls through to the normal scan:
  *
  *  - global aggregate (no grouping) whose every output is a plain
  *    `count(literal)` — no DISTINCT, no FILTER clause, nothing else
  *    in the select list;
  *  - the child is the marked graft relation, possibly under
  *    deterministic Projects (a Project never changes row count; a
  *    nondeterministic one is left alone out of caution);
  *  - any Filter/Join/etc. between blocks the rewrite.
  *
  * The replacement keeps the Aggregate's own output attributes
  * (exprIds preserved), so nothing upstream re-resolves. Installed by
  * [[graft.GraftExtensions]] `injectOptimizerRule`. */
object GraftCountFromManifest extends Rule[LogicalPlan] {

  /** The marker rides the TABLE's options (where
    * [[graft.sources.GraftSource]] `tableOf` stamped it) — a
    * relation's own `options` field holds only the user's reader
    * options. */
  private def markerOf(r: DataSourceV2Relation): Option[(String, Long)] =
    (r.table match {
      case g: graft.sources.GraftTable => Some(g.parquet)
      case pt: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable =>
        Some(pt)
      case _ => None
    }) match {
      case Some(pt)
          // a pruned relation's file list no longer equals the
          // manifest's and may not answer a count from it. A
          // DV-bearing relation MAY: snapshotLiveRowCount sums
          // n_rows − dv_rows, exactly the live rows the substituted
          // merge-on-read plan would scan out — and this rule runs
          // BEFORE GraftDvReadRewrite in each batch iteration
          // (injection order), so the bare-count shape never pays
          // the snapshot scan at all
          if !"true".equalsIgnoreCase(pt.options.get("graft.pruned")) =>
        for {
          dir <- Option(pt.options.get("graft.layout.dir"))
          gen <- Option(pt.options.get("graft.layout.gen"))
        } yield (dir, gen.toLong)
      case _ => None
    }

  private def markedRelationOf(plan: LogicalPlan): Option[(String, Long)] =
    plan match {
      case r: DataSourceV2Relation => markerOf(r)
      // depending on rule-batch order the relation may already be
      // scan-planned; a ScanRelation wraps the original relation (and
      // a pushed FILTER would live inside the scan, so require none —
      // the parquet FileScan reports its pushed filters)
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        val pushedOk = r.scan match {
          case p: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            p.partitionFilters.isEmpty && p.dataFilters.isEmpty
          case _ => false
        }
        if (pushedOk) markerOf(r.relation) else None
      case Project(projList, child) if projList.forall(_.deterministic) =>
        markedRelationOf(child)
      case _ => None
    }

  private def isPlainCount(e: Expression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) =>
      !ae.isDistinct && ae.filter.isEmpty &&
        (ae.aggregateFunction match {
          case Count(Seq(Literal(v, _))) => v != null
          case _ => false
        })
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall(isPlainCount) =>
      markedRelationOf(child) match {
        case Some((dir, gen)) =>
          val n = graft.ext.Layout.snapshotLiveRowCount(
            SparkSession.active, dir, gen)
          val out: Seq[Attribute] = agg.aggregateExpressions.map(_.toAttribute)
          LocalRelation(out, Seq(InternalRow.fromSeq(out.map(_ => n))))
        case None => agg
      }
  }
}
