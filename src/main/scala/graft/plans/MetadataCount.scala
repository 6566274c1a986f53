package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.{GraftFileIndex, GraftPartitionedFileIndex}

/** METADATA-ONLY `COUNT(*)`: a global count over a graft versioned
  * snapshot folds to the row count the stats sidecars already hold —
  * zero files opened, the same trick Delta answers `SELECT COUNT(*)`
  * from its log with. Registered by `GraftSessionExtensions` in the
  * operator-optimization batch, i.e. AFTER filter pushdown settles, so
  * the match shape is exact and conservative:
  *
  *   - global aggregate (no grouping) whose every output is
  *     `count(non-null literal)` — `count(*)` parses to `count(1)`;
  *     a `count(col)` (null-sensitive), `count(DISTINCT …)`, FILTER
  *     clause, or any other aggregate leaves the plan alone;
  *   - the child is the bare snapshot relation (a row-preserving
  *     Project in between is fine; a Filter is NOT matched — filtered
  *     counts still scan, with the sidecars pruning the files);
  *   - every file of the snapshot has sidecar stats (else None → scan).
  */
object MetadataCount extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Seq(), aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall(isCountStar) =>
      metadataRows(child) match {
        case Some(n) =>
          LocalRelation(agg.output, Seq(InternalRow.fromSeq(agg.output.map(_ => n))))
        case None => agg
      }
  }

  private def isCountStar(e: NamedExpression): Boolean = e match {
    case a: Alias => a.child match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(v, _))) => v != null // count(1): every row
          case _ => false
        }
      case _ => false
    }
    case _ => false
  }

  private def metadataRows(p: LogicalPlan): Option[Long] = p match {
    case Project(_, child) => metadataRows(child) // projections keep row counts
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation => h.location match {
        case g: GraftFileIndex => g.metadataRowCount
        case g: GraftPartitionedFileIndex => g.metadataRowCount
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }
}
