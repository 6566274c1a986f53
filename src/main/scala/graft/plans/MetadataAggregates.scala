package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{GraftFileIndex, GraftPartitionedFileIndex}

/** METADATA-ONLY aggregates: a global `COUNT(*)` / `MIN(col)` /
  * `MAX(col)` over a graft versioned snapshot folds to the values the
  * stats sidecars already hold — zero files opened, the same trick
  * Delta answers these from its log with. Registered by
  * `GraftSessionExtensions` in the operator-optimization batch, i.e.
  * AFTER filter pushdown settles, so the match shape is exact and
  * conservative:
  *
  *   - global aggregate (no grouping) whose EVERY output folds:
  *     `count(non-null literal)` — `count(*)` parses to `count(1)` —
  *     `count(col)` of a bare column (rows minus the sidecar null
  *     counts; sound for ANY stats-carrying type including floats,
  *     since counting is NaN-safe — bails when any file's null count
  *     is unknown), or `min`/`max` of a bare column of integral /
  *     string / date / timestamp type (floats are excluded from
  *     min/max: parquet footer stats are unreliable in the presence
  *     of NaN, and -0.0/0.0 ordering differs). `count(DISTINCT …)`,
  *     FILTER clauses, expressions under min/max, or any other
  *     aggregate leave the plan alone;
  *   - the child is the bare snapshot relation (a row-preserving
  *     all-attribute Project in between is fine; a Filter is NOT
  *     matched — filtered aggregates still scan, with the sidecars
  *     pruning the files);
  *   - every file of the snapshot has sidecar stats for the columns
  *     involved (else the fold bails to the scan). Partition columns
  *     are not in file stats, so min/max on them scans too.
  */
object MetadataAggregates extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Seq(), aggExprs, child, _) if aggExprs.nonEmpty =>
      indexOf(child) match {
        case Some(index) =>
          val folded = aggExprs.map(foldExpr(_, index))
          if (folded.forall(_.isDefined))
            LocalRelation(agg.output, Seq(InternalRow.fromSeq(folded.map(_.get))))
          else agg
        case None => agg
      }
  }

  /** The snapshot index under a bare relation (row-preserving
    * attribute-only projections allowed), if any.
    */
  private def indexOf(p: LogicalPlan): Option[Any] = p match {
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      indexOf(child)
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation => h.location match {
        case g: GraftFileIndex => Some(g)
        case g: GraftPartitionedFileIndex => Some(g)
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  private def rowCount(index: Any): Option[Long] = index match {
    case g: GraftFileIndex => g.metadataRowCount
    case g: GraftPartitionedFileIndex => g.metadataRowCount
  }

  private def nonNullCount(index: Any, col: String): Option[Long] = index match {
    case g: GraftFileIndex => g.metadataNonNullCount(col)
    case g: GraftPartitionedFileIndex => g.metadataNonNullCount(col)
  }

  private def minMax(index: Any, col: String): Option[(String, Option[(String, String)])] =
    index match {
      case g: GraftFileIndex => g.metadataMinMax(col)
      case g: GraftPartitionedFileIndex => g.metadataMinMax(col)
    }

  /** The folded internal value of one output expression, or None when it
    * (or its stats) cannot fold.
    */
  private def foldExpr(e: NamedExpression, index: Any): Option[Any] = e match {
    case a: Alias => a.child match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(v, _))) if v != null => // count(1): every row
            rowCount(index).map(n => n: Any)
          case Count(Seq(attr: AttributeReference)) => // count(col): non-null rows
            nonNullCount(index, attr.name).map(n => n: Any)
          case Min(attr: AttributeReference) => foldMinMax(index, attr, isMin = true)
          case Max(attr: AttributeReference) => foldMinMax(index, attr, isMin = false)
          case _ => None
        }
      case _ => None
    }
    case _ => None
  }

  private def foldMinMax(
      index: Any, attr: AttributeReference, isMin: Boolean): Option[Any] =
    minMax(index, attr.name).flatMap { case (kind, range) =>
      range match {
        case None => Some(null) // the column is null in every row
        case Some((mn, mx)) =>
          val raw = if (isMin) mn else mx
          (kind, attr.dataType) match {
            case ("num", ByteType) => Some(BigDecimal(raw).toByteExact)
            case ("num", ShortType) => Some(BigDecimal(raw).toShortExact)
            case ("num", IntegerType) => Some(BigDecimal(raw).toIntExact)
            case ("num", LongType) => Some(BigDecimal(raw).toLongExact)
            case ("num", DateType) => Some(BigDecimal(raw).toIntExact) // days
            case ("num", _: TimestampType) => Some(BigDecimal(raw).toLongExact) // micros
            case ("str", StringType) => Some(UTF8String.fromString(raw))
            case _ => None // floats and kind/type mismatches scan
          }
      }
    }
}
