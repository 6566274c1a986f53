package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType,
  ShortType, TimestampNTZType, TimestampType}

/** Match direction for the as-of join (pandas `merge_asof` vocabulary). */
sealed trait AsOfDirection extends Serializable
case object AsOfBackward extends AsOfDirection // greatest right ts ≤ left ts
case object AsOfForward extends AsOfDirection  // least right ts ≥ left ts
case object AsOfNearest extends AsOfDirection  // closer of the two; tie → backward

/** Backward as-of join — the time-series operator Spark has no native
  * relational form for: each left row (keys, ts) picks the single right
  * row with the same keys and the greatest right-ts ≤ ts (pandas
  * `merge_asof` / kdb `aj` semantics; ties on right-ts resolve to the
  * last row in (keys, ts) sort order — make right-ts unique per key for
  * determinism).
  *
  * Two scale-equivalent implementations, per the custom-operator
  * preference ladder:
  *
  *   - `AsOfJoinPlan` + `AsOfJoinStrategy` + `AsOfJoinExec` — a custom
  *     whole-operator: logical node, planner strategy, and a sort-merge
  *     physical operator that declares `ClusteredDistribution` on the
  *     keys and (keys, ts) child ordering, then streams both sorted
  *     partitions through a single-pass merge holding ONE right row per
  *     key. One shuffle + sort per side, O(1) state, no range explosion —
  *     the plan you want at 100 TB. Registered by
  *     `GraftSessionExtensions` or imperatively by the `AsOfJoin.asof`
  *     API.
  *   - `AsOfJoin.asofViaWindow` — compositional executable spec: union
  *     both sides, carry the last non-null right payload forward with a
  *     window, keep left rows. Same shuffle shape (one exchange on the
  *     keys), but materializes the union and sorts left+right together;
  *     used as the cross-check oracle in AsOfJoinSpec.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    direction: AsOfDirection = AsOfBackward,
    tolerance: Option[Long] = None) extends BinaryNode {

  /** Right key columns are redundant with the left ones on a match and
    * dropped (merge_asof convention); right ts rides along as payload.
    */
  def rightPayload: Seq[Attribute] =
    right.output.filterNot(a => rightKeys.exists(_.exprId == a.exprId))

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Column pruning through the custom operator: the built-in
  * `ColumnPruning` rule doesn't know `AsOfJoinPlan`, so without this a
  * `select` above an as-of join reads EVERY column of both scans. For
  * `Project(AsOfJoinPlan)` it narrows each child to the columns the
  * projection references plus the join keys/timestamps — the insert'd
  * child Projects then ride the built-in pruning all the way into the
  * parquet `ReadSchema`. Registered by `GraftSessionExtensions` or
  * imperatively by `AsOfJoin.asof`. Reaches a fixed point after one
  * rewrite (pruned children have no droppable columns left).
  */
object AsOfJoinPruning extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: AsOfJoinPlan) =>
      val required = AttributeSet(
        p.references.toSeq ++ j.leftKeys ++ j.rightKeys :+ j.leftTs :+ j.rightTs)
      def prune(child: LogicalPlan): LogicalPlan = {
        val kept = child.output.filter(required.contains)
        if (kept.size == child.output.size) child else Project(kept, child)
      }
      val (nl, nr) = (prune(j.left), prune(j.right))
      if ((nl eq j.left) && (nr eq j.right)) p
      else p.copy(child = j.copy(left = nl, right = nr))
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKeys, p.rightKeys, p.leftTs, p.rightTs, p.rightPayload,
        p.direction, p.tolerance) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightPayload: Seq[Attribute],
    direction: AsOfDirection = AsOfBackward,
    tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  /** Both sides clustered on the join keys — EnsureRequirements makes the
    * two hash partitionings compatible (same co-partitioning contract as
    * sort-merge join), which `zipPartitions` below relies on.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** (keys…, ts) ascending on both sides → single-pass merge. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    // capture serializable pieces; projections/orderings build per-partition
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTs = leftTs
    val rTs = rightTs
    val outAttrs = output
    val dir = direction
    val tol = tolerance
    // Nearest + tolerance need numeric ts arithmetic, not just ordering.
    val needsNumericTs = dir == AsOfNearest || tol.isDefined
    if (needsNumericTs) AsOfJoin.requireIntegralTs(lTs.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTs), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTs.dataType))
      val tsGet: InternalRow => Long =
        if (needsNumericTs) AsOfJoin.integralTsGetter(lTs.dataType) else null
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var pendingRight: InternalRow = _ // peeked, not yet consumed
        private var heldRight: InternalRow = _    // copy: last right row ≤ ts
        private var heldKey: InternalRow = _      // copy of its key
        private var heldTsVal: Long = _           // its numeric ts (if needed)

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTsRow = lTsProj(l)
          var advancing = true
          while (advancing) {
            if (pendingRight == null && rIter.hasNext) pendingRight = rIter.next()
            if (pendingRight == null) advancing = false
            else {
              val rKey = rKeyProj(pendingRight)
              val keyCmp = keyOrd.compare(rKey, lKey)
              if (keyCmp < 0) pendingRight = null // behind: discard, keep scanning
              else if (keyCmp > 0) advancing = false // ahead: leave peeked
              else {
                val cmp = tsOrd.compare(rTsProj(pendingRight), lTsRow)
                if (dir == AsOfForward) {
                  // rows strictly before this left ts can never match a later
                  // left either (lefts arrive ts-ascending) — discard
                  if (cmp < 0) pendingRight = null else advancing = false
                } else if (cmp <= 0) {
                  heldRight = pendingRight.copy() // newest right ≤ this left ts
                  heldKey = rKey.copy()
                  if (needsNumericTs) heldTsVal = tsGet(rTsProj(heldRight))
                  pendingRight = null
                } else advancing = false // same key, future ts: leave peeked
              }
            }
          }
          val lTsVal = if (needsNumericTs) tsGet(lTsRow) else 0L
          val heldOk = heldRight != null && keyOrd.compare(heldKey, lKey) == 0 &&
            tol.forall(t => lTsVal - heldTsVal <= t)
          // pending is the first same-key right with ts beyond the left ts
          // (or ≥ it, for forward); never consumed — later lefts may reuse it
          lazy val pendTsVal = tsGet(rTsProj(pendingRight))
          val pendOk = dir != AsOfBackward && pendingRight != null &&
            keyOrd.compare(rKeyProj(pendingRight), lKey) == 0 &&
            tol.forall(t => pendTsVal - lTsVal <= t)
          val matchRow = dir match {
            case AsOfBackward => if (heldOk) heldRight else null
            case AsOfForward =>
              // forward ignores held state; the advance loop guarantees a
              // same-key pending row already sits at ts ≥ left ts
              if (pendOk) pendingRight else null
            case AsOfNearest =>
              if (heldOk && pendOk) {
                // tie on |Δts| resolves backward, like pandas merge_asof
                if (lTsVal - heldTsVal <= pendTsVal - lTsVal) heldRight
                else pendingRight
              } else if (heldOk) heldRight
              else if (pendOk) pendingRight
              else null
          }
          resultProj(joined(l, if (matchRow != null) matchRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** ts types whose internal representation is an integral value — required
    * for `nearest` and `tolerance`, which subtract timestamps rather than
    * just ordering them. TimestampType's internal unit is MICROSECONDS
    * (so a 2-day tolerance is `2L*86400*1000000`); DateType's is days.
    */
  private[plans] def requireIntegralTs(dt: DataType): Unit = dt match {
    case LongType | TimestampType | TimestampNTZType | IntegerType |
         DateType | ShortType => ()
    case other => throw new IllegalArgumentException(
      s"asof nearest/tolerance needs an integral or timestamp ts column, got $other")
  }

  private[plans] def integralTsGetter(dt: DataType): InternalRow => Long =
    dt match {
      case LongType | TimestampType | TimestampNTZType => _.getLong(0)
      case IntegerType | DateType => _.getInt(0).toLong
      case ShortType => _.getShort(0).toLong
      case other => throw new IllegalArgumentException(
        s"asof: unsupported ts type $other")
    }

  private def parseDirection(s: String): AsOfDirection = s match {
    case "backward" => AsOfBackward
    case "forward" => AsOfForward
    case "nearest" => AsOfNearest
    case other => throw new IllegalArgumentException(
      s"asof direction must be backward|forward|nearest, got '$other'")
  }

  /** As-of join via the custom operator. `on` are the equality keys
    * (right's copies are dropped from the output); every other right
    * column — including `rightTsCol` — joins the output, null when no
    * right row qualifies. `direction`: "backward" (greatest right ts ≤
    * left ts — the default), "forward" (least right ts ≥ left ts), or
    * "nearest" (closer of the two, ties backward). `tolerance` bounds
    * |left ts − right ts| in the ts type's INTERNAL unit (µs for
    * timestamps, days for dates). Rename right columns that would collide
    * with left names before calling. Registers `AsOfJoinStrategy` in the
    * session if absent.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    GraftColumnBridge.addStrategy(spark, AsOfJoinStrategy)
    GraftColumnBridge.addOptimization(spark, AsOfJoinPruning)
    // fresh exprIds on the right: both sides may share a scan (self as-of),
    // and duplicate ids would mis-bind the output projection
    val realiased = right.select(right.columns.map(c => right(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = realiased.queryExecution.analyzed
    def att(plan: LogicalPlan, n: String, side: String): Attribute =
      plan.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"asof: column '$n' not found on the $side side " +
          s"(have: ${plan.output.map(_.name).mkString(", ")})"))
    val dir = parseDirection(direction)
    val lTsAtt = att(lPlan, leftTsCol, "left")
    if (dir == AsOfNearest || tolerance.isDefined) requireIntegralTs(lTsAtt.dataType)
    require(tolerance.forall(_ >= 0), "asof tolerance must be ≥ 0")
    GraftColumnBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      on.map(att(lPlan, _, "left")), on.map(att(rPlan, _, "right")),
      lTsAtt, att(rPlan, rightTsCol, "right"), dir, tolerance))
  }

  /** Compositional formulation (executable spec): union both sides tagged,
    * carry the last non-null right payload forward per key with a window
    * ordered (ts, tag) — right rows sort before left rows at equal ts, so
    * the join is backward-INCLUSIVE like `asof` — then keep left rows.
    */
  def asofViaWindow(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTsCol: String,
      rightTsCol: String): DataFrame = {
    val payload = right.columns.filterNot(on.contains).toSeq
    val leftCols = left.columns.toSeq
    // left rows: own columns + empty payload slots
    val lAligned = payload.foldLeft(
      left.withColumn("__ts", col(leftTsCol)).withColumn("__tag", lit(1))) {
      (df, c) => df.withColumn(s"__p_$c", lit(null).cast(right.schema(c).dataType))
    }
    // right rows: fill payload slots first, then null out left-only columns
    // (order matters when a name exists on both sides)
    val rPayloaded = payload.foldLeft(
      right.withColumn("__ts", col(rightTsCol)).withColumn("__tag", lit(0))) {
      (df, c) => df.withColumn(s"__p_$c", col(c))
    }
    val rAligned = leftCols.filterNot(on.contains).foldLeft(rPayloaded) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(lAligned.columns.map(col): _*)
    val unioned = lAligned.unionByName(rAligned)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    payload.foldLeft(unioned)((df, c) =>
      df.withColumn(s"__p_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w)))
      .filter(col("__tag") === 1)
      .select((leftCols.map(col) ++ payload.map(c => col(s"__p_$c").as(c))): _*)
  }
}
