package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained aggregate view (materialized SUM/COUNT
  * GROUP BY) over a versioned graft table — the Delta/DBSQL "incremental
  * materialized view refresh" shape: instead of recomputing the aggregate
  * from the full base table, `refresh` folds only the base commits that
  * happened since the last refresh, read from the per-commit change feed
  * ([[ParquetTable.tableChanges]]).
  *
  * SUM and COUNT are self-maintainable aggregates: each change row
  * contributes `+value` (insert, update_postimage) or `-value` (delete,
  * update_preimage), so a refresh is
  *
  *   delta  = changes(lastSynced+1 .. current) → groupBy(keys) signed sums
  *   source = delta ⟕ currentView → folded running totals
  *   MERGE source INTO view ON keys
  *
  * — O(changed groups), never O(base table). Groups whose count reaches
  * zero stay as tombstone rows in the stored table (bounded by group
  * cardinality) and are filtered by [[read]]; this keeps a refresh ONE
  * atomic commit, so there is no partially-applied state to recover.
  *
  * Refresh bookkeeping rides the view's own commit atomically: the MERGE
  * carries a Delta-style `txnAppId`/`txnVersion` marker whose version IS
  * the folded base version ([[ParquetTable.lastTxnVersion]] reads it
  * back). A crashed refresh therefore either committed fully (marker
  * advanced) or not at all (next refresh re-folds the same range), and a
  * concurrent duplicate refresh is skipped by the idempotent-write guard.
  *
  * At 100 TB: the base-table scan cost of a refresh is the change feed of
  * the folded commits only; the view-side cost is a MERGE keyed by group
  * — both scale with the delta, not the base. This is exactly the
  * aggregation-table pattern the reference builds in Athena by re-running
  * INSERT INTO ... GROUP BY over the full table (README.md:297-338),
  * re-expressed as an incremental operator.
  */
object IncrementalView {

  /** The aggregate functions a change-feed fold CAN maintain without
    * rescanning the base: SUM and COUNT fold signed deltas; AVG is
    * derived from the stored (SUM, COUNT) pair at read time. MIN/MAX
    * are NOT in this set — deleting the row that held a group's minimum
    * leaves the new minimum unknown without rescanning that group, so an
    * "incremental" MIN/MAX view would silently serve stale extrema.
    */
  val SelfMaintainable: Set[String] = Set("sum", "count", "avg")

  /** Refuse un-maintainable aggregates UP FRONT (create time), naming
    * the recompute path — the failure a user must get instead of a view
    * that drifts after its first delete.
    */
  def requireSelfMaintainable(aggs: Seq[String]): Unit = {
    val bad = aggs.map(_.toLowerCase).filterNot(SelfMaintainable)
    require(bad.isEmpty,
      s"IncrementalView: ${bad.mkString(", ")} " +
        "is not self-maintainable under deletes (removing a group's " +
        "extreme row leaves the new extreme unknown without a rescan). " +
        "Recompute instead: ParquetTable.read(basePath).groupBy(keys)" +
        ".agg(min/max(...)), or rebuild the view with " +
        "IncrementalView.create. Self-maintainable aggregates: " +
        SelfMaintainable.toSeq.sorted.mkString(", ") + ".")
  }

  /** txn appIds are `[A-Za-z0-9_.-]+`, so the base path rides along as a
    * stable hex digest — the marker still binds the view to exactly one
    * base table.
    */
  private def appId(basePath: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(basePath.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    s"graft-mv.$hex"
  }

  private def aggregate(df: DataFrame, groupCols: Seq[String], sumCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(sum(col(sumCol)).as("total"), count(lit(1)).as("n_rows"))

  /** Materialize the view from the base table's CURRENT snapshot and
    * stamp it with the base version it reflects.
    */
  def create(
      spark: SparkSession,
      basePath: String,
      viewPath: String,
      groupCols: Seq[String],
      sumCol: String,
      aggs: Seq[String] = Seq("sum", "count", "avg")): Long = {
    requireSelfMaintainable(aggs)
    val baseV = ParquetTable.currentVersion(spark, basePath).getOrElse(
      throw new IllegalArgumentException(
        s"IncrementalView.create: base at $basePath is not a versioned graft table"))
    val snap = aggregate(ParquetTable.read(spark, basePath), groupCols, sumCol)
    ParquetTable.merge(spark, viewPath, snap, groupCols,
      txn = Some(appId(basePath) -> baseV))
    baseV
  }

  /** Fold base commits `(lastSynced, current]` into the view; returns how
    * many base commits were folded (0 = view already current). Base
    * commits since the last refresh must have been written with
    * `cdf = true` (or still hold both snapshots) so the change feed can
    * replay them.
    */
  def refresh(
      spark: SparkSession,
      basePath: String,
      viewPath: String,
      basePk: Seq[String],
      groupCols: Seq[String],
      sumCol: String): Long = {
    val app = appId(basePath)
    val synced = ParquetTable.lastTxnVersion(spark, viewPath, app).getOrElse(
      throw new IllegalStateException(
        s"IncrementalView.refresh: $viewPath is not a view over $basePath (no txn marker)"))
    val current = ParquetTable.currentVersion(spark, basePath).get
    if (current <= synced) return 0L

    val changes = ParquetTable.tableChanges(spark, basePath, synced + 1, current, basePk)
    val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .when(col("_change_type").isin("delete", "update_preimage"), lit(-1L))
    val delta = changes
      .withColumn("__sign", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col(sumCol) * col("__sign")).as("__d_total"),
        sum(col("__sign")).as("__d_n"))

    // fold onto current totals; only CHANGED groups enter the merge source
    val cur = ParquetTable.read(spark, viewPath)
      .select((groupCols.map(col) :+ col("total") :+ col("n_rows")): _*)
    // the zero fallback carries the STORED total's type: a bare 0.0
    // would widen an integral total to double on first refresh (losing
    // exactness past 2^53) and silently flip the view's schema
    val totalType = cur.schema("total").dataType
    val source = delta.join(cur, groupCols, "left")
      .select((groupCols.map(col) :+
        (coalesce(col("total"), lit(0).cast(totalType)) + col("__d_total"))
          .cast(totalType).as("total") :+
        (coalesce(col("n_rows"), lit(0L)) + col("__d_n")).as("n_rows")): _*)

    ParquetTable.merge(spark, viewPath, source, groupCols,
      txn = Some(app -> current))
    current - synced
  }

  /** The view's semantic content: stored rows minus the tombstones of
    * groups whose membership dropped to zero, plus the derived `avg`
    * column (= total / n_rows — AVG rides the stored pair for free; it
    * is never stored, so the fold stays a pure signed sum).
    */
  def read(spark: SparkSession, viewPath: String): DataFrame =
    ParquetTable.read(spark, viewPath).filter(col("n_rows") > 0)
      .withColumn("avg", col("total").cast("double") / col("n_rows"))
}
