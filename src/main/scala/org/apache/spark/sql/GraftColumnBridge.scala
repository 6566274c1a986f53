package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into the sql package-private surface, so graft's native
  * Catalyst expressions and custom logical plans can ride the public DSL —
  * the classic extension-library pattern:
  *
  *   - Column ↔ Expression (`classic.ExpressionUtils`);
  *   - LogicalPlan → DataFrame (`classic.Dataset.ofRows`);
  *   - imperative planner-strategy registration (`experimental`), for
  *     sessions built without `GraftSessionExtensions`.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A DataFrame over a custom [[execution.datasources.FileIndex]] —
    * parquet scan whose planning-time file listing the index controls
    * (how Delta/Iceberg splice their log-backed pruning into Spark).
    *
    * `catalogStats`, when present, rides a minimal catalog entry on the
    * relation — the slot `LogicalRelation.computeStats` reads, so
    * under `spark.sql.cbo.enabled`/`spark.sql.cbo.planStats.enabled`
    * the plan sees real row counts and per-column NDV instead of raw
    * file bytes (how ANALYZEd external tables feed Spark's CBO; see
    * graft.sources.PlanStats). The identifier is synthetic and never
    * resolved against a catalog — the entry exists only as a
    * statistics carrier on this read-only plan.
    */
  def ofFileIndex(
      spark: SparkSession,
      index: execution.datasources.FileIndex,
      dataSchema: types.StructType,
      catalogStats: Option[catalyst.catalog.CatalogStatistics] = None): DataFrame = {
    val relation = execution.datasources.HadoopFsRelation(
      location = index,
      partitionSchema = index.partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new execution.datasources.parquet.ParquetFileFormat(),
      options = Map.empty)(spark)
    val rel = execution.datasources.LogicalRelation(relation, isStreaming = false)
    val plan = catalogStats.fold(rel) { cs =>
      rel.copy(catalogTable = Some(catalyst.catalog.CatalogTable(
        identifier = catalyst.TableIdentifier("graft_snapshot"),
        tableType = catalyst.catalog.CatalogTableType.EXTERNAL,
        storage = catalyst.catalog.CatalogStorageFormat.empty,
        schema = rel.schema,
        provider = Some("parquet"),
        stats = Some(cs))))
    }
    ofRows(spark, plan)
  }

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A sibling session over the same SparkContext with `f`'s extensions
    * applied — the imperative twin of `spark.sql.extensions` for JVMs
    * whose shared session was built without them (tests, notebooks).
    * State (catalog, temp views, conf) starts fresh; the cluster is
    * shared.
    */
  def sessionWithExtensions(
      spark: SparkSession, f: SparkSessionExtensions => Unit): SparkSession = {
    val prevDefault = classic.SparkSession.getDefaultSession
    val prevActive = classic.SparkSession.getActiveSession
    try {
      // a cleared default forces the builder to construct a NEW session
      // (over the existing SparkContext) instead of returning the shared
      // one — the only public route to a second, extension-bearing session
      classic.SparkSession.clearDefaultSession()
      classic.SparkSession.clearActiveSession()
      classic.SparkSession.builder().withExtensions(f).getOrCreate()
    } finally {
      prevDefault.foreach(classic.SparkSession.setDefaultSession)
      prevActive.foreach(classic.SparkSession.setActiveSession)
    }
  }

  /** Block until the listener bus has delivered every queued event —
    * what makes task-metric accounting (graft.tools.ShuffleBytes)
    * deterministic: task-end events post asynchronously, so a counter
    * read right after an action can miss the job's own tail. The bus
    * API is `private[spark]`; this package-nested bridge is the
    * standard extension-library route to it.
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Idempotently add a planner strategy to an existing session. */
  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }

  /** Idempotently add an optimizer rule to an existing session. */
  def addOptimization(
      spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(rule))
      exp.extraOptimizations = exp.extraOptimizations :+ rule
  }
}
