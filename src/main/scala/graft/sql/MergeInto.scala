package graft.sql

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation, UnresolvedTableValuedFunction}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sources.ParquetTable

/** SQL `MERGE INTO` for graft versioned tables — the reference's core
  * lakehouse verb (reference: src/glue_etl.py:338-349,
  * `whenMatchedUpdateAll.whenNotMatchedInsertAll` on the primary key),
  * which until now existed only as the `ParquetTable.merge` API.
  *
  * Spark's own parser already understands the statement (it builds a
  * `MergeIntoTable` plan); what plain parquet lacks is an executor for
  * it. [[GraftSqlParser]] intercepts the parsed plan when the target is
  * the path-based `graft.`/table/path`` identifier and rewrites it to a
  * runnable command over `ParquetTable.merge` — grammar, quoting, and
  * comments stay 100% Spark.
  *
  * Two entry points:
  *   - declarative: `spark.sql.extensions=graft.functions.GraftSessionExtensions`
  *     (or `GraftColumnBridge.sessionWithExtensions`), then
  *     `spark.sql("MERGE INTO graft.`/p` AS t USING updates AS s ON t.id = s.id
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")` —
  *     and plain reads: `spark.sql("SELECT … FROM graft.`/p`")`, with
  *     `VERSION AS OF n` time travel;
  *   - imperative: [[GraftSql.merge]] / [[GraftSql.sql]] on any existing
  *     session.
  *
  * Supported shape = exactly the reference's: equi-conjunction ON
  * condition (the primary key), `WHEN MATCHED THEN UPDATE SET *`,
  * `WHEN NOT MATCHED THEN INSERT *`, optionally
  * `MERGE WITH SCHEMA EVOLUTION` (Spark's own grammar position) →
  * `ParquetTable.merge(evolveSchema = true)`. Anything else on a graft
  * target fails fast at parse time with the reason — better than
  * Spark's downstream "table does not support row-level operations".
  *
  * MERGE semantics are `ParquetTable.merge`'s: idempotent upsert-by-PK
  * (replaying the same batch is a no-op — the reference's Delta MERGE
  * replay guarantee), update = full-row replace, partitioned versioned
  * targets rewrite only affected partitions. Partition columns are
  * recovered from the current manifest, so the statement needs no
  * partition clause.
  */
object GraftSql {

  /** Parse and execute one `MERGE INTO graft.`path`` statement on an
    * existing session (no extension registration needed). The source may
    * itself read `graft.`path`` tables.
    */
  def merge(spark: SparkSession, sqlText: String): Unit =
    spark.sessionState.sqlParser.parsePlan(sqlText) match {
      case m: MergeIntoTable =>
        rewrite(m).getOrElse(throw new IllegalArgumentException(
          "GraftSql.merge: not a graft-target MERGE (target must be " +
            "graft.`/table/path`)")).run(spark)
      case other => throw new IllegalArgumentException(
        s"GraftSql.merge expects a MERGE INTO statement, parsed ${other.nodeName}")
    }

  /** Run one graft-aware statement on an existing session — the
    * imperative twin of querying through [[GraftSqlParser]]: SELECTs over
    * `graft.`path`` (optionally `VERSION AS OF n`), graft-target MERGE /
    * DELETE FROM / UPDATE, and the maintenance verbs RESTORE TABLE /
    * OPTIMIZE … ZORDER BY / VACUUM / DESCRIBE HISTORY.
    */
  def sql(spark: SparkSession, sqlText: String): DataFrame =
    GraftColumnBridge.ofRows(spark,
      parseMaintenance(sqlText).getOrElse(
        dispatch(spark.sessionState.sqlParser.parsePlan(sqlText))))

  /** Shared statement dispatch (used by both the injected parser and
    * [[sql]]): graft-target MERGE → runnable command (its source's graft
    * relations rewritten too); everything else → graft relations
    * substituted wherever they appear.
    */
  private[sql] def dispatch(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable => rewrite(m) match {
      case Some(cmd) => cmd.copy(source = rewriteRelations(cmd.source))
      case None => rewriteRelations(m) // non-graft target; graft sources still read
    }
    case i: InsertIntoStatement if targetPath(i.table).isDefined =>
      val path = targetPath(i.table).get
      require(i.partitionSpec.isEmpty,
        s"INSERT graft.`$path`: static PARTITION specs are not supported — " +
          "partition values travel in the rows (dynamic), as in Delta")
      require(i.userSpecifiedCols.isEmpty,
        s"INSERT graft.`$path`: a column list is not supported; insert " +
          "full rows in table column order (or use byName via DataFrame API)")
      GraftInsertCommand(path, rewriteRelations(i.query), i.overwrite)
    case DeleteFromTable(t, cond) if targetPath(t).isDefined =>
      requireNoSubquery(cond, "DELETE FROM", targetPath(t).get)
      GraftDeleteCommand(targetPath(t).get, cond.sql)
    case UpdateTable(t, assignments, cond) if targetPath(t).isDefined =>
      val path = targetPath(t).get
      cond.foreach(requireNoSubquery(_, "UPDATE", path))
      val set = assignments.map {
        case Assignment(k: UnresolvedAttribute, value) =>
          requireNoSubquery(value, "UPDATE", path)
          k.nameParts.last -> value.sql
        case Assignment(k, _) => throw new IllegalArgumentException(
          s"UPDATE graft.`$path`: SET key must be a plain column, got ${k.sql}")
      }
      GraftUpdateCommand(path, set, cond.map(_.sql))
    case other => rewriteRelations(other)
  }

  /** Row-level conditions run against the target read (resolved by the
    * session at command run time); a subquery inside them would need its
    * own resolution pass — fail fast at parse with the reason instead of
    * a downstream unresolved-plan error.
    */
  private def requireNoSubquery(e: Expression, verb: String, path: String): Unit =
    require(!e.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.SubqueryExpression]),
      s"$verb graft.`$path`: subqueries in conditions are not supported; " +
        "materialize the subquery into the predicate or use the DataFrame API")

  /** Maintenance statement shapes Spark's grammar does not have (Delta
    * adds them via its own parser extension; here a pre-parse match does),
    * recognized on the raw text before delegation:
    * `RESTORE TABLE graft.`p` TO VERSION AS OF n`,
    * `OPTIMIZE graft.`p` ZORDER BY (c1, c2…)`,
    * `VACUUM graft.`p` [RETAIN n VERSIONS]`, and
    * `DESCRIBE HISTORY graft.`p``.
    */
  private val RestoreStmt =
    """(?is)\s*RESTORE\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val RestoreTsStmt =
    """(?is)\s*RESTORE\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  private val OptimizeStmt =
    """(?is)\s*OPTIMIZE\s+graft\s*\.\s*`([^`]+)`\s+ZORDER\s+BY\s*\(([^)]+)\)\s*;?\s*""".r
  private val OptimizeBloomStmt =
    ("""(?is)\s*OPTIMIZE\s+graft\s*\.\s*`([^`]+)`\s+BLOOM\s+BY\s*\(([^)]+)\)""" +
      """(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*""").r
  private val CompactWhereStmt =
    """(?is)\s*OPTIMIZE\s+graft\s*\.\s*`([^`]+)`\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val CompactStmt =
    """(?is)\s*OPTIMIZE\s+graft\s*\.\s*`([^`]+)`\s*;?\s*""".r
  private val VacuumStmt =
    ("""(?is)\s*VACUUM\s+graft\s*\.\s*`([^`]+)`(?:\s+RETAIN\s+(\d+)\s+""" +
      """(VERSIONS|HOURS))?(\s+DRY\s+RUN)?\s*;?\s*""").r
  private val HistoryStmt =
    """(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+graft\s*\.\s*`([^`]+)`\s*;?\s*""".r
  private val DetailStmt =
    """(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+graft\s*\.\s*`([^`]+)`\s*;?\s*""".r
  private val FsckStmt =
    """(?is)\s*FSCK\s+graft\s*\.\s*`([^`]+)`\s*;?\s*""".r
  private val GenerateStmt =
    ("""(?is)\s*GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+""" +
      """graft\s*\.\s*`([^`]+)`\s*;?\s*""").r
  private val CloneStmt =
    ("""(?is)\s*CREATE\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+SHALLOW\s+CLONE\s+""" +
      """graft\s*\.\s*`([^`]+)`(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""").r
  // matched AFTER CloneStmt (whose tail starts with SHALLOW, not AS)
  private val CtasStmt =
    ("""(?is)\s*CREATE\s+TABLE\s+graft\s*\.\s*`([^`]+)`""" +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]+)\))?\s+AS\s+(SELECT\b.+?)\s*;?\s*""").r
  private val DescribeStmt =
    """(?is)\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?graft\s*\.\s*`([^`]+)`\s*;?\s*""".r
  private val RenameColumnStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+RENAME\s+COLUMN\s+""" +
      """`?([^`\s]+)`?\s+TO\s+`?([^`\s;]+)`?\s*;?\s*""").r
  private val DropColumnStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+DROP\s+COLUMN\s+""" +
      """`?([^`\s;]+)`?\s*;?\s*""").r
  private val AddConstraintStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+ADD\s+CONSTRAINT\s+""" +
      """(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""").r
  private val DropConstraintStmt =
    """(?is)\s*ALTER\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r
  private val AddGeneratedStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+ADD\s+COLUMN\s+""" +
      """(\w+)\s+GENERATED\s+ALWAYS\s+AS\s*\((.+)\)\s*;?\s*""").r
  private val DropGeneratedStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+DROP\s+GENERATED\s+""" +
      """COLUMN\s+(\w+)\s*;?\s*""").r
  private val AddIdentityStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+ADD\s+COLUMN\s+(\w+)\s+""" +
      """GENERATED\s+BY\s+DEFAULT\s+AS\s+IDENTITY""" +
      """(?:\s*\(\s*START\s+WITH\s+(-?\d+)\s+INCREMENT\s+BY\s+(-?\d+)\s*\))?\s*;?\s*""").r
  private val DropIdentityStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+DROP\s+IDENTITY\s+""" +
      """COLUMN\s+(\w+)\s*;?\s*""").r
  // matched AFTER AddGeneratedStmt/AddIdentityStmt (their COLUMN clause
  // starts with GENERATED, excluded here), so plain ADD COLUMN never
  // shadows them
  private val AddColumnStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+ADD\s+COLUMN\s+""" +
      """(\w+)\s+(?!GENERATED\b)([A-Za-z_]+(?:\s*\([\d,\s]*\))?(?:\s*<[^;]*>)?)""" +
      """(?:\s+DEFAULT\s+(.+?))?\s*;?\s*""").r
  private val SetDefaultStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+ALTER\s+COLUMN\s+""" +
      """(\w+)\s+SET\s+DEFAULT\s+(.+?)\s*;?\s*""").r
  private val DropDefaultStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+ALTER\s+COLUMN\s+""" +
      """(\w+)\s+DROP\s+DEFAULT\s*;?\s*""").r
  private val CompactSmallStmt =
    ("""(?is)\s*OPTIMIZE\s+graft\s*\.\s*`([^`]+)`\s+COMPACT\s+SMALL""" +
      """(?:\s+BELOW\s+(\d+))?\s*;?\s*""").r
  private val SetPropsStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+SET\s+""" +
      """TBLPROPERTIES\s*\(([^)]*)\)\s*;?\s*""").r
  private val UnsetPropsStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+graft\s*\.\s*`([^`]+)`\s+UNSET\s+""" +
      """TBLPROPERTIES\s*(?:IF\s+EXISTS\s*)?\(([^)]*)\)\s*;?\s*""").r
  private val ShowPropsStmt =
    """(?is)\s*SHOW\s+TBLPROPERTIES\s+graft\s*\.\s*`([^`]+)`\s*;?\s*""".r
  private val PropPair = """'((?:[^'\\]|\\.)*)'\s*=\s*'((?:[^'\\]|\\.)*)'""".r
  private val PropKey = """'((?:[^'\\]|\\.)*)'""".r
  private val ConvertStmt =
    ("""(?is)\s*CONVERT\s+TO\s+GRAFT\s+parquet\s*\.\s*`([^`]+)`""" +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]+)\))?\s*;?\s*""").r
  // matched BEFORE AnalyzeStmt (whose clause is COMPUTE STATISTICS, not
  // COMPUTE INCREMENTAL STATISTICS)
  private val AnalyzeIncrementalStmt =
    ("""(?is)\s*ANALYZE\s+graft\s*\.\s*`([^`]+)`\s+COMPUTE\s+INCREMENTAL\s+""" +
      """STATISTICS\s+USING\s+PK\s*\(([^)]+)\)\s*;?\s*""").r
  private val AnalyzeStmt =
    ("""(?is)\s*ANALYZE\s+graft\s*\.\s*`([^`]+)`\s+COMPUTE\s+STATISTICS\s+""" +
      """FOR\s+COLUMNS\s*\(([^)]+)\)\s*;?\s*""").r
  private val AnalyzeHistogramStmt =
    ("""(?is)\s*ANALYZE\s+graft\s*\.\s*`([^`]+)`\s+COMPUTE\s+HISTOGRAM\s+""" +
      """FOR\s+COLUMNS\s*\(([^)]+)\)\s*;?\s*""").r
  private val ShowStatsStmt =
    """(?is)\s*SHOW\s+STATISTICS\s+graft\s*\.\s*`([^`]+)`\s*;?\s*""".r

  private[sql] def parseMaintenance(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case RestoreStmt(path, v) => Some(GraftRestoreCommand(path, v.toLong))
      case RestoreTsStmt(path, ts) =>
        Some(GraftRestoreTimestampCommand(path, ts.trim))
      case ConvertStmt(path, cols) => Some(GraftConvertCommand(path,
        Option(cols).map(_.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
          .toSeq.filter(_.nonEmpty)).getOrElse(Nil)))
      case CloneStmt(target, source, v) =>
        Some(GraftCloneCommand(source, target, Option(v).map(_.toLong)))
      case CtasStmt(path, parts, select) =>
        Some(GraftCtasCommand(path,
          Option(parts).map(_.split(',').map(_.trim.stripPrefix("`")
            .stripSuffix("`")).toSeq.filter(_.nonEmpty)).getOrElse(Nil),
          select.trim))
      case DescribeStmt(path) => Some(GraftDescribeCommand(path))
      case RenameColumnStmt(path, from, to) =>
        Some(GraftColumnCommand(path, from, Some(to)))
      case DropColumnStmt(path, name) =>
        Some(GraftColumnCommand(path, name, None))
      case AddConstraintStmt(path, name, check) =>
        Some(GraftConstraintCommand(path, name, Some(check.trim)))
      case DropConstraintStmt(path, name) =>
        Some(GraftConstraintCommand(path, name, None))
      case AddGeneratedStmt(path, name, genExpr) =>
        Some(GraftGeneratedCommand(path, name, Some(genExpr.trim)))
      case DropGeneratedStmt(path, name) =>
        Some(GraftGeneratedCommand(path, name, None))
      case SetPropsStmt(path, pairs) =>
        val props = PropPair.findAllMatchIn(pairs)
          .map(m => m.group(1) -> m.group(2)).toSeq
        require(props.nonEmpty,
          "SET TBLPROPERTIES: expected at least one 'key' = 'value' pair")
        Some(GraftPropertiesCommand(path, set = props, unset = Nil))
      case UnsetPropsStmt(path, keys) =>
        val ks = PropKey.findAllMatchIn(keys).map(_.group(1)).toSeq
        require(ks.nonEmpty, "UNSET TBLPROPERTIES: expected at least one 'key'")
        Some(GraftPropertiesCommand(path, set = Nil, unset = ks))
      case ShowPropsStmt(path) => Some(GraftShowPropertiesCommand(path))
      case AddIdentityStmt(path, name, start, step) =>
        Some(GraftIdentityCommand(path, name, add = true,
          Option(start).map(_.toLong).getOrElse(1L),
          Option(step).map(_.toLong).getOrElse(1L)))
      case DropIdentityStmt(path, name) =>
        Some(GraftIdentityCommand(path, name, add = false, 0L, 0L))
      case AddColumnStmt(path, name, typeSql, default) =>
        Some(GraftAddColumnCommand(path, name, typeSql.trim,
          Option(default).map(_.trim)))
      case SetDefaultStmt(path, name, default) =>
        Some(GraftSetDefaultCommand(path, name, Some(default.trim)))
      case DropDefaultStmt(path, name) =>
        Some(GraftSetDefaultCommand(path, name, None))
      case OptimizeBloomStmt(path, bloomCols, zCols) =>
        def split(s: String) = s.split(',')
          .map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq.filter(_.nonEmpty)
        Some(GraftOptimizeBloomCommand(path, split(bloomCols),
          Option(zCols).map(split).getOrElse(Nil)))
      case OptimizeStmt(path, cols) => Some(GraftOptimizeCommand(path,
        cols.split(',').map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq
          .filter(_.nonEmpty)))
      case CompactWhereStmt(path, cond) =>
        Some(GraftCompactWhereCommand(path, cond.trim))
      case CompactSmallStmt(path, below) =>
        Some(GraftCompactSmallCommand(path,
          Option(below).map(_.toLong).getOrElse(32L * 1024 * 1024)))
      case CompactStmt(path) => Some(GraftCompactCommand(path))
      case VacuumStmt(path, retain, unit, dry) =>
        val hours = Option(unit).exists(_.equalsIgnoreCase("HOURS"))
        Some(GraftVacuumCommand(path,
          Option(retain).map(_.toInt).getOrElse(2), hours,
          dryRun = dry != null))
      case HistoryStmt(path) => Some(GraftHistoryCommand(path))
      case DetailStmt(path) => Some(GraftDetailCommand(path))
      case FsckStmt(path) => Some(GraftFsckCommand(path))
      case GenerateStmt(path) => Some(GraftGenerateManifestCommand(path))
      case AnalyzeIncrementalStmt(path, pk) =>
        Some(GraftAnalyzeIncrementalCommand(path,
          pk.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
            .toSeq.filter(_.nonEmpty)))
      case AnalyzeStmt(path, cols) =>
        Some(GraftAnalyzeCommand(path,
          cols.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
            .toSeq.filter(_.nonEmpty)))
      case AnalyzeHistogramStmt(path, cols) =>
        Some(GraftAnalyzeHistogramCommand(path,
          cols.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
            .toSeq.filter(_.nonEmpty)))
      case ShowStatsStmt(path) => Some(GraftShowStatsCommand(path))
      case _ => None
    }

  /** Substitute every `graft.`path`` relation in `plan` with the
    * versioned-table read it names: bare references read the CURRENT
    * manifest version, `VERSION AS OF n` time-travels via `readAt`, and
    * `TIMESTAMP AS OF '<ts>'` resolves through the manifests' committed
    * `#ts=` headers via `readAtTimestamp` (accepted literal shapes:
    * `'yyyy-MM-dd HH:mm:ss[.f]'`, `'yyyy-MM-dd'`, a TIMESTAMP literal, or
    * an integer epoch-millis). Non-graft relations pass through for the
    * catalog to resolve. Needs an active session (the substituted subtree
    * is the resolved read plan, so the manifest is consulted at parse
    * time — exactly when `spark.sql` runs this parser).
    */
  private[sql] def rewriteRelations(plan: LogicalPlan): LogicalPlan = {
    def readPlan(path: String, version: Option[String]): LogicalPlan = {
      val spark = SparkSession.getActiveSession.getOrElse(
        throw new IllegalStateException(
          s"graft.`$path`: no active SparkSession to resolve the read"))
      val df = version match {
        case Some(v) =>
          val ver = try v.toLong catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"graft.`$path` VERSION AS OF $v: graft versions are integers")
          }
          ParquetTable.readAt(spark, path, ver)
        case None => ParquetTable.read(spark, path)
      }
      df.queryExecution.logical
    }
    // TIMESTAMP AS OF literal → epoch millis. Strings parse in the JVM
    // zone (same clock `#ts=` headers are stamped from); TIMESTAMP
    // literals arrive as epoch micros already. Non-literals are rejected:
    // time travel must be decidable at parse time.
    def tsMillisOf(path: String, e: Expression): Long = e match {
      case Literal(s, org.apache.spark.sql.types.StringType) if s != null =>
        val str = s.toString.trim
        def fail() = throw new IllegalArgumentException(
          s"graft.`$path` TIMESTAMP AS OF '$str': expected " +
            "'yyyy-MM-dd[ HH:mm:ss[.f]]' or epoch millis")
        if (str.nonEmpty && str.forall(_.isDigit)) str.toLongOption.getOrElse(fail())
        else try java.sql.Timestamp.valueOf(
          if (str.length == 10) str + " 00:00:00" else str).getTime
        catch { case _: IllegalArgumentException => fail() }
      case Literal(micros: Long, org.apache.spark.sql.types.TimestampType) =>
        Math.floorDiv(micros, 1000L)
      case other => throw new IllegalArgumentException(
        s"graft.`$path` TIMESTAMP AS OF: literal timestamp required, " +
          s"got ${other.sql}")
    }
    plan.transformUpWithSubqueries {
      case RelationTimeTravel(u: UnresolvedRelation, ts, version)
          if targetPath(u).isDefined =>
        val path = targetPath(u).get
        ts match {
          case Some(e) =>
            val spark = SparkSession.getActiveSession.getOrElse(
              throw new IllegalStateException(
                s"graft.`$path`: no active SparkSession to resolve the read"))
            ParquetTable.readAtTimestamp(spark, path, tsMillisOf(path, e))
              .queryExecution.logical
          case None => readPlan(path, version)
        }
      case u: UnresolvedRelation if targetPath(u).isDefined =>
        readPlan(targetPath(u).get, None)
      // Delta's `table_changes` TVF equivalent: the per-commit CDF as a
      // relation in ANY query position.
      //   graft_table_changes('/path', fromVersion, toVersion, pk...)
      // (pk columns feed the snapshot-diff fallback for commits without
      // a captured change manifest — see ParquetTable.tableChanges)
      case tvf: UnresolvedTableValuedFunction
          if tvf.name.map(_.toLowerCase) == Seq("graft_table_changes") =>
        val args = tvf.functionArgs.map {
          case Literal(v, _) if v != null => v.toString
          case other => throw new IllegalArgumentException(
            "graft_table_changes: arguments must be non-null literals, " +
              s"got ${other.sql}")
        }
        require(args.length >= 3, "graft_table_changes(path, fromVersion, " +
          "toVersion, pkCol...) needs at least path + two versions")
        val spark = SparkSession.getActiveSession.getOrElse(
          throw new IllegalStateException(
            "graft_table_changes: no active SparkSession"))
        ParquetTable.tableChanges(spark, args(0), args(1).toLong, args(2).toLong,
          args.drop(3)).queryExecution.logical
    }
  }

  /** `MergeIntoTable` → [[GraftMergeCommand]] when the target is
    * `graft.`path``; None when the statement belongs to someone else.
    * Unsupported clause shapes on a graft target throw, naming the clause.
    */
  private[sql] def rewrite(m: MergeIntoTable): Option[GraftMergeCommand] =
    targetPath(m.targetTable).map { path =>
      def fail(what: String): Nothing = throw new IllegalArgumentException(
        s"MERGE INTO graft.`$path`: $what (supported shapes: ON pk equality " +
          "conjunction; matched clauses 'WHEN MATCHED [AND cond] THEN " +
          "UPDATE SET *' and 'WHEN MATCHED [AND cond] THEN DELETE' in any " +
          "order; at most one 'WHEN NOT MATCHED [AND cond] THEN INSERT *')")
      val pk = pkColumns(m.mergeCondition).getOrElse(
        fail(s"ON condition must be a conjunction of t.col = s.col " +
          s"equalities on same-named columns, got: ${m.mergeCondition.sql}"))
      val simple = m.matchedActions == Seq(UpdateStarAction(None)) &&
        m.notMatchedActions == Seq(InsertStarAction(None)) &&
        m.notMatchedBySourceActions.isEmpty
      if (simple)
        GraftMergeCommand(path, m.sourceTable, pk, m.withSchemaEvolution)
      else {
        // conditional-clause shape → the rewrite-tier clause image
        if (m.withSchemaEvolution)
          fail("WITH SCHEMA EVOLUTION is not supported with conditional clauses")
        def toClause(a: Any): MergeClause = a match {
          case UpdateStarAction(c) => MergeClause(c.map(_.sql), MergeClause.UpdateStar)
          case DeleteAction(c) => MergeClause(c.map(_.sql), MergeClause.Delete)
          case UpdateAction(c, assigns, _) =>
            MergeClause(c.map(_.sql), MergeClause.UpdateSet,
              assigns.map { as =>
                val name = as.key match {
                  case u: UnresolvedAttribute => u.nameParts.last
                  case attr: Attribute => attr.name
                  case other => fail(
                    s"UPDATE SET key must be a plain column, got ${other.sql}")
                }
                name -> as.value.sql
              })
          case other => fail(s"unsupported clause: $other")
        }
        val matched = m.matchedActions.map(toClause)
        val bySource = m.notMatchedBySourceActions.map(toClause)
        if (bySource.exists(_.kind == MergeClause.UpdateStar))
          fail("WHEN NOT MATCHED BY SOURCE cannot UPDATE SET * (no source row)")
        val insert = m.notMatchedActions match {
          case Seq() => None
          case Seq(InsertStarAction(c)) => Some(c.map(_.sql))
          case other => fail(s"unsupported not-matched clause(s): $other")
        }
        def aliasOf(plan: LogicalPlan): Option[String] = plan match {
          case SubqueryAlias(id, _) => Some(id.name)
          case _ => None
        }
        val hasConds = (matched ++ bySource).exists(c =>
          c.cond.isDefined || c.sets.nonEmpty) || insert.exists(_.isDefined)
        val tA = aliasOf(m.targetTable)
        val sA = aliasOf(m.sourceTable)
        if (hasConds && (tA.isEmpty || sA.isEmpty))
          fail("conditional clauses need explicit target AND source " +
            "aliases (MERGE INTO graft.`p` AS t USING src AS s …) so the " +
            "conditions' qualifiers can resolve")
        GraftMergeCommand(path, m.sourceTable, pk, evolveSchema = false,
          tAlias = tA.getOrElse("__graft_t"), sAlias = sA.getOrElse("__graft_s"),
          matchedClauses = Some(matched), insertClause = insert,
          bySourceClauses = bySource)
      }
    }

  /** The conditional-clause merge image: full-outer join target slice ⟗
    * deduped source on pk, pick each row's fate by the FIRST satisfied
    * clause (SQL MERGE order semantics; a null condition falls through),
    * emit the clause's image for UPDATE/INSERT rows (source row, or the
    * SET assignments over both sides), drop DELETE rows and
    * insert-filtered unmatched source rows, keep everything else.
    * `bySource` clauses govern target rows with NO source match
    * (Delta's WHEN NOT MATCHED BY SOURCE — the sync-merge verbs).
    */
  private[sql] def clauseImage(
      t0: DataFrame,
      s0: DataFrame,
      pk: Seq[String],
      tAlias: String,
      sAlias: String,
      matched: Seq[MergeClause],
      insert: Option[Option[String]],
      bySource: Seq[MergeClause] = Nil): DataFrame = {
    import org.apache.spark.sql.functions._
    val cols = t0.columns.toSeq
    val t = t0.withColumn("__graft_tp", lit(true)).alias(tAlias)
    // the source keeps its EXTRA columns through the join (Delta parity:
    // clause conditions and SET values may reference source-only columns;
    // the final select projects back to the target schema). Target
    // columns the source lacks still fail fast with guidance — the
    // UPDATE/INSERT star images need every one of them.
    val missing = cols.filterNot(c => s0.columns.exists(_.equalsIgnoreCase(c)))
    require(missing.isEmpty,
      s"MERGE source is missing target column(s) ${missing.mkString(", ")} — " +
        "UPDATE/INSERT images project the full target schema from the source")
    val s = s0.withColumn("__graft_sp", lit(true)).alias(sAlias)
    val j = t.join(s, pk, "full_outer")
    val isMatched = col("__graft_tp").isNotNull && col("__graft_sp").isNotNull
    // action codes: matched clause i → i; by-source clause i → 100 + i;
    // keep target → -1; insert → -2; drop → -3
    def chain(clauses: Seq[MergeClause], offset: Int): org.apache.spark.sql.Column =
      clauses.zipWithIndex.reverse.foldLeft(lit(-1)) { case (els, (cl, i)) =>
        cl.cond.map(c => when(expr(c), lit(offset + i)).otherwise(els))
          .getOrElse(lit(offset + i))
      }
    val insertAct = insert match {
      case None => lit(-3)
      case Some(None) => lit(-2)
      case Some(Some(c)) => when(expr(c), lit(-2)).otherwise(lit(-3))
    }
    val act = when(isMatched, chain(matched, 0))
      .when(col("__graft_tp").isNotNull, chain(bySource, 100))
      .otherwise(insertAct)
    val indexed = matched.zipWithIndex.map { case (c, i) => (c, i) } ++
      bySource.zipWithIndex.map { case (c, i) => (c, 100 + i) }
    val dropRow = indexed.collect { case (c, i) if c.kind == MergeClause.Delete =>
      act === i }.foldLeft(act === lit(-3))(_ || _)
    j.filter(!dropRow)
      .select(cols.map { c =>
        if (pk.exists(_.equalsIgnoreCase(c))) col(c).as(c) // using-join coalesced
        else {
          val base = when(act === -2, col(s"$sAlias.$c"))
          indexed.foldLeft(base) {
            case (acc, (cl, i)) => cl.kind match {
              case MergeClause.UpdateStar =>
                acc.when(act === i, col(s"$sAlias.$c"))
              case MergeClause.UpdateSet =>
                cl.sets.find(_._1.equalsIgnoreCase(c)) match {
                  case Some((_, valueSql)) => acc.when(act === i, expr(valueSql))
                  case None => acc // unassigned column keeps the target value
                }
              case MergeClause.Delete => acc
            }
          }.otherwise(col(s"$tAlias.$c")).as(c)
        }
      }: _*)
  }

  private def targetPath(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => targetPath(child)
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") =>
      Some(u.multipartIdentifier(1))
    case _ => None
  }

  /** `t.k1 = s.k1 AND t.k2 = s.k2 …` → Some(Seq(k1, k2…)); anything else
    * (inequalities, functions, differing column names) → None.
    */
  private def pkColumns(cond: Expression): Option[Seq[String]] = cond match {
    case And(l, r) =>
      for (a <- pkColumns(l); b <- pkColumns(r)) yield a ++ b
    case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
        if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
      Some(Seq(a.nameParts.last))
    case EqualTo(a: Attribute, b: Attribute)
        if a.name.equalsIgnoreCase(b.name) =>
      Some(Seq(a.name))
    case _ => None
  }
}

/** The runnable side of a graft `MERGE INTO`: resolves the (still
  * unresolved) source plan against the session at run time, recovers
  * partition columns from the target's current manifest, and delegates
  * to `ParquetTable.merge`. `MERGE INTO … WITH SCHEMA EVOLUTION`
  * (Spark's own grammar) maps to `evolveSchema = true` — Delta
  * `mergeSchema` parity, both layouts.
  */
/** One MERGE clause in replayable string form: `cond` = the AND
  * condition's SQL (None = unconditional), `kind` = update-star /
  * update-set / delete, `sets` = SET assignments (update-set only).
  */
case class MergeClause(
    cond: Option[String],
    kind: String,
    sets: Seq[(String, String)] = Nil)

object MergeClause {
  val UpdateStar = "update_star"
  val UpdateSet = "update_set"
  val Delete = "delete"
}

case class GraftMergeCommand(
    path: String,
    source: LogicalPlan,
    pk: Seq[String],
    evolveSchema: Boolean = false,
    tAlias: String = "t",
    sAlias: String = "s",
    matchedClauses: Option[Seq[MergeClause]] = None,
    insertClause: Option[Option[String]] = Some(None),
    bySourceClauses: Seq[MergeClause] = Nil) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(session: SparkSession): Seq[Row] = {
    val updates = GraftColumnBridge.ofRows(session, source)
    val partitionColumns = ParquetTable.currentVersion(session, path)
      .flatMap(v => ParquetTable.partitionEntries(session, path, v))
      .map(_.head._1.split('/').toSeq.map(_.split('=')(0)))
      .getOrElse(Nil)
    matchedClauses match {
      case None =>
        ParquetTable.merge(session, path, updates, pk, partitionColumns,
          evolveSchema = evolveSchema)
      case Some(clauses) =>
        // conditional clauses: the clause image replaces the upsert image
        // inside the SAME partition-scoped copy-on-write commit machinery.
        // BY SOURCE clauses must see EVERY target row, so the partition
        // scoping (affected = source partitions) no longer applies — the
        // merge degrades to whole-table on partitioned targets; refuse
        // with guidance instead of silently dropping out-of-slice rows.
        if (bySourceClauses.nonEmpty && partitionColumns.nonEmpty)
          throw new IllegalArgumentException(
            s"MERGE INTO graft.`$path`: WHEN NOT MATCHED BY SOURCE needs " +
              "the whole target, which defeats partition-scoped merging " +
              "on a partitioned table — run it as DELETE/UPDATE with an " +
              "anti-join condition instead")
        // UPDATE SET on a partition column would move the row into a
        // partition dir the partition-scoped manifest never maps — the
        // row silently vanishes from reads (ADVICE r7 high). Mirror
        // ParquetTable.update's resolveSet guard at the clause layer.
        if (partitionColumns.nonEmpty)
          for {
            cl <- clauses ++ bySourceClauses
            (key, _) <- cl.sets
            pc <- partitionColumns.find(_.equalsIgnoreCase(key))
          } throw new IllegalArgumentException(
            s"MERGE INTO graft.`$path`: UPDATE SET cannot assign " +
              s"partition column $pc — a moved row would land in a " +
              "partition the merge's manifest scope never maps; " +
              "DELETE + re-INSERT the row to move it across partitions")
        val combine = (t0: DataFrame, s0: DataFrame) =>
          GraftSql.clauseImage(t0, s0, pk, tAlias, sAlias, clauses,
            insertClause, bySourceClauses)
        ParquetTable.merge(session, path, updates, pk, partitionColumns,
          mergeOnRead = Some(false), combine = Some(combine))
    }
    Seq.empty
  }
}

/** `INSERT INTO | OVERWRITE graft.`path``: append (INSERT INTO — the
  * O(appended rows) versioned commit of `ParquetTable.insertInto`; on
  * partitioned tables only affected partitions rewrite) or replace
  * (INSERT OVERWRITE — full-image commit: `atomicReplace` unpartitioned,
  * `createVersioned` republish partitioned). Duplicates are kept —
  * INSERT is append; MERGE is the upsert verb.
  */
case class GraftInsertCommand(
    path: String,
    source: LogicalPlan,
    overwrite: Boolean) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(session: SparkSession): Seq[Row] = {
    val rows = GraftColumnBridge.ofRows(session, source)
    val partitionColumns = ParquetTable.currentVersion(session, path)
      .flatMap(v => ParquetTable.partitionEntries(session, path, v))
      .map(_.head._1.split('/').toSeq.map(_.split('=')(0)))
      .getOrElse(Nil)
    if (overwrite) {
      // overwrite still aligns to the CURRENT schema (positional VALUES)
      val aligned = ParquetTable.currentVersion(session, path)
        .map(v => ParquetTable.alignInsert(rows,
          ParquetTable.readAt(session, path, v).schema))
        .getOrElse(rows)
      if (partitionColumns.isEmpty)
        ParquetTable.atomicReplace(session, path, aligned, Nil)
      else ParquetTable.createVersioned(aligned, path, partitionColumns)
    } else ParquetTable.insertInto(session, path, rows)
    Seq.empty
  }
}

/** `CONVERT TO GRAFT parquet.`/path`` [PARTITIONED BY (c1, …)]`: adopt a
  * plain parquet layout as a versioned table in place — Delta's
  * `CONVERT TO DELTA` verb (see `ParquetTable.convert`; files are
  * renamed, never rewritten). Returns one row with the created version.
  */
case class GraftConvertCommand(path: String, partitionColumns: Seq[String])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "converted_version", org.apache.spark.sql.types.LongType,
      nullable = false)())

  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(ParquetTable.convert(session, path, partitionColumns)))
}

/** Bare `OPTIMIZE graft.`path`` (no ZORDER BY) — Delta's default
  * OPTIMIZE: bin-pack compaction via `ParquetTable.compact`, which folds
  * a merge-on-read chain (appended dirs + deletion vectors) or a
  * scattered partitioned current version back into one fresh data dir.
  * Returns one row with the new current version.
  */
case class GraftCompactCommand(path: String) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "optimized_version", org.apache.spark.sql.types.LongType,
      nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    ParquetTable.compact(session, path)
    Seq(Row(ParquetTable.currentVersion(session, path).getOrElse(-1L)))
  }
}

/** `OPTIMIZE graft.`path` WHERE <partition predicate>`: partition-scoped
  * compaction — Delta's OPTIMIZE-WHERE tier ([[ParquetTable.compactWhere]]):
  * only matching partitions fold their dir chains / materialize their
  * deletion vectors; cold partitions are untouched.
  */
case class GraftCompactWhereCommand(path: String, condition: String)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "optimized_version", org.apache.spark.sql.types.LongType,
      nullable = false)())

  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(ParquetTable.compactWhere(session, path,
      org.apache.spark.sql.functions.expr(condition))))
}

/** `RESTORE TABLE graft.`path` TO VERSION AS OF n`: republishes the old
  * image as the next version — metadata-only (see `ParquetTable.restore`).
  * Returns one row with the newly committed version.
  */
case class GraftRestoreCommand(path: String, version: Long)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "restored_to_version", org.apache.spark.sql.types.LongType,
      nullable = false)())

  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(ParquetTable.restore(session, path, version)))
}

/** `RESTORE TABLE graft.`path` TO TIMESTAMP AS OF '<ts>'`: restores the
  * latest version committed at or before the timestamp (resolved through
  * the manifests' `#ts=` headers, the `readAtTimestamp` rule). Accepted
  * literal shapes: `'yyyy-MM-dd[ HH:mm:ss[.f]]'` (JVM zone, the clock
  * the headers are stamped from) or digits-only epoch millis.
  */
case class GraftRestoreTimestampCommand(path: String, ts: String)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "restored_to_version", org.apache.spark.sql.types.LongType,
      nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    def fail() = throw new IllegalArgumentException(
      s"RESTORE graft.`$path` TO TIMESTAMP AS OF '$ts': expected " +
        "'yyyy-MM-dd[ HH:mm:ss[.f]]' or epoch millis")
    val millis =
      if (ts.nonEmpty && ts.forall(_.isDigit)) ts.toLongOption.getOrElse(fail())
      else try java.sql.Timestamp.valueOf(
        if (ts.length == 10) ts + " 00:00:00" else ts).getTime
      catch { case _: IllegalArgumentException => fail() }
    val v = ParquetTable.versionAtTimestamp(session, path, millis)
    Seq(Row(ParquetTable.restore(session, path, v)))
  }
}

/** `DESCRIBE DETAIL graft.`path``: one metadata-only row for the current
  * snapshot (see `ParquetTable.detail` — sidecar-derived counts, no data
  * I/O).
  */
case class GraftDetailCommand(path: String) extends LeafRunnableCommand {

  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{ArrayType, BooleanType, IntegerType, LongType, StringType, TimestampType}

  override def output: Seq[Attribute] = Seq(
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = true)(),
    AttributeReference("commit_ts", TimestampType, nullable = true)(),
    AttributeReference("partitioned", BooleanType, nullable = false)(),
    AttributeReference("partition_columns", ArrayType(StringType, containsNull = false),
      nullable = false)(),
    AttributeReference("n_partitions", IntegerType, nullable = false)(),
    AttributeReference("n_data_dirs", IntegerType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = true)(),
    AttributeReference("num_rows", LongType, nullable = true)(),
    AttributeReference("num_deleted_rows", LongType, nullable = false)(),
    AttributeReference("n_versions", IntegerType, nullable = false)(),
    AttributeReference("n_constraints", IntegerType, nullable = false)(),
    AttributeReference("column_mapping", StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] =
    ParquetTable.detail(session, path).collect().toSeq
}

/** `CREATE TABLE graft.`target` SHALLOW CLONE graft.`source`
  * [VERSION AS OF n]`: metadata-only clone whose manifest references the
  * source's data dirs (see `ParquetTable.shallowClone` for the
  * divergence and vacuum contract). Returns one row with the clone's
  * first version.
  */
case class GraftCloneCommand(
    sourcePath: String, targetPath: String, version: Option[Long])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "cloned_version", org.apache.spark.sql.types.LongType,
      nullable = false)())

  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(ParquetTable.shallowClone(session, sourcePath, targetPath, version)))
}

/** `ALTER TABLE graft.`path` ADD CONSTRAINT name CHECK (expr)` /
  * `… DROP CONSTRAINT name` — Delta's CHECK-constraint DDL (see
  * `Constraints`: ADD validates existing data in one scan; every later
  * commit validates its own writes before publishing).
  */
/** `OPTIMIZE graft.`p` BLOOM BY (c1…) [ZORDER BY (z1…)]`: rewrite with
  * native parquet bloom filters on the named columns (point-lookup
  * skipping tier — see `ParquetTable.optimizeBloom`). Returns the
  * committed version.
  */
case class GraftOptimizeBloomCommand(
    path: String, bloomFor: Seq[String], zorderBy: Seq[String])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.LongType)())

  override def run(session: SparkSession): Seq[Row] = Seq(Row(
    graft.sources.ParquetTable.optimizeBloom(
      session, path, bloomFor, zorderBy)))
}

/** `ALTER TABLE graft.`p` RENAME COLUMN a TO b` / `DROP COLUMN a`:
  * O(1) metadata-only schema change via the `#colmap=` manifest header
  * (see `ParquetTable.renameColumn`). Returns the committed version.
  */
case class GraftColumnCommand(
    path: String, column: String, renameTo: Option[String])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.LongType)())

  override def run(session: SparkSession): Seq[Row] = {
    val v = renameTo match {
      case Some(to) => graft.sources.ParquetTable.renameColumn(session, path, column, to)
      case None => graft.sources.ParquetTable.dropColumn(session, path, column)
    }
    Seq(Row(v))
  }
}

/** `CREATE TABLE graft.`p` [PARTITIONED BY (c…)] AS SELECT …` — CTAS
  * onto the versioned layout: the SELECT (which may itself read
  * `graft.`path`` tables, time travel included) materializes as version
  * 1. Refuses an existing table (Delta's CTAS-without-REPLACE). Returns
  * one row with the created version.
  */
case class GraftCtasCommand(path: String, partitionBy: Seq[String], select: String)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.LongType)())

  override def run(session: SparkSession): Seq[Row] = {
    require(!ParquetTable.exists(session, path),
      s"CREATE TABLE graft.`$path`: table already exists — " +
        "drop/clean the path first (no CREATE OR REPLACE)")
    val df = org.apache.spark.sql.GraftColumnBridge.ofRows(session,
      GraftSql.dispatch(session.sessionState.sqlParser.parsePlan(select)))
    if (partitionBy.nonEmpty)
      ParquetTable.createVersioned(df, path, partitionBy)
    else ParquetTable.create(df, path)
    Seq(Row(ParquetTable.currentVersion(session, path).getOrElse(1L)))
  }
}

/** `DESC[RIBE] [TABLE] graft.`p``: one row per logical column —
  * (col_name, data_type, info) with provenance flags the plain schema
  * doesn't show: `partition`, `generated(expr)`, `identity(start,step)`,
  * `added@vN [default expr]` (ADD COLUMN'd), `renamed from p` (active
  * column mapping). Pure metadata: schema from the versioned read plan,
  * rules from the DDL files; no data I/O.
  */
case class GraftDescribeCommand(path: String) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq("col_name", "data_type", "info").map(n =>
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      n, org.apache.spark.sql.types.StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val schema = ParquetTable.read(session, path).schema
    val v = ParquetTable.currentVersion(session, path)
    val parts = v.flatMap(ParquetTable.partitionEntries(session, path, _))
      .map(_.head._1.split('/').toSeq.map(_.split('=')(0).toLowerCase).toSet)
      .getOrElse(Set.empty[String])
    val gen = graft.sources.GeneratedColumns.list(session, path)
      .map { case (n, e) => n.toLowerCase -> e }.toMap
    val ident = graft.sources.IdentityColumns.list(session, path)
      .map(r => r._1.toLowerCase -> ((r._2, r._3))).toMap
    val defs = graft.sources.ColumnDefaults.list(session, path).filter(_.live)
      .map(r => r.name.toLowerCase -> r).toMap
    val renamed = v.map(ParquetTable.columnMapping(session, path, _)._1)
      .getOrElse(Map.empty[String, String])
      .map { case (phys, logical) => logical.toLowerCase -> phys }
    schema.fields.toSeq.map { f =>
      val n = f.name.toLowerCase
      val info = Seq(
        if (parts.contains(n)) Some("partition") else None,
        gen.get(n).map(e => s"generated($e)"),
        ident.get(n).map { case (s, st) => s"identity($s,$st)" },
        defs.get(n).map(r =>
          s"added@v${r.addedAt}" + r.default.map(d => s" default $d").getOrElse("")),
        renamed.get(n).map(p => s"renamed from $p")
      ).flatten.mkString("; ")
      Row(f.name, f.dataType.simpleString, info)
    }
  }
}

/** `ALTER TABLE graft.`p` ADD COLUMN c type [DEFAULT expr]` — Delta's
  * metadata-only schema evolution plus the SQL column-DEFAULT model (see
  * `ParquetTable.addColumn` / `ColumnDefaults`: existing rows read typed
  * NULL, the default fills future writes that omit the column). Returns
  * the committed version.
  */
case class GraftAddColumnCommand(
    path: String, name: String, typeSql: String, default: Option[String])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.LongType)())

  override def run(session: SparkSession): Seq[Row] = Seq(Row(
    graft.sources.ParquetTable.addColumn(session, path, name, typeSql, default)))
}

/** `ALTER TABLE graft.`p` ALTER COLUMN c SET DEFAULT expr` /
  * `… DROP DEFAULT`: change what FUTURE ingest fills — no data touched.
  */
case class GraftSetDefaultCommand(
    path: String, name: String, default: Option[String])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(session: SparkSession): Seq[Row] = {
    graft.sources.ColumnDefaults.setDefault(session, path, name, default)
    Nil
  }
}

case class GraftConstraintCommand(
    path: String, name: String, check: Option[String])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(session: SparkSession): Seq[Row] = {
    check match {
      case Some(c) => graft.sources.Constraints.add(session, path, name, c)
      case None => graft.sources.Constraints.drop(session, path, name)
    }
    Nil
  }
}

/** `ALTER TABLE graft.`p` ADD COLUMN c GENERATED ALWAYS AS (expr)` /
  * `… DROP GENERATED COLUMN c` — Delta's generated-column DDL (see
  * `GeneratedColumns`: ingest verbs fill the column when absent, the
  * paired `_gen_<c>` CHECK invariant validates every commit).
  */
case class GraftGeneratedCommand(
    path: String, name: String, genExpr: Option[String])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(session: SparkSession): Seq[Row] = {
    genExpr match {
      case Some(e) => graft.sources.GeneratedColumns.add(session, path, name, e)
      case None => graft.sources.GeneratedColumns.drop(session, path, name)
    }
    Nil
  }
}

/** `ALTER TABLE graft.`p` ADD COLUMN c GENERATED BY DEFAULT AS IDENTITY
  * [(START WITH s INCREMENT BY i)]` / `… DROP IDENTITY COLUMN c` —
  * Delta's identity-column DDL (see `IdentityColumns`: create-time
  * registration, insert verbs assign from the persisted watermark).
  */
case class GraftIdentityCommand(
    path: String, name: String, add: Boolean, start: Long, step: Long)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(session: SparkSession): Seq[Row] = {
    if (add) graft.sources.IdentityColumns.add(session, path, name, start, step)
    else graft.sources.IdentityColumns.drop(session, path, name)
    Nil
  }
}

/** `OPTIMIZE graft.`p` COMPACT SMALL [BELOW <bytes>]`: incremental
  * small-dir compaction (see `ParquetTable.compactSmall` — large dirs
  * are never rewritten). Returns the committed (or current) version.
  */
case class GraftCompactSmallCommand(path: String, minBytes: Long)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "version", org.apache.spark.sql.types.LongType)())

  override def run(session: SparkSession): Seq[Row] = Seq(Row(
    graft.sources.ParquetTable.compactSmall(session, path, minBytes)))
}

/** `ALTER TABLE graft.`p` SET TBLPROPERTIES ('k'='v', …)` /
  * `… UNSET TBLPROPERTIES [IF EXISTS] ('k', …)` (see `TableProperties`;
  * `graft.appendOnly = 'true'` is enforced by every row-mutating verb).
  */
case class GraftPropertiesCommand(
    path: String, set: Seq[(String, String)], unset: Seq[String])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(session: SparkSession): Seq[Row] = {
    if (set.nonEmpty)
      graft.sources.TableProperties.set(session, path, set.toMap)
    if (unset.nonEmpty)
      graft.sources.TableProperties.unset(session, path, unset)
    Nil
  }
}

/** `SHOW TBLPROPERTIES graft.`p``: one (key, value) row per property. */
case class GraftShowPropertiesCommand(path: String)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "key", org.apache.spark.sql.types.StringType, nullable = false)(),
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "value", org.apache.spark.sql.types.StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] =
    graft.sources.TableProperties.list(session, path)
      .map { case (k, v) => Row(k, v) }
}

/** `OPTIMIZE graft.`path` ZORDER BY (c1, c2…)`: republishes the current
  * image Z-order-clustered for multi-column data skipping (see
  * `ParquetTable.optimize`). Returns one row with the committed version.
  */
case class GraftOptimizeCommand(path: String, zorderBy: Seq[String])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "committed_version", org.apache.spark.sql.types.LongType,
      nullable = false)())

  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(ParquetTable.optimize(session, path, zorderBy)))
}

/** `VACUUM graft.`path` [RETAIN n VERSIONS]`: deletes manifests and data
  * dirs of versions older than the retained window (default 2 — see
  * `ParquetTable.vacuum`). Returns one row with the number of versions
  * still present. With `DRY RUN` appended, returns the authoritative
  * (kind, path) work list WITHOUT deleting — Delta's VACUUM DRY RUN.
  */
case class GraftVacuumCommand(
    path: String, retain: Int, hours: Boolean = false, dryRun: Boolean = false)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    if (dryRun)
      Seq(
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "kind", org.apache.spark.sql.types.StringType, nullable = false)(),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "path", org.apache.spark.sql.types.StringType, nullable = false)())
    else
      Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "versions_retained", org.apache.spark.sql.types.LongType,
        nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val keep =
      if (hours) ParquetTable.keepCountForHorizon(session, path, retain * 3600000L)
      else retain
    if (dryRun)
      // `VACUUM … DRY RUN`: the authoritative work list, nothing deleted
      ParquetTable.vacuumPlan(session, path, keep).map { case (k, p) => Row(k, p) }
    else {
      ParquetTable.vacuum(session, path, keep)
      Seq(Row(ParquetTable.versions(session, path).size.toLong))
    }
  }
}

/** `DESCRIBE HISTORY graft.`path`` (also `DESC HISTORY`): one row per
  * committed version, newest first — Delta's DESCRIBE HISTORY tier (see
  * `ParquetTable.history`; manifest-dir listing only, no data I/O, so the
  * collect is one row per version by construction).
  */
/** `FSCK graft.`path``: integrity report — dangling manifest entries,
  * missing data/DV dirs, orphaned bytes (see [[ParquetTable.fsck]]).
  * Report-only: repairs are deliberate verbs (vacuum for orphans; restore
  * or a corrective merge for dangling entries), never automatic.
  */
case class GraftFsckCommand(path: String) extends LeafRunnableCommand {

  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{LongType, StringType}

  override def output: Seq[Attribute] = Seq(
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("detail", StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] =
    ParquetTable.fsck(session, path).collect().toSeq
}

/** Where a table's NDV sketch lives: a `_`-prefixed sibling of the data
  * dirs (the `_graft_manifest`/`_graft_changes` convention — manifest
  * readers list data dirs explicitly and Spark skips `_` paths, so the
  * sketch never leaks into a scan).
  */
private object GraftStats {
  def dir(path: String): String = ParquetTable.statsDir(path)
}

/** `ANALYZE graft.`p` COMPUTE STATISTICS FOR COLUMNS (c1, c2…)`: the
  * full-scan tier — builds the table's NDV sketch at the current head
  * and pins (columns, version) for the incremental tier. Returns the
  * analyzed version.
  */
case class GraftAnalyzeCommand(path: String, cols: Seq[String])
    extends LeafRunnableCommand {

  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.LongType

  override def output: Seq[Attribute] = Seq(
    AttributeReference("analyzed_version", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = Seq(Row(
    graft.operators.StatsSketch.analyze(session, path, cols,
      GraftStats.dir(path))))
}

/** `ANALYZE graft.`p` COMPUTE INCREMENTAL STATISTICS USING PK (k…)`: the
  * change-feed tier — advances the pinned sketch to the table head by
  * sketching only `changes(last, head)` (columns come from the pinned
  * meta, never restated; PK is needed by the snapshot diff). Returns the
  * newly covered version. Delete/update windows flip the sketch to the
  * documented upper-bound mode — see SHOW STATISTICS' `exact` column.
  */
case class GraftAnalyzeIncrementalCommand(path: String, pk: Seq[String])
    extends LeafRunnableCommand {

  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.LongType

  override def output: Seq[Attribute] = Seq(
    AttributeReference("analyzed_version", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = Seq(Row(
    graft.operators.StatsSketch.analyzeIncremental(session, path, pk,
      GraftStats.dir(path))))
}

/** `ANALYZE graft.`p` COMPUTE HISTOGRAM FOR COLUMNS (c1, c2…)`: the
  * histogram tier — the second half of the reference's query-layer
  * statistics opt-in (glue_etl.py:408
  * `spark.sql.statistics.histogram.enabled`). Full-scan like Spark's
  * own histogram ANALYZE (bins are not append-mergeable); numeric
  * columns only. The read path attaches the bins to the plan's column
  * statistics (PlanStats), so skewed-column selectivity under CBO
  * estimates from the real distribution. Returns one row per column
  * with the bin count.
  */
case class GraftAnalyzeHistogramCommand(path: String, cols: Seq[String])
    extends LeafRunnableCommand {

  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{IntegerType, StringType}

  override def output: Seq[Attribute] = Seq(
    AttributeReference("column", StringType, nullable = false)(),
    AttributeReference("bins", IntegerType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    // stamp the bins with the version they describe — the read path's
    // staleness guard refuses bins older than the last full ANALYZE,
    // newer than the snapshot being read, or any bins once an
    // update/delete window flipped the sketch inexact. A plain
    // (non-versioned) location takes the free-standing tier (−1, the
    // pre-r15 behavior of this verb): no lifecycle, bins valid until
    // the next StatsSketch.save re-baseline deletes them
    val v = ParquetTable.currentVersion(session, path).getOrElse(-1L)
    graft.operators.StatsHistogram.build(
        ParquetTable.read(session, path), cols, GraftStats.dir(path),
        version = v)
      .toSeq.sortBy(_._1).map { case (c, bins) => Row(c, bins.size) }
  }
}

/** `SHOW STATISTICS graft.`p``: the per-column NDV estimates of the
  * table's ANALYZE sketch, plus the exactness flag (false once an
  * update/delete window made the estimate a "values ever present"
  * upper bound — re-ANALYZE to reset).
  */
case class GraftShowStatsCommand(path: String) extends LeafRunnableCommand {

  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType, StringType}

  override def output: Seq[Attribute] = Seq(
    AttributeReference("column", StringType, nullable = false)(),
    AttributeReference("m", IntegerType, nullable = false)(),
    AttributeReference("zeros", LongType, nullable = false)(),
    AttributeReference("s_scaled", LongType, nullable = false)(),
    AttributeReference("ndv_est", DoubleType, nullable = false)(),
    AttributeReference("exact", BooleanType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val dir = GraftStats.dir(path)
    val exact = graft.operators.StatsSketch.isExact(session, dir)
    graft.operators.StatsSketch.estimate(session, dir)
      .orderBy("column").collect().toSeq
      .map(r => Row(r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), exact))
  }
}

/** `GENERATE symlink_format_manifest FOR TABLE graft.`path``: Delta's
  * Presto/Athena interop verb (see [[ParquetTable.generateSymlinkManifest]]).
  * One row per manifest file written — per partition for partitioned
  * tables; the collect is metadata-sized by construction.
  */
case class GraftGenerateManifestCommand(path: String)
    extends LeafRunnableCommand {

  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{LongType, StringType}

  override def output: Seq[Attribute] = Seq(
    AttributeReference("manifest", StringType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] =
    ParquetTable.generateSymlinkManifest(session, path)
      .map { case (m, n) => Row(m, n) }
}

case class GraftHistoryCommand(path: String) extends LeafRunnableCommand {

  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, TimestampType}

  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("partitioned", BooleanType, nullable = false)(),
    AttributeReference("n_entries", IntegerType, nullable = false)(),
    AttributeReference("n_data_dirs", IntegerType, nullable = false)(),
    AttributeReference("has_change_manifest", BooleanType, nullable = false)(),
    AttributeReference("commit_ts", TimestampType, nullable = true)(),
    AttributeReference("manifest_mtime", TimestampType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] =
    ParquetTable.history(session, path).collect().toSeq
}

/** `DELETE FROM graft.`path` [WHERE cond]`: rows matching the condition
  * leave the table as the next version. Two tiers, selected by the
  * session conf `spark.graft.delete.mode`:
  *
  *   - `copy-on-write` (default): affected partitions rewrite
  *     (`ParquetTable.delete`) — reads stay join-free;
  *   - `merge-on-read`: a deletion-vector commit
  *     (`ParquetTable.deleteVectors`) — no data file rewrites, reads pay
  *     a DV anti-join until OPTIMIZE materializes. Delta's
  *     `delta.enableDeletionVectors` knob, as a session conf.
  *
  * The condition travels as its SQL rendering, not the parsed
  * `Expression` — an unresolved expression held in a command field would
  * fail the analyzer's resolution check before the command could run; the
  * text re-parses against the target read at run time. Returns one row
  * with the committed version.
  */
case class GraftDeleteCommand(path: String, conditionSql: String)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "committed_version", org.apache.spark.sql.types.LongType,
      nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val cond = org.apache.spark.sql.functions.expr(conditionSql)
    val mode = session.conf.get("spark.graft.delete.mode", "copy-on-write")
    val v = mode match {
      case "copy-on-write" => ParquetTable.delete(session, path, cond)
      case "merge-on-read" => ParquetTable.deleteVectors(session, path, cond)
      case other => throw new IllegalArgumentException(
        s"spark.graft.delete.mode must be copy-on-write or merge-on-read, got '$other'")
    }
    Seq(Row(v))
  }
}

/** `UPDATE graft.`path` SET col = expr[, …] [WHERE cond]`: matching rows
  * get the assignments applied (values cast to the column's type; see
  * `ParquetTable.update`). Expressions travel as SQL text for the same
  * reason as [[GraftDeleteCommand]]. Returns one row with the committed
  * version.
  */
case class GraftUpdateCommand(
    path: String,
    set: Seq[(String, String)],
    conditionSql: Option[String]) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "committed_version", org.apache.spark.sql.types.LongType,
      nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{expr, lit}
    val cond = conditionSql.map(expr).getOrElse(lit(true))
    Seq(Row(ParquetTable.update(session, path, cond,
      set.map { case (k, v) => k -> expr(v) }.toMap)))
  }
}

/** Delegating parser that owns exactly one namespace: `graft.`path``.
  * MERGE INTO / DELETE FROM / UPDATE on a graft target become runnable
  * row-level commands ([[GraftSql.rewrite]], [[GraftDeleteCommand]],
  * [[GraftUpdateCommand]]); graft relations anywhere else — SELECT/JOIN
  * sources, merge sources, subqueries, optionally `VERSION AS OF n` —
  * become versioned-table reads ([[GraftSql.rewriteRelations]]); and
  * `RESTORE TABLE graft.`path` TO VERSION AS OF n` (a statement Spark's
  * grammar lacks) is matched pre-parse. Every other string and plan
  * passes through untouched.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSql.parseMaintenance(sqlText).getOrElse(
      GraftSql.dispatch(delegate.parsePlan(sqlText)))

  override def parsePlanWithParameters(
      sqlText: String, ctx: ParameterContext): LogicalPlan =
    GraftSql.parseMaintenance(sqlText).getOrElse(
      GraftSql.dispatch(delegate.parsePlanWithParameters(sqlText, ctx)))

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
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
