package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Managed Parquet tables with Delta-MERGE-equivalent observable semantics.
  *
  * The reference writes Delta tables and upserts with
  * `whenMatchedUpdateAll.whenNotMatchedInsertAll` on the primary key
  * (reference: src/glue_etl.py:335-366). No Delta jars exist in this
  * environment, so the same observable semantics are provided over plain
  * Parquet:
  *
  *   - `create`: overwrite, partitioned (glue_etl.py:360-366);
  *   - `append`: partitioned append — rejected-records sink
  *     (glue_etl.py:274-277);
  *   - `merge`: upsert-by-PK. For PARTITIONED tables this is
  *     partition-scoped: only partitions present in the update set are
  *     rewritten (dynamic partition overwrite), so merging one day of data
  *     into a 100 TB / 3-year table rewrites one day, not 100 TB. For
  *     unpartitioned tables it falls back to a full rewrite published as a
  *     new manifest version.
  *
  * Atomicity & versioning: Delta gets both from its transaction log. Here,
  * UNPARTITIONED tables use a minimal manifest: each full rewrite lands in
  * a fresh uniquely-named data dir (underscore-prefixed — invisible to
  * plain parquet listings; unique so two racing writers can never collide
  * in one staging dir) and is published by ONE atomic manifest commit
  * under `_graft_manifest/` recording that dir. `read` resolves the newest
  * manifest, so
  * a reader sees version N or N+1, never a half-written or missing dir,
  * and an already-resolved plan keeps reading its (still-present) old dir
  * to completion. `readAt` gives "query as of version N"; `vacuum` retires
  * old versions. Every publish goes through the pluggable [[LogCommitter]]
  * seam (`logCommitter`): the default dispatches to a hard-link CAS on
  * local FS and an atomic no-replace rename on HDFS; an object-store
  * deployment swaps in a conditional-PUT/CAS committer (same factoring as
  * Delta's LogStore) without touching this layer.
  * PARTITIONED tables version through the same manifest with
  * per-partition entries (`createVersioned`/`mergeVersioned`): each merge
  * writes only the affected partitions into a fresh uniquely-named data
  * dir and atomically publishes a manifest re-pointing just those
  * entries — untouched partitions get zero I/O, old manifests keep
  * resolving their old dirs (snapshot isolation + time travel), and
  * `vacuum` is reference-aware. Plain (unversioned) partitioned layouts
  * still merge via Spark's dynamic partition overwrite, which commits
  * per-partition without cross-partition atomicity. The pipeline's
  * idempotency (MERGE replay, reference README.md:102-105) additionally
  * survives because merge-by-PK is idempotent.
  */
object ParquetTable {

  final case class MergeStats(updated: Long, inserted: Long)

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // DDL registered BEFORE the first write (constraints, generation or
    // identity rules) must not make the table "exist": those files are
    // rules about future data, not data — a path holding only them still
    // takes the create path
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("._graft_") && n != "_graft_constraints" &&
        n != "_graft_generated" && n != "_graft_identity" &&
        n != "_graft_properties"
    }
  }

  /** Current table state: the newest manifest version when `path` is a
    * versioned table, the plain parquet dir otherwise.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    currentVersion(spark, path) match {
      case Some(v) => readVersion(spark, path, v)
      case None => spark.read.parquet(path)
    }

  /** Time travel: the table exactly as published by manifest `version`. */
  def readAt(spark: SparkSession, path: String, version: Long): DataFrame = {
    require(versions(spark, path).contains(version),
      s"readAt: version $version not present at $path " +
        s"(have: ${versions(spark, path).mkString(", ")})")
    readVersion(spark, path, version)
  }

  /** Latest version whose commit time is ≤ `tsMillis` — Delta's
    * `TIMESTAMP AS OF` resolution rule. Commit times come from the
    * manifests' `#ts=` headers (committed state — see [[commitTimestamp]]);
    * headerless legacy manifests fall back to manifest mtime, best
    * effort. Commit times are written by serialized CAS commits on one
    * table so they are monotone up to wall-clock skew; taking the MAX
    * eligible version makes small skew harmless (a locally-late stamp on
    * an earlier version cannot shadow a later one). Throws when
    * `tsMillis` predates the first commit, like Delta.
    */
  def versionAtTimestamp(spark: SparkSession, path: String, tsMillis: Long): Long = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"versionAtTimestamp: no versioned table at $path")
    val md = manifestDir(path)
    val fs = hadoopFs(spark, md)
    def ts(v: Long): Long = commitTimestamp(spark, path, v).getOrElse(
      fs.getFileStatus(new Path(md, f"v$v%020d")).getModificationTime)
    val eligible = vs.filter(ts(_) <= tsMillis)
    require(eligible.nonEmpty,
      s"timestamp $tsMillis predates the first commit of $path " +
        s"(first commit at ${ts(vs.min)})")
    eligible.max
  }

  /** Time travel by wall clock: the table as of `tsMillis`. */
  def readAtTimestamp(spark: SparkSession, path: String, tsMillis: Long): DataFrame =
    readAt(spark, path, versionAtTimestamp(spark, path, tsMillis))

  /** Predicate-carrying read with FILE-LEVEL data skipping: consults the
    * per-data-dir stats sidecars ([[DataSkipping]] — committed alongside
    * every versioned write) and scans only the files whose [min, max]
    * intervals may satisfy `predicate`; the predicate is then re-applied
    * in full, so results always equal `read(...).filter(predicate)`.
    * Planning cost is O(sidecars read), not O(files probed) — at 100 TB
    * the scan list shrinks BEFORE Spark ever opens a footer. Pair with
    * [[optimize]] (Z-order) to make intervals tight on several columns
    * at once. Plain unversioned layouts fall back to an ordinary
    * filtered read (Spark's own row-group pruning still applies).
    */
  def readWhere(spark: SparkSession, path: String, predicate: Column): DataFrame =
    currentVersion(spark, path) match {
      case None => spark.read.parquet(path).filter(predicate)
      case Some(v) =>
        val groups = prunedFileGroups(spark, path, v, predicate)
        if (groups.forall(_._2.isEmpty))
          readVersion(spark, path, v).filter(predicate).limit(0)
        else {
          // post-evolution, dirs can carry different (append-only) schemas;
          // align each to the version's schema so the union is exact
          val align = versionSchema(spark, path, v)
            .map(s => (df: DataFrame) => alignTo(df, s))
            .getOrElse(identity[DataFrame] _)
          // deletion vectors filter each leg BEFORE align/union (metadata
          // columns only resolve on the scan relation); file-level stats
          // pruning stays conservative — a DV only removes rows
          val dv = dvOf(spark, path, v)
          extendDefaults(spark, path, v, applyColmap(spark, path, v,
            groups.filter(_._2.nonEmpty).map { case (base, rels) =>
              align(dvFilterLeg(spark.read.option("basePath", base)
                .parquet(rels.map(r => s"$base/$r"): _*), dv))
            }.reduce(_.unionByName(_, allowMissingColumns = true))))
            .filter(predicate)
        }
    }

  /** (data-dir base, kept relative files) per data dir of `version`,
    * after stats pruning — the observable core of [[readWhere]] (specs
    * assert on the kept counts). For partitioned versions, only files
    * under partition subdirs the manifest references are eligible (a
    * shared data dir may hold partitions belonging to other versions).
    */
  private[graft] def prunedFileGroups(
      spark: SparkSession, path: String, version: Long,
      predicate: Column): Seq[(String, Seq[String])] = {
    val analyzedCond = readVersion(spark, path, version).filter(predicate)
      .queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }
    // stats sidecars and bloom indexes key on PHYSICAL column names; the
    // analyzed predicate references the LOGICAL view (readVersion applies
    // the colmap last). Rewrite attributes logical→physical before any
    // probe — with a vacated name reused (rename a→x, then c→a) the raw
    // predicate would consult the OLD physical a's min/max (or bloom) and
    // silently skip files that match (ADVICE r9 high).
    val inv = columnMapping(spark, path, version)._1
      .map { case (p, l) => l.toLowerCase -> p }
    val cond =
      if (inv.isEmpty) analyzedCond
      else analyzedCond.map(_.transform {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
            if inv.contains(a.name.toLowerCase) =>
          a.withName(inv(a.name.toLowerCase))
      })
    partitionEntries(spark, path, version) match {
      case None =>
        unpartitionedDirs(spark, path, version).map { dd =>
          val dir = new Path(path, dd).toString
          dir -> DataSkipping.candidateFiles(spark, dir, cond)
        }
      case Some(entries) =>
        entries.groupBy(_._2).toSeq.sortBy(_._1).map { case (dataDir, es) =>
          val base = new Path(path, dataDir).toString
          val parts = es.map(_._1)
          base -> DataSkipping.candidateFiles(spark, base, cond)
            .filter(rel => parts.exists(p => rel.startsWith(p + "/")))
        }
    }
  }

  /** OPTIMIZE-ZORDER tier: republish the current image clustered on
    * `zorderBy` across `numFiles` write tasks (see [[DataSkipping.zorder]])
    * as the next version — old versions keep time-traveling, and the
    * fresh data dir's stats sidecar makes [[readWhere]] (and any
    * FileIndex-served plan) prune on every clustered column. PARTITIONED
    * versioned tables cluster WITHIN partitions: one job range-partitioned
    * by (partitionCols…, z), so each file covers a narrow z interval
    * inside its partition dir — Delta's per-partition OPTIMIZE ZORDER
    * shape; `zorderBy` must be data columns there.
    */
  def optimize(
      spark: SparkSession, path: String, zorderBy: Seq[String],
      numFiles: Int = 8, bits: Int = 8,
      writeOptions: Map[String, String] = Map.empty): Long = {
    val v0 = currentVersion(spark, path).getOrElse(throw new IllegalStateException(
      s"optimize: no versioned table at $path"))
    partitionEntries(spark, path, v0) match {
      case None =>
        publishMaintenance(spark, path, "optimize", Nil,
          v => DataSkipping.zorder(readVersion(spark, path, v), zorderBy,
            numFiles, bits),
          writeOptions = writeOptions)
      case Some(entries) =>
        // partitioned: cluster WITHIN partitions in ONE job — range-
        // partition by (partitionCols…, z) so each task holds a
        // contiguous (partition, z) slab, and the partitioned write
        // splits the dirs; every file then covers a narrow z interval
        // inside its partition, which is what the sidecar pruning feeds
        // on. `numFiles` bounds total write tasks, not files-per-
        // partition (Delta OPTIMIZE ZORDER's per-partition binning).
        val partitionColumns = entries.head._1.split('/').toSeq.map(_.split('=')(0))
        require(zorderBy.forall(c => !partitionColumns.exists(_.equalsIgnoreCase(c))),
          s"optimize: Z-order columns must be data columns " +
            s"(${partitionColumns.mkString(", ")} are partition columns — " +
            "constant within a dir, nothing to cluster)")
        publishMaintenance(spark, path, "optimize", partitionColumns,
          { v =>
            val cur = readVersion(spark, path, v)
            val keys = partitionColumns.map(col) :+ col("__graft_z")
            cur
              .withColumn("__graft_z", DataSkipping.zValue(cur, zorderBy, bits))
              .repartitionByRange(numFiles, keys: _*)
              .sortWithinPartitions(keys: _*)
              .drop("__graft_z")
          },
          preserveLayout = true, writeOptions = writeOptions)
    }
  }

  /** OPTIMIZE with a BLOOM FILTER index build (the Databricks
    * bloom-index recipe: declare the index, OPTIMIZE writes it): rewrite
    * the current image with NATIVE parquet bloom filters on `bloomFor`
    * columns (the standard `parquet.bloom.filter.enabled#col` writer
    * property — any parquet reader sees ordinary files), optionally
    * Z-ordered on `zorderBy`. The refreshed stats sidecar records which
    * columns carry blooms, and [[readWhere]]/[[GraftFileIndex]] pruning
    * gains a point-lookup tier: equality predicates probe the blooms of
    * min/max-surviving files and drop the ones that cannot contain the
    * value — the skipping min/max cannot provide on high-cardinality,
    * unclustered columns (uuid/fingerprint lookups at 100 TB), at one
    * footer+bloom-page read per probed file, no data I/O, false
    * positives only (never false negatives — results never change).
    */
  def optimizeBloom(
      spark: SparkSession, path: String, bloomFor: Seq[String],
      zorderBy: Seq[String] = Nil, numFiles: Int = 8): Long = {
    require(bloomFor.nonEmpty, "optimizeBloom: empty bloom column list")
    currentVersion(spark, path).getOrElse(throw new IllegalStateException(
      s"optimizeBloom: no versioned table at $path"))
    // per-write options, NOT SparkContext.hadoopConfiguration: mutating
    // the shared conf let concurrent writes in the same session pick up
    // bloom writer props, and the unconditional unset clobbered any
    // user-set values (ADVICE r9 low)
    val bloomOpts = bloomFor
      .map(c => s"parquet.bloom.filter.enabled#$c" -> "true").toMap
    if (zorderBy.nonEmpty)
      optimize(spark, path, zorderBy, numFiles, writeOptions = bloomOpts)
    else {
      // plain rewrite (compact-shaped, but across numFiles so the
      // bloom tier has per-file filters worth pruning between)
      val v0 = currentVersion(spark, path).get
      partitionEntries(spark, path, v0) match {
        case None =>
          publishMaintenance(spark, path, "optimizeBloom", Nil,
            v => readVersion(spark, path, v).repartition(numFiles),
            writeOptions = bloomOpts)
        case Some(entries) =>
          val partitionColumns =
            entries.head._1.split('/').toSeq.map(_.split('=')(0))
          publishMaintenance(spark, path, "optimizeBloom", partitionColumns,
            v => readVersion(spark, path, v),
            filesPerPartition = math.max(1, numFiles),
            writeOptions = bloomOpts)
      }
    }
  }

  /** Overwrite-create. Partitioned layouts stay plain (hive-style dirs at
    * `path`, catalog-registrable via LOCATION); unpartitioned tables are
    * created as manifest version 1 (or the next version if the path
    * already holds a versioned table). `filesPerPartition > 1` splits each
    * hot partition's write across that many files/tasks (see
    * clusterByPartitions).
    */
  def create(
      df: DataFrame, path: String, partitionColumns: Seq[String] = Nil,
      filesPerPartition: Int = 1): Unit = {
    val g = GeneratedColumns.fill(df.sparkSession, path,
      ColumnDefaults.fill(df.sparkSession, path,
        IdentityColumns.fill(df.sparkSession, path, df)))
    if (partitionColumns.nonEmpty) {
      Constraints.validateFrame(g.sparkSession, path, g)
      writePlain(g, path, partitionColumns, filesPerPartition)
    } else atomicReplace(g.sparkSession, path, g, Nil)
  }

  /** Cluster rows onto their target partitions before a `partitionBy`
    * write. Without this every write task opens a writer for every
    * partition value it happens to hold, so a W-task write into P
    * partitions emits up to W×P files (measured: a 150k-row
    * date-partitioned ingest at sf0.1 scattered ~19k tiny files and spent
    * ~200 s mostly opening/closing writers; clustered it is one file per
    * partition). A hot partition bigger than one task's share can ask for
    * `filesPerPartition > 1`: a deterministic row-hash salt splits it into
    * that many files (deterministic so task retries re-produce the same
    * assignment — no rand()).
    */
  private def clusterByPartitions(
      df: DataFrame, partitionColumns: Seq[String], filesPerPartition: Int): DataFrame =
    if (partitionColumns.isEmpty) df
    else {
      val keys = partitionColumns.map(col)
      val exprs =
        if (filesPerPartition <= 1) keys
        else keys :+ pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(filesPerPartition))
      df.repartition(exprs: _*)
    }

  /** Target bytes per data file for image writes — the guide-§6 band
    * (output files around 128 MB–1 GB, never one file per reduce
    * partition regardless of size). `<= 0` disables the sizing.
    */
  val TargetFileBytesConf = "spark.graft.write.targetFileBytes"

  private def targetFileBytes(spark: SparkSession): Long =
    java.lang.Long.parseLong(spark.conf.get(
      TargetFileBytesConf, String.valueOf(128L * 1024 * 1024)))

  /** Same policy as [[sizedForWrite]] — separate name kept for the
    * call sites' intent documentation: artifact writes whose PLAN
    * embeds heavy per-row compute that the write itself is the first
    * action to materialize (MinHash banding, tokenize+count builds).
    */
  private[graft] def sizedForWriteShuffled(df: DataFrame): DataFrame =
    sizedForWrite(df)

  /** Size an UNPARTITIONED image/artifact write by the byte estimate
    * instead of inheriting the plan's partitioning. Without this every
    * commit writes `spark.sql.shuffle.partitions` files however small
    * the image — the small-files tax (guide §6) is then paid on every
    * later footer census, file listing and scan of the snapshot, and at
    * cluster conf (thousands of shuffle partitions) a modest commit
    * scatters thousands of KB-sized files. The estimate is the analyzed
    * plan's sizeInBytes — for parquet scans the actual compressed input
    * bytes; filters/joins only ever round it UP (size-only visitor), so
    * the derived count errs toward MORE files, never a starved write.
    * Fires only when the write would otherwise scatter tiny files, and
    * resizes with a post-compute `repartition` — see the inline
    * comments for why each of those choices is load-bearing.
    */
  private[graft] def sizedForWrite(df: DataFrame): DataFrame = {
    val target = targetFileBytes(df.sparkSession)
    // a repartition/coalesce at the ROOT of the caller's plan (under
    // row-preserving wrappers only) is a layout directive — "write
    // exactly these partitions" — and the sizing must never silently
    // override it. Deeper repartitions (e.g. a reader fanning a
    // single-file scan out for compute) are NOT write-layout intent and
    // stay subject to sizing.
    @annotation.tailrec
    def rootDirective(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p match {
        case _: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation => true
        case pr: org.apache.spark.sql.catalyst.plans.logical.Project => rootDirective(pr.child)
        case sa: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => rootDirective(sa.child)
        case _ => false
      }
    if (target <= 0L || rootDirective(df.queryExecution.analyzed)) df
    else {
      // ANALYZED plan stats, not optimized: the size-only visitor reads
      // the same leaf bytes either way (filters/joins don't shrink the
      // estimate without CBO), and asking for the optimized plan here
      // would run the optimizer a SECOND time per commit — the write
      // itself re-plans the resized tree (measured ~0.3-0.5 s per
      // commit on merge-sized plans)
      // A SHUFFLE-FREE plan (scan → project/filter → write) already
      // writes bytes-proportional file counts — its partitioning IS the
      // scan's splits — so packing it buys nothing and the repartition
      // exchange is pure waste (measured on q57's fixture create at
      // sf1: ~27 MB of parquet re-shuffled to produce the same one
      // file the scan would have written). Only a plan with a
      // shuffle-inducing operator scatters `spark.sql.shuffle.partitions`
      // files regardless of size.
      import org.apache.spark.sql.catalyst.plans.logical._
      val scattersFiles = df.queryExecution.analyzed.exists {
        case _: Join | _: Aggregate | _: Distinct | _: Deduplicate => true
        case _: Window | _: Sort | _: RepartitionOperation => true
        case _: Intersect | _: Except => true
        case _ => false
      }
      val est = df.queryExecution.analyzed.stats.sizeInBytes
      // Fire ONLY for a genuinely SMALL artifact — estimate at or under
      // a quarter of one target file (32 MiB at the default). Such an
      // artifact gains nothing from more files (openCost packing folds
      // its sibling files into 1-2 scan splits either way) and loses a
      // footer-census open + listing entry per file on every later
      // read. Anything bigger keeps its native layout: the files ARE
      // the downstream scan's split parallelism, and resizing them was
      // measured (sf1, take 1 of this change) to serialize the next
      // merge's join and the full-scan ANALYZE for seconds per commit —
      // far more than the metadata it saved. Join-shaped plans (change
      // manifests, DV slices) estimate as size PRODUCTS under the
      // size-only visitor and therefore never fire — correct, if
      // accidental: their consumers full-scan them.
      if (!scattersFiles || est > target / 4) df
      else
        // `repartition`, DELIBERATELY not `coalesce`: coalesce imposes
        // the file count by collapsing the plan's final stage, which
        // serializes whatever compute lives there (measured at sf1: a
        // coalesce(1)d merge ran its whole join+encode on one core —
        // q57 3.5 s → 16.2 s, q148 17.6 s → 61.4 s). The repartition
        // exchange moves only the bytes about to be written — by
        // construction at most a quarter target file.
        df.repartition(1)
    }
  }

  // Images bigger than the [[sizedForWrite]] small-artifact bar keep
  // their native reduce partitioning: the files ARE the downstream
  // scan's split parallelism (measured at sf1 — resized images
  // serialized the next merge's join). At cluster conf the production
  // answer for image file sizing is AQE partition coalescing
  // (advisoryPartitionSizeInBytes) right-sizing the reduce stage that
  // feeds the write (SURVEY §4); the bench's AQE-off setting is a
  // local-VM workaround, not a production recommendation.
  private def writePlain(
      df: DataFrame, path: String, partitionColumns: Seq[String],
      filesPerPartition: Int = 1,
      writeOptions: Map[String, String] = Map.empty,
      sizeAdaptive: Boolean = true): Unit = {
    // writer options land in THIS job's hadoop conf only (Spark's
    // newHadoopConfWithOptions), so parquet writer properties — bloom
    // filters, per-column settings — never leak into concurrent writes
    // through the shared SparkContext configuration (ADVICE r9 low)
    val out =
      if (partitionColumns.isEmpty && sizeAdaptive) sizedForWrite(df)
      else clusterByPartitions(df, partitionColumns, filesPerPartition)
    val w = out.write.mode(SaveMode.Overwrite).options(writeOptions)
    (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
      .parquet(path)
  }

  def append(
      df: DataFrame, path: String, partitionColumns: Seq[String] = Nil,
      filesPerPartition: Int = 1): Unit = {
    val g = GeneratedColumns.fill(df.sparkSession, path,
      ColumnDefaults.fill(df.sparkSession, path,
        IdentityColumns.fill(df.sparkSession, path, df)))
    // plain layout: no pre-publish dir to read back, so the incoming
    // frame is validated instead (one pass; no-op without constraints)
    Constraints.validateFrame(g.sparkSession, path, g)
    val w = clusterByPartitions(g, partitionColumns, filesPerPartition)
      .write.mode(SaveMode.Append)
    (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
      .parquet(path)
  }

  /** Pure merge plan: rows of `target` whose PK appears in `updates` are
    * replaced by the update row; unmatched update rows are inserted.
    * `updates` is PK-deduplicated first (MERGE requires a unique source key).
    * One anti-join + union — AQE broadcasts the deduplicated update keys
    * when they are small.
    *
    * `evolveSchema = false` (default): updates must carry the target's
    * columns; extras are dropped (Delta's default strictness lives in the
    * select, which fails on a MISSING column). `evolveSchema = true` is
    * Delta `mergeSchema` parity: columns new in `updates` are appended to
    * the table schema (existing rows read NULL there), and update rows
    * missing target columns carry typed NULLs.
    */
  def mergeFrames(
      target: DataFrame, updates: DataFrame, pk: Seq[String],
      evolveSchema: Boolean = false,
      broadcastKeys: Option[Boolean] = None): DataFrame =
    if (!evolveSchema) {
      val cols = target.columns.toSeq
      val upd = updates.dropDuplicates(pk).select(cols.map(col): _*)
      val updKeys = hintKeys(upd.select(pk.map(col): _*).distinct(), broadcastKeys)
      // a using-columns join hoists the pk columns to the front of the
      // output; re-select so merge preserves the table's column order
      // (otherwise every commit silently reorders the table pk-first)
      target.join(updKeys, pk, "left_anti").select(cols.map(col): _*)
        .unionByName(upd)
    } else {
      val extra = updates.columns
        .filterNot(c => target.columns.exists(_.equalsIgnoreCase(c)))
      val widenedTarget = extra.foldLeft(target)((df, c) =>
        df.withColumn(c, lit(null).cast(
          updates.schema.find(_.name.equalsIgnoreCase(c)).get.dataType)))
      val missing = target.columns
        .filterNot(c => updates.columns.exists(_.equalsIgnoreCase(c)))
      val upd = missing.foldLeft(updates.dropDuplicates(pk))((df, c) =>
        df.withColumn(c, lit(null).cast(target.schema(c).dataType)))
        .select(widenedTarget.columns.map(col).toSeq: _*)
      val updKeys = hintKeys(upd.select(pk.map(col): _*).distinct(), broadcastKeys)
      widenedTarget.join(updKeys, pk, "left_anti")
        .select(widenedTarget.columns.map(col).toSeq: _*)
        .unionByName(upd)
    }

  // ---- stats-informed merge planning -------------------------------------

  /** Where ANALYZE pins the table's NDV sketch (the SQL verbs' convention:
    * a `_`-prefixed sibling of the data dirs, invisible to scans).
    */
  def statsDir(path: String): String = s"$path/_graft_stats"

  /** Whether the table has been ANALYZEd (a pinned sketch exists at
    * [[statsDir]]). Metadata-only existence probe.
    */
  def hasStats(spark: SparkSession, path: String): Boolean = {
    val p = new Path(statsDir(path), "meta")
    hadoopFs(spark, p).exists(p)
  }

  /** Kill switch for stats-informed merge planning (`true` by default —
    * the real opt-in is having run ANALYZE on the table at all).
    */
  val StatsHintsConf = "spark.graft.stats.mergeHints"

  /** Estimated matched fraction (update-key NDV / table-pk NDV) at or
    * above which an auto-tiered merge takes the copy-on-write rewrite
    * even on a table big enough for merge-on-read: a bulk update
    * approaching table size makes MOR append ~the whole table AND keep
    * the DV'd old image alive — double storage until OPTIMIZE, for no
    * read benefit. The scaladoc of [[merge]] used to delegate this call
    * to the caller ("force Some(false) for bulk updates"); with an
    * ANALYZEd table the engine now makes it from statistics.
    */
  val BulkUpdateCowFraction: Double = 0.5

  /** The numerator of the bulk fraction is an HLL ESTIMATE (standard
    * error 1.04/√m ≈ 1.6% at p = 12): a workload sitting exactly ON the
    * boundary would flip MOR↔COW per run/scale on estimator noise — and
    * the two tiers' byte profiles differ by a whole table image
    * (measured: the r14 bytes gate caught exactly this on a
    * 50%-of-keys fixture). The probe must therefore clear the boundary
    * by its own 2σ before the IRREVERSIBLE tier (the full rewrite) is
    * chosen; at the boundary the reversible tier wins — MOR's extra
    * storage folds away at the next OPTIMIZE, a rewrite cannot be
    * un-written.
    */
  private def bulkDemotionBar(p: Int): Double =
    BulkUpdateCowFraction * (1.0 + 2.0 * 1.04 / math.sqrt((1 << p).toDouble))

  /** Stats-informed physical decisions for one merge. `broadcastKeys`:
    * Some(true) → broadcast the deduplicated update-key set into the
    * anti/semi joins, Some(false) → force sort-merge (the key set
    * provably exceeds the broadcast threshold — protects the driver
    * from a statically lowballed broadcast), None → no opt-in, leave
    * the choice to Catalyst/AQE. `bulkUpdate`: the update set covers ≥
    * [[BulkUpdateCowFraction]] of the table's pk NDV, so the auto tier
    * should rewrite instead of merge-on-read.
    */
  final case class MergeStatsPlan(
      broadcastKeys: Option[Boolean], bulkUpdate: Boolean)

  /** The session's `spark.sql.autoBroadcastJoinThreshold` in bytes.
    * Plain numbers (including "-1" = disabled) don't parse as byte
    * strings — try the bare-long form first.
    */
  private[graft] def autoBroadcastThreshold(spark: SparkSession): Long = {
    val raw =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    scala.util.Try(raw.toLong).getOrElse(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw))
  }

  val NoStatsPlan: MergeStatsPlan = MergeStatsPlan(None, bulkUpdate = false)

  /** The CBO loop closed: the reference opts into cost-based planning by
    * conf (glue_etl.py:407-408 `spark.sql.cbo.enabled`); here the opt-in
    * is having ANALYZEd the table — when `_graft_stats` exists, ONE
    * register-bounded column-pruned pass sketches the update set's key
    * NDV and sizes the deduplicated key set (NDV × Catalyst defaultSize
    * key width) against `spark.sql.autoBroadcastJoinThreshold`.
    *
    * Why Catalyst/AQE don't subsume this: the updates side of a merge is
    * routinely a DERIVED frame (a CDC batch, a join, a generated feed)
    * whose static `sizeInBytes` is off by orders of magnitude in both
    * directions — a 10M-event CDC batch over 1k keys statically "can't"
    * be broadcast though its distinct-key set is a few KB, and AQE's
    * runtime rescue only converts the join AFTER the target's shuffle
    * map side has been written: at 100 TB, writing the table to shuffle
    * storage IS the cost being decided. The NDV probe costs one pass
    * over the SMALL side and moves the decision before any exchange is
    * planned.
    *
    * The bulk-update demotion sizes the TABLE side as the snapshot's
    * sidecar row count: pk is unique by merge contract, so table pk NDV
    * = row count — exact, metadata-only, and defined for COMPOSITE pks
    * (r13 gated on pk.size == 1 because the per-column sketch cannot
    * bound a composite key; the row count can — VERDICT r13 item 3).
    * MOR dirs may still carry DV-superseded rows, over-counting the
    * denominator → the fraction under-states → conservative, stays MOR.
    * Pre-sidecar single-column-pk tables fall back to the persisted
    * ANALYZE sketch (same conservatism: an upper-bound sketch after
    * delete windows over-states table NDV).
    */
  private[graft] def planMergeStats(
      spark: SparkSession, path: String, updates: DataFrame,
      pk: Seq[String]): MergeStatsPlan = {
    if (spark.conf.get(StatsHintsConf, "true") != "true") return NoStatsPlan
    if (!hasStats(spark, path)) return NoStatsPlan
    if (!pk.forall(updates.columns.contains)) return NoStatsPlan
    val threshold = autoBroadcastThreshold(spark)
    // auto-broadcast disabled by the user: planning broadcasts anyway
    // would override that choice — stay out entirely
    if (threshold <= 0) return NoStatsPlan
    val ndvU = graft.operators.StatsSketch.ndvEstimate(updates, pk)
    // key width per Catalyst's own convention (DataType.defaultSize) plus
    // 16 B/entry of hashed-relation bookkeeping
    val keyBytes = pk.map(c => updates.schema(c).dataType.defaultSize.toLong)
      .sum + 16L
    val broadcastKeys = Some(ndvU * keyBytes <= threshold)
    val bulk = {
      val ndvT: Option[Double] = currentVersion(spark, path)
        .flatMap(snapshotRowsFromSidecars(spark, path, _)).map(_.toDouble)
        .orElse(if (pk.size != 1) None else try {
          graft.operators.StatsSketch.estimate(spark, statsDir(path))
            .filter(col("column") === pk.head).collect().headOption
            .map(r => r.getDouble(r.fieldIndex("ndv_est")))
        } catch { case scala.util.control.NonFatal(_) => None })
      ndvT.exists(t => t > 0 &&
        ndvU / t >= bulkDemotionBar(graft.operators.StatsSketch.DefaultPrecision))
    }
    MergeStatsPlan(broadcastKeys, bulk)
  }

  /** Apply the planner's side decision to a deduplicated key set. */
  private def hintKeys(keys: DataFrame, broadcastKeys: Option[Boolean]): DataFrame =
    broadcastKeys match {
      case Some(true)  => broadcast(keys)
      case Some(false) => keys.hint("merge")
      case None        => keys
    }

  /** Upsert `updates` into the table at `path` (creating it if absent).
    * On an unpartitioned VERSIONED table, `mergeOnRead` picks the commit
    * tier: Some(true) → [[mergeVectors]] (matched rows retired by
    * deletion vector, update rows appended — an O(update rows) commit
    * instead of a full rewrite); Some(false) → the copy-on-write
    * rewrite; None (default) → auto by table size from the sidecars
    * (metadata-only, no scan): tables above [[MorAutoRowsFloor]] rows
    * take the merge-on-read tier, smaller ones rewrite — below the
    * floor a rewrite is cheaper than MOR's extra join/probe jobs, above
    * it rewrite cost grows with the table while MOR stays O(updates).
    * Force Some(false) for bulk updates approaching table size (MOR
    * would append ~the whole table and DV the old image — double
    * storage until OPTIMIZE). Plain layouts and schema evolution always
    * rewrite.
    * `cdf = true` additionally captures this commit's change rows into a
    * per-commit change manifest (see [[tableChanges]]) — one extra join
    * over the affected slice at merge time, Delta-CDF-style opt-in.
    * `evolveSchema = true` (versioned tables; Delta `mergeSchema`
    * parity) appends columns new in `updates` to the table schema — see
    * [[mergeFrames]]; time travel keeps showing each version's own
    * schema. On PARTITIONED versioned tables only affected partitions
    * rewrite widened; untouched partitions keep their old data dirs,
    * whose files read the appended columns as typed NULLs (reads align
    * every dir to the version's superset sidecar schema — Delta's
    * read-time evolution, with the log replaced by the sidecars). Not
    * combinable with `cdf` in one call (a change feed cannot straddle
    * two schemas in one commit): evolve first, capture from the next
    * merge.
    *
    * `txn = Some(appId -> txnVersion)` makes the merge IDEMPOTENT under
    * re-delivery (Delta's `txnAppId`/`txnVersion`): the marker commits
    * atomically with the data, a batch at or below the app's committed
    * watermark is skipped entirely, and the commit loops re-check under
    * the CAS race so two racing replays of one batch commit once. This
    * is the exactly-once primitive for streaming foreachBatch sinks
    * (txnVersion = batchId); txn versions must be monotone per app.
    */
  def merge(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      pk: Seq[String],
      partitionColumns: Seq[String] = Nil,
      filesPerPartition: Int = 1,
      cdf: Boolean = false,
      evolveSchema: Boolean = false,
      txn: Option[(String, Long)] = None,
      mergeOnRead: Option[Boolean] = None,
      combine: Option[(DataFrame, DataFrame) => DataFrame] = None): Unit = {
    // column mapping: the COW tiers below compute in LOGICAL space and
    // publish through atomicReplace, a full-image commit that writes
    // logical names and does NOT carry the map — i.e. the merge
    // materializes the mapping as a side effect, like compact. The MOR
    // tier translates its appended dir to physical names and carries the
    // map (see mergeVectors).
    require(!(cdf && evolveSchema),
      "merge: cdf capture and schema evolution cannot share a commit; " +
        "evolve first, then capture from the next merge")
    // `combine` (the conditional-clause MERGE hook — see GraftSql's
    // WHEN MATCHED AND … THEN DELETE support) replaces the upsert image
    // builder [[mergeFrames]] with a caller-provided (targetSlice,
    // dedupedSource) => newSlice. It composes with the partition-scoped
    // and copy-on-write commit machinery but NOT with: the merge-on-read
    // tier (clause semantics need the rewrite), cdf capture (the
    // key-scoped right-outer diff assumes merge never deletes), or
    // schema evolution.
    require(!(combine.isDefined && cdf),
      "merge: conditional clauses (combine) and cdf capture cannot share a commit")
    require(!(combine.isDefined && evolveSchema),
      "merge: conditional clauses (combine) cannot evolve the schema")
    require(!(combine.isDefined && mergeOnRead.contains(true)),
      "merge: conditional clauses (combine) take the rewrite tier, not merge-on-read")
    requireTxnAppId(txn)
    // idempotent-write fast path (Delta txnAppId/txnVersion): a batch at
    // or below the app's committed watermark is a re-delivery — skip it
    // before any work. The commit loops re-check under the CAS race.
    if (exists(spark, path) && txnAlreadyApplied(spark, path, txn)) return
    if (!exists(spark, path)) {
      require(combine.isEmpty,
        s"merge: conditional clauses need an existing target table at $path")
      if (partitionColumns.isEmpty)
        atomicReplace(spark, path, updates.dropDuplicates(pk), Nil, txn)
      else {
        require(txn.isEmpty, "merge: txn markers need a versioned table; the " +
          "initial partitioned load via merge is a plain layout (use " +
          "createVersioned + mergeVersioned for versioned partitioned txn)")
        create(updates.dropDuplicates(pk), path, partitionColumns, filesPerPartition)
      }
      return
    }
    TableProperties.requireNotAppendOnly(spark, path, "merge")
    // a partitioned VERSIONED table (manifest with partition entries)
    // always merges through the manifest, regardless of how it was opened
    if (currentVersion(spark, path)
        .exists(v => partitionEntries(spark, path, v).isDefined)) {
      require(partitionColumns.nonEmpty,
        s"merge: $path is a partitioned versioned table; pass its partition columns")
      mergeVersioned(spark, path, updates, pk, partitionColumns, filesPerPartition,
        cdf, evolveSchema, txn, mergeOnRead, combine)
      return
    }
    val target = read(spark, path)
    // stats-informed planning (see [[planMergeStats]]) — lazy: the probe
    // pass over `updates` runs only on a branch that consults it
    lazy val statsPlan = planMergeStats(spark, path, updates, pk)
    if (partitionColumns.nonEmpty) {
      require(!cdf, s"merge: cdf capture needs a versioned table; $path is a " +
        "plain partitioned layout (use createVersioned/mergeVersioned)")
      require(!evolveSchema, s"merge: schema evolution needs a versioned table; " +
        s"$path is a plain partitioned layout")
      require(txn.isEmpty, s"merge: txn markers need a versioned table; " +
        s"$path is a plain partitioned layout")
      // Partition-scoped merge: read ONLY the affected partitions (partition
      // pruning via a dynamic IN-filter on collected partition values — the
      // partition-value set is small by construction: one row per partition
      // directory), merge, and rewrite just those partitions.
      val upd = GeneratedColumns.fill(spark, path,
      ColumnDefaults.fill(spark, path, updates)).dropDuplicates(pk)
      // plain layout: no pre-publish dir to read back — validate the
      // incoming rows like append does (existing rows passed at their
      // own write time)
      Constraints.validateFrame(spark, path, upd)
      val parts = upd.select(partitionColumns.map(col): _*).distinct()
      val affected = target.join(parts, partitionColumns.toSeq, "left_semi")
      val merged = combine.map(_(affected, upd)).getOrElse(
        mergeFrames(affected, upd, pk, broadcastKeys = statsPlan.broadcastKeys))
      withConf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic") {
        clusterByPartitions(merged, partitionColumns, filesPerPartition)
          .write.mode(SaveMode.Overwrite)
          .partitionBy(partitionColumns: _*)
          .parquet(path)
      }
    } else if (evolveSchema) {
      atomicReplace(spark, path,
        mergeFrames(target, updates, pk, evolveSchema = true,
          broadcastKeys = statsPlan.broadcastKeys), Nil, txn)
    } else if (combine.isEmpty && currentVersion(spark, path)
        // the bulk-update demotion: above the MOR floor but with the
        // update set covering most of the table's pk NDV (ANALYZEd
        // tables only), rewrite — MOR would append ~the table and DV
        // the old image (double storage until OPTIMIZE)
        .exists(v => mergeOnRead.getOrElse(
          autoMergeOnRead(spark, path, v) && !statsPlan.bulkUpdate))) {
      // merge-on-read tier: O(update rows) commit — matched rows retired
      // by deletion vector, update rows appended as one dir (CDF capture
      // and txn re-delivery handled inside)
      mergeVectors(spark, path, updates, pk, cdf, txn)
    } else {
      val updG = GeneratedColumns.fill(spark, path,
        ColumnDefaults.fill(spark, path, updates))
      val merged = combine.map(_(target, updG.dropDuplicates(pk)))
        .getOrElse(mergeFrames(target, updG, pk,
          broadcastKeys = statsPlan.broadcastKeys))
      val v = atomicReplace(spark, path, merged, Nil, txn)
      // capture is derived from the COMMITTED image, not by re-evaluating
      // the update plan: a lazy dedup could pick a different row per
      // duplicate PK on re-execution, and the feed must never disagree
      // with what the commit actually published (v < 0 = txn re-delivery
      // detected under the race: nothing committed, nothing to capture).
      // Scoped to the update keys: merge never deletes and never changes
      // a row outside the key set, so diffing the affected slices equals
      // the full-snapshot diff at a fraction of the join size.
      if (v >= 0 && cdf) {
        val updKeys = updates.select(pk.map(col): _*).distinct()
        // re-select after the semi-joins: a using-columns join HOISTS the
        // pk columns to the front, and the feed must carry table order
        val cols = target.columns.toSeq
        writeChangeManifest(spark, path, v,
          changeRowsBetween(
            target.join(updKeys, pk, "left_semi").select(cols.map(col): _*),
            readVersion(spark, path, v).join(updKeys, pk, "left_semi")
              .select(cols.map(col): _*),
            pk, "right_outer"))
      }
    }
  }

  // ---- versioned manifest layout ----------------------------------------

  private val ManifestDirName = "_graft_manifest"

  private def hadoopFs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(path: String) = new Path(path, ManifestDirName)

  /** Unique data-dir name for every versioned write — two racing writers
    * can never target the same directory; the manifest, not the name,
    * binds a dir into a version.
    */
  private def freshDataDirName() =
    s"_d${System.currentTimeMillis()}_${System.nanoTime() % 1000000}"

  /** Committed versions at `path`, ascending; empty for plain layouts. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val md = manifestDir(path)
    val fs = hadoopFs(spark, md)
    if (!fs.exists(md)) Seq.empty
    else fs.listStatus(md).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d+")).map(_.drop(1).toLong).sorted
  }

  /** Latest committed version. Hot path of EVERY read and commit loop:
    * resolves through the `_latest` hint (O(commits since the hint)
    * existence probes, normally 1-2) instead of listing the whole
    * manifest dir; any doubt about the hint falls back to the listing.
    * Commits are always v+1-contiguous at the tail (each publish CASes
    * exactly current+1), so forward probing from a committed floor is
    * exact.
    */
  def currentVersion(spark: SparkSession, path: String): Option[Long] = {
    val md = manifestDir(path)
    val fs = hadoopFs(spark, md)
    if (!fs.exists(md)) return None
    readLatestHint(fs, md) match {
      case Some(h) if fs.exists(new Path(md, f"v$h%020d")) =>
        var v = h
        while (fs.exists(new Path(md, f"v${v + 1}%020d"))) v += 1
        Some(v)
      case _ => versions(spark, path).lastOption
    }
  }

  /** The commit primitive every version publish goes through — pluggable
    * so an object-store deployment can swap in a CAS committer (see
    * [[LogCommitter]]). Defaults to [[DefaultCommitter]]: hard-link
    * put-if-absent on local FS, no-replace rename on HDFS.
    */
  @volatile var logCommitter: LogCommitter = DefaultCommitter

  /** Publish `version` by committing a manifest file holding `content`
    * through the configured [[LogCommitter]]. Returns false when another
    * writer committed that version first.
    */
  private def commitVersion(
      spark: SparkSession, path: String, version: Long, content: String,
      txn: Option[(String, Long)] = None,
      dv: Seq[String] = Nil,
      colmap: Option[String] = None): Boolean = {
    val md = manifestDir(path)
    val target = new Path(md, f"v$version%020d")
    // `#ts=` header: the commit wall-clock becomes committed state inside
    // the atomically-published manifest (what TIMESTAMP AS OF resolves
    // against) — unlike file mtimes, it survives copies/restores of the
    // table directory. `#txn=` records an application transaction id in
    // the SAME atomic publish (what [[lastTxnVersion]] reads — Delta's
    // txnAppId/txnVersion idempotent-write tier). `#dv=` lists the
    // deletion-vector dirs this version reads through (see
    // [[deleteVectors]]) — part of the snapshot, so it must ride the same
    // atomic commit. Parsers read through manifestContent, which strips
    // `#` lines, so the dir-listing format is unchanged.
    val txnHeader = txn.map { case (app, tv) => s"#txn=$app:$tv\n" }.getOrElse("")
    // tab-separated: dv entries can be absolute paths (clones), and a
    // tab is the one separator the body format already forbids in names
    val dvHeader = if (dv.isEmpty) "" else s"#dv=${dv.mkString("\t")}\n"
    // `#colmap=` publishes the version's logical column view (renames +
    // drops) over unchanged physical files — see [[renameColumn]]. NOT
    // carried forward by default: an ordinary full-image commit writes
    // logical names physically, which IS the materialization.
    val cmHeader = colmap.filter(_.nonEmpty).map(m => s"#colmap=$m\n").getOrElse("")
    val stamped = s"#ts=${System.currentTimeMillis()}\n$txnHeader$dvHeader$cmHeader$content"
    val won = logCommitter.commit(hadoopFs(spark, md), target, stamped.getBytes("UTF-8"))
    if (won) {
      writeLatestHint(hadoopFs(spark, md), md, version)
      maybeAutoSymlink(spark, path, dv, colmap)
    }
    won
  }

  /** Delta's `delta.compatibility.symlinkFormatManifest.enabled` parity:
    * with `graft.symlink.autoGenerate = true` every won commit
    * regenerates the symlink export, so Presto/Trino/Athena keep reading
    * the head without a manual GENERATE after each write. Best-effort,
    * like the `_latest` hint: the commit is already PUBLISHED when this
    * runs, so ineligible snapshots (live DVs, unmaterialized column
    * mappings — the manual verb's refusal conditions) and races are
    * SKIPPED, never failed; the next eligible commit catches the export
    * up, and the manual verb stays available for a synchronous refresh.
    */
  private def maybeAutoSymlink(
      spark: SparkSession, path: String,
      dv: Seq[String], colmap: Option[String]): Unit =
    if (dv.isEmpty && colmap.forall(_.isEmpty) &&
        TableProperties.get(spark, path, "graft.symlink.autoGenerate")
          .exists(_.equalsIgnoreCase("true"))) {
      try { generateSymlinkManifest(spark, path); () }
      catch { case scala.util.control.NonFatal(_) => () } // advisory export
    }

  /** `_latest` version HINT (Delta's `_last_checkpoint` shape): snapshot
    * resolution on an object store otherwise pays a paginated LIST of the
    * whole manifest dir — O(versions) metadata calls per read, ~100
    * round-trips at 100k commits. The hint is best-effort and advisory:
    * written with a plain overwrite AFTER a won commit, so it can be
    * stale (crash between commit and hint, or a slow writer overwriting
    * with an older value) or torn — [[currentVersion]] therefore treats
    * it as a LOWER BOUND and probes forward with existence checks,
    * falling back to the full listing whenever the hinted manifest
    * doesn't exist (corrupt hint, or vacuumed-away version). Correctness
    * never depends on the hint: commits still CAS on the real manifest
    * file.
    */
  private val LatestHintName = "_latest"

  private def writeLatestHint(
      fs: org.apache.hadoop.fs.FileSystem, md: Path, version: Long): Unit =
    try {
      val out = fs.create(new Path(md, LatestHintName), true)
      try out.write(version.toString.getBytes("UTF-8"))
      finally out.close()
    } catch { case _: Throwable => () } // advisory — losing it costs a LIST

  private def readLatestHint(
      fs: org.apache.hadoop.fs.FileSystem, md: Path): Option[Long] =
    try {
      val p = new Path(md, LatestHintName)
      if (!fs.exists(p)) None
      else {
        val len = fs.getFileStatus(p).getLen.toInt
        if (len <= 0 || len > 32) None
        else {
          val buf = new Array[Byte](len)
          val in = fs.open(p)
          try in.readFully(0, buf)
          finally in.close()
          val s = new String(buf, "UTF-8").trim
          if (s.nonEmpty && s.forall(_.isDigit)) Some(s.toLong) else None
        }
      }
    } catch { case _: Throwable => None }

  // ---- partitioned versioned layout --------------------------------------
  // Manifest file content formats:
  //   unpartitioned:  one line, the version's data dir name
  //   partitioned:    one line per partition, "partitionDir\tdataDir"
  //                   (e.g. "date=2024-01-01\t_d1712000000000_123")
  // A partitioned version references MANY data dirs — each merge writes the
  // changed partitions into one fresh dir and re-points only those entries,
  // so untouched partitions are never rewritten (and old manifests keep
  // seeing their old dirs: snapshot isolation + time travel).

  /** CHECK-constraint gate between a commit's parquet write and its
    * manifest publish (see [[Constraints.validateWritten]]): a violation
    * removes the just-written orphan dir and fails the commit, so
    * readers never see it. No-op when the table has no constraints.
    *
    * `physicalNames = true` marks a PARTIAL commit written under an
    * active column mapping (files carry physical names, map carried
    * forward): constraint expressions bind against LOGICAL names — a
    * constraint added after a rename names the renamed column — so the
    * written files validate through the current logical view. Full
    * rewrites keep the default (they write logical names and clear the
    * map; applying the view to an already-logical frame would misfire
    * under vacated-name reuse).
    */
  private def validateCommit(
      spark: SparkSession, path: String, dataDir: String,
      physicalNames: Boolean = false): Unit =
    try {
      val dir = new Path(path, dataDir).toString
      val (r, d) =
        if (!physicalNames) (Map.empty[String, String], Seq.empty[String])
        else currentVersion(spark, path)
          .map(columnMapping(spark, path, _))
          .getOrElse((Map.empty[String, String], Seq.empty[String]))
      if (r.isEmpty && d.isEmpty) Constraints.validateWritten(spark, path, dir)
      else if (Constraints.list(spark, path).nonEmpty)
        Constraints.validateFrame(spark, path,
          applyColmapTo(r, d, spark.read.parquet(dir)))
    } catch {
      case e: Throwable =>
        val dd = new Path(path, dataDir)
        hadoopFs(spark, dd).delete(dd, true)
        throw e
    }

  private def manifestRaw(spark: SparkSession, path: String, version: Long): String = {
    val f = new Path(manifestDir(path), f"v$version%020d")
    val fs = hadoopFs(spark, f)
    val buf = new Array[Byte](fs.getFileStatus(f).getLen.toInt)
    val in = fs.open(f)
    try in.readFully(0, buf)
    finally in.close()
    new String(buf, "UTF-8")
  }

  /** Manifest body with `#`-prefixed header lines (commit metadata such as
    * `#ts=<epochMillis>`) stripped. Every parser of the dir-listing format
    * reads through here, so headers can grow without touching them;
    * pre-header manifests (no `#` lines) pass through unchanged.
    */
  private def manifestContent(spark: SparkSession, path: String, version: Long): String =
    manifestRaw(spark, path, version).linesIterator
      .filterNot(_.startsWith("#")).mkString("\n")

  /** Commit wall-clock of `version` (epoch millis) from the manifest's
    * `#ts=` header — committed state inside the atomically-published
    * manifest, not filesystem mtime. None for manifests written before
    * the header existed.
    */
  def commitTimestamp(spark: SparkSession, path: String, version: Long): Option[Long] =
    manifestRaw(spark, path, version).linesIterator
      .find(_.startsWith("#ts=")).flatMap(_.stripPrefix("#ts=").trim.toLongOption)

  /** The `txnVersion` most recently committed for `appId` (Delta's
    * `txn.lastWriteVersion` — the idempotent-write watermark): scans
    * manifests newest-first and returns the first `#txn=` entry for the
    * app, so with monotone txn versions per app (the streaming-batch-id
    * contract) this is the highest committed one. Cost is one small
    * manifest read per version until a hit — bounded by `vacuum`
    * retention, and in steady streaming the hit is within the last few
    * commits. None when the app never committed (or its commits were
    * vacuumed: retain at least one committed-txn version per app, or
    * re-deliveries older than retention will re-apply — Delta's
    * documented vacuum/txn interaction).
    */
  def lastTxnVersion(spark: SparkSession, path: String, appId: String): Option[Long] =
    versions(spark, path).sorted(Ordering[Long].reverse).iterator
      .map(v => manifestRaw(spark, path, v).linesIterator
        .find(_.startsWith(s"#txn=$appId:"))
        .flatMap(_.stripPrefix(s"#txn=$appId:").trim.toLongOption))
      .collectFirst { case Some(tv) => tv }

  private def requireTxnAppId(txn: Option[(String, Long)]): Unit =
    txn.foreach { case (app, _) =>
      require(app.matches("[A-Za-z0-9_.\\-]+"),
        s"txn appId must be [A-Za-z0-9_.-]+, got '$app'")
    }

  /** True when `txn` names a batch at or below the app's committed
    * watermark — the write is a re-delivery and must be skipped.
    */
  private def txnAlreadyApplied(
      spark: SparkSession, path: String, txn: Option[(String, Long)]): Boolean =
    txn.exists { case (app, tv) =>
      lastTxnVersion(spark, path, app).exists(_ >= tv)
    }

  /** Data dirs of an UNPARTITIONED version, in manifest order. One entry
    * for full-image commits; several after merge-on-read commits
    * ([[mergeVectors]] appends a dir per merge — base image first, then
    * each merge's updates). [[optimize]] / [[atomicReplace]] materialize
    * back to one.
    */
  private def unpartitionedDirs(
      spark: SparkSession, path: String, version: Long): Seq[String] =
    manifestContent(spark, path, version).linesIterator
      .map(_.trim).filter(_.nonEmpty).toSeq

  /** Partition entries of `version`: Some(partitionDir → dataDir) for
    * partitioned manifests, None for unpartitioned ones.
    */
  def partitionEntries(
      spark: SparkSession, path: String, version: Long): Option[Seq[(String, String)]] = {
    val content = manifestContent(spark, path, version).trim
    if (!content.contains('\t')) None
    else Some(content.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(p, d) = line.split('\t')
      (p, d)
    }.toSeq)
  }

  /** The widest (superset) schema among `schemas` — well-defined under
    * append-only evolution, where every dir's schema is a prefix-superset
    * or -subset of every other's. Incomparable drift keeps the first
    * (the pre-evolution arbitrary-but-stable choice).
    *
    * A field ABSENT from any dir must come out NULLABLE regardless of how
    * the dirs that carry it declared it: those dirs' files physically
    * lack the column, and the vectorized parquet reader REFUSES a file
    * missing a required (non-nullable) column (`Required column is
    * missing in data file`) — the evolution semantics are "missing reads
    * as NULL", which only an optional field can deliver.
    */
  private def supersetSchema(schemas: Seq[StructType]): Option[StructType] =
    schemas.reduceOption { (a, b) =>
      val wide =
        if (b.fieldNames.forall(n => a.fieldNames.exists(_.equalsIgnoreCase(n)))) a
        else if (a.fieldNames.forall(n => b.fieldNames.exists(_.equalsIgnoreCase(n)))) b
        else a
      val narrow = if (wide eq a) b else a
      StructType(wide.fields.map { f =>
        if (narrow.fieldNames.exists(_.equalsIgnoreCase(f.name)))
          f.copy(nullable = f.nullable ||
            narrow.fields.find(_.name.equalsIgnoreCase(f.name)).exists(_.nullable))
        else f.copy(nullable = true)
      })
    }

  /** The table schema `version` publishes, from sidecars ALONE — one
    * small JSON read per referenced data dir, no file listing, no data
    * I/O (partitioned versions take the superset across dirs: after a
    * schema-evolving merge, untouched partitions keep their old dirs).
    * None when no referenced dir carries a schema (pre-sidecar commits).
    * Partition columns are included (commit-time schemas carry them).
    */
  private[sources] def versionSchema(
      spark: SparkSession, path: String, version: Long): Option[StructType] =
    partitionEntries(spark, path, version) match {
      case None =>
        supersetSchema(unpartitionedDirs(spark, path, version).flatMap(dd =>
          DataSkipping.readStats(spark, new Path(path, dd).toString)
            .flatMap(_.schema)))
      case Some(entries) =>
        supersetSchema(entries.map(_._2).distinct.sorted.flatMap(dd =>
          DataSkipping.readStats(spark, new Path(path, dd).toString)
            .flatMap(_.schema)))
    }

  /** Align one data dir's frame to the version's table schema: columns
    * the dir predates read as typed NULLs (the parquet-reader
    * schema-evolution semantics Delta relies on), column order follows
    * the table. Extra frame columns beyond the schema are dropped.
    */
  private def alignTo(df: DataFrame, schema: StructType): DataFrame = {
    val missing = schema.fields.filterNot(f =>
      df.columns.exists(_.equalsIgnoreCase(f.name)))
    missing.foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** The snapshot of `version`, deletion vectors applied. When the
    * version carries no `#dv=` header this is exactly the single-relation
    * plan [[versionLegs]] builds (FileIndex pruning, metadata-agg
    * folding); with DVs the legs each gain the anti-join of
    * [[dvFilterLeg]] — a join plan, which is also what keeps the
    * metadata-aggregate rule from folding stale sidecar counts.
    */
  private def readVersion(spark: SparkSession, path: String, version: Long): DataFrame = {
    val dv = dvOf(spark, path, version)
    // colmap LAST: DV filtering and union happen on the physical frame.
    // allowMissingColumns = the typed-NULL schema-evolution semantics the
    // partitioned path already gets from its superset sidecar schema —
    // after an ADD COLUMN, a merge-on-read dir can legitimately carry
    // more columns than the base dir it amends.
    val base = applyColmap(spark, path, version,
      versionLegs(spark, path, version).map(dvFilterLeg(_, dv))
        .reduce(_.unionByName(_, allowMissingColumns = true)))
    extendDefaults(spark, path, version, base)
  }

  /** Append ADD-COLUMN'd columns the physical frame predates (typed
    * NULLs — see [[ColumnDefaults]]); versions outside a rule's
    * [addedAt, droppedAt) window are untouched, and a column whose name
    * was later colmap-DROPPED stays dropped.
    */
  private def extendDefaults(
      spark: SparkSession, path: String, version: Long, df: DataFrame): DataFrame = {
    val rules = ColumnDefaults.list(spark, path)
    if (rules.isEmpty) df
    else ColumnDefaults.extendSchema(rules, version, df,
      columnMapping(spark, path, version)._2)
  }

  /** The version's scan legs — each a SINGLE file-source relation (so
    * `_metadata` columns resolve on it), pre-DV. One leg in the sidecar-
    * served paths; one per data dir only in the legacy no-sidecar
    * fallback. Callers must apply [[dvFilterLeg]] per leg BEFORE any
    * projection or union.
    */
  private def versionLegs(spark: SparkSession, path: String, version: Long): Seq[DataFrame] =
    partitionEntries(spark, path, version) match {
      case None =>
        // unpartitioned: the manifest body lists the version's data dirs
        // (one for full-image commits; base + one per merge after
        // merge-on-read commits), each served through a snapshot
        // FileIndex so ANY plan over the table (SQL, joins, aggregates)
        // prunes files from the stats sidecar at planning time — see
        // GraftFileIndex. The sidecar also carries the commit's schema,
        // so the common path never re-infers it from footers
        // (pre-sidecar dirs fall back to inference).
        val dirs = unpartitionedDirs(spark, path, version)
        dirs.map { dd =>
          val dir = new Path(path, dd)
          val sidecar = DataSkipping.readStats(spark, dir.toString)
          val schema = sidecar.flatMap(_.schema)
            .getOrElse(spark.read.parquet(dir.toString).schema)
          val index = new GraftFileIndex(spark, dir, sidecar.map(_.files))
          // ANALYZEd tables feed Spark's CBO their real statistics —
          // full column statistics on single-leg snapshots (the common
          // published/compacted state); a merge-on-read chain still
          // gets each leg's EXACT sidecar row count (the union sums
          // them), but no NDV/min-max — a table-wide sketch says
          // nothing about one leg, and the chain folds back to one leg
          // at the MorMaxDataDirs cap anyway. DV'd rows are not
          // subtracted: estimates stay high → conservative broadcasts.
          // See PlanStats for the opt-in chain.
          val cs = if (dirs.size == 1)
            PlanStats.forSnapshot(spark, path, version, index.sizeInBytes,
              index.metadataRowCount, index.metadataNonNullCount,
              index.metadataMinMax,
              schema.fields.map(f => f.name -> f.dataType).toMap)
          else PlanStats.rowCountOnly(spark, path,
            index.sizeInBytes, index.metadataRowCount)
          GraftColumnBridge.ofFileIndex(spark, index, schema, cs)
        }
      case Some(entries) =>
        // partitioned: one inner InMemoryFileIndex per data dir, rooted
        // at EXACTLY the partition subdirs this version references
        // (basePath recovers the partition columns), composed into a
        // GraftPartitionedFileIndex so any plan gets partition-filter
        // pruning AND sidecar file skipping at planning time. Dirs
        // without a schema-bearing sidecar (pre-feature) fall back to
        // the legacy unioned basePath read.
        val groups = entries.groupBy(_._2).toSeq.sortBy(_._1).map { case (dataDir, es) =>
          val base = new Path(path, dataDir)
          (base, es.map(_._1), DataSkipping.readStats(spark, base.toString))
        }
        // the version's table schema is the SUPERSET across dirs: after a
        // schema-evolving merge, untouched partitions keep old dirs whose
        // files simply lack the appended columns (the parquet reader
        // fills typed NULLs — Delta's read-time evolution semantics)
        val sidecarSchema = supersetSchema(groups.flatMap(_._3.flatMap(_.schema)))
        sidecarSchema match {
          case Some(schema) =>
            val parts = groups.map { case (base, partDirs, sidecar) =>
              val inner: org.apache.spark.sql.execution.datasources.FileIndex =
                new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
                  spark, partDirs.map(p => new Path(base, p)),
                  Map("basePath" -> base.toString), None)
              val absStats = sidecar.map(_.files.map { case (rel, st) =>
                new Path(base, rel).toUri.getPath -> st
              }).getOrElse(Map.empty[String, DataSkipping.FileStat])
              (inner, absStats)
            }
            val index = new GraftPartitionedFileIndex(parts)
            val partCols = index.partitionSchema.fieldNames
              .map(_.toLowerCase).toSet
            val dataSchema = org.apache.spark.sql.types.StructType(
              schema.fields.filterNot(f => partCols.contains(f.name.toLowerCase)))
            // the partitioned layout is always ONE relation, so the
            // ANALYZE statistics attach unconditionally when present;
            // partition columns are non-null by construction but their
            // null counts aren't in file stats — omitted, not guessed
            val cs = PlanStats.forSnapshot(spark, path, version,
              index.sizeInBytes, index.metadataRowCount,
              index.metadataNonNullCount, index.metadataMinMax,
              (dataSchema.fields ++ index.partitionSchema.fields)
                .map(f => f.name -> f.dataType).toMap)
            Seq(GraftColumnBridge.ofFileIndex(spark, index, dataSchema, cs))
          case None =>
            groups.map { case (base, partDirs, _) =>
              spark.read.option("basePath", base.toString)
                .parquet(partDirs.map(p => s"$base/$p"): _*)
            }
        }
    }

  /** Hive-style partition dir for one row of partition values (already
    * rendered as strings) — same escaping as Spark's own partitioned
    * writer, so manifest entries match the dirs `partitionBy` lays down.
    */
  private def partitionDir(cols: Seq[String], values: Seq[String]): String =
    cols.zip(values).map { case (c, v) =>
      require(v != null, s"versioned tables need non-null partition values ($c)")
      s"$c=${org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v)}"
    }.mkString("/")

  /** Leaf partition dirs (depth = |partitionColumns|) actually present
    * under a freshly-written data dir — the ground truth for which
    * partitions SURVIVED a rewrite. A conditional-clause DELETE can empty
    * a whole partition; the parquet writer then creates no subdir for it,
    * and a manifest entry pointing at the missing subdir wedges the
    * partition (PATH_NOT_FOUND on every later read/merge). Metadata-only:
    * one listStatus per level, no data read.
    */
  private def writtenPartitionDirs(
      spark: SparkSession, path: String, dataDir: String,
      partitionColumns: Seq[String]): Seq[String] = {
    val dd = new Path(path, dataDir)
    val fs = hadoopFs(spark, dd)
    def leaves(dir: Path, depth: Int): Seq[String] =
      if (depth == 0)
        Seq(dir.toUri.getPath.stripPrefix(dd.toUri.getPath).stripPrefix("/"))
      else if (!fs.exists(dir)) Nil
      else fs.listStatus(dir).filter(_.isDirectory)
        .filter(_.getPath.getName.contains('='))
        .flatMap(st => leaves(st.getPath, depth - 1)).toSeq
    leaves(dd, partitionColumns.length).sorted
  }

  /** Distinct partition dirs present in `df`, rendered exactly as the
    * parquet writer will name them. Bounded collect: one row per partition
    * in the WRITE SET (not the table).
    */
  private def partitionDirsOf(df: DataFrame, partitionColumns: Seq[String]): Seq[String] =
    df.select(partitionColumns.map(c => col(c).cast("string")): _*)
      .distinct().collect()
      .map(r => partitionDir(partitionColumns, partitionColumns.indices.map(r.getString)))
      .toSeq.sorted

  /** Create (or fully replace) a PARTITIONED versioned table: the image
    * lands in one fresh data dir; the manifest maps every partition to it.
    */
  def createVersioned(
      df: DataFrame, path: String, partitionColumns: Seq[String],
      filesPerPartition: Int = 1, txn: Option[(String, Long)] = None,
      writeOptions: Map[String, String] = Map.empty): Unit =
    publishVersioned(GeneratedColumns.fill(df.sparkSession, path,
      ColumnDefaults.fill(df.sparkSession, path, df)),
      path, partitionColumns, filesPerPartition,
      preserveLayout = false, txn, writeOptions)

  /** Shared partitioned-version publish. `preserveLayout = true` writes
    * `df`'s task layout as-is (no per-partition re-clustering) — the
    * OPTIMIZE ZORDER path, whose range-partitioned slabs ARE the file
    * layout being published.
    */
  private def publishVersioned(
      df: DataFrame, path: String, partitionColumns: Seq[String],
      filesPerPartition: Int, preserveLayout: Boolean,
      txn: Option[(String, Long)] = None,
      writeOptions: Map[String, String] = Map.empty): Unit = {
    require(partitionColumns.nonEmpty,
      "createVersioned is for partitioned tables; use create for unpartitioned")
    val spark = df.sparkSession
    val dataDir = freshDataDirName()
    if (preserveLayout)
      df.write.mode(SaveMode.Overwrite).options(writeOptions)
        .partitionBy(partitionColumns: _*)
        .parquet(new Path(path, dataDir).toString)
    else
      writePlain(df, new Path(path, dataDir).toString, partitionColumns,
        filesPerPartition, writeOptions)
    DataSkipping.writeStats(spark, new Path(path, dataDir).toString, df.schema)
    validateCommit(spark, path, dataDir)
    val entries = partitionDirsOf(df, partitionColumns)
      .map(p => s"$p\t$dataDir").mkString("\n")
    var committed = false
    var attempts = 0
    while (!committed) {
      attempts += 1
      require(attempts <= 10, s"createVersioned: lost the version race at $path")
      // same re-delivery re-check as atomicReplace: losing the CAS to a
      // racer that committed this very txn must not commit it twice
      if (txnAlreadyApplied(spark, path, txn)) {
        val dd = new Path(path, dataDir)
        hadoopFs(spark, dd).delete(dd, true)
        return
      }
      val v = currentVersion(spark, path).getOrElse(0L) + 1
      committed = commitVersion(spark, path, v, entries, txn)
    }
  }

  /** Outcome of [[rebaseVersionedCommit]]: `Rebased(v)` landed the
    * already-written commit at version `v` on top of the winner without
    * recomputing; `RebaseConflict` means a concurrent commit overlaps
    * this one, and the caller's loop must recompute from the new
    * snapshot.
    */
  private sealed trait RebaseOutcome
  private final case class Rebased(version: Long) extends RebaseOutcome
  private case object RebaseConflict extends RebaseOutcome

  /** After a partitioned merge loses the version CAS, try to land its
    * already-written data dir on top of the winner WITHOUT recomputing —
    * the manifest-entry re-expression of Delta's ConflictChecker
    * (`OptimisticTransaction.checkForConflicts`, which rebases a lost
    * commit onto winning transactions when their read/write sets are
    * disjoint). The lost merge rebases iff every concurrent winner is
    * DISJOINT from it:
    *
    *   - no winner re-pointed, consolidated, or appended an entry of any
    *     affected partition (Delta: `ConcurrentAppendException` /
    *     `ConcurrentWriteException` — the winner changed files this merge
    *     read or replaces);
    *   - no winner removed a DV this merge's rewrite folded in (a
    *     concurrent restore/OPTIMIZE materialized state out from under
    *     it);
    *   - no winner added a DV targeting an affected partition's base data
    *     dirs (Delta: `ConcurrentDeleteReadException` — the winner
    *     deleted rows inside the slice this merge read; rebasing would
    *     resurrect them).
    *
    * On disjointness the commit re-publishes against the WINNER's
    * manifest: untouched entries come from the winner, affected entries
    * point at the dir this merge already wrote — a manifest-only retry
    * with zero data I/O, which is what makes concurrent ETL into
    * different date partitions of a 100 TB table scale (the recompute
    * fallback would re-read and re-write whole partitions per race).
    * Several racing winners are absorbed by looping onto each new head.
    *
    * A winner that only EVOLVED the schema (appended columns via a new
    * dir elsewhere) is not a conflict: reads align every dir to the
    * version's superset sidecar schema, so the rebased dir serves the
    * appended columns as typed NULLs exactly like any untouched
    * partition.
    */
  private def rebaseVersionedCommit(
      spark: SparkSession, path: String, baseV: Long,
      affected: Seq[String], dataDir: String,
      appendBesideOld: Boolean,
      newDvName: Option[String],
      txn: Option[(String, Long)],
      mapped: Option[Seq[String]] = None): RebaseOutcome = {
    // `affected` drives CONFLICT detection (the full set this merge read);
    // `mapped` (default: affected) is the subset that re-points to the new
    // data dir — a rewrite whose conditional DELETE emptied a partition
    // must keep that partition in the conflict check but out of the
    // manifest (no subdir exists for it).
    val remap = mapped.getOrElse(affected)
    val affectedSet = affected.toSet
    val baseEntries = partitionEntries(spark, path, baseV)
      .getOrElse(return RebaseConflict)
    val baseAff = baseEntries.filter(e => affectedSet(e._1)).sorted
    val baseDvs = dvDirs(spark, path, baseV)
    var attempts = 0
    while (attempts < 10) {
      attempts += 1
      // a racer may have committed this very txn: hand back to the
      // caller's loop, whose re-delivery re-check cleans up and returns
      if (txnAlreadyApplied(spark, path, txn)) return RebaseConflict
      val vNew = currentVersion(spark, path).getOrElse(return RebaseConflict)
      val newEntries = partitionEntries(spark, path, vNew)
        .getOrElse(return RebaseConflict)
      val newDvs = dvDirs(spark, path, vNew)
      if (newEntries.filter(e => affectedSet(e._1)).sorted != baseAff)
        return RebaseConflict
      // a winner that changed the COLUMN MAPPING invalidates this commit's
      // physical translation (its dir was written under the base map) —
      // recompute rather than publish files named for the wrong schema
      if (columnMapping(spark, path, vNew) != columnMapping(spark, path, baseV))
        return RebaseConflict
      if (!baseDvs.forall(newDvs.contains)) return RebaseConflict
      val addedDvs = newDvs.filterNot(baseDvs.contains)
      if (addedDvs.nonEmpty) {
        // DV file keys are `dataDir/partitionDir/file` (see
        // [[dvFileKey]]), so the overlap check runs at (dataDir,
        // partition) granularity — a winner's DV inside a SHARED data
        // dir (the create dir holds every partition) conflicts only
        // when it targets one of THIS merge's partitions. One
        // distinct-key scan of the added DVs (small by construction:
        // 16 B/deleted row, distinct keys = files touched) decides it.
        val affPrefixes = baseAff.map { case (p, dd) => s"$dd/$p/" }
        val touches = dvFrame(spark, path, addedDvs)
          .select(col(DvFileCol)).distinct().collect()
          .exists(r => affPrefixes.exists(r.getString(0).startsWith))
        if (touches) return RebaseConflict
      }
      val rebasedEntries =
        if (appendBesideOld) newEntries ++ remap.map(_ -> dataDir)
        else newEntries.filterNot(e => affectedSet(e._1)) ++
          remap.map(_ -> dataDir)
      if (rebasedEntries.isEmpty) return RebaseConflict
      val rebased = rebasedEntries
        .sorted.map { case (p, dd) => s"$p\t$dd" }.mkString("\n")
      if (commitVersion(spark, path, vNew + 1, rebased, txn,
          dv = newDvs ++ newDvName.toSeq,
          colmap = carriedColmap(spark, path, vNew)))
        return Rebased(vNew + 1)
    }
    RebaseConflict
  }

  /** Upsert into a partitioned VERSIONED table: reads only the affected
    * partitions (through the current manifest), writes the merged rows of
    * those partitions into one fresh data dir, and publishes a manifest
    * that re-points just those entries. Untouched partitions: zero I/O.
    *
    * Concurrency (Delta ConflictChecker parity — see
    * [[rebaseVersionedCommit]]): concurrent merges into DISJOINT
    * partitions both land, and the loser lands by OCC REBASE — it keeps
    * the data dir it already wrote and re-publishes a manifest on top of
    * the winner's, a metadata-only retry with no data I/O. Overlapping
    * commits (same partition touched, or a concurrent DV delete inside
    * an affected partition) make the loser RECOMPUTE from the winner's
    * snapshot, so same-partition races serialize last-writer-wins per
    * pk, concurrent row-deletes are never resurrected, and both writers
    * always land (bounded retries; no `ConcurrentAppendException`
    * surfaced to the caller — the rebase Delta would throw for is
    * absorbed by the recompute tier).
    */
  def mergeVersioned(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      pk: Seq[String],
      partitionColumns: Seq[String],
      filesPerPartition: Int = 1,
      cdf: Boolean = false,
      evolveSchema: Boolean = false,
      txn: Option[(String, Long)] = None,
      mergeOnRead: Option[Boolean] = None,
      combine: Option[(DataFrame, DataFrame) => DataFrame] = None): Unit = {
    require(partitionColumns.nonEmpty, "mergeVersioned needs partition columns")
    require(!(cdf && evolveSchema),
      "mergeVersioned: cdf capture and schema evolution cannot share a commit")
    require(!(combine.isDefined && (cdf || evolveSchema)),
      "mergeVersioned: conditional clauses (combine) compose with neither " +
        "cdf capture nor schema evolution")
    require(!(combine.isDefined && mergeOnRead.contains(true)),
      "mergeVersioned: conditional clauses (combine) take the rewrite tier")
    requireTxnAppId(txn)
    TableProperties.requireNotAppendOnly(spark, path, "mergeVersioned")
    val upd = GeneratedColumns.fill(spark, path,
      ColumnDefaults.fill(spark, path, updates)).dropDuplicates(pk)
    // stats-informed planning — lazy: the probe runs only when a branch
    // below consults it (ANALYZEd tables only; see [[planMergeStats]])
    lazy val statsPlan = planMergeStats(spark, path, updates, pk)
    var committed = false
    var attempts = 0
    while (!committed) {
      attempts += 1
      require(attempts <= 10, s"mergeVersioned: lost the version race at $path")
      if (txnAlreadyApplied(spark, path, txn)) return
      currentVersion(spark, path) match {
        case None =>
          require(combine.isEmpty,
            s"mergeVersioned: conditional clauses need an existing target at $path")
          createVersioned(upd, path, partitionColumns, filesPerPartition, txn)
          committed = true
        case Some(v) =>
          val entries = partitionEntries(spark, path, v).getOrElse(
            throw new IllegalStateException(
              s"mergeVersioned: $path holds an UNPARTITIONED versioned table"))
          val affected = partitionDirsOf(upd, partitionColumns)
          val affectedSet = affected.toSet
          // ALL entries of the affected partitions — a partition can
          // span several dirs after append-entry INSERTs, and the slice
          // must union every one or the merge silently loses rows
          val affectedEntries = entries.filter(e => affectedSet(e._1))
          // the version's table schema (sidecars only — no listing): the
          // anchor both for aligning mixed-schema affected dirs after an
          // earlier evolution and for widening inserts into new partitions.
          // PHYSICAL names; under an active column mapping the slice gets
          // the logical view applied after alignment, the merge computes
          // in logical space, and the write translates back (toPhysical)
          // so every committed file stays physical-named and the map
          // carries forward — Delta's mutate-under-mapping model.
          val tableSchema = versionSchema(spark, path, v)
          val (cmRenames, cmDrops) = columnMapping(spark, path, v)
          val logicalSchema = tableSchema.map(colmapSchema(cmRenames, cmDrops, _))
          // deletion vectors apply to the target slice (per leg, before
          // align/union — see dvFilterLeg) so a merge can never resurrect
          // vector-deleted rows; the header is carried into the commit
          // below, keeping deletes on UNTOUCHED partitions in force
          val dv = dvOf(spark, path, v)
          val target =
            if (affectedEntries.isEmpty) None
            else Some(affectedEntries.groupBy(_._2).toSeq.sortBy(_._1).map {
              case (dataDir, es) =>
                val base = new Path(path, dataDir).toString
                val df = dvFilterLeg(spark.read.option("basePath", base)
                  .parquet(es.map(e => s"$base/${e._1}"): _*), dv)
                applyColmapTo(cmRenames, cmDrops,
                  tableSchema.map(alignTo(df, _)).getOrElse(df))
            }.reduce(_.unionByName(_)))
          // merge-on-read tier for HOT partitions (the partitioned twin
          // of [[mergeVectors]], possible now that a partition may span
          // several dirs): matched rows in the affected slice retire by
          // deletion vector, the update set appends as ONE new dir with
          // entries beside the old ones — O(update rows) instead of
          // rewriting the whole affected partition. Auto-tiered like the
          // unpartitioned path: affected-slice rows (from sidecars,
          // metadata-only) above [[MorAutoRowsFloor]] AND every affected
          // partition still under the [[MorMaxDataDirs]] dir cap (at the
          // cap the rewrite runs and consolidates). Schema evolution
          // always rewrites.
          val useMor = combine.isEmpty && !evolveSchema && target.isDefined &&
            mergeOnRead.getOrElse {
              val rows = affectedSliceRows(spark, path, affectedEntries)
              val maxDirs = affectedEntries.groupBy(_._1).values
                .map(_.size).maxOption.getOrElse(0)
              rows.exists(_ > MorAutoRowsFloor) && maxDirs < MorMaxDataDirs &&
                !statsPlan.bulkUpdate // bulk updates rewrite (ANALYZEd tables)
            }
          if (useMor) {
            val t = target.get
            val cols = t.columns.toSeq
            val updAligned = upd.select(cols.map(col): _*)
            val updKeys = hintKeys(
              updAligned.select(pk.map(col): _*).distinct(), statsPlan.broadcastKeys)
            // (file, row_index) of affected-slice rows whose pk is being
            // replaced — prior DVs excluded, schemas normalized to
            // pk+key columns so post-evolution dirs union cleanly
            val matched = affectedEntries.groupBy(_._2).toSeq.sortBy(_._1).map {
              case (dataDir, es) =>
                val base = new Path(path, dataDir).toString
                val leg = spark.read.option("basePath", base)
                  .parquet(es.map(e => s"$base/${e._1}"): _*)
                val withMeta = leg
                  .withColumn(DvFileCol, dvFileKey(col("_metadata.file_path")))
                  .withColumn(DvIdxCol, col("_metadata.row_index"))
                // logical view over the physical leg (pk names are
                // logical; the row-address columns pass through the map)
                applyColmapTo(cmRenames, cmDrops,
                  dv.fold(withMeta)(d =>
                    withMeta.join(d, Seq(DvFileCol, DvIdxCol), "left_anti")))
                  .select(pk.map(col) ++ Seq(col(DvFileCol), col(DvIdxCol)): _*)
            }.reduce(_.unionByName(_))
              .join(updKeys, pk, "left_semi")
              .select(col(DvFileCol), col(DvIdxCol))
            val dataDir = freshDataDirName()
            val updPhys = toPhysical(spark, path, v, updAligned)
            writePlain(updPhys, new Path(path, dataDir).toString,
              partitionColumns, filesPerPartition)
            DataSkipping.writeStats(spark, new Path(path, dataDir).toString,
              updPhys.schema)
            validateCommit(spark, path, dataDir, physicalNames = true)
            val dvName = s"$DvDirName/dv${System.currentTimeMillis()}_${System.nanoTime() % 1000000}"
            val dvPath = new Path(path, dvName)
            sizedForWrite(matched)
              .write.mode(SaveMode.Overwrite).parquet(dvPath.toString)
            val hasMatches = !spark.read.parquet(dvPath.toString).isEmpty
            if (!hasMatches) hadoopFs(spark, dvPath).delete(dvPath, true)
            val newEntries = (entries ++ affected.map(_ -> dataDir)).sorted
              .map { case (p, dd) => s"$p\t$dd" }.mkString("\n")
            val dvs = dvDirs(spark, path, v) ++ (if (hasMatches) Seq(dvName) else Nil)
            var committedV =
              if (commitVersion(spark, path, v + 1, newEntries, txn, dvs,
                carriedColmap(spark, path, v))) v + 1
              else -1L
            if (committedV < 0)
              // lost the CAS: rebase onto the winner when disjoint (keep
              // the appended dir and DV — entries unchanged means the DV's
              // (file, row_index) targets are still the live base files)
              rebaseVersionedCommit(spark, path, v, affected, dataDir,
                appendBesideOld = true,
                newDvName = if (hasMatches) Some(dvName) else None,
                txn) match {
                case Rebased(vc) => committedV = vc
                case RebaseConflict =>
                  val dd = new Path(path, dataDir)
                  hadoopFs(spark, dd).delete(dd, true)
                  if (hasMatches) hadoopFs(spark, dvPath).delete(dvPath, true)
              }
            committed = committedV >= 0
            if (committed && cdf) {
              // committed appended dir = the post-images; pre side = the
              // affected slice's replaced keys (re-selected: the semi
              // join hoists pk columns) — valid under rebase too: the
              // disjointness check proved no winner touched the slice
              val base = new Path(path, dataDir).toString
              val committedSlice = applyColmapTo(cmRenames, cmDrops,
                spark.read.option("basePath", base)
                  .parquet(affected.map(p => s"$base/$p"): _*))
                .select(cols.map(col): _*)
              writeChangeManifest(spark, path, committedV,
                changeRowsBetween(
                  t.join(updKeys, pk, "left_semi").select(cols.map(col): _*),
                  committedSlice, pk, "right_outer"))
            }
          } else {
          val merged = target match {
            case Some(t) =>
              combine.map(_(t, upd)).getOrElse(mergeFrames(t, upd, pk,
                evolveSchema, broadcastKeys = statsPlan.broadcastKeys))
            case None if combine.isDefined =>
              // all affected partitions are NEW: every source row is
              // unmatched — the clause image against an empty frame of
              // the TABLE schema (its LOGICAL view under a mapping),
              // never upd.schema: the source may carry extra clause-only
              // columns, and a committed dir with those columns would
              // break every later multi-dir unionByName read
              combine.get(spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                logicalSchema.getOrElse(readVersion(spark, path, v).schema)), upd)
            case None =>
              if (!evolveSchema) upd
              else logicalSchema match {
                // only NEW partitions touched: inserts still align with
                // the table — missing table columns carry typed NULLs,
                // genuinely new columns append after them
                case Some(ts) =>
                  val missing = ts.fields.filterNot(f =>
                    upd.columns.exists(_.equalsIgnoreCase(f.name)))
                  val extras = upd.columns.filterNot(c =>
                    ts.fieldNames.exists(_.equalsIgnoreCase(c)))
                  missing.foldLeft(upd)((d, f) =>
                    d.withColumn(f.name, lit(null).cast(f.dataType)))
                    .select((ts.fieldNames.toSeq ++ extras).map(col): _*)
                case None => upd
              }
          }
          val dataDir = freshDataDirName()
          val mergedPhys = toPhysical(spark, path, v, merged)
          writePlain(mergedPhys, new Path(path, dataDir).toString, partitionColumns,
            filesPerPartition)
          DataSkipping.writeStats(spark, new Path(path, dataDir).toString,
            mergedPhys.schema)
          validateCommit(spark, path, dataDir, physicalNames = true)
          // every affected partition consolidates onto the new dir (its
          // old entries — possibly several — drop out). Survivors come
          // from the WRITTEN layout, not a re-run of the merge plan: a
          // conditional DELETE clause can empty a whole partition, and
          // mapping it anyway would publish a dangling manifest entry
          // (ADVICE r7 high).
          val survivors = writtenPartitionDirs(
            spark, path, dataDir, partitionColumns).toSet
          require(survivors.subsetOf(affectedSet),
            s"mergeVersioned: merged rows landed outside the affected " +
              s"partitions at $path (${(survivors -- affectedSet).mkString(", ")})")
          val kept = entries.filterNot(e => affectedSet(e._1)) ++
            affected.filter(survivors).map(_ -> dataDir)
          require(kept.nonEmpty,
            s"mergeVersioned: merge would empty every partition of $path; " +
              "an empty partitioned manifest is unreadable — drop the table instead")
          val newEntries = kept.sorted
            .map { case (p, dd) => s"$p\t$dd" }.mkString("\n")
          var committedV =
            if (commitVersion(spark, path, v + 1, newEntries, txn,
              dv = dvDirs(spark, path, v),
              colmap = carriedColmap(spark, path, v))) v + 1
            else -1L
          if (committedV < 0)
            // lost the CAS: rebase the rewrite onto the winner when
            // disjoint — the consolidated dir already folded in the base
            // DVs, which the disjointness check proves still stand.
            // Conflict detection keeps the FULL affected set (a winner
            // touching an emptied partition still conflicts); only the
            // surviving partitions re-map to the new dir.
            rebaseVersionedCommit(spark, path, v, affected, dataDir,
              appendBesideOld = false, newDvName = None, txn,
              mapped = Some(affected.filter(survivors))) match {
              case Rebased(vc) => committedV = vc
              case RebaseConflict =>
                val dd = new Path(path, dataDir)
                hadoopFs(spark, dd).delete(dd, true)
            }
          committed = committedV >= 0
          if (committed && cdf) {
            // capture from the COMMITTED slice (the data dir this commit
            // published), never by re-evaluating the update plan — see
            // the unpartitioned branch. The v-snapshot dirs the before
            // side reads remain on disk (vacuum hasn't run). Valid under
            // rebase too: disjointness proved no winner touched the
            // before-side slice.
            val base = new Path(path, dataDir).toString
            val newSlice = applyColmapTo(cmRenames, cmDrops,
              spark.read.option("basePath", base)
                .parquet(affected.map(p => s"$base/$p"): _*))
            val before = target.getOrElse(newSlice.filter(lit(false)))
            writeChangeManifest(spark, path, committedV,
              changeRowsBetween(before, newSlice, pk, "right_outer"))
          }
          } // end rewrite tier
      }
    }
  }

  /** Row-level DELETE on a versioned table: rows matching `condition`
    * leave the table as the next committed version. The other two
    * lakehouse verbs beside MERGE (Delta `DELETE FROM`/`UPDATE`).
    *
    * Scale shape: partitioned versioned tables rewrite ONLY the
    * partitions that hold matching rows (affected set discovered by one
    * pruned scan; untouched partitions keep their data dirs — zero I/O),
    * exactly like [[mergeVersioned]]. A partition whose rows are all
    * deleted leaves the manifest. `condition` must be deterministic: the
    * rewrite and the `cdf` capture evaluate it independently over the
    * same immutable snapshot, which only agree when it is.
    *
    * `cdf = true` captures the deleted rows (`_change_type = "delete"`)
    * into this commit's change manifest for [[tableChanges]].
    * A no-match delete is a no-op: returns the current version, commits
    * nothing. Returns the committed (or current) version.
    */
  def delete(
      spark: SparkSession, path: String, condition: Column,
      cdf: Boolean = false): Long =
    rewriteRows(spark, path, condition, None, cdf)

  /** Row-level UPDATE on a versioned table: rows matching `condition` get
    * `set` applied (column → new-value expression; values are cast to the
    * column's existing type, so the table schema never drifts); other
    * rows are untouched. Same scale shape, determinism contract, no-op
    * and return semantics as [[delete]]. Partition columns cannot be
    * updated (that is a row MOVE between partitions — delete + re-insert
    * expresses it honestly). `cdf = true` captures every matched row as
    * `update_preimage`/`update_postimage` (matched-but-unchanged rows
    * included, as in Delta).
    */
  def update(
      spark: SparkSession, path: String, condition: Column,
      set: Map[String, Column], cdf: Boolean = false): Long = {
    require(set.nonEmpty, "update: empty SET")
    rewriteRows(spark, path, condition, Some(set), cdf)
  }

  /** Shared core of [[delete]] (`set = None`) and [[update]]. */
  private def rewriteRows(
      spark: SparkSession, path: String, condition: Column,
      set: Option[Map[String, Column]], cdf: Boolean): Long = {
    val verb = if (set.isEmpty) "delete" else "update"
    TableProperties.requireNotAppendOnly(spark, path, verb)
    var result = -1L
    var attempts = 0
    while (result < 0) {
      attempts += 1
      require(attempts <= 10, s"$verb: lost the version race at $path")
      val v = currentVersion(spark, path).getOrElse(throw new IllegalStateException(
        s"$verb: no versioned table at $path (row-level rewrites need " +
          "manifest isolation; plain layouts have no safe in-place path)"))
      partitionEntries(spark, path, v) match {
        case None =>
          val target = readVersion(spark, path, v)
          requireDeterministic(target, condition, set, verb)
          val resolvedSet = set.map(resolveSet(target, _, Nil, verb))
          // matched is captured BEFORE the commit: both frames evaluate
          // the (deterministic) predicate over the same immutable
          // snapshot dirs, so they are exact complements. Persisted ONLY
          // when cdf capture will re-read it (the no-op probe alone is a
          // limit-1 job; caching the full matched slice for it would
          // materialize a table-sized fraction to executor memory/disk
          // for nothing — ADVICE r15).
          val matched = target.filter(condition)
          if (cdf) matched.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            if (matched.isEmpty) result = v // no-op
            else {
              val out = resolvedSet match {
                case None => target.filter(!condition)
                case Some(s) => applySet(target, condition, s)
              }
              val nv = atomicReplace(spark, path, out, Nil)
              if (cdf) writeChangeManifest(spark, path, nv,
                captureRewrite(matched, resolvedSet))
              result = nv
            }
          } finally { if (cdf) matched.unpersist(); () }
        case Some(entries) =>
          val partitionColumns = entries.head._1.split('/').toSeq.map(_.split('=')(0))
          val target = readVersion(spark, path, v)
          requireDeterministic(target, condition, set, verb)
          // persisted ONLY when the cdf capture will re-read the slice:
          // without cdf the affected-partition discovery runs on the
          // partition columns alone (column-pruned scan), and caching the
          // full matched slice just to learn its partitions would put a
          // table-sized fraction on executor memory/disk (ADVICE r15)
          val matched = target.filter(condition)
          if (cdf) matched.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val resolvedSet = set.map(resolveSet(target, _, partitionColumns, verb))
          try {
          val affected = partitionDirsOf(matched, partitionColumns)
          if (affected.isEmpty) result = v // no-op
          else {
            val affectedSet = affected.toSet
            // ALL entries of the affected partitions (several dirs per
            // partition after append-entry INSERTs)
            val affectedEntries = entries.filter(e => affectedSet(e._1))
            // rewrite ONLY the affected partitions' slice (each dir
            // aligned to the version schema — post-evolution old dirs
            // read appended columns as typed NULLs). Under an active
            // column mapping: logical view for the predicate/SET,
            // physical names back on the way out (toPhysical), map
            // carried — the partial-rewrite discipline of mergeVersioned.
            val sliceSchema = versionSchema(spark, path, v)
            val (cmR, cmD) = columnMapping(spark, path, v)
            // vector-deleted rows stay deleted through the rewrite (per-leg
            // DV filter, before align/union); the dv header is carried into
            // the commit for the untouched partitions' sake
            val dv = dvOf(spark, path, v)
            val slice = affectedEntries.groupBy(_._2).toSeq.sortBy(_._1).map {
              case (dataDir, es) =>
                val base = new Path(path, dataDir).toString
                val df = dvFilterLeg(spark.read.option("basePath", base)
                  .parquet(es.map(e => s"$base/${e._1}"): _*), dv)
                applyColmapTo(cmR, cmD,
                  sliceSchema.map(alignTo(df, _)).getOrElse(df))
            }.reduce(_.unionByName(_))
            val newSlice = resolvedSet match {
              case None => slice.filter(!condition)
              case Some(s) => applySet(slice, condition, s)
            }
            val dataDir = freshDataDirName()
            val newSlicePhys = toPhysical(spark, path, v, newSlice)
            writePlain(newSlicePhys, new Path(path, dataDir).toString, partitionColumns)
            DataSkipping.writeStats(spark, new Path(path, dataDir).toString,
              newSlicePhys.schema)
            validateCommit(spark, path, dataDir, physicalNames = true)
            // a fully-deleted partition leaves the manifest; every
            // affected partition's old entries drop out wholesale
            val remaining = partitionDirsOf(newSlice, partitionColumns).toSet
            val newEntries = entries.filterNot(e => affectedSet(e._1)) ++
              remaining.map(_ -> dataDir)
            require(newEntries.nonEmpty,
              s"$verb would empty every partition of $path; an empty " +
                "partitioned manifest is unreadable — drop the table instead")
            val content = newEntries.sorted
              .map { case (p, dd) => s"$p\t$dd" }.mkString("\n")
            if (commitVersion(spark, path, v + 1, content,
                dv = dvDirs(spark, path, v),
                colmap = carriedColmap(spark, path, v))) {
              if (cdf) writeChangeManifest(spark, path, v + 1,
                captureRewrite(matched, resolvedSet))
              result = v + 1
            } else { // lost the race: re-read the winner's manifest, retry
              val dd = new Path(path, dataDir)
              hadoopFs(spark, dd).delete(dd, true)
            }
          }
          } finally { if (cdf) matched.unpersist(); () }
      }
    }
    result
  }

  /** Determinism must be checked on the ANALYZED expressions — an
    * unresolved function (e.g. a bare `rand()` Column) reports
    * deterministic until resolution — so probe-select the condition and
    * SET values against the target and inspect the analyzed projection.
    */
  private def requireDeterministic(
      target: DataFrame, condition: Column,
      set: Option[Map[String, Column]], verb: String): Unit = {
    val probe = condition +: set.toSeq.flatMap(_.values)
    require(target.select(probe: _*).queryExecution.analyzed.expressions
      .forall(_.deterministic),
      s"$verb: condition and SET expressions must be deterministic (the " +
        "rewrite and the cdf capture each evaluate them independently; " +
        "nondeterminism would let them disagree)")
  }

  /** Resolve SET keys case-insensitively against the table's columns;
    * reject unknown and partition columns.
    */
  private def resolveSet(
      target: DataFrame, set: Map[String, Column],
      partitionColumns: Seq[String], verb: String): Map[String, Column] =
    set.map { case (k, expr) =>
      val c = target.columns.find(_.equalsIgnoreCase(k)).getOrElse(
        throw new IllegalArgumentException(
          s"$verb: SET column $k not in table schema " +
            s"(${target.columns.mkString(", ")})"))
      require(!partitionColumns.exists(_.equalsIgnoreCase(c)),
        s"$verb: cannot SET partition column $c (a row move between " +
          "partitions is a delete + re-insert, not an update)")
      c -> expr
    }

  /** `set` applied to the rows of `df` matching `condition`; values cast
    * to the column's existing type so the schema never drifts.
    */
  private def applySet(
      df: DataFrame, condition: Column, set: Map[String, Column]): DataFrame =
    df.select(df.columns.map { c =>
      set.get(c) match {
        case Some(e) =>
          when(condition, e.cast(df.schema(c).dataType)).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }.toSeq: _*)

  /** Change rows of a delete (matched rows as `delete`) or an update
    * (matched rows as `update_preimage` + `update_postimage`).
    */
  private def captureRewrite(
      matched: DataFrame, set: Option[Map[String, Column]]): DataFrame =
    set match {
      case None => matched.withColumn("_change_type", lit("delete"))
      case Some(s) =>
        // pre+post images in ONE pass over the matched slice — the
        // unionByName formulation re-executed the filtered table scan
        // once per image side (same duplication class as the
        // changeRowsBetween fix above)
        val cols = matched.columns.toSeq
        def img(post: Boolean) = struct(cols.map { c =>
          (if (post) s.get(c).map(_.cast(matched.schema(c).dataType))
           else None).getOrElse(col(c)).as(c)
        } :+ lit(if (post) "update_postimage" else "update_preimage")
          .as("_change_type"): _*)
        matched.select(explode(array(img(post = false), img(post = true)))
          .as("__e")).select(col("__e.*"))
    }

  /** Write the full new table image as the NEXT manifest version: data
    * lands ONCE in a fresh uniquely-named dir, then one atomic manifest
    * commit publishes it. Losing the version race costs only a manifest
    * retry onto the next number (the data dir is reused, not rewritten),
    * so last-writer-wins is explicit and race recovery is O(manifest). Old
    * versions stay intact (and readable via `readAt`) until `vacuum`.
    * Returns the committed version number.
    *
    * `txn` (appId → txnVersion) records an idempotent-write marker in the
    * same atomic commit; a re-delivery detected on a retry (another
    * writer committed this txn while we raced) abandons the write, cleans
    * up the orphan dir, and returns -1 — the caller must treat -1 as
    * "already applied, nothing committed".
    */
  def atomicReplace(
      spark: SparkSession,
      path: String,
      df0: DataFrame,
      partitionColumns: Seq[String],
      txn: Option[(String, Long)] = None,
      writeOptions: Map[String, String] = Map.empty): Long = {
    requireTxnAppId(txn)
    val df = GeneratedColumns.fill(spark, path,
      ColumnDefaults.fill(spark, path,
        IdentityColumns.fill(spark, path, df0)))
    val dataDir = freshDataDirName()
    writePlain(df, new Path(path, dataDir).toString, partitionColumns,
      writeOptions = writeOptions)
    DataSkipping.writeStats(spark, new Path(path, dataDir).toString, df.schema)
    validateCommit(spark, path, dataDir)
    var attempts = 0
    var committed = -1L
    while (committed < 0) {
      attempts += 1
      if (attempts > 10) {
        val dd = new Path(path, dataDir)
        hadoopFs(spark, dd).delete(dd, true)
        throw new java.io.IOException(
          s"atomicReplace: lost the version race at $path $attempts times; giving up")
      }
      if (txnAlreadyApplied(spark, path, txn)) {
        val dd = new Path(path, dataDir)
        hadoopFs(spark, dd).delete(dd, true)
        return -1L
      }
      val v = currentVersion(spark, path).getOrElse(0L) + 1
      if (commitVersion(spark, path, v, dataDir, txn)) committed = v
    }
    committed
  }

  /** SNAPSHOT-DIFF change feed between two committed versions — the NET
    * tier; [[tableChanges]] is the per-commit Delta-`table_changes` tier.
    * The deviations from Delta CDF, explicitly:
    *
    *   - NET diff only: a range spanning several commits collapses them —
    *     a row changed in v2 and reverted in v3 does NOT appear in
    *     changes(1, 3); use [[tableChanges]] for per-commit history.
    *   - No `update_preimage`: an update emits ONE row with the NEW image
    *     (deletes carry the old image). [[tableChanges]] emits pre+post.
    *   - No `_commit_version`/`_commit_timestamp` columns — the caller
    *     already names both endpoints.
    *   - PK uniqueness is a PRECONDITION: duplicate keys would fan out the
    *     full-outer join into spurious change rows, so the call fails fast
    *     (one linear key-count job) naming a duplicated key rather than
    *     returning wrong data. Dedup the table (e.g. dropDuplicates(pk))
    *     before versioning if keys can repeat.
    *
    * Emits one row per changed key with `_change_type` ∈
    * insert | update | delete. Cost is a scan of both snapshots + one
    * shuffle on the PK — at scale, partition pruning inside each snapshot
    * read still applies, and unchanged rows never leave the join.
    */
  def changes(
      spark: SparkSession,
      path: String,
      fromVersion: Long,
      toVersion: Long,
      pk: Seq[String]): DataFrame = {
    // a window straddling a RENAME/DROP commit compares snapshots that
    // disagree on what a column is CALLED. PHYSICAL identity reconciles
    // them (Delta diffs CDF through its column ids the same way): the
    // FROM snapshot's logical names translate logical→physical (its own
    // inverse map) →TO-logical (the TO map), columns the TO version
    // DROPPED leave the diff, and both sides then speak TO's schema.
    // What physical identity cannot reconcile is a MATERIALIZATION in
    // the window (compact/OPTIMIZE/full rewrite): the files' names
    // changed underneath, a renamed column looks like drop-one-add-
    // another, and the diff would report every row changed — that
    // window is refused with the real explanation.
    val (rFrom, dFrom) = columnMapping(spark, path, fromVersion)
    val (rTo, dTo) = columnMapping(spark, path, toVersion)
    val beforeRaw0 = readAt(spark, path, fromVersion)
    val afterRaw = readAt(spark, path, toVersion)
    val beforeRaw =
      if ((rFrom, dFrom) == (rTo, dTo)) beforeRaw0
      else {
        val invFrom = rFrom.map { case (p, l) => l.toLowerCase -> p }
        beforeRaw0.select(beforeRaw0.columns.toSeq.flatMap { c =>
          val p = invFrom.getOrElse(c.toLowerCase, c)
          if (dTo.exists(_.equalsIgnoreCase(p))) None // dropped in window
          else Some(col(c).as(rTo.collectFirst {
            case (pp, l) if pp.equalsIgnoreCase(p) => l
          }.getOrElse(p)))
        }: _*)
      }
    // translation done, one guard covers the remaining hazard: columns
    // unique to EACH side simultaneously is the rename-materialization
    // shape (compact after RENAME: v_from says `amount`, v_to says
    // `total`, physical identity lost — this arises with equal-EMPTY
    // maps too, which is why the check runs unconditionally) and the
    // superset-align below would misread it as drop-one-add-another,
    // reporting every row changed. One-sided asymmetry stays legal:
    // after-only = schema evolution (before reads NULLs), before-only
    // alone = a reversed (wide→narrow) window, where "the column
    // vanished" is the honest diff.
    val beforeOnly = beforeRaw.columns.filterNot(c =>
      afterRaw.columns.exists(_.equalsIgnoreCase(c)))
    val afterOnly = afterRaw.columns.filterNot(c =>
      beforeRaw.columns.exists(_.equalsIgnoreCase(c)))
    require(beforeOnly.isEmpty || afterOnly.isEmpty,
      s"changes($fromVersion, $toVersion) at $path: v$fromVersion-only " +
        s"column(s) ${beforeOnly.mkString(", ")} face v$toVersion-only " +
        s"column(s) ${afterOnly.mkString(", ")} — the window straddles a " +
        "column-mapping MATERIALIZATION (or an equivalent full rewrite " +
        "that renamed physical columns), so the row diff is not " +
        "well-defined. Split the window at that commit (pure RENAME/" +
        "DROP windows reconcile automatically).")
    // across a schema-evolution boundary the snapshots disagree: align
    // both to the superset, so the older side reads appended columns as
    // NULL and a value set there reports as a genuine update
    val schema = supersetSchema(Seq(beforeRaw.schema, afterRaw.schema))
      .getOrElse(beforeRaw.schema)
    val before = alignTo(beforeRaw, schema)
    val after = alignTo(afterRaw, schema)
    requireUniquePk(
      Seq(s"v$fromVersion" -> before, s"v$toVersion" -> after), pk,
      s"changes($fromVersion, $toVersion) at $path")
    val cols = before.columns.toSeq
    def packed(df: DataFrame, alias: String) =
      df.select(pk.map(col) :+ struct(cols.map(col): _*).as(alias): _*)
    val j = packed(before, "__old")
      .join(packed(after, "__new"), pk, "full_outer")
    val img = when(col("__new").isNull, col("__old")).otherwise(col("__new"))
    j.filter(col("__old").isNull || col("__new").isNull ||
        !(col("__old") <=> col("__new")))
      .select(cols.map(c => img.getField(c).as(c)) :+
        when(col("__old").isNull, lit("insert"))
          .when(col("__new").isNull, lit("delete"))
          .otherwise(lit("update")).as("_change_type"): _*)
  }

  // ---- deletion vectors (merge-on-read DELETE) ----------------------------

  private val DvDirName = "_graft_dv"
  private[sources] val DvFileCol = "__graft_dv_file"
  private[sources] val DvIdxCol = "__graft_dv_idx"

  /** Deletion-vector dirs of `version`, from the manifest's `#dv=` header
    * (tab-separated; entries are table-relative names or absolute paths
    * for shallow clones). Empty for versions without deletes-by-vector.
    */
  def dvDirs(spark: SparkSession, path: String, version: Long): Seq[String] =
    manifestRaw(spark, path, version).linesIterator
      .find(_.startsWith("#dv=")).toSeq
      .flatMap(_.stripPrefix("#dv=").split('\t')).map(_.trim).filter(_.nonEmpty)

  // ---- column mapping: RENAME/DROP COLUMN without rewrite -----------------

  /** `version`'s column mapping from its `#colmap=` header:
    * (physical → logical renames, dropped physical columns). Entries are
    * tab-separated `physical>logical`; an empty logical side marks a
    * drop. Empty maps for unmapped versions.
    */
  def columnMapping(
      spark: SparkSession, path: String, version: Long): (Map[String, String], Seq[String]) =
    manifestRaw(spark, path, version).linesIterator
      .find(_.startsWith("#colmap=")) match {
      case None => (Map.empty, Nil)
      case Some(line) =>
        val entries = line.stripPrefix("#colmap=").split('\t')
          .map(_.trim).filter(_.nonEmpty)
        val (drops, renames) = entries.partition(_.endsWith(">"))
        (renames.map { e =>
          val i = e.indexOf('>')
          e.substring(0, i) -> e.substring(i + 1)
        }.toMap, drops.map(_.dropRight(1)).toSeq)
    }

  /** Serialize a mapping back to the header value. */
  private def colmapValue(renames: Map[String, String], drops: Seq[String]): String =
    (renames.toSeq.sorted.map { case (p, l) => s"$p>$l" } ++
      drops.sorted.map(_ + ">")).mkString("\t")

  /** Apply `version`'s logical column view to an assembled physical
    * frame: dropped columns projected away, renamed columns aliased.
    * Identity for unmapped versions (the overwhelmingly common case —
    * one manifest-header probe, no plan change).
    */
  private def applyColmap(
      spark: SparkSession, path: String, version: Long, df: DataFrame): DataFrame = {
    val (renames, drops) = columnMapping(spark, path, version)
    applyColmapTo(renames, drops, df)
  }

  /** The logical-view projection itself: dropped physical columns
    * projected away, renamed ones aliased; columns outside the mapping
    * (including reader metadata like [[DvFileCol]]) pass through — so
    * mutation verbs can put a PHYSICAL leg under the logical names while
    * keeping their row-address columns.
    */
  private def applyColmapTo(
      renames: Map[String, String], drops: Seq[String], df: DataFrame): DataFrame =
    if (renames.isEmpty && drops.isEmpty) df
    else df.select(df.columns
      .filterNot(c => drops.exists(_.equalsIgnoreCase(c)))
      .map(c => col(c).as(
        renames.collectFirst { case (p, l) if p.equalsIgnoreCase(c) => l }
          .getOrElse(c))).toIndexedSeq: _*)

  /** Inverse of [[applyColmap]] for OUTGOING writes under an active
    * column mapping — what lets mutation verbs commit PARTIAL rewrites
    * without materializing the map (Delta's model: files keep physical
    * names for the table's whole life): logical names translate back to
    * physical, dropped physical columns are re-added as typed NULLs (new
    * files must stay union-compatible with the version's old files; the
    * null values never surface — the read view projects them away), and
    * columns take the physical schema's order with genuinely new columns
    * (schema evolution) appended. Identity when the version is unmapped.
    */
  private def toPhysical(
      spark: SparkSession, path: String, version: Long, df: DataFrame): DataFrame = {
    val (renames, drops) = columnMapping(spark, path, version)
    if (renames.isEmpty && drops.isEmpty) return df
    val phys = versionSchema(spark, path, version)
      .orElse(supersetSchema(versionLegs(spark, path, version).map(_.schema)))
      .getOrElse(return df)
    val inv = renames.map { case (p, l) => l.toLowerCase -> p }
    val renamed = df.select(df.columns.map(c =>
      col(c).as(inv.getOrElse(c.toLowerCase, c))).toIndexedSeq: _*)
    val withDropped = drops.foldLeft(renamed)((d, p) =>
      phys.fields.find(_.name.equalsIgnoreCase(p)) match {
        case Some(f) if !d.columns.exists(_.equalsIgnoreCase(p)) =>
          d.withColumn(f.name, lit(null).cast(f.dataType))
        case _ => d
      })
    val physOrder = phys.fieldNames.filter(n =>
      withDropped.columns.exists(_.equalsIgnoreCase(n))).toSeq
    val extras = withDropped.columns.filterNot(c =>
      phys.fieldNames.exists(_.equalsIgnoreCase(c))).toSeq
    withDropped.select((physOrder ++ extras).map(col): _*)
  }

  /** The logical view of a PHYSICAL schema under a mapping — the schema
    * twin of [[applyColmapTo]].
    */
  private def colmapSchema(
      renames: Map[String, String], drops: Seq[String], s: StructType): StructType =
    if (renames.isEmpty && drops.isEmpty) s
    else StructType(s.fields
      .filterNot(f => drops.exists(_.equalsIgnoreCase(f.name)))
      .map(f => f.copy(name = renames.collectFirst {
        case (p, l) if p.equalsIgnoreCase(f.name) => l
      }.getOrElse(f.name))))

  /** The current mapping rendered for a carry-forward commit (None when
    * unmapped) — every PARTIAL commit under an active map must pass this
    * to [[commitVersion]], or the new version would read raw physical
    * names.
    */
  private def carriedColmap(
      spark: SparkSession, path: String, version: Long): Option[String] = {
    val (r, d) = columnMapping(spark, path, version)
    Some(colmapValue(r, d)).filter(_.nonEmpty)
  }

  /** Refuse a verb that cannot serve an unmaterialized column mapping
    * (symlink export: external readers consume raw files, which carry
    * PHYSICAL names). Mutation verbs no longer freeze — they translate
    * through the map on the way in ([[toPhysical]]) and carry it forward
    * ([[carriedColmap]]); full-image rewrites ([[compact]], [[optimize]],
    * unpartitioned merge/update/delete) write logical names and clear
    * the map, which IS the materialization.
    */
  private def requireNoColmap(spark: SparkSession, path: String, verb: String): Unit =
    if (exists(spark, path)) currentVersion(spark, path).foreach { v =>
      val (renames, drops) = columnMapping(spark, path, v)
      if (renames.nonEmpty || drops.nonEmpty) throw new IllegalStateException(
        s"$verb: table at $path carries an unmaterialized column mapping " +
          s"(renames: ${renames.map { case (p, l) => s"$p->$l" }.mkString(",")}; " +
          s"drops: ${drops.mkString(",")}). Run compact/optimize to " +
          "materialize the logical schema into the data files first — " +
          "reads and time travel work throughout.")
    }

  /** Delta-parity `ALTER TABLE … RENAME COLUMN` WITHOUT rewriting data:
    * an O(1) metadata-only commit republishing the current version's
    * data dirs under an updated `#colmap=` header. Reads and time travel
    * serve every version under its own mapping; old versions keep their
    * old names. Data-mutating verbs keep working under the mapping
    * (Delta's mutate-under-mapping model): partial commits translate
    * their outgoing files to PHYSICAL names ([[toPhysical]]) and carry
    * the map forward, while full-image rewrites ([[compact]],
    * [[optimize]], unpartitioned merge/update/delete) write logical
    * names and clear it — the materialization. Stats/bloom pruning stays
    * exact throughout ([[prunedFileGroups]] rewrites predicate names
    * logical→physical). Caveats, each refused up front: partition
    * columns (dir layout embeds them), CHECK-constrained columns
    * (constraint expressions hold raw names), identity-ruled columns
    * (the rule file is keyed by name), name collisions, and `>`/tab in
    * names (header syntax). `changes`/CDF windows must not straddle a
    * rename commit — snapshots on the two sides disagree on names — and
    * symlink export stays refused while mapped (external readers see raw
    * physical names).
    */
  def renameColumn(
      spark: SparkSession, path: String, from: String, to: String): Long = {
    val v = currentVersion(spark, path).getOrElse(throw new IllegalStateException(
      s"renameColumn: no versioned table at $path"))
    require(!(from.contains('>') || from.contains('\t') ||
      to.contains('>') || to.contains('\t')),
      s"renameColumn: '>' and tab are reserved by the mapping header")
    val logical = read(spark, path).columns.toSeq
    require(logical.exists(_.equalsIgnoreCase(from)),
      s"renameColumn: no column '$from' at $path (have ${logical.mkString(",")})")
    require(!logical.exists(_.equalsIgnoreCase(to)),
      s"renameColumn: column '$to' already exists at $path")
    partitionEntries(spark, path, v).foreach { entries =>
      val partCols = entries.head._1.split('/').toSeq.map(_.split('=')(0))
      require(!partCols.exists(_.equalsIgnoreCase(from)),
        s"renameColumn: '$from' is a partition column — the directory " +
          "layout embeds it; rewrite via createVersioned with new names")
    }
    require(!Constraints.list(spark, path).exists(_._2.toLowerCase
        .contains(from.toLowerCase)),
      s"renameColumn: a CHECK constraint references '$from' — drop and " +
        "re-add the constraint around the rename")
    // identity rules are keyed by column NAME (_graft_identity lines);
    // renaming the column would leave the rule pointing at the vacated
    // name, and later ingest would fill a spurious column under it
    // (ADVICE r9 medium) — mirror the partition-column refusal
    require(!IdentityColumns.list(spark, path).exists(_._1.equalsIgnoreCase(from)),
      s"renameColumn: '$from' carries an identity rule keyed by name — " +
        "drop the rule first, or keep the name")
    // ADD COLUMN rules are keyed by name too (fill + read-side extension
    // + time-travel windows would all chase the vacated name)
    require(!ColumnDefaults.list(spark, path).exists(r =>
        r.live && r.name.equalsIgnoreCase(from)),
      s"renameColumn: '$from' was ADD COLUMN'd and its rule is keyed by " +
        "name — drop the column instead, or keep the name")
    val (renames, drops) = columnMapping(spark, path, v)
    // the new entry maps the PHYSICAL name (the inverse image of `from`
    // under the current mapping) to the new logical name
    val physical = renames.collectFirst {
      case (p, l) if l.equalsIgnoreCase(from) => p
    }.getOrElse(from)
    val updated = renames - physical + (physical -> to)
    // a rename back to the physical name clears its entry
    val compacted = updated.filterNot { case (p, l) => p.equalsIgnoreCase(l) }
    commitMetadataVersion(spark, path, v, colmapValue(compacted, drops),
      "renameColumn")
  }

  /** Delta-parity `ALTER TABLE … DROP COLUMN` without rewrite — the
    * column disappears from reads of the new version (history still
    * shows it); bytes are reclaimed at materialization. Same caveats and
    * mutate-under-mapping rules as [[renameColumn]] (partial commits
    * keep writing the dropped column as typed NULLs so every dir of the
    * version stays union-compatible).
    */
  def dropColumn(spark: SparkSession, path: String, name: String): Long = {
    val v = currentVersion(spark, path).getOrElse(throw new IllegalStateException(
      s"dropColumn: no versioned table at $path"))
    val logical = read(spark, path).columns.toSeq
    require(logical.exists(_.equalsIgnoreCase(name)),
      s"dropColumn: no column '$name' at $path (have ${logical.mkString(",")})")
    require(logical.length > 1, s"dropColumn: cannot drop the only column")
    partitionEntries(spark, path, v).foreach { entries =>
      val partCols = entries.head._1.split('/').toSeq.map(_.split('=')(0))
      require(!partCols.exists(_.equalsIgnoreCase(name)),
        s"dropColumn: '$name' is a partition column")
    }
    require(!Constraints.list(spark, path).exists(_._2.toLowerCase
        .contains(name.toLowerCase)),
      s"dropColumn: a CHECK constraint references '$name' — drop it first")
    // see renameColumn: a dropped identity column's rule would re-fill
    // the column on the next ingest as if it were never dropped
    require(!IdentityColumns.list(spark, path).exists(_._1.equalsIgnoreCase(name)),
      s"dropColumn: '$name' carries an identity rule — drop the rule first")
    val (renames, drops) = columnMapping(spark, path, v)
    ColumnDefaults.list(spark, path)
      .find(r => r.live && r.name.equalsIgnoreCase(name)) match {
      case Some(_)
          if !versionSchema(spark, path, v).exists(
            _.fieldNames.exists(_.equalsIgnoreCase(name))) =>
        // an ADD COLUMN'd column no write ever materialized: nothing
        // physical to unmap — closing the rule's version window IS the
        // drop (the metadata commit marks where history stops serving it)
        val next = commitMetadataVersion(spark, path, v,
          colmapValue(renames, drops), "dropColumn")
        ColumnDefaults.markDropped(spark, path, name, next)
        next
      case defRule =>
        val physical = renames.collectFirst {
          case (p, l) if l.equalsIgnoreCase(name) => p
        }.getOrElse(name)
        val next = commitMetadataVersion(spark, path, v,
          colmapValue(renames - physical, drops :+ physical), "dropColumn")
        // a MATERIALIZED added column also closes its rule window, so
        // ingest stops re-filling it and the extension stops re-adding it
        if (defRule.isDefined) ColumnDefaults.markDropped(spark, path, name, next)
        next
    }
  }

  /** Delta-parity `ALTER TABLE … ADD COLUMN name type [DEFAULT expr]`
    * WITHOUT rewriting data: an O(1) metadata commit (the current
    * version's dirs republished as v+1) plus a [[ColumnDefaults]] rule.
    * Reads of v+1 onward serve the column — EXISTING rows as typed NULLs
    * (an ADD COLUMN never invents history); the DEFAULT applies to FUTURE
    * writes that omit the column (ingest materializes it physically, the
    * SQL CURRENT_DEFAULT model — change it later with
    * [[ColumnDefaults.setDefault]]). Time travel below v+1 never shows
    * the column. Refused names: existing logical columns, and physical
    * names vacated by RENAME/DROP COLUMN while the mapping is
    * unmaterialized (stats/bloom sidecars still key the old physical
    * data — the readWhere hazard ADVICE r9 flagged; compact/optimize
    * first).
    */
  def addColumn(
      spark: SparkSession, path: String, name: String, typeSql: String,
      default: Option[String] = None): Long = {
    val v = currentVersion(spark, path).getOrElse(throw new IllegalStateException(
      s"addColumn: no versioned table at $path"))
    val rule = ColumnDefaults.Rule(name, typeSql, default, addedAt = 0L)
    ColumnDefaults.validateSyntax(spark, rule)
    val logical = read(spark, path).columns.toSeq
    require(!logical.exists(_.equalsIgnoreCase(name)),
      s"addColumn: column '$name' already exists at $path")
    val (renames, drops) = columnMapping(spark, path, v)
    require(!drops.exists(_.equalsIgnoreCase(name)) &&
      !renames.keys.exists(_.equalsIgnoreCase(name)),
      s"addColumn: '$name' is still a PHYSICAL column name under the " +
        "active column mapping — data files and their stats/bloom " +
        "sidecars key it; compact/optimize to materialize the mapping " +
        "first")
    require(!ColumnDefaults.list(spark, path).exists(r =>
        r.live && r.name.equalsIgnoreCase(name)),
      s"addColumn: column '$name' already added at $path")
    val next = commitMetadataVersion(spark, path, v,
      colmapValue(renames, drops), "addColumn")
    ColumnDefaults.register(spark, path, rule.copy(addedAt = next))
    next
  }

  /** Republish `v`'s body + DV header as version v+1 with a new colmap
    * header — the shared metadata-only commit of rename/drop.
    */
  private def commitMetadataVersion(
      spark: SparkSession, path: String, v: Long, colmap: String,
      verb: String): Long = {
    val next = v + 1
    require(commitVersion(spark, path, next,
      manifestContent(spark, path, v).trim,
      dv = dvDirs(spark, path, v),
      colmap = Some(colmap)),
      s"$verb: lost the commit race for version $next at $path — retry")
    next
  }

  /** The union of `dirs`' DV parquet — rows of (file URI, row index)
    * marking deleted rows. Small by construction (16 B/deleted row), so
    * the read-side anti-join broadcasts it in the common case.
    */
  private def dvFrame(spark: SparkSession, path: String, dirs: Seq[String]): DataFrame =
    spark.read.parquet(dirs.map(d => new Path(path, d).toString): _*)

  /** The file key a DV entry stores: `_metadata.file_path` cut down to
    * start at the data-dir segment (`_d…/…` or legacy `_v…/…`). Relative
    * keys survive URI-rendering differences between readers and table
    * moves/clones, and make partition-prefix math on DV entries exact
    * (see [[detail]]); data-dir names embed millis+nanos, so keys never
    * collide across dirs.
    */
  private def dvFileKey(filePath: Column): Column =
    regexp_extract(filePath, "/((?:_d|_v)[^/]*/.*)$", 1)

  /** Apply a deletion vector to ONE scan leg: anti-join on the parquet
    * reader's (`_metadata.file_path` → [[dvFileKey]],
    * `_metadata.row_index`) — Delta's DV read path re-expressed as a
    * plan. Must run directly on the scan relation (metadata columns
    * don't survive an alignTo projection), so every caller wraps legs
    * BEFORE aligning or unioning them. Stale DV entries (files a later
    * rewrite replaced) match nothing and are harmless; full-image
    * commits (optimize / compact / atomicReplace) drop the header
    * entirely, materializing the deletes.
    */
  private def dvFilterLeg(leg: DataFrame, dv: Option[DataFrame]): DataFrame =
    dv.fold(leg) { d =>
      leg.withColumn(DvFileCol, dvFileKey(col("_metadata.file_path")))
        .withColumn(DvIdxCol, col("_metadata.row_index"))
        .join(d, Seq(DvFileCol, DvIdxCol), "left_anti")
        .drop(DvFileCol, DvIdxCol)
    }

  /** The version's DV as Some(frame) when the `#dv=` header is present —
    * the one object read paths thread through [[dvFilterLeg]]. */
  private def dvOf(spark: SparkSession, path: String, version: Long): Option[DataFrame] = {
    val dirs = dvDirs(spark, path, version)
    if (dirs.isEmpty) None else Some(dvFrame(spark, path, dirs))
  }

  /** Merge-on-read DELETE (Delta deletion vectors): rows matching
    * `condition` leave the table as the next version WITHOUT rewriting a
    * single data file — the commit writes only a deletion-vector dir
    * (one (file, row_index) pair per deleted row) and re-publishes the
    * same manifest body with the DV appended to its `#dv=` header. At
    * 100 TB this is the difference between an O(deleted rows) commit and
    * rewriting whole partitions to drop a handful of rows
    * ([[delete]] — the copy-on-write tier — rewrites; this tier marks).
    *
    * Reads pay one anti-join against the DV (broadcast while the DV is
    * small — the operating regime; a DV that has grown large means it is
    * time to [[optimize]] or [[compact]], either of which materializes
    * the deletes and resets the header). DVs accumulate across commits
    * and survive merges/updates of OTHER partitions (carried forward in
    * the commit header); entries for files a rewrite replaced go stale
    * and match nothing.
    *
    * `condition` must be deterministic (same contract as [[delete]]).
    * `cdf = true` captures the deleted rows into this commit's change
    * manifest for [[tableChanges]]. A no-match delete is a no-op.
    * Returns the committed (or current) version.
    */
  /** Merge-on-read UPSERT (the MERGE twin of [[deleteVectors]]): commit
    * cost is O(update rows), not O(table). Matched target rows are
    * retired by deletion vector (one (file, row_index) pair each — no
    * data file rewritten); the update rows land in ONE fresh appended
    * data dir; the manifest body grows by that dir's line. At 100 TB an
    * upsert touching 0.1% of a table costs 0.1% of a rewrite — the same
    * commit shape Delta's DV-enabled MERGE writes. The copy-on-write
    * tier ([[merge]] with `mergeOnRead = false`) stays the right call
    * when updates approach table size.
    *
    * Reads pay the per-leg DV anti-join plus a union over the appended
    * dirs; both are bounded by running [[optimize]] (or
    * [[atomicReplace]]) periodically, which materializes DVs and folds
    * the dirs back to one — the Delta OPTIMIZE discipline.
    *
    * Matches [[mergeFrames]] semantics exactly: duplicate-pk update rows
    * keep one arbitrary row, table column order is preserved, and a
    * replayed merge re-commits the same image (its appended rows DV the
    * previous merge's). Unpartitioned versioned tables only; schema
    * evolution goes through the rewrite tier. Returns the committed
    * version (-1 = txn re-delivery, nothing committed).
    */
  /** Auto-tier floor for [[merge]]'s merge-on-read decision: below this
    * many rows (summed from the version's sidecars — metadata-only), a
    * full rewrite is cheaper than MOR's extra join/probe jobs; above it,
    * rewrite cost keeps growing with the table while MOR stays
    * O(update rows). Dirs without sidecars (pre-stats commits) count as
    * unknown → rewrite (conservative).
    */
  val MorAutoRowsFloor: Long = 10000000L

  /** Auto-tier cap on merge-on-read CHAIN length: once a version lists
    * this many data dirs, the next auto-tiered merge takes the rewrite
    * path, which materializes DVs and folds the dirs back to one — so
    * read fan-out (one relation per dir + the DV anti-join) is bounded
    * by construction, Delta's auto-compaction discipline without a
    * separate maintenance job. Forcing `mergeOnRead = Some(true)`
    * bypasses the cap (run [[optimize]]/[[compact]] yourself).
    */
  val MorMaxDataDirs: Int = 64

  /** Sidecar-only row count of the affected partitions' slice (per dir,
    * files under any affected partition prefix — the same math DETAIL
    * uses). None when any dir lacks a sidecar (pre-stats commits);
    * callers treat unknown as "rewrite".
    */
  private def affectedSliceRows(
      spark: SparkSession, path: String,
      affectedEntries: Seq[(String, String)]): Option[Long] = {
    val perDir = affectedEntries.groupBy(_._2).toSeq.map { case (dd, es) =>
      val parts = es.map(_._1)
      DataSkipping.readStats(spark, new Path(path, dd).toString).map(sc =>
        sc.files.filter { case (rel, _) =>
          parts.exists(p => rel.startsWith(p + "/"))
        }.values.map(_.rows).sum)
    }
    if (perDir.forall(_.isDefined)) Some(perDir.flatten.sum) else None
  }

  /** Sidecar-only row count of a whole snapshot (both layouts). None
    * when any referenced dir lacks a sidecar (pre-stats commits). DV'd
    * rows are NOT subtracted, so on a merge-on-read chain this over-
    * counts live rows — callers using it as a fraction denominator get
    * a conservative (smaller) fraction.
    */
  private[sources] def snapshotRowsFromSidecars(
      spark: SparkSession, path: String, version: Long): Option[Long] =
    partitionEntries(spark, path, version) match {
      case Some(entries) => affectedSliceRows(spark, path, entries)
      case None =>
        val perDir = unpartitionedDirs(spark, path, version).map(dd =>
          DataSkipping.readStats(spark, new Path(path, dd).toString)
            .map(_.files.values.map(_.rows).sum))
        if (perDir.nonEmpty && perDir.forall(_.isDefined))
          Some(perDir.flatten.sum)
        else None
    }

  private[sources] def autoMergeOnRead(
      spark: SparkSession, path: String, version: Long,
      rowsFloor: Long = MorAutoRowsFloor,
      maxDirs: Int = MorMaxDataDirs): Boolean =
    partitionEntries(spark, path, version).isEmpty && {
      val dirs = unpartitionedDirs(spark, path, version)
      val perDir = dirs.map(dd =>
        DataSkipping.readStats(spark, new Path(path, dd).toString)
          .map(_.files.values.map(_.rows).sum))
      dirs.size < maxDirs &&
        perDir.forall(_.isDefined) && perDir.flatten.sum > rowsFloor
    }

  def mergeVectors(
      spark: SparkSession, path: String, updates: DataFrame, pk: Seq[String],
      cdf: Boolean = false, txn: Option[(String, Long)] = None): Long = {
    requireTxnAppId(txn)
    TableProperties.requireNotAppendOnly(spark, path, "mergeVectors")
    // MOR's update set is small by contract, so the NDV probe can cost
    // more than the decision saves (ADVICE r13): when even the STATIC
    // estimate of the updates plan already sits under the broadcast
    // threshold, Catalyst broadcasts the derived key set unaided — skip
    // the probe. Lazy besides: the txn re-delivery fast path below
    // returns before any probe runs.
    lazy val keysHint = {
      val threshold = autoBroadcastThreshold(spark)
      val static = updates.queryExecution.optimizedPlan.stats.sizeInBytes
      if (threshold > 0 && static <= threshold) None
      else planMergeStats(spark, path, updates, pk).broadcastKeys
    }
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= 10, s"mergeVectors: lost the version race at $path")
      if (txnAlreadyApplied(spark, path, txn)) return -1L
      val v = currentVersion(spark, path).getOrElse(throw new IllegalStateException(
        s"mergeVectors: no versioned table at $path (merge-on-read needs " +
          "manifest isolation; create the table first)"))
      require(partitionEntries(spark, path, v).isEmpty,
        s"mergeVectors: $path is partitioned — partitioned merges are " +
          "already partition-scoped (mergeVersioned)")
      val target = readVersion(spark, path, v)
      val cols = target.columns.toSeq
      val (cmR, cmD) = columnMapping(spark, path, v)
      val upd = GeneratedColumns.fill(spark, path,
        ColumnDefaults.fill(spark, path, updates))
        .dropDuplicates(pk).select(cols.map(col): _*)
      // retire matched target rows by DV: per-leg (file, row_index) of
      // rows whose pk is in the update set, prior DVs already excluded.
      // Legs are physical — the logical view goes on AFTER the DV join
      // (row addresses are name-agnostic; pk names are logical)
      val updKeys = hintKeys(upd.select(pk.map(col): _*).distinct(), keysHint)
      val dv = dvOf(spark, path, v)
      val matched = versionLegs(spark, path, v).map { leg =>
        val withMeta = leg.withColumn(DvFileCol, dvFileKey(col("_metadata.file_path")))
          .withColumn(DvIdxCol, col("_metadata.row_index"))
        applyColmapTo(cmR, cmD,
          dv.fold(withMeta)(d => withMeta.join(d, Seq(DvFileCol, DvIdxCol), "left_anti")))
      }.reduce(_.unionByName(_))
        .join(updKeys, pk, "left_semi")
        .select(col(DvFileCol), col(DvIdxCol))
      // the append dir carries the full update set (matched rows'
      // replacements AND inserts) in PHYSICAL names under an active
      // mapping; written before the commit loop's CAS so losers can
      // clean up
      val dataDir = freshDataDirName()
      val updPhys = toPhysical(spark, path, v, upd)
      writePlain(updPhys, new Path(path, dataDir).toString, Nil)
      DataSkipping.writeStats(spark, new Path(path, dataDir).toString, updPhys.schema)
      validateCommit(spark, path, dataDir, physicalNames = true)
      // ONE job computes the matches: write the DV dir, then probe what
      // landed (an isEmpty pre-check would run the snapshot-join twice)
      val dvName = s"$DvDirName/dv${System.currentTimeMillis()}_${System.nanoTime() % 1000000}"
      val dvPath = new Path(path, dvName)
      sizedForWrite(matched)
        .write.mode(SaveMode.Overwrite).parquet(dvPath.toString)
      val hasMatches = !spark.read.parquet(dvPath.toString).isEmpty
      if (!hasMatches) hadoopFs(spark, dvPath).delete(dvPath, true)
      val content = manifestContent(spark, path, v).trim + "\n" + dataDir
      val dvs = dvDirs(spark, path, v) ++ (if (hasMatches) Seq(dvName) else Nil)
      if (commitVersion(spark, path, v + 1, content, txn, dvs,
          carriedColmap(spark, path, v))) {
        // CDF capture scoped to the affected keys: rows outside the
        // update-key set are byte-identical across the commit (same
        // files), so diffing the pre-snapshot's affected slice against
        // the COMMITTED appended dir equals the full-snapshot diff at a
        // fraction of the cost (and still never re-evaluates the update
        // plan — the post side is what the commit actually published)
        // re-select after the semi-join: a using-columns join HOISTS the
        // pk columns to the front, and the feed must carry table order
        if (cdf) writeChangeManifest(spark, path, v + 1,
          changeRowsBetween(
            target.join(updKeys, pk, "left_semi").select(cols.map(col): _*),
            applyColmapTo(cmR, cmD,
              spark.read.parquet(new Path(path, dataDir).toString)),
            pk, "right_outer"))
        return v + 1
      } else { // lost the race: recompute against the winner's snapshot
        val dd = new Path(path, dataDir)
        hadoopFs(spark, dd).delete(dd, true)
        if (hasMatches) hadoopFs(spark, dvPath).delete(dvPath, true)
      }
    }
    -1L // unreachable
  }

  /** CONVERT a plain parquet layout into a versioned table in place —
    * Delta's `CONVERT TO DELTA` parity verb, no data rewritten: the
    * existing parquet files (or hive partition dirs) are RENAMED into a
    * fresh `_d*` data dir (metadata-only on any real filesystem), a
    * stats+schema sidecar is swept from their footers, and v1 publishes
    * through the usual atomic commit. From then on the path is a normal
    * versioned table (time travel, MERGE, DV, skipping).
    *
    * Like Delta's CONVERT, the table must be QUIESCED: concurrent plain
    * writers during the rename sweep lose their in-flight files'
    * placement guarantees. The sweep itself is not atomic, but is safe
    * against readers at every instant — `_`-prefixed dirs are invisible
    * to plain parquet readers (a plain reader sees a shrinking but valid
    * table until the manifest lands), and the graft manifest only
    * publishes after every file has moved. Partitioned layouts pass
    * their partition columns; nested partitioning (a=…/b=…) is
    * supported. Fails if the path already has a manifest.
    *
    * Failure atomicity: losing the creation race (a concurrent create or
    * convert committed v1 first) RESTORES every moved file/dir to its
    * original location and removes the staging dir before throwing, so
    * the loser leaves the plain layout exactly as it found it — no
    * stranded-but-unreferenced files for [[vacuum]] to destroy. The one
    * non-atomic window that remains is a hard process death mid-sweep:
    * recover by moving the `_d*` dir's contents back to the root BEFORE
    * any vacuum runs (vacuum deletes unreferenced dirs).
    */
  def convert(
      spark: SparkSession, path: String,
      partitionColumns: Seq[String] = Nil): Long = {
    require(currentVersion(spark, path).isEmpty,
      s"convert: $path already holds a versioned table")
    val root = new Path(path)
    val fs = hadoopFs(spark, root)
    require(fs.exists(root), s"convert: no parquet layout at $path")
    val dataDir = freshDataDirName()
    val dd = new Path(path, dataDir)
    fs.mkdirs(dd)
    // every rename is journaled so a lost creation race can be unwound
    val moved = scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]
    def sweepInto(sources: Seq[Path]): Unit = sources.foreach { src =>
      val dst = new Path(dd, src.getName)
      require(fs.rename(src, dst), s"convert: rename failed for $src")
      moved += ((src, dst))
    }
    def commitOrRestore(body: String): Unit =
      if (!commitVersion(spark, path, 1L, body)) {
        moved.reverseIterator.foreach { case (orig, dst) => fs.rename(dst, orig) }
        fs.delete(dd, true)
        throw new IllegalStateException(
          s"convert: lost the creation race at $path — a concurrent " +
          "create/convert committed first; all moved files were restored " +
          "to their original locations")
      }
    if (partitionColumns.isEmpty) {
      val files = fs.listStatus(root).filter(st => st.isFile &&
        st.getPath.getName.endsWith(".parquet") &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
      require(files.nonEmpty, s"convert: no parquet files at the root of $path " +
        "(for a partitioned layout pass its partition columns)")
      sweepInto(files.map(_.getPath).toSeq)
      DataSkipping.writeStats(spark, dd.toString,
        spark.read.parquet(dd.toString).schema)
      commitOrRestore(dataDir)
    } else {
      // top-level hive dirs ("col=value") move wholesale, preserving any
      // nested partition structure beneath them
      val tops = fs.listStatus(root).filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(partitionColumns.head + "="))
      require(tops.nonEmpty,
        s"convert: no ${partitionColumns.head}=* partition dirs at $path")
      sweepInto(tops.map(_.getPath).toSeq)
      DataSkipping.writeStats(spark, dd.toString,
        spark.read.parquet(dd.toString).schema)
      // leaf partition dirs (depth = |partitionColumns|) become entries
      def leaves(dir: Path, depth: Int): Seq[String] =
        if (depth == 0) Seq(dir.toUri.getPath.stripPrefix(dd.toUri.getPath).stripPrefix("/"))
        else fs.listStatus(dir).filter(_.isDirectory)
          .filter(_.getPath.getName.contains('='))
          .flatMap(st => leaves(st.getPath, depth - 1)).toSeq
      val entries = leaves(dd, partitionColumns.length).sorted
        .map(p => s"$p\t$dataDir").mkString("\n")
      require(entries.nonEmpty, s"convert: no leaf partition dirs of depth " +
        s"${partitionColumns.length} under $path")
      commitOrRestore(entries)
    }
    1L
  }

  /** Versioned INSERT INTO (Delta's AddFile append): on an UNPARTITIONED
    * versioned table the commit is O(appended rows) — the new rows land
    * in one fresh data dir and the manifest body grows by that line
    * (existing dirs and deletion vectors untouched, exactly the
    * [[mergeVectors]] commit shape minus the DV). Duplicates are NOT
    * deduplicated — INSERT is append, [[merge]] is the upsert verb.
    *
    * On a PARTITIONED versioned table the append is ALSO O(appended
    * rows): the new rows land in one fresh dir and the manifest gains
    * `(partition → newDir)` entries beside the existing ones — a
    * partition may span several dirs until the next merge or row-level
    * rewrite of that partition consolidates it (every slice reader
    * groups the full entry list by dir). Untouched partitions: zero
    * entries added, zero I/O.
    *
    * `cdf = true` captures the appended rows as inserts. Returns the
    * committed version (-1 = txn re-delivery, nothing committed).
    */
  /** Align an INSERT source to the table schema: by NAME when the row
    * columns are exactly the table's (any order, case-insensitive) —
    * the DataFrame-API shape; otherwise by POSITION with casts — SQL
    * `INSERT INTO … VALUES` semantics, where a VALUES list arrives as
    * col1/col2/… (same rule Spark applies to non-byName inserts).
    */
  private[graft] def alignInsert(rows: DataFrame, table: StructType): DataFrame = {
    val tNames = table.fieldNames.map(_.toLowerCase).toSet
    val byName = rows.columns.length == table.fields.length &&
      rows.columns.map(_.toLowerCase).toSet == tNames
    if (byName)
      rows.select(table.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    else {
      require(rows.columns.length == table.fields.length,
        s"insert: source has ${rows.columns.length} columns, table has " +
          s"${table.fields.length} (${table.fieldNames.mkString(", ")})")
      rows.select(rows.columns.zip(table.fields).map { case (c, f) =>
        col(c).cast(f.dataType).as(f.name)
      }.toSeq: _*)
    }
  }

  def insertInto(
      spark: SparkSession, path: String, rows0: DataFrame,
      cdf: Boolean = false, txn: Option[(String, Long)] = None): Long = {
    requireTxnAppId(txn)
    val rows = GeneratedColumns.fill(spark, path,
      ColumnDefaults.fill(spark, path,
        IdentityColumns.fill(spark, path, rows0)))
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= 10, s"insertInto: lost the version race at $path")
      if (txnAlreadyApplied(spark, path, txn)) return -1L
      val v = currentVersion(spark, path).getOrElse(throw new IllegalStateException(
        s"insertInto: no versioned table at $path (plain layouts append " +
          "through ParquetTable.append)"))
      partitionEntries(spark, path, v) match {
        case None =>
          // the insert aligns to the LOGICAL schema; the appended dir is
          // written physical under an active mapping, which carries
          val aligned = alignInsert(rows, readVersion(spark, path, v).schema)
          val (cmR, cmD) = columnMapping(spark, path, v)
          val dataDir = freshDataDirName()
          val alignedPhys = toPhysical(spark, path, v, aligned)
          writePlain(alignedPhys, new Path(path, dataDir).toString, Nil)
          DataSkipping.writeStats(spark, new Path(path, dataDir).toString,
            alignedPhys.schema)
          validateCommit(spark, path, dataDir, physicalNames = true)
          val content = manifestContent(spark, path, v).trim + "\n" + dataDir
          if (commitVersion(spark, path, v + 1, content, txn, dvDirs(spark, path, v),
              carriedColmap(spark, path, v))) {
            if (cdf) writeChangeManifest(spark, path, v + 1,
              applyColmapTo(cmR, cmD,
                spark.read.parquet(new Path(path, dataDir).toString))
                .withColumn("_change_type", lit("insert")))
            return v + 1
          } else {
            val dd = new Path(path, dataDir)
            hadoopFs(spark, dd).delete(dd, true)
          }
        case Some(entries) =>
          // partitioned APPEND-ENTRY commit — O(appended rows), the
          // Delta AddFile shape: the new rows land in one fresh dir and
          // the manifest gains (partition → newDir) entries BESIDE the
          // old ones (a partition may now span several dirs; every slice
          // reader — merges, row-level rewrites, reads, vacuum, detail —
          // groups the full entry list by dir). The next merge or
          // row-level rewrite of an affected partition consolidates it
          // back onto a single dir.
          val partitionColumns = entries.head._1.split('/').toSeq.map(_.split('=')(0))
          val aligned = alignInsert(rows, readVersion(spark, path, v).schema)
          val (cmR, cmD) = columnMapping(spark, path, v)
          val affected = partitionDirsOf(aligned, partitionColumns)
          val dataDir = freshDataDirName()
          val alignedPhys = toPhysical(spark, path, v, aligned)
          writePlain(alignedPhys, new Path(path, dataDir).toString, partitionColumns)
          DataSkipping.writeStats(spark, new Path(path, dataDir).toString,
            alignedPhys.schema)
          validateCommit(spark, path, dataDir, physicalNames = true)
          val newEntries = (entries ++ affected.map(_ -> dataDir)).sorted
            .map { case (p, dd) => s"$p\t$dd" }.mkString("\n")
          if (commitVersion(spark, path, v + 1, newEntries, txn, dvDirs(spark, path, v),
              carriedColmap(spark, path, v))) {
            // capture from the COMMITTED dir, never the row plan: the
            // appended dir IS exactly the inserted multiset
            if (cdf) writeChangeManifest(spark, path, v + 1,
              applyColmapTo(cmR, cmD,
                spark.read.option("basePath", new Path(path, dataDir).toString)
                  .parquet(affected.map(p => s"$path/$dataDir/$p"): _*))
                .select(aligned.columns.map(col).toSeq: _*)
                .withColumn("_change_type", lit("insert")))
            return v + 1
          } else {
            val dd = new Path(path, dataDir)
            hadoopFs(spark, dd).delete(dd, true)
          }
      }
    }
    -1L // unreachable
  }

  def deleteVectors(
      spark: SparkSession, path: String, condition: Column,
      cdf: Boolean = false): Long = {
    TableProperties.requireNotAppendOnly(spark, path, "deleteVectors")
    var result = -1L
    var attempts = 0
    while (result < 0) {
      attempts += 1
      require(attempts <= 10, s"deleteVectors: lost the version race at $path")
      val v = currentVersion(spark, path).getOrElse(throw new IllegalStateException(
        s"deleteVectors: no versioned table at $path (deletion vectors " +
          "need manifest isolation)"))
      val dv = dvOf(spark, path, v)
      val (cmR, cmD) = columnMapping(spark, path, v)
      // legs with the reader's (file, row_index) attached, previous DVs
      // already excluded — so re-deleting an already-deleted row is a
      // no-op and the new DV holds only live matches. Logical view over
      // each physical leg so `condition` resolves under a column mapping
      // (a DV is pure row addressing — the commit carries the map).
      val snap = versionLegs(spark, path, v).map { leg =>
        val withMeta = leg.withColumn(DvFileCol, dvFileKey(col("_metadata.file_path")))
          .withColumn(DvIdxCol, col("_metadata.row_index"))
        applyColmapTo(cmR, cmD,
          dv.fold(withMeta)(d => withMeta.join(d, Seq(DvFileCol, DvIdxCol), "left_anti")))
      }.reduce(_.unionByName(_))
      requireDeterministic(snap.drop(DvFileCol, DvIdxCol), condition, None, "deleteVectors")
      // matched is DELETE-SIZED (O(matched rows) is this verb's whole
      // contract) — persist it so the no-op probe, the DV write and the
      // cdf capture share ONE snapshot scan instead of three (guide §2.4;
      // at 100 TB each re-evaluation was a full table scan)
      val matched = snap.filter(condition)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        if (matched.isEmpty) result = v // no-op
        else {
          val dvName = s"$DvDirName/dv${System.currentTimeMillis()}_${System.nanoTime() % 1000000}"
          sizedForWrite(matched.select(col(DvFileCol), col(DvIdxCol)))
            .write.mode(SaveMode.Overwrite).parquet(new Path(path, dvName).toString)
          val content = manifestContent(spark, path, v)
          if (commitVersion(spark, path, v + 1, content,
              dv = dvDirs(spark, path, v) :+ dvName,
              colmap = carriedColmap(spark, path, v))) {
            if (cdf) writeChangeManifest(spark, path, v + 1,
              matched.drop(DvFileCol, DvIdxCol).withColumn("_change_type", lit("delete")))
            result = v + 1
          } else { // lost the race: the winner may have changed what matches
            val dd = new Path(path, dvName)
            hadoopFs(spark, dd).delete(dd, true)
          }
        }
      } finally { matched.unpersist(); () }
    }
    result
  }

  // ---- per-commit change data feed ---------------------------------------

  private def changesDir(path: String) = new Path(path, "_graft_changes")

  private def changeManifestPath(path: String, version: Long) =
    new Path(changesDir(path), f"v$version%020d")

  /** Change rows between two keyed images of a table: `_change_type` ∈
    * insert | delete | update_preimage | update_postimage, one row per
    * image. `joinType = "right_outer"` is the MERGE-capture shape (keys
    * absent from `after` are unchanged, not deleted — merge never
    * deletes); `"full_outer"` is the snapshot-diff shape (absent keys ARE
    * deletes). Identical rows never leave the join, so the result is
    * changed-rows-sized, not table-sized.
    */
  private[sources] def changeRowsBetween(
      before: DataFrame, after: DataFrame, pk: Seq[String],
      joinType: String): DataFrame = {
    // across a schema-evolution boundary, widen BOTH sides to the
    // superset first (the narrower side reads appended columns as NULL),
    // so a value appearing in a new column reports as an update instead
    // of being invisible to the diff
    val schema = supersetSchema(Seq(before.schema, after.schema))
      .getOrElse(before.schema)
    val beforeW = alignTo(before, schema)
    val cols = beforeW.columns.toSeq
    // then align the update side to the table's column order AND types
    // (a partitioned read infers partition-column types, e.g. day →
    // DATE, that an update batch may still carry as strings)
    val aligned = alignTo(after, schema).select(
      cols.map(c => col(c).cast(beforeW.schema(c).dataType).as(c)): _*)
    def packed(df: DataFrame, a: String) =
      df.select(pk.map(col) :+ struct(cols.map(col): _*).as(a): _*)
    val j = packed(beforeW, "__old").join(packed(aligned, "__new"), pk, joinType)
    // ONE evaluation of the join: each joined row contributes its 1–2
    // change images through a single generate. The previous
    // union-of-filtered-branches formulation duplicated the join subtree
    // per branch — Spark has no cross-branch common-subplan sharing, so
    // the join AND both snapshot scans under it executed once per change
    // type (measured: 6 parquet scans for a right_outer capture, 2 after;
    // guide §2.4 "remove shuffles outright" applied to whole subtrees).
    def tagged(side: String, changeType: String) =
      struct(cols.map(c => col(side).getField(c).as(c)) :+
        lit(changeType).as("_change_type"): _*)
    val changed = j.filter(col("__old").isNull || col("__new").isNull ||
      !(col("__old") <=> col("__new")))
    val entries = when(col("__old").isNull, array(tagged("__new", "insert")))
      .when(col("__new").isNull, array(tagged("__old", "delete")))
      .otherwise(array(tagged("__old", "update_preimage"),
        tagged("__new", "update_postimage")))
    changed.select(explode(entries).as("__e")).select(col("__e.*"))
  }

  /** Persist one commit's change rows (written by the commit WINNER only,
    * after the manifest commit — the pre-commit snapshot dirs the change
    * plan reads are still on disk, and a crash in between just means this
    * commit falls back to the snapshot-diff path of [[tableChanges]]).
    */
  private def writeChangeManifest(
      spark: SparkSession, path: String, version: Long, changeRows: DataFrame): Unit =
    sizedForWrite(changeRows).write.mode(SaveMode.Overwrite)
      .parquet(changeManifestPath(path, version).toString)

  /** Per-commit change data feed — the Delta `table_changes` tier that the
    * net snapshot-diff [[changes]] deliberately is not. Emits each commit
    * in `[fromVersion, toVersion]` separately with `_commit_version` and
    * `_change_type` ∈ insert | delete | update_preimage | update_postimage,
    * so a key changed in one commit and reverted in a later one appears in
    * BOTH (nothing collapses), and updates carry pre- AND post-images.
    *
    * Per commit, the source is (in order):
    *   1. the change manifest captured at merge time (`cdf = true` — only
    *      changed rows are read, never the table); else
    *   2. a snapshot diff of `v-1 → v` (both snapshots must still exist;
    *      cost: one scan of each + a PK shuffle, plus the duplicate-PK
    *      fail-fast probe of [[changes]]); else
    *   3. for the initial commit (v = 1), every row is an insert.
    * A commit with neither a change manifest nor surviving snapshots
    * (vacuumed) fails fast — capture with `cdf = true` if the feed must
    * outlive snapshot retention (`vacuum` never deletes change manifests).
    *
    * No `_commit_timestamp` column: manifest file mtimes are not part of
    * the committed state (they don't survive a copy), so rather than emit
    * an unstable column the timestamp is left to the caller.
    */
  /** Whether EVERY commit in [fromVersion, toVersion] captured a change
    * manifest (merged/updated/deleted with `cdf = true`) — i.e. whether
    * [[tableChanges]] over that window is guaranteed change-sized (reads
    * only the captured manifests, never a table snapshot). Metadata-only:
    * one existence probe per commit.
    */
  def hasChangeManifests(
      spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long): Boolean =
    (fromVersion to toVersion).forall { v =>
      val cf = changeManifestPath(path, v)
      hadoopFs(spark, cf).exists(cf)
    }

  def tableChanges(
      spark: SparkSession,
      path: String,
      fromVersion: Long,
      toVersion: Long,
      pk: Seq[String]): DataFrame = {
    require(fromVersion >= 1 && fromVersion <= toVersion,
      s"tableChanges: bad version range [$fromVersion, $toVersion]")
    val have = versions(spark, path).toSet
    require(have.nonEmpty, s"tableChanges: no versioned table at $path")
    require(toVersion <= have.max,
      s"tableChanges: version $toVersion not committed yet at $path")
    val perCommit = (fromVersion to toVersion).map { v =>
      val cf = changeManifestPath(path, v)
      val base =
        if (hadoopFs(spark, cf).exists(cf)) spark.read.parquet(cf.toString)
        else if (v == 1L && have.contains(1L))
          readVersion(spark, path, 1L).withColumn("_change_type", lit("insert"))
        else if (have.contains(v) && have.contains(v - 1)) {
          val before = readVersion(spark, path, v - 1)
          val after = readVersion(spark, path, v)
          requireUniquePk(
            Seq(s"v${v - 1}" -> before, s"v$v" -> after), pk,
            s"tableChanges commit $v at $path")
          changeRowsBetween(before, after, pk, "full_outer")
        } else throw new IllegalStateException(
          s"tableChanges: commit $v at $path has no change manifest and its " +
            "snapshots are gone (vacuumed); merge with cdf = true to keep a " +
            "change feed beyond snapshot retention")
      base.withColumn("_commit_version", lit(v))
    }
    perCommit.reduce(_.unionByName(_))
  }

  /** DESCRIBE-HISTORY tier: one row per committed version, newest first —
    * version, whether the manifest is partitioned, how many partition
    * entries and distinct data dirs it references, whether a per-commit
    * change manifest was captured, and the manifest file's modification
    * time (surfaced as `manifest_mtime` for operators; NOT part of the
    * committed state — see `tableChanges` — which is why no oracle query
    * depends on it). Driver-side listing of the manifest dir only: one
    * tiny file stat per version, no data I/O.
    */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = hadoopFs(spark, manifestDir(path))
    versions(spark, path).sorted(Ordering[Long].reverse).map { v =>
      val entries = partitionEntries(spark, path, v)
      val mtime = fs.getFileStatus(new Path(manifestDir(path), f"v$v%020d"))
        .getModificationTime
      val cf = changeManifestPath(path, v)
      (v, entries.isDefined, entries.map(_.size).getOrElse(1),
        entries.map(_.map(_._2).distinct.size).getOrElse(1),
        hadoopFs(spark, cf).exists(cf),
        commitTimestamp(spark, path, v).map(new java.sql.Timestamp(_)),
        new java.sql.Timestamp(mtime))
    }.toDF("version", "partitioned", "n_entries", "n_data_dirs",
      "has_change_manifest", "commit_ts", "manifest_mtime")
  }

  /** DESCRIBE-DETAIL tier (Delta `DESCRIBE DETAIL`): one metadata-only
    * row for the CURRENT snapshot — version, commit instant, partition
    * shape, file/row counts from the stats sidecars (no data I/O; counts
    * are None when some dir predates sidecars), history depth, the
    * CHECK-constraint count, and the active column mapping (the raw
    * `#colmap=` value; empty when unmapped). Plain parquet dirs report
    * format "parquet" with only the location filled.
    */
  def detail(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val row = currentVersion(spark, path) match {
      case None =>
        Seq((path, "parquet", Option.empty[Long],
          Option.empty[java.sql.Timestamp], false, Seq.empty[String],
          0, 0, Option.empty[Long], Option.empty[Long], 0L, 0, 0, ""))
      case Some(v) =>
        val entries = partitionEntries(spark, path, v)
        val partCols = entries.map(_.head._1.split('/').toSeq.map(_.split('=')(0)))
          .getOrElse(Nil)
        // (dataDir, referenced partition prefixes — empty = whole dir)
        val dirRefs: Seq[(String, Seq[String])] = entries match {
          case None => unpartitionedDirs(spark, path, v).map((_, Nil))
          case Some(es) => es.groupBy(_._2).toSeq.sortBy(_._1)
            .map { case (dd, ps) => (dd, ps.map(_._1)) }
        }
        val perDir = dirRefs.map { case (dd, parts) =>
          DataSkipping.readStats(spark, new Path(path, dd).toString).map { sc =>
            val files = sc.files.filter { case (rel, _) =>
              parts.isEmpty || parts.exists(p => rel.startsWith(p + "/"))
            }
            (files.size.toLong, files.values.map(_.rows).sum)
          }
        }
        val (nf, nrRaw) =
          if (perDir.forall(_.isDefined))
            (Some(perDir.flatMap(_.map(_._1)).sum), Some(perDir.flatMap(_.map(_._2)).sum))
          else (None, None)
        // LIVE deletion-vector entries: DV keys are data-dir-relative
        // (dvFileKey), so an entry is live iff its (dataDir[, partition])
        // prefix is still referenced by this version's manifest — an
        // equi-join on the extracted prefix, never a data scan. Stale
        // entries (from rewritten partitions) are excluded exactly.
        val nDel = dvDirs(spark, path, v) match {
          case Nil => 0L
          case dirs =>
            import spark.implicits._
            val prefixes = dirRefs.flatMap { case (dd, parts) =>
              val dirName = new Path(path, dd).getName
              if (parts.isEmpty) Seq(dirName) else parts.map(p => s"$dirName/$p")
            }.distinct.toDF("__graft_prefix")
            val depth = if (partCols.isEmpty) 1 else 1 + partCols.size
            val keyPrefix = regexp_extract(col(DvFileCol),
              s"^((?:[^/]+/){${depth - 1}}[^/]+)", 1)
            dvFrame(spark, path, dirs)
              .withColumn("__graft_prefix", keyPrefix)
              .join(prefixes, Seq("__graft_prefix"), "left_semi").count()
        }
        val nr = nrRaw.map(_ - nDel)
        val (cmR, cmD) = columnMapping(spark, path, v)
        Seq((path, "graft", Some(v),
          commitTimestamp(spark, path, v).map(new java.sql.Timestamp(_)),
          entries.isDefined, partCols,
          entries.map(_.size).getOrElse(0), dirRefs.size, nf, nr, nDel,
          versions(spark, path).size,
          Constraints.list(spark, path).size,
          colmapValue(cmR, cmD)))
    }
    row.toDF("location", "format", "version", "commit_ts", "partitioned",
      "partition_columns", "n_partitions", "n_data_dirs", "num_files",
      "num_rows", "num_deleted_rows", "n_versions", "n_constraints",
      "column_mapping")
  }

  /** RESTORE-TABLE tier: republish the image of `version` as the NEXT
    * version — a metadata-only commit (the manifest body is re-pointed at
    * the old version's data dirs; zero data I/O, any table size). History
    * is untouched: the rolled-back versions stay readable via `readAt`
    * until `vacuum`, exactly Delta's RESTORE semantics. The restored
    * version's dirs must still exist, so restore what `vacuum` has kept.
    * Returns the new version number.
    */
  def restore(spark: SparkSession, path: String, version: Long): Long = {
    require(versions(spark, path).contains(version),
      s"restore: version $version not present at $path " +
        s"(have: ${versions(spark, path).mkString(", ")})")
    val content = manifestContent(spark, path, version)
    // the restored version's deletion vectors AND column mapping are part
    // of its snapshot — restoring without them would resurrect
    // vector-deleted rows / revert logical names
    val dv = dvDirs(spark, path, version)
    val (cmR, cmD) = columnMapping(spark, path, version)
    val cm = Some(colmapValue(cmR, cmD)).filter(_.nonEmpty)
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= 10, s"restore: lost the version race at $path")
      val v = currentVersion(spark, path).getOrElse(0L) + 1
      if (commitVersion(spark, path, v, content, dv = dv, colmap = cm)) return v
    }
    -1L // unreachable
  }

  /** SHALLOW CLONE (Delta's `CREATE TABLE t SHALLOW CLONE s`): publish
    * `targetPath` as a new versioned table whose v1 manifest references
    * the SOURCE's data dirs by absolute path — a metadata-only commit,
    * zero data I/O at any table size. Dir references in manifests resolve
    * via `new Path(tablePath, dir)`, which passes absolute dirs through
    * untouched, so every read tier (snapshot, time travel, data skipping,
    * partition pruning) serves the clone from the source's files.
    *
    * Divergence semantics match Delta: writes to the clone lay fresh data
    * dirs under the CLONE's path and re-point only what changed (a
    * partitioned merge keeps untouched partitions on source dirs), while
    * the source never sees clone commits. `vacuum` on the clone only ever
    * deletes dirs under the clone's own path — it cannot reclaim source
    * files. The one shared hazard is Delta's too: `vacuum` on the SOURCE
    * can delete dirs a clone still references (the source does not know
    * its clones); keep source history for as long as clones of it live.
    *
    * `version` clones a historical snapshot (defaults to the current
    * one). Returns the clone's first version number (always 1).
    */
  def shallowClone(
      spark: SparkSession, sourcePath: String, targetPath: String,
      version: Option[Long] = None): Long = {
    val v = version.getOrElse(currentVersion(spark, sourcePath).getOrElse(
      throw new IllegalStateException(
        s"shallowClone: no versioned table at $sourcePath")))
    require(versions(spark, sourcePath).contains(v),
      s"shallowClone: version $v not present at $sourcePath " +
        s"(have: ${versions(spark, sourcePath).mkString(", ")})")
    require(!exists(spark, targetPath),
      s"shallowClone: $targetPath already holds data (clone targets must " +
        "not exist — a manifest over a plain layout would shadow it and " +
        "vacuum would then delete it)")
    val body = manifestContent(spark, sourcePath, v).trim
    val abs =
      if (body.contains('\t'))
        body.linesIterator.filter(_.nonEmpty).map { line =>
          val Array(p, d) = line.split('\t')
          s"$p\t${new Path(sourcePath, d)}"
        }.mkString("\n")
      else
        // unpartitioned: absolutize every data dir the snapshot lists
        // (several after merge-on-read commits)
        body.linesIterator.map(_.trim).filter(_.nonEmpty)
          .map(d => new Path(sourcePath, d).toString).mkString("\n")
    // the clone reads through the source snapshot's deletion vectors too
    // (absolutized like the data dirs; DV rows already hold absolute URIs)
    // — and under its column mapping (logical names travel with the view)
    val dvAbs = dvDirs(spark, sourcePath, v).map(d => new Path(sourcePath, d).toString)
    val (cmR, cmD) = columnMapping(spark, sourcePath, v)
    require(commitVersion(spark, targetPath, 1L, abs, dv = dvAbs,
      colmap = Some(colmapValue(cmR, cmD)).filter(_.nonEmpty)),
      s"shallowClone: lost the creation race at $targetPath")
    // clones carry the source's CHECK constraints and generation rules
    // (Delta clones table properties); drop them on the clone
    // independently if unwanted
    Constraints.copy(spark, sourcePath, targetPath)
    GeneratedColumns.copy(spark, sourcePath, targetPath)
    ColumnDefaults.copy(spark, sourcePath, targetPath, v)
    TableProperties.copy(spark, sourcePath, targetPath)
    // identity rules carry WITH their watermark (Delta clones identity
    // state the same way): the clone's data contains the source's
    // assigned values, so a reset watermark would re-issue them
    IdentityColumns.copy(spark, sourcePath, targetPath)
    1L
  }

  /** Rewrite the CURRENT version of a partitioned versioned table into a
    * single fresh data dir and publish it as the next version. Two jobs at
    * 100 TB scale: (a) bounds the union fan-out of `read` (a long merge
    * history otherwise leaves the current version scattered over many data
    * dirs — one relation each), and (b) re-buckets the many small files
    * that per-batch merges of hot partitions accumulate. History is
    * untouched — run `vacuum` afterwards to reclaim it.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val v0 = currentVersion(spark, path).getOrElse(
      throw new IllegalStateException(s"compact: no versioned table at $path"))
    val partitionColumns = partitionEntries(spark, path, v0) match {
      // recover the partition columns from the entry paths: "a=1/b=2" → a,b
      case Some(entries) => entries.head._1.split('/').toSeq.map(_.split('=')(0))
      // unpartitioned: fold a merge-on-read chain (N appended dirs +
      // DVs) back to one full-image dir; a no-chain table republishes
      // its single dir — still useful to materialize DVs
      case None => Nil
    }
    publishMaintenance(spark, path, "compact", partitionColumns,
      v => readVersion(spark, path, v))
    ()
  }

  /** Publish a MAINTENANCE rewrite — a full-image derivation of the head
    * ([[compact]]'s fold, [[optimize]]'s ZORDER cluster, [[optimizeBloom]]'s
    * bloom rewrite) whose only payload IS the head it read. Unlike
    * [[atomicReplace]] (caller-supplied image — last-writer-wins is the
    * documented contract there), a maintenance image may commit as v+1
    * ONLY while v is still the head: retrying a lost CAS onto the next
    * number, the way atomicReplace recovers, would republish a snapshot
    * that no longer contains the racing writer's rows — the classic
    * lakehouse lost-update (Delta's ConflictChecker fails/recomputes a
    * raced OPTIMIZE for the same reason; it never replays the stale
    * rewrite). So: derive `image(v)`, land it in a fresh dir, CAS on
    * exactly v+1; on loss delete the orphan dir and RECOMPUTE from the
    * new head — the [[compactWhere]]/[[compactSmall]] discipline (a
    * rearrangement has no payload to rebase). Cost of losing is one
    * wasted rewrite; cost of the old behavior was the winner's rows.
    */
  private def publishMaintenance(
      spark: SparkSession, path: String, what: String,
      partitionColumns: Seq[String],
      image: Long => DataFrame,
      preserveLayout: Boolean = false,
      filesPerPartition: Int = 1,
      writeOptions: Map[String, String] = Map.empty): Long = {
    var committedV = -1L
    var attempts = 0
    while (committedV < 0) {
      attempts += 1
      require(attempts <= 10, s"$what: lost the version race at $path")
      val v = currentVersion(spark, path).getOrElse(
        throw new IllegalStateException(s"$what: no versioned table at $path"))
      val df = image(v)
      val dataDir = freshDataDirName()
      val ddPath = new Path(path, dataDir).toString
      if (preserveLayout && partitionColumns.nonEmpty)
        df.write.mode(SaveMode.Overwrite).options(writeOptions)
          .partitionBy(partitionColumns: _*).parquet(ddPath)
      else
        // maintenance images arrange their OWN layout (compact's fold,
        // ZORDER's range slabs) — the adaptive sizing must not refuse it
        writePlain(df, ddPath, partitionColumns, filesPerPartition,
          writeOptions, sizeAdaptive = false)
      DataSkipping.writeStats(spark, ddPath, df.schema)
      validateCommit(spark, path, dataDir)
      // metadata-only entry derivation (lists the dirs the write produced)
      // — partitionDirsOf would re-execute the whole rewrite plan
      val content =
        if (partitionColumns.isEmpty) dataDir
        else writtenPartitionDirs(spark, path, dataDir, partitionColumns)
          .map(p => s"$p\t$dataDir").mkString("\n")
      // full rewrite of the logical head image: DVs are materialized
      // (dv = Nil) and an active column mapping is materialized to
      // physical names (colmap = None) — the full-image commit rules
      if (commitVersion(spark, path, v + 1, content)) committedV = v + 1
      else {
        val dd = new Path(path, dataDir)
        hadoopFs(spark, dd).delete(dd, true)
      }
    }
    committedV
  }

  /** Delta-parity `GENERATE symlink_format_manifest`: export the CURRENT
    * version's live data files as plain text manifests readable by
    * Presto/Trino/Athena's SymlinkTextInputFormat — the interop tier the
    * reference leans on when Athena queries its lakehouse tables
    * (reference: README.md Athena section; Delta requires the same
    * manifest generation for Athena/Presto reads). Layout matches Delta:
    * `_symlink_format_manifest/manifest` for unpartitioned tables, one
    * `_symlink_format_manifest/<partition-dir>/manifest` per partition
    * otherwise, each listing fully-qualified file URIs one per line.
    *
    * Refused when the current version carries deletion vectors: a path
    * list cannot express row-level deletes, and exporting the raw files
    * would resurrect deleted rows (Delta refuses identically). Run
    * [[compact]]/[[compactWhere]] first to materialize the DVs.
    *
    * The export is a snapshot, not a subscription: later commits +
    * [[vacuum]] can remove files a stale manifest still lists —
    * regenerate after write batches (Delta's auto-generate table
    * property is this call in a commit hook). Stale partition manifests
    * from earlier exports are removed wholesale (the whole export dir is
    * rewritten), so dropped partitions do not linger as ghost listings.
    *
    * Returns (manifest file path, file count) per manifest written.
    * Metadata-only: one listing per referenced data dir, no data I/O.
    */
  def generateSymlinkManifest(
      spark: SparkSession, path: String): Seq[(String, Long)] = {
    val v = currentVersion(spark, path).getOrElse(
      throw new IllegalStateException(
        s"generateSymlinkManifest: no versioned table at $path"))
    // a symlink consumer reads raw files — it would see PHYSICAL column
    // names, silently diverging from this table's logical view
    requireNoColmap(spark, path, "generateSymlinkManifest")
    if (dvDirs(spark, path, v).nonEmpty) {
      throw new IllegalStateException(
        s"generateSymlinkManifest: version $v of $path carries deletion " +
          "vectors; a symlink manifest lists whole files and would " +
          "resurrect deleted rows. Run compact()/compactWhere() first.")
    }
    val root = new Path(path, "_symlink_format_manifest")
    val fs = hadoopFs(spark, root)
    fs.delete(root, true)
    def dataFiles(dir: Path): Seq[String] =
      fs.listStatus(dir).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => fs.makeQualified(s.getPath).toUri.toString).sorted
    def write(rel: String, files: Seq[String]): (String, Long) = {
      val mf = new Path(root, rel)
      val out = fs.create(mf, true)
      try out.write(files.mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
      (mf.toString, files.size.toLong)
    }
    partitionEntries(spark, path, v) match {
      case None =>
        val files = unpartitionedDirs(spark, path, v)
          .flatMap(dd => dataFiles(new Path(path, dd)))
        Seq(write("manifest", files))
      case Some(entries) =>
        entries.groupBy(_._1).toSeq.sortBy(_._1).map { case (partDir, es) =>
          val files = es.map(_._2).distinct.flatMap(dd =>
            dataFiles(new Path(new Path(path, dd), partDir)))
          write(s"$partDir/manifest", files)
        }
    }
  }

  /** Partition-scoped compaction — Delta's `OPTIMIZE … WHERE` tier:
    * rewrite ONLY the partitions matching `predicate`, consolidating
    * their append-entry dir chains and materializing their deletion
    * vectors into one fresh dir; every other partition keeps its entries
    * untouched. This is the verb [[compact]] is missing at scale: after
    * a month of MOR merges into a hot partition, compacting it costs
    * O(hot partition), not O(table) — a 3-year table never rewrites cold
    * history to fold one day's chain.
    *
    * `predicate` must reference partition columns only (checked on the
    * unresolved attribute names): partition membership is decided per
    * PARTITION, and a data-column predicate would tear rows out of
    * partitions it matches partially. Carried deletion vectors stay in
    * the commit — their (file, row-index) keys no longer match the
    * compacted partitions' fresh files (their deletes are already
    * materialized) but keep deletes on untouched partitions in force,
    * the same carry rule as the merge rewrite path. Returns the
    * committed version (or the current one when nothing matches).
    */
  /** Incremental small-dir compaction: fold ONLY the sub-`minBytes`
    * footprints into one fresh dir and republish the manifest with the
    * large ones untouched — the 100 TB shape for absorbing a stream of
    * small [[insertInto]] appends without [[compact]]'s O(table)
    * full-image rewrite (Delta OPTIMIZE's bin-packing contract: files
    * already at target size are never rewritten).
    *
    * UNPARTITIONED tables fold whole data dirs. PARTITIONED tables fold
    * per-(partition, dir) SLICES — the unit a daily-partitioned ingest
    * actually accumulates (reference: glue_etl.py:275 writes
    * date-partitioned batches): a hot partition's chain of small insert
    * slices folds into one dir entry while every settled partition —
    * and the big slices of the hot one (e.g. its original bulk load) —
    * keeps its entries untouched, zero I/O. A partition folds only when
    * it holds at least TWO sub-threshold slices.
    *
    * Refused while the version carries deletion vectors: DV'd dirs are
    * not independent row sets, so subset folding could separate a DV
    * from its leg — [[compact]]/[[compactWhere]] materialize them
    * first. No-op (returns the current version) when nothing qualifies.
    * Sizing is one metadata summary per dir (or per partition slice);
    * data I/O is O(small slices) only.
    */
  def compactSmall(
      spark: SparkSession, path: String,
      minBytes: Long = 32L * 1024 * 1024): Long = {
    var committedV = -1L
    var attempts = 0
    while (committedV < 0) {
      attempts += 1
      require(attempts <= 10, s"compactSmall: lost the version race at $path")
      val v = currentVersion(spark, path).getOrElse(throw new IllegalStateException(
        s"compactSmall: no versioned table at $path"))
      require(dvDirs(spark, path, v).isEmpty,
        s"compactSmall: version $v carries deletion vectors — run compact() " +
          "to materialize them first (subset folding could orphan a DV)")
      val fs = hadoopFs(spark, new Path(path))
      val tableSchema = versionSchema(spark, path, v)
      partitionEntries(spark, path, v) match {
        case None =>
          val dirs = unpartitionedDirs(spark, path, v)
          val (small, big) = dirs.partition(d =>
            fs.getContentSummary(new Path(path, d)).getLength < minBytes)
          if (small.size < 2) return v
          val merged = small.map { d =>
            val df = spark.read.parquet(new Path(path, d).toString)
            tableSchema.map(alignTo(df, _)).getOrElse(df)
          }.reduce(_.unionByName(_))
          val dataDir = freshDataDirName()
          writePlain(merged, new Path(path, dataDir).toString, Nil)
          DataSkipping.writeStats(spark, new Path(path, dataDir).toString,
            merged.schema)
          validateCommit(spark, path, dataDir, physicalNames = true)
          val content = (big :+ dataDir).mkString("\n")
          // physical in, physical out: the fold unions raw dirs and
          // rewrites them byte-compatible, so an active column mapping
          // simply carries
          if (commitVersion(spark, path, v + 1, content,
            colmap = carriedColmap(spark, path, v)))
            committedV = v + 1
          else {
            val dd = new Path(path, dataDir)
            hadoopFs(spark, dd).delete(dd, true)
          }
        case Some(entries) =>
          val partitionColumns = entries.head._1.split('/').toSeq.map(_.split('=')(0))
          // per-(partition, dir) slice footprint — a dir may hold a big
          // slice of one partition and a tiny slice of another
          val sized = entries.map { case (p, dd) =>
            (p, dd,
              fs.getContentSummary(new Path(new Path(path, dd), p)).getLength)
          }
          val foldable: Map[String, Set[String]] = sized.groupBy(_._1).collect {
            case (p, es) if es.count(_._3 < minBytes) >= 2 =>
              p -> es.filter(_._3 < minBytes).map(_._2).toSet
          }
          if (foldable.isEmpty) return v
          val merged = foldable.toSeq.sortBy(_._1).map { case (p, dds) =>
            dds.toSeq.sorted.map { dd =>
              val base = new Path(path, dd).toString
              val df = spark.read.option("basePath", base).parquet(s"$base/$p")
              tableSchema.map(alignTo(df, _)).getOrElse(df)
            }.reduce(_.unionByName(_))
          }.reduce(_.unionByName(_))
          val dataDir = freshDataDirName()
          writePlain(merged, new Path(path, dataDir).toString, partitionColumns)
          DataSkipping.writeStats(spark, new Path(path, dataDir).toString,
            merged.schema)
          validateCommit(spark, path, dataDir, physicalNames = true)
          val survivors = writtenPartitionDirs(
            spark, path, dataDir, partitionColumns).toSet
          require(survivors == foldable.keySet,
            s"compactSmall: folded rows landed outside their partitions at " +
              s"$path (${(survivors diff foldable.keySet).mkString(", ")})")
          val newEntries = (entries.filterNot { case (p, dd) =>
            foldable.get(p).exists(_.contains(dd))
          } ++ foldable.keys.map(_ -> dataDir)).sorted
            .map { case (p, dd) => s"$p\t$dd" }.mkString("\n")
          if (commitVersion(spark, path, v + 1, newEntries,
            colmap = carriedColmap(spark, path, v)))
            committedV = v + 1
          else {
            val dd = new Path(path, dataDir)
            hadoopFs(spark, dd).delete(dd, true)
          }
      }
    }
    committedV
  }

  def compactWhere(
      spark: SparkSession, path: String, predicate: Column,
      filesPerPartition: Int = 1): Long = {
    var committedV = -1L
    var attempts = 0
    while (committedV < 0) {
      attempts += 1
      require(attempts <= 10, s"compactWhere: lost the version race at $path")
      val v = currentVersion(spark, path).getOrElse(throw new IllegalStateException(
        s"compactWhere: no versioned table at $path"))
      val entries = partitionEntries(spark, path, v).getOrElse(
        throw new IllegalStateException(
          s"compactWhere: $path holds an UNPARTITIONED versioned table — " +
            "use compact() (one dir chain, nothing to scope)"))
      val partitionColumns = entries.head._1.split('/').toSeq.map(_.split('=')(0))
      val cur = readVersion(spark, path, v)
      val filtered = cur.filter(predicate)
      // reference check on the ANALYZED filter (Spark 4 Columns are lazy
      // ColumnNode trees — unresolvable without a plan)
      val refs = filtered.queryExecution.analyzed.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.references.map(_.name).toSeq
      }.flatten
      val nonPartition = refs.filterNot(r =>
        partitionColumns.exists(_.equalsIgnoreCase(r))).distinct
      require(nonPartition.isEmpty,
        s"compactWhere: predicate references non-partition column(s) " +
          s"${nonPartition.mkString(", ")} — partition columns are " +
          s"${partitionColumns.mkString(", ")}")
      val affected = partitionDirsOf(filtered, partitionColumns)
      if (affected.isEmpty) return v
      val affectedSet = affected.toSet
      val affectedEntries = entries.filter(e => affectedSet(e._1))
      val tableSchema = versionSchema(spark, path, v)
      val dv = dvOf(spark, path, v)
      val slice = affectedEntries.groupBy(_._2).toSeq.sortBy(_._1).map {
        case (dataDir, es) =>
          val base = new Path(path, dataDir).toString
          val df = dvFilterLeg(spark.read.option("basePath", base)
            .parquet(es.map(e => s"$base/${e._1}"): _*), dv)
            .drop(DvFileCol, DvIdxCol)
          tableSchema.map(alignTo(df, _)).getOrElse(df)
      }.reduce(_.unionByName(_))
      val dataDir = freshDataDirName()
      writePlain(slice, new Path(path, dataDir).toString, partitionColumns,
        filesPerPartition)
      DataSkipping.writeStats(spark, new Path(path, dataDir).toString, slice.schema)
      validateCommit(spark, path, dataDir, physicalNames = true)
      val newEntries = (entries.filterNot(e => affectedSet(e._1)) ++
        affected.map(_ -> dataDir)).sorted
        .map { case (p, dd) => s"$p\t$dd" }.mkString("\n")
      // partition-scoped fold of raw physical dirs: the mapping carries
      // (predicates reference partition columns, which are never renamed)
      if (commitVersion(spark, path, v + 1, newEntries,
        dv = dvDirs(spark, path, v),
        colmap = carriedColmap(spark, path, v)))
        committedV = v + 1
      else {
        // lost the CAS — drop the orphaned dir and recompute against the
        // winner's version (compaction has no payload to rebase)
        val dd = new Path(path, dataDir)
        hadoopFs(spark, dd).delete(dd, true)
      }
    }
    committedV
  }

  /** Retire history: keep the newest `keepLast` versions, delete older
    * manifests and every data dir (or partition subdir) no kept manifest
    * references, and — once a manifest exists — any parquet files still
    * sitting at the path ROOT (the pre-manifest plain layout a migrated
    * table leaves behind for its legacy readers).
    *
    * Reference-aware: a partitioned manifest may point untouched
    * partitions at data dirs written MANY versions ago, so "older than
    * keepLast" alone can't justify deletion — only unreferenced dirs go.
    */
  /** Time-based retention (Delta's `VACUUM … RETAIN n HOURS` semantics
    * mapped onto version retention): keep every version whose committed
    * `#ts=` header is at or after `now − horizonMillis` — always at
    * least the current version — then run the same reference-aware
    * sweep as [[vacuum]]. Pre-header manifests (no `#ts=`) count as old.
    */
  def vacuumOlderThan(spark: SparkSession, path: String, horizonMillis: Long): Unit =
    if (versions(spark, path).nonEmpty)
      vacuum(spark, path, keepCountForHorizon(spark, path, horizonMillis))

  def vacuum(spark: SparkSession, path: String, keepLast: Int = 2): Unit = {
    val fs = hadoopFs(spark, new Path(path))
    vacuumPlan(spark, path, keepLast).foreach { case (kind, p) =>
      fs.delete(new Path(p), kind != "manifest" && kind != "stray_file")
    }
  }

  /** What [[vacuum]] would delete, WITHOUT deleting — Delta's
    * `VACUUM … DRY RUN`: `(kind, path)` rows, kind ∈ `manifest` |
    * `data_dir` | `partition_dir` | `dv_dir` | `stray_file`. The listing
    * IS the sweep's work list ([[vacuum]] executes exactly these rows),
    * so the dry run is authoritative, not an approximation. Pure
    * metadata walk — one manifest-dir listing plus one listing per
    * top-level dir; no data I/O, no Spark job.
    */
  def vacuumPlan(
      spark: SparkSession, path: String, keepLast: Int = 2): Seq[(String, String)] = {
    require(keepLast >= 1, "vacuum must keep at least the current version")
    val vs = versions(spark, path)
    if (vs.isEmpty) return Nil
    val fs = hadoopFs(spark, new Path(path))
    val kept = vs.takeRight(keepLast)
    val out = Seq.newBuilder[(String, String)]
    // (dataDir, Some(partDir)) for partitioned refs, (dataDir, None) full
    val refs: Seq[(String, Option[String])] = kept.flatMap { v =>
      partitionEntries(spark, path, v) match {
        case Some(es) => es.map { case (p, dd) => (dd, Some(p)) }
        case None => unpartitionedDirs(spark, path, v).map((_, None))
      }
    }
    val referencedDirs = refs.map(_._1).toSet
    // deletion-vector dirs still referenced by a kept version's #dv=
    // header (resolved names only — absolute entries point into a clone's
    // SOURCE, which this table does not own and must not touch)
    val keptDvNames = kept.flatMap(v => dvDirs(spark, path, v))
      .map(d => new Path(path, d))
      .filter(_.getParent == new Path(path, DvDirName))
      .map(_.getName).toSet
    vs.dropRight(keepLast).foreach { v =>
      out += ("manifest" -> new Path(manifestDir(path), f"v$v%020d").toString)
    }
    val dvRoot = new Path(path, DvDirName)
    if (fs.exists(dvRoot)) fs.listStatus(dvRoot).foreach { st =>
      if (st.isDirectory && !keptDvNames.contains(st.getPath.getName))
        out += ("dv_dir" -> st.getPath.toString)
    }
    fs.listStatus(new Path(path)).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && (name.startsWith("_v") || name.startsWith("_d"))) {
        if (!referencedDirs.contains(name)) out += ("data_dir" -> st.getPath.toString)
        else {
          // partially-referenced partitioned dir: drop stale partition
          // subdirs no kept manifest points at (full refs keep everything)
          val keptParts = refs.collect { case (`name`, Some(p)) => p }.toSet
          val fullyRef = refs.exists { case (d, po) => d == name && po.isEmpty }
          if (!fullyRef && keptParts.nonEmpty)
            fs.listStatus(st.getPath).foreach { sub =>
              val subName = sub.getPath.getName
              if (sub.isDirectory && subName.contains("=") &&
                  !keptParts.exists(p => p == subName || p.startsWith(s"$subName/")))
                out += ("partition_dir" -> sub.getPath.toString)
            }
        }
      } else if (st.isFile && !name.startsWith("_"))
        out += ("stray_file" -> st.getPath.toString)
    }
    out.result()
  }

  /** The keepLast count [[vacuumOlderThan]]'s horizon resolves to — the
    * shared translation for the sweep and its DRY RUN.
    */
  private[graft] def keepCountForHorizon(
      spark: SparkSession, path: String, horizonMillis: Long): Int = {
    require(horizonMillis >= 0, "vacuumOlderThan: horizon must be >= 0")
    val vs = versions(spark, path)
    if (vs.isEmpty) return 1
    val cutoff = System.currentTimeMillis() - horizonMillis
    // keep from the OLDEST in-horizon version onward — not takeWhile from
    // the newest, which a single skew-stamped mid-history version would
    // stop early, sweeping newer-than-horizon versions behind it
    math.max(vs.indexWhere(v =>
      commitTimestamp(spark, path, v).getOrElse(Long.MinValue) >= cutoff) match {
      case -1 => 1                 // nothing in horizon: current version only
      case i  => vs.length - i     // oldest in-horizon version and everything after
    }, 1)
  }

  /** Table integrity report — the `fsck` verb. One row per finding,
    * `(kind, version, detail)`; ZERO rows = every live version is fully
    * servable from the bytes on disk and no unreferenced bytes linger.
    *
    * Kinds:
    *   - `dangling_entry` — a partitioned manifest maps a partition to a
    *     data dir that lacks that partition subdir: reads and merges of
    *     the partition fail with PATH_NOT_FOUND (the bug class the
    *     conditional-DELETE rewrite tier once had; fsck is its field
    *     detector and regression tripwire)
    *   - `missing_data_dir` — an unpartitioned version's data dir is gone
    *   - `missing_dv` — a `#dv=` header names a deletion-vector dir that
    *     is gone: vector-deleted rows would resurrect on read
    *   - `orphan_dir` / `orphan_dv` (version -1) — bytes NO live version
    *     references: a crashed writer or lost CAS racer left them; wasted
    *     storage, reclaimed by the next [[vacuum]]
    *
    * Pure metadata walk at Delta-log scale (one existence probe per
    * manifest entry + one listing per top-level dir); no data files are
    * read, no Spark job runs. All live (non-vacuumed) versions are
    * checked — a finding on an OLD version breaks time travel, not
    * current reads; `detail` names the version so the operator can decide
    * between repair and vacuum.
    */
  def fsck(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val root = new Path(path)
    val fs = hadoopFs(spark, root)
    val findings = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
    val referenced = scala.collection.mutable.Set[String]()
    val referencedDv = scala.collection.mutable.Set[String]()
    versions(spark, path).foreach { v =>
      partitionEntries(spark, path, v) match {
        case Some(es) => es.foreach { case (p, dd) =>
          referenced += dd
          if (!fs.exists(new Path(new Path(path, dd), p)))
            findings += (("dangling_entry", v, s"$p -> $dd"))
        }
        case None => unpartitionedDirs(spark, path, v).foreach { dd =>
          referenced += dd
          if (!fs.exists(new Path(path, dd)))
            findings += (("missing_data_dir", v, dd))
        }
      }
      dvDirs(spark, path, v).foreach { d =>
        val dp = new Path(path, d)
        if (dp.getParent == new Path(path, DvDirName)) referencedDv += dp.getName
        if (!fs.exists(dp)) findings += (("missing_dv", v, d))
      }
    }
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && (name.startsWith("_d") || name.startsWith("_v")) &&
          !referenced.contains(name))
        findings += (("orphan_dir", -1L, name))
    }
    val dvRoot = new Path(path, DvDirName)
    if (fs.exists(dvRoot)) fs.listStatus(dvRoot).foreach { st =>
      if (st.isDirectory && !referencedDv.contains(st.getPath.getName))
        findings += (("orphan_dv", -1L, s"$DvDirName/${st.getPath.getName}"))
    }
    findings.toSeq.toDF("kind", "version", "detail")
  }

  /** Right-to-be-forgotten purge (the GDPR verb): make every row matching
    * `condition` irrecoverable from the table DIRECTORY, not merely
    * absent from the current snapshot. The lakehouse's own guarantees
    * work AGAINST erasure — time travel keeps old images readable, DVs
    * mask rows without removing their bytes, and the change feed is a
    * literal record of deleted rows — so purge composes the verbs:
    *
    *   1. copy-on-write [[delete]] (never the DV tier: matching bytes
    *      must leave the data files, not hide behind a mask);
    *   2. if the current version still reads through DVs, [[compact]] —
    *      previously-DV-deleted rows' bytes (which may also match) leave
    *      the kept files;
    *   3. [[vacuum]](keepLast = 1): every pre-purge version's manifests
    *      and data dirs are deleted — time travel to any pre-purge image
    *      is gone by construction;
    *   4. the change feed, if present, must be explicitly surrendered:
    *      purge REFUSES when `_graft_changes` manifests exist unless
    *      `dropChangeFeed = true` (then the whole feed is deleted) —
    *      destroying a consumer-visible feed silently is worse than
    *      making the caller say so;
    *   5. VERIFY, don't trust: [[fsck]] must report clean and the
    *      condition must match ZERO rows at every remaining version —
    *      an erasure verb does not report success on faith.
    *
    * Returns the number of live rows erased. Scale shape: one pruned
    * count + the delete's partition-scoped rewrite + (only if DVs exist)
    * one compaction; verification is one metadata walk plus a pruned
    * count per REMAINING version (exactly one after vacuum keepLast=1,
    * plus any the purge itself committed).
    */
  def purge(
      spark: SparkSession, path: String, condition: Column,
      dropChangeFeed: Boolean = false): Long = {
    currentVersion(spark, path).getOrElse(throw new IllegalStateException(
      s"purge: no versioned table at $path"))
    // a column mapping needs no special-casing here: the condition
    // evaluates against each version's LOGICAL view (delete and the
    // readAt verification both apply the map), matching bytes leave via
    // delete's physical rewrite, and vacuum/fsck are name-agnostic
    TableProperties.requireNotAppendOnly(spark, path, "purge")
    val fs = hadoopFs(spark, new Path(path))
    // a shallow clone's CURRENT version reads the SOURCE's data dirs by
    // absolute path — deleting/vacuuming here cannot touch those bytes,
    // so a "successful" purge of such a clone would be a false erasure
    // claim. Refuse: purge the SOURCE (and re-clone), or compact the
    // clone first (compact materializes a local full image). Only the
    // CURRENT version gates — older absolute-ref manifests are deleted
    // wholesale by the vacuum(keepLast = 1) below, so nothing that
    // SURVIVES this purge can reference foreign bytes.
    currentVersion(spark, path).foreach { v =>
      val dirs = partitionEntries(spark, path, v)
        .map(_.map(_._2)).getOrElse(unpartitionedDirs(spark, path, v))
      val foreign = dirs.filter(d => new Path(d).isAbsolute)
      require(foreign.isEmpty,
        s"purge: the current version of $path references data OUTSIDE " +
          s"the table dir (shallow clone): ${foreign.head} — purging here " +
          "cannot erase the source's bytes. Purge the source table, or " +
          "compact this clone first to localize its data.")
    }
    val hasChanges = fs.exists(changesDir(path)) &&
      fs.listStatus(changesDir(path)).nonEmpty
    require(!hasChanges || dropChangeFeed,
      s"purge: $path has a change feed (_graft_changes) — it records the " +
        "very rows purge must erase. Pass dropChangeFeed = true to delete " +
        "it with the history, or drain the feed first.")
    val matched = read(spark, path).filter(condition).count()
    if (matched > 0) delete(spark, path, condition)
    if (dvDirs(spark, path, currentVersion(spark, path).get).nonEmpty)
      compact(spark, path)
    vacuum(spark, path, keepLast = 1)
    if (hasChanges) { fs.delete(changesDir(path), true); () }
    // orphan_dir/orphan_dv are bytes NO live version references — an
    // in-flight concurrent writer's uncommitted staging dirs show up as
    // exactly that kind. They cannot hold rows any reader reaches, so
    // they do not affect erasure; failing on them would report failure
    // for a purge that actually succeeded (after destructively deleting
    // history). Gate only on findings that break live-version integrity.
    val findings = fsck(spark, path)
      .filter(!col("kind").isin("orphan_dir", "orphan_dv")).collect()
    require(findings.isEmpty,
      s"purge: post-purge fsck reports ${findings.length} finding(s): " +
        findings.take(3).mkString("; "))
    versions(spark, path).foreach { v =>
      val still = readAt(spark, path, v).filter(condition).count()
      require(still == 0,
        s"purge: version $v still matches $still row(s) after purge")
    }
    matched
  }

  /** Fail fast (one linear key-count job across all snapshots) when any
    * snapshot holds a duplicated PK — see `changes` for why spurious
    * fan-out is worse than the probe's cost.
    */
  private def requireUniquePk(
      snapshots: Seq[(String, DataFrame)], pk: Seq[String], ctx: String): Unit = {
    val dup = snapshots.map { case (tag, df) =>
      df.groupBy(pk.map(col): _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1)
        .select((lit(tag).as("__snap") +: pk.map(c => col(c).cast("string"))): _*)
    }.reduce(_.unionByName(_)).limit(1).collect()
    if (dup.nonEmpty) {
      val r = dup.head
      val key = pk.zipWithIndex.map { case (c, i) => s"$c=${r.get(i + 1)}" }
        .mkString(", ")
      throw new IllegalArgumentException(
        s"$ctx: snapshot ${r.getString(0)} holds duplicate primary key ($key); " +
          "a PK-duplicated snapshot fans the full-outer join into spurious " +
          "change rows. Deduplicate (dropDuplicates) before versioning.")
    }
  }

  private def withConf[A](spark: SparkSession, key: String, value: String)(body: => A): A = {
    val before = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
