package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DLT-shape `APPLY CHANGES INTO` — CDC application with out-of-order
  * tolerance (Databricks Delta Live Tables' apply_changes semantics):
  * each batch of change rows is reduced to the LATEST change per key by
  * a sequence column, then merged so that a change only lands if its
  * sequence EXCEEDS the sequence already stored for that key. Late
  * arrivals and redeliveries are skipped per-row, which gives the verb
  * its two operational guarantees: batches may arrive in any order
  * (states converge to the global latest), and re-applying a batch is a
  * no-op (equal sequence keeps the stored row — idempotence without a
  * txn marker).
  *
  * `deleteWhen` marks tombstones. A winning tombstone is STORED, not
  * physically removed — `__tombstone = true` rows keep the per-key
  * sequence watermark committed, so a change arriving LATE for a
  * deleted key is recognized as stale instead of resurrecting it (the
  * reason DLT's backing table retains tombstones behind its view).
  * [[readApplied]] is the consumer view: tombstones filtered, marker
  * dropped. Tombstoned bytes still exist until [[ParquetTable.purge]] —
  * CDC delete is ordering state, purge is erasure.
  *
  * Scale shape: one window over the batch (keyed shuffle of the BATCH,
  * not the table), then [[ParquetTable.merge]]'s partition-scoped
  * rewrite with a single full-outer join per affected slice — the
  * combine hook composes with the manifest/CAS commit machinery, so
  * concurrency, time travel and fsck all hold for CDC-applied tables.
  *
  * Partitioned targets require `partitionColumns ⊆ keys`: the merge
  * rewrites only the partitions the batch names, so a change that MOVED
  * a key between partitions would strand the key's old row in an
  * untouched partition (the same hazard ParquetTable.update refuses for
  * partition-column SETs) — refused up front with guidance.
  */
object ApplyChanges {

  /** Stored beside the data columns; true = the key's latest change was
    * a delete.
    */
  val TombstoneCol = "__tombstone"

  /** `evolveSchema = true` (DLT's automatic schema evolution for
    * apply_changes): columns NEW in the change feed are appended to the
    * target (existing rows read typed NULLs there), and change rows
    * missing target columns carry typed NULLs — a change row is the
    * key's full new image, so an omitted column reads as "no value" in
    * the applied row, exactly the DLT contract. The out-of-order and
    * idempotence guarantees extend to the evolved schema unchanged: the
    * per-key watermark is still the sequence column, and the combine
    * keeps being a pure function of (stored row, winning change row).
    */
  def applyInto(
      spark: SparkSession,
      path: String,
      changes: DataFrame,
      keys: Seq[String],
      sequenceCol: String,
      deleteWhen: Option[Column] = None,
      partitionColumns: Seq[String] = Nil,
      evolveSchema: Boolean = false): Unit = {
    require(keys.nonEmpty, "applyInto: empty key list")
    require(!keys.contains(sequenceCol),
      s"applyInto: sequence column '$sequenceCol' cannot be a key")
    require(!changes.columns.contains(TombstoneCol),
      s"applyInto: change frame already carries '$TombstoneCol'")
    require(partitionColumns.forall(keys.contains), "applyInto: partitioned " +
      s"targets need partition columns within the keys (got partitions " +
      s"${partitionColumns.mkString(",")} vs keys ${keys.mkString(",")}): " +
      "the merge is partition-scoped, so a key moving between partitions " +
      "would strand its old row; repartition the table or widen the keys")

    // duplicate (keys, sequence) has no defined application order — the
    // "latest" row would be a partitioning accident. Fail fast, naming
    // an offender.
    val dup = changes.groupBy((keys :+ sequenceCol).map(col): _*)
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).head(1)
    if (dup.nonEmpty) {
      throw new IllegalArgumentException(
        "applyInto: duplicate (key, sequence) in the change batch — " +
          s"first offender: ${dup(0).toSeq.init.mkString("(", ",", ")")}; " +
          "application order would be undefined. Deduplicate upstream or " +
          "refine the sequence column.")
    }

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(sequenceCol).desc)
    // a deleteWhen that evaluates to NULL (e.g. col("op") === "D" with a
    // null op) is NOT a delete — coalesce to false, else readApplied's
    // `!__tombstone` filter would silently hide the row as if tombstoned
    val latest = changes
      .withColumn(TombstoneCol,
        coalesce(deleteWhen.getOrElse(lit(false)), lit(false)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    if (!ParquetTable.exists(spark, path)) {
      ParquetTable.merge(spark, path, latest, keys, partitionColumns)
      return
    }

    val targetSchema = ParquetTable.read(spark, path).schema
    val tableCols = targetSchema.fieldNames.toSeq
    require(tableCols.contains(sequenceCol),
      s"applyInto: target $path lacks the sequence column '$sequenceCol' " +
        "— APPLY CHANGES targets store it as the per-key watermark")
    require(tableCols.contains(TombstoneCol),
      s"applyInto: target $path lacks '$TombstoneCol' — not an APPLY " +
        "CHANGES target (create it through applyInto)")
    // columns NEW in the feed / MISSING from the feed (vs the target)
    val extras = latest.columns.toSeq.filterNot(c =>
      tableCols.exists(_.equalsIgnoreCase(c)))
    val missing = tableCols.filterNot(c =>
      latest.columns.exists(_.equalsIgnoreCase(c)))
    require(evolveSchema || (extras.isEmpty && missing.isEmpty),
      s"applyInto: change columns ${latest.columns.sorted.mkString(",")} " +
        s"must match target columns ${tableCols.sorted.mkString(",")} " +
        "(pass evolveSchema = true for DLT-style automatic evolution)")
    // a change row is the key's FULL new image: omitted columns are
    // typed NULLs in the applied row (DLT semantics)
    val src0 = missing.foldLeft(latest)((d, c) =>
      d.withColumn(c, lit(null).cast(targetSchema(c).dataType)))
    val outCols = tableCols ++ extras

    val combine: (DataFrame, DataFrame) => DataFrame = (target0, src) => {
      // evolution: the stored slice gains the feed's new columns as
      // typed NULLs; the committed dir is wider and the version schema
      // evolves through the sidecar superset (merge's read-time rule)
      val target = extras.foldLeft(target0)((d, c) =>
        d.withColumn(c, lit(null).cast(src.schema(c).dataType)))
      val joined = target.as("t").join(src.as("s"), keys, "full_outer")
      val sSeq = col(s"s.$sequenceCol")
      val tSeq = col(s"t.$sequenceCol")
      // strict '>' is the contract: equal sequence keeps the stored row
      // (idempotent redelivery), older is a late arrival
      val srcWins = sSeq.isNotNull && (tSeq.isNull || sSeq > tSeq)
      joined.select(outCols.map { c =>
        if (keys.contains(c)) col(c)
        else when(srcWins, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
      }: _*)
    }
    ParquetTable.merge(spark, path, src0, keys, partitionColumns,
      combine = Some(combine))
  }

  /** The consumer view of an APPLY CHANGES target: live rows only,
    * marker dropped. Tombstones stay in the backing table as the
    * ordering watermark (see class doc).
    */
  def readApplied(spark: SparkSession, path: String): DataFrame =
    ParquetTable.read(spark, path)
      .filter(!col(TombstoneCol)).drop(TombstoneCol)

  // ---- SCD type-2 storage (DLT `stored_as_scd_type = 2`) ------------------

  /** Interval start: the change's sequence value (DLT's column name). */
  val StartCol = "__START_AT"

  /** Interval end: the NEXT change's sequence for the key, null while
    * open (DLT's column name).
    */
  val EndCol = "__END_AT"

  /** `APPLY CHANGES ... STORED AS SCD TYPE 2`: instead of keeping only
    * each key's latest row, the target stores the key's full version
    * HISTORY as validity intervals — one row per distinct (key,
    * sequence) observation, valid from its own sequence ([[StartCol]])
    * until the key's next change ([[EndCol]], null for the open
    * interval). A `deleteWhen` change row is stored as a tombstone
    * observation: it CLOSES the preceding interval (its sequence becomes
    * that row's [[EndCol]]) and is itself hidden from [[readScd2]], so a
    * deleted key has no open interval — and a later re-insert simply
    * opens a new one.
    *
    * Out-of-order and redelivery guarantees are STRONGER than type 1's:
    * the stored state is the SET of observations (target wins on a
    * redelivered (key, sequence) — deterministic idempotence), and the
    * interval columns are a pure window function of that set — so any
    * arrival order of any batch partition of the change stream converges
    * to the identical history (spec-pinned, and q111 applies the stream
    * out of order). A late arrival SPLITS the interval it lands inside:
    * the combine refolds the affected keys' rows, which all live in the
    * touched partition slice because `partitionColumns ⊆ keys`.
    *
    * Scale shape: the batch dedup probe + ONE window over the affected
    * slice ∪ batch (keyed shuffle of slice-sized data, not the table),
    * riding [[ParquetTable.merge]]'s partition-scoped rewrite and commit
    * machinery like [[applyInto]].
    */
  def applyIntoScd2(
      spark: SparkSession,
      path: String,
      changes: DataFrame,
      keys: Seq[String],
      sequenceCol: String,
      deleteWhen: Option[Column] = None,
      partitionColumns: Seq[String] = Nil,
      evolveSchema: Boolean = false): Unit = {
    require(keys.nonEmpty, "applyIntoScd2: empty key list")
    require(!keys.contains(sequenceCol),
      s"applyIntoScd2: sequence column '$sequenceCol' cannot be a key")
    Seq(TombstoneCol, StartCol, EndCol).foreach { c =>
      require(!changes.columns.contains(c),
        s"applyIntoScd2: change frame already carries reserved column '$c'")
    }
    require(partitionColumns.forall(keys.contains), "applyIntoScd2: " +
      s"partitioned targets need partition columns within the keys (got " +
      s"${partitionColumns.mkString(",")} vs keys ${keys.mkString(",")}): " +
      "the refold is partition-scoped, so a key straddling partitions " +
      "would fold incomplete histories")

    val dup = changes.groupBy((keys :+ sequenceCol).map(col): _*)
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).head(1)
    if (dup.nonEmpty) {
      throw new IllegalArgumentException(
        "applyIntoScd2: duplicate (key, sequence) in the change batch — " +
          s"first offender: ${dup(0).toSeq.init.mkString("(", ",", ")")}; " +
          "two observations cannot share one interval start. Deduplicate " +
          "upstream or refine the sequence column.")
    }

    // null deleteWhen defaults to upsert semantics, same as applyInto
    val observed = changes
      .withColumn(TombstoneCol,
        coalesce(deleteWhen.getOrElse(lit(false)), lit(false)))
      .withColumnRenamed(sequenceCol, StartCol)
    val mergeKeys = keys :+ StartCol

    if (!ParquetTable.exists(spark, path)) {
      ParquetTable.merge(spark, path, scd2Image(observed, keys),
        mergeKeys, partitionColumns)
      return
    }

    val targetSchema = ParquetTable.read(spark, path).schema
    val tableCols = targetSchema.fieldNames.toSeq
    Seq(StartCol, EndCol, TombstoneCol).foreach { c =>
      require(tableCols.contains(c),
        s"applyIntoScd2: target $path lacks '$c' — not an SCD2 APPLY " +
          "CHANGES target (create it through applyIntoScd2)")
    }
    val obsCols = tableCols.filterNot(_ == EndCol)
    // schema evolution, same contract as [[applyInto]]: feed-new columns
    // evolve the target (older observations read typed NULLs), feed rows
    // missing target columns observe typed NULLs there
    val extras = observed.columns.toSeq.filterNot(c =>
      obsCols.exists(_.equalsIgnoreCase(c)))
    val missing = obsCols.filterNot(c =>
      observed.columns.exists(_.equalsIgnoreCase(c)))
    require(evolveSchema || (extras.isEmpty && missing.isEmpty),
      s"applyIntoScd2: change columns ${observed.columns.sorted.mkString(",")} " +
        s"must match target columns ${obsCols.sorted.mkString(",")} " +
        "(pass evolveSchema = true for DLT-style automatic evolution)")
    val obs0 = missing.foldLeft(observed)((d, c) =>
      d.withColumn(c, lit(null).cast(targetSchema(c).dataType)))
    val outCols = tableCols ++ extras

    val combine: (DataFrame, DataFrame) => DataFrame = (target0, src) => {
      val target = extras.foldLeft(target0)((d, c) =>
        d.withColumn(c, lit(null).cast(src.schema(c).dataType)))
      // target wins on a redelivered (key, sequence): deterministic
      // idempotence — the stored observation set never flaps
      val srcObsCols = obsCols ++ extras
      val srcNew = src.select(srcObsCols.map(col): _*)
        .join(target.select(mergeKeys.map(col): _*), mergeKeys, "left_anti")
      scd2Image(
        target.select(srcObsCols.map(col): _*).unionByName(srcNew), keys)
        .select(outCols.map(col): _*)
    }
    ParquetTable.merge(spark, path, scd2Image(obs0, keys),
      mergeKeys, partitionColumns, combine = Some(combine))
  }

  /** The pure interval fold: [[EndCol]] = the key's next observation
    * sequence. A function of the observation SET only — the heart of the
    * order-independence guarantee.
    */
  private def scd2Image(obs: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(StartCol))
    obs.withColumn(EndCol, lead(col(StartCol), 1).over(w))
  }

  /** The consumer view of an SCD2 target: the interval history, tombstone
    * observations hidden (their closing effect on [[EndCol]] remains),
    * plus `is_current` for the open intervals.
    */
  def readScd2(spark: SparkSession, path: String): DataFrame =
    ParquetTable.read(spark, path)
      .filter(!col(TombstoneCol)).drop(TombstoneCol)
      .withColumn("is_current", col(EndCol).isNull)
}
