package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** File-level data skipping (parquet-footer stats sidecars) + Z-order
  * clustering: pruning must shrink the scan list and NEVER change
  * results.
  */
class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def keptFiles(path: String, pred: org.apache.spark.sql.Column): (Int, Int) = {
    val v = ParquetTable.currentVersion(spark, path).get
    val kept = ParquetTable.prunedFileGroups(spark, path, v, pred).map(_._2.size).sum
    val total = ParquetTable.prunedFileGroups(spark, path, v, lit(true)).map(_._2.size).sum
    (kept, total)
  }

  test("range-clustered files prune by predicate; results match plain filter") {
    val path = tmpDir("skip") + "/t"
    val df = (0 until 4000).map(i => (i.toLong, s"name_$i", i * 1.5)).toDF("id", "name", "v")
      .repartitionByRange(8, col("id")) // 8 files with disjoint id ranges
    ParquetTable.create(df, path)
    val pred = col("id") >= 3500L
    val (kept, total) = keptFiles(path, pred)
    assert(total === 8)
    assert(kept <= 2, s"kept $kept of $total for a 1/8-range predicate")
    val got = ParquetTable.readWhere(spark, path, pred).select("id")
      .as[Long].collect().toSet
    assert(got === (3500L until 4000L).toSet)
  }

  test("string and equality predicates prune; empty match reads nothing") {
    val path = tmpDir("skip-str") + "/t"
    val df = (0 until 2600).map(i => (i.toLong, f"k_${('a' + i / 100).toChar}%c_$i%04d"))
      .toDF("id", "key").repartitionByRange(13, col("key"))
    ParquetTable.create(df, path)
    val (kept, total) = keptFiles(path, col("key").startsWith("k_f"))
    assert(total === 13)
    assert(kept <= 2, s"kept $kept of $total for a single-letter prefix")
    assert(ParquetTable.readWhere(spark, path, col("key").startsWith("k_f")).count() === 100L)
    // equality off every file's range → zero files, empty result, no crash
    val (kept0, _) = keptFiles(path, col("id") === 999999L)
    assert(kept0 === 0)
    assert(ParquetTable.readWhere(spark, path, col("id") === 999999L).count() === 0L)
  }

  test("zorder/optimize makes BOTH dimensions prunable at once") {
    val path = tmpDir("skip-z") + "/t"
    // a 64×64 grid: lexicographic order would leave y table-wide per file
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong, x * 64L + y)
    ParquetTable.create(grid.toDF("x", "y", "payload"), path) // v1, unclustered
    val v = ParquetTable.optimize(spark, path, Seq("x", "y"), numFiles = 16, bits = 5)
    assert(v === 2L)
    val px = col("x") < 8L
    val py = col("y") < 8L
    val (keptX, total) = keptFiles(path, px)
    val (keptY, _) = keptFiles(path, py)
    assert(total === 16)
    assert(keptX <= total / 2, s"x-predicate kept $keptX of $total")
    assert(keptY <= total / 2, s"y-predicate kept $keptY of $total")
    // parity on both dimensions
    assert(ParquetTable.readWhere(spark, path, px && py).count() === 64L)
    assert(ParquetTable.readAt(spark, path, 1L).count() === 4096L) // time travel intact
  }

  test("partitioned versioned: pruning respects manifest partition refs") {
    val path = tmpDir("skip-part") + "/t"
    ParquetTable.createVersioned(
      (0 until 900).map(i => (i.toLong, s"d${i % 3}", i * 2.0)).toDF("id", "day", "v"),
      path, Seq("day")) // v1
    // v2 rewrites ONLY d0 (the shared dir still holds d1/d2 for v1)
    ParquetTable.merge(spark,
      path, Seq((0L, "d0", -1.0)).toDF("id", "day", "v"), Seq("id"), Seq("day"))
    val pred = col("v") < 0.0
    val cur = ParquetTable.currentVersion(spark, path).get
    val groups = ParquetTable.prunedFileGroups(spark, path, cur, pred)
    // only the fresh d0 rewrite can hold negative v; everything else prunes
    assert(groups.map(_._2.size).sum === 1, groups.toString)
    assert(ParquetTable.readWhere(spark, path, pred)
      .select("id", "v").as[(Long, Double)].collect().toSeq === Seq((0L, -1.0)))
    // an untouched-partition predicate still answers correctly
    assert(ParquetTable.readWhere(spark, path, col("day") === "d2").count() === 300L)
  }

  test("nulls: IS NULL prunes all-non-null files, IS NOT NULL prunes all-null") {
    val path = tmpDir("skip-null") + "/t"
    val df = (0 until 200).map { i =>
      (i.toLong, if (i < 100) Some(i * 1.0) else None)
    }.toDF("id", "v").repartitionByRange(4, col("id")) // files 3-4 all-null v
    ParquetTable.create(df, path)
    val (keptNull, total) = keptFiles(path, col("v").isNull)
    val (keptNotNull, _) = keptFiles(path, col("v").isNotNull)
    assert(total === 4)
    assert(keptNull === 2, s"IS NULL kept $keptNull")
    assert(keptNotNull === 2, s"IS NOT NULL kept $keptNotNull")
    assert(ParquetTable.readWhere(spark, path, col("v").isNull).count() === 100L)
    assert(ParquetTable.readWhere(spark, path, col("v").isNotNull).count() === 100L)
  }

  test("skipping is AUTOMATIC in any plan: SQL SELECT prunes via GraftFileIndex") {
    val path = tmpDir("skip-auto") + "/t"
    ParquetTable.create(
      (0 until 4000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
        .repartitionByRange(8, col("id")), path)
    // an ordinary SQL plan over the graft relation — no readWhere involved
    val df = graft.sql.GraftSql.sql(spark,
      s"SELECT sum(v) AS s FROM graft.`$path` WHERE id >= 3500")
    assert(df.head().getDouble(0) === (3500 until 4000).map(_.toDouble).sum)
    val scans = df.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    }.flatten
    assert(scans.nonEmpty, "no FileSourceScanExec found")
    val numFiles = scans.head.metrics("numFiles").value
    assert(numFiles <= 2, s"SQL scan read $numFiles of 8 files")
  }

  private def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute so metrics materialize
    val scans = df.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    }.flatten
    assert(scans.nonEmpty, "no FileSourceScanExec found")
    scans.map(_.metrics("numFiles").value).sum
  }

  test("partitioned SQL gets BOTH pruning tiers automatically") {
    val path = tmpDir("skip-part-auto") + "/t"
    // ids are contiguous per partition, so a non-partition-column
    // predicate can only prune via file stats, never via partition dirs
    ParquetTable.createVersioned(
      (0 until 900).map(i => (i.toLong, s"d${i / 300}", i * 2.0)).toDF("id", "day", "v"),
      path, Seq("day")) // v1: 3 partitions, 1 file each
    // tier 1: partition-filter pruning (day is a partition column)
    val byDay = graft.sql.GraftSql.sql(spark,
      s"SELECT id FROM graft.`$path` WHERE day = 'd1'")
    assert(scanFiles(byDay) === 1L, "partition filter did not prune")
    // tier 2: sidecar stats pruning (id is a DATA column)
    val byId = graft.sql.GraftSql.sql(spark,
      s"SELECT day FROM graft.`$path` WHERE id < 100")
    assert(scanFiles(byId) === 1L, "stats filter did not prune")
    // and results stay correct across a merge that adds a second data dir
    ParquetTable.merge(spark, path,
      Seq((0L, "d0", -1.0)).toDF("id", "day", "v"), Seq("id"), Seq("day")) // v2
    val after = graft.sql.GraftSql.sql(spark,
      s"SELECT id, v FROM graft.`$path` WHERE id < 2 ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(after === Seq((0L, -1.0), (1L, 2.0)))
    assert(ParquetTable.readAt(spark, path, 1L).count() === 900L)
  }

  test("OPTIMIZE ZORDER on a PARTITIONED table clusters within partitions") {
    val path = tmpDir("skip-zp") + "/t"
    // 2 days × 2000 rows; ingestion order scatters `v` across files
    val rows = for (d <- Seq("d1", "d2"); i <- 0 until 2000)
      yield (i.toLong, d, ((i * 769) % 2000).toLong)
    ParquetTable.createVersioned(
      rows.toDF("id", "day", "v").repartition(8), path, Seq("day"),
      filesPerPartition = 4) // v1: 4 files per day, v spread everywhere
    val before = keptFiles(path, col("v") < 100L)
    assert(before._1 === before._2, "unclustered files should all overlap v<100")
    val v2 = ParquetTable.optimize(spark, path, Seq("v"), numFiles = 8, bits = 5)
    assert(v2 === 2L)
    // within each day dir, files now cover narrow v ranges → most skip
    val (kept, total) = keptFiles(path, col("v") < 100L)
    assert(total >= 4, s"expected several files after optimize, got $total")
    assert(kept <= total / 2, s"kept $kept of $total after partitioned zorder")
    // results exact, both through readWhere and a partition-col filter
    assert(ParquetTable.readWhere(spark, path, col("v") < 100L).count() === 200L)
    assert(ParquetTable.read(spark, path).filter(col("day") === "d1").count() === 2000L)
    // time travel still shows the pre-optimize version
    assert(ParquetTable.readAt(spark, path, 1L).count() === 4000L)
    // partition columns are rejected as cluster keys
    val e = intercept[IllegalArgumentException] {
      ParquetTable.optimize(spark, path, Seq("day", "v"))
    }
    assert(e.getMessage.contains("partition columns"))
  }

  test("COUNT(*) folds to sidecar metadata: zero files scanned") {
    val ext = org.apache.spark.sql.GraftColumnBridge.sessionWithExtensions(
      spark, new graft.functions.GraftSessionExtensions()(_))
    import ext.implicits._
    val path = tmpDir("skip-count") + "/t"
    ParquetTable.create(
      (0 until 1234).map(i =>
        (i.toLong, if (i % 3 == 0) Some(i * 1.0) else None)).toDF("id", "v")
        .repartitionByRange(4, org.apache.spark.sql.functions.col("id")), path)
    // folded = the optimized plan is a LocalRelation, no file relation left
    def folded(df: org.apache.spark.sql.DataFrame): Boolean = {
      val p = df.queryExecution.optimizedPlan
      p.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.isDefined && p.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      }.isEmpty
    }
    val cnt = ext.sql(s"SELECT count(*) AS n FROM graft.`$path`")
    assert(cnt.head().getLong(0) === 1234L)
    assert(folded(cnt), "metadata count still plans a scan")
    // partitioned tables fold too
    val ppath = tmpDir("skip-count-p") + "/t"
    ParquetTable.createVersioned(
      (0 until 600).map(i => (i.toLong, s"d${i % 3}")).toDF("id", "day"),
      ppath, Seq("day"))
    val pcnt = ext.sql(s"SELECT count(*) AS n FROM graft.`$ppath`")
    assert(pcnt.head().getLong(0) === 600L)
    assert(folded(pcnt))
    // data column counts fold on partitioned tables; partition columns
    // are not in file stats, so count(partition_col) scans
    val pdata = ext.sql(s"SELECT count(id) AS n FROM graft.`$ppath`")
    assert(pdata.head().getLong(0) === 600L)
    assert(folded(pdata), "count(data col) should fold on partitioned tables")
    val ppart = ext.sql(s"SELECT count(day) AS n FROM graft.`$ppath`")
    assert(ppart.head().getLong(0) === 600L)
    assert(!folded(ppart), "count(partition col) must scan")
    // a WHERE clause must NOT fold: it scans (pruned) and stays correct
    val filtered = ext.sql(s"SELECT count(*) AS n FROM graft.`$path` WHERE id < 100")
    assert(filtered.head().getLong(0) === 100L)
    assert(!folded(filtered), "filtered count must keep its scan")
    // count(col) folds too: rows minus the sidecar null counts
    val byCol = ext.sql(s"SELECT count(v) AS n FROM graft.`$path`")
    assert(byCol.head().getLong(0) === 412L) // only the non-null thirds
    assert(folded(byCol), "count(col) did not fold from null counts")
    // MIN/MAX of integral columns fold beside COUNT in one statement
    val mm = ext.sql(
      s"SELECT min(id) AS mn, max(id) AS mx, count(*) AS n FROM graft.`$path`")
    assert(mm.head() === org.apache.spark.sql.Row(0L, 1233L, 1234L))
    assert(folded(mm), "min/max/count did not fold from metadata")
    // string min/max folds too; float min/max must NOT (NaN hazard)
    val spath = tmpDir("skip-count-s") + "/t"
    ParquetTable.create(
      Seq(("cherry", 1.5), ("apple", 2.5), ("berry", 0.5)).toDF("s", "f"), spath)
    val sm = ext.sql(s"SELECT min(s) AS mn, max(s) AS mx FROM graft.`$spath`")
    assert(sm.head() === org.apache.spark.sql.Row("apple", "cherry"))
    assert(folded(sm))
    val fm = ext.sql(s"SELECT min(f) AS mn FROM graft.`$spath`")
    assert(fm.head().getDouble(0) === 0.5)
    assert(!folded(fm), "float min must scan, not fold")
    // ...but count(float_col) folds: counting is NaN-safe
    val fc = ext.sql(s"SELECT count(f) AS n FROM graft.`$spath`")
    assert(fc.head().getLong(0) === 3L)
    assert(folded(fc), "count(float col) should fold from null counts")
    // an all-null column folds to NULL
    val npath = tmpDir("skip-count-n") + "/t"
    ParquetTable.create(
      Seq((1L, None: Option[Long]), (2L, None)).toDF("id", "empty"), npath)
    val nm = ext.sql(s"SELECT max(empty) AS mx FROM graft.`$npath`")
    assert(nm.head().isNullAt(0))
    assert(folded(nm))
    val nc = ext.sql(s"SELECT count(empty) AS n FROM graft.`$npath`")
    assert(nc.head().getLong(0) === 0L)
    assert(folded(nc), "count of an all-null column should fold to 0")
  }

  test("property: pruning NEVER changes results over random data + predicates") {
    // the interval algebra (AND/OR, 6 comparators, IN, IS [NOT] NULL,
    // prefix, casts, all-null files) must be conservative for ANY
    // predicate — readWhere ≡ read().filter() is the invariant
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      a <- Gen.chooseNum(-50, 50)
      b <- Gen.option(Gen.chooseNum(0L, 1000L))
      s <- Gen.option(Gen.oneOf("apple", "berry", "cherry", "date", "elder"))
      d <- Gen.option(Gen.chooseNum(0.0, 10.0))
    } yield (a, b.map(Long.box).orNull, s.orNull, d.map(Double.box).orNull)
    val preds: Seq[org.apache.spark.sql.Column] = Seq(
      col("a") > 10, col("a") <= -20, col("b") === 500L, col("b") >= 900L,
      col("s") === "berry", col("s") < "cherry", col("s").startsWith("d"),
      col("b").isNull, col("s").isNotNull, col("d") < 2.5,
      col("a").isin(1, 2, 3), lit(5) > col("a"),
      (col("a") > 0 && col("b") < 100L) || col("s") === "elder",
      col("a") > 10 && col("s").startsWith("a") && col("d").isNotNull,
      !(col("a") > 0), col("a") + col("d") > 5.0)
    (1 to 3).foreach { seed =>
      val rows = Gen.listOfN(400, rowGen)
        .apply(Gen.Parameters.default, Seed(seed.toLong * 104729))
        .getOrElse(sys.error("gen failed"))
      val path = tmpDir(s"skip-prop$seed") + "/t"
      ParquetTable.create(
        rows.toDF("a", "b", "s", "d").repartitionByRange(6, col("a")), path)
      preds.foreach { p =>
        val expect = ParquetTable.read(spark, path).filter(p).collect()
          .map(_.toSeq).toSet
        val got = ParquetTable.readWhere(spark, path, p).collect()
          .map(_.toSeq).toSet
        assert(got === expect, s"seed $seed predicate $p")
      }
    }
  }

  test("unknown shapes and columns keep every file (conservative, correct)") {
    val path = tmpDir("skip-cons") + "/t"
    ParquetTable.create(
      (0 until 100).map(i => (i.toLong, s"s$i")).toDF("id", "s")
        .repartitionByRange(4, col("id")), path)
    // length(s) is not interval-decidable → no pruning, full parity
    val pred = length(col("s")) > 2 && col("id") < 10L
    val (kept, total) = keptFiles(path, pred)
    assert(total === 4)
    assert(kept === 1, s"the id conjunct must still prune: kept $kept") // AND prunes via id
    assert(ParquetTable.readWhere(spark, path, pred).count() ===
      ParquetTable.read(spark, path).filter(pred).count())
  }
}
