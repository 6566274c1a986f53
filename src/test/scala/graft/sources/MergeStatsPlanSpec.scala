package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.StatsSketch

/** Stats-informed merge planning (the CBO loop closed — VERDICT r12 §next
  * item 1): with an ANALYZEd table, the update set's sketched key NDV
  * decides broadcast vs sort-merge for the merge's key joins BEFORE any
  * exchange is planned, and the persisted table sketch demotes bulk
  * updates from merge-on-read to the rewrite tier. Both decision
  * directions are pinned, plus the case Catalyst's static estimate gets
  * wrong (a CDC-shaped updates frame: many rows, few keys).
  */
class MergeStatsPlanSpec extends SparkSpec {

  import spark.implicits._

  /** CDC shape: `rows` events over `keys` distinct pks — statically big,
    * cardinality-wise tiny. Written to parquet so Catalyst's sizeInBytes
    * is the real (large) file size, not a local-relation guess.
    */
  private def cdcFrame(rows: Int, keys: Int, dir: String): DataFrame = {
    // payload is a function of the KEY so the merge's per-key dedup pick
    // is value-identical whichever physical row survives
    (0 until rows).map(i => ((i % keys).toLong, s"payload_${i % keys}"))
      .toDF("id", "v").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def analyzedTable(n: Int, name: String): String = {
    val path = tmpDir(name) + "/t"
    ParquetTable.atomicReplace(spark,
      path, (0 until n).map(i => (i.toLong, s"v$i")).toDF("id", "v"), Nil)
    StatsSketch.analyze(spark, path, Seq("id"), ParquetTable.statsDir(path))
    path
  }

  private def planOf(df: DataFrame): String = df.queryExecution.sparkPlan.toString

  test("planner: both directions flip on the sketched key NDV vs the threshold") {
    val path = analyzedTable(5000, "msp_dirs")
    val updSmall = cdcFrame(20000, 50, tmpDir("msp_small") + "/u")   // ~1.6 KB of keys
    val updWide = cdcFrame(20000, 20000, tmpDir("msp_wide") + "/u")  // ~480 KB of keys
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64KB")
      assert(ParquetTable.planMergeStats(spark, path, updSmall, Seq("id"))
        .broadcastKeys === Some(true))
      assert(ParquetTable.planMergeStats(spark, path, updWide, Seq("id"))
        .broadcastKeys === Some(false))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("planner beats the static estimate on a CDC-shaped updates frame") {
    val path = analyzedTable(5000, "msp_cdc")
    val target = ParquetTable.read(spark, path)
    // 100k events over 50 distinct keys: the pruned key-column scan's
    // static estimate (~17 KB — measured; parquet dictionary encoding
    // already shrinks it 10×) sits far above a 4 KB threshold, so
    // Catalyst alone plans sort-merge — while the actual deduplicated
    // key set is ~1.2 KB (broadcast is right)
    val upd = cdcFrame(100000, 50, tmpDir("msp_cdc_u") + "/u")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4KB")
      val unhinted = ParquetTable.mergeFrames(target, upd, Seq("id"))
      assert(planOf(unhinted).contains("SortMergeJoin"),
        s"static estimate should refuse broadcast here:\n${planOf(unhinted)}")
      val plan = ParquetTable.planMergeStats(spark, path, upd, Seq("id"))
      assert(plan.broadcastKeys === Some(true))
      val hinted = ParquetTable.mergeFrames(target, upd, Seq("id"),
        broadcastKeys = plan.broadcastKeys)
      assert(planOf(hinted).contains("BroadcastHashJoin"),
        s"stats hint should broadcast the key set:\n${planOf(hinted)}")
      // and the hint changes the plan, not the answer
      assert(hinted.orderBy("id").collect().toSeq ===
        unhinted.orderBy("id").collect().toSeq)
      // the reverse protection: Some(false) pins sort-merge
      val forced = ParquetTable.mergeFrames(target, upd, Seq("id"),
        broadcastKeys = Some(false))
      assert(planOf(forced).contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("no ANALYZE, disabled conf, or disabled auto-broadcast → no opt-in") {
    val path = tmpDir("msp_plain") + "/t"
    ParquetTable.atomicReplace(spark,
      path, Seq((1L, "a")).toDF("id", "v"), Nil)
    val upd = Seq((1L, "b")).toDF("id", "v")
    assert(ParquetTable.planMergeStats(spark, path, upd, Seq("id")) ===
      ParquetTable.NoStatsPlan)
    val analyzed = analyzedTable(100, "msp_off")
    try {
      spark.conf.set(ParquetTable.StatsHintsConf, "false")
      assert(ParquetTable.planMergeStats(spark, analyzed, upd, Seq("id")) ===
        ParquetTable.NoStatsPlan)
    } finally spark.conf.unset(ParquetTable.StatsHintsConf)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(ParquetTable.planMergeStats(spark, analyzed, upd, Seq("id")) ===
        ParquetTable.NoStatsPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("bulk-update demotion: matched fraction from the table sketch") {
    val path = analyzedTable(10000, "msp_bulk")
    // 60% of the table's keys → bulk; 1% → not bulk
    val bulk = (0 until 6000).map(i => (i.toLong, "new")).toDF("id", "v")
    val small = (0 until 100).map(i => (i.toLong, "new")).toDF("id", "v")
    assert(ParquetTable.planMergeStats(spark, path, bulk, Seq("id")).bulkUpdate)
    assert(!ParquetTable.planMergeStats(spark, path, small, Seq("id")).bulkUpdate)
    // exactly ON the boundary: the estimate must clear 0.5 by its own
    // 2σ before the irreversible rewrite is chosen — a 50%-of-keys
    // batch stays on the reversible MOR tier DETERMINISTICALLY instead
    // of flipping per run/scale on ±1.6% estimator noise
    val half = (0 until 5000).map(i => (i.toLong, "new")).toDF("id", "v")
    assert(!ParquetTable.planMergeStats(spark, path, half, Seq("id")).bulkUpdate)
  }

  test("bulk-update demotion works for COMPOSITE pks via the sidecar row count") {
    // lineitem-shaped table: two-column pk. r13 never demoted these
    // (per-column sketches cannot bound a composite key); the table-side
    // denominator is now the snapshot's exact sidecar row count — pk is
    // unique by merge contract, so table pk NDV = rows (VERDICT r13 §3).
    val path = tmpDir("msp_comp") + "/t"
    ParquetTable.atomicReplace(spark, path,
      (0 until 10000).map(i => (i.toLong / 4, i.toLong % 4, s"v$i"))
        .toDF("k1", "k2", "v"), Nil)
    StatsSketch.analyze(spark, path, Seq("k1", "k2"), ParquetTable.statsDir(path))
    val pk = Seq("k1", "k2")
    val bulk = (0 until 6000).map(i => (i.toLong / 4, i.toLong % 4, "new"))
      .toDF("k1", "k2", "v")
    val small = (0 until 100).map(i => (i.toLong / 4, i.toLong % 4, "new"))
      .toDF("k1", "k2", "v")
    assert(ParquetTable.planMergeStats(spark, path, bulk, pk).bulkUpdate)
    assert(!ParquetTable.planMergeStats(spark, path, small, pk).bulkUpdate)
  }

  test("merged image on an ANALYZEd table is byte-identical to the plain path") {
    val path = analyzedTable(2000, "msp_same")
    val upd = cdcFrame(5000, 40, tmpDir("msp_same_u") + "/u")
    ParquetTable.merge(spark, path, upd, Seq("id"))
    val got = ParquetTable.read(spark, path).orderBy("id").collect().toSeq
    // reference image: plain mergeFrames semantics
    val exp = ParquetTable.mergeFrames(
        (0 until 2000).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
        upd, Seq("id"))
      .orderBy("id").collect().toSeq
    assert(got === exp)
  }
}
