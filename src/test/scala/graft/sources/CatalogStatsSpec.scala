package graft.sources

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{StatsHistogram, StatsSketch}

/** The crawler tier (VERDICT r14 item 1): `Catalog.registerExternal`
  * publishes the location's graft statistics into the session catalog
  * entry — the role the reference's Glue crawler plays for its Athena
  * layer (delta-lake.json:106-146) — so the verbatim-SQL surface over
  * `clean_*` tables plans under CBO with the same exact rows / NDV /
  * histograms path reads get from PlanStats. Both flip directions are
  * pinned on CATALOG tables, plus the partitioned-table "plannable at
  * all" win, the no-op regimes, and re-crawl refresh.
  */
class CatalogStatsSpec extends SparkSpec {

  import spark.implicits._

  /** Incompressible 32-hex payload so parquet cannot dictionary-encode
    * the dim table away (direction A needs file bytes ABOVE threshold).
    */
  private def hex(i: Int): String = {
    val d = MessageDigest.getInstance("MD5")
    d.digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Write `df` as a plain parquet location (what the pipeline's curated
    * layer looks like), sketch `cols` into its stats dir, and return the
    * location.
    */
  private def curated(df: DataFrame, name: String, cols: Seq[String]): String = {
    val loc = tmpDir(name) + "/data"
    df.write.mode("overwrite").parquet(loc)
    if (cols.nonEmpty)
      StatsSketch.save(spark.read.parquet(loc), cols, ParquetTable.statsDir(loc))
    loc
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def planOf(df: DataFrame): String = df.queryExecution.sparkPlan.toString

  private def tableStats(name: String) =
    spark.table(name).queryExecution.optimizedPlan.stats

  test("registration publishes exact rows, NDV, nulls, min/max and bins") {
    val n = 6000
    val df = (0 until n).map(i =>
      (i.toLong, i % 40, if (i % 10 == 0) null else s"v$i")).toDF("id", "k", "v")
    val loc = curated(df, "cs_vis", Seq("id", "k", "v"))
    StatsHistogram.build(spark.read.parquet(loc), Seq("k"),
      ParquetTable.statsDir(loc))
    Catalog.registerExternal(spark, "cs_vis_t", loc, partitioned = false)
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val stats = tableStats("cs_vis_t")
      assert(stats.rowCount === Some(BigInt(n)))
      val byName = stats.attributeStats.toSeq.map { case (a, s) => a.name -> s }.toMap
      assert(byName("k").distinctCount.exists(d => d >= 38 && d <= 42))
      assert(byName("k").nullCount === Some(BigInt(0)))
      assert(byName("v").nullCount === Some(BigInt(n / 10)))
      // footer min/max through the pinned renderings
      assert(byName("id").min.contains(0L) && byName("id").max.contains((n - 1).toLong))
      assert(byName("v").min.isEmpty, "string rendering is not pinned")
      // the histogram tier rides along into the catalog entry
      assert(byName("k").histogram.isDefined, "bins must publish too")
    }
  }

  test("direction A on the SQL layer: NDV unlocks the rollup broadcast") {
    val dimLoc = curated((0 until 40000).map(i =>
      (i.toLong % 50, hex(i))).toDF("k", "payload"), "cs_dirA_dim", Seq("k"))
    val factLoc = curated((0 until 200000).map(i =>
      (i.toLong % 50, i.toLong)).toDF("k", "amount"), "cs_dirA_fact", Nil)
    Catalog.registerExternal(spark, "cs_a_fact", factLoc, partitioned = false)
    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "256KB") {
      def q(): DataFrame = spark.sql(
        """SELECT f.k, f.amount, d.dim_n
          |FROM cs_a_fact f JOIN
          |  (SELECT k, count(*) AS dim_n FROM cs_a_dim GROUP BY k) d
          |ON f.k = d.k""".stripMargin)
      // registered WITHOUT stats first: the static estimate refuses
      Catalog.registerExternal(spark, "cs_a_dim", dimLoc,
        partitioned = false, publishStats = false)
      val before = q()
      assert(planOf(before).contains("SortMergeJoin"),
        s"static estimate should refuse broadcast here:\n${planOf(before)}")
      // the crawl: NDV(k)=50 sizes the rollup in kilobytes
      assert(Catalog.publishStatistics(spark, "cs_a_dim"))
      val after = q()
      assert(planOf(after).contains("BroadcastHashJoin"),
        s"NDV(k)=50 should size the rollup under 256KB:\n${planOf(after)}")
      assert(after.agg(sum("amount"), sum("dim_n")).head() ===
        before.agg(sum("amount"), sum("dim_n")).head())
    }
  }

  test("direction B on the SQL layer: rows refuse a compression-lied broadcast") {
    val dimLoc = curated((0 until 400000).map(i =>
      (i.toLong % 1000, "constant_payload")).toDF("k", "v"), "cs_dirB_dim", Seq("k"))
    val factLoc = curated((0 until 150000).map(i =>
      (i.toLong % 1000, hex(i), hex(i + 7000000))).toDF("k", "h", "h2"),
      "cs_dirB_fact", Nil)
    Catalog.registerExternal(spark, "cs_b_fact", factLoc, partitioned = false)
    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "2MB") {
      def q(): DataFrame =
        spark.sql("SELECT * FROM cs_b_fact f JOIN cs_b_dim d ON f.k = d.k")
      Catalog.registerExternal(spark, "cs_b_dim", dimLoc,
        partitioned = false, publishStats = false)
      val before = q()
      assert(planOf(before).contains("BroadcastHashJoin"),
        s"compressed file bytes should sneak under 2MB here:\n${planOf(before)}")
      assert(Catalog.publishStatistics(spark, "cs_b_dim"))
      val after = q()
      assert(planOf(after).contains("SortMergeJoin"),
        s"400k-row count should refuse the broadcast:\n${planOf(after)}")
      assert(after.count() === before.count())
    }
  }

  test("a partitioned catalog table becomes plannable at all") {
    // without stats a partitioned catalog table sizes at
    // spark.sql.defaultSizeInBytes (Long.MaxValue) — it can never
    // broadcast and poisons every product estimate above it. The crawl
    // replaces that with exact bytes + rows.
    val df = (0 until 8000).map(i =>
      (i.toLong, i % 4, s"p${i % 7}")).toDF("id", "part", "v")
    val loc = tmpDir("cs_part") + "/data"
    df.write.mode("overwrite").partitionBy("part").parquet(loc)
    StatsSketch.save(spark.read.parquet(loc), Seq("v"),
      ParquetTable.statsDir(loc))
    Catalog.registerExternal(spark, "cs_part_t", loc,
      partitioned = true, publishStats = false)
    val bare = tableStats("cs_part_t").sizeInBytes
    assert(bare > BigInt(Long.MaxValue) / 2,
      s"bare partitioned catalog tables size at defaultSizeInBytes, got $bare")
    assert(Catalog.publishStatistics(spark, "cs_part_t"))
    val real = tableStats("cs_part_t").sizeInBytes
    assert(real < BigInt(10L * 1024 * 1024), s"exact bytes expected, got $real")
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val stats = tableStats("cs_part_t")
      assert(stats.rowCount === Some(BigInt(8000)))
      // partition-column values live in dir names, not footers: NDV-less
      // partition columns carry no claim, data columns keep theirs
      val byName = stats.attributeStats.toSeq.map { case (a, s) => a.name -> s }.toMap
      assert(byName("v").distinctCount.exists(d => d >= 6 && d <= 8))
    }
  }

  test("no sketch → bare entry; kill switch off → refused; CBO off → bytes only") {
    val df = (0 until 1000).map(i => (i.toLong, i % 5)).toDF("id", "k")
    val locBare = tmpDir("cs_bare") + "/data"
    df.write.mode("overwrite").parquet(locBare)
    Catalog.registerExternal(spark, "cs_bare_t", locBare, partitioned = false)
    assert(!Catalog.publishStatistics(spark, "cs_bare_t"),
      "an un-ANALYZEd location publishes nothing")
    val loc = curated(df, "cs_off", Seq("k"))
    withConfs(PlanStats.Conf -> "false") {
      Catalog.registerExternal(spark, "cs_off_t", loc, partitioned = false)
      assert(!Catalog.publishStatistics(spark, "cs_off_t"))
    }
    // sketch present, kill switch back on: publish, but with CBO off the
    // plan sees only sizeInBytes — exactly the location's file bytes
    assert(Catalog.publishStatistics(spark, "cs_off_t"))
    val stats = tableStats("cs_off_t")
    assert(stats.rowCount.isEmpty, "cbo off ignores the rowCount path")
    val fileBytes = DataSkipping.visibleParquetFiles(spark, loc).map(_._2).sum
    assert(stats.sizeInBytes === BigInt(fileBytes))
  }

  test("a free-standing re-save deletes orphaned bins — no dead distributions") {
    // a free-standing sketch has no version lifecycle, so re-saving IS
    // its re-baseline: bins built over the previous data would pass the
    // unstamped guard (−1 ≥ −1) forever beside fresh counts (r15
    // review). StatsSketch.save must delete them; a rebuild restores.
    val loc = tmpDir("cs_resave") + "/data"
    (0 until 5000).map(i => (i.toLong, 7L)).toDF("id", "k")
      .write.mode("overwrite").parquet(loc)
    val sk = ParquetTable.statsDir(loc)
    StatsSketch.save(spark.read.parquet(loc), Seq("k"), sk)
    StatsHistogram.build(spark.read.parquet(loc), Seq("k"), sk)
    Catalog.registerExternal(spark, "cs_resave_t", loc, partitioned = false)
    withConfs("spark.sql.cbo.enabled" -> "true") {
      def kStat() = tableStats("cs_resave_t").attributeStats.toSeq
        .collectFirst { case (a, s) if a.name == "k" => s }.get
      assert(kStat().histogram.isDefined)
      // the location is rewritten out-of-band; the re-crawl re-saves
      (0 until 5000).map(i => (i.toLong, 100L + i % 1000)).toDF("id", "k")
        .write.mode("overwrite").parquet(loc)
      StatsSketch.save(spark.read.parquet(loc), Seq("k"), sk)
      spark.sessionState.catalog.refreshTable(
        org.apache.spark.sql.catalyst.TableIdentifier("cs_resave_t"))
      assert(Catalog.publishStatistics(spark, "cs_resave_t"))
      val after = kStat()
      assert(after.histogram.isEmpty,
        "pre-rewrite bins must not survive the re-baseline")
      assert(after.distinctCount.exists(_ > BigInt(500)),
        "the fresh sketch's NDV must serve")
      // the rebuild restores the tier over the NEW distribution
      StatsHistogram.build(spark.read.parquet(loc), Seq("k"), sk)
      assert(Catalog.publishStatistics(spark, "cs_resave_t"))
      assert(kStat().histogram.isDefined)
    }
  }

  test("a torn footer fails the crawl, never the registration") {
    // statistics are estimates only: a corrupt data file must not make
    // publishStatistics throw (registration rides on it by default) —
    // the crawl reports false and the entry keeps its previous stats;
    // queries over the corrupt file fail on their own with the real
    // error
    val df = (0 until 1000).map(i => (i.toLong, i % 5)).toDF("id", "k")
    val loc = curated(df, "cs_torn", Seq("k"))
    Catalog.registerExternal(spark, "cs_torn_t", loc, partitioned = false)
    withConfs("spark.sql.cbo.enabled" -> "true") {
      assert(tableStats("cs_torn_t").rowCount === Some(BigInt(1000)))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(loc, "zz-garbage.parquet"),
        "not a parquet file".getBytes("UTF-8"))
      assert(!Catalog.publishStatistics(spark, "cs_torn_t"),
        "a torn footer must fail the crawl quietly, not throw")
      assert(tableStats("cs_torn_t").rowCount === Some(BigInt(1000)),
        "the entry keeps its previous statistics")
    }
  }

  test("re-crawl refreshes after out-of-band INSERT INTO") {
    val df = (0 until 2000).map(i => (i.toLong, i % 10)).toDF("id", "k")
    val loc = curated(df, "cs_recrawl", Seq("k"))
    Catalog.registerExternal(spark, "cs_rc_t", loc, partitioned = false)
    withConfs("spark.sql.cbo.enabled" -> "true") {
      assert(tableStats("cs_rc_t").rowCount === Some(BigInt(2000)))
      spark.sql(
        "INSERT INTO cs_rc_t SELECT id + 2000 AS id, CAST(99 AS INT) AS k FROM range(500)")
      // stale-but-sound until the re-crawl, exactly like a crawler
      spark.sessionState.catalog.refreshTable(
        org.apache.spark.sql.catalyst.TableIdentifier("cs_rc_t"))
      assert(Catalog.publishStatistics(spark, "cs_rc_t"))
      assert(tableStats("cs_rc_t").rowCount === Some(BigInt(2500)))
    }
  }
}
