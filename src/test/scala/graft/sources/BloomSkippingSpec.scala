package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bloom point-lookup skipping tier (ParquetTable.optimizeBloom +
  * DataSkipping's bloom probing): equality predicates on
  * high-cardinality UNCLUSTERED columns — where every file's [min, max]
  * spans the whole domain and interval pruning keeps everything — drop
  * files via the native parquet bloom filters the optimize wrote.
  */
class BloomSkippingSpec extends SparkSpec {
  import spark.implicits._

  // 4,000 rows; uid is a multiplicative scramble of id (even codes only,
  // so every odd code is an in-range ABSENT value) — after repartition(8)
  // each file's [min, max] covers nearly the full domain
  private def mk(tag: String): String = {
    val path = tmpDir(s"bloom-$tag") + "/t"
    val df = (0 until 4000).map { i =>
      (i.toLong, f"uid-${(i * 37) % 4000 * 2}%06d", i % 7)
    }.toDF("id", "uid", "grp").repartition(8)
    ParquetTable.create(df, path)
    path
  }

  private def kept(path: String, pred: org.apache.spark.sql.Column): Int = {
    val v = ParquetTable.currentVersion(spark, path).get
    ParquetTable.prunedFileGroups(spark, path, v, pred).map(_._2.size).sum
  }

  test("optimizeBloom writes native blooms; equality lookups prune to ~1 file") {
    val path = mk("basic")
    val present = col("uid") === "uid-000074" // (1*37)%4000*2 = 74
    val absent = col("uid") === "uid-000075"  // odd code: in range, absent
    // BEFORE: interval pruning keeps everything (min/max spans the domain)
    assert(kept(path, present) === 8, "pre-bloom equality must keep all files")
    val v2 = ParquetTable.optimizeBloom(spark, path, Seq("uid"), numFiles = 8)
    assert(v2 === 2L)
    // sidecar records the bloomed column
    val dirKept = kept(path, present)
    assert(dirKept >= 1 && dirKept <= 2,
      s"present value should probe down to ~1 file, kept $dirKept of 8")
    val gone = kept(path, absent)
    assert(gone <= 2, s"absent value kept $gone files (bloom FPs only)")
    // correctness: results identical to the unpruned filter
    assert(ParquetTable.readWhere(spark, path, present)
      .select("id").as[Long].collect().toSeq === Seq(1L))
    assert(ParquetTable.readWhere(spark, path, absent).count() === 0L)
  }

  test("conjuncts: uid = x AND grp = y probes the bloom; non-bloom columns stay interval-pruned") {
    val path = mk("conj")
    ParquetTable.optimizeBloom(spark, path, Seq("uid"), numFiles = 8)
    val pred = col("uid") === "uid-000074" && col("grp") === 1
    assert(kept(path, pred) <= 2)
    assert(ParquetTable.readWhere(spark, path, pred)
      .select("id").as[Long].collect().toSeq === Seq(1L))
    // a range predicate alone never touches the bloom tier (no equality)
    assert(kept(path, col("uid") >= "uid-000000") === 8)
  }

  test("bloom survives zorder-composed optimize; probing through readWhere stays correct") {
    val path = mk("zorder")
    ParquetTable.optimizeBloom(spark, path, Seq("uid"),
      zorderBy = Seq("id", "grp"), numFiles = 8)
    val present = col("uid") === "uid-000074"
    assert(kept(path, present) <= 2)
    assert(ParquetTable.readWhere(spark, path, present).count() === 1L)
  }

  test("SQL: OPTIMIZE ... BLOOM BY builds the index; lookups stay exact") {
    val path = mk("sql")
    val v = graft.sql.GraftSql.sql(spark,
      s"OPTIMIZE graft.`$path` BLOOM BY (uid)").head().getLong(0)
    assert(v === 2L)
    assert(kept(path, col("uid") === "uid-000074") <= 2)
    val got = graft.sql.GraftSql.sql(spark,
      s"SELECT id FROM graft.`$path` WHERE uid = 'uid-000074'").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("type strictness: a cast-wrapped attribute never probes (no false negatives)") {
    val path = tmpDir("bloom-cast") + "/t"
    ParquetTable.create(
      (0 until 1000).map(i => (i.toLong, (i * 13) % 1000)).toDF("id", "code")
        .repartition(4), path)
    ParquetTable.optimizeBloom(spark, path, Seq("code"), numFiles = 4)
    // code is INT; compare against a LONG literal → analyzer casts the
    // attribute; the bloom tier must decline rather than hash the wrong
    // domain — and results must still be exact
    val got = ParquetTable.readWhere(spark, path,
      col("code").cast("long") === 13L).select("id").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }

  test("IN-list probing: a 3-key batch prunes to <=3 files' worth of candidates") {
    val path = mk("inlist")
    ParquetTable.optimizeBloom(spark, path, Seq("uid"), numFiles = 8)
    // three present keys: (i*37)%4000*2 for i = 1, 9, 25
    val keys = Seq(1, 9, 25).map(i => f"uid-${(i * 37) % 4000 * 2}%06d")
    val inPred = col("uid").isin(keys: _*)
    val k = kept(path, inPred)
    assert(k <= 3 + 1, s"3-key IN kept $k of 8 files (expected <=3 + FP slack)")
    assert(k >= 1)
    // correctness: identical to the unpruned filter
    assert(ParquetTable.readWhere(spark, path, inPred)
      .select("id").as[Long].collect().toSeq.sorted === Seq(1L, 9L, 25L))
    // an all-absent IN batch prunes to ~0
    val absent = col("uid").isin("uid-000075", "uid-000077", "uid-000079")
    assert(kept(path, absent) <= 2)
    assert(ParquetTable.readWhere(spark, path, absent).count() === 0L)
    // mixed conjunct: IN on the bloomed column AND equality on another
    val mixed = col("uid").isin(keys: _*) && col("grp") === 1
    assert(kept(path, mixed) <= 3 + 1)
    assert(ParquetTable.readWhere(spark, path, mixed)
      .select("id").as[Long].collect().toSeq === Seq(1L))
  }
}
