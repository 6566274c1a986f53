package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Generated columns: fill-on-ingest across the write verbs, paired
  * CHECK invariant enforcement, pre-create registration, DDL refusals,
  * clone inheritance, generated partition columns.
  */
class GeneratedColumnsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("amount", IntegerType, nullable = true)))

  private def df(rows: Row*) = frame(schema, rows)

  test("rule registered before the first write: every ingest verb fills the column") {
    val path = tmpDir("gen-fill") + "/t"
    GeneratedColumns.add(spark, path, "doubled", "amount * 2")
    ParquetTable.create(df(Row(1, 10)), path) // v1, no `doubled` supplied
    assert(ParquetTable.read(spark, path).columns.toSeq === Seq("id", "amount", "doubled"))
    assert(ParquetTable.read(spark, path).select("doubled").head.getInt(0) === 20)

    ParquetTable.insertInto(spark, path, df(Row(2, 7)))
    ParquetTable.merge(spark, path, df(Row(3, 5)), Seq("id"))
    val got = ParquetTable.read(spark, path)
      .orderBy("id").select("id", "doubled").as[(Int, Int)].collect().toSeq
    assert(got === Seq((1, 20), (2, 14), (3, 10)))
  }

  test("a frame that carries the column is validated, not recomputed") {
    val path = tmpDir("gen-carry") + "/t"
    GeneratedColumns.add(spark, path, "doubled", "amount * 2")
    ParquetTable.create(df(Row(1, 10)), path)
    // correct explicit value passes
    ParquetTable.insertInto(spark, path,
      Seq((2, 3, 6)).toDF("id", "amount", "doubled"))
    // wrong explicit value fails the paired invariant, nothing published
    val before = ParquetTable.currentVersion(spark, path).get
    val e = intercept[IllegalArgumentException] {
      ParquetTable.insertInto(spark, path,
        Seq((3, 4, 99)).toDF("id", "amount", "doubled"))
    }
    assert(e.getMessage.contains("_gen_doubled"))
    assert(ParquetTable.currentVersion(spark, path).get === before)
  }

  test("add on an existing table with the column validates; mismatch refuses") {
    val path = tmpDir("gen-add") + "/t"
    ParquetTable.create(
      Seq((1, 10, 20), (2, 5, 10)).toDF("id", "amount", "doubled"), path)
    GeneratedColumns.add(spark, path, "doubled", "amount * 2") // consistent
    assert(GeneratedColumns.list(spark, path).map(_._1) === Seq("doubled"))

    val path2 = tmpDir("gen-add2") + "/t"
    ParquetTable.create(
      Seq((1, 10, 21)).toDF("id", "amount", "doubled"), path2) // 21 ≠ 20
    val e = intercept[IllegalArgumentException] {
      GeneratedColumns.add(spark, path2, "doubled", "amount * 2")
    }
    assert(e.getMessage.contains("existing row violates"))
    assert(GeneratedColumns.list(spark, path2).isEmpty)
  }

  test("add for a column absent from a non-empty table is refused (no backfill)") {
    val path = tmpDir("gen-absent") + "/t"
    ParquetTable.create(df(Row(1, 10)), path)
    val e = intercept[IllegalArgumentException] {
      GeneratedColumns.add(spark, path, "doubled", "amount * 2")
    }
    assert(e.getMessage.contains("absent from the existing table"))
  }

  test("self-referencing expressions are refused") {
    val path = tmpDir("gen-self") + "/t"
    val e = intercept[IllegalArgumentException] {
      GeneratedColumns.add(spark, path, "doubled", "doubled + 1")
    }
    assert(e.getMessage.contains("must not reference the column itself"))
  }

  test("drop removes the rule and its paired invariant; fill stops") {
    val path = tmpDir("gen-drop") + "/t"
    GeneratedColumns.add(spark, path, "doubled", "amount * 2")
    ParquetTable.create(df(Row(1, 10)), path)
    GeneratedColumns.drop(spark, path, "doubled")
    assert(GeneratedColumns.list(spark, path).isEmpty)
    assert(Constraints.list(spark, path).isEmpty)
    // new writes neither fill nor validate; the column must be supplied
    // explicitly now (schema alignment still applies)
    ParquetTable.insertInto(spark, path,
      Seq((2, 4, 999)).toDF("id", "amount", "doubled")) // 999 accepted
    assert(ParquetTable.read(spark, path).filter(col("id") === 2)
      .select("doubled").head.getInt(0) === 999)
  }

  test("renameColumn/dropColumn on a generated or referenced column is refused") {
    val path = tmpDir("gen-ddl") + "/t"
    GeneratedColumns.add(spark, path, "doubled", "amount * 2")
    ParquetTable.create(df(Row(1, 10)), path)
    val e1 = intercept[IllegalArgumentException] {
      ParquetTable.renameColumn(spark, path, "amount", "amt")
    }
    assert(e1.getMessage.contains("constraint"))
    val e2 = intercept[IllegalArgumentException] {
      ParquetTable.dropColumn(spark, path, "doubled")
    }
    assert(e2.getMessage.contains("constraint"))
  }

  test("shallow clone carries generation rules") {
    val src = tmpDir("gen-clone") + "/src"
    val tgt = tmpDir("gen-clone") + "/tgt"
    GeneratedColumns.add(spark, src, "doubled", "amount * 2")
    ParquetTable.create(df(Row(1, 10)), src)
    ParquetTable.shallowClone(spark, src, tgt)
    assert(GeneratedColumns.list(spark, tgt) === Seq("doubled" -> "amount * 2"))
    ParquetTable.insertInto(spark, tgt, df(Row(2, 8)))
    assert(ParquetTable.read(spark, tgt).filter(col("id") === 2)
      .select("doubled").head.getInt(0) === 16)
  }

  test("generated PARTITION column: writers never hand-maintain the key, reads prune") {
    val path = tmpDir("gen-part") + "/t"
    GeneratedColumns.add(spark, path, "bucket", "pmod(id, 2)")
    val rows = (1 to 8).map(i => (i, i * 10)).toDF("id", "amount")
    ParquetTable.createVersioned(rows, path, Seq("bucket"))
    val read = ParquetTable.read(spark, path)
    assert(read.count() === 8)
    assert(read.filter(col("bucket") === 1).count() === 4)
    // the partition layout embeds the generated key
    val v = ParquetTable.currentVersion(spark, path).get
    val entries = ParquetTable.partitionEntries(spark, path, v)
    assert(entries.isDefined &&
      entries.get.map(_._1).forall(_.startsWith("bucket=")))
  }

  test("generated date(ts) PARTITION column end-to-end: ingest never supplies it, the scan prunes on it") {
    val path = tmpDir("gen-datepart") + "/t"
    GeneratedColumns.add(spark, path, "event_date", "date(ts)")
    import java.sql.Timestamp
    def rows(lo: Int, hi: Int) = (lo until hi).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-${i % 3 + 1}%02d 0${i % 9}:00:00"), s"p$i")
    }.toDF("id", "ts", "payload")
    // three ingest verbs, NONE carrying the partition key
    ParquetTable.createVersioned(rows(0, 30), path, Seq("event_date"))
    ParquetTable.insertInto(spark, path, rows(30, 40))
    ParquetTable.merge(spark, path, rows(35, 45), Seq("id"), Seq("event_date"))
    val read = ParquetTable.read(spark, path)
    assert(read.count() === 45)
    assert(read.columns.contains("event_date"))
    // CHECK invariant holds: every stored row satisfies the rule
    assert(read.filter(!(col("event_date") <=> expr("date(ts)"))).count() === 0)

    // partition pruning on the GENERATED column, asserted at plan level:
    // the filtered scan must read only the matching date partition's files
    val pruned = read.filter(col("event_date") === "2024-01-02")
    val expected = pruned.count()
    assert(expected > 0)
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      import org.apache.spark.sql.execution._
      val self = p match { case f: FileSourceScanExec => Seq(f); case _ => Nil }
      val kids = p match {
        case a: adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: adaptive.QueryStageExec => Seq(q.plan)
        case r: exchange.ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      self ++ kids.flatMap(allScans)
    }
    val all = ParquetTable.read(spark, path)
    all.collect()
    val totalFiles = allScans(all.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    pruned.collect()
    val prunedFiles = allScans(pruned.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(prunedFiles < totalFiles,
      s"generated-column filter read $prunedFiles of $totalFiles files — no pruning")
    // layout check: only 2024-01-02 partition dirs feed the pruned scan
    val parts = allScans(pruned.queryExecution.executedPlan)
      .flatMap(_.metadata.get("PartitionFilters"))
    assert(parts.exists(_.contains("event_date")),
      s"no partition filter on the generated column: $parts")
  }

  test("SQL: ALTER TABLE ADD COLUMN ... GENERATED ALWAYS AS / DROP GENERATED COLUMN") {
    val path = tmpDir("gen-sql") + "/t"
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE graft.`$path` ADD COLUMN doubled GENERATED ALWAYS AS (amount * 2)")
    assert(GeneratedColumns.list(spark, path) === Seq("doubled" -> "amount * 2"))
    ParquetTable.create(df(Row(1, 6)), path)
    assert(ParquetTable.read(spark, path).select("doubled").head.getInt(0) === 12)
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE graft.`$path` DROP GENERATED COLUMN doubled")
    assert(GeneratedColumns.list(spark, path).isEmpty)
    assert(Constraints.list(spark, path).isEmpty)
  }
}
