package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("ivspec").toString

  private def base(rows: Seq[(Long, String, Double)]): DataFrame =
    rows.toDF("id", "grp", "v")

  private def recompute(basePath: String): Set[(String, Double, Long)] =
    ParquetTable.read(spark, basePath).groupBy("grp")
      .agg(sum("v").as("total"), count(lit(1)).as("n_rows"))
      .as[(String, Double, Long)].collect().toSet

  private def view(viewPath: String): Set[(String, Double, Long)] =
    IncrementalView.read(spark, viewPath).select("grp", "total", "n_rows")
      .as[(String, Double, Long)].collect().toSet

  test("refresh folds inserts, updates and deletes; equals full recompute at every step") {
    val dir = tmp()
    val b = s"$dir/b"; val vw = s"$dir/v"
    ParquetTable.create(base(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 4.0))), b)
    IncrementalView.create(spark, b, vw, Seq("grp"), "v")
    assert(view(vw) == recompute(b))

    // v2: update one row's value, insert a new group
    ParquetTable.merge(spark, b,
      base(Seq((2L, "a", 10.0), (4L, "c", 7.0))), Seq("id"), cdf = true)
    assert(IncrementalView.refresh(spark, b, vw, Seq("id"), Seq("grp"), "v") == 1L)
    assert(view(vw) == recompute(b))

    // v3 + v4: delete across groups, then more inserts — fold BOTH at once
    ParquetTable.delete(spark, b, col("id") === 1L, cdf = true)
    ParquetTable.merge(spark, b, base(Seq((5L, "b", 0.5))), Seq("id"), cdf = true)
    assert(IncrementalView.refresh(spark, b, vw, Seq("id"), Seq("grp"), "v") == 2L)
    assert(view(vw) == recompute(b))
  }

  test("read derives avg from the stored pair; it tracks refreshes exactly") {
    val dir = tmp()
    val b = s"$dir/b"; val vw = s"$dir/v"
    ParquetTable.create(base(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 4.0))), b)
    IncrementalView.create(spark, b, vw, Seq("grp"), "v")
    ParquetTable.delete(spark, b, col("id") === 1L, cdf = true)
    ParquetTable.merge(spark, b, base(Seq((4L, "b", 6.0))), Seq("id"), cdf = true)
    IncrementalView.refresh(spark, b, vw, Seq("id"), Seq("grp"), "v")
    val avgs = IncrementalView.read(spark, vw).select("grp", "avg")
      .as[(String, Double)].collect().toMap
    assert(avgs("a") === 2.0) // (1+2) minus deleted 1 → 2/1
    assert(avgs("b") === 5.0) // (4+6)/2
    val expect = ParquetTable.read(spark, b).groupBy("grp")
      .agg(avg("v").as("avg")).as[(String, Double)].collect().toMap
    assert(avgs === expect)
  }

  test("MIN/MAX are refused up front, naming the recompute path") {
    val dir = tmp()
    val b = s"$dir/b"; val vw = s"$dir/v"
    ParquetTable.create(base(Seq((1L, "a", 1.0))), b)
    val e = intercept[IllegalArgumentException] {
      IncrementalView.create(spark, b, vw, Seq("grp"), "v",
        aggs = Seq("sum", "min"))
    }
    assert(e.getMessage.contains("not self-maintainable"))
    assert(e.getMessage.contains("Recompute"))
    assert(e.getMessage.toLowerCase.contains("min"))
    val e2 = intercept[IllegalArgumentException] {
      IncrementalView.create(spark, b, vw, Seq("grp"), "v",
        aggs = Seq("max"))
    }
    assert(e2.getMessage.contains("not self-maintainable"))
    // nothing was created by the refused calls
    assert(ParquetTable.currentVersion(spark, vw).isEmpty)
    // the maintainable set goes through unchanged
    IncrementalView.create(spark, b, vw, Seq("grp"), "v",
      aggs = Seq("sum", "count", "avg"))
    assert(view(vw).nonEmpty)
  }

  test("refresh is idempotent and commit-less when current") {
    val dir = tmp()
    val b = s"$dir/b"; val vw = s"$dir/v"
    ParquetTable.create(base(Seq((1L, "a", 1.0))), b)
    IncrementalView.create(spark, b, vw, Seq("grp"), "v")
    val vBefore = ParquetTable.currentVersion(spark, vw)
    assert(IncrementalView.refresh(spark, b, vw, Seq("id"), Seq("grp"), "v") == 0L)
    assert(ParquetTable.currentVersion(spark, vw) == vBefore)
  }

  test("a group deleted to zero disappears; reappearing rows resurrect it") {
    val dir = tmp()
    val b = s"$dir/b"; val vw = s"$dir/v"
    ParquetTable.create(base(Seq((1L, "a", 1.0), (2L, "b", 2.0))), b)
    IncrementalView.create(spark, b, vw, Seq("grp"), "v")
    ParquetTable.delete(spark, b, col("grp") === "b", cdf = true)
    IncrementalView.refresh(spark, b, vw, Seq("id"), Seq("grp"), "v")
    assert(view(vw).map(_._1) == Set("a"))
    assert(view(vw) == recompute(b))
    // resurrect with a different value; tombstone residue must not leak
    ParquetTable.merge(spark, b, base(Seq((9L, "b", 3.25))), Seq("id"), cdf = true)
    IncrementalView.refresh(spark, b, vw, Seq("id"), Seq("grp"), "v")
    assert(view(vw) == recompute(b))
  }

  test("partitioned base: refresh folds partition-scoped commits") {
    val dir = tmp()
    val b = s"$dir/b"; val vw = s"$dir/v"
    val rows = Seq((1L, "a", 1.0, "d1"), (2L, "a", 2.0, "d2"), (3L, "b", 4.0, "d2"))
      .toDF("id", "grp", "v", "day")
    ParquetTable.createVersioned(rows, b, Seq("day"))
    IncrementalView.create(spark, b, vw, Seq("grp"), "v")
    // hot-partition MOR merge + partition-scoped delete, both cdf-captured
    ParquetTable.mergeVersioned(spark, b,
      Seq((2L, "a", 20.0, "d2"), (4L, "c", 7.0, "d1")).toDF("id", "grp", "v", "day"),
      Seq("id"), Seq("day"), cdf = true, mergeOnRead = Some(true))
    ParquetTable.delete(spark, b, col("id") === 3L, cdf = true)
    assert(IncrementalView.refresh(spark, b, vw, Seq("id"), Seq("grp"), "v") == 2L)
    assert(view(vw) == recompute(b))
    assert(view(vw) == Set(("a", 21.0, 2L), ("c", 7.0, 1L)))
  }

  test("view without a marker for the base refuses to refresh") {
    val dir = tmp()
    val b = s"$dir/b"
    ParquetTable.create(base(Seq((1L, "a", 1.0))), b)
    ParquetTable.create(base(Seq((1L, "a", 1.0))), s"$dir/notview")
    intercept[IllegalStateException] {
      IncrementalView.refresh(spark, b, s"$dir/notview", Seq("id"), Seq("grp"), "v")
    }
  }

  test("integral sum column: refresh keeps the view's LongType total exactly (ADVICE r7)") {
    val dir = tmp()
    val b = s"$dir/b"; val vw = s"$dir/v"
    // long v near 2^53, where double arithmetic loses exactness
    val big = (1L << 53) + 1L
    ParquetTable.create(
      Seq((1L, "a", big), (2L, "b", 3L)).toDF("id", "grp", "v"), b)
    IncrementalView.create(spark, b, vw, Seq("grp"), "v")
    val created = ParquetTable.read(spark, vw).schema("total").dataType
    // fold an insert into a NEW group (left-join miss → the zero fallback)
    ParquetTable.merge(spark, b,
      Seq((3L, "c", big)).toDF("id", "grp", "v"), Seq("id"), cdf = true)
    IncrementalView.refresh(spark, b, vw, Seq("id"), Seq("grp"), "v")
    val after = ParquetTable.read(spark, vw).schema("total").dataType
    assert(after === created, "refresh must not flip the total's type")
    val got = IncrementalView.read(spark, vw).select("grp", "total")
      .as[(String, Long)].collect().toMap
    assert(got("c") === big) // exact — a double total would round to 2^53
  }
}
