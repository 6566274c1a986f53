package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.functions.expressions.PolyHash64

/** The SQL-replayable 64-bit polynomial hash: native codegen'd expression
  * vs the HOF fold spec (the same arithmetic the DuckDB oracle replays),
  * plus the packing invariants the q28 oracle relies on.
  */
class PolyHash64Spec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("s", StringType, nullable = true)))

  private val samples = Seq(
    "", "a", "spark", "the quick brown fox", "merge batch window",
    "punct!uation, marks.", "  leading and  doubled  spaces",
    "0123456789", "ÄÖÜ unicode ßharp", "混合 multi-script 文本")

  test("native expression is bit-identical to the HOF fold spec") {
    val df = frame(schema, samples.map(Row(_)))
    val out = df.select(
      TextFunctions.polyHash64(col("s")).as("h1"),
      TextFunctions.polyHash64Hof(col("s")).as("h2")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("packing invariants: non-negative, bit 63 clear, parts in range") {
    samples.foreach { s =>
      val h = PolyHash64.hash(s)
      assert(h >= 0L, s"hash must stay non-negative for '$s'")
      assert((h >>> 63) === 0L)
      PolyHash64.Parts.zipWithIndex.foreach { case ((_, p), i) =>
        assert(((h >>> (i * 16)) & 0xFFFFL) < p)
      }
    }
    assert(PolyHash64.hash("") === 0L)
  }

  test("distinct strings get distinct hashes on a realistic token set") {
    val tokens = (samples ++ Seq("window", "merge", "spark", "batch", "table",
      "join", "agg", "line", "small", "slow", "stream", "big", "the", "a"))
      .flatMap(_.split("\\s+")).filter(_.nonEmpty).distinct
    val hashes = tokens.map(PolyHash64.hash)
    assert(hashes.distinct.size === tokens.size)
  }

  test("SQL registration: poly_hash64 usable from spark.sql") {
    GraftFunctions.register(spark)
    frame(schema, samples.map(Row(_))).createOrReplaceTempView("ph_test")
    val rows = spark.sql("SELECT poly_hash64(s) AS h FROM ph_test").collect()
    assert(rows.length === samples.size)
    rows.foreach(r => assert(r.getLong(0) >= 0L))
  }
}
