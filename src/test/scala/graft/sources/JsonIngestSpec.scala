package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.schemas.TableSpec

class JsonIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  private def writeLines(lines: String*): String = {
    val dir = tmpDir("json_ingest")
    Files.write(Paths.get(dir, "a.json"), lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("declared-schema read parses well-formed NDJSON") {
    val dir = writeLines(
      """{"id": 1, "name": "a", "score": 0.5}""",
      """{"id": 2, "name": "b", "score": 1.5}""")
    val (parsed, corrupt) = JsonIngest.readSplit(spark, dir, schema)
    assert(parsed.columns.toSeq === Seq("id", "name", "score"))
    assert(parsed.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "a"), (2L, "b")))
    assert(corrupt.isEmpty)
  }

  test("corrupt lines quarantine with the raw text, parse never fails") {
    val dir = writeLines(
      """{"id": 1, "name": "ok", "score": 1.0}""",
      "### not json",
      "{unquoted: nope")
    val (parsed, corrupt) = JsonIngest.readSplit(spark, dir, schema)
    assert(parsed.count() === 1)
    val bad = corrupt.collect().map(_.getString(0)).toSet
    assert(bad === Set("### not json", "{unquoted: nope"))
  }

  test("type-mismatched fields make the row corrupt, not the job") {
    val dir = writeLines(
      """{"id": 1, "name": "ok", "score": 1.0}""",
      """{"id": "NaN-ish", "name": "bad-id", "score": 2.0}""")
    val (parsed, corrupt) = JsonIngest.readSplit(spark, dir, schema)
    // the mismatched row lands on the corrupt side (PERMISSIVE stamps
    // _corrupt_record), keeping the parsed side fully typed
    assert(parsed.collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(corrupt.count() === 1)
  }

  test("readConformed drops corrupt lines instead of passing all-NULL ghosts") {
    val dir = writeLines(
      """{"id": 1, "name": "ok", "score": 1.0}""",
      "### not json at all")
    val spec = TableSpec(name = "t", schema = schema,
      primaryKey = Seq("id"), rules = Seq.empty)
    val rows = JsonIngest.readConformed(spark, dir, spec).collect()
    // without the corrupt filter the bad line survived as (null,null,null)
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 1L)
  }

  test("readConformed: missing declared column becomes a typed NULL") {
    val dir = writeLines("""{"id": 7, "score": 3.5}""")
    val spec = TableSpec(name = "t", schema = schema,
      primaryKey = Seq("id"), rules = Seq.empty)
    val row = JsonIngest.readConformed(spark, dir, spec).head()
    assert(row.getLong(0) === 7L)
    assert(row.isNullAt(1)) // name absent from the input
    assert(row.getDouble(2) === 3.5)
  }
}
