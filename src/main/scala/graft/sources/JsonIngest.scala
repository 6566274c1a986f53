package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.schemas.TableSpec

/** JSON-lines (NDJSON) ingestion — the raw-text-dump format training-data
  * pipelines ingest most after CSV/parquet. Not in the reference (its raw
  * zone is CSV, src/glue_etl.py:453-496); included because a corpus
  * swap-in should not force a format conversion.
  *
  * Scale contract mirrors CsvIngest: ALWAYS a declared schema — schema
  * inference is a full extra pass over the input, never acceptable at
  * 100 TB — with PERMISSIVE parsing so malformed lines surface as data
  * (typed NULLs + the raw line in `_corrupt_record`) for the Validator
  * instead of failing the scan. The JSON reader prunes to the declared
  * fields, so a 2-field schema over wide documents reads 2 fields.
  */
object JsonIngest {

  val CorruptCol = "_corrupt_record"

  /** Single-pass read against a relaxed (all-nullable) copy of the declared
    * schema plus `_corrupt_record`: well-formed lines parse to typed
    * columns (corrupt = NULL); malformed lines yield NULLs + the raw text
    * in `_corrupt_record`. Nullability is enforced by the Validator
    * downstream, as with CSV (SURVEY §1.3).
    */
  def readWithSchema(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val relaxed = StructType(
      schema.fields.map(_.copy(nullable = true)) :+
        StructField(CorruptCol, StringType, nullable = true))
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(relaxed)
      .json(path)
  }

  /** (parsed rows, corrupt raw lines) — the valid/rejected split at the
    * parse layer. Parsed rows carry exactly the declared columns; corrupt
    * rows carry the offending raw line for the rejected-records sink.
    * The cache is LOAD-BEARING, not an optimization: Spark refuses a
    * query that selects only `_corrupt_record` from a raw JSON scan
    * (SPARK-21610) — both split halves must read the cached parse.
    * Callers streaming huge inputs should unpersist after materializing.
    */
  def readSplit(
      spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    val raw = readWithSchema(spark, path, schema).cache()
    val parsed = raw.filter(raw(CorruptCol).isNull)
      .select(schema.fieldNames.map(raw(_)).toSeq: _*)
    val corrupt = raw.filter(raw(CorruptCol).isNotNull).select(raw(CorruptCol))
    (parsed, corrupt)
  }

  /** Declared-schema read conformed through the same coercion as CSV
    * (timestamps, casts, missing columns → typed NULLs). Malformed lines
    * are DROPPED here — without the filter each corrupt line would
    * survive as an all-NULL ghost row that only a non-nullable rule
    * downstream could catch. Callers that need the quarantined lines use
    * `readSplit`. (No cache needed: unlike readSplit's corrupt-only
    * branch, this projection reads real fields, so SPARK-21610 doesn't
    * bite.)
    */
  def readConformed(spark: SparkSession, path: String, spec: TableSpec): DataFrame = {
    val raw = readWithSchema(spark, path, spec.schema)
    CsvIngest.conform(
      raw.filter(raw(CorruptCol).isNull).drop(CorruptCol), spec.schema)
  }
}
