package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schemas.TableSpec

/** CSV ingestion + schema coercion (reference: src/glue_etl.py:453-496 scan
  * sites; src/etl_utils.py:221-237 coercion loop).
  *
  * Two read modes:
  *   - `readWithSchema` (preferred at scale): a single pass with the declared
  *     schema, malformed values become typed NULLs (PERMISSIVE) and are then
  *     caught by the validator. No inference pass over 100 TB of CSV.
  *   - `readInferred` (reference-faithful): header + inferSchema like the
  *     reference, then `conform` coerces column-by-column.
  */
object CsvIngest {

  /** Single-pass read against a relaxed (all-nullable) copy of the declared
    * schema; nullability is enforced downstream by the Validator, exactly as
    * in the reference (nullability is a validation rule, not an engine
    * constraint — SURVEY §1.3).
    */
  def readWithSchema(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val relaxed = StructType(schema.fields.map(_.copy(nullable = true)))
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(relaxed)
      .csv(path)
  }

  /** Reference-faithful: infer, then conform. Costs an extra scan — kept for
    * parity and for inputs whose layout drifts from the declared schema.
    */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)

  /** Coerce a frame to the declared schema, column by column:
    * timestamps via to_timestamp, everything else via cast; a column missing
    * from the input becomes a typed NULL column (the validator then rejects
    * rows where that column is non-nullable). Cast failures yield NULL
    * (Spark non-ANSI cast), matching the v2 semantics
    * (reference: src/etl_utils.py:226-235).
    */
  def conform(df: DataFrame, schema: StructType): DataFrame = {
    val cols = schema.fields.map { f =>
      if (df.columns.contains(f.name)) {
        f.dataType match {
          case TimestampType if df.schema(f.name).dataType == StringType =>
            to_timestamp(col(f.name)).as(f.name)
          case dt => col(f.name).cast(dt).as(f.name)
        }
      } else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  def readConformed(spark: SparkSession, path: String, spec: TableSpec): DataFrame =
    conform(readWithSchema(spark, path, spec.schema), spec.schema)
}
