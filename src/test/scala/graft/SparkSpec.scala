package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (like the reference's session-scoped
  * pytest fixture, reference: tests/conftest.py:7-44).
  */
object SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark

  /** Build a frame from rows against a relaxed (all-nullable) copy of the
    * schema, so tests can inject nulls into non-nullable fields — the same
    * trick as the reference tests (tests/test_glue_etl.py:58-63).
    */
  def frame(schema: StructType, rows: Seq[Row]): DataFrame = {
    val relaxed = StructType(schema.fields.map(_.copy(nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), relaxed)
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
