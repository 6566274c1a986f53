package graft.pipeline

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.schemas.Schemas
import graft.sources.ParquetTable

/** Persistent-catalog surface + the reference's ACID corpus
  * (README.md:261-377): external `clean_*` tables registered over curated
  * parquet answer plain SQL and accept the three
  * `INSERT INTO … WHERE NOT EXISTS` statements; replaying the corpus
  * inserts nothing (the reference's duplicate-prevention claim).
  */
class AcidInsertsSpec extends SparkSpec {

  /** Curated tables with one row each; keys chosen to NOT collide with the
    * corpus VALUES, so first-run insert counts are exact.
    */
  private def seedCurated(root: String): Pipeline.Config = {
    val cfg = Pipeline.Config(
      inputDir = root, outputDir = s"$root/curated", rejectedDir = s"$root/rej")
    ParquetTable.create(
      frame(Schemas.products, Seq(Row(501, 1, "produce", "apple"))),
      Pipeline.tablePath(cfg, "products"), Seq("department"))
    ParquetTable.create(
      frame(Schemas.orders, Seq(Row(9, 901, 11,
        Timestamp.valueOf("2025-03-01 10:00:00"), 12.5, Date.valueOf("2025-03-01")))),
      Pipeline.tablePath(cfg, "orders"), Seq("date"))
    ParquetTable.create(
      frame(Schemas.orderItems, Seq(Row(900, 901, 11, 3, 501, 1, 0,
        Timestamp.valueOf("2025-03-01 10:00:00"), Date.valueOf("2025-03-01")))),
      Pipeline.tablePath(cfg, "order_items"), Seq("date"))
    cfg
  }

  test("catalog tables answer SQL; ACID corpus lands once; replay is a no-op") {
    val cfg = seedCurated(tmpDir("acid"))
    Pipeline.registerTables(spark, cfg)

    assert(spark.sql("SELECT count(*) FROM clean_products").head().getLong(0) === 1)
    assert(spark.sql("SELECT count(*) FROM clean_orders").head().getLong(0) === 1)
    assert(spark.sql("SELECT count(*) FROM clean_orders_items").head().getLong(0) === 1)

    // first run: every VALUES row is new → 5 products, 3 orders, 3 items
    assert(AcidInserts.runAll(spark) === Seq(5L, 3L, 3L))
    // replay: NOT EXISTS sees the inserted keys → nothing lands
    assert(AcidInserts.runAll(spark) === Seq(0L, 0L, 0L))

    // inserted rows are queryable with their values intact
    val p1 = spark.sql(
      "SELECT product_name, department FROM clean_products WHERE product_id = 1").head()
    assert(p1.getString(0) === "Product_14_Job" && p1.getString(1) === "Home")

    // the INSERT wrote through to the pipeline-owned partitioned layout
    assert(new java.io.File(
      Pipeline.tablePath(cfg, "products") + "/department=Home").exists())
    assert(new java.io.File(
      Pipeline.tablePath(cfg, "orders") + "/date=2025-04-02").exists())

    // path-based readers see the same post-insert state (one storage, two surfaces)
    assert(ParquetTable.read(spark, Pipeline.tablePath(cfg, "orders")).count() === 4)
  }

  test("re-registration is idempotent and never loses data") {
    val cfg = seedCurated(tmpDir("acid_rereg"))
    Pipeline.registerTables(spark, cfg)
    AcidInserts.runAll(spark)
    val n = spark.table("clean_orders").count()
    Pipeline.registerTables(spark, cfg) // drop + recreate external entries
    assert(spark.table("clean_orders").count() === n)
  }
}
