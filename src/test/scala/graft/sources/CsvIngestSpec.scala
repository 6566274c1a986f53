package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.schemas.Schemas

class CsvIngestSpec extends SparkSpec {

  private def writeCsv(name: String, content: String): String = {
    val dir = tmpDir("csv")
    val p = Paths.get(dir, name)
    Files.writeString(p, content)
    p.toString
  }

  test("readConformed: header CSV lands on the declared schema") {
    val path = writeCsv("products.csv",
      """product_id,department_id,department,product_name
        |1,10,produce,apple
        |2,20,dairy,milk
        |""".stripMargin)
    val df = CsvIngest.readConformed(spark, path, Schemas.productsSpec)
    assert(df.schema.fields.map(f => f.name -> f.dataType).toSeq ===
      Schemas.products.fields.map(f => f.name -> f.dataType).toSeq)
    assert(df.count() === 2)
  }

  test("conform: unparseable values become typed NULLs (v2 semantics)") {
    val path = writeCsv("orders.csv",
      """order_num,order_id,user_id,order_timestamp,total_amount,date
        |1,101,1,2025-04-01 10:00:00,12.5,2025-04-01
        |2,oops,1,not-a-time,xx,2025-04-01
        |""".stripMargin)
    val df = CsvIngest.readConformed(spark, path, Schemas.ordersSpec)
    val bad = df.filter(org.apache.spark.sql.functions.col("order_num") === 2).head()
    assert(bad.isNullAt(df.columns.indexOf("order_id")))
    assert(bad.isNullAt(df.columns.indexOf("order_timestamp")))
    assert(bad.isNullAt(df.columns.indexOf("total_amount")))
  }

  test("conform: column missing from input becomes typed NULL column") {
    val path = writeCsv("products.csv",
      """product_id,department
        |1,produce
        |""".stripMargin)
    val df = CsvIngest.readConformed(spark, path, Schemas.productsSpec)
    assert(df.columns.toSeq === Schemas.products.fields.map(_.name).toSeq)
    assert(df.head().isNullAt(df.columns.indexOf("product_name")))
  }

  test("glob path unions daily files (implicit UNION ALL)") {
    val dir = tmpDir("glob")
    Files.createDirectories(Paths.get(dir, "orders"))
    val hdr = "order_num,order_id,user_id,order_timestamp,total_amount,date\n"
    Files.writeString(Paths.get(dir, "orders", "2025-04-01.csv"),
      hdr + "1,101,1,2025-04-01 10:00:00,12.5,2025-04-01\n")
    Files.writeString(Paths.get(dir, "orders", "2025-04-02.csv"),
      hdr + "2,102,2,2025-04-02 10:00:00,20.0,2025-04-02\n")
    val df = CsvIngest.readConformed(spark, s"$dir/orders/*.csv", Schemas.ordersSpec)
    assert(df.count() === 2)
  }
}
