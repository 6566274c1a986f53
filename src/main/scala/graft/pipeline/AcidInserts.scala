package graft.pipeline

import org.apache.spark.sql.SparkSession

/** The reference's Athena ACID corpus (reference README.md:261-377): three
  * `INSERT INTO clean_* SELECT … FROM (VALUES …) WHERE NOT EXISTS (…)`
  * statements, runnable through `spark.sql` against the persistent catalog
  * tables `Pipeline.registerTables` creates.
  *
  * The statements keep the reference's shape, values, and duplicate-key
  * conditions; the only changes are dialect-mandated: Athena's
  * `timestamp(3)` casts become TIMESTAMP literals, and the items table's
  * `CAST(DATE … AS VARCHAR)` becomes a DATE literal because the curated
  * schema types `date` as DATE (reference: src/etl_utils.py:33-57).
  *
  * Replay-safety: NOT EXISTS makes each statement idempotent — re-running
  * inserts nothing, the same property the reference advertises for its
  * corpus ("prevents duplicate entries", README.md:292).
  */
object AcidInserts {

  /** reference README.md:263-287 — duplicate check on (order_num, order_id). */
  val insertOrders: String =
    """INSERT INTO clean_orders
      |SELECT *
      |FROM (
      |    SELECT *
      |    FROM (
      |        VALUES
      |            (1, 57, 10504, TIMESTAMP '2025-04-02 18:08:00', 400.25, DATE '2025-04-02'),
      |            (2, 24, 12523, TIMESTAMP '2025-04-06 04:17:00', 373.73, DATE '2025-04-06'),
      |            (3, 66, 12525, TIMESTAMP '2025-04-06 13:06:00', 258.10, DATE '2025-04-06')
      |    ) AS t(order_num, order_id, user_id, order_timestamp, total_amount, date)
      |) AS new_rows
      |WHERE NOT EXISTS (
      |    SELECT 1
      |    FROM clean_orders existing
      |    WHERE existing.order_num = new_rows.order_num
      |        AND existing.order_id = new_rows.order_id
      |)""".stripMargin

  /** reference README.md:300-341 — duplicate check on (id, order_id). */
  val insertOrderItems: String =
    """INSERT INTO clean_orders_items (
      |    id,
      |    order_id,
      |    user_id,
      |    days_since_prior_order,
      |    product_id,
      |    add_to_cart_order,
      |    reordered,
      |    order_timestamp,
      |    date
      |)
      |SELECT t.*
      |FROM (
      |    VALUES
      |        (1, 2771, 10500, 1726, 17, 991, 0, TIMESTAMP '2025-04-02 10:25:00', DATE '2025-04-02'),
      |        (2, 2772, 10500, 1726, 29, 490, 1, TIMESTAMP '2025-04-02 10:25:00', DATE '2025-04-02'),
      |        (3, 2774, 10500, 1726, 29, 123, 0, TIMESTAMP '2025-04-02 10:25:00', DATE '2025-04-02')
      |) AS t(
      |    id,
      |    order_id,
      |    user_id,
      |    days_since_prior_order,
      |    product_id,
      |    add_to_cart_order,
      |    reordered,
      |    order_timestamp,
      |    date
      |)
      |WHERE NOT EXISTS (
      |    SELECT 1
      |    FROM clean_orders_items co
      |    WHERE co.id = t.id
      |      AND co.order_id = t.order_id
      |)""".stripMargin

  /** reference README.md:352-377 — duplicate check on product_id. */
  val insertProducts: String =
    """INSERT INTO clean_products (
      |    product_id,
      |    department_id,
      |    product_name,
      |    department
      |)
      |SELECT t.*
      |FROM (
      |    VALUES
      |        (1, 14, 'Product_14_Job', 'Home'),
      |        (2, 97, 'Product_97_Charge', 'Home'),
      |        (3, 229, 'Product_229_Listen', 'Home'),
      |        (4, 245, 'Product_245_Strategy', 'Home'),
      |        (5, 254, 'Product_254_Information', 'Home')
      |) AS t(
      |    product_id,
      |    department_id,
      |    product_name,
      |    department
      |)
      |WHERE NOT EXISTS (
      |    SELECT 1
      |    FROM clean_products p
      |    WHERE p.product_id = t.product_id
      |)""".stripMargin

  val all: Seq[String] = Seq(insertProducts, insertOrders, insertOrderItems)

  /** Run the whole corpus; returns rows inserted per statement (in `all`
    * order) by observing table counts — the corpus itself has no output.
    */
  def runAll(spark: SparkSession): Seq[Long] = {
    val tables = Seq("clean_products", "clean_orders", "clean_orders_items")
    all.zip(tables).map { case (stmt, table) =>
      val before = spark.table(table).count()
      spark.sql(stmt)
      spark.table(table).count() - before
    }
  }
}
