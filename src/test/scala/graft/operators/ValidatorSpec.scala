package graft.operators

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.schemas.Schemas

/** Mirrors the reference's 7 validation unit tests 1:1 — same failure modes,
  * same valid/invalid counts (reference: tests/test_glue_etl.py:45-176) —
  * plus regression tests for the two reference bugs we deliberately fix
  * (multi-error accumulation, leaked helper columns; SURVEY §7).
  */
class ValidatorSpec extends SparkSpec {

  private val ts = Timestamp.valueOf("2025-04-01 10:00:00")
  private val day = Date.valueOf("2025-04-01")

  private def products(rows: Row*) = frame(Schemas.products, rows)
  private def orders(rows: Row*) = frame(Schemas.orders, rows)
  private def items(rows: Row*) = frame(Schemas.orderItems, rows)

  private val refOrders = Map("orders" ->
    orders(Row(1, 101, 1, ts, 10.0, day), Row(2, 102, 2, ts, 20.0, day)))
  private val refProducts = Map("products" ->
    products(Row(501, 1, "produce", "apple"), Row(502, 2, "dairy", "milk")))
  private val itemRefs = refOrders ++ refProducts

  // --- products (test_glue_etl.py:45-72) --------------------------------
  test("products: all valid → 2/0") {
    val r = Validator.split(products(
      Row(501, 1, "produce", "apple"),
      Row(502, 2, "dairy", "milk")), Schemas.productsSpec)
    assert(r.valid.count() === 2)
    assert(r.rejected.count() === 0)
  }

  test("products: null pk and null name rejected → 1/2") {
    val r = Validator.split(products(
      Row(501, 1, "produce", "apple"),
      Row(null, 1, "produce", "pear"),
      Row(503, 2, "dairy", null)), Schemas.productsSpec)
    assert(r.valid.count() === 1)
    assert(r.rejected.count() === 2)
  }

  // --- orders (test_glue_etl.py:77-111) ---------------------------------
  test("orders: all valid") {
    val r = Validator.split(orders(
      Row(1, 101, 1, ts, 10.0, day),
      Row(2, 102, 2, ts, 20.5, day)), Schemas.ordersSpec)
    assert(r.valid.count() === 2)
    assert(r.rejected.count() === 0)
  }

  test("orders: null order_id / null timestamp / negative and zero amount → 1/4") {
    val r = Validator.split(orders(
      Row(1, 101, 1, ts, 10.0, day),
      Row(2, null, 1, ts, 10.0, day),
      Row(3, 103, 1, null, 10.0, day),
      Row(4, 104, 1, ts, -5.0, day),
      Row(5, 105, 1, ts, 0.0, day)), Schemas.ordersSpec)
    assert(r.valid.count() === 1)
    assert(r.rejected.count() === 4)
  }

  // --- order_items (test_glue_etl.py:116-176) ---------------------------
  test("order_items: all valid with FK references") {
    val r = Validator.split(items(
      Row(1, 101, 1, 3, 501, 1, 0, ts, day),
      Row(2, 102, 2, null, 502, 2, 1, ts, day)), Schemas.orderItemsSpec, itemRefs)
    assert(r.valid.count() === 2)
    assert(r.rejected.count() === 0)
  }

  test("order_items: nulls in id/order_id/product_id/timestamp → 1/4") {
    val r = Validator.split(items(
      Row(1, 101, 1, 3, 501, 1, 0, ts, day),
      Row(null, 101, 1, 3, 501, 1, 0, ts, day),
      Row(3, null, 1, 3, 501, 1, 0, ts, day),
      Row(4, 101, 1, 3, null, 1, 0, ts, day),
      Row(5, 101, 1, 3, 501, 1, 0, null, day)), Schemas.orderItemsSpec, itemRefs)
    assert(r.valid.count() === 1)
    assert(r.rejected.count() === 4)
  }

  test("order_items: dangling order_id / product_id / both → 1/3") {
    val r = Validator.split(items(
      Row(1, 101, 1, 3, 501, 1, 0, ts, day),
      Row(2, 999, 1, 3, 501, 1, 0, ts, day),
      Row(3, 101, 1, 3, 888, 1, 0, ts, day),
      Row(4, 999, 1, 3, 888, 1, 0, ts, day)), Schemas.orderItemsSpec, itemRefs)
    assert(r.valid.count() === 1)
    assert(r.rejected.count() === 3)
  }

  // --- regressions on the reference's latent bugs -----------------------
  test("multi-error row accumulates every message (v1 string-+ bug fixed)") {
    val r = Validator.split(orders(
      Row(1, null, null, ts, -1.0, day)), Schemas.ordersSpec)
    val err = r.rejected.select(col(Validator.ErrorsCol)).head().getString(0)
    assert(err.contains("Null order_id"))
    assert(err.contains("Null user_id"))
    assert(err.contains("Invalid total_amount"))
    assert(err.split("; ").length === 3)
  }

  test("valid output has exactly the declared columns (no leaked helpers)") {
    val r = Validator.split(items(
      Row(1, 101, 1, 3, 501, 1, 0, ts, day)), Schemas.orderItemsSpec, itemRefs)
    assert(r.valid.columns.toSeq === Schemas.orderItems.fields.map(_.name).toSeq)
    assert(r.rejected.columns.toSeq ===
      Schemas.orderItems.fields.map(_.name).toSeq :+ Validator.ErrorsCol)
  }

  test("valid ∪ rejected partitions the input") {
    val in = orders(
      Row(1, 101, 1, ts, 10.0, day),
      Row(2, null, 1, ts, 10.0, day),
      Row(3, 103, 1, ts, -2.0, day))
    val r = Validator.split(in, Schemas.ordersSpec)
    assert(r.valid.count() + r.rejected.count() === in.count())
  }

  test("FK check skips null FK values (null handled by null rule only)") {
    val r = Validator.split(items(
      Row(1, null, 1, 3, 501, 1, 0, ts, day)), Schemas.orderItemsSpec, itemRefs)
    val err = r.rejected.select(col(Validator.ErrorsCol)).head().getString(0)
    assert(err === "Null order_id") // not also "Invalid order_id"
  }

  test("rejection summary orders by count desc with engine-side top-k") {
    val r = Validator.split(orders(
      Row(1, null, 1, ts, 10.0, day),
      Row(2, null, 1, ts, 10.0, day),
      Row(3, 103, 1, ts, -2.0, day)), Schemas.ordersSpec)
    val rows = Validator.rejectionSummary(r.rejected).collect()
    assert(rows.head.getString(0) === "Null order_id")
    assert(rows.head.getLong(1) === 2)
  }
}
