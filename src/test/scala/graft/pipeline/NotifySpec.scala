package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The durable notification outbox (T5): atomic single-event files,
  * idempotent redelivery, JSON escaping, and the Pipeline.run wiring —
  * success summary on the happy path, per-stage FAILURE_* plus the
  * terminal run-level failure on the sad path (the reference's SNS
  * success publish + four failure handlers, delta-lake.json:216-265).
  */
class NotifySpec extends SparkSpec {

  test("publish is idempotent per (run_id, status) and read round-trips") {
    val dir = tmpDir("outbox")
    val ev = Notify.Event("r1", "SUCCESS", "subj", "all good")
    assert(Notify.publish(dir, ev, "2026-01-01T00:00:00Z"))
    // redelivery: reports already-delivered, leaves ONE event with the
    // original timestamp
    assert(!Notify.publish(dir, ev.copy(message = "retry body"),
      "2026-01-01T00:05:00Z"))
    assert(Notify.publish(dir, ev.copy(status = "FAILURE_etl"),
      "2026-01-01T00:06:00Z"))
    val rows = Notify.read(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(3), r.getString(4)))
      .sortBy(_._2)
    assert(rows.toSeq === Seq(
      ("r1", "FAILURE_etl", "all good", "2026-01-01T00:06:00Z"),
      ("r1", "SUCCESS", "all good", "2026-01-01T00:00:00Z")))
  }

  test("event fields with JSON-hostile content round-trip") {
    val dir = tmpDir("outbox_esc")
    val msg = "line1\nline2\t\"quoted\" \\ and a ctrl:\u0001 done"
    Notify.publish(dir, Notify.Event("r2", "FAILURE_orders", "s", msg),
      "2026-01-01T00:00:00Z")
    val got = Notify.read(spark, dir).collect()(0)
    assert(got.getString(3) === msg)
  }

  test("path-hostile run ids and statuses are refused") {
    val dir = tmpDir("outbox_bad")
    intercept[IllegalArgumentException] {
      Notify.publish(dir, Notify.Event("a/b", "SUCCESS", "s", "m"), "t")
    }
    intercept[IllegalArgumentException] {
      Notify.publish(dir, Notify.Event("ok", "SUCCESS OR NOT", "s", "m"), "t")
    }
    assert(!Files.exists(Paths.get(dir, "a-b-SUCCESS.json")))
  }

  test("pipeline publishes the success summary with per-table counts") {
    val root = tmpDir("pipe_notify")
    val input = s"$root/raw"
    Files.createDirectories(Paths.get(input, "orders"))
    Files.createDirectories(Paths.get(input, "order_items"))
    Files.writeString(Paths.get(input, "products.csv"),
      "product_id,department_id,department,product_name\n501,1,produce,apple\n")
    Files.writeString(Paths.get(input, "orders", "d.csv"),
      "order_num,order_id,user_id,order_timestamp,total_amount,date\n" +
        "1,101,1,2025-04-01 10:00:00,12.5,2025-04-01\n" +
        "2,102,2,2025-04-01 11:00:00,-3.0,2025-04-01\n")
    Files.writeString(Paths.get(input, "order_items", "d.csv"),
      "id,order_id,user_id,days_since_prior_order,product_id," +
        "add_to_cart_order,reordered,order_timestamp,date\n" +
        "1,101,1,3,501,1,0,2025-04-01 10:00:00,2025-04-01\n")
    val cfg = Pipeline.Config(
      inputDir = input, outputDir = s"$root/curated",
      rejectedDir = s"$root/rejected",
      notifyDir = Some(s"$root/outbox"), runId = "nrun-1",
      clock = () => "2026-02-02T00:00:00Z")
    Pipeline.run(spark, cfg)
    val rows = Notify.read(spark, s"$root/outbox").collect()
    assert(rows.length === 1)
    assert(rows(0).getString(1) === "SUCCESS")
    assert(rows(0).getString(3).contains("orders: input=2 valid=1 rejected=1"))
    assert(rows(0).getString(4) === "2026-02-02T00:00:00Z")
    // rerun under a new run id publishes its own event; same id is a no-op
    Pipeline.run(spark, cfg)
    assert(Notify.read(spark, s"$root/outbox").count() === 1)
    Pipeline.run(spark, cfg.copy(runId = "nrun-2"))
    assert(Notify.read(spark, s"$root/outbox").count() === 2)
  }

  test("read before the first publish returns an empty frame, not an error") {
    val dir = tmpDir("outbox_unborn") + "/never_created"
    val df = Notify.read(spark, dir)
    assert(df.columns.toSeq ===
      Seq("run_id", "status", "subject", "message", "published_at"))
    assert(df.count() === 0)
  }

  test("pipeline refuses an empty runId when the outbox is enabled") {
    val root = tmpDir("pipe_notify_noid")
    val cfg = Pipeline.Config(
      inputDir = s"$root/raw", outputDir = s"$root/curated",
      rejectedDir = s"$root/rejected", notifyDir = Some(s"$root/outbox"))
    val e = intercept[IllegalArgumentException] { Pipeline.run(spark, cfg) }
    assert(e.getMessage.contains("runId"))
    // and no outbox directory materialized a stale default-id event
    assert(!Files.exists(Paths.get(s"$root/outbox")))
  }

  test("streaming consumer tails the outbox exactly once across restarts") {
    val root = tmpDir("outbox_stream")
    val outbox = s"$root/outbox"
    val sink = s"$root/seen"
    val ckpt = s"$root/ckpt"
    def drain(): Unit = {
      val q = Notify.readStream(spark, outbox)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Notify.publish(outbox, Notify.Event("s1", "SUCCESS", "a", "m1"), "t1")
    Notify.publish(outbox, Notify.Event("s2", "FAILURE_etl", "b", "m2"), "t2")
    drain()
    assert(spark.read.schema(Notify.schema).parquet(sink).count() === 2)
    // a redelivered duplicate is invisible (same file, never rewritten);
    // a NEW event is picked up by the restarted consumer exactly once
    Notify.publish(outbox, Notify.Event("s1", "SUCCESS", "a", "retry"), "t3")
    Notify.publish(outbox, Notify.Event("s3", "SUCCESS", "c", "m3"), "t4")
    drain()
    val seen = spark.read.schema(Notify.schema).parquet(sink)
    assert(seen.count() === 3)
    assert(seen.select("run_id").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("s1", "s2", "s3"))
  }

  test("pipeline failure publishes the stage handler and the terminal event") {
    val root = tmpDir("pipe_notify_fail")
    val input = s"$root/raw"
    Files.createDirectories(Paths.get(input))
    // products.csv missing entirely → the first stage throws
    val cfg = Pipeline.Config(
      inputDir = input, outputDir = s"$root/curated",
      rejectedDir = s"$root/rejected",
      notifyDir = Some(s"$root/outbox"), runId = "frun-1",
      clock = () => "2026-02-03T00:00:00Z")
    intercept[Exception] { Pipeline.run(spark, cfg) }
    val byStatus = Notify.read(spark, s"$root/outbox").collect()
      .map(r => r.getString(1) -> r.getString(3)).toMap
    assert(byStatus.keySet === Set("FAILURE_products", "FAILURE_etl"))
    assert(byStatus("FAILURE_products").nonEmpty)
  }
}
