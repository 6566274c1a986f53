package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int, h: Int = 0) =
    Timestamp.valueOf(f"2024-01-${d}%02d ${h}%02d:00:00")

  // key 1: days 1, 1 (second obs same day), 4 → grid 1..4, days 2-3 filled
  // key 2: single day → 1-row grid, nothing to fill
  private lazy val obs = Seq(
    (1L, day(1, 3), 10.0), (1L, day(1, 20), 5.0), (1L, day(4), 7.0),
    (2L, day(9), 2.0)
  ).toDF("k", "ts", "v")

  test("grid spans min..max per key; same-bucket values aggregate; gaps forward-fill") {
    val out = GapFill.resampleFill(obs, "k", "ts", "v").orderBy("k", "bucket")
      .select(col("k"), col("bucket").cast("string"), col("value"), col("observed"))
      .as[(Long, String, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "2024-01-01 00:00:00", 15.0, true),  // 10 + 5 summed in-bucket
      (1L, "2024-01-02 00:00:00", 15.0, false), // filled from day 1
      (1L, "2024-01-03 00:00:00", 15.0, false),
      (1L, "2024-01-04 00:00:00", 7.0, true),
      (2L, "2024-01-09 00:00:00", 2.0, true)))
  }

  test("hourly grid works through the same path") {
    val e = Seq((1L, day(1, 0), 1.0), (1L, day(1, 3), 4.0))
      .toDF("k", "ts", "v")
    val out = GapFill.resampleFill(e, "k", "ts", "v",
        unit = "hour", step = "interval 1 hour")
      .orderBy("bucket").select("value", "observed")
      .as[(Double, Boolean)].collect().toSeq
    assert(out == Seq((1.0, true), (1.0, false), (1.0, false), (4.0, true)))
  }

  test("one shuffle: observation agg, grid agg, join and fill share the key exchange") {
    val plan = GapFill.resampleFill(obs, "k", "ts", "v")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // obs agg shuffles once on (k, bucket); the per-key grid agg, the
    // join and the window re-key to (k) — at most one more exchange per
    // side. The assertion pins "no unexpected extra shuffles" (<= 3)
    // rather than an exact planner-version-dependent count.
    assert(exchanges <= 3, s"unexpected exchange count $exchanges:\n$plan")
  }
}
