package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  // user 1: view→click→purchase in order (reaches all 3)
  // user 2: click BEFORE its first view, no click after → stops at view
  // user 3: view→click, purchase BEFORE the click → stops at click
  // user 4: never views (click+purchase only) → reaches nothing
  private lazy val events = Seq(
    (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(9)),
    (2L, "click", ts(1)), (2L, "view", ts(2)),
    (3L, "view", ts(0)), (3L, "purchase", ts(3)), (3L, "click", ts(4)),
    (4L, "click", ts(1)), (4L, "purchase", ts(2))
  ).toDF("user_id", "event_type", "ts")

  private val stages = Seq("view", "click", "purchase")

  test("stage times respect ordering: stage k only at-or-after stage k-1") {
    val t = Funnel.stageTimes(events, "user_id", "event_type", "ts", stages)
      .orderBy("user_id").collect()
    val byUser = t.map(r => r.getLong(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    assert(byUser(1L) == ((ts(0), ts(5), ts(9))))
    assert(byUser(2L) == ((ts(2), null, null)))  // click at ts(1) precedes view
    assert(byUser(3L) == ((ts(0), ts(4), null))) // purchase precedes the click
    assert(byUser(4L) == ((null, null, null)))
  }

  test("analyze: counts, conversion rates, stage order") {
    val rows = Funnel.analyze(events, "user_id", "event_type", "ts", stages)
      .orderBy("stage_idx").collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(3L, 2L, 1L)) // users per stage
    assert(rows(0).getDouble(3) == 1.0)                     // view from-prev
    assert(rows(1).getDouble(3) == 0.6667)                  // click/view
    assert(rows(2).getDouble(3) == 0.5)                     // purchase/click
    assert(rows(2).getDouble(4) == 0.3333)                  // purchase overall
  }

  test("same event can satisfy the >= bound (simultaneous stage events)") {
    val e = Seq((9L, "view", ts(1)), (9L, "click", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val r = Funnel.stageTimes(e, "user_id", "event_type", "ts", Seq("view", "click"))
      .collect()(0)
    assert(r.get(1) == ts(1) && r.get(2) == ts(1))
  }

  test("one shuffle total: a single exchange feeds windows and groupBys") {
    val plan = Funnel.analyze(events, "user_id", "event_type", "ts", stages)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }
}
