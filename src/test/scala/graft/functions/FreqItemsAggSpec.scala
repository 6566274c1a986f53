package graft.functions

import org.apache.spark.sql.{GraftColumnBridge, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.functions.expressions.FreqItemsAgg

/** Misra-Gries heavy-hitters aggregate: exact in the distinct ≤ capacity
  * regime (merge-safe under repartition), undercount-only within
  * N/(capacity+1) beyond it, heavy hitters never dropped.
  */
class FreqItemsAggSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("tok", StringType, nullable = true)))

  private def agg(capacity: Int) = GraftColumnBridge.column(
    FreqItemsAgg(GraftColumnBridge.expression(col("tok")), capacity)
      .toAggregateExpression())

  private def sketch(toks: Seq[String], capacity: Int, parts: Int = 7): Map[String, Long] =
    frame(schema, toks.map(Row(_))).repartition(parts)
      .agg(agg(capacity).as("m")).head().getMap[String, Long](0).toMap

  test("exact when distinct items fit the capacity, any partitioning") {
    val toks = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(9)("c") ++
      Seq.fill(1)("d")
    val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 3, 13)) {
      assert(sketch(toks, capacity = 4, parts) === truth)
      assert(sketch(toks, capacity = 64, parts) === truth)
    }
  }

  test("beyond capacity: undercount-only within N/(capacity+1), heavy hitter kept") {
    // 1000 of the heavy item + 50 distinct light items × 8 each
    val toks = scala.util.Random.shuffle(
      Seq.fill(1000)("HEAVY") ++ (1 to 50).flatMap(i => Seq.fill(8)(s"light$i")))
    val n = toks.size
    val capacity = 10
    val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = sketch(toks, capacity)
    assert(est.size <= capacity)
    assert(est.contains("HEAVY"), "a heavy hitter above N/(capacity+1) must survive")
    est.foreach { case (item, c) =>
      assert(c <= truth(item), s"$item overcounted: $c > ${truth(item)}")
      assert(truth(item) - c <= n / (capacity + 1) + 1,
        s"$item undercounted beyond the MG bound")
    }
  }

  test("grouped usage: one bounded sketch per group") {
    val gschema = StructType(Seq(
      StructField("grp", StringType, nullable = false),
      StructField("tok", StringType, nullable = false)))
    val rows = Seq.fill(5)(Row("a", "x")) ++ Seq.fill(2)(Row("a", "y")) ++
      Seq.fill(3)(Row("b", "z"))
    val out = frame(gschema, rows).repartition(5)
      .groupBy("grp").agg(agg(8).as("m"))
      .collect().map(r => r.getString(0) -> r.getMap[String, Long](1).toMap).toMap
    assert(out === Map("a" -> Map("x" -> 5L, "y" -> 2L), "b" -> Map("z" -> 3L)))
  }

  test("nulls are skipped; SQL registration works") {
    val df = frame(schema, Seq(Row("x"), Row(null), Row("x"), Row("y")))
    df.createOrReplaceTempView("fi_toks")
    GraftFunctions.register(spark)
    val m = spark.sql("SELECT freq_items(tok, 8) AS m FROM fi_toks")
      .head().getMap[String, Long](0).toMap
    assert(m === Map("x" -> 2L, "y" -> 1L))
  }

  test("items beyond writeUTF's 64 KiB cap survive the partial-agg shuffle") {
    // serialize/deserialize round-trip directly (this is what the shuffle
    // runs): a >65535-byte UTF-8 item must not throw UTFDataFormatException
    val big = "x" * 70000
    val a = FreqItemsAgg(GraftColumnBridge.expression(col("tok")), 4)
    val buf = a.createAggregationBuffer()
    buf.offer(big, 3L); buf.offer("small", 2L)
    val back = a.deserialize(a.serialize(buf))
    assert(back.counts.toMap === Map(big -> 3L, "small" -> 2L))
    // and end-to-end through a real multi-partition aggregation
    val toks = Seq.fill(6)(big) ++ Seq.fill(4)("small")
    assert(sketch(toks, capacity = 4, parts = 5) ===
      Map(big -> 6L, "small" -> 4L))
  }

  test("capacity misuse raises the intended message, not an internal error") {
    frame(schema, Seq(Row("x"))).createOrReplaceTempView("fi_misuse")
    GraftFunctions.register(spark)
    // a column reference is not a literal: the builder must say so itself
    // instead of leaking an Unresolved/eval internal exception
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => String.valueOf(e.getMessage)).mkString(" | ")
    val e1 = intercept[Throwable] {
      spark.sql("SELECT freq_items(tok, length(tok)) FROM fi_misuse").collect()
    }
    assert(messages(e1).contains("must be an integer literal"), messages(e1))
    val e2 = intercept[Throwable] {
      spark.sql("SELECT freq_items(tok, NULL) FROM fi_misuse").collect()
    }
    assert(messages(e2).contains("must be an integer literal"), messages(e2))
  }
}
