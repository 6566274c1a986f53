package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The custom sort-merge as-of operator vs the compositional window
  * formulation: identical results on randomized data, correct backward /
  * inclusive / no-match semantics on crafted cases, and the plan shape a
  * 100 TB run needs (AsOfJoinExec present, one exchange per side).
  */
class AsOfJoinSpec extends SparkSpec {

  private val lSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("lv", StringType, nullable = true)))
  private val rSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("rts", LongType, nullable = false),
    StructField("rv", DoubleType, nullable = true)))

  private def ldf(rows: (Long, Long, String)*) =
    frame(lSchema, rows.map(r => Row(r._1, r._2, r._3)))
  private def rdf(rows: (Long, Long, Double)*) =
    frame(rSchema, rows.map(r => Row(r._1, r._2, r._3)))

  test("backward semantics: latest right ≤ left ts, per key, inclusive") {
    val left = ldf((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "early"),
      (2L, 10L, "c"), (3L, 10L, "lonely"))
    val right = rdf((1L, 10L, 1.0), (1L, 15L, 2.0), (1L, 99L, 9.0),
      (2L, 1L, 5.0), (4L, 1L, 7.0))
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", "rts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out((1L, 10L)) === Some(1.0))  // inclusive: rts == ts matches
    assert(out((1L, 20L)) === Some(2.0))  // latest of {10, 15}
    assert(out((1L, 5L)) === None)        // nothing at or before 5
    assert(out((2L, 10L)) === Some(5.0))
    assert(out((3L, 10L)) === None)       // key absent on the right
  }

  test("custom exec ≡ window formulation on randomized data") {
    val rnd = new scala.util.Random(17)
    val left = ldf(Seq.fill(400)((rnd.nextInt(20).toLong,
      rnd.nextInt(1000).toLong, "L" + rnd.nextInt(5))): _*)
    // distinct right (k, ts) so tie-order can't differ between impls
    val right = rdf(Seq.fill(300)((rnd.nextInt(25).toLong,
      rnd.nextInt(1000).toLong, rnd.nextInt(100) / 10.0))
      .distinctBy(r => (r._1, r._2)): _*)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).sorted.toSeq
    val viaExec = canon(AsOfJoin.asof(left, right, Seq("k"), "ts", "rts"))
    val viaWindow = canon(AsOfJoin.asofViaWindow(left, right, Seq("k"), "ts", "rts"))
    assert(viaExec.size === 400)
    assert(viaExec === viaWindow)
  }

  test("self as-of (shared scan) binds correctly despite duplicate exprIds") {
    val events = ldf((1L, 10L, "x"), (1L, 20L, "y"), (1L, 30L, "z"))
    val prior = events.selectExpr("k", "ts AS rts", "lv AS prior_lv")
      .filter("rts <= 20")
    val out = AsOfJoin.asof(events, prior, Seq("k"), "ts", "rts")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(4)) null else r.getString(4))).toMap
    assert(out === Map(10L -> "x", 20L -> "y", 30L -> "y"))
  }

  test("plan shape: AsOfJoinExec with one exchange + sort per side") {
    val left = ldf((1L, 10L, "a"))
    val right = rdf((1L, 5L, 1.0))
    val plan = AsOfJoin.asof(left, right, Seq("k"), "ts", "rts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin")) // SparkPlan.nodeName strips the Exec suffix
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2)
    assert("\\bSort\\b".r.findAllIn(plan).size === 2)
  }

  test("empty right side leaves every left row unmatched") {
    val left = ldf((1L, 10L, "a"), (2L, 20L, "b"))
    val out = AsOfJoin.asof(left, rdf(), Seq("k"), "ts", "rts").collect()
    assert(out.length === 2)
    assert(out.forall(_.isNullAt(4)))
  }

  test("missing column names fail fast with a helpful message") {
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(ldf((1L, 1L, "a")), rdf((1L, 1L, 1.0)), Seq("nope"), "ts", "rts")
    }
    assert(e.getMessage.contains("'nope'") && e.getMessage.contains("left"))
  }

  private def matches(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Option[Double]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap

  test("forward semantics: earliest right ≥ left ts, inclusive, per key") {
    val left = ldf((1L, 10L, "a"), (1L, 16L, "b"), (1L, 100L, "late"),
      (2L, 10L, "c"))
    val right = rdf((1L, 10L, 1.0), (1L, 15L, 2.0), (1L, 99L, 9.0),
      (2L, 1L, 5.0))
    val out = matches(AsOfJoin.asof(left, right, Seq("k"), "ts", "rts",
      direction = "forward"))
    assert(out((1L, 10L)) === Some(1.0))  // inclusive: rts == ts matches
    assert(out((1L, 16L)) === Some(9.0))  // earliest of {99}
    assert(out((1L, 100L)) === None)      // nothing at or after 100
    assert(out((2L, 10L)) === None)       // only past rows for key 2
  }

  test("forward: consecutive lefts can reuse one pending right row") {
    val left = ldf((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"))
    val right = rdf((1L, 50L, 7.0))
    val out = matches(AsOfJoin.asof(left, right, Seq("k"), "ts", "rts",
      direction = "forward"))
    assert(out.values.toSeq === Seq(Some(7.0), Some(7.0), Some(7.0)))
  }

  test("nearest semantics: closer side wins, ties go backward") {
    val left = ldf((1L, 10L, "a"), (1L, 20L, "tie"), (1L, 40L, "c"))
    val right = rdf((1L, 15L, 1.0), (1L, 25L, 2.0), (1L, 90L, 9.0))
    val out = matches(AsOfJoin.asof(left, right, Seq("k"), "ts", "rts",
      direction = "nearest"))
    assert(out((1L, 10L)) === Some(1.0))  // only forward candidate (Δ5)
    assert(out((1L, 20L)) === Some(1.0))  // Δ5 both ways → backward wins
    assert(out((1L, 40L)) === Some(2.0))  // Δ15 back vs Δ50 fwd
  }

  test("tolerance bounds the match distance in every direction") {
    val left = ldf((1L, 100L, "a"))
    val right = rdf((1L, 80L, 1.0), (1L, 130L, 2.0))
    def run(dir: String, tol: Long) = matches(AsOfJoin.asof(
      left, right, Seq("k"), "ts", "rts", dir, Some(tol)))((1L, 100L))
    assert(run("backward", 20L) === Some(1.0))
    assert(run("backward", 19L) === None)
    assert(run("forward", 30L) === Some(2.0))
    assert(run("forward", 29L) === None)
    assert(run("nearest", 50L) === Some(1.0))  // Δ20 back beats Δ30 fwd
    assert(run("nearest", 25L) === Some(1.0))  // fwd out of tolerance
    assert(run("nearest", 19L) === None)       // both out of tolerance
  }

  test("all directions ≡ brute force on randomized data, with tolerance") {
    val rnd = new scala.util.Random(29)
    val lRows = Seq.fill(300)((rnd.nextInt(15).toLong,
      rnd.nextInt(500).toLong, "L"))
    val rRows = Seq.fill(200)((rnd.nextInt(18).toLong,
      rnd.nextInt(500).toLong, rnd.nextInt(1000) / 10.0))
      .distinctBy(r => (r._1, r._2))
    val left = ldf(lRows: _*)
    val right = rdf(rRows: _*)
    val byKey = rRows.groupBy(_._1)
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(40L))) {
      val got = matches(AsOfJoin.asof(left, right, Seq("k"), "ts", "rts",
        dir, tol))
      lRows.foreach { case (k, ts, _) =>
        val cands = byKey.getOrElse(k, Nil)
        val back = cands.filter(r => r._2 <= ts && tol.forall(ts - r._2 <= _))
          .sortBy(_._2).lastOption
        val fwd = cands.filter(r => r._2 >= ts && tol.forall(r._2 - ts <= _))
          .sortBy(_._2).headOption
        val want = dir match {
          case "backward" => back
          case "forward" => fwd
          case "nearest" => (back, fwd) match {
            case (Some(b), Some(f)) =>
              if (ts - b._2 <= f._2 - ts) Some(b) else Some(f)
            case (b, f) => b.orElse(f)
          }
        }
        assert(got((k, ts)) === want.map(_._3),
          s"dir=$dir tol=$tol key=$k ts=$ts")
      }
    }
  }

  test("column pruning reaches the parquet scans under an as-of join") {
    import org.apache.spark.sql.functions.lit
    val root = tmpDir("asof-prune")
    ldf((1L, 10L, "a")).withColumn("l_unused", lit("x" * 100))
      .write.parquet(s"$root/l")
    rdf((1L, 5L, 1.0)).withColumn("r_unused", lit("y" * 100))
      .write.parquet(s"$root/r")
    val out = AsOfJoin.asof(
        spark.read.parquet(s"$root/l"), spark.read.parquet(s"$root/r"),
        Seq("k"), "ts", "rts")
      .select("k", "ts", "rv") // touches neither *_unused column
    assert(out.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq ===
      Seq((1L, 1.0)))
    // post-execution plan (through AQE): the scans' ReadSchema must not
    // contain the untouched payload columns
    val plan = out.queryExecution.executedPlan.toString
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toSeq
    assert(readSchemas.size >= 2, s"expected file scans in:\n$plan")
    assert(readSchemas.forall(s => !s.contains("l_unused") &&
      !s.contains("r_unused") && !s.contains("lv")),
      s"unpruned scan columns: $readSchemas")
  }

  test("nearest on a non-integral ts type fails fast") {
    val l = ldf((1L, 1L, "a")).selectExpr("k", "CAST(ts AS STRING) AS ts", "lv")
    val r = rdf((1L, 1L, 1.0)).selectExpr("k", "CAST(rts AS STRING) AS rts", "rv")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, r, Seq("k"), "ts", "rts", direction = "nearest")
    }
    assert(e.getMessage.contains("integral"))
  }
}
