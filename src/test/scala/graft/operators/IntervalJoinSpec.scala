package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Grid-bucketed interval overlap join vs a brute-force nested loop:
  * same pair set, each pair exactly once, across seeded random interval
  * batches whose lengths straddle the cell size (so multi-cell
  * replication and the exactly-once anchor filter are both exercised).
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(
      ls: Seq[(Long, Long, Long)], rs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (lid, s1, e1) <- ls; (rid, s2, e2) <- rs
      if s1 < e1 && s2 < e2 && s1 < e2 && s2 < e1
    } yield (lid, rid)).toSet

  test("property: equals brute force, each pair once (3 seeded batches)") {
    for (seed <- Seq(7L, 21L, 99L)) {
      val rnd = new scala.util.Random(seed)
      def gen(n: Int, offset: Long) = (0 until n).map { i =>
        val s = rnd.nextLong(1000L)
        // lengths 1..120 against cellSize 40: many intervals span 2-4 cells
        (offset + i, s, s + 1 + rnd.nextLong(120L))
      }
      val ls = gen(120, 0L)
      val rs = gen(120, 10000L)
      val got = IntervalJoin.overlap(
          ls.toDF("lid", "ls", "le"), "ls", "le",
          rs.toDF("rid", "rs", "re"), "rs", "re", cellSize = 40L)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"seed $seed: duplicate pairs")
      assert(got.toSet === brute(ls, rs), s"seed $seed: pair set differs")
    }
  }

  test("keyed overlap: only same-key intervals pair; still equals brute force") {
    val rnd = new scala.util.Random(13L)
    def gen(n: Int, off: Long) = (0 until n).map { i =>
      val s = rnd.nextLong(500L)
      (off + i, s"u${rnd.nextInt(5)}", s, s + 1 + rnd.nextLong(80L))
    }
    val ls = gen(100, 0L); val rs = gen(100, 10000L)
    val got = IntervalJoin.overlap(
        ls.toDF("lid", "luser", "ls", "le"), "ls", "le",
        rs.toDF("rid", "ruser", "rs", "re"), "rs", "re",
        cellSize = 32L, keys = Seq(("luser", "ruser")))
      .select("lid", "rid").as[(Long, Long)].collect()
    val want = (for {
      (lid, lu, s1, e1) <- ls; (rid, ru, s2, e2) <- rs
      if lu == ru && s1 < e2 && s2 < e1
    } yield (lid, rid)).toSet
    assert(got.length === got.toSet.size, "duplicate pairs")
    assert(got.toSet === want)
    // unknown key column is refused with guidance
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.overlap(
        ls.toDF("lid", "luser", "ls", "le"), "ls", "le",
        rs.toDF("rid", "ruser", "rs", "re"), "rs", "re",
        32L, keys = Seq(("nope", "ruser")))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("touching endpoints do not overlap; empty intervals match nothing") {
    val l = Seq((1L, 0L, 10L), (2L, 50L, 50L)).toDF("lid", "ls", "le")
    val r = Seq((10L, 10L, 20L), (11L, 5L, 6L), (12L, 40L, 60L))
      .toDF("rid", "rs", "re")
    val got = IntervalJoin.overlap(l, "ls", "le", r, "rs", "re", 8L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    // 1-10: touches at 10 (no), contains [5,6) (yes); 2 is empty (no)
    assert(got === Set((1L, 11L)))
  }

  test("an interval spanning more than maxCells cells fails fast, never truncates") {
    val l = Seq((1L, 0L, 1000L)).toDF("lid", "ls", "le")
    val r = Seq((2L, 5L, 6L)).toDF("rid", "rs", "re")
    val e = intercept[Exception] {
      IntervalJoin.overlap(l, "ls", "le", r, "rs", "re",
        cellSize = 10L, maxCells = 4).collect()
    }
    assert(e.getMessage.contains("spans more than 4 cells") ||
      Option(e.getCause).exists(_.getMessage.contains("spans more than 4 cells")))
  }

  test("colliding column names are refused with guidance") {
    val l = Seq((1L, 0L, 10L)).toDF("id", "s", "e")
    val r = Seq((2L, 0L, 10L)).toDF("id", "rs", "re")
    val err = intercept[IllegalArgumentException] {
      IntervalJoin.overlap(l, "s", "e", r, "rs", "re", 10L)
    }
    assert(err.getMessage.contains("id"))
  }

  test("plan is a shuffle equi-join on the cell key, not a nested loop") {
    val l = (0L until 200L).map(i => (i, i * 3, i * 3 + 10)).toDF("lid", "ls", "le")
    val r = (0L until 200L).map(i => (i + 1000, i * 3 + 5, i * 3 + 15))
      .toDF("rid", "rs", "re")
    val plan = IntervalJoin.overlap(l, "ls", "le", r, "rs", "re", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"grid join must plan as an equi-join:\n$plan")
  }
}
