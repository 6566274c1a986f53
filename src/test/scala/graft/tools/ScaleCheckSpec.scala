package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The standing scale gate: declared-class ratio enforcement over two
  * bench artifacts (no Spark involved — pure JSON-in, verdict-out).
  */
class ScaleCheckSpec extends AnyFunSuite {

  private def bench(sf: Double, qs: (String, Double)*): String =
    s"""{"metric":"battery_sec","value":${qs.map(_._2).sum},"unit":"sec",""" +
      s""""queries":{${qs.map { case (n, t) => s""""$n":$t""" }.mkString(",")}},""" +
      s""""sf":$sf}"""

  test("in-class queries pass, out-of-class fail, across one decade") {
    val small = bench(0.1, "q01_agg" -> 1.0, "q99_bad" -> 2.0)
    val big = bench(1.0, "q01_agg" -> 6.0, "q99_bad" -> 45.0)
    val r = ScaleCheck.check(small, big)
    assert(r.decades === 1.0)
    val byName = r.rows.map(x => x.name -> x).toMap
    assert(byName("q01_agg").status === "ok")      // 6× ≤ 10×
    assert(byName("q99_bad").status === "FAIL")    // 22.5× > 10×
    assert(r.violations.map(_.name) === Seq("q99_bad"))
  }

  test("the allowance compounds across two decades") {
    val small = bench(0.1, "qx" -> 1.0)
    val big = bench(10.0, "qx" -> 80.0) // 80× over 2 decades ≤ 10² = 100
    assert(ScaleCheck.check(small, big).violations.isEmpty)
    val big2 = bench(10.0, "qx" -> 130.0) // 130× > 100×
    assert(ScaleCheck.check(small, big2).violations.map(_.name) === Seq("qx"))
  }

  test("the quadratic tier is exempt, tightened classes bind") {
    val small = bench(0.1,
      "q46_editdist_block" -> 1.0, "q57_merge_versioned" -> 1.0)
    val big = bench(1.0,
      "q46_editdist_block" -> 95.0, "q57_merge_versioned" -> 9.0)
    val r = ScaleCheck.check(small, big)
    val byName = r.rows.map(x => x.name -> x).toMap
    assert(byName("q46_editdist_block").status.startsWith("EXEMPT"))
    // q57's declared commit-bound ceiling is 8×, so 9× fails where the
    // default 10× would have passed
    assert(byName("q57_merge_versioned").status === "FAIL")
  }

  test("noise-dominated queries are skipped, and say so") {
    val small = bench(0.1, "qtiny" -> 0.02)
    val big = bench(1.0, "qtiny" -> 0.5) // 25× ratio but 0.5 s wall
    val r = ScaleCheck.check(small, big)
    assert(r.rows.head.status.startsWith("SKIP"))
    assert(r.violations.isEmpty)
  }

  test("artifacts in the wrong order and malformed json are refused") {
    intercept[IllegalArgumentException] {
      ScaleCheck.check(bench(1.0, "q" -> 1.0), bench(0.1, "q" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      ScaleCheck.check("""{"nope":1}""", bench(1.0, "q" -> 1.0))
    }
  }

  test("the latest committed artifact pair reports zero violations") {
    // glob the NEWEST round's (sf0.1, sf1) pair so this gate keeps
    // checking every future campaign without edits
    def latest(prefix: String): Option[java.io.File] =
      Option(new java.io.File(".").listFiles()).toSeq.flatten
        .filter(f => f.getName.matches(s"${prefix}_r\\d+\\.json"))
        .sortBy(f => f.getName.replaceAll("\\D", "").toInt).lastOption
    val pair = for (a <- latest("BENCH_SF01"); b <- latest("BENCH_SF1"))
      yield (a, b)
    assume(pair.isDefined)
    val read = (f: java.io.File) => new String(
      java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val r = ScaleCheck.check(read(pair.get._1), read(pair.get._2))
    assert(r.rows.nonEmpty)
    assert(r.violations.isEmpty,
      r.violations.map(_.name).mkString("violations: ", ", ", ""))
  }
}
