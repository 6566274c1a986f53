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

  test("a small wall under MinSeconds/allowance skips — the ratio is overhead") {
    // 0.05 s → 1.5 s is 30× of CONSTANTS (fixed per-query overhead),
    // not complexity; the two-sided guard skips it explicitly
    val r = ScaleCheck.check(
      bench(0.1, "qconst" -> 0.05), bench(1.0, "qconst" -> 1.5))
    assert(r.rows.head.status === "SKIP (small-side noise-dominated)")
    assert(r.violations.isEmpty)
    // …but a small wall AT the floor with an out-of-class big wall fails
    val r2 = ScaleCheck.check(
      bench(0.1, "qbad" -> 0.2), bench(1.0, "qbad" -> 12.0))
    assert(r2.violations.map(_.name) === Seq("qbad"))
  }

  private def benchB(sf: Double, qs: (String, Double, Long)*): String =
    s"""{"metric":"battery_sec","value":${qs.map(_._2).sum},"unit":"sec",""" +
      s""""queries":{${qs.map { case (n, t, _) => s""""$n":$t""" }.mkString(",")}},""" +
      s""""shuffle_write_bytes":{${
        qs.map { case (n, _, b) => s""""$n":$b""" }.mkString(",")}},""" +
      s""""sf":$sf}"""

  test("the shuffle-bytes gate fails a lost broadcast the wall gate missed") {
    val mb = 1L << 20
    // wall in class both queries; qlost's shuffle grew 120× (a lost
    // broadcast page-cached into wall invisibility)
    val small = benchB(0.1, ("qok", 2.0, 100 * mb), ("qlost", 2.0, 20 * mb))
    val big = benchB(1.0, ("qok", 12.0, 700 * mb), ("qlost", 12.0, 2400 * mb))
    val r = ScaleCheck.check(small, big)
    val byName = r.rows.map(x => x.name -> x).toMap
    assert(byName("qok").status === "ok")
    assert(byName("qok").bStatus === "ok")
    assert(byName("qlost").status === "ok")
    assert(byName("qlost").bStatus === "FAIL")
    assert(r.violations.map(_.name) === Seq("qlost"))
  }

  test("bytes gate: floor skip, clamped denominator, and wall-only degrade") {
    val mb = 1L << 20
    // under the 64 MiB big-side floor → movement is not a scale risk
    val r1 = ScaleCheck.check(
      benchB(0.1, ("qtinyb", 2.0, 0)), benchB(1.0, ("qtinyb", 12.0, 32 * mb)))
    assert(r1.rows.head.bStatus.startsWith("SKIP"))
    // a legitimate broadcast→shuffle transition (absolute threshold
    // crossed at the bigger SF): 0 → 120 MiB passes via the 16 MiB
    // denominator clamp (7.5× ≤ 10×) where a raw ratio would be ∞
    val r2 = ScaleCheck.check(
      benchB(0.1, ("qcross", 2.0, 0)), benchB(1.0, ("qcross", 12.0, 120 * mb)))
    assert(r2.rows.head.bStatus === "ok")
    assert(r2.violations.isEmpty)
    // …while gigabytes-from-nothing still fails through the clamp
    val r3 = ScaleCheck.check(
      benchB(0.1, ("qlost2", 2.0, 0)), benchB(1.0, ("qlost2", 12.0, 2000 * mb)))
    assert(r3.rows.head.bStatus === "FAIL")
    // pre-r14 artifacts carry no bytes → wall-only, bStatus "-"
    val r4 = ScaleCheck.check(
      bench(0.1, "qold" -> 2.0), bench(1.0, "qold" -> 12.0))
    assert(r4.rows.head.bStatus === "-")
    assert(r4.violations.isEmpty)
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
