package graft.tools

/** Standing scale-regression gate (VERDICT r12 item 3): the per-query
  * decade-ratio analysis SCALING.md used to hand-write each round,
  * promoted to a tool that FAILS — so the next composition-cost bug
  * (q141's 4× stage-recompute, r11's interpreted ZORDER quantile) is
  * caught by an exit code, not by a human reading two JSON files.
  *
  * Usage: ScaleCheck <bench_small.json> <bench_big.json>
  *
  * Reads two `graft.Bench` artifacts (their `sf` fields establish how
  * many decades apart they are), computes each common query's wall
  * ratio, and compares it against the query's DECLARED complexity class:
  *
  *   - `Linear(ceiling)` — default `Linear(10)`: at one decade (10×
  *     data) the wall may grow at most `ceiling`×; across `d` decades
  *     the allowance compounds to `ceiling^d`. A correctly linear query
  *     sits well under its ceiling (sublinear constants amortize); AT
  *     the ceiling is already suspicious, above it is a failure.
  *   - `Exempt(reason)` — the quadratic-BY-CONTRACT tier and the
  *     in-battery quadratic baselines: their ~100×/decade model is
  *     documented and confirmed (r11 sf2 probe, r12 sf10 campaign);
  *     ratio enforcement is meaningless for them.
  *
  * Queries faster than `MinSeconds` in the BIG artifact are skipped as
  * noise-dominated (a 0.2 s query's ratio measures JVM scheduling, not
  * complexity), as are queries whose SMALL wall is under
  * `MinSeconds / allowance` (there the ratio measures fixed overhead) —
  * skipped ≠ passed, and the report says which.
  *
  * When the artifacts carry `shuffle_write_bytes` (graft.Bench r14+),
  * each query's byte decade-ratio is gated by the SAME declared class:
  * locally the page cache hides exchange cost (merge planner: 1.28×
  * wall, 203× bytes), so a lost broadcast or a surplus exchange can
  * pass the wall gate while costing the cluster the table — the bytes
  * gate fails it anyway. Artifacts without bytes degrade to wall-only.
  *
  * Exit code 1 on any violation; stdout is the SCALING.md-ready table.
  */
object ScaleCheck {

  sealed trait ScaleClass
  final case class Linear(ceiling: Double) extends ScaleClass
  final case class Exempt(reason: String) extends ScaleClass

  /** Below this wall time (seconds) in the big artifact, a ratio is
    * constants/noise, not complexity.
    */
  val MinSeconds: Double = 1.0

  /** Shuffle-byte gate (VERDICT r13 item 2 — wall hides exchange cost
    * locally, bytes don't): below this in the BIG artifact the query's
    * data movement is not a scale risk, skip. The SMALL side is clamped
    * to [[ShuffleClampBytes]] instead of skipped: a query that
    * broadcast at the small SF and legitimately crossed the ABSOLUTE
    * auto-broadcast threshold at the big SF divides by ~zero — the
    * clamp lets that transition pass while a real lost broadcast
    * (gigabytes from nothing) still fails.
    */
  val MinShuffleBytes: Long = 64L << 20
  val ShuffleClampBytes: Long = 16L << 20

  /** The declared-class table, keyed by the `qNN` prefix (artifacts name
    * queries `q57_merge_versioned` builder-side and `q57` driver-side —
    * both resolve). Every query not named here is `Linear(10)` — the
    * default contract of the battery: one decade of data may cost at
    * most one decade of wall. Named entries either tighten the ceiling
    * or exempt the documented quadratic tier.
    */
  val classes: Map[String, ScaleClass] = Map(
    // quadratic BY CONTRACT (edit-distance precision tier; scale path is
    // q138) — confirmed ~100×/decade at sf2 (SCALING.md r11 §3f)
    "q46" -> Exempt("quadratic-by-contract (edit distance)"),
    "q47" -> Exempt("quadratic-by-contract (edit distance)"),
    "q133" -> Exempt("quadratic-by-contract (edit distance)"),
    // in-battery quadratic-by-design baselines beside their banded twins
    "q27" -> Exempt("quadratic baseline (vs q24/q138 banded)"),
    "q86" -> Exempt("quadratic baseline (vs banded ANN tiers)"),
    // salted-join demo: linear but shuffle-heavy; measured 8.6× at
    // decade2 (r12) — the default ceiling, stated for documentation
    "q37" -> Linear(10),
    // commit-bound family: wall tracks versioned-commit machinery
    // (merges/updates rewriting ×10 slices), measured 5.7–8.2× at
    // decade2 (r12/r13)
    "q57" -> Linear(8),
    "q145" -> Linear(8),
    "q146" -> Linear(8),
    "q148" -> Linear(8),
    // q149 = q146's window + a full re-ANALYZE: same commit-bound family
    "q149" -> Linear(8))

  /** BYTES-ONLY class overrides (the wall class above still binds).
    * Shuffle-byte ratio is not a complexity measure for queries whose
    * plans cross ABSOLUTE or FRACTIONAL thresholds between scales by
    * design — the crossing adds or removes a whole exchange once:
    *
    *   - q37: the salted-join demo's dims fit under auto-broadcast at
    *     sf0.1 (0 shuffle) and legitimately exchange from sf1 on —
    *     measured 12.3× at the crossing decade, 9.7× (in class) after.
    *   - q145/q148: the stats planner itself broadcasts the ~0.3M-key
    *     update set at sf0.1 (9.6 MB < threshold) and correctly refuses
    *     the 3M-key set at sf1 — 11.7×/17.5× at the crossing decade,
    *     8.7×/10.5× after.
    *   - q146/q149: the commit chain's INTERNAL joins (the DV
    *     anti-join inside deleteVectors, the snapshot net-diff join
    *     inside analyzeIncremental) cross the same absolute threshold
    *     one decade later — phase-measured at sf1→sf10: deleteVectors
    *     0 → 254 MB, changes-feed 235 → 4,658 MB (19.8×), every other
    *     phase 1–10× linear. Each crossing adds ~one table-image
    *     exchange exactly once.
    *   - q25/q135: the SAME crossing class, mis-diagnosed in r14 as
    *     fixture-driven bucket densification ("pairs ~SF²") and
    *     re-measured in r15: gram buckets are provably scale-stable
    *     (trigram Σcnt² = 100.01× at 100× data; cross-replica shingle
    *     disjointness is ScaleGenSpec-pinned, so no perturbed-replica
    *     fixture mode is needed — the affine cipher IS the
    *     perturbation), and the byte growth is their internal
    *     posting/sizes/vocab joins flipping broadcast→sort-merge
    *     mid-decade (plan-measured sf1→sf10: q25 3×BHJ→3×SMJ,
    *     27 MB→1,650 MB; q135 5×BHJ→5×SMJ, 100 MB→2,100 MB). Beyond
    *     the crossing the bytes are linear in data.
    *
    * All seven stay wall-gated (measured 1.3–4.2×/decade, in class);
    * the byte gate remains armed for the other queries, where a lost
    * broadcast has no such documented crossing to hide behind.
    */
  val bytesClasses: Map[String, ScaleClass] = Map(
    // r16: the small-image packing exchange (ParquetTable.sizedForWrite,
    // OPTIMIZATION_r16.md change 2) moves the image bytes it writes and
    // fires only under the 32 MiB bar — q57's merge image sits under the
    // bar at sf0.1 and above it at sf1, so the packing bytes appear in
    // the denominator decade and not the numerator (measured 2.7 MB base
    // + ~7 MB packing at sf0.1 vs 122 MB native at sf1 → 10.3×). The
    // same absolute-threshold crossing class as the broadcast entries
    // below; wall stays gated and in class.
    "q57" -> Exempt("small-image packing exchange fires below the 32 MiB bar only at sf0.1; linear after the crossing"),
    "q25" -> Exempt("posting/sizes joins cross auto-broadcast mid-decade; buckets scale-stable"),
    "q135" -> Exempt("vocab-table joins cross auto-broadcast mid-decade; buckets scale-stable"),
    "q37" -> Exempt("auto-broadcast crossing at sf0.1→sf1; linear after"),
    "q145" -> Exempt("stats-planner key-set broadcast crossing; linear after"),
    "q148" -> Exempt("stats-planner key-set broadcast crossing; linear after"),
    "q146" -> Exempt("DV/changes-feed internal joins cross auto-broadcast mid-decade"),
    "q149" -> Exempt("DV/changes-feed internal joins cross auto-broadcast mid-decade"))

  private def declaredClass(name: String): ScaleClass =
    classes.getOrElse(name.takeWhile(_ != '_'), Linear(10))

  private def declaredBytesClass(name: String, wall: ScaleClass): ScaleClass =
    bytesClasses.getOrElse(name.takeWhile(_ != '_'), wall)

  final case class Row(name: String, tSmall: Double, tBig: Double,
      ratio: Double, allowed: Option[Double], status: String,
      bSmall: Option[Long] = None, bBig: Option[Long] = None,
      bRatio: Option[Double] = None, bStatus: String = "-",
      // the BYTE class's own allowance (ADVICE r14: the violation line
      // must print the bound the bytes were judged against, which a
      // future Linear bytes override can set apart from wall's)
      bAllowed: Option[Double] = None)

  final case class Report(decades: Double, rows: Seq[Row]) {
    def violations: Seq[Row] =
      rows.filter(r => r.status == "FAIL" || r.bStatus == "FAIL")
    def table: String = {
      val header =
        "| query | small s | big s | ratio | allowed | status " +
          "| shW small MB | shW big MB | shW ratio | shW status |\n" +
        "|---|---|---|---|---|---|---|---|---|---|"
      def mb(b: Option[Long]) = b.map(v => f"${v / 1048576.0}%.1f").getOrElse("-")
      val body = rows.map { r =>
        val allowed = r.allowed.map(a => f"$a%.1fx").getOrElse("-")
        val br = r.bRatio.map(x => f"$x%.2fx").getOrElse("-")
        f"| ${r.name} | ${r.tSmall}%.2f | ${r.tBig}%.2f | ${r.ratio}%.2fx " +
          f"| $allowed | ${r.status} " +
          s"| ${mb(r.bSmall)} | ${mb(r.bBig)} | $br | ${r.bStatus} |"
      }.mkString("\n")
      s"$header\n$body"
    }
  }

  /** Minimal extractor for the Bench artifact's flat shape — no JSON
    * library in the dependency set (and none needed: `queries` is a
    * flat string→number object and `sf` a number).
    */
  /** Flat numeric `"name"` object extractor (no JSON library in the
    * dependency set, and none needed): the content of `"key": { … }`.
    */
  private def flatObject(json: String, key: String): Option[Map[String, Double]] = {
    val kStart = json.indexOf("\"" + key + "\"")
    if (kStart < 0) return None
    val braceStart = json.indexOf('{', kStart)
    var depth = 0; var i = braceStart; var end = -1
    while (end < 0 && i < json.length) {
      json.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) end = i
        case _ =>
      }
      i += 1
    }
    require(end > braceStart, s"bench json: unterminated $key object")
    val obj = json.substring(braceStart + 1, end)
    val entry = """"([^"]+)"\s*:\s*([0-9.Ee+-]+)""".r
    Some(entry.findAllMatchIn(obj).map(m => m.group(1) -> m.group(2).toDouble).toMap)
  }

  private[tools] def parseBench(
      json: String): (Double, Map[String, Double], Map[String, Long]) = {
    // `sf` is a number in synthetic artifacts and an sf-dir PATH in the
    // committed ones ("/tmp/graft_testdata/sf10") — accept both
    val sf = """"sf"\s*:\s*([0-9.Ee+-]+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toDouble)
      .orElse(""""sf"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(json).flatMap(m =>
        """sf([0-9]+(?:\.[0-9]+)?)""".r.findFirstMatchIn(m.group(1))
          .map(_.group(1).toDouble)))
      .getOrElse(throw new IllegalArgumentException("bench json: no sf field"))
    val queries = flatObject(json, "queries")
      .getOrElse(throw new IllegalArgumentException("bench json: no queries object"))
    // shuffle bytes entered the artifact in r14 — absent in older ones,
    // and the gate degrades to wall-only for those pairs
    val bytes = flatObject(json, "shuffle_write_bytes")
      .getOrElse(Map.empty).map { case (k, v) => k -> v.toLong }
    (sf, queries, bytes)
  }

  def check(smallJson: String, bigJson: String): Report = {
    val (sfSmall, small, bytesSmall) = parseBench(smallJson)
    val (sfBig, big, bytesBig) = parseBench(bigJson)
    require(sfBig > sfSmall,
      s"scaleCheck: big artifact sf=$sfBig is not above small sf=$sfSmall")
    val decades = math.log10(sfBig / sfSmall)
    val rows = small.keySet.intersect(big.keySet).toSeq.sorted.map { name =>
      val (ts, tb) = (small(name), big(name))
      val ratio = if (ts > 0) tb / ts else Double.PositiveInfinity
      val (bs, bb) = (bytesSmall.get(name), bytesBig.get(name))
      declaredClass(name) match {
        case Exempt(reason) =>
          Row(name, ts, tb, ratio, None, s"EXEMPT ($reason)", bs, bb,
            bStatus = if (bs.isDefined && bb.isDefined) "EXEMPT" else "-")
        case Linear(ceiling) =>
          val allowed = math.pow(ceiling, decades)
          // noise guard is TWO-sided (ADVICE r13): a big wall under
          // MinSeconds is noise, and a SMALL wall under MinSeconds /
          // allowance makes the ratio measure fixed overhead, not
          // complexity (0.05 s → 1.5 s is 30× of constants) — either
          // side skips, explicitly, never silently passes
          val status =
            if (tb < MinSeconds) "SKIP (noise-dominated)"
            else if (ts < MinSeconds / allowed) "SKIP (small-side noise-dominated)"
            else if (ratio <= allowed) "ok"
            else "FAIL"
          // the bytes gate: same allowance (linear data → at most
          // linear movement), clamped denominator (see ShuffleClampBytes),
          // with the documented threshold-crossers bytes-exempt
          val (bRatio, bStatus, bAllowed) = (bs, bb) match {
            case (Some(s), Some(b)) =>
              val r = b.toDouble / math.max(s, ShuffleClampBytes).toDouble
              declaredBytesClass(name, Linear(ceiling)) match {
                case Exempt(reason) =>
                  (Some(r), s"EXEMPT ($reason)", None)
                case Linear(bc) =>
                  val ba = math.pow(bc, decades)
                  val st =
                    if (b < MinShuffleBytes) "SKIP (below byte floor)"
                    else if (r <= ba) "ok"
                    else "FAIL"
                  (Some(r), st, Some(ba))
              }
            case _ => (None, "-", None)
          }
          Row(name, ts, tb, ratio, Some(allowed), status, bs, bb, bRatio,
            bStatus, bAllowed)
      }
    }
    Report(decades, rows)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleCheck <bench_small.json> <bench_big.json>")
    val read = (p: String) =>
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
        java.nio.charset.StandardCharsets.UTF_8)
    val report = check(read(args(0)), read(args(1)))
    println(f"ScaleCheck: ${report.decades}%.2f decade(s) apart, " +
      s"${report.rows.size} common queries, ${report.violations.size} violation(s)")
    println()
    println(report.table)
    if (report.violations.nonEmpty) {
      System.err.println(report.violations.map { r =>
        val wall = if (r.status == "FAIL")
          f"wall ${r.ratio}%.2fx > ${r.allowed.get}%.1fx" else ""
        val bytes = if (r.bStatus == "FAIL")
          f"shuffle ${r.bRatio.get}%.2fx > ${r.bAllowed.get}%.1fx" else ""
        s"OUT OF CLASS: ${r.name} ${Seq(wall, bytes).filter(_.nonEmpty).mkString("; ")}"
      }.mkString("\n"))
      sys.exit(1)
    }
  }
}
