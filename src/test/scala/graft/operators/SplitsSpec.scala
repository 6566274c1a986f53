package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Content-hash splits: JVM-md5 ground truth, stability invariants, and
  * boundary arithmetic.
  */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 2000L).toDF("id")

  private def jvmBucket(id: Long, seed: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$seed".getBytes("UTF-8"))
    f"${d(0) & 0xff}%02x"
  }

  test("bucket equals the JVM md5 hex prefix for every id") {
    val got = Splits.assign(ids, "id", Seq("a" -> 1.0))
      .select(col("id"), col("bucket"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 2000L).foreach { id =>
      assert(got(id) == jvmBucket(id, "0"), s"id $id")
    }
  }

  test("80/10/10 boundaries land at cd/e6 and fractions are near weights") {
    val counts = Splits.assign(
        ids, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    // 1/256 bucket granularity + 2000-id sampling noise: generous bands
    assert(counts("train") > 1500 && counts("train") < 1700, counts)
    assert(counts("val") > 130 && counts("val") < 280, counts)
    assert(counts("test") > 130 && counts("test") < 280, counts)
    // split is a pure function of bucket: every bucket maps to ONE split
    val perBucket = Splits.assign(
        ids, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("bucket").agg(count_distinct(col("split")).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(perBucket == 1L)
  }

  test("assignment is stable under corpus growth and repartitioning") {
    val half = ids.filter(col("id") < 1000)
    val a = Splits.assign(half, "id", Seq("train" -> 0.9, "test" -> 0.1))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Splits.assign(ids.repartition(7), "id",
        Seq("train" -> 0.9, "test" -> 0.1))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    a.foreach { case (id, s) => assert(b(id) == s, s"id $id moved") }
  }

  test("seed changes the assignment; weights normalize; last absorbs") {
    val s0 = Splits.assign(ids, "id", Seq("a" -> 1.0, "b" -> 1.0), seed = "0")
    val s1 = Splits.assign(ids, "id", Seq("a" -> 1.0, "b" -> 1.0), seed = "1")
    val moved = s0.select(col("id"), col("split").as("sa"))
      .join(s1.select(col("id"), col("split").as("sb")), Seq("id"))
      .filter(col("sa") =!= col("sb")).count()
    assert(moved > 500, s"only $moved ids moved between seeds")
    // normalized 1:1 weights → boundary at "80"
    val aFrac = s0.filter(col("split") === "a").count()
    assert(aFrac > 900 && aFrac < 1100, s"a got $aFrac of 2000")
  }

  test("extreme weight whose boundary rounds to the full bucket count") {
    // 0.999/0.001 at hexChars=2: round(0.999*256) = 256 — formatting that
    // as hex yields 3-char "100", which sorts BELOW 2-char "11".."ff" and
    // would dump ~93% of rows into the residual split. The clamp makes
    // the first split own every bucket instead (the correct rounding of
    // 0.999 at 1/256 granularity).
    val counts = Splits.assign(ids, "id", Seq("train" -> 0.999, "test" -> 0.001))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") == 2000L, counts)
    assert(!counts.contains("test"), counts)
    // the clamp only fires for the overflowing boundary — a mid-chain
    // overflow must not steal buckets from splits before it
    val c3 = Splits.assign(ids, "id",
        Seq("a" -> 0.5, "b" -> 0.499, "c" -> 0.001))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c3("a") > 900 && c3("a") < 1100, c3)
    assert(c3.getOrElse("b", 0L) + c3.getOrElse("a", 0L) == 2000L, c3)
  }

  test("property: random weights — every row assigned, fractions near weights") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      k <- Gen.choose(1, 5)
      ws <- Gen.listOfN(k, Gen.choose(0.001, 10.0))
    } yield ws
    (1L to 15L).foreach { seed =>
      val ws = gen.apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(sys.error("gen failed"))
      val splits = ws.zipWithIndex.map { case (w, i) => s"s$i" -> w }
      val counts = Splits.assign(ids, "id", splits, seed = seed.toString)
        .groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts.values.sum == 2000, s"seed $seed: rows lost")
      assert(counts.keySet.subsetOf(splits.map(_._1).toSet), s"seed $seed")
      val total = ws.sum
      splits.foreach { case (n, w) =>
        val frac = counts.getOrElse(n, 0L).toDouble / 2000
        // 1/256 bucket granularity + binomial noise over 2000 ids; a
        // boundary-overflow misassignment (the pre-clamp bug) lands ~0.9
        // off and cannot hide inside this band
        assert(math.abs(frac - w / total) < 0.07,
          s"seed $seed $n: $frac vs ${w / total}")
      }
    }
  }

  test("three hex chars widen the bucket space") {
    val b = Splits.assign(ids.limit(5), "id", Seq("a" -> 1.0), hexChars = 3)
      .select("bucket").as[String].collect()
    b.foreach(x => assert(x.length == 3))
  }
}
