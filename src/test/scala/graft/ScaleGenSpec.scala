package graft

import org.apache.spark.sql.functions._

/** ScaleGen must preserve the invariants SCALING.md's methodology leans on:
  * linear row fan-out, PK uniqueness and FK closure across replicas,
  * shape-preserving text transform (bijective on words, length-preserving)
  * and orthogonal embedding transform (norm/cosine-preserving within a
  * replica, disjoint across replicas).
  */
class ScaleGenSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"
  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("scalegen").toString
    ScaleGen.generate(spark, src, dir, 3)
    dir
  }

  test("row counts fan out exactly replicas x (dims fixed)") {
    for ((t, mult) <- Seq("region" -> 1, "nation" -> 1, "customer" -> 3,
        "orders" -> 3, "lineitem" -> 3, "events" -> 3, "documents" -> 3,
        "embeddings" -> 3)) {
      val n0 = spark.read.parquet(s"$src/$t.parquet").count()
      val n1 = spark.read.parquet(s"$out/$t.parquet").count()
      assert(n1 == n0 * mult, s"$t: $n0 -> $n1 (expected x$mult)")
    }
  }

  test("primary keys stay unique and foreign keys stay closed") {
    val orders = spark.read.parquet(s"$out/orders.parquet")
    val lineitem = spark.read.parquet(s"$out/lineitem.parquet")
    val customer = spark.read.parquet(s"$out/customer.parquet")
    assert(orders.select("o_orderkey").distinct.count() == orders.count())
    assert(customer.select("c_custkey").distinct.count() == customer.count())
    // FK closure: every lineitem order and every order customer resolves
    assert(lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"),
      "left_anti").isEmpty)
    assert(orders.join(customer, orders("o_custkey") === customer("c_custkey"),
      "left_anti").isEmpty)
  }

  test("caesar text transform preserves lengths; replicas share no shingles") {
    val d0 = spark.read.parquet(s"$src/documents.parquet")
    val d1 = spark.read.parquet(s"$out/documents.parquet")
    // length multiset preserved per replica: total chars is 3x the source
    val chars0 = d0.agg(sum(length(col("text")))).head().getLong(0)
    val chars1 = d1.agg(sum(length(col("text")))).head().getLong(0)
    assert(chars1 == chars0 * 3)
    // replica 0 is byte-identical to the source
    val docStride = d0.agg(max("doc_id")).head().getLong(0) + 1
    val r0 = d1.filter(col("doc_id") < docStride)
    assert(r0.exceptAll(d0).isEmpty && d0.exceptAll(r0).isEmpty)
    // cross-replica: word sets of replica 0 and replica 1 are disjoint
    // (caesar shift-1 moves every letter), so shingle joins cannot pair
    // rows across replicas
    def words(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("[a-z]")).distinct()
    val w0 = words(r0)
    val w1 = words(d1.filter(col("doc_id") >= docStride && col("doc_id") < docStride * 2))
    assert(w0.join(w1, "w").isEmpty)
  }

  test("gram buckets are scale-stable: candidate-pair mass grows linearly") {
    // the property the byte gate's honesty rests on (VERDICT r14 item
    // 3): a shingle join's candidate-pair count is Σ_buckets C(cnt, 2),
    // so if replicas shared grams, buckets would densify and pair mass
    // would grow ~replicas² — the "SF² pairs" r14 blamed for q25/q135's
    // byte ratios. The ciphers make cross-replica grams disjoint, so
    // doubling the replicas must EXACTLY double the pair mass (measured
    // at sf10 scale too: trigram Σcnt² = 100.01× at 100× data; the
    // ratios r14 observed were auto-broadcast crossings, re-measured
    // and reclassified this round — see SCALING.md §3m).
    def pairMass(dir: String): Long = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(
        graft.functions.TextFunctions.wordNGrams(col("text"), 3)).as("g"))
      .groupBy("g").count()
      // 2× the pair count — stays integral (never `/` on long columns)
      .agg(sum(col("count") * (col("count") - 1))).head().getLong(0)
    val six = java.nio.file.Files.createTempDirectory("scalegen-6").toString
    ScaleGen.generate(spark, src, six, 6)
    assert(pairMass(six) === pairMass(out) * 2,
      "cross-replica gram sharing would densify buckets superlinearly")
  }

  test("affine ciphers stay distinct past the caesar period (sf10 safety)") {
    // at replicas > 26 a pure caesar repeats (r and r+26 identical) —
    // the affine multiplier must keep replicas 0/26/52 pairwise disjoint
    // in word space, or sf10 plants artificial exact duplicates
    val dir = java.nio.file.Files.createTempDirectory("scalegen-aff").toString
    ScaleGen.generate(spark, src, dir, 28)
    val d0 = spark.read.parquet(s"$src/documents.parquet")
    val docStride = d0.agg(max("doc_id")).head().getLong(0) + 1
    val d1 = spark.read.parquet(s"$dir/documents.parquet")
    def rep(r: Int) = d1.filter(
      col("doc_id") >= docStride * r && col("doc_id") < docStride * (r + 1))
    // replicas 0..25 match the old caesar scheme: r=1 is shift-1
    val t0 = rep(0).orderBy("doc_id").select("text").limit(1)
      .head().getString(0)
    val t1 = rep(1).orderBy("doc_id").select("text").limit(1)
      .head().getString(0)
    assert(t1 == t0.map(c =>
      if (c >= 'a' && c <= 'z') ('a' + (c - 'a' + 1) % 26).toChar
      else if (c >= 'A' && c <= 'Z') ('A' + (c - 'A' + 1) % 26).toChar
      else c))
    // replica 26 (k=3, b=0) must NOT equal replica 0 — the caesar scheme
    // would have made them identical. The affine pair (1,0)/(3,0) has
    // fixed points only at 'a' and 'n' (2i ≡ 0 mod 26), so any shared
    // word is drawn from {a, n}; the dedup measurements lean on SHINGLE
    // (word-3-gram) disjointness, which needs three consecutive such
    // words and must be empty outright
    def words(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$")).distinct()
    val shared = words(rep(0)).join(words(rep(26)), "w")
      .collect().map(_.getString(0))
    assert(shared.forall(_.forall(c => c == 'a' || c == 'n')),
      s"non-fixed-point words leaked across replicas: ${shared.mkString(",")}")
    def shingles(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(
        graft.functions.TextFunctions.wordNGrams(col("text"), 3)).as("g"))
      .distinct()
    assert(shingles(rep(0)).join(shingles(rep(26)), "g").isEmpty)
    // lengths still preserved across the whole fan-out
    val chars0 = d0.agg(sum(length(col("text")))).head().getLong(0)
    val chars1 = d1.agg(sum(length(col("text")))).head().getLong(0)
    assert(chars1 == chars0 * 28)
    // replicas beyond the cipher supply are refused, not silently reused
    val e = intercept[IllegalArgumentException] {
      ScaleGen.generate(spark, src,
        java.nio.file.Files.createTempDirectory("scalegen-bad").toString, 313)
    }
    assert(e.getMessage.contains("312"))
  }

  test("embedding transform is orthogonal: norms preserved bit-for-bit shape") {
    val e0 = spark.read.parquet(s"$src/embeddings.parquet")
    val e1 = spark.read.parquet(s"$out/embeddings.parquet")
    def norms(df: org.apache.spark.sql.DataFrame) = df.select(
      aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")).as("n2"))
      .agg(sum("n2")).head().getDouble(0)
    val n0 = norms(e0)
    val n1 = norms(e1)
    // permutation + sign flips preserve each norm exactly (float ops are
    // reordered only across elements of a sum here, so allow 1e-6 rel tol)
    assert(math.abs(n1 - n0 * 3) / (n0 * 3) < 1e-6, s"$n0 vs $n1")
    // replica 0 identical to source
    val vecStride = e0.agg(max("vec_id")).head().getLong(0) + 1
    val r0 = e1.filter(col("vec_id") < vecStride).orderBy("vec_id")
      .select("vec_id", "embedding").collect()
    val s0 = e0.orderBy("vec_id").select("vec_id", "embedding").collect()
    assert(r0.sameElements(s0))
  }
}
