package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the SCALING.md measurement (VERDICT_r6 item 1).
  *
  * Fans the driver's sf0.1 testdata out `replicas`× (default 10 → an
  * sf1-equivalent) into a new directory, preserving every schema and —
  * critically — the per-replica STATISTICAL SHAPE of the data, so that a
  * query's sf0.1→sf1 wall-time ratio reflects its algorithmic scaling and
  * not an artifact of the synthesis:
  *
  *   - Fact/dim tables (customer, supplier, part, orders, lineitem,
  *     events): each replica shifts every key column by `replica × stride`
  *     (stride = max key + 1), so PK uniqueness and FK joins hold across
  *     the union exactly as they do within one replica. region/nation stay
  *     fixed (real TPC-H does not scale them either).
  *   - documents.text: replica r applies an affine letter cipher
  *     (i → k·i + b mod 26; caesar for r < 26, 312 distinct bijections) to
  *     letters only. A bijection on words ⇒ within-replica duplicate /
  *     near-duplicate / shingle structure is IDENTICAL to sf0.1, while
  *     cross-replica shingles are disjoint — so LSH/MinHash/SimHash/n-gram
  *     candidate counts scale linearly (10× groups of the same size)
  *     instead of every document acquiring 9 artificial near-duplicates
  *     (which would inflate candidate pairs ~45× and masquerade as a
  *     quadratic blowup). Lengths are preserved, so n_chars stays valid.
  *   - embeddings.embedding: replica r applies a circular dimension shift
  *     by r composed with deterministic ±1 sign flips — an ORTHOGONAL
  *     transform, so all intra-replica norms, dot products and cosine
  *     neighborhoods are exactly those of sf0.1, while cross-replica
  *     vectors decorrelate. ANN recall structure scales linearly.
  *
  * Every transform is a deterministic, codegen'd column expression over a
  * single scan per table (replica fan-out is a broadcast cross join with a
  * `replicas`-row local relation — the same shape a 100 TB synthetic
  * fan-out would use; nothing is collected to the driver beyond 1-row max
  * aggregates used for key strides).
  *
  * Usage: ScaleGen [srcDir] [outDir] [replicas]
  * Defaults: /root/testdata/sf0.1 /tmp/graft_testdata/sf1 10
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_testdata/sf1")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, replicas)
    spark.stop()
  }

  /** `replicas`-row local relation joined broadcast-style; every source row
    * fans out to one row per replica in a single scan of the source.
    */
  private def withReplica(df: DataFrame, replicas: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.crossJoin(broadcast((0 until replicas).toDF("r")))
  }

  /** key + r × stride, preserving the column's type. */
  private def shift(df: DataFrame, key: String, stride: Long): Column =
    (col(key) + col("r").cast("long") * lit(stride)).cast(df.schema(key).dataType)

  private def maxKey(df: DataFrame, key: String): Long =
    df.agg(max(col(key).cast("long"))).head().getLong(0) + 1L

  private val Letters =
    ('a' to 'z').mkString + ('A' to 'Z').mkString

  /** Multipliers coprime with 26 — 12 of them, so affine ciphers give
    * 12 × 26 = 312 DISTINCT letter bijections (caesar alone repeats with
    * period 26: at replicas > 26, r and r+26 would carry IDENTICAL text,
    * planting 100/26 ≈ 4 artificial exact duplicates per document and
    * corrupting the dedup-query scaling measurement).
    */
  private val AffineKs = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)

  /** Affine cipher i → k·i + b (mod 26); r < 26 has k = 1 — exactly the
    * caesar of earlier rounds, so sf1 outputs are bit-compatible. Any
    * two distinct (k, b) agree on at most gcd(k1−k2, 26) ≤ 2 letters, so
    * cross-replica words stay disjoint (no synthetic near-dups).
    */
  private def affine(r: Int): String = {
    val k = AffineKs((r / 26) % AffineKs.length)
    val b = r % 26
    ('a' to 'z').map(c => ('a' + (k * (c - 'a') + b) % 26).toChar).mkString +
      ('A' to 'Z').map(c => ('A' + (k * (c - 'A') + b) % 26).toChar).mkString
  }

  /** Per-replica letter bijection: when-chain over the replica column so
    * the whole fan-out stays one codegen'd projection over one scan.
    */
  private def caesarText(text: Column, replicas: Int): Column =
    (1 until replicas).foldLeft(when(col("r") === 0, text)) { (acc, r) =>
      acc.when(col("r") === r, translate(text, Letters, affine(r)))
    }

  /** Orthogonal per-replica transform: v'(i) = s(i,r) × v((i+r) mod d),
    * s(i,r) = ±1 from a deterministic hash. Permutation ∘ sign-diagonal is
    * orthogonal ⇒ intra-replica geometry (norms, cosines, top-k ranks) is
    * exactly sf0.1's; cross-replica pairs decorrelate.
    */
  private def rotateEmbedding(emb: Column): Column = {
    val d = size(emb)
    val rotated = transform(
      sequence(lit(0), d - lit(1)),
      i => (element_at(emb, pmod(i + col("r"), d) + 1) *
        when(pmod(hash(i, col("r")), lit(2)) === 0, lit(1.0f))
          .otherwise(lit(-1.0f))).cast("float"))
    when(col("r") === 0, emb).otherwise(rotated)
  }

  def generate(spark: SparkSession, src: String, out: String, replicas: Int): Unit = {
    require(replicas >= 1 && replicas <= 26 * AffineKs.length,
      s"ScaleGen: replicas $replicas outside 1..${26 * AffineKs.length} " +
        "(distinct affine letter bijections)")
    def load(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    // file counts sized for replicas = 10; larger fan-outs scale them so
    // per-file row counts (and downstream split sizes) stay comparable
    val fileScale = math.max(1, replicas / 10)
    def save(df: DataFrame, t: String, files: Int): Unit =
      df.repartition(files * fileScale).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")

    // fixed dims — copied verbatim (TPC-H does not scale them); always
    // one file regardless of fan-out
    load("region").repartition(1).write.mode("overwrite")
      .parquet(s"$out/region.parquet")
    load("nation").repartition(1).write.mode("overwrite")
      .parquet(s"$out/nation.parquet")

    val customer = load("customer")
    val supplier = load("supplier")
    val part = load("part")
    val orders = load("orders")
    val lineitem = load("lineitem")
    val events = load("events")
    val documents = load("documents")
    val embeddings = load("embeddings")

    val custStride = maxKey(customer, "c_custkey")
    val suppStride = maxKey(supplier, "s_suppkey")
    val partStride = maxKey(part, "p_partkey")
    val orderStride = maxKey(orders, "o_orderkey")
    val eventStride = maxKey(events, "event_id")
    val userStride = maxKey(events, "user_id")
    val docStride = maxKey(documents, "doc_id")
    val vecStride = maxKey(embeddings, "vec_id")

    save(withReplica(customer, replicas)
      .withColumn("c_custkey", shift(customer, "c_custkey", custStride)).drop("r"),
      "customer", 4)
    save(withReplica(supplier, replicas)
      .withColumn("s_suppkey", shift(supplier, "s_suppkey", suppStride)).drop("r"),
      "supplier", 1)
    save(withReplica(part, replicas)
      .withColumn("p_partkey", shift(part, "p_partkey", partStride)).drop("r"),
      "part", 4)
    save(withReplica(orders, replicas)
      .withColumn("o_orderkey", shift(orders, "o_orderkey", orderStride))
      .withColumn("o_custkey", shift(orders, "o_custkey", custStride)).drop("r"),
      "orders", 8)
    save(withReplica(lineitem, replicas)
      .withColumn("l_orderkey", shift(lineitem, "l_orderkey", orderStride))
      .withColumn("l_partkey", shift(lineitem, "l_partkey", partStride))
      .withColumn("l_suppkey", shift(lineitem, "l_suppkey", suppStride)).drop("r"),
      "lineitem", 16)
    // timestamps unshifted: 10× event density in the same window is the
    // realistic scale-up (sessions per user unchanged — users scale)
    save(withReplica(events, replicas)
      .withColumn("event_id", shift(events, "event_id", eventStride))
      .withColumn("user_id", shift(events, "user_id", userStride)).drop("r"),
      "events", 8)
    save(withReplica(documents, replicas)
      .withColumn("doc_id", shift(documents, "doc_id", docStride))
      .withColumn("text", caesarText(col("text"), replicas)).drop("r"),
      "documents", 8)
    save(withReplica(embeddings, replicas)
      .withColumn("vec_id", shift(embeddings, "vec_id", vecStride))
      .withColumn("embedding", rotateEmbedding(col("embedding"))).drop("r"),
      "embeddings", 8)

    val counts = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(t => t -> spark.read.parquet(s"$out/$t.parquet").count())
    println(counts.map { case (t, n) => s"$t=$n" }.mkString("SCALEGEN ", " ", ""))
  }
}
