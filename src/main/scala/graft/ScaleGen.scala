package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale the driver's synthetic testdata by an integer factor with Spark
  * itself (`ScaleGen [srcDir] [outDir] [factor]`), so the 100×-scale
  * claims in SCALING.md are MEASURED, not argued (VERDICT r6 item 1).
  *
  * The scaling must preserve each workload's algorithmic shape, not just
  * its byte count:
  *
  *   - Surrogate keys (and the FKs that reference them) are offset by
  *     `replica * (max(key) + 1)`, so key cardinality scales with the
  *     data and joins/dedup keep their selectivity instead of developing
  *     artificial 10-way hot keys.
  *   - `documents.text` gets a per-replica word suffix (`_r<N>`): within
  *     a replica the near-dup structure (shingles, minhash bands, edit
  *     distances) is byte-identical to the source corpus; ACROSS
  *     replicas every shingle differs, so near-dup pair density stays
  *     CONSTANT per row and LSH/n-gram candidate counts scale linearly —
  *     verbatim replication would instead form 10-cliques of identical
  *     docs and grow pair counts quadratically, a different workload.
  *   - `embeddings.embedding` is circularly rotated by the replica index:
  *     norms and within-replica cosine geometry are untouched (ANN
  *     recall structure intact), cross-replica similarity decorrelates.
  *   - Dimension-like tables (`nation`, `region`) stay fixed, as TPC-H
  *     scaling does.
  *
  * Determinism: pure column transforms of deterministic inputs — no
  * rand(), no wall clock — so two runs produce identical bytes and
  * BENCH/SCALING numbers are comparable across rounds.
  */
object ScaleGen {

  /** Replicate `df` `factor`× with each key column shifted by
    * `replica * base`. A foreign key's base MUST be the REFERENCED
    * table's `max(key) + 1` (not its own max), or replica k's FKs point
    * outside replica k's key range and every RI join changes
    * selectivity — hence the explicit (column → base) pairs.
    */
  private def offsetKeys(
      df: DataFrame, factor: Int, keys: (String, Long)*): DataFrame = {
    val replicas = df.sparkSession.range(0, factor.toLong).withColumnRenamed("id", "__r")
    val rep = df.crossJoin(broadcast(replicas))
    keys.foldLeft(rep) { case (d, (k, base)) =>
      d.withColumn(k, col(k) + col("__r") * base)
    }.drop("__r")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-scalegen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def src(name: String) = spark.read.parquet(s"$srcDir/$name.parquet")
    def write(df: DataFrame, name: String, files: Int): Unit =
      df.repartition(files).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")

    // fixed dimensions
    write(src("region"), "region", 1)
    write(src("nation"), "nation", 1)

    def keyBase(name: String, key: String): Long =
      src(name).agg(max(col(key))).head.getLong(0) + 1L
    val custBase = keyBase("customer", "c_custkey")
    val suppBase = keyBase("supplier", "s_suppkey")
    val partBase = keyBase("part", "p_partkey")
    val orderBase = keyBase("orders", "o_orderkey")

    write(offsetKeys(src("customer"), factor, "c_custkey" -> custBase), "customer", 4)
    write(offsetKeys(src("supplier"), factor, "s_suppkey" -> suppBase), "supplier", 1)
    write(offsetKeys(src("part"), factor, "p_partkey" -> partBase), "part", 4)
    write(offsetKeys(src("orders"), factor,
      "o_orderkey" -> orderBase, "o_custkey" -> custBase), "orders", 8)
    write(offsetKeys(src("lineitem"), factor,
      "l_orderkey" -> orderBase, "l_partkey" -> partBase,
      "l_suppkey" -> suppBase), "lineitem", 16)
    write(offsetKeys(src("events"), factor,
      "event_id" -> keyBase("events", "event_id"),
      "user_id" -> keyBase("events", "user_id")), "events", 8)

    // documents: regexp_replace needs a literal replacement string, so
    // the per-replica word-suffix transform is a small union of replica
    // branches (factor branches — replica 0 keeps the original bytes,
    // replicas 1.. suffix every word, shifting shingles wholesale)
    val base = src("documents")
    val maxDoc = base.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val scaledDocs = (0 until factor).map { r =>
      val d = base.withColumn("doc_id", col("doc_id") + lit(r.toLong * maxDoc))
      if (r == 0) d
      else d.withColumn("text",
        regexp_replace(col("text"), "(\\p{Alnum}+)", s"$$1_r$r"))
        .withColumn("n_chars", length(col("text")))
    }.reduce(_.unionByName(_))
    write(scaledDocs, "documents", 8)

    val emb = src("embeddings")
    val maxVec = emb.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val scaledEmb = (0 until factor).map { r =>
      val d = emb.withColumn("vec_id", col("vec_id") + lit(r.toLong * maxVec))
      if (r == 0) d
      else d.withColumn("embedding",
        concat(slice(col("embedding"), r + 1, dim - r),
          slice(col("embedding"), 1, r)))
    }.reduce(_.unionByName(_))
    write(scaledEmb, "embeddings", 4)

    val counts = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(t => t -> spark.read.parquet(s"$outDir/$t.parquet").count())
    println(counts.map { case (t, n) => s"$t=$n" }.mkString("SCALEGEN ", " ", ""))
    spark.stop()
  }
}
