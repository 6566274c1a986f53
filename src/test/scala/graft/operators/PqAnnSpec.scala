package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class PqAnnSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true)))

  // 60 vectors in 3 tight clusters around the first 3 axes of dim 8
  private def corpus() = {
    val rnd = new scala.util.Random(7)
    frame(schema, (0 until 60).map { i =>
      val base = Array.fill(8)(0.0f)
      base(i % 3) = 1.0f
      Row(i.toLong, base.map(x => x + rnd.nextGaussian().toFloat * 0.05f).toSeq)
    })
  }

  test("encode: argmin per subspace, ties to the smaller centroid id, deterministic") {
    val c = corpus()
    val cb = PqAnn.train(c, "vec_id", "embedding", m = 2, k = 4, maxIter = 0)
    assert(cb.m === 2 && cb.k === 4 && cb.dsub === 4)
    // maxIter=0: codebook is exactly the first k rows' slices
    val firstK = c.orderBy("vec_id").limit(4).collect()
      .map(_.getSeq[Float](1).toArray)
    assert(cb.sub(0).toSeq.map(_.toSeq) === firstK.map(_.slice(0, 4).toSeq).toSeq)
    assert(cb.sub(1).toSeq.map(_.toSeq) === firstK.map(_.slice(4, 8).toSeq).toSeq)
    // codes replay a manual argmin
    val enc = PqAnn.encode(c, "vec_id", "embedding", cb)
      .orderBy("vec_id").collect()
    val vecs = c.orderBy("vec_id").collect().map(_.getSeq[Float](1).toArray)
    enc.zip(vecs).foreach { case (row, v) =>
      val codes = row.getSeq[Int](1)
      for (s <- 0 until 2) {
        val sub = v.slice(s * 4, s * 4 + 4)
        val dists = cb.sub(s).map(cent =>
          sub.zip(cent).map { case (x, y) =>
            val d = x.toDouble - y.toDouble; d * d }.sum)
        val want = dists.zipWithIndex.minBy { case (d, j) => (d, j) }._2
        assert(codes(s) === want, s"row ${row.getLong(0)} subspace $s")
      }
    }
    // deterministic across invocations
    val enc2 = PqAnn.encode(c, "vec_id", "embedding", cb).orderBy("vec_id").collect()
    assert(enc.map(_.toString).toSeq === enc2.map(_.toString).toSeq)
  }

  test("adot == plain dot against the materialized reconstruction; rnorm matches") {
    val c = corpus()
    val cb = PqAnn.train(c, "vec_id", "embedding", m = 4, k = 8, maxIter = 2)
    // self-ADC frame: every row carries its own vector AND its code, so
    // PqDot(v, code(v)) evaluates in-plan and compares to the manual
    // reconstruction dot exactly (same left-to-right double accumulation)
    val joined = c.join(PqAnn.encode(c, "vec_id", "embedding", cb), "vec_id")
    val withDot = joined.select(col("vec_id"), col("embedding"),
        col("pq_code"), col("pq_norm"),
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.functions.expressions.PqDot(
            org.apache.spark.sql.GraftColumnBridge.expression(col("embedding")),
            org.apache.spark.sql.GraftColumnBridge.expression(col("pq_code")),
            cb.sub)).as("adot"))
      .orderBy("vec_id").collect()
    withDot.foreach { row =>
      val v = row.getSeq[Float](1).toArray
      val codes = row.getSeq[Int](2)
      val recon = (0 until cb.m).flatMap(s => cb.sub(s)(codes(s))).toArray
      val manualDot = v.zip(recon).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val manualNorm = math.sqrt(recon.map(x => x.toDouble * x.toDouble).sum)
      assert(row.getDouble(4) === manualDot, s"adot row ${row.getLong(0)}")
      assert(math.abs(row.getDouble(3) - manualNorm) < 1e-12,
        s"rnorm row ${row.getLong(0)}")
    }
  }

  test("distortion is non-increasing across Lloyd iterations") {
    val c = corpus()
    def distortion(maxIter: Int): Double = {
      val cb = PqAnn.train(c, "vec_id", "embedding", m = 2, k = 4, maxIter = maxIter)
      val enc = PqAnn.encode(c, "vec_id", "embedding", cb).orderBy("vec_id").collect()
      val vecs = c.orderBy("vec_id").collect().map(_.getSeq[Float](1).toArray)
      enc.zip(vecs).map { case (row, v) =>
        val codes = row.getSeq[Int](1)
        val recon = (0 until cb.m).flatMap(s => cb.sub(s)(codes(s)))
        v.zip(recon).map { case (x, y) =>
          val d = x.toDouble - y.toDouble; d * d }.sum
      }.sum
    }
    val d0 = distortion(0); val d1 = distortion(1); val d3 = distortion(3)
    assert(d1 <= d0 + 1e-9 && d3 <= d1 + 1e-9, s"$d0 -> $d1 -> $d3")
  }

  test("ADC search finds the right clusters; rerank returns exact cosine order") {
    val c = corpus()
    val cb = PqAnn.train(c, "vec_id", "embedding", m = 4, k = 8, maxIter = 3)
    val enc = PqAnn.encode(c, "vec_id", "embedding", cb)
    val queries = c.filter("vec_id < 3")
    val adc = PqAnn.searchTopK(enc, cb, queries, "vec_id", "embedding", k = 5)
    assert(adc.count() === 15)
    // clusters are far apart: even quantized, neighbors share the
    // query's cluster (vec_id % 3)
    adc.collect().foreach { r =>
      assert(r.getLong(0) % 3 === r.getLong(1) % 3,
        s"query ${r.getLong(0)} got cross-cluster neighbor ${r.getLong(1)}")
    }
    // rerank: exact cosine order must equal brute force on the same depth
    val exact = Ann.bruteForceTopK(c, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val rr = PqAnn.searchTopK(enc, cb, queries, "vec_id", "embedding", k = 5,
        rerank = Some((c, 20)))
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val agree = rr.count { case (k2, v) => exact.get(k2).contains(v) }
    assert(agree >= 13, s"rerank≤depth-20 agreement only $agree/15")
  }

  test("search plan broadcasts the query side; corpus never shuffles") {
    val c = corpus()
    val cb = PqAnn.train(c, "vec_id", "embedding", m = 2, k = 4, maxIter = 0)
    val enc = PqAnn.encode(c, "vec_id", "embedding", cb)
    // limit() carries a size estimate; a bare in-memory frame reports
    // unknown stats and the guard correctly declines to broadcast it
    val plan = PqAnn.searchTopK(enc, cb, c.limit(2),
      "vec_id", "embedding", k = 3).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("IVF-PQ: recon_norm matches the materialized reconstruction; full-probe recall holds") {
    val c = corpus()
    val idx = PqAnn.buildIvfPq(c, "vec_id", "embedding",
      nCells = 3, m = 4, k = 8, cellIter = 3, pqIter = 3)
    // recon_norm == ||centroid + decoded residual|| computed by hand
    val vecs = c.orderBy("vec_id").collect().map(_.getSeq[Float](1).toArray)
    idx.encoded.orderBy("vec_id").collect().take(15).foreach { row =>
      val cell = row.getInt(1)
      val codes = row.getSeq[Int](2)
      val recon = (0 until idx.cb.m).flatMap(s => idx.cb.sub(s)(codes(s)))
        .zip(idx.cells(cell)).map { case (r, cc) => r.toDouble + cc.toDouble }
      val manual = math.sqrt(recon.map(x => x * x).sum)
      assert(math.abs(row.getDouble(3) - manual) < 1e-9,
        s"recon_norm row ${row.getLong(0)}")
      // decode error is small relative to the vector (residual PQ works)
      val v = vecs(row.getLong(0).toInt)
      val err = math.sqrt(v.zip(recon).map { case (x, y) =>
        val d = x.toDouble - y; d * d }.sum)
      assert(err < 0.5, s"row ${row.getLong(0)} decode error $err")
    }
    // full-probe search: neighbors stay in the query's cluster
    val out = PqAnn.searchIvfPq(idx, c.filter("vec_id < 3"),
      "vec_id", "embedding", k = 5, nProbe = 3)
    assert(out.count() === 15)
    out.collect().foreach(r =>
      assert(r.getLong(0) % 3 === r.getLong(1) % 3,
        s"query ${r.getLong(0)} got cross-cluster ${r.getLong(1)}"))
    // nProbe=1 on tight clusters: same answer, touching 1/3 of the codes
    val pruned = PqAnn.searchIvfPq(idx, c.filter("vec_id < 3"),
      "vec_id", "embedding", k = 5, nProbe = 1)
    assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("IVF-PQ search joins on the cell key — no cartesian against the codes") {
    val c = corpus()
    val idx = PqAnn.buildIvfPq(c, "vec_id", "embedding",
      nCells = 3, m = 2, k = 4, cellIter = 1, pqIter = 1)
    val plan = PqAnn.searchIvfPq(idx, c.limit(2), "vec_id", "embedding",
      k = 3, nProbe = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("zero-norm rows are excluded from search, never NaN-ranked (review fix)") {
    val c = corpus()
    val withZero = c.union(frame(schema,
      Seq(Row(999L, Seq.fill(8)(0.0f)))))
    val cb = PqAnn.train(c, "vec_id", "embedding", m = 4, k = 8, maxIter = 1)
    val enc = PqAnn.encode(withZero, "vec_id", "embedding", cb)
    val out = PqAnn.searchTopK(enc, cb, withZero.filter("vec_id IN (0, 999)"),
      "vec_id", "embedding", k = 5).collect()
    // the zero QUERY yields no rows; the zero corpus row is never a neighbor
    assert(out.forall(_.getLong(0) === 0L))
    assert(out.forall(r => !r.getDouble(2).isNaN))
    assert(!out.exists(_.getLong(1) === 999L) ||
      PqAnn.encode(withZero.filter("vec_id = 999"), "vec_id", "embedding", cb)
        .head().getDouble(2) > 0.0)
  }

  test("a ragged (short) vector fails fast naming the dimension, never truncates (review fix)") {
    val c = corpus()
    val cb = PqAnn.train(c, "vec_id", "embedding", m = 4, k = 8, maxIter = 0)
    val ragged = frame(schema, Seq(Row(7777L, Seq.fill(6)(0.5f))))
    val e = intercept[Exception] {
      PqAnn.encode(ragged, "vec_id", "embedding", cb).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("codebook expects 8")),
      s"got: ${msgs(e)}")
  }

  test("dim not divisible by m / too few training rows fail fast") {
    val c = corpus()
    intercept[IllegalArgumentException] {
      PqAnn.train(c, "vec_id", "embedding", m = 3, k = 4, maxIter = 0)
    }
    intercept[IllegalArgumentException] {
      PqAnn.train(c.limit(2), "vec_id", "embedding", m = 2, k = 4, maxIter = 0)
    }
  }
}
