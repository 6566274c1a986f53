package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class SequencePackSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("toks", LongType, nullable = false)))

  private def docs(rows: (String, Long, Long)*) =
    frame(schema, rows.map(r => Row(r._1, r._2, r._3)))

  private def pack(df: org.apache.spark.sql.DataFrame, cap: Long) =
    SequencePack.packGreedy(df, Seq("shard"), "id", "toks", cap)
      .select("shard", "id", "seq_id", "seq_off")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2))

  test("greedy fill: overflow starts a new sequence, offsets accumulate") {
    val out = pack(docs(
      ("a", 1L, 50L), ("a", 2L, 40L), ("a", 3L, 20L), ("a", 4L, 100L), ("a", 5L, 10L)),
      cap = 100)
    assert(out === Seq(
      ("a", 1L, 0L, 0L),  // seq0: 50
      ("a", 2L, 0L, 50L), // seq0: 90
      ("a", 3L, 1L, 0L),  // 90+20 > 100 → seq1
      ("a", 4L, 2L, 0L),  // 20+100 > 100 → seq2 (exactly full)
      ("a", 5L, 3L, 0L))) // 100+10 > 100 → seq3
  }

  test("oversize doc gets its own sequence; shards pack independently") {
    val out = pack(docs(
      ("a", 1L, 30L), ("a", 2L, 500L), ("a", 3L, 30L),
      ("b", 1L, 60L), ("b", 2L, 60L)),
      cap = 100)
    assert(out === Seq(
      ("a", 1L, 0L, 0L),
      ("a", 2L, 1L, 0L), // 500 > cap: alone in seq1
      ("a", 3L, 2L, 0L), // 500+30 > cap → seq2
      ("b", 1L, 0L, 0L), // shard b restarts at seq0
      ("b", 2L, 1L, 0L)))
  }

  test("exact-capacity fits stay in the sequence") {
    val out = pack(docs(("a", 1L, 60L), ("a", 2L, 40L), ("a", 3L, 1L)), cap = 100)
    assert(out === Seq(
      ("a", 1L, 0L, 0L),
      ("a", 2L, 0L, 60L), // 60+40 == cap: fits
      ("a", 3L, 1L, 0L)))
  }
}
