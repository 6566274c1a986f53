package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  private val factSchema = StructType(Seq(
    StructField("k", IntegerType, nullable = false),
    StructField("v", IntegerType, nullable = false)))
  private val dimSchema = StructType(Seq(
    StructField("k", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false)))

  // 90% of fact rows share key 1 (heavy skew); dim has keys 1..5 (+7 unmatched)
  private def fact() = frame(factSchema,
    (0 until 1000).map(i => Row(if (i < 900) 1 else i % 5 + 1, i)))
  private def dim() = frame(dimSchema,
    (1 to 5).map(k => Row(k, s"name$k")) :+ Row(7, "name7"))

  test("salted inner join equals plain inner join on skewed keys") {
    val plain = fact().join(dim(), Seq("k"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val salted = Skew.saltedEquiJoin(fact(), dim(), Seq("k"), saltFactor = 8)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(salted === plain)
    assert(plain.length === 1000)
  }

  test("salted left_outer keeps unmatched left rows exactly once") {
    val factWithOrphans = frame(factSchema,
      (0 until 100).map(i => Row(if (i < 50) 1 else 99, i))) // 99 unmatched
    val out = Skew.saltedEquiJoin(factWithOrphans, dim(), Seq("k"),
        saltFactor = 4, joinType = "left_outer")
      .collect().map(r => (r.getInt(0), r.getInt(1), if (r.isNullAt(2)) null else r.getString(2)))
    assert(out.length === 100)
    assert(out.count(_._3 == null) === 50)
  }

  test("unsupported join types are rejected") {
    intercept[IllegalArgumentException] {
      Skew.saltedEquiJoin(fact(), dim(), Seq("k"), joinType = "right_outer")
    }
  }
}
