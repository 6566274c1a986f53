package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TBLPROPERTIES: storage round-trip, the enforced graft.appendOnly
  * immutability property across mutation verbs, SQL verbs, clone carry.
  */
class TablePropertiesSpec extends SparkSpec {
  import spark.implicits._

  test("set/get/unset round-trip; set upserts case-insensitively") {
    val path = tmpDir("props") + "/t"
    TableProperties.set(spark, path, Map("owner" -> "ingest", "tier" -> "raw"))
    assert(TableProperties.get(spark, path, "owner") === Some("ingest"))
    TableProperties.set(spark, path, Map("OWNER" -> "curation"))
    assert(TableProperties.list(spark, path).toMap.values.toSet ===
      Set("curation", "raw"))
    TableProperties.unset(spark, path, Seq("tier", "never_set"))
    assert(TableProperties.list(spark, path).map(_._1) === Seq("OWNER"))
  }

  test("appendOnly: mutations refuse, appends and optimize still work") {
    val path = tmpDir("props-ao") + "/t"
    ParquetTable.create(Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    TableProperties.set(spark, path, Map(TableProperties.AppendOnlyKey -> "true"))

    ParquetTable.insertInto(spark, path, Seq((3, "c")).toDF("id", "v"))
    assert(ParquetTable.read(spark, path).count() === 3)

    val eDel = intercept[IllegalArgumentException] {
      ParquetTable.delete(spark, path, col("id") === 1)
    }
    assert(eDel.getMessage.contains("appendOnly"))
    val eUpd = intercept[IllegalArgumentException] {
      ParquetTable.update(spark, path, col("id") === 1, Map("v" -> lit("x")))
    }
    assert(eUpd.getMessage.contains("appendOnly"))
    val eMrg = intercept[IllegalArgumentException] {
      ParquetTable.merge(spark, path, Seq((1, "x")).toDF("id", "v"), Seq("id"))
    }
    assert(eMrg.getMessage.contains("appendOnly"))
    val ePurge = intercept[IllegalArgumentException] {
      ParquetTable.purge(spark, path, col("id") === 1)
    }
    assert(ePurge.getMessage.contains("appendOnly"))

    // content-preserving maintenance is allowed, like Delta
    ParquetTable.compact(spark, path)
    assert(ParquetTable.read(spark, path).count() === 3)

    // unset re-enables mutation
    TableProperties.unset(spark, path, Seq(TableProperties.AppendOnlyKey))
    ParquetTable.delete(spark, path, col("id") === 1)
    assert(ParquetTable.read(spark, path).count() === 2)
  }

  test("SQL: SET / UNSET / SHOW TBLPROPERTIES") {
    val path = tmpDir("props-sql") + "/t"
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE graft.`$path` SET TBLPROPERTIES ('owner' = 'a', 'x.y' = 'z')")
    val shown = graft.sql.GraftSql.sql(spark,
      s"SHOW TBLPROPERTIES graft.`$path`")
      .as[(String, String)].collect().toMap
    assert(shown === Map("owner" -> "a", "x.y" -> "z"))
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE graft.`$path` UNSET TBLPROPERTIES IF EXISTS ('x.y', 'nope')")
    assert(TableProperties.list(spark, path) === Seq("owner" -> "a"))
  }

  test("shallow clone carries properties (including appendOnly)") {
    val src = tmpDir("props-clone") + "/src"
    val tgt = tmpDir("props-clone") + "/tgt"
    ParquetTable.create(Seq((1, "a")).toDF("id", "v"), src)
    TableProperties.set(spark, src, Map(TableProperties.AppendOnlyKey -> "true"))
    ParquetTable.shallowClone(spark, src, tgt)
    val e = intercept[IllegalArgumentException] {
      ParquetTable.delete(spark, tgt, col("id") === 1)
    }
    assert(e.getMessage.contains("appendOnly"))
  }
}
