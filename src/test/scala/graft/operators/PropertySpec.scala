package graft.operators

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.schemas.Schemas
import graft.sources.ParquetTable

/** Property tests over ScalaCheck-generated order batches (seeded, so runs
  * are reproducible) — strictly stronger than the reference's count-only
  * unit tests (SURVEY §5).
  */
class PropertySpec extends SparkSpec {

  private val ts = Timestamp.valueOf("2025-04-01 10:00:00")
  private val day = Date.valueOf("2025-04-01")

  private val orderGen: Gen[Row] = for {
    num <- Gen.choose(1, 500)
    id <- Gen.option(Gen.choose(1, 80)) // duplicates + nulls likely
    user <- Gen.option(Gen.choose(1, 20))
    t <- Gen.oneOf(Seq(ts, null))
    amount <- Gen.oneOf(Gen.choose(-50.0, 200.0).map(Double.box), Gen.const(null))
  } yield Row(num, id.map(Int.box).orNull, user.map(Int.box).orNull, t, amount, day)

  private def batches(n: Int): Seq[List[Row]] =
    (1 to n).map(i => Gen.listOfN(60, orderGen)
      .apply(Gen.Parameters.default, Seed(i.toLong * 7919))
      .getOrElse(sys.error("gen failed")))

  test("property: valid ∪ rejected partitions every generated batch") {
    batches(5).foreach { rows =>
      val df = frame(Schemas.orders, rows)
      val r = Validator.split(df, Schemas.ordersSpec)
      assert(r.valid.count() + r.rejected.count() === rows.length.toLong)
      // and no valid row violates any rule
      val bad = r.valid.filter(
        col("order_id").isNull || col("user_id").isNull
          || col("order_timestamp").isNull
          || (col("total_amount").isNotNull && col("total_amount") <= 0)).count()
      assert(bad === 0L)
    }
  }

  test("property: post-merge table has unique PKs and merge is idempotent") {
    batches(3).foreach { rows =>
      val df = frame(Schemas.orders, rows)
      val valid = Validator.split(df, Schemas.ordersSpec).valid
      val path = tmpDir("prop-merge") + "/t"
      ParquetTable.merge(spark, path, valid, Seq("order_id"))
      val after1 = ParquetTable.read(spark, path)
      val n1 = after1.count()
      assert(after1.select("order_id").distinct().count() === n1)
      ParquetTable.merge(spark, path, valid, Seq("order_id")) // replay
      assert(ParquetTable.read(spark, path).count() === n1)
    }
  }

  test("property: merge-on-read and copy-on-write commit identical images and feeds") {
    // differential testing of the two merge tiers: for ANY generated
    // base/update split, both tiers must publish the same table image
    // AND the same per-commit change feed — the storage layout is the
    // only thing allowed to differ. Updates are pk-deduplicated HERE:
    // each tier dedups independently, and which row survives a
    // duplicate pk is arbitrary per evaluation — cross-tier dup
    // determinism is not a promised property (the reconstruction
    // property below covers dup-PK batches within one tier).
    batches(3).zipWithIndex.foreach { case (rows, i) =>
      val valid = Validator.split(frame(Schemas.orders, rows), Schemas.ordersSpec).valid
      val base = valid.filter(col("order_num") % 2 === 0).dropDuplicates(Seq("order_id"))
      val updates = valid.filter(col("order_num") % 2 =!= 0)
        .dropDuplicates(Seq("order_id"))
      if (base.isEmpty || updates.isEmpty) ()
      else {
        val morPath = tmpDir(s"prop-mor$i") + "/t"
        val cowPath = tmpDir(s"prop-cow$i") + "/t"
        ParquetTable.create(base, morPath)
        ParquetTable.create(base, cowPath)
        ParquetTable.merge(spark, morPath, updates, Seq("order_id"),
          cdf = true, mergeOnRead = Some(true))
        ParquetTable.merge(spark, cowPath, updates, Seq("order_id"),
          cdf = true, mergeOnRead = Some(false))
        def image(p: String) =
          ParquetTable.read(spark, p).collect().map(_.toSeq).toSet
        assert(image(morPath) === image(cowPath), s"seed $i: images diverge")
        // feeds may disagree only on the arbitrary dup-PK pick; with the
        // same committed image they must be identical
        def feed(p: String) = ParquetTable.tableChanges(spark, p, 2L, 2L, Seq("order_id"))
          .collect().map(_.toSeq).toSet
        assert(feed(morPath) === feed(cowPath), s"seed $i: change feeds diverge")
      }
    }
  }

  test("property: partitioned MOR and rewrite tiers commit identical images and feeds") {
    // the partitioned twin of the differential property above, over
    // batches spanning TWO partitions — exercises append-entry slices,
    // per-partition DV scoping, and new-partition inserts in one go
    val day2 = Date.valueOf("2025-04-02")
    val pGen: Gen[Row] = for {
      num <- Gen.choose(1, 500)
      id <- Gen.choose(1, 80)
      user <- Gen.choose(1, 20)
      amount <- Gen.choose(0.5, 200.0)
      d <- Gen.oneOf(day, day2)
    } yield Row(num, id, user, ts, amount, d)
    (1 to 3).foreach { seed =>
      val rows = Gen.listOfN(60, pGen)
        .apply(Gen.Parameters.default, Seed(seed.toLong * 104729))
        .getOrElse(sys.error("gen failed"))
      val all = frame(Schemas.orders, rows)
      val base = all.filter(col("order_num") % 2 === 0).dropDuplicates(Seq("order_id"))
      val updates = all.filter(col("order_num") % 2 =!= 0).dropDuplicates(Seq("order_id"))
      if (!base.isEmpty && !updates.isEmpty) {
        val morPath = tmpDir(s"prop-pmor$seed") + "/t"
        val cowPath = tmpDir(s"prop-pcow$seed") + "/t"
        ParquetTable.createVersioned(base, morPath, Seq("date"))
        ParquetTable.createVersioned(base, cowPath, Seq("date"))
        ParquetTable.mergeVersioned(spark, morPath, updates, Seq("order_id"),
          Seq("date"), cdf = true, mergeOnRead = Some(true))
        ParquetTable.mergeVersioned(spark, cowPath, updates, Seq("order_id"),
          Seq("date"), cdf = true, mergeOnRead = Some(false))
        def image(p: String) =
          ParquetTable.read(spark, p).collect().map(_.toSeq).toSet
        assert(image(morPath) === image(cowPath), s"seed $seed: images diverge")
        def feed(p: String) = ParquetTable.tableChanges(spark, p, 2L, 2L, Seq("order_id"))
          .collect().map(_.toSeq).toSet
        assert(feed(morPath) === feed(cowPath), s"seed $seed: change feeds diverge")
      }
    }
  }

  test("property: applying the captured change feed reconstructs the commit") {
    // algebra of CDF: v2 = (v1 minus preimage/delete keys) ∪ postimages ∪
    // inserts — must hold for ANY update batch, including ones whose
    // duplicate PKs force the merge to pick one row per key (the feed is
    // captured from the COMMITTED image, so it can never disagree)
    batches(3).zipWithIndex.foreach { case (rows, i) =>
      val valid = Validator.split(frame(Schemas.orders, rows), Schemas.ordersSpec).valid
      val base = valid.filter(col("order_num") % 2 === 0).dropDuplicates(Seq("order_id"))
      val updates = valid.filter(col("order_num") % 2 =!= 0) // dup PKs likely
      if (base.isEmpty || updates.isEmpty) () // nothing to commit this seed
      else {
        val path = tmpDir(s"prop-cdf$i") + "/t"
        ParquetTable.create(base, path) // v1
        ParquetTable.merge(spark, path, updates, Seq("order_id"), cdf = true) // v2
        val feed = ParquetTable.tableChanges(spark, path, 2L, 2L, Seq("order_id"))
          .collect()
        val replacedKeys = feed
          .filter(r => Set("update_preimage", "delete")(r.getAs[String]("_change_type")))
          .map(_.getAs[Int]("order_id")).toSet
        val newImages = feed
          .filter(r => Set("update_postimage", "insert")(r.getAs[String]("_change_type")))
          .map(_.toSeq.dropRight(2)).toSet // drop _change_type, _commit_version
        val v1 = ParquetTable.readAt(spark, path, 1L).collect()
        val reconstructed = v1
          .filterNot(r => replacedKeys.contains(r.getAs[Int]("order_id")))
          .map(_.toSeq).toSet ++ newImages
        val v2 = ParquetTable.readAt(spark, path, 2L).collect().map(_.toSeq).toSet
        assert(reconstructed === v2, s"seed $i: feed does not reconstruct the commit")
      }
    }
  }
}
