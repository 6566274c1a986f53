package graft.sources

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Differential property for APPLY CHANGES SCD2: for RANDOM change sets,
  * randomly partitioned into batches applied in RANDOM orders, the stored
  * interval history must (a) be identical across orders and (b) equal an
  * independent in-memory reference fold of the observation set — the
  * order-independence claim tested as a property, not three hand-picked
  * permutations (those live in ApplyChangesSpec).
  */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Chg(id: Int, v: String, seq: Long, del: Boolean)

  /** Distinct (id, seq) by construction: seqs are sampled without
    * replacement per key.
    */
  private def changeSet(seed: Long): List[Chg] = {
    val gen = for {
      nKeys <- Gen.choose(1, 5)
      perKey <- Gen.listOfN(nKeys, for {
        n <- Gen.choose(1, 6)
        seqs <- Gen.pick(n, 1L to 30L)
        rows <- Gen.sequence[List[(Long, String, Boolean)], (Long, String, Boolean)](
          seqs.toList.map(s => for {
            v <- Gen.alphaLowerStr.map(_.take(4))
            d <- Gen.frequency(4 -> false, 1 -> true)
          } yield (s, v, d)))
      } yield rows)
    } yield perKey.zipWithIndex.flatMap { case (rows, k) =>
      rows.map { case (s, v, d) => Chg(k + 1, v, s, d) }
    }
    gen.apply(Gen.Parameters.default, Seed(seed)).getOrElse(sys.error("gen failed"))
  }

  /** The reference fold, in plain Scala: per key, observations sorted by
    * seq chain into intervals; tombstones close and hide.
    */
  private def reference(chgs: List[Chg]): Set[(Int, Long, Option[Long], String)] =
    chgs.groupBy(_.id).flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_.seq)
      sorted.zip(sorted.drop(1).map(n => Some(n.seq)) :+ None).collect {
        case (c, end) if !c.del => (c.id, c.seq, end, c.v)
      }
    }.toSet

  /** Split `chgs` into batches at `bounds`, apply the batches in the
    * order given by `perm` (a permutation of the batch indices — every
    * batch exactly once), return the stored history.
    */
  private def applied(
      chgs: List[Chg], bounds: List[Int], perm: List[Int], tag: String)
      : Set[(Int, Long, Option[Long], String)] = {
    val path = tmpDir(s"scd2prop-$tag") + "/t"
    val batches = (List(0) ++ bounds.sorted ++ List(chgs.length))
      .distinct.sliding(2).collect { case List(a, b) if b > a => chgs.slice(a, b) }
      .toList
    assert(batches.flatten === chgs, "batch split lost rows")
    perm.map(batches(_)).foreach { b =>
      ApplyChanges.applyIntoScd2(spark, path,
        b.map(c => (c.id, c.v, c.seq, c.del)).toDF("id", "v", "seq", "del"),
        Seq("id"), "seq", deleteWhen = Some(col("del")))
    }
    ApplyChanges.readScd2(spark, path)
      .select(col("id"), col(ApplyChanges.StartCol), col(ApplyChanges.EndCol), col("v"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getString(3)))
      .toSet
  }

  test("property: random change sets, random batch orders -> one identical history == reference fold") {
    (1 to 6).foreach { trial =>
      val chgs = changeSet(trial * 104729L)
      val n = chgs.length
      val bounds = Gen.listOfN(3, Gen.choose(0, n))
        .apply(Gen.Parameters.default, Seed(trial * 31L)).get
      val nBatches = (List(0) ++ bounds.sorted ++ List(n))
        .distinct.sliding(2).count { case List(a, b) => b > a }
      val rng = new scala.util.Random(trial * 7L)
      val forwardOrder = (0 until nBatches).toList
      val shuffledOrder = rng.shuffle(forwardOrder)
      val forward = applied(chgs, bounds, forwardOrder, s"f$trial")
      val shuffled = applied(chgs, bounds, shuffledOrder, s"s$trial")
      val ref = reference(chgs)
      assert(forward === ref, s"trial $trial: forward != reference")
      assert(shuffled === ref, s"trial $trial: shuffled != reference")
    }
  }
}
