package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Differential properties for the round-7 analytics operators: each
  * distributed implementation is compared against an independent
  * single-threaded Scala reference fold over seeded ScalaCheck batches —
  * the same discipline as the MOR≡COW differential (any divergence in
  * ordering semantics, tie-breaks or null handling surfaces as a diff,
  * not an opinion).
  */
class AnalyticsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  private val eventGen: Gen[(Long, String, Int)] = for {
    user <- Gen.choose(1L, 12L)
    tpe <- Gen.oneOf("A", "B", "C", "X")
    t <- Gen.choose(0, 120)
  } yield (user, tpe, t)

  private def batch(seed: Long, n: Int = 150): Seq[(Long, String, Int)] =
    Gen.listOfN(n, eventGen)
      .apply(Gen.Parameters.default, Seed(seed)).getOrElse(sys.error("gen failed"))

  test("property: Funnel.stageTimes equals the per-user reference fold") {
    val stages = Seq("A", "B", "C")
    (1 to 5).foreach { s =>
      val rows = batch(s * 104729L)
      val df = rows.map { case (u, tp, m) => (u, tp, ts(m)) }
        .toDF("user_id", "event_type", "ts")
      val got = Funnel.stageTimes(df, "user_id", "event_type", "ts", stages)
        .collect()
        .map(r => r.getLong(0) -> (0 until stages.length).map(i => Option(r.getTimestamp(i + 1))))
        .toMap
      // reference: tk = min ts of stage k at-or-after t(k-1)
      val expected = rows.groupBy(_._1).map { case (u, evs) =>
        val times = stages.foldLeft(List.empty[Option[Int]]) { (acc, stage) =>
          val floor = acc.lastOption.getOrElse(Some(Int.MinValue))
          val t = floor.flatMap(f =>
            evs.filter(e => e._2 == stage && e._3 >= f).map(_._3).minOption)
          acc :+ t
        }
        u -> times.map(_.map(ts))
      }
      assert(got.keySet == expected.keySet)
      got.foreach { case (u, tgot) => assert(tgot == expected(u), s"user $u seed $s") }
    }
  }

  test("property: GapFill equals the reference resample+locf fold") {
    (1 to 5).foreach { s =>
      val rows = batch(s * 15485863L, n = 80).map { case (u, _, m) => (u, m / 10, m % 7 + 1.0) }
      val df = rows.map { case (u, b, v) =>
        (u, Timestamp.valueOf(f"2024-01-${b + 1}%02d 05:00:00"), v)
      }.toDF("k", "t", "v")
      val got = GapFill.resampleFill(df, "k", "t", "v")
        .select(col("k"), dayofmonth(col("bucket")).as("d"), col("value"), col("observed"))
        .as[(Long, Int, Double, Boolean)].collect().toSet
      val expected = rows.groupBy(_._1).flatMap { case (k, obs) =>
        val byDay = obs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
        val (lo, hi) = (byDay.keys.min, byDay.keys.max)
        var last = 0.0
        (lo to hi).map { d =>
          val observed = byDay.contains(d)
          if (observed) last = byDay(d)
          (k, d + 1, last, observed)
        }
      }.toSet
      assert(got == expected, s"seed $s")
    }
  }

  test("property: ParagraphDedup equals the reference first-occurrence fold") {
    val wordGen = Gen.oneOf("p1", "p2", "p3", "p4", "p5", "p6 long", "p7")
    (1 to 5).foreach { s =>
      val docs = Gen.listOfN(20, Gen.listOfN(4, wordGen))
        .apply(Gen.Parameters.default, Seed(s * 32452843L))
        .getOrElse(sys.error("gen failed"))
        .zipWithIndex.map { case (ps, i) => (i.toLong, ps.mkString("\n\n")) }
      val got = ParagraphDedup.dedup(docs.toDF("doc_id", "text"), "doc_id", "text")
        .select("doc_id", "clean_text")
        .as[(Long, String)].collect().toMap
      val seen = scala.collection.mutable.Set.empty[String]
      val expected = docs.map { case (id, text) =>
        val kept = text.split("\n\n").map(_.trim).filter(p => seen.add(p))
        id -> kept.mkString("\n\n")
      }.toMap
      assert(got == expected, s"seed $s")
    }
  }
}
