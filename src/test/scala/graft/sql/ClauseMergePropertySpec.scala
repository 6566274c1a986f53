package graft.sql

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.sources.ParquetTable

/** Differential property for the conditional-clause MERGE: random
  * target/source batches and random clause programs, each executed
  * through the full SQL path (parse → clause image → versioned commit)
  * and compared against an independent single-threaded reference fold
  * implementing the SQL MERGE clause semantics directly (first
  * satisfied clause wins, null conditions fall through, unmatched
  * source needs the insert clause, by-source clauses govern
  * source-absent rows).
  */
// top-level: Spark needs an outer-scope-free encoder for Dataset[R]
case class ClauseMergeRow(id: Long, flag: String, v: Double)

class ClauseMergePropertySpec extends SparkSpec {
  import spark.implicits._

  private type R = ClauseMergeRow
  private val R = ClauseMergeRow

  private val rowGen: Gen[R] = for {
    id <- Gen.choose(1L, 30L) // overlap between target and source likely
    flag <- Gen.oneOf("a", "b", "c")
    v <- Gen.choose(-50, 150).map(_.toDouble) // integral doubles: exact
  } yield R(id, flag, v)

  private def batch(seed: Long, n: Int): Seq[R] =
    Gen.listOfN(n, rowGen).apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))
      // MERGE dedups source by pk nondeterministically; make ids unique
      // so the reference fold sees the same rows
      .groupBy(_.id).map(_._2.head).toSeq

  // clause conditions as (SQL over aliases t/s, reference predicate)
  private val matchedConds: Seq[(Option[String], (R, R) => Boolean)] = Seq(
    (None, (_, _) => true),
    (Some("t.v < 50.0"), (t, _) => t.v < 50.0),
    (Some("s.flag = 'a'"), (_, s) => s.flag == "a"),
    (Some("s.v > t.v"), (t, s) => s.v > t.v))

  private def referenceMerge(
      target: Seq[R], source: Seq[R],
      clauses: Seq[(Option[String], (R, R) => Boolean, Boolean)], // (sql, pred, isDelete)
      insertCond: Option[(R => Boolean)]): Set[R] = {
    val srcById = source.map(r => r.id -> r).toMap
    val kept = target.flatMap { t =>
      srcById.get(t.id) match {
        case None => Some(t)
        case Some(s) =>
          clauses.find { case (_, pred, _) => pred(t, s) } match {
            case None => Some(t)                       // no clause fired: keep
            case Some((_, _, true)) => None            // DELETE
            case Some((_, _, false)) => Some(s)        // UPDATE SET *
          }
      }
    }
    val targetIds = target.map(_.id).toSet
    val inserted = source.filter(s =>
      !targetIds.contains(s.id) && insertCond.exists(_(s)))
    (kept ++ inserted).toSet
  }

  test("property: SQL clause merge equals the reference fold over random programs") {
    runTrials(partitioned = false)
  }

  test("property: partitioned targets — same semantics through the partition-scoped path") {
    runTrials(partitioned = true)
  }

  private def runTrials(partitioned: Boolean): Unit = {
    (1 to 6).foreach { trial =>
      val target = batch(trial * 7919L, 20)
      val source = batch(trial * 104729L + 13, 15)
      // random clause program: 1-2 matched clauses + optional insert
      val condIdx = trial % matchedConds.length
      val (c1sql, c1pred) = matchedConds(condIdx)
      val (c2sql, c2pred) = matchedConds((trial + 1) % matchedConds.length)
      val firstIsDelete = trial % 2 == 0
      val withInsert = trial % 3 != 0
      val insertCond = if (withInsert) Some((_: R) => true) else None
      // Spark's grammar: only the LAST matched clause may omit its
      // condition — an unconditional first clause collapses the program
      val program: Seq[(Option[String], (R, R) => Boolean, Boolean)] =
        if (c1sql.isEmpty) Seq((c1sql, c1pred, firstIsDelete))
        else Seq((c1sql, c1pred, firstIsDelete), (c2sql, c2pred, !firstIsDelete))

      val dir = java.nio.file.Files.createTempDirectory("cmprop").toString
      val path = s"$dir/t"
      // partitioned tier: day derived from id, so the pk→partition
      // stability contract the merge documents holds by construction
      def withDay(rs: Seq[R]) = rs.toDF()
        .withColumn("day", concat(lit("d"), (col("id") % 3).cast("string")))
      if (partitioned)
        ParquetTable.createVersioned(withDay(target), path, Seq("day"))
      else ParquetTable.create(target.toDF(), path)
      (if (partitioned) withDay(source) else source.toDF())
        .createOrReplaceTempView(s"cmp_src_$trial")
      val matchedSql = program.map { case (cSql, _, isDel) =>
        val cond = cSql.map(c => s"AND $c ").getOrElse("")
        s"WHEN MATCHED ${cond}THEN ${if (isDel) "DELETE" else "UPDATE SET *"}"
      }.mkString("\n")
      val stmt =
        s"""MERGE INTO graft.`$path` AS t USING cmp_src_$trial AS s
           |ON t.id = s.id
           |$matchedSql
           |${if (withInsert) "WHEN NOT MATCHED THEN INSERT *" else ""}""".stripMargin
      GraftSql.sql(spark, stmt)

      val got = ParquetTable.read(spark, path)
        .select("id", "flag", "v").as[R].collect().toSet
      val expected = referenceMerge(target, source, program, insertCond)
      assert(got == expected,
        s"trial $trial diverged\nstmt:\n$stmt\n" +
          s"missing: ${expected -- got}\nextra: ${got -- expected}")
    }
  }
}
