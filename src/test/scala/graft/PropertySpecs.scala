package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators.{DailyAggregates, Dedup, Labeler}

/** Property-based invariants (SURVEY.md §5.2): scalacheck-generated
  * inputs, laws the operators must hold for ANY data, not just fixtures.
  * (No scalatestplus bridge in the offline cache — a seeded sampler
  * drives the generators deterministically.) */
class PropertySpecs extends SparkSpec {
  import spark.implicits._

  /** Deterministic forAll: evaluate `f` on `n` seeded samples of `gen`. */
  private def forAll[T](gen: Gen[T], n: Int = 12)(f: T => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    (0 until n).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val barsGen: Gen[List[(Timestamp, Double)]] = for {
    n <- Gen.choose(1, 40)
    highs <- Gen.listOfN(n, Gen.choose(1.0, 1000.0))
  } yield highs.zipWithIndex.map { case (h, i) =>
    (Timestamp.valueOf(java.time.LocalDateTime
      .of(2020, 1, 6, 9, 30).plusMinutes(i.toLong)), h)
  }

  test("label is always in {0,1}; first row is 0; row count preserved") {
    forAll(barsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("date", "high")
        val labeled = Labeler.label(df).orderBy("date")
          .select($"buy_or_sell").as[Int].collect().toSeq
        assert(labeled.size == rows.size)
        assert(labeled.forall(l => l == 0 || l == 1))
        // LAG of the first row is null -> otherwise-branch -> 0
        assert(labeled.head == 0)
      }
    }
  }

  test("LAG label and LEAD label are shifted complements on strict data") {
    forAll(barsGen) { rows =>
      whenever(rows.size >= 2) {
        val df = rows.toDF("date", "high")
        val lagL = Labeler.label(df).orderBy("date")
          .select($"buy_or_sell").as[Int].collect().toSeq
        val leadL = Labeler.label(df, useLead = true).orderBy("date")
          .select($"buy_or_sell").as[Int].collect().toSeq
        // lag label at t says high(t-1) > high(t); lead label at t-1 says
        // high(t) > high(t-1): both 1 only if equal highs — impossible on
        // strict comparisons, so never (1,1) on the shifted pair
        lagL.drop(1).zip(leadL.dropRight(1)).foreach { case (a, b) =>
          assert(!(a == 1 && b == 1))
        }
      }
    }
  }

  test("daily avg: value between per-day min and max; one row per day") {
    forAll(barsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("date", "close")
        val daily = DailyAggregates.avgOpen(
          DailyAggregates.withDateOnly(df).withColumnRenamed("close", "open"))
        val nDays = DailyAggregates.withDateOnly(df)
          .select($"date_only").distinct().count()
        assert(daily.count() == nDays)
        val lo = rows.map(_._2).min
        val hi = rows.map(_._2).max
        daily.select($"avg_open").as[Double].collect().foreach { v =>
          assert(v >= lo - 1e-9 && v <= hi + 1e-9)
        }
      }
    }
  }

  private val docGen: Gen[List[String]] = Gen.choose(1, 25).flatMap { n =>
    Gen.listOfN(n, Gen.choose(0, 12).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
        .map(_.mkString(" "))))
  }

  test("exact dedup: keep_id is a real doc id; n_copies sums to doc count") {
    forAll(docGen) { docs =>
      whenever(docs.nonEmpty) {
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val out = Dedup.exactDedup(df).collect()
        assert(out.map(_.getLong(2)).sum == docs.size)
        val ids = (0L until docs.size.toLong).toSet
        assert(out.map(_.getLong(1)).forall(ids.contains))
      }
    }
  }

  test("minhash containment: identical docs always collide in every band") {
    forAll(Gen.listOfN(6, Gen.oneOf("a b c d e f", "x y z w v u",
      "a b c x y z"))) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val pairs = Dedup.lshCandidatePairs(df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // every pair of identical texts must be a candidate
      for {
        (t1, i) <- texts.zipWithIndex
        (t2, j) <- texts.zipWithIndex
        if i < j && t1 == t2
      } assert(pairs.contains((i.toLong, j.toLong)),
        s"identical docs ($i,$j) not candidates: $pairs")
    }
  }
}
