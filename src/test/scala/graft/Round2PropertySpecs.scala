package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators.{Dedup, GlobalWindow, Resample}

/** Seeded property checks for the round-2 operators (hand-rolled forAll
  * — no scalatestplus bridge in the offline cache). */
class Round2PropertySpecs extends SparkSpec {
  import spark.implicits._

  private def forAll[T](gen: Gen[T], n: Int = 8)(f: T => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(1337L)
    (0 until n).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }

  private val ticksGen: Gen[List[(String, Long, Double)]] = for {
    n <- Gen.choose(5, 60)
    syms <- Gen.listOfN(n, Gen.oneOf("A", "B"))
    offs <- Gen.listOfN(n, Gen.choose(0L, 3600L))
    vals <- Gen.listOfN(n, Gen.choose(-50.0, 150.0))
  } yield syms.lazyZip(offs).lazyZip(vals).toList

  test("property: OHLC bar invariants (bounds, counts, mean)") {
    forAll(ticksGen) { ticks =>
      val df = ticks.zipWithIndex.map { case ((s, off, v), i) =>
        (s, new Timestamp(1577836800000L + off * 1000L), i.toLong, v)
      }.toDF("sym", "ts", "id", "v")
      val bars = Resample.ohlc(df, "ts", "v", 300L, Seq("sym"), Seq("id"))
        .collect()
      assert(bars.map(_.getAs[Long]("n")).sum == ticks.size)
      bars.foreach { b =>
        val (o, h, l, c, avg) = (b.getAs[Double]("open"),
          b.getAs[Double]("high"), b.getAs[Double]("low"),
          b.getAs[Double]("close"), b.getAs[Double]("avg_value"))
        assert(l <= math.min(o, c) && math.max(o, c) <= h)
        // avg folds in DECIMAL(28,6): inputs quantize to 1e-6, so the
        // mean can sit up to 0.5e-6 outside [low, high] for raw doubles
        assert(avg >= l - 1e-6 && avg <= h + 1e-6)
      }
    }
  }

  private val seriesGen: Gen[List[(Long, Option[Double])]] = for {
    n <- Gen.choose(1, 80)
    keys <- Gen.listOfN(n, Gen.choose(0L, 40L)) // duplicate keys likely
    vals <- Gen.listOfN(n,
      Gen.option(Gen.choose(-10.0, 10.0)))
  } yield keys.distinct.sorted.zip(vals) // unique keys, arbitrary values

  test("property: lagGlobal == unpartitioned lag on random keyed series") {
    forAll(seriesGen) { rows =>
      val df = rows.map { case (k, v) =>
        (k, v.map(Double.box).orNull.asInstanceOf[java.lang.Double])
      }.toDF("k", "v").repartition(3)
      val got = GlobalWindow.lagGlobal(df, Seq("k"), "v", "prev",
        bucketKey = col("k"), numPartitions = Some(4))
        .orderBy("k").select($"prev").collect()
        .map(r => Option(r.get(0))).toSeq
      val want = df.withColumn("prev", lag($"v", 1).over(Window.orderBy($"k")))
        .orderBy("k").select($"prev").collect()
        .map(r => Option(r.get(0))).toSeq
      assert(got == want)
    }
  }

  test("property: dupSpanFraction in [0,1]; identical twins fully shared") {
    val wordsGen = Gen.listOfN(12, Gen.oneOf(
      "spark", "scan", "merge", "join", "sort", "agg", "row", "col"))
    forAll(Gen.listOfN(6, wordsGen), n = 4) { docsWords =>
      val texts = docsWords.map(_.mkString(" "))
      // append an identical twin of doc 0
      val docs = (texts :+ texts.head).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val r = Dedup.dupSpanFraction(docs).collect()
        .map(row => row.getLong(0) -> row.getDouble(3)).toMap
      r.values.foreach(f => assert(f >= 0.0 && f <= 1.0))
      // the twin pair shares every span
      assert(r(0L) == 1.0 && r(texts.size.toLong) == 1.0)
    }
  }
}
