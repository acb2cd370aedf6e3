package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{GlobalWindow, Labeler}

class GlobalWindowSpec extends SparkSpec {
  import spark.implicits._

  /** Run `body` with the small-input fast path disabled, so the bucketed
    * stitch logic is what these equality tests actually exercise. */
  private def forceScalablePath[T](body: => T): T = {
    spark.conf.set(GlobalWindow.SmallInputConfKey, "0")
    try body
    finally spark.conf.unset(GlobalWindow.SmallInputConfKey)
  }

  test("lagGlobal small-input fast path == unpartitioned lag") {
    // default threshold (64 MiB) triggers the fast path on this input;
    // equality must hold on either path
    val df = (1 to 200).map { i =>
      (i.toLong, if (i % 11 == 0) null else java.lang.Double.valueOf(i * 0.5))
    }.toDF("k", "v").repartition(3)
    val fast = GlobalWindow.lagGlobal(df, Seq("k"), "v", "prev",
      bucketKey = col("k"))
      .orderBy("k").select($"k", $"prev").collect().toSeq
    val single = df
      .withColumn("prev", lag($"v", 1).over(Window.orderBy($"k")))
      .orderBy("k").select($"k", $"prev").collect().toSeq
    assert(fast == single)
    // and the fast path really is one plain window (no bucket column)
    val plan = GlobalWindow.lagGlobal(df, Seq("k"), "v", "prev",
      bucketKey = col("k")).queryExecution.executedPlan.toString
    assert(!plan.contains("_bucket"), "fast path should skip bucketing")
  }

  test("lagGlobal == unpartitioned lag, incl. null values in the column") {
    val df = (1 to 500).map { i =>
      (i.toLong, if (i % 17 == 0) null else java.lang.Double.valueOf(i * 1.5))
    }.toDF("k", "v").repartition(7) // scrambled input layout
    val viaGlobal = forceScalablePath {
      GlobalWindow.lagGlobal(df, Seq("k"), "v", "prev",
        bucketKey = col("k"), numPartitions = Some(8))
        .orderBy("k").select($"k", $"prev").collect().toSeq
    }
    val viaSingle = df
      .withColumn("prev", lag($"v", 1).over(Window.orderBy($"k")))
      .orderBy("k").select($"k", $"prev").collect().toSeq
    assert(viaGlobal == viaSingle)
  }

  test("lagGlobal quantile-bucket mode (skew path) == unpartitioned lag") {
    // heavily skewed key: 90% of rows share one bucketKey region
    val df = (1 to 400).map { i =>
      val k = if (i <= 360) i.toLong else 100000L + i
      (k, i * 0.5)
    }.toDF("k", "v").repartition(5)
    val viaGlobal = forceScalablePath {
      GlobalWindow.lagGlobal(df, Seq("k"), "v", "prev",
        bucketKey = col("k"), numPartitions = Some(8),
        quantileBuckets = true)
        .orderBy("k").select($"k", $"prev").collect().toSeq
    }
    val viaSingle = df
      .withColumn("prev", lag($"v", 1).over(Window.orderBy($"k")))
      .orderBy("k").select($"k", $"prev").collect().toSeq
    assert(viaGlobal == viaSingle)
  }

  test("lagGlobal handles more partitions than rows (empty ranges)") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val out = forceScalablePath {
      GlobalWindow.lagGlobal(df, Seq("k"), "v", "prev",
        bucketKey = col("k"), numPartitions = Some(16))
        .orderBy("k").select($"prev").collect()
        .map(r => Option(r.get(0))).toSeq
    }
    assert(out == Seq(None, Some(10.0), Some(20.0)))
  }

  test("lagLabelGlobal == compat Labeler.label on the fixture") {
    val bars = StockFixture.bars(spark, nDays = 3, minutesPerDay = 50)
    val scalable = forceScalablePath {
      GlobalWindow.lagLabelGlobal(bars, Seq("date"), unix_micros(col("date")))
        .orderBy("date").select($"buy_or_sell").as[Int].collect().toSeq
    }
    val compat = Labeler.label(bars)
      .orderBy("date").select($"buy_or_sell").as[Int].collect().toSeq
    assert(scalable == compat)
  }

  test("leadGlobal == unpartitioned lead, incl. nulls and empty buckets") {
    val df = (1 to 300).map { i =>
      (i.toLong, if (i % 13 == 0) null else java.lang.Double.valueOf(i * 2.5))
    }.toDF("k", "v").repartition(5)
    val viaGlobal = forceScalablePath {
      GlobalWindow.leadGlobal(df, Seq("k"), "v", "next",
        bucketKey = col("k"), numPartitions = Some(9))
        .orderBy("k").select($"k", $"next").collect().toSeq
    }
    val viaSingle = df
      .withColumn("next", lead($"v", 1).over(Window.orderBy($"k")))
      .orderBy("k").select($"k", $"next").collect().toSeq
    assert(viaGlobal == viaSingle)
  }

  test("lagGlobal offset k>1 == unpartitioned lag(k), k in {2, 5}") {
    // nulls in the value column, scrambled layout, buckets narrower than
    // k (16 partitions over 120 rows -> ~8-row buckets, so a k=5 stitch
    // must reach across MULTIPLE preceding buckets, incl. empty ones)
    val df = (1 to 120).map { i =>
      (i.toLong, if (i % 7 == 0) null else java.lang.Double.valueOf(i * 1.5))
    }.toDF("k", "v").repartition(6)
    for (k <- Seq(2, 5)) {
      val viaGlobal = forceScalablePath {
        GlobalWindow.lagGlobal(df, Seq("k"), "v", "prev",
          bucketKey = col("k"), numPartitions = Some(16), offset = k)
          .orderBy("k").select($"k", $"prev").collect().toSeq
      }
      val viaSingle = df
        .withColumn("prev", lag($"v", k).over(Window.orderBy($"k")))
        .orderBy("k").select($"k", $"prev").collect().toSeq
      assert(viaGlobal == viaSingle, s"offset $k")
    }
    // and the k>1 plan has no single-partition exchange either
    val plan = forceScalablePath {
      GlobalWindow.lagGlobal(df, Seq("k"), "v", "prev",
        bucketKey = col("k"), numPartitions = Some(16), offset = 5)
        .queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange found:\n$plan")
  }

  test("leadGlobal offset k>1 == unpartitioned lead(k), k in {2, 5}") {
    val df = (1 to 120).map { i =>
      (i.toLong, if (i % 7 == 0) null else java.lang.Double.valueOf(i * 1.5))
    }.toDF("k", "v").repartition(6)
    for (k <- Seq(2, 5)) {
      val viaGlobal = forceScalablePath {
        GlobalWindow.leadGlobal(df, Seq("k"), "v", "next",
          bucketKey = col("k"), numPartitions = Some(16), offset = k)
          .orderBy("k").select($"k", $"next").collect().toSeq
      }
      val viaSingle = df
        .withColumn("next", lead($"v", k).over(Window.orderBy($"k")))
        .orderBy("k").select($"k", $"next").collect().toSeq
      assert(viaGlobal == viaSingle, s"offset $k")
    }
  }

  test("rollingGlobal: borrowed-row frames == unpartitioned rolling " +
    "window (sum/avg/min/count, nulls, frames spanning buckets)") {
    val df = (1 to 120).map { i =>
      (i.toLong, if (i % 7 == 0) null else java.lang.Double.valueOf(i * 1.5))
    }.toDF("k", "v").repartition(6)
    val aggs = Seq(
      (sum($"v"), "r_sum"), (avg($"v"), "r_avg"),
      (min($"v"), "r_min"), (count($"v"), "r_n"))
    for (n <- Seq(1, 5)) {
      val viaGlobal = forceScalablePath {
        GlobalWindow.rollingGlobal(df, Seq("k"), aggs, frameRows = n,
          bucketKey = col("k"), numPartitions = Some(16))
          .orderBy("k").collect().toSeq
      }
      val w = Window.orderBy($"k").rowsBetween(-(n - 1), 0)
      val viaSingle = aggs.foldLeft(df) { case (d, (a, name)) =>
        d.withColumn(name, a.over(w))
      }.orderBy("k").collect().toSeq
      assert(viaGlobal == viaSingle, s"frameRows $n")
    }
    // and no single-partition exchange on the scalable plan
    val plan = forceScalablePath {
      GlobalWindow.rollingGlobal(df, Seq("k"), aggs, frameRows = 5,
        bucketKey = col("k"), numPartitions = Some(16))
        .queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange found:\n$plan")
  }

  test("rollingGlobalCentered: both-sided borrowed rows == unpartitioned " +
    "asymmetric ROWS frames (edges truncated, frames crossing buckets)") {
    val df = (1 to 200).map(i => (i.toLong, (i * 7 % 13) * 1.0))
      .toDF("k", "v").repartition(5)
    for ((b, a) <- Seq((3, 3), (0, 4), (5, 2), (2, 0), (0, 0))) {
      val viaGlobal = forceScalablePath {
        GlobalWindow.rollingGlobalCentered(df, Seq("k"),
          Seq((sum($"v"), "c_sum"), (count($"v"), "c_n"),
            (max($"v"), "c_max")),
          before = b, after = a, bucketKey = col("k"),
          numPartitions = Some(8))
          .orderBy($"k").collect().toSeq
      }
      val w = Window.orderBy($"k").rowsBetween(-b, a)
      val viaSingle = df
        .withColumn("c_sum", sum($"v").over(w))
        .withColumn("c_n", count($"v").over(w))
        .withColumn("c_max", max($"v").over(w))
        .orderBy($"k").collect().toSeq
      assert(viaGlobal == viaSingle, s"frame [$b preceding, $a following]")
    }
    val plan = forceScalablePath {
      GlobalWindow.rollingGlobalCentered(df, Seq("k"),
        Seq((sum($"v"), "c_sum")), before = 3, after = 3,
        bucketKey = col("k"), numPartitions = Some(8))
        .queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange found:\n$plan")
  }

  test("rollingGlobalRange: distributed borrowed bands == unpartitioned " +
    "RANGE frame (duplicate keys = peers, bands spanning buckets)") {
    // sparse keys with DUPLICATES (peers) and gaps larger than the
    // range, so bands cover zero, some, or many rows
    val rows = Seq(1L, 1L, 3L, 7L, 8L, 8L, 8L, 15L, 40L, 41L, 43L, 60L,
      61L, 61L, 90L, 91L, 95L, 120L, 121L, 150L).zipWithIndex.map {
      case (k, i) =>
        (k, if (i % 5 == 0) null else java.lang.Double.valueOf(i * 2.0))
    }
    val df = rows.toDF("k", "v").repartition(3)
    for (r <- Seq(0L, 5L, 30L)) {
      val viaGlobal = forceScalablePath {
        GlobalWindow.rollingGlobalRange(df, "k",
          Seq((sum($"v"), "r_sum"), (count($"v"), "r_n")),
          rangeBefore = r, numPartitions = Some(6))
          .orderBy($"k", $"v").collect().toSeq
      }
      val w = Window.orderBy($"k").rangeBetween(-r, 0)
      val viaSingle = df
        .withColumn("r_sum", sum($"v").over(w))
        .withColumn("r_n", count($"v").over(w))
        .orderBy($"k", $"v").collect().toSeq
      assert(viaGlobal == viaSingle, s"range $r")
    }
    val plan = forceScalablePath {
      GlobalWindow.rollingGlobalRange(df, "k",
        Seq((sum($"v"), "r_sum")), rangeBefore = 5L,
        numPartitions = Some(6))
        .queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange found:\n$plan")
  }

  test("rollingGlobalRange: constant orderKey (empty cuts) degrades to " +
    "the single-bucket window instead of failing analysis") {
    // every key identical → bucketCuts returns no cuts; the scalable
    // path must short-circuit (an empty band array() literal would be
    // NULL-typed and fail the filter lambda's getField at analysis)
    val df = (1 to 50).map(i => (7L, i * 1.5)).toDF("k", "v").repartition(4)
    val viaGlobal = forceScalablePath {
      GlobalWindow.rollingGlobalRange(df, "k",
        Seq((sum($"v"), "r_sum"), (count($"v"), "r_n")),
        rangeBefore = 5L, numPartitions = Some(6))
        .orderBy($"v").collect().toSeq
    }
    val w = Window.orderBy($"k").rangeBetween(-5L, 0)
    val viaSingle = df
      .withColumn("r_sum", sum($"v").over(w))
      .withColumn("r_n", count($"v").over(w))
      .orderBy($"v").collect().toSeq
    assert(viaGlobal == viaSingle)
  }

  test("skew-adaptive default: pathological key skew still yields " +
    "balanced buckets and unchanged results") {
    // 95% of rows pile into a tiny corner of the key range — equal-width
    // cuts would put ~all rows in bucket 0
    val df = (1 to 1000).map { i =>
      val k = if (i <= 950) i.toLong else 1000000L + i * 1000L
      (k, i * 0.5)
    }.toDF("k", "v").repartition(5)
    val result = forceScalablePath {
      GlobalWindow.lagGlobal(df, Seq("k"), "v", "prev",
        bucketKey = col("k"), numPartitions = Some(8))
    }
    val viaGlobal = result.orderBy("k").select($"k", $"prev")
      .collect().toSeq
    val viaSingle = df
      .withColumn("prev", lag($"v", 1).over(Window.orderBy($"k")))
      .orderBy("k").select($"k", $"prev").collect().toSeq
    assert(viaGlobal == viaSingle)
    // occupancy balance: the adaptive default must have switched to
    // quantile cuts, so no bucket holds the 95% lump — probe the actual
    // partition sizes of the bucketed output
    val parts = 8
    val occ = forceScalablePath {
      GlobalWindow.lagGlobal(df, Seq("k"), "v", "prev",
        bucketKey = col("k"), numPartitions = Some(parts))
        .rdd.mapPartitions(it => Iterator(it.size)).collect()
    }
    // equal-width cuts would leave >= 950 rows in one partition; quantile
    // cuts cap a bucket at ~125 (several buckets may hash-collide into
    // one partition, so allow headroom above uniform but well below the
    // lump)
    val maxPart = occ.max
    assert(maxPart < 800,
      s"fullest partition $maxPart of ${occ.toSeq} — skew not mitigated")
  }

  test("skew-adaptive default fires at LOW parallelism too (parts <= " +
    "threshold)") {
    // occupancy.max is bounded by parts, so with parts = 4 an absolute
    // > 4.0 test could never fire — the capped threshold must still
    // switch a fully-collapsed key to quantile cuts
    val df = (1 to 1000).map { i =>
      val k = if (i <= 950) i.toLong else 1000000L + i * 1000L
      (k, i * 0.5)
    }.toDF("k", "v").repartition(5)
    val occ = forceScalablePath {
      GlobalWindow.lagGlobal(df, Seq("k"), "v", "prev",
        bucketKey = col("k"), numPartitions = Some(4))
        .rdd.mapPartitions(it => Iterator(it.size)).collect()
    }
    assert(occ.max < 800,
      s"fullest partition ${occ.max} of ${occ.toSeq} — low-parts skew " +
        "not mitigated")
  }

  test("scalable path's plan has no single-partition exchange") {
    val bars = StockFixture.bars(spark, nDays = 2, minutesPerDay = 30)
    val plan = forceScalablePath {
      GlobalWindow.lagLabelGlobal(bars, Seq("date"), unix_micros(col("date")))
        .queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange found:\n$plan")
  }
}
