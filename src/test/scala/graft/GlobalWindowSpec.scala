package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{GlobalWindow, Labeler}

class GlobalWindowSpec extends SparkSpec {
  import spark.implicits._

  test("lagGlobal == unpartitioned lag, incl. null values in the column") {
    val df = (1 to 500).map { i =>
      (i.toLong, if (i % 17 == 0) null else java.lang.Double.valueOf(i * 1.5))
    }.toDF("k", "v").repartition(7) // scrambled input layout
    val viaGlobal = GlobalWindow.lagGlobal(df, Seq("k"), "v", "prev",
      bucketKey = col("k"), numPartitions = Some(8))
      .orderBy("k").select($"k", $"prev").collect().toSeq
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
    val viaGlobal = GlobalWindow.lagGlobal(df, Seq("k"), "v", "prev",
      bucketKey = col("k"), numPartitions = Some(8),
      quantileBuckets = true)
      .orderBy("k").select($"k", $"prev").collect().toSeq
    val viaSingle = df
      .withColumn("prev", lag($"v", 1).over(Window.orderBy($"k")))
      .orderBy("k").select($"k", $"prev").collect().toSeq
    assert(viaGlobal == viaSingle)
  }

  test("lagGlobal handles more partitions than rows (empty ranges)") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val out = GlobalWindow.lagGlobal(df, Seq("k"), "v", "prev",
      bucketKey = col("k"), numPartitions = Some(16))
      .orderBy("k").select($"prev").collect()
      .map(r => Option(r.get(0))).toSeq
    assert(out == Seq(None, Some(10.0), Some(20.0)))
  }

  test("lagLabelGlobal == compat Labeler.label on the fixture") {
    val bars = StockFixture.bars(spark, nDays = 3, minutesPerDay = 50)
    val scalable = GlobalWindow.lagLabelGlobal(bars, Seq("date"), unix_micros(col("date")))
      .orderBy("date").select($"buy_or_sell").as[Int].collect().toSeq
    val compat = Labeler.label(bars)
      .orderBy("date").select($"buy_or_sell").as[Int].collect().toSeq
    assert(scalable == compat)
  }

  test("leadGlobal == unpartitioned lead, incl. nulls and empty buckets") {
    val df = (1 to 300).map { i =>
      (i.toLong, if (i % 13 == 0) null else java.lang.Double.valueOf(i * 2.5))
    }.toDF("k", "v").repartition(5)
    val viaGlobal = GlobalWindow.leadGlobal(df, Seq("k"), "v", "next",
      bucketKey = col("k"), numPartitions = Some(9))
      .orderBy("k").select($"k", $"next").collect().toSeq
    val viaSingle = df
      .withColumn("next", lead($"v", 1).over(Window.orderBy($"k")))
      .orderBy("k").select($"k", $"next").collect().toSeq
    assert(viaGlobal == viaSingle)
  }

  test("plan has no single-partition exchange") {
    val bars = StockFixture.bars(spark, nDays = 2, minutesPerDay = 30)
    val plan = GlobalWindow.lagLabelGlobal(bars, Seq("date"), unix_micros(col("date")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange found:\n$plan")
  }
}
