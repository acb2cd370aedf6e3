package graft

import org.apache.spark.sql.functions._

import graft.operators.FeaturePipeline

/** The multi-symbol (100 TB-shape) pipeline: per-symbol windows, no
  * global-order operator. Per symbol it must equal the single-symbol
  * pipeline run on that symbol's bars alone. */
class MultiSymbolSpec extends SparkSpec {
  import spark.implicits._

  private lazy val barsA = StockFixture.bars(spark, nDays = 3)
  // second symbol: same shape, shifted values (a pure column map keeps
  // the fixture deterministic)
  private lazy val barsB = {
    val numeric = barsA.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.DoubleType)
      .map(_.name)
    numeric.foldLeft(barsA) { (df, c) =>
      df.withColumn(c, col(c) * 1.25 + 2.0)
    }
  }
  private lazy val multi =
    barsA.withColumn("symbol", lit("A"))
      .unionByName(barsB.withColumn("symbol", lit("B")))

  test("fastPerSymbol == fast per symbol (both label variants)") {
    // aggregation order differs between the two plans, so double
    // aggregates can differ in the last bits — compare keyed by date
    // with relative tolerance; exact columns (label) must match exactly
    for (lead <- Seq(false, true)) {
      val whole = FeaturePipeline.fastPerSymbol(multi, "symbol",
        useLead = lead)
      for ((sym, bars) <- Seq("A" -> barsA, "B" -> barsB)) {
        val single = FeaturePipeline.fast(bars, useLead = lead)
        val cols = single.columns.sorted
        def keyed(df: org.apache.spark.sql.DataFrame) =
          df.select(cols.map(col).toSeq: _*).collect()
            .map(r => r.getAs[java.sql.Timestamp]("date") -> r).toMap
        val got = keyed(whole.filter($"symbol" === sym).drop("symbol"))
        val want = keyed(single)
        assert(got.keySet == want.keySet, s"row keys diverged ($sym)")
        for ((k, w) <- want; g = got(k); i <- cols.indices) {
          (w.get(i), g.get(i)) match {
            case (a: java.lang.Double, b: java.lang.Double) =>
              assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)),
                s"$sym lead=$lead ${cols(i)} @ $k: $a vs $b")
            case (a, b) =>
              assert(a == b, s"$sym lead=$lead ${cols(i)} @ $k: $a vs $b")
          }
        }
      }
    }
  }

  test("fastPerSymbol plans no single-partition exchange") {
    val plan = FeaturePipeline.fastPerSymbol(multi, "symbol")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("No Partition Defined"))
  }

  test("fastPerSymbol preserves per-symbol row counts") {
    val out = FeaturePipeline.fastPerSymbol(multi, "symbol")
      .groupBy($"symbol").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = barsA.count()
    assert(out == Map("A" -> n, "B" -> n))
  }
}
