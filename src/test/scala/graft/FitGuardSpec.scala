package graft

import org.apache.spark.sql.functions._

import graft.ml.MlPipelines

/** The iterative-fit PARALLELISM GATE
  * ([[graft.ml.MlPipelines.guardFitParallelism]], r13 VERDICT
  * "missing" #2): a shuffle-free single-partition frame entering any
  * MlPipelines fit on a wide session must FAIL LOUDLY (the r12 qm1
  * cliff — every treeAggregate round single-core), while explicit
  * fitPartitions, naturally-shuffled inputs, and narrow test sessions
  * all pass untouched. Armed here via the
  * `spark.graft.ml.guardMinCores` override (the shared test session
  * is local[4], below the production threshold of 8). */
class FitGuardSpec extends SparkSpec {

  private def features = spark.range(0, 400).select(
    (col("id") % 2).cast("int").as("buy_or_sell"),
    (col("id") % 7).cast("double").as("f1"),
    (col("id") % 11).cast("double").as("f2"))

  private def armed[T](body: => T): T = {
    spark.conf.set("spark.graft.ml.guardMinCores", "2")
    try body
    finally spark.conf.unset("spark.graft.ml.guardMinCores")
  }

  test("a 1-partition shuffle-free fit input is REFUSED, naming the " +
    "fix, on every fit entry point") {
    val one = features.coalesce(1)
    armed {
      val e = intercept[IllegalStateException] {
        MlPipelines.fitPredict(one, Seq("f1", "f2"),
          MlPipelines.rfMllibParity())
      }
      assert(e.getMessage.contains("fitPartitions"), e.getMessage)
      intercept[IllegalStateException] {
        MlPipelines.scaledPca(one, Seq("f1", "f2"), k = 1, prefix = "g")
      }
      intercept[IllegalStateException] {
        MlPipelines.correlationMatrix(one, Seq("f1", "f2"))
      }
      intercept[IllegalStateException] {
        MlPipelines.crossValidate(one, Seq("f1", "f2"), numFolds = 2)
      }
    }
  }

  test("explicit fitPartitions satisfies the gate (the catalog's qm " +
    "call shape), and a shuffled input passes with no probe") {
    armed {
      val (_, pred) = MlPipelines.fitPredict(features.coalesce(1),
        Seq("f1", "f2"), MlPipelines.rfMllibParity(),
        fitPartitions = Some(4))
      assert(pred.count() > 0L)
      // a groupBy-shaped (shuffled) frame is never the cliff
      val shuffled = features.repartition(4)
      val (_, model) = MlPipelines.scaledPca(shuffled, Seq("f1", "f2"),
        k = 1, prefix = "g2")
      assert(model.explainedVariance.size == 1)
    }
  }

  test("below the core threshold the gate stands down: the narrow " +
    "test session trains a 1-partition frame as before") {
    // no override — production threshold 8 > local[4]
    val (_, pred) = MlPipelines.fitPredict(features.coalesce(1),
      Seq("f1", "f2"), MlPipelines.rfMllibParity())
    assert(pred.count() > 0L)
  }
}
