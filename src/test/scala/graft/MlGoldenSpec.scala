package graft

import org.apache.spark.sql.functions._

import graft.ml.MlPipelines

/** Seeded-metric goldens for the ML catalog (qm1–qm4 are `no_oracle`
  * rows-only in the driver's DuckDB gate — model training is not
  * SQL-expressible — so THIS spec is their regression net): at seed 42 /
  * 123 on the fixed sf0.001 tables with the session's fixed local[4]
  * partitioning, training is bit-deterministic (verified over repeated
  * runs), and the resulting metrics are pinned within tight tolerances.
  * A drift in RF/SVM/PCA behaviour (feature wiring, split logic,
  * hyperparameters, scaler config) moves these numbers and fails the
  * build, mirroring the reference's printed metrics
  * (`G_2_rf_nordd.py:72-74`, `G_2_rf_pca.py:109-142`). The synthetic
  * label is near-random by construction, so values near 0.5 are
  * expected — the gate is drift, not model quality. */
class MlGoldenSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def featureFrame = graft.queries.Oracle
    .table(spark, dir, "lineitem").select(
      (col("l_quantity") > 25).cast("int").as("buy_or_sell"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_linenumber").cast("double").as("lineno"))

  private val featCols =
    Seq("l_extendedprice", "l_discount", "l_tax", "lineno")

  private def approx(got: Double, want: Double, eps: Double,
      what: String): Unit =
    assert(math.abs(got - want) <= eps,
      s"$what drifted: got $got, golden $want (eps $eps)")

  test("GOLDEN qm1: RF (seed 42) AUC/accuracy/F1 pinned") {
    // fitPartitions = Some(32): the catalog's exact call shape (the
    // r13 single-file-scan fix) — and it makes the split/fit
    // partitioning an explicit constant instead of whatever the scan
    // planned, so the golden is machine-independent too
    val (_, pred) = MlPipelines.fitPredict(featureFrame, featCols,
      MlPipelines.rfMllibParity(), fitPartitions = Some(32))
    val m = MlPipelines.evaluate(pred)
    approx(m("areaUnderROC"), 0.5129373596952858, 1e-6, "rf AUC")
    approx(m("accuracy"), 0.5126005361930295, 1e-6, "rf accuracy")
    approx(m("f1"), 0.5125604537813004, 1e-6, "rf f1")
  }

  test("GOLDEN qm2: PCA explainedVariance vector pinned") {
    // fitPartitions = Some(32): the catalog's exact call shape (r14
    // spreads qm2's single-file scan like qm1/qm3)
    val (_, model) = MlPipelines.scaledPca(featureFrame, featCols,
      k = 3, prefix = "all", fitPartitions = Some(32))
    val golden = Seq(0.26275460630901454, 0.2526502253132061,
      0.2439331228926631)
    val got = model.explainedVariance.toArray.toSeq
    assert(got.size == golden.size)
    golden.zip(got).zipWithIndex.foreach { case ((w, g), i) =>
      approx(g, w, 1e-9, s"explainedVariance($i)")
    }
  }

  test("GOLDEN qm3: LinearSVC (seed 123) AUC/accuracy/F1 pinned") {
    val (_, pred) = MlPipelines.fitPredict(featureFrame, featCols,
      MlPipelines.svm(), seed = Some(123L), fitPartitions = Some(32))
    val m = MlPipelines.evaluate(pred)
    approx(m("areaUnderROC"), 0.4927263693001568, 1e-6, "svm AUC")
    approx(m("accuracy"), 0.48223350253807107, 1e-6, "svm accuracy")
    approx(m("f1"), 0.31378207356929283, 1e-6, "svm f1")
  }

  test("GOLDEN qm4: Pearson correlation matrix pinned") {
    val golden = Seq(
      1.0, 0.015349884139697076, 0.009070592937241525, 0.009151139930903395,
      0.015349884139697076, 1.0, 0.03374779700771355, -0.011909315197638314,
      0.009070592937241525, 0.03374779700771355, 1.0, -0.02583178268353664,
      0.009151139930903395, -0.011909315197638314, -0.02583178268353664, 1.0)
    val got = MlPipelines.correlationMatrix(featureFrame, featCols,
      fitPartitions = Some(32)).toArray.toSeq
    assert(got.size == 16)
    golden.zip(got).zipWithIndex.foreach { case ((w, g), k) =>
      approx(g, w, 1e-12, s"corr(${k % 4}, ${k / 4})")
    }
  }
}
