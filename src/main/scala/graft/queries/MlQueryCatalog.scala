package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.MlPipelines

import Oracle.table

/** ML pipeline catalog (SURVEY.md §2.11 M1–M15) over the synthetic
  * tables: assemble → (scale → PCA) → classify → evaluate, exercised
  * end-to-end. These are NOT SQL-expressible, so they carry no DuckDB
  * twin — the driver records the weaker rows>0 check; numeric assertions
  * (metric ranges, variance ordering, split fractions) live in the
  * ScalaTest specs instead. */
object MlQueryCatalog {

  type Q = (SparkSession, String) => DataFrame

  /** Binary label + 4 numeric features derived from lineitem — the
    * stand-in for the reference's labelled indicator table. */
  private def featureFrame(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem").select(
      (col("l_quantity") > 25).cast("int").as("buy_or_sell"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_linenumber").cast("double").as("lineno"))

  private val featCols =
    Seq("l_extendedprice", "l_discount", "l_tax", "lineno")

  /** M5+M7+M8+M14 — RF with the reference's mllib-parity config
    * (numTrees=10, gini, maxDepth=10, maxBins=32, seed=42), 70/30 split
    * seed 42, native confusion matrix (no collect+sklearn). */
  val qm1RfConfusion: Q = (s, dir) => {
    // fitPartitions: the feature frame scans ONE small parquet file
    // (one partition) — without the explicit spread the RF fit's
    // treeAggregate rounds run single-core (r12's qm1 17.6 s; 9.5 s
    // with it — SCALE.md §"qm1_rf_confusion phase split")
    val (_, pred) = MlPipelines.fitPredict(featureFrame(s, dir), featCols,
      MlPipelines.rfMllibParity(), fitPartitions = Some(32))
    MlPipelines.confusionMatrix(pred)
  }

  /** M2+M3+M15 — scale (std-only, the reference's actual config) → PCA →
    * explainedVariance, one row per component. */
  val qm2PcaVariance: Q = (s, dir) => {
    // fitPartitions: same single-file-scan starvation as qm1 — the
    // scaler + PCA treeAggregates would otherwise run single-core
    // (and the r14 parallelism gate now REFUSES the 1-partition fit)
    val (_, model) = MlPipelines.scaledPca(featureFrame(s, dir), featCols,
      k = 3, prefix = "all", fitPartitions = Some(32))
    val s2 = s
    import s2.implicits._
    model.explainedVariance.toArray.toSeq.zipWithIndex
      .map { case (v, i) => (i, v) }
      .toDF("component", "explained_variance")
  }

  /** M6+M11 — LinearSVC (maxIter=10, regParam=0.1) with confusion
    * matrix. */
  val qm3SvmConfusion: Q = (s, dir) => {
    // fitPartitions: same single-file-scan starvation as qm1
    val (_, pred) = MlPipelines.fitPredict(featureFrame(s, dir), featCols,
      MlPipelines.svm(), seed = Some(123L), fitPartitions = Some(32))
    MlPipelines.confusionMatrix(pred)
  }

  /** A8 — distributed Pearson correlation matrix (the reference round-
    * trips through pandas), flattened to (i, j, corr) rows. */
  val qm4CorrMatrix: Q = (s, dir) => {
    // fitPartitions: Correlation.corr aggregates with the same
    // partition-inheriting shape as the fits — spread it too
    val v = MlPipelines.correlationMatrix(featureFrame(s, dir), featCols,
      fitPartitions = Some(32))
    val n = featCols.size
    val s2 = s
    import s2.implicits._
    v.toArray.toSeq.zipWithIndex
      .map { case (c, k) => (k % n, k / n, c) }
      .toDF("i", "j", "corr")
  }

  val defs: Map[String, Q] = Map(
    "qm1_rf_confusion" -> qm1RfConfusion,
    "qm2_pca_variance" -> qm2PcaVariance,
    "qm3_svm_confusion" -> qm3SvmConfusion,
    "qm4_corr_matrix" -> qm4CorrMatrix)

  /** Not SQL-expressible — driver falls back to rows-only checks. */
  val sql: Map[String, String] = Map.empty
}
