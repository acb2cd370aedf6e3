package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.indicators.RecursiveSmooth

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions on the SQL surface. Activate at session build time with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`, or on a
  * live session via [[GraftExtensions.register]].
  *
  * Registered functions:
  *  - `ema_smooth(x, alpha)` — the recursive exponential smooth
  *    ([[graft.indicators.ExponentialSmooth]]); window-only, e.g.
  *    `SELECT ema_smooth(close, 0.2) OVER (PARTITION BY symbol ORDER BY ts
  *    ROWS UNBOUNDED PRECEDING) FROM bars`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("ema_smooth"),
      RecursiveSmooth.sqlInfo,
      RecursiveSmooth.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("parabolic_sar"),
      graft.indicators.ParabolicSar.sqlInfo,
      graft.indicators.ParabolicSar.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("dot_f32"),
      graft.functions.FloatDot.sqlInfo,
      graft.functions.FloatDot.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      graft.functions.SimHash32.sqlInfo,
      graft.functions.SimHash32.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("hilbert2"),
      graft.functions.HilbertIndex2.sqlInfo,
      graft.functions.HilbertIndex2.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("hilbertn"),
      graft.functions.HilbertIndexN.sqlInfo,
      graft.functions.HilbertIndexN.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      graft.functions.BloomMightContain.sqlInfo,
      graft.functions.BloomMightContain.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("ht_dcperiod"),
      graft.indicators.HilbertTransform.dcSqlInfo,
      graft.indicators.HilbertTransform.sqlBuilder(trend = false)))
    ext.injectFunction((
      FunctionIdentifier("ht_trendline"),
      graft.indicators.HilbertTransform.tlSqlInfo,
      graft.indicators.HilbertTransform.sqlBuilder(trend = true)))
    // J3 self-join-to-projection rewrite; inert unless
    // spark.graft.rewriteSelfJoin.assumeUniqueKeys=true
    ext.injectOptimizerRule(_ => graft.plans.SelfJoinRewrite)
    // small-integer band join -> exploded equi-join (semantics-preserving;
    // on by default, spark.graft.rewriteBandJoin.enabled=false to disable)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
  }
}

object GraftExtensions {
  /** Runtime registration for an already-built session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("ema_smooth"),
      RecursiveSmooth.sqlInfo,
      RecursiveSmooth.sqlBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("parabolic_sar"),
      graft.indicators.ParabolicSar.sqlInfo,
      graft.indicators.ParabolicSar.sqlBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_f32"),
      graft.functions.FloatDot.sqlInfo,
      graft.functions.FloatDot.sqlBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash32"),
      graft.functions.SimHash32.sqlInfo,
      graft.functions.SimHash32.sqlBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("hilbert2"),
      graft.functions.HilbertIndex2.sqlInfo,
      graft.functions.HilbertIndex2.sqlBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("hilbertn"),
      graft.functions.HilbertIndexN.sqlInfo,
      graft.functions.HilbertIndexN.sqlBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_might_contain"),
      graft.functions.BloomMightContain.sqlInfo,
      graft.functions.BloomMightContain.sqlBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("ht_dcperiod"),
      graft.indicators.HilbertTransform.dcSqlInfo,
      graft.indicators.HilbertTransform.sqlBuilder(trend = false))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("ht_trendline"),
      graft.indicators.HilbertTransform.tlSqlInfo,
      graft.indicators.HilbertTransform.sqlBuilder(trend = true))
    if (!spark.sessionState.experimentalMethods.extraOptimizations
        .contains(graft.plans.SelfJoinRewrite)) {
      spark.sessionState.experimentalMethods.extraOptimizations ++=
        Seq(graft.plans.SelfJoinRewrite)
    }
    if (!spark.sessionState.experimentalMethods.extraOptimizations
        .contains(graft.plans.BandJoinRewrite)) {
      spark.sessionState.experimentalMethods.extraOptimizations ++=
        Seq(graft.plans.BandJoinRewrite)
    }
  }
}
