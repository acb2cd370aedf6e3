package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's ten row-wise feature functions (SURVEY.md §2.7 F1–F10).
  *
  * In the reference each is a Python function applied via
  * `rdd.repartition(10).map(f).toDF()` — rows pickled to a CPython worker and
  * back, per row (`G_2_rf_rdd_fe.py:184-195` and parallel sites). Every one
  * is stateless per-row arithmetic over 2–4 columns, so here they are plain
  * Catalyst `Column` expressions: codegen'd, null-propagating, fully visible
  * to the optimizer (pruning/pushdown cross them), and zero extra shuffles.
  */
object ColumnFeatures {

  /** F2 `macd_func` = macd510 − macd1226 (`G_2_rf_rdd_fe.py:184-188`). */
  def macd: Column = col("macd510") - col("macd1226")

  /** F3 `bollinger_bands_width_func` = (upper − lower) / middle
    * (`G_2_rf_rdd_fe.py:228-233`). */
  def bollingerBandsWidth: Column =
    (col("upperband") - col("lowerband")) / col("middleband")

  /** F4 `com_channel_index` = CCI5 − close (`G_2_rf_rdd_fe.py:268-272`). */
  def comChannelIndex: Column = col("CCI5") - col("close")

  /** F5 `rsi` = RSI14 − close (`G_2_rf_rdd_fe.py:306-310`). */
  def rsi: Column = col("RSI14") - col("close")

  /** F6 `momentum` = avg_close − avg_close_prev_day
    * (`G_2_rf_rdd_fe.py:344-348`); inputs from [[graft.operators.DailyAggregates]]. */
  def momentum: Column = col("avg_close") - col("avg_close_prev_day")

  /** F7 `sma_calc` = mean of the four SMAs (`G_2_rf_rdd_fe.py:384-390`). */
  def smaMean: Column =
    (col("sma5") + col("sma10") + col("sma15") + col("sma20")) / lit(4)

  /** F8 `kama_calc` (`G_2_rf_rdd_fe.py:422-427`). */
  def kamaMean: Column = (col("KAMA10") + col("KAMA20") + col("KAMA30")) / lit(3)

  /** F9 `adx_calc` (`G_2_rf_rdd_fe.py:457-462`). */
  def adxMean: Column = (col("ADX5") + col("ADX10") + col("ADX20")) / lit(3)

  /** F10a `roc_calc` (`G_2_rf_rdd_fe.py:492-497`). */
  def rocMean: Column = (col("ROC5") + col("ROC10") + col("ROC20")) / lit(3)

  /** F10b `trima_calc` (`G_2_rf_rdd_fe.py:527-532`). */
  def trimaMean: Column =
    (col("TRIMA5") + col("TRIMA10") + col("TRIMA20")) / lit(3)

  /** Name → expression map in reference application order
    * (`G_2_rf_nordd_fe.py:92-313`). */
  val perMinute: Seq[(String, Column)] = Seq(
    "macd" -> macd,
    "bollinger_bands_width" -> bollingerBandsWidth,
    "com_channel_index" -> comChannelIndex,
    "rsi" -> rsi)

  val perDayInputs: Seq[(String, Column)] = Seq(
    "momentum" -> momentum,
    "sma" -> smaMean,
    "kama" -> kamaMean,
    "adx" -> adxMean,
    "roc" -> rocMean,
    "trima" -> trimaMean)
}
