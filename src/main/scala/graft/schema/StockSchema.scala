package graft.schema

import org.apache.spark.sql.types._

/** Explicit schema for the reference's minute-bar stock table.
  *
  * The reference infers this schema from CSV (`G_2_rf_nordd.py:24`,
  * `inferSchema=True`); we pin it explicitly so the scan is a single pass and
  * the types are stable (SURVEY.md §1.2: 60 columns — timestamp, int volume,
  * 58 doubles). Column order matches `G_2_data_exploration.ipynb` cell 9.
  */
object StockSchema {

  /** The 58 double-typed price/indicator columns (SURVEY.md §1.2). */
  val indicatorCols: Seq[String] = Seq(
    "close", "high", "low", "open",
    "sma5", "sma10", "sma15", "sma20",
    "ema5", "ema10", "ema15", "ema20",
    "upperband", "middleband", "lowerband",
    "HT_TRENDLINE", "KAMA10", "KAMA20", "KAMA30", "SAR",
    "TRIMA5", "TRIMA10", "TRIMA20",
    "ADX5", "ADX10", "ADX20", "APO",
    "CCI5", "CCI10", "CCI15",
    "macd510", "macd520", "macd1020", "macd1520", "macd1226",
    "MFI", "MOM10", "MOM15", "MOM20",
    "ROC5", "ROC10", "ROC20", "PPO",
    "RSI14", "RSI8",
    "slowk", "slowd", "fastk", "fastd", "fastksr", "fastdsr",
    "ULTOSC", "WILLR", "ATR", "Trange", "TYPPRICE", "HT_DCPERIOD", "BETA")

  /** Full 60-column schema: date + volume + 58 doubles. */
  val schema: StructType = StructType(
    StructField("date", TimestampType, nullable = true) +:
      StructField("volume", IntegerType, nullable = true) +:
      indicatorCols.map(c => StructField(c, DoubleType, nullable = true)))

  /** The 58 raw feature columns fed to the no-transform RF
    * (`G_2_rf_nordd.py:43-50`): everything except date and the label.
    * Note the reference includes `volume` in the assembled features.
    */
  val rfRawFeatures: Seq[String] = indicatorCols ++ Seq("volume")

  /** 55-column SVM feature list (`G_2_svm.py:95-97`): drops date, volume,
    * high (and the label). */
  val svmFeatures: Seq[String] = indicatorCols.filterNot(_ == "high")
}

/** Typed core of a bar — the OHLCV columns every operator needs. Indicators
  * stay dynamic (DataFrame) because their set varies per pipeline stage. */
final case class Bar(
    date: java.sql.Timestamp,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Int)
