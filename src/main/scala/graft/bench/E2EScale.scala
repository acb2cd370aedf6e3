package graft.bench

import org.apache.spark.sql.SparkSession

/** 10× scale-shift of the reference's OWN benchmark pipelines: the
  * e2e cells (load → label → features → train → AUC) at the published
  * 671k-bar scale and at 10× (6.71M bars), same local[32] session the
  * bench uses. This is the ML-path complement to
  * [[CatalogScale]]'s catalog chains: BASELINE.md's cells compare at
  * the SAME scale; this probe shows what the engine's shapes do when
  * the bar table grows 10× — the windows/joins stay partitioned, the
  * model fits scale with rows, so the exponent should sit near
  * linear, dominated by the training iterations.
  *
  * Run: `sbt "runMain graft.bench.E2EScale [reps] [only=a,b]"`.
  * Results land in SCALE.md §"Measured e2e ML cells at 10×".
  */
object E2EScale {

  private def t(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** One window-heavy + one training-heavy cell — feature-engineered
    * RF (13 engineered features over per-day windows) and raw SVM
    * (pure LinearSVC iterations) — plus the headline `e2e_rf_raw`
    * (r12 VERDICT ask #6: the flagship baseline-comparison cell,
    * measured at the reference's published 671k scale AND 10×). The
    * remaining cells are linear mixes of these phases. */
  val Cells: Seq[String] = Seq("e2e_rf_raw", "e2e_rf_fe", "e2e_svm_raw")

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(2)
    val only = args.find(_.startsWith("only="))
      .map(_.stripPrefix("only=").split(',').toSet)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val p1 = SyntheticBars.ensure(spark, SyntheticBars.ReferenceRows)
    val p10 = SyntheticBars.ensure(spark, SyntheticBars.ReferenceRows * 10)
    val pWarm = SyntheticBars.ensure(spark, 6711L) // JIT-warm scale
    // page-cache both inputs so cold reads don't masquerade as compute
    Seq(p1, p10).foreach { p =>
      spark.read.parquet(p).queryExecution.toRdd.count(); ()
    }

    println("""{"probe":"e2e10x","cells":[""")
    Cells.filter(n => only.forall(_.contains(n))).foreach { name =>
      val fn = E2EBench.cells(name)
      try { fn(spark, pWarm); () }
      catch { case e: Throwable => println(s"// warmup $name failed: $e") }
      def cell(path: String): Double =
        (1 to reps).map(_ => t { fn(spark, path); () }).min
      val t1 = cell(p1)
      val t10 = cell(p10)
      val exp = math.log10(t10 / t1)
      println(f"""  {"cell":"$name","t_671k":$t1%.1f,"t_6.7M":$t10%.1f,""" +
        f""""ratio":${t10 / t1}%.2f,"exponent":$exp%.2f},""")
    }
    println("""]}""")
    spark.stop()
  }
}
