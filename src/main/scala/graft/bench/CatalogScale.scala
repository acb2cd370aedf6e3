package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale-shift of the REAL catalog chains (VERDICT r6 ask #1).
  *
  * Every scaling claim in SCALE.md so far is measured either at the
  * bench scale (sf0.1) or on synthetic probe cells; this main runs the
  * actual catalog queries — the layout family q46–q52, the dedup chain
  * qt4/qt5/qt6/qt11, the ANN chain qv4/qv6/qv15 — at sf0.1 AND at a
  * 10× (sf1.0-shaped) replica, and prints per-query times, ratios and
  * the implied scaling exponent (`log10(t_10x / t_1x)`; 1.0 = linear,
  * 2.0 = quadratic).
  *
  * The 10× replica is derived from the driver's sf0.1 tables (the
  * prompt forbids inventing new distributions) by a shape-preserving
  * blow-up, one design rule per table:
  *  - `lineitem`: 10 key-shifted copies (`l_orderkey += copy · 10⁶`);
  *    partkey/suppkey cardinality stays FIXED — a fact table grows in
  *    rows, not in dimension keys — so z-order cell occupancy and
  *    bloom item counts scale the way a real lake's would.
  *  - `events`: id-shifted copies displaced by `copy · 31 days` — the
  *    time span grows 10×, as ingest time does, so time-clustered
  *    file pruning keeps its selectivity instead of stacking ten
  *    identical months.
  *  - `documents`: copy 0 verbatim; copy i > 0 appends a copy tag to
  *    EVERY word. Within a copy, pairwise shingle sets transform
  *    identically, so the driver-built near-dup/exact-dup structure is
  *    preserved exactly; across copies, word shingles share nothing,
  *    so no new dup mass appears. The corpus is 10× docs at the SAME
  *    dup fraction — what a real 10× crawl looks like — rather than a
  *    pathological everything-is-a-dup pile that would inflate the
  *    pair graph quadratically by construction.
  *  - `embeddings`: copy 0 verbatim (qv queries probe `vec_id = 0`);
  *    copy i > 0 jitters each component by a deterministic ±2·10⁻³ —
  *    cluster geometry (and so IVF bucket occupancy) is preserved,
  *    but no two copies are byte-identical.
  *  - dimension tables are copied verbatim (dimensions don't grow
  *    with fact volume).
  *
  * Timing wraps the WHOLE catalog closure — for the layout queries
  * that includes the in-query lake write + index build, which is the
  * honest cost of the operator at scale. Each cell is JIT-warmed at
  * sf0.001 first and reports the min of `reps` timed runs (min, not
  * median: the quantity under test is the data-plane cost curve, and
  * the min is the rep least polluted by GC/page-cache noise).
  *
  * Run: `sbt "runMain graft.bench.CatalogScale [reps]"`.
  * Results land in SCALE.md §"Measured catalog chains at 10×".
  */
object CatalogScale {

  private def t(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  val TenxDir = "/root/repo/target/scale/sf1x"

  private val copies = 10

  /** Cross-join with a broadcast 10-row copy table — the distributed
    * blow-up shape (each input partition fans out locally; no shuffle,
    * no driver loop). */
  private def rep(df: DataFrame): DataFrame =
    df.crossJoin(broadcast(
      org.apache.spark.sql.SparkSession.active.range(copies)
        .select(col("id").as("_copy"))))

  /** Build the 10× replica once; cheap no-op when already present. */
  def ensure10x(spark: SparkSession, srcDir: String): String = {
    val done = new java.io.File(s"$TenxDir/_BUILT")
    if (done.exists()) return TenxDir
    new java.io.File(TenxDir).mkdirs()
    def src(n: String) = spark.read.parquet(s"$srcDir/$n.parquet")
    def write(df: DataFrame, n: String): Unit =
      df.write.mode("overwrite").parquet(s"$TenxDir/$n.parquet")

    write(rep(src("lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") + col("_copy") * 1000000L)
      .drop("_copy"), "lineitem")

    write(rep(src("events"))
      .withColumn("event_id", col("event_id") + col("_copy") * 10000000L)
      .withColumn("ts", expr("timestampadd(DAY, CAST(_copy * 31 AS INT), ts)"))
      .drop("_copy"), "events")

    write(rep(src("documents"))
      .withColumn("doc_id", col("doc_id") + col("_copy") * 1000000L)
      .withColumn("text", when(col("_copy") === 0, col("text"))
        .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1z"), col("_copy")))))
      .withColumn("n_chars", length(col("text")))
      .drop("_copy"), "documents")

    write(rep(src("embeddings"))
      .withColumn("embedding", when(col("_copy") === 0, col("embedding"))
        .otherwise(transform(col("embedding"), (x, j) =>
          (x + (pmod(hash(col("vec_id"), col("_copy"), j), lit(1001))
            .cast("float") - lit(500f)) / lit(250000f)).cast("float"))))
      .withColumn("vec_id", col("vec_id") + col("_copy") * 1000000L)
      .drop("_copy"), "embeddings")

    Seq("region", "nation", "customer", "supplier", "part", "orders")
      .foreach(n => write(src(n), n))
    done.createNewFile(): Unit
    TenxDir
  }

  /** The chains the verdict names, in dependency-ish order, plus the
    * round-7 additions (timestamp-bloom probe, adaptive filtered
    * ANN, and the commit-log history/mutation family — time travel,
    * CDC, merge, delete; each cell times the WHOLE closure, i.e. the
    * 3-batch logged ingest plus the operation under test). */
  val Chains: Seq[String] = Seq(
    "q46_pruned_scan", "q47_typed_pruned_scan", "q48_hilbert3",
    "q49_centered_global", "q50_bloom_pruned_scan",
    "q51_double_bloom_scan", "q52_ts_pruned_scan", "q53_ts_bloom_scan",
    "q54_time_travel", "q56_read_changes", "q57_merge_upsert",
    "q58_delete", "q61_meta_count", "q62_dfp_join", "q63_meta_minmax",
    "q64_merge_string_key", "q65_inlist_scan", "q66_delete_pruned",
    "q67_dv_delete", "q68_dv_merge", "q69_dv_pruned_scan",
    "q70_dv_meta_count", "q71_dv_update", "q72_dv_optimize",
    "q73_dv_meta_minmax", "q74_dv_changes", "q75_incr_view",
    "q76_restore", "q77_restore_dv", "q78_constraints", "q79_clone",
    "q80_generated", "q81_time_travel_dml", "q82_incr_view_minmax", "q83_occ_dml",
    "q84_column_mapping", "q85_retention", "q86_time_travel_ts",
    "qt29_mixture_sample",
    "qt4_exact_dedup", "qt5_minhash", "qt6_lsh_pairs",
    "qt11_dup_clusters", "qt21_curated_corpus",
    "qv4_ivf_assign", "qv6_ivf_query", "qv15_ivfpq_query",
    "qv17_filtered_knn_auto", "qv18_indexed_knn",
    "qv19_indexed_filtered_knn",
    // streaming chains: finite micro-batched runs over the same
    // tables — the 10× cell shows per-batch cost scaling with input,
    // state stores and all
    "qs5_stream_append_daily", "qs11_stream_lsh_incremental",
    "qs14_stream_layout", "qs15_stream_upsert", "qs16_stream_dv_read",
    "qs17_stream_upsert_mor", "qs18_stream_view",
    "qs19_stream_view_minmax", "qs20_stream_cdc",
    "qs21_stream_vector_index")

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(2)
    // optional "only=a,b,c" arg: re-measure just the named cells
    val only = args.find(_.startsWith("only="))
      .map(_.stripPrefix("only=").split(',').toSet)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sf01 = "/root/testdata/sf0.1"
    val tenx = ensure10x(spark, sf01)
    // page-cache both inputs so cold reads don't masquerade as compute
    Seq(sf01, tenx).foreach { d =>
      Seq("lineitem", "events", "documents", "embeddings").foreach { n =>
        spark.read.parquet(s"$d/$n.parquet").queryExecution.toRdd.count()
      }
    }

    val qs = graft.SparkEntry.queries
    println("""{"probe":"catalog10x","cells":[""")
    val lines = Chains.filter(n => only.forall(_.contains(n))).map { name =>
      val fn = qs(name)
      // JIT-warm the whole code path on the tiny scale, untimed
      try fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
      catch { case e: Throwable =>
        println(s"// warmup $name failed: $e") }
      def cell(dir: String): Double =
        (1 to reps).map(_ => t {
          fn(spark, dir).queryExecution.toRdd.count()
        }).min
      val t1 = cell(sf01)
      val t10 = cell(tenx)
      val exp = math.log10(t10 / t1)
      val l = f"""{"q":"$name","t_sf01":$t1%.2f,"t_10x":$t10%.2f,""" +
        f""""ratio":${t10 / t1}%.2f,"exponent":$exp%.2f}"""
      println("  " + l + ",")
      l
    }
    println("""]}""")
    println("[catalog10x] done: " + lines.size + " cells, reps=" + reps)
    spark.stop()
  }
}
