package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{FeaturePipeline, GlobalWindow}

/** Scaling probe: times the DATA PLANE (scalable label + feature
  * pipeline, no ML training) at 1× and 10× the reference row count,
  * and the DEDUP LOOP (LSH clusters + span fractions) at 1× and 10×
  * the sf0.1 document count. Near-linear growth is the evidence that
  * the plans have no super-linear stage (global sorts, quadratic
  * joins) hiding at the bench's default scale; the cluster-loop round
  * count is the measured component diameter. Results quoted in
  * SCALE.md. */
object SyntheticDocs {

  /** Deterministic corpus with planted near-dup structure: docs come in
    * groups of 5 sharing a 40-word body drawn from a hashed vocabulary;
    * group members 1–4 get one extra member-specific word (so groups
    * are near-dup CLIQUES — high shingle overlap, small diameter — the
    * LSH-component shape real corpora produce), and every 7th group is
    * fully unique (singletons stay singletons). */
  def generate(spark: SparkSession, nDocs: Long): org.apache.spark.sql.DataFrame =
    spark.range(nDocs).toDF("doc_id")
      .withColumn("grp", col("doc_id") - col("doc_id") % 5)
      .withColumn("seed",
        when(col("grp") % 35 === 0, col("doc_id")).otherwise(col("grp")))
      .withColumn("text", concat_ws(" ",
        concat(lit("w"),
          pmod(hash(col("seed") * 41), lit(5000))).as("first") +: (1 until 40)
          .map(j => concat(lit("w"),
            pmod(hash(col("seed") * 41 + lit(j * 7)), lit(5000)))): _*))
      .withColumn("text",
        when(col("doc_id") % 5 =!= 0,
          concat(col("text"), lit(" x"), col("doc_id") % 5))
          .otherwise(col("text")))
      .select(col("doc_id"), col("text"))

  def ensure(spark: SparkSession, nDocs: Long): String = {
    val path = s"/tmp/graft_bench_docs_$nDocs"
    if (!new java.io.File(path, "_SUCCESS").exists())
      generate(spark, nDocs).write.mode("overwrite").parquet(path)
    path
  }
}

object ScaleProbe {
  /** Wall-clock seconds for one action (shared by every probe branch). */
  private def t(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(nRows: Long): (Double, Double) = {
      val path = SyntheticBars.ensure(spark, nRows)
      // warm the page cache so both scales measure compute, not first-read
      spark.read.parquet(path).queryExecution.toRdd.count()
      val fe = t {
        FeaturePipeline.fast(spark.read.parquet(path))
          .queryExecution.toRdd.count()
      }
      val label = t {
        GlobalWindow.lagLabelGlobal(spark.read.parquet(path), Seq("date"),
          bucketKey = unix_micros(col("date")))
          .queryExecution.toRdd.count()
      }
      (label, fe)
    }
    def runDedup(nDocs: Long): (Double, Int, Double) = {
      val path = SyntheticDocs.ensure(spark, nDocs)
      spark.read.parquet(path).queryExecution.toRdd.count() // warm cache
      var rounds = 0
      val cc = t {
        val (out, r) = graft.operators.Dedup
          .dupClustersWithRounds(spark.read.parquet(path))
        rounds = r
        out.queryExecution.toRdd.count()
      }
      val spans = t {
        graft.operators.Dedup.dupSpanFraction(spark.read.parquet(path))
          .queryExecution.toRdd.count()
      }
      (cc, rounds, spans)
    }

    // `bars30`: the 30x (20M-row, ~8 GB parquet) FULL-WIDTH (60-col)
    // data-plane probe — the largest full-width scale one box's spill
    // disk holds: at 100x the label pass's full-frame sort spills
    // ~2× a 32 GB shuffle and measurably exhausts /tmp (a bench-host
    // disk limit, not a plan defect — the 100x/67M-row point for the
    // window COMPUTE is the narrow-table `globalwindow` probe). The
    // 30x table is deleted afterwards.
    if (args.headOption.contains("bars30")) {
      val mult = 30L
      run(SyntheticBars.ReferenceRows) // JIT warmup pass, discarded
      val (l1b, f1b) = run(SyntheticBars.ReferenceRows)
      val (lN, fN) = run(SyntheticBars.ReferenceRows * mult)
      println(f"[scale-probe] label 1x: $l1b%.1f s   ${mult}x: $lN%.1f s   ratio ${lN / l1b}%.1f")
      println(f"[scale-probe] fe    1x: $f1b%.1f s   ${mult}x: $fN%.1f s   ratio ${fN / f1b}%.1f")
      val big = new org.apache.hadoop.fs.Path(
        s"/tmp/graft_bench_bars_${SyntheticBars.ReferenceRows * mult}")
      big.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(big, true) // recursive — survives stray subdirs
      spark.stop()
      return
    }

    // `zorder`: row-group pruning head-to-head — z-ordered vs lead-key-
    // sorted layout under box / single-dim predicates. Two measures:
    // parquet footer min/max intersection counts (exactly the stats a
    // 100 TB scan prunes with — layout quality independent of local I/O
    // noise) and wall-clock on the filtered scan.
    if (args.headOption.contains("zorder")) {
      import org.apache.hadoop.fs.Path
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      val n = 20000000L
      val files = 256 // one ~80k-row row group per file at this size
      val df = spark.range(n).select(
        pmod(hash(col("id")), lit(4096)).as("x"),
        pmod(hash(col("id") + 1000000007L), lit(4096)).as("y"),
        col("id").as("payload"))
      val base = "/tmp/graft_zorder_probe"
      df.repartitionByRange(files, col("x")).sortWithinPartitions(col("x"))
        .write.mode("overwrite").parquet(s"$base/linear")
      graft.sources.ZOrder.write(df, s"$base/zorder", Seq("x", "y"),
        bits = 12, numFiles = files)
      // third layout: HILBERT sort key — same bits, same file count;
      // the continuous curve should turn fewer box-straddling curve
      // segments into fewer files touched than Morton
      graft.sources.ZOrder.hilbertWrite(df, s"$base/hilbert", "x", "y",
        bits = 12, numFiles = files)
      // box = 12% of each dim (1.5% of the area); yOnly = the predicate
      // a lead-key sort cannot prune at all
      val (xLo, xHi, yLo, yHi) = (1000L, 1499L, 2000L, 2499L)
      def hits(dir: String, useX: Boolean): (Int, Int) = {
        val conf = spark.sparkContext.hadoopConfiguration
        val fs = new Path(dir).getFileSystem(conf)
        var total = 0; var hit = 0
        fs.listStatus(new Path(dir))
          .filter(_.getPath.getName.endsWith(".parquet")).foreach { f =>
            val r = ParquetFileReader.open(
              HadoopInputFile.fromPath(f.getPath, conf))
            try r.getFooter.getBlocks.asScala.foreach { b =>
              total += 1
              def rng(name: String): (Long, Long) = {
                val st = b.getColumns.asScala
                  .find(_.getPath.toDotString == name).get.getStatistics
                (st.genericGetMin.asInstanceOf[Number].longValue,
                  st.genericGetMax.asInstanceOf[Number].longValue)
              }
              val (y0, y1) = rng("y")
              val yHit = y1 >= yLo && y0 <= yHi
              val xHit = !useX || {
                val (x0, x1) = rng("x"); x1 >= xLo && x0 <= xHi
              }
              if (xHit && yHit) hit += 1
            } finally r.close()
          }
        (hit, total)
      }
      def scanT(dir: String, useX: Boolean): Double = {
        val t0 = System.nanoTime()
        val d = spark.read.parquet(dir)
          .filter(col("y").between(yLo, yHi))
        (if (useX) d.filter(col("x").between(xLo, xHi)) else d)
          .agg(sum(col("payload"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      Seq(("linear-x", s"$base/linear"), ("zorder", s"$base/zorder"),
        ("hilbert", s"$base/hilbert"))
        .foreach { case (name, dir) =>
          val (bh, bt) = hits(dir, useX = true)
          val (yh, yt) = hits(dir, useX = false)
          println(f"[scale-probe] $name%-9s box(x,y): $bh/$bt row groups, " +
            f"${scanT(dir, useX = true)}%.2f s   y-only: $yh/$yt, " +
            f"${scanT(dir, useX = false)}%.2f s")
          // FILE-level skipping through the stats index (the layer that
          // shrinks the 100 TB planner's split list, not just the bytes)
          graft.sources.StatsIndex.build(spark, dir, Seq("x", "y"),
            s"$dir-idx")
          val nAll = graft.sources.StatsIndex
            .prunedFiles(spark, s"$dir-idx", Nil).size
          val nBox = graft.sources.StatsIndex.prunedFiles(spark, s"$dir-idx",
            Seq(("x", xLo, xHi), ("y", yLo, yHi))).size
          println(f"[scale-probe] $name%-9s stats-index files for box: " +
            f"$nBox/$nAll")
        }
      spark.stop()
      return
    }

    // `zorder3d`: the 3-D layout head-to-head — lead-key sort vs 3-D
    // Morton vs 3-D Hilbert (hilbertWriteN), the dimensionality that
    // motivated generalizing past HilbertIndex2. Same row-group
    // footer-stats measure as `zorder`.
    if (args.headOption.contains("zorder3d")) {
      import org.apache.hadoop.fs.Path
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      val n = 20000000L
      val files = 256
      val df = spark.range(n).select(
        pmod(hash(col("id")), lit(4096)).as("x"),
        pmod(hash(col("id") + 1000000007L), lit(4096)).as("y"),
        pmod(hash(col("id") + 998244353L), lit(4096)).as("z"),
        col("id").as("payload"))
      val base = "/tmp/graft_zorder3d_probe"
      df.repartitionByRange(files, col("x")).sortWithinPartitions(col("x"))
        .write.mode("overwrite").parquet(s"$base/linear")
      graft.sources.ZOrder.write(df, s"$base/morton3",
        Seq("x", "y", "z"), bits = 8, numFiles = files)
      graft.sources.ZOrder.hilbertWriteN(df, s"$base/hilbert3",
        Seq("x", "y", "z"), bits = 8, numFiles = files)
      // box = 20% of each dim (0.8% of the volume); yz = the predicate
      // shape a lead-key sort cannot prune at all
      val (lo, hi) = (1000L, 1819L)
      def hits(dir: String, dims: Seq[String]): (Int, Int) = {
        val conf = spark.sparkContext.hadoopConfiguration
        val fs = new Path(dir).getFileSystem(conf)
        var total = 0; var hit = 0
        fs.listStatus(new Path(dir))
          .filter(_.getPath.getName.endsWith(".parquet")).foreach { f =>
            val r = ParquetFileReader.open(
              HadoopInputFile.fromPath(f.getPath, conf))
            try r.getFooter.getBlocks.asScala.foreach { b =>
              total += 1
              val ok = dims.forall { name =>
                val st = b.getColumns.asScala
                  .find(_.getPath.toDotString == name).get.getStatistics
                val (v0, v1) = (
                  st.genericGetMin.asInstanceOf[Number].longValue,
                  st.genericGetMax.asInstanceOf[Number].longValue)
                v1 >= lo && v0 <= hi
              }
              if (ok) hit += 1
            } finally r.close()
          }
        (hit, total)
      }
      Seq(("linear-x", s"$base/linear"), ("morton3", s"$base/morton3"),
        ("hilbert3", s"$base/hilbert3")).foreach { case (name, dir) =>
        val (bh, bt) = hits(dir, Seq("x", "y", "z"))
        val (yzh, yzt) = hits(dir, Seq("y", "z"))
        println(f"[scale-probe] $name%-9s box(x,y,z): $bh/$bt row groups" +
          f"   box(y,z): $yzh/$yzt")
      }
      spark.stop()
      return
    }

    // `bloom`: point-probe file skipping where min/max CANNOT help —
    // the q50/q51 read path at probe scale. 8M rows across 64 files
    // clustered on an UNCORRELATED shuffle key, so every file spans
    // ~the full range of both probe columns; per-file blooms on a long
    // and a double column. Measures index build cost (with/without
    // blooms), the prune DECISION, files kept, and pruned-read vs
    // full-scan wall for present and absent keys.
    if (args.headOption.contains("bloom")) {
      import graft.sources.StatsIndex
      val n = 8000000L
      val files = 64
      val base = "/tmp/graft_bloom_probe"
      val df = spark.range(n).select(
        pmod(hash(col("id")), lit(1000000)).as("shuffle_key"),
        col("id").as("k"),
        (col("id") % 1000000 * lit(1.25)).as("price"),
        col("id").as("payload"))
      graft.sources.PartitionedLake.writeClustered(df, s"$base/data",
        Seq("shuffle_key"), numFiles = files)
      // the min/max control indexes the PROBED columns too — keeping
      // 64/64 must mean their per-file ranges genuinely cannot prune
      // (every file spans ~the full k/price range on this layout),
      // not that the columns are merely unindexed
      val tStats = t { StatsIndex.build(spark, s"$base/data",
        Seq("shuffle_key", "k", "price"), s"$base/idx_plain") }
      val perFile = n / files
      val tBloom = t { StatsIndex.build(spark, s"$base/data",
        Seq("shuffle_key", "k", "price"), s"$base/idx",
        bloomCols = Seq("k", "price"), bloomItems = perFile * 2,
        bloomFpp = 0.01) }
      println(f"[scale-probe] bloom index build: stats-only $tStats%.1f s" +
        f"   +2-col blooms $tBloom%.1f s (one grouped pass over 2 cols)")
      val full = spark.read.parquet(s"$base/data")
      // JIT/page-cache warm for both paths, discarded
      StatsIndex.readPrunedTyped(spark, s"$base/data", s"$base/idx",
        Seq(StatsIndex.LongEquals("k", 1L)))
        .agg(sum(col("payload"))).head()
      full.filter(col("k") === 1L).agg(sum(col("payload"))).head()
      Seq(
        ("long present", StatsIndex.LongEquals("k", 1234567L)),
        ("long absent", StatsIndex.LongEquals("k", n + 17L)),
        ("double present", StatsIndex.DoubleEquals("price", 123457.0 * 1.25)),
        ("double absent", StatsIndex.DoubleEquals("price", 17.17)))
        .foreach { case (tag, probe) =>
          // full-scan baseline for THIS probe's own predicate
          val tFull = t {
            full.filter(probe.predicate).agg(sum(col("payload"))).head()
          }
          var kept = -1
          val tDecide = t {
            kept = StatsIndex.prunedTyped(spark, s"$base/idx_plain",
              Seq(probe)).size // min/max arms only (no bloom rows)
          }
          var keptB = -1
          val tDecideB = t {
            keptB = StatsIndex.prunedTyped(spark, s"$base/idx",
              Seq(probe)).size
          }
          val tRead = t {
            StatsIndex.readPrunedTyped(spark, s"$base/data", s"$base/idx",
              Seq(probe)).agg(sum(col("payload"))).head()
          }
          println(f"[scale-probe] bloom $tag: stats-arm kept $kept/$files" +
            f" (${tDecide}%.2f s) -> bloom kept $keptB/$files" +
            f" (${tDecideB}%.2f s decide, $tRead%.2f s pruned read," +
            f" full scan $tFull%.2f s)")
        }
      val probeDir = new org.apache.hadoop.fs.Path(base)
      probeDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(probeDir, true)
      spark.stop()
      return
    }

    // `phash`: perceptual-hash dedup data plane at 1x/10x — real BMP
    // encode -> BmpCodec decode -> dHash per image, then the banded-LSH
    // hamming pair join. Cluster structure is corpus-shaped (~5 docs per
    // base image regardless of n, bump every 7th), so pair output grows
    // LINEARLY in n and the probe isolates how the two stages scale:
    // the hash pass is embarrassingly parallel, the join shuffles 8-byte
    // keys only.
    if (args.headOption.contains("phash")) {
      import graft.operators.{PerceptualHash => P}
      import org.apache.spark.sql.{DataFrame, Row}
      import org.apache.spark.sql.types._
      def media(n: Long): DataFrame = {
        val buckets = math.max(1L, n / 5)
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("payload", BinaryType, nullable = false)))
        val enc = org.apache.spark.sql.Encoders.row(outSchema)
        spark.range(n).toDF("doc_id").repartition(32).mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val base = id % buckets
            // three coprime residues parametrize the image: a single
            // (base + 7) multiplier collapses mod 256, giving only 256
            // distinct images and QUADRATIC pair blowup at scale
            val b1 = base % 251 + 7
            val b2 = base / 251 % 241 + 3
            val b3 = base / (251L * 241) % 239 + 1
            val bump = if (id % 7 == 0) 3 else 0
            val (w, h) = (18, 16)
            val rgb = new Array[Byte](3 * w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val add = if (bump > 0 && x == 5 && y == 4) bump else 0
                val v = (((x + 1).toLong * (y + 3) * b1 +
                  x.toLong * y * b2 + (x + 2L * y) * b3 + add) % 256).toByte
                val p = (y * w + x) * 3
                rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
                x += 1
              }
              y += 1
            }
            Row(id, P.encodeBmp24(w, h, rgb))
          }
        }(enc)
      }
      def probe(n: Long): (Double, Double, Long) = {
        val m = media(n).localCheckpoint()
        val tHash = t { P.dhashImages(m).queryExecution.toRdd.count() }
        val hashes = P.dhashImages(m)
          .select(col("doc_id"), col("dhash")).localCheckpoint()
        var pairs = 0L
        val tPairs = t { pairs = P.hammingPairs(hashes).count() }
        m.unpersist(); hashes.unpersist()
        (tHash, tPairs, pairs)
      }
      probe(20000L) // JIT warm, discarded
      Seq(100000L, 1000000L).foreach { n =>
        val (tHash, tPairs, pairs) = probe(n)
        println(f"[scale-probe] phash n=$n%d: encode+decode+hash " +
          f"$tHash%.2f s (${n / tHash / 1e3}%.0fk img/s), " +
          f"LSH pair join $tPairs%.2f s ($pairs%d pairs)")
      }
      spark.stop()
      return
    }

    // `globalwindow`: head-to-head of the scalable global-window family
    // vs the single-partition plans they replace, at 6.7M and 67M rows
    // (in-plan synthesized narrow table — measures the window compute,
    // not parquet I/O)
    if (args.headOption.contains("globalwindow")) {
      import org.apache.spark.sql.expressions.Window
      def bars(n: Long) = spark.range(n).select(
        (col("id") * 60000000L).as("epoch_us"), // one row per minute
        ((col("id") % 1000) * 0.25).as("close"))
      def probe(n: Long): (Double, Double, Double, Double) = {
        val b = bars(n)
        val rowsSingle = t {
          val w = Window.orderBy(col("epoch_us")).rowsBetween(-99, 0)
          b.withColumn("s", sum(col("close")).over(w))
            .queryExecution.toRdd.count()
        }
        val rowsGlobal = t {
          graft.operators.GlobalWindow.rollingGlobal(b, Seq("epoch_us"),
            Seq((sum(col("close")), "s")), frameRows = 100,
            bucketKey = col("epoch_us")).queryExecution.toRdd.count()
        }
        // 100-minute reach = same 100-row coverage as the rows frame
        val reach = 100L * 60000000L
        val rangeSingle = t {
          val w = Window.orderBy(col("epoch_us")).rangeBetween(-reach, 0)
          b.withColumn("s", sum(col("close")).over(w))
            .queryExecution.toRdd.count()
        }
        val rangeGlobal = t {
          graft.operators.GlobalWindow.rollingGlobalRange(b, "epoch_us",
            Seq((sum(col("close")), "s")), rangeBefore = reach)
            .queryExecution.toRdd.count()
        }
        (rowsSingle, rowsGlobal, rangeSingle, rangeGlobal)
      }
      probe(6700000L) // JIT warmup, discarded
      Seq(6700000L, 67000000L).foreach { n =>
        val (rs, rg, gs, gg) = probe(n)
        val m = n / 1000000
        println(f"[scale-probe] rows-frame ${m}M: single-partition $rs%.1f s" +
          f"   bucketed $rg%.1f s   speedup ${rs / rg}%.1f")
        println(f"[scale-probe] range-frame ${m}M: single-partition $gs%.1f s" +
          f"   bucketed $gg%.1f s   speedup ${gs / gg}%.1f")
      }
      spark.stop()
      return
    }

    run(SyntheticBars.ReferenceRows) // JIT warmup pass, discarded
    val (l1, f1) = run(SyntheticBars.ReferenceRows)
    val (l10, f10) = run(SyntheticBars.ReferenceRows * 10)
    println(f"[scale-probe] label 1x: $l1%.1f s   10x: $l10%.1f s   ratio ${l10 / l1}%.1f")
    println(f"[scale-probe] fe    1x: $f1%.1f s   10x: $f10%.1f s   ratio ${f10 / f1}%.1f")

    runDedup(5000) // dedup JIT warmup, discarded
    val (c1, r1, s1) = runDedup(5000) // sf0.1-equivalent corpus
    val (c10, r10, s10) = runDedup(50000)
    println(f"[scale-probe] clusters 1x: $c1%.1f s ($r1 rounds)   " +
      f"10x: $c10%.1f s ($r10 rounds)   ratio ${c10 / c1}%.1f")
    println(f"[scale-probe] spans    1x: $s1%.1f s   10x: $s10%.1f s   " +
      f"ratio ${s10 / s1}%.1f")

    // curation shapes: repetition metrics (two keyed partial-agg
    // shuffles) and the broadcast contamination probe (corpus side
    // never shuffles) over the same synthetic corpora
    def runCuration(nDocs: Long): (Double, Double, Double, Double, Double) = {
      val path = SyntheticDocs.ensure(spark, nDocs)
      spark.read.parquet(path).queryExecution.toRdd.count() // warm cache
      def docs = spark.read.parquet(path)
        .withColumn("lang", lit("en")).withColumn("source", lit("probe"))
        .withColumn("n_chars", length(col("text")))
      val dir = s"$path/_as_table"
      if (!new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists())
        docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rep = t {
        graft.queries.TextQueryCatalog.qt18Repetition(spark, dir)
          .queryExecution.toRdd.count()
      }
      val con = t {
        graft.queries.TextQueryCatalog.qt19Contamination(spark, dir)
          .queryExecution.toRdd.count()
      }
      val pii = t {
        graft.queries.TextQueryCatalog.qt23PiiRedact(spark, dir)
          .queryExecution.toRdd.count()
      }
      val chk = t {
        graft.queries.TextQueryCatalog.qt24Chunks(spark, dir)
          .queryExecution.toRdd.count()
      }
      val pak = t {
        graft.queries.TextQueryCatalog.qt25SeqPack(spark, dir)
          .queryExecution.toRdd.count()
      }
      (rep, con, pii, chk, pak)
    }
    runCuration(5000) // JIT warmup, discarded
    val (rep1, con1, pii1, chk1, pak1) = runCuration(5000)
    val (rep10, con10, pii10, chk10, pak10) = runCuration(50000)
    println(f"[scale-probe] repetition    1x: $rep1%.1f s   10x: $rep10%.1f s   ratio ${rep10 / rep1}%.1f")
    println(f"[scale-probe] contamination 1x: $con1%.1f s   10x: $con10%.1f s   ratio ${con10 / con1}%.1f")
    println(f"[scale-probe] pii-redact    1x: $pii1%.1f s   10x: $pii10%.1f s   ratio ${pii10 / pii1}%.1f")
    println(f"[scale-probe] chunking      1x: $chk1%.1f s   10x: $chk10%.1f s   ratio ${chk10 / chk1}%.1f")
    println(f"[scale-probe] seq-packing   1x: $pak1%.1f s   10x: $pak10%.1f s   ratio ${pak10 / pak1}%.1f")

    // hot-key join, three mitigations measured head to head: 16M fact
    // rows with 90% on ONE key, joined to a 2000-key dim too large to
    // broadcast (threshold forced off to model the big-dim case).
    // (a) plain sort-merge join, AQE off — the hot key's entire fact
    //     slice sorts in one task (the 100 TB failure mode);
    // (b) AQE skew-join — runtime splitting of the oversized partition
    //     (thresholds lowered to the probe's data size);
    // (c) SkewTools.saltedJoin, AQE off — planned n=16 salting.
    def runSkewJoin(): (Double, Double, Double) = {
      val nFact = 16000000L
      def fact = spark.range(nFact).select(
        when(pmod(col("id"), lit(10)) < 9, lit(0L))
          .otherwise(pmod(col("id"), lit(2000))).as("k"),
        col("id").as("v"))
      def dim = spark.range(2000).select(
        col("id").as("k"), (col("id") * 7).as("dval"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plain = t { fact.join(dim, "k").queryExecution.toRdd.count() }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      val aqe = t { fact.join(dim, "k").queryExecution.toRdd.count() }
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val salted = t {
        graft.operators.SkewTools.saltedJoin(fact, dim, Seq("k"), 16)
          .queryExecution.toRdd.count()
      }
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      (plain, aqe, salted)
    }
    runSkewJoin() // JIT warmup, discarded
    val (pl, aq, sa) = runSkewJoin()
    println(f"[scale-probe] hot-key join  plain: $pl%.1f s   aqe-skew: $aq%.1f s   salted(16): $sa%.1f s")

    // band join: the nested-loop plan Spark picks for a non-equi band
    // condition vs BandJoinRewrite's exploded equi-join, same 200k x 200k
    // inputs, width-5 band (200k: the quadratic side does 4e10 comparisons, the rewritten side 1M rows)
    def runBandJoin(): (Double, Double) = {
      graft.GraftExtensions.register(spark)
      def a = spark.range(200000).select(col("id").as("ka"))
      def b = spark.range(200000).select(col("id").as("kb"))
      def q = a.join(b,
        col("kb") >= col("ka") + 1 && col("kb") <= col("ka") + 5)
      spark.conf.set("spark.graft.rewriteBandJoin.enabled", "false")
      val loop = t { q.queryExecution.toRdd.count() }
      spark.conf.set("spark.graft.rewriteBandJoin.enabled", "true")
      val rewritten = t { q.queryExecution.toRdd.count() }
      (loop, rewritten)
    }
    runBandJoin() // JIT warmup, discarded
    val (bjLoop, bjRw) = runBandJoin()
    println(f"[scale-probe] band join 200k: nested-loop $bjLoop%.1f s   " +
      f"rewritten $bjRw%.1f s   ratio ${bjLoop / bjRw}%.1f")

    // PQ encode: interpreted HOF folds vs the codegen'd packed
    // expression on the same 200k dim-64 synthetic vectors — the
    // per-row cost that dominates a corpus-wide compression pass
    def runPqEncode(): (Double, Double) = {
      val path = "/tmp/graft_bench_vecs_200k"
      if (!new java.io.File(path, "_SUCCESS").exists())
        spark.range(200000).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)), j =>
            ((pmod(hash(col("id") * 31 + j), lit(1000)).cast("float")
              / lit(500f)) - lit(1f)).cast("float")).as("embedding"))
          .write.mode("overwrite").parquet(path)
      val emb = spark.read.parquet(path)
      emb.queryExecution.toRdd.count() // warm cache
      val sample = graft.operators.SimilaritySearch.pqSampleVectors(emb)
      val hof = t {
        graft.operators.SimilaritySearch.pqEncode(emb, sample)
          .queryExecution.toRdd.count()
      }
      val fused = t {
        graft.operators.SimilaritySearch.pqEncodePacked(emb, sample)
          .queryExecution.toRdd.count()
      }
      (hof, fused)
    }
    runPqEncode() // JIT warmup, discarded
    val (hof, fused) = runPqEncode()
    println(f"[scale-probe] pq encode 200k: declarative $hof%.1f s   codegen packed $fused%.1f s   ratio ${hof / fused}%.1f")
    spark.stop()
  }
}
