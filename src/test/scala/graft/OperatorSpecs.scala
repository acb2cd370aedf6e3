package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.functions.TextFunctions
import graft.functions.VectorFunctions

/** Unit specs per SURVEY.md §5.2: labeling (LAG/LEAD variants), daily
  * aggregates, feature pipeline equivalences, dedup and vector math. */
class LabelerSpec extends SparkSpec {
  import spark.implicits._

  lazy val bars = StockFixture.bars(spark).cache()

  test("lag label: first row is 0 (null comparison -> otherwise branch)") {
    val first = Labeler.label(bars).orderBy($"date").select($"buy_or_sell")
      .head().getInt(0)
    assert(first == 0)
  }

  test("lag label matches hand computation") {
    val rows = Labeler.label(bars).orderBy($"date")
      .select($"high", $"buy_or_sell").collect()
    rows.sliding(2).foreach { case Array(prev, cur) =>
      val expected = if (prev.getDouble(0) > cur.getDouble(0)) 1 else 0
      assert(cur.getInt(1) == expected)
    }
  }

  test("lead label matches hand computation and flags the intent variant") {
    val rows = Labeler.label(bars, useLead = true).orderBy($"date")
      .select($"high", $"buy_or_sell").collect()
    rows.sliding(2).foreach { case Array(cur, next) =>
      val expected = if (next.getDouble(0) > cur.getDouble(0)) 1 else 0
      assert(cur.getInt(1) == expected)
    }
    assert(rows.last.getInt(1) == 0)
  }

  test("labelViaJoin (reference join shape) == direct label") {
    val direct = Labeler.label(bars).select($"date", $"buy_or_sell")
    val joined = Labeler.labelViaJoin(bars).select($"date", $"buy_or_sell")
    assert(direct.exceptAll(joined).isEmpty && joined.exceptAll(direct).isEmpty)
  }

  test("label preserves row count (J1 is 1:1 on unique date)") {
    assert(Labeler.labelViaJoin(bars).count() == bars.count())
  }

  test("partitioned label matches global label within partitions") {
    // partitioning by day: within each day, same lag relation except the
    // day's first row (whose global lag crosses the boundary)
    val global = Labeler.label(bars)
    val parted = Labeler.label(bars.withColumn("d", to_date($"date")),
      partitionCols = Seq("d"), orderCols = Seq("date"))
    val g = global.orderBy($"date").select($"buy_or_sell").collect().map(_.getInt(0))
    val p = parted.orderBy($"date").select($"buy_or_sell").collect().map(_.getInt(0))
    g.indices.foreach { i =>
      if (i % 60 != 0) assert(g(i) == p(i), s"row $i")
    }
  }
}

class DailyAggregatesSpec extends SparkSpec {
  import spark.implicits._

  lazy val bars = StockFixture.bars(spark).cache()

  test("avgOpen equals hand-computed daily mean") {
    val got = DailyAggregates.avgOpen(bars).orderBy($"date_only")
      .select($"avg_open").collect().map(_.getDouble(0))
    val want = bars.withColumn("d", to_date($"date"))
      .groupBy($"d").agg(avg($"open").as("a")).orderBy($"d")
      .select($"a").collect().map(_.getDouble(0))
    assert(got.toSeq == want.toSeq)
  }

  test("intended variant: avg_close_prev_day is literally yesterday's avg") {
    val rows = DailyAggregates.avgCloseIntended(bars).orderBy($"date_only")
      .select($"avg_close", $"avg_close_prev_day").collect()
    assert(rows.head.isNullAt(1))
    rows.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getDouble(1) == prev.getDouble(0))
    }
  }

  test("compat variant: one row of slippage per day (the reference quirk)") {
    // avg(lag_close) over a day = avg(close) with the first minute replaced
    // by the previous day's last close — so it differs from avg_close but
    // by less than (maxclose-minclose)/minutesPerDay scale
    val rows = DailyAggregates.avgCloseCompat(bars).orderBy($"date_only").collect()
    rows.tail.foreach { r =>
      val diff = math.abs(r.getDouble(1) - r.getDouble(2))
      assert(diff > 0.0 && diff < 1.0, s"slippage out of range: $r")
    }
  }

  test("dailyFirst on a per-day-constant column is a dedup") {
    val withConst = DailyAggregates.withDateOnly(bars)
      .withColumn("k", dayofmonth($"date_only").cast("double"))
    val got = DailyAggregates.dailyFirst(withConst, "k")
    assert(got.count() == 5)
  }
}

class FeaturePipelineSpec extends SparkSpec {
  import spark.implicits._

  lazy val bars = StockFixture.bars(spark).cache()

  test("fast pipeline: row count preserved, 36 features + keys + label") {
    val out = FeaturePipeline.fast(bars)
    assert(out.count() == bars.count())
    val cols = out.columns.toSet
    FeaturePipeline.featureCols.foreach(c => assert(cols.contains(c), c))
    assert(cols.contains("buy_or_sell") && cols.contains("date_only"))
    FeaturePipeline.consumedCols.filterNot(_ == "RSI18")
      .foreach(c => assert(!cols.contains(c), s"$c should be dropped"))
  }

  test("fast == faithful (same values through 1 shuffle vs 13 joins)") {
    val fast = FeaturePipeline.fast(bars)
    val faithful = FeaturePipeline.faithful(bars)
    val cols = (FeaturePipeline.featureCols ++ Seq("date", "buy_or_sell"))
      .map(col)
    // round to 9 decimals: the two plans sum doubles in different orders
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      df.select(cols: _*).select(df.col("date") +:
        (FeaturePipeline.featureCols :+ "buy_or_sell")
          .map(c => round(col(c), 9).as(c)): _*)
    assert(norm(fast).exceptAll(norm(faithful)).isEmpty,
      "fast rows not in faithful")
    assert(norm(faithful).exceptAll(norm(fast)).isEmpty,
      "faithful rows not in fast")
  }

  test("engineered features match formulas on a sample row") {
    val r = FeaturePipeline.fast(bars)
      .orderBy($"date").limit(1).head()
    def g(c: String) = r.getDouble(r.fieldIndex(c))
    assert(g("sma") > 0 && g("kama") > 0)
    assert(math.abs(g("momentum") - (g("avg_close") - g("avg_close_prev_day"))) < 1e-12)
  }

  test("fast pipeline plans with no single-partition exchange (W4)") {
    // disable GlobalWindow's small-input fast path: this asserts the
    // LARGE-input plan shape, which the tiny fixture would otherwise skip
    spark.conf.set(graft.operators.GlobalWindow.SmallInputConfKey, "0")
    try {
      val plan = FeaturePipeline.fast(bars)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange SinglePartition"),
        s"single-partition exchange in the fast pipeline:\n$plan")
    } finally spark.conf.unset(graft.operators.GlobalWindow.SmallInputConfKey)
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "THE  QUICK   brown fox jumps over the lazy dog"), // normalises to dup
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different content about spark engines and scale"),
    (5L, "ab")) // < 3 tokens -> null minhash signature
    .toDF("doc_id", "text")

  test("exact dedup groups normalised duplicates, keeps min id") {
    val out = Dedup.exactDedup(docs).collect()
    assert(out.length == 4)
    val dupGroup = out.find(_.getLong(2) == 3)
    assert(dupGroup.isDefined && dupGroup.get.getLong(1) == 0L)
  }

  test("identical docs have identical minhash signatures") {
    val sigs = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.get)).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(4L))
  }

  test("short docs get null signatures and are excluded from LSH") {
    val sig5 = Dedup.minhashSignatures(docs).filter($"doc_id" === 5).head()
    assert(sig5.isNullAt(1))
    val pairs = Dedup.lshCandidatePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.lshCandidatePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L)) || pairs.contains((1L, 3L)),
      s"near-dup not found in $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard: identical -> 1, disjoint -> 0, near -> between") {
    val out = docs.as("a").crossJoin(docs.as("b"))
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
        Dedup.ngramJaccard(col("a.text"), col("b.text")).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((0L, 1L)) == 1.0)
    assert(out((0L, 4L)) == 0.0)
    assert(out((0L, 3L)) > 0.3 && out((0L, 3L)) < 1.0)
  }

  test("simhash: identical docs equal, near docs close in hamming distance") {
    val sh = Dedup.simhashDedup(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(3L)) < hamming(sh(0L), sh(4L)))
  }

  test("native SimHash32 == declarative HOF fold, incl. unicode and corpus") {
    // synthetic edge cases + the real corpus: the codegen'd expression
    // must reproduce the interpreted fold bit for bit
    val edge = Seq((100L, ""), (101L, "one"), (102L, "ünïcödé tøkens 漢字 mixed"),
      (103L, "a b c d e f g h i j k l m n o p q r s t"),
      (104L, "  padded   whitespace   runs  "))
      .toDF("doc_id", "text")
    val corpus = spark.read.parquet(sf("documents"))
      .select($"doc_id", $"text")
    for (df <- Seq(edge, corpus.limit(200))) {
      val both = df.select($"doc_id",
        Dedup.simhash($"text").as("fast"),
        Dedup.simhashHof($"text").as("hof")).collect()
      both.foreach(r => assert(r.getLong(1) == r.getLong(2),
        s"simhash mismatch for doc ${r.getLong(0)}"))
    }
  }

  test("simhash32 is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    spark.read.parquet(sf("documents"))
      .createOrReplaceTempView("docs_simhash_sql")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  simhash32(regexp_extract_all(text, '\\S+', 0)) AS sh
        |FROM docs_simhash_sql ORDER BY doc_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = spark.read.parquet(sf("documents"))
      .select($"doc_id", Dedup.simhash($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
  }

  test("SimHash32 doGenCode actually compiles (no silent fallback)") {
    // CODEGEN_ONLY + fallback=false: a Janino failure in the generated
    // code fails the query instead of silently interpreting nullSafeEval
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = spark.read.parquet(sf("documents")).limit(50)
        .select(Dedup.simhash($"text").as("sh"))
        .agg(countDistinct($"sh")).head.getLong(0)
      assert(n > 1)
    } finally {
      def restore(k: String, v: Option[String]): Unit = v match {
        case Some(p) => spark.conf.set(k, p)
        case None => spark.conf.unset(k)
      }
      restore("spark.sql.codegen.factoryMode", prevFactory)
      restore("spark.sql.codegen.fallback", prevFallback)
    }
  }

  test("simhashPairs == brute-force hamming join (pigeonhole recall is exact)") {
    // real corpus: every (id_a, id_b, hamming) with distance <= maxDist
    // must match the quadratic reference exactly, for several maxDist
    // (different block widths: 16, 10, 8 bits)
    val corpus = spark.read.parquet(sf("documents"))
    val sh = Dedup.simhashDedup(corpus).select($"doc_id", $"simhash")
    for (maxDist <- Seq(1, 2, 3)) {
      val brute = sh.as("a").join(sh.as("b"), $"b.doc_id" > $"a.doc_id")
        .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
          bit_count($"a.simhash".bitwiseXOR($"b.simhash")).as("hamming"))
        .filter($"hamming" <= maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val banded = Dedup.simhashPairs(corpus, maxDist = maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(banded == brute,
        s"maxDist=$maxDist: banded ${banded.size} pairs != brute ${brute.size}")
    }
  }
}

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identity 1, orthogonal 0, opposite -1") {
    val df = Seq(
      (Array(1f, 0f, 2f), Array(1f, 0f, 2f), "same"),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f), "orth"),
      (Array(1f, 2f, 3f), Array(-1f, -2f, -3f), "opp"))
      .toDF("a", "b", "k")
    val got = df.select($"k", VectorFunctions.cosineExact($"a", $"b").as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("same") - 1.0) < 1e-9)
    assert(math.abs(got("orth")) < 1e-12)
    assert(math.abs(got("opp") + 1.0) < 1e-9)
  }

  test("brute-force top-k returns self first with sim 1") {
    val emb = spark.read.parquet(sf("embeddings"))
    val q = emb.filter($"vec_id" === 3).select($"embedding".as("qv"))
    val top = SimilaritySearch.bruteForceTopK(
      emb.crossJoin(broadcast(q)), $"qv", 5).collect()
    assert(top.head.getLong(0) == 3L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    val sims = top.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("ivf assignment puts every vector in exactly one bucket") {
    val emb = spark.read.parquet(sf("embeddings"))
    val cents = SimilaritySearch.hashSampledCentroids(emb, 8)
    val assigned = SimilaritySearch.ivfAssign(emb, cents)
    assert(assigned.count() == emb.count())
    assert(assigned.select($"bucket").distinct().count() <= 8)
  }
}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("token count and shingles") {
    val df = Seq(("a bb  ccc dddd", 1)).toDF("t", "k")
    assert(df.select(TextFunctions.tokenCount($"t")).head().getInt(0) == 4)
    val sh = df.select(TextFunctions.wordShingles($"t", 3)).head()
      .getSeq[String](0)
    assert(sh == Seq("a bb ccc", "bb ccc dddd"))
  }

  test("language id picks the marked language") {
    val df = Seq(
      ("the cat and the dog is here", "en"),
      ("der hund und die katze ist hier", "de"),
      ("le chat et la table est ici", "fr"))
      .toDF("t", "want")
    val got = df.select($"want", TextFunctions.langId($"t")).collect()
    got.foreach(r => assert(r.getString(1) == r.getString(0), r.toString))
  }

  test("fingerprint normalises case and whitespace") {
    val df = Seq(("Hello   World", "hello world")).toDF("a", "b")
    val r = df.select(TextFunctions.fingerprint($"a"),
      TextFunctions.fingerprint($"b")).head()
    assert(r.getString(0) == r.getString(1))
  }
}
