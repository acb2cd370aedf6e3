package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SimilaritySearch}

/** Property-style cross-checks for the round-3 operators on randomized
  * (seeded) data — stronger than the fixed-table oracle because the
  * inputs vary: the two-phase kNN join must equal the naive window
  * top-k, LSH near-dup must be a subset of brute force (precision) with
  * every exact-dup pair found (recall floor: identical vectors share
  * every bucket), and the sampling buckets must be monotone in the
  * rate. */
class Round3PropertySpecs extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)
  private def randVec(dim: Int): Array[Float] =
    Array.fill(dim)(rnd.nextFloat() * 2f - 1f)

  private lazy val emb = {
    // 120 random vectors + 10 planted exact duplicates of the first 10
    val base = (0 until 120).map(i => (i.toLong, randVec(16)))
    val dups = (0 until 10).map(i => ((200 + i).toLong, base(i)._2.clone))
    (base ++ dups).toDF("vec_id", "embedding").cache()
  }

  test("knnJoin (two-phase sharded) == naive window top-k") {
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val sharded = SimilaritySearch.knnJoin(emb, queries, k = 7, nShards = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val naive = {
      val scored = emb.crossJoin(broadcast(queries))
        .select($"query_id", $"vec_id",
          graft.functions.VectorFunctions
            .cosineExact($"embedding", $"qvec").as("sim"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"sim".desc, $"vec_id")
      scored.withColumn("rn", row_number().over(w)).filter($"rn" <= 7)
        .select($"query_id", $"vec_id", $"sim")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(sharded == naive)
  }

  test("lshNearDupPairs: perfect precision, finds every exact duplicate") {
    val pairs = SimilaritySearch
      .lshNearDupPairs(emb, nPlanes = 6, simThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // precision: every returned pair is genuinely above threshold (the
    // exact verify guarantees it; this asserts the plumbing kept it)
    assert(pairs.forall(_._3 >= 0.5))
    // recall floor: identical vectors agree on every plane -> same
    // bucket -> the 10 planted exact-dup pairs (sim 1.0) must all appear
    val found = pairs.filter(p => p._3 >= 1.0 - 1e-12)
      .map(p => (p._1, p._2)).toSet
    (0 until 10).foreach { i =>
      assert(found.contains((i.toLong, (200 + i).toLong)),
        s"planted exact dup ($i, ${200 + i}) not found")
    }
  }

  test("minhash estimate is 1 exactly for identical docs, in [0,1] always") {
    val docs = (0 until 30).map { i =>
      val words = (0 until 20)
        .map(j => s"w${math.abs((i / 3 * 31 + j * 7) % 50)}")
      (i.toLong, words.mkString(" ")) // groups of 3 identical docs
    }.toDF("doc_id", "text")
    val est = Dedup.minhashJaccardEstimate(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(est.nonEmpty)
    est.foreach { case (a, b, e, j) =>
      assert(e >= 0.0 && e <= 1.0 && j >= 0.0 && j <= 1.0)
      if (j == 1.0) assert(e == 1.0,
        s"identical docs ($a,$b) must have estimate 1, got $e")
    }
  }

  test("PQ encode: codes in range, identical vectors -> identical codes") {
    val dim = 16
    val m = 4 // 4 subspaces of 4 dims on the random fixture
    val sample = SimilaritySearch.pqSampleVectors(emb, k = 8)
    val codes = SimilaritySearch.pqEncode(emb, sample, m = m).collect()
      .map(r => r.getLong(0) -> (1 to m).map(r.getInt)).toMap
    assert(codes.values.forall(_.forall(c => c >= 0 && c < 8)))
    // the 10 planted exact duplicates must encode identically
    (0 until 10).foreach { i =>
      assert(codes(i.toLong) == codes((200 + i).toLong),
        s"dup pair ($i, ${200 + i}) encoded differently")
    }
    // a codebook sample vector's own code in each subspace is the one
    // with zero distance to itself -> its ADC self-distance is 0
    val sampleIds = emb.select($"vec_id")
      .orderBy(graft.functions.TextFunctions.hash32($"vec_id".cast("string")),
        $"vec_id").limit(8).as[Long].collect()
    val adc = SimilaritySearch.pqAdcTopK(
      SimilaritySearch.pqEncode(emb, sample, m = m), sample,
      sample.head, k = 3, m = m).collect()
    assert(adc.head.getDouble(1) == 0.0)
    assert(adc.exists(r =>
      r.getLong(0) == sampleIds.head && r.getDouble(1) == 0.0))
  }

  test("PqEncode32 packed == declarative encode, and codegen compiles") {
    val sample = SimilaritySearch.pqSampleVectors(emb, k = 8)
    val m = 4
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val packed = SimilaritySearch.pqEncodePacked(emb, sample, m = m)
      val unpacked = packed.select(
        $"vec_id" +: SimilaritySearch.pqUnpack($"pq_packed", m = m): _*)
        .collect().map(r => r.getLong(0) -> (1 to m).map(r.getInt)).toMap
      val declarative = SimilaritySearch.pqEncode(emb, sample, m = m)
        .collect().map(r => r.getLong(0) -> (1 to m).map(r.getInt)).toMap
      assert(unpacked == declarative)
    } finally {
      def restore(key: String, v: Option[String]): Unit = v match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
      restore("spark.sql.codegen.factoryMode", prevFactory)
      restore("spark.sql.codegen.fallback", prevFallback)
    }
  }

  test("ADC over packed codes == ADC over columnar codes") {
    val sample = SimilaritySearch.pqSampleVectors(emb, k = 8)
    val q = emb.filter($"vec_id" === 7).select($"embedding")
      .head.getSeq[Float](0).toArray
    val viaPacked = SimilaritySearch.pqAdcTopKPacked(
      SimilaritySearch.pqEncodePacked(emb, sample, m = 4), sample, q,
      k = 20, m = 4).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaCols = SimilaritySearch.pqAdcTopK(
      SimilaritySearch.pqEncode(emb, sample, m = 4), sample, q,
      k = 20, m = 4).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaPacked.toSeq == viaCols.toSeq)
  }

  test("PQ ADC: query row achieves the minimum lookup sum") {
    val sample = SimilaritySearch.pqSampleVectors(emb, k = 8)
    val q = emb.filter($"vec_id" === 42).select($"embedding")
      .head.getSeq[Float](0).toArray
    val all = SimilaritySearch.pqAdcTopK(
      SimilaritySearch.pqEncode(emb, sample, m = 4), sample, q,
      k = 200, m = 4).collect()
    // adc(42) = sum of per-subspace minima of the LUT -> nothing beats it
    val ofQuery = all.find(_.getLong(0) == 42L).get.getDouble(1)
    assert(ofQuery == all.head.getDouble(1),
      s"query adc $ofQuery != min ${all.head.getDouble(1)}")
    // adc ascending
    assert(all.map(_.getDouble(1)).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("hash-bucket sampling is monotone in the rate (stable buckets)") {
    val docs = (0 until 200)
      .map(i => (i.toLong, s"lang${i % 3}", s"some text for doc $i padding"))
      .toDF("doc_id", "lang", "text")
    def sample(rate: Int) = docs
      .select($"doc_id", pmod(graft.functions.TextFunctions.hash32(
        concat(lit("smp:"), $"doc_id".cast("string"))), lit(100))
        .as("bucket"))
      .filter($"bucket" < rate)
      .select($"doc_id").as[Long].collect().toSet
    val s20 = sample(20)
    val s60 = sample(60)
    assert(s20.subsetOf(s60), "raising the rate must only add documents")
    assert(s60.size > s20.size)
    // rate approximates fraction (hash uniformity, loose bound)
    assert(math.abs(s60.size / 200.0 - 0.6) < 0.15)
  }

  test("chunking: sizes partition the tokens, indices dense, content " +
    "reassembles (randomized lengths)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_chunk_prop_").toString
    // token counts straddling every boundary case: 0, 1, exact multiples
    // of ChunkSize, one-off either side, and random lengths
    val lens = Seq(0, 1, 63, 64, 65, 128, 129) ++
      Seq.fill(20)(rnd.nextInt(400))
    lens.zipWithIndex
      .map { case (n, i) =>
        (i.toLong, (0 until n).map(j => s"t${i}_$j").mkString(" "),
          "en", "prop", n.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.TextQueryCatalog.qt24Chunks(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = rows.groupBy(_._1)
    val cs = graft.queries.TextQueryCatalog.ChunkSize
    lens.zipWithIndex.foreach { case (n, i) =>
      val chunks = byDoc.getOrElse(i.toLong, Array.empty).sortBy(_._2)
      assert(chunks.length == (n + cs - 1) / cs,
        s"doc $i ($n tokens): ${chunks.length} chunks")
      // indices 0..k-1, all full except a ragged tail, sizes sum to n
      assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong))
      assert(chunks.map(_._3).sum == n)
      chunks.dropRight(1).foreach(c => assert(c._3 == cs))
    }
  }

  test("seq packing: gapless per shard, straddle count consistent " +
    "(randomized lengths)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_pack_prop_").toString
    (0 until 60)
      .map { i =>
        val n = rnd.nextInt(600)
        (i.toLong, (0 until n).map(j => s"w$j").mkString(" "),
          "en", "prop", n.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextQueryCatalog.qt25SeqPack(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val L = graft.queries.TextQueryCatalog.SeqLen
    out.groupBy(_._2).values.foreach { shard =>
      var cum = 0L
      shard.sortBy(_._1).foreach {
        case (_, _, nTok, start, first, last, nSeqs) =>
          assert(start == cum, "packed stream must be gapless")
          assert(first == start / L)
          assert(last == (start + nTok) / L) // (cum-1) with the separator
          assert(nSeqs == last - first + 1 && nSeqs >= 1)
          cum += nTok + 1
      }
    }
  }
}
