package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.SimilaritySearch

import Oracle.table

/** Similarity-search catalog over `embeddings` (`vec_id, embedding:
  * array<float>, label`). Dot products fold in exact decimal (see
  * [[graft.functions.VectorFunctions]]) so the DuckDB twins reproduce
  * every bit; the SQL side uses list comprehensions over 1-indexed lists.
  */
object VectorQueryCatalog {

  type Q = (SparkSession, String) => DataFrame

  /** Brute-force cosine top-k against the vec_id=0 query vector —
    * the ANN baseline. */
  val qv1Knn: Q = (s, dir) => {
    val emb = table(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    SimilaritySearch.bruteForceTopK(
      emb.crossJoin(broadcast(q)), col("qv"), 10)
  }

  /** Cosine of consecutive vec_id pairs (linear all-pairs proxy). Norms
    * are hoisted below the join (computed once per vector, not once per
    * pair side) — same bits, one decimal fold per pair instead of three. */
  val qv2ConsecutiveCosine: Q = (s, dir) => {
    val e = table(s, dir, "embeddings")
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"),
      sqrt(norm2Exact(col("embedding"))).as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
      sqrt(norm2Exact(col("embedding"))).as("nb"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(col("id_a"), col("id_b"),
        cosineExactPre(col("va"), col("vb"), col("na"), col("nb")).as("sim"))
  }

  /** LSH bucket histogram (signed random projections, 8 planes). */
  val qv3LshBuckets: Q = (s, dir) =>
    SimilaritySearch.lshBucketsExact(table(s, dir, "embeddings"), 8)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"))

  /** IVF assignment histogram: 16 deterministic pseudo-centroids,
    * argmax-cosine bucket per vector (the partition step of the ANN
    * scale path). */
  val qv4IvfAssign: Q = (s, dir) => {
    val emb = table(s, dir, "embeddings")
    val cents = SimilaritySearch.hashSampledCentroids(emb, 16)
    val assigned = SimilaritySearch.ivfAssignExact(emb, cents)
    assigned.groupBy(col("bucket")).agg(count(lit(1)).as("n_vectors"))
  }

  /** Embedding-cosine near-duplicate detection: same-label pairs within
    * an id band of 5 over a similarity threshold (dedup-by-embedding
    * shape). The band predicate `id_a < id_b <= id_a + 5` is rewritten as
    * 5 exploded equi-keys — Spark plans a non-equi join as an O(N²)
    * nested-loop, whereas the exploded form is a plain shuffled equi-join
    * over 5N rows (79 s → sub-second at sf0.1, and the only form that
    * survives 100 TB). */
  val qv5EmbedDedup: Q = (s, dir) => {
    val e = table(s, dir, "embeddings")
    val a = e.select(col("vec_id").as("id_a"), col("label").as("label_a"),
        col("embedding").as("va"),
        sqrt(norm2Exact(col("embedding"))).as("na"),
        explode(sequence(lit(1), lit(5))).as("off"))
      .select(col("id_a"), col("label_a"), col("va"), col("na"),
        (col("id_a") + col("off")).as("id_b"))
    val b = e.select(col("vec_id").as("id_b"), col("label").as("label_b"),
      col("embedding").as("vb"),
      sqrt(norm2Exact(col("embedding"))).as("nb"))
    a.join(b, Seq("id_b"))
      .filter(col("label_a") === col("label_b"))
      .select(col("id_a"), col("id_b"),
        cosineExactPre(col("va"), col("vb"), col("na"), col("nb")).as("sim"),
        // pushdown fence: PushPredicateThroughNonJoin only fires when every
        // projected field is deterministic — without the fence the sim>0.2
        // predicate is cloned BELOW this projection and the decimal cosine
        // evaluates twice per pair (once in the Filter, once here)
        monotonically_increasing_id().as("_fence"))
      .filter(col("sim") > 0.2)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** End-to-end IVF probe: assign every vector to its centroid bucket,
    * pick the 4 buckets nearest the query vector, search only those —
    * the full partition/probe ANN path (≈ probes/C of the corpus scanned
    * at query time). Query vector collected once (1 row) and inlined. */
  val qv6IvfQuery: Q = (s, dir) => {
    val emb = table(s, dir, "embeddings")
    val cents = SimilaritySearch.hashSampledCentroids(emb, 16)
    val bucketed = emb.join(
      SimilaritySearch.ivfAssignExact(emb, cents), Seq("vec_id"))
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0)
    SimilaritySearch.ivfQuery(bucketed, cents, typedlit(qvec),
      k = 10, probes = 4)
  }

  /** qv1 on the PRODUCTION scoring path: the codegen'd
    * [[graft.functions.FloatDot]] double fold instead of the decimal
    * hop. Oracle-exact because the oracle's `list_reduce` is the same
    * sequential left fold over the same widened doubles — so the fast
    * path is verified bit-for-bit too, not just the decimal path. */
  val qv7KnnCodegen: Q = (s, dir) => {
    val emb = table(s, dir, "embeddings")
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0)
    val q = typedlit(qvec)
    emb.select(col("vec_id"), cosine(col("embedding"), q).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** IVF recall@10: the probes=4 IVF result scored against the
    * brute-force top-10 ground truth — the measured answer to "how much
    * does the ANN shortcut cost?". Deterministic hash-sampled centroids
    * keep every step DuckDB-reproducible, so the recall VALUE itself
    * hash-checks; the k-means-trained variant (not SQL-expressible) is
    * held to recall ≥ 0.9 in `IvfRecallSpec`. */
  val qv8IvfRecall: Q = (s, dir) => {
    val emb = table(s, dir, "embeddings")
    val cents = SimilaritySearch.hashSampledCentroids(emb, 16)
    val bucketed = emb.join(
      SimilaritySearch.ivfAssignExact(emb, cents), Seq("vec_id"))
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0)
    val approx = SimilaritySearch.ivfQuery(bucketed, cents, typedlit(qvec),
      k = 10, probes = 4)
    val truth = SimilaritySearch.bruteForceTopK(
      emb.crossJoin(broadcast(
        emb.filter(col("vec_id") === 0).select(col("embedding").as("qv")))),
      col("qv"), 10)
    SimilaritySearch.recallAtK(truth, approx)
  }

  /** Embedding near-dup THE SCALE WAY ([[SimilaritySearch.lshNearDupPairs]]):
    * SRP-LSH bucket join + exact-cosine verify — one shuffle by bucket,
    * quadratic work confined to buckets (qv5's id-band join is the
    * bounded-window proxy; this is the whole-corpus form). 6 planes =
    * 64 buckets over the 500-vector table. */
  val qv9LshNearDup: Q = (s, dir) =>
    SimilaritySearch.lshNearDupPairs(table(s, dir, "embeddings"),
      nPlanes = 6, simThreshold = 0.2)

  /** Batch kNN join: top-5 corpus neighbours for each of the 10 query
    * vectors vec_id < 10, via the two-phase sharded top-k (the scored
    * N·Q table never shuffles). */
  val qv10KnnJoin: Q = (s, dir) => {
    val emb = table(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    SimilaritySearch.knnJoin(emb, queries, k = 5)
  }

  /** PQ codes for the whole corpus ([[SimilaritySearch.pqEncode]]):
    * 8 subspaces × 16 deterministic codebook entries, squared-L2
    * argmin per subspace — map-only, zero shuffles. The oracle
    * recomputes every code from the same hash-sampled codebook via a
    * rank-over-cross-join argmin (an independent formulation of the
    * same minimisation). */
  val qv11PqEncode: Q = (s, dir) => {
    val emb = table(s, dir, "embeddings")
    SimilaritySearch.pqEncode(emb, SimilaritySearch.pqSampleVectors(emb))
  }

  /** ADC top-10 for query vec 0 over the PQ-encoded corpus
    * ([[SimilaritySearch.pqAdcTopK]]): per-row LUT lookups + an M-term
    * sequential sum, then TakeOrdered — the IVF-PQ probe inner loop.
    * The query's own row must rank first (its ADC distance is the
    * minimum achievable sum by construction), which the oracle check
    * enforces for free. */
  val qv12PqAdc: Q = (s, dir) => {
    val emb = table(s, dir, "embeddings")
    val sample = SimilaritySearch.pqSampleVectors(emb)
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    SimilaritySearch.pqAdcTopK(
      SimilaritySearch.pqEncode(emb, sample), sample, qvec, k = 10)
  }

  /** The PACKED production encode ([[SimilaritySearch.pqEncodePacked]],
    * codegen'd [[graft.functions.PqEncode32]]): one long per vector.
    * The oracle recomputes every code independently and packs with
    * integer shifts — so the custom expression's fused loop is held to
    * the same bits as the declarative argmin. */
  val qv13PqPacked: Q = (s, dir) => {
    val emb = table(s, dir, "embeddings")
    SimilaritySearch.pqEncodePacked(emb,
      SimilaritySearch.pqSampleVectors(emb))
  }

  /** SemDeDup ([[SimilaritySearch.semDedup]]): 64 deterministic
    * clusters, τ = 0.2 — per vector, its cluster and whether a
    * smaller-id cluster-mate above τ prunes it. The oracle recomputes
    * the float argmax assignment (rank-over-cross-join) and every
    * in-cluster pair cosine with the same sequential double fold. */
  val qv14SemDedup: Q = (s, dir) =>
    SimilaritySearch.semDedup(table(s, dir, "embeddings"),
      SimilaritySearch.hashSampledCentroids(table(s, dir, "embeddings"), 64),
      tau = 0.2)

  /** qv14 with the oversized-cluster backstop BITING (r12): a cap of
    * 10 excludes the biggest clusters from the pairwise phase — their
    * members survive unpruned — while small clusters keep pruning.
    * The oracle recomputes the cluster sizes and applies the same
    * exclusion declaratively, so the hash match proves the guard
    * changes exactly the capped clusters' verdicts and nothing
    * else. */
  val qv20SemDedupCapped: Q = (s, dir) =>
    SimilaritySearch.semDedup(table(s, dir, "embeddings"),
      SimilaritySearch.hashSampledCentroids(table(s, dir, "embeddings"), 64),
      tau = 0.2, maxCluster = 10)

  /** The deployed IVF-PQ read path composed end to end
    * ([[SimilaritySearch.ivfPqQuery]]): probe the 4 nearest of 16 IVF
    * buckets, ADC-shortlist 50 candidates over the packed PQ codes
    * (codegen'd encode), exact-L2 re-rank to the final top-10. The
    * oracle recomputes all three stages independently — probe set via
    * rank-over-cross-join, codes via the argmin formulation, ADC via
    * the LUT join — so a drift in ANY stage (probe choice, one code,
    * shortlist cut, re-rank order) fails the hash. */
  val qv15IvfPqQuery: Q = (s, dir) => {
    val emb = table(s, dir, "embeddings")
    val cents = SimilaritySearch.hashSampledCentroids(emb, 16)
    val bucketed = emb.join(
      SimilaritySearch.ivfAssignExact(emb, cents), Seq("vec_id"))
    val sample = SimilaritySearch.pqSampleVectors(emb)
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    SimilaritySearch.ivfPqQuery(bucketed, cents, sample, qvec,
      k = 10, probes = 4, shortlist = 50)
  }

  /** FILTERED vector search — metadata predicate composed with the IVF
    * probe path (the standard vector-db "where label = X" query): the
    * label filter applies to the bucketed table BEFORE the per-row
    * cosine, so the probe scans (probes/C · selectivity) of the corpus
    * — predicate and index multiply, neither disables the other. The
    * top-k is label-homogeneous by construction, which the oracle
    * re-derives independently. */
  val qv16FilteredKnn: Q = (s, dir) => {
    val emb = table(s, dir, "embeddings")
    val cents = SimilaritySearch.hashSampledCentroids(emb, 16)
    val bucketed = emb.join(
      SimilaritySearch.ivfAssignExact(emb, cents), Seq("vec_id"))
      .filter(col("label") === 3)
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0)
    SimilaritySearch.ivfQuery(bucketed, cents, typedlit(qvec),
      k = 10, probes = 4)
  }

  /** SELECTIVITY-ADAPTIVE filtered search — the SCALE.md escalation
    * rule live: the predicate (`label <= 4`, ~half the corpus by the
    * generator's uniform label draw) is measured by the operator
    * itself, which picks `round(4 / 0.5) = 8` of the 16 buckets and
    * runs the filtered probe. The oracle pins the CHOSEN budget: its
    * probe CTE is LIMIT 8, so if the selectivity estimate or the
    * rounding rule drifted (sel here sits within ±2% of 0.5 at every
    * sf — `round` keeps the choice stable where `ceil` would sit on
    * the 8-vs-9 knife edge), the result sets diverge and the hash
    * gate catches it. */
  val qv17FilteredKnnAuto: Q = (s, dir) => {
    val emb = table(s, dir, "embeddings")
    val cents = SimilaritySearch.hashSampledCentroids(emb, 16)
    val bucketed = emb.join(
      SimilaritySearch.ivfAssignExact(emb, cents), Seq("vec_id"))
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0)
    SimilaritySearch.filteredKnnAuto(bucketed, cents,
      col("label") <= 4, typedlit(qvec), k = 10, baseProbes = 4)
  }

  /** The PERSISTED ANN index lifecycle end to end
    * ([[graft.sources.VectorIndex]] — r10 VERDICT ask #1): build the
    * index over a committed base lake (80% of the corpus), OCC-append
    * the remaining 20%, REFRESH (assigns only the appended files'
    * rows against the pinned centroids — cost ∝ churn), then answer
    * the probes=4 top-10 from the STORED buckets (partition-pruned
    * probe scan + live-DV filter). The oracle replays the equivalent
    * in-query computation (qv6's SQL with the centroid sample
    * restricted to the base rows): a hash match proves the stored
    * index answers bit-identically to computing everything in-query
    * over the final corpus — the index changes WHERE the work
    * happens, never the answer. */
  val qv18IndexedKnn: Q = (s, dir) => {
    import graft.sources.{Occ, VectorIndex}
    val work = ExtendedQueries.tempWork("graft_qv18_")
    val lake = s"$work/lake"
    val idx = s"$work/vidx"
    val emb = table(s, dir, "embeddings")
    Occ.append(s, lake, emb.filter(pmod(col("vec_id"), lit(5)) =!= 0))
    VectorIndex.build(s, lake, idx, VectorIndex.Params(c = 16))
    Occ.append(s, lake, emb.filter(pmod(col("vec_id"), lit(5)) === 0))
    val (nFiles, nRows) = VectorIndex.refresh(s, lake, idx)
    require(nFiles > 0 && nRows > 0,
      s"qv18: refresh must cover the appended batch ($nFiles/$nRows)")
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0)
    VectorIndex.query(s, lake, idx, qvec, k = 10, probes = 4)
  }

  /** FILTERED ANN over the PERSISTED index: the label predicate
    * evaluates INSIDE the probe-pruned index scan — at build time the
    * index CARRIED the filter column beside each vector
    * (`Params.carryCols`), so a filtered query never joins back to
    * the lake per candidate row (the storage-side half of the
    * qv16/qv17 filtered-search family). The oracle is qv16's exact
    * in-query computation: a hash match proves the stored-index
    * filtered answer is bit-identical to filtering the in-query
    * assignment — same centroids, same probes, same tiebreaks. */
  val qv19IndexedFilteredKnn: Q = (s, dir) => {
    import graft.sources.{Occ, VectorIndex}
    val work = ExtendedQueries.tempWork("graft_qv19_")
    val lake = s"$work/lake"
    val idx = s"$work/vidx"
    val emb = table(s, dir, "embeddings")
    Occ.append(s, lake, emb)
    VectorIndex.build(s, lake, idx,
      VectorIndex.Params(c = 16, carryCols = Seq("label")))
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0)
    VectorIndex.queryFiltered(s, lake, idx, col("label") === 3, qvec,
      k = 10, probes = 4)
  }

  val defs: Map[String, Q] = Map(
    "qv19_indexed_filtered_knn" -> qv19IndexedFilteredKnn,
    "qv18_indexed_knn" -> qv18IndexedKnn,
    "qv17_filtered_knn_auto" -> qv17FilteredKnnAuto,
    "qv16_filtered_knn" -> qv16FilteredKnn,
    "qv15_ivfpq_query" -> qv15IvfPqQuery,
    "qv14_semdedup" -> qv14SemDedup,
    "qv20_semdedup_capped" -> qv20SemDedupCapped,
    "qv13_pq_packed" -> qv13PqPacked,
    "qv11_pq_encode" -> qv11PqEncode,
    "qv12_pq_adc" -> qv12PqAdc,
    "qv8_ivf_recall" -> qv8IvfRecall,
    "qv9_lsh_near_dup" -> qv9LshNearDup,
    "qv10_knn_join" -> qv10KnnJoin,
    "qv1_knn" -> qv1Knn,
    "qv6_ivf_query" -> qv6IvfQuery,
    "qv7_knn_codegen" -> qv7KnnCodegen,
    "qv2_consecutive_cosine" -> qv2ConsecutiveCosine,
    "qv3_lsh_buckets" -> qv3LshBuckets,
    "qv4_ivf_assign" -> qv4IvfAssign,
    "qv5_embed_dedup" -> qv5EmbedDedup)

  // ---------- generated DuckDB twins ----------

  /** Exact decimal dot product of two DuckDB lists (1-indexed). */
  private def dotSql(a: String, b: String): String =
    s"""CAST(list_sum([CAST((CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))
       | AS DECIMAL(38,12)) for i in range(1, len($a) + 1)]) AS DOUBLE)""".stripMargin

  private def cosineSql(a: String, b: String): String =
    s"""(CASE WHEN sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}) > 0
       | THEN ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))
       | ELSE 0.0 END)""".stripMargin

  /** hash32 of an int expression rendered as its decimal string. */
  private def hash32OfInt(e: String): String =
    s"CAST(('0x' || substr(md5(CAST($e AS VARCHAR)),1,8)) AS BIGINT)"

  private val centroidsSql: String =
    s"""SELECT vec_id AS centroid_id, embedding AS centroid
       |FROM embeddings
       |ORDER BY ${hash32OfInt("vec_id")}, vec_id LIMIT 16""".stripMargin

  /** One LSH plane component j (0-based) for plane p. */
  private def planeCompSql(p: Int): String =
    s"""[(CAST(CAST(('0x' || substr(md5($p || ':' || CAST(i - 1 AS VARCHAR)),1,8))
       | AS BIGINT) AS DOUBLE) / 2147483648.0) - 1.0
       | for i in range(1, len(embedding) + 1)]""".stripMargin

  private def planeBitSql(p: Int): String =
    s"""(CASE WHEN CAST(list_sum([CAST((CAST(embedding[i] AS DOUBLE) * h$p[i])
       | AS DECIMAL(38,12)) for i in range(1, len(embedding) + 1)]) AS DOUBLE) >= 0
       | THEN ${1L << p} ELSE 0 END)""".stripMargin

  /** Sequential double left-fold dot — mirrors [[graft.functions.FloatDot]]'s
    * ascending-order double accumulation (DuckDB `list_reduce` folds
    * left-to-right; `0.0 + x = x` under IEEE, so the prepended zero seed
    * matches the expression's `acc = 0.0` start). */
  private def dotSeqSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0,
       | [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)
       |  for i in range(1, len($a) + 1)]), (x, y) -> x + y)""".stripMargin

  private def cosineSeqSql(a: String, b: String): String =
    s"""(CASE WHEN sqrt(${dotSeqSql(a, a)}) * sqrt(${dotSeqSql(b, b)}) > 0
       | THEN ${dotSeqSql(a, b)} / (sqrt(${dotSeqSql(a, a)}) * sqrt(${dotSeqSql(b, b)}))
       | ELSE 0.0 END)""".stripMargin

  /** planes + bucketed CTE bodies for an nPlanes SRP-LSH bucket table
    * on the PRODUCTION float path (`lshBucketsFloat`): plane components
    * rounded through REAL exactly as the Spark side rounds its double
    * literals to float, dot as `list_sum` over doubles (DuckDB's
    * sequential left fold == FloatDot's accumulation order). Keeps the
    * embedding column for downstream cosines. */
  private def lshBucketCtes(nPlanes: Int): String = {
    val planes = (0 until nPlanes).map { p =>
      val comp = s"(CAST(CAST(('0x' || substr(md5($p || ':' || " +
        "CAST(i - 1 AS VARCHAR)),1,8)) AS BIGINT) AS DOUBLE) " +
        "/ 2147483648.0) - 1.0"
      s"""[CAST($comp AS REAL)
         | for i in range(1, len(embedding) + 1)] AS h$p""".stripMargin
    }.mkString(",\n  ")
    val bits = (0 until nPlanes).map { p =>
      s"""(CASE WHEN list_sum([CAST(embedding[i] AS DOUBLE) * CAST(h$p[i] AS DOUBLE)
         | for i in range(1, len(embedding) + 1)]) >= 0
         | THEN ${1L << p} ELSE 0 END)""".stripMargin
    }.mkString("\n   + ")
    s"""planes AS (SELECT vec_id, embedding, $planes FROM embeddings),
       |bucketed AS (SELECT vec_id, embedding, ($bits) AS bucket
       |             FROM planes)""".stripMargin
  }

  /** Shared PQ CTEs: deterministic codebook (same hash32-ordered sample
    * as the Spark side, k = sample rank), per-(vector, subspace, code)
    * squared-L2 via the same sequential `list_sum` double fold, then the
    * argmin as rank-over-cross-join — an independent formulation of the
    * encoder's columnar argmin. Subspace width 8 = dim 64 / M
    * (TESTDATA.md's embedding dimension). */
  private val PqSubDim = 8

  private def pqCtes: String = {
    val m = SimilaritySearch.PqM
    val k = SimilaritySearch.PqK
    val sd = PqSubDim
    s"""sample AS (
       |  SELECT k, embedding FROM (
       |    SELECT row_number() OVER (
       |        ORDER BY ${hash32OfInt("vec_id")}, vec_id) - 1 AS k,
       |      embedding
       |    FROM embeddings) WHERE k < $k),
       |cb AS (
       |  SELECT t.m, s.k,
       |    [s.embedding[t.m * $sd + i] for i in range(1, ${sd + 1})] AS cvec
       |  FROM sample s CROSS JOIN generate_series(0, ${m - 1}) t(m)),
       |scored AS (
       |  SELECT e.vec_id, c.m, c.k,
       |    list_sum([
       |      (CAST(e.embedding[c.m * $sd + i] AS DOUBLE)
       |         - CAST(c.cvec[i] AS DOUBLE))
       |      * (CAST(e.embedding[c.m * $sd + i] AS DOUBLE)
       |         - CAST(c.cvec[i] AS DOUBLE))
       |      for i in range(1, ${sd + 1})]) AS d2
       |  FROM embeddings e CROSS JOIN cb c),
       |codes AS (
       |  SELECT vec_id, m, CAST(k AS INTEGER) AS code FROM (
       |    SELECT vec_id, m, k,
       |      row_number() OVER (PARTITION BY vec_id, m
       |        ORDER BY d2 ASC, k ASC) AS rn
       |    FROM scored) WHERE rn = 1)""".stripMargin
  }

  /** Sequential double left-fold squared-L2 — mirrors the Spark side's
    * `aggregate(zip_with(...), 0.0, +)` accumulation order exactly
    * (see [[dotSeqSql]] on why list_reduce + prepended zero, not
    * list_sum, is the safe twin for a dim-64 double fold). */
  private def seqD2Sql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0,
       | [(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
       |  * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
       |  for i in range(1, len($a) + 1)]), (x, y) -> x + y)""".stripMargin

  private def pqPivotCols: String =
    (0 until SimilaritySearch.PqM)
      .map(mi => s"MAX(CASE WHEN m = $mi THEN code END) AS pq$mi")
      .mkString(",\n  ")

  val sql: Map[String, String] = Map(
    "qv17_filtered_knn_auto" ->
      s"""WITH cents AS ($centroidsSql),
         |cscored AS (
         |  SELECT e.vec_id, c.centroid_id,
         |    ${cosineSql("e.embedding", "c.centroid")} AS sim
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, centroid_id AS bucket FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY sim DESC, centroid_id) AS rn
         |    FROM cscored) WHERE rn = 1),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |probes AS (
         |  SELECT centroid_id AS bucket
         |  FROM cents CROSS JOIN q
         |  ORDER BY ${cosineSql("centroid", "qv")} DESC, centroid_id
         |  LIMIT 8)
         |SELECT e.vec_id, ${cosineSql("e.embedding", "qv")} AS sim
         |FROM embeddings e
         |JOIN assigned a ON a.vec_id = e.vec_id
         |JOIN probes p ON p.bucket = a.bucket
         |CROSS JOIN q
         |WHERE e.label <= 4
         |ORDER BY sim DESC, e.vec_id LIMIT 10""".stripMargin,
    "qv19_indexed_filtered_knn" ->
      s"""WITH cents AS ($centroidsSql),
         |cscored AS (
         |  SELECT e.vec_id, c.centroid_id,
         |    ${cosineSql("e.embedding", "c.centroid")} AS sim
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, centroid_id AS bucket FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY sim DESC, centroid_id) AS rn
         |    FROM cscored) WHERE rn = 1),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |probes AS (
         |  SELECT centroid_id AS bucket
         |  FROM cents CROSS JOIN q
         |  ORDER BY ${cosineSql("centroid", "qv")} DESC, centroid_id
         |  LIMIT 4)
         |SELECT e.vec_id, ${cosineSql("e.embedding", "qv")} AS sim
         |FROM embeddings e
         |JOIN assigned a ON a.vec_id = e.vec_id
         |JOIN probes p ON p.bucket = a.bucket
         |CROSS JOIN q
         |WHERE e.label = 3
         |ORDER BY sim DESC, e.vec_id LIMIT 10""".stripMargin,
    "qv16_filtered_knn" ->
      s"""WITH cents AS ($centroidsSql),
         |cscored AS (
         |  SELECT e.vec_id, c.centroid_id,
         |    ${cosineSql("e.embedding", "c.centroid")} AS sim
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, centroid_id AS bucket FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY sim DESC, centroid_id) AS rn
         |    FROM cscored) WHERE rn = 1),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |probes AS (
         |  SELECT centroid_id AS bucket
         |  FROM cents CROSS JOIN q
         |  ORDER BY ${cosineSql("centroid", "qv")} DESC, centroid_id
         |  LIMIT 4)
         |SELECT e.vec_id, ${cosineSql("e.embedding", "qv")} AS sim
         |FROM embeddings e
         |JOIN assigned a ON a.vec_id = e.vec_id
         |JOIN probes p ON p.bucket = a.bucket
         |CROSS JOIN q
         |WHERE e.label = 3
         |ORDER BY sim DESC, e.vec_id LIMIT 10""".stripMargin,
    "qv15_ivfpq_query" -> {
      val sd = PqSubDim
      s"""WITH cents AS ($centroidsSql),
         |cscored AS (
         |  SELECT e.vec_id, c.centroid_id,
         |    ${cosineSql("e.embedding", "c.centroid")} AS sim
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, centroid_id AS bucket FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY sim DESC, centroid_id) AS rn
         |    FROM cscored) WHERE rn = 1),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |probes AS (
         |  SELECT centroid_id AS bucket
         |  FROM cents CROSS JOIN q
         |  ORDER BY ${cosineSql("centroid", "qv")} DESC, centroid_id
         |  LIMIT 4),
         |probed AS (
         |  SELECT e.vec_id, e.embedding
         |  FROM embeddings e
         |  JOIN assigned a ON a.vec_id = e.vec_id
         |  JOIN probes p ON p.bucket = a.bucket),
         |$pqCtes,
         |lut AS (
         |  SELECT c.m, c.k,
         |    list_sum([
         |      (CAST(q.qv[c.m * $sd + i] AS DOUBLE)
         |         - CAST(c.cvec[i] AS DOUBLE))
         |      * (CAST(q.qv[c.m * $sd + i] AS DOUBLE)
         |         - CAST(c.cvec[i] AS DOUBLE))
         |      for i in range(1, ${sd + 1})]) AS d2
         |  FROM cb c CROSS JOIN q),
         |adc AS (
         |  SELECT cd.vec_id, list_sum(list(l.d2 ORDER BY cd.m)) AS adc
         |  FROM codes cd
         |  JOIN probed pr ON pr.vec_id = cd.vec_id
         |  JOIN lut l ON l.m = cd.m AND l.k = cd.code
         |  GROUP BY cd.vec_id),
         |short AS (
         |  SELECT vec_id FROM adc ORDER BY adc ASC, vec_id LIMIT 50)
         |SELECT pr.vec_id, ${seqD2Sql("pr.embedding", "q.qv")} AS d2
         |FROM probed pr
         |JOIN short s ON s.vec_id = pr.vec_id
         |CROSS JOIN q
         |ORDER BY d2 ASC, pr.vec_id LIMIT 10""".stripMargin
    },
    "qv11_pq_encode" ->
      s"""WITH $pqCtes
         |SELECT vec_id,
         |  $pqPivotCols
         |FROM codes GROUP BY vec_id""".stripMargin,
    "qv13_pq_packed" ->
      s"""WITH $pqCtes
         |SELECT vec_id,
         |  CAST(sum(CAST(code AS BIGINT)
         |    * (CAST(1 AS BIGINT) << CAST(4 * m AS INTEGER))) AS BIGINT)
         |    AS pq_packed
         |FROM codes GROUP BY vec_id""".stripMargin,
    "qv12_pq_adc" -> {
      val sd = PqSubDim
      s"""WITH $pqCtes,
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |lut AS (
         |  SELECT c.m, c.k,
         |    list_sum([
         |      (CAST(q.qv[c.m * $sd + i] AS DOUBLE)
         |         - CAST(c.cvec[i] AS DOUBLE))
         |      * (CAST(q.qv[c.m * $sd + i] AS DOUBLE)
         |         - CAST(c.cvec[i] AS DOUBLE))
         |      for i in range(1, ${sd + 1})]) AS d2
         |  FROM cb c CROSS JOIN q),
         |adc AS (
         |  SELECT cd.vec_id, list_sum(list(l.d2 ORDER BY cd.m)) AS adc
         |  FROM codes cd JOIN lut l ON l.m = cd.m AND l.k = cd.code
         |  GROUP BY cd.vec_id)
         |SELECT vec_id, adc FROM adc
         |ORDER BY adc ASC, vec_id LIMIT 10""".stripMargin
    },
    "qv14_semdedup" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS centroid_id, embedding AS centroid
         |  FROM embeddings
         |  ORDER BY ${hash32OfInt("vec_id")}, vec_id LIMIT 64),
         |scored AS (
         |  SELECT e.vec_id, c.centroid_id,
         |    ${cosineSeqSql("e.embedding", "c.centroid")} AS sim
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, centroid_id AS cluster FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY sim DESC, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |dominated AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM assigned a JOIN assigned b
         |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id
         |  WHERE ${cosineSeqSql("ea.embedding", "eb.embedding")} >= 0.2)
         |SELECT a.vec_id, a.cluster, d.vec_id IS NOT NULL AS pruned
         |FROM assigned a LEFT JOIN dominated d ON d.vec_id = a.vec_id""".stripMargin,
    "qv20_semdedup_capped" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS centroid_id, embedding AS centroid
         |  FROM embeddings
         |  ORDER BY ${hash32OfInt("vec_id")}, vec_id LIMIT 64),
         |scored AS (
         |  SELECT e.vec_id, c.centroid_id,
         |    ${cosineSeqSql("e.embedding", "c.centroid")} AS sim
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, centroid_id AS cluster FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY sim DESC, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |small AS (
         |  SELECT cluster FROM assigned
         |  GROUP BY cluster HAVING count(*) <= 10),
         |dominated AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM assigned a JOIN assigned b
         |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  JOIN small s ON s.cluster = a.cluster
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id
         |  WHERE ${cosineSeqSql("ea.embedding", "eb.embedding")} >= 0.2)
         |SELECT a.vec_id, a.cluster, d.vec_id IS NOT NULL AS pruned
         |FROM assigned a LEFT JOIN dominated d ON d.vec_id = a.vec_id""".stripMargin,
    "qv9_lsh_near_dup" ->
      s"""WITH ${lshBucketCtes(6)}
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${cosineSeqSql("a.embedding", "b.embedding")} AS sim
         |FROM bucketed a JOIN bucketed b
         |  ON a.bucket = b.bucket AND b.vec_id > a.vec_id
         |WHERE ${cosineSeqSql("a.embedding", "b.embedding")} >= 0.2""".stripMargin,
    "qv10_knn_join" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.query_id, e.vec_id,
         |    ${cosineSql("e.embedding", "q.qv")} AS sim
         |  FROM embeddings e CROSS JOIN q),
         |ranked AS (
         |  SELECT query_id, vec_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, vec_id) AS rn
         |  FROM scored)
         |SELECT query_id, vec_id, sim FROM ranked WHERE rn <= 5""".stripMargin,
    "qv1_knn" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, ${cosineSql("embedding", "qv")} AS sim
         |FROM embeddings CROSS JOIN q
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "qv7_knn_codegen" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, ${cosineSeqSql("embedding", "qv")} AS sim
         |FROM embeddings CROSS JOIN q
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "qv2_consecutive_cosine" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${cosineSql("a.embedding", "b.embedding")} AS sim
         |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1""".stripMargin,
    "qv3_lsh_buckets" -> {
      val planes = (0 until 8).map(p => s"${planeCompSql(p)} AS h$p")
        .mkString(",\n  ")
      val bits = (0 until 8).map(planeBitSql).mkString("\n   + ")
      s"""WITH planes AS (SELECT vec_id, embedding, $planes FROM embeddings),
         |bucketed AS (SELECT vec_id, ($bits) AS bucket FROM planes)
         |SELECT bucket, count(*) AS n_vectors FROM bucketed GROUP BY bucket""".stripMargin
    },
    "qv4_ivf_assign" ->
      s"""WITH cents AS ($centroidsSql),
         |scored AS (
         |  SELECT e.vec_id, c.centroid_id,
         |    ${cosineSql("e.embedding", "c.centroid")} AS sim
         |  FROM embeddings e CROSS JOIN cents c),
         |ranked AS (
         |  SELECT vec_id, centroid_id,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY sim DESC, centroid_id) AS rn
         |  FROM scored)
         |SELECT centroid_id AS bucket, count(*) AS n_vectors
         |FROM ranked WHERE rn = 1 GROUP BY centroid_id""".stripMargin,
    "qv5_embed_dedup" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${cosineSql("a.embedding", "b.embedding")} AS sim
         |FROM embeddings a JOIN embeddings b
         |  ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 5
         |  AND a.label = b.label
         |WHERE ${cosineSql("a.embedding", "b.embedding")} > 0.2""".stripMargin,
    "qv8_ivf_recall" ->
      s"""WITH cents AS ($centroidsSql),
         |scored AS (
         |  SELECT e.vec_id, c.centroid_id,
         |    ${cosineSql("e.embedding", "c.centroid")} AS sim
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, centroid_id AS bucket FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY sim DESC, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |probes AS (
         |  SELECT centroid_id AS bucket
         |  FROM cents CROSS JOIN q
         |  ORDER BY ${cosineSql("centroid", "qv")} DESC, centroid_id
         |  LIMIT 4),
         |approx AS (
         |  SELECT e.vec_id
         |  FROM embeddings e
         |  JOIN assigned a ON a.vec_id = e.vec_id
         |  JOIN probes p ON p.bucket = a.bucket
         |  CROSS JOIN q
         |  ORDER BY ${cosineSql("e.embedding", "qv")} DESC, e.vec_id
         |  LIMIT 10),
         |truth AS (
         |  SELECT vec_id FROM embeddings CROSS JOIN q
         |  ORDER BY ${cosineSql("embedding", "qv")} DESC, vec_id
         |  LIMIT 10)
         |SELECT count(*) AS k, count(a.vec_id) AS n_hit,
         |  CAST(count(a.vec_id) AS DOUBLE) / count(*) AS recall
         |FROM truth t LEFT JOIN approx a ON a.vec_id = t.vec_id""".stripMargin,
    "qv18_indexed_knn" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS centroid_id, embedding AS centroid
         |  FROM embeddings WHERE vec_id % 5 <> 0
         |  ORDER BY ${hash32OfInt("vec_id")}, vec_id LIMIT 16),
         |scored AS (
         |  SELECT e.vec_id, c.centroid_id,
         |    ${cosineSql("e.embedding", "c.centroid")} AS sim
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, centroid_id AS bucket FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY sim DESC, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |probes AS (
         |  SELECT centroid_id AS bucket
         |  FROM cents CROSS JOIN q
         |  ORDER BY ${cosineSql("centroid", "qv")} DESC, centroid_id
         |  LIMIT 4)
         |SELECT e.vec_id, ${cosineSql("e.embedding", "qv")} AS sim
         |FROM embeddings e
         |JOIN assigned a ON a.vec_id = e.vec_id
         |JOIN probes p ON p.bucket = a.bucket
         |CROSS JOIN q
         |ORDER BY sim DESC, e.vec_id LIMIT 10""".stripMargin,
    "qv6_ivf_query" ->
      s"""WITH cents AS ($centroidsSql),
         |scored AS (
         |  SELECT e.vec_id, c.centroid_id,
         |    ${cosineSql("e.embedding", "c.centroid")} AS sim
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, centroid_id AS bucket FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY sim DESC, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |probes AS (
         |  SELECT centroid_id AS bucket
         |  FROM cents CROSS JOIN q
         |  ORDER BY ${cosineSql("centroid", "qv")} DESC, centroid_id
         |  LIMIT 4)
         |SELECT e.vec_id, ${cosineSql("e.embedding", "qv")} AS sim
         |FROM embeddings e
         |JOIN assigned a ON a.vec_id = e.vec_id
         |JOIN probes p ON p.bucket = a.bucket
         |CROSS JOIN q
         |ORDER BY sim DESC, e.vec_id LIMIT 10""".stripMargin)
}
