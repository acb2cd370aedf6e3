package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash32
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbour search over an embedding column
  * (similarity-search extension).
  *
  * Baseline: brute-force cosine top-k — one codegen'd projection + top-k
  * (`orderBy.limit` → Spark plans TakeOrderedAndProject: per-partition
  * heaps, no global sort materialisation).
  *
  * Scale path: IVF-style bucketing. Assign every vector to its nearest of
  * C centroids once (cost N·C), store bucketed; at query time probe only
  * the P nearest buckets (cost ~N·P/C + C). Centroids come either from
  * [[SimilaritySearch.kmeansCentroids]] (trained, the production choice)
  * or [[SimilaritySearch.hashSampledCentroids]] (deterministic, for
  * oracle-reproducible tests — k-means isn't SQL-expressible). Quality is
  * measured, not assumed: [[SimilaritySearch.recallAtK]] scores any
  * approximate result set against the brute-force ground truth (the
  * qv8 catalog query + `IvfRecallSpec`). An LSH variant (random signed
  * projections → bucket join) shares the same shape via
  * [[SimilaritySearch.lshBuckets]].
  */
object SimilaritySearch {

  /** Brute-force cosine top-k against one query vector (given as a column
    * expression, e.g. a literal array or a scalar-subquery result). */
  def bruteForceTopK(embeddings: DataFrame, queryVec: Column, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings
      .select(col(idCol), cosineExact(col(vecCol), queryVec).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** All-pairs top-k via self-join (small N / verification use). */
  def bruteForceAllPairs(embeddings: DataFrame, simThreshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val l = embeddings.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val r = embeddings.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    l.join(r, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineExact(col("va"), col("vb")).as("sim"),
        // pushdown fence (see qv5): keeps the threshold predicate ABOVE
        // this projection so the cosine evaluates once per pair
        monotonically_increasing_id().as("_fence"))
      .filter(col("sim") >= simThreshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** IVF assignment: nearest centroid id per vector. `centroids` must be
    * broadcast-sized (C ≤ a few thousand). */
  def ivfAssign(embeddings: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cidCol: String = "centroid_id", cvecCol: String = "centroid"): DataFrame = {
    val joined = embeddings.crossJoin(broadcast(centroids))
      .withColumn("dist", -cosine(col(vecCol), col(cvecCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("dist"), col(cidCol))
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col(vecCol), col(cidCol).as("bucket"))
  }

  /** Oracle-exact IVF assignment: argmax of decimal-stabilised cosine,
    * ties broken by smallest centroid id. Unlike a window row_number (which
    * shuffles all N·C scored rows), the argmax is a `max(struct(sim,
    * -centroid_id))` group-by: partial aggregation collapses each vector's
    * C candidates map-side, so the shuffle carries N small rows with no
    * embedding payload. Every similarity is bit-reproducible in DuckDB. */
  def ivfAssignExact(embeddings: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms hoisted below the cross join: computed once per vector and per
    // centroid (projections under the join are not collapsed across it),
    // not once per (vector, centroid) pair
    val e = embeddings.select(col(idCol), col(vecCol),
      sqrt(norm2Exact(col(vecCol))).as("_nv"))
    val c = centroids.select(col("centroid_id"), col("centroid"),
      sqrt(norm2Exact(col("centroid"))).as("_nc"))
    e.crossJoin(broadcast(c))
      .select(col(idCol), col("centroid_id"),
        cosineExactPre(col(vecCol), col("centroid"), col("_nv"), col("_nc"))
          .as("sim"))
      .groupBy(col(idCol))
      .agg(max(struct(col("sim"), (-col("centroid_id")).as("neg_cid")))
        .as("best"))
      .select(col(idCol), (-col("best.neg_cid")).as("bucket"))
  }

  /** [[ivfAssignExact]] keeping the WINNING cosine as `_asim` — the
    * assignment-quality statistic [[graft.sources.VectorIndex]]'s
    * centroid-drift probe aggregates. Same cross-join/argmax plan (the
    * max-struct already carries the sim; [[ivfAssignExact]] merely
    * projects it away); the extra column costs one float per row. */
  def ivfAssignExactSim(embeddings: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = embeddings.select(col(idCol), col(vecCol),
      sqrt(norm2Exact(col(vecCol))).as("_nv"))
    val c = centroids.select(col("centroid_id"), col("centroid"),
      sqrt(norm2Exact(col("centroid"))).as("_nc"))
    e.crossJoin(broadcast(c))
      .select(col(idCol), col("centroid_id"),
        cosineExactPre(col(vecCol), col("centroid"), col("_nv"), col("_nc"))
          .as("sim"))
      .groupBy(col(idCol))
      .agg(max(struct(col("sim"), (-col("centroid_id")).as("neg_cid")))
        .as("best"))
      .select(col(idCol), (-col("best.neg_cid")).as("bucket"),
        col("best.sim").as("_asim"))
  }

  /** Trained IVF centroids: `ml.KMeans` over the embedding column
    * (Lloyd's with k-means|| init — a few distributed passes over the
    * data, each a treeAggregate; the model is C vectors on the driver,
    * broadcast back out). Same `(centroid_id, centroid)` shape as
    * [[hashSampledCentroids]], so it drops into [[ivfAssign]] /
    * [[ivfAssignExact]] / [[ivfQuery]] unchanged. */
  def kmeansCentroids(embeddings: DataFrame, c: Int, seed: Long = 42L,
      maxIter: Int = 20, vecCol: String = "embedding"): DataFrame = {
    val feats = embeddings.select(
      org.apache.spark.ml.functions.array_to_vector(col(vecCol))
        .as("features"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(c).setSeed(seed).setMaxIter(maxIter).fit(feats)
    val spark = embeddings.sparkSession
    import spark.implicits._
    // float centroids: same element type as the embedding column, so the
    // codegen'd FloatDot fast path accepts them (exact-decimal consumers
    // widen to double/decimal regardless)
    model.clusterCenters.toSeq.zipWithIndex
      .map { case (v, i) => (i, v.toArray.map(_.toFloat)) }
      .toDF("centroid_id", "centroid")
  }

  /** Recall@k of an approximate result set against ground truth: the
    * fraction of `truth`'s ids that `approx` found. Both inputs are
    * top-k frames (≤ k rows) — this is a driver-scale join, the
    * measurement harness for any ANN variant. */
  def recallAtK(truth: DataFrame, approx: DataFrame,
      idCol: String = "vec_id"): DataFrame =
    truth.select(col(idCol))
      .join(approx.select(col(idCol), lit(1).as("_hit")), Seq(idCol), "left")
      .agg(count(lit(1)).as("k"), count(col("_hit")).as("n_hit"))
      .select(col("k"), col("n_hit"),
        (col("n_hit").cast("double") / col("k")).as("recall"))

  /** Deterministic pseudo-centroids: the C vectors with smallest
    * hash32(id) — stands in for k-means output, keeps tests seedless. */
  def hashSampledCentroids(embeddings: DataFrame, c: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings
      .select(col(idCol), col(vecCol))
      .orderBy(hash32(col(idCol).cast("string")), col(idCol))
      .limit(c)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid"))

  /** Query against an IVF-bucketed table probing `probes` buckets. Probe
    * selection also uses the exact cosine — C rows, negligible cost, and
    * the probe choice becomes oracle-reproducible. */
  def ivfQuery(bucketed: DataFrame, centroids: DataFrame, queryVec: Column,
      k: Int, probes: Int): DataFrame = {
    val probeBuckets = centroids
      .withColumn("qsim", cosineExact(col("centroid"), queryVec))
      .orderBy(col("qsim").desc, col("centroid_id"))
      .limit(probes)
      .select(col("centroid_id").as("bucket"))
    bucketed.join(broadcast(probeBuckets), Seq("bucket"))
      .select(col("vec_id"), cosineExact(col("embedding"), queryVec).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** The probe-escalation rule SCALE.md §filtered-ANN measures, as a
    * pure function: a metadata predicate of selectivity `s` thins every
    * probed bucket to `s` of its vectors, so holding recall needs the
    * probe budget to grow as the eligible set shrinks — probes scale
    * INVERSELY with selectivity (`round(base / s)`, floored at `base`,
    * capped at C). Below ~1% selectivity the rule skips the index
    * outright (probes = C): the "full" scan touches only the filtered
    * 1% of the corpus — cheapest exactly when escalation is needed —
    * and recall is 1.0 by construction. */
  def autoProbes(c: Int, baseProbes: Int, selectivity: Double): Int =
    if (selectivity <= 0.01) c
    else math.min(c, math.max(baseProbes,
      math.round(baseProbes / selectivity).toInt))

  /** SELECTIVITY-ADAPTIVE filtered kNN (r6 VERDICT ask #8): estimate
    * the predicate's selectivity, choose the probe budget with
    * [[autoProbes]], run the filtered [[ivfQuery]]. The estimate here
    * is the exact filtered fraction via two COUNT jobs — each a
    * narrow scan of just the predicate columns, far cheaper than the
    * per-row cosine pass the budget tunes; at lake scale the same
    * number comes for free from [[graft.sources.StatsIndex]] row
    * counts or a sketch, and `autoProbes` is the shared rule either
    * way. Every stage is deterministic (exact-cosine probe ranking,
    * fixed tiebreaks), so the adaptive composition stays
    * oracle-checkable bit for bit (`qv17_filtered_knn_auto`). */
  def filteredKnnAuto(bucketed: DataFrame, centroids: DataFrame,
      pred: Column, queryVec: Column, k: Int,
      baseProbes: Int = 4): DataFrame = {
    val c = centroids.count().toInt
    val total = bucketed.count()
    val eligible = bucketed.filter(pred)
    val sel =
      if (total == 0L) 0.0 else eligible.count().toDouble / total
    ivfQuery(eligible, centroids, queryVec, k,
      autoProbes(c, baseProbes, sel))
  }

  /** LSH signed-random-projection bucket id: sign bits of dot products
    * with `nPlanes` pseudo-random hyperplanes derived from the portable
    * hash (deterministic, seedless, oracle-reproducible). */
  def lshBuckets(embeddings: DataFrame, nPlanes: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // plane p component j = hash32("p:j") scaled to [-1,1)
    def planeComp(p: Int, j: Column): Column =
      (hash32(concat_ws(":", lit(p), j)).cast("double") /
        lit(2147483648.0)) - lit(1.0)
    val dim = size(col(vecCol))
    val bucketBits = (0 until nPlanes).map { p =>
      val dot = aggregate(
        zip_with(col(vecCol),
          transform(sequence(lit(0), dim - 1), j => planeComp(p, j)),
          (x, h) => x.cast("double") * h),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    embeddings.select(col(idCol), col(vecCol),
      bucketBits.reduce(_ + _).as("bucket"))
  }

  /** Embedding near-duplicate pairs THE SCALE WAY: SRP-LSH bucket join +
    * exact-cosine verify. Each vector hashes to one `nPlanes`-bit bucket
    * ([[lshBucketsExact]]); candidates are same-bucket pairs (one
    * shuffle by bucket — the quadratic term is confined to buckets, as
    * in text LSH), verified with the decimal-exact cosine against
    * `simThreshold`. Contrast with the all-pairs or id-band forms
    * (`bruteForceAllPairs`, qv5): this is the shape that survives a
    * corpus where N² is unthinkable. Norms are hoisted below the join
    * (computed once per vector, not once per pair side); the fence
    * keeps the threshold predicate above the projection so the cosine
    * evaluates once per pair. Recall is governed by nPlanes: same-bucket
    * collision probability for angle θ is (1 − θ/π)^nPlanes — fewer
    * planes = wider buckets = higher recall and more verify work. */
  def lshNearDupPairs(embeddings: DataFrame, nPlanes: Int,
      simThreshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding", dim: Option[Int] = None): DataFrame = {
    val buckets = lshBucketsFloat(embeddings, nPlanes, idCol, vecCol, dim)
    // the verify also runs the PRODUCTION scoring path (codegen'd
    // FloatDot cosine, norms hoisted) — bit-reproducible in the oracle
    // via DuckDB's sequential double fold, per the qv7 pattern
    val e = embeddings.join(buckets, Seq(idCol))
      .select(col(idCol), col(vecCol), col("bucket"),
        sqrt(graft.functions.VectorFunctions.dot(col(vecCol), col(vecCol)))
          .as("_n"))
    val l = e.select(col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("va"), col("_n").as("na"))
    val r = e.select(col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), col("_n").as("nb"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorFunctions
          .cosinePre(col("va"), col("vb"), col("na"), col("nb")).as("sim"),
        monotonically_increasing_id().as("_fence"))
      .filter(col("sim") >= simThreshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** SemDeDup — semantic near-dup pruning confined to embedding
    * clusters (the SemDeDup shape: cluster, then pairwise-compare ONLY
    * within a cluster): every vector is assigned to its argmax-cosine
    * centroid, same-cluster pairs above `tau` mark the LARGER id as
    * pruned, so the min-id member of each semantic-dup group survives.
    * The cluster partition is what makes the quadratic term tractable —
    * candidate pairs are per-cluster (one shuffle keyed by cluster),
    * identical in shape to the in-bucket LSH joins.
    *
    * SIZING RULE (the primary 100 TB defense): per-cluster pair cost
    * is (N/C)², so C must grow WITH the corpus — C ∝ N keeps expected
    * cluster size (and thus per-task work) constant; the paper sizes
    * its k-means the same way. `maxCluster` is the BACKSTOP for when
    * the rule is violated anyway (undersized C, or a degenerate
    * embedding distribution collapsing the corpus onto one centroid —
    * the boilerplate-text failure mode): clusters above the cap are
    * excluded from the pairwise phase BEFORE the join, by a count-only
    * pre-pass (bounded aggregation buffers, the same pre-count
    * discipline as [[graft.operators.Dedup.lshCandidatePairs]]'s
    * `maxBucket`), so the blowup degrades to unpruned survivors in
    * those clusters instead of a quadratic stall. Members of a capped
    * cluster keep their cluster id and report `pruned = false`.
    *
    * Runs the PRODUCTION scoring path end to end: codegen'd FloatDot
    * cosines for both the assignment argmax and the pair verify
    * (bit-reproducible in the oracle via DuckDB's sequential double
    * fold), norms hoisted below the joins, argmax as a partial-agg
    * max-struct (the shuffle carries no embedding payload). */
  def semDedup(embeddings: DataFrame, centroids: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCluster: Int = 10000): DataFrame = {
    import graft.functions.VectorFunctions.{cosinePre, dot}
    val e0 = embeddings.select(col(idCol), col(vecCol),
      sqrt(dot(col(vecCol), col(vecCol))).as("_n"))
    val c = centroids.select(col("centroid_id"), col("centroid"),
      sqrt(dot(col("centroid"), col("centroid"))).as("_nc"))
    val assigned = e0.crossJoin(broadcast(c))
      .select(col(idCol),
        cosinePre(col(vecCol), col("centroid"), col("_n"), col("_nc"))
          .as("sim"),
        col("centroid_id"))
      .groupBy(col(idCol))
      .agg(max(struct(col("sim"), (-col("centroid_id")).as("neg_cid")))
        .as("best"))
      .select(col(idCol), (-col("best.neg_cid")).as("cluster"))
    val e = e0.join(assigned, Seq(idCol)).localCheckpoint()
    // oversized-cluster backstop: count-only pre-pass (never
    // materializes a cluster's members in one buffer), then anti-join
    // the oversized cluster ids out BEFORE the quadratic join — the
    // shuffle carries (cluster, count) pairs, not embeddings
    val oversized = e.groupBy(col("cluster")).count()
      .filter(col("count") > maxCluster).select(col("cluster"))
    val paired = e.join(oversized, Seq("cluster"), "left_anti")
    val l = paired.select(col("cluster"), col(idCol).as("id_a"),
      col(vecCol).as("va"), col("_n").as("na"))
    val r = paired.select(col("cluster"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), col("_n").as("nb"))
    val dominated = l.join(r, Seq("cluster"))
      .filter(col("id_a") < col("id_b") &&
        cosinePre(col("va"), col("vb"), col("na"), col("nb")) >= tau)
      .select(col("id_b").as(idCol)).distinct()
    e.select(col(idCol), col("cluster"))
      .join(dominated.withColumn("_d", lit(1)), Seq(idCol), "left")
      .select(col(idCol), col("cluster"), col("_d").isNotNull.as("pruned"))
  }

  /** Batch kNN JOIN: the top-k corpus neighbours for EACH of a set of
    * query vectors (the retrieval-evaluation / hard-negative-mining
    * workload; qv1's single-vector top-k is the degenerate case).
    *
    * Two-phase top-k, because the naive form — one window over all N·Q
    * scored rows — shuffles the entire scored table by query:
    * phase 1 reduces each of `nShards` deterministic corpus shards to
    * its local top-k per query (partial-aggregable groupBy; shard size
    * bounds the collect), phase 2 windows over only Q·shards·k
    * survivors. The scored table itself never crosses the wire.
    * Queries broadcast (Q is small by assumption); ties break to the
    * smallest id in both phases, keeping the result total-ordered and
    * oracle-reproducible. */
  def knnJoin(embeddings: DataFrame, queries: DataFrame, k: Int,
      nShards: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding", qidCol: String = "query_id",
      qvecCol: String = "qvec"): DataFrame = {
    val e = embeddings.select(col(idCol), col(vecCol),
      sqrt(norm2Exact(col(vecCol))).as("_ne"))
    val q = queries.select(col(qidCol), col(qvecCol),
      sqrt(norm2Exact(col(qvecCol))).as("_nq"))
    val scored = e.crossJoin(broadcast(q))
      .select(col(qidCol), col(idCol),
        cosineExactPre(col(vecCol), col(qvecCol), col("_ne"), col("_nq"))
          .as("sim"))
    // (sim desc, id asc) as one sortable struct: negate the id
    val local = scored
      .withColumn("shard", pmod(col(idCol), lit(nShards)))
      .groupBy(col(qidCol), col("shard"))
      .agg(slice(
        sort_array(collect_list(struct(col("sim"),
          (-col(idCol)).as("nid"))), asc = false), 1, k).as("top"))
    val survivors = local
      .select(col(qidCol), explode(col("top")).as("t"))
      .select(col(qidCol), (-col("t.nid")).as(idCol), col("t.sim").as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol))
    survivors.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col(qidCol), col(idCol), col("sim"))
  }

  /** Driver-side twin of [[graft.functions.TextFunctions.hash32]]: first 8
    * hex digits of md5 as a non-negative long — used to precompute plane
    * components that depend only on constants. */
  private def hash32Local(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** PRODUCTION LSH buckets: the same md5-derived planes as
    * [[lshBucketsExact]], rounded to float literals and scored with the
    * codegen'd [[graft.functions.FloatDot]] — the whole projection stays
    * inside whole-stage codegen (no decimal hops, no interpreted HOF
    * lambdas), and the sign decision is STILL bit-reproducible in
    * DuckDB: double→float plane rounding and the sequential double fold
    * are both IEEE operations the twin mirrors (`CAST(… AS REAL)` +
    * `list_sum` over doubles). This is the variant a 10⁹-embedding
    * bucketing pass should run; [[lshBucketsExact]] remains the
    * decimal-fold cross-check. */
  def lshBucketsFloat(embeddings: DataFrame, nPlanes: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Option[Int] = None): DataFrame = {
    val d = dim.orElse(
      embeddings.select(size(col(vecCol)).as("d")).take(1)
        .headOption.map(_.getInt(0)))
      .getOrElse(0)
    val bucketBits = (0 until nPlanes).map { p =>
      val plane: Array[Float] = (0 until d).map(j =>
        ((hash32Local(s"$p:$j").toDouble / 2147483648.0) - 1.0).toFloat)
        .toArray
      val dotv = graft.functions.VectorFunctions.dot(
        col(vecCol), typedLit(plane))
      when(dotv >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    embeddings.select(col(idCol), bucketBits.reduce(_ + _).as("bucket"))
  }

  /** Oracle-exact LSH buckets: the plane dot products fold in decimal so
    * the sign decision is bit-reproducible in DuckDB.
    *
    * The plane component values depend only on (plane, index) — never on
    * the row — so they are computed ONCE on the driver and inlined as
    * literal arrays (the per-row form re-ran nPlanes·dim md5 calls on
    * every vector). The embedding dimension is probed from one row; pass
    * `dim` to skip the probe. */
  def lshBucketsExact(embeddings: DataFrame, nPlanes: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // exact-fold sizing — see VectorFunctions.DElem/DAcc
    val DElem = DecimalType(25, 12)
    val DAcc = DecimalType(37, 12)
    val d = dim.orElse(
      embeddings.select(size(col(vecCol)).as("d")).take(1)
        .headOption.map(_.getInt(0)))
      .getOrElse(0)
    val bucketBits = (0 until nPlanes).map { p =>
      val plane = (0 until d).map(j =>
        (hash32Local(s"$p:$j").toDouble / 2147483648.0) - 1.0)
      val dot = aggregate(
        zip_with(col(vecCol), typedLit(plane),
          (x, h) => (x.cast("double") * h).cast(DElem)),
        lit(java.math.BigDecimal.ZERO).cast(DAcc),
        (acc, x) => (acc + x).cast(DAcc)).cast("double")
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    embeddings.select(col(idCol),
      bucketBits.reduce(_ + _).as("bucket"))
  }

  // ---------- product quantization (IVF-PQ's compression half) ----------

  /** PQ defaults: 8 subspaces × 16 codes — a dim-64 float vector (256 B)
    * compresses to 8 nibbles (4 B), the 64× shrink that lets a 100 TB
    * embedding corpus live in executor memory for ADC scanning. K=16 is
    * deliberately small so the DuckDB twin stays tractable; production
    * would use K=256 with the identical plan shape. */
  val PqM = 8
  val PqK = 16

  /** Deterministic codebook source: the K corpus vectors in
    * hash32(id) order (same convention as [[hashSampledCentroids]] —
    * k-means-trained codebooks drop in unchanged, but aren't
    * SQL-expressible for the oracle). Codebook entry (m, k) is the m-th
    * subvector of sample k. Tiny (K rows) — collected once, inlined as
    * literals, never joined. */
  def pqSampleVectors(embeddings: DataFrame, k: Int = PqK,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : Seq[Array[Float]] =
    embeddings.select(col(idCol), col(vecCol))
      .orderBy(hash32(col(idCol).cast("string")), col(idCol))
      .limit(k)
      .collect().map(_.getSeq[Float](1).toArray).toSeq

  /** Per-subspace k-means codebooks — REAL PQ training (an independent
    * K-means per subspace over that subspace's slices) — stitched back
    * into the [[pqEncode]] sample shape: stitched sample k = the
    * concatenation of every subspace's k-th centroid, lossless because
    * the encoder re-slices by subspace. Not SQL-expressible (k-means),
    * so its quality is MEASURED (`PqRecallSpec`, SCALE.md) while the
    * hash-sampled codebook carries the oracle check. */
  def pqTrainedSample(embeddings: DataFrame, m: Int = PqM, k: Int = PqK,
      seed: Long = 42L, vecCol: String = "embedding"): Seq[Array[Float]] = {
    val dim = embeddings.select(size(col(vecCol))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
    val d = dim / m
    val perSub = (0 until m).map { mi =>
      kmeansCentroids(
        embeddings.select(slice(col(vecCol), mi * d + 1, d).as(vecCol)),
        k, seed = seed + mi, vecCol = vecCol)
        .orderBy(col("centroid_id"))
        .collect().map(_.getSeq[Float](1).toArray)
    }
    (0 until k).map(ki => (0 until m).flatMap(mi => perSub(mi)(ki)).toArray)
  }

  /** Sequential-fold squared L2 distance between a subvector column and
    * a literal codebook subvector: Σ (a_i − c_i)² over doubles in array
    * order — DuckDB's `list_sum` folds identically, so the argmin (and
    * therefore every code) is oracle-reproducible bit for bit. */
  private[graft] def pqD2(sub: Column, c: Array[Float]): Column =
    aggregate(
      zip_with(sub, typedLit(c.map(_.toDouble).toSeq), (x, h) =>
        (x.cast("double") - h) * (x.cast("double") - h)),
      lit(0.0), (acc, x) => acc + x)

  /** PQ encode: per subspace m, the index of the nearest codebook entry
    * (squared-L2 argmin, ties to the smallest index via the FIRST-match
    * `array_position`). Map-only — M·K·(D/M) = K·D multiplies per row,
    * no shuffle, embarrassingly parallel at any corpus size. Output:
    * `idCol, pq0..pq{M-1}` (int codes). */
  def pqEncode(embeddings: DataFrame, sample: Seq[Array[Float]],
      m: Int = PqM, idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
    val d = dim / m
    val codeCols = (0 until m).map { mi =>
      val sub = slice(col(vecCol), mi * d + 1, d)
      val dists = array(sample.map(s =>
        pqD2(sub, s.slice(mi * d, mi * d + d))): _*)
      (array_position(dists, array_min(dists)) - 1)
        .cast("int").as(s"pq$mi")
    }
    embeddings.select(col(idCol) +: codeCols: _*)
  }

  /** Asymmetric-distance (ADC) top-k: the query stays un-quantized; each
    * database vector's distance is approximated as Σ_m LUT[m][code_m]
    * where LUT[m][k] = d²(query subvector m, codebook entry (m,k)).
    * The LUT (M·K doubles) is computed ONCE — by the same Spark
    * expression the encoder uses, over a one-row frame, so its
    * arithmetic bit-matches the oracle — and inlined as literal arrays:
    * the scan is then pure per-row lookups + an M-term sequential sum,
    * no join, followed by a TakeOrdered top-k. This is the IVF-PQ probe
    * inner loop. */
  def pqAdcTopK(encoded: DataFrame, sample: Seq[Array[Float]],
      queryVec: Array[Float], k: Int, m: Int = PqM,
      idCol: String = "vec_id"): DataFrame = {
    val spark = encoded.sparkSession
    val dim = sample.head.length
    val d = dim / m
    val one = spark.range(1).select(
      typedLit(queryVec.toSeq).as("q"))
    val lutCols = for (mi <- 0 until m; ki <- sample.indices)
      yield pqD2(slice(col("q"), mi * d + 1, d),
        sample(ki).slice(mi * d, mi * d + d)).as(s"l_${mi}_$ki")
    val lutRow = one.select(lutCols: _*).head()
    val lut: Seq[Seq[Double]] = (0 until m).map(mi =>
      sample.indices.map(ki => lutRow.getDouble(mi * sample.size + ki)))
    val adc = (0 until m).map(mi =>
      element_at(typedLit(lut(mi)), col(s"pq$mi") + 1))
      .reduce(_ + _) // left-assoc chain == list_sum's sequential fold
    encoded.select(col(idCol), adc.as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k)
  }

  /** PRODUCTION encode path: all codes packed into one long by the
    * codegen'd [[graft.functions.PqEncode32]] — one fused primitive
    * loop per row instead of m·k interpreted HOF folds, and the packed
    * long IS the 100 TB index's storage layout (4 bits/code). Codes are
    * bit-identical to [[pqEncode]]'s columns (spec-pinned); unpack with
    * [[pqUnpack]]. */
  def pqEncodePacked(embeddings: DataFrame, sample: Seq[Array[Float]],
      m: Int = PqM, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
    val d = dim / m
    val k = sample.size
    val flat = new Array[Float](m * k * d)
    for (mi <- 0 until m; ki <- 0 until k; di <- 0 until d)
      flat((mi * k + ki) * d + di) = sample(ki)(mi * d + di)
    embeddings.select(col(idCol),
      org.apache.spark.sql.GraftColumnBridge.toColumn(
        graft.functions.PqEncode32(
          org.apache.spark.sql.GraftColumnBridge.toExpression(col(vecCol)),
          flat, m, k, d)).as("pq_packed"))
  }

  /** Unpack a [[pqEncodePacked]] long back into per-subspace code
    * columns `pq0..pq{m-1}`. */
  def pqUnpack(packed: Column, m: Int = PqM): Seq[Column] =
    (0 until m).map(mi =>
      shiftrightunsigned(packed, 4 * mi).bitwiseAND(lit(15L))
        .cast("int").as(s"pq$mi"))

  /** ADC top-k directly over the PACKED code column — the real scan:
    * two bit ops per subspace unpack the code inline, then the same
    * literal-LUT lookups. Delegates to [[pqAdcTopK]] after unpacking. */
  def pqAdcTopKPacked(packed: DataFrame, sample: Seq[Array[Float]],
      queryVec: Array[Float], k: Int, m: Int = PqM,
      idCol: String = "vec_id"): DataFrame =
    pqAdcTopK(
      packed.select(col(idCol) +: pqUnpack(col("pq_packed"), m): _*),
      sample, queryVec, k, m, idCol)

  /** ADC shortlist + exact re-rank — how PQ is actually deployed: the
    * compressed scan shortlists `shortlist` candidates (cheap, whole
    * corpus), then ONLY those rows' full vectors are fetched and
    * re-scored with the exact squared-L2 fold. Quantization error cost
    * becomes a recall-vs-shortlist-size knob instead of a hard ceiling
    * (measured in `PqRecallSpec`/SCALE.md). The candidate set is ≤
    * shortlist rows, so the re-rank join broadcasts. */
  def pqAdcRescoreTopK(embeddings: DataFrame, sample: Seq[Array[Float]],
      queryVec: Array[Float], k: Int, shortlist: Int,
      m: Int = PqM, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val short = pqAdcTopK(pqEncode(embeddings, sample, m, idCol, vecCol),
      sample, queryVec, shortlist, m, idCol)
    embeddings.join(broadcast(short.select(col(idCol))), Seq(idCol))
      .select(col(idCol), pqD2(col(vecCol), queryVec).as("d2"))
      .orderBy(col("d2").asc, col(idCol).asc)
      .limit(k)
  }

  /** The DEPLOYED ANN stack end to end, one query: IVF probe (search
    * only the P buckets nearest the query — ~N·P/C of the corpus) →
    * packed-PQ ADC shortlist over the probed rows (the codegen'd
    * compressed scan, [[pqEncodePacked]] + LUT lookups) → exact
    * squared-L2 re-rank of the ≤ `shortlist` survivors (broadcast
    * join). This is the IVF-PQ index read path: every stage cuts the
    * candidate set before the next pays per-row cost, so query cost at
    * 100 TB is probe-fraction · compressed-scan + shortlist · D —
    * never a full-corpus full-width pass. Every stage is deterministic
    * (hash-sampled centroids/codebook, fixed tiebreaks), so the whole
    * composition is oracle-checkable bit for bit (`qv15_ivfpq_query`). */
  def ivfPqQuery(bucketed: DataFrame, centroids: DataFrame,
      sample: Seq[Array[Float]], queryVec: Array[Float], k: Int,
      probes: Int, shortlist: Int, m: Int = PqM): DataFrame = {
    val probeBuckets = centroids
      .withColumn("qsim",
        cosineExact(col("centroid"), typedLit(queryVec.toSeq)))
      .orderBy(col("qsim").desc, col("centroid_id"))
      .limit(probes)
      .select(col("centroid_id").as("bucket"))
    // materialise the probed slice ONCE: both consumers below (the
    // ADC-shortlist pass and the re-rank join) would otherwise re-run
    // the upstream bucket assignment — the dominant cost when
    // `bucketed` is derived from ivfAssignExact rather than read from
    // a stored index (in production the index is stored pre-assigned
    // and this is a cheap partition-pruned scan either way)
    val probed = bucketed.join(broadcast(probeBuckets), Seq("bucket"))
      .localCheckpoint()
    val short = pqAdcTopKPacked(
      pqEncodePacked(probed, sample, m), sample, queryVec, shortlist, m)
    probed.join(broadcast(short.select(col("vec_id"))), Seq("vec_id"))
      .select(col("vec_id"), pqD2(col("embedding"), queryVec).as("d2"))
      .orderBy(col("d2").asc, col("vec_id").asc)
      .limit(k)
  }
}
