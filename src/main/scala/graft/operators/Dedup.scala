package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for the training-data pipeline extension:
  * exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design (100 TB):
  *  - exact dedup keys on a 128-bit fingerprint, so the shuffle carries
  *    (16-byte key, id) pairs — never the document bodies;
  *  - MinHash signatures are computed in one codegen'd projection (no
  *    explode: `array_min` over a `transform` of the shingle array), then
  *    LSH banding turns the quadratic all-pairs problem into an equi-join
  *    on (band, band-hash) — the only shuffle is by band key;
  *  - SimHash reduces each doc to one 32-bit value; near-dup candidates
  *    join on the value (or on rotated prefixes for hamming-distance>0).
  *
  * All hashing is the md5-based portable [[graft.functions.TextFunctions.hash32]]
  * so the DuckDB oracle reproduces every bit.
  */
object Dedup {

  /** MinHash parameters — shared verbatim with the SQL twins in
    * [[graft.queries.TextQueryCatalog]]. p is prime > 2^32; a_i < 2^20
    * keeps a_i * h + b_i < 2^63 (no overflow, both engines use int64). */
  val MinhashP: Long = 4294967311L
  val MinhashA: Seq[Long] = Seq(179424673L, 179425457L, 179425819L,
    179426321L, 373587883L, 373587911L, 373587971L, 373588073L)
  val MinhashB: Seq[Long] = Seq(1L, 7919L, 104729L, 1299709L,
    15485863L, 32452843L, 49979687L, 67867967L)
  val ShingleK = 3
  /** Span length for duplicated-span / contamination checks (C4-ish). */
  val SpanK = 8
  /** 8 hashes in 4 bands of 2: candidates share at least one band. */
  val BandSize = 2
  /** Default LSH bucket cap (ON by default — see [[lshCandidatePairs]]).
    * A bucket of 1000 ids still emits ~500k pairs from one task — near
    * the practical per-task ceiling — while any bucket larger than that
    * is boilerplate/template saturation carrying no near-dup signal
    * (every member pairs with every other; the cluster is better found
    * by exact dedup on the shared span). */
  val DefaultMaxBucket = 1000

  /** Exact dedup: keep the smallest id per normalised-text fingerprint.
    * Equivalent to `dropDuplicates` but deterministic about WHICH row
    * survives (dropDuplicates keeps an arbitrary row — fine for the
    * operator, wrong for an oracle). */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.withColumn("fp", fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** The i-th minhash value over a shingle array column. */
  def minhashValue(shingles: Column, i: Int): Column = {
    val hashed = transform(shingles,
      s => (lit(MinhashA(i)) * hash32(s) + lit(MinhashB(i))) % lit(MinhashP))
    array_min(hashed)
  }

  /** Per-doc MinHash signature: id + mh0..mh7. Two stacked projections, no
    * shuffle, no explode: the first hashes every shingle ONCE (md5 is the
    * dominant cost — one hash pass instead of one per signature slot), the
    * second derives the 8 mins with cheap int64 arithmetic. The projections
    * stay separate (CollapseProject won't duplicate a non-trivial
    * expression referenced 8 times), so the hash array materialises once
    * per row inside whole-stage codegen. Docs with < K tokens get null
    * signatures (array_min of empty) — callers filter or treat null as its
    * own bucket. */
  def minhashSignatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val hashed = docs.select(col(idCol),
      transform(wordShingles(col(textCol), ShingleK), hash32(_)).as("_sh"))
    val sig = MinhashA.indices.map { i =>
      array_min(transform(col("_sh"),
        h => (lit(MinhashA(i)) * h + lit(MinhashB(i))) % lit(MinhashP)))
        .as(s"mh$i")
    }
    hashed.select((col(idCol) +: sig): _*)
  }

  /** LSH banding: explode each signature into (band, bandKey) rows and
    * generate candidate near-duplicate pairs (a < b) INSIDE each bucket.
    *
    * Shape chosen for scale: signatures are computed once and fanned out
    * with a single `explode` (a union of per-band projections would re-scan
    * and re-hash every document per band; a self-join would do it twice
    * more), then ONE shuffle groups by (band, bandKey) and each bucket
    * emits its sorted-id pairs from a generated array — no second scan, no
    * join. `distinct` dedups pairs that collide in several bands.
    *
    * Skew defense (ON by default): a saturated bucket of m ids would emit
    * m·(m-1)/2 pairs — and, worse, materialise all m ids in ONE
    * aggregation buffer during `collect_list` — so oversized buckets are
    * dropped BEFORE the collect by a window count over (band, band_key):
    * the banded pipeline (scan + md5 + explode) runs ONCE and shuffles
    * ONCE — the window's hash partitioning is exactly the distribution
    * the collect aggregate requires, so no second exchange is planned
    * (r12's count-prepass + self-join shape recomputed the banded
    * pipeline on both join sides, because the column-pruned count
    * exchange could not be reused for the full-row probe side — the
    * measured 2.6× on qt6). WindowExec's partition buffer SPILLS past a
    * few thousand rows, so a bucket hit by half the corpus costs disk,
    * never executor memory, and its rows are filtered out before any
    * collect_list buffer sees them (boilerplate saturation carries no
    * near-dup signal; dropping it is standard practice). */
  /** Banded `(id, band, band_key)` rows — the LSH bucket table shared by
    * the batch pair generator and the incremental streaming index
    * ([[graft.streaming.IncrementalDedup]]). Docs with < K tokens have
    * null signatures and are excluded BEFORE the signature projection
    * (filtering on mh0.isNotNull gets predicate-pushed below the
    * projection and re-evaluates the whole tokenize+hash pipeline). */
  def bandedSignatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sigs = minhashSignatures(
      docs.filter(size(tokens(col(textCol))) >= ShingleK), idCol, textCol)
    val nBands = MinhashA.size / BandSize
    val bandStructs = (0 until nBands).map { b =>
      val keyCols = (0 until BandSize).map(j => col(s"mh${b * BandSize + j}"))
      struct(lit(b).as("band"), concat_ws(",", keyCols: _*).as("band_key"))
    }
    sigs
      .select(col(idCol).as("id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"),
        col("bk.band_key").as("band_key"))
  }

  def lshCandidatePairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      maxBucket: Option[Int] = Some(DefaultMaxBucket)): DataFrame = {
    val banded = bandedSignatures(docs, idCol, textCol)
    // cap BEFORE collect_list: a spill-safe window count sizes every
    // key in the SAME (one and only) shuffle the collect needs —
    // oversized buckets are filtered out before any aggregation
    // buffer sees their ids
    val capped = maxBucket match {
      case Some(m) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_key"))
        banded.withColumn("_bn", count(lit(1)).over(w))
          .filter(col("_bn") > 1 && col("_bn") <= m)
          .drop("_bn")
      case None => banded
    }
    val buckets = capped
      .groupBy(col("band"), col("band_key"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val ids = col("ids")
    buckets
      .select(explode(flatten(
        transform(sequence(lit(1), size(ids) - 1), i =>
          transform(slice(ids, i + 1, size(ids) - i),
            b2 => struct(element_at(ids, i).as("id_a"), b2.as("id_b"))))))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** 32-bit SimHash over whitespace tokens: per bit, majority vote of
    * the tokens' hash bits (+1/−1). PRODUCTION path: the native
    * codegen'd [[graft.functions.SimHash32]] expression — md5 + votes +
    * bit-pack in one primitive loop inside whole-stage codegen
    * (the declarative fold below is CodegenFallback-interpreted). */
  def simhash(textCol: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.toColumn(
      graft.functions.SimHash32(
        org.apache.spark.sql.GraftColumnBridge.toExpression(
          tokens(textCol))))

  /** The declarative HOF twin of [[simhash]] (pre-SimHash32 production
    * path) — ONE fold over the hashed-token array into a 32-counter
    * vector, retained as the bit-equality cross-check. */
  def simhashHof(textCol: Column): Column = {
    // bit j of h tested as h & 2^j (no column-indexed shifts in the API)
    val powers = typedLit((0 until 32).map(j => 1L << j))
    val votes = aggregate(
      transform(tokens(textCol), hash32(_)),
      array_repeat(lit(0L), 32),
      (acc, h) => zip_with(acc,
        transform(powers, p =>
          when(h.bitwiseAND(p) === p, lit(1L)).otherwise(lit(-1L))),
        (a, v) => a + v))
    element_at(transform(array(votes), vs =>
      aggregate(
        zip_with(vs, powers, (v, p) => when(v > 0, p).otherwise(lit(0L))),
        lit(0L), (acc, b) => acc + b)), 1)
  }

  def simhashDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), simhash(col(textCol)).as("simhash"))

  /** SimHash near-duplicate pairs at hamming distance ≤ `maxDist` —
    * the banded form of the hamming join this file's header promises.
    *
    * Pigeonhole banding: partition the 32 simhash bits into `maxDist+1`
    * contiguous blocks; two hashes within distance `maxDist` have at
    * most `maxDist` differing bits, so at least one block matches
    * EXACTLY. Candidates therefore equi-join on (block, block_value) —
    * the same explode → one shuffle → in-bucket pair generation shape
    * as [[lshCandidatePairs]] — and each candidate pair is then
    * exact-verified with `bit_count(a XOR b)`. Recall is exact (a
    * guarantee of the pigeonhole, unlike MinHash-LSH's probabilistic
    * recall); the verify step provides the precision.
    *
    * Scale: the shuffle carries (8-byte id, 8-byte hash) per block row —
    * `maxDist+1` rows per document, no text. Bucket skew concentrates
    * docs sharing a block value; as in LSH, a bucket hit by a large
    * fraction of the corpus carries no near-dup signal — cap it with
    * `maxBucket` at 100 TB. */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      maxBucket: Option[Int] = None): DataFrame = {
    require(maxDist >= 1 && maxDist <= 15, "maxDist must be in [1, 15]")
    val nBlocks = maxDist + 1
    val w = 32 / nBlocks // last block absorbs the remainder bits
    val sh = docs.select(col(idCol).as("id"),
      simhash(col(textCol)).as("sh"))
    val blockStructs = (0 until nBlocks).map { b =>
      val width = if (b == nBlocks - 1) 32 - b * w else w
      struct(lit(b).as("blk"),
        shiftrightunsigned(col("sh"), b * w)
          .bitwiseAND(lit((1L << width) - 1)).as("blk_val"))
    }
    // in-bucket pairs as a bucket-key SELF-JOIN (codegen'd sort-merge +
    // primitive filters) rather than collect_list + nested array
    // transforms (CodegenFallback — interpreted per candidate); the
    // shuffle volume is identical (the banded table, both sides)
    val banded = sh
      .select(col("id"), col("sh"), explode(array(blockStructs: _*)).as("bk"))
      .select(col("id"), col("sh"),
        col("bk.blk").as("blk"), col("bk.blk_val").as("blk_val"))
    val capped = maxBucket match {
      case Some(m) =>
        val sizes = banded.groupBy(col("blk"), col("blk_val"))
          .agg(count(lit(1)).as("_bn"))
          .filter(col("_bn") <= m)
          .select(col("blk"), col("blk_val"))
        banded.join(sizes, Seq("blk", "blk_val"))
      case None => banded
    }
    val l = capped.select(col("blk"), col("blk_val"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val r = capped.select(col("blk"), col("blk_val"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("blk", "blk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Near-duplicate CLUSTERS: connected components over the LSH
    * candidate-pair graph, labelling every document with the smallest
    * doc id reachable through near-dup pairs (singletons label
    * themselves). This is the step that turns candidate pairs into a
    * dedup decision — keep `cluster_id`, drop the rest.
    *
    * Algorithm: iterative min-label propagation (the standard distributed
    * connected-components loop — e.g. GraphX's `ConnectedComponents` and
    * the Hash-to-Min family): each round every node takes the min of its
    * own label and its neighbours' labels; converges in O(component
    * diameter) rounds. LSH components are near-cliques of duplicates, so
    * the diameter — and the round count — is tiny regardless of corpus
    * size. Each round is one shuffled join + aggregate, fully
    * distributed; `localCheckpoint` cuts the growing lineage so round N
    * doesn't replay rounds 1..N-1. The driver only sees the one-long
    * convergence counter per round. */
  def dupClusters(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxIter: Int = 20,
      starFallback: Boolean = true,
      maxBucket: Option[Int] = Some(DefaultMaxBucket)): DataFrame =
    dupClustersWithRounds(docs, idCol, textCol, maxIter, starFallback,
      maxBucket)._1

  /** Alternating large-star / small-star connected components (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14):
    * large-star hangs every larger neighbour of u off min(Γ(u) ∪ {u});
    * small-star re-hangs the smaller neighbourhood. Alternating the two
    * halves the tree height each round, so it converges in O(log n)
    * rounds REGARDLESS of component diameter — the fallback for
    * chain-shaped near-dup graphs where min-label propagation's
    * O(diameter) rounds exceed maxIter. Per round: two narrow
    * groupBy+join passes over the EDGE set only (≪ corpus);
    * `localCheckpoint` cuts lineage as in the main loop. Returns
    * (v → component-min edges, rounds). */
  private[graft] def starContract(edges0: DataFrame, maxIter: Int = 50)
      : (DataFrame, Int) = {
    var edges = edges0.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint()
    var iter = 0
    var converged = edges.isEmpty
    while (!converged && iter < maxIter) {
      // large-star over the symmetrized graph: m(u) = min(Γ(u) ∪ {u});
      // emit (v, m(u)) for each neighbour v > u — connectivity-preserving
      val sym = edges.union(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      val mPerU = sym.groupBy(col("src"))
        .agg(min(col("dst")).as("_mn"))
        .select(col("src"), least(col("_mn"), col("src")).as("_m"))
      val ls = sym.join(mPerU, Seq("src"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("_m").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      // small-star over the hi→lo orientation: m(h) = min of the smaller
      // neighbourhood; re-hang that neighbourhood (and h) off m
      val dir = ls.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      val mPerH = dir.groupBy(col("src")).agg(min(col("dst")).as("_m"))
      val next = dir.join(mPerH, Seq("src"))
        .select(explode(array(col("dst"), col("src"))).as("src"),
          col("_m").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
        .localCheckpoint()
      converged = next.count() == edges.count() &&
        next.except(edges).limit(1).count() == 0L
      edges = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"starContract did not stabilise in $maxIter rounds — " +
          "O(log n) convergence makes this unreachable for any graph " +
          "with < 2^maxIter nodes; the input edge set must be changing " +
          "under it (non-deterministic source?)")
    (edges, iter)
  }

  /** [[dupClusters]] plus the number of propagation rounds it took to
    * converge — the loop is eager (one count per round), so the round
    * count is exact by return time; `ScaleProbe` quotes it in SCALE.md
    * as the measured component diameter. */
  def dupClustersWithRounds(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxIter: Int = 20,
      starFallback: Boolean = true,
      maxBucket: Option[Int] = Some(DefaultMaxBucket)): (DataFrame, Int) = {
    val pairs = lshCandidatePairs(docs, idCol, textCol, maxBucket)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint() // pairs are tiny relative to the corpus; computed once
    // the loop runs over PAIRED nodes only — an unpaired document can
    // never change its label, so the per-round joins touch the pair
    // graph (≪ corpus), and the full corpus is stitched back in one
    // final left join
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = edges.join(labels.select(col("id").as("dst"),
        col("label").as("_nl")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("_nl")).as("nbr_label"))
      val updated = labels
        .join(nbrMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"),
          coalesce(col("nbr_label") < col("label"), lit(false)).as("_chg"))
      val next = updated.localCheckpoint()
      converged = next.filter(col("_chg")).limit(1).count() == 0L
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    if (!converged && !starFallback)
      throw new IllegalStateException(
        s"dupClusters: min-label propagation did not converge in $maxIter " +
          "rounds — a near-dup chain exceeds that diameter; raise maxIter " +
          "or enable starFallback (partially propagated cluster_ids would " +
          "be silently wrong)")
    if (!converged) {
      // the chain outran O(diameter) propagation: restart from the
      // ORIGINAL pair graph with the O(log n)-round star contraction
      // (partial labels are discarded — correctness over salvage)
      val (starEdges, starRounds) = starContract(edges)
      labels = labels.select(col("id"))
        .join(starEdges.select(col("src").as("id"),
          col("dst").as("_sl")), Seq("id"), "left")
        .select(col("id"), coalesce(col("_sl"), col("id")).as("label"))
      iter += starRounds
    }
    val out = docs.select(col(idCol))
      .join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("label"), col(idCol)).as("cluster_id"))
    (out, iter)
  }

  /** Duplicated-span fraction (the C4/RefinedWeb-style boilerplate
    * metric): per document, the fraction of its DISTINCT word `k`-grams
    * that occur in more than one document corpus-wide. Documents with
    * high `dup_frac` are template/boilerplate candidates; docs with
    * fewer than k tokens report 0 spans, 0.0 fraction.
    *
    * Scale shape: spans are HASHED before the shuffle (the exploded
    * span→doc table is the big intermediate; 8-byte keys instead of
    * ~50-byte strings), one groupBy computes corpus span frequencies,
    * one join + groupBy folds them back per document. Hash collisions
    * merge unrelated spans — at 32 bits that inflates `dup_frac` by
    * ~n_spans/2³² (negligible), and the DuckDB twin hashes identically
    * so the check stays bit-exact. */
  def dupSpanFraction(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = SpanK): DataFrame = {
    val spans = docs.select(col(idCol),
      explode(array_distinct(
        transform(wordShingles(col(textCol), k), hash32(_)))).as("sp"))
    val freq = spans.groupBy(col("sp"))
      .agg(count_distinct(col(idCol)).as("ndocs"))
    val per = spans.join(freq, Seq("sp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        count_if(col("ndocs") > 1).as("n_shared"))
    docs.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(coalesce(col("n_spans"), lit(0L)) > 0,
          col("n_shared").cast("double") / col("n_spans").cast("double"))
          .otherwise(lit(0.0)).as("dup_frac"))
  }

  /** n-gram (word-shingle) Jaccard similarity between two text columns,
    * via distinct-set sizes: |A∩B| = |A|+|B|-|A∪B|. */
  def ngramJaccard(a: Column, b: Column, k: Int = ShingleK): Column =
    jaccardOfDistinctSets(
      array_distinct(wordShingles(a, k)), array_distinct(wordShingles(b, k)))

  /** Jaccard of two ALREADY-DISTINCT shingle arrays — the form to use
    * when the sets are precomputed once per document and reused across
    * pairs (see qt7: shingling on both sides of a self-join doubles the
    * tokenise+shingle work). */
  /** MinHash Jaccard ESTIMATE vs the true shingle Jaccard, per LSH
    * candidate pair — the measured accuracy of the sketch that drives
    * the banding decision. The estimate is the agreeing-slot fraction
    * of the two signatures (each slot agrees with probability J, so
    * E[estimate] = J with σ = √(J(1−J)/8) at 8 slots); the true
    * Jaccard joined alongside exposes the estimator error pair by
    * pair. At corpus scale, persist the signature and shingle-set
    * projections — here each is recomputed once, which the oracle
    * scale tolerates. */
  def minhashJaccardEstimate(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      maxBucket: Option[Int] = Some(DefaultMaxBucket)): DataFrame = {
    val pairs = lshCandidatePairs(docs, idCol, textCol, maxBucket)
    val sigs = minhashSignatures(docs, idCol, textCol)
    val sets = docs.select(col(idCol),
      array_distinct(wordShingles(col(textCol), ShingleK)).as("_sh"))
    val sa = sigs.select((col(idCol).as("id_a") +:
      MinhashA.indices.map(i => col(s"mh$i").as(s"a_mh$i"))): _*)
    val sb = sigs.select((col(idCol).as("id_b") +:
      MinhashA.indices.map(i => col(s"mh$i").as(s"b_mh$i"))): _*)
    val agree = MinhashA.indices
      .map(i => when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    pairs
      .join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .join(sets.select(col(idCol).as("id_a"), col("_sh").as("_sha")),
        Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("_sh").as("_shb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (agree.cast("double") / lit(MinhashA.size)).as("mh_est"),
        jaccardOfDistinctSets(col("_sha"), col("_shb")).as("jaccard"))
  }

  def jaccardOfDistinctSets(sa: Column, sb: Column): Column = {
    val union = array_distinct(concat(sa, sb))
    val inter = size(sa) + size(sb) - size(union)
    when(size(union) > 0,
      inter.cast("double") / size(union).cast("double")).otherwise(lit(0.0))
  }
}
