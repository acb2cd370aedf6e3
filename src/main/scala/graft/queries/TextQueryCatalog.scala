package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.{TextSql => T}
import graft.operators.Dedup

import Oracle.table

/** Text-analysis + dedup catalog over `documents` (training-data pipeline
  * extension). The DuckDB SQL twins are GENERATED from the same constants
  * (hash params, stopword lists, shingle k) as the Spark expressions, so
  * the two sides cannot drift. */
object TextQueryCatalog {

  type Q = (SparkSession, String) => DataFrame

  /** Token counting + basic stats (whitespace AND BPE-ish regex
    * tokenisers). */
  val qt1TokenStats: Q = (s, dir) =>
    table(s, dir, "documents")
      .select(col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        bpeTokenCount(col("text")).as("n_bpe_tokens"),
        length(col("text")).as("n_chars_measured"),
        length(regexp_replace(col("text"), "\\s+", "")).as("n_nonws_chars"))

  /** Quality-scoring ingredients (ratios kept as exact int counts over
    * int counts → identical double division in both engines). */
  val qt2Quality: Q = (s, dir) =>
    table(s, dir, "documents")
      .select(col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        stopwords.map(wordCount(col("text"), _)).reduce(_ + _)
          .as("n_stopwords"),
        (stopwords.map(wordCount(col("text"), _)).reduce(_ + _).cast("double")
          / tokenCount(col("text")).cast("double")).as("stopword_ratio"),
        (length(regexp_replace(col("text"), "\\s+", "")).cast("double")
          / tokenCount(col("text")).cast("double")).as("mean_token_len"))

  /** Language-ID heuristic: stopword-marker argmax vs the labelled lang. */
  val qt3LangId: Q = (s, dir) =>
    table(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        langId(col("text")).as("lang_pred"),
        langScore(col("text"), "en").as("s_en"),
        langScore(col("text"), "de").as("s_de"))

  /** Exact dedup via 128-bit fingerprint (hash-groupBy). */
  val qt4ExactDedup: Q = (s, dir) =>
    Dedup.exactDedup(table(s, dir, "documents"))

  /** MinHash signatures (8 portable hash functions over word 3-shingles). */
  val qt5Minhash: Q = (s, dir) =>
    Dedup.minhashSignatures(table(s, dir, "documents"))

  /** LSH banded candidate pairs from the MinHash signatures. */
  val qt6LshPairs: Q = (s, dir) =>
    Dedup.lshCandidatePairs(table(s, dir, "documents"))

  /** qt6 with the skew cap BITING (r12): `maxBucket = 2` keeps only
    * two-member buckets, so any bucket a boilerplate group saturates
    * past two is excluded BEFORE the collect. The oracle sizes the
    * buckets and applies the same exclusion declaratively — the hash
    * match proves the count-only pre-pass drops exactly the oversized
    * buckets' pairs and nothing else. */
  val qt30LshCapped: Q = (s, dir) =>
    Dedup.lshCandidatePairs(table(s, dir, "documents"),
      maxBucket = Some(2))

  /** n-gram Jaccard similarity of consecutive doc ids (linear proxy for
    * pairwise near-dup scoring; the quadratic version goes through LSH).
    * Each doc's distinct shingle set is computed ONCE and materialised
    * (localCheckpoint) before the self-join — deriving shingles from text
    * on both join sides would tokenise + shingle every document twice
    * (at 100 TB: persist the shingle projection, then join). */
  val qt7NgramJaccard: Q = (s, dir) => {
    val sets = table(s, dir, "documents")
      .select(col("doc_id"),
        array_distinct(wordShingles(col("text"), Dedup.ShingleK)).as("sh"))
      .localCheckpoint()
    val a = sets.select(col("doc_id").as("id_a"), col("sh").as("sa"))
    val b = sets.select(col("doc_id").as("id_b"), col("sh").as("sb"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(col("id_a"), col("id_b"),
        Dedup.jaccardOfDistinctSets(col("sa"), col("sb")).as("jaccard"))
  }

  /** 32-bit SimHash per document. */
  val qt8Simhash: Q = (s, dir) =>
    Dedup.simhashDedup(table(s, dir, "documents"))

  /** Multimodal column plumbing: opaque binary payload + typed metadata.
    * The payload here is the doc text's bytes (a deterministic stand-in
    * the DuckDB oracle can reproduce; real WAV/BMP container decodes
    * live in `graft.operators.Multimodal` and are byte-exactness-tested
    * in `MultimodalCodecSpec`); the metadata extraction (sizes, fake
    * dimensions from the portable hash) is the real Spark-side shape. */
  val qt9MultimodalMeta: Q = (s, dir) =>
    table(s, dir, "documents")
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        length(col("payload")).as("n_bytes"),
        (hash32(col("payload").cast("string")) % 1920).as("fake_width"),
        (hash32b(col("payload").cast("string")) % 1080).as("fake_height"))

  /** Rolling (Rabin–Karp) fingerprint — the order-sensitive dedup key;
    * docs sharing it are candidate exact-order duplicates. */
  val qt10RollingFp: Q = (s, dir) =>
    table(s, dir, "documents")
      .select(col("doc_id"),
        rollingFingerprint(col("text")).as("rolling_fp"))

  /** Near-dup clusters: connected components over the LSH pair graph
    * (iterative min-label propagation, [[Dedup.dupClusters]]); the oracle
    * recomputes the same components with a recursive CTE — an independent
    * algorithm, not a transliteration. */
  val qt11DupClusters: Q = (s, dir) =>
    Dedup.dupClusters(table(s, dir, "documents"))

  /** The dedup DECISION on top of the clusters: one representative per
    * near-dup cluster (the min id) with the cluster size — the kept
    * corpus is exactly these `keep_id`s. */
  val qt12DedupKeep: Q = (s, dir) =>
    Dedup.dupClusters(table(s, dir, "documents"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
      .select(col("cluster_id").as("keep_id"), col("n_members"))

  /** Duplicated-span fraction (C4-style boilerplate metric): fraction of
    * each doc's distinct 8-gram spans occurring in >1 document. */
  val qt13DupSpans: Q = (s, dir) =>
    Dedup.dupSpanFraction(table(s, dir, "documents"))

  /** The COMPOSITE quality score (qt2 checks its ingredients): stopword
    * presence + sane mean token length + low digit noise, clamped to
    * [0,1]. Every arithmetic step mirrors the SQL twin exactly, so the
    * composite is bit-checked end to end. */
  val qt14QualityScore: Q = (s, dir) =>
    table(s, dir, "documents")
      .select(col("doc_id"), qualityScore(col("text")).as("quality"))

  /** SimHash near-dup pairs at hamming ≤ 3 via pigeonhole banding
    * ([[Dedup.simhashPairs]]). The oracle recomputes the pair set by
    * BRUTE FORCE (all-pairs bit_count(xor)) — an independent method, so
    * a banding bug that misses a pair fails the hash compare: the
    * pigeonhole recall guarantee is itself what's being checked. */
  val qt15SimhashPairs: Q = (s, dir) =>
    Dedup.simhashPairs(table(s, dir, "documents"))

  /** MinHash Jaccard estimate vs true shingle Jaccard per LSH candidate
    * pair ([[Dedup.minhashJaccardEstimate]]) — the sketch's measured
    * accuracy, bit-checked end to end. */
  val qt16MinhashEst: Q = (s, dir) =>
    Dedup.minhashJaccardEstimate(table(s, dir, "documents"))

  /** Deterministic stratified sampling for corpus curation: hash-bucket
    * sampling with per-language rates (downsample the dominant 'en',
    * keep the tail languages at 3× the rate) and a minimum-length
    * floor — the language-balancing + quality-gating step of a
    * training-data pipeline. Hash-threshold sampling is reproducible,
    * join-free, and composable (re-running with a higher rate yields a
    * superset — the buckets are stable). */
  val qt17StratifiedSample: Q = (s, dir) =>
    table(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"),
        pmod(hash32(concat(lit("smp:"), col("doc_id").cast("string"))),
          lit(100)).as("sample_bucket"))
      .withColumn("_rate",
        when(col("lang") === "en", lit(20)).otherwise(lit(60)))
      .filter(col("sample_bucket") < col("_rate") &&
        tokenCount(col("text")) >= 10)
      .select(col("doc_id"), col("lang"), col("sample_bucket"))

  /** Gopher-style repetition metrics per document: duplicate-bigram
    * fraction and most-frequent-bigram fraction over word 2-grams
    * (the "repetitious text" quality signals — boilerplate and
    * keyword-stuffed docs score high on both). Shape: explode hashed
    * bigrams → two partial-agg hash shuffles keyed by (doc, bigram)
    * then doc — codegen'd end to end, no window, linear at corpus
    * scale. Docs with < 2 tokens emit zero metrics via the left join
    * (same convention as qt13). */
  val qt18Repetition: Q = (s, dir) => {
    val docs = table(s, dir, "documents")
    val per = docs
      .select(col("doc_id"),
        explode(transform(wordShingles(col("text"), 2), hash32(_))).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("nb"),
        count(lit(1)).as("nd"),
        max(col("c")).as("tc"))
    docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        coalesce(col("nd"), lit(0L)).as("n_distinct_bigrams"),
        when(col("nb") > 0, (col("nb") - col("nd")).cast("double")
          / col("nb").cast("double"))
          .otherwise(lit(0.0)).as("dup_bigram_frac"),
        when(col("nb") > 0,
          col("tc").cast("double") / col("nb").cast("double"))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
  }

  /** Benchmark-contamination check: for every corpus document, the
    * fraction of its distinct hashed 8-gram spans that appear in a
    * held-out "benchmark" set (here the deterministic doc_id % 50 == 0
    * slice — in production, the eval suites). The benchmark span set is
    * tiny and fixed-size while the corpus grows, so it BROADCASTS: the
    * probe is one map-side hash join over the corpus spans, no shuffle
    * of the corpus side — the only scale-correct shape at 100 TB. */
  val qt19Contamination: Q = (s, dir) => {
    val docs = table(s, dir, "documents")
    val spans = docs.select(col("doc_id"),
      explode(array_distinct(
        transform(wordShingles(col("text"), Dedup.SpanK), hash32(_))))
        .as("sp"))
    val benchSpans = spans.filter(col("doc_id") % 50 === 0)
      .select(col("sp")).distinct().withColumn("_hit", lit(1))
    val per = spans.filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(benchSpans), Seq("sp"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ns"), count(col("_hit")).as("nc"))
    docs.filter(col("doc_id") % 50 =!= 0).select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("ns"), lit(0L)).as("n_spans"),
        coalesce(col("nc"), lit(0L)).as("n_contaminated"),
        when(col("ns") > 0,
          col("nc").cast("double") / col("ns").cast("double"))
          .otherwise(lit(0.0)).as("contaminated_frac"))
  }

  /** Corpus-weighted term salience: the top TF-IDF term per document
    * (idf kept RATIONAL — tf·N/df as exact integer product over integer
    * divisor, so both engines round the one double division
    * identically; a log-idf would hash-diverge via libm). df comes from
    * the (doc, term) counts, N broadcasts as a 1-row aggregate, and the
    * per-doc argmax is a row_number window partitioned by doc_id —
    * high-cardinality keys, no global sort. */
  val qt20TopTfidf: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = table(s, dir, "documents")
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok").asc)
    tf.join(dfreq, Seq("tok"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("tok").as("top_term"),
        col("tf"), col("df"), col("score"))
  }

  /** The CAPSTONE curation query — the whole pipeline composed into the
    * materialized kept-corpus decision: a document survives iff it is
    * (1) its near-dup cluster's representative (min-id of its LSH
    * connected component), (2) above the quality gate (same thresholds
    * as the qs9 streaming gate), (3) under the benchmark-contamination
    * ceiling, and (4) not itself a benchmark doc. One output row per
    * kept doc with the evidence columns. Each stage keeps its own
    * scale shape (bucketed LSH + pair-graph CC, map-only scoring,
    * broadcast span probe); the composition adds only doc_id
    * equi-joins. */
  val qt21CuratedCorpus: Q = (s, dir) => {
    val docs = table(s, dir, "documents")
    val reps = Dedup.dupClusters(docs)
      .filter(col("cluster_id") === col("doc_id"))
      .select(col("doc_id"))
    val quality = docs.select(col("doc_id"),
      qualityScore(col("text")).as("quality"),
      tokenCount(col("text")).as("n_tokens"))
    qt19Contamination(s, dir)
      .select(col("doc_id"), col("contaminated_frac"))
      .join(reps, Seq("doc_id"))
      .join(quality, Seq("doc_id"))
      .filter(col("quality") >= 0.6 && col("n_tokens") >= 25 &&
        col("contaminated_frac") < 0.5)
      .select(col("doc_id"), col("quality"), col("n_tokens"),
        col("contaminated_frac"))
  }

  /** Corpus-trained bigram-LM fluency score — the CCNet-style "does this
    * read like the corpus" quality signal, with the LM trained ON the
    * corpus itself: score(doc) = Σ C(bigram) / Σ C(prefix) over the doc's
    * bigram OCCURRENCES (repeats count) — the count-pooled conditional
    * probability P(w2 | w1). Kept RATIONAL: two exact integer sums and
    * ONE double division at the end. A per-bigram log-prob sum would
    * hash-diverge via libm, and per-bigram division would make the
    * result depend on float fold order; the pooled ratio has neither
    * hazard and still ranks run-on gibberish below corpus-like prose.
    *
    * Shape: the model is one partial-agg shuffle keyed by bigram
    * (vocab-sized output ≪ corpus); prefix totals aggregate the MODEL,
    * not the corpus; scoring is one equi-join of the exploded doc
    * bigrams against the enriched model, then a doc-keyed partial agg.
    * The exploded bigram frame is localCheckpointed so the model pass
    * and the scoring join tokenise each document once, not twice (at
    * 100 TB: persist the bigram projection). Nothing is quadratic,
    * nothing sorts globally. */
  val qt22LmFluency: Q = (s, dir) => {
    val docs = table(s, dir, "documents")
    val bg = docs.select(col("doc_id"),
      explode(wordShingles(col("text"), 2)).as("bigram"))
      .localCheckpoint()
    val model = bg.groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
    val prefix = model
      .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    val enriched = model.join(prefix,
      substring_index(col("bigram"), " ", 1) === col("w1"))
      .select(col("bigram"), col("c2"), col("c1"))
    val per = bg.join(enriched, Seq("bigram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nb"), sum(col("c2")).as("s2"),
        sum(col("c1")).as("s1"))
    docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        when(col("nb") > 0,
          col("s2").cast("double") / col("s1").cast("double"))
          .as("fluency"))
  }

  /** PII redaction — the scrubbing pass every training corpus gets
    * before the tokenizer sees it. The corpus text is deterministically
    * salted with synthetic PII (an email, an IPv4, a phone) derived from
    * doc_id — the same construction in the SQL twin — so the patterns
    * are actually EXERCISED, not vacuously counted on PII-free prose.
    * Patterns live in [[graft.functions.TextFunctions.PiiRes]] (one
    * definition, both engines); replacement order is fixed there.
    * Shape: map-only regex work inside whole-stage codegen — embarrass-
    * ingly parallel, the 100 TB cost is exactly one scan. */
  /** The salt + scrub projection itself, shared by the batch query
    * (qt23) and the streaming ingest scrubber
    * (`StreamQueryCatalog.qs13`): one definition makes their documented
    * "identical map-only stage" claim structural — an edit here changes
    * both sides and the shared oracle together. */
  def saltedPiiScrub(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com from 10."),
        (col("doc_id") % 256).cast("string"), lit(".0.7 call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
      .select(col("doc_id"),
        piiCount(col("text"), EmailRe).cast("long").as("n_emails"),
        piiCount(col("text"), Ipv4Re).cast("long").as("n_ipv4"),
        piiCount(col("text"), PhoneRe).cast("long").as("n_phones"),
        length(redactPii(col("text"))).cast("long").as("redacted_len"),
        hash32(redactPii(col("text"))).as("redacted_hash"))

  val qt23PiiRedact: Q = (s, dir) =>
    saltedPiiScrub(table(s, dir, "documents"))

  /** Context-window chunking: split each document into fixed-size
    * non-overlapping token windows (the pre-tokenisation chunking step
    * of a training pipeline; the last chunk keeps its ragged tail).
    * The chunk CONTENT is verified via a portable hash of the re-joined
    * tokens, so a off-by-one slice fails the oracle. Shape: map-only
    * explode — output rows ≈ corpus tokens / chunk size, no shuffle. */
  val ChunkSize = 64
  val qt24Chunks: Q = (s, dir) =>
    table(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(when(size(col("w")) > 0,
          sequence(lit(1), size(col("w")), lit(ChunkSize)))
          .otherwise(array().cast("array<int>")))
          .as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx").cast("long"),
        slice(col("w"), col("start"), lit(ChunkSize)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        hash32(concat_ws(" ", col("chunk"))).as("chunk_hash"))

  /** Sequence-packing manifest — the concat-and-chunk packing LLM
    * pretraining uses: within a shard, documents are laid end to end
    * (one separator token each) and the stream is cut into fixed
    * SeqLen windows; each doc's manifest row records where its tokens
    * land (start offset, first/last sequence, straddle count).
    * All integer math — cumsum, subtraction, floor division — so the
    * oracle hash-matches bit-exactly.
    * Shape: ONE window partitioned by shard. The global-cumsum scale
    * hazard is avoided by design: packing is per-shard (shards are
    * independent streams, count scales with the cluster), never a
    * single global order — the same reason production packers shard. */
  val SeqLen = 256
  val PackShards = 8
  val qt25SeqPack: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(s, dir, "documents")
      .select(col("doc_id"), (col("doc_id") % PackShards).as("shard"),
        (tokenCount(col("text")) + 1).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("start_offset", col("cum") - col("n_tok"))
      .select(col("doc_id"), col("shard"),
        (col("n_tok") - 1).as("n_tokens"), col("start_offset"),
        expr(s"start_offset div $SeqLen").as("first_seq"),
        expr(s"(cum - 1) div $SeqLen").as("last_seq"),
        (expr(s"(cum - 1) div $SeqLen")
          - expr(s"start_offset div $SeqLen") + 1L).as("n_seqs"))
  }

  /** Vocabulary build + OOV scoring — the tokenizer-prep step: the
    * top-V corpus tokens by frequency become the vocabulary (ties at
    * the cut broken by token text, so the set is deterministic in both
    * engines), then every document is scored for its out-of-vocabulary
    * fraction — the signal that drives "train the tokenizer on more of
    * this" / "this shard is noise" decisions.
    * Shape: one partial-agg shuffle builds the frequency table; the
    * top-V cut is a TakeOrdered (per-partition heaps, V rows out — not
    * a global sort); the vocab (V rows, corpus-size-independent)
    * BROADCASTS back over the exploded tokens, so the corpus side
    * never shuffles for the probe — the qt19 contamination shape.
    * V = 20 here because the synthetic corpus has only 31 distinct
    * tokens (V above that would make every OOV count vacuously zero);
    * production V (~50k) changes only the broadcast's size class. */
  val VocabSize = 20
  val qt26OovScore: Q = (s, dir) => {
    val docs = table(s, dir, "documents")
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .localCheckpoint()
    val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc)
      .limit(VocabSize)
      .select(col("tok"), lit(1).as("_in_vocab"))
    val per = tok.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nt"),
        (count(lit(1)) - count(col("_in_vocab"))).as("noov"))
    docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nt"), lit(0L)).as("n_tokens"),
        coalesce(col("noov"), lit(0L)).as("n_oov"),
        when(col("nt") > 0,
          col("noov").cast("double") / col("nt").cast("double"))
          .otherwise(lit(0.0)).as("oov_frac"))
  }

  /** Edit-distance fuzzy matching — the string-level near-dup family
    * (token/fingerprint methods miss single-character noise; curation
    * uses edit distance for titles, URLs, short fields). Levenshtein
    * over the first 40 chars of consecutive docs plus the normalised
    * similarity 1 − dist/maxLen (exact ints, ONE double division).
    * Classic DP is O(len²) per pair — which is why it's applied to a
    * bounded PREFIX and why corpus-scale fuzzy dedup routes through
    * LSH first (qt6) and edit distance only on candidate pairs. */
  val qt27Levenshtein: Q = (s, dir) => {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 40).as("pfx"))
    val a = docs.select(col("doc_id").as("id_a"), col("pfx").as("pa"))
    val b = docs.select(col("doc_id").as("id_b"), col("pfx").as("pb"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("pa"), col("pb")).cast("long").as("edit_dist"),
        when(greatest(length(col("pa")), length(col("pb"))) > 0,
          lit(1.0) - levenshtein(col("pa"), col("pb")).cast("double")
            / greatest(length(col("pa")), length(col("pb"))).cast("double"))
          .otherwise(lit(1.0)).as("similarity"))
  }

  /** Group-aware leakage-free train/eval split. A row-level random split
    * leaks near-identical content across the boundary (documents from one
    * SOURCE share boilerplate and near-dups), so training pipelines split
    * by GROUP: every doc of a source lands on the same side, decided by a
    * portable hash of the group key alone. The assignment is a map-only
    * codegen'd expression — deterministic across engines and runs,
    * shuffle-free (adding the split column never moves corpus bytes;
    * only this report's small aggregate shuffles), and at 100 TB it
    * composes with any downstream write as a pure projection.
    * ~80/20 by hash bucket. Oracle recomputes the same md5 bucket in
    * DuckDB; `Round4PropertySpecs` asserts zero straddling groups. */
  val qt28GroupSplit: Q = (s, dir) =>
    table(s, dir, "documents")
      .select(col("lang"), col("source"),
        when(pmod(hash32(concat(lit("spl:"), col("source"))), lit(100)) < 80,
          lit("train")).otherwise(lit("test")).as("split"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_groups"))

  /** DATA-MIXTURE sampling with a temperature — the corpus-reweighting
    * step LLM pipelines run before training (upweight tail domains,
    * downweight the head; the Pile/LLaMA mixture shape): per-language
    * target counts `n_d ∝ c_d^τ` with τ = 0.5, total budget = ¼ of the
    * corpus, then per-row acceptance by stable hash threshold. ALL the
    * rate math is INTEGER — `isq_d = floor(sqrt(c_d))` is exact for
    * counts < 2^26 in any IEEE engine, the targets are integer
    * `div`s, and acceptance is the cross-multiplied integer compare
    * `bucket · c_d < n_d · 10^6` — so Spark and DuckDB compute
    * bit-identical samples with no float-boundary row flips.
    * Hash-threshold acceptance is reproducible (re-runs select the
    * same rows), join-free per row, and composable (a higher budget
    * yields a superset). Plan shape: one partial-agg count shuffle +
    * one broadcast of the 5-row rate table + a codegen'd filter — two
    * column-pruned passes over the corpus, linear at 100 TB, no
    * window. */
  val qt29MixtureSample: Q = (s, dir) => {
    val docs = table(s, dir, "documents")
    val c = docs.groupBy(col("lang")).agg(count(lit(1)).as("c"))
      .withColumn("isq",
        floor(sqrt(col("c").cast("double"))).cast("long"))
    val tot = c.agg(sum(col("c")).as("total"), sum(col("isq")).as("ssum"))
    val rates = broadcast(c.crossJoin(tot)
      .withColumn("n_target", expr("((total div 4) * isq) div ssum"))
      .select(col("lang"), col("c"), col("n_target")))
    docs.join(rates, Seq("lang"))
      .withColumn("bucket", pmod(
        hash32(concat(lit("mix:"), col("doc_id").cast("string"))),
        lit(1000000L)))
      .filter(col("bucket") * col("c") <
        col("n_target") * lit(1000000L))
      .select(col("doc_id"), col("lang"), col("n_target"))
  }

  val defs: Map[String, Q] = Map(
    "qt29_mixture_sample" -> qt29MixtureSample,
    "qt28_group_split" -> qt28GroupSplit,
    "qt27_levenshtein" -> qt27Levenshtein,
    "qt26_oov" -> qt26OovScore,
    "qt25_seq_pack" -> qt25SeqPack,
    "qt24_chunks" -> qt24Chunks,
    "qt23_pii_redact" -> qt23PiiRedact,
    "qt22_lm_fluency" -> qt22LmFluency,
    "qt21_curated_corpus" -> qt21CuratedCorpus,
    "qt18_repetition" -> qt18Repetition,
    "qt19_contamination" -> qt19Contamination,
    "qt20_top_tfidf" -> qt20TopTfidf,
    "qt15_simhash_pairs" -> qt15SimhashPairs,
    "qt16_minhash_est" -> qt16MinhashEst,
    "qt17_stratified_sample" -> qt17StratifiedSample,
    "qt11_dup_clusters" -> qt11DupClusters,
    "qt12_dedup_keep" -> qt12DedupKeep,
    "qt13_dup_spans" -> qt13DupSpans,
    "qt14_quality_score" -> qt14QualityScore,
    "qt1_token_stats" -> qt1TokenStats,
    "qt10_rolling_fp" -> qt10RollingFp,
    "qt2_quality" -> qt2Quality,
    "qt3_langid" -> qt3LangId,
    "qt4_exact_dedup" -> qt4ExactDedup,
    "qt5_minhash" -> qt5Minhash,
    "qt6_lsh_pairs" -> qt6LshPairs,
    "qt30_lsh_capped" -> qt30LshCapped,
    "qt7_ngram_jaccard" -> qt7NgramJaccard,
    "qt8_simhash" -> qt8Simhash,
    "qt9_multimodal_meta" -> qt9MultimodalMeta)

  // ---------- generated DuckDB twins ----------

  private def langScoreSql(lang: String): String =
    langMarkers.toMap.apply(lang).map(T.wordCount("text", _))
      .mkString("(", " + ", ")")

  /** DuckDB expression list for the 8 minhash values over shingles `sh`. */
  private def minhashSqlCols: String =
    Dedup.MinhashA.indices.map { i =>
      val a = Dedup.MinhashA(i); val b = Dedup.MinhashB(i)
      s"list_min([($a * ${T.hash32("s")} + $b) % ${Dedup.MinhashP} for s in sh]) AS mh$i"
    }.mkString(",\n  ")

  private val shingleSql: String =
    s"""[w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       | for i in range(1, len(w) - ${Dedup.ShingleK - 2})]""".stripMargin

  private val sigCte: String =
    s"""WITH words AS (
       |  SELECT doc_id, ${T.tokens("text")} AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, $shingleSql AS sh FROM words),
       |sig AS (
       |  SELECT doc_id, $minhashSqlCols FROM sh)""".stripMargin

  /** `banded AS (...), pairs AS (...)` CTE bodies (assume `sig` from
    * [[sigCte]] is in scope) — shared by qt6, qt16. */
  private lazy val pairsCtes: String = {
    val nBands = Dedup.MinhashA.size / Dedup.BandSize
    val bandRows = (0 until nBands).map { bnd =>
      val key = (0 until Dedup.BandSize)
        .map(j => s"CAST(mh${bnd * Dedup.BandSize + j} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT doc_id AS id, $bnd AS band, $key AS band_key FROM sig WHERE mh0 IS NOT NULL"
    }.mkString("\n  UNION ALL ")
    s"""banded AS (
       |  $bandRows),
       |pairs AS (
       |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
       |  FROM banded l JOIN banded r
       |    ON l.band = r.band AND l.band_key = r.band_key AND l.id < r.id)""".stripMargin
  }

  private lazy val qt6Sql: String =
    s"""$sigCte,
       |$pairsCtes
       |SELECT id_a, id_b FROM pairs""".stripMargin

  /** qt6's CTEs plus a bucket-size gate: only buckets of EXACTLY two
    * members pair (`maxBucket = 2` on the Spark side). */
  private lazy val qt30Sql: String =
    s"""$sigCte,
       |$pairsCtes,
       |small AS (
       |  SELECT band, band_key FROM banded
       |  GROUP BY band, band_key HAVING count(*) = 2),
       |capped AS (
       |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
       |  FROM banded l JOIN banded r
       |    ON l.band = r.band AND l.band_key = r.band_key AND l.id < r.id
       |  JOIN small s ON s.band = l.band AND s.band_key = l.band_key)
       |SELECT id_a, id_b FROM capped""".stripMargin

  private lazy val qt11Sql: String =
    s"""WITH RECURSIVE pairs AS (
       |$qt6Sql
       |),
       |edges AS (
       |  SELECT id_a AS s, id_b AS d FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS r FROM documents
       |  UNION
       |  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s)
       |SELECT id AS doc_id, min(r) AS cluster_id
       |FROM reach GROUP BY id""".stripMargin

  private def simhashBitSql(j: Int): String =
    s"""(CASE WHEN coalesce(list_sum([CASE WHEN (${T.hash32("t")} >> $j) & 1 = 1
       | THEN 1 ELSE -1 END for t in w]), 0) > 0 THEN ${1L << j} ELSE 0 END)""".stripMargin

  /** qt14's composite quality query — shared verbatim with the
    * streaming quality gate's oracle (`StreamQueryCatalog.qs9`). */
  private[queries] lazy val qt14Sql: String =
    s"""WITH t AS (SELECT doc_id,
       |  CAST(${T.stopwordCount("text")} AS DOUBLE) AS hits,
       |  CAST(${T.tokenCount("text")} AS DOUBLE) AS total,
       |  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
       |    AS nonws,
       |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
       |    AS digits,
       |  CAST(length(text) AS DOUBLE) AS len
       |FROM documents)
       |SELECT doc_id, greatest(0.0, least(1.0,
       |  0.5 * (CASE WHEN total > 0 THEN hits / total ELSE 0.0 END) * 5.0
       |  + 0.3 * (CASE WHEN total > 0 AND nonws / total >= 3
       |             AND nonws / total <= 10 THEN 1.0 ELSE 0.0 END)
       |  + 0.2 * (1.0 - (CASE WHEN len > 0 THEN digits / len
       |                  ELSE 0.0 END) * 5.0))) AS quality
       |FROM t""".stripMargin

  /** qt19's contamination query — shared verbatim with the streaming
    * gate (`StreamQueryCatalog.qs10`) and embedded as a CTE in qt21. */
  private[queries] lazy val qt19Sql: String = {
    val k = Dedup.SpanK
    val span = (0 until k).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"""WITH words AS (
       |  SELECT doc_id, ${T.tokens("text")} AS w FROM documents),
       |spans AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [${T.hash32(s"($span)")}
       |     for i in range(1, len(w) - ${k - 2})])) AS sp
       |  FROM words),
       |bench AS (
       |  SELECT DISTINCT sp FROM spans WHERE doc_id % 50 = 0),
       |per AS (
       |  SELECT s.doc_id, count(*) AS ns,
       |    count(*) FILTER (WHERE b.sp IS NOT NULL) AS nc
       |  FROM spans s LEFT JOIN bench b ON b.sp = s.sp
       |  WHERE s.doc_id % 50 <> 0
       |  GROUP BY s.doc_id)
       |SELECT d.doc_id,
       |  coalesce(p.ns, 0) AS n_spans,
       |  coalesce(p.nc, 0) AS n_contaminated,
       |  CASE WHEN p.ns > 0
       |    THEN CAST(p.nc AS DOUBLE) / CAST(p.ns AS DOUBLE)
       |    ELSE 0.0 END AS contaminated_frac
       |FROM documents d LEFT JOIN per p USING (doc_id)
       |WHERE d.doc_id % 50 <> 0""".stripMargin
  }

  /** Shared simhash table CTE (qt8 result shape) for qt8 and qt15. */
  private lazy val simhashCte: String =
    s"""WITH words AS (SELECT doc_id, ${T.tokens("text")} AS w FROM documents),
       |sh_tbl AS (
       |  SELECT doc_id,
       |    (${(0 until 32).map(simhashBitSql).mkString("\n     + ")}) AS simhash
       |  FROM words)""".stripMargin

  /** qt23's PII query — shared verbatim with the streaming ingest
    * scrubber (`StreamQueryCatalog.qs13`). */
  private[queries] lazy val qt23Sql: String =
    s"""WITH salted AS (
       |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
       |    || '@mail.example.com from 10.'
       |    || CAST(doc_id % 256 AS VARCHAR) || '.0.7 call 555-'
       |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
       |  FROM documents)
       |SELECT doc_id,
       |  ${T.piiCount("text", EmailRe)} AS n_emails,
       |  ${T.piiCount("text", Ipv4Re)} AS n_ipv4,
       |  ${T.piiCount("text", PhoneRe)} AS n_phones,
       |  length(${T.redactPii("text")}) AS redacted_len,
       |  ${T.hash32(T.redactPii("text"))} AS redacted_hash
       |FROM salted""".stripMargin

  val sql: Map[String, String] = Map(
    "qt29_mixture_sample" ->
      s"""WITH c AS (
         |  SELECT lang, count(*) AS c,
         |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS isq
         |  FROM documents GROUP BY 1),
         |t AS (SELECT sum(c) AS total, sum(isq) AS ssum FROM c),
         |r AS (SELECT lang, c,
         |        CAST(((total // 4) * isq) // ssum AS BIGINT)
         |          AS n_target FROM c, t)
         |SELECT d.doc_id, d.lang, r.n_target
         |FROM documents d JOIN r ON r.lang = d.lang
         |WHERE (${T.hash32("'mix:' || CAST(d.doc_id AS VARCHAR)")}
         |    % 1000000) * r.c < r.n_target * 1000000""".stripMargin,
    "qt28_group_split" ->
      s"""SELECT
         |  CASE WHEN ${T.hash32("'spl:' || source")} % 100 < 80
         |    THEN 'train' ELSE 'test' END AS split,
         |  lang, count(*) AS n_docs,
         |  count(DISTINCT source) AS n_groups
         |FROM documents GROUP BY 1, 2""".stripMargin,
    "qt27_levenshtein" ->
      s"""WITH p AS (
         |  SELECT doc_id, substr(text, 1, 40) AS pfx FROM documents)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS edit_dist,
         |  CASE WHEN greatest(length(a.pfx), length(b.pfx)) > 0
         |    THEN 1.0 - CAST(levenshtein(a.pfx, b.pfx) AS DOUBLE)
         |      / CAST(greatest(length(a.pfx), length(b.pfx)) AS DOUBLE)
         |    ELSE 1.0 END AS similarity
         |FROM p a JOIN p b ON b.doc_id = a.doc_id + 1""".stripMargin,
    "qt26_oov" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(${T.tokens("text")}) AS tok FROM documents),
         |freq AS (
         |  SELECT tok, count(*) AS c FROM tok GROUP BY tok),
         |vocab AS (
         |  SELECT tok FROM freq ORDER BY c DESC, tok ASC LIMIT $VocabSize),
         |per AS (
         |  SELECT t.doc_id, count(*) AS nt,
         |    count(*) FILTER (WHERE v.tok IS NULL) AS noov
         |  FROM tok t LEFT JOIN vocab v ON v.tok = t.tok
         |  GROUP BY t.doc_id)
         |SELECT d.doc_id,
         |  coalesce(p.nt, 0) AS n_tokens,
         |  coalesce(p.noov, 0) AS n_oov,
         |  CASE WHEN p.nt > 0
         |    THEN CAST(p.noov AS DOUBLE) / CAST(p.nt AS DOUBLE)
         |    ELSE 0.0 END AS oov_frac
         |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin,
    "qt23_pii_redact" -> qt23Sql,
    "qt24_chunks" ->
      s"""WITH words AS (
         |  SELECT doc_id, ${T.tokens("text")} AS w FROM documents),
         |starts AS (
         |  SELECT doc_id, w,
         |    unnest(range(1, len(w) + 1, $ChunkSize)) AS strt
         |  FROM words),
         |sliced AS (
         |  SELECT doc_id,
         |    CAST((strt - 1) // $ChunkSize AS BIGINT) AS chunk_idx,
         |    array_slice(w, strt,
         |      least(strt + ${ChunkSize - 1}, len(w))) AS chunk
         |  FROM starts)
         |SELECT doc_id, chunk_idx,
         |  CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
         |  ${T.hash32("array_to_string(chunk, ' ')")} AS chunk_hash
         |FROM sliced""".stripMargin,
    "qt25_seq_pack" ->
      s"""WITH d AS (
         |  SELECT doc_id, doc_id % $PackShards AS shard,
         |    CAST(${T.tokenCount("text")} + 1 AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, shard, n_tok,
         |    CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM d)
         |SELECT doc_id, shard, n_tok - 1 AS n_tokens,
         |  cum - n_tok AS start_offset,
         |  (cum - n_tok) // $SeqLen AS first_seq,
         |  (cum - 1) // $SeqLen AS last_seq,
         |  (cum - 1) // $SeqLen - (cum - n_tok) // $SeqLen + 1 AS n_seqs
         |FROM c""".stripMargin,
    "qt22_lm_fluency" -> {
      val bigram = s"(w[i] || ' ' || w[i+1])"
      s"""WITH words AS (
         |  SELECT doc_id, ${T.tokens("text")} AS w FROM documents),
         |bg AS (
         |  SELECT doc_id, unnest(
         |    [$bigram for i in range(1, len(w))]) AS bigram
         |  FROM words),
         |model AS (
         |  SELECT bigram, CAST(count(*) AS BIGINT) AS c2
         |  FROM bg GROUP BY bigram),
         |prefix AS (
         |  SELECT split_part(bigram, ' ', 1) AS w1,
         |    CAST(sum(c2) AS BIGINT) AS c1
         |  FROM model GROUP BY 1),
         |enriched AS (
         |  SELECT m.bigram, m.c2, p.c1 FROM model m
         |  JOIN prefix p ON split_part(m.bigram, ' ', 1) = p.w1),
         |per AS (
         |  SELECT b.doc_id, count(*) AS nb,
         |    CAST(sum(e.c2) AS BIGINT) AS s2,
         |    CAST(sum(e.c1) AS BIGINT) AS s1
         |  FROM bg b JOIN enriched e USING (bigram)
         |  GROUP BY b.doc_id)
         |SELECT d.doc_id, coalesce(p.nb, 0) AS n_bigrams,
         |  CASE WHEN p.nb > 0
         |    THEN CAST(p.s2 AS DOUBLE) / CAST(p.s1 AS DOUBLE)
         |  END AS fluency
         |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin
    },
    "qt18_repetition" -> {
      val bigram = s"(w[i] || ' ' || w[i+1])"
      s"""WITH words AS (
         |  SELECT doc_id, ${T.tokens("text")} AS w FROM documents),
         |bg AS (
         |  SELECT doc_id, unnest(
         |    [${T.hash32(bigram)} for i in range(1, len(w))]) AS bg
         |  FROM words),
         |cnt AS (
         |  SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
         |per AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb,
         |    count(*) AS nd, max(c) AS tc
         |  FROM cnt GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(p.nb, 0) AS n_bigrams,
         |  coalesce(p.nd, 0) AS n_distinct_bigrams,
         |  CASE WHEN p.nb > 0
         |    THEN CAST(p.nb - p.nd AS DOUBLE) / CAST(p.nb AS DOUBLE)
         |    ELSE 0.0 END AS dup_bigram_frac,
         |  CASE WHEN p.nb > 0
         |    THEN CAST(p.tc AS DOUBLE) / CAST(p.nb AS DOUBLE)
         |    ELSE 0.0 END AS top_bigram_frac
         |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin
    },
    "qt19_contamination" -> qt19Sql,
    "qt21_curated_corpus" ->
      s"""WITH clusters AS (
         |$qt11Sql
         |),
         |quality AS (
         |${qt14Sql}
         |),
         |contam AS (
         |$qt19Sql
         |)
         |SELECT d.doc_id, q.quality,
         |  ${T.tokenCount("d.text")} AS n_tokens,
         |  c.contaminated_frac
         |FROM documents d
         |JOIN clusters cl ON cl.doc_id = d.doc_id
         |  AND cl.cluster_id = d.doc_id
         |JOIN quality q ON q.doc_id = d.doc_id
         |JOIN contam c ON c.doc_id = d.doc_id
         |WHERE q.quality >= 0.6 AND ${T.tokenCount("d.text")} >= 25
         |  AND c.contaminated_frac < 0.5""".stripMargin,
    "qt20_top_tfidf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(${T.tokens("text")}) AS tok FROM documents),
         |tf AS (
         |  SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfreq AS (
         |  SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT t.doc_id, t.tok, t.tf, d.df,
         |    CAST(t.tf * n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE) AS score
         |  FROM tf t JOIN dfreq d USING (tok) CROSS JOIN n),
         |ranked AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rn
         |  FROM scored)
         |SELECT doc_id, tok AS top_term, tf, df, score
         |FROM ranked WHERE rn = 1""".stripMargin,
    "qt1_token_stats" ->
      s"""SELECT doc_id, ${T.tokenCount("text")} AS n_tokens,
         |  ${T.bpeTokenCount("text")} AS n_bpe_tokens,
         |  length(text) AS n_chars_measured,
         |  length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonws_chars
         |FROM documents""".stripMargin,
    "qt10_rolling_fp" ->
      s"""SELECT doc_id, ${T.rollingFingerprint("text")} AS rolling_fp
         |FROM documents""".stripMargin,
    "qt2_quality" ->
      s"""SELECT doc_id, ${T.tokenCount("text")} AS n_tokens,
         |  ${T.stopwordCount("text")} AS n_stopwords,
         |  (CAST(${T.stopwordCount("text")} AS DOUBLE)
         |    / CAST(${T.tokenCount("text")} AS DOUBLE)) AS stopword_ratio,
         |  (CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |    / CAST(${T.tokenCount("text")} AS DOUBLE)) AS mean_token_len
         |FROM documents""".stripMargin,
    "qt3_langid" -> {
      val scores = langMarkers.map { case (l, _) =>
        s"${langScoreSql(l)} AS s_$l" }.mkString(",\n  ")
      val langs = langMarkers.map(_._1)
      val m = langs.map("s_" + _).mkString("greatest(", ", ", ")")
      val pred = langs.map(l => s"WHEN s_$l = $m THEN '$l'")
        .mkString("CASE ", " ", " END")
      s"""WITH scored AS (SELECT doc_id, lang, $scores FROM documents)
         |SELECT doc_id, lang, $pred AS lang_pred, s_en, s_de FROM scored""".stripMargin
    },
    "qt4_exact_dedup" ->
      s"""SELECT ${T.fingerprint("text")} AS fp, min(doc_id) AS keep_id,
         |  count(*) AS n_copies
         |FROM documents GROUP BY 1""".stripMargin,
    "qt5_minhash" ->
      s"""$sigCte
         |SELECT * FROM sig""".stripMargin,
    "qt6_lsh_pairs" -> qt6Sql,
    "qt30_lsh_capped" -> qt30Sql,
    "qt16_minhash_est" -> {
      val agree = Dedup.MinhashA.indices
        .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)")
        .mkString("\n      + ")
      s"""$sigCte,
         |$pairsCtes,
         |est AS (
         |  SELECT p.id_a, p.id_b,
         |    CAST(($agree) AS DOUBLE) / ${Dedup.MinhashA.size} AS mh_est
         |  FROM pairs p
         |  JOIN sig a ON a.doc_id = p.id_a
         |  JOIN sig b ON b.doc_id = p.id_b),
         |tru AS (
         |  SELECT p.id_a, p.id_b,
         |    CASE WHEN len(list_distinct(list_concat(
         |           list_distinct(sa.sh), list_distinct(sb.sh)))) > 0
         |      THEN CAST(len(list_distinct(sa.sh)) + len(list_distinct(sb.sh))
         |             - len(list_distinct(list_concat(
         |                 list_distinct(sa.sh), list_distinct(sb.sh)))) AS DOUBLE)
         |        / CAST(len(list_distinct(list_concat(
         |            list_distinct(sa.sh), list_distinct(sb.sh)))) AS DOUBLE)
         |      ELSE 0.0 END AS jaccard
         |  FROM pairs p
         |  JOIN sh sa ON sa.doc_id = p.id_a
         |  JOIN sh sb ON sb.doc_id = p.id_b)
         |SELECT e.id_a, e.id_b, e.mh_est, t.jaccard
         |FROM est e JOIN tru t ON t.id_a = e.id_a AND t.id_b = e.id_b""".stripMargin
    },
    "qt17_stratified_sample" ->
      s"""SELECT doc_id, lang, sample_bucket FROM (
         |  SELECT doc_id, lang, text,
         |    ${T.hash32("'smp:' || CAST(doc_id AS VARCHAR)")} % 100
         |      AS sample_bucket,
         |    CASE WHEN lang = 'en' THEN 20 ELSE 60 END AS rate
         |  FROM documents) t
         |WHERE sample_bucket < rate AND ${T.tokenCount("text")} >= 10""".stripMargin,
    "qt14_quality_score" -> qt14Sql,
    "qt13_dup_spans" -> {
      val k = 8
      val shingle = (0 until k).map(j => s"w[i+$j]").mkString(" || ' ' || ")
      s"""WITH words AS (
         |  SELECT doc_id, ${T.tokens("text")} AS w FROM documents),
         |spans AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    [${T.hash32(s"($shingle)")}
         |     for i in range(1, len(w) - ${k - 2})])) AS sp
         |  FROM words),
         |freq AS (
         |  SELECT sp, count(DISTINCT doc_id) AS ndocs
         |  FROM spans GROUP BY sp),
         |per AS (
         |  SELECT s.doc_id, count(*) AS n_spans,
         |    count(*) FILTER (WHERE f.ndocs > 1) AS n_shared
         |  FROM spans s JOIN freq f USING (sp) GROUP BY s.doc_id)
         |SELECT d.doc_id, coalesce(p.n_spans, 0) AS n_spans,
         |  coalesce(p.n_shared, 0) AS n_shared,
         |  CASE WHEN coalesce(p.n_spans, 0) > 0
         |    THEN CAST(p.n_shared AS DOUBLE) / CAST(p.n_spans AS DOUBLE)
         |    ELSE 0.0 END AS dup_frac
         |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin
    },
    "qt11_dup_clusters" -> qt11Sql,
    "qt12_dedup_keep" ->
      s"""WITH clusters AS (
         |$qt11Sql
         |)
         |SELECT cluster_id AS keep_id, count(*) AS n_members
         |FROM clusters GROUP BY cluster_id""".stripMargin,
    "qt7_ngram_jaccard" -> {
      val sh = (t: String) =>
        s"""list_distinct([w_$t[i] || ' ' || w_$t[i+1] || ' ' || w_$t[i+2]
           | for i in range(1, len(w_$t) - ${Dedup.ShingleK - 2})])""".stripMargin
      s"""WITH pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    ${T.tokens("a.text")} AS w_a, ${T.tokens("b.text")} AS w_b
         |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
         |sets AS (
         |  SELECT id_a, id_b, ${sh("a")} AS sa, ${sh("b")} AS sb FROM pairs),
         |sizes AS (
         |  SELECT id_a, id_b, len(sa) AS na, len(sb) AS nb,
         |    len(list_distinct(list_concat(sa, sb))) AS nu FROM sets)
         |SELECT id_a, id_b,
         |  CASE WHEN nu > 0
         |    THEN CAST(na + nb - nu AS DOUBLE) / CAST(nu AS DOUBLE)
         |    ELSE 0.0 END AS jaccard
         |FROM sizes""".stripMargin
    },
    "qt8_simhash" ->
      s"""$simhashCte
         |SELECT doc_id, simhash FROM sh_tbl""".stripMargin,
    "qt15_simhash_pairs" ->
      s"""$simhashCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         |FROM sh_tbl a JOIN sh_tbl b ON b.doc_id > a.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,
    "qt9_multimodal_meta" ->
      s"""WITH payloads AS (
         |  SELECT doc_id, CAST(text AS BLOB) AS payload FROM documents)
         |SELECT doc_id, octet_length(payload) AS n_bytes,
         |  ${T.hash32("CAST(payload AS VARCHAR)")} % 1920 AS fake_width,
         |  ${T.hash32b("CAST(payload AS VARCHAR)")} % 1080 AS fake_height
         |FROM payloads""".stripMargin)
}
