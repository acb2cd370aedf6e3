package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline extension
  * (builder brief: language-ID, quality scoring, token counting, document
  * fingerprinting). All pure Catalyst expressions — codegen'd, no UDFs —
  * so they run inside whole-stage codegen and scale linearly with input.
  *
  * Every function has a DuckDB SQL twin (same md5-based hashing, same
  * regexes) in [[TextSql]] so results hash-match the oracle bit-exactly.
  */
object TextFunctions {

  /** Portable 32-bit hash: first 8 hex digits of md5 as a non-negative
    * long. Identical in DuckDB via `CAST('0x'||substr(md5(s),1,8) AS
    * BIGINT)`. Used (instead of Spark's murmur3 `hash`) wherever the
    * oracle must reproduce the value. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Second independent 32-bit hash from the other md5 half. */
  def hash32b(c: Column): Column =
    conv(substring(md5(c), 9, 8), 16, 10).cast("long")

  /** Whitespace tokenisation. */
  def tokens(c: Column): Column = regexp_extract_all(c, lit("\\S+"), lit(0))

  /** Token count without materialising the token array. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish pre-tokenisation: word runs OR single non-word-non-space
    * marks (the GPT-2-style pre-split shape — punctuation becomes its own
    * token). Explicit character classes, not `\w`, so both regex engines
    * agree. */
  val BpeRegex = "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"
  def bpeTokens(c: Column): Column =
    regexp_extract_all(c, lit(BpeRegex), lit(0))
  def bpeTokenCount(c: Column): Column = size(bpeTokens(c))

  /** Rolling (Rabin–Karp polynomial) fingerprint over token hashes:
    * `fp = fold(0, (acc, h) → (acc·B + h) mod M)` — order-sensitive (two
    * docs with the same tokens in different order differ), incremental,
    * and int64-safe (acc < M = 2³¹−1, B = 31, h < 2³²). */
  val RollB = 31L
  val RollM = 2147483647L
  def rollingFingerprint(c: Column): Column =
    aggregate(transform(tokens(c), hash32(_)),
      lit(0L), (acc, h) => (acc * lit(RollB) + h) % lit(RollM))

  /** Word k-shingles: contiguous k-token spans joined by a single space.
    * Empty array when the doc has fewer than k tokens.
    *
    * The token array is LET-BOUND via a single-element `transform` (there
    * is no `let` in the expression language): binding `w` as a lambda
    * variable evaluates `tokens(c)` once per row. Inlining it instead
    * re-runs the full-text regex for every `element_at` of every shingle —
    * O(tokens²) per document, a ~30× slowdown on real corpora. */
  def wordShingles(c: Column, k: Int): Column =
    element_at(transform(array(tokens(c)), w =>
      when(size(w) >= k,
        transform(sequence(lit(0), size(w) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(w, i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))), 1)

  /** Quality-scoring ingredients: length, alpha ratio, digit ratio,
    * punctuation-ish ratio, mean token length, stopword ratio. */
  def charRatio(c: Column, charClass: String): Column =
    when(length(c) > 0,
      length(regexp_replace(c, s"[^$charClass]", "")).cast("double") /
        length(c).cast("double")).otherwise(lit(0.0))

  val stopwords: Seq[String] = Seq(
    "the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

  /** Count of occurrences of token `t` (word-boundary matched). */
  def wordCount(c: Column, t: String): Column =
    size(regexp_extract_all(c, lit(s"\\b${java.util.regex.Pattern.quote(t)}\\b"), lit(0)))

  def stopwordRatio(c: Column): Column = {
    val total = tokenCount(c)
    val hits = stopwords.map(wordCount(c, _)).reduce(_ + _)
    when(total > 0, hits.cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: stopword presence, sane mean token
    * length, low digit noise. Heuristic — the point is the shape (cheap,
    * columnar, one pass), not linguistic truth. */
  def qualityScore(c: Column): Column = {
    val meanTok = when(tokenCount(c) > 0,
      length(regexp_replace(c, "\\s+", "")).cast("double") /
        tokenCount(c).cast("double")).otherwise(lit(0.0))
    val tokLenOk = when(meanTok >= 3 && meanTok <= 10, lit(1.0)).otherwise(lit(0.0))
    val digitPenalty = charRatio(c, "0-9")
    greatest(lit(0.0), least(lit(1.0),
      lit(0.5) * stopwordRatio(c) * lit(5.0) + lit(0.3) * tokLenOk
        + lit(0.2) * (lit(1.0) - digitPenalty * lit(5.0))))
  }

  /** Language-ID by stopword-list hits (n-gram heuristic family). Scores
    * each candidate language by marker-word occurrences; returns the
    * argmax with 'en' as tiebreak/default. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est"),
    "es" -> Seq("el", "los", "y", "es"),
    "zh" -> Seq("的", "是", "了", "在"))

  def langScore(c: Column, lang: String): Column =
    langMarkers.toMap.apply(lang).map(wordCount(c, _)).reduce(_ + _)

  def langId(c: Column): Column = {
    // argmax with first-listed language winning ties (same order as the
    // SQL twin's CASE chain). Scores are collected into ONE array and
    // let-bound; a when/otherwise fold would duplicate every regex-count
    // subtree per comparison — combinatorial re-evaluation that showed up
    // as a 40× slowdown under full-column execution.
    val scores = array(langMarkers.map { case (_, ws) =>
      ws.map(wordCount(c, _)).reduce(_ + _) }: _*)
    element_at(transform(array(scores), ss =>
      element_at(typedLit(langMarkers.map(_._1)),
        array_position(ss, array_max(ss)).cast("int"))), 1)
  }

  /** Document fingerprint: md5 of the whitespace-normalised, lowercased
    * text — the exact-dedup key. */
  def fingerprint(c: Column): Column =
    md5(lower(regexp_replace(trim(c), "\\s+", " ")))

  /** PII patterns shared with the SQL twin. Deliberately conservative
    * subsets of the Java + RE2 common syntax: character classes and
    * bounded repetition only — no lookaround, no backreferences — so
    * Spark (java.util.regex) and DuckDB (RE2) match IDENTICAL spans.
    * Replacement order matters and is fixed: email first (its local
    * part can contain digits and dots that the IP pattern would
    * otherwise bite into), then IPv4, then phone. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
  val PiiRes: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>", Ipv4Re -> "<IP>", PhoneRe -> "<PHONE>")

  def piiCount(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0)))

  /** Redact all PII spans, in the fixed pattern order. */
  def redactPii(c: Column): Column =
    PiiRes.foldLeft(c) { case (acc, (re, tag)) =>
      regexp_replace(acc, re, tag) }
}

/** DuckDB SQL twins of [[TextFunctions]] — same constants, same regexes.
  * Kept adjacent so the two sides can't drift apart silently. */
object TextSql {
  def hash32(e: String): String =
    s"CAST(('0x' || substr(md5($e),1,8)) AS BIGINT)"
  def hash32b(e: String): String =
    s"CAST(('0x' || substr(md5($e),9,8)) AS BIGINT)"
  def tokens(e: String): String = s"regexp_extract_all($e, '\\S+')"
  def tokenCount(e: String): String = s"len(${tokens(e)})"
  def wordCount(e: String, t: String): String =
    s"len(regexp_extract_all($e, '\\b$t\\b'))"
  def stopwordCount(e: String): String =
    TextFunctions.stopwords.map(wordCount(e, _)).mkString("(", " + ", ")")
  def fingerprint(e: String): String =
    s"md5(lower(regexp_replace(trim($e), '\\s+', ' ', 'g')))"
  def bpeTokenCount(e: String): String =
    s"len(regexp_extract_all($e, '${TextFunctions.BpeRegex}'))"
  /** DuckDB list_reduce seeds with the first element, so the zero is
    * prepended to mirror Spark's explicit-zero fold. */
  def rollingFingerprint(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       | [${hash32("t")} for t in ${tokens(e)}]),
       | (acc, x) -> (acc * ${TextFunctions.RollB} + x)
       |   % ${TextFunctions.RollM})""".stripMargin
  def piiCount(e: String, re: String): String =
    s"len(regexp_extract_all($e, '$re'))"
  /** Same fixed pattern order as [[TextFunctions.redactPii]]; DuckDB
    * needs the explicit 'g' flag Spark applies implicitly. */
  def redactPii(e: String): String =
    TextFunctions.PiiRes.foldLeft(e) { case (acc, (re, tag)) =>
      s"regexp_replace($acc, '$re', '$tag', 'g')" }
}
