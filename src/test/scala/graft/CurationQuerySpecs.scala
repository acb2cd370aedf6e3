package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.queries.TextQueryCatalog

/** Hand-computed goldens for the round-3 curation queries (qt18
  * repetition, qt19 contamination, qt20 top TF-IDF) on a tiny synthetic
  * corpus — independent of the DuckDB oracle, every expected number is
  * derivable on paper — plus structural invariants on the real
  * testdata corpus. */
class CurationQuerySpecs extends SparkSpec {
  import spark.implicits._

  /** Write a documents.parquet with the real table's schema into a temp
    * dir and return the dir (the catalog queries read `$dir/documents
    * .parquet`). */
  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft_cur_").toString
    rows.map { case (id, text) => (id, text, "en", "unit", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def byId(df: DataFrame): Map[Long, org.apache.spark.sql.Row] =
    df.collect().map(r => r.getLong(0) -> r).toMap

  test("qt18 repetition: hand-computed bigram fractions") {
    val dir = docsDir(Seq(
      0L -> "x y x y x y", // bigrams: xy,yx,xy,yx,xy -> nb=5 nd=2 top=3
      1L -> "a",           // no bigrams
      2L -> "",            // empty
      3L -> "p q r s"))    // 3 distinct bigrams
    val out = byId(TextQueryCatalog.qt18Repetition(spark, dir))
    assert(out(0L).getLong(1) == 5 && out(0L).getLong(2) == 2)
    assert(out(0L).getDouble(3) == 3.0 / 5.0) // dup_bigram_frac
    assert(out(0L).getDouble(4) == 3.0 / 5.0) // top_bigram_frac
    for (id <- Seq(1L, 2L)) {
      assert(out(id).getLong(1) == 0 && out(id).getDouble(3) == 0.0)
    }
    assert(out(3L).getLong(1) == 3 && out(3L).getLong(2) == 3)
    assert(out(3L).getDouble(3) == 0.0)
    assert(out(3L).getDouble(4) == 1.0 / 3.0)
  }

  test("qt22 lm fluency: hand-computed pooled conditional probability") {
    val dir = docsDir(Seq(
      0L -> "a b a c", // bigrams: ab,ba,ac
      1L -> "a b",     // bigram: ab
      2L -> "x"))      // no bigrams
    // model: ab->2, ba->1, ac->1; prefixes: a->3 (ab+ac), b->1
    // doc0: s2 = 2+1+1 = 4, s1 = 3+1+3 = 7; doc1: s2 = 2, s1 = 3
    val out = byId(TextQueryCatalog.qt22LmFluency(spark, dir))
    assert(out(0L).getLong(1) == 3 && out(0L).getDouble(2) == 4.0 / 7.0)
    assert(out(1L).getLong(1) == 1 && out(1L).getDouble(2) == 2.0 / 3.0)
    assert(out(2L).getLong(1) == 0 && out(2L).isNullAt(2))
    // a fully-predictable corpus pools to exactly 1.0
    val uni = byId(TextQueryCatalog.qt22LmFluency(spark,
      docsDir(Seq(10L -> "a b a b", 11L -> "a b"))))
    assert(uni(10L).getDouble(2) == 1.0 && uni(11L).getDouble(2) == 1.0)
  }

  test("qt19 contamination: copy of benchmark doc -> 1.0, disjoint -> 0.0") {
    val bench = "t1 t2 t3 t4 t5 t6 t7 t8 t9" // doc_id 0 (% 50 == 0)
    val dir = docsDir(Seq(
      0L -> bench,
      1L -> bench,                             // exact copy: frac 1.0
      2L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10", // disjoint: frac 0.0
      3L -> "short doc"))                      // < 8 tokens: no spans
    val out = byId(TextQueryCatalog.qt19Contamination(spark, dir))
    assert(!out.contains(0L)) // benchmark docs excluded from the report
    assert(out(1L).getLong(1) == 2 && out(1L).getDouble(3) == 1.0)
    assert(out(2L).getLong(1) == 3 && out(2L).getDouble(3) == 0.0)
    assert(out(3L).getLong(1) == 0 && out(3L).getDouble(3) == 0.0)
  }

  test("qt20 top tf-idf: argmax and deterministic tie-break by token") {
    val dir = docsDir(Seq(
      0L -> "apple apple banana",
      1L -> "banana cherry", // tie at 1.5 -> 'banana' wins (token asc)
      2L -> "cherry cherry cherry"))
    val out = TextQueryCatalog.qt20TopTfidf(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(4))).toMap
    assert(out(0L) == ("apple", 6.0))  // tf 2 * N 3 / df 1
    assert(out(1L) == ("banana", 1.5)) // tf 1 * N 3 / df 2
    assert(out(2L) == ("cherry", 4.5)) // tf 3 * N 3 / df 2
  }

  test("real corpus invariants: fractions in [0,1], one top term per doc") {
    val dir = "/root/testdata/sf0.001"
    val rep = TextQueryCatalog.qt18Repetition(spark, dir).collect()
    assert(rep.forall(r => r.getDouble(3) >= 0 && r.getDouble(3) <= 1 &&
      r.getDouble(4) >= 0 && r.getDouble(4) <= 1))
    // top bigram is at least as frequent as the mean bigram
    assert(rep.filter(_.getLong(1) > 0).forall(r =>
      r.getDouble(4) * r.getLong(2) >= 0.999999))
    val con = TextQueryCatalog.qt19Contamination(spark, dir).collect()
    assert(con.forall(r => r.getDouble(3) >= 0 && r.getDouble(3) <= 1))
    assert(con.forall(r => r.getLong(2) <= r.getLong(1)))
    val tfidf = TextQueryCatalog.qt20TopTfidf(spark, dir)
    val nDocsWithText = spark.read.parquet(s"$dir/documents.parquet")
      .where("length(text) > 0").count()
    assert(tfidf.count() == nDocsWithText)
    assert(tfidf.groupBy("doc_id").count().where("count > 1").count() == 0)
  }

  test("redactPii: all three patterns hit, fixed order, clean text intact") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.functions.TextFunctions
    val out = Seq(
      "call 555-1234 at 10.0.0.7 or bob.smith+x@mail.example.org now",
      "no pii here, just words and 42 numbers 1.2 and 12-3456")
      .toDF("t")
      .select(TextFunctions.redactPii(col("t")).as("r"),
        TextFunctions.piiCount(col("t"), TextFunctions.EmailRe).as("e"),
        TextFunctions.piiCount(col("t"), TextFunctions.Ipv4Re).as("i"),
        TextFunctions.piiCount(col("t"), TextFunctions.PhoneRe).as("p"))
      .collect()
    assert(out(0).getString(0) ==
      "call <PHONE> at <IP> or <EMAIL> now")
    assert((out(0).getInt(1), out(0).getInt(2), out(0).getInt(3)) == (1, 1, 1))
    // the second string must pass through untouched: 1.2 is not an IPv4,
    // 12-3456 is not a phone (needs exactly 3-4 digits)
    assert(out(1).getString(0) ==
      "no pii here, just words and 42 numbers 1.2 and 12-3456")
    assert((out(1).getInt(1), out(1).getInt(2), out(1).getInt(3)) == (0, 0, 0))
    // qt23 salts every doc with one of each
    val q = TextQueryCatalog.qt23PiiRedact(spark, "/root/testdata/sf0.001")
      .collect()
    assert(q.nonEmpty && q.forall(r =>
      r.getLong(1) == 1 && r.getLong(2) == 1 && r.getLong(3) == 1))
  }

  test("qt24 chunks: sizes, indices and content of the ragged tail") {
    import graft.functions.TextFunctions.hash32
    import org.apache.spark.sql.functions.lit
    // 130 one-char tokens -> chunks of 64, 64, 2
    val dir = docsDir(Seq(
      0L -> (0 until 130).map(i => s"w$i").mkString(" "),
      1L -> "a b", // single partial chunk
      2L -> ""))   // zero chunks
    val rows = TextQueryCatalog.qt24Chunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.size == 4) // doc2 contributes nothing
    assert(rows((0L, 0L))._1 == 64 && rows((0L, 1L))._1 == 64 &&
      rows((0L, 2L))._1 == 2 && rows((1L, 0L))._1 == 2)
    // tail chunk content: exactly tokens 128..129
    val expected = Seq("x").toDF("x")
      .select(hash32(lit("w128 w129"))).head.getLong(0)
    assert(rows((0L, 2L))._2 == expected)
  }

  test("qt26 oov: frequency cut, lexicographic tie-break, zero-token doc") {
    // 25 distinct tokens; b01..b20 occur twice (doc1 repeats them),
    // x21..x25 once -> vocab (V=20) = b01..b20, so doc0 has 5 OOV of 25
    val freqDir = docsDir(Seq(
      0L -> (((1 to 20).map(i => f"b$i%02d") ++
        (21 to 25).map(i => f"x$i%02d")).mkString(" ")),
      1L -> (1 to 20).map(i => f"b$i%02d").mkString(" ")))
    val freqOut = byId(TextQueryCatalog.qt26OovScore(spark, freqDir))
    assert(freqOut(0L).getLong(1) == 25 && freqOut(0L).getLong(2) == 5)
    assert(freqOut(0L).getDouble(3) == 5.0 / 25.0)
    assert(freqOut(1L).getLong(2) == 0 && freqOut(1L).getDouble(3) == 0.0)
    // 21 tokens, all frequency 1: the V=20 cut is broken by token text
    // ascending, so exactly the lexicographically last token is OOV
    val tieDir = docsDir(Seq(
      0L -> (1 to 21).map(i => f"a$i%02d").mkString(" "),
      1L -> ""))
    val tieOut = byId(TextQueryCatalog.qt26OovScore(spark, tieDir))
    assert(tieOut(0L).getLong(1) == 21 && tieOut(0L).getLong(2) == 1)
    assert(tieOut(0L).getDouble(3) == 1.0 / 21.0)
    assert(tieOut(1L).getLong(1) == 0 && tieOut(1L).getDouble(3) == 0.0)
  }

  test("qt25 seq pack: hand-computed offsets, straddle, shard contiguity") {
    // shard 0 gets docs 0 and 8 (PackShards = 8): doc0 has 300 tokens
    // (n_tok 301) -> start 0, spans seqs 0..1 of SeqLen 256; doc8 has
    // 2 tokens (n_tok 3) -> start 301, seq 1.
    val dir = docsDir(Seq(
      0L -> (0 until 300).map(_ => "t").mkString(" "),
      8L -> "a b",
      3L -> "only doc in its shard"))
    val out = TextQueryCatalog.qt25SeqPack(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(out(0L) == ((300L, 0L, 0L, 1L, 2L)))
    assert(out(8L) == ((2L, 301L, 1L, 1L, 1L)))
    assert(out(3L) == ((5L, 0L, 0L, 0L, 1L)))
    // real corpus: per shard the packed stream is gapless — offsets sorted
    // by doc_id are exactly the running sum of (n_tokens + 1)
    val real = TextQueryCatalog.qt25SeqPack(spark, "/root/testdata/sf0.001")
      .collect().groupBy(_.getLong(1))
    real.values.foreach { rs =>
      var cum = 0L
      rs.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(3) == cum); cum += r.getLong(2) + 1
      }
    }
  }
}
