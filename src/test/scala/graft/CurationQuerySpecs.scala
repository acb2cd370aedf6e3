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
}
