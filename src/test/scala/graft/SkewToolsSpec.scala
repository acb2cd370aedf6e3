package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewTools

class SkewToolsSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows on one hot key
  private lazy val skewed = ((1 to 900).map(i => ("hot", i)) ++
    (1 to 100).map(i => (s"k${i % 10}", i))).toDF("key", "v")
  private lazy val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"))
    .toDF("key", "name")

  test("salted join == plain join (values), shuffles on (key, salt)") {
    val plain = skewed.join(dim, Seq("key"))
      .groupBy("key").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val salted = SkewTools.saltedJoin(skewed, dim, Seq("key"), n = 8)
      .groupBy("key").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    assert(salted.orderBy("key").collect().toSeq ==
      plain.orderBy("key").collect().toSeq)
  }

  test("salt spreads the hot key over multiple sub-keys") {
    val salts = skewed.filter($"key" === "hot")
      .select(SkewTools.rowSalt(skewed, 8).as("s"))
      .distinct().count()
    assert(salts > 1, "hot key must land on more than one salt")
  }

  test("skew-safe distinct count matches countDistinct") {
    val expected = skewed.groupBy("key")
      .agg(countDistinct($"v").as("n_distinct_v"))
    val got = SkewTools.skewSafeCountDistinct(skewed, Seq("key"), "v", n = 8)
    assert(got.orderBy("key").collect().toSeq ==
      expected.orderBy("key").collect().toSeq)
  }

  test("two-phase sum composes associatively") {
    val got = SkewTools.twoPhaseAgg(skewed, Seq("key"), n = 4,
      partial = Seq(sum($"v").as("_s"), count(lit(1)).as("_n")),
      finalAgg = Seq(sum($"_s").as("s"), sum($"_n").as("n")))
    val expected = skewed.groupBy("key")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"))
    assert(got.orderBy("key").collect().toSeq ==
      expected.orderBy("key").collect().toSeq)
  }
}
