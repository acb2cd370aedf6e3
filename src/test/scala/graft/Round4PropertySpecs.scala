package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, GlobalWindow}

/** Property-style cross-checks for the round-4 operators on randomized
  * (seeded) data: the offset-k global lag must equal the unpartitioned
  * window for ANY (series, k, bucket count) combination — duplicates,
  * nulls and empty buckets included — and the large-star/small-star
  * contraction must label every random graph identically to a
  * driver-side union-find. */
class Round4PropertySpecs extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(8484)

  test("lagGlobal(k): randomized equality with the unpartitioned window") {
    spark.conf.set(GlobalWindow.SmallInputConfKey, "0")
    try {
      (1 to 4).foreach { trial =>
        val n = 80 + rnd.nextInt(200)
        val k = 1 + rnd.nextInt(6)
        val parts = 2 + rnd.nextInt(20)
        // keys with duplicates-free order (unique) but SKEWED spacing,
        // values with nulls
        var key = 0L
        val rows = (0 until n).map { _ =>
          key += 1 + rnd.nextInt(if (rnd.nextInt(10) == 0) 100000 else 3)
          (key, if (rnd.nextInt(6) == 0) null
            else java.lang.Double.valueOf(rnd.nextInt(1000) * 0.25))
        }
        val df = rows.toDF("k", "v").repartition(1 + rnd.nextInt(7))
        val viaGlobal = GlobalWindow.lagGlobal(df, Seq("k"), "v", "prev",
          bucketKey = col("k"), numPartitions = Some(parts), offset = k)
          .orderBy("k").select($"k", $"prev").collect().toSeq
        val viaSingle = df
          .withColumn("prev", lag($"v", k).over(Window.orderBy($"k")))
          .orderBy("k").select($"k", $"prev").collect().toSeq
        assert(viaGlobal == viaSingle,
          s"trial $trial: n=$n k=$k parts=$parts")
        val leadGlobalOut = GlobalWindow.leadGlobal(df, Seq("k"), "v",
          "next", bucketKey = col("k"), numPartitions = Some(parts),
          offset = k)
          .orderBy("k").select($"k", $"next").collect().toSeq
        val leadSingle = df
          .withColumn("next", lead($"v", k).over(Window.orderBy($"k")))
          .orderBy("k").select($"k", $"next").collect().toSeq
        assert(leadGlobalOut == leadSingle,
          s"lead trial $trial: n=$n k=$k parts=$parts")
      }
    } finally spark.conf.unset(GlobalWindow.SmallInputConfKey)
  }

  test("starContract: randomized equality with driver-side union-find") {
    (1 to 4).foreach { trial =>
      val nNodes = 30 + rnd.nextInt(120)
      val nEdges = rnd.nextInt(2 * nNodes)
      val edges = (0 until nEdges).map { _ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)
      }
      // union-find oracle
      val parent = Array.tabulate(nNodes)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // component min per node (only nodes that appear in an edge —
      // starContract never sees isolated nodes)
      val touched = edges.flatMap(e => Seq(e._1.toInt, e._2.toInt)).distinct
      val minOf = touched.groupBy(find).map { case (r, members) =>
        r -> members.min.toLong
      }
      val want = touched.map(v => v.toLong -> minOf(find(v))).toMap

      val (out, rounds) = Dedup.starContract(
        edges.toDF("src", "dst"))
      val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      touched.foreach { v =>
        val label = got.getOrElse(v.toLong, v.toLong) // roots carry no edge
        assert(label == want(v.toLong),
          s"trial $trial node $v: got $label want ${want(v.toLong)}")
      }
      // O(log n) round bound with slack
      assert(rounds <= 2 * (64 - java.lang.Long
        .numberOfLeadingZeros(nNodes.toLong)) + 4,
        s"trial $trial: $rounds rounds for $nNodes nodes")
    }
  }

  test("qt28 group split: no group straddles the train/test boundary") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.TextQueryCatalog.defs("qt28_group_split")(
      spark, dir).cache()
    // if any (lang, source) cell landed on both sides, the per-cell
    // distinct-group counts would double-count it and the sum would
    // exceed the corpus total — equality proves zero straddlers THROUGH
    // the query output, not by re-deriving the assignment
    val sumGroups = out.agg(sum(col("n_groups"))).head.getLong(0)
    val pairs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), col("source")).distinct().count()
    assert(sumGroups == pairs,
      s"group cells $sumGroups != distinct (lang, source) $pairs")
    // both sides populated — the split is not vacuous on this corpus
    val sides = out.select(col("split")).distinct().count()
    assert(sides == 2, s"expected train AND test, got $sides side(s)")
  }
}
