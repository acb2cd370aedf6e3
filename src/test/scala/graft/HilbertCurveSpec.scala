package graft

import org.apache.spark.sql.functions._

import graft.sources.ZOrder

/** The native Hilbert index: equality with a driver reference on
  * random points, the curve's DEFINING property (consecutive indices
  * are grid-adjacent — checked exhaustively at order 5, which Morton
  * provably fails), interpreted == codegen, and the locality payoff
  * vs Morton measured as box-straddle segment counts. */
class HilbertCurveSpec extends SparkSpec {
  import spark.implicits._

  private val Lit = (v: Long) =>
    org.apache.spark.sql.catalyst.expressions.Literal(v)

  /** Reference Morton interleave (shared by the adjacency and locality
    * tests — one definition, no drift). */
  private def morton(bits: Int)(x: Long, y: Long): Long =
    (0 until bits).map(j =>
      (((x >> j) & 1) << (2 * j)) | (((y >> j) & 1) << (2 * j + 1))).sum

  /** Independent driver implementation (same public algorithm,
    * written against d→(x,y) inverted, so a shared transcription
    * error cannot cancel): walk d's two-bit quads from the top,
    * applying the inverse rotation. */
  private def refD2xy(bits: Int, dIn: Long): (Long, Long) = {
    var (x, y) = (0L, 0L)
    var d = dIn
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (d / 2)
      val ry = 1L & (d ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      x += s * rx
      y += s * ry
      d /= 4
      s *= 2
    }
    (x, y)
  }

  test("hilbert2 equals the inverted driver reference on the full " +
    "order-5 grid") {
    val bits = 5
    val n = 1L << (2 * bits) // 1024 cells
    // build (x, y) -> d from the INVERSE reference and check the
    // expression maps every cell back to its d
    val cells = (0L until n).map { d =>
      val (x, y) = refD2xy(bits, d); (x, y, d)
    }
    val got = cells.toDF("x", "y", "d")
      .withColumn("hd", ZOrder.hilbertValue($"x", $"y", bits))
      .filter($"hd" =!= $"d").count()
    assert(got == 0, s"$got cells disagree with the inverse reference")
  }

  test("defining property: consecutive indices are grid-adjacent " +
    "(Morton is not)") {
    val bits = 5
    val n = 1L << (2 * bits)
    val pts = (0L until n).map(refD2xy(bits, _))
    pts.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d=($x1,$y1) and ($x2,$y2)")
    }
    // Morton takes a long jump at the same order: (0..2^b-1) boundary
    val byMorton = (for (x <- 0L until 32; y <- 0L until 32)
      yield (x, y)).sortBy { case (x, y) => morton(bits)(x, y) }
    val maxJump = byMorton.sliding(2).map {
      case Seq((x1, y1), (x2, y2)) => math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(maxJump > 1, "Morton should jump — else this test is vacuous")
  }

  test("interpreted eval == codegen through a DataFrame") {
    val rnd = new scala.util.Random(777)
    val pts = Seq.fill(500)((rnd.nextLong().abs % 4096,
      rnd.nextLong().abs % 4096))
    val viaDf = pts.toDF("x", "y")
      .select(ZOrder.hilbertValue($"x", $"y", 12).as("hd"))
      .as[Long].collect().toSeq
    val viaEval = pts.map { case (x, y) =>
      graft.functions.HilbertIndex2(Lit(x), Lit(y), 12)
        .eval(null).asInstanceOf[Long]
    }
    assert(viaDf == viaEval)
  }

  test("hilbert2 is SQL-callable with INT inputs (implicit casts)") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT hilbert2(CAST(5 AS INT), CAST(3 AS INT), 8) AS d")
      .head.getLong(0)
    val want = graft.functions.HilbertIndex2(Lit(5L), Lit(3L), 8)
      .eval(null).asInstanceOf[Long]
    assert(got == want)
    // diagnostics: non-literal and NULL bits fail with usable messages
    val e1 = intercept[Exception](
      spark.sql("SELECT hilbert2(1, 2, id) FROM range(1)").collect())
    assert(e1.getMessage.contains("literal"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT hilbert2(1, 2, NULL)").collect())
    assert(e2.getMessage.contains("NULL"), e2.getMessage)
  }

  test("hilbertWrite scales out-of-range dims before the curve") {
    // raw values far beyond 2^bits: without the min/max scale the
    // low-bit mask would alias distant values and every file would
    // cover ~the full range of both dims
    val dir = java.nio.file.Files.createTempDirectory("graft_hw_").toString
    val in = (0 until 20000).map { i =>
      (1000000L + (i * 7919L) % 100000, -50000L + (i * 104729L) % 100000,
        i.toLong)
    }.toDF("x", "y", "payload")
    graft.sources.ZOrder.hilbertWrite(in, dir, "x", "y",
      bits = 10, numFiles = 16)
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name()).agg(
        (max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"),
        count(lit(1)).as("n"))
      .collect()
    assert(spans.length > 4)
    val avgX = spans.map(_.getLong(1)).sum.toDouble / spans.length
    val avgY = spans.map(_.getLong(2)).sum.toDouble / spans.length
    assert(avgX < 60000 && avgY < 60000,
      s"spans not localised: x $avgX y $avgY of 100000")
    assert(spark.read.parquet(dir).count() == 20000)
  }

  test("locality: a box straddles fewer Hilbert segments than Morton") {
    // split the order-8 curve into 64 equal segments (files); count
    // segments a 48x48 box touches under each curve — the file-count
    // proxy the layout story rests on
    val bits = 8
    def segs(indexOf: (Long, Long) => Long): Int = {
      val segSize = (1L << (2 * bits)) / 64
      (for (x <- 100L until 148; y <- 60L until 108)
        yield indexOf(x, y) / segSize).distinct.size
    }
    def hilbert(x: Long, y: Long): Long =
      graft.functions.HilbertIndex2(Lit(x), Lit(y), bits)
        .eval(null).asInstanceOf[Long]
    val (hSegs, mSegs) = (segs(hilbert), segs(morton(bits)))
    assert(hSegs <= mSegs,
      s"hilbert $hSegs segments vs morton $mSegs — locality lost")
  }
}
