package graft

import org.apache.spark.sql.functions._

import graft.functions.HilbertIndexN
import graft.sources.ZOrder

/** The N-dimensional Hilbert index (Skilling transpose algorithm):
  * bijectivity + the curve's DEFINING adjacency property checked
  * EXHAUSTIVELY in 3-D and 4-D, interpreted == codegen, SQL surface,
  * and the N-dim clustered write. */
class HilbertNSpec extends SparkSpec {
  import spark.implicits._

  private val Lit = (v: Long) =>
    org.apache.spark.sql.catalyst.expressions.Literal(v)

  private def hn(bits: Int)(xs: Long*): Long =
    HilbertIndexN(xs.map(Lit(_)), bits).eval(null).asInstanceOf[Long]

  /** Every coordinate of the full order-`bits` n-cube, its index, and
    * the two exhaustive properties: indices are a bijection onto
    * [0, 2^(n·bits)) and consecutive indices are grid-adjacent
    * (|Δ|₁ = 1) — together these define a Hilbert curve. */
  private def checkCurve(n: Int, bits: Int): Unit = {
    val side = 1L << bits
    def coords(i: Long): Seq[Long] =
      (0 until n).map(j => (i >> (j * bits)) & (side - 1))
    val total = 1L << (n * bits)
    val byD = (0L until total).map { i =>
      val c = coords(i)
      (hn(bits)(c: _*), c)
    }.sortBy(_._1)
    assert(byD.map(_._1) == (0L until total),
      s"n=$n bits=$bits: indices are not a bijection onto [0, $total)")
    byD.sliding(2).foreach { case Seq((d1, c1), (d2, c2)) =>
      val manhattan = c1.zip(c2).map { case (a, b) => math.abs(a - b) }.sum
      assert(manhattan == 1,
        s"n=$n bits=$bits: jump $manhattan between d=$d1 $c1 and d=$d2 $c2")
    case _ => ()
    }
  }

  test("3-D: exhaustive bijection + adjacency at order 3 (512 cells)") {
    checkCurve(n = 3, bits = 3)
  }

  test("4-D: exhaustive bijection + adjacency at order 2 (256 cells)") {
    checkCurve(n = 4, bits = 2)
  }

  test("2-D: exhaustive bijection + adjacency at order 5 (1024 cells)") {
    // same properties as HilbertIndex2's curve (orientation may differ;
    // adjacency is the layout-relevant contract)
    checkCurve(n = 2, bits = 5)
  }

  test("bits = 1 degenerates cleanly: curve bijection holds and the " +
    "CTE twin generates (parity term is literal 0)") {
    checkCurve(n = 2, bits = 1) // 4 cells: still a bijection + adjacent
    checkCurve(n = 3, bits = 1)
    // the SQL twin used to throw empty.reduce at bits = 1 (its require
    // admits bits >= 1): the parity term must degrade to literal 0
    val (cte, fin) = graft.sources.ZOrder.sqlHilbertNCte(
      Seq("x", "y"), bits = 1, "t", carry = Seq("x", "y"))
    assert(fin == "hn_fin" && cte.contains("hn_fin"))
  }

  test("interpreted eval == codegen through a DataFrame (3-D)") {
    val rnd = new scala.util.Random(4242)
    val pts = Seq.fill(500)((rnd.nextLong().abs % 4096,
      rnd.nextLong().abs % 4096, rnd.nextLong().abs % 4096))
    val viaDf = pts.toDF("x", "y", "z")
      .select(ZOrder.hilbertValueN(Seq($"x", $"y", $"z"), 12).as("hd"))
      .as[Long].collect().toSeq
    val viaEval = pts.map { case (x, y, z) => hn(12)(x, y, z) }
    assert(viaDf == viaEval)
  }

  test("null coordinate -> null index (both paths)") {
    val viaDf = Seq((Some(1L), Option.empty[Long], Some(2L)))
      .toDF("x", "y", "z")
      .select(ZOrder.hilbertValueN(Seq($"x", $"y", $"z"), 8).as("hd"))
      .collect()
    assert(viaDf.head.isNullAt(0))
  }

  test("hilbertn is SQL-callable with INT inputs and any arity") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT hilbertn(CAST(5 AS INT), CAST(3 AS INT), CAST(7 AS INT), 6)" +
        " AS d").head.getLong(0)
    assert(got == hn(6)(5L, 3L, 7L))
    val e1 = intercept[Exception](
      spark.sql("SELECT hilbertn(1, 2, 3, id) FROM range(1)").collect())
    assert(e1.getMessage.contains("literal"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT hilbertn(1, 2)").collect())
    assert(e2.getMessage.contains("coordinates"), e2.getMessage)
  }

  test("hilbertWriteN: 3-D clustered write localises every dimension") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hn_").toString
    val in = (0 until 30000).map { i =>
      ((i * 7919L) % 100000, (i * 104729L) % 100000, (i * 1299709L) % 100000,
        i.toLong)
    }.toDF("x", "y", "z", "payload")
    ZOrder.hilbertWriteN(in, dir, Seq("x", "y", "z"),
      bits = 8, numFiles = 27)
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name()).agg(
        (max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"),
        (max($"z") - min($"z")).as("sz"))
      .collect()
    assert(spans.length > 8)
    Seq(1, 2, 3).foreach { c =>
      val avg = spans.map(_.getLong(c)).sum.toDouble / spans.length
      assert(avg < 70000, s"dim $c not localised: avg span $avg of 100000")
    }
    assert(spark.read.parquet(dir).count() == 30000)
    // curveWrite dispatches 3-D hilbert to the same path
    val dir2 = java.nio.file.Files.createTempDirectory("graft_hn2_").toString
    ZOrder.curveWrite(in, dir2, Seq("x", "y", "z"), bits = 8,
      numFiles = 8, mode = "overwrite", curve = "hilbert")
    assert(spark.read.parquet(dir2).count() == 30000)
  }
}
