package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** The codegen'd dot_f32 expression: bit-equality with the HOF double
  * fold it replaced, null handling, and actual codegen compilation. */
class FloatDotSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = (1 to 200).map { i =>
    (i.toLong,
      Array.tabulate(32)(j => (math.sin(i * 31 + j) * 10).toFloat),
      Array.tabulate(32)(j => (math.cos(i * 17 + j) * 10).toFloat))
  }.toDF("id", "a", "b")

  test("dot (codegen) is bit-identical to the HOF double fold") {
    val rows = vecs.select(
      VectorFunctions.dot($"a", $"b").as("fast"),
      VectorFunctions.dotHof($"a", $"b").as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null semantics: null array -> null, null element contributes 0") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (2L, null.asInstanceOf[Array[Float]], Array(3.0f, 4.0f))
    ).toDF("id", "a", "b")
    val out = df.select($"id", VectorFunctions.dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(11.0))
    assert(out(2L).isEmpty)
    // element-level null: build via sql array with nulls
    val withNullElem = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS a, " +
        "array(CAST(5.0 AS FLOAT), CAST(7.0 AS FLOAT)) AS b")
    val d = withNullElem
      .select(VectorFunctions.dot(col("a"), col("b")).as("d"))
      .head.getDouble(0)
    assert(d == 5.0)
  }

  test("doGenCode actually compiles (CODEGEN_ONLY factory mode)") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val s = vecs.select(VectorFunctions.dot($"a", $"b").as("d"))
        .agg(sum($"d")).head.getDouble(0)
      assert(!s.isNaN)
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("dot_f32 is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("float_vecs")
    val viaSql = spark.sql(
      "SELECT id, dot_f32(a, b) AS d FROM float_vecs ORDER BY id")
      .collect().map(_.getDouble(1))
    val viaCol = vecs.select($"id", VectorFunctions.dot($"a", $"b"))
      .orderBy($"id").collect().map(_.getDouble(1))
    assert(viaSql.toSeq == viaCol.toSeq)
  }
}
