package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{CsvBarSource, JsonlRoundTrip, OrcRoundTrip, ParquetRoundTrip}

class SourcesSpec extends SparkSpec {

  private def writeCsv(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_csv_").toFile
    val f = new java.io.File(dir, "bars.csv")
    val w = new java.io.PrintWriter(f)
    lines.foreach(w.println)
    w.close()
    f.getAbsolutePath
  }

  private val smallSchema = StructType(Seq(
    StructField("date", TimestampType),
    StructField("close", DoubleType),
    StructField("high", DoubleType)))

  test("csv source: header + explicit schema (S1)") {
    val path = writeCsv(Seq(
      "date,close,high",
      "2020-01-06 09:30:00,100.5,101.0",
      "2020-01-06 09:31:00,100.6,101.2"))
    val df = CsvBarSource.load(spark, path, schema = smallSchema)
    assert(df.schema == smallSchema)
    assert(df.count() == 2)
    assert(df.agg(max("close")).head.getDouble(0) == 100.6)
  }

  test("csv source: inference mode and limit smoke path (S2)") {
    val path = writeCsv(Seq(
      "date,close,high",
      "2020-01-06 09:30:00,100.5,101.0",
      "2020-01-06 09:31:00,100.6,101.2",
      "2020-01-06 09:32:00,100.7,101.3"))
    val df = CsvBarSource.load(spark, path, inferSchema = true,
      limit = Some(2))
    assert(df.count() == 2)
    assert(df.schema("close").dataType == DoubleType)
  }

  test("orc round-trip: schema, values, predicate pushdown to the scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_orc_").toString + "/t"
    val in = (1 to 100).map(i => (i.toLong, i * 2.5, s"s$i"))
      .toDF("id", "v", "s")
    OrcRoundTrip.write(in, dir, bloomCols = Seq("id"))
    val back = OrcRoundTrip.read(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      in.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq ==
      in.orderBy("id").collect().toSeq)
    // the filter must reach the ORC scan (stripe-stat pruning at scale)
    val plan = back.filter($"id" === 42L).select($"v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("42"),
      s"filter not pushed to ORC scan:\n$plan")
    // a catalog query runs unchanged over an ORC-backed documents table
    val docsOrc = Files.createTempDirectory("graft_orc_docs_").toString
    spark.read.parquet(sf("documents"))
      .write.mode("overwrite").orc(s"$docsOrc/documents.orc")
    val viaOrc = spark.read.orc(s"$docsOrc/documents.orc")
      .select($"doc_id", graft.operators.Dedup.simhash($"text").as("sh"))
      .orderBy($"doc_id").collect()
    val viaPq = spark.read.parquet(sf("documents"))
      .select($"doc_id", graft.operators.Dedup.simhash($"text").as("sh"))
      .orderBy($"doc_id").collect()
    assert(viaOrc.toSeq == viaPq.toSeq)
  }

  test("parquet round-trip preserves schema and values (S3/S4)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pq_").toString + "/t"
    val in = Seq((1L, 2.5, "a"), (2L, 3.5, "b")).toDF("id", "v", "s")
    ParquetRoundTrip.write(in, dir)
    val back = ParquetRoundTrip.read(spark, dir)
    // parquet reads back nullable; names and types must round-trip
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      in.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq ==
      in.orderBy("id").collect().toSeq)
  }

  test("partitioned lake: partition filter prunes at the scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_lake_").toString + "/t"
    val in = (1 to 100).map(i => (i.toLong, s"2020-01-0${i % 5 + 1}", i * 1.5))
      .toDF("id", "day", "v")
    graft.sources.PartitionedLake.write(in, dir, Seq("day"))
    val q = graft.sources.PartitionedLake.read(spark, dir)
      .filter($"day" === "2020-01-03")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("2020-01-03"), plan)
    assert(q.count() == in.filter($"day" === "2020-01-03").count())
  }

  test("clustered write: each file covers a disjoint narrow key range") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_clus_").toString + "/t"
    val in = (1 to 10000).map(i => ((i * 7919) % 100L, i.toLong))
      .toDF("key", "payload")
    graft.sources.PartitionedLake.writeClustered(in, dir, Seq("key"),
      numFiles = 4)
    // per-file min/max of the cluster key must not overlap across files
    // (that disjointness is exactly what row-group stats pruning needs)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min($"key").as("lo"), max($"key").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("jsonl round-trip with explicit schema (no inference scan)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_jl_").toString + "/t"
    val in = Seq((1L, 2.5, "a"), (2L, 3.5, "b")).toDF("id", "v", "s")
    JsonlRoundTrip.write(in, dir)
    val back = JsonlRoundTrip.read(spark, dir, Some(in.schema))
      .select("id", "v", "s")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      in.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq ==
      in.orderBy("id").collect().toSeq)
  }
}
