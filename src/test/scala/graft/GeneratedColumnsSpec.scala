package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{Clone, CommitLog, DeletionVectors, GeneratedColumns, MergeInto}
import graft.streaming.LayoutSink

/** GENERATED ALWAYS AS columns: write frames omitting a defined
  * column get it COMPUTED (fill — ingest and both merge verbs), a
  * frame supplying drifted values is REJECTED pre-publish (the same
  * atomicity as the CHECK gate), UPDATE verbs RECOMPUTE the
  * expression over the post-SET row and refuse SET of a generated
  * column, and definitions travel with shallow clones. Oracle twin:
  * `q80_generated`. */
class GeneratedColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed lake of (k, body, blen) rows with blen = length(body). */
  private def mkLake(n: Int = 300): String = {
    val lake = Files.createTempDirectory("graft_gc_").toString + "/lake"
    val f = fs(lake)
    (0 until n).map(i => (i.toLong, "x" * (1 + i % 7)))
      .toDF("k", "body")
      .withColumn("blen", length(col("body")).cast("long"))
      .coalesce(2).write.parquet(lake)
    CommitLog.commit(f, lake, 0L,
      CommitLog.dataFileNames(f, lake).toSeq.sorted)
    GeneratedColumns.add(spark, lake, "blen", "length(body)")
    lake
  }

  test("add validates existing rows and requires the column to exist; " +
    "a drifted lake rejects naming sample rows; duplicates fail") {
    val lake = mkLake()
    assert(GeneratedColumns.list(fs(lake), lake) ==
      Seq(("blen", "length(body)", "BIGINT")))
    intercept[IllegalArgumentException] {
      GeneratedColumns.add(spark, lake, "blen", "length(body)") // dup
    }
    intercept[IllegalArgumentException] {
      GeneratedColumns.add(spark, lake, "nope", "length(body)") // absent
    }
    // a DRIFTED definition is rejected with samples
    val e = intercept[GeneratedColumns.GeneratedColumnViolation] {
      GeneratedColumns.add(spark, lake, "k", "blen * 100")
    }
    assert(e.column == "k" && e.samples.nonEmpty)
    assert(GeneratedColumns.list(fs(lake), lake).size == 1)
  }

  test("ingest FILL: a batch omitting the column gets it computed; a " +
    "batch supplying drifted values is rejected pre-publish") {
    val dir = Files.createTempDirectory("graft_gci_").toString
    val lake = s"$dir/lake"
    def process(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      LayoutSink.processBatch(df, id, lake, s"$dir/idx", Seq("k"),
        bits = 8, filesPerBatch = 2, curve = "morton")
    process((0 until 100).map(i => (i.toLong, "y" * (1 + i % 5)))
      .toDF("k", "body")
      .withColumn("blen", length(col("body")).cast("long")), 0)
    GeneratedColumns.add(spark, lake, "blen", "length(body)")
    // omit blen entirely: the fill computes it
    process((100 until 150).map(i => (i.toLong, "zz")).toDF("k", "body"),
      1)
    val got = LayoutSink.readCommitted(spark, lake)
    assert(got.count() == 150)
    assert(got.filter(col("blen") =!= length(col("body"))).count() == 0)
    // supply a WRONG blen: rejected before the commit, view untouched
    val e = intercept[GeneratedColumns.GeneratedColumnViolation] {
      process((150 until 160).map(i => (i.toLong, "w"))
        .toDF("k", "body").withColumn("blen", lit(-1L)), 2)
    }
    assert(e.column == "blen")
    assert(LayoutSink.readCommitted(spark, lake).count() == 150)
  }

  test("CoW merge FILLS omitted generated columns and rejects " +
    "supplied drift; update RECOMPUTES and refuses SET of one") {
    val lake = mkLake()
    // updates WITHOUT blen: filled, both for the matched rewrite and
    // the insert
    MergeInto.merge(spark, lake,
      Seq((7L, "longerbody"), (999L, "abc")).toDF("k", "body"), Seq("k"))
    val got = LayoutSink.readCommitted(spark, lake)
    assert(got.count() == 301)
    assert(got.filter(col("k") === 7L).head.getLong(2) == 10L)
    assert(got.filter(col("k") === 999L).head.getLong(2) == 3L)
    assert(got.filter(col("blen") =!= length(col("body"))).count() == 0)
    // updates WITH a drifted blen: rejected, view untouched
    intercept[GeneratedColumns.GeneratedColumnViolation] {
      MergeInto.merge(spark, lake,
        Seq((8L, "bb")).toDF("k", "body").withColumn("blen", lit(77L)),
        Seq("k"))
    }
    assert(LayoutSink.readCommitted(spark, lake).count() == 301)
    // UPDATE of the dependency recomputes the generated column
    MergeInto.update(spark, lake, "k = 9",
      Map("body" -> "'replacement-body'"))
    val r9 = LayoutSink.readCommitted(spark, lake).filter(col("k") === 9L)
    assert(r9.head.getString(1) == "replacement-body" &&
      r9.head.getLong(2) == 16L)
    // SET of the generated column itself fails fast
    val e = intercept[IllegalArgumentException] {
      MergeInto.update(spark, lake, "k = 10", Map("blen" -> "5"))
    }
    assert(e.getMessage.contains("generated"))
  }

  test("MoR twins: mergeMor fills, updateMor recomputes, violations " +
    "leave the view and coverage untouched") {
    val lake = mkLake()
    DeletionVectors.mergeMor(spark, lake,
      Seq((7L, "longerbody"), (999L, "abc")).toDF("k", "body"), Seq("k"))
    val got = DeletionVectors.readMor(spark, lake)
    assert(got.count() == 301)
    assert(got.filter(col("blen") =!= length(col("body"))).count() == 0)
    intercept[GeneratedColumns.GeneratedColumnViolation] {
      DeletionVectors.mergeMor(spark, lake,
        Seq((8L, "bb")).toDF("k", "body").withColumn("blen", lit(77L)),
        Seq("k"))
    }
    assert(DeletionVectors.readMor(spark, lake).count() == 301)
    assert(DeletionVectors.updateMor(spark, lake, "k = 9",
      Map("body" -> "'replacement-body'")) == 1L)
    val r9 = DeletionVectors.readMor(spark, lake).filter(col("k") === 9L)
    assert(r9.head.getLong(2) == 16L)
    intercept[IllegalArgumentException] {
      DeletionVectors.updateMor(spark, lake, "k = 10",
        Map("blen" -> "5"))
    }
  }

  test("definitions travel with a shallow clone, then evolve " +
    "independently; drop frees the original") {
    val lake = mkLake()
    val branch = new Path(lake).getParent.toString + "/branch"
    Clone.shallow(spark, lake, branch)
    assert(GeneratedColumns.list(fs(branch), branch) ==
      Seq(("blen", "length(body)", "BIGINT")))
    // the inherited definition fills on the branch
    MergeInto.merge(spark, branch,
      Seq((999L, "abcd")).toDF("k", "body"), Seq("k"))
    assert(LayoutSink.readCommitted(spark, branch)
      .filter(col("k") === 999L).head.getLong(2) == 4L)
    GeneratedColumns.drop(spark, branch, "blen")
    assert(GeneratedColumns.list(fs(branch), branch).isEmpty)
    assert(GeneratedColumns.list(fs(lake), lake).size == 1)
  }

  test("validateFiles skips a definition its files cannot resolve " +
    "(pre-evolution batch = UNKNOWN), and add's induction base " +
    "rejects a NULL-backfilled evolved column") {
    val lake = mkLake()
    // a batch written under an OLDER schema (no body, no blen):
    // the definition cannot resolve against it — passes, exactly the
    // CHECK gate's UNKNOWN convention
    val before = CommitLog.dataFileNames(fs(lake), lake)
    Seq(Tuple1(5000L)).toDF("k").coalesce(1)
      .write.mode("append").parquet(lake)
    val fresh =
      (CommitLog.dataFileNames(fs(lake), lake) -- before).toSeq.sorted
    GeneratedColumns.validateFiles(spark, lake, fresh) // must not throw
    // an evolveSchema merge adds `extra` — carried files backfill NULL,
    // so defining extra = 5 now violates the induction base and is
    // rejected naming the NULL rows (backfill first, then define)
    MergeInto.merge(spark, lake,
      Seq((999L, "abc")).toDF("k", "body")
        .withColumn("blen", length(col("body")).cast("long"))
        .withColumn("extra", lit(5L)),
      Seq("k"), evolveSchema = true)
    val e = intercept[GeneratedColumns.GeneratedColumnViolation] {
      GeneratedColumns.add(spark, lake, "extra", "5")
    }
    assert(e.column == "extra")
  }
}
