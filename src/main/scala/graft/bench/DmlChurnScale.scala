package graft.bench

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{CommitLog, MergeInto, StatsIndex}

/** FIXED-churn DML scaling (r7 VERDICT ask #4): the `MergeInto` scale
  * contract — *a small merge against a big lake costs O(touched
  * files), not O(lake)* — measured directly, churn held CONSTANT
  * while the lake grows 1× → 10×.
  *
  * [[CatalogScale]]'s q57 cell scales the whole closure (10× ingest +
  * 10× updates), so its ~linear exponent measures ingest, not the
  * contract. Here each scale gets a freshly built committed lake of
  * lineitem rows range-clustered on `l_orderkey` (file count grows
  * with the lake — constant target file size, the real lake shape)
  * with a bloom-armed stats index, and the SAME 1000-key update batch
  * is merged into both; only the merge is timed. Reported per cell:
  * wall seconds, filesRewritten / filesCarried (the boundedness
  * proof: rewrites stay flat while carried grows 10×), and the 1×→10×
  * exponent. The merge includes everything a production mutation
  * pays: discovery (index key-set prune → semi-join over candidates),
  * rewrite of touched files, checkpoint publish, orphan sweep, and
  * the per-mutation index refresh.
  *
  * Run AFTER any bench artifact is written (replica builds evict the
  * page cache): `sbt "runMain graft.bench.DmlChurnScale [reps]"`.
  * Results land in SCALE.md §"Fixed-churn DML".
  */
object DmlChurnScale {

  import BenchUtil.{rmrf, secs => t}

  /** Build a committed, bloom-indexed lake from `src`'s lineitem with
    * `files` range-clustered files; returns the lake root. With
    * `stringKey`, a `doc_key` string column derived from the order
    * key is added, clustered and bloom-indexed instead — the doc-lake
    * shape where the natural key is a string. */
  private def buildLake(spark: SparkSession, src: String, tag: String,
      files: Int, stringKey: Boolean = false): String = {
    val root = s"/root/repo/target/scale/dml_$tag"
    rmrf(root)
    val lake = s"$root/lake"
    val base = spark.read.parquet(s"$src/lineitem.parquet")
    val (df, key) =
      if (stringKey) (base.withColumn("doc_key",
        concat(lit("doc-"), lpad(col("l_orderkey").cast("string"),
          10, "0"))), "doc_key")
      else (base, "l_orderkey")
    df.repartitionByRange(files, col(key)).write.parquet(lake)
    val fs = new Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    CommitLog.commit(fs, lake, 0L,
      CommitLog.dataFileNames(fs, lake).toSeq.sorted)
    // bloom sized to the per-file key count (~37k at BOTH scales —
    // constant target file size means constant filter size; the lake
    // grows in FILE COUNT): an oversized filter would inflate the
    // per-mutation index-refresh I/O and misattribute it to the merge
    StatsIndex.build(spark, lake, Seq(key), s"$root/idx",
      bloomCols = Seq(key), bloomItems = 100000, bloomFpp = 0.01)
    root
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(2)
    // optional "only=<probe>" arg: re-measure one probe's cells
    val only = args.find(_.startsWith("only=")).map(_.substring(5))
    def want(name: String): Boolean = only.forall(_ == name)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf01 = "/root/testdata/sf0.1"
    val tenx = CatalogScale.ensure10x(spark, sf01)

    // the CONSTANT churn: 1000 low orderkeys — present (in copy 0)
    // at BOTH scales; updates are full lake rows, unique on the key
    import spark.implicits._
    val keys = spark.read.parquet(s"$sf01/lineitem.parquet")
      .select(col("l_orderkey")).distinct()
      .orderBy(col("l_orderkey")).limit(1000).as[Long].collect().toSeq
    val updates = spark.read.parquet(s"$sf01/lineitem.parquet")
      .filter(col("l_orderkey").isin(keys: _*))
      .dropDuplicates("l_orderkey")
      .withColumn("l_quantity", col("l_quantity") + 100)
      .localCheckpoint() // freeze: identical input frame at both scales

    val updatesS = updates.withColumn("doc_key",
      concat(lit("doc-"), lpad(col("l_orderkey").cast("string"),
        10, "0"))).localCheckpoint()

    // JIT-warm BOTH merge paths untimed on throwaway tiny lakes —
    // warming only the integral path would charge the string probe's
    // first 1x rep with prunedForKeysString's first-use compile cost
    // and bias its exponent downward
    val warm = buildLake(spark, "/root/testdata/sf0.001", "warm", 2)
    MergeInto.merge(spark, s"$warm/lake", updates, Seq("l_orderkey"),
      indexDir = Some(s"$warm/idx")): Unit
    val warmS = buildLake(spark, "/root/testdata/sf0.001", "warms", 2,
      stringKey = true)
    MergeInto.merge(spark, s"$warmS/lake", updatesS, Seq("doc_key"),
      indexDir = Some(s"$warmS/idx")): Unit

    def probe(name: String, stringKey: Boolean,
        upd: org.apache.spark.sql.DataFrame, key: String): Unit = {
      println(s"""{"probe":"$name","cells":[""")
      // leading comma on every element but the first keeps the streamed
      // progress output valid JSON (a trailing comma after the last
      // element would break standard parsers)
      val cells = Seq(("1x", sf01, 16), ("10x", tenx, 160)).zipWithIndex
        .map { case ((tag, src, files), i) =>
          // fresh lake per rep: each merge mutates the lake, so only a
          // rebuild gives every rep the same starting state
          val outcomes = (1 to reps).map { _ =>
            val root = buildLake(spark, src, s"${name}_$tag", files,
              stringKey)
            var counts = (0, 0)
            val sec = t {
              counts = MergeInto.merge(spark, s"$root/lake", upd,
                Seq(key), indexDir = Some(s"$root/idx"))
            }
            (sec, counts)
          }
          val best = outcomes.minBy(_._1)
          val l = f"""{"cell":"$tag","files":$files,""" +
            f""""merge_sec":${best._1}%.2f,"rewritten":${best._2._1},""" +
            f""""carried":${best._2._2}}"""
          println("  " + (if (i > 0) "," else "") + l)
          (tag, best._1)
      }
      val exp = math.log10(cells(1)._2 / cells(0)._2)
      println("]," + f""""exponent":$exp%.2f}""")
      println(f"[$name] done: exponent $exp%.2f (1.0 = linear, " +
        "<=0.3 = the O(touched) contract)")
    }

    if (want("dml_churn"))
      probe("dml_churn", stringKey = false, updates, "l_orderkey")
    // the DOC-LAKE shape: same constant churn, string doc_key —
    // discovery through prunedForKeysString's bloom arm
    if (want("dml_churn_string"))
      probe("dml_churn_string", stringKey = true, updatesS, "doc_key")

    // MERGE-ON-READ fixed churn (r8 VERDICT ask #1): the same constant
    // 1000-key batch upserted through DeletionVectors.mergeMor — zero
    // data files rewritten BY CONSTRUCTION (matched positions die in
    // the sidecar, all update rows append as one delta file), so the
    // 1×→10× exponent isolates what remains: index key-set discovery,
    // the sidecar write, the atomic publish and the index refresh.
    import graft.sources.DeletionVectors
    if (want("dml_churn_mor")) {
    locally {
      val w = buildLake(spark, "/root/testdata/sf0.001", "warmm", 2)
      DeletionVectors.mergeMor(spark, s"$w/lake", updates,
        Seq("l_orderkey"), indexDir = Some(s"$w/idx")): Unit
    }
    println("""{"probe":"dml_churn_mor","cells":[""")
    val morCells = Seq(("1x", sf01, 16), ("10x", tenx, 160)).zipWithIndex
      .map { case ((tag, src, files), i) =>
        val outcomes = (1 to reps).map { _ =>
          val root = buildLake(spark, src, s"mor_$tag", files)
          var counts = (0L, 0L)
          val sec = t {
            counts = DeletionVectors.mergeMor(spark, s"$root/lake",
              updates, Seq("l_orderkey"), indexDir = Some(s"$root/idx"))
          }
          (sec, counts)
        }
        val best = outcomes.minBy(_._1)
        val l = f"""{"cell":"$tag","files":$files,""" +
          f""""merge_sec":${best._1}%.2f,"matched":${best._2._1},""" +
          f""""appended":${best._2._2},"rewritten":0}"""
        println("  " + (if (i > 0) "," else "") + l)
        (tag, best._1)
    }
    val morExp = math.log10(morCells(1)._2 / morCells(0)._2)
    println("]," + f""""exponent":$morExp%.2f}""")
    println(f"[dml_churn_mor] done: exponent $morExp%.2f")
    }

    // ROW-LEVEL CDC + VIEW MAINTENANCE, fixed churn: the same constant
    // 1000-key window upserted merge-on-read (untimed setup, as is the
    // view's initial full build), then TIMED: (a) materializing the
    // row-level change feed (readMorChanges count over its ~2000
    // insert+delete rows) and (b) the incremental view refresh that
    // folds the window into a per-returnflag aggregate. Both read only
    // the window's delta files + the files its new pairs name, so the
    // 1×→10× exponents measure the "cost ∝ churn, not lake" contract
    // the q74/q75 catalog cells claim.
    import graft.sources.IncrementalView
    if (want("cdc_churn")) {
    locally {
      val w = buildLake(spark, "/root/testdata/sf0.001", "warmc", 2)
      IncrementalView.refresh(spark, s"$w/lake", s"$w/view",
        Seq("l_returnflag"), Seq("l_quantity")): Unit
      val cur = DeletionVectors.cursor(spark, s"$w/lake")
      DeletionVectors.mergeMor(spark, s"$w/lake", updates,
        Seq("l_orderkey"), indexDir = Some(s"$w/idx")): Unit
      DeletionVectors.readMorChanges(spark, s"$w/lake", cur)
        .count(): Unit
      IncrementalView.refresh(spark, s"$w/lake", s"$w/view",
        Seq("l_returnflag"), Seq("l_quantity")): Unit
    }
    println("""{"probe":"cdc_churn","cells":[""")
    val cdcCells = Seq(("1x", sf01, 16), ("10x", tenx, 160)).zipWithIndex
      .map { case ((tag, src, files), i) =>
        val outcomes = (1 to reps).map { _ =>
          val root = buildLake(spark, src, s"cdc_$tag", files)
          IncrementalView.refresh(spark, s"$root/lake", s"$root/view",
            Seq("l_returnflag"), Seq("l_quantity")): Unit
          val cur = DeletionVectors.cursor(spark, s"$root/lake")
          DeletionVectors.mergeMor(spark, s"$root/lake", updates,
            Seq("l_orderkey"), indexDir = Some(s"$root/idx")): Unit
          var feedRows = 0L
          val feedSec = t {
            feedRows = DeletionVectors
              .readMorChanges(spark, s"$root/lake", cur).count()
          }
          var st: IncrementalView.RefreshStats = null
          val refSec = t {
            st = IncrementalView.refresh(spark, s"$root/lake",
              s"$root/view", Seq("l_returnflag"), Seq("l_quantity"))
          }
          require(st.mode == "incremental",
            s"cdc_churn: refresh fell back to ${st.mode}")
          (feedSec, refSec, feedRows)
        }
        val best = outcomes.minBy(o => o._1 + o._2)
        val l = f"""{"cell":"$tag","files":$files,""" +
          f""""feed_sec":${best._1}%.2f,"feed_rows":${best._3},""" +
          f""""refresh_sec":${best._2}%.2f,"mode":"incremental"}"""
        println("  " + (if (i > 0) "," else "") + l)
        (best._1, best._2)
    }
    println("]," +
      f""""feed_exponent":${math.log10(cdcCells(1)._1 / cdcCells(0)._1)}%.2f,""" +
      f""""refresh_exponent":${math.log10(cdcCells(1)._2 / cdcCells(0)._2)}%.2f}""")
    println("[cdc_churn] done")
    }

    // SPARSE delete, DV vs CoW: a ~0.17% delete spread across EVERY
    // file (l_orderkey % 599 = 17) is copy-on-write's worst case —
    // every file is touched, so CoW rewrites the whole lake — and
    // merge-on-read's best: the vectors are a tiny (file, pos)
    // sidecar. Same lakes, both verbs timed at 1× and 10×.
    if (want("dv_vs_cow_sparse_delete")) {
    val sparsePred = "l_orderkey % 599 = 17"
    // JIT-warm both delete paths untimed
    locally {
      val w = buildLake(spark, "/root/testdata/sf0.001", "warmd", 2)
      DeletionVectors.deleteMor(spark, s"$w/lake", sparsePred): Unit
      val w2 = buildLake(spark, "/root/testdata/sf0.001", "warmd2", 2)
      MergeInto.delete(spark, s"$w2/lake", sparsePred): Unit
    }
    println("""{"probe":"dv_vs_cow_sparse_delete","cells":[""")
    val dvCells = Seq(("1x", sf01, 16), ("10x", tenx, 160)).zipWithIndex
      .map { case ((tag, src, files), i) =>
        val rootDv = buildLake(spark, src, s"dv_$tag", files)
        val dvSec = t {
          DeletionVectors.deleteMor(spark, s"$rootDv/lake", sparsePred)
        }
        val rootCow = buildLake(spark, src, s"cow_$tag", files)
        var rw = (0, 0)
        val cowSec = t {
          rw = MergeInto.delete(spark, s"$rootCow/lake", sparsePred)
        }
        val l = f"""{"cell":"$tag","files":$files,"dv_sec":$dvSec%.2f,""" +
          f""""cow_sec":$cowSec%.2f,"cow_rewritten":${rw._1}}"""
        println("  " + (if (i > 0) "," else "") + l)
        (dvSec, cowSec)
    }
    println("]," +
      f""""dv_exponent":${math.log10(dvCells(1)._1 / dvCells(0)._1)}%.2f,""" +
      f""""cow_exponent":${math.log10(dvCells(1)._2 / dvCells(0)._2)}%.2f}""")
    println("[dv_vs_cow_sparse_delete] done")
    }

    // RESTORE is metadata-only: append a committed junk batch, then
    // TIME CommitLog.restore rolling it back — resolution is one log
    // listing + record reads, the existence check one directory
    // listing, the publish one checkpoint write. Nothing touches data
    // bytes, so the 1×→10× cost moves only with the FILE-NAME count
    // (16 → 160 names through the listing and the record write) —
    // the exponent should sit near zero, the direct evidence for
    // "rolling back a 100 TB lake costs milliseconds". Reps reuse one
    // lake per scale: each rep appends fresh junk and restores to the
    // pre-junk id (rep 1 exercises the reconstruction arm, later reps
    // the exact-mutation-checkpoint arm — both are the same
    // listing/read/write shape). The horizon-0 vacuum after the last
    // rep is timed too: O(orphans swept), not O(lake).
    if (want("restore_flat")) {
    println("""{"probe":"restore_flat","cells":[""")
    val junk = spark.read.parquet(s"$sf01/lineitem.parquet")
      .limit(1000).localCheckpoint()
    val rsCells = Seq(("1x", sf01, 16), ("10x", tenx, 160)).zipWithIndex
      .map { case ((tag, src, files), i) =>
        val root = buildLake(spark, src, s"rs_$tag", files)
        val lake = s"$root/lake"
        val fs = new Path(lake)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val secs = (1 to math.max(reps, 3)).map { _ =>
          val target = CommitLog.maxCommittedId(fs, lake)
          val before = CommitLog.dataFileNames(fs, lake)
          junk.write.mode("append").parquet(lake)
          CommitLog.commit(fs, lake, target + 1,
            (CommitLog.dataFileNames(fs, lake) -- before).toSeq.sorted)
          t { CommitLog.restore(fs, lake, target): Unit }
        }
        var sweptN = 0
        val vacSec = t {
          sweptN = CommitLog.vacuum(fs, lake, olderThanMs = 0L).size
        }
        val best = secs.min
        val l = f"""{"cell":"$tag","files":$files,""" +
          f""""restore_sec":$best%.3f,"vacuum_sec":$vacSec%.2f,""" +
          f""""vacuum_swept":$sweptN}"""
        println("  " + (if (i > 0) "," else "") + l)
        best
    }
    println("]," +
      f""""exponent":${math.log10(rsCells(1) / rsCells(0))}%.2f}""")
    println("[restore_flat] done")
    }

    // SHALLOW CLONE is metadata-only: one source-log read + one
    // pointer write + one bootstrap record, never data bytes — the
    // 1×→10× cost moves only with the file-NAME count (16 → 160
    // names through one record write), so the exponent should sit
    // near zero: the direct evidence for "branching a 100 TB table
    // costs milliseconds". A CONSTANT ~25-key update (l_orderkey %
    // 5999 = 17 over the 1x key space, identical frame at both
    // scales) is merged against each BRANCH and, from the same base
    // view, against the PLAIN lake — both UN-indexed, so the
    // branch/plain delta isolates exactly what the clone's
    // resolution layer (one local listing + one pointer probe per
    // read) costs, and the branch exponent shows DML keeps the
    // O(touched-files) shape. NOT comparable to merge_churn's cells:
    // different key count and no index acceleration here.
    if (want("clone_flat")) {
    println("""{"probe":"clone_flat","cells":[""")
    import graft.sources.Clone
    val updates = spark.read.parquet(s"$sf01/lineitem.parquet")
      .filter(col("l_orderkey") % 5999 === 17)
      .dropDuplicates("l_orderkey")
      .withColumn("l_quantity", col("l_quantity") + 100)
      .localCheckpoint()
    val clCells = Seq(("1x", sf01, 16), ("10x", tenx, 160)).zipWithIndex
      .map { case ((tag, src, files), i) =>
        val root = buildLake(spark, src, s"cl_$tag", files)
        val lake = s"$root/lake"
        val branch = s"$root/branch"
        val cloneSec = t { Clone.shallow(spark, lake, branch): Unit }
        var rw = (0, 0)
        val mergeSec = t {
          rw = MergeInto.merge(spark, branch, updates, Seq("l_orderkey"))
        }
        // the un-indexed plain-lake twin of the SAME merge from the
        // SAME base view (the branch cloned before this mutates it):
        // the branch/plain delta isolates what resolution costs
        var rwP = (0, 0)
        val plainSec = t {
          rwP = MergeInto.merge(spark, lake, updates, Seq("l_orderkey"))
        }
        val l = f"""{"cell":"$tag","files":$files,""" +
          f""""clone_sec":$cloneSec%.3f,"branch_merge_sec":$mergeSec%.2f,""" +
          f""""plain_merge_sec":$plainSec%.2f,""" +
          f""""rewritten":${rw._1},"carried":${rw._2},""" +
          f""""plain_rewritten":${rwP._1}}"""
        println("  " + (if (i > 0) "," else "") + l)
        (cloneSec, mergeSec)
    }
    println("]," +
      f""""clone_exponent":${math.log10(clCells(1)._1 / clCells(0)._1)}%.2f,""" +
      f""""branch_merge_exponent":${
        math.log10(clCells(1)._2 / clCells(0)._2)}%.2f}""")
    println("[clone_flat] done")
    }
    spark.stop()
  }
}
