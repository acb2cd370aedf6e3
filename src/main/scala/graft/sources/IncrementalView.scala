package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTALLY-MAINTAINED MATERIALIZED AGGREGATE over a
  * merge-on-read lake — the Databricks/Delta "materialized view"
  * shape, built on [[DeletionVectors.readMorChanges]]: the view is
  * `SELECT groupCols…, count(*) AS n, sum(c) AS sum_c… GROUP BY
  * groupCols`, and [[refresh]] advances it by aggregating ONLY the
  * row-level change feed since the last refresh — cost ∝ churn, never
  * ∝ lake — then re-merging the signed per-group deltas into the
  * stored rows (one union + re-aggregate; count/sum are
  * self-inverse under ±1 signing, and a group whose count reaches 0
  * provably has zero sums too on integral columns, so it simply
  * drops). Bit-exact vs a full recompute for integral sum columns
  * (long arithmetic is associative); fractional columns would carry
  * float-order noise — keep those in full-recompute views.
  *
  * CONSISTENCY — the race the `to` pin exists for: refresh captures
  * the head [[DeletionVectors.MorCursor]] FIRST, computes the feed
  * `from → head` pinned at BOTH ends, and stores `head` as the new
  * cursor in the SAME atomic publish as the view rows. A mutation
  * landing mid-refresh falls entirely AFTER the pinned window and is
  * picked up next time — never split, never double-applied.
  *
  * ATOMICITY — pointer-file generations, no rename-over-existing:
  * each refresh writes a fresh `gen-<uuid>/` (view parquet + cursor
  * text), then publishes `<n+1>.current` (atomic create of a fresh
  * name, exactly the checkpoint-generation trick [[CommitLog]] uses).
  * Readers take the highest pointer. A crash before the pointer
  * leaves an unreferenced gen dir (swept by the next refresh) and the
  * OLD view+cursor pair intact — re-running applies the same window
  * once, because the cursor only advances with the pointer.
  *
  * DEGRADATION — when the feed's soundness guard trips (a physical
  * rewrite — CoW DML, OPTIMIZE, compaction — retired cursor-era
  * names), refresh falls back to a FULL rebuild at the pinned head:
  * always correct, just not incremental — the same contract as
  * Delta's materialized-view maintenance on non-incrementalizable
  * changes. */
object IncrementalView {

  /** `(mode, groupsTouched)`: mode is "full" or "incremental";
    * groupsTouched counts the groups the refresh re-wrote (full = all
    * view groups, incremental = groups with a non-empty delta). */
  final case class RefreshStats(mode: String, groupsTouched: Long)

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest live pointer as (n, gen-dir name), if any. */
  private def currentPointer(fs: FileSystem,
      viewDir: String): Option[(Long, String)] = {
    val d = new Path(viewDir)
    if (!fs.exists(d)) return None
    fs.listStatus(d).iterator.map(_.getPath.getName)
      .filter(_.endsWith(".current"))
      .map { n => n.stripSuffix(".current").toLong }
      .toSeq.sorted.lastOption.map { n =>
        val in = fs.open(new Path(viewDir, s"$n.current"))
        try {
          val buf = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
          (n, new String(buf.toByteArray, UTF_8).trim)
        } finally in.close()
      }
  }

  /** The materialized rows of the current generation. */
  def readView(spark: SparkSession, viewDir: String): DataFrame = {
    val fs = fsOf(spark, viewDir)
    val (_, gen) = currentPointer(fs, viewDir).getOrElse(
      throw new IllegalArgumentException(
        s"readView: $viewDir has no published generation — refresh first"))
    spark.read.parquet(s"$viewDir/$gen/data")
  }

  private def readCursor(fs: FileSystem, viewDir: String,
      gen: String): DeletionVectors.MorCursor = {
    val in = fs.open(new Path(s"$viewDir/$gen", "cursor"))
    val lines =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        new String(buf.toByteArray, UTF_8).split("\n").iterator
          .map(_.trim).filter(_.nonEmpty).toSeq
      } finally in.close()
    DeletionVectors.MorCursor(
      lines.filter(_.startsWith("file ")).map(_.substring(5)).toSet,
      lines.filter(_.startsWith("dv ")).map(_.substring(3)).toSet)
  }

  private def aggOf(rows: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame =
    rows.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)

  /** Advance the view to the lake's current version. Returns what it
    * did; `failBeforePublish` injects a crash between the generation
    * write and the pointer publish (spec hook — proves the old
    * view+cursor pair survives any crash). */
  def refresh(spark: SparkSession, lakeDir: String, viewDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      failBeforePublish: Boolean = false): RefreshStats = {
    require(groupCols.nonEmpty, "refresh needs at least one group column")
    val fs = fsOf(spark, viewDir)
    // pin the window's upper end FIRST — see the consistency note
    val head = DeletionVectors.cursor(spark, lakeDir)
    val cur = currentPointer(fs, viewDir)
    val (mode, rows, touched) = cur match {
      case None =>
        val full = aggOf(DeletionVectors.readMorAt(spark, lakeDir, head),
          groupCols, sumCols).localCheckpoint()
        ("full", full, full.count())
      case Some((_, gen)) =>
        val from = readCursor(fs, viewDir, gen)
        val old = readView(spark, viewDir)
        try {
          val changes = DeletionVectors.readMorChanges(spark, lakeDir,
            from, to = Some(head))
          val sign = when(col("_change_type") === "insert", 1L)
            .otherwise(-1L)
          val delta = changes.groupBy(groupCols.map(col): _*).agg(
            sum(sign).as("n"),
            sumCols.map(c =>
              sum(col(c) * sign).as(s"sum_$c")): _*)
            .localCheckpoint()
          val deltaGroups = delta.count()
          val merged = old.unionByName(delta)
            .groupBy(groupCols.map(col): _*).agg(
              sum(col("n")).as("n"),
              sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
            .filter(col("n") > 0)
          ("incremental", merged, deltaGroups)
        } catch {
          // the feed's soundness guard: a physical rewrite broke
          // row-level tracking — rebuild at the pinned head instead.
          // Matched by TYPE, never by message text: any other
          // IllegalArgumentException (e.g. the empty-lake guard) is a
          // real error and must propagate, not silently degrade.
          case _: DeletionVectors.CursorInvalidatedException =>
            val full = aggOf(
              DeletionVectors.readMorAt(spark, lakeDir, head),
              groupCols, sumCols).localCheckpoint()
            ("full", full, full.count())
        }
    }
    // write the new generation aside, then publish one pointer
    val gen = s"gen-${java.util.UUID.randomUUID()}"
    rows.coalesce(1).write.parquet(s"$viewDir/$gen/data")
    val cursorBytes = (
      head.files.toSeq.sorted.map("file " + _) ++
        head.dvFiles.toSeq.sorted.map("dv " + _)).mkString("\n")
    val out = fs.create(new Path(s"$viewDir/$gen", "cursor"), false)
    try out.write(cursorBytes.getBytes(UTF_8)) finally out.close()
    if (failBeforePublish)
      throw new RuntimeException("injected crash before pointer publish")
    val n = cur.map(_._1 + 1).getOrElse(0L)
    val ptr = fs.create(new Path(viewDir, s"$n.current"), false)
    try ptr.write(gen.getBytes(UTF_8)) finally ptr.close()
    // sweep: older pointers, then generations no live pointer names
    fs.listStatus(new Path(viewDir)).iterator
      .map(_.getPath.getName).filter(_.endsWith(".current"))
      .filter(_.stripSuffix(".current").toLong < n)
      .foreach { p => fs.delete(new Path(viewDir, p), false); () }
    val live = currentPointer(fs, viewDir).map(_._2).toSet
    fs.listStatus(new Path(viewDir)).iterator
      .map(_.getPath.getName)
      .filter(g => g.startsWith("gen-") && !live.contains(g))
      .foreach { g => fs.delete(new Path(viewDir, g), true); () }
    RefreshStats(mode, touched)
  }
}
