package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** COPY-ON-WRITE `MERGE INTO` / `UPDATE` / `DELETE` over a
  * commit-logged lake — the mutation primitives Delta/Iceberg put
  * beside time travel and vacuum, built from the same [[CommitLog]]
  * records.
  *
  * The 100 TB shape: a mutation must NOT rewrite the table.
  * Touched-file discovery is a column-pruned pass over the lake's
  * key/predicate columns plus Spark's `_metadata.file_path`,
  * collecting at most #files names. Only files that actually contain
  * a matched row are rewritten (scan cost ∝ touched data); every
  * other file is carried into the new table version BY NAME, zero
  * I/O. The new version is published as one
  * [[CommitLog.commitCheckpoint]] — readers see the old table or the
  * new one, never a mix — and the replaced files are swept
  * immediately after the publish (still under the writer lock, so
  * nothing can be mid-write): the PLAIN directory read converges to
  * the committed view as soon as the mutation returns, instead of
  * double-counting until some later vacuum.
  *
  * Every mutation checkpoint is PUBLISHED AS A REWRITE (a
  * `.mutation.checkpoint` record): unlike OPTIMIZE/compaction — which
  * reshape files but preserve every row — a DML checkpoint CHANGES
  * row content in place at its batch id, so [[CommitLog
  * .committedNamesAt]] and [[CommitLog.changedNames]] detect it and
  * FAIL FAST instead of silently serving post-mutation data as a
  * pre-mutation snapshot or an empty CDC delta (see their docs for
  * the resync contract).
  *
  * Matched-key semantics are Delta's defaults: an update row whose
  * key exists REPLACES every lake row with that key (whenMatched
  * update-all); an update row whose key is absent is INSERTED
  * (whenNotMatched insert-all). Duplicate keys in `updates` fail
  * fast — each would race to replace the same row (Delta raises the
  * same error). */
object MergeInto {

  /** A `WHEN MATCHED [AND condition]` clause for [[mergeClauses]].
    * Conditions and SET expressions are SQL over the qualified names
    * `t.<col>` (the lake row) and `s.<col>` (the matching source
    * row); a NULL condition keeps the row untouched (SQL three-valued
    * logic — same as Delta). */
  sealed trait MatchedClause { def condition: Option[String] }
  /** `WHEN MATCHED [AND condition] THEN UPDATE SET col = expr, ...` —
    * unassigned columns keep the lake row's value. */
  final case class MatchedUpdate(set: Map[String, String],
      condition: Option[String] = None) extends MatchedClause
  /** `WHEN MATCHED [AND condition] THEN DELETE`. */
  final case class MatchedDelete(condition: Option[String] = None)
      extends MatchedClause

  /** `WHEN NOT MATCHED [AND condition] THEN INSERT` — `values` maps
    * lake columns to SQL over `s.<col>` ONLY (there is no target row
    * to reference); unassigned columns insert NULL. An EMPTY `values`
    * is `INSERT *`: every non-generated lake column is taken from the
    * same-named source column (all must exist — Delta's INSERT-star
    * resolution error otherwise); generated columns are recomputed
    * from their definitions either way. */
  final case class NotMatchedInsert(values: Map[String, String] =
      Map.empty, condition: Option[String] = None)

  /** A `WHEN NOT MATCHED BY SOURCE [AND condition]` clause — acts on
    * LAKE rows whose key has no source row. Conditions and SET
    * expressions reference `t.<col>` ONLY (there is no source row). */
  sealed trait BySourceClause { def condition: Option[String] }
  final case class BySourceUpdate(set: Map[String, String],
      condition: Option[String] = None) extends BySourceClause
  final case class BySourceDelete(condition: Option[String] = None)
      extends BySourceClause

  /** Upsert `updates` (full lake schema, unique on `keys`) into the
    * lake. With `evolveSchema`, `updates` may ADD columns beyond the
    * lake's schema: rewritten/inserted rows carry them, carried files
    * keep their old physical schema (zero I/O either way), and
    * readers opt in via `readCommitted(mergeSchema = true)` — exactly
    * Delta's additive `mergeSchema` evolution; surprise extra columns
    * without the flag fail fast, as does a TYPE clash on a shared
    * column (an int landing beside a long would poison later reads).
    * With `indexDir`, a CURRENT stats index (file set == committed
    * view; stale indexes are never trusted) accelerates touched-file
    * discovery via [[StatsIndex.prunedForKeys]] /
    * [[StatsIndex.prunedForKeysString]] for bounded integral and
    * string keys, composite keys intersecting the per-column candidate
    * sets — Delta's data-skipping-in-MERGE — and every
    * mutation verb then keeps the index consistent with the new table
    * version ([[StatsIndex.refreshSameColumns]] under the same lock).
    * Returns (filesRewritten, filesCarried). */
  def merge(spark: SparkSession, lakeDir: String, updates: DataFrame,
      keys0: Seq[String], filesPerRewrite: Int = 4,
      evolveSchema: Boolean = false,
      indexDir: Option[String] = None): (Int, Int) = {
    // column mapping first (callers speak logical names — frame AND
    // keys; the rewrite shares the committed physical schema), then
    // generated-column FILL: an update frame omitting a defined
    // column gets it computed, so full-row compatibility and the
    // rewrite both see the complete row
    val fs0 = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keys = keys0.map(ColumnMapping.mapping(fs0, lakeDir).physicalOf)
    // pin the update frame and its key set once (same rationale as
    // clausesPlanFor): they feed the uniqueness gate, discovery, the
    // survivor anti-join and up to three change-feed joins — without
    // the pin each execution re-runs the caller's source plan
    val updates0 = GeneratedColumns.fill(spark, lakeDir,
      ColumnMapping.toPhysical(spark, lakeDir, updates))
      .localCheckpoint()
    requireUniqueKeys(updates0, keys, "merge")
    val updKeys = updates0.select(keys.map(col): _*).distinct()
      .localCheckpoint()
    mutate(spark, lakeDir, "merge", filesPerRewrite,
        indexDir) { (lake, committed, cdcWanted) =>
      requireFullRowCompatible(lake, updates0, "merge", evolveSchema)
      // touched-file discovery: with a CURRENT stats index (its file
      // set matches the committed view — stale indexes are never
      // trusted for DML), candidate files come from the key-set prune
      // paths — [[StatsIndex.prunedForKeys]] for integral key columns,
      // [[StatsIndex.prunedForKeysString]] for string ones (the doc-id
      // case for an LLM corpus lake) — so the fact-side key-column
      // scan shrinks to files that can hold an update key at all
      // (min/max + bloom arms, metadata-scale), the Delta
      // data-skipping-in-MERGE shape. A COMPOSITE key intersects the
      // per-column candidate sets: containing a matching tuple
      // requires containing each component's value, so the
      // intersection is a necessary condition — never excludes a file
      // the full pass would keep. Key columns of other types (or with
      // over-bounded key sets) simply don't contribute a set; if none
      // contributes, discovery falls back to the full column-pruned
      // pass (correct, just not accelerated).
      def touchedIn(base: DataFrame): Set[String] = base
        .select(col("_metadata.file_path").as("__file") +: keys.map(col): _*)
        .join(updKeys, keys, "left_semi")
        .select(col("__file")).distinct()
        .collect().map(r => new Path(r.getString(0)).getName).toSet
      val touchedViaIndex: Option[Set[String]] =
        keyCandidateFiles(spark, updates0, keys, indexDir, committed).map {
          case cand if cand.isEmpty => Set.empty[String] // pure-insert merge
          case cand => touchedIn(
            spark.read.schema(lake.schema).parquet(cand: _*))
        }
      val touched = touchedViaIndex.getOrElse(touchedIn(lake))
      // rewrite = touched rows that keep their version (anti-join on
      // keys; no broadcast hint — the keyset is usually tiny and AQE
      // broadcasts it at runtime, a huge one sort-merges instead of
      // OOMing) + every update row (matched replaced, new inserted).
      // allowMissingColumns only matters under evolveSchema: survivors
      // from old files take NULL for the added columns
      val survivors =
        if (touched.isEmpty) updates0
        else spark.read.schema(lake.schema)
          .parquet(CommitLog.resolveDataPaths(spark, lakeDir,
            touched.toSeq.sorted): _*)
          .join(updKeys, keys, "left_anti")
          .unionByName(updates0, allowMissingColumns = true)
      // change feed: matched lake rows are pre-images, their update
      // rows post-images, the rest of the updates inserts — change
      // volume ∝ touched data, same reads the rewrite already does
      val changes =
        if (!cdcWanted) None
        else {
          val ct = ChangeDataFeed.ChangeTypeCol
          if (touched.isEmpty)
            Some(updates0.withColumn(ct, lit("insert")))
          else {
            val base = spark.read.schema(lake.schema)
              .parquet(CommitLog.resolveDataPaths(spark, lakeDir,
                touched.toSeq.sorted): _*)
            // pinned: baseKeys feeds the post semi-join AND the
            // insert anti-join — unpinned, the one feed write scans
            // the touched files three times (pre + twice via baseKeys)
            val baseKeys = base.select(keys.map(col): _*).distinct()
              .localCheckpoint()
            val pre = base
              .join(updKeys, keys, "left_semi")
              .withColumn(ct, lit("update_preimage"))
            val post = updates0.join(baseKeys, keys, "left_semi")
              .withColumn(ct, lit("update_postimage"))
            val ins = updates0.join(baseKeys, keys, "left_anti")
              .withColumn(ct, lit("insert"))
            Some(pre.unionByName(post, allowMissingColumns = true)
              .unionByName(ins, allowMissingColumns = true))
          }
        }
      (touched, Some(survivors), changes)
    }
  }

  /** The FULL `MERGE INTO` clause grammar — Delta's
    * `WHEN MATCHED [AND c] THEN UPDATE/DELETE`,
    * `WHEN NOT MATCHED [AND c] THEN INSERT`, and
    * `WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE/DELETE` — over
    * the same copy-on-write scaffold as [[merge]]. Clauses within a
    * group are evaluated IN ORDER and the first whose condition holds
    * acts (so every clause but the last in its group must carry a
    * condition — later ones would be dead code; Delta raises the same
    * analysis error); a row no clause claims carries through
    * unchanged, even inside a rewritten file.
    *
    * Expression contexts (SQL strings, PHYSICAL column names — the
    * same limitation the UPDATE/DELETE predicates document in
    * [[ColumnMapping]]): matched clauses see `t.<col>` and `s.<col>`;
    * insert clauses see `s.<col>` only; by-source clauses see
    * `t.<col>` only. NULL conditions act as false.
    *
    * The 100 TB shape: touched-file discovery is (a) the key
    * semi-join pass of [[merge]] (index-accelerated via
    * [[StatsIndex]] key pruning when available) for the matched
    * side — skipped entirely when no matched clause exists — plus
    * (b) for by-source clauses, a column-pruned anti-join pass
    * keeping only files holding a not-matched row that satisfies
    * SOME by-source condition. An unconditional by-source clause
    * therefore touches every file holding any not-matched row — the
    * inherent cost of `NOT MATCHED BY SOURCE` (Delta's docs carry
    * the same warning); give such clauses a tight condition on a
    * clustered column so discovery prunes. Insert-side match
    * detection reads ONLY the matched files' key columns (a source
    * key present anywhere in the lake is present in a matched file,
    * so the anti-join against those keys is exact), never a second
    * full-lake pass.
    *
    * `source` needs only the key columns plus whatever the clause
    * expressions reference (plus every non-generated lake column for
    * `INSERT *`) — unlike [[merge]], partial frames are the point.
    * Schema evolution is not supported here: SET/VALUES target
    * existing lake columns. Generated columns may not be assigned;
    * they are recomputed over post-SET rows and filled on inserts.
    * Returns (filesRewritten, filesCarried). */
  def mergeClauses(spark: SparkSession, lakeDir: String,
      source0: DataFrame, keys0: Seq[String],
      matched: Seq[MatchedClause] = Nil,
      notMatched: Seq[NotMatchedInsert] = Nil,
      notMatchedBySource: Seq[BySourceClause] = Nil,
      filesPerRewrite: Int = 4,
      indexDir: Option[String] = None): (Int, Int) =
    mutate(spark, lakeDir, "mergeClauses", filesPerRewrite, indexDir)(
      clausesPlanFor(spark, lakeDir, source0, keys0, matched,
        notMatched, notMatchedBySource, indexDir, "mergeClauses"))

  /** The clause-grammar PREPARE stage, shared verbatim by the locked
    * verb above and [[Occ.mergeClauses]]: validates the source/clause
    * shape once, then returns the plan closure `(lake, committed,
    * cdcWanted) => (rewriteFiles, survivors, changes)` — the locked
    * verb runs it under the writer lock, the OCC verb runs it UNLOCKED
    * against a pinned snapshot. One implementation, two publication
    * disciplines, so the clause semantics cannot drift between them. */
  private[sources] def clausesPlanFor(spark: SparkSession,
      lakeDir: String, source0: DataFrame, keys0: Seq[String],
      matched: Seq[MatchedClause],
      notMatched: Seq[NotMatchedInsert],
      notMatchedBySource: Seq[BySourceClause],
      indexDir: Option[String], verb: String)
      : (DataFrame, Seq[String], Boolean) =>
        (Set[String], Option[DataFrame], Option[DataFrame]) = {
    import org.apache.spark.sql.Column
    requireClauseShape(matched, notMatched, notMatchedBySource, verb)
    val fs0 = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keys = keys0.map(ColumnMapping.mapping(fs0, lakeDir).physicalOf)
    // pin the source once (the mergeClausesMor discipline): its plan —
    // typically scans + unions + filters — was re-executed by the
    // uniqueness gate, both discovery passes, the staged rewrite, the
    // insert anti-join and the change feed (guide §1: five-plus
    // executions of one subtree). localCheckpoint materializes it to
    // cached blocks, so every later pass reads memory, and an OCC
    // retry re-reads a STABLE source.
    // FAULT TOLERANCE (r15, VERDICT r14 #2): the pin truncates
    // lineage, so an executor loss after it makes the verb FAIL — by
    // design LOUDLY and strictly BEFORE any publish (every write is
    // staged; the crash contract already covers a verb dying at any
    // point). Recovery is the ordinary retry: re-run the verb, which
    // re-pins. DeletionVectorsSpec's "lost localCheckpoint pin" arm
    // kills a pin's blocks mid-verb and proves fail-loud + converge.
    // A lineage-preserving persist() was considered and rejected: the
    // cacheManager keys cached plans by canonicalized logical plan, so
    // a pinned source re-read by a LATER verb over a MUTATED lake
    // could silently serve the stale cache — a correctness landmine
    // worse than the retry.
    val source = ColumnMapping.toPhysical(spark, lakeDir, source0)
      .localCheckpoint()
    require(!source.columns.contains("__m") &&
      !source.columns.contains("__c"),
      s"$verb: source columns __m/__c collide with merge markers")
    val missingKeys = keys.toSet -- source.columns.toSet
    require(missingKeys.isEmpty, s"$verb: source lacks key " +
      s"columns ${missingKeys.toSeq.sorted.mkString(", ")}")
    requireUniqueKeys(source, keys, verb)
    // the distinct key set feeds 2-4 joins per attempt — pin it too
    // (it is exactly as stable as the pinned source)
    val srcKeysPinned = source.select(keys.map(col): _*).distinct()
      .localCheckpoint()
    val allSets = (matched.collect { case MatchedUpdate(s, _) => s } ++
      notMatchedBySource.collect { case BySourceUpdate(s, _) => s })
      .flatMap(_.keySet).toSet
    val insertAssigned = notMatched.flatMap(_.values.keySet).toSet
    GeneratedColumns.requireNoGeneratedSet(spark, lakeDir,
      allSets ++ insertAssigned, verb)
    val holds = holdsCond _
    (lake: DataFrame, committed: Seq[String], cdcWanted: Boolean) => {
      val lakeCols = lake.columns.toSet
      val unknown = (allSets ++ insertAssigned) -- lakeCols
      require(unknown.isEmpty, s"$verb: SET/VALUES name unknown " +
        s"columns ${unknown.toSeq.sorted.mkString(", ")}")
      val genCols = GeneratedColumns.list(fs0, lakeDir).map(_._1).toSet
      notMatched.filter(_.values.isEmpty).foreach { _ =>
        val need = lakeCols -- genCols -- source.columns.toSet
        require(need.isEmpty, s"$verb: INSERT * needs source " +
          s"columns ${need.toSeq.sorted.mkString(", ")} (or assign " +
          "them explicitly)")
      }
      val srcKeys = srcKeysPinned
      // (a) matched-side discovery — needed for any matched clause
      // AND for insert-side match detection; index key-pruning first
      def matchedIn(base: DataFrame): Set[String] = base
        .select(col("_metadata.file_path").as("__file") +:
          keys.map(col): _*)
        .join(srcKeys, keys, "left_semi")
        .select(col("__file")).distinct()
        .collect().map(r => new Path(r.getString(0)).getName).toSet
      // when BOTH a matched-side pass and a by-source pass would run,
      // they are the same full-lake scan keyed the same way — fold
      // them into ONE pass (guide §2.4): left-join the pinned key set
      // once and partial-aggregate both per-file flags. Row semantics
      // are unchanged: isM ⇔ the semi-join kept the row, !isM ∧ claims
      // ⇔ the anti-join + filter kept it.
      val bothPasses = notMatchedBySource.nonEmpty &&
        (matched.nonEmpty || notMatched.nonEmpty)
      val (matchedFiles, bySourceFiles): (Set[String], Set[String]) =
        if (bothPasses) {
          val claims = notMatchedBySource.map(c => holds(c.condition))
            .reduce(_ || _)
          val isM = coalesce(col("s.__m"), lit(false))
          val flags = lake
            .withColumn("__file", col("_metadata.file_path"))
            .alias("t")
            .join(srcKeys.withColumn("__m", lit(true)).alias("s"),
              keys.map(k => col(s"t.$k") === col(s"s.$k"))
                .reduce(_ && _), "left")
            .groupBy(col("__file"))
            .agg(max(when(isM, 1).otherwise(0)).as("__anym"),
              max(when(!isM && claims, 1).otherwise(0)).as("__anyb"))
            .collect()
          (flags.filter(_.getInt(1) == 1)
              .map(r => new Path(r.getString(0)).getName).toSet,
            flags.filter(_.getInt(2) == 1)
              .map(r => new Path(r.getString(0)).getName).toSet)
        } else {
          val m: Set[String] =
            if (matched.isEmpty && notMatched.isEmpty) Set.empty
            else keyCandidateFiles(spark, source, keys, indexDir,
                committed).map {
              case cand if cand.isEmpty => Set.empty[String]
              case cand => matchedIn(
                spark.read.schema(lake.schema).parquet(cand: _*))
            }.getOrElse(matchedIn(lake))
          val b: Set[String] =
            if (notMatchedBySource.isEmpty) Set.empty
            else {
              val claims = notMatchedBySource.map(c => holds(c.condition))
                .reduce(_ || _)
              lake.withColumn("__file", col("_metadata.file_path"))
                .alias("t")
                .join(srcKeys.alias("s"),
                  keys.map(k => col(s"t.$k") === col(s"s.$k"))
                    .reduce(_ && _), "left_anti")
                .filter(claims).select(col("__file")).distinct()
                .collect().map(r => new Path(r.getString(0)).getName).toSet
            }
          (m, b)
        }
      val rewriteFiles =
        (if (matched.nonEmpty) matchedFiles else Set.empty[String]) ++
          bySourceFiles
      // first-claiming-clause index over the rewritten files' rows:
      // matched clauses at 0.., by-source clauses at 1000.., -1 = carry
      val matchedIdx = matched.zipWithIndex
      val bySourceIdx = notMatchedBySource.zipWithIndex
        .map { case (c, j) => (c, 1000 + j) }
      val deleteIdxs = (matchedIdx.collect {
        case (MatchedDelete(_), i) => i
      } ++ bySourceIdx.collect { case (BySourceDelete(_), j) => j })
      val setsByIdx: Seq[(Int, Map[String, String])] =
        matchedIdx.collect { case (MatchedUpdate(s, _), i) => (i, s) } ++
          bySourceIdx.collect { case (BySourceUpdate(s, _), j) => (j, s) }
      // post-SET per-column values, keyed on the staged clause index
      val values = lake.schema.fields.map { f =>
        setsByIdx.foldRight(col(s"t.${f.name}")) {
          case ((i, set), acc) => set.get(f.name) match {
            case Some(e) =>
              when(col("__c") === i, expr(e).cast(f.dataType))
                .otherwise(acc)
            case None => acc
          }
        }.as(f.name)
      }.toIndexedSeq
      // the rewritten files' rows, source-joined and stamped with the
      // first claiming clause's index (-1 = no clause: carry) — the
      // one frame both the rewrite and the change feed project from
      val staged: Option[DataFrame] =
        if (rewriteFiles.isEmpty) None
        else {
          val rows = spark.read.schema(lake.schema)
            .parquet(CommitLog.resolveDataPaths(spark, lakeDir,
              rewriteFiles.toSeq.sorted): _*)
          val joined = rows.alias("t")
            .join(source.withColumn("__m", lit(true)).alias("s"),
              keys.map(k => col(s"t.$k") === col(s"s.$k"))
                .reduce(_ && _), "left")
          val isM = coalesce(col("s.__m"), lit(false))
          val clauseIdx =
            (matchedIdx.map { case (c, i) => (isM && holds(c.condition), i) } ++
              bySourceIdx.map { case (c, j) => (!isM && holds(c.condition), j) })
              .foldRight(lit(-1): Column) { case ((cond, i), acc) =>
                when(cond, lit(i)).otherwise(acc)
              }
          Some(joined.withColumn("__c", clauseIdx))
        }
      val updatedRows: Option[DataFrame] = staged.map { st =>
        val keep =
          if (deleteIdxs.isEmpty) lit(true)
          else !col("__c").isin(deleteIdxs.map(Int.box): _*)
        GeneratedColumns.recompute(spark, lakeDir,
          st.filter(keep).select(values: _*))
      }
      // inserts: source keys absent from the lake ⇔ absent from the
      // matched files' keys (a present key's rows all live in matched
      // files), so the anti-join reads only those files' key columns
      val inserts: Option[DataFrame] =
        if (notMatched.isEmpty) None
        else {
          val matchedKeys =
            if (matchedFiles.isEmpty)
              srcKeys.limit(0)
            else spark.read.schema(lake.schema)
              .parquet(CommitLog.resolveDataPaths(spark, lakeDir,
                matchedFiles.toSeq.sorted): _*)
              .select(keys.map(col): _*).distinct()
          val unmatched = source.join(matchedKeys, keys, "left_anti")
            .alias("s")
          val insIdx = notMatched.zipWithIndex
            .foldRight(lit(-1): Column) { case ((c, i), acc) =>
              when(holds(c.condition), lit(i)).otherwise(acc)
            }
          val values = lake.schema.fields.map { f =>
            notMatched.zipWithIndex.foldRight(
                lit(null).cast(f.dataType): Column) {
              case ((c, i), acc) =>
                val v =
                  if (c.values.isEmpty) {
                    if (genCols(f.name) && !unmatched.columns.contains(f.name))
                      lit(null).cast(f.dataType)
                    else col(s"s.${f.name}").cast(f.dataType)
                  } else c.values.get(f.name)
                    .map(e => expr(e).cast(f.dataType))
                    .getOrElse(lit(null).cast(f.dataType))
                when(col("__c") === i, v).otherwise(acc)
            }.as(f.name)
          }
          Some(GeneratedColumns.fill(spark, lakeDir,
            GeneratedColumns.recompute(spark, lakeDir,
              unmatched.withColumn("__c", insIdx)
                .filter(col("__c") >= 0)
                .select(values.toIndexedSeq: _*))))
        }
      val survivors = (updatedRows, inserts) match {
        case (Some(u), Some(i)) => Some(u.unionByName(i))
        case (u, i) => u.orElse(i)
      }
      // change feed: per-clause row images from the SAME staged frame
      // the rewrite projects — deletes and update pre-images in the
      // lake's columns, post-images through the SET projection,
      // inserts as built
      val changes =
        if (!cdcWanted) None
        else {
          val ct = ChangeDataFeed.ChangeTypeCol
          val tCols = lake.schema.fields
            .map(f => col(s"t.${f.name}").as(f.name)).toIndexedSeq
          val updateIdxs = setsByIdx.map(_._1)
          val segs = Seq.newBuilder[DataFrame]
          staged.foreach { st =>
            if (deleteIdxs.nonEmpty)
              segs += st.filter(col("__c")
                  .isin(deleteIdxs.map(Int.box): _*))
                .select(tCols: _*).withColumn(ct, lit("delete"))
            if (updateIdxs.nonEmpty) {
              val upd = st.filter(col("__c")
                .isin(updateIdxs.map(Int.box): _*))
              segs += upd.select(tCols: _*)
                .withColumn(ct, lit("update_preimage"))
              segs += GeneratedColumns.recompute(spark, lakeDir,
                  upd.select(values: _*))
                .withColumn(ct, lit("update_postimage"))
            }
          }
          inserts.foreach(i => segs += i.withColumn(ct, lit("insert")))
          val all = segs.result()
          Some(
            if (all.isEmpty)
              lake.limit(0).withColumn(ct, lit("")).limit(0)
            else all.reduce(_.unionByName(_, allowMissingColumns = true)))
        }
      (rewriteFiles, survivors, changes)
    }
  }

  /** Copy-on-write DELETE: drop every committed row matching
    * `predicate` (a SQL boolean expression; NULL evaluations keep the
    * row — SQL DELETE semantics). Only files containing a matching
    * row are rewritten. Returns (filesRewritten, filesCarried).
    *
    * `impliedRanges` is the index-assisted discovery hint for
    * predicate mutations (the analog of merge's key-set pruning): the
    * CALLER asserts `predicate ⇒ every range holds` — e.g. a closed
    * retention window `lo <= ts AND ts < hi` implies
    * `TimestampRange(ts, lo, hi)`. Files the index proves outside ANY
    * range then cannot contain a matching row, so the touched-file
    * pass scans only the candidates — on a 100 TB time-clustered lake
    * a retention DELETE reads the expiring band, not every file's
    * predicate columns. Soundness rests ENTIRELY on the implication
    * (a hint NOT implied by the predicate can silently miss matching
    * rows — same contract as a partition-pruning predicate); two
    * classic ways to break it, both caller bugs: an unbounded
    * predicate hinted with a bounded range (`ts < X` does NOT imply
    * `ts >= someFloor`), and timestamp literals resolved in a
    * DIFFERENT session timezone than the predicate's own parse — take
    * the range endpoints from the SAME session's parse of the SAME
    * literals (q66 shows the pattern). The index stays a conservative
    * accelerator UNDER the assertion, and a stale index (file set ≠
    * committed view) is never trusted — full pass instead. */
  def delete(spark: SparkSession, lakeDir: String,
      predicate: String, filesPerRewrite: Int = 4,
      indexDir: Option[String] = None,
      impliedRanges: Seq[StatsIndex.ColRange] = Nil): (Int, Int) =
    mutate(spark, lakeDir, "delete", filesPerRewrite,
        indexDir) { (lake, committed, cdcWanted) =>
      val touched = touchedUnder(spark, lakeDir, lake, committed,
        predicate, indexDir, impliedRanges)
      def touchedRows = spark.read.schema(lake.schema)
        .parquet(CommitLog.resolveDataPaths(spark, lakeDir,
          touched.toSeq.sorted): _*)
      val survivors =
        if (touched.isEmpty) None
        else Some(touchedRows
          .filter(!coalesce(expr(predicate), lit(false))))
      val changes =
        if (!cdcWanted) None
        else Some {
          val ct = ChangeDataFeed.ChangeTypeCol
          if (touched.isEmpty)
            lake.limit(0).withColumn(ct, lit("delete")).limit(0)
          else touchedRows
            .filter(coalesce(expr(predicate), lit(false)))
            .withColumn(ct, lit("delete"))
        }
      (touched, survivors, changes)
    }

  /** Copy-on-write UPDATE: `SET col = <sql-expr>` for every committed
    * row matching `predicate`. Assignments are evaluated against the
    * PRE-update row (standard UPDATE semantics — `set` entries never
    * see each other) and cast back to the column's type so the schema
    * cannot drift; non-matching rows in rewritten files pass through
    * byte-identically. Returns (filesRewritten, filesCarried). */
  def update(spark: SparkSession, lakeDir: String, predicate: String,
      set: Map[String, String], filesPerRewrite: Int = 4,
      indexDir: Option[String] = None,
      impliedRanges: Seq[StatsIndex.ColRange] = Nil): (Int, Int) = {
    require(set.nonEmpty, "update needs at least one SET assignment")
    GeneratedColumns.requireNoGeneratedSet(spark, lakeDir,
      set.keySet, "update")
    mutate(spark, lakeDir, "update", filesPerRewrite,
        indexDir) { (lake, committed, cdcWanted) =>
      val unknown = set.keySet -- lake.columns.toSet
      require(unknown.isEmpty,
        s"update: SET names unknown columns ${unknown.toSeq.sorted
          .mkString(", ")}")
      val touched = touchedUnder(spark, lakeDir, lake, committed,
        predicate, indexDir, impliedRanges)
      val matches = coalesce(expr(predicate), lit(false))
      def touchedRows = spark.read.schema(lake.schema)
        .parquet(CommitLog.resolveDataPaths(spark, lakeDir,
          touched.toSeq.sorted): _*)
      def setCols(guarded: Boolean) = lake.schema.fields.map { f =>
        set.get(f.name) match {
          case Some(e) if guarded =>
            when(matches, expr(e).cast(f.dataType))
              .otherwise(col(f.name)).as(f.name)
          case Some(e) => expr(e).cast(f.dataType).as(f.name)
          case None => col(f.name)
        }
      }.toIndexedSeq
      val survivors =
        if (touched.isEmpty) None
        // generated columns RECOMPUTE over the post-SET row
        // (identity for rows whose dependencies did not change)
        else Some(GeneratedColumns.recompute(spark, lakeDir,
          touchedRows.select(setCols(guarded = true): _*)))
      // change feed: matching rows before and after the SET — the
      // unguarded projection is safe because the frame is pre-filtered
      val changes =
        if (!cdcWanted) None
        else Some {
          val ct = ChangeDataFeed.ChangeTypeCol
          if (touched.isEmpty)
            lake.limit(0).withColumn(ct, lit("")).limit(0)
          else {
            val hit = touchedRows.filter(matches)
            hit.withColumn(ct, lit("update_preimage"))
              .unionByName(
                GeneratedColumns.recompute(spark, lakeDir,
                  hit.select(setCols(guarded = false): _*))
                  .withColumn(ct, lit("update_postimage")))
          }
        }
      (touched, survivors, changes)
    }
  }

  /** Files containing at least one row matching `predicate` — a
    * column-pruned pass (predicate columns + `_metadata.file_path`),
    * collect bounded by #files. */
  private def touchedBy(lake: DataFrame, predicate: String): Set[String] =
    lake.filter(expr(predicate))
      .select(col("_metadata.file_path")).distinct()
      .collect().map(r => new Path(r.getString(0)).getName).toSet

  /** [[touchedBy]], restricted to the index's candidate files when a
    * CURRENT index and a caller-asserted `impliedRanges` hint are
    * both present (see [[delete]]'s contract) — otherwise the full
    * column-pruned pass. */
  private def touchedUnder(spark: SparkSession, lakeDir: String,
      lake: DataFrame, committed: Seq[String], predicate: String,
      indexDir: Option[String],
      impliedRanges: Seq[StatsIndex.ColRange]): Set[String] =
    rangeCandidateFiles(spark, committed, indexDir, impliedRanges) match {
      case None => touchedBy(lake, predicate)
      case Some(Nil) => Set.empty // no file can satisfy the ranges
      case Some(cand) =>
        touchedBy(spark.read.parquet(cand: _*), predicate)
    }

  /** Index-assisted candidate files (FULL paths, sorted) for a
    * caller-asserted `impliedRanges` hint — `None` when no current
    * index or no hint (fall back to the full pass), `Some(Nil)` when
    * the index proves no file can match. Shared by the CoW verbs and
    * the merge-on-read ones ([[DeletionVectors.updateMor]]). */
  private[sources] def rangeCandidateFiles(spark: SparkSession,
      committed: Seq[String], indexDir: Option[String],
      impliedRanges: Seq[StatsIndex.ColRange]): Option[Seq[String]] =
    indexDir.flatMap { idx =>
      if (impliedRanges.isEmpty) None
      else {
        val current = StatsIndex.indexedFiles(spark, idx)
          .map(p => new Path(p).getName).toSet == committed.toSet
        if (!current) None
        else Some(StatsIndex.prunedTyped(spark, idx, impliedRanges).sorted)
      }
    }

  /** Index-assisted candidate files (FULL paths, sorted) that can hold
    * at least one of `updates`' key tuples — `None` when the index is
    * absent, stale, or no key column's type/cardinality qualifies
    * (fall back to the full column-pruned pass); `Some(Nil)` for a
    * provably pure-insert merge. A COMPOSITE key intersects the
    * per-column candidate sets: containing a matching tuple requires
    * containing each component's value, so the intersection is a
    * necessary condition — never excludes a file the full pass would
    * keep. NULL update keys never equality-match a lake row (they are
    * pure inserts), so dropping them from discovery is exact. Shared
    * by [[merge]] and [[DeletionVectors.mergeMor]]. */
  private[sources] def keyCandidateFiles(spark: SparkSession,
      updates: DataFrame, keys: Seq[String], indexDir: Option[String],
      committed: Seq[String]): Option[Seq[String]] =
    indexDir.flatMap { idx =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
      import spark.implicits._
      val current = StatsIndex.indexedFiles(spark, idx)
        .map(p => new Path(p).getName).toSet == committed.toSet
      if (!current) None
      else {
        val sets: Seq[Set[String]] = keys.flatMap { k =>
          updates.schema(k).dataType match {
            case ByteType | ShortType | IntegerType | LongType =>
              val ks = updates.select(col(k).cast("long")).na.drop()
                .distinct().limit(100001).as[Long].collect()
              if (ks.length > 100000) None
              else Some(
                StatsIndex.prunedForKeys(spark, idx, k, ks.toSeq).toSet)
            case StringType =>
              val ks = updates.select(col(k)).na.drop()
                .distinct().limit(100001).as[String].collect()
              if (ks.length > 100000) None
              else Some(StatsIndex
                .prunedForKeysString(spark, idx, k, ks.toSeq).toSet)
            case _ => None
          }
        }
        if (sets.isEmpty) None
        else Some(sets.reduce(_ intersect _).toSeq.sorted)
      }
    }

  /** Clause-shape preconditions [[mergeClauses]] and
    * [[DeletionVectors.mergeClausesMor]] share: at least one clause,
    * and only the LAST clause of each group may omit its condition —
    * an unconditioned clause earlier in the order shadows everything
    * after it (Delta's MERGE analysis raises the same error). */
  private[sources] def requireClauseShape(matched: Seq[MatchedClause],
      notMatched: Seq[NotMatchedInsert],
      notMatchedBySource: Seq[BySourceClause], verb: String): Unit = {
    require(matched.nonEmpty || notMatched.nonEmpty ||
      notMatchedBySource.nonEmpty, s"$verb: no clauses given")
    def requireOrdered(n: String, conds: Seq[Option[String]]): Unit =
      require(conds.dropRight(1).forall(_.nonEmpty),
        s"$verb: every $n clause but the last needs a " +
          "condition — an unconditioned one shadows all later clauses")
    requireOrdered("whenMatched", matched.map(_.condition))
    requireOrdered("whenNotMatched", notMatched.map(_.condition))
    requireOrdered("whenNotMatchedBySource",
      notMatchedBySource.map(_.condition))
  }

  /** A NULL clause condition is "does not act", not "acts" (3VL). */
  private[sources] def holdsCond(c: Option[String])
      : org.apache.spark.sql.Column =
    c.map(e => coalesce(expr(e), lit(false))).getOrElse(lit(true))

  /** The merge-shape preconditions [[merge]] and
    * [[DeletionVectors.mergeMor]] share: `updates` must be unique on
    * `keys` (each duplicate would race to replace the same row). */
  private[sources] def requireUniqueKeys(updates: DataFrame,
      keys: Seq[String], verb: String): Unit = {
    require(keys.nonEmpty, s"$verb needs at least one key column")
    val dupes = updates.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).limit(1).count()
    require(dupes == 0,
      s"$verb: duplicate keys in updates on (${keys.mkString(", ")}) — " +
        "each duplicate would race to replace the same row")
  }

  /** Full-row schema compatibility between the lake and an update
    * frame — shared by the CoW and MoR merge verbs (see [[merge]]'s
    * scaladoc for the evolveSchema contract). */
  private[sources] def requireFullRowCompatible(lake: DataFrame,
      updates: DataFrame, verb: String, evolveSchema: Boolean): Unit = {
    val missing = lake.columns.toSet -- updates.columns.toSet
    require(missing.isEmpty,
      s"$verb: updates lack lake columns ${missing.toSeq.sorted
        .mkString(", ")} — an update row must be a full row (partial " +
        "updates would silently null the rest)")
    val added = updates.columns.toSet -- lake.columns.toSet
    require(added.isEmpty || evolveSchema,
      s"$verb: updates add columns ${added.toSeq.sorted.mkString(", ")} " +
        "not in the lake schema — pass evolveSchema = true to evolve " +
        "additively (readers then need mergeSchema = true)")
    val updTypes = updates.schema.fields.map(f => f.name -> f.dataType).toMap
    val clashes = lake.schema.fields.collect {
      case f if updTypes.get(f.name).exists(_ != f.dataType) =>
        s"${f.name} (lake ${f.dataType.simpleString} vs updates " +
          s"${updTypes(f.name).simpleString})"
    }
    require(clashes.isEmpty,
      s"$verb: column type clash ${clashes.mkString("; ")} — cast the " +
        "updates first (a silent type drift would poison later reads)")
  }

  /** The shared mutation scaffold all three verbs run under ONE
    * writer-lock hold: read the committed view, let `plan` pick the
    * touched files and build their replacement rows, append the
    * replacements, flip the version in one `.mutation.checkpoint`
    * publish, then sweep the replaced files (safe — the lock is still
    * held, nothing can be mid-write) so the plain directory read
    * converges immediately. The checkpoint id is the CURRENT max
    * (clamped to the bootstrap id -1, NEVER up to 0 — a checkpoint at
    * an id no batch has committed would make that future batch's
    * replay a silent no-op and lose its rows), so streaming replay
    * idempotence is untouched. */
  /** `plan(lake, committedNames, cdcWanted)` returns (touched file
    * names, replacement rows, change-feed rows). The change frame is
    * demanded only when the lake has the feed enabled
    * ([[ChangeDataFeed]]) — it is written under `_cdf/<id>.<gen>/`
    * BEFORE the checkpoint publish claims the same version key, still
    * under the writer lock, so a published mutation always has its
    * changes and a crash leaves only unreferenced debris. */
  private def mutate(spark: SparkSession, lakeDir: String, verb: String,
      filesPerRewrite: Int, indexDir: Option[String] = None)(
      plan: (DataFrame, Seq[String], Boolean) =>
        (Set[String], Option[DataFrame], Option[DataFrame]))
      : (Int, Int) = {
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(CommitLog.logDir(lakeDir))),
      s"$verb: $lakeDir has no commit log — cannot publish atomically")
    CommitLog.withWriterLock(fs, lakeDir) {
      // a CoW rewrite reads committed files WITHOUT deletion vectors
      // and would resurrect DV-deleted rows into its output
      require(!DeletionVectors.hasDvs(fs, lakeDir),
        s"$verb: $lakeDir has unapplied deletion vectors — run " +
          "DeletionVectors.compact first (a copy-on-write rewrite " +
          "would resurrect DV-deleted rows)")
      val committed = CommitLog.committedNames(fs, lakeDir).toSeq.sorted
      // mergeSchema: after additive evolution the committed files mix
      // physical schemas — a single-footer schema pick would make a
      // later mutation's view of the evolved column nondeterministic
      val lake = spark.read.option("mergeSchema", "true")
        .parquet(CommitLog.resolveDataPaths(fs, lakeDir, committed): _*)
      val cdcWanted = ChangeDataFeed.isEnabled(fs, lakeDir)
      val (touched, survivors, changes) = plan(lake, committed, cdcWanted)
      val carried = committed.filterNot(touched)
      val before = CommitLog.dataFileNames(fs, lakeDir)
      survivors.foreach(_.repartition(filesPerRewrite)
        .write.mode("append").parquet(lakeDir))
      val fresh =
        (CommitLog.dataFileNames(fs, lakeDir) -- before).toSeq.sorted
      // CHECK-constraint gate on the rewritten files only (carried
      // files' rows passed when they entered, by induction); deletes
      // introduce no new values and skip. A violation throws BEFORE
      // the publish — the fresh files are debris the sweep below
      // never reaches, cleared by the next writer's vacuum.
      if (verb != "delete") {
        Constraints.validateFiles(spark, lakeDir, fresh)
        GeneratedColumns.validateFiles(spark, lakeDir, fresh)
      }
      val id = math.max(CommitLog.maxCommittedId(fs, lakeDir), -1L)
      // change feed: row-level deltas land BEFORE the publish that
      // claims their (id, gen) key — readers only trust directories a
      // published checkpoint points at, so the crash window is benign
      val gen =
        if (!cdcWanted) None
        else {
          val cdc = changes.getOrElse(throw new IllegalStateException(
            s"$verb: change feed enabled but no change frame built"))
          val g = CommitLog.nextGen(fs, lakeDir)
          ChangeDataFeed.writeChanges(spark, lakeDir, id, g, cdc)
          Some(g)
        }
      CommitLog.commitMutationCheckpoint(fs, lakeDir, id,
        (carried ++ fresh).sorted,
        added = fresh, removed = touched.toSeq.sorted, gen = gen)
      CommitLog.vacuum(fs, lakeDir, olderThanMs = 0L)
      // a lake with a stats index must not leave it pointing at the
      // swept files (pruned reads would fail) or blind to the fresh
      // ones (prunedTyped's all-files list comes from the index — a
      // missed file would silently vanish from pruned results): drop
      // the replaced files' rows, footer-read only the fresh ones —
      // still under the writer lock, same as LayoutSink's per-batch
      // refresh
      indexDir.foreach(idx =>
        StatsIndex.refreshSameColumns(spark, lakeDir, idx))
      (touched.size, carried.size)
    }
  }
}
