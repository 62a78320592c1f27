package graft.sources.vortex

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** `MERGE INTO <vortex dataset> USING <source> ON key` — whole-row
  * upsert: target rows whose key appears in the source are REPLACED by
  * the source row, source rows matching nothing are APPENDED. The
  * incremental-ingest shape of a corpus store: a batch of re-scored /
  * re-crawled documents lands on top of 100 TB without rewriting more
  * than the files it touches.
  *
  * Scale contract (the 100 TB judgment): the SOURCE is the small side —
  * a batch, not a second 100 TB table. Its rows are collected and
  * broadcast (hard `require` ≤ `maxSourceRows`, default 1M — the same
  * bounded-driver-state discipline as UnigramLM's cap), because every
  * candidate file task needs random-access lookup by key. The TARGET
  * side stays fully distributed and file-granular:
  *  - candidates = the pushed scan's own partitions for
  *    `key IN (source keys)` when the key set is small enough to push
  *    (≤ `pushKeyLimit`, single-column keys — manifest min/max, blooms
  *    and partition pruning then skip untouched files with zero I/O);
  *    otherwise every file is a candidate and classification decides.
  *  - one NON-DESTRUCTIVE task per candidate file: pass 1 probes the
  *    broadcast key map over the key columns only; no hit → untouched.
  *    Otherwise the file rewrites with matched rows replaced (existing
  *    deletion-vector masks fold in). Matched source ordinals return
  *    to the driver as a bitmask (O(|source|/8) bytes per task).
  *  - APPEND: source rows no task matched are staged through the
  *    normal vortex writer and renamed in under
  *    `part-merge-ins-<md5(source content + key)>.vortex`, one per
  *    layout directory — a directory already holding this statement's
  *    insert file (or its deterministic maintenance replacement) is
  *    skipped, making the insert half EXACTLY-ONCE under crash
  *    re-runs, including NULL-key inserts that can never self-match.
  *    Two documented bounds of that guarantee (ADVICE r11): (1) the
  *    marker is keyed on STATEMENT identity, so a deliberate later
  *    re-execution of a byte-identical MERGE (same source content,
  *    keys, clauses) is deduplicated too — its insert half is skipped
  *    where ANSI would re-insert never-matching NULL-key rows; vary
  *    the source (e.g. a batch-id column) when re-insertion is
  *    intended. (2) The marker is the insert FILE's name, and
  *    compaction can absorb that file — a crash re-run interleaved
  *    with a compact can therefore re-append. Both follow from the
  *    no-commit-log design; run MERGE re-runs before compaction.
  *  - driver commit: rename/delete per touched file (deterministic
  *    `part-merge-<md5(src)>.vortex` names — same crash-convergence
  *    contract as DELETE/UPDATE for the replace half).
  *
  * Duplicate keys: source keys must be unique (`require`d — two source
  * rows for one target row is ambiguous); duplicate keys in the TARGET
  * all replace with the same source row (each is a match).
  */
object VortexMerge {

  final case class MergeResult(candidateFiles: Int, untouchedFiles: Int,
                               rewrittenFiles: Int, rowsUpdated: Long,
                               rowsInserted: Long, rowsDeleted: Long = 0L,
                               droppedFiles: Int = 0)

  private[graft] def replacementName(srcName: String): String =
    "part-merge-" + VortexDelete.replacementName(srcName).stripPrefix("part-delete-")

  def merge(spark: SparkSession, dir: String, source: DataFrame,
            keyCols: Seq[String],
            maxSourceRows: Int = 1 << 20,
            pushKeyLimit: Int = 10000): MergeResult =
    mergeImpl(spark, dir, source, keyCols, maxSourceRows, pushKeyLimit,
      failAfterInserts = -1)

  /** `failAfterInserts` is a TEST SEAM (≥0: throw after that many
    * per-directory insert renames), mirroring the delete/update crash
    * seams — the exactly-once-insert spec injects a crash mid-append. */
  private[graft] def mergeImpl(spark: SparkSession, dir: String, source: DataFrame,
                               keyCols: Seq[String],
                               maxSourceRows: Int, pushKeyLimit: Int,
                               failAfterInserts: Int): MergeResult = {
    require(keyCols.nonEmpty, "vortex merge: no key columns")
    val hconf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    // writer-vs-writer mutual exclusion (see MaintenanceLock)
    MaintenanceLock.withLock(fs, root, "merge") {
    // one listing walk (mask binding + stale-replacement repair), BEFORE
    // the target loads: planning must never see a stale replacement the
    // repair is about to drop
    MaintenanceCommit.repairStaleCompactions(fs, root)
    val (listed, maskBind) = VortexDataSource.listAllWithMasks(Seq(dir), hconf, consistent = false)
    val repaired0 = MaintenanceCommit.repairStaleReplacements(fs, listed.map(_._1)) +
      MaintenanceCommit.repairStaleUpdvAppends(fs, listed.map(_._1), maskBind)
    // time travel: pre-state generation + retirement (see VortexCommitLog); the
    // statement's own walk is reusable iff the repairs dropped nothing
    val ttCtx = VortexCommitLog.begin(spark, fs, root, hconf, "merge",
      if (repaired0 == 0) Some((listed, maskBind)) else None)
    val remover = ttCtx.map(_.remover).getOrElse(MaintenanceCommit.PlainRemover)
    val target = spark.read.format("vortex").load(dir)
    val tSchema = target.schema
    keyCols.foreach(k => require(tSchema.fieldNames.contains(k),
      s"vortex merge: key column $k is not a column of the target"))

    // source rows in the TARGET's schema/order, as Catalyst rows (the
    // tasks write them straight through the vortex writer)
    val aligned = source.select(tSchema.fields.map(f =>
      col(s"`${f.name}`").cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    val capped = aligned.limit(maxSourceRows + 1)
      .queryExecution.toRdd.map(_.copy()).collect()
    require(capped.length <= maxSourceRows,
      s"vortex merge: source exceeds maxSourceRows=$maxSourceRows — " +
      "merge broadcasts the source; batch it or raise the cap deliberately")
    val srcRows: Array[org.apache.spark.sql.catalyst.InternalRow] = capped
    val keyIdx: Array[Int] = keyCols.map(tSchema.fieldIndex).toArray
    val keyTypes = keyIdx.map(tSchema.fields(_).dataType)
    // NULL-key contract (ANSI MERGE: NULL matches nothing): source rows
    // with any NULL key component never match — they are pure inserts —
    // and null-key TARGET rows are never replaced. Keys normalize
    // through VortexMergeSupport.keyOf (binary keys wrap to value-
    // equality Seqs; Array[Byte] compares by reference otherwise).
    def keyOf(r: org.apache.spark.sql.catalyst.InternalRow): Seq[Any] =
      VortexMergeSupport.keyOf(r, keyIdx, keyTypes)
    locally {
      val seen = new scala.collection.mutable.HashSet[Seq[Any]]
      srcRows.foreach { r =>
        val k = keyOf(r)
        if (k != null) // null-key rows are inserts; duplicates among them allowed
          require(seen.add(k), s"vortex merge: duplicate source key $k")
      }
      // NOT NULL enforcement (found r12): whole-row replace writes the
      // source row verbatim — a NULL for a non-nullable target column
      // must fail loudly, not decode as the type's zero value
      val nn = tSchema.fields.zipWithIndex.filterNot(_._1.nullable)
      if (nn.nonEmpty) srcRows.foreach(r => nn.foreach { case (f, i) =>
        require(!r.isNullAt(i),
          s"vortex merge: source carries NULL for non-nullable target " +
          s"column ${f.name}") })
    }
    val bcRows = spark.sparkContext.broadcast(srcRows)

    // candidate planning: push `key IN (...)` when the key set is small
    // (single-col keys) — manifest/bloom/partition pruning applies;
    // otherwise all files are candidates. Pushed only for key types
    // whose storage→literal conversion is defined (integral / string /
    // boolean / decimal); timestamp/date/binary keys skip the push
    // (correct, just unpruned). NULL keys are dropped from the IN list
    // (they match nothing — see the contract above), which stays sound
    // because null-key target rows can never be replaced anyway.
    val keyValuesForPush: Option[Seq[Any]] =
      if (keyCols.length == 1 && srcRows.length <= pushKeyLimit &&
          VortexMergeSupport.pushableKeyType(keyTypes(0))) {
        val dt = keyTypes(0)
        val vs = srcRows.toSeq.map(_.get(keyIdx(0), dt)).filter(_ != null)
          .map(VortexMergeSupport.toExternal(_, dt))
        if (vs.nonEmpty) Some(vs) else None
      } else None
    val filtered = keyValuesForPush match {
      case Some(vs) => target.filter(col(s"`${keyCols.head}`").isInCollection(vs))
      case None => target
    }
    val parts = filtered.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.flatMap(_.inputPartitions).collect { case v: VortexInputPartition => v }

    val rootQ = fs.makeQualified(root).toString
    val manifest = StatsManifest.read(root, hconf)

    // (file, partCols, partValues, bloomCols, sketchCols, dstName, relDir,
    //  mask, pre-statement manifest stats — the splice path's inheritance)
    val cands = parts.groupBy(_.file).toSeq.sortBy(_._1).map { case (file, ps) =>
      val p = new Path(file)
      val rel = fs.makeQualified(p).toString.stripPrefix(rootQ).stripPrefix("/")
      val relDir = rel.lastIndexOf('/') match {
        case -1 => ""; case i => rel.substring(0, i)
      }
      val entry = manifest.get(rel)
      (file, ps.head.partCols, ps.head.partValues,
        entry.map(_.cols.filter(_.bloom.isDefined).map(_.name).toSet).getOrElse(Set.empty),
        entry.map(_.cols.filter(_.sketch.isDefined).map(_.name).toSet).getOrElse(Set.empty),
        replacementName(p.getName), relDir, ps.head.maskFile,
        entry.map(_.cols.map(cs => cs.name -> cs).toMap).getOrElse(Map.empty[String, StatsManifest.ColStats]))
    }

    // bucketing-key guard (ADVICE r11): a replaced row whose source
    // changes the bucket key would stay in its old __bucket=k directory
    // while bucket pruning routes lookups to the NEW value's bucket —
    // processFile value-checks the key per matched row (cheap: equality
    // is guaranteed whenever the bucket key is a merge key)
    val bucketIdx: Int =
      (try BucketSpecFile.read(root, hconf) catch { case _: Exception => None })
        .map(bs => tSchema.fieldIndex(bs._1)).getOrElse(-1)

    val sconf = new SerializableConfiguration(hconf)
    val outcomes =
      if (cands.isEmpty) Array.empty[VortexMergeSupport.Outcome]
      else spark.sparkContext.parallelize(cands, cands.length).map { c =>
        VortexMergeSupport.processFile(c, tSchema, keyIdx, keyTypes,
          bcRows.value, bucketIdx, sconf.value)
      }.collect()

    // driver commit + manifest write: the shared machinery (VortexCommit)
    val destructive = outcomes.filter(_.rewritten)
    MaintenanceCommit.commitAll(fs, "merge", maskBind,
      destructive.toSeq.map(o => MaintenanceCommit.Replacement(o.file, o.tmp, o.dstName)),
      remover)
    MaintenanceCommit.writeManifests(root, hconf, "merge",
      destructive.toSeq.map(o => (o.schemaJson, o.entry)))

    // append half: source rows no file matched. The driver holds the
    // (bounded) source already; unmatched rows stage through the normal
    // vortex write path into a DOT-HIDDEN scratch dir, then rename into
    // place under a name derived from the STATEMENT (md5 of the source
    // content + key columns): `part-merge-ins-<srcHash>.vortex`, one
    // per layout directory. That makes the insert half EXACTLY-ONCE
    // under crash re-runs: a directory that already holds this
    // statement's insert file — or its deterministic maintenance
    // replacement `part-merge-<md5(insert name)>` (the re-run's own
    // replace half rewrites the committed inserts' matched rows before
    // the append check runs) — is skipped, which is precisely what
    // catches NULL-key inserts (they can never match, so without the
    // marker every re-run would re-append them). The append is also
    // LAYOUT-AWARE: on a Hive-partitioned dataset inserted rows route
    // into partition directories (a flat append would STORE the
    // partition columns, drifting the schema of every later strict
    // read), and a bucketed dataset's marker spec routes buckets.
    val matched = new Array[Boolean](srcRows.length)
    outcomes.foreach(_.matchedOrdinals.foreach(i => matched(i) = true))
    val unmatchedIdx = srcRows.indices.filterNot(matched)
    val srcHash = VortexMergeSupport.sourceHash(srcRows, keyCols)
    val inserted = appendInserts(spark, fs, root, hconf, tSchema, listed,
      unmatchedIdx.map(srcRows(_)), srcHash, failAfterInserts)
    ttCtx.foreach(_.finish())

    MergeResult(cands.length,
      outcomes.count(!_.rewritten),
      destructive.length,
      outcomes.map(_.rowsUpdated).sum,
      inserted)
    } // MaintenanceLock.withLock
  }

  /** One `WHEN MATCHED [AND cond] THEN UPDATE/DELETE` clause. `cond`
    * and the UPDATE projection are expressions over the caller's
    * target ++ source attribute contexts (bound here by ordinal;
    * executors evaluate them on a JoinedRow(targetRow, sourceRow)).
    * `assigns` is the FULL target-schema projection for UPDATE —
    * unassigned columns carry the target attribute itself — or None
    * for DELETE. */
  final case class MatchedAction(
      cond: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      assigns: Option[Seq[org.apache.spark.sql.catalyst.expressions.Expression]])

  /** One `WHEN NOT MATCHED [AND cond] THEN INSERT` clause: cond and
    * the full target-schema projection, over the SOURCE attributes
    * only (unassigned columns insert NULL). */
  final case class NotMatchedAction(
      cond: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      values: Seq[org.apache.spark.sql.catalyst.expressions.Expression])

  /** Conditional-clause MERGE — the full ANSI shape
    * (`WHEN MATCHED [AND c] THEN UPDATE SET <subset> | DELETE`,
    * `WHEN NOT MATCHED [AND c] THEN INSERT`,
    * `WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET … | DELETE`),
    * same scale contract and crash discipline as [[merge]]: bounded
    * broadcast source, file-granular non-destructive tasks,
    * deterministic replacement names, exactly-once inserts. Clauses
    * evaluate IN ORDER within their family; the first whose condition
    * holds wins (ANSI); a row with no true clause is kept verbatim.
    * `targetAttrs`/`sourceAttrs` are the binding contexts the clause
    * expressions reference — targetAttrs must mirror the dataset
    * schema positionally; NOT MATCHED BY SOURCE expressions must
    * reference targetAttrs only (ANSI scoping — there IS no source row
    * for them). `clauseFingerprint` folds the clause list into the
    * statement identity for the exactly-once insert names.
    *
    * Scale note (disclosed full-scan shape): NOT MATCHED BY SOURCE
    * actions can touch ANY target row whose key is absent from the
    * source, so the statement plans EVERY file as a candidate — the
    * key-IN pushdown that prunes match-only merges cannot apply. That
    * is inherent to the semantics (the reference's host DB scans the
    * whole target too); the per-file tasks stay non-destructive and
    * untouched files are still detected and skipped at commit time. */
  def mergeClauses(spark: SparkSession, dir: String, source: DataFrame,
                   targetAttrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
                   sourceAttrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
                   keyIdxTarget: Array[Int], keyIdxSource: Array[Int],
                   matchedActions: Seq[MatchedAction],
                   notMatchedActions: Seq[NotMatchedAction],
                   // no default: the fingerprint is the exactly-once
                   // insert identity — two different statements sharing
                   // an accidental "" would dedupe each other's inserts
                   notMatchedBySourceActions: Seq[MatchedAction],
                   clauseFingerprint: String,
                   maxSourceRows: Int = 1 << 20,
                   pushKeyLimit: Int = 10000,
                   failAfterInserts: Int = -1,
                   // correlated scalar SET (r14): ANSI fires the
                   // cardinality error only when a duplicated source
                   // key actually MATCHES a targeted row — defer the
                   // duplicate check to match time instead of the
                   // statement-global broadcast-time require
                   ansiScalarDups: Boolean = false): MergeResult = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeSeq, BindReferences, Expression, UnsafeProjection, Predicate => CatalystPredicate}
    require(keyIdxTarget.nonEmpty && keyIdxTarget.length == keyIdxSource.length,
      "vortex merge: ON must be a conjunction of target-key = source-key equalities")
    require(matchedActions.nonEmpty || notMatchedActions.nonEmpty ||
        notMatchedBySourceActions.nonEmpty,
      "vortex merge: no WHEN clauses")
    val hconf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    // writer-vs-writer mutual exclusion (see MaintenanceLock)
    MaintenanceLock.withLock(fs, root, "merge") {
    val (listed, maskBind, repaired0) = MaintenancePhases("merge.repair_list") {
      MaintenanceCommit.repairStaleCompactions(fs, root)
      val (l, mb) = VortexDataSource.listAllWithMasks(Seq(dir), hconf, consistent = false)
      val r = MaintenanceCommit.repairStaleReplacements(fs, l.map(_._1)) +
        MaintenanceCommit.repairStaleUpdvAppends(fs, l.map(_._1), mb)
      (l, mb, r)
    }
    // time travel: pre-state generation + retirement (see VortexCommitLog); the
    // statement's own walk is reusable iff the repairs dropped nothing
    val ttCtx = MaintenancePhases("merge.log_begin") {
      VortexCommitLog.begin(spark, fs, root, hconf, "merge",
        if (repaired0 == 0) Some((listed, maskBind)) else None)
    }
    val remover = ttCtx.map(_.remover).getOrElse(MaintenanceCommit.PlainRemover)
    val target = MaintenancePhases("merge.target_load") {
      spark.read.format("vortex").load(dir)
    }
    val tSchema = target.schema
    require(targetAttrs.length == tSchema.length &&
      targetAttrs.zip(tSchema.fields).forall { case (a, f) =>
        a.name == f.name && a.dataType == f.dataType },
      "vortex merge: target binding context does not mirror the dataset schema")
    keyIdxTarget.zip(keyIdxSource).foreach { case (ti, si) =>
      require(tSchema.fields(ti).dataType == sourceAttrs(si).dataType,
        s"vortex merge: ON key types differ for ${tSchema.fields(ti).name} — " +
        "cast the source key to the target type") }
    val keyTypes = keyIdxTarget.map(tSchema.fields(_).dataType)
    val keyCols = keyIdxTarget.map(tSchema.fields(_).name).toSeq

    // source rows in the SOURCE's own schema/order (clause expressions
    // reference them positionally), bounded like merge's
    val capped = MaintenancePhases("merge.src_collect") {
      source.limit(maxSourceRows + 1)
        .queryExecution.toRdd.map(_.copy()).collect()
    }
    require(capped.length <= maxSourceRows,
      s"vortex merge: source exceeds maxSourceRows=$maxSourceRows — " +
      "merge broadcasts the source; batch it or raise the cap deliberately")
    val srcRows: Array[org.apache.spark.sql.catalyst.InternalRow] = capped
    val dupKeys: Set[Seq[Any]] = {
      val seen = new scala.collection.mutable.HashSet[Seq[Any]]
      if (ansiScalarDups) {
        require(notMatchedActions.isEmpty,
          "vortex merge: ansiScalarDups is a correlated-DML mode (no INSERT clauses)")
        val dups = new scala.collection.mutable.HashSet[Seq[Any]]
        srcRows.foreach { r =>
          val k = VortexMergeSupport.keyOf(r, keyIdxSource, keyTypes)
          if (k != null && !seen.add(k)) dups += k
        }
        dups.toSet
      } else {
        srcRows.foreach { r =>
          val k = VortexMergeSupport.keyOf(r, keyIdxSource, keyTypes)
          if (k != null)
            require(seen.add(k), s"vortex merge: duplicate source key $k")
        }
        Set.empty
      }
    }
    val bcRows = spark.sparkContext.broadcast(srcRows)
    val bcDupKeys = spark.sparkContext.broadcast(dupKeys)

    // bind clause expressions: matched over target ++ source, not-
    // matched over source only, not-matched-BY-source over target only
    // (RuntimeReplaceable rewritten first — interpreted eval of
    // BETWEEN/nvl/… asserts otherwise)
    val joinedCtx = AttributeSeq(targetAttrs ++ sourceAttrs)
    def bindJ(e: Expression): Expression =
      BindReferences.bindReference(VortexDelete.replaceRuntime(e), joinedCtx)
    val srcCtx = AttributeSeq(sourceAttrs)
    def bindS(e: Expression): Expression =
      BindReferences.bindReference(VortexDelete.replaceRuntime(e), srcCtx)
    val tgtCtx = AttributeSeq(targetAttrs)
    def bindT(e: Expression): Expression =
      BindReferences.bindReference(VortexDelete.replaceRuntime(e), tgtCtx)
    (matchedActions.flatMap(a => a.cond.toSeq ++ a.assigns.toSeq.flatten) ++
     notMatchedActions.flatMap(a => a.cond.toSeq ++ a.values) ++
     notMatchedBySourceActions.flatMap(a => a.cond.toSeq ++ a.assigns.toSeq.flatten))
      .foreach(e =>
        require(e.deterministic, "vortex merge: clause expressions must be deterministic"))
    val boundMatched: Seq[(Option[Expression], Option[Seq[Expression]])] =
      matchedActions.map(a => (a.cond.map(bindJ), a.assigns.map(_.map(bindJ))))
    val boundNotMatched: Seq[(Option[Expression], Seq[Expression])] =
      notMatchedActions.map(a => (a.cond.map(bindS), a.values.map(bindS)))
    val boundNmbs: Seq[(Option[Expression], Option[Seq[Expression]])] =
      notMatchedBySourceActions.map(a => (a.cond.map(bindT), a.assigns.map(_.map(bindT))))

    // candidate planning: push `key IN (...)` for a small single-col
    // key set of a pushable type (same discipline as merge). A NOT
    // MATCHED BY SOURCE clause defeats the push entirely — any target
    // row ANYWHERE may be acted on, so every file is a candidate (the
    // disclosed full-scan shape; see the scaladoc).
    val keyValuesForPush: Option[Seq[Any]] =
      if (notMatchedBySourceActions.isEmpty &&
          keyIdxTarget.length == 1 && srcRows.length <= pushKeyLimit &&
          VortexMergeSupport.pushableKeyType(keyTypes(0))) {
        val vs = srcRows.toSeq.map(_.get(keyIdxSource(0), keyTypes(0)))
          .filter(_ != null).map(VortexMergeSupport.toExternal(_, keyTypes(0)))
        if (vs.nonEmpty) Some(vs) else None
      } else None
    val filtered = keyValuesForPush match {
      case Some(vs) => target.filter(col(s"`${keyCols.head}`").isInCollection(vs))
      case None => target
    }
    val cands = MaintenancePhases("merge.plan_candidates") {
    val parts = filtered.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.flatMap(_.inputPartitions).collect { case v: VortexInputPartition => v }

    val rootQ = fs.makeQualified(root).toString
    val manifest = StatsManifest.read(root, hconf)
    parts.groupBy(_.file).toSeq.sortBy(_._1).map { case (file, ps) =>
      val p = new Path(file)
      val rel = fs.makeQualified(p).toString.stripPrefix(rootQ).stripPrefix("/")
      val relDir = rel.lastIndexOf('/') match {
        case -1 => ""; case i => rel.substring(0, i)
      }
      val entry = manifest.get(rel)
      (file, ps.head.partCols, ps.head.partValues,
        entry.map(_.cols.filter(_.bloom.isDefined).map(_.name).toSet).getOrElse(Set.empty),
        entry.map(_.cols.filter(_.sketch.isDefined).map(_.name).toSet).getOrElse(Set.empty),
        replacementName(p.getName), relDir, ps.head.maskFile,
        entry.map(_.cols.map(cs => cs.name -> cs).toMap).getOrElse(Map.empty[String, StatsManifest.ColStats]))
    }
    }

    // bucketing-key guard (ADVICE r11) — see mergeImpl
    val bucketIdx: Int =
      (try BucketSpecFile.read(root, hconf) catch { case _: Exception => None })
        .map(bs => tSchema.fieldIndex(bs._1)).getOrElse(-1)

    val sconf = new SerializableConfiguration(hconf)
    val outcomes = MaintenancePhases("merge.file_tasks") {
      if (cands.isEmpty) Array.empty[VortexMergeSupport.ClauseOutcome]
      else spark.sparkContext.parallelize(cands, cands.length).map { c =>
        VortexMergeSupport.processFileClauses(c, tSchema, keyIdxTarget, keyIdxSource,
          keyTypes, bcRows.value, boundMatched, boundNmbs, bucketIdx, sconf.value,
          bcDupKeys.value)
      }.collect()
    }

    val destructive = MaintenancePhases("merge.commit") {
      // driver commit: drop-whole (every live row deleted) + rewrites
      outcomes.filter(_.status == 1).foreach { o =>
        val src = new Path(o.file)
        if (!remover.remove(fs, src))
          throw new java.io.IOException(s"vortex merge: failed to delete ${o.file}")
        MaintenanceCommit.dropMasks(fs, maskBind, o.file, remover)
      }
      val d = outcomes.filter(_.status == 2)
      MaintenanceCommit.commitAll(fs, "merge", maskBind,
        d.toSeq.map(o => MaintenanceCommit.Replacement(o.file, o.tmp, o.dstName)),
        remover)
      MaintenanceCommit.writeManifests(root, hconf, "merge",
        d.toSeq.map(o => (o.schemaJson, o.entry)))
      d
    }

    // insert half: unmatched source rows through the NOT MATCHED
    // clauses (first true condition wins; none → skip), driver-side —
    // the source is bounded by contract
    val matchedArr = new Array[Boolean](srcRows.length)
    outcomes.foreach(_.matchedOrdinals.foreach(i => matchedArr(i) = true))
    val nmPreds = boundNotMatched.map(_._1.map { e =>
      val p = CatalystPredicate.create(e); p.initialize(0); p })
    val nmProjs = boundNotMatched.map(a => UnsafeProjection.create(a._2))
    val insertRows = srcRows.indices.filterNot(matchedArr).flatMap { i =>
      val r = srcRows(i)
      boundNotMatched.indices
        .find(j => nmPreds(j).forall(_.eval(r)))
        .map(j => nmProjs(j)(r).copy()
          : org.apache.spark.sql.catalyst.InternalRow)
    }
    val srcHash = VortexMergeSupport.sourceHash(srcRows,
      keyCols :+ s"clauses:$clauseFingerprint")
    val inserted = MaintenancePhases("merge.insert_append") {
      appendInserts(spark, fs, root, hconf, tSchema, listed,
        insertRows, srcHash, failAfterInserts)
    }
    MaintenancePhases("merge.tt_finish") { ttCtx.foreach(_.finish()) }

    MergeResult(cands.length,
      outcomes.count(_.status == 0),
      destructive.length,
      outcomes.map(_.rowsUpdated).sum,
      inserted,
      outcomes.map(_.rowsDeleted).sum,
      outcomes.count(_.status == 1))
    } // MaintenanceLock.withLock
  }

  /** The shared insert half: stage `rows` (target-schema Catalyst rows)
    * through the normal vortex writer into a dot-hidden scratch dir,
    * then rename one file per layout directory into place under the
    * statement-derived name `part-merge-ins-<srcHash>.vortex` — a
    * directory already holding this statement's insert file (or its
    * deterministic maintenance replacement) is skipped, which makes
    * the insert half exactly-once under crash re-runs (see the class
    * scaladoc). Returns the number of rows actually inserted. */
  private def appendInserts(spark: SparkSession,
                            fs: org.apache.hadoop.fs.FileSystem,
                            root: Path,
                            hconf: org.apache.hadoop.conf.Configuration,
                            tSchema: StructType,
                            listed: Seq[(org.apache.hadoop.fs.FileStatus, Seq[(String, String)])],
                            rows: Seq[org.apache.spark.sql.catalyst.InternalRow],
                            srcHash: String,
                            failAfterInserts: Int): Long = {
    if (rows.isEmpty) return 0L
    // NOT NULL enforcement (found r12): a NULL bound for a
    // non-nullable target column would ride silently through the
    // Row→InternalRow conversion as the type's ZERO value (Spark's
    // UnsafeProjection reads the null slot as 0 when the schema says
    // non-nullable) — fail the statement loudly instead, like ANSI.
    locally {
      val nn = tSchema.fields.zipWithIndex.filterNot(_._1.nullable)
      if (nn.nonEmpty) rows.foreach(r => nn.foreach { case (f, i) =>
        require(!r.isNullAt(i),
          s"vortex merge: INSERT would write NULL into non-nullable " +
          s"column ${f.name} — make the column nullable (rewrite) or " +
          "fix the source") })
    }
    var inserted = 0L
    val insBase = s"part-merge-ins-$srcHash.vortex"
    val insRepl = replacementName(insBase)
    val stage = new Path(root, s".merge-stage-$srcHash")
    fs.delete(stage, true) // leftover scratch of a crashed run
    import scala.jdk.CollectionConverters._
    val layoutPartCols = listed.flatMap(_._2.map(_._1)).distinct
      .filterNot(_ == BucketSpecFile.BucketCol)
    val bucketSpec =
      try BucketSpecFile.read(root, hconf) catch { case _: Exception => None }
    if (layoutPartCols.isEmpty && bucketSpec.isEmpty) {
      // driver-direct staging (r15, MergeProbe finding): the insert set
      // is bounded driver state by merge's contract, and routing it
      // through a Spark write job costs a whole job launch (~0.12-0.19 s
      // at sf1) to move a few thousand rows. One VortexFileWriter call
      // produces the identical file + manifest segment. Partitioned /
      // bucketed layouts keep the distributed writer (their routing
      // lives in the DSv2 path).
      fs.mkdirs(stage)
      val f = new Path(stage, "part-d00000.vortex")
      val w = new VortexFileWriter(f, hconf, tSchema)
      rows.foreach(w.write)
      w.close()
      val footer = VortexFileReader.readFooter(f, hconf)
      val base = StatsManifest.fromFooter(f.getName,
        fs.getFileStatus(f).getLen, footer)
      val sums = tSchema.fieldNames.zip(w.columnSums).toMap
      val entry = base.copy(cols = base.cols.map(c =>
        c.copy(sum = sums.getOrElse(c.name, None))))
      MaintenanceCommit.writeManifests(stage, hconf, "merge-ins",
        Seq((footer.schema.json, entry)))
    } else {
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(tSchema)
      val ext = rows.map(r => conv(r).asInstanceOf[org.apache.spark.sql.Row])
      var w = spark.createDataFrame(ext.asJava, tSchema)
        .coalesce(1).write.format("vortex").mode("overwrite")
      if (layoutPartCols.nonEmpty)
        w = w.option("partitionBy", layoutPartCols.mkString(","))
      // the staging dir carries no bucket marker — pass the dataset's
      // spec explicitly so bucket routing survives the indirection
      bucketSpec.foreach { case (k, n) =>
        w = w.option("bucketBy", k).option("buckets", n.toString) }
      w.save(stage.toString)
    }
    // scratch cleanup rides a finally: a crash mid-rename must not
    // strand a full staged copy of the insert set inside the dataset
    // (the name embeds the statement hash — no other statement would
    // ever clean it; renamed files are already out of the scratch dir,
    // so deleting it is always safe) — review-found r11
    try {
    val stageQ = fs.makeQualified(stage).toString
    val (stSchema, stEntries) = StatsManifest.readAll(stage, hconf)
    val renamedEntries = scala.collection.mutable.ArrayBuffer[StatsManifest.FileStats]()
    // manifest state before this run, read lazily — only the crash-
    // repair skip branch below consults it
    lazy val preManifest = StatsManifest.read(root, hconf)
    val backfillEntries = scala.collection.mutable.ArrayBuffer[(String, StatsManifest.FileStats)]()
    VortexDataSource.listAll(Seq(stage.toString), hconf).foreach { case (st, _) =>
      val rel = fs.makeQualified(st.getPath).toString
        .stripPrefix(stageQ).stripPrefix("/")
      val relDir = rel.lastIndexOf('/') match {
        case -1 => ""; case i => rel.substring(0, i)
      }
      val finalDir = if (relDir.isEmpty) root else new Path(root, relDir)
      val dstRel = if (relDir.isEmpty) insBase else s"$relDir/$insBase"
      if (!fs.exists(new Path(finalDir, insBase)) &&
          !fs.exists(new Path(finalDir, insRepl))) {
        if (failAfterInserts >= 0 && renamedEntries.length >= failAfterInserts)
          throw new RuntimeException(
            s"vortex merge: injected crash after $failAfterInserts insert renames (test seam)")
        fs.mkdirs(finalDir)
        if (!fs.rename(st.getPath, new Path(finalDir, insBase)))
          throw new java.io.IOException(
            s"vortex merge: insert rename failed for $finalDir/$insBase")
        stEntries.get(rel).foreach { e =>
          renamedEntries += e.copy(relPath = dstRel)
          inserted += e.rows
        }
      } else {
        // this directory's inserts committed in a prior run of this
        // same statement — skipping the rename is the exactly-once
        // path. But a crash BETWEEN that run's rename and its manifest
        // write leaves the committed file permanently uncovered
        // (ADVICE r11): backfill its entry from its own footer. (The
        // staged copy's entry can't serve — collect order varies, so
        // its len may differ from the committed file's.) rowsInserted
        // stays 0 for skipped directories: the rows were counted by
        // the run that committed them.
        val committed = new Path(finalDir, insBase)
        if (fs.exists(committed)) {
          val cLen = fs.getFileStatus(committed).getLen
          if (!preManifest.get(dstRel).exists(_.len == cLen)) {
            try {
              val f = VortexFileReader.readFooter(committed, hconf)
              backfillEntries += ((f.schema.json,
                StatsManifest.fromFooter(dstRel, cLen, f)))
            } catch { case _: Exception => () } // conservative: stays uncovered
          }
        }
      }
    }
    stSchema.map(_.json).foreach { sj =>
      MaintenanceCommit.writeManifests(root, hconf, "merge-ins",
        renamedEntries.toSeq.map(e => (sj, e)))
    }
    if (backfillEntries.nonEmpty)
      MaintenanceCommit.writeManifests(root, hconf, "merge-ins-backfill",
        backfillEntries.toSeq)
    } finally fs.delete(stage, true)
    inserted
  }
}

/** executor-side half of [[VortexMerge]] (kept out of the closure-heavy
  * driver object so tasks serialize only what they need) */
private[vortex] object VortexMergeSupport {

  final case class Outcome(file: String, rewritten: Boolean, rowsUpdated: Long,
                           tmp: String, dstName: String,
                           entry: StatsManifest.FileStats, schemaJson: String,
                           matchedOrdinals: Array[Int])

  /** Statement identity for the insert half: md5 over the key columns
    * and the SORTED per-row digests of the full source content —
    * order-insensitive (collect order varies run to run), stable
    * across re-runs of the same statement. */
  def sourceHash(rows: Array[org.apache.spark.sql.catalyst.InternalRow],
                 keyCols: Seq[String]): String = {
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    def md5(b: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(b)
    val rowDigests = rows.map {
      case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow => hex(md5(u.getBytes))
      case other => hex(md5(other.toString.getBytes("UTF-8")))
    }.sorted
    hex(md5((keyCols.mkString(",") + "|" + rowDigests.mkString)
      .getBytes("UTF-8"))).take(16)
  }

  /** Catalyst storage value → external literal (for isInCollection) */
  def toExternal(v: Any, dt: org.apache.spark.sql.types.DataType): Any = v match {
    case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    case other => other
  }

  /** key types whose storage value converts to a pushable literal via
    * [[toExternal]] — timestamp/date (micros/days longs would build
    * a type-mismatched IN) and binary are excluded */
  def pushableKeyType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType |
           BooleanType | StringType => true
      case _: DecimalType => true
      case _ => false
    }
  }

  /** normalized key of a row, or null when ANY component is NULL
    * (ANSI MERGE: NULL matches nothing). Array[Byte] components wrap
    * to Seqs so binary keys get value equality. */
  def keyOf(r: org.apache.spark.sql.catalyst.InternalRow,
            keyIdx: Array[Int],
            keyTypes: Array[org.apache.spark.sql.types.DataType]): Seq[Any] = {
    val out = new Array[Any](keyIdx.length)
    var j = 0
    while (j < keyIdx.length) {
      val v = r.get(keyIdx(j), keyTypes(j))
      if (v == null) return null
      out(j) = v match {
        case a: Array[Byte] => a.toSeq
        case o => o
      }
      j += 1
    }
    out.toSeq
  }

  /** status: 0 untouched, 1 drop whole (every live row deleted),
    * 2 rewritten. matchedOrdinals marks KEY-level matches (ANSI: a
    * source row is NOT MATCHED only when no target row shares its
    * key, regardless of which clause fired). */
  final case class ClauseOutcome(file: String, status: Int,
                                 rowsUpdated: Long, rowsDeleted: Long,
                                 tmp: String, dstName: String,
                                 entry: StatsManifest.FileStats, schemaJson: String,
                                 matchedOrdinals: Array[Int])

  def processFileClauses(
      c: (String, Array[String], Array[String], Set[String], Set[String], String, String, String, Map[String, StatsManifest.ColStats]),
      tSchema: StructType, keyIdxT: Array[Int], keyIdxS: Array[Int],
      keyTypes: Array[org.apache.spark.sql.types.DataType],
      srcRows: Array[org.apache.spark.sql.catalyst.InternalRow],
      boundMatched: Seq[(Option[org.apache.spark.sql.catalyst.expressions.Expression],
                         Option[Seq[org.apache.spark.sql.catalyst.expressions.Expression]])],
      boundNmbs: Seq[(Option[org.apache.spark.sql.catalyst.expressions.Expression],
                      Option[Seq[org.apache.spark.sql.catalyst.expressions.Expression]])],
      bucketIdx: Int,
      conf: org.apache.hadoop.conf.Configuration,
      // keys with >1 source row (correlated scalar SET mode): a target
      // row matching one of these errors iff a clause condition fires
      // for it (ANSI scalar cardinality — the subquery only evaluates
      // for targeted rows); conds in this mode are target-only
      dupKeys: Set[Seq[Any]] = Set.empty): ClauseOutcome = {
    import org.apache.spark.sql.catalyst.expressions.{JoinedRow, UnsafeProjection, Predicate => CatalystPredicate}
    val (file, partCols, partValues, bloomCols, sketchCols, dstName, relDir, maskFile, oldCols) = c
    val path = new Path(file)
    val fs = path.getFileSystem(conf)
    val footer = VortexFileReader.readFooter(path, conf)

    val byKey = new java.util.HashMap[Seq[Any], java.lang.Integer](srcRows.length * 2)
    var si = 0
    while (si < srcRows.length) {
      val k = keyOf(srcRows(si), keyIdxS, keyTypes)
      if (k != null) byKey.put(k, si)
      si += 1
    }

    // pass 1: probe key columns only (mask-aware)
    val keySchema = StructType(keyIdxT.map(tSchema.fields(_)))
    val probeIdx = keyIdxT.indices.toArray
    val matchedSet = new java.util.BitSet(srcRows.length)
    locally {
      val part = VortexInputPartition(file, footer.chunks.indices.toArray,
        partCols, partValues, maskFile = maskFile)
      val r = new VortexPartitionReader(part, conf, keySchema, evolution = true)
      try while (r.next()) {
        val k = keyOf(r.get(), probeIdx, keyTypes)
        val hit = if (k == null) null else byKey.get(k)
        if (hit != null) matchedSet.set(hit.intValue())
      } finally r.close()
    }
    def ords: Array[Int] = {
      val buf = scala.collection.mutable.ArrayBuffer[Int]()
      var b = matchedSet.nextSetBit(0)
      while (b >= 0) { buf += b; b = matchedSet.nextSetBit(b + 1) }
      buf.toArray
    }
    // NOT MATCHED BY SOURCE clauses can fire on rows pass 1 never
    // probed — only a file with neither key hits nor NMBS clauses is
    // provably untouched here; otherwise pass 2 decides
    if ((matchedSet.isEmpty || boundMatched.isEmpty) && boundNmbs.isEmpty)
      return ClauseOutcome(file, 0, 0L, 0L, null, null, null, null, ords)

    // column-splice fast path (r15, VERDICT r14 next #2/#3): when every
    // clause is an UPDATE (no DELETE can fire → row count/order
    // preserved) and the file carries no mask, re-encode only the
    // assigned columns and pass the rest through byte-for-byte. The
    // correlated-DML statements (s15d/s15e shapes) ride this: their
    // single-column SETs rewrite 1 of N columns per file.
    if (maskFile == null && boundMatched.forall(_._2.isDefined) &&
        boundNmbs.forall(_._2.isDefined)) {
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      val targetWidth = tSchema.length
      // changed target ordinals: positions whose assignment is not the
      // identity BoundReference(p) (fullUpdateProjection keeps the
      // original attribute for unassigned columns)
      def changedOf(assigns: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Seq[Int] =
        assigns.zipWithIndex.collect {
          case (e, p) if !(e.isInstanceOf[BoundReference] &&
            e.asInstanceOf[BoundReference].ordinal == p) => p
        }
      val changedPos: Set[Int] =
        (boundMatched.flatMap(a => changedOf(a._2.get)) ++
         boundNmbs.flatMap(a => changedOf(a._2.get))).toSet
      def targetRefs(e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[Int] =
        e.collect { case b: BoundReference if b.ordinal < targetWidth => b.ordinal }
      val needed: Set[Int] =
        (keyIdxT.toSeq ++
         boundMatched.flatMap(_._1.toSeq.flatMap(targetRefs)) ++
         boundNmbs.flatMap(_._1.toSeq.flatMap(targetRefs)) ++
         boundMatched.flatMap(_._2.get.zipWithIndex.collect {
           case (e, p) if changedPos.contains(p) => e }.flatMap(targetRefs)) ++
         boundNmbs.flatMap(_._2.get.zipWithIndex.collect {
           case (e, p) if changedPos.contains(p) => e }.flatMap(targetRefs))).toSet
      val changedNames = changedPos.map(tSchema.fields(_).name)
      // a changed bucketing key needs pass 2's per-row value guard
      val spliceOk = !(bucketIdx >= 0 && changedPos.contains(bucketIdx))
      val planOpt =
        if (spliceOk) ColumnSplice.plan(footer, maskFile, tSchema, changedNames, needed)
        else None
      planOpt.foreach { pl =>
        val posOf: Array[Int] = pl.changedFileCols.map(pl.fileToTable(_))
        val matchedProjs = boundMatched.map(a =>
          UnsafeProjection.create(posOf.toSeq.map(a._2.get(_))))
        val nmbsProjs2 = boundNmbs.map(a =>
          UnsafeProjection.create(posOf.toSeq.map(a._2.get(_))))
        val matchedPreds = boundMatched.map(_._1.map { e =>
          val p = CatalystPredicate.create(e); p.initialize(0); p })
        val nmbsPreds2 = boundNmbs.map(_._1.map { e =>
          val p = CatalystPredicate.create(e); p.initialize(0); p })
        val patcher = new ColumnSplice.RowPatch {
          private val joined = new JoinedRow
          override def patch(t: org.apache.spark.sql.catalyst.InternalRow)
              : org.apache.spark.sql.catalyst.InternalRow = {
            val k = VortexMergeSupport.keyOf(t, keyIdxT, keyTypes)
            val hit = if (k == null) null else byKey.get(k)
            if (hit == null) {
              var j = 0
              while (j < boundNmbs.length) {
                if (nmbsPreds2(j).forall(_.eval(t))) return nmbsProjs2(j)(t)
                j += 1
              }
              null
            } else if (dupKeys.contains(k)) {
              joined(t, srcRows(hit.intValue()))
              if (matchedPreds.indices.exists(j => matchedPreds(j).forall(_.eval(joined))))
                throw new IllegalStateException(
                  "vortex merge: scalar subquery produced more than one row " +
                  s"for key $k (ANSI cardinality)")
              null // not targeted — the duplicate is harmless
            } else {
              joined(t, srcRows(hit.intValue()))
              var j = 0
              while (j < boundMatched.length) {
                if (matchedPreds(j).forall(_.eval(joined))) return matchedProjs(j)(joined)
                j += 1
              }
              null
            }
          }
        }
        val tmpS = new Path(path.getParent,
          s".$dstName.${java.util.UUID.randomUUID().toString.take(8)}.inprogress")
        val relS = if (relDir.isEmpty) dstName else s"$relDir/$dstName"
        val r = ColumnSplice.rewrite(path, tmpS, conf, footer, tSchema, pl,
          patcher, bloomCols, sketchCols, oldCols, relS)
        if (r.updated == 0L) {
          fs.delete(tmpS, false)
          return ClauseOutcome(file, 0, 0L, 0L, null, null, null, null, ords)
        }
        return ClauseOutcome(file, 2, r.updated, 0L, tmpS.toString, dstName,
          r.entry, r.schemaJson, ords)
      }
    }

    // pass 2: rewrite, clauses in order, first true condition wins
    val tmp = new Path(path.getParent,
      s".$dstName.${java.util.UUID.randomUUID().toString.take(8)}.inprogress")
    val fileFields = footer.schema.fields
    val storedNames = fileFields.map(_.name).toSet
    val partSet = partCols.toSet
    tSchema.fields.foreach(f =>
      if (!storedNames.contains(f.name) && !partSet.contains(f.name))
        throw new IllegalArgumentException(
          s"vortex merge: target file $file does not store column ${f.name} " +
          "(schema-evolved file) — compact/rewrite the dataset to one schema first"))
    val partIdx: Array[Int] = tSchema.fields.zipWithIndex.collect {
      case (f, i) if partSet.contains(f.name) && !storedNames.contains(f.name) => i
    }
    def valEq(a: Any, b: Any): Boolean = (a, b) match {
      case (null, null) => true
      case (null, _) | (_, null) => false
      case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
      case (x, y) => x == y
    }
    val slot: Array[Int] = fileFields.map(f => tSchema.fieldIndex(f.name))
    val preds = boundMatched.map(_._1.map { e =>
      val p = CatalystPredicate.create(e); p.initialize(0); p })
    val projs = boundMatched.map(_._2.map(es => UnsafeProjection.create(es)))
    val nmbsPreds = boundNmbs.map(_._1.map { e =>
      val p = CatalystPredicate.create(e); p.initialize(0); p })
    val nmbsProjs = boundNmbs.map(_._2.map(es => UnsafeProjection.create(es)))
    val writer = new VortexFileWriter(tmp, conf, footer.schema,
      bloomCols = bloomCols, sketchCols = sketchCols)
    var updated = 0L
    var deleted = 0L
    var written = 0L
    val joined = new JoinedRow
    try {
      val part = VortexInputPartition(file, footer.chunks.indices.toArray,
        partCols, partValues, maskFile = maskFile)
      val r = new VortexPartitionReader(part, conf, tSchema, evolution = true)
      val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fileFields.length)
      def emit(src: org.apache.spark.sql.catalyst.InternalRow): Unit = {
        var i = 0
        while (i < slot.length) {
          out.update(i, src.get(slot(i), fileFields(i).dataType)); i += 1
        }
        writer.write(out)
        written += 1
      }
      // partition/bucket movement guards, shared by the MATCHED and
      // NOT MATCHED BY SOURCE update paths (ADVICE r11)
      def guardMove(row: org.apache.spark.sql.catalyst.InternalRow,
                    upd: org.apache.spark.sql.catalyst.InternalRow): Unit = {
        var pi = 0
        while (pi < partIdx.length) {
          val ti = partIdx(pi)
          val dt = tSchema.fields(ti).dataType
          if (!valEq(row.get(ti, dt), upd.get(ti, dt)))
            throw new IllegalArgumentException(
              s"vortex merge: UPDATE clause changes partition column " +
              s"${tSchema.fields(ti).name} — the in-place rewrite cannot " +
              "move rows between partition directories")
          pi += 1
        }
        if (bucketIdx >= 0) {
          val dt = tSchema.fields(bucketIdx).dataType
          if (!valEq(row.get(bucketIdx, dt), upd.get(bucketIdx, dt)))
            throw new IllegalArgumentException(
              s"vortex merge: UPDATE clause changes bucketing key " +
              s"${tSchema.fields(bucketIdx).name} — the in-place rewrite " +
              "cannot move rows between bucket directories")
        }
      }
      try while (r.next()) {
        val row = r.get()
        val k = keyOf(row, keyIdxT, keyTypes)
        val hit = if (k == null) null else byKey.get(k)
        if (hit == null) {
          // no source match: the NOT MATCHED BY SOURCE family applies
          // (first true condition wins; none/empty → keep verbatim)
          boundNmbs.indices.find(j => nmbsPreds(j).forall(_.eval(row))) match {
            case Some(j) if nmbsProjs(j).isEmpty => deleted += 1 // DELETE: skip
            case Some(j) =>
              val upd = nmbsProjs(j).get(row)
              guardMove(row, upd)
              updated += 1
              emit(upd)
            case None => emit(row)
          }
        } else if (dupKeys.contains(k)) {
          // >1 source row for this key: ANSI errors iff a clause would
          // actually fire for this row (its cond is target-only in this
          // mode — pair with an arbitrary duplicate for the eval)
          joined(row, srcRows(hit.intValue()))
          if (boundMatched.indices.exists(j => preds(j).forall(_.eval(joined))))
            throw new IllegalStateException(
              "vortex merge: scalar subquery produced more than one row " +
              s"for key $k (ANSI cardinality)")
          emit(row) // not targeted — the duplicate is harmless
        } else {
          joined(row, srcRows(hit.intValue()))
          boundMatched.indices.find(j => preds(j).forall(_.eval(joined))) match {
            case Some(j) if projs(j).isEmpty => deleted += 1 // DELETE: skip
            case Some(j) =>
              val upd = projs(j).get(joined)
              guardMove(row, upd)
              updated += 1
              emit(upd)
            case None => emit(row) // no clause fired: keep verbatim
          }
        }
      } finally r.close()
      writer.close()
    } catch { case e: Throwable => fs.delete(tmp, false); throw e }

    if (updated == 0L && deleted == 0L) {
      // key hits but no clause condition fired anywhere — untouched
      fs.delete(tmp, false)
      return ClauseOutcome(file, 0, 0L, 0L, null, null, null, null, ords)
    }
    if (written == 0L) {
      // every live row deleted: drop the file whole (driver commits)
      fs.delete(tmp, false)
      return ClauseOutcome(file, 1, updated, deleted, null, null, null, null, ords)
    }
    def named[T](xs: IndexedSeq[Option[T]]): Map[String, T] =
      fileFields.map(_.name).zip(xs).collect { case (n, Some(v)) => n -> v }.toMap
    val sums = named(writer.columnSums)
    val blooms = named(writer.columnBlooms)
    val sketches = named(writer.columnSketches)
    val rel = if (relDir.isEmpty) dstName else s"$relDir/$dstName"
    val tmpFooter = VortexFileReader.readFooter(tmp, conf)
    val base = StatsManifest.fromFooter(rel, fs.getFileStatus(tmp).getLen, tmpFooter)
    val entry = base.copy(cols = base.cols.map(col => col.copy(
      sum = sums.get(col.name), bloom = blooms.get(col.name),
      sketch = sketches.get(col.name))))
    ClauseOutcome(file, 2, updated, deleted, tmp.toString, dstName,
      entry, tmpFooter.schema.json, ords)
  }

  def processFile(c: (String, Array[String], Array[String], Set[String], Set[String], String, String, String, Map[String, StatsManifest.ColStats]),
                  tSchema: StructType, keyIdx: Array[Int],
                  keyTypes: Array[org.apache.spark.sql.types.DataType],
                  srcRows: Array[org.apache.spark.sql.catalyst.InternalRow],
                  bucketIdx: Int,
                  conf: org.apache.hadoop.conf.Configuration): Outcome = {
    val (file, partCols, partValues, bloomCols, sketchCols, dstName, relDir, maskFile, _) = c
    val path = new Path(file)
    val fs = path.getFileSystem(conf)
    val footer = VortexFileReader.readFooter(path, conf)

    // key → source ordinal (built per task from the broadcast array;
    // normalized via keyOf: value equality incl. binary, NULL keys
    // excluded — they match nothing)
    val byKey = new java.util.HashMap[Seq[Any], java.lang.Integer](srcRows.length * 2)
    var si = 0
    while (si < srcRows.length) {
      val k = keyOf(srcRows(si), keyIdx, keyTypes)
      if (k != null) byKey.put(k, si)
      si += 1
    }

    // pass 1: probe key columns only (mask-aware: dead rows can't match)
    val keySchema = StructType(keyIdx.map(tSchema.fields(_)))
    val probeIdx = keyIdx.indices.toArray // key cols are 0..n-1 in keySchema
    val matchedSet = new java.util.BitSet(srcRows.length)
    locally {
      val part = VortexInputPartition(file, footer.chunks.indices.toArray,
        partCols, partValues, maskFile = maskFile)
      val r = new VortexPartitionReader(part, conf, keySchema, evolution = true)
      try while (r.next()) {
        val k = keyOf(r.get(), probeIdx, keyTypes)
        val hit = if (k == null) null else byKey.get(k)
        if (hit != null) matchedSet.set(hit.intValue())
      } finally r.close()
    }
    if (matchedSet.isEmpty)
      return Outcome(file, rewritten = false, 0L, null, null, null, null, Array.empty)

    // pass 2: rewrite with matched rows replaced by their source row
    val tmp = new Path(path.getParent,
      s".$dstName.${java.util.UUID.randomUUID().toString.take(8)}.inprogress")
    val fileFields = footer.schema.fields
    // the rewrite keeps the file's OWN stored schema — a table column
    // this file never stored would silently discard the source row's
    // value, violating the "replaced by the source row" contract.
    // Partition columns are legitimately unstored (the directory
    // encodes them) and are value-checked per matched row below; any
    // OTHER missing column is schema evolution — fail the job (tasks
    // are non-destructive; no commit happens) instead of merging wrong.
    val storedNames = fileFields.map(_.name).toSet
    val partSet = partCols.toSet
    tSchema.fields.foreach(f =>
      if (!storedNames.contains(f.name) && !partSet.contains(f.name))
        throw new IllegalArgumentException(
          s"vortex merge: target file $file does not store column " +
          s"${f.name} the source carries (schema-evolved file) — " +
          "rewriting would silently drop the source value; " +
          "compact/rewrite the dataset to one schema first"))
    // table ordinals of partition columns (never stored): a matched
    // source row whose partition value differs from the file's would
    // silently keep the OLD value — reject, the in-place rewrite
    // cannot move rows between partition directories
    val partIdx: Array[Int] = tSchema.fields.zipWithIndex.collect {
      case (f, i) if partSet.contains(f.name) && !storedNames.contains(f.name) => i
    }
    def valEq(a: Any, b: Any): Boolean = (a, b) match {
      case (null, null) => true
      case (null, _) | (_, null) => false
      case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
      case (x, y) => x == y
    }
    val slot: Array[Int] = fileFields.map(f => tSchema.fieldIndex(f.name))
    val writer = new VortexFileWriter(tmp, conf, footer.schema,
      bloomCols = bloomCols, sketchCols = sketchCols)
    var updated = 0L
    try {
      val part = VortexInputPartition(file, footer.chunks.indices.toArray,
        partCols, partValues, maskFile = maskFile)
      val r = new VortexPartitionReader(part, conf, tSchema, evolution = true)
      val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fileFields.length)
      try while (r.next()) {
        val row = r.get()
        val k = keyOf(row, keyIdx, keyTypes)
        val hit = if (k == null) null else byKey.get(k)
        if (hit != null) {
          var pi = 0
          while (pi < partIdx.length) {
            val ti = partIdx(pi)
            val dt = tSchema.fields(ti).dataType
            if (!valEq(row.get(ti, dt), srcRows(hit.intValue()).get(ti, dt)))
              throw new IllegalArgumentException(
                s"vortex merge: source row for key $k changes partition " +
                s"column ${tSchema.fields(ti).name} — the in-place rewrite " +
                "cannot move rows between partition directories; " +
                "DELETE + re-INSERT such rows instead")
            pi += 1
          }
          if (bucketIdx >= 0) {
            val dt = tSchema.fields(bucketIdx).dataType
            if (!valEq(row.get(bucketIdx, dt),
                srcRows(hit.intValue()).get(bucketIdx, dt)))
              throw new IllegalArgumentException(
                s"vortex merge: source row for key $k changes bucketing key " +
                s"${tSchema.fields(bucketIdx).name} — the in-place rewrite " +
                "cannot move rows between bucket directories; " +
                "DELETE + re-INSERT such rows instead")
          }
        }
        val src = if (hit != null) { updated += 1; srcRows(hit.intValue()) } else row
        var i = 0
        while (i < slot.length) {
          out.update(i, src.get(slot(i), fileFields(i).dataType)); i += 1
        }
        writer.write(out)
      } finally r.close()
      writer.close()
    } catch { case e: Throwable => fs.delete(tmp, false); throw e }

    def named[T](xs: IndexedSeq[Option[T]]): Map[String, T] =
      fileFields.map(_.name).zip(xs).collect { case (n, Some(v)) => n -> v }.toMap
    val sums = named(writer.columnSums)
    val blooms = named(writer.columnBlooms)
    val sketches = named(writer.columnSketches)
    val rel = if (relDir.isEmpty) dstName else s"$relDir/$dstName"
    val tmpFooter = VortexFileReader.readFooter(tmp, conf)
    val base = StatsManifest.fromFooter(rel, fs.getFileStatus(tmp).getLen, tmpFooter)
    val entry = base.copy(cols = base.cols.map(col => col.copy(
      sum = sums.get(col.name), bloom = blooms.get(col.name),
      sketch = sketches.get(col.name))))
    val ords = { // BitSet → ordinal array (compact task → driver payload)
      val buf = scala.collection.mutable.ArrayBuffer[Int]()
      var b = matchedSet.nextSetBit(0)
      while (b >= 0) { buf += b; b = matchedSet.nextSetBit(b + 1) }
      buf.toArray
    }
    Outcome(file, rewritten = true, updated, tmp.toString, dstName,
      entry, tmpFooter.schema.json, ords)
  }
}
