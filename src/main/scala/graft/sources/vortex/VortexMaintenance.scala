package graft.sources.vortex

import java.io.{BufferedOutputStream, DataOutputStream}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration
import VortexFormat._

/** Offline small-file compaction for vortex datasets — the maintenance
  * half of a streaming/appending table's lifecycle: per-epoch sink
  * files and per-task append shards accumulate until listings, footer
  * reads, and task scheduling are dominated by file COUNT rather than
  * bytes (at 100 TB, millions of 1 MB files would mean millions of
  * splits). `compact` rewrites each layout directory's small files
  * into ~targetBytes files.
  *
  * Scale design: batches are built driver-side from the listing (no
  * data read), then rewritten DISTRIBUTED — one task per output file.
  * The rewrite is a chunk-level BYTE COPY: encoded column pages move
  * verbatim (offset-rebased), so compaction never decodes, re-encodes,
  * or re-compresses — cost is pure sequential I/O. Partition and
  * `__bucket=k` layout are preserved by construction (batches never
  * cross a directory). The per-job stats manifest is extended with the
  * new files — inheriting writer-exact SUMs (exact sum of source sums)
  * and bloom filters (OR-union, when all sources share one SBBF
  * geometry) from the sources' entries, since a footer cannot
  * reproduce either; entries for absorbed files go stale harmlessly
  * (the scan consults the manifest only for files that still exist).
  *
  * Caveat (documented, inherent to a manifest-less directory format):
  * a reader listing the directory in the instant between a batch's
  * rename-in and its sources' deletes could see a row twice — run
  * compaction when the table has no concurrent readers, as with
  * Hive-style tables.
  */
object VortexMaintenance {

  final case class CompactResult(dirs: Int, batches: Int,
                                 filesAbsorbed: Int, bytesRewritten: Long)

  val DefaultVacuumTtlMs: Long = 24L * 3600 * 1000

  /** Delete stale `.…inprogress` tmp files older than `ttlMs` —
    * leftovers of crashed writers and zombie speculative attempts.
    * They are dot-hidden (invisible to every read), but on object
    * stores they accumulate storage forever with no other cleanup
    * path. The TTL guards live writers: any attempt still running
    * after the TTL has long been superseded by a retry. Returns the
    * number of files actually deleted. */
  def vacuum(spark: SparkSession, dir: String,
             ttlMs: Long = DefaultVacuumTtlMs): Int = {
    val hconf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    if (!fs.exists(root)) return 0
    val cutoff = System.currentTimeMillis() - ttlMs
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap(s =>
        if (s.isDirectory) walk(s.getPath) else Seq(s))
    val stale = walk(root).filter(s =>
      s.getPath.getName.startsWith(".") &&
      s.getPath.getName.endsWith(".inprogress") &&
      s.getModificationTime < cutoff)
    // count only real deletions: a racing commit/vacuum may have
    // removed (or promoted) the path between listing and delete
    stale.count(s => try fs.delete(s.getPath, false) catch { case _: Exception => false })
  }

  final case class FoldResult(foldedFiles: Int, rowsDropped: Long)

  /** Fold deletion-vector masks into real rewrites: every masked data
    * file is rewritten without its dead rows (one distributed task per
    * file, driver-side rename/delete commit — the same non-destructive-
    * task shape as VortexDelete), and its sidecars are removed. Called
    * by [[compact]] first, so the mask tier's read-side cost is paid
    * only between maintenance windows; also callable directly. */
  def foldMasks(spark: SparkSession, dir: String): FoldResult = {
    val hconf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    // writer-vs-writer mutual exclusion (see MaintenanceLock); compact
    // holds the lock itself and calls the unlocked impl directly
    MaintenanceLock.withLock(fs, root, "foldMasks") {
      foldMasksLocked(spark, dir)
    }
  }

  /** [[foldMasks]] body — caller MUST hold the dataset's maintenance
    * lock (foldMasks acquires it; compact calls this inside its own). */
  private def foldMasksLocked(spark: SparkSession, dir: String): FoldResult = {
    val hconf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    val rootQ = fs.makeQualified(root).toString
    // complete/roll back any crashed compact batches first (marker
    // protocol — MaintenanceCommit.repairStaleCompactions)
    MaintenanceCommit.repairStaleCompactions(fs, root)
    // cross-statement stale-replacement repair (same discipline as
    // DELETE/UPDATE/MERGE): a fold that crashed between rename-in and
    // delete-source leaves the masked source and its part-fold-
    // replacement coexisting — drop the replacement before planning or
    // survivor rows read twice, and re-list so planning never sees it
    val (listed0, maskBind0) = VortexDataSource.listAllWithMasks(Seq(dir), hconf, consistent = false)
    if (listed0.isEmpty) return FoldResult(0, 0L)
    val repaired = MaintenanceCommit.repairStaleReplacements(fs, listed0.map(_._1)) +
      MaintenanceCommit.repairStaleUpdvAppends(fs, listed0.map(_._1), maskBind0)
    // re-list only when the repair actually dropped files
    val (listed, maskBind) =
      if (repaired == 0) (listed0, maskBind0)
      else VortexDataSource.listAllWithMasks(Seq(dir), hconf, consistent = false)
    val targets = listed.map(_._1.getPath)
      .filter(p => maskBind.contains(p.toString))
      .sortBy(_.toString)
    if (targets.isEmpty) return FoldResult(0, 0L)
    // time travel: pre-state generation + retirement (see VortexCommitLog);
    // (listed, maskBind) is the post-repair state — reusable
    val ttCtx = VortexCommitLog.begin(spark, fs, root, hconf, "foldMasks",
      Some((listed, maskBind)))
    val remover = ttCtx.map(_.remover).getOrElse(MaintenanceCommit.PlainRemover)
    val manifest = StatsManifest.read(root, hconf)

    // task input: (file, newest mask, bloom/sketch opt-ins, final rel path)
    val work: Seq[(String, String, Set[String], Set[String], String)] = targets.map { p =>
      val rel = fs.makeQualified(p).toString.stripPrefix(rootQ).stripPrefix("/")
      val entry = manifest.get(rel)
      val dstName = s"part-fold-${VortexDelete.replacementName(p.getName).stripPrefix("part-delete-")}"
      val relDst = rel.lastIndexOf('/') match {
        case -1 => dstName
        case i => rel.substring(0, i) + "/" + dstName
      }
      (p.toString, maskBind(p.toString)._1,
        entry.map(_.cols.filter(_.bloom.isDefined).map(_.name).toSet).getOrElse(Set.empty),
        entry.map(_.cols.filter(_.sketch.isDefined).map(_.name).toSet).getOrElse(Set.empty),
        relDst)
    }

    val sconf = new SerializableConfiguration(hconf)
    // (file, tmp, dstName, rowsDropped, entry, schemaJson)
    val results = spark.sparkContext.parallelize(work, work.length).map {
      case (file, mask, bloomCols, sketchCols, relDst) =>
        val path = new Path(file)
        val tfs = path.getFileSystem(sconf.value)
        val footer = VortexFileReader.readFooter(path, sconf.value)
        val dstName = relDst.substring(relDst.lastIndexOf('/') + 1)
        val tmp = new Path(path.getParent,
          s".$dstName.${java.util.UUID.randomUUID().toString.take(8)}.inprogress")
        // columnar survivor rewrite when the layout is plain
        // (SurvivorSplice, r15 optimization — DelProbe A/B in
        // BASELINE.md); shredded-struct / nested layouts keep the
        // row path below
        if (SurvivorSplice.applicable(footer, null)) {
          val dv = DeletionVector.read(tfs, new Path(mask))
          val r = SurvivorSplice.rewrite(path, tmp, sconf.value, footer,
            null, null, null, dv, bloomCols, sketchCols, relDst)
          (file, tmp.toString, dstName, r.droppedMask, r.entry, r.schemaJson)
        } else {
        val writer = new VortexFileWriter(tmp, sconf.value, footer.schema,
          bloomCols = bloomCols, sketchCols = sketchCols)
        val part = VortexInputPartition(file, footer.chunks.indices.toArray,
          maskFile = mask)
        val r = new VortexPartitionReader(part, sconf.value, footer.schema)
        var rows = 0L
        try {
          try while (r.next()) { writer.write(r.get()); rows += 1 } finally r.close()
          writer.close()
        } catch { case e: Throwable => tfs.delete(tmp, false); throw e }
        val dropped = footer.chunks.map(_.rowCount.toLong).sum - rows
        def named[T](xs: IndexedSeq[Option[T]]): Map[String, T] =
          footer.schema.fields.map(_.name).zip(xs)
            .collect { case (n, Some(v)) => n -> v }.toMap
        val sums = named(writer.columnSums)
        val blooms = named(writer.columnBlooms)
        val sketches = named(writer.columnSketches)
        val tmpFooter = VortexFileReader.readFooter(tmp, sconf.value)
        val base = StatsManifest.fromFooter(relDst,
          tfs.getFileStatus(tmp).getLen, tmpFooter)
        val entry = base.copy(cols = base.cols.map(c => c.copy(
          sum = sums.get(c.name), bloom = blooms.get(c.name),
          sketch = sketches.get(c.name))))
        (file, tmp.toString, dstName, dropped, entry, tmpFooter.schema.json)
        }
    }.collect()

    // driver commit + manifest write: the shared machinery (VortexCommit)
    MaintenanceCommit.commitAll(fs, "foldMasks", maskBind,
      results.toSeq.map(r => MaintenanceCommit.Replacement(r._1, r._2, r._3)),
      remover)
    MaintenanceCommit.writeManifests(root, hconf, "fold",
      results.toSeq.map(r => (r._6, r._5)))
    ttCtx.foreach(_.finish())
    FoldResult(results.length, results.map(_._4).sum)
  }

  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              minFiles: Int = 2): CompactResult =
    compactImpl(spark, dir, targetBytes, minFiles, failAfterBatchCommits = -1)

  /** `failAfterBatchCommits` is a TEST SEAM (≥0: throw after that many
    * per-batch commits), mirroring the delete/update/merge seams. */
  private[graft] def compactImpl(spark: SparkSession, dir: String,
                                 targetBytes: Long,
                                 minFiles: Int,
                                 failAfterBatchCommits: Int): CompactResult = {
    val hconf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    val rootQ = fs.makeQualified(root).toString

    // writer-vs-writer mutual exclusion (see MaintenanceLock): one
    // lease covers the fold AND the byte-copy — a statement arriving
    // between the two would otherwise see a half-folded dataset
    MaintenanceLock.withLock(fs, root, "compact") {
    // a prior compact may have crashed mid-commit — complete/roll back
    // its batches BEFORE anything lists the data (see the marker
    // contract in MaintenanceCommit)
    MaintenanceCommit.repairStaleCompactions(fs, root)

    // deletion-vector masks fold into real rewrites FIRST: the chunk
    // byte-copy below moves pages verbatim and must never absorb a
    // masked file (its sidecar names the OLD file — dead rows would
    // resurrect)
    foldMasksLocked(spark, dir)

    // group data files by their layout directory (partition/bucket);
    // defensive re-check: any file still masked (e.g. written by a
    // racing delete) is excluded from byte-copy batches
    val (listed0, maskLeft) = VortexDataSource.listAllWithMasks(Seq(dir), hconf, consistent = false)
    val listed = listed0.filterNot(f => maskLeft.contains(f._1.getPath.toString))
    val byDir = listed.groupBy(_._1.getPath.getParent.toString)

    // manifest state BEFORE the rewrite: sources are deleted during
    // compaction, but their (path,len)-validated entries let the new
    // files inherit what a footer can't reproduce — writer-exact SUMs
    // (merged sum = exact sum of source sums) and bloom filters (a
    // byte-copied merge's file bloom is EXACTLY the OR of its
    // sources', valid only when every source shares the same SBBF
    // geometry: the block pick depends on block count). Any source
    // missing the stat → the stat is dropped, conservatively.
    val preManifest = StatsManifest.read(root, hconf)
    val lenByPath: Map[String, Long] = listed.map { case (st, _) =>
      fs.makeQualified(st.getPath).toString -> st.getLen }.toMap

    // schema key per file: batches never mix schemas, so an EVOLVED
    // dataset (mergeSchema reads) compacts within each schema version
    // instead of failing the whole job at the executor-side schema
    // check. The key is ALWAYS the footer schema JSON — one canonical
    // domain. Mixing manifest-recorded JSON for covered files with
    // footer JSON for uncovered ones would split identical-schema
    // files into separate batches whenever the two serializations
    // differ (e.g. extra StructField metadata recorded at write time),
    // and a manifest entry that disagrees with its footer would put
    // genuinely mismatched files in ONE batch — failing the whole
    // compact job at compactBatch's executor-side require.
    // parallel footer prefetch for every small file: schemaKeyOf would
    // otherwise pay one serial driver RTT per file (same pattern as
    // planning's footer prefetch; reads land in the per-JVM cache)
    locally {
      val smallPaths = listed.map(_._1)
        .filter(_.getLen < targetBytes)
        .map(_.getPath)
      if (smallPaths.length > 1)
        java.util.Arrays.stream(smallPaths.toArray).parallel()
          .forEach(pp => { try { VortexFileReader.readFooter(pp, hconf); () }
                           catch { case _: Exception => } })
    }
    def schemaKeyOf(st: org.apache.hadoop.fs.FileStatus): String = {
      val q = fs.makeQualified(st.getPath).toString
      try VortexFileReader.readFooter(st.getPath, hconf).schema.json
      catch { case _: Exception => s"unreadable:$q" }
    }

    val batches: Seq[(Seq[String], String)] = byDir.toSeq.sortBy(_._1).flatMap { case (_, files) =>
      files.map(_._1).filter(_.getLen < targetBytes)
        .sortBy(_.getPath.getName)
        .groupBy(schemaKeyOf).toSeq.sortBy(_._1)
        .filterNot(_._1.startsWith("unreadable:"))
        .flatMap { case (sk, small) =>
          val out = scala.collection.mutable.ListBuffer[(Seq[String], String)]()
          var cur = scala.collection.mutable.ListBuffer[String]()
          var bytes = 0L
          small.foreach { st =>
            if (bytes + st.getLen > targetBytes && cur.nonEmpty) {
              if (cur.length >= minFiles) out += ((cur.toSeq, sk))
              cur = scala.collection.mutable.ListBuffer[String](); bytes = 0L
            }
            cur += st.getPath.toString; bytes += st.getLen
          }
          if (cur.length >= minFiles) out += ((cur.toSeq, sk))
          out.toSeq
        }
    }
    if (batches.isEmpty) return CompactResult(byDir.size, 0, 0, 0L)

    // time travel: pre-state generation + retirement (see VortexCommitLog);
    // the post-fold listing is fresh and no repairs ran since — reusable
    val ttCtx = VortexCommitLog.begin(spark, fs, root, hconf, "compact",
      Some((listed0, maskLeft)))
    val remover = ttCtx.map(_.remover).getOrElse(MaintenanceCommit.PlainRemover)

    val sconf = new SerializableConfiguration(hconf)
    // tasks are fully NON-DESTRUCTIVE (r12 review fix): each writes its
    // merged file as a dot-hidden tmp and returns (tmp, dstName, bytes)
    // — nothing renames in until the whole job succeeded, so a partial
    // job failure commits nothing (tmps are vacuum litter)
    val results: Array[(String, String, Long)] = spark.sparkContext
      .parallelize(batches.map(_._1), batches.length)
      .map(batch => compactBatch(batch, sconf.value))
      .collect()

    // driver commit, PER BATCH under a crash marker (the random
    // part-compact names have no source pairing the deterministic-name
    // repair could use — see MaintenanceCommit.repairStaleCompactions):
    // marker → rename output in → remove absorbed sources (retiring
    // when time travel is on) → drop marker. A crash at any point
    // repairs exactly at the next statement.
    val markerJob = java.util.UUID.randomUUID().toString.take(8)
    val retireDirQ = ttCtx.map(c =>
      fs.makeQualified(VortexCommitLog.retiredDir(root, c.gen)).toString)
      .getOrElse("")
    def relOf(p: Path): String =
      fs.makeQualified(p).toString.stripPrefix(rootQ).stripPrefix("/")
    val createdPaths = new scala.collection.mutable.ArrayBuffer[String]
    batches.zip(results).zipWithIndex.foreach {
      case (((batch, _), (tmp, dstName, _)), bi) =>
        if (failAfterBatchCommits >= 0 && bi >= failAfterBatchCommits)
          throw new RuntimeException(
            s"vortex compact: injected crash after $failAfterBatchCommits batch commits (test seam)")
        val dst = new Path(new Path(batch.head).getParent, dstName)
        val marker = MaintenanceCommit.writeCompactMarker(fs, root,
          s"$markerJob-$bi", MaintenanceCommit.CompactCommit(
            relOf(dst), batch.map(f => relOf(new Path(f))), retireDirQ))
        if (!fs.rename(new Path(tmp), dst))
          throw new java.io.IOException(s"vortex compact: rename failed for $dst")
        batch.foreach { f =>
          if (!remover.remove(fs, new Path(f)))
            throw new java.io.IOException(s"vortex compact: failed to remove absorbed $f")
        }
        fs.delete(marker, false)
        createdPaths += dst.toString
    }

    def inherited(batch: Seq[String]): (Map[String, Long], Map[String, Array[Byte]]) = {
      val srcEntries = batch.map { f =>
        val q = fs.makeQualified(new Path(f)).toString
        preManifest.get(q.stripPrefix(rootQ).stripPrefix("/"))
          .filter(e => lenByPath.get(q).contains(e.len))
      }
      if (srcEntries.exists(_.isEmpty)) return (Map.empty, Map.empty)
      val es = srcEntries.map(_.get)
      val colNames = es.head.cols.map(_.name)
      val sums = colNames.flatMap { cn =>
        val ss = es.map(_.cols.find(_.name == cn).flatMap(_.sum))
        if (ss.exists(_.isEmpty)) None
        else try Some(cn -> ss.map(_.get).reduce(Math.addExact(_, _)))
        catch { case _: ArithmeticException => None }
      }.toMap
      val blooms = colNames.flatMap { cn =>
        val bs = es.map(_.cols.find(_.name == cn).flatMap(_.bloom))
        if (bs.exists(_.isEmpty)) None
        else {
          val arrs = bs.map(_.get)
          if (arrs.map(_.length).distinct.size != 1) None
          else {
            val acc = arrs.head.clone()
            arrs.tail.foreach { a =>
              var i = 0
              while (i < acc.length) { acc(i) = (acc(i) | a(i)).toByte; i += 1 }
            }
            Some(cn -> acc)
          }
        }
      }.toMap
      (sums, blooms)
    }
    val inheritedByCreated: Map[String, (Map[String, Long], Map[String, Array[Byte]])] =
      batches.map(_._1).zip(createdPaths).map { case (batch, created) =>
        created -> inherited(batch) }.toMap

    // extend the stats manifest with the new files (tier-1.5 pruning),
    // ONE manifest write per schema version: the manifest envelope
    // records a single schema, and per-entry schema validation trusts
    // an entry only under its own manifest's recorded schema
    val jobId = java.util.UUID.randomUUID().toString.take(8)
    def entryOf(created: String): Option[StatsManifest.FileStats] =
      try {
        val p = new Path(created)
        val st = fs.getFileStatus(p)
        val rel = fs.makeQualified(p).toString.stripPrefix(rootQ).stripPrefix("/")
        val base = StatsManifest.fromFooter(rel, st.getLen, VortexFileReader.readFooter(p, hconf))
        val (sums, blooms) = inheritedByCreated.getOrElse(created, (Map.empty[String, Long], Map.empty[String, Array[Byte]]))
        Some(base.copy(cols = base.cols.map(c =>
          c.copy(sum = sums.get(c.name), bloom = blooms.get(c.name)))))
      } catch { case _: Exception => None }
    createdPaths.toSeq.zip(batches.map(_._2)).flatMap { case (created, sk) =>
      entryOf(created).map(e => (sk, e))
    }.groupBy(_._1).toSeq.sortBy(_._1).zipWithIndex.foreach { case ((sk, group), i) =>
      val schema =
        try Some(org.apache.spark.sql.types.DataType.fromJson(sk)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
        catch { case _: Exception => None }
      StatsManifest.write(root, hconf, s"compact-$jobId-$i", group.map(_._2).toIndexedSeq, schema)
    }

    ttCtx.foreach(_.finish())
    CompactResult(byDir.size, batches.length,
      batches.map(_._1.length).sum, results.map(_._3).sum)
    } // MaintenanceLock.withLock
  }

  /** Reclaim time-travel storage: drop commit-log generations (and
    * their retired file areas) older than the newest `keepLast`.
    * Expired generations fail loudly on read. */
  def expireVersions(spark: SparkSession, dir: String, keepLast: Int): (Int, Int) = {
    val hconf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    // not inside a transaction group: expiry deletes exactly the
    // generations + retired files a group rollback would restore from
    require(VortexTransaction.current(fs.makeQualified(root).toString).isEmpty,
      "vortex expireVersions: not allowed inside a transaction group — " +
      "the group's rollback depends on the retained generations")
    MaintenanceLock.withLock(fs, root, "expireVersions") {
      VortexCommitLog.expire(fs, root, keepLast)
    }
  }

  /** Merge one batch into one file by chunk byte-copy; returns
    * (tmp path, destination basename, bytes copied) — NON-DESTRUCTIVE:
    * the driver renames in under the marker protocol. Runs on an
    * executor. */
  private def compactBatch(batch: Seq[String],
                           conf: org.apache.hadoop.conf.Configuration): (String, String, Long) = {
    val first = new Path(batch.head)
    val fs = first.getFileSystem(conf)
    val parent = first.getParent
    val id = java.util.UUID.randomUUID().toString.take(12)
    val name = s"part-compact-$id.vortex"
    val tmp = new Path(parent, s".$name.inprogress")

    val footers = batch.map(f => new Path(f) -> VortexFileReader.readFooter(new Path(f), conf))
    val schemaJson = footers.head._2.schema.json
    footers.foreach { case (p, f) =>
      require(f.schema.json == schemaJson,
        s"vortex compact: schema mismatch between ${batch.head} and $p")
    }

    val stream = fs.create(tmp, true)
    val out = new BufferedOutputStream(stream, 1 << 20)
    var pos: Long = 0
    var copied: Long = 0
    out.write(Magic); pos += Magic.length
    val chunks = scala.collection.mutable.ArrayBuffer[ChunkMeta]()
    footers.foreach { case (p, footer) =>
      val in = fs.open(p)
      try footer.chunks.foreach { chunk =>
        val metas = chunk.columns.map { m =>
          val buf = new Array[Byte](m.length)
          in.readFully(m.offset, buf)
          out.write(buf)
          val nm = m.copy(offset = pos)
          pos += m.length; copied += m.length
          nm
        }
        chunks += ChunkMeta(chunk.rowCount, metas)
      } finally in.close()
    }
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    writeFooter(dos, Footer(footers.head._2.schema, chunks.toArray))
    dos.flush()
    val fb = bos.toByteArray
    out.write(fb)
    val tail = java.nio.ByteBuffer.allocate(12)
    tail.putLong(fb.length.toLong); tail.put(Magic)
    out.write(tail.array())
    out.flush(); out.close()

    // no rename here: the driver commits batch-by-batch under the
    // crash-marker protocol (see MaintenanceCommit.repairStaleCompactions)
    (tmp.toString, name, copied)
  }
}
