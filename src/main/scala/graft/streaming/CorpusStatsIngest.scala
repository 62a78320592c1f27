package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance of the inverted-index corpus statistics
  * (token → document frequency, corpus frequency) — the stats that
  * feed BM25 df/idf and the unigram-LM quality score
  * (`r_inverted_df` / `t_unigram_nll` are the batch twins).
  *
  * The stats are a MERGEABLE aggregate, so the index is
  * log-structured: each micro-batch writes one segment
  * (`seg=<batchId>`, a (tok, df, cf) parquet) and readers merge
  * segments with a vocab-sized `GROUP BY`. Consequences:
  *  - per-batch work is O(batch) — the standing corpus is never
  *    re-read, re-tokenized, or rewritten on ingest;
  *  - batch replay is idempotent BY CONSTRUCTION: a segment is keyed
  *    by its batch id and written with overwrite, so a replayed batch
  *    replaces its own segment byte-for-byte equivalently — no marker
  *    protocol needed (contrast DedupIngest, whose append-only
  *    signature files DO need one);
  *  - reads pay one small merge per query; `compact()` folds all
  *    current segments into a single compacted base when the segment
  *    count grows — the Lucene trade. The fold commits via an atomic
  *    generation-manifest (see the protocol note below), so a crash
  *    at any point leaves a complete readable view.
  *
  * At 100 TB: segments are vocab-bounded regardless of batch size,
  * the merge is vocab-bounded regardless of corpus size, and
  * compaction cost is segments × vocab — none of it scales with the
  * token stream.
  */
object CorpusStatsIngest {

  /** per-doc local counting (one map per document, vocab-bounded
    * output per doc) → per-batch (tok, df, cf) stats */
  def batchStats(batch: DataFrame, textCol: String): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    batch.select(col(textCol).cast("string")).as[String]
      .flatMap { text =>
        val counts = new java.util.HashMap[String, Long]()
        text.split(" ", -1).foreach(t => counts.merge(t, 1L, (a, b) => a + b))
        scala.jdk.CollectionConverters.IteratorHasAsScala(counts.entrySet().iterator())
          .asScala.map(e => (e.getKey, e.getValue))
      }
      .toDF("tok", "tf")
      .groupBy("tok")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
  }

  /** The `(batch, batchId) => Unit` body for
    * `docs.writeStream.foreachBatch(...)`. */
  def foreachBatchBody(textCol: String, indexDir: String)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    batchStats(batch, textCol)
      .coalesce(1) // vocab-sized
      .write.mode("overwrite")
      .parquet(s"$indexDir/seg=$batchId")
  }

  /** merged standing stats: one vocab-sized GROUP BY over segments */
  def readStats(spark: SparkSession, indexDir: String): DataFrame = {
    val segs = segments(spark, indexDir)
    if (segs.isEmpty) {
      import spark.implicits._
      Seq.empty[(String, Long, Long)].toDF("tok", "df", "cf")
    } else
      spark.read.parquet(segs: _*)
        .groupBy("tok")
        .agg(sum("df").as("df"), sum("cf").as("cf"))
  }

  // ---- compaction commit protocol -------------------------------------
  // A compacted base lives in `cseg=<gen>` — a name the seg=* listing
  // NEVER matches, so an uncommitted base is invisible. The commit
  // point is the atomic creation of `_manifest_<gen>` (written to a
  // dot-tmp then renamed to its final unique name): line 1 is the base
  // dir name, the rest are the folded segment names (tombstones).
  // Readers take the highest-generation manifest and read base +
  // seg=* dirs not tombstoned; folded-dir deletes are best-effort
  // cleanup AFTER the commit, retried by the next compaction. Crash
  // anywhere leaves either the pre-compaction view (no manifest yet —
  // the orphan cseg dir is ignored) or the complete post-compaction
  // view (manifest committed — leftover folded dirs are tombstoned,
  // never double-counted). A bonus over delete-then-rename: a
  // REPLAYED batch whose segment was folded re-creates a tombstoned
  // name, which stays excluded instead of double-counting.

  private val ManifestPrefix = "_manifest_"

  private[graft] case class Snapshot(
      gen: Long, base: Option[String], folded: Set[String])

  private[graft] def latestSnapshot(spark: SparkSession, indexDir: String): Snapshot = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Snapshot(0L, None, Set.empty)
    val ms = fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith(ManifestPrefix))
    if (ms.isEmpty) Snapshot(0L, None, Set.empty)
    else {
      val best = ms.maxBy(_.getPath.getName.stripPrefix(ManifestPrefix).toLong)
      val in = fs.open(best.getPath)
      val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
        finally in.close()
      val lines = new String(bytes, "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
      Snapshot(best.getPath.getName.stripPrefix(ManifestPrefix).toLong,
        lines.headOption, lines.drop(1).toSet)
    }
  }

  private def segments(spark: SparkSession, indexDir: String): Seq[String] = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val snap = latestSnapshot(spark, indexDir)
    val segs = fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("seg=") &&
        !snap.folded.contains(st.getPath.getName))
      .map(_.getPath.toString)
    val base = snap.base
      .filter(b => fs.exists(new Path(p, b)))
      .map(b => new Path(p, b).toString)
    base.toSeq ++ segs
  }

  /** step 1: write the merged stats into the next base dir (invisible
    * to readers until step 2 commits). Returns the new snapshot to
    * commit and the live dirs it folds. */
  private[graft] def writeBase(spark: SparkSession, indexDir: String)
      : Option[(Snapshot, Seq[String])] = {
    val live = segments(spark, indexDir)
    if (live.size <= 1) return None
    val prev = latestSnapshot(spark, indexDir)
    val gen = prev.gen + 1
    val baseName = s"cseg=$gen"
    readStats(spark, indexDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/$baseName")
    val foldedNames = live.map(s => new Path(s).getName).toSet
    Some((Snapshot(gen, Some(baseName), foldedNames), live))
  }

  /** step 2 — THE commit point: atomically create `_manifest_<gen>` */
  private[graft] def commitManifest(
      spark: SparkSession, indexDir: String, snap: Snapshot): Unit = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p, s".${ManifestPrefix}${snap.gen}.tmp")
    val out = fs.create(tmp, true)
    try out.write((snap.base.get +: snap.folded.toSeq.sorted).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, new Path(p, ManifestPrefix + snap.gen)))
      throw new java.io.IOException(s"compaction manifest commit failed for gen ${snap.gen}")
  }

  /** step 3: best-effort cleanup of tombstoned segments, superseded
    * bases, and superseded manifests (a crash here is harmless —
    * everything deleted is already invisible to readers). */
  private[graft] def cleanup(spark: SparkSession, indexDir: String): Unit = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = latestSnapshot(spark, indexDir)
    fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      val dead =
        snap.folded.contains(n) ||
        (n.startsWith("cseg=") && !snap.base.contains(n)) ||
        (n.startsWith(ManifestPrefix) &&
          n.stripPrefix(ManifestPrefix).toLong < snap.gen)
      if (dead) fs.delete(st.getPath, true)
    }
  }

  /** Fold every current segment into a single compacted base. The
    * commit is the atomic manifest creation; see the protocol note
    * above for the crash story. (Still not safe against a CONCURRENT
    * compactor; run compaction in the ingest's own foreachBatch
    * thread, where Structured Streaming serializes it, or behind the
    * caller's own lock. Concurrent READERS are fine at every step.) */
  def compact(spark: SparkSession, indexDir: String): Unit =
    writeBase(spark, indexDir).foreach { case (snap, _) =>
      commitManifest(spark, indexDir, snap)
      cleanup(spark, indexDir)
    }
}
