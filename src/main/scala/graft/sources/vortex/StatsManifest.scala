package graft.sources.vortex

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** Commit-time per-file stats manifest (≙ the reference's layout-stats
  * role, vortex-layout in SURVEY.md §2.9/§4, aggregated one level up).
  *
  * Each batch commit writes ONE JSON file under `_manifests/` at the
  * dataset root holding, for every data file it committed: the
  * relative path, byte length, row count, and file-level per-column
  * null counts + min/max (aggregated from the chunk stats already in
  * the footer). Planning uses it as pruning tier 1.5, between
  * partition-directory pruning and per-chunk pruning: a pushed filter
  * that excludes a file's whole range drops the file WITHOUT fetching
  * its footer. At ~800k files on an object store that converts cold
  * planning from 800k footer round-trips into one small read per
  * commit-job plus footers for surviving files only.
  *
  * Safety: entries are validated by (relative path, file length), so a
  * rewritten file never prunes on stale stats; files absent from every
  * manifest (streaming-sink epochs, foreign writers) simply fall back
  * to the footer path; a column whose stats are unknown uses the
  * nullCount sentinel -1, which can never satisfy a skip condition.
  */
object StatsManifest {
  import VortexFormat._

  val DirName = "_manifests"

  final case class ColStats(name: String, nulls: Long,
                            min: Option[Array[Byte]], max: Option[Array[Byte]])
  final case class FileStats(relPath: String, len: Long, rows: Long, cols: Seq[ColStats]) {
    /** synthetic whole-file ChunkMeta aligned with `schema` for
      * FilterPruning.canSkip; unknown columns get nulls = -1 (skips
      * nothing) and no range. */
    def toChunkMeta(schema: StructType): ChunkMeta = {
      val byName = cols.map(c => c.name -> c).toMap
      val metas = schema.fields.map { f =>
        byName.get(f.name) match {
          case Some(c) =>
            ColumnChunkMeta(0L, 0, EncPlain, compressed = false,
              math.min(c.nulls, Int.MaxValue).toInt, c.min, c.max)
          case None =>
            ColumnChunkMeta(0L, 0, EncPlain, compressed = false, -1, None, None)
        }
      }
      ChunkMeta(math.min(rows, Int.MaxValue).toInt, metas)
    }
  }

  private def statLess(a: Array[Byte], b: Array[Byte], dt: DataType): Boolean = dt match {
    case StringType =>
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i) & 0xff; val y = b(i) & 0xff
        if (x != y) return x < y
        i += 1
      }
      a.length < b.length
    case _ => PageCodec.lessThan(PageCodec.bytesToLong(a), PageCodec.bytesToLong(b), dt)
  }

  /** aggregate a file footer down to file-level stats */
  def fromFooter(relPath: String, len: Long, footer: Footer): FileStats = {
    val fields = footer.schema.fields
    val cols = fields.indices.map { c =>
      var nulls = 0L
      var mn: Array[Byte] = null
      var mx: Array[Byte] = null
      var rangeKnown = true
      footer.chunks.foreach { ch =>
        val m = ch.columns(c)
        nulls += m.nullCount
        if (m.min.isEmpty) {
          // stats-less chunk with live rows → file range unknowable
          if (m.nullCount != ch.rowCount) rangeKnown = false
        } else {
          if (mn == null || statLess(m.min.get, mn, fields(c).dataType)) mn = m.min.get
          if (mx == null || statLess(mx, m.max.get, fields(c).dataType)) mx = m.max.get
        }
      }
      ColStats(fields(c).name, nulls,
        if (rangeKnown && mn != null) Some(mn) else None,
        if (rangeKnown && mx != null) Some(mx) else None)
    }
    FileStats(relPath, len, footer.rowCount, cols)
  }

  private def b64(a: Array[Byte]): String = java.util.Base64.getEncoder.encodeToString(a)

  def write(root: Path, conf: Configuration, jobId: String, entries: Seq[FileStats]): Unit = {
    if (entries.isEmpty) return
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
    entries.foreach { e =>
      val o = arr.addObject()
      o.put("path", e.relPath); o.put("len", e.len); o.put("rows", e.rows)
      val cs = o.putArray("cols")
      e.cols.foreach { c =>
        val co = cs.addObject()
        co.put("name", c.name); co.put("nulls", c.nulls)
        c.min.foreach(m => co.put("min", b64(m)))
        c.max.foreach(m => co.put("max", b64(m)))
      }
    }
    val fs = root.getFileSystem(conf)
    val p = new Path(new Path(root, DirName), s"manifest-$jobId.json")
    val out = fs.create(p, true)
    try out.write(mapper.writeValueAsBytes(arr)) finally out.close()
  }

  /** all manifest entries under `root`, keyed by relative path */
  def read(root: Path, conf: Configuration): Map[String, FileStats] = {
    val fs = root.getFileSystem(conf)
    val dir = new Path(root, DirName)
    if (!fs.exists(dir)) return Map.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val out = scala.collection.mutable.Map[String, FileStats]()
    fs.listStatus(dir).filter(_.getPath.getName.endsWith(".json")).foreach { st =>
      val in = fs.open(st.getPath)
      try {
        val node = mapper.readTree(in)
        val it = node.elements()
        while (it.hasNext) {
          val e = it.next()
          val cit = e.get("cols").elements()
          val cols = scala.collection.mutable.ArrayBuffer[ColStats]()
          while (cit.hasNext) {
            val c = cit.next()
            def bin(f: String): Option[Array[Byte]] =
              Option(c.get(f)).map(n => java.util.Base64.getDecoder.decode(n.asText()))
            cols += ColStats(c.get("name").asText(), c.get("nulls").asLong(), bin("min"), bin("max"))
          }
          val f = FileStats(e.get("path").asText(), e.get("len").asLong(),
            e.get("rows").asLong(), cols.toSeq)
          out(f.relPath) = f
        }
      } catch {
        case _: Exception => // a torn/foreign manifest only loses the optimization
      } finally in.close()
    }
    out.toMap
  }

  def delete(root: Path, conf: Configuration): Unit = {
    val fs = root.getFileSystem(conf)
    fs.delete(new Path(root, DirName), true)
  }
}
