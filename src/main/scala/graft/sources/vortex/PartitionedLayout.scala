package graft.sources.vortex

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hive-style partitioned directory layout for vortex datasets:
  * `root/k1=v1/k2=v2/part-*.vortex`. Partition columns live in the
  * path, not the files; reads re-attach them as constants and prune
  * whole directories against pushed filters before any footer I/O —
  * at 100 TB this is the first and cheapest pruning tier (directory
  * listing only), ahead of per-chunk stats.
  */
object PartitionedLayout {

  /** Recursively list data files with their (key, value) partition
    * path segments relative to root. */
  def listWithPartitions(root: Path, conf: Configuration): Seq[(FileStatus, Seq[(String, String)])] =
    listWithPartitionsAndMasks(root, conf)._1

  /** Like [[listWithPartitions]], but the SAME directory walk also
    * collects deletion-vector sidecars (dot-hidden `.<data>.dv-<seq>`
    * names — see [[DeletionVector]]): zero extra RPCs for mask
    * discovery. Returns (data files, mask sidecar paths). */
  def listWithPartitionsAndMasks(root: Path, conf: Configuration)
      : (Seq[(FileStatus, Seq[(String, String)])], Seq[Path]) = {
    val (files, masks, _) = listWithPartitionsMasksAndMarkers(root, conf)
    (files, masks)
  }

  /** The full walk result: data files, deletion-vector sidecars, and
    * root-level compact-commit markers (`.compact-commit-*` — see
    * MaintenanceCommit's marker contract). Markers are collected so the
    * READ path can resolve a crashed compact's duplicated
    * output+sources pair at plan time without waiting for the next
    * maintenance statement's destructive repair (review-found r12) —
    * still zero extra RPCs: the root listing happens anyway. */
  def listWithPartitionsMasksAndMarkers(root: Path, conf: Configuration)
      : (Seq[(FileStatus, Seq[(String, String)])], Seq[Path], Seq[Path]) = {
    val fs = root.getFileSystem(conf)
    val masks = scala.collection.mutable.ArrayBuffer[Path]()
    val markers = scala.collection.mutable.ArrayBuffer[Path]()
    def walk(st: FileStatus, parts: Seq[(String, String)]): Seq[(FileStatus, Seq[(String, String)])] =
      if (st.isDirectory) {
        fs.listStatus(st.getPath)
          .filterNot { c =>
            val n = c.getPath.getName
            if (!c.isDirectory) {
              if (DeletionVector.parseName(n).isDefined) masks += c.getPath
              else if (MaintenanceCommit.isCompactMarker(n)) markers += c.getPath
            }
            // hidden/metadata names — except the bucket-layout dirs,
            // which deliberately use a name no user column can shadow
            (n.startsWith("_") || n.startsWith(".")) && !n.startsWith(BucketSpecFile.BucketCol + "=")
          }
          .toSeq.flatMap { c =>
            val name = c.getPath.getName
            val seg = if (c.isDirectory && name.contains("=")) {
              val Array(k, v) = name.split("=", 2)
              Seq(k -> unescape(v))
            } else Seq.empty
            walk(c, parts ++ seg)
          }
      } else Seq((st, parts))
    if (!fs.exists(root)) (Seq.empty, Seq.empty, Seq.empty)
    else (walk(fs.getFileStatus(root), Seq.empty), masks.toSeq, markers.toSeq)
  }

  /** Partition schema inferred across files (Long if every value
    * parses, else Double, else ISO date/timestamp, else String —
    * mirroring Spark's parquet partition inference). */
  def inferPartitionSchema(files: Seq[(FileStatus, Seq[(String, String)])]): StructType = {
    val keys = files.flatMap(_._2.map(_._1)).distinct
    StructType(keys.map { k =>
      val vals = files.flatMap(_._2.collect { case (`k`, v) => v })
      def all(p: String => Unit): Boolean =
        vals.forall(v => scala.util.Try(p(v)).isSuccess)
      val dt =
        if (all(_.toLong: Unit)) LongType
        else if (all(_.toDouble: Unit)) DoubleType
        else if (all(java.time.LocalDate.parse(_): Unit)) DateType
        else if (all(java.time.LocalDateTime.parse(_): Unit)) TimestampNTZType
        else StringType
      StructField(k, dt, nullable = false)
    })
  }

  /** external path string → Catalyst internal value */
  def toInternal(v: String, dt: DataType): Any = dt match {
    case LongType => v.toLong
    case IntegerType => v.toInt
    case DoubleType => v.toDouble
    case DateType => java.time.LocalDate.parse(v).toEpochDay.toInt
    case TimestampNTZType =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .localDateTimeToMicros(java.time.LocalDateTime.parse(v))
    case StringType => UTF8String.fromString(v)
    case other => throw new UnsupportedOperationException(s"partition type $other")
  }

  /** Catalyst internal value → path segment string (typed: dates print
    * ISO-8601, not raw epoch numbers, so paths are human-readable and
    * the inference above round-trips the type) */
  def toPathString(v: Any, dt: DataType): String = dt match {
    case DateType => java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
    case TimestampNTZType =>
      escape(org.apache.spark.sql.catalyst.util.DateTimeUtils
        .microsToLocalDateTime(v.asInstanceOf[Long]).toString)
    case _ => v match {
      case u: UTF8String => escape(u.toString)
      case other => other.toString
    }
  }

  /** Percent-encode UTF-8 BYTES (each ≤ 0xFF → exactly two hex digits),
    * not raw code points: '€' as %20AC would encode fine but
    * decode as two chars, corrupting non-Latin-1 values on round-trip. */
  def escape(s: String): String = {
    val sb = new StringBuilder
    s.getBytes("UTF-8").foreach { b =>
      val c = (b & 0xFF).toChar
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.') sb.append(c)
      else sb.append(f"%%${b & 0xFF}%02X")
    }
    sb.toString
  }

  def unescape(s: String): String = {
    val bytes = new java.io.ByteArrayOutputStream
    var i = 0
    while (i < s.length) {
      if (s(i) == '%' && i + 3 <= s.length) {
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3
      } else { bytes.write(s.substring(i, i + 1).getBytes("UTF-8")); i += 1 }
    }
    new String(bytes.toByteArray, "UTF-8")
  }

  /** Conservative directory pruning: false → no row in this partition
    * can match. Uses the external (Scala) comparison domain. */
  def survives(filter: Filter, parts: Map[String, String], partSchema: StructType): Boolean = {
    def typed(k: String): Option[Any] = parts.get(k).map { raw =>
      partSchema.fields.find(_.name == k).map(_.dataType) match {
        case Some(LongType) => raw.toLong
        case Some(DoubleType) => raw.toDouble
        case Some(DateType) => java.time.LocalDate.parse(raw) // compared as epochDay
        case Some(TimestampNTZType) => java.time.LocalDateTime.parse(raw)
        case _ => raw
      }
    }
    def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
      case (x: Long, y: Number) => Some(java.lang.Long.compare(x, y.longValue()))
      case (x: Double, y: Number) => Some(java.lang.Double.compare(x, y.doubleValue()))
      case (x: String, y: String) => Some(x.compareTo(y))
      case (x: java.time.LocalDate, y: java.time.LocalDate) =>
        Some(java.lang.Long.compare(x.toEpochDay, y.toEpochDay))
      case (x: java.time.LocalDate, y: java.sql.Date) =>
        Some(java.lang.Long.compare(x.toEpochDay, y.toLocalDate.toEpochDay))
      case (x: java.time.LocalDateTime, y: java.time.LocalDateTime) => Some(x.compareTo(y))
      case _ => None
    }
    filter match {
      case EqualTo(a, v) if parts.contains(a) => typed(a).flatMap(cmp(_, v)).forall(_ == 0)
      case In(a, vs) if parts.contains(a) =>
        typed(a).forall(x => vs.exists(v => cmp(x, v).contains(0)))
      case GreaterThan(a, v) if parts.contains(a) => typed(a).flatMap(cmp(_, v)).forall(_ > 0)
      case GreaterThanOrEqual(a, v) if parts.contains(a) => typed(a).flatMap(cmp(_, v)).forall(_ >= 0)
      case LessThan(a, v) if parts.contains(a) => typed(a).flatMap(cmp(_, v)).forall(_ < 0)
      case LessThanOrEqual(a, v) if parts.contains(a) => typed(a).flatMap(cmp(_, v)).forall(_ <= 0)
      case IsNull(a) if parts.contains(a) => false // path partitions are never null
      case And(l, r) => survives(l, parts, partSchema) && survives(r, parts, partSchema)
      case Or(l, r) => survives(l, parts, partSchema) || survives(r, parts, partSchema)
      case _ => true
    }
  }
}
