package graft.sources.vortex

import java.io.{BufferedOutputStream, ByteArrayInputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Chunked writer for one vortex file (one per write task — natural
  * parallel sharding, SURVEY.md §3.3). Buffers `chunkRows` rows per
  * column, encodes+compresses each column page, accumulates footer
  * metadata, writes footer on close.
  */
final class VortexFileWriter(path: Path, conf: Configuration, schema: StructType,
                             chunkRows: Int = VortexFormat.DefaultChunkRows,
                             bloomCols: Set[String] = Set.empty,
                             bloomMaxBytes: Int = VortexFormat.DefaultBloomMaxBytes) {
  import VortexFormat._

  private val fs = path.getFileSystem(conf)
  private val stream = fs.create(path, true)
  private val out = new BufferedOutputStream(stream, 1 << 20)
  private var pos: Long = 0
  private val fields = schema.fields
  private val nCols = fields.length
  private val fixed = fields.map(f => PageCodec.isFixed(f.dataType))
  // non-"us" entries store unit-scaled longs on disk (format §ts-unit)
  private val tsUnits = fields.map(tsUnit)
  private val chunks = ArrayBuffer[ChunkMeta]()

  out.write(Magic); pos += Magic.length

  // exact per-file column sums (integral + decimal≤18 only — float
  // sums are order-dependent so a metadata-answered SUM could differ
  // in the last ulp from a scan): accumulated row-wise, carried to the
  // commit manifest for SUM pushdown. Overflow → permanently None.
  private val sumable = fields.map(_.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case d: DecimalType if d.precision <= 18 => true
    case _ => false
  })
  private val sums = new Array[Long](nCols)
  private val sumOk: Array[Boolean] = sumable.clone()

  /** per-stored-column exact sums over every row written (unscaled
    * for decimals); None = unsupported type or long overflow */
  def columnSums: IndexedSeq[Option[Long]] =
    fields.indices.map(i => if (sumOk(i)) Some(sums(i)) else None)

  // opt-in per-file bloom filters (writer option "bloomFilters"):
  // hashes accumulate chunk-wise over the SAME buffered storage-domain
  // values the codec encodes (stored-unit ts longs, sign-extended
  // float bits, unscaled decimals, raw UTF-8), so probe-side hashing
  // via FilterPruning.toDomain reproduces them exactly
  private val bloomOn: Array[Boolean] =
    fields.map(f => bloomCols.contains(f.name) && Sbbf.supports(f.dataType))
  private val bloomBuilders: Array[BloomBuilder] =
    Array.tabulate(nCols)(c => if (bloomOn(c)) new BloomBuilder(bloomMaxBytes) else null)
  private var bloomResults: IndexedSeq[Option[Array[Byte]]] = _

  /** per-stored-column SBBF bytes, available after close(); None =
    * column not opted in (or unsupported type) */
  def columnBlooms: IndexedSeq[Option[Array[Byte]]] =
    if (bloomResults != null) bloomResults else fields.indices.map(_ => None)

  private def bloomPass(): Unit = {
    var c = 0
    while (c < nCols) {
      if (bloomOn(c)) {
        val b = bloomBuilders(c); val nl = nulls(c)
        if (fixed(c)) {
          val l = longs(c); var i = 0
          fields(c).dataType match {
            case FloatType =>
              while (i < count) { if (!nl(i)) b.add(Sbbf.hashLong(Sbbf.normFloatBits(l(i)))); i += 1 }
            case DoubleType =>
              while (i < count) { if (!nl(i)) b.add(Sbbf.hashLong(Sbbf.normDoubleBits(l(i)))); i += 1 }
            case _ =>
              while (i < count) { if (!nl(i)) b.add(Sbbf.hashLong(l(i))); i += 1 }
          }
        } else {
          val bn = bins(c); var i = 0
          while (i < count) { if (!nl(i)) b.add(Sbbf.hashBytes(bn(i))); i += 1 }
        }
      }
      c += 1
    }
  }

  private var count = 0
  private var longs: Array[Array[Long]] = _
  private var bins: Array[Array[Array[Byte]]] = _
  private var nulls: Array[Array[Boolean]] = _
  alloc()

  private def alloc(): Unit = {
    longs = Array.tabulate(nCols)(i => if (fixed(i)) new Array[Long](chunkRows) else null)
    bins = Array.tabulate(nCols)(i => if (!fixed(i)) new Array[Array[Byte]](chunkRows) else null)
    nulls = Array.fill(nCols)(new Array[Boolean](chunkRows))
    count = 0
  }

  /** Per-column append kernel, resolved ONCE at writer construction:
    * the former per-VALUE dataType match chain (plus per-value
    * timestamp-unit string compare) was the hot path of the whole
    * write — a 17-column × N-row write ran ~8 instanceof branches per
    * cell. One monomorphic virtual call per cell instead. */
  private abstract class Appender { def append(row: InternalRow, i: Int): Unit }

  private def appenderFor(c: Int): Appender = fields(c).dataType match {
    case BooleanType => new Appender {
      def append(r: InternalRow, i: Int): Unit = longs(c)(i) = if (r.getBoolean(c)) 1L else 0L }
    case ByteType => new Appender {
      def append(r: InternalRow, i: Int): Unit = longs(c)(i) = r.getByte(c).toLong }
    case ShortType => new Appender {
      def append(r: InternalRow, i: Int): Unit = longs(c)(i) = r.getShort(c).toLong }
    case IntegerType | DateType => new Appender {
      def append(r: InternalRow, i: Int): Unit = longs(c)(i) = r.getInt(c).toLong }
    case TimestampType | TimestampNTZType =>
      if (tsUnits(c) == "us") new Appender {
        def append(r: InternalRow, i: Int): Unit = longs(c)(i) = r.getLong(c) }
      else { val unit = tsUnits(c); new Appender {
        def append(r: InternalRow, i: Int): Unit = longs(c)(i) = storedFromMicros(r.getLong(c), unit) } }
    case LongType => new Appender {
      def append(r: InternalRow, i: Int): Unit = longs(c)(i) = r.getLong(c) }
    case FloatType => new Appender {
      def append(r: InternalRow, i: Int): Unit =
        longs(c)(i) = java.lang.Float.floatToIntBits(r.getFloat(c)).toLong }
    case DoubleType => new Appender {
      def append(r: InternalRow, i: Int): Unit =
        longs(c)(i) = java.lang.Double.doubleToLongBits(r.getDouble(c)) }
    case d: DecimalType if d.precision <= 18 => new Appender {
      def append(r: InternalRow, i: Int): Unit =
        longs(c)(i) = r.getDecimal(c, d.precision, d.scale).toUnscaledLong }
    case d: DecimalType => new Appender {
      def append(r: InternalRow, i: Int): Unit =
        bins(c)(i) = r.getDecimal(c, d.precision, d.scale)
          .toJavaBigDecimal.unscaledValue.toByteArray }
    case StringType => new Appender {
      def append(r: InternalRow, i: Int): Unit = bins(c)(i) = r.getUTF8String(c).getBytes }
    case BinaryType => new Appender {
      def append(r: InternalRow, i: Int): Unit = bins(c)(i) = r.getBinary(c) }
    case dt if NestedCodec.isNested(dt) && NestedCodec.supported(dt) => new Appender {
      def append(r: InternalRow, i: Int): Unit = bins(c)(i) = NestedCodec.serialize(r.get(c, dt), dt) }
    case other => throw new UnsupportedOperationException(s"vortex: unsupported type $other")
  }

  private val appenders: Array[Appender] = Array.tabulate(nCols)(appenderFor)

  def write(row: InternalRow): Unit = {
    var c = 0
    while (c < nCols) {
      if (row.isNullAt(c)) nulls(c)(count) = true
      else {
        appenders(c).append(row, count)
        if (sumOk(c)) {
          // integral / unscaled-decimal longs land in longs(c)(count)
          try sums(c) = Math.addExact(sums(c), longs(c)(count))
          catch { case _: ArithmeticException => sumOk(c) = false }
        }
      }
      c += 1
    }
    count += 1
    if (count == chunkRows) flushChunk()
  }

  /** Columnar bulk-copy fill kernel, resolved once per column like
    * [[appenderFor]]: copies rows [src, src+len) of a ColumnVector into
    * this writer's chunk buffers at [dst, dst+len). Column-outer
    * segment loops — one monomorphic primitive loop per column segment
    * instead of a row-iterator step + virtual appender call per cell.
    * Primitive fills read null slots too (vector getters are safe
    * there and the codec ignores slots flagged in `nulls`); object
    * fills must skip them. */
  private abstract class BatchFill {
    def fill(vec: org.apache.spark.sql.vectorized.ColumnVector,
             src: Int, dst: Int, len: Int): Unit
  }
  private type CV = org.apache.spark.sql.vectorized.ColumnVector

  private def batchFillFor(c: Int): BatchFill = fields(c).dataType match {
    case BooleanType => new BatchFill { def fill(v: CV, s: Int, d: Int, n: Int): Unit = {
      val l = longs(c); var k = 0
      while (k < n) { l(d + k) = if (!v.isNullAt(s + k) && v.getBoolean(s + k)) 1L else 0L; k += 1 } } }
    case ByteType => new BatchFill { def fill(v: CV, s: Int, d: Int, n: Int): Unit = {
      val l = longs(c); var k = 0
      while (k < n) { l(d + k) = v.getByte(s + k).toLong; k += 1 } } }
    case ShortType => new BatchFill { def fill(v: CV, s: Int, d: Int, n: Int): Unit = {
      val l = longs(c); var k = 0
      while (k < n) { l(d + k) = v.getShort(s + k).toLong; k += 1 } } }
    case IntegerType | DateType => new BatchFill { def fill(v: CV, s: Int, d: Int, n: Int): Unit = {
      val l = longs(c); var k = 0
      while (k < n) { l(d + k) = v.getInt(s + k).toLong; k += 1 } } }
    case TimestampType | TimestampNTZType =>
      if (tsUnits(c) == "us") new BatchFill { def fill(v: CV, s: Int, d: Int, n: Int): Unit = {
        val l = longs(c); var k = 0
        while (k < n) { l(d + k) = v.getLong(s + k); k += 1 } } }
      else { val unit = tsUnits(c); new BatchFill { def fill(v: CV, s: Int, d: Int, n: Int): Unit = {
        val l = longs(c); var k = 0
        while (k < n) {
          if (!v.isNullAt(s + k)) l(d + k) = storedFromMicros(v.getLong(s + k), unit)
          k += 1 } } } }
    case LongType => new BatchFill { def fill(v: CV, s: Int, d: Int, n: Int): Unit = {
      val l = longs(c); var k = 0
      while (k < n) { l(d + k) = v.getLong(s + k); k += 1 } } }
    case FloatType => new BatchFill { def fill(v: CV, s: Int, d: Int, n: Int): Unit = {
      val l = longs(c); var k = 0
      while (k < n) { l(d + k) = java.lang.Float.floatToIntBits(v.getFloat(s + k)).toLong; k += 1 } } }
    case DoubleType => new BatchFill { def fill(v: CV, s: Int, d: Int, n: Int): Unit = {
      val l = longs(c); var k = 0
      while (k < n) { l(d + k) = java.lang.Double.doubleToLongBits(v.getDouble(s + k)); k += 1 } } }
    case dt: DecimalType if dt.precision <= 18 => new BatchFill {
      def fill(v: CV, s: Int, d: Int, n: Int): Unit = {
        val l = longs(c); var k = 0
        while (k < n) {
          if (!v.isNullAt(s + k)) l(d + k) = v.getDecimal(s + k, dt.precision, dt.scale).toUnscaledLong
          k += 1 } } }
    case dt: DecimalType => new BatchFill { def fill(v: CV, s: Int, d: Int, n: Int): Unit = {
      val b = bins(c); var k = 0
      while (k < n) {
        if (!v.isNullAt(s + k)) b(d + k) = v.getDecimal(s + k, dt.precision, dt.scale)
          .toJavaBigDecimal.unscaledValue.toByteArray
        k += 1 } } }
    case StringType => new BatchFill { def fill(v: CV, s: Int, d: Int, n: Int): Unit = {
      val b = bins(c); var k = 0
      while (k < n) {
        // getBytes copies out of the (reused) batch buffer
        if (!v.isNullAt(s + k)) b(d + k) = v.getUTF8String(s + k).getBytes
        k += 1 } } }
    case BinaryType => new BatchFill { def fill(v: CV, s: Int, d: Int, n: Int): Unit = {
      val b = bins(c); var k = 0
      while (k < n) { if (!v.isNullAt(s + k)) b(d + k) = v.getBinary(s + k); k += 1 } } }
    case dt if NestedCodec.isNested(dt) && NestedCodec.supported(dt) => new BatchFill {
      def fill(v: CV, s: Int, d: Int, n: Int): Unit = {
        val b = bins(c); var k = 0
        while (k < n) {
          if (!v.isNullAt(s + k)) {
            val value: Any = dt match {
              case at: ArrayType => v.getArray(s + k)
              case mt: MapType => v.getMap(s + k)
              case st: StructType => v.getStruct(s + k)
              case _ => null // unreachable: isNested gates
            }
            b(d + k) = NestedCodec.serialize(value, dt)
          }
          k += 1 } } }
    case other => throw new UnsupportedOperationException(s"vortex: unsupported type $other")
  }

  private lazy val batchFills: Array[BatchFill] = Array.tabulate(nCols)(batchFillFor)

  /** Bulk-copy entry: append a whole ColumnarBatch (e.g. straight from
    * the vectorized parquet reader — see VortexBulkCopy) without ever
    * materializing rows. Produces byte-identical files to the row path:
    * same chunking, encodings, footer, and exact column sums. */
  def writeBatch(batch: org.apache.spark.sql.vectorized.ColumnarBatch): Unit = {
    val total = batch.numRows()
    var src = 0
    while (src < total) {
      val len = math.min(chunkRows - count, total - src)
      var c = 0
      while (c < nCols) {
        val vec = batch.column(c)
        if (vec.hasNull) {
          val nl = nulls(c); var k = 0
          while (k < len) { if (vec.isNullAt(src + k)) nl(count + k) = true; k += 1 }
        }
        batchFills(c).fill(vec, src, count, len)
        // exact sums ride the long buffers, same as write()
        if (sumOk(c)) {
          val l = longs(c); val nl = nulls(c); var k = 0
          while (k < len && sumOk(c)) {
            if (!nl(count + k)) {
              try sums(c) = Math.addExact(sums(c), l(count + k))
              catch { case _: ArithmeticException => sumOk(c) = false }
            }
            k += 1
          }
        }
        c += 1
      }
      count += len
      src += len
      if (count == chunkRows) flushChunk()
    }
  }

  private def flushChunk(): Unit = {
    if (count == 0) return
    bloomPass()
    val metas = new Array[ColumnChunkMeta](nCols)
    var c = 0
    while (c < nCols) {
      val vec =
        if (fixed(c)) new ColVec(count, nulls(c), longs(c), null)
        else new ColVec(count, nulls(c), null, bins(c))
      val enc = PageCodec.encode(vec, fields(c).dataType)
      out.write(enc.bytes)
      metas(c) = ColumnChunkMeta(pos, enc.bytes.length, enc.encoding, enc.compressed,
        enc.nullCount, enc.min, enc.max)
      pos += enc.bytes.length
      c += 1
    }
    chunks += ChunkMeta(count, metas)
    alloc()
  }

  def close(): Unit = {
    flushChunk()
    if (bloomOn.exists(identity))
      bloomResults = fields.indices.map(c =>
        if (bloomOn(c)) Some(bloomBuilders(c).result()) else None)
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    writeFooter(dos, Footer(schema, chunks.toArray))
    dos.flush()
    val fb = bos.toByteArray
    out.write(fb)
    val tail = java.nio.ByteBuffer.allocate(12)
    tail.putLong(fb.length.toLong); tail.put(Magic)
    out.write(tail.array())
    out.flush(); out.close()
  }
}

/** Single-slot async page prefetcher: while the consumer decodes chunk
  * i, a pool thread fetches chunk i+1's column pages — I/O overlaps
  * decode (≙ the reference scan's async I/O role). At most ONE task is
  * outstanding per reader, so the underlying stream is never touched by
  * two threads at once and memory overhead is bounded at one chunk.
  */
final class ChunkPrefetcher(in: org.apache.hadoop.fs.FSDataInputStream,
                            footer: VortexFormat.Footer,
                            chunkIdxs: Array[Int],
                            fileCols: Array[Int]) extends AutoCloseable {
  private var pos = 0
  private var pending: java.util.concurrent.Future[Array[Array[Byte]]] = _

  private def fetch(ci: Int): Array[Array[Byte]] = {
    val chunk = footer.chunks(ci)
    fileCols.map { c =>
      if (c < 0) null
      else {
        val m = chunk.columns(c)
        val buf = new Array[Byte](m.length)
        in.readFully(m.offset, buf)
        buf
      }
    }
  }

  /** (chunk index, raw pages aligned with fileCols), or null at end */
  def next(): (Int, Array[Array[Byte]]) = {
    if (pos >= chunkIdxs.length) return null
    val ci = chunkIdxs(pos); pos += 1
    val raw = if (pending != null) pending.get() else fetch(ci)
    pending =
      if (pos < chunkIdxs.length) {
        val nci = chunkIdxs(pos)
        ChunkPrefetcher.pool.submit(new java.util.concurrent.Callable[Array[Array[Byte]]] {
          override def call(): Array[Array[Byte]] = fetch(nci)
        })
      } else null
    (ci, raw)
  }

  override def close(): Unit = {
    if (pending != null) {
      try pending.get() catch { case _: Exception => }
      pending = null
    }
    in.close()
  }
}

object ChunkPrefetcher {
  /** shared daemon pool — prefetch is I/O-bound; a few threads suffice */
  lazy val pool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, Runtime.getRuntime.availableProcessors()),
      (r: Runnable) => {
        val t = new Thread(r, "vortex-prefetch"); t.setDaemon(true); t
      })
}

object VortexFileReader {
  import VortexFormat._

  // per-JVM footer cache (≙ the reference's moka metadata caches,
  // Cargo.lock:4285,4428): executors re-open the same files across
  // tasks; footers are small and immutable per (path,len,mtime).
  private val footerCache = new java.util.concurrent.ConcurrentHashMap[String, Footer]()

  /** actual (non-cache) footer fetches in this JVM — planning-path
    * observability; tests pin this to ≤1 per file */
  val footerFetches = new java.util.concurrent.atomic.AtomicLong()

  /** test hook: force cold-footer conditions */
  def clearFooterCache(): Unit = footerCache.clear()

  /** page decodes in this JVM — tests pin footer-stats-answered
    * aggregates (and trimmed limit scans) to zero / bounded decodes */
  val pageDecodes = new java.util.concurrent.atomic.AtomicLong()

  def readFooter(path: Path, conf: Configuration): Footer = {
    val fs = path.getFileSystem(conf)
    val st = fs.getFileStatus(path)
    val key = s"${path.toString}#${st.getLen}#${st.getModificationTime}"
    val cached = footerCache.get(key)
    if (cached != null) return cached
    footerFetches.incrementAndGet()
    val in = fs.open(path)
    try {
      val len = st.getLen
      val tail = new Array[Byte](12)
      in.readFully(len - 12, tail)
      val bb = java.nio.ByteBuffer.wrap(tail)
      val footerLen = bb.getLong()
      val magic = new Array[Byte](4); bb.get(magic)
      require(java.util.Arrays.equals(magic, Magic), s"not a vortex file: $path")
      val fb = new Array[Byte](footerLen.toInt)
      in.readFully(len - 12 - footerLen, fb)
      val footer = VortexFormat.readFooter(new DataInputStream(new ByteArrayInputStream(fb)))
      footerCache.put(key, footer)
      footer
    } finally in.close()
  }

  /** Decode one column page and normalize unit-scaled timestamp longs
    * to µs (format §ts-unit) — the single decode entry for every scan
    * path, so unit handling can't diverge between readers. */
  def decodeColumn(buf: Array[Byte], m: ColumnChunkMeta, rows: Int, field: StructField): ColVec = {
    pageDecodes.incrementAndGet()
    val vec = PageCodec.decode(buf, m.encoding, m.compressed, rows, m.nullCount, field.dataType)
    val u = tsUnit(field)
    if (u != "us" && vec.longs != null) {
      var i = 0
      while (i < vec.n) { vec.longs(i) = microsFromStored(vec.longs(i), u); i += 1 }
    }
    vec
  }

  /** Decode the requested columns of chunks [chunkStart, chunkEnd). */
  def readChunks(path: Path, conf: Configuration, footer: Footer,
                 chunkStart: Int, chunkEnd: Int,
                 colIndices: Array[Int]): Iterator[(Int, Array[ColVec])] = {
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    var closed = false
    new Iterator[(Int, Array[ColVec])] {
      private var ci = chunkStart
      override def hasNext: Boolean = {
        val h = ci < chunkEnd
        if (!h && !closed) { in.close(); closed = true }
        h
      }
      override def next(): (Int, Array[ColVec]) = {
        val chunk = footer.chunks(ci)
        val vecs = colIndices.map { c =>
          val m = chunk.columns(c)
          val buf = new Array[Byte](m.length)
          in.readFully(m.offset, buf)
          decodeColumn(buf, m, chunk.rowCount, footer.schema.fields(c))
        }
        ci += 1
        (chunk.rowCount, vecs)
      }
    }
  }

  /** Catalyst value from a decoded vector slot. */
  def value(vec: ColVec, i: Int, dt: DataType): Any = {
    if (vec.nulls(i)) return null
    dt match {
      case BooleanType => vec.longs(i) != 0L
      case ByteType => vec.longs(i).toByte
      case ShortType => vec.longs(i).toShort
      case IntegerType | DateType => vec.longs(i).toInt
      case LongType | TimestampType | TimestampNTZType => vec.longs(i)
      case FloatType => java.lang.Float.intBitsToFloat(vec.longs(i).toInt)
      case DoubleType => java.lang.Double.longBitsToDouble(vec.longs(i))
      case d: DecimalType if d.precision <= 18 =>
        org.apache.spark.sql.types.Decimal.createUnsafe(vec.longs(i), d.precision, d.scale)
      case d: DecimalType =>
        org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(new java.math.BigInteger(vec.bins(i)), d.scale), d.precision, d.scale)
      case StringType => UTF8String.fromBytes(vec.bins(i))
      case BinaryType => vec.bins(i)
      case dt if NestedCodec.isNested(dt) => NestedCodec.deserialize(vec.bins(i), dt)
      case other => throw new UnsupportedOperationException(s"vortex: unsupported type $other")
    }
  }
}
