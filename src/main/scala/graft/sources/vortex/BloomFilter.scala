package graft.sources.vortex

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Split-block bloom filter (SBBF) over 64-bit XXH64 hashes — the
  * file-level point-lookup complement to min/max zone maps (≙ the
  * reference format's pruning-stats role, SURVEY.md §2.9/§4; the SBBF
  * shape itself is the publicly documented Parquet/"cache-, hash- and
  * space-efficient bloom filter" design: one 256-bit block per probe,
  * 8 odd salts pick one bit per 32-bit word).
  *
  * Why file-level, and why in the MANIFEST: high-cardinality unsorted
  * id columns have useless min/max ranges (every file spans the whole
  * domain), so an `id = X` lookup over 100 TB scans everything. A
  * per-file bloom consulted at plan time drops ~99% of files for the
  * cost of the one manifest read planning already does — zero extra
  * I/O, no format change, old files simply carry no bloom and never
  * skip. False positives only cost a wasted scan; false negatives are
  * impossible over the hashed domain, so pruning stays conservative
  * as long as write- and probe-side hash EXACTLY the same
  * representation (the storage domain of FilterPruning.toDomain:
  * sign-extended float bits, unit-scaled timestamp longs, unscaled
  * decimal longs, raw UTF-8 — with -0.0 normalized to 0.0 on both
  * sides to match SQL equality).
  */
final class Sbbf(val words: Array[Int]) {
  require(words.length >= 8 && words.length % 8 == 0,
    s"sbbf: block-misaligned word count ${words.length}")
  private val nBlocks = words.length / 8

  // multiply-shift block pick from the high 32 bits (uniform without
  // requiring a power-of-two block count), salted bits from the low 32
  private def blockOf(h: Long): Int = (((h >>> 32) * nBlocks) >>> 32).toInt

  def insertHash(h: Long): Unit = {
    val base = blockOf(h) * 8
    val x = h.toInt
    var i = 0
    while (i < 8) {
      words(base + i) |= 1 << ((x * Sbbf.Salt(i)) >>> 27)
      i += 1
    }
  }

  def mightContain(h: Long): Boolean = {
    val base = blockOf(h) * 8
    val x = h.toInt
    var i = 0
    while (i < 8) {
      if ((words(base + i) & (1 << ((x * Sbbf.Salt(i)) >>> 27))) == 0) return false
      i += 1
    }
    true
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    words.foreach(bb.putInt)
    bb.array()
  }
}

object Sbbf {
  /** the 8 odd SBBF salts (public Parquet constant set) */
  val Salt: Array[Int] = Array(0x47b6137b, 0x44974d91, 0x8824ad5b, 0xa2b7289d,
                               0x705495c7, 0x2df1424b, 0x9efc4947, 0x5c6bfb31)

  def fromBytes(b: Array[Byte]): Option[Sbbf] = {
    if (b.length < 32 || b.length % 32 != 0) return None
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = new Array[Int](b.length / 4)
    var i = 0
    while (i < w.length) { w(i) = bb.getInt(); i += 1 }
    Some(new Sbbf(w))
  }

  /** ~`bitsPerKey` bits per distinct key (10 ≈ 1% fp), block-rounded,
    * clamped to [64 B, maxBytes]. Past the cap the fp rate degrades
    * gracefully — pruning weakens, correctness never does. */
  def forNdv(ndv: Long, maxBytes: Int, bitsPerKey: Int = 10): Sbbf = {
    val bytes = math.min(maxBytes.toLong, math.max(64L, (ndv * bitsPerKey + 7) / 8))
    val blocks = ((bytes + 31) / 32).toInt
    new Sbbf(new Array[Int](blocks * 8))
  }

  def hashLong(l: Long): Long = XXH64.hashLong(l, 0L)
  def hashBytes(b: Array[Byte]): Long =
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 0L)

  // -0.0 == 0.0 in SQL; their bit patterns differ, so both sides of
  // the bloom normalize the negative-zero pattern before hashing.
  // Writer-side float bits are sign-extended ints (appender `.toLong`).
  val NegZeroFloatBits: Long = java.lang.Float.floatToIntBits(-0.0f).toLong
  val NegZeroDoubleBits: Long = java.lang.Double.doubleToLongBits(-0.0)

  def normFloatBits(l: Long): Long = if (l == NegZeroFloatBits) 0L else l
  def normDoubleBits(l: Long): Long = if (l == NegZeroDoubleBits) 0L else l

  /** types a file bloom can be built (and probed) on: everything whose
    * storage domain FilterPruning.toDomain can reproduce from a pushed
    * filter constant, plus binary (probed directly). Booleans are
    * excluded (2-value domain: min/max already answers), as are
    * decimal>18 and nested (no probe-side domain). */
  def supports(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | FloatType | DoubleType |
         StringType | BinaryType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }
}

/** Per-column bloom accumulator for one file write: buffers one 64-bit
  * hash per non-null value (8 B/row of writer memory — bounded by the
  * rows-per-file a single task writes), then sizes the SBBF from the
  * DEDUPLICATED hash count at close so repeated keys don't inflate it.
  */
final class BloomBuilder(maxBytes: Int) {
  private var buf = new Array[Long](1024)
  private var n = 0

  def add(h: Long): Unit = {
    if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n * 2)
    buf(n) = h
    n += 1
  }

  def result(): Array[Byte] = {
    java.util.Arrays.sort(buf, 0, n)
    var distinct = 0L
    var i = 0
    while (i < n) {
      if (i == 0 || buf(i) != buf(i - 1)) distinct += 1
      i += 1
    }
    val f = Sbbf.forNdv(math.max(distinct, 1L), maxBytes)
    i = 0
    while (i < n) {
      if (i == 0 || buf(i) != buf(i - 1)) f.insertHash(buf(i))
      i += 1
    }
    f.toBytes
  }
}
