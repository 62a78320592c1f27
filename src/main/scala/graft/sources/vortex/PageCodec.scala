package graft.sources.vortex

import java.nio.{ByteBuffer, ByteOrder}
import com.github.luben.zstd.Zstd
import org.apache.spark.sql.types._

/** One decoded/to-encode column chunk. Fixed-width types live in
  * `longs` (floats/doubles as IEEE bits, dates as days, timestamps as
  * µs, decimals ≤18 digits as unscaled longs); var-width types
  * (string/binary/decimal>18) live in `bins`. `nulls(i)` marks NULL.
  */
final class ColVec(val n: Int, val nulls: Array[Boolean],
                   val longs: Array[Long], val bins: Array[Array[Byte]]) {
  def isFixed: Boolean = longs != null
  def nullCount: Int = { var c = 0; var i = 0; while (i < n) { if (nulls(i)) c += 1; i += 1 }; c }
  /** shredded struct page (EncStruct): decoded child vectors in the
    * READ schema's child order, with their stored fields — longs/bins
    * are null for such a vec (StructCodec.decode) */
  var kids: Array[ColVec] = null
  var kidFields: Array[org.apache.spark.sql.types.StructField] = null
  /** for nested blob pages: the STORED type the bytes serialize —
    * reads with a pruned nested schema deserialize with this and
    * project (NestedProject) */
  var blobType: org.apache.spark.sql.types.DataType = null

  /** New vector keeping only the `keep` ordinals (deletion-vector
    * survivors), recursing into shredded-struct children. */
  def select(keep: Array[Int]): ColVec = {
    val m = keep.length
    val nn = new Array[Boolean](m)
    var i = 0
    while (i < m) { nn(i) = nulls(keep(i)); i += 1 }
    val nl = if (longs == null) null else {
      val a = new Array[Long](m); var j = 0
      while (j < m) { a(j) = longs(keep(j)); j += 1 }; a
    }
    val nb = if (bins == null) null else {
      val a = new Array[Array[Byte]](m); var j = 0
      while (j < m) { a(j) = bins(keep(j)); j += 1 }; a
    }
    val v = new ColVec(m, nn, nl, nb)
    if (kids != null) { v.kids = kids.map(_.select(keep)); v.kidFields = kidFields }
    v.blobType = blobType
    v
  }
}

/** Per-chunk page encode/decode: adaptive encoding selection
  * (constant / run-end / dictionary / plain — the vortex-btrblocks /
  * vortex-runend / vortex-fsst-role split of SURVEY.md §2.9) + zstd
  * block compression + typed min/max stats.
  */
object PageCodec {
  import VortexFormat._

  // zstd block level (vortex-zstd role). 3 is the shipped default;
  // env-tunable for write-throughput A/Bs only — readers are level-
  // agnostic (the frame carries the raw length).
  // validated at init so a bad value fails with a readable message
  // instead of an ExceptionInInitializerError mid-write; on a real
  // cluster the env must be set on EXECUTORS too (spark.executorEnv.*)
  private val ZstdLevel: Int = {
    val raw = sys.env.getOrElse("GRAFT_ZSTD_LEVEL", "3")
    val lvl = raw.toIntOption.getOrElse(
      throw new IllegalArgumentException(s"GRAFT_ZSTD_LEVEL must be an int 1..19, got '$raw'"))
    require(lvl >= 1 && lvl <= 19, s"GRAFT_ZSTD_LEVEL must be in 1..19, got $lvl")
    lvl
  }

  def width(dt: DataType): Int = dt match {
    case BooleanType | ByteType => 1
    case ShortType => 2
    case IntegerType | DateType | FloatType => 4
    case _ => 8
  }

  def isFixed(dt: DataType): Boolean = dt match {
    case StringType | BinaryType => false
    case d: DecimalType => d.precision <= 18
    case dt if NestedCodec.isNested(dt) => false
    case _ => true
  }

  // ---- plain packing -----------------------------------------------------

  private def packFixed(vals: Array[Long], n: Int, w: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(n * w).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      val v = vals(i)
      w match {
        case 1 => bb.put(v.toByte)
        case 2 => bb.putShort(v.toShort)
        case 4 => bb.putInt(v.toInt)
        case _ => bb.putLong(v)
      }
      i += 1
    }
    bb.array()
  }

  private def unpackFixed(bytes: ByteBuffer, n: Int, w: Int): Array[Long] = {
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = w match {
        case 1 => bytes.get().toLong
        case 2 => bytes.getShort().toLong
        case 4 => bytes.getInt().toLong
        case _ => bytes.getLong()
      }
      i += 1
    }
    out
  }

  private[vortex] def packVar(vals: Array[Array[Byte]], n: Int): Array[Byte] = {
    var total = 0
    var i = 0
    while (i < n) { if (vals(i) != null) total += vals(i).length; i += 1 }
    val bb = ByteBuffer.allocate(4 * (n + 1) + total).order(ByteOrder.LITTLE_ENDIAN)
    var off = 0
    bb.putInt(0)
    i = 0
    while (i < n) {
      if (vals(i) != null) off += vals(i).length
      bb.putInt(off)
      i += 1
    }
    i = 0
    while (i < n) { if (vals(i) != null) bb.put(vals(i)); i += 1 }
    bb.array()
  }

  private[vortex] def unpackVar(bytes: ByteBuffer, n: Int): Array[Array[Byte]] = {
    val offs = new Array[Int](n + 1)
    var i = 0
    while (i <= n) { offs(i) = bytes.getInt(); i += 1 }
    val out = new Array[Array[Byte]](n)
    i = 0
    while (i < n) {
      val len = offs(i + 1) - offs(i)
      val a = new Array[Byte](len); bytes.get(a); out(i) = a
      i += 1
    }
    out
  }

  // ---- null bitmap -------------------------------------------------------

  private def packNulls(nulls: Array[Boolean], n: Int): Array[Byte] = {
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) { if (nulls(i)) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte; i += 1 }
    out
  }

  private def unpackNulls(bytes: ByteBuffer, n: Int): Array[Boolean] = {
    val raw = new Array[Byte]((n + 7) / 8); bytes.get(raw)
    val out = new Array[Boolean](n)
    var i = 0
    while (i < n) { out(i) = (raw(i >> 3) & (1 << (i & 7))) != 0; i += 1 }
    out
  }

  // ---- frame-of-reference bit packing ------------------------------------

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }

  /** pack (v - min) in `bits` bits each, little-endian bit order */
  private[vortex] def packBits(vals: Array[Long], n: Int, min: Long, bits: Int): Array[Byte] = {
    val out = new Array[Byte](17 + (n.toLong * bits + 7).toInt / 8)
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(min); bb.put(bits.toByte)
    var bitPos = 0
    val base = 9
    var i = 0
    while (i < n) {
      var v = vals(i) - min
      var left = bits
      while (left > 0) {
        val byteIdx = base + (bitPos >> 3)
        val off = bitPos & 7
        val take = math.min(8 - off, left)
        out(byteIdx) = (out(byteIdx) | (((v & ((1L << take) - 1)) << off) & 0xff)).toByte
        v >>>= take
        bitPos += take
        left -= take
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, base + (bitPos + 7) / 8)
  }

  private[vortex] def unpackBits(bb: ByteBuffer, n: Int): Array[Long] = {
    val min = bb.getLong()
    val bits = bb.get().toInt
    val payload = new Array[Byte](((n.toLong * bits + 7) / 8).toInt)
    bb.get(payload)
    val out = new Array[Long](n)
    var bitPos = 0
    var i = 0
    while (i < n) {
      var v = 0L
      var got = 0
      while (got < bits) {
        val b = payload(bitPos >> 3) & 0xff
        val off = bitPos & 7
        val take = math.min(8 - off, bits - got)
        v |= (((b >> off) & ((1 << take) - 1)).toLong << got)
        bitPos += take
        got += take
      }
      out(i) = min + v
      i += 1
    }
    out
  }

  // ---- encoding selection ------------------------------------------------

  /** Substitute nulls with the previous value (0/empty at start) so runs
    * survive null gaps; nulls are restored from the bitmap on read. */
  private def fillNulls(vec: ColVec): Unit = {
    var i = 0
    if (vec.isFixed) {
      var prev = 0L
      while (i < vec.n) { if (vec.nulls(i)) vec.longs(i) = prev else prev = vec.longs(i); i += 1 }
    } else {
      var prev = Array.emptyByteArray
      while (i < vec.n) { if (vec.nulls(i) || vec.bins(i) == null) vec.bins(i) = prev else prev = vec.bins(i); i += 1 }
    }
  }

  private def countRuns(vec: ColVec): Int = {
    var runs = 1
    var i = 1
    if (vec.isFixed) {
      while (i < vec.n) { if (vec.longs(i) != vec.longs(i - 1)) runs += 1; i += 1 }
    } else {
      while (i < vec.n) { if (!java.util.Arrays.equals(vec.bins(i), vec.bins(i - 1))) runs += 1; i += 1 }
    }
    runs
  }

  final case class Encoded(encoding: Byte, compressed: Boolean, bytes: Array[Byte],
                           nullCount: Int, min: Option[Array[Byte]], max: Option[Array[Byte]])

  /** Encode one column chunk. Mutates vec (null back-fill). */
  def encode(vec: ColVec, dt: DataType): Encoded = {
    val n = vec.n
    val nullCount = vec.nullCount
    val (minB, maxB) = stats(vec, dt, nullCount)
    fillNulls(vec)
    val w = width(dt)
    val bitmap = if (nullCount > 0) packNulls(vec.nulls, n) else Array.emptyByteArray

    val payload: (Byte, Array[Byte]) =
      if (n == 0) (EncPlain, Array.emptyByteArray)
      else {
        val runs = countRuns(vec)
        if (runs == 1) {
          // constant chunk (incl. all-null after fill = single 0/empty value)
          if (vec.isFixed) (EncConstant, packFixed(vec.longs, 1, w))
          else (EncConstant, packVar(vec.bins, 1))
        } else if (runs.toLong * (4 + w) < n.toLong * w / 2 && vec.isFixed) {
          // run-end encoding: [nRuns][runEnds][runValues]
          val ends = new Array[Int](runs); val rv = new Array[Long](runs)
          var r = 0; var i = 1
          rv(0) = vec.longs(0)
          while (i < n) {
            if (vec.longs(i) != vec.longs(i - 1)) { ends(r) = i; r += 1; rv(r) = vec.longs(i) }
            i += 1
          }
          ends(r) = n
          val bb = ByteBuffer.allocate(4 + 4 * runs + runs * w).order(ByteOrder.LITTLE_ENDIAN)
          bb.putInt(runs)
          ends.foreach(bb.putInt)
          bb.put(packFixed(rv, runs, w))
          (EncRunEnd, bb.array())
        } else if (vec.isFixed && isIntegral(dt)) {
          // FoR-bitpack vs delta+bitpack vs plain: pick the fewest bits.
          var mn = vec.longs(0); var mx = mn
          var i = 1
          while (i < n) {
            val v = vec.longs(i)
            if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          val range = mx - mn
          val forBits =
            if (range < 0) -1 // subtraction overflow (mx>0, mn<0, huge spread)
            else if (range == 0) 1
            else 64 - java.lang.Long.numberOfLeadingZeros(range)
          // deltas of near-sorted columns (timestamps, assigned ids)
          // span far fewer bits than the values themselves
          var dMn = 0L; var dMx = 0L; var dOk = n > 1
          i = 1
          while (i < n && dOk) {
            val d = vec.longs(i) - vec.longs(i - 1)
            // overflow check: sign of (a-b) must match the comparison
            if ((vec.longs(i) >= vec.longs(i - 1)) != (d >= 0)) dOk = false
            else {
              if (i == 1) { dMn = d; dMx = d }
              if (d < dMn) dMn = d
              if (d > dMx) dMx = d
            }
            i += 1
          }
          val dRange = dMx - dMn
          val deltaBits =
            if (!dOk || dRange < 0) -1
            else if (dRange == 0) 1
            else 64 - java.lang.Long.numberOfLeadingZeros(dRange)
          val forSize = if (forBits > 0 && forBits < 8 * w) 9 + (n.toLong * forBits + 7) / 8 else Long.MaxValue
          val deltaSize = if (deltaBits > 0) 17 + ((n - 1).toLong * deltaBits + 7) / 8 else Long.MaxValue
          val plainSize = n.toLong * w
          if (deltaSize < forSize && deltaSize < plainSize) {
            val deltas = new Array[Long](n - 1)
            i = 1
            while (i < n) { deltas(i - 1) = vec.longs(i) - vec.longs(i - 1); i += 1 }
            val packed = packBits(deltas, n - 1, dMn, deltaBits)
            val bb = ByteBuffer.allocate(8 + packed.length).order(ByteOrder.LITTLE_ENDIAN)
            bb.putLong(vec.longs(0)); bb.put(packed)
            (EncDelta, bb.array())
          } else if (forSize < plainSize) {
            (EncBitpack, packBits(vec.longs, n, mn, forBits))
          } else (EncPlain, packFixed(vec.longs, n, w))
        } else if (!vec.isFixed) {
          // dictionary for strings/binary when cardinality is low
          val dict = new java.util.LinkedHashMap[java.nio.ByteBuffer, Integer]()
          val idx = new Array[Long](n)
          var i = 0; var ok = true
          while (i < n && ok) {
            val key = java.nio.ByteBuffer.wrap(vec.bins(i))
            var id = dict.get(key)
            if (id == null) {
              if (dict.size >= 4096 || dict.size * 4 >= n) ok = false
              else { id = dict.size; dict.put(key, id) }
            }
            if (ok) idx(i) = id.toLong
            i += 1
          }
          if (ok) {
            val entries = new Array[Array[Byte]](dict.size)
            val it = dict.keySet().iterator(); var j = 0
            while (it.hasNext) { entries(j) = it.next().array(); j += 1 }
            val dictBytes = packVar(entries, entries.length)
            val iw = if (entries.length <= 256) 1 else if (entries.length <= 65536) 2 else 4
            val bb = ByteBuffer.allocate(8 + dictBytes.length + 1 + n * iw).order(ByteOrder.LITTLE_ENDIAN)
            bb.putInt(entries.length); bb.putInt(dictBytes.length); bb.put(dictBytes)
            bb.put(iw.toByte); bb.put(packFixed(idx, n, iw))
            (EncDict, bb.array())
          } else {
            // high-cardinality strings: FSST-role candidate vs plain,
            // judged on POST-zstd size so the tier can never regress
            val plain = packVar(vec.bins, n)
            val avgLen = plain.length.toDouble / math.max(n, 1)
            val fsstPick: Option[Array[Byte]] =
              if ((dt == StringType || dt == BinaryType) && avgLen >= 12 && n >= 64) {
                val syms = FsstCodec.train(vec.bins, n)
                if (syms.length >= 8) {
                  val fsst = FsstCodec.encode(vec.bins, n, syms)
                  val zp = Zstd.compress(plain, ZstdLevel).length
                  val zf = Zstd.compress(fsst, ZstdLevel).length
                  if (zf < zp) Some(fsst) else None
                } else None
              } else None
            fsstPick.map((EncFsst, _)).getOrElse((EncPlain, plain))
          }
        } else if (dt == DoubleType || dt == FloatType) {
          // ALP tier: decimal-origin floats are scaled ints in disguise
          AlpCodec.tryEncode(vec.longs, n, dt == FloatType) match {
            case Some(alp) => (EncAlp, alp)
            case None => (EncPlain, packFixed(vec.longs, n, w))
          }
        } else (EncPlain, packFixed(vec.longs, n, w))
      }

    val raw = new Array[Byte](bitmap.length + payload._2.length)
    System.arraycopy(bitmap, 0, raw, 0, bitmap.length)
    System.arraycopy(payload._2, 0, raw, bitmap.length, payload._2.length)
    // zstd block compression when it pays (≙ vortex-zstd role)
    if (raw.length >= 128) {
      val comp = Zstd.compress(raw, ZstdLevel)
      if (comp.length < raw.length - 16) {
        val bb = ByteBuffer.allocate(4 + comp.length).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(raw.length); bb.put(comp)
        return Encoded(payload._1, compressed = true, bb.array(), nullCount, minB, maxB)
      }
    }
    Encoded(payload._1, compressed = false, raw, nullCount, minB, maxB)
  }

  def decode(bytes: Array[Byte], enc: Byte, compressed: Boolean, n: Int,
             nullCount: Int, dt: DataType): ColVec = {
    val raw =
      if (compressed) {
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val rawLen = bb.getInt()
        Zstd.decompress(java.util.Arrays.copyOfRange(bytes, 4, bytes.length), rawLen)
      } else bytes
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val nulls = if (nullCount > 0) unpackNulls(bb, n) else new Array[Boolean](n)
    val w = width(dt)
    val fixed = isFixed(dt)
    enc match {
      case EncConstant =>
        if (fixed) {
          val v = unpackFixed(bb, 1, w)(0)
          val arr = new Array[Long](n); java.util.Arrays.fill(arr, v)
          new ColVec(n, nulls, arr, null)
        } else {
          val v = unpackVar(bb, 1)(0)
          val arr = new Array[Array[Byte]](n); java.util.Arrays.fill(arr.asInstanceOf[Array[AnyRef]], v)
          new ColVec(n, nulls, null, arr)
        }
      case EncRunEnd =>
        val runs = bb.getInt()
        val ends = new Array[Int](runs)
        var i = 0
        while (i < runs) { ends(i) = bb.getInt(); i += 1 }
        val rv = unpackFixed(bb, runs, w)
        val arr = new Array[Long](n)
        var r = 0; i = 0
        while (i < n) {
          if (i >= ends(r)) r += 1
          arr(i) = rv(r); i += 1
        }
        new ColVec(n, nulls, arr, null)
      case EncBitpack =>
        new ColVec(n, nulls, unpackBits(bb, n), null)
      case EncDict =>
        val dictSize = bb.getInt(); val dictLen = bb.getInt()
        val dictSlice = bb.slice(); dictSlice.limit(dictLen); dictSlice.order(ByteOrder.LITTLE_ENDIAN)
        val entries = unpackVar(dictSlice, dictSize)
        bb.position(bb.position() + dictLen)
        val iw = bb.get().toInt
        // dict indices are UNSIGNED — a signed read sign-extends byte
        // indices 128..255 (short 32768..65535) to negatives and AIOOBEs
        val arr = new Array[Array[Byte]](n)
        var i = 0
        while (i < n) {
          val id = iw match {
            case 1 => bb.get() & 0xFF
            case 2 => bb.getShort() & 0xFFFF
            case _ => bb.getInt()
          }
          arr(i) = entries(id); i += 1
        }
        new ColVec(n, nulls, null, arr)
      case EncDelta =>
        val first = bb.getLong()
        val arr = new Array[Long](n)
        arr(0) = first
        if (n > 1) {
          val deltas = unpackBits(bb, n - 1)
          var i = 1
          while (i < n) { arr(i) = arr(i - 1) + deltas(i - 1); i += 1 }
        }
        new ColVec(n, nulls, arr, null)
      case EncFsst =>
        new ColVec(n, nulls, null, FsstCodec.decode(bb, n))
      case EncAlp =>
        new ColVec(n, nulls, AlpCodec.decode(bb, n, dt == FloatType), null)
      case _ => // plain
        if (fixed) new ColVec(n, nulls, unpackFixed(bb, n, w), null)
        else new ColVec(n, nulls, null, unpackVar(bb, n))
    }
  }

  // ---- stats -------------------------------------------------------------

  /** typed comparison in the long domain */
  def lessThan(a: Long, b: Long, dt: DataType): Boolean = dt match {
    case FloatType => java.lang.Float.intBitsToFloat(a.toInt) < java.lang.Float.intBitsToFloat(b.toInt)
    case DoubleType => java.lang.Double.longBitsToDouble(a) < java.lang.Double.longBitsToDouble(b)
    case _ => a < b
  }

  private def binLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  private def longToBytes(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  def bytesToLong(b: Array[Byte]): Long =
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong()

  private def stats(vec: ColVec, dt: DataType, nullCount: Int): (Option[Array[Byte]], Option[Array[Byte]]) = {
    if (nullCount == vec.n || vec.n == 0) return (None, None)
    dt match {
      case BooleanType | BinaryType => (None, None)
      case d: DecimalType if d.precision > 18 => (None, None)
      case StringType =>
        var mn: Array[Byte] = null; var mx: Array[Byte] = null
        var i = 0
        while (i < vec.n) {
          if (!vec.nulls(i)) {
            val v = vec.bins(i)
            if (mn == null || binLess(v, mn)) mn = v
            if (mx == null || binLess(mx, v)) mx = v
          }
          i += 1
        }
        (Some(mn), Some(mx))
      case _ if isFixed(dt) =>
        var mn = 0L; var mx = 0L; var seen = false
        var i = 0
        while (i < vec.n) {
          if (!vec.nulls(i)) {
            val v = vec.longs(i)
            // NaN compares false both ways, so a chunk [1.0, NaN] would
            // record max=1.0 and pruning for `> 5.0` would drop matching
            // NaN rows (Spark orders NaN above +Inf). No stats then —
            // parquet's approach.
            dt match {
              case FloatType if java.lang.Float.isNaN(java.lang.Float.intBitsToFloat(v.toInt)) =>
                return (None, None)
              case DoubleType if java.lang.Double.isNaN(java.lang.Double.longBitsToDouble(v)) =>
                return (None, None)
              case _ =>
            }
            if (!seen) { mn = v; mx = v; seen = true }
            else {
              if (lessThan(v, mn, dt)) mn = v
              if (lessThan(mx, v, dt)) mx = v
            }
          }
          i += 1
        }
        (Some(longToBytes(mn)), Some(longToBytes(mx)))
      case _ => (None, None)
    }
  }
}
