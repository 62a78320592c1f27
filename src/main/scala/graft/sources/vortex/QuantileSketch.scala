package graft.sources.vortex

/** Per-file distribution sketch — the role of the reference layout
  * tier's ddsketch quantile stats (`vortex-layout` →
  * `sketches-ddsketch`, /root/reference/vortex-extension/
  * Cargo.lock:4436), re-derived for exactness.
  *
  * A DDSketch (Masson et al., VLDB 2019) is a histogram over
  * log-spaced buckets with exact counts; its quantile answers are
  * value-relative-error-bounded because bucket width is relative.
  * This implementation keeps the exact-count log-bucketed shape but
  * replaces the `ceil(log_γ v)` bucket index — whose transcendental
  * float math can misplace values within an ulp of a boundary — with
  * the IEEE-754 BIT PREFIX of the value: for positive doubles the raw
  * bit pattern is monotone in the value, so
  * `doubleToLongBits(v) >>> (52 - prefixBits)` is an exactly-monotone
  * bucket index whose bounds are exact doubles (prefix with dropped
  * bits all-0 / all-1). Consequences:
  *   - bucket ranges are disjoint and value-ordered BY CONSTRUCTION
  *     (no boundary-rounding edge cases to reason about);
  *   - counts are exact, so for any rank r the sketch returns a
  *     value range [lo, hi] GUARANTEED to contain the r-th smallest
  *     value, plus the exact count of values below that range;
  *   - relative bucket width is 2^-prefixBits (default 7 → ≤0.79%).
  *
  * That guarantee is what turns an exact-percentile query's first
  * full data pass into metadata: merged file sketches → rank range →
  * one min/max-prunable scan of only the in-range values
  * (SketchPercentile). Negative values mirror to negative keys
  * (value-order preserved), zeros count separately, NaNs are counted
  * but poison rank queries (orderings differ across engines).
  *
  * Mergeable (bucket-wise count addition) and serializable — the
  * manifest carries one per opted-in column per file.
  */
final class QuantileSketch(val prefixBits: Int) {
  // 52 = full mantissa (drop 0): every bucket is a single double value
  require(prefixBits >= 0 && prefixBits <= 52, s"prefixBits $prefixBits out of range")
  private val drop = 52 - prefixBits
  private[vortex] val counts = new java.util.HashMap[java.lang.Long, java.lang.Long]()
  var zeroCount: Long = 0L
  var nanCount: Long = 0L

  private def keyOf(v: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(math.abs(v)) >>> drop
    if (v > 0) bits else -bits - 1
  }

  def add(v: Double): Unit = add(v, 1L)
  def add(v: Double, n: Long): Unit = {
    if (java.lang.Double.isNaN(v)) nanCount += n
    else if (v == 0.0) zeroCount += n
    else counts.merge(keyOf(v), n, (a, b) => a + b)
  }

  def totalCount: Long = {
    var t = zeroCount
    val it = counts.values().iterator()
    while (it.hasNext) t += it.next()
    t
  }

  def merge(o: QuantileSketch): this.type = {
    require(o.prefixBits == prefixBits,
      s"cannot merge sketches with prefixBits $prefixBits vs ${o.prefixBits}")
    zeroCount += o.zeroCount
    nanCount += o.nanCount
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    this
  }

  /** exact double range of bucket `key` (positive or mirrored negative) */
  private def boundsOf(key: Long): (Double, Double) =
    if (key >= 0) {
      val lo = java.lang.Double.longBitsToDouble(key << drop)
      val hi = java.lang.Double.longBitsToDouble((key << drop) | ((1L << drop) - 1))
      (lo, hi)
    } else {
      val pos = -key - 1
      val hi = -java.lang.Double.longBitsToDouble(pos << drop)
      val lo = -java.lang.Double.longBitsToDouble((pos << drop) | ((1L << drop) - 1))
      (lo, hi)
    }

  /** For 1-based rank r (ascending, over non-NaN values): a range
    * [lo, hi] guaranteed to contain the r-th smallest value, and the
    * EXACT count of values strictly below every value in that range.
    * Throws if NaNs were sketched (rank order engine-dependent) or r
    * is out of range. */
  def rankBounds(r: Long): RankBounds = {
    require(nanCount == 0, s"sketch holds $nanCount NaNs — rank queries unsupported")
    val n = totalCount
    require(r >= 1 && r <= n, s"rank $r out of [1, $n]")
    val keys = new java.util.ArrayList[java.lang.Long](counts.keySet())
    java.util.Collections.sort(keys)
    var below = 0L
    var i = 0
    // negative-key buckets, then the zero bucket, then positive keys —
    // value order by construction
    while (i < keys.size() && keys.get(i) < 0) {
      val c = counts.get(keys.get(i))
      if (below + c >= r) { val (lo, hi) = boundsOf(keys.get(i)); return RankBounds(lo, hi, below, c) }
      below += c; i += 1
    }
    if (below + zeroCount >= r) return RankBounds(0.0, 0.0, below, zeroCount)
    below += zeroCount
    while (i < keys.size()) {
      val c = counts.get(keys.get(i))
      if (below + c >= r) { val (lo, hi) = boundsOf(keys.get(i)); return RankBounds(lo, hi, below, c) }
      below += c; i += 1
    }
    throw new IllegalStateException("unreachable: rank within total")
  }

  def toBytes: Array[Byte] = {
    val keys = new java.util.ArrayList[java.lang.Long](counts.keySet())
    java.util.Collections.sort(keys)
    val bb = java.nio.ByteBuffer.allocate(1 + 1 + 8 + 8 + 4 + 16 * keys.size())
    bb.put(1.toByte).put(prefixBits.toByte)
    bb.putLong(zeroCount).putLong(nanCount)
    bb.putInt(keys.size())
    var i = 0
    while (i < keys.size()) {
      bb.putLong(keys.get(i)); bb.putLong(counts.get(keys.get(i))); i += 1
    }
    bb.array()
  }
}

/** `[lo, hi]` contains the requested rank's value; `below` = exact
  * count of values before the range; `inRange` = exact count inside. */
final case class RankBounds(lo: Double, hi: Double, below: Long, inRange: Long)

object QuantileSketch {
  /** relative bucket width 2^-7 ≈ 0.79% — a few hundred buckets per
    * value octave range, ~16 B each, serialized per file per column */
  val DefaultPrefixBits = 7

  def apply(prefixBits: Int = DefaultPrefixBits) = new QuantileSketch(prefixBits)

  def fromBytes(a: Array[Byte]): Option[QuantileSketch] =
    try {
      val bb = java.nio.ByteBuffer.wrap(a)
      val ver = bb.get()
      if (ver != 1) return None
      val s = new QuantileSketch(bb.get().toInt)
      s.zeroCount = bb.getLong(); s.nanCount = bb.getLong()
      val n = bb.getInt()
      var i = 0
      while (i < n) { s.counts.put(bb.getLong(), bb.getLong()); i += 1 }
      Some(s)
    } catch { case _: Exception => None }

  /** sketch support: types whose storage long has an exact monotone
    * double view shared with the Spark-side `CAST(col AS DOUBLE)`
    * probe filter (SketchPercentile). Decimals and timestamps are
    * deliberately out of v1 scope. */
  def supports(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType => true
    case _ => false
  }
}
