package graft.sources.vortex

import java.nio.{ByteBuffer, ByteOrder}

/** ALP-role float/double encoding (the reference's `vortex-alp` crate
  * role, Cargo.lock:3998-4014; scheme after Afroozeh & Boncz, "ALP:
  * Adaptive Lossless floating-Point compression", SIGMOD 2024 —
  * simplified to a single decimal exponent per chunk + an exception
  * list instead of per-vector (e,f) pairs).
  *
  * Decimal-origin doubles (prices, rates, measurements) are really
  * scaled integers: v = k / 10^e. Encoding stores k = round(v·10^e)
  * FoR-bitpacked (typically 20-40 bits instead of 64) plus the raw
  * IEEE bits of the few values that don't round-trip. A chunk is
  * eligible only when a sampled exponent makes ≥95% of values decode
  * BIT-EXACTLY via the same expression the reader uses — so the tier
  * is lossless by construction and self-disables on true-real-valued
  * data (e.g. embeddings) after a cheap sample.
  *
  * Payload: [e:1][nExc:4][excPos:4·nExc][excRaw:w·nExc][packBits(k)]
  */
object AlpCodec {
  private val MaxExcRate = 0.05
  private val P10d: Array[Double] = (0 to 13).map(e => math.pow(10, e)).toArray
  private val P10f: Array[Float] = (0 to 7).map(e => math.pow(10, e).toFloat).toArray

  /** vals = IEEE bits (doubleToRawLongBits / floatToRawIntBits in the
    * low 32). Returns the encoded payload iff ALP round-trips and is
    * smaller than plain. */
  def tryEncode(vals: Array[Long], n: Int, isFloat: Boolean): Option[Array[Byte]] = {
    if (n < 64) return None
    val maxE = if (isFloat) P10f.length - 1 else P10d.length - 1
    // cheap exponent probe on a stride sample: smallest e that decodes
    // every sampled value bit-exactly
    val stride = math.max(1, n / 128)
    var e = -1
    var cand = 0
    while (cand <= maxE && e < 0) {
      var i = 0
      var ok = true
      while (i < n && ok) {
        if (!roundTrips(vals(i), cand, isFloat)) ok = false
        i += stride
      }
      if (ok) e = cand
      cand += 1
    }
    if (e < 0) return None

    val scaled = new Array[Long](n)
    val excPos = new scala.collection.mutable.ArrayBuffer[Int]()
    val excRaw = new scala.collection.mutable.ArrayBuffer[Long]()
    val maxExc = (n * MaxExcRate).toInt + 1
    var prevOk = 0L // exception slots carry the last good k: keeps the FoR range tight
    var i = 0
    while (i < n) {
      val k = scaleOf(vals(i), e, isFloat)
      val ok = k != Long.MinValue && (
        if (isFloat) java.lang.Float.floatToRawIntBits(k.toFloat / P10f(e)) == vals(i).toInt
        else java.lang.Double.doubleToRawLongBits(k.toDouble / P10d(e)) == vals(i))
      if (ok) {
        scaled(i) = k; prevOk = k
      } else {
        if (excPos.length >= maxExc) return None
        excPos += i; excRaw += vals(i)
        scaled(i) = prevOk
      }
      i += 1
    }

    var mn = scaled(0); var mx = mn
    i = 1
    while (i < n) {
      val v = scaled(i)
      if (v < mn) mn = v; if (v > mx) mx = v
      i += 1
    }
    val range = mx - mn
    if (range < 0) return None // overflow spread
    val bits = if (range == 0) 1 else 64 - java.lang.Long.numberOfLeadingZeros(range)
    val w = if (isFloat) 4 else 8
    val nExc = excPos.length
    val size = 5L + nExc.toLong * (4 + w) + 17L + (n.toLong * bits + 7) / 8
    if (size >= n.toLong * w) return None

    val packed = PageCodec.packBits(scaled, n, mn, bits)
    val bb = ByteBuffer.allocate(5 + nExc * (4 + w) + packed.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(e.toByte)
    bb.putInt(nExc)
    excPos.foreach(bb.putInt)
    if (isFloat) excRaw.foreach(r => bb.putInt(r.toInt)) else excRaw.foreach(bb.putLong)
    bb.put(packed)
    Some(bb.array())
  }

  def decode(bb: ByteBuffer, n: Int, isFloat: Boolean): Array[Long] = {
    val e = bb.get().toInt
    val nExc = bb.getInt()
    val excPos = new Array[Int](nExc)
    var i = 0
    while (i < nExc) { excPos(i) = bb.getInt(); i += 1 }
    val excRaw = new Array[Long](nExc)
    i = 0
    while (i < nExc) {
      excRaw(i) = if (isFloat) bb.getInt().toLong & 0xFFFFFFFFL else bb.getLong()
      i += 1
    }
    val scaled = PageCodec.unpackBits(bb, n)
    val out = new Array[Long](n)
    i = 0
    if (isFloat) {
      val p = P10f(e)
      while (i < n) {
        out(i) = java.lang.Float.floatToRawIntBits(scaled(i).toFloat / p).toLong & 0xFFFFFFFFL
        i += 1
      }
    } else {
      val p = P10d(e)
      while (i < n) {
        out(i) = java.lang.Double.doubleToRawLongBits(scaled(i).toDouble / p)
        i += 1
      }
    }
    i = 0
    while (i < nExc) { out(excPos(i)) = excRaw(i); i += 1 }
    out
  }

  /** k = round(v·10^e), or Long.MinValue when not representable. */
  private def scaleOf(bits: Long, e: Int, isFloat: Boolean): Long =
    if (isFloat) {
      val v = java.lang.Float.intBitsToFloat(bits.toInt)
      val x = v * P10f(e)
      if (java.lang.Float.isFinite(x) && math.abs(x) < 1e18f) Math.round(x.toDouble) else Long.MinValue
    } else {
      val v = java.lang.Double.longBitsToDouble(bits)
      val x = v * P10d(e)
      if (java.lang.Double.isFinite(x) && math.abs(x) < 4.6e18) Math.round(x) else Long.MinValue
    }

  /** Bit-exact round trip under the READER's decode expression. */
  private def roundTrips(bits: Long, e: Int, isFloat: Boolean): Boolean = {
    val k = scaleOf(bits, e, isFloat)
    if (k == Long.MinValue) false
    else if (isFloat)
      java.lang.Float.floatToRawIntBits(k.toFloat / P10f(e)) == bits.toInt
    else
      java.lang.Double.doubleToRawLongBits(k.toDouble / P10d(e)) == bits
  }
}
