package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Exact fixed-point vector arithmetic for similarity search.
  *
  * Embedding floats are quantized to DECIMAL(18,8) (HALF_UP — identical
  * to Spark's `CAST(float AS DECIMAL(18,8))` and DuckDB's cast), so a
  * 64-dim dot product is an exact scale-16 unscaled value that fits a
  * Long (|x| < 0.6 ⇒ |unscaled product| ≤ 3.6e15, ×64 ≤ 2.4e17 < 2^63).
  * Exact integer sums are order-independent — the property that makes
  * results reproducible across any cluster partitioning — and the tight
  * Long loops are ~100× faster than interpreted decimal lambdas.
  */
object VecFixedPoint {
  val Scale = 8
  /** dot products carry scale 2*Scale = 16 */
  val DotScale: Int = 2 * Scale

  def quantize(e: Seq[Float]): Array[Long] = {
    val out = new Array[Long](e.length)
    var i = 0
    e.foreach { x =>
      out(i) = quantizeOne(x)
      i += 1
    }
    out
  }

  /** One element, BIT-IDENTICAL to
    * `BigDecimal.valueOf(x.toDouble).setScale(8, HALF_UP)` but ~30×
    * faster on the common path (r13; quantize dominated the whole
    * vector family's rows — 6.4M BigDecimal allocations per 100k×64
    * scan). Proof of equality: HALF_UP's only decision boundary is the
    * exact .5 fraction of r·10^8, where r is the SHORTEST-repr decimal
    * `BigDecimal.valueOf` rounds (not d's exact binary expansion —
    * |r−d| ≤ ulp(d)/2, ≤ 8.9e-8 after ×10^8 for |d| < 10). For
    * |d|·10^8 < 1e9 the double product adds ≤ 1.1e-7 absolute error,
    * so the computed fraction is within 2e-7 of the true one: whenever
    * it is farther than 1e-6 from .5 the double decision provably
    * equals the decimal one; inside that band (and for large
    * magnitudes) we fall back to the BigDecimal form.
    * Negative values mirror through |d| because HALF_UP rounds away
    * from zero on ties. Equivalence property-tested in VecDotSpec. */
  def quantizeOne(x: Float): Long = {
    val d = x.toDouble
    val ad = math.abs(d)
    val scaled = ad * 1e8
    if (scaled < 1e9) {
      val fl = math.floor(scaled)
      val frac = scaled - fl
      if (math.abs(frac - 0.5) > 1e-6) {
        val u = (if (frac > 0.5) fl + 1.0 else fl).toLong
        if (d < 0) -u else u
      } else quantizeSlow(x)
    } else quantizeSlow(x)
  }

  private def quantizeSlow(x: Float): Long =
    JBigDecimal.valueOf(x.toDouble).setScale(Scale, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** exact dot product; result is the unscaled value at scale 16 */
  def dot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L
    var i = 0
    val n = a.length
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** decimal(38,16) → double, matching Spark's Decimal.toDouble and
    * (empirically) DuckDB's decimal→double cast */
  def decToDouble(unscaled: Long): Double =
    new JBigDecimal(java.math.BigInteger.valueOf(unscaled), DotScale).doubleValue()

  /** decimal(18,8) element → double — the same proven-equal
    * decimal→double path as [[decToDouble]], at the element scale.
    * Used by the int8 code quantizer (v_cos_quantized). */
  def dec8ToDouble(unscaled: Long): Double =
    new JBigDecimal(java.math.BigInteger.valueOf(unscaled), Scale).doubleValue()

  /** cosine as the exact-decimal-to-double expression both engines use:
    * CAST(dot AS DOUBLE) / (sqrt(CAST(saa AS DOUBLE)) * sqrt(CAST(sbb AS DOUBLE))) */
  def cos(dotU: Long, saaU: Long, sbbU: Long): Double =
    decToDouble(dotU) / (math.sqrt(decToDouble(saaU)) * math.sqrt(decToDouble(sbbU)))

  /** round(cos, 4) as java BigDecimal — the output/threshold form */
  def cos4(dotU: Long, saaU: Long, sbbU: Long): JBigDecimal =
    JBigDecimal.valueOf(cos(dotU, saaU, sbbU)).setScale(4, RoundingMode.HALF_UP)

  /** exact squared euclidean distance in the quantized domain */
  def sqDist(q: Array[Long], c: Array[Long]): Long = {
    var sum = 0L; var j = 0
    while (j < q.length) { val dd = q(j) - c(j); sum += dd * dd; j += 1 }
    sum
  }

  /** index of the nearest centroid (exact long squared distance,
    * lowest index wins ties — the k-means oracle's ORDER BY dist, k
    * rule). Lives HERE, not on the query object, so executor closures
    * calling it reference a static module instead of capturing the
    * (non-serializable) query-set object. */
  def nearestCentroid(q: Array[Long], cs: Array[Array[Long]]): Int = {
    var best = 0; var bd = sqDist(q, cs(0)); var k = 1
    while (k < cs.length) {
      val dd = sqDist(q, cs(k)); if (dd < bd) { bd = dd; best = k }; k += 1
    }
    best
  }
}
