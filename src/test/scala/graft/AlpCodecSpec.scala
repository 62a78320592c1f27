package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{DoubleType, FloatType}
import graft.sources.vortex.{AlpCodec, ColVec, PageCodec, VortexFormat}

/** ALP-role float tier: decimal-origin floats encode as bitpacked
  * scaled integers with bit-exact decode; true-real-valued data
  * self-disables to the plain path after the exponent sample. */
class AlpCodecSpec extends AnyFunSuite {

  private def encDec(vals: Array[Double]): (Byte, Array[Double], Int) = {
    val longs = vals.map(java.lang.Double.doubleToLongBits)
    val vec = new ColVec(vals.length, new Array[Boolean](vals.length), longs.clone(), null)
    val e = PageCodec.encode(vec, DoubleType)
    val back = PageCodec.decode(e.bytes, e.encoding, e.compressed, vals.length, e.nullCount, DoubleType)
    (e.encoding, back.longs.map(java.lang.Double.longBitsToDouble), e.bytes.length)
  }

  test("price-like doubles (2 decimals) pick ALP and round-trip bit-exactly") {
    val rnd = new scala.util.Random(7)
    val vals = Array.fill(4096)(math.floor(rnd.nextDouble() * 1e7) / 100.0)
    val (enc, back, size) = encDec(vals)
    assert(enc == VortexFormat.EncAlp)
    assert(back.map(java.lang.Double.doubleToRawLongBits)
      .sameElements(vals.map(java.lang.Double.doubleToRawLongBits)))
    // 0..1e5 with 2 decimals = 10^7 states ≈ 24 bits, vs 64 plain:
    // even pre-zstd the chunk must be under half of plain
    assert(size < vals.length * 8 / 2, s"ALP chunk $size bytes not < ${vals.length * 4}")
  }

  test("NaN / Infinity / -0.0 survive as exceptions") {
    val rnd = new scala.util.Random(11)
    val vals = Array.fill(2048)(math.floor(rnd.nextDouble() * 1e6) / 10.0)
    vals(17) = Double.NaN; vals(300) = Double.PositiveInfinity
    vals(301) = Double.NegativeInfinity; vals(1000) = -0.0
    val (enc, back, _) = encDec(vals)
    assert(enc == VortexFormat.EncAlp)
    assert(back.map(java.lang.Double.doubleToRawLongBits)
      .sameElements(vals.map(java.lang.Double.doubleToRawLongBits)))
    assert(back(17).isNaN)
    assert(java.lang.Double.doubleToRawLongBits(back(1000)) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
  }

  test("full-precision random doubles fall back to plain") {
    val rnd = new scala.util.Random(13)
    val vals = Array.fill(1024)(rnd.nextGaussian())
    val (enc, back, _) = encDec(vals)
    assert(enc != VortexFormat.EncAlp)
    assert(back.sameElements(vals))
  }

  test("floats with one decimal pick ALP and round-trip") {
    val rnd = new scala.util.Random(17)
    val vals = Array.fill(2048)((rnd.nextInt(100000) / 10.0f))
    val longs = vals.map(v => java.lang.Float.floatToIntBits(v).toLong)
    val vec = new ColVec(vals.length, new Array[Boolean](vals.length), longs.clone(), null)
    val e = PageCodec.encode(vec, FloatType)
    assert(e.encoding == VortexFormat.EncAlp)
    val back = PageCodec.decode(e.bytes, e.encoding, e.compressed, vals.length, e.nullCount, FloatType)
    assert(back.longs.map(l => java.lang.Float.intBitsToFloat(l.toInt))
      .sameElements(vals))
  }

  test("raw AlpCodec: exception rate above 5% bails") {
    val rnd = new scala.util.Random(19)
    // stride-sampled values are clean decimals, but 10% of the full
    // chunk is full-precision noise placed off-stride → full pass bails
    val n = 4096
    val vals = Array.tabulate(n)(i => math.floor((i * 37 % 1000) * 100.0) / 100.0)
    var placed = 0
    var i = 1
    while (placed < n / 10 && i < n) {
      if (i % (n / 128) != 0) { vals(i) = rnd.nextGaussian(); placed += 1 }
      i += 3
    }
    assert(AlpCodec.tryEncode(vals.map(java.lang.Double.doubleToLongBits), n, isFloat = false).isEmpty)
  }
}
