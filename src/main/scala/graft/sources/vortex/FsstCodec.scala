package graft.sources.vortex

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** FSST-role per-chunk string compression (SURVEY.md §2.9 — the
  * reference inherits this via the vortex-fsst crate,
  * /root/reference Cargo.lock:4331-4344). Clean-room re-design after
  * the published FSST idea (sampled static symbol table of frequent
  * substrings, one code byte per symbol, escape for literals):
  *
  *  - TRAIN: sample ≤64 KB of chunk bytes, count substrings of length
  *    2..8, keep the ≤254 highest-gain ((len-1)·count) symbols.
  *  - ENCODE: greedy longest-match per position via a 2-byte-prefix
  *    index; unmatched bytes emit [0xFF, literal].
  *  - DECODE: symbol-table lookup, one append per code — no searching.
  *
  * Page layout: [nSyms i32][symbols packVar][code-streams packVar].
  * Selection happens in PageCodec: FSST is kept only when its
  * post-zstd size beats plain's post-zstd size, so the tier can never
  * regress a chunk (btrblocks-style best-of-candidates).
  */
object FsstCodec {
  private val Escape = 0xFF
  private val MaxSyms = 254
  private val MaxSymLen = 8
  private val SampleBytes = 64 * 1024
  private val SymLens = Array(2, 3, 4, 6, 8)

  /** train a symbol table over a byte-budget sample of the values */
  def train(vals: Array[Array[Byte]], n: Int): Array[Array[Byte]] = {
    val counts = new mutable.HashMap[ByteBuffer, Long]()
    var sampled = 0
    // stride so large chunks still sample across the whole value range
    val stride = math.max(1, {
      var total = 0L
      var i = 0
      while (i < n) { if (vals(i) != null) total += vals(i).length; i += 1 }
      (total / math.max(SampleBytes, 1)).toInt
    })
    var i = 0
    while (i < n && sampled < SampleBytes) {
      val v = vals(i)
      if (v != null && v.length >= 2) {
        var p = 0
        while (p < v.length - 1) {
          var li = 0
          while (li < SymLens.length) {
            val L = SymLens(li)
            if (p + L <= v.length) {
              val key = ByteBuffer.wrap(v, p, L).slice()
              counts.updateWith(key) { c => Some(c.getOrElse(0L) + 1L) }
            }
            li += 1
          }
          p += 1
        }
        sampled += v.length
      }
      i += stride
    }
    counts.toArray
      .map { case (k, c) => (k, (k.remaining() - 1).toLong * c) }
      .filter(_._2 > 2) // a symbol must amortize its table entry
      .sortBy(-_._2)
      .take(MaxSyms)
      .map { case (k, _) =>
        val a = new Array[Byte](k.remaining())
        k.duplicate().get(a)
        a
      }
  }

  /** 2-byte prefix → symbol ids (longest first) for greedy matching */
  private def prefixIndex(syms: Array[Array[Byte]]): mutable.HashMap[Int, Array[Int]] = {
    val m = new mutable.HashMap[Int, mutable.ArrayBuffer[Int]]()
    syms.indices.foreach { id =>
      val s = syms(id)
      val key = ((s(0) & 0xFF) << 8) | (s(1) & 0xFF)
      m.getOrElseUpdate(key, new mutable.ArrayBuffer[Int]()) += id
    }
    m.map { case (k, ids) => k -> ids.toArray.sortBy(id => -syms(id).length) }
  }

  private def matches(v: Array[Byte], pos: Int, s: Array[Byte]): Boolean = {
    if (pos + s.length > v.length) return false
    var i = 2 // prefix already matched via the index key
    while (i < s.length) {
      if (v(pos + i) != s(i)) return false
      i += 1
    }
    true
  }

  /** encode all values; returns the full page payload */
  def encode(vals: Array[Array[Byte]], n: Int, syms: Array[Array[Byte]]): Array[Byte] = {
    val idx = prefixIndex(syms)
    val out = new Array[Array[Byte]](n)
    val buf = new java.io.ByteArrayOutputStream(256)
    var i = 0
    while (i < n) {
      val v = if (vals(i) == null) Array.emptyByteArray else vals(i)
      buf.reset()
      var p = 0
      while (p < v.length) {
        var emitted = false
        if (p + 1 < v.length) {
          val key = ((v(p) & 0xFF) << 8) | (v(p + 1) & 0xFF)
          idx.get(key) match {
            case Some(cands) =>
              var c = 0
              while (c < cands.length && !emitted) {
                val id = cands(c)
                if (matches(v, p, syms(id))) {
                  buf.write(id)
                  p += syms(id).length
                  emitted = true
                }
                c += 1
              }
            case None =>
          }
        }
        if (!emitted) {
          buf.write(Escape)
          buf.write(v(p) & 0xFF)
          p += 1
        }
      }
      out(i) = buf.toByteArray
      i += 1
    }
    val symBytes = PageCodec.packVar(syms, syms.length)
    val codeBytes = PageCodec.packVar(out, n)
    val bb = ByteBuffer.allocate(4 + symBytes.length + codeBytes.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(syms.length)
    bb.put(symBytes)
    bb.put(codeBytes)
    bb.array()
  }

  def decode(bb: ByteBuffer, n: Int): Array[Array[Byte]] = {
    val nSyms = bb.getInt()
    val syms = PageCodec.unpackVar(bb, nSyms)
    val codes = PageCodec.unpackVar(bb, n)
    val out = new Array[Array[Byte]](n)
    val buf = new java.io.ByteArrayOutputStream(256)
    var i = 0
    while (i < n) {
      val cs = codes(i)
      buf.reset()
      var p = 0
      while (p < cs.length) {
        val c = cs(p) & 0xFF
        if (c == Escape) { buf.write(cs(p + 1) & 0xFF); p += 2 }
        else { buf.write(syms(c), 0, syms(c).length); p += 1 }
      }
      out(i) = buf.toByteArray
      i += 1
    }
    out
  }
}
