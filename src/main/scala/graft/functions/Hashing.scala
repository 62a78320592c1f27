package graft.functions

/** Shared md5 helpers for kernels that must agree with SQL `md5()`
  * output on both engines (hex-string order == unsigned byte order).
  */
object Hashing {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexDigits = "0123456789abcdef".toCharArray

  def md5bytes(s: String): Array[Byte] = {
    val md = md5Local.get(); md.reset()
    md.digest(s.getBytes("UTF-8"))
  }

  /** md5 of prefix ++ body without building the concatenated string —
    * the MinHash kernels hash every token under k seed prefixes, so
    * skipping k string allocations + UTF-8 encodings per token is a
    * measurable constant factor on 10⁷-token corpora. */
  def md5bytes(prefix: Array[Byte], body: Array[Byte]): Array[Byte] = {
    val md = md5Local.get(); md.reset()
    md.update(prefix); md.update(body)
    md.digest()
  }

  /** cached UTF-8 bytes of the MinHash seed prefixes "0:", "1:", … */
  private val seedPrefixes = Array.tabulate(64)(i => s"$i:".getBytes("UTF-8"))
  def seedPrefix(i: Int): Array[Byte] =
    if (i < seedPrefixes.length) seedPrefixes(i) else s"$i:".getBytes("UTF-8")

  private val md5Scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** Update a k×16-byte MinHash minima buffer with one token:
    * mh(i) = min(mh(i), md5("i:" ++ token)) for each seed i.
    * Digests land in a thread-local scratch buffer — k digests per
    * token over 10⁷-token corpora make the per-digest allocation a
    * measurable constant factor. */
  def minhashUpdate(mh: Array[Byte], k: Int, token: String): Unit = {
    val tb = token.getBytes("UTF-8")
    val md = md5Local.get()
    val h = md5Scratch.get()
    var i = 0
    while (i < k) {
      md.reset(); md.update(seedPrefix(i)); md.update(tb)
      md.digest(h, 0, 16)
      if (less(h, 0, mh, i * 16)) System.arraycopy(h, 0, mh, i * 16, 16)
      i += 1
    }
  }

  /** unsigned lexicographic byte order (== hex-string order) */
  def byteLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** unsigned 16-byte compare at offsets: a[ao..ao+16) < b[bo..bo+16) */
  def less(a: Array[Byte], ao: Int, b: Array[Byte], bo: Int): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(ao + i) & 0xff; val y = b(bo + i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** hex of the 16 bytes at offset `off` */
  def toHexAt(d: Array[Byte], off: Int): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(off + i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(off + i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** hex of `len` bytes at offset `off` */
  def toHexRange(d: Array[Byte], off: Int, len: Int): String = {
    val out = new Array[Char](2 * len)
    var i = 0
    while (i < len) {
      out(2 * i) = hexDigits((d(off + i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(off + i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf); out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def md5hex(s: String): String = toHex(md5bytes(s))
}
