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
