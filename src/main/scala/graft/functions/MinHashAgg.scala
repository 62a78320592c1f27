package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator (SURVEY.md §2.10 custom-aggregate tier): merges
  * per-token md5 hashes into a k-function MinHash signature. The
  * buffer is one flat k×16-byte array (BINARY-encoded — no per-merge
  * Java serialization) holding the current minima; 0xFF-fill is the
  * min-identity, so no null tracking is needed. Associative +
  * commutative ⇒ Spark runs it as partial+final aggregation (map-side
  * combine) on any partitioning. `finish` renders the hex signature
  * joined by '|'; byte-order min ≡ hex-string min, so the result
  * matches the SQL min(md5(i || ':' || token)) formulation on both
  * engines.
  */
class MinHashAgg(k: Int = 16) extends Aggregator[String, Array[Byte], String] {

  /** empty = "no input yet" (kept tiny so unmatched groups ship 0 bytes) */
  override def zero: Array[Byte] = Array.emptyByteArray

  private def fresh: Array[Byte] = {
    val b = new Array[Byte](k * 16)
    java.util.Arrays.fill(b, 0xFF.toByte) // ≥ every md5 ⇒ min-identity
    b
  }

  override def reduce(buf0: Array[Byte], token: String): Array[Byte] = {
    val buf = if (buf0.isEmpty) fresh else buf0
    Hashing.minhashUpdate(buf, k, token)
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      var i = 0
      while (i < k) {
        if (Hashing.less(b, i * 16, a, i * 16)) System.arraycopy(b, i * 16, a, i * 16, 16)
        i += 1
      }
      a
    }

  override def finish(buf: Array[Byte]): String =
    if (buf.isEmpty) Array.fill(k)("").mkString("|")
    else (0 until k).map(i => Hashing.toHexAt(buf, i * 16)).mkString("|")

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
