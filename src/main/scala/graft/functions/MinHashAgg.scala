package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator (SURVEY.md §2.10 custom-aggregate tier): merges
  * per-token md5 hashes into a k-function MinHash signature. The
  * buffer is k 16-byte minima — associative + commutative, so Spark
  * runs it as partial+final aggregation (map-side combine) on any
  * partitioning; `finish` renders the hex signature joined by '|',
  * byte-order min ≡ hex-string min, so the result matches the SQL
  * min(md5(i || ':' || token)) formulation on both engines.
  */
class MinHashAgg(k: Int = 16) extends Aggregator[String, Array[Array[Byte]], String] {

  override def zero: Array[Array[Byte]] = new Array[Array[Byte]](k)

  override def reduce(buf: Array[Array[Byte]], token: String): Array[Array[Byte]] = {
    var i = 0
    while (i < k) {
      val h = Hashing.md5bytes(s"$i:$token")
      if (buf(i) == null || Hashing.byteLess(h, buf(i))) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Array[Byte]], b: Array[Array[Byte]]): Array[Array[Byte]] = {
    var i = 0
    while (i < k) {
      if (a(i) == null || (b(i) != null && Hashing.byteLess(b(i), a(i)))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Array[Byte]]): String =
    buf.map(h => if (h == null) "" else Hashing.toHex(h)).mkString("|")

  override def bufferEncoder: Encoder[Array[Array[Byte]]] =
    Encoders.javaSerialization[Array[Array[Byte]]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
