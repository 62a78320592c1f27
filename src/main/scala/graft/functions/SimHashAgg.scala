package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed SimHash aggregator (SURVEY.md §2.11): per token, bit b of
  * md5(token) votes +1/-1 on counter b; the 64-bit signature is the
  * sign vector. One pass over tokens with map-side partial merge —
  * replaces an explode(×64) + 38M-row shuffle formulation with 64
  * integer adds per token straight off the digest bytes. Bit order
  * matches the SQL formulation (hex digit b/4, bit 3-b%4 within the
  * nibble ⇔ bit 7-b%8 of byte b/8), so the DuckDB oracle is unchanged.
  */
class SimHashAgg extends Aggregator[String, Array[Int], String] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], token: String): Array[Int] = {
    val h = Hashing.md5bytes(token)
    var b = 0
    while (b < 64) {
      buf(b) += (((h(b >> 3) >> (7 - (b & 7))) & 1) * 2 - 1)
      b += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): String = {
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < 64) { sb.append(if (buf(i) > 0) '1' else '0'); i += 1 }
    sb.toString
  }

  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
