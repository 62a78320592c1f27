package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-cluster centroid accumulator for Lloyd's k-means (SURVEY.md
  * §2.11 IVF build path): 64 exact long component sums plus a count,
  * folded map-side (partial aggregation with merge) so no cluster's
  * vectors ever funnel through a single task — with K=8 at 100 TB the
  * old groupByKey().mapGroups shape streamed ~1/K of the corpus
  * through one task per refinement round. Long adds are associative
  * and commutative, so the result is bit-identical under any
  * partitioning — the fixed-point contract kmeansAssign's DuckDB
  * oracle depends on. Buffer layout: 64 component sums followed by
  * the count (length 65).
  */
class CentroidSumAgg extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](65)

  override def reduce(buf: Array[Long], q: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { buf(j) += q(j); j += 1 }
    buf(64) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 65) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
