package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `percentile_buf(v, array(p...))`: exact interpolated percentiles
  * (quantile_cont semantics) over a primitive growable buffer — the
  * size-GATED small-input path of
  * [[graft.operators.ExactPercentile]].
  *
  * Spark's built-in `percentile` keeps an OpenHashMap[AnyRef, Long]
  * per group and boxes every update; a `udaf(Aggregator)` pays an
  * encoder round trip per row. This native TypedImperativeAggregate
  * reads the input double directly and appends into a primitive
  * array: slot 0 holds the used count n, values live in slots [1, n];
  * growth doubles the array (amortized O(1) per row — the object
  * aggregation map keeps the same buffer reference between rows).
  * eval() sorts once and interpolates v_lo + (v_hi − v_lo)·(h − ⌊h⌋),
  * h = (n−1)·p — the same expression as the histogram path and
  * DuckDB's quantile_cont. `+ 0.0` on append normalizes -0.0 so both
  * dispatch paths are value-identical.
  *
  * Per-group state is the group's full value list, which is exactly
  * why this aggregate is NEVER the default at scale: callers reach it
  * only through ExactPercentile.computeMultiAuto's row-count gate.
  * Null inputs are ignored (SQL aggregate semantics); a group with no
  * non-null values yields null (dropped by the caller's inner
  * semantics).
  */
case class PercentileBuf(child: Expression, ps: Array[Double],
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def prettyName: String = "percentile_buf"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"percentile_buf requires a double input, got $other")
    }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](17)

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return b
    val n = b(0).toInt
    val out = if (n + 1 >= b.length) java.util.Arrays.copyOf(b, b.length * 2) else b
    out(n + 1) = v.asInstanceOf[Double] + 0.0
    out(0) = n + 1.0
    out
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val na = a(0).toInt; val nb = b(0).toInt
    val out = new Array[Double](na + nb + 1)
    out(0) = na + nb
    System.arraycopy(a, 1, out, 1, na)
    System.arraycopy(b, 1, out, 1 + na, nb)
    out
  }

  override def eval(b: Array[Double]): Any = {
    val n = b(0).toInt
    if (n == 0) return null
    val vals = java.util.Arrays.copyOfRange(b, 1, n + 1)
    java.util.Arrays.sort(vals)
    new GenericArrayData(ps.map { p =>
      val h = (n - 1) * p
      val lo = vals(math.floor(h).toInt); val hi = vals(math.ceil(h).toInt)
      lo + (hi - lo) * (h - math.floor(h))
    })
  }

  override def serialize(b: Array[Double]): Array[Byte] = {
    val n = b(0).toInt
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(n)
    var i = 1
    while (i <= n) { bb.putDouble(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt()
    val out = new Array[Double](n + 1)
    out(0) = n.toDouble
    var i = 1
    while (i <= n) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): PercentileBuf =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PercentileBuf =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): PercentileBuf = copy(child = c)
}

object PercentileBuf {
  /** register `percentile_buf(v, array(p...))` for expr()/SQL use;
    * the percentile list must be a foldable array literal. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "percentile_buf", exprs => {
        require(exprs.length == 2 && exprs(1).foldable,
          "percentile_buf(v, array(p...)) needs a literal percentile array")
        val arr = exprs(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        PercentileBuf(exprs(0), arr.toDoubleArray())
      }, "built-in")
}
