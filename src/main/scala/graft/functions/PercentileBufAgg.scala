package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Aggregation state for [[PercentileBuf]]: a primitive open-address
  * (value → count) map while the column's distinct count stays under
  * `cap`, degrading to a raw value buffer the moment it exceeds it.
  *
  * Low-cardinality measures (quantities, scores, bucketed metrics)
  * are the common quantile target in a data-quality pipeline, and for
  * them the map is the whole game: partial buffers serialize as
  * O(distinct) pairs instead of O(rows) doubles — at sf1 the
  * l_quantity spec's shuffle drops from ~50 MB of raw doubles to ~50
  * pairs — and eval sorts distinct values, not rows. Continuous
  * measures blow past `cap` early and run exactly the old raw-buffer
  * plan (conversion replays counts accumulated so far, so the memory
  * high-water mark equals what raw mode would have held anyway).
  *
  * Invariant: map mode ⟺ raw == null ⟺ distinct values seen ≤ cap.
  * Merges preserve it (map+map re-inserts and converts on overflow;
  * anything touching a raw side goes raw). NaN tallies under its
  * canonical bits and sorts greatest, -0.0 is normalized to +0.0 on
  * append — both exactly as `java.util.Arrays.sort` ordered them in
  * the raw-only implementation, so the two modes are value-identical.
  */
final class PctState(var cap: Int) {
  // map mode: open addressing on doubleToLongBits, power-of-2 table,
  // resize at 1/2 load; cnts(i) == 0 marks an empty slot
  var keys: Array[Double] = new Array[Double](32)
  var cnts: Array[Long] = new Array[Long](32)
  var distinct: Int = 0
  var total: Long = 0L
  // raw mode (keys/cnts null): slots [0, rawN)
  var raw: Array[Double] = null
  var rawN: Int = 0

  @inline private def mask: Int = keys.length - 1
  @inline private def slot(v: Double): Int = {
    val h = java.lang.Double.doubleToLongBits(v) * -7046029254386353131L
    var i = ((h >>> 40) ^ h).toInt & mask
    while (cnts(i) != 0 && keys(i) != v &&
           java.lang.Double.doubleToLongBits(keys(i)) != java.lang.Double.doubleToLongBits(v))
      i = (i + 1) & mask
    i
  }

  def add(v0: Double, c: Long): Unit = {
    val v = v0 + 0.0 // -0.0 → +0.0, same normalization both modes
    total += c
    if (raw != null) { appendRaw(v, c); return }
    val i = slot(v)
    if (cnts(i) != 0) { cnts(i) += c; return }
    if (distinct == cap) { toRaw(); appendRaw(v, c); return }
    keys(i) = v; cnts(i) = c; distinct += 1
    if (distinct * 2 > keys.length) grow()
  }

  private def grow(): Unit = {
    val ok = keys; val oc = cnts
    keys = new Array[Double](ok.length * 2); cnts = new Array[Long](ok.length * 2)
    var i = 0
    while (i < ok.length) {
      if (oc(i) != 0) { val j = slot(ok(i)); keys(j) = ok(i); cnts(j) = oc(i) }
      i += 1
    }
  }

  private def appendRaw(v: Double, c: Long): Unit = {
    val need = rawN + c
    if (need > Int.MaxValue - 8) sys.error("percentile_buf raw buffer exceeds 2^31 values")
    if (raw.length < need) {
      var len = raw.length.toLong
      while (len < need) len *= 2
      raw = java.util.Arrays.copyOf(raw, math.min(len, Int.MaxValue - 8).toInt)
    }
    var k = 0L
    while (k < c) { raw(rawN) = v; rawN += 1; k += 1 }
  }

  /** replay the map's tallies into a raw buffer; high-water memory is
    * the same O(rows-so-far) a raw-only buffer would already hold */
  def toRaw(): Unit = {
    // same cap as appendRaw/mergeIn: fail cleanly, not mid-copy —
    // counts are Longs, so a low-cardinality map can tally past 2^31
    if (total > Int.MaxValue - 8) sys.error("percentile_buf raw buffer exceeds 2^31 values")
    raw = new Array[Double](math.max(32, math.min(total * 2, Int.MaxValue - 8).toInt))
    var i = 0
    while (i < keys.length) {
      if (cnts(i) != 0) {
        var k = 0L
        while (k < cnts(i)) { raw(rawN) = keys(i); rawN += 1; k += 1 }
      }
      i += 1
    }
    keys = null; cnts = null; distinct = 0
  }

  /** merge `o`'s tallies into this state; `o` is never mutated (the
    * aggregate's input-side buffer may be shared by the framework) */
  def mergeIn(o: PctState): Unit = {
    if (o.raw == null) {
      // o is a map: add() routes each entry into whichever mode this
      // side is in (and handles map→raw overflow itself)
      var i = 0
      while (i < o.keys.length) {
        if (o.cnts(i) != 0) add(o.keys(i), o.cnts(i))
        i += 1
      }
    } else {
      if (raw == null) toRaw()
      val need = rawN.toLong + o.rawN
      if (need > Int.MaxValue - 8) sys.error("percentile_buf raw buffer exceeds 2^31 values")
      if (raw.length < need) raw = java.util.Arrays.copyOf(raw, need.toInt)
      System.arraycopy(o.raw, 0, raw, rawN, o.rawN)
      rawN += o.rawN
      total += o.total
    }
  }

  /** value at each requested rank of the sorted multiset (ranks
    * ascending, 0-based); ordering ≡ java.util.Arrays.sort */
  def valuesAt(ranks: Array[Long]): Array[Double] = {
    val out = new Array[Double](ranks.length)
    if (raw != null) {
      val vals = java.util.Arrays.copyOfRange(raw, 0, rawN)
      java.util.Arrays.sort(vals)
      var i = 0
      while (i < ranks.length) { out(i) = vals(ranks(i).toInt); i += 1 }
    } else {
      val vals = new Array[Double](distinct)
      val cs = new Array[Long](distinct)
      var i = 0; var m = 0
      while (i < keys.length) {
        if (cnts(i) != 0) { vals(m) = keys(i); cs(m) = cnts(i); m += 1 }
        i += 1
      }
      // sort entries by value, Arrays.sort double order (NaN last)
      val idx = Array.range(0, m).sortBy(i => vals(i))(Ordering.Double.TotalOrdering)
      var r = 0; var cum = 0L; var e = 0
      while (r < ranks.length) {
        while (e < m && cum + cs(idx(e)) <= ranks(r)) { cum += cs(idx(e)); e += 1 }
        out(r) = vals(idx(e)); r += 1
      }
    }
    out
  }
}

/** `percentile_buf(v, array(p...))`: exact interpolated percentiles
  * (quantile_cont semantics) over a [[PctState]] compact buffer — the
  * size-GATED small-input path of
  * [[graft.operators.ExactPercentile]].
  *
  * Spark's built-in `percentile` keeps an OpenHashMap[AnyRef, Long]
  * per group and boxes every update; a `udaf(Aggregator)` pays an
  * encoder round trip per row. This native TypedImperativeAggregate
  * reads the input double directly into primitive state. eval()
  * resolves each percentile's two bracketing ranks and interpolates
  * v_lo + (v_hi − v_lo)·(h − ⌊h⌋), h = (n−1)·p — the same expression
  * as the histogram path and DuckDB's quantile_cont.
  *
  * Per-group state is O(min(distinct, rows)) — still the group's
  * full value list for continuous columns, which is exactly why this
  * aggregate is NEVER the default at scale: callers reach it only
  * through ExactPercentile.computeMultiAuto's row-count gate. Null
  * inputs are ignored (SQL aggregate semantics); a group with no
  * non-null values yields null (dropped by the caller's inner
  * semantics).
  */
case class PercentileBuf(child: Expression, ps: Array[Double],
                         mapCap: Int = 1 << 16,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PctState] with UnaryLike[Expression] {

  override def prettyName: String = "percentile_buf"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"percentile_buf requires a double input, got $other")
    }

  override def createAggregationBuffer(): PctState = new PctState(mapCap)

  override def update(b: PctState, input: InternalRow): PctState = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double], 1L)
    b
  }

  override def merge(a: PctState, b: PctState): PctState = { a.mergeIn(b); a }

  override def eval(b: PctState): Any = {
    val n = b.total
    if (n == 0) return null
    val ranks = ps.flatMap { p => val h = (n - 1) * p
      Seq(math.floor(h).toLong, math.ceil(h).toLong) }.distinct.sorted
    val at = ranks.zipWithIndex.toMap
    val vals = b.valuesAt(ranks)
    new GenericArrayData(ps.map { p =>
      val h = (n - 1) * p
      val lo = vals(at(math.floor(h).toLong)); val hi = vals(at(math.ceil(h).toLong))
      lo + (hi - lo) * (h - math.floor(h))
    })
  }

  override def serialize(b: PctState): Array[Byte] = {
    if (b.raw == null) {
      val bb = java.nio.ByteBuffer.allocate(1 + 8 + 4 + 16 * b.distinct)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(0: Byte); bb.putLong(b.total); bb.putInt(b.distinct)
      var i = 0
      while (i < b.keys.length) {
        if (b.cnts(i) != 0) { bb.putDouble(b.keys(i)); bb.putLong(b.cnts(i)) }
        i += 1
      }
      bb.array()
    } else {
      val bb = java.nio.ByteBuffer.allocate(1 + 4 + 8 * b.rawN)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(1: Byte); bb.putInt(b.rawN)
      var i = 0
      while (i < b.rawN) { bb.putDouble(b.raw(i)); i += 1 }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): PctState = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val st = new PctState(mapCap)
    if (bb.get() == 0) {
      val total = bb.getLong(); val m = bb.getInt()
      var i = 0
      while (i < m) { st.add(bb.getDouble(), bb.getLong()); i += 1 }
      assert(st.total == total)
    } else {
      val n = bb.getInt()
      st.raw = new Array[Double](math.max(32, n)); st.keys = null; st.cnts = null
      var i = 0
      while (i < n) { st.raw(i) = bb.getDouble(); i += 1 }
      st.rawN = n; st.total = n
    }
    st
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
