package graft.sources.vortex

import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector, WritableColumnVector}
import org.apache.spark.sql.types._

/** Decoded [[ColVec]] → Spark writable column vector, the ONE fill
  * used by every columnar surface (file scan, IPC deserialize) — a
  * second copy would have to be kept put/append-contract-identical
  * forever. Flat types use the positional put API; nested types use
  * the append API exclusively (the two cannot mix within a vector).
  */
object ColVecFill {

  def fill(cv: OnHeapColumnVector, vec: ColVec, dt: DataType, n: Int): Unit = {
    var i = 0
    dt match {
      case BooleanType =>
        while (i < n) { if (vec.nulls(i)) cv.putNull(i) else cv.putBoolean(i, vec.longs(i) != 0L); i += 1 }
      case ByteType =>
        while (i < n) { if (vec.nulls(i)) cv.putNull(i) else cv.putByte(i, vec.longs(i).toByte); i += 1 }
      case ShortType =>
        while (i < n) { if (vec.nulls(i)) cv.putNull(i) else cv.putShort(i, vec.longs(i).toShort); i += 1 }
      case IntegerType | DateType =>
        while (i < n) { if (vec.nulls(i)) cv.putNull(i) else cv.putInt(i, vec.longs(i).toInt); i += 1 }
      case LongType | TimestampType | TimestampNTZType =>
        while (i < n) { if (vec.nulls(i)) cv.putNull(i) else cv.putLong(i, vec.longs(i)); i += 1 }
      case FloatType =>
        while (i < n) { if (vec.nulls(i)) cv.putNull(i) else cv.putFloat(i, java.lang.Float.intBitsToFloat(vec.longs(i).toInt)); i += 1 }
      case DoubleType =>
        while (i < n) { if (vec.nulls(i)) cv.putNull(i) else cv.putDouble(i, java.lang.Double.longBitsToDouble(vec.longs(i))); i += 1 }
      case d: DecimalType =>
        while (i < n) {
          if (vec.nulls(i)) cv.putNull(i)
          else cv.putDecimal(i, VortexFileReader.value(vec, i, d).asInstanceOf[Decimal], d.precision)
          i += 1
        }
      case StringType | BinaryType =>
        while (i < n) {
          if (vec.nulls(i)) cv.putNull(i)
          else cv.putByteArray(i, vec.bins(i))
          i += 1
        }
      case st: StructType if vec.kids != null =>
        // shredded struct page: append rows from the decoded child
        // vectors (pruned siblings never decoded); appendStruct keeps
        // children row-aligned for nulls
        while (i < n) {
          if (vec.nulls(i)) appendValue(cv, st, null)
          else {
            cv.appendStruct(false)
            var j = 0
            while (j < st.fields.length) {
              appendValue(cv.getChild(j), st.fields(j).dataType,
                VortexFileReader.value(vec.kids(j), i, st.fields(j).dataType))
              j += 1
            }
          }
          i += 1
        }
      case dt if NestedCodec.isNested(dt) =>
        // nested column: decode each row's self-contained bytes and
        // fill child vectors recursively via the append API (append
        // tracks its own element counts; this vector never mixes the
        // positional put API above)
        val stored = if (vec.blobType != null) vec.blobType else dt
        while (i < n) {
          if (vec.nulls(i)) appendValue(cv, dt, null)
          else {
            val v = NestedCodec.deserialize(vec.bins(i), stored)
            appendValue(cv, dt, if (stored == dt) v else NestedProject.project(v, stored, dt))
          }
          i += 1
        }
      case other => throw new UnsupportedOperationException(s"vortex columnar: $other")
    }
  }

  /** Recursive append of one Catalyst value into a writable vector —
    * the nested-type leg of the columnar path. Array/map offsets are
    * recorded by appendArray BEFORE the children append (per the
    * WritableColumnVector contract); struct children stay row-aligned
    * because every parent row appends exactly one value (or an
    * appendStruct(true)-padded null) to every child. */
  def appendValue(cv: WritableColumnVector, dt: DataType, v: Any): Unit = dt match {
    case ArrayType(et, _) =>
      if (v == null) cv.appendNull()
      else {
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val m = arr.numElements()
        cv.appendArray(m)
        val child = cv.arrayData()
        var j = 0
        while (j < m) {
          appendValue(child, et, if (arr.isNullAt(j)) null else arr.get(j, et)); j += 1
        }
      }
    case st: StructType =>
      if (v == null) cv.appendStruct(true)
      else {
        cv.appendStruct(false)
        val row = v.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        var j = 0
        while (j < st.length) {
          val ft = st.fields(j).dataType
          appendValue(cv.getChild(j), ft, if (row.isNullAt(j)) null else row.get(j, ft))
          j += 1
        }
      }
    case MapType(kt, vt, _) =>
      if (v == null) cv.appendNull()
      else {
        val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val cnt = m.numElements()
        cv.appendArray(cnt) // maps share the array offset layout (keys child drives)
        val keys = m.keyArray(); val vals = m.valueArray()
        var j = 0
        while (j < cnt) {
          appendValue(cv.getChild(0), kt, if (keys.isNullAt(j)) null else keys.get(j, kt))
          appendValue(cv.getChild(1), vt, if (vals.isNullAt(j)) null else vals.get(j, vt))
          j += 1
        }
      }
    case _ if v == null => cv.appendNull()
    case BooleanType => cv.appendBoolean(v.asInstanceOf[Boolean])
    case ByteType => cv.appendByte(v.asInstanceOf[Byte])
    case ShortType => cv.appendShort(v.asInstanceOf[Short])
    case IntegerType | DateType => cv.appendInt(v.asInstanceOf[Int])
    case LongType | TimestampType | TimestampNTZType => cv.appendLong(v.asInstanceOf[Long])
    case FloatType => cv.appendFloat(v.asInstanceOf[Float])
    case DoubleType => cv.appendDouble(v.asInstanceOf[Double])
    case d: DecimalType =>
      // mirror putDecimal's storage choice per precision
      val dec = v.asInstanceOf[Decimal]
      if (d.precision <= Decimal.MAX_INT_DIGITS) cv.appendInt(dec.toUnscaledLong.toInt)
      else if (d.precision <= Decimal.MAX_LONG_DIGITS) cv.appendLong(dec.toUnscaledLong)
      else {
        val b = dec.toJavaBigDecimal.unscaledValue().toByteArray
        cv.appendByteArray(b, 0, b.length)
      }
    case StringType =>
      val b = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      cv.appendByteArray(b, 0, b.length)
    case BinaryType =>
      val b = v.asInstanceOf[Array[Byte]]
      cv.appendByteArray(b, 0, b.length)
    case other => throw new UnsupportedOperationException(s"vortex columnar nested: $other")
  }
}
