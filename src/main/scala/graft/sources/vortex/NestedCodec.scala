package graft.sources.vortex

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Nested-type values (array / struct / map over the §1.3 leaf
  * lattice) serialize to self-contained byte strings carried through
  * the var-width page path. Hand-rolled, little-endian, version-
  * independent — the file format owns its bytes (deliberately NOT
  * Spark's UnsafeRow layout, which is an in-memory format).
  */
object NestedCodec {

  def isNested(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: StructType | _: MapType => true
    case _ => false
  }

  def supported(dt: DataType): Boolean = dt match {
    case ArrayType(e, _) => supported(e)
    case StructType(fs) => fs.forall(f => supported(f.dataType))
    case MapType(k, v, _) => supported(k) && supported(v)
    case other => VortexFormat.supported(other)
  }

  def serialize(v: Any, dt: DataType): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    write(out, v, dt)
    out.flush()
    bos.toByteArray
  }

  def deserialize(b: Array[Byte], dt: DataType): Any = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN)
    read(bb, dt)
  }

  private def write(out: DataOutputStream, v: Any, dt: DataType): Unit = dt match {
    case ArrayType(e, _) =>
      val a = v.asInstanceOf[ArrayData]
      out.writeInt(a.numElements())
      var i = 0
      while (i < a.numElements()) {
        if (a.isNullAt(i)) out.writeBoolean(true)
        else { out.writeBoolean(false); write(out, a.get(i, e), e) }
        i += 1
      }
    case st: StructType =>
      val r = v.asInstanceOf[InternalRow]
      var i = 0
      while (i < st.length) {
        val ft = st.fields(i).dataType
        if (r.isNullAt(i)) out.writeBoolean(true)
        else { out.writeBoolean(false); write(out, r.get(i, ft), ft) }
        i += 1
      }
    case MapType(k, mv, _) =>
      val m = v.asInstanceOf[MapData]
      write(out, m.keyArray(), ArrayType(k))
      write(out, m.valueArray(), ArrayType(mv, containsNull = true))
    case BooleanType => out.writeBoolean(v.asInstanceOf[Boolean])
    case ByteType => out.writeByte(v.asInstanceOf[Byte].toInt)
    case ShortType => out.writeShort(v.asInstanceOf[Short].toInt)
    case IntegerType | DateType => out.writeInt(v.asInstanceOf[Int])
    case LongType | TimestampType | TimestampNTZType => out.writeLong(v.asInstanceOf[Long])
    case FloatType => out.writeFloat(v.asInstanceOf[Float])
    case DoubleType => out.writeDouble(v.asInstanceOf[Double])
    case d: DecimalType =>
      val bytes = v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue().toByteArray
      out.writeInt(bytes.length); out.write(bytes)
    case StringType =>
      val bytes = v.asInstanceOf[UTF8String].getBytes
      out.writeInt(bytes.length); out.write(bytes)
    case BinaryType =>
      val bytes = v.asInstanceOf[Array[Byte]]
      out.writeInt(bytes.length); out.write(bytes)
    case other => throw new UnsupportedOperationException(s"vortex nested: $other")
  }

  private def read(bb: ByteBuffer, dt: DataType): Any = dt match {
    case ArrayType(e, _) =>
      val n = bb.getInt()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = if (bb.get() != 0) null else read(bb, e)
        i += 1
      }
      new GenericArrayData(out)
    case st: StructType =>
      val row = new GenericInternalRow(st.length)
      var i = 0
      while (i < st.length) {
        if (bb.get() != 0) row.update(i, null)
        else row.update(i, read(bb, st.fields(i).dataType))
        i += 1
      }
      row
    case MapType(k, mv, _) =>
      val keys = read(bb, ArrayType(k)).asInstanceOf[ArrayData]
      val vals = read(bb, ArrayType(mv, containsNull = true)).asInstanceOf[ArrayData]
      new ArrayBasedMapData(keys, vals)
    case BooleanType => bb.get() != 0
    case ByteType => bb.get()
    case ShortType => bb.getShort()
    case IntegerType | DateType => bb.getInt()
    case LongType | TimestampType | TimestampNTZType => bb.getLong()
    case FloatType => bb.getFloat()
    case DoubleType => bb.getDouble()
    case d: DecimalType =>
      val bytes = new Array[Byte](bb.getInt()); bb.get(bytes)
      Decimal(new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale), d.precision, d.scale)
    case StringType =>
      val bytes = new Array[Byte](bb.getInt()); bb.get(bytes)
      UTF8String.fromBytes(bytes)
    case BinaryType =>
      val bytes = new Array[Byte](bb.getInt()); bb.get(bytes)
      bytes
    case other => throw new UnsupportedOperationException(s"vortex nested: $other")
  }
}
