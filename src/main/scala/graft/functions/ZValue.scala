package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `z_value(c1, …, ck)`: the Morton / Z-order key of 2–8 columns as a
  * BINARY of 8·k bytes whose LEXICOGRAPHIC order interleaves the
  * columns' bits — sorting a write by it clusters rows so that EVERY
  * keyed column's per-chunk min/max range is narrow, not just the
  * leading sort column's (the classic multi-dimensional zone-map
  * clustering of C-Store/Delta-OPTIMIZE lineage; SURVEY.md §4's
  * pruning tiers consume the result with no read-side change).
  *
  * Each column maps to an unsigned-comparable 64-bit word first
  * (sign-flipped integrals, IEEE-remapped floats via the
  * [[DoubleSortableBits]] mapping, first 8 UTF-8 bytes of strings,
  * unscaled decimals ≤18 digits); NULL maps to the minimum word, so
  * null rows cluster together at the low corner. A native codegen
  * expression — the write-side shuffle/sort key stays inside
  * whole-stage codegen.
  */
case class ZValue(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 2 || children.size > 8)
      return TypeCheckResult.TypeCheckFailure(
        s"z_value takes 2 to 8 columns, got ${children.size}")
    children.find(c => !ZValue.supports(c.dataType)) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"z_value unsupported for ${c.dataType.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val ords = new Array[Long](children.size)
    var i = 0
    while (i < ords.length) {
      val c = children(i)
      val v = c.eval(input)
      ords(i) = if (v == null) 0L else ZValue.ord(v, c.dataType)
      i += 1
    }
    ZValue.interleave(ords)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.freshName("ords")
    val setup = code"long[] $arr = new long[${children.size}];"
    val fills = children.zipWithIndex.map { case (c, i) =>
      val g = c.genCode(ctx)
      val ordExpr = ZValue.ordJava(c.dataType, g.value.toString)
      code"""
        ${g.code}
        $arr[$i] = ${g.isNull} ? 0L : $ordExpr;
      """
    }.reduce(_ + _)
    val out = code"byte[] ${ev.value} = graft.functions.ZValueUtil.interleave($arr);"
    ev.copy(code = setup + fills + out, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object ZValue {
  def supports(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | FloatType | DoubleType |
         StringType | BinaryType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }

  /** unsigned-comparable 64-bit word for a non-null INTERNAL value */
  def ord(v: Any, dt: DataType): Long = dt match {
    case ByteType => ZValueUtil.ordLong(v.asInstanceOf[Byte].toLong)
    case ShortType => ZValueUtil.ordLong(v.asInstanceOf[Short].toLong)
    case IntegerType | DateType => ZValueUtil.ordLong(v.asInstanceOf[Int].toLong)
    case LongType | TimestampType | TimestampNTZType =>
      ZValueUtil.ordLong(v.asInstanceOf[Long])
    case FloatType => ZValueUtil.ordDouble(v.asInstanceOf[Float].toDouble)
    case DoubleType => ZValueUtil.ordDouble(v.asInstanceOf[Double])
    case StringType => ZValueUtil.ordUTF8(v.asInstanceOf[UTF8String])
    case BinaryType => ZValueUtil.ordBytes(v.asInstanceOf[Array[Byte]])
    case d: DecimalType =>
      ZValueUtil.ordLong(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toUnscaledLong)
    case other => throw new UnsupportedOperationException(s"z_value: $other")
  }

  /** Java source computing the ord word from a generated value term */
  def ordJava(dt: DataType, v: String): String = dt match {
    case ByteType | ShortType | IntegerType | DateType =>
      s"graft.functions.ZValueUtil.ordLong((long) $v)"
    case LongType | TimestampType | TimestampNTZType =>
      s"graft.functions.ZValueUtil.ordLong($v)"
    case FloatType => s"graft.functions.ZValueUtil.ordDouble((double) $v)"
    case DoubleType => s"graft.functions.ZValueUtil.ordDouble($v)"
    case StringType => s"graft.functions.ZValueUtil.ordUTF8($v)"
    case BinaryType => s"graft.functions.ZValueUtil.ordBytes($v)"
    case _: DecimalType => s"graft.functions.ZValueUtil.ordLong($v.toUnscaledLong())"
    case other => throw new UnsupportedOperationException(s"z_value: $other")
  }

  def interleave(ords: Array[Long]): Array[Byte] = ZValueUtil.interleave(ords)

  /** register `z_value` for SQL / expr(...) use */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_value", exprs => ZValue(exprs), "built-in")
}

/** standalone object → guaranteed static forwarders for codegen */
object ZValueUtil {
  /** sign-flip: signed long order → unsigned-comparable */
  def ordLong(v: Long): Long = v ^ java.lang.Long.MIN_VALUE

  /** IEEE remap (DoubleSortableBits) then sign-flip: double order →
    * unsigned-comparable; -0.0 and 0.0 collapse (equal under SQL) */
  def ordDouble(v: Double): Long = {
    val x = if (v == 0.0) 0.0 else v
    val b = java.lang.Double.doubleToLongBits(x)
    if (b >= 0L) b ^ java.lang.Long.MIN_VALUE else ~b
  }

  /** first 8 bytes big-endian, zero-padded: byte-lexicographic order
    * (already unsigned) — ties beyond 8 bytes collapse, which only
    * coarsens clustering, never correctness */
  def ordBytes(b: Array[Byte]): Long = {
    var w = 0L
    val n = math.min(8, b.length)
    var i = 0
    while (i < n) { w |= (b(i) & 0xffL) << (56 - 8 * i); i += 1 }
    w
  }

  def ordUTF8(s: UTF8String): Long = {
    // avoid materializing the byte array for the common short case
    val n = math.min(8, s.numBytes())
    var w = 0L
    var i = 0
    while (i < n) { w |= (s.getByte(i) & 0xffL) << (56 - 8 * i); i += 1 }
    w
  }

  /** round-robin MSB-first bit interleave of k 64-bit words into an
    * 8·k-byte big-endian binary: out bit j comes from word j%k,
    * bit 63-(j/k) */
  def interleave(ords: Array[Long]): Array[Byte] = {
    val k = ords.length
    val out = new Array[Byte](8 * k)
    var j = 0
    val total = 64 * k
    while (j < total) {
      val bit = ((ords(j % k) >>> (63 - j / k)) & 1L).toInt
      out(j >>> 3) = (out(j >>> 3) | (bit << (7 - (j & 7)))).toByte
      j += 1
    }
    out
  }
}
