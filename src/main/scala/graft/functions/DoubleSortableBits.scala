package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `double_sortable_bits(x)`: the IEEE-754 bit pattern of a double
  * remapped so SIGNED long order == Spark's double order (negatives
  * ascending below positives, -0.0 just below +0.0, NaN above +Inf —
  * exactly Spark's sort semantics). A native codegen expression (the
  * custom-Expression tier, like [[VecDot]]).
  *
  * Monotonicity makes any right-shift of the result an ORDER-PRESERVING
  * data-independent bucketing of doubles: [[graft.operators.ExactPercentile]]
  * uses `bits >> 44` as its first histogram grid, which removes the
  * per-group extent scan an equi-width grid would need — one fewer
  * full pass at any scale. Mapping: b = doubleToLongBits(x);
  * s = b ≥ 0 ? b : ~b ^ Long.MinValue.
  */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"double_sortable_bits requires double input, got ${child.dataType}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    if (b >= 0) b else ~b ^ java.lang.Long.MIN_VALUE
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bits")
      s"""
         |long $b = java.lang.Double.doubleToLongBits($c);
         |${ev.value} = $b >= 0L ? $b : ~$b ^ java.lang.Long.MIN_VALUE;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DoubleSortableBits {
  /** register `double_sortable_bits` for SQL / expr(...) use */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "double_sortable_bits", exprs => DoubleSortableBits(exprs.head), "built-in")
}
