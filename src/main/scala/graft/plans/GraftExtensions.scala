package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{GetJsonObject, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Rewrites `get_json_object(col, '$.field')` with a literal simple
  * path into [[graft.functions.JsonGetSimple]] — a codegen'd one-pass
  * byte scan with an exact built-in fallback on every case the scan
  * cannot prove equivalent. Complex paths (nesting, arrays,
  * wildcards, quoted names) and non-literal paths are untouched. */
object FastJsonRule extends Rule[LogicalPlan] {
  private val Simple = "^\\$\\.([A-Za-z0-9_]+)$".r

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case g @ GetJsonObject(json, Literal(p: UTF8String, StringType))
        if json.dataType == StringType =>
      p.toString match {
        case Simple(f) => graft.functions.JsonGetSimple(json, f)
        case _ => g
      }
  }

  /** Install into an ALREADY-RUNNING session (extensions are fixed at
    * session construction; `getOrCreate` may have reused one built
    * without them). Idempotent — the rule matches nothing once
    * rewritten. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}

/** Session extensions entry point: enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (or pass to `withExtensions`). Installed by graft's own
  * Verify/Bench harness sessions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FastJsonRule)
    // graft's custom expressions, for sessions that only speak SQL
    // (the register() helpers cover programmatic sessions)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    def fn(name: String, clazz: String)(b: Seq[Expression] => Expression) =
      e.injectFunction((FunctionIdentifier(name), new ExpressionInfo(clazz, name), b))
    fn("vec_dot", "graft.functions.VecDot")(es => graft.functions.VecDot(es(0), es(1)))
    fn("double_sortable_bits", "graft.functions.DoubleSortableBits")(
      es => graft.functions.DoubleSortableBits(es.head))
    fn("z_value", "graft.functions.ZValue")(es => graft.functions.ZValue(es))
  }
}
