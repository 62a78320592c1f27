package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._

/** Correlated subqueries in vortex DML (VERDICT r12 "What's missing"
  * #1): `UPDATE t SET c = (SELECT v FROM s WHERE s.k = t.k)` and
  * `DELETE/UPDATE … WHERE [NOT] EXISTS (SELECT … WHERE s.k = t.k)` are
  * the most common DML shapes the engine previously refused. They are
  * NOT evaluated per-row: a correlated subquery over an
  * equality-correlation IS a join on that equality, and the engine
  * already has the bounded-broadcast join machinery — VortexMerge.
  * This module extracts the correlation so RewriteVortexDml can emit a
  * synthesized MERGE:
  *
  *  - `WHERE EXISTS (… s.k = t.k …)`      → `WHEN MATCHED [AND rest]`
  *  - `WHERE NOT EXISTS (… s.k = t.k …)`  → `WHEN NOT MATCHED BY
  *    SOURCE [AND rest]` (inherits the disclosed full-candidate-scan
  *    shape — inherent: any target row may lack a match)
  *  - `SET c = f((SELECT v … s.k = t.k))` → `WHEN MATCHED THEN UPDATE
  *    SET c = f(src.v)` PLUS `WHEN NOT MATCHED BY SOURCE THEN UPDATE
  *    SET c = f(NULL)` — ANSI: a scalar subquery over zero rows is
  *    NULL, so unmatched-but-predicated rows must still assign.
  *    Duplicate source keys fail loudly through merge's unique-key
  *    `require` (ANSI: scalar subquery returned more than one row).
  *
  * Scale contract inherited from MERGE: the subquery side (dedup'd
  * keys for EXISTS; key+value rows for scalar) is collected and
  * broadcast under merge's hard `maxSourceRows` cap; the target stays
  * file-granular with key-IN pushdown pruning (except NMBS shapes).
  *
  * Supported correlation is EQUALITY on bare columns only; correlated
  * aggregates (`SELECT max(v) … WHERE s.k = t.k`) are rejected loudly —
  * their ANSI empty-group semantics (COUNT()=0, others NULL over an
  * EMPTY group per missing key) do not decompose into MERGE's
  * matched/not-matched dichotomy without engine-side group synthesis.
  */
object CorrelatedDml extends PredicateHelper {

  def isCorrelated(s: SubqueryExpression): Boolean =
    s.isCorrelated || s.getOuterAttrs.nonEmpty ||
      s.plan.exists(_.expressions.exists(_.exists(_.isInstanceOf[OuterReference])))

  /** any correlated subquery anywhere under `e`? */
  def hasCorrelated(e: Expression): Boolean = e.exists {
    case s: SubqueryExpression => isCorrelated(s)
    case _ => false
  }

  /** The decomposed correlation: an uncorrelated source plan whose
    * `innerKeyIdx` columns equi-join the target's `outerKeys`;
    * `valueIdx` names the scalar value column (scalar form only). */
  final case class Extracted(
      sourcePlan: LogicalPlan,
      outerKeys: Seq[AttributeReference],
      innerKeyIdx: Array[Int],
      valueIdx: Option[Int])

  private def fail(what: String, detail: String): Nothing =
    throw new UnsupportedOperationException(
      s"vortex $what: unsupported correlated subquery shape — $detail. " +
      "Supported: equality-correlated plain SELECTs (a scalar SET value, " +
      "or a top-level [NOT] EXISTS conjunct in WHERE); for anything else " +
      "express the statement as an explicit MERGE over the join key")

  /** Strip `inner = outer` equality conjuncts out of the subquery —
    * they become the MERGE ON keys; any other use of an outer
    * reference rejects loudly. TWO analyzed forms arrive here,
    * depending on which context the rewrite rule fired in:
    *  - analysis-time (GraftExtensions post-hoc resolution): the
    *    correlation lives as `OuterReference` equalities inside the
    *    subquery plan's own Filters;
    *  - optimizer-time (`RewriteVortexDml.install` on a session built
    *    without the extensions): `PullupCorrelatedPredicates` has
    *    already MOVED those equalities out of the plan into the
    *    subquery expression's `joinCond`, with the outer side either
    *    still wrapped or a bare outer attribute (its exprId is in
    *    `getOuterAttrs`). Both are consumed; the pairs merge. */
  private def strip(s: SubqueryExpression, what: String)
      : (LogicalPlan, Seq[(AttributeReference, AttributeReference)]) = {
    val pairs =
      scala.collection.mutable.ArrayBuffer[(AttributeReference, AttributeReference)]()
    val outerIds = s.getOuterAttrs.collect {
      case a: AttributeReference => a.exprId
      case OuterReference(a: AttributeReference) => a.exprId
    }.toSet
    def outerOf(e: Expression): Option[AttributeReference] = e match {
      case OuterReference(a: AttributeReference) => Some(a)
      case a: AttributeReference if outerIds.contains(a.exprId) => Some(a)
      case _ => None
    }
    def innerOf(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference if !outerIds.contains(a.exprId) => Some(a)
      case _ => None
    }
    def consume(conjunct: Expression): Unit = conjunct match {
      case EqualTo(l, r) =>
        (innerOf(l), outerOf(r), innerOf(r), outerOf(l)) match {
          case (Some(i), Some(o), _, _) => pairs += ((i, o))
          case (_, _, Some(i), Some(o)) => pairs += ((i, o))
          case _ => fail(what, s"correlation must be bare `inner = outer` " +
            s"column equalities (no casts/expressions), got $conjunct")
        }
      case other =>
        fail(what, s"correlation must be bare `inner = outer` column " +
          s"equalities (no casts/expressions), got $other")
    }
    // pulled-up form (joinCond lives on the concrete subquery classes,
    // not the SubqueryExpression base)
    val jc: Seq[Expression] = s match {
      case sc: ScalarSubquery => sc.joinCond
      case ex: Exists => ex.joinCond
      case _ => Seq.empty
    }
    jc.flatMap(splitConjunctivePredicates(_)).foreach(consume)
    // in-plan form
    val stripped = s.plan.transformUp {
      case Filter(cond, child) if cond.exists(_.isInstanceOf[OuterReference]) =>
        val (corr, rest) = splitConjunctivePredicates(cond)
          .partition(_.exists(_.isInstanceOf[OuterReference]))
        corr.foreach(consume)
        rest.reduceOption(And).map(Filter(_, child)).getOrElse(child)
    }
    if (stripped.exists(_.expressions.exists(_.exists(_.isInstanceOf[OuterReference]))))
      fail(what, "an outer reference appears outside a simple WHERE equality")
    if (pairs.isEmpty) fail(what, "no equality correlation found")
    (stripped, pairs.toSeq.distinct)
  }

  /** Aggregates reject in BOTH extractors: a correlated scalar
    * aggregate has ANSI empty-group semantics (COUNT=0 over a missing
    * key — the "count bug") and an ungrouped-aggregate EXISTS is
    * always-true (one row even over empty input); neither decomposes
    * into MERGE's matched/not-matched dichotomy. */
  private def rejectAggregates(p: LogicalPlan, what: String): Unit =
    if (p.exists(_.isInstanceOf[Aggregate]))
      fail(what, "correlated AGGREGATE subqueries are not supported (their " +
        "ANSI empty-group semantics do not decompose into MERGE) — " +
        "pre-aggregate into a table and correlate on its key")

  /** `[NOT] EXISTS (…)` → DISTINCT inner key tuples, uncorrelated
    * subquery filters folded in (the subquery's own SELECT list is
    * semantically void for EXISTS). */
  def extractExists(ex: Exists, what: String): Extracted = {
    val (stripped, pairs) = strip(ex, what)
    rejectAggregates(stripped, what)
    val inner = pairs.map(_._1)
    // pulled-up form: decorrelation already made the keys part of the
    // subquery root's output; in-plan form: the EXISTS projection
    // contributes nothing — reach under it so the key columns (which
    // it typically does NOT select) stay visible
    val base =
      if (inner.forall(stripped.outputSet.contains)) stripped
      else stripped match {
        case Project(_, child) => child
        case p => p
      }
    val proj = Distinct(Project(inner, base))
    if (!proj.resolved || proj.missingInput.nonEmpty)
      fail(what, "the correlation keys are not visible at the subquery root")
    Extracted(proj, pairs.map(_._2),
      inner.map(a => proj.output.indexWhere(_.exprId == a.exprId)).toArray, None)
  }

  /** Scalar `(SELECT v FROM … WHERE s.k = t.k [AND …])` → key columns
    * plus the value column. NOT dedup'd: two source rows for one key
    * must ERROR (ANSI scalar cardinality), which merge's unique-key
    * `require` delivers. */
  def extractScalar(sc: ScalarSubquery, what: String): Extracted = {
    val (stripped, pairs) = strip(sc, what)
    rejectAggregates(stripped, what)
    val inner = pairs.map(_._1)
    def build(valueExpr: Expression, child: LogicalPlan): Extracted = {
      val value = Alias(valueExpr, "__corr_value")()
      val proj = Project(inner :+ value, child)
      if (!proj.resolved || proj.missingInput.nonEmpty)
        fail(what, "the correlation keys are not visible at the subquery root")
      Extracted(proj, pairs.map(_._2),
        inner.map(a => proj.output.indexWhere(_.exprId == a.exprId)).toArray,
        Some(proj.output.length - 1))
    }
    stripped match {
      // pulled-up form: decorrelation made the plan output
      // (value, keys…) — the scalar value is output.head by the
      // ScalarSubquery contract, the keys are root-visible
      case p if p.output.nonEmpty && inner.forall(p.outputSet.contains) =>
        build(p.output.head, p)
      // in-plan form: SELECT <one expr> over the stripped filters
      case Project(projList, child) if projList.length == 1 =>
        build(projList.head match {
          case a: Alias => a.child
          case ne => ne
        }, child)
      case other =>
        fail(what, s"the subquery root must be a plain SELECT, got ${other.nodeName}")
    }
  }
}
