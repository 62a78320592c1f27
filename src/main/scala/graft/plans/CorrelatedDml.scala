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
  *    Duplicate source keys fail at MATCH time (ANSI: the error fires
  *    only when the scalar subquery actually evaluates to >1 row for
  *    some targeted row — a duplicated key matching nothing is fine;
  *    review-found r13).
  *  - `SET c = f((SELECT max(v) … s.k = t.k))` (r14; VERDICT r13
  *    missing #1) → the subquery side pre-aggregates BY the
  *    correlation keys (unique by construction), and the NMBS pair
  *    assigns f(<empty-group value>) — COUNT()=0, SUM/MAX/…=NULL, the
  *    ANSI "count bug" handled at the rewrite.
  *
  * Scale contract inherited from MERGE: the subquery side (dedup'd
  * keys for EXISTS; key+value rows for scalar; per-key aggregates for
  * the aggregate form) is collected and broadcast under merge's hard
  * `maxSourceRows` cap; the target stays file-granular with key-IN
  * pushdown pruning (except NMBS shapes). The aggregate form's source
  * is one row per DISTINCT correlation key, so correlating a fact
  * table on its own high-cardinality key exceeds the cap and FAILS
  * LOUDLY (proven at sf1: 1.5 M orderkeys) — correlate on a
  * dimension-bounded key, or batch the statement.
  *
  * Supported correlation is EQUALITY on bare columns only; a
  * correlated aggregate with its own GROUP BY, or under EXISTS, stays
  * rejected loudly.
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
    * `valueIdx` names the scalar value column (scalar form only).
    * `emptyValue` (r14, aggregate form) is the value of the subquery
    * over a key with NO source rows — an ANSI ungrouped aggregate over
    * empty input (COUNT=0, SUM/MAX/…=NULL), constant-foldable; None =
    * plain scalar form, where zero rows means NULL.
    * `keysUniqueByConstruction` (r14): the source plan groups by the
    * correlation keys, so the ANSI scalar-cardinality error can never
    * fire — the merge layer skips its match-time duplicate check. */
  final case class Extracted(
      sourcePlan: LogicalPlan,
      outerKeys: Seq[AttributeReference],
      innerKeyIdx: Array[Int],
      valueIdx: Option[Int],
      emptyValue: Option[Expression] = None,
      keysUniqueByConstruction: Boolean = false)

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

  /** EXISTS keeps rejecting aggregates: an ungrouped-aggregate EXISTS
    * is always-true (one row even over empty input) — a trap, not a
    * query. Scalar aggregates ARE supported since r14 (VERDICT r13
    * missing #1) — see [[extractScalar]]. */
  private def rejectAggregates(p: LogicalPlan, what: String): Unit =
    if (p.exists(_.isInstanceOf[Aggregate]))
      fail(what, "an aggregate under EXISTS is always-true over any input " +
        "(even empty) — drop the aggregate, or use a scalar comparison")

  /** The ANSI value of `expr` (an aggregate output expression) over
    * EMPTY input — the "count bug" compensation for keys with no source
    * rows: COUNT()=0, SUM/MAX/…=NULL, computed generically by
    * evaluating each aggregate function over its initial buffer. Fails
    * loudly for imperative aggregates (no declarative initial state). */
  private def emptyValueOf(expr: Expression, what: String): Expression = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, DeclarativeAggregate}
    val substituted = expr.transform {
      case ae: AggregateExpression => ae.aggregateFunction match {
        case d: DeclarativeAggregate =>
          d.evaluateExpression.transform {
            case a: AttributeReference =>
              val i = d.aggBufferAttributes.indexWhere(_.exprId == a.exprId)
              if (i >= 0) d.initialValues(i) else a
          }
        case other =>
          fail(what, s"cannot derive the empty-group value of the " +
            s"imperative aggregate ${other.prettyName} — use a " +
            "declarative aggregate, or pre-aggregate into a table")
      }
    }
    if (substituted.exists(_.isInstanceOf[AttributeReference]))
      fail(what, "the aggregate's empty-group value is not a constant")
    substituted
  }

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
    * must ERROR (ANSI scalar cardinality) — delivered at MATCH time by
    * the merge layer (a duplicated key that matches no targeted row is
    * NOT an error; review-found r13).
    *
    * Correlated AGGREGATES (r14; VERDICT r13 missing #1):
    * `(SELECT max(v) FROM s WHERE s.k = t.k [AND rest])` → the same
    * aggregate GROUPED BY the correlation keys (one shuffle over the
    * subquery side only; keys unique by construction, so the
    * cardinality error is impossible), with `emptyValue` carrying the
    * ANSI over-empty-input value (COUNT=0, SUM/MAX/…=NULL) for the
    * paired NOT-MATCHED-BY-SOURCE assign — the classic "count bug"
    * handled at the rewrite, not per-row. A subquery with its OWN
    * GROUP BY stays rejected (>1 row per key is possible — that needs
    * runtime cardinality checks, and no sane DML statement does it). */
  def extractScalar(sc: ScalarSubquery, what: String): Extracted = {
    val (stripped, pairs) = strip(sc, what)
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
    def buildAgg(valueExpr: Expression, child: LogicalPlan): Extracted = {
      val value = Alias(valueExpr, "__corr_value")()
      val agg = Aggregate(inner,
        (inner: Seq[NamedExpression]) :+ value, child)
      if (!agg.resolved || agg.missingInput.nonEmpty)
        fail(what, "the correlation keys are not visible under the aggregate")
      Extracted(agg, pairs.map(_._2),
        inner.map(a => agg.output.indexWhere(_.exprId == a.exprId)).toArray,
        Some(agg.output.length - 1),
        Some(emptyValueOf(valueExpr, what)),
        keysUniqueByConstruction = true)
    }
    stripped match {
      // correlated aggregate, in-plan form: the strip left
      // `Aggregate(Nil, [one agg expr], rest-filtered child)` — regroup
      // by the correlation keys
      case Aggregate(g, aggList, child, _) if g.isEmpty && aggList.length == 1 =>
        buildAgg(aggList.head match {
          case a: Alias => a.child
          case ne => ne
        }, child)
      // correlated aggregate, pulled-up form: decorrelation already
      // grouped by the correlation keys and appended them to the output
      // (value first, by the ScalarSubquery contract). Any OTHER group
      // expression means the subquery has its own GROUP BY — reject.
      case agg @ Aggregate(g, aggList, _, _) if g.nonEmpty &&
          inner.forall(agg.outputSet.contains) =>
        val gIds = g.collect { case a: AttributeReference => a.exprId }.toSet
        if (g.exists(!_.isInstanceOf[AttributeReference]) ||
            gIds != inner.map(_.exprId).toSet)
          fail(what, "a correlated aggregate subquery may not carry its own " +
            "GROUP BY (more than one row per key would need a runtime " +
            "cardinality check) — pre-aggregate into a table")
        val valueExpr = aggList.head match {
          case a: Alias => a.child
          case ne => ne
        }
        Extracted(agg, pairs.map(_._2),
          inner.map(a => agg.output.indexWhere(_.exprId == a.exprId)).toArray,
          Some(0),
          Some(emptyValueOf(valueExpr, what)),
          keysUniqueByConstruction = true)
      // correlated aggregate with the subquery's OWN GROUP BY: >1 row
      // per key is possible — reject with a pointed message
      case Aggregate(g, _, _, _) if g.nonEmpty =>
        fail(what, "a correlated aggregate subquery may not carry its own " +
          "GROUP BY (more than one row per key would need a runtime " +
          "cardinality check) — pre-aggregate into a table")
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
