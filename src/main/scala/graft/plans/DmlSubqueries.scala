package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Exists, Expression, In, InSubquery, ListQuery, Literal, OuterReference, ScalarSubquery, SubqueryExpression}
import org.apache.spark.sql.graft.GraftSqlBridge

/** Bounded subquery support in vortex DML predicates (VERDICT r11
  * "What's missing" #3): `UPDATE/DELETE … WHERE k IN (SELECT …)`,
  * `[NOT] EXISTS (…)`, and scalar subqueries in SET values / MERGE
  * clause conditions. The corpus-purge shape ("delete everything
  * matching this audit table") wants the IN form; the mechanism is the
  * VortexMerge bounded-broadcast discipline: the subquery is evaluated
  * ONCE, driver-side, under a hard row cap (loud `require`), and its
  * result substitutes as LITERALS into the predicate. Routing the
  * literal form into the existing classify/rewrite machinery means
  * manifest min/max, bloom and partition pruning apply to the IN list
  * for free — a purge keyed on an audit table opens only the files
  * that can hold audited keys.
  *
  * The cap (`spark.graft.vortex.dmlSubqueryMaxRows`, default 65536) is
  * deliberately tighter than merge's 1M source cap: the IN list
  * becomes a plan-time expression evaluated per row per candidate
  * file (as an InSet hash probe after Spark's In→InSet conversion),
  * and a key set that large is MERGE's job — the error message says
  * so. Oversized results fail loudly, never truncate.
  *
  * Two-phase contract:
  *  - [[validate]] runs at ANALYSIS time (the rewrite rule): shape
  *    errors — correlated subqueries, tuple IN — surface when the
  *    statement is planned, before anything executes.
  *  - [[materialize]] runs at EXECUTION time (the command's `run`):
  *    an EXPLAIN of the statement never executes the subquery, and
  *    the values reflect statement-start state (each subquery is
  *    evaluated exactly once per statement — ANSI single-evaluation
  *    semantics, same snapshot the planner's candidate scan sees).
  *
  * Correlated subqueries imply a per-target-row join, which is MERGE's
  * machinery: the common equality-correlated shapes ([NOT] EXISTS in
  * UPDATE/DELETE WHERE, scalar SET values) rewrite into synthesized
  * MERGE statements automatically (r13 — see [[CorrelatedDml]]);
  * remaining sites (merge clause conditions, non-equality correlation)
  * stay loudly rejected with a pointer to explicit MERGE.
  */
object DmlSubqueries {
  val MaxRowsConf = "spark.graft.vortex.dmlSubqueryMaxRows"
  val DefaultMaxRows = 65536

  /** Analysis-time shape check: every subquery in `e` must be an
    * uncorrelated single-column `IN (SELECT …)`, `EXISTS`, or scalar
    * subquery. Throws (never returns a marker) — unsupported DML fails
    * at planning, not mid-statement. (`InSubquery` is itself a plain
    * predicate; the `SubqueryExpression` is its `ListQuery` child —
    * matched here through the enclosing node, skipped standalone.) */
  def validate(e: Expression, what: String): Unit = {
    def noCorr(s: SubqueryExpression): Unit =
      require(!s.isCorrelated && s.getOuterAttrs.isEmpty &&
          !s.plan.exists(_.expressions.exists(_.exists(_.isInstanceOf[OuterReference]))),
        s"vortex $what: a correlated subquery is not supported at this site — " +
        "supported sites (rewritten into MERGE automatically, r13): a " +
        "top-level [NOT] EXISTS conjunct of UPDATE/DELETE WHERE, or a " +
        "correlated scalar SET value; anything else: express the per-row " +
        "relationship as an explicit MERGE over the join key")
    e.foreach {
      case in: InSubquery =>
        noCorr(in.query)
        require(in.values.length == 1,
          s"vortex $what: only single-column IN (SELECT …) subqueries are supported")
      case ex: Exists => noCorr(ex)
      case sc: ScalarSubquery => noCorr(sc)
      case _: ListQuery => () // validated via its enclosing InSubquery
      case other: SubqueryExpression => throw new UnsupportedOperationException(
        s"vortex $what: unsupported subquery form ${other.getClass.getSimpleName}")
      case _ => ()
    }
  }

  /** Execution-time substitution: evaluate each (validated) subquery
    * once, driver-side, under the row cap, and replace it with
    * literals. ANSI edges preserved: `x IN (empty)` is FALSE even for
    * NULL x; `NOT IN` over a result containing NULL yields
    * NULL-semantics through the literal `In`'s own evaluation; an
    * empty scalar subquery is NULL; a >1-row scalar subquery errors. */
  def materialize(session: SparkSession, e: Expression): Expression = {
    if (!e.exists(_.isInstanceOf[SubqueryExpression])) return e
    val cap = session.conf.getOption(MaxRowsConf).map(_.toInt).getOrElse(DefaultMaxRows)
    e.transformUp {
      case InSubquery(Seq(value), l: ListQuery) =>
        val dt = l.plan.output.head.dataType
        val rows = GraftSqlBridge.ofRows(session, l.plan)
          .distinct().limit(cap + 1).collect()
        require(rows.length <= cap,
          s"vortex dml: IN subquery produced more than $MaxRowsConf=$cap " +
          "distinct values — the result substitutes as a literal IN list; " +
          "shrink the subquery or route the statement through MERGE")
        // Above the optimizer's In→InSet threshold, emit InSet DIRECTLY
        // (hash-set probe). The maintenance machinery binds the ANALYZED
        // predicate (the optimizer never sees it), and a multi-thousand-
        // literal In blows past the codegen method limit into an
        // interpreted LINEAR scan per row per assignment column — the
        // r12 sf1 run measured the s15c row at 33.9 s from exactly this
        // before the InSet form (2.6 s after, same answer). DSv2
        // pushdown translates InSet to the same sources.In filter, so
        // manifest/bloom pruning is unchanged.
        if (rows.isEmpty) Literal.FalseLiteral
        else if (rows.length >
            session.sessionState.conf.optimizerInSetConversionThreshold) {
          val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToCatalystConverter(dt)
          org.apache.spark.sql.catalyst.expressions.InSet(
            value, rows.map(r => conv(r.get(0))).toSet)
        }
        else In(value, rows.toSeq.map(r => Literal.create(r.get(0), dt)))
      case ex: Exists =>
        Literal(!GraftSqlBridge.ofRows(session, ex.plan).isEmpty)
      case sc: ScalarSubquery =>
        val rows = GraftSqlBridge.ofRows(session, sc.plan).limit(2).collect()
        require(rows.length <= 1,
          "vortex dml: scalar subquery returned more than one row")
        if (rows.isEmpty) Literal.create(null, sc.dataType)
        else Literal.create(rows(0).get(0), sc.dataType)
    }
  }
}
