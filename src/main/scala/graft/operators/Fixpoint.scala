package graft.operators

import org.apache.spark.sql.DataFrame

/** Recursive-iteration surface — the Spark answer to SQL
  * `WITH RECURSIVE` (engine-inherited in the reference via its pinned
  * DuckDB, unexercised by the reference's own tests; declared in
  * SURVEY §2 as this operator + DedupOps.labelPropagate).
  *
  * Spark has no native recursive CTE, and the idiomatic replacement is
  * a DRIVER-CONTROLLED loop over DISTRIBUTED work: semi-naive
  * evaluation, exactly the algorithm recursive-CTE engines run
  * internally. The driver holds only loop control (a per-round
  * emptiness check); every row stays in executors.
  *
  *   result   = distinct(base)
  *   frontier = result
  *   repeat: next = distinct(step(frontier)) EXCEPT result
  *           result ∪= next; frontier = next
  *   until next is empty
  *
  * This is UNION-variant (distinct) recursive CTE semantics: a
  * monotone fixpoint, so termination is guaranteed whenever the
  * reachable row domain is finite. `maxRounds` bounds the K (a
  * cyclic-derivation guard like every production recursive engine
  * carries); overflow throws rather than silently truncating.
  *
  * Scale notes: each round localCheckpoints — without it the logical
  * plan nests one join+except per round and planning cost grows
  * superlinearly; with it each round's input is a materialized block
  * whose lineage is one step deep. ContextCleaner frees rounds'
  * blocks as their frames go unreachable. The per-round EXCEPT is a
  * shuffle on the full row — for key-only reachability (the common
  * case) rows are narrow; for wide payloads recurse on keys and
  * re-join payloads after the fixpoint.
  */
object Fixpoint {

  /** Least fixpoint of `base ∪ step(·)` under UNION DISTINCT
    * semantics. `step` sees only the previous round's NEW rows
    * (semi-naive), never the whole accumulated result.
    *
    * Only the per-round DELTA is ever materialized (one checkpoint
    * job + one emptiness probe per round); the accumulated result is
    * a lazy union of the checkpointed deltas — pairwise disjoint by
    * the EXCEPT and each individually distinct, so the union
    * preserves the distinct invariant with no extra shuffle and the
    * full result is never rewritten round-over-round (a
    * re-checkpoint-the-union loop is O(rounds × |result|) I/O; this
    * is O(|result|) total). */
  def recursiveUnion(base: DataFrame, step: DataFrame => DataFrame,
                     maxRounds: Int = 100): DataFrame = {
    val s = base.sparkSession
    // A fixpoint loop is all scheduling floor: each round is a small
    // sequential job, and AQE turns every round into several stage-
    // materialization jobs (measured 75 jobs / 3.5 s for a 12-round
    // closure whose total data is a few hundred rows). Inside the
    // loop the plans are tiny and fixed-shape — AQE buys nothing, so
    // park it for the loop's duration and restore after.
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqePrev = s.conf.get(aqeKey, "true")
    s.conf.set(aqeKey, "false")
    try {
      // materialize each delta with ONE job: lazy localCheckpoint,
      // then count() both materializes it and answers the emptiness
      // probe (an extra isEmpty job per round would double the floor)
      def checkpointed(df: DataFrame): (DataFrame, Long) = {
        val cp = df.localCheckpoint(false)
        val n = cp.count()
        // tiny deltas collapse to one partition so the union-of-deltas
        // scan (and the next step) doesn't accumulate empty tasks
        (if (n <= 100000) cp.coalesce(1) else cp, n)
      }
      var (frontier, n) = checkpointed(base.distinct())
      val deltas = scala.collection.mutable.ListBuffer.empty[DataFrame]
      var rounds = 0
      while (n > 0) {
        deltas += frontier
        if (rounds >= maxRounds)
          throw new IllegalStateException(
            s"recursiveUnion did not converge in $maxRounds rounds " +
              "(cyclic derivation or maxRounds too small)")
        // EXCEPT already has distinct semantics (distinct left rows
        // not in right) — no separate .distinct() shuffle needed
        val (f2, n2) = checkpointed(
          step(frontier).except(deltas.reduce(_ union _)))
        frontier = f2; n = n2
        rounds += 1
      }
      if (deltas.isEmpty) frontier else deltas.reduce(_ union _)
    } finally s.conf.set(aqeKey, aqePrev)
  }

  /** `WITH RECURSIVE ... UNION ALL` semantics: no per-round dedup, so
    * each round is ONE job (checkpoint+count of `step(frontier)`).
    * The caller must guarantee the derivation is finite (e.g. a
    * strictly growing column like depth over an acyclic edge set —
    * the common reachability/hierarchy shape); on a cyclic derivation
    * this throws at `maxRounds` rather than looping forever. Use
    * `recursiveUnion` when rows can re-derive.
    *
    * `kernelCap > 0` opts into the TINY-FRONTIER driver kernel (r15;
    * the labelPropagateKernel / BoundedBucketPairs discipline): each
    * round's delta is collected bounded by `limit(cap+1)` — a round
    * exceeding the cap fails LOUDLY, never silently truncates — and
    * the next frontier becomes a LocalRelation. A frontier the step
    * joins against then broadcasts with NO broadcast-collect job (a
    * LocalTableScan collects driver-side), so a round costs exactly
    * one Spark job instead of two-plus. A/B at sf1 (q_recursive,
    * 8 rounds, ≤50-row frontiers): 18 jobs / 1.48 s best → see
    * BASELINE.md r15. Driver state is bounded by rounds × cap, the
    * same bound the result itself carries — use only when the CLOSURE
    * is small (reachability over a dimension hierarchy), never for a
    * corpus-sized recursion. */
  def recursiveUnionAll(base: DataFrame, step: DataFrame => DataFrame,
                        maxRounds: Int = 100,
                        kernelCap: Int = 0): DataFrame = {
    if (kernelCap > 0) return recursiveUnionAllKernel(base, step, maxRounds, kernelCap)
    val s = base.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqePrev = s.conf.get(aqeKey, "true")
    s.conf.set(aqeKey, "false")
    try {
      def checkpointed(df: DataFrame): (DataFrame, Long) = {
        val cp = df.localCheckpoint(false)
        val n = cp.count()
        (if (n <= 100000) cp.coalesce(1) else cp, n)
      }
      var (frontier, n) = checkpointed(base)
      val deltas = scala.collection.mutable.ListBuffer.empty[DataFrame]
      var rounds = 0
      while (n > 0) {
        deltas += frontier
        if (rounds >= maxRounds)
          throw new IllegalStateException(
            s"recursiveUnionAll did not converge in $maxRounds rounds " +
              "(cyclic derivation? use recursiveUnion)")
        val (f2, n2) = checkpointed(step(frontier))
        frontier = f2; n = n2
        rounds += 1
      }
      if (deltas.isEmpty) frontier else deltas.reduce(_ union _)
    } finally s.conf.set(aqeKey, aqePrev)
  }

  /** the tiny-frontier kernel behind `recursiveUnionAll(kernelCap)`:
    * one bounded collect per round, LocalRelation frontiers. The
    * accumulated result is a union of LocalRelations — bounded by the
    * same rounds × cap the collects are. */
  private def recursiveUnionAllKernel(base: DataFrame,
                                      step: DataFrame => DataFrame,
                                      maxRounds: Int,
                                      kernelCap: Int): DataFrame = {
    val s = base.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqePrev = s.conf.get(aqeKey, "true")
    s.conf.set(aqeKey, "false")
    // limit+collect normally runs Spark's INCREMENTAL take (1 partition,
    // then 4x more, …) — several jobs per round for a sparse match. The
    // whole point of the kernel is one job per round: scan every
    // partition in the first take pass. Restored with AQE below.
    val takeKey = "spark.sql.limit.initialNumPartitions"
    // getOption: an unset key must be UNSET again afterwards, not
    // pinned to a copied default (r15 review)
    val takePrev = s.conf.getOption(takeKey)
    s.conf.set(takeKey, Int.MaxValue.toString)
    try {
      val schema = base.schema
      def localize(df: DataFrame, what: String): (DataFrame, Int) = {
        // limit(cap+1): the collect can never pull more than cap+1
        // rows no matter how wrong the caller's size estimate is
        val rows = df.limit(kernelCap + 1).collect()
        require(rows.length <= kernelCap,
          s"recursiveUnionAll kernel: $what exceeds kernelCap=$kernelCap " +
          "rows — raise the cap deliberately or drop kernelCap to run " +
          "the distributed form")
        (s.createDataFrame(
          java.util.Arrays.asList(rows: _*), schema), rows.length)
      }
      var (frontier, n) = localize(base, "the base")
      val deltas = scala.collection.mutable.ListBuffer.empty[DataFrame]
      var rounds = 0
      while (n > 0) {
        deltas += frontier
        if (rounds >= maxRounds)
          throw new IllegalStateException(
            s"recursiveUnionAll did not converge in $maxRounds rounds " +
              "(cyclic derivation? use recursiveUnion)")
        val (f2, n2) = localize(step(frontier), s"round $rounds's delta")
        frontier = f2; n = n2
        rounds += 1
      }
      if (deltas.isEmpty) frontier else deltas.reduce(_ union _)
    } finally {
      s.conf.set(aqeKey, aqePrev)
      takePrev match {
        case Some(v) => s.conf.set(takeKey, v)
        case None => s.conf.unset(takeKey)
      }
    }
  }
}
