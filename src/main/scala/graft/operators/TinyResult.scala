package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Global ordering for results KNOWN to be small (an aggregate over a
  * bounded group domain, a top-k, a metadata listing).
  *
  * A plain `.orderBy` plans Sort over a RangePartitioning exchange,
  * and building the range bounds runs a SAMPLING job over the sort's
  * child — re-executing everything above the last materialized
  * shuffle stage. When that child is an expensive final aggregate the
  * query silently pays for it twice: measured on the sf1 percentile
  * query, `.orderBy` over a 3-row aggregate added ~0.7 s (~60%) of
  * pure re-aggregation. A single-partition exchange sidesteps the
  * sampling entirely — SinglePartition satisfies OrderedDistribution,
  * so the in-partition sort IS the global sort and the child runs
  * once.
  *
  * Only for bounded results: every row lands on one task. The callers
  * in this library all sort outputs bounded by a group domain or an
  * explicit cap (the same bound that lets ExactPercentile collect its
  * histogram cells); a fact-sized sort must keep `.orderBy`.
  */
object TinyResult {
  /** globally ordered `df` without the range-sampling second
    * execution of df's plan; `df` must be small enough for one task */
  def globalSort(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)
}
