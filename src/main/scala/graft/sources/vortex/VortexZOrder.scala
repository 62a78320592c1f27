package graft.sources.vortex

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr
import graft.functions.ZValue

/** Z-order clustered writes: range-partition + sort the frame by the
  * [[graft.functions.ZValue]] Morton key of the chosen columns before
  * the vortex write, so every keyed column's per-chunk min/max is
  * narrow — multi-dimensional zone-map pruning with ZERO read-side
  * change (the scan's existing tier-2/3 stats pruning does the rest).
  *
  * Why not a writer option: DSv2's RequiresDistributionAndOrdering can
  * only request orderings over column/transform expressions the
  * connector API can name — a computed bit-interleave key is not one —
  * so the clustering sort has to happen in the query plan above the
  * write. This helper pins the exact plan shape: one range shuffle on
  * the key (scales with data, not file count), an in-partition sort,
  * and the ordinary vortex write; at 1000 executors each task writes
  * one z-contiguous file.
  *
  * The clustering column set is free to differ from (and usually
  * should complement) the partition layout: partition by coarse keys
  * (date), z-order within by the query's point/range columns.
  */
object VortexZOrder {

  /** write `df` to `path` clustered by the Z-order of `cols` (2–8
    * columns of integral/date/timestamp/float/double/string/decimal≤18
    * type). `numFiles` bounds output file count (0 → session shuffle
    * parallelism); extra writer options (chunkRows, bloomFilters, …)
    * pass through. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
                    numFiles: Int = 0,
                    options: Map[String, String] = Map.empty,
                    mode: String = "overwrite"): Unit = {
    require(cols.size >= 2 && cols.size <= 8,
      s"z-order takes 2 to 8 columns, got ${cols.size}")
    ZValue.register(df.sparkSession)
    val zc = expr(cols.map(c => s"`$c`").mkString("z_value(", ", ", ")"))
    val n = if (numFiles > 0) numFiles
            else df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(n, zc)
      .sortWithinPartitions(zc)
      .write.format("vortex").options(options).mode(mode).save(path)
  }
}
