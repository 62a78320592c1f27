package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles (≡ SQL `percentile` /
  * DuckDB `quantile_cont`) computed scale-out: distributed histogram +
  * targeted bucket fetch, instead of buffering a whole group's values
  * in one task (built-in `percentile`) or sorting each group on one
  * task (window `row_number` with few groups).
  *
  * Plan — TWO full passes in the common case: (A) per-(group, bucket)
  * count/min/max over the ORDER-PRESERVING bit grid
  * ([[graft.functions.DoubleSortableBits]] >> 44 — data-independent,
  * so no extent scan precedes it; group totals and rank→bucket routing
  * both fall out of this single aggregate); (B) fetch only the buckets
  * that contain a target rank (expected n/cells values each).
  * Single-valued buckets (min==max) resolve with no fetch, so
  * heavy-hitter skew costs nothing; an oversized mixed bucket
  * re-buckets recursively within its range on an equi-width grid. All
  * distributed passes are broadcast-join + codegen expressions (no
  * Scala UDF on the hot path). At 100 TB: two narrow scans, no
  * group-sized task state anywhere. Driver state is
  * O(groups·non-empty cells) — ~256 cells per power of two the data
  * actually spans; fine up to ~10⁵ groups, beyond that shard the
  * group domain across calls.
  *
  * Multiple value columns share every pass: [[computeMulti]] stacks
  * (group, column, value) into one frame, so N columns still cost one
  * extent scan + one histogram scan, not N of each.
  *
  * Determinism: ranks are exact integers and the returned lo/hi values
  * are exact data values, so the interpolated result is independent of
  * partitioning; interpolation uses the same double expression as
  * quantile_cont: v_lo + (v_hi − v_lo)·(h − ⌊h⌋), h = (n−1)·p.
  */
object ExactPercentile {

  private case class Need(g: String, ranks: Seq[Long], lo: Double, hi: Double,
                          startRank: Long, count: Long)

  /** Core solver over a (g: string, v: double, v non-null) frame:
    * for every group g present, the interpolated percentile for each
    * p in psOf(g). */
  private def solve(base: DataFrame, psOf: String => Seq[Double],
                    buckets: Int, fetchCap: Int, maxDriverCells: Int): Map[(String, Double), Double] = {
    val spark = base.sparkSession
    import spark.implicits._
    graft.functions.DoubleSortableBits.register(spark)

    // (A) ONE pass: per-(group, bit bucket) count/min/max on the
    // ORDER-PRESERVING bit grid (double_sortable_bits >> 44 ≈ 256
    // cells per power of two — data-independent, so no extent scan is
    // needed first; an equi-width grid would cost one more full scan
    // to learn [min, max]). Bucket-id order == value order, so group
    // totals AND rank→bucket routing both come out of this pass.
    // Driver state is O(groups · non-empty cells); real data spans a
    // few dozen powers of two → thousands of cells, not millions.
    // Guard: the contract "fine to ~1e5 groups, then shard the group
    // domain" is enforced, not assumed — limit(cap+1) bounds what can
    // ever land on the driver, and cap+1 rows fails fast instead of
    // OOMing on a 1e7-group call.
    val cellRows = base
      .groupBy(col("g"), expr("double_sortable_bits(v) >> 44").as("bk"))
      .agg(count("v").as("c"), min("v").as("mn"), max("v").as("mx"))
      .limit(maxDriverCells + 1)
      .collect()
    require(cellRows.length <= maxDriverCells,
      s"ExactPercentile: more than $maxDriverCells (group, bucket) histogram cells — " +
      "shard the group domain across calls or raise maxDriverCells")
    val cells: Map[String, Array[Row]] = cellRows.groupBy(_.getString(0))

    def targetRanks(g: String, n: Long): Seq[Long] =
      psOf(g).flatMap { p => val h = (n - 1) * p
        Seq(math.floor(h).toLong, math.ceil(h).toLong) }.distinct.sorted

    val nOf: Map[String, Long] =
      cells.map { case (g, rows) => g -> rows.map(_.getLong(2)).sum }

    val resolved = scala.collection.mutable.Map[(String, Long), Double]()
    var work: List[Need] = cells.toList.flatMap { case (g, rows) =>
      val ordered = rows.sortBy(_.getLong(1))
      var cum = 0L
      val pending = scala.collection.mutable.Queue(targetRanks(g, nOf(g)): _*)
      val needs = scala.collection.mutable.ListBuffer[Need]()
      ordered.foreach { cell =>
        val c = cell.getLong(2); val bmn = cell.getDouble(3); val bmx = cell.getDouble(4)
        val mine = scala.collection.mutable.ListBuffer[Long]()
        while (pending.nonEmpty && pending.head < cum + c) mine += pending.dequeue()
        if (mine.nonEmpty) needs += Need(g, mine.toSeq, bmn, bmx, cum, c)
        cum += c
      }
      needs.toList
    }

    while (work.nonEmpty) {
      // degenerate ranges (all values equal) resolve with no I/O
      val (flat, mixed0) = work.partition(r => r.lo == r.hi)
      flat.foreach(r => r.ranks.foreach(k => resolved((r.g, k)) = r.lo))
      // small mixed ranges: fetch values directly; large: histogram
      val (small, mixed) = mixed0.partition(_.count <= fetchCap)

      if (small.nonEmpty) {
        // (C) targeted fetch — broadcast the needed (group, range) list
        val rdf = small.zipWithIndex
          .map { case (r, i) => (r.g, r.lo, r.hi, i) }.toDF("g", "lo", "hi", "ridx")
        val vals = base.join(broadcast(rdf), Seq("g"))
          .where($"v" >= $"lo" && $"v" <= $"hi")
          .select($"ridx", $"v").collect()
          .groupBy(_.getInt(0))
        small.zipWithIndex.foreach { case (r, i) =>
          val sorted = vals.getOrElse(i, Array.empty[Row]).map(_.getDouble(1)).sorted
          r.ranks.foreach { k => resolved((r.g, k)) = sorted((k - r.startRank).toInt) }
        }
      }

      work =
        if (mixed.isEmpty) Nil
        else {
          // (B) histogram all pending ranges in one pass
          val nb = buckets
          val rdf = mixed.zipWithIndex
            .map { case (r, i) => (r.g, r.lo, r.hi, i) }.toDF("g", "lo", "hi", "ridx")
          val hist = base.join(broadcast(rdf), Seq("g"))
            .where($"v" >= $"lo" && $"v" <= $"hi")
            .withColumn("bk",
              least(lit(nb - 1), floor(($"v" - $"lo") / ($"hi" - $"lo") * nb).cast("int")))
            .groupBy($"ridx", $"bk")
            .agg(count("v").as("c"), min("v").as("bmn"), max("v").as("bmx"))
            .collect().groupBy(_.getInt(0))
          val next = scala.collection.mutable.ListBuffer[Need]()
          mixed.zipWithIndex.foreach { case (rng, idx) =>
            val cells = hist.getOrElse(idx, Array.empty[Row]).sortBy(_.getInt(1))
            var cum = rng.startRank
            val pending = scala.collection.mutable.Queue(rng.ranks: _*)
            cells.foreach { cell =>
              val c = cell.getLong(2); val bmn = cell.getDouble(3); val bmx = cell.getDouble(4)
              val mine = scala.collection.mutable.ListBuffer[Long]()
              while (pending.nonEmpty && pending.head < cum + c) mine += pending.dequeue()
              if (mine.nonEmpty) next += Need(rng.g, mine.toSeq, bmn, bmx, cum, c)
              cum += c
            }
          }
          next.toList
        }
    }

    nOf.flatMap { case (g, n) =>
      psOf(g).map { p =>
        val h = (n - 1) * p
        val lo = resolved((g, math.floor(h).toLong))
        val hi = resolved((g, math.ceil(h).toLong))
        (g, p) -> (lo + (hi - lo) * (h - math.floor(h)))
      }
    }
  }

  /** Returns one row per group: (groupCol: string, <names(i)>: double).
    * Null values are ignored (SQL aggregate semantics); groups with no
    * non-null values are omitted. */
  def compute(df: DataFrame, groupCol: String, valueCol: String,
              ps: Seq[Double], names: Seq[String],
              buckets: Int = 4096, fetchCap: Int = 1 << 17,
              materialize: Boolean = true): DataFrame =
    computeMulti(df, groupCol, Seq((valueCol, ps, names)), buckets, fetchCap, materialize)

  /** Size-gated dispatch (the dedup-kernel pattern): inputs that
    * provably fit one task's memory per group use
    * [[graft.functions.PercentileBuf]] — one hash-aggregate pass over
    * primitive buffers, no histogram rounds — while anything larger
    * (or maxSmallRows = 0, the at-scale setting) takes the distributed
    * histogram path whose per-task state never grows with group size.
    *
    * The gate reads Catalyst's plan statistics (zero extra jobs): the
    * small path needs `rowCount ≤ maxSmallRows` when the optimizer
    * knows the row count, else `sizeInBytes ≤ maxSmallBytes` —
    * sizeInBytes counts EVERY column's raw bytes while the buffers
    * hold only the projected value doubles, so the byte bound
    * over-estimates and errs toward the scale-safe path.
    *
    * maxSmallRows default: the buffers hold each spec's non-null
    * values as primitive doubles, so the WORST case (every row in one
    * group, in one final task) is rows × 8 B per spec — 16M rows =
    * 128 MB/spec, comfortably inside a multi-GB task budget even with
    * grow-copy slack. (The previous 2M default was 10× more
    * conservative than the memory it guards: at ~6M input rows it
    * pushed a fits-in-memory input onto the 2-scan histogram path,
    * measured 36% slower at sf1.)
    *
    * `materialize` (histogram path only): None = decide from the
    * input plan — persist the stacked frame only when re-computing it
    * per solver pass repeats EXPENSIVE work (a join, aggregate,
    * window or generator upstream). For a bare (possibly
    * filtered/projected) scan, re-reading the column-pruned files
    * beats caching: measured at sf1/6 threads, persisting the 12M-row
    * stacked frame made the histogram path 40%+ SLOWER than two
    * pruned re-scans. */
  def computeMultiAuto(df: DataFrame, groupCol: String,
                       specs: Seq[(String, Seq[Double], Seq[String])],
                       maxSmallRows: Int = 16000000,
                       buckets: Int = 4096, fetchCap: Int = 1 << 17,
                       materialize: Option[Boolean] = None,
                       maxDriverCells: Int = 1 << 21,
                       maxSmallBytes: Long = 256L << 20): DataFrame = {
    val stats = df.queryExecution.optimizedPlan.stats
    val small = maxSmallRows > 0 &&
      stats.rowCount.map(_ <= BigInt(maxSmallRows))
        .getOrElse(stats.sizeInBytes <= BigInt(maxSmallBytes))
    if (small) {
      graft.functions.PercentileBuf.register(df.sparkSession)
      val aggs = specs.zipWithIndex.map { case ((vc, ps, _), i) =>
        expr(s"percentile_buf(CAST(`$vc` AS DOUBLE), array(${ps.mkString("d,")}d))")
          .as(s"arr_$i")
      }
      val out = df.groupBy(col(groupCol).cast("string").as(groupCol))
        .agg(aggs.head, aggs.tail: _*)
      val cols = col(groupCol) +: specs.zipWithIndex.flatMap { case ((_, _, names), i) =>
        names.zipWithIndex.map { case (n, j) => element_at(col(s"arr_$i"), j + 1).as(n) } }
      // inner semantics: a group appears only if every spec resolved
      out.select(cols: _*).na.drop(specs.flatMap(_._3))
    } else {
      val mat = materialize.getOrElse(isExpensiveToRecompute(df))
      computeMulti(df, groupCol, specs, buckets, fetchCap, mat, maxDriverCells)
    }
  }

  /** Does re-computing `df` repeat work beyond a (pruned, filtered)
    * scan? Joins, aggregates, windows and generators make each solver
    * re-read re-pay a shuffle or expansion — persist then; plain
    * scan pipelines re-read faster than they cache (measured, see
    * [[computeMultiAuto]]). */
  private def isExpensiveToRecompute(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Window | _: Generate |
           _: Distinct | _: Intersect | _: Except => true
      case _ => false
    }
  }

  /** Percentiles of SEVERAL value columns in the same passes: the
    * stacked (group, column, value) frame makes the extent and
    * histogram aggregates one scan each for ALL columns. `specs` is
    * (valueCol, ps, names) per column; output is one row per group
    * with every spec's names, columns in spec order. A group appears
    * only if every spec has at least one non-null value for it (inner
    * semantics, matching a multi-aggregate SQL GROUP BY over non-null
    * groups). */
  def computeMulti(df: DataFrame, groupCol: String,
                   specs: Seq[(String, Seq[Double], Seq[String])],
                   buckets: Int = 4096, fetchCap: Int = 1 << 17,
                   materialize: Boolean = true,
                   maxDriverCells: Int = 1 << 21): DataFrame = {
    require(specs.nonEmpty)
    specs.foreach { case (_, ps, names) =>
      require(ps.nonEmpty && ps.length == names.length)
      require(ps.forall(p => p >= 0.0 && p <= 1.0))
    }
    val spark = df.sparkSession

    // one frame: g = "<colIdx>|<group>", v = that column's value
    val stackExpr = s"stack(${specs.length}, " +
      specs.zipWithIndex.map { case (sp, i) => s"'$i', double_${i}" }.mkString(", ") +
      ") AS (cidx, v)"
    // `+ 0.0` normalizes -0.0 to +0.0: the sortable-bits grid puts the
    // two zeros in different buckets but the targeted fetch filters
    // numerically (-0.0 == 0.0), so un-normalized -0.0 rows would leak
    // into the +0 bucket's fetch and shift the rank index
    val projected = df.select(
        col(groupCol).cast("string").as("g0") +:
        specs.zipWithIndex.map { case (sp, i) =>
          (col(sp._1).cast("double") + lit(0.0)).as(s"double_$i") }: _*)
      .selectExpr("g0", stackExpr)
      .where(col("v").isNotNull)
      .select(concat(col("cidx"), lit("|"), col("g0")).as("g"), col("v"))
    // cache once when the input is an expensive pipeline (the
    // histogram solver makes 2+ passes); leave off for bare table
    // scans (column-pruned re-reads beat caching the stacked frame).
    // persist, NOT localCheckpoint: a localCheckpoint is an
    // unreliable lineage break — one executor loss makes the job
    // unrecoverable instead of recomputable — while an evicted or
    // lost persisted block recomputes from lineage. Callers with a
    // very expensive input and a configured
    // `spark.sparkContext.setCheckpointDir` can pre-checkpoint the
    // input reliably before calling.
    val base = if (materialize)
      projected.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else projected

    val psArr = specs.map(_._2).toArray
    val psOf: String => Seq[Double] = g => psArr(g.substring(0, g.indexOf('|')).toInt)
    val sol = try solve(base, psOf, buckets, fetchCap, maxDriverCells)
    finally { if (materialize) base.unpersist(false) }

    // assemble: per original group, all specs' values (inner semantics)
    val byGroup = sol.toSeq.groupBy { case ((g, _), _) =>
      g.substring(g.indexOf('|') + 1) }
    val out = byGroup.toSeq.sortBy(_._1).flatMap { case (g0, cells) =>
      val m = cells.map { case ((g, p), v) =>
        (g.substring(0, g.indexOf('|')).toInt, p) -> v }.toMap
      val vals = specs.zipWithIndex.flatMap { case ((_, ps, _), i) =>
        ps.map(p => m.get((i, p))) }
      if (vals.forall(_.isDefined)) Some(Row.fromSeq(g0 +: vals.map(_.get)))
      else None
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(groupCol, org.apache.spark.sql.types.StringType) +:
        specs.flatMap(_._3).map(n =>
          org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.DoubleType)))
    // output size is bounded by maxDriverCells but can still reach
    // millions of group rows — return it spread across the session's
    // parallelism (one slice per ~64k rows), not a one-partition tail
    // that would single-thread every downstream operator
    val slices = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, out.length / 65536 + 1))
    spark.createDataFrame(spark.sparkContext.parallelize(out.toList, slices), schema)
  }
}
