package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Distributed grouped running sum — the two-phase prefix
  * decomposition of
  * `sum(value) OVER (PARTITION BY grp ORDER BY ord ROWS UNBOUNDED
  * PRECEDING)`.
  *
  * The single-window form puts an ENTIRE group in one task: fine when
  * groups are numerous, a serialization wall when one group is
  * TB-sized (the token-budget mixing case — a handful of sources,
  * each huge). Classic fix (the same decomposition ExactPercentile
  * uses for rank routing): split each group into order-contiguous
  * buckets, cumsum locally per bucket, and add each bucket's
  * prefix offset (the sum of all earlier buckets of the same group).
  *
  * Phase structure, all Spark-native:
  *   1. one approxQuantile pass over `ord` → explicit bucket bounds;
  *   2. one partial-aggregate job → (bucket, grp, sum) — at most
  *      buckets × |groups| rows, collected to the driver (tiny by
  *      construction, NOT data-sized);
  *   3. exclusive prefix scan of those partials per group (driver,
  *      O(buckets × groups));
  *   4. final pass: local window per (bucket, grp) + broadcast-joined
  *      offset. Parallelism = buckets × groups instead of groups.
  *
  * Why explicit VALUE bounds instead of `spark_partition_id()` over a
  * `repartitionByRange`: the range exchange re-samples its bounds on
  * every execution (RangePartitioner seeds from the RDD id), so two
  * separate jobs can assign boundary rows to DIFFERENT partitions —
  * the partials job and the final job would silently disagree. A
  * bucket computed by comparing `ord` against literal bounds is a pure
  * function of the data: both jobs agree by construction, nothing
  * needs to be persisted or checkpointed between phases, and a lost
  * executor recomputes identically.
  *
  * Requirements: `value` must be integral (summed exactly as LONG);
  * `grp` must be non-null (group keys); ties in `ord` land in the same
  * bucket, so within-tie accumulation order matches the single-window
  * form's tie semantics.
  */
object PrefixSum {

  /** `df` plus column `cumName` = running sum of `value` per `grp` in
    * `ord` order. `buckets` defaults to the session shuffle
    * parallelism. */
  def groupedCumSum(df: DataFrame, grp: String, ord: String, value: String,
                    cumName: String, buckets: Int = 0): DataFrame = {
    val s = df.sparkSession
    val nb = math.max(1, if (buckets > 0) buckets
                         else s.sessionState.conf.numShufflePartitions)
    // Phase 1: deterministic order-contiguous bucketing. approxQuantile
    // is one pass; dedup+sort guards against degenerate bound lists on
    // low-cardinality ord. relativeError 0.01 only skews bucket
    // BALANCE, never correctness.
    val bounds: Array[Double] =
      if (nb == 1) Array.empty
      else df.stat.approxQuantile(ord, (1 until nb).map(_.toDouble / nb).toArray, 0.01)
        .distinct.sorted
    val bucketCol = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(ord) > lit(b), 1).otherwise(0)
    }
    val withB = df.withColumn("__bkt", bucketCol)

    // Phase 2+3: per-(bucket, group) sums → exclusive prefix offsets.
    // Bounded by buckets × |groups| — the whole point is that this is
    // tiny even when the DATA is 100 TB.
    val grpField = df.schema(grp)
    val partials: Array[Row] = withB
      .groupBy(col("__bkt"), col(grp))
      .agg(sum(col(value).cast(LongType)).as("__psum"))
      .collect()
    val offsets: Array[Row] = partials
      .groupBy(_.get(1)) // group key
      .iterator
      .flatMap { case (g, rows) =>
        var acc = 0L
        rows.sortBy(_.getInt(0)).map { r =>
          val off = acc
          acc += (if (r.isNullAt(2)) 0L else r.getLong(2))
          Row(r.getInt(0), g, off)
        }
      }
      .toArray
    val offSchema = StructType(Seq(
      StructField("__bkt", IntegerType, nullable = false),
      grpField.copy(name = grp),
      StructField("__off", LongType, nullable = false)))
    val offDf = s.createDataFrame(
      java.util.Arrays.asList(offsets: _*), offSchema)

    // Phase 4: local cumsum per (bucket, group) + broadcast offset.
    val w = Window.partitionBy(col("__bkt"), col(grp)).orderBy(col(ord))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .join(broadcast(offDf), Seq("__bkt", grp), "left")
      .withColumn(cumName,
        sum(col(value).cast(LongType)).over(w) + coalesce(col("__off"), lit(0L)))
      .drop("__bkt", "__off")
  }

  /** Global `(rank, running sum)` in `(ord DESC, tie ASC)` order
    * without the one-task global window — the frequency-table shape
    * (vocab coverage, heavy-hitter tails): rank and cumulative count
    * over a frame that can be 10M+ rows at production vocab sizes.
    *
    * Same discipline as [[groupedCumSum]]: explicit VALUE bounds on
    * `ord` (a pure function of the data, so every job agrees), one
    * tiny partials collect (buckets rows), local windows with the FULL
    * `(ord DESC, tie ASC)` tie-break, broadcast offsets. Ties on `ord`
    * share a bucket by construction (bucket = f(ord) only), so the
    * within-tie order is resolved entirely inside one local window —
    * the result is row-for-row identical to the single-window form.
    *
    * Returns `df` plus `rkName` (1-based global rank) and `cumName`
    * (inclusive running sum of `value`). `value` must be integral.
    */
  def rankedCumSumDesc(df: DataFrame, ord: String, tie: String, value: String,
                       rkName: String, cumName: String,
                       buckets: Int = 0): DataFrame = {
    val s = df.sparkSession
    val nb = math.max(1, if (buckets > 0) buckets
                         else s.sessionState.conf.numShufflePartitions)
    val bounds: Array[Double] =
      if (nb == 1) Array.empty
      else df.stat.approxQuantile(ord, (1 until nb).map(_.toDouble / nb).toArray, 0.01)
        .distinct.sorted
    // descending processing order: bucket 0 holds the LARGEST ord
    // values so offsets accumulate from bucket 0 upward. Null ord rows
    // get their own FINAL bucket — the single-window form's `ord DESC`
    // is NULLS LAST, so they must rank after every non-null bucket
    // (ordered among themselves by the tie column, same as the local
    // window does on an all-null bucket).
    val bucketCol = when(col(ord).isNull, lit(bounds.length + 1))
      .otherwise(bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(ord) <= lit(b), 1).otherwise(0)
      })
    val withB = df.withColumn("__bkt", bucketCol)
    val partials: Array[Row] = withB
      .groupBy(col("__bkt"))
      .agg(count(lit(1)).as("__n"), sum(col(value).cast(LongType)).as("__vsum"))
      .collect()
    var rkAcc = 0L; var cumAcc = 0L
    val offsets: Array[Row] = partials.sortBy(_.getInt(0)).map { r =>
      val (ro, co) = (rkAcc, cumAcc)
      rkAcc += r.getLong(1)
      cumAcc += (if (r.isNullAt(2)) 0L else r.getLong(2))
      Row(r.getInt(0), ro, co)
    }
    val offSchema = StructType(Seq(
      StructField("__bkt", IntegerType, nullable = false),
      StructField("__rkoff", LongType, nullable = false),
      StructField("__cumoff", LongType, nullable = false)))
    val offDf = s.createDataFrame(java.util.Arrays.asList(offsets: _*), offSchema)
    val w = Window.partitionBy(col("__bkt")).orderBy(col(ord).desc, col(tie).asc)
    withB
      .join(broadcast(offDf), Seq("__bkt"), "left")
      .withColumn(rkName, row_number().over(w).cast(LongType) + coalesce(col("__rkoff"), lit(0L)))
      .withColumn(cumName,
        sum(col(value).cast(LongType))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) +
          coalesce(col("__cumoff"), lit(0L)))
      .drop("__bkt", "__rkoff", "__cumoff")
  }
}
