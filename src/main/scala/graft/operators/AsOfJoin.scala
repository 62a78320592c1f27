package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join (reference parity: DuckDB `ASOF JOIN`, SURVEY.md §2.3
  * J7 — engine-inherited there, composed from Spark built-ins here).
  *
  * `backward`: for each left row, the single right row with the
  * greatest `rightTime <= leftTime` among equi-key matches (ties
  * broken by `tieBreak` descending, so results are deterministic —
  * DuckDB's ASOF leaves the tie choice undefined).
  *
  * Plan shape at scale: one shuffle on the equi key for the range
  * join, then a per-left-row window (groups = candidate matches, small
  * when the time filter is selective). A dedicated sort-merge as-of
  * SparkPlan is the next refinement if candidate fan-out ever
  * dominates.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               tieBreak: String,
               payload: Seq[String]): DataFrame = {
    val l = left.withColumn("__asof_id", monotonically_increasing_id())
    val joined = l.join(right,
      l(leftKey) === right(rightKey) && right(rightTime) <= l(leftTime), "left")
    val w = Window.partitionBy(col("__asof_id"))
      .orderBy(right(rightTime).desc_nulls_last, right(tieBreak).desc_nulls_last)
    joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
      .drop("__asof_id")
      .select(left.columns.map(l(_)) ++ payload.map(right(_)): _*)
  }
}
