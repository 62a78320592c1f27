package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** AS-OF join (reference parity: DuckDB `ASOF JOIN`, SURVEY.md §2.3
  * J7 — engine-inherited there, composed from Spark built-ins here).
  *
  * `backward`: for each left row, the single right row with the
  * greatest `rightTime <= leftTime` among equi-key matches (ties
  * broken by `tieBreak` descending, so results are deterministic —
  * DuckDB's ASOF leaves the tie choice undefined).
  *
  * Plan shape — the sort-merge as-of: both sides union-tagged into one
  * frame keyed by the equi key, ONE shuffle + ONE sort on
  * (key, time, side, tie), then a running `last(right-payload,
  * ignoreNulls)` carries the latest eligible right row forward into
  * each left row. No candidate fan-out (the old join+window shape
  * materialized every left×earlier-right pair), no synthetic row ids
  * (`monotonically_increasing_id` is recompute-sensitive under stage
  * retry / AQE re-planning). Work is O(|L|+|R| log) per key and the
  * single exchange is the theoretical minimum for an equi-keyed as-of.
  */
object AsOfJoin {

  /** minimal widening for the time axis across the two sides (mirrors
    * the comparison coercion Spark would apply in a join predicate) */
  private def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case _ if a == b => a
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case (DateType, TimestampNTZType) | (TimestampNTZType, DateType) => TimestampNTZType
    case (x, y) if Seq(x, y).forall(Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains) =>
      if (x.defaultSize >= y.defaultSize) x else y
    case (_: NumericType, _: NumericType) => DoubleType
    case _ => throw new IllegalArgumentException(s"as-of time types incomparable: $a vs $b")
  }

  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               tieBreak: String,
               payload: Seq[String]): DataFrame = {
    val tT = widen(left.schema(leftTime).dataType, right.schema(rightTime).dataType)
    val kT = left.schema(leftKey).dataType
    // null right keys/times can never match (SQL join semantics) and
    // must not be carried; null LEFT keys/times sort first in an empty
    // carry region and correctly surface null payloads.
    val r = right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(col(rightKey).cast(kT).as("__k"), col(rightTime).cast(tT).as("__t"),
        lit(0).as("__side"), col(tieBreak).as("__tie"),
        struct(payload.map(col): _*).as("__rp"))
    val l = left
      .select(col(leftKey).cast(kT).as("__k"), col(leftTime).cast(tT).as("__t"),
        lit(1).as("__side"), struct(left.columns.toIndexedSeq.map(col): _*).as("__lp"))
    // at equal time a right row is eligible (<=): side 0 sorts before 1;
    // among equal-time right rows the LAST carried is the max tieBreak.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc_nulls_first, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l, allowMissingColumns = true)
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(c => col("__lp").getField(c).as(c)) ++
              payload.map(p => col("__m").getField(p).as(p)): _*)
  }
}
