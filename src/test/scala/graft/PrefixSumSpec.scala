package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PrefixSum.groupedCumSum (bucketed two-phase prefix decomposition)
  * must return exactly what the single-window
  * `sum(v) OVER (PARTITION BY g ORDER BY o ROWS UNBOUNDED PRECEDING)`
  * returns — including on the shape it exists FOR: one giant group
  * that dominates the corpus and would serialize the window into a
  * single task, split across many buckets. */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def compare(df: org.apache.spark.sql.DataFrame, buckets: Int): Unit = {
    val w = Window.partitionBy("g").orderBy("o")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(w))
      .select("g", "o", "v", "cum").orderBy("g", "o")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val got = operators.PrefixSum.groupedCumSum(df, "g", "o", "v", "cum", buckets)
      .select("g", "o", "v", "cum").orderBy("g", "o")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.size == want.size)
    assert(got == want)
  }

  test("skewed: one giant group + tiny groups, many buckets") {
    import spark.implicits._
    // group "big" has 20k rows (the TB-sized-source stand-in); "s1"/"s2"
    // are tiny; order keys interleave so every bucket holds all groups
    val rows = (0L until 20000L).map(i => ("big", i, i % 7 + 1)) ++
      (0L until 50L).map(i => ("s1", i * 400L, i + 1)) ++
      (0L until 3L).map(i => ("s2", i * 9000L, 1000L + i))
    val df = rows.toDF("g", "o", "v").repartition(8)
    compare(df, buckets = 16)
  }

  test("more buckets than distinct order values (degenerate bounds)") {
    import spark.implicits._
    val df = (0L until 10L).map(i => ("g" + (i % 2), i % 3, i + 1))
      .toDF("g", "o", "v")
    // approxQuantile bounds collapse to <3 distinct values; dedup must
    // keep the bucketing valid (ties share a bucket, cumsum still exact
    // up to tie order — use distinct o per group to make it exact)
    val df2 = (0L until 10L).map(i => ("g" + (i % 2), i, i + 1)).toDF("g", "o", "v")
    compare(df2, buckets = 64)
    assert(operators.PrefixSum.groupedCumSum(df, "g", "o", "v", "cum", 64)
      .count() == 10)
  }

  test("single bucket degenerates to the plain window") {
    import spark.implicits._
    val df = (0L until 100L).map(i => ("g" + (i % 5), i, i)).toDF("g", "o", "v")
    compare(df, buckets = 1)
  }

  private def compareRanked(df: org.apache.spark.sql.DataFrame, buckets: Int): Unit = {
    val w = Window.orderBy(col("c").desc, col("tok").asc)
    val want = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("rk", "tok", "c", "cum").orderBy("rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val got = operators.PrefixSum.rankedCumSumDesc(df, "c", "tok", "c", "rk", "cum", buckets)
      .select("rk", "tok", "c", "cum").orderBy("rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.size == want.size)
    assert(got == want)
  }

  test("rankedCumSumDesc: zipfian counts with heavy ties, many buckets") {
    import spark.implicits._
    // zipf-ish head plus a long tail of count-1 ties (the vocab shape);
    // every tie class must resolve identically to the global window
    val rows = (0 until 40).map(i => (f"head$i%03d", (4000L / (i + 1)))) ++
      (0 until 5000).map(i => (f"tail$i%05d", 1L + i % 3))
    compareRanked(rows.toDF("tok", "c"), buckets = 32)
    compareRanked(rows.toDF("tok", "c"), buckets = 1)
  }

  test("rankedCumSumDesc: null ord rows rank last, like the global window") {
    import spark.implicits._
    // the single-window `ord DESC` is NULLS LAST: null-ord rows must
    // come after every non-null bucket, ordered by the tie column
    val rows: Seq[(String, Option[Long], Long)] =
      (0 until 200).map(i => (f"t$i%04d", Some((i % 17).toLong), 1L + i % 3)) ++
        Seq(("n_b", None, 5L), ("n_a", None, 2L), ("n_c", None, 7L))
    val df = rows.toDF("tok", "o", "v")
    val w = Window.orderBy(col("o").desc, col("tok").asc)
    val want = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("rk", "tok", "cum").orderBy("rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val got = operators.PrefixSum.rankedCumSumDesc(df, "o", "tok", "v", "rk", "cum", 16)
      .select("rk", "tok", "cum").orderBy("rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want)
    // the nulls are the last three ranks, tie-ordered
    assert(got.takeRight(3).map(_._2) == Seq("n_a", "n_b", "n_c"))
  }
}
