package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SortThroughProject: a global Sort over a deterministic projection
  * must plan as Project-over-Sort (one exchange, sampler reads raw
  * rows) exactly when the rewrite cannot inflate the shuffle or the
  * projection is provably expensive — and results must be unchanged,
  * including their order. */
class SortThroughProjectSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    graft.plans.SortThroughProject.install(s)
    s
  }

  // RDD-backed so ConvertToLocalRelation cannot fold the plan away
  private def base = {
    import spark.implicits._
    spark.createDataset(spark.sparkContext.parallelize(
      (0 until 5000).map(i => ((i * 7919) % 5000).toLong), 5)).toDF("k")
  }

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def pushed(df: org.apache.spark.sql.DataFrame): Boolean = {
    val p = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    p.collectFirst { case pr: Project if pr.child.isInstanceOf[Sort] => pr }.isDefined
  }

  test("expensive projection pushes and keeps the exact ordered result") {
    val q = base.select(col("k"), md5(col("k").cast("string")).as("h"),
        log10(col("k") + 1).as("l"))
      .orderBy("k")
    assert(pushed(q), optimized(q))
    val rows = q.collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 5000L).sorted)
    // values equal the unpushed formulation
    val plain = base.select(col("k"), md5(col("k").cast("string")).as("h"),
        log10(col("k") + 1).as("l")).collect()
      .sortBy(_.getLong(0)).toSeq
    assert(rows.toSeq == plain)
  }

  test("width-expanding cheap projection pushes (cannot inflate the shuffle)") {
    val q = base.select(col("k"), (col("k") + 1).as("a"), (col("k") * 2).as("b"),
        (col("k") % 7).as("c")).orderBy("k")
    assert(pushed(q), optimized(q))
  }

  test("width-shrinking cheap projection does NOT push") {
    import spark.implicits._
    val wide = spark.createDataset(spark.sparkContext.parallelize(
      (0 until 100).map(i => (i.toLong, "x" * 50, "y" * 50)), 2))
      .toDF("k", "s1", "s2")
    // length() is cheap and the output (two longs) is narrower than
    // the strings it reads: pushing would shuffle the strings for no
    // recompute win
    val q = wide.select(col("k"), (length(col("s1")) + length(col("s2"))).as("n"))
      .orderBy("k")
    assert(!pushed(q), optimized(q))
  }

  test("ORDER BY a computed alias does not push") {
    val q = base.select(col("k"), md5(col("k").cast("string")).as("h")).orderBy("h")
    assert(!pushed(q), optimized(q))
  }

  test("nondeterministic projection does not push") {
    val q = base.select(col("k"), (rand(1) + log10(col("k") + 1)).as("r")).orderBy("k")
    assert(!pushed(q), optimized(q))
  }

  test("pure column selection does not churn the plan") {
    val q = base.select(col("k")).orderBy("k")
    assert(!pushed(q), optimized(q))
  }
}
