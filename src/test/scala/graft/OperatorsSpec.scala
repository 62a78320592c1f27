package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, SkewJoin}

class OperatorsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("salted equi join equals the plain join result under skew") {
    import spark.implicits._
    // heavily skewed: 90% of rows share key 1
    val skewed = spark.range(0, 10000)
      .selectExpr("CASE WHEN id % 10 < 9 THEN 1 ELSE id END AS k", "id AS v")
    val small = Seq((1L, "hot"), (15L, "cold"), (25L, "cold")).toDF("sk", "name")
    val plain = skewed.join(small, $"k" === $"sk").groupBy("name").count()
    val salted = SkewJoin.saltedEquiJoin(skewed, small, "k", "sk")
      .groupBy("name").count()
    assert(salted.orderBy("name").collect().toSeq == plain.orderBy("name").collect().toSeq)
  }

  test("salted two-phase aggregation equals plain groupBy") {
    val df = spark.range(0, 20000).selectExpr("id % 3 AS k", "CAST(id AS DOUBLE) AS x")
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("x").as("sum_x"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val salted = SkewJoin.saltedCountSum(df, "k", "x")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(plain.zip(salted).forall { case ((k1, n1, s1), (k2, n2, s2)) =>
      k1 == k2 && n1 == n2 && math.abs(s1 - s2) < 1e-6 })
  }

  test("as-of backward join picks latest right row at-or-before left time") {
    import spark.implicits._
    val quotes = Seq(
      (1L, 100L, 10.0), (1L, 200L, 11.0), (1L, 300L, 12.0),
      (2L, 150L, 20.0)).toDF("qk", "qt", "px")
    val trades = Seq((1L, 250L), (1L, 90L), (2L, 1000L), (3L, 500L))
      .toDF("tk", "tt")
    val out = AsOfJoin.backward(trades, quotes,
        leftKey = "tk", rightKey = "qk", leftTime = "tt", rightTime = "qt",
        tieBreak = "qt", payload = Seq("qt", "px"))
      .orderBy("tk", "tt").collect().map(_.toSeq)
    assert(out.toSeq == Seq(
      Seq(1L, 90L, null, null),        // before first quote
      Seq(1L, 250L, 200L, 11.0),       // latest quote ≤ 250
      Seq(2L, 1000L, 150L, 20.0),
      Seq(3L, 500L, null, null)))      // key with no quotes
  }
}
