package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structural decomposition of tpch_q5 at sf1 (r11 VERDICT order #7:
  * the largest non-maintenance TPC-H ratio — 7.0× at 1.00 s). Where
  * does the second go: the fact scan, the lineitem⋈orders shuffle
  * ladder, the dim broadcasts, or the final agg? Each stage forces the
  * SAME cents-kernel projection so deltas isolate the added operator.
  * Usage: runMain graft.Q5Probe [sfDir] */
object Q5Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val spark = SparkSession.builder()
      .master("local[6]")
      .config("spark.sql.shuffle.partitions", "6")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    def timed(tag: String)(f: => DataFrame): Unit = {
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val n = Bench.force(f)
        println(f"[q5probe] $tag rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
    }
    def sql(q: String) = spark.sql(q)
    val rev = """SELECT l_orderkey, l_suppkey,
                |  CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev4
                |FROM lineitem""".stripMargin
    timed("1_fact_scan")(sql(s"SELECT sum(rev4) AS s FROM ($rev)"))
    timed("2_join_orders")(sql(
      s"""SELECT sum(rev4) AS s FROM ($rev) l
         |JOIN orders ON l_orderkey = o_orderkey""".stripMargin))
    timed("3_join_customer")(sql(
      s"""SELECT sum(rev4) AS s FROM ($rev) l
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON c_custkey = o_custkey""".stripMargin))
    timed("4_join_dims")(sql(
      s"""SELECT sum(rev4) AS s FROM ($rev) l
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'AMERICA'""".stripMargin))
    timed("5_join_supplier_full")(sql(
      s"""SELECT sum(rev4) AS s FROM ($rev) l
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |WHERE r_name = 'AMERICA'""".stripMargin))
    timed("6_full_q5")(sql(
      s"""SELECT n_name,
         |  CAST(CAST(CAST(SUM(rev4) AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS revenue
         |FROM ($rev) l
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |WHERE r_name = 'AMERICA'
         |GROUP BY n_name ORDER BY revenue DESC NULLS LAST, n_name""".stripMargin))
    // alternative shape: push the region/nation filter into customer
    // FIRST (semi-join reduction), so orders⋈customer shrinks before
    // the fact shuffle; group by nationkey, attach n_name post-agg
    timed("7_prefiltered_alt")(sql(
      s"""WITH amer_cust AS (
         |  SELECT c_custkey, c_nationkey FROM customer
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'AMERICA'),
         |agg AS (
         |  SELECT c_nationkey, SUM(rev4) AS s4
         |  FROM ($rev) l
         |    JOIN orders ON l_orderkey = o_orderkey
         |    JOIN amer_cust ON c_custkey = o_custkey
         |    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  GROUP BY c_nationkey)
         |SELECT n_name,
         |  CAST(CAST(CAST(s4 AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS revenue
         |FROM agg JOIN nation ON c_nationkey = n_nationkey
         |ORDER BY revenue DESC NULLS LAST, n_name""".stripMargin))
    // ceiling probe: force-broadcast the region-reduced orders build
    // side (≈300k rows at sf1) so the FACT NEVER SHUFFLES — quantifies
    // what a size-gated runtime broadcast would buy. NOT the production
    // plan shape as a hint: at 100 TB the region-filtered orders set is
    // still enormous and a forced broadcast would be the scale-killer;
    // only an AQE-style measured switch could take this safely.
    timed("8_bcast_reduced_orders")(sql(
      s"""WITH amer_orders AS (
         |  SELECT o_orderkey, c_nationkey FROM orders
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'AMERICA'),
         |agg AS (
         |  SELECT /*+ BROADCAST(amer_orders) */ c_nationkey, SUM(rev4) AS s4
         |  FROM ($rev) l
         |    JOIN amer_orders ON l_orderkey = o_orderkey
         |    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  GROUP BY c_nationkey)
         |SELECT n_name,
         |  CAST(CAST(CAST(s4 AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS revenue
         |FROM agg JOIN nation ON c_nationkey = n_nationkey
         |ORDER BY revenue DESC NULLS LAST, n_name""".stripMargin))
    spark.stop()
  }
}
