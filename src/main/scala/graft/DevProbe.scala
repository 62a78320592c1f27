package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timing probe for pipeline pieces (not part of the library
  * surface; invoked manually while performance-tuning). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf1")
    val spark = SparkSession.builder().master("local[6]")
      .config("spark.sql.shuffle.partitions", "6")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.t(spark, sfDir, n).count())
    Tables.registerAll(spark, sfDir)
    def run(nm: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (0 until 2).foreach(_ => Bench.force(mk))
      val best = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); Bench.force(mk); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[sweep] $nm%-16s $best%.3f s")
    }
    val q3alt = """WITH lrev AS (
      |  SELECT l_orderkey, SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev4
      |  FROM lineitem WHERE l_shipdate > TIMESTAMP '2000-03-15 00:00:00'
      |  GROUP BY l_orderkey)
      |SELECT l_orderkey,
      |  CAST(CAST(CAST(rev4 AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS revenue,
      |  CAST(o_orderdate AS DATE) AS odate
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lrev ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
      |ORDER BY revenue DESC NULLS LAST, l_orderkey LIMIT 20""".stripMargin
    val q12alt = """SELECT /*+ SHUFFLE_HASH(orders) */ l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > o_orderdate
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    run("q3-cur") { SparkEntry.queries("tpch_q3_shipping")(spark, sfDir) }
    run("q3-preagg") { spark.sql(q3alt) }
    run("q12-cur") { SparkEntry.queries("tpch_q12_shipmode")(spark, sfDir) }
    run("q12-shufhash") { spark.sql(q12alt) }
    spark.stop()
  }
}
