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
    val q10alt = """WITH lr AS (
      |  SELECT l_orderkey, SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev4
      |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey),
      |rev AS (
      |  SELECT o_custkey, SUM(rev4) AS rev4s
      |  FROM lr JOIN orders ON l_orderkey = o_orderkey GROUP BY o_custkey)
      |SELECT c_custkey, c_name,
      |  CAST(CAST(CAST(rev4s AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS revenue,
      |  CAST(CAST(CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DECIMAL(24,0)) / 100 AS DECIMAL(30,6)) AS DOUBLE) AS acctbal,
      |  n_name
      |FROM rev JOIN customer ON c_custkey = o_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY revenue DESC NULLS LAST, c_custkey LIMIT 20""".stripMargin
    // The registered j2_full IS the pre-agg form since f6f6ebb; the
    // alt here is the OLD group-by-after-join form, so the sweep still
    // measures the lever (cur should beat old, not tie it).
    val j2old = """SELECT coalesce(c_custkey, o_custkey) AS k, count(o_orderkey) AS n_o, count(c_name) AS n_c
      |FROM customer FULL JOIN orders ON c_custkey = o_custkey
      |GROUP BY coalesce(c_custkey, o_custkey) ORDER BY k""".stripMargin
    val a1old = """SELECT count(*) AS n, count(l_orderkey) AS n_key,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
      |  CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
      |FROM lineitem""".stripMargin
    run("a1-cur") { SparkEntry.queries("a1_agg_global")(spark, sfDir) }
    run("a1-decimal") { spark.sql(a1old) }
    val a4old = """SELECT CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sd,
      |       count(DISTINCT l_quantity) AS nd
      |FROM lineitem""".stripMargin
    val a6old = """SELECT coalesce(l_returnflag, '<ALL>') AS rf, coalesce(l_linestatus, '<ALL>') AS ls,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g1, CAST(GROUPING(l_linestatus) AS BIGINT) AS g2,
      |  count(*) AS n,
      |  CAST(CAST(CAST(SUM(qc) AS DECIMAL(24,0)) / 100 AS DECIMAL(30,6)) AS DOUBLE) AS sum_qty
      |FROM (SELECT l_returnflag, l_linestatus,
      |        CAST(round(l_quantity * 100) AS BIGINT) AS qc FROM lineitem) c
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY g1, g2, rf, ls""".stripMargin
    // negative result (kept as a note, probe removed): adding a
    // groupBy(o_custkey) stage between j8's orders join and the
    // customer join measured 1.53 s vs 1.39 s current at sf1 — the
    // extra shuffle costs more than the 1.5M->99k customer-join
    // shrink saves at this scale.
    run("a4sd-cur") { SparkEntry.queries("a4_sum_distinct")(spark, sfDir) }
    run("a4sd-old") { spark.sql(a4old) }
    run("a6roll-cur") { SparkEntry.queries("a6_rollup")(spark, sfDir) }
    run("a6roll-old") { spark.sql(a6old) }
    run("q10-cur") { SparkEntry.queries("tpch_q10_returns")(spark, sfDir) }
    run("q10-preagg") { spark.sql(q10alt) }
    run("j2full-cur") { SparkEntry.queries("j2_full")(spark, sfDir) }
    run("j2full-old") { spark.sql(j2old) }
    spark.stop()
  }
}
