package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timing probe for pipeline pieces (not part of the library
  * surface; invoked manually while performance-tuning). */
object DevProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

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
    val rev = "CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))"

    val alt = s"""WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no, SUM($rev) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS revenue
      |FROM supplier JOIN
      |  (SELECT /*+ BROADCAST(m) */ supplier_no, total_revenue
      |   FROM revenue JOIN (SELECT MAX(total_revenue) AS mx FROM revenue) m
      |     ON total_revenue = mx) r ON s_suppkey = supplier_no
      |ORDER BY s_suppkey""".stripMargin
    (0 until 3).foreach { i =>
      t(s"q15-cur rep$i") { println(SparkEntry.queries("tpch_q15_top_supplier")(spark, sfDir).count()) }
      t(s"q15-alt rep$i") { println(spark.sql(alt).count()) }
    }
    println(spark.sql(alt).queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Scan") || l.contains("Join") || l.contains("Reused"))
      .mkString("\n"))
    spark.stop()
  }
}
