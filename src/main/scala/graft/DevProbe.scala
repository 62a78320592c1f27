package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "10")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t("warm: lineitem count")(Tables.t(spark, sfDir, "lineitem").count())

    val li = Tables.t(spark, sfDir, "lineitem")
    t("extent-style agg")(li.groupBy("l_returnflag")
      .agg(count("l_quantity"), min("l_quantity"), max("l_quantity"),
           count("l_extendedprice"), min("l_extendedprice"), max("l_extendedprice"))
      .collect())

    val q1 = SparkEntry.queries("q_percentile")(spark, sfDir)
    t("q_percentile force#1")(println("  rows=" + Bench.force(q1)))
    val q2 = SparkEntry.queries("q_percentile")(spark, sfDir)
    t("q_percentile force#2")(println("  rows=" + Bench.force(q2)))
    spark.stop()
  }
}
