package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val li = Tables.t(spark, sfDir, "lineitem")
    val specs = Seq(("l_quantity", Seq(0.5, 0.9), Seq("p50r", "p90r")),
                    ("l_extendedprice", Seq(0.25), Seq("p25r")))
    def run(nm: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (0 until 2).foreach(_ => Bench.force(mk))
      val best = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); Bench.force(mk); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[sweep] $nm%-24s $best%.3f s")
    }
    run("small-path") { graft.operators.ExactPercentile.computeMultiAuto(li, "l_returnflag", specs) }
    run("histogram")  { graft.operators.ExactPercentile.computeMultiAuto(li, "l_returnflag", specs, maxSmallRows = 0, maxSmallBytes = 0L) }
    spark.stop()
  }
}
