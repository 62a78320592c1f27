package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timing probe for pipeline pieces (not part of the library
  * surface; invoked manually while performance-tuning). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[6]")
      .config("spark.sql.shuffle.partitions", "6")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("d_decontaminate")(spark, sfDir)
    df.collect().foreach(r => println(s"[res] ${r.getLong(0)},${r.getLong(1)}"))
    spark.stop()
  }
}
