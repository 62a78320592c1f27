package graft
object ExplainOne extends App {
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  args.drop(1).foreach { name =>
    println(s"==== $name ====")
    println(SparkEntry.queries(name)(spark, args(0)).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
  }
  spark.stop()
}
