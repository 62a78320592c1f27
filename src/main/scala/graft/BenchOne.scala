package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: time individual SparkEntry queries.
  * Usage: runMain graft.BenchOne <sfDir> <query>... */
object BenchOne extends App {
  val sfDir = args(0)
  // same host-throttle-aware sizing as graft.Bench (local[6] default)
  val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "6")
  val spark = SparkSession.builder().master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  graft.Tables.names.foreach(n => graft.Tables.t(spark, sfDir, n).count())
  SparkEntry.queries  // init suites so their datasets register first
  graft.queries.VortexQueries.materializeAll(spark, sfDir)
  args.drop(1).foreach { name =>
    val fn = SparkEntry.queries(name)
    (0 until 2).foreach { r =>
      val t0 = System.nanoTime()
      val n = Bench.force(fn(spark, sfDir))
      println(f"[bench1] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
  }
  spark.stop()
}
