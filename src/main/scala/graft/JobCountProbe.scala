package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger

/** Dev utility: count jobs/stages/tasks of one warm query execution.
  * Usage: runMain graft.JobCountProbe <sfDir> <query>... */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[6]")
      .config("spark.sql.shuffle.partitions", 6)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger; val stages = new AtomicInteger; val tasks = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    graft.Tables.names.foreach(n => graft.Tables.t(spark, args(0), n).count())
    SparkEntry.queries
    graft.queries.VortexQueries.materializeAll(spark, args(0))
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries(name)
      Bench.force(fn(spark, args(0))) // warm
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      Bench.force(fn(spark, args(0)))
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[jobs] $name ${dt}%.3f s jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
    }
    spark.stop()
  }
}
