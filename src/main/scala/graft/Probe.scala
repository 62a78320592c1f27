package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (round-5 perf work): per-phase timing of a
  * named SparkEntry query — DataFrame build, analysis+optimization,
  * physical planning, execution — to locate the fixed per-query
  * overhead the tiny-input bench rows pay. Not part of the product. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "6")
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_PROBE_CONF").foreach(_.split(",").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b = b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.names.foreach(n => graft.Tables.t(spark, sfDir, n).count())
    SparkEntry.queries  // init suites so their datasets register first
    graft.queries.VortexQueries.materializeAll(spark, sfDir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val schedDelayMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null && t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          schedDelayMs.addAndGet(
            t.taskInfo.finishTime - t.taskInfo.launchTime - t.taskMetrics.executorRunTime)
        }
      }
    })
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = ms(t0)
        val t1 = System.nanoTime()
        df.queryExecution.optimizedPlan // analysis + optimization
        val tOpt = ms(t1)
        val t2 = System.nanoTime()
        df.queryExecution.sparkPlan // strategy application
        val tStrat = ms(t2)
        val t2b = System.nanoTime()
        df.queryExecution.executedPlan // preparations (EnsureRequirements, codegen collapse, subqueries)
        val tPrep = ms(t2b)
        val t2c = System.nanoTime()
        val rdd = df.queryExecution.toRdd // doExecute: codegen source gen + compile + RDD graph
        val tPhys = ms(t2c)
        val t3 = System.nanoTime()
        val n = rdd.mapPartitions { it =>
          var c = 0L; while (it.hasNext) { it.next(); c += 1 }; Iterator.single(c)
        }.fold(0L)(_ + _)
        val tExec = ms(t3)
        Thread.sleep(300) // let listener events drain
        println(f"PROBE $name rep$rep build=$tBuild%.0fms opt=$tOpt%.0fms strat=$tStrat%.0fms prep=$tPrep%.0fms rdd=$tPhys%.0fms exec=$tExec%.0fms rows=$n " +
          s"jobs=${jobs.getAndSet(0)} stages=${stages.getAndSet(0)} tasks=${tasks.getAndSet(0)} " +
          s"taskMs=${taskMs.getAndSet(0)} schedMs=${schedDelayMs.getAndSet(0)}")
        Thread.sleep(1700)
      }
    }
    spark.stop()
  }
}
