package graft
import org.apache.spark.sql.SparkSession
/** Scratch A/B: where does the s3_vortex_write row-path time go. */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[6]")
      .config("spark.sql.shuffle.partitions", 6)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args(0)
    val base = Tables.t(spark, d, "orders")
    def variant(name: String, exprs: Seq[String]): Unit = {
      val df = base.selectExpr(exprs: _*)
      // warm once, then time 2 reps
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        graft.sources.vortex.VortexBulkCopy.copy(df, s"/tmp/wp_$name")
        val dt = (System.nanoTime() - t0) / 1e9
        if (rep > 1) println(f"[write] $name rep$rep $dt%.3f s")
      }
    }
    val full = Seq("o_orderkey",
      "CAST(o_orderkey AS DECIMAL(20,0)) AS c_ubig",
      "CAST(o_orderkey % 128 AS TINYINT) AS c_byte",
      "CAST(o_orderkey % 32000 AS SMALLINT) AS c_short",
      "CAST(o_orderkey AS INT) AS c_int",
      "CAST(o_totalprice AS DECIMAL(18,2)) AS c_dec",
      "CAST(o_totalprice AS FLOAT) AS c_float",
      "o_totalprice AS c_double",
      "o_orderstatus AS c_str",
      "CAST(o_orderdate AS DATE) AS c_date",
      "o_orderdate AS c_ts",
      "CAST(o_orderkey % 2 = 0 AS BOOLEAN) AS c_bool")
    variant("full", full)
    variant("noubig", full.filterNot(_.contains("c_ubig")))
    variant("nostr", full.filterNot(_.contains("c_str")))
    variant("numonly", full.filterNot(e => e.contains("c_ubig") || e.contains("c_str")))
    // where does the time go: scan+cast only (no write), and the same
    // write with the input split across tasks
    locally {
      val df = base.selectExpr(full: _*)
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val n = Bench.force(df)
        val dt = (System.nanoTime() - t0) / 1e9
        if (rep > 1) println(f"[write] scanonly rep$rep $dt%.3f s ($n rows)")
      }
      val df6 = df.repartition(6)
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        graft.sources.vortex.VortexBulkCopy.copy(df6, "/tmp/wp_par6")
        val dt = (System.nanoTime() - t0) / 1e9
        if (rep > 1) println(f"[write] par6 rep$rep $dt%.3f s")
      }
      // task count of the plain write path
      println(s"[write] input partitions = ${df.queryExecution.toRdd.getNumPartitions}")
    }
    spark.stop()
  }
}
