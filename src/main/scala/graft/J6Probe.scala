package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structural decomposition of j6_theta at sf1 (r10 VERDICT order #7):
  * where do the ~2.1 s go — aggregation, range-sampler re-execution,
  * or the ordered dump? Usage: runMain graft.J6Probe [sfDir] */
object J6Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val spark = SparkSession.builder()
      .master("local[6]")
      .config("spark.sql.shuffle.partitions", "6")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(tag: String)(f: => DataFrame): Unit = {
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val n = Bench.force(f)
        println(f"[j6probe] $tag rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
    }
    val li = Tables.t(spark, sfDir, "lineitem")
    def aggPipe = li.select(col("l_orderkey"), col("l_linenumber"))
      .groupBy("l_orderkey", "l_linenumber").agg(count(lit(1)).as("m"))
      .groupBy("l_orderkey")
      .agg(sum(col("m")).as("k"), sum(expr("m * (m - 1L) div 2L")).as("dup"))
      .select(col("l_orderkey").as("okey"),
        (expr("k * (k - 1L) div 2L") - col("dup")).as("n"))
      .where(col("n") > 0L)
    timed("scan_only")(li.select(col("l_orderkey"), col("l_linenumber")))
    // single-shuffle typed kernel: one hash exchange on okey, then a
    // per-partition linear pass with a tiny per-order multiset
    def typedKernel = {
      import spark.implicits._
      li.select(col("l_orderkey"), col("l_linenumber"))
        .repartition(6, col("l_orderkey"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          val k = new java.util.HashMap[Long, Long]()
          val dup = new java.util.HashMap[Long, Long]()
          val mult = new java.util.HashMap[(Long, Long), Long]()
          it.foreach { case (o, ln) =>
            k.merge(o, 1L, _ + _)
            val m = mult.merge((o, ln), 1L, _ + _)
            if (m > 1) dup.merge(o, m - 1, _ + _) // Σ C(m,2) incrementally
          }
          val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
          k.forEach { (o, kk) =>
            val d = Option(dup.get(o)).getOrElse(0L)
            val n = kk * (kk - 1) / 2 - d
            if (n > 0) out += ((o, n))
          }
          out.iterator
        }.toDF("okey", "n")
    }
    timed("typed_kernel")(typedKernel)
    timed("agg_only")(aggPipe)
    timed("agg+orderBy")(aggPipe.orderBy("okey"))
    timed("agg+rangepart")(aggPipe.repartitionByRange(6, col("okey"))
      .sortWithinPartitions("okey"))
    timed("agg+checkpoint+orderBy") {
      aggPipe.localCheckpoint(true).orderBy("okey")
    }
    // the OLD sort-merge self-join formulation, for reference
    li.createOrReplaceTempView("lineitem_v")
    timed("smj_join") {
      spark.sql(
        """SELECT /*+ SHUFFLE_MERGE(l1) */ l1.l_orderkey AS okey, count(*) AS n
          |FROM lineitem_v l1 JOIN lineitem_v l2
          |  ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
          |GROUP BY l1.l_orderkey ORDER BY okey""".stripMargin)
    }
    spark.stop()
  }
}
