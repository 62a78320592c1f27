package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** v_semdedup decomposition (r16 VERDICT order #5: 1.2-2.9 s at sf0.1
  * with no probe): attribute the row to scan+quantize vs k-means
  * (3 passes) vs the in-cluster pair scoring vs the final
  * join+orderBy. Usage: runMain graft.SemProbe [sfDir] */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[6]")
      .config("spark.sql.shuffle.partitions", "6")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.queries.SimilarityOps
    import graft.functions.VecFixedPoint
    def timed(tag: String)(f: => DataFrame): Unit = {
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val n = Bench.force(f)
        println(f"[semprobe] $tag rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
    }
    timed("scan_quantize")(SimilarityOps.qvecs(spark, sfDir).toDF())
    timed("kmeans_assign")(
      SimilarityOps.kmeansAssign(spark, SimilarityOps.qvecs(spark, sfDir), K = 8, refinements = 2).toDF())
    // in-cluster pair scoring through BoundedBucketPairs exactly as the row does
    timed("pairs_drop") {
      val assigned = SimilarityOps.kmeansAssign(spark, SimilarityOps.qvecs(spark, sfDir), K = 8, refinements = 2)
      val thr = new java.math.BigDecimal("0.2500")
      val buckets = assigned.map { case (id, k, q, saa) => (0, k.toString, (id, q, saa)) }
      graft.operators.BoundedBucketPairs.pairs[(Long, Array[Long], Long), Long](
        buckets, cap = 4096, blocks = 16,
        blockOf = item => item._1.toInt,
        emit = (_, a, b) => {
          val dot = VecFixedPoint.dot(a._2, b._2)
          if (dot > 0 && VecFixedPoint.cos4(dot, a._3, b._3).compareTo(thr) >= 0)
            Iterator.single(math.max(a._1, b._1))
          else Iterator.empty
        }).toDF("vec_id").distinct().withColumn("isdrop", lit(true))
    }
    timed("full_v_semdedup")(SparkEntry.queries("v_semdedup")(spark, sfDir))
    spark.stop()
  }
}
