package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only timing probe for pipeline pieces (not part of the library
  * surface; invoked manually while performance-tuning). */
object DevProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf1")
    val spark = SparkSession.builder().master("local[6]")
      .config("spark.sql.shuffle.partitions", "6")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Tables.t(spark, sfDir, "embeddings").count()

    def tiny(df: DataFrame, k: Int, withCos: Boolean): DataFrame = {
      val w = Window.partitionBy("id_q").orderBy(col("cosd").desc, col("id_n"))
      val r = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      val base = r.select(col("id_q"), col("rnk").cast("long").as("rnk"), col("id_n"),
        col("cosd").cast("decimal(18,4)").cast("double").as("cos"))
      graft.operators.TinyResult.globalSort(
        if (withCos) base else base.drop("cos"), col("id_q"), col("rnk"))
    }
    def partialTopK(df: DataFrame, k: Int): DataFrame =
      df.as[(Long, Long, Double)].mapPartitions { it =>
        val m = scala.collection.mutable.HashMap[Long, scala.collection.mutable.TreeSet[(Double, Long)]]()
        implicit val ord: Ordering[(Double, Long)] =
          Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
        it.foreach { case (q, n, c) =>
          val s = m.getOrElseUpdate(q, scala.collection.mutable.TreeSet.empty)
          s.add((c, n)); if (s.size > k) s.remove(s.last)
        }
        m.iterator.flatMap { case (q, s) => s.iterator.map(x => (q, x._2, x._1)) }
      }.toDF("id_q", "id_n", "cosd")

    (0 until 3).foreach { i =>
      t(s"ivf-cur  rep$i") { println(SparkEntry.queries("v_cos_ivf")(spark, sfDir).count()) }
      t(s"ivf-tiny rep$i") { println(tiny(graft.queries.SimilarityOps.scoredProbe(spark, sfDir, true), 3, false).count()) }
      t(s"ivf-tiny+ptk rep$i") { println(tiny(partialTopK(graft.queries.SimilarityOps.scoredProbe(spark, sfDir, true), 3), 3, false).count()) }
      t(s"topk-cur rep$i") { println(SparkEntry.queries("v_cos_topk")(spark, sfDir).count()) }
      t(s"topk-tiny+ptk rep$i") { println(tiny(partialTopK(graft.queries.SimilarityOps.scoredProbe(spark, sfDir, false), 5), 5, true).count()) }
    }
    spark.stop()
  }
}
