package graft

import org.apache.spark.sql.SparkSession
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
    val docs = Tables.t(spark, sfDir, "documents")
    docs.count()

    def gramsExpr(df: org.apache.spark.sql.DataFrame) =
      graft.queries.DedupOps.wordGrams(df, "doc_id", "text", 5)
    def gramsMap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          text.split(" ", -1).sliding(5).filter(_.length == 5).map(w => (id, w.mkString(" ")))
        }.toDF("doc_id", "gram")

    (0 until 3).foreach { i =>
      t(s"grams-expr count rep$i") { println(gramsExpr(docs).count()) }
      t(s"grams-map  count rep$i") { println(gramsMap(docs).count()) }
      t(s"full-cur  rep$i") { println(SparkEntry.queries("d_decontaminate")(spark, sfDir).count()) }
      val eg = gramsMap(docs.where(col("doc_id") % 97 === 0)).select("gram").distinct()
      t(s"full-map  rep$i") { println(
        gramsMap(docs).join(broadcast(eg), Seq("gram"), "left_semi")
          .groupBy("doc_id").agg(countDistinct(col("gram")).as("n_hits"))
          .orderBy("doc_id").count()) }
    }
    spark.stop()
  }
}
