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
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "6")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.DedupOps

    def tok = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
    t("warm: documents count")(Tables.t(spark, sfDir, "documents").count())

    t("candidates count")(println("  n=" + DedupOps.minhashCandidates(spark, tok).count()))
    Thread.sleep(3000)
    t("candidates count again")(println("  n=" + DedupOps.minhashCandidates(spark, tok).count()))
    Thread.sleep(3000)
    val q1 = SparkEntry.queries("d_minhash_lsh")(spark, sfDir)
    t("d_minhash_lsh force")(println("  rows=" + Bench.force(q1)))
    Thread.sleep(3000)
    val q2 = SparkEntry.queries("d_minhash_lsh")(spark, sfDir)
    t("d_minhash_lsh force#2")(println("  rows=" + Bench.force(q2)))
    spark.stop()
  }
}
