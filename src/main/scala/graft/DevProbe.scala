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

    def packed = DedupOps.jaccardDocPairs(spark, tok, 0.5)
      .select((col("id_a") * lit(1L << 32) + col("id_b")).as("k"), col("jac"))

    // A: packed, no checkpoint, range 8 + sortWithin
    t("A pack/nockpt/range8")(println("  rows=" + Bench.force(
      packed.repartitionByRange(8, col("k")).sortWithinPartitions("k")
        .select(shiftright(col("k"), 32).as("id_a"),
          (col("k") - shiftright(col("k"), 32) * lit(1L << 32)).as("id_b"), col("jac")))))
    Thread.sleep(8000)

    // B: packed, lazy checkpoint, range 8 + sortWithin
    t("B pack/ckpt/range8")(println("  rows=" + Bench.force(
      packed.localCheckpoint(false).repartitionByRange(8, col("k")).sortWithinPartitions("k")
        .select(shiftright(col("k"), 32).as("id_a"),
          (col("k") - shiftright(col("k"), 32) * lit(1L << 32)).as("id_b"), col("jac")))))
    Thread.sleep(8000)

    // C: current shape (wide rows, checkpoint, global orderBy)
    t("C wide/ckpt/orderBy")(println("  rows=" + Bench.force(
      DedupOps.jaccardDocPairs(spark, tok, 0.5).localCheckpoint(false)
        .orderBy("id_a", "id_b"))))
    spark.stop()
  }
}
