package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured A/B for the deletion-vector tier (BASELINE.md): a 1-row
  * GDPR-style point delete on a single-file dataset — rewrite tier vs
  * mask tier — reporting wall time, bytes WRITTEN to the dataset, and
  * the masked-read overhead vs a plain read. Usage:
  *   runMain graft.DvProbe [sfDir]
  */
object DvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[6]")
      .config("spark.sql.shuffle.partitions", "6")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

    def dirBytes(dir: String): Long = {
      def walk(p: Path): Long = fs.listStatus(p).map(s =>
        if (s.isDirectory) walk(s.getPath) else s.getLen).sum
      walk(new Path(dir))
    }
    def stage(tag: String): String = {
      val dir = s"/tmp/dv_probe_$tag"
      Tables.t(spark, sfDir, "orders").coalesce(1)
        .write.format("vortex").mode("overwrite").save(dir)
      dir
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // warm everything once
    val warm = stage("warm")
    spark.read.format("vortex").load(warm).count()

    for (rep <- 1 to 2) {
      val d1 = stage("rewrite")
      val d2 = stage("mask")
      val before1 = dirBytes(d1)
      val key = spark.read.format("vortex").load(d1)
        .select("o_orderkey").orderBy("o_orderkey").limit(1).head().getLong(0) + 4321
      val (_, tRewrite) = timed {
        sources.vortex.VortexDelete.delete(spark, d1, col("o_orderkey") === key)
      }
      val written1 = dirBytes(d1) // replacement file ≈ whole dataset
      val before2 = dirBytes(d2)
      val (_, tMask) = timed {
        sources.vortex.VortexDelete.delete(spark, d2, col("o_orderkey") === key,
          deletionVectors = true)
      }
      val written2 = dirBytes(d2) - before2 // sidecar only
      val (n0, tPlain) = timed(spark.read.format("vortex").load(d1).count())
      val (n1, tMasked) = timed(spark.read.format("vortex").load(d2).count())
      require(n0 == n1, s"row mismatch: $n0 vs $n1")
      println(f"[dvprobe] rep$rep dataset=${before1 / 1024}%d KiB rows=$n0%d | " +
        f"rewrite: ${tRewrite}%.2f s, ~${written1 / 1024}%d KiB rewritten | " +
        f"mask: ${tMask}%.2f s, ${written2}%d bytes written | " +
        f"read plain ${tPlain}%.2f s vs masked ${tMasked}%.2f s")
    }
    spark.stop()
  }
}
