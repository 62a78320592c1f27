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

    def fileSizes(dir: String): Map[String, Long] = {
      def walk(p: Path): Seq[(String, Long)] = fs.listStatus(p).toSeq.flatMap(s =>
        if (s.isDirectory) walk(s.getPath) else Seq(s.getPath.toString -> s.getLen))
      walk(new Path(dir)).toMap
    }
    // bytes WRITTEN by an op = sizes of files that exist after and did
    // not before (a rewrite-tier delete also REMOVES the source file, so
    // a directory-total delta would understate — and reporting the raw
    // post-op total would overstate — what the op wrote)
    def newBytes(before: Map[String, Long], dir: String): Long =
      fileSizes(dir).collect { case (p, n) if !before.contains(p) => n }.sum
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
      val sizes1 = fileSizes(d1)
      val before1 = sizes1.values.sum
      val key = spark.read.format("vortex").load(d1)
        .select("o_orderkey").orderBy("o_orderkey").limit(1).head().getLong(0) + 4321
      val (_, tRewrite) = timed {
        sources.vortex.VortexDelete.delete(spark, d1, col("o_orderkey") === key)
      }
      val written1 = newBytes(sizes1, d1) // replacement file ≈ whole dataset
      val sizes2 = fileSizes(d2)
      val (_, tMask) = timed {
        sources.vortex.VortexDelete.delete(spark, d2, col("o_orderkey") === key,
          deletionVectors = true)
      }
      val written2 = newBytes(sizes2, d2) // sidecar (+ its manifest) only
      val (n0, tPlain) = timed(spark.read.format("vortex").load(d1).count())
      val (n1, tMasked) = timed(spark.read.format("vortex").load(d2).count())
      require(n0 == n1, s"row mismatch: $n0 vs $n1")
      println(f"[dvprobe] rep$rep dataset=${before1 / 1024}%d KiB rows=$n0%d | " +
        f"rewrite: ${tRewrite}%.2f s, ~${written1 / 1024}%d KiB rewritten | " +
        f"mask: ${tMask}%.2f s, ${written2}%d bytes written | " +
        f"read plain ${tPlain}%.2f s vs masked ${tMasked}%.2f s")

      // the same A/B for a 1-row point UPDATE: rewrite tier vs the
      // merge-on-read tier (mask old row + append its updated image)
      val d3 = stage("upd_rewrite")
      val d4 = stage("upd_mask")
      val sizes3 = fileSizes(d3)
      val ukey = spark.read.format("vortex").load(d3)
        .select("o_orderkey").orderBy("o_orderkey").limit(1).head().getLong(0)
      val assigns = Map("o_totalprice" ->
        (col("o_totalprice") + 1.0).asInstanceOf[org.apache.spark.sql.Column])
      val (_, tUpdRewrite) = timed {
        sources.vortex.VortexUpdate.update(spark, d3, assigns, col("o_orderkey") === ukey)
      }
      val written3 = newBytes(sizes3, d3)
      val sizes4 = fileSizes(d4)
      val (_, tUpdMask) = timed {
        sources.vortex.VortexUpdate.update(spark, d4, assigns, col("o_orderkey") === ukey,
          deletionVectors = true)
      }
      val written4 = newBytes(sizes4, d4)
      val (u0, tUPlain) = timed(spark.read.format("vortex").load(d3).count())
      val (u1, tUMasked) = timed(spark.read.format("vortex").load(d4).count())
      require(u0 == u1, s"update row mismatch: $u0 vs $u1")
      println(f"[dvprobe] rep$rep UPDATE 1 row | " +
        f"rewrite: ${tUpdRewrite}%.2f s, ~${written3 / 1024}%d KiB rewritten | " +
        f"mask+append: ${tUpdMask}%.2f s, ${written4}%d bytes written | " +
        f"read plain ${tUPlain}%.2f s vs masked ${tUMasked}%.2f s")
    }
    spark.stop()
  }
}
