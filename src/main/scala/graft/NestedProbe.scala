package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B: what nested-field pruning buys on the multimodal
  * metadata-scan shape — a struct whose small children (mime, w, h)
  * sit next to a fat binary sibling INSIDE the struct. Times the
  * mime-only aggregate against the full-struct read and reports the
  * StructCodec sub-page decode/skip counters. */
object NestedProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[6]")
      .config("spark.sql.shuffle.partitions", 6)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = if (args.nonEmpty) args(0).toLong else 400000L
    val dir = "/tmp/nested_probe_ds"
    // ~1 KB payload per row INSIDE the struct, tiny metadata siblings
    spark.range(0, n).select(
      col("id"),
      struct(
        concat(lit("type/"), (col("id") % 5).cast("string")).as("mime"),
        (col("id") % 1920).cast("int").as("w"),
        (col("id") % 1080).cast("int").as("h"),
        repeat(sha2(col("id").cast("string"), 256), 16).as("payload") // ~1 KB
      ).as("meta"))
      .repartition(6)
      .write.format("vortex").mode("overwrite").save(dir)

    def time(tag: String)(f: => Long): Unit = (1 to 3).foreach { rep =>
      val d0 = graft.sources.vortex.StructCodec.childDecodes.get()
      val s0 = graft.sources.vortex.StructCodec.childSkips.get()
      val t0 = System.nanoTime()
      val out = f
      val dt = (System.nanoTime() - t0) / 1e9
      val dN = graft.sources.vortex.StructCodec.childDecodes.get() - d0
      val sN = graft.sources.vortex.StructCodec.childSkips.get() - s0
      if (rep > 1)
        println(f"[nested] $tag rep$rep $dt%.3f s rows=$out childDecodes=$dN childSkips=$sN")
    }
    time("mime_only") {
      spark.read.format("vortex").load(dir)
        .groupBy(col("meta.mime")).count().count()
    }
    time("full_struct") {
      // Bench.force materializes every output column (a bare count()
      // would nested-prune this read down to nothing)
      Bench.force(spark.read.format("vortex").load(dir).select(col("id"), col("meta")))
    }
    spark.stop()
  }
}
