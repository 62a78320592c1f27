package graft
import org.apache.spark.sql.functions._

/** Isolated A/B of PackedDump vs the range-sort dump on synthetic
  * packed keys (r15 optimization round). */
object PackProbe extends App {
  val n = args.headOption.map(_.toLong).getOrElse(8000000L)
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[6]")
    .config("spark.sql.shuffle.partitions", 6)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val pinned = spark.range(n).select(
      (xxhash64(col("id")) % 100000000L).as("k"),
      (col("id") % 97).cast("double").as("v"))
    .localCheckpoint(true)
  def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit =
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      val c = Bench.force(f)
      println(f"[pack] $tag rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
    }
  time("range_sort")(pinned.select("k").repartitionByRange(8, col("k")).sortWithinPartitions("k"))
  time("packed")(graft.operators.PackedDump.sortedLongs(spark, pinned.select("k").localCheckpoint(true), "k"))
  time("range_sort_kv")(pinned.repartitionByRange(8, col("k")).sortWithinPartitions("k"))
  time("packed_kv")(graft.operators.PackedDump.sortedLongsWithDouble(spark, pinned, "k", "v"))
  spark.stop()
}
