package graft
import org.apache.spark.sql.functions._

/** Interleaved, paced A/B of the d_minhash_lsh dump shapes (r15
  * optimization round): OLD = pin + repartitionByRange + sort; NEW =
  * pin + PackedDump. Reps alternate with sleep pacing so host drift
  * lands on both shapes equally. Usage: runMain graft.PackAbProbe <sfDir>
  */
object PackAbProbe extends App {
  val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[6]")
    .config("spark.sql.shuffle.partitions", 6)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  def old(): Long = Bench.force(
    graft.queries.DedupOps.minhashCandidatesPacked(
        spark, graft.queries.DedupOps.tokensFor(spark, sfDir))
      .localCheckpoint(true)
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .select(shiftright(col("k"), 32).as("id_a"),
        (col("k") - shiftright(col("k"), 32) * lit(1L << 32)).as("id_b")))
  def nw(): Long = Bench.force {
    val p = graft.queries.DedupOps.minhashCandidatesPacked(
      spark, graft.queries.DedupOps.tokensFor(spark, sfDir)).localCheckpoint(true)
    graft.operators.PackedDump.sortedLongs(spark, p, "k")
      .select(shiftright(col("k"), 32).as("id_a"),
        (col("k") - shiftright(col("k"), 32) * lit(1L << 32)).as("id_b"))
  }
  // warmup (untimed) then alternate with pacing
  old()
  Thread.sleep(8000)
  (1 to 3).foreach { r =>
    val t0 = System.nanoTime(); old()
    println(f"[ab] old rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(8000)
    val t1 = System.nanoTime(); nw()
    println(f"[ab] new rep$r ${(System.nanoTime() - t1) / 1e9}%.2f s")
    Thread.sleep(8000)
  }
  spark.stop()
}
