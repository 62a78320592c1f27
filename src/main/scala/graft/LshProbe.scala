package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d_minhash_lsh creep attribution (r10 VERDICT order #8: paced
  * 5.25 s r7 → 6.67 s r10 while DuckDB held ~3.45 s): decompose
  * tokens → signatures/buckets → pair emission → ordered dump, and
  * report the candidate-pair volume. Usage: runMain graft.LshProbe [sfDir] */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[6]")
      .config("spark.sql.shuffle.partitions", "6")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(tag: String)(f: => DataFrame): Unit = {
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val n = Bench.force(f)
        println(f"[lshprobe] $tag rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
    }
    timed("tokens")(graft.queries.DedupOps.tokensFor(spark, sfDir))
    timed("pairs_unsorted")(
      graft.queries.DedupOps.minhashCandidatesPacked(
        spark, graft.queries.DedupOps.tokensFor(spark, sfDir)))
    timed("full_current")(
      graft.queries.DedupOps.minhashCandidatesPacked(
        spark, graft.queries.DedupOps.tokensFor(spark, sfDir))
        .repartitionByRange(8, col("k"))
        .sortWithinPartitions("k")
        .select(shiftright(col("k"), 32).as("id_a"),
          (col("k") - shiftright(col("k"), 32) * lit(1L << 32)).as("id_b")))
    val pinned = graft.queries.DedupOps.minhashCandidatesPacked(
      spark, graft.queries.DedupOps.tokensFor(spark, sfDir))
      .localCheckpoint(true)
    timed("pinned_dump")(pinned)
    timed("pinned_repart")(pinned.repartitionByRange(8, col("k")))
    timed("pinned_repart_sort")(pinned.repartitionByRange(8, col("k"))
      .sortWithinPartitions("k"))
    timed("pinned_full")(pinned.repartitionByRange(8, col("k"))
      .sortWithinPartitions("k")
      .select(shiftright(col("k"), 32).as("id_a"),
        (col("k") - shiftright(col("k"), 32) * lit(1L << 32)).as("id_b")))
    timed("pinned_sortless_unpack")(pinned
      .select(shiftright(col("k"), 32).as("id_a"),
        (col("k") - shiftright(col("k"), 32) * lit(1L << 32)).as("id_b")))
    timed("pinned_packed_dump")(
      graft.operators.PackedDump.sortedLongs(spark, pinned, "k")
        .select(shiftright(col("k"), 32).as("id_a"),
          (col("k") - shiftright(col("k"), 32) * lit(1L << 32)).as("id_b")))
    // the FULL r15 row shape (pipeline + pin + packed dump per rep)
    timed("full_packed") {
      val p = graft.queries.DedupOps.minhashCandidatesPacked(
        spark, graft.queries.DedupOps.tokensFor(spark, sfDir)).localCheckpoint(true)
      graft.operators.PackedDump.sortedLongs(spark, p, "k")
        .select(shiftright(col("k"), 32).as("id_a"),
          (col("k") - shiftright(col("k"), 32) * lit(1L << 32)).as("id_b"))
    }
    spark.stop()
  }
}
