package graft
import org.apache.spark.sql.functions._

/** One-off plan capture for the r15 packed-dump change: prints the OLD
  * dump shape (range exchange + sort, as shipped through r15 build) and
  * the NEW shape (PackedDump) for d_minhash_lsh / d_jaccard, formatted.
  * Usage: runMain graft.ExplainPair <sfDir>
  */
object ExplainPair extends App {
  val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[6]")
    .config("spark.sql.shuffle.partitions", 6)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  def show(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
    println(s"==== $tag ====")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
  }
  val tok = graft.queries.DedupOps.tokensFor(spark, sfDir)
  val pinnedLsh = graft.queries.DedupOps.minhashCandidatesPacked(spark, tok)
    .localCheckpoint(true)
  show("d_minhash_lsh_before",
    pinnedLsh.repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .select(shiftright(col("k"), 32).as("id_a"),
        (col("k") - shiftright(col("k"), 32) * lit(1L << 32)).as("id_b")))
  show("d_minhash_lsh_after",
    graft.operators.PackedDump.sortedLongs(spark, pinnedLsh, "k")
      .select(shiftright(col("k"), 32).as("id_a"),
        (col("k") - shiftright(col("k"), 32) * lit(1L << 32)).as("id_b")))
  val packedJac = graft.queries.DedupOps.jaccardDocPairs(spark, tok, 0.5)
    .select((col("id_a") * lit(1L << 32) + col("id_b")).as("k"), col("jac"))
  show("d_jaccard_before",
    packedJac.repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .select(shiftright(col("k"), 32).as("id_a"),
        (col("k") - shiftright(col("k"), 32) * lit(1L << 32)).as("id_b"),
        col("jac")))
  val pinnedJac = packedJac.localCheckpoint(true)
  show("d_jaccard_after",
    graft.operators.PackedDump.sortedLongsWithDouble(spark, pinnedJac, "k", "jac")
      .select(shiftright(col("k"), 32).as("id_a"),
        (col("k") - shiftright(col("k"), 32) * lit(1L << 32)).as("id_b"),
        col("jac")))
  spark.stop()
}
