package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d_jaccard stage attribution (r16): which branch the cost probe
  * picks at sf0.1, the candidate volume, the set-pair join cost, the
  * member explode, and the ordered dump.
  * Usage: runMain graft.JacProbe [sfDir] */
object JacProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[6]")
      .config("spark.sql.shuffle.partitions", "6")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.DedupOps
    def timed(tag: String)(f: => DataFrame): Unit = {
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val n = Bench.force(f)
        println(f"[jacprobe] $tag rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
    }
    def tok = DedupOps.tokensFor(spark, sfDir)
    // replicate the branch probe
    val sets = DedupOps.distinctSetsDF(tok)
    val st = sets.select(col("sid"), explode(col("toks")).as("w"))
    val dfreq = st.groupBy("w").agg(count(lit(1)).as("df"))
    val arr = st.join(dfreq, "w")
      .groupBy("sid").agg(sort_array(collect_list(struct(col("df"), col("w")))).as("dw"))
      .select(col("sid"), expr("transform(dw, x -> x.w)").as("ids"), size(col("dw")).as("n"))
    val pre = arr.select(col("sid"), col("n"),
      posexplode(expr(s"slice(ids, 1, CAST(size(ids) - CEIL(0.5 * size(ids)) + 1 AS INT))")))
      .withColumnRenamed("col", "w")
    val probe = pre.groupBy("w").agg(count(lit(1)).as("pdf"))
      .agg(sum(col("pdf") * col("pdf")).as("vol")).first()
    val prefixVolume = if (probe.isNullAt(0)) 0L else probe.getLong(0) / 2
    val nSets = sets.count()
    println(s"[jacprobe] prefixVolume=$prefixVolume nSets=$nSets quad=${nSets * nSets / 2} branch=${if (prefixVolume > nSets * nSets / 2) "BLOCK" else "PREFIX"}")
    timed("set_pairs")(DedupOps.jaccardSetPairs(spark, DedupOps.distinctSetsDF(tok), 0.5))
    timed("doc_pairs_unsorted")(DedupOps.jaccardDocPairs(spark, tok, 0.5))
    timed("full_d_jaccard")(SparkEntry.queries("d_jaccard")(spark, sfDir))
    spark.stop()
  }
}
