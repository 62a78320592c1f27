package graft
import org.apache.spark.sql.functions._

/** r14 decomposition probe (VERDICT r13 "What's wrong" #2):
  * d_split_leakage regressed 1.54 → 1.84 s at sf0.1 (2.6× vs DuckDB's
  * 0.71 s). Split the row into its components — stored-band read,
  * band self-join + packed-long distinct, the split-bucket map over
  * the sets table, and the two merge-count kernels — so the dominant
  * term gets a fix or a BASELINE.md pin (the FloorProbe precedent).
  * Warm JVM, best of 3. Usage: runMain graft.SplitLeakProbe <sfDir> */
object SplitLeakProbe extends App {
  val sfDir = args(0)
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[6]")
    .config("spark.sql.shuffle.partitions", 6)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")

  // materialize the stored signature index outside any timed region,
  // exactly like the bench harness does
  val dir = graft.queries.DedupOps.dsAuditIndex.ensure(spark, sfDir)
  println(s"[splitleak] index at $dir")

  def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
    val times = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      Bench.force(df)
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[splitleak] $name%-30s best ${times.min}%.3f s  (${times.map(t => f"$t%.2f").mkString(",")})")
  }

  def bands = spark.read.format("vortex").load(s"$dir/bands")
  def sets = spark.read.format("vortex").load(s"$dir/sets")

  // component floors
  time("bands_scan")(bands.select("sid", "band", "bkey"))
  time("sets_scan")(sets.select("sid", "members"))
  time("selfjoin_nodistinct") {
    bands.select(col("sid").as("sa"), col("band"), col("bkey"))
      .join(bands.select(col("sid").as("sb"), col("band"), col("bkey")),
            Seq("band", "bkey"))
      .where(col("sa") < col("sb"))
      .select((col("sa") * lit(1L << 32) + col("sb")).as("pk"))
  }
  time("selfjoin_packed_distinct") {
    bands.select(col("sid").as("sa"), col("band"), col("bkey"))
      .join(bands.select(col("sid").as("sb"), col("band"), col("bkey")),
            Seq("band", "bkey"))
      .where(col("sa") < col("sb"))
      .select((col("sa") * lit(1L << 32) + col("sb")).as("pk")).distinct()
  }
  // the split-bucket typed map over sets (no joins)
  time("bysplit_map") {
    import spark.implicits._
    import graft.functions.SplitBucket
    sets.select(col("sid"), col("members")).as[(Long, Seq[Long])]
      .map { case (sid, members) =>
        val out = Array.fill(3)(scala.collection.mutable.ArrayBuilder.make[Long])
        members.foreach(id => out(SplitBucket.splitIdx(id)) += id)
        (sid, out(0).result(), out(1).result(), out(2).result())
      }.toDF("sid", "tr", "vl", "te")
  }
  // the full row as the bench runs it
  time("full_row")(
    graft.SparkEntry.queries("d_split_leakage")(spark, sfDir))
  spark.stop()
}
