package graft
import org.apache.spark.sql.functions._

/** Phase decomposition for the DELETE-shaped maintenance rows (r15
  * optimization round): times the rewrite-tier delete pass, the
  * mask-tier delete pass, and foldMasks SEPARATELY over a fresh
  * bulk-staged orders dataset per rep — the three data passes behind
  * s14_vortex_delete / s14_vortex_delete_dv / s15_vortex_update_dv and
  * the s15d DELETE statement. Usage: runMain graft.DelProbe <sfDir>
  */
object DelProbe extends App {
  val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[6]")
    .config("spark.sql.shuffle.partitions", 6)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val ord = Tables.t(spark, sfDir, "orders"); ord.count()
  val dir = s"${sys.props("java.io.tmpdir")}/graft_probe_del"
  val pred = col("o_orderstatus") === "F" && col("o_totalprice") < 100000.0
  def fresh(): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    graft.sources.vortex.VortexBulkCopy.copy(ord, dir)
  }
  def time(name: String, reps: Int = 3)(prep: => Unit)(body: => Unit): Unit = {
    val ts = (0 until reps).map { _ => prep
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
    println(f"[del] $name%-22s best ${ts.min}%.3f s (${ts.map(t => f"$t%.2f").mkString(",")})")
  }
  time("stage_bulk")(()) { fresh() }
  time("delete_rewrite")(fresh()) {
    graft.sources.vortex.VortexDelete.delete(spark, dir, pred)
  }
  time("delete_mask")(fresh()) {
    graft.sources.vortex.VortexDelete.delete(spark, dir, pred, deletionVectors = true)
  }
  time("fold_after_mask")({ fresh()
    graft.sources.vortex.VortexDelete.delete(spark, dir, pred, deletionVectors = true) }) {
    graft.sources.vortex.VortexMaintenance.foldMasks(spark, dir)
  }
  time("readback_agg")(()) {
    Bench.force(spark.read.format("vortex").load(dir)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n")))
  }
  spark.stop()
}
