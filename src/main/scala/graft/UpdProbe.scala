package graft
import org.apache.spark.sql.functions._
object UpdProbe extends App {
  val sfDir = args(0)
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[6]")
    .config("spark.sql.shuffle.partitions", 6)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val ord = Tables.t(spark, sfDir, "orders"); ord.count()
  val dir = s"${sys.props("java.io.tmpdir")}/graft_probe_upd"
  def fresh(): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    graft.sources.vortex.VortexBulkCopy.copy(ord, dir)
  }
  def time(name: String)(body: => Unit): Unit = {
    val ts = (0 until 3).map { _ => fresh()
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
    println(f"[upd] $name%-18s best ${ts.min}%.3f s (${ts.map(t => f"$t%.2f").mkString(",")})")
  }
  time("s15_update") {
    graft.sources.vortex.VortexUpdate.update(spark, dir,
      Map("o_totalprice" -> (col("o_totalprice") + 1000.0),
          "o_orderpriority" -> lit("5-RESCORED")),
      col("o_orderstatus") === "F" && col("o_totalprice") < 100000.0)
  }
  // result sanity
  val agg = spark.read.format("vortex").load(dir)
    .groupBy("o_orderstatus").agg(count(lit(1)).as("n"),
      sum(round(col("o_totalprice")*100).cast("long")).as("cents")).orderBy("o_orderstatus")
  agg.show(false)
  spark.stop()
}
