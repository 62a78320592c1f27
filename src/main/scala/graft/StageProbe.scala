package graft
import org.apache.spark.sql.functions._
/** r14: maintenance-family staging A/B — the DSv2 row write behind
  * repartitionByRange vs the columnar bulk copy straight off the
  * parquet scan. Usage: runMain graft.StageProbe <sfDir> */
object StageProbe extends App {
  val sfDir = args(0)
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[6]")
    .config("spark.sql.shuffle.partitions", 6)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val o = Tables.t(spark, sfDir, "orders")
  o.count()
  def time(name: String)(body: => Unit): Unit = {
    val times = (0 until 3).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    println(f"[stage] $name%-28s best ${times.min}%.3f s (${times.map(t => f"$t%.2f").mkString(",")})")
  }
  val d1 = s"${sys.props("java.io.tmpdir")}/graft_probe_stage_rows"
  val d2 = s"${sys.props("java.io.tmpdir")}/graft_probe_stage_bulk"
  time("dsv2_range_4files") {
    o.repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey")
      .write.format("vortex").mode("overwrite").save(d1)
  }
  time("bulk_columnar") {
    graft.sources.vortex.VortexBulkCopy.copy(o, d2)
  }
  val d3 = s"${sys.props("java.io.tmpdir")}/graft_probe_stage_bulk6"
  time("bulk_columnar_12mb") {
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (12L << 20).toString)
    try graft.sources.vortex.VortexBulkCopy.copy(Tables.t(spark, sfDir, "orders"), d3)
    finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
  // read-back equivalence + file counts
  val c1 = spark.read.format("vortex").load(d1).count()
  val c2 = spark.read.format("vortex").load(d2).count()
  val c3 = spark.read.format("vortex").load(d3).count()
  println(s"[stage] rows $c1 vs $c2 vs $c3; files " +
    new java.io.File(d1).listFiles().count(_.getName.endsWith(".vortex")) + " vs " +
    new java.io.File(d2).listFiles().count(_.getName.endsWith(".vortex")) + " vs " +
    new java.io.File(d3).listFiles().count(_.getName.endsWith(".vortex")))
  spark.stop()
}
