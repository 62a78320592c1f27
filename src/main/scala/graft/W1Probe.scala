package graft
import org.apache.spark.sql.functions._
/** r13: does w1_rank's final global sort re-execute the window in the
  * range sampler (the j7/d_minhash lesson)? A/B plain orderBy vs eager
  * localCheckpoint before it. Usage: runMain graft.W1Probe <sfDir> */
object W1Probe extends App {
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[6]")
    .config("spark.sql.shuffle.partitions", 6)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val o = Tables.t(spark, args(0), "orders")
  import org.apache.spark.sql.expressions.Window
  def core = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .withColumn("nt", ntile(4).over(w))
      .filter(col("rn") <= 3).drop("o_totalprice")
  }
  def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
    val ts = (0 until 3).map { _ =>
      val t0 = System.nanoTime(); Bench.force(df); (System.nanoTime()-t0)/1e9 }
    println(f"[w1] $name%-22s best ${ts.min}%.3f (${ts.map(x=>f"$x%.2f").mkString(",")})")
  }
  t("plain_orderby")(core.orderBy("o_custkey", "rn"))
  t("ckpt_then_orderby")(core.localCheckpoint(true).orderBy("o_custkey", "rn"))
  t("sortwithin_coalesce1")(core.coalesce(1).sortWithinPartitions("o_custkey", "rn"))
  spark.stop()
}
