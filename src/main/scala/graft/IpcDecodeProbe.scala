package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object IpcDecodeProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[6]")
      .config("spark.sql.shuffle.partitions", 6)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val src = Tables.t(s, "/root/testdata/sf0.1", "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_shipdate"))
    val payloads = graft.sources.vortex.VortexIpc.serialize(src).collect()
    println(s"payloads=${payloads.length} bytes=${payloads.map(_.length.toLong).sum}")
    def time(tag: String)(f: => Long): Unit =
      (0 until 3).foreach { r =>
        val t0 = System.nanoTime(); val n = f
        println(f"[$tag] rep$r ${(System.nanoTime()-t0)/1e9}%.3f s ($n rows)")
      }
    time("old readRows    ") {
      payloads.iterator.flatMap(graft.sources.vortex.VortexIpc.readRows).size.toLong
    }
    time("new internalRows") {
      payloads.iterator.flatMap(graft.sources.vortex.VortexIpc.readInternalRows).size.toLong
    }
    s.stop()
  }
}
