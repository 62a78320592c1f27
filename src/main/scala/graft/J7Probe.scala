package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structural decomposition of j7_asof at sf1 (r10 VERDICT order #7):
  * union-tag single-exchange as-of — where do the ~1.7 s go, and does
  * a typed carry beat the running-window `last(ignoreNulls)`?
  * Usage: runMain graft.J7Probe [sfDir] */
object J7Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
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
        println(f"[j7probe] $tag rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
    }
    val e = Tables.t(spark, sfDir, "events").select("event_id", "user_id", "ts")
    val o = Tables.t(spark, sfDir, "orders").select("o_custkey", "o_orderdate")
    timed("scan_union") {
      e.select(col("user_id").as("k")).unionByName(o.select(col("o_custkey").as("k")))
    }
    timed("full_window") {
      graft.operators.AsOfJoin.backward(e, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          tieBreak = "o_orderdate", payload = Seq("o_orderdate"))
        .select(col("event_id"), col("o_orderdate").as("asof_date"))
        .orderBy("event_id")
    }
    timed("no_final_sort") {
      graft.operators.AsOfJoin.backward(e, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          tieBreak = "o_orderdate", payload = Seq("o_orderdate"))
        .select(col("event_id"), col("o_orderdate").as("asof_date"))
    }
    // the range sampler of the final orderBy re-executes the as-of —
    // materialize first, then sort the narrow result
    timed("checkpoint_then_sort") {
      graft.operators.AsOfJoin.backward(e, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          tieBreak = "o_orderdate", payload = Seq("o_orderdate"))
        .select(col("event_id"), col("o_orderdate").as("asof_date"))
        .localCheckpoint(true)
        .orderBy("event_id")
    }
    // typed carry: same one exchange + sort, then a linear
    // mapPartitions pass instead of the window operator
    timed("typed_carry") {
      import spark.implicits._
      val widened = o.filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
        .select(col("o_custkey").cast("long").as("k"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
          lit(0).as("side"), lit(0L).as("event_id"))
        .unionByName(e.select(col("user_id").cast("long").as("k"),
          unix_micros(col("ts").cast("timestamp")).as("t"),
          lit(1).as("side"), col("event_id").cast("long").as("event_id")))
      widened
        .repartition(6, col("k"))
        .sortWithinPartitions(col("k"), col("t"), col("side"))
        .as[(Long, Long, Int, Long)]
        .mapPartitions { it =>
          var curK = Long.MinValue
          var carry = Long.MinValue
          it.flatMap { case (k, t, side, ev) =>
            if (k != curK) { curK = k; carry = Long.MinValue }
            if (side == 0) { carry = t; Iterator.empty }
            else Iterator.single((ev, if (carry == Long.MinValue) null
                                      else java.lang.Long.valueOf(carry)))
          }
        }.toDF("event_id", "asof_micros")
        .orderBy("event_id")
    }
    spark.stop()
  }
}
