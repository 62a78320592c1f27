package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** SURVEY.md §2.5 window functions. Window ORDER BY always carries a
  * unique tiebreak key so ranks are deterministic on both engines.
  * At scale these are a single shuffle on the partition key — the
  * minimal plan for windowed analytics.
  */
object Windows {
  val set = new QuerySet
  import set._

  // Spark side = the identical window SQL, but the filtered window
  // output is EAGERLY pinned (localCheckpoint) before the final global
  // sort: the range-partitioner's sampling job otherwise re-executes
  // the whole exchange+sort+window pipeline (the j7/d_minhash sampler
  // lesson; W1Probe at sf1: 2.34 → 1.54 s warm best). The window core
  // itself is already minimal — one hash exchange, one Window node
  // computing all four functions (ntile/dense_rank legally block the
  // WindowGroupLimit rank pushdown), see the r13 FloorProbe pin.
  spark("w1_rank",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""SELECT o_custkey, o_orderkey,
        |  CAST(rn AS BIGINT) AS rn, CAST(rk AS BIGINT) AS rk,
        |  CAST(drk AS BIGINT) AS drk, CAST(nt AS BIGINT) AS nt
        |FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS rn,
        |    rank()       OVER w AS rk,
        |    dense_rank() OVER w AS drk,
        |    ntile(4)     OVER w AS nt
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |) t WHERE rn <= 3""".stripMargin)
        .localCheckpoint(true)
        .orderBy("o_custkey", "rn")
    },
    """SELECT o_custkey, o_orderkey,
      |  CAST(rn AS BIGINT) AS rn, CAST(rk AS BIGINT) AS rk,
      |  CAST(drk AS BIGINT) AS drk, CAST(nt AS BIGINT) AS nt
      |FROM (
      |  SELECT o_custkey, o_orderkey,
      |    row_number() OVER w AS rn,
      |    rank()       OVER w AS rk,
      |    dense_rank() OVER w AS drk,
      |    ntile(4)     OVER w AS nt
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |) t WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)

  common("w2_lag_lead",
    """SELECT o_custkey, o_orderkey,
      |  lag(o_orderdate)  OVER w AS prev_date,
      |  lead(o_orderdate) OVER w AS next_date
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin)

  common("w3_first_last",
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey)  OVER w AS first_k,
      |  last_value(o_orderkey)   OVER w AS last_k,
      |  nth_value(o_orderkey, 2) OVER w AS second_k
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin)

  // W4 via DataFrame API (Window.rowsBetween) with a SQL oracle.
  //
  // Plan shape for the window+ORDER BY pair (both W4 rows): ONE range
  // exchange on the partition key up front. RangePartitioning on
  // o_custkey satisfies the window's ClusteredDistribution (equal keys
  // always land in one partition), and because partitions are custkey
  // ranges, a final sortWithinPartitions(o_custkey, …) IS the global
  // ORDER BY — no second exchange, and the range sampling job runs
  // against the bare scan instead of re-executing the whole window
  // (a plain .orderBy re-ran it: ~0.6 s of pure waste at sf1).
  // Long-cents arithmetic replaces the decimal aggregate/sort key:
  // o_totalprice is 2-decimal by construction (round(x*100) asserted
  // exact against the DECIMAL(18,2) cast at every SF), and a long
  // running sum / frame comparison stays in whole-stage codegen.
  // Measured at sf1: w4_running_sum 1.42→1.25 s, w4_range_frame
  // 1.62→1.05 s, identical hashes.
  spark("w4_running_sum",
    (s, d) => {
      val o = Tables.t(s, d, "orders")
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.repartitionByRange(col("o_custkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          (sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).over(w)
            .cast(DecimalType(20, 0)) / lit(100)).cast("double").as("running"))
        .sortWithinPartitions("o_custkey", "o_orderkey")
    },
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)

  // cents frame bounds: ±1000 on DECIMAL(18,2) ⟺ ±100000 on the
  // exact ×100 long scale (a monotone 1:1 map preserves membership)
  spark("w4_range_frame",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .rangeBetween(-100000, 100000)
      Tables.t(s, d, "orders")
        .repartitionByRange(col("o_custkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).cast("bigint").as("n_near"))
        .sortWithinPartitions("o_custkey", "o_orderkey")
    },
    """SELECT o_custkey, o_orderkey,
      |  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
      |    RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS BIGINT) AS n_near
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)
}
