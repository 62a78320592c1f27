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

  common("w1_rank",
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
  spark("w4_running_sum",
    (s, d) => {
      val o = Tables.t(s, d, "orders")
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast("double").as("running"))
        .orderBy("o_custkey", "o_orderkey")
    },
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)

  common("w4_range_frame",
    """SELECT o_custkey, o_orderkey,
      |  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
      |    RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS BIGINT) AS n_near
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)
}
