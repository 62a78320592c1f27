package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Second coverage wave: subqueries (correlated scalar, IN, EXISTS-in-
  * select), GROUPING SETS, pivot, exact percentiles, and the wider
  * string/math/date scalar families — all hash-matched vs DuckDB.
  */
object Coverage2 {
  val set = new QuerySet
  import set._

  // Correlated scalar subquery (decorrelated by Catalyst to a join)
  common("q_scalar_subquery",
    """SELECT c_custkey,
      |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c ORDER BY c_custkey""".stripMargin)

  common("q_in_subquery",
    """SELECT o_orderkey FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      |ORDER BY o_orderkey""".stripMargin)

  common("q_grouping_sets",
    """SELECT coalesce(l_returnflag, '<A>') AS rf, coalesce(l_linestatus, '<A>') AS ls,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin)

  // Pivot: DataFrame .pivot with pinned value list; oracle via CASE
  spark("q_pivot",
    (s, d) => Tables.t(s, d, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L)
      .orderBy("o_orderpriority"),
    """SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)

  // Exact interpolated percentiles (≡ DuckDB quantile_cont), via
  // graft.operators.ExactPercentile: size-gated like the dedup
  // kernels. Inputs that provably fit one task's memory use the
  // built-in exact `percentile` (one shuffle, no histogram rounds);
  // larger inputs take the distributed histogram + targeted-bucket
  // plan, whose per-task state never grows with group size (the
  // built-in buffers a whole group's values in one task — OOM at
  // 100 TB group sizes). Same interpolation expression as
  // quantile_cont on both paths; DECIMAL(18,4) rounding absorbs
  // last-ulp differences, as everywhere in the suite.
  spark("q_percentile",
    (s, d) => {
      val li = Tables.t(s, d, "lineitem")
      // size-gated dispatch decides everything: inputs that provably
      // fit task memory take the one-pass buffer aggregate, larger
      // ones the histogram plan, and on that path the persist choice
      // follows the plan shape (a bare pruned scan re-reads faster
      // than it caches — measured in ExactPercentile's scaladoc)
      val q = graft.operators.ExactPercentile.computeMultiAuto(
        li, "l_returnflag",
        Seq(("l_quantity", Seq(0.5, 0.9), Seq("p50r", "p90r")),
            ("l_extendedprice", Seq(0.25), Seq("p25r"))))
      // one row per l_returnflag: TinyResult skips the range-sampling
      // job a plain orderBy would spend re-running the aggregate
      graft.operators.TinyResult.globalSort(
        q.selectExpr("l_returnflag",
          "CAST(CAST(p50r AS DECIMAL(18,4)) AS DOUBLE) AS p50",
          "CAST(CAST(p90r AS DECIMAL(18,4)) AS DOUBLE) AS p90",
          "CAST(CAST(p25r AS DECIMAL(18,4)) AS DOUBLE) AS p25_price"),
        org.apache.spark.sql.functions.col("l_returnflag"))
    },
    """SELECT l_returnflag,
      |  CAST(CAST(quantile_cont(l_quantity, 0.5) AS DECIMAL(18,4)) AS DOUBLE) AS p50,
      |  CAST(CAST(quantile_cont(l_quantity, 0.9) AS DECIMAL(18,4)) AS DOUBLE) AS p90,
      |  CAST(CAST(quantile_cont(l_extendedprice, 0.25) AS DECIMAL(18,4)) AS DOUBLE) AS p25_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)

  common("f_string2",
    """SELECT p_partkey,
      |  lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '-') AS rp,
      |  repeat(p_brand, 2) AS rep2, reverse(p_name) AS rev,
      |  left(p_name, 4) AS l4, right(p_name, 4) AS r4,
      |  split_part(p_type, ' ', 1) AS sp1, split_part(p_type, ' ', 2) AS sp2,
      |  CAST(instr(p_name, 'a') AS BIGINT) AS pos_a,
      |  CAST(ascii(p_brand) AS BIGINT) AS asc1,
      |  CASE WHEN p_name ILIKE '%A%' THEN 1 ELSE 0 END AS il
      |FROM part ORDER BY p_partkey""".stripMargin)

  // xor spelled differently: Spark `^` vs DuckDB xor() (DuckDB ^ is power)
  // plan note: SortThroughProject pushes the ORDER BY below this
  // log+decimal projection (5.2 → 1.2 s at sf1 — a plain global sort
  // re-ran the projection inside its range-sampling job)
  spark("f_math2",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""SELECT o_orderkey,
              |  CAST(sign(o_orderkey % 5 - 2) AS BIGINT) AS sg,
              |  mod(o_orderkey, 97) AS md,
              |  CAST(CAST(round(log10(CAST(o_orderkey + 1 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS DOUBLE) AS l10,
              |  CAST(CAST(round(log2(CAST(o_orderkey + 1 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS DOUBLE) AS l2,
              |  o_orderkey & 255 AS band, o_orderkey | 7 AS bor, o_orderkey ^ 255 AS bxor
              |FROM orders ORDER BY o_orderkey""".stripMargin) },
    """SELECT o_orderkey,
      |  CAST(sign(o_orderkey % 5 - 2) AS BIGINT) AS sg,
      |  mod(o_orderkey, 97) AS md,
      |  CAST(CAST(round(log10(CAST(o_orderkey + 1 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS DOUBLE) AS l10,
      |  CAST(CAST(round(log2(CAST(o_orderkey + 1 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS DOUBLE) AS l2,
      |  o_orderkey & 255 AS band, o_orderkey | 7 AS bor, xor(o_orderkey, 255) AS bxor
      |FROM orders ORDER BY o_orderkey""".stripMargin)

  spark("f_date2",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""SELECT o_orderkey,
              |  last_day(CAST(o_orderdate AS DATE)) AS ld,
              |  CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
              |  CAST(dayofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS doy,
              |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
              |  datediff(CAST(o_orderdate AS DATE), DATE '2020-01-01') AS dd
              |FROM orders ORDER BY o_orderkey""".stripMargin) },
    """SELECT o_orderkey,
      |  last_day(CAST(o_orderdate AS DATE)) AS ld,
      |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow,
      |  CAST(dayofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS doy,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
      |  date_diff('day', DATE '2020-01-01', CAST(o_orderdate AS DATE)) AS dd
      |FROM orders ORDER BY o_orderkey""".stripMargin)

  // Array/collection functions over split tokens (DuckDB list_* family)
  spark("f_array",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""SELECT doc_id,
              |  size(split(text, ' ')) AS n,
              |  CAST(array_contains(split(text, ' '), 'data') AS INT) AS has_data,
              |  array_join(slice(sort_array(array_distinct(split(text, ' '))), 1, 3), ',') AS first3
              |FROM documents ORDER BY doc_id""".stripMargin) },
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n,
      |  CAST(list_contains(string_split(text, ' '), 'data') AS INTEGER) AS has_data,
      |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS first3
      |FROM documents ORDER BY doc_id""".stripMargin)

  // JSON extraction from the events props column
  spark("f_json",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""SELECT event_id, CAST(get_json_object(props, '$.k') AS BIGINT) AS k
              |FROM events ORDER BY event_id""".stripMargin) },
    """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin)
}
