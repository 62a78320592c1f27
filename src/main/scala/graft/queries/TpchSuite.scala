package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** TPC-H completion: the 14 query skeletons not already covered by
  * Relational.scala (Q1≙a2, Q3/Q4/Q5/Q6/Q10/Q14/Q18 there). The
  * synthetic schema has no partsupp table and no commit/receipt dates,
  * so four skeletons substitute lineitem's (l_partkey, l_suppkey) as
  * the part↔supplier bridge and ship-after-order as the lateness
  * predicate — each adaptation keeps the original query's SHAPE
  * (correlated scalar subqueries, EXISTS/NOT-EXISTS pairs, CTE reuse,
  * OR-matrix pushdown, two-level aggregation), which is what exercises
  * the planner.
  *
  * Scale notes: every query is plain declarative SQL — Catalyst gives
  * partial aggregation, join reordering, broadcast for the dim tables
  * (nation/region/supplier/part all ≪ broadcast threshold at any SF;
  * lineitem⋈orders shuffles on the join key, the right plan at 100 TB).
  * Correlated subqueries decorrelate to aggregates + joins, not
  * per-row re-execution.
  */
object TpchSuite {
  val set = new QuerySet
  import set._

  private val rev =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"

  // Q2: min-cost supplier → max-acctbal supplier per part (lineitem
  // bridge); correlated scalar subquery repeated over the same join.
  // Spark side: the subquery re-states the OUTER join per partkey, so
  // a whole-partition MAX window over one pass of that join replaces
  // Catalyst's decorrelation (which builds the bridge join twice and
  // re-aggregates). One fact scan + broadcast dims + one window
  // shuffle on p_partkey — survives any fact size. Oracle keeps the
  // correlated formulation (independent shapes, same rows).
  spark("tpch_q2_supplier",
    (s, d) => { Tables.registerAll(s, d)
      // output is bounded by the p_size=15 part band (≈2% of parts ×
      // tied max-balance suppliers) — TinyResult skips the range-
      // sampling job that re-ran the join+window+distinct child
      graft.operators.TinyResult.globalSort(
        s.sql("""SELECT DISTINCT p_partkey, p_brand, s_name,
          |  CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
          |FROM (
          |  SELECT p_partkey, p_brand, s_name, s_acctbal,
          |    MAX(s_acctbal) OVER (PARTITION BY p_partkey) AS max_bal
          |  FROM part JOIN lineitem ON l_partkey = p_partkey
          |    JOIN supplier ON l_suppkey = s_suppkey
          |    JOIN nation ON s_nationkey = n_nationkey
          |    JOIN region ON n_regionkey = r_regionkey
          |  WHERE p_size = 15 AND r_name = 'AMERICA') x
          |WHERE s_acctbal = max_bal""".stripMargin),
        org.apache.spark.sql.functions.col("acctbal").desc_nulls_last,
        org.apache.spark.sql.functions.col("p_partkey"),
        org.apache.spark.sql.functions.col("s_name")) },
    s"""SELECT DISTINCT p_partkey, p_brand, s_name,
       |  CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
       |FROM part JOIN lineitem ON l_partkey = p_partkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |WHERE p_size = 15 AND r_name = 'AMERICA'
       |  AND s_acctbal = (SELECT MAX(s2.s_acctbal)
       |                   FROM supplier s2
       |                     JOIN lineitem l2 ON l2.l_suppkey = s2.s_suppkey
       |                     JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
       |                     JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
       |                   WHERE l2.l_partkey = p_partkey AND r2.r_name = 'AMERICA')
       |ORDER BY acctbal DESC NULLS LAST, p_partkey, s_name""".stripMargin)

  // Q7: volume shipping between two nations, grouped by year. Spark
  // side on the cents kernel (see Relational a2_q1_agg).
  // Join shape (q8's pattern): BOTH fact legs reduce by the two-nation
  // membership BEFORE they meet — lineitem via broadcast supplier/n1
  // (nations ∈ {3,7} keeps ~8% of rows), orders via broadcast
  // customer/n2 as the RIGHT subtree (survives flattening), the OR
  // pair predicate resolving after the orderkey join. SHUFFLE_HASH
  // hash-builds the smaller reduced-orders leg per partition — the
  // flat list instead drove a whole-orders driver broadcast.
  // Measured at sf1: 1.19 → 0.52 s.
  spark("tpch_q7_volume",
    (s, d) => { graft.Tables.registerAll(s, d)
      s.sql("""SELECT supp_nation, cust_nation, l_year,
              |  CAST(CAST(CAST(SUM(rev4) AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS revenue
              |FROM (SELECT /*+ SHUFFLE_HASH(eo) */ supp_nation, cust_nation,
              |        CAST(year(l_shipdate) AS BIGINT) AS l_year,
              |        CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev4
              |      FROM (SELECT l_orderkey, l_shipdate, l_extendedprice, l_discount, n1.n_name AS supp_nation
              |            FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
              |              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |            WHERE n1.n_name IN ('NATION_3', 'NATION_7')) l
              |        JOIN (SELECT o_orderkey, n2.n_name AS cust_nation
              |              FROM orders JOIN customer ON c_custkey = o_custkey
              |                JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |              WHERE n2.n_name IN ('NATION_3', 'NATION_7')) eo
              |          ON l_orderkey = eo.o_orderkey
              |      WHERE (supp_nation = 'NATION_3' AND cust_nation = 'NATION_7')
              |         OR (supp_nation = 'NATION_7' AND cust_nation = 'NATION_3')) shipping
              |GROUP BY supp_nation, cust_nation, l_year
              |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) },
    s"""SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
       |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |        CAST(year(l_shipdate) AS BIGINT) AS l_year, $rev AS volume
       |      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
       |        JOIN orders ON o_orderkey = l_orderkey
       |        JOIN customer ON c_custkey = o_custkey
       |        JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |        JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       |         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')) shipping
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)

  // Q8: national market share within a region, by year. Spark side on
  // the cents kernel; both sums surface through the same exact
  // decimal→double path before the (identical) double division.
  //
  // Join shape (the one that survives 100× scale): BOTH fact legs are
  // dimension-reduced BEFORE they meet — lineitem by broadcast
  // ECONOMY partkeys, orders by the broadcast EUROPE customer set
  // (kept as the RIGHT subtree: ExtractFiltersAndInnerJoins flattens
  // left children only, so the reduction is not linearized back into
  // a whole-orders build). A flat join list instead planned orders as
  // a driver-built 1.5M-row broadcast at sf1 — the one q8 shape that
  // got WORSE with scale. SHUFFLE_HASH(eo) then joins the two reduced
  // legs without sorting either (the reduced orders leg hash-builds
  // per partition; an explicit BROADCAST(eo) would cap scale at
  // driver memory). Measured at sf1/6 threads: 1.36 s flat-list →
  // 0.64 s this shape, identical 7-row result.
  spark("tpch_q8_mktshare",
    (s, d) => { graft.Tables.registerAll(s, d)
      s.sql("""SELECT o_year,
              |  CAST(CAST(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN rev4 ELSE 0 END) AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE)
              |    / CAST(CAST(CAST(SUM(rev4) AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS mkt_share
              |FROM (SELECT /*+ SHUFFLE_HASH(eo) */ CAST(year(o_orderdate) AS BIGINT) AS o_year,
              |        CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev4,
              |        n2.n_name AS nation
              |      FROM part JOIN lineitem ON p_partkey = l_partkey
              |        JOIN supplier ON s_suppkey = l_suppkey
              |        JOIN nation n2 ON s_nationkey = n2.n_nationkey
              |        JOIN (SELECT o_orderkey, o_orderdate
              |              FROM orders JOIN customer ON o_custkey = c_custkey
              |                JOIN nation n1 ON c_nationkey = n1.n_nationkey
              |                JOIN region ON n1.n_regionkey = r_regionkey
              |              WHERE r_name = 'EUROPE') eo ON l_orderkey = eo.o_orderkey
              |      WHERE p_type = 'ECONOMY') all_nations
              |GROUP BY o_year ORDER BY o_year""".stripMargin) },
    s"""SELECT o_year,
       |  CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
       |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, $rev AS volume,
       |        n2.n_name AS nation
       |      FROM part JOIN lineitem ON p_partkey = l_partkey
       |        JOIN supplier ON s_suppkey = l_suppkey
       |        JOIN orders ON l_orderkey = o_orderkey
       |        JOIN customer ON o_custkey = c_custkey
       |        JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |        JOIN region ON n1.n_regionkey = r_regionkey
       |        JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY') all_nations
       |GROUP BY o_year ORDER BY o_year""".stripMargin)

  // Q9: product-type profit (supplycost → retailprice·qty stand-in),
  // by supplier nation and year. Spark side runs the cents kernel
  // (long profit units through the joins, one exact decimal division
  // per group); the oracle keeps the decimal formulation.
  // SHUFFLE_HASH(orders): the pruned 2-column orders estimate ducks
  // under the broadcast threshold, making the planner hash-build all
  // 1.5M orders on the driver (the q8 disease — unboundable at real
  // scale); a shuffled hash join builds the per-partition slice
  // instead. Measured at sf1: 1.48 → 1.03 s.
  spark("tpch_q9_profit",
    (s, d) => { graft.Tables.registerAll(s, d)
      s.sql("""SELECT nation, o_year,
              |  CAST(CAST(CAST(SUM(amount4) AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS sum_profit
              |FROM (SELECT /*+ SHUFFLE_HASH(orders) */ n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
              |        CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))
              |          - CAST(round(p_retailprice * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT) AS amount4
              |      FROM part JOIN lineitem ON p_partkey = l_partkey
              |        JOIN supplier ON s_suppkey = l_suppkey
              |        JOIN orders ON o_orderkey = l_orderkey
              |        JOIN nation ON s_nationkey = n_nationkey
              |      WHERE p_name LIKE '%red%') profit
              |GROUP BY nation, o_year
              |ORDER BY nation, o_year DESC NULLS LAST""".stripMargin) },
    s"""SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
       |FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |        $rev - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS amount
       |      FROM part JOIN lineitem ON p_partkey = l_partkey
       |        JOIN supplier ON s_suppkey = l_suppkey
       |        JOIN orders ON o_orderkey = l_orderkey
       |        JOIN nation ON s_nationkey = n_nationkey
       |      WHERE p_name LIKE '%red%') profit
       |GROUP BY nation, o_year
       |ORDER BY nation, o_year DESC NULLS LAST""".stripMargin)

  // Q11: important parts by shipped value for one nation's suppliers;
  // HAVING against a scalar subquery over the same aggregate. Spark
  // inlines the subquery, so the HAVING formulation scans and joins
  // lineitem TWICE (ReuseExchange can't help — the two aggregates
  // group differently, and the shared join below them is
  // broadcast-joined, exchange-free). The Spark side folds the grand
  // total into SUM(SUM(..)) OVER () over the ~200k-row per-partkey
  // aggregate — decimal addition is associative, so the total is the
  // identical DECIMAL before the identical double cast. The oracle
  // keeps the subquery form (DuckDB materializes the shared scan).
  spark("tpch_q11_important",
    (s, d) => { graft.Tables.registerAll(s, d)
      s.sql("""SELECT l_partkey, value FROM (
              |  SELECT l_partkey,
              |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value,
              |    CAST(SUM(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))) OVER () AS DOUBLE) * 0.001 AS threshold
              |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              |    JOIN nation ON s_nationkey = n_nationkey
              |  WHERE n_name = 'NATION_2'
              |  GROUP BY l_partkey) t
              |WHERE value > threshold
              |ORDER BY value DESC NULLS LAST, l_partkey""".stripMargin) },
    """SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_2'
      |GROUP BY l_partkey
      |HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) >
      |  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 0.001
      |   FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |     JOIN nation ON s_nationkey = n_nationkey
      |   WHERE n_name = 'NATION_2')
      |ORDER BY value DESC NULLS LAST, l_partkey""".stripMargin)

  // Q12: ship-mode split → returnflag split; late = shipped after the
  // order date inside the year window.
  // SHUFFLE_HASH(orders): the 1.5M-row orders side hash-builds per
  // partition instead of sort-merging both sides (0.71 -> 0.63 s at
  // sf1 - the q9 lever); DuckDB parses the hint as a comment.
  common("tpch_q12_shipmode",
    """SELECT /*+ SHUFFLE_HASH(orders) */ l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > o_orderdate
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)

  // Q13: distribution of customers by order count (two-level agg over
  // a filtered LEFT JOIN — the ON-clause filter must not drop
  // customers).
  // Spark side aggregates orders below the outer join (j2_left's
  // pattern: map-side combine shrinks the fact to one count per
  // customer before the join; the ON-clause priority filter becomes a
  // WHERE in the pre-aggregate, and unmatched customers surface as
  // coalesce 0 exactly like count-over-no-rows). 1.15 → 0.67 s at sf1.
  spark("tpch_q13_custdist",
    (s, d) => { graft.Tables.registerAll(s, d)
      s.sql("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
              |FROM (SELECT c_custkey, coalesce(n, CAST(0 AS BIGINT)) AS c_count
              |      FROM customer LEFT JOIN
              |        (SELECT o_custkey, count(o_orderkey) AS n FROM orders
              |         WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey) o
              |        ON c_custkey = o_custkey) c_orders
              |GROUP BY c_count
              |ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST""".stripMargin) },
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST""".stripMargin)

  // Q15: top supplier by quarterly revenue — CTE referenced twice
  // (once as the join input, once inside the MAX scalar subquery).
  // Spark inlines the twice-referenced CTE, so the scalar-subquery
  // formulation scans and aggregates lineitem TWICE; the Spark side
  // folds the max into one MAX() OVER () pass over the ~10k-row
  // aggregate instead (0.59 → 0.40 s at sf1). The oracle keeps the
  // subquery form, which DuckDB materializes once on its own.
  spark("tpch_q15_top_supplier",
    (s, d) => { graft.Tables.registerAll(s, d)
      s.sql(s"""WITH revenue AS (
              |  SELECT l_suppkey AS supplier_no, SUM($rev) AS total_revenue
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
              |  GROUP BY l_suppkey)
              |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS revenue
              |FROM supplier JOIN
              |  (SELECT supplier_no, total_revenue FROM
              |     (SELECT supplier_no, total_revenue, MAX(total_revenue) OVER () AS mx
              |      FROM revenue) t
              |   WHERE total_revenue = mx) r ON s_suppkey = supplier_no
              |ORDER BY s_suppkey""".stripMargin) },
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no, SUM($rev) AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS revenue
       |FROM supplier JOIN revenue ON s_suppkey = supplier_no
       |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin)

  // Q16: distinct suppliers per part attribute set, minus suppliers on
  // the "complaints" list (acctbal < 0 stand-in) via NOT IN.
  common("tpch_q16_partsupp",
    """SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#5' AND p_size IN (1, 4, 7, 10)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC NULLS LAST, p_brand, p_type, p_size""".stripMargin)

  // Q17: revenue loss from small-quantity lines — per-part correlated
  // average (decorrelates to an aggregate + rejoin, not 200k subquery
  // executions).
  // Q17: small-quantity orders below 20% of the part's average. The
  // correlated per-partkey average re-aggregates lineitem; the Spark
  // side instead broadcast-joins the Brand#3 partkeys (pruning the
  // fact scan ~1/brands) and takes the average as whole-partition
  // window aggregates over ONE pass — one pruned scan, one window
  // shuffle on l_partkey. Equivalent: the subquery's per-partkey
  // average over ALL lineitem equals the average over the brand-
  // filtered join for exactly the partkeys that survive the brand
  // filter. Oracle keeps the correlated formulation.
  spark("tpch_q17_small_qty",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
        |FROM (
        |  SELECT l_extendedprice, l_quantity,
        |    0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_partkey) AS DOUBLE)
        |           / COUNT(*) OVER (PARTITION BY l_partkey)) AS threshold
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand = 'Brand#3') x
        |WHERE l_quantity < threshold""".stripMargin) },
    """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#3'
      |  AND l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
      |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)

  // Q19: OR-matrix of brand/size/quantity windows — the whole
  // disjunction must reach the scan as one pushed residual.
  common("tpch_q19_matrix",
    s"""SELECT CAST(SUM($rev) AS DOUBLE) AS revenue
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity >= 1 AND l_quantity <= 11)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10 AND l_quantity <= 20)
       |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin)

  // Q20: suppliers who shipped substantial volume of a part family in
  // a year (availqty → shipped-quantity HAVING), semi-joined to one
  // nation.
  common("tpch_q20_promotion",
    """SELECT s_suppkey, s_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_4'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      |    WHERE p_name LIKE 'red%'
      |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |    GROUP BY l_suppkey
      |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 20)
      |ORDER BY s_suppkey""".stripMargin)

  // Q21: suppliers who kept multi-supplier orders waiting (late =
  // shipped after order date); EXISTS + NOT-EXISTS pair over the same
  // fact table. Catalyst decorrelates the pair into a semi + anti join
  // but BROADCASTS the full lineitem scan for both — a driver-built
  // fact-table hash relation, twice, which cannot survive 100 TB. The
  // Spark side instead resolves each order with relational operators
  // only: aggregate late counts per (order, supplier) — map-side
  // combine shrinks the fact rows before the shuffle — then a second
  // hash aggregate per order counts suppliers / late suppliers and
  // carries the sole late supplier + its weight out via conditional
  // MAX/SUM. Equivalent because the EXISTS pair says exactly "≥2
  // suppliers in the order, exactly 1 of them late, count l1 rows of
  // that late supplier"; when nlate = 1 the conditional MAX IS that
  // supplier. ONE explicit shuffle on l_orderkey: both hash aggregates
  // then satisfy their clustering from that partitioning (hash(ok) ⊆
  // {ok,sk} and = {ok}) and run exchange-free — the typed path's
  // single-shuffle cost with relational codegen operators, zero sorts,
  // no flatMapGroups object serialization on the fact table. (A window
  // formulation measured 2x slower — whole-partition windows sort; a
  // naive two-groupBy SQL pays a second exchange.)
  spark("tpch_q21_waiting",
    (s, d) => { Tables.registerAll(s, d)
      val f = s.sql("""SELECT l_orderkey, l_suppkey,
        |  CASE WHEN l_shipdate > o_orderdate THEN 1 ELSE 0 END AS late
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE o_orderstatus = 'F'""".stripMargin)
      val perOrder = f.repartition(col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(sum("late").as("late_cnt"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("nsupp"),
          sum(when(col("late_cnt") > 0, 1).otherwise(0)).as("nlate"),
          max(when(col("late_cnt") > 0, col("l_suppkey"))).as("late_supp"),
          sum(when(col("late_cnt") > 0, col("late_cnt"))).as("w"))
        .filter(col("nsupp") >= 2 && col("nlate") === 1)
      perOrder
        .join(broadcast(s.sql("""SELECT s_suppkey, s_name FROM supplier
                      |JOIN nation ON s_nationkey = n_nationkey
                      |WHERE n_name = 'NATION_6'""".stripMargin)),
          col("s_suppkey") === col("late_supp"))
        .groupBy("s_name").agg(sum("w").cast("bigint").as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(20)
    },
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |  JOIN orders ON o_orderkey = l1.l_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F' AND n_name = 'NATION_6'
      |  AND l1.l_shipdate > o_orderdate
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate)
      |GROUP BY s_name
      |ORDER BY numwait DESC NULLS LAST, s_name LIMIT 20""".stripMargin)

  // Q22: sales opportunity — country code → custkey mod 7; above-avg
  // balance (scalar subquery) and never ordered urgently (NOT EXISTS;
  // the unfiltered original is empty at every SF of the synthetic
  // data — all high-balance customers have orders).
  // Round-8 A/B note: two rewrites were measured AGAINST this form at
  // sf1 (paced 6-thread Bench, same day) and both LOST — pre-distinct
  // anti-join probe + whole-frame-window avg fold: 0.672 s; same
  // without the distinct: 0.702 s; this textbook form: 0.615 s. The
  // planner's own shape (broadcast anti on the filtered orders probe,
  // scalar subquery as its own tiny job) is already right; the folds
  // only added a single-partition window exchange. Second negative
  // result on this row (r7 tried join restructures) — leave it alone.
  common("tpch_q22_opportunity",
    """SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM (SELECT CAST(c_custkey % 7 AS BIGINT) AS cntrycode, c_acctbal
      |      FROM customer
      |      WHERE c_custkey % 7 IN (1, 2, 3, 4, 5)
      |        AND c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |                         FROM customer c2
      |                         WHERE c2.c_acctbal > 0 AND c2.c_custkey % 7 IN (1, 2, 3, 4, 5))
      |        AND NOT EXISTS (SELECT 1 FROM orders
      |                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')) custsale
      |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin)
}
